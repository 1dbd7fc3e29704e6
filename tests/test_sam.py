"""SAM end-to-end parity vs transformers SamModel (random init, fp32)."""
import jax
import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from reverso_tpu.models.sam import (Sam, SamVisionCfg, tiny_sam_config,
                                    convert_sam)


def make_hf_model(cfg):
    from transformers import SamConfig as HFSamConfig, SamModel
    from transformers import SamVisionConfig, SamPromptEncoderConfig, SamMaskDecoderConfig
    v = cfg.vision
    d = cfg.decoder
    hf = HFSamConfig(
        vision_config=SamVisionConfig(
            image_size=v.image_size, patch_size=v.patch_size,
            hidden_size=v.hidden_size, num_hidden_layers=v.num_layers,
            num_attention_heads=v.num_heads, window_size=v.window_size,
            global_attn_indexes=list(v.global_attn_indexes),
            output_channels=v.output_channels, mlp_ratio=v.mlp_ratio,
            use_rel_pos=True, use_abs_pos=True, qkv_bias=True,
            attention_dropout=0.0, hidden_act="gelu",
            num_pos_feats=v.output_channels // 2),
        prompt_encoder_config=SamPromptEncoderConfig(
            hidden_size=v.output_channels, image_size=v.image_size,
            patch_size=v.patch_size),
        mask_decoder_config=SamMaskDecoderConfig(
            hidden_size=d.hidden_size, num_attention_heads=d.num_heads,
            mlp_dim=d.mlp_dim, num_hidden_layers=d.num_layers,
            attention_downsample_rate=d.attention_downsample_rate,
            num_multimask_outputs=d.num_multimask_outputs,
            iou_head_depth=d.iou_head_depth,
            iou_head_hidden_dim=d.iou_head_hidden_dim, hidden_act="relu"))
    torch.manual_seed(0)
    model = SamModel(hf).eval()
    # random-init leaves rel_pos/pos_embed at zeros; randomize for a
    # stronger parity check
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "rel_pos" in name or "pos_embed" in name:
                p.copy_(torch.randn_like(p) * 0.02)
    return model


@pytest.mark.slow
@pytest.mark.parametrize("multimask", [False, True])
def test_sam_parity(multimask):
    cfg = tiny_sam_config()
    model = make_hf_model(cfg)

    rng = np.random.default_rng(0)
    imgs = rng.standard_normal(
        (2, cfg.vision.image_size, cfg.vision.image_size, 3)).astype(np.float32)
    boxes = np.array([[[4, 4, 30, 40], [10, 12, 50, 60]],
                      [[0, 0, 63, 63], [20, 8, 44, 30]]], np.float32)

    with torch.no_grad():
        out = model(pixel_values=torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
                    input_boxes=torch.from_numpy(boxes),
                    multimask_output=multimask)
    ref_masks = out.pred_masks.numpy()
    ref_iou = out.iou_scores.numpy()

    params = convert_sam(model.state_dict(), cfg)
    sam = Sam(cfg)
    masks, iou = sam.apply({"params": params}, jnp.asarray(imgs),
                           jnp.asarray(boxes), multimask_output=multimask)
    masks, iou = np.asarray(masks), np.asarray(iou)

    assert masks.shape == ref_masks.shape, (masks.shape, ref_masks.shape)
    np.testing.assert_allclose(iou, ref_iou, atol=5e-3, rtol=1e-2)
    # tight: the 5e-3 tolerance here once hid a ConvTranspose kernel
    # spatial-flip conversion bug that only mattered at full size
    # (caught by scripts/parity_fullsize.py, round 3)
    np.testing.assert_allclose(masks, ref_masks, atol=2e-5, rtol=1e-4)


def test_flash_rel_bias_matches_xla_reference():
    """Decomposed rel-pos flash path == explicit [S, S]-bias attention."""
    import jax.numpy as jnp
    from reverso_tpu.ops.attention import flash_attention

    rng = np.random.default_rng(21)
    b, h, g, d = 2, 3, 16, 32
    s = g * g
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    bh = jnp.asarray(rng.standard_normal((b, h, s, g)), jnp.float32) * 0.3
    bw = jnp.asarray(rng.standard_normal((b, h, s, g)), jnp.float32) * 0.3

    out = np.asarray(flash_attention(q, k, v, rel_bias=(bh, bw, g),
                                     interpret=True))
    scale = d ** -0.5
    sc = np.einsum("bhqd,bhkd->bhqk", np.asarray(q) * scale, np.asarray(k))
    ky, kx = np.arange(s) // g, np.arange(s) % g
    bias = (np.asarray(bh)[:, :, :, ky] + np.asarray(bw)[:, :, :, kx])
    p = jax.nn.softmax(jnp.asarray(sc + bias), axis=-1)
    ref = np.einsum("bhqk,bhkd->bhqd", np.asarray(p), np.asarray(v))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_sam_vision_attention_flash_gate_cpu():
    """On CPU the XLA path runs (flash gate requires TPU); parity tests
    against transformers cover it. This asserts the module still works
    at a global-layer-like shape with the refactored bias helpers."""
    cfg = SamVisionCfg(hidden_size=32, num_heads=2, num_layers=1,
                       global_attn_indexes=(0,), image_size=64,
                       patch_size=16)
    from reverso_tpu.models.sam import SamVisionEncoder
    enc = SamVisionEncoder(cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 64, 64, 3)), jnp.float32)
    params = jax.jit(enc.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(enc.apply)(params, x)
    assert np.isfinite(np.asarray(out)).all()
