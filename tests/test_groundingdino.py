"""GroundingDINO end-to-end parity vs transformers (random init, fp32)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from reverso_tpu.models.groundingdino import (
    GroundingDino, tiny_test_config, convert_grounding_dino,
    generate_text_masks,
)


def make_hf_model(cfg):
    from transformers import (GroundingDinoConfig as HFConfig,
                              GroundingDinoForObjectDetection,
                              SwinConfig as HFSwin, BertConfig as HFBert)
    hf_cfg = HFConfig(
        backbone_config=HFSwin(
            embed_dim=cfg.swin.embed_dim, depths=list(cfg.swin.depths),
            num_heads=list(cfg.swin.num_heads),
            window_size=cfg.swin.window_size, patch_size=cfg.swin.patch_size,
            hidden_act="gelu", out_features=[f"stage{s+1}" for s in cfg.swin.out_stages],
            drop_path_rate=0.0, attention_probs_dropout_prob=0.0,
            hidden_dropout_prob=0.0),
        text_config=HFBert(
            vocab_size=cfg.text.vocab_size, hidden_size=cfg.text.hidden_size,
            num_hidden_layers=cfg.text.num_layers,
            num_attention_heads=cfg.text.num_heads,
            intermediate_size=cfg.text.intermediate_size,
            max_position_embeddings=cfg.text.max_position_embeddings,
            hidden_act="gelu", attention_probs_dropout_prob=0.0,
            hidden_dropout_prob=0.0),
        d_model=cfg.d_model,
        encoder_layers=cfg.encoder_layers, decoder_layers=cfg.decoder_layers,
        encoder_attention_heads=cfg.num_heads,
        decoder_attention_heads=cfg.num_heads,
        encoder_ffn_dim=cfg.ffn_dim, decoder_ffn_dim=cfg.ffn_dim,
        num_feature_levels=cfg.num_feature_levels,
        encoder_n_points=cfg.encoder_n_points,
        decoder_n_points=cfg.decoder_n_points,
        num_queries=cfg.num_queries, max_text_len=cfg.max_text_len,
        dropout=0.0, activation_dropout=0.0, attention_dropout=0.0,
        text_enhancer_dropout=0.0, fusion_dropout=0.0, fusion_droppath=0.0,
        auxiliary_loss=False)
    torch.manual_seed(0)
    return GroundingDinoForObjectDetection(hf_cfg).eval()


def test_text_mask_generation():
    # [CLS] tok tok . tok . [SEP]
    ids = np.array([[101, 5, 6, 1012, 7, 1012, 102]])
    attn, pos = generate_text_masks(ids)
    assert attn.shape == (1, 7, 7)
    # phrase 1 = positions 1..3, phrase 2 = positions 4..5
    assert attn[0, 1, 2] and attn[0, 1, 3]
    assert not attn[0, 1, 4]
    assert attn[0, 4, 5]
    np.testing.assert_array_equal(pos[0], [0, 0, 1, 2, 0, 1, 0])


@pytest.mark.slow
def test_grounding_dino_parity():
    cfg = tiny_test_config()
    model = make_hf_model(cfg)

    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    # two phrases per sample: [CLS] a b . c d . [SEP]
    ids = np.array([
        [101, 10, 11, 1012, 12, 13, 1012, 102],
        [101, 20, 21, 1012, 22, 23, 1012, 102],
    ])
    with torch.no_grad():
        out = model(pixel_values=torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
                    input_ids=torch.from_numpy(ids))
    ref_logits = out.logits.numpy()
    ref_boxes = out.pred_boxes.numpy()

    params = convert_grounding_dino(model.state_dict(), cfg)
    attn, pos = generate_text_masks(ids)
    gd = GroundingDino(cfg)
    logits, boxes = gd.apply({"params": params}, jnp.asarray(imgs),
                             jnp.asarray(ids), jnp.asarray(attn),
                             jnp.asarray(pos))
    logits, boxes = np.asarray(logits), np.asarray(boxes)

    assert logits.shape == ref_logits.shape
    assert boxes.shape == ref_boxes.shape
    finite = np.isfinite(ref_logits)
    assert (np.isfinite(logits) == finite).all()
    np.testing.assert_allclose(boxes, ref_boxes, atol=5e-3, rtol=1e-2)
    np.testing.assert_allclose(logits[finite], ref_logits[finite],
                               atol=5e-3, rtol=1e-2)


@pytest.mark.slow
def test_grounding_dino_parity_perturbed_layernorms():
    """Parity with NON-identity LayerNorm affines.

    At default init every LN has gamma=1/beta=0, making decoder_norm an
    affine identity over the (already-normed) decoder layer outputs —
    so the plain random-init test cannot distinguish HF's two delta
    chains (box refinement from the RAW layer output vs per-level
    output boxes from the NORMED one). Perturbing all LN affines makes
    the chains measurably different and pins the HF semantics."""
    cfg = tiny_test_config()
    model = make_hf_model(cfg)
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for mod in model.modules():
            if isinstance(mod, torch.nn.LayerNorm):
                mod.weight.add_(0.2 * torch.randn(mod.weight.shape,
                                                  generator=g))
                if mod.bias is not None:
                    mod.bias.add_(0.1 * torch.randn(mod.bias.shape,
                                                    generator=g))
        # the bbox head's last layer is ZERO-initialized (delta == 0),
        # which makes the whole refinement chain inert at init — wake
        # it up so the two chains actually produce different boxes
        for head in model.bbox_embed:
            last = head.layers[-1]
            last.weight.add_(0.05 * torch.randn(last.weight.shape,
                                                generator=g))
            last.bias.add_(0.05 * torch.randn(last.bias.shape,
                                              generator=g))

    rng = np.random.default_rng(3)
    imgs = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    ids = np.array([[101, 10, 11, 1012, 12, 13, 1012, 102]])
    with torch.no_grad():
        out = model(pixel_values=torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
                    input_ids=torch.from_numpy(ids))
    ref_logits = out.logits.numpy()
    ref_boxes = out.pred_boxes.numpy()

    params = convert_grounding_dino(model.state_dict(), cfg)
    attn, pos = generate_text_masks(ids)
    gd = GroundingDino(cfg)
    logits, boxes = gd.apply({"params": params}, jnp.asarray(imgs),
                             jnp.asarray(ids), jnp.asarray(attn),
                             jnp.asarray(pos))
    logits, boxes = np.asarray(logits), np.asarray(boxes)
    finite = np.isfinite(ref_logits)
    np.testing.assert_allclose(boxes, ref_boxes, atol=5e-3, rtol=1e-2)
    np.testing.assert_allclose(logits[finite], ref_logits[finite],
                               atol=5e-3, rtol=1e-2)
