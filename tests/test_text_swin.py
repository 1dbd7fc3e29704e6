"""Parity tests: BERT text tower and Swin backbone vs transformers (fp32,
random init). SURVEY.md §4 item 3 applied to the detection stack."""
import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from reverso_tpu.models.text import BertConfig, BertEncoder, convert_bert
from reverso_tpu.models.swin import SwinConfig, SwinBackbone, convert_swin


def test_bert_parity():
    from transformers import BertConfig as HFBertConfig, BertModel

    cfg = BertConfig(vocab_size=500, hidden_size=64, num_layers=2,
                     num_heads=4, intermediate_size=128,
                     max_position_embeddings=64)
    hf_cfg = HFBertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act="gelu", attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0)
    torch.manual_seed(0)
    model = BertModel(hf_cfg, add_pooling_layer=False).eval()

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 500, (2, 12))
    mask = np.ones((2, 12), np.int64)
    mask[1, 8:] = 0
    with torch.no_grad():
        ref = model(input_ids=torch.from_numpy(ids),
                    attention_mask=torch.from_numpy(mask)
                    ).last_hidden_state.numpy()

    params = convert_bert(model.state_dict(), cfg)
    enc = BertEncoder(cfg)
    out = np.asarray(enc.apply({"params": params}, jnp.asarray(ids),
                               jnp.asarray(mask)))
    # masked positions may differ (ref computes them attending to garbage);
    # compare only valid tokens
    np.testing.assert_allclose(out[0], ref[0], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(out[1, :8], ref[1, :8], atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("img", [64, 56])   # 56: non-divisible by window*patch
def test_swin_backbone_parity(img):
    from transformers import SwinConfig as HFSwinConfig
    from transformers.models.swin.modeling_swin import SwinBackbone as HFSwinBackbone

    cfg = SwinConfig(embed_dim=24, depths=(2, 2), num_heads=(2, 4),
                     window_size=4, out_stages=(0, 1))
    hf_cfg = HFSwinConfig(
        image_size=img, patch_size=4, embed_dim=24, depths=[2, 2],
        num_heads=[2, 4], window_size=4, hidden_act="gelu",
        drop_path_rate=0.0, attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0,
        out_features=["stage1", "stage2"])
    torch.manual_seed(0)
    model = HFSwinBackbone(hf_cfg).eval()

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, img, img, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).feature_maps
    ref = [r.numpy() for r in ref]

    params = convert_swin(model.state_dict(), cfg)
    out = SwinBackbone(cfg).apply({"params": params}, jnp.asarray(x))
    for stage_i, r in zip(sorted(out), ref):
        o = np.asarray(out[stage_i]).transpose(0, 3, 1, 2)   # NHWC->NCHW
        assert o.shape == r.shape, (o.shape, r.shape)
        np.testing.assert_allclose(o, r, atol=3e-4, rtol=1e-3)
