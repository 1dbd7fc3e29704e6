"""Full-size flax-side golden regression (REVERSO_FULLSIZE=1 to run).

`scripts/parity_fullsize.py` proves converter+model parity vs torch at
FULL size (L/14-336, dino-tiny full, SAM ViT-base) and commits the flax
outputs as goldens. This test re-runs ONLY the flax side against those
goldens — catching any numerics regression in the full-size towers
without needing torch forwards (which cost ~15 min). Excluded from the
default suite for runtime; run explicitly:

    REVERSO_FULLSIZE=1 python -m pytest tests/test_fullsize_goldens.py -q
"""
import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "fullsize_goldens.npz")

pytestmark = pytest.mark.skipif(
    not os.environ.get("REVERSO_FULLSIZE"),
    reason="full-size forward costs minutes; set REVERSO_FULLSIZE=1")


@pytest.fixture(scope="module")
def goldens():
    if not os.path.exists(FIXTURE):
        pytest.skip("no committed goldens; run scripts/parity_fullsize.py")
    return np.load(FIXTURE)


def _hf_clip_fullsize():
    import torch
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection
    torch.manual_seed(0)
    return CLIPVisionModelWithProjection(CLIPVisionConfig(
        hidden_size=1024, intermediate_size=4096, num_hidden_layers=24,
        num_attention_heads=16, image_size=336, patch_size=14,
        projection_dim=768, hidden_act="quick_gelu",
        attention_dropout=0.0)).eval()


def test_pe_fullsize_matches_goldens(goldens):
    import jax.numpy as jnp
    from reverso_tpu.config import ModelConfig
    from reverso_tpu.models import VisionTransformer, convert_vision_tower

    cfg = ModelConfig(
        name="clip-l14-336-fullsize", image_size=336, patch_size=14,
        width=1024, depth=24, num_heads=16, mlp_ratio=4.0, embed_dim=768,
        use_rope=False, pool_type="cls", layer_scale_init=None,
        dtype="float32")
    model = _hf_clip_fullsize()
    params = convert_vision_tower(model.state_dict(), cfg, scheme="auto")
    vit = VisionTransformer(cfg, act="quick_gelu", use_ln_pre=True,
                            patch_bias=False, use_flash=False)
    rng = np.random.default_rng(1)
    imgs = rng.standard_normal((8, 336, 336, 3)).astype(np.float32)
    out = np.asarray(vit.apply({"params": params}, jnp.asarray(imgs)))
    np.testing.assert_allclose(out, goldens["pe_embeds"], atol=1e-4,
                               rtol=1e-4)
