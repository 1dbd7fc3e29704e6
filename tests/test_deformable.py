"""Deformable-attention parity vs the transformers pure-torch fallback."""
import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from reverso_tpu.ops.deformable import ms_deform_attn, bilinear_sample


def torch_reference(value, spatial_shapes, locations, weights):
    from transformers.models.grounding_dino.modeling_grounding_dino import (
        MultiScaleDeformableAttention)
    shapes_t = torch.as_tensor(spatial_shapes, dtype=torch.long)
    start = torch.cat([shapes_t.new_zeros(1),
                       (shapes_t[:, 0] * shapes_t[:, 1]).cumsum(0)[:-1]])
    with torch.no_grad():
        return MultiScaleDeformableAttention()(
            torch.from_numpy(value), shapes_t, list(spatial_shapes), start,
            torch.from_numpy(locations), torch.from_numpy(weights),
            im2col_step=64).numpy()


@pytest.mark.parametrize("seed", [0, 1])
def test_ms_deform_attn_parity(seed):
    rng = np.random.default_rng(seed)
    b, h, d = 2, 4, 8
    shapes = ((8, 12), (4, 6), (2, 3))
    lv = sum(hl * wl for hl, wl in shapes)
    lq, n_points = 10, 4
    value = rng.standard_normal((b, lv, h, d)).astype(np.float32)
    # include out-of-bounds locations to exercise zero padding
    locs = rng.uniform(-0.2, 1.2, (b, lq, h, len(shapes), n_points, 2)).astype(np.float32)
    w = rng.uniform(0, 1, (b, lq, h, len(shapes), n_points)).astype(np.float32)
    w /= w.sum(axis=(-2, -1), keepdims=True)

    ref = torch_reference(value, shapes, locs, w)
    out = np.asarray(ms_deform_attn(jnp.asarray(value), shapes,
                                    jnp.asarray(locs), jnp.asarray(w)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)


def test_bilinear_matches_grid_sample():
    rng = np.random.default_rng(0)
    img = rng.standard_normal((1, 5, 7, 3)).astype(np.float32)
    xy = rng.uniform(-1.5, 1.5, (1, 40, 2)).astype(np.float32)  # normalized-ish
    # torch grid_sample expects [-1, 1] grid, align_corners=False
    t = torch.nn.functional.grid_sample(
        torch.from_numpy(img.transpose(0, 3, 1, 2)),
        torch.from_numpy(xy).reshape(1, 1, 40, 2),
        mode="bilinear", padding_mode="zeros", align_corners=False)
    ref = t.numpy().reshape(1, 3, 40).transpose(0, 2, 1)
    # convert [-1,1] -> pixel coords: ((g+1)/2)*size - 0.5
    px = (xy[..., 0] + 1) / 2 * 7 - 0.5
    py = (xy[..., 1] + 1) / 2 * 5 - 0.5
    out = np.asarray(bilinear_sample(jnp.asarray(img), jnp.asarray(px),
                                     jnp.asarray(py)))
    np.testing.assert_allclose(out, ref, atol=1e-6)


# ---------------------------------------------------------------------------
# Alternate implementations: patchrow gather and the Pallas hat-matmul
# kernel (run in interpret mode on the CPU test mesh)
# ---------------------------------------------------------------------------

def _random_case(seed, dtype=np.float32):
    rng = np.random.default_rng(seed)
    b, h, d = 2, 4, 8
    shapes = ((8, 12), (4, 6), (2, 3))
    lv = sum(hl * wl for hl, wl in shapes)
    lq, n_points = 10, 4
    value = rng.standard_normal((b, lv, h, d)).astype(dtype)
    locs = rng.uniform(-0.2, 1.2,
                       (b, lq, h, len(shapes), n_points, 2)).astype(dtype)
    w = rng.uniform(0, 1, (b, lq, h, len(shapes), n_points)).astype(dtype)
    w /= w.sum(axis=(-2, -1), keepdims=True)
    return shapes, value, locs, w


@pytest.mark.parametrize("seed", [0, 3])
def test_patchrow_matches_patch(seed):
    shapes, value, locs, w = _random_case(seed)
    a = np.asarray(ms_deform_attn(jnp.asarray(value), shapes,
                                  jnp.asarray(locs), jnp.asarray(w)))
    b = np.asarray(ms_deform_attn(jnp.asarray(value), shapes,
                                  jnp.asarray(locs), jnp.asarray(w),
                                  impl="patchrow"))
    np.testing.assert_allclose(a, b, atol=1e-6)


@pytest.mark.parametrize("seed", [0, 3])
def test_pallas_matches_patch_fp32(seed):
    from reverso_tpu.ops.deformable import ms_deform_attn_pallas
    shapes, value, locs, w = _random_case(seed)
    a = np.asarray(ms_deform_attn(jnp.asarray(value), shapes,
                                  jnp.asarray(locs), jnp.asarray(w)))
    b = np.asarray(ms_deform_attn_pallas(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w),
        q_tile=8, interpret=True))
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-5)


def test_pallas_bf16_close_to_fp32():
    from reverso_tpu.ops.deformable import ms_deform_attn_pallas
    shapes, value, locs, w = _random_case(1)
    ref = np.asarray(ms_deform_attn(jnp.asarray(value), shapes,
                                    jnp.asarray(locs), jnp.asarray(w)))
    out = np.asarray(ms_deform_attn_pallas(
        jnp.asarray(value, jnp.bfloat16), shapes,
        jnp.asarray(locs, jnp.bfloat16), jnp.asarray(w, jnp.bfloat16),
        q_tile=8, interpret=True).astype(jnp.float32))
    # bf16 hats + values: ~2^-8 relative
    np.testing.assert_allclose(out, ref, atol=0.05, rtol=0.05)


def test_pallas_decoder_style_reference_points():
    """Lq != Lv and locations from 4-d reference points (decoder path)."""
    from reverso_tpu.ops.deformable import ms_deform_attn_pallas
    rng = np.random.default_rng(7)
    shapes = ((8, 12), (4, 6))
    lv = sum(hl * wl for hl, wl in shapes)
    b, lq, h, d, p = 1, 9, 2, 8, 4
    value = rng.standard_normal((b, lv, h, d)).astype(np.float32)
    locs = rng.uniform(0, 1, (b, lq, h, len(shapes), p, 2)).astype(np.float32)
    w = rng.uniform(0, 1, (b, lq, h, len(shapes), p)).astype(np.float32)
    a = np.asarray(ms_deform_attn(jnp.asarray(value), shapes,
                                  jnp.asarray(locs), jnp.asarray(w)))
    out = np.asarray(ms_deform_attn_pallas(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w),
        q_tile=8, interpret=True))
    np.testing.assert_allclose(out, a, atol=2e-5, rtol=1e-5)


def test_bf16_features_with_f32_coords_close_to_fp32():
    """Round-3 fix: coordinate math is f32 at the op boundary even when
    features run bf16 — the sampling GEOMETRY must not quantize (bf16
    normalized coords shift samples ~0.5 px at a 100-wide level).
    bf16-features/f32-coords must land much nearer fp32 than the old
    all-bf16 path did."""
    from reverso_tpu.ops.deformable import ms_deform_attn_pallas
    shapes, value, locs, w = _random_case(2)
    ref = np.asarray(ms_deform_attn(jnp.asarray(value), shapes,
                                    jnp.asarray(locs), jnp.asarray(w)))
    for impl_out in (
        ms_deform_attn_pallas(jnp.asarray(value, jnp.bfloat16), shapes,
                              jnp.asarray(locs), jnp.asarray(w),
                              q_tile=8, interpret=True),
        ms_deform_attn(jnp.asarray(value, jnp.bfloat16), shapes,
                       jnp.asarray(locs), jnp.asarray(w)),
    ):
        out = np.asarray(impl_out.astype(jnp.float32))
        err = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-9)
        assert err < 0.01, err       # feature rounding only, not ~0.1


@pytest.mark.slow
def test_model_supplies_f32_sampling_locations_under_bf16(monkeypatch):
    """The detector must hand the deformable op f32 coordinates in bf16
    mode (regression: sampling geometry quantization is a silent
    accuracy loss the dtype knob must not carry)."""
    import dataclasses
    import jax
    import reverso_tpu.models.groundingdino as G

    seen = []
    orig = G.ms_deform_attn

    def spy(value, shapes, loc, weights, impl="patch"):
        seen.append((str(value.dtype), str(loc.dtype)))
        return orig(value, shapes, loc, weights, impl=impl)

    monkeypatch.setattr(G, "ms_deform_attn", spy)
    cfg = G.tiny_test_config()
    cfg = dataclasses.replace(
        cfg, dtype="bfloat16",
        swin=dataclasses.replace(cfg.swin, dtype="bfloat16"),
        text=dataclasses.replace(cfg.text, dtype="bfloat16"))
    model = G.GroundingDino(cfg)
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    ids = np.array([[101, 10, 11, 1012, 102]])
    attn, pos = G.generate_text_masks(ids)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(imgs),
                        jnp.asarray(ids), jnp.asarray(attn),
                        jnp.asarray(pos))
    model.apply(params, jnp.asarray(imgs), jnp.asarray(ids),
                jnp.asarray(attn), jnp.asarray(pos))
    assert seen and all(ld == "float32" for _, ld in seen), set(seen)
    assert any(vd == "bfloat16" for vd, _ in seen)
