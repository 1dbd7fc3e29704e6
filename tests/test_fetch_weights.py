"""The real-weights harness is runnable offline (round-1 verdict #2).

No network in CI, so the harness is exercised exactly the way the
offline docs describe: a torch checkpoint directory on disk (here a
tiny seeded HF-CLIP, standing in for the real download), converted and
parity-checked end to end via scripts/fetch_weights.py, then loaded
back through PerceptionEncoder.from_checkpoint.
"""
import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_script():
    spec = importlib.util.spec_from_file_location(
        "fetch_weights", os.path.join(REPO, "scripts", "fetch_weights.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def tiny_clip_dir(tmp_path):
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    hf_cfg = CLIPVisionConfig(
        hidden_size=64, intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=8,
        projection_dim=32, hidden_act="quick_gelu", attention_dropout=0.0)
    torch.manual_seed(0)
    model = CLIPVisionModelWithProjection(hf_cfg).eval()
    src = tmp_path / "clip_src"
    model.save_pretrained(src)
    return str(src), model


def test_fetch_weights_pe_offline(tmp_path, tiny_clip_dir, monkeypatch):
    src, model = tiny_clip_dir
    dest = str(tmp_path / "weights")
    fw = _load_script()
    monkeypatch.setattr(sys, "argv", [
        "fetch_weights.py", "--dest", dest, "--models", "pe",
        "--local-pe", src])
    assert fw.main() == 0

    ckpt = os.path.join(dest, "pe_vision.msgpack")
    assert os.path.exists(ckpt) and os.path.exists(ckpt + ".json")
    report = open(os.path.join(dest, "WEIGHTS_PARITY.md")).read()
    assert "PE parity: PASS" in report
    assert "recall@10 neighbor-set parity" in report
    assert "| block 0 |" in report and "| block 1 |" in report

    # converted checkpoint round-trips through the engine-facing loader
    from reverso_tpu.models.pe import PerceptionEncoder
    pe = PerceptionEncoder.from_checkpoint(ckpt)
    assert pe.family == "clip"
    rng = np.random.default_rng(1)
    pixels = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    ours = np.asarray(pe.encode_image(pixels))
    with torch.no_grad():
        ref = model(pixel_values=torch.from_numpy(
            pixels.transpose(0, 3, 1, 2))).image_embeds.numpy()
    ref /= np.linalg.norm(ref, axis=1, keepdims=True)
    assert float((ours * ref).sum(1).min()) >= 0.999


def test_cli_engine_uses_converted_checkpoint(tmp_path, tiny_clip_dir,
                                              monkeypatch):
    """REVERSO_PE_CKPT=<msgpack> swaps real converted weights into the
    CLI-built engine, architecture carried by the sidecar meta."""
    src, _ = tiny_clip_dir
    dest = str(tmp_path / "weights")
    fw = _load_script()
    monkeypatch.setattr(sys, "argv", [
        "fetch_weights.py", "--dest", dest, "--models", "pe",
        "--local-pe", src])
    fw.main()
    ckpt = os.path.join(dest, "pe_vision.msgpack")

    from types import SimpleNamespace

    from reverso_tpu import cli
    monkeypatch.setenv("REVERSO_PE_CKPT", ckpt)
    engine = cli._make_engine(SimpleNamespace(
        model=None, db_root=str(tmp_path / "db")))
    assert engine.encoder.cfg.width == 64
    assert engine.encoder.family == "clip"
    assert engine.config.model.image_size == 32


def test_golden_fixture_parity():
    """Torch-free regression anchor: a frozen torch-side state dict +
    its image_embeds (tests/fixtures/hf_clip_tiny_golden.npz, generated
    once from transformers) must reproduce through the converter +
    flax forward, independent of the torch/transformers versions
    installed at test time."""
    import dataclasses as dc
    import json

    from reverso_tpu.config import ModelConfig
    from reverso_tpu.models.convert import convert_vision_tower
    from reverso_tpu.models.pe import PerceptionEncoder

    data = np.load(os.path.join(REPO, "tests", "fixtures",
                                "hf_clip_tiny_golden.npz"))
    arch = json.loads(bytes(data["config"]).decode())
    cfg = ModelConfig(name="golden-tiny", use_rope=False, pool_type="cls",
                      layer_scale_init=None, dtype="float32",
                      **{k: arch[k] for k in ("width", "depth", "num_heads",
                                              "image_size", "patch_size",
                                              "embed_dim", "mlp_ratio")})
    sd = {k[4:]: data[k] for k in data.files if k.startswith("sd::")}
    params = convert_vision_tower(sd, cfg, scheme="hf_clip")
    pe = PerceptionEncoder(cfg, family="clip", params=params)
    ours = np.asarray(pe.encode_image(data["pixels"]))
    ref = data["image_embeds"]
    ref = ref / np.linalg.norm(ref, axis=1, keepdims=True)
    assert float((ours * ref).sum(1).min()) >= 0.9999


def test_fetch_weights_parity_gate(tmp_path, tiny_clip_dir, monkeypatch):
    """A broken conversion must FAIL the harness, not pass silently."""
    import jax
    import reverso_tpu.models.convert as cv

    orig = cv.convert_vision_tower

    def bad_convert(sd, cfg, scheme="auto"):
        params = orig(sd, cfg, scheme=scheme)
        return jax.tree_util.tree_map(lambda a: a + 0.05, params)

    monkeypatch.setattr(cv, "convert_vision_tower", bad_convert)
    fw = _load_script()
    monkeypatch.setattr(sys, "argv", [
        "fetch_weights.py", "--dest", str(tmp_path / "w"), "--models", "pe",
        "--local-pe", tiny_clip_dir[0]])
    with pytest.raises(SystemExit, match="PARITY FAILURE"):
        fw.main()
