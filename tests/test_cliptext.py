"""CLIP text tower parity + BPE tokenizer tests."""
import json

import numpy as np
import pytest
import jax.numpy as jnp

from reverso_tpu.models.cliptext import (
    ClipTextConfig, ClipTextEncoder, convert_clip_text,
)
from reverso_tpu.detect.clipbpe import ClipBPETokenizer, bytes_to_unicode

torch = pytest.importorskip("torch")

TINY = ClipTextConfig(vocab_size=600, width=64, depth=2, num_heads=4,
                      context_length=24, embed_dim=32, eot_token_id=599)


def test_text_parity_vs_hf():
    from transformers import CLIPTextConfig as HFCfg, CLIPTextModelWithProjection

    hf = HFCfg(vocab_size=TINY.vocab_size, hidden_size=TINY.width,
               num_hidden_layers=TINY.depth, num_attention_heads=TINY.num_heads,
               intermediate_size=int(TINY.width * TINY.mlp_ratio),
               max_position_embeddings=TINY.context_length,
               projection_dim=TINY.embed_dim, hidden_act="quick_gelu",
               eos_token_id=TINY.eot_token_id, bos_token_id=598,
               attention_dropout=0.0)
    torch.manual_seed(0)
    model = CLIPTextModelWithProjection(hf).eval()

    rng = np.random.default_rng(0)
    ids = np.zeros((3, TINY.context_length), np.int64)
    for i, n in enumerate((5, 12, 24)):
        ids[i, 0] = 598
        ids[i, 1:n - 1] = rng.integers(1, 590, n - 2)
        ids[i, n - 1] = TINY.eot_token_id
    with torch.no_grad():
        ref = model(input_ids=torch.from_numpy(ids)).text_embeds.numpy()

    params = convert_clip_text(model.state_dict(), TINY)
    enc = ClipTextEncoder(TINY)
    out = np.asarray(enc.apply({"params": params}, jnp.asarray(ids)))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


@pytest.fixture()
def bpe(tmp_path):
    b2u = bytes_to_unicode()
    def u(s):  # ascii text -> unicode-mapped form
        return "".join(b2u[b] for b in s.encode())
    base = [u(c) for c in "abcdefghijklmnopqrstuvwxyz "]
    words = ["cat</w>", "ca", "at</w>", "c" , "a", "t</w>", "dog</w>"]
    vocab = {}
    for tok in base + [w for w in words] + ["<|startoftext|>", "<|endoftext|>"]:
        if tok not in vocab:
            vocab[tok] = len(vocab)
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    merges = "#version: 0.2\nc a\nca t</w>\na t</w>\nd o\ndo g</w>\n"
    (tmp_path / "merges.txt").write_text(merges)
    return ClipBPETokenizer(str(tmp_path / "vocab.json"),
                            str(tmp_path / "merges.txt"), context_length=12)


def test_bpe_merges(bpe):
    ids = bpe.encode_text("cat")
    assert ids == [bpe.encoder["cat</w>"]]
    arr = bpe("a cat")
    assert arr.shape == (1, 12)
    assert arr[0, 0] == bpe.sot
    assert bpe.encoder["cat</w>"] in arr[0]
    assert bpe.eot in arr[0]


def test_bpe_truncation(bpe):
    arr = bpe("cat " * 40)
    assert arr.shape == (1, 12)
    assert arr[0, -1] == bpe.eot


def test_engine_search_by_text(tmp_path, bpe):
    """Text query searches the image DB through the shared joint space."""
    import dataclasses, jax
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso
    from reverso_tpu.models.pe import PerceptionEncoder
    from reverso_tpu.models.cliptext import TextEmbedder
    import sys
    sys.path.insert(0, "tests")
    from test_pipeline import make_corpus

    model = dataclasses.replace(MODEL_PRESETS["test-tiny"], dtype="float32")
    text_cfg = ClipTextConfig(
        vocab_size=len(bpe.encoder), width=32, depth=1, num_heads=2,
        context_length=12, embed_dim=model.embed_dim,
        eot_token_id=bpe.eot)
    tenc = ClipTextEncoder(text_cfg)
    params = jax.jit(tenc.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 12), jnp.int32))["params"]
    embedder = TextEmbedder(text_cfg, params, bpe)

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, model=model,
        store=dataclasses.replace(cfg.store, root_dir=str(tmp_path / "db")))
    engine = Reverso(cfg, encoder=PerceptionEncoder(model),
                     text_embedder=embedder)
    make_corpus(tmp_path / "imgs", n=5)
    engine.create_database(str(tmp_path / "imgs"), "txtdb", use_direct_pe=True)
    text, items = engine.search_by_text("a cat", similarity_threshold=-1.0,
                                        max_results=3)
    assert len(items) == 3, text
    assert all(np.isfinite(it["score"]) for it in items)
    # stateless + batched variant (UI concurrency path): same results,
    # engine query state untouched
    engine.region_embeddings = None
    text_s, items_s = engine.search_by_text(
        "a cat", similarity_threshold=-1.0, max_results=3,
        stateless=True, use_batcher=True)
    assert [it["filename"] for it in items_s] == \
           [it["filename"] for it in items]
    assert engine.region_embeddings is None
    engine.searcher.close()
    # no text encoder -> graceful message
    engine2 = Reverso(cfg, encoder=engine.encoder)
    msg, items2 = engine2.search_by_text("a cat")
    assert msg.startswith("❌ No text encoder") and items2 == []
