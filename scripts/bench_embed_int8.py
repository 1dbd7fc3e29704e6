#!/usr/bin/env python
"""End-to-end embed A/B: PE-Core-L14-336 bf16 vs quant="int8".

Measures (interleaved, one v5e) the full-tower throughput of the int8
knob (Pallas int8 MLP 1.28x/layer + XLA fused int8 qkv 1.66x,
bench_mlp_int8.py / bench_int8_linear.py) and its accuracy cost at the
METRIC that matters for this system: embedding cosine vs the bf16
tower and top-10 neighbor-set overlap over a small corpus — the int8
analog of the bf16-vs-fp32 0.97@10 overlap (PERF.md).

Inputs are low-frequency synthetic images (upsampled noise), not white
noise — closer to natural image spectra for LN statistics.

Run: python scripts/bench_embed_int8.py [--corpus 512]
"""
import argparse
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", type=int, default=512)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--budget", type=float, default=20.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import _best_time
    from reverso_tpu.cli import _enable_compile_cache
    from reverso_tpu.models.pe import PerceptionEncoder

    _enable_compile_cache()
    print("backend:", jax.default_backend(), flush=True)

    pe = PerceptionEncoder.from_preset("PE-Core-L14-336")
    pe8 = PerceptionEncoder.from_preset("PE-Core-L14-336",
                                        params=pe.params, quant="int8")

    B = args.batch
    key = jax.random.PRNGKey(0)
    low = jax.random.normal(key, (B, 21, 21, 3), jnp.float32)
    images = jax.image.resize(low, (B, 336, 336, 3), "cubic")
    np.asarray(pe._fwd(pe.params, images))[:1]
    np.asarray(pe8._fwd(pe8.params, images))[:1]

    t_bf, t_i8 = [], []
    for _ in range(3):
        t_bf.append(_best_time(lambda: pe._fwd(pe.params, images),
                               lambda r: np.asarray(r[:1, :8]),
                               budget_s=args.budget, k=4))
        t_i8.append(_best_time(lambda: pe8._fwd(pe8.params, images),
                               lambda r: np.asarray(r[:1, :8]),
                               budget_s=args.budget, k=4))
    tb, ti = min(t_bf), min(t_i8)
    print(f"B={B}: bf16 {tb*1e3:6.1f} ms ({B/tb:5.1f} img/s)   "
          f"int8 {ti*1e3:6.1f} ms ({B/ti:5.1f} img/s)   "
          f"ratio {tb/ti:4.2f}x", flush=True)

    # accuracy: corpus embeddings through both towers
    n = args.corpus
    embs, embs8 = [], []
    for lo in range(0, n, B):
        k2 = jax.random.fold_in(key, lo + 1)
        low = jax.random.normal(k2, (B, 21, 21, 3), jnp.float32)
        imgs = jax.image.resize(low, (B, 336, 336, 3), "cubic")
        embs.append(np.asarray(pe._fwd(pe.params, imgs), np.float32))
        embs8.append(np.asarray(pe8._fwd(pe8.params, imgs), np.float32))
    e = np.concatenate(embs)[:n]
    e8 = np.concatenate(embs8)[:n]
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    e8 /= np.linalg.norm(e8, axis=1, keepdims=True)
    cos = (e * e8).sum(1)
    print(f"embedding cosine int8 vs bf16: mean {cos.mean():.5f} "
          f"min {cos.min():.5f}", flush=True)

    k = 10
    s = e @ e.T
    s8 = e8 @ e8.T
    np.fill_diagonal(s, -2)
    np.fill_diagonal(s8, -2)
    nb = np.argsort(-s, axis=1)[:, :k]
    nb8 = np.argsort(-s8, axis=1)[:, :k]
    ov = np.mean([len(set(a) & set(b)) / k for a, b in zip(nb, nb8)])
    print(f"top-{k} neighbor overlap (n={n}): {ov:.4f}", flush=True)


if __name__ == "__main__":
    main()
