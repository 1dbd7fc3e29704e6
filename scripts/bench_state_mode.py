#!/usr/bin/env python
"""Interleaved A/B: sorted-insert vs replace-min top-k state.

Round-3 lead (PERF.md): the per-event sorted insert is ~11 small
[q_tile, kpad] ops; replace-min is ~6 plus a once-per-scan final sort.
The chip is time-shared, so the comparison interleaves the two variants
within one process and compares block-min times (bench.py::_best_time).

Usage: python scripts/bench_state_mode.py [--n 1048576] [--d 1024]
       [--q 256] [--k 10] [--int8] [--budget 30]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--d", type=int, default=1024)
    ap.add_argument("--q", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--budget", type=float, default=30.0)
    ap.add_argument("--db-tile", type=int, default=1024)
    ap.add_argument("--group", type=int, default=2)
    ap.add_argument("--n-bufs", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import _best_time
    from reverso_tpu.ops.topk import (cosine_topk_pallas,
                                      cosine_topk_int8_exact,
                                      quantize_db_int8)

    print(f"backend={jax.default_backend()} n={args.n} d={args.d} "
          f"q={args.q} k={args.k} int8={args.int8}", flush=True)
    key = jax.random.PRNGKey(0)
    kq, kd = jax.random.split(key)
    db = jax.random.normal(kd, (args.n, args.d), jnp.float32)
    db = db / jnp.linalg.norm(db, axis=1, keepdims=True)
    qs = jax.random.normal(kq, (args.q, args.d), jnp.float32)
    qs = np.asarray(qs / jnp.linalg.norm(qs, axis=1, keepdims=True))
    scale = None
    if args.int8:
        db, scale = quantize_db_int8(db)
        db = jax.device_put(db)
        scale = float(scale)
    else:
        db = jax.device_put(db.astype(jnp.bfloat16))
        qs = qs.astype(np.float32)
    qs = jax.device_put(jnp.asarray(qs).astype(
        jnp.bfloat16 if not args.int8 else jnp.float32))

    def make_run(mode):
        # production entry points (VMEM-budgeted ring depth etc.)
        state, db_tile, group = mode
        if args.int8:
            def run():
                return cosine_topk_int8_exact(
                    db, scale, qs, args.k, db_tile=db_tile,
                    state_mode=state)
        else:
            def run():
                return cosine_topk_pallas(
                    db, qs, args.k, db_tile=db_tile, state_mode=state,
                    group=group)
        return run

    # NOTE: group*db_tile (extraction width) > 2048 OOMs the 16M VMEM
    # stack at q=256: f32 staging + i32 iota + compiler temporaries for
    # the extraction passes ~= 16 bytes/element of width (measured:
    # g8(db512) = 16.02M, 20K over). Width is VMEM-capped at 2048.
    variants = {
        "base(db1024,g2)": ("sorted", 1024, 2),
        "g4(db512)": ("sorted", 512, 4),
    }
    runs = {name: make_run(v) for name, v in variants.items()}
    base = next(iter(runs))
    # compile + cross-check results first
    outs = {}
    for m, r in runs.items():
        t0 = time.time()
        outs[m] = [np.asarray(x) for x in r()]
        print(f"{m}: compiled+first in {time.time() - t0:.1f}s", flush=True)
    for m in runs:
        np.testing.assert_array_equal(outs[base][1], outs[m][1])
    print("results identical across variants", flush=True)

    # interleave: alternate variants, several rounds
    res = {m: [] for m in runs}
    for rnd in range(3):
        for m, r in runs.items():
            dt = _best_time(r, lambda o: np.asarray(o[0][:1, :1]),
                            budget_s=args.budget / 3)
            res[m].append(dt * 1e3)
            print(f"round {rnd} {m}: {dt * 1e3:.2f} ms", flush=True)
    for m, v in res.items():
        qps = args.q / (min(v) / 1e3)
        print(f"{m}: min {min(v):.2f} ms  median {sorted(v)[1]:.2f} ms "
              f"-> {qps:,.0f} QPS", flush=True)


if __name__ == "__main__":
    main()
