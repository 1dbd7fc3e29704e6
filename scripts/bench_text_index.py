"""Full-text index A/B: inverted postings vs per-unique tokenization.

VERDICT r3 ask #8: measure text/phrase match latency at 1M rows before
and after `index-payload --text`. Host-side (the filter engine is
CPU-native); interleaved best-of-N like every CPU bench here — absolute
numbers swing with tenant load, compare within one run.

Corpus shape: captions drawn from a 50k-template pool with per-row
numeric suffixes (so the unique-string dictionary is large — the case
the legacy evaluator pays for), plus a 20% repeated-caption slice.

Usage: python scripts/bench_text_index.py [--n 1000000] [--rounds 3]
"""
import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORDS = ("person car building tree street market bridge crowd tank "
         "soldier smoke fire flag banner river road sign window "
         "rooftop convoy").split()


def make_store(root, n):
    from reverso_tpu.store import VectorStore

    rng = np.random.default_rng(0)
    d = 8
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    temps = [" ".join(rng.choice(WORDS, rng.integers(2, 7)))
             for _ in range(50_000)]
    payloads = []
    for i in range(n):
        t = temps[int(rng.integers(0, len(temps)))]
        if i % 5 == 0:
            payloads.append({"caption": t})              # repeated slice
        else:
            payloads.append({"caption": f"{t} frame {i}"})  # unique
    s = VectorStore.create(root, "txtbench", d)
    B = 100_000
    for lo in range(0, n, B):
        s.append(vecs[lo:lo + B], payloads[lo:lo + B])
    s.flush()
    return s


def best(fn, rounds):
    out = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        r = fn()
        out.append(time.perf_counter() - t0)
    return min(out), r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from reverso_tpu.store.filter import (PayloadColumns, evaluate_filter,
                                          parse_filter)

    with tempfile.TemporaryDirectory() as root:
        t0 = time.perf_counter()
        store = make_store(root, args.n)
        print(f"corpus: {args.n} rows built in "
              f"{time.perf_counter() - t0:.1f}s")

        cols = PayloadColumns(store)
        t0 = time.perf_counter()
        cols.ensure(["caption"])
        cols.view("caption")
        print(f"column extraction + view: {time.perf_counter() - t0:.1f}s")

        specs = {
            "text 2tok": {"key": "caption", "match": {"text": "car person"}},
            "text rare": {"key": "caption", "match": {"text": "tank convoy smoke"}},
            "phrase 2tok": {"key": "caption", "match": {"phrase": "car person"}},
            "phrase 3tok": {"key": "caption",
                            "match": {"phrase": "person car building"}},
        }
        filts = {k: parse_filter(v) for k, v in specs.items()}

        # interleaved legacy vs indexed, per spec
        results = {}
        os.environ["REVERSO_TEXT_INDEX"] = "1"
        t0 = time.perf_counter()
        cols.text_index("caption")
        t_build = time.perf_counter() - t0
        print(f"text index build (in-memory): {t_build:.2f}s")
        for name, filt in filts.items():
            for mode in ("legacy", "indexed"):
                os.environ["REVERSO_TEXT_INDEX"] = (
                    "0" if mode == "legacy" else "1")
                evaluate_filter(filt, cols)  # warm caches
                dt, mask = best(lambda: evaluate_filter(filt, cols),
                                args.rounds)
                results[(name, mode)] = (dt, int(mask.sum()))
        os.environ["REVERSO_TEXT_INDEX"] = "1"

        print(f"\n{'query':<14} {'legacy ms':>10} {'indexed ms':>11} "
              f"{'speedup':>8} {'hits':>9}")
        for name in specs:
            tl, hl = results[(name, "legacy")]
            ti, hi = results[(name, "indexed")]
            assert hl == hi, (name, hl, hi)
            print(f"{name:<14} {tl * 1e3:>10.1f} {ti * 1e3:>11.2f} "
                  f"{tl / ti:>7.0f}x {hi:>9}")

        # persisted cold load vs rebuild
        t0 = time.perf_counter()
        path = cols.persist_text(["caption"])
        print(f"\npersist_text: {time.perf_counter() - t0:.1f}s "
              f"({os.path.getsize(path) / 1e6:.0f} MB)")
        cols2 = PayloadColumns(store)
        cols2.ensure(["caption"])
        t0 = time.perf_counter()
        cols2.text_index("caption")
        print(f"cold text_index from cache: {time.perf_counter() - t0:.2f}s "
              f"(vs {t_build:.2f}s rebuild)")
        store.close()


if __name__ == "__main__":
    main()
