"""BASELINE config #3 on the chip: video -> keyframes -> build -> search.

The reference's video path (/root/reference/video_processing.py:361-470:
download/scan clips, PySceneDetect keyframes, per-frame region
detection, qdrant index, cross-video match) has a CPU-mesh eval here
(EVAL.md config 3) but — until this script — no hardware artifact
(VERDICT r4 ask #5). This drives 10 synthetic clips through the PUBLIC
CLI, exactly the commands an operator runs:

  python -m reverso_tpu.cli video local VIDS FRAMES --fps 2
  python -m reverso_tpu.cli build FRAMES --name cfg3 [--direct-pe]
  python -m reverso_tpu.cli search QUERY.jpg --name cfg3 --json

on the real TPU with PE-Core-L14-336 (direct-PE build; pass --regions
for the full GroundedSAM region build — the region path's own chip
artifact is scripts/bench_region_e2e_tpu.py). Clips are 640x480 MJPG,
3 scenes x 2 s each with moving structure, so the HSV-delta scene
detector has real cuts to find. Reports: keyframe extraction rate,
build wall + steady img/s, search latency, cross-video top hit, and
the bench.py bare-matmul contention reference.

Run:  python scripts/bench_video_tpu.py [--videos 10] [--regions]
"""
import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def make_clips(vids: str, n: int) -> None:
    import cv2

    rng = np.random.default_rng(3)
    os.makedirs(vids, exist_ok=True)
    w_, h_ = 640, 480
    for v in range(n):
        wr = cv2.VideoWriter(os.path.join(vids, f"clip{v:02d}.avi"),
                             cv2.VideoWriter_fourcc(*"MJPG"), 15,
                             (w_, h_))
        for scene in range(3):
            base = rng.integers(0, 96, 3)
            grad = np.linspace(0, 96, w_)[None, :, None]
            bg = np.clip(base[None, None] + grad, 0, 255).astype(np.uint8)
            bg = np.broadcast_to(bg, (h_, w_, 3)).copy()
            color = rng.integers(128, 255, 3).tolist()
            for t in range(30):
                frame = bg.copy()
                x = 40 + (v * 37 + scene * 53 + t * 9) % (w_ - 200)
                y = 40 + (v * 19 + scene * 31) % (h_ - 200)
                cv2.rectangle(frame, (x, y), (x + 140, y + 120),
                              color, -1)
                cv2.circle(frame, (x + 70, y + 60), 35,
                           (int(255 - color[0]), int(255 - color[1]),
                            int(255 - color[2])), -1)
                wr.write(frame)
        wr.release()


def cli(args_list, env=None):
    cmd = [sys.executable, "-m", "reverso_tpu.cli"] + args_list
    t0 = time.perf_counter()
    r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       timeout=3000)
    dt = time.perf_counter() - t0
    if r.returncode != 0:
        print(r.stdout[-2000:])
        print(r.stderr[-2000:])
        raise SystemExit(f"CLI {' '.join(args_list[:2])} failed")
    return r.stdout, dt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=10)
    ap.add_argument("--regions", action="store_true",
                    help="region (GroundedSAM) build instead of direct-PE")
    ap.add_argument("--model", default="PE-Core-L14-336")
    args = ap.parse_args()

    import bench
    import jax
    print(f"backend: {jax.default_backend()}", flush=True)
    ref = bench._contention_reference()
    print(f"contention ref: {ref}", flush=True)

    work = tempfile.mkdtemp(prefix="reverso_video_")
    vids = os.path.join(work, "vids")
    frames = os.path.join(work, "frames")
    root = os.path.join(work, "db")
    make_clips(vids, args.videos)

    out, t_video = cli(["video", "local", vids, frames, "--fps", "2"])
    n_frames = len([f for f in os.listdir(frames)
                    if f.endswith(".jpg")])
    print(f"keyframes: {n_frames} from {args.videos} clips in "
          f"{t_video:.1f}s ({out.strip().splitlines()[-1][:80]})",
          flush=True)

    build_args = ["--db-root", root, "--model", args.model,
                  "build", frames, "--name", "cfg3"]
    if not args.regions:
        build_args.append("--direct-pe")
    out, t_build1 = cli(build_args)
    print(f"build (cold jits): {t_build1:.1f}s", flush=True)
    shutil.rmtree(root, ignore_errors=True)
    out, t_build2 = cli(build_args)
    print(f"build (steady): {t_build2:.1f}s = "
          f"{n_frames / t_build2:.2f} img/s", flush=True)

    # cross-video search: query with clip 0's first keyframe — top
    # OTHER-clip hits show scene matching across videos
    q = os.path.join(frames, sorted(os.listdir(frames))[0])
    out, t_s1 = cli(["--db-root", root, "--model", args.model,
                     "search", q, "--name", "cfg3", "--top-k", "5",
                     "--json"])
    hits = json.loads(out)          # list of {filename, score, ...}
    out, t_s2 = cli(["--db-root", root, "--model", args.model,
                     "search", q, "--name", "cfg3", "--top-k", "5",
                     "--json"])
    hits2 = json.loads(out)
    top = [h["filename"] for h in hits2[:3]]
    print(f"search: cold {t_s1:.1f}s, warm process {t_s2:.1f}s; "
          f"top hits {top}", flush=True)

    ref2 = bench._contention_reference()
    print(f"contention ref (post): {ref2}", flush=True)
    print(json.dumps({
        "clips": args.videos, "keyframes": n_frames,
        "video_s": round(t_video, 1),
        "build_cold_s": round(t_build1, 1),
        "build_steady_s": round(t_build2, 1),
        "img_per_s": round(n_frames / t_build2, 2),
        "search_cold_s": round(t_s1, 1),
        "search_warm_proc_s": round(t_s2, 1),
        "top_hits": top, "mode": "regions" if args.regions
        else "direct-pe", "ref_pre": ref, "ref_post": ref2,
    }))
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
