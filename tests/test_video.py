"""Video ingest tests with synthesized clips (no network, no yt-dlp)."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from reverso_tpu.ingest.video import (
    is_supported_video_url,
    detect_scenes,
    extract_frames_from_video,
    extract_uniform_frames,
    process_local_videos_with_progress,
    download_video_from_url,
    content_scores_batched,
    YT_DLP_AVAILABLE,
)


def write_clip(path, scenes=3, frames_per_scene=30, size=(64, 48), fps=15):
    """Synthesize a video with abrupt color changes between scenes."""
    fourcc = cv2.VideoWriter_fourcc(*"MJPG")
    w = cv2.VideoWriter(str(path), fourcc, fps, size)
    assert w.isOpened()
    rng = np.random.default_rng(0)
    # scene colors engineered for large HSV deltas (hue AND value jumps),
    # kept < 246 so adding noise can't wrap uint8, and saturated so hue
    # stays stable under noise
    palette = [(0, 0, 120), (0, 230, 0), (120, 0, 120), (0, 120, 230),
               (230, 230, 0)]
    for s in range(scenes):
        color = palette[s % len(palette)]
        for _ in range(frames_per_scene):
            frame = np.full((size[1], size[0], 3), color, np.uint8)
            noise = rng.integers(0, 10, frame.shape, dtype=np.uint8)
            w.write(frame + noise)
    w.release()
    return str(path)


def test_url_allowlist():
    assert is_supported_video_url("https://www.youtube.com/watch?v=x")
    assert is_supported_video_url("https://youtu.be/abc")
    assert is_supported_video_url("https://x.com/user/status/1")
    assert not is_supported_video_url("https://example.com/video.mp4")
    assert not is_supported_video_url(None)
    assert not is_supported_video_url(123)


def test_detect_scenes(tmp_path):
    clip = write_clip(tmp_path / "clip.avi", scenes=3)
    scenes, info = detect_scenes(clip, threshold=30.0, min_scene_len=5)
    assert len(scenes) == 3, scenes
    assert scenes[0][0] == 0
    assert abs(scenes[0][1] - 30) <= 2
    assert info.fps == 15


def test_scene_extraction_filenames(tmp_path):
    clip = write_clip(tmp_path / "myvid.avi", scenes=2)
    out = tmp_path / "frames"
    ok, msg, frames = extract_frames_from_video(clip, str(out),
                                                frames_per_scene=2)
    assert ok, msg
    names = sorted(os.path.basename(f) for f in frames)
    assert names[0] == "myvid_scene000_frame000.jpg"   # reference scheme
    assert len(frames) == 4
    assert all(os.path.exists(f) for f in frames)


def test_uniform_extraction(tmp_path):
    clip = write_clip(tmp_path / "uni.avi", scenes=1, frames_per_scene=40)
    out = tmp_path / "frames"
    ok, msg, frames = extract_uniform_frames(clip, str(out), num_frames=5)
    assert ok and len(frames) == 5
    assert os.path.basename(frames[0]) == "uni_uniform_000.jpg"


def test_local_pipeline_timestamp_names(tmp_path):
    write_clip(tmp_path / "vids" / "a.avi" if (tmp_path / "vids").mkdir() or True
               else None, scenes=2)
    out = tmp_path / "frames"
    msg = process_local_videos_with_progress(str(tmp_path / "vids"), str(out),
                                             fps=2, thresh=30.0)
    assert msg.startswith("✅ Completed!"), msg
    names = os.listdir(out)
    assert names
    import re
    assert all(re.match(r"a_\d{2}m\d{2}s\.jpg", n) for n in names), names


def test_local_pipeline_empty_folder(tmp_path):
    (tmp_path / "empty").mkdir()
    msg = process_local_videos_with_progress(str(tmp_path / "empty"),
                                             str(tmp_path / "out"), 2, 30.0)
    assert msg.startswith("❌ No video files")


def test_download_gating():
    if YT_DLP_AVAILABLE:
        pytest.skip("yt-dlp installed")
    ok, msg, path = download_video_from_url(
        "https://youtube.com/watch?v=x", "/tmp/nowhere")
    assert not ok and "yt-dlp not available" in msg


def test_batched_scorer_matches_loop(tmp_path):
    clip = write_clip(tmp_path / "clip.avi", scenes=2, frames_per_scene=10)
    cap = cv2.VideoCapture(clip)
    frames = []
    while True:
        ret, f = cap.read()
        if not ret:
            break
        frames.append(cv2.cvtColor(f, cv2.COLOR_BGR2HSV))
    cap.release()
    hsv = np.stack(frames)
    scores = np.asarray(content_scores_batched(hsv))
    assert scores.shape[0] == hsv.shape[0] - 1
    # the scene cut transition must be the clear maximum
    assert scores.argmax() == 9
