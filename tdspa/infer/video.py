"""Video I/O (reference inference.py:67-94)."""

from __future__ import annotations

import numpy as np


def load_video(video_path: str, max_frames: int | None = None):
    """Read frames (BGR->RGB), capped at max_frames. Returns (frames, fps)."""
    import cv2

    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise ValueError(f"Could not open video file: {video_path}")
    frames = []
    fps = cap.get(cv2.CAP_PROP_FPS)
    while cap.isOpened():
        ret, frame = cap.read()
        if not ret:
            break
        if max_frames and len(frames) >= max_frames:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    if not frames:
        raise ValueError(f"No frames loaded from video: {video_path}")
    return np.array(frames), fps


def save_video(frames_rgb: np.ndarray, video_path: str, fps: float = 30.0) -> None:
    """Write [T H W 3] RGB uint8 frames as mp4 (avc1 with mp4v fallback)."""
    import cv2

    height, width = frames_rgb.shape[1:3]
    fourcc = cv2.VideoWriter_fourcc(*"avc1")
    writer = cv2.VideoWriter(video_path, fourcc, fps, (width, height))
    if not writer.isOpened():
        writer = cv2.VideoWriter(
            video_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (width, height)
        )
    for frame in frames_rgb:
        writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    writer.release()
