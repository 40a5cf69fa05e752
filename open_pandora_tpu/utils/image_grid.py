"""Sample-grid logging — the ImageLogger equivalent.

Behavioral spec: /root/reference/utils/callbacks.py:15-101 (rank-zero
periodic sample rendering to disk/TB) and utils/save_video.py grid helpers.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
from PIL import Image


def video_grid(video: np.ndarray, max_frames: int = 8) -> np.ndarray:
    """(t, h, w, 3) float [-1,1] or uint8 -> one row of frames (h, w*n, 3)
    uint8."""
    v = np.asarray(video)
    if v.dtype != np.uint8:
        v = ((np.clip(v, -1, 1) + 1) * 127.5).astype(np.uint8)
    step = max(1, v.shape[0] // max_frames)
    frames = v[::step][:max_frames]
    return np.concatenate(list(frames), axis=1)


def save_sample_grid(path: str, videos: np.ndarray,
                     max_items: int = 4) -> str:
    """(b, t, h, w, 3) -> stacked per-sample frame rows as one PNG."""
    rows = [video_grid(v) for v in videos[:max_items]]
    grid = np.concatenate(rows, axis=0)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(grid).save(path)
    return path
