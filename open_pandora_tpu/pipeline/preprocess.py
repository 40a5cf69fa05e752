"""Host-side image preprocessing for both towers.

Behavioral spec:
  - CLIP ViT-L tower: HF CLIPImageProcessor defaults — resize shortest edge
    224 (bicubic), center-crop 224, scale 1/255, normalize with the OpenAI
    CLIP mean/std (reference: model.py:1172-1177 via
    vision_tower.image_processor).
  - diffusion branch: dynamic_resize (model.py:507-513) — resize shortest
    side to target height, center-crop (H, W), ToTensor + Normalize(0.5,0.5)
    -> [-1, 1].
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from PIL import Image

OPENAI_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
OPENAI_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _resize_shortest(img: Image.Image, target: int,
                     resample=Image.BICUBIC) -> Image.Image:
    w, h = img.size
    if w < h:
        nw, nh = target, round(h * target / w)
    else:
        nw, nh = round(w * target / h), target
    return img.resize((nw, nh), resample)


def _center_crop(arr: np.ndarray, ch: int, cw: int) -> np.ndarray:
    h, w = arr.shape[:2]
    top = max((h - ch) // 2, 0)
    left = max((w - cw) // 2, 0)
    return arr[top: top + ch, left: left + cw]


def clip_tower_preprocess(img: Image.Image, size: int = 224) -> np.ndarray:
    """-> (size, size, 3) float32, CLIP-normalized (HF CLIPImageProcessor)."""
    img = img.convert("RGB")
    img = _resize_shortest(img, size)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    arr = _center_crop(arr, size, size)
    return (arr - OPENAI_CLIP_MEAN) / OPENAI_CLIP_STD


def diffusion_preprocess(img: Image.Image,
                         hw: Tuple[int, int] = (320, 512)) -> np.ndarray:
    """dynamic_resize + Normalize(0.5, 0.5): -> (H, W, 3) float32 in [-1,1]."""
    h, w = hw
    img = img.convert("RGB")
    img = _resize_shortest(img, min(h, w), resample=Image.BILINEAR)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.shape[0] < h or arr.shape[1] < w:
        # shortest-side resize can undershoot the crop box for mismatched
        # aspect ratios — upscale to cover
        scale = max(h / arr.shape[0], w / arr.shape[1])
        img = img.resize((round(img.size[0] * scale), round(img.size[1] * scale)),
                         Image.BILINEAR)
        arr = np.asarray(img, dtype=np.float32) / 255.0
    arr = _center_crop(arr, h, w)
    return arr * 2.0 - 1.0


def clip_resampler_preprocess(img: Image.Image) -> np.ndarray:
    """Image for the OpenCLIP ViT-H embedder (DynamiCrafter cross-attn):
    [0, 1] float at native aspect; the model-side clip_preprocess resizes
    to 224 and normalizes (condition.py:326-339)."""
    return np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0
