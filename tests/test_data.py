"""Data pipeline tests: synthetic dataset, prefetch loader, WebVid CSV
handling + retry logic (with generated mp4 corpus), native preprocessing."""

import os

import numpy as np
import pytest

from open_pandora_tpu.data.webvid import (PrefetchLoader, SyntheticVideoDataset,
                                          WebVidDataset, resize_center_crop)
from open_pandora_tpu.pipeline.tokenizers import load_tokenizer
from open_pandora_tpu.utils.video_io import write_video

pytestmark = pytest.mark.slow  # compile-heavy on the 1-core host


def test_synthetic_dataset_contract():
    ds = SyntheticVideoDataset(video_length=4, resolution=(32, 64),
                               clip_size=28, length=8)
    s = ds[0]
    assert s["video"].shape == (4, 32, 64, 3)
    assert s["cond_frames"].shape == (1, 32, 64, 3)
    assert s["cond_image"].shape == (28, 28, 3)
    assert -1 <= s["video"].min() and s["video"].max() <= 1
    assert 0 <= s["cond_image"].min() and s["cond_image"].max() <= 1
    # deterministic per index
    np.testing.assert_array_equal(ds[3]["video"], ds[3]["video"])


def test_prefetch_loader_batches():
    ds = SyntheticVideoDataset(video_length=2, resolution=(16, 16),
                               clip_size=16, length=10)
    loader = PrefetchLoader(ds, batch_size=4, text_len=7, num_workers=2,
                            shard=False, llm_tokenizer=load_tokenizer(),
                            llm_text_len=8)
    batches = list(loader.epoch(0))
    assert len(batches) == 2  # 10 // 4
    b = batches[0]
    assert b["video"].shape == (4, 2, 16, 16, 3)
    assert b["text_tokens"].shape == (4, 7)
    assert b["llm_text_tokens"].shape == (4, 8)
    assert b["llm_text_tokens"][0, 0] == 1  # bos
    assert b["fps"].dtype == np.int32
    # epoch shuffling differs
    b2 = list(loader.epoch(1))[0]
    assert not np.array_equal(b["video"], b2["video"])


def _make_corpus(root, n=3, frames=12, broken_idx=None):
    os.makedirs(os.path.join(root, "videos", "p0"), exist_ok=True)
    rows = ["videoid,page_dir,name"]
    for i in range(n):
        path = os.path.join(root, "videos", "p0", f"{i}.mp4")
        if broken_idx == i:
            with open(path, "wb") as f:
                f.write(b"not a video")
        else:
            g = np.linspace(0, 255, 48, dtype=np.uint8)
            frame = np.stack(np.broadcast_arrays(
                g[:, None], g[None, :], np.uint8(i * 40)), -1).astype(np.uint8)
            vid = np.stack([np.roll(frame, j, 1) for j in range(frames)])
            write_video(path, vid, fps=8)
        rows.append(f"{i},p0,caption number {i}")
    meta = os.path.join(root, "meta.csv")
    with open(meta, "w") as f:
        f.write("\n".join(rows))
    return meta


def test_webvid_dataset(tmp_path):
    meta = _make_corpus(str(tmp_path), n=3, frames=12)
    ds = WebVidDataset(meta, str(tmp_path), video_length=4,
                       resolution=(32, 32), frame_stride=2,
                       rand_cond_frame=True, seed=0)
    assert len(ds) == 3
    s = ds[0]
    assert s["video"].shape == (4, 32, 32, 3)
    assert s["cond_image"].shape == (224, 224, 3)
    assert s["caption"].startswith("caption number")
    assert s["frame_stride"] >= 1


def test_webvid_retry_skips_broken(tmp_path):
    meta = _make_corpus(str(tmp_path), n=3, frames=12, broken_idx=0)
    ds = WebVidDataset(meta, str(tmp_path), video_length=4,
                       resolution=(32, 32), frame_stride=1, seed=0)
    s = ds[0]  # index 0 broken -> falls through to 1 (webvid.py:104-157)
    assert s["video"].shape == (4, 32, 32, 3)


def test_resize_center_crop_shapes():
    frames = np.zeros((2, 30, 60, 3), np.uint8)
    out = resize_center_crop(frames, 32, 32)
    assert out.shape == (2, 32, 32, 3)


# ---------------------------------------------------------------------------
# native preprocessing
# ---------------------------------------------------------------------------


def test_native_preproc_matches_fallback():
    from open_pandora_tpu.native import (have_native, _numpy_fallback,
                                         _resize_dims,
                                         resize_center_crop_normalize,
                                         u8_to_pm1)
    frames = np.random.RandomState(0).randint(0, 256, (4, 50, 80, 3), np.uint8)
    out = resize_center_crop_normalize(frames, (32, 48),
                                       scale=(2.0,) * 3, offset=(-1.0,) * 3)
    assert out.shape == (4, 32, 48, 3)
    rh, rw = _resize_dims(50, 80, 32, 48)
    ref = _numpy_fallback(frames, (32, 48), (rh, rw),
                          np.float32([2] * 3), np.float32([-1] * 3))
    assert np.abs(out - ref).mean() < 0.02  # bilinear rounding differences
    x = u8_to_pm1(np.array([[0, 255]], np.uint8))
    np.testing.assert_allclose(x, [[-1.0, 1.0]], atol=1e-6)
