"""Pipeline tests: preprocessing, video IO, and the multi-round ChatWM
session through the CLI (tiny config, random weights)."""

import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from open_pandora_tpu.pipeline.preprocess import (clip_tower_preprocess,
                                                  diffusion_preprocess)
from open_pandora_tpu.pipeline.tokenizers import (HashFallbackTokenizer,
                                                  load_tokenizer)
from open_pandora_tpu.utils.video_io import (concat_rounds, frames_to_uint8,
                                             read_video_frames, write_video)

pytestmark = pytest.mark.slow  # compile-heavy on the 1-core host


def _img(w=100, h=60):
    rng = np.random.RandomState(0)
    return Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8))


def test_clip_preprocess_shape_and_norm():
    out = clip_tower_preprocess(_img(), 28)
    assert out.shape == (28, 28, 3)
    assert out.dtype == np.float32
    assert -3 < out.mean() < 3


def test_diffusion_preprocess_range():
    out = diffusion_preprocess(_img(400, 100), (32, 64))
    assert out.shape == (32, 64, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_tokenizer_fallback_deterministic():
    tok = HashFallbackTokenizer()
    a = tok.encode("a car drives", add_bos=True)
    b = tok.encode("a car drives", add_bos=True)
    assert a == b and a[0] == 1
    assert all(0 < i < 32000 for i in a)
    assert isinstance(load_tokenizer(None), HashFallbackTokenizer)
    assert isinstance(load_tokenizer("/nonexistent"), HashFallbackTokenizer)


def test_frames_to_uint8():
    x = np.array([[[[-1.0, 0.0, 1.0]]]])
    out = frames_to_uint8(x)
    assert out.tolist() == [[[[0, 127, 255]]]]


def test_concat_rounds_trimming():
    rounds = [np.full((16, 2, 2, 3), i, np.uint8) for i in range(3)]
    out = concat_rounds(rounds)
    # rounds 0,1 contribute 12 frames each; final contributes 16
    assert out.shape[0] == 12 + 12 + 16
    assert (out[:12] == 0).all() and (out[12:24] == 1).all() \
        and (out[24:] == 2).all()


def test_video_write_read_roundtrip(tmp_path):
    # smooth gradient (lossy codecs destroy pure noise)
    g = np.linspace(0, 255, 64, dtype=np.uint8)
    frame = np.stack(np.broadcast_arrays(g[:, None], g[None, :],
                                         np.uint8(128)), -1).astype(np.uint8)
    frames = np.stack([np.roll(frame, i, axis=1) for i in range(8)])
    path = str(tmp_path / "test.mp4")
    write_video(path, frames, fps=8)
    back, fps = read_video_frames(path)
    assert back.shape == (8, 64, 64, 3)
    assert abs(fps - 8) < 0.5
    assert np.abs(back.astype(int) - frames.astype(int)).mean() < 16


def test_read_video_uniform_sampling(tmp_path):
    frames = np.stack([np.full((32, 32, 3), i * 10, np.uint8)
                       for i in range(20)])
    path = str(tmp_path / "ramp.mp4")
    write_video(path, frames, fps=10)
    out, _ = read_video_frames(path, num_frames=4)
    assert out.shape[0] == 4
    # values increase over sampled frames
    means = out.reshape(4, -1).mean(1)
    assert means[0] < means[-1]


@pytest.mark.clismoke
def test_cli_multiround_debug(tmp_path):
    """Full product loop through the real CLI: 2 rounds, tiny config."""
    img_path = str(tmp_path / "in.png")
    _img(64, 48).save(img_path)
    out_path = str(tmp_path / "out.mp4")
    r = subprocess.run(
        [sys.executable, "-m", "open_pandora_tpu.pipeline.cli",
         "--image", img_path, "--action", "move forward",
         "--action", "turn left", "--out", out_path, "--debug"],
        capture_output=True, text=True, timeout=1200,
        env={"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
             "JAX_PLATFORMS": "cpu", "HOME": "/root"},
        cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    frames, _ = read_video_frames(out_path)
    # 2 rounds of 4 frames (tiny T=4), first trimmed by 4 -> 0+4? tiny T=4:
    # round0 contributes T-4=0, final contributes 4
    assert frames.shape[0] == 4
