"""CLI smoke for the measurement tools: argument surfaces parse and the
modules import cleanly on a CPU-only host (the heavy TPU bodies are
behind main()); prevents bit-rot of the perf/drift harnesses between
rounds."""

import subprocess
import sys


def _help(mod):
    return subprocess.run(
        [sys.executable, "-m", mod, "--help"], cwd="/root/repo",
        capture_output=True, text=True, timeout=240,
        env={"PATH": "/usr/bin:/bin", "PYTHONPATH": "/root/repo",
             "JAX_PLATFORMS": "cpu", "HOME": "/root"})


def test_profile_unet_help():
    r = _help("open_pandora_tpu.tools.profile_unet")
    assert r.returncode == 0, r.stderr
    assert "--profile" in r.stdout and "--iters" in r.stdout


def test_fused_drift_help():
    r = _help("open_pandora_tpu.tools.fused_drift")
    assert r.returncode == 0, r.stderr
    assert "--ddim-steps" in r.stdout


def test_hires_train_probe_help():
    r = _help("open_pandora_tpu.tools.hires_train_probe")
    assert r.returncode == 0, r.stderr
    assert "--steps" in r.stdout and "--optimizer" in r.stdout


def test_preflight_help():
    r = _help("open_pandora_tpu.tools.preflight")
    assert r.returncode == 0, r.stderr
    assert "--ab-multi" in r.stdout


def test_conv_bench_help():
    r = _help("open_pandora_tpu.tools.conv_bench")
    assert r.returncode == 0, r.stderr
    assert "--iters" in r.stdout


def test_scienceqa_help():
    r = _help("open_pandora_tpu.eval.scienceqa")
    assert r.returncode == 0, r.stderr
    assert "run" in r.stdout and "score" in r.stdout


def test_consistency_help():
    r = _help("open_pandora_tpu.eval.consistency")
    assert r.returncode == 0, r.stderr
    assert "--video-folder" in r.stdout
