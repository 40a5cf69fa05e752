"""ChatUniVi eval battery tail: scienceqa runner/scorer + dual-question
consistency runner (reference model_vqa_scienceqa.py,
evaluate_science_qa.py, model_video_consistency.py)."""

import json
import subprocess
import sys

import numpy as np
import pytest

ENV = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
       "JAX_PLATFORMS": "cpu", "HOME": "/root"}


# ----------------------------------------------------------------- scorer
def _problems():
    return {
        "p1": {"choices": ["cat", "dog"], "answer": 0,
               "subject": "natural science", "hint": "", "image": "x.png",
               "grade": "grade3"},
        "p2": {"choices": ["up", "down", "left"], "answer": 2,
               "subject": "social science", "hint": "a hint", "image": None,
               "grade": "grade8"},
        "p3": {"choices": ["yes", "no"], "answer": 1,
               "subject": "language science", "hint": "", "image": None,
               "grade": "grade1"},
    }


def test_scienceqa_scorer_regex_and_fallback():
    from open_pandora_tpu.eval.scienceqa import score_predictions
    preds = {
        # regex path: exactly one "The answer is X." match
        "p1": {"question_id": "p1", "prompt": "(A) cat (B) dog",
               "text": "reasoning\n The answer is A.", "pred": "B"},
        # fallback path: no regex match -> use first-token-logits pred
        "p2": {"question_id": "p2", "prompt": "(A) up (B) down (C) left",
               "text": "no letter here", "pred": "C"},
        # out-of-range parsed letter -> random in-range index (seeded)
        "p3": {"question_id": "p3", "prompt": "(A) yes (B) no",
               "text": "The answer is Z.", "pred": "Z"},
    }
    import random
    random.seed(0)
    results, sqa = score_predictions(_problems(), ["p1", "p2", "p3"], preds)
    assert sqa["count"] == 3
    # p1 correct via regex, p2 correct via pred fallback
    ids_correct = {r["question_id"] for r in results["correct"]}
    assert {"p1", "p2"} <= ids_correct or {"p1", "p2"} <= (
        ids_correct | {r["question_id"] for r in results["incorrect"]})
    assert "p1" in ids_correct and "p2" in ids_correct
    # breakdown buckets populated per reference rules
    assert sqa["NAT"] == [1] and sqa["SOC"] == [1]
    assert sqa["IMG"] == [1] and sqa["TXT"] == [1]
    assert sqa["G1-6"][0] == 1 and sqa["G7-12"] == [1]
    assert sqa["acc"] == pytest.approx(100 * sqa["correct"] / 3)


def test_scienceqa_score_cli(tmp_path):
    base = tmp_path / "base"
    base.mkdir()
    (base / "problems.json").write_text(json.dumps(_problems()))
    (base / "pid_splits.json").write_text(json.dumps({"test": ["p1"]}))
    res = tmp_path / "answers.jsonl"
    res.write_text(json.dumps(
        {"question_id": "p1", "prompt": "(A) cat (B) dog",
         "text": "The answer is A.", "pred": "A"}) + "\n")
    out_f, out_r = tmp_path / "out.json", tmp_path / "result.json"
    from open_pandora_tpu.eval import scienceqa
    rc = scienceqa.main(["score", "--base-dir", str(base),
                         "--result-file", str(res),
                         "--output-file", str(out_f),
                         "--output-result", str(out_r)])
    assert rc == 0
    sqa = json.loads(out_r.read_text())
    assert sqa["acc"] == 100.0 and sqa["count"] == 1


# ------------------------------------------------------------ segments
def test_segments_from_prompt_video_run():
    """A run of consecutive <image> sentinels becomes ONE VideoSegment."""
    jnp = pytest.importorskip("jax.numpy")
    from open_pandora_tpu.eval.chatunivi_qa import segments_from_prompt
    from open_pandora_tpu.models.world_model import (ImageSegment,
                                                     TokenSegment,
                                                     VideoSegment)
    from open_pandora_tpu.pipeline.tokenizers import load_tokenizer
    tok = load_tokenizer(None)
    segs = segments_from_prompt(tok, "hi " + "<image>" * 3 + "\nbye", 3)
    kinds = [type(s) for s in segs]
    assert kinds == [TokenSegment, VideoSegment, TokenSegment]
    assert segs[1].indices == (0, 1, 2)
    segs = segments_from_prompt(tok, "a <image> b <image> c", 2)
    assert [type(s) for s in segs] == [TokenSegment, ImageSegment,
                                       TokenSegment, ImageSegment,
                                       TokenSegment]
    assert segs[1].index == 0 and segs[3].index == 1


def test_strip_stop():
    from open_pandora_tpu.eval.chatunivi_qa import strip_stop
    assert strip_stop("hello ### Human: x", "###") == "hello"
    assert strip_stop("plain", "###") == "plain"
    assert strip_stop("ends###", "###") == "ends"


# ------------------------------------------------------- subprocess smoke
@pytest.mark.slow
@pytest.mark.clismoke
def test_scienceqa_runner_debug(tmp_path):
    from PIL import Image
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(
        img_dir / "q1.png")
    qfile = tmp_path / "q.json"
    qfile.write_text(json.dumps([{
        "id": "q1", "image": "q1.png",
        "conversations": [
            {"value": "<image>\nIs this (A) black or (B) white?"},
            {"value": "A"}]}]))
    out = tmp_path / "ans.jsonl"
    r = subprocess.run(
        [sys.executable, "-m", "open_pandora_tpu.eval.scienceqa", "run",
         "--questions", str(qfile), "--image-folder", str(img_dir),
         "--out", str(out), "--debug"],
        capture_output=True, text=True, timeout=900, env=ENV,
        cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    rec = json.loads(out.read_text().strip())
    assert rec["question_id"] == "q1"
    assert rec["pred"] in ("A", "B")
    assert "The answer is" in rec["text"]
    assert rec["prompt"].startswith("<image>")


@pytest.mark.slow
@pytest.mark.clismoke
def test_consistency_runner_debug(tmp_path):
    from open_pandora_tpu.utils.video_io import write_video
    vdir = tmp_path / "vids"
    vdir.mkdir()
    frames = np.random.default_rng(0).integers(
        0, 255, (6, 48, 64, 3), np.uint8)
    write_video(str(vdir / "clip.mp4"), frames)
    qfile = tmp_path / "q.json"
    qfile.write_text(json.dumps([{
        "video_name": "clip", "Q1": "What is shown?",
        "Q2": "Describe the video.", "A": "noise"}]))
    out = tmp_path / "ans.jsonl"
    r = subprocess.run(
        [sys.executable, "-m", "open_pandora_tpu.eval.consistency",
         "--questions", str(qfile), "--video-folder", str(vdir),
         "--out", str(out), "--max-frames", "4", "--debug"],
        capture_output=True, text=True, timeout=900, env=ENV,
        cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    rec = json.loads(out.read_text().strip())
    for k in ("video_name", "prompt_1", "text_1", "prompt_2", "text_2",
              "answer", "model_id"):
        assert k in rec, k
    # the record must format cleanly under the pairwise judge rubric
    from open_pandora_tpu.eval.gpt_judge import RUBRICS, _qa_fields
    rubric = RUBRICS["consistency"]
    msgs = rubric.messages(_qa_fields(rec, rubric))
    assert rec["prompt_1"] in msgs[1]["content"]
    assert rec["text_2"] in msgs[1]["content"]
