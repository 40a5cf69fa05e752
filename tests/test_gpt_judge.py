"""GPT-judge eval plumbing end-to-end on a stub endpoint (reference
ChatUniVi/eval/evaluate/*: rubrics, resume loop, score aggregation)."""

import json

import pytest

from open_pandora_tpu.eval.gpt_judge import (RUBRICS, annotate,
                                             combine_and_score,
                                             load_predictions,
                                             parse_judgement,
                                             summarize_gpt_review)


def stub_judge(messages):
    # score by whether the Predicted Answer LINE contains the answer word
    # (substring over the whole tail would match 'indiCATing' in the rubric)
    user = messages[1]["content"]
    pred_line = next(l for l in user.split("\n")
                     if l.startswith("Predicted Answer"))
    ok = "cat" in pred_line
    return "{'pred': '%s', 'score': %d}" % ("yes" if ok else "no",
                                            5 if ok else 1)


def test_rubric_registry_complete():
    assert set(RUBRICS) == {"video_qa", "correctness",
                            "detailed_orientation", "context", "temporal",
                            "consistency"}
    # all five benchmark rubrics are 0-5 integer-score prompts
    for r in RUBRICS.values():
        assert "integer value between 0 and 5" in r.user_template


def test_parse_judgement_tolerates_reference_glitch():
    assert parse_judgement("{''score': 4}") == {"score": 4}
    assert parse_judgement("Sure: {'pred': 'yes', 'score': 5} done") == \
        {"pred": "yes", "score": 5}
    with pytest.raises(ValueError):
        parse_judgement("no dict here")


def test_annotate_resume_and_score(tmp_path):
    preds = [
        {"prompt": "what animal", "answer": "a cat", "text": "a cat"},
        {"prompt": "what animal", "answer": "a cat", "text": "a dog"},
        {"prompt": "what color", "answer": "red", "text": "a red cat"},
    ]
    out = tmp_path / "ann"
    n = annotate(preds, RUBRICS["video_qa"], stub_judge, str(out))
    assert n == 3
    # resume: nothing left to do
    assert annotate(preds, RUBRICS["video_qa"], stub_judge, str(out)) == 0
    stats = combine_and_score(str(out), str(tmp_path / "combined.json"))
    assert stats["n"] == 3
    assert stats["yes"] == 2 and stats["no"] == 1
    assert stats["accuracy"] == pytest.approx(2 / 3)
    assert stats["average_score"] == pytest.approx((5 + 5 + 1) / 3)
    combined = json.loads((tmp_path / "combined.json").read_text())
    assert len(combined) == 3


def test_pairwise_consistency_rubric():
    r = RUBRICS["consistency"]
    msgs = r.messages({"q1": "Q1?", "q2": "Q2?", "a": "ans",
                       "pred1": "p1", "pred2": "p2"})
    assert "Question 1: Q1?" in msgs[1]["content"]
    assert "Predicted Answer to Question 2: p2" in msgs[1]["content"]


def test_load_predictions_json_and_jsonl(tmp_path):
    recs = [{"prompt": "q", "answer": "a", "text": "t"}] * 2
    (tmp_path / "a.json").write_text(json.dumps(recs))
    (tmp_path / "b.jsonl").write_text(
        "\n".join(json.dumps(r) for r in recs))
    assert load_predictions(str(tmp_path / "a.json")) == recs
    assert load_predictions(str(tmp_path / "b.jsonl")) == recs


def test_summarize_gpt_review(tmp_path):
    rows = [
        {"category": "conv", "tuple": [8.0, 6.0], "question_id": 1},
        {"category": "conv", "tuple": [6.0, 6.0], "question_id": 2},
        {"category": "detail", "tuple": [10.0, 5.0], "question_id": 3},
    ]
    p = tmp_path / "review.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    out = summarize_gpt_review(str(p))
    assert out["conv"]["means"] == [7.0, 6.0]
    assert out["conv"]["ratio_pct"] == pytest.approx(85.7, abs=0.1)
    assert out["all"]["means"][0] == pytest.approx(8.0)
    # ignore list drops question 3
    out2 = summarize_gpt_review(str(p), ignore=[3])
    assert "detail" not in out2
