"""Conversation templates + SFT preprocessing (reference
ChatUniVi/conversation.py, train/train.py:298-848, mm_utils.py:18)."""

import json

import numpy as np
import pytest

from open_pandora_tpu.data.sft import (IGNORE_INDEX, IMAGE_SENTINEL,
                                       SFTExample, collate_examples,
                                       example_from_conversation,
                                       lower_to_chunks, preprocess_multimodal,
                                       preprocess_v1, tokenize_with_images)
from open_pandora_tpu.pipeline.conversation import conv_templates
from open_pandora_tpu.pipeline.tokenizers import HashFallbackTokenizer

TOK = HashFallbackTokenizer()


def test_conversation_templates_render():
    conv = conv_templates["v1"].copy()
    conv.append_message(conv.roles[0], "hello")
    conv.append_message(conv.roles[1], "world")
    p = conv.get_prompt()
    assert p.endswith("USER: hello ASSISTANT: world</s>")
    assert p.startswith("A chat between")

    conv = conv_templates["simple"].copy()
    conv.append_message(conv.roles[0], "hi")
    conv.append_message(conv.roles[1], None)
    p = conv.get_prompt()
    assert "###Human: hi###Assistant:" in p

    conv = conv_templates["llama_2"].copy()
    conv.append_message(conv.roles[0], "q")
    conv.append_message(conv.roles[1], "a")
    p = conv.get_prompt()
    assert "[INST]" in p and "<</SYS>>" in p and p.endswith("a </s>")


def test_tokenize_with_images_sentinels():
    ids = tokenize_with_images("a <image> b", TOK)
    # bos + a + sentinel + b
    assert ids[0] == TOK.bos_token_id
    assert ids.count(IMAGE_SENTINEL) == 1
    sent = ids.index(IMAGE_SENTINEL)
    assert sent == 2 and len(ids) == 4


def test_preprocess_multimodal_video_expansion():
    src = [{"from": "human", "value": "describe\n<video>"},
           {"from": "gpt", "value": "a cat"}]
    out = preprocess_multimodal([src], max_image_length=4)[0]
    # trailing video run moved to front, expanded to 4 <image>
    assert out[0]["value"].startswith("<image>" * 4)
    assert "describe" in out[0]["value"]
    assert "<video>" not in out[0]["value"]
    # original not mutated
    assert "<video>" in src[0]["value"]


def test_preprocess_v1_masks_human_turns():
    source = [{"from": "human", "value": "<image>\nwhat is shown"},
              {"from": "gpt", "value": "a red car"},
              {"from": "human", "value": "what color"},
              {"from": "gpt", "value": "red"}]
    ids, labels = preprocess_v1(source, TOK)
    assert len(ids) == len(labels)
    sup = [(t, l) for t, l in zip(ids, labels) if l != IGNORE_INDEX]
    # every supervised position carries its own id (next-token targets)
    assert all(t == l for t, l in sup)
    # the supervised ids = both assistant replies + the </s> separators
    reply = (TOK.encode("a red car</s>") + TOK.encode("red</s>"))
    assert [t for t, _ in sup] == reply
    # image sentinel exists and is masked
    i = ids.index(IMAGE_SENTINEL)
    assert labels[i] == IGNORE_INDEX


def test_lower_to_chunks_video_run():
    ids = [1, 5, IMAGE_SENTINEL, IMAGE_SENTINEL, IMAGE_SENTINEL, 7]
    labels = [IGNORE_INDEX, 5, IGNORE_INDEX, IGNORE_INDEX, IGNORE_INDEX, 7]
    ci, cl, runs = lower_to_chunks(ids, labels)
    assert ci == [[1, 5], [7]]
    assert cl == [[IGNORE_INDEX, 5], [7]]
    assert runs == [3]


def test_example_and_collate(tmp_path):
    source = [{"from": "human", "value": "<image>\ndescribe"},
              {"from": "gpt", "value": "ok"}]
    exs = [example_from_conversation(source, TOK) for _ in range(2)]
    assert exs[0].signature == (2, 1, False)

    from tests.test_llm_stack import tiny_wm_cfg
    cfg = tiny_wm_cfg()
    exs = [SFTExample(e.chunk_ids, e.chunk_labels, n_images=1,
                      images=np.zeros((1, 28, 28, 3), np.float32))
           for e in exs]
    batch = collate_examples(exs, cfg, bucket=64)
    labels = np.asarray(batch["labels"])
    assert labels.shape[0] == 2
    prompt = batch["prompt"]
    total_text = sum(s.ids.shape[1] for s in prompt.segments
                     if hasattr(s, "ids"))
    assert total_text == 64  # bucketed (v1 system prompt is ~40 tokens)
    # feature span (rates 2+1+1 = 4) + text = label length
    assert labels.shape[1] == 64 + 4


@pytest.mark.slow  # ~18 s llm_step compile (round-5 re-tier)
def test_sft_loss_on_collated_batch():
    import jax

    from open_pandora_tpu.train.llm_step import sft_loss
    from tests.test_llm_stack import tiny_wm_fixture
    wm, params = tiny_wm_fixture()
    source = [{"from": "human", "value": "<image>\ndescribe the scene"},
              {"from": "gpt", "value": "a tiny test image"}]
    ex = example_from_conversation(source, TOK,
                                   images=np.zeros((1, 28, 28, 3),
                                                   np.float32))
    batch = collate_examples([ex, ex], wm.cfg, bucket=24)
    loss, metrics = sft_loss(wm, params, {}, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert int(metrics["n_supervised"]) > 0


@pytest.mark.slow  # ~20 s llm_step compile (round-5 re-tier)
def test_sft_loss_pad_invariant():
    """Mid-sequence pads (mixed chunk lengths in one batch) must not change
    the loss: the batched loss equals the supervised-token-weighted mean of
    the per-example unpadded losses (pads masked out of attention, RoPE
    positions pad-transparent)."""
    import jax

    from open_pandora_tpu.train.llm_step import sft_loss
    from tests.test_llm_stack import tiny_wm_fixture
    wm, params = tiny_wm_fixture()
    img = np.zeros((1, 28, 28, 3), np.float32)
    srcs = [
        # text BEFORE the image so chunk 0 (pre-image) lengths differ ->
        # the short example gets pads mid-sequence, ahead of supervised
        # answer tokens
        [{"from": "human", "value": "look <image> now answer"},
         {"from": "gpt", "value": "a dog runs"}],
        [{"from": "human",
          "value": "look very carefully at this <image> now answer"},
         {"from": "gpt", "value": "two dogs"}],
    ]
    exs = [example_from_conversation(s, TOK, images=img) for s in srcs]
    assert exs[0].signature == exs[1].signature
    assert len(exs[0].chunk_ids[0]) != len(exs[1].chunk_ids[0])

    def loss_of(batch):
        l, m = sft_loss(wm, params, {}, batch, jax.random.PRNGKey(0))
        return float(l), int(m["n_supervised"])

    l_batch, n_batch = loss_of(collate_examples(exs, wm.cfg))
    singles = [loss_of(collate_examples([e], wm.cfg)) for e in exs]
    assert n_batch == sum(n for _, n in singles)
    expected = sum(l * n for l, n in singles) / n_batch
    np.testing.assert_allclose(l_batch, expected, rtol=2e-5)


def test_conversation_dataset_roundtrip(tmp_path):
    from open_pandora_tpu.data.sft import ConversationDataset
    recs = [{"conversations": [
        {"from": "human", "value": "hello"},
        {"from": "gpt", "value": "hi there"}]} for _ in range(3)]
    p = tmp_path / "chat.json"
    p.write_text(json.dumps(recs))
    ds = ConversationDataset([str(p)], TOK)
    assert len(ds) == 3
    ex = ds[0]
    assert ex.signature == (1, 0, False)

    from tests.test_llm_stack import tiny_wm_cfg
    batches = list(ds.batches(2, tiny_wm_cfg(), bucket=16))
    assert len(batches) == 2  # 2 + leftover 1
    assert np.asarray(batches[0]["labels"]).shape[0] == 2
