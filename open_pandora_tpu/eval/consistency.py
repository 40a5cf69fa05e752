"""Dual-question video consistency runner.

Behavioral spec: /root/reference/ChatUniVi/eval/model_video_consistency.py
— for each sample {video_name, Q1, Q2, A}: locate the video under
--video-folder trying ['.mp4', '.avi', '.mov', '.mkv'], decode up to
MAX_IMAGE_LENGTH frames at ~1 fps (dataloader._get_rawvideo_dec), answer
BOTH questions independently over the same frames, and emit
{video_name, prompt_1, text_1, prompt_2, text_2, answer_id, model_id,
answer, metadata} jsonl — the exact record shape the consistency judge
rubric consumes (gpt_judge.BENCHMARK_5 pairwise fields / reference
evaluate_benchmark_5_consistency.py).

Usage:
  python -m open_pandora_tpu.eval.consistency --questions q.json \
      --video-folder DIR --out answers.jsonl [--ckpt ...] [--debug]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

VIDEO_FORMATS = (".mp4", ".avi", ".mov", ".mkv")


def find_video(folder: str, name: str):
    """model_video_consistency.py:126-131 — first existing extension."""
    for fmt in VIDEO_FORMATS:
        path = os.path.join(folder, f"{name}{fmt}")
        if os.path.exists(path):
            return path
    return None


def build_parser():
    p = argparse.ArgumentParser("video-consistency")
    p.add_argument("--questions", required=True)
    p.add_argument("--video-folder", default="")
    p.add_argument("--out", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--conv-mode", default="v1")
    p.add_argument("--num-chunks", type=int, default=1)
    p.add_argument("--chunk-idx", type=int, default=0)
    p.add_argument("--max-new-tokens", type=int, default=64)
    p.add_argument("--max-frames", type=int, default=16,
                   help="frame budget (reference MAX_IMAGE_LENGTH=64)")
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--debug", action="store_true")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from open_pandora_tpu.eval.chatunivi_qa import (decode_ids, get_chunk,
                                                    segments_from_prompt,
                                                    setup_model, strip_stop)
    from open_pandora_tpu.models.llama_generate import greedy_generate
    from open_pandora_tpu.models.world_model import MultimodalPrompt
    from open_pandora_tpu.pipeline.conversation import (SeparatorStyle,
                                                        conv_templates)
    from open_pandora_tpu.pipeline.preprocess import clip_tower_preprocess
    from open_pandora_tpu.utils.video_io import read_video_frames

    wm, params, tok, _, _ = setup_model(args.ckpt, args.tokenizer,
                                        args.debug)
    tower_size = wm.cfg.clip_tower.image_size
    max_new = 4 if args.debug else args.max_new_tokens

    with open(os.path.expanduser(args.questions)) as f:
        samples = json.load(f)
    samples = get_chunk(samples, args.num_chunks, args.chunk_idx)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)

    key = jax.random.PRNGKey(args.seed)

    def answer(question: str, images, n_img: int, k):
        qs = "<image>" * n_img + "\n" + question
        conv = conv_templates[args.conv_mode].copy()
        conv.append_message(conv.roles[0], qs)
        conv.append_message(conv.roles[1], None)
        stop_str = (conv.sep if conv.sep_style != SeparatorStyle.TWO
                    else conv.sep2)
        segs = segments_from_prompt(tok, conv.get_prompt(), n_img)
        embeds, _ = wm.build_inputs_embeds(
            params, MultimodalPrompt(segments=segs, images=images))
        out = greedy_generate(wm.llama, params["llama"], embeds,
                              max_new_tokens=max_new,
                              temperature=args.temperature, key=k)
        return strip_stop(decode_ids(tok, out[0]), stop_str)

    with open(os.path.expanduser(args.out), "w") as fout:
        for i, sample in enumerate(samples):
            name = sample["video_name"]
            path = find_video(args.video_folder, name)
            if path is None:
                print(f"[consistency] missing video: {name}", flush=True)
                continue
            frames, _ = read_video_frames(path, num_frames=args.max_frames)
            imgs = [clip_tower_preprocess(Image.fromarray(fr), tower_size)
                    for fr in frames]
            images = jnp.asarray(np.stack(imgs))[None]
            n_img = len(imgs)

            text_1 = answer(sample["Q1"], images, n_img,
                            jax.random.fold_in(key, 2 * i))
            text_2 = answer(sample["Q2"], images, n_img,
                            jax.random.fold_in(key, 2 * i + 1))

            fout.write(json.dumps({
                "video_name": name,
                "prompt_1": sample["Q1"], "text_1": text_1,
                "prompt_2": sample["Q2"], "text_2": text_2,
                "answer_id": f"vc-{i}", "model_id": "open-pandora-tpu",
                "answer": sample["A"], "metadata": {}}) + "\n")
            fout.flush()
    print(f"[consistency] wrote answers -> {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
