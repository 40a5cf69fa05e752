"""ChatUniVi benchmark runner — image/video QA over fixed question sets.

Behavioral spec: /root/reference/ChatUniVi/eval/model_video_qa.py (and the
model_vqa*/model_coco_vqa variants): read a json/jsonl question set, chunk
it across workers (get_chunk :23-31), for each question decode frames,
build the conversation prompt with <image>/<video> markers, greedy-generate
an answer, append {id, question, answer, ...} to an output jsonl. The
GPT-3.5 judging scripts (eval/evaluate/*) consume that jsonl — judging
needs an external API and is out of scope here; the generation side is the
runner below.

Usage:
  python -m open_pandora_tpu.eval.chatunivi_qa --questions q.jsonl \
      --media-dir DIR --out answers.jsonl [--ckpt ...] [--tokenizer ...]
      [--num-chunks N --chunk-idx I] [--max-new-tokens 64] [--debug]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys


def get_chunk(items, num_chunks: int, idx: int):
    """eval/model_video_qa.py:23-31: contiguous split."""
    size = math.ceil(len(items) / num_chunks)
    return items[idx * size: (idx + 1) * size]


def load_questions(path: str):
    with open(path) as f:
        if path.endswith(".jsonl"):
            return [json.loads(ln) for ln in f if ln.strip()]
        return json.load(f)


def build_parser():
    p = argparse.ArgumentParser("chatunivi-qa")
    p.add_argument("--questions", required=True)
    p.add_argument("--media-dir", default=".")
    p.add_argument("--out", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--num-chunks", type=int, default=1)
    p.add_argument("--chunk-idx", type=int, default=0)
    p.add_argument("--max-new-tokens", type=int, default=64)
    p.add_argument("--video-frames", type=int, default=16)
    p.add_argument("--debug", action="store_true")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from open_pandora_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from open_pandora_tpu.models.llama_generate import greedy_generate
    from open_pandora_tpu.models.world_model import (ImageSegment,
                                                     MultimodalPrompt,
                                                     TokenSegment,
                                                     VideoSegment, WorldModel)
    from open_pandora_tpu.pipeline.preprocess import clip_tower_preprocess
    from open_pandora_tpu.pipeline.tokenizers import load_tokenizer
    from open_pandora_tpu.utils.video_io import read_video_frames

    if args.debug:
        from tests.test_llm_stack import TINY_LLAMA, TINY_QF, TINY_CONN
        from tests.test_dynamicrafter import TINY as TINY_DC, H, W
        from open_pandora_tpu.core.config import CLIPTowerConfig, ClusterConfig
        cfg = dataclasses.replace(
            TINY_DC, llama=TINY_LLAMA,
            clip_tower=CLIPTowerConfig(image_size=28, patch_size=14, width=64,
                                       layers=2, heads=2),
            cluster=ClusterConfig(spatial_rates=(2, 1, 1), temporal_rate=0.5),
            qformer=TINY_QF, connector=TINY_CONN)
        height, width = H, W
        args.max_new_tokens = min(args.max_new_tokens, 4)
    else:
        from open_pandora_tpu.core.config import PandoraConfig
        cfg = PandoraConfig()
        height, width = 320, 512

    wm = WorldModel(cfg)
    if args.ckpt:
        from open_pandora_tpu.core.checkpoint import load_params
        params = load_params(args.ckpt, wm, height=height, width=width)
    else:
        print("[qa] NO CHECKPOINT — random weights (smoke mode)", flush=True)
        params = wm.init_params(jax.random.PRNGKey(0), height=height,
                                width=width)
    tok = load_tokenizer(args.tokenizer)
    tower_size = cfg.clip_tower.image_size

    questions = get_chunk(load_questions(args.questions), args.num_chunks,
                          args.chunk_idx)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)

    with open(args.out, "w") as fout:
        for q in questions:
            text = q.get("text") or q.get("question") or ""
            ids = jnp.asarray([tok.encode(text, add_bos=True)], jnp.int32)
            segments = [TokenSegment(ids[:, :1])]
            images = []
            if q.get("video"):
                frames, _ = read_video_frames(
                    os.path.join(args.media_dir, q["video"]),
                    num_frames=args.video_frames)
                for fr in frames:
                    images.append(clip_tower_preprocess(Image.fromarray(fr),
                                                        tower_size))
                segments.append(VideoSegment(tuple(range(len(images)))))
            elif q.get("image"):
                img = Image.open(os.path.join(args.media_dir, q["image"]))
                images.append(clip_tower_preprocess(img, tower_size))
                segments.append(ImageSegment(0))
            segments.append(TokenSegment(ids[:, 1:]))
            img_arr = (jnp.asarray(np.stack(images))[None]
                       if images else None)
            prompt = MultimodalPrompt(segments=segments, images=img_arr)

            embeds, _ = wm.build_inputs_embeds(params, prompt)
            out_ids = greedy_generate(wm.llama, params["llama"], embeds,
                                      max_new_tokens=args.max_new_tokens)
            ids_list = [int(i) for i in np.asarray(out_ids[0])]
            answer = (tok.tok.decode(ids_list, skip_special_tokens=True)
                      if hasattr(tok, "tok") else
                      " ".join(str(i) for i in ids_list))
            rec = {"id": q.get("id") or q.get("question_id"),
                   "question": text, "answer": answer}
            fout.write(json.dumps(rec) + "\n")
            fout.flush()
    print(f"[qa] wrote {len(questions)} answers -> {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
