"""Tokenizer adapters.

The reference loads the released checkpoint's LLaMA tokenizer via
AutoTokenizer (model.py:495-498) and OpenCLIP's BPE for the text encoder.
Both need vocab asset files that are external downloads; this module:

  - LlamaTokenizerAdapter: wraps a transformers tokenizer from a LOCAL path
    when available (the deployment path).
  - HashFallbackTokenizer: a deterministic stand-in that maps words to
    stable ids inside the base vocab — lets the full pipeline run
    shape-correctly without tokenizer assets (demo/smoke only; NOT the real
    vocabulary — generated conditioning is meaningless without real weights
    anyway, which also require the real tokenizer).

Special ids (model.py:636,848): <image>=32000, [IMG_P]=32001, <img_s>=32002.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional

BOS_ID = 1
EOS_ID = 2
IMAGE_TOKEN_ID = 32000
IMG_PREFIX_TOKEN_ID = 32001
IMG_START_TOKEN_ID = 32002


class HashFallbackTokenizer:
    """Deterministic word -> id hashing into [1000, 31000)."""

    bos_token_id = BOS_ID
    eos_token_id = EOS_ID

    def encode(self, text: str, add_bos: bool = False) -> List[int]:
        ids = [BOS_ID] if add_bos else []
        for word in text.strip().split():
            h = int(hashlib.md5(word.lower().encode()).hexdigest(), 16)
            ids.append(1000 + h % 30000)
        return ids


class LlamaTokenizerAdapter:
    """transformers tokenizer from a local directory (sentencepiece model +
    added multimodal tokens)."""

    def __init__(self, path: str):
        from transformers import AutoTokenizer  # lazy

        self.tok = AutoTokenizer.from_pretrained(path, use_fast=False)
        self.bos_token_id = self.tok.bos_token_id
        self.eos_token_id = self.tok.eos_token_id

    def encode(self, text: str, add_bos: bool = False) -> List[int]:
        ids = self.tok.encode(text, add_special_tokens=False)
        return ([self.tok.bos_token_id] + ids) if add_bos else ids


CLIP_SOT = 49406
CLIP_EOT = 49407


def clip_fallback_encode(text: str, context_length: int = 77) -> List[int]:
    """Deterministic fallback for the OpenCLIP BPE (real vocab file is an
    external asset): [SOT, hashed word ids, EOT, 0 pad] — the layout
    open_clip.tokenize produces."""
    ids = [CLIP_SOT]
    for word in text.strip().split():
        if len(ids) >= context_length - 1:
            break
        h = int(hashlib.md5(word.lower().encode()).hexdigest(), 16)
        ids.append(1000 + h % 48000)
    ids.append(CLIP_EOT)
    ids += [0] * (context_length - len(ids))
    return ids[:context_length]


def load_tokenizer(path: Optional[str] = None):
    """Local tokenizer if a path is given and loadable, else the fallback."""
    if path:
        try:
            return LlamaTokenizerAdapter(path)
        except Exception:
            pass
    return HashFallbackTokenizer()


def load_clip_tokenizer(merges_path: Optional[str] = None,
                        context_length: int = 77):
    """Returns `encode(text, context_length=77) -> List[int]` in the
    open_clip.tokenize layout. Uses the REAL byte-level BPE
    (pipeline/clip_bpe.py) when a merges file is available — pass a path,
    set $PANDORA_CLIP_BPE, or drop the asset at assets/bpe_simple_vocab_16e6
    .txt[.gz]; otherwise falls back to the hash stand-in (smoke only)."""
    import os

    from open_pandora_tpu.core import flags
    candidates = [merges_path, flags.flag("PANDORA_CLIP_BPE")]
    root = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    for name in ("bpe_simple_vocab_16e6.txt.gz", "bpe_simple_vocab_16e6.txt"):
        candidates.append(os.path.join(root, "assets", name))
    for cand in candidates:
        if cand and os.path.exists(cand):
            from open_pandora_tpu.pipeline.clip_bpe import (CLIPBPETokenizer,
                                                            clip_tokenize)
            tok = CLIPBPETokenizer(cand)

            def encode(text: str, context_length: int = context_length):
                return clip_tokenize([text], tok, context_length)[0].tolist()

            encode.is_real_bpe = True
            return encode
    clip_fallback_encode.is_real_bpe = False
    return clip_fallback_encode
