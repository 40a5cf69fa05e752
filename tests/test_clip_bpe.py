"""CLIP byte-level BPE tests over a synthetic merges table.

The algorithm (byte->unicode table, merge ranks, regex split, tokenize
layout) is fully testable without the real asset; the real-asset equivalence
check vs open_clip.tokenize is documented in pipeline/clip_bpe.py.
"""

import numpy as np

from open_pandora_tpu.pipeline.clip_bpe import (CLIPBPETokenizer,
                                                bytes_to_unicode,
                                                clip_tokenize)

MERGES = [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o</w>"),
          ("c", "a"), ("ca", "t</w>")]


def make_tok():
    return CLIPBPETokenizer(merges=MERGES)


def test_bytes_to_unicode_reversible():
    b2u = bytes_to_unicode()
    assert len(b2u) == 256
    assert len(set(b2u.values())) == 256
    assert b2u[ord("a")] == "a"          # printable ascii maps to itself
    assert b2u[ord(" ")] != " "          # whitespace remapped


def test_vocab_layout_and_size():
    tok = make_tok()
    # 256 byte tokens + 256 end-of-word variants + merges + SOT/EOT
    assert tok.vocab_size == 512 + len(MERGES) + 2
    assert tok.sot_token == tok.vocab_size - 2
    assert tok.eot_token == tok.vocab_size - 1
    # the standard asset (48894 merges kept by the slice) yields open_clip's
    # 49408-token vocab: 512 byte(+</w>) tokens + merges + SOT/EOT
    assert 512 + (49152 - 256 - 2 + 1 - 1) + 2 == 49408


def test_merge_order_followed():
    tok = make_tok()
    # "hello" -> h e l l o</w> -> (h e) -> (l l) -> (he ll) -> (hell o</w>)
    assert tok.bpe("hello") == "hello</w>"
    ids = tok.encode("hello")
    assert ids == [tok.encoder["hello</w>"]]
    # partial merges only: "hell" -> hell + l</w>? 'hell' = h e l l</w>:
    # (h e) -> he l l</w>; (l, l</w>) not a merge; (he, l) not a merge
    assert tok.bpe("hell") == "he l l</w>"


def test_unknown_word_falls_back_to_bytes():
    tok = make_tok()
    ids = tok.encode("zq")
    assert ids == [tok.encoder["z"], tok.encoder["q</w>"]]


def test_decode_roundtrip():
    tok = make_tok()
    assert tok.decode(tok.encode("hello cat")).strip() == "hello cat"


def test_regex_split_and_lowercase():
    tok = make_tok()
    # case-folded, apostrophe suffix split off, punctuation separate
    ids_upper = tok.encode("HELLO")
    ids_lower = tok.encode("hello")
    assert ids_upper == ids_lower
    ids = tok.encode("cat's")
    assert ids[0] == tok.encoder["cat</w>"]   # "cat" then "'s"


def test_tokenize_layout():
    tok = make_tok()
    out = clip_tokenize(["hello cat", ""], tok, context_length=8)
    assert out.shape == (2, 8)
    assert out[0, 0] == tok.sot_token
    assert out[0, 3] == tok.eot_token         # sot hello cat eot
    assert (out[0, 4:] == 0).all()
    assert out[1, 0] == tok.sot_token and out[1, 1] == tok.eot_token


def test_tokenize_truncation_forces_eot():
    tok = make_tok()
    out = clip_tokenize(["hello " * 30], tok, context_length=8)
    assert out[0, -1] == tok.eot_token
    assert (out[0] != 0).all()


def test_merges_file_loading(tmp_path):
    p = tmp_path / "merges.txt"
    p.write_text("#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in MERGES))
    tok = CLIPBPETokenizer(str(p))
    assert tok.vocab_size == 512 + len(MERGES) + 2
    assert tok.encode("hello") == [tok.encoder["hello</w>"]]


def test_loader_fallback_without_asset():
    from open_pandora_tpu.pipeline.tokenizers import load_clip_tokenizer
    enc = load_clip_tokenizer()
    ids = enc("a car", 77)
    assert len(ids) == 77 and ids[0] == 49406  # layout preserved by fallback


def test_loader_real_bpe_with_asset(tmp_path, monkeypatch):
    p = tmp_path / "merges.txt"
    p.write_text("#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in MERGES))
    monkeypatch.setenv("PANDORA_CLIP_BPE", str(p))
    from open_pandora_tpu.pipeline.tokenizers import load_clip_tokenizer
    enc = load_clip_tokenizer()
    assert getattr(enc, "is_real_bpe", False)
    tok = CLIPBPETokenizer(merges=MERGES)
    row = enc("hello cat", 10)
    assert row[:4] == [tok.sot_token, tok.encoder["hello</w>"],
                       tok.encoder["cat</w>"], tok.eot_token]
