"""Tokenizer behavior parity (reference: src/llama.cpp:34-256; goldens from
test.c:53-75, which took them from Meta's llama example code)."""

import pytest

from hip_llama_tpu.tokenizer import printable_piece


GOLDENS = [
    ("", [1]),
    ("I believe the meaning of life is", [1, 306, 4658, 278, 6593, 310, 2834, 338]),
    (
        "Simply put, the theory of relativity states that ",
        [1, 3439, 17632, 1925, 29892, 278, 6368, 310, 14215, 537, 5922, 393, 29871],
    ),
    (
        "A brief message congratulating the team on the launch:\n\n        Hi everyone,\n\n        I just ",
        [1, 319, 11473, 2643, 378, 629, 271, 18099, 278, 3815, 373, 278, 6826,
         29901, 13, 13, 4706, 6324, 14332, 29892, 13, 13, 4706, 306, 925, 29871],
    ),
    (
        "Translate English to French:\n\n        sea otter => loutre de mer\n        peppermint => menthe poivrée\n        plush girafe => girafe peluche\n        cheese =>",
        [1, 4103, 9632, 4223, 304, 5176, 29901, 13, 13, 4706, 7205, 4932, 357,
         1149, 301, 449, 276, 316, 2778, 13, 4706, 1236, 407, 837, 524, 1149,
         6042, 354, 772, 440, 29878, 1318, 13, 4706, 715, 1878, 330, 3055, 1725,
         1149, 330, 3055, 1725, 4639, 28754, 13, 4706, 923, 968, 1149],
    ),
]


@pytest.mark.parametrize("text,expected", GOLDENS, ids=range(len(GOLDENS)))
def test_llama2_golden_encodings(llama_tokenizer, text, expected):
    assert llama_tokenizer.encode(text, bos=True, eos=False) == expected


def test_decode_roundtrip(llama_tokenizer):
    text = "The quick brown fox jumps over the lazy dog."
    toks = llama_tokenizer.encode(text, bos=True, eos=False)
    # decode skips BOS itself; post-BOS leading space is stripped (llama.cpp:87)
    out = llama_tokenizer.decode(toks[1:])
    assert out == text


def test_eos_appended(llama_tokenizer):
    toks = llama_tokenizer.encode("hi", bos=True, eos=True)
    assert toks[0] == 1 and toks[-1] == 2


def test_byte_fallback(toy_tokenizer):
    # bytes not in vocab as pieces fall back to <0xXX> ids = byte + 3
    toks = toy_tokenizer.encode(b"\x07", bos=False, eos=False)
    assert 0x07 + 3 in toks


def test_greedy_merge_order(toy_tokenizer):
    # "hello" splits to h,e,l,l,o then merges by best score:
    # "he"(-3.0) vs "ll"(-3.5) -> "he" first; then "hell"(-2.5); then "hello"(-2.0)
    toks = toy_tokenizer.encode("hello", bos=False, eos=False)
    # dummy prefix " " is prepended for non-empty text; " hello" (-1.5)
    # ultimately absorbs it after h,e,l,l,o -> he -> hell -> hello merges
    vocab = toy_tokenizer.vocab
    assert [vocab[t] for t in toks] == [b" hello"]


def test_dummy_prefix_merges_with_text(toy_tokenizer):
    # " hello" (-1.5) should win over separate " " + "hello"
    toks = toy_tokenizer.encode("hello", bos=True, eos=False)
    assert toks[0] == 1


def test_byte_token_decode(toy_tokenizer):
    piece = toy_tokenizer.decode_piece(0, 3 + ord("A"))
    assert piece == b"A"


def test_printable_piece_filter():
    assert printable_piece(b"\x07") == b""
    assert printable_piece(b"a") == b"a"
    assert printable_piece(b"\n") == b"\n"
    assert printable_piece(b"\xc3\xa9") == b"\xc3\xa9"  # multi-byte passes
