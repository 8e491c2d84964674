"""Native C++ tokenizer: build, bind, and match the Python implementation."""

import os

import numpy as np
import pytest

from crct_tpu.data.native import (NativeWordPieceTokenizer, build_library,
                                  load_native_tokenizer, write_vocab_file)
from crct_tpu.data.tokenizer import WordPieceTokenizer


@pytest.fixture(scope="module")
def vocab_env(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("vocab")
    py_tok = WordPieceTokenizer.synthetic()
    vocab_path = write_vocab_file(py_tok.vocab, str(tmp / "vocab.txt"))
    build_library()
    native = load_native_tokenizer(vocab_path)
    assert native is not None, "native tokenizer failed to build/load"
    return py_tok, native


CORPUS = [
    "What is the average revenue across all years?",
    "Does the value of exports exceed 42.5 in 2014?",
    "Hello, World! HELLO",
    "bottom right",
    "3.14 -42 1000000 0.5%",
    "Café naïve résumé",      # accents fold to ascii
    "weird   spacing\tand\nnewlines",
    "a-b_c:d;e!f?g(h)i",
    "",
    "x" * 150,                 # over max_chars_per_word -> [UNK]
]


def test_native_matches_python(vocab_env):
    py_tok, native = vocab_env
    for text in CORPUS:
        assert native.encode(text) == py_tok.encode(text), repr(text)


def test_native_batch_matches_single(vocab_env):
    py_tok, native = vocab_env
    batch = native.encode_batch(CORPUS)
    for text, ids in zip(CORPUS, batch):
        assert ids == native.encode(text)


def test_native_special_ids(vocab_env):
    py_tok, native = vocab_env
    assert (native.cls_id, native.sep_id, native.mask_id, native.pad_id,
            native.unk_id) == (py_tok.cls_id, py_tok.sep_id, py_tok.mask_id,
                               py_tok.pad_id, py_tok.unk_id)


def test_native_fuzz_matches_python(vocab_env):
    py_tok, native = vocab_env
    rng = np.random.default_rng(0)
    chars = list("abcdefghijklmnopqrstuvwxyz0123456789 .,!?-_%()")
    for _ in range(200):
        n = int(rng.integers(0, 60))
        text = "".join(rng.choice(chars, size=n))
        assert native.encode(text) == py_tok.encode(text), repr(text)


def test_native_faster_than_python(vocab_env):
    import time
    py_tok, native = vocab_env
    texts = CORPUS * 50
    t0 = time.perf_counter()
    for t in texts:
        py_tok.encode(t)
    py_time = time.perf_counter() - t0
    t0 = time.perf_counter()
    for t in texts:
        native.encode(t)
    native_time = time.perf_counter() - t0
    assert native_time < py_time, (native_time, py_time)


def test_native_unicode_parity_exhaustive(vocab_env):
    """Single-char parity over Latin-1, Latin Extended-A, General
    Punctuation and fullwidth ranges — pins the Unicode lowercase pairing
    (odd-uppercase runs U+0139-0148 / U+0179-017E, U+0178->U+00FF,
    U+0130->'i'), the NFD-faithful accent fold (stroke letters like
    U+0142/U+0167 stay), and the category-P / Zs classification."""
    py_tok, native = vocab_env
    cps = (list(range(0x20, 0x180)) + list(range(0x2000, 0x2070))
           + [0x3000, 0xFF01, 0xFF1A])
    for cp in cps:
        ch = chr(cp)
        for text in (f"a{ch}b", f"{ch}x", f"12{ch}34", ch + ch):
            assert native.encode(text) == py_tok.encode(text), hex(cp)


def test_native_unicode_fuzz(vocab_env):
    py_tok, native = vocab_env
    import random
    rng = random.Random(1)
    alphabet = ([chr(c) for c in range(0xA0, 0x180)]
                + [chr(c) for c in range(0x2000, 0x2070)]
                + list("abcdefghij0123456789 .,-%$"))
    for _ in range(500):
        s = "".join(rng.choice(alphabet)
                    for _ in range(rng.randint(1, 30)))
        assert native.encode(s) == py_tok.encode(s), repr(s)


def test_crlf_vocab_file(vocab_env, tmp_path):
    """CRLF vocab files resolve identical vocab/special ids in the C++
    reader and both Python readers."""
    py_tok, _ = vocab_env
    lf = write_vocab_file(py_tok.vocab, str(tmp_path / "v.txt"))
    crlf = str(tmp_path / "v_crlf.txt")
    with open(lf, "rb") as f:
        data = f.read().replace(b"\n", b"\r\n")
    with open(crlf, "wb") as f:
        f.write(data)
    py2 = WordPieceTokenizer.from_vocab_file(crlf)
    nat2 = NativeWordPieceTokenizer(crlf)
    text = "hello world 42.5"
    assert py2.encode(text) == nat2.encode(text) == py_tok.encode(text)
    assert py2.vocab.get("[CLS]") == py_tok.vocab.get("[CLS]")
    assert nat2.cls_id == py_tok.cls_id
