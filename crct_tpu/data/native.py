"""ctypes bindings for the native (C++) tokenizer.

Builds ``native/libwordpiece.so`` on first use (g++, cached next to the
source) and exposes a drop-in tokenizer with the same ``encode`` interface
as the Python WordPieceTokenizer. The data pipeline uses it automatically
when construction succeeds; otherwise it falls back to pure Python.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "wordpiece.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libwordpiece.so")

_lib_handle: Optional[ctypes.CDLL] = None


def build_library(force: bool = False) -> str:
    """Compile the shared library if missing/stale; returns its path."""
    if (not force and os.path.exists(_LIB)
            and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
        return _LIB
    cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-o", _LIB, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def _load() -> ctypes.CDLL:
    global _lib_handle
    if _lib_handle is None:
        lib = ctypes.CDLL(build_library())
        lib.wp_create.restype = ctypes.c_void_p
        lib.wp_create.argtypes = [ctypes.c_char_p]
        lib.wp_destroy.argtypes = [ctypes.c_void_p]
        lib.wp_encode.restype = ctypes.c_int
        lib.wp_encode.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_int32),
                                  ctypes.c_int]
        lib.wp_encode_batch.restype = ctypes.c_int
        lib.wp_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int]
        _lib_handle = lib
    return _lib_handle


class NativeWordPieceTokenizer:
    """C++-backed tokenizer; interface-compatible with WordPieceTokenizer
    for the methods the data pipeline uses."""

    MAX_IDS = 4096

    def __init__(self, vocab_file: str):
        self._lib = _load()
        self._handle = self._lib.wp_create(vocab_file.encode())
        if not self._handle:
            raise FileNotFoundError(vocab_file)
        # special ids read from the vocab file directly
        vocab: Dict[str, int] = {}
        with open(vocab_file, encoding="utf-8") as f:
            for i, line in enumerate(f):
                t = line.rstrip("\n").rstrip("\r")   # CRLF vocab parity
                                                     # with the C++ reader
                if t:
                    vocab[t] = i
        self.vocab = vocab
        self.cls_id = vocab.get("[CLS]", 101)
        self.sep_id = vocab.get("[SEP]", 102)
        self.mask_id = vocab.get("[MASK]", 103)
        self.pad_id = vocab.get("[PAD]", 0)
        self.unk_id = vocab.get("[UNK]", 100)
        self._buf = (ctypes.c_int32 * self.MAX_IDS)()

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.wp_destroy(self._handle)
        except Exception:
            pass

    def encode(self, text: str) -> List[int]:
        n = self._lib.wp_encode(self._handle, str(text).encode("utf-8"),
                                self._buf, self.MAX_IDS)
        return list(self._buf[:n])

    def encode_batch(self, texts: List[str]) -> List[List[int]]:
        n = len(texts)
        arr = (ctypes.c_char_p * n)(*[str(t).encode("utf-8") for t in texts])
        max_total = self.MAX_IDS * max(1, n)
        ids = (ctypes.c_int32 * max_total)()
        offsets = (ctypes.c_int32 * (n + 1))()
        self._lib.wp_encode_batch(self._handle, arr, n, ids, offsets,
                                  max_total)
        out = []
        for i in range(n):
            out.append(list(ids[offsets[i]:offsets[i + 1]]))
        return out

    def convert_tokens_to_ids(self, tokens) -> List[int]:
        return [self.vocab.get(t, self.unk_id) for t in tokens]


def load_native_tokenizer(vocab_file: str) -> Optional[NativeWordPieceTokenizer]:
    """Best-effort native tokenizer; None when the toolchain is unavailable."""
    try:
        return NativeWordPieceTokenizer(vocab_file)
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return None


def write_vocab_file(vocab: Dict[str, int], path: str) -> str:
    """Serialize a vocab dict to the vocab.txt line format (id = line no.)."""
    inv = {v: k for k, v in vocab.items()}
    size = max(inv) + 1
    with open(path, "w", encoding="utf-8") as f:
        for i in range(size):
            f.write(inv.get(i, f"[unused_{i}]") + "\n")
    return path
