"""ctypes bindings for the native host text pipeline (native/fast_text.cpp).

Provides drop-in accelerated variants of the Python tokenizers: vocabulary
tokenization and hash tokenization run in C++ with zero per-token Python
objects; a streaming triple reader fills whole batches per call. Falls back
silently to the Python implementations when the shared library isn't built
(`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native", "libmmfast.so")


def build_native(force: bool = False) -> bool:
    """Compile the shared library via make; returns success."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    native_dir = os.path.dirname(_LIB_PATH)
    try:
        subprocess.run(["make", "-C", native_dir], check=True, capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load_library() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_LIB_PATH) and not build_native():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.mm_vocab_load.restype = ctypes.c_void_p
    lib.mm_vocab_load.argtypes = [ctypes.c_char_p]
    lib.mm_vocab_size.restype = ctypes.c_int32
    lib.mm_vocab_size.argtypes = [ctypes.c_void_p]
    lib.mm_vocab_free.argtypes = [ctypes.c_void_p]
    lib.mm_tokenize_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
    ]
    lib.mm_hash_tokenize_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
    ]
    lib.mm_triples_open.restype = ctypes.c_void_p
    lib.mm_triples_open.argtypes = [ctypes.c_char_p]
    lib.mm_triples_next_batch.restype = ctypes.c_int32
    lib.mm_triples_next_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_int32,
    ]
    lib.mm_triples_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def native_available() -> bool:
    return load_library() is not None


class NativeVocabTokenizer:
    """C++-backed batch tokenizer with the VocabTokenizer contract."""

    def __init__(self, vocab_path: str, mask_oov: bool = False):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native library not available (make -C native)")
        self._lib = lib
        self._handle = lib.mm_vocab_load(vocab_path.encode())
        if not self._handle:
            raise FileNotFoundError(vocab_path)
        self.mask_oov = mask_oov

    @property
    def vocab_size(self) -> int:
        return self._lib.mm_vocab_size(self._handle)

    @property
    def pad_id(self) -> int:
        return 0

    def encode_batch(self, texts: List[str], max_length: int) -> Tuple[np.ndarray, np.ndarray]:
        n = len(texts)
        joined = "\n".join(t.replace("\n", " ") for t in texts).encode("utf-8")
        ids = np.zeros((n, max_length), dtype=np.int32)
        mask = np.zeros((n, max_length), dtype=np.float32)
        self._lib.mm_tokenize_batch(
            self._handle, joined, n, max_length, int(self.mask_oov),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return ids, mask

    def encode(self, text: str, max_length: int) -> Tuple[np.ndarray, np.ndarray]:
        ids, mask = self.encode_batch([text], max_length)
        return ids[0], mask[0]

    def encode_pair(self, query: str, doc: str, max_q: int, max_d: int):
        raise NotImplementedError("embedding-based models use independent inputs")

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib:
            self._lib.mm_vocab_free(self._handle)


class NativeTripleReader:
    """Streaming batch reader over a 3-col triple file."""

    _BUF_CAP = 1 << 22  # 4 MB per column per batch

    def __init__(self, path: str):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native library not available")
        self._lib = lib
        self._handle = lib.mm_triples_open(path.encode())
        if not self._handle:
            raise FileNotFoundError(path)

    def next_batch(self, batch_size: int):
        q = ctypes.create_string_buffer(self._BUF_CAP)
        p = ctypes.create_string_buffer(self._BUF_CAP)
        n = ctypes.create_string_buffer(self._BUF_CAP)
        rows = self._lib.mm_triples_next_batch(self._handle, batch_size, q, p, n, self._BUF_CAP)
        if rows == 0:
            return None
        split = lambda buf: buf.value.decode("utf-8").split("\n")[:rows]
        return split(q), split(p), split(n)

    def close(self):
        if self._handle:
            self._lib.mm_triples_close(self._handle)
            self._handle = None

    def __del__(self):
        self.close()


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "--build":
        ok = build_native(force=True)
        print("built" if ok else "build FAILED")
        sys.exit(0 if ok else 1)
