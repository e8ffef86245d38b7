"""HNSW graph index — the second ANN family, as first-party native code.

Behavior contract: reference FaissHNSWIndexer (retrieval/faiss_indices.py:
76-104) — a host-CPU graph index (faiss HNSW is CPU-only in the reference
too), with ``faiss_hnsw_graph_neighbors`` (M) and efConstruction/efSearch
semantics. Graph traversal is data-dependent pointer chasing, which the TPU's
static dataflow can't express efficiently, so like the reference's faiss
backend this runs on the host — but as our own C++ (native/hnsw.cpp, ctypes
C ABI), not a third-party wheel. Metric: inner product.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

from matchmaker_tpu.retrieval.indexes import BaseNNIndexer, gather_ids

_LIB: Optional[ctypes.CDLL] = None
_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libmmhnsw.so",
)


def load_hnsw_library() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.dirname(_LIB_PATH), "libmmhnsw.so"],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
        if not os.path.exists(_LIB_PATH):
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.mm_hnsw_new.restype = ctypes.c_void_p
    lib.mm_hnsw_new.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint]
    lib.mm_hnsw_add_batch.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    lib.mm_hnsw_size.restype = ctypes.c_int
    lib.mm_hnsw_size.argtypes = [ctypes.c_void_p]
    lib.mm_hnsw_search_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.mm_hnsw_save.restype = ctypes.c_int
    lib.mm_hnsw_save.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.mm_hnsw_load.restype = ctypes.c_void_p
    lib.mm_hnsw_load.argtypes = [ctypes.c_char_p]
    lib.mm_hnsw_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def hnsw_available() -> bool:
    return load_hnsw_library() is not None


class HNSWIndex(BaseNNIndexer):
    """Native HNSW over the corpus vectors; ids resolved host-side."""

    def __init__(self, config=None, mesh=None):
        super().__init__(config)
        config = config or {}
        self.m = config.get("faiss_hnsw_graph_neighbors", 16)
        # efC=80 ≈ perfect top-1 on normalized corpora at 2-3x the build speed
        # of 200 (measured; faiss defaults to 40)
        self.ef_construction = config.get("hnsw_ef_construction", 80)
        self.ef_search = config.get("hnsw_ef_search", 128)
        self.seed = config.get("random_seed", 42)
        self._handle = None
        self._ids: Optional[np.ndarray] = None
        self._lib = load_hnsw_library()
        if self._lib is None:
            raise RuntimeError("native HNSW library unavailable (make -C native)")

    def __del__(self):
        if getattr(self, "_handle", None) and getattr(self, "_lib", None):
            self._lib.mm_hnsw_free(self._handle)
            self._handle = None

    def index(self, ids: np.ndarray, vectors: np.ndarray) -> None:
        self._ids = np.asarray(ids)
        vectors = np.ascontiguousarray(np.asarray(vectors, dtype=np.float32))
        if self._handle:
            self._lib.mm_hnsw_free(self._handle)
        self.dim = vectors.shape[1]
        self._handle = self._lib.mm_hnsw_new(self.dim, self.m, self.ef_construction, self.seed)
        self._lib.mm_hnsw_add_batch(
            self._handle, vectors.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), vectors.shape[0]
        )

    def search(self, queries: np.ndarray, top_n: int) -> Tuple[np.ndarray, np.ndarray]:
        queries = np.ascontiguousarray(np.asarray(queries, dtype=np.float32))
        nq = queries.shape[0]
        scores = np.empty((nq, top_n), np.float32)
        idx = np.empty((nq, top_n), np.int64)
        self._lib.mm_hnsw_search_batch(
            self._handle,
            queries.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            nq, top_n, max(self.ef_search, top_n),
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return gather_ids(self._ids, idx, len(self._ids), scores)

    def save(self, folder: str) -> None:
        os.makedirs(folder, exist_ok=True)
        rc = self._lib.mm_hnsw_save(self._handle, os.path.join(folder, "hnsw_graph.bin").encode())
        if rc != 0:
            raise IOError(f"hnsw save failed in {folder}")
        np.save(os.path.join(folder, "hnsw_ids.npy"), self._ids)

    def load(self, folder: str) -> None:
        self._handle = self._lib.mm_hnsw_load(os.path.join(folder, "hnsw_graph.bin").encode())
        if not self._handle:
            raise IOError(f"hnsw load failed in {folder}")
        self._ids = np.load(os.path.join(folder, "hnsw_ids.npy"), allow_pickle=True)
        self.dim = None
