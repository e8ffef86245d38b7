"""Nearest-neighbor index layer — the faiss/ScaNN replacement.

Contract with the reference (retrieval/base_index.py:4-33, faiss_indices.py):
``prepare(config, dim) / index(ids, vectors) / search(queries, top_n) /
save(folder) / load(folder)``, with exact (IndexFlatIP-equivalent), IVF
(approximate), and dynamic-clustering (TAS-B query clusterer,
faiss_indices.py:307-428) variants.

TPU design: the "index" is a device-resident embedding matrix. Exact search is
the sharded blocked MIPS kernel (ops/mips.py) — the multi-chip analog of
faiss's ``co.shard=True`` GPU sharding (faiss_indices.py:63-67). IVF clusters
with on-device k-means and searches the nprobe nearest clusters through a
padded per-cluster layout (static shapes). Vectors are stored fp16 on disk
(reference ``token_dtype`` semantics) and computed in bf16/f32 on the MXU.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from matchmaker_tpu.ops.mips import blocked_topk_scores, sharded_topk_mips


def gather_ids(ids_array: np.ndarray, idx: np.ndarray, row_count: int, scores: np.ndarray):
    """Map row indices → sequence ids, neutralizing padded top-k slots.

    A -inf-padded slot (top_n > corpus rows) must not alias doc 0's id: invalid
    slots get score −inf and a sentinel id (-1 numeric / "" string) so callers
    reading ids without scores can't mistake padding for a real hit."""
    idx = np.asarray(idx)
    scores = np.asarray(scores)
    valid = (idx >= 0) & (idx < row_count) & np.isfinite(scores)
    out = ids_array[np.clip(idx, 0, row_count - 1)]
    if not valid.all():
        out = out.copy()
        out[~valid] = -1 if out.dtype.kind in "iuf" else ""
        scores = np.where(valid, scores, -np.inf)
    return scores, out


class BaseNNIndexer:
    def __init__(self, config=None):
        config = config or {}
        self.dtype = np.float16 if config.get("token_dtype", "float16") == "float16" else np.float32
        self.compute_dtype = jnp.float32
        self.dim: Optional[int] = None

    def prepare(self, dim: int) -> None:
        self.dim = dim

    def index(self, ids: np.ndarray, vectors: np.ndarray) -> None:
        raise NotImplementedError

    def search(self, queries: np.ndarray, top_n: int) -> Tuple[np.ndarray, np.ndarray]:
        """→ (scores (Q, top_n), ids (Q, top_n))"""
        raise NotImplementedError

    def save(self, folder: str) -> None:
        raise NotImplementedError

    def load(self, folder: str) -> None:
        raise NotImplementedError


class FlatIndex(BaseNNIndexer):
    """Exact MIPS over the full corpus matrix, sharded across the mesh."""

    def __init__(self, config=None, mesh=None):
        super().__init__(config)
        config = config or {}
        self.mesh = mesh
        self.block_size = config.get("mips_block_size", 65536)
        # int8 quantized corpus: ~2x search throughput; "int8-global" uses one
        # global scale → scale-free top-k, another ~1.5x (normalized corpora)
        self.quantized = config.get("mips_quantization", "none") in ("int8", "int8-global")
        self.global_scale = config.get("mips_quantization", "none") == "int8-global"
        # fp16 scan: bf16 matmuls over the f16 corpus + approx top-k — the
        # recall-parity production path (ops/mips_f16.py; the reference's
        # fp16 IndexFlatIP ranking is the parity target)
        self.f16_scan = config.get("mips_quantization", "none") == "float16"
        self.approx = config.get("mips_approx_topk", False)
        self.recall_target = config.get("mips_approx_recall_target", 0.95)
        # mips_kernel: "binmax" (default — fused Pallas candidate kernel,
        # ops/mips_binmax.py: 2x the XLA scan at better recall, 0.9967@1000
        # vs f32-exact) or "scan" (XLA matmul + approx_max_k). binmax falls
        # back to the exact scan when the corpus is too small for its
        # candidate pool, so tiny corpora stay exact either way
        self.mips_kernel = config.get("mips_kernel", "binmax")
        # two-stage exact-rescored search (ops/mips_twostage.py): approx int8
        # candidate scan + exact rescore; restores recall parity at approx speed
        self.twostage = config.get("mips_twostage", False)
        self.oversample = config.get("mips_oversample", 4)
        self.rescore_dtype = config.get("mips_rescore_dtype", "int8")  # int8|float16
        # mips_int8_queries: "int8" (default — double-rate MXU, quantized
        # query noise, recall@1000 0.912) or "float" (mixed kernel: bf16
        # query × in-kernel-dequantized int8 codes — bf16-scan recall at
        # int8 memory; the recall-parity int8 mode, preferred over
        # mips_twostage whose candidate gather is XLA-pathological on TPU)
        self.int8_queries = config.get("mips_int8_queries", "int8")
        # binmax geometry overrides for workload tuning (None = adaptive
        # defaults). ColBERT per-token search (k=64 per token over wide
        # (B·Lq)-row query batches) measures best at mips_per_bin=1 +
        # mips_tile_rows=4096 (+8% — the 128x-oversampled pool makes the
        # rank-2 tournament pass pure overhead); the flagship k=1000 document
        # search keeps the adaptive per_bin>=2 recall envelope
        self.per_bin_override = config.get("mips_per_bin")
        self.tile_rows_override = config.get("mips_tile_rows")
        self.q_chunk_override = config.get("mips_q_chunk")
        self._vectors: Optional[np.ndarray] = None
        self._ids: Optional[np.ndarray] = None
        self._device_vectors = None
        self._search_fn = None

    def index(self, ids: np.ndarray, vectors: np.ndarray) -> None:
        self._ids = np.asarray(ids)
        self._vectors = np.asarray(vectors, dtype=self.dtype)
        # binmax recall analysis assumes top-k docs spread ~uniformly over
        # 128-row bins, but real corpora are topically clustered in file
        # order (measured: 21 of a query's top-1000 in ONE bin on a clustered
        # 1M corpus → recall 0.93 even at 8x oversampling). A seeded row
        # permutation makes every bin an i.i.d. corpus sample, so the
        # binomial collision model holds for ANY corpus shape. Ids permute
        # with the rows; row order is otherwise meaningless to this index.
        if (self.f16_scan or self.quantized) and self.mips_kernel == "binmax" \
                and len(self._ids) > 1:
            perm = np.random.default_rng(0xB1A5).permutation(len(self._ids))
            self._ids = self._ids[perm]
            self._vectors = self._vectors[perm]
        self._device_vectors = None

    def _ensure_device(self):
        if self._device_vectors is not None:
            return
        n_shards = 1
        vectors = self._vectors
        axes = "data"
        if self.mesh is not None:
            from matchmaker_tpu.parallel.mesh import corpus_axes

            n_shards = int(np.prod(list(self.mesh.shape.values())))
            axes = corpus_axes(self.mesh)  # all mesh axes (multi-host ready)
        # pad rows so every shard is a whole number of rows; the binmax
        # kernel additionally needs each SHARD to be a multiple of its
        # padding grain (8192 covers per_bin 2..8: the candidate count per
        # grain must be a 128-multiple for the transpose pass) — otherwise
        # binmax_candidates re-pads the corpus inside every jitted search
        # (a full HBM copy per call; a second 13.7 GB buffer at 8.9M)
        if (self.f16_scan or self.quantized) and self.mips_kernel == "binmax":
            from matchmaker_tpu.ops.mips_binmax import padding_grain

            tile = self.tile_rows_override or 2048
            pbs = [self.per_bin_override] if self.per_bin_override else [2, 4, 8]
            grain = n_shards * max(padding_grain(tile, pb) for pb in pbs)
        else:
            grain = n_shards
        pad_to = grain * ((vectors.shape[0] + grain - 1) // grain)
        self._row_count = vectors.shape[0]
        if pad_to != vectors.shape[0]:
            vectors = np.pad(vectors, ((0, pad_to - vectors.shape[0]), (0, 0)))
        import functools

        mesh, block = self.mesh, self.block_size

        if self.quantized and self.mips_kernel == "binmax":
            # int8 × fused binmax: the MXU's double-rate int8 path at half the
            # HBM corpus traffic, feeding the same bin-max tournament. Dequant
            # scales are per 128-row bin (rows are permuted → bins i.i.d.);
            # per-row scales cost 4× the int8 row itself in lane-padded VMEM
            # traffic and measured SLOWER than bf16.
            #
            # twostage composes ScaNN's shape on top (reference
            # scann_index.py:32-35: quantized scan + exact reorder): binmax
            # candidates at per_bin=4 (candidate coverage ~0.999) + exact
            # rescore of oversample·k candidates against the int8 codes
            # (mips_rescore_dtype=int8 — zero extra memory) or f16 rows
            # (mips_rescore_dtype=float16) — recall ≈ parity at scan speed.
            from matchmaker_tpu.ops.mips_binmax import (
                sharded_binmax_rescore_topk, sharded_binmax_topk,
            )
            from matchmaker_tpu.ops.mips_quant import (
                quantize_corpus_binwise, sharded_quantized_topk,
            )

            values, bin_scales = quantize_corpus_binwise(vectors)
            dv = jnp.asarray(values)
            ds = jnp.asarray(bin_scales)
            rescore = None
            if self.twostage and self.rescore_dtype == "float16":
                rescore = jnp.asarray(vectors, dtype=jnp.bfloat16)
            if self.mesh is not None and n_shards > 1:
                from jax.sharding import NamedSharding, PartitionSpec as P

                dv = jax.device_put(dv, NamedSharding(self.mesh, P(axes, None)))
                ds = jax.device_put(ds, NamedSharding(self.mesh, P(axes, None)))
                if rescore is not None:
                    rescore = jax.device_put(
                        rescore, NamedSharding(self.mesh, P(axes, None)))
            self._device_vectors = (dv, ds, rescore)
            row_count = self._row_count
            twostage, oversample = self.twostage, self.oversample
            mixed = self.int8_queries == "float"
            geom = {k_: v for k_, v in (
                ("tile_rows", self.tile_rows_override), ("q_chunk", self.q_chunk_override),
            ) if v}
            per_bin_override = self.per_bin_override

            @functools.partial(jax.jit, static_argnames=("k",))
            def search_fn(queries, corpus, k):
                values, scales, rescore_corpus = corpus
                # same geometry gate + exact fallback as the f16 binmax path
                if row_count // 128 * 8 >= 8 * k:
                    want = int(min(8, max(2, -(-8 * k * 128 // row_count))))
                    per_bin = 1 << (want - 1).bit_length()
                    if per_bin_override and row_count // 128 * per_bin_override >= 8 * k:
                        per_bin = per_bin_override  # still >=8x oversampled
                    if mixed:
                        # bf16-query mixed kernel: bf16-scan recall straight
                        # off the int8 codes — no rescore stage needed
                        return sharded_binmax_topk(
                            queries, values, k, mesh=mesh, axis=axes,
                            n_valid=row_count, per_bin=per_bin,
                            corpus_scales=scales, mixed_queries=True, **geom,
                        )
                    if twostage:
                        # in-bin candidate loss needs per_bin>=4 (Poisson
                        # tail: P(>=4 noise-inflated rivals) ~1e-3); rescore
                        # then undoes the quantized final ranking
                        return sharded_binmax_rescore_topk(
                            queries, values, scales, k, mesh=mesh, axis=axes,
                            n_valid=row_count, per_bin=max(per_bin, 4),
                            oversample=oversample,
                            rescore_corpus=rescore_corpus, **geom,
                        )
                    return sharded_binmax_topk(
                        queries, values, k, mesh=mesh, axis=axes, n_valid=row_count,
                        per_bin=per_bin, corpus_scales=scales, **geom,
                    )
                # exact int8 scan fallback: expand bin scales to per-row
                row_scales = jnp.repeat(scales[:, 0], 128)[: values.shape[0]]
                return sharded_quantized_topk(
                    queries, values, row_scales, k, mesh=mesh, axis=axes,
                    block_size=block, approx=False, n_valid=row_count,
                )

            self._search_fn = search_fn
            return

        if self.quantized:
            from matchmaker_tpu.ops.mips_quant import quantize_corpus, sharded_quantized_topk

            values, scales = quantize_corpus(vectors, per_row=not self.global_scale)
            dv = jnp.asarray(values)
            ds = jnp.asarray(scales)
            if self.mesh is not None and n_shards > 1:
                from jax.sharding import NamedSharding, PartitionSpec as P

                dv = jax.device_put(dv, NamedSharding(self.mesh, P(axes, None)))
                if ds.ndim > 0:
                    ds = jax.device_put(ds, NamedSharding(self.mesh, P(axes)))
            rescore = None
            if self.twostage and self.rescore_dtype == "float16":
                rescore = jnp.asarray(vectors, dtype=jnp.float16)
                if self.mesh is not None and n_shards > 1:
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    rescore = jax.device_put(rescore, NamedSharding(self.mesh, P(axes, None)))
            self._device_vectors = (dv, ds, rescore)
            approx, recall = self.approx, self.recall_target
            twostage, oversample = self.twostage, self.oversample
            row_count = self._row_count

            @functools.partial(jax.jit, static_argnames=("k",))
            def search_fn(queries, corpus, k):
                values, scales, rescore_corpus = corpus
                if twostage:
                    from matchmaker_tpu.ops.mips_twostage import sharded_twostage_topk

                    return sharded_twostage_topk(
                        queries, values, scales, k, mesh=mesh, axis=axes, block_size=block,
                        oversample=oversample, recall_target=recall,
                        rescore_corpus=rescore_corpus, n_valid=row_count,
                    )
                return sharded_quantized_topk(
                    queries, values, scales, k, mesh=mesh, axis=axes, block_size=block,
                    approx=approx, recall_target=recall, n_valid=row_count,
                )

            self._search_fn = search_fn
            return

        if self.f16_scan:
            # binmax stores bf16 (Mosaic has no f16 type; scores are identical
            # — the scan casts f16→bf16 before its matmul anyway)
            use_binmax = self.mips_kernel == "binmax"
            arr = jnp.asarray(vectors, dtype=jnp.bfloat16 if use_binmax else jnp.float16)
            if self.mesh is not None and n_shards > 1:
                from jax.sharding import NamedSharding, PartitionSpec as P

                arr = jax.device_put(arr, NamedSharding(self.mesh, P(axes, None)))
            self._device_vectors = arr
            approx, recall = self.approx, self.recall_target
            scan_block = self.block_size if vectors.shape[0] > self.block_size else None
            row_count = self._row_count
            geom = {k_: v for k_, v in (
                ("tile_rows", self.tile_rows_override), ("q_chunk", self.q_chunk_override),
            ) if v}
            per_bin_override = self.per_bin_override

            @functools.partial(jax.jit, static_argnames=("k",))
            def search_fn(queries, corpus, k):
                # binmax candidate pool is at most row_count/128*per_bin wide
                # (per_bin ≤ 8). The gate sizes from the REAL row count, not
                # the padded corpus buffer (padding makes any corpus look like
                # ≥ n_shards·8192 rows and would admit geometries whose real
                # candidate pool can't even cover k), and requires ≥8x
                # candidate oversampling — below that, bin-collision loss is
                # material (measured 0.90 recall@1000 at 2x) → EXACT scan
                # (small corpora are cheap, and this keeps the documented
                # exact-fallback guarantee even when scann's config sets
                # mips_approx_topk)
                if use_binmax and row_count // 128 * 8 >= 8 * k:
                    from matchmaker_tpu.ops.mips_binmax import sharded_binmax_topk

                    # per-bin rank sized for ≥8x oversampled candidates;
                    # powers of two (2/4/8) so the 8192 padding grain holds
                    # (odd per_bin needs grain 16384 → in-jit corpus re-pad)
                    want = int(min(8, max(2, -(-8 * k * 128 // row_count))))
                    per_bin = 1 << (want - 1).bit_length()
                    if per_bin_override and row_count // 128 * per_bin_override >= 8 * k:
                        per_bin = per_bin_override  # still >=8x oversampled
                    return sharded_binmax_topk(
                        queries, corpus, k, mesh=mesh, axis=axes, n_valid=row_count,
                        per_bin=per_bin, **geom,
                    )
                from matchmaker_tpu.ops.mips_f16 import sharded_f16_scan_topk

                return sharded_f16_scan_topk(
                    queries, corpus, k, mesh=mesh, axis=axes, block_size=scan_block,
                    approx=False if use_binmax else approx, recall_target=recall,
                    n_valid=row_count,
                )

            self._search_fn = search_fn
            return

        arr = jnp.asarray(vectors, dtype=self.compute_dtype)
        if self.mesh is not None and n_shards > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            arr = jax.device_put(arr, NamedSharding(self.mesh, P(axes, None)))
        self._device_vectors = arr

        @functools.partial(jax.jit, static_argnames=("k",))
        def search_fn(queries, corpus, k):
            return sharded_topk_mips(queries, corpus, k, mesh=mesh, axis=axes, block_size=block)

        self._search_fn = search_fn

    def search_rows(self, queries: np.ndarray, top_n: int) -> Tuple[np.ndarray, np.ndarray]:
        """Like :meth:`search` but returns RAW row indices (int32, -1 for
        padded/invalid slots) instead of sequence ids — high-volume callers
        (ColBERT's per-token merge) factorize ids once and stay integer."""
        self._ensure_device()
        q = jnp.asarray(np.asarray(queries), dtype=self.compute_dtype)
        vals, idx = self._search_fn(q, self._device_vectors, k=top_n)
        vals, idx = np.asarray(vals), np.asarray(idx)
        if vals.shape[1] < top_n:  # corpus smaller than top_n
            pad = top_n - vals.shape[1]
            vals = np.pad(vals, ((0, 0), (0, pad)), constant_values=-np.inf)
            idx = np.pad(idx, ((0, 0), (0, pad)), constant_values=-1)
        invalid = (idx < 0) | (idx >= self._row_count) | ~np.isfinite(vals)
        if invalid.any():
            idx = np.where(invalid, -1, idx)
            vals = np.where(invalid, -np.inf, vals)
        return vals, idx

    def search(self, queries: np.ndarray, top_n: int) -> Tuple[np.ndarray, np.ndarray]:
        vals, idx = self.search_rows(queries, top_n)
        return gather_ids(self._ids, idx, self._row_count, vals)

    @property
    def row_ids(self) -> np.ndarray:
        """Sequence id per corpus row (aligns with :meth:`search_rows`)."""
        return self._ids

    def save(self, folder: str) -> None:
        os.makedirs(folder, exist_ok=True)
        np.save(os.path.join(folder, "flat_vectors.npy"), self._vectors)
        np.save(os.path.join(folder, "flat_ids.npy"), self._ids)
        with open(os.path.join(folder, "flat_meta.json"), "w") as f:
            json.dump({"dim": int(self._vectors.shape[1]), "dtype": str(self._vectors.dtype)}, f)

    def load(self, folder: str) -> None:
        self._vectors = np.load(os.path.join(folder, "flat_vectors.npy"), mmap_mode="r")
        self._ids = np.load(os.path.join(folder, "flat_ids.npy"))
        self._vectors = np.asarray(self._vectors)
        self._device_vectors = None


@functools.partial(jax.jit, static_argnames=("k",))
def _kmeanspp_init(vectors: jnp.ndarray, k: int, key) -> jnp.ndarray:
    """k-means++ (D² sampling) init — ONE jitted fori_loop over k steps.

    Random init on skewed corpora lands most seeds inside the dominant
    cluster and Lloyd cannot un-merge the starved small clusters (measured:
    2x worse mean quantization distance on a half-mass-in-one-cluster
    corpus). D² seeding fixes that; used for k ≤ 2048. The whole seeding
    runs device-side in a single dispatch — a Python loop of eager ops here
    measured ~45 min through the tunnel's per-dispatch latency at k=1000
    (999 steps × 3 ops × 2 init candidates), plus a 1000-input jnp.stack
    compile; vectors stay a jit argument (a closure would serialize the
    training set into the remote-compile payload)."""
    n, d = vectors.shape
    first = jax.random.randint(key, (), 0, n)
    centers0 = jnp.zeros((k, d), vectors.dtype).at[0].set(vectors[first])

    def body(i, state):
        centers, d2, key = state
        c = centers[i - 1].astype(jnp.float32)
        d2 = jnp.minimum(d2, ((vectors.astype(jnp.float32) - c) ** 2).sum(-1))
        key, sub = jax.random.split(key)
        idx = jax.random.categorical(sub, jnp.log(jnp.maximum(d2, 1e-30)))
        return centers.at[i].set(vectors[idx]), d2, key

    centers, _, _ = jax.lax.fori_loop(
        1, k, body, (centers0, jnp.full((n,), jnp.inf, jnp.float32), key)
    )
    return centers


def kmeans(
    vectors: jnp.ndarray, k: int, iters: int = 10, seed: int = 42, block_size: int = 131072
) -> jnp.ndarray:
    """On-device k-means (replaces faiss IVF training, faiss_indices.py:120-127).

    k-means++ init (k ≤ 2048; random at larger k) + Lloyd iterations.
    Assignment runs in corpus blocks (peak memory O(block·k), not O(N·k)) and
    the centroid update uses segment sums — scales to millions of vectors ×
    thousands of centroids."""
    n, d = vectors.shape
    key = jax.random.PRNGKey(seed)
    # candidate inits: random favors noise-like data (D² sampling chases
    # outliers there — measured worse distortion + degenerate tiny lists);
    # k-means++ rescues skewed data (random seeds pile into the dominant
    # cluster and Lloyd never un-merges the starved ones — measured 2x worse
    # quantization). For k ≤ 2048 run Lloyd from BOTH and keep the lower-
    # distortion solution; at IVF reference scale (20k lists) the ++ pass's k
    # sequential dispatches aren't worth it and random init is statistically
    # safe (≥100 training points per centroid).
    k_rand, k_pp = jax.random.split(key)
    inits = [vectors[jax.random.choice(k_rand, n, (k,), replace=False)]]
    if k <= 2048:
        inits.append(_kmeanspp_init(vectors, k, k_pp))

    n_blocks = -(-n // block_size)
    padded_n = n_blocks * block_size
    padded = jnp.pad(vectors, ((0, padded_n - n), (0, 0)))
    blocks = padded.reshape(n_blocks, block_size, d)

    @jax.jit
    def step(blocks, vectors, centroids):
        # data flows through as jit ARGUMENTS (a closure would serialize the
        # multi-GB training set into the remote-compile payload)
        c_sq = (centroids**2).sum(-1)

        def assign_block(block):
            # squared L2 via |x|² - 2 x·c + |c|² (x² constant per row → dropped)
            scores = -2 * block @ centroids.T + c_sq[None, :]
            return jnp.argmin(scores, axis=1)

        assign = jax.lax.map(assign_block, blocks).reshape(padded_n)[:n]
        sums = jax.ops.segment_sum(vectors, assign, num_segments=k)
        counts = jax.ops.segment_sum(jnp.ones((n, 1), vectors.dtype), assign, num_segments=k)
        new_centroids = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), centroids)
        return new_centroids, assign

    @jax.jit
    def distortion(blocks, centroids):
        c_sq = (centroids**2).sum(-1)

        def block_min(block):
            return (-2 * block @ centroids.T + c_sq[None, :]).min(axis=1)

        # comparable across candidate solutions: the dropped |x|² term is
        # identical for all of them
        return jax.lax.map(block_min, blocks).reshape(padded_n)[:n].sum()

    best = None
    for centroids in inits:
        assign = None
        for _ in range(iters):
            centroids, assign = step(blocks, vectors, centroids)
        d_val = float(distortion(blocks, centroids)) if len(inits) > 1 else 0.0
        if best is None or d_val < best[0]:
            best = (d_val, centroids, assign)
    return best[1], best[2]


def assign_clusters(
    vectors: np.ndarray, centroids: np.ndarray, block_size: int = 262144
) -> np.ndarray:
    """Nearest-centroid assignment streamed in host→device blocks.

    Used when the corpus is too large to sit on-device in f32 (IVF build at
    reference scale): each block is device_put, scored against the centroids
    (one MXU matmul), argmin'd, and only the (block,) int32 comes back."""
    n, d = vectors.shape
    centroids_d = jnp.asarray(centroids, dtype=jnp.float32)

    @jax.jit
    def assign_block(block, centroids_d):
        c_sq = (centroids_d**2).sum(-1)
        scores = -2 * block @ centroids_d.T + c_sq[None, :]
        return jnp.argmin(scores, axis=1).astype(jnp.int32)

    out = np.empty(n, dtype=np.int32)
    for start in range(0, n, block_size):
        blk = vectors[start : start + block_size]
        pad = 0
        if blk.shape[0] < block_size and start > 0:
            pad = block_size - blk.shape[0]
            blk = np.pad(blk, ((0, pad), (0, 0)))
        a = np.asarray(assign_block(jnp.asarray(blk, jnp.float32), centroids_d))
        out[start : start + block_size - pad] = a[: block_size - pad] if pad else a
    return out


class IVFIndex(BaseNNIndexer):
    """Inverted-file index: k-means centroids + CSR cluster storage.

    Storage is the corpus matrix *sorted by cluster* plus an offsets array —
    exactly the flat footprint (no padding), so it scales to the reference's
    defaults (20k lists over 8.8M docs) where a padded (C, max, D) layout
    explodes (replaces faiss IVF, faiss_indices.py:106-145).

    Search (all static shapes, one compile per chunk shape): queries → top
    ``nprobe`` centroids → each query's candidate rows are materialized from
    the CSR segments with a searchsorted-over-prefix-sums gather into a fixed
    row budget R (best clusters first, so an overflow drops only the
    worst-ranked probes) → one masked einsum + top-k."""

    def __init__(self, config=None, mesh=None):
        super().__init__(config)
        config = config or {}
        self.n_clusters = config.get("faiss_ivf_list_count", 100)
        self.nprobe = config.get("faiss_ivf_nprobe", 8)
        self.train_iters = config.get("ivf_train_iters", 10)
        # per-query candidate row budget: slack × nprobe × mean cluster size
        # (override with ivf_candidate_rows)
        self.candidate_rows = config.get("ivf_candidate_rows")
        self.candidate_slack = config.get("ivf_candidate_slack", 2.0)
        # k-means training subsample bound (faiss trains on at most
        # max_points_per_centroid=256 points/list, Clustering.cpp semantics);
        # also hard-capped by rows so the f32 training set fits one chip's HBM
        # at reference scale (20k lists × 8.9M docs)
        self.train_points_per_centroid = config.get("ivf_train_points_per_centroid", 256)
        self.train_max_rows = config.get("ivf_train_max_rows", 2_500_000)
        self.mesh = mesh
        self._centroids = None
        self._sorted_vectors = None  # (N, D) corpus sorted by cluster
        self._sorted_rows = None  # (N,) original row index per sorted row
        self._offsets = None  # (C+1,) cluster start offsets into sorted rows
        self._ids = None
        self._shard_data = None  # lazily-built per-shard CSR partition

    def index(self, ids: np.ndarray, vectors: np.ndarray) -> None:
        self._ids = np.asarray(ids)
        vectors = np.asarray(vectors, dtype=np.float32)
        n, _ = vectors.shape
        k = min(self.n_clusters, n)
        # floor 128k: never subsample small corpora (the full-corpus path is
        # cheap there and sampling only adds init variance)
        sample_cap = min(max(self.train_points_per_centroid * k, 131072),
                         self.train_max_rows)
        if n > sample_cap:
            # reference-scale build: train centroids on a seeded subsample
            # (the full f32 corpus does not fit HBM at 8.9M×768), then assign
            # every row in streamed device blocks
            sel = np.random.default_rng(42).choice(n, sample_cap, replace=False)
            centroids, _ = kmeans(jnp.asarray(vectors[sel]), k, self.train_iters)
            assign = assign_clusters(vectors, np.asarray(centroids))
        else:
            centroids, assign = kmeans(jnp.asarray(vectors), k, self.train_iters)
        assign = np.asarray(assign)
        order = np.argsort(assign, kind="stable")
        self._centroids = np.asarray(centroids)
        self._sorted_vectors = vectors[order].astype(self.dtype)
        self._sorted_rows = order.astype(np.int64)
        counts = np.bincount(assign, minlength=k)
        self._offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        self.n_clusters_eff = k
        self._shard_data = None

    def _max_cluster_rows(self) -> int:
        return int(np.diff(self._offsets).max()) if self._offsets is not None else 0

    def _budget(self, nprobe: int) -> int:
        if self.candidate_rows:
            return int(self.candidate_rows)
        n = self._sorted_vectors.shape[0]
        mean_cluster = max(1.0, n / self.n_clusters_eff)
        r = int(self.candidate_slack * nprobe * mean_cluster)
        # the budget must at least hold the LARGEST single cluster — on skewed
        # corpora a probed mega-cluster otherwise silently truncates its tail
        r = max(r, self._max_cluster_rows())
        return min(n, -(-r // 128) * 128)

    # -- mesh-sharded search (the faiss multi-GPU analog, faiss_indices.py:
    # 106-145 via index_cpu_to_all_gpus): clusters are partitioned into
    # contiguous ranges with ~balanced row counts; each chip owns its range's
    # CSR rows, probes the GLOBAL top-nprobe centroids (identical on every
    # chip — centroids are replicated), gathers candidates only for probed
    # clusters it owns, computes a local top-k, and the per-chip partials
    # merge over ICI exactly like the FlatIndex sharded scan. --------------

    def _n_shards(self) -> int:
        if self.mesh is None:
            return 1
        return int(np.prod(list(self.mesh.shape.values())))

    def _ensure_sharded(self):
        if self._shard_data is not None:
            return
        n_shards = self._n_shards()
        offsets = self._offsets
        n, d = self._sorted_vectors.shape
        c = self.n_clusters_eff
        # cluster cuts at the row boundaries nearest s·N/n_shards
        targets = [round(s * n / n_shards) for s in range(n_shards + 1)]
        cuts = np.searchsorted(offsets, targets, side="left")
        cuts[0], cuts[-1] = 0, c
        cuts = np.maximum.accumulate(np.clip(cuts, 0, c))
        c_start = cuts[:-1].astype(np.int32)
        c_count = np.diff(cuts).astype(np.int32)
        c_max = max(1, int(c_count.max()))
        rows_per = offsets[cuts[1:]] - offsets[cuts[:-1]]
        s_rows = max(128, int(-(-int(rows_per.max()) // 128) * 128))
        vecs = np.zeros((n_shards, s_rows, d), dtype=self.dtype)  # f16 default
        rows_map = np.zeros((n_shards, s_rows), dtype=np.int64)
        loffs = np.zeros((n_shards, c_max + 1), dtype=np.int64)
        for s in range(n_shards):
            rs, re = int(offsets[cuts[s]]), int(offsets[cuts[s + 1]])
            length = re - rs
            vecs[s, :length] = self._sorted_vectors[rs:re]
            rows_map[s, :length] = self._sorted_rows[rs:re]
            lo = offsets[cuts[s] : cuts[s + 1] + 1] - rs
            loffs[s, : len(lo)] = lo
            loffs[s, len(lo) :] = length
        from jax.sharding import NamedSharding

        mesh = self.mesh
        put = lambda a, spec: jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))
        from jax.sharding import PartitionSpec as P

        from matchmaker_tpu.parallel.mesh import corpus_axes

        axes = corpus_axes(mesh)
        self._shard_data = {
            "vecs": put(vecs, P(axes, None, None)),
            "rows_map": put(rows_map, P(axes, None)),
            "loffs": put(loffs, P(axes, None)),
            "c_start": put(c_start, P(axes)),
            "c_count": put(c_count, P(axes)),
            "centroids": put(self._centroids.astype(np.float32), P()),
            "c_max": c_max,
            "s_rows": s_rows,
        }

    def _search_rows_sharded(self, queries: np.ndarray, top_n: int) -> Tuple[np.ndarray, np.ndarray]:
        from jax.sharding import PartitionSpec as P

        self._ensure_sharded()
        from matchmaker_tpu.parallel.mesh import corpus_axes

        sd = self._shard_data
        mesh, n_shards = self.mesh, self._n_shards()
        axes = corpus_axes(mesh)
        nprobe = min(self.nprobe, self.n_clusters_eff)
        mean_cluster = max(1.0, self._sorted_vectors.shape[0] / self.n_clusters_eff)
        # per-shard budget: expected owned rows per query = nprobe·mean/shards
        # (cluster ids are k-means-arbitrary → probes spread ~uniformly over
        # shards); 2x the single-device slack absorbs skew, floor 256
        if self.candidate_rows:
            r_local = int(self.candidate_rows)
        else:
            r_local = int(2 * self.candidate_slack * nprobe * mean_cluster / n_shards)
            # never below the largest single cluster (skew: a probed
            # mega-cluster must fit its owning shard's budget in full)
            r_local = max(r_local, self._max_cluster_rows())
        r_local = min(sd["s_rows"], max(256, -(-r_local // 128) * 128))
        c_max = sd["c_max"]
        k_eff = min(top_n, r_local)
        import functools as _ft

        @jax.jit
        def run_chunk(qc, vecs, rows_map, loffs, c_start, c_count, centroids):
            @_ft.partial(
                jax.shard_map,
                mesh=mesh,
                in_specs=(P(), P(axes, None, None), P(axes, None), P(axes, None),
                          P(axes), P(axes), P()),
                out_specs=(P(None, axes), P(None, axes)),
                check_vma=False,
            )
            def per_shard(qc, vecs, rows_map, loffs, c_start, c_count, centroids):
                vecs, rows_map, loffs = vecs[0], rows_map[0], loffs[0]
                c0, cn = c_start[0], c_count[0]
                cent_scores = qc @ centroids.T  # (Qc, C) — replicated compute
                probe = jax.lax.top_k(cent_scores, nprobe)[1]  # global, best-first
                pl = probe - c0  # local cluster index of each probe
                own = (pl >= 0) & (pl < cn)
                plc = jnp.clip(pl, 0, c_max - 1)
                starts = loffs[plc]
                lens = jnp.where(own, loffs[plc + 1] - starts, 0)
                prefix = jnp.concatenate(
                    [jnp.zeros((qc.shape[0], 1), lens.dtype), jnp.cumsum(lens, axis=1)],
                    axis=1,
                )
                total = prefix[:, -1]
                j = jnp.arange(r_local, dtype=lens.dtype)
                seg = jax.vmap(lambda p: jnp.searchsorted(p, j, side="right") - 1)(prefix)
                seg = jnp.clip(seg, 0, nprobe - 1)
                idx = jnp.take_along_axis(starts, seg, axis=1) + (
                    j[None, :] - jnp.take_along_axis(prefix, seg, axis=1)
                )
                valid = j[None, :] < total[:, None]
                idx = jnp.where(valid, idx, 0)
                cand = vecs[idx]  # (Qc, R_local, D) local CSR gather
                scores = jnp.einsum("qd,qrd->qr", qc, cand,
                                    preferred_element_type=jnp.float32)
                scores = jnp.where(valid, scores, -jnp.inf)
                vals, pos = jax.lax.top_k(scores, k_eff)
                sel = jnp.take_along_axis(idx, pos, axis=1)
                rows = jnp.where(jnp.isfinite(vals), rows_map[sel], -1)
                return vals, rows

            part_vals, part_rows = per_shard(
                qc, vecs, rows_map, loffs, c_start, c_count, centroids
            )  # (Qc, k_eff·n_shards) each
            vals, pos = jax.lax.top_k(part_vals, min(top_n, part_vals.shape[1]))
            return vals, jnp.take_along_axis(part_rows, pos, axis=1)

        q = np.asarray(queries, dtype=np.float32)
        # bound the (Qc, R_local, D) per-shard gather working set to ~1 GB
        chunk_q = max(1, int(1e9 / (r_local * q.shape[1] * 4)))
        out_vals, out_rows = [], []
        for start in range(0, len(q), chunk_q):
            chunk = q[start : start + chunk_q]
            pad = 0
            if chunk.shape[0] < chunk_q and start > 0:
                pad = chunk_q - chunk.shape[0]
                chunk = np.pad(chunk, ((0, pad), (0, 0)))
            v, r = run_chunk(
                jnp.asarray(chunk), sd["vecs"], sd["rows_map"], sd["loffs"],
                sd["c_start"], sd["c_count"], sd["centroids"],
            )
            v, r = np.asarray(v), np.asarray(r)
            if pad:
                v, r = v[:-pad], r[:-pad]
            out_vals.append(v)
            out_rows.append(r)
        vals, rows = np.concatenate(out_vals), np.concatenate(out_rows)
        if vals.shape[1] < top_n:
            padw = top_n - vals.shape[1]
            vals = np.pad(vals, ((0, 0), (0, padw)), constant_values=-np.inf)
            rows = np.pad(rows, ((0, 0), (0, padw)), constant_values=-1)
        return vals, rows

    def search_rows(self, queries: np.ndarray, top_n: int) -> Tuple[np.ndarray, np.ndarray]:
        """Like :meth:`search` but returns RAW original-row indices (int, -1
        invalid) — the integer fast path ColBERT's per-token merge consumes
        (same contract as FlatIndex.search_rows), which makes the IVF index a
        drop-in candidate generator for late-interaction retrieval (the
        PLAID-style centroid-pruned alternative to the exhaustive scan)."""
        if self._n_shards() > 1:
            return self._search_rows_sharded(queries, top_n)
        q = jnp.asarray(np.asarray(queries), dtype=jnp.float32)
        centroids = jnp.asarray(self._centroids, dtype=jnp.float32)
        # corpus stays in its STORAGE dtype on device (f16 default: 13.7 GB at
        # the reference's 8.9M×768 — an f32 copy would not fit HBM); scores
        # compute in bf16 on the MXU with f32 accumulation like the flat scans
        corpus = jnp.asarray(self._sorted_vectors)
        offsets = jnp.asarray(self._offsets)
        nprobe = min(self.nprobe, self.n_clusters_eff)
        r_budget = self._budget(nprobe)
        dim = self._sorted_vectors.shape[1]
        itemsize = self._sorted_vectors.dtype.itemsize
        # bound the (Qc, R, D) gathered working set to ~1 GB
        chunk_q = max(1, int(1e9 / (r_budget * dim * itemsize)))
        # score in bf16 only when the index stores 16-bit vectors; a
        # token_dtype float32 index paid 2x memory for exact f32 ranking
        # and must keep it (matches the sharded path, line 624)
        compute_dtype = (
            jnp.bfloat16 if self._sorted_vectors.dtype.itemsize == 2 else jnp.float32
        )

        @jax.jit
        def run_chunk(qc, corpus, centroids, offsets):
            # device arrays are ARGUMENTS: closing over the multi-GB corpus
            # would serialize it into the remote-compile payload
            cent_scores = qc @ centroids.T  # (Qc, C)
            probe = jax.lax.top_k(cent_scores, nprobe)[1]  # (Qc, nprobe) best-first
            starts = offsets[probe]  # (Qc, nprobe)
            lens = offsets[probe + 1] - starts
            prefix = jnp.concatenate(
                [jnp.zeros((qc.shape[0], 1), lens.dtype), jnp.cumsum(lens, axis=1)], axis=1
            )  # (Qc, nprobe+1)
            total = prefix[:, -1]
            j = jnp.arange(r_budget, dtype=lens.dtype)  # (R,)
            # segment of candidate-slot j: which probed cluster it falls into
            seg = jax.vmap(lambda p: jnp.searchsorted(p, j, side="right") - 1)(prefix)
            seg = jnp.clip(seg, 0, nprobe - 1)  # (Qc, R)
            idx = jnp.take_along_axis(starts, seg, axis=1) + (
                j[None, :] - jnp.take_along_axis(prefix, seg, axis=1)
            )
            valid = j[None, :] < total[:, None]
            idx = jnp.where(valid, idx, 0)
            cand = corpus[idx].astype(compute_dtype)  # (Qc, R, D) CSR gather
            scores = jnp.einsum("qd,qrd->qr", qc.astype(compute_dtype), cand,
                                preferred_element_type=jnp.float32)
            scores = jnp.where(valid, scores, -jnp.inf)
            k = min(top_n, r_budget)
            vals, pos = jax.lax.top_k(scores, k)
            sorted_idx = jnp.take_along_axis(idx, pos, axis=1)
            sorted_idx = jnp.where(jnp.isfinite(vals), sorted_idx, -1)
            return vals, sorted_idx

        out_vals, out_rows = [], []
        n_q = q.shape[0]
        for start in range(0, n_q, chunk_q):
            chunk = q[start : start + chunk_q]
            if chunk.shape[0] < chunk_q and start > 0:
                # pad to the compiled chunk shape to avoid a fresh compile
                pad = chunk_q - chunk.shape[0]
                v, r = run_chunk(jnp.pad(chunk, ((0, pad), (0, 0))), corpus,
                                 centroids, offsets)
                v, r = v[: chunk.shape[0]], r[: chunk.shape[0]]
            else:
                v, r = run_chunk(chunk, corpus, centroids, offsets)
            out_vals.append(np.asarray(v))
            out_rows.append(np.asarray(r))
        vals, sorted_rows = np.concatenate(out_vals), np.concatenate(out_rows)
        rows = np.where(sorted_rows >= 0, self._sorted_rows[np.clip(sorted_rows, 0, None)], -1)
        if vals.shape[1] < top_n:
            pad = top_n - vals.shape[1]
            vals = np.pad(vals, ((0, 0), (0, pad)), constant_values=-np.inf)
            rows = np.pad(rows, ((0, 0), (0, pad)), constant_values=-1)
        return vals, rows

    def search(self, queries: np.ndarray, top_n: int) -> Tuple[np.ndarray, np.ndarray]:
        vals, rows = self.search_rows(queries, top_n)
        return gather_ids(self._ids, rows, len(self._ids), vals)

    @property
    def row_ids(self) -> np.ndarray:
        """Sequence id per ORIGINAL corpus row (aligns with search_rows)."""
        return self._ids

    def storage_bytes(self) -> int:
        """Index memory footprint (CSR: ~the flat corpus footprint)."""
        return (
            self._sorted_vectors.nbytes
            + self._sorted_rows.nbytes
            + self._offsets.nbytes
            + self._centroids.nbytes
        )

    def save(self, folder: str) -> None:
        os.makedirs(folder, exist_ok=True)
        np.savez_compressed(
            os.path.join(folder, "ivf_index.npz"),
            centroids=self._centroids,
            sorted_vectors=self._sorted_vectors,
            sorted_rows=self._sorted_rows,
            offsets=self._offsets,
            ids=self._ids,
        )

    def load(self, folder: str) -> None:
        data = np.load(os.path.join(folder, "ivf_index.npz"), allow_pickle=True)
        self._centroids = data["centroids"]
        self._sorted_vectors = data["sorted_vectors"]
        self._sorted_rows = data["sorted_rows"]
        self._offsets = data["offsets"]
        self._ids = data["ids"]
        self.n_clusters_eff = self._centroids.shape[0]
        self._shard_data = None


class DynamicClusterIndex(BaseNNIndexer):
    """Query-clustering index for TAS-B (reference FaissDynamicIndexer,
    faiss_indices.py:307-428): exposes centroid assignment
    (``search_preassigned`` equivalent), per-centroid member lists, and
    re-assignment updates."""

    def __init__(self, config=None):
        super().__init__(config)
        config = config or {}
        self.n_clusters = config.get("faiss_ivf_list_count", 2000)
        self.train_iters = config.get("ivf_train_iters", 10)
        self._centroids = None
        self._assignments = None  # row -> centroid
        self._ids = None

    def index_all(self, ids: np.ndarray, vectors: np.ndarray) -> None:
        self._ids = np.asarray(ids)
        k = min(self.n_clusters, len(ids))
        centroids, assign = kmeans(jnp.asarray(np.asarray(vectors, np.float32)), k, self.train_iters)
        self._centroids = np.asarray(centroids)
        self._assignments = np.asarray(assign)

    def assign(self, vectors: np.ndarray, block: int = 65536) -> np.ndarray:
        """Nearest centroid id per vector (L2, matching k-means training);
        blocked so memory stays O(block × n_clusters)."""
        c = jnp.asarray(self._centroids)
        c_sq = (c**2).sum(-1)

        @jax.jit
        def assign_block(v):
            return jnp.argmin(-2 * v @ c.T + c_sq[None, :], axis=1)

        out = []
        vectors = np.asarray(vectors, np.float32)
        for i in range(0, len(vectors), block):
            out.append(np.asarray(assign_block(jnp.asarray(vectors[i : i + block]))))
        return np.concatenate(out)

    def cluster_members(self, cluster_id: int) -> np.ndarray:
        return self._ids[self._assignments == cluster_id]

    def update(self, ids: np.ndarray, vectors: np.ndarray) -> None:
        """Re-assign the given rows (reference faiss_indices.py:368)."""
        new_assign = self.assign(vectors)
        id_to_pos = {i: p for p, i in enumerate(self._ids)}
        for i, a in zip(ids, new_assign):
            self._assignments[id_to_pos[i]] = a

    def save(self, folder: str) -> None:
        os.makedirs(folder, exist_ok=True)
        np.savez_compressed(
            os.path.join(folder, "dynamic_index.npz"),
            centroids=self._centroids,
            assignments=self._assignments,
            ids=self._ids,
        )

    def load(self, folder: str) -> None:
        data = np.load(os.path.join(folder, "dynamic_index.npz"), allow_pickle=True)
        self._centroids = data["centroids"]
        self._assignments = data["assignments"]
        self._ids = data["ids"]


class StreamingFlatIndex(BaseNNIndexer):
    """Exact MIPS over a larger-than-HBM corpus streamed from disk blocks.

    TPU equivalent of faiss's sharded on-disk index
    (FaissShardedOnDiskIdIndexer, faiss_indices.py:147-293): the encode phase's
    memmapped ``token_reps_N.npy`` blocks ARE the index — search streams each
    block host→HBM and keeps a device-side running top-k, with no host sync
    until the final fetch (disk read + H2D of block i+1 overlap block i's
    compute; see :meth:`search`). Capacity is bounded by disk, not HBM."""

    def __init__(self, config=None, mesh=None):
        super().__init__(config)
        self.encode_folder: Optional[str] = (config or {}).get("encode_folder")
        self._blocks: list = []
        self._row_ids: Optional[np.ndarray] = None

    def index_from_folder(self, folder: str) -> None:
        import json as _json

        from matchmaker_tpu.retrieval.encode import load_encoded  # noqa: F401 (format doc)

        with open(os.path.join(folder, "encode_meta.json")) as f:
            meta = _json.load(f)
        self._blocks = [
            np.load(os.path.join(folder, f"token_reps_{i}.npy"), mmap_mode="r")
            for i in range(meta["blocks"])
        ]
        data = np.load(os.path.join(folder, "doc_infos.npz"), allow_pickle=True)
        ids, spans = data["ids"], data["spans"]
        total = sum(b.shape[0] for b in self._blocks)
        row_ids = np.empty(total, dtype=ids.dtype)
        offsets = np.cumsum([0] + [b.shape[0] for b in self._blocks])
        for sid, (block, start, end) in zip(ids, spans):
            base = offsets[block]
            row_ids[base + start : base + end] = sid
        self._row_ids = row_ids
        self._offsets = offsets

    def index(self, ids: np.ndarray, vectors: np.ndarray) -> None:
        # in-memory fallback: treat the given matrix as a single block
        self._blocks = [np.asarray(vectors, dtype=self.dtype)]
        self._row_ids = np.asarray(ids)
        self._offsets = np.array([0, len(vectors)])

    def search(self, queries: np.ndarray, top_n: int) -> Tuple[np.ndarray, np.ndarray]:
        """Streamed exact top-k: per-block top-k with a DEVICE-side running
        merge and no host sync inside the loop.

        The loop body only *dispatches* async work (host→HBM copy of the next
        block, the block's matmul+top-k, a (Q, 2k)-wide merge against the
        running result); nothing is fetched until the end, so while the device
        computes block i the host is already reading block i+1 from disk and
        its H2D copy rides the DMA engine under the compute. Blocks are padded
        to one uniform shape (traced ``n_valid`` masks the tail) so the whole
        stream is exactly two compiled programs."""
        q = jnp.asarray(np.asarray(queries), dtype=jnp.float32)
        if not self._blocks:
            empty = np.full((q.shape[0], top_n), -np.inf, np.float32)
            return empty, np.full((q.shape[0], top_n), -1)
        block_rows = max(b.shape[0] for b in self._blocks)
        # one block can contribute at most block_rows results, but the RUNNING
        # merge must keep the full requested width — with many small blocks the
        # true top-N spans blocks (top_n > block_rows loses real hits otherwise)
        block_k = min(top_n, block_rows)
        total_rows = int(self._offsets[-1])
        k = min(top_n, total_rows)
        dim = self._blocks[0].shape[1]

        @jax.jit
        def block_topk(q, block, n_valid, offset):
            scores = jnp.einsum("qd,nd->qn", q, block, preferred_element_type=jnp.float32)
            row = jnp.arange(scores.shape[1])
            scores = jnp.where(row[None, :] < n_valid, scores, -jnp.inf)
            vals, idx = jax.lax.top_k(scores, block_k)
            idx = jnp.where(jnp.isfinite(vals), idx + offset, -1)
            return vals, idx

        @jax.jit
        def merge(vals_a, idx_a, vals_b, idx_b):
            v = jnp.concatenate([vals_a, vals_b], axis=1)
            i = jnp.concatenate([idx_a, idx_b], axis=1)
            mv, pos = jax.lax.top_k(v, k)
            return mv, jnp.take_along_axis(i, pos, axis=1)

        def put(bi):
            # disk read (memmap materialize) + async H2D; zero-pad to the
            # uniform block shape so one compile serves every block
            arr = np.asarray(self._blocks[bi], dtype=np.float32)
            if arr.shape[0] < block_rows:
                arr = np.pad(arr, ((0, block_rows - arr.shape[0]), (0, 0)))
            return jax.device_put(arr), self._blocks[bi].shape[0]

        dev, nv = put(0)
        merged_v, merged_i = block_topk(q, dev, nv, self._offsets[0])
        if block_k < k:  # widen the running buffer to the merge width (once)
            padw = k - block_k
            merged_v = jnp.pad(merged_v, ((0, 0), (0, padw)), constant_values=-jnp.inf)
            merged_i = jnp.pad(merged_i, ((0, 0), (0, padw)), constant_values=-1)
        for bi in range(1, len(self._blocks)):
            dev, nv = put(bi)  # host work overlaps the device's previous block
            v, i = block_topk(q, dev, nv, self._offsets[bi])
            merged_v, merged_i = merge(merged_v, merged_i, v, i)
        vals, idx = np.asarray(merged_v), np.asarray(merged_i)  # single sync
        if vals.shape[1] < top_n:
            pad = top_n - vals.shape[1]
            vals = np.pad(vals, ((0, 0), (0, pad)), constant_values=-np.inf)
            idx = np.pad(idx, ((0, 0), (0, pad)), constant_values=-1)
        return gather_ids(self._row_ids, idx, len(self._row_ids), vals)

    def save(self, folder: str) -> None:
        # the encode folder already is the on-disk index; record the pointer
        os.makedirs(folder, exist_ok=True)
        with open(os.path.join(folder, "streaming_meta.json"), "w") as f:
            import json as _json

            _json.dump({"encode_folder": self.encode_folder}, f)

    def load(self, folder: str) -> None:
        import json as _json

        with open(os.path.join(folder, "streaming_meta.json")) as f:
            self.encode_folder = _json.load(f)["encode_folder"]
        self.index_from_folder(self.encode_folder)


def build_index(config, mesh=None) -> BaseNNIndexer:
    """Index factory keyed on ``faiss_index_type`` (reference
    dense_retrieval.py:308-320). hnsw → first-party native graph index
    (falls back to IVF when the native lib can't build). scann → the
    ScaNN operating point expressed TPU-natively: compressed (int8-global)
    approximate scan + exact re-ranking of the oversampled candidates
    (ScaNN = lossy quantized scoring + reorder; reference scann_index.py's
    ``reorder`` stage), i.e. FlatIndex in two-stage mode."""
    kind = config.get("faiss_index_type", "flat")
    if kind in ("flat", "exact", "full"):
        return FlatIndex(config, mesh)
    if kind == "scann":
        # default: measured-best approximate operating point — fused bin-max
        # candidate scan (ops/mips_binmax.py), 39.8k QPS per 1.1M shard @
        # recall@1000 0.9967 vs f32-exact, 2x the XLA scan.
        # `scann_backend: tree_ah` selects the LITERAL ScaNN shape instead
        # (k-means tree + anisotropic int8 AH scoring + exact reorder,
        # retrieval/scann_tree_ah.py — reference scann_index.py:32-35).
        if config.get("scann_backend") == "tree_ah":
            from matchmaker_tpu.retrieval.scann_tree_ah import ScaNNTreeAHIndex

            return ScaNNTreeAHIndex(config, mesh)
        cfg = dict(config)
        cfg.setdefault("mips_quantization", "float16")
        cfg.setdefault("mips_approx_topk", True)
        cfg.setdefault("mips_kernel", "binmax")
        return FlatIndex(cfg, mesh)
    if kind == "hnsw":
        from matchmaker_tpu.retrieval.hnsw import hnsw_available

        if hnsw_available():
            from matchmaker_tpu.retrieval.hnsw import HNSWIndex

            return HNSWIndex(config, mesh)
        print("[index] native HNSW unavailable; falling back to IVF")
        return IVFIndex(config, mesh)
    if kind == "ivf":
        return IVFIndex(config, mesh)
    if kind in ("sharded_ondisk", "streaming"):
        return StreamingFlatIndex(config, mesh)
    if kind == "dynamic":
        return DynamicClusterIndex(config)
    raise ValueError(f"unknown faiss_index_type: {kind}")
