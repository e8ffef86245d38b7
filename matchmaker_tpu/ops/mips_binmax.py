"""Fused MIPS scan: Pallas matmul + per-bin top-2 candidates, top-k outside.

Motivation (measured, see benchmarks/search_benchmark.py): the production
f16 scan (ops/mips_f16.py) is HBM-bound at MS MARCO shard sizes — the
(Q, N) f32 score matrix (1.1 GB at Q=256, N=1.11M) round-trips HBM between
the XLA matmul and ``approx_max_k``. This kernel fuses the reduction into the
matmul's epilogue so scores never leave VMEM: the grid walks corpus tiles,
each cell computes one (T, D)x(D, Q) MXU matmul (transposed — bins live on
the sublane axis, queries on lanes, so every reduction/reshape is
major-axis-only, which Mosaic supports) and reduces every 128-row bin to its
top-2 (value, index) candidates in-register. Candidate output is N/64 entries
per query (16x smaller than the scores), and one final exact ``lax.top_k``
over the candidates produces the result.

Recall model: a true top-k doc is lost only when ≥3 of the true top-k land
in the same 128-wide bin (the per-bin top-2 keeps pairs). For k=1000 over
1.11M rows (8.7k bins) the expected loss is <0.3%.

MEASURED (v5e, clustered normalized 768-dim corpus, Q=256, k=1000, 1.113M
rows — benchmarks/search_benchmark.py 'binmax' config):
    42,852 QPS @ recall@1000 0.9967 vs f32-exact / 0.998 vs f16-exact
    vs f16scan_full (XLA + approx_max_k): 37,265 QPS @ 0.9863 — this kernel
    wins both axes and is FlatIndex's preferred approximate engine
    (``mips_kernel: binmax``). Component times at that shape: candidates
    5.9 ms, final top_k 4.8 ms (partially overlapped → 7.7 ms/scan).
When bins/k is small the collision loss grows (0.90 recall@1000 at 131k
rows) — FlatIndex raises per_bin up to 8 and falls back to the exact scan
for corpora too small to cover k (retrieval/indexes.py).

Role: candidate generation for FlatIndex's approximate mode — the same
contract as ``approx_max_k(aggregate_to_topk=False)`` + exact merge, but
without materializing scores in HBM. Replaces the reference's faiss
IndexFlatIP scan (faiss_indices.py:49-74) at the same exactness class as
its fp16 storage.

Candidate layout (both implementations, asserted identical in tests): per
corpus tile of T rows, the first T/128 output rows are the rank-0 (bin max)
candidates, the next T/128 rows the rank-1 (second max), each shaped (., Q).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.sharding import Mesh, PartitionSpec as P

BIN_WIDTH = 128  # bin = one sublane group of corpus rows


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001 - no backend at all
        return False


def _topk_per_bin_t(scores_t: jnp.ndarray, base, n_valid: int, per_bin: int):
    """scores_t (T, Q) f32 → candidate (vals, ids), each (T//128*per_bin, Q).

    Shared by the kernel body and the jnp reference — pure jnp and
    layout-friendly: reductions run over the sublane axis, the lane axis (Q)
    is untouched. First-argmax emulation (min over matching row offsets)
    keeps tie behavior identical to jnp.argmax.
    """
    t, q = scores_t.shape
    nb = t // BIN_WIDTH
    row = jax.lax.broadcasted_iota(jnp.int32, (t, q), 0)
    scores_t = jnp.where(base + row < n_valid, scores_t, -jnp.inf)
    s3 = scores_t.reshape(nb, BIN_WIDTH, q)
    off = jax.lax.broadcasted_iota(jnp.int32, (nb, BIN_WIDTH, q), 1)
    bin_base = base + jax.lax.broadcasted_iota(jnp.int32, (nb, q), 0) * BIN_WIDTH

    vals, ids = [], []
    cur = s3
    for r in range(per_bin):
        m = cur.max(axis=1)
        # first row offset achieving the max (ties → lowest, like argmax)
        idx = jnp.min(jnp.where(cur == m[:, None, :], off, BIN_WIDTH), axis=1)
        idx = jnp.minimum(idx, BIN_WIDTH - 1)  # all--inf bin → masked by -inf val
        vals.append(m)
        ids.append(bin_base + idx)
        if r + 1 < per_bin:
            cur = jnp.where(off == idx[:, None, :], -jnp.inf, cur)
    return jnp.concatenate(vals, axis=0), jnp.concatenate(ids, axis=0)


def _binmax_kernel(q_ref, c_ref, val_ref, idx_ref, *, tile_rows, n_valid, per_bin):
    i = pl.program_id(0)
    # transposed matmul: (T, D)·(D, Q) → (T, Q); bins on sublanes, Q on lanes
    scores_t = jax.lax.dot_general(
        c_ref[...],
        q_ref[...],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    vals, ids = _topk_per_bin_t(scores_t, i * tile_rows, n_valid, per_bin)
    val_ref[...] = vals
    idx_ref[...] = ids.astype(jnp.int32)


def binmax_candidates(
    queries: jnp.ndarray,  # (Q, D) any float dtype
    corpus: jnp.ndarray,  # (N, D) f16/bf16; pre-pad N to tile_rows to avoid a copy
    n_valid: Optional[int] = None,
    per_bin: int = 2,
    tile_rows: int = 2048,
    interpret: Optional[bool] = None,
    q_chunk: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-bin top-``per_bin`` candidates over the whole corpus.

    Returns (vals, ids) of shape (Q, N//128*per_bin) in the tile-major,
    rank-blocked layout described in the module docstring.

    The corpus should be stored **bf16** on device: Mosaic has no f16 type,
    and the production f16-scan already computes in bf16 (mips_f16.py casts
    f16→bf16 before its matmul), so scores are identical. An f16/f32 input is
    converted here — materializing a device copy per call; avoid in hot loops.

    Query batches larger than ``q_chunk`` run as a ``lax.map`` over chunks —
    the in-kernel (tile_rows, Q) score block and its temporaries live in
    VMEM, which bounds Q per kernel launch (ColBERT's per-token searches
    send batch*query_len rows at once).
    """
    q, dim = queries.shape
    n = corpus.shape[0]
    q_chunk = max(128, q_chunk // 128 * 128)  # lane-axis multiple
    if corpus.dtype != jnp.bfloat16:
        corpus = corpus.astype(jnp.bfloat16)
    if n % tile_rows != 0:
        pad = tile_rows - n % tile_rows
        corpus = jnp.pad(corpus, ((0, pad), (0, 0)))
    if n_valid is None:
        n_valid = n
    n_pad = corpus.shape[0]
    if interpret is None:
        interpret = not _on_tpu()

    q_pad = -(-q // 128) * 128  # Q is the lane axis in-kernel
    qb = queries.astype(jnp.bfloat16)
    if q_pad != q:
        qb = jnp.pad(qb, ((0, q_pad - q), (0, 0)))

    nb_tile = tile_rows // BIN_WIDTH * per_bin
    n_cands = n_pad // BIN_WIDTH * per_bin
    kernel = functools.partial(
        _binmax_kernel, tile_rows=tile_rows, n_valid=n_valid, per_bin=per_bin
    )

    def launch(q_block):  # (q_chunk_or_pad, D) bf16 → (q_block, n_cands) pair
        qp = q_block.shape[0]
        vals_t, ids_t = pl.pallas_call(
            kernel,
            grid=(n_pad // tile_rows,),
            in_specs=[
                pl.BlockSpec((qp, dim), lambda i: (0, 0)),
                pl.BlockSpec((tile_rows, dim), lambda i: (i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((nb_tile, qp), lambda i: (i, 0)),
                pl.BlockSpec((nb_tile, qp), lambda i: (i, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_cands, qp), jnp.float32),
                jax.ShapeDtypeStruct((n_cands, qp), jnp.int32),
            ],
            interpret=interpret,
        )(q_block, corpus)
        return vals_t.T, ids_t.T

    if q_pad <= q_chunk:
        vals, ids = launch(qb)
        return vals[:q], ids[:q]

    # chunk the query axis: VMEM holds (tile_rows, q_chunk) scores + temps
    q_pad = -(-q // q_chunk) * q_chunk
    if q_pad != qb.shape[0]:
        qb = jnp.pad(qb, ((0, q_pad - qb.shape[0]), (0, 0)))
    else:
        qb = qb[:q_pad]
    chunks = qb.reshape(q_pad // q_chunk, q_chunk, dim)

    def body(q_block):
        return launch(q_block)

    vals, ids = jax.lax.map(body, chunks)
    return vals.reshape(q_pad, n_cands)[:q], ids.reshape(q_pad, n_cands)[:q]


def binmax_candidates_jnp(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    n_valid: Optional[int] = None,
    per_bin: int = 2,
    tile_rows: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference implementation: identical math and candidate layout, plain
    XLA (tests + CPU fallback)."""
    q, dim = queries.shape
    n = corpus.shape[0]
    if n % tile_rows != 0:
        corpus = jnp.pad(corpus, ((0, tile_rows - n % tile_rows), (0, 0)))
    if n_valid is None:
        n_valid = n
    qb = queries.astype(jnp.bfloat16)
    blocks = corpus.reshape(-1, tile_rows, dim)

    def body(_, inp):
        blk, i = inp
        scores_t = jax.lax.dot_general(
            blk.astype(jnp.bfloat16), qb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return None, _topk_per_bin_t(scores_t, i * tile_rows, n_valid, per_bin)

    _, (vals, ids) = jax.lax.scan(body, None, (blocks, jnp.arange(blocks.shape[0])))
    # (n_tiles, nb_tile, Q) → (Q, n_tiles*nb_tile), tile-major like the kernel
    vals = vals.reshape(-1, q).T
    ids = ids.reshape(-1, q).T
    return vals, ids.astype(jnp.int32)


def binmax_scan_topk(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    k: int,
    n_valid: Optional[int] = None,
    per_bin: int = 2,
    tile_rows: int = 2048,
    index_offset: int = 0,
    use_pallas: Optional[bool] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k over an f16 corpus: fused candidate scan + one exact top-k.

    Drop-in for :func:`ops.mips_f16.f16_scan_topk` (approx mode); same
    (values, int32 ids) contract, ids offset by ``index_offset`` for sharding.
    """
    if use_pallas is None:
        use_pallas = _on_tpu() or bool(interpret)
    fn = binmax_candidates if use_pallas else binmax_candidates_jnp
    kw = {"interpret": interpret} if use_pallas else {}
    vals, ids = fn(queries, corpus, n_valid=n_valid, per_bin=per_bin, tile_rows=tile_rows, **kw)
    k_eff = min(k, vals.shape[1])
    top_vals, pos = jax.lax.top_k(vals, k_eff)
    top_ids = jnp.take_along_axis(ids, pos, axis=1)
    return top_vals, (top_ids + index_offset).astype(jnp.int32)


def sharded_binmax_topk(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,  # (N, D), N divisible by the mesh axis size
    k: int,
    mesh: Optional[Mesh] = None,
    axis: str = "data",
    n_valid: Optional[int] = None,
    **kw,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mesh-sharded fused scan: per-chip kernel + one (Q, k·shards) ICI merge —
    the same composition as ops/mips_f16.sharded_f16_scan_topk.

    Global tail padding (zero rows below ``n_valid``) is filtered after the
    per-shard scan: the kernel's validity bound is a static compile-time
    constant, identical across shards under SPMD, so the tail shard's padded
    rows can displace at most ``per_bin`` candidates in the single bin where
    real rows and padding mix — ≤2 of k=1000, bounded by construction."""
    if mesh is None or len(mesh.devices.flatten()) == 1:
        return binmax_scan_topk(queries, corpus, k, n_valid=n_valid, **kw)

    n_shards = mesh.shape[axis]
    shard_rows = corpus.shape[0] // n_shards
    if n_valid is None:
        n_valid = corpus.shape[0]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=(P(None, axis), P(None, axis)),
        check_vma=False,
    )
    def per_shard(q, c_shard):
        shard_id = jax.lax.axis_index(axis)
        base = shard_id * shard_rows
        # local n_valid=shard_rows masks rows the kernel pads to a tile
        # multiple (otherwise their local ids would alias the NEXT shard's
        # global range); the global n_valid filter handles corpus-tail padding
        vals, idx = binmax_scan_topk(q, c_shard, k, n_valid=shard_rows, **kw)
        vals = jnp.where(idx + base < n_valid, vals, -jnp.inf)
        if vals.shape[1] < k:
            pad = k - vals.shape[1]
            vals = jnp.pad(vals, ((0, 0), (0, pad)), constant_values=-jnp.inf)
            idx = jnp.pad(idx, ((0, 0), (0, pad)), constant_values=-1)
        # -inf slots carry the -1 sentinel, never a real-looking global id
        return vals, jnp.where(jnp.isfinite(vals) & (idx >= 0), idx + base, -1)

    part_vals, part_idx = per_shard(queries, corpus)
    vals, pos = jax.lax.top_k(part_vals, k)
    return vals, jnp.take_along_axis(part_idx, pos, axis=1)
