"""fp16-corpus MIPS scan — the recall-parity production search path.

The reference's default index is faiss IndexFlatIP over **fp16** vectors
(``token_dtype: float16``, faiss_indices.py:49-74 + ScalarQuantizer) — so the
recall@1000-parity target is the exact ranking over the fp16 corpus, not over
f32. This module scans the f16 corpus directly with bf16 MXU matmuls and
hardware-binned ``approx_max_k`` (un-aggregated: binned candidates merge
once with a single exact top-k — measured 2.2x); measured on v5e (clustered
normalized 768-dim embeddings, k=1000, Q=256, zero-padding masked via
``n_valid``):

  1.11M rows (one v5e-8 shard of MS MARCO): 37-45k QPS full-width at
      recall@1000 = 0.986 vs the f16-exact ranking / 0.9863 vs f32-exact
      (18k QPS at 0.993 with 557k blocks).
  8.9M rows on ONE chip (13.7 GB f16 in HBM, 557k blocks): 8,774 QPS at
      recall@1000 = 0.9981 / recall@10 = 0.9984 vs f16-exact.
  the f16-exact ranking overlaps f32-exact at 0.998@1000 — fp16 storage
      rounding costs only ~0.2%. (Round-1 measured "0.9447" here: that was
      zero-padded buffer tails scoring 0.0 and displacing real sub-zero
      tail hits, NOT storage rounding — fixed by ``n_valid``; see
      benchmarks/search_benchmark.py.)

No candidate gather, no quantization beyond the storage fp16: stage-wise
designs (int8 + gather rescore) lost 20x to HBM random-gather costs and are
superseded by this scan (see ops/mips_twostage.py for the retained
alternative). The fused Pallas bin-max kernel (ops/mips_binmax.py) beats
this scan on both axes — 39.8k vs 15.0k QPS honest (full result
consumption) at recall@1000 0.9967-vs-0.9863 on the same shard — and is the
preferred approximate engine (``mips_kernel: binmax``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def f16_scan_topk(
    queries: jnp.ndarray,  # (Q, D) f32
    corpus: jnp.ndarray,  # (N, D) f16/bf16
    k: int,
    block_size: Optional[int] = None,  # None → one full-width call
    approx: bool = True,
    recall_target: float = 0.95,
    index_offset: int = 0,
    n_valid: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k over an f16 corpus: bf16 matmul + approx (or exact) top-k per
    block, one exact merge. Full-width (block_size=None) is fastest when the
    (Q, N) score matrix fits HBM; use blocks beyond ~2M rows per call.

    ``n_valid``: number of real rows when the stored corpus carries zero-row
    padding (StreamingFlatIndex blocks, benchmark buffers). Zero rows score
    exactly 0.0 which CAN land in a deep top-k — on MS MARCO-shaped clustered
    corpora the true score at rank 1000 is often below 0, so unmasked padding
    silently displaces real results (this skewed the round-1 "parity line"
    measurement; see benchmarks/search_benchmark.py)."""
    q, dim = queries.shape
    n = corpus.shape[0]
    k = min(k, n)
    qb = queries.astype(jnp.bfloat16)

    # aggregate_to_topk=False skips the hardware aggregation of the binned
    # candidates; the single exact top_k over the (wider) candidate set at the
    # end does it once for all blocks — measured 2.2x end-to-end at 8.9M
    # (3,983 → 8,774 QPS) at identical recall
    def block_topk(scores, m, aggregate):
        if approx:
            return jax.lax.approx_max_k(
                scores, m, recall_target=recall_target, aggregate_to_topk=aggregate
            )
        return jax.lax.top_k(scores, m)

    if block_size is None or block_size >= n:
        scores = jax.lax.dot_general(
            qb, corpus.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # n_valid may be a traced value (per-shard local validity)
        if n_valid is not None and not (isinstance(n_valid, int) and n_valid >= n):
            limit = jnp.minimum(jnp.asarray(n_valid, jnp.int32), n)
            cols = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            scores = jnp.where(cols < limit, scores, -jnp.inf)
        v, i = block_topk(scores, k, aggregate=False)
        if v.shape[1] > k:  # un-aggregated binned candidates → one exact top-k
            v, pos = jax.lax.top_k(v, k)
            i = jnp.take_along_axis(i, pos, axis=1)
        return v, (i + index_offset).astype(jnp.int32)

    n_blocks = -(-n // block_size)
    padded_n = n_blocks * block_size
    if padded_n != n:
        corpus = jnp.pad(corpus, ((0, padded_n - n), (0, 0)))
    blocks = corpus.reshape(n_blocks, block_size, dim)
    k_block = min(k, block_size)  # per-block width is bounded by the block

    def body(carry, inp):
        vb, block_num = inp
        scores = jax.lax.dot_general(
            qb, vb.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        base = block_num * block_size
        row_ids = base + jnp.arange(block_size)
        # n_valid may be traced (per-shard local validity)
        limit = n if n_valid is None else jnp.minimum(jnp.asarray(n_valid, jnp.int32), n)
        scores = jnp.where(row_ids[None, :] < limit, scores, -jnp.inf)
        v, i = block_topk(scores, k_block, aggregate=False)
        return carry, (v, (base + i).astype(jnp.int32))

    _, (block_vals, block_idx) = jax.lax.scan(body, 0.0, (blocks, jnp.arange(n_blocks)))
    m = block_vals.shape[-1]
    all_vals = jnp.moveaxis(block_vals, 0, 1).reshape(q, n_blocks * m)
    all_idx = jnp.moveaxis(block_idx, 0, 1).reshape(q, n_blocks * m)
    vals, pos = jax.lax.top_k(all_vals, min(k, n_blocks * m))
    return vals, jnp.take_along_axis(all_idx, pos, axis=1) + index_offset


def sharded_f16_scan_topk(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    k: int,
    mesh: Optional[Mesh] = None,
    axis="data",  # a mesh axis name or a tuple of names (multi-host (dcn, ici))
    **kw,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mesh-sharded f16 scan: per-chip scan + one (Q, k·shards) merge over ICI.
    This is the BASELINE v5e-8 configuration: 8 chips × 1.11M-row shards."""
    n_valid = kw.pop("n_valid", None)
    if mesh is None or len(mesh.devices.flatten()) == 1:
        return f16_scan_topk(queries, corpus, k, n_valid=n_valid, **kw)

    from matchmaker_tpu.parallel.mesh import axis_size

    n_shards = axis_size(mesh, axis)
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
        # local validity: rows of THIS shard at/above (n_valid - base) are
        # global tail padding — masked BEFORE the per-shard top-k so zero
        # rows can't displace real candidates inside the tail shard
        local_valid = jnp.clip(n_valid - base, 0, shard_rows)
        vals, idx = f16_scan_topk(q, c_shard, k, index_offset=0, n_valid=local_valid, **kw)
        if vals.shape[1] < k:
            pad = k - vals.shape[1]
            vals = jnp.pad(vals, ((0, 0), (0, pad)), constant_values=-jnp.inf)
            idx = jnp.pad(idx, ((0, 0), (0, pad)), constant_values=-1)
        # -inf slots carry the -1 sentinel, never a real-looking global id
        return vals, jnp.where(jnp.isfinite(vals) & (idx >= 0), idx + base, -1)

    part_vals, part_idx = per_shard(queries, corpus)
    vals, pos = jax.lax.top_k(part_vals, k)
    return vals, jnp.take_along_axis(part_idx, pos, axis=1)
