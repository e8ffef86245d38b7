"""Maximum-inner-product search ops: blocked exact top-k over a device-sharded
corpus.

This is the TPU-native replacement for faiss's ``IndexFlatIP`` / GPU-sharded
search (reference retrieval/faiss_indices.py:49-74): the corpus embedding
matrix lives row-sharded across the mesh's ``data`` axis in HBM, every chip
computes a blocked matmul + running top-k over its shard (MXU + O(k) state
instead of materializing the full score matrix), and the per-chip partials are
all-gathered over ICI and merged with one final top-k.

The public entry is :func:`sharded_topk_mips`; :func:`blocked_topk_scores` is
the single-shard building block (also the numerical ground truth the Pallas
kernel in ops/mips_pallas.py is tested against).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def blocked_topk_scores(
    queries: jnp.ndarray,  # (Q, D)
    corpus: jnp.ndarray,  # (N, D)
    k: int,
    block_size: int = 65536,
    index_offset: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k inner products via a scan over corpus blocks.

    Peak memory is O(Q·block) instead of O(Q·N); each block is one MXU matmul
    whose top-k folds into a running (Q, k) state. ``index_offset`` shifts
    returned indices (per-shard global ids)."""
    q, d = queries.shape
    n = corpus.shape[0]
    k = min(k, n)
    n_blocks = -(-n // block_size)
    padded_n = n_blocks * block_size
    if padded_n != n:
        corpus = jnp.pad(corpus, ((0, padded_n - n), (0, 0)))
    blocks = corpus.reshape(n_blocks, block_size, d)

    def body(carry, inp):
        block, block_num = inp
        scores = jnp.einsum("qd,nd->qn", queries, block, preferred_element_type=jnp.float32)
        base = block_num * block_size
        # mask padded rows (beyond n) with -inf
        row_ids = base + jnp.arange(block_size)
        scores = jnp.where(row_ids[None, :] < n, scores, -jnp.inf)
        v, i = jax.lax.top_k(scores, k)
        return carry, (v, (base + i).astype(jnp.int32))

    # collect per-block top-k, single final merge (2-4x faster than a running
    # carry merge on TPU — the sequential merges dominated)
    _, (block_vals, block_idx) = jax.lax.scan(body, 0.0, (blocks, jnp.arange(n_blocks)))
    all_vals = jnp.moveaxis(block_vals, 0, 1).reshape(q, n_blocks * k)
    all_idx = jnp.moveaxis(block_idx, 0, 1).reshape(q, n_blocks * k)
    vals, pos = jax.lax.top_k(all_vals, k)
    return vals, jnp.take_along_axis(all_idx, pos, axis=1) + index_offset


def sharded_topk_mips(
    queries: jnp.ndarray,  # (Q, D) replicated
    corpus: jnp.ndarray,  # (N, D) sharded over mesh axis
    k: int,
    mesh: Optional[Mesh] = None,
    axis="data",  # a mesh axis name or a tuple of names (multi-host (dcn, ici))
    block_size: int = 65536,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k MIPS over a row-sharded corpus; returns (Q, k) scores + ids.

    Each chip runs :func:`blocked_topk_scores` on its shard; the (Q, k)
    partials ride ICI via the implicit all-gather of the final top-k merge."""
    if mesh is None or len(mesh.devices.flatten()) == 1:
        return blocked_topk_scores(queries, corpus, k, block_size)

    from matchmaker_tpu.parallel.mesh import axis_size

    n_shards = axis_size(mesh, axis)
    shard_rows = corpus.shape[0] // n_shards

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=(P(None, axis), P(None, axis)),
        check_vma=False,
    )
    def per_shard(q, corpus_shard):
        shard_id = jax.lax.axis_index(axis)
        vals, idx = blocked_topk_scores(
            q, corpus_shard, k, block_size, index_offset=shard_id * shard_rows
        )
        if vals.shape[1] < k:
            # tiny shard (rows < k): pad partials so gathered shapes stay (Q, k)
            pad = k - vals.shape[1]
            vals = jnp.pad(vals, ((0, 0), (0, pad)), constant_values=-jnp.inf)
            idx = jnp.pad(idx, ((0, 0), (0, pad)), constant_values=-1)
        return vals, idx

    part_vals, part_idx = per_shard(queries, corpus)  # (Q, k*n_shards)
    vals, pos = jax.lax.top_k(part_vals, k)
    return vals, jnp.take_along_axis(part_idx, pos, axis=1)
