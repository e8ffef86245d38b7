"""Two-stage exact MIPS: approximate candidate scan + exact rescore.

The round-1 decomposition (ROADMAP item 2) showed exhaustive search on TPU is
matmul-bound only when the top-k is `lax.approx_max_k` (exact `lax.top_k`
costs ~50× the matmul), but the hardware-binned approx top-k caps
recall@1000 at ~0.94. This module restores recall parity at approx speed:

  stage 1  int8(-global) blocked matmul + ``approx_max_k`` fetching an
           *oversampled* candidate set (``oversample``·k per query) — the
           cheap scan touches every corpus row;
  stage 2  gather only the candidates' rows and rescore them exactly
           (f32 accumulate), then one exact ``top_k`` over the tiny
           candidate set.

The final ranking equals exact search over the rescore corpus wherever the
true top-k survives stage 1 — with 4× oversampling the measured recall@1000
is ≈1.0 (see BENCH / PARITY). Composes with the mesh sharding: each chip runs
both stages on its shard, partials merge with one (Q, k·shards) top-k.

This replaces faiss's IndexFlatIP + ScalarQuantizer fp16 path
(reference faiss_indices.py:49-74) at the reference's recall with the TPU's
approx-top-k economics.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from matchmaker_tpu.ops.mips_quant import quantized_blocked_topk


def twostage_exact_topk(
    queries: jnp.ndarray,  # (Q, D) f32
    values: jnp.ndarray,  # (N, D) int8 stage-1 corpus
    scales: jnp.ndarray,  # () global or (N,) per-row f32
    k: int,
    oversample: int = 4,
    block_size: int = 131072,
    recall_target: float = 0.95,
    rescore_corpus: Optional[jnp.ndarray] = None,  # (N, D) f16/bf16/f32; None → int8 rescore
    index_offset: int = 0,
    n_valid=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact-rescored top-k; returns (Q, k) f32 scores + int32 ids.
    ``n_valid`` masks zero-padded storage tails in the stage-1 scan (padded
    rows score 0.0, which can displace real sub-zero candidates)."""
    n = values.shape[0]
    fetch = min(max(k * oversample, k), n)
    cand_vals, cand_idx = quantized_blocked_topk(
        queries, values, scales, fetch,
        block_size=block_size, approx=True, recall_target=recall_target,
        n_valid=n_valid,
    )
    valid = jnp.isfinite(cand_vals)
    safe_idx = jnp.clip(cand_idx, 0, n - 1)

    if rescore_corpus is not None:
        cand_vecs = rescore_corpus[safe_idx].astype(jnp.float32)  # (Q, fetch, D)
        exact = jnp.einsum("qd,qcd->qc", queries, cand_vecs, preferred_element_type=jnp.float32)
    else:
        cand_vecs = values[safe_idx].astype(jnp.float32)
        exact = jnp.einsum("qd,qcd->qc", queries, cand_vecs, preferred_element_type=jnp.float32)
        if jnp.ndim(scales) == 0:
            exact = exact * scales
        else:
            exact = exact * scales[safe_idx]
    exact = jnp.where(valid, exact, -jnp.inf)
    k_eff = min(k, cand_vals.shape[1])
    vals, pos = jax.lax.top_k(exact, k_eff)
    idx = jnp.take_along_axis(cand_idx, pos, axis=1) + index_offset
    idx = jnp.where(jnp.isfinite(vals), idx, -1)
    if k_eff < k:
        vals = jnp.pad(vals, ((0, 0), (0, k - k_eff)), constant_values=-jnp.inf)
        idx = jnp.pad(idx, ((0, 0), (0, k - k_eff)), constant_values=-1)
    return vals, idx


def sharded_twostage_topk(
    queries: jnp.ndarray,
    values: jnp.ndarray,
    scales: jnp.ndarray,
    k: int,
    mesh: Optional[Mesh] = None,
    axis="data",  # a mesh axis name or a tuple of names (multi-host (dcn, ici))
    rescore_corpus: Optional[jnp.ndarray] = None,
    **kw,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mesh-sharded two-stage search: both stages run per chip on its corpus
    shard; the (Q, k·shards) partials merge with one exact top-k (the merge
    rides the implicit all-gather over ICI)."""
    n_valid = kw.pop("n_valid", None)
    if mesh is None or len(mesh.devices.flatten()) == 1:
        return twostage_exact_topk(
            queries, values, scales, k, rescore_corpus=rescore_corpus,
            n_valid=n_valid, **kw
        )

    from matchmaker_tpu.parallel.mesh import axis_size

    n_shards = axis_size(mesh, axis)
    shard_rows = values.shape[0] // n_shards
    if n_valid is None:
        n_valid = values.shape[0]
    scale_spec = P() if jnp.ndim(scales) == 0 else P(axis)
    in_specs = [P(), P(axis, None), scale_spec]
    args = [queries, values, scales]
    if rescore_corpus is not None:
        in_specs.append(P(axis, None))
        args.append(rescore_corpus)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(None, axis), P(None, axis)),
        check_vma=False,
    )
    def per_shard(q, v_shard, s_shard, *rest):
        shard_id = jax.lax.axis_index(axis)
        base = shard_id * shard_rows
        # mask global tail padding BEFORE the per-shard candidate top-k
        local_valid = jnp.clip(n_valid - base, 0, shard_rows)
        vals, idx = twostage_exact_topk(
            q, v_shard, s_shard, k,
            rescore_corpus=rest[0] if rest else None,
            index_offset=0, n_valid=local_valid, **kw,
        )
        idx = jnp.where(jnp.isfinite(vals) & (idx >= 0), idx + base, -1)
        return vals, idx

    part_vals, part_idx = per_shard(*args)
    vals, pos = jax.lax.top_k(part_vals, k)
    return vals, jnp.take_along_axis(part_idx, pos, axis=1)
