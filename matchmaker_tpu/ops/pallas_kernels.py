"""Pallas TPU kernel for ColBERT all-pairs MaxSim (round-2 blocked design).

:func:`maxsim_all_pairs_pallas_v2` fuses the flat (Bq·Lq, Bd·Ld) score matmul
with its masked segmented-max / masked-sum epilogue so the intermediate never
leaves VMEM: the grid runs over doc tiles, each cell issues ONE
(Bq·Lq, D)·(D, TD·Ld_pad) MXU matmul and reduces max-over-doc / sum-over-query
in-register with a static unroll over the TD docs (Ld padded to a lane
multiple so every per-doc column slice is 128-aligned). Off-TPU it runs in
interpreter mode; tests compare it against the jnp reference.

STATUS — measured on v5e, chained-dependency timing (bench docstring in
bench.py explains the tunnel protocol):

  round 1 (per-doc fori_loop): 79.5 ms vs XLA 7.45 ms → retired.
  round 2 (this kernel), teacher shape Bq32/Lq32/Bd64/Ld200/D128:
      XLA 0.299 ms  |  pallas_v2 0.306 ms   (bit-exact, 0.98–1.00x)
  Bq128/Bd256: XLA 3.184 ms | pallas_v2 3.176 ms (16.9 TF/s both, 1.00x)

Conclusion: XLA's output fusion already tiles the reduction into the matmul —
the hand kernel reaches parity, not a win, so the production MaxSim stays the
jnp path (ops/maxsim.py) and this kernel is retained as the measured-parity
alternative. The round-1 kernel-pooling kernel (10x slower, same fori_loop
pathology; XLA shown at-parity on the identical fusion pattern here) was
deleted rather than rewritten — the jnp path (ops/kernel_pooling.py) is
production. SURVEY §7's "fused Pallas" deliverable is thereby resolved by
measurement, per VERDICT round-1 item 3.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_FILL = -1000.0
_TILE = 8


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _pad_batch(x: jnp.ndarray, mult: int = _TILE) -> jnp.ndarray:
    b = x.shape[0]
    pad = (-b) % mult
    if pad == 0:
        return x
    return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))


# ---------------------------------------------------------------------------
# all-pairs MaxSim v2: blocked — one MXU matmul per cell, segmented max
# unrolled statically over the doc tile
# ---------------------------------------------------------------------------


def _maxsim_v2_kernel(q_ref, qm_ref, d_ref, dm_ref, out_ref, *, td, ld_pad, compute_dtype):
    # q_ref: (Bq, Lq, D) full; d_ref: (TD, Ld_pad, D) tile; out: (TD, Bq)
    bq, lq, dim = q_ref.shape
    q_flat = q_ref[...].reshape(bq * lq, dim).astype(compute_dtype)
    d_flat = d_ref[...].reshape(td * ld_pad, dim).astype(compute_dtype)
    # ONE big MXU matmul per grid cell: (Bq·Lq, TD·Ld_pad), f32 accumulate
    scores = jax.lax.dot_general(
        q_flat, d_flat, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    q_mask = qm_ref[...]
    rows = []
    for t in range(td):  # static unroll: slices are 128-aligned (ld_pad % 128 == 0)
        s = scores[:, t * ld_pad : (t + 1) * ld_pad]
        s = jnp.where(dm_ref[t][None, :] > 0, s, NEG_FILL)
        best = s.max(axis=1).reshape(bq, lq)  # (Bq, Lq)
        rows.append((best * q_mask).sum(axis=1))  # (Bq,)
    out_ref[...] = jnp.stack(rows, axis=0)  # (TD, Bq)


def maxsim_all_pairs_pallas_v2(
    q_vecs: jnp.ndarray,  # (Bq, Lq, D)
    d_vecs: jnp.ndarray,  # (Bd, Ld, D)
    q_mask: jnp.ndarray,  # (Bq, Lq)
    d_mask: jnp.ndarray,  # (Bd, Ld)
    td: int = 8,
    compute_dtype: jnp.dtype = jnp.float32,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """(Bq, Bd) all-pairs MaxSim — blocked round-2 kernel (see module STATUS).

    Grid over doc tiles; every cell sees all queries (the q operand stays
    resident in VMEM across cells). Output is computed (Bd, Bq)-transposed so
    block shapes satisfy Mosaic's (8, 128)-or-full-dim tiling rule."""
    bq = q_vecs.shape[0]
    bd, ld, dim = d_vecs.shape
    if interpret is None:
        interpret = not _on_tpu()

    # pad Ld to a lane multiple so per-doc column slices stay 128-aligned;
    # padded positions carry mask 0 → forced to NEG_FILL before the max
    ld_pad = -(-ld // 128) * 128
    if ld_pad != ld:
        d_vecs = jnp.pad(d_vecs, ((0, 0), (0, ld_pad - ld), (0, 0)))
        d_mask = jnp.pad(d_mask, ((0, 0), (0, ld_pad - ld)))
    q_vecs = _pad_batch(q_vecs.astype(jnp.float32), 8)
    q_mask = _pad_batch(q_mask.astype(jnp.float32), 8)
    d_vecs = _pad_batch(d_vecs.astype(jnp.float32), td)
    d_mask = _pad_batch(d_mask.astype(jnp.float32), td)
    bq_pad, lq, _ = q_vecs.shape
    bd_pad = d_vecs.shape[0]

    kernel = functools.partial(
        _maxsim_v2_kernel, td=td, ld_pad=ld_pad, compute_dtype=compute_dtype
    )
    out_t = pl.pallas_call(
        kernel,
        grid=(bd_pad // td,),
        in_specs=[
            pl.BlockSpec((bq_pad, lq, dim), lambda j: (0, 0, 0)),
            pl.BlockSpec((bq_pad, lq), lambda j: (0, 0)),
            pl.BlockSpec((td, ld_pad, dim), lambda j: (j, 0, 0)),
            pl.BlockSpec((td, ld_pad), lambda j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((td, bq_pad), lambda j: (j, 0)),
        out_shape=jax.ShapeDtypeStruct((bd_pad, bq_pad), jnp.float32),
        interpret=interpret,
    )(q_vecs, q_mask, d_vecs, d_mask)
    return out_t.T[:bq, :bd]
