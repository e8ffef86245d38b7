"""ColBERT MaxSim ops (late-interaction scoring).

Math contract: reference models/colbert.py:66-75 — per-term score matrix
``Q·Dᵀ``; padded document positions forced to -1000 before the max over doc
positions; padded query positions zeroed before the sum over query positions.

TPU shape: the pairwise path is one (B,Lq,Ld) batched MXU matmul with the
mask/max/sum fused into its epilogue. The all-pairs path (in-batch teacher
matrices, reference colbert.py:114-162) flattens to a single
(B_q·Lq, B_d·Ld) matmul — the exact layout a Pallas fusion blocks over.
"""

from __future__ import annotations

import jax.numpy as jnp

NEG_FILL = -1000.0


def maxsim_pairwise(
    q_vecs: jnp.ndarray,  # (B, Lq, D)
    d_vecs: jnp.ndarray,  # (B, Ld, D)
    q_mask: jnp.ndarray,  # (B, Lq)
    d_mask: jnp.ndarray,  # (B, Ld)
) -> jnp.ndarray:
    """Per-pair MaxSim score (B,)."""
    per_term = jnp.einsum("bqd,bkd->bqk", q_vecs, d_vecs, preferred_element_type=jnp.float32)
    per_term = jnp.where(d_mask[:, None, :] > 0, per_term, NEG_FILL)
    best = per_term.max(axis=-1)
    return (best * q_mask).sum(axis=-1)


def maxsim_all_pairs(
    q_vecs: jnp.ndarray,  # (Bq, Lq, D)
    d_vecs: jnp.ndarray,  # (Bd, Ld, D)
    q_mask: jnp.ndarray,  # (Bq, Lq)
    d_mask: jnp.ndarray,  # (Bd, Ld)
) -> jnp.ndarray:
    """All-pairs MaxSim matrix (Bq, Bd) via one flat matmul."""
    bq, lq, dim = q_vecs.shape
    bd, ld, _ = d_vecs.shape
    flat = jnp.einsum(
        "qld,kmd->qlkm", q_vecs, d_vecs, preferred_element_type=jnp.float32
    )  # (Bq, Lq, Bd, Ld)
    flat = jnp.where(d_mask[None, None, :, :] > 0, flat, NEG_FILL)
    best = flat.max(axis=-1)  # (Bq, Lq, Bd)
    return (best * q_mask[:, :, None]).sum(axis=1)
