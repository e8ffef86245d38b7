"""Pallas TPU kernels for the hot scoring ops.

Each kernel fuses a matmul with its reduction epilogue so the big intermediate
never leaves VMEM:

- :func:`maxsim_all_pairs_pallas` — ColBERT all-pairs MaxSim. The unfused
  jnp path (ops/maxsim.py) materializes a (Bq, Lq, Bd, Ld) tensor in HBM
  (e.g. 32×32×64×200×4B ≈ 52 MB per teacher batch); here each (bq, bd) grid
  cell computes its (Lq, Ld) tile on the MXU, reduces max-over-doc /
  sum-over-query on the VPU, and writes one scalar.
- :func:`kernel_pooling_pallas` — TK/KNRM gaussian kernel pooling. The
  unfused path materializes (B, Lq, Ld, K); here the K kernel activations are
  computed and reduced per batch element entirely in VMEM.

Both fall back to interpreter mode off-TPU (tests run them on CPU against the
jnp reference implementations).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_FILL = -1000.0


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


# ---------------------------------------------------------------------------
# all-pairs MaxSim
# ---------------------------------------------------------------------------


def _maxsim_kernel(q_ref, qm_ref, d_ref, dm_ref, out_ref):
    # q_ref: (Lq, D), d_ref: (Ld, D), masks (1, Lq)/(1, Ld); out (1, 1)
    scores = jax.lax.dot_general(
        q_ref[0], d_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Lq, Ld)
    d_mask = dm_ref[0, :]
    scores = jnp.where(d_mask[None, :] > 0, scores, NEG_FILL)
    best = scores.max(axis=1)  # (Lq,)
    out_ref[0, 0] = (best * qm_ref[0, :]).sum()


def maxsim_all_pairs_pallas(
    q_vecs: jnp.ndarray,  # (Bq, Lq, D)
    d_vecs: jnp.ndarray,  # (Bd, Ld, D)
    q_mask: jnp.ndarray,  # (Bq, Lq)
    d_mask: jnp.ndarray,  # (Bd, Ld)
    interpret: bool | None = None,
) -> jnp.ndarray:
    """(Bq, Bd) all-pairs MaxSim, fused in VMEM per grid cell."""
    bq, lq, dim = q_vecs.shape
    bd, ld, _ = d_vecs.shape
    if interpret is None:
        interpret = not _on_tpu()

    return pl.pallas_call(
        _maxsim_kernel,
        grid=(bq, bd),
        in_specs=[
            pl.BlockSpec((1, lq, dim), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, lq), lambda i, j: (i, 0)),
            pl.BlockSpec((1, ld, dim), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((1, ld), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((bq, bd), jnp.float32),
        interpret=interpret,
    )(
        q_vecs.astype(jnp.float32),
        q_mask.astype(jnp.float32),
        d_vecs.astype(jnp.float32),
        d_mask.astype(jnp.float32),
    )


# ---------------------------------------------------------------------------
# fused gaussian kernel pooling (KNRM/TK scoring tail)
# ---------------------------------------------------------------------------


def _kernel_pool_kernel(
    q_ref, d_ref, qm_ref, dm_ref, mu_ref, sigma_ref, alpha_ref, out_ref, *, log_scale, mask_match
):
    # q: (Lq, D) normalized, d: (Ld, D) normalized → cosine = dot
    match = jax.lax.dot_general(
        q_ref[0], d_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Lq, Ld)
    q_m = qm_ref[0, :]
    d_m = dm_ref[0, :]
    if mask_match:
        match = match * (q_m[:, None] * d_m[None, :])
    mu = mu_ref[0, :]  # (K,)
    sigma = sigma_ref[0, :]
    alpha = alpha_ref[0, :]
    k = mu.shape[0]

    def one_kernel(ki, acc):
        act = jnp.exp(-((match - mu[ki]) ** 2) / (2.0 * sigma[ki] ** 2))
        act = act * d_m[None, :]
        per_q = act.sum(axis=1) * alpha[ki]  # (Lq,)
        feat = (jnp.log(jnp.clip(per_q, min=1e-10)) * log_scale * q_m).sum()
        return acc.at[ki].set(feat)

    out_ref[0, :] = jax.lax.fori_loop(0, k, one_kernel, jnp.zeros((k,), jnp.float32))


def kernel_pooling_pallas(
    q_norm: jnp.ndarray,  # (B, Lq, D) L2-normalized embeddings
    d_norm: jnp.ndarray,  # (B, Ld, D)
    q_mask: jnp.ndarray,
    d_mask: jnp.ndarray,
    mu: jnp.ndarray,  # (K,)
    sigma: jnp.ndarray,
    alpha: jnp.ndarray | None = None,
    log_scale: float = 1.0,
    mask_match_matrix: bool = True,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """(B, K) kernel-pooling features, fully fused per batch element."""
    b, lq, dim = q_norm.shape
    _, ld, _ = d_norm.shape
    k = mu.shape[0]
    if alpha is None:
        alpha = jnp.ones((k,), jnp.float32)
    if interpret is None:
        interpret = not _on_tpu()

    kernel = functools.partial(
        _kernel_pool_kernel, log_scale=log_scale, mask_match=mask_match_matrix
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, lq, dim), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, ld, dim), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, lq), lambda i: (i, 0)),
            pl.BlockSpec((1, ld), lambda i: (i, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, k), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, k), jnp.float32),
        interpret=interpret,
    )(
        q_norm.astype(jnp.float32),
        d_norm.astype(jnp.float32),
        q_mask.astype(jnp.float32),
        d_mask.astype(jnp.float32),
        mu.reshape(1, -1).astype(jnp.float32),
        sigma.reshape(1, -1).astype(jnp.float32),
        alpha.reshape(1, -1).astype(jnp.float32),
    )
