"""Pallas TPU kernels for the hot scoring ops.

Each kernel fuses a matmul with its reduction epilogue so the big intermediate
never leaves VMEM:

- :func:`maxsim_all_pairs_pallas` — ColBERT all-pairs MaxSim. The unfused
  jnp path (ops/maxsim.py) materializes a (Bq, Lq, Bd, Ld) tensor in HBM
  (e.g. 32×32×64×200×4B ≈ 52 MB per teacher batch); here each grid cell
  computes 8 query rows' (Lq, Ld) tiles on the MXU, reduces max-over-doc /
  sum-over-query on the VPU, and writes an (8, Bd) tile.
- :func:`kernel_pooling_pallas` — TK/KNRM gaussian kernel pooling. The
  unfused path materializes (B, Lq, Ld, K); here the K kernel activations are
  computed and reduced per batch element entirely in VMEM.

Grid/block layout follows Mosaic's tiling rules: batch is processed in tiles
of 8 (sublane multiple); trailing dims stay whole. Off-TPU the kernels run in
interpreter mode (tests compare them against the jnp reference paths).

STATUS (v5e, Bq=32 Lq=32 Bd=64 Ld=200 D=128): the Pallas MaxSim is bit-exact
vs the jnp path but 10x slower (79.5 ms vs 7.45 ms) — the per-doc fori_loop
issues (256×128)·(128×200) matmuls that starve the MXU, while XLA fuses the
single big matmul + reductions without materializing the full intermediate.
The jnp implementations (ops/maxsim.py, ops/kernel_pooling.py) are therefore
the production paths; these kernels are kept as verified scaffolding for a
future blocked rewrite (doc-block matmuls + in-register segmented max).
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
# all-pairs MaxSim
# ---------------------------------------------------------------------------


def _maxsim_kernel(q_ref, qm_ref, d_ref, dm_ref, out_ref):
    # q_ref: (8, Lq, D) tile; d_ref: (Bd, Ld, D) full; out: (8, Bd)
    tile, lq, dim = q_ref.shape
    bd, ld, _ = d_ref.shape
    q_flat = q_ref[...].reshape(tile * lq, dim)
    q_mask = qm_ref[...]  # (8, Lq)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, bd), 1)

    def per_doc(j, acc):
        d_j = d_ref[j]  # (Ld, D)
        scores = jax.lax.dot_general(
            q_flat, d_j, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (8*Lq, Ld)
        scores = jnp.where(dm_ref[j][None, :] > 0, scores, NEG_FILL)
        best = scores.max(axis=1).reshape(tile, lq)  # (8, Lq)
        sums = (best * q_mask).sum(axis=1)  # (8,)
        # dynamic column stores are not supported by Mosaic — accumulate via a
        # one-hot outer product instead and store the tile once at the end
        return acc + sums[:, None] * (col_ids == j).astype(jnp.float32)

    out_ref[...] = jax.lax.fori_loop(0, bd, per_doc, jnp.zeros((tile, bd), jnp.float32))


def maxsim_all_pairs_pallas(
    q_vecs: jnp.ndarray,  # (Bq, Lq, D)
    d_vecs: jnp.ndarray,  # (Bd, Ld, D)
    q_mask: jnp.ndarray,  # (Bq, Lq)
    d_mask: jnp.ndarray,  # (Bd, Ld)
    interpret: bool | None = None,
) -> jnp.ndarray:
    """(Bq, Bd) all-pairs MaxSim, fused in VMEM."""
    bq = q_vecs.shape[0]
    bd, ld, dim = d_vecs.shape
    if interpret is None:
        interpret = not _on_tpu()

    q_vecs = _pad_batch(q_vecs.astype(jnp.float32))
    q_mask = _pad_batch(q_mask.astype(jnp.float32))
    bq_pad, lq, _ = q_vecs.shape

    out = pl.pallas_call(
        _maxsim_kernel,
        grid=(bq_pad // _TILE,),
        in_specs=[
            pl.BlockSpec((_TILE, lq, dim), lambda i: (i, 0, 0)),
            pl.BlockSpec((_TILE, lq), lambda i: (i, 0)),
            pl.BlockSpec((bd, ld, dim), lambda i: (0, 0, 0)),
            pl.BlockSpec((bd, ld), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((_TILE, bd), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((bq_pad, bd), jnp.float32),
        interpret=interpret,
    )(q_vecs, q_mask, d_vecs.astype(jnp.float32), d_mask.astype(jnp.float32))
    return out[:bq]


# ---------------------------------------------------------------------------
# fused gaussian kernel pooling (KNRM/TK scoring tail)
# ---------------------------------------------------------------------------


def _kernel_pool_kernel(
    q_ref, d_ref, qm_ref, dm_ref, mu_ref, sigma_ref, alpha_ref, out_ref, *, log_scale, mask_match
):
    tile, lq, dim = q_ref.shape
    _, ld, _ = d_ref.shape
    k = mu_ref.shape[1]
    mu = mu_ref[...]  # (1, K)
    sigma = sigma_ref[...]
    alpha = alpha_ref[...]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)

    def per_row(b, acc):
        match = jax.lax.dot_general(
            q_ref[b], d_ref[b], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (Lq, Ld)
        q_m = qm_ref[b]
        d_m = dm_ref[b]
        if mask_match:
            match = match * (q_m[:, None] * d_m[None, :])
        # all K kernel activations vectorized: (Lq, Ld, K)
        acts = jnp.exp(
            -((match[:, :, None] - mu[None, :, :]) ** 2) / (2.0 * sigma[None, :, :] ** 2)
        ) * d_m[None, :, None]
        per_q = acts.sum(axis=1) * alpha  # (Lq, K)
        feats = (jnp.log(jnp.clip(per_q, min=1e-10)) * log_scale * q_m[:, None]).sum(axis=0)  # (K,)
        return acc + feats[None, :] * (row_ids == b).astype(jnp.float32)

    out_ref[...] = jax.lax.fori_loop(0, tile, per_row, jnp.zeros((tile, k), jnp.float32))


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
    b = q_norm.shape[0]
    k = mu.shape[0]
    if alpha is None:
        alpha = jnp.ones((k,), jnp.float32)
    if interpret is None:
        interpret = not _on_tpu()

    q_norm = _pad_batch(q_norm.astype(jnp.float32))
    d_norm = _pad_batch(d_norm.astype(jnp.float32))
    q_mask = _pad_batch(q_mask.astype(jnp.float32))
    d_mask = _pad_batch(d_mask.astype(jnp.float32))
    b_pad, lq, dim = q_norm.shape
    _, ld, _ = d_norm.shape

    kernel = functools.partial(
        _kernel_pool_kernel, log_scale=log_scale, mask_match=mask_match_matrix
    )
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // _TILE,),
        in_specs=[
            pl.BlockSpec((_TILE, lq, dim), lambda i: (i, 0, 0)),
            pl.BlockSpec((_TILE, ld, dim), lambda i: (i, 0, 0)),
            pl.BlockSpec((_TILE, lq), lambda i: (i, 0)),
            pl.BlockSpec((_TILE, ld), lambda i: (i, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((_TILE, k), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b_pad, k), jnp.float32),
        interpret=interpret,
    )(
        q_norm,
        d_norm,
        q_mask,
        d_mask,
        mu.reshape(1, -1).astype(jnp.float32),
        sigma.reshape(1, -1).astype(jnp.float32),
        alpha.reshape(1, -1).astype(jnp.float32),
    )
    return out[:b]
