"""Gaussian kernel-pooling ops (the KNRM/TK/TKL scoring core).

Math contract with the reference (models/knrm.py:70-96, published/ecai20_tk.py:112-124):
cosine match matrix → per-kernel gaussian activation
``exp(-(cos - mu)^2 / (2 sigma^2))`` → masked sum over document positions →
``log(clamp(x, 1e-10))`` (optionally scaled) → masked sum over query positions.

TPU shape: everything here is a single fused XLA computation — the cosine
matrix is one (B,Lq,Ld) bf16-friendly matmul on the MXU and the kernel
activations/pooling fuse into its epilogue on the VPU. ``n_kernels`` sits in
the minor-most dimension so the (Lq, Ld, K) intermediate is laid out
lane-aligned. A Pallas fusion (blocking over Ld so the (Lq,Ld,K) tensor never
materializes in HBM) plugs in behind the same function signature.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp


def gaussian_kernel_mus(n_kernels: int) -> List[float]:
    """Kernel centers: 1.0 (exact match) + evenly spaced bin middles over [-1, 1]."""
    mus = [1.0]
    if n_kernels == 1:
        return mus
    bin_size = 2.0 / (n_kernels - 1)
    mus.append(1.0 - bin_size / 2)
    for i in range(1, n_kernels - 1):
        mus.append(mus[i] - bin_size)
    return mus


def gaussian_kernel_sigmas(n_kernels: int, sigma: float = None) -> List[float]:
    """Tiny sigma for the exact-match kernel, half-bin sigma for the rest."""
    if n_kernels == 1:
        return [0.0001]
    bin_size = 2.0 / (n_kernels - 1)
    return [0.0001] + [sigma if sigma is not None else 0.5 * bin_size] * (n_kernels - 1)


def cosine_match_matrix(q_emb: jnp.ndarray, d_emb: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """(B,Lq,D) x (B,Ld,D) → (B,Lq,Ld) cosine similarities (one MXU batch-matmul).

    rsqrt(sum² + eps) normalization keeps the gradient finite at the all-zero
    (padded) rows, unlike norm-then-divide."""
    q = q_emb * jax.lax.rsqrt((q_emb**2).sum(axis=-1, keepdims=True) + eps)
    d = d_emb * jax.lax.rsqrt((d_emb**2).sum(axis=-1, keepdims=True) + eps)
    return jnp.einsum("bqd,bkd->bqk", q, d, preferred_element_type=jnp.float32)


def kernel_activations(match: jnp.ndarray, mu: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """(B,Lq,Ld) → (B,Lq,Ld,K) gaussian activations."""
    diff = match[..., None] - mu.reshape(1, 1, 1, -1)
    return jnp.exp(-(diff**2) / (2.0 * sigma.reshape(1, 1, 1, -1) ** 2))


def kernel_pooling_features(
    match: jnp.ndarray,
    q_mask: jnp.ndarray,
    d_mask: jnp.ndarray,
    mu: jnp.ndarray,
    sigma: jnp.ndarray,
    alpha_scaler: Optional[jnp.ndarray] = None,
    log_scale: float = 1.0,
    mask_match_matrix: bool = True,
) -> jnp.ndarray:
    """Full pooling pipeline: (B,Lq,Ld) match + masks → (B,K) features.

    ``mask_match_matrix=True`` multiplies the match matrix by the joint mask
    before the kernels (KNRM behavior, knrm.py:62-75); TK instead relies on
    masking only the activations (ecai20_tk.py:112-118) — both zero padded
    *activations* via d_mask and padded *queries* via q_mask.
    """
    if mask_match_matrix:
        match = match * (q_mask[:, :, None] * d_mask[:, None, :])
    acts = kernel_activations(match, mu, sigma)
    acts = acts * d_mask[:, None, :, None]
    per_kernel_query = acts.sum(axis=2)  # (B, Lq, K)
    if alpha_scaler is not None:
        per_kernel_query = per_kernel_query * alpha_scaler.reshape(1, 1, -1)
    log_pkq = jnp.log(jnp.clip(per_kernel_query, min=1e-10)) * log_scale
    log_pkq = log_pkq * q_mask[..., None]
    return log_pkq.sum(axis=1)  # (B, K)
