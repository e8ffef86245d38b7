"""Pooling / misc NN utilities shared by the classic IR models."""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def masked_softmax(x: jnp.ndarray, mask: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Softmax over ``axis`` with masked entries excluded (reference
    modules/masked_softmax.py:4, drmm.py:97-120)."""
    neg = jnp.where(mask > 0, 0.0, -1e9)
    e = jnp.exp(x + neg - jax.lax.stop_gradient((x + neg).max(axis=axis, keepdims=True)))
    e = e * (mask > 0)
    return e / jnp.maximum(e.sum(axis=axis, keepdims=True), 1e-10)


def topk_values(x: jnp.ndarray, k: int, axis: int = -1) -> jnp.ndarray:
    """Top-k values (sorted desc) along ``axis``."""
    if axis != -1:
        x = jnp.moveaxis(x, axis, -1)
    vals = jax.lax.top_k(x, k)[0]
    return vals


def adaptive_max_pool_2d(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """torch AdaptiveMaxPool2d semantics on (B, H, W, C) arrays.

    Window for output cell i spans [floor(i*H/oh), ceil((i+1)*H/oh)); unrolled
    statically — output grids are small (MatchPyramid pools to e.g. 3×10)."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    rows = []
    for i in range(oh):
        h0, h1 = (i * h) // oh, -(-((i + 1) * h) // oh)
        cols = []
        for j in range(ow):
            w0, w1 = (j * w) // ow, -(-((j + 1) * w) // ow)
            cols.append(x[:, h0:h1, w0:w1, :].max(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (B, oh, ow, C)


def sliding_window_max(x: jnp.ndarray, window: int, stride: int = 1) -> jnp.ndarray:
    """1D max pooling over the last-but-one axis of (B, L, C)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, window, 1),
        window_strides=(1, stride, 1),
        padding="VALID",
    )


def sliding_window_mean(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """Right-padded rolling mean over axis 1 of (B, L, C), output length L."""
    padded = jnp.pad(x, ((0, 0), (0, window - 1), (0, 0)))
    summed = jax.lax.reduce_window(
        padded,
        0.0,
        jax.lax.add,
        window_dimensions=(1, window, 1),
        window_strides=(1, 1, 1),
        padding="VALID",
    )
    return summed / window


def unfold_chunks(x: jnp.ndarray, chunk: int, overlap: int) -> jnp.ndarray:
    """Split (B, L, ...) into overlapping windows of ``overlap + chunk + overlap``
    with stride ``chunk`` (the reference's unfold-pad-pack idiom for long
    documents, SURVEY.md §5.7). Returns (B, n_chunks, ext_chunk, ...)."""
    b, l = x.shape[:2]
    ext = chunk + 2 * overlap
    n_chunks = -(-l // chunk)
    pad_len = overlap + n_chunks * chunk + overlap - l
    pad_width = [(0, 0), (overlap, pad_len - overlap)] + [(0, 0)] * (x.ndim - 2)
    padded = jnp.pad(x, pad_width)
    return jnp.stack(
        [jax.lax.slice_in_dim(padded, i * chunk, i * chunk + ext, axis=1) for i in range(n_chunks)],
        axis=1,
    )
