"""Fused multi-head self-attention for the encode path (seq ≤ 128).

Why a hand kernel wins HERE when the generic flash-attention libraries
don't (measured, benchmarks/attention_ab.py): at DistilBERT encode shapes
(B=1024, H=12, L=128, D=64) XLA's attention spends ~5.3 ms/layer, dominated
not by FLOPs (the matmul floor is ~1.5 ms for all 6 layers) but by HBM
round-trips of the (B, H, L, L) logits tensor (805 MB in f32) plus the
(B, L, H·D) ⇄ (B, H, L, D) head transposes (3×201 MB each way). The
jax.experimental TPU flash kernel is *slower* than XLA at L=128 (7.7 vs
4.6 ms — its streaming machinery is sized for long sequences).

This kernel exploits the short-sequence regime instead of streaming:

- consumes Q/K/V in the layout the QKV projections PRODUCE — (B, L, H·D) —
  so the head split happens on VMEM loads (lane slices), never as an HBM
  transpose;
- one grid cell processes a block of batch rows for ALL heads: per head, a
  batched (Bb, L, D)·(Bb, L, D) → (Bb, L, L) MXU matmul, f32 softmax
  in-register, and the (Bb, L, L)·(Bb, L, D) value matmul;
- logits never exist in HBM; the only HBM traffic is reading Q/K/V once
  and writing the output once (the roofline floor);
- the key-padding mask folds into the logits as an additive -1e9 before
  the softmax (identical math to the XLA path's boolean mask).

Training still uses flax attention (this kernel has no backward pass);
the encoder flips to it via ``EncoderConfig.fused_attention`` on the
inference/encode path, mirroring ``norms_in_compute_dtype``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from matchmaker_tpu.ops import vmem_budget


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, n_heads, head_dim, scale):
    q = q_ref[...]  # (Bb, L, H*D) bf16
    k = k_ref[...]
    v = v_ref[...]
    neg = (mask_ref[...] - 1.0) * 1e9  # (Bb, L): 0 for real keys, -1e9 pad
    for h in range(n_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh, kh, vh = q[:, :, sl], k[:, :, sl], v[:, :, sl]
        # (Bb, L, D) x (Bb, L, D) -> (Bb, L, L) batched MXU matmul
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        s = s + neg[:, None, :]
        s = s - s.max(axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / p.sum(axis=-1, keepdims=True)
        # (Bb, L, L) x (Bb, L, D) -> (Bb, L, D), stored straight into the
        # head's output lanes — accumulating all heads then concatenating
        # holds 12 f32 temporaries live and exhausts VMEM
        o_ref[:, :, sl] = jax.lax.dot_general(
            p.astype(v.dtype), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def fused_mha(
    q: jnp.ndarray,  # (B, L, H*D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray,  # (B, L) 1.0 = real token, 0.0 = padding (key mask)
    n_heads: int,
    block_b: int = 8,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Multi-head self-attention, (B, L, H·D) in and out. Forward only."""
    b, l, hd = q.shape
    head_dim = hd // n_heads
    if interpret is None:
        interpret = not _on_tpu()
    l_pad = -(-l // 8) * 8  # Mosaic sublane rule on the (L, H·D) block dims
    if l_pad != l:
        pad = ((0, 0), (0, l_pad - l), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        # padded keys masked out; padded query rows are sliced off below
        mask = jnp.pad(mask, ((0, 0), (0, l_pad - l)), constant_values=0.0)
    b_pad = -(-b // block_b) * block_b
    if b_pad != b:
        pad = ((0, b_pad - b), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        mask = jnp.pad(mask, ((0, b_pad - b), (0, 0)), constant_values=1.0)
    out_l = l
    l = l_pad
    kernel = functools.partial(
        _attn_kernel, n_heads=n_heads, head_dim=head_dim,
        scale=1.0 / (head_dim ** 0.5),
    )
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, l, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_b, l, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_b, l, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_b, l), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_b, l, hd), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b_pad, l, hd), q.dtype),
        interpret=interpret,
    )(q, k, v, mask.astype(jnp.float32))
    return out[:b, :out_l]


def mha_reference(q, k, v, mask, n_heads):
    """Plain-XLA reference with identical math (tests + backward path)."""
    b, l, hd = q.shape
    d = hd // n_heads
    def split(x):
        return x.reshape(b, l, n_heads, d).transpose(0, 2, 1, 3)
    qh, kh, vh = split(q), split(k), split(v)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / (d ** 0.5)
    s = s.astype(jnp.float32) + ((mask - 1.0) * 1e9)[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
    return o.transpose(0, 2, 1, 3).reshape(b, l, hd)


def fused_attention_fn(
    query, key, value, bias=None, mask=None, broadcast_dropout=True,
    dropout_rng=None, dropout_rate=0.0, deterministic=False, dtype=None,
    precision=None, module=None, **_,
):
    """Drop-in ``attention_fn`` for ``nn.MultiHeadDotProductAttention``.

    Receives projected (B, L, H, D) tensors from flax (param structure,
    checkpoints, and HF import stay untouched) and runs the fused kernel.
    Falls back to flax's reference attention when dropout is active (the
    kernel is forward-only) or when given a non-key-padding mask."""
    import flax.linen as nn

    b, l, h, d = query.shape
    key_padding = mask is not None and mask.ndim == 4 and mask.shape[1:3] == (1, 1)
    if (dropout_rate > 0.0 and not deterministic) or (mask is not None and not key_padding):
        return nn.dot_product_attention(
            query, key, value, bias=bias, mask=mask,
            broadcast_dropout=broadcast_dropout, dropout_rng=dropout_rng,
            dropout_rate=dropout_rate, deterministic=deterministic,
            dtype=dtype, precision=precision,
        )
    km = (
        jnp.ones((b, l), jnp.float32)
        if mask is None
        else mask[:, 0, 0, :].astype(jnp.float32)
    )
    out = fused_mha(
        query.reshape(b, l, h * d),
        key.reshape(b, l, h * d),
        value.reshape(b, l, h * d),
        km, h,
    )
    return out.reshape(b, l, h, d)


# ---- whole-attention-block kernel -----------------------------------------
# Fusing ONLY the attention inner op loses in-model (the pallas_call breaks
# XLA's fusion of the QKV projections into their consumers — measured 0.94x
# end-to-end despite the 2.3x isolated win). The block kernel absorbs the
# projections themselves: per grid cell it runs the Q/K/V projections as
# 2-head groups (128-lane MXU outputs), the per-head attention with f32
# softmax, and the output projection accumulated group-by-group onto the
# residual — x is read once, the output written once, and neither Q/K/V nor
# the logits ever exist in HBM. Measured 1.83x the XLA attention block at
# (B=1024, L=128, H=12, D=64).

_GROUP_HEADS = 2  # heads per projection group: 2·64 = full 128-lane width


def _block_kernel(x_ref, wq_ref, wk_ref, wv_ref, wo_ref, bq_ref, bk_ref,
                  bv_ref, bo_ref, m_ref, g_ref, b2_ref, o_ref, *refs,
                  n_heads, head_dim, scale, ln_eps):
    # *refs: optional acc_ref output (training forward saves the pre-LN
    # residual sum so the backward kernel skips its recompute pass)
    # ROW-PACKED projections: all four (H, H)-weight matmuls run on the
    # (Bb·L, H) row merge — one full-width MXU op each instead of Bb
    # per-example (L, H) matmuls (see _mlp_kernel; measured 4.7x on the MLP
    # half). Only the per-head score/attend dots keep the (Bb, L, ...)
    # batched form — they are genuinely per-example.
    xb = x_ref[...]  # (Bb, L, HID) bf16
    bb, l, hid = xb.shape
    x2 = xb.reshape(bb * l, hid)
    neg = (m_ref[...] - 1.0) * 1e9
    acc = x2.astype(jnp.float32) + bo_ref[...]  # residual + out-proj bias
    gh = _GROUP_HEADS
    for g in range(n_heads // gh):
        gl = slice(g * gh * head_dim, (g + 1) * gh * head_dim)
        proj = lambda w_ref, b_ref: (
            jax.lax.dot_general(
                x2, w_ref[...][:, gl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b_ref[...][gl]
        ).astype(xb.dtype).reshape(bb, l, gh * head_dim)
        qg, kg, vg = proj(wq_ref, bq_ref), proj(wk_ref, bk_ref), proj(wv_ref, bv_ref)
        parts = []
        for h in range(gh):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            s = jax.lax.dot_general(
                qg[:, :, sl], kg[:, :, sl], (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale
            s = s + neg[:, None, :]
            s = s - s.max(axis=-1, keepdims=True)
            p = jnp.exp(s)
            # p stays f32 into the attend dot: the f32→bf16 cast of the
            # (Bb, L, L) probs costs MORE than the bf16 dot saves on these
            # latency-bound small dots (attn_inner_probe: 2.10 → 1.73 ms)
            p = p / p.sum(axis=-1, keepdims=True)
            parts.append(jax.lax.dot_general(
                p, vg[:, :, sl], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(xb.dtype))
        a = jnp.concatenate(parts, axis=-1).reshape(bb * l, gh * head_dim)
        acc = acc + jax.lax.dot_general(
            a, wo_ref[...][gl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if refs:
        refs[0][...] = acc.astype(refs[0].dtype).reshape(bb, l, hid)
    # post-attention LayerNorm fused in: XLA lowers a reduce+convert that
    # consumes a custom-call RESULT through its slow layout-materialization
    # path (measured 10.75 ms/layer for a 0.5 ms LayerNorm — the whole
    # kernel win eaten); in-VMEM the statistics are one lane-reduction
    mean = acc.mean(axis=-1, keepdims=True)
    var = ((acc - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (acc - mean) * jax.lax.rsqrt(var + ln_eps)
    o_ref[...] = ((y * g_ref[...] + b2_ref[...]).astype(o_ref.dtype)
                  ).reshape(bb, l, hid)


def fused_attention_block(
    x: jnp.ndarray,  # (B, L, HID)
    wq, wk, wv,  # (HID, HID)
    wo,  # (HID, HID)
    bq, bk, bv, bo,  # (HID,) f32
    mask: jnp.ndarray,  # (B, L) key-padding mask
    n_heads: int,
    ln_scale, ln_bias,  # (HID,) f32 — the post-attention LayerNorm params
    ln_eps: float = 1e-12,
    block_b: int = 8,
    interpret: Optional[bool] = None,
    save_acc: bool = False,
) -> jnp.ndarray:
    """LN(x + OutProj(MHA(QKV-proj(x)))) in one kernel — the whole attention
    half of a post-norm transformer layer.

    ``save_acc`` additionally returns the pre-LN residual sum in bf16 — the
    training forward's residual for the custom-VJP backward kernel
    (ops/fused_backward.py), which then skips its acc-recompute pass."""
    b, l, hid = x.shape
    head_dim = hid // n_heads
    if interpret is None:
        interpret = not _on_tpu()
    l_pad = -(-l // 8) * 8
    block_b = vmem_budget.fit_block_b(
        lambda bb: vmem_budget.attn_bf16_bytes(
            bb, l_pad, hid, n_heads, _GROUP_HEADS, x.dtype.itemsize, save_acc),
        block_b)
    if l_pad != l:
        x = jnp.pad(x, ((0, 0), (0, l_pad - l), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, l_pad - l)), constant_values=0.0)
    b_pad = -(-b // block_b) * block_b
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, b_pad - b), (0, 0)), constant_values=1.0)
    kernel = functools.partial(
        _block_kernel, n_heads=n_heads, head_dim=head_dim,
        scale=1.0 / (head_dim ** 0.5), ln_eps=ln_eps,
    )
    from jax.experimental.pallas import tpu as pltpu

    blk3 = pl.BlockSpec((block_b, l_pad, hid), lambda i: (i, 0, 0))
    out_specs = [blk3, blk3] if save_acc else blk3
    out_shape = jax.ShapeDtypeStruct((b_pad, l_pad, hid), x.dtype)
    if save_acc:
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((b_pad, l_pad, hid), x.dtype)]
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // block_b,),
        in_specs=[blk3]
        + [pl.BlockSpec((hid, hid), lambda i: (0, 0))] * 4
        + [pl.BlockSpec((hid,), lambda i: (0,))] * 4
        + [pl.BlockSpec((block_b, l_pad), lambda i: (i, 0))]
        + [pl.BlockSpec((hid,), lambda i: (0,))] * 2,
        out_specs=out_specs,
        out_shape=out_shape,
        # the weights (4.5 MB) + pipeline buffers sit just past the default
        # 16 MB scoped-vmem line (16.62 MB at DistilBERT size)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_budget.VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(x, wq, wk, wv, wo, bq, bk, bv, bo, mask.astype(jnp.float32),
      ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32))
    if save_acc:
        return out[0][:b, :l], out[1][:b, :l]
    return out[:b, :l]


def reference_attention_block(x, wq, wk, wv, wo, bq, bk, bv, bo, mask, n_heads,
                              ln_scale, ln_bias, ln_eps: float = 1e-12):
    """Same math, plain XLA (tests, CPU, and the non-deterministic path)."""
    out = mha_reference(
        (x @ wq.astype(x.dtype) + bq).astype(x.dtype),
        (x @ wk.astype(x.dtype) + bk).astype(x.dtype),
        (x @ wv.astype(x.dtype) + bv).astype(x.dtype),
        mask, n_heads,
    )
    acc = x.astype(jnp.float32) + out.astype(jnp.float32) @ wo.astype(jnp.float32) + bo
    mean = acc.mean(axis=-1, keepdims=True)
    var = ((acc - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (acc - mean) * jax.lax.rsqrt(var + ln_eps)
    return (y * ln_scale + ln_bias).astype(x.dtype)


# ---- fused MLP half -------------------------------------------------------


def _erf_poly(z):
    """Abramowitz-Stegun 7.1.26 erf (max abs err 1.5e-7 — far below bf16
    noise). Mosaic has no erf primitive; exp it has."""
    p = 0.3275911
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    s = jnp.sign(z)
    az = jnp.abs(z)
    t = 1.0 / (1.0 + p * az)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-az * az))


def _gelu_exact(h):
    return 0.5 * h * (1.0 + _erf_poly(h * 0.7071067811865476))


# Weighted-lstsq odd polynomial for erf(u) = u·P(u²) on |u| ≤ 3.4 (clamped;
# erf(3.4) = 1 − 1.6e-6), fitted with |u|-weighting so the error lands where
# gelu(z) = 0.5z(1+erf(z/√2)) divides it back out: max |gelu| error 1.4e-4
# over ℝ in f32 Horner arithmetic — ~30x below one bf16 ulp at |gelu| = 1.
# Unlike A&S 7.1.26 it needs NO exp and NO division (pure FMA chain), which
# the fused-kernel probe (benchmarks/fused_kernel_probe.py) measured as the
# dominant VPU cost of the MLP halves (gelu stub: fwd 4.33→3.90 ms,
# bwd 9.33→8.33 ms per 256×200-row layer call).
_ERF_FASTPOLY = (1.1268175, -0.37025923, 0.10513879, -0.021726243,
                 0.0031725222, -0.00031579041, 2.0221069e-05,
                 -7.4665718e-07, 1.2036946e-08)  # scaled: f32 Horner at the
# clamp evaluates to 1.0 ± 5e-6, so gelu(|z|≫3.4·√2) leaks < 5e-6·|z|


def _erf_fastpoly(u):
    uc = jnp.clip(u, -3.4, 3.4)
    v = uc * uc
    p = jnp.full_like(v, _ERF_FASTPOLY[-1])
    for c in _ERF_FASTPOLY[-2::-1]:
        p = p * v + c
    return p * uc


def _gelu_poly(h):
    """gelu to 1.4e-4 abs — exact at bf16 output precision, exp/div-free."""
    return 0.5 * h * (1.0 + _erf_fastpoly(h * 0.7071067811865476))


def _gelu_for(dtype):
    """bf16 outputs get the FMA-only poly (error invisible under bf16
    rounding); f32 paths (tests, interpret mode) keep the 1.5e-7 A&S form."""
    return _gelu_poly if dtype == jnp.bfloat16 else _gelu_exact


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, be_ref, o_ref,
                *refs, ff_chunks, ln_eps):
    # *refs: optional acc_ref output (training forward residual, see
    # _block_kernel)
    #
    # ROW-PACKED dots: the (Bb, L, H) block is merged to (Bb·L, H) so every
    # matmul runs as ONE (rows, H)x(H, ch) MXU op instead of Bb per-example
    # (L, H) matmuls — a 30-row query matmul fills 25% of an MXU row-wave;
    # packed rows fill it. Measured (benchmarks/mlp_rows_probe.py, v5e):
    # 4.7x at (256, 200, 768), parity bit-exact. The leading-dim merge is a
    # free relayout (lane dim intact, sublane-major contiguous).
    xb = x_ref[...]
    bb, l, hid = xb.shape
    x2 = xb.reshape(bb * l, hid)
    gelu = _gelu_for(xb.dtype)
    acc = x2.astype(jnp.float32) + b2_ref[...]
    ff = w1_ref.shape[1]
    ch = ff // ff_chunks
    for c in range(ff_chunks):
        sl = slice(c * ch, (c + 1) * ch)
        h = jax.lax.dot_general(
            x2, w1_ref[...][:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[...][sl]
        h = gelu(h).astype(xb.dtype)
        acc = acc + jax.lax.dot_general(
            h, w2_ref[...][sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if refs:
        refs[0][...] = acc.astype(refs[0].dtype).reshape(bb, l, hid)
    mean = acc.mean(axis=-1, keepdims=True)
    var = ((acc - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (acc - mean) * jax.lax.rsqrt(var + ln_eps)
    o_ref[...] = ((y * g_ref[...] + be_ref[...]).astype(o_ref.dtype)
                  ).reshape(bb, l, hid)


def fused_mlp_block(
    x: jnp.ndarray,  # (B, L, HID)
    w1, b1, w2, b2,  # (HID, FF) bf16, (FF,) f32, (FF, HID) bf16, (HID,) f32
    ln_scale, ln_bias,  # (HID,) f32
    ln_eps: float = 1e-12,
    block_b: int = 16,
    ff_chunks: int = 4,
    interpret: Optional[bool] = None,
    save_acc: bool = False,
) -> jnp.ndarray:
    """LN(x + W2·gelu(W1·x + b1) + b2) in one kernel — the MLP half of a
    post-norm layer. The (B, L, FF) intermediate never exists in HBM (it is
    chunked over FF and consumed immediately); exact-erf gelu via
    polynomial. Forward only."""
    b, l, hid = x.shape
    if interpret is None:
        interpret = not _on_tpu()
    l_pad = -(-l // 8) * 8
    ff = w1.shape[1]
    # block_b derived from the kernel's vmem byte model: block_b=16 at encode
    # shapes (L<=128), halved for longer sequences (training docs run L=200)
    # so the per-chunk f32 intermediate stays inside the scoped-vmem budget
    block_b = vmem_budget.fit_block_b(
        lambda bb: vmem_budget.mlp_bf16_bytes(
            bb, l_pad, hid, ff, ff_chunks, x.dtype.itemsize, save_acc),
        block_b)
    if l_pad != l:
        x = jnp.pad(x, ((0, 0), (0, l_pad - l), (0, 0)))
    b_pad = -(-b // block_b) * block_b
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0), (0, 0)))
    kernel = functools.partial(_mlp_kernel, ff_chunks=ff_chunks, ln_eps=ln_eps)
    from jax.experimental.pallas import tpu as pltpu

    out = pl.pallas_call(
        kernel,
        grid=(b_pad // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, l_pad, hid), lambda i: (i, 0, 0)),
            pl.BlockSpec((hid, ff), lambda i: (0, 0)),
            pl.BlockSpec((ff,), lambda i: (0,)),
            pl.BlockSpec((ff, hid), lambda i: (0, 0)),
            pl.BlockSpec((hid,), lambda i: (0,)),
            pl.BlockSpec((hid,), lambda i: (0,)),
            pl.BlockSpec((hid,), lambda i: (0,)),
        ],
        out_specs=[pl.BlockSpec((block_b, l_pad, hid), lambda i: (i, 0, 0))] * 2
        if save_acc else pl.BlockSpec((block_b, l_pad, hid), lambda i: (i, 0, 0)),
        out_shape=[jax.ShapeDtypeStruct((b_pad, l_pad, hid), x.dtype)] * 2
        if save_acc else jax.ShapeDtypeStruct((b_pad, l_pad, hid), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_budget.VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(x, w1, b1.astype(jnp.float32), w2, b2.astype(jnp.float32),
      ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32))
    if save_acc:
        return out[0][:b, :l], out[1][:b, :l]
    return out[:b, :l]


def reference_mlp_block(x, w1, b1, w2, b2, ln_scale, ln_bias, ln_eps: float = 1e-12):
    """Same math, plain XLA (tests + non-deterministic path)."""
    h = jax.lax.dot_general(
        x, w1.astype(x.dtype), (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1
    h = jax.nn.gelu(h, approximate=False).astype(x.dtype)
    acc = x.astype(jnp.float32) + jax.lax.dot_general(
        h, w2.astype(x.dtype), (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2
    mean = acc.mean(axis=-1, keepdims=True)
    var = ((acc - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (acc - mean) * jax.lax.rsqrt(var + ln_eps)
    return (y * ln_scale + ln_bias).astype(x.dtype)
