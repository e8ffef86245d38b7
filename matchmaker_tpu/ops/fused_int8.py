"""Int8 whole-layer MLP kernel for the encode path (inference only).

The v5e MXU runs int8×int8→int32 at ~2× its bf16 rate (measured 256 TOP/s vs
130 TF/s on chained XLA dots, benchmarks/int8_matmul_probe.py). The MLP half
is ~57% of an encode layer's FLOPs, so quantizing just its two matmuls has a
theoretical encode ceiling of ~+40%. This kernel is `fused_mlp_block`
(ops/fused_attention.py) with the two dots in int8:

- weights are pre-quantized per OUTPUT channel outside the kernel
  (`quantize_weights_per_col`, symmetric, scale = absmax/127) — inside the
  jitted encode step so the param tree stays f32/bf16 and checkpoints / HF
  import are oblivious;
- activations are quantized per (batch, token) ROW inside the kernel, in
  VMEM (dynamic symmetric absmax — no HBM traffic, the VPU cost is noise
  next to the dots);
- each dot accumulates in int32 and dequantizes with the rank-1 outer
  product of row scales × channel scales;
- biases, gelu (FMA-only poly — exact at int8 re-quantization precision),
  residual and the mlp LayerNorm stay in f32 inside
  the kernel, exactly like the bf16 variant (an XLA reduce over a
  custom-call result hits the slow layout-materialization fusion — the
  reason all norms live in-kernel).

Accuracy: per-row/per-channel symmetric int8 on DistilBERT-class MLPs
measures ≥0.9999 cosine to the f32 reference per layer (see
tests/test_fused_encoder.py::test_int8_mlp_kernel_close); the end-to-end
retrieval cost is measured by the effectiveness harness, not assumed.

Role in the reference: the ONNX-Runtime optimized/quantized inference path
(reference utils/onnx_helper.py, documentation/dense_retrieval_evaluate.md:21
— "ONNX fp16 5,500 psg/s vs PyTorch 3,300"); this is the TPU-native
equivalent one step further down the precision ladder.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# _gelu_poly: FMA-only gelu (1.4e-4 abs) — the int8 path quantizes the gelu
# output to 7 bits right after, so the poly is invisible vs exact erf; the
# fused-kernel probe measured the A&S exp/div as the MLP halves' VPU drag
from matchmaker_tpu.ops.fused_attention import _gelu_poly, _on_tpu
from matchmaker_tpu.ops import vmem_budget


def quantize_weights_per_col(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8 quantization of a (IN, OUT) weight.

    Runs in XLA inside the encode jit — one pass over weights that are read
    every step anyway (DistilBERT MLP: 4.7 MB/matrix), so the cost is noise
    and the stored parameters stay full precision."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=0) / 127.0  # (OUT,)
    scale = jnp.maximum(scale, 1e-12)
    wq = jnp.clip(jnp.round(wf / scale[None, :]), -127, 127).astype(jnp.int8)
    return wq, scale


def _quant_rows(xf: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row (last-axis) symmetric int8 quantization, in VMEM."""
    rs = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    rs = jnp.maximum(rs, 1e-12)
    xq = jnp.clip(jnp.round(xf / rs), -127, 127).astype(jnp.int8)
    return xq, rs


def _mlp_int8_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                     g_ref, be_ref, o_ref, *, ff_chunks, ln_eps):
    # row-packed (Bb·L, H) dots — one full-width MXU op per chunk instead of
    # Bb per-example matmuls (see fused_attention._mlp_kernel; measured 4.7x
    # on the bf16 MLP at doc shapes). Quantization is per-row → unaffected.
    xb = x_ref[...]
    bb, l, hid = xb.shape
    xf = xb.reshape(bb * l, hid).astype(jnp.float32)
    acc = xf + b2_ref[...]
    xq, rs = _quant_rows(xf)
    ff = w1_ref.shape[1]
    ch = ff // ff_chunks
    for c in range(ff_chunks):
        sl = slice(c * ch, (c + 1) * ch)
        hi = jax.lax.dot_general(
            xq, w1_ref[...][:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        h = hi.astype(jnp.float32) * (rs * s1_ref[...][sl]) + b1_ref[...][sl]
        h = _gelu_poly(h)
        hq, hs = _quant_rows(h)
        oi = jax.lax.dot_general(
            hq, w2_ref[...][sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc = acc + oi.astype(jnp.float32) * (hs * s2_ref[...])
    mean = acc.mean(axis=-1, keepdims=True)
    var = ((acc - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (acc - mean) * jax.lax.rsqrt(var + ln_eps)
    o_ref[...] = ((y * g_ref[...] + be_ref[...]).astype(o_ref.dtype)
                  ).reshape(bb, l, hid)


def fused_mlp_int8_block(
    x: jnp.ndarray,  # (B, L, HID)
    w1q, s1, b1,  # (HID, FF) int8, (FF,) f32, (FF,) f32
    w2q, s2, b2,  # (FF, HID) int8, (HID,) f32, (HID,) f32
    ln_scale, ln_bias,  # (HID,) f32
    ln_eps: float = 1e-12,
    block_b: int = 16,
    ff_chunks: int = 4,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """LN(x + W2q·gelu(W1q·x + b1) + b2) with int8 MXU dots — the quantized
    MLP half of a post-norm layer. Same blocking/specs as `fused_mlp_block`;
    forward only (inference encode path)."""
    b, l, hid = x.shape
    if interpret is None:
        interpret = not _on_tpu()
    l_pad = -(-l // 8) * 8
    ff = w1q.shape[1]
    # derive block_b from the per-kernel vmem byte model (round 4 shipped a
    # hand-tuned `l_pad > 128` branch that missed l_pad == 128 and OOMed the
    # scoped vmem at the bench geometry — ops/vmem_budget.py)
    block_b = vmem_budget.fit_block_b(
        lambda bb: vmem_budget.mlp_int8_bytes(
            bb, l_pad, hid, ff, ff_chunks, x.dtype.itemsize),
        block_b)
    if l_pad != l:
        x = jnp.pad(x, ((0, 0), (0, l_pad - l), (0, 0)))
    b_pad = -(-b // block_b) * block_b
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0), (0, 0)))
    kernel = functools.partial(_mlp_int8_kernel, ff_chunks=ff_chunks, ln_eps=ln_eps)
    from jax.experimental.pallas import tpu as pltpu

    out = pl.pallas_call(
        kernel,
        grid=(b_pad // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, l_pad, hid), lambda i: (i, 0, 0)),
            pl.BlockSpec((hid, ff), lambda i: (0, 0)),
            pl.BlockSpec((ff,), lambda i: (0,)),
            pl.BlockSpec((ff,), lambda i: (0,)),
            pl.BlockSpec((ff, hid), lambda i: (0, 0)),
            pl.BlockSpec((hid,), lambda i: (0,)),
            pl.BlockSpec((hid,), lambda i: (0,)),
            pl.BlockSpec((hid,), lambda i: (0,)),
            pl.BlockSpec((hid,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((block_b, l_pad, hid), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b_pad, l_pad, hid), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_budget.VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(x, w1q, s1.astype(jnp.float32), b1.astype(jnp.float32),
      w2q, s2.astype(jnp.float32), b2.astype(jnp.float32),
      ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32))
    return out[:b, :l]


def _attn_int8_kernel(x_ref, wq_ref, sq_ref, wk_ref, sk_ref, wv_ref, sv_ref,
                      wo_ref, so_ref, bq_ref, bk_ref, bv_ref, bo_ref,
                      m_ref, g_ref, b2_ref, o_ref, *,
                      n_heads, head_dim, scale, ln_eps, group_heads):
    """The attention half of a layer (fused_attention._block_kernel) with the
    four projections in int8: x is row-quantized ONCE, each Q/K/V head-group
    projection and the output projection run int8×int8→int32 on the MXU and
    dequantize with rank-1 row×channel scales; the per-head attention itself
    (small (L, L) dots + f32 softmax) stays bf16 — it is ~5% of the half's
    FLOPs and carries the numerics."""
    # row-packed projections on the (Bb·L, H) merge — per-head attention
    # keeps the batched 3D form (see fused_attention._block_kernel)
    xb = x_ref[...]
    bb, l, hid = xb.shape
    xf = xb.reshape(bb * l, hid).astype(jnp.float32)
    neg = (m_ref[...] - 1.0) * 1e9
    acc = xf + bo_ref[...]
    xq, rs = _quant_rows(xf)
    gh = group_heads
    for g in range(n_heads // gh):
        gl = slice(g * gh * head_dim, (g + 1) * gh * head_dim)

        def proj(w_ref, s_ref, b_ref):
            pi = jax.lax.dot_general(
                xq, w_ref[...][:, gl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return ((pi.astype(jnp.float32) * (rs * s_ref[...][gl])
                     + b_ref[...][gl]).astype(xb.dtype)
                    ).reshape(bb, l, gh * head_dim)

        qg = proj(wq_ref, sq_ref, bq_ref)
        kg = proj(wk_ref, sk_ref, bk_ref)
        vg = proj(wv_ref, sv_ref, bv_ref)
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
            # p stays f32 (see fused_attention._block_kernel: the bf16 cast
            # costs more than it saves on these latency-bound dots)
            p = p / p.sum(axis=-1, keepdims=True)
            parts.append(jax.lax.dot_general(
                p, vg[:, :, sl], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ))
        a = jnp.concatenate(parts, axis=-1).reshape(bb * l, gh * head_dim)
        aq, as_ = _quant_rows(a)
        oi = jax.lax.dot_general(
            aq, wo_ref[...][gl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc = acc + oi.astype(jnp.float32) * (as_ * so_ref[...])
    mean = acc.mean(axis=-1, keepdims=True)
    var = ((acc - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (acc - mean) * jax.lax.rsqrt(var + ln_eps)
    o_ref[...] = ((y * g_ref[...] + b2_ref[...]).astype(o_ref.dtype)
                  ).reshape(bb, l, hid)


def fused_attention_int8_block(
    x: jnp.ndarray,  # (B, L, HID)
    wqq, sq, wkq, sk, wvq, sv, woq, so,  # int8 (HID, HID) + f32 (HID,) scales
    bq, bk, bv, bo,  # (HID,) f32
    mask: jnp.ndarray,  # (B, L) key-padding mask
    n_heads: int,
    ln_scale, ln_bias,
    ln_eps: float = 1e-12,
    block_b: int = 8,
    interpret: Optional[bool] = None,
    group_heads: int = 2,
) -> jnp.ndarray:
    """LN(x + OutProj(MHA(QKV-proj(x)))) with int8 projection dots. Same
    blocking as `fused_attention_block`; forward only (inference)."""
    b, l, hid = x.shape
    head_dim = hid // n_heads
    if interpret is None:
        interpret = not _on_tpu()
    l_pad = -(-l // 8) * 8
    block_b = vmem_budget.fit_block_b(
        lambda bb: vmem_budget.attn_int8_bytes(
            bb, l_pad, hid, n_heads, group_heads, x.dtype.itemsize),
        block_b)
    if l_pad != l:
        x = jnp.pad(x, ((0, 0), (0, l_pad - l), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, l_pad - l)), constant_values=0.0)
    b_pad = -(-b // block_b) * block_b
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, b_pad - b), (0, 0)), constant_values=1.0)
    kernel = functools.partial(
        _attn_int8_kernel, n_heads=n_heads, head_dim=head_dim,
        scale=1.0 / (head_dim ** 0.5), ln_eps=ln_eps, group_heads=group_heads,
    )
    from jax.experimental.pallas import tpu as pltpu

    blk3 = pl.BlockSpec((block_b, l_pad, hid), lambda i: (i, 0, 0))
    wspec = pl.BlockSpec((hid, hid), lambda i: (0, 0))
    vspec = pl.BlockSpec((hid,), lambda i: (0,))
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // block_b,),
        in_specs=[blk3,
                  wspec, vspec, wspec, vspec, wspec, vspec, wspec, vspec,
                  vspec, vspec, vspec, vspec,
                  pl.BlockSpec((block_b, l_pad), lambda i: (i, 0)),
                  vspec, vspec],
        out_specs=blk3,
        out_shape=jax.ShapeDtypeStruct((b_pad, l_pad, hid), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_budget.VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(x, wqq, sq.astype(jnp.float32), wkq, sk.astype(jnp.float32),
      wvq, sv.astype(jnp.float32), woq, so.astype(jnp.float32),
      bq.astype(jnp.float32), bk.astype(jnp.float32),
      bv.astype(jnp.float32), bo.astype(jnp.float32),
      mask.astype(jnp.float32),
      ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32))
    return out[:b, :l]


def reference_attention_int8_block(x, wqq, sq, wkq, sk, wvq, sv, woq, so,
                                   bq, bk, bv, bo, mask, n_heads,
                                   ln_scale, ln_bias, ln_eps: float = 1e-12,
                                   group_heads: int = 2):
    """Same quantized math, plain XLA (tests + CPU)."""
    b, l, hid = x.shape
    head_dim = hid // n_heads
    xf = x.astype(jnp.float32)
    neg = (mask.astype(jnp.float32) - 1.0) * 1e9
    acc = xf + bo
    xq, rs = _quant_rows(xf)
    scale = 1.0 / (head_dim ** 0.5)
    for g in range(n_heads // group_heads):
        gl = slice(g * group_heads * head_dim, (g + 1) * group_heads * head_dim)

        def proj(wq_, s_, b_):
            pi = jax.lax.dot_general(xq, wq_[:, gl], (((2,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)
            return (pi.astype(jnp.float32) * (rs * s_[gl]) + b_[gl]).astype(x.dtype)

        qg, kg, vg = proj(wqq, sq, bq), proj(wkq, sk, bk), proj(wvq, sv, bv)
        parts = []
        for h in range(group_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            s = jax.lax.dot_general(
                qg[:, :, sl], kg[:, :, sl], (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale
            s = s + neg[:, None, :]
            s = s - s.max(axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / p.sum(axis=-1, keepdims=True)  # f32 into the attend dot
            parts.append(jax.lax.dot_general(
                p, vg[:, :, sl], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ))
        a = jnp.concatenate(parts, axis=-1)
        aq, as_ = _quant_rows(a)
        oi = jax.lax.dot_general(aq, woq[gl, :], (((2,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        acc = acc + oi.astype(jnp.float32) * (as_ * so)
    mean = acc.mean(axis=-1, keepdims=True)
    var = ((acc - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (acc - mean) * jax.lax.rsqrt(var + ln_eps)
    return (y * ln_scale + ln_bias).astype(x.dtype)


def reference_mlp_int8_block(x, w1q, s1, b1, w2q, s2, b2, ln_scale, ln_bias,
                             ln_eps: float = 1e-12, ff_chunks: int = 4):
    """Same quantized math, plain XLA (tests + CPU). Matches the kernel's
    per-(row, FF-chunk) activation scales — the chunked second quantization
    is slightly FINER-grained than a whole-row scale would be."""
    xf = x.astype(jnp.float32)
    xq, rs = _quant_rows(xf)
    ff = w1q.shape[1]
    ch = ff // ff_chunks
    acc = xf + b2
    for c in range(ff_chunks):
        sl = slice(c * ch, (c + 1) * ch)
        hi = jax.lax.dot_general(xq, w1q[:, sl], (((2,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        h = hi.astype(jnp.float32) * (rs * s1[None, None, sl]) + b1[sl]
        h = _gelu_poly(h)
        hq, hs = _quant_rows(h)
        oi = jax.lax.dot_general(hq, w2q[sl, :], (((2,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        acc = acc + oi.astype(jnp.float32) * (hs * s2[None, None, :])
    mean = acc.mean(axis=-1, keepdims=True)
    var = ((acc - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (acc - mean) * jax.lax.rsqrt(var + ln_eps)
    return (y * ln_scale + ln_bias).astype(x.dtype)
