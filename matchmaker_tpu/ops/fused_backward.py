"""Training-capable fused transformer-layer kernels (custom VJP).

Round-3 forward kernels (ops/fused_attention.py) made the ENCODE path 26%
faster by keeping logits / the FF intermediate / the LayerNorms inside VMEM.
This module extends both whole-layer kernels to TRAINING: each block gets a
``jax.custom_vjp`` whose forward is the existing Pallas kernel and whose
backward is ONE Pallas kernel that recomputes the layer's intermediates from
the block input (flash-style) and emits every gradient — dx plus all weight
grads — without any (B, L, L) logits or (B, L, FF) intermediate ever touching
HBM in either direction.

Why recompute instead of saving residuals: the lesson of the forward work is
that these layers are HBM-bound, not FLOP-bound, at ranking shapes
(L ≤ 200). Saving softmax probs / the FF intermediate for the backward would
write exactly the tensors the forward kernel exists to avoid (245 MB/layer of
logits at B=128, L=200). Recomputing them costs ~1 extra forward of MXU time,
which the saved HBM round-trips more than repay — the same trade
flash-attention's backward makes.

Weight gradients are accumulated across the (sequential on TPU) batch-block
grid into f32 output blocks that map to the same block index every step, the
standard Mosaic revisit-accumulate pattern: zero-init at program_id 0, += on
every step, written back once at the end.

Training semantics note: like the existing fused-path training fallback
(models/encoder.py FusedMHABlock), dropout inside the layer is a no-op when
``encoder_fused_attention`` is on — the reference's AMP training keeps
dropout (train.py:251), so fused training is an opt-in speed/regularization
trade, documented in docs/tpu_design.md.

Replaces: the reference's torch autograd over HF transformer layers
(reference train.py:319-543 hot loop; models/bert_dot.py:28-40).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from matchmaker_tpu.ops.fused_attention import (
    _GROUP_HEADS,
    _erf_fastpoly,
    _erf_poly,
    _gelu_exact,
    _gelu_for,
    _on_tpu,
    fused_attention_block,
    fused_mlp_block,
    reference_attention_block,
    reference_mlp_block,
)

_INV_SQRT_2PI = 0.3989422804014327

# Test hook: when True, the custom-vjp backward runs the Pallas kernels even
# off-TPU (interpret mode) so CPU tests exercise the kernel math; by default
# off-TPU backward uses autodiff of the reference blocks (fast on CPU).
FORCE_PALLAS_BWD = False


def _use_pallas_bwd() -> bool:
    return _on_tpu() or FORCE_PALLAS_BWD


def _gelu_grad(z):
    """d/dz [ 0.5·z·(1+erf(z/√2)) ] = Φ(z) + z·φ(z)."""
    cdf = 0.5 * (1.0 + _erf_poly(z * 0.7071067811865476))
    pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * z * z)
    return cdf + z * pdf


def _gelu_grad_poly(z):
    """Φ via the FMA-only erf poly (bf16-exact); one exp remains for φ —
    A&S needs two exps plus a division here."""
    cdf = 0.5 * (1.0 + _erf_fastpoly(z * 0.7071067811865476))
    pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * z * z)
    return cdf + z * pdf


def _gelu_grad_for(dtype):
    return _gelu_grad_poly if dtype == jnp.bfloat16 else _gelu_grad


def _wgrad(a, b):
    """(Bb, L, M)·(Bb, L, N) → (M, N) contracting batch AND length.

    Mosaic's matmul lowering only supports a single contracting dim, so the
    leading dims are merged first (lane dim untouched — a free relayout)."""
    a2 = a.reshape(-1, a.shape[-1])
    b2 = b.reshape(-1, b.shape[-1])
    return jax.lax.dot_general(
        a2, b2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _ln_backward(acc, dy, g, ln_eps):
    """Backward of y = LN(acc)·g + b: returns (dacc, dg_partial, dbe_partial).

    acc/dy: (..., H) f32 — rows in any leading shape ((Bb, L, H) or the
    row-packed (Bb·L, H)). Partial sums are this block's contribution to the
    (H,) param grads; the caller accumulates across grid steps.
    """
    lead = tuple(range(acc.ndim - 1))
    mean = acc.mean(axis=-1, keepdims=True)
    var = ((acc - mean) ** 2).mean(axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + ln_eps)
    yhat = (acc - mean) * rstd
    dg = (dy * yhat).sum(axis=lead)
    dbe = dy.sum(axis=lead)
    dyh = dy * g
    m1 = dyh.mean(axis=-1, keepdims=True)
    m2 = (dyh * yhat).mean(axis=-1, keepdims=True)
    dacc = rstd * (dyh - m1 - yhat * m2)
    return dacc, dg, dbe


# ---- MLP half: backward kernel -------------------------------------------


def _mlp_bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, dy_ref,
                    acc_ref, dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                    dg_ref, dbe_ref, *, ff_chunks, ln_eps):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dg_ref[...] = jnp.zeros_like(dg_ref)
        dbe_ref[...] = jnp.zeros_like(dbe_ref)

    # row-packed (Bb·L, H) operands: every dot is one full-width MXU op
    # (see fused_attention._mlp_kernel — measured 4.7x at doc shapes)
    xb3 = x_ref[...]  # (Bb, L, H) bf16
    bb, l, hid = xb3.shape
    xb = xb3.reshape(bb * l, hid)
    gelu = _gelu_for(xb.dtype)
    gelu_grad = _gelu_grad_for(xb.dtype)
    dy = dy_ref[...].astype(jnp.float32).reshape(bb * l, hid)
    ff = w1_ref.shape[1]
    ch = ff // ff_chunks

    def z_chunk(sl):
        # pre-gelu chunk, recomputed (one MXU matmul per chunk — cheaper than
        # an f32 (Bb·L, FF) VMEM scratch or an HBM round-trip of it)
        return jax.lax.dot_general(
            xb, w1_ref[...][:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[...][sl]

    # acc saved by the training forward (save_acc) — no recompute pass
    acc = acc_ref[...].astype(jnp.float32).reshape(bb * l, hid)
    dacc, dg, dbe = _ln_backward(acc, dy, g_ref[...], ln_eps)
    dg_ref[...] += dg
    dbe_ref[...] += dbe
    db2_ref[...] += dacc.sum(axis=0)
    dacc_lp = dacc.astype(xb.dtype)
    dx = dacc  # residual path, f32
    # pass 2: per-chunk weight grads + dx
    for c in range(ff_chunks):
        sl = slice(c * ch, (c + 1) * ch)
        z = z_chunk(sl)
        hc = gelu(z).astype(xb.dtype)
        # dW2_c: (ch, H) — contract all rows
        dw2_ref[sl, :] += _wgrad(hc, dacc_lp)
        dh = jax.lax.dot_general(
            dacc_lp, w2_ref[...][sl, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dz = (dh * gelu_grad(z)).astype(xb.dtype)
        dw1_ref[:, sl] += _wgrad(xb, dz)
        db1_ref[sl] += dz.astype(jnp.float32).sum(axis=0)
        dx = dx + jax.lax.dot_general(
            dz, w1_ref[...][:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dx_ref[...] = dx.astype(dx_ref.dtype).reshape(bb, l, hid)


def _mlp_block_bwd_pallas(x, w1, b1, w2, b2, g, dy, acc, ln_eps, block_b,
                          ff_chunks, interpret):
    b, l, hid = x.shape
    ff = w1.shape[1]
    l_pad = -(-l // 8) * 8
    if l_pad != l:
        x = jnp.pad(x, ((0, 0), (0, l_pad - l), (0, 0)))
        dy = jnp.pad(dy, ((0, 0), (0, l_pad - l), (0, 0)))
        acc = jnp.pad(acc, ((0, 0), (0, l_pad - l), (0, 0)))
    b_pad = -(-b // block_b) * block_b
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0), (0, 0)))
        dy = jnp.pad(dy, ((0, b_pad - b), (0, 0), (0, 0)))
        acc = jnp.pad(acc, ((0, b_pad - b), (0, 0), (0, 0)))
    kernel = functools.partial(_mlp_bwd_kernel, ff_chunks=ff_chunks, ln_eps=ln_eps)
    from jax.experimental.pallas import tpu as pltpu

    acc_spec = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    outs = pl.pallas_call(
        kernel,
        grid=(b_pad // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, l_pad, hid), lambda i: (i, 0, 0)),
            pl.BlockSpec((hid, ff), lambda i: (0, 0)),
            pl.BlockSpec((ff,), lambda i: (0,)),
            pl.BlockSpec((ff, hid), lambda i: (0, 0)),
            pl.BlockSpec((hid,), lambda i: (0,)),
            pl.BlockSpec((hid,), lambda i: (0,)),
            pl.BlockSpec((block_b, l_pad, hid), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_b, l_pad, hid), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_b, l_pad, hid), lambda i: (i, 0, 0)),
            acc_spec((hid, ff)), acc_spec((ff,)),
            acc_spec((ff, hid)), acc_spec((hid,)),
            acc_spec((hid,)), acc_spec((hid,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, l_pad, hid), x.dtype),
            jax.ShapeDtypeStruct((hid, ff), jnp.float32),
            jax.ShapeDtypeStruct((ff,), jnp.float32),
            jax.ShapeDtypeStruct((ff, hid), jnp.float32),
            jax.ShapeDtypeStruct((hid,), jnp.float32),
            jax.ShapeDtypeStruct((hid,), jnp.float32),
            jax.ShapeDtypeStruct((hid,), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, w1, b1.astype(jnp.float32), w2, b2.astype(jnp.float32),
      g.astype(jnp.float32), dy, acc)
    dx, dw1, db1, dw2, db2, dg, dbe = outs
    return dx[:b, :l], dw1, db1, dw2, db2, dg, dbe


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_mlp_block_train(x, w1, b1, w2, b2, ln_scale, ln_bias,
                          ln_eps=1e-12, block_b=8, ff_chunks=4):
    """Differentiable LN(x + W2·gelu(W1·x + b1) + b2): Pallas fwd AND bwd."""
    return fused_mlp_block(x, w1, b1, w2, b2, ln_scale, ln_bias,
                           ln_eps=ln_eps, block_b=block_b, ff_chunks=ff_chunks)


def _mlp_train_fwd(x, w1, b1, w2, b2, ln_scale, ln_bias, ln_eps, block_b, ff_chunks):
    if _use_pallas_bwd():
        # forward additionally emits the pre-LN residual sum; the backward
        # kernel then needs no acc-recompute pass
        out, acc = fused_mlp_block(x, w1, b1, w2, b2, ln_scale, ln_bias,
                                   ln_eps=ln_eps, block_b=block_b,
                                   ff_chunks=ff_chunks, save_acc=True)
    else:
        out = fused_mlp_block(x, w1, b1, w2, b2, ln_scale, ln_bias,
                              ln_eps=ln_eps, block_b=block_b,
                              ff_chunks=ff_chunks)
        acc = None
    return out, (x, w1, b1, w2, b2, ln_scale, acc)


def _mlp_train_bwd(ln_eps, block_b, ff_chunks, res, dy):
    x, w1, b1, w2, b2, ln_scale, acc = res
    if _use_pallas_bwd() and acc is not None:
        dx, dw1, db1, dw2, db2, dg, dbe = _mlp_block_bwd_pallas(
            x, w1, b1, w2, b2, ln_scale, dy.astype(x.dtype), acc, ln_eps,
            block_b, ff_chunks, interpret=not _on_tpu())
    else:
        # off-TPU: autodiff of the reference math (tests/CPU)
        def ref(x_, w1_, b1_, w2_, b2_, g_, be_):
            return reference_mlp_block(x_, w1_, b1_, w2_, b2_, g_, be_, ln_eps)

        be0 = jnp.zeros_like(ln_scale)
        _, vjp = jax.vjp(ref, x, w1, b1, w2, b2, ln_scale, be0)
        dx, dw1, db1, dw2, db2, dg, dbe = vjp(dy)
    return (dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype),
            dg.astype(ln_scale.dtype), dbe.astype(ln_scale.dtype))


fused_mlp_block_train.defvjp(_mlp_train_fwd, _mlp_train_bwd)


# ---- attention half: backward kernel -------------------------------------


def _attn_bwd_kernel(x_ref, wq_ref, wk_ref, wv_ref, wo_ref, bq_ref, bk_ref,
                     bv_ref, bo_ref, m_ref, g_ref, dy_ref, acc_ref,
                     dx_ref, dwq_ref, dwk_ref, dwv_ref, dwo_ref, dbq_ref,
                     dbk_ref, dbv_ref, dbo_ref, dg_ref, dbe_ref,
                     *, n_heads, head_dim, scale, ln_eps):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        for ref in (dwq_ref, dwk_ref, dwv_ref, dwo_ref, dbq_ref, dbk_ref,
                    dbv_ref, dbo_ref, dg_ref, dbe_ref):
            ref[...] = jnp.zeros_like(ref)

    # row-packed (Bb·L, H) operands for every projection-sized dot; only the
    # per-head score/attend dots keep the batched 3D form (see
    # fused_attention._block_kernel)
    xb = x_ref[...]  # (Bb, L, HID) bf16
    bb, l, hid = xb.shape
    x2 = xb.reshape(bb * l, hid)
    dy = dy_ref[...].astype(jnp.float32).reshape(bb * l, hid)
    neg = (m_ref[...] - 1.0) * 1e9
    gh = _GROUP_HEADS

    def proj(w_ref, b_ref, gl):
        return ((jax.lax.dot_general(
            x2, w_ref[...][:, gl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref[...][gl]).astype(xb.dtype)
        ).reshape(bb, l, gh * head_dim)

    # acc saved by the training forward (save_acc) — no recompute pass
    acc = acc_ref[...].astype(jnp.float32).reshape(bb * l, hid)
    dacc, dg, dbe = _ln_backward(acc, dy, g_ref[...], ln_eps)
    dg_ref[...] += dg
    dbe_ref[...] += dbe
    dbo_ref[...] += dacc.sum(axis=0)
    dacc_lp = dacc.astype(xb.dtype)  # (Bb·L, H)
    dx = dacc  # residual, f32
    # single pass: per group, recompute q/k/v, softmax, and the attention
    # output a (for dWo), then backprop everything
    for gi in range(n_heads // gh):
        gl = slice(gi * gh * head_dim, (gi + 1) * gh * head_dim)
        qg = proj(wq_ref, bq_ref, gl)
        kg = proj(wk_ref, bk_ref, gl)
        vg = proj(wv_ref, bv_ref, gl)
        dag = jax.lax.dot_general(
            dacc_lp, wo_ref[...][gl, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(xb.dtype).reshape(bb, l, gh * head_dim)
        dqs, dks, dvs, a_parts = [], [], [], []
        for h in range(gh):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            s = jax.lax.dot_general(
                qg[:, :, sl], kg[:, :, sl], (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale
            s = s + neg[:, None, :]
            s = s - s.max(axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / p.sum(axis=-1, keepdims=True)
            # the (L, L)-shaped operands (p, ds) stay f32: the f32→bf16 cast
            # costs more than the bf16 dot saves on these latency-bound
            # small dots (attn_inner_probe: 2.10 → 1.73 ms on the fwd shape)
            a_parts.append(jax.lax.dot_general(
                p, vg[:, :, sl], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(xb.dtype))
            da_h = dag[:, :, sl]
            # dp = da_h · v^T : (Bb, L, L)
            dp = jax.lax.dot_general(
                da_h, vg[:, :, sl], (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            # dv = p^T · da_h : contract the query dim
            dvs.append(jax.lax.dot_general(
                p, da_h, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(xb.dtype))
            ds = p * (dp - (dp * p).sum(axis=-1, keepdims=True)) * scale
            dqs.append(jax.lax.dot_general(
                ds, kg[:, :, sl], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(xb.dtype))
            dks.append(jax.lax.dot_general(
                ds, qg[:, :, sl], (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(xb.dtype))
        ag = jnp.concatenate(a_parts, axis=-1)
        dwo_ref[gl, :] += _wgrad(ag, dacc_lp)
        dq_g = jnp.concatenate(dqs, axis=-1)
        dk_g = jnp.concatenate(dks, axis=-1)
        dv_g = jnp.concatenate(dvs, axis=-1)
        for w_ref, dw_ref, db_ref, dgrad in (
            (wq_ref, dwq_ref, dbq_ref, dq_g),
            (wk_ref, dwk_ref, dbk_ref, dk_g),
            (wv_ref, dwv_ref, dbv_ref, dv_g),
        ):
            dgrad2 = dgrad.reshape(bb * l, gh * head_dim)
            dw_ref[:, gl] += _wgrad(x2, dgrad2)
            db_ref[gl] += dgrad2.astype(jnp.float32).sum(axis=0)
            dx = dx + jax.lax.dot_general(
                dgrad2, w_ref[...][:, gl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    dx_ref[...] = dx.astype(dx_ref.dtype).reshape(bb, l, hid)


def _attn_block_bwd_pallas(x, wq, wk, wv, wo, bq, bk, bv, bo, mask, g, dy, acc,
                           n_heads, ln_eps, block_b, interpret):
    b, l, hid = x.shape
    head_dim = hid // n_heads
    l_pad = -(-l // 8) * 8
    if l_pad != l:
        x = jnp.pad(x, ((0, 0), (0, l_pad - l), (0, 0)))
        dy = jnp.pad(dy, ((0, 0), (0, l_pad - l), (0, 0)))
        acc = jnp.pad(acc, ((0, 0), (0, l_pad - l), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, l_pad - l)), constant_values=0.0)
    b_pad = -(-b // block_b) * block_b
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0), (0, 0)))
        dy = jnp.pad(dy, ((0, b_pad - b), (0, 0), (0, 0)))
        acc = jnp.pad(acc, ((0, b_pad - b), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, b_pad - b), (0, 0)), constant_values=1.0)
    kernel = functools.partial(
        _attn_bwd_kernel, n_heads=n_heads, head_dim=head_dim,
        scale=1.0 / (head_dim ** 0.5), ln_eps=ln_eps,
    )
    from jax.experimental.pallas import tpu as pltpu

    acc_spec = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    mat = jax.ShapeDtypeStruct((hid, hid), jnp.float32)
    vec = jax.ShapeDtypeStruct((hid,), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=(b_pad // block_b,),
        in_specs=[pl.BlockSpec((block_b, l_pad, hid), lambda i: (i, 0, 0))]
        + [pl.BlockSpec((hid, hid), lambda i: (0, 0))] * 4
        + [pl.BlockSpec((hid,), lambda i: (0,))] * 4
        + [pl.BlockSpec((block_b, l_pad), lambda i: (i, 0))]
        + [pl.BlockSpec((hid,), lambda i: (0,))]
        + [pl.BlockSpec((block_b, l_pad, hid), lambda i: (i, 0, 0))] * 2,
        out_specs=[pl.BlockSpec((block_b, l_pad, hid), lambda i: (i, 0, 0))]
        + [acc_spec((hid, hid))] * 4 + [acc_spec((hid,))] * 6,
        out_shape=[jax.ShapeDtypeStruct((b_pad, l_pad, hid), x.dtype)]
        + [mat] * 4 + [vec] * 6,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, wq, wk, wv, wo,
      bq.astype(jnp.float32), bk.astype(jnp.float32), bv.astype(jnp.float32),
      bo.astype(jnp.float32), mask.astype(jnp.float32),
      g.astype(jnp.float32), dy, acc)
    dx = outs[0][:b, :l]
    return (dx,) + tuple(outs[1:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 13, 14))
def fused_attention_block_train(x, wq, wk, wv, wo, bq, bk, bv, bo, mask,
                                n_heads, ln_scale, ln_bias,
                                ln_eps=1e-12, block_b=8):
    """Differentiable LN(x + OutProj(MHA(x))): Pallas fwd AND bwd."""
    return fused_attention_block(x, wq, wk, wv, wo, bq, bk, bv, bo, mask,
                                 n_heads, ln_scale, ln_bias,
                                 ln_eps=ln_eps, block_b=block_b)


def _attn_train_fwd(x, wq, wk, wv, wo, bq, bk, bv, bo, mask, n_heads,
                    ln_scale, ln_bias, ln_eps, block_b):
    if _use_pallas_bwd():
        # forward additionally emits the pre-LN residual sum; the backward
        # kernel then needs no acc-recompute pass
        out, acc = fused_attention_block(
            x, wq, wk, wv, wo, bq, bk, bv, bo, mask, n_heads,
            ln_scale, ln_bias, ln_eps=ln_eps, block_b=block_b, save_acc=True)
    else:
        out = fused_attention_block(x, wq, wk, wv, wo, bq, bk, bv, bo, mask,
                                    n_heads, ln_scale, ln_bias,
                                    ln_eps=ln_eps, block_b=block_b)
        acc = None
    return out, (x, wq, wk, wv, wo, bq, bk, bv, bo, mask, ln_scale, acc)


def _attn_train_bwd(n_heads, ln_eps, block_b, res, dy):
    x, wq, wk, wv, wo, bq, bk, bv, bo, mask, ln_scale, acc = res
    if _use_pallas_bwd() and acc is not None:
        (dx, dwq, dwk, dwv, dwo, dbq, dbk, dbv, dbo, dg, dbe) = (
            _attn_block_bwd_pallas(
                x, wq, wk, wv, wo, bq, bk, bv, bo, mask, ln_scale,
                dy.astype(x.dtype), acc, n_heads, ln_eps, block_b,
                interpret=not _on_tpu()))
    else:
        def ref(x_, wq_, wk_, wv_, wo_, bq_, bk_, bv_, bo_, g_, be_):
            return reference_attention_block(
                x_, wq_, wk_, wv_, wo_, bq_, bk_, bv_, bo_, mask, n_heads,
                g_, be_, ln_eps)

        be0 = jnp.zeros_like(ln_scale)
        _, vjp = jax.vjp(ref, x, wq, wk, wv, wo, bq, bk, bv, bo, ln_scale, be0)
        dx, dwq, dwk, dwv, dwo, dbq, dbk, dbv, dbo, dg, dbe = vjp(dy)
    return (dx, dwq.astype(wq.dtype), dwk.astype(wk.dtype),
            dwv.astype(wv.dtype), dwo.astype(wo.dtype),
            dbq.astype(bq.dtype), dbk.astype(bk.dtype), dbv.astype(bv.dtype),
            dbo.astype(bo.dtype), jnp.zeros_like(mask),
            dg.astype(ln_scale.dtype), dbe.astype(ln_scale.dtype))


fused_attention_block_train.defvjp(_attn_train_fwd, _attn_train_bwd)
