"""Attention inner-dot strategy shootout (in-kernel, real chip).

fused_kernel_probe.py showed the attention halves run at 0.42/0.47x peak
while the MLP halves (gelu stubbed) beat bare XLA; the drag is the per-head
(L,64)x(64,L) logits/value dots. This probe measures, inside otherwise
identical Pallas kernels, the candidate formulations of the inner loop:

  A. batched 3D dot per head over the Bb batch dim (the shipped structure);
  B. the same with softmax stubbed to a scale (isolates VPU softmax);
  C. fully unrolled 2D dots (one (L,64)x(64,L) per example per head);
  D. one batched dot over ALL heads at once: q/k/v relaid in-kernel to
     (Bb*gh, L, 64) per group via reshape-free lane slicing;
  E. A with the gelu-style f32->bf16 p cast removed (cast cost).

Each kernel consumes pre-projected q/k/v (Bb, L, H*D) and emits the
attention output in the same layout, so the measured time is inner-dot +
softmax only. Stubbed/wrong-math variants exist purely to attribute time.

Usage: python benchmarks/attn_inner_probe.py [--rows 256] [--len 200]
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import functools
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_compile_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PEAK = 197e12
H, D = 12, 64
HID = H * D


def _softmax(s, neg):
    s = s + neg
    s = s - s.max(axis=-1, keepdims=True)
    p = jnp.exp(s)
    return p / p.sum(axis=-1, keepdims=True)


def k_batched(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale, stub_softmax=False,
              keep_f32_p=False):
    q, k, v = q_ref[...], k_ref[...], v_ref[...]
    neg = ((m_ref[...] - 1.0) * 1e9)[:, None, :]
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        s = jax.lax.dot_general(
            q[:, :, sl], k[:, :, sl], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        if stub_softmax:
            p = s * 0.005
        else:
            p = _softmax(s, neg)
        p = p if keep_f32_p else p.astype(q.dtype)
        o_ref[:, :, sl] = jax.lax.dot_general(
            p, v[:, :, sl], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def k_unrolled(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale, block_b):
    q, k, v = q_ref[...], k_ref[...], v_ref[...]
    neg = (m_ref[...] - 1.0) * 1e9
    for b in range(block_b):
        for h in range(H):
            sl = slice(h * D, (h + 1) * D)
            s = jax.lax.dot_general(
                q[b, :, sl], k[b, :, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            p = _softmax(s, neg[b][None, :]).astype(q.dtype)
            o_ref[b, :, sl] = jax.lax.dot_general(
                p, v[b, :, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(o_ref.dtype)


def k_allheads(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale, block_b, length):
    # one batched dot over (Bb*H, L, D): relayout via reshape of lane slices
    q, k, v = q_ref[...], k_ref[...], v_ref[...]
    neg = (m_ref[...] - 1.0) * 1e9
    # (Bb, L, H, D) -> (Bb, H, L, D) transpose in-kernel (sublane shuffle)
    def relay(x):
        return x.reshape(block_b, length, H, D).transpose(0, 2, 1, 3).reshape(
            block_b * H, length, D)
    qh, kh, vh = relay(q), relay(k), relay(v)
    s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    negh = jnp.repeat(neg, H, axis=0)[:, None, :]
    p = _softmax(s, negh).astype(q.dtype)
    o = jax.lax.dot_general(p, vh, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[...] = o.reshape(block_b, H, length, D).transpose(0, 2, 1, 3).reshape(
        block_b, length, HID).astype(o_ref.dtype)


def k_blockdiag(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale, length):
    # head-PAIR packing at full MXU depth: scores for 2 heads as ONE
    # (L, 2D)x(2D, 2L) matmul against a block-diagonal K' — the zeros cost
    # nothing extra (equal FLOPs: L·2L·2D == 2·(L·L·D)·2) but the contraction
    # runs 128 deep instead of 64 (the MXU is 128 wide — a 64-deep dot wastes
    # half the array). Attend likewise: p (L, 2L) x block-diag V' (2L, 2D)
    # gives both heads' outputs with a 2L-deep contraction. Batched over Bb.
    q, k, v = q_ref[...], k_ref[...], v_ref[...]
    bb = q.shape[0]
    neg = ((m_ref[...] - 1.0) * 1e9)[:, None, :]
    zero = jnp.zeros((bb, length, D), q.dtype)
    for hp in range(H // 2):
        sl1 = slice((2 * hp) * D, (2 * hp + 1) * D)
        sl2 = slice((2 * hp + 1) * D, (2 * hp + 2) * D)
        # K' block diagonal: (Bb, 2L, 2D)
        kp = jnp.concatenate([
            jnp.concatenate([k[:, :, sl1], zero], axis=2),
            jnp.concatenate([zero, k[:, :, sl2]], axis=2),
        ], axis=1)
        qp = jnp.concatenate([q[:, :, sl1], q[:, :, sl2]], axis=2)  # (Bb, L, 2D)
        s = jax.lax.dot_general(
            qp, kp, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # (Bb, L, 2L)
        s1 = _softmax(s[:, :, :length], neg).astype(q.dtype)
        s2 = _softmax(s[:, :, length:], neg).astype(q.dtype)
        p = jnp.concatenate([s1, s2], axis=2)  # (Bb, L, 2L)
        vp = jnp.concatenate([
            jnp.concatenate([v[:, :, sl1], zero], axis=2),
            jnp.concatenate([zero, v[:, :, sl2]], axis=2),
        ], axis=1)  # (Bb, 2L, 2D) block diagonal
        o = jax.lax.dot_general(
            p, vp, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (Bb, L, 2D) = [o1 | o2]
        o_ref[:, :, sl1] = o[:, :, :D].astype(o_ref.dtype)
        o_ref[:, :, sl2] = o[:, :, D:].astype(o_ref.dtype)


def run(kernel_fn, name, x, mask, block_b, L, iters, results, flops):
    b_tot = x.shape[0]
    blk3 = pl.BlockSpec((block_b, L, HID), lambda i: (i, 0, 0))
    f = pl.pallas_call(
        kernel_fn,
        grid=(b_tot // block_b,),
        in_specs=[blk3, blk3, blk3, pl.BlockSpec((block_b, L), lambda i: (i, 0))],
        out_specs=blk3,
        out_shape=jax.ShapeDtypeStruct((b_tot, L, HID), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )

    @jax.jit
    def step(x):
        return f(x, x, x, mask)

    y = step(x)
    y.ravel()[0].block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = step(y)
        _ = float(np.asarray(y.ravel()[0]))
        best = min(best, (time.perf_counter() - t0) / iters)
    eff = flops / best / PEAK
    results[name] = {"ms": round(best * 1e3, 3), "tflops": round(flops / best / 1e12, 1),
                     "eff_vs_peak": round(eff, 3)}
    print(f"[inner] {name:28s} {best*1e3:8.3f} ms  {flops/best/1e12:6.1f} TF/s  ({eff:.2f}x peak)",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=256)
    ap.add_argument("--len", type=int, dest="length", default=200)
    ap.add_argument("--block-b", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    B, L, Bb = args.rows, args.length, args.block_b
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.3, (B, L, HID)).astype(np.float32), jnp.bfloat16)
    mask = jnp.ones((B, L), jnp.float32)
    flops = 4 * B * L * L * D * H  # two matmuls per head per example
    scale = 1.0 / D ** 0.5
    results = {}

    run(functools.partial(k_batched, scale=scale), "batched(current)",
        x, mask, Bb, L, args.iters, results, flops)
    run(functools.partial(k_batched, scale=scale, stub_softmax=True),
        "batched_SOFTMAX_STUB", x, mask, Bb, L, args.iters, results, flops)
    run(functools.partial(k_batched, scale=scale, keep_f32_p=True),
        "batched_f32_p", x, mask, Bb, L, args.iters, results, flops)
    run(functools.partial(k_unrolled, scale=scale, block_b=Bb), "unrolled_2d",
        x, mask, Bb, L, args.iters, results, flops)
    run(functools.partial(k_blockdiag, scale=scale, length=L), "blockdiag_pairs",
        x, mask, Bb, L, args.iters, results, flops)
    # k_allheads: Mosaic rejects the in-kernel (Bb,L,HID)->(Bb,L,H,D) reshape
    # ("infer-vector-layout: unsupported shape cast") — head relayout must
    # stay lane-slicing, measured impossible to batch across heads in-kernel
    if os.environ.get("PROBE_ALLHEADS"):
        run(functools.partial(k_allheads, scale=scale, block_b=Bb, length=L),
            "allheads_batched", x, mask, Bb, L, args.iters, results, flops)
    for bb in (16,):  # bb=4 violates the (bb, L) mask-block sublane minimum
        if B % bb == 0:
            run(functools.partial(k_batched, scale=scale), f"batched_bb{bb}",
                x, mask, bb, L, args.iters, results, flops)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
