"""Probe: does row-packing the fused MLP kernel's dots fix in-kernel MXU η?

Round-4 finding (docs/tpu_design.md): the fused train step runs at η≈0.70
in-kernel MXU efficiency, flat across the (block_b, ff_chunks) tile space.
Hypothesis: the 3D batched dots on (block_b, L, H) blocks lower per batch
row — a (200, 768)·(768, ch) matmul per example (1.56 MXU row-waves, 78%
utilization) and a catastrophic (32, 768) one for queries (25%).

Variants measured at training shapes (B=128, L∈{200, 32}):
  a) prod    — fused_mlp_block as shipped (3D dots)
  b) rows2d  — same grid/blocks, dots reshaped to (block_b·L, H) inside the
               kernel (leading-dim merge is a free relayout; lane dim intact)
  c) rowsblk — full row-major restructure: x reshaped to (B·L, H) OUTSIDE,
               grid over 1024-row blocks, no l_pad at all

Usage: python benchmarks/mlp_rows_probe.py [--iters 30]
"""

from __future__ import annotations

import argparse
import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_compile_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from matchmaker_tpu.ops.fused_attention import _gelu_for, fused_mlp_block


def _mlp_kernel_rows2d(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, be_ref,
                       o_ref, *, ff_chunks, ln_eps):
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
    mean = acc.mean(axis=-1, keepdims=True)
    var = ((acc - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (acc - mean) * jax.lax.rsqrt(var + ln_eps)
    o_ref[...] = ((y * g_ref[...] + be_ref[...]).astype(o_ref.dtype)
                  ).reshape(bb, l, hid)


def mlp_rows2d(x, w1, b1, w2, b2, g, be, ln_eps=1e-12, block_b=8, ff_chunks=4):
    b, l, hid = x.shape
    l_pad = -(-l // 8) * 8
    if l_pad != l:
        x = jnp.pad(x, ((0, 0), (0, l_pad - l), (0, 0)))
    b_pad = -(-b // block_b) * block_b
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0), (0, 0)))
    ff = w1.shape[1]
    kernel = functools.partial(_mlp_kernel_rows2d, ff_chunks=ff_chunks, ln_eps=ln_eps)
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
        out_specs=pl.BlockSpec((block_b, l_pad, hid), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b_pad, l_pad, hid), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=jax.devices()[0].platform != "tpu",
    )(x, w1, b1.astype(jnp.float32), w2, b2.astype(jnp.float32),
      g.astype(jnp.float32), be.astype(jnp.float32))
    return out[:b, :l]


def _mlp_kernel_rowsblk(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, be_ref,
                        o_ref, *, ff_chunks, ln_eps):
    x2 = x_ref[...]  # (R, H)
    gelu = _gelu_for(x2.dtype)
    acc = x2.astype(jnp.float32) + b2_ref[...]
    ff = w1_ref.shape[1]
    ch = ff // ff_chunks
    for c in range(ff_chunks):
        sl = slice(c * ch, (c + 1) * ch)
        h = jax.lax.dot_general(
            x2, w1_ref[...][:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[...][sl]
        h = gelu(h).astype(x2.dtype)
        acc = acc + jax.lax.dot_general(
            h, w2_ref[...][sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    mean = acc.mean(axis=-1, keepdims=True)
    var = ((acc - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (acc - mean) * jax.lax.rsqrt(var + ln_eps)
    o_ref[...] = (y * g_ref[...] + be_ref[...]).astype(o_ref.dtype)


def mlp_rowsblk(x, w1, b1, w2, b2, g, be, ln_eps=1e-12, block_r=1024, ff_chunks=4):
    b, l, hid = x.shape
    x2 = x.reshape(b * l, hid)
    n = b * l
    n_pad = -(-n // block_r) * block_r
    if n_pad != n:
        x2 = jnp.pad(x2, ((0, n_pad - n), (0, 0)))
    ff = w1.shape[1]
    kernel = functools.partial(_mlp_kernel_rowsblk, ff_chunks=ff_chunks, ln_eps=ln_eps)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // block_r,),
        in_specs=[
            pl.BlockSpec((block_r, hid), lambda i: (i, 0)),
            pl.BlockSpec((hid, ff), lambda i: (0, 0)),
            pl.BlockSpec((ff,), lambda i: (0,)),
            pl.BlockSpec((ff, hid), lambda i: (0, 0)),
            pl.BlockSpec((hid,), lambda i: (0,)),
            pl.BlockSpec((hid,), lambda i: (0,)),
            pl.BlockSpec((hid,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((block_r, hid), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, hid), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=jax.devices()[0].platform != "tpu",
    )(x2, w1, b1.astype(jnp.float32), w2, b2.astype(jnp.float32),
      g.astype(jnp.float32), be.astype(jnp.float32))
    return out[:n].reshape(b, l, hid)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    hid, ff = 768, 3072
    rng = np.random.default_rng(0)
    w1 = jnp.asarray(rng.normal(0, 0.02, (hid, ff)), jnp.bfloat16)
    b1 = jnp.asarray(rng.normal(0, 0.02, (ff,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.02, (ff, hid)), jnp.bfloat16)
    b2 = jnp.asarray(rng.normal(0, 0.02, (hid,)), jnp.float32)
    g = jnp.ones((hid,), jnp.float32)
    be = jnp.zeros((hid,), jnp.float32)

    variants = {
        "prod_3d": lambda x: fused_mlp_block(x, w1, b1, w2, b2, g, be),
        "rows2d": lambda x: mlp_rows2d(x, w1, b1, w2, b2, g, be),
        "rowsblk_1024": lambda x: mlp_rowsblk(x, w1, b1, w2, b2, g, be, block_r=1024),
        "rowsblk_2048": lambda x: mlp_rowsblk(x, w1, b1, w2, b2, g, be, block_r=2048),
    }
    # training doc/query shapes; 2B doc rows per step (packed triple forward)
    for (b, l) in ((2 * args.batch, 200), (args.batch, 32)):
        x = jnp.asarray(rng.normal(0, 1, (b, l, hid)), jnp.bfloat16)
        flops = 2 * 2 * b * l * hid * ff  # two matmuls, MAC=2 flops
        print(f"--- shape ({b}, {l}, {hid}) | {flops/1e9:.1f} GFLOP/call", flush=True)
        ref = None
        for name, fn in variants.items():
            step = jax.jit(lambda x, s: fn(x + s * 1e-9).astype(jnp.float32).sum())
            t0 = time.perf_counter()
            s = step(x, jnp.float32(0.0))
            sv = float(np.asarray(s))
            compile_t = time.perf_counter() - t0
            if ref is None:
                ref = sv
            start = time.perf_counter()
            for _ in range(args.iters):
                s = step(x, s * 1e-20)
            _ = float(np.asarray(s))
            dt = (time.perf_counter() - start) / args.iters
            eff = flops / dt / 197e12
            print(f"{name:14s} {dt*1e3:7.3f} ms  MXU-eff {eff*100:5.1f}%  "
                  f"(compile {compile_t:.1f}s, checksum drift {abs(sv-ref)/max(abs(ref),1e-9):.2e})", flush=True)


if __name__ == "__main__":
    main()
