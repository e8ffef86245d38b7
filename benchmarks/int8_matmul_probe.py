"""Is int8 worth it on this chip? Raw MXU probe before building any kernel.

v5e peak: ~197 TFLOP/s bf16, ~394 TOP/s int8. This measures XLA einsum and a
minimal Pallas dot at DistilBERT MLP shapes (the FF matmuls are ~57% of
encode-layer FLOPs) for bf16 vs int8 operands, plus the quantize-dequantize
overhead an int8 MLP path would actually pay (dynamic per-row activation
quantization). If the end-to-end int8 chain is not >=1.4x bf16 here, an int8
encode path cannot beat the fused bf16 kernels and the project is dead.

Usage: python benchmarks/int8_matmul_probe.py
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

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


def log(msg):
    print(f"[int8-probe] {msg}", flush=True)


def timed(fn, *args, iters=30):
    """Seed-chained timing (the tunnel's block_until_ready is async): each
    call's input depends on the previous scalar output, and one tiny
    device->host fetch at the end forces the whole chain."""
    tok = fn(jnp.float32(0.0), *args)
    _ = float(tok)  # warm + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        tok = fn(tok, *args)
    _ = float(tok)
    return (time.perf_counter() - t0) / iters


def main():
    # encode step shape: batch 1024, L 128 -> M = 131072 rows through the MLP
    m, k, n = 16384, 768, 3072  # one grid slice worth; FLOPs scale linearly
    flops = 2 * m * k * n
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(k, n)), jnp.bfloat16)
    xq = jnp.asarray(rng.integers(-127, 127, size=(m, k)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 127, size=(k, n)), jnp.int8)

    @jax.jit
    def mm_bf16(tok, x, w):
        xx = x + tok.astype(x.dtype)  # serialize on the previous output
        out = jax.lax.dot_general(xx, w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        return jnp.abs(out).sum() * 1e-30  # consume the FULL output

    @jax.jit
    def mm_int8(tok, xq, wq):
        xx = (xq + (tok.astype(jnp.int32) % 2).astype(jnp.int8)).astype(jnp.int8)
        out = jax.lax.dot_general(xx, wq, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return jnp.abs(out).sum().astype(jnp.float32) * 1e-30

    @jax.jit
    def mm_int8_chain(tok, x, wq, wscale):
        # the real int8 path: dynamic per-row activation quant + dequant
        xx = x + tok.astype(x.dtype)
        s = jnp.max(jnp.abs(xx), axis=1, keepdims=True).astype(jnp.float32) / 127.0
        xq = jnp.clip(jnp.round(xx.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * (s * wscale[None, :])
        return jnp.abs(out).sum() * 1e-30

    wscale = jnp.ones((n,), jnp.float32)

    t_bf16 = timed(mm_bf16, x, w)
    t_int8 = timed(mm_int8, xq, wq)
    t_chain = timed(mm_int8_chain, x, wq, wscale)
    log(f"XLA bf16: {t_bf16*1e3:.3f} ms = {flops/t_bf16/1e12:.1f} TF/s")
    log(f"XLA int8 (pre-quantized): {t_int8*1e3:.3f} ms = {flops/t_int8/1e12:.1f} TOP/s")
    log(f"XLA int8 chain (dyn act quant + dequant): {t_chain*1e3:.3f} ms "
        f"= {flops/t_chain/1e12:.1f} eff-TOP/s")

    # minimal Pallas int8 dot — does Mosaic lower it to the int8 MXU path?
    def pk(x_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    bm = 512

    @jax.jit
    def mm_int8_pallas(tok, xq, wq):
        xx = (xq + (tok.astype(jnp.int32) % 2).astype(jnp.int8)).astype(jnp.int8)
        out = pl.pallas_call(
            pk,
            grid=(m // bm,),
            in_specs=[pl.BlockSpec((bm, k), lambda i: (i, 0)),
                      pl.BlockSpec((k, n), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        )(xx, wq)
        return jnp.abs(out).sum().astype(jnp.float32) * 1e-30

    try:
        t_pallas = timed(mm_int8_pallas, xq, wq)
        log(f"Pallas int8: {t_pallas*1e3:.3f} ms = {flops/t_pallas/1e12:.1f} TOP/s")
        pallas_tops = round(flops / t_pallas / 1e12, 1)
    except Exception as e:  # Mosaic may reject int8 dots on some versions
        log(f"Pallas int8 FAILED: {type(e).__name__}: {str(e)[:300]}")
        pallas_tops = None

    print(json.dumps({
        "bf16_tflops": round(flops / t_bf16 / 1e12, 1),
        "int8_tops": round(flops / t_int8 / 1e12, 1),
        "int8_chain_efftops": round(flops / t_chain / 1e12, 1),
        "pallas_int8_tops": pallas_tops,
        "int8_vs_bf16": round(t_bf16 / t_int8, 2),
        "chain_vs_bf16": round(t_bf16 / t_chain, 2),
    }))


if __name__ == "__main__":
    main()
