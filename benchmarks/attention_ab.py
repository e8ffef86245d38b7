"""A/B: XLA attention vs Pallas flash attention at DistilBERT encode shapes.

Measures the attention sub-op in isolation AND the full encode step, on the
real chip, to decide whether the encode path adopts the fused kernel
(VERDICT r2 next-2: push encode MFU from 54% toward 70%).

Tunnel protocol per docs/tpu_design.md: chain iterations on a data
dependency, fetch one scalar at the end; calibrate against a known-baseline
measurement first. Run: python benchmarks/attention_ab.py
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_compile_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")


def log(msg):
    print(f"[attn_ab] {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    B, H, L, D = 1024, 12, 128, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.bfloat16)
    scale = 1.0 / np.sqrt(D)

    @jax.jit
    def xla_attn(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    bs = BlockSizes(
        block_q=L, block_k_major=L, block_k=L, block_b=8,
        block_q_major_dkv=L, block_k_major_dkv=L, block_k_dkv=L, block_q_dkv=L,
        block_k_major_dq=L, block_k_dq=L, block_q_dq=L,
    )

    @jax.jit
    def flash(q, k, v):
        return flash_attention(q, k, v, sm_scale=scale, block_sizes=bs)

    t0 = time.perf_counter()
    o1 = xla_attn(q, k, v)
    o1.block_until_ready()
    log(f"xla compiled in {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    o2 = flash(q, k, v)
    o2.block_until_ready()
    log(f"flash compiled in {time.perf_counter()-t0:.1f}s")
    diff = float(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32)).max())
    log(f"max |xla - flash| = {diff:.5f}")

    def bench(f, n=30):
        f(q, k, v).block_until_ready()  # warm
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = f(q, k, v)
        o.block_until_ready()
        return (time.perf_counter() - t0) / n

    fl = 4 * B * H * L * L * D
    for name, f in [("xla", xla_attn), ("flash", flash)]:
        dt = bench(f)
        log(f"{name:6s}: {dt*1000:7.2f} ms   {fl/dt/1e12:5.1f} TF/s (attn flops only)")


if __name__ == "__main__":
    main()
