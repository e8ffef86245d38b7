"""On-TPU AOT compile gate for every production Pallas kernel geometry.

Round 4 shipped a bench-breaking regression: a one-line gelu swap nudged the
int8 MLP kernel's VMEM footprint 172 KB over the scoped limit at EXACTLY the
bench geometry (batch 1024 x seq 128), and nothing caught it because the CPU
test suite runs the kernels in interpret mode, which can never hit a Mosaic
vmem/compile failure. This gate closes that hole: it AOT-compiles
(`jit(...).lower(shapes).compile()`) each production program at its
production geometry on the real chip, using abstract ShapeDtypeStructs only
— no data is materialized, no kernel is executed, so the whole gate is pure
compile time (fast on a warm persistent cache).

Run it on the TPU before any snapshot / after any kernel or encoder change:

    python tools/aot_gate.py            # all gates
    python tools/aot_gate.py encode     # substring-filter gate names

Exit code 0 = every geometry compiles; 1 = at least one failed (the failure
is printed with its gate name). Wired into the verify skill.

Reference bar: the reference has no equivalent (its CUDA kernels come
pre-compiled from torch/faiss); this is the cost of owning the kernels.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_compile_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

F32 = jnp.float32
I32 = jnp.int32


def _s(shape, dtype=F32):
    return jax.ShapeDtypeStruct(shape, dtype)


def _encode_gate(batch, seq, **enc_kwargs):
    """BertDot.encode at the bench geometry (bench.py:bench_encode)."""
    from matchmaker_tpu.models.bert_dot import BertDot
    from matchmaker_tpu.models.encoder import EncoderConfig

    model = BertDot(
        encoder_cfg=EncoderConfig.distilbert(**enc_kwargs),
        return_vecs=False, compute_dtype=jnp.bfloat16,
    )
    ids = _s((batch, seq), I32)
    mask = _s((batch, seq), F32)
    params = jax.eval_shape(
        lambda i, m: model.init(
            jax.random.PRNGKey(0),
            {"query_ids": i, "query_mask": m, "doc_ids": i, "doc_mask": m},
        ),
        ids, mask,
    )["params"]

    def encode(params, ids, mask):
        return model.apply({"params": params}, ids, mask, "doc", method=BertDot.encode)

    jax.jit(encode).lower(params, ids, mask).compile()


def gate_encode_int8_mlp():
    # the headline bench config (bench.py:50-55): batch 1024, L 128
    _encode_gate(1024, 128, norms_in_compute_dtype=True,
                 fused_attention=True, int8_mlp=True)


def gate_encode_int8_full():
    # the int8_full A/B config: int8 attention projections too
    _encode_gate(1024, 128, norms_in_compute_dtype=True,
                 fused_attention=True, int8_mlp=True, int8_attention=True)


def gate_encode_bf16_fused():
    _encode_gate(1024, 128, norms_in_compute_dtype=True, fused_attention=True)


def gate_encode_long_seq():
    # rerank/eval shapes run longer sequences through the same fused kernels
    _encode_gate(256, 200, norms_in_compute_dtype=True,
                 fused_attention=True, int8_mlp=True)


def gate_train_fused():
    """Full fused train step at the train_benchmark geometry (b128 q30/d200):
    pos+neg forward, Margin-MSE + in-batch negatives, custom-VJP backward,
    grad clip, AdamW (benchmarks/train_benchmark.py)."""
    from matchmaker_tpu.losses import get_loss
    from matchmaker_tpu.models.bert_dot import BertDot
    from matchmaker_tpu.models.encoder import EncoderConfig
    from matchmaker_tpu.training.optim import build_optimizer
    from matchmaker_tpu.training.train_step import make_train_step

    config = {
        "loss": "margin-mse", "train_pairwise_distillation": True,
        "in_batch_negatives": True, "in_batch_neg_loss": "margin-mse",
        "gradient_clip_norm": 100.0, "max_training_steps": 100_000,
        "optimizer_warmup_steps": 1000, "learning_rate": 7e-6,
    }
    model = BertDot(
        encoder_cfg=EncoderConfig.distilbert(fused_attention=True),
        return_vecs=True, compute_dtype=jnp.bfloat16,
    )
    b, mq, md = 128, 30, 200
    batch = {
        "query_ids": _s((b, mq), I32), "query_mask": _s((b, mq), F32),
        "doc_pos_ids": _s((b, md), I32), "doc_pos_mask": _s((b, md), F32),
        "doc_neg_ids": _s((b, md), I32), "doc_neg_mask": _s((b, md), F32),
        "pos_score": _s((b,), F32), "neg_score": _s((b,), F32),
        "valid": _s((b,), F32),
    }
    pos = {"query_ids": batch["query_ids"], "query_mask": batch["query_mask"],
           "doc_ids": batch["doc_pos_ids"], "doc_mask": batch["doc_pos_mask"]}
    params = jax.eval_shape(
        lambda p: model.init(jax.random.PRNGKey(0), p), pos)["params"]
    tx = build_optimizer(config, params)
    opt_state = jax.eval_shape(tx.init, params)
    step = make_train_step(model, get_loss(config), tx, config)
    # make_train_step returns a jitted fn; lower it directly
    step.lower(params, opt_state, batch).compile()


def gate_binmax_1m():
    """Fused binmax candidate scan + top-k at the bench geometry
    (bench.py:bench_search: 256 queries x 1M bf16 corpus, k=1000)."""
    from matchmaker_tpu.ops.mips_binmax import binmax_scan_topk

    q = _s((256, 768), F32)
    corpus = _s((1_048_576, 768), jnp.bfloat16)
    jax.jit(lambda q, c: binmax_scan_topk(q, c, k=1000)).lower(q, corpus).compile()


def gate_binmax_int8_1m():
    """Int8 binmax variant (the half-memory production scan)."""
    from matchmaker_tpu.ops.mips_binmax import binmax_scan_topk

    q = _s((256, 768), F32)
    corpus = _s((1_048_576, 768), jnp.int8)
    scales = _s((1_048_576 // 128, 1), F32)  # per-128-row-bin scales
    jax.jit(
        lambda q, c, s: binmax_scan_topk(q, c, k=1000, corpus_scales=s)
    ).lower(q, corpus, scales).compile()


def gate_binmax_int8_rescore_1m():
    """Int8 binmax + exact rescore (FlatIndex mips_twostage production path:
    per_bin=4 candidates, 4x-oversampled gather + bf16 rescore einsum)."""
    from matchmaker_tpu.ops.mips_binmax import binmax_rescore_topk

    q = _s((256, 768), F32)
    corpus = _s((1_048_576, 768), jnp.int8)
    scales = _s((1_048_576 // 128, 1), F32)
    jax.jit(
        lambda q, c, s: binmax_rescore_topk(q, c, s, k=1000, oversample=4)
    ).lower(q, corpus, scales).compile()


def gate_binmax_int8_mixed_1m():
    """Mixed int8-corpus/bf16-query binmax (the recall-parity int8 serving
    scan: in-kernel dequant, no query quantization, no gather)."""
    from matchmaker_tpu.ops.mips_binmax import binmax_scan_topk

    q = _s((256, 768), F32)
    corpus = _s((1_048_576, 768), jnp.int8)
    scales = _s((1_048_576 // 128, 1), F32)
    jax.jit(
        lambda q, c, s: binmax_scan_topk(
            q, c, k=1000, corpus_scales=s, mixed_queries=True)
    ).lower(q, corpus, scales).compile()


def gate_mips_quant_1m():
    from matchmaker_tpu.ops.mips_quant import quantized_blocked_topk

    q = _s((256, 768), F32)
    corpus = _s((1_048_576, 768), jnp.int8)
    jax.jit(
        lambda q, c: quantized_blocked_topk(
            q, c, jnp.float32(0.01), k=1000, block_size=262144, approx=True)
    ).lower(q, corpus).compile()


def gate_mips_f16_1m():
    from matchmaker_tpu.ops.mips_f16 import f16_scan_topk

    q = _s((256, 768), F32)
    corpus = _s((1_048_576, 768), jnp.float16)
    jax.jit(
        lambda q, c: f16_scan_topk(q, c, k=1000, block_size=None)
    ).lower(q, corpus).compile()


GATES = {
    "encode_int8_mlp_b1024_l128": gate_encode_int8_mlp,
    "encode_int8_full_b1024_l128": gate_encode_int8_full,
    "encode_bf16_fused_b1024_l128": gate_encode_bf16_fused,
    "encode_int8_mlp_b256_l200": gate_encode_long_seq,
    "train_fused_b128_q30_d200": gate_train_fused,
    "binmax_bf16_1m": gate_binmax_1m,
    "binmax_int8_1m": gate_binmax_int8_1m,
    "binmax_int8_rescore_1m": gate_binmax_int8_rescore_1m,
    "binmax_int8_mixed_1m": gate_binmax_int8_mixed_1m,
    "mips_quant_int8_1m": gate_mips_quant_1m,
    "mips_f16_scan_1m": gate_mips_f16_1m,
}


def main() -> int:
    filters = [a for a in sys.argv[1:] if not a.startswith("-")]
    if jax.devices()[0].platform != "tpu":
        print("[aot-gate] WARNING: not on TPU — Mosaic vmem limits are NOT "
              "checked off-chip; this run only validates tracing/lowering.",
              flush=True)
    failed = []
    for name, fn in GATES.items():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.perf_counter()
        try:
            fn()
            print(f"[aot-gate] PASS {name} ({time.perf_counter()-t0:.1f}s)", flush=True)
        except Exception:
            print(f"[aot-gate] FAIL {name} ({time.perf_counter()-t0:.1f}s)", flush=True)
            traceback.print_exc()
            failed.append(name)
    if failed:
        print(f"[aot-gate] FAILED: {failed}", flush=True)
        return 1
    print("[aot-gate] all geometries compile", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
