"""Scoped-VMEM budget model for the fused encoder kernels.

Every fused whole-layer kernel (ops/fused_attention.py, ops/fused_int8.py)
blocks over the batch dimension; the block size sets how many (batch, token)
rows of f32/int32 intermediates live in VMEM at once. Round 4 shipped a
hand-tuned branch (`if l_pad > 128: block_b = 8`) that silently kept
block_b=16 at exactly l_pad == 128 and exceeded the scoped-vmem limit by
172 KB once the gelu swap nudged the kernel's footprint (BENCH_r04 rc=1).

This module replaces the magic branches with an explicit byte model per
kernel: sum the pipelined input/output blocks (double-buffered by the Pallas
grid pipeline), the weight tiles (single-buffered — their index map is
constant), and the in-kernel intermediates, then halve block_b until the
estimate fits the budget. The model is deliberately conservative (it assumes
no buffer reuse between chunk iterations beyond what the loop structure
forces), so the estimate upper-bounds Mosaic's accounting: measured usage at
the calibration point (int8 MLP, block_b=16, l_pad=128, DistilBERT dims) is
40.2 MB vs a 52 MB estimate. The budget is set so the known-good operating
points are preserved: block_b=16 at encode shapes (L<=128), block_b=8 at
training doc shapes (L~200), and graceful halving beyond.

Role in the reference: none — the reference's CUDA kernels come from
torch/ONNX with their own shared-memory heuristics. This is the TPU-native
equivalent of not hand-tuning shared-memory tiles per geometry.
"""

from __future__ import annotations

from typing import Callable

# Largest estimate we allow; the actual Mosaic scoped-vmem limit passed to
# the kernels is VMEM_LIMIT_BYTES (> budget, since the model over-estimates).
# v5e has 128 MB VMEM per core; 64 MB scoped leaves room for the pipeline.
VMEM_BUDGET_BYTES = 52 * 1024 * 1024
VMEM_LIMIT_BYTES = 64 * 1024 * 1024


def fit_block_b(est_bytes: Callable[[int], int], block_b: int,
                budget: int = VMEM_BUDGET_BYTES) -> int:
    """Halve block_b until est_bytes(block_b) fits the scoped-vmem budget."""
    while block_b > 1 and est_bytes(block_b) > budget:
        block_b //= 2
    return block_b


def mlp_bf16_bytes(block_b: int, l_pad: int, hid: int, ff: int,
                   ff_chunks: int, x_bytes: int, save_acc: bool) -> int:
    """fused_mlp_block (ops/fused_attention.py): bf16 dots, f32 acc."""
    ch = ff // ff_chunks
    tok = block_b * l_pad
    n_io_blocks = 3 if save_acc else 2  # x in + 1-2 outs, each double-buffered
    io = 2 * n_io_blocks * tok * hid * x_bytes
    w = 2 * hid * ff * 2 + 4 * (ff + 3 * hid)  # two bf16 weights + f32 vectors
    inter = tok * hid * (x_bytes + 4)          # xb copy + f32 acc
    chunk = tok * ch * (x_bytes + 4)           # gelu(h) bf16 + f32 dot partial
    return io + w + inter + chunk


def mlp_int8_bytes(block_b: int, l_pad: int, hid: int, ff: int,
                   ff_chunks: int, x_bytes: int) -> int:
    """fused_mlp_int8_block (ops/fused_int8.py): int8 dots, int32/f32 acc."""
    ch = ff // ff_chunks
    tok = block_b * l_pad
    io = 2 * 2 * tok * hid * x_bytes            # x + o, double-buffered
    w = 2 * hid * ff + 4 * (2 * ff + 6 * hid)   # int8 weights + f32 vectors
    inter = tok * hid * (4 + 4 + 1 + 4)         # xf, acc, xq, oi(int32)
    chunk = tok * ch * (4 + 4 + 1)              # hi(int32), h(f32), hq(int8)
    return io + w + inter + chunk


def attn_bf16_bytes(block_b: int, l_pad: int, hid: int, n_heads: int,
                    group_heads: int, x_bytes: int, save_acc: bool) -> int:
    """fused_attention_block: whole attention half, x in / LN(out) out."""
    head_dim = hid // n_heads
    gd = group_heads * head_dim
    tok = block_b * l_pad
    n_io_blocks = 3 if save_acc else 2          # x in + out (+acc) blocks
    io = 2 * n_io_blocks * tok * hid * x_bytes + 2 * block_b * l_pad * 4
    w = 4 * hid * hid * x_bytes + 4 * 6 * hid   # four bf16 (H,H) + f32 vectors
    inter = tok * hid * (x_bytes + 4)           # xb copy + f32 acc
    group = tok * gd * (4 * x_bytes + 4)        # qg/kg/vg, a concat, f32 partial
    scores = 2 * block_b * l_pad * l_pad * 4    # f32 logits + probs (per head)
    return io + w + inter + group + scores


def attn_int8_bytes(block_b: int, l_pad: int, hid: int, n_heads: int,
                    group_heads: int, x_bytes: int) -> int:
    """fused_attention_int8_block: int8 projections, bf16 per-head attention."""
    head_dim = hid // n_heads
    gd = group_heads * head_dim
    tok = block_b * l_pad
    io = 2 * 2 * tok * hid * x_bytes + 2 * block_b * l_pad * 4  # x+o blocks, mask
    w = 4 * hid * hid + 4 * 8 * hid             # four int8 (H,H) + f32 vectors
    inter = tok * hid * (4 + 4 + 1)             # xf, acc, xq
    group = tok * gd * (3 * x_bytes + 4 + 4 + 1) + tok * hid * 4  # qg/kg/vg, a(f32), aq+scales, oi
    scores = 2 * block_b * l_pad * l_pad * 4    # f32 logits + probs (per head)
    return io + w + inter + group + scores
