"""The scoped-VMEM budget model that sizes the fused kernels' batch tiles.

Round 4's bench regression (BENCH_r04 rc=1) was a hand-tuned block-size
branch that missed the l_pad == 128 boundary; these tests pin the byte
model's operating points so any future change that silently shrinks or grows
a production tile shows up as a diff, and the real compile check lives in
tools/aot_gate.py (on-TPU AOT compilation at production geometries —
interpret-mode CPU tests can never catch a Mosaic vmem failure).
"""

import pytest

from matchmaker_tpu.ops import vmem_budget as v

H, FF, HEADS = 768, 3072, 12  # DistilBERT dims
BF16 = 2


def _mlp_int8(bb, lp):
    return v.mlp_int8_bytes(bb, lp, H, FF, 4, BF16)


def _mlp_bf16(bb, lp, save_acc=False):
    return v.mlp_bf16_bytes(bb, lp, H, FF, 4, BF16, save_acc)


def test_bench_geometry_keeps_block_16():
    # the headline encode geometry (batch 1024, L 128): block_b must stay 16
    # — this is the exact point round 4 shipped broken
    assert v.fit_block_b(lambda bb: _mlp_int8(bb, 128), 16) == 16
    assert v.fit_block_b(lambda bb: _mlp_bf16(bb, 128), 16) == 16
    assert v.fit_block_b(lambda bb: _mlp_bf16(bb, 128, save_acc=True), 16) == 16


def test_training_doc_length_halves_block():
    # training docs run L=200: the f32 per-chunk intermediates at block 16
    # exceed the budget; the model must degrade to 8, not fail at compile
    assert v.fit_block_b(lambda bb: _mlp_int8(bb, 200), 16) == 8
    assert v.fit_block_b(lambda bb: _mlp_bf16(bb, 200, save_acc=True), 16) == 8


def test_monotone_degradation_never_raises():
    # fit only ever LOWERS block_b, halving until it fits, floor 1
    for lp in (8, 64, 128, 200, 512, 2048):
        bb = v.fit_block_b(lambda b: _mlp_int8(b, lp), 16)
        assert 1 <= bb <= 16
        assert _mlp_int8(bb, lp) <= v.VMEM_BUDGET_BYTES or bb == 1
        # larger l_pad can never produce a larger block than smaller l_pad
    blocks = [v.fit_block_b(lambda b: _mlp_int8(b, lp), 16)
              for lp in (64, 128, 256, 512, 1024)]
    assert blocks == sorted(blocks, reverse=True)


def test_estimates_upper_bound_measured_usage():
    # calibration anchor: Mosaic measured 40.17 MB at (16, 128) int8 MLP
    # (the round-4 failure message); the model must upper-bound it, and the
    # limit passed to the compiler must clear it with margin
    measured = int(40.17 * 1024 * 1024)
    assert _mlp_int8(16, 128) >= measured
    assert v.VMEM_LIMIT_BYTES >= measured + 4 * 1024 * 1024


def test_attention_models_keep_production_blocks():
    assert v.fit_block_b(
        lambda bb: v.attn_bf16_bytes(bb, 128, H, HEADS, 2, BF16, False), 8) == 8
    assert v.fit_block_b(
        lambda bb: v.attn_int8_bytes(bb, 128, H, HEADS, 2, BF16), 8) == 8


@pytest.mark.parametrize("l", [120, 128, 136])
def test_no_boundary_cliff_at_l128(l):
    # the round-4 bug fired at exactly l_pad == 128 (`>` vs `>=`); assert the
    # model's decision is boundary-free: whatever block it picks, the
    # estimate fits the budget
    lp = -(-l // 8) * 8
    bb = v.fit_block_b(lambda b: _mlp_int8(b, lp), 16)
    assert _mlp_int8(bb, lp) <= v.VMEM_BUDGET_BYTES
