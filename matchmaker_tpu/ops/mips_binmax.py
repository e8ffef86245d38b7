"""Fused MIPS scan: Pallas matmul + bin-max tournament, gather-free ids.

The production approximate search engine (FlatIndex ``mips_kernel: binmax``).
Design, driven by measured XLA TPU lowering hazards (each verified by HLO
inspection / on-chip A-B tests; see benchmarks/search_benchmark.py):

1. **Fused candidate kernel.** The XLA f16 scan (ops/mips_f16.py) round-trips
   the (Q, N) f32 score matrix through HBM (1.1 GB at Q=256, N=1.11M). Here
   the grid walks corpus tiles; each cell computes one (T, D)x(D, Q) MXU
   matmul (transposed: bins on sublanes, queries on lanes — every
   reduction/reshape is major-axis-only, which Mosaic supports) and reduces
   every 128-row bin to its top-2 in-register. Scores never leave VMEM; the
   candidate array is 64x smaller than the scores.

2. **Mantissa-packed ids — no id array, no gathers.**
   ``take_along_axis`` over wide arrays costs ~0.53 ms per 1000 columns of
   row width (74 ms at 8.9M). Instead, each candidate's 7-bit within-bin
   lane offset is packed into the LOW MANTISSA BITS of its f32 value
   (scores are bf16-derived, so ≤2^-17 relative twiddle is sub-noise), and
   the (tile, bin) part of the id is reconstructed ARITHMETICALLY from the
   candidate's column position. Bit packing/unpacking happens ONLY inside
   Pallas kernels: XLA's excess-precision fusion recompute does not preserve
   exact float bit patterns, which corrupts packed lanes in plain-jnp
   pipelines on TPU (the jnp reference here is bit-exact on CPU only — on
   TPU always use the pallas path, the default).

3. **Tournament level 2 — taming the final sort.** ``lax.top_k`` at k≈1000
   lowers to a FULL STABLE SORT on TPU (~0.5 µs/element: 70 ms over the
   8.9M corpus's 139k candidates), and ``approx_max_k`` refuses to narrow
   at that k/width ratio (returns its input unreduced). When the pool
   oversamples k by ≥128x, a second bin-max level keeps the top-8 of every
   128 candidates (packing its lane at mantissa bits [7, 14)), cutting the
   sort width 16x; mid pools (≥16x oversample) use keep-8 per 32 (4x cut). Benchmarks must consume BOTH outputs in full — XLA
   silently narrows top_k to the consumed columns (k'=1 when only column 0
   is read), which voids naive measurements.

Recall model: level 1 loses a true top-k doc only when ≥3 of the top-k land
in one 128-row bin (<0.3% for k=1000 over 1.11M rows); level 2 (gated on
pool ≥ 128·k) only when ≥9 land in one 128-candidate group (negligible).
Verified on-chip vs f32-exact ground truth; honest measured numbers live in
benchmarks/search_benchmark.py and PARITY.md.

When bins/k is small the level-1 collision loss grows (0.90 recall@1000 at
131k rows) — FlatIndex raises per_bin up to 8 and falls back to the exact
scan for corpora too small to cover k (retrieval/indexes.py).

Role: candidate generation for FlatIndex's approximate mode — replaces the
reference's faiss IndexFlatIP scan (faiss_indices.py:49-74) at the same
exactness class as its fp16 storage.

Candidate layout (asserted identical between pallas and jnp reference in
tests): per corpus tile of T rows, the first T/128 output rows are the
rank-0 (bin max) candidates, the next T/128 rows the rank-1, each (., Q).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.sharding import Mesh, PartitionSpec as P

BIN_WIDTH = 128  # bin = one sublane group of corpus rows
LANE_BITS = 7  # log2(BIN_WIDTH): within-bin offset packed into the mantissa
LANE_MASK = BIN_WIDTH - 1


def padding_grain(tile_rows: int = 2048, per_bin: int = 2) -> int:
    """Corpus-row padding grain: rows must be a multiple so the candidate
    count per grain is a 128-multiple (transpose pass blocks). FlatIndex
    restricts per_bin to powers of two, for which grain(2048, 2)=8192 is the
    common multiple; odd per_bin values would need 16384."""
    grain = tile_rows
    while (grain // BIN_WIDTH) * per_bin % 128:
        grain *= 2
    return grain


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001 - no backend at all
        return False


def _pack_lane(vals: jnp.ndarray, lane: jnp.ndarray, shift: int = 0) -> jnp.ndarray:
    """Pack a [0, 128) lane offset into mantissa bits [shift, shift+7) of f32.

    Only finite values are packed (twiddling -inf's mantissa makes a NaN);
    level 1 uses shift=0 (≤2^-17 relative perturbation), the level-2
    tournament shift=7 (≤2^-10 — still under the ~2^-8 bf16 input noise)."""
    bits = jax.lax.bitcast_convert_type(vals, jnp.int32)
    packed = (bits & ~(LANE_MASK << shift)) | (lane << shift)
    packed = jax.lax.bitcast_convert_type(packed, jnp.float32)
    return jnp.where(jnp.isfinite(vals), packed, vals)


def unpack_candidates(
    packed_vals: jnp.ndarray,  # (Q, k) f32, selected candidates
    positions: jnp.ndarray,  # (Q, k) int32, their columns in the candidate array
    tile_rows: int,
    per_bin: int,
    level2: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(values, corpus row ids) from packed candidates — pure elementwise.

    Level 1: column c of the candidate array maps to tile c//(per_bin·nb)
    and bin (c mod nb) with nb = tile_rows/128 (rank-major within a tile);
    the lane offset lives in the value's low 7 mantissa bits. With
    ``level2`` (= the tournament group width, 128 or 32), ``positions``
    index the reduced array: they decode to a level-1 raw row via the
    level-2 block layout + the lane packed at bits [7, 14), which then
    decodes as level 1."""
    nb = tile_rows // BIN_WIDTH
    bits = jax.lax.bitcast_convert_type(packed_vals, jnp.int32)
    lane1 = bits & LANE_MASK
    clear = LANE_MASK | (LANE_MASK << LANE_BITS) if level2 else LANE_MASK
    vals = jax.lax.bitcast_convert_type(bits & ~clear, jnp.float32)
    finite = jnp.isfinite(packed_vals)
    vals = jnp.where(finite, vals, packed_vals)
    if level2:
        lane2 = (bits >> LANE_BITS) & LANE_MASK
        nb2 = _L2_BLOCK // level2  # groups per level-2 grid block
        out_rows = nb2 * LEVEL2_PER_BIN  # rows per block, rank-major
        blk = positions // out_rows
        bin2 = positions % nb2
        rc = blk * _L2_BLOCK + bin2 * level2 + lane2  # level-1 raw row
    else:
        rc = positions
    tile = rc // (per_bin * nb)
    bin_ = rc % nb
    ids = tile * tile_rows + bin_ * BIN_WIDTH + lane1
    return vals, jnp.where(finite, ids, -1).astype(jnp.int32)


def _unpack_kernel(tv_ref, pos_ref, val_ref, id_ref, *, tile_rows, per_bin, level2):
    # (level2 = tournament group width or None, threaded through verbatim)
    vals, ids = unpack_candidates(tv_ref[...], pos_ref[...], tile_rows, per_bin, level2)
    val_ref[...] = vals
    id_ref[...] = ids


def unpack_candidates_pallas(
    packed_vals: jnp.ndarray,
    positions: jnp.ndarray,
    tile_rows: int,
    per_bin: int,
    interpret: Optional[bool] = None,
    level2: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """:func:`unpack_candidates` inside a Pallas kernel.

    NOT an optimization of the unpack itself (it's elementwise either way) —
    a workaround for an XLA TPU lowering hazard: when a ``bitcast_convert``
    consumes data derived from ``lax.top_k``'s output, XLA abandons the fast
    TopK custom-call and lowers top_k as a FULL STABLE SORT of the wide
    candidate array (~70 ms at 8.9M vs ~0.3 ms for TopK; verified by HLO
    inspection). The pallas_call is an opaque custom-call boundary, so the
    bitcasts inside are invisible to that pattern-match."""
    if interpret is None:
        interpret = not _on_tpu()
    q, k = packed_vals.shape
    q_pad = -(-q // 8) * 8
    if q_pad != q:
        packed_vals = jnp.pad(packed_vals, ((0, q_pad - q), (0, 0)))
        positions = jnp.pad(positions, ((0, q_pad - q), (0, 0)))
    rows = min(q_pad, 512)  # grid over query blocks; (rows, k) blocks in VMEM
    while q_pad % rows:
        rows //= 2
    # (rows, k) f32/i32 blocks: 2 ins + 2 outs double-buffered + ~4 unpack
    # temps ≈ 12 live buffers. At rescore fetch widths (k ≈ 4·1000) the
    # default 128-query block overflows scoped vmem — shrink rows to fit.
    from matchmaker_tpu.ops import vmem_budget

    rows = max(8, vmem_budget.fit_block_b(
        lambda r: 12 * r * k * 4, rows))
    while q_pad % rows:
        rows //= 2
    kernel = functools.partial(
        _unpack_kernel, tile_rows=tile_rows, per_bin=per_bin, level2=level2
    )
    from jax.experimental.pallas import tpu as pltpu
    vals, ids = pl.pallas_call(
        kernel,
        grid=(q_pad // rows,),
        in_specs=[
            pl.BlockSpec((rows, k), lambda i: (i, 0)),
            pl.BlockSpec((rows, k), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((rows, k), lambda i: (i, 0)),
            pl.BlockSpec((rows, k), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, k), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_budget.VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(packed_vals, positions)
    return vals[:q], ids[:q]


def _topk_per_bin_t(scores_t: jnp.ndarray, base, n_valid: int, per_bin: int,
                    lane_shift: int = 0, use_argmax: bool = False,
                    bin_width: int = BIN_WIDTH):
    """scores_t (T, Q) f32 → packed candidates (T//128*per_bin, Q).

    Shared by the kernel body (``use_argmax=False``: first-argmax emulated
    as min-over-matching-offsets — inside one Mosaic kernel the equality
    compares the very registers that produced the max, so it is internally
    consistent, and it avoids relying on argmax lowering) and the jnp
    reference (``use_argmax=True``: XLA-TPU fusions may RECOMPUTE the max
    with different precision on each use, which silently breaks exact
    equality against it — jnp.argmax keeps index and mask self-consistent).
    Reductions run over the sublane axis, the lane axis (Q) is untouched;
    the within-bin offset is mantissa-packed at ``lane_shift``."""
    t, q = scores_t.shape
    nb = t // bin_width
    # skip the validity mask only when statically known fully-valid
    if not (isinstance(base, int) and base + t <= n_valid):
        row = jax.lax.broadcasted_iota(jnp.int32, (t, q), 0)
        scores_t = jnp.where(base + row < n_valid, scores_t, -jnp.inf)
    s3 = scores_t.reshape(nb, bin_width, q)
    off = jax.lax.broadcasted_iota(jnp.int32, (nb, bin_width, q), 1)

    packed = []
    cur = s3
    for r in range(per_bin):
        m = cur.max(axis=1)
        if use_argmax:
            idx = jnp.argmax(cur, axis=1).astype(jnp.int32)
        else:
            # first row offset achieving the max (ties → lowest, like argmax)
            idx = jnp.min(jnp.where(cur == m[:, None, :], off, bin_width), axis=1)
            idx = jnp.minimum(idx, bin_width - 1)  # all--inf bin → masked by -inf
        packed.append(_pack_lane(m, idx, lane_shift))
        if r + 1 < per_bin:
            cur = jnp.where(off == idx[:, None, :], -jnp.inf, cur)
    return jnp.concatenate(packed, axis=0)


def _binmax_kernel(q_ref, c_ref, val_ref, *, tile_rows, n_valid, per_bin):
    i = pl.program_id(0)
    # transposed matmul: (T, D)·(D, Q) → (T, Q); bins on sublanes, Q on lanes
    scores_t = jax.lax.dot_general(
        c_ref[...],
        q_ref[...],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    val_ref[...] = _topk_per_bin_t(scores_t, i * tile_rows, n_valid, per_bin)


def _binmax_kernel_int8(q_ref, c_ref, cs_ref, qs_ref, val_ref, *, tile_rows,
                        n_valid, per_bin):
    """Int8 corpus variant: int8×int8→int32 on the MXU's double-rate path
    (halves HBM corpus traffic too), dequantized to f32 scores before the
    bin-max tournament. At D ≤ 2^7 the raw int32 dot is ≤ 127·127·D < 2^24,
    so the f32 cast is EXACT and the mantissa-packing noise argument is
    unchanged.

    Dequant scales are PER 128-ROW BIN (``cs_ref`` (T/128, 1)), not per row:
    a (T, 1) per-row block is lane-padded ×128 by Mosaic — 1 MB of HBM
    traffic per 256 KB int8 corpus tile, which made the first per-row cut
    measure SLOWER than bf16 (5.5k vs 6.2k QPS on the ColBERT workload).
    FlatIndex row-permutes the corpus, so bins are i.i.d. samples and the
    bin absmax is statistically the row absmax's envelope; normalized
    corpora (ColBERT tokens, cosine bert_dot) lose nothing."""
    i = pl.program_id(0)
    raw = jax.lax.dot_general(
        c_ref[...],
        q_ref[...],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (T, Q) int32
    nb = raw.shape[0] // BIN_WIDTH
    q = raw.shape[1]
    scores3 = raw.astype(jnp.float32).reshape(nb, BIN_WIDTH, q) * cs_ref[...][:, :, None]
    scores_t = scores3.reshape(nb * BIN_WIDTH, q) * qs_ref[...]
    val_ref[...] = _topk_per_bin_t(scores_t, i * tile_rows, n_valid, per_bin)


def _binmax_kernel_int8f(q_ref, c_ref, cs_ref, val_ref, *, tile_rows,
                         n_valid, per_bin):
    """Mixed int8-corpus / bf16-query variant: the tile's int8 codes are
    dequantized to bf16 IN-KERNEL (exact — 7-bit codes fit bf16's 8-bit
    mantissa) and dotted against the UNQUANTIZED bf16 query.

    Same HBM corpus traffic as the int8 kernel (the codes are what crosses
    HBM; the bf16 copy lives only in VMEM) but no query-quantization noise:
    scores match the bf16 kernel to bf16-rounding, so recall matches the
    bf16 scan (0.9967@1000 on the search bench) at int8 memory. The cost is
    the MXU's bf16 rate instead of the int8 double rate — immaterial while
    the scan is HBM-bound. This supersedes the gather-based exact rescore
    for recall-parity int8 serving: the (Q, fetch, D) candidate gather is
    XLA-pathological on TPU (~90 ms at serving shapes, docs/tpu_design.md
    "lowering hazards"), while this kernel pays ~zero."""
    i = pl.program_id(0)
    raw = jax.lax.dot_general(
        c_ref[...].astype(jnp.bfloat16),
        q_ref[...],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (T, Q) f32
    nb = raw.shape[0] // BIN_WIDTH
    q = raw.shape[1]
    scores_t = (raw.reshape(nb, BIN_WIDTH, q) * cs_ref[...][:, :, None]
                ).reshape(nb * BIN_WIDTH, q)
    val_ref[...] = _topk_per_bin_t(scores_t, i * tile_rows, n_valid, per_bin)


def _transpose_kernel(in_ref, out_ref):
    out_ref[...] = in_ref[...].T


LEVEL2_PER_BIN = 8  # candidates kept per tournament group
_L2_BLOCK = 1024
# tournament variants: group width → (16x cut for huge pools, 4x for mid)
L2_WIDE, L2_MID = 128, 32


def _make_level2_kernel(bin_width):
    def kernel(in_ref, out_ref):
        out_ref[...] = _topk_per_bin_t(
            in_ref[...], 0, in_ref.shape[0], LEVEL2_PER_BIN,
            lane_shift=LANE_BITS, bin_width=bin_width,
        )
    return kernel


def _level2_reduce(packed_t: jnp.ndarray, interpret: bool, use_pallas: bool,
                   bin_width: int = L2_WIDE) -> jnp.ndarray:
    """Tournament level 2 over the raw (C, Q) candidate array.

    Every ``bin_width`` level-1 candidates reduce to their top-8, the
    within-group offset mantissa-packed at bits [7, 14) — a
    bin_width/8-fold cut of the final sort width (lax.top_k is a full sort
    on TPU, ~0.5 µs/element). binmax_scan_topk gates the variant on the
    pool/k ratio so the keep-8 collision loss stays negligible."""
    c, q = packed_t.shape
    if c % _L2_BLOCK:
        pad = _L2_BLOCK - c % _L2_BLOCK
        packed_t = jnp.pad(packed_t, ((0, pad), (0, 0)), constant_values=-jnp.inf)
        c = packed_t.shape[0]
    out_rows = _L2_BLOCK // bin_width * LEVEL2_PER_BIN
    if not use_pallas:
        # per-_L2_BLOCK rank-major, exactly like the kernel grid's layout
        # (a single whole-array call would be GLOBALLY rank-major — wrong
        # positions for unpack_candidates beyond the first block)
        blocks = packed_t.reshape(-1, _L2_BLOCK, q)
        out = jax.vmap(
            lambda b: _topk_per_bin_t(b, 0, _L2_BLOCK, LEVEL2_PER_BIN,
                                      lane_shift=LANE_BITS, use_argmax=True,
                                      bin_width=bin_width)
        )(blocks)
        out = out.reshape(-1, q)
    else:
        out = pl.pallas_call(
            _make_level2_kernel(bin_width),
            grid=(c // _L2_BLOCK,),
            in_specs=[pl.BlockSpec((_L2_BLOCK, q), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((out_rows, q), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((c // bin_width * LEVEL2_PER_BIN, q), jnp.float32),
            interpret=interpret,
        )(packed_t)
    if out.shape[0] % 128:  # transpose pass needs 128-multiples; pad columns
        out = jnp.pad(out, ((0, 128 - out.shape[0] % 128), (0, 0)),
                      constant_values=-jnp.inf)
    return out


def _pallas_transpose(x: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    """(C, Q) → physical (Q, C), C % 128 == 0.

    XLA's own transpose of this array is catastrophically slow (~0.5 µs per
    element when a custom-call operand forces materialization), so the
    candidate array is transposed by a trivial Pallas pass instead."""
    c, q = x.shape
    return pl.pallas_call(
        _transpose_kernel,
        grid=(c // 128,),
        in_specs=[pl.BlockSpec((128, q), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((q, 128), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((q, c), x.dtype),
        interpret=interpret,
    )(x)


def binmax_candidates(
    queries: jnp.ndarray,  # (Q, D) any float dtype (int8 with query_scales)
    corpus: jnp.ndarray,  # (N, D) f16/bf16 or int8; pre-pad N to tile_rows to avoid a copy
    n_valid: Optional[int] = None,
    per_bin: int = 2,
    tile_rows: int = 2048,
    interpret: Optional[bool] = None,
    q_chunk: int = 256,
    level2: Optional[int] = None,
    corpus_scales: Optional[jnp.ndarray] = None,  # (N/128, 1) f32 bin scales, int8 only
    query_scales: Optional[jnp.ndarray] = None,  # (Q, 1) f32, int8 corpus only
) -> jnp.ndarray:
    """Per-bin top-``per_bin`` packed candidates over the whole corpus.

    Returns (Q, N//128*per_bin) f32 in the tile-major, rank-blocked layout
    described in the module docstring, lane offsets mantissa-packed
    (decode with :func:`unpack_candidates`). ``level2`` applies the
    16x tournament reduction (see :func:`_level2_reduce`).

    The corpus should be stored **bf16** on device: Mosaic has no f16 type,
    and the production f16-scan already computes in bf16 (mips_f16.py casts
    f16→bf16 before its matmul), so scores are identical. An f16/f32 input is
    converted here — materializing a device copy per call; avoid in hot loops.

    Query batches larger than ``q_chunk`` run as a ``lax.map`` over chunks —
    the in-kernel (tile_rows, Q) score block and its temporaries live in
    VMEM, which bounds Q per kernel launch (ColBERT's per-token searches
    send batch*query_len rows at once).
    """
    q, dim = queries.shape
    n = corpus.shape[0]
    q_chunk = max(128, q_chunk // 128 * 128)  # lane-axis multiple
    int8_mode = corpus.dtype == jnp.int8
    # int8 corpus + float queries (query_scales omitted) = the MIXED kernel:
    # in-kernel bf16 dequant against the unquantized bf16 query
    mixed_mode = int8_mode and query_scales is None
    if int8_mode:
        assert corpus_scales is not None, \
            "int8 corpus needs corpus_scales (N/128,1) bin scales"
        assert n % BIN_WIDTH == 0 and corpus_scales.shape[0] == n // BIN_WIDTH, \
            "int8 corpus rows must be a bin multiple (quantize_corpus_binwise pads)"
    elif corpus.dtype != jnp.bfloat16:
        corpus = corpus.astype(jnp.bfloat16)
    # rows must give a 128-multiple candidate count (the transpose pass works
    # on 128-column blocks) — callers in hot loops (FlatIndex) pre-pad to
    # padding_grain() so this is a no-op there
    grain = padding_grain(tile_rows, per_bin)
    if n % grain != 0:
        corpus = jnp.pad(corpus, ((0, grain - n % grain), (0, 0)))
        if int8_mode:  # padded bins: scale 0 → score exactly 0, masked by n_valid
            corpus_scales = jnp.pad(
                corpus_scales, ((0, (grain - n % grain) // BIN_WIDTH), (0, 0)))
    if n_valid is None:
        n_valid = n
    n_pad = corpus.shape[0]
    if interpret is None:
        interpret = not _on_tpu()

    q_pad = -(-q // 128) * 128  # Q is the lane axis in-kernel
    qb = queries if (int8_mode and not mixed_mode) else queries.astype(jnp.bfloat16)
    if q_pad != q:
        qb = jnp.pad(qb, ((0, q_pad - q), (0, 0)))
        if query_scales is not None:
            query_scales = jnp.pad(query_scales, ((0, q_pad - q), (0, 0)))

    nb_tile = tile_rows // BIN_WIDTH * per_bin
    n_cands = n_pad // BIN_WIDTH * per_bin
    if mixed_mode:
        kernel = functools.partial(
            _binmax_kernel_int8f, tile_rows=tile_rows, n_valid=n_valid, per_bin=per_bin
        )
        qs_t = None
    elif int8_mode:
        kernel = functools.partial(
            _binmax_kernel_int8, tile_rows=tile_rows, n_valid=n_valid, per_bin=per_bin
        )
        qs_t = query_scales.astype(jnp.float32).reshape(1, -1)  # (1, Q_pad) lanes
    else:
        kernel = functools.partial(
            _binmax_kernel, tile_rows=tile_rows, n_valid=n_valid, per_bin=per_bin
        )
        qs_t = None

    def launch(q_block, qs_block=None):  # (q_chunk_or_pad, D) → PHYSICAL (q_block, width)
        qp = q_block.shape[0]
        if int8_mode:
            ins = [q_block, corpus, corpus_scales.astype(jnp.float32)]
            in_specs = [
                pl.BlockSpec((qp, dim), lambda i: (0, 0)),
                pl.BlockSpec((tile_rows, dim), lambda i: (i, 0)),
                pl.BlockSpec((tile_rows // BIN_WIDTH, 1), lambda i: (i, 0)),
            ]
            if not mixed_mode:
                ins.append(qs_block)
                in_specs.append(pl.BlockSpec((1, qp), lambda i: (0, 0)))
            vals_t = pl.pallas_call(
                kernel,
                grid=(n_pad // tile_rows,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((nb_tile, qp), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((n_cands, qp), jnp.float32),
                interpret=interpret,
            )(*ins)
        else:
            vals_t = pl.pallas_call(
                kernel,
                grid=(n_pad // tile_rows,),
                in_specs=[
                    pl.BlockSpec((qp, dim), lambda i: (0, 0)),
                    pl.BlockSpec((tile_rows, dim), lambda i: (i, 0)),
                ],
                out_specs=pl.BlockSpec((nb_tile, qp), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((n_cands, qp), jnp.float32),
                interpret=interpret,
            )(q_block, corpus)
        if level2:
            vals_t = _level2_reduce(vals_t, interpret, use_pallas=True,
                                    bin_width=level2)
        return _pallas_transpose(vals_t, interpret)

    if q_pad <= q_chunk:
        return launch(qb, qs_t)[:q]

    # chunk the query axis: VMEM holds (tile_rows, q_chunk) scores + temps
    q_pad = -(-q // q_chunk) * q_chunk
    if q_pad != qb.shape[0]:
        qb = jnp.pad(qb, ((0, q_pad - qb.shape[0]), (0, 0)))
        if qs_t is not None:
            qs_t = jnp.pad(qs_t, ((0, 0), (0, q_pad - qs_t.shape[1])))
    chunks = qb.reshape(q_pad // q_chunk, q_chunk, dim)
    if qs_t is not None:
        qs_chunks = qs_t.reshape(q_pad // q_chunk, 1, q_chunk)
        vals = jax.lax.map(lambda args: launch(*args), (chunks, qs_chunks))
    else:
        vals = jax.lax.map(launch, chunks)
    return vals.reshape(q_pad, vals.shape[-1])[:q]


def binmax_candidates_jnp(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    n_valid: Optional[int] = None,
    per_bin: int = 2,
    tile_rows: int = 2048,
    level2: Optional[int] = None,
    corpus_scales: Optional[jnp.ndarray] = None,
    query_scales: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Reference implementation: identical math and candidate layout, plain
    XLA (tests + CPU fallback)."""
    q, dim = queries.shape
    n = corpus.shape[0]
    int8_mode = corpus.dtype == jnp.int8
    mixed_mode = int8_mode and query_scales is None  # see binmax_candidates
    grain = padding_grain(tile_rows, per_bin)  # same padding rule as pallas
    if n % grain != 0:
        corpus = jnp.pad(corpus, ((0, grain - n % grain), (0, 0)))
        if int8_mode:
            corpus_scales = jnp.pad(
                corpus_scales, ((0, (grain - n % grain) // BIN_WIDTH), (0, 0)))
    if n_valid is None:
        n_valid = n
    qb = queries if (int8_mode and not mixed_mode) else queries.astype(jnp.bfloat16)
    blocks = corpus.reshape(-1, tile_rows, dim)
    nb_t = tile_rows // BIN_WIDTH
    sblocks = (corpus_scales.astype(jnp.float32).reshape(-1, nb_t, 1)
               if int8_mode else jnp.zeros((blocks.shape[0], 1, 1)))
    qs_t = (query_scales.astype(jnp.float32).reshape(1, -1)
            if int8_mode and not mixed_mode else None)

    def body(_, inp):
        blk, sblk, i = inp
        if mixed_mode:
            raw = jax.lax.dot_general(
                blk.astype(jnp.bfloat16), qb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            qn = raw.shape[1]
            scores_t = (raw.reshape(nb_t, BIN_WIDTH, qn) * sblk[:, :, None]
                        ).reshape(tile_rows, qn)
        elif int8_mode:
            raw = jax.lax.dot_general(
                blk, qb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            qn = raw.shape[1]
            scores3 = raw.astype(jnp.float32).reshape(nb_t, BIN_WIDTH, qn) * sblk[:, :, None]
            scores_t = scores3.reshape(tile_rows, qn) * qs_t
        else:
            scores_t = jax.lax.dot_general(
                blk.astype(jnp.bfloat16), qb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return None, _topk_per_bin_t(scores_t, i * tile_rows, n_valid, per_bin,
                                     use_argmax=True)

    _, vals = jax.lax.scan(body, None, (blocks, sblocks, jnp.arange(blocks.shape[0])))
    # (n_tiles, nb_tile, Q) → (Q, n_tiles*nb_tile), tile-major like the kernel
    raw = vals.reshape(-1, q)
    if level2:
        raw = _level2_reduce(raw, interpret=False, use_pallas=False,
                             bin_width=level2)
    return raw.T


def _column_bin_starts(
    n_cols: int, tile_rows: int, per_bin: int, level2: Optional[int]
) -> jnp.ndarray:
    """Smallest corpus-row bin start each candidate column can carry.

    Pure arithmetic on the candidate layout (no unpack): level-1 column c is
    tile c//(per_bin·nb), bin c%nb; a level-2 column covers a contiguous span
    of ``level2`` level-1 columns, so its bound is the span minimum. Used to
    -inf columns whose EVERY contributing bin lies at/after a traced validity
    bound (fully-padded bins whose zero rows would otherwise enter top-k)."""
    nb = tile_rows // BIN_WIDTH
    cols = jnp.arange(n_cols, dtype=jnp.int32)
    if level2:
        nb2 = _L2_BLOCK // level2
        out_rows = nb2 * LEVEL2_PER_BIN
        blk = cols // out_rows
        bin2 = cols % nb2
        first = blk * _L2_BLOCK + bin2 * level2  # first level-1 column of group
        span = first[:, None] + jnp.arange(level2, dtype=jnp.int32)[None, :]
    else:
        span = cols[:, None]
    tile = span // (per_bin * nb)
    bin_ = span % nb
    return (tile * tile_rows + bin_ * BIN_WIDTH).min(axis=1)


def binmax_scan_topk(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    k: int,
    n_valid: Optional[int] = None,
    per_bin: int = 2,
    tile_rows: int = 2048,
    index_offset: int = 0,
    use_pallas: Optional[bool] = None,
    interpret: Optional[bool] = None,
    valid_bound=None,
    gate_rows: Optional[int] = None,
    corpus_scales: Optional[jnp.ndarray] = None,
    q_chunk: Optional[int] = None,
    mixed_queries: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k over an f16/bf16 (or int8 + per-row scales) corpus: fused
    candidate scan + one exact top-k.

    ``mixed_queries`` (int8 corpus only): keep queries in bf16 and dequantize
    corpus tiles in-kernel (:func:`_binmax_kernel_int8f`) — bf16-scan recall
    at int8 memory and HBM traffic; the recall-parity int8 serving mode.

    Drop-in for :func:`ops.mips_f16.f16_scan_topk` (approx mode); same
    (values, int32 ids) contract, ids offset by ``index_offset`` for sharding.
    Id extraction is gather-free (mantissa packing, see module docstring).
    An int8 corpus (``corpus_scales`` (N/128, 1) f32 bin scales from
    :func:`ops.mips_quant.quantize_corpus_binwise`) runs the MXU's
    double-rate int8 path at half the HBM traffic; float queries are
    per-row-quantized here inside the jit.

    ``valid_bound`` (traced int, optional): additionally -inf every candidate
    column whose entire bin lies at/after this row — used by the sharded path,
    whose in-kernel ``n_valid`` must be a static SPMD-uniform constant, to
    drop the tail shard's fully-padded bins before they occupy top-k slots
    (zero-padding rows score exactly 0.0, above real sub-zero tail hits).
    """
    if use_pallas is None:
        use_pallas = _on_tpu() or bool(interpret)
    fn = binmax_candidates if use_pallas else binmax_candidates_jnp
    kw = {"interpret": interpret} if use_pallas else {}
    if use_pallas and q_chunk is not None:
        kw["q_chunk"] = q_chunk
    if corpus.dtype == jnp.int8:
        kw["corpus_scales"] = corpus_scales
        if not mixed_queries:
            qf = queries.astype(jnp.float32)
            q_scale = jnp.maximum(jnp.abs(qf).max(axis=1, keepdims=True) / 127.0, 1e-10)
            queries = jnp.clip(jnp.round(qf / q_scale), -127, 127).astype(jnp.int8)
            kw["query_scales"] = q_scale

    # Final-selection economics: lax.top_k at k~1000 lowers to a FULL STABLE
    # SORT on TPU (~0.5 µs/element — 70 ms over the 8.9M corpus's 139k
    # candidates; approx_max_k can't narrow at this k/width ratio, it
    # returns its input unreduced). When the candidate pool is wide enough
    # that keep-8-per-128 loses nothing (C ≥ 128·k → the reduced pool still
    # oversamples k by ≥8x), a second bin-max tournament level cuts the sort
    # width 16x, packing its lane at mantissa bits [7, 14).
    # the tournament gate must see the REAL candidate pool (``gate_rows``,
    # default n_valid): gating on the padded corpus buffer admits small dense
    # pools where keep-8 truncation is material — e.g. 4096 real rows padded
    # to an 8192-row shard at k=20 would pass the mid gate while ~10 of the
    # top-20 share one rank-0..1 group of 32
    basis = gate_rows if gate_rows is not None else (
        n_valid if n_valid is not None else corpus.shape[0]
    )
    if not isinstance(basis, int):  # traced n_valid: gate needs a static bound
        basis = corpus.shape[0]
    n_cands = basis // BIN_WIDTH * per_bin
    # tournament variant by pool/k ratio: 16x cut (keep-8/128) for huge
    # pools, 4x (keep-8/32) for mid — both keep the collision loss negligible
    if n_cands >= 128 * k:
        level2 = L2_WIDE
    elif n_cands >= 16 * k:
        level2 = L2_MID
    else:
        level2 = None
    packed = fn(queries, corpus, n_valid=n_valid, per_bin=per_bin, tile_rows=tile_rows,
                level2=level2, **kw)
    if valid_bound is not None:
        starts = _column_bin_starts(packed.shape[1], tile_rows, per_bin, level2)
        packed = jnp.where(starts[None, :] < valid_bound, packed, -jnp.inf)
    k_eff = min(k, packed.shape[1])
    top_packed, pos = jax.lax.top_k(packed, k_eff)
    if use_pallas:
        # kernel-wrapped unpack: a raw bitcast consumer of top_k output can
        # trigger further lowering hazards (see unpack_candidates_pallas)
        vals, ids = unpack_candidates_pallas(top_packed, pos, tile_rows, per_bin,
                                             interpret=interpret, level2=level2)
    else:
        vals, ids = unpack_candidates(top_packed, pos, tile_rows, per_bin, level2=level2)
    return vals, jnp.where(ids >= 0, ids + index_offset, -1).astype(jnp.int32)


def sharded_binmax_topk(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,  # (N, D), N divisible by the mesh axis size
    k: int,
    mesh: Optional[Mesh] = None,
    axis="data",  # a mesh axis name or a tuple of names (multi-host (dcn, ici))
    n_valid: Optional[int] = None,
    corpus_scales: Optional[jnp.ndarray] = None,  # (N/128, 1) f32 bin scales, int8 corpus
    **kw,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mesh-sharded fused scan: per-chip kernel + one (Q, k·shards) ICI merge —
    the same composition as ops/mips_f16.sharded_f16_scan_topk.

    Global tail padding (zero rows at/after ``n_valid``) is handled in two
    layers, because the kernel's own validity bound is a static compile-time
    constant identical across shards under SPMD: (1) every candidate column
    whose whole bin lies in the padded tail is -inf'd BEFORE the per-shard
    top-k (traced ``valid_bound`` arithmetic on the candidate layout —
    without this, each fully-padded 128-row bin injects per_bin candidates
    at score 0.0 that displace real sub-zero tail hits from the per-shard
    pool); (2) the surviving mixed bins' padded rows are filtered by id
    after top-k. Residual pollution is ≤ per_bin·(1 + LEVEL2_PER_BIN)
    candidates from the boundary bins — ≤72 of the k·n_shards merged pool,
    and those slots are -inf'd, not mis-ranked."""
    if mesh is None or len(mesh.devices.flatten()) == 1:
        return binmax_scan_topk(queries, corpus, k, n_valid=n_valid,
                                corpus_scales=corpus_scales, **kw)

    from matchmaker_tpu.parallel.mesh import axis_size

    n_shards = axis_size(mesh, axis)
    shard_rows = corpus.shape[0] // n_shards
    if n_valid is None:
        n_valid = corpus.shape[0]
    if corpus_scales is None:  # placeholder so the shard_map arity is static
        corpus_scales = jnp.zeros((n_shards, 1), jnp.float32)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis, None)),
        out_specs=(P(None, axis), P(None, axis)),
        check_vma=False,
    )
    def per_shard(q, c_shard, s_shard):
        shard_id = jax.lax.axis_index(axis)
        base = shard_id * shard_rows
        # local n_valid=shard_rows masks rows the kernel pads to a tile
        # multiple (otherwise their local ids would alias the NEXT shard's
        # global range); the traced valid_bound -inf's fully-padded tail bins
        # before the per-shard top-k, and the id filter below catches the
        # mixed boundary bins' remnants
        local_valid = jnp.clip(n_valid - base, 0, shard_rows)
        # gate_rows = the fullest shard's real fill (rows are contiguous, so
        # shard 0 holds min(shard_rows, n_valid)) — static and SPMD-uniform
        vals, idx = binmax_scan_topk(
            q, c_shard, k, n_valid=shard_rows, valid_bound=local_valid,
            gate_rows=min(shard_rows, n_valid),
            corpus_scales=s_shard if c_shard.dtype == jnp.int8 else None, **kw
        )
        vals = jnp.where(idx + base < n_valid, vals, -jnp.inf)
        if vals.shape[1] < k:
            pad = k - vals.shape[1]
            vals = jnp.pad(vals, ((0, 0), (0, pad)), constant_values=-jnp.inf)
            idx = jnp.pad(idx, ((0, 0), (0, pad)), constant_values=-1)
        # -inf slots carry the -1 sentinel, never a real-looking global id
        return vals, jnp.where(jnp.isfinite(vals) & (idx >= 0), idx + base, -1)

    part_vals, part_idx = per_shard(queries, corpus, corpus_scales)
    vals, pos = jax.lax.top_k(part_vals, k)
    return vals, jnp.take_along_axis(part_idx, pos, axis=1)


def binmax_rescore_topk(
    queries: jnp.ndarray,  # (Q, D) f32
    values: jnp.ndarray,  # (N, D) int8 corpus (bin-scale codes)
    bin_scales: jnp.ndarray,  # (N/128, 1) f32 from quantize_corpus_binwise
    k: int,
    oversample: int = 4,
    per_bin: int = 4,
    n_valid: Optional[int] = None,
    index_offset: int = 0,
    rescore_corpus: Optional[jnp.ndarray] = None,  # (N, D) 16-bit rows; None → rescore the int8 codes
    **kw,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Int8 binmax candidates + exact rescore: recall parity at scan speed.

    The int8 binmax scan alone measures recall@1000 0.912, and measurement
    shows ~all of that loss is IN-BIN CANDIDATE loss, not final-ranking
    error: per-bin top-2 selection by doubly-quantized scores (int8 query ×
    int8 bin-scale corpus) drops true top-k docs whose bins hold ≥2
    noise-inflated rivals (score noise σ≈0.013 vs a 0.036 score spread on
    the synthetic bench). Hence TWO fixes compose here:

    - ``per_bin=4`` on the int8 scan: losing a doc now takes 4 rivals
      (Poisson tail: P(≥4 beats) ≈ 1e-3 vs P(≥2) ≈ 0.08) — candidate
      coverage ~0.999 at the same corpus HBM traffic;
    - exact rescore of ``oversample``·k fetched candidates — the f32 query
      against the same int8 codes (dequantized per bin; no extra memory)
      or against 16-bit rows (``rescore_corpus``) — undoes the quantized
      final ranking. Gathered rows are rescored in bf16: int8 codes are
      EXACT in bf16 (8-bit mantissa ⊇ 7-bit codes) at half the gather
      materialization of f32; the bf16 query rounding (σ≈7e-5·|q||c|) is
      noise against the corpus quantization it corrects (σ≈0.009).

    This is literally ScaNN's shape (reference scann_index.py:32-35:
    quantized scan + exact reorder) built from the binmax kernel + one
    gather + one small einsum.
    """
    n = values.shape[0]
    # cap fetch at the scan's candidate-pool width (per_bin per 128-row bin):
    # an oversample asking past the pool would top_k wider than the pool
    pool = max((n // BIN_WIDTH) * per_bin, 1)
    fetch = min(max(k * oversample, k), n, max(pool, k))
    cand_vals, cand_idx = binmax_scan_topk(
        queries, values, fetch, n_valid=n_valid, corpus_scales=bin_scales,
        per_bin=per_bin, **kw
    )
    valid = jnp.isfinite(cand_vals) & (cand_idx >= 0)
    safe = jnp.clip(cand_idx, 0, n - 1)
    qf = queries.astype(jnp.bfloat16)
    if rescore_corpus is not None:
        rows = rescore_corpus[safe].astype(jnp.bfloat16)  # (Q, fetch, D)
        exact = jnp.einsum("qd,qcd->qc", qf, rows,
                           preferred_element_type=jnp.float32)
    else:
        rows = values[safe].astype(jnp.bfloat16)
        exact = jnp.einsum("qd,qcd->qc", qf, rows,
                           preferred_element_type=jnp.float32)
        exact = exact * bin_scales[safe // BIN_WIDTH, 0]
    exact = jnp.where(valid, exact, -jnp.inf)
    k_eff = min(k, fetch)
    vals, pos = jax.lax.top_k(exact, k_eff)
    idx = jnp.take_along_axis(cand_idx, pos, axis=1)
    idx = jnp.where(jnp.isfinite(vals), idx + index_offset, -1).astype(jnp.int32)
    if k_eff < k:
        vals = jnp.pad(vals, ((0, 0), (0, k - k_eff)), constant_values=-jnp.inf)
        idx = jnp.pad(idx, ((0, 0), (0, k - k_eff)), constant_values=-1)
    return vals, idx


def sharded_binmax_rescore_topk(
    queries: jnp.ndarray,
    values: jnp.ndarray,
    bin_scales: jnp.ndarray,
    k: int,
    mesh: Optional[Mesh] = None,
    axis="data",
    n_valid: Optional[int] = None,
    rescore_corpus: Optional[jnp.ndarray] = None,
    **kw,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mesh-sharded binmax + exact rescore: both stages per chip on its
    shard, one (Q, k·shards) ICI merge (same composition as
    sharded_binmax_topk / sharded_twostage_topk)."""
    if mesh is None or len(mesh.devices.flatten()) == 1:
        return binmax_rescore_topk(
            queries, values, bin_scales, k, n_valid=n_valid,
            rescore_corpus=rescore_corpus, **kw
        )

    from matchmaker_tpu.parallel.mesh import axis_size

    n_shards = axis_size(mesh, axis)
    shard_rows = values.shape[0] // n_shards
    if n_valid is None:
        n_valid = values.shape[0]
    in_specs = [P(), P(axis, None), P(axis, None)]
    args = [queries, values, bin_scales]
    if rescore_corpus is not None:
        in_specs.append(P(axis, None))
        args.append(rescore_corpus)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(None, axis), P(None, axis)),
        check_vma=False,
    )
    def per_shard(q, v_shard, s_shard, *rest):
        shard_id = jax.lax.axis_index(axis)
        base = shard_id * shard_rows
        local_valid = jnp.clip(n_valid - base, 0, shard_rows)
        vals, idx = binmax_rescore_topk(
            q, v_shard, s_shard, k,
            n_valid=shard_rows, valid_bound=local_valid,
            gate_rows=min(shard_rows, n_valid),
            rescore_corpus=rest[0] if rest else None, **kw
        )
        vals = jnp.where((idx >= 0) & (idx + base < n_valid), vals, -jnp.inf)
        return vals, jnp.where(jnp.isfinite(vals) & (idx >= 0), idx + base, -1)

    part_vals, part_idx = per_shard(*args)
    vals, pos = jax.lax.top_k(part_vals, k)
    return vals, jnp.take_along_axis(part_idx, pos, axis=1)
