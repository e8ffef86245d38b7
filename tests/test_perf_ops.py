"""Performance-path ops: int8 quantized MIPS, approx top-k, Pallas kernels."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from matchmaker_tpu.ops.mips_quant import quantize_corpus, quantized_blocked_topk, sharded_quantized_topk


def _numpy_topk(queries, corpus, k):
    scores = queries @ corpus.T
    idx = np.argsort(-scores, axis=1)[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx


def test_quantize_roundtrip(rng):
    v = rng.normal(size=(50, 16)).astype(np.float32)
    values, scales = quantize_corpus(v)
    assert values.dtype == np.int8
    recon = values.astype(np.float32) * scales[:, None]
    rel_err = np.abs(recon - v).max() / np.abs(v).max()
    assert rel_err < 0.01


def test_quantized_topk_recall(rng):
    q = rng.normal(size=(6, 32)).astype(np.float32)
    c = rng.normal(size=(500, 32)).astype(np.float32)
    values, scales = quantize_corpus(c)
    vals, idx = quantized_blocked_topk(
        jnp.asarray(q), jnp.asarray(values), jnp.asarray(scales), k=10,
        block_size=128, approx=False,
    )
    _, ref_idx = _numpy_topk(q, c, 10)
    # int8 quantization may swap near-ties; demand >=9/10 overlap per query
    for qi in range(6):
        overlap = len(set(np.asarray(idx)[qi]) & set(ref_idx[qi]))
        assert overlap >= 9, overlap


def test_quantized_sharded(rng, eight_devices):
    from matchmaker_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    q = rng.normal(size=(4, 16)).astype(np.float32)
    c = rng.normal(size=(8 * 32, 16)).astype(np.float32)
    values, scales = quantize_corpus(c)
    vals, idx = sharded_quantized_topk(
        jnp.asarray(q), jnp.asarray(values), jnp.asarray(scales), k=5,
        mesh=mesh, block_size=16, approx=False,
    )
    _, ref_idx = _numpy_topk(q, c, 5)
    for qi in range(4):
        overlap = len(set(np.asarray(idx)[qi]) & set(ref_idx[qi]))
        assert overlap >= 4


def test_flat_index_quantized(rng, eight_devices):
    from matchmaker_tpu.parallel.mesh import make_mesh
    from matchmaker_tpu.retrieval.indexes import FlatIndex

    index = FlatIndex(
        {"token_dtype": "float32", "mips_quantization": "int8"}, make_mesh()
    )
    vectors = rng.normal(size=(160, 24)).astype(np.float32)
    ids = np.array([f"d{i}" for i in range(160)])
    index.prepare(24)
    index.index(ids, vectors)
    q = vectors[[3, 77]]
    _, got = index.search(q, 5)
    _, ref_idx = _numpy_topk(q, vectors, 5)
    for qi in range(2):
        assert len({f"d{i}" for i in ref_idx[qi]} & set(got[qi])) >= 4


def test_pallas_maxsim_v2_matches_jnp(rng):
    """Round-2 blocked kernel (one MXU matmul per doc tile + static segmented
    max) vs the production jnp path — bit-level agreement on padded shapes."""
    from matchmaker_tpu.ops.maxsim import maxsim_all_pairs
    from matchmaker_tpu.ops.pallas_kernels import maxsim_all_pairs_pallas_v2

    q = rng.normal(size=(12, 8, 16)).astype(np.float32)
    d = rng.normal(size=(21, 12, 16)).astype(np.float32)  # odd Bd → td padding
    qm = (rng.random((12, 8)) > 0.2).astype(np.float32)
    dm = (rng.random((21, 12)) > 0.2).astype(np.float32)
    ref = maxsim_all_pairs(jnp.asarray(q), jnp.asarray(d), jnp.asarray(qm), jnp.asarray(dm))
    got = maxsim_all_pairs_pallas_v2(
        jnp.asarray(q), jnp.asarray(d), jnp.asarray(qm), jnp.asarray(dm), td=8
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), rtol=1e-4, atol=1e-4)


def test_global_scale_quantized_topk(rng, eight_devices):
    """int8-global: scale-free top-k on raw scores matches per-row mode ranking."""
    from matchmaker_tpu.parallel.mesh import make_mesh

    q = rng.normal(size=(5, 32)).astype(np.float32)
    # normalized corpus (the global-scale target case)
    c = rng.normal(size=(300, 32)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    values, scale = quantize_corpus(c, per_row=False)
    assert scale.ndim == 0
    vals, idx = quantized_blocked_topk(
        jnp.asarray(q), jnp.asarray(values), jnp.asarray(scale), k=10,
        block_size=128, approx=False,
    )
    _, ref_idx = _numpy_topk(q, c, 10)
    for qi in range(5):
        overlap = len(set(np.asarray(idx)[qi]) & set(ref_idx[qi]))
        assert overlap >= 9, overlap
    # rescaled values close to true scores
    true_vals = np.take_along_axis(q @ c.T, np.asarray(idx), axis=1)
    np.testing.assert_allclose(np.asarray(vals), true_vals, atol=0.05)

    # sharded variant with scalar scales
    mesh = make_mesh()
    c8 = rng.normal(size=(8 * 40, 32)).astype(np.float32)
    c8 /= np.linalg.norm(c8, axis=1, keepdims=True)
    v8, s8 = quantize_corpus(c8, per_row=False)
    vals8, idx8 = sharded_quantized_topk(
        jnp.asarray(q), jnp.asarray(v8), jnp.asarray(s8), k=5, mesh=mesh,
        block_size=40, approx=False,
    )
    _, ref8 = _numpy_topk(q, c8, 5)
    for qi in range(5):
        assert len(set(np.asarray(idx8)[qi]) & set(ref8[qi])) >= 4


def test_sharded_f16_scan_matches_single_device(rng, eight_devices):
    """sharded_f16_scan_topk: per-chip scan + ICI merge == single-device scan
    (exact mode so CPU results are deterministic)."""
    from matchmaker_tpu.ops.mips_f16 import f16_scan_topk, sharded_f16_scan_topk
    from matchmaker_tpu.parallel.mesh import make_mesh

    n, d, k = 2048, 32, 20
    corpus = jnp.asarray(rng.normal(size=(n, d)).astype(np.float16))
    queries = jnp.asarray(rng.normal(size=(8, d)).astype(np.float32))
    mesh = make_mesh()

    v1, i1 = jax.jit(lambda q, c: f16_scan_topk(q, c, k, block_size=256, approx=False))(queries, corpus)
    v8, i8 = jax.jit(lambda q, c: sharded_f16_scan_topk(
        q, c, k, mesh=mesh, block_size=128, approx=False))(queries, corpus)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i8))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v8), rtol=1e-3)


def test_topk_k_larger_than_block_size(rng):
    """Regression: per-block top-k width must clamp to the block (k or
    oversample*k > block_size used to crash at trace time)."""
    from matchmaker_tpu.ops.mips_f16 import f16_scan_topk
    from matchmaker_tpu.ops.mips_twostage import twostage_exact_topk

    n, d, k = 512, 16, 100
    corpus = rng.normal(size=(n, d)).astype(np.float32)
    queries = corpus[:4]
    values, scale = quantize_corpus(corpus, per_row=False)

    # k > block_size on the quantized scan
    vals, idx = quantized_blocked_topk(
        jnp.asarray(queries), jnp.asarray(values), jnp.asarray(scale), k,
        block_size=64, approx=False,
    )
    assert vals.shape == (4, k)
    exact = np.argsort(-(queries @ corpus.T), axis=1)[:, :k]
    assert len(set(map(int, np.asarray(idx)[0])) & set(map(int, exact[0]))) >= k - 2

    # oversample*k > block_size on the two-stage path
    vals2, idx2 = twostage_exact_topk(
        jnp.asarray(queries), jnp.asarray(values), jnp.asarray(scale), k,
        oversample=4, block_size=64, rescore_corpus=jnp.asarray(corpus.astype(np.float16)),
    )
    assert vals2.shape == (4, k)

    # k > block_size on the f16 scan
    vals3, idx3 = f16_scan_topk(
        jnp.asarray(queries), jnp.asarray(corpus.astype(np.float16)), k,
        block_size=64, approx=False,
    )
    assert vals3.shape == (4, k)
    assert len(set(map(int, np.asarray(idx3)[0])) & set(map(int, exact[0]))) >= k - 2


def test_binmax_pallas_matches_jnp():
    """Fused bin-max candidate kernel (interpret mode) vs the jnp reference:
    identical packed lane bits, values within 1 ULP; top-k over the
    candidates nearly matches exact."""
    from matchmaker_tpu.ops.mips_binmax import (
        binmax_candidates,
        binmax_candidates_jnp,
        binmax_scan_topk,
        unpack_candidates,
    )

    rng = np.random.default_rng(7)  # own rng: session rng state depends on test order
    n, d, q = 3000, 32, 7  # non-multiple of tile_rows → padding path
    corpus = jnp.asarray(rng.normal(size=(n, d)).astype(np.float16))
    queries = jnp.asarray(rng.normal(size=(q, d)).astype(np.float32))

    p1 = binmax_candidates(queries, corpus, interpret=True, tile_rows=512)
    p2 = binmax_candidates_jnp(queries, corpus, tile_rows=512)
    cols = jnp.broadcast_to(jnp.arange(p1.shape[1]), p1.shape)
    v1, i1 = map(np.asarray, unpack_candidates(p1, cols, 512, 2))
    v2, i2 = map(np.asarray, unpack_candidates(p2, cols, 512, 2))
    # ids exactly equal; values may differ by 1 ULP (matmul association in
    # interpret mode vs XLA scan)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(v1, v2, rtol=1e-6)

    # ids in range, padding rows never returned with finite score
    finite = np.isfinite(v1)
    assert i1[finite].max() < n
    # unpacked values track the true f32 scores within bf16-input noise
    # (the mantissa packing itself only perturbs by <= 2^-17 relative)
    true = np.asarray(queries) @ np.asarray(corpus, np.float32).T
    sel = i1[finite]
    qi = np.broadcast_to(np.arange(q)[:, None], i1.shape)[finite]
    np.testing.assert_allclose(v1[finite], true[qi, sel], rtol=2e-2)

    # candidate top-k ≈ exact top-k when bins >> k (24 bins x2 candidates;
    # k=8 over 24 bins loses a doc only on a ≥3-collision — allow 2 slips)
    k = 8
    tv, ti = binmax_scan_topk(queries, corpus, k=k, tile_rows=512, use_pallas=False)
    exact = np.argsort(-(np.asarray(queries) @ np.asarray(corpus, np.float32).T), axis=1)[:, :k]
    for qi in range(q):
        assert len(set(map(int, np.asarray(ti)[qi])) & set(map(int, exact[qi]))) >= k - 2


def test_binmax_per_bin_dedup():
    """Per-bin rank-2 candidates are distinct positions within the bin."""
    from matchmaker_tpu.ops.mips_binmax import binmax_candidates_jnp, unpack_candidates

    rng = np.random.default_rng(8)
    corpus = jnp.asarray(rng.normal(size=(512, 16)).astype(np.float16))
    queries = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    packed = binmax_candidates_jnp(queries, corpus, tile_rows=256)
    cols = jnp.broadcast_to(jnp.arange(packed.shape[1]), packed.shape)
    vals, ids = unpack_candidates(packed, cols, 256, 2)
    # layout: per tile, nb rank-0 rows then nb rank-1 rows (module docstring);
    # all--inf padded bins (the grain padding) legitimately repeat lane 0
    nb = 256 // 128
    ids = np.asarray(ids).reshape(4, -1, 2, nb)
    finite = np.isfinite(np.asarray(vals)).reshape(4, -1, 2, nb)
    both = finite[:, :, 0, :] & finite[:, :, 1, :]
    assert both.any()
    assert (ids[:, :, 0, :][both] != ids[:, :, 1, :][both]).all()


def test_sharded_binmax_matches_single_device(eight_devices):
    """sharded_binmax_topk == single-device binmax over the same corpus,
    including the in-shard padding masks (shard_rows not a tile multiple)."""
    from matchmaker_tpu.ops.mips_binmax import binmax_scan_topk, sharded_binmax_topk
    from matchmaker_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(9)
    n, d, k = 8 * 384, 32, 16  # 384 rows/shard → pads to 512 inside each shard
    corpus = jnp.asarray(rng.normal(size=(n, d)).astype(np.float16))
    queries = jnp.asarray(rng.normal(size=(8, d)).astype(np.float32))
    mesh = make_mesh()

    v1, i1 = jax.jit(lambda q, c: binmax_scan_topk(q, c, k, tile_rows=512, use_pallas=False))(
        queries, corpus)
    v8, i8 = jax.jit(lambda q, c: sharded_binmax_topk(
        q, c, k, mesh=mesh, tile_rows=512, use_pallas=False))(queries, corpus)
    assert np.asarray(i8).max() < n
    # same candidate math → identical id sets per query (order can differ on ties)
    for qi in range(8):
        assert set(map(int, np.asarray(i1)[qi])) == set(map(int, np.asarray(i8)[qi]))
    np.testing.assert_allclose(np.sort(np.asarray(v1), 1), np.sort(np.asarray(v8), 1), rtol=1e-5)


def test_flat_index_binmax_kernel(eight_devices):
    """FlatIndex with mips_kernel=binmax: small corpus routes to the exact
    scan fallback; a bin-sized corpus uses the fused candidate path. Both
    return correct ids on the 8-device mesh."""
    from matchmaker_tpu.parallel.mesh import make_mesh
    from matchmaker_tpu.retrieval.indexes import FlatIndex

    rng = np.random.default_rng(11)
    # gate is on the REAL row count at k=5: 160 rows (8 candidates max < 40)
    # must route to the exact fallback; 16384 rows pass; 80k rows exercise
    # binmax with a padded tail (80000 → 131072 on the 8-device mesh: 51072
    # zero rows, 3 fully-padded shards).
    for n in (160, 8 * 2048, 80_000):
        index = FlatIndex(
            {"token_dtype": "float16", "mips_quantization": "float16",
             "mips_kernel": "binmax"}, make_mesh(),
        )
        vectors = rng.normal(size=(n, 24)).astype(np.float32)
        vectors /= np.linalg.norm(vectors, axis=1, keepdims=True)
        ids = np.array([f"d{i}" for i in range(n)])
        index.prepare(24)
        index.index(ids, vectors)
        q = vectors[[3, n - 5]]
        scores, got = index.search(q, 5)
        # every slot is a real doc: no -1/"" sentinel, no -inf score (the
        # padded corpus buffer must never leak into results)
        assert np.isfinite(scores).all(), (n, scores)
        assert all(g != "" for row in got for g in row), (n, got)
        # self-retrieval at score 1.0 must rank top
        assert "d3" in set(got[0]) and f"d{n-5}" in set(got[1]), (n, got)
        # exact-fallback geometry: must match brute force exactly
        if n == 160:
            f16 = vectors.astype(np.float16).astype(np.float32)
            brute = np.argsort(-(q @ f16.T), axis=1)[:, :5]
            for r in range(2):
                assert set(got[r]) == {f"d{i}" for i in brute[r]}, (n, got)


def test_binmax_query_chunking_matches_jnp():
    """Q > q_chunk runs as lax.map over query chunks (VMEM-bounded — the
    ColBERT per-token search path); candidates identical to the jnp path."""
    from matchmaker_tpu.ops.mips_binmax import binmax_candidates, binmax_candidates_jnp

    rng = np.random.default_rng(3)
    n, d, q = 2048, 32, 300  # 300 queries, q_chunk=128 → 3 chunks
    corpus = jnp.asarray(rng.normal(size=(n, d)).astype(np.float16))
    queries = jnp.asarray(rng.normal(size=(q, d)).astype(np.float32))
    p1 = binmax_candidates(queries, corpus, interpret=True, tile_rows=512, q_chunk=128)
    p2 = binmax_candidates_jnp(queries, corpus, tile_rows=512)
    b1 = np.asarray(p1).view(np.int32)
    b2 = np.asarray(p2).view(np.int32)
    # identical lane bits; values within 1 ULP of each other
    np.testing.assert_array_equal(b1 & 127, b2 & 127)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-6)


def test_binmax_level2_tournament():
    """Level-2 tournament (16x sort-width cut): pallas-interpret == jnp
    candidates, ids decode through both packed lanes, recall matches the
    single-level path."""
    from matchmaker_tpu.ops.mips_binmax import (
        binmax_candidates,
        binmax_candidates_jnp,
        binmax_scan_topk,
    )

    rng = np.random.default_rng(12)
    # C = 131072/128*2 = 2048 candidates → TWO level-2 blocks (cross-block
    # layout exercised) and the scan_topk gate (C >= 128*k for k=8) active
    n, d, q, k = 131072, 24, 5, 8
    corpus = jnp.asarray(rng.normal(size=(n, d)).astype(np.float16))
    queries = jnp.asarray(rng.normal(size=(q, d)).astype(np.float32))

    for bw, exp_cols in ((128, 2048 // 128 * 8), (32, 2048 // 32 * 8)):
        p1 = binmax_candidates(queries, corpus, interpret=True, tile_rows=512, level2=bw)
        p2 = binmax_candidates_jnp(queries, corpus, tile_rows=512, level2=bw)
        assert p1.shape == p2.shape and p1.shape[1] == exp_cols, (bw, p1.shape)
        np.testing.assert_array_equal(
            np.asarray(p1).view(np.int32) & 0x3FFF, np.asarray(p2).view(np.int32) & 0x3FFF
        )
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-6)

    # end-to-end with the tournament gates ACTIVE (verify via the gate math):
    # ids must match brute force. n=131072 → wide (keep-8/128); the smaller
    # corpus below lands in the mid band (keep-8/32).
    n_cands = n // 128 * 2
    assert n_cands >= 128 * k, "wide gate must be active for this test"
    small = corpus[:8192]
    assert 16 * k <= 8192 // 128 * 2 < 128 * k, "mid gate must be active"
    for corp, nn in ((corpus, n), (small, 8192)):
        ex = np.argsort(-(np.asarray(queries) @ np.asarray(corp, np.float32).T), axis=1)[:, :k]
        for use_pallas, kwargs in ((False, {}), (True, {"interpret": True})):
            vals, ids = binmax_scan_topk(
                queries, corp, k=k, tile_rows=512, use_pallas=use_pallas, **kwargs)
            for qi in range(q):
                got = set(map(int, np.asarray(ids)[qi]))
                assert len(got & set(map(int, ex[qi]))) >= k - 2, (nn, use_pallas, qi)
            assert np.asarray(ids).max() < nn


def test_binmax_int8_pallas_matches_jnp():
    """Int8 binmax kernel (interpret mode) vs the jnp int8 reference: same
    packed lane bits; unpacked values track true f32 scores within int8
    quantization noise; top-k near-exact."""
    from matchmaker_tpu.ops.mips_binmax import (
        binmax_candidates,
        binmax_candidates_jnp,
        binmax_scan_topk,
        unpack_candidates,
    )
    from matchmaker_tpu.ops.mips_quant import quantize_corpus_binwise

    rng = np.random.default_rng(21)
    n, d, q, k = 3000, 32, 7, 8  # padding path (3000 % grain != 0)
    corpus_f = rng.normal(size=(n, d)).astype(np.float32)
    values, bscales = quantize_corpus_binwise(corpus_f)  # pads to 3072
    corpus = jnp.asarray(values)
    cscales = jnp.asarray(bscales)
    queries_f = rng.normal(size=(q, d)).astype(np.float32)
    q_scale = np.maximum(np.abs(queries_f).max(axis=1, keepdims=True) / 127.0, 1e-10)
    q_int = jnp.asarray(np.clip(np.round(queries_f / q_scale), -127, 127).astype(np.int8))
    qs = jnp.asarray(q_scale.astype(np.float32))

    p1 = binmax_candidates(q_int, corpus, interpret=True, tile_rows=512, n_valid=n,
                           corpus_scales=cscales, query_scales=qs)
    p2 = binmax_candidates_jnp(q_int, corpus, tile_rows=512, n_valid=n,
                               corpus_scales=cscales, query_scales=qs)
    cols = jnp.broadcast_to(jnp.arange(p1.shape[1]), p1.shape)
    v1, i1 = map(np.asarray, unpack_candidates(p1, cols, 512, 2))
    v2, i2 = map(np.asarray, unpack_candidates(p2, cols, 512, 2))
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(v1, v2, rtol=1e-6)

    finite = np.isfinite(v1)
    assert i1[finite].max() < n
    # values approximate the true f32 dot within int8 noise (both sides
    # quantized: ~1% relative on N(0,1) vectors at d=32)
    true = queries_f @ corpus_f.T
    sel = i1[finite]
    qi = np.broadcast_to(np.arange(q)[:, None], i1.shape)[finite]
    np.testing.assert_allclose(v1[finite], true[qi, sel], rtol=0.1, atol=0.15)

    # scan_topk quantizes float queries itself; near-exact top-k
    tv, ti = binmax_scan_topk(jnp.asarray(queries_f), corpus, k=k, tile_rows=512,
                              n_valid=n, use_pallas=False, corpus_scales=cscales)
    exact = np.argsort(-true, axis=1)[:, :k]
    for r in range(q):
        assert len(set(map(int, np.asarray(ti)[r])) & set(map(int, exact[r]))) >= k - 2


def test_sharded_binmax_int8_matches_single_device(eight_devices):
    """Int8 sharded binmax == single-device int8 binmax (scales shard with
    the rows; in-shard padding masked)."""
    from matchmaker_tpu.ops.mips_binmax import binmax_scan_topk, sharded_binmax_topk
    from matchmaker_tpu.ops.mips_quant import quantize_corpus_binwise
    from matchmaker_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(22)
    n, d, k = 8 * 384, 32, 16
    corpus_f = rng.normal(size=(n, d)).astype(np.float32)
    values, bscales = quantize_corpus_binwise(corpus_f)
    corpus = jnp.asarray(values)
    cscales = jnp.asarray(bscales)
    queries = jnp.asarray(rng.normal(size=(8, d)).astype(np.float32))
    mesh = make_mesh()

    v1, i1 = jax.jit(lambda q, c, s: binmax_scan_topk(
        q, c, k, tile_rows=512, use_pallas=False, corpus_scales=s))(
        queries, corpus, cscales)
    v8, i8 = jax.jit(lambda q, c, s: sharded_binmax_topk(
        q, c, k, mesh=mesh, tile_rows=512, use_pallas=False, corpus_scales=s))(
        queries, corpus, cscales)
    assert np.asarray(i8).max() < n
    for r in range(8):
        assert set(map(int, np.asarray(i1)[r])) == set(map(int, np.asarray(i8)[r]))
    np.testing.assert_allclose(np.sort(np.asarray(v1), 1), np.sort(np.asarray(v8), 1), rtol=1e-5)


def test_flat_index_int8_binmax(eight_devices):
    """FlatIndex mips_quantization=int8 + mips_kernel=binmax: the int8 fused
    path (default engine) returns correct ids on the 8-device mesh; small
    corpora fall back to the exact int8 scan."""
    from matchmaker_tpu.parallel.mesh import make_mesh
    from matchmaker_tpu.retrieval.indexes import FlatIndex

    rng = np.random.default_rng(23)
    for n in (160, 8 * 2048):
        index = FlatIndex(
            {"token_dtype": "float16", "mips_quantization": "int8",
             "mips_kernel": "binmax"}, make_mesh(),
        )
        vectors = rng.normal(size=(n, 24)).astype(np.float32)
        vectors /= np.linalg.norm(vectors, axis=1, keepdims=True)
        ids = np.array([f"d{i}" for i in range(n)])
        index.prepare(24)
        index.index(ids, vectors)
        q = vectors[[3, n - 5]]
        scores, got = index.search(q, 5)
        assert np.isfinite(scores).all(), (n, scores)
        assert all(g != "" for row in got for g in row), (n, got)
        # self-retrieval at cosine 1.0 survives int8 quantization
        assert "d3" in set(got[0]) and f"d{n-5}" in set(got[1]), (n, got)


def test_binmax_mixed_pallas_matches_jnp():
    """Mixed int8-corpus/bf16-query kernel (interpret mode) vs the jnp mixed
    reference: identical packed bits; scores match the f32 query x
    dequantized-codes dot to bf16 rounding (NO query-quantization noise —
    the selection itself runs at rescore precision)."""
    from matchmaker_tpu.ops.mips_binmax import (
        binmax_candidates,
        binmax_candidates_jnp,
        binmax_scan_topk,
        unpack_candidates,
    )
    from matchmaker_tpu.ops.mips_quant import quantize_corpus_binwise

    rng = np.random.default_rng(31)
    n, d, q, k = 3000, 32, 7, 8  # padding path (3000 % grain != 0)
    corpus_f = rng.normal(size=(n, d)).astype(np.float32)
    values, bscales = quantize_corpus_binwise(corpus_f)  # pads to 3072
    corpus = jnp.asarray(values)
    cscales = jnp.asarray(bscales)
    queries = jnp.asarray(rng.normal(size=(q, d)).astype(np.float32))

    # query_scales omitted → mixed mode in both implementations
    p1 = binmax_candidates(queries, corpus, interpret=True, tile_rows=512,
                           n_valid=n, corpus_scales=cscales)
    p2 = binmax_candidates_jnp(queries, corpus, tile_rows=512, n_valid=n,
                               corpus_scales=cscales)
    cols = jnp.broadcast_to(jnp.arange(p1.shape[1]), p1.shape)
    v1, i1 = map(np.asarray, unpack_candidates(p1, cols, 512, 2))
    v2, i2 = map(np.asarray, unpack_candidates(p2, cols, 512, 2))
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(v1, v2, rtol=1e-6)

    finite = np.isfinite(v1)
    assert i1[finite].max() < n
    # scores equal the f32 query x dequantized-codes dot within bf16
    # rounding + mantissa packing (~2^-7 relative) — NOT int8 query noise
    dequant = (np.asarray(values, np.float32)
               * np.repeat(np.asarray(bscales)[:, 0], 128)[:, None])[:n]
    true_dq = np.asarray(queries) @ dequant.T
    sel = i1[finite]
    qi = np.broadcast_to(np.arange(q)[:, None], i1.shape)[finite]
    np.testing.assert_allclose(v1[finite], true_dq[qi, sel], rtol=2e-2)

    # scan_topk mixed: near-exact top-k vs the UNQUANTIZED f32 scores —
    # only corpus code noise remains
    true = np.asarray(queries) @ corpus_f.T
    tv, ti = binmax_scan_topk(queries, corpus, k=k, tile_rows=512, n_valid=n,
                              use_pallas=False, corpus_scales=cscales,
                              mixed_queries=True)
    exact = np.argsort(-true, axis=1)[:, :k]
    for r in range(q):
        assert len(set(map(int, np.asarray(ti)[r])) & set(map(int, exact[r]))) >= k - 2


def test_flat_index_int8_mixed_queries(eight_devices):
    """FlatIndex mips_int8_queries=float routes to the mixed kernel on the
    mesh (sharded_binmax_topk mixed_queries=True) and returns correct ids."""
    from matchmaker_tpu.parallel.mesh import make_mesh
    from matchmaker_tpu.retrieval.indexes import FlatIndex

    rng = np.random.default_rng(33)
    n = 8 * 2048
    index = FlatIndex(
        {"token_dtype": "float16", "mips_quantization": "int8",
         "mips_kernel": "binmax", "mips_int8_queries": "float"}, make_mesh(),
    )
    vectors = rng.normal(size=(n, 24)).astype(np.float32)
    vectors /= np.linalg.norm(vectors, axis=1, keepdims=True)
    ids = np.array([f"d{i}" for i in range(n)])
    index.prepare(24)
    index.index(ids, vectors)
    q = vectors[[3, n - 5]]
    scores, got = index.search(q, 5)
    assert np.isfinite(scores).all(), scores
    assert "d3" in set(got[0]) and f"d{n-5}" in set(got[1]), got


def test_binmax_rescore_recovers_exact_ranking():
    """binmax_rescore_topk: the int8 binmax scan's ranking error (double
    quantization + 7-bit mantissa packing) is undone by the exact-rescore
    stage — the returned top-k must equal the exact f32-query x
    dequantized-int8-corpus ranking over the fetched candidates, and beat
    the plain int8 scan's overlap with the true f32 top-k."""
    from matchmaker_tpu.ops.mips_binmax import binmax_rescore_topk, binmax_scan_topk
    from matchmaker_tpu.ops.mips_quant import quantize_corpus_binwise

    rng = np.random.default_rng(21)
    # k small vs the bin count (n/128 = 64 bins, per_bin=2 → 128 candidates):
    # at k comparable to the bin count the >=3-per-bin CANDIDATE loss
    # dominates, which the rescore stage cannot (and should not) fix
    n, d, k = 8192, 64, 8
    corpus = rng.normal(size=(n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.normal(size=(6, d)).astype(np.float32)
    v8_np, bs_np = quantize_corpus_binwise(corpus)
    v8, bs = jnp.asarray(v8_np), jnp.asarray(bs_np)
    q = jnp.asarray(queries)

    vals, idx = binmax_rescore_topk(
        q, v8, bs, k, oversample=4, tile_rows=512, use_pallas=False)
    assert vals.shape == (6, k) and idx.shape == (6, k)
    idx = np.asarray(idx)
    assert (idx >= 0).all() and idx.max() < n

    # returned scores must be the dequantized dots of the returned ids
    # (bf16 query rounding in the rescore einsum → loose rtol)
    dequant = v8_np.astype(np.float32) * np.repeat(bs_np[:, 0], 128)[:, None]
    want = np.take_along_axis(queries @ dequant.T, idx, axis=1)
    np.testing.assert_allclose(np.asarray(vals), want, rtol=2e-2, atol=1e-3)
    # and sorted descending (a real ranking, not scan order)
    assert (np.diff(np.asarray(vals), axis=1) <= 1e-6).all()

    # rescore strictly improves (>=) overlap with the true f32 top-k
    sv, si = binmax_scan_topk(
        q, v8, k, corpus_scales=bs, tile_rows=512, use_pallas=False)
    true = np.argsort(-(queries @ corpus.T), axis=1)[:, :k]
    ov_scan = sum(len(set(np.asarray(si)[i]) & set(true[i])) for i in range(6))
    ov_resc = sum(len(set(idx[i]) & set(true[i])) for i in range(6))
    assert ov_resc >= ov_scan
    assert ov_resc >= 6 * (k - 1)  # near-exact: <=1 slip/query at 4x oversample

    # 16-bit rescore rows variant returns true-f16-dot scores
    vals2, idx2 = binmax_rescore_topk(
        q, v8, bs, k, oversample=4, tile_rows=512, use_pallas=False,
        rescore_corpus=jnp.asarray(corpus.astype(np.float16)))
    want2 = np.take_along_axis(
        queries @ corpus.astype(np.float16).astype(np.float32).T,
        np.asarray(idx2), axis=1)
    np.testing.assert_allclose(np.asarray(vals2), want2, rtol=2e-2, atol=1e-3)


def test_sharded_binmax_rescore_matches_single_device(eight_devices):
    """sharded_binmax_rescore_topk == single-device rescore over the same
    corpus, including tail-shard padding (n_valid < padded rows)."""
    from matchmaker_tpu.ops.mips_binmax import (
        binmax_rescore_topk,
        sharded_binmax_rescore_topk,
    )
    from matchmaker_tpu.ops.mips_quant import quantize_corpus_binwise
    from matchmaker_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(22)
    n_real, d, k = 8 * 512 - 300, 32, 16  # tail shard only partially filled
    n_pad = 8 * 512
    corpus = rng.normal(size=(n_real, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    padded = np.zeros((n_pad, d), np.float32)
    padded[:n_real] = corpus
    v8_np, bs_np = quantize_corpus_binwise(padded)
    v8, bs = jnp.asarray(v8_np), jnp.asarray(bs_np)
    queries = jnp.asarray(rng.normal(size=(5, d)).astype(np.float32))
    mesh = make_mesh()

    v1, i1 = jax.jit(lambda q, v, s: binmax_rescore_topk(
        q, v, s, k, n_valid=n_real, tile_rows=512, use_pallas=False))(queries, v8, bs)
    v8v, i8v = jax.jit(lambda q, v, s: sharded_binmax_rescore_topk(
        q, v, s, k, mesh=mesh, n_valid=n_real, tile_rows=512,
        use_pallas=False))(queries, v8, bs)
    i1, i8v = np.asarray(i1), np.asarray(i8v)
    assert i8v.max() < n_real and (i8v >= 0).all()
    for qi in range(5):
        assert set(map(int, i1[qi])) == set(map(int, i8v[qi]))
    np.testing.assert_allclose(
        np.sort(np.asarray(v1), 1), np.sort(np.asarray(v8v), 1), rtol=1e-5)


def test_flat_index_int8_binmax_twostage(eight_devices):
    """FlatIndex mips_quantization=int8 + mips_kernel=binmax + mips_twostage:
    the production ScaNN-shaped engine (binmax candidates at per_bin>=4 +
    exact rescore) returns a near-exact ranking on the 8-device mesh, for
    both rescore dtypes (int8 codes / 16-bit rows)."""
    from matchmaker_tpu.parallel.mesh import make_mesh
    from matchmaker_tpu.retrieval.indexes import FlatIndex

    rng = np.random.default_rng(29)
    n, d, k = 8 * 2048, 24, 10
    vectors = rng.normal(size=(n, d)).astype(np.float32)
    vectors /= np.linalg.norm(vectors, axis=1, keepdims=True)
    ids = np.array([f"d{i}" for i in range(n)])
    true = np.argsort(-(vectors[[3, n - 5]] @ vectors.T), axis=1)[:, :k]
    for dtype in ("int8", "float16"):
        index = FlatIndex(
            {"token_dtype": "float16", "mips_quantization": "int8",
             "mips_kernel": "binmax", "mips_twostage": True,
             "mips_rescore_dtype": dtype}, make_mesh(),
        )
        index.prepare(d)
        index.index(ids, vectors)
        scores, got = index.search(vectors[[3, n - 5]], k)
        assert np.isfinite(scores).all(), (dtype, scores)
        # descending ranking with self-retrieval on top
        assert got[0][0] == "d3" and got[1][0] == f"d{n-5}", (dtype, got)
        assert (np.diff(scores, axis=1) <= 1e-6).all(), dtype
        # near-exact: the rescored top-k overlaps the true f32 top-k
        for qi in range(2):
            want = {f"d{j}" for j in true[qi]}
            assert len(set(got[qi]) & want) >= k - 1, (dtype, qi, got[qi])
