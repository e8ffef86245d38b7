"""Pinned recall floors for the default production search engine (binmax).

The fused bin-max kernel (ops/mips_binmax.py) is FlatIndex's default
``mips_kernel`` and what ``faiss_index_type: scann`` maps to; its recall
envelope is a product guarantee (PARITY.md documents 0.9967@1000 at 1.11M
rows).  These tests pin that envelope on fixed-seed CLUSTERED corpora — the
adversarial shape for this engine: clustered data concentrates top-k members
in few corpus regions (bin-collision pressure) and pushes deep-rank scores
negative (so any zero-padding leak displaces real hits, the exact artifact
behind round 1's wrong parity line and round 2's order-dependent flake).

Every geometry runs through FlatIndex on the 8-device CPU mesh — the same
entry point production uses — so the gate logic (exact fallback, per_bin
sizing, tournament level) is exercised, not bypassed.
"""

import numpy as np
import pytest

from matchmaker_tpu.parallel.mesh import make_mesh
from matchmaker_tpu.retrieval.indexes import FlatIndex


def _clustered_corpus(n, d, n_clusters, seed):
    """Normalized clustered vectors with contiguous cluster blocks (encode
    order is corpus-file order, which is typically topical)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = np.sort(rng.integers(0, n_clusters, size=n))
    vecs = centers[assign] + 0.35 * rng.normal(size=(n, d))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return vecs.astype(np.float32)


def _recall_at_k(got_ids, exact_ids, k):
    per_q = [
        len(set(map(int, got_ids[i][:k])) & set(map(int, exact_ids[i][:k]))) / k
        for i in range(len(got_ids))
    ]
    return float(np.mean(per_q))


def _run_flat(vectors, queries, k):
    index = FlatIndex(
        {"token_dtype": "float16", "mips_quantization": "float16",
         "mips_kernel": "binmax"}, make_mesh(),
    )
    index.prepare(vectors.shape[1])
    index.index(np.arange(len(vectors)), vectors)
    scores, ids = index.search(queries, k)
    return scores, ids


# (rows, k, pinned recall floor vs the f16-exact ranking).  Floors sit a
# couple of points under the measured values so noise doesn't flake, but
# far above every known failure mode (the round-2 flake measured <0.95 at
# the 4096/20 geometry; the padding leak drove tail recall toward 0.6).
GEOMETRIES = [
    (4_096, 20, 0.97),      # the round-2 flake geometry (pool 256, per_bin 8)
    (4_096, 100, 0.99),     # gate: pool 256 < 800 → exact fallback
    (16_384, 100, 0.97),    # per_bin 8, no tournament
    (70_000, 1_000, 0.99),  # pool 4368 < 8000 → exact fallback, heavy padding
    (131_072, 1_000, 0.95), # per_bin 8, padded tail shard, no tournament
]


@pytest.mark.parametrize("n,k,floor", GEOMETRIES)
def test_binmax_recall_floor(n, k, floor, eight_devices):
    d = 64
    vectors = _clustered_corpus(n, d, n_clusters=max(8, n // 2048), seed=1234 + n)
    rng = np.random.default_rng(99)
    queries = vectors[rng.integers(0, n, 16)] + 0.05 * rng.normal(size=(16, d)).astype(np.float32)
    queries = (queries / np.linalg.norm(queries, axis=1, keepdims=True)).astype(np.float32)

    f16 = vectors.astype(np.float16).astype(np.float32)
    exact = np.argsort(-(queries @ f16.T), axis=1)[:, :k]

    scores, ids = _run_flat(vectors, queries, k)
    # padding must never leak: every slot is a real row with a finite score
    assert np.isfinite(scores).all(), (n, k)
    assert (ids >= 0).all() and (ids < n).all(), (n, k)
    rec = _recall_at_k(ids, exact, k)
    assert rec >= floor, f"recall@{k}={rec:.4f} < {floor} at n={n}"


@pytest.mark.slow
def test_binmax_recall_floor_1m(eight_devices):
    """Mid-tournament geometry (keep-8/32): pool ≥ 16k at 1M rows."""
    n, d, k = 1_048_576, 48, 1_000
    vectors = _clustered_corpus(n, d, n_clusters=512, seed=7)
    rng = np.random.default_rng(99)
    queries = vectors[rng.integers(0, n, 8)]
    f16 = vectors.astype(np.float16).astype(np.float32)
    exact = np.argsort(-(queries @ f16.T), axis=1)[:, :k]
    scores, ids = _run_flat(vectors, queries, k)
    assert np.isfinite(scores).all()
    rec = _recall_at_k(ids, exact, k)
    assert rec >= 0.95, f"recall@1000={rec:.4f}"


def test_binmax_negative_tail_padding(eight_devices):
    """Corpus engineered so EVERY query's true top-k scores are negative:
    any zero-padding leak would sweep the whole result list.  10k real rows
    pad to 65536 on the 8-device mesh (7 fully-padded shards)."""
    n, d, k = 10_000, 32, 200
    rng = np.random.default_rng(5)
    # corpus in the +e0 half-space, queries in the -e0 direction → every
    # (query, doc) score is negative
    vectors = rng.normal(size=(n, d)).astype(np.float32)
    vectors[:, 0] = np.abs(vectors[:, 0]) + 6.0
    vectors /= np.linalg.norm(vectors, axis=1, keepdims=True)
    queries = rng.normal(size=(8, d)).astype(np.float32)
    queries[:, 0] = -np.abs(queries[:, 0]) - 8.0
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    f16 = vectors.astype(np.float16).astype(np.float32)
    true_scores = queries @ f16.T
    assert (np.sort(true_scores, axis=1)[:, -k:] < 0).all(), "fixture must be all-negative"
    exact = np.argsort(-true_scores, axis=1)[:, :k]

    scores, ids = _run_flat(vectors, queries, k)
    assert np.isfinite(scores).all()
    assert (scores < 0).all(), "a 0.0 score can only be a leaked padding row"
    rec = _recall_at_k(ids, exact, k)
    assert rec >= 0.97, f"recall@{k}={rec:.4f}"
