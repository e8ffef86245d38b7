"""IR metric engine tests: hand-computed goldens + parity fuzz vs the reference
implementation (loaded from /root/reference when mounted, skipped otherwise)."""

import importlib.util
import os
import sys

import numpy as np
import pytest

from matchmaker_tpu.metrics import (
    calculate_metrics_plain,
    calculate_metrics_along_candidate_depth,
    unrolled_to_ranked_result,
    load_qrels,
    load_ranking,
)

REFERENCE = "/root/reference/matchmaker/utils/core_metrics.py"


def test_unrolled_to_ranked_result():
    unrolled = {"q1": [("d1", 0.2), ("d2", 0.9), ("d3", 0.5)]}
    assert unrolled_to_ranked_result(unrolled) == {"q1": ["d2", "d3", "d1"]}


def test_plain_metrics_hand_computed():
    # q1: relevant doc at rank 2 → MRR 0.5; q2: relevant at rank 1 → MRR 1.0
    ranking = {"q1": ["d1", "d2", "d3"], "q2": ["d4", "d5"]}
    qrels = {"q1": {"d2": 1.0}, "q2": {"d4": 1.0, "d9": 1.0}}
    m = calculate_metrics_plain(ranking, qrels)
    assert m["MRR@10"] == pytest.approx((0.5 + 1.0) / 2)
    assert m["Recall@10"] == pytest.approx((1.0 + 0.5) / 2)
    assert m["QueriesRanked"] == 2
    assert m["QueriesWithRelevant@10"] == 2
    assert m["MAP@1000"] == pytest.approx((0.5 + 0.5) / 2)
    # graded nDCG: q1 dcg = 1/log2(3), idcg = 1/log2(2)
    expected_ndcg_q1 = (1 / np.log2(3)) / 1.0
    expected_ndcg_q2 = (1 / np.log2(2)) / (1 / np.log2(2) + 1 / np.log2(3))
    assert m["nDCG@10"] == pytest.approx((expected_ndcg_q1 + expected_ndcg_q2) / 2)


def test_binarization_point_excludes_low_grades():
    ranking = {"q1": ["d1", "d2"]}
    qrels = {"q1": {"d1": 0.5, "d2": 2.0}}
    m = calculate_metrics_plain(ranking, qrels, binarization_point=1.0)
    # d1 grade 0.5 < 1.0 → not binary-relevant; first relevant rank is 2
    assert m["MRR@10"] == pytest.approx(0.5)
    # but nDCG still uses the graded judgement for d1
    assert m["nDCG@10"] > 0


def test_query_without_qrels_is_skipped():
    ranking = {"q1": ["d1"], "q_unjudged": ["d2"]}
    qrels = {"q1": {"d1": 1.0}}
    m = calculate_metrics_plain(ranking, qrels)
    assert m["QueriesRanked"] == 1
    assert m["MRR@10"] == pytest.approx(1.0)


def test_candidate_depth_sweep_prunes_late_candidates():
    # reranker puts d_late (candidate rank 5) first; at depth<5 it is cut away
    ranking = {"q1": ["d_late", "d_early"]}
    qrels = {"q1": {"d_late": 1.0}}
    candidates = {"q1": {"d_late": 5, "d_early": 1}}
    sweep = calculate_metrics_along_candidate_depth(ranking, qrels, candidates, (1, 6))
    assert sweep[1]["MRR@10"] == 0.0  # d_late cut at depth 1
    assert sweep[5]["MRR@10"] == pytest.approx(1.0)  # survives at depth 5, rank 1
    assert sweep[6]["MRR@10"] == pytest.approx(1.0)


def test_io_roundtrip(tmp_path):
    qrels_file = tmp_path / "qrels.txt"
    qrels_file.write_text("q1 0 d1 1\nq1 0 d2 0\nq2 0 d3 2\n")
    qrels = load_qrels(str(qrels_file))
    assert qrels == {"q1": {"d1": 1.0}, "q2": {"d3": 2.0}}

    ranking_file = tmp_path / "run.txt"
    ranking_file.write_text("q1 d1 1 0.9\nq1 d2 2 0.5\nq2 d3 1 0.7\n")
    ranking = load_ranking(str(ranking_file))
    assert ranking == {"q1": ["d1", "d2"], "q2": ["d3"]}


# ---------------------------------------------------------------------------
# parity fuzz vs the reference implementation (behavioral ground truth)
# ---------------------------------------------------------------------------


def _load_reference_metrics():
    if not os.path.exists(REFERENCE):
        pytest.skip("reference not mounted")
    pytest.importorskip("rich")
    spec = importlib.util.spec_from_file_location("ref_core_metrics", REFERENCE)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_core_metrics"] = mod
    spec.loader.exec_module(mod)
    return mod


def _random_case(rng, n_queries=25, depth=50, n_docs=200):
    ranking, qrels, candidates = {}, {}, {}
    for qi in range(n_queries):
        qid = f"q{qi}"
        docs = [f"d{i}" for i in rng.choice(n_docs, size=depth, replace=False)]
        ranking[qid] = docs
        judged = rng.choice(n_docs, size=rng.integers(1, 8), replace=False)
        qrels[qid] = {f"d{i}": float(rng.integers(1, 4)) for i in judged}
        perm = rng.permutation(depth) + 1
        candidates[qid] = {d: int(perm[i]) for i, d in enumerate(docs)}
    return ranking, qrels, candidates


def test_plain_parity_with_reference(rng):
    ref = _load_reference_metrics()
    ranking, qrels, _ = _random_case(rng)
    ours = calculate_metrics_plain(ranking, qrels)
    theirs = ref.calculate_metrics_plain(ranking, qrels)
    for key, ref_val in theirs.items():
        assert ours[key] == pytest.approx(ref_val, abs=1e-9), key


def test_depth_sweep_parity_with_reference(rng):
    ref = _load_reference_metrics()
    ranking, qrels, candidates = _random_case(rng, n_queries=10, depth=20)
    rng_range = (1, 20)
    ours = calculate_metrics_along_candidate_depth(ranking, qrels, candidates, rng_range)
    theirs = ref.calculate_metrics_along_candidate_depth(ranking, qrels, candidates, rng_range)
    for depth in theirs:
        for key, ref_val in theirs[depth].items():
            assert ours[depth][key] == pytest.approx(ref_val, abs=1e-9), (depth, key)
