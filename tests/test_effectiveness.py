"""End-to-end effectiveness regression at scale (VERDICT r2 next-7).

Drives the one-command harness (cli/effectiveness_check.py): planted-
relevance corpus at 100k docs → train BERT_DOT → encode → binmax index →
full-corpus search → MRR@10 / recall floors. The planted construction has a
known MRR ceiling of 1.0, so these floors pin the whole pipeline — trainer,
encoder, index recall, search aggregation, metrics — in one assertion.

The real-data counterpart (MS MARCO, MRR@10 ≥ 0.34) is documented as a
runbook in docs/msmarco_runbook.md for data-equipped environments.
"""

import json

import numpy as np
import pytest


@pytest.mark.slow
def test_planted_effectiveness_100k(tmp_path, eight_devices):
    from matchmaker_tpu.cli.effectiveness_check import run_check

    out = run_check(
        str(tmp_path), n_docs=100_000, n_train_queries=600,
        n_eval_queries=60, epochs=4,
    )
    assert out["QueriesRanked"] == 60
    # floors sit under the measured values (MRR ~0.9 at 3k docs; the 100k
    # corpus only adds lexically-disjoint noise distractors, so a healthy
    # pipeline stays close to the ceiling)
    assert out["MRR@10"] >= 0.70, out
    assert out["Recall@100"] >= 0.85, out


def test_effectiveness_harness_small(tmp_path, eight_devices):
    """Fast harness smoke: the full train→encode→index→search→metrics chain
    produces a ranking far above random on a 1500-doc corpus."""
    from matchmaker_tpu.cli.effectiveness_check import run_check

    out = run_check(
        str(tmp_path), n_docs=1500, n_train_queries=150,
        n_eval_queries=20, epochs=6,
    )
    assert out["QueriesRanked"] == 20
    assert out["MRR@10"] >= 0.5, out
