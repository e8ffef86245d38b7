"""Re-ranking evaluation: scoring loop, metric computation, result writers.

Contract: reference eval.py — ``evaluate_model`` (no-grad scoring loop with an
in-memory batch cache for repeated validation, eval.py:32-204),
``validate_model`` (metric battery incl. the cs@N candidate-depth sweep,
:242-377), ``test_model`` (:379-413), TREC-style result writer (:439-450),
metric CSV writers (:452-486).

TPU shape: the scoring loop is a single jitted apply per fixed-shape batch;
tokenized batches are cached host-side across validations (the expensive part
the reference caches is tokenization+collation too).
"""

from __future__ import annotations

import csv
import os
import time
from typing import Callable, Dict, List, Optional, Tuple

import jax
import numpy as np

from matchmaker_tpu.data.loaders import reranking_inference_loader
from matchmaker_tpu.metrics import (
    calculate_metrics_along_candidate_depth,
    calculate_metrics_plain,
    unrolled_to_ranked_result,
)
from matchmaker_tpu.obs.perf_monitor import PerformanceMonitor

# in-process cache: path -> list of (batch, qids, dids); reference eval.py:59-74
_batch_cache: Dict[str, List] = {}


def evaluate_model(
    eval_step: Callable,
    params,
    config,
    tokenizer,
    tuples_path: str,
    use_cache: bool = False,
    output_secondary: bool = False,
) -> Tuple[Dict[str, List[Tuple[str, float]]], Optional[dict]]:
    """Score all (query, doc) tuples; returns {qid: [(did, score)]}."""
    perf = PerformanceMonitor.get()
    secondary_store: Dict[str, dict] = {} if output_secondary else None

    if use_cache and tuples_path in _batch_cache:
        batches = _batch_cache[tuples_path]
    else:
        batches = reranking_inference_loader(config, tokenizer, tuples_path)
        if use_cache:
            batches = list(batches)
            _batch_cache[tuples_path] = batches

    # cross-experiment replay cache for expensive submodel tensors (IDCM's
    # per-chunk BERT scores; reference eval.py:65-74,103-153 + config
    # submodel_validation_cache_path). Order-replay: batches must arrive in the
    # same sequence as when the cache was written (deterministic loaders do).
    cache = None
    cache_write = False
    cache_path = config.get("submodel_validation_cache_path")
    if cache_path:
        from matchmaker_tpu.utils.replay_cache import CrossExperimentReplayCache

        cache_write = not os.path.exists(os.path.join(cache_path, "cache-meta.json"))
        if cache_write and jax.process_count() > 1 and jax.process_index() != 0:
            # multi-process eval runs this loop on EVERY process with the same
            # replicated tensors; only process 0 writes the cache (concurrent
            # writers would corrupt the shared block files). Non-zero
            # processes skip the cache this pass and replay it once written.
            cache_write = False
        else:
            cache = CrossExperimentReplayCache(cache_path, write=cache_write)

    results: Dict[str, List[Tuple[str, float]]] = {}
    n = 0
    perf.start_block("eval")
    for batch, qids, dids in batches:
        if cache is not None and not cache_write:
            cached = cache.get_next()
            if cached is not None:
                batch = dict(batch)
                batch["bert_part_cached"] = cached
        out = eval_step(params, batch, output_secondary)
        if cache is not None and cache_write and "passage_scores" in out:
            cache.cache(np.asarray(out["passage_scores"]))
        scores = np.asarray(out["score"])
        for i, (qid, did) in enumerate(zip(qids, dids)):
            results.setdefault(qid, []).append((did, float(scores[i])))
            n += 1
        if output_secondary and "secondary" in out:
            sec = {k: np.asarray(v) for k, v in out["secondary"].items()}
            for i, (qid, did) in enumerate(zip(qids, dids)):
                secondary_store[f"{qid}<->{did}"] = {k: v[i] for k, v in sec.items()}
    perf.stop_block("eval", n)
    if cache is not None and cache_write:
        cache.finish()
    return results, secondary_store


def validate_model(
    kind: str,  # "cont" | "end" | "test"
    eval_step,
    params,
    config,
    tokenizer,
    run_folder: str,
    validation_config: dict,
    epoch: int = -1,
    batch_number: int = -1,
    use_cache: bool = True,
) -> Tuple[Dict[str, float], float, Dict[str, List[str]]]:
    """Score + metric battery + CSV bookkeeping. Returns
    (metrics, best-metric-value, ranked results)."""
    from matchmaker_tpu.metrics import load_qrels

    results, _ = evaluate_model(
        eval_step, params, config, tokenizer, validation_config["tsv"], use_cache=use_cache
    )
    ranked = unrolled_to_ranked_result(results)
    qrels = load_qrels(validation_config["qrels"])
    binarization = validation_config.get("binarization_point", 1.0)
    metric_name = config.get("validation_metric", "MRR@10")

    candidate_set_path = validation_config.get("candidate_set_path")
    if candidate_set_path and validation_config.get("candidate_set_from_to"):
        from matchmaker_tpu.experiment import parse_candidate_set

        lo, hi = validation_config["candidate_set_from_to"]
        candidates = parse_candidate_set(candidate_set_path, hi)
        sweep = calculate_metrics_along_candidate_depth(
            ranked, qrels, candidates, (lo, hi), binarization
        )
        best_depth = max(sweep, key=lambda d: sweep[d][metric_name])
        metrics = sweep[best_depth]
        metrics["cs@n"] = best_depth
        _write_metrics_sweep_csvs(run_folder, kind, sweep, epoch, batch_number)
    else:
        metrics = calculate_metrics_plain(ranked, qrels, binarization)
        metrics["cs@n"] = "-"

    # QA answer-string eval on the top-ranked docs (reference eval.py:343-372)
    if config.get("train_qa_spans", False) and validation_config.get("qa_answers"):
        gold = read_qa_answers(validation_config["qa_answers"])
        qa_stats, predictions = qa_evaluate(
            eval_step, params, config, tokenizer, validation_config["tsv"], gold, ranked
        )
        metrics["QA/ExactMatch_TopRanked"] = qa_stats.get("QA_EM", 0.0)
        metrics["QA/F1_TopRanked"] = qa_stats.get("QA_F1", 0.0)
        save_qa_answers(predictions, gold, os.path.join(run_folder, "last-qa-output.tsv"))

    _append_metrics_csv(
        os.path.join(run_folder, f"validation-metrics-{kind}.csv"), metrics, epoch, batch_number
    )
    return metrics, float(metrics[metric_name]), ranked


def test_model(
    eval_step, params, config, tokenizer, run_folder: str, test_name: str, test_config: dict
) -> Dict[str, float]:
    """End-of-training test evaluation; writes ranked output + metrics csv
    (reference eval.py:379-413); interpretability npz when
    ``save_secondary_output`` is set (reference eval.py:415-428)."""
    want_secondary = bool(test_config.get("save_secondary_output", False))
    results, secondary = evaluate_model(
        eval_step, params, config, tokenizer, test_config["tsv"], use_cache=False,
        output_secondary=want_secondary,
    )
    ranked = unrolled_to_ranked_result(results)
    if want_secondary and secondary:
        # keep each query's top-n *ranked* docs, not the first pairs in
        # iteration order (reference save_secondary_output, eval.py:415-428)
        top_n = config.get_path("secondary_output.top_n", 100) if hasattr(config, "get_path") else 100
        limited = {}
        for qid, doc_ids in ranked.items():
            for did in doc_ids[:top_n]:
                key = f"{qid}<->{did}"
                if key in secondary:
                    limited[key] = secondary[key]
        save_secondary_output(
            limited,
            os.path.join(run_folder, f"{test_name}-secondary.npz"),
            model_params=params,
        )
    save_sorted_results(results, os.path.join(run_folder, f"{test_name}-output.txt"))
    metrics: Dict[str, float] = {}
    if test_config.get("qrels"):
        from matchmaker_tpu.metrics import load_qrels

        qrels = load_qrels(test_config["qrels"])
        binarization = test_config.get("binarization_point", 1.0)
        metrics = calculate_metrics_plain(ranked, qrels, binarization)
        _append_metrics_csv(
            os.path.join(run_folder, f"{test_name}-metrics.csv"), metrics, -1, -1
        )
        # optional re-ranking-depth sweep on test sets (reference eval.py:288)
        if test_config.get("candidate_set_path") and test_config.get("candidate_set_from_to"):
            from matchmaker_tpu.experiment import parse_candidate_set

            lo, hi = test_config["candidate_set_from_to"]
            candidates = parse_candidate_set(test_config["candidate_set_path"], hi)
            sweep = calculate_metrics_along_candidate_depth(
                ranked, qrels, candidates, (lo, hi), binarization
            )
            for depth, m in sweep.items():
                _append_metrics_csv(
                    os.path.join(run_folder, f"{test_name}-metrics-cs_{depth}.csv"), m, -1, -1
                )
    if config.get("train_qa_spans", False) and test_config.get("qa_answers"):
        gold = read_qa_answers(test_config["qa_answers"])
        qa_stats, predictions = qa_evaluate(
            eval_step, params, config, tokenizer, test_config["tsv"], gold, ranked
        )
        metrics["QA/ExactMatch_TopRanked"] = qa_stats.get("QA_EM", 0.0)
        metrics["QA/F1_TopRanked"] = qa_stats.get("QA_F1", 0.0)
        save_qa_answers(predictions, gold, os.path.join(run_folder, f"{test_name}-qa-output.tsv"))
    return metrics


def read_qa_answers(path: str) -> Dict[str, List[str]]:
    """``qid \\t answer1 \\t answer2 ...`` gold-answer file
    (reference eval.py:345-351)."""
    out: Dict[str, List[str]] = {}
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) >= 2:
                out[parts[0]] = [p for p in parts[1:] if p]
    return out


def _extract_answer(eval_step, params, config, tokenizer, query: str, doc: str):
    """One (query, doc) QA forward → (answer string, answerable flag)."""
    max_q = config.get("max_query_length", 30)
    max_d = config.get("max_doc_length", 200)
    q_ids, q_mask = tokenizer.encode(query, max_q)
    d_ids, d_mask, offsets = tokenizer.encode_with_offsets(doc, max_d)
    batch = {
        "seq_ids": np.concatenate([q_ids, d_ids])[None, :],
        "seq_mask": np.concatenate([q_mask, d_mask])[None, :],
        "seq_type_ids": np.concatenate(
            [np.zeros(max_q, np.int32), (d_mask > 0).astype(np.int32)]
        )[None, :],
    }
    out = eval_step(params, batch)
    if "qa_logits_start" not in out:
        raise ValueError("model has no QA head (set train_qa_spans)")
    answerable = True
    if out.get("answerability_logits") is not None:
        answerable = int(np.asarray(out["answerability_logits"])[0].argmax()) != 0
    max_q_len = q_ids.shape[0]
    start_logits = np.asarray(out["qa_logits_start"])[0, max_q_len:]
    end_logits = np.asarray(out["qa_logits_end"])[0, max_q_len:]
    s = int(start_logits.argmax())
    e = int(end_logits[s:].argmax()) + s
    if offsets[s] is None or offsets[e] is None:
        return "", answerable
    return doc[offsets[s][0] : offsets[e][1]], answerable


def qa_evaluate(
    eval_step,
    params,
    config,
    tokenizer,
    tuples_path: str,
    gold_answers: Dict[str, List[str]],
    ranked: Optional[Dict[str, List[str]]] = None,
    max_depth: int = 10,
) -> Tuple[Dict[str, float], Dict[str, str]]:
    """Extractive-QA answer eval (reference eval.py:343-372): per query, walk
    the ranking and take the first *answerable* doc's extracted span; score
    SQuAD EM/F1 against ``gold_answers`` {query_id: [answer ...]}. Without a
    ``ranked`` map, every tuple's doc is considered in file order."""
    from matchmaker_tpu.data.readers import read_reranking_tuples
    from matchmaker_tpu.metrics import qa_metric_battery

    # (qid, did) -> (query, doc) text
    texts: Dict[Tuple[str, str], Tuple[str, str]] = {}
    order: Dict[str, List[str]] = {}
    for sample in read_reranking_tuples(tuples_path):
        texts[(sample.query_id, sample.doc_id)] = (sample.query, sample.doc)
        order.setdefault(sample.query_id, []).append(sample.doc_id)
    walk = ranked if ranked is not None else order

    predictions: Dict[str, str] = {}
    for qid, doc_ids in walk.items():
        predictions[qid] = ""
        for did in doc_ids[:max_depth]:
            if (qid, did) not in texts:
                continue
            query, doc = texts[(qid, did)]
            answer, answerable = _extract_answer(
                eval_step, params, config, tokenizer, query, doc
            )
            if answerable:
                predictions[qid] = answer
                break
    return qa_metric_battery(predictions, gold_answers), predictions


def _primary_writer() -> bool:
    """Multi-process launches keep ONE writer per run folder (process 0);
    every process still *computes* metrics (replicated eval outputs) so
    early stopping stays in lockstep — only the filesystem writes are gated."""
    import jax

    return jax.process_index() == 0


def save_qa_answers(predictions: Dict[str, str], gold: Dict[str, List[str]], path: str) -> None:
    """``qid \\t predicted \\t gold...`` dump (reference eval.py:431-435)."""
    if not _primary_writer():
        return
    with open(path, "w", encoding="utf-8") as f:
        for qid, pred in predictions.items():
            if qid in gold:
                f.write("\t".join([qid, pred] + list(gold[qid])) + "\n")


def save_sorted_results(
    results: Dict[str, List[Tuple[str, float]]], path: str, until_rank: int = -1
) -> None:
    """4-col TREC-ish output: qid did rank score (reference eval.py:439-450)."""
    if not _primary_writer():
        return
    with open(path, "w", encoding="utf-8") as f:
        for qid, pairs in results.items():
            for rank, (did, score) in enumerate(
                sorted(pairs, key=lambda p: p[1], reverse=True), start=1
            ):
                f.write(f"{qid} {did} {rank} {score}\n")
                if until_rank > -1 and rank == until_rank:
                    break


def save_secondary_output(
    secondary: Dict[str, dict], path: str, model_params=None, max_param_size: int = 4096
) -> None:
    """Interpretability dumps as compressed npz (reference eval.py:415-428).

    With ``model_params``, small learned tensors (≤ max_param_size elements —
    TK mixer, kernel weights, gate biases, ...) are included under
    ``model::<path>`` keys, the reference's ``get_param_secondary`` dump."""
    if not _primary_writer():
        return
    flat = {}
    for pair_key, tensors in secondary.items():
        for name, arr in tensors.items():
            flat[f"{pair_key}::{name}"] = arr
    if model_params is not None:
        import jax

        for key_path, leaf in jax.tree_util.tree_flatten_with_path(model_params)[0]:
            arr = np.asarray(leaf)
            if arr.size <= max_param_size:
                name = "/".join(str(getattr(p, "key", p)) for p in key_path)
                flat[f"model::{name}"] = arr
    np.savez_compressed(path, **flat)


def _append_metrics_csv(path: str, metrics: Dict[str, float], epoch: int, batch_number: int) -> None:
    if not _primary_writer():
        return
    exists = os.path.exists(path)
    with open(path, "a", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        keys = sorted(metrics.keys())
        if not exists:
            w.writerow(["time", "epoch", "batch_number"] + keys)
        w.writerow([time.strftime("%Y-%m-%d %H:%M:%S"), epoch, batch_number] + [metrics[k] for k in keys])


def _write_metrics_sweep_csvs(run_folder: str, kind: str, sweep: Dict[int, dict], epoch, batch_number):
    for depth, metrics in sweep.items():
        _append_metrics_csv(
            os.path.join(run_folder, f"validation-metrics-{kind}-cs_{depth}.csv"),
            metrics,
            epoch,
            batch_number,
        )
