"""Dense retrieval entry point: 3-phase encode → index → search.

Contract with reference dense_retrieval.py:53-105,197-455 — modes:
    encode+index+search : encode corpus, build index, search query sets
    index+search        : reuse encoded vector blocks (continue folder)
    search              : reuse saved index (continue folder)
Config keys follow config/dense_retrieval/minimal-usage-example.yaml
(collection_tsv, query_sets.<name>.{queries_tsv,qrels,binarization_point,top_n},
token_block_size/token_dtype, faiss_index_type, ...).

Usage:
    python -m matchmaker_tpu.cli.dense_retrieval encode+index+search \
        --config-file cfg.yaml --run-name my_index
    python -m matchmaker_tpu.cli.dense_retrieval search \
        --config-file cfg.yaml --run-name again --continue-folder <run>
"""

from __future__ import annotations

import os

# persistent XLA compile cache: remote/TPU compiles are expensive; cache them
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_compile_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import sys
import traceback

import jax
import numpy as np

from matchmaker_tpu.config import get_config
from matchmaker_tpu.data.tokenization import build_tokenizer
from matchmaker_tpu.evaluation import save_sorted_results
from matchmaker_tpu.experiment import get_parser, prepare_experiment
from matchmaker_tpu.metrics import calculate_metrics_plain, load_qrels, print_metric_summary, unrolled_to_ranked_result
from matchmaker_tpu.models import get_model, init_params
from matchmaker_tpu.obs.perf_monitor import PerformanceMonitor
from matchmaker_tpu.parallel.mesh import make_mesh
from matchmaker_tpu.retrieval.encode import encode_corpus, load_encoded
from matchmaker_tpu.retrieval.indexes import build_index
from matchmaker_tpu.retrieval.search import search_queries
from matchmaker_tpu.training.checkpoints import load_params


def make_encode_fn(model, sequence_type: str):
    """Jitted forward_representation closure (reference indexing_heads.py:6-62)."""

    @jax.jit
    def encode(params, ids, mask):
        return model.apply(
            {"params": params}, ids, mask, sequence_type, method=type(model).encode
        )

    return encode


def run(mode: str, config, run_folder: str) -> int:
    perf = PerformanceMonitor.get()
    mesh = make_mesh()
    tokenizer = build_tokenizer(config)
    model = get_model(config, tokenizer)
    params = init_params(model, config, jax.random.PRNGKey(config.get("random_seed", 42)))

    trained_model = config.get("trained_model")
    if trained_model and os.path.exists(trained_model):
        ckpt = trained_model
        if os.path.isdir(ckpt):
            ckpt = os.path.join(ckpt, "best-model.flax")
        if os.path.exists(ckpt):
            params = load_params(ckpt, params)
    # pin params to the mesh ONCE — host-numpy params re-upload the whole
    # model on EVERY jitted call (catastrophic over a tunneled device:
    # ~266 MB/batch for a DistilBERT-class tower)
    from matchmaker_tpu.parallel.mesh import shard_params

    params = shard_params(params, mesh)

    encode_folder = os.path.join(run_folder, "encoded")

    # ---- phase 1: encode -------------------------------------------------
    if "encode" in mode:
        from matchmaker_tpu.parallel.mesh import batch_sharding

        cfg_enc = dict(config)
        cfg_enc["batch_size_inference"] = config.get("collection_batch_size", 128)
        encode_corpus(
            make_encode_fn(model, "doc_encode"),
            params,
            cfg_enc,
            tokenizer,
            config["collection_tsv"],
            encode_folder,
            sequence_type="doc",
            # data-parallel encoding: batches shard over the mesh's data axis
            sharding=batch_sharding(mesh),
        )

    # ---- phase 2: index --------------------------------------------------
    from matchmaker_tpu.config import model_base_name as _mbn

    index_cfg = dict(config)
    if _mbn(config.get("model", "")) == "colbert":
        # measured ColBERT token-index operating point (benchmarks/
        # colbert_benchmark.py, round 4): the 64-candidate pool oversamples
        # per-token k by >100x, so the rank-2 tournament pass is pure
        # overhead — per_bin=1 + 4096-row tiles: 6.2k vs 4.6k composite QPS
        # over 1M token vectors. YAML keys still override.
        index_cfg.setdefault("mips_per_bin", 1)
        index_cfg.setdefault("mips_tile_rows", 4096)
    index_folder = os.path.join(run_folder, "index")
    indexer = build_index(index_cfg, mesh)
    if "index" in mode:
        perf.start_block("indexing")
        from matchmaker_tpu.retrieval.indexes import StreamingFlatIndex

        if isinstance(indexer, StreamingFlatIndex):
            # >RAM corpora: the encode blocks on disk ARE the index
            indexer.encode_folder = encode_folder
            indexer.index_from_folder(encode_folder)
            n_rows = len(indexer._row_ids)
        else:
            vectors, row_ids = load_encoded(encode_folder)
            indexer.prepare(vectors.shape[1])
            indexer.index(row_ids, vectors)
            n_rows = vectors.shape[0]
        perf.stop_block("indexing", n_rows)
        indexer.save(index_folder)
    else:
        indexer.load(index_folder)

    # ---- phase 3: search -------------------------------------------------
    from matchmaker_tpu.config import model_base_name

    colbert_queries = model_base_name(config.get("model", "")) == "colbert"
    auto_multi = colbert_queries or "->" in config.get("model", "")
    multi_vector = bool(config.get("multi_vector_corpus", auto_multi))
    cfg_q = dict(config)
    cfg_q["batch_size_inference"] = config.get("query_batch_size", 32)

    rescore_store = None
    rescore_n = int(config.get("colbert_rescore_n", 0))
    if colbert_queries and rescore_n > 0 and os.path.isdir(encode_folder):
        from matchmaker_tpu.retrieval.colbert_search import TokenVectorStore

        rescore_store = TokenVectorStore(encode_folder)

    for name, qset in (config.get("query_sets") or {}).items():
        if colbert_queries:
            # late-interaction retrieval: per-token candidate search + MaxSim
            # merge (+ optional exact re-scoring from the stored doc vectors) —
            # the working form of the reference's vestigial branch
            # (dense_retrieval.py:398-412)
            from matchmaker_tpu.retrieval.colbert_search import colbert_search_queries

            results = colbert_search_queries(
                make_encode_fn(model, "query_encode"),
                params,
                cfg_q,
                tokenizer,
                indexer,
                qset["queries_tsv"],
                top_n=qset.get("top_n", 100),
                # 48 candidates/token: the merge's (C, C) equality mask is
                # quadratic in Lq·K — 48 vs 64 measures composite 6.2k vs
                # 5.2k QPS at equal per-token oversampling class (any
                # truncation is recovered by colbert_rescore_n exact MaxSim)
                per_token_candidates=config.get("colbert_per_token_candidates", 48),
                rescore_store=rescore_store,
                rescore_n=rescore_n,
                # on-device segmented max-sum merge (7x the host merge on
                # chip; benchmarks/colbert_benchmark.py) — disable to force
                # the numpy reduceat path
                device_merge=bool(config.get("colbert_device_merge", True)),
            )
        else:
            results = search_queries(
                make_encode_fn(model, "query_encode"),
                params,
                cfg_q,
                tokenizer,
                indexer,
                qset["queries_tsv"],
                top_n=qset.get("top_n", 100),
                dedup=multi_vector,
            )
        save_sorted_results(results, os.path.join(run_folder, f"{name}-output.txt"))
        if qset.get("qrels"):
            metrics = calculate_metrics_plain(
                unrolled_to_ranked_result(results),
                load_qrels(qset["qrels"]),
                qset.get("binarization_point", 1.0),
            )
            import csv

            with open(os.path.join(run_folder, f"{name}-metrics.csv"), "w", newline="") as f:
                w = csv.writer(f)
                w.writerow(list(metrics.keys()))
                w.writerow(list(metrics.values()))
            print(f"[{name}]", end=" ")
            print_metric_summary(metrics)

    perf.save_summary(os.path.join(run_folder, "efficiency-metrics.json"))
    perf.print_summary()
    return 0


def main() -> int:
    # multi-process launch? must run before the first backend touch
    from matchmaker_tpu.parallel.multihost import maybe_initialize_distributed

    maybe_initialize_distributed()
    parser = get_parser()
    parser.add_argument("mode", choices=["encode+index+search", "index+search", "search"])
    args = parser.parse_args()

    if args.continue_folder:
        run_folder = args.continue_folder
        config = get_config(
            [os.path.join(run_folder, "config.yaml")] + (args.config_file or []),
            args.config_overwrites,
        )
    else:
        config = get_config(args.config_file, args.config_overwrites)
        run_folder = prepare_experiment(config["expirement_base_path"], args.run_name, config)
    print(f"[matchmaker-tpu] dense retrieval ({args.mode}) run folder: {run_folder}")
    try:
        return run(args.mode, config, run_folder)
    except Exception:
        traceback.print_exc()
        return 1


if __name__ == "__main__":
    sys.exit(main())
