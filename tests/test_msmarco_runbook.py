"""Pin the real-data interface of docs/msmarco_runbook.md.

VERDICT-r4 #6: the runbook existed but nothing pinned its interface (config
names, file formats, checkpoint layout), so the first real-data run would hit
interface rot. This test executes the runbook's ACTUAL commands — the same
config files and overwrite keys, byte-identical MS MARCO file formats — on a
fabricated local HF DistilBERT checkpoint (what `--model
distilbert-base-uncased` resolves to in a warm HF cache) and 100-line data,
via subprocess like a user would:

  1b. cluster_queries → query_clusters.tsv
  1.  train: TAS-Balanced sampler + Margin-MSE + in-batch KLDivTeacherList
      + dynamic ColBERT teacher + continuous validation
  2.  dense_retrieval encode+index+search with faiss_index_type: scann

Reference bar: README.md:148-165 (the TAS-B recipe these commands rebuild).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

ENV = {
    **os.environ,
    "JAX_PLATFORMS": "cpu",
    "PALLAS_AXON_POOL_IPS": "",
    "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
}

WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
         "hotel", "india", "juliet", "kilo", "lima", "mike", "november"]


def _fabricate_hf_checkpoint(path: str) -> None:
    """A local `save_pretrained` DistilBERT dir — model config+weights AND
    tokenizer — exactly what the runbook's `bert_pretrained_model` points at
    when the HF cache is warm."""
    import transformers

    cfg = transformers.DistilBertConfig(
        vocab_size=64, dim=32, n_layers=2, n_heads=4, hidden_dim=64,
        max_position_embeddings=64, dropout=0.0, attention_dropout=0.0,
    )
    transformers.DistilBertModel(cfg).save_pretrained(path)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + WORDS + [
        f"tok{i}" for i in range(64 - 5 - len(WORDS))
    ]
    vocab_file = os.path.join(path, "vocab.txt")
    with open(vocab_file, "w") as f:
        f.write("\n".join(vocab) + "\n")
    transformers.DistilBertTokenizerFast(
        vocab_file=vocab_file, do_lower_case=True
    ).save_pretrained(path)


def _text(rng, n=6):
    return " ".join(rng.choice(WORDS, size=n))


@pytest.fixture(scope="module")
def msmarco(tmp_path_factory):
    """100-line MS MARCO v1 passage layout, byte-compatible formats
    (runbook §0 table; reference documentation/data_format.md)."""
    d = tmp_path_factory.mktemp("msmarco")
    rng = np.random.default_rng(11)
    n_docs, n_train_q, n_dev_q = 100, 20, 8

    docs = {f"D{i}": _text(rng) for i in range(n_docs)}
    with open(d / "collection.tsv", "w") as f:
        f.writelines(f"{pid}\t{t}\n" for pid, t in docs.items())

    # each train query's relevant doc is D<i>; query text overlaps its doc
    train_q = {}
    for i in range(n_train_q):
        pid = f"D{i}"
        train_q[f"Q{i}"] = " ".join(docs[pid].split()[:3])
    with open(d / "queries.train.tsv", "w") as f:
        f.writelines(f"{qid}\t{t}\n" for qid, t in train_q.items())

    dev_q = {f"QD{i}": " ".join(docs[f"D{i + 40}"].split()[:3]) for i in range(n_dev_q)}
    with open(d / "queries.dev.tsv", "w") as f:
        f.writelines(f"{qid}\t{t}\n" for qid, t in dev_q.items())
    with open(d / "qrels.dev.tsv", "w") as f:  # `qid 0 pid 1`
        f.writelines(f"QD{i} 0 D{i + 40} 1\n" for i in range(n_dev_q))

    # train_triples_scored.tsv: `s_pos \t s_neg \t query \t pos \t neg`
    with open(d / "train_triples_scored.tsv", "w") as f:
        for i in range(n_train_q):
            for _ in range(4):
                neg = f"D{rng.integers(n_train_q, n_docs)}"
                f.write(f"12.5\t4.25\t{train_q[f'Q{i}']}\t{docs[f'D{i}']}\t{docs[neg]}\n")

    # pairs_with_teacher_scores.tsv: `s_pos s_neg qid pid_pos pid_neg`
    with open(d / "pairs_with_teacher_scores.tsv", "w") as f:
        for i in range(n_train_q):
            for _ in range(4):
                neg = rng.integers(n_train_q, n_docs)
                f.write(f"{12.5 + rng.normal():.3f} {4.25 + rng.normal():.3f} "
                        f"Q{i} D{i} D{neg}\n")

    # dev_top1000.tsv reranking tuples: `qid \t pid \t query \t passage`
    with open(d / "dev_top1000.tsv", "w") as f:
        for i in range(n_dev_q):
            cands = {f"D{i + 40}"} | {f"D{int(j)}" for j in rng.integers(0, n_docs, 6)}
            for pid in sorted(cands):
                f.write(f"QD{i}\t{pid}\t{dev_q[f'QD{i}']}\t{docs[pid]}\n")

    ckpt = str(d / "hf_distilbert")
    _fabricate_hf_checkpoint(ckpt)
    return {"dir": str(d), "ckpt": ckpt}


def _run(args, timeout=900):
    r = subprocess.run([sys.executable, "-m"] + args, capture_output=True,
                       text=True, env=ENV, timeout=timeout)
    assert r.returncode == 0, f"{args}\nstdout:{r.stdout[-3000:]}\nstderr:{r.stderr[-3000:]}"
    return r.stdout


@pytest.mark.slow
def test_msmarco_runbook_commands(msmarco, tmp_path):
    d, ckpt = msmarco["dir"], msmarco["ckpt"]
    exp = str(tmp_path / "exp")
    os.makedirs(exp)
    # tiny-shape common overrides: the ONLY deltas from the runbook commands
    # (real data would keep the config-file defaults)
    tiny = (f"expirement_base_path: {exp}, bert_pretrained_model: {ckpt}, "
            "use_fp16: false, max_query_length: 8, max_doc_length: 16, "
            "batch_size_train: 8, batch_size_eval: 8, epochs: 1, "
            "optimizer_warmup_steps: 0, lr_schedule: constant, "
            "param_group0_learning_rate: 0.002, param_group1_learning_rate: 0.002, "
            "validate_every_n_batches: -1, validation_metric: MRR@10, "
            "random_seed: 7")

    # -- teacher prerequisite (runbook step 1's <colbert_teacher_run>) ------
    _run(["matchmaker_tpu.cli.train",
          "--config-file", "configs/train/defaults.yaml",
          "configs/train/models/colbert.yaml",
          "--run-name", "colbert_teacher",
          "--config-overwrites",
          f"{tiny}, train_tsv: {d}/train_triples_scored.tsv, "
          f"loss: margin-mse, in_batch_negatives: false, "
          f"validation_cont: {{tsv: {d}/dev_top1000.tsv, "
          f"qrels: {d}/qrels.dev.tsv, binarization_point: 1}}"])
    teacher_run = next(
        os.path.join(exp, p) for p in os.listdir(exp) if "colbert_teacher" in p)
    assert os.path.exists(os.path.join(teacher_run, "best-model.flax"))

    # -- 1b. query clusters for the sampler ---------------------------------
    clusters = os.path.join(d, "query_clusters.tsv")
    _run(["matchmaker_tpu.cli.cluster_queries",
          "--model", teacher_run,
          "--queries", f"{d}/queries.train.tsv",
          "--out", clusters, "--clusters", "4"])
    lines = open(clusters).read().strip().splitlines()
    assert len(lines) == 4 and sum(len(l.split()) for l in lines) == 20

    # -- 1. TAS-Balanced + Margin-MSE student (the runbook command) ---------
    _run(["matchmaker_tpu.cli.train",
          "--config-file", "configs/train/defaults.yaml",
          "configs/train/models/bert_dot.yaml",
          "--run-name", "tasb_msmarco",
          "--config-overwrites",
          f"{tiny}, train_tsv: {d}/train_triples_scored.tsv, "
          f"dynamic_sampler: true, "
          f"dynamic_sampler_collection: {d}/collection.tsv, "
          f"dynamic_sampler_queries: {d}/queries.train.tsv, "
          f"dynamic_sampler_pairs_with_teacher_scores: {d}/pairs_with_teacher_scores.tsv, "
          f"dynamic_sampler_query_cluster_file: {clusters}, "
          f"tas_batches_per_epoch: 6, "
          f"loss: margin-mse, in_batch_negatives: true, "
          f"in_batch_neg_loss: KLDivTeacherList, dynamic_teacher: true, "
          f"dynamic_teacher_path: {teacher_run}, "
          f"validation_cont: {{tsv: {d}/dev_top1000.tsv, "
          f"qrels: {d}/qrels.dev.tsv, binarization_point: 1}}"])
    student_run = next(
        os.path.join(exp, p) for p in os.listdir(exp) if "tasb_msmarco" in p)
    assert os.path.exists(os.path.join(student_run, "best-model.flax"))
    assert os.path.exists(os.path.join(student_run, "validation-metrics-cont.csv"))

    # -- 2. encode + index + search the full corpus -------------------------
    _run(["matchmaker_tpu.cli.dense_retrieval", "encode+index+search",
          "--config-file", "configs/dense_retrieval/default.yaml",
          "--run-name", "tasb_msmarco_retrieval",
          "--config-overwrites",
          f"expirement_base_path: {exp}, trained_model: {student_run}, "
          f"bert_pretrained_model: {ckpt}, use_fp16: false, "
          f"max_query_length: 8, max_doc_length: 16, "
          f"collection_tsv: {d}/collection.tsv, token_dtype: float16, "
          f"collection_batch_size: 16, query_batch_size: 8, "
          f"faiss_index_type: scann, "
          f"query_sets: {{dev: {{queries_tsv: {d}/queries.dev.tsv, "
          f"qrels: {d}/qrels.dev.tsv, binarization_point: 1, top_n: 20}}}}"])
    ret_run = next(
        os.path.join(exp, p) for p in os.listdir(exp)
        if "tasb_msmarco_retrieval" in p)
    metrics_csv = os.path.join(ret_run, "dev-metrics.csv")
    assert os.path.exists(metrics_csv), os.listdir(ret_run)
    body = open(metrics_csv).read()
    assert "MRR@10" in body
    # the run file carries every dev query
    run_file = next(f for f in os.listdir(ret_run) if f.startswith("dev-output"))
    qids = {l.split()[0] for l in open(os.path.join(ret_run, run_file))}
    assert len(qids) == 8
