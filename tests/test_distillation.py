"""Distillation toolchain tests: TAS-balanced sampler, score-file utilities,
dynamic teacher wrapping."""

import os

import numpy as np
import pytest

from matchmaker_tpu.data.tas_balanced import TASBalancedSampler
from matchmaker_tpu.distillation.score_files import (
    ensemble_score_files,
    id_scores_to_text,
    text_scores_to_ids,
)


@pytest.fixture
def tas_files(tmp_path):
    coll = tmp_path / "collection.tsv"
    coll.write_text("".join(f"d{i}\tdocument text {i}\n" for i in range(20)))
    queries = tmp_path / "queries.tsv"
    queries.write_text("".join(f"q{i}\tquery text {i}\n" for i in range(8)))
    pairs = tmp_path / "pairs.tsv"
    rng = np.random.default_rng(0)
    lines = []
    for qi in range(8):
        for _ in range(6):
            dp, dn = rng.choice(20, 2, replace=False)
            ps, ns = rng.normal(5), rng.normal(0)
            lines.append(f"{ps} {ns} q{qi} d{dp} d{dn}\n")
    pairs.write_text("".join(lines))
    clusters = tmp_path / "clusters.tsv"
    clusters.write_text("q0 q1 q2 q3\nq4 q5 q6 q7\n")
    return dict(
        collection=str(coll), queries=str(queries), pairs=str(pairs), clusters=str(clusters)
    )


def test_tas_sampler_cluster_coherent_batches(tas_files):
    sampler = TASBalancedSampler(
        tas_files["collection"], tas_files["queries"], tas_files["pairs"], tas_files["clusters"],
        batch_size=8, clusters_per_batch=1, seed=3,
    )
    stream = sampler.sample_pairs()
    # queries of one batch-slice come from one cluster (cluster-coherent)
    first_batch_queries = [next(stream)[0] for _ in range(4)]
    cluster_a = {f"query text {i}" for i in range(4)}
    cluster_b = {f"query text {i}" for i in range(4, 8)}
    assert set(first_batch_queries) <= cluster_a or set(first_batch_queries) <= cluster_b


def test_tas_sampler_batches_shapes(tas_files):
    sampler = TASBalancedSampler(
        tas_files["collection"], tas_files["queries"], tas_files["pairs"], tas_files["clusters"],
        batch_size=4, seed=3,
    )
    from matchmaker_tpu.data.tokenization import HashBertTokenizer

    config = {"max_query_length": 8, "max_doc_length": 16}
    batches = list(sampler.batches(config, HashBertTokenizer(1000), max_batches=3))
    assert len(batches) == 3
    b = batches[0]
    assert b["query_ids"].shape == (4, 8)
    assert b["pos_score"].shape == (4,)
    assert b["valid"].sum() == 4


def test_tas_sampler_deterministic(tas_files):
    def collect(seed):
        s = TASBalancedSampler(
            tas_files["collection"], tas_files["queries"], tas_files["pairs"], tas_files["clusters"],
            batch_size=4, seed=seed,
        )
        stream = s.sample_pairs()
        return [next(stream)[:3] for _ in range(10)]

    assert collect(5) == collect(5)
    assert collect(5) != collect(6)


def test_score_file_roundtrip(tmp_path):
    queries = tmp_path / "q.tsv"
    queries.write_text("q1\twhat is a test\n")
    coll = tmp_path / "c.tsv"
    coll.write_text("d1\tpositive doc\nd2\tnegative doc\n")
    scores = tmp_path / "scores.tsv"
    scores.write_text("4.5\t-1.0\twhat is a test\tpositive doc\tnegative doc\n")

    ids_out = tmp_path / "ids.tsv"
    assert text_scores_to_ids(str(scores), str(queries), str(coll), str(ids_out)) == 1
    assert ids_out.read_text() == "4.5 -1.0 q1 d1 d2\n"

    text_out = tmp_path / "text.tsv"
    assert id_scores_to_text(str(ids_out), str(queries), str(coll), str(text_out)) == 1
    assert text_out.read_text() == "4.5\t-1.0\twhat is a test\tpositive doc\tnegative doc\n"


def test_ensemble_score_files(tmp_path):
    a = tmp_path / "a.tsv"
    a.write_text("2.0\t0.0\tq\tdp\tdn\n")
    b = tmp_path / "b.tsv"
    b.write_text("4.0\t2.0\tq\tdp\tdn\n")
    out = tmp_path / "out.tsv"
    assert ensemble_score_files([str(a), str(b)], str(out)) == 1
    assert out.read_text() == "3.0\t1.0\tq\tdp\tdn\n"


def test_dynamic_teacher_attaches_scores(tmp_path, eight_devices):
    """Train nothing — just check the wrapper scores batches with a checkpointed model."""
    import yaml

    import jax

    from matchmaker_tpu.config import auto_fill
    from matchmaker_tpu.data.tokenization import build_tokenizer
    from matchmaker_tpu.distillation.dynamic_teacher import DynamicTeacher
    from matchmaker_tpu.models import get_model, init_params
    from matchmaker_tpu.training.checkpoints import save_params

    teacher_dir = tmp_path / "teacher"
    os.makedirs(teacher_dir)
    t_config = auto_fill({
        "model": "bert_dot",
        "bert_pretrained_model": "tiny-test",
        "use_fp16": False,
        "max_query_length": 8,
        "max_doc_length": 16,
        "model_input_type": "auto",
        "token_embedder_type": "auto",
    })
    yaml.safe_dump(dict(t_config), open(teacher_dir / "config.yaml", "w"))
    tok = build_tokenizer(t_config)
    model = get_model(t_config, tok)
    params = init_params(model, t_config, jax.random.PRNGKey(0))
    save_params(str(teacher_dir / "best-model.flax"), params)

    config = {
        "dynamic_teacher_path": str(teacher_dir),
        "dynamic_teacher_in_batch_scoring": True,
    }
    teacher = DynamicTeacher(config)

    rng = np.random.default_rng(0)
    batch = {
        "query_ids": rng.integers(2, 900, (4, 8)).astype(np.int32),
        "query_mask": np.ones((4, 8), np.float32),
        "doc_pos_ids": rng.integers(2, 900, (4, 16)).astype(np.int32),
        "doc_pos_mask": np.ones((4, 16), np.float32),
        "doc_neg_ids": rng.integers(2, 900, (4, 16)).astype(np.int32),
        "doc_neg_mask": np.ones((4, 16), np.float32),
        "valid": np.ones(4, np.float32),
    }
    wrapped = list(teacher.wrap(iter([batch])))
    assert len(wrapped) == 1
    assert wrapped[0]["pos_score"].shape == (4,)
    assert wrapped[0]["dyn_teacher_matrix"].shape == (4, 8)
    assert np.isfinite(wrapped[0]["pos_score"]).all()


def test_dynamic_teacher_per_term_scores(tmp_path, eight_devices):
    """ColBERT teacher attaches per-term score vectors; student per-term loss runs."""
    import yaml
    import jax
    import jax.numpy as jnp

    from matchmaker_tpu.config import auto_fill
    from matchmaker_tpu.data.tokenization import build_tokenizer
    from matchmaker_tpu.distillation.dynamic_teacher import DynamicTeacher
    from matchmaker_tpu.losses import get_loss
    from matchmaker_tpu.models import get_model, init_params
    from matchmaker_tpu.training.checkpoints import save_params
    from matchmaker_tpu.training.optim import build_optimizer
    from matchmaker_tpu.training.train_step import make_train_step

    teacher_dir = tmp_path / "colbert_teacher"
    os.makedirs(teacher_dir)
    t_config = auto_fill({
        "model": "colbert", "bert_pretrained_model": "tiny-test", "use_fp16": False,
        "colbert_compression_dim": 16,
        "max_query_length": 8, "max_doc_length": 16,
        "model_input_type": "auto", "token_embedder_type": "auto",
    })
    yaml.safe_dump(dict(t_config), open(teacher_dir / "config.yaml", "w"))
    tok = build_tokenizer(t_config)
    t_model = get_model(t_config, tok)
    save_params(str(teacher_dir / "best-model.flax"), init_params(t_model, t_config, jax.random.PRNGKey(0)))

    teacher = DynamicTeacher({
        "dynamic_teacher_path": str(teacher_dir),
        "dynamic_teacher_per_term_scores": True,
    })
    rng = np.random.default_rng(0)
    batch = {
        "query_ids": rng.integers(2, 900, (4, 8)).astype(np.int32),
        "query_mask": np.ones((4, 8), np.float32),
        "doc_pos_ids": rng.integers(2, 900, (4, 16)).astype(np.int32),
        "doc_pos_mask": np.ones((4, 16), np.float32),
        "doc_neg_ids": rng.integers(2, 900, (4, 16)).astype(np.int32),
        "doc_neg_mask": np.ones((4, 16), np.float32),
        "valid": np.ones(4, np.float32),
    }
    wrapped = next(iter(teacher.wrap(iter([batch]))))
    assert wrapped["dyn_teacher_pos_per_term"].shape == (4, 8)

    # student colbert with per-term loss
    s_config = auto_fill({
        "model": "colbert", "bert_pretrained_model": "tiny-test", "use_fp16": False,
        "colbert_compression_dim": 16, "colbert_per_term_scores": True,
        "loss": "margin-mse", "train_pairwise_distillation": True,
        "max_query_length": 8, "max_doc_length": 16,
        "max_training_steps": 10, "optimizer_warmup_steps": 0,
        "model_input_type": "auto", "token_embedder_type": "auto",
    })
    s_model = get_model(s_config, tok)
    params = init_params(s_model, s_config, jax.random.PRNGKey(2))
    tx = build_optimizer(s_config, params)
    step = make_train_step(s_model, get_loss(s_config), tx, s_config)
    _, _, stats = step(params, tx.init(params), wrapped)
    assert "per_term_loss" in stats
    assert np.isfinite(float(np.asarray(stats["per_term_loss"])))


def test_load_teacher_from_hub_config_stub(eight_devices):
    """Hub model names resolve through configs/huggingface_modelhub stubs
    (reference dynamic_teacher.py:170-183); weights warmstart only when the
    HF cache has them (random init offline)."""
    import pytest

    from matchmaker_tpu.distillation.dynamic_teacher import load_teacher

    model, params, config, tokenizer = load_teacher(
        "sebastian-hofstaetter/distilbert-dot-tas_b-b256-msmarco"
    )
    assert config["model"] == "bert_dot"
    assert "encoder" in params

    with pytest.raises(FileNotFoundError):
        load_teacher("unknown-org/unknown-model")


def test_dynamic_teacher_wrap_is_nonblocking(tmp_path, eight_devices):
    """Pipelining contract: wrap must attach DEVICE arrays (futures under JAX
    async dispatch), never host numpy — a blocking np.asarray here would
    serialize teacher scoring with the student step (the round-3 weakness)."""
    import yaml
    import jax

    from matchmaker_tpu.config import auto_fill
    from matchmaker_tpu.data.tokenization import build_tokenizer
    from matchmaker_tpu.distillation.dynamic_teacher import DynamicTeacher
    from matchmaker_tpu.models import get_model, init_params
    from matchmaker_tpu.training.checkpoints import save_params

    teacher_dir = tmp_path / "teacher"
    os.makedirs(teacher_dir)
    t_config = auto_fill({
        "model": "bert_dot", "bert_pretrained_model": "tiny-test", "use_fp16": False,
        "max_query_length": 8, "max_doc_length": 16,
        "model_input_type": "auto", "token_embedder_type": "auto",
    })
    yaml.safe_dump(dict(t_config), open(teacher_dir / "config.yaml", "w"))
    tok = build_tokenizer(t_config)
    model = get_model(t_config, tok)
    save_params(str(teacher_dir / "best-model.flax"),
                init_params(model, t_config, jax.random.PRNGKey(0)))

    teacher = DynamicTeacher({"dynamic_teacher_path": str(teacher_dir)})
    rng = np.random.default_rng(0)
    batch = {
        "query_ids": rng.integers(2, 900, (8, 8)).astype(np.int32),
        "query_mask": np.ones((8, 8), np.float32),
        "doc_pos_ids": rng.integers(2, 900, (8, 16)).astype(np.int32),
        "doc_pos_mask": np.ones((8, 16), np.float32),
        "doc_neg_ids": rng.integers(2, 900, (8, 16)).astype(np.int32),
        "doc_neg_mask": np.ones((8, 16), np.float32),
        "valid": np.ones(8, np.float32),
    }
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ("data",))
    sharding = NamedSharding(mesh, P("data"))
    wrapped = next(iter(teacher.wrap(iter([batch]), sharding=sharding)))
    assert isinstance(wrapped["pos_score"], jax.Array), "scores must stay on device"
    assert isinstance(wrapped["query_ids"], jax.Array), "batch must be mesh-placed"
    # text arrays carry the mesh sharding (teacher ran sharded, not on dev 0)
    assert wrapped["query_ids"].sharding.is_equivalent_to(sharding, 2)
    assert np.isfinite(np.asarray(wrapped["pos_score"])).all()
