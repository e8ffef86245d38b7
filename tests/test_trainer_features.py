"""Trainer feature coverage: listwise losses, grad accumulation, warmstart,
n-best checkpoint rotation, in-loop validation cadence."""

import os

import numpy as np
import pytest

import jax

from matchmaker_tpu.config import Config, auto_fill
from matchmaker_tpu.training.trainer import Trainer
from tests.make_tiny_dataset import make_tiny_dataset


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    return make_tiny_dataset(str(tmp_path_factory.mktemp("tiny_tf")))


def _base_config(tiny, run_base, **kw):
    cfg = {
        "model": "knrm",
        "token_embedder_type": "embedding",
        "model_input_type": "auto",
        "vocab_path": tiny["vocab"],
        "token_embedding_size": 24,
        "knrm_kernels": 5,
        "max_query_length": 8,
        "max_doc_length": 24,
        "batch_size_train": 16,
        "batch_size_eval": 16,
        "epochs": 2,
        "loss": "ranknet",
        "param_group1_learning_rate": 0.01,
        "embedding_optimizer_learning_rate": 0.01,
        "optimizer_warmup_steps": 0,
        "lr_schedule": "constant",
        "validate_every_n_batches": -1,
        "validation_metric": "MRR@10",
        "random_seed": 7,
        "expirement_base_path": run_base,
        "train_tsv": tiny["train_tsv"],
        "validation_cont": {"tsv": tiny["val_tsv"], "qrels": tiny["qrels"], "binarization_point": 1.0},
    }
    cfg.update(kw)
    return Config(auto_fill(cfg))


@pytest.mark.parametrize("loss", ["mrr", "listnet", "lambdarank", "margin", "margin-mse"])
def test_losses_train_finite(tiny, tmp_path, loss, eight_devices):
    run = str(tmp_path / f"run_{loss}")
    os.makedirs(run)
    kw = {"loss": loss, "epochs": 1}
    if loss == "margin-mse":
        kw["train_pairwise_distillation"] = False  # zero teacher scores
    config = _base_config(tiny, str(tmp_path), **kw)
    trainer = Trainer(config, run)
    from matchmaker_tpu.data.loaders import triple_training_loader

    batch = next(iter(triple_training_loader(config, trainer.tokenizer, config["train_tsv"])))
    _, _, stats = trainer.train_step(trainer.params, trainer.opt_state, batch)
    assert np.isfinite(float(np.asarray(stats["loss"]))), loss


def test_gradient_accumulation(tiny, tmp_path, eight_devices):
    run = str(tmp_path / "run_accum")
    os.makedirs(run)
    config = _base_config(tiny, str(tmp_path), gradient_accumulation_steps=2, epochs=1)
    trainer = Trainer(config, run)
    from matchmaker_tpu.data.loaders import triple_training_loader

    loader = triple_training_loader(config, trainer.tokenizer, config["train_tsv"])
    b1 = next(iter(loader))
    p0 = np.asarray(jax.tree_util.tree_leaves(trainer.params)[0]).copy()
    params, opt_state, _ = trainer.train_step(trainer.params, trainer.opt_state, b1)
    # first accumulation micro-step: no parameter change yet
    p1 = np.asarray(jax.tree_util.tree_leaves(params)[0])
    np.testing.assert_array_equal(p0, p1)
    params, opt_state, _ = trainer.train_step(params, opt_state, b1)
    p2 = np.asarray(jax.tree_util.tree_leaves(params)[0])
    assert not np.array_equal(p0, p2)


def test_warmstart_model_path(tiny, tmp_path, eight_devices):
    run1 = str(tmp_path / "run_a")
    os.makedirs(run1)
    config = _base_config(tiny, str(tmp_path), epochs=1)
    t1 = Trainer(config, run1)
    t1.train()
    ckpt = os.path.join(run1, "best-model.flax")
    assert os.path.exists(ckpt)

    run2 = str(tmp_path / "run_b")
    os.makedirs(run2)
    config2 = _base_config(tiny, str(tmp_path), warmstart_model_path=ckpt)
    t2 = Trainer(config2, run2)
    for a, b in zip(jax.tree_util.tree_leaves(t1.params), jax.tree_util.tree_leaves(t2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_n_best_checkpoint_rotation(tmp_path):
    """rotate_best shifts best-model.flax → best-model-2.flax → ... (reference
    train.py:637-647)."""
    from matchmaker_tpu.training.checkpoints import rotate_best

    run = str(tmp_path)
    open(os.path.join(run, "best-model.flax"), "w").write("v1")
    rotate_best(run, 3)
    open(os.path.join(run, "best-model.flax"), "w").write("v2")
    rotate_best(run, 3)
    open(os.path.join(run, "best-model.flax"), "w").write("v3")
    assert open(os.path.join(run, "best-model.flax")).read() == "v3"
    assert open(os.path.join(run, "best-model-2.flax")).read() == "v2"
    assert open(os.path.join(run, "best-model-3.flax")).read() == "v1"


def test_param_labels_route_encoder_lr(eight_devices):
    """Encoder towers get group0 (encoder) labels; heads get group1."""
    import jax.numpy as jnp

    from matchmaker_tpu.models.bert_dot import BertDot
    from matchmaker_tpu.models.encoder import EncoderConfig
    from matchmaker_tpu.training.optim import label_params

    model = BertDot(encoder_cfg=EncoderConfig.tiny(), compress_dim=8, compute_dtype=jnp.float32)
    batch = {
        "query_ids": np.zeros((2, 4), np.int32), "query_mask": np.ones((2, 4), np.float32),
        "doc_ids": np.zeros((2, 8), np.int32), "doc_mask": np.ones((2, 8), np.float32),
    }
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    labels = label_params(params, {})
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    by_top = {}
    for path, label in flat:
        top = str(getattr(path[0], "key", path[0]))
        by_top.setdefault(top, set()).add(label)
    assert by_top["encoder"] == {"encoder"}
    assert by_top["compressor"] == {"head"}


def test_secondary_output_npz_per_query_topn_and_model_params(tmp_path, eight_devices):
    """test_model with save_secondary_output writes per-(query,doc) tensors
    for each query's TOP-RANKED docs plus small learned model params
    (reference save_secondary_output, eval.py:415-428)."""
    import numpy as np

    import jax

    from matchmaker_tpu.config import Config, auto_fill
    from matchmaker_tpu.data.tokenization import build_tokenizer
    from matchmaker_tpu.evaluation import test_model
    from matchmaker_tpu.models import example_batch, get_model
    from matchmaker_tpu.training.train_step import make_eval_step
    from tests.make_tiny_dataset import make_tiny_dataset

    paths = make_tiny_dataset(str(tmp_path / "data"))
    config = Config(auto_fill({
        "model": "tk",
        "model_input_type": "independent",
        "token_embedder_type": "embedding",
        "vocab_path": paths["vocab"],
        "token_embedding_size": 32,
        "tk_att_heads": 2, "tk_att_layer": 1, "tk_att_ff_dim": 16,
        "max_query_length": 8,
        "max_doc_length": 24,
        "batch_size_eval": 16,
    }))
    tokenizer = build_tokenizer(config)
    model = get_model(config, tokenizer)
    params = model.init(jax.random.PRNGKey(0), example_batch(config))["params"]
    eval_step = make_eval_step(model)

    test_model(
        eval_step, params, config, tokenizer, str(tmp_path), "sec",
        {"tsv": paths["val_tsv"], "qrels": paths["qrels"],
         "save_secondary_output": True},
    )
    npz = np.load(tmp_path / "sec-secondary.npz")
    qd_keys = [k for k in npz.files if "<->" in k]
    model_keys = [k for k in npz.files if k.startswith("model::")]
    assert qd_keys, "no per-pair tensors saved"
    assert any("cosine_matrix" in k for k in qd_keys)
    assert any("mixer" in k for k in model_keys), model_keys
    assert any("kernel_bin_weights" in k for k in model_keys)

    # size filter: big tables are excluded from the model dump
    from matchmaker_tpu.evaluation import save_secondary_output

    big = {"token_embedding": np.zeros((100, 100), np.float32), "mixer": np.ones(1, np.float32)}
    save_secondary_output({}, str(tmp_path / "filter.npz"), model_params=big, max_param_size=256)
    f = np.load(tmp_path / "filter.npz")
    assert "model::mixer" in f.files and not any("token_embedding" in k for k in f.files)


def test_submodel_train_cache_write_then_replay(tmp_path, eight_devices):
    """submodel_train_cache_path (reference train.py:180-182, declared but
    never wired there): run 1 WRITES the IDCM chunk scores per train batch;
    run 2 REPLAYS them — the BERT tower is never invoked in the second run's
    traced program (we prove it by breaking the tower between runs)."""
    import jax
    import numpy as np

    from matchmaker_tpu.config import Config, auto_fill
    from matchmaker_tpu.training.trainer import Trainer

    rng = np.random.default_rng(9)
    train = tmp_path / "train.tsv"
    lines = []
    for i in range(16):
        q = f"query topic{i % 4}"
        pos = " ".join(f"w{rng.integers(40)}" for _ in range(20))
        neg = " ".join(f"n{rng.integers(40)}" for _ in range(20))
        lines.append(f"{q}\t{pos}\t{neg}\n")
    train.write_text("".join(lines))
    cache_path = str(tmp_path / "chunk_cache")

    def make_cfg():
        return Config(auto_fill({
            "model": "idcm",
            "model_input_type": "auto", "token_embedder_type": "auto",
            "bert_pretrained_model": "tiny-test", "use_fp16": False,
            "max_query_length": 8, "max_doc_length": 48,
            "idcm_chunk_size": 16, "idcm_overlap": 4,
            "idcm_sample_n": 2, "idcm_train_selection": True,
            "batch_size_train": 8, "batch_size_eval": 8,
            "epochs": 1, "loss": "margin",
            "learning_rate": 1e-3, "param_group0_learning_rate": 1e-3,
            "param_group1_learning_rate": 1e-3,
            "lr_schedule": "constant", "optimizer_warmup_steps": 0,
            "validate_every_n_batches": -1, "random_seed": 3,
            "validation_metric": "MRR@10",
            "expirement_base_path": str(tmp_path),
            "train_tsv": str(train),
            "submodel_train_cache_path": cache_path,
        }))

    run1 = tmp_path / "run1"; run1.mkdir()
    t1 = Trainer(make_cfg(), str(run1))
    t1.train()
    assert t1.global_step == 2
    assert os.path.exists(os.path.join(cache_path, "cache-meta.json"))

    # run 2: replay. Break the BERT chunk scorer — if the cached path is
    # really used, the traced program never calls it.
    from matchmaker_tpu.models import idcm as idcm_mod

    run2 = tmp_path / "run2"; run2.mkdir()
    t2 = Trainer(make_cfg(), str(run2))
    orig = idcm_mod.IDCM._bert_chunk_scores
    calls = []
    def boom(self, *a, **k):
        calls.append(1)
        return orig(self, *a, **k)
    idcm_mod.IDCM._bert_chunk_scores = boom
    try:
        t2.train()
    finally:
        idcm_mod.IDCM._bert_chunk_scores = orig
    assert t2.global_step == 2
    assert not calls, "BERT chunk scorer ran despite a warm replay cache"


def test_learned_scalar_telemetry(tiny, tmp_path, eight_devices):
    """Per-validation learned-scalar telemetry (reference train.py:240-244
    get_param_stats): model-internal learned scalars — TK's mixer and
    kernel-alpha scalers, IDCM's top_k_scoring — are selected by
    collect_learned_scalars and written to params-scalars.csv at each
    validation."""
    from matchmaker_tpu.models import get_model, example_batch
    from matchmaker_tpu.obs.scalars import collect_learned_scalars

    # unit: TK exposes mixer + kernel_alpha_scaler; IDCM exposes top_k_scoring
    class _Tok:
        vocab_size = 200
        pad_id = 0
        idf_lookup = None

        class vocab:
            token_to_id = {}

    tk_cfg = Config(auto_fill({
        "model": "tk", "model_input_type": "auto", "token_embedder_type": "auto",
        "_vocab_size": 200, "token_embedding_size": 32,
        "max_query_length": 8, "max_doc_length": 24,
        "tk_att_heads": 4, "tk_att_ff_dim": 32,
    }))
    model = get_model(tk_cfg, _Tok())
    params = model.init(jax.random.PRNGKey(0), example_batch(tk_cfg, batch_size=2))["params"]
    stats = collect_learned_scalars(params)
    assert any("mixer" in k for k in stats), sorted(stats)
    assert any("kernel_alpha_scaler" in k for k in stats), sorted(stats)
    # no weight matrices leaked in
    assert all("embedding" not in k for k in stats)

    idcm_cfg = Config(auto_fill({
        "model": "idcm", "model_input_type": "auto", "token_embedder_type": "auto",
        "_vocab_size": 200, "token_embedding_size": 32,
        "bert_pretrained_model": "tiny-test", "use_fp16": False,
        "max_query_length": 8, "max_doc_length": 64,
        "idcm_chunk_size": 16, "idcm_overlap": 4,
    }))
    model = get_model(idcm_cfg, _Tok())
    params = model.init(jax.random.PRNGKey(0), example_batch(idcm_cfg, batch_size=2))["params"]
    stats = collect_learned_scalars(params)
    assert any("top_k_scoring" in k for k in stats), sorted(stats)

    # integration: a TK smoke train writes the scalars at every validation
    run = str(tmp_path / "run_tk_scalars")
    os.makedirs(run)
    config = _base_config(
        tiny, str(tmp_path), model="tk", tk_att_heads=2, tk_att_ff_dim=16,
        token_embedding_size=16, epochs=1, enable_tensorboard=False,
    )
    trainer = Trainer(config, run)
    trainer.train()
    csv_path = os.path.join(run, "params-scalars.csv")
    assert os.path.exists(csv_path)
    rows = open(csv_path).read().strip().splitlines()
    assert any("mixer" in r for r in rows[1:]), rows[:5]
