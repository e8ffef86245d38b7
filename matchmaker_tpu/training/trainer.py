"""The training driver.

Contract: reference train.py — config-driven build, epoch loop over the triple
loader, continuous validation every ``validate_every_n_batches`` with best-
checkpoint saving + rotation, early stopping, loss CSV every 100 steps, end
validation / test / leaderboard passes (train.py:258-763).

TPU differences: the step is one jitted XLA program over a data-sharded mesh
(no DataParallel, no AMP GradScaler — bf16 is a dtype policy, grads are always
f32); batches prefetch host→HBM in a background thread; checkpoints are flax
msgpack + orbax train state.
"""

from __future__ import annotations

import csv
import math
import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from matchmaker_tpu.data.loaders import device_prefetch, triple_training_loader
from matchmaker_tpu.data.tokenization import build_tokenizer
from matchmaker_tpu.evaluation import save_sorted_results, test_model, validate_model
from matchmaker_tpu.experiment import EarlyStopping, save_best_info
from matchmaker_tpu.losses import get_loss
from matchmaker_tpu.models import example_batch, get_model
from matchmaker_tpu.obs.perf_monitor import PerformanceMonitor
from matchmaker_tpu.parallel.mesh import batch_sharding, make_mesh, shard_params
from matchmaker_tpu.training.checkpoints import load_params, rotate_best, save_params
from matchmaker_tpu.training.optim import build_optimizer
from matchmaker_tpu.training.train_step import make_eval_step, make_train_step


class Trainer:
    def __init__(self, config, run_folder: str):
        self.config = config
        self.run_folder = run_folder
        self.perf = PerformanceMonitor.get()

        self.tokenizer = build_tokenizer(config)
        self.model = get_model(config, self.tokenizer)

        from matchmaker_tpu.parallel import multihost

        self.n_processes = multihost.process_count()
        self.is_primary = multihost.is_primary()
        # save_train_state under multi-process launches is a COLLECTIVE:
        # every process calls TrainStateCheckpointer.save (orbax coordinates
        # shard writes via jax.distributed; on a pod the directory must be
        # shared storage — docs/multihost_runbook.md)

        self.mesh = make_mesh()
        self.batch_sharding = batch_sharding(self.mesh)

        rng = jax.random.PRNGKey(config.get("random_seed", 42))
        from matchmaker_tpu.models import init_params

        params = init_params(self.model, config, rng)
        if config.get("train_qa_spans", False) and config.get("qa_uncertainty_weighting", True):
            # learned log-variances for the uncertainty-weighted multi-loss
            # merge: [ranking, qa span, answerability] (reference train.py:481)
            params["mtl_log_vars"] = np.zeros(3, dtype=np.float32)
        self.params = shard_params(params, self.mesh)

        warmstart = config.get("warmstart_model_path")
        if warmstart:
            self.params = load_params(warmstart, self.params)
        warmstart_enc = config.get("warmstart_encoder_path")
        if warmstart_enc:
            # encoder-only graft, e.g. from an MLM pre-train run
            # (checkpoints.load_encoder_subtree) — heads stay fresh
            from matchmaker_tpu.training.checkpoints import load_encoder_subtree

            self.params = shard_params(
                load_encoder_subtree(warmstart_enc, self.params), self.mesh
            )

        self.tx = build_optimizer(config, self.params)
        self.opt_state = self.tx.init(self.params)

        self.losses = get_loss(config)
        self.train_step = make_train_step(self.model, self.losses, self.tx, config)
        # multi-process: every process scores the full eval batch stream with
        # a data-sharded forward + replicated outputs (see make_eval_step) so
        # metrics/early-stopping stay in lockstep; file writes stay primary-only
        self.eval_step = make_eval_step(
            self.model,
            mesh=self.mesh if self.n_processes > 1 else None,
            data_sharding=self.batch_sharding if self.n_processes > 1 else None,
        )

        self.early_stopping = EarlyStopping(
            patience=config.get("early_stopping_patience", 30), mode="max"
        )
        from matchmaker_tpu.obs.scalars import ScalarWriter

        self.scalars = ScalarWriter(run_folder, config.get("enable_tensorboard", True))
        self.best_metric = -math.inf
        self.global_step = 0
        # data cursor for mid-epoch resume: epoch index + batches consumed
        # within it (persisted in the train-state snapshot)
        self._epoch = 0
        self._epoch_batch = 0
        self._loss_csv = os.path.join(run_folder, "training-loss.csv")

        # startup smoke: param counts per top-level subtree ("just test that it
        # works" — reference get_param_stats, train.py:240-244)
        counts = {
            k: sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(v))
            for k, v in self.params.items()
        }
        total = sum(counts.values())
        print(f"[trainer] model '{config.get('model')}' params: {total:,} "
              + " ".join(f"{k}={v:,}" for k, v in sorted(counts.items())))

    # ------------------------------------------------------------------
    def _log_loss(self, epoch: int, stats: Dict) -> None:
        if not self.is_primary:
            return  # one writer per run folder (multi-process launches)
        exists = os.path.exists(self._loss_csv)
        host_stats = {k: float(np.asarray(v)) for k, v in stats.items()}
        self.scalars.write(host_stats, self.global_step)
        with open(self._loss_csv, "a", newline="", encoding="utf-8") as f:
            w = csv.writer(f)
            keys = sorted(host_stats)
            if not exists:
                w.writerow(["epoch", "step"] + keys)
            w.writerow([epoch, self.global_step] + [host_stats[k] for k in keys])

    def _validate(self, epoch: int) -> bool:
        """Continuous validation; returns True if training should stop."""
        vcfg = self.config.get("validation_cont")
        if not vcfg:
            return False
        metrics, metric_value, _ = validate_model(
            "cont",
            self.eval_step,
            self.params,
            self.config,
            self.tokenizer,
            self.run_folder,
            vcfg,
            epoch,
            self.global_step,
            use_cache=self.config.get("validation_cont_use_cache", True),
        )
        if metric_value > self.best_metric:
            self.best_metric = metric_value
            if self.is_primary:  # one writer per run folder; params replicated
                rotate_best(self.run_folder, self.config.get("store_n_best_checkpoints", 1))
                save_params(os.path.join(self.run_folder, "best-model.flax"), self.params)
                save_best_info(
                    self.run_folder,
                    self.config.get("validation_metric", "MRR@10"),
                    metric_value,
                    epoch,
                    self.global_step,
                )
        if self.config.get("save_train_state", False):
            self._save_train_state()
        if self.is_primary:
            # learned-scalar telemetry: TK mixer / kernel alphas, TK-Sparse
            # gate mixers, IDCM selection weights, MTL log-vars, ... — the
            # per-validation traces researchers watch (reference
            # get_param_stats, train.py:240-244)
            from matchmaker_tpu.obs.scalars import collect_learned_scalars

            stats = collect_learned_scalars(self.params)
            if stats:
                self.scalars.write(stats, self.global_step, prefix="params")
        min_steps = self.config.get("min_steps_training", -1)
        stop = self.early_stopping.step(metric_value)
        if stop and min_steps > 0 and self.global_step < min_steps:
            return False
        return stop

    def _train_state_checkpointer(self):
        if not hasattr(self, "_ts_ckpt"):
            from matchmaker_tpu.training.checkpoints import TrainStateCheckpointer

            self._ts_ckpt = TrainStateCheckpointer(os.path.join(self.run_folder, "train_state"))
        return self._ts_ckpt

    def _save_train_state(self) -> None:
        # full params+optimizer+step+data-cursor snapshot for true mid-run
        # resume (beyond the reference, which restarts eval-only — SURVEY.md
        # §5.4). Multi-process: COLLECTIVE — every process calls save and
        # orbax coordinates the shard writes.
        self._train_state_checkpointer().save(
            self.global_step,
            {"params": self.params, "opt_state": self.opt_state,
             "step": self.global_step,
             "epoch": self._epoch, "epoch_batch": self._epoch_batch},
        )

    def resume_from_train_state(self) -> bool:
        """Restore params+optimizer+step+data cursor from the latest snapshot;
        True if found. ``train()`` then continues mid-epoch: it starts at the
        saved epoch and fast-forwards the loader past the consumed batches
        (skipped pre-tokenization for the file loader)."""
        ckpt = self._train_state_checkpointer()
        step = ckpt.latest_step()
        if step is None:
            return False
        state = ckpt.restore(
            step, {"params": self.params, "opt_state": self.opt_state,
                   "step": 0, "epoch": 0, "epoch_batch": 0}
        )
        # orbax restores leaves whose template was a single-device array
        # (optax step counts — tx.init creates them eagerly on the default
        # device, not on the mesh) as COMMITTED single-device arrays; under a
        # multi-process mesh a jit mixing those with mesh-sharded params
        # raises "incompatible devices". Hand them back as host arrays —
        # uncommitted, exactly like the fresh tx.init leaves they replace.
        def _unpin(x):
            if isinstance(x, jax.Array) and isinstance(
                x.sharding, jax.sharding.SingleDeviceSharding
            ):
                return np.asarray(x)
            return x

        self.params = state["params"]
        self.opt_state = jax.tree_util.tree_map(_unpin, state["opt_state"])
        self.global_step = int(state["step"])
        self._epoch = int(state["epoch"])
        self._epoch_batch = int(state["epoch_batch"])
        print(f"[trainer] resumed train state at step {self.global_step} "
              f"(epoch {self._epoch}, batch {self._epoch_batch})")
        return True

    # ------------------------------------------------------------------
    def train(self) -> None:
        config = self.config
        validate_every = config.get("validate_every_n_batches", 4000)
        epochs = config.get("epochs", 1)
        stopped = False

        # multi-process data contract: every process tokenizes only ITS rows
        # of the global batch; place_local_rows assembles the global sharded
        # array (parallel/multihost.py). Samplers decorrelate by seed; the
        # file loader strides whole batches round-robin across processes.
        from matchmaker_tpu.parallel import multihost

        n_proc = self.n_processes
        pid = multihost.process_index()
        global_bs = config.get("batch_size_train", 32)
        local_bs = multihost.per_process_batch(global_bs) if n_proc > 1 else global_bs
        seed = config.get("random_seed", 42) + 7919 * pid

        teacher = None
        if config.get("dynamic_teacher", False):
            from matchmaker_tpu.distillation.dynamic_teacher import DynamicTeacher

            teacher = DynamicTeacher(config)

        sampler = None
        if config.get("dynamic_sampler", False) == "listwise":
            # qrels + candidate-run list sampler feeding the listwise losses
            # (reference IrDynamicTripleDatasetLoader, list_training_loader.py:30)
            from matchmaker_tpu.data.list_sampler import ListwiseDynamicSampler

            # the batch's leading (query) dim is sharded over every mesh device
            # — round up so device_put can split it (4 queries on 8 chips fails)
            n_dev = int(self.mesh.devices.size)
            qpb = config.get("queries_per_batch", 4)
            qpb_sharded = -(-qpb // n_dev) * n_dev
            if qpb_sharded != qpb:
                print(
                    f"[trainer] queries_per_batch {qpb} not divisible by the "
                    f"{n_dev}-device mesh; using {qpb_sharded}", flush=True,
                )
            sampler = ListwiseDynamicSampler(
                collection_file=config["dynamic_sampler_collection"],
                query_file=config["dynamic_sampler_queries"],
                qrels_file=config["dynamic_sampler_qrels"],
                candidate_file=config["dynamic_sampler_candidates"],
                list_size=config.get("list_size", 8),
                queries_per_batch=qpb_sharded // n_proc,
                seed=seed,
            )
        elif config.get("dynamic_sampler", False):
            from matchmaker_tpu.data.tas_balanced import TASBalancedSampler

            sampler = TASBalancedSampler(
                collection_file=config["dynamic_sampler_collection"],
                query_file=config["dynamic_sampler_queries"],
                pairs_with_teacher_scores=config["dynamic_sampler_pairs_with_teacher_scores"],
                query_cluster_file=config["dynamic_sampler_query_cluster_file"],
                batch_size=local_bs,
                clusters_per_batch=config.get("tas_balanced_clusters_per_batch", 1),
                pair_balancing_strategy="bins"
                if config.get("tas_balanced_pair_strategy", "random") != "random"
                else "random",
                seed=seed,
            )

        # cross-experiment replay cache for expensive submodel tensors during
        # TRAINING (IDCM stage-2: the frozen BERT tower's chunk scores are
        # deterministic per batch — cache once, replay across selection-loss
        # experiments). The reference declares this (train.py:180-182,
        # submodel_train_cache_path) but never wires it; here it works.
        # Order-replay contract: identical data/seed/batch-size across runs.
        cacher, cache_write = None, False
        cache_path = config.get("submodel_train_cache_path")
        if cache_path:
            from matchmaker_tpu.utils.replay_cache import CrossExperimentReplayCache

            cache_write = not os.path.exists(
                os.path.join(cache_path, "cache-meta.json")
            )
            cacher = CrossExperimentReplayCache(cache_path, write=cache_write)
            print(
                f"[trainer] submodel train cache {'WRITE' if cache_write else 'REPLAY'}: {cache_path}"
            )

        def replay_cached(it):
            for batch in it:
                cached = cacher.get_next()
                if cached is not None:
                    b = batch[next(iter(batch))].shape[0]
                    batch = dict(batch)
                    batch["bert_part_cached_pos"] = np.asarray(cached[:b], np.float32)
                    batch["bert_part_cached_neg"] = np.asarray(cached[b:], np.float32)
                yield batch

        self.perf.start_block("train")
        max_batches = config.get("max_training_batches", 0)
        for epoch in range(self._epoch, epochs):
            if stopped:
                break
            self._epoch = epoch
            # mid-epoch resume: skip this epoch's already-consumed batches
            # (only the resumed epoch carries a non-zero cursor)
            skip = self._epoch_batch
            if sampler is not None:
                loader = sampler.batches(
                    config, self.tokenizer, max_batches=config.get("tas_batches_per_epoch", 1000)
                )
                if skip:
                    import itertools

                    loader = itertools.islice(loader, skip, None)
            else:
                loader = triple_training_loader(
                    config, self.tokenizer, config["train_tsv"], batch_size=local_bs,
                    process_stride=(pid, n_proc) if n_proc > 1 else None,
                    skip_batches=skip,
                )
            if cacher is not None and not cache_write:
                loader = replay_cached(loader)
            if teacher is not None:
                loader = teacher.wrap(loader, sharding=self.batch_sharding)
            recent_failures = []
            for batch in device_prefetch(loader, sharding=self.batch_sharding):
                self._epoch_batch += 1
                try:
                    self.params, self.opt_state, stats = self.train_step(
                        self.params, self.opt_state, batch
                    )
                except Exception as e:
                    # only device OOM is skippable (reference checks "CUDA out
                    # of memory" explicitly, train.py:578-593); every other
                    # error — incl. XLA INVALID_ARGUMENT etc., which subclass
                    # RuntimeError via JaxRuntimeError — must raise
                    msg = str(e)
                    transient = any(
                        s in msg for s in ("RESOURCE_EXHAUSTED", "out of memory", "OOM")
                    )
                    if not transient:
                        raise
                    if config.get("donate_train_state", False):
                        # donated params/opt buffers are invalid after a failed
                        # step — continuing would train on garbage. Surface the
                        # trade instead of skipping (train_step.py donation note).
                        raise RuntimeError(
                            "train step hit device OOM with donate_train_state "
                            "enabled; the donated train state cannot be reused. "
                            "Set donate_train_state: false to make OOM batches "
                            "skippable (costs ~12 bytes/param of HBM traffic per "
                            "step), or lower batch_size_train."
                        ) from e
                    recent_failures = [s for s in recent_failures if self.global_step - s < 4]
                    recent_failures.append(self.global_step)
                    print(f"[trainer] step {self.global_step} failed ({type(e).__name__}); skipping batch")
                    if len(recent_failures) >= 2:
                        raise
                    continue
                self.global_step += 1
                if cacher is not None and cache_write and "_cache_pos_passage_scores" in stats:
                    cacher.cache(np.concatenate([
                        np.asarray(stats.pop("_cache_pos_passage_scores")),
                        np.asarray(stats.pop("_cache_neg_passage_scores")),
                    ], axis=0))
                elif "_cache_pos_passage_scores" in stats:
                    stats.pop("_cache_pos_passage_scores")
                    stats.pop("_cache_neg_passage_scores")
                if self.global_step % 100 == 0:
                    self._log_loss(epoch, stats)
                if validate_every > 0 and self.global_step % validate_every == 0:
                    if self._validate(epoch):
                        stopped = True
                        break
                if max_batches and self.global_step >= max_batches:
                    # hard step cap (testing / budgeted runs): snapshot the
                    # train state so the run is resumable from exactly here
                    if config.get("save_train_state", False):
                        self._save_train_state()
                    stopped = True
                    break
            else:
                # end-of-epoch validation keeps short epochs honest
                stopped = self._validate(epoch) or stopped
                self._epoch_batch = 0  # next epoch starts at its first batch
        if cacher is not None and cache_write:
            cacher.finish()
        self.perf.stop_block("train", self.global_step)
        self.scalars.flush()  # train + params scalar CSVs land on disk

        if self.n_processes > 1:
            # keep processes in step before filesystem writes; only the
            # primary owns the run folder (params are replicated, so every
            # process already holds the final weights)
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("matchmaker_train_end")
            best_path = os.path.join(self.run_folder, "best-model.flax")
            if self.is_primary and self.best_metric == -math.inf:
                # no continuous validation saved a best checkpoint THIS run →
                # final params are the best we have (a stale best-model.flax
                # left in a reused run folder must not suppress this save)
                save_params(best_path, self.params)
            self.perf.save_summary(
                os.path.join(self.run_folder, f"efficiency-metrics-p{jax.process_index()}.json")
            )
            self.perf.print_summary()
            return

        # reload best checkpoint for final evals (reference train.py:694-717).
        # "best exists" is tracked in-memory (did _validate save one THIS
        # run?), not by probing the filesystem — a stale best-model.flax in a
        # reused run folder would otherwise both suppress saving this run's
        # final params and reload the stale weights.
        best_path = os.path.join(self.run_folder, "best-model.flax")
        if self.best_metric > -math.inf and os.path.exists(best_path):
            self.params = load_params(best_path, self.params)
        else:
            save_params(best_path, self.params)

        self.final_evaluations()
        self.perf.save_summary(os.path.join(self.run_folder, "efficiency-metrics.json"))
        self.perf.print_summary()

        if self.config.get("run_dense_retrieval_eval", False):
            # auto-launch full-corpus retrieval on the freshly trained model
            # (reference train.py:758-763 runs it as a subprocess; here it is
            # an in-process call on the same devices)
            from matchmaker_tpu.cli.dense_retrieval import run as run_dense_retrieval

            dr_config = dict(self.config)
            dr_config["trained_model"] = self.run_folder
            dr_folder = os.path.join(self.run_folder, "dense-retrieval")
            os.makedirs(dr_folder, exist_ok=True)
            run_dense_retrieval("encode+index+search", dr_config, dr_folder)

    # ------------------------------------------------------------------
    def final_evaluations(self) -> None:
        config = self.config
        for section, kind in (("validation_end", "end"), ("test", "test")):
            entries = config.get(section) or {}
            for name, entry in entries.items():
                metrics = test_model(
                    self.eval_step,
                    self.params,
                    config,
                    self.tokenizer,
                    self.run_folder,
                    f"{kind}-{name}",
                    entry,
                )
                if metrics:
                    headline = config.get("validation_metric", "MRR@10")
                    print(f"[{kind}:{name}] {headline}={metrics.get(headline, float('nan')):.4f}")
        for name, entry in (config.get("leaderboard") or {}).items():
            from matchmaker_tpu.evaluation import evaluate_model

            results, _ = evaluate_model(
                self.eval_step, self.params, config, self.tokenizer, entry["tsv"]
            )
            save_sorted_results(
                results, os.path.join(self.run_folder, f"leaderboard-{name}-output.txt")
            )
