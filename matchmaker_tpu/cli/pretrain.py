"""MLM pre-training driver.

A working replacement for the reference's broken pre-train.py (SURVEY.md §2.1:
dead imports): masked-language-model pre-training of the first-party encoder
on an ``id \t text`` collection, with optional POD-style in-batch CLS
contrastive loss (reference modules/pre_train_heads.py:80). The resulting
``encoder`` subtree can warmstart any transformer ranker.

Usage:
    python -m matchmaker_tpu.cli.pretrain --config-file cfg.yaml --run-name mlm
Required config: collection_tsv, expirement_base_path; see configs/train/defaults.yaml
for shared keys (batch_size_train, max_doc_length, lr, ...).
"""

from __future__ import annotations

import os

# persistent XLA compile cache: remote/TPU compiles are expensive; cache them
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_compile_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import sys
import traceback

import numpy as np

from matchmaker_tpu.config import get_config
from matchmaker_tpu.data.loaders import device_prefetch
from matchmaker_tpu.data.mlm import IGNORE_LABEL, mlm_training_loader
from matchmaker_tpu.data.tokenization import build_tokenizer
from matchmaker_tpu.experiment import get_parser, prepare_experiment
from matchmaker_tpu.obs.perf_monitor import PerformanceMonitor


def main() -> int:
    # multi-process launch? must run before the first backend touch
    from matchmaker_tpu.parallel.multihost import maybe_initialize_distributed

    maybe_initialize_distributed()
    args = get_parser().parse_args()
    config = get_config(args.config_file, args.config_overwrites)
    run_folder = prepare_experiment(config["expirement_base_path"], args.run_name, config)
    print(f"[matchmaker-tpu] MLM pretrain run folder: {run_folder}")
    return run(config, run_folder)


def run(config, run_folder: str) -> int:
    """In-process MLM pre-train (callable from other drivers, e.g. the TAS-B
    recipe, cli/tasb_recipe.py)."""
    try:
        import jax
        import jax.numpy as jnp
        import optax

        from matchmaker_tpu.models.encoder import encoder_config_from_model_name
        from matchmaker_tpu.modules.mlm_head import MLMPretrainModel
        from matchmaker_tpu.parallel.mesh import batch_sharding, make_mesh, shard_params
        from matchmaker_tpu.training.checkpoints import save_params
        from matchmaker_tpu.training.optim import build_optimizer

        tokenizer = build_tokenizer(config)
        enc_cfg = encoder_config_from_model_name(config)
        model = MLMPretrainModel(
            enc_cfg, jnp.bfloat16 if config.get("use_fp16", True) else jnp.float32
        )
        mesh = make_mesh()
        sharding = batch_sharding(mesh)

        max_len = config.get("max_doc_length", 200)
        b = config.get("batch_size_train", 32)
        init_batch = {
            "seq_ids": np.zeros((b, max_len), np.int32),
            "seq_mask": np.ones((b, max_len), np.float32),
        }
        params = shard_params(
            model.init(jax.random.PRNGKey(config.get("random_seed", 42)), init_batch)["params"],
            mesh,
        )
        tx = build_optimizer(config, params)
        opt_state = tx.init(params)
        pod_weight = config.get("pod_contrastive_weight", 0.0)

        def loss_fn(params, batch):
            out = model.apply({"params": params}, batch)
            logits = out["mlm_logits"]
            labels = batch["mlm_labels"]
            mask = (labels != IGNORE_LABEL).astype(jnp.float32)
            safe = jnp.clip(labels, min=0)
            logp = jax.nn.log_softmax(logits, axis=-1)
            token_ll = jnp.take_along_axis(logp, safe[..., None], axis=-1).squeeze(-1)
            mlm_loss = -(token_ll * mask).sum() / jnp.maximum(mask.sum(), 1.0)
            loss = mlm_loss
            stats = {"mlm_loss": mlm_loss}
            if pod_weight > 0:
                cls = out["cls_vecs"]
                sims = cls @ cls.T
                targets = jnp.arange(cls.shape[0])
                pod = optax.softmax_cross_entropy_with_integer_labels(sims, targets).mean()
                stats["pod_loss"] = pod
                loss = loss + pod_weight * pod
            stats["loss"] = loss
            return loss, stats

        @jax.jit
        def step(params, opt_state, batch):
            (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, stats

        perf = PerformanceMonitor.get()
        perf.start_block("pretrain")
        global_step = 0
        max_steps = config.get("pretrain_max_steps", 0)
        for epoch in range(config.get("epochs", 1)):
            if max_steps and global_step >= max_steps:
                break
            loader = mlm_training_loader(config, tokenizer, config["collection_tsv"])
            for batch in device_prefetch(loader, sharding=sharding):
                if max_steps and global_step >= max_steps:
                    break
                params, opt_state, stats = step(params, opt_state, batch)
                global_step += 1
                if global_step % 100 == 0:
                    print(
                        f"epoch {epoch} step {global_step} "
                        f"mlm_loss={float(np.asarray(stats['mlm_loss'])):.4f}"
                    )
                if global_step % config.get("save_every_n_batches", 10000) == 0:
                    save_params(os.path.join(run_folder, "best-model.flax"), params)
        perf.stop_block("pretrain", global_step)
        save_params(os.path.join(run_folder, "best-model.flax"), params)
        perf.save_summary(os.path.join(run_folder, "efficiency-metrics.json"))
        perf.print_summary()
        return 0
    except Exception:
        traceback.print_exc()
        return 1


if __name__ == "__main__":
    sys.exit(main())
