"""Training entry point.

Usage (reference-compatible, train.py:50-62):
    python -m matchmaker_tpu.cli.train --config-file cfg1.yaml cfg2.yaml \
        --run-name my_run [--config-overwrites "k: v,k2: v2"]
    python -m matchmaker_tpu.cli.train --continue-folder <run folder>   # eval only
"""

from __future__ import annotations

import os

# persistent XLA compile cache: remote/TPU compiles are expensive; cache them
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_compile_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import sys
import traceback

from matchmaker_tpu.config import get_config, get_config_single
from matchmaker_tpu.experiment import get_parser, prepare_experiment
from matchmaker_tpu.obs.perf_monitor import PerformanceMonitor
from matchmaker_tpu.training.trainer import Trainer


def main() -> int:
    # multi-process launch? must run before the first backend touch
    from matchmaker_tpu.parallel.multihost import maybe_initialize_distributed

    maybe_initialize_distributed()
    args = get_parser().parse_args()
    perf = PerformanceMonitor.get()
    perf.start_block("startup")

    if args.continue_folder:
        run_folder = args.continue_folder
        config = get_config_single(os.path.join(run_folder, "config.yaml"), args.config_overwrites)
        evaluate_only = True
    else:
        if not args.config_file or not args.run_name:
            print("either --continue-folder or --config-file + --run-name are required")
            return 2
        config = get_config(args.config_file, args.config_overwrites)
        run_folder = prepare_experiment(config["expirement_base_path"], args.run_name, config)
        evaluate_only = False

    print(f"[matchmaker-tpu] run folder: {run_folder}")
    try:
        trainer = Trainer(config, run_folder)
        perf.stop_block("startup")
        if evaluate_only and config.get("train_mode", "Evaluate") == "resume":
            # true mid-run resume from the saved train state (needs
            # save_train_state: true in the original run)
            trainer.resume_from_train_state()
            trainer.train()
        elif evaluate_only:
            best = os.path.join(run_folder, "best-model.flax")
            if os.path.exists(best):
                from matchmaker_tpu.training.checkpoints import load_params

                trainer.params = load_params(best, trainer.params)
            trainer.final_evaluations()
        else:
            trainer.train()
        return 0
    except Exception:
        traceback.print_exc()
        return 1


if __name__ == "__main__":
    sys.exit(main())
