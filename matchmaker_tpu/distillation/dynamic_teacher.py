"""Dynamic teacher: score training batches on the fly with a trained model.

Behavior contract: reference distillation/dynamic_teacher.py:114-292 — wraps
the training batch stream, scores every batch with a teacher checkpoint
(pairwise ``pos/neg`` scores; optionally full in-batch B×B score matrices via
ColBERT's all-pairs MaxSim for in-batch list losses), and attaches
``dyn_teacher_scores_*`` before the batch reaches the student.

TPU design: the reference isolates the teacher in a spawned subprocess pinned
to the last GPU (dynamic_teacher.py:132-157). Here the teacher is a second
jitted XLA program and the pipelining comes from JAX async dispatch: ``wrap``
places each host batch on the mesh, ENQUEUES the teacher program, and yields
immediately with the score futures attached — it never synchronizes on the
result. The student step consumes the futures directly, so the device queue
interleaves teacher(k+1) behind student(k) while the host thread
(data/loaders.device_prefetch) tokenizes ahead; on one chip the two programs
share the core (that's physics), but no host↔device round-trip ever stalls
the loop, and under a mesh the teacher shards over the same ``data`` axis as
the student. Overhead measured in benchmarks/dynamic_teacher_benchmark.py.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import jax
import numpy as np


def load_teacher(teacher_path: str, overrides: Optional[dict] = None):
    """Build (model, params, config) from a run folder (config.yaml +
    best-model.flax) or an HF-hub model name resolved through the local config
    stubs (reference dynamic_teacher.py:170-183 hub loading; weights come from
    the local HF cache via init_params' warmstart)."""
    from matchmaker_tpu.config import get_config_single, resolve_hub_config
    from matchmaker_tpu.data.tokenization import build_tokenizer
    from matchmaker_tpu.models import get_model, init_params
    from matchmaker_tpu.training.checkpoints import load_params

    if os.path.isdir(teacher_path):
        config = get_config_single(os.path.join(teacher_path, "config.yaml"))
    elif resolve_hub_config(teacher_path):
        config = get_config_single(teacher_path)  # hub stub; ckpt via HF cache
    else:
        raise FileNotFoundError(
            f"teacher {teacher_path} is neither a run folder nor a known hub config"
        )
    if overrides:
        config.update(overrides)
    tokenizer = build_tokenizer(config)
    model = get_model(config, tokenizer)
    params = init_params(model, config, jax.random.PRNGKey(0))
    ckpt = os.path.join(teacher_path, "best-model.flax")
    if os.path.exists(ckpt):
        params = load_params(ckpt, params)
    # pin params to the device(s) ONCE: host-numpy params re-upload the whole
    # model on EVERY jitted call — ~20 s/batch over a tunneled TPU
    from matchmaker_tpu.parallel.mesh import make_mesh, shard_params

    params = shard_params(params, make_mesh())
    return model, params, config, tokenizer


class DynamicTeacher:
    def __init__(self, config, teacher_path: Optional[str] = None):
        teacher_path = teacher_path or config["dynamic_teacher_path"]
        self.in_batch_scoring = config.get("dynamic_teacher_in_batch_scoring", False)
        self.per_term_scores = config.get("dynamic_teacher_per_term_scores", False)
        overrides = {}
        if self.in_batch_scoring:
            overrides["in_batch_negatives"] = True
        if self.per_term_scores:
            overrides["colbert_per_term_scores"] = True
        self.model, self.params, self.teacher_config, _ = load_teacher(
            teacher_path, overrides or None
        )

        model = self.model

        packed_triples = hasattr(type(model), "forward_triple")

        @jax.jit
        def score_pair(params, batch):
            from matchmaker_tpu.training.train_step import split_triple_batch

            if packed_triples and "doc_pos_ids" in batch:
                # same packed fast path as the student step (one query pass,
                # one 2B-row doc encode — models/bert_dot.forward_triple)
                pos_out, neg_out = model.apply(
                    {"params": params}, batch, method="forward_triple"
                )
            else:
                pos_batch, neg_batch = split_triple_batch(batch)
                pos_out = model.apply({"params": params}, pos_batch)
                neg_out = model.apply({"params": params}, neg_batch)
            out = {"pos": pos_out["score"], "neg": neg_out["score"]}
            if self.per_term_scores and "per_term_scores" in pos_out:
                out["pos_per_term"] = pos_out["per_term_scores"]
                out["neg_per_term"] = neg_out["per_term_scores"]
            if self.in_batch_scoring and "query_vecs" in pos_out:
                q = pos_out["query_vecs"]
                if q.ndim == 3:  # ColBERT all-pairs MaxSim (reference :269-279)
                    import jax.numpy as jnp

                    from matchmaker_tpu.ops.maxsim import maxsim_all_pairs

                    d_all = jnp.concatenate([pos_out["doc_vecs"], neg_out["doc_vecs"]], axis=0)
                    d_mask = jnp.concatenate(
                        [pos_out["doc_vecs_mask"], neg_out["doc_vecs_mask"]], axis=0
                    )
                    out["matrix"] = maxsim_all_pairs(q, d_all, pos_out["query_vecs_mask"], d_mask)
                else:
                    import jax.numpy as jnp

                    d_all = jnp.concatenate([pos_out["doc_vecs"], neg_out["doc_vecs"]], axis=0)
                    out["matrix"] = jnp.einsum("bd,nd->bn", q, d_all)
            return out

        self._score = score_pair

    def wrap(self, batch_iterator: Iterator[dict], sharding=None) -> Iterator[dict]:
        """Yield batches with teacher scores attached — WITHOUT synchronizing.

        Each batch is placed on the mesh (``sharding`` = the trainer's
        batch-dim sharding; None = default device placement), the teacher
        program is enqueued, and the batch is yielded with the resulting
        device arrays attached as futures. No ``np.asarray`` / blocking
        transfer happens here — the scores are first *used* inside the
        student's jitted step, so teacher and student stay back-to-back in
        the device queue while the host runs ahead (reference subprocess
        producer/consumer, dynamic_teacher.py:132-157, the XLA way)."""
        from matchmaker_tpu.parallel.multihost import place_local_rows

        for batch in batch_iterator:
            batch = {
                k: (place_local_rows(v, sharding) if sharding is not None and isinstance(v, np.ndarray) else v)
                for k, v in batch.items()
            }
            scored = self._score(self.params, batch)
            batch["pos_score"] = scored["pos"]
            batch["neg_score"] = scored["neg"]
            if "matrix" in scored:
                batch["dyn_teacher_matrix"] = scored["matrix"]
            if "pos_per_term" in scored:
                batch["dyn_teacher_pos_per_term"] = scored["pos_per_term"]
                batch["dyn_teacher_neg_per_term"] = scored["neg_per_term"]
            yield batch
