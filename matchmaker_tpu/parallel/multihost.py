"""Multi-host (multi-process) bootstrap and per-process data placement.

The scale path past one host (SURVEY §5.8): each host runs ONE copy of the
same CLI; `jax.distributed.initialize` wires the processes into a single JAX
runtime whose global device set spans every host's chips. Meshes built by
`parallel/mesh.py` then cover all chips, GSPMD collectives ride ICI within a
host/pod slice and DCN between them — no application-level NCCL/MPI (the
reference's DataParallel, train.py:193-203, stops at one box).

Launch contract (docs/multihost_runbook.md): every process gets

    MATCHMAKER_COORDINATOR   host:port of process 0 (required to activate)
    MATCHMAKER_NUM_PROCESSES total process count
    MATCHMAKER_PROCESS_ID    this process's rank (0-based)

(or the standard TPU-pod metadata that `jax.distributed.initialize()` reads
natively — on Cloud TPU pods the three env vars are unnecessary and
`maybe_initialize_distributed` falls through to the no-arg form when
`MATCHMAKER_MULTIHOST=tpu_pod` is set.)

Data feeding: each process tokenizes only its slice of the global batch and
`make_global_batch` assembles the sharded global array from process-local
rows via `jax.make_array_from_process_local_data` — host-local numpy never
crosses DCN; only the collectives do.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

_initialized = False


def maybe_initialize_distributed(config=None) -> bool:
    """Initialize `jax.distributed` when a multi-process launch is detected.

    Must run BEFORE the first jax backend touch (the CLIs call it first
    thing). Returns True when running multi-process. Idempotent."""
    global _initialized
    if _initialized:
        return True
    coordinator = os.environ.get("MATCHMAKER_COORDINATOR")
    mode = os.environ.get("MATCHMAKER_MULTIHOST", "")
    if not coordinator and mode != "tpu_pod":
        return False

    import jax

    if coordinator:
        num = int(os.environ["MATCHMAKER_NUM_PROCESSES"])
        pid = int(os.environ["MATCHMAKER_PROCESS_ID"])
        jax.distributed.initialize(
            coordinator_address=coordinator, num_processes=num, process_id=pid
        )
    else:  # tpu_pod: let JAX read the TPU metadata server
        jax.distributed.initialize()
    _initialized = True
    print(
        f"[multihost] process {process_index()}/{process_count()} up: "
        f"{local_device_count()} local / {global_device_count()} global devices",
        flush=True,
    )
    return True


def process_count() -> int:
    import jax

    return jax.process_count()


def process_index() -> int:
    import jax

    return jax.process_index()


def is_primary() -> bool:
    """True on the process that owns logging / run-folder writes."""
    return process_index() == 0


def local_device_count() -> int:
    import jax

    return jax.local_device_count()


def global_device_count() -> int:
    import jax

    return jax.device_count()


def per_process_batch(global_batch: int) -> int:
    """Rows THIS process must produce of a ``global_batch``-row batch.

    The global batch must divide evenly — silent imbalance would skew the
    in-batch-negative loss and the gradient all-reduce weighting."""
    n = process_count()
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by {n} processes"
        )
    return global_batch // n


def process_shard_bounds(n_items: int, n_processes: Optional[int] = None,
                         pid: Optional[int] = None) -> Tuple[int, int]:
    """[lo, hi) row range of a ``n_items`` corpus this process loads.

    Remainder rows go to the LAST process (hi is exclusive); every row is
    owned by exactly one process."""
    n = n_processes if n_processes is not None else process_count()
    p = pid if pid is not None else process_index()
    per = n_items // n
    lo = p * per
    hi = n_items if p == n - 1 else lo + per
    return lo, hi


def make_global_batch(batch: Dict[str, np.ndarray], sharding) -> Dict:
    """Assemble a GLOBAL sharded batch from THIS process's local rows.

    ``batch`` holds this process's ``global_batch / process_count`` rows;
    the returned dict holds global jax.Arrays laid out by ``sharding``
    (every process must call this with its own slice — it's a collective
    in spirit, though no data moves: each shard stays on its host)."""
    import jax

    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            out[k] = jax.make_array_from_process_local_data(sharding, v)
        else:
            out[k] = v
    return out


def place_local_rows(x: np.ndarray, sharding):
    """Place one host-local array as (part of) a global sharded array.

    Single-process: plain ``device_put`` (x IS the global batch).
    Multi-process: ``x`` holds only this process's rows of the global batch
    and is assembled via ``make_array_from_process_local_data``."""
    import jax

    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, x)
    return jax.device_put(x, sharding)
