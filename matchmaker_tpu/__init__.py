"""matchmaker_tpu — a TPU-native neural search framework.

A ground-up JAX/Flax/Pallas re-design of the capabilities of
sebastian-hofstaetter/matchmaker (training, evaluating and analyzing neural
re-ranking and dense-retrieval models), built for TPU hardware:

- all compute paths are jit-compiled XLA programs (bf16 on the MXU),
- multi-chip scale-out uses `jax.sharding.Mesh` + collectives over ICI
  (no DataParallel/NCCL translation),
- nearest-neighbor search is a first-party Pallas blocked MIPS + top-k
  kernel over a device-sharded corpus (replacing faiss/ScaNN),
- host-side IO is a fixed-shape, prefetching data pipeline.

Reference layer map: /root/repo/SURVEY.md.
"""

__version__ = "0.1.0"
