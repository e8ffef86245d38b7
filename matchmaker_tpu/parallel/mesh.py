"""Device mesh + sharding helpers.

The parallelism story of the whole framework (replacing the reference's
single-process ``torch.nn.DataParallel``, train.py:193-203, and faiss's
internal GPU sharding, faiss_indices.py:63-67):

- ``data`` axis: batch-sharded training/inference. XLA inserts the gradient
  all-reduce over ICI; in-batch negatives all-gather doc vectors across it.
- ``corpus`` axis (retrieval): the corpus embedding matrix is sharded row-wise;
  each chip computes a partial top-k which is merged with an all-gather.

Models at this scale (DistilBERT) replicate parameters; the helpers still
accept a param partition spec so tensor-parallel layouts can be layered in.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_names: Sequence[str] = ("data",), devices=None, shape=None) -> Mesh:
    """Build a Mesh over all (or given) devices.

    1-axis meshes take every device; multi-axis meshes need ``shape``.
    """
    devices = list(devices) if devices is not None else jax.devices()
    if shape is None:
        if len(axis_names) != 1:
            raise ValueError("multi-axis mesh requires an explicit shape")
        shape = (len(devices),)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))


def corpus_axes(mesh: Mesh):
    """The mesh axes corpus rows shard over — ALL of them, as one composite
    axis. On a 1-axis ('data',) mesh this is just 'data'; on a multi-host
    ('dcn', 'ici') mesh rows split over every chip and the top-k merge rides
    ICI within each host group and DCN between groups (SURVEY §5.8)."""
    names = tuple(mesh.axis_names)
    return names[0] if len(names) == 1 else names


def axis_size(mesh: Mesh, axis) -> int:
    """Total shard count along ``axis`` (a name or a tuple of names)."""
    if isinstance(axis, (tuple, list)):
        return int(np.prod([mesh.shape[a] for a in axis]))
    return int(mesh.shape[axis])


def batch_sharding(mesh: Mesh, axis=None) -> NamedSharding:
    """Shard the leading (batch) dimension over ``axis`` (default: every mesh
    axis — on a ('dcn', 'ici') mesh the batch splits over all chips),
    replicate the rest."""
    return NamedSharding(mesh, P(axis if axis is not None else corpus_axes(mesh)))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh, spec: Optional[P] = None):
    """Place params on the mesh (replicated unless a spec pytree is given)."""
    sharding = NamedSharding(mesh, spec if spec is not None else P())
    return jax.device_put(params, sharding)
