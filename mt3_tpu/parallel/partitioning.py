"""Mesh construction and logical-axis partitioning.

TPU-native equivalent of the slice of t5x.partitioning MT3 uses
(reference gin/train.gin:138-140: PjitPartitioner over logical axes planted
in layers.py:242-244,408-413).  A 2-D ('data', 'model') jax.sharding.Mesh
carries both data parallelism (batch axis) and tensor parallelism (mlp /
heads / vocab axes); logical axis names on each parameter leaf are mapped
to mesh axes through a rules table and turned into NamedShardings consumed
by jax.jit in_shardings/out_shardings.

Multi-host: call jax.distributed.initialize() before building the mesh;
mesh construction below uses the global device list, so the same code runs
single-chip, single-slice, or multi-slice.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

PyTree = Any

DATA_AXIS = 'data'
MODEL_AXIS = 'model'

# Logical axis -> mesh axis.  Mirrors the t5x standard mapping: batch is
# data-parallel; the "wide" parameter axes (mlp, heads, vocab) are
# model-parallel; embed/kv/length/layers are replicated.
DEFAULT_RULES: Tuple[Tuple[str, Optional[str]], ...] = (
    ('batch', DATA_AXIS),
    ('vocab', MODEL_AXIS),
    ('embed', None),
    ('mlp', MODEL_AXIS),
    ('heads', MODEL_AXIS),
    ('kv', None),
    ('joined_kv', MODEL_AXIS),
    ('length', None),
    ('layers', None),
)


def make_mesh(num_model_partitions: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
  """Build a ('data', 'model') mesh over all (or given) devices."""
  devices = list(devices if devices is not None else jax.devices())
  n = len(devices)
  if n % num_model_partitions != 0:
    raise ValueError(
        f'{n} devices not divisible by {num_model_partitions} model '
        'partitions')
  shape = (n // num_model_partitions, num_model_partitions)
  return Mesh(np.asarray(devices).reshape(shape), (DATA_AXIS, MODEL_AXIS))


def logical_to_spec(axes: Tuple[str, ...],
                    rules=DEFAULT_RULES) -> PartitionSpec:
  """Map a tuple of logical axis names to a PartitionSpec."""
  table = dict(rules)
  entries = []
  for name in axes:
    if name not in table:
      raise ValueError(f'no partitioning rule for logical axis {name!r}')
    entries.append(table[name])
  return PartitionSpec(*entries)


def _is_axes(x) -> bool:
  return isinstance(x, tuple) and all(isinstance(e, str) for e in x)


def param_shardings(mesh: Mesh, axes_tree: PyTree,
                    rules=DEFAULT_RULES) -> PyTree:
  """Pytree of NamedShardings mirroring a logical-axes pytree."""
  return jax.tree_util.tree_map(
      lambda axes: NamedSharding(mesh, logical_to_spec(axes, rules)),
      axes_tree, is_leaf=_is_axes)


def shard_params(params: PyTree, axes_tree: PyTree, mesh: Mesh,
                 rules=DEFAULT_RULES) -> PyTree:
  """Place parameters on the mesh according to their logical axes."""
  shardings = param_shardings(mesh, axes_tree, rules)
  return jax.device_put(params, shardings)


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
  """Shard the leading (batch) axis over 'data'; rest replicated."""
  return NamedSharding(
      mesh, PartitionSpec(DATA_AXIS, *([None] * (ndim - 1))))


def batch_shardings(mesh: Mesh, batch: PyTree) -> PyTree:
  """Shardings for a batch pytree: leading axis over 'data'."""
  return jax.tree_util.tree_map(
      lambda x: data_sharding(mesh, np.ndim(x)), batch)


def replicated(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, PartitionSpec())


def with_logical_constraint(x, axes: Tuple[str, ...], mesh: Optional[Mesh],
                            rules=DEFAULT_RULES):
  """Annotate an intermediate activation with a logical sharding.

  Equivalent of t5x's with_sharding_constraint on activations
  (layers.py:242-244).  No-op when mesh is None (single-device jit).
  """
  if mesh is None:
    return x
  return jax.lax.with_sharding_constraint(
      x, NamedSharding(mesh, logical_to_spec(axes, rules)))
