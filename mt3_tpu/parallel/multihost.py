"""Multi-host / multi-slice mesh construction.

The reference inherits multi-host coordination from the t5x/jax runtime
(SURVEY.md section 5.8).  Here it is explicit: call `initialize()` once
per process before touching devices, then build a mesh with
`make_multihost_mesh()`.  Single-process usage needs neither — the
partitioning module's `make_mesh` over local devices is enough.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np

from mt3_tpu.parallel import partitioning


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
  """Initialize the jax distributed runtime (no-op if single process).

  On TPU pods with standard orchestration all arguments are discovered
  automatically; pass them explicitly otherwise.
  """
  if num_processes is not None and num_processes <= 1:
    return
  jax.distributed.initialize(
      coordinator_address=coordinator_address,
      num_processes=num_processes,
      process_id=process_id)


def make_multihost_mesh(num_model_partitions: int = 1,
                        dcn_data_parallelism: Optional[int] = None):
  """Mesh over all global devices; optionally hybrid ICI x DCN.

  With `dcn_data_parallelism` set (= number of slices), the data axis is
  laid out so inter-slice traffic rides DCN while model-parallel
  collectives stay on ICI within a slice.
  """
  if dcn_data_parallelism:
    from jax.experimental import mesh_utils
    n = jax.device_count()
    ici_data = n // dcn_data_parallelism // num_model_partitions
    # On TPU multi-slice the DCN granule is the slice (slice_index); on
    # CPU/GPU clusters (and the multi-process tests) devices carry no
    # distinct slice_index, so the process is the granule.
    slice_ids = {getattr(d, 'slice_index', 0) for d in jax.devices()}
    if len(slice_ids) > 1 and len(slice_ids) != dcn_data_parallelism:
      # Falling through to process granule here would build a mesh whose
      # DCN axis cuts across slice boundaries (data-parallel allreduce
      # over ICI+DCN mixed rings) — refuse instead.
      raise ValueError(
          f'dcn_data_parallelism={dcn_data_parallelism} does not match '
          f'the {len(slice_ids)} TPU slices; on multi-slice the DCN '
          'axis must equal the slice count')
    devices = mesh_utils.create_hybrid_device_mesh(
        (ici_data, num_model_partitions),
        (dcn_data_parallelism, 1),
        process_is_granule=len(slice_ids) < dcn_data_parallelism)
    devices = np.asarray(devices).reshape(-1, num_model_partitions)
    return jax.sharding.Mesh(
        devices, (partitioning.DATA_AXIS, partitioning.MODEL_AXIS))
  return partitioning.make_mesh(num_model_partitions,
                                devices=jax.devices())
