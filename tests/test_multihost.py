"""Multi-process distributed training tests.

The reference inherits multi-host execution from the t5x/jax runtime
(SURVEY.md section 5.8); `mt3_tpu/parallel/multihost.py` owns it here.
These tests actually execute that path: two OS processes, each with 4
virtual CPU devices, joined via `jax.distributed.initialize` (gloo
collectives), running sharded train steps over a global mesh — and
assert the loss trajectory matches a single-process run bit-for-bit
within float tolerance.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from mt3_tpu.core.config import ModelConfig, RunConfig
from mt3_tpu.train import trainer as trainer_lib

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'multihost_worker.py')


def _free_port() -> int:
  with socket.socket() as s:
    s.bind(('127.0.0.1', 0))
    return s.getsockname()[1]


def _run_cluster(num_procs: int, extra_args=()) -> list:
  port = _free_port()
  env = {k: v for k, v in os.environ.items() if k != 'XLA_FLAGS'}
  procs = [
      subprocess.Popen(
          [sys.executable, _WORKER, str(i), str(num_procs), str(port),
           *extra_args],
          stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
      for i in range(num_procs)
  ]
  results = []
  for p in procs:
    out, err = p.communicate(timeout=600)
    assert p.returncode == 0, f'worker failed:\n{err}\n{out}'
    results.append(json.loads(out.strip().splitlines()[-1]))
  return results


def _single_process_losses(steps: int = 3) -> list:
  """Reference trajectory: same model/batch on the in-process mesh."""
  from mt3_tpu.parallel import partitioning
  model_config = ModelConfig(
      vocab_size=128, emb_dim=32, num_heads=4, num_encoder_layers=2,
      num_decoder_layers=2, head_dim=8, mlp_dim=64,
      mlp_activations=('gelu', 'linear'), dropout_rate=0.0,
      input_depth=16, max_positions=64)
  run_config = RunConfig(inputs_length=8, targets_length=16, batch_size=8,
                         warmup_steps=2)
  mesh = partitioning.make_mesh(2)
  tr = trainer_lib.Trainer(model_config=model_config,
                           run_config=run_config, mesh=mesh, seed=0)
  batch = trainer_lib.make_train_batch(
      np.random.RandomState(0), 8, run_config.inputs_length,
      run_config.targets_length, model_config.input_depth,
      model_config.vocab_size)
  return [float(tr.step(batch)['loss']) for _ in range(steps)]


def test_two_process_training_matches_single_process():
  """2-process cluster (4 devices each) == single-process loss curve."""
  results = _run_cluster(2)
  assert all(r['process_count'] == 2 for r in results)
  assert all(r['mesh'] == {'data': 4, 'model': 2} for r in results)
  # Both processes observe the identical (replicated) global loss.
  np.testing.assert_allclose(results[0]['losses'], results[1]['losses'],
                             rtol=1e-6)
  ref = _single_process_losses()
  # Different device count/reduction order: tolerance, not bit equality.
  np.testing.assert_allclose(results[0]['losses'], ref, rtol=2e-4)
  # Training is actually progressing.
  assert results[0]['losses'][-1] < results[0]['losses'][0]


def test_two_process_hybrid_mesh_training():
  """Hybrid ICI x DCN mesh (create_hybrid_device_mesh): model-parallel
  pairs stay within a process, data axis crosses processes."""
  results = _run_cluster(2, extra_args=('--hybrid',))
  np.testing.assert_allclose(results[0]['losses'], results[1]['losses'],
                             rtol=1e-6)
  ref = _single_process_losses()
  np.testing.assert_allclose(results[0]['losses'], ref, rtol=2e-4)
