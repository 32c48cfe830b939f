"""Worker process for test_multihost.py: one host of a 2-process CPU cluster.

Runs the genuine multi-host path the reference inherits from the t5x/jax
runtime (SURVEY.md section 5.8): `jax.distributed.initialize` over a TCP
coordinator, a global ('data','model') mesh spanning both processes,
per-process batch shards assembled with make_array_from_process_local_data
(Trainer.shard_batch), and sharded train steps whose collectives run over
gloo.  Prints one JSON line with the per-step losses for the parent test
to compare against a single-process run.

Usage: python multihost_worker.py PROC_ID NUM_PROCS PORT [--hybrid]
"""

import json
import os
import sys

proc_id, num_procs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
hybrid = '--hybrid' in sys.argv

os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_cpu_collectives_implementation', 'gloo')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mt3_tpu.core.config import ModelConfig, RunConfig  # noqa: E402
from mt3_tpu.parallel import multihost  # noqa: E402
from mt3_tpu.train import trainer as trainer_lib  # noqa: E402

import numpy as np  # noqa: E402

multihost.initialize(coordinator_address=f'127.0.0.1:{port}',
                     num_processes=num_procs, process_id=proc_id)
assert jax.process_count() == num_procs, jax.process_count()
assert jax.device_count() == 4 * num_procs

mesh = multihost.make_multihost_mesh(
    num_model_partitions=2,
    dcn_data_parallelism=num_procs if hybrid else None)
assert dict(mesh.shape) == {'data': 2 * num_procs, 'model': 2}, mesh.shape
if hybrid:
  # The DCN (process) axis must be outermost on 'data': each model-parallel
  # pair lives within one process so TP collectives stay on "ICI".
  for row in mesh.devices:
    assert len({d.process_index for d in row}) == 1, mesh.devices

model_config = ModelConfig(
    vocab_size=128, emb_dim=32, num_heads=4, num_encoder_layers=2,
    num_decoder_layers=2, head_dim=8, mlp_dim=64,
    mlp_activations=('gelu', 'linear'), dropout_rate=0.0,
    input_depth=16, max_positions=64)
run_config = RunConfig(inputs_length=8, targets_length=16, batch_size=8,
                       warmup_steps=2)

tr = trainer_lib.Trainer(model_config=model_config, run_config=run_config,
                         mesh=mesh, seed=0)

global_batch = trainer_lib.make_train_batch(
    np.random.RandomState(0), 8, run_config.inputs_length,
    run_config.targets_length, model_config.input_depth,
    model_config.vocab_size)
per_proc = 8 // num_procs
local_batch = {k: v[proc_id * per_proc:(proc_id + 1) * per_proc]
               for k, v in global_batch.items()}

losses = []
for _ in range(3):
  metrics = tr.step(local_batch)
  losses.append(float(metrics['loss']))

print(json.dumps({'proc': proc_id, 'losses': losses,
                  'mesh': dict(mesh.shape),
                  'process_count': jax.process_count()}), flush=True)
