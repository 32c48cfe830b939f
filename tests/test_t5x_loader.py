"""T5X checkpoint loader test against a synthetic checkpoint on disk."""

import os

import numpy as np
import pytest


def _write_ts_array(root, name, array):
  import tensorstore as ts
  path = os.path.join(root, name)
  spec = {
      'driver': 'zarr',
      'kvstore': {'driver': 'file', 'path': path},
      'metadata': {'shape': list(array.shape),
                   'dtype': '<f4' if array.dtype == np.float32 else '<f8'},
  }
  store = ts.open(spec, create=True).result()
  store.write(array).result()
  # Return the relative spec as t5x would store it.
  return {'driver': 'zarr', 'kvstore': {'driver': 'file', 'path': name}}


def test_load_synthetic_t5x_checkpoint(tmp_path):
  pytest.importorskip('tensorstore')
  from flax import serialization
  from mt3_tpu.train import t5x_loader

  root = str(tmp_path)
  rng = np.random.RandomState(0)
  kernel = rng.randn(8, 16).astype(np.float32)
  scale = rng.randn(8).astype(np.float32)

  spec = _write_ts_array(root, 'target.encoder.layers_0.attention.query'
                               '.kernel', kernel)
  tree = {
      'target': {
          'encoder': {
              'layers_0': {
                  'attention': {'query': {'kernel': spec}},
                  'pre_attention_layer_norm': {'scale': scale},
              },
          },
      },
      'state': {'step': 100},
  }
  with open(os.path.join(root, 'checkpoint'), 'wb') as f:
    f.write(serialization.msgpack_serialize(tree))

  flat = t5x_loader.load_t5x_checkpoint(root)
  np.testing.assert_allclose(
      flat['encoder/layers_0/attention/query/kernel'], kernel)
  np.testing.assert_allclose(
      flat['encoder/layers_0/pre_attention_layer_norm/scale'], scale)
