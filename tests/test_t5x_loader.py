"""T5X checkpoint loader test against a synthetic checkpoint on disk."""

import os

import numpy as np
import pytest


def _write_ts_array(root, name, array):
  import tensorstore as ts
  path = os.path.join(root, name)
  if array.dtype == np.float32:
    dtype = '<f4'
  elif array.dtype == np.float64:
    dtype = '<f8'
  else:
    dtype = 'bfloat16'
  spec = {
      'driver': 'zarr',
      'kvstore': {'driver': 'file', 'path': path},
      'metadata': {'shape': list(array.shape), 'dtype': dtype},
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


def test_load_real_layout_optimizer_wrapper_skips_param_states(tmp_path):
  """Published training checkpoints wrap params in an optimizer train
  state ({'version', 'optimizer': {'target', 'state'}}); the loader must
  find 'target' there and must NOT open the optimizer-moment TensorStore
  specs under state/param_states (here they point at nonexistent dirs —
  reading them would raise)."""
  pytest.importorskip('tensorstore')
  from flax import serialization
  from mt3_tpu.train import t5x_loader

  root = str(tmp_path)
  rng = np.random.RandomState(1)
  kernel = rng.randn(8, 16).astype(np.float32)
  spec = _write_ts_array(
      root, 'target.encoder.layers_0.attention.query.kernel', kernel)
  bogus = {'driver': 'zarr',
           'kvstore': {'driver': 'file', 'path': 'state.param_states.'
                       'encoder.layers_0.attention.query.kernel.v'}}
  tree = {
      'version': 3,
      'optimizer': {
          'target': {
              'encoder': {'layers_0': {'attention': {'query':
                                                     {'kernel': spec}}}},
          },
          'state': {
              'step': 100,
              'param_states': {
                  'encoder': {'layers_0': {'attention': {'query':
                                                         {'v': bogus}}}},
              },
          },
      },
  }
  with open(os.path.join(root, 'checkpoint'), 'wb') as f:
    f.write(serialization.msgpack_serialize(tree))

  flat = t5x_loader.load_t5x_checkpoint(root)
  assert set(flat) == {'encoder/layers_0/attention/query/kernel'}
  np.testing.assert_allclose(
      flat['encoder/layers_0/attention/query/kernel'], kernel)


def test_load_bfloat16_leaves_upcast(tmp_path):
  """bf16 TensorStore arrays and inline bf16 msgpack leaves load as the
  requested restore dtype (published checkpoints mix fp32/bf16)."""
  pytest.importorskip('tensorstore')
  import jax.numpy as jnp
  from flax import serialization
  from mt3_tpu.train import t5x_loader

  root = str(tmp_path)
  rng = np.random.RandomState(2)
  kernel = rng.randn(8, 16).astype(jnp.bfloat16)
  scale = rng.randn(8).astype(jnp.bfloat16)
  spec = _write_ts_array(
      root, 'target.encoder.layers_0.attention.query.kernel', kernel)
  tree = {'target': {'encoder': {'layers_0': {
      'attention': {'query': {'kernel': spec}},
      'pre_attention_layer_norm': {'scale': scale},
  }}}}
  with open(os.path.join(root, 'checkpoint'), 'wb') as f:
    f.write(serialization.msgpack_serialize(tree))

  flat = t5x_loader.load_t5x_checkpoint(root)
  assert flat['encoder/layers_0/attention/query/kernel'].dtype == np.float32
  assert (flat['encoder/layers_0/pre_attention_layer_norm/scale'].dtype
          == np.float32)
  np.testing.assert_allclose(
      flat['encoder/layers_0/attention/query/kernel'],
      kernel.astype(np.float32))
  np.testing.assert_allclose(
      flat['encoder/layers_0/pre_attention_layer_norm/scale'],
      scale.astype(np.float32))


def test_missing_target_subtree_is_actionable(tmp_path):
  """A checkpoint without a 'target' subtree reports what it did find."""
  from flax import serialization
  from mt3_tpu.train import t5x_loader

  root = str(tmp_path)
  with open(os.path.join(root, 'checkpoint'), 'wb') as f:
    f.write(serialization.msgpack_serialize(
        {'weights': {'w': np.zeros(3, np.float32)}}))
  with pytest.raises(ValueError, match="no 'target'.*weights"):
    t5x_loader.load_t5x_checkpoint(root)


def test_missing_param_error_suggests_close_match():
  """Layer-count mismatches fail with the closest available param paths."""
  from mt3_tpu.train import checkpoint as ckpt
  flat = {'encoder/layers_0/attention/query/kernel':
          np.zeros((4, 8), np.float32)}
  with pytest.raises(KeyError, match='closest available'):
    ckpt.convert_t5x_param_dict(flat, num_encoder_layers=2,
                                num_decoder_layers=2)


def test_full_t5x_checkpoint_roundtrip_to_reference_logits(tmp_path):
  """Write a complete T5X-layout checkpoint (msgpack + TensorStore zarr)
  from the actual reference flax model's parameters, load it through
  load_t5x_params, and assert teacher-forced logits match the reference.

  Exercises every stage of the published-checkpoint migration path:
  TensorStore reads, msgpack tree traversal, name mapping, per-layer
  stacking, and the numerics of the converted model.
  """
  pytest.importorskip('tensorstore')
  import jax
  import jax.numpy as jnp
  from flax import serialization

  from mt3_tpu.core.config import ModelConfig
  from mt3_tpu.models import t5
  from mt3_tpu.train import t5x_loader
  from tests.test_reference_parity import (_flatten_ref_params, ref as
                                           ref_fixture)
  del ref_fixture  # imported for the module side effects only

  # Load the reference network (same loader as the parity harness).
  import importlib.util
  import sys
  import types
  if 'mt3.network' not in sys.modules:
    pkg = types.ModuleType('mt3')
    pkg.__path__ = ['/root/reference/mt3']
    pkg._parity = True
    sys.modules['mt3'] = pkg
    for name in ('layers', 'network'):
      spec = importlib.util.spec_from_file_location(
          f'mt3.{name}', f'/root/reference/mt3/{name}.py')
      mod = importlib.util.module_from_spec(spec)
      sys.modules[f'mt3.{name}'] = mod
      spec.loader.exec_module(mod)
  network = sys.modules['mt3.network']

  ref_cfg = network.T5Config(
      vocab_size=134, dtype=jnp.float32, emb_dim=32, num_heads=2,
      num_encoder_layers=2, num_decoder_layers=2, head_dim=16,
      mlp_dim=64, mlp_activations=('gelu', 'linear'), dropout_rate=0.0)
  model = network.Transformer(config=ref_cfg)
  enc_in = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16))
  dec = np.ones((2, 5), np.int32)
  variables = model.init(jax.random.PRNGKey(0), enc_in, dec, dec,
                         enable_dropout=False)
  flat = _flatten_ref_params(
      jax.tree_util.tree_map(np.asarray, variables['params']))

  # Write the t5x on-disk layout: large leaves as zarr TensorStore dirs
  # named 'target.<dotted.path>', small leaves inline in the msgpack.
  root = str(tmp_path)

  def build(tree, prefix):
    out = {}
    for key, value in tree.items():
      path = f'{prefix}.{key}' if prefix else key
      if isinstance(value, dict):
        out[key] = build(value, path)
      elif value.size > 64:
        out[key] = _write_ts_array(root, path, value)
      else:
        out[key] = value
    return out

  nested = {}
  for slash_path, arr in flat.items():
    node = nested
    parts = slash_path.split('/')
    for p in parts[:-1]:
      node = node.setdefault(p, {})
    node[parts[-1]] = arr
  tree = {'target': build(nested, 'target'), 'state': {'step': 0}}
  with open(os.path.join(root, 'checkpoint'), 'wb') as f:
    f.write(serialization.msgpack_serialize(tree))

  params = t5x_loader.load_t5x_params(root, num_encoder_layers=2,
                                      num_decoder_layers=2)
  our_cfg = ModelConfig(vocab_size=134, emb_dim=32, num_heads=2,
                        num_encoder_layers=2, num_decoder_layers=2,
                        head_dim=16, mlp_dim=64,
                        mlp_activations=('gelu', 'linear'),
                        dropout_rate=0.0, input_depth=16, dtype='float32')

  ref_logits = np.asarray(model.apply(variables, enc_in, dec, dec,
                                      enable_dropout=False))
  our_logits = np.asarray(t5.forward(params, our_cfg, enc_in, dec, dec))
  np.testing.assert_allclose(our_logits, ref_logits, rtol=2e-4,
                             atol=2e-4)
