"""Numerical parity against the actual reference flax model.

The reference network (/root/reference/mt3/network.py, layers.py) depends
only on flax + jax, so it can be instantiated directly.  These tests
initialize the reference Transformer, convert its parameters through our
T5X converter (checkpoint.convert_t5x_param_dict — the same mapping used
for published gs://mt3/checkpoints), and assert:

  1. teacher-forced logits match t5.forward to float32 tolerance
     (mt3 and ismir2021 dims);
  2. a KV-cached incremental decode step matches the reference flax cache
     path (layers.py:246-314) step by step;
  3. greedy decode produces the identical token stream end to end.

This validates both our numerics and the checkpoint converter mapping.
"""

import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mt3_tpu.core.config import ModelConfig
from mt3_tpu.models import t5
from mt3_tpu.train import checkpoint as ckpt_lib

REF_DIR = '/root/reference/mt3'


@pytest.fixture(scope='module')
def ref():
  """Load the reference network/layers modules without mt3/__init__
  (which pulls in seqio/t5x, not installed here)."""
  if 'mt3' not in sys.modules or not hasattr(sys.modules['mt3'], '_parity'):
    pkg = types.ModuleType('mt3')
    pkg.__path__ = [REF_DIR]
    pkg._parity = True
    sys.modules['mt3'] = pkg
    for name in ('layers', 'network'):
      spec = importlib.util.spec_from_file_location(
          f'mt3.{name}', f'{REF_DIR}/{name}.py')
      mod = importlib.util.module_from_spec(spec)
      sys.modules[f'mt3.{name}'] = mod
      spec.loader.exec_module(mod)
  return sys.modules['mt3.network']


def _flatten_ref_params(tree, prefix=''):
  out = {}
  for key, value in tree.items():
    path = f'{prefix}/{key}' if prefix else key
    if isinstance(value, dict):
      out.update(_flatten_ref_params(value, path))
    else:
      out[path] = np.asarray(value, np.float32)
  return out


def _build_pair(ref, *, vocab_size, emb_dim, num_heads, num_layers,
                head_dim, mlp_dim, input_depth, seed=0):
  """Reference model + converted params + matching ModelConfig."""
  ref_cfg = ref.T5Config(
      vocab_size=vocab_size, dtype=jnp.float32, emb_dim=emb_dim,
      num_heads=num_heads, num_encoder_layers=num_layers,
      num_decoder_layers=num_layers, head_dim=head_dim, mlp_dim=mlp_dim,
      mlp_activations=('gelu', 'linear'), dropout_rate=0.0,
      logits_via_embedding=False)
  model = ref.Transformer(config=ref_cfg)

  rng = jax.random.PRNGKey(seed)
  enc_in = jax.random.normal(jax.random.fold_in(rng, 1),
                             (2, 6, input_depth), jnp.float32)
  dec_in = jnp.ones((2, 5), jnp.int32)
  dec_tgt = jnp.ones((2, 5), jnp.int32)
  variables = model.init(rng, enc_in, dec_in, dec_tgt,
                         enable_dropout=False)
  flat = _flatten_ref_params(
      jax.tree_util.tree_map(np.asarray, variables['params']))
  ours = ckpt_lib.convert_t5x_param_dict(flat, num_layers, num_layers)
  our_cfg = ModelConfig(
      vocab_size=vocab_size, emb_dim=emb_dim, num_heads=num_heads,
      num_encoder_layers=num_layers, num_decoder_layers=num_layers,
      head_dim=head_dim, mlp_dim=mlp_dim,
      mlp_activations=('gelu', 'linear'), dropout_rate=0.0,
      input_depth=input_depth, dtype='float32')
  return model, variables, ours, our_cfg


DIMS = {
    'tiny': dict(vocab_size=134, emb_dim=32, num_heads=2, num_layers=2,
                 head_dim=16, mlp_dim=64, input_depth=16),
    # Real mt3 flagship dims (gin/model.gin:46-59), short sequence lengths.
    'mt3': dict(vocab_size=1536, emb_dim=512, num_heads=6, num_layers=8,
                head_dim=64, mlp_dim=1024, input_depth=512),
}


@pytest.mark.parametrize('dims', ['tiny', 'mt3'])
def test_teacher_forced_logits_match(ref, dims):
  model, variables, ours, cfg = _build_pair(ref, **DIMS[dims])

  rng = jax.random.PRNGKey(7)
  batch, enc_len, dec_len = 2, 6, 8
  enc_in = np.asarray(jax.random.normal(
      rng, (batch, enc_len, cfg.input_depth), jnp.float32))
  # Targets include padding (zeros) to exercise the decoder padding mask.
  dec_tgt = np.array([[9, 5, 7, 1, 0, 0, 0, 0],
                      [4, 4, 8, 2, 6, 1, 0, 0]], np.int32)
  dec_in = np.array([[0, 9, 5, 7, 1, 0, 0, 0],
                     [0, 4, 4, 8, 2, 6, 1, 0]], np.int32)

  ref_logits = np.asarray(model.apply(
      variables, enc_in, dec_in, dec_tgt, enable_dropout=False))
  our_logits = np.asarray(t5.forward(ours, cfg, enc_in, dec_in, dec_tgt))

  assert our_logits.shape == ref_logits.shape
  np.testing.assert_allclose(our_logits, ref_logits, rtol=2e-4, atol=2e-4)


def test_cached_decode_steps_match(ref):
  """Our incremental decode_step vs the reference flax decode cache."""
  model, variables, ours, cfg = _build_pair(ref, **DIMS['tiny'])
  batch, enc_len, steps = 2, 6, 7

  rng = jax.random.PRNGKey(3)
  enc_in = np.asarray(jax.random.normal(
      rng, (batch, enc_len, cfg.input_depth), jnp.float32))
  tokens = np.array(jax.random.randint(
      jax.random.fold_in(rng, 1), (batch, steps), 3, cfg.vocab_size),
      np.int32)
  tokens[:, 0] = 0  # BOS

  # Reference: encode once, then init the flax cache and step through.
  ref_encoded = model.apply(variables, enc_in, enable_dropout=False,
                            method=model.encode)
  init_vars = model.init(
      jax.random.PRNGKey(0), enc_in,
      jnp.zeros((batch, steps), jnp.int32),
      jnp.zeros((batch, steps), jnp.int32),
      enable_dropout=False, decode=True)
  cache = init_vars['cache']

  ref_step_logits = []
  for t in range(steps):
    tok = jnp.asarray(tokens[:, t:t + 1])
    logits, mutated = model.apply(
        {'params': variables['params'], 'cache': cache},
        ref_encoded, enc_in, tok, tok,
        enable_dropout=False, decode=True, max_decode_length=steps,
        mutable=['cache'], method=model.decode)
    cache = mutated['cache']
    ref_step_logits.append(np.asarray(logits)[:, 0, :])

  # Ours: same encoded activations path, incremental decode_step.
  our_encoded = t5.encode(ours, cfg, enc_in)
  np.testing.assert_allclose(np.asarray(our_encoded),
                             np.asarray(ref_encoded), rtol=2e-4, atol=2e-4)
  state = t5.init_decode_state(ours, cfg, our_encoded, max_decode_len=steps)
  for t in range(steps):
    logits, state = t5.decode_step(
        ours, cfg, jnp.asarray(tokens[:, t]), state)
    np.testing.assert_allclose(
        np.asarray(logits), ref_step_logits[t], rtol=2e-4, atol=2e-4,
        err_msg=f'decode step {t}')


def test_greedy_token_streams_identical(ref):
  """End to end: greedy decode emits the same tokens through both stacks."""
  model, variables, ours, cfg = _build_pair(ref, **DIMS['tiny'], seed=11)
  batch, enc_len, steps = 2, 6, 12

  enc_in = np.asarray(jax.random.normal(
      jax.random.PRNGKey(21), (batch, enc_len, cfg.input_depth),
      jnp.float32))

  # Reference greedy loop through the flax cache.
  ref_encoded = model.apply(variables, enc_in, enable_dropout=False,
                            method=model.encode)
  init_vars = model.init(
      jax.random.PRNGKey(0), enc_in,
      jnp.zeros((batch, steps), jnp.int32),
      jnp.zeros((batch, steps), jnp.int32),
      enable_dropout=False, decode=True)
  cache = init_vars['cache']
  tok = jnp.zeros((batch, 1), jnp.int32)
  ref_tokens = []
  for _ in range(steps):
    logits, mutated = model.apply(
        {'params': variables['params'], 'cache': cache},
        ref_encoded, enc_in, tok, tok,
        enable_dropout=False, decode=True, max_decode_length=steps,
        mutable=['cache'], method=model.decode)
    cache = mutated['cache']
    tok = jnp.argmax(logits[:, 0, :], axis=-1).astype(jnp.int32)[:, None]
    ref_tokens.append(np.asarray(tok[:, 0]))

  # Ours.
  our_encoded = t5.encode(ours, cfg, enc_in)
  state = t5.init_decode_state(ours, cfg, our_encoded, max_decode_len=steps)
  tok = jnp.zeros((batch,), jnp.int32)
  our_tokens = []
  for _ in range(steps):
    logits, state = t5.decode_step(ours, cfg, tok, state)
    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    our_tokens.append(np.asarray(tok))

  np.testing.assert_array_equal(np.stack(our_tokens), np.stack(ref_tokens))
