"""Model tests: shapes, decode-path consistency, masks, sinusoids."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mt3_tpu.core.config import ModelConfig
from mt3_tpu.models import layers, t5


@pytest.fixture(scope='module')
def config():
  return ModelConfig(
      vocab_size=128, emb_dim=32, num_heads=4, num_encoder_layers=2,
      num_decoder_layers=2, head_dim=8, mlp_dim=64,
      mlp_activations=('gelu', 'linear'), dropout_rate=0.0,
      input_depth=16, max_positions=64)


@pytest.fixture(scope='module')
def params(config):
  p, axes = t5.init_params(jax.random.PRNGKey(0), config)
  # The axes tree must mirror the params tree exactly.
  p_struct = jax.tree_util.tree_structure(p)
  axes_leaves = jax.tree_util.tree_leaves(
      axes, is_leaf=lambda x: isinstance(x, tuple))
  assert len(axes_leaves) == p_struct.num_leaves
  return p


def test_forward_shapes(config, params):
  b, enc_len, dec_len = 2, 6, 5
  enc_in = jnp.ones((b, enc_len, config.input_depth))
  dec_in = jnp.array([[0, 5, 6, 7, 1], [0, 9, 1, 0, 0]], jnp.int32)
  dec_tgt = jnp.array([[5, 6, 7, 1, 0], [9, 1, 0, 0, 0]], jnp.int32)
  logits = t5.forward(params, config, enc_in, dec_in, dec_tgt)
  assert logits.shape == (b, dec_len, config.vocab_size)
  assert logits.dtype == jnp.float32
  assert np.all(np.isfinite(np.asarray(logits)))


def test_incremental_decode_matches_teacher_forced(config, params):
  """Step-by-step KV-cached decode == teacher-forced forward pass."""
  b, enc_len, dec_len = 2, 6, 7
  rng = jax.random.PRNGKey(42)
  enc_in = jax.random.normal(rng, (b, enc_len, config.input_depth))
  tokens = jax.random.randint(jax.random.PRNGKey(1), (b, dec_len), 3, 100)

  # Teacher-forced: inputs are shifted targets (BOS=0).
  dec_in = jnp.concatenate(
      [jnp.zeros((b, 1), jnp.int32), tokens[:, :-1]], axis=1)
  encoded = t5.encode(params, config, enc_in)
  ref_logits = t5.decode_train(params, config, encoded, dec_in, tokens)

  # Incremental.
  state = t5.init_decode_state(params, config, encoded, dec_len)
  step_logits = []
  token = jnp.zeros((b,), jnp.int32)
  for i in range(dec_len):
    logits, state = t5.decode_step(params, config, token, state)
    step_logits.append(logits)
    token = tokens[:, i]
  step_logits = jnp.stack(step_logits, axis=1)

  # Note: teacher-forced masking depends on target padding while the
  # incremental path does not; all target tokens here are non-padding so
  # the two must agree.
  np.testing.assert_allclose(np.asarray(ref_logits),
                             np.asarray(step_logits), atol=2e-4, rtol=1e-4)


def test_decode_step_jit_and_index_advance(config, params):
  b, enc_len = 2, 4
  enc_in = jnp.ones((b, enc_len, config.input_depth))
  encoded = t5.encode(params, config, enc_in)
  state = t5.init_decode_state(params, config, encoded, 8)
  step = jax.jit(lambda tok, st: t5.decode_step(params, config, tok, st))
  logits, state = step(jnp.zeros((b,), jnp.int32), state)
  assert int(state.index) == 1
  logits2, state = step(jnp.ones((b,), jnp.int32), state)
  assert int(state.index) == 2
  assert not np.allclose(np.asarray(logits), np.asarray(logits2))


def test_dropout_changes_output_and_is_deterministic(config, params):
  cfg = ModelConfig(**{**config.__dict__, 'dropout_rate': 0.5})
  b, enc_len, dec_len = 2, 4, 3
  enc_in = jnp.ones((b, enc_len, cfg.input_depth))
  dec_in = jnp.zeros((b, dec_len), jnp.int32)
  dec_tgt = jnp.ones((b, dec_len), jnp.int32)
  out1 = t5.forward(params, cfg, enc_in, dec_in, dec_tgt,
                    rng=jax.random.PRNGKey(3))
  out2 = t5.forward(params, cfg, enc_in, dec_in, dec_tgt,
                    rng=jax.random.PRNGKey(3))
  out3 = t5.forward(params, cfg, enc_in, dec_in, dec_tgt,
                    rng=jax.random.PRNGKey(4))
  np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
  assert not np.allclose(np.asarray(out1), np.asarray(out3))


def test_decoder_bias_masks_padding_and_future():
  targets = jnp.array([[5, 6, 0]], jnp.int32)
  bias = layers.make_decoder_bias(targets)
  b = np.asarray(bias)[0, 0]
  assert b[0, 0] == 0          # self
  assert b[0, 1] < -1e9        # future
  assert b[1, 0] == 0          # past
  assert b[2, 2] < -1e9        # padding position
  assert b[1, 2] < -1e9        # padding key


def test_sinusoidal_table_structure():
  table = layers.sinusoidal_table(16, 8)
  assert table.shape == (16, 8)
  np.testing.assert_allclose(table[0, :4], np.zeros(4), atol=1e-7)
  np.testing.assert_allclose(table[0, 4:], np.ones(4), atol=1e-7)
  # Column 0 is sin(position) at scale 1.
  np.testing.assert_allclose(table[:, 0], np.sin(np.arange(16)), atol=1e-5)


def test_bfloat16_activations(config, params):
  cfg = ModelConfig(**{**config.__dict__, 'dtype': 'bfloat16'})
  b, enc_len, dec_len = 2, 4, 3
  enc_in = jnp.ones((b, enc_len, cfg.input_depth))
  dec_in = jnp.zeros((b, dec_len), jnp.int32)
  dec_tgt = jnp.ones((b, dec_len), jnp.int32)
  logits = t5.forward(params, cfg, enc_in, dec_in, dec_tgt)
  assert logits.dtype == jnp.float32  # logits stay f32
  ref = t5.forward(params, config, enc_in, dec_in, dec_tgt)
  np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                             atol=0.1, rtol=0.1)


def test_int8_kv_cache_decode_close_to_fp32(config, params):
  """int8-quantized cache decode stays numerically close to fp32."""
  from mt3_tpu.core.config import ModelConfig
  q_config = ModelConfig(**{**config.__dict__, 'decode_kv_quantize': True})
  b, enc_len, dec_len = 2, 6, 7
  enc_in = jax.random.normal(jax.random.PRNGKey(5),
                             (b, enc_len, config.input_depth))
  tokens = jax.random.randint(jax.random.PRNGKey(6), (b, dec_len), 3, 100)
  encoded = t5.encode(params, config, enc_in)

  def run(cfg):
    state = t5.init_decode_state(params, cfg, encoded, dec_len)
    logits_seq = []
    token = jnp.zeros((b,), jnp.int32)
    for i in range(dec_len):
      logits, state = t5.decode_step(params, cfg, token, state)
      logits_seq.append(logits)
      token = tokens[:, i]
    return jnp.stack(logits_seq, axis=1)

  ref = run(config)
  quant = run(q_config)
  # Quantization noise is ~0.4% of K/V magnitude; logits stay close.
  err = float(jnp.max(jnp.abs(ref - quant)))
  scale = float(jnp.max(jnp.abs(ref)))
  assert err < 0.05 * scale, (err, scale)


def test_gqa_decode_matches_teacher_forced(config):
  """GQA (num_kv_heads < num_heads): incremental == teacher-forced."""
  gqa_config = ModelConfig(**{**config.__dict__, 'num_kv_heads': 2})
  params, axes = t5.init_params(jax.random.PRNGKey(2), gqa_config)
  # K/V kernels are smaller.
  kshape = params['decoder']['layers']['self_attention']['key'].shape
  assert kshape == (gqa_config.num_decoder_layers, gqa_config.emb_dim,
                    2 * gqa_config.head_dim)

  b, enc_len, dec_len = 2, 5, 6
  enc_in = jax.random.normal(jax.random.PRNGKey(3),
                             (b, enc_len, gqa_config.input_depth))
  tokens = jax.random.randint(jax.random.PRNGKey(4), (b, dec_len), 3, 100)
  dec_in = jnp.concatenate(
      [jnp.zeros((b, 1), jnp.int32), tokens[:, :-1]], axis=1)
  encoded = t5.encode(params, gqa_config, enc_in)
  ref = t5.decode_train(params, gqa_config, encoded, dec_in, tokens)

  state = t5.init_decode_state(params, gqa_config, encoded, dec_len)
  # Cache allocated with kv heads only.
  assert state.cache.key.shape[2] == 2
  outs = []
  token = jnp.zeros((b,), jnp.int32)
  for i in range(dec_len):
    logits, state = t5.decode_step(params, gqa_config, token, state)
    outs.append(logits)
    token = tokens[:, i]
  step_logits = jnp.stack(outs, axis=1)
  np.testing.assert_allclose(np.asarray(ref), np.asarray(step_logits),
                             atol=2e-4, rtol=1e-4)


def test_int8_cross_kv_decode_close_to_fp32(config, params):
  """int8 cross-attention K/V (the fixed per-step HBM read) stays close."""
  from mt3_tpu.core.config import ModelConfig
  q_config = ModelConfig(**{**config.__dict__,
                            'decode_kv_quantize': True,
                            'decode_cross_kv_quantize': True})
  b, enc_len, dec_len = 2, 6, 7
  enc_in = jax.random.normal(jax.random.PRNGKey(15),
                             (b, enc_len, config.input_depth))
  tokens = jax.random.randint(jax.random.PRNGKey(16), (b, dec_len), 3, 100)
  encoded = t5.encode(params, config, enc_in)

  def run(cfg):
    state = t5.init_decode_state(params, cfg, encoded, dec_len)
    logits_seq = []
    token = jnp.zeros((b,), jnp.int32)
    for i in range(dec_len):
      logits, state = t5.decode_step(params, cfg, token, state)
      logits_seq.append(logits)
      token = tokens[:, i]
    return jnp.stack(logits_seq, axis=1)

  ref = run(config)
  quant = run(q_config)
  err = float(jnp.max(jnp.abs(ref - quant)))
  scale = float(jnp.max(jnp.abs(ref)))
  assert err < 0.05 * scale, (err, scale)
  state = t5.init_decode_state(params, q_config, encoded, dec_len)
  assert state.cross_k.dtype == jnp.int8
  assert state.cross_k_scale.shape == state.cross_k.shape[:3] + (
      state.cross_k.shape[-1],)


def test_int4_kv_cache_decode_reasonably_close(config, params):
  """int4 self-attn cache: larger error than int8, still bounded."""
  from mt3_tpu.core.config import ModelConfig
  q_config = ModelConfig(**{**config.__dict__, 'decode_kv_quantize': True,
                            'decode_kv_bits': 4})
  b, enc_len, dec_len = 2, 6, 7
  enc_in = jax.random.normal(jax.random.PRNGKey(25),
                             (b, enc_len, config.input_depth))
  tokens = jax.random.randint(jax.random.PRNGKey(26), (b, dec_len), 3, 100)
  encoded = t5.encode(params, config, enc_in)

  def run(cfg):
    state = t5.init_decode_state(params, cfg, encoded, dec_len)
    logits_seq = []
    token = jnp.zeros((b,), jnp.int32)
    for i in range(dec_len):
      logits, state = t5.decode_step(params, cfg, token, state)
      logits_seq.append(logits)
      token = tokens[:, i]
    return jnp.stack(logits_seq, axis=1)

  state = t5.init_decode_state(params, q_config, encoded, dec_len)
  assert state.cache.key.dtype == jnp.int4
  ref = run(config)
  quant = run(q_config)
  err = float(jnp.max(jnp.abs(ref - quant)))
  scale = float(jnp.max(jnp.abs(ref)))
  assert err < 0.25 * scale, (err, scale)


def test_int8dot_attention_close_to_fp32(config, params):
  """s8 x s8 -> s32 MXU attention path stays numerically close."""
  from mt3_tpu.core.config import ModelConfig
  q_config = ModelConfig(**{**config.__dict__, 'decode_kv_quantize': True,
                            'decode_attention_impl': 'xla_int8dot'})
  b, enc_len, dec_len = 2, 6, 7
  enc_in = jax.random.normal(jax.random.PRNGKey(35),
                             (b, enc_len, config.input_depth))
  tokens = jax.random.randint(jax.random.PRNGKey(36), (b, dec_len), 3, 100)
  encoded = t5.encode(params, config, enc_in)

  def run(cfg):
    state = t5.init_decode_state(params, cfg, encoded, dec_len)
    logits_seq = []
    token = jnp.zeros((b,), jnp.int32)
    for i in range(dec_len):
      logits, state = t5.decode_step(params, cfg, token, state)
      logits_seq.append(logits)
      token = tokens[:, i]
    return jnp.stack(logits_seq, axis=1)

  ref = run(config)
  quant = run(q_config)
  err = float(jnp.max(jnp.abs(ref - quant)))
  scale = float(jnp.max(jnp.abs(ref)))
  assert err < 0.08 * scale, (err, scale)


@pytest.mark.parametrize('variant', [
    {},                                                      # bf16-clean
    {'decode_kv_quantize': True},                            # int8
    {'decode_kv_quantize': True, 'decode_kv_bits': 4,
     'decode_cross_kv_quantize': True},                      # int4+cross
    {'decode_kv_quantize': True,
     'decode_attention_impl': 'xla_int8dot'},                # int8 MXU
])
def test_stacked_cache_carry_matches_scan(config, params, variant):
  """decode_cache_carry='stacked' (in-place stacked-cache dus writes)
  produces the same logits as the scan-ys carry for every decode
  configuration."""
  b, enc_len, dec_len = 2, 6, 7
  enc_in = jax.random.normal(jax.random.PRNGKey(21),
                             (b, enc_len, config.input_depth))
  tokens = jax.random.randint(jax.random.PRNGKey(22), (b, dec_len), 3, 100)

  def run(cfg):
    encoded = t5.encode(params, cfg, enc_in)
    state = t5.init_decode_state(params, cfg, encoded, dec_len)
    outs = []
    token = jnp.zeros((b,), jnp.int32)
    for i in range(dec_len):
      logits, state = t5.decode_step(params, cfg, token, state)
      outs.append(logits)
      token = tokens[:, i]
    return np.asarray(jnp.stack(outs, axis=1))

  scan_cfg = ModelConfig(**{**config.__dict__, **variant,
                            'decode_cache_carry': 'scan'})
  stacked_cfg = ModelConfig(**{**config.__dict__, **variant,
                               'decode_cache_carry': 'stacked'})
  np.testing.assert_allclose(run(stacked_cfg), run(scan_cfg),
                             atol=1e-5, rtol=1e-5)


def test_stacked_cache_carry_gqa(config):
  """Stacked carry with grouped-query attention == scan carry."""
  gqa = ModelConfig(**{**config.__dict__, 'num_kv_heads': 2,
                       'decode_kv_quantize': True})
  params, _ = t5.init_params(jax.random.PRNGKey(2), gqa)
  b, enc_len, dec_len = 2, 5, 6
  enc_in = jax.random.normal(jax.random.PRNGKey(23),
                             (b, enc_len, gqa.input_depth))
  tokens = jax.random.randint(jax.random.PRNGKey(24), (b, dec_len), 3, 100)

  def run(cfg):
    encoded = t5.encode(params, cfg, enc_in)
    state = t5.init_decode_state(params, cfg, encoded, dec_len)
    outs = []
    token = jnp.zeros((b,), jnp.int32)
    for i in range(dec_len):
      logits, state = t5.decode_step(params, cfg, token, state)
      outs.append(logits)
      token = tokens[:, i]
    return np.asarray(jnp.stack(outs, axis=1))

  scan_cfg = ModelConfig(**{**gqa.__dict__, 'decode_cache_carry': 'scan'})
  stacked_cfg = ModelConfig(**{**gqa.__dict__,
                               'decode_cache_carry': 'stacked'})
  np.testing.assert_allclose(run(stacked_cfg), run(scan_cfg),
                             atol=1e-5, rtol=1e-5)


def test_mha_to_gqa_conversion_exact_when_heads_identical(config, params):
  """convert_mha_to_gqa == original model when grouped K/V heads are
  identical (mean-pooling is exact there); cached decode agrees too.

  This is the conversion path for reference checkpoints (6 MHA heads,
  gin/model.gin:51) into the fast-decode GQA configuration.
  """
  from mt3_tpu.train.checkpoint import convert_mha_to_gqa
  num_kv = 2
  group = config.num_heads // num_kv

  def tile_heads(kernel):
    # Make each group of K/V heads identical to its first head.
    *lead, joined = kernel.shape
    g = kernel.reshape(*lead, num_kv, group, config.head_dim)
    return jnp.broadcast_to(g[..., :1, :], g.shape).reshape(kernel.shape)

  tiled = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
  for stack in (tiled['encoder']['layers'],
                tiled['decoder']['layers']):
    for name in ('attention', 'self_attention', 'cross_attention'):
      if name in stack:
        stack[name] = {**stack[name],
                       'key': tile_heads(stack[name]['key']),
                       'value': tile_heads(stack[name]['value'])}

  gqa_params = convert_mha_to_gqa(tiled, config.num_heads,
                                  config.head_dim, num_kv,
                                  allow_unfinetuned=True)
  gqa_config = ModelConfig(**{**config.__dict__, 'num_kv_heads': num_kv})
  kshape = gqa_params['decoder']['layers']['self_attention']['key'].shape
  assert kshape[-1] == num_kv * config.head_dim

  b, enc_len, dec_len = 2, 6, 7
  enc_in = jax.random.normal(jax.random.PRNGKey(8),
                             (b, enc_len, config.input_depth))
  tokens = jax.random.randint(jax.random.PRNGKey(9), (b, dec_len), 3, 100)
  dec_in = jnp.concatenate(
      [jnp.zeros((b, 1), jnp.int32), tokens[:, :-1]], axis=1)

  ref = np.asarray(t5.forward(tiled, config, enc_in, dec_in, tokens))
  gqa = np.asarray(t5.forward(gqa_params, gqa_config, enc_in, dec_in,
                              tokens))
  np.testing.assert_allclose(gqa, ref, atol=1e-5, rtol=1e-5)

  # Cached decode through the GQA cache layout agrees as well.
  encoded = t5.encode(gqa_params, gqa_config, enc_in)
  state = t5.init_decode_state(gqa_params, gqa_config, encoded, dec_len)
  assert state.cache.key.shape[2] == num_kv
  outs = []
  token = jnp.zeros((b,), jnp.int32)
  for i in range(dec_len):
    logits, state = t5.decode_step(gqa_params, gqa_config, token, state)
    outs.append(logits)
    token = tokens[:, i]
  np.testing.assert_allclose(np.asarray(jnp.stack(outs, axis=1)), ref,
                             atol=2e-4, rtol=1e-4)


def test_mha_to_gqa_conversion_validates_shapes(config, params):
  from mt3_tpu.train.checkpoint import convert_mha_to_gqa
  with pytest.raises(ValueError, match='not divisible'):
    convert_mha_to_gqa(params, config.num_heads, config.head_dim, 3,
                       allow_unfinetuned=True)


def test_mha_to_gqa_conversion_requires_finetune_opt_in(config, params):
  """The unfinetuned conversion collapses quality (TRAINING.md); the
  converter refuses unless the caller explicitly opts in."""
  from mt3_tpu.train.checkpoint import convert_mha_to_gqa
  with pytest.raises(ValueError, match='recovery finetune'):
    convert_mha_to_gqa(params, config.num_heads, config.head_dim, 2)


def test_flash_attention_matches_xla(config, params):
  """Stock TPU flash kernel (interpret mode on CPU) == einsum attention
  at all valid positions; padded target positions carry no loss."""
  import jax.experimental.pallas.tpu as pltpu
  from mt3_tpu.core.config import ModelConfig
  config = ModelConfig(**{**config.__dict__, 'max_positions': 256})
  flash_cfg = ModelConfig(**{**config.__dict__,
                             'train_attention_impl': 'flash'})
  b = 2
  enc_in = jax.random.normal(jax.random.PRNGKey(41),
                             (b, 128, config.input_depth))
  # Padded targets: flash uses pure causal masking, which is equivalent
  # for unpacked data at positions with nonzero loss weight.  Lengths
  # >= 128 so the flash path actually engages (below one TPU tile it
  # falls back to the einsum path).
  tgt = np.zeros((b, 128), np.int32)
  tgt[0, :100] = np.asarray(jax.random.randint(
      jax.random.PRNGKey(42), (100,), 3, config.vocab_size))
  tgt[1, :60] = np.asarray(jax.random.randint(
      jax.random.PRNGKey(43), (60,), 3, config.vocab_size))
  inp = np.zeros_like(tgt)
  inp[:, 1:] = tgt[:, :-1]

  ref = np.asarray(t5.forward(params, config, enc_in, inp, tgt))
  with pltpu.force_tpu_interpret_mode():
    flash = np.asarray(t5.forward(params, flash_cfg, enc_in, inp, tgt))
  valid = np.asarray(tgt) > 0
  np.testing.assert_allclose(flash[valid], ref[valid], atol=2e-4,
                             rtol=2e-4)


def test_flash_attention_dropout_matches_xla(config, params):
  """Flash with live attention dropout == XLA path with the same rng.

  The reference's attention dropout broadcasts the mask along the query
  dim (/root/reference/mt3/layers.py:146-156), so the flash path folds
  it into V before the kernel (layers.attention); with an identical rng
  the two paths draw the identical mask and must agree at every valid
  position — making flash legal under the reference training recipe
  (gin/model.gin:58, dropout 0.1).
  """
  import jax.experimental.pallas.tpu as pltpu
  from mt3_tpu.core.config import ModelConfig
  drop_cfg = ModelConfig(**{**config.__dict__, 'dropout_rate': 0.1,
                            'max_positions': 256})
  flash_cfg = ModelConfig(**{**drop_cfg.__dict__,
                             'train_attention_impl': 'flash'})
  b = 2
  enc_in = jax.random.normal(jax.random.PRNGKey(51),
                             (b, 128, config.input_depth))
  tgt = np.zeros((b, 128), np.int32)
  tgt[0, :100] = np.asarray(jax.random.randint(
      jax.random.PRNGKey(52), (100,), 3, config.vocab_size))
  tgt[1, :60] = np.asarray(jax.random.randint(
      jax.random.PRNGKey(53), (60,), 3, config.vocab_size))
  inp = np.zeros_like(tgt)
  inp[:, 1:] = tgt[:, :-1]

  rng = jax.random.PRNGKey(77)
  ref = np.asarray(t5.forward(params, drop_cfg, enc_in, inp, tgt, rng=rng))
  with pltpu.force_tpu_interpret_mode():
    flash = np.asarray(
        t5.forward(params, flash_cfg, enc_in, inp, tgt, rng=rng))
  # Dropout actually fired (outputs differ from the deterministic pass).
  det = np.asarray(t5.forward(params, drop_cfg, enc_in, inp, tgt))
  assert np.max(np.abs(ref - det)) > 1e-3
  valid = np.asarray(tgt) > 0
  np.testing.assert_allclose(flash[valid], ref[valid], atol=2e-4,
                             rtol=2e-4)
