"""T5-style encoder-decoder over continuous (spectrogram) inputs.

Functional, flax-free rebuild of /root/reference/mt3/network.py: a stack of
pre-LN encoder layers over projected log-mel frames with fixed sinusoidal
positions, and a decoder with self + cross attention emitting event-token
logits in float32.

TPU-first design choices (vs. the reference's per-layer flax modules):
  * Per-layer weights are stacked along a leading `layers` axis and the
    stacks run under jax.lax.scan — one compiled layer body, trivial
    rematerialization, and a single sharding annotation per weight kind.
  * Incremental decoding is a dedicated single-position path: cross
    attention K/V are projected once per segment (optionally int8), and
    decoder self-attention updates a [layers, b, heads, head_dim, len]
    cache (optionally int8/int4) via in-place dynamic_update_slice column
    writes (see layers.attention_decode_step).
  * Activations can run in bfloat16 (config.dtype) while parameters, layer
    norms, softmaxes, and logits stay float32.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from mt3_tpu.core.config import ModelConfig
from mt3_tpu.models import layers
from mt3_tpu.models.layers import KVCache

Array = jax.Array
PyTree = Any


def _dtype(config: ModelConfig):
  return jnp.bfloat16 if config.dtype == 'bfloat16' else jnp.float32


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------
def _stack_layer_params(key, num_layers: int, init_one_layer):
  """Initialize per-layer params and stack them along a leading axis."""
  keys = jax.random.split(key, num_layers)
  per_layer = [init_one_layer(k) for k in keys]
  return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_layer)


def _with_layer_axis(axes: PyTree) -> PyTree:
  return jax.tree_util.tree_map(
      lambda a: ('layers',) + a, axes,
      is_leaf=lambda x: isinstance(x, tuple) and all(
          isinstance(e, str) for e in x))


def init_params(key: Array, config: ModelConfig) -> Tuple[PyTree, PyTree]:
  """Build the full parameter pytree and its logical-axes twin."""
  k_enc_proj, k_enc, k_dec_embed, k_dec, k_logits = jax.random.split(key, 5)

  def encoder_layer_init(k):
    k_attn, = jax.random.split(k, 1)
    attn, attn_axes = layers.multihead_params_init(
        k_attn, config.emb_dim, config.num_heads, config.head_dim,
        num_kv_heads=config.num_kv_heads)
    k_wi0, k_wi1, k_wo = jax.random.split(jax.random.fold_in(k, 1), 3)
    params = {
        'attention': attn,
        'pre_attention_norm': jnp.ones(config.emb_dim, jnp.float32),
        'mlp': {
            'wi_0': layers.dense_init(k_wi0,
                                      (config.emb_dim, config.mlp_dim)),
            'wi_1': layers.dense_init(k_wi1,
                                      (config.emb_dim, config.mlp_dim)),
            'wo': layers.dense_init(k_wo, (config.mlp_dim, config.emb_dim)),
        },
        'pre_mlp_norm': jnp.ones(config.emb_dim, jnp.float32),
    }
    axes = {
        'attention': attn_axes,
        'pre_attention_norm': ('embed',),
        'mlp': {'wi_0': ('embed', 'mlp'), 'wi_1': ('embed', 'mlp'),
                'wo': ('mlp', 'embed')},
        'pre_mlp_norm': ('embed',),
    }
    return params, axes

  def decoder_layer_init(k):
    k_self, k_cross = jax.random.split(k, 2)
    self_attn, attn_axes = layers.multihead_params_init(
        k_self, config.emb_dim, config.num_heads, config.head_dim,
        num_kv_heads=config.num_kv_heads)
    cross_attn, _ = layers.multihead_params_init(
        k_cross, config.emb_dim, config.num_heads, config.head_dim,
        num_kv_heads=config.num_kv_heads)
    k_wi0, k_wi1, k_wo = jax.random.split(jax.random.fold_in(k, 1), 3)
    params = {
        'self_attention': self_attn,
        'pre_self_attention_norm': jnp.ones(config.emb_dim, jnp.float32),
        'cross_attention': cross_attn,
        'pre_cross_attention_norm': jnp.ones(config.emb_dim, jnp.float32),
        'mlp': {
            'wi_0': layers.dense_init(k_wi0,
                                      (config.emb_dim, config.mlp_dim)),
            'wi_1': layers.dense_init(k_wi1,
                                      (config.emb_dim, config.mlp_dim)),
            'wo': layers.dense_init(k_wo, (config.mlp_dim, config.emb_dim)),
        },
        'pre_mlp_norm': jnp.ones(config.emb_dim, jnp.float32),
    }
    axes = {
        'self_attention': attn_axes,
        'pre_self_attention_norm': ('embed',),
        'cross_attention': attn_axes,
        'pre_cross_attention_norm': ('embed',),
        'mlp': {'wi_0': ('embed', 'mlp'), 'wi_1': ('embed', 'mlp'),
                'wo': ('mlp', 'embed')},
        'pre_mlp_norm': ('embed',),
    }
    return params, axes

  enc_layer_params, enc_layer_axes = encoder_layer_init(k_enc)
  dec_layer_params, dec_layer_axes = decoder_layer_init(k_dec)
  del enc_layer_params, dec_layer_params  # only axes reused below

  params = {
      'encoder': {
          'input_proj': layers.dense_init(
              k_enc_proj, (config.input_depth, config.emb_dim)),
          'layers': _stack_layer_params(
              k_enc, config.num_encoder_layers,
              lambda k: encoder_layer_init(k)[0]),
          'norm': jnp.ones(config.emb_dim, jnp.float32),
      },
      'decoder': {
          'token_embed': layers.embed_init(
              k_dec_embed, (config.vocab_size, config.emb_dim)),
          'layers': _stack_layer_params(
              k_dec, config.num_decoder_layers,
              lambda k: decoder_layer_init(k)[0]),
          'norm': jnp.ones(config.emb_dim, jnp.float32),
          'logits': layers.dense_init(
              k_logits, (config.emb_dim, config.vocab_size)),
      },
  }
  axes = {
      'encoder': {
          'input_proj': ('vocab', 'embed'),
          'layers': _with_layer_axis(enc_layer_axes),
          'norm': ('embed',),
      },
      'decoder': {
          'token_embed': ('vocab', 'embed'),
          'layers': _with_layer_axis(dec_layer_axes),
          'norm': ('embed',),
          'logits': ('embed', 'vocab'),
      },
  }
  return params, axes



def _maybe_remat(fn, config: ModelConfig):
  """Wrap a scan body in jax.checkpoint per config.remat / remat_policy."""
  if not config.remat:
    return fn
  if getattr(config, 'remat_policy', 'full') == 'dots':
    return jax.checkpoint(
        fn, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
  return jax.checkpoint(fn)


# ---------------------------------------------------------------------------
# Dropout helper
# ---------------------------------------------------------------------------
def _dropout(rng: Optional[Array], x: Array, rate: float,
             broadcast_length: bool = True) -> Array:
  """Dropout broadcast along the length dim (reference broadcast_dims=(-2,))."""
  if rng is None or rate == 0.0:
    return x
  shape = list(x.shape)
  if broadcast_length and len(shape) >= 2:
    shape[-2] = 1
  keep = jax.random.bernoulli(rng, 1.0 - rate, tuple(shape))
  return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


def _split_or_none(rng: Optional[Array], n: int):
  if rng is None:
    return [None] * n
  return list(jax.random.split(rng, n))


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------
def encode(params: PyTree, config: ModelConfig, encoder_input: Array,
           rng: Optional[Array] = None) -> Array:
  """[b, len, depth] continuous inputs -> [b, len, emb] encodings.

  Note the reference attends to zero-padding in the encoder (no input mask,
  network.py:285-289); we preserve that behavior for parity.
  """
  dtype = _dtype(config)
  b, length, _ = encoder_input.shape
  del b
  rngs = _split_or_none(rng, 2 + config.num_encoder_layers)

  flash_full = ('full' if getattr(config, 'train_attention_impl', 'xla')
                == 'flash' else None)
  x = layers.dense(params['encoder']['input_proj'], encoder_input, dtype)
  pos = layers.sinusoidal_table(config.max_positions, config.emb_dim)
  x = x + jnp.asarray(pos[:length])[None, :, :].astype(dtype)
  x = _dropout(rngs[0], x, config.dropout_rate)
  x = x.astype(dtype)

  layer_rngs = rngs[2:]
  have_rng = rng is not None
  if have_rng:
    layer_rng_stack = jnp.stack(layer_rngs)

  def encoder_layer(x, scan_in):
    layer_params, layer_rng = scan_in
    sub = _split_or_none(layer_rng, 4) if have_rng else [None] * 4
    # Pre-LN self-attention block.
    h = layers.rms_norm(layer_params['pre_attention_norm'], x, dtype=dtype)
    h = layers.attention(
        layer_params['attention'], h, h, bias=None,
        num_heads=config.num_heads, head_dim=config.head_dim, dtype=dtype,
        dropout_rng=sub[0], dropout_rate=config.dropout_rate,
        num_kv_heads=config.num_kv_heads, flash_mode=flash_full)
    x = x + _dropout(sub[1], h, config.dropout_rate)
    # Pre-LN MLP block.
    h = layers.rms_norm(layer_params['pre_mlp_norm'], x, dtype=dtype)
    h = _mlp_with_dropout(layer_params['mlp'], h, config, dtype, sub[2])
    x = x + _dropout(sub[3], h, config.dropout_rate)
    return x, None

  if have_rng:
    body = _maybe_remat(encoder_layer, config)
    x, _ = jax.lax.scan(body, x,
                        (params['encoder']['layers'], layer_rng_stack))
  else:
    def no_rng_layer(x, layer_params):
      return encoder_layer(x, (layer_params, None))
    body = _maybe_remat(no_rng_layer, config)
    x, _ = jax.lax.scan(body, x, params['encoder']['layers'])

  x = layers.rms_norm(params['encoder']['norm'], x, dtype=dtype)
  x = _dropout(rngs[1], x, config.dropout_rate, broadcast_length=False)
  return x


def _mlp_with_dropout(mlp_params, h, config, dtype, rng):
  """Gated MLP with intermediate dropout (reference MlpBlock)."""
  acts = []
  for idx, act_name in enumerate(config.mlp_activations):
    name = 'wi' if len(config.mlp_activations) == 1 else f'wi_{idx}'
    a = layers.dense(mlp_params[name], h, dtype)
    acts.append(layers._activation(act_name)(a))
  inner = acts[0]
  for a in acts[1:]:
    inner = inner * a
  inner = _dropout(rng, inner, config.dropout_rate)
  return layers.dense(mlp_params['wo'], inner, dtype)


# ---------------------------------------------------------------------------
# Decoder (teacher-forced)
# ---------------------------------------------------------------------------
def decode_train(params: PyTree, config: ModelConfig, encoded: Array,
                 decoder_input_tokens: Array, decoder_target_tokens: Array,
                 rng: Optional[Array] = None) -> Array:
  """Teacher-forced decode -> float32 logits [b, len, vocab]."""
  dtype = _dtype(config)
  b, length = decoder_input_tokens.shape
  del b
  rngs = _split_or_none(rng, 2 + config.num_decoder_layers)
  have_rng = rng is not None

  flash = getattr(config, 'train_attention_impl', 'xla') == 'flash'
  flash_causal = 'causal' if flash else None
  flash_full = 'full' if flash else None
  decoder_bias = layers.make_decoder_bias(decoder_target_tokens,
                                          jnp.float32)
  # Cross-attention: query positions with non-padding targets attend to all
  # encoder positions (network.py:330-333).
  enc_len = encoded.shape[1]
  nonpad = (decoder_target_tokens > 0).astype(jnp.float32)
  cross_bias = layers.make_attention_bias(
      nonpad, jnp.ones((encoded.shape[0], enc_len), jnp.float32),
      jnp.float32)

  y = layers.embed(params['decoder']['token_embed'],
                   decoder_input_tokens.astype(jnp.int32), dtype=dtype)
  pos = layers.sinusoidal_table(config.max_positions, config.emb_dim)
  y = y + jnp.asarray(pos[:length])[None, :, :].astype(dtype)
  y = _dropout(rngs[0], y, config.dropout_rate)
  y = y.astype(dtype)

  layer_rngs = rngs[2:]
  if have_rng:
    layer_rng_stack = jnp.stack(layer_rngs)

  def decoder_layer(y, scan_in):
    layer_params, layer_rng = scan_in
    sub = _split_or_none(layer_rng, 6) if have_rng else [None] * 6
    # Self-attention.
    h = layers.rms_norm(layer_params['pre_self_attention_norm'], y,
                        dtype=dtype)
    h = layers.attention(
        layer_params['self_attention'], h, h, bias=decoder_bias,
        num_heads=config.num_heads, head_dim=config.head_dim, dtype=dtype,
        dropout_rng=sub[0], dropout_rate=config.dropout_rate,
        num_kv_heads=config.num_kv_heads, flash_mode=flash_causal)
    y = y + _dropout(sub[1], h, config.dropout_rate)
    # Cross-attention.
    h = layers.rms_norm(layer_params['pre_cross_attention_norm'], y,
                        dtype=dtype)
    h = layers.attention(
        layer_params['cross_attention'], h, encoded.astype(dtype),
        bias=cross_bias, num_heads=config.num_heads,
        head_dim=config.head_dim, dtype=dtype,
        dropout_rng=sub[2], dropout_rate=config.dropout_rate,
        num_kv_heads=config.num_kv_heads, flash_mode=flash_full)
    y = y + _dropout(sub[3], h, config.dropout_rate)
    # MLP.
    h = layers.rms_norm(layer_params['pre_mlp_norm'], y, dtype=dtype)
    h = _mlp_with_dropout(layer_params['mlp'], h, config, dtype, sub[4])
    y = y + _dropout(sub[5], h, config.dropout_rate)
    return y, None

  if have_rng:
    body = _maybe_remat(decoder_layer, config)
    y, _ = jax.lax.scan(body, y,
                        (params['decoder']['layers'], layer_rng_stack))
  else:
    def no_rng_layer(y, layer_params):
      return decoder_layer(y, (layer_params, None))
    body = _maybe_remat(no_rng_layer, config)
    y, _ = jax.lax.scan(body, y, params['decoder']['layers'])

  y = layers.rms_norm(params['decoder']['norm'], y, dtype=dtype)
  y = _dropout(rngs[1], y, config.dropout_rate)

  # Logits always in float32 for stability (network.py:256-261).
  logits = layers.dense(params['decoder']['logits'], y, jnp.float32)
  return logits


def forward(params: PyTree, config: ModelConfig, encoder_input: Array,
            decoder_input_tokens: Array, decoder_target_tokens: Array,
            rng: Optional[Array] = None) -> Array:
  """Full teacher-forced forward pass -> logits [b, len, vocab]."""
  enc_rng, dec_rng = (None, None) if rng is None else jax.random.split(rng)
  encoded = encode(params, config, encoder_input, rng=enc_rng)
  return decode_train(params, config, encoded, decoder_input_tokens,
                      decoder_target_tokens, rng=dec_rng)


# ---------------------------------------------------------------------------
# Incremental decode
# ---------------------------------------------------------------------------
@dataclasses.dataclass
class DecodeState:
  """Carried state for single-step autoregressive decoding."""
  cache: KVCache        # self-attention KV cache [L, b, h, d, max_len]
  cross_k: Array        # [L, b, h, d, enc_len] (bf16 or int8)
  cross_v: Array        # [L, b, h, d, enc_len]
  index: Array          # scalar int32: current position
  cross_k_scale: Optional[Array] = None   # [L, b, h, enc_len] (int8 only)
  cross_v_scale: Optional[Array] = None


jax.tree_util.register_dataclass(
    DecodeState,
    data_fields=['cache', 'cross_k', 'cross_v', 'index',
                 'cross_k_scale', 'cross_v_scale'],
    meta_fields=[])

jax.tree_util.register_dataclass(
    KVCache,
    data_fields=['key', 'value', 'key_scale', 'value_scale'],
    meta_fields=[])


def init_decode_state(params: PyTree, config: ModelConfig,
                      encoded: Array, max_decode_len: int) -> DecodeState:
  """Project encoder K/V once and allocate the self-attention cache."""
  dtype = _dtype(config)
  b, enc_len, _ = encoded.shape

  def project(layer_params, _):
    del _
    k = layers.dense(layer_params['cross_attention']['key'],
                     encoded.astype(dtype), dtype)
    v = layers.dense(layer_params['cross_attention']['value'],
                     encoded.astype(dtype), dtype)
    # [b, enc, kv, d] -> [b, kv, d, enc]: lane-dense layout for decode.
    k = k.reshape(b, enc_len, config.kv_heads,
                  config.head_dim).transpose(0, 2, 3, 1)
    v = v.reshape(b, enc_len, config.kv_heads,
                  config.head_dim).transpose(0, 2, 3, 1)
    return None, (k, v)

  _, (cross_k, cross_v) = jax.lax.scan(
      lambda carry, lp: project(lp, carry), None,
      params['decoder']['layers'])

  cross_k_scale = cross_v_scale = None
  if getattr(config, 'decode_cross_kv_quantize', False):
    cross_k, cross_k_scale = layers.quantize_kv_sequence(cross_k)
    cross_v, cross_v_scale = layers.quantize_kv_sequence(cross_v)

  cache = layers.init_kv_cache(
      config.num_decoder_layers, b, config.kv_heads, config.head_dim,
      max_decode_len, dtype=dtype,
      quantized=config.decode_kv_quantize,
      bits=getattr(config, 'decode_kv_bits', 8))
  return DecodeState(cache=cache, cross_k=cross_k, cross_v=cross_v,
                     index=jnp.array(0, jnp.int32),
                     cross_k_scale=cross_k_scale,
                     cross_v_scale=cross_v_scale)


def decode_step(params: PyTree, config: ModelConfig, token: Array,
                state: DecodeState) -> Tuple[Array, DecodeState]:
  """One decode step: token [b] int32 -> (logits [b, vocab], new state)."""
  if getattr(config, 'decode_cache_carry', 'scan') == 'stacked':
    return _decode_step_stacked(params, config, token, state)
  dtype = _dtype(config)
  b = token.shape[0]

  y = layers.embed(params['decoder']['token_embed'], token, dtype=dtype)
  pos = jnp.asarray(layers.sinusoidal_table(config.max_positions,
                                            config.emb_dim))
  y = y + jax.lax.dynamic_slice_in_dim(pos, state.index, 1, axis=0)[0]
  y = y.astype(dtype)

  quantized = state.cache.quantized

  def layer_step(y, scan_in):
    (layer_params, cache_k, cache_v, k_scale, v_scale,
     cross_k, cross_v, cross_ks, cross_vs) = scan_in
    h = layers.rms_norm(layer_params['pre_self_attention_norm'], y,
                        dtype=dtype)
    result = layers.attention_decode_step(
        layer_params['self_attention'], h, cache_k, cache_v, state.index,
        config.num_heads, config.head_dim, dtype=dtype,
        cache_update=config.decode_cache_update,
        attention_impl=config.decode_attention_impl,
        cache_k_scale=k_scale, cache_v_scale=v_scale,
        num_kv_heads=config.num_kv_heads)
    if quantized:
      h, cache_k, cache_v, k_scale, v_scale = result
    else:
      h, cache_k, cache_v = result
    y = y + h
    h = layers.rms_norm(layer_params['pre_cross_attention_norm'], y,
                        dtype=dtype)
    h = layers.cross_attention_decode_step(
        layer_params['cross_attention'], h, cross_k, cross_v,
        config.num_heads, config.head_dim, dtype=dtype,
        num_kv_heads=config.num_kv_heads,
        key_scale=cross_ks, value_scale=cross_vs)
    y = y + h
    h = layers.rms_norm(layer_params['pre_mlp_norm'], y, dtype=dtype)
    h = layers.gated_mlp(layer_params['mlp'], h, config.mlp_activations,
                         dtype=dtype)
    y = y + h
    return y, (cache_k, cache_v, k_scale, v_scale)

  # Fully unrolled: the per-token step is latency-sensitive and unrolling
  # lets XLA fuse across the (few) decoder layers.  None entries in xs/ys
  # are empty pytrees, so the same scan covers all quantization configs.
  y, (new_k, new_v, new_ks, new_vs) = jax.lax.scan(
      layer_step, y,
      (params['decoder']['layers'], state.cache.key, state.cache.value,
       state.cache.key_scale, state.cache.value_scale,
       state.cross_k, state.cross_v,
       state.cross_k_scale, state.cross_v_scale),
      unroll=True)

  y = layers.rms_norm(params['decoder']['norm'], y, dtype=dtype)
  logits = layers.dense(params['decoder']['logits'], y, jnp.float32)

  new_state = DecodeState(
      cache=KVCache(key=new_k, value=new_v, key_scale=new_ks,
                    value_scale=new_vs),
      cross_k=state.cross_k, cross_v=state.cross_v,
      index=state.index + 1,
      cross_k_scale=state.cross_k_scale,
      cross_v_scale=state.cross_v_scale)
  return logits, new_state


def _decode_step_stacked(params: PyTree, config: ModelConfig, token: Array,
                         state: DecodeState) -> Tuple[Array, DecodeState]:
  """decode_step with in-place stacked-cache column writes.

  A static Python loop over layers; each layer's new K/V column lands in
  the full [L,b,h,d,len] cache via one small dynamic_update_slice, so
  the while-loop carry is updated in place rather than rebuilt from
  lax.scan ys (which costs a cache-sized copy per token — see
  ModelConfig.decode_cache_carry and the PERF.md round-3 ledger).
  """
  dtype = _dtype(config)
  if config.decode_cache_update != 'dus':
    raise ValueError("decode_cache_carry='stacked' requires "
                     "decode_cache_update='dus'")

  y = layers.embed(params['decoder']['token_embed'], token, dtype=dtype)
  pos = jnp.asarray(layers.sinusoidal_table(config.max_positions,
                                            config.emb_dim))
  y = y + jax.lax.dynamic_slice_in_dim(pos, state.index, 1, axis=0)[0]
  y = y.astype(dtype)

  cache = state.cache
  stacked = params['decoder']['layers']
  for l in range(config.num_decoder_layers):
    lp = jax.tree_util.tree_map(lambda p: p[l], stacked)
    h = layers.rms_norm(lp['pre_self_attention_norm'], y, dtype=dtype)
    h, cache = layers.self_attention_decode_stacked(
        lp['self_attention'], h, cache, l, state.index,
        config.num_heads, config.head_dim, dtype=dtype,
        attention_impl=config.decode_attention_impl,
        num_kv_heads=config.num_kv_heads)
    y = y + h
    h = layers.rms_norm(lp['pre_cross_attention_norm'], y, dtype=dtype)
    h = layers.cross_attention_decode_step(
        lp['cross_attention'], h, state.cross_k[l], state.cross_v[l],
        config.num_heads, config.head_dim, dtype=dtype,
        num_kv_heads=config.num_kv_heads,
        key_scale=(None if state.cross_k_scale is None
                   else state.cross_k_scale[l]),
        value_scale=(None if state.cross_v_scale is None
                     else state.cross_v_scale[l]))
    y = y + h
    h = layers.rms_norm(lp['pre_mlp_norm'], y, dtype=dtype)
    h = layers.gated_mlp(lp['mlp'], h, config.mlp_activations,
                         dtype=dtype)
    y = y + h

  y = layers.rms_norm(params['decoder']['norm'], y, dtype=dtype)
  logits = layers.dense(params['decoder']['logits'], y, jnp.float32)

  new_state = DecodeState(
      cache=cache, cross_k=state.cross_k, cross_v=state.cross_v,
      index=state.index + 1,
      cross_k_scale=state.cross_k_scale,
      cross_v_scale=state.cross_v_scale)
  return logits, new_state
