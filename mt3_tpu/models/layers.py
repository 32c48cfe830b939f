"""Functional neural-net building blocks (no flax).

TPU-first rebuild of the layer library the reference gets from
/root/reference/mt3/layers.py (flax.linen modules).  Design differences:

  * Parameters are plain pytrees (dicts of jnp arrays) built by `init`
    functions; every apply function is a pure function of (params, inputs).
  * Each parameter leaf has a parallel "logical axes" annotation used by
    mt3_tpu.parallel to build NamedShardings (the equivalent of t5x's
    param_with_axes, reference layers.py:408-413).
  * Dense kernels are stored flattened 2-D exactly like t5x DenseGeneral
    (reference layers.py:406-415), which keeps published-checkpoint
    conversion a pure reshape-free renaming.
  * Matmul-heavy ops cast to a configurable compute dtype (bfloat16 on TPU)
    while params and layer norms stay float32.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
PyTree = Any

# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------
dense_init = jax.nn.initializers.variance_scaling(
    1.0, 'fan_in', 'truncated_normal')
embed_init = jax.nn.initializers.normal(stddev=1.0)


def query_init(key, shape, dtype=jnp.float32, head_dim: int = 64):
  """Query kernel pre-scaled by 1/sqrt(head_dim).

  T5 folds the 1/sqrt(d) attention scaling into the query projection's
  initialization (reference layers.py:230-234), equivalent under Adafactor.
  """
  return dense_init(key, shape, dtype) / np.sqrt(head_dim)


# ---------------------------------------------------------------------------
# Sinusoidal position table
# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def sinusoidal_table(max_len: int, features: int, min_scale: float = 1.0,
                     max_scale: float = 10000.0) -> np.ndarray:
  """Fixed sinusoidal embeddings [max_len, features].

  Identical layout to the reference sinusoidal initializer
  (layers.py:51-82): sin block in the first half of the feature dim, cos
  block in the second half.
  """
  pe = np.zeros((max_len, features), dtype=np.float32)
  position = np.arange(0, max_len)[:, np.newaxis]
  scale_factor = -np.log(max_scale / min_scale) / (features // 2 - 1)
  div_term = min_scale * np.exp(np.arange(0, features // 2) * scale_factor)
  pe[:, :features // 2] = np.sin(position * div_term)
  pe[:, features // 2:2 * (features // 2)] = np.cos(position * div_term)
  return pe


# ---------------------------------------------------------------------------
# Primitive ops
# ---------------------------------------------------------------------------
def rms_norm(scale: Array, x: Array, epsilon: float = 1e-6,
             dtype=jnp.float32) -> Array:
  """T5 LayerNorm: RMS only, no mean subtraction, no bias (layers.py:604)."""
  x = x.astype(jnp.float32)
  mean2 = jnp.mean(jax.lax.square(x), axis=-1, keepdims=True)
  y = (x * jax.lax.rsqrt(mean2 + epsilon)).astype(dtype)
  return y * scale.astype(dtype)


def matmul_precision(dtype) -> jax.lax.Precision:
  """Explicit matmul precision policy.

  When computing in float32 we demand true float32 accumulation (the
  backend default silently runs reduced-precision passes); in bfloat16 the
  fast MXU path is exactly what we asked for.
  """
  return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
          else jax.lax.Precision.DEFAULT)


def dense(kernel: Array, x: Array, dtype=jnp.float32) -> Array:
  """y = x @ kernel with kernel stored 2-D [in_features, out_features]."""
  return jnp.matmul(x.astype(dtype), kernel.astype(dtype),
                    precision=matmul_precision(dtype))


def gated_mlp(params: PyTree, x: Array, activations: Sequence[str],
              dtype=jnp.float32) -> Array:
  """Multi-activation gated MLP (reference MlpBlock, layers.py:435-486).

  activations like ('gelu', 'linear') produce gelu(x @ wi_0) * (x @ wi_1),
  then project back with wo.
  """
  acts = []
  for idx, act_name in enumerate(activations):
    name = 'wi' if len(activations) == 1 else f'wi_{idx}'
    h = dense(params[name], x, dtype)
    acts.append(_activation(act_name)(h))
  h = functools.reduce(jnp.multiply, acts)
  return dense(params['wo'], h, dtype)


def _activation(name: str):
  if name == 'linear':
    return lambda x: x
  if name == 'gelu':
    # flax.linen.gelu defaults to the tanh approximation; parity matters
    # for published-checkpoint equivalence.
    return functools.partial(jax.nn.gelu, approximate=True)
  return getattr(jax.nn, name)


def embed(table: Array, ids: Array, dtype=jnp.float32,
          one_hot: bool = True) -> Array:
  """Token embedding lookup.

  one_hot=True performs the gather as a one-hot contraction, which maps to
  the MXU and partitions cleanly under SPMD (reference layers.py:530-533).
  """
  if one_hot:
    one_hot_ids = jax.nn.one_hot(ids, table.shape[0], dtype=dtype)
    return jnp.dot(one_hot_ids, table.astype(dtype),
                   precision=matmul_precision(dtype))
  return table.astype(dtype)[ids]


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------
def multihead_params_init(key, emb_dim: int, num_heads: int, head_dim: int,
                          num_kv_heads: Optional[int] = None,
                          ) -> Tuple[PyTree, PyTree]:
  """Init q/k/v/out projection kernels; returns (params, logical axes).

  num_kv_heads < num_heads gives grouped-query attention: K/V project to
  fewer heads, each shared by num_heads // num_kv_heads query heads.
  """
  kq, kk, kv, ko = jax.random.split(key, 4)
  joined = num_heads * head_dim
  joined_kv = (num_kv_heads or num_heads) * head_dim
  params = {
      'query': query_init(kq, (emb_dim, joined), head_dim=head_dim),
      'key': dense_init(kk, (emb_dim, joined_kv)),
      'value': dense_init(kv, (emb_dim, joined_kv)),
      'out': dense_init(ko, (joined, emb_dim)),
  }
  axes = {
      'query': ('embed', 'joined_kv'),
      'key': ('embed', 'joined_kv'),
      'value': ('embed', 'joined_kv'),
      'out': ('joined_kv', 'embed'),
  }
  return params, axes


def attention(params: PyTree, inputs_q: Array, inputs_kv: Array,
              bias: Optional[Array], num_heads: int, head_dim: int,
              dtype=jnp.float32,
              dropout_rng: Optional[Array] = None,
              dropout_rate: float = 0.0,
              num_kv_heads: Optional[int] = None,
              flash_mode: Optional[str] = None) -> Array:
  """Full (non-incremental) multi-head dot-product attention.

  inputs_q: [b, q, emb]; inputs_kv: [b, k, emb];
  bias: additive [b, 1|h, q, k] or None.  Softmax in float32.
  With num_kv_heads < num_heads (GQA) the K/V heads are shared across
  query-head groups.

  flash_mode 'causal'/'full' routes through the stock TPU Pallas flash
  kernel (blockwise online softmax — no [b,h,q,k] score materialization,
  the dominant HBM cost of the training step).  Valid only when the bias
  is exactly the causal mask / no mask: true for all three training
  attention sites with unpacked data (padded keys sit past every valid
  query under causality, and outputs at padded query positions carry
  zero loss weight).

  Attention dropout composes with flash exactly: the reference broadcasts
  the post-softmax dropout mask along the query dim
  (/root/reference/mt3/layers.py:146-156, mask [b,h,1,k]), and for a
  q-independent mask, weights*mask @ V == weights @ (V*mask') — so the
  dropout is applied as a per-(b,h,k) rescale of V *before* the kernel,
  bit-identical in expectation and sample to the XLA path's mask draw.
  """
  b, q_len, _ = inputs_q.shape
  k_len = inputs_kv.shape[1]
  kv_heads = num_kv_heads or num_heads
  query = dense(params['query'], inputs_q, dtype).reshape(
      b, q_len, num_heads, head_dim)
  key = dense(params['key'], inputs_kv, dtype).reshape(
      b, k_len, kv_heads, head_dim)
  value = dense(params['value'], inputs_kv, dtype).reshape(
      b, k_len, kv_heads, head_dim)
  if kv_heads != num_heads:
    group = num_heads // kv_heads
    key = jnp.repeat(key, group, axis=2)
    value = jnp.repeat(value, group, axis=2)

  if flash_mode not in (None, 'causal', 'full'):
    raise ValueError(f'unknown flash_mode: {flash_mode}')
  # The stock kernel's backward pass mis-tiles below one (8,128) TPU tile
  # (e.g. the tiny preset's 8-frame encoder); flash has no advantage at
  # those sizes, so fall back to the einsum path.  The dropout mask draw
  # below is identical on both paths, so numerics stay consistent.
  if flash_mode is not None and min(q_len, k_len) >= 128:
    if dropout_rng is not None and dropout_rate > 0.0:
      # Same mask draw as the XLA path below ([b, h, 1, k]); folded into
      # V rows, which is exact for a query-broadcast mask.
      keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                  (b, num_heads, 1, k_len))
      mult = (keep.astype(dtype)
              / jnp.asarray(1.0 - dropout_rate, dtype))  # [b, h, 1, k]
      value = value * jnp.transpose(mult, (0, 3, 1, 2))  # [b, k, h, 1]
    # The bias argument is intentionally ignored here: callers may only
    # pass flash_mode when the bias is exactly the causal mask
    # ('causal') or no mask at all ('full').  If sequence packing or
    # any other nontrivial bias is ever introduced, those call sites
    # must stop passing flash_mode.
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)
    bq = min(512, q_len)
    bk = min(512, k_len)
    block_sizes = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
        block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk,
        block_q_dq=bq)
    out = flash_attention(
        query.transpose(0, 2, 1, 3), key.transpose(0, 2, 1, 3),
        value.transpose(0, 2, 1, 3),
        causal=(flash_mode == 'causal'), sm_scale=1.0,
        block_sizes=block_sizes)
    out = out.transpose(0, 2, 1, 3).astype(dtype)
    return dense(params['out'],
                 out.reshape(b, q_len, num_heads * head_dim), dtype)

  # [b, h, q, k]
  logits = jnp.einsum('bqhd,bkhd->bhqk', query, key,
                      precision=matmul_precision(dtype)).astype(jnp.float32)
  if bias is not None:
    logits = logits + bias.astype(jnp.float32)
  weights = jax.nn.softmax(logits, axis=-1).astype(dtype)

  if dropout_rng is not None and dropout_rate > 0.0:
    # T5 broadcasts attention dropout along the query-length dim.
    keep_shape = list(weights.shape)
    keep_shape[-2] = 1
    keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                tuple(keep_shape))
    weights = weights * (
        keep.astype(dtype) / jnp.asarray(1.0 - dropout_rate, dtype))

  out = jnp.einsum('bhqk,bkhd->bqhd', weights, value,
                   precision=matmul_precision(dtype))
  return dense(params['out'], out.reshape(b, q_len, num_heads * head_dim),
               dtype)


@dataclasses.dataclass
class KVCache:
  """Decoder self-attention cache for one attention stack.

  Keys/values are stored [layers, batch, heads, head_dim, length]: length
  on the minor (lane) axis keeps every tile dense (head_dim 64 on the
  minor axis would pad to 128 lanes and double all read traffic — measured
  ~20% slower end-to-end).  The decode driver additionally grows the
  length axis in buckets so attention reads scale with the live prefix
  (see mt3_tpu/infer/decode.py).

  Optionally int8-quantized with per-(batch, head, position) scales
  (key_scale/value_scale [L, b, h, len]) — halves the HBM traffic the
  decode loop is bound on; quantization error is per-vector symmetric
  int8 (~0.4% RMS).
  """
  key: Array    # [L, b, h, d, len]
  value: Array  # [L, b, h, d, len]
  key_scale: Optional[Array] = None    # [L, b, h, len] (int8 cache only)
  value_scale: Optional[Array] = None

  @property
  def quantized(self) -> bool:
    return self.key_scale is not None


def init_kv_cache(num_layers: int, batch: int, num_heads: int, head_dim: int,
                  max_len: int, dtype=jnp.float32,
                  quantized: bool = False, bits: int = 8) -> KVCache:
  shape = (num_layers, batch, num_heads, head_dim, max_len)
  if quantized:
    qdtype = jnp.int4 if bits == 4 else jnp.int8
    scale_shape = (num_layers, batch, num_heads, max_len)
    return KVCache(key=jnp.zeros(shape, qdtype),
                   value=jnp.zeros(shape, qdtype),
                   key_scale=jnp.zeros(scale_shape, jnp.float32),
                   value_scale=jnp.zeros(scale_shape, jnp.float32))
  return KVCache(key=jnp.zeros(shape, dtype),
                 value=jnp.zeros(shape, dtype))


def grow_kv_cache(cache: KVCache, new_len: int) -> KVCache:
  """Zero-pad the length axis up to new_len (bucketed decode growth)."""
  cur = cache.key.shape[-1]
  if new_len <= cur:
    return cache
  delta = new_len - cur
  pad = [(0, 0)] * cache.key.ndim
  pad[-1] = (0, delta)
  scale_pad = pad[:-2] + [pad[-1]]
  return KVCache(
      key=jnp.pad(cache.key, pad),
      value=jnp.pad(cache.value, pad),
      key_scale=(None if cache.key_scale is None
                 else jnp.pad(cache.key_scale, scale_pad)),
      value_scale=(None if cache.value_scale is None
                   else jnp.pad(cache.value_scale, scale_pad)))


def _quantize_kv(x: Array, qdtype=jnp.int8) -> Tuple[Array, Array]:
  """Symmetric per-(b,h) int quantization of a [b, h, d] vector.

  qdtype int8 uses 127 levels; int4 uses 7 (halving HBM cache traffic
  again at ~6% RMS error on K/V vectors).
  """
  levels = 7.0 if qdtype == jnp.int4 else 127.0
  scale = jnp.max(jnp.abs(x), axis=-1) / levels            # [b, h]
  scale = jnp.maximum(scale, 1e-8)
  q = jnp.round(x / scale[..., None]).astype(qdtype)
  return q, scale.astype(jnp.float32)


def attention_decode_step(
    params: PyTree, x: Array, cache_k: Array, cache_v: Array,
    cache_index: Array, num_heads: int, head_dim: int,
    dtype=jnp.float32, cache_update: str = 'dus',
    attention_impl: str = 'xla',
    cache_k_scale: Optional[Array] = None,
    cache_v_scale: Optional[Array] = None,
    num_kv_heads: Optional[int] = None):
  """Single-position self-attention against a [b,h,d,len] cache slice.

  x: [b, emb] single-step input.  Returns (output [b, emb], new_cache_k,
  new_cache_v[, new_k_scale, new_v_scale]).  cache_update 'dus' writes one
  length column in place (O(b*h*d) bytes/step); 'onehot' uses the
  reference's broadcast-add trick (lane-aligned but rewrites the whole
  cache each step).  With int8 caches (scales given), new K/V vectors are
  quantized per (batch, head) and dequantization folds into the attention
  einsums, halving cache read traffic.  The causal mask is an index
  comparison.
  """
  b = x.shape[0]
  max_len = cache_k.shape[-1]
  kv_heads = num_kv_heads or num_heads
  group = num_heads // kv_heads
  # Grouped query layout [b, kv, g, d]; g == 1 recovers standard MHA.
  query = dense(params['query'], x, dtype).reshape(
      b, kv_heads, group, head_dim)
  key = dense(params['key'], x, dtype).reshape(b, kv_heads, head_dim)
  value = dense(params['value'], x, dtype).reshape(b, kv_heads, head_dim)

  if attention_impl == 'xla_int8dot' and cache_k_scale is None:
    raise ValueError(
        "decode_attention_impl='xla_int8dot' requires decode_kv_quantize")
  if attention_impl.startswith('pallas') and cache_k_scale is not None:
    raise ValueError(
        'pallas decode kernels do not support quantized caches; '
        'use the xla implementations with decode_kv_quantize')
  if cache_k_scale is not None:
    zero = jnp.zeros((), jnp.int32)
    key_q, key_scale = _quantize_kv(key, cache_k.dtype)
    value_q, value_scale = _quantize_kv(value, cache_v.dtype)
    cache_k = jax.lax.dynamic_update_slice(
        cache_k, key_q[..., None], (zero, zero, zero, cache_index))
    cache_v = jax.lax.dynamic_update_slice(
        cache_v, value_q[..., None], (zero, zero, zero, cache_index))
    cache_k_scale = jax.lax.dynamic_update_slice(
        cache_k_scale, key_scale[..., None], (zero, zero, cache_index))
    cache_v_scale = jax.lax.dynamic_update_slice(
        cache_v_scale, value_scale[..., None], (zero, zero, cache_index))

    out = _cached_attention_math(
        query, cache_k, cache_v, cache_k_scale, cache_v_scale,
        cache_index, max_len, b, num_heads, head_dim, group, dtype,
        attention_impl)
    out = dense(params['out'], out, dtype)
    return out, cache_k, cache_v, cache_k_scale, cache_v_scale

  if attention_impl == 'pallas_v3':
    # Fused in-place cache write + prefix-proportional attention.
    if group != 1:
      raise NotImplementedError('pallas decode kernels are MHA-only')
    from mt3_tpu.ops.pallas import decode_attention_v3 as da3
    batch_block = next(bb for bb in (8, 4, 2, 1) if b % bb == 0)
    len_block = next(lb for lb in (256, 128, max_len)
                     if max_len % lb == 0)
    out, cache_k, cache_v = da3.decode_attention_inplace(
        query.reshape(b, num_heads, head_dim), key, value,
        cache_k, cache_v, cache_index,
        batch_block=batch_block, len_block=len_block)
    out = dense(params['out'], out.reshape(b, num_heads * head_dim),
                dtype)
    return out, cache_k, cache_v

  if cache_update == 'onehot':
    one_hot = jax.nn.one_hot(cache_index, max_len, dtype=dtype)  # [len]
    cache_k = cache_k + key[..., None] * one_hot
    cache_v = cache_v + value[..., None] * one_hot
  else:
    zero = jnp.zeros((), jnp.int32)
    cache_k = jax.lax.dynamic_update_slice(
        cache_k, key[..., None], (zero, zero, zero, cache_index))
    cache_v = jax.lax.dynamic_update_slice(
        cache_v, value[..., None], (zero, zero, zero, cache_index))

  out = _cached_attention_math(
      query, cache_k, cache_v, None, None, cache_index, max_len, b,
      num_heads, head_dim, group, dtype, attention_impl)
  out = dense(params['out'], out, dtype)
  return out, cache_k, cache_v


def self_attention_decode_stacked(
    params: PyTree, x: Array, cache: KVCache, layer: int,
    cache_index: Array, num_heads: int, head_dim: int,
    dtype=jnp.float32, attention_impl: str = 'xla',
    num_kv_heads: Optional[int] = None) -> Tuple[Array, KVCache]:
  """Decode-step self-attention writing into the STACKED [L,..] cache.

  Same math as attention_decode_step, but the new K/V column is written
  with one small dynamic_update_slice into the full stacked cache at
  (layer, ..., index) instead of carrying per-layer slices through scan
  ys — rebuilding the stacked cache from scan outputs costs a
  cache-sized HBM copy per decode step, the dominant avoidable traffic
  at production batch sizes (PERF.md round 3).  Returns
  (out [b, emb], new KVCache).
  """
  b = x.shape[0]
  max_len = cache.key.shape[-1]
  kv_heads = num_kv_heads or num_heads
  group = num_heads // kv_heads
  if attention_impl not in ('xla', 'xla_int8dot'):
    raise ValueError(
        f"decode_cache_carry='stacked' supports attention_impl 'xla' / "
        f"'xla_int8dot', not {attention_impl!r}")
  if attention_impl == 'xla_int8dot' and not cache.quantized:
    raise ValueError(
        "decode_attention_impl='xla_int8dot' requires decode_kv_quantize")
  query = dense(params['query'], x, dtype).reshape(
      b, kv_heads, group, head_dim)
  key = dense(params['key'], x, dtype).reshape(b, kv_heads, head_dim)
  value = dense(params['value'], x, dtype).reshape(b, kv_heads, head_dim)

  zero = jnp.zeros((), jnp.int32)
  lidx = jnp.asarray(layer, jnp.int32)
  quantized = cache.quantized
  if quantized:
    key_col, key_scale = _quantize_kv(key, cache.key.dtype)
    value_col, value_scale = _quantize_kv(value, cache.value.dtype)
    new_ks = jax.lax.dynamic_update_slice(
        cache.key_scale, key_scale[None, ..., None],
        (lidx, zero, zero, cache_index))
    new_vs = jax.lax.dynamic_update_slice(
        cache.value_scale, value_scale[None, ..., None],
        (lidx, zero, zero, cache_index))
  else:
    key_col = key.astype(cache.key.dtype)
    value_col = value.astype(cache.value.dtype)
    new_ks, new_vs = None, None
  new_k = jax.lax.dynamic_update_slice(
      cache.key, key_col[None, ..., None].astype(cache.key.dtype),
      (lidx, zero, zero, zero, cache_index))
  new_v = jax.lax.dynamic_update_slice(
      cache.value, value_col[None, ..., None].astype(cache.value.dtype),
      (lidx, zero, zero, zero, cache_index))
  new_cache = KVCache(key=new_k, value=new_v, key_scale=new_ks,
                      value_scale=new_vs)

  out = _cached_attention_math(
      query, new_k[layer], new_v[layer],
      new_ks[layer] if quantized else None,
      new_vs[layer] if quantized else None,
      cache_index, max_len, b, num_heads, head_dim, group, dtype,
      attention_impl)
  return dense(params['out'], out, dtype), new_cache


def _cached_attention_math(query, cache_k, cache_v, k_scale, v_scale,
                           cache_index, max_len, b, num_heads, head_dim,
                           group, dtype, attention_impl):
  """Shared decode attention over one layer's cache slice.

  query: [b, kv, g, d]; cache_k/v: [b, kv, d, len]; scales [b, kv, len]
  or None.  Returns [b, num_heads * head_dim].
  """
  if k_scale is not None and group == 1:
    if attention_impl == 'xla_int8dot':
      q3 = query.reshape(b, num_heads, head_dim)
      q_q, q_scale = _quantize_kv(q3.astype(jnp.float32))
      logits = jnp.einsum('bhd,bhdl->bhl', q_q, cache_k,
                          preferred_element_type=jnp.int32)
      logits = logits.astype(jnp.float32) * (q_scale[..., None] * k_scale)
      visible = (jnp.arange(max_len) <= cache_index)[None, None, :]
      logits = jnp.where(visible, logits, -1e10)
      weights = jax.nn.softmax(logits, axis=-1)
      wv = weights * v_scale
      wv_q, wv_scale = _quantize_kv(wv)
      out = jnp.einsum('bhl,bhdl->bhd', wv_q, cache_v,
                       preferred_element_type=jnp.int32)
      out = (out.astype(jnp.float32) * wv_scale[..., None]).astype(dtype)
    else:
      q3 = query.reshape(b, num_heads, head_dim)
      logits = jnp.einsum('bhd,bhdl->bhl', q3, cache_k.astype(dtype),
                          precision=matmul_precision(dtype))
      logits = logits.astype(jnp.float32) * k_scale
      visible = (jnp.arange(max_len) <= cache_index)[None, None, :]
      logits = jnp.where(visible, logits, -1e10)
      weights = jax.nn.softmax(logits, axis=-1)
      weights = (weights * v_scale).astype(dtype)
      out = jnp.einsum('bhl,bhdl->bhd', weights, cache_v.astype(dtype),
                       precision=matmul_precision(dtype))
  elif k_scale is not None:
    logits = jnp.einsum('bkgd,bkdl->bkgl', query, cache_k.astype(dtype),
                        precision=matmul_precision(dtype))
    logits = logits.astype(jnp.float32) * k_scale[:, :, None, :]
    visible = (jnp.arange(max_len) <= cache_index)[None, None, None, :]
    logits = jnp.where(visible, logits, -1e10)
    weights = jax.nn.softmax(logits, axis=-1)
    weights = (weights * v_scale[:, :, None, :]).astype(dtype)
    out = jnp.einsum('bkgl,bkdl->bkgd', weights, cache_v.astype(dtype),
                     precision=matmul_precision(dtype))
  elif group == 1:
    q3 = query.reshape(b, num_heads, head_dim)
    logits = jnp.einsum(
        'bhd,bhdl->bhl', q3, cache_k.astype(dtype),
        precision=matmul_precision(dtype)).astype(jnp.float32)
    visible = (jnp.arange(max_len) <= cache_index)[None, None, :]
    logits = jnp.where(visible, logits, -1e10)
    weights = jax.nn.softmax(logits, axis=-1).astype(dtype)
    out = jnp.einsum('bhl,bhdl->bhd', weights, cache_v.astype(dtype),
                     precision=matmul_precision(dtype))
  else:
    logits = jnp.einsum(
        'bkgd,bkdl->bkgl', query, cache_k.astype(dtype),
        precision=matmul_precision(dtype)).astype(jnp.float32)
    visible = (jnp.arange(max_len) <= cache_index)[None, None, None, :]
    logits = jnp.where(visible, logits, -1e10)
    weights = jax.nn.softmax(logits, axis=-1).astype(dtype)
    out = jnp.einsum('bkgl,bkdl->bkgd', weights, cache_v.astype(dtype),
                     precision=matmul_precision(dtype))
  return out.reshape(b, num_heads * head_dim)


def quantize_kv_sequence(x: Array) -> Tuple[Array, Array]:
  """Symmetric per-(..., position) int8 quantization of [..., d, len]."""
  scale = jnp.max(jnp.abs(x), axis=-2) / 127.0          # [..., len]
  scale = jnp.maximum(scale, 1e-8)
  q = jnp.round(x / scale[..., None, :]).astype(jnp.int8)
  return q, scale.astype(jnp.float32)


def cross_attention_decode_step(
    params: PyTree, x: Array, keys: Array, values: Array,
    num_heads: int, head_dim: int, dtype=jnp.float32,
    num_kv_heads: Optional[int] = None,
    key_scale: Optional[Array] = None,
    value_scale: Optional[Array] = None) -> Array:
  """Single-position cross-attention over precomputed encoder K/V.

  x: [b, emb]; keys/values: [b, kv, d, enc_len] projected once per
  segment (same lane-dense layout as the self-attention cache: enc_len on
  the minor axis avoids the 2x lane padding a trailing head_dim=64
  causes).  With key_scale/value_scale [b, kv, enc_len], keys/values are
  int8 and dequantization folds into the einsums (halves the dominant
  fixed per-step HBM read).
  """
  b = x.shape[0]
  kv_heads = num_kv_heads or num_heads
  group = num_heads // kv_heads
  if group == 1:
    query = dense(params['query'], x, dtype).reshape(
        b, num_heads, head_dim)
    logits = jnp.einsum(
        'bhd,bhdk->bhk', query, keys.astype(dtype),
        precision=matmul_precision(dtype)).astype(jnp.float32)
    if key_scale is not None:
      logits = logits * key_scale
    weights = jax.nn.softmax(logits, axis=-1).astype(dtype)
    if value_scale is not None:
      weights = (weights.astype(jnp.float32) * value_scale).astype(dtype)
    out = jnp.einsum('bhk,bhdk->bhd', weights, values.astype(dtype),
                     precision=matmul_precision(dtype))
  else:
    query = dense(params['query'], x, dtype).reshape(
        b, kv_heads, group, head_dim)
    logits = jnp.einsum(
        'bkgd,bkde->bkge', query, keys.astype(dtype),
        precision=matmul_precision(dtype)).astype(jnp.float32)
    if key_scale is not None:
      logits = logits * key_scale[:, :, None, :]
    weights = jax.nn.softmax(logits, axis=-1).astype(dtype)
    if value_scale is not None:
      weights = (weights.astype(jnp.float32)
                 * value_scale[:, :, None, :]).astype(dtype)
    out = jnp.einsum('bkge,bkde->bkgd', weights, values.astype(dtype),
                     precision=matmul_precision(dtype))
  return dense(params['out'], out.reshape(b, num_heads * head_dim), dtype)


# ---------------------------------------------------------------------------
# Mask / bias construction.  Masks are built directly as additive biases
# (0 where attendable, -1e10 where masked), matching layers.py:316-324.
# ---------------------------------------------------------------------------
NEG_INF = -1e10


def make_attention_bias(query_mask: Array, key_mask: Array,
                        dtype=jnp.float32) -> Array:
  """[b, q] x [b, k] boolean-ish masks -> additive bias [b, 1, q, k]."""
  mask = query_mask[:, :, None] * key_mask[:, None, :]
  bias = jnp.where(mask > 0, 0.0, NEG_INF).astype(dtype)
  return bias[:, None, :, :]


def make_causal_bias(length: int, dtype=jnp.float32) -> Array:
  """Additive causal bias [1, 1, q, k]."""
  idx = jnp.arange(length)
  mask = idx[:, None] >= idx[None, :]
  bias = jnp.where(mask, 0.0, NEG_INF).astype(dtype)
  return bias[None, None, :, :]


def make_decoder_bias(decoder_target_tokens: Array,
                      dtype=jnp.float32) -> Array:
  """Causal + padding self-attention bias for teacher-forced decoding.

  Reference semantics (layers.py:734-830, no packing): position i may
  attend to j iff j <= i and both tokens are non-padding.
  """
  length = decoder_target_tokens.shape[-1]
  causal = make_causal_bias(length, dtype)
  nonpad = (decoder_target_tokens > 0).astype(dtype)
  padding = make_attention_bias(nonpad, nonpad, dtype)
  return jnp.maximum(causal + padding, NEG_INF)
