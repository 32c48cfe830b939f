"""Pallas decode-attention kernel vs the XLA reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mt3_tpu.ops.pallas import decode_attention


def _reference(query, cache_k, cache_v, index):
  logits = jnp.einsum('bhd,bhdl->bhl', query, cache_k)
  max_len = cache_k.shape[-1]
  visible = (jnp.arange(max_len) <= index)[None, None, :]
  logits = jnp.where(visible, logits, -1e30)
  weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
  return jnp.einsum('bhl,bhdl->bhd', weights.astype(query.dtype), cache_v)


@pytest.mark.parametrize('index', [0, 5, 255, 256, 300, 511])
def test_matches_reference(index):
  b, h, d, max_len = 8, 6, 64, 512
  rng = jax.random.PRNGKey(0)
  kq, kk, kv = jax.random.split(rng, 3)
  query = jax.random.normal(kq, (b, h, d))
  cache_k = jax.random.normal(kk, (b, h, d, max_len))
  cache_v = jax.random.normal(kv, (b, h, d, max_len))
  # Zero out positions after index, like a real cache.
  mask = (jnp.arange(max_len) <= index).astype(jnp.float32)
  cache_k = cache_k * mask
  cache_v = cache_v * mask

  ref = _reference(query, cache_k, cache_v, jnp.array(index))
  out = decode_attention.decode_attention(
      query, cache_k, cache_v, jnp.array(index), interpret=True)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                             atol=1e-5, rtol=1e-5)


def test_bf16_inputs():
  b, h, d, max_len = 8, 6, 64, 256
  rng = jax.random.PRNGKey(1)
  query = jax.random.normal(rng, (b, h, d), jnp.bfloat16)
  cache_k = jax.random.normal(rng, (b, h, d, max_len), jnp.bfloat16)
  cache_v = jax.random.normal(rng, (b, h, d, max_len), jnp.bfloat16)
  index = jnp.array(100)
  ref = _reference(query.astype(jnp.float32), cache_k.astype(jnp.float32),
                   cache_v.astype(jnp.float32), index)
  out = decode_attention.decode_attention(query, cache_k, cache_v, index,
                                          interpret=True)
  assert out.dtype == jnp.bfloat16
  np.testing.assert_allclose(np.asarray(out, np.float32),
                             np.asarray(ref), atol=0.05, rtol=0.05)


@pytest.mark.parametrize('index', [0, 100, 255, 256, 511])
def test_v2_matches_reference(index):
  from mt3_tpu.ops.pallas import decode_attention_v2
  b, h, d, max_len = 16, 6, 64, 512
  rng = jax.random.PRNGKey(2)
  kq, kk, kv = jax.random.split(rng, 3)
  query = jax.random.normal(kq, (b, h, d))
  mask = (jnp.arange(max_len) <= index).astype(jnp.float32)
  cache_k = jax.random.normal(kk, (b, h, d, max_len)) * mask
  cache_v = jax.random.normal(kv, (b, h, d, max_len)) * mask
  ref = _reference(query, cache_k, cache_v, jnp.array(index))
  out = decode_attention_v2.decode_attention(
      query, cache_k, cache_v, jnp.array(index), interpret=True)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                             atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize('index', [0, 100, 255, 256, 511])
def test_v3_inplace_matches_reference(index):
  from mt3_tpu.ops.pallas import decode_attention_v3
  b, h, d, max_len = 16, 6, 64, 512
  rng = jax.random.PRNGKey(3)
  kq, kk, kv, kn = jax.random.split(rng, 4)
  query = jax.random.normal(kq, (b, h, d))
  new_k = jax.random.normal(kn, (b, h, d))
  new_v = jax.random.normal(jax.random.fold_in(kn, 1), (b, h, d))
  # Cache holds positions < index; position index arrives via new_k/v.
  mask = (jnp.arange(max_len) < index).astype(jnp.float32)
  cache_k = jax.random.normal(kk, (b, h, d, max_len)) * mask
  cache_v = jax.random.normal(kv, (b, h, d, max_len)) * mask

  # Reference: write then attend.
  ref_ck = cache_k.at[:, :, :, index].set(new_k)
  ref_cv = cache_v.at[:, :, :, index].set(new_v)
  ref = _reference(query, ref_ck, ref_cv, jnp.array(index))

  out, ck2, cv2 = decode_attention_v3.decode_attention_inplace(
      query, new_k, new_v, cache_k, cache_v, jnp.array(index),
      interpret=True)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                             atol=1e-5, rtol=1e-5)
  np.testing.assert_allclose(np.asarray(ck2), np.asarray(ref_ck),
                             atol=1e-6)
  np.testing.assert_allclose(np.asarray(cv2), np.asarray(ref_cv),
                             atol=1e-6)


def test_v1_under_shard_map():
  """Kernel partitions over the batch (data) axis with shard_map."""
  from jax.sharding import Mesh, PartitionSpec as P
  import numpy as onp

  devices = onp.array(jax.devices()[:4])
  mesh = Mesh(devices, ('data',))
  b, h, d, max_len = 16, 6, 64, 256
  rng = jax.random.PRNGKey(4)
  index = 100
  mask = (jnp.arange(max_len) <= index).astype(jnp.float32)
  query = jax.random.normal(rng, (b, h, d))
  cache_k = jax.random.normal(jax.random.fold_in(rng, 1),
                              (b, h, d, max_len)) * mask
  cache_v = jax.random.normal(jax.random.fold_in(rng, 2),
                              (b, h, d, max_len)) * mask

  def local_attn(q, ck, cv):
    return decode_attention.decode_attention(
        q, ck, cv, jnp.array(index), batch_block=4, interpret=True)

  sharded = jax.shard_map(
      local_attn, mesh=mesh,
      in_specs=(P('data'), P('data'), P('data')),
      out_specs=P('data'), check_vma=False)
  out = sharded(query, cache_k, cache_v)
  ref = _reference(query, cache_k, cache_v, jnp.array(index))
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                             atol=1e-5, rtol=1e-5)
