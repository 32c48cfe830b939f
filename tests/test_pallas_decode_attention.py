"""Pallas decode-attention kernel (v3, aliased in-place) vs XLA reference.

Earlier kernel generations (v1 grid-tiled, v2 manual double-buffered DMA)
measured 3x slower than the XLA path inside the decode while_loop on this
toolchain (~3 ms intrinsic cost per pallas_call; PERF.md) and were
removed; v3 is kept as the single Pallas decode kernel — it demonstrates
input/output aliasing for in-place cache updates and remains available
via ModelConfig.decode_attention_impl='pallas_v3'.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mt3_tpu.ops.pallas import decode_attention_v3


def _reference(query, cache_k, cache_v, index):
  logits = jnp.einsum('bhd,bhdl->bhl', query, cache_k)
  max_len = cache_k.shape[-1]
  visible = (jnp.arange(max_len) <= index)[None, None, :]
  logits = jnp.where(visible, logits, -1e30)
  weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
  return jnp.einsum('bhl,bhdl->bhd', weights.astype(query.dtype), cache_v)


@pytest.mark.parametrize('index', [0, 5, 127, 128, 300, 511])
def test_v3_inplace_matches_reference(index):
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


def test_v3_under_shard_map():
  """Kernel partitions over the batch (data) axis with shard_map."""
  from jax.sharding import Mesh, PartitionSpec as P
  import numpy as onp

  devices = onp.array(jax.devices()[:4])
  mesh = Mesh(devices, ('data',))
  b, h, d, max_len = 16, 6, 64, 256
  rng = jax.random.PRNGKey(4)
  index = 100
  mask = (jnp.arange(max_len) < index).astype(jnp.float32)
  query = jax.random.normal(rng, (b, h, d))
  new_k = jax.random.normal(jax.random.fold_in(rng, 3), (b, h, d))
  new_v = jax.random.normal(jax.random.fold_in(rng, 4), (b, h, d))
  cache_k = jax.random.normal(jax.random.fold_in(rng, 1),
                              (b, h, d, max_len)) * mask
  cache_v = jax.random.normal(jax.random.fold_in(rng, 2),
                              (b, h, d, max_len)) * mask

  def local_attn(q, nk, nv, ck, cv):
    out, _, _ = decode_attention_v3.decode_attention_inplace(
        q, nk, nv, ck, cv, jnp.array(index), batch_block=4,
        interpret=True)
    return out

  sharded = jax.shard_map(
      local_attn, mesh=mesh,
      in_specs=(P('data'), P('data'), P('data'), P('data'), P('data')),
      out_specs=P('data'), check_vma=False)
  out = sharded(query, new_k, new_v, cache_k, cache_v)

  ref_ck = cache_k.at[:, :, :, index].set(new_k)
  ref_cv = cache_v.at[:, :, :, index].set(new_v)
  ref = _reference(query, ref_ck, ref_cv, jnp.array(index))
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                             atol=1e-5, rtol=1e-5)
