"""Pallas TPU kernel: single-step decoder self-attention over a KV cache.

The autoregressive decode loop is HBM-bandwidth-bound on cache reads; XLA
reads the full [*, max_len] cache every step regardless of how many
positions are live.  This kernel makes reads prefix-proportional: the
grid's length dimension is clamped at the block containing the current
index — beyond-prefix grid steps re-address the same block (no DMA) and
skip compute — so per-step traffic follows the live prefix exactly,
without the bucket re-pads of the XLA path.

Softmax is computed online (flash-attention style) across length blocks
with running max / sum / accumulator scratch.  The new position's K/V are
written into the cache *before* the kernel by a cheap in-place
dynamic_update_slice (see layers.attention_decode_step), so the kernel is
read-only and has no write-ordering hazard.

Layout: cache [b, h, d, len] (lane-dense, len minor), matching
layers.KVCache.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

BATCH_BLOCK = 8
LEN_BLOCK = 256


def _decode_attn_kernel(idx_ref, q_ref, k_ref, v_ref, out_ref,
                        m_scr, l_scr, acc_scr, *, len_block: int,
                        num_len_blocks: int):
  k_id = pl.program_id(1)
  index = idx_ref[0]
  last_valid_block = index // len_block

  @pl.when(k_id == 0)
  def _():
    m_scr[:] = jnp.full_like(m_scr, NEG_INF)
    l_scr[:] = jnp.zeros_like(l_scr)
    acc_scr[:] = jnp.zeros_like(acc_scr)

  @pl.when(k_id <= last_valid_block)
  def _():
    q = q_ref[:].astype(jnp.float32)          # [B, h, d]
    k_block = k_ref[:].astype(jnp.float32)    # [B, h, d, LB]
    v_block = v_ref[:].astype(jnp.float32)    # [B, h, d, LB]

    # logits[b,h,l] = sum_d q[b,h,d] * k[b,h,d,l]
    logits = jnp.sum(q[..., None] * k_block, axis=2)
    block_start = k_id * len_block
    positions = block_start + jax.lax.broadcasted_iota(
        jnp.int32, logits.shape, dimension=2)
    logits = jnp.where(positions <= index, logits, NEG_INF)

    m_prev = m_scr[:]                          # [B, h]
    l_prev = l_scr[:]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1))
    correction = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new[..., None])     # [B, h, LB]
    l_scr[:] = l_prev * correction + jnp.sum(p, axis=-1)
    # acc[b,h,d] += sum_l p[b,h,l] * v[b,h,d,l]
    contribution = jnp.sum(p[:, :, None, :] * v_block, axis=-1)
    acc_scr[:] = acc_scr[:] * correction[..., None] + contribution
    m_scr[:] = m_new

  @pl.when(k_id == num_len_blocks - 1)
  def _():
    out_ref[:] = (acc_scr[:] / l_scr[:][..., None]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('len_block', 'batch_block',
                                             'interpret'))
def decode_attention(query: jax.Array, cache_k: jax.Array,
                     cache_v: jax.Array, index: jax.Array,
                     len_block: int = LEN_BLOCK,
                     batch_block: int = BATCH_BLOCK,
                     interpret: bool = False) -> jax.Array:
  """query [b,h,d] x cache [b,h,d,L] -> attention output [b,h,d].

  Attends to cache positions <= index (the current position's K/V must
  already be written at `index`).
  """
  b, h, d = query.shape
  max_len = cache_k.shape[-1]
  if max_len % len_block != 0:
    raise ValueError(f'cache length {max_len} not a multiple of '
                     f'{len_block}')
  if b % batch_block != 0:
    raise ValueError(f'batch {b} not a multiple of {batch_block}')
  num_len_blocks = max_len // len_block
  grid = (b // batch_block, num_len_blocks)

  def clamped(i, k, idx_ref):
    return (i, 0, 0, jnp.minimum(k, idx_ref[0] // len_block))

  kernel = functools.partial(_decode_attn_kernel, len_block=len_block,
                             num_len_blocks=num_len_blocks)
  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=1,
      grid=grid,
      in_specs=[
          pl.BlockSpec((batch_block, h, d), lambda i, k, idx: (i, 0, 0)),
          pl.BlockSpec((batch_block, h, d, len_block), clamped),
          pl.BlockSpec((batch_block, h, d, len_block), clamped),
      ],
      out_specs=pl.BlockSpec((batch_block, h, d),
                             lambda i, k, idx: (i, 0, 0)),
      scratch_shapes=[
          pltpu.VMEM((batch_block, h), jnp.float32),
          pltpu.VMEM((batch_block, h), jnp.float32),
          pltpu.VMEM((batch_block, h, d), jnp.float32),
      ],
  )
  return pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=jax.ShapeDtypeStruct((b, h, d), query.dtype),
      interpret=interpret,
  )(jnp.reshape(index.astype(jnp.int32), (1,)), query, cache_k, cache_v)
