"""Pallas flash-decode kernel, v2: manual double-buffered HBM streaming.

v1 (decode_attention.py) tiles the cache over a (batch, length) grid with
a clamped index map; measured on v5e its per-grid-step overhead dominates
(tiny blocks, many grid steps).  v2 collapses the grid to batch blocks
only: the cache stays in HBM (memory_space=ANY) and the kernel streams
just the live prefix with explicitly double-buffered async copies inside
a dynamic-trip-count loop, so both DMA volume *and* loop iterations scale
with the current decode index.

Layout: cache [b, h, d, len] bf16/f32; query [b, h, d].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

BATCH_BLOCK = 16
LEN_BLOCK = 256
N_BUFFERS = 2


def _kernel(idx_ref, q_ref, k_hbm, v_hbm, out_ref, k_buf, v_buf, sem,
            *, len_block: int):
  """One program handles one batch block; streams prefix blocks."""
  index = idx_ref[0]
  num_blocks = index // len_block + 1
  i = pl.program_id(0)
  batch_block = q_ref.shape[0]

  def k_dma(slot, block):
    return pltpu.make_async_copy(
        k_hbm.at[pl.ds(i * batch_block, batch_block), :, :,
                 pl.ds(block * len_block, len_block)],
        k_buf.at[slot], sem.at[slot, 0])

  def v_dma(slot, block):
    return pltpu.make_async_copy(
        v_hbm.at[pl.ds(i * batch_block, batch_block), :, :,
                 pl.ds(block * len_block, len_block)],
        v_buf.at[slot], sem.at[slot, 1])

  # Warm up: first block in flight.
  k_dma(0, 0).start()
  v_dma(0, 0).start()

  q = q_ref[:].astype(jnp.float32)

  def body(block, carry):
    m_prev, l_prev, acc = carry
    slot = jax.lax.rem(block, N_BUFFERS)
    next_slot = jax.lax.rem(block + 1, N_BUFFERS)

    @pl.when(block + 1 < num_blocks)
    def _():
      k_dma(next_slot, block + 1).start()
      v_dma(next_slot, block + 1).start()

    k_dma(slot, block).wait()
    v_dma(slot, block).wait()

    k_block = k_buf[slot].astype(jnp.float32)   # [B, h, d, LB]
    v_block = v_buf[slot].astype(jnp.float32)

    logits = jnp.sum(q[..., None] * k_block, axis=2)   # [B, h, LB]
    positions = block * len_block + jax.lax.broadcasted_iota(
        jnp.int32, logits.shape, dimension=2)
    logits = jnp.where(positions <= index, logits, NEG_INF)

    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1))
    correction = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new[..., None])
    l_new = l_prev * correction + jnp.sum(p, axis=-1)
    acc = (acc * correction[..., None]
           + jnp.sum(p[:, :, None, :] * v_block, axis=-1))
    return m_new, l_new, acc

  h, d = q_ref.shape[1], q_ref.shape[2]
  init = (jnp.full((batch_block, h), NEG_INF, jnp.float32),
          jnp.zeros((batch_block, h), jnp.float32),
          jnp.zeros((batch_block, h, d), jnp.float32))
  _, l_final, acc = jax.lax.fori_loop(0, num_blocks, body, init)
  out_ref[:] = (acc / l_final[..., None]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('len_block', 'batch_block',
                                             'interpret'))
def decode_attention(query: jax.Array, cache_k: jax.Array,
                     cache_v: jax.Array, index: jax.Array,
                     len_block: int = LEN_BLOCK,
                     batch_block: int = BATCH_BLOCK,
                     interpret: bool = False) -> jax.Array:
  """query [b,h,d] x cache [b,h,d,L] -> [b,h,d]; positions <= index."""
  b, h, d = query.shape
  max_len = cache_k.shape[-1]
  len_block = min(len_block, max_len)
  if max_len % len_block != 0:
    raise ValueError(f'cache length {max_len} % {len_block} != 0')
  batch_block = min(batch_block, b)
  if b % batch_block != 0:
    raise ValueError(f'batch {b} % {batch_block} != 0')

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=1,
      grid=(b // batch_block,),
      in_specs=[
          pl.BlockSpec((batch_block, h, d), lambda i, idx: (i, 0, 0)),
          pl.BlockSpec(memory_space=pltpu.ANY),
          pl.BlockSpec(memory_space=pltpu.ANY),
      ],
      out_specs=pl.BlockSpec((batch_block, h, d),
                             lambda i, idx: (i, 0, 0)),
      scratch_shapes=[
          pltpu.VMEM((N_BUFFERS, batch_block, h, d, len_block),
                     cache_k.dtype),
          pltpu.VMEM((N_BUFFERS, batch_block, h, d, len_block),
                     cache_v.dtype),
          pltpu.SemaphoreType.DMA((N_BUFFERS, 2)),
      ],
  )
  return pl.pallas_call(
      functools.partial(_kernel, len_block=len_block),
      grid_spec=grid_spec,
      out_shape=jax.ShapeDtypeStruct((b, h, d), query.dtype),
      interpret=interpret,
  )(jnp.reshape(index.astype(jnp.int32), (1,)), query, cache_k, cache_v)
