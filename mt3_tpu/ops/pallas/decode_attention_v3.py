"""Pallas flash-decode kernel, v3: in-place cache ownership.

v2 left the cache update to an external dynamic_update_slice; inside the
decode while_loop XLA then cannot prove the (multi-GB) cache carry is
dead across the custom call and inserts full-cache copies.  v3 makes the
kernel own the cache: cache_k / cache_v are aliased inputs/outputs
(input_output_aliases), the kernel DMA-writes the new position's K/V
column into HBM itself, and attention streams only the live prefix with
double-buffered copies.  The new position's contribution enters the
online softmax analytically from the VMEM inputs, so the in-kernel HBM
write races with nothing (block reads mask positions >= index).

Layout: cache [b, h, d, len]; query/new_k/new_v [b, h, d].
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
N_BUFFERS = 2


def _kernel(idx_ref, q_ref, new_k_ref, new_v_ref, k_hbm, v_hbm,
            out_ref, k_out_hbm, v_out_hbm,
            k_buf, v_buf, k_new_buf, v_new_buf, sem, write_sem,
            *, len_block: int):
  index = idx_ref[0]
  # Blocks of strictly-previous positions; position `index` is added
  # analytically from the VMEM inputs.
  num_blocks = (index + len_block - 1) // len_block
  i = pl.program_id(0)
  batch_block = q_ref.shape[0]

  # The new K/V column cannot be DMA'd alone (HBM tiles are 128 lanes
  # wide), so the block containing `index` is read-modified-written:
  # fetch it into the staging buffers now, insert the column, and write
  # the whole (tile-aligned) block back at the end of the kernel.
  write_block = index // len_block
  k_rmw_read = pltpu.make_async_copy(
      k_hbm.at[pl.ds(i * batch_block, batch_block), :, :,
               pl.ds(write_block * len_block, len_block)],
      k_new_buf, write_sem.at[0])
  v_rmw_read = pltpu.make_async_copy(
      v_hbm.at[pl.ds(i * batch_block, batch_block), :, :,
               pl.ds(write_block * len_block, len_block)],
      v_new_buf, write_sem.at[1])
  k_rmw_read.start()
  v_rmw_read.start()

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

  @pl.when(num_blocks > 0)
  def _():
    k_dma(0, 0).start()
    v_dma(0, 0).start()

  q = q_ref[:].astype(jnp.float32)
  h, d = q_ref.shape[1], q_ref.shape[2]

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

    k_block = k_buf[slot].astype(jnp.float32)
    v_block = v_buf[slot].astype(jnp.float32)

    logits = jnp.sum(q[..., None] * k_block, axis=2)
    positions = block * len_block + jax.lax.broadcasted_iota(
        jnp.int32, logits.shape, dimension=2)
    logits = jnp.where(positions < index, logits, NEG_INF)

    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1))
    correction = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new[..., None])
    l_new = l_prev * correction + jnp.sum(p, axis=-1)
    acc = (acc * correction[..., None]
           + jnp.sum(p[:, :, None, :] * v_block, axis=-1))
    return m_new, l_new, acc

  init = (jnp.full((batch_block, h), NEG_INF, jnp.float32),
          jnp.zeros((batch_block, h), jnp.float32),
          jnp.zeros((batch_block, h, d), jnp.float32))
  m, l, acc = jax.lax.fori_loop(0, num_blocks, body, init)

  # Analytic contribution of position `index` (the new K/V).
  new_k = new_k_ref[:].astype(jnp.float32)
  new_v = new_v_ref[:].astype(jnp.float32)
  logit_new = jnp.sum(q * new_k, axis=-1)           # [B, h]
  m_final = jnp.maximum(m, logit_new)
  correction = jnp.exp(m - m_final)
  p_new = jnp.exp(logit_new - m_final)
  l_final = l * correction + p_new
  acc = acc * correction[..., None] + p_new[..., None] * new_v

  out_ref[:] = (acc / l_final[..., None]).astype(out_ref.dtype)

  # Complete the read-modify-write of the block containing `index`.
  k_rmw_read.wait()
  v_rmw_read.wait()
  offset = index - write_block * len_block
  lane = jax.lax.broadcasted_iota(jnp.int32, k_new_buf.shape,
                                  dimension=3)
  # Insert the column in float32: Mosaic only supports non-trivial
  # minor-dim broadcasts for 32-bit types.
  def insert_column(buf, new_col):
    col = jax.lax.broadcast_in_dim(
        new_col.astype(jnp.float32), buf.shape, (0, 1, 2))
    return jnp.where(lane == offset, col,
                     buf.astype(jnp.float32)).astype(buf.dtype)

  k_new_buf[:] = insert_column(k_new_buf[:], new_k_ref[:])
  v_new_buf[:] = insert_column(v_new_buf[:], new_v_ref[:])
  k_rmw_write = pltpu.make_async_copy(
      k_new_buf,
      k_out_hbm.at[pl.ds(i * batch_block, batch_block), :, :,
                   pl.ds(write_block * len_block, len_block)],
      write_sem.at[0])
  v_rmw_write = pltpu.make_async_copy(
      v_new_buf,
      v_out_hbm.at[pl.ds(i * batch_block, batch_block), :, :,
                   pl.ds(write_block * len_block, len_block)],
      write_sem.at[1])
  k_rmw_write.start()
  v_rmw_write.start()
  k_rmw_write.wait()
  v_rmw_write.wait()


@functools.partial(jax.jit, static_argnames=('len_block', 'batch_block',
                                             'interpret'))
def decode_attention_inplace(query: jax.Array, new_k: jax.Array,
                             new_v: jax.Array, cache_k: jax.Array,
                             cache_v: jax.Array, index: jax.Array,
                             len_block: int = LEN_BLOCK,
                             batch_block: int = BATCH_BLOCK,
                             interpret: bool = False):
  """Fused cache write + attention.

  Returns (out [b,h,d], new_cache_k, new_cache_v) where the caches are
  updated in place (aliased buffers) with new_k/new_v at `index`.
  """
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
          pl.BlockSpec((batch_block, h, d), lambda i, idx: (i, 0, 0)),
          pl.BlockSpec((batch_block, h, d), lambda i, idx: (i, 0, 0)),
          pl.BlockSpec(memory_space=pltpu.ANY),
          pl.BlockSpec(memory_space=pltpu.ANY),
      ],
      out_specs=(
          pl.BlockSpec((batch_block, h, d), lambda i, idx: (i, 0, 0)),
          pl.BlockSpec(memory_space=pltpu.ANY),
          pl.BlockSpec(memory_space=pltpu.ANY),
      ),
      scratch_shapes=[
          pltpu.VMEM((N_BUFFERS, batch_block, h, d, len_block),
                     cache_k.dtype),
          pltpu.VMEM((N_BUFFERS, batch_block, h, d, len_block),
                     cache_v.dtype),
          pltpu.VMEM((batch_block, h, d, len_block), cache_k.dtype),
          pltpu.VMEM((batch_block, h, d, len_block), cache_v.dtype),
          pltpu.SemaphoreType.DMA((N_BUFFERS, 2)),
          pltpu.SemaphoreType.DMA((2,)),
      ],
  )
  out, k_new, v_new = pl.pallas_call(
      functools.partial(_kernel, len_block=len_block),
      grid_spec=grid_spec,
      out_shape=(
          jax.ShapeDtypeStruct((b, h, d), query.dtype),
          jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
          jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
      ),
      # args: (index, query, new_k, new_v, cache_k, cache_v); alias the
      # caches to outputs 1 and 2 (donated, updated in place).
      input_output_aliases={4: 1, 5: 2},
      compiler_params=pltpu.CompilerParams(has_side_effects=True),
      interpret=interpret,
  )(jnp.reshape(index.astype(jnp.int32), (1,)), query, new_k, new_v,
    cache_k, cache_v)
  return out, k_new, v_new
