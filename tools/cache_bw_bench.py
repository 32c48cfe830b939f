"""Isolated HBM-bandwidth microbenchmark for the decode cache reads.

VERDICT round 2 (weak #1): the decode roofline investigation measured
~316 GB/s effective cache-read bandwidth (of ~819 GB/s v5e peak) and
attributed it to the M=1 einsum access pattern without isolating it.
This tool measures, at the exact production cache shapes
([L=8, b, h=6, d=64, len] per PERF.md), what a bare cache read achieves
under each candidate access pattern:

  sum        pure reduction over the cache — the layout's read ceiling
  einsum     per-layer M=1 attention einsums (what decode actually does)
  batched    one layer-batched einsum reading the whole cache at once
  layout_d   cache stored [..., len, d] (d minor) instead of [..., d, len]
  wide       batch 4x wider, len 4x shorter (same bytes)

Toolchain note: int4 arrays cannot cross the jit boundary here (arg
sharding recurses on the packed S4 layout), so each variant builds its
cache *inside* one jitted program — mirroring production decode, where
the cache lives entirely inside the while loop program.  The cache-build
cost is removed by differencing two scan lengths:
  time(iters=N2) - time(iters=N1) over (N2 - N1) iterations.
Timing fetches results to host (np.asarray) per CLAUDE.md relay guidance.

Usage: python tools/cache_bw_bench.py [--dtype int4] [--iters 16]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

L, H, D = 8, 6, 64


def build_cache(shape, dtype, seed):
  x = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
  if dtype in (jnp.int8, jnp.int4):
    return jnp.clip(jnp.round(x * 3.0), -7, 7).astype(dtype)
  return x.astype(dtype)


def cache_bytes(shape, dtype):
  n = int(np.prod(shape))
  return n // 2 if dtype == jnp.int4 else n * jnp.dtype(dtype).itemsize


def timed(fn, iters_lo, iters_hi):
  """Seconds per scan iteration, cache-build cost differenced away."""
  lo = jax.jit(functools.partial(fn, iters=iters_lo), static_argnames=())
  hi = jax.jit(functools.partial(fn, iters=iters_hi), static_argnames=())
  times = {}
  for label, f in (('lo', lo), ('hi', hi)):
    np.asarray(f())  # compile + warm
    t0 = time.time()
    np.asarray(f())
    times[label] = time.time() - t0
  return (times['hi'] - times['lo']) / (iters_hi - iters_lo)


def report(label, sec_per_iter, bytes_per_iter):
  gbps = bytes_per_iter / sec_per_iter / 1e9
  print(f'{label:44s} {sec_per_iter * 1e3:8.2f} ms/iter  {gbps:7.1f} GB/s')


def attention_scan(shape, dtype, d_minor, iters):
  """Per-layer M=1 attention over a device-built cache (decode pattern)."""
  k = build_cache(shape, dtype, 0)
  v = build_cache(shape, dtype, 1)
  b = shape[1]
  q0 = jax.random.normal(jax.random.PRNGKey(2), (b, H, D), jnp.bfloat16)

  def body(q, _):
    outs = q
    for layer in range(L):
      if d_minor:
        logits = jnp.einsum('bhd,bhld->bhl', outs,
                            k[layer].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
        w = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
        outs = jnp.einsum('bhl,bhld->bhd', w,
                          v[layer].astype(jnp.bfloat16))
      else:
        logits = jnp.einsum('bhd,bhdl->bhl', outs,
                            k[layer].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
        w = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
        outs = jnp.einsum('bhl,bhdl->bhd', w,
                          v[layer].astype(jnp.bfloat16))
    return outs, ()

  return jax.lax.scan(body, q0, None, length=iters)[0]


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--dtype', default='int4',
                      choices=['int4', 'int8', 'bfloat16'])
  parser.add_argument('--batch', type=int, default=512)
  parser.add_argument('--len', type=int, dest='length', default=1024)
  parser.add_argument('--iters', type=int, default=16)
  parser.add_argument('--patterns', default='all',
                      help="comma list of patterns to run (sum, scaled, "
                           "einsum, batched, layout_d, wide, masked, "
                           "written, interleaved) or 'all'")
  args = parser.parse_args()
  _sel = (None if args.patterns == 'all'
          else set(args.patterns.split(',')))

  def want(key):
    return _sel is None or key in _sel

  dtype = {'int4': jnp.int4, 'int8': jnp.int8,
           'bfloat16': jnp.bfloat16}[args.dtype]
  b, length = args.batch, args.length
  i_lo, i_hi = args.iters, args.iters * 3
  shape = (L, b, H, D, length)
  shape_d = (L, b, H, length, D)
  kv_bytes = 2 * cache_bytes(shape, dtype)

  print(f'# cache [L={L}, b={b}, h={H}, d={D}, len={length}] '
        f'{args.dtype}, K+V = {kv_bytes / 1e9:.2f} GB/iter, '
        f'iters {i_lo}/{i_hi} differenced')

  # 1. Pure reduction: the layout's absolute read ceiling.  The reduce
  # is multiplied by the carry so XLA cannot hoist it out of the scan.
  def sum_fn(iters):
    k = build_cache(shape, dtype, 0)
    v = build_cache(shape, dtype, 1)

    def body(carry, _):
      s = (jnp.sum(k.astype(jnp.bfloat16)) + jnp.sum(v.astype(jnp.bfloat16)))
      return s * (jnp.bfloat16(1.0) + carry * jnp.bfloat16(1e-12)), ()

    return jax.lax.scan(body, jnp.bfloat16(0), None, length=iters)[0]

  if want('sum'):
    report('sum: reduce K+V', timed(sum_fn, i_lo, i_hi), kv_bytes)

  # 1b. Production dequant pattern: per-(b,h,position) fp32 scales folded
  # into the logits and the V weights (infer/decode.py quantized path).
  def scaled_fn(iters):
    k = build_cache(shape, dtype, 0)
    v = build_cache(shape, dtype, 1)
    ks = jnp.abs(build_cache((L, b, H, length), jnp.float32, 2)) + 0.5
    vs = jnp.abs(build_cache((L, b, H, length), jnp.float32, 3)) + 0.5
    q0 = jax.random.normal(jax.random.PRNGKey(2), (b, H, D), jnp.bfloat16)

    def body(q, _):
      outs = q
      for layer in range(L):
        logits = jnp.einsum('bhd,bhdl->bhl', outs,
                            k[layer].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
        logits = logits * ks[layer]
        w = jax.nn.softmax(logits, axis=-1)
        w = (w * vs[layer]).astype(jnp.bfloat16)
        outs = jnp.einsum('bhl,bhdl->bhd', w, v[layer].astype(jnp.bfloat16))
      return outs, ()

    return jax.lax.scan(body, q0, None, length=iters)[0]

  scale_bytes = 2 * 4 * L * b * H * length
  if want('scaled'):
    report('scaled: einsum + fp32 scales (production)',
           timed(scaled_fn, i_lo, i_hi), kv_bytes + scale_bytes)

  # 2. What decode does: per-layer M=1 einsums, softmax, weighted V.
  if want('einsum'):
    report('einsum: per-layer M=1 attention (decode)',
           timed(functools.partial(attention_scan, shape, dtype, False),
                 i_lo, i_hi), kv_bytes)

  # 3. Layer-batched: one einsum reads the whole K at once.
  def batched_fn(iters):
    k = build_cache(shape, dtype, 0)
    v = build_cache(shape, dtype, 1)
    q0 = jax.random.normal(jax.random.PRNGKey(2), (b, H, D), jnp.bfloat16)

    def body(q, _):
      ql = jnp.broadcast_to(q, (L,) + q.shape)
      logits = jnp.einsum('Lbhd,Lbhdl->Lbhl', ql, k.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
      w = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
      out = jnp.einsum('Lbhl,Lbhdl->Lbhd', w, v.astype(jnp.bfloat16))
      return out.mean(axis=0) + q * 1e-6, ()

    return jax.lax.scan(body, q0, None, length=iters)[0]

  if want('batched'):
    report('batched: single layer-folded einsum',
           timed(batched_fn, i_lo, i_hi), kv_bytes)

  # 4. d-minor layout [L,b,h,len,d].
  if want('layout_d'):
    report('layout_d: [.., len, d] per-layer einsum',
           timed(functools.partial(attention_scan, shape_d, dtype, True),
                 i_lo, i_hi), kv_bytes)

  # 5. Same bytes, batch 4x wider / len 4x shorter.
  shape_w = (L, b * 4, H, D, length // 4)
  if want('wide'):
    report(f'wide: batch {b * 4} x len {length // 4} per-layer einsum',
           timed(functools.partial(attention_scan, shape_w, dtype, False),
                 i_lo, i_hi), 2 * cache_bytes(shape_w, dtype))

  # --- Round-4 residual attribution (VERDICT #3): each pattern adds ONE
  # production-decode ingredient to the 'scaled' baseline, so the
  # production-vs-isolated bandwidth gap can be itemized.

  # 6. + live-length mask: decode masks logits beyond the live index
  # (an iota compare + where over [b,h,len] per layer, VPU work that
  # scales with the prefix like the cache reads do).
  def masked_fn(iters):
    k = build_cache(shape, dtype, 0)
    v = build_cache(shape, dtype, 1)
    ks = jnp.abs(build_cache((L, b, H, length), jnp.float32, 2)) + 0.5
    vs = jnp.abs(build_cache((L, b, H, length), jnp.float32, 3)) + 0.5
    q0 = jax.random.normal(jax.random.PRNGKey(2), (b, H, D), jnp.bfloat16)
    positions = jnp.arange(length)

    def body(carry, i):
      q, live = carry
      mask = positions[None, None, :] < live
      outs = q
      for layer in range(L):
        logits = jnp.einsum('bhd,bhdl->bhl', outs,
                            k[layer].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
        logits = jnp.where(mask, logits * ks[layer], -1e9)
        w = jax.nn.softmax(logits, axis=-1)
        w = (w * vs[layer]).astype(jnp.bfloat16)
        outs = jnp.einsum('bhl,bhdl->bhd', w, v[layer].astype(jnp.bfloat16))
      return (outs, live + 1), ()

    live0 = jnp.array(length // 2, jnp.int32)
    return jax.lax.scan(body, (q0, live0), jnp.arange(iters))[0][0]

  if want('masked'):
    report('masked: + live-length logits mask',
           timed(masked_fn, i_lo, i_hi), kv_bytes + scale_bytes)

  # 7. + dus column write: each iteration writes one K and one V column
  # (+ scales) at the live index, like the cache update.
  def written_fn(iters):
    ks = jnp.abs(build_cache((L, b, H, length), jnp.float32, 2)) + 0.5
    vs = jnp.abs(build_cache((L, b, H, length), jnp.float32, 3)) + 0.5
    q0 = jax.random.normal(jax.random.PRNGKey(2), (b, H, D), jnp.bfloat16)
    newcol = jnp.clip(
        jnp.round(jax.random.normal(jax.random.PRNGKey(5), (b, H, D, 1),
                                    jnp.float32) * 3.0), -7, 7).astype(dtype)

    def body(carry, i):
      q, k, v = carry
      pos = i % length
      zero = jnp.zeros((), jnp.int32)
      outs = q
      for layer in range(L):
        start = (jnp.int32(layer), zero, zero, zero, pos)
        k = jax.lax.dynamic_update_slice(k, newcol[None], start)
        v = jax.lax.dynamic_update_slice(v, newcol[None], start)
        logits = jnp.einsum('bhd,bhdl->bhl', outs,
                            k[layer].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
        logits = logits * ks[layer]
        w = jax.nn.softmax(logits, axis=-1)
        w = (w * vs[layer]).astype(jnp.bfloat16)
        outs = jnp.einsum('bhl,bhdl->bhd', w, v[layer].astype(jnp.bfloat16))
      return (outs, k, v), ()

    k0 = build_cache(shape, dtype, 0)
    v0 = build_cache(shape, dtype, 1)
    return jax.lax.scan(body, (q0, k0, v0), jnp.arange(iters))[0][0]

  if want('written'):
    report('written: + per-iter dus K/V column writes',
           timed(written_fn, i_lo, i_hi), kv_bytes + scale_bytes)

  # 8. + interleaved per-step work: an MLP-sized matmul between layers
  # breaks the uninterrupted cache stream like the real decoder
  # (attention out-proj + MLP + logits between consecutive cache reads).
  def interleaved_fn(iters):
    k = build_cache(shape, dtype, 0)
    v = build_cache(shape, dtype, 1)
    ks = jnp.abs(build_cache((L, b, H, length), jnp.float32, 2)) + 0.5
    vs = jnp.abs(build_cache((L, b, H, length), jnp.float32, 3)) + 0.5
    q0 = jax.random.normal(jax.random.PRNGKey(2), (b, H, D), jnp.bfloat16)
    wi = jax.random.normal(jax.random.PRNGKey(6), (H * D, 1024),
                           jnp.bfloat16)
    wo = jax.random.normal(jax.random.PRNGKey(7), (1024, H * D),
                           jnp.bfloat16)

    def body(q, _):
      outs = q
      for layer in range(L):
        logits = jnp.einsum('bhd,bhdl->bhl', outs,
                            k[layer].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
        logits = logits * ks[layer]
        w = jax.nn.softmax(logits, axis=-1)
        w = (w * vs[layer]).astype(jnp.bfloat16)
        outs = jnp.einsum('bhl,bhdl->bhd', w, v[layer].astype(jnp.bfloat16))
        h = jax.nn.gelu(outs.reshape(b, H * D) @ wi)
        outs = (h @ wo).reshape(b, H, D)
      return outs, ()

    return jax.lax.scan(body, q0, None, length=iters)[0]

  if want('interleaved'):
    report('interleaved: + MLP matmul between layers',
           timed(interleaved_fn, i_lo, i_hi), kv_bytes + scale_bytes)


if __name__ == '__main__':
  main()
