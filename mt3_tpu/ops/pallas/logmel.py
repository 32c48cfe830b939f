"""Fused log-mel spectrogram Pallas TPU kernel.

One kernel computes window+DFT -> magnitude -> mel -> log per frame block,
tiled over frequency blocks on the MXU with the magnitude nonlinearity
applied between the two matmuls — the frequency-domain magnitudes never
touch HBM (the jnp path materializes [frames, 1025] magnitudes).

Grid: (frame_blocks, freq_blocks), freq minor.  The output mel block is
revisited across the freq dimension and accumulated in place; the final
freq step applies the safe-log epilogue.

Numerics match ops/spectrogram.compute_logmel (float32, HIGHEST-precision
matmuls); see tests/test_pallas_logmel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mt3_tpu.core.config import SpectrogramConfig
from mt3_tpu.ops import spectrogram as spec_lib

FRAME_BLOCK = 128
FREQ_BLOCK = 256


def _round_up(x: int, m: int) -> int:
  return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=None)
def _padded_basis(config: SpectrogramConfig):
  """Windowed DFT bases and mel matrix, zero-padded to FREQ_BLOCK tiles."""
  w_cos, w_sin = spec_lib._windowed_dft_matrices(config.fft_size,
                                                 config.fft_size)
  mel = spec_lib._mel_matrix(config)
  n_freq = w_cos.shape[1]
  padded = _round_up(n_freq, FREQ_BLOCK)
  pad = padded - n_freq
  w_cos = np.pad(w_cos, [(0, 0), (0, pad)])
  w_sin = np.pad(w_sin, [(0, 0), (0, pad)])
  mel = np.pad(mel, [(0, pad), (0, 0)])
  return w_cos, w_sin, mel


def _logmel_kernel(frames_ref, w_cos_ref, w_sin_ref, mel_ref, out_ref,
                   *, n_freq_blocks: int, eps: float):
  k = pl.program_id(1)

  re = jnp.dot(frames_ref[:], w_cos_ref[:],
               preferred_element_type=jnp.float32,
               precision=jax.lax.Precision.HIGHEST)
  im = jnp.dot(frames_ref[:], w_sin_ref[:],
               preferred_element_type=jnp.float32,
               precision=jax.lax.Precision.HIGHEST)
  magnitude = jnp.sqrt(re * re + im * im)
  partial = jnp.dot(magnitude, mel_ref[:],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)

  @pl.when(k == 0)
  def _():
    out_ref[:] = partial

  @pl.when(k > 0)
  def _():
    out_ref[:] = out_ref[:] + partial

  @pl.when(k == n_freq_blocks - 1)
  def _():
    acc = out_ref[:]
    out_ref[:] = jnp.log(jnp.where(acc <= 0.0, eps, acc))


def logmel_fused(samples: jnp.ndarray, config: SpectrogramConfig,
                 eps: float = 1e-5) -> jnp.ndarray:
  """[..., n] samples -> [..., n // hop, mel_bins] log-mel (fused kernel)."""
  w_cos, w_sin, mel = _padded_basis(config)
  n_freq_pad = w_cos.shape[1]
  n_freq_blocks = n_freq_pad // FREQ_BLOCK

  frames = spec_lib.frame_signal(samples.astype(jnp.float32),
                                 config.fft_size, config.hop_width)
  batch_shape = frames.shape[:-2]
  n_frames = frames.shape[-2]
  flat = frames.reshape(-1, config.fft_size)
  total = flat.shape[0]
  padded_total = _round_up(max(total, FRAME_BLOCK), FRAME_BLOCK)
  if padded_total != total:
    flat = jnp.pad(flat, [(0, padded_total - total), (0, 0)])

  grid = (padded_total // FRAME_BLOCK, n_freq_blocks)
  out = pl.pallas_call(
      functools.partial(_logmel_kernel, n_freq_blocks=n_freq_blocks,
                        eps=eps),
      grid=grid,
      in_specs=[
          pl.BlockSpec((FRAME_BLOCK, config.fft_size),
                       lambda i, k: (i, 0), memory_space=pltpu.VMEM),
          pl.BlockSpec((config.fft_size, FREQ_BLOCK),
                       lambda i, k: (0, k), memory_space=pltpu.VMEM),
          pl.BlockSpec((config.fft_size, FREQ_BLOCK),
                       lambda i, k: (0, k), memory_space=pltpu.VMEM),
          pl.BlockSpec((FREQ_BLOCK, config.num_mel_bins),
                       lambda i, k: (k, 0), memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((FRAME_BLOCK, config.num_mel_bins),
                             lambda i, k: (i, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct(
          (padded_total, config.num_mel_bins), jnp.float32),
      cost_estimate=pl.CostEstimate(
          flops=2 * padded_total * config.fft_size * n_freq_pad * 2
          + 2 * padded_total * n_freq_pad * config.num_mel_bins,
          bytes_accessed=4 * (padded_total * config.fft_size
                              + 2 * config.fft_size * n_freq_pad
                              + n_freq_pad * config.num_mel_bins
                              + padded_total * config.num_mel_bins),
          transcendentals=2 * padded_total * n_freq_pad,
      ),
  )(flat, jnp.asarray(w_cos), jnp.asarray(w_sin), jnp.asarray(mel))

  out = out[:total]
  return out.reshape(batch_shape + (n_frames, config.num_mel_bins))
