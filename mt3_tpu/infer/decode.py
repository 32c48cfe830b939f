"""Batched KV-cached autoregressive decoding.

Replaces the t5x.decoding dependency (reference models.py:127 uses
t5x.decoding.beam_search; the colab path uses greedy/temperature sampling
inside predict_batch_with_aux).  The whole decode runs in a single
jax.lax.while_loop with per-batch EOS early exit: once every sequence in
the batch has emitted EOS the loop stops, so wall-clock tracks the longest
actual event stream in the batch instead of the 1024-token ceiling.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mt3_tpu.codec.vocabulary import EOS_ID, PAD_ID
from mt3_tpu.core.config import ModelConfig
from mt3_tpu.models import t5

Array = jax.Array


@functools.partial(
    jax.jit,
    static_argnames=('config', 'max_decode_len', 'temperature',
                     'forbid_eos'))
def decode_tokens(params, config: ModelConfig, encoded: Array,
                  max_decode_len: int,
                  temperature: float = 0.0,
                  rng: Optional[Array] = None,
                  forbid_eos: bool = False) -> Tuple[Array, Array]:
  """Decode token sequences for a batch of encoded segments.

  Args:
    params: model parameters.
    config: model config.
    encoded: [b, enc_len, emb] encoder outputs.
    max_decode_len: maximum tokens to emit per sequence.
    temperature: 0.0 for greedy argmax, >0 for temperature sampling.
    rng: PRNGKey, required when temperature > 0.

  Returns:
    (tokens [b, max_decode_len] int32 with PAD after EOS,
     lengths [b] int32 — emitted tokens per sequence including EOS).
  """
  b = encoded.shape[0]
  state = t5.init_decode_state(params, config, encoded, max_decode_len)
  if rng is None:
    rng = jax.random.PRNGKey(0)

  init = (
      jnp.zeros((b,), jnp.int32),                    # previous token (BOS=0)
      state,
      jnp.full((b, max_decode_len), PAD_ID, jnp.int32),  # output buffer
      jnp.zeros((b,), jnp.bool_),                    # done flags
      jnp.array(0, jnp.int32),                       # step
      rng,
  )

  def cond(carry):
    _, _, _, done, step, _ = carry
    return jnp.logical_and(step < max_decode_len, ~jnp.all(done))

  def body(carry):
    token, state, buf, done, step, rng = carry
    logits, state = t5.decode_step(params, config, token, state)
    # Never emit PAD; it is reserved for positions after EOS.
    logits = logits.at[:, PAD_ID].set(-1e10)
    if forbid_eos:
      # Benchmark mode: force full-length decode (worst-case throughput).
      logits = logits.at[:, EOS_ID].set(-1e10)
    if temperature > 0.0:
      rng, sample_rng = jax.random.split(rng)
      next_token = jax.random.categorical(
          sample_rng, logits / temperature, axis=-1).astype(jnp.int32)
    else:
      next_token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    next_token = jnp.where(done, PAD_ID, next_token)
    buf = jax.lax.dynamic_update_slice_in_dim(
        buf, next_token[:, None], step, axis=1)
    done = jnp.logical_or(done, next_token == EOS_ID)
    return (next_token, state, buf, done, step + 1, rng)

  _, _, buf, done, steps, _ = jax.lax.while_loop(cond, body, init)
  del done, steps
  # Length = index of EOS + 1, or max_decode_len if no EOS.
  has_eos = jnp.any(buf == EOS_ID, axis=-1)
  eos_pos = jnp.argmax(buf == EOS_ID, axis=-1)
  lengths = jnp.where(has_eos, eos_pos + 1, max_decode_len)
  return buf, lengths


def encode_and_decode(params, config: ModelConfig, encoder_input: Array,
                      max_decode_len: int, temperature: float = 0.0,
                      rng: Optional[Array] = None) -> Tuple[Array, Array]:
  """Convenience: encoder forward + token decode in one call."""
  encoded = t5.encode(params, config, encoder_input)
  return decode_tokens(params, config, encoded, max_decode_len,
                       temperature=temperature, rng=rng)
