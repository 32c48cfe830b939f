"""Beam search decoding.

Rebuild of the t5x.decoding.beam_search capability (the reference model's
default decode_fn, /root/reference/mt3/models.py:127): length-normalized
beam search with alive/finished beam bookkeeping and early termination
when no alive beam can improve on the worst finished one.

The KV cache is carried flattened as [batch*beam, ...]; beam reshuffles
gather along that axis each step.  Brevity penalty follows GNMT:
((5 + len) / 6) ** alpha with alpha = 0.6 by default.
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

NEG_INF = -1e7


def brevity_penalty(alpha: float, length: Array) -> Array:
  return jnp.power((5.0 + length.astype(jnp.float32)) / 6.0, alpha)


def _flatten_beam(x: Array) -> Array:
  return x.reshape((-1,) + x.shape[2:])


def _unflatten_beam(x: Array, batch: int, beams: int) -> Array:
  return x.reshape((batch, beams) + x.shape[1:])


def _gather_beams(x: Array, indices: Array, batch: int,
                  beams: int) -> Array:
  """Gather along the beam axis; x is [batch, old_beams, ...]."""
  batch_idx = jnp.arange(batch)[:, None]
  return x[batch_idx, indices]


@functools.partial(
    jax.jit,
    static_argnames=('config', 'max_decode_len', 'num_beams', 'alpha',
                     'forbid_eos'))
def beam_search(params, config: ModelConfig, encoded: Array,
                max_decode_len: int, num_beams: int = 4,
                alpha: float = 0.6,
                forbid_eos: bool = False) -> Tuple[Array, Array]:
  """Beam-search decode.

  Returns (tokens [batch, max_decode_len] for the best beam — PAD after
  EOS — and scores [batch]).  `forbid_eos` masks the EOS logit so no
  beam can finish: decode runs the full max_decode_len — the worst-case
  benchmark configuration (matching decode.decode_tokens forbid_eos).
  """
  batch = encoded.shape[0]

  # Replicate encodings per beam and flatten to [batch*beams, ...].
  encoded_rep = _flatten_beam(
      jnp.broadcast_to(encoded[:, None],
                       (batch, num_beams) + encoded.shape[1:]))
  state = t5.init_decode_state(params, config, encoded_rep,
                               max_decode_len)

  alive_log_probs = jnp.tile(
      jnp.array([0.0] + [NEG_INF] * (num_beams - 1)), (batch, 1))
  alive_seqs = jnp.full((batch, num_beams, max_decode_len), PAD_ID,
                        jnp.int32)
  finished_seqs = jnp.full((batch, num_beams, max_decode_len), PAD_ID,
                           jnp.int32)
  finished_scores = jnp.full((batch, num_beams), NEG_INF)
  finished_flags = jnp.zeros((batch, num_beams), jnp.bool_)

  init = (jnp.array(0, jnp.int32),
          jnp.zeros((batch * num_beams,), jnp.int32),  # previous token
          state, alive_log_probs, alive_seqs,
          finished_seqs, finished_scores, finished_flags)

  def cond(carry):
    (step, _, _, alive_log_probs, _, _, finished_scores,
     finished_flags) = carry
    # Best possible score any alive beam could still reach vs the worst
    # finished score; stop when no improvement is possible.
    max_penalty = brevity_penalty(alpha, jnp.array(max_decode_len))
    best_alive = alive_log_probs[:, 0] / max_penalty
    worst_finished = jnp.min(
        jnp.where(finished_flags, finished_scores, NEG_INF), axis=1)
    improvement_possible = jnp.any(best_alive > worst_finished)
    return jnp.logical_and(step < max_decode_len, improvement_possible)

  def body(carry):
    (step, prev_token, state, alive_log_probs, alive_seqs,
     finished_seqs, finished_scores, finished_flags) = carry

    logits, new_state = t5.decode_step(params, config, prev_token, state)
    logits = logits.at[:, PAD_ID].set(NEG_INF)
    if forbid_eos:
      logits = logits.at[:, EOS_ID].set(NEG_INF)
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32))
    vocab = log_probs.shape[-1]
    log_probs = _unflatten_beam(log_probs, batch, num_beams)
    cand = alive_log_probs[:, :, None] + log_probs  # [b, beams, vocab]

    # 2*beams candidates so EOS picks never starve the alive set.
    flat = cand.reshape(batch, num_beams * vocab)
    topk_scores, topk_idx = jax.lax.top_k(flat, 2 * num_beams)
    beam_idx = topk_idx // vocab
    token_idx = (topk_idx % vocab).astype(jnp.int32)

    seqs = _gather_beams(alive_seqs, beam_idx, batch, 2 * num_beams)
    seqs = jax.lax.dynamic_update_slice_in_dim(
        seqs, token_idx[:, :, None], step, axis=2)

    is_eos = token_idx == EOS_ID

    # Alive: the best beams among non-EOS candidates.
    alive_cand_scores = jnp.where(is_eos, NEG_INF, topk_scores)
    new_alive_scores, alive_sel = jax.lax.top_k(alive_cand_scores,
                                                num_beams)
    new_alive_seqs = _gather_beams(seqs, alive_sel, batch, num_beams)
    new_alive_tokens = _gather_beams(token_idx, alive_sel, batch,
                                     num_beams)
    alive_orig_beam = _gather_beams(beam_idx, alive_sel, batch, num_beams)

    # Finished: EOS candidates scored with brevity penalty, merged with
    # previously finished beams.
    length = step + 1
    eos_scores = jnp.where(
        is_eos, topk_scores / brevity_penalty(alpha, length), NEG_INF)
    merged_seqs = jnp.concatenate([finished_seqs, seqs], axis=1)
    merged_scores = jnp.concatenate([finished_scores, eos_scores], axis=1)
    merged_flags = jnp.concatenate(
        [finished_flags, is_eos], axis=1)
    new_finished_scores, fin_sel = jax.lax.top_k(merged_scores, num_beams)
    new_finished_seqs = _gather_beams(merged_seqs, fin_sel, batch,
                                      num_beams)
    new_finished_flags = _gather_beams(merged_flags, fin_sel, batch,
                                       num_beams)

    # Reshuffle the KV cache to follow the selected alive beams.
    flat_beam_index = (
        jnp.arange(batch)[:, None] * num_beams + alive_orig_beam
    ).reshape(-1)

    def reshuffle(x):
      # Cache leaves are [layers, batch*beams, ...]; cross K/V likewise.
      # Sub-byte (int4) gathers crashed the TPU worker on this backend
      # (round-5 beam runs, /tmp/pe_beam*.log); route the gather through
      # int8 — the cache stays int4 between steps, only the reshuffle
      # temporarily widens.
      if x.dtype == jnp.int4:
        return jnp.take(x.astype(jnp.int8), flat_beam_index,
                        axis=1).astype(jnp.int4)
      return jnp.take(x, flat_beam_index, axis=1)

    new_state = t5.DecodeState(
        cache=jax.tree_util.tree_map(reshuffle, new_state.cache),
        cross_k=new_state.cross_k,  # identical across beams
        cross_v=new_state.cross_v,
        index=new_state.index,
        cross_k_scale=new_state.cross_k_scale,
        cross_v_scale=new_state.cross_v_scale)

    return (step + 1, new_alive_tokens.reshape(-1), new_state,
            new_alive_scores, new_alive_seqs, new_finished_seqs,
            new_finished_scores, new_finished_flags)

  (_, _, _, alive_log_probs, alive_seqs, finished_seqs, finished_scores,
   finished_flags) = jax.lax.while_loop(cond, body, init)

  # If nothing finished for an example, fall back to the alive beams.
  none_finished = ~jnp.any(finished_flags, axis=1)
  alive_scores = alive_log_probs / brevity_penalty(
      alpha, jnp.array(max_decode_len))
  final_seqs = jnp.where(none_finished[:, None, None], alive_seqs,
                         finished_seqs)
  final_scores = jnp.where(none_finished[:, None], alive_scores,
                           finished_scores)
  return final_seqs[:, 0], final_scores[:, 0]
