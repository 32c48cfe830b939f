"""Beam-search correctness oracles (VERDICT r2 missing #2 / weak #4).

Beam search is the reference model's default decode fn
(/root/reference/mt3/models.py:127 -> t5x.decoding.beam_search).  These
tests establish it returns the *correct* top-scoring sequence, not just
plausible ones:

  * A controlled Markov "model" (transition logit table injected through
    `params`, with t5.decode_step/init_decode_state monkeypatched) makes
    exact brute-force enumeration feasible.  With num_beams >= the number
    of distinct prefixes at every depth, beam search IS exhaustive, so
    any scoring / beam-reshuffle / brevity-penalty bug breaks equality
    with the oracle.
  * Edge cases: every beam finishes at step one; nothing ever finishes
    (alive fallback scoring).
  * The real tiny T5 model: the returned score must equal the
    teacher-forced rescore of the returned tokens (self-consistency),
    and beam-4 must match brute force over all short sequences.
"""

import dataclasses
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mt3_tpu.core.config import ModelConfig
from mt3_tpu.infer import beam_search as bs
from mt3_tpu.models import t5

PAD, EOS = 0, 1


# ---------------------------------------------------------------------------
# Markov fake model
# ---------------------------------------------------------------------------
@pytest.fixture
def markov_model(monkeypatch):
  """Patch t5 decode hooks with a Markov chain driven by params['T'].

  params['T'] is a [vocab, vocab] logit table: logits for the next token
  given the previous one.  The fake state keeps a dummy per-beam cache
  leaf so the beam reshuffle path still executes, plus a step index that
  selects T (step 0) vs T2 (later steps) when params['T2'] is present —
  enough structure to make greedy-vs-beam diverge.
  """

  def fake_init(params, config, encoded, max_decode_len):
    b = encoded.shape[0]
    return t5.DecodeState(
        cache={'beam_tag': jnp.arange(b, dtype=jnp.float32)[None, :]},
        cross_k=jnp.zeros((1,)), cross_v=jnp.zeros((1,)),
        index=jnp.zeros((), jnp.int32))

  def fake_step(params, config, token, state):
    table = params['T']
    if 'T2' in params:
      table = jnp.where(state.index == 0, params['T'], params['T2'])
    logits = table[token]
    return logits, dataclasses.replace(state, index=state.index + 1)

  monkeypatch.setattr(t5, 'init_decode_state', fake_init)
  monkeypatch.setattr(t5, 'decode_step', fake_step)
  return fake_init, fake_step


def markov_config(vocab: int) -> ModelConfig:
  return ModelConfig(vocab_size=vocab, emb_dim=8, num_heads=2,
                     num_encoder_layers=1, num_decoder_layers=1,
                     head_dim=4, mlp_dim=8, dropout_rate=0.0,
                     input_depth=4, max_positions=16)


def brute_force_markov(tables, vocab, max_len, alpha):
  """Exhaustive oracle over the Markov chain.

  tables: list of per-step [vocab, vocab] numpy logit tables (last one
  repeats).  Returns (best_tokens padded to max_len, best_score) over
  all EOS-terminated sequences, and the best alive (unterminated,
  full-length) sequence/score normalized at max length.
  """
  log_probs = []
  for t in tables:
    t = np.asarray(t, np.float64).copy()
    t[:, PAD] = bs.NEG_INF  # beam_search forbids PAD
    log_probs.append(t - np.logaddexp.reduce(t, axis=1, keepdims=True))

  def step_lp(step):
    return log_probs[min(step, len(log_probs) - 1)]

  def bp(length):
    return ((5.0 + length) / 6.0) ** alpha

  best_fin, best_fin_seq = -np.inf, None
  best_alive, best_alive_seq = -np.inf, None
  tokens = [t for t in range(vocab) if t != PAD]
  nonterm = [t for t in tokens if t != EOS]

  def walk(prefix, score, prev):
    nonlocal best_fin, best_fin_seq, best_alive, best_alive_seq
    step = len(prefix)
    if step == max_len:
      if score / bp(max_len) > best_alive:
        best_alive, best_alive_seq = score / bp(max_len), list(prefix)
      return
    lp = step_lp(step)[prev]
    # EOS terminates
    fin = score + lp[EOS]
    if fin / bp(step + 1) > best_fin:
      best_fin = fin / bp(step + 1)
      best_fin_seq = list(prefix) + [EOS] + [PAD] * (max_len - step - 1)
    for tok in nonterm:
      walk(prefix + [tok], score + lp[tok], tok)

  walk([], 0.0, PAD)  # BOS token is PAD=0
  if best_alive_seq is None:
    best_alive_seq = []
  return (np.array(best_fin_seq), best_fin,
          np.array(best_alive_seq), best_alive)


def test_exhaustive_beam_matches_brute_force(markov_model):
  """num_beams >= prefixes at every depth => beam search must return the
  global argmax; checks score math + reshuffle + brevity end to end."""
  vocab, max_len, alpha = 5, 4, 0.6
  rng = np.random.RandomState(42)
  table = rng.randn(vocab, vocab).astype(np.float32) * 2.0
  config = markov_config(vocab)
  encoded = jnp.zeros((2, 3, 4))  # batch 2 shares the same table

  # prefixes per depth: 3 non-EOS tokens -> 3^3 = 27 at depth 3; 32 beams
  # (64 candidates retained) is exhaustive.
  tokens, scores = bs.beam_search({'T': jnp.asarray(table)}, config,
                                  encoded, max_decode_len=max_len,
                                  num_beams=32, alpha=alpha)
  want_seq, want_score, _, _ = brute_force_markov(
      [table], vocab, max_len, alpha)

  for b in range(2):
    np.testing.assert_array_equal(np.asarray(tokens[b]), want_seq)
    assert abs(float(scores[b]) - want_score) < 1e-3


def test_beam4_beats_greedy_on_trap(markov_model):
  """A 'trap' chain where the greedy first token leads to a low-score
  continuation; beam-4 must recover the true argmax (depth-2 trade-off),
  which greedy provably misses."""
  vocab, max_len, alpha = 5, 4, 0.6
  # Step-0 table: token 2 slightly better than token 3 (greedy takes 2).
  t1 = np.full((vocab, vocab), -8.0, np.float32)
  t1[PAD, 2], t1[PAD, 3] = 2.0, 1.8
  # Later steps: after 2 every continuation is uniform (costly in log
  # prob); after 3, EOS is nearly certain -> the argmax starts with 3.
  t2 = np.zeros((vocab, vocab), np.float32)
  t2[3, :] = -6.0
  t2[3, EOS] = 6.0
  config = markov_config(vocab)
  encoded = jnp.zeros((1, 3, 4))

  params = {'T': jnp.asarray(t1), 'T2': jnp.asarray(t2)}
  tokens4, score4 = bs.beam_search(params, config, encoded,
                                   max_decode_len=max_len, num_beams=4,
                                   alpha=alpha)
  want_seq, want_score, _, _ = brute_force_markov(
      [t1, t2], vocab, max_len, alpha)
  assert want_seq[0] == 3, 'trap construction broken: argmax must start 3'
  np.testing.assert_array_equal(np.asarray(tokens4[0]), want_seq)
  assert abs(float(score4[0]) - want_score) < 1e-3


def test_all_beams_finish_at_step_one(markov_model):
  """EOS dominates every state: result is [EOS, PAD...] scored at len 1,
  and the early-termination condition must not corrupt it."""
  vocab, max_len, alpha = 5, 6, 0.6
  table = np.full((vocab, vocab), -10.0, np.float32)
  table[:, EOS] = 10.0
  config = markov_config(vocab)
  encoded = jnp.zeros((1, 3, 4))

  tokens, scores = bs.beam_search({'T': jnp.asarray(table)}, config,
                                  encoded, max_decode_len=max_len,
                                  num_beams=4, alpha=alpha)
  want_seq, want_score, _, _ = brute_force_markov(
      [table], vocab, max_len, alpha)
  assert want_seq[0] == EOS
  np.testing.assert_array_equal(np.asarray(tokens[0]), want_seq)
  assert abs(float(scores[0]) - want_score) < 1e-3


def test_nothing_finishes_alive_fallback(markov_model):
  """EOS is impossible: the result must be the best full-length alive
  sequence normalized by the max-length brevity penalty."""
  vocab, max_len, alpha = 5, 3, 0.6
  rng = np.random.RandomState(7)
  table = rng.randn(vocab, vocab).astype(np.float32)
  table[:, EOS] = bs.NEG_INF  # never finish
  config = markov_config(vocab)
  encoded = jnp.zeros((1, 3, 4))

  # num_beams=3 is exhaustive here (3 usable tokens per step) without
  # starving the alive pool: with more beams than real continuations the
  # NEG_INF-masked EOS candidates collide with NEG_INF-seeded junk beams
  # (same pseudo-infinity scale, a t5x-inherited property).
  tokens, scores = bs.beam_search({'T': jnp.asarray(table)}, config,
                                  encoded, max_decode_len=max_len,
                                  num_beams=3, alpha=alpha)
  _, _, want_alive_seq, want_alive_score = brute_force_markov(
      [table], vocab, max_len, alpha)
  np.testing.assert_array_equal(np.asarray(tokens[0]), want_alive_seq)
  assert abs(float(scores[0]) - want_alive_score) < 1e-3


# ---------------------------------------------------------------------------
# Real-model oracle
# ---------------------------------------------------------------------------
def _score_sequences(params, config, encoded, seqs, alpha):
  """Teacher-forced log prob of each candidate + GNMT brevity penalty.

  seqs: [n, len] token arrays, EOS-terminated (PAD after EOS) or
  full-length alive sequences.
  """
  seqs = np.asarray(seqs, np.int32)
  n, max_len = seqs.shape
  dec_inputs = np.concatenate(
      [np.zeros((n, 1), np.int32), seqs[:, :-1]], axis=1)
  enc = jnp.broadcast_to(encoded, (n,) + encoded.shape[1:])
  logits = t5.forward(params, config, enc, jnp.asarray(dec_inputs),
                      jnp.asarray(seqs))
  lp = np.array(jax.nn.log_softmax(np.asarray(logits, np.float32),
                                   axis=-1))
  lp[:, :, PAD] = bs.NEG_INF  # beam forbids PAD
  lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))  # renormalize
  scores = []
  for i in range(n):
    total, length = 0.0, max_len
    for j in range(max_len):
      tok = seqs[i, j]
      total += lp[i, j, tok]
      if tok == EOS:
        length = j + 1
        break
    scores.append(total / ((5.0 + length) / 6.0) ** alpha)
  return np.array(scores)


def test_real_model_beam_matches_brute_force():
  """Tiny real T5: beam-4 vs brute force over every sequence of length
  <= 3 from a 5-token vocab; also checks score self-consistency."""
  vocab, max_len, alpha = 5, 3, 0.6
  config = ModelConfig(vocab_size=vocab, emb_dim=16, num_heads=2,
                       num_encoder_layers=1, num_decoder_layers=1,
                       head_dim=8, mlp_dim=16, dropout_rate=0.0,
                       input_depth=8, max_positions=8)
  params, _ = t5.init_params(jax.random.PRNGKey(3), config)
  encoded_input = jnp.asarray(
      np.random.RandomState(0).randn(1, 4, 8).astype(np.float32))
  encoded = t5.encode(params, config, encoded_input)

  tokens, score = bs.beam_search(params, config, encoded,
                                 max_decode_len=max_len, num_beams=4,
                                 alpha=alpha)

  # Brute force: all EOS-terminated seqs + all alive full-length seqs.
  nonterm = [2, 3, 4]
  candidates = []
  for length in range(1, max_len + 1):
    for prefix in itertools.product(nonterm, repeat=length - 1):
      candidates.append(list(prefix) + [EOS]
                        + [PAD] * (max_len - length))
  finished_scores = _score_sequences(params, config, encoded_input,
                                     candidates, alpha)
  best = int(np.argmax(finished_scores))

  # Self-consistency: the returned score must equal the rescore of the
  # returned tokens.
  returned = _score_sequences(params, config, encoded_input,
                              [np.asarray(tokens[0])], alpha)[0]
  assert abs(float(score[0]) - returned) < 1e-2, (
      f'beam score {float(score[0])} != teacher-forced rescore {returned}')

  assert float(score[0]) >= finished_scores[best] - 1e-3, (
      'beam-4 returned a worse sequence than brute force: '
      f'{float(score[0])} < {finished_scores[best]} '
      f'({candidates[best]} vs {np.asarray(tokens[0])})')
  np.testing.assert_array_equal(np.asarray(tokens[0]), candidates[best])


def test_forbid_eos_runs_full_length():
  """forbid_eos (the benchmark worst case) must emit no EOS and fill
  every position — matching decode.decode_tokens forbid_eos."""
  vocab, max_len = 5, 4
  config = ModelConfig(vocab_size=vocab, emb_dim=16, num_heads=2,
                       num_encoder_layers=1, num_decoder_layers=1,
                       head_dim=8, mlp_dim=16, dropout_rate=0.0,
                       input_depth=8, max_positions=8)
  params, _ = t5.init_params(jax.random.PRNGKey(3), config)
  encoded_input = jnp.asarray(
      np.random.RandomState(0).randn(2, 4, 8).astype(np.float32))
  encoded = t5.encode(params, config, encoded_input)
  tokens, _ = bs.beam_search(params, config, encoded,
                             max_decode_len=max_len, num_beams=3,
                             forbid_eos=True)
  arr = np.asarray(tokens)
  assert arr.shape == (2, max_len)
  assert not np.any(arr == EOS)
  assert not np.any(arr == PAD)


# ---------------------------------------------------------------------------
# int4 cache reshuffle (round-5 fix: sub-byte gathers crashed the TPU
# worker; beam routes int4 gathers through int8 — beam_search.py:155-161)
# ---------------------------------------------------------------------------
def test_int4_reshuffle_widening_is_exact():
  """take(int8-widened).astype(int4) must equal the direct int4 take for
  every representable int4 value (the fix is a pure routing change)."""
  rng = np.random.RandomState(11)
  x = jnp.asarray(rng.randint(-8, 8, size=(2, 6, 3, 4)), dtype=jnp.int4)
  idx = jnp.asarray(rng.randint(0, 6, size=6))
  direct = jnp.take(x, idx, axis=1)  # works on CPU
  widened = jnp.take(x.astype(jnp.int8), idx, axis=1).astype(jnp.int4)
  np.testing.assert_array_equal(np.asarray(direct.astype(jnp.int8)),
                                np.asarray(widened.astype(jnp.int8)))


def test_real_model_beam_int4_cache_matches_direct_gather(monkeypatch):
  """End-to-end beam with an int4 self-attn cache: the int8-routed
  reshuffle must produce bit-identical tokens/scores to the direct int4
  gather (branch disabled via a jnp shim whose int4 never matches)."""
  vocab, max_len = 6, 5
  config = ModelConfig(vocab_size=vocab, emb_dim=16, num_heads=2,
                       num_encoder_layers=1, num_decoder_layers=1,
                       head_dim=8, mlp_dim=16, dropout_rate=0.0,
                       input_depth=8, max_positions=8,
                       decode_kv_quantize=True, decode_kv_bits=4,
                       decode_cross_kv_quantize=True)
  params, _ = t5.init_params(jax.random.PRNGKey(5), config)
  encoded_input = jnp.asarray(
      np.random.RandomState(2).randn(2, 4, 8).astype(np.float32))
  encoded = t5.encode(params, config, encoded_input)

  tokens_fix, scores_fix = bs.beam_search(
      params, config, encoded, max_decode_len=max_len, num_beams=3)

  class _NoInt4Jnp:
    """Forwards to jnp but exposes an int4 sentinel that never equals a
    real dtype, so beam_search's widening branch is skipped and the
    reshuffle gathers int4 directly (legal on CPU)."""
    int4 = object()

    def __getattr__(self, name):
      return getattr(jnp, name)

  monkeypatch.setattr(bs, 'jnp', _NoInt4Jnp())
  tokens_direct, scores_direct = bs.beam_search(
      params, config, encoded, max_decode_len=max_len, num_beams=3)

  np.testing.assert_array_equal(np.asarray(tokens_fix),
                                np.asarray(tokens_direct))
  np.testing.assert_array_equal(np.asarray(scores_fix),
                                np.asarray(scores_direct))
