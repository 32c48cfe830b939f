"""Decode loop tests: greedy, temperature, bucketing, beam search, writer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mt3_tpu.codec import vocabulary
from mt3_tpu.core.config import ModelConfig
from mt3_tpu.infer import beam_search, decode, writer
from mt3_tpu.models import t5


@pytest.fixture(scope='module')
def config():
  return ModelConfig(
      vocab_size=128, emb_dim=32, num_heads=4, num_encoder_layers=2,
      num_decoder_layers=2, head_dim=8, mlp_dim=64, dropout_rate=0.0,
      input_depth=16, max_positions=512)


@pytest.fixture(scope='module')
def setup(config):
  params, _ = t5.init_params(jax.random.PRNGKey(0), config)
  enc_in = jax.random.normal(jax.random.PRNGKey(1), (3, 6,
                                                     config.input_depth))
  encoded = t5.encode(params, config, enc_in)
  return params, encoded


def test_greedy_decode_shapes_and_eos(config, setup):
  params, encoded = setup
  tokens, lengths = decode.decode_tokens(params, config, encoded, 48)
  tokens, lengths = np.asarray(tokens), np.asarray(lengths)
  assert tokens.shape == (3, 48)
  for row, n in zip(tokens, lengths):
    if n < 48:
      assert row[n - 1] == vocabulary.EOS_ID
      assert np.all(row[n:] == vocabulary.PAD_ID)
    assert np.all(row[:n - 1] != vocabulary.PAD_ID)


def test_bucketing_invariance(config, setup):
  """Decoded tokens must not depend on the bucket size."""
  params, encoded = setup
  t1, _ = decode.decode_tokens(params, config, encoded, 40,
                               bucket_size=8)
  t2, _ = decode.decode_tokens(params, config, encoded, 40,
                               bucket_size=40)
  t3, _ = decode.decode_tokens(params, config, encoded, 40,
                               bucket_size=16)
  np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
  np.testing.assert_array_equal(np.asarray(t1), np.asarray(t3))


def test_forbid_eos_runs_full_length(config, setup):
  params, encoded = setup
  tokens, lengths = decode.decode_tokens(params, config, encoded, 32,
                                         forbid_eos=True)
  assert np.all(np.asarray(lengths) == 32)
  assert not np.any(np.asarray(tokens) == vocabulary.EOS_ID)
  assert not np.any(np.asarray(tokens) == vocabulary.PAD_ID)


def test_temperature_sampling_deterministic_per_key(config, setup):
  params, encoded = setup
  t1, _ = decode.decode_tokens(params, config, encoded, 24,
                               temperature=1.0,
                               rng=jax.random.PRNGKey(7))
  t2, _ = decode.decode_tokens(params, config, encoded, 24,
                               temperature=1.0,
                               rng=jax.random.PRNGKey(7))
  t3, _ = decode.decode_tokens(params, config, encoded, 24,
                               temperature=1.0,
                               rng=jax.random.PRNGKey(8))
  np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
  assert not np.array_equal(np.asarray(t1), np.asarray(t3))


def test_beam_search_smoke(config, setup):
  params, encoded = setup
  tokens, scores = beam_search.beam_search(params, config, encoded, 24,
                                           num_beams=3)
  tokens, scores = np.asarray(tokens), np.asarray(scores)
  assert tokens.shape == (3, 24)
  assert np.all(np.isfinite(scores))
  # Sequences end with EOS then padding (or never finish).
  for row in tokens:
    if vocabulary.EOS_ID in row:
      eos = int(np.argmax(row == vocabulary.EOS_ID))
      assert np.all(row[eos + 1:] == vocabulary.PAD_ID)


def test_beam_one_close_to_greedy_score(config, setup):
  """Beam width 4 must score at least as well as the greedy sequence."""
  params, encoded = setup

  def seq_log_prob(tokens):
    # Teacher-forced scoring of a decoded sequence.
    tokens = jnp.asarray(tokens)
    b, n = tokens.shape
    dec_in = jnp.concatenate(
        [jnp.zeros((b, 1), jnp.int32), tokens[:, :-1]], axis=1)
    logits = t5.decode_train(params, config, encoded, dec_in, tokens)
    logp = jax.nn.log_softmax(logits)
    picked = jnp.take_along_axis(logp, tokens[..., None], axis=-1)[..., 0]
    mask = tokens > 0
    return np.asarray(jnp.sum(picked * mask, axis=-1))

  greedy_tokens, _ = decode.decode_tokens(params, config, encoded, 24)
  beam_tokens, _ = beam_search.beam_search(params, config, encoded, 24,
                                           num_beams=4)
  greedy_lp = seq_log_prob(np.asarray(greedy_tokens))
  beam_lp = seq_log_prob(np.asarray(beam_tokens))
  assert np.all(beam_lp >= greedy_lp - 1e-3)


def test_inference_writer(tmp_path, setup, config):
  import json
  codec = vocabulary.build_codec(
      __import__('mt3_tpu.core.config', fromlist=['VocabularyConfig'])
      .VocabularyConfig(num_velocity_bins=1))
  tie = codec.encode_event(
      __import__('mt3_tpu.codec.event_codec',
                 fromlist=['Event']).Event('tie', 0))
  predictions = [
      {'unique_id': 'a', 'est_tokens': np.array([tie, 10, 1001 + 60]),
       'start_time': 0.0},
      {'unique_id': 'a', 'est_tokens': np.array([tie, 5, 1001 + 62]),
       'start_time': 2.0},
      {'unique_id': 'b', 'est_tokens': np.array([tie]),
       'start_time': 0.0},
  ]
  path = str(tmp_path / 'out.jsonl')
  n = writer.write_inferences_to_file(path, predictions, codec,
                                      onsets_only=False, use_ties=True)
  assert n == 2
  lines = [json.loads(line) for line in open(path)]
  assert [line['id'] for line in lines] == ['a', 'b']
  ns = writer.dict_to_note_sequence(lines[0]['est_notes'])
  assert len(ns.notes) == 2


def test_steps_per_iter_invariance(config, setup):
  params, encoded = setup
  t1, l1 = decode.decode_tokens(params, config, encoded, 40,
                                bucket_size=8, steps_per_iter=1)
  t2, l2 = decode.decode_tokens(params, config, encoded, 40,
                                bucket_size=8, steps_per_iter=2)
  t4, _ = decode.decode_tokens(params, config, encoded, 40,
                               bucket_size=8, steps_per_iter=4)
  np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
  np.testing.assert_array_equal(np.asarray(t1), np.asarray(t4))
  np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_steps_per_iter_non_divisible_length(config, setup):
  """max_decode_len not divisible by steps_per_iter must not corrupt the
  tail (the unroll is clamped to a safe divisor at trace time)."""
  params, encoded = setup[0], setup[1]
  ref, ref_len = decode.decode_tokens(params, config, encoded,
                                      max_decode_len=21, bucket_size=8,
                                      forbid_eos=True)
  out, out_len = decode.decode_tokens(params, config, encoded,
                                      max_decode_len=21, bucket_size=8,
                                      forbid_eos=True, steps_per_iter=16)
  np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
  np.testing.assert_array_equal(np.asarray(out_len), np.asarray(ref_len))


def test_beam_search_with_quantized_caches(config, setup):
  """Beam search carries the cross-KV scale fields (reachable via
  `transcribe --num_beams N --int8_kv`)."""
  from mt3_tpu.core.config import ModelConfig
  q_config = ModelConfig(**{**config.__dict__,
                            'decode_kv_quantize': True,
                            'decode_cross_kv_quantize': True})
  params, encoded = setup
  tokens, scores = beam_search.beam_search(params, q_config, encoded,
                                           max_decode_len=12, num_beams=2)
  assert np.asarray(tokens).shape == (3, 12)
  assert np.isfinite(np.asarray(scores)).all()
