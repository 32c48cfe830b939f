"""Vocabulary tests; parity contract with reference vocabularies_test.py."""

import numpy as np
import pytest

from mt3_tpu.codec import vocabulary
from mt3_tpu.core.config import VocabularyConfig


def test_velocity_quantization():
  assert vocabulary.velocity_to_bin(0, num_velocity_bins=1) == 0
  assert vocabulary.velocity_to_bin(0, num_velocity_bins=127) == 0
  assert vocabulary.bin_to_velocity(0, num_velocity_bins=1) == 0
  assert vocabulary.bin_to_velocity(0, num_velocity_bins=127) == 0

  assert vocabulary.velocity_to_bin(
      vocabulary.bin_to_velocity(1, num_velocity_bins=1),
      num_velocity_bins=1) == 1

  for velocity_bin in range(1, 128):
    assert vocabulary.velocity_to_bin(
        vocabulary.bin_to_velocity(velocity_bin, num_velocity_bins=127),
        num_velocity_bins=127) == velocity_bin


def test_encode_decode():
  vocab = vocabulary.GenericTokenVocabulary(32)
  input_tokens = [1, 2, 3]
  expected_encoded = [4, 5, 6]
  assert vocab.encode(input_tokens) == expected_encoded
  np.testing.assert_array_equal(
      vocab.encode_array(np.array(input_tokens)), expected_encoded)
  assert vocab.decode(expected_encoded) == input_tokens
  np.testing.assert_array_equal(
      vocab.decode_array(np.array(expected_encoded)), input_tokens)


def test_decode_invalid_ids():
  vocab = vocabulary.GenericTokenVocabulary(32, extra_ids=4)
  encoded = [0, 2, 3, 4, 34, 35]
  expected_decoded = [-2, -2, 0, 1, 31, -2]
  assert vocab.decode(encoded) == expected_decoded
  np.testing.assert_array_equal(
      vocab.decode_array(np.array(encoded)), expected_decoded)


def test_decode_eos():
  vocab = vocabulary.GenericTokenVocabulary(32)
  encoded = [0, 2, 3, 4, 1, 0, 1, 0]
  # List decode truncates everything after first EOS.
  assert vocab.decode(encoded) == [-2, -2, 0, 1, -1]
  # Array decode preserves length; EOS and after -> -1.
  np.testing.assert_array_equal(
      vocab.decode_array(np.array(encoded)),
      [-2, -2, 0, 1, -1, -1, -1, -1])


def test_decode_array_batched():
  vocab = vocabulary.GenericTokenVocabulary(32)
  encoded = np.array([[3, 1, 5, 6], [4, 5, 0, 2]])
  np.testing.assert_array_equal(
      vocab.decode_array(encoded), [[0, -1, -1, -1], [1, 2, -2, -2]])


def test_encode_invalid_id():
  vocab = vocabulary.GenericTokenVocabulary(32)
  vocab.encode([0, 15, 31])
  with pytest.raises(ValueError):
    vocab.encode([-1, 15, 31])
  with pytest.raises(ValueError):
    vocab.encode([0, 15, 32])
  with pytest.raises(ValueError):
    vocab.encode_array(np.array([0, 15, 32]))


def test_build_codec_ranges():
  """Codec layout: shift block first, then pitch/velocity/tie/program/drum."""
  config = VocabularyConfig()  # 100 steps/s * 10 s = 1000 max shift
  codec = vocabulary.build_codec(config)
  assert codec.event_type_range('shift') == (0, 1000)
  assert codec.event_type_range('pitch') == (1001, 1128)
  assert codec.event_type_range('velocity') == (1129, 1256)
  assert codec.event_type_range('tie') == (1257, 1257)
  assert codec.event_type_range('program') == (1258, 1385)
  assert codec.event_type_range('drum') == (1386, 1513)
  assert vocabulary.num_velocity_bins_from_codec(codec) == 127


@pytest.mark.parametrize('num_velocity_bins,expected', [(1, 1536), (127, 1664)])
def test_num_embeddings_tpu_padding(num_velocity_bins, expected):
  config = VocabularyConfig(num_velocity_bins=num_velocity_bins)
  codec = vocabulary.build_codec(config)
  vocab = vocabulary.vocabulary_from_codec(codec)
  n = vocabulary.num_embeddings(vocab)
  assert n % 128 == 0
  assert n == expected


def test_program_granularities():
  config = VocabularyConfig()
  codec = vocabulary.build_codec(config)
  min_program, _ = codec.event_type_range('program')
  tokens = np.array([5, min_program + 5, min_program + 9, 100])

  flat = vocabulary.PROGRAM_GRANULARITIES['flat']
  np.testing.assert_array_equal(
      flat.tokens_map_fn(tokens, codec), [5, 100])
  assert flat.program_map_fn(41) == 0

  midi_class = vocabulary.PROGRAM_GRANULARITIES['midi_class']
  np.testing.assert_array_equal(
      midi_class.tokens_map_fn(tokens, codec),
      [5, min_program + 0, min_program + 8, 100])
  assert midi_class.program_map_fn(41) == 40

  full = vocabulary.PROGRAM_GRANULARITIES['full']
  np.testing.assert_array_equal(full.tokens_map_fn(tokens, codec), tokens)
  assert full.program_map_fn(41) == 41
