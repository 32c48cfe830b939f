"""Event codec tests; parity contract with reference event_codec_test.py."""

import pytest

from mt3_tpu.codec import event_codec


@pytest.fixture
def codec():
  return event_codec.Codec(
      max_shift_steps=100,
      steps_per_second=100,
      event_ranges=[
          event_codec.EventRange('pitch', 0, 127),
          event_codec.EventRange('velocity', 0, 127),
          event_codec.EventRange('drum', 0, 127),
          event_codec.EventRange('program', 0, 127),
          event_codec.EventRange('tie', 0, 0),
      ])


def test_encode_decode_round_trip(codec):
  # Shift block occupies [0, 100]; pitch starts at 101, so pitch 60 -> 161.
  assert codec.encode_event(event_codec.Event('pitch', 60)) == 161
  assert codec.decode_event_index(161) == event_codec.Event('pitch', 60)
  for index in range(codec.num_classes):
    event = codec.decode_event_index(index)
    assert codec.encode_event(event) == index


def test_shift_range(codec):
  assert codec.max_shift_steps == 100
  assert codec.is_shift_event_index(0)
  assert codec.is_shift_event_index(100)
  assert not codec.is_shift_event_index(101)
  assert not codec.is_shift_event_index(-1)


def test_num_classes(codec):
  # 101 shifts + 128 pitch + 128 velocity + 128 drum + 128 program + 1 tie
  assert codec.num_classes == 101 + 128 + 128 + 128 + 128 + 1


def test_event_type_range(codec):
  assert codec.event_type_range('shift') == (0, 100)
  assert codec.event_type_range('pitch') == (101, 228)
  with pytest.raises(ValueError):
    codec.event_type_range('bogus')


def test_encode_out_of_range(codec):
  with pytest.raises(ValueError):
    codec.encode_event(event_codec.Event('pitch', 128))
  with pytest.raises(ValueError):
    codec.encode_event(event_codec.Event('bogus', 0))


def test_decode_out_of_range(codec):
  with pytest.raises(ValueError):
    codec.decode_event_index(codec.num_classes)
  with pytest.raises(ValueError):
    codec.decode_event_index(-1)
