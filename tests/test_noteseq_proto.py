"""NoteSequence proto wire format + reference-schema TFRecord ingestion.

Covers VERDICT round-1 missing item #2: the reference corpora are
TFRecords whose 'sequence'/'note_sequences' features are serialized
NoteSequence protos (/root/reference/mt3/datasets.py:55-323).  These
tests write records in that exact layout and read them back through
ReferenceTFRecordDataSource into the tokenization pipeline.
"""

import io
import struct
import wave

import numpy as np
import pytest

from mt3_tpu.codec import vocabulary
from mt3_tpu.core import noteseq_proto
from mt3_tpu.core.config import SpectrogramConfig, VocabularyConfig
from mt3_tpu.core.note_sequence import (ControlChange, Note, NoteSequence,
                                        PitchBend, TempoChange)
from mt3_tpu.data import datasets, pipeline, tfrecord


def _sample_ns():
  ns = NoteSequence(id='ex-1', ticks_per_quarter=220, total_time=2.0)
  ns.notes = [
      Note(pitch=60, velocity=80, start_time=0.10, end_time=0.55),
      Note(pitch=64, velocity=90, start_time=0.50, end_time=1.20),
      Note(pitch=67, velocity=70, start_time=1.00, end_time=1.90),
  ]
  ns.tempos = [TempoChange(time=0.0, qpm=120.0)]
  return ns


def test_roundtrip_all_fields():
  ns = _sample_ns()
  ns.control_changes = [
      ControlChange(time=0.2, control_number=64, control_value=127),
      ControlChange(time=0.9, control_number=64, control_value=0)]
  ns.pitch_bends = [PitchBend(time=0.3, bend=-512, program=5)]
  data = noteseq_proto.notesequence_to_bytes(ns)
  back = noteseq_proto.notesequence_from_bytes(data)
  assert back.id == 'ex-1'
  assert back.ticks_per_quarter == 220
  assert back.total_time == 2.0
  assert [n.pitch for n in back.notes] == [60, 64, 67]
  assert back.notes[1].velocity == 90
  assert abs(back.notes[2].end_time - 1.90) < 1e-12
  assert back.control_changes[0].control_number == 64
  assert back.control_changes[1].control_value == 0
  assert back.pitch_bends[0].bend == -512
  assert back.pitch_bends[0].program == 5
  assert back.tempos[0].qpm == 120.0


def test_python_and_native_parsers_agree():
  ns = _sample_ns()
  ns.notes[0].program = 40
  ns.notes[0].instrument = 3
  ns.filename = 'some/file.midi'
  data = noteseq_proto.notesequence_to_bytes(ns)
  py = noteseq_proto._notesequence_from_bytes_py(data)
  if not tfrecord.native_available():
    pytest.skip('native library not built')
  nat = noteseq_proto._notesequence_from_bytes_native(
      tfrecord._load_library(), data)
  assert len(py.notes) == len(nat.notes)
  for a, b in zip(py.notes, nat.notes):
    assert (a.pitch, a.velocity, a.program, a.instrument, a.is_drum) == \
           (b.pitch, b.velocity, b.program, b.instrument, b.is_drum)
    assert abs(a.start_time - b.start_time) < 1e-12
  assert py.id == nat.id and py.total_time == nat.total_time
  assert py.filename == nat.filename == 'some/file.midi'


def test_unknown_fields_skipped():
  """Fields MT3 ignores (e.g. time_signatures=5) must not break parsing."""
  ns = _sample_ns()
  data = noteseq_proto.notesequence_to_bytes(ns)
  # Append a fake length-delimited field 5 (time_signatures) and a varint
  # field 18 (reference_number).
  extra = (noteseq_proto._length_delimited(5, b'\x09' + struct.pack(
      '<d', 1.5)) + noteseq_proto._field(18, 0, noteseq_proto._varint(7)))
  back = noteseq_proto.notesequence_from_bytes(data + extra)
  assert [n.pitch for n in back.notes] == [60, 64, 67]


def _wav_bytes(samples: np.ndarray, rate: int) -> bytes:
  buf = io.BytesIO()
  with wave.open(buf, 'wb') as w:
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(rate)
    w.writeframes((np.clip(samples, -1, 1) * 32767).astype('<i2').tobytes())
  return buf.getvalue()


@pytest.fixture
def spec_config():
  return SpectrogramConfig()


def test_maestro_schema_ingestion(tmp_path, spec_config):
  """MAESTRO layout: audio=WAV bytes, sequence=proto, id (ref :55-84)."""
  ns = _sample_ns()
  audio = np.sin(2 * np.pi * 440 * np.arange(32000) / 16000) * 0.3
  record = tfrecord.make_example({
      'audio': _wav_bytes(audio.astype(np.float32), 16000),
      'sequence': noteseq_proto.notesequence_to_bytes(ns),
      'id': b'maestro-ex',
  })
  path = str(tmp_path / 'maestro.tfrecord')
  tfrecord.write_records(path, [record])

  source = datasets.ReferenceTFRecordDataSource(
      datasets.MAESTROV3_CONFIG, path, spec_config)
  examples = list(source.examples())
  assert len(examples) == 1 and len(source) == 1
  ex = examples[0]
  assert ex['sequence'].id == 'ex-1'  # proto id wins over feature id
  assert [n.pitch for n in ex['sequence'].notes] == [60, 64, 67]
  assert ex['audio'].shape == (32000,)
  np.testing.assert_allclose(ex['audio'][:100], audio[:100], atol=2e-4)

  # Through tokenization: frames + RLE targets.
  codec = vocabulary.build_codec(VocabularyConfig())
  features = pipeline.tokenize_example(
      ex['sequence'], ex['audio'], spec_config, codec)
  assert features['inputs'].shape[1] == spec_config.hop_width
  assert len(features['targets']) > 0


def test_wav_resampled_on_ingest(tmp_path, spec_config):
  ns = _sample_ns()
  audio48 = np.sin(2 * np.pi * 440 * np.arange(96000) / 48000) * 0.3
  record = tfrecord.make_example({
      'audio': _wav_bytes(audio48.astype(np.float32), 48000),
      'sequence': noteseq_proto.notesequence_to_bytes(ns),
      'id': b'hi-rate',
  })
  path = str(tmp_path / 'hirate.tfrecord')
  tfrecord.write_records(path, [record])
  source = datasets.ReferenceTFRecordDataSource(
      datasets.MAESTROV3_CONFIG, path, spec_config)
  (ex,) = source.examples()
  assert abs(len(ex['audio']) - 32000) <= 1


def test_slakh_schema_ingestion(tmp_path, spec_config):
  """Slakh layout: mix float samples + per-track protos (ref :275-323)."""
  piano = NoteSequence(total_time=1.0)
  piano.notes = [Note(pitch=60, velocity=100, start_time=0.0, end_time=0.5)]
  drums = NoteSequence(total_time=1.0)
  drums.notes = [Note(pitch=38, velocity=110, start_time=0.25,
                      end_time=0.26)]
  mix = (np.random.RandomState(0).randn(16000) * 0.05).astype(np.float32)
  record = tfrecord.make_example({
      'mix': mix,
      'audio_sample_rate': np.array([16000], np.int64),
      'note_sequences': [noteseq_proto.notesequence_to_bytes(piano),
                         noteseq_proto.notesequence_to_bytes(drums)],
      'inst_names': [b'Acoustic Piano', b'Drums'],
      'track_id': b'Track00001',
  })
  path = str(tmp_path / 'slakh.tfrecord')
  tfrecord.write_records(path, [record])

  source = datasets.ReferenceTFRecordDataSource(
      datasets.SLAKH_CONFIG, path, spec_config, is_training=True)
  (ex,) = source.examples()
  ns = ex['sequence']
  assert ns.id == 'Track00001'
  assert len(ns.notes) == 2
  drum_notes = [n for n in ns.notes if n.is_drum]
  assert len(drum_notes) == 1 and drum_notes[0].pitch == 38
  piano_notes = [n for n in ns.notes if not n.is_drum]
  assert piano_notes[0].program == 0
  assert ex['audio'].shape == (16000,)

  codec = vocabulary.build_codec(VocabularyConfig())
  features = pipeline.tokenize_example(
      ns, ex['audio'], spec_config, codec)
  assert len(features['targets']) > 0


def test_cerberus4_track_specs(tmp_path, spec_config):
  """Cerberus4: fixed 4-track layout with programs from track_specs."""
  def track(pitch):
    t = NoteSequence(total_time=0.6)
    t.notes = [Note(pitch=pitch, velocity=90, start_time=0.0,
                    end_time=0.5)]
    return t

  mix = np.zeros(8000, np.float32)
  record = tfrecord.make_example({
      'mix': mix,
      'audio_sample_rate': np.array([16000], np.int64),
      'note_sequences': [noteseq_proto.notesequence_to_bytes(track(p))
                         for p in (36, 38, 52, 60)],
      'inst_names': [b'bass', b'drums', b'guitar', b'piano'],
      'track_id': b'cerb-1',
  })
  path = str(tmp_path / 'cerberus.tfrecord')
  tfrecord.write_records(path, [record])
  source = datasets.ReferenceTFRecordDataSource(
      datasets.CERBERUS4_CONFIG, path, spec_config)
  (ex,) = source.examples()
  programs = sorted((n.program, n.is_drum) for n in ex['sequence'].notes)
  assert (32, False) in programs   # bass
  assert (24, False) in programs   # guitar
  assert any(is_drum for _, is_drum in programs)


def test_guitarset_schema(tmp_path, spec_config):
  """GuitarSet: single sequence routed through program lookup (24)."""
  ns = NoteSequence(total_time=1.0)
  ns.notes = [Note(pitch=52, velocity=95, start_time=0.1, end_time=0.9)]
  audio = np.zeros(16000, np.float32)
  record = tfrecord.make_example({
      'audio': _wav_bytes(audio, 16000),
      'sequence': noteseq_proto.notesequence_to_bytes(ns),
      'velocity_range': b'',
      'id': b'gset-1',
  })
  path = str(tmp_path / 'gset.tfrecord')
  tfrecord.write_records(path, [record])
  source = datasets.ReferenceTFRecordDataSource(
      datasets.GUITARSET_CONFIG, path, spec_config)
  (ex,) = source.examples()
  assert all(n.program == 24 for n in ex['sequence'].notes)
  assert ex['sequence'].id == 'gset-1'


def test_musicnet_schema(tmp_path, spec_config):
  """MusicNet: float-sample audio + float sample_rate (ref :166-189)."""
  ns = _sample_ns()
  audio = (np.random.RandomState(1).randn(44100) * 0.02).astype(np.float32)
  record = tfrecord.make_example({
      'id': b'musicnet-2303',
      'sample_rate': np.array([44100.0], np.float32),
      'audio': audio,
      'sequence': noteseq_proto.notesequence_to_bytes(ns),
  })
  path = str(tmp_path / 'musicnet.tfrecord')
  tfrecord.write_records(path, [record])
  source = datasets.ReferenceTFRecordDataSource(
      datasets.MUSICNET_CONFIG, path, spec_config)
  (ex,) = source.examples()
  assert abs(len(ex['audio']) - 16000) <= 1  # resampled 44.1k -> 16k
  assert [n.pitch for n in ex['sequence'].notes] == [60, 64, 67]


def test_pitch_bend_track_skipped(tmp_path, spec_config):
  track = NoteSequence(total_time=0.5)
  track.notes = [Note(pitch=60, velocity=90, start_time=0.0, end_time=0.4)]
  track.pitch_bends = [PitchBend(time=0.1, bend=100)]
  record = tfrecord.make_example({
      'mix': np.zeros(4000, np.float32),
      'audio_sample_rate': np.array([16000], np.int64),
      'note_sequences': [noteseq_proto.notesequence_to_bytes(track)],
      'inst_names': [b'Acoustic Piano'],
      'track_id': b'pb-1',
  })
  path = str(tmp_path / 'pb.tfrecord')
  tfrecord.write_records(path, [record])
  source = datasets.ReferenceTFRecordDataSource(
      datasets.SLAKH_CONFIG, path, spec_config, ignore_pitch_bends=False)
  assert list(source.examples()) == []
  # With ignore_pitch_bends=True (the reference gin default) it loads.
  source = datasets.ReferenceTFRecordDataSource(
      datasets.SLAKH_CONFIG, path, spec_config, ignore_pitch_bends=True)
  assert len(list(source.examples())) == 1


def test_sharded_glob_paths(tmp_path, spec_config):
  """Reference shard patterns ('...-?????-of-00002') expand via glob."""
  ns = _sample_ns()
  audio = np.zeros(8000, np.float32)
  for i in range(2):
    record = tfrecord.make_example({
        'audio': _wav_bytes(audio, 16000),
        'sequence': noteseq_proto.notesequence_to_bytes(ns),
        'id': f'shard-{i}'.encode(),
    })
    tfrecord.write_records(
        str(tmp_path / f'data.tfrecord-{i:05d}-of-00002'), [record])
  source = datasets.ReferenceTFRecordDataSource(
      datasets.MAESTROV3_CONFIG,
      str(tmp_path / 'data.tfrecord-?????-of-00002'), spec_config)
  assert len(source.paths) == 2
  assert len(list(source.examples())) == 2


def test_urmp_schema_instrument_tracks(tmp_path, spec_config):
  """URMP layout: instrument_sequences + inst_names with per-instrument
  program lookup (reference datasets.py:141-163)."""
  vn = NoteSequence(total_time=1.0)
  vn.notes = [Note(pitch=76, velocity=90, start_time=0.1, end_time=0.9)]
  vc = NoteSequence(total_time=1.0)
  vc.notes = [Note(pitch=48, velocity=85, start_time=0.2, end_time=1.0)]
  audio = np.zeros(16000, np.float32)
  record = tfrecord.make_example({
      'id': b'urmp-01',
      'audio': _wav_bytes(audio, 16000),
      'sequence': noteseq_proto.notesequence_to_bytes(vn),  # combined
      'instrument_sequences': [noteseq_proto.notesequence_to_bytes(vn),
                               noteseq_proto.notesequence_to_bytes(vc)],
      'inst_names': [b'vn', b'vc'],
      'tracks': np.array([0, 1], np.int64),
  })
  path = str(tmp_path / 'urmp.tfrecord')
  tfrecord.write_records(path, [record])
  source = datasets.ReferenceTFRecordDataSource(
      datasets.URMP_CONFIG, path, spec_config)
  (ex,) = source.examples()
  programs = sorted(n.program for n in ex['sequence'].notes)
  assert programs == [40, 42]  # violin, cello from the URMP lookup
  assert ex['sequence'].id == 'urmp-01'
