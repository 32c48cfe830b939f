"""TFRecord reader tests, incl. golden interop with TensorFlow's writer."""

import numpy as np
import pytest

from mt3_tpu.data import tfrecord


def test_round_trip(tmp_path):
  feats = {
      'audio': np.linspace(-1, 1, 100).astype(np.float32),
      'sequence': [b'proto-bytes-here'],
      'velocity_range': np.array([0, 127], np.int64),
  }
  path = str(tmp_path / 'x.tfrecord')
  tfrecord.write_records(path, [tfrecord.make_example(feats)] * 3)
  examples = list(tfrecord.read_examples(path))
  assert len(examples) == 3
  for ex in examples:
    np.testing.assert_array_equal(ex['audio'], feats['audio'])
    assert ex['sequence'] == [b'proto-bytes-here']
    np.testing.assert_array_equal(ex['velocity_range'], [0, 127])


def test_python_fallback_matches_native(tmp_path):
  feats = {'a': np.array([1.5, -2.5], np.float32),
           'b': np.array([-1, 2 ** 40], np.int64),
           'c': [b'x', b'yz']}
  path = str(tmp_path / 'y.tfrecord')
  tfrecord.write_records(path, [tfrecord.make_example(feats)])
  rec = next(tfrecord.read_records(path))
  py = tfrecord._parse_example_py(rec)
  np.testing.assert_array_equal(py['a'], feats['a'])
  np.testing.assert_array_equal(py['b'], feats['b'])
  assert py['c'] == feats['c']
  if tfrecord.native_available():
    nat = tfrecord.parse_example(rec)
    np.testing.assert_array_equal(nat['a'], py['a'])
    np.testing.assert_array_equal(nat['b'], py['b'])
    assert nat['c'] == py['c']


def test_interop_with_tensorflow(tmp_path):
  """Read records written by TF; write records TF can read."""
  tf = pytest.importorskip('tensorflow')
  path = str(tmp_path / 'tf.tfrecord')
  ex = tf.train.Example(features=tf.train.Features(feature={
      'audio': tf.train.Feature(
          float_list=tf.train.FloatList(value=[0.5, -0.25, 1.0])),
      'id': tf.train.Feature(
          bytes_list=tf.train.BytesList(value=[b'abc'])),
      'length': tf.train.Feature(
          int64_list=tf.train.Int64List(value=[42])),
  }))
  with tf.io.TFRecordWriter(path) as w:
    w.write(ex.SerializeToString())
    w.write(ex.SerializeToString())

  examples = list(tfrecord.read_examples(path))
  assert len(examples) == 2
  np.testing.assert_allclose(examples[0]['audio'], [0.5, -0.25, 1.0])
  assert examples[0]['id'] == [b'abc']
  np.testing.assert_array_equal(examples[0]['length'], [42])

  # Reverse direction: TF reads our records.
  ours = str(tmp_path / 'ours.tfrecord')
  tfrecord.write_records(ours, [tfrecord.make_example(
      {'audio': np.array([1.0, 2.0], np.float32)})])
  ds = tf.data.TFRecordDataset(ours)
  parsed = tf.io.parse_single_example(
      next(iter(ds)),
      {'audio': tf.io.FixedLenFeature([2], tf.float32)})
  np.testing.assert_allclose(parsed['audio'].numpy(), [1.0, 2.0])
