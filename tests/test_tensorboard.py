"""TensorBoard writer interop: TF's reader must parse our event files."""

import pytest

from mt3_tpu.utils.tensorboard import SummaryWriter


def test_event_file_readable_by_tf(tmp_path):
  tf = pytest.importorskip('tensorflow')
  writer = SummaryWriter(str(tmp_path))
  writer.add_scalar('loss', 3.14, step=1)
  writer.add_scalars({'loss': 2.71, 'accuracy': 0.5}, step=2)
  writer.close()

  events = []
  for record in tf.data.TFRecordDataset(writer.path):
    event = tf.compat.v1.Event()
    event.ParseFromString(record.numpy())
    events.append(event)

  assert events[0].file_version == 'brain.Event:2'
  scalars = [(e.step, v.tag, v.simple_value)
             for e in events[1:] for v in e.summary.value]
  assert (1, 'loss', pytest.approx(3.14)) == scalars[0]
  assert (2, 'loss', pytest.approx(2.71)) == scalars[1]
  assert (2, 'accuracy', pytest.approx(0.5)) == scalars[2]
