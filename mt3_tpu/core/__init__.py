from mt3_tpu.core import config
from mt3_tpu.core.note_sequence import Note, NoteSequence
