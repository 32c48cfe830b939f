from mt3_tpu.codec import event_codec, note_events, run_length, vocabulary
