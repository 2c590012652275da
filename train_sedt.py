#!/usr/bin/env python
"""Supervised SEDT training / evaluation CLI.

TPU-native counterpart of /root/reference/train_sedt.py — same flag surface,
same two-stage schedule, SaveBest / EarlyStopping, final test on
validation + eval.  Add ``--synthetic_smoke`` to run without a dataset.
Installed as the ``sedt-train`` console script.
"""
from sound_event_detection_transformer_tpu.cli import main_sedt

if __name__ == "__main__":
    main_sedt()
