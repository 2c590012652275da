#!/usr/bin/env python
"""Semi-supervised mean-teacher SEDT training CLI.

TPU-native counterpart of /root/reference/train_ss_sedt.py: batch =
1/4 synthetic + 1/4 weak + 1/2 unlabeled, teacher/student Gaussian-noise
pairs, EMA teacher with on-device pseudo-labeling and class-wise threshold
adaptation, teacher-or-student evaluation.  Installed as ``sedt-semi``.
"""
from sound_event_detection_transformer_tpu.cli import main_semi

if __name__ == "__main__":
    main_semi()
