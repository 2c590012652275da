#!/usr/bin/env python
"""Audio-tagging backbone trainer CLI.

TPU-native counterpart of /root/reference/train_at.py: clip-level BCE
training of the ResNet backbone (used to initialize SP-SEDT via
``train_spsedt.py --pretrain``).  Installed as ``sedt-audio-tag``.
"""
from sound_event_detection_transformer_tpu.cli import main_at

if __name__ == "__main__":
    main_at()
