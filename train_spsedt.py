#!/usr/bin/env python
"""SP-SEDT self-supervised pretraining CLI.

TPU-native counterpart of /root/reference/train_spsedt.py: patch-query
pretraining on unlabeled audio; SPMD data parallelism over the jax device
mesh replaces torch DDP + DistributedSampler.  Installed as ``sedt-pretrain``.
"""
from sound_event_detection_transformer_tpu.cli import main_spsedt

if __name__ == "__main__":
    main_spsedt()
