#!/usr/bin/env python
"""Inference CLI: wav files (or cached features) -> detected-event TSV.

A user-facing capability the reference lacks.  See
``sound_event_detection_transformer_tpu/predict_cli.py`` for the
implementation; installed as the ``sedt-predict`` console script.

Example:
  python predict.py --checkpoint exp/urbansed/model/<info>_1_best \
    --dataname urbansed --wav_dir ./my_clips --out predictions.tsv --dec_at
"""
from sound_event_detection_transformer_tpu.predict_cli import main

if __name__ == "__main__":
    main()
