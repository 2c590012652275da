#!/usr/bin/env python
"""Audio-tagging backbone trainer CLI.

TPU-native counterpart of /root/reference/train_at.py: clip-level BCE
training of the ResNet backbone (used to initialize SP-SEDT via
``train_spsedt.py --pretrain``).
"""
from sound_event_detection_transformer_tpu.train_lib import get_parser, run_audio_tag

if __name__ == "__main__":
    parser = get_parser()
    parser.add_argument("--nepochs", type=int, default=None,
                        help="alias for --epochs (reference train_at.py:233)")
    parser.add_argument("--fix_backbone", action="store_true", default=False)
    args = parser.parse_args()
    if args.nepochs is not None:
        args.epochs = args.nepochs
    if args.pooling is None:
        args.pooling = "avg"
    if args.info is None:
        args.info = f"at_{args.pooling}_{args.dataname}"
    run_audio_tag(args)
