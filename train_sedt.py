#!/usr/bin/env python
"""Supervised SEDT training / evaluation CLI.

TPU-native counterpart of /root/reference/train_sedt.py — same flag surface,
same two-stage schedule, SaveBest / EarlyStopping, final test on
validation + eval.  Add ``--synthetic_smoke`` to run without a dataset.
"""
from sound_event_detection_transformer_tpu.train_lib import get_parser, run_supervised

if __name__ == "__main__":
    args = get_parser().parse_args()
    if args.eval:
        args.epochs = 0
        assert args.info, "give the model information (--info) to be evaluated"
    if args.info is None:
        args.info = (
            f"{args.dataname}_atloss_{args.weak_loss_coef}"
            f"_atploss_{args.weak_loss_p_coef}_enc_{args.enc_layers}"
            f"_pooling_{args.pooling}_{args.fusion_strategy}"
        )
        if args.pretrain:
            args.info += "_" + args.pretrain
    run_supervised(args)
