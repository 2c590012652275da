#!/usr/bin/env python
"""Semi-supervised mean-teacher SEDT training CLI.

TPU-native counterpart of /root/reference/train_ss_sedt.py: batch =
1/4 synthetic + 1/4 weak + 1/2 unlabeled, teacher/student Gaussian-noise
pairs, EMA teacher with on-device pseudo-labeling and class-wise threshold
adaptation, teacher-or-student evaluation.
"""
from sound_event_detection_transformer_tpu.train_lib import get_parser, run_semi

if __name__ == "__main__":
    parser = get_parser()
    parser.add_argument("--ema_m", type=float, default=0.9996,
                        help="ema momentum for the teacher")
    parser.add_argument("--semi_batch_size", default=64, type=int)
    parser.add_argument("--teacher_eval", action="store_false", default=True,
                        help="evaluate the EMA teacher (default) or student")
    args = parser.parse_args()
    args.ema_decay = args.ema_m
    assert args.dataname == "dcase" or args.synthetic_smoke, (
        "only the dcase dataset is supported (reference train_ss_sedt.py:38)"
    )
    if args.eval:
        args.epochs = 0
        assert args.info, "give the model information (--info) to be evaluated"
    if args.info is None:
        args.info = (
            f"semi_supervised_{args.dataname}_atloss_{args.weak_loss_coef}"
            f"_atploss_{args.weak_loss_p_coef}_enc_{args.enc_layers}"
            f"_pooling_{args.pooling}_{args.fusion_strategy}"
        )
    run_semi(args)
