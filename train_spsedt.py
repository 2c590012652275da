#!/usr/bin/env python
"""SP-SEDT self-supervised pretraining CLI.

TPU-native counterpart of /root/reference/train_spsedt.py: patch-query
pretraining on unlabeled audio; SPMD data parallelism over the jax device
mesh replaces torch DDP + DistributedSampler.
"""
from sound_event_detection_transformer_tpu.train_lib import get_parser, run_spsedt

if __name__ == "__main__":
    parser = get_parser()
    parser.add_argument("--extra_data", action="store_true", default=False,
                        help="use dcase2018 task5 data to pretrain")
    args = parser.parse_args()
    assert args.dataname == "dcase" or args.synthetic_smoke, (
        "only the dcase dataset is supported (reference train_spsedt.py:49)"
    )
    if args.info is None:
        args.info = f"pretrain_enc_{args.enc_layers}"
        if args.feature_recon:
            args.info += "_feature_recon"
        if args.fixed_patch_size:
            args.info += "_fixed_patch_size"
    run_spsedt(args)
