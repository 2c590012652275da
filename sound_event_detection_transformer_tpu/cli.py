"""Console entry points (``[project.scripts]``) for the four trainers.

The repo-root shims (``train_sedt.py`` & co., mirroring the reference's
script layout) and the installed commands (``sedt-train`` & co.) both land
here, so the flag-defaulting logic lives in exactly one place.
"""
from __future__ import annotations

from .train_lib import (
    get_parser,
    run_audio_tag,
    run_semi,
    run_spsedt,
    run_supervised,
)


def main_sedt() -> None:
    """Supervised training / evaluation (reference train_sedt.py)."""
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


def main_spsedt() -> None:
    """SP-SEDT self-supervised pretraining (reference train_spsedt.py)."""
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


def main_semi() -> None:
    """Semi-supervised mean-teacher training (reference train_ss_sedt.py)."""
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


def main_at() -> None:
    """Audio-tagging backbone trainer (reference train_at.py)."""
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
