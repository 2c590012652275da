"""Training orchestration shared by the CLI entry points.

Mirrors the flow of /root/reference/train_sedt.py (data assembly, scaler,
model build, pretrain/resume surgery, two-stage schedule, SaveBest /
EarlyStopping, final test) on top of the jitted engine.  Also provides the
synthetic-smoke path used when no real dataset is mounted (this environment,
tests, bench).
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import os.path as osp
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import config as C
from .config import SEDTConfig
from .data.dataset import (
    ConcatDataset,
    DataLoadDf,
    MultiStreamBatchSampler,
    WavLoadDf,
    batch_iterator,
)
from .data.encoder import BoxEncoder
from .data.scaler import Scaler
from .data.synthetic import SyntheticDataset
from .data.transforms import get_transforms
from .engine import (
    Batch,
    TrainState,
    make_eval_step,
    make_train_step,
)
from .metrics import audio_tagging_results, compute_metrics
from .models import build_model
from .parallel.mesh import make_mesh, shard_batch_pytree
from .parallel.optim import make_optimizer
from .utils.checkpoint import (
    EarlyStopping,
    SaveBest,
    load_checkpoint,
    load_pretrain_into,
    save_checkpoint,
)
from .utils.compilation_cache import enable as enable_compilation_cache
from .utils.logger import create_logger, set_logger

enable_compilation_cache()


def get_parser() -> argparse.ArgumentParser:
    """Full reference flag surface (train_sedt.py:28-129) plus SP-SEDT /
    semi-supervised extensions and the synthetic smoke switch."""
    p = argparse.ArgumentParser(description="TPU-native SEDT")
    # dataset
    p.add_argument("--num_classes", default=10, type=int)
    p.add_argument("--dataname", default="dcase", choices=["urbansed", "dcase"])
    p.add_argument("--synthetic", action="store_true", default=True)
    p.add_argument("--weak", action="store_false", default=True)
    p.add_argument("--synthetic_smoke", action="store_true", default=False,
                   help="run on generated synthetic data (no dataset needed)")
    p.add_argument("--smoke_clips", default=64, type=int)
    p.add_argument("--data_root", default="./data", type=str)
    p.add_argument("--nb_files", default=None, type=int)
    p.add_argument("--max_strong_clips", default=None, type=int,
                   help="cap the strong (synthetic) training split to its "
                        "first N clips; other splits untouched (semi-sup "
                        "label-scarcity controls)")
    # train
    p.add_argument("--lr", default=1e-4, type=float)
    p.add_argument("--lr_backbone", default=1e-4, type=float)
    p.add_argument("--batch_size", default=64, type=int)
    p.add_argument("--n_weak", default=16, type=int)
    p.add_argument("--accumrating_gradient_steps", default=1, type=int)
    p.add_argument("--adjust_lr", action="store_false", default=True)
    p.add_argument("--weight_decay", default=1e-4, type=float)
    p.add_argument("--eval", action="store_true")
    p.add_argument("--epochs", default=400, type=int)
    p.add_argument("--epochs_ls", default=400, type=int)
    p.add_argument("--checkpoint_epochs", default=0, type=int)
    p.add_argument("--eval_interval", default=1, type=int)
    p.add_argument("--psds", action="store_true", default=False,
                   help="compute PSDS over multiple decode thresholds at the final test")
    p.add_argument("--roc_curves", default=None,
                   help="with --psds: write per-class ROC staircases (CSV + "
                        "PNG) to this path prefix or directory (reference "
                        "metrics.py:135-140 filename_roc_curves)")
    p.add_argument("--lr_drop", default=200, type=int)
    p.add_argument("--fine_tune", action="store_true", default=False)
    p.add_argument("--normalize", action="store_true", default=False)
    p.add_argument("--clip_max_norm", default=0.1, type=float)
    p.add_argument("--seed", default=2020, type=int)
    # augment
    p.add_argument("--mix_up_ratio", type=float, default=0)
    p.add_argument("--time_mask", action="store_true", default=False)
    p.add_argument("--freq_mask", action="store_true", default=False)
    p.add_argument("--freq_shift", action="store_true", default=False)
    # model
    p.add_argument("--self_sup", dest="self_sup", action="store_true")
    p.add_argument("--pretrain", default="")
    p.add_argument("--resume", default="")
    p.add_argument("--dec_at", action="store_true", default=False)
    p.add_argument("--fusion_strategy", default=[1], nargs="+", type=int)
    p.add_argument("--pooling", type=str, default=None,
                   choices=("max", "avg", "attn", "weighted_sum"))
    p.add_argument("--backbone", default="resnet50", type=str)
    p.add_argument("--imagenet_backbone", default=None, type=str,
                   help="torchvision ResNet .pth for ImageNet backbone init "
                        "(the reference always builds from pretrained "
                        "torchvision weights, backbone.py:98-112); defaults "
                        "to <data_root>/<backbone>.pth when that file exists")
    p.add_argument("--dilation", action="store_false", default=True)
    p.add_argument("--position_embedding", default="sine", type=str,
                   choices=("sine", "learned"))
    p.add_argument("--enc_layers", default=3, type=int)
    p.add_argument("--dec_layers", default=3, type=int)
    p.add_argument("--dim_feedforward", default=2048, type=int)
    p.add_argument("--hidden_dim", default=256, type=int)
    p.add_argument("--dropout", default=0.1, type=float)
    p.add_argument("--nheads", default=8, type=int)
    p.add_argument("--num_queries", default=20, type=int)
    p.add_argument("--pre_norm", action="store_false", default=True)
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=("float32", "bfloat16"),
                   help="activation/matmul dtype; params stay float32 "
                        "(bf16 default validated against an f32 control, "
                        "ACCURACY.md; pass float32 to reproduce exactly)")
    # SP-SEDT
    p.add_argument("--feature_recon", action="store_true", default=False)
    p.add_argument("--query_shuffle", action="store_true", default=False)
    p.add_argument("--num_patches", default=10, type=int)
    p.add_argument("--fixed_patch_size", action="store_true", default=False)
    p.add_argument("--device_data", dest="device_data", action="store_true",
                   default=True,
                   help="hold the whole dataset's features in HBM and gather "
                        "batches in-graph (FeatureBank); on by default in the "
                        "supervised/semi/SP-SEDT trainers when the bank fits")
    p.add_argument("--no_device_data", dest="device_data",
                   action="store_false")
    p.add_argument("--from_wavs", action="store_true", default=False,
                   help="stream RAW waveforms to the device and run the "
                        "wav->logmel->normalize frontend in-graph inside the "
                        "jitted train step (ops/frontend.make_frontend_fn); "
                        "the .npy cache is still built once for the scaler "
                        "and the eval splits (supervised trainer only)")
    p.add_argument("--shard_bank", action="store_true", default=False,
                   help="force the FeatureBank to shard over the mesh's data "
                        "axis even when it would fit replicated (the layout "
                        "maybe_bank only picks when a single chip can't hold "
                        "the dataset)")
    # loss
    p.add_argument("--no_aux_loss", dest="aux_loss", action="store_false")
    p.add_argument("--set_cost_class", default=1, type=float)
    p.add_argument("--set_cost_bbox", default=5, type=float)
    p.add_argument("--set_cost_giou", default=2, type=float)
    p.add_argument("--epsilon", default=1, type=float)
    p.add_argument("--alpha", default=1, type=float)
    p.add_argument("--bbox_loss_coef", default=5, type=float)
    p.add_argument("--giou_loss_coef", default=2, type=float)
    p.add_argument("--eos_coef", default=0.1, type=float)
    p.add_argument("--weak_loss_coef", default=1, type=float)
    p.add_argument("--weak_loss_p_coef", default=1, type=float)
    p.add_argument("--ce_loss_coef", default=1, type=float)
    # semi-supervised
    p.add_argument("--focal_loss", action="store_true", default=False)
    p.add_argument("--ema_decay", default=0.9996, type=float)
    p.add_argument("--accumlating_ema_steps", default=1, type=int)
    p.add_argument("--teacher_model", default="")
    # accepted for reference CLI drop-in parity; unused there too
    # (train_sedt.py:67,86-87,99-100 — gpus is CUDA-specific, idim and
    # input_layer are dead flags in the reference)
    p.add_argument("--gpus", type=str, default="0",
                   help="(ignored; device selection is JAX-managed)")
    p.add_argument("--idim", default=128, type=int, help="(unused, parity)")
    p.add_argument("--input_layer", default="linear", type=str,
                   help="(unused, parity)")
    # misc
    p.add_argument("--info", default=None, type=str)
    p.add_argument("--back_up", action="store_true", default=False)
    p.add_argument("--log", action="store_false", default=True)
    p.add_argument("--exp_root", default="./exp", type=str)
    return p


def args_to_config(args) -> SEDTConfig:
    if args.dataname == "urbansed":
        feats = C.FeatureConfig.urbansed()
        classes = C.URBAN_CLASSES
        max_frames = feats.urban_max_frames
        num_queries = args.num_queries if args.num_queries != 20 else 10
    else:
        feats = C.FeatureConfig.dcase()
        classes = C.DCASE_CLASSES
        max_frames = feats.max_frames
        # dataset override (train_sedt.py:151-152); smoke runs keep the flag
        num_queries = args.num_queries if args.synthetic_smoke else 20
    if args.synthetic_smoke:
        # small geometry for smoke runs
        max_frames = 128
        feats = dataclasses.replace(feats, n_mels=64)
    model = C.ModelConfig(
        backbone=args.backbone,
        dilation=args.dilation,
        position_embedding=args.position_embedding,
        hidden_dim=args.hidden_dim,
        nheads=args.nheads,
        dim_feedforward=args.dim_feedforward,
        enc_layers=args.enc_layers,
        dec_layers=args.dec_layers,
        dropout=args.dropout,
        pre_norm=args.pre_norm,
        num_classes=args.num_classes,
        num_queries=num_queries,
        aux_loss=args.aux_loss,
        dec_at=args.dec_at,
        pooling=args.pooling,
        self_sup=args.self_sup,
        compute_dtype=getattr(args, "compute_dtype", "float32"),
        feature_recon=args.feature_recon,
        query_shuffle=args.query_shuffle,
        num_patches=args.num_patches,
        max_frames=max_frames,
        n_mels=feats.n_mels,
    )
    loss = C.LossConfig(
        set_cost_class=args.set_cost_class,
        set_cost_bbox=args.set_cost_bbox,
        set_cost_giou=args.set_cost_giou,
        ce_loss_coef=args.ce_loss_coef,
        bbox_loss_coef=args.bbox_loss_coef,
        giou_loss_coef=args.giou_loss_coef,
        weak_loss_coef=args.weak_loss_coef,
        weak_loss_p_coef=args.weak_loss_p_coef,
        eos_coef=args.eos_coef,
        epsilon=args.epsilon,
        alpha=args.alpha,
    )
    data = C.DataConfig(
        dataset_name=args.dataname,
        root=args.data_root,
        exp_root=args.exp_root,
        classes=classes[: args.num_classes],
        batch_size=args.batch_size,
        n_weak=args.n_weak,
        nb_files=args.nb_files,
        max_strong_clips=getattr(args, "max_strong_clips", None),
    )
    aug = C.AugmentConfig(
        mix_up_ratio=args.mix_up_ratio,
        time_mask=args.time_mask,
        freq_mask=args.freq_mask,
        freq_shift=args.freq_shift,
    )
    train = C.TrainConfig(
        lr=args.lr,
        lr_backbone=args.lr_backbone,
        weight_decay=args.weight_decay,
        epochs=args.epochs,
        epochs_ls=args.epochs_ls,
        lr_drop=args.lr_drop,
        adjust_lr=args.adjust_lr,
        clip_max_norm=args.clip_max_norm,
        accumulating_gradient_steps=args.accumrating_gradient_steps,
        accumlating_ema_steps=args.accumlating_ema_steps,
        ema_decay=args.ema_decay,
        seed=args.seed,
        checkpoint_epochs=args.checkpoint_epochs or None,
        eval_interval=getattr(args, 'eval_interval', 1),
        fusion_strategy=tuple(args.fusion_strategy),
        fine_tune=args.fine_tune,
        normalize=args.normalize,
        focal_loss=args.focal_loss,
        info=args.info or f"{args.dataname}_sedt",
    )
    return SEDTConfig(
        features=feats, model=model, loss=loss, data=data, augment=aug, train=train
    )


# ---------------------------------------------------------------------------
# data assembly
# ---------------------------------------------------------------------------


def build_synthetic_data(cfg: SEDTConfig, args) -> Dict:
    """Synthetic train/validation datasets + encoder (smoke path).

    dcase mode mirrors the reference's [synthetic-strong, weak] stream layout
    (train_sedt.py:213-216) so the weak-loss path is exercised end to end.
    """
    classes = list(cfg.data.classes)
    enc = BoxEncoder(classes, seconds=cfg.features.max_len_seconds)
    frames, mels = cfg.model.max_frames, cfg.model.n_mels
    num_patches = cfg.model.num_patches if cfg.model.self_sup else None
    mk = lambda n, seed, **kw: SyntheticDataset(
        n, classes, frames, mels, enc.encode_strong_df,
        max_events=min(3, cfg.model.max_events),
        seconds=cfg.features.max_len_seconds, seed=seed,
        num_patches=num_patches, **kw,
    )
    if cfg.data.dataset_name == "dcase" and cfg.data.n_weak > 0 and not cfg.model.self_sup:
        strong = mk(args.smoke_clips, 0)
        weak = mk(max(cfg.data.n_weak * 2, 4), 2, weak_only=True)
        train = ConcatDataset([strong, weak])
    else:
        train = mk(args.smoke_clips, 0)
    valid = mk(max(8, args.smoke_clips // 4), 1)
    return {
        "train": train,
        "validation": valid,
        "eval": valid,
        "encoder": enc,
        "ref_valid": valid.ref_df(),
        "ref_eval": valid.ref_df(),
    }


def cap_strong_clips(df, n: int):
    """Keep only the first ``n`` distinct clips of a strong-label DataFrame.

    The label-scarcity knob for semi-supervised controls: unlike the
    reference's ``nb_files`` (SedData.py:420-445), which subsets every
    split, this caps ONLY the strong (synthetic) training split so the
    weak/unlabel/validation/eval splits stay identical between a supervised
    control and its semi-supervised counterpart.  Clip order is the TSV's
    (deterministic), so two runs with the same ``n`` see the same subset.
    """
    keep = set(df["filename"].drop_duplicates().iloc[:n])
    return df[df["filename"].isin(keep)].reset_index(drop=True)


def build_real_data(cfg: SEDTConfig, args) -> Dict:
    """TSV-backed datasets (reference train_sedt.py:163-224)."""
    from .data.features import SedData, get_dfs

    root = osp.join(cfg.data.root, cfg.data.dataset_name)
    ds = SedData(cfg.data.dataset_name, base_feature_dir=osp.join(root, "features"),
                 compute_log=False)
    if cfg.data.dataset_name == "urbansed":
        paths = {
            "train": osp.join(root, "metadata", "train.tsv"),
            "validation": osp.join(root, "metadata", "validate.tsv"),
            "eval": osp.join(root, "metadata", "test.tsv"),
        }
    else:
        paths = {
            "weak": osp.join(root, "metadata", "train", "weak.tsv"),
            "synthetic": osp.join(
                root, "metadata", "train", "synthetic_2019", "soundscapes.tsv"
            ),
            "validation": osp.join(root, "metadata", "validation", "validation.tsv"),
            "eval": osp.join(root, "metadata", "eval", "public.tsv"),
        }
    # dcase validation audio lives at audio/validation, not the default
    # metadata->audio mapping (reference config.py:26, train_at.py:41)
    audio_dirs = (
        None if cfg.data.dataset_name == "urbansed"
        else {"validation": osp.join(root, "audio", "validation")}
    )
    dfs = get_dfs(ds, paths, nb_files=cfg.data.nb_files, audio_dirs=audio_dirs)
    if cfg.data.max_strong_clips and "synthetic" in dfs:
        dfs["synthetic"] = cap_strong_clips(
            dfs["synthetic"], cfg.data.max_strong_clips
        )
    enc = BoxEncoder(list(cfg.data.classes), seconds=cfg.features.max_len_seconds)

    scaler = Scaler()
    scaler_path = osp.join(cfg.data.exp_root, cfg.data.dataset_name + ".json")
    base_tf = get_transforms(cfg.model.max_frames, None, compute_log=True)
    if cfg.data.dataset_name == "urbansed":
        pre = DataLoadDf(dfs["train"], enc.encode_strong_df, base_tf)
    else:
        pre = ConcatDataset([
            DataLoadDf(dfs["weak"], enc.encode_strong_df, base_tf),
            DataLoadDf(dfs["synthetic"], enc.encode_strong_df, base_tf),
        ])
    if osp.isfile(scaler_path):
        scaler.load(scaler_path)
    else:
        scaler.calculate_scaler(pre)
        os.makedirs(osp.dirname(scaler_path), exist_ok=True)
        scaler.save(scaler_path)

    tf = get_transforms(cfg.model.max_frames, scaler, compute_log=True)
    out = {"encoder": enc, "scaler": scaler}
    # --from_wavs: TRAIN batches carry raw fixed-length waveforms and the
    # wav->logmel->normalize chain runs in-graph on device (VERDICT r4 #5 /
    # SURVEY §7 step 2; engine.make_train_step(frontend_fn=...)).  The .npy
    # cache is still built above (it feeds the scaler and the eval splits).
    from_wavs = bool(getattr(args, "from_wavs", False))
    if from_wavs:
        n_samples = int(cfg.features.max_len_seconds * ds.fc.sample_rate)
        mk_train = lambda df: WavLoadDf(
            df, enc.encode_strong_df, n_samples=n_samples,
            sr=ds.fc.sample_rate, in_memory=cfg.data.in_memory,
        )
        out["frontend"] = dict(
            sr=ds.fc.sample_rate, n_fft=ds.fc.n_fft, n_window=ds.fc.n_window,
            hop=ds.fc.hop_size, n_mels=ds.fc.n_mels,
            scaler_mean=scaler.mean_, scaler_std=scaler.std_,
        )
    else:
        cache = cfg.data.in_memory  # post-transform cache (see DataLoadDf)
        mk_train = lambda df: DataLoadDf(
            df, enc.encode_strong_df, tf,
            in_memory=cfg.data.in_memory, cache_transformed=cache,
        )
    cache = cfg.data.in_memory
    if cfg.data.dataset_name == "urbansed":
        out["train"] = mk_train(dfs["train"])
    else:
        out["train"] = ConcatDataset(
            [mk_train(dfs["synthetic"]), mk_train(dfs["weak"])]
        )
    out["validation"] = DataLoadDf(dfs["validation"], enc.encode_strong_df,
                                   tf, cache_transformed=cache)
    out["eval"] = DataLoadDf(dfs["eval"], enc.encode_strong_df, tf,
                             cache_transformed=cache)
    drop = ["feature_filename", "wav_filename"]
    out["ref_valid"] = dfs["validation"].drop(columns=drop, errors="ignore")
    out["ref_eval"] = dfs["eval"].drop(columns=drop, errors="ignore")
    return out


# ---------------------------------------------------------------------------
# evaluation loop
# ---------------------------------------------------------------------------


def evaluate(
    eval_step,
    state: TrainState,
    dataset,
    cfg: SEDTConfig,
    decoder: BoxEncoder,
    ref_df,
    fusion_strategy: Sequence[int],
    at: bool = True,
    cal_seg: bool = False,
    cal_clip: bool = False,
    batch_size: Optional[int] = None,
    psds_thresholds: Optional[Sequence[float]] = None,
    weight_dict: Optional[Dict[str, float]] = None,
    bank=None,
    loss_means_out: Optional[Dict] = None,
    roc_curves: Optional[str] = None,
) -> Dict[int, float]:
    """Full eval: jitted forward+postprocess, host decode, native metrics
    (reference engine.py:199-297).

    When ``weight_dict`` is given, the per-batch criterion losses computed on
    device are accumulated and logged as "Val averaged stats" (reference
    engine.py:246-257,293).  Padded tail rows are masked out of the loss
    computation and each batch is weighted by its real-row count, so the
    means are independent of tail padding (pinned by tests/test_eval_exact.py).
    Box-normalized terms are still per-batch ``num_boxes`` means (the
    reference's semantics, engine.py:251-257), so with variable events-per-clip
    they remain weakly batch-composition dependent — same as the reference.
    """
    import pandas as pd

    from .parallel.distribute import get_reduced_loss
    from .utils.meters import DeviceMetricAccumulator, MetricLogger

    log = create_logger(__name__ + "/evaluate")
    bs = batch_size or cfg.data.batch_size
    # Checkpoint-restored params are host numpy trees; passed to the jitted
    # eval_step they re-upload ~330 MB EVERY batch (measured: a post-compile
    # 1,024-clip final-test eval took 133 s vs 2 s with device-resident
    # params through the axon tunnel).  Move numpy leaves on device once;
    # committed/sharded jax.Arrays pass through untouched.
    _dev = lambda t: jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, t
    )
    state = state._replace(params=_dev(state.params), frozen=_dev(state.frozen))
    loss_acc = DeviceMetricAccumulator() if weight_dict is not None else None
    audio_tag_rows = []
    dec_rows: Dict[int, List] = {m: [] for m in fusion_strategy}
    raw: Dict[int, List] = {m: [] for m in fusion_strategy}  # for PSDS OPs
    filenames = dataset.filenames
    t0 = time.time()
    for batch in batch_iterator(
        dataset, bs, cfg.model.max_events, cfg.features.max_len_seconds,
        return_indexes=True, prefetch=True, bank=bank,
    ):
        if bank is not None:  # fill feats from HBM (padded -1 rows clamp)
            batch = batch._replace(
                feats=bank.gather(np.maximum(np.asarray(batch.indexes), 0))
            )
        idxs = np.asarray(batch.indexes)
        valid = idxs >= 0  # padded tail rows carry index -1
        res = eval_step(state.params, state.frozen, batch, jnp.asarray(valid))
        if loss_acc is not None:
            # weight by real rows -> exact dataset means despite tail padding
            loss_acc.update(res["losses"], weight=float(valid.sum()))
        if at and "at" in res:
            tags = np.asarray(res["at"]) > 0.5
            for j, row in enumerate(tags):
                if idxs[j] < 0:  # padded tail row
                    continue
                for lbl in decoder.decode_weak(row.astype(int)):
                    audio_tag_rows.append(
                        dict(filename=filenames.iloc[idxs[j]], event_label=lbl,
                             onset=0, offset=0)
                    )
        for m in fusion_strategy:
            pp = res[f"pp_{m}"]
            scores = np.asarray(pp.scores)
            labels = np.asarray(pp.labels)
            boxes = np.asarray(pp.boxes)
            if psds_thresholds is not None:
                raw[m].append((scores, labels, boxes, idxs.copy()))
            for j, pred in decoder.decode_strong_batch(
                scores, labels, boxes, threshold=0.5
            ).items():
                if idxs[j] < 0:  # padded tail row
                    continue
                for lbl, on, off, sc in pred:
                    dec_rows[m].append(
                        dict(
                            filename=filenames.iloc[idxs[j]],
                            onset=float(np.clip(on, 0, cfg.features.max_len_seconds)),
                            offset=float(np.clip(off, 0, cfg.features.max_len_seconds)),
                            event_label=lbl,
                            score=float(sc),
                        )
                    )
    log.info(f"eval forward+decode in {time.time() - t0:.1f}s")

    if loss_acc is not None and loss_acc.steps:
        means, _ = loss_acc.means()
        if loss_means_out is not None:
            loss_means_out.update(means)
        vlog = MetricLogger(delimiter="  ")
        get_reduced_loss(means, weight_dict, vlog)
        log.info("Val averaged stats:\n" + str(vlog))

    at_df = pd.DataFrame(
        audio_tag_rows, columns=["filename", "event_label", "onset", "offset"]
    )
    if at and not at_df.empty:
        clip_metric = audio_tagging_results(ref_df, at_df)
        log.info(f"AT class-wise clip metrics\n{'=' * 50}\n{clip_metric}")

    metrics = {}
    for m in fusion_strategy:
        pred_df = pd.DataFrame(
            dec_rows[m],
            columns=["filename", "onset", "offset", "event_label", "score"],
        )
        log.info(f"Fusion strategy: {m} ({len(pred_df)} events)")
        metrics[m] = compute_metrics(
            pred_df, ref_df, cal_seg=cal_seg, cal_clip=cal_clip
        )
        if psds_thresholds is not None:
            # PSDS over multiple decode-threshold operating points
            # (reference metrics.py:325-330 / psds_score, never wired into
            # the reference CLIs; available here via --psds)
            from .metrics import PSDSEval, psds_score

            meta = pd.DataFrame(
                {"filename": ref_df.filename.unique(),
                 "duration": cfg.features.max_len_seconds}
            )
            psds = PSDSEval(ground_truth=ref_df, metadata=meta)
            for thr in psds_thresholds:
                rows = []
                for scores, labels, boxes, idxs in raw[m]:
                    for j, pred in decoder.decode_strong_batch(
                        scores, labels, boxes, threshold=thr
                    ).items():
                        if idxs[j] < 0:
                            continue
                        for lbl, on, off, sc in pred:
                            rows.append(
                                (filenames.iloc[idxs[j]],
                                 float(np.clip(on, 0, cfg.features.max_len_seconds)),
                                 float(np.clip(off, 0, cfg.features.max_len_seconds)),
                                 lbl)
                            )
                psds.add_operating_point(
                    pd.DataFrame(rows, columns=["filename", "onset", "offset",
                                                "event_label"])
                )
            log.info(f"PSDS over {len(psds_thresholds)} operating points:")
            psds_score(psds, filename_roc_curves=roc_curves)
    return metrics


# ---------------------------------------------------------------------------
# supervised training driver
# ---------------------------------------------------------------------------


def _imagenet_backbone_init(params, frozen, args, log):
    """ImageNet backbone initialization (reference backbone.py:98-112,
    ``pretrained=is_main_process()`` — the published F1 numbers depend on it).

    Loads a torchvision ``.pth`` from ``--imagenet_backbone``, falling back to
    ``<data_root>/<backbone>.pth``; warns loudly when training from scratch.
    Returns the (possibly updated) ``(params, frozen)`` trees.
    """
    path = getattr(args, "imagenet_backbone", None)
    if not path:
        auto = osp.join(args.data_root, f"{args.backbone}.pth")
        path = auto if osp.isfile(auto) else None
    if not path:
        log.warning(
            "backbone trains FROM SCRATCH — no ImageNet checkpoint found; "
            "pass --imagenet_backbone <torchvision .pth> (or drop "
            f"{args.backbone}.pth into {args.data_root}) to match the "
            "reference's pretrained initialization"
        )
        return params, frozen
    from .models.torch_import import load_imagenet_backbone

    params, frozen = load_imagenet_backbone(params, frozen, path)
    log.info(f"initialized backbone from ImageNet weights: {path}")
    return params, frozen


def run_supervised(args) -> Dict[int, float]:
    """train_sedt flow (reference train_sedt.py:132-361)."""
    cfg = args_to_config(args)
    if args.log:
        set_logger(cfg.train.info)
    log = create_logger("train_sedt")
    log.info("Sound Event Detection Transformer (TPU)")
    np.random.seed(cfg.train.seed)

    data = (
        build_synthetic_data(cfg, args)
        if args.synthetic_smoke
        else build_real_data(cfg, args)
    )
    enc = data["encoder"]
    store_dir = osp.join(cfg.data.exp_root, cfg.data.dataset_name)
    model_dir = osp.join(store_dir, "model")
    os.makedirs(model_dir, exist_ok=True)
    if getattr(args, "back_up", False):
        from .utils.checkpoint import back_up_code

        back_up_code(store_dir, cfg.train.info)

    # batch composition (train_sedt.py:197-222)
    concat = (
        data["train"]
        if isinstance(data["train"], ConcatDataset)
        else ConcatDataset([data["train"]])
    )
    if len(concat.datasets) == 2:
        batch_sizes = [cfg.data.batch_size - cfg.data.n_weak, cfg.data.n_weak]
    else:
        batch_sizes = [cfg.data.batch_size]
    sampler = MultiStreamBatchSampler(concat, batch_sizes, seed=cfg.train.seed)
    steps_per_epoch = max(len(sampler), 1)

    model, weight_dict = build_model(cfg)
    rng = jax.random.PRNGKey(cfg.train.seed)
    B, T, F = cfg.data.batch_size, cfg.model.max_frames, cfg.model.n_mels
    tx = make_optimizer(_init_params(model, cfg, rng), cfg.train, steps_per_epoch)
    from .engine import init_train_state

    state = init_train_state(model, cfg, tx, rng, (B, T, F))
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    log.info(f"number of parameters in the model: {n_params}")

    p2, f2 = _imagenet_backbone_init(state.params, state.frozen, args, log)
    state = state._replace(params=p2, frozen=f2)

    start_epoch = 0
    if args.pretrain:
        pre = load_checkpoint(osp.join(model_dir, args.pretrain))
        state = state._replace(
            params=load_pretrain_into(state.params, pre["params"])
        )
        log.info("loaded self-supervised pretrain weights")
    if args.resume:
        from flax import serialization

        ck = load_checkpoint(osp.join(model_dir, args.resume))
        opt_state = state.opt_state
        if "opt_state" in ck:  # full resume incl. optimizer (train_sedt.py:272-273)
            opt_state = serialization.from_state_dict(opt_state, ck["opt_state"])
        state = state._replace(
            params=serialization.from_state_dict(state.params, ck["params"]),
            frozen=serialization.from_state_dict(state.frozen, ck["frozen"]),
            opt_state=opt_state,
        )
        start_epoch = int(ck.get("epoch", 0))
        log.info(f"resumed from epoch {start_epoch}")

    # --from_wavs: fuse the waveform->logmel frontend into the train step
    # (engine.py:138-143); training batches then carry [B, n_samples] audio
    frontend_fn = None
    if data.get("frontend") is not None:
        from .ops.frontend import make_frontend_fn

        frontend_fn = make_frontend_fn(
            max_frames=cfg.model.max_frames, compute_log=True,
            **data["frontend"],
        )
        log.info("fused in-graph waveform frontend (--from_wavs)")
    train_step = make_train_step(
        model, weight_dict, cfg, tx,
        fine_tune=cfg.train.fine_tune, normalize=cfg.train.normalize,
        fl=cfg.train.focal_loss, frontend_fn=frontend_fn,
    )
    eval_step = make_eval_step(model, weight_dict, cfg, cfg.train.fusion_strategy)

    # SPMD data parallelism over all local devices (replaces DDP,
    # SURVEY.md §2.2); single-device runs skip the mesh entirely.
    mesh = None
    if jax.device_count() > 1 and cfg.data.batch_size % jax.device_count() == 0:
        mesh = make_mesh(C.MeshConfig())
        from .parallel.mesh import replicated

        put_rep = lambda tree: jax.device_put(
            tree, jax.tree.map(lambda _: replicated(mesh), tree)
        )
        state = TrainState(
            put_rep(state.params), put_rep(state.frozen),
            put_rep(state.opt_state), state.step,
        )
        log.info(f"data-parallel mesh: {dict(mesh.shape)}")

    # Device-resident feature banks: the whole dataset's post-transform
    # features live in HBM and each step/eval batch is gathered in-graph —
    # the measured real-data loop was transfer-bound through the tunnel
    # (~0.5 s of a ~0.6 s step shipping 8 MB of spectrograms; see
    # data/feature_bank.py).
    from .data.feature_bank import maybe_bank

    # wav mode measures the STREAMING path (host ships raw audio each step);
    # banking waveforms in HBM would fold it back into the gather design
    train_bank = (
        None if frontend_fn is not None
        else maybe_bank(args, concat, cfg, mesh=mesh, log=log)
    )
    valid_bank = maybe_bank(args, data["validation"], cfg, log=log)
    evalset_bank = (
        maybe_bank(args, data["eval"], cfg, log=log)
        if data.get("eval") is not None else None
    )

    best_saver = {m: SaveBest("sup") for m in cfg.train.fusion_strategy}
    early = EarlyStopping(
        patience=cfg.train.early_stopping_patience,
        init_patience=cfg.train.early_stopping_init_wait,
        fusion_strategy=cfg.train.fusion_strategy,
    )
    info = cfg.train.info
    fine_tune = cfg.train.fine_tune
    metrics: Dict[int, float] = {}

    for epoch in range(start_epoch, args.epochs):
        if epoch == args.epochs_ls:
            log.info("entering the fine-tuning stage")
            best_path = osp.join(model_dir, f"{info}_1_best")
            if osp.exists(best_path):
                ck = load_checkpoint(best_path)
                state = state._replace(params=ck["params"], frozen=ck["frozen"])
            tx = make_optimizer(
                state.params, cfg.train, steps_per_epoch, fixed_lr=1e-5
            )
            state = state._replace(opt_state=tx.init(state.params))
            fine_tune = True
            train_step = make_train_step(
                model, weight_dict, cfg, tx, fine_tune=True,
                normalize=cfg.train.normalize, fl=cfg.train.focal_loss,
                frontend_fn=frontend_fn,
            )
            info = info + "_ft"

        from .parallel.distribute import get_reduced_loss
        from .utils.meters import DeviceMetricAccumulator, Heartbeat, MetricLogger
        from .utils.profiler import StepTimer

        t0 = time.time()
        timer = StepTimer()
        hb = Heartbeat(log.info, steps_per_epoch)
        # per-term scaled+unscaled meters + lr, as the reference logs each
        # epoch (engine.py:39-95, utils.py:338-436).  Metrics accumulate ON
        # DEVICE and transfer once per epoch — a per-step fetch is a ~40 ms
        # host barrier on this backend and would halve train throughput
        # (see DeviceMetricAccumulator).
        mlog = MetricLogger(delimiter="  ")
        acc = DeviceMetricAccumulator()
        lr_now = (
            1e-5 if epoch >= args.epochs_ls
            else cfg.train.lr if not cfg.train.adjust_lr
            else cfg.train.lr * cfg.train.lr_drop_gamma ** (epoch // cfg.train.lr_drop)
        )
        for i, batch in enumerate(
            batch_iterator(concat, iter(sampler), cfg.model.max_events,
                           cfg.features.max_len_seconds,
                           to_device=mesh is None, bank=train_bank)
        ):
            timer.data_loaded()
            rng, sk = jax.random.split(rng)
            idx = batch.indexes
            if train_bank is not None:
                batch = batch._replace(indexes=None)
            if mesh is not None:
                batch = shard_batch_pytree(batch, mesh)
            if train_bank is not None:
                batch = batch._replace(
                    feats=train_bank.gather(np.maximum(idx, 0))
                )
            state, m = train_step(state, batch, sk)
            acc.update(m)  # device-side sum, fully async
            timer.step_done()
            hb.tick(i)
            # periodic finiteness probe: bound wasted compute on long epochs
            # (one ~40 ms fetch per 500 steps; the epoch-end check remains
            # the backstop)
            if (i + 1) % 500 == 0 and not np.isfinite(float(m["loss"])):
                log.info("Loss is not finite (mid-epoch probe), stopping")
                raise SystemExit(1)
        means, n_steps = acc.means()  # single fetch; also the epoch barrier
        loss_mean = means.pop("loss", float("nan"))
        class_error = means.pop("class_error", 0.0)
        get_reduced_loss(means, weight_dict, mlog)
        # class_error logged as its own meter (reference engine.py:66-69)
        mlog.update(loss=loss_mean, class_error=class_error, lr=lr_now)
        mlog.synchronize_between_processes()
        log.info(
            f"Epoch {epoch}: loss {loss_mean:.4f} "
            f"({n_steps} steps, {time.time() - t0:.1f}s) {timer.summary()}"
        )
        log.info("Train averaged stats:\n" + str(mlog))
        if not np.isfinite(loss_mean):
            # NaN propagates through the epoch sum (reference engine.py:70-73
            # aborts mid-epoch; the end-of-epoch check avoids per-step syncs)
            log.info(f"Loss is {loss_mean}, stopping training")
            raise SystemExit(1)

        if cfg.train.checkpoint_epochs and (epoch + 1) % cfg.train.checkpoint_epochs == 0:
            save_checkpoint(
                osp.join(model_dir, f"{info}_{epoch}"),
                {"params": state.params, "frozen": state.frozen,
                 "opt_state": state.opt_state, "epoch": epoch},
            )
        if (epoch + 1) % cfg.train.eval_interval != 0:
            continue
        log.info("Metric on validation")
        metrics = evaluate(
            eval_step, state, data["validation"], cfg, enc, data["ref_valid"],
            cfg.train.fusion_strategy, at=cfg.model.dec_at,
            weight_dict=weight_dict, bank=valid_bank,
        )
        stop = False
        for m, f1 in metrics.items():
            if best_saver[m].apply(f1):
                # no opt_state: every consumer of a *_best checkpoint (the
                # epochs_ls fine-tune reload above, the final test, the semi
                # teacher init) reads only params/frozen, and --resume
                # tolerates its absence.  The AdamW moments double the
                # device->host fetch (~330 MB extra, ~50 s through the axon
                # tunnel per improving eval); periodic checkpoints below keep
                # the full resume state.
                save_checkpoint(
                    osp.join(model_dir, f"{info}_{m}_best"),
                    {"params": state.params, "frozen": state.frozen,
                     "epoch": epoch, f"event_based_f1_{m}": f1},
                )
            if early.apply(f1):
                log.warning("EARLY STOPPING")
                stop = True
        if stop:
            break

    # final test (train_sedt.py:344-361)
    for m in cfg.train.fusion_strategy:
        best_path = osp.join(model_dir, f"{info}_{m}_best")
        if osp.exists(best_path):
            ck = load_checkpoint(best_path)
            state = state._replace(params=ck["params"], frozen=ck["frozen"])
        log.info("Metric on validation")
        evaluate(eval_step, state, data["validation"], cfg, enc,
                 data["ref_valid"], [m], at=cfg.model.dec_at, cal_seg=True,
                 cal_clip=True, bank=valid_bank)
        log.info("Metric on eval")
        metrics = evaluate(
            eval_step, state, data["eval"], cfg, enc, data["ref_eval"], [m],
            at=cfg.model.dec_at, cal_seg=True, cal_clip=True,
            psds_thresholds=(
                tuple(np.arange(0.1, 1.0, 0.1)) if getattr(args, "psds", False)
                else None
            ),
            bank=evalset_bank,
            roc_curves=getattr(args, "roc_curves", None),
        )
    return metrics


def _init_params(model, cfg: SEDTConfig, rng):
    B, T, F = 1, cfg.model.max_frames, cfg.model.n_mels
    feats = jnp.zeros((B, T, F, 1), jnp.float32)
    pad = jnp.zeros((B, T), bool)
    # jitted init (eager init is minutes of per-op latency over the tunnel)
    if cfg.model.self_sup:
        patches = jnp.zeros((B, cfg.model.num_patches, 128, 64, 1), jnp.float32)
        v = jax.jit(
            lambda r, f, p, pt: model.init(
                {"params": r, "dropout": r, "patch_mask": r}, f, p, pt, True
            )
        )(rng, feats, pad, patches)
    else:
        v = jax.jit(
            lambda r, f, p: model.init({"params": r, "dropout": r}, f, p, True)
        )(rng, feats, pad)
    return v["params"]


# ---------------------------------------------------------------------------
# SP-SEDT self-supervised pretraining driver
# ---------------------------------------------------------------------------


def run_spsedt(args) -> None:
    """train_spsedt flow (reference train_spsedt.py:31-200): unlabeled data,
    patch queries, checkpoint-only loop (no validation), SPMD data parallel
    over the device mesh replacing DDP (train_spsedt.py:157-158)."""
    args.self_sup = True
    args.dec_at = False
    args.lr_backbone = 0.0  # backbone frozen during pretraining
    cfg = args_to_config(args)
    if args.log:
        set_logger(cfg.train.info)
    log = create_logger("train_spsedt")
    log.info("SP-SEDT self-supervised pretraining")
    np.random.seed(cfg.train.seed)

    store_dir = osp.join(cfg.data.exp_root, cfg.data.dataset_name)
    model_dir = osp.join(store_dir, "model")
    os.makedirs(model_dir, exist_ok=True)

    if args.synthetic_smoke:
        from .data.synthetic import SyntheticDataset

        enc = BoxEncoder(1, seconds=cfg.features.max_len_seconds,
                         generate_patch=True)
        train_data = SyntheticDataset(
            args.smoke_clips, list(cfg.data.classes), cfg.model.max_frames,
            cfg.model.n_mels, enc.encode_strong_df, max_events=2, seed=0,
            unlabel=True, num_patches=cfg.model.num_patches,
            fixed_patch_size=args.fixed_patch_size, device_patches=True,
        )
    else:
        from .data.features import SedData

        root = osp.join(cfg.data.root, cfg.data.dataset_name)
        ds = SedData(cfg.data.dataset_name,
                     base_feature_dir=osp.join(root, "features"), compute_log=False)
        unlabel_df = ds.initialize_and_get_df(
            osp.join(root, "metadata", "train", "unlabel_in_domain.tsv"),
            nb_files=cfg.data.nb_files,
        )
        if getattr(args, "extra_data", False):
            # dcase2018 task5 extra pretraining data
            # (reference train_spsedt.py:23-28, config.py:22)
            import pandas as pd

            extra_df = ds.initialize_and_get_df(
                osp.join(root, "metadata", "train", "dcase2018_task5.tsv"),
                nb_files=cfg.data.nb_files,
            )
            unlabel_df = pd.concat([unlabel_df, extra_df], ignore_index=True)
            log.info(f"extra dcase2018-task5 pretrain data: {len(extra_df)} rows")
        enc = BoxEncoder(1, seconds=cfg.features.max_len_seconds,
                         generate_patch=True)
        scaler = Scaler()
        scaler_path = osp.join(cfg.data.exp_root, cfg.data.dataset_name + ".json")
        base_tf = get_transforms(cfg.model.max_frames, None, compute_log=True)
        pre = DataLoadDf(unlabel_df, enc.encode_strong_df, base_tf)
        if osp.isfile(scaler_path):
            scaler.load(scaler_path)
        else:
            scaler.calculate_scaler(pre)
            os.makedirs(osp.dirname(scaler_path), exist_ok=True)
            scaler.save(scaler_path)
        tf = get_transforms(cfg.model.max_frames, scaler, compute_log=True)
        train_data = DataLoadDf(
            unlabel_df, enc.encode_strong_df, tf, in_memory=cfg.data.in_memory,
            num_patches=cfg.model.num_patches,
            fixed_patch_size=args.fixed_patch_size, device_patches=True,
        )

    model, weight_dict = build_model(cfg)
    rng = jax.random.PRNGKey(cfg.train.seed)
    params = _init_params(model, cfg, rng)
    steps_per_epoch = max(len(train_data) // cfg.data.batch_size, 1)
    tx = make_optimizer(params, cfg.train, steps_per_epoch)
    from .engine import init_train_state

    state = init_train_state(
        model, cfg, tx, rng,
        (cfg.data.batch_size, cfg.model.max_frames, cfg.model.n_mels),
        patches_shape=(cfg.data.batch_size, cfg.model.num_patches, 128, 64, 1),
    )
    log.info(
        f"params: {sum(x.size for x in jax.tree.leaves(state.params))}"
    )
    p2, f2 = _imagenet_backbone_init(state.params, state.frozen, args, log)
    state = state._replace(params=p2, frozen=f2)
    if args.pretrain:  # audio-tag backbone init (train_spsedt.py:133-142)
        from .utils.checkpoint import load_audio_tag_backbone

        at_ck = load_checkpoint(osp.join(model_dir, args.pretrain))
        state = state._replace(
            params=load_audio_tag_backbone(state.params, at_ck["params"])
        )
        log.info("initialized backbone from audio-tag checkpoint")
    start_epoch = 0
    if args.resume:
        ck = load_checkpoint(osp.join(model_dir, args.resume))
        state = state._replace(params=ck["params"], frozen=ck["frozen"])
        start_epoch = int(ck.get("epoch", 0))

    train_step = make_train_step(model, weight_dict, cfg, tx, augment_on=False)
    from .parallel.mesh import process_is_main, replicated

    mesh = None
    if jax.device_count() > 1 and cfg.data.batch_size % jax.device_count() == 0:
        mesh = make_mesh(C.MeshConfig())
        put_rep = lambda tree: jax.device_put(
            tree, jax.tree.map(lambda _: replicated(mesh), tree)
        )
        state = TrainState(
            put_rep(state.params), put_rep(state.frozen),
            put_rep(state.opt_state), state.step,
        )
        log.info(f"data-parallel mesh: {dict(mesh.shape)} (replaces DDP)")

    from .utils.meters import DeviceMetricAccumulator

    # Device-resident feature bank: ship indices, not spectrograms.  The
    # pretrain recipe (batch 200) pays ~25 MB of host->device feature
    # transfer per step through the tunnel; with the bank the whole dataset
    # sits in HBM once and each step gathers its batch in-graph
    # (data/feature_bank.py).  Falls back to the host stream when the bank
    # would not comfortably fit or when running multi-host.
    from .data.feature_bank import maybe_bank

    bank = maybe_bank(args, train_data, cfg, mesh=mesh, log=log)

    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        acc = DeviceMetricAccumulator()  # device-side sums, one fetch/epoch
        order = np.random.permutation(len(train_data))
        nb = len(order) // cfg.data.batch_size
        index_batches = [
            order[b * cfg.data.batch_size : (b + 1) * cfg.data.batch_size].tolist()
            for b in range(nb)
        ]
        # NO prefetch thread here, deliberately: at the pretrain recipe
        # geometry (batch 200) a producer thread measured 1.5-2x SLOWER than
        # the plain loop (GIL contention with dispatch; jit's async dispatch
        # already overlaps host collate with device compute).  The heavy
        # patch tensor no longer crosses the host boundary at all — crops
        # are gathered in-graph from the target boxes (ops/patches.py).
        from .utils.meters import Heartbeat

        hb = Heartbeat(log.info, nb)
        for i, batch in enumerate(batch_iterator(
            train_data, index_batches, cfg.model.max_events,
            cfg.features.max_len_seconds, to_device=False, prefetch=False,
            bank=bank,
        )):
            # patch boxes ARE the targets in self-sup (labels all 0)
            rng, sk = jax.random.split(rng)
            idx = batch.indexes
            if bank is not None:
                batch = batch._replace(indexes=None)
            if mesh is not None:
                batch = shard_batch_pytree(batch, mesh)
            if bank is not None:
                batch = batch._replace(feats=bank.gather(idx))
            state, m = train_step(state, batch, sk)
            acc.update({"loss": m["loss"]})
            hb.tick(i)
            if (i + 1) % 500 == 0 and not np.isfinite(float(m["loss"])):
                log.info("Loss is not finite (mid-epoch probe), stopping")
                raise SystemExit(1)
        loss_mean = acc.means()[0].get("loss", float("nan"))
        log.info(
            f"Epoch {epoch}: loss {loss_mean:.4f} ({nb} steps, "
            f"{time.time() - t0:.1f}s)"
        )
        if not np.isfinite(loss_mean):
            log.info("Loss is not finite, stopping")
            raise SystemExit(1)
        if (
            process_is_main()
            and cfg.train.checkpoint_epochs
            and (epoch + 1) % cfg.train.checkpoint_epochs == 0
        ):
            save_checkpoint(
                osp.join(model_dir, f"{cfg.train.info}_{epoch}"),
                {"params": state.params, "frozen": state.frozen, "epoch": epoch},
            )
    if process_is_main():
        save_checkpoint(
            osp.join(model_dir, cfg.train.info),
            {"params": state.params, "frozen": state.frozen, "epoch": args.epochs},
        )
        log.info(f"saved final pretrain checkpoint: {cfg.train.info}")


# ---------------------------------------------------------------------------
# semi-supervised mean-teacher driver
# ---------------------------------------------------------------------------


def run_semi(args) -> Dict[int, float]:
    """train_ss_sedt flow (reference train_ss_sedt.py:25-275): batch =
    1/4 synthetic + 1/4 weak + 1/2 unlabeled; teacher/student noise pairs;
    EMA teacher; class-wise threshold adaptation; teacher-vs-student eval."""
    from .config import DCASE_CLASS_PRIOR
    from .engine import adjust_threshold, init_train_state, make_semi_train_step
    from .ops import augment as aug_ops

    cfg = args_to_config(args)
    if args.log:
        set_logger(cfg.train.info)
    log = create_logger("train_ss_sedt")
    log.info("Semi-supervised Learning for SEDT (mean teacher)")
    np.random.seed(cfg.train.seed)

    store_dir = osp.join(cfg.data.exp_root, cfg.data.dataset_name)
    model_dir = osp.join(store_dir, "model")
    os.makedirs(model_dir, exist_ok=True)

    B = args.semi_batch_size
    batch_sizes = [B // 4, B // 4, 2 * B // 4]

    if args.synthetic_smoke:
        classes = list(cfg.data.classes)
        enc = BoxEncoder(classes, seconds=cfg.features.max_len_seconds)
        frames, mels = cfg.model.max_frames, cfg.model.n_mels
        # sizes scale with --smoke_clips (1/4 strong + 1/4 weak + 1/2
        # unlabeled, the reference layout); seeds align with
        # build_synthetic_data (strong 0, weak 2, validation 1) so a
        # supervised baseline trained on the same strong clips is evaluated
        # on the SAME held-out set
        n_strong = max(args.smoke_clips // 4, 4 * batch_sizes[0])
        n_weak = max(args.smoke_clips // 4, 4 * batch_sizes[1])
        n_unlab = max(args.smoke_clips // 2, 4 * batch_sizes[2])
        me = min(3, cfg.model.max_events)  # identical clip statistics to
        # build_synthetic_data, so the supervised baseline's seed-0 strong
        # clips and seed-1 validation set are bit-identical
        synth = SyntheticDataset(n_strong, classes, frames, mels,
                                 enc.encode_strong_df, max_events=me, seed=0)
        weak = SyntheticDataset(n_weak, classes, frames, mels,
                                enc.encode_strong_df, max_events=me, seed=2,
                                weak_only=True)
        unlab = SyntheticDataset(n_unlab, classes, frames, mels,
                                 enc.encode_strong_df, max_events=me, seed=5,
                                 unlabel=True)
        valid = SyntheticDataset(max(16, args.smoke_clips // 4), classes,
                                 frames, mels, enc.encode_strong_df,
                                 max_events=me, seed=1)
        data = {
            "validation": valid, "eval": valid, "encoder": enc,
            "ref_valid": valid.ref_df(), "ref_eval": valid.ref_df(),
        }
        concat = ConcatDataset([synth, weak, unlab])
    else:
        data = build_real_data(cfg, args)
        from .data.features import SedData

        root = osp.join(cfg.data.root, cfg.data.dataset_name)
        ds = SedData(cfg.data.dataset_name,
                     base_feature_dir=osp.join(root, "features"), compute_log=False)
        unlabel_df = ds.initialize_and_get_df(
            osp.join(root, "metadata", "train", "unlabel_in_domain.tsv"),
            nb_files=cfg.data.nb_files,
        )
        enc = data["encoder"]
        tf = get_transforms(cfg.model.max_frames, data["scaler"], compute_log=True)
        unlab = DataLoadDf(unlabel_df, enc.encode_strong_df, tf,
                           in_memory=cfg.data.in_memory,
                           cache_transformed=cfg.data.in_memory)
        # train datasets already built: [synthetic, weak] — rebuild in semi order
        concat = ConcatDataset(list(data["train"].datasets) + [unlab])

    sampler = MultiStreamBatchSampler(concat, batch_sizes, seed=cfg.train.seed)
    steps_per_epoch = max(len(sampler), 1)

    model, weight_dict = build_model(cfg)
    rng = jax.random.PRNGKey(cfg.train.seed)
    params = _init_params(model, cfg, rng)
    tx = make_optimizer(params, cfg.train, steps_per_epoch, schedule="cosine")
    state = init_train_state(
        model, cfg, tx, rng, (B, cfg.model.max_frames, cfg.model.n_mels)
    )

    if args.teacher_model:
        ck = load_checkpoint(osp.join(model_dir, args.teacher_model))
        state = state._replace(params=ck["params"], frozen=ck["frozen"])
        log.info(f"using teacher model: {args.teacher_model}")
    elif not args.synthetic_smoke and not args.eval:
        raise SystemExit("please provide the teacher model (--teacher_model)")
    # the teacher owns distinct buffers (a second param tree, not a view;
    # the semi step deliberately does NOT donate — see engine.py note)
    ema_params = jax.tree.map(jnp.copy, state.params)

    # periodic-checkpoint resume (reference train_ss_sedt.py:161-175 state
    # layout: student + EMA teacher + epoch; plus the adapted thresholds,
    # restored below once initialized).  Must run before the mesh device_put
    # so resumed trees get the replicated sharding.  Restores via
    # from_state_dict against the initialized trees (keeps pytree structure)
    # and includes AdamW moments + step so a watchdog auto-resume does not
    # silently reset the optimizer or the cosine LR schedule.
    start_epoch = 0
    resume_thresholds = None
    resume_policies = None
    if args.resume:
        from flax import serialization

        ck = load_checkpoint(osp.join(model_dir, args.resume))
        opt_state = state.opt_state
        if "opt_state" in ck:
            opt_state = serialization.from_state_dict(opt_state, ck["opt_state"])
        state = state._replace(
            params=serialization.from_state_dict(state.params, ck["params"]),
            frozen=serialization.from_state_dict(state.frozen, ck["frozen"]),
            opt_state=opt_state,
            step=jnp.asarray(int(ck.get("step", 0))),
        )
        if "ema_params" in ck:
            ema_params = serialization.from_state_dict(ema_params, ck["ema_params"])
        resume_thresholds = ck.get("classwise_threshold")
        resume_policies = ck.get("policies")
        start_epoch = int(ck.get("epoch", -1)) + 1
        # don't replay epochs 0..N's exact augmentation/noise key sequence
        rng = jax.random.fold_in(rng, start_epoch)
        log.info(f"resumed from {args.resume} at epoch {start_epoch}")

    semi_step = make_semi_train_step(
        model, weight_dict, cfg, tx, fine_tune=cfg.train.fine_tune,
        normalize=cfg.train.normalize, fl=cfg.train.focal_loss,
        n_labeled=batch_sizes[0] + batch_sizes[1],
    )
    eval_step = make_eval_step(model, weight_dict, cfg, cfg.train.fusion_strategy)

    # per-position stream flags for the fixed batch layout
    pos = np.arange(B)
    strong_flag = jnp.asarray(pos < batch_sizes[0])
    weak_flag = jnp.asarray((pos >= batch_sizes[0]) & (pos < batch_sizes[0] + batch_sizes[1]))
    unlabel_flag = jnp.asarray(pos >= batch_sizes[0] + batch_sizes[1])

    # SPMD data parallelism for the semi step.  The reference semi trainer is
    # single-GPU (train_ss_sedt.py has no DDP hook); sharding here makes the
    # framework's SPMD story uniform.  The fixed 1/4+1/4+1/2 stream layout is
    # mesh-friendly: pjit keeps GLOBAL array semantics, so the per-device
    # stream composition never affects correctness (pinned by
    # tests/test_sharding.py::test_semi_step_dp_matches_single_device).
    from .parallel.mesh import batch_sharding, replicated

    mesh = None
    if jax.device_count() > 1 and B % jax.device_count() == 0:
        mesh = make_mesh(C.MeshConfig())
        put_rep = lambda tree: jax.device_put(
            tree, jax.tree.map(lambda _: replicated(mesh), tree)
        )
        state = TrainState(put_rep(state.params), put_rep(state.frozen),
                           put_rep(state.opt_state), state.step)
        ema_params = put_rep(ema_params)
        fsh = batch_sharding(mesh)
        strong_flag = jax.device_put(strong_flag, fsh)
        weak_flag = jax.device_put(weak_flag, fsh)
        unlabel_flag = jax.device_put(unlabel_flag, fsh)
        log.info(f"semi data-parallel mesh: {dict(mesh.shape)} (replaces DDP)")

    prior = np.asarray(DCASE_CLASS_PRIOR[: cfg.model.num_classes], np.float64)
    prior = prior / prior.sum()
    origin_threshold = np.full((cfg.model.num_classes,), 0.5)
    classwise_threshold = (
        np.asarray(resume_thresholds, np.float64)
        if resume_thresholds is not None
        else origin_threshold.copy()
    )

    best_saver = {m: SaveBest("sup") for m in cfg.train.fusion_strategy}
    early = EarlyStopping(
        patience=cfg.train.early_stopping_patience,
        init_patience=cfg.train.early_stopping_init_wait,
        fusion_strategy=cfg.train.fusion_strategy,
    )
    if resume_policies is not None:  # keep best-score tracking + patience
        for m in cfg.train.fusion_strategy:
            if str(m) in resume_policies.get("best_saver", {}):
                best_saver[m].load_state_dict(resume_policies["best_saver"][str(m)])
        if "early" in resume_policies:
            early.load_state_dict(resume_policies["early"])
    metrics: Dict[int, float] = {}
    a = cfg.augment

    # Device-resident feature bank (see run_supervised): all three streams'
    # features live in HBM; noise pairs / masks already run on device, so
    # the host ships only indices and dense-target scalars per step.
    from .data.feature_bank import maybe_bank

    semi_bank = maybe_bank(args, concat, cfg, mesh=mesh, log=log)
    valid_bank = maybe_bank(args, data["validation"], cfg, log=log)

    from .parallel.distribute import get_reduced_loss
    from .utils.meters import DeviceMetricAccumulator, MetricLogger

    from .utils.meters import Heartbeat

    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        mlog = MetricLogger(delimiter="  ")
        acc = DeviceMetricAccumulator()  # device-side sums, one fetch/epoch
        hb = Heartbeat(log.info, steps_per_epoch)
        for i, batch in enumerate(
            batch_iterator(concat, iter(sampler), cfg.model.max_events,
                           cfg.features.max_len_seconds,
                           unlabel_streams=(2,), to_device=mesh is None,
                           bank=semi_bank)
        ):
            rng, k_noise, k_m1, k_m2, k_m3, k_step = jax.random.split(rng, 6)
            if mesh is not None:
                pad_mask_d, targets_d = shard_batch_pytree(
                    (batch.pad_mask, batch.targets), mesh
                )
                feats = (
                    semi_bank.gather(np.maximum(batch.indexes, 0))
                    if semi_bank is not None
                    else shard_batch_pytree(batch.feats, mesh)
                )
            else:
                feats = (
                    semi_bank.gather(np.maximum(batch.indexes, 0))
                    if semi_bank is not None
                    else jnp.asarray(batch.feats)
                )
                pad_mask_d = jnp.asarray(batch.pad_mask)
                targets_d = jax.tree.map(jnp.asarray, batch.targets)
            teacher_feats, student_feats = aug_ops.gaussian_noise_pair(
                feats, k_noise, snr=cfg.features.noise_snr, p=0.5
            )
            # masks apply to the student copy only (BoxTransforms.py:24-26)
            if a.time_mask:
                student_feats = aug_ops.time_mask(student_feats, k_m1)
            if a.freq_mask:
                student_feats = aug_ops.freq_mask(student_feats, k_m2)
            if a.freq_shift:
                student_feats = aug_ops.freq_shift(student_feats, k_m3)
            do_ema = jnp.asarray((i + 1) % cfg.train.accumlating_ema_steps == 0)
            state, ema_params, m, counts = semi_step(
                state, ema_params, teacher_feats, student_feats,
                pad_mask_d, targets_d,
                strong_flag, weak_flag, unlabel_flag,
                jnp.asarray(classwise_threshold, jnp.float32), k_step, do_ema,
            )
            acc.update({**m, "pseudo_counts": counts})  # async device sums
            hb.tick(i)
            if (i + 1) % 500 == 0 and not np.isfinite(float(m["loss"])):
                log.info("Loss is not finite (mid-epoch probe), stopping")
                raise SystemExit(1)
        totals = acc.totals()  # single fetch; also the epoch barrier
        n_steps = acc.steps
        counts_epoch = totals.pop("pseudo_counts", np.zeros(cfg.model.num_classes))
        means = {k: v / max(n_steps, 1) for k, v in totals.items()}
        loss_mean = means.pop("loss", float("nan"))
        # per-term sup_*/unsup_* meters (reference engine.py:131,166)
        get_reduced_loss(
            means,
            {f"sup_{k}": v for k, v in weight_dict.items()}
            | {f"unsup_{k}": v for k, v in weight_dict.items()},
            mlog,
        )
        mlog.update(loss=loss_mean)
        classwise_threshold = adjust_threshold(
            counts_epoch, origin_threshold, prior
        )
        mlog.synchronize_between_processes()
        log.info(
            f"Epoch {epoch}: loss {loss_mean:.4f} "
            f"({n_steps} steps, {time.time() - t0:.1f}s); "
            f"pseudo counts {counts_epoch.astype(int).tolist()}"
        )
        log.info("Train averaged stats:\n" + str(mlog))
        if not np.isfinite(loss_mean):
            log.info("Loss is not finite, stopping training")
            raise SystemExit(1)

        eval_state = (
            state._replace(params=ema_params) if args.teacher_eval else state
        )
        log.info(
            ("teacher" if args.teacher_eval else "student") + " model validation"
        )
        metrics = evaluate(
            eval_step, eval_state, data["validation"], cfg, data["encoder"],
            data["ref_valid"], cfg.train.fusion_strategy, at=cfg.model.dec_at,
            weight_dict=weight_dict, bank=valid_bank,
        )
        stop = False
        for m_, f1 in metrics.items():
            if best_saver[m_].apply(f1):
                save_checkpoint(
                    osp.join(model_dir, f"{cfg.train.info}_{m_}_best"),
                    {"params": state.params, "ema_params": ema_params,
                     "frozen": state.frozen, "epoch": epoch,
                     f"event_based_f1_{m_}": f1},
                )
            if early.apply(f1):
                log.warning("EARLY STOPPING")
                stop = True
        if (
            cfg.train.checkpoint_epochs
            and (epoch + 1) % cfg.train.checkpoint_epochs == 0
        ):
            save_checkpoint(
                osp.join(model_dir, f"{cfg.train.info}_{epoch}"),
                {"params": state.params, "ema_params": ema_params,
                 "frozen": state.frozen, "epoch": epoch,
                 # full resume state: AdamW moments + step (LR schedule) +
                 # SaveBest/EarlyStopping, so auto-resume == uninterrupted
                 "opt_state": state.opt_state, "step": int(state.step),
                 "classwise_threshold": np.asarray(classwise_threshold),
                 "policies": {
                     "best_saver": {str(m): s.state_dict()
                                    for m, s in best_saver.items()},
                     "early": early.state_dict(),
                 }},
            )
        if stop:
            break

    for m_ in cfg.train.fusion_strategy:
        best_path = osp.join(model_dir, f"{cfg.train.info}_{m_}_best")
        if osp.exists(best_path):
            ck = load_checkpoint(best_path)
            which = "ema_params" if args.teacher_eval else "params"
            state = state._replace(params=ck[which], frozen=ck["frozen"])
            log.info(f"using {'teacher' if args.teacher_eval else 'student'} for test")
        log.info("Metric on validation")
        evaluate(eval_step, state, data["validation"], cfg, data["encoder"],
                 data["ref_valid"], [m_], at=cfg.model.dec_at, cal_seg=True,
                 cal_clip=True, bank=valid_bank)
        log.info("Metric on eval")
        metrics = evaluate(eval_step, state, data["eval"], cfg, data["encoder"],
                           data["ref_eval"], [m_], at=cfg.model.dec_at,
                           cal_seg=True, cal_clip=True)
    return metrics


# ---------------------------------------------------------------------------
# audio-tag backbone trainer
# ---------------------------------------------------------------------------


def run_audio_tag(args) -> float:
    """train_at flow (reference train_at.py:50-249): clip-tagging BCE trainer
    for the backbone used to initialize SP-SEDT."""
    import optax
    import pandas as pd

    from .data.encoder import ManyHotEncoder
    from .models.resnet import AudioTagBackbone

    cfg = args_to_config(args)
    log = create_logger("train_at")
    np.random.seed(cfg.train.seed)
    store_dir = osp.join(cfg.data.exp_root, cfg.data.dataset_name)
    model_dir = osp.join(store_dir, "model")
    os.makedirs(model_dir, exist_ok=True)
    classes = list(cfg.data.classes)
    mhe = ManyHotEncoder(classes, n_frames=cfg.model.max_frames)

    if args.synthetic_smoke:
        enc_weak = mhe.encode_weak
        train_data = SyntheticDataset(
            args.smoke_clips, classes, cfg.model.max_frames, cfg.model.n_mels,
            enc_weak, max_events=2, seed=0, weak_only=True,
        )
        valid = SyntheticDataset(16, classes, cfg.model.max_frames,
                                 cfg.model.n_mels, enc_weak, max_events=2,
                                 seed=1, weak_only=True)
        ref_valid = valid.ref_df()
    else:
        # TSV-backed clip-tagging data (reference train_at.py:179-200):
        # frame transforms + ManyHotEncoder.encode_weak, scaler over the
        # training streams (weak+synthetic for dcase, train for urbansed).
        from .data.features import SedData, get_dfs
        from .data.transforms import get_frame_transforms

        root = osp.join(cfg.data.root, cfg.data.dataset_name)
        ds = SedData(cfg.data.dataset_name,
                     base_feature_dir=osp.join(root, "features"),
                     compute_log=False)
        if cfg.data.dataset_name == "urbansed":
            paths = {
                "train": osp.join(root, "metadata", "train.tsv"),
                "validation": osp.join(root, "metadata", "validate.tsv"),
            }
            train_keys = ["train"]
        else:
            paths = {
                "weak": osp.join(root, "metadata", "train", "weak.tsv"),
                "synthetic": osp.join(
                    root, "metadata", "train", "synthetic_2019",
                    "soundscapes.tsv"),
                "validation": osp.join(
                    root, "metadata", "validation", "validation.tsv"),
            }
            train_keys = ["weak", "synthetic"]
        audio_dirs = (
            None if cfg.data.dataset_name == "urbansed"
            else {"validation": osp.join(root, "audio", "validation")}
        )
        dfs = get_dfs(ds, paths, nb_files=cfg.data.nb_files,
                      audio_dirs=audio_dirs)
        base_tf = get_frame_transforms(cfg.model.max_frames, None,
                                       compute_log=True)
        pre = ConcatDataset(
            [DataLoadDf(dfs[k], mhe.encode_weak, base_tf) for k in train_keys]
        )
        scaler = Scaler()
        scaler_path = osp.join(cfg.data.exp_root,
                               cfg.data.dataset_name + "_at.json")
        if osp.isfile(scaler_path):
            scaler.load(scaler_path)
        else:
            scaler.calculate_scaler(pre)
            os.makedirs(osp.dirname(scaler_path), exist_ok=True)
            scaler.save(scaler_path)
        tf = get_frame_transforms(cfg.model.max_frames, scaler,
                                  compute_log=True)
        train_data = ConcatDataset([
            DataLoadDf(dfs[k], mhe.encode_weak, tf,
                       in_memory=cfg.data.in_memory,
                       cache_transformed=cfg.data.in_memory)
            for k in train_keys
        ])
        valid = DataLoadDf(dfs["validation"], mhe.encode_weak, tf,
                           cache_transformed=cfg.data.in_memory)
        ref_valid = dfs["validation"].drop("feature_filename", axis=1)

    model = AudioTagBackbone(
        arch=cfg.model.backbone, dilation=cfg.model.dilation,
        pooling=args.pooling or "avg", num_classes=len(classes),
        logits_out=True,  # stable log-space BCE (see AudioTagBackbone note)
    )
    rng = jax.random.PRNGKey(cfg.train.seed)
    x0 = jnp.zeros((1, cfg.model.max_frames, cfg.model.n_mels, 1))
    variables = jax.jit(lambda r, x: model.init({"params": r}, x))(rng, x0)
    sched = optax.exponential_decay(
        args.lr, args.lr_drop * max(len(train_data) // cfg.data.batch_size, 1),
        0.1, staircase=True,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(0.1),
        optax.adam(sched),  # reference uses Adam amsgrad, wd 0 (train_at.py:209)
    )
    opt_state = tx.init(variables["params"])
    params, frozen = variables["params"], variables.get("frozen", {})
    params, frozen = _imagenet_backbone_init(params, frozen, args, log)

    @jax.jit
    def at_step(params, frozen, opt_state, x, y):
        def loss_fn(p):
            z = model.apply({"params": p, "frozen": frozen}, x)  # logits
            # log-space BCE == torch BCELoss on sigmoid(z) (train_at.py:208)
            # but with gradient (sigmoid(z) - y) that survives saturation
            return optax.sigmoid_binary_cross_entropy(z, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def at_forward(params, frozen, x):
        return jax.nn.sigmoid(model.apply({"params": params, "frozen": frozen}, x))

    def collate_weak(samples, to_device=True):
        xs = np.stack([s[0] for s in samples]).astype(np.float32)[..., None]
        ys = np.stack([np.asarray(s[1], np.float32) for s in samples])
        if to_device:
            return jnp.asarray(xs), jnp.asarray(ys)
        return xs, ys

    bs = cfg.data.batch_size

    # SPMD data parallelism over all local devices (replaces the DDP the
    # reference never wires into train_at.py; same mesh as the other
    # trainers).  Single-device runs skip the mesh entirely.
    from .parallel.mesh import replicated

    mesh = None
    if jax.device_count() > 1 and bs % jax.device_count() == 0:
        mesh = make_mesh(C.MeshConfig())
        put_rep = lambda tree: jax.device_put(
            tree, jax.tree.map(lambda _: replicated(mesh), tree)
        )
        params, frozen, opt_state = (
            put_rep(params), put_rep(frozen), put_rep(opt_state),
        )
        log.info(f"AT data-parallel mesh: {dict(mesh.shape)} (replaces DDP)")
    best = SaveBest("sup")
    model_path = osp.join(model_dir, f"at_{args.pooling or 'avg'}_{cfg.data.dataset_name}")
    f1 = 0.0
    from .utils.meters import DeviceMetricAccumulator

    from .data.dataset import Prefetcher

    for epoch in range(args.epochs):
        order = np.random.permutation(len(train_data))
        acc = DeviceMetricAccumulator()  # device-side sums, one fetch/epoch

        def epoch_batches(order=order):
            # collate_weak's jnp.asarray device-transfers inside this
            # (prefetch) thread, overlapping the previous step's compute;
            # under a mesh the batch stays host-side and is sharded below
            for b in range(len(order) // bs):
                idxs = order[b * bs : (b + 1) * bs]
                yield collate_weak(
                    [train_data[i] for i in idxs], to_device=mesh is None
                )

        for x, y in Prefetcher(epoch_batches):
            if mesh is not None:
                x, y = shard_batch_pytree((x, y), mesh)
            params, opt_state, loss = at_step(params, frozen, opt_state, x, y)
            acc.update({"loss": loss})
        at_loss = acc.means()[0].get("loss", float("nan"))
        log.info(f"Epoch {epoch}: loss {at_loss:.4f}")
        if acc.steps and not np.isfinite(at_loss):
            log.info("Loss is not finite, stopping training")
            raise SystemExit(1)

        # validation clip F1
        rows = []
        for b in range(0, len(valid), bs):
            idxs = list(range(b, min(b + bs, len(valid))))
            x, _ = collate_weak([valid[i] for i in idxs], to_device=mesh is None)
            if mesh is not None:
                # ragged tail batches can't shard evenly; replicate instead
                x = jax.device_put(x, replicated(mesh))
            out = np.asarray(at_forward(params, frozen, x)) > 0.5
            for j, row in enumerate(out):
                for lbl in mhe.decode_weak(row.astype(int)):
                    rows.append(dict(filename=valid.filenames.iloc[idxs[j]],
                                     event_label=lbl, onset=0, offset=0))
        at_df = pd.DataFrame(rows, columns=["filename", "event_label", "onset", "offset"])
        clip = audio_tagging_results(ref_valid, at_df)
        f1 = float(clip.loc["avg", "f"])
        log.info(f"AT clip macro F1: {f1:.4f}")
        if best.apply(f1):
            save_checkpoint(model_path, {"params": params, "frozen": frozen,
                                         "epoch": epoch})
    log.info(f"best AT model saved at {model_path}")
    return f1
