"""Eval loss means must be exact over the dataset despite tail padding.

The batch iterator repeats the final sample to keep the last batch full-sized
(avoiding a ragged-tail recompile); padded rows carry index -1.  The eval
loop masks them out of the criterion and weights each batch by its real-row
count, so the logged "Val averaged stats" are independent of the batch size
used to traverse the dataset.  Pinned here with a 6-clip dataset scored at
bs=2 (3 full batches, no padding) vs bs=4 (ragged tail: 2 real + 2 padded
rows) — without the fix the padded batch double-counts the final clip.

Clips are generated with exactly one event each so the per-batch num_boxes
normalization (reference sedt.py:193-221) makes the two traversals exactly
comparable.
"""
import jax
import numpy as np
import pytest

from sound_event_detection_transformer_tpu.config import SEDTConfig
from sound_event_detection_transformer_tpu.data.encoder import BoxEncoder
from sound_event_detection_transformer_tpu.data.synthetic import SyntheticDataset
from sound_event_detection_transformer_tpu.engine import (
    TrainState,
    init_train_state,
    make_eval_step,
)
from sound_event_detection_transformer_tpu.models import build_model
from sound_event_detection_transformer_tpu.parallel.optim import make_optimizer
from sound_event_detection_transformer_tpu.train_lib import _init_params, evaluate


@pytest.fixture(scope="module")
def setup():
    cfg = SEDTConfig.tiny_test()
    classes = list(cfg.data.classes)
    enc = BoxEncoder(classes, seconds=cfg.features.max_len_seconds)
    ds = SyntheticDataset(
        6, classes, cfg.model.max_frames, cfg.model.n_mels,
        enc.encode_strong_df, max_events=1,
        seconds=cfg.features.max_len_seconds, seed=3,
    )
    model, wd = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    params = _init_params(model, cfg, rng)
    tx = make_optimizer(params, cfg.train, 1)
    state = init_train_state(
        model, cfg, tx, rng, (4, cfg.model.max_frames, cfg.model.n_mels)
    )
    return cfg, enc, ds, model, wd, state


def _means(setup, bs):
    cfg, enc, ds, model, wd, state = setup
    eval_step = make_eval_step(model, wd, cfg, (1,))
    out = {}
    evaluate(
        eval_step, state, ds, cfg, enc, ds.ref_df(), [1],
        at=cfg.model.dec_at, batch_size=bs, weight_dict=wd,
        loss_means_out=out,
    )
    return out


def test_ragged_tail_means_match_unpadded(setup):
    m2 = _means(setup, 2)   # 6 clips / bs 2: no padding anywhere
    m4 = _means(setup, 4)   # 6 clips / bs 4: tail batch has 2 padded rows
    assert m2 and m4
    for k in m2:
        if k in ("cardinality_error",):  # logging-only .mean() over B incl. pads
            continue
        np.testing.assert_allclose(
            m4[k], m2[k], rtol=2e-5, atol=1e-6,
            err_msg=f"eval mean for {k} depends on tail padding",
        )
