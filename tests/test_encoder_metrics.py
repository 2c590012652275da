"""Tests: box codec round-trips, decode_strong suppression rules, native
event-based metrics sanity (perfect predictions -> F1 = 1)."""
import numpy as np
import pandas as pd
import pytest

from sound_event_detection_transformer_tpu.data.encoder import (
    BoxEncoder,
    ManyHotEncoder,
    to_dense_targets,
)
from sound_event_detection_transformer_tpu.metrics import (
    audio_tagging_results,
    compute_metrics,
    event_based_evaluation_df,
)

CLASSES = ["cat", "dog", "rain"]


def test_encode_strong_df_roundtrip():
    enc = BoxEncoder(CLASSES, seconds=10.0)
    df = pd.DataFrame(
        [{"onset": 1.0, "offset": 3.0, "event_label": "dog"},
         {"onset": 5.0, "offset": 6.0, "event_label": "cat"}]
    )
    y = enc.encode_strong_df(df)
    np.testing.assert_array_equal(y["labels"], [1, 0])
    np.testing.assert_allclose(y["boxes"], [[0.2, 0.2], [0.55, 0.1]], atol=1e-7)

    # decode back (boxes in seconds for decode)
    dec = enc.decode_strong(
        {"scores": np.array([0.9, 0.8]), "labels": np.array([1, 0]),
         "boxes": np.array([[1.0, 3.0], [5.0, 6.0]])}
    )
    assert dec[0][0] == "dog" and abs(dec[0][1] - 1.0) < 1e-6


def test_decode_strong_min_duration_and_overlap():
    enc = BoxEncoder(CLASSES, seconds=10.0)
    res = {
        "scores": np.array([0.9, 0.8, 0.7, 0.95]),
        "labels": np.array([0, 0, 0, 1]),
        "boxes": np.array([
            [1.0, 3.0],    # kept
            [2.5, 4.0],    # same class, overlaps higher-score [1,3] -> dropped
            [5.0, 5.05],   # too short (< 0.2 s) -> dropped
            [1.0, 2.0],    # different class -> kept
        ]),
    }
    dec = enc.decode_strong(res, threshold=0.5)
    labels = sorted(d[0] for d in dec)
    assert labels == ["cat", "dog"]


def test_encode_weak_and_manyhot():
    enc = BoxEncoder(CLASSES, seconds=10.0)
    y = enc.encode_weak(["cat", "rain"])
    np.testing.assert_array_equal(sorted(y["labels"]), [0, 2])
    assert len(y["boxes"]) == 0

    mhe = ManyHotEncoder(CLASSES, n_frames=10)
    w = mhe.encode_weak(["dog"])
    np.testing.assert_array_equal(w, [0, 1, 0])
    df = pd.DataFrame([{"onset": 2, "offset": 5, "event_label": "cat"}])
    s = mhe.encode_strong_df(df)
    assert s[:, 0].sum() == 3  # frames 2..4
    dec = mhe.decode_strong(s)
    assert dec == [["cat", 2, 5]]


def test_to_dense_targets_flags():
    strong_y = {"labels": np.array([1]), "boxes": np.array([[0.5, 0.2]]),
                "orig_size": np.asarray(10.0)}
    weak_y = {"labels": np.array([0, 2]), "boxes": np.zeros((0, 2)),
              "orig_size": np.asarray(10.0)}
    empty_y = {"labels": np.zeros(0), "boxes": np.zeros((0, 2)),
               "orig_size": np.asarray(10.0)}
    t, strong, weak = to_dense_targets([strong_y, weak_y, empty_y], 4, 10.0)
    np.testing.assert_array_equal(strong, [True, False, False])
    np.testing.assert_array_equal(weak, [False, True, False])
    assert t.box_valid[0].sum() == 1 and t.label_valid[1].sum() == 2


def _events_df(rows):
    return pd.DataFrame(rows, columns=["filename", "onset", "offset", "event_label"])


def test_event_based_f1_perfect_and_collar():
    ref = _events_df([
        ("a.wav", 1.0, 3.0, "cat"), ("a.wav", 5.0, 6.0, "dog"),
        ("b.wav", 0.0, 2.0, "cat"),
    ])
    # perfect predictions
    m = event_based_evaluation_df(ref, ref.copy())
    f = m.results_class_wise_average_metrics()["f_measure"]["f_measure"]
    assert f == 1.0
    # small shifts inside the collar (0.2 s onset, 20% length offset)
    est = _events_df([
        ("a.wav", 1.15, 3.3, "cat"),   # onset +0.15 <= 0.2; offset +0.3 <= 0.4
        ("a.wav", 5.1, 6.1, "dog"),
        ("b.wav", 0.1, 2.1, "cat"),
    ])
    m2 = event_based_evaluation_df(ref, est)
    f2 = m2.results_class_wise_average_metrics()["f_measure"]["f_measure"]
    assert f2 == 1.0
    # outside the collar
    est3 = _events_df([("a.wav", 1.5, 3.0, "cat")])
    m3 = event_based_evaluation_df(ref, est3)
    assert m3.stats["cat"]["Ntp"] == 0


def test_event_based_unique_matching():
    """Two predictions can't both claim one reference event."""
    ref = _events_df([("a.wav", 1.0, 3.0, "cat")])
    est = _events_df([
        ("a.wav", 1.0, 3.0, "cat"), ("a.wav", 1.1, 3.1, "cat"),
    ])
    m = event_based_evaluation_df(ref, est)
    s = m.stats["cat"]
    assert s["Ntp"] == 1 and s["Nsys"] == 2 and s["Nref"] == 1


def test_compute_metrics_and_audio_tagging():
    ref = _events_df([
        ("a.wav", 1.0, 3.0, "cat"), ("b.wav", 2.0, 4.0, "dog"),
    ])
    pred = ref.copy()
    pred["score"] = 0.9
    f1 = compute_metrics(pred, ref, cal_seg=True, cal_clip=True)
    assert f1 == 1.0
    at = audio_tagging_results(ref, ref.copy())
    assert at.loc["avg", "f"] == 1.0


def test_psds_basic():
    from sound_event_detection_transformer_tpu.metrics.psds import PSDSEval

    ref = _events_df([
        ("a.wav", 1.0, 3.0, "cat"), ("b.wav", 2.0, 4.0, "dog"),
    ])
    meta = pd.DataFrame(
        [{"filename": "a.wav", "duration": 10.0},
         {"filename": "b.wav", "duration": 10.0}]
    )
    psds = PSDSEval(ground_truth=ref, metadata=meta)
    psds.add_operating_point(ref.copy())  # perfect detections
    res = psds.psds(0, 0, 100)
    assert res.value > 0.9  # perfect detector ~ 1.0
    macro_f, per_class = psds.compute_macro_f_score(ref.copy())
    assert macro_f == 1.0


def test_batch_iterator_pads_last_batch():
    from sound_event_detection_transformer_tpu.data.dataset import batch_iterator
    from sound_event_detection_transformer_tpu.data.synthetic import SyntheticDataset

    enc = BoxEncoder(CLASSES, seconds=10.0)
    ds = SyntheticDataset(5, CLASSES, 32, 16, enc.encode_strong_df,
                          max_events=2, seed=0)
    batches = list(batch_iterator(ds, 4, 4, 10.0, return_indexes=True,
                                  prefetch=False))
    assert len(batches) == 2
    assert batches[0].feats.shape[0] == 4 and batches[1].feats.shape[0] == 4
    # tail rows are marked -1 for decode skipping
    assert batches[1].indexes.tolist() == [4, -1, -1, -1]


def test_batch_iterator_host_slice():
    """Per-host contiguous chunking (multi-host DistributedSampler
    replacement): host chunks concatenate to the full global batch."""
    from sound_event_detection_transformer_tpu.data.dataset import batch_iterator
    from sound_event_detection_transformer_tpu.data.synthetic import SyntheticDataset

    enc = BoxEncoder(CLASSES, seconds=10.0)
    ds = SyntheticDataset(8, CLASSES, 32, 16, enc.encode_strong_df,
                          max_events=2, seed=0)
    full = list(batch_iterator(ds, 4, 4, 10.0, prefetch=False,
                               host_slice=(0, 1)))
    h0 = list(batch_iterator(ds, 4, 4, 10.0, prefetch=False,
                             host_slice=(0, 2)))
    h1 = list(batch_iterator(ds, 4, 4, 10.0, prefetch=False,
                             host_slice=(1, 2)))
    assert len(full) == len(h0) == len(h1) == 2
    for f, a, b in zip(full, h0, h1):
        assert a.feats.shape[0] == b.feats.shape[0] == 2
        np.testing.assert_array_equal(
            f.feats, np.concatenate([a.feats, b.feats], axis=0)
        )


def test_decode_strong_batch_matches_per_sample():
    """decode_strong_batch == sample-by-sample decode_strong (the vectorized
    prefilter must not change results), across thresholds."""
    from sound_event_detection_transformer_tpu.data.encoder import BoxEncoder

    enc = BoxEncoder(["A", "B", "C"], seconds=10.0)
    r = np.random.RandomState(3)
    B, Q = 16, 10
    scores = r.rand(B, Q).astype(np.float32)
    labels = r.randint(0, 3, (B, Q))
    on = r.rand(B, Q).astype(np.float32) * 8
    dur = r.rand(B, Q).astype(np.float32) * 2  # some below the 0.2 s cut
    boxes = np.stack([on, on + dur], axis=-1)
    for thr in (0.1, 0.5, 0.9):
        batch = enc.decode_strong_batch(scores, labels, boxes, threshold=thr)
        for j in range(B):
            ref = enc.decode_strong(
                {"scores": scores[j], "labels": labels[j], "boxes": boxes[j]},
                threshold=thr,
            )
            got = batch.get(j, [])
            assert len(got) == len(ref)
            for a, b in zip(sorted(got), sorted(ref)):
                assert a[0] == b[0]
                np.testing.assert_allclose(a[1:], b[1:], rtol=1e-6)


def test_event_lists_by_file_matches_per_file_scan():
    """The one-pass grouping must reproduce get_event_list_current_file
    exactly, including the lone-NaN-row 'file with no events' marker."""
    import pandas as pd

    from sound_event_detection_transformer_tpu.metrics import (
        _event_lists_by_file,
        get_event_list_current_file,
    )

    rng = np.random.RandomState(3)
    rows = []
    for i in range(40):
        f = f"f{i}.wav"
        n = rng.randint(0, 4)
        if n == 0:
            rows.append((f, np.nan, np.nan, np.nan))  # no-events marker row
        for _ in range(n):
            o = rng.uniform(0, 8)
            rows.append((f, o, o + rng.uniform(0.2, 2), f"c{rng.randint(3)}"))
    df = pd.DataFrame(rows, columns=["filename", "onset", "offset", "event_label"])

    grouped = _event_lists_by_file(df)
    for f in df.filename.unique():
        slow = get_event_list_current_file(df, f)
        fast = grouped.get(f, [])

        def key(recs):
            return sorted(
                tuple(sorted((k, str(v)) for k, v in r.items())) for r in recs
            )

        assert key(fast) == key(slow), f
    assert _event_lists_by_file(df.iloc[0:0]) == {}
