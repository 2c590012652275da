"""SaveBest / EarlyStopping state persistence (resume must not reset
best-score tracking or patience; reference keeps these live in-process,
utils.py:113-212 — here they round-trip through the periodic checkpoint)."""
import numpy as np

from sound_event_detection_transformer_tpu.utils.checkpoint import (
    EarlyStopping,
    SaveBest,
)


def test_savebest_state_roundtrip():
    s = SaveBest("sup")
    decisions = [s.apply(v) for v in [0.1, 0.3, 0.2]]
    assert decisions == [True, True, False]

    s2 = SaveBest("sup")
    s2.load_state_dict(s.state_dict())
    assert s2.best_val == s.best_val
    assert s2.best_epoch == s.best_epoch
    assert s2.current_epoch == s.current_epoch
    # identical future behavior: a non-improving value is rejected by both
    assert s.apply(0.25) == s2.apply(0.25) == False  # noqa: E712
    assert s.apply(0.35) == s2.apply(0.35) == True  # noqa: E712


def test_earlystopping_state_roundtrip():
    e = EarlyStopping(patience=2, init_patience=0, fusion_strategy=[1, 2])
    seq = [0.5, 0.4, 0.6, 0.45, 0.55, 0.41]  # round-robin over strategies 1,2
    for v in seq:
        e.apply(v)

    e2 = EarlyStopping(patience=2, init_patience=0, fusion_strategy=[1, 2])
    e2.load_state_dict(e.state_dict())
    assert e2.best_val == e.best_val
    assert e2.best_epoch == e.best_epoch
    assert e2.current_epoch == e.current_epoch
    assert e2._idx == e._idx

    # both copies hit the patience stop on the same future step
    future = [0.3, 0.3, 0.3, 0.3, 0.3, 0.3]
    stops_a = [e.apply(v) for v in future]
    stops_b = [e2.apply(v) for v in future]
    assert stops_a == stops_b
    assert any(stops_a)  # patience eventually fires


def test_earlystopping_state_msgpack_safe():
    """Keys must survive flax msgpack (string keys only)."""
    from flax import serialization

    e = EarlyStopping(patience=3, init_patience=1, fusion_strategy=[1, 3])
    e.apply(0.2)
    e.apply(0.1)
    blob = serialization.msgpack_serialize(
        serialization.to_state_dict({"early": e.state_dict()})
    )
    back = serialization.msgpack_restore(blob)
    e2 = EarlyStopping(patience=3, init_patience=1, fusion_strategy=[1, 3])
    e2.load_state_dict(back["early"])
    assert e2.best_val[1] == e.best_val[1]
    assert np.isclose(e2.best_val[3], e.best_val[3])
