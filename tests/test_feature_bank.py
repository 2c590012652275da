"""Device-resident FeatureBank: bank-path batches must equal host-collate
batches (features from HBM gather, targets from targets_only), single-device
and on the 8-device mesh."""
import numpy as np
import jax

from sound_event_detection_transformer_tpu import config as C
from sound_event_detection_transformer_tpu.data.dataset import (
    DataLoadDf, batch_iterator, collate,
)
from sound_event_detection_transformer_tpu.data.encoder import (
    BoxEncoder, to_dense_targets,
)
from sound_event_detection_transformer_tpu.data.feature_bank import FeatureBank
from sound_event_detection_transformer_tpu.data.synthetic import SyntheticDataset


def _smoke_dataset(n=12, frames=64, mels=16, num_patches=3):
    enc = BoxEncoder(1, seconds=10.0, generate_patch=True)
    return SyntheticDataset(
        n, ["event"], frames, mels, enc.encode_strong_df, max_events=2,
        seed=0, unlabel=True, num_patches=num_patches, device_patches=True,
    )


def test_bank_features_match_collate():
    ds = _smoke_dataset()
    bank = FeatureBank(ds)
    idx = [3, 0, 7, 5]
    np.random.seed(123)
    host = collate([ds[j] for j in idx], max_events=4, seconds=10.0)
    got = np.asarray(bank.gather(idx))
    np.testing.assert_array_equal(got, host.feats)


def test_bank_targets_match_collate():
    # same global-RNG stream => targets_only reproduces __getitem__'s boxes
    ds = _smoke_dataset()
    bank = FeatureBank(ds)
    idx = [1, 4, 2]
    np.random.seed(7)
    host = collate([ds[j] for j in idx], max_events=4, seconds=10.0)
    np.random.seed(7)
    ys = [ds.targets_only(j, bank.raw_frames[j]) for j in idx]
    targets, strong, weak = to_dense_targets(ys, 4, 10.0)
    np.testing.assert_array_equal(targets.boxes, host.targets.boxes)
    np.testing.assert_array_equal(targets.labels, host.targets.labels)
    np.testing.assert_array_equal(strong, host.strong)
    np.testing.assert_array_equal(weak, host.weak)


def test_dataloaddf_features_only_matches_getitem(tmp_path):
    # transformed features identical; raw frame count preserved pre-pad
    import pandas as pd

    from sound_event_detection_transformer_tpu.data.transforms import (
        get_transforms,
    )

    frames, mels, n = 32, 8, 5
    rows = []
    for i in range(n):
        f = tmp_path / f"c{i}.npy"
        np.save(f, np.random.RandomState(i).rand(frames - 4, mels).astype(
            np.float32))
        rows.append(dict(filename=f"c{i}.wav", feature_filename=str(f),
                         onset=1.0, offset=3.0, event_label="event"))
    df = pd.DataFrame(rows)
    enc = BoxEncoder(1, seconds=10.0, generate_patch=True)
    tf = get_transforms(frames, None, compute_log=True)
    mk = lambda: DataLoadDf(
        df, enc.encode_strong_df, tf, num_patches=2, device_patches=True,
        rng=np.random.RandomState(0),
    )
    a, b = mk(), mk()
    for i in range(n):
        data_b, t_raw = a.features_only(i)
        data_g, y_g = b[i]
        np.testing.assert_array_equal(data_b, data_g)
        assert t_raw == frames - 4
        assert data_b.shape[0] == frames  # padded to target geometry
    # fresh instances again: targets_only tracks __getitem__'s RNG stream
    a, b = mk(), mk()
    for i in range(n):
        y_t = a.targets_only(i, frames - 4)
        _, y_g = b[i]
        np.testing.assert_array_equal(y_t["boxes"], y_g["boxes"])


def test_batch_iterator_bank_mode_matches_host_stream():
    """batch_iterator(bank=...) + gather must reproduce the host-collate
    stream batch for batch (supervised, deterministic targets)."""
    enc = BoxEncoder(1, seconds=10.0)
    ds = SyntheticDataset(10, ["event"], 64, 16, enc.encode_strong_df,
                          max_events=2, seed=3)
    bank = FeatureBank(ds)
    host = list(batch_iterator(ds, 4, 4, 10.0, prefetch=False,
                               to_device=False))
    got = list(batch_iterator(ds, 4, 4, 10.0, prefetch=False,
                              to_device=False, bank=bank))
    assert len(host) == len(got)
    for hb, gb in zip(host, got):
        assert gb.feats is None
        feats = np.asarray(bank.gather(np.maximum(gb.indexes, 0)))
        np.testing.assert_array_equal(feats, hb.feats)
        np.testing.assert_array_equal(gb.targets.boxes, hb.targets.boxes)
        np.testing.assert_array_equal(gb.targets.labels, hb.targets.labels)
        np.testing.assert_array_equal(gb.strong, hb.strong)
        np.testing.assert_array_equal(gb.weak, hb.weak)
        np.testing.assert_array_equal(gb.pad_mask, hb.pad_mask)


def test_batch_iterator_bank_mode_pads_tail_with_markers():
    enc = BoxEncoder(1, seconds=10.0)
    ds = SyntheticDataset(6, ["event"], 64, 16, enc.encode_strong_df,
                          max_events=2, seed=3)
    bank = FeatureBank(ds)
    got = list(batch_iterator(ds, 4, 4, 10.0, prefetch=False,
                              to_device=False, return_indexes=True,
                              bank=bank))
    assert list(got[1].indexes) == [4, 5, -1, -1]
    # clamped gather is defined for the padded rows
    assert np.asarray(bank.gather(np.maximum(got[1].indexes, 0))).shape[0] == 4


def test_bank_gather_on_mesh():
    from sound_event_detection_transformer_tpu.parallel.mesh import make_mesh

    assert jax.device_count() == 8
    mesh = make_mesh(C.MeshConfig())
    ds = _smoke_dataset(n=16)
    bank = FeatureBank(ds, mesh=mesh)
    idx = list(range(8))
    got = bank.gather(idx)
    data_axis = mesh.axis_names[0]
    assert got.sharding.spec[0] == data_axis
    np.random.seed(0)
    host = collate([ds[j] for j in idx], max_events=4, seconds=10.0)
    np.testing.assert_array_equal(np.asarray(got), host.feats)


def test_sharded_bank_gather_matches_host():
    """shard=True: bank split over the data axis, batches assembled by one
    reduce-scatter — same rows as host collate, still batch-sharded."""
    from sound_event_detection_transformer_tpu.parallel.mesh import make_mesh

    assert jax.device_count() == 8
    mesh = make_mesh(C.MeshConfig())
    n_data = mesh.shape[mesh.axis_names[0]]
    ds = _smoke_dataset(n=14)  # not a multiple of the axis -> padded tail
    bank = FeatureBank(ds, mesh=mesh, shard=True)
    assert bank.sharded and bank.shard_size * n_data >= 14
    idx = [3, 3, 13, 0, 7, 12, 5, 1]  # arbitrary order + duplicates
    got = bank.gather(idx)
    assert got.sharding.spec[0] == mesh.axis_names[0]
    np.random.seed(0)
    host = collate([ds[j] for j in idx], max_events=4, seconds=10.0)
    np.testing.assert_array_equal(np.asarray(got), host.feats)


def test_maybe_bank_prefers_replicated_then_sharded_then_host():
    import argparse

    from sound_event_detection_transformer_tpu.data.feature_bank import (
        maybe_bank,
    )
    from sound_event_detection_transformer_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(C.MeshConfig())
    n_data = mesh.shape[mesh.axis_names[0]]
    ds = _smoke_dataset(n=8)
    args = argparse.Namespace(device_data=True)
    cfg = C.SEDTConfig(
        model=C.ModelConfig(max_frames=64, n_mels=16, num_classes=1),
        data=C.DataConfig(classes=["event"]),
    )
    est = len(ds) * 64 * 16 * 4
    fits_all = maybe_bank(args, ds, cfg, mesh=mesh, budget_bytes=est)
    assert fits_all is not None and not fits_all.sharded
    fits_shard = maybe_bank(args, ds, cfg, mesh=mesh, budget_bytes=est / n_data)
    assert fits_shard is not None and fits_shard.sharded
    assert maybe_bank(args, ds, cfg, mesh=mesh,
                      budget_bytes=est / n_data - 1) is None
    # without a mesh there is no sharded fallback
    assert maybe_bank(args, ds, cfg, budget_bytes=est / n_data) is None


def test_shard_bank_flag_forces_sharded_layout():
    import argparse

    from sound_event_detection_transformer_tpu.data.feature_bank import (
        maybe_bank,
    )
    from sound_event_detection_transformer_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(C.MeshConfig())
    ds = _smoke_dataset(n=8)
    cfg = C.SEDTConfig(
        model=C.ModelConfig(max_frames=64, n_mels=16, num_classes=1),
        data=C.DataConfig(classes=["event"]),
    )
    args = argparse.Namespace(device_data=True, shard_bank=True)
    bank = maybe_bank(args, ds, cfg, mesh=mesh, budget_bytes=1e12)
    assert bank is not None and bank.sharded
    # without a mesh the flag is inert, not an error
    bank = maybe_bank(args, ds, cfg, budget_bytes=1e12)
    assert bank is not None and not bank.sharded
