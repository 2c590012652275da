"""DataFrame-backed dataset, multi-stream batch composition, async prefetch.

Host-side re-design of /root/reference/data_utils/DataLoad.py:
  * :class:`DataLoadDf` — per-clip feature loading (optional in-RAM cache,
    DataLoad.py:96-104), label encoding, host transform, SP-SEDT patch
    generation (DataLoad.py:57-77);
  * :class:`ConcatDataset` + :class:`MultiStreamBatchSampler` — fixed
    per-stream sub-batch layout (synthetic/weak/unlabel slices,
    DataLoad.py:197-301) expressed as per-sample strong/weak/unlabel flags;
  * :class:`Prefetcher` — a background collation thread + queue replacing the
    CUDA-stream ``data_prefetcher`` (DataLoad.py:304-336); device transfer is
    JAX's own async dispatch.

Note on padding masks: the reference pads every clip to ``max_frames``
*before* batching (PadOrTrunc), so its NestedTensor mask is all-False in
practice; we therefore emit an all-False [B, T] mask but keep the plumbing for
genuinely variable-length audio.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..engine import Batch
from .encoder import to_dense_targets
from .transforms import extract_patches, get_random_patch_boxes


class DataLoadDf:
    def __init__(
        self,
        df,
        encode_function: Optional[Callable] = None,
        transform: Optional[Callable] = None,
        in_memory: bool = False,
        num_patches: Optional[int] = None,
        sigma: float = 0.26,
        mu: float = 0.2,
        fixed_patch_size: bool = False,
        rng: Optional[np.random.RandomState] = None,
        device_patches: bool = False,
        cache_transformed: bool = False,
    ):
        self.df = df
        self.encode_function = encode_function
        self.transform = transform
        self.in_memory = in_memory
        self.num_patches = num_patches
        self.sigma, self.mu = sigma, mu
        self.fixed_patch_size = fixed_patch_size
        self.device_patches = device_patches
        # cache the POST-transform (data, y) per index.  The host transform
        # chain (log -> pad -> normalize, data/transforms.py) is deterministic
        # and was measured to dominate full-geometry epochs (~0.3 s of a
        # 0.37 s step waiting on the prefetcher); stochastic augmentation
        # runs on device, so caching is exact.  Disabled automatically for
        # the randomized patch path.
        self.cache_transformed = cache_transformed and num_patches is None
        self._tcache: Dict[int, Tuple[np.ndarray, Dict]] = {}
        self._ycache: Dict[int, Dict] = {}  # targets_only memo (bank mode)
        self.rng = rng or np.random.RandomState()
        self.feat_filenames = df.feature_filename.drop_duplicates()
        self.filenames = df.filename.drop_duplicates()
        self._cache: Dict[str, np.ndarray] = {}

    def __len__(self) -> int:
        return len(self.feat_filenames)

    def _features(self, path: str) -> np.ndarray:
        if not self.in_memory:
            return np.load(path).astype(np.float32)
        if path not in self._cache:
            self._cache[path] = np.load(path).astype(np.float32)
        return self._cache[path]

    def _raw_label(self, index: int):
        fname = self.filenames.iloc[index]
        if {"onset", "offset", "event_label"}.issubset(self.df.columns):
            return self.df[self.df.filename == fname][
                ["onset", "offset", "event_label"]
            ]
        if "event_labels" in self.df.columns:
            v = self.df[self.df.filename == fname].event_labels.iloc[0]
            if isinstance(v, str):
                return v.split(",")
            return []
        return "empty"

    def features_only(self, index: int) -> Tuple[np.ndarray, int]:
        """Post-transform features + RAW frame count, no label work.

        Used by :class:`~..data.feature_bank.FeatureBank`; exact because the
        host transform chain never reads the label (transforms.py:121-143).
        The raw (pre-pad) frame count is returned so the randomized patch
        path can keep drawing boxes against the original length, matching
        ``__getitem__``.
        """
        data = self._features(self.feat_filenames.iloc[index])
        t_raw = data.shape[0]
        if self.transform is not None:
            data, _ = self.transform((data, None))
        return data, t_raw

    def targets_only(self, index: int, t_raw: int) -> Dict:
        """The label dict ``__getitem__`` would produce, minus feature work.

        For the SP-SEDT patch path this draws FRESH random patch boxes from
        the dataset's RandomState — consuming it in the same per-call order
        as ``__getitem__``, so a seeded run is unchanged.  The deterministic
        (annotation) path is memoized: ``_raw_label`` scans the DataFrame per
        call, which would otherwise run B times per step in bank mode.
        """
        if self.num_patches is None and index in self._ycache:
            return self._ycache[index]
        if self.num_patches is not None:
            boxes = get_random_patch_boxes(
                t_raw, self.num_patches, self.mu, self.sigma,
                self.fixed_patch_size, self.rng,
            )
            y = self.encode_function.__self__.encode_unlabel(boxes) if hasattr(
                self.encode_function, "__self__"
            ) else {"labels": np.zeros(len(boxes), np.int64), "boxes": boxes,
                    "orig_size": np.asarray(10.0)}
            y = dict(y)
            y["boxes"] = boxes
            y.pop("patches", None)  # crops are gathered in-graph
            return y
        raw = self._raw_label(index)
        if self.encode_function is not None:
            y = self.encode_function(raw)
        else:
            y = {"labels": np.zeros((0,), np.int64),
                 "boxes": np.zeros((0, 2), np.float32),
                 "orig_size": np.asarray(10.0)}
        self._ycache[index] = y
        return y

    def __getitem__(self, index: int) -> Tuple[np.ndarray, Dict]:
        if self.cache_transformed and index in self._tcache:
            return self._tcache[index]
        data = self._features(self.feat_filenames.iloc[index])
        if self.num_patches is not None:
            boxes = get_random_patch_boxes(
                data.shape[0], self.num_patches, self.mu, self.sigma,
                self.fixed_patch_size, self.rng,
            )
            y = self.encode_function.__self__.encode_unlabel(boxes) if hasattr(
                self.encode_function, "__self__"
            ) else {"labels": np.zeros(len(boxes), np.int64), "boxes": boxes,
                    "orig_size": np.asarray(10.0)}
            y["boxes"] = boxes
        else:
            raw = self._raw_label(index)
            if self.encode_function is not None:
                y = self.encode_function(raw)
            else:
                y = {"labels": np.zeros((0,), np.int64),
                     "boxes": np.zeros((0, 2), np.float32),
                     "orig_size": np.asarray(10.0)}
        if self.transform is not None:
            data, y = self.transform((data, y))
        if self.num_patches is not None:
            y = dict(y)
            if self.device_patches:
                # crops are gathered in-graph from the target boxes instead
                # (ops/patches.py); drop the encoder's placeholder key
                y.pop("patches", None)
            else:
                y["patches"] = extract_patches(data, y["boxes"])
        if self.cache_transformed:
            self._tcache[index] = (data, y)
        return data, y


class WavLoadDf(DataLoadDf):
    """DataLoadDf variant yielding RAW fixed-length waveforms as features.

    The streaming counterpart of the cached-.npy path (``--from_wavs``):
    ``__getitem__`` returns ([n_samples] float32 waveform, labels) and the
    jitted train step runs ``ops.frontend.make_frontend_fn`` in-graph, so the
    STFT/mel/log/normalize chain compiles into the same XLA program as the
    model (reference SedData.py:195-217 done on the MXU instead of the host).
    Labels encode from the TSV rows exactly as in the parent (onset/offset
    are in seconds — no frame arithmetic happens on the host).

    Requires the ``wav_filename`` column (``SedData.initialize_and_get_df``).
    The SP-SEDT patch path and host transforms are feature-domain concepts
    and are unsupported here; ``features_only`` works (returning waveforms),
    so a FeatureBank built over this dataset holds waveforms in HBM.
    """

    def __init__(self, df, encode_function=None, n_samples: int = 0,
                 sr: int = 16000, in_memory: bool = False):
        super().__init__(df, encode_function, transform=None,
                         in_memory=in_memory)
        assert n_samples > 0 and "wav_filename" in df.columns
        self.n_samples, self.sr = n_samples, sr
        self.wav_filenames = df.wav_filename.drop_duplicates()

    def _load_wav(self, path: str) -> np.ndarray:
        from .features import read_audio

        y, _ = read_audio(path, self.sr)
        if len(y) < self.n_samples:
            y = np.pad(y, (0, self.n_samples - len(y)))
        return y[: self.n_samples].astype(np.float32)

    def _features(self, index_path: str) -> np.ndarray:  # path = wav path
        if not self.in_memory:
            return self._load_wav(index_path)
        if index_path not in self._cache:
            self._cache[index_path] = self._load_wav(index_path)
        return self._cache[index_path]

    def features_only(self, index: int) -> Tuple[np.ndarray, int]:
        return self._features(self.wav_filenames.iloc[index]), self.n_samples

    def __getitem__(self, index: int) -> Tuple[np.ndarray, Dict]:
        data = self._features(self.wav_filenames.iloc[index])
        raw = self._raw_label(index)
        if self.encode_function is not None:
            y = self.encode_function(raw)
        else:
            y = {"labels": np.zeros((0,), np.int64),
                 "boxes": np.zeros((0, 2), np.float32),
                 "orig_size": np.asarray(10.0)}
        return data, y


class ConcatDataset:
    """Concatenation with per-source cluster indices (DataLoad.py:197-247)."""

    def __init__(self, datasets: Sequence[DataLoadDf]):
        assert datasets
        self.datasets = list(datasets)
        self.cumulative_sizes = np.cumsum([len(d) for d in datasets]).tolist()

    @property
    def cluster_indices(self) -> List[range]:
        out, prev = [], 0
        for size in self.cumulative_sizes:
            out.append(range(prev, size))
            prev = size
        return out

    def __len__(self):
        return self.cumulative_sizes[-1]

    def _locate(self, idx: int):
        import bisect

        d = bisect.bisect_right(self.cumulative_sizes, idx)
        local = idx if d == 0 else idx - self.cumulative_sizes[d - 1]
        return self.datasets[d], local

    def __getitem__(self, idx: int):
        d, local = self._locate(idx)
        return d[local]

    def features_only(self, idx: int):
        d, local = self._locate(idx)
        return d.features_only(local)

    def targets_only(self, idx: int, t_raw: int):
        d, local = self._locate(idx)
        return d.targets_only(local, t_raw)

    @property
    def filenames(self):
        import pandas as pd

        return pd.concat([d.filenames for d in self.datasets], ignore_index=True)


class MultiStreamBatchSampler:
    """Fixed sub-batch sizes drawn from each stream (DataLoad.py:250-293)."""

    def __init__(self, data_source: ConcatDataset, batch_sizes: Sequence[int],
                 shuffle: bool = True, seed: Optional[int] = None):
        self.data_source = data_source
        self.batch_sizes = list(batch_sizes)
        assert len(self.batch_sizes) == len(data_source.cluster_indices)
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)

    def __iter__(self) -> Iterator[List[int]]:
        clusters = [np.array(list(c)) for c in self.data_source.cluster_indices]
        if self.shuffle:
            clusters = [self.rng.permutation(c) for c in clusters]
        n = len(self)
        for b in range(n):
            batch: List[int] = []
            for c, bs in zip(clusters, self.batch_sizes):
                batch.extend(c[b * bs : (b + 1) * bs].tolist())
            yield batch

    def __len__(self) -> int:
        return min(
            len(c) // bs
            for c, bs in zip(self.data_source.cluster_indices, self.batch_sizes)
        )


def collate(
    samples: Sequence[Tuple[np.ndarray, Dict]],
    max_events: int,
    seconds: float,
    unlabel_flags: Optional[np.ndarray] = None,
    indexes: Optional[Sequence[int]] = None,
) -> Batch:
    """Samples -> dense :class:`engine.Batch` (replaces collate_fn /
    NestedTensor, reference utils.py:440-560)."""
    feats = np.stack([s[0] for s in samples]).astype(np.float32)[..., None]
    targets, strong, weak = to_dense_targets(
        [s[1] for s in samples], max_events, seconds
    )
    if unlabel_flags is not None:
        strong = strong & ~unlabel_flags
        weak = weak & ~unlabel_flags
    # raw-waveform batches ([B, n_samples, 1], WavLoadDf): the in-graph
    # frontend rebuilds the [B, T] mask itself (engine.py:138-143) — don't
    # ship a [B, 160k] bool placeholder every step
    pad_mask = np.zeros(
        (feats.shape[0], 1 if feats.ndim == 3 else feats.shape[1]), dtype=bool
    )
    patches = None
    if "patches" in samples[0][1]:
        patches = np.stack([s[1]["patches"] for s in samples]).astype(np.float32)[
            ..., None
        ]
    idx = np.asarray(indexes, np.int32) if indexes is not None else None
    return Batch(
        feats=feats, pad_mask=pad_mask, targets=targets,
        strong=strong, weak=weak, patches=patches, indexes=idx,
    )


def _device_put_batch(b: Batch) -> Batch:
    """Async host->device transfer of a collated batch.

    Runs inside the prefetch thread so the ~40 ms-latency tunnel transfer
    overlaps the previous step's compute — the TPU analogue of the
    reference's side-CUDA-stream data_prefetcher (DataLoad.py:304-336).
    ``indexes`` stays host-side: eval decoding reads it with numpy.
    """
    import jax

    put = lambda x: None if x is None else jax.device_put(np.asarray(x))
    return Batch(
        feats=put(b.feats),
        pad_mask=put(b.pad_mask),
        targets=jax.tree.map(put, b.targets),
        strong=put(b.strong),
        weak=put(b.weak),
        patches=put(b.patches),
        indexes=b.indexes,
    )


class Prefetcher:
    """Background-thread batch producer (replaces data_prefetcher,
    DataLoad.py:304-336)."""

    def __init__(self, make_iter: Callable[[], Iterator], depth: int = 2):
        self.make_iter = make_iter
        self.depth = depth

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        stop = object()

        def worker():
            try:
                for item in self.make_iter():
                    q.put(item)
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item


def batch_iterator(
    dataset,
    sampler_or_batchsize,
    max_events: int,
    seconds: float,
    unlabel_streams: Optional[Sequence[int]] = None,
    return_indexes: bool = False,
    prefetch: bool = True,
    pad_last: bool = True,
    host_slice: Optional[Sequence[int]] = None,
    to_device: bool = True,
    bank=None,
) -> Iterator[Batch]:
    """Compose sampler + collate (+ prefetch thread) into a Batch stream.

    ``bank``: a :class:`~.feature_bank.FeatureBank` — batches are emitted
    with ``feats=None`` and ``indexes`` always populated; the consumer fills
    feats on device via ``bank.gather(np.maximum(batch.indexes, 0))`` (after
    any ``shard_batch_pytree``), so no spectrogram ever crosses the host
    boundary.  Under multiple processes the bank must be data-axis-sharded;
    ``indexes`` then carries the full GLOBAL batch (identical on every host,
    feeding the cross-process gather) while targets/flags stay per-host
    slices.

    ``pad_last``: repeat the final sample to keep the last batch full-sized
    (avoids a second jit compilation for the ragged tail; padded rows carry
    index -1 so eval decoding skips them).

    ``host_slice``: ``(rank, count)`` — each host loads only its contiguous
    1/count chunk of every global batch (the multi-host replacement for
    DistributedSampler, reference train_spsedt.py:110-114; contiguity keeps
    the global stream layout intact when ``shard_batch_pytree`` reassembles
    the global array from per-process chunks).  Defaults to
    ``(jax.process_index(), jax.process_count())`` when running multi-host.
    """
    if host_slice is None:
        import jax

        if jax.process_count() > 1:
            host_slice = (jax.process_index(), jax.process_count())
    assert bank is None or not host_slice or bank.sharded, (
        "multi-host banking needs the data-axis-sharded FeatureBank"
    )

    def slice_for_host(idxs):
        if not host_slice:
            return list(idxs)
        rank, count = host_slice
        idxs = list(idxs)
        per = len(idxs) // count
        assert per * count == len(idxs), (
            f"global batch {len(idxs)} not divisible by {count} hosts"
        )
        return idxs[rank * per : (rank + 1) * per]

    def gen():
        pad_counts = {}
        if isinstance(sampler_or_batchsize, int):
            n = len(dataset)
            bs = sampler_or_batchsize
            index_batches = []
            for i in range(0, n, bs):
                b = list(range(i, min(i + bs, n)))
                if pad_last and len(b) < bs:
                    pad_counts[len(index_batches)] = bs - len(b)
                    b = b + [b[-1]] * (bs - len(b))
                index_batches.append(b)
        else:
            index_batches = sampler_or_batchsize
        cluster_of = None
        if unlabel_streams and hasattr(dataset, "cumulative_sizes"):
            bounds = [0] + list(dataset.cumulative_sizes)

            def cluster_of(i):
                for k in range(len(bounds) - 1):
                    if bounds[k] <= i < bounds[k + 1]:
                        return k
                return -1

        for bi, idxs in enumerate(index_batches):
            global_idxs = list(idxs)
            if not return_indexes:
                # eval (return_indexes) stays full-batch on every host; only
                # training batches shard across hosts
                idxs = slice_for_host(idxs)
            uflags = None
            if cluster_of is not None:
                uflags = np.array(
                    [cluster_of(i) in unlabel_streams for i in idxs]
                )
            out_idxs = None
            if return_indexes:
                out_idxs = list(idxs)
                for k in range(pad_counts.get(bi, 0)):
                    out_idxs[len(out_idxs) - 1 - k] = -1  # padded row marker
            if bank is not None:
                ys = [dataset.targets_only(i, bank.raw_frames[i])
                      for i in idxs]
                targets, strong, weak = to_dense_targets(
                    ys, max_events, seconds
                )
                if uflags is not None:
                    strong = strong & ~uflags
                    weak = weak & ~uflags
                # ``indexes`` stays GLOBAL under host_slice: every host passes
                # the identical full batch to the sharded bank's gather, while
                # targets/flags above are the host's slice (assembled by
                # shard_batch_pytree like every other leaf)
                b = Batch(
                    feats=None,
                    pad_mask=np.zeros((len(idxs), bank.shape[1]), bool),
                    targets=targets, strong=strong, weak=weak,
                    indexes=np.asarray(
                        out_idxs if out_idxs is not None else global_idxs,
                        np.int32,
                    ),
                )
            else:
                samples = [dataset[i] for i in idxs]
                b = collate(samples, max_events, seconds, uflags, out_idxs)
            # device transfer in this (prefetch) thread overlaps compute;
            # sharded/multi-host runs keep host batches for
            # shard_batch_pytree (to_device=False)
            yield _device_put_batch(b) if to_device else b

    return iter(Prefetcher(gen)) if prefetch else gen()
