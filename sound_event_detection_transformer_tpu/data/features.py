"""Offline feature extraction: wav -> cached log-mel .npy + metadata frames.

Re-implements /root/reference/data_utils/SedData.py without librosa/soundfile:
wav decoding via the stdlib/scipy, polyphase resampling via scipy.signal, and
the log-mel computation shared with the on-device frontend
(``ops/frontend.py`` numpy helpers), so cached features and the fused
in-graph path agree bit-for-bit in spirit and to float tolerance in practice.

Cache layout parity: features live under
``<root>/features/sr<sr>_win<w>_hop<h>_mels<m>[_nolog]/`` keyed like the
reference (SedData.py:98-105), with a ``<tsv>_<dirname>.tsv`` metadata file
adding the ``feature_filename`` column.
"""
from __future__ import annotations

import os
import os.path as osp
from functools import lru_cache
from typing import Dict, Optional

import numpy as np

from ..config import FeatureConfig
from ..ops import frontend


def read_audio(path: str, target_fs: Optional[int] = None):
    """Read a wav file to mono float, resampling if needed
    (reference SedData.py:361-379, soundfile+librosa replaced)."""
    try:
        from scipy.io import wavfile

        fs, audio = wavfile.read(path)
        if audio.dtype == np.int16:
            audio = audio.astype(np.float32) / 32768.0
        elif audio.dtype == np.int32:
            audio = audio.astype(np.float32) / 2147483648.0
        elif audio.dtype == np.uint8:
            audio = (audio.astype(np.float32) - 128.0) / 128.0
        else:
            audio = audio.astype(np.float32)
    except Exception:
        import wave

        with wave.open(path, "rb") as w:
            fs = w.getframerate()
            n = w.getnframes()
            raw = w.readframes(n)
            width = w.getsampwidth()
            dtype = {1: np.uint8, 2: np.int16, 4: np.int32}[width]
            audio = np.frombuffer(raw, dtype=dtype).astype(np.float32)
            audio /= float(2 ** (8 * width - 1))
            ch = w.getnchannels()
            if ch > 1:
                audio = audio.reshape(-1, ch)
    if audio.ndim > 1:
        audio = audio.mean(axis=1)
    if target_fs is not None and fs != target_fs:
        from scipy.signal import resample_poly
        from math import gcd

        g = gcd(int(target_fs), int(fs))
        audio = resample_poly(audio, target_fs // g, fs // g).astype(np.float32)
        fs = target_fs
    return audio, fs


@lru_cache(maxsize=8)
def _stft_constants(sample_rate, n_fft, n_window, n_mels):
    """Padded float32 window + transposed mel weights, cached per config."""
    window = frontend.hamming_window(n_window)
    if n_window < n_fft:
        lp = (n_fft - n_window) // 2
        window = np.pad(window, (lp, n_fft - n_window - lp))
    mel_wt = frontend.mel_filterbank(sample_rate, n_fft, n_mels).T
    return window.astype(np.float32), np.ascontiguousarray(mel_wt, np.float32)


def logmel_numpy(y: np.ndarray, fc: FeatureConfig) -> np.ndarray:
    """Host (numpy) mirror of ``ops.frontend.waveform_to_logmel``:
    [samples] -> [n_frames, n_mels] float32 (SedData.py:195-217).

    float32 end to end: scipy's rfft keeps single precision (numpy's always
    upcasts to float64), which roughly halves extraction time per clip.
    """
    from scipy.fft import rfft

    window, mel_wt = _stft_constants(
        fc.sample_rate, fc.n_fft, fc.n_window, fc.n_mels
    )
    pad = fc.n_fft // 2
    yp = np.pad(np.asarray(y, np.float32), (pad, pad), mode="reflect")
    n_frames = 1 + (len(yp) - fc.n_fft) // fc.hop_size
    idx = (
        np.arange(n_frames)[:, None] * fc.hop_size + np.arange(fc.n_fft)[None, :]
    )
    frames = yp[idx] * window[None, :]
    mag = np.abs(rfft(frames, n=fc.n_fft, axis=-1))
    mel = mag @ mel_wt
    if fc.compute_log:
        log_spec = 20.0 * np.log10(np.maximum(1e-5, mel))
        mel = np.maximum(log_spec, log_spec.max() - 80.0)
    return mel.astype(np.float32)


def meta_path_to_audio_dir(tsv_path: str) -> str:
    return os.path.splitext(tsv_path.replace("metadata", "audio"))[0]


class SedData:
    """Dataset preparation: TSV metadata -> feature DataFrames with cached
    .npy log-mels (reference SedData.py:18-192)."""

    def __init__(
        self,
        dataset_name: str,
        base_feature_dir: Optional[str] = None,
        recompute_features: bool = False,
        compute_log: bool = False,
    ):
        if dataset_name == "urbansed":
            self.fc = FeatureConfig.urbansed()
        else:
            self.fc = FeatureConfig.dcase()
        import dataclasses

        self.fc = dataclasses.replace(self.fc, compute_log=compute_log)
        self.dataset_name = dataset_name
        self.recompute_features = recompute_features
        self.compute_log = compute_log
        base = base_feature_dir or osp.join("data", dataset_name, "features")
        ext = "" if compute_log else "_nolog"
        self.feature_dir = osp.join(
            base,
            f"sr{self.fc.sample_rate}_win{self.fc.n_window}_hop{self.fc.hop_size}"
            f"_mels{self.fc.n_mels}{ext}",
        )
        os.makedirs(self.feature_dir, exist_ok=True)

    def load_and_compute_mel_spec(self, wav_path: str) -> np.ndarray:
        audio, _ = read_audio(wav_path, self.fc.sample_rate)
        return logmel_numpy(audio, self.fc)

    def _extract(self, wav_path: str, out_path: str) -> bool:
        if osp.exists(out_path) and not self.recompute_features:
            return True
        try:
            mel = self.load_and_compute_mel_spec(wav_path)
        except (IOError, FileNotFoundError) as e:  # pragma: no cover
            return False
        os.makedirs(osp.dirname(out_path), exist_ok=True)
        np.save(out_path, mel)
        return True

    def initialize_and_get_df(self, tsv_path: str, audio_dir: Optional[str] = None,
                              nb_files: Optional[int] = None):
        """TSV -> DataFrame with a ``feature_filename`` column, extracting
        missing features on the way (SedData.py:143-192,269-299)."""
        import pandas as pd

        df_meta = pd.read_csv(tsv_path, header=0, sep="\t")
        if nb_files is not None:
            names = df_meta.filename.drop_duplicates().iloc[:nb_files]
            df_meta = df_meta[df_meta.filename.isin(names)].reset_index(drop=True)
        audio_dir = audio_dir or meta_path_to_audio_dir(tsv_path)
        rows = []
        for fname in df_meta.filename.drop_duplicates():
            wav = osp.join(audio_dir, fname)
            out = osp.join(self.feature_dir, osp.splitext(fname)[0] + ".npy")
            if self._extract(wav, out):
                rows.append((fname, out, wav))
        cols = ["filename", "feature_filename", "wav_filename"]
        feat_df = (
            pd.DataFrame(rows, columns=cols) if rows
            else pd.DataFrame(columns=cols)
        )
        return df_meta.merge(feat_df, on="filename")


def get_dfs(dataset: SedData, paths: Dict[str, str], unlabel_data: bool = False,
            nb_files: Optional[int] = None,
            audio_dirs: Optional[Dict[str, str]] = None) -> Dict:
    """Assemble the per-split DataFrames (reference SedData.py:420-445).

    ``paths`` maps split name -> tsv path, e.g. {'train':..., 'validation':...}
    for urbansed or {'weak','synthetic','validation','eval'[,'unlabel']} for
    dcase.  ``audio_dirs`` overrides the default metadata->audio path mapping
    per split (the reference passes ``audio_dir=cfg.audio_validation_dir``
    for dcase validation, train_at.py:41, because validation.tsv lives one
    directory deeper than its audio).
    """
    out = {}
    for split, tsv in paths.items():
        if split == "unlabel" and not unlabel_data:
            continue
        out[split] = dataset.initialize_and_get_df(
            tsv, audio_dir=(audio_dirs or {}).get(split), nb_files=nb_files
        )
    return out
