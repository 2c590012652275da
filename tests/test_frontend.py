"""Frontend tests: matmul-DFT vs rFFT path, librosa-semantic pieces, and the
host/device implementations agreeing (SedData.py:195-217 parity)."""
import jax.numpy as jnp
import numpy as np

from sound_event_detection_transformer_tpu.config import FeatureConfig
from sound_event_detection_transformer_tpu.data.features import logmel_numpy
from sound_event_detection_transformer_tpu.ops import frontend


def test_frame_count_matches_librosa_center_mode():
    # DCASE: 10 s @ 16 kHz, hop 323 -> 1 + 160000 // 323 = 496 (config.py:44)
    y = jnp.zeros(160000)
    mel = frontend.waveform_to_logmel(
        y, sr=16000, n_fft=1024, n_window=1024, hop=323, n_mels=64
    )
    assert mel.shape == (496, 64)


def test_matmul_dft_equals_rfft(rng):
    y = jnp.asarray(rng.randn(32000).astype(np.float32) * 0.1)
    kw = dict(sr=16000, n_fft=512, n_window=512, hop=160, n_mels=40)
    a = np.asarray(frontend.waveform_to_logmel(y, use_matmul_dft=True, **kw))
    b = np.asarray(frontend.waveform_to_logmel(y, use_matmul_dft=False, **kw))
    assert np.abs(a - b).max() < 0.1  # dB scale


def test_host_numpy_mirror_agrees_with_device(rng):
    fc = FeatureConfig(sample_rate=8000, n_window=256, n_fft=256, hop_size=128,
                       n_mels=32, max_len_seconds=2.0)
    y = rng.randn(16000).astype(np.float32) * 0.05
    host = logmel_numpy(y, fc)
    dev = np.asarray(
        frontend.waveform_to_logmel(
            jnp.asarray(y), sr=fc.sample_rate, n_fft=fc.n_fft,
            n_window=fc.n_window, hop=fc.hop_size, n_mels=fc.n_mels,
            use_matmul_dft=False,
        )
    )
    assert host.shape == dev.shape
    assert np.abs(host - dev).max() < 0.05


def test_mel_filterbank_structure():
    fb = frontend.mel_filterbank(16000, 1024, 64)
    assert fb.shape == (64, 513)
    assert (fb >= 0).all()
    assert (fb.sum(1) > 0).all()
    # triangle peaks monotonically increase in frequency
    assert (np.diff(fb.argmax(1)) >= 0).all()


def test_slaney_mel_scale_invertible():
    f = np.array([0.0, 500.0, 1000.0, 4000.0, 8000.0])
    np.testing.assert_allclose(
        frontend.mel_to_hz(frontend.hz_to_mel(f)), f, rtol=1e-6
    )
    # linear below 1 kHz: mel(500) == 500 / (200/3)
    np.testing.assert_allclose(frontend.hz_to_mel(np.array(500.0)), 7.5)


def test_amplitude_to_db_semantics():
    s = jnp.asarray([1.0, 0.1, 1e-8])
    db = np.asarray(frontend.amplitude_to_db(s, top_db=None))
    np.testing.assert_allclose(db, [0.0, -20.0, -100.0], atol=1e-3)
    db2 = np.asarray(frontend.amplitude_to_db(s, top_db=80.0))
    np.testing.assert_allclose(db2, [0.0, -20.0, -80.0], atol=1e-3)
