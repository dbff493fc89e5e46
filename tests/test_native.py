"""C++ native runtime vs pure-Python parity tests."""

import numpy as np
import pytest

import dlsc_tpu.native as N
from dlsc_tpu.data import wav as W

pytestmark = pytest.mark.skipif(not N.available(), reason="native lib not built")


@pytest.fixture(scope="module")
def wav_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("wavs") / "t.wav"
    rng = np.random.default_rng(0)
    x = np.clip(rng.standard_normal((2, 4000)) * 0.2, -0.99, 0.99).astype(np.float32)
    W.write_wav(p, x, 22050)
    return p, x


def test_decode_matches_python(wav_file):
    p, x = wav_file
    yn, srn = N.read_wav(p)
    yp, srp = W.read_wav(p)
    assert srn == srp == 22050
    np.testing.assert_array_equal(yn, yp)


def test_mono_and_peak(wav_file):
    p, _ = wav_file
    y, _ = N.read_wav(p)
    mono = N.mono_mix(y)
    np.testing.assert_allclose(mono, W.to_mono(y), atol=1e-6)
    normed = N.peak_normalize(mono.copy())
    assert abs(np.abs(normed).max() - 1.0) < 1e-6


def test_resample_preserves_tone():
    t = np.arange(8000) / 22050
    tone = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    r = N.resample(tone, 22050, 44100)
    assert abs(len(r) - 16000) <= 2
    body = r[500:-500]
    freqs = np.fft.rfftfreq(len(body), 1 / 44100)
    peak = freqs[np.abs(np.fft.rfft(body)).argmax()]
    assert abs(peak - 440.0) < 4.0
    # amplitude preserved within ~1%
    assert abs(body.max() - 0.5) < 0.01


def test_resample_agrees_with_scipy(wav_file):
    p, _ = wav_file
    sn = N.standardize(p, 44100)
    sp = W.standardize(p, 44100, prefer_native=False)
    n = min(len(sn), len(sp))
    corr = np.corrcoef(sn[:n], sp[:n])[0, 1]
    assert corr > 0.999


def test_gather_rows():
    base = np.arange(40, dtype=np.float32).reshape(10, 4)
    idx = np.array([7, 0, 7, 3])
    np.testing.assert_array_equal(N.gather_rows(base, idx), base[idx])
