"""Dataset preparation: raw WAV trees → fold shards (ESC-50 and US8K)."""

import csv
import json

import numpy as np
import pytest

from dlsc_tpu.data import wav as W
from dlsc_tpu.data.prepare import ESC50_SAMPLES, prepare_esc50, prepare_us8k


def _tone(freq, n, sr=22050):
    t = np.arange(n) / sr
    return (0.4 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


@pytest.fixture
def esc50_raw(tmp_path):
    raw = tmp_path / "ESC-50-master"
    (raw / "meta").mkdir(parents=True)
    (raw / "audio").mkdir()
    rows = []
    for i in range(6):
        name = f"1-{i}-A-{i % 3}.wav"
        W.write_wav(raw / "audio" / name, _tone(220 * (i + 1), 22050)[None], 22050)
        rows.append({"filename": name, "fold": (i % 3) + 1, "target": i % 3,
                     "category": f"c{i % 3}", "esc10": "False",
                     "src_file": "x", "take": "A"})
    with open(raw / "meta" / "esc50.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    return raw


def test_prepare_esc50(esc50_raw, tmp_path):
    out = tmp_path / "processed"
    stats = prepare_esc50(esc50_raw, out, validate_hash=True, progress=False)
    assert stats["total_clips"] == 6
    assert set(stats["folds"]) == {"0", "1", "2"}  # CSV 1-based → 0-based
    waves = np.load(out / "fold_0" / "waves.npy")
    assert waves.shape == (2, ESC50_SAMPLES)      # resampled 22050→44100, padded to 5 s
    assert waves.dtype == np.int16                 # PCM16 shard format
    assert np.abs(waves).max() == 32767            # peak-normalized to full scale
    assert len(stats["sha256"]) == 6
    js = json.loads((out / "dataset_stats.json").read_text())
    assert js["sample_rate"] == 44100
    names = json.loads((out / "fold_0" / "names.json").read_text())
    assert all(n.endswith(".wav") for n in names)


def test_prepare_esc50_missing_meta(tmp_path):
    with pytest.raises(FileNotFoundError, match="esc50.csv"):
        prepare_esc50(tmp_path, tmp_path / "o", progress=False)


def test_prepare_us8k(tmp_path):
    raw = tmp_path / "UrbanSound8K"
    (raw / "metadata").mkdir(parents=True)
    rows = []
    for fold in (1, 2):
        d = raw / "audio" / f"fold{fold}"
        d.mkdir(parents=True)
        for i in range(2):
            name = f"clip{fold}{i}.wav"
            W.write_wav(d / name, _tone(300, 11025)[None], 22050)  # 0.5 s clip
            rows.append({"slice_file_name": name, "fold": fold,
                         "classID": i, "class": f"k{i}", "fsID": 1,
                         "start": 0, "end": 1, "salience": 1})
    import csv as _csv

    with open(raw / "metadata" / "UrbanSound8K.csv", "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)

    out = tmp_path / "us8k_processed"
    stats = prepare_us8k(raw, out, progress=False)
    assert stats["total_clips"] == 4
    waves = np.load(out / "fold_0" / "waves.npy")
    assert waves.shape[1] == 4 * 44100            # padded to 4 s
    lengths = np.load(out / "fold_0" / "lengths.npy")
    assert (lengths < 4 * 44100).all()            # originals were shorter
