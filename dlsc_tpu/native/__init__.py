"""ctypes bindings for the C++ data-path runtime (native/dlsc_native.cpp).

Auto-builds the shared library with ``make`` on first use when a toolchain
is available; every function has a pure-Python fallback in dlsc_tpu.data.wav
so the framework works without it. Use ``available()`` to check.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SO = _NATIVE_DIR / "libdlsc_native.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _SO.exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    i64, i32, f32p = ctypes.c_int64, ctypes.c_int32, ctypes.POINTER(ctypes.c_float)
    lib.wav_info.restype = i64
    lib.wav_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(i32), ctypes.POINTER(i32)]
    lib.wav_decode.restype = i64
    lib.wav_decode.argtypes = [ctypes.c_char_p, f32p, i64]
    lib.mono_mix.argtypes = [f32p, i64, i32, f32p]
    lib.peak_normalize.argtypes = [f32p, i64, ctypes.c_float]
    lib.resample_out_len.restype = i64
    lib.resample_out_len.argtypes = [i64, i32, i32]
    lib.resample_poly.restype = i64
    lib.resample_poly.argtypes = [f32p, i64, i32, i32, f32p, i64]
    lib.gather_rows.argtypes = [f32p, i64, ctypes.POINTER(i64), i32, f32p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def read_wav(path: str | Path) -> tuple[np.ndarray, int]:
    """Native WAV decode → ((channels, T) float32, sr)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    sr = ctypes.c_int32()
    ch = ctypes.c_int32()
    frames = lib.wav_info(str(path).encode(), ctypes.byref(sr), ctypes.byref(ch))
    if frames < 0:
        raise IOError(f"cannot parse {path}")
    buf = np.empty(frames * ch.value, dtype=np.float32)
    got = lib.wav_decode(str(path).encode(), _fp(buf), frames)
    if got < 0:
        raise IOError(f"decode failed for {path}")
    return buf[: got * ch.value].reshape(-1, ch.value).T.copy(), sr.value


def mono_mix(data: np.ndarray) -> np.ndarray:
    lib = _load()
    inter = np.ascontiguousarray(data.T, dtype=np.float32)  # (T, C)
    out = np.empty(inter.shape[0], dtype=np.float32)
    lib.mono_mix(_fp(inter), inter.shape[0], inter.shape[1], _fp(out))
    return out


def peak_normalize(x: np.ndarray, eps: float = 1e-9) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float32)
    lib.peak_normalize(_fp(x), x.size, eps)
    return x


def resample(x: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    if sr == target_sr:
        return np.asarray(x, dtype=np.float32)
    from math import gcd

    lib = _load()
    g = gcd(sr, target_sr)
    up, down = target_sr // g, sr // g
    x = np.ascontiguousarray(x, dtype=np.float32)
    n_out = lib.resample_out_len(len(x), up, down)
    out = np.empty(n_out, dtype=np.float32)
    got = lib.resample_poly(_fp(x), len(x), up, down, _fp(out), n_out)
    return out[:got]


def standardize(path: str | Path, target_sr: int) -> np.ndarray:
    """Native decode → mono → resample → peak-norm (fast path of
    dlsc_tpu.data.wav.standardize)."""
    data, sr = read_wav(path)
    mono = mono_mix(data)
    res = resample(mono, sr, target_sr)
    return peak_normalize(res)


def gather_rows(base: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """out[b] = base[idx[b]] — batch assembly from a (N, T) shard."""
    lib = _load()
    base = np.ascontiguousarray(base, dtype=np.float32)
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    out = np.empty((len(idx), base.shape[1]), dtype=np.float32)
    lib.gather_rows(_fp(base), base.shape[1],
                    idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                    len(idx), _fp(out))
    return out
