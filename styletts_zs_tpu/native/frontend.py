"""ctypes bridge to the native host frontend (libstz_frontend.so).

Builds on first use if the shared object is missing (g++ is baked into the
image); every entry point has a numpy fallback in utils/audio.py, so the
framework works without the native build — just slower on host-side prep.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libstz_frontend.so")
_LIB = None
_TRIED = False
_LOGGED: set[str] = set()


def _log_once(msg: str) -> None:
    """One stderr line per distinct message — a silent fallback pinned the
    numpy path for a whole session once (ADVICE r2)."""
    if msg not in _LOGGED:
        _LOGGED.add(msg)
        import sys
        print(f"styletts_zs_tpu.native: {msg}", file=sys.stderr)


def _require():
    """Public-twin guard: the docstrings advertise these as callable
    directly, so a missing lib must raise clearly, not AttributeError."""
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "native libstz_frontend.so unavailable (build failed or g++ "
            "missing); use the numpy twins in styletts_zs_tpu.utils.audio "
            "(resample_poly_np / estimate_f0 / frame_energy)")
    return lib


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    # Always invoke make: it is mtime-based, so an up-to-date .so is a
    # no-op, and a PREBUILT-BUT-STALE .so (older than frontend.cc, e.g.
    # after a pull that adds symbols) gets rebuilt instead of raising
    # AttributeError at symbol-binding time below.
    try:
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True, timeout=120)
    except Exception as e:  # fall through: a current .so may still exist
        _log_once(f"native frontend build failed ({e!r}); "
                  f"using prebuilt .so if present, else numpy fallback")
    if not os.path.exists(_SO):
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:
        _log_once(f"libstz_frontend.so unloadable ({e}); numpy fallback")
        return None
    try:
        return _bind(lib)
    except AttributeError as e:
        # .so predates a symbol and the rebuild failed -> numpy fallback
        _log_once(f"libstz_frontend.so stale ({e}); numpy fallback")
        return None


def _bind(lib):
    global _LIB
    lib.stz_n_frames.restype = ctypes.c_int64
    lib.stz_n_frames.argtypes = [ctypes.c_int64, ctypes.c_int32,
                                 ctypes.c_int32]
    lib.stz_frame_energy.restype = None
    lib.stz_frame_energy.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_float)]
    lib.stz_estimate_f0.restype = None
    lib.stz_estimate_f0.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8)]
    lib.stz_resample_out_len.restype = ctypes.c_int64
    lib.stz_resample_out_len.argtypes = [ctypes.c_int64, ctypes.c_int32,
                                         ctypes.c_int32]
    lib.stz_resample_poly.restype = None
    lib.stz_resample_poly.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_double,
        ctypes.POINTER(ctypes.c_float)]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def estimate_f0(wav: np.ndarray, sample_rate: int, *, hop: int = 300,
                frame_length: int = 1200, fmin: float = 60.0,
                fmax: float = 400.0, threshold: float = 0.1):
    lib = _require()
    wav = np.ascontiguousarray(wav, np.float32)
    n_frames = lib.stz_n_frames(len(wav), frame_length, hop)
    f0 = np.zeros(n_frames, np.float32)
    voiced = np.zeros(n_frames, np.uint8)
    lib.stz_estimate_f0(
        _fptr(wav), len(wav), sample_rate, hop, frame_length, fmin, fmax,
        threshold, _fptr(f0),
        voiced.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return f0, voiced.astype(bool)


def frame_energy(wav: np.ndarray, *, hop: int = 300,
                 frame_length: int = 1200) -> np.ndarray:
    lib = _require()
    wav = np.ascontiguousarray(wav, np.float32)
    n_frames = lib.stz_n_frames(len(wav), frame_length, hop)
    out = np.zeros(n_frames, np.float32)
    lib.stz_frame_energy(_fptr(wav), len(wav), frame_length, hop, _fptr(out))
    return out


def resample_poly(wav: np.ndarray, sr_in: int, sr_out: int, *,
                  half: int = 10, beta: float = 8.6) -> np.ndarray:
    """Native Kaiser-windowed-sinc polyphase resampler (twin:
    utils/audio.py ``resample_poly_np``)."""
    lib = _require()
    wav = np.ascontiguousarray(wav, np.float32)
    out_n = lib.stz_resample_out_len(len(wav), sr_in, sr_out)
    out = np.zeros(out_n, np.float32)
    lib.stz_resample_poly(_fptr(wav), len(wav), sr_in, sr_out, half, beta,
                          _fptr(out))
    return out
