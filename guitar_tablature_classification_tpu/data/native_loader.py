"""ctypes binding for the native host data path (native/tabhost.cc).

Provides WAV decode, window framing and a threaded shuffling batch loader
in C++ — keeping the host able to feed TPU-sized batches without Python
in the per-sample loop.  Falls back to the pure-NumPy implementations in
:mod:`.audio` / :mod:`..ops.framing` when the shared library is absent;
``ensure_built()`` compiles it on demand with g++.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Sequence

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtabhost.so")
_lib = None


def ensure_built(*, quiet: bool = True) -> bool:
    """Build libtabhost.so if missing. Returns availability."""
    if os.path.exists(_LIB_PATH):
        return True
    src = os.path.join(_NATIVE_DIR, "tabhost.cc")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=quiet,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    return os.path.exists(_LIB_PATH)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not ensure_built():
        raise RuntimeError("libtabhost.so unavailable (g++/make missing?)")
    lib = ctypes.CDLL(_LIB_PATH)
    lib.tabhost_wav_read.restype = ctypes.c_int64
    lib.tabhost_wav_read.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.tabhost_frame_windows.restype = ctypes.c_int64
    lib.tabhost_frame_windows.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    lib.tabhost_loader_create.restype = ctypes.c_void_p
    lib.tabhost_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_uint64, ctypes.c_int32,
    ]
    lib.tabhost_loader_num_windows.restype = ctypes.c_int64
    lib.tabhost_loader_num_windows.argtypes = [ctypes.c_void_p]
    lib.tabhost_loader_next.restype = ctypes.c_int32
    lib.tabhost_loader_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.tabhost_loader_destroy.restype = None
    lib.tabhost_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except RuntimeError:
        return False


def wav_read(path: str) -> tuple[np.ndarray, int]:
    """Native WAV decode -> (mono float32, sample_rate)."""
    lib = _load()
    sr = ctypes.c_int32(0)
    n = lib.tabhost_wav_read(path.encode(), None, 0, ctypes.byref(sr))
    if n < 0:
        raise IOError(f"tabhost: cannot read {path!r} ({n})")
    out = np.empty(n, dtype=np.float32)
    got = lib.tabhost_wav_read(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, ctypes.byref(sr),
    )
    if got != n:
        raise IOError(f"tabhost: short read on {path!r}")
    return out, int(sr.value)


def frame_windows(
    samples: np.ndarray, window: int, hop: int
) -> np.ndarray:
    """Native sliding-window extraction -> [num, window] float32."""
    lib = _load()
    samples = np.ascontiguousarray(samples, dtype=np.float32)
    n = samples.shape[0]
    num = 0 if n < window else (n - window) // hop + 1
    out = np.empty((num, window), dtype=np.float32)
    got = lib.tabhost_frame_windows(
        samples.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, window,
        hop, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num,
    )
    return out[:got]


class NativeWindowLoader:
    """Threaded shuffling window loader over many WAV tracks.

    Yields ([B, window] float32 audio, [B] track ids, [B] start offsets)
    forever, reshuffling deterministically each epoch.
    """

    def __init__(
        self,
        paths: Sequence[str],
        *,
        window_samples: int,
        hop_samples: int,
        batch_size: int,
        seed: int = 0,
        num_threads: int = 4,
    ):
        lib = _load()
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths]
        )
        self._lib = lib
        self._handle = lib.tabhost_loader_create(
            arr, len(paths), window_samples, hop_samples, batch_size,
            seed, num_threads,
        )
        if not self._handle:
            raise IOError(f"tabhost: failed to open tracks {paths[:3]}...")
        self.batch_size = batch_size
        self.window_samples = window_samples

    def __len__(self) -> int:
        return int(self._lib.tabhost_loader_num_windows(self._handle))

    def next_batch(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        audio = np.empty((self.batch_size, self.window_samples), np.float32)
        tracks = np.empty(self.batch_size, np.int32)
        starts = np.empty(self.batch_size, np.int64)
        got = self._lib.tabhost_loader_next(
            self._handle,
            audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            tracks.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return audio[:got], tracks[:got], starts[:got]

    def close(self) -> None:
        if self._handle:
            self._lib.tabhost_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
