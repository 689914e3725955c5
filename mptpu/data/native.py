"""ctypes bindings for the native C++ data loader
(``native/dataloader.cpp``): background-thread WAV decode + random-crop
batching so the accelerator never waits on host IO.

Falls back transparently to the pure-python ``batch_stream`` if the shared
library is absent; ``build_native()`` compiles it with make/g++.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmptpu_dataloader.so")

_lib = None


def build_native() -> bool:
    """Compile the shared library; returns True on success."""
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
        )
        return os.path.exists(_LIB_PATH)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        if not build_native():
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_uint,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.loader_next.restype = ctypes.c_int
    lib.loader_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NativeAudioLoader:
    """Iterator of (batch, n_samples) float32 arrays, prefetched by C++
    worker threads."""

    def __init__(
        self,
        paths: List[str],
        batch_size: int,
        n_samples: int,
        step_size: int = 1,
        normalize: bool = False,
        seed: int = 0,
        n_prefetch: int = 4,
        n_threads: int = 2,
    ):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError(
                "native loader unavailable (build failed); use "
                "mptpu.data.batch_stream instead"
            )
        self._lib = lib
        self.batch_size = batch_size
        self.n_samples = n_samples
        encoded = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(encoded))(*encoded)
        self._handle = lib.loader_create(
            arr,
            len(encoded),
            batch_size,
            n_samples,
            step_size,
            int(normalize),
            seed,
            n_prefetch,
            n_threads,
        )
        if not self._handle:
            raise RuntimeError("loader_create failed")
        self._buf = np.zeros((batch_size, n_samples), dtype=np.float32)

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        rc = self._lib.loader_next(
            self._handle,
            self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise StopIteration
        return self._buf.copy()

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def native_available() -> bool:
    return _load_lib() is not None
