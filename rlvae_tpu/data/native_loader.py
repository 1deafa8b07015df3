"""ctypes wrapper for the native C++ prefetching data loader.

Builds ``native/dataloader.cpp`` on first use (g++ available in the image;
cached in ``native/build/``) and falls back to the pure-numpy batch iterator
when compilation or loading fails, so the framework never hard-depends on the
toolchain.  Datasets are staged once as a raw float32 ``.bin`` next to their
``.npz`` source (mmap-friendly; the npz is compressed and can't be mapped).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Iterator, Optional

import numpy as np

_REPO = Path(__file__).resolve().parents[2]
_SRC = _REPO / "native" / "dataloader.cpp"
_BUILD = _REPO / "native" / "build"
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False


def _compile() -> Optional[Path]:
    _BUILD.mkdir(parents=True, exist_ok=True)
    so = _BUILD / "libdataloader.so"
    if so.exists() and so.stat().st_mtime >= _SRC.stat().st_mtime:
        return so
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-o", str(so), str(_SRC), "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return so
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        print(f"[native_loader] build failed ({e}); falling back to numpy batching")
        return None


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    so = _compile()
    if so is None:
        _LIB_FAILED = True
        return None
    lib = ctypes.CDLL(str(so))
    lib.rl_loader_create.restype = ctypes.c_void_p
    lib.rl_loader_create.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
    ]
    lib.rl_loader_start_epoch.restype = ctypes.c_int64
    lib.rl_loader_start_epoch.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.rl_loader_next.restype = ctypes.c_int32
    lib.rl_loader_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
    lib.rl_loader_n_batches.restype = ctypes.c_int64
    lib.rl_loader_n_batches.argtypes = [ctypes.c_void_p]
    lib.rl_loader_destroy.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def stage_raw(data: np.ndarray, path: Path) -> Path:
    """Write [N, ...] float32 data as a raw .bin (idempotent by size)."""
    path = Path(path)
    data = np.ascontiguousarray(data, np.float32)
    if not (path.exists() and path.stat().st_size == data.nbytes):
        path.parent.mkdir(parents=True, exist_ok=True)
        data.tofile(path)
    return path


class NativeBatchLoader:
    """Prefetching batch iterator over a raw float32 dataset file.

    Falls back to in-memory numpy batching transparently; check
    ``self.native`` to see which engine is active.
    """

    def __init__(
        self,
        data: np.ndarray,
        batch_size: int,
        raw_path: Optional[Path] = None,
        n_prefetch: int = 2,
        drop_remainder: bool = True,
    ):
        self.sample_shape = data.shape[1:]
        self.batch_size = batch_size
        self.drop_remainder = drop_remainder
        self._data = np.ascontiguousarray(data, np.float32)
        self._handle = None
        lib = _lib()
        if lib is not None:
            if raw_path is None:
                # content-digest filename: id(self)-derived names collide
                # across GC'd loaders / processes and the size-only
                # idempotence check would then serve STALE bytes
                import hashlib

                digest = hashlib.blake2b(
                    self._data.tobytes(), digest_size=12
                ).hexdigest()
                raw_path = _BUILD / f"dataset_{digest}.bin"
            path = stage_raw(self._data, raw_path)
            sample_elems = int(np.prod(self.sample_shape))
            self._handle = lib.rl_loader_create(
                str(path).encode(), data.shape[0], sample_elems, 0,
                batch_size, n_prefetch, int(drop_remainder),
            )
            if not self._handle:
                print("[native_loader] create failed; falling back to numpy")
        self.native = bool(self._handle)

    def epoch(self, seed: int = 0, shuffle: bool = True) -> Iterator[np.ndarray]:
        if self._handle:
            lib = _lib()
            n_batches = lib.rl_loader_start_epoch(
                self._handle, seed if shuffle else -1
            )
            out = np.empty((self.batch_size, *self.sample_shape), np.float32)
            ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            for _ in range(n_batches):
                if not lib.rl_loader_next(self._handle, ptr):
                    break
                yield out.copy()
        else:
            from rlvae_tpu.data.cyclic import batch_iterator

            yield from batch_iterator(
                self._data, self.batch_size, shuffle=shuffle, seed=seed,
                drop_remainder=self.drop_remainder,
            )

    def __del__(self):
        if getattr(self, "_handle", None):
            lib = _lib()
            if lib is not None:
                lib.rl_loader_destroy(self._handle)
            self._handle = None
