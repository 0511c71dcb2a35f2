"""ctypes bindings for the host-side native runtime (native/vstpu_runtime.cpp).

The reference's host runtime is C++ behind JNI (jni/jni_part.cpp,
jni/MapMaker.cc:80-123); this module binds our TPU-native equivalent:

- :func:`decode_image` / :class:`FramePipeline` — native image decode +
  multi-threaded prefetch so the jitted per-frame program never waits on IO;
- :func:`scheduler_next` — the MapMaker priority policy as a native decision
  function;
- :func:`blob_write` / :func:`blob_read` — fast binary map checkpoints.

The library auto-builds on first use (``make`` in ``native/``).  When the
toolchain is unavailable every entry point raises
:class:`NativeRuntimeUnavailable`; callers (datasets, slam) fall back to the
pure-Python path so the framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, List, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libvstpu_runtime.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_error: Optional[str] = None


class NativeRuntimeUnavailable(RuntimeError):
    pass


# MapTask ids (native/vstpu_runtime.cpp MapTask enum, mirroring the
# priority ladder of jni/MapMaker.cc:80-123). HandleBadPoints is NOT a
# task: the reference runs it unconditionally every run()-loop pass
# (MapMaker.cc:116), so the host runs it after every dispatched task.
TASK_NONE = 0
TASK_BA_RECENT = 1
TASK_REFIND_NEWLY = 2
TASK_BA_ALL = 3
TASK_REFIND_FAILURES = 4
TASK_ADD_KEYFRAME = 6


def _build() -> None:
    subprocess.run(
        ["make", "-s"], cwd=_NATIVE_DIR, check=True,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    )


def load() -> ctypes.CDLL:
    """Load (building if needed) the native library; raises
    NativeRuntimeUnavailable on failure."""
    global _lib, _load_error
    with _lock:
        if _lib is not None:
            return _lib
        if _load_error is not None:
            raise NativeRuntimeUnavailable(_load_error)
        try:
            if not os.path.exists(_SO_PATH):
                _build()
            lib = ctypes.CDLL(_SO_PATH)
        except Exception as e:  # noqa: BLE001 - any failure => fallback
            _load_error = f"native runtime unavailable: {e}"
            raise NativeRuntimeUnavailable(_load_error) from e

        lib.vstpu_decode_image.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int,
        ]
        lib.vstpu_decode_image.restype = ctypes.c_int
        lib.vstpu_image_size.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.vstpu_image_size.restype = ctypes.c_int
        lib.vstpu_pipeline_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.vstpu_pipeline_create.restype = ctypes.c_void_p
        lib.vstpu_pipeline_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)
        ]
        lib.vstpu_pipeline_next.restype = ctypes.c_int64
        lib.vstpu_pipeline_destroy.argtypes = [ctypes.c_void_p]
        lib.vstpu_pipeline_destroy.restype = None
        lib.vstpu_scheduler_next.argtypes = [ctypes.c_int] * 6
        lib.vstpu_scheduler_next.restype = ctypes.c_int
        lib.vstpu_blob_write.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_int,
        ]
        lib.vstpu_blob_write.restype = ctypes.c_int
        lib.vstpu_blob_read_index.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_int,
        ]
        lib.vstpu_blob_read_index.restype = ctypes.c_int
        lib.vstpu_blob_read_section.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_uint64,
        ]
        lib.vstpu_blob_read_section.restype = ctypes.c_int
        _lib = lib
        return lib


def available() -> bool:
    try:
        load()
        return True
    except NativeRuntimeUnavailable:
        return False


def decode_image(path: str, width: int, height: int) -> np.ndarray:
    """Decode PGM/PPM/PNG to u8 grayscale resized to (height, width)."""
    lib = load()
    out = np.empty((height, width), np.uint8)
    rc = lib.vstpu_decode_image(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        width, height,
    )
    if rc != 0:
        raise IOError(f"native decode failed: {path}")
    return out


def image_size(path: str) -> tuple:
    lib = load()
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.vstpu_image_size(path.encode(), ctypes.byref(w),
                            ctypes.byref(h)) != 0:
        raise IOError(f"native decode failed: {path}")
    return w.value, h.value


class FramePipeline:
    """Prefetching frame loader: worker threads decode+resize ahead of the
    consumer; frames are delivered strictly in order."""

    def __init__(self, paths: Sequence[str], width: int, height: int,
                 n_workers: int = 2, capacity: int = 8):
        self._lib = load()
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._handle = self._lib.vstpu_pipeline_create(
            arr, len(self._paths), width, height, n_workers, capacity
        )
        if not self._handle:
            raise NativeRuntimeUnavailable("pipeline_create failed")
        self._shape = (height, width)

    def __iter__(self):
        while True:
            out = np.empty(self._shape, np.uint8)
            idx = self._lib.vstpu_pipeline_next(
                self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
            )
            if idx == -1:
                return
            if idx == -2:
                continue  # undecodable frame: skip, matching dataset loaders
            yield int(idx), out

    def close(self) -> None:
        if self._handle:
            self._lib.vstpu_pipeline_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:  # noqa: BLE001 - interpreter shutdown
            pass


def scheduler_next(queue_size: int, recent_converged: bool,
                   full_converged: bool, has_failure_queue: bool,
                   has_newly_made: bool, rand20: bool) -> int:
    """MapMaker::run() priority decision (jni/MapMaker.cc:80-123): the
    next ONE work unit to dispatch. SLAMSystem._mapmaker_step is the
    single consumer; scheduler_next_py is the fallback/oracle."""
    lib = load()
    return lib.vstpu_scheduler_next(
        int(queue_size), int(recent_converged), int(full_converged),
        int(has_failure_queue), int(has_newly_made), int(rand20),
    )


def scheduler_next_py(queue_size: int, recent_converged: bool,
                      full_converged: bool, has_failure_queue: bool,
                      has_newly_made: bool, rand20: bool) -> int:
    """Pure-Python mirror of :func:`scheduler_next` (fallback + oracle).

    Every BA/refind rung requires an empty queue (MapMaker.cc:97,102,
    107,112), so a non-empty queue goes straight to keyframe integration
    (:120-121); the failure-queue rung is reached only when recent && full
    converged, matching :112."""
    if queue_size > 0:
        return TASK_ADD_KEYFRAME
    if not recent_converged:
        return TASK_BA_RECENT
    if has_newly_made:
        return TASK_REFIND_NEWLY
    if not full_converged:
        return TASK_BA_ALL
    if rand20 and has_failure_queue:
        return TASK_REFIND_FAILURES
    return TASK_NONE


def blob_write(path: str, sections: Dict[str, np.ndarray]) -> None:
    """Write named u8-viewed arrays as a VSTPU1 binary checkpoint."""
    lib = load()
    names: List[bytes] = []
    bufs: List[np.ndarray] = []
    for k, v in sections.items():
        names.append(k.encode())
        bufs.append(np.ascontiguousarray(v).view(np.uint8).reshape(-1))
    n = len(names)
    name_arr = (ctypes.c_char_p * n)(*names)
    ptr_arr = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for b in bufs]
    )
    size_arr = (ctypes.c_uint64 * n)(*[b.nbytes for b in bufs])
    if lib.vstpu_blob_write(path.encode(), name_arr, ptr_arr, size_arr,
                            n) != 0:
        raise IOError(f"blob write failed: {path}")


def blob_read(path: str) -> Dict[str, np.ndarray]:
    """Read a VSTPU1 checkpoint to {name: u8 array} (caller re-views)."""
    lib = load()
    max_sections = 256
    names_buf = ctypes.create_string_buffer(max_sections * 128)
    sizes = (ctypes.c_uint64 * max_sections)()
    n = lib.vstpu_blob_read_index(
        path.encode(), names_buf, len(names_buf), sizes, max_sections
    )
    if n < 0:
        raise IOError(f"blob read failed: {path}")
    names: List[str] = []
    off = 0
    raw = names_buf.raw
    for _ in range(n):
        end = raw.index(b"\0", off)
        names.append(raw[off:end].decode())
        off = end + 1
    out: Dict[str, np.ndarray] = {}
    for i, name in enumerate(names):
        buf = np.empty(sizes[i], np.uint8)
        if lib.vstpu_blob_read_section(
            path.encode(), i,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.nbytes,
        ) != 0:
            raise IOError(f"blob section read failed: {path}:{name}")
        out[name] = buf
    return out
