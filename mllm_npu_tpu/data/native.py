"""ctypes bindings to the native data-loader core (native/mllm_native.cc).

Falls back silently when the library isn't built — every consumer keeps
a pure-Python path (streams.iter_tar_members / PIL decode). Build with
``make -C native`` (or scripts/build_native.sh).
"""

from __future__ import annotations

import ctypes
import logging
import os
from pathlib import Path
from typing import Iterator, Optional

import numpy as np

log = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libmllm_native.so"
_lib = None
_build_attempted = False


def _maybe_build() -> None:
    """Build the library from source once if it isn't present.

    The .so is not checked into git (it's a build artifact); first use
    compiles it via the Makefile. Failures are logged and the caller
    falls back to the pure-Python path.
    """
    global _build_attempted
    if _build_attempted:
        return
    _build_attempted = True
    if not (_NATIVE_DIR / "mllm_native.cc").exists():
        return
    import subprocess
    try:
        proc = subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)], capture_output=True,
            text=True, timeout=120)
        if proc.returncode != 0:
            log.warning("native lib build failed:\n%s", proc.stderr)
    except (OSError, subprocess.TimeoutExpired) as e:  # noqa: BLE001
        log.warning("native lib build failed: %s", e)


class _TarMember(ctypes.Structure):
    _fields_ = [("name", ctypes.c_char * 256),
                ("size", ctypes.c_int64)]


def load_library() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        _maybe_build()
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError as e:  # noqa: BLE001
        log.warning("native lib failed to load: %s", e)
        return None
    lib.tar_open.restype = ctypes.c_void_p
    lib.tar_open.argtypes = [ctypes.c_char_p]
    lib.tar_next.restype = ctypes.c_int
    lib.tar_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(_TarMember)]
    lib.tar_read_data.restype = ctypes.c_int
    lib.tar_read_data.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_uint8),
                                  ctypes.c_int64]
    lib.tar_close.argtypes = [ctypes.c_void_p]
    lib.jpeg_decode_resize_normalize.restype = ctypes.c_int
    lib.jpeg_decode_batch.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return load_library() is not None


def iter_tar_members_native(path: str) -> Iterator[tuple[str, bytes]]:
    """Drop-in for streams.iter_tar_members using the C reader."""
    lib = load_library()
    assert lib is not None
    handle = lib.tar_open(path.encode())
    if not handle:
        log.warning("native tar open failed: %s", path)
        return
    try:
        member = _TarMember()
        while lib.tar_next(handle, ctypes.byref(member)):
            size = int(member.size)
            buf = (ctypes.c_uint8 * size)()
            if not lib.tar_read_data(handle, buf, size):
                log.warning("truncated tar member in %s", path)
                return
            name = member.name.decode(errors="replace")
            yield f"{path}/{name}", bytes(buf)
    finally:
        lib.tar_close(handle)


def decode_image(jpeg_bytes: bytes, out_size: int, mean, std
                 ) -> Optional[np.ndarray]:
    """JPEG → normalized float32 [H, W, 3] via the C pipeline."""
    lib = load_library()
    assert lib is not None
    out = np.empty((out_size, out_size, 3), np.float32)
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    ok = lib.jpeg_decode_resize_normalize(
        (ctypes.c_uint8 * len(jpeg_bytes)).from_buffer_copy(jpeg_bytes),
        len(jpeg_bytes), out_size, out_size,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out if ok else None


def decode_batch(jpeg_list: list[bytes], out_size: int, mean, std,
                 num_threads: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Parallel batch decode → (images [N,H,W,3], ok_mask [N])."""
    lib = load_library()
    assert lib is not None
    n = len(jpeg_list)
    outs = np.empty((n, out_size, out_size, 3), np.float32)
    results = np.zeros((n,), np.int32)
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)

    buf_keep = [(ctypes.c_uint8 * len(b)).from_buffer_copy(b)
                for b in jpeg_list]
    data_ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[ctypes.cast(b, ctypes.POINTER(ctypes.c_uint8))
          for b in buf_keep])
    lens = (ctypes.c_int64 * n)(*[len(b) for b in jpeg_list])
    out_ptrs = (ctypes.POINTER(ctypes.c_float) * n)(
        *[outs[i].ctypes.data_as(ctypes.POINTER(ctypes.c_float))
          for i in range(n)])
    lib.jpeg_decode_batch(
        data_ptrs, lens, n, out_size, out_size,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_ptrs, results.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        num_threads)
    return outs, results.astype(bool)
