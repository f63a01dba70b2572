"""Native (C++) kernel loader.

The reference leans on compiled extensions for its CPU hot loops (Numba for
EMA normalization, pyedflib's C core for EDF decode). Here those are C++
sources under ``native/src`` compiled once into a shared library and bound
via ctypes. If no compiler is available the callers fall back to pure
numpy/JAX implementations.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(__file__)
_SRC_DIR = os.path.join(_DIR, 'src')
_LIB_PATH = os.path.join(_DIR, '_libw2s.so')

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_load_failed = False


def _sources() -> list[str]:
    return sorted(
        os.path.join(_SRC_DIR, f) for f in os.listdir(_SRC_DIR) if f.endswith('.cpp')
    )


_CFLAGS = ['-O3', '-march=native', '-std=c++17', '-shared', '-fPIC']
_BUILDINFO_PATH = _LIB_PATH + '.buildinfo'


def _buildinfo() -> str:
    """Fingerprint of the compile flags and build host. ``-march=native``
    bakes the build host's ISA into the .so; a lib carried to a different
    CPU (repo baked into an image, copied over NFS) would SIGILL mid-decode
    instead of taking the documented pure-Python fallback — so the cached
    lib is only reused when the flags AND the host CPU match."""
    import platform

    cpu = ''
    try:
        with open('/proc/cpuinfo') as f:
            for line in f:
                if line.startswith('model name'):
                    cpu = line.split(':', 1)[1].strip()
                    break
    except OSError:
        pass
    return f'{" ".join(_CFLAGS)}|{platform.machine()}|{cpu}'


def _needs_rebuild() -> bool:
    if not os.path.exists(_LIB_PATH):
        return True
    try:
        with open(_BUILDINFO_PATH) as f:
            if f.read() != _buildinfo():
                return True
    except OSError:
        return True
    lib_mtime = os.path.getmtime(_LIB_PATH)
    return any(os.path.getmtime(src) > lib_mtime for src in _sources())


def build(force: bool = False) -> str | None:
    """Compile the native library. Returns the .so path or None on failure."""
    if not force and not _needs_rebuild():
        return _LIB_PATH
    srcs = _sources()
    if not srcs:
        return None
    # Compile to a temp path and rename into place: g++ -o truncates the
    # output in place, which corrupts the mmap of any OTHER live process
    # that already dlopen'd the previous build (SIGBUS mid-decode). The
    # rename swaps the directory entry atomically; existing maps keep the
    # old inode.
    tmp_path = f'{_LIB_PATH}.build.{os.getpid()}'
    cmd = ['g++', *_CFLAGS, '-o', tmp_path, *srcs]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        os.replace(tmp_path, _LIB_PATH)
    except (OSError, subprocess.SubprocessError) as e:
        logger.warning(f'Native build failed ({e}); falling back to pure-Python kernels.')
        try:
            os.unlink(tmp_path)
        except OSError:
            pass
        return None
    try:
        with open(_BUILDINFO_PATH, 'w') as f:
            f.write(_buildinfo())
    except OSError:
        pass
    return _LIB_PATH


def get_lib() -> ctypes.CDLL | None:
    """Return the loaded native library, building it on first use."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        path = build()
        if path is None:
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError as e:
            logger.warning(f'Failed to load native library: {e}')
            _load_failed = True
            return None
        _configure(lib)
        _lib = lib
    return _lib


def _configure(lib: ctypes.CDLL) -> None:
    import numpy.ctypeslib as npc
    import numpy as np

    f64 = npc.ndpointer(dtype=np.float64, flags='C_CONTIGUOUS')
    f32 = npc.ndpointer(dtype=np.float32, flags='C_CONTIGUOUS')
    u8 = npc.ndpointer(dtype=np.uint8, flags='C_CONTIGUOUS')
    c_double = ctypes.c_double
    c_i64 = ctypes.c_int64

    lib.w2s_ema_stats.argtypes = [
        f64, c_i64, c_double, c_double, c_double, c_double, c_double, c_double, c_double,
        f64, f64, u8,
    ]
    lib.w2s_ema_stats.restype = None
    lib.w2s_ema_normalize_f32.argtypes = [
        f32, c_i64, c_double, c_double, c_double, c_double, c_double, c_double, c_double,
        f32, u8,
    ]
    lib.w2s_ema_normalize_f32.restype = None

    i16 = npc.ndpointer(dtype=np.int16, flags='C_CONTIGUOUS')
    lib.w2s_decode_resample.argtypes = [
        i16, c_i64, c_i64, c_i64, c_i64,
        c_double, c_double, c_double, c_double, c_double, c_double,
        f64, c_i64, f32,
    ]
    lib.w2s_decode_resample.restype = None

    lib.w2s_resample_q16.argtypes = [
        i16, c_i64, c_i64, c_i64, c_i64,
        c_double, c_double, c_i64, i16,
    ]
    lib.w2s_resample_q16.restype = c_i64

    i8 = npc.ndpointer(dtype=np.int8, flags='C_CONTIGUOUS')
    lib.w2s_resample_q8.argtypes = [
        i16, c_i64, c_i64, c_i64, c_i64,
        c_double, c_double, c_i64, i8, ctypes.POINTER(ctypes.c_double),
    ]
    lib.w2s_resample_q8.restype = c_i64

    lib.w2s_resample_dpcm4.argtypes = [
        i16, c_i64, c_i64, c_i64, c_i64,
        c_double, c_double, c_i64, c_i64, f64, u8, ctypes.POINTER(ctypes.c_double),
    ]
    lib.w2s_resample_dpcm4.restype = c_i64

    lib.w2s_mulaw8_encode_f32.argtypes = [
        f32, c_i64, i8, ctypes.POINTER(ctypes.c_float),
    ]
    lib.w2s_mulaw8_encode_f32.restype = ctypes.c_int32
