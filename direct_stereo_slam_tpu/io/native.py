"""ctypes bindings for the native runtime library (native/dsslam_native.cpp).

Provides PGM/PPM decoding, the fused photometric+geometric undistortion and
the threaded prefetching stereo frame queue. Falls back gracefully (raises
``NativeUnavailable``) when the shared library has not been built — every
native path has a pure-Python equivalent in the framework; the native one
removes host preprocessing from the per-frame critical path."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_LIB = None
_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SO = os.path.join(_ROOT, "native", "libdsslam_native.so")


class NativeUnavailable(RuntimeError):
    pass


def _host_key() -> str:
    """Digest of this host's CPU feature flags. The library builds with
    -march=native; a sandbox migration to a host with a different
    microarchitecture makes a stale .so emit illegal/mismatched
    instructions (observed as SIGABRT heap-corruption aborts elsewhere in
    the process), so the loader rebuilds whenever the flags change."""
    try:
        import hashlib
        with open("/proc/cpuinfo") as f:
            flags = next(l for l in f if l.startswith("flags"))
        return hashlib.md5(flags.encode()).hexdigest()[:12]
    except Exception:
        return "unknown"


def build_native() -> str:
    """Compile the shared library (g++, no external deps) and stamp it
    with the build host's CPU-flags digest."""
    subprocess.run(["make", "-C", os.path.join(_ROOT, "native")], check=True,
                   capture_output=True)
    try:
        with open(_SO + ".hostkey", "w") as f:
            f.write(_host_key())
    except OSError:
        pass
    return _SO


def _stale_for_this_host() -> bool:
    try:
        with open(_SO + ".hostkey") as f:
            return f.read().strip() != _host_key()
    except OSError:
        return True     # unstamped: assume foreign, rebuild once


def _lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO) or _stale_for_this_host():
        try:
            build_native()
        except Exception as e:  # toolchain missing
            if not os.path.exists(_SO):
                raise NativeUnavailable(f"cannot build native library: {e}")
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        # stale or foreign-architecture .so: rebuild once, then give up
        # gracefully (callers fall back to the pure-Python path)
        try:
            os.remove(_SO)
            build_native()
            lib = ctypes.CDLL(_SO)
        except Exception as e:
            raise NativeUnavailable(f"cannot load native library: {e}")
    lib.pnm_probe.argtypes = [ctypes.c_char_p] + [ctypes.POINTER(ctypes.c_int)] * 3
    lib.pnm_probe.restype = ctypes.c_int
    lib.pnm_read.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
                             ctypes.c_int]
    lib.pnm_read.restype = ctypes.c_int
    F = ctypes.POINTER(ctypes.c_float)
    lib.undistort_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        F, F, F, F, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.queue_create.argtypes = [ctypes.c_int]
    lib.queue_create.restype = ctypes.c_void_p
    lib.queue_start.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        F, F, F, F, F, F,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.queue_pop.argtypes = [ctypes.c_void_p, F, F,
                              ctypes.POINTER(ctypes.c_double),
                              ctypes.POINTER(ctypes.c_int)]
    lib.queue_pop.restype = ctypes.c_int
    lib.queue_destroy.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def _fp(a: Optional[np.ndarray]):
    if a is None:
        return ctypes.cast(None, ctypes.POINTER(ctypes.c_float))
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def read_pnm(path: str) -> np.ndarray:
    lib = _lib()
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.pnm_probe(path.encode(), ctypes.byref(w), ctypes.byref(h), ctypes.byref(c))
    if rc != 0:
        raise IOError(f"pnm_probe({path}) -> {rc}")
    out = np.empty(w.value * h.value * c.value, np.uint8)
    rc = lib.pnm_read(path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                      out.size)
    if rc != 0:
        raise IOError(f"pnm_read({path}) -> {rc}")
    if c.value == 1:
        return out.reshape(h.value, w.value)
    return out.reshape(h.value, w.value, 3)


def undistort(src_u8: np.ndarray, map_x: Optional[np.ndarray],
              map_y: Optional[np.ndarray], lut: Optional[np.ndarray] = None,
              n_threads: int = 4) -> np.ndarray:
    """Fused LUT + bilinear remap; identity maps -> pass map_x=map_y=None."""
    lib = _lib()
    src = np.ascontiguousarray(src_u8, np.uint8)
    in_h, in_w = src.shape
    if map_x is None:
        ys, xs = np.mgrid[0:in_h, 0:in_w].astype(np.float32)
        map_x, map_y = xs, ys
    map_x = np.ascontiguousarray(map_x, np.float32)
    map_y = np.ascontiguousarray(map_y, np.float32)
    out_h, out_w = map_x.shape
    out = np.empty((out_h, out_w), np.float32)
    lut_c = np.ascontiguousarray(lut, np.float32) if lut is not None else None
    lib.undistort_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), in_w, in_h,
        _fp(lut_c), _fp(map_x), _fp(map_y), _fp(out), out_w, out_h, n_threads)
    return out


class NativeStereoLoader:
    """Threaded prefetching stereo frame loader over PGM/PPM file lists."""

    def __init__(self, files0: List[str], files1: List[str],
                 timestamps: List[float],
                 in_size: Tuple[int, int], out_size: Tuple[int, int],
                 map_x0=None, map_y0=None, map_x1=None, map_y1=None,
                 lut0=None, lut1=None, capacity: int = 8, n_threads: int = 4):
        lib = _lib()
        self._lib = lib
        in_w, in_h = in_size
        out_w, out_h = out_size
        if map_x0 is None:
            ys, xs = np.mgrid[0:out_h, 0:out_w].astype(np.float32)
            map_x0, map_y0 = xs.copy(), ys.copy()
        if map_x1 is None:
            map_x1, map_y1 = map_x0, map_y0
        # keep buffers alive for the loader thread
        self._keep = [np.ascontiguousarray(a, np.float32) if a is not None else None
                      for a in (map_x0, map_y0, map_x1, map_y1, lut0, lut1)]
        self.out_w, self.out_h = out_w, out_h
        self.n = len(files0)
        self._h = lib.queue_create(capacity)
        stamps = np.asarray(timestamps, np.float64)
        lib.queue_start(
            self._h, "\n".join(files0).encode(), "\n".join(files1).encode(),
            stamps.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), self.n,
            _fp(self._keep[4]), _fp(self._keep[5]),
            _fp(self._keep[0]), _fp(self._keep[1]),
            _fp(self._keep[2]), _fp(self._keep[3]),
            in_w, in_h, out_w, out_h, n_threads)

    def __iter__(self):
        while True:
            img0 = np.empty((self.out_h, self.out_w), np.float32)
            img1 = np.empty((self.out_h, self.out_w), np.float32)
            ts = ctypes.c_double()
            fid = ctypes.c_int()
            rc = self._lib.queue_pop(self._h, _fp(img0), _fp(img1),
                                     ctypes.byref(ts), ctypes.byref(fid))
            if rc == 0:
                return
            yield {"img0": img0, "img1": img1, "timestamp": ts.value,
                   "incoming_id": fid.value}

    def close(self):
        if self._h:
            self._lib.queue_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
