"""Native (C++) host-runtime components, loaded via ctypes.

Build with `make -C acas2d_tpu/native` (or the build() helper below, which
shells out to g++ on first use).  Every native component has a pure-Python
fallback so the framework works without a toolchain; tests assert the native
and Python paths agree bit-for-bit.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libacas2d_native.so")
_SRC = os.path.join(_DIR, "mt_spawner.cc")


def build(force: bool = False) -> Optional[str]:
    """Compile the native library if needed; returns its path or None."""
    if not force and os.path.exists(_SO) and (
            os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-ffp-contract=off", "-shared", "-fPIC",
             "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120)
        return _SO
    except (OSError, subprocess.SubprocessError):
        return None


_lib = None


def load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    so = build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.mt_new.restype = ctypes.c_void_p
    lib.mt_new.argtypes = [ctypes.c_uint32]
    lib.mt_free.argtypes = [ctypes.c_void_p]
    lib.mt_random.restype = ctypes.c_double
    lib.mt_random.argtypes = [ctypes.c_void_p]
    lib.mt_uniform.restype = ctypes.c_double
    lib.mt_uniform.argtypes = [ctypes.c_void_p, ctypes.c_double,
                               ctypes.c_double]
    lib.mt_randint.restype = ctypes.c_int64
    lib.mt_randint.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                               ctypes.c_int64]
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.mt_spawn_batch.argtypes = (
        [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
         ctypes.c_int64, ctypes.c_int64] + [ctypes.c_double] * 10 +
        [i32p, f64p, f64p, f64p, f64p, f64p])
    _lib = lib
    return lib


class NativeMersenneSpawner:
    """Drop-in, batched, native counterpart of oracle.MersenneSpawner.

    spawn_arrays(count) returns the struct-of-arrays form directly
    (num_traffic (B,), player_psi (B,), traffic_* (B, max_traffic)) —
    what the vmapped reset_from wants.
    """

    def __init__(self, params=None, seed: Optional[int] = None,
                 skip_episodes: int = 0):
        from acas2d_tpu.config import DEFAULT_PARAMS
        from acas2d_tpu.ops import kinematics  # noqa: F401 (doc parity)
        self.p = params or DEFAULT_PARAMS
        lib = load()
        if lib is None:
            raise RuntimeError("native library unavailable; use "
                               "oracle.MersenneSpawner")
        self._lib = lib
        self._h = lib.mt_new(self.p.seed if seed is None else seed)
        self._pending_skip = skip_episodes
        # bearing player->goal is constant for the fixed spawn geometry
        import math
        self._bearing = math.degrees(
            math.atan2(self.p.goal_y - self.p.player_y0,
                       self.p.goal_x - self.p.player_x0) % (2 * math.pi))

    def __del__(self):
        try:
            self._lib.mt_free(self._h)
        except Exception:
            pass

    def spawn_arrays(self, count: int):
        p = self.p
        T = p.max_traffic
        nt = np.empty(count, np.int32)
        psi = np.empty(count, np.float64)
        tx = np.empty((count, T), np.float64)
        ty = np.empty((count, T), np.float64)
        tv = np.empty((count, T), np.float64)
        tpsi = np.empty((count, T), np.float64)
        self._lib.mt_spawn_batch(
            self._h, self._pending_skip, count,
            p.min_traffic, p.max_traffic, p.width, p.height,
            p.collision_radius, p.aircraft_size, p.airspeed,
            p.airspeed_factor_min, p.airspeed_factor_max,
            p.player_initial_heading_lim, p.traffic_initial_heading_lim,
            self._bearing,
            nt, psi, tx.reshape(-1), ty.reshape(-1), tv.reshape(-1),
            tpsi.reshape(-1))
        self._pending_skip = 0
        return nt, psi, tx, ty, tv, tpsi
