"""Native (C++) host-runtime components.

Compiled lazily with the in-image toolchain on first import; falls back to
the pure-Python paths when a compiler is unavailable (`available()` gates).
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig

import numpy as np

_mod = None
_tried = False


def _build_and_load():
    global _mod, _tried
    if _tried:
        return _mod
    _tried = True
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "graph_builder.cpp")
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(here, "_graph_builder" + suffix)
    if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
        include = sysconfig.get_paths()["include"]
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
            f"-I{include}", src, "-o", out,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        except Exception:
            return None
    sys.path.insert(0, here)
    try:
        import _graph_builder as mod  # noqa: PLC0415

        _mod = mod
    except ImportError:
        _mod = None
    finally:
        sys.path.pop(0)
    return _mod


def available() -> bool:
    return _build_and_load() is not None


def build_obs_edges(matches, kf_of_kp, cam_of_kp, local_of_kp, prev_slot,
                    lm_keys, lm_vals, stereo_cam: int):
    """Native observation-edge extraction. Returns (mono (Em,5), stereo (Es,3))
    float64 arrays with rows [i, j, lm, cam, kp_index] / [pose, lm, kp_index]."""
    mod = _build_and_load()
    mono_b, st_b = mod.build_obs_edges(
        np.ascontiguousarray(matches, np.int64),
        np.ascontiguousarray(kf_of_kp, np.int32),
        np.ascontiguousarray(cam_of_kp, np.int32),
        np.ascontiguousarray(local_of_kp, np.int32),
        np.ascontiguousarray(prev_slot, np.int32),
        np.ascontiguousarray(lm_keys, np.int64),
        np.ascontiguousarray(lm_vals, np.int32),
        int(stereo_cam),
    )
    mono = np.frombuffer(mono_b, np.float64).reshape(-1, 5)
    st = np.frombuffer(st_b, np.float64).reshape(-1, 3)
    return mono, st


def hamming_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Native popcount Hamming table for (N,32)x(M,32) uint8 descriptors."""
    mod = _build_and_load()
    out = mod.hamming_matrix(
        np.ascontiguousarray(a, np.uint8), np.ascontiguousarray(b, np.uint8)
    )
    return np.frombuffer(out, np.int32).reshape(len(a), len(b)).copy()
