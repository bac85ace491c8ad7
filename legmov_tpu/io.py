"""Binary pointcloud I/O: the reference's ``.bin`` SoA file protocol.

The reference moves data between Python and the CUDA binaries as raw
float32 component files ``<stem>x.bin / <stem>y.bin / <stem>z.bin``
(before.py:7-9, math_util.cpp:45-104 ``saveArrayToFile`` /
``readArrayFromFile`` / ``threeArrays2float3Arr``).  We keep the exact
on-disk format so datasets prepared for the reference work here unchanged.
"""

from __future__ import annotations

import os

import numpy as np


def save_array(arr: np.ndarray, path: str) -> None:
    """Raw little-endian bytes, no header (math_util.cpp:45-61)."""
    np.asarray(arr).tofile(path)


def load_array(path: str, dtype=np.float32) -> np.ndarray:
    """Read a raw array; missing file -> empty array with a warning,
    matching the reference's behavior (math_util.cpp:82-86)."""
    if not os.path.exists(path):
        print(f"[legmov_tpu.io] missing file: {path}")
        return np.empty(0, dtype)
    return np.fromfile(path, dtype=dtype)


def save_points(points: np.ndarray, stem: str) -> None:
    """``[N, 3] -> <stem>x.bin, <stem>y.bin, <stem>z.bin`` float32.

    Mirrors ``savef3Arrayto3files`` (math_util.cpp:130-170).
    """
    pts = np.asarray(points, np.float32)
    for i, ax in enumerate("xyz"):
        save_array(pts[:, i], f"{stem}{ax}.bin")


def load_components(stem: str):
    """``<stem>{x,y,z}.bin -> (x, y, z)`` float32 SoA arrays."""
    comps = [load_array(f"{stem}{ax}.bin") for ax in "xyz"]
    n = min(c.shape[0] for c in comps)
    return tuple(c[:n] for c in comps)


def load_points(stem: str) -> np.ndarray:
    """``<stem>{x,y,z}.bin -> [N, 3]`` float32 (``threeArrays2float3Arr``)."""
    return np.stack(load_components(stem), axis=-1)


def save_bools(mask: np.ndarray, path: str) -> None:
    """Reachability output: 1 byte per point (out_reachability.bin)."""
    np.asarray(mask, np.uint8).tofile(path)


def load_bools(path: str) -> np.ndarray:
    return load_array(path, np.uint8).astype(bool)
