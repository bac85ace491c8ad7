"""Smoke tests for the report-rendering module (file outputs only)."""

import os

import numpy as np
import jax.numpy as jnp

from legmov_tpu import get_moonbot_leg
from legmov_tpu.ops.distance import distance_batch
from legmov_tpu.ops.reachability import reachability_batch
from legmov_tpu.viz import (
    reachable_volume_m3,
    render_distance,
    render_reachability,
    slice_mask,
)


def _grid(pix=25.0):
    xs = np.arange(-100, 601, pix, dtype=np.float32)
    ys = np.arange(-100, 101, pix, dtype=np.float32)
    zs = np.arange(-400, 101, pix, dtype=np.float32)
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    return np.stack([X.ravel(), Y.ravel(), Z.ravel()], -1)


def test_render_outputs(tmp_path):
    leg = get_moonbot_leg()
    pts = _grid()
    reach = np.asarray(reachability_batch(jnp.asarray(pts), leg))
    _, vec = distance_batch(jnp.asarray(pts), leg)
    rp = os.path.join(tmp_path, "reach.png")
    dp = os.path.join(tmp_path, "dist.png")
    render_reachability(pts, reach, rp)
    render_distance(pts, np.asarray(vec), dp, pix_size=25.0)
    assert os.path.getsize(rp) > 10_000
    assert os.path.getsize(dp) > 10_000


def test_slice_and_volume():
    pts = _grid()
    sel = slice_mask(pts, axis=1, cut=0.0)
    assert sel.any()
    # y slice: all selected share one y value
    assert np.unique(pts[sel][:, 1]).size == 1
    reach = np.zeros(pts.shape[0], bool)
    reach[:100] = True
    assert reachable_volume_m3(reach, 10.0) == 100 * 1e3 / 1e9
