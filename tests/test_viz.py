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


def test_live_view_frame_fn():
    """The slice explorer's frame function: slice moves must not
    recompile (cut is traced) and both slice axes must render finite
    norm images."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import jax.numpy as jnp
    from live_view import make_frame_fn, derivative_shade
    from legmov_tpu import get_m2_leg

    frame = make_frame_fn(get_m2_leg(), 64, 32, 8.0, use_pallas=False)
    a = np.asarray(frame(jnp.float32(0.0), jnp.bool_(True)))
    b = np.asarray(frame(jnp.float32(100.0), jnp.bool_(True)))
    c = np.asarray(frame(jnp.float32(-200.0), jnp.bool_(False)))
    assert a.shape == (32, 64) and np.isfinite(a).all()
    assert not np.array_equal(a, b)  # the slice actually moved
    assert np.isfinite(c).all()
    d = derivative_shade(a)
    assert d.shape == a.shape and (d >= 0).all()
