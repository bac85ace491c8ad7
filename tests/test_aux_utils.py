"""Auxiliary host utilities: stats shims, StageTimer, live_view frames.

Covers the reference-parity helpers (math_util.cpp:7-43 stats, the
CUDA_TIMING_* append-to-file habit of HeaderCUDA.h:161-198) and the
realtime-viewer counterpart's frame function (tools/live_view.py,
the AutoEstimator pipeline of cuda_openGLmess.cu as a pure function).
"""

import numpy as np
import pytest

from legmov_tpu.profiling import StageTimer
from legmov_tpu.stats import close, mean_stddev, median


def test_median_matches_reference_semantics():
    assert median([3.0, 1.0, 2.0]) == 2.0
    assert median([4.0, 1.0, 3.0, 2.0]) == 2.5  # mean of the two middles
    with pytest.raises(ValueError):
        median([])


def test_mean_stddev_population():
    m, s = mean_stddev([1.0, 2.0, 3.0, 4.0])
    assert m == 2.5
    assert s == pytest.approx(np.sqrt(1.25))  # population, not sample


def test_close_absolute_tolerance():
    assert close(1.0, 1.0 + 5e-6)
    assert not close(1.0, 1.0 + 2e-5)
    assert close(100.0, 100.5, tol=1.0)


def test_stage_timer_records_and_appends(tmp_path):
    path = str(tmp_path / "timing_results.txt")
    t = StageTimer(path=path, echo=False)
    with t.stage("alpha"):
        pass
    with t.stage("beta", sync=np.zeros(1)):
        pass
    names = [n for n, _ in t.records]
    assert names == ["alpha", "beta"]
    assert all(dt >= 0.0 for _, dt in t.records)
    lines = open(path).read().strip().splitlines()
    assert len(lines) == 2 and lines[0].startswith("alpha:")


def test_live_view_frame_function():
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), os.pardir, "tools")
    )
    from live_view import derivative_shade, make_frame_fn

    from legmov_tpu.models.leg import get_m2_leg

    frame = make_frame_fn(get_m2_leg(), width=64, height=48, scale=16.0,
                          use_pallas=False)
    img = np.asarray(frame(0.0, axis_is_z=True))
    assert img.shape == (48, 64)
    assert np.isfinite(img).all()
    # the y=0 slice through the M2 workspace has both reachable (norm 0
    # inside means distance-to-edge > 0) and far regions
    assert img.max() > img.min()
    # a z slice at the coxa plane differs from the y slice
    img2 = np.asarray(frame(0.0, axis_is_z=False))
    assert img2.shape == (48, 64)
    shaded = derivative_shade(img)
    assert shaded.shape == img.shape and np.isfinite(shaded).all()
