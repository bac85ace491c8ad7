"""Regression guards for the benchmark harness itself.

bench.py's chained-slope timer produces the judged numbers; these tests
pin its contract (positive slope, grid envelope) on CPU.
"""

import jax.numpy as jnp
import numpy as np

from bench import chained_timer, make_grid
from legmov_tpu import get_m2_leg
from legmov_tpu.ops.reachability import reachability


def test_make_grid_envelope():
    g = np.asarray(make_grid(1 << 15))
    assert g.shape[1] == 3 and g.dtype == np.float32
    # the reference bench envelope (setting_bench.h:13-18)
    assert g[:, 0].min() == -100.0 and g[:, 0].max() == 601.0
    assert g[:, 2].min() == -350.0 and g[:, 2].max() == 51.0


def test_chained_timer_positive_and_sane():
    leg = get_m2_leg()
    pts = make_grid(1 << 14)

    def scalar(p, leg):
        return jnp.sum(reachability(p, leg).astype(jnp.float32))

    per = chained_timer(scalar, pts, leg, k=8, reps=3)
    assert per > 0
    # per-eval time must be under a second and over a microsecond on CPU
    assert 1e-6 < per < 1.0


def test_ref_sweep_sizes_match_reference_protocol():
    """The sweep must generate EXACTLY the reference's 11 grid sizes
    (bench.cpp:52-181 + setting_bench.h, as committed in
    /root/reference/bdata/pc/rgpu.csv)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from bench_sweep import ref_arange, ref_pitches

    # count via the axis lengths (materializing the 66M grid in CI is
    # pointless); ref_grid() itself is exercised at the small sizes
    from bench_sweep import ref_grid

    sizes = sorted(
        ref_arange(-100.0, 601.0, p).size * ref_arange(-100.0, 51.0, p).size
        for p in ref_pitches()
    )
    assert ref_grid(40.96).shape == (72, 3)
    assert sizes == [72, 280, 1035, 4110, 16166, 64664, 258656,
                     1034152, 4136608, 16544544, 66160650]
