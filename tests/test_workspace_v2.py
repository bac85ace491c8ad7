"""Characterization of the reference's dead ``insert_circles_v2`` variant.

Reference: circles.cu.h:304-335 — a circle-stack layout inserting all
four limit circles unconditionally, unused by every active kernel and
defective as committed (attractivity writes land 4 slots past the
inserted circles after ``tail += 4``).  ``numpy_ref._insert_circles_v2``
re-derives the *intended* semantics with the writes applied to the slots
they name; these tests pin (a) the construction and (b) the measured
divergence from the active ``insert_circles`` workspace that plausibly
got the variant abandoned.
"""

import numpy as np
import pytest

import legmov_tpu.oracle.numpy_ref as R
from legmov_tpu.models.leg import get_m2_leg, get_moonbot_leg

f32 = R.f32

LEGS = {"moonbot": get_moonbot_leg, "m2": get_m2_leg}


@pytest.mark.parametrize("name", sorted(LEGS))
def test_v2_stack_construction(name):
    """Layout: inner + negAbs + posAbs + negWinglet + posWinglet
    (+ outer appended iff FullyExtended); per-side attractivity pairs are
    complementary."""
    d = R._leg_scalars(LEGS[name]())
    for upper in (False, True):
        for fal in (False, True):
            for fal_o in (False, True):
                for ext in (False, True):
                    cs = R._insert_circles_v2(d, upper, fal, fal_o, ext)
                    assert len(cs) == 5 + int(ext)
                    assert cs[0].attract is False  # inner repulsive
                    # complementary per-side pairs
                    assert cs[3].attract != cs[1].attract
                    assert cs[4].attract != cs[2].attract
                    # region-side winglet carries fal (matches the active
                    # variant's same-side rule)
                    side_winglet = cs[4] if upper else cs[3]
                    assert side_winglet.attract == fal
                    if ext:
                        assert cs[5].attract is True
                        assert cs[5].radius == f32(
                            d["femur_length"] + d["tibia_length"]
                        )


@pytest.mark.parametrize("name,max_diff_frac", [("moonbot", 0.15), ("m2", 0.13)])
def test_v2_diverges_one_sided(name, max_diff_frac):
    """On a dense plane grid the v2 stack only ever REMOVES area relative
    to the active workspace (never adds), and the removed fraction is the
    measured ~9-11% — evidence the variant is a strictly-more-restrictive
    abandoned draft, not an equivalent formulation."""
    d = R._leg_scalars(LEGS[name]())
    xs = np.linspace(-400, 400, 81, dtype=np.float32)
    ys = np.linspace(-400, 400, 81, dtype=np.float32)
    n_active = n_diff = n_added = 0
    for x in xs:
        for y in ys:
            active = R._eval_plane(f32(x), f32(y), d, False)[0]
            v2 = R._eval_plane_v2(f32(x), f32(y), d)
            n_active += int(active)
            if v2 != active:
                n_diff += 1
                if v2 and not active:
                    n_added += 1
    assert n_added == 0, "v2 must never mark unreachable plane area reachable"
    assert 0 < n_diff <= max_diff_frac * xs.size * ys.size
