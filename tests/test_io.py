"""Binary .bin protocol roundtrip + profiling utilities."""

import os

import numpy as np

from legmov_tpu import io as lio
from legmov_tpu.profiling import StageTimer


def test_points_roundtrip(tmp_path, rng):
    pts = rng.uniform(-100, 100, (500, 3)).astype(np.float32)
    stem = os.path.join(tmp_path, "numpy_input_t")
    lio.save_points(pts, stem)
    for ax in "xyz":
        assert os.path.getsize(f"{stem}{ax}.bin") == 500 * 4
    back = lio.load_points(stem)
    np.testing.assert_array_equal(back, pts)
    x, y, z = lio.load_components(stem)
    np.testing.assert_array_equal(x, pts[:, 0])


def test_bools_roundtrip(tmp_path, rng):
    mask = rng.random(100) > 0.5
    p = os.path.join(tmp_path, "out_reachability.bin")
    lio.save_bools(mask, p)
    np.testing.assert_array_equal(lio.load_bools(p), mask)


def test_missing_file_returns_empty(tmp_path, capsys):
    out = lio.load_array(os.path.join(tmp_path, "nope.bin"))
    assert out.shape == (0,)
    assert "missing file" in capsys.readouterr().out


def test_stage_timer(tmp_path):
    log = os.path.join(tmp_path, "timing_results.txt")
    t = StageTimer(path=log, echo=False)
    with t.stage("warmup"):
        pass
    with t.stage("work"):
        sum(range(1000))
    assert [n for n, _ in t.records] == ["warmup", "work"]
    lines = open(log).read().strip().splitlines()
    assert len(lines) == 2 and lines[1].startswith("work:")
