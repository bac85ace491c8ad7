"""End-to-end CLI pipeline test (prepare -> evaluate -> report) on CPU."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(tmp, *argv):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-m", "legmov_tpu.cli", *argv],
        cwd=tmp, env=env, capture_output=True, text=True, timeout=900,
    )


@pytest.mark.slow
def test_pipeline_end_to_end(tmp_path):
    tmp = str(tmp_path)
    r = run_cli(tmp, "prepare", "--pix-size", "40")
    assert r.returncode == 0, r.stderr
    for stem in ("numpy_input_t", "numpy_input_b", "dist_input_t"):
        for ax in "xyz":
            assert os.path.exists(os.path.join(tmp, "data", f"{stem}{ax}.bin"))

    r = run_cli(tmp, "evaluate", "--leg", "moonbot")
    assert r.returncode == 0, r.stderr
    assert "reachable fraction" in r.stdout
    frac = float(r.stdout.split("reachable fraction:")[1].strip())
    assert 0.02 < frac < 0.2  # crescent occupies ~7% of the query box

    reach = np.fromfile(
        os.path.join(tmp, "data", "out_reachability.bin"), np.uint8
    )
    dx = np.fromfile(os.path.join(tmp, "data", "out_dist_xx.bin"), np.float32)
    assert reach.shape == dx.shape

    r = run_cli(tmp, "report", "--pix-size", "40")
    assert r.returncode == 0, r.stderr
    assert os.path.exists(os.path.join(tmp, "data", "reachability_result.png"))
    assert os.path.exists(os.path.join(tmp, "data", "distance_result.png"))
    assert os.path.exists(os.path.join(tmp, "data", "leg0_reach.npy"))


@pytest.mark.slow
def test_adaptive_evaluate_matches_dense(tmp_path):
    """`evaluate --adaptive` (recursive_kernel product surface): exact
    reachability vs the dense path, far fewer distance evaluations, and
    painted distances bounded by the certification geometry."""
    tmp = str(tmp_path)
    r = run_cli(tmp, "prepare", "--pix-size", "20")
    assert r.returncode == 0, r.stderr

    r = run_cli(tmp, "evaluate", "--leg", "moonbot")
    assert r.returncode == 0, r.stderr
    data = os.path.join(tmp, "data")
    reach_dense = np.fromfile(
        os.path.join(data, "out_reachability.bin"), np.uint8
    )
    dist_dense = np.stack(
        [np.fromfile(os.path.join(data, f"out_dist_x{ax}.bin"), np.float32)
         for ax in "xyz"], -1,
    )

    r = run_cli(tmp, "evaluate", "--leg", "moonbot", "--adaptive")
    assert r.returncode == 0, r.stderr
    assert "adaptive:" in r.stdout
    evals = int(r.stdout.split("points,")[1].split("exact")[0].strip())
    n = reach_dense.size
    # the eval-count claim at this COARSE 20 mm pitch: ~3x below dense
    # (the exact band is one pitch wide around the boundary surface, so
    # its fraction shrinks linearly with pitch — the O(N^(2/3)) scaling
    # shows at the fine grids; the on-chip 16M run in RESULTS.md is the
    # measurement of record)
    assert evals < n // 3
    assert evals < 40 * n ** (2.0 / 3.0)

    reach_ad = np.fromfile(
        os.path.join(data, "out_reachability.bin"), np.uint8
    )
    np.testing.assert_array_equal(reach_ad, reach_dense)

    dist_ad = np.stack(
        [np.fromfile(os.path.join(data, f"out_dist_x{ax}.bin"), np.float32)
         for ax in "xyz"], -1,
    )
    # painted (cell-center) distances can differ from the dense value by
    # at most the certified cell's diameter; exact-band points match the
    # tolerance contract.  Norm check covers both regimes coarsely.
    dn_a = np.linalg.norm(dist_ad, axis=1)
    dn_d = np.linalg.norm(dist_dense, axis=1)
    assert np.abs(dn_a - dn_d).max() < 200.0  # root box / 2^depth scale
    assert np.median(np.abs(dn_a - dn_d)) < 25.0


@pytest.mark.slow
def test_evaluate_backend_switch(tmp_path):
    """`evaluate --backend oracle|ik` (the reference main()'s
    ComputeMode switch, several_leg.cpp:143-148): the CPU twin must
    bit-match the default path; the LM-IK baseline is an independent
    algorithm and only needs to land in the same fraction ballpark."""
    tmp = str(tmp_path)
    r = run_cli(tmp, "prepare", "--pix-size", "40")
    assert r.returncode == 0, r.stderr
    data = os.path.join(tmp, "data")

    r = run_cli(tmp, "evaluate", "--leg", "moonbot")
    assert r.returncode == 0, r.stderr
    reach_default = np.fromfile(
        os.path.join(data, "out_reachability.bin"), np.uint8
    )

    r = run_cli(tmp, "evaluate", "--leg", "moonbot", "--backend", "oracle")
    assert r.returncode == 0, r.stderr
    reach_oracle = np.fromfile(
        os.path.join(data, "out_reachability.bin"), np.uint8
    )
    np.testing.assert_array_equal(reach_oracle, reach_default)

    r = run_cli(tmp, "evaluate", "--leg", "moonbot", "--backend", "ik")
    assert r.returncode == 0, r.stderr
    assert "reachability only" in r.stdout
    reach_ik = np.fromfile(
        os.path.join(data, "out_reachability.bin"), np.uint8
    )
    agree = (reach_ik == reach_default).mean()
    assert agree > 0.97  # independent iterative method, small band differs


@pytest.mark.slow
def test_map_feasibility(tmp_path):
    tmp = str(tmp_path)
    r = run_cli(tmp, "prepare", "--pix-size", "40", "--voxel", "800")
    assert r.returncode == 0, r.stderr

    r = run_cli(
        tmp, "map", "--legs", "4", "--k", "3", "--window", "256",
        "--pose-chunk", "64",
    )
    assert r.returncode == 0, r.stderr
    import json

    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["body_candidates"] > 0
    # some hovering candidates are feasible, grounded/high ones are not
    assert 0 < stats["feasible"] < stats["body_candidates"]

    mask = np.load(os.path.join(tmp, "data", "body_feasible.npy"))
    assert mask.sum() == stats["feasible"]
    fx = np.fromfile(
        os.path.join(tmp, "data", "out_feasible_body_x.bin"), np.float32
    )
    assert fx.shape[0] == stats["feasible"]
