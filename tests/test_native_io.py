"""Native C++ tokenizer vs the Python reference parser — must agree exactly
on every dataset and on synthetic files."""

import os
import subprocess

import numpy as np
import pytest

NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"
)


@pytest.fixture(scope="module", autouse=True)
def built_lib():
    if not os.path.exists(os.path.join(NATIVE_DIR, "libboslam_io.so")):
        r = subprocess.run(["make", "-C", NATIVE_DIR], capture_output=True, text=True)
        if r.returncode != 0:
            pytest.skip(f"native build failed: {r.stderr[-500:]}")
    yield


def _compare(path):
    from boslam.io.g2o import parse_g2o
    from boslam.io.native import parse_g2o_native

    a = parse_g2o(path, use_native=False)
    b = parse_g2o_native(path)
    assert b is not None
    assert a.pose_ids == b.pose_ids
    assert a.lm_ids == b.lm_ids
    assert a.fixed_pose_id == b.fixed_pose_id
    assert abs(a.bound - b.bound) < 1e-4
    np.testing.assert_array_equal(a.pose_xyt, b.pose_xyt)
    np.testing.assert_array_equal(a.lm_xy, b.lm_xy)
    np.testing.assert_array_equal(a.bearing_pose_id, b.bearing_pose_id)
    np.testing.assert_array_equal(a.bearing_lm_id, b.bearing_lm_id)
    np.testing.assert_array_equal(a.bearing_meas, b.bearing_meas)
    np.testing.assert_array_equal(a.odom_src_id, b.odom_src_id)
    np.testing.assert_array_equal(a.odom_meas, b.odom_meas)
    np.testing.assert_array_equal(a.odom_omega, b.odom_omega)


@pytest.mark.parametrize(
    "name",
    [
        "slam2D_bearing_only_initial_guess.g2o",
        "slam2D_bearing_only_ground_truth.g2o",
        "mini_initial_guess.g2o",
        "mini_ground_truth.g2o",
    ],
)
def test_native_matches_python_on_datasets(data_dir, name):
    _compare(os.path.join(data_dir, name))


def test_native_matches_python_on_synthetic(tmp_path):
    from boslam.io.g2o import write_g2o
    from boslam.synth import generate_sequence

    ig, gt = generate_sequence(200, 80, seed=5)
    p = tmp_path / "synth.g2o"
    write_g2o(str(p), gt.pose_ids, gt.pose_xyt, gt.lm_ids, gt.lm_xy, parsed=gt,
              fixed_pose_id=gt.fixed_pose_id)
    _compare(str(p))


def test_native_handles_unknown_and_empty(tmp_path):
    from boslam.io.native import parse_g2o_native

    p = tmp_path / "odd.g2o"
    p.write_text("\nBOGUS 1 2\nVERTEX_SE2 3 1 2 0.5\n\nFIX 3\n")
    b = parse_g2o_native(str(p))
    assert b.pose_ids == [3]
    assert b.fixed_pose_id == 3
