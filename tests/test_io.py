"""g2o parser parity (utils/g2o_utils.cpp) + writer roundtrip."""

import numpy as np

from boslam.io.g2o import _parse_python, parse_g2o, write_g2o


def test_full_dataset_counts(full_ig):
    # SURVEY §6: 301 poses, 2132 bearing edges, 300 odometry edges, FIX 1498.
    assert full_ig.n_poses == 301
    assert len(full_ig.bearing_meas) == 2132
    assert len(full_ig.odom_meas) == 300
    assert full_ig.fixed_pose_id == 1498
    assert len(full_ig.lm_ids) == 0  # no VERTEX_XY in the initial guess
    assert len(set(int(i) for i in full_ig.bearing_lm_id)) == 141


def test_full_gt_counts(full_gt):
    assert full_gt.n_poses == 301
    assert len(full_gt.lm_ids) == 141


def test_mini_counts(mini_ig, mini_gt):
    assert mini_ig.n_poses == 3
    assert len(mini_ig.bearing_meas) == 15
    assert len(mini_ig.odom_meas) == 2
    assert mini_gt.n_poses == 3
    assert len(mini_gt.lm_ids) == 6


def test_bearing_omega_defaults_to_one(full_ig):
    # 4th numeric field (57295.8) deliberately ignored; omega = 1
    # (g2o_utils.cpp:112-121, observation.hpp:22-26).
    assert np.all(full_ig.bearing_omega == 1.0)


def test_odom_omega_symmetric(full_ig):
    om = full_ig.odom_omega
    np.testing.assert_array_equal(om, np.swapaxes(om, 1, 2))
    # reference data uses diag-ish [500, 500, 5000]
    np.testing.assert_allclose(om[0], np.diag([500.0, 500.0, 5000.0]))


def test_bound_margin(mini_gt):
    # bound = max|coord| + 3 over both vertex types (g2o_utils.cpp:34-67,134-135)
    coords = np.concatenate(
        [mini_gt.pose_xyt[:, :2].ravel(), mini_gt.lm_xy.ravel()]
    )
    assert np.isclose(mini_gt.bound, np.abs(coords).max() + 3.0, atol=1e-5)


def test_unknown_token_warns(caplog):
    import logging

    with caplog.at_level(logging.WARNING, logger="boslam.io"):
        parsed = _parse_python("FROBNICATE 1 2 3\nVERTEX_SE2 0 0 0 0\nEDGE_BEARING_SE2_XY 0 1 0.5 99\n")
    assert any("FROBNICATE" in r.message for r in caplog.records)
    assert parsed.n_poses == 1


def test_no_fix_record():
    parsed = _parse_python("VERTEX_SE2 7 0 0 0\nEDGE_BEARING_SE2_XY 7 1 0.5 99\n")
    assert parsed.fixed_pose_id == -1


def test_writer_roundtrip(tmp_path, mini_gt):
    out = tmp_path / "roundtrip.g2o"
    write_g2o(
        str(out),
        mini_gt.pose_ids,
        mini_gt.pose_xyt,
        mini_gt.lm_ids,
        mini_gt.lm_xy,
        parsed=mini_gt,
    )
    back = parse_g2o(str(out), use_native=False)
    assert back.pose_ids == mini_gt.pose_ids
    assert back.lm_ids == mini_gt.lm_ids
    assert back.fixed_pose_id == mini_gt.fixed_pose_id
    np.testing.assert_allclose(back.pose_xyt, mini_gt.pose_xyt, rtol=1e-5)
    np.testing.assert_allclose(back.lm_xy, mini_gt.lm_xy, rtol=1e-5)
    np.testing.assert_allclose(back.bearing_meas, mini_gt.bearing_meas, rtol=1e-5)
    np.testing.assert_allclose(back.odom_omega, mini_gt.odom_omega, rtol=1e-5)


def test_parse_g2o_bearings_only(data_dir):
    """Legacy bearings-only overload (g2o_utils.cpp:5-8): same parse, no
    odometry edges."""
    import os

    from boslam.io.g2o import parse_g2o, parse_g2o_bearings_only

    path = os.path.join(data_dir, "slam2D_bearing_only_initial_guess.g2o")
    full = parse_g2o(path, use_native=False)
    legacy = parse_g2o_bearings_only(path, use_native=False)
    assert legacy.n_poses == full.n_poses
    assert len(legacy.bearing_pose_id) == len(full.bearing_pose_id)
    assert len(legacy.odom_src_id) == 0 and len(legacy.odom_meas) == 0
    assert legacy.fixed_pose_id == full.fixed_pose_id
