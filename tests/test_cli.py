"""CLI + viz + checkpoint smoke tests (the driver layer, SURVEY §2 C10)."""

import pytest
import json
import os

import numpy as np

from boslam.cli import main
from boslam.io.g2o import parse_g2o


@pytest.mark.slow
def test_solve_cli_end_to_end(tmp_path, capsys, data_dir):
    out = tmp_path / "optimized.g2o"
    ckpt = tmp_path / "state.npz"
    render = tmp_path / "render.png"
    rc = main(
        [
            "solve",
            os.path.join(data_dir, "slam2D_bearing_only_initial_guess.g2o"),
            "--gt",
            os.path.join(data_dir, "slam2D_bearing_only_ground_truth.g2o"),
            "--init", "triangulate",
            "--iters", "20",
            "--platform", "cpu",
            "--out", str(out),
            "--save", str(ckpt),
            "--render", str(render),
        ]
    )
    assert rc == 0
    cap = capsys.readouterr()
    assert "chi2_robust" in cap.out
    assert "ATE vs ground truth" in cap.out
    # final chi2 near the known optimum
    last_row = [l for l in cap.out.splitlines() if l.startswith("  19")][0]
    assert abs(float(last_row.split()[1]) - 5.8828) < 0.01

    # artifacts exist and re-load
    assert render.exists() and (tmp_path / "render_initial.png").exists()
    back = parse_g2o(str(out), use_native=False)
    assert back.n_poses == 301 and len(back.lm_ids) == 141
    assert back.fixed_pose_id == 1498
    z = np.load(ckpt)
    assert z["poses"].shape == (301, 3)


def test_checkpoint_roundtrip(mini_ig):
    import jax.numpy as jnp

    from boslam.graph.build import build_graph
    from boslam.io.checkpoint import load_npz, save_npz

    g, meta = build_graph(mini_ig, init="triangulate")
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "ck.npz")
        save_npz(p, g, meta, iteration=7, lm_lambda=0.5)
        g2 = g.with_state(jnp.zeros_like(g.poses), jnp.zeros_like(g.landmarks))
        g3, _, it, lam, dp = load_npz(p, g2, meta)
        assert it == 7 and lam == 0.5 and dp is None
        np.testing.assert_allclose(np.asarray(g3.poses), np.asarray(g.poses))

        # dp round-trips when provided (warm-start-exact resume)
        dp_in = np.arange(g.n_poses * 3, dtype=np.float32).reshape(-1, 3)
        save_npz(p, g, meta, iteration=9, dp=dp_in)
        _, _, it, lam, dp = load_npz(p, g2, meta)
        assert it == 9 and lam is None
        np.testing.assert_array_equal(dp, dp_in)


def test_resume_cli_matches_uninterrupted(tmp_path, capsys, data_dir):
    """solve(20) == solve(10) -> save -> resume(20): same continuation.

    Iteration-level resume (SURVEY §5 checkpoint/resume): the checkpoint
    stores the f32 state exactly, and GN steps are deterministic functions
    of the state, so the resumed trajectory matches the uninterrupted one.
    """
    ds = os.path.join(data_dir, "mini_initial_guess.g2o")
    common = ["--init", "triangulate", "--platform", "cpu"]

    ck_full = tmp_path / "full.npz"
    rc = main(["solve", ds, "--iters", "20", "--save", str(ck_full), *common])
    assert rc == 0
    capsys.readouterr()

    ck_half = tmp_path / "half.npz"
    rc = main(["solve", ds, "--iters", "10", "--save", str(ck_half), *common])
    assert rc == 0
    capsys.readouterr()

    ck_resumed = tmp_path / "resumed.npz"
    rc = main(
        ["solve", ds, "--iters", "20", "--resume", str(ck_half),
         "--save", str(ck_resumed), *common]
    )
    assert rc == 0
    cap = capsys.readouterr()
    assert "resumed from" in cap.err and "10 iterations remain" in cap.err

    full = np.load(ck_full)
    res = np.load(ck_resumed)
    assert int(res["iteration"]) == 20
    np.testing.assert_allclose(res["poses"], full["poses"], rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        res["landmarks"], full["landmarks"], rtol=1e-6, atol=1e-7
    )


def test_resume_cli_warm_start_exact(tmp_path, capsys, data_dir):
    """Packed + cg_warm_start resume is iteration-exact (VERDICT r3 weak #6).

    The checkpoint carries the last outer delta, so the first resumed CG
    warm-starts from the same vector the uninterrupted run used.
    """
    ds = os.path.join(data_dir, "mini_initial_guess.g2o")
    common = [
        "--init", "triangulate", "--platform", "cpu", "--packed",
        "--linear-solver", "schur_cg", "--cg-warm-start",
        "--cg-iters", "10", "--cg-tol", "1e-8",
    ]

    ck_full = tmp_path / "full.npz"
    rc = main(["solve", ds, "--iters", "12", "--save", str(ck_full), *common])
    assert rc == 0
    capsys.readouterr()

    ck_half = tmp_path / "half.npz"
    rc = main(["solve", ds, "--iters", "6", "--save", str(ck_half), *common])
    assert rc == 0
    capsys.readouterr()
    assert np.load(ck_half)["dp"].shape[0] > 0  # delta was checkpointed

    ck_resumed = tmp_path / "resumed.npz"
    rc = main(
        ["solve", ds, "--iters", "12", "--resume", str(ck_half),
         "--save", str(ck_resumed), *common]
    )
    assert rc == 0
    capsys.readouterr()

    full = np.load(ck_full)
    res = np.load(ck_resumed)
    np.testing.assert_array_equal(res["poses"], full["poses"])
    np.testing.assert_array_equal(res["landmarks"], full["landmarks"])
    np.testing.assert_array_equal(res["dp"], full["dp"])


def test_resume_cli_lm_lambda(tmp_path, capsys, data_dir):
    """LM resume restores the damping schedule state."""
    ds = os.path.join(data_dir, "mini_initial_guess.g2o")
    common = ["--init", "triangulate", "--platform", "cpu", "--optimizer", "lm"]

    ck = tmp_path / "lm.npz"
    rc = main(["solve", ds, "--iters", "8", "--save", str(ck), *common])
    assert rc == 0
    capsys.readouterr()
    z = np.load(ck)
    assert float(z["lm_lambda"]) > 0  # schedule state recorded

    rc = main(["solve", ds, "--iters", "12", "--resume", str(ck), *common])
    assert rc == 0
    cap = capsys.readouterr()
    assert "lm lambda" in cap.err and "4 iterations remain" in cap.err


def test_pose_range_cli(capsys, data_dir):
    """--pose-range drives the range-sharded solve end to end (r4)."""
    rc = main(
        [
            "solve",
            os.path.join(data_dir, "mini_initial_guess.g2o"),
            "--init", "triangulate",
            "--platform", "cpu",
            "--iters", "8",
            "--pose-range",
            "--linear-solver", "schur_cg",
            "--preconditioner", "block_jacobi",
            "--cg-iters", "50",
            "--cg-tol", "1e-8",
            "--lm-split", "0",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    rows = [l for l in out.splitlines() if l.startswith("   7")]
    assert rows and float(rows[0].split()[1]) < 0.001  # mini optimum ~4.3e-4


def test_interactive_headless_error(capsys, data_dir, monkeypatch):
    """--interactive on a headless box fails with guidance instead of
    silently never showing a window (VERDICT r3 weak #5)."""
    monkeypatch.delenv("DISPLAY", raising=False)
    monkeypatch.delenv("MPLBACKEND", raising=False)
    import matplotlib

    matplotlib.use("Agg", force=True)
    rc = main(
        [
            "solve",
            os.path.join(data_dir, "mini_initial_guess.g2o"),
            "--init", "triangulate",
            "--platform", "cpu",
            "--interactive",
        ]
    )
    assert rc == 2
    err = capsys.readouterr().err
    assert "--interactive" in err and "backend" in err


def test_synth_cli(tmp_path):
    out = tmp_path / "seq.g2o"
    rc = main(["synth", "--poses", "50", "--landmarks", "30", "--out", str(out)])
    assert rc == 0
    ig = parse_g2o(str(out), use_native=False)
    gt = parse_g2o(str(out).replace(".g2o", "_ground_truth.g2o"), use_native=False)
    assert ig.n_poses == 50
    assert len(gt.lm_ids) > 0


def test_print_state_cli(capsys, data_dir):
    """State::print_full_vector equivalent (framework/state.cpp:83-93)."""
    rc = main(
        [
            "solve",
            os.path.join(data_dir, "mini_initial_guess.g2o"),
            "--init", "triangulate",
            "--iters", "2",
            "--platform", "cpu",
            "--print-state",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    state_lines = [l for l in out.splitlines() if l.startswith("State: ")]
    assert len(state_lines) == 1
    # mini data: 3 poses + 6 landmarks -> 3*3 + 2*6 = 21 numbers
    assert len(state_lines[0].split()) == 1 + 21


def test_draw_only_filters(tmp_path):
    """DRAW_ONLY_POSE/LM debug-filter equivalents (definitions.hpp:10-11)."""
    import numpy as np

    from boslam.viz.draw import render_state

    poses = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]], np.float32)
    lms = np.array([[0.5, 1.0], [1.5, 1.0]], np.float32)
    b_pose = np.array([0, 0, 1, 1])
    b_lm = np.array([0, 1, 0, 1])
    b_meas = np.zeros(4, np.float32)
    o_src = np.array([0])
    o_meas = np.array([[1.0, 0.0, 0.0]], np.float32)

    ax_all = render_state(
        poses, lms, bearings=(b_pose, b_meas, b_lm), odometries=(o_src, o_meas)
    )
    ax_f = render_state(
        poses, lms, bearings=(b_pose, b_meas, b_lm), odometries=(o_src, o_meas),
        draw_only_pose=1, draw_only_lm=0,
    )
    # filtered render draws fewer segments (1 bearing vs 4; 0 odo vs 1,
    # each odometry = segment + heading tick, draw_utils.cpp:150-151).
    # overlays are LineCollections now (r4: per-primitive ax.plot loops
    # replaced for 100k-scale renders), so count collection segments.
    def n_segments(ax):
        from matplotlib.collections import LineCollection

        return sum(
            len(c.get_segments())
            for c in ax.collections
            if isinstance(c, LineCollection)
        )

    n_all = n_segments(ax_all)
    n_f = n_segments(ax_f)
    assert n_all - n_f == 5  # 3 bearing rays + 1 odo segment + 1 tick removed
    import matplotlib.pyplot as plt

    plt.close("all")


def test_bench_cli(capsys, data_dir):
    rc = main(
        [
            "bench",
            os.path.join(data_dir, "mini_initial_guess.g2o"),
            "--init", "triangulate",
            "--iters", "5",
            "--platform", "cpu",
        ]
    )
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["iters"] == 5 and rec["iters_per_s"] > 0
