"""CLI + viz + checkpoint smoke tests (the driver layer, SURVEY §2 C10)."""

import json
import os

import numpy as np

from boslam.cli import main
from boslam.io.g2o import parse_g2o


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
        g3, _, it, lam = load_npz(p, g2, meta)
        assert it == 7 and lam == 0.5
        np.testing.assert_allclose(np.asarray(g3.poses), np.asarray(g.poses))


def test_synth_cli(tmp_path):
    out = tmp_path / "seq.g2o"
    rc = main(["synth", "--poses", "50", "--landmarks", "30", "--out", str(out)])
    assert rc == 0
    ig = parse_g2o(str(out), use_native=False)
    gt = parse_g2o(str(out).replace(".g2o", "_ground_truth.g2o"), use_native=False)
    assert ig.n_poses == 50
    assert len(gt.lm_ids) > 0


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
