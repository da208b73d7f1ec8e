"""Multi-process (2-process CPU cluster) distributed-backend test.

The only way to exercise the DCN-path layer (``jax.distributed.initialize``
+ cross-process collectives) without a TPU pod: two subprocesses, each
with 2 virtual CPU devices, joined into one 4-device JAX platform.  The
sharded packed LM solve then runs its psums across the process boundary.
Delegates to tools/distributed_smoke.py (also runnable standalone; its
recorded output is DISTRIBUTED_r03.json).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_cluster_parity():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "distributed_smoke.py")],
        capture_output=True, text=True, timeout=600, cwd=REPO,
        env={k: v for k, v in os.environ.items()
             if k not in ("XLA_FLAGS", "JAX_PLATFORMS")},
    )
    assert r.returncode == 0, r.stderr[-3000:]
    record = json.loads(r.stdout.strip().splitlines()[-1])
    assert record["ok"]
    assert record["processes"] == 2
    assert record["global_devices"] == 4
    assert record["chi2_crossprocess_equal"]
    assert record["accepted_crossprocess_equal"]
    assert record["chi2_vs_single_process_max_rel"] < 2e-3
