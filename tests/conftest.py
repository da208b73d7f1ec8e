"""Test harness: force an 8-device virtual CPU mesh before JAX import.

SURVEY §4 implication: multi-device tests run on CPU via
``xla_force_host_platform_device_count`` — the fake-backend mechanism the
reference lacks.  Must happen before anything imports jax.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# In this image a sitecustomize pre-imports jax and registers a remote TPU
# ("axon") backend before conftest runs, so the env var alone is too late —
# the platform must be forced through the live config object before any
# computation happens.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

DATA_DIR = "/root/reference/data"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def data_dir():
    return DATA_DIR


@pytest.fixture(scope="session")
def mini_ig():
    from boslam.io.g2o import parse_g2o

    return parse_g2o(os.path.join(DATA_DIR, "mini_initial_guess.g2o"))


@pytest.fixture(scope="session")
def mini_gt():
    from boslam.io.g2o import parse_g2o

    return parse_g2o(os.path.join(DATA_DIR, "mini_ground_truth.g2o"))


@pytest.fixture(scope="session")
def full_ig():
    from boslam.io.g2o import parse_g2o

    return parse_g2o(os.path.join(DATA_DIR, "slam2D_bearing_only_initial_guess.g2o"))


@pytest.fixture(scope="session")
def full_gt():
    from boslam.io.g2o import parse_g2o

    return parse_g2o(os.path.join(DATA_DIR, "slam2D_bearing_only_ground_truth.g2o"))


@pytest.fixture
def rng():
    return np.random.default_rng(0)
