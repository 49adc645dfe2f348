"""Test harness: force an 8-device CPU platform so multi-chip sharding logic
is exercised without TPU hardware (the JAX-native replacement for the
reference's 'spawn NCCL processes to test multi-GPU').

Note: the environment's sitecustomize imports jax at interpreter start (axon
TPU plugin), so env vars alone are too late here — use jax.config.update.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# NOTE: do NOT enable the persistent compilation cache here — XLA:CPU AOT
# entries record pseudo machine features (+prefer-no-scatter) the loader
# can't match on this host, so every lookup fails loudly and slows the suite.
# The cache is for the TPU entry points (bench.py, main.py, __graft_entry__).

import sys  # noqa: E402

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
# Pin sys.modules["main"] to OUR CLI before any test runs: golden-parity
# tests sys.path-insert /root/reference (which has its own main.py), and a
# later `from main import main` would otherwise resolve to whichever root
# comes first at that moment (order-dependent — test_precompile imported the
# reference CLI when run after a golden test).
import main  # noqa: E402, F401

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(3407)
