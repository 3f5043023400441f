"""Test configuration: force an 8-virtual-device CPU platform before JAX
initializes, so sharding/collective paths are exercised without TPU hardware
(SURVEY.md §4 implication (d))."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Force CPU even when the environment pre-wires a TPU platform: tests must
# be hermetic and fast. The env var alone is NOT enough — a site plugin may
# set jax.config.jax_platforms directly at interpreter start, and config
# beats env — so override at the config level before any backend init.
# Set DUET_TPU_TEST_REAL=1 to run against real hardware instead.
if not os.environ.get("DUET_TPU_TEST_REAL"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def sim_dataset(tmp_path_factory):
    """One shared small simulated dataset for the session."""
    from duet_tpu.sim import SimConfig, simulate_dataset

    out = tmp_path_factory.mktemp("simdata")
    cfg = SimConfig(contigs={"chr21": 200_000}, seed=7, coverage=18.0,
                    read_len_mean=9_000)
    truth = simulate_dataset(str(out), cfg)
    return str(out), cfg, truth
