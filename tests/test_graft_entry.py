"""Driver-contract tests for __graft_entry__.py.

Round-1 failure: the driver ran dryrun_multichip(8) in an environment whose
jax.devices() held exactly one (tunneled TPU) chip, and make_mesh raised
(MULTICHIP_r01.json ok=false).  The entry must now self-host an n-device
virtual CPU mesh via subprocess re-exec whenever the parent is short on
devices.  These tests reproduce the short-on-devices parent condition.
"""

import pytest
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_with_device_count(parent_devices: int, n: int):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if not f.startswith("--xla_force_host_platform_device_count")]
    flags.append(f"--xla_force_host_platform_device_count={parent_devices}")
    env["XLA_FLAGS"] = " ".join(flags)
    env.pop("_P2T_DRYRUN_SUBPROC", None)
    # fresh subprocess = conftest's cache config doesn't apply; without a
    # persistent cache every dryrun compile is cold EVERY suite run (this
    # test measured 479 s of the round-5 suite's 17 min).  Only this test
    # writes this dir — no concurrent-access risk (round-4 segfault was a
    # shared dir raced by TPU processes).
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        REPO, ".jax_cache_tests", "dryrun_subproc")
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1.0"
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        f"assert len(jax.devices()) == {parent_devices}, len(jax.devices()); "
        f"from __graft_entry__ import dryrun_multichip; dryrun_multichip({n})"
    )
    return subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=900,
    )


@pytest.mark.slow
def test_dryrun_self_hosts_when_parent_short_on_devices():
    # Parent sees 1 device (the driver condition); dryrun must re-exec onto
    # a self-hosted 8-device CPU mesh and succeed.
    proc = _run_with_device_count(parent_devices=1, n=8)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip(8)" in proc.stdout
    assert "'dp': 2" in proc.stdout and "'fsdp': 2" in proc.stdout


# NOTE: the direct (devices-sufficient) path is covered by
# tests/test_train_steps.py::test_dryrun_multichip_8 — a second inline
# dryrun here duplicated ~2 min of suite time for zero extra coverage
# (removed round 5, VERDICT r4 #6).
