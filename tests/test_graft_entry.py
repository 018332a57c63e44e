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


@pytest.mark.slow
def test_dryrun_direct_when_devices_sufficient():
    import jax

    from __graft_entry__ import dryrun_multichip

    assert len(jax.devices()) >= 8
    dryrun_multichip(8)  # runs inline, raises on failure
