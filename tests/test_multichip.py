"""Multi-chip sharding validation in a subprocess.

Runs __graft_entry__.dryrun_multichip on an 8-virtual-device CPU mesh in a
child process, because --xla_force_host_platform_device_count must never be
set in the main test process (see conftest.py). Heavy (slow-mode XLA
compiles) — gated like the reference's `serial_` tests.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    os.environ.get("ZKEVM_TPU_HEAVY") != "1",
    reason="multichip dryrun compiles under XLA's slow forced-device mode; set ZKEVM_TPU_HEAVY=1",
)
def test_dryrun_multichip_8dev():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');\n"
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n"
        "print('DRYRUN_OK')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=3000,
    )
    assert "DRYRUN_OK" in out.stdout, out.stdout + out.stderr
