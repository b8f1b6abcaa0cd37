"""Driver-entry regression tests.

Round 1's single red driver artifact was ``dryrun_multichip`` inheriting the
caller's (TPU-tunnel) JAX backend and dying on a libtpu mismatch.  The fix
re-execs a subprocess with the CPU platform forced in the child environment;
these tests exercise the wrapper from a parent that does NOT set any JAX
platform env vars — exactly the driver's calling convention.
"""

import os
import pathlib
import subprocess
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent


def test_dryrun_multichip_forces_cpu_child():
    """dryrun_multichip must succeed from a parent with no JAX env forcing."""
    env = dict(os.environ)
    # Simulate the driver: no CPU forcing, no device-count flag.
    env.pop("JAX_PLATFORMS", None)
    env.pop("JAX_PLATFORM_NAME", None)
    env["XLA_FLAGS"] = " ".join(
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env["PYTHONPATH"] = str(REPO_ROOT) + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__ as g; g.dryrun_multichip(2); print('PARENT_OK')",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
        cwd=str(REPO_ROOT),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "PARENT_OK" in proc.stdout
    assert "step OK" in proc.stdout
