"""Two-process jax.distributed smoke test (VERDICT round-1 item 8).

Exercises the explicit --distributed bring-up (parallel/mesh.py:
maybe_init_distributed with --dist-url + RANK/WORLD_SIZE, the reference's
torch-style launch env) on the CPU backend: both processes join, build a
global mesh, and run one psum collective across hosts.
"""

import os
import pathlib
import socket
import subprocess
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent

CHILD = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from keds_tpu.config import Config
from keds_tpu.parallel.mesh import make_mesh, maybe_init_distributed

cfg = Config(distributed=True, dist_url=os.environ["TEST_DIST_URL"])
maybe_init_distributed(cfg)
# the CLIs call this from both setup_experiment and setup_runtime — the
# second call must be a no-op, not a crash (jax raises 'should only be
# called once' on repeat initialize)
maybe_init_distributed(cfg)
assert jax.process_count() == 2, jax.process_count()

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = make_mesh()  # all global devices
n = mesh.devices.size
assert n == 4, n  # 2 local devices x 2 processes

# one cross-host collective: global sum of a data-sharded array
x = jax.make_array_from_callback(
    (n,), NamedSharding(mesh, P("data")),
    lambda idx: jnp.asarray([float(idx[0].start)]),
)
total = jax.jit(lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P()))(x)
expect = sum(range(n))
got = float(jax.device_get(total))
assert got == expect, (got, expect)
print(f"rank {jax.process_index()}: psum over {n} devices OK ({got})")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_psum():
    port = _free_port()
    env_base = dict(os.environ)
    env_base["PYTHONPATH"] = str(REPO_ROOT) + os.pathsep + env_base.get("PYTHONPATH", "")
    env_base["TEST_DIST_URL"] = f"tcp://127.0.0.1:{port}"
    env_base["JAX_PLATFORMS"] = "cpu"
    env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env_base["WORLD_SIZE"] = "2"
    procs = []
    for rank in range(2):
        env = dict(env_base)
        env["RANK"] = str(rank)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", CHILD], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=str(REPO_ROOT),
        ))
    outs = [p.communicate(timeout=300) for p in procs]
    for rank, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{err[-2000:]}"
        assert "psum over 4 devices OK" in out, out
