"""Test configuration.

Tests run on CPU with 8 emulated XLA host devices so that multi-chip sharding
paths (data-parallel mesh, sharded retrieval DB, collective top-k merge) are
exercised without TPU hardware — mirroring SURVEY.md §4's test strategy.

Environment variables must be set before jax is imported anywhere.
"""

import os

# Force CPU: the harness presets JAX_PLATFORMS=axon (the real TPU tunnel);
# the test suite must run on the virtual 8-device CPU mesh instead.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import pathlib
import sys

import jax

# The axon sitecustomize imports jax at interpreter start, so environment
# variables alone are too late — force the platform through the config.
jax.config.update("jax_platforms", "cpu")

import pytest

# Parity tests compare f32 numerics against torch; JAX's DEFAULT matmul
# precision is allowed to use bf16 passes, so force true f32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

REFERENCE_ROOT = pathlib.Path("/root/reference")


def reference_available() -> bool:
    return REFERENCE_ROOT.exists()


requires_reference = pytest.mark.skipif(
    not reference_available(),
    reason="reference checkout (/root/reference) not mounted",
)


@pytest.fixture(scope="session")
def reference_src() -> pathlib.Path:
    """Path to the reference sources, importable for behavioural parity tests.

    Parity tests *run* the reference implementation to compare outputs; no
    reference code is copied into this repo.
    """
    if not reference_available():
        pytest.skip("reference checkout not mounted")
    return REFERENCE_ROOT / "src"
