"""Runtime setup and profiling helpers."""

import os

import numpy as np


def test_setup_jax_enables_compilation_cache(tmp_path, monkeypatch):
    import jax

    from keds_tpu.runtime import setup_jax

    cache = str(tmp_path / "jc")
    monkeypatch.setenv("KEDS_TPU_JAX_CACHE", cache)
    setup_jax()
    assert os.path.isdir(cache)
    assert jax.config.jax_compilation_cache_dir == cache


def test_step_timer():
    import time

    from keds_tpu.profiling import StepTimer

    t = StepTimer()
    time.sleep(0.01)
    t.data_ready()
    assert t.data_time >= 0.01
    time.sleep(0.01)
    t.step_done()
    assert t.batch_time >= t.data_time


def test_trace_noop_without_dir():
    from keds_tpu.profiling import trace

    with trace(None):
        pass  # must be a no-op


def test_trace_writes_profile(tmp_path):
    import jax.numpy as jnp

    from keds_tpu.profiling import trace

    d = str(tmp_path / "prof")
    with trace(d):
        _ = float(np.asarray(jnp.ones(8).sum()))
    # a profile subtree appears
    assert any("plugins" in root for root, _, _ in os.walk(d))
