"""Process-level JAX runtime configuration.

``setup_jax()`` is called by every CLI, bench and the graft entry before any
computation: it turns on the persistent compilation cache (compiles of the
ViT-L towers through a remote-compile backend can take minutes; with the
cache they are one-time per machine) and applies precision policy knobs.
"""

from __future__ import annotations

import logging
import os


def setup_jax(precision: str | None = None) -> None:
    import jax

    cache_dir = os.environ.get(
        "KEDS_TPU_JAX_CACHE",
        os.path.expanduser("~/.cache/keds_tpu/jax_cache"),
    )
    if cache_dir and cache_dir != "0":
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except Exception as e:  # pragma: no cover - older jax
            logging.debug("compilation cache unavailable: %s", e)
    if precision == "fp32":
        jax.config.update("jax_default_matmul_precision", "highest")
