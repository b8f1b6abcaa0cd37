"""LR schedule: cosine decay with linear warmup, matching the reference
(``src/third_party/open_clip/scheduler.py:10-19``):

    step < warmup:  lr = base * (step + 1) / warmup
    else:           lr = 0.5 * base * (1 + cos(pi * e / es))
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_lr(base_lr: float, warmup: int, total_steps: int):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (step + 1.0) / max(warmup, 1)
        e = step - warmup
        es = max(total_steps - warmup, 1)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * e / es)) * base_lr
        return jnp.where(step < warmup, warm, cos)

    return schedule
