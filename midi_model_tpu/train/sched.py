"""Learning-rate schedule: linear warmup then linear decay to zero.

Parity with the reference schedule (/root/reference/train.py:93-103).
"""

from __future__ import annotations

import jax.numpy as jnp


def linear_warmup_decay(base_lr: float, warmup_steps: int, total_steps: int):
    """Returns an optax-compatible schedule fn."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        decay = jnp.maximum(
            0.0, (total_steps - step) / jnp.maximum(1.0, total_steps - warmup_steps))
        return base_lr * jnp.where(step < warmup_steps, warm, decay)

    return schedule
