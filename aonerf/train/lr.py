"""Learning-rate schedule: log-lerp decay with a sin warm-delay.

Reference parity: models/vanilla_nerf/model.py:391-419 (optimizer_step):
  lr(step) = delay(step) * exp(lerp(log lr_init -> log lr_final, step/max))
  delay(step) = m + (1-m) * sin(pi/2 * clip(step/delay_steps, 0, 1))
Defaults: lr 5e-4 -> 5e-6 over run_max_steps=100k, delay 2500 steps, m=0.01.

Implemented as a pure jnp function so it traces inside the jitted step
(the reference mutates optimizer param groups host-side every step).
"""

import jax.numpy as jnp
import numpy as np


def log_lerp_lr(
    step: jnp.ndarray,
    lr_init: float = 5.0e-4,
    lr_final: float = 5.0e-6,
    max_steps: int = 100_000,
    lr_delay_steps: int = 2500,
    lr_delay_mult: float = 0.01,
) -> jnp.ndarray:
    step = jnp.asarray(step, dtype=jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1.0 - lr_delay_mult) * jnp.sin(
            0.5 * np.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
        )
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    scaled = jnp.exp(np.log(lr_init) * (1.0 - t) + np.log(lr_final) * t)
    return delay_rate * scaled
