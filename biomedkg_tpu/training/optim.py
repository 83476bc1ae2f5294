"""Optimizer + LR schedule wiring (optax).

Reference: Adam at cfg.learning_rate with HF transformers'
get_linear/cosine_schedule_with_warmup over the trainer's estimated total
steps, plus gradient clipping 1.0 at the Trainer level
(/root/reference/biomedkg/kge_module.py:208-230, train_kge.py:75).
"""

from __future__ import annotations

import math

import optax


def warmup_schedule(scheduler_type: str, learning_rate: float,
                    num_training_steps: int, warm_up_ratio: float):
    """HF-style warmup schedules.

    linear: lr ramps 0→lr over warmup, then decays linearly to 0.
    cosine: lr ramps 0→lr, then follows 0.5·(1+cos(π·progress)) to 0.
    """
    num_warmup = int(num_training_steps * warm_up_ratio)

    # validate eagerly: a typo'd scheduler (e.g. "consine") must fail at
    # config time, not silently train at constant LR after warmup
    if scheduler_type not in ("linear", "cosine", "constant"):
        raise ValueError(
            f"unknown scheduler_type {scheduler_type!r} "
            "(expected linear | cosine | constant)")

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, num_warmup)
        progress = (step - num_warmup) / jnp.maximum(
            1.0, num_training_steps - num_warmup)
        if scheduler_type == "linear":
            decay = jnp.maximum(0.0, 1.0 - progress)
        elif scheduler_type == "cosine":
            decay = jnp.maximum(
                0.0, 0.5 * (1.0 + jnp.cos(math.pi * progress)))
        else:
            decay = jnp.ones_like(progress)
        return learning_rate * jnp.where(step < num_warmup, warm, decay)

    return schedule


def make_optimizer(learning_rate: float, scheduler_type: str,
                   num_training_steps: int, warm_up_ratio: float,
                   grad_clip: float = 1.0) -> optax.GradientTransformation:
    """Adam + warmup schedule + global-norm clipping (grad_clip 1.0 matches
    the reference Trainer's gradient_clip_val, train_kge.py:75)."""
    schedule = warmup_schedule(scheduler_type, learning_rate,
                               num_training_steps, warm_up_ratio)
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.scale_by_adam(),
        optax.scale_by_schedule(schedule),
        optax.scale(-1.0),
    )
