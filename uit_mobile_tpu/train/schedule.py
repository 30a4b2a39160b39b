"""LR schedules: cosine annealing to 1% with linear warmup.

Matches the reference schedule (run.py:350-367): CosineAnnealing from lr to
0.01*lr over ``epochs*epoch_length`` steps, preceded by a linear warmup
from 0 over ``warmup_iters``.
"""

from __future__ import annotations

import optax


def cosine_with_warmup(base_lr: float, total_steps: int,
                       warmup_iters: int | None = 1000,
                       final_scale: float = 0.01):
    cosine = optax.cosine_decay_schedule(
        init_value=base_lr, decay_steps=max(total_steps, 1), alpha=final_scale
    )
    if not warmup_iters:
        return cosine
    warmup = optax.linear_schedule(0.0, base_lr, warmup_iters)
    return optax.join_schedules([warmup, cosine], boundaries=[warmup_iters])
