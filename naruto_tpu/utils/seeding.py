"""Deterministic seeding.

The reference seeds python/numpy/torch and turns on cudnn determinism
(src/utils/general_utils.py:32-55). The JAX redesign is functional: all device
randomness flows through explicit `jax.random` keys derived from the run seed,
so seeding here only covers the host-side RNGs (python `random`, numpy) used
by the planner's RRT and host-side sampling.
"""
from __future__ import annotations

import os
import random

import numpy as np


def fix_random_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)


def root_key(seed: int):
    """Root jax.random key for a run; fold per-subsystem streams off this."""
    import jax

    return jax.random.PRNGKey(seed)
