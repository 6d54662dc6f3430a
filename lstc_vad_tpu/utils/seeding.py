"""Determinism: one seed fans out to numpy host RNG and the jax PRNG key.

jax is functionally deterministic under jit by construction (no cudnn
nondeterminism to fight, unlike utils/utils.py:107-116); the only stateful RNG
in this framework is the host-side sampler Generator.
"""

from __future__ import annotations

import os
import random

import jax
import numpy as np


def set_seeds(seed: int):
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
