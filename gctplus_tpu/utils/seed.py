"""Deterministic seeding (reference Utils/seed.py:7-18).

JAX is deterministic by construction (explicit PRNG keys); this seeds
the host-side RNGs used by data augmentation and numpy sampling."""

from __future__ import annotations

import os
import random

import numpy as np


def set_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
