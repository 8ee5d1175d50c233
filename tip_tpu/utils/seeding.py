"""Deterministic seeding across python/numpy/jax (reference
learning_utils.set_seed, learning_utils.py:81-85, called at every entry
point). JAX randomness is functional (explicit PRNG keys), so this mainly
pins the host-side samplers used for window sampling and eval cropping."""

import random

import numpy as np


def set_seed(seed: int):
    random.seed(seed)
    np.random.seed(seed)


def prng_key(seed: int):
    import jax
    return jax.random.PRNGKey(seed)
