"""Counter-based dropout keep-masks (murmur3 finalizer over element index).

Shared by the fused encoder kernels (ops/pallas_encoder.py) and the plain
XLA model path (models.tip_model, ``ModelConfig(dropout_impl="hash")``):
pure jnp int32 ops (wraparound multiplies), so the SAME stream is produced
under Mosaic, interpret mode, and plain XLA — masks regenerate anywhere
from (seed, site) with no RNG state and no residuals.

Stream contract (pinned by tests/test_pallas_encoder.py): element value
depends only on (seed, site, linear index, shape's trailing strides); the
2D case uses linear index r*ncols + c.
"""

import numpy as np

import jax
import jax.numpy as jnp


def hash_keep_mask(seed, site, shape, p_keep, f):
    """Keep-mask in {0, 1/p_keep} of dtype ``f`` for any rank.

    Args:
      seed: () int32 stream seed (vary per step / per layer call).
      site: python int — dropout-site id (decorrelates masks within a call).
      p_keep: python float keep probability.
      f: output float dtype (compute the threshold in f32-or-wider).
    """
    h = jnp.zeros(shape, jnp.int32)
    stride = 1
    for d in reversed(range(len(shape))):
        # wraparound int32 stride (a Python int >= 2**31 would make
        # jnp.int32() raise at trace time; wrapping IS the hash semantics)
        s32 = np.uint32(stride & 0xFFFFFFFF).astype(np.int32)
        h = h + jax.lax.broadcasted_iota(jnp.int32, shape, d) * s32
        stride *= shape[d]
    s16, s13 = jnp.int32(16), jnp.int32(13)
    h = h * jnp.int32(-1640531527)                      # 0x9E3779B9
    h = h + seed + jnp.int32(site) * jnp.int32(7919)
    h = h ^ jax.lax.shift_right_logical(h, s16)
    h = h * jnp.int32(-2048144789)                      # 0x85EBCA6B
    h = h ^ jax.lax.shift_right_logical(h, s13)
    h = h * jnp.int32(-1028477387)                      # 0xC2B2AE35
    h = h ^ jax.lax.shift_right_logical(h, s16)
    u = (h & jnp.int32(0x7FFFFFFF)).astype(f) * f(2.0 ** -31)
    return (u < p_keep).astype(f) * f(1.0 / p_keep)
