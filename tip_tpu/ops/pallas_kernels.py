"""Pallas TPU kernels for the hot sequential ops.

First kernel: the fused tanh-RNN head scan. The transformer body is large
batched matmuls that XLA already maps well onto the MXU; the RNN head is the
one *inherently sequential* op on the inference path (hidden state re-zeroed
every call, reference simple_transformer_with_state.py:95-101), so each frame
pays T=40 dependent (B, H) x (H, H) matmuls. The kernel keeps W_hh and the
running hidden state resident in VMEM across all T steps instead of
round-tripping through HBM per step.

Falls back to interpret mode off-TPU (used by the CPU test suite).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rnn_kernel(xin_ref, whh_ref, out_ref, *, t_len: int):
    """xin/out: (T, B, H) in VMEM; whh: (H, H) in VMEM.

    h_t = tanh(xin_t + h_{t-1} @ W_hh), h_{-1} = 0.
    """
    b = xin_ref.shape[1]
    h_dim = xin_ref.shape[2]

    def body(t, h):
        x_t = xin_ref[t, :, :]
        h = jnp.tanh(x_t + jnp.dot(h, whh_ref[:],
                                   preferred_element_type=jnp.float32
                                   ).astype(x_t.dtype))
        out_ref[t, :, :] = h
        return h

    h0 = jnp.zeros((b, h_dim), xin_ref.dtype)
    jax.lax.fori_loop(0, t_len, body, h0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_rnn(xin, w_hh, interpret: bool = False):
    """Fused tanh-RNN over time.

    Args:
      xin: (B, T, H) pre-activation inputs (x @ W_ih + b_ih + b_hh already
        folded in).
      w_hh: (H, H) recurrent weight (stored (in, out): h @ W_hh).
    Returns: (B, T, H) hidden states.
    """
    B, T, H = xin.shape
    xin_t = xin.transpose(1, 0, 2)            # (T, B, H): time-major indexing
    out = pl.pallas_call(
        functools.partial(_rnn_kernel, t_len=T),
        out_shape=jax.ShapeDtypeStruct((T, B, H), xin.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY
                               if interpret else pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY
                               if interpret else pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY
                               if interpret else pltpu.VMEM),
        interpret=interpret,
    )(xin_t, w_hh)
    return out.transpose(1, 0, 2)


def rnn_reference(xin, w_hh):
    """lax.scan reference implementation (the model's default path)."""
    def cell(h, x_t):
        h = jnp.tanh(x_t + h @ w_hh)
        return h, h

    B, T, H = xin.shape
    h0 = jnp.zeros((B, H), xin.dtype)
    _, hs = jax.lax.scan(cell, h0, xin.transpose(1, 0, 2))
    return hs.transpose(1, 0, 2)
