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


def _acc_dtype(dtype):
    """MXU accumulation dtype: f32, except when the op itself runs in f64
    (CPU-interpret parity tests)."""
    return jnp.float64 if dtype == jnp.float64 else jnp.float32


def _rnn_kernel(xin_ref, whh_ref, out_ref, *, t_len: int):
    """xin/out: (T, B, H) in VMEM; whh: (H, H) in VMEM.

    h_t = tanh(xin_t + h_{t-1} @ W_hh), h_{-1} = 0.
    """
    b = xin_ref.shape[1]
    h_dim = xin_ref.shape[2]
    acc = _acc_dtype(xin_ref.dtype)

    def body(t, h):
        x_t = xin_ref[t, :, :]
        h = jnp.tanh(x_t + jnp.dot(h, whh_ref[:],
                                   preferred_element_type=acc
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
    kwargs = {}
    if not interpret:
        # training-sized batches ((40, 256, 512) activations) exceed the
        # default 16 MB scoped-VMEM budget
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        functools.partial(_rnn_kernel, t_len=T),
        out_shape=jax.ShapeDtypeStruct((T, B, H), xin.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY
                               if interpret else pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY
                               if interpret else pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY
                               if interpret else pltpu.VMEM),
        interpret=interpret,
        **kwargs,
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


# ---------------------------------------------------------------------------
# Differentiable fused RNN (training): BPTT backward in VMEM
# ---------------------------------------------------------------------------
# The RNN head costs ~1.2 ms of the 8.8 ms training step (PERF.md): 2*T
# dependent dispatches through the scan's forward and backward. This pairs
# the forward kernel above with a BPTT kernel so the whole head is two ops.
# Residual-light: tanh' = 1 - h^2, so only the forward HIDDENS are saved
# (the inputs are not needed).
#
#   dh_t   = g_t + da_{t+1} @ W^T
#   da_t   = dh_t * (1 - h_t^2)       -> dxin_t
#   dW    += h_{t-1}^T @ da_t         (h_{-1} = 0)


def _rnn_bwd_kernel(hs_ref, whh_ref, g_ref, dx_ref, dw_ref, *, t_len: int):
    """hs/g/dx: (T, B, H) in VMEM; whh: (H, H); dw out: (H, H) accumulated
    in f32 (f64 in the interpret parity tests)."""
    b = hs_ref.shape[1]
    h_dim = hs_ref.shape[2]
    acc = _acc_dtype(hs_ref.dtype)
    wt = whh_ref[:].T                       # W^T, built once

    def dot(a, bb):
        return jnp.dot(a, bb, preferred_element_type=acc)

    def body(i, carry):
        da_next, dw = carry
        t = t_len - 1 - i
        h_t = hs_ref[t, :, :].astype(acc)
        dh = g_ref[t, :, :].astype(acc) \
            + dot(da_next.astype(whh_ref.dtype), wt)
        da = dh * (1.0 - h_t * h_t)
        dx_ref[t, :, :] = da.astype(dx_ref.dtype)
        h_prev = jnp.where(t > 0, hs_ref[jnp.maximum(t - 1, 0), :, :],
                           jnp.zeros((b, h_dim), hs_ref.dtype))
        dw = dw + jax.lax.dot_general(
            h_prev.astype(whh_ref.dtype), da.astype(whh_ref.dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=acc)                # h_prev^T @ da
        return da, dw

    da0 = jnp.zeros((b, h_dim), acc)
    dw0 = jnp.zeros((h_dim, h_dim), acc)
    _, dw = jax.lax.fori_loop(0, t_len, body, (da0, dw0))
    dw_ref[:] = dw.astype(dw_ref.dtype)


def _rnn_bwd(hs, w_hh, g, interpret: bool):
    B, T, H = hs.shape
    spec = pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    dx, dw = pl.pallas_call(
        functools.partial(_rnn_bwd_kernel, t_len=T),
        out_shape=[jax.ShapeDtypeStruct((T, B, H), hs.dtype),
                   jax.ShapeDtypeStruct((H, H), _acc_dtype(hs.dtype))],
        in_specs=[spec] * 3,
        out_specs=[spec] * 2,
        interpret=interpret,
        **kwargs,
    )(hs.transpose(1, 0, 2), w_hh, g.transpose(1, 0, 2))
    return dx.transpose(1, 0, 2), dw.astype(w_hh.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_rnn_train(xin, w_hh, interpret: bool = False):
    """Differentiable fused tanh-RNN: forward = fused_rnn, backward = one
    BPTT kernel (saves only the hiddens; tanh' needs no inputs). Same
    signature/semantics as rnn_reference. Used by the model when
    ``rnn_impl="pallas"`` under training."""
    return fused_rnn(xin, w_hh, interpret=interpret)


def _fused_rnn_train_fwd(xin, w_hh, interpret):
    # (custom_vjp passes the fwd rule the ORIGINAL argument order; only
    # the bwd rule gets the nondiff args hoisted to the front)
    hs = fused_rnn(xin, w_hh, interpret=interpret)
    return hs, (hs, w_hh)


def _fused_rnn_train_bwd(interpret, res, g):
    hs, w_hh = res
    dxin, dw = _rnn_bwd(hs, w_hh, g, interpret)
    return dxin, dw


fused_rnn_train.defvjp(_fused_rnn_train_fwd, _fused_rnn_train_bwd)
