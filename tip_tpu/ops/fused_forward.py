"""Whole-model fused Pallas forward for single-stream inference.

The flagship model is ~3.7M params (~7.4 MB bf16): small enough that the
ENTIRE forward — in-projection, 4 post-norm transformer layers, tanh-RNN
head, out-projection — runs as one Pallas kernel with every weight and all
activations resident in VMEM. The XLA path executes ~100 small HBM-bound ops
per frame; this kernel loads each weight from HBM once per call and never
round-trips activations.

Semantics: identical math to models.tip_model.forward in eval mode for a
single stream (B=1), with the head-interleave permutation pre-folded into
the in-projection columns. Weights are cast to ``dtype`` (default bf16,
f32 accumulation on the MXU); expect ~1e-2 output differences vs the f32
XLA path — well inside the model's training noise (0.15 uniform history
noise).

Wired into the streaming runner: constructing the runner with
``ModelConfig(forward_impl="fused")`` makes ``sense_and_predict`` call
``fused_forward_last`` (the single-output variant) instead of the XLA
forward (tip_tpu/runtime/runner.py, stage 3). The scan/XLA path stays the
parity default; the fused path is inference-only (no dropout).
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tip_tpu.models import tip_model as M


def pack_weights(params, cfg: M.ModelConfig, dtype=jnp.bfloat16):
    """Flatten the param pytree into the kernel's input list; folds the
    head-interleave permutation into in_linear and both biases into the RNN
    pre-activation."""
    perm = M.head_interleave_perm(cfg)
    ws = [params["in_linear"]["w"][:, perm].astype(dtype),
          params["in_linear"]["b"][perm].astype(dtype)]
    for layer in params["layers"]:
        # the kernel consumes the packed (d, 3d) qkv layout
        w_qkv = jnp.concatenate(
            [layer["w_q"], layer["w_k"], layer["w_v"]], axis=1)
        b_qkv = jnp.concatenate([layer["b_q"], layer["b_k"], layer["b_v"]])
        ws += [w_qkv.astype(dtype), b_qkv.astype(dtype),
               layer["out_proj"]["w"].astype(dtype),
               layer["out_proj"]["b"].astype(dtype),
               layer["ff1"]["w"].astype(dtype), layer["ff1"]["b"].astype(dtype),
               layer["ff2"]["w"].astype(dtype), layer["ff2"]["b"].astype(dtype),
               layer["ln1_s"].astype(jnp.float32),
               layer["ln1_b"].astype(jnp.float32),
               layer["ln2_s"].astype(jnp.float32),
               layer["ln2_b"].astype(jnp.float32)]
    ws += [params["rnn"]["w_ih"].astype(dtype),
           (params["rnn"]["b_ih"] + params["rnn"]["b_hh"]).astype(dtype),
           params["rnn"]["w_hh"].astype(dtype),
           params["out"]["w"].astype(dtype), params["out"]["b"].astype(dtype)]
    return ws


def _ln(x, s, b, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * s + b


def _kernel_last(k_ref, x_ref, *refs, cfg: M.ModelConfig, t_len: int):
    """Variant emitting only the output at window index k-1 (the only
    position the streaming runner consumes): one out-projection instead of
    T, one (1, T) attention row... full rows still needed for deeper layers,
    so the savings are the T-1 out-projections."""
    out_ref = refs[-1]
    ws = refs[:-1]
    T = t_len
    d = cfg.tf_in_dim
    h, hd = cfg.n_heads, cfg.head_dim

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    i = iter(range(len(ws)))
    w_in, b_in = ws[next(i)], ws[next(i)]
    x = dot(x_ref[:], w_in[:]) + b_in[:].astype(jnp.float32)

    rows = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    mask = jnp.where(cols > rows, jnp.asarray(-1e30, jnp.float32), 0.0)
    scale = 1.0 / math.sqrt(hd)
    cd = w_in.dtype

    for _ in range(cfg.tf_layers):
        w_qkv, b_qkv = ws[next(i)], ws[next(i)]
        w_o, b_o = ws[next(i)], ws[next(i)]
        w_f1, b_f1 = ws[next(i)], ws[next(i)]
        w_f2, b_f2 = ws[next(i)], ws[next(i)]
        ln1_s, ln1_b = ws[next(i)], ws[next(i)]
        ln2_s, ln2_b = ws[next(i)], ws[next(i)]

        qkv = dot(x.astype(cd), w_qkv[:]) + b_qkv[:].astype(jnp.float32)
        q, k, v = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]
        outs = []
        for hh in range(h):
            sl = slice(hh * hd, (hh + 1) * hd)
            logits = dot(q[:, sl], k[:, sl].T) * scale + mask
            w_att = jax.nn.softmax(logits, axis=-1)
            outs.append(dot(w_att.astype(cd), v[:, sl].astype(cd)))
        att = jnp.concatenate(outs, axis=-1)
        a = dot(att.astype(cd), w_o[:]) + b_o[:].astype(jnp.float32)
        x = _ln(x + a, ln1_s[:], ln1_b[:])
        f = jnp.maximum(dot(x.astype(cd), w_f1[:])
                        + b_f1[:].astype(jnp.float32), 0.0)
        f = dot(f.astype(cd), w_f2[:]) + b_f2[:].astype(jnp.float32)
        x = _ln(x + f, ln2_s[:], ln2_b[:])

    w_ih, b_r, w_hh = ws[next(i)], ws[next(i)], ws[next(i)]
    w_out, b_out = ws[next(i)], ws[next(i)]
    xin = dot(x.astype(cd), w_ih[:]) + b_r[:].astype(jnp.float32)

    k_last = k_ref[0]
    hcur = jnp.zeros((1, cfg.rnn_hid_size), jnp.float32)
    h_sel = hcur
    for t in range(T):
        hcur = jnp.tanh(xin[t][None, :] + dot(hcur.astype(cd), w_hh[:]))
        h_sel = jnp.where(t == k_last, hcur, h_sel)
    y = dot(h_sel.astype(cd), w_out[:]) + b_out[:].astype(jnp.float32)
    out_ref[0, :] = y[0].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def fused_forward_last(packed_ws, x, k_last, cfg: M.ModelConfig,
                       interpret: bool = False):
    """Single-output fast path: returns the (size_s,) prediction at window
    index ``k_last`` (0-based). Matches fused_forward(...)[k_last]."""
    T = x.shape[0]
    imu_dim = cfg.input_size_imu + (18 if cfg.with_acc_sum else 0)
    x = jnp.nan_to_num(x, nan=0.0)
    x = x.at[..., imu_dim + 108:imu_dim + 111].set(0.0)
    spec = pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM)
    k_arr = jnp.asarray([k_last], jnp.int32)
    out = pl.pallas_call(
        functools.partial(_kernel_last, cfg=cfg, t_len=T),
        out_shape=jax.ShapeDtypeStruct((1, cfg.size_s), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * (1 + len(packed_ws)),
        out_specs=spec,
        interpret=interpret,
    )(k_arr, x, *packed_ws)
    return out[0]


def _kernel(x_ref, *refs, cfg: M.ModelConfig, t_len: int):
    out_ref = refs[-1]
    ws = refs[:-1]
    T = t_len
    d = cfg.tf_in_dim
    h, hd = cfg.n_heads, cfg.head_dim

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    i = iter(range(len(ws)))
    w_in, b_in = ws[next(i)], ws[next(i)]

    x = dot(x_ref[:], w_in[:]) + b_in[:].astype(jnp.float32)     # (T, d) f32

    # additive causal mask
    rows = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    neg = jnp.asarray(-1e30, jnp.float32)
    mask = jnp.where(cols > rows, neg, 0.0)

    scale = 1.0 / math.sqrt(hd)
    cd = w_in.dtype

    for _ in range(cfg.tf_layers):
        w_qkv, b_qkv = ws[next(i)], ws[next(i)]
        w_o, b_o = ws[next(i)], ws[next(i)]
        w_f1, b_f1 = ws[next(i)], ws[next(i)]
        w_f2, b_f2 = ws[next(i)], ws[next(i)]
        ln1_s, ln1_b = ws[next(i)], ws[next(i)]
        ln2_s, ln2_b = ws[next(i)], ws[next(i)]

        qkv = dot(x.astype(cd), w_qkv[:]) + b_qkv[:].astype(jnp.float32)
        q, k, v = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]

        # per-head attention, unrolled (16 heads x (T, hd))
        outs = []
        for hh in range(h):
            sl = slice(hh * hd, (hh + 1) * hd)
            logits = dot(q[:, sl], k[:, sl].T) * scale + mask
            w_att = jax.nn.softmax(logits, axis=-1)
            outs.append(dot(w_att.astype(cd), v[:, sl].astype(cd)))
        att = jnp.concatenate(outs, axis=-1)                      # (T, d)

        a = dot(att.astype(cd), w_o[:]) + b_o[:].astype(jnp.float32)
        x = _ln(x + a, ln1_s[:], ln1_b[:])
        f = jnp.maximum(dot(x.astype(cd), w_f1[:])
                        + b_f1[:].astype(jnp.float32), 0.0)
        f = dot(f.astype(cd), w_f2[:]) + b_f2[:].astype(jnp.float32)
        x = _ln(x + f, ln2_s[:], ln2_b[:])

    w_ih, b_r, w_hh = ws[next(i)], ws[next(i)], ws[next(i)]
    w_out, b_out = ws[next(i)], ws[next(i)]

    xin = dot(x.astype(cd), w_ih[:]) + b_r[:].astype(jnp.float32)  # (T, H)

    # statically unrolled recurrence (Mosaic cannot dynamic-slice values);
    # T is 40 — the unroll keeps every step on registers/VMEM
    hcur = jnp.zeros((1, cfg.rnn_hid_size), jnp.float32)
    for t in range(T):
        hcur = jnp.tanh(xin[t][None, :] + dot(hcur.astype(cd), w_hh[:]))
        y_t = dot(hcur.astype(cd), w_out[:]) + b_out[:].astype(jnp.float32)
        out_ref[t, :] = y_t[0].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def fused_forward(packed_ws, x, cfg: M.ModelConfig, interpret: bool = False):
    """x: (T, input_dim) single-stream window (imu features ++ history) ->
    (T, size_s) predictions. Applies the reference input quirks (NaN -> 0,
    root-velocity history channels zeroed) before the kernel."""
    T = x.shape[0]
    imu_dim = cfg.input_size_imu + (18 if cfg.with_acc_sum else 0)
    x = jnp.nan_to_num(x, nan=0.0)
    x = x.at[..., imu_dim + 108:imu_dim + 111].set(0.0)
    spec = pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, cfg=cfg, t_len=T),
        out_shape=jax.ShapeDtypeStruct((T, cfg.size_s), jnp.float32),
        in_specs=[spec] * (1 + len(packed_ws)),
        out_specs=spec,
        interpret=interpret,
    )(x, *packed_ws)
