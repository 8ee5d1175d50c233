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
            # q/k cast to the packing dtype so this single-stream dispatch
            # matches _enc_batch_kernel's logits semantics (differences stay
            # reduction-order only even at bf16 packing)
            logits = dot(q[:, sl].astype(cd),
                         k[:, sl].astype(cd).T) * scale + mask
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

        # per-head attention, unrolled (16 heads x (T, hd)); q/k in the
        # packing dtype to match _enc_batch_kernel (see _kernel_last)
        outs = []
        for hh in range(h):
            sl = slice(hh * hd, (hh + 1) * hd)
            logits = dot(q[:, sl].astype(cd),
                         k[:, sl].astype(cd).T) * scale + mask
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


# ---------------------------------------------------------------------------
# batched EXACT-semantics serving: the whole windowed recompute for a pool
# of streams as two gridded kernels (encoder tile + time-major RNN tile).
#
# The reference-parity serving mode ("recompute", real_time_runner.py:413-426)
# re-runs the full <=40-frame windowed forward every tick; under the pool's
# vmap the XLA path reached only ~103k frames/s/chip (PERF.md) while the
# approximate cached mode did 1.35M. These kernels close that gap for users
# who need exact semantics: the 4 encoder layers run per batch-tile with a
# block-diagonal causal mask (reusing the training kernel's math,
# ops/pallas_encoder._layer_fwd_math with dropout off), and the sequential
# RNN replay runs time-major at a wide tile so each of the 40 recurrent
# matmuls is a full-width MXU op.
# ---------------------------------------------------------------------------

def _enc_batch_kernel(x_ref, *refs, cfg: M.ModelConfig, bt: int, t_len: int):
    from tip_tpu.ops import pallas_encoder as PE
    out_ref = refs[-1]
    ws = refs[:-1]
    d = cfg.tf_in_dim
    w_in, b_in = ws[0], ws[1]
    x = jnp.dot(x_ref[:].reshape(bt * t_len, x_ref.shape[-1]), w_in[:],
                preferred_element_type=jnp.float32) \
        + b_in[:].astype(jnp.float32)
    seed = jnp.int32(0)
    for li in range(cfg.tf_layers):
        lw = tuple(w[:] for w in ws[2 + 12 * li: 14 + 12 * li])
        x, _ = PE._layer_fwd_math(x, lw, seed, bt=bt, t_len=t_len,
                                  n_heads=cfg.n_heads, p=0.0, train=False,
                                  cd=w_in.dtype, f=jnp.float32)
    out_ref[:] = x.reshape(bt, t_len, d).astype(out_ref.dtype)


def _rnn_last_batch_kernel(k_ref, xenc_ref, wih_ref, br_ref, whh_ref,
                           wout_ref, bout_ref, out_ref, *,
                           cfg: M.ModelConfig, t_len: int):
    """Time-major RNN replay for a stream tile; emits the output at each
    stream's own last-valid window index."""
    cd = wih_ref.dtype
    bt = xenc_ref.shape[1]

    def dot(a, b):
        return jnp.dot(a.astype(cd), b, preferred_element_type=jnp.float32)

    k = k_ref[:]                                    # (bt, 1) int32
    h = jnp.zeros((bt, cfg.rnn_hid_size), jnp.float32)
    h_sel = h
    for t in range(t_len):
        xin = dot(xenc_ref[t], wih_ref[:]) + br_ref[:].astype(jnp.float32)
        h = jnp.tanh(xin + dot(h, whh_ref[:]))
        h_sel = jnp.where(k == t, h, h_sel)
    y = dot(h_sel, wout_ref[:]) + bout_ref[:].astype(jnp.float32)
    out_ref[:] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("cfg", "bt", "bt_rnn",
                                             "interpret"))
def fused_recompute_batch(packed_ws, x_full, k_last, cfg: M.ModelConfig,
                          bt: int = 16, bt_rnn: int = 128,
                          interpret: bool = False):
    """Exact windowed recompute for B streams in one tick.

    Args:
      x_full: (B, T, input_dim) left-aligned windows (imu ++ history, raw —
        the forward quirks are applied here).
      k_last: (B,) int32 per-stream last-valid window index.
    Returns (B, size_s) f32. Equals vmap(fused_forward_last)
    (tests/test_fused_recompute_batch.py).
    """
    from tip_tpu.ops.tiling import pick_tile

    B, T, Din = x_full.shape
    d = cfg.tf_in_dim
    imu_dim = cfg.input_size_imu + (18 if cfg.with_acc_sum else 0)
    # x stays f32 into the in-projection — same mixed-precision dot as the
    # single-stream kernel (fused_forward_last), so both dispatches of
    # auto_fused_last agree at any packing dtype
    x = jnp.nan_to_num(x_full, nan=0.0)
    x = x.at[..., imu_dim + 108:imu_dim + 111].set(0.0)

    bt_e = pick_tile(B, bt, "fused_recompute_batch(encoder)")
    enc_ws = packed_ws[:2 + 12 * cfg.tf_layers]
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    xenc = pl.pallas_call(
        functools.partial(_enc_batch_kernel, cfg=cfg, bt=bt_e, t_len=T),
        grid=(B // bt_e,),
        in_specs=[pl.BlockSpec((bt_e, T, Din), lambda i: (i, 0, 0))]
                 + [pl.BlockSpec(w.shape, lambda i, n=w.ndim: (0,) * n)
                    for w in enc_ws],
        out_specs=pl.BlockSpec((bt_e, T, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, d), packed_ws[0].dtype),
        interpret=interpret,
        **kwargs,
    )(x, *enc_ws)

    xenc_tm = xenc.transpose(1, 0, 2)                  # time-major (T, B, d)
    rnn_ws = packed_ws[2 + 12 * cfg.tf_layers:]
    bt_r = pick_tile(B, bt_rnn, "fused_recompute_batch(rnn)")
    k_arr = jnp.asarray(k_last, jnp.int32).reshape(B, 1)
    y = pl.pallas_call(
        functools.partial(_rnn_last_batch_kernel, cfg=cfg, t_len=T),
        grid=(B // bt_r,),
        in_specs=[pl.BlockSpec((bt_r, 1), lambda i: (i, 0)),
                  pl.BlockSpec((T, bt_r, d), lambda i: (0, i, 0))]
                 + [pl.BlockSpec(w.shape, lambda i, n=w.ndim: (0,) * n)
                    for w in rnn_ws],
        out_specs=pl.BlockSpec((bt_r, cfg.size_s), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, cfg.size_s), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(k_arr, xenc_tm, *rnn_ws)
    return y


def auto_fused_last(cfg: M.ModelConfig, interpret: bool,
                    b_tile: int = 16, b_tile_rnn: int = 128):
    """custom_vmap'd single-output fused forward: per stream it runs
    fused_forward_last; under the serving pool's vmap (x and k batched,
    weights shared) it dispatches the whole tick to fused_recompute_batch.

    Signature: f(packed_ws, x (T, input_dim), k_last ()) -> (size_s,)."""
    import jax.custom_batching

    @jax.custom_batching.custom_vmap
    def f(packed_ws, x, k_last):
        return fused_forward_last(packed_ws, x, k_last, cfg,
                                  interpret=interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, packed_ws, x, k_last):
        params_b = any(jax.tree_util.tree_leaves(in_batched[0]))
        if not params_b and in_batched[1]:
            k_v = (k_last if in_batched[2]
                   else jnp.broadcast_to(k_last, (axis_size,)))
            y = fused_recompute_batch(packed_ws, x, k_v, cfg, bt=b_tile,
                                      bt_rnn=b_tile_rnn,
                                      interpret=interpret)
        else:
            # generic total fallback (e.g. batched weights, or x shared
            # while k is batched): broadcast every unbatched input and
            # vmap the single-stream kernel — correct, but serialised
            def bcast(leaf, b):
                return leaf if b else jnp.broadcast_to(
                    leaf, (axis_size,) + jnp.shape(leaf))

            pw = jax.tree_util.tree_map(bcast, packed_ws, in_batched[0])
            xx = bcast(x, in_batched[1])
            kk = bcast(k_last, in_batched[2])
            y = jax.vmap(lambda p, a, b: fused_forward_last(
                p, a, b, cfg, interpret=interpret))(pw, xx, kk)
        return y, True
    return f
