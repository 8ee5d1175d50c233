"""Whole-encoder-layer fused Pallas kernels for TRAINING (fwd + bwd).

The training step's cost is dominated by the 4 transformer encoder layers
(PERF.md encoder-layer deep dive: ~1.6 ms/layer fwd+bwd at the paper shape
with rbg dropout, vs a ~1.2 ms matmul-bound ideal for the whole step). XLA
is at its floor for this miniature model — the remaining gap is fragmented
across softmax traffic, layer norms, dropout mask materialisation, and
residual saves. This module reclaims it by running ONE layer's forward as a
single VMEM-resident kernel and its backward as a second kernel that
REMATERIALISES the forward (saving zero residuals: the only backward inputs
are x, the weights, the seed, and dy):

  * all four dropout sites regenerate their masks from a counter-based
    hash PRNG (murmur3 finalizer over the element index), so masks are
    never written to HBM and never saved for backward — and, unlike
    pltpu.prng_*, the hash runs identically under interpret mode, so the
    CPU test suite covers the real code path (gradient parity vs jax.grad
    of an equation-identical pure-JAX reference, WITH dropout active);
  * attention runs per head on lane-slices with a block-diagonal causal
    mask over the flattened (bt*T, bt*T) tile — every matmul is a clean 2D
    MXU op at any batch tile size;
  * matmuls accumulate in f32 (params may be bf16); layer norms, softmax
    and residual adds are f32.

Equivalent reference computation: one iteration of the encoder loop in
TF_RNN_Past_State.forward (simple_transformer_with_state.py:26-29, torch
1.7 post-norm TransformerEncoderLayer, internal dropout p=0.1) — the hot
loop of train_model.py:152-216.

Semantics note: the dropout STREAM differs from the XLA path's
threefry/rbg masks (different RNG, same marginal distribution). That is the
same class of divergence as TrainConfig.dropout_rng_impl="rbg" and is
documented in PERF.md; the deterministic (train=False or p=0) path is
numerically equivalent to the XLA layer to fp tolerance.

Used by models.tip_model.forward when ``ModelConfig(encoder_impl="pallas")``
for training AND deterministic inference (fp-close to the XLA loop; exact
parity tests below run train=False). pallas_call has no SPMD partitioning
rule, so mesh TRAINING falls back to the XLA loop via train._mesh_safe;
forward() itself does not detect meshes.
"""

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# dropout site ids (hash-stream separation within one layer call)
_SITE_ATTN_HEAD0 = 0          # heads use sites 0..n_heads-1
_SITE_POST_ATTN = 100
_SITE_FF_MID = 101
_SITE_POST_FF = 102


def pack_layer_weights(layer, dtype=jnp.float32):
    """Model layer dict -> the kernel's 12-tuple (qkv packed). LayerNorm
    params stay f32 even when the matmul weights are bf16 (f64 in the
    interpret parity tests)."""
    ln_dtype = jnp.float64 if dtype == jnp.float64 else jnp.float32
    w_qkv = jnp.concatenate([layer["w_q"], layer["w_k"], layer["w_v"]], 1)
    b_qkv = jnp.concatenate([layer["b_q"], layer["b_k"], layer["b_v"]])
    return (w_qkv.astype(dtype), b_qkv.astype(dtype),
            layer["out_proj"]["w"].astype(dtype),
            layer["out_proj"]["b"].astype(dtype),
            layer["ff1"]["w"].astype(dtype), layer["ff1"]["b"].astype(dtype),
            layer["ff2"]["w"].astype(dtype), layer["ff2"]["b"].astype(dtype),
            layer["ln1_s"].astype(ln_dtype),
            layer["ln1_b"].astype(ln_dtype),
            layer["ln2_s"].astype(ln_dtype),
            layer["ln2_b"].astype(ln_dtype))


# the mask generator is shared public infrastructure (the XLA model path
# uses the same stream); kernels keep the short local name
from tip_tpu.ops.hashmask import hash_keep_mask as _keep_mask  # noqa: E402


def _ln_fwd(x, s, b, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    rs = jax.lax.rsqrt(var + eps)
    xhat = (x - mu) * rs
    return xhat * s + b, xhat, rs


def _ln_bwd(dy, xhat, rs, s):
    dxh = dy * s
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xhat, axis=-1, keepdims=True)
    dr = rs * (dxh - m1 - xhat * m2)
    dg = jnp.sum(dy * xhat, axis=0)
    db = jnp.sum(dy, axis=0)
    return dr, dg, db


def _block_causal_mask(bt, t_len, f):
    """(N, N) additive mask: same-sample causal, -1e30 elsewhere."""
    N = bt * t_len
    r = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    same = (r // t_len) == (c // t_len)
    causal = (c % t_len) <= (r % t_len)
    return jnp.where(same & causal, f(0.0), f(-1e30))


def _layer_fwd_math(x_f32, ws, seed, *, bt, t_len, n_heads, p, train, cd, f):
    """Shared forward math (used by both kernels; bwd rematerialises).
    Returns (y, stash) where stash has what backward reuses immediately."""
    (w_qkv, b_qkv, w_o, b_o, w_f1, b_f1, w_f2, b_f2,
     g1, be1, g2, be2) = ws
    d = w_o.shape[0]
    hd = d // n_heads
    scale = f(1.0 / math.sqrt(hd))
    mask = _block_causal_mask(bt, t_len, f)
    use_drop = train and p > 0.0
    pk = 1.0 - p

    def dot(a, b):
        return jnp.dot(a.astype(cd), b.astype(cd), preferred_element_type=f)

    qkv = dot(x_f32, w_qkv) + b_qkv.astype(f)
    q, k, v = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]
    outs = []
    for h in range(n_heads):
        sl = slice(h * hd, (h + 1) * hd)
        s_h = dot(q[:, sl], k[:, sl].T) * scale + mask
        p_h = jax.nn.softmax(s_h, axis=-1)
        if use_drop:
            p_h = p_h * _keep_mask(seed, _SITE_ATTN_HEAD0 + h,
                                   p_h.shape, pk, f)
        outs.append(dot(p_h, v[:, sl]))
    att = jnp.concatenate(outs, axis=-1)
    a = dot(att, w_o) + b_o.astype(f)
    if use_drop:
        a = a * _keep_mask(seed, _SITE_POST_ATTN, a.shape, pk, f)
    r1 = x_f32 + a
    y1, xhat1, rs1 = _ln_fwd(r1, g1, be1)
    h1 = dot(y1, w_f1) + b_f1.astype(f)
    f1 = jnp.maximum(h1, f(0.0))
    f1d = f1
    if use_drop:
        f1d = f1 * _keep_mask(seed, _SITE_FF_MID, f1.shape, pk, f)
    f2 = dot(f1d, w_f2) + b_f2.astype(f)
    if use_drop:
        f2 = f2 * _keep_mask(seed, _SITE_POST_FF, f2.shape, pk, f)
    r2 = y1 + f2
    y2, xhat2, rs2 = _ln_fwd(r2, g2, be2)
    stash = dict(qkv=qkv, att=att, y1=y1, xhat1=xhat1, rs1=rs1,
                 f1=f1, f1d=f1d, xhat2=xhat2, rs2=rs2)
    return y2, stash


def _fwd_kernel(seed_ref, x_ref, *refs, bt, t_len, n_heads, p, train, f):
    y_ref = refs[-1]
    ws = refs[:-1]
    cd = ws[0].dtype
    seed = seed_ref[0] + pl.program_id(0) * jnp.int32(104729)
    ws_v = tuple(w[:] for w in ws)
    y, _ = _layer_fwd_math(x_ref[:].astype(f), ws_v, seed, bt=bt,
                           t_len=t_len, n_heads=n_heads, p=p, train=train,
                           cd=cd, f=f)
    y_ref[:] = y.astype(y_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, dy_ref, *refs,
                bt, t_len, n_heads, p, train, f):
    """Rematerialising backward: one grid step recomputes the tile's
    forward entirely in VMEM, then walks the chain backwards. Parameter
    gradients accumulate across the (sequential) grid steps."""
    ws = refs[:12]
    (dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref, dwf1_ref, dbf1_ref,
     dwf2_ref, dbf2_ref, dg1_ref, dbe1_ref, dg2_ref, dbe2_ref) = refs[12:]
    cd = ws[0].dtype
    seed = seed_ref[0] + pl.program_id(0) * jnp.int32(104729)
    ws_v = tuple(w[:] for w in ws)
    (w_qkv, b_qkv, w_o, b_o, w_f1, b_f1, w_f2, b_f2,
     g1, be1, g2, be2) = ws_v
    d = w_o.shape[0]
    hd = d // n_heads
    scale = f(1.0 / math.sqrt(hd))
    use_drop = train and p > 0.0
    pk = 1.0 - p

    def dot(a, b):
        return jnp.dot(a.astype(cd), b.astype(cd), preferred_element_type=f)

    x = x_ref[:].astype(f)
    _, st = _layer_fwd_math(x, ws_v, seed, bt=bt, t_len=t_len,
                            n_heads=n_heads, p=p, train=train, cd=cd, f=f)
    dy = dy_ref[:].astype(f)

    # LN2
    dr2, dg2, dbe2 = _ln_bwd(dy, st["xhat2"], st["rs2"], g2)
    # post-FF dropout + W2
    df2 = dr2
    if use_drop:
        df2 = df2 * _keep_mask(seed, _SITE_POST_FF, df2.shape, pk, f)
    dwf2 = dot(st["f1d"].T, df2)
    dbf2 = jnp.sum(df2, axis=0)
    df1d = dot(df2, w_f2.T)
    if use_drop:
        df1d = df1d * _keep_mask(seed, _SITE_FF_MID, df1d.shape, pk, f)
    dh1 = df1d * (st["f1"] > 0).astype(f)
    dwf1 = dot(st["y1"].T, dh1)
    dbf1 = jnp.sum(dh1, axis=0)
    dy1 = dr2 + dot(dh1, w_f1.T)
    # LN1
    dr1, dg1, dbe1 = _ln_bwd(dy1, st["xhat1"], st["rs1"], g1)
    # post-attn dropout + out projection
    da = dr1
    if use_drop:
        da = da * _keep_mask(seed, _SITE_POST_ATTN, da.shape, pk, f)
    dwo = dot(st["att"].T, da)
    dbo = jnp.sum(da, axis=0)
    datt = dot(da, w_o.T)
    # attention (recompute per-head softmax; masks regenerate)
    qkv = st["qkv"]
    q, k, v = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]
    mask = _block_causal_mask(bt, t_len, f)
    dqs, dks, dvs = [], [], []
    for h in range(n_heads):
        sl = slice(h * hd, (h + 1) * hd)
        s_h = dot(q[:, sl], k[:, sl].T) * scale + mask
        p_h = jax.nn.softmax(s_h, axis=-1)
        if use_drop:
            mh = _keep_mask(seed, _SITE_ATTN_HEAD0 + h, p_h.shape, pk, f)
            pd_h = p_h * mh
        else:
            pd_h = p_h
        do_h = datt[:, sl]
        dvs.append(dot(pd_h.T, do_h))
        dpd = dot(do_h, v[:, sl].T)
        dp = dpd * mh if use_drop else dpd
        ds = p_h * (dp - jnp.sum(dp * p_h, axis=-1, keepdims=True))
        dqs.append(dot(ds, k[:, sl]) * scale)
        dks.append(dot(ds.T, q[:, sl]) * scale)
    dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1)  # (N, 3d) in q|k|v order
    dwqkv = dot(x.T, dqkv)
    dbqkv = jnp.sum(dqkv, axis=0)
    dx = dr1 + dot(dqkv, w_qkv.T)

    dx_ref[:] = dx.astype(dx_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref, dwf1_ref,
                  dbf1_ref, dwf2_ref, dbf2_ref, dg1_ref, dbe1_ref,
                  dg2_ref, dbe2_ref):
            r[...] = jnp.zeros(r.shape, r.dtype)

    for r, g in ((dwqkv_ref, dwqkv), (dbqkv_ref, dbqkv), (dwo_ref, dwo),
                 (dbo_ref, dbo), (dwf1_ref, dwf1), (dbf1_ref, dbf1),
                 (dwf2_ref, dwf2), (dbf2_ref, dbf2), (dg1_ref, dg1),
                 (dbe1_ref, dbe1), (dg2_ref, dg2), (dbe2_ref, dbe2)):
        r[...] += g.astype(r.dtype)


def _pick_bt(B, bt):
    from tip_tpu.ops.tiling import pick_tile
    return pick_tile(B, bt, "encoder_layer_train")


def _f_for(x):
    return jnp.float64 if x.dtype == jnp.float64 else jnp.float32


@functools.partial(jax.jit, static_argnames=("n_heads", "p", "train", "bt",
                                             "interpret"))
def _encoder_layer_fwd_call(x, ws, seed, n_heads, p, train, bt, interpret):
    B, T, d = x.shape
    bt = _pick_bt(B, bt)
    N = bt * T
    f = _f_for(ws[0])
    xf = x.reshape(B * T, d)
    grid = (B // bt,)
    kern = functools.partial(_fwd_kernel, bt=bt, t_len=T, n_heads=n_heads,
                             p=float(p), train=train, f=f)
    row_spec = pl.BlockSpec((N, d), lambda i: (i, 0))
    w_specs = [pl.BlockSpec(w.shape, lambda i, n=w.ndim: (0,) * n)
               for w in ws]
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    y = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=(pl.ANY if interpret
                                             else pltpu.SMEM))] + [row_spec]
                 + w_specs,
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((B * T, d), x.dtype),
        interpret=interpret,
        **kwargs,
    )(jnp.asarray([seed], jnp.int32).reshape(1), xf, *ws)
    return y.reshape(B, T, d)


@functools.partial(jax.jit, static_argnames=("n_heads", "p", "train", "bt",
                                             "interpret"))
def _encoder_layer_bwd_call(x, ws, seed, dy, n_heads, p, train, bt,
                            interpret):
    B, T, d = x.shape
    bt = _pick_bt(B, bt)
    N = bt * T
    f = _f_for(ws[0])
    xf = x.reshape(B * T, d)
    dyf = dy.reshape(B * T, d).astype(f)
    grid = (B // bt,)
    kern = functools.partial(_bwd_kernel, bt=bt, t_len=T, n_heads=n_heads,
                             p=float(p), train=train, f=f)
    row_spec = pl.BlockSpec((N, d), lambda i: (i, 0))
    w_specs = [pl.BlockSpec(w.shape, lambda i, n=w.ndim: (0,) * n)
               for w in ws]
    grad_specs = [pl.BlockSpec(w.shape, lambda i, n=w.ndim: (0,) * n)
                  for w in ws]
    grad_shapes = [jax.ShapeDtypeStruct(w.shape, f) for w in ws]
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=(pl.ANY if interpret
                                             else pltpu.SMEM))]
                 + [row_spec, row_spec] + w_specs,
        out_specs=[row_spec] + grad_specs,
        out_shape=[jax.ShapeDtypeStruct((B * T, d), f)] + grad_shapes,
        interpret=interpret,
        **kwargs,
    )(jnp.asarray([seed], jnp.int32).reshape(1), xf, dyf, *ws)
    dx = out[0].reshape(B, T, d).astype(x.dtype)
    dws = tuple(g.astype(w.dtype) for g, w in zip(out[1:], ws))
    return dx, dws


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def encoder_layer_train(x, ws, seed, n_heads, p, train, bt=8,
                        interpret=False):
    """One fused post-norm transformer encoder layer, differentiable.

    Args:
      x: (B, T, d) activations (f32/bf16/f64).
      ws: 12-tuple from pack_layer_weights.
      seed: () int32 — dropout stream seed for THIS layer call (distinct
        per layer per step; ignored when train=False or p=0).
      n_heads/p/train/bt/interpret: static.
    Returns (B, T, d). Backward rematerialises the forward (zero saved
    residuals) and regenerates all dropout masks from the seed.
    """
    return _encoder_layer_fwd_call(x, ws, seed, n_heads, p, train, bt,
                                   interpret)


def _elt_fwd(x, ws, seed, n_heads, p, train, bt, interpret):
    y = _encoder_layer_fwd_call(x, ws, seed, n_heads, p, train, bt,
                                interpret)
    return y, (x, ws, seed)


def _elt_bwd(n_heads, p, train, bt, interpret, res, dy):
    x, ws, seed = res
    dx, dws = _encoder_layer_bwd_call(x, ws, seed, dy, n_heads, p, train,
                                      bt, interpret)
    dseed = np.zeros((), jax.dtypes.float0)
    return dx, dws, dseed


encoder_layer_train.defvjp(_elt_fwd, _elt_bwd)


# ---------------------------------------------------------------------------
# pure-JAX reference (equation-identical, incl. the hash dropout): the
# gradient-parity oracle for the kernels, and the documentation of their
# exact semantics.
# ---------------------------------------------------------------------------

def encoder_layer_reference(x, ws, seed, n_heads, p, train, bt=8):
    """jax.grad-able reference computing exactly what the kernel pair
    computes (same per-tile masks, same f32 accumulation order)."""
    B, T, d = x.shape
    bt = _pick_bt(B, bt)
    f = _f_for(ws[0])
    cd = ws[0].dtype
    ys = []
    for i in range(B // bt):
        tile = x[i * bt:(i + 1) * bt].reshape(bt * T, d).astype(f)
        s = jnp.asarray(seed, jnp.int32) + jnp.int32(i) * jnp.int32(104729)
        y, _ = _layer_fwd_math(tile, ws, s, bt=bt, t_len=T,
                               n_heads=n_heads, p=p, train=train, cd=cd,
                               f=f)
        ys.append(y.reshape(bt, T, d))
    return jnp.concatenate(ys, axis=0).astype(x.dtype)
