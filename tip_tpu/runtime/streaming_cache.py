"""KV-cached streaming forward: opt-in per-frame inference fast path.

The windowed runner recomputes the transformer over all <=40 window
positions every frame (mirroring the reference's slicing,
real_time_runner.py:413-426). History tokens' *inputs* never change once
pushed, so each layer's K/V projections of past tokens are cacheable: per
frame only the NEWEST token runs through the encoder, attending to cached
K/V rings.

Semantics (documented divergence, PERF.md): while the window is still
growing (first 40 frames) this is EXACTLY the windowed forward — past
tokens' context never changes, so their cached representations equal a full
recompute (tested to f64 precision). Once the window slides, a past token's
recomputed representation would see a shifted window; the cache freezes it
with its original context. The divergence study lives in
tests/test_streaming_cache.py and PERF.md.

Two RNN-head policies (RunnerConfig.serving_mode):
  * "kv_cache": replay the tanh RNN from zero over the cached encoder
    outputs each frame — identical head math to the windowed path;
  * "kv_cache_rnn_carry": carry the hidden state across frames and run ONE
    RNN step per frame — a further approximation (the reference re-zeros
    the hidden per call) that removes the 40-step sequential chain, the
    single-stream latency floor identified in PERF.md.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from tip_tpu.models import tip_model as M


@struct.dataclass
class KVCache:
    k: jnp.ndarray       # (L, W, d) per-layer key rings, window order
    v: jnp.ndarray       # (L, W, d) per-layer value rings
    enc: jnp.ndarray     # (W, d) encoder-output ring (RNN replay input)
    h: jnp.ndarray       # (H,) carried RNN hidden (rnn_carry mode only)
    valid: jnp.ndarray   # (W,) bool — slot holds a live token (global-cursor
    #                      pool mode; derived from k in single-stream mode)


def cache_init(cfg, window: int, dtype=jnp.float32) -> KVCache:
    """cfg: models.tip_model.ModelConfig. Rings are stored in the model's
    compute dtype (bf16 when configured): the cache is read in full every
    frame, so its width is the dominant HBM traffic of batched serving, and
    storing f32 only to cast per layer would double it."""
    if cfg.compute_dtype is not None:
        dtype = jnp.dtype(cfg.compute_dtype)
    L, d, H = cfg.tf_layers, cfg.tf_in_dim, cfg.rnn_hid_size
    return KVCache(
        k=jnp.zeros((L, window, d), dtype),
        v=jnp.zeros((L, window, d), dtype),
        enc=jnp.zeros((window, d), dtype),
        h=jnp.zeros((H,), dtype),
        valid=jnp.zeros((window,), bool),
    )


# Ring discipline: circular slot-writes. Unlike the base runner's shift-left
# windows (which must stay chronological for the dense model input), the
# cache rings only need a validity mask — attention is permutation-invariant
# over its keys — so one slot-write per frame replaces an O(window) shift
# (~40x less write traffic on the K/V/enc state). Only the RNN replay needs
# chronological order, recovered by walking the ring from the cursor.


def cached_forward_step(params, cache: KVCache, x_token, k_prev,
                        cfg, *, rnn_carry: bool = False,
                        slot_override=None,
                        ) -> Tuple[KVCache, jnp.ndarray]:
    """One streaming token through the encoder with cached K/V.

    Args:
      x_token: (input_dim,) the newest window token [imu ++ acc_sum ++
        history] — the same channels forward() sees at the last position.
      k_prev: () int32 — window entries before this frame (ring push index).
      cfg: ModelConfig.
      slot_override: optional () int32 GLOBAL ring cursor (pool tick % W).
        In a synchronously-ticking StreamPool every stream writes the same
        slot, so passing the pool tick (unbatched under vmap) turns the
        per-stream ring scatter into one dynamic-update-slice — worth ~35%
        of batched throughput (PERF.md). Per-slot validity then comes from
        the cache's ``valid`` ring (exact: post-warmup a stream pushes every
        tick, so the bits mark precisely its last <= W tokens).
    Returns (new_cache, y_t (size_s,)).
    """
    W = cache.enc.shape[0]
    d, h, hd = cfg.tf_in_dim, cfg.n_heads, cfg.head_dim
    dtype = cache.enc.dtype
    if cfg.compute_dtype is not None:
        cd = jnp.dtype(cfg.compute_dtype)
        params = jax.tree_util.tree_map(lambda p: p.astype(cd), params)
        x_token = x_token.astype(cd)

    # input quirks (ref :65,:75): NaN -> 0, root-vel history channels zeroed
    imu_dim = cfg.input_size_imu + (18 if cfg.with_acc_sum else 0)
    x_token = jnp.nan_to_num(x_token, nan=0.0)
    x_token = x_token.at[imu_dim + 108:imu_dim + 111].set(0.0)

    x = x_token @ params["in_linear"]["w"] + params["in_linear"]["b"]
    x = x[M.head_interleave_perm(cfg)]

    if slot_override is None:
        slot = k_prev % W
        n_valid = jnp.minimum(k_prev + 1, W)   # tokens visible after push
        valid = jnp.arange(W) < n_valid        # left-aligned ring validity
        valid_ring = cache.valid.at[slot].set(True)
    else:
        slot = slot_override % W
        valid = cache.valid.at[slot].set(True)
        valid_ring = valid

    k_rings, v_rings = [], []
    for li, layer in enumerate(params["layers"]):
        q = x @ layer["w_q"] + layer["b_q"]
        kt = x @ layer["w_k"] + layer["b_k"]
        vt = x @ layer["w_v"] + layer["b_v"]
        k_ring = cache.k[li].astype(kt.dtype).at[slot].set(kt)
        v_ring = cache.v[li].astype(vt.dtype).at[slot].set(vt)
        k_rings.append(k_ring)
        v_rings.append(v_ring)

        qh = q.reshape(h, hd)
        kh = k_ring.reshape(W, h, hd)
        vh = v_ring.reshape(W, h, hd)
        logits = jnp.einsum("hd,whd->hw", qh, kh) \
            / jnp.sqrt(jnp.asarray(hd, q.dtype))
        logits = jnp.where(valid[None, :],
                           logits, jnp.finfo(logits.dtype).min)
        w_att = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
        o = jnp.einsum("hw,whd->hd", w_att, vh).reshape(d)
        a = o @ layer["out_proj"]["w"] + layer["out_proj"]["b"]
        x = M._layer_norm(x + a, layer["ln1_s"], layer["ln1_b"])
        f = jax.nn.relu(x @ layer["ff1"]["w"] + layer["ff1"]["b"])
        f = f @ layer["ff2"]["w"] + layer["ff2"]["b"]
        x = M._layer_norm(x + f, layer["ln2_s"], layer["ln2_b"])

    enc_ring = cache.enc.astype(x.dtype).at[slot].set(x)

    rnn = params["rnn"]
    if rnn_carry:
        # one step from the carried hidden (approximation: the reference
        # re-zeros the hidden every call)
        pre = x @ rnn["w_ih"] + rnn["b_ih"] + rnn["b_hh"]
        h_new = jnp.tanh(pre + cache.h.astype(pre.dtype) @ rnn["w_hh"])
        h_t = h_new
        h_carry = h_new
    else:
        # replay from zero over the valid window in CHRONOLOGICAL order —
        # identical head math to the windowed forward. The ring is circular,
        # so the scan walks it oldest-to-newest from the slot after the
        # cursor, freezing the hidden on invalid slots (pre-warmup holes).
        xin = enc_ring @ rnn["w_ih"] + rnn["b_ih"] + rnn["b_hh"]   # (W, H)
        start = (slot + 1) % W

        def cell(hprev, j):
            idx = (start + j) % W
            h_next = jnp.tanh(xin[idx] + hprev @ rnn["w_hh"])
            return jnp.where(valid[idx], h_next, hprev), None

        h0 = jnp.zeros((cfg.rnn_hid_size,), xin.dtype)
        h_t, _ = jax.lax.scan(cell, h0, jnp.arange(W))
        h_carry = cache.h

    y = h_t @ params["out"]["w"] + params["out"]["b"]

    new_cache = KVCache(
        k=jnp.stack(k_rings).astype(dtype),
        v=jnp.stack(v_rings).astype(dtype),
        enc=enc_ring.astype(dtype),
        h=h_carry.astype(dtype),
        valid=valid_ring,
    )
    return new_cache, y.astype(dtype)


# ---------------------------------------------------------------------------
# Fused Pallas kernel: the ENTIRE cached step as one op
# ---------------------------------------------------------------------------
# Single-stream frame latency is dispatch-bound (PERF.md): the XLA cached
# step issues ~100 tiny ops. This kernel runs the whole thing — in-proj,
# 4 cached-attention layers with in-place ring updates, RNN head, out-proj —
# as ONE VMEM-resident op. Ring buffers are updated in place via
# input_output_aliases; a `commit` flag skips the writes during warmup so
# the caller needs no copy-on-select.

import functools

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_cached_kernel(scalars_ref, x_ref, h_in_ref, kc_in, vc_in, enc_in,
                         *refs, cfg, t_len: int, rnn_carry: bool):
    import math

    # kernel arg order: in_refs..., out_refs..., scratch_refs...
    if rnn_carry:
        xin_scratch = None
        y_ref, h_ref, kc_ref, vc_ref, enc_ref = refs[-5:]
        ws = refs[:-5]
    else:
        xin_scratch = refs[-1]
        y_ref, h_ref, kc_ref, vc_ref, enc_ref = refs[-6:-1]
        ws = refs[:-6]
    W = t_len
    d, h, hd = cfg.tf_in_dim, cfg.n_heads, cfg.head_dim

    k_prev = scalars_ref[0]
    commit = scalars_ref[1]
    w32 = jnp.int32(W)                     # keep index math in int32 (x64!)
    slot = jax.lax.rem(k_prev, w32)
    n_valid = jnp.minimum(k_prev + jnp.int32(1), w32)

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    i = iter(range(len(ws)))
    w_in, b_in = ws[next(i)], ws[next(i)]
    cd = w_in.dtype
    x = dot(x_ref[:], w_in[:]) + b_in[:].astype(jnp.float32)   # (1, d) f32

    rows = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    mask = jnp.where(rows >= n_valid, jnp.asarray(-1e30, jnp.float32), 0.0)
    scale = 1.0 / math.sqrt(hd)

    def _ln(v, s, b, eps=1e-5):
        mu = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean((v - mu) ** 2, axis=-1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + eps) * s + b

    for li in range(cfg.tf_layers):
        w_qkv, b_qkv = ws[next(i)], ws[next(i)]
        w_o, b_o = ws[next(i)], ws[next(i)]
        w_f1, b_f1 = ws[next(i)], ws[next(i)]
        w_f2, b_f2 = ws[next(i)], ws[next(i)]
        ln1_s, ln1_b = ws[next(i)], ws[next(i)]
        ln2_s, ln2_b = ws[next(i)], ws[next(i)]

        qkv = dot(x.astype(cd), w_qkv[:]) + b_qkv[:].astype(jnp.float32)
        q, kt, vt = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]

        @pl.when(commit != 0)
        def _():
            kc_ref[li, pl.ds(slot, 1), :] = kt.astype(kc_ref.dtype)
            vc_ref[li, pl.ds(slot, 1), :] = vt.astype(vc_ref.dtype)

        kr = kc_ref[li]                                   # (W, d)
        vr = vc_ref[li]
        outs = []
        for hh in range(h):
            sl = slice(hh * hd, (hh + 1) * hd)
            logits = dot(kr[:, sl], q[:, sl].T.astype(kr.dtype)) * scale
            logits = logits + mask                        # (W, 1)
            w_att = jax.nn.softmax(logits, axis=0)
            outs.append(dot(w_att.T.astype(cd), vr[:, sl].astype(cd)))
        att = jnp.concatenate(outs, axis=-1)              # (1, d)
        a = dot(att.astype(cd), w_o[:]) + b_o[:].astype(jnp.float32)
        x = _ln(x + a, ln1_s[:], ln1_b[:])
        f = jnp.maximum(dot(x.astype(cd), w_f1[:])
                        + b_f1[:].astype(jnp.float32), 0.0)
        f = dot(f.astype(cd), w_f2[:]) + b_f2[:].astype(jnp.float32)
        x = _ln(x + f, ln2_s[:], ln2_b[:])

    w_ih, b_r, w_hh = ws[next(i)], ws[next(i)], ws[next(i)]
    w_out, b_out = ws[next(i)], ws[next(i)]

    # maintain the encoder ring in BOTH modes (the unfused path does too,
    # keeping the serving modes switchable mid-stream)
    @pl.when(commit != 0)
    def _():
        enc_ref[pl.ds(slot, 1), :] = x.astype(enc_ref.dtype)

    if rnn_carry:
        pre = dot(x.astype(cd), w_ih[:]) + b_r[:].astype(jnp.float32)
        h_t = jnp.tanh(pre + dot(h_in_ref[:].astype(cd), w_hh[:]))

        @pl.when(commit != 0)
        def _():
            h_ref[:] = h_t.astype(h_ref.dtype)
    else:

        xin_scratch[:] = (dot(enc_ref[:].astype(cd), w_ih[:])
                          + b_r[:].astype(jnp.float32))
        start = jnp.where(k_prev + jnp.int32(1) <= w32, jnp.int32(0),
                          jax.lax.rem(slot + jnp.int32(1), w32))
        h_t = jnp.zeros((1, cfg.rnn_hid_size), jnp.float32)
        for t in range(W):                     # static unroll (Mosaic-safe)
            idx = jax.lax.rem(start + jnp.int32(t), w32)
            xrow = xin_scratch[pl.ds(idx, 1), :]
            h_next = jnp.tanh(xrow + dot(h_t.astype(cd), w_hh[:]))
            h_t = jnp.where(t < n_valid, h_next, h_t)
        # replay mode never carries the hidden; keep the buffer as-is

    y = dot(h_t.astype(cd), w_out[:]) + b_out[:].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "rnn_carry", "interpret"))
def fused_cached_forward_step(packed_ws, cache: KVCache, x_token, k_prev,
                              commit, cfg, *, rnn_carry: bool = False,
                              interpret: bool = False):
    """Fused-kernel equivalent of cached_forward_step.

    packed_ws: ops.fused_forward.pack_weights output (perm folded into the
    in-projection; its dtype should match the cache ring dtype).
    commit: () bool — write the new token into the rings (False during the
    smoothing warmup keeps the cache untouched without a copy-on-select).
    Returns (new_cache, y_t (size_s,) f32).
    """
    W = cache.enc.shape[0]
    imu_dim = cfg.input_size_imu + (18 if cfg.with_acc_sum else 0)
    x = jnp.nan_to_num(x_token, nan=0.0)
    x = x.at[imu_dim + 108:imu_dim + 111].set(0.0)
    x = x[None].astype(packed_ws[0].dtype)

    scalars = jnp.stack([jnp.asarray(k_prev, jnp.int32),
                         jnp.asarray(commit, jnp.int32)])
    h2d = cache.h[None]

    spec = pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM)
    n_in = 6 + len(packed_ws)
    out_shape = [
        jax.ShapeDtypeStruct((1, cfg.size_s), jnp.float32),
        jax.ShapeDtypeStruct(h2d.shape, h2d.dtype),
        jax.ShapeDtypeStruct(cache.k.shape, cache.k.dtype),
        jax.ShapeDtypeStruct(cache.v.shape, cache.v.dtype),
        jax.ShapeDtypeStruct(cache.enc.shape, cache.enc.dtype),
    ]
    scratch = [] if rnn_carry else [
        pltpu.VMEM((W, cfg.rnn_hid_size), jnp.float32)]
    y, h_new, kc, vc, enc = pl.pallas_call(
        functools.partial(_fused_cached_kernel, cfg=cfg, t_len=W,
                          rnn_carry=rnn_carry),
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * (n_in - 1),
        out_specs=[spec] * 5,
        input_output_aliases={2: 1, 3: 2, 4: 3, 5: 4},
        scratch_shapes=scratch,
        interpret=interpret,
    )(scalars, x, h2d, cache.k, cache.v, cache.enc, *packed_ws)
    valid = jnp.where(jnp.asarray(commit, bool),
                      cache.valid.at[jnp.asarray(k_prev, jnp.int32)
                                     % W].set(True),
                      cache.valid)
    new_cache = KVCache(k=kc, v=vc, enc=enc, h=h_new[0], valid=valid)
    return new_cache, y[0]
