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
                        slot_override=None, commit=None,
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
      commit: optional () bool — when False (smoothing warmup) the returned
        cache equals the input cache: the written ring rows are gated by a
        row-level select instead of the caller copy-selecting the whole
        cache (O(row) instead of O(L*W*d) traffic). The returned y_t is
        garbage in that case (never consumed by the runner).
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

    commit_b = jnp.asarray(True if commit is None else commit, bool)
    if slot_override is None:
        slot = k_prev % W
        n_valid = jnp.minimum(k_prev + 1, W)   # tokens visible after push
        valid = jnp.arange(W) < n_valid        # left-aligned ring validity
        valid_ring = jnp.where(commit_b, cache.valid.at[slot].set(True),
                               cache.valid)
    else:
        slot = slot_override % W
        valid = cache.valid.at[slot].set(True)
        valid_ring = jnp.where(commit_b, valid, cache.valid)

    k_rings, v_rings = [], []
    for li, layer in enumerate(params["layers"]):
        q = x @ layer["w_q"] + layer["b_q"]
        kt = x @ layer["w_k"] + layer["b_k"]
        vt = x @ layer["w_v"] + layer["b_v"]
        # row-level commit gate: an uncommitted step writes the old row back
        kt = jnp.where(commit_b, kt, cache.k[li, slot].astype(kt.dtype))
        vt = jnp.where(commit_b, vt, cache.v[li, slot].astype(vt.dtype))
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

    enc_row = jnp.where(commit_b, x, cache.enc[slot].astype(x.dtype))
    enc_ring = cache.enc.astype(x.dtype).at[slot].set(enc_row)

    rnn = params["rnn"]
    if rnn_carry:
        # one step from the carried hidden (approximation: the reference
        # re-zeros the hidden every call)
        pre = x @ rnn["w_ih"] + rnn["b_ih"] + rnn["b_hh"]
        h_new = jnp.tanh(pre + cache.h.astype(pre.dtype) @ rnn["w_hh"])
        h_t = h_new
        h_carry = jnp.where(commit_b, h_new, cache.h.astype(h_new.dtype))
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


def _fused_cached_kernel(scalars_ref, x_ref, h_in_ref, valid_ref, kc_in,
                         vc_in, enc_in, *refs, cfg, t_len: int,
                         rnn_carry: bool):
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

    slot = scalars_ref[0]                  # ring cursor (already mod W)
    commit = scalars_ref[1]
    w32 = jnp.int32(W)                     # keep index math in int32 (x64!)

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    i = iter(range(len(ws)))
    w_in, b_in = ws[next(i)], ws[next(i)]
    cd = w_in.dtype
    x = dot(x_ref[:], w_in[:]) + b_in[:].astype(jnp.float32)   # (1, d) f32

    validf = valid_ref[:]                  # (W, 1) 0/1, incl. this token
    mask = jnp.where(validf > 0, 0.0, jnp.asarray(-1e30, jnp.float32))
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
        start = jax.lax.rem(slot + jnp.int32(1), w32)
        h_t = jnp.zeros((1, cfg.rnn_hid_size), jnp.float32)
        for t in range(W):                     # static unroll (Mosaic-safe)
            idx = jax.lax.rem(start + jnp.int32(t), w32)
            xrow = xin_scratch[pl.ds(idx, 1), :]
            ok = valid_ref[pl.ds(idx, 1), :]               # (1, 1)
            h_next = jnp.tanh(xrow + dot(h_t.astype(cd), w_hh[:]))
            h_t = jnp.where(ok > 0, h_next, h_t)
        # replay mode never carries the hidden; keep the buffer as-is

    y = dot(h_t.astype(cd), w_out[:]) + b_out[:].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)


def _fused_cached_step_slot(packed_ws, cache: KVCache, x_token, slot,
                            commit, cfg, rnn_carry: bool, interpret: bool):
    """Single-stream fused cached step at an explicit ring cursor."""
    W = cache.enc.shape[0]
    imu_dim = cfg.input_size_imu + (18 if cfg.with_acc_sum else 0)
    x = jnp.nan_to_num(x_token, nan=0.0)
    x = x.at[imu_dim + 108:imu_dim + 111].set(0.0)
    x = x[None].astype(packed_ws[0].dtype)

    slot = jnp.asarray(slot, jnp.int32) % W
    commit_b = jnp.asarray(commit, bool)
    valid_new = jnp.where(commit_b, cache.valid.at[slot].set(True),
                          cache.valid)
    scalars = jnp.stack([slot, commit_b.astype(jnp.int32)])
    h2d = cache.h[None]
    validf = valid_new.astype(jnp.float32)[:, None]            # (W, 1)

    spec = pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM)
    n_in = 7 + len(packed_ws)
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
        input_output_aliases={2: 1, 4: 2, 5: 3, 6: 4},
        scratch_shapes=scratch,
        interpret=interpret,
    )(scalars, x, h2d, validf, cache.k, cache.v, cache.enc, *packed_ws)
    new_cache = KVCache(k=kc, v=vc, enc=enc, h=h_new[0], valid=valid_new)
    return new_cache, y[0]


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
    return _fused_cached_step_slot(packed_ws, cache, x_token,
                                   jnp.asarray(k_prev, jnp.int32) % W,
                                   commit, cfg, rnn_carry, interpret)


# ---------------------------------------------------------------------------
# Fused BATCHED cached step: the whole pool's model stage as one kernel
# ---------------------------------------------------------------------------
# "Fused kernel v2": the batched tick is op-count-bound like the single
# stream (~100 small XLA ops per tick); this kernel runs the entire cached
# model stage for a TILE of streams per grid program — all projections as
# (Bt, .) MXU matmuls, attention in lane-full form (the per-head hd=16
# reductions become two 0/1-selector matmuls over the full d=256 lane axis),
# ring updates as one dynamic-slice store at the pool's GLOBAL cursor.
# Per-stream warmup is handled by the validity masks: ring writes are
# unconditional (reads are mask-gated, so a warmup stream's garbage slot is
# never consumed), and the carried hidden is where-gated per stream.


def _head_selector(cfg, dtype):
    """(d, h) 0/1 matrix: column hh selects head hh's lanes — sum-within-
    head and broadcast-across-head become plain matmuls (lane-full on the
    MXU instead of 8x-padded per-head vector ops)."""
    import numpy as _np
    d, h, hd = cfg.tf_in_dim, cfg.n_heads, cfg.head_dim
    e = _np.zeros((d, h), _np.float32)
    for hh in range(h):
        e[hh * hd:(hh + 1) * hd, hh] = 1.0
    return jnp.asarray(e, dtype)


def _fused_cached_batch_kernel(scalars_ref, x_ref, h_in_ref, commit_ref,
                               valid_ref, kc_in, vc_in, eh_ref,
                               *refs, cfg, t_len: int, b_tile: int,
                               rnn_carry: bool):
    """Reads the OLD rings only (Mosaic cannot do unaligned sublane dynamic
    stores on the 4D pool rings); the new token attends to itself via an
    explicit joint-softmax term, and the per-layer k/v/enc projections are
    emitted as outputs for one XLA dynamic-update-slice outside. valid_ref
    must have the cursor slot cleared (that token is being evicted).

    Replay mode additionally takes the OLD encoder tokens' RNN
    pre-activations and their validity in CHRONOLOGICAL order (reordered
    outside — dynamic lane indexing is 128-granular on TPU, so the walk
    uses static indices)."""
    import math

    if rnn_carry:
        xinc_in = validc_in = None
        (y_ref, h_ref, kt_ref, vt_ref, encnew_ref) = refs[-5:]
        ws = refs[:-5]
    else:
        xinc_in, validc_in = refs[-7:-5]
        (y_ref, h_ref, kt_ref, vt_ref, encnew_ref) = refs[-5:]
        ws = refs[:-7]
    W, Bt = t_len, b_tile
    d, h, hd = cfg.tf_in_dim, cfg.n_heads, cfg.head_dim

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    i = iter(range(len(ws)))
    w_in, b_in = ws[next(i)], ws[next(i)]
    cd = w_in.dtype
    x = dot(x_ref[:], w_in[:]) + b_in[:].astype(jnp.float32)   # (Bt, d) f32

    validf = valid_ref[:]                  # (Bt, W) 0/1, cursor slot cleared
    commitf = commit_ref[:]                # (Bt, 1) 0/1
    neg = jnp.asarray(-1e30, jnp.float32)
    scale = 1.0 / math.sqrt(hd)
    eh = eh_ref[:]                                             # (d, h)

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
        kt_ref[:, li, :] = kt.astype(kt_ref.dtype)
        vt_ref[:, li, :] = vt.astype(vt_ref.dtype)

        kr = kc_in[:, li]                                  # (Bt, W, d) OLD
        vr = vc_in[:, li]
        # lane-full single-query attention over [old ring tokens, self]:
        # per-head sums become 0/1-selector matmuls over the d lanes
        tmp = kr.astype(jnp.float32) * q[:, None, :]       # (Bt, W, d)
        logits = dot(tmp.reshape(Bt * W, d).astype(cd),
                     eh).reshape(Bt, W, h) * scale         # (Bt, W, h)
        logits = jnp.where(validf[:, :, None] > 0, logits, neg)
        l_self = dot((kt * q).astype(cd), eh) * scale      # (Bt, h)
        l_self = jnp.where(commitf > 0, l_self, neg)[:, None, :]

        m = jnp.maximum(jnp.max(logits, axis=1, keepdims=True), l_self)
        er = jnp.exp(logits - m)                           # (Bt, W, h)
        es = jnp.exp(l_self - m)                           # (Bt, 1, h)
        denom = jnp.sum(er, axis=1, keepdims=True) + es
        w_ring = er / denom
        w_self = (es / denom)[:, 0, :]                     # (Bt, h)
        wrep = dot(w_ring.reshape(Bt * W, h).astype(cd),
                   eh.T).reshape(Bt, W, d)
        att = jnp.sum(vr.astype(jnp.float32) * wrep, axis=1)
        att = att + dot(w_self.astype(cd), eh.T) * vt      # (Bt, d)

        a = dot(att.astype(cd), w_o[:]) + b_o[:].astype(jnp.float32)
        x = _ln(x + a, ln1_s[:], ln1_b[:])
        f = jnp.maximum(dot(x.astype(cd), w_f1[:])
                        + b_f1[:].astype(jnp.float32), 0.0)
        f = dot(f.astype(cd), w_f2[:]) + b_f2[:].astype(jnp.float32)
        x = _ln(x + f, ln2_s[:], ln2_b[:])

    w_ih, b_r, w_hh = ws[next(i)], ws[next(i)], ws[next(i)]
    w_out, b_out = ws[next(i)], ws[next(i)]

    encnew_ref[:] = x.astype(encnew_ref.dtype)

    if rnn_carry:
        pre = dot(x.astype(cd), w_ih[:]) + b_r[:].astype(jnp.float32)
        h_t = jnp.tanh(pre + dot(h_in_ref[:].astype(cd), w_hh[:]))
        h_kept = jnp.where(commitf > 0, h_t,
                           h_in_ref[:].astype(jnp.float32))
        h_ref[:] = h_kept.astype(h_ref.dtype)
        h_t = h_kept
    else:
        # replay oldest-to-newest: W-1 old tokens in chronological order
        # (pre-reordered inputs, static indices), then the fresh token last
        h_t = jnp.zeros((Bt, cfg.rnn_hid_size), jnp.float32)
        for t in range(W - 1):                 # static unroll (Mosaic-safe)
            xrow = xinc_in[:, t, :]
            ok = validc_in[:, t:t + 1]                     # (Bt, 1)
            h_next = jnp.tanh(xrow + dot(h_t.astype(cd), w_hh[:]))
            h_t = jnp.where(ok > 0, h_next, h_t)
        xin_self = dot(x.astype(cd), w_ih[:]) + b_r[:].astype(jnp.float32)
        h_next = jnp.tanh(xin_self + dot(h_t.astype(cd), w_hh[:]))
        h_t = jnp.where(commitf > 0, h_next, h_t)

    y = dot(h_t.astype(cd), w_out[:]) + b_out[:].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "rnn_carry", "b_tile",
                                    "interpret"))
def fused_cached_batch(packed_ws, cache: KVCache, x_tokens, slot, commit,
                       cfg, *, rnn_carry: bool = False, b_tile: int = 128,
                       interpret: bool = False):
    """Batched fused cached step for a synchronously-ticking pool.

    Args:
      cache: KVCache with a leading stream axis on every leaf (vmap-stacked).
      x_tokens: (B, input_dim) raw window tokens (quirks applied here).
      slot: () int32 global ring cursor (pool tick % W).
      commit: (B,) bool per-stream push flags (False during warmup).
    Returns (new_cache, y (B, size_s) f32). Matches
    vmap(cached_forward_step with slot_override) on every valid-masked
    quantity (ring contents at invalid slots may differ: this kernel writes
    the cursor slot unconditionally, which no read ever consumes).
    """
    B = x_tokens.shape[0]
    W = cache.enc.shape[1]
    if not rnn_carry:
        # the replay path carries an extra (bt, W-1, H) f32 block of RNN
        # pre-activations; halve the tile to stay inside scoped VMEM
        b_tile = min(b_tile, 64)
    # largest divisor <= the preferred tile (a pool of e.g. 96 streams must
    # not assert at trace; a prime pool size warns — see ops.tiling)
    from tip_tpu.ops.tiling import pick_tile
    bt = pick_tile(B, b_tile, "fused_cached_batch")
    grid = (B // bt,)

    imu_dim = cfg.input_size_imu + (18 if cfg.with_acc_sum else 0)
    x = jnp.nan_to_num(x_tokens, nan=0.0)
    x = x.at[:, imu_dim + 108:imu_dim + 111].set(0.0)
    x = x.astype(packed_ws[0].dtype)

    slot = jnp.asarray(slot, jnp.int32) % W
    commit_b = jnp.asarray(commit, bool)
    commitf = commit_b.astype(jnp.float32)[:, None]            # (B, 1)
    # the token at the cursor slot is being evicted this tick
    valid_evict = cache.valid.at[:, slot].set(False)
    validf = valid_evict.astype(jnp.float32)
    valid_new = cache.valid.at[:, slot].set(commit_b)

    scalars = jnp.stack([slot, jnp.int32(0)])
    eh = _head_selector(cfg, packed_ws[0].dtype)

    def bspec(block, imap):
        if interpret:
            return pl.BlockSpec(block, imap)
        return pl.BlockSpec(block, imap, memory_space=pltpu.VMEM)

    def full(arr):
        nd = arr.ndim
        return bspec(arr.shape, lambda i, nd=nd: (0,) * nd)

    L, d, H = cfg.tf_layers, cfg.tf_in_dim, cfg.rnn_hid_size
    extra_in = []
    extra_specs = []
    if not rnn_carry:
        # chronological reordering of the OLD tokens for the RNN replay —
        # computed here (one XLA gather + matmul) so the in-kernel walk
        # uses static indices only
        order = (slot + 1 + jnp.arange(W - 1, dtype=jnp.int32)) % W
        w_ih, b_ih_hh = packed_ws[-5], packed_ws[-4]
        enc_chrono = jnp.take_along_axis(
            cache.enc, order[None, :, None], axis=1)       # (B, W-1, d)
        xin_chrono = (jnp.dot(enc_chrono.reshape(-1, d),
                              w_ih, preferred_element_type=jnp.float32)
                      + b_ih_hh.astype(jnp.float32)).reshape(B, W - 1, H)
        validc = jnp.take_along_axis(validf, order[None, :], axis=1)
        extra_in = [xin_chrono, validc]
        extra_specs = [bspec((bt, W - 1, H), lambda i: (i, 0, 0)),
                       bspec((bt, W - 1), lambda i: (i, 0))]

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                bspec((bt, x.shape[1]), lambda i: (i, 0)),
                bspec((bt, H), lambda i: (i, 0)),
                bspec((bt, 1), lambda i: (i, 0)),
                bspec((bt, W), lambda i: (i, 0)),
                bspec((bt, L, W, d), lambda i: (i, 0, 0, 0)),
                bspec((bt, L, W, d), lambda i: (i, 0, 0, 0)),
                full(eh)] + [full(w) for w in packed_ws] + extra_specs
    out_specs = [bspec((bt, cfg.size_s), lambda i: (i, 0)),
                 bspec((bt, H), lambda i: (i, 0)),
                 bspec((bt, L, d), lambda i: (i, 0, 0)),
                 bspec((bt, L, d), lambda i: (i, 0, 0)),
                 bspec((bt, d), lambda i: (i, 0))]
    out_shape = [
        jax.ShapeDtypeStruct((B, cfg.size_s), jnp.float32),
        jax.ShapeDtypeStruct(cache.h.shape, cache.h.dtype),
        jax.ShapeDtypeStruct((B, L, d), cache.k.dtype),
        jax.ShapeDtypeStruct((B, L, d), cache.v.dtype),
        jax.ShapeDtypeStruct((B, d), cache.enc.dtype),
    ]
    kwargs = {}
    if not interpret:
        # grid programs double-buffer their ring blocks; the default 16 MB
        # scoped-VMEM budget is too small for 2x (bt, L, W, d) k/v tiles
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    y, h_new, kt, vt, enc_new = pl.pallas_call(
        functools.partial(_fused_cached_batch_kernel, cfg=cfg, t_len=W,
                          b_tile=bt, rnn_carry=rnn_carry),
        grid=grid,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        input_output_aliases={2: 1},
        interpret=interpret,
        **kwargs,
    )(scalars, x, cache.h, commitf, validf, cache.k, cache.v,
      eh, *packed_ws, *extra_in)

    # one unaligned dynamic-update-slice per ring, done by XLA (Mosaic
    # cannot store at an arbitrary sublane offset of the 4D pool rings)
    zero = jnp.zeros((), jnp.int32)
    kc = jax.lax.dynamic_update_slice(cache.k, kt[:, :, None, :],
                                      (zero, zero, slot, zero))
    vc = jax.lax.dynamic_update_slice(cache.v, vt[:, :, None, :],
                                      (zero, zero, slot, zero))
    enc = jax.lax.dynamic_update_slice(cache.enc, enc_new[:, None, :],
                                       (zero, slot, zero))
    new_cache = KVCache(k=kc, v=vc, enc=enc, h=h_new, valid=valid_new)
    return new_cache, y


@functools.lru_cache(maxsize=None)
def auto_fused_step(cfg, rnn_carry: bool, interpret: bool,
                    b_tile: int = 128):
    """custom_vmap'd fused cached step: called per stream it runs the
    single-stream kernel; under the pool's vmap (cache/x/commit batched,
    slot the shared global cursor, unbatched) it dispatches to
    fused_cached_batch — one kernel for the whole tick instead of a
    serialised per-stream pallas loop.

    Signature: step(packed_ws, cache, x_token, slot, commit)
    -> (new_cache, y)."""
    import jax.custom_batching

    @jax.custom_batching.custom_vmap
    def step(packed_ws, cache, x_token, slot, commit):
        return _fused_cached_step_slot(packed_ws, cache, x_token, slot,
                                       commit, cfg, rnn_carry, interpret)

    @step.def_vmap
    def _rule(axis_size, in_batched, packed_ws, cache, x_token, slot,
              commit):
        params_b = any(jax.tree_util.tree_leaves(in_batched[0]))
        cache_b = jax.tree_util.tree_leaves(in_batched[1])
        pool_case = (not params_b and all(cache_b) and in_batched[2]
                     and not in_batched[3])
        if pool_case:
            commit_v = (commit if in_batched[4]
                        else jnp.broadcast_to(commit, (axis_size,)))
            bt = b_tile if axis_size % b_tile == 0 else axis_size
            new_cache, y = fused_cached_batch(
                packed_ws, cache, x_token, slot, commit_v, cfg,
                rnn_carry=rnn_carry, b_tile=bt, interpret=interpret)
        else:
            # generic fallback (e.g. per-stream cursors): vmap the
            # single-stream kernel — correct, but serialised
            def one(c, x, s, cm):
                return _fused_cached_step_slot(packed_ws, c, x, s, cm,
                                               cfg, rnn_carry, interpret)

            new_cache, y = jax.vmap(
                one,
                in_axes=(0 if all(cache_b) else None,
                         0 if in_batched[2] else None,
                         0 if in_batched[3] else None,
                         0 if in_batched[4] else None))(
                cache, x_token, slot, commit)
        out_batched = (KVCache(k=True, v=True, enc=True, h=True, valid=True),
                       True)
        return (new_cache, y), out_batched

    return step
