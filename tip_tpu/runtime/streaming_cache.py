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
    )


def _push(ring, k, x, window: int):
    """Circular ring write: slot k % window. Unlike the base runner's
    shift-left windows (which must stay chronological for the dense model
    input), the cache rings only need a validity mask — attention is
    permutation-invariant over its keys — so one slot-write per frame
    replaces an O(window) shift. HBM traffic per frame drops ~40x on the
    K/V/enc state, the dominant cost of batched cached serving."""
    return ring.at[k % window].set(x)


def cached_forward_step(params, cache: KVCache, x_token, k_prev,
                        cfg, *, rnn_carry: bool = False,
                        ) -> Tuple[KVCache, jnp.ndarray]:
    """One streaming token through the encoder with cached K/V.

    Args:
      x_token: (input_dim,) the newest window token [imu ++ acc_sum ++
        history] — the same channels forward() sees at the last position.
      k_prev: () int32 — window entries before this frame (ring push index).
      cfg: ModelConfig.
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

    n_valid = jnp.minimum(k_prev + 1, W)       # tokens visible after push
    valid = jnp.arange(W) < n_valid            # left-aligned ring validity

    k_rings, v_rings = [], []
    for li, layer in enumerate(params["layers"]):
        q = x @ layer["w_q"] + layer["b_q"]
        kt = x @ layer["w_k"] + layer["b_k"]
        vt = x @ layer["w_v"] + layer["b_v"]
        k_ring = _push(cache.k[li].astype(kt.dtype), k_prev, kt, W)
        v_ring = _push(cache.v[li].astype(vt.dtype), k_prev, vt, W)
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

    enc_ring = _push(cache.enc.astype(x.dtype), k_prev, x, W)

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
        # so the scan walks ages oldest-to-newest via modular indexing.
        xin = enc_ring @ rnn["w_ih"] + rnn["b_ih"] + rnn["b_hh"]   # (W, H)
        slot = k_prev % W
        start = jnp.where(k_prev + 1 <= W, 0, (slot + 1) % W)

        def cell(hprev, j):
            idx = (start + j) % W
            h_next = jnp.tanh(xin[idx] + hprev @ rnn["w_hh"])
            return jnp.where(j < n_valid, h_next, hprev), None

        h0 = jnp.zeros((cfg.rnn_hid_size,), xin.dtype)
        h_t, _ = jax.lax.scan(cell, h0, jnp.arange(W))
        h_carry = cache.h

    y = h_t @ params["out"]["w"] + params["out"]["b"]

    new_cache = KVCache(
        k=jnp.stack(k_rings).astype(dtype),
        v=jnp.stack(v_rings).astype(dtype),
        enc=enc_ring.astype(dtype),
        h=h_carry.astype(dtype),
    )
    return new_cache, y.astype(dtype)
