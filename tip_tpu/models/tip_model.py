"""The TIP state predictor: causal transformer encoder + uni-directional RNN head.

Functionally equivalent to the reference's ``TF_RNN_Past_State``
(/root/reference/simple_transformer_with_state.py:8-102), re-designed as a
pure function over an explicit parameter pytree so it jits/pjits/vmaps
cleanly and torch checkpoints can be imported exactly.

Reproduced forward quirks (they affect checkpoint compatibility):
  * NaN past-state inputs are zeroed (ref :65);
  * root-velocity channels 108:111 of the history are zeroed (ref :75);
  * independent input dropout on IMU features and (heavy, p=0.8) dropout on
    the past-state history (ref :73,77);
  * a fixed feature interleave between in_linear and the encoder — the
    reference reshapes (T,B,heads,hd) and swaps the last two axes (ref
    :88-89), i.e. a static permutation of the embedding dimension;
  * post-norm transformer layers with ReLU feed-forward (torch 1.7
    TransformerEncoderLayer defaults, internal dropout p=0.1);
  * the RNN hidden state is re-zeroed on every call (ref :95-101).

Deterministic-by-default inference: the reference applies dropout at
inference time no matter what — it constructs ``nn.Dropout`` INLINE in
forward (ref :73,77), and a freshly constructed torch module is always in
train mode, so even an ``.eval()``'d reference model (the call is commented
out anyway, offline_testing_simple.py:87-99) keeps the p=0.8 past-state
dropout active. Pass ``train=True`` + rng to reproduce that stochastic
behaviour; the default is the deterministic path (equal to the reference
constructed with p=0, see tests/test_reference_parity.py).
"""

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ModelConfig:
    input_size_imu: int = 72          # 6*(9+3)
    size_s: int = 131                 # 18*6 + 3 + 5*4
    with_acc_sum: bool = True         # +18 input features
    tf_in_dim: int = 256
    tf_hid_size: int = 1024
    n_heads: int = 16
    tf_layers: int = 4
    rnn_hid_size: int = 512
    with_rnn: bool = True
    in_dropout: float = 0.0
    past_dropout: float = 0.8
    layer_dropout: float = 0.1        # torch TransformerEncoderLayer default
    rnn_dropout: float = 0.0          # single-layer RNN: unused, kept for parity
    rnn_impl: str = "scan"            # "scan" (lax.scan) | "pallas" (fused VMEM kernel)
    # "xla" (per-op loop below) | "pallas" (whole-layer fused fwd + remat
    # bwd kernels, ops/pallas_encoder.py — the training fast path; dropout
    # masks come from the kernel's hash PRNG instead of this rng stream,
    # same marginal distribution; deterministic/inference calls run the
    # same kernel, fp-close to the xla loop). pallas_call has no SPMD
    # partitioning rule, so pjit/mesh TRAINING swaps this back to "xla" in
    # train._mesh_safe — forward() itself does not detect meshes; don't
    # set "pallas" on configs that will trace under a mesh elsewhere.
    # Custom attention masks always take the xla loop.
    encoder_impl: str = "xla"
    # "rng" (jax.random per-site keys, threefry/rbg chosen by the train
    # config) | "hash" (counter-based murmur3 masks, ops/hashmask.
    # hash_keep_mask — no RNG state, fuses as elementwise int ops; the
    # measured-fastest training configuration, PERF.md). Same marginal
    # distribution, different stream.
    dropout_impl: str = "rng"
    # "xla" (this module's forward) | "fused" (whole-model Pallas kernel,
    # ops/fused_forward.py — inference-only, used by the streaming runner's
    # single-output fast path; bf16 weights, ~1e-2 output differences)
    forward_impl: str = "xla"
    compute_dtype: Optional[str] = None   # e.g. "bfloat16"; None = input dtype

    @property
    def input_dim(self) -> int:
        extra = 18 if self.with_acc_sum else 0
        return self.input_size_imu + self.size_s + extra

    @property
    def head_dim(self) -> int:
        return self.tf_in_dim // self.n_heads


def head_interleave_perm(cfg: ModelConfig) -> np.ndarray:
    """Static permutation equal to reshape(heads, hd).T flattening (ref :88-89)."""
    d, h = cfg.tf_in_dim, cfg.n_heads
    hd = d // h
    return np.arange(d).reshape(h, hd).T.reshape(-1)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _uniform(key, shape, bound, dtype):
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def init_params(key, cfg: ModelConfig, dtype=jnp.float32) -> Dict[str, Any]:
    """Initialise with torch-equivalent distributions (Linear: kaiming-uniform
    == U(±1/√fan_in); MHA in_proj: xavier-uniform; LN: ones/zeros)."""
    keys = iter(jax.random.split(key, 64))

    def linear(in_d, out_d):
        b = 1.0 / math.sqrt(in_d)
        return {"w": _uniform(next(keys), (in_d, out_d), b, dtype),
                "b": _uniform(next(keys), (out_d,), b, dtype)}

    d = cfg.tf_in_dim
    layers = []
    for _ in range(cfg.tf_layers):
        # q/k/v stored separately so tensor-parallel sharding splits on
        # whole heads (contiguous hd-multiples) instead of mid-head
        # (parallel.mesh.param_shardings); torch packs them row-wise into
        # in_proj_weight — translated in params_from_torch_state_dict.
        xb = math.sqrt(6.0 / (2 * d))
        layers.append({
            "w_q": _uniform(next(keys), (d, d), xb, dtype),
            "w_k": _uniform(next(keys), (d, d), xb, dtype),
            "w_v": _uniform(next(keys), (d, d), xb, dtype),
            "b_q": jnp.zeros((d,), dtype),
            "b_k": jnp.zeros((d,), dtype),
            "b_v": jnp.zeros((d,), dtype),
            "out_proj": linear(d, d),
            "ff1": linear(d, cfg.tf_hid_size),
            "ff2": linear(cfg.tf_hid_size, d),
            "ln1_s": jnp.ones((d,), dtype), "ln1_b": jnp.zeros((d,), dtype),
            "ln2_s": jnp.ones((d,), dtype), "ln2_b": jnp.zeros((d,), dtype),
        })

    rb = 1.0 / math.sqrt(cfg.rnn_hid_size)
    params = {
        "in_linear": linear(cfg.input_dim, d),
        "layers": layers,
        "out": linear(cfg.rnn_hid_size if cfg.with_rnn else d, cfg.size_s),
    }
    if cfg.with_rnn:
        params["rnn"] = {
            "w_ih": _uniform(next(keys), (d, cfg.rnn_hid_size), rb, dtype),
            "w_hh": _uniform(next(keys), (cfg.rnn_hid_size, cfg.rnn_hid_size), rb, dtype),
            "b_ih": _uniform(next(keys), (cfg.rnn_hid_size,), rb, dtype),
            "b_hh": _uniform(next(keys), (cfg.rnn_hid_size,), rb, dtype),
        }
    return params


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _dropout(x, rate, key, train):
    if not train or rate == 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def _layer_norm(x, scale, bias, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _attention(layer, x, mask, cfg: ModelConfig, key, train, drop=None):
    """Multi-head self-attention, torch-MHA semantics (scale 1/√hd, additive
    mask, dropout on attention weights when training). ``drop`` overrides
    the weight-dropout op (the hash-mask path)."""
    B, T, d = x.shape
    h, hd = cfg.n_heads, cfg.head_dim
    q = x @ layer["w_q"] + layer["b_q"]                   # (B,T,d) each
    k = x @ layer["w_k"] + layer["b_k"]
    v = x @ layer["w_v"] + layer["b_v"]

    def split_heads(t):
        return t.reshape(B, T, h, hd).transpose(0, 2, 1, 3)  # (B,h,T,hd)

    q, k, v = split_heads(q), split_heads(k), split_heads(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd)
    logits = logits + mask                                 # (T,T) broadcast
    w = jax.nn.softmax(logits, axis=-1)
    w = drop(w) if drop is not None else _dropout(w, cfg.layer_dropout,
                                                  key, train)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    o = o.transpose(0, 2, 1, 3).reshape(B, T, d)
    return o @ layer["out_proj"]["w"] + layer["out_proj"]["b"]


def causal_mask(T, dtype=jnp.float32):
    """Additive upper-triangular -inf mask (ref :56-58)."""
    i = jnp.arange(T)[:, None]
    j = jnp.arange(T)[None, :]
    return jnp.where(j > i, jnp.asarray(-jnp.inf, dtype), jnp.asarray(0.0, dtype))


def forward(params, x_imu, x_s, cfg: ModelConfig, *,
            train: bool = False, rng: Optional[jax.Array] = None,
            mask: Optional[jnp.ndarray] = None):
    """Run the predictor.

    Args:
      x_imu: (B, T, 72 or 90) IMU features (with acc-sum appended if enabled).
      x_s:   (B, T, size_s) past-state history.
      mask:  optional additive attention mask (T, T); defaults to causal.
    Returns:
      (B, T, size_s) next-state predictions at every window position.
    """
    B, T, _ = x_imu.shape
    out_dtype = x_imu.dtype
    if cfg.compute_dtype is not None:
        cd = jnp.dtype(cfg.compute_dtype)
        params = jax.tree_util.tree_map(lambda p: p.astype(cd), params)
        x_imu = x_imu.astype(cd)
        x_s = x_s.astype(cd)
    if rng is None:
        keys = [None] * (2 + 4 * cfg.tf_layers)
    else:
        keys = list(jax.random.split(rng, 2 + 4 * cfg.tf_layers))

    use_hash = (cfg.dropout_impl == "hash" and train and rng is not None)
    if use_hash:
        from tip_tpu.ops.hashmask import hash_keep_mask
        seed0 = jax.random.bits(rng, dtype=jnp.uint32).astype(jnp.int32)

        def drop(x, rate, key, site):
            if rate == 0.0:
                return x
            m = hash_keep_mask(seed0, site, x.shape, 1.0 - rate,
                               jnp.float32)
            return x * m.astype(x.dtype)
    else:
        def drop(x, rate, key, site):
            return _dropout(x, rate, key, train)

    x_s = jnp.nan_to_num(x_s, nan=0.0)
    x_imu = drop(x_imu, cfg.in_dropout, keys[0], 200)
    # exclude root velocity from the history input (ref :75)
    x_s = x_s.at[..., 18 * 6:18 * 6 + 3].set(0.0)
    x_s = drop(x_s, cfg.past_dropout, keys[1], 201)

    x = jnp.concatenate([x_imu, x_s], axis=-1)
    x = x @ params["in_linear"]["w"] + params["in_linear"]["b"]

    perm = head_interleave_perm(cfg)
    x = x[..., perm]

    custom_mask = mask is not None
    if mask is None:
        mask = causal_mask(T, x.dtype)

    if cfg.encoder_impl == "pallas" and not custom_mask:
        from tip_tpu.ops import pallas_encoder as PE
        interp = jax.default_backend() != "tpu"
        for li, layer in enumerate(params["layers"]):
            k_attn = keys[2 + 4 * li]
            # train-without-rng must be deterministic (dropout off), matching
            # the XLA path's _dropout semantics when keys are None — not
            # dropout with a fixed all-zero seed
            layer_train = train and k_attn is not None
            if layer_train:
                seed = jax.random.bits(
                    k_attn, dtype=jnp.uint32).astype(jnp.int32)
            else:
                seed = jnp.int32(0)
            ws = PE.pack_layer_weights(layer, x.dtype)
            x = PE.encoder_layer_train(x, ws, seed, cfg.n_heads,
                                       cfg.layer_dropout, layer_train,
                                       8, interp)
    else:
        for li, layer in enumerate(params["layers"]):
            k_attn, k_d1, k_ff, k_d2 = keys[2 + 4 * li: 6 + 4 * li]
            attn_drop = ((lambda w, li=li, k=k_attn: drop(
                w, cfg.layer_dropout, k, 210 + 4 * li))
                if use_hash else None)
            a = _attention(layer, x, mask, cfg, k_attn, train,
                           drop=attn_drop)
            x = _layer_norm(
                x + drop(a, cfg.layer_dropout, k_d1, 211 + 4 * li),
                layer["ln1_s"], layer["ln1_b"])
            f = jax.nn.relu(x @ layer["ff1"]["w"] + layer["ff1"]["b"])
            f = drop(f, cfg.layer_dropout, k_ff, 212 + 4 * li)
            f = f @ layer["ff2"]["w"] + layer["ff2"]["b"]
            x = _layer_norm(
                x + drop(f, cfg.layer_dropout, k_d2, 213 + 4 * li),
                layer["ln2_s"], layer["ln2_b"])

    if cfg.with_rnn:
        rnn = params["rnn"]
        # hoist the input matmul; fold both biases into the pre-activation
        xin = x @ rnn["w_ih"] + rnn["b_ih"] + rnn["b_hh"]

        if cfg.rnn_impl == "pallas":
            # differentiable fused RNN: forward kernel + BPTT backward
            # kernel via custom_vjp (ops.pallas_kernels.fused_rnn_train) —
            # usable under jax.grad for training, identical under inference
            from tip_tpu.ops.pallas_kernels import fused_rnn_train
            x = fused_rnn_train(xin, rnn["w_hh"],
                                jax.default_backend() != "tpu")
        else:
            def cell(h, x_t):
                h = jnp.tanh(x_t + h @ rnn["w_hh"])
                return h, h

            h0 = jnp.zeros((B, cfg.rnn_hid_size), x.dtype)  # zeroed every call
            _, hs = jax.lax.scan(cell, h0, xin.transpose(1, 0, 2))
            x = hs.transpose(1, 0, 2)

    return (x @ params["out"]["w"] + params["out"]["b"]).astype(out_dtype)


# ---------------------------------------------------------------------------
# torch checkpoint import
# ---------------------------------------------------------------------------

def params_from_torch_state_dict(sd, cfg: ModelConfig, dtype=jnp.float32):
    """Translate a reference ``TF_RNN_Past_State.state_dict()`` into our pytree.

    Weight-layout notes: torch Linear stores (out, in) — transposed here;
    MHA packs q/k/v row-wise into in_proj_weight (3d, d).

    Accepts state dicts saved from a ``torch.nn.DataParallel``-wrapped
    model (every key prefixed ``module.``): the reference's shipped
    checkpoints were saved by train_model.py:220-225 from a possibly
    GPU-wrapped module, so the importer normalises the prefix away.
    """
    if sd and all(k.startswith("module.") for k in sd):
        sd = {k[len("module."):]: v for k, v in sd.items()}

    def t(name):
        arr = sd[name]
        if hasattr(arr, "detach"):
            arr = arr.detach().cpu().numpy()
        return jnp.asarray(np.asarray(arr), dtype)

    params = {
        "in_linear": {"w": t("in_linear.weight").T, "b": t("in_linear.bias")},
        "layers": [],
        "out": {"w": t("linear.weight").T, "b": t("linear.bias")},
    }
    d = cfg.tf_in_dim
    for i in range(cfg.tf_layers):
        p = f"tf_encode.layers.{i}."
        w_in = t(p + "self_attn.in_proj_weight")     # (3d, d) rows [q;k;v]
        b_in = t(p + "self_attn.in_proj_bias")
        params["layers"].append({
            "w_q": w_in[:d].T, "w_k": w_in[d:2 * d].T, "w_v": w_in[2 * d:].T,
            "b_q": b_in[:d], "b_k": b_in[d:2 * d], "b_v": b_in[2 * d:],
            "out_proj": {"w": t(p + "self_attn.out_proj.weight").T,
                         "b": t(p + "self_attn.out_proj.bias")},
            "ff1": {"w": t(p + "linear1.weight").T, "b": t(p + "linear1.bias")},
            "ff2": {"w": t(p + "linear2.weight").T, "b": t(p + "linear2.bias")},
            "ln1_s": t(p + "norm1.weight"), "ln1_b": t(p + "norm1.bias"),
            "ln2_s": t(p + "norm2.weight"), "ln2_b": t(p + "norm2.bias"),
        })
    if cfg.with_rnn:
        params["rnn"] = {
            "w_ih": t("rnn.weight_ih_l0").T, "w_hh": t("rnn.weight_hh_l0").T,
            "b_ih": t("rnn.bias_ih_l0"), "b_hh": t("rnn.bias_hh_l0"),
        }
    return params
