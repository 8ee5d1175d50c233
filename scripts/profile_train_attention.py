"""One-off probe: where does the training step's encoder time go?

PERF.md: the 4 encoder layers cost ~3.2 ms/layer fwd+bwd and the suspicion
is the per-head attention matmuls — (B*h, T, hd) batches with hd=16 pad 8x
to the 128-lane MXU tile. This script times isolated pieces at the paper
shape (B=256, T=40, d=256, h=16) to rank the levers before building a
kernel. Run on the TPU (default env).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, x, iters=200, reps=5):
    """Time fn amortised over `iters` sequential applications inside ONE jit
    (the tunnel costs ~30 ms per dispatch; see CLAUDE.md). fn must map a
    (B,T,d) x to something reducible; we fold the output back into x's dtype
    so iterations are data-dependent (no DCE / no overlap)."""

    @jax.jit
    def loop(x):
        def body(c, _):
            o = fn(c)
            # fold a scalar of the output back in to chain the iterations
            s = jnp.sum(o.astype(jnp.float32)) * 1e-12
            return c + s.astype(c.dtype), None

        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c

    jax.block_until_ready(loop(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(x))
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters * 1e3


def main():
    B, T, d, h = 256, 40, 256, 16
    hd = d // h
    ff = 1024
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 10)
    x = jax.random.normal(ks[0], (B, T, d), dt)
    wq = jax.random.normal(ks[1], (d, d), dt) * 0.06
    wk = jax.random.normal(ks[2], (d, d), dt) * 0.06
    wv = jax.random.normal(ks[3], (d, d), dt) * 0.06
    wo = jax.random.normal(ks[4], (d, d), dt) * 0.06
    w1 = jax.random.normal(ks[5], (d, ff), dt) * 0.06
    w2 = jax.random.normal(ks[6], (ff, d), dt) * 0.06
    mask = jnp.where(jnp.arange(T)[None] > jnp.arange(T)[:, None],
                     jnp.asarray(-1e30, dt), jnp.asarray(0, dt))

    import math

    def attn_heads(x):
        q = (x @ wq).reshape(B, T, h, hd).transpose(0, 2, 1, 3)
        k = (x @ wk).reshape(B, T, h, hd).transpose(0, 2, 1, 3)
        v = (x @ wv).reshape(B, T, h, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd) + mask
        w = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        return (o.transpose(0, 2, 1, 3).reshape(B, T, d) @ wo)

    def projections_only(x):
        return x @ wq + x @ wk + x @ wv + x @ wo

    def ff_block(x):
        return jax.nn.relu(x @ w1) @ w2

    def scores_only(x):
        q = (x @ wq).reshape(B, T, h, hd).transpose(0, 2, 1, 3)
        k = (x @ wk).reshape(B, T, h, hd).transpose(0, 2, 1, 3)
        return jnp.einsum("bhqd,bhkd->bhqk", q, k)

    def loss_wrap(f):
        def g(x):
            return jnp.sum(f(x).astype(jnp.float32) ** 2)
        return jax.grad(g)

    def _ln(v):
        mu = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.var(v, axis=-1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + 1e-5)

    def make_layer(dropout: bool):
        def layer(x):
            key = jax.random.fold_in(jax.random.PRNGKey(1), 0)
            ks = jax.random.split(key, 4)

            def drop(v, k, rate=0.1):
                if not dropout:
                    return v
                keep = 1.0 - rate
                m = jax.random.bernoulli(k, keep, v.shape)
                return jnp.where(m, v / keep, 0.0)

            q = (x @ wq).reshape(B, T, h, hd).transpose(0, 2, 1, 3)
            k = (x @ wk).reshape(B, T, h, hd).transpose(0, 2, 1, 3)
            v = (x @ wv).reshape(B, T, h, hd).transpose(0, 2, 1, 3)
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd) + mask
            w = drop(jax.nn.softmax(s, axis=-1), ks[0])
            o = jnp.einsum("bhqk,bhkd->bhqd", w, v)
            a = o.transpose(0, 2, 1, 3).reshape(B, T, d) @ wo
            x = _ln(x + drop(a, ks[1]))
            f = drop(jax.nn.relu(x @ w1), ks[2])
            return _ln(x + drop(f @ w2, ks[3]))
        return layer

    cases = [("attn_full", attn_heads),
             ("projections_only", projections_only),
             ("ff_block", ff_block),
             ("scores_only", scores_only),
             ("layer_nodrop", make_layer(False)),
             ("layer_dropout", make_layer(True))]
    for name, f in cases:
        fwd = timeit(f, x)
        bwd = timeit(loss_wrap(f), x)
        print(f"{name:22s} fwd {fwd:7.3f} ms   fwd+bwd {bwd:7.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
