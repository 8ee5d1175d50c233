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


def timeit(fn, *args, reps=20):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    del out
    return min(ts) * 1e3


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
        return jax.jit(jax.grad(g))

    for name, f in [("attn_full", attn_heads),
                    ("projections_only", projections_only),
                    ("ff_block", ff_block),
                    ("scores_only", scores_only)]:
        fwd = timeit(jax.jit(f), x)
        bwd = timeit(loss_wrap(f), x)
        print(f"{name:22s} fwd {fwd:7.3f} ms   fwd+bwd {bwd:7.3f} ms")


if __name__ == "__main__":
    main()
