"""Training losses, NaN-mask aware.

Functional equivalents of the reference's learning_utils.py:13-78, written as
masked arithmetic (no boolean indexing) so they jit with static shapes:
DIP rows carry NaN root-velocity / SBP labels that must be excluded from the
mean without changing array shapes.
"""

import jax.numpy as jnp


def _masked_mean(err, row_mask):
    """Mean of err over rows where row_mask is True (matches torch's
    ``x[mask].mean()``: averages over selected rows x row width)."""
    n = jnp.sum(row_mask)
    total = jnp.sum(jnp.where(row_mask[:, None], err, 0.0))
    width = err.shape[-1]
    return total / jnp.maximum(n * width, 1)


def loss_q_only_2axis(ra, rb):
    """Pose + root-velocity loss (reference learning_utils.py:49-78).

    ra, rb: (N, 111) = 108 two-axis rotation channels + 3 root velocity;
    rb is the prediction. Root-velocity rows with NaN ground truth (DIP data)
    are masked out; xy is weighted x6, z x12, pose x100.
    """
    r2_a, r2_b = ra[:, :-3], rb[:, :-3]
    loss_q = jnp.mean((r2_b - r2_a) ** 2) * 100.0

    xy_a, xy_b = ra[:, -3:-1], rb[:, -3:-1]
    mask = ~jnp.any(jnp.isnan(xy_a), axis=1)
    xy_a = jnp.nan_to_num(xy_a)
    loss_xy = _masked_mean((xy_a - xy_b) ** 2, mask) * 6.0

    z_a, z_b = ra[:, -1:], rb[:, -1:]
    z_a = jnp.nan_to_num(z_a)
    loss_z = _masked_mean((z_a - z_b) ** 2, mask) * 12.0

    return loss_q + loss_xy + loss_z


def _bce_with_logits(logits, targets):
    """Numerically-stable BCE(sigmoid(logits), targets), elementwise."""
    return jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def loss_constr_multi(ra, rb, n_sbps: int = 5):
    """SBP loss (reference learning_utils.py:13-34).

    ra: (N, 4*n_sbps) ground truth [flag, offset*3] per SBP; rb: prediction
    [logit, offset*3]. Rows with any NaN GT are masked. Offsets are compared
    against 5 x GT (the model predicts scaled offsets), weighted x4; the
    total is averaged over SBPs and scaled x2.5.
    """
    mask = ~jnp.any(jnp.isnan(ra), axis=1)
    ra = jnp.nan_to_num(ra)
    total = 0.0
    for i in range(n_sbps):
        s = 4 * i
        c_l = _masked_mean(
            _bce_with_logits(rb[:, s:s + 1], ra[:, s:s + 1]), mask)
        r_l = _masked_mean(
            (rb[:, s + 1:s + 4] - ra[:, s + 1:s + 4] * 5.0) ** 2, mask)
        total = total + c_l + r_l * 4.0
    return total / n_sbps * 2.5


def loss_jerk(rb):
    """Third-finite-difference smoothness loss on the 108 pose channels
    (reference learning_utils.py:37-46). rb: (B, T, 108)."""
    jit_ = rb[:, 3:, :] - 3 * rb[:, 2:-1, :] + 3 * rb[:, 1:-2, :] - rb[:, :-3, :]
    return jnp.mean(jit_ ** 2) * 100.0
