"""Offline 3D skeleton + terrain renderer (matplotlib, no PyBullet).

The reference's visual output is PyBullet's GUI (render_funcs.py:69-227:
character body, SBP marker spheres, terrain boxes in an interactive window).
The pybullet wheel is absent from this image by design, so this module gives
the framework a rendering path it fully owns: trajectories are FK'd with the
JAX engine and drawn as 3D stick figures with matplotlib (Agg), written as
PNG frames or an animated GIF (PIL writer — no ffmpeg dependency).

Rendered elements, mirroring the reference GUI's information content:
  * predicted skeleton (bones = joint-frame link segments), solid;
  * optional ground-truth skeleton, dashed gray (the reference's GT-compare
    viewer, offline_testing_simple.py:228-260);
  * optional SBP markers: active-contact locations as red dots (the
    reference's marker spheres, render_funcs.py:178-205);
  * optional terrain height map: established cells of the runner's final
    map drawn as a surface (the reference's terrain boxes, :min 140-262).
"""

import os
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from tip_tpu.ops import kinematics as kin


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


@jax.jit
def _fk_links(skel: kin.Skeleton, qdq_traj):
    """(T, 114) our-states -> (T, J+1, 3) joint-frame link positions."""
    qdq_traj = qdq_traj.astype(skel.joint_offset.dtype)
    _, pq_jf = jax.vmap(
        lambda s: kin.fk_our_state(skel, s, return_joint_frame=True))(qdq_traj)
    return pq_jf[..., :3]


def bone_segments(skel: kin.Skeleton):
    """(B, 2) link-index pairs: one bone per joint, parent link -> child
    link (pq rows are root-first, so joint j's child link is row j+1)."""
    return np.array([(p + 1, j + 1) for j, p in enumerate(skel.parent)],
                    dtype=np.int64)


def _draw_skeleton(ax, links: np.ndarray, bones: np.ndarray,
                   color: str, ls: str = "-", lw: float = 2.0, alpha=1.0):
    for a, b in bones:
        ax.plot(*zip(links[a], links[b]), color=color, ls=ls, lw=lw,
                alpha=alpha)
    ax.scatter(*links[0], color=color, s=18, alpha=alpha)   # root


def _draw_terrain(ax, terrain_state, terrain_cfg, pad_m: float = 2.0,
                  center_xy=(0.0, 0.0)):
    """Established cells of the height map near the character, as a surface."""
    from tip_tpu.runtime import terrain as terrain_lib
    conf = np.asarray(terrain_state.confidence)
    h = np.asarray(terrain_lib.height_field(terrain_state))
    G, gs = terrain_cfg.grid_num, terrain_cfg.grid_size
    xs = (np.arange(G) - G // 2) * gs
    keep = (np.abs(xs - center_xy[0]) <= pad_m)[:, None] \
        & (np.abs(xs - center_xy[1]) <= pad_m)[None, :]
    est = (conf > -99.0) & keep
    if not est.any():
        return
    ii, jj = np.nonzero(est)
    ax.bar3d(xs[ii] - gs / 2, xs[jj] - gs / 2, np.zeros(len(ii)),
             gs, gs, np.maximum(h[ii, jj], 1e-3),
             color="tan", alpha=0.35, shade=False, edgecolor="none")


def render_frame(skel: kin.Skeleton, qdq: np.ndarray,
                 gt_qdq: Optional[np.ndarray] = None,
                 sbp_locs: Optional[np.ndarray] = None,
                 terrain_state=None, terrain_cfg=None,
                 elev: float = 18.0, azim: float = -70.0,
                 half_extent: float = 1.6, dpi: int = 80) -> np.ndarray:
    """Render one posed frame to an (H, W, 3) uint8 RGB array.

    sbp_locs: (n_sbps, 3) active-contact world locations; rows >= 99 (the
    runner's "inactive" sentinel, runtime/runner.py viz track) are skipped.
    """
    plt = _plt()
    links = np.asarray(_fk_links(skel, jnp.asarray(qdq[None])))[0]
    bones = bone_segments(skel)

    fig = plt.figure(figsize=(5, 5), dpi=dpi)
    ax = fig.add_subplot(111, projection="3d")
    c = links[0]
    if terrain_state is not None and terrain_cfg is not None:
        _draw_terrain(ax, terrain_state, terrain_cfg,
                      pad_m=half_extent, center_xy=(c[0], c[1]))
    if gt_qdq is not None:
        gt_links = np.asarray(_fk_links(skel, jnp.asarray(gt_qdq[None])))[0]
        _draw_skeleton(ax, gt_links, bones, color="gray", ls="--", lw=1.5,
                       alpha=0.8)
    _draw_skeleton(ax, links, bones, color="tab:blue")
    if sbp_locs is not None:
        act = np.asarray(sbp_locs)
        act = act[np.all(np.abs(act) < 99.0, axis=-1)]
        if len(act):
            ax.scatter(act[:, 0], act[:, 1], act[:, 2], color="red", s=30)

    ax.set_xlim(c[0] - half_extent, c[0] + half_extent)
    ax.set_ylim(c[1] - half_extent, c[1] + half_extent)
    ax.set_zlim(0.0, 2 * half_extent)
    ax.view_init(elev=elev, azim=azim)
    ax.set_box_aspect((1, 1, 1))
    fig.tight_layout(pad=0)
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return buf


def render_motion(skel: kin.Skeleton, qdq_traj: np.ndarray, out_path: str,
                  gt_qdq: Optional[np.ndarray] = None,
                  viz_locs: Optional[np.ndarray] = None,
                  terrain_state=None, terrain_cfg=None,
                  stride: int = 4, fps: int = 15, **frame_kw) -> int:
    """Render a trajectory to ``out_path`` (.gif animated via PIL, or a
    printf-style .png pattern, e.g. frames_%04d.png). Returns frame count.

    viz_locs: (T, n_sbps, 3) runner SBP viz track (inactive rows are 100s).
    Terrain, if given, is the run's FINAL map on every frame (same
    simplification as viz/pybullet_viz.py's offline replay, documented
    there as a divergence from the reference's 15-frame re-mesh cadence).
    """
    T = len(qdq_traj)
    idx = range(0, T, max(1, stride))
    frames = [render_frame(
        skel, qdq_traj[t],
        gt_qdq=None if gt_qdq is None else gt_qdq[t],
        sbp_locs=None if viz_locs is None else viz_locs[t],
        terrain_state=terrain_state, terrain_cfg=terrain_cfg, **frame_kw)
        for t in idx]
    if out_path.endswith(".gif"):
        from PIL import Image
        ims = [Image.fromarray(f) for f in frames]
        os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
        ims[0].save(out_path, save_all=True, append_images=ims[1:],
                    duration=int(1000 / fps), loop=0)
    else:
        from PIL import Image
        os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
        for i, f in enumerate(frames):
            Image.fromarray(f).save(out_path % i)
    return len(frames)


def render_eval_dump(dump_path: str, out_path: str, motion: int = 0,
                     skel: Optional[kin.Skeleton] = None,
                     **kw) -> int:
    """Render one motion from an eval-harness raw-trajectory dump
    (``evaluate(save_trajs_path=...)``: {gt_list, ours_list, files})."""
    import pickle
    with open(dump_path, "rb") as fh:
        d = pickle.load(fh)
    skel = skel or kin.amass_skeleton()
    return render_motion(skel, np.asarray(d["ours_list"][motion]), out_path,
                         gt_qdq=np.asarray(d["gt_list"][motion]), **kw)
