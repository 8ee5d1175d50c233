"""Terrain estimation: height-region clustering over a 2-D grid.

Functional JAX re-design of the reference's terrain subsystem
(real_time_runner.py:113-277): SBP contact heights are clustered into height
regions; a region-id map and a confidence map over a fixed grid record which
region owns each cell; root-height corrections are derived from the region
height under the contact point.

Differences from the reference (documented divergences):
  * the region table has a fixed capacity (the reference grows a Python list,
    real_time_runner.py:236-240); when full, the last slot is reused;
  * update patches are clamped to the grid (the reference's raw numpy slicing
    silently wraps/empties at the boundary, which is a latent bug there);
  * "pick a nearby region of similar height" scans all patch cells instead of
    a Python set() of unique ids — same minimum, deterministic tie-break.
"""

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from tip_tpu import constants as cst


@dataclass(frozen=True)
class TerrainConfig:
    map_bound: float = cst.MAP_BOUND      # grid covers [-bound, bound] m
    grid_size: float = cst.GRID_SIZE
    max_regions: int = 64
    establish_ticks: int = 50             # establishing phase length (ref :77)
    temporal_inertia: float = 1.0
    height_correction_force: float = 20.0
    pelvis_terrain_thres: float = 0.2
    update_epsilon: float = 0.1
    diffuse_m: float = 0.5                # patch half-size in meters

    @property
    def grid_num(self) -> int:
        return int(self.map_bound / self.grid_size) * 2

    @property
    def diffuse_region(self) -> int:
        return round(self.diffuse_m / self.grid_size)


@struct.dataclass
class TerrainState:
    region_map: jnp.ndarray        # (G, G) int32 region id per cell
    confidence: jnp.ndarray        # (G, G) f32
    region_height: jnp.ndarray     # (R,) f32
    region_weight: jnp.ndarray     # (R,) f32
    n_regions: jnp.ndarray         # () int32 allocation cursor


def terrain_init(cfg: TerrainConfig, dtype=jnp.float32) -> TerrainState:
    G, R = cfg.grid_num, cfg.max_regions
    return TerrainState(
        region_map=jnp.zeros((G, G), jnp.int32),
        confidence=jnp.full((G, G), -100.0, dtype),
        region_height=jnp.zeros((R,), dtype),           # region 0: ground z=0
        region_weight=jnp.zeros((R,), dtype).at[0].set(10.0),
        n_regions=jnp.asarray(1, jnp.int32),
    )


def _diffuse_confidence(cfg: TerrainConfig, dtype) -> jnp.ndarray:
    """Radial cost map used only for ranking (ref :130-137)."""
    d = cfg.diffuse_region
    x = np.arange(-d, d)
    xx, yy = np.meshgrid(x, x)
    return jnp.asarray(-np.sqrt(xx ** 2 + yy ** 2), dtype)


def update_height_map(state: TerrainState, cfg: TerrainConfig, c_loc,
                      do_update) -> Tuple[TerrainState, jnp.ndarray]:
    """One SBP height observation (reference update_height_map_new,
    real_time_runner.py:140-262, minus the tick bookkeeping which lives in
    the runner carry).

    Args:
      c_loc: (3,) the (previous-step) SBP world location.
      do_update: () bool — contact active and establishing tick == 0.

    Returns (new_state, height_correction): correction =
      region_height[region under the contact] - contact height (0 if no
      update happened).
    """
    G = cfg.grid_num
    d = cfg.diffuse_region
    dtype = state.confidence.dtype
    c_loc = jnp.asarray(c_loc, dtype)

    h = c_loc[2]
    ci = jnp.round(c_loc[0] / cfg.grid_size).astype(jnp.int32) + G // 2
    cj = jnp.round(c_loc[1] / cfg.grid_size).astype(jnp.int32) + G // 2
    i0 = jnp.clip(ci - d, 0, G - 2 * d)
    j0 = jnp.clip(cj - d, 0, G - 2 * d)

    region_old = jax.lax.dynamic_slice(state.region_map, (i0, j0), (2 * d, 2 * d))
    conf_old = jax.lax.dynamic_slice(state.confidence, (i0, j0), (2 * d, 2 * d))

    # --- choose region: nearby cell with similar height, else allocate ------
    patch_heights = state.region_height[region_old]
    diffs = jnp.abs(patch_heights - h)
    flat_idx = jnp.argmin(diffs)
    best_region = region_old.reshape(-1)[flat_idx]
    min_diff = diffs.reshape(-1)[flat_idx]

    is_ground = h < state.region_height[0] + cfg.update_epsilon
    found = min_diff < cfg.update_epsilon
    new_idx = jnp.minimum(state.n_regions, cfg.max_regions - 1)

    region_id = jnp.where(is_ground, 0,
                          jnp.where(found, best_region, new_idx))
    allocate = do_update & ~is_ground & ~found

    # --- update region table -------------------------------------------------
    old_h = state.region_height[region_id]
    old_w = state.region_weight[region_id]
    merged_h = (old_h * old_w * cfg.temporal_inertia + h) \
        / (old_w * cfg.temporal_inertia + 1.0)
    upd_h = jnp.where(allocate, h, merged_h)
    upd_w = jnp.where(allocate, 10.0, old_w + 1.0)

    region_height = jnp.where(
        do_update, state.region_height.at[region_id].set(upd_h),
        state.region_height)
    region_weight = jnp.where(
        do_update, state.region_weight.at[region_id].set(upd_w),
        state.region_weight)
    n_regions = jnp.where(allocate,
                          jnp.minimum(state.n_regions + 1, cfg.max_regions),
                          state.n_regions)

    # --- merge patch into maps ------------------------------------------------
    conf_new = _diffuse_confidence(cfg, dtype)
    keep_old = conf_old > conf_new
    region_merge = jnp.where(keep_old, region_old, region_id)
    conf_merge = jnp.maximum(conf_old, conf_new)

    region_map = jax.lax.dynamic_update_slice(
        state.region_map,
        jnp.where(do_update, region_merge, region_old), (i0, j0))
    confidence = jax.lax.dynamic_update_slice(
        state.confidence,
        jnp.where(do_update, conf_merge, conf_old), (i0, j0))

    # height correction for the root (ref :262): region under the center cell
    center_region = region_map[jnp.clip(ci, 0, G - 1), jnp.clip(cj, 0, G - 1)]
    correction = jnp.where(do_update, region_height[center_region] - h, 0.0)

    new_state = TerrainState(region_map=region_map, confidence=confidence,
                             region_height=region_height,
                             region_weight=region_weight, n_regions=n_regions)
    return new_state, correction


def height_field(state: TerrainState) -> jnp.ndarray:
    """Dense (G, G) height map for rendering (reference rebuilds this with a
    python double loop every 15 frames, offline_testing_simple.py:199-205)."""
    return state.region_height[state.region_map]
