"""Pallas-fused propagate+check kernel (SURVEY.md §7 build step 5).

The TPU analog of the reference's fused rollout+collision CUDA kernel
(propagateAndCheck, statePropagator.cu:5-76 + collisionCheck.cu:6-28): one
kernel integrates ``num_disc`` Euler steps of the kinematic bicycle and tests
every step's swept AABB against the obstacle set, entirely in VMEM/registers.

Layout: struct-of-arrays. The batch lives on the VPU lane axis as [rows, 128]
f32 tiles (8 sublanes x 128 lanes per program); each state/control component
is its own 2-D array, so every operation in the kernel is a dense elementwise
VPU op — no gathers, no transposes, no AoS strided access (the reference's
AoS float7 layout would be poison here). The obstacle set (K x 4 floats)
is broadcast from VMEM. ``tan(steering)`` is loop-invariant and hoisted
(the reference recomputes it every step, statePropagator.cu:36).

This is VPU-roofline work (transcendental-dominated, no MXU); the win over
the XLA-fused jnp path comes from keeping the whole unrolled step loop in one
kernel with zero intermediate HBM traffic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cudasbmp_tpu.systems.bicycle import KinematicBicycle

# 8 sublanes x 128 lanes x ROW_TILES rows per kernel program
SUBLANES = 8
LANES = 128
ROW_TILES = 8  # rows of (8,128) per program -> 8192 lanes per program
BLOCK_ROWS = SUBLANES * ROW_TILES


def _rollout_kernel(num_disc: int, num_obstacles: int, agent_length: float,
                    width: float, height: float,
                    x_ref, y_ref, th_ref, v_ref, a_ref, steer_ref, dur_ref,
                    obs_ref,
                    ox_ref, oy_ref, oth_ref, ov_ref, valid_ref):
    x = x_ref[:]
    y = y_ref[:]
    th = th_ref[:]
    v = v_ref[:]
    a = a_ref[:]
    dt = dur_ref[:] * (1.0 / num_disc)
    # loop-invariant steering tangent, scaled by 1/L
    tan_L = jnp.tan(steer_ref[:]) * (1.0 / agent_length)

    alive = jnp.ones_like(x, dtype=jnp.bool_)

    for _ in range(num_disc):
        nx = x + v * jnp.cos(th) * dt
        ny = y + v * jnp.sin(th) * dt
        nth = th + v * tan_L * dt
        nv = v + a * dt
        in_bounds = (nx > 0.0) & (nx < width) & (ny > 0.0) & (ny < height)
        bb_min_x = jnp.minimum(x, nx)
        bb_max_x = jnp.maximum(x, nx)
        bb_min_y = jnp.minimum(y, ny)
        bb_max_y = jnp.maximum(y, ny)
        clear = in_bounds
        for k in range(num_obstacles):
            # obstacle AABB (scalars broadcast over the tile); degenerate
            # padding boxes (max < min) are separated from everything
            oxmin = obs_ref[k, 0]
            oymin = obs_ref[k, 1]
            oxmax = obs_ref[k, 2]
            oymax = obs_ref[k, 3]
            sep = ((bb_max_x <= oxmin) | (oxmax <= bb_min_x)
                   | (bb_max_y <= oymin) | (oymax <= bb_min_y))
            clear = clear & sep
        # freeze dead lanes at their failing-step candidate (break parity)
        x = jnp.where(alive, nx, x)
        y = jnp.where(alive, ny, y)
        th = jnp.where(alive, nth, th)
        v = jnp.where(alive, nv, v)
        alive = alive & clear

    ox_ref[:] = x
    oy_ref[:] = y
    oth_ref[:] = th
    ov_ref[:] = v
    valid_ref[:] = alive.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("num_disc", "width", "height", "agent_length",
                     "interpret"),
)
def rollout_bicycle_pallas(
    x0: jax.Array,  # [B, 4] start states
    controls: jax.Array,  # [B, 3] (a, steering, duration)
    obstacles: jax.Array,  # [K, 4]
    *,
    num_disc: int,
    width: float,
    height: float,
    agent_length: float = 1.0,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused rollout for the kinematic bicycle. Same contract as
    ops.rollout.rollout_batch: returns (x1 [B, 4], valid [B]).

    B is padded internally to a multiple of the kernel block (8192 lanes).
    """
    B = x0.shape[0]
    K = obstacles.shape[0]
    block = BLOCK_ROWS * LANES
    Bp = max(((B + block - 1) // block) * block, block)

    def to_tiles(col: jax.Array) -> jax.Array:
        return jnp.pad(col, (0, Bp - B)).reshape(Bp // LANES, LANES)

    cols = [to_tiles(x0[:, i]) for i in range(4)] + [
        to_tiles(controls[:, i]) for i in range(3)
    ]
    rows = Bp // LANES
    grid = (rows // BLOCK_ROWS,)

    tile_spec = pl.BlockSpec(
        (BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    obs_spec = pl.BlockSpec(memory_space=pltpu.VMEM)  # whole [K, 4] array
    out_shape = [
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32) for _ in range(4)
    ] + [jax.ShapeDtypeStruct((rows, LANES), jnp.int32)]

    kernel = functools.partial(
        _rollout_kernel, num_disc, K, agent_length, width, height
    )
    ox, oy, oth, ov, valid = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tile_spec] * 7 + [obs_spec],
        out_specs=[tile_spec] * 5,
        out_shape=out_shape,
        interpret=interpret,
    )(*cols, obstacles)

    x1 = jnp.stack(
        [o.reshape(Bp)[:B] for o in (ox, oy, oth, ov)], axis=-1
    )
    return x1, valid.reshape(Bp)[:B] > 0


def supports_system(system) -> bool:
    """The fused kernel currently covers the flagship (bicycle) system;
    other systems use the generic jnp path."""
    return isinstance(system, KinematicBicycle)
