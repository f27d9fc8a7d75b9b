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
    # hoist obstacle scalars out of the step loop (one VMEM scalar load each)
    obs = [(obs_ref[k, 0], obs_ref[k, 1], obs_ref[k, 2], obs_ref[k, 3])
           for k in range(num_obstacles)]

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
        for (oxmin, oymin, oxmax, oymax) in obs:
            # degenerate padding boxes (max < min) are separated from all
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
                     "interpret", "block_rows"),
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
    block_rows: int = BLOCK_ROWS,
) -> tuple[jax.Array, jax.Array]:
    """Fused rollout for the kinematic bicycle. Same contract as
    ops.rollout.rollout_batch: returns (x1 [B, 4], valid [B]).

    B is padded internally to a multiple of the kernel block (8192 lanes).
    """
    B = x0.shape[0]
    K = obstacles.shape[0]
    block = block_rows * LANES
    Bp = max(((B + block - 1) // block) * block, block)

    def to_tiles(col: jax.Array) -> jax.Array:
        return jnp.pad(col, (0, Bp - B)).reshape(Bp // LANES, LANES)

    cols = [to_tiles(x0[:, i]) for i in range(4)] + [
        to_tiles(controls[:, i]) for i in range(3)
    ]
    rows = Bp // LANES
    grid = (rows // block_rows,)

    tile_spec = pl.BlockSpec(
        (block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
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


# ---------------------------------------------------------------------------
# Fully fused variant: control sampling INSIDE the kernel via the TPU
# hardware PRNG (pltpu.prng_random_bits). The reference holds persistent
# curand states per thread (KGMT.cu:109-111); the TPU-native analog is the
# per-core PRNG seeded per (seed, program) — deterministic for a given seed
# but a different stream than jax.random, so the planner treats this as a
# distinct backend ('pallas_rng').
# ---------------------------------------------------------------------------


def _uniform_from_bits(bits, lo: float, hi: float):
    # uint32 -> f32 in [0, 1): keep the top 24 bits (f32 mantissa width).
    # Mosaic lacks a direct uint32->f32 cast; the shifted value fits in a
    # non-negative int32, which casts fine.
    top24 = pltpu.bitcast(bits >> 8, jnp.int32)
    u = top24.astype(jnp.float32) * (1.0 / (1 << 24))
    return lo + u * (hi - lo)


def _rollout_rng_kernel(num_disc: int, num_obstacles: int, agent_length: float,
                        width: float, height: float,
                        a_lo: float, a_hi: float, s_lo: float, s_hi: float,
                        d_lo: float, d_hi: float,
                        seed_ref,
                        x_ref, y_ref, th_ref, v_ref, obs_ref,
                        ox_ref, oy_ref, oth_ref, ov_ref,
                        oa_ref, osteer_ref, odur_ref, valid_ref):
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    shape = x_ref.shape
    a = _uniform_from_bits(
        pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32), a_lo, a_hi
    )
    steer = _uniform_from_bits(
        pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32), s_lo, s_hi
    )
    dur = _uniform_from_bits(
        pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32), d_lo, d_hi
    )
    oa_ref[:] = a
    osteer_ref[:] = steer
    odur_ref[:] = dur

    x = x_ref[:]
    y = y_ref[:]
    th = th_ref[:]
    v = v_ref[:]
    dt = dur * (1.0 / num_disc)
    tan_L = jnp.tan(steer) * (1.0 / agent_length)
    alive = jnp.ones_like(x, dtype=jnp.bool_)
    obs = [(obs_ref[k, 0], obs_ref[k, 1], obs_ref[k, 2], obs_ref[k, 3])
           for k in range(num_obstacles)]

    for _ in range(num_disc):
        nx = x + v * jnp.cos(th) * dt
        ny = y + v * jnp.sin(th) * dt
        nth = th + v * tan_L * dt
        nv = v + a * dt
        clear = (nx > 0.0) & (nx < width) & (ny > 0.0) & (ny < height)
        bb_min_x = jnp.minimum(x, nx)
        bb_max_x = jnp.maximum(x, nx)
        bb_min_y = jnp.minimum(y, ny)
        bb_max_y = jnp.maximum(y, ny)
        for (oxmin, oymin, oxmax, oymax) in obs:
            sep = ((bb_max_x <= oxmin) | (oxmax <= bb_min_x)
                   | (bb_max_y <= oymin) | (oymax <= bb_min_y))
            clear = clear & sep
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
                     "control_bounds", "interpret", "block_rows"),
)
def sample_and_rollout_bicycle_pallas(
    seed: jax.Array,  # int32 scalar
    x0: jax.Array,  # [B, 4]
    obstacles: jax.Array,  # [K, 4]
    *,
    num_disc: int,
    width: float,
    height: float,
    agent_length: float = 1.0,
    control_bounds: tuple = ((-5.0, 5.0), (-3.141592653589793, 3.141592653589793),
                             (0.05, 1.05)),
    interpret: bool = False,
    block_rows: int = BLOCK_ROWS,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fully fused sample+rollout: controls drawn inside the kernel by the
    hardware PRNG. Returns (x1 [B,4], controls [B,3], valid [B])."""
    B = x0.shape[0]
    K = obstacles.shape[0]
    block = block_rows * LANES
    Bp = max(((B + block - 1) // block) * block, block)

    def to_tiles(col):
        return jnp.pad(col, (0, Bp - B)).reshape(Bp // LANES, LANES)

    cols = [to_tiles(x0[:, i]) for i in range(4)]
    rows = Bp // LANES
    grid = (rows // block_rows,)
    tile_spec = pl.BlockSpec(
        (block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    obs_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = (
        [jax.ShapeDtypeStruct((rows, LANES), jnp.float32) for _ in range(7)]
        + [jax.ShapeDtypeStruct((rows, LANES), jnp.int32)]
    )
    (a_b, s_b, d_b) = control_bounds
    kernel = functools.partial(
        _rollout_rng_kernel, num_disc, K, agent_length, width, height,
        a_b[0], a_b[1], s_b[0], s_b[1], d_b[0], d_b[1],
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[seed_spec] + [tile_spec] * 4 + [obs_spec],
        out_specs=[tile_spec] * 8,
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), *cols, obstacles)
    ox, oy, oth, ov, oa, osteer, odur, valid = outs
    x1 = jnp.stack([o.reshape(Bp)[:B] for o in (ox, oy, oth, ov)], axis=-1)
    controls = jnp.stack(
        [o.reshape(Bp)[:B] for o in (oa, osteer, odur)], axis=-1
    )
    return x1, controls, valid.reshape(Bp)[:B] > 0
