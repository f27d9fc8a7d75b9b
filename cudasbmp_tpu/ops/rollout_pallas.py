"""Pallas-fused propagate+check kernels (SURVEY.md §7 build step 5).

The TPU analog of the reference's fused rollout+collision CUDA kernel
(propagateAndCheck, statePropagator.cu:5-76 + collisionCheck.cu:6-28): one
kernel integrates ``num_disc`` Euler steps of the dynamics and tests every
step's swept AABB against the obstacle set, entirely in VMEM/registers.

Layout: struct-of-arrays. The batch lives on the VPU lane axis as [rows, 128]
f32 tiles (8 sublanes x 128 lanes per program); each state/control component
is its own 2-D array, so every operation in the kernel is a dense elementwise
VPU op — no gathers, no transposes, no AoS strided access (the reference's
AoS float7 layout would be poison here). The obstacle set (K x 4 floats)
is broadcast from VMEM.

The kernel is GENERIC over dynamics: any system exposing the SoA hooks
``soa_prepare`` (per-rollout precomputation — e.g. the bicycle hoists the
unscaled ``tan(steering)``, which the reference recomputes every step,
statePropagator.cu:36; kept unscaled so the step's float-op order matches
the jnp path bitwise) and ``soa_step`` (one Euler step on per-component
arrays) gets the fused path; see systems.base.SoAStepMixin. Two variants:

- ``rollout_pallas``: controls supplied by the caller (threefry streams).
- ``sample_and_rollout_pallas``: control sampling INSIDE the kernel via the
  TPU hardware PRNG (pltpu.prng_random_bits). The reference holds persistent
  curand states per thread (KGMT.cu:109-111); the TPU-native analog is the
  per-core PRNG seeded per (seed, program) — deterministic for a given seed
  but a different stream than jax.random, so the planner treats this as a
  distinct backend ('pallas_rng').

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

# 8 sublanes x 128 lanes x ROW_TILES rows per kernel program
SUBLANES = 8
LANES = 128
ROW_TILES = 8  # rows of (8,128) per program -> 8192 lanes per program
BLOCK_ROWS = SUBLANES * ROW_TILES


def _default_block_rows(footprint) -> int:
    """Per-program block size. The footprint narrow phase roughly doubles the
    kernel's live-value footprint per step (cos/sin/center/abs terms per
    obstacle); at the default 64-row block it overflows the 16 MB scoped VMEM
    stack on v5e by ~0.5% (measured: 16.08M vs 16.00M limit), so footprint
    kernels halve the block. Throughput loss is small — the 4096-lane point
    on the block sweep is within ~2% of the 8192-lane default (perf.md)."""
    return BLOCK_ROWS if footprint is None else BLOCK_ROWS // 2


def supports_system(system) -> bool:
    """A system joins the fused path by providing the SoA step hooks."""
    return hasattr(system, "soa_prepare") and hasattr(system, "soa_step")


def _integrate(system, comps, ctrl, dur, obs, num_disc: int,
               width: float, height: float,
               footprint: tuple[float, float] | None = None,
               fast_math: bool = False):
    """Shared kernel body: unrolled Euler loop + per-step swept-AABB tests
    (+ the optional oriented-footprint narrow phase, geometry/footprint.py).

    Break-semantics parity with the reference (statePropagator.cu:31-65):
    dead lanes freeze at their failing-step candidate position. dt uses a
    true division (not reciprocal-multiply) so the kernel's float math is
    bitwise-identical to the jnp path (rollout.py:50) — the parity tests
    compare valid masks with assert_array_equal. The footprint math below
    mirrors footprint_clear's op order for the same reason.
    """
    dt = dur / num_disc
    use_fast = fast_math and hasattr(system, "soa_step_fast")
    if use_fast:
        carry, aux = system.soa_prepare_fast(comps, ctrl, dt)
    else:
        aux = system.soa_prepare(ctrl)
    alive = jnp.ones_like(comps[0], dtype=jnp.bool_)
    heading_index = getattr(system, "heading_index", None)
    for _ in range(num_disc):
        if use_fast:
            new, new_carry = system.soa_step_fast(comps, carry, aux, dt)
        else:
            new = system.soa_step(comps, aux, dt)
        nx, ny, x, y = new[0], new[1], comps[0], comps[1]
        clear = (nx > 0.0) & (nx < width) & (ny > 0.0) & (ny < height)
        bb_min_x = jnp.minimum(x, nx)
        bb_max_x = jnp.maximum(x, nx)
        bb_min_y = jnp.minimum(y, ny)
        bb_max_y = jnp.maximum(y, ny)
        for (oxmin, oymin, oxmax, oymax) in obs:
            # degenerate padding boxes (max < min) are separated from all
            sep = ((bb_max_x <= oxmin) | (oxmax <= bb_min_x)
                   | (bb_max_y <= oymin) | (oymax <= bb_min_y))
            clear = clear & sep
        if footprint is not None:
            hl, hw = footprint
            if use_fast and heading_index is not None:
                # hook contract: carry[0:2] = cos/sin of the current state,
                # so new_carry[0:2] is the post-step pose's cos/sin
                ct, st = new_carry[0], new_carry[1]
            elif heading_index is not None:
                theta = new[heading_index]
                ct = jnp.cos(theta)
                st = jnp.sin(theta)
            else:
                ct = jnp.ones_like(nx)
                st = jnp.zeros_like(nx)
            fcx = nx + hl * ct
            fcy = ny + hl * st
            act, ast = jnp.abs(ct), jnp.abs(st)
            for (oxmin, oymin, oxmax, oymax) in obs:
                bcx = (oxmin + oxmax) * 0.5
                bcy = (oymin + oymax) * 0.5
                bhx = (oxmax - oxmin) * 0.5
                bhy = (oymax - oymin) * 0.5
                valid_box = (bhx >= 0) & (bhy >= 0)  # keep 0-thickness walls
                dx = fcx - bcx
                dy = fcy - bcy
                sep_x = jnp.abs(dx) >= bhx + hl * act + hw * ast
                sep_y = jnp.abs(dy) >= bhy + hl * ast + hw * act
                sep_u = jnp.abs(dx * ct + dy * st) >= hl + bhx * act + bhy * ast
                sep_v = jnp.abs(dy * ct - dx * st) >= hw + bhx * ast + bhy * act
                hit = valid_box & ~(sep_x | sep_y | sep_u | sep_v)
                clear = clear & ~hit
        comps = [jnp.where(alive, n, c) for n, c in zip(new, comps)]
        if use_fast:
            # dead lanes' carry may keep rotating — harmless, their comps
            # are frozen and alive never resurrects
            carry = new_carry
        alive = alive & clear
    return comps, alive


def _integrate_culled(system, comps, ctrl, dur, obs, num_disc: int,
                      width: float, height: float,
                      footprint: tuple[float, float] | None = None,
                      fast_math: bool = False, cull_windows: int = 1):
    """Occupancy-style broad phase for dense obstacle fields (VERDICT r2
    item 1; reference intent: occupancyMaps/OccupancyGrid.cuh:7-25 vs the
    O(K)-per-step loop collisionCheck.cu:16-28).

    On a SIMD VPU, per-lane work cannot be skipped — only PROGRAM-uniform
    (scalar) conditions skip instructions. So the broad phase is per kernel
    program: integrate all ``num_disc`` candidate steps unconditionally
    (pass 1), reduce the program's union trajectory AABB to scalars, and for
    each obstacle run the per-step exact tests under ``lax.cond`` on the
    scalar "program bbox overlaps obstacle" predicate (pass 2). A culled
    obstacle is provably separated from every lane's every swept AABB, so
    skipping is EXACT — bit-identical (x1, valid) to ``_integrate``
    (asserted in tests/test_pallas.py). Effectiveness depends on tile
    locality: callers must feed spatially GROUPED lanes (e.g. Z-order
    sorted by R1 cell, as the dense-probe bench does) for programs to see
    tight neighborhoods; random unsorted batches cull ~nothing and pay a
    small fixed overhead, which is why cull stays opt-in and the planner's
    round-robin (unsorted) waves keep the one-pass body (perf.md r3).

    First-failure ("break") semantics are reconstructed: one-pass freezing
    yields the candidate position of the first failing step, which equals
    the unconditional chain's position there (the lane was alive until it),
    so selecting positions[min(first_fail, num_disc-1)] is bitwise equal.
    Validity for steps past the first failure differs between the designs
    (frozen vs unconditional positions) but is dead either way.

    ``cull_windows`` (r4, VERDICT r3 item 3): split the step loop into W
    windows, each with its OWN union-bbox scalars, nested under the whole-
    trajectory cond — a 1.05 s rollout reaches +-2.8 units so the whole-
    trajectory bbox spans >= 8 units even with perfect lane grouping (the
    r3 cull ceiling), while a half/quarter-trajectory box is ~W x tighter.
    An obstacle fully outside the whole-trajectory box still costs ONE
    scalar cond; one inside it pays W window conds but only the
    overlapping windows' step tests. W=1 keeps the r3 single-box behavior.
    Exactness is per window by the same separation argument.
    """
    dt = dur / num_disc
    use_fast = fast_math and hasattr(system, "soa_step_fast")
    if use_fast:
        carry, aux = system.soa_prepare_fast(comps, ctrl, dt)
    else:
        aux = system.soa_prepare(ctrl)
    heading_index = getattr(system, "heading_index", None)
    # Storage note (negative result, perf.md r3): a "compact" variant that
    # kept only bboxes + packed direction bits and re-derived theta/v by a
    # trig-free freeze chain measured ~2% SLOWER than simply keeping every
    # step's full state live — Mosaic absorbs the register pressure; the
    # reconstruction ops are pure overhead. Keep the simple layout.

    # ---- pass 1: unconditional candidate chain ----------------------------
    positions = []  # per step: the full new comps tuple
    bboxes = []  # per step: swept AABB (min_x, max_x, min_y, max_y)
    poses = []  # per step: (cos, sin) of the post-step heading (footprint)
    cur = comps
    for i in range(num_disc):
        if use_fast:
            new, carry = system.soa_step_fast(cur, carry, aux, dt)
        else:
            new = system.soa_step(cur, aux, dt)
        nx, ny, x, y = new[0], new[1], cur[0], cur[1]
        bboxes.append((jnp.minimum(x, nx), jnp.maximum(x, nx),
                       jnp.minimum(y, ny), jnp.maximum(y, ny)))
        if footprint is not None:
            if use_fast and heading_index is not None:
                poses.append((carry[0], carry[1]))
            elif heading_index is not None:
                theta = new[heading_index]
                poses.append((jnp.cos(theta), jnp.sin(theta)))
            else:
                poses.append((jnp.ones_like(nx), jnp.zeros_like(nx)))
        positions.append(new)
        # fold the workspace-bounds failure into the first-failure index
        oob = ~((nx > 0.0) & (nx < width) & (ny > 0.0) & (ny < height))
        fi = jnp.where(oob, jnp.int32(i), jnp.int32(num_disc))
        fail = fi if i == 0 else jnp.minimum(fail, fi)
        cur = new

    # ---- program-level union AABBs: whole trajectory + per window ---------
    def _chain(op, vals):
        acc = vals[0]
        for v in vals[1:]:
            acc = op(acc, v)
        return acc

    if footprint is not None:
        # the oriented footprint reaches at most hl + hypot(hl, hw) from the
        # reference point, in any direction — pad the union boxes by that
        hl_, hw_ = footprint
        pad = hl_ + float(np_hypot(hl_, hw_))
    else:
        pad = 0.0

    def _union_box(step_bboxes):
        return (jnp.min(_chain(jnp.minimum, [b[0] for b in step_bboxes])) - pad,
                jnp.max(_chain(jnp.maximum, [b[1] for b in step_bboxes])) + pad,
                jnp.min(_chain(jnp.minimum, [b[2] for b in step_bboxes])) - pad,
                jnp.max(_chain(jnp.maximum, [b[3] for b in step_bboxes])) + pad)

    W = max(1, min(cull_windows, num_disc))
    # split steps into W near-equal contiguous windows
    bounds = [round(w * num_disc / W) for w in range(W + 1)]
    windows = [range(bounds[w], bounds[w + 1]) for w in range(W)
               if bounds[w] < bounds[w + 1]]
    win_boxes = [_union_box([bboxes[i] for i in win]) for win in windows]
    if len(win_boxes) == 1:
        tb_min_x, tb_max_x, tb_min_y, tb_max_y = win_boxes[0]
    else:
        tb_min_x = _chain(jnp.minimum, [b[0] for b in win_boxes])
        tb_max_x = _chain(jnp.maximum, [b[1] for b in win_boxes])
        tb_min_y = _chain(jnp.minimum, [b[2] for b in win_boxes])
        tb_max_y = _chain(jnp.maximum, [b[3] for b in win_boxes])

    BIG = num_disc  # sentinel: "no failure"

    def _step_hit(i, oxmin, oymin, oxmax, oymax):
        bmnx, bmxx, bmny, bmxy = bboxes[i]
        hit = ~((bmxx <= oxmin) | (oxmax <= bmnx)
                | (bmxy <= oymin) | (oymax <= bmny))
        if footprint is not None:
            hl, hw = footprint
            ct, st = poses[i]
            nx, ny = positions[i][0], positions[i][1]
            bcx = (oxmin + oxmax) * 0.5
            bcy = (oymin + oymax) * 0.5
            bhx = (oxmax - oxmin) * 0.5
            bhy = (oymax - oymin) * 0.5
            valid_box = (bhx >= 0) & (bhy >= 0)
            fcx = nx + hl * ct
            fcy = ny + hl * st
            act, ast = jnp.abs(ct), jnp.abs(st)
            dx = fcx - bcx
            dy = fcy - bcy
            sep_x = jnp.abs(dx) >= bhx + hl * act + hw * ast
            sep_y = jnp.abs(dy) >= bhy + hl * ast + hw * act
            sep_u = (jnp.abs(dx * ct + dy * st)
                     >= hl + bhx * act + bhy * ast)
            sep_v = (jnp.abs(dy * ct - dx * st)
                     >= hw + bhx * ast + bhy * act)
            hit = hit | (valid_box & ~(sep_x | sep_y | sep_u | sep_v))
        return hit

    # ---- pass 2: per-obstacle exact tests under nested scalar culls -------
    for (oxmin, oymin, oxmax, oymax) in obs:
        overlap = ~((tb_max_x <= oxmin) | (oxmax <= tb_min_x)
                    | (tb_max_y <= oymin) | (oymax <= tb_min_y))

        def _test_steps(f, steps, oxmin=oxmin, oymin=oymin, oxmax=oxmax,
                        oymax=oymax):
            for i in steps:
                hit = _step_hit(i, oxmin, oymin, oxmax, oymax)
                f = jnp.minimum(
                    f, jnp.where(hit, jnp.int32(i), jnp.int32(BIG)))
            return f

        if len(windows) == 1:
            fail = jax.lax.cond(
                overlap, functools.partial(_test_steps, steps=windows[0]),
                lambda f: f, fail)
        else:
            def _ob_body(f, oxmin=oxmin, oymin=oymin, oxmax=oxmax,
                         oymax=oymax):
                for win, (wmnx, wmxx, wmny, wmxy) in zip(windows, win_boxes):
                    w_over = ~((wmxx <= oxmin) | (oxmax <= wmnx)
                               | (wmxy <= oymin) | (oymax <= wmny))
                    f = jax.lax.cond(
                        w_over, functools.partial(_test_steps, steps=win),
                        lambda f: f, f)
                return f

            fail = jax.lax.cond(overlap, _ob_body, lambda f: f, fail)

    # ---- reconstruct the frozen output ------------------------------------
    # One-pass semantics: a lane takes candidate steps while alive at step
    # entry (fail >= i), INCLUDING the failing step itself, so the final
    # state is step min(fail, num_disc-1)'s candidate.
    alive = fail >= BIG
    take = jnp.minimum(fail, BIG - 1)
    out = positions[0]
    for i in range(1, num_disc):
        sel = take >= i
        out = [jnp.where(sel, n, o) for n, o in zip(positions[i], out)]
    return out, alive


def np_hypot(a: float, b: float) -> float:
    return float((a * a + b * b) ** 0.5)


# The broad phase is OPT-IN (cull=None means off): it only pays when the
# caller feeds spatially grouped lanes (sorted planner waves, bench
# grouped=True); on unsorted input nothing culls and the two-pass overhead
# (union-bbox reduce + first-failure selects + VMEM pressure from all-steps-
# live positions) costs ~15-17% (measured, perf.md r3).


def _rollout_kernel(system, num_disc: int, num_obstacles: int,
                    width: float, height: float, S: int, C: int,
                    footprint, fast_math, cull, *refs):
    """refs: S state + C control + dur + obstacles | S out-state + valid."""
    state_refs = refs[:S]
    ctrl_refs = refs[S:S + C]
    dur_ref = refs[S + C]
    obs_ref = refs[S + C + 1]
    out_refs = refs[S + C + 2:S + C + 2 + S]
    valid_ref = refs[S + C + 2 + S]

    comps = [r[:] for r in state_refs]
    ctrl = [r[:] for r in ctrl_refs]
    # hoist obstacle scalars out of the step loop (one VMEM scalar load each)
    obs = [(obs_ref[k, 0], obs_ref[k, 1], obs_ref[k, 2], obs_ref[k, 3])
           for k in range(num_obstacles)]
    body = (functools.partial(_integrate_culled, cull_windows=int(cull))
            if cull else _integrate)
    comps, alive = body(system, comps, ctrl, dur_ref[:], obs,
                        num_disc, width, height, footprint, fast_math)
    for ref, c in zip(out_refs, comps):
        ref[:] = c
    valid_ref[:] = alive.astype(jnp.int32)


def _tile_spec(block_rows: int):
    return pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(
    jax.jit,
    static_argnames=("system", "num_disc", "width", "height", "interpret",
                     "block_rows", "footprint", "fast_math", "cull"),
)
def rollout_pallas(
    system,
    x0: jax.Array,  # [B, state_dim] start states
    controls: jax.Array,  # [B, control_dim] (duration last)
    obstacles: jax.Array,  # [K, 4]
    *,
    num_disc: int,
    width: float,
    height: float,
    interpret: bool = False,
    block_rows: int | None = None,
    footprint: tuple[float, float] | None = None,
    fast_math: bool = False,
    cull: bool | int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Fused rollout for any SoA-capable system. Same contract as
    ops.rollout.rollout_batch (including the optional oriented-footprint
    narrow phase): returns (x1 [B, state_dim], valid [B]).

    B is padded internally to a multiple of the kernel block (8192 lanes).
    cull: opt-in per-program broad-phase obstacle culling
    (_integrate_culled) — worth it only for spatially grouped inputs on
    dense fields; results match the one-pass body either way. True/1 uses
    one whole-trajectory union box; an int >= 2 additionally windows the
    step loop into that many per-window boxes (tighter culls, more scalar
    conds — see _integrate_culled).
    """
    B = x0.shape[0]
    K = obstacles.shape[0]
    S = system.state_dim
    C = system.control_spec.dim - 1  # non-duration controls
    cull = int(cull) if cull else 0
    if block_rows is None:
        block_rows = _default_block_rows(footprint)
    block = block_rows * LANES
    Bp = max(((B + block - 1) // block) * block, block)

    def to_tiles(col: jax.Array) -> jax.Array:
        return jnp.pad(col, (0, Bp - B)).reshape(Bp // LANES, LANES)

    cols = ([to_tiles(x0[:, i]) for i in range(S)]
            + [to_tiles(controls[:, i]) for i in range(C + 1)])
    rows = Bp // LANES
    grid = (rows // block_rows,)

    tile_spec = _tile_spec(block_rows)
    obs_spec = pl.BlockSpec(memory_space=pltpu.VMEM)  # whole [K, 4] array
    out_shape = ([jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
                  for _ in range(S)]
                 + [jax.ShapeDtypeStruct((rows, LANES), jnp.int32)])

    kernel = functools.partial(
        _rollout_kernel, system, num_disc, K, width, height, S, C, footprint,
        fast_math, cull,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tile_spec] * (S + C + 1) + [obs_spec],
        out_specs=[tile_spec] * (S + 1),
        out_shape=out_shape,
        interpret=interpret,
    )(*cols, obstacles)

    x1 = jnp.stack([o.reshape(Bp)[:B] for o in outs[:S]], axis=-1)
    return x1, outs[S].reshape(Bp)[:B] > 0


def rollout_bicycle_pallas(
    x0, controls, obstacles, *, num_disc, width, height,
    agent_length: float = 1.0, interpret: bool = False,
    block_rows: int | None = None, fast_math: bool = False,
    cull: bool | int | None = None,
):
    """Bicycle-specialized entry point (kept for the bench/test surface)."""
    from cudasbmp_tpu.systems.bicycle import KinematicBicycle

    return rollout_pallas(
        KinematicBicycle(agent_length=agent_length), x0, controls, obstacles,
        num_disc=num_disc, width=width, height=height, interpret=interpret,
        block_rows=block_rows, fast_math=fast_math, cull=cull,
    )


# ---------------------------------------------------------------------------
# Fully fused variant: control sampling inside the kernel (TPU HW PRNG).
# ---------------------------------------------------------------------------


def _uniform_from_bits(bits, lo: float, hi: float):
    # uint32 -> f32 in [0, 1): keep the top 24 bits (f32 mantissa width).
    # Mosaic lacks a direct uint32->f32 cast; the shifted value fits in a
    # non-negative int32, which casts fine.
    top24 = pltpu.bitcast(bits >> 8, jnp.int32)
    u = top24.astype(jnp.float32) * (1.0 / (1 << 24))
    return lo + u * (hi - lo)


# Knuth's multiplicative-hash constant (0x9E3779B9 as int32); spreads the
# caller's seed so per-program streams `seed*MIX + i` never collide for
# nearby (seed, i) pairs. int32 overflow wraps (XLA semantics) — intended.
_SEED_MIX = -1640531527


def seed_tiles(seed: jax.Array, grid_n: int, block_rows: int) -> jax.Array:
    """Per-program seed tiles [grid_n*block_rows, LANES]: block ``i`` is
    filled with ``seed*MIX + i``, giving each kernel program a distinct,
    deterministic HW-PRNG stream WITHOUT reading pl.program_id (whose axis
    silently re-maps to the batch under jax.vmap). Tiled like the state
    columns so vmap batches it the same way — this is what makes the
    'pallas_rng' backend vmap-composable (VERDICT r1 item 4; the former SMEM
    scalar violated the block divisibility rule under vmap)."""
    per_program = (jnp.asarray(seed, jnp.int32) * jnp.int32(_SEED_MIX)
                   + jnp.arange(grid_n, dtype=jnp.int32))
    return jnp.broadcast_to(
        jnp.repeat(per_program, block_rows)[:, None],
        (grid_n * block_rows, LANES),
    )


def _rollout_rng_kernel(system, num_disc: int, num_obstacles: int,
                        width: float, height: float, S: int, C: int,
                        control_bounds, footprint, fast_math, cull, *refs):
    """refs: seed + S state + obstacles | S out-state + (C+1) controls
    + valid."""
    seed_ref = refs[0]
    state_refs = refs[1:1 + S]
    obs_ref = refs[1 + S]
    out_refs = refs[2 + S:2 + S + S]
    ctrl_out_refs = refs[2 + 2 * S:2 + 2 * S + C + 1]
    valid_ref = refs[2 + 2 * S + C + 1]

    # The per-PROGRAM stream id is baked into the tile values by the host
    # wrapper (seed*MIX + program index, one value per block) instead of
    # mixing pl.program_id here: under jax.vmap the batcher prepends a grid
    # axis, which would silently re-map program_id(0) to the batch index.
    # A seed TILE batches exactly like the state columns, so the kernel is
    # vmap-composable (VERDICT r1 item 4).
    pltpu.prng_seed(seed_ref[0, 0])
    shape = state_refs[0].shape
    sampled = []
    for (lo, hi), out in zip(control_bounds, ctrl_out_refs):
        c = _uniform_from_bits(
            pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32), lo, hi
        )
        out[:] = c
        sampled.append(c)
    ctrl, dur = sampled[:-1], sampled[-1]

    comps = [r[:] for r in state_refs]
    obs = [(obs_ref[k, 0], obs_ref[k, 1], obs_ref[k, 2], obs_ref[k, 3])
           for k in range(num_obstacles)]
    body = (functools.partial(_integrate_culled, cull_windows=int(cull))
            if cull else _integrate)
    comps, alive = body(system, comps, ctrl, dur, obs,
                        num_disc, width, height, footprint, fast_math)
    for ref, c in zip(out_refs, comps):
        ref[:] = c
    valid_ref[:] = alive.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("system", "num_disc", "width", "height", "interpret",
                     "block_rows", "footprint", "fast_math", "cull"),
)
def sample_and_rollout_pallas(
    system,
    seed: jax.Array,  # int32 scalar
    x0: jax.Array,  # [B, state_dim]
    obstacles: jax.Array,  # [K, 4]
    *,
    num_disc: int,
    width: float,
    height: float,
    interpret: bool = False,
    block_rows: int | None = None,
    footprint: tuple[float, float] | None = None,
    fast_math: bool = False,
    cull: bool | int | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fully fused sample+rollout: controls drawn inside the kernel by the
    hardware PRNG from the system's control bounds. Returns
    (x1 [B, S], controls [B, C+1], valid [B]). ``cull`` as in
    rollout_pallas (int >= 2 = step-windowed culling)."""
    B = x0.shape[0]
    K = obstacles.shape[0]
    S = system.state_dim
    C = system.control_spec.dim - 1
    spec = system.control_spec
    control_bounds = tuple(zip(spec.lo, spec.hi))
    cull = int(cull) if cull else 0
    if block_rows is None:
        block_rows = _default_block_rows(footprint)
    block = block_rows * LANES
    Bp = max(((B + block - 1) // block) * block, block)

    def to_tiles(col):
        return jnp.pad(col, (0, Bp - B)).reshape(Bp // LANES, LANES)

    cols = [to_tiles(x0[:, i]) for i in range(S)]
    rows = Bp // LANES
    grid_n = rows // block_rows
    grid = (grid_n,)
    tile_spec = _tile_spec(block_rows)
    obs_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    seeds = seed_tiles(seed, grid_n, block_rows)
    out_shape = (
        [jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
         for _ in range(S + C + 1)]
        + [jax.ShapeDtypeStruct((rows, LANES), jnp.int32)]
    )
    kernel = functools.partial(
        _rollout_rng_kernel, system, num_disc, K, width, height, S, C,
        control_bounds, footprint, fast_math, cull,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tile_spec] * (S + 1) + [obs_spec],
        out_specs=[tile_spec] * (S + C + 2),
        out_shape=out_shape,
        interpret=interpret,
    )(seeds, *cols, obstacles)
    x1 = jnp.stack([o.reshape(Bp)[:B] for o in outs[:S]], axis=-1)
    controls = jnp.stack(
        [o.reshape(Bp)[:B] for o in outs[S:S + C + 1]], axis=-1
    )
    return x1, controls, outs[S + C + 1].reshape(Bp)[:B] > 0


def sample_and_rollout_bicycle_pallas(
    seed, x0, obstacles, *, num_disc, width, height,
    agent_length: float = 1.0,
    control_bounds: tuple | None = None,
    interpret: bool = False, block_rows: int | None = None,
    fast_math: bool = False, cull: bool | int | None = None,
):
    """Bicycle-specialized entry point (kept for the bench/test surface).
    ``control_bounds`` overrides the system's sampling box if given."""
    from cudasbmp_tpu.systems.bicycle import KinematicBicycle
    from cudasbmp_tpu.systems.base import ControlSpec

    system = KinematicBicycle(agent_length=agent_length)
    if control_bounds is not None:
        lo = tuple(b[0] for b in control_bounds)
        hi = tuple(b[1] for b in control_bounds)
        system = KinematicBicycle(
            agent_length=agent_length,
            control_spec=ControlSpec(lo=lo, hi=hi),
        )
    return sample_and_rollout_pallas(
        system, seed, x0, obstacles, num_disc=num_disc, width=width,
        height=height, interpret=interpret, block_rows=block_rows,
        fast_math=fast_math, cull=cull,
    )
