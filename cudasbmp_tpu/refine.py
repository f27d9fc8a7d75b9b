"""Differentiable trajectory refinement — the local-optimization stage on top
of the KGMT feasibility search.

The reference stops at the first feasible trajectory (feasibility search, not
optimization — KGMT.cu:251-254). BASELINE.json's north star calls for "local
trajectory-refinement ... blocks"; the TPU-native realization is gradient
descent THROUGH the rollout: the Euler integration of the control sequence is
pure jax, so d(cost)/d(controls) is one jax.grad away, runs on the MXU/VPU,
and vmaps over many trajectories at once (refining a whole multi-query batch
in one jitted step).

Objective: minimize total trajectory time subject to staying collision-free,
in-bounds and ending in the goal region — enforced with smooth hinge
penalties. Controls stay inside their sampling box via a tanh
reparameterization, so refined trajectories remain replayable by the same
rollout machinery (and are re-validated with the exact hard checker before
being accepted)."""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from cudasbmp_tpu.config import KGMTConfig
from cudasbmp_tpu.ops.rollout import rollout_batch
from cudasbmp_tpu.systems.base import System


@dataclasses.dataclass(frozen=True)
class RefineConfig:
    iterations: int = 400
    learning_rate: float = 1e-3
    clip_norm: float = 1.0  # chained-Euler gradients explode; clip globally
    collision_weight: float = 30.0
    goal_weight: float = 10.0
    time_weight: float = 1.0
    margin: float = 0.05  # extra clearance demanded from obstacles/bounds


def _soft_penetration(px, py, obstacles, margin):
    """Smooth penetration depth of points into (margin-inflated) obstacles.
    px, py: [T]; obstacles [K, 4]. Returns scalar penalty."""
    ox0, oy0, ox1, oy1 = (obstacles[:, i] for i in range(4))
    # signed distance to box (negative inside); smooth-min over axes
    dx = jnp.maximum(ox0[None, :] - margin - px[:, None],
                     px[:, None] - ox1[None, :] - margin)
    dy = jnp.maximum(oy0[None, :] - margin - py[:, None],
                     py[:, None] - oy1[None, :] - margin)
    outside = jnp.maximum(dx, dy)  # >0 outside, <0 inside
    return jnp.sum(jax.nn.relu(-outside) ** 2)


def _unroll_positions(system: System, x0, controls, num_disc):
    """Fine-grained positions of the whole trajectory: [L*num_disc, 2].
    controls [L, 3]."""

    def edge(state, control):
        a_steer, dur = control[:-1], control[-1]
        dt = dur / num_disc

        def step(s, _):
            s2 = system.step(s, a_steer, dt)
            return s2, s2[:2]

        state, pts = jax.lax.scan(step, state, None, length=num_disc)
        return state, pts

    _, pts = jax.lax.scan(edge, x0, controls)
    return pts.reshape(-1, 2)


def _loss(system, cfg: KGMTConfig, rcfg: RefineConfig, x0, goal_xy, obstacles,
          raw, lo, hi):
    controls = lo + (hi - lo) * jax.nn.sigmoid(raw)  # box-constrained
    pts = _unroll_positions(system, x0, controls, cfg.num_disc)
    time_cost = controls[:, -1].sum()
    collision = _soft_penetration(pts[:, 0], pts[:, 1], obstacles, rcfg.margin)
    oob = (
        jnp.sum(jax.nn.relu(rcfg.margin - pts[:, 0]) ** 2)
        + jnp.sum(jax.nn.relu(pts[:, 0] - (cfg.width - rcfg.margin)) ** 2)
        + jnp.sum(jax.nn.relu(rcfg.margin - pts[:, 1]) ** 2)
        + jnp.sum(jax.nn.relu(pts[:, 1] - (cfg.height - rcfg.margin)) ** 2)
    )
    end = pts[-1]
    goal_dist = jnp.sum((end - goal_xy) ** 2)
    # keep the endpoint strictly inside the goal region (soft)
    goal_pen = jax.nn.relu(
        jnp.sqrt(goal_dist + 1e-9) - 0.8 * cfg.goal_threshold
    ) ** 2
    return (rcfg.time_weight * time_cost
            + rcfg.collision_weight * (collision + oob)
            + rcfg.goal_weight * goal_pen)


@partial(jax.jit, static_argnames=("system", "cfg", "rcfg"))
def _refine_jit(system, cfg: KGMTConfig, rcfg: RefineConfig, x0, goal_xy,
                obstacles, controls0, mask):
    lo = jnp.asarray(system.control_spec.lo)
    hi = jnp.asarray(system.control_spec.hi)
    eps = 1e-4
    c0 = jnp.clip(controls0, lo + eps, hi - eps)
    raw0 = jnp.log((c0 - lo) / (hi - c0))  # inverse sigmoid

    loss_fn = lambda raw: _loss(system, cfg, rcfg, x0, goal_xy, obstacles,
                                jnp.where(mask[:, None], raw, raw0), lo, hi)
    grad_fn = jax.value_and_grad(loss_fn)

    def opt_step(carry, _):
        raw, m, v, t, best_raw, best_loss = carry
        loss, g = grad_fn(raw)
        # nonmonotone optimization over chaotic dynamics: remember the best
        better = loss < best_loss
        best_raw = jnp.where(better, raw, best_raw)
        best_loss = jnp.where(better, loss, best_loss)
        g = jnp.where(mask[:, None], g, 0.0)
        gn = jnp.sqrt(jnp.sum(g * g) + 1e-12)
        g = g * jnp.minimum(1.0, rcfg.clip_norm / gn)
        # Adam
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        mhat = m / (1 - 0.9 ** (t + 1))
        vhat = v / (1 - 0.999 ** (t + 1))
        raw = raw - rcfg.learning_rate * mhat / (jnp.sqrt(vhat) + 1e-8)
        return (raw, m, v, t + 1, best_raw, best_loss), loss

    init = (raw0, jnp.zeros_like(raw0), jnp.zeros_like(raw0), 0,
            raw0, jnp.asarray(jnp.inf))
    (raw, _, _, _, best_raw, best_loss), losses = jax.lax.scan(
        opt_step, init, None, length=rcfg.iterations
    )
    final_loss = loss_fn(raw)
    raw = jnp.where(final_loss < best_loss, raw, best_raw)
    refined = lo + (hi - lo) * jax.nn.sigmoid(raw)
    refined = jnp.where(mask[:, None], refined, controls0)
    return refined, losses


def refine_path(system, cfg: KGMTConfig, path: np.ndarray, goal: np.ndarray,
                obstacles: np.ndarray, rcfg: RefineConfig | None = None,
                ) -> dict:
    """Refine a solved path's control sequence. path: [L, SAMPLE_DIM] from
    KGMTResult (root first). Returns dict with refined controls, states, cost
    before/after, and whether the refined trajectory passes the HARD validity
    check (if not, the caller should keep the original)."""
    rcfg = rcfg or RefineConfig()
    L = len(path) - 1
    if L < 1:
        raise ValueError("path must contain at least one edge")
    x0 = jnp.asarray(path[0][: system.state_dim])
    controls0 = jnp.asarray(path[1:, system.state_dim:])
    goal_xy = jnp.asarray(goal[:2])
    obstacles_j = jnp.asarray(obstacles)
    mask = jnp.ones(L, bool)

    refined, losses = _refine_jit(system, cfg, rcfg, x0, goal_xy, obstacles_j,
                                  controls0, mask)

    # hard re-validation: replay each refined edge with the exact checker
    states = [x0]
    ok = True
    for i in range(L):
        x1, valid = rollout_batch(
            system, states[-1][None], refined[i][None], cfg.num_disc,
            obstacles_j, cfg.width, cfg.height,
            footprint=cfg.footprint,
        )
        ok = ok and bool(valid[0])
        states.append(x1[0])
    end = np.asarray(states[-1][:2])
    in_goal = float(np.hypot(*(end - np.asarray(goal[:2])))) < cfg.goal_threshold
    return {
        "controls": np.asarray(refined),
        "states": np.stack([np.asarray(s) for s in states]),
        "cost_before": float(np.asarray(controls0[:, -1]).sum()),
        "cost_after": float(np.asarray(refined[:, -1]).sum()),
        "valid": bool(ok and in_goal),
        "losses": np.asarray(losses),
    }
