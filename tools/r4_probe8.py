"""Round-4 probe #8 (real TPU): MXU-staged commit vs serial scatter, at
demo capacity (wrap-commit structure of r4_probe7, "commit" level).

The commit scatters are ~80% of demo device TTS (r4_probe7) and lower to
a ~35 ns/row serial fusion no hint improves. Candidate: compact the
accepted rows into an R-row block with a one-hot MXU contraction (the
arena's frontier-refresh pattern at B=1) and write the block with ONE
dynamic_update_slice per tree array, blended against the old rows so the
result is exact. Cost model: one-hot traffic ~R^2 x 4 B per wave (~4 MB
at R=1024, 67 MB at R=4096) vs R x 35 ns of serial scatter — the matmul
should win at small-to-mid R and approach breakeven at 4096.

Usage: python tools/r4_probe8.py [R ...]   (default 4096 2048 1024)
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from cudasbmp_tpu.config import KGMTConfig, Scenario
from cudasbmp_tpu.planners.kgmt import init_state
from cudasbmp_tpu.systems.registry import get_system


def make_body(cfg, system, obstacles, variant):
    M = cfg.max_tree_size
    R = cfg.rollouts_per_iter

    def body(s):
        it = s.itr
        key_iter = jax.random.fold_in(s.key, it)
        k_ctrl, _ = jax.random.split(key_iter)
        seed = jax.random.randint(k_ctrl, (), 0, jnp.iinfo(jnp.int32).max)
        parent_idx = jnp.arange(R, dtype=jnp.int32) % jnp.maximum(
            s.tree_size, 1)
        parent_rows = s.tree_samples[parent_idx]
        parent_cost = s.costs[parent_idx]
        x0 = parent_rows[:, : system.state_dim]
        from cudasbmp_tpu.ops.rollout_pallas import sample_and_rollout_pallas

        x1, controls, valid = sample_and_rollout_pallas(
            system, seed, x0, obstacles, num_disc=cfg.num_disc,
            width=cfg.width, height=cfg.height)
        accept = valid
        samples1 = jnp.concatenate([x1, controls], axis=-1)
        accept_i = accept.astype(jnp.int32)
        accept_pos = jnp.cumsum(accept_i) - accept_i
        base = (it * R) % (M - R)
        child_cost = parent_cost + controls[:, -1]

        if variant == "scatter":
            dst = jnp.where(accept, base + accept_pos, M)
            tree_samples = s.tree_samples.at[dst].set(samples1, mode="drop")
            tree_parent = s.tree_parent.at[dst].set(parent_idx, mode="drop")
            costs = s.costs.at[dst].set(child_cost, mode="drop")
        else:  # onehot block commit + DUS with exact blending
            # one-hot over the DESTINATION axis: out[w] = sum_r oh[r, w]*row[r]
            oh = ((accept_pos[:, None]
                   == jnp.arange(R, dtype=jnp.int32)[None, :])
                  & accept[:, None]).astype(jnp.float32)
            cols = jnp.concatenate(
                [samples1, child_cost[:, None],
                 parent_idx.astype(jnp.float32)[:, None]], axis=-1)
            staged = jnp.einsum("rw,rd->wd", oh, cols,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
            n_acc = accept_i.sum()
            filled = jnp.arange(R, dtype=jnp.int32) < n_acc
            old_s = jax.lax.dynamic_slice(s.tree_samples, (base, 0), (R, 7))
            old_p = jax.lax.dynamic_slice(s.tree_parent, (base,), (R,))
            old_c = jax.lax.dynamic_slice(s.costs, (base,), (R,))
            put_s = jnp.where(filled[:, None], staged[:, :7], old_s)
            put_p = jnp.where(filled, staged[:, 8].astype(jnp.int32), old_p)
            put_c = jnp.where(filled, staged[:, 7], old_c)
            tree_samples = jax.lax.dynamic_update_slice(
                s.tree_samples, put_s, (base, 0))
            tree_parent = jax.lax.dynamic_update_slice(
                s.tree_parent, put_p, (base,))
            costs = jax.lax.dynamic_update_slice(s.costs, put_c, (base,))

        return s._replace(itr=it + 1, tree_samples=tree_samples,
                          tree_parent=tree_parent, costs=costs,
                          r1_threshold=s.r1_threshold + x1.sum() * 0.0)

    return body


def main():
    Rs = [int(a) for a in sys.argv[1:]] or [4096, 2048, 1024]
    n_lo, n_hi = (int(os.environ.get("PROBE_N_LO", 100)),
                  int(os.environ.get("PROBE_N_HI", 200)))
    system = get_system("bicycle")
    sc = Scenario.demo()
    from cudasbmp_tpu.geometry.grid import RegionGrid

    for R in Rs:
        cfg = KGMTConfig(num_iterations=n_hi, rollouts_per_iter=R,
                         rollout_backend="pallas_rng", adaptive_waves=False)
        grid = RegionGrid(width=cfg.width, height=cfg.height, N=cfg.N,
                          n=cfg.n)
        obstacles = jnp.asarray(sc.padded_obstacles(cfg.max_obstacles)[0])
        init = jnp.asarray(sc.init, jnp.float32)
        for variant in ("scatter", "onehot"):
            body = make_body(cfg, system, obstacles, variant)

            @jax.jit
            def run(key, n, body=body, cfg=cfg, grid=grid, init=init):
                s0 = init_state(cfg, grid, init, key)
                final = jax.lax.while_loop(lambda s: s.itr < n, body, s0)
                return final.costs.sum() + final.r1_threshold

            float(run(jax.random.key(0), jnp.int32(2)))
            times = {}
            for n in (n_lo, n_hi):
                best = float("inf")
                for rep in range(3):
                    t0 = time.perf_counter()
                    float(run(jax.random.key(1000 * rep + n), jnp.int32(n)))
                    best = min(best, time.perf_counter() - t0)
                times[n] = best
            slope_ms = (times[n_hi] - times[n_lo]) / (n_hi - n_lo) * 1e3
            print(json.dumps({"R": R, "variant": variant,
                              "slope_ms_per_iter": round(slope_ms, 4),
                              "ns_per_rollout": round(slope_ms * 1e6 / R, 1)}),
                  flush=True)


if __name__ == "__main__":
    main()
