"""On-device (real TPU) parity check for the MXU one-hot paths (ADVICE r3).

The CPU test suite asserts the one-hot permutation/lookup contractions are
bitwise-identical to their gather-based equivalents — but CPU matmuls are
full f32, while the TPU MXU's default lowering truncates operands to bf16;
this probe validates the equivalence on the one platform where the lowering
actually differs. Three checks:

1. `_permute_rows` (one-hot permutation matmul, Precision.HIGHEST) vs
   `take_along_axis`, with payload columns spanning f32 states, costs, and
   tree-slot ids >> bf16's 256 exact-integer limit.
2. The score lookup `oh1 @ r1_score` (Precision.HIGHEST) vs a direct gather.
3. End-to-end: `arena_solve` with the matmul permutations vs the argsort
   fallback (forced via `_PERMUTE_MATMUL_MAX_R = -1`) — final costs, goal
   nodes, and tree topology must agree bitwise.

Writes .tpu_parity.json and exits non-zero on any mismatch.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def check_permute_rows() -> dict:
    from cudasbmp_tpu.parallel import batch_kgmt as bk

    key = jax.random.key(0)
    B, R, D = 16, 128, 6
    kp, kc, ki = jax.random.split(key, 3)
    perm = jax.vmap(lambda k: jax.random.permutation(k, R))(
        jax.random.split(kp, B)).astype(jnp.int32)
    cols = jax.random.normal(kc, (B, R, D), jnp.float32) * 1e3
    # tree-slot-id column: large ints (far above bf16's exact range)
    ids = jax.random.randint(ki, (B, R), 0, 1 << 22).astype(jnp.float32)
    cols = jnp.concatenate([cols, ids[:, :, None]], axis=-1)

    @jax.jit
    def both(perm, cols):
        mxu = bk._permute_rows(perm, cols)
        ref = jnp.take_along_axis(cols, perm[:, :, None], axis=1)
        return mxu, ref

    mxu, ref = jax.device_get(both(perm, cols))
    exact = bool((mxu == ref).all()) and bool(
        (mxu[..., -1].astype(np.int64) == ref[..., -1].astype(np.int64)).all())
    return {"check": "permute_rows_vs_take_along_axis", "bitwise": exact,
            "max_abs_diff": float(np.abs(mxu - ref).max())}


def check_score_lookup() -> dict:
    key = jax.random.key(1)
    R, NR1 = 4096, 256
    kr, ks = jax.random.split(key)
    r1 = jax.random.randint(kr, (R,), 0, NR1)
    score = jax.random.uniform(ks, (NR1,), jnp.float32)

    @jax.jit
    def both(r1, score):
        oh1 = jax.nn.one_hot(r1, NR1, dtype=jnp.float32)
        mxu = jnp.matmul(oh1, score, precision=jax.lax.Precision.HIGHEST)
        return mxu, score[r1]

    mxu, ref = jax.device_get(both(r1, score))
    return {"check": "score_lookup_onehot_vs_gather",
            "bitwise": bool((mxu == ref).all()),
            "max_abs_diff": float(np.abs(mxu - ref).max())}


def check_arena_end_to_end() -> dict:
    from cudasbmp_tpu.config import KGMTConfig, Scenario
    from cudasbmp_tpu.parallel import batch_kgmt as bk

    cfg = KGMTConfig(rollouts_per_iter=128, max_tree_size=128 * 41,
                     num_iterations=40, rollout_backend="pallas_rng",
                     adaptive_waves=False)
    sc = Scenario.demo()
    B = 16
    inits = np.tile(sc.init, (B, 1))
    goals = np.tile(sc.goal, (B, 1))
    obstacles, _ = sc.padded_obstacles(cfg.max_obstacles)

    saved = bk._PERMUTE_MATMUL_MAX_R
    try:
        bk._PERMUTE_MATMUL_MAX_R = 256  # matmul path (default at R=128)
        res_mxu = bk.ArenaMultiQueryPlanner(cfg).plan_batch(
            inits, goals, obstacles, seed=5)
        bk._PERMUTE_MATMUL_MAX_R = -1  # force the argsort/gather fallback
        res_ref = bk.ArenaMultiQueryPlanner(cfg).plan_batch(
            inits, goals, obstacles, seed=5)
    finally:
        bk._PERMUTE_MATMUL_MAX_R = saved

    costs_eq = bool((res_mxu.costs == res_ref.costs).all())
    paths_eq = bool((res_mxu.paths == res_ref.paths).all())
    lens_eq = bool((res_mxu.path_lengths == res_ref.path_lengths).all())
    return {"check": "arena_solve_mxu_vs_argsort", "solve_rate":
            float(res_mxu.solved.mean()), "costs_bitwise": costs_eq,
            "paths_bitwise": paths_eq, "path_lengths_equal": lens_eq,
            "bitwise": costs_eq and paths_eq and lens_eq}


def check_windowed_cull() -> dict:
    """cull=0 vs cull=1/2/4 on the REAL chip (Mosaic lowering, not the
    interpret mode the CPU tests use): (x1, valid) must agree bitwise on a
    randomized dense field with Z-order-grouped lanes."""
    from cudasbmp_tpu.ops.rollout_pallas import rollout_pallas
    from cudasbmp_tpu.systems.registry import get_system

    rng = np.random.default_rng(7)
    system = get_system("bicycle")
    K = 24
    lo = rng.uniform(0, 18, (K, 2))
    obs = np.concatenate([lo, lo + rng.uniform(0.3, 3.0, (K, 2))],
                         axis=1).astype(np.float32)
    B = 8192
    x0 = np.zeros((B, 4), np.float32)
    x0[:, 0] = rng.uniform(0.5, 19.5, B)
    x0[:, 1] = rng.uniform(0.5, 19.5, B)
    x0[:, 2] = rng.uniform(-3, 3, B)
    x0[:, 3] = rng.uniform(-2, 2, B)
    x0 = x0[np.lexsort((x0[:, 1] // 1.25, x0[:, 0] // 1.25))]
    controls = np.stack([rng.uniform(-5, 5, B), rng.uniform(-3.14, 3.14, B),
                         rng.uniform(0.05, 1.05, B)], axis=1).astype(
        np.float32)
    base = jax.device_get(rollout_pallas(
        system, jnp.asarray(x0), jnp.asarray(controls), jnp.asarray(obs),
        num_disc=10, width=20.0, height=20.0, cull=0))
    ok = True
    diffs = {}
    for w in (1, 2, 4):
        got = jax.device_get(rollout_pallas(
            system, jnp.asarray(x0), jnp.asarray(controls), jnp.asarray(obs),
            num_disc=10, width=20.0, height=20.0, cull=w))
        same = bool((got[0] == base[0]).all() and (got[1] == base[1]).all())
        diffs[f"cull{w}"] = same
        ok = ok and same
    return {"check": "windowed_cull_vs_onepass_tpu", "bitwise": ok,
            "per_window": diffs}


def main() -> int:
    platform = jax.devices()[0].platform
    only = sys.argv[1] if len(sys.argv) > 1 else None
    checks = {"permute": check_permute_rows, "lookup": check_score_lookup,
              "arena": check_arena_end_to_end, "cull": check_windowed_cull}
    results = [fn() for name, fn in checks.items()
               if only is None or only == name]
    out = {"platform": platform, "results": results,
           "all_bitwise": all(r["bitwise"] for r in results)}
    path = REPO / (".tpu_parity.json" if only is None
                   else f".tpu_parity_{only}.json")
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))
    return 0 if out["all_bitwise"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
