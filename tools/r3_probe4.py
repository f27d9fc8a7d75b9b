"""Round-3 probe #4 (run on the real TPU chip): single-tree KGMT iteration
op-level cost breakdown.

Re-measuring the kgmt_iteration slope with capacity large enough that waves
never clamp gave 0.60 ms/iter at R=4096 (adaptive on or off) — the r2
"0.181 ms/iter" figure was contaminated by tree-full EMPTY iterations
(M=30000 fills ~8 waves in; most of the 400/800-iteration scan did no
work). This probe times the iteration's data-dependent-indexing ops
standalone, each in a lax.scan with per-step varying indices and a fetched
scalar (relay-immune), at planner shapes: R=4096 rollouts/iter, M=30000
tree rows, NR1=256, NR2=16384.

Op inventory (planners/kgmt.py):
  parent_gather   tree_samples[idx] row gather [R,7] from [M,7] + costs[idx]
  bincounts       masked_multi_bincount over NR1 + NR2 (2-col scatter-adds)
  lookups         r1_score[r1] [R] from [256] + r2_seen[r2] [R] from [16384]
  commit_scatter  3x .at[dst].set of R rows into [M(,7)] (samples, parent,
                  costs)
  onehot_stats    candidate replacement for bincounts: one-hot einsum
                  contraction (the arena's design) at R=4096
  onehot_lookup   candidate replacement for lookups: one-hot matmuls
  rollout         the fused kernel at R=4096 (for scale)

Usage: python tools/r3_probe4.py
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time
from functools import partial

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

R = 4096
M = 30000
NR1 = 256
NR2 = 16384
N_LO, N_HI = 100, 300


def emit(**kw):
    print(json.dumps(kw), flush=True)


def slope_ms(make_body, init_carry):
    """Best-of-3 slope of a scanned body (carry -> carry) in ms/step,
    from two separately-jitted scan lengths."""

    def runner(n):
        @jax.jit
        def r(c0):
            def body(c, i):
                return make_body(c, i), None

            c, _ = jax.lax.scan(body, c0, jnp.arange(n, dtype=jnp.int32))
            leaves = jax.tree_util.tree_leaves(c)
            return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

        return r

    f_lo, f_hi = runner(N_LO), runner(N_HI)
    float(f_lo(init_carry))
    float(f_hi(init_carry))
    t = {}
    for n, f in ((N_LO, f_lo), (N_HI, f_hi)):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(init_carry))
            best = min(best, time.perf_counter() - t0)
        t[n] = best
    return (t[N_HI] - t[N_LO]) / (N_HI - N_LO) * 1e3


def main():
    key = jax.random.key(0)
    tree = jax.random.normal(key, (M, 7), jnp.float32)
    costs = jax.random.uniform(key, (M,), jnp.float32)

    # --- parent row gather -------------------------------------------------
    def parent_gather(c, i):
        t, cs, acc = c
        idx = (jnp.arange(R, dtype=jnp.int32) * 7919 + i * 104729) % M
        rows = t[idx]
        pc = cs[idx]
        return (t, cs, acc + rows.sum() + pc.sum())

    s = slope_ms(parent_gather, (tree, costs, jnp.float32(0)))
    emit(op="parent_gather", slope_ms=round(s, 4))

    # --- bincounts (as in ops.segments.masked_multi_bincount) -------------
    from cudasbmp_tpu.ops.segments import masked_multi_bincount

    def bincounts(c, i):
        acc1, acc2 = c
        r1 = (jnp.arange(R, dtype=jnp.int32) * 31 + i) % NR1
        r2 = (jnp.arange(R, dtype=jnp.int32) * 131 + i) % NR2
        vals = jnp.stack([jnp.ones(R, jnp.int32),
                          (jnp.arange(R) % 2).astype(jnp.int32)], axis=-1)
        d1 = masked_multi_bincount(r1, vals, NR1)
        d2 = masked_multi_bincount(r2, vals, NR2)
        return (acc1 + d1[:, 0] + d1[:, 1], acc2 + d2[:, 0] + d2[:, 1])

    s = slope_ms(bincounts, (jnp.zeros(NR1, jnp.int32),
                             jnp.zeros(NR2, jnp.int32)))
    emit(op="bincounts_r1_r2", slope_ms=round(s, 4))

    # --- score/seen lookups ------------------------------------------------
    score = jax.random.uniform(key, (NR1,), jnp.float32)
    seen = (jax.random.uniform(key, (NR2,)) > 0.5).astype(jnp.int32)

    def lookups(c, i):
        sc, sn, acc = c
        r1 = (jnp.arange(R, dtype=jnp.int32) * 31 + i) % NR1
        r2 = (jnp.arange(R, dtype=jnp.int32) * 131 + i) % NR2
        a = sc[r1]
        b = sn[r2]
        return (sc, sn, acc + a.sum() + b.sum().astype(jnp.float32))

    s = slope_ms(lookups, (score, seen, jnp.float32(0)))
    emit(op="lookups_score_seen", slope_ms=round(s, 4))

    # --- commit scatters ---------------------------------------------------
    def commit(c, i):
        t, par, cs = c
        base = (i * 977) % (M - R)
        dst = base + jnp.arange(R, dtype=jnp.int32)  # contiguous-ish ids
        dst = jnp.where(jnp.arange(R) % 3 == 0, dst, M)  # ~1/3 accepted
        rows = jnp.broadcast_to(
            jnp.arange(7, dtype=jnp.float32)[None, :], (R, 7)) + i
        t = t.at[dst].set(rows, mode="drop")
        par = par.at[dst].set(jnp.arange(R, dtype=jnp.int32), mode="drop")
        cs = cs.at[dst].set(rows[:, 0], mode="drop")
        return (t, par, cs)

    s = slope_ms(commit, (tree, jnp.zeros(M, jnp.int32), costs))
    emit(op="commit_scatter_x3", slope_ms=round(s, 4))

    # --- one-hot stats einsum candidate (arena design at R=4096) ----------
    def onehot_stats(c, i):
        acc1, acc2v = c
        r1 = (jnp.arange(R, dtype=jnp.int32) * 31 + i) % NR1
        loc = (jnp.arange(R, dtype=jnp.int32) * 7 + i) % 64
        oh1 = jax.nn.one_hot(r1, NR1, dtype=jnp.float32)  # [R, 256]
        ohl = jax.nn.one_hot(loc, 64, dtype=jnp.float32)  # [R, 64]
        valid = (jnp.arange(R) % 2).astype(jnp.float32)
        rhs = jnp.concatenate(
            [ohl * valid[:, None], jnp.ones((R, 1)), valid[:, None]],
            axis=-1)  # [R, 66]
        d = jnp.einsum("rc,rl->cl", oh1, rhs,
                       preferred_element_type=jnp.float32)
        return (acc1 + d[:, 64] + d[:, 65], acc2v + d[:, :64].ravel())

    s = slope_ms(onehot_stats, (jnp.zeros(NR1, jnp.float32),
                                jnp.zeros(NR1 * 64, jnp.float32)))
    emit(op="onehot_stats_einsum", slope_ms=round(s, 4))

    # --- one-hot lookup candidate -----------------------------------------
    def onehot_lookup(c, i):
        sc, sn2, acc = c
        r1 = (jnp.arange(R, dtype=jnp.int32) * 31 + i) % NR1
        loc = (jnp.arange(R, dtype=jnp.int32) * 7 + i) % 64
        oh1 = jax.nn.one_hot(r1, NR1, dtype=jnp.float32)
        ohl = jax.nn.one_hot(loc, 64, dtype=jnp.float32)
        a = oh1 @ sc  # [R]
        tbl = oh1 @ sn2  # [R, 64] rows of the [256, 64] seen table
        b = (tbl * ohl).sum(-1)
        return (sc, sn2, acc + a.sum() + b.sum())

    s = slope_ms(onehot_lookup, (score, jnp.asarray(
        np.random.default_rng(0).uniform(size=(NR1, 64)) > 0.5,
        jnp.float32), jnp.float32(0)))
    emit(op="onehot_lookup_matmul", slope_ms=round(s, 4))

    # --- the fused rollout kernel at R=4096 (scale reference) --------------
    from cudasbmp_tpu.ops.rollout_pallas import sample_and_rollout_pallas
    from cudasbmp_tpu.systems.registry import get_system

    system = get_system("bicycle")
    obstacles = jnp.asarray(
        [[2.0, 2.0, 4.0, 4.0], [8.0, 8.0, 10.0, 10.0]] * 4, jnp.float32)

    def rollout(c, i):
        x0, acc = c
        x1, ctrl, valid = sample_and_rollout_pallas(
            system, i, x0, obstacles, num_disc=10, width=20.0, height=20.0)
        return (x0, acc + x1.sum() + valid.sum().astype(jnp.float32))

    x0 = jnp.broadcast_to(
        jnp.asarray([5.0, 5.0, 0.0, 0.0], jnp.float32)[None, :], (R, 4))
    s = slope_ms(rollout, (x0, jnp.float32(0)))
    emit(op="rollout_kernel_r4096", slope_ms=round(s, 4))


if __name__ == "__main__":
    main()
