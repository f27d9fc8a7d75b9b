"""Round-3 probe #1 (run on the real TPU chip): roofline calibration +
multi-query glue diagnosis.

Part A — VPU microbenchmarks (Pallas kernels) for the perf.md roofline
(VERDICT r2 item 3): empirical ALU-chain peak, transcendental cost in
ALU-op equivalents, and per-lane vector-gather feasibility/throughput
(the make-or-break primitive for an occupancy candidate-list collision
phase, VERDICT r2 item 1). Gathers use the 2-D ``take_along_axis(tbl,
idx, axis=0)`` form — Mosaic rejects 1-D gathers ("Only 2D gather is
supported", measured this session).

Part B — standalone comparisons of the batched planner ops that dominate
multi-query wall time (VERDICT r2 weak #1): vmapped-over-batch vs
flattened-global-arena forms of the commit scatter, parent gather and
region-stats scatter-add, plus the full-state select that vmap's
while_loop masking implies.

TIMING: on the axon relay ``block_until_ready`` does NOT reliably block
(measured 73 us for ~2 ms of VPU work), so every timed program reduces to a
scalar that the host FETCHES (``float(...)``) — the same discipline bench.py
uses — and inputs are varied per call so no layer can serve a cached result.

Prints one JSON line per measurement.
Usage:  python tools/r3_probe1.py [parta|partb|all]
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timeit_fetch(fn, *args, reps: int = 3) -> float:
    """Best-of-reps seconds for fn(i, *args) -> scalar, forcing a host fetch
    of the result. The integer i varies per call to defeat any caching."""
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        float(fn(jnp.int32(100 + r), *args))
        best = min(best, time.perf_counter() - t0)
    return best


# ---------------------------------------------------------------------------
# Part A: VPU microbenchmarks
# ---------------------------------------------------------------------------

BLK_ROWS = 256  # (256, 128) f32 block = 32 vregs -> dependency distance 32
LANES = 128
GRID = 8


def _chain_call(kernel, chain: int, x):
    return pl.pallas_call(
        functools.partial(kernel, chain),
        grid=(GRID,),
        in_specs=[pl.BlockSpec((BLK_ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLK_ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
    )(x)


def _alu_kernel(chain, x_ref, o_ref):
    x = x_ref[:]
    m = x[0, 0] * 1e-9 + 0.999931  # runtime multiplier: defeats const-fold

    def body(_, y):
        return y * m + x

    o_ref[:] = jax.lax.fori_loop(0, chain, body, x)


def _trans_kernel(op, chain, x_ref, o_ref):
    x = x_ref[:]
    eps = x[0, 0] * 1e-12

    def body(_, y):
        return op(y) + eps  # dependent chain; eps defeats folding

    o_ref[:] = jax.lax.fori_loop(0, chain, body, x)


def _gather_kernel(chain, tbl_ref, idx_ref, o_ref):
    tbl = tbl_ref[:]  # (ROWS, 128) f32
    idx = idx_ref[:]  # (BLK_ROWS, 128) int32 in [0, ROWS)
    rows = tbl.shape[0]

    def body(i, y):
        j = (idx + i) % rows
        g = jnp.take_along_axis(tbl, j, axis=0)  # 2-D gather: per-lane row
        return y + g

    o_ref[:] = jax.lax.fori_loop(0, chain, body,
                                 jnp.zeros_like(idx, jnp.float32))


REPS_A = 64


def _repeat_sum(call, i, x):
    """Run ``call`` REPS_A times inside one dispatch with varied input; sum
    of outputs forces every iteration to execute."""

    def body(acc, j):
        return acc + call(x + j.astype(jnp.float32) * 1e-9).sum(), None

    out, _ = jax.lax.scan(body, jnp.float32(0),
                          jnp.arange(REPS_A, dtype=jnp.int32) + i)
    return out


def part_a():
    elems = GRID * BLK_ROWS * LANES
    x0 = jax.random.uniform(jax.random.key(0), (GRID * BLK_ROWS, LANES),
                            jnp.float32, 0.5, 1.0)

    # dispatch-overhead reference: a near-empty fetch
    null = jax.jit(lambda i, x: (x + i.astype(jnp.float32)).sum())
    float(null(jnp.int32(0), x0))
    emit(test="null_dispatch", seconds=timeit_fetch(null, x0))

    # --- ALU chain (1 mul + 1 add per element per link) -------------------
    chain = 16384
    alu = jax.jit(lambda i, x: _repeat_sum(
        lambda x: _chain_call(_alu_kernel, chain, x), i, x))
    float(alu(jnp.int32(0), x0))  # compile
    dt = timeit_fetch(alu, x0)
    alu_ops = 2.0 * chain * elems * REPS_A
    alu_rate = alu_ops / dt
    emit(test="alu_chain", ops_per_sec=alu_rate, seconds=dt,
         note="dependent y*m+x chain; 2 VPU ops/elem/link; scalar-fetched")

    # --- transcendental chains --------------------------------------------
    for name, op in (("cos", jnp.cos), ("sin", jnp.sin), ("tan", jnp.tan)):
        ch = 2048
        k = functools.partial(_trans_kernel, op)
        tr = jax.jit(lambda i, x, k=k, ch=ch: _repeat_sum(
            lambda x: _chain_call(k, ch, x), i, x))
        float(tr(jnp.int32(0), x0))
        dt = timeit_fetch(tr, x0)
        rate = ch * elems * REPS_A / dt
        emit(test=f"trans_{name}", evals_per_sec=rate, seconds=dt,
             alu_op_equiv=alu_rate / rate,
             note="dependent chain; alu_op_equiv = ALU ops worth of one eval")

    # --- per-lane 2-D gather from a small VMEM table ------------------------
    for rows in (8, 128, 1024):
        idx = jax.random.randint(jax.random.key(1), (GRID * BLK_ROWS, LANES),
                                 0, rows, jnp.int32)
        tbl = jax.random.uniform(jax.random.key(2), (rows, 128), jnp.float32)
        ch = 512

        def gcall(x, tbl=tbl, ch=ch):
            idx_f = (x * 1e6).astype(jnp.int32) % tbl.shape[0]
            return pl.pallas_call(
                functools.partial(_gather_kernel, ch),
                grid=(GRID,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec((BLK_ROWS, LANES), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BLK_ROWS, LANES), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(idx_f.shape, jnp.float32),
            )(tbl, idx_f)

        try:
            ga = jax.jit(lambda i, x, gcall=gcall: _repeat_sum(gcall, i, x))
            xidx = jax.random.uniform(jax.random.key(3),
                                      (GRID * BLK_ROWS, LANES), jnp.float32)
            float(ga(jnp.int32(0), xidx))
            dt = timeit_fetch(ga, xidx)
            rate = ch * elems * REPS_A / dt
            emit(test=f"vmem_gather2d_{rows}", gathers_per_sec=rate,
                 seconds=dt, alu_op_equiv=alu_rate / rate,
                 note="take_along_axis row-gather from (rows,128) VMEM table")
        except Exception as e:
            emit(test=f"vmem_gather2d_{rows}", error=str(e)[:400])


# ---------------------------------------------------------------------------
# Part B: batched planner-op shootout (plain XLA, no Pallas)
# ---------------------------------------------------------------------------

B, M, R, NR2 = 256, 16384, 2048, 16384
REPS = 20


def _scan_apply(op, outer_i, carry, *xs):
    """Apply op REPS times inside one dispatch; the per-call outer_i offsets
    every step's i so no two calls run an identical computation. The final
    carry reduces to a scalar so the host fetch forces completion."""

    def body(c, i):
        return op(c, i, *xs), None

    out, _ = jax.lax.scan(body, carry,
                          jnp.arange(REPS, dtype=jnp.int32) + outer_i)
    return jax.tree_util.tree_reduce(
        lambda a, l: a + l.sum().astype(jnp.float32), out, jnp.float32(0))


def _bench(name, op, carry, *xs, note=None):
    f = jax.jit(lambda i, c, *a: _scan_apply(op, i, c, *a))
    float(f(jnp.int32(0), carry, *xs))  # compile
    dt = timeit_fetch(f, carry, *xs)
    emit(test=name, ms_per_apply=dt / REPS * 1e3, total_s=dt,
         **({"note": note} if note else {}))


def part_b():
    kd = jax.random.key(3)
    tree = jnp.zeros((B, M, 7), jnp.float32)
    treef = jnp.zeros((B * M, 7), jnp.float32)
    rows = jax.random.uniform(kd, (B, R, 7), jnp.float32)
    base = jax.random.randint(jax.random.key(4), (B, 1), 0, M - R, jnp.int32)
    dst = base + jnp.arange(R, dtype=jnp.int32)[None, :]

    def commit_vmapped(c, i, rows, dst):
        r = rows + i.astype(jnp.float32)
        d = (dst + i) % (M - R)
        return jax.vmap(lambda t, d, r: t.at[d].set(r, mode="drop"))(c, d, r)

    _bench("commit_scatter_vmapped", commit_vmapped, tree, rows, dst,
           note=f"B={B} M={M} R={R}, vmap of .at[dst].set")

    flat_dst = (dst + jnp.arange(B, dtype=jnp.int32)[:, None] * M).reshape(-1)
    flat_rows = rows.reshape(B * R, 7)

    def commit_flat(c, i, fr, fd):
        return c.at[(fd + i) % (B * M)].set(fr + i.astype(jnp.float32),
                                            mode="drop")

    _bench("commit_scatter_flat", commit_flat, treef, flat_rows, flat_dst,
           note="one scatter into [B*M,7] with flat indices")

    def commit_flat_hint(c, i, fr, fd):
        return c.at[fd + (i - i)].set(  # indices unchanged: keep sortedness
            fr + i.astype(jnp.float32), mode="drop", unique_indices=True,
            indices_are_sorted=True)

    _bench("commit_scatter_flat_hinted", commit_flat_hint, treef, flat_rows,
           flat_dst)

    pidx = jax.random.randint(jax.random.key(5), (B, R), 0, M, jnp.int32)
    big = jax.random.uniform(jax.random.key(6), (B, M, 7), jnp.float32)

    def gather_vmapped(c, i, big, pidx):
        g = jax.vmap(lambda t, p: t[p])(big, (pidx + i) % M)
        return c + g.sum(axis=(1, 2))

    _bench("parent_gather_vmapped", gather_vmapped, jnp.zeros(B), big, pidx)

    bigf = big.reshape(B * M, 7)
    pflat = (pidx + jnp.arange(B, dtype=jnp.int32)[:, None] * M).reshape(-1)

    def gather_flat(c, i, bigf, pflat):
        return c + bigf[(pflat + i) % (B * M)].sum()

    _bench("parent_gather_flat", gather_flat, jnp.zeros(()), bigf, pflat)

    r2 = jax.random.randint(jax.random.key(7), (B, R), 0, NR2, jnp.int32)
    vals = jnp.ones((B, R, 2), jnp.int32)

    def stats_vmapped(c, i, r2, vals):
        def one(c1, idx, v):
            return c1.at[idx].add(v, mode="drop")

        return jax.vmap(one)(c, (r2 + i) % NR2, vals)

    z = jnp.zeros((B, NR2, 2), jnp.int32)
    _bench("stats_scatter_vmapped", stats_vmapped, z, r2, vals,
           note=f"B={B} bins={NR2} updates={R} cols=2")

    r2f = (r2 + jnp.arange(B, dtype=jnp.int32)[:, None] * NR2).reshape(-1)
    valsf = vals.reshape(B * R, 2)
    zf = jnp.zeros((B * NR2, 2), jnp.int32)

    def stats_flat(c, i, r2f, valsf):
        return c.at[(r2f + i) % (B * NR2)].add(valsf, mode="drop")

    _bench("stats_scatter_flat", stats_flat, zf, r2f, valsf)

    # one-hot matmul alternative for the R1 level (256 bins): MXU histogram
    r1 = jax.random.randint(jax.random.key(8), (B, R), 0, 256, jnp.int32)
    valsf1 = jnp.ones((B, R, 2), jnp.float32)
    z1 = jnp.zeros((B, 256, 2), jnp.float32)

    def stats_onehot(c, i, r1, valsf1):
        oh = jax.nn.one_hot((r1 + i) % 256, 256, dtype=jnp.float32)
        return c + jnp.einsum("brn,brc->bnc", oh, valsf1)

    _bench("stats_onehot_matmul_256", stats_onehot, z1, r1, valsf1,
           note="one-hot einsum histogram, 256 bins (MXU)")

    mask = jnp.zeros((B,), bool)

    def select_state(c, i, big):
        return jnp.where(mask[:, None, None], c + i.astype(jnp.float32), big)

    _bench("state_select_BM7", select_state, big, big,
           note="where(mask) over [B,M,7] f32")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    emit(platform=jax.devices()[0].platform, device=str(jax.devices()[0]))
    if which in ("parta", "all"):
        part_a()
    if which in ("partb", "all"):
        part_b()


if __name__ == "__main__":
    main()
