"""Round-3 probe #2 (real TPU): costs of the scatter-free batched-planner
building blocks (windowed multi-query design), plus the Pallas gather retry
with full error capture.

Measures, at multi-query shapes (B=256):
  1. shared-offset window commit: dynamic_update_slice on [B, W, 7]
  2. two-level one-hot einsum region stats (exact bf16 one-hots, f32 acc)
  3. score lookup via einsum vs via gather
  4. [B, R] single-column gather from [B, bins] (current acceptance path)
  5. XLA sort of [B, R] key+payload (fallback compaction primitive)
  6. Pallas 2-D gather retry with repr'd errors

Same timing discipline as r3_probe1: scalar fetch, varied inputs.
"""

from __future__ import annotations

import functools
import json
import time
import traceback

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, R, N1, N2SUB = 256, 1024, 256, 64
WINDOWS = 48  # max iterations in window mode
REPS = 20


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timeit_fetch(fn, *args, reps: int = 3) -> float:
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        float(fn(jnp.int32(100 + r), *args))
        best = min(best, time.perf_counter() - t0)
    return best


def _scan_apply(op, outer_i, carry, *xs):
    def body(c, i):
        return op(c, i, *xs), None

    out, _ = jax.lax.scan(body, carry,
                          jnp.arange(REPS, dtype=jnp.int32) + outer_i)
    return jax.tree_util.tree_reduce(
        lambda a, l: a + l.sum().astype(jnp.float32), out, jnp.float32(0))


def _bench(name, op, carry, *xs, note=None):
    f = jax.jit(lambda i, c, *a: _scan_apply(op, i, c, *a))
    try:
        float(f(jnp.int32(0), carry, *xs))
        dt = timeit_fetch(f, carry, *xs)
        emit(test=name, ms_per_apply=dt / REPS * 1e3, total_s=dt,
             **({"note": note} if note else {}))
    except Exception:
        emit(test=name, error=traceback.format_exc()[-600:])


def main():
    emit(platform=jax.devices()[0].platform)
    kd = jax.random.key(0)

    # 1. shared-offset window commit: one DUS on the batched arena
    arena = jnp.zeros((B, WINDOWS * R, 7), jnp.float32)
    rows = jax.random.uniform(kd, (B, R, 7), jnp.float32)

    def win_commit(c, i, rows):
        off = (i % WINDOWS) * R  # SAME offset for every problem
        return jax.lax.dynamic_update_slice(
            c, rows + i.astype(jnp.float32), (0, off, 0))

    _bench("window_commit_dus", win_commit, arena, rows,
           note=f"B={B} W={WINDOWS * R} R={R}, shared-offset DUS")

    # 2. two-level one-hot einsum region stats (r1 x r2sub), 2 value cols
    r1 = jax.random.randint(jax.random.key(1), (B, R), 0, N1, jnp.int32)
    sub = jax.random.randint(jax.random.key(2), (B, R), 0, N2SUB, jnp.int32)
    vals = jnp.ones((B, R, 2), jnp.float32)
    z2 = jnp.zeros((B, N1, N2SUB, 2), jnp.float32)

    def stats_two_level(c, i, r1, sub, vals):
        oh1 = jax.nn.one_hot((r1 + i) % N1, N1, dtype=jnp.bfloat16)
        oh2 = jax.nn.one_hot(sub, N2SUB, dtype=jnp.bfloat16)
        # d[b, n, m, col] = sum_r oh1[b,r,n] * oh2[b,r,m] * vals[b,r,col]
        # two chained exact matmuls: (oh2*vals) then contract with oh1
        t = jnp.einsum("brm,brc->brmc", oh2.astype(jnp.float32), vals)
        d = jnp.einsum("brn,brk->bnk", oh1.astype(jnp.float32),
                       t.reshape(B, R, N2SUB * 2),
                       preferred_element_type=jnp.float32)
        return c + d.reshape(B, N1, N2SUB, 2)

    _bench("stats_two_level_einsum", stats_two_level, z2, r1, sub, vals,
           note="r2 histogram as two one-hot contractions, exact f32 acc")

    # 2b. r1-level only (reuses oh1), fused with the score lookup
    score = jax.random.uniform(jax.random.key(3), (B, N1), jnp.float32)
    zb = jnp.zeros((B, R), jnp.float32)

    def score_lookup_einsum(c, i, r1, score):
        oh1 = jax.nn.one_hot((r1 + i) % N1, N1, dtype=jnp.bfloat16)
        s = jnp.einsum("brn,bn->br", oh1.astype(jnp.float32), score)
        return c + s

    _bench("score_lookup_einsum", score_lookup_einsum, zb, r1, score)

    def score_lookup_gather(c, i, r1, score):
        idx = (r1 + i) % N1
        s = jnp.take_along_axis(score, idx, axis=1)
        return c + s

    _bench("score_lookup_gather_256", score_lookup_gather, zb, r1, score,
           note="take_along_axis [B,R] from [B,256]")

    seen = jnp.zeros((B, 16384), jnp.float32)
    r2full = jax.random.randint(jax.random.key(4), (B, R), 0, 16384,
                                jnp.int32)

    def seen_lookup_gather(c, i, r2full, seen):
        idx = (r2full + i) % 16384
        return c + jnp.take_along_axis(seen, idx, axis=1)

    _bench("seen_lookup_gather_16384", seen_lookup_gather, zb, r2full, seen,
           note="take_along_axis [B,R] from [B,16384]")

    # 5. sort fallback: argsort [B, R] with payload
    keys = jax.random.uniform(jax.random.key(5), (B, R), jnp.float32)
    payload = jax.random.uniform(jax.random.key(6), (B, R), jnp.float32)

    def sort_bR(c, i, keys, payload):
        k, p = jax.lax.sort((keys + i.astype(jnp.float32) * 1e-9, payload),
                            num_keys=1)
        return c + p

    _bench("sort_bR_payload1", sort_bR, zb, keys, payload)

    # 6. Pallas per-lane 2-D gather retry with real error text
    BLK_ROWS, LANES, GRID = 256, 128, 8

    def gather_kernel(chain, tbl_ref, idx_ref, o_ref):
        tbl = tbl_ref[:]
        idx = idx_ref[:]
        rows = tbl.shape[0]

        def body(i, y):
            j = (idx + i) % rows
            return y + jnp.take_along_axis(tbl, j, axis=0)

        o_ref[:] = jax.lax.fori_loop(0, chain, body,
                                     jnp.zeros_like(idx, jnp.float32))

    for rows_n in (8, 128):
        try:
            ch = 256
            tbl = jax.random.uniform(jax.random.key(7), (rows_n, 128),
                                     jnp.float32)
            idx = jax.random.randint(jax.random.key(8),
                                     (GRID * BLK_ROWS, LANES), 0, rows_n,
                                     jnp.int32)

            def gcall(i, tbl, idx, ch=ch, rows_n=rows_n):
                return pl.pallas_call(
                    functools.partial(gather_kernel, ch),
                    grid=(GRID,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                        pl.BlockSpec((BLK_ROWS, LANES), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((BLK_ROWS, LANES),
                                           lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.float32),
                )(tbl, (idx + i) % rows_n).sum()

            f = jax.jit(gcall)
            float(f(jnp.int32(0), tbl, idx))
            dt = timeit_fetch(f, tbl, idx)
            rate = ch * GRID * BLK_ROWS * LANES / dt
            emit(test=f"pallas_gather2d_{rows_n}", gathers_per_sec=rate,
                 seconds=dt)
        except Exception:
            emit(test=f"pallas_gather2d_{rows_n}",
                 error=traceback.format_exc()[-1500:])


if __name__ == "__main__":
    main()
