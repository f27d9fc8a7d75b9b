"""Speed-of-light / MFU accounting for the fused rollout kernel (VERDICT r2
item 3; the reference's whole perf apparatus is the CostPropPlanner
throughput probe, CostPropPlanner.cu:85-88,135-136 — this is its roofline
upgrade).

Run on the real TPU chip:  python tools/roofline.py
Writes .roofline.json, which bench.py surfaces as ``extra.mfu``.

Method
------
1. Calibrate the chip with two Pallas microbenchmarks (same harness as
   tools/r3_probe1.py): a dependent mul+add chain (ALU issue rate; counts an
   FMA as ONE issue slot — the probe's "2 ops/link" convention is reported
   alongside) and dependent cos/sin/tan chains (transcendental eval rate —
   on TPU transcendentals are VPU polynomial sequences, not a separate SFU).
2. Measure the production kernel's rollouts/s via bench.measure_prop_throughput
   (exact + fast_math on the 8-padded demo obstacle set, exact on the
   24-obstacle dense field).
3. Count the kernel's per-rollout work from the source op mix
   (count_rollout_ops below — conservative and FMA-fused tallies, explicit
   assumptions) and report measured throughput as a fraction of each
   roofline:
     - transcendental roofline: rollouts/s x trans_per_rollout / trans_rate
     - ALU-issue roofline:      rollouts/s x alu_issues_per_rollout / alu_rate
   The binding constraint is whichever fraction is higher. An additive
   (no-overlap) bound is also reported; measurements exceeding it mean Mosaic
   overlaps the transcendental polynomial with neighboring elementwise code,
   which is expected.

Known calibration caveats (stated in the output): the dependent-chain ALU
rate may be latency- not issue-limited (a lower bound on true peak; the v5e
VPU is 4 ALUs x (8x128) lanes per clock, so the theoretical ceiling is
~2x-3x the measured chain), and op counts assume the compiler hoists
loop-invariant subexpressions (a*dt, 1/L) and fuses mul+add into FMA where
the source allows.
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BLK_ROWS, LANES, GRID, REPS_A = 256, 128, 8, 64


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
    m = x[0, 0] * 1e-9 + 0.999931  # runtime multiplier defeats const-fold

    def body(_, y):
        return y * m + x  # one FMA issue per element per link

    o_ref[:] = jax.lax.fori_loop(0, chain, body, x)


def _trans_kernel(op, chain, x_ref, o_ref):
    x = x_ref[:]
    eps = x[0, 0] * 1e-12

    def body(_, y):
        return op(y) + eps

    o_ref[:] = jax.lax.fori_loop(0, chain, body, x)


def _repeat_sum(call, i, x):
    def body(acc, j):
        return acc + call(x + j.astype(jnp.float32) * 1e-9).sum(), None

    out, _ = jax.lax.scan(body, jnp.float32(0),
                          jnp.arange(REPS_A, dtype=jnp.int32) + i)
    return out


def _timeit_fetch(fn, *args, reps: int = 3) -> float:
    """block_until_ready does not reliably block through the axon relay
    (measured); force a scalar host fetch instead, varying the input."""
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        float(fn(jnp.int32(100 + r), *args))
        best = min(best, time.perf_counter() - t0)
    return best


def calibrate() -> dict:
    elems = GRID * BLK_ROWS * LANES
    x0 = jax.random.uniform(jax.random.key(0), (GRID * BLK_ROWS, LANES),
                            jnp.float32, 0.5, 1.0)
    chain = 16384
    alu = jax.jit(lambda i, x: _repeat_sum(
        lambda x: _chain_call(_alu_kernel, chain, x), i, x))
    float(alu(jnp.int32(0), x0))
    dt = _timeit_fetch(alu, x0)
    issues = float(chain) * elems * REPS_A  # one FMA issue per link
    out = {
        "alu_fma_issues_per_sec": issues / dt,
        "alu_ops_per_sec_2x": 2.0 * issues / dt,  # probe's mul+add convention
    }
    for name, op in (("cos", jnp.cos), ("sin", jnp.sin), ("tan", jnp.tan)):
        ch = 2048
        k = functools.partial(_trans_kernel, op)
        tr = jax.jit(lambda i, x, k=k, ch=ch: _repeat_sum(
            lambda x: _chain_call(k, ch, x), i, x))
        float(tr(jnp.int32(0), x0))
        dtt = _timeit_fetch(tr, x0)
        out[f"{name}_evals_per_sec"] = ch * elems * REPS_A / dtt
    return out


def count_rollout_ops(num_disc: int = 10, K: int = 8,
                      fast_math: bool = False) -> dict:
    """Per-rollout VPU work of the fused bicycle kernel
    (ops/rollout_pallas.py::_integrate + the in-kernel control sampling).

    Two tallies per category:
      - ``fused``: assumes mul+add -> FMA (1 issue), loop-invariant hoisting
        of a*dt and the 1/agent_length fold (L=1 in the demo), and CSE of
        v*dt between the x and y updates.
      - ``conservative``: every source-level arithmetic/compare/select/minmax
        op is one issue, no fusion.
    Transcendentals counted separately (cos/sin/tan eval units).
    """
    # in-kernel control sampling (pallas_rng): 3 draws, each
    # bits>>8, cast, *scale, +lo (+ the PRNG word itself ~1 issue)
    sample_fused, sample_cons = 3 * 4, 3 * 5
    if fast_math:
        # soa_prepare_fast: d0 = (v/L)*tan*dt (3), c2 = (a*dt/L)*tan*dt (3),
        # carry/aux trig: tan + 3 cos + 3 sin once per rollout
        prep_trans = 7
        prep_fused, prep_cons = 6, 8
        # soa_step_fast per step: x/y FMA updates (3 with CSE of v*dt),
        # th += dth (1), v FMA (1), 4 rotation terms (mul+FMA each = 8),
        # dth + c2 (1)
        step_int_fused, step_int_cons = 3 + 1 + 1 + 8 + 1, 6 + 1 + 2 + 12 + 1
        step_trans = 0
    else:
        prep_trans = 1  # tan(steering) hoisted
        prep_fused, prep_cons = 0, 0
        # soa_step per step: cos+sin (trans), vdt=v*dt (1), x FMA (1),
        # y FMA (1), th: (v*invL)*tan*dt FMA chain (3), v FMA (1)
        step_int_fused, step_int_cons = 7, 11
        step_trans = 2
    # per step, independent of dynamics:
    bounds = 7            # 4 cmp + 3 and
    swept = 4             # min/max x2
    obstacle = 8 * K      # 4 cmp + 3 or + 1 and per obstacle row
    freeze = 5            # 4 comp selects + alive&clear
    per_step_fused = step_int_fused + bounds + swept + obstacle + freeze
    per_step_cons = step_int_cons + bounds + swept + obstacle + freeze
    return {
        "assumptions": "FMA=1 issue, cmp/select/minmax=1, div folded to mul "
                       "(L=1), a*dt and v*dt hoisted/CSE'd in the fused tally",
        "num_disc": num_disc, "K_obstacles": K, "fast_math": fast_math,
        "alu_issues_fused": sample_fused + prep_fused
        + num_disc * per_step_fused,
        "alu_issues_conservative": sample_cons + prep_cons
        + num_disc * per_step_cons,
        "transcendentals": prep_trans + num_disc * step_trans,
    }


def analyze(measured_total_per_sec: float, ops: dict, cal: dict) -> dict:
    """Fractions of each roofline for one measured kernel configuration."""
    alu_rate = cal["alu_fma_issues_per_sec"]
    trans_rate = min(cal["cos_evals_per_sec"], cal["sin_evals_per_sec"])
    n_tr = ops["transcendentals"]
    trans_frac = (measured_total_per_sec * n_tr / trans_rate) if n_tr else 0.0
    alu_frac_fused = measured_total_per_sec * ops["alu_issues_fused"] / alu_rate
    alu_frac_cons = (measured_total_per_sec
                     * ops["alu_issues_conservative"] / alu_rate)
    # additive (no-overlap) speed-of-light prediction
    sol_additive = 1.0 / (ops["alu_issues_fused"] / alu_rate
                          + (n_tr / trans_rate if n_tr else 0.0))
    sol_overlap = min(alu_rate / ops["alu_issues_fused"],
                      trans_rate / n_tr if n_tr else float("inf"))
    binding = ("transcendental" if trans_frac > alu_frac_fused
               else "ALU issue slots")
    return {
        "measured_rollouts_per_sec": measured_total_per_sec,
        "trans_roofline_fraction": round(trans_frac, 3),
        "alu_roofline_fraction_fused": round(alu_frac_fused, 3),
        "alu_roofline_fraction_conservative": round(alu_frac_cons, 3),
        "sol_rollouts_per_sec_additive": round(sol_additive, 1),
        "sol_rollouts_per_sec_overlapped": round(sol_overlap, 1),
        "fraction_of_sol_overlapped": round(
            measured_total_per_sec / sol_overlap, 3),
        "binding_constraint": binding,
        "ops": ops,
    }


def main() -> None:
    from bench import measure_prop_throughput

    platform = jax.devices()[0].platform
    print(json.dumps({"platform": platform}), flush=True)
    if platform != "tpu":
        print("roofline.py must run on the real TPU chip", file=sys.stderr)
        sys.exit(1)
    cal = calibrate()
    print(json.dumps({"calibration": cal}), flush=True)

    exact = measure_prop_throughput(backend="pallas_rng")
    fast = measure_prop_throughput(backend="pallas_rng", fast_math=True)
    dense = measure_prop_throughput(backend="pallas_rng", dense=True)

    result = {
        "calibration": {k: round(v, 1) for k, v in cal.items()},
        # demo scenario pads 5 obstacles to 8 rows; dense() pads 24 to 24
        "exact_demo8": analyze(exact["rollouts_per_sec"],
                               count_rollout_ops(K=8), cal),
        "fast_math_demo8": analyze(fast["rollouts_per_sec"],
                                   count_rollout_ops(K=8, fast_math=True),
                                   cal),
        "exact_dense24": analyze(dense["rollouts_per_sec"],
                                 count_rollout_ops(K=24), cal),
        "caveats": "ALU chain rate is a dependent-FMA measurement and may be "
                   "latency- (not issue-) limited: a LOWER bound on peak, so "
                   "roofline fractions are UPPER bounds. Fractions > 1 on the "
                   "additive model mean Mosaic overlaps transcendental "
                   "polynomials with neighboring elementwise work.",
    }
    (REPO / ".roofline.json").write_text(json.dumps(result, indent=1))
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
