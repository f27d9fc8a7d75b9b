"""One-session A/B of the static vs streaming Monte-Carlo sweeps with a
same-run calibration probe (VERDICT r4 items 7+8): the r3->r4 static-MC
drift (2,119 -> 1,534 solves/s) could not be attributed because the two
numbers came from different sessions on a shared chip. This records both
modes PLUS the fixed demo-8 kernel rate in one process, so future rounds
can normalize by chip load (ratio to calibration) instead of comparing raw
rates across sessions.

Refreshes .mc_bench.json and .streaming_mc.json (the artifacts bench.py
falls back to) and writes the combined .mc_ab.json.

Run on the real TPU chip:  python tools/r5_mc_ab.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    import jax

    from bench import (
        measure_monte_carlo,
        measure_prop_throughput,
        measure_streaming_mc,
    )

    platform = jax.devices()[0].platform
    if platform != "tpu":
        print(f"refusing to record from platform={platform!r} (need tpu)")
        raise SystemExit(1)

    # same-run calibration: the fixed demo-obstacle fused kernel rate —
    # every number below can be load-normalized by ratio to this
    cal = measure_prop_throughput(backend="pallas_rng", repeats=500)
    cal_rate = round(cal["rollouts_per_sec"], 1)
    print(f"calibration: {cal_rate:.3e} rollouts/s", flush=True)

    static = measure_monte_carlo()
    static["calibration_rollouts_per_sec"] = cal_rate
    print(f"static   : {static['solves_per_sec']} solves/s "
          f"cost_p50 {static['cost_quantiles']}", flush=True)

    stream = measure_streaming_mc()
    stream["calibration_rollouts_per_sec"] = cal_rate
    print(f"streaming: {stream['solves_per_sec']} solves/s "
          f"cost_q {stream['cost_quantiles']}", flush=True)

    (REPO / ".mc_bench.json").write_text(json.dumps(static, indent=1))
    (REPO / ".streaming_mc.json").write_text(json.dumps(stream, indent=1))
    combined = {
        "recorded_unix": time.time(),
        "calibration_rollouts_per_sec": cal_rate,
        "static": static,
        "streaming": stream,
        "note": ("one-session A/B: both modes measured back-to-back with a "
                 "shared calibration probe; cross-round comparisons should "
                 "use rate/calibration ratios (VERDICT r4 items 7+8)"),
    }
    (REPO / ".mc_ab.json").write_text(json.dumps(combined, indent=1))
    print(json.dumps({k: combined[k] for k in
                      ("calibration_rollouts_per_sec",)}))


if __name__ == "__main__":
    main()
