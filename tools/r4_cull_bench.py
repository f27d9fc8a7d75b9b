"""Round-4 broad-phase measurement: step-windowed culling on the dense-24
field (VERDICT r3 item 3). Measures exact-semantics pallas_rng throughput
with Z-order-grouped lanes at cull = off / 1 (whole-trajectory box, the r3
design) / 2 / 4 / 5 windows, demo-8 field as the ceiling reference.
Bar: >= 1.17 B total rollouts/s on dense-24 grouped ("within 15% of demo").

Writes .cull_bench.json. Run on the real chip: python tools/r4_cull_bench.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    import jax

    from bench import measure_prop_throughput

    if jax.devices()[0].platform != "tpu":
        print("need the real TPU chip")
        raise SystemExit(1)
    rows = []
    for label, kw in (
        ("demo_reference", dict(dense=False)),
        ("dense24_nocull", dict(dense=True)),
        ("dense24_grouped_cull1", dict(dense=True, grouped=True, cull=1)),
        ("dense24_grouped_cull2", dict(dense=True, grouped=True, cull=2)),
        ("dense24_grouped_cull4", dict(dense=True, grouped=True, cull=4)),
        ("dense24_grouped_cull5", dict(dense=True, grouped=True, cull=5)),
    ):
        r = measure_prop_throughput(backend="pallas_rng", **kw)
        row = {"label": label,
               "total_per_sec": round(r["rollouts_per_sec"], 1),
               "valid_per_sec": round(r["valid_per_sec"], 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    demo = next(r for r in rows if r["label"] == "demo_reference")
    best = max((r for r in rows if r["label"].startswith("dense24_grouped")),
               key=lambda r: r["total_per_sec"])
    out = {"rows": rows,
           "best_dense_grouped": best["label"],
           "best_total_per_sec": best["total_per_sec"],
           "fraction_of_demo": round(
               best["total_per_sec"] / demo["total_per_sec"], 4),
           "bar_1p17e9_met": best["total_per_sec"] >= 1.17e9}
    (REPO / ".cull_bench.json").write_text(json.dumps(out, indent=1))
    print(json.dumps({k: v for k, v in out.items() if k != "rows"}))


if __name__ == "__main__":
    main()
