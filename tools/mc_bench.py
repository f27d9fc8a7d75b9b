"""Record the Monte-Carlo randomized-scenario sweep throughput
(BASELINE.json config 5's per-chip half) to .mc_bench.json, which bench.py
reports as ``extra.monte_carlo_1024`` when its own budget can't afford the
~4-minute arena compile over the axon relay.

Run on the real TPU chip:  python tools/mc_bench.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    import jax

    from bench import measure_monte_carlo

    platform = jax.devices()[0].platform
    if platform != "tpu":
        print(f"refusing to record from platform={platform!r} (need tpu)")
        raise SystemExit(1)
    res = measure_monte_carlo()
    (REPO / ".mc_bench.json").write_text(json.dumps(res, indent=1))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
