"""Record the streaming Monte-Carlo sweep throughput (VERDICT r3 item 7) to
.streaming_mc.json, which bench.py reports as ``extra.streaming_monte_carlo``
when its own budget can't afford the compile over the axon relay.

Run on the real TPU chip:  python tools/streaming_bench.py [total] [pool]
(default 4096/1024 — the steady-state workload; total == pool is all drain
tail and reads ~3x low, docs/perf.md r5)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    import jax

    from bench import measure_streaming_mc

    platform = jax.devices()[0].platform
    if platform != "tpu":
        print(f"refusing to record from platform={platform!r} (need tpu)")
        raise SystemExit(1)
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    pool = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    res = measure_streaming_mc(total=total, pool=pool)
    (REPO / ".streaming_mc.json").write_text(json.dumps(res, indent=1))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
