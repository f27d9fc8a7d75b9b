"""Structured per-iteration metrics (SURVEY.md §5 observability plan).

The reference's observability is printf + 13 CSV dumps (KGMT.cu:100, 256-257,
295-296, 299-311). Here the planner already records per-iteration counters as
device arrays inside the jitted loop (KGMTState.m_*); these helpers render
them for humans and for NPZ/CSV export.
"""

from __future__ import annotations

import numpy as np


def iteration_metrics_table(metrics: dict) -> str:
    """ASCII table of per-iteration planner counters."""
    fs = metrics["frontier_size"]
    rows = ["iter frontier    valid accepted tree_size accept_rate"]
    for i in range(len(fs)):
        v, a = metrics["valid"][i], metrics["accepted"][i]
        rate = a / max(int(v), 1)
        rows.append(
            f"{i:4d} {fs[i]:8d} {v:8d} {a:8d} {metrics['tree_size'][i]:9d} {rate:11.3f}"
        )
    return "\n".join(rows)


def region_entropy(r1_score: np.ndarray) -> float:
    """Entropy of the normalized region-score distribution — a scalar summary
    of how spread-out exploration guidance currently is."""
    p = np.asarray(r1_score, np.float64)
    p = p / max(p.sum(), 1e-12)
    nz = p[p > 0]
    return float(-(nz * np.log(nz)).sum())


def summarize_result(result) -> dict:
    """Flat scalar summary of a KGMTResult, e.g. for JSON logging."""
    m = result.metrics
    valid_total = int(np.sum(m["valid"])) if len(m["valid"]) else 0
    return {
        "solved": result.solved,
        "cost": result.cost,
        "iterations": result.iterations,
        "tree_size": result.tree_size,
        "wall_time_s": result.wall_time_s,
        "path_length": int(len(result.path)),
        "valid_rollouts": valid_total,
        "valid_rollouts_per_sec": valid_total / max(result.wall_time_s, 1e-9),
        "region_entropy": region_entropy(np.asarray(result.state.r1_score)),
    }
