from cudasbmp_tpu.planners.base import Planner
from cudasbmp_tpu.planners.kgmt import (
    KGMT,
    KGMTResult,
    KGMTState,
    PathlessState,
)
from cudasbmp_tpu.planners.naive import NaivePlanner
from cudasbmp_tpu.planners.costprop import CostPropPlanner

__all__ = [
    "Planner",
    "KGMT",
    "KGMTResult",
    "KGMTState",
    "PathlessState",
    "NaivePlanner",
    "CostPropPlanner",
]
