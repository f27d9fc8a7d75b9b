from cudasbmp_tpu.systems.base import System, ControlSpec
from cudasbmp_tpu.systems.bicycle import KinematicBicycle
from cudasbmp_tpu.systems.point2d import Point2D
from cudasbmp_tpu.systems.double_integrator import DoubleIntegrator2D
from cudasbmp_tpu.systems.unicycle import Unicycle
from cudasbmp_tpu.systems.dubins import DubinsCar
from cudasbmp_tpu.systems.registry import get_system, register_system, available_systems

__all__ = [
    "System",
    "ControlSpec",
    "KinematicBicycle",
    "Point2D",
    "DoubleIntegrator2D",
    "Unicycle",
    "DubinsCar",
    "get_system",
    "register_system",
    "available_systems",
]
