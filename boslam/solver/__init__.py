from boslam.solver.optimizer import solve, gn_step
from boslam.solver.residuals import (
    predict_bearing,
    predict_odometry,
    bearing_error,
    odometry_error,
    bearing_jacobians,
    odometry_jacobians,
)

__all__ = [
    "solve",
    "gn_step",
    "predict_bearing",
    "predict_odometry",
    "bearing_error",
    "odometry_error",
    "bearing_jacobians",
    "odometry_jacobians",
]
