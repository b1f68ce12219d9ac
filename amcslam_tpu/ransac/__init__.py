from . import sim3_solver, vel_ransac  # noqa: F401
