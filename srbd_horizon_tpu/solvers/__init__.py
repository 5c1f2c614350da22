from srbd_horizon_tpu.solvers.msddp import MSDDP, DDPSolution  # noqa: F401
