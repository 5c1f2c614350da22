from srbd_horizon_tpu.solvers.alddp import ALDDP, ALOptions, ALState  # noqa: F401
from srbd_horizon_tpu.solvers.diff import implicit_solve, unrolled_solve  # noqa: F401
from srbd_horizon_tpu.solvers.msddp import MSDDP, DDPSolution  # noqa: F401
