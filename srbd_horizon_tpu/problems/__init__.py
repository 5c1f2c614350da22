from srbd_horizon_tpu.problems.lip import LIPProblem, build_lip_problem  # noqa: F401
from srbd_horizon_tpu.problems.srbd import SRBDProblem, build_srbd_problem  # noqa: F401
