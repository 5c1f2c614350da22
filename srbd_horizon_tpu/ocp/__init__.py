from srbd_horizon_tpu.ocp.layout import VarLayout  # noqa: F401
from srbd_horizon_tpu.ocp.spec import OCP  # noqa: F401
from srbd_horizon_tpu.ocp.scaling import auto_eq_scale  # noqa: F401
from srbd_horizon_tpu.ocp import integrators as integrators  # noqa: F401
