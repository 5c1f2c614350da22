from srbd_horizon_tpu.math import quat as quat  # noqa: F401
from srbd_horizon_tpu.math.quat import (  # noqa: F401
    quat_product,
    quat_inverse,
    quat_to_rot,
    quat_derivative_world,
    quat_normalize,
    skew,
)
