from srbd_horizon_tpu.models import kangaroo as kangaroo  # noqa: F401
from srbd_horizon_tpu.models import lip as lip  # noqa: F401
from srbd_horizon_tpu.models import srbd as srbd  # noqa: F401
