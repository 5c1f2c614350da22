from srbd_horizon_tpu.io.telemetry import TelemetryRecorder  # noqa: F401
from srbd_horizon_tpu.io.cartesio import CartesianReferenceFormatter  # noqa: F401
