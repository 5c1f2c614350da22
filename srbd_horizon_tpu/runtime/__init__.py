from srbd_horizon_tpu.runtime.loop import MPCLoop, TickInput, TickOutput  # noqa: F401
