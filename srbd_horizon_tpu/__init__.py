"""srbd_horizon_tpu — TPU-native receding-horizon MPC for reduced-model legged
locomotion (SRBD / LIP), built on JAX / XLA / pjit.

A from-scratch re-design of the capabilities of `hucebot/srbd_horizon`
(reference: /root/reference) for TPU hardware:

- The reference drives CasADi symbolic graphs + a closed-source C++
  multiple-shooting DDP solver (`pyddp`) + IPOPT, one serial solve per tick.
  Here the same capability surface — problem construction, MS-DDP solving,
  gait scheduling, closed-loop MPC — is expressed as pure jittable functions
  over pytrees, batched with `vmap` and sharded with `shard_map` over device
  meshes, so thousands of MPC scenarios solve in parallel on the MXU.

Layout (mirrors SURVEY.md §7.2):
    math/      quaternion + small-matrix utilities
    models/    SRBD / LIP dynamics, robot constants (reference prb.py:97-109,317-319)
    ocp/       OCP spec: variable layouts, node-masked residual stacks,
               node-indexed parameter pytrees (reference prb.py + Horizon containers)
    solvers/   msddp — Gauss-Newton multiple-shooting DDP (reference ddp.py + pyddp)
               gnsqp — constrained GN-SQP/AL path (reference isrbd_example.py IPOPT path)
    wpg        walking-pattern generator as device-side tables (reference wpg.py)
    runtime/   closed-loop MPC tick, telemetry (reference *_example.py loops)
    parallel/  mesh construction, sharded batched solves
    io/        trajectory/telemetry export (reference viz.py/cartesio.py role)
"""

__version__ = "0.1.0"

from srbd_horizon_tpu import config as config  # noqa: F401
