"""Worker process for the 2-process distributed CPU test
(tests/test_distributed.py). Launched with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID set; each process owns 4 virtual CPU
devices, the global scenario mesh spans all 8, and one sharded MPC tick
runs with psum/pmax-reduced fleet metrics over the process boundary —
the DCN-role code path of parallel/multihost.py (SURVEY.md §5.8)."""

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# share the suite's persistent compilation cache (tests/conftest.py):
# both workers compile the same sharded tick — the second one (and
# every re-run) hits the disk cache instead of recompiling
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("SRBD_XLA_CACHE", "/tmp/srbd_horizon_xla_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from srbd_horizon_tpu.config import DDPOptions, SRBDConfig  # noqa: E402
from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet  # noqa: E402
from srbd_horizon_tpu.parallel.mesh import (  # noqa: E402
    make_mesh, sharded_batched_tick,
)
from srbd_horizon_tpu.parallel.multihost import (  # noqa: E402
    ensure_initialized, fleet_info, local_batch_slice, shard_global_batch,
)
from srbd_horizon_tpu.problems.srbd import build_srbd_problem  # noqa: E402
from srbd_horizon_tpu.runtime.loop import MPCLoop, TickInput  # noqa: E402
from srbd_horizon_tpu.solvers.msddp import MSDDP  # noqa: E402
from srbd_horizon_tpu.wpg import WalkingPatternGenerator  # noqa: E402

GLOBAL_BATCH = 16


def build_loop(dtype=jnp.float32):
    cfg = SRBDConfig(dtype=dtype)
    prob = build_srbd_problem(cfg, kangaroo_line_feet())
    solver = MSDDP(
        prob.ocp,
        DDPOptions(max_iters=3, alpha_converge_threshold=1e-12, beta=1e-3),
    )
    wpg = WalkingPatternGenerator.build(0.0, cfg.ns, dtype=dtype)
    return prob, MPCLoop(
        solver=solver, wpg=wpg, srbd_constants=prob.ocp.constants
    )


def global_inputs(prob, dtype=jnp.float32):
    """Deterministic global fleet data — every process derives the same
    full batch and keeps only its slice."""
    rng = np.random.RandomState(42)
    x0 = np.tile(np.asarray(prob.initial_state)[None], (GLOBAL_BATCH, 1))
    x0 = (x0 + 0.01 * rng.randn(*x0.shape)).astype(np.float32)
    inp = TickInput(
        action=np.ones(GLOBAL_BATCH, np.int32),
        rdot_ref=np.tile(
            np.array([0.2, 0.0, 0.0], np.float32)[None], (GLOBAL_BATCH, 1)
        ),
        w_ref=np.zeros((GLOBAL_BATCH, 3), np.float32),
    )
    return x0, inp


def main(out_path: str):
    active = ensure_initialized()
    info = fleet_info()
    prob, loop = build_loop()
    mesh = make_mesh()

    x0_np, inp_np = global_inputs(prob)
    sl = local_batch_slice(GLOBAL_BATCH)
    carries_local = jax.vmap(loop.init)(jnp.asarray(x0_np[sl]))
    carries = shard_global_batch(
        mesh, jax.tree.map(np.asarray, carries_local)
    )
    inp = shard_global_batch(
        mesh, jax.tree.map(lambda a: a[sl], inp_np)
    )

    tick = sharded_batched_tick(loop, mesh)
    carries, outs, metrics = tick(carries, inp)
    # second tick exercises the warm-started path across the boundary too
    carries, outs, metrics = tick(carries, inp)

    # constrained (AL/isrbd) serving tick across the same cross-process
    # mesh: the full-NLP fleet path's psum'd feasibility telemetry must
    # agree between processes too (parallel.mesh.sharded_serving_tick)
    import dataclasses

    from srbd_horizon_tpu.parallel.mesh import sharded_serving_tick
    from srbd_horizon_tpu.problems.isrbd import build_isrbd_problem
    from srbd_horizon_tpu.solvers.alddp import ALDDP
    from srbd_horizon_tpu.solvers.options import al_serving_options

    cfg = SRBDConfig(ns=5, dtype=jnp.float32)
    iprob = build_isrbd_problem(cfg, kangaroo_line_feet())
    ddp_on, al_on = al_serving_options(max_iters=1)
    al_on = dataclasses.replace(al_on, rho0=al_on.rho_max)
    alddp = ALDDP(iprob.ocp, ddp_opts=ddp_on, al_opts=al_on)
    ix0 = np.tile(np.asarray(iprob.initial_state)[None], (GLOBAL_BATCH, 1))
    iU0 = jnp.tile(iprob.static_input[None], (iprob.ocp.ns, 1))
    ist_local = jax.vmap(lambda x: alddp.init(x, U0=iU0))(
        jnp.asarray(ix0[sl])
    )
    iparams_local = jax.tree.map(
        lambda a: jnp.tile(a[None], (sl.stop - sl.start,) + (1,) * a.ndim),
        iprob.ocp.params,
    )
    ist = shard_global_batch(mesh, jax.tree.map(np.asarray, ist_local))
    ix0_s = shard_global_batch(mesh, ix0[sl])
    iparams = shard_global_batch(
        mesh, jax.tree.map(np.asarray, iparams_local)
    )
    ctick = sharded_serving_tick(alddp, mesh)
    ist, imetrics = ctick(ist, ix0_s, iparams)

    result = dict(
        distributed=bool(active),
        **info,
        mean_cost=float(metrics["mean_cost"]),
        max_defect=float(metrics["max_defect"]),
        max_srbd_residual=float(metrics["max_srbd_residual"]),
        constrained_max_viol=float(imetrics["max_viol"]),
        constrained_mean_cost=float(imetrics["mean_cost"]),
        local_x_finite=bool(
            np.all(np.isfinite(
                np.concatenate([np.asarray(s.data) for s in
                                carries.x.addressable_shards])
            ))
        ),
    )
    pathlib.Path(out_path).write_text(json.dumps(result))
    print("worker done:", result)


if __name__ == "__main__":
    main(sys.argv[1])
