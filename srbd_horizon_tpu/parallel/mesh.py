"""Device-mesh distribution of batched MPC solves.

The reference is a single-threaded serial process (SURVEY.md §2.3 —
explicitly no parallelism of any kind); the distributed scenario sweep is a
new first-class capability of this framework: thousands of MPC instances
(varied gaits / terrain / initial states) solve in parallel across a TPU
slice.

Design (scaling-book recipe): one mesh axis `scenario` over all devices;
every batched array is sharded on its leading axis; the per-scenario solve
is `vmap`ped; `shard_map` places shards on devices so each chip runs its
slice of the batch with zero cross-chip traffic in the hot loop. Cross-chip
collectives (`psum`/`pmax` over ICI) appear only in the telemetry reduction
— mean cost / max defect over the fleet — mirroring how the reference pushes
metrics to ROS topics (SURVEY.md §5.8) but at pod scale.

Multi-host: call `jax.distributed.initialize()` before `make_mesh()`; the
mesh spans all processes' devices and `shard_map` handles DCN boundaries.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SCENARIO_AXIS = "scenario"


def make_mesh(devices=None, axis: str = SCENARIO_AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def shard_batch(mesh: Mesh, tree, axis: str = SCENARIO_AXIS):
    """Place every leaf's leading (batch) axis across the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def sharded_batched_solve(solver, mesh: Mesh, axis: str = SCENARIO_AXIS):
    """Batched MS-DDP solve, sharded over the scenario axis.

    Returns `f(sols, x0s, params_batch) -> (sols, metrics)` where metrics
    are globally reduced over ICI (psum/pmax inside shard_map)."""

    vsolve = jax.vmap(solver.solve)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P()),
        check_vma=False,
    )
    def _solve_shard(sols, x0s, params):
        out = vsolve(sols, x0s, params)
        n_total = jax.lax.psum(jnp.asarray(out.cost.shape[0], out.cost.dtype), axis)
        metrics = dict(
            mean_cost=jax.lax.psum(jnp.sum(out.cost), axis) / n_total,
            max_defect=jax.lax.pmax(jnp.max(out.defect_norm), axis),
            mean_iters=jax.lax.psum(
                jnp.sum(out.iterations.astype(out.cost.dtype)), axis
            ) / n_total,
            frac_converged=jax.lax.psum(
                jnp.sum(out.converged.astype(out.cost.dtype)), axis
            ) / n_total,
        )
        return out, metrics

    return jax.jit(_solve_shard)


def sharded_batched_tick(loop, mesh: Mesh, axis: str = SCENARIO_AXIS,
                         donate: bool = False):
    """One closed-loop MPC tick for a sharded scenario fleet.

    `f(carries, tick_inputs) -> (carries, outs, metrics)`; per-scenario
    state (sim state, plan, params, gait phase) stays resident on its chip
    across ticks — no host round-trips in the control loop.

    `donate=True` donates the carry (the previous tick's plan/params
    buffers are dead after the call — the same serving-loop donation the
    unsharded `MPCLoop.tick_batch` path uses; without it the sharded
    tick pays an extra device-side carry copy). Leave False when the
    caller reuses the input carry (e.g. equivalence tests)."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P()),
        check_vma=False,
    )
    def _tick_shard(carries, inps):
        # lane-major batched tick per shard (loop.tick_batch)
        carries, outs = loop.tick_batch(carries, inps)
        n_total = jax.lax.psum(
            jnp.asarray(outs.cost.shape[0], outs.cost.dtype), axis
        )
        metrics = dict(
            mean_cost=jax.lax.psum(jnp.sum(outs.cost), axis) / n_total,
            max_defect=jax.lax.pmax(jnp.max(outs.defect_norm), axis),
            max_srbd_residual=jax.lax.pmax(
                jnp.max(jnp.abs(outs.srbd_residual)), axis
            ),
        )
        return carries, outs, metrics

    return jax.jit(_tick_shard, donate_argnums=(0,) if donate else ())


def sharded_monitored_tick(loop, monitor, mesh: Mesh, x_safe,
                           axis: str = SCENARIO_AXIS):
    """`sharded_batched_tick` + the HealthMonitor recovery path: each
    shard classifies its members' tick telemetry and rebuilds unhealthy
    ones from `x_safe` in place; the metrics gain a globally-psum'd
    unhealthy-member count (runtime/health.py)."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P()),
        check_vma=False,
    )
    def _tick_shard(carries, inps):
        carries, outs, report = monitor.monitored_tick_batch(
            loop, carries, inps, x_safe
        )
        n_total = jax.lax.psum(
            jnp.asarray(outs.cost.shape[0], outs.cost.dtype), axis
        )
        metrics = dict(
            mean_cost=jax.lax.psum(jnp.sum(outs.cost), axis) / n_total,
            max_defect=jax.lax.pmax(jnp.max(outs.defect_norm), axis),
            max_srbd_residual=jax.lax.pmax(
                jnp.max(jnp.abs(outs.srbd_residual)), axis
            ),
            n_unhealthy=jax.lax.psum(
                jnp.sum((~report.healthy).astype(jnp.int32)), axis
            ),
        )
        return carries, outs, metrics

    return jax.jit(_tick_shard)


def sharded_constrained_tick(alddp, mesh: Mesh, axis: str = SCENARIO_AXIS):
    """One frozen-penalty AL outer tick for a sharded constrained fleet
    (the full-NLP isrbd serving path, ALDDP.solve_online_batch): each
    chip runs its shard's batched inner MS-DDP solve + multiplier update;
    the ICI collectives carry only the scalar feasibility telemetry.

    `f(al_states, x0s, params_batch) -> (al_states, metrics)`."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P()),
        check_vma=False,
    )
    def _tick_shard(st, x0s, params):
        st = alddp.solve_online_batch(st, x0s, params)
        cost = st.sol.cost
        n_total = jax.lax.psum(jnp.asarray(cost.shape[0], cost.dtype), axis)
        metrics = dict(
            mean_cost=jax.lax.psum(jnp.sum(cost), axis) / n_total,
            max_viol=jax.lax.pmax(jnp.max(st.viol), axis),
            max_defect=jax.lax.pmax(jnp.max(st.sol.defect_norm), axis),
        )
        return st, metrics

    return jax.jit(_tick_shard)


def sharded_serving_tick(alddp, mesh: Mesh, outers: int = 2,
                         axis: str = SCENARIO_AXIS, donate: bool = False):
    """The production constrained serving tick
    (ALDDP.serving_tick_batch — shifted warm start + `outers`
    frozen-penalty updates, BENCH_NOTES.md round 4) under shard_map:
    each chip serves its shard; ICI carries only scalar feasibility
    telemetry. `f(al_states, x0s, params_batch) -> (al_states, metrics)`."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P()),
        check_vma=False,
    )
    def _tick_shard(st, x0s, params):
        st = alddp.serving_tick_batch(st, x0s, params, outers=outers)
        cost = st.sol.cost
        n_total = jax.lax.psum(jnp.asarray(cost.shape[0], cost.dtype), axis)
        metrics = dict(
            mean_cost=jax.lax.psum(jnp.sum(cost), axis) / n_total,
            max_viol=jax.lax.pmax(jnp.max(st.viol), axis),
            max_defect=jax.lax.pmax(jnp.max(st.sol.defect_norm), axis),
        )
        return st, metrics

    # donate=True: serving-loop donation of the AL state (see
    # sharded_batched_tick) — leave False when the caller reuses it
    return jax.jit(_tick_shard, donate_argnums=(0,) if donate else ())


def replicate_params(params: Dict[str, jnp.ndarray], batch: int):
    """Tile a problem's parameter pytree along a new scenario axis."""
    return jax.tree.map(
        lambda a: jnp.tile(a[None], (batch,) + (1,) * a.ndim), params
    )
