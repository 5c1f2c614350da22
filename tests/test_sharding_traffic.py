"""Multi-chip scaling story, verified at the HLO level.

The scenario-parallel design claim (parallel/mesh.py docstring; the
scaling-book recipe): each device runs its slice of the fleet with ZERO
cross-device traffic in the hot loop — the only collectives are the
scalar telemetry reductions (mean cost / max defect / residual psums).
If that holds, fleet throughput scales linearly in devices by
construction (no ICI bandwidth term, no exposed collective latency
beyond one scalar all-reduce per tick).

Rather than trusting the docstring, these tests compile the sharded tick
over an 8-device mesh and inspect the optimized HLO: every collective op
(all-reduce / all-gather / all-to-all / collective-permute /
reduce-scatter) must have a tiny (scalar-metric-sized) result. A change
that accidentally introduces a sharding mismatch — e.g. a resharding
all-gather of the trajectory state — fails the test with the offending
op named.
"""

import re

import jax
import jax.numpy as jnp
import pytest

from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
from srbd_horizon_tpu.problems.srbd import build_srbd_problem
from srbd_horizon_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    sharded_batched_solve,
    sharded_batched_tick,
)
from srbd_horizon_tpu.runtime.loop import MPCLoop, TickInput
from srbd_horizon_tpu.solvers.msddp import MSDDP
from srbd_horizon_tpu.wpg import WalkingPatternGenerator

COLLECTIVES = re.compile(
    r"\b(all-reduce|all-gather|all-to-all|collective-permute|"
    r"reduce-scatter)\b"
)
SHAPE = re.compile(r"\b(?:f64|f32|bf16|f16|s32|u32|s64|u64|pred)\[([\d,]*)\]")

# scalar metrics may be tuple-combined by XLA's all-reduce combiner; a
# generous bound that still catches any per-member array (the smallest
# trajectory leaf in these tests has ns*nx = 5*37 = 185 elements PER
# member before sharding)
MAX_COLLECTIVE_ELEMS = 64


def _collective_result_sizes(hlo_text: str):
    """(op line, max element count among shapes on that line) for every
    collective op in the optimized HLO."""
    out = []
    for line in hlo_text.splitlines():
        if COLLECTIVES.search(line) and "=" in line:
            sizes = []
            for dims in SHAPE.findall(line):
                n = 1
                for d in filter(None, dims.split(",")):
                    n *= int(d)
                sizes.append(n)
            out.append((line.strip(), max(sizes) if sizes else 0))
    return out


def _build(ns=5, dtype=jnp.float32):
    cfg = SRBDConfig(ns=ns, dtype=dtype)
    prob = build_srbd_problem(cfg, kangaroo_line_feet())
    solver = MSDDP(
        prob.ocp,
        DDPOptions(max_iters=3, alpha_converge_threshold=1e-12, beta=1e-3),
    )
    wpg = WalkingPatternGenerator.build(c_init_z=0.0, nodes=ns, dtype=dtype)
    loop = MPCLoop(solver=solver, wpg=wpg, srbd_constants=prob.ocp.constants)
    return cfg, prob, solver, loop


@pytest.fixture(scope="module")
def fleet():
    if jax.device_count() < 8:
        pytest.skip("needs 8 (virtual) devices")
    cfg, prob, solver, loop = _build()
    mesh = make_mesh(jax.devices()[:8])
    B = 16
    x0 = jnp.tile(prob.initial_state[None], (B, 1)).astype(jnp.float32)
    carries = shard_batch(mesh, jax.vmap(loop.init)(x0))
    inp = TickInput(
        action=jnp.ones(B, jnp.int32),
        rdot_ref=jnp.tile(
            jnp.array([0.2, 0.0, 0.0], jnp.float32)[None], (B, 1)
        ),
        w_ref=jnp.zeros((B, 3), jnp.float32),
    )
    inp = shard_batch(mesh, inp)
    return cfg, prob, solver, loop, mesh, carries, inp, x0


class TestHotLoopTraffic:
    def test_tick_collectives_are_scalar_only(self, fleet):
        _, _, _, loop, mesh, carries, inp, _ = fleet
        tick = sharded_batched_tick(loop, mesh)
        hlo = tick.lower(carries, inp).compile().as_text()
        sizes = _collective_result_sizes(hlo)
        assert sizes, "expected the scalar telemetry psums to be present"
        offenders = [
            (line, n) for line, n in sizes if n > MAX_COLLECTIVE_ELEMS
        ]
        assert not offenders, (
            "non-scalar cross-device traffic in the hot loop:\n"
            + "\n".join(f"  [{n} elems] {line}" for line, n in offenders)
        )

    def test_solve_collectives_are_scalar_only(self, fleet):
        _, prob, solver, _, mesh, _, _, x0 = fleet
        B = x0.shape[0]
        params = jax.tree.map(
            lambda a: jnp.tile(a[None], (B,) + (1,) * a.ndim),
            prob.ocp.params,
        )
        sols = jax.vmap(solver.init)(x0)
        sols, x0s, params = (
            shard_batch(mesh, sols),
            shard_batch(mesh, x0),
            shard_batch(mesh, params),
        )
        solve = sharded_batched_solve(solver, mesh)
        hlo = solve.lower(sols, x0s, params).compile().as_text()
        offenders = [
            (line, n)
            for line, n in _collective_result_sizes(hlo)
            if n > MAX_COLLECTIVE_ELEMS
        ]
        assert not offenders, (
            "non-scalar cross-device traffic in the sharded solve:\n"
            + "\n".join(f"  [{n} elems] {line}" for line, n in offenders)
        )

    def test_tick_executes_and_metrics_are_replicated(self, fleet):
        """The scalar metrics come back fully replicated (P() out-spec) and
        finite — the cross-device reduction actually ran."""
        _, _, _, loop, mesh, carries, inp, _ = fleet
        tick = sharded_batched_tick(loop, mesh)
        carries, outs, metrics = tick(carries, inp)
        assert bool(jnp.isfinite(metrics["mean_cost"]))
        assert float(metrics["max_defect"]) < 1e-3
        # executing a second tick keeps state device-resident (no error,
        # same shardings)
        carries, outs, metrics2 = tick(carries, inp)
        assert bool(jnp.isfinite(metrics2["mean_cost"]))
