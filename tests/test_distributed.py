"""Real 2-process distributed validation (VERDICT missing #4): a
coordinator + 2 workers on CPU, `jax.distributed.initialize` through
`ensure_initialized`, a global scenario mesh spanning both processes'
devices, and sharded MPC ticks whose psum/pmax fleet metrics cross the
process boundary. The metrics must agree between the two processes (same
global reduction) and with a single-process run of the identical global
fleet — executing the multihost.py branch that a single-process suite
can never reach (multihost.py:39-44)."""

import json
import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
WORKER = REPO / "tests" / "_distributed_worker.py"


def _free_tcp_port():
    s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
class TestTwoProcessDistributed:
    def test_two_process_mesh_matches_single_process(self, tmp_path):
        port = _free_tcp_port()
        procs, outs = [], []
        for pid in range(2):
            out = tmp_path / f"worker{pid}.json"
            outs.append(out)
            env = dict(os.environ)
            env.pop("XLA_FLAGS", None)
            env.update(
                JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                JAX_NUM_PROCESSES="2",
                JAX_PROCESS_ID=str(pid),
            )
            procs.append(subprocess.Popen(
                [sys.executable, str(WORKER), str(out)],
                env=env, cwd=str(REPO),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            ))
        logs = [p.communicate(timeout=600)[0] for p in procs]
        for p, log in zip(procs, logs):
            assert p.returncode == 0, log[-3000:]

        r0 = json.loads(outs[0].read_text())
        r1 = json.loads(outs[1].read_text())

        # the distributed branch actually executed
        assert r0["distributed"] and r1["distributed"]
        assert r0["process_count"] == 2 and r1["process_count"] == 2
        assert r0["global_devices"] == 8
        assert r0["local_devices"] == 4
        assert r0["local_x_finite"] and r1["local_x_finite"]

        # psum/pmax metrics are GLOBAL: both processes see identical values
        # (including the constrained serving tick's feasibility telemetry)
        for k in ("mean_cost", "max_defect", "max_srbd_residual",
                  "constrained_max_viol", "constrained_mean_cost"):
            np.testing.assert_allclose(r0[k], r1[k], rtol=1e-6)

        # and they equal the same fleet solved in one process
        sys.path.insert(0, str(REPO / "tests"))
        import _distributed_worker as w
        import jax
        import jax.numpy as jnp
        from srbd_horizon_tpu.parallel.mesh import (
            make_mesh, shard_batch, sharded_batched_tick,
        )

        prob, loop = w.build_loop(dtype=jnp.float32)
        mesh = make_mesh()
        x0_np, inp_np = w.global_inputs(prob)
        carries = jax.vmap(loop.init)(jnp.asarray(x0_np))
        carries = shard_batch(mesh, carries)
        inp = shard_batch(mesh, jax.tree.map(jnp.asarray, inp_np))
        tick = sharded_batched_tick(loop, mesh)
        carries, outs_t, metrics = tick(carries, inp)
        carries, outs_t, metrics = tick(carries, inp)

        np.testing.assert_allclose(
            r0["mean_cost"], float(metrics["mean_cost"]), rtol=2e-5
        )
        np.testing.assert_allclose(
            r0["max_defect"], float(metrics["max_defect"]), atol=1e-6
        )
        np.testing.assert_allclose(
            r0["max_srbd_residual"], float(metrics["max_srbd_residual"]),
            rtol=2e-5, atol=1e-6,
        )
