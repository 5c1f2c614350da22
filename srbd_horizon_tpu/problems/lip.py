"""LIP walking OCP — TPU-native rebuild of `LIPProblem.createLIPProblem`
(reference prb.py:248-441).

Capability parity map (reference file:line → here):
  state/input layout      prb.py:264-295   → layouts below (nx=6+6nc, nu=3+3nc)
  dynamics                prb.py:317-329   → models.lip.lip_xdot
  cost residuals          prb.py:390-402   → _stage_residual/_terminal_residual
  constraints             prb.py:379-387   → _stage_eq
  parameters              prb.py:298-299,370-376 → params template
  getInitialState         prb.py:420-434   → LIPProblem.initial_state
  getStaticInput          prb.py:436-441   → LIPProblem.static_input
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax.numpy as jnp
import numpy as np

from srbd_horizon_tpu.config import SRBDConfig
from srbd_horizon_tpu.models import lip as lip_model
from srbd_horizon_tpu.models.kangaroo import RobotConstants
from srbd_horizon_tpu.ocp import integrators
from srbd_horizon_tpu.ocp.layout import VarLayout
from srbd_horizon_tpu.ocp.spec import OCP, node_mask


@dataclasses.dataclass(frozen=True)
class LIPProblem:
    """Built problem: the OCP plus the handles the reference stores on the
    LIPProblem object (prb.py:404-415)."""

    ocp: OCP
    initial_state: jnp.ndarray
    static_input: jnp.ndarray
    com: jnp.ndarray
    initial_foot_position: jnp.ndarray  # (nc, 3)
    nc: int
    contact_model: int


def _layouts(nc: int):
    state_entries = [("r", 3)]
    state_entries += [(f"c{i}", 3) for i in range(nc)]
    state_entries += [("rdot", 3)]
    state_entries += [(f"cdot{i}", 3) for i in range(nc)]
    input_entries = [("z", 3)] + [(f"cddot{i}", 3) for i in range(nc)]
    return VarLayout(state_entries), VarLayout(input_entries)


def build_lip_problem(
    cfg: SRBDConfig, robot: RobotConstants, dtype=None,
    integrator: str = "EULER",
) -> LIPProblem:
    dtype = dtype or cfg.dtype
    ns, nc, cm = cfg.ns, cfg.nc, cfg.contact_model
    state_layout, input_layout = _layouts(nc)

    com = jnp.asarray(robot.com, dtype)
    feet0 = jnp.asarray(robot.foot_positions, dtype)
    eta2 = cfg.eta2

    # relative-feet nominal offsets (prb.py:365-367): pairs (0,cm) and
    # (cm-1, nc-1) generalize the reference's hardwired (0,2) and (1,3)
    # for contact_model=2, number_of_legs=2.
    d1 = feet0[cm, :2] - feet0[0, :2]
    d2 = feet0[nc - 1, :2] - feet0[cm - 1, :2]

    # python-float weights: numpy f64 scalars are strong types under
    # jax x64 and would promote f32 residuals to f64
    sq = lambda g: float(np.sqrt(g))
    w_r = sq(cfg.r_tracking_gain)
    w_rdot = sq(cfg.rdot_tracking_gain)
    w_zmp = sq(cfg.zmp_tracking_gain)
    w_rel = sq(cfg.rel_position_gain)
    w_qddot = sq(cfg.min_qddot_gain)

    def split(x, u):
        s = lip_model.split_lip_state(x, nc)
        i = lip_model.split_lip_input(u, nc)
        return s, i

    def _qddot(s, i):
        """The qddot aggregate the reference minimizes (prb.py:323-325,402):
        [rddot(r, z), cddot_0..cddot_{nc-1}]."""
        rddot = lip_model.lip_rddot(s["r"], i["z"], eta2)
        return jnp.concatenate([rddot, i["cddot"].reshape(-1)])

    def stage_residual(x, u, p):
        s, i = split(x, u)
        mt = p["mask_track"][0]  # 0 at node 0, 1 on nodes 1..ns (prb.py:390)
        centroid = jnp.mean(s["c"], axis=0)
        res = [
            mt * w_r * (s["r"][2:3] - com[2]),                      # rz_tracking  prb.py:390
            mt * w_r * (s["r"][:2] - centroid[:2]),                 # rxy_tracking prb.py:391
            mt * w_rdot * (s["rdot"] - p["rdot_ref"]),              # rdot_tracking prb.py:392
            w_zmp * (i["z"] - centroid),                            # zmp_tracking prb.py:393
            mt * w_rel * (-s["c"][0, 1] + s["c"][cm, 1] - d1[1])[None],   # rel_pos_y_1_4 prb.py:394
            mt * w_rel * (-s["c"][0, 0] + s["c"][cm, 0] - d1[0])[None],   # rel_pos_x_1_4 prb.py:396
            mt * w_rel * (-s["c"][cm - 1, 1] + s["c"][nc - 1, 1] - d2[1])[None],  # rel_pos_y_3_6
            mt * w_rel * (-s["c"][cm - 1, 0] + s["c"][nc - 1, 0] - d2[0])[None],  # rel_pos_x_3_6
            w_qddot * _qddot(s, i),                                 # min_qddot   prb.py:402
        ]
        return jnp.concatenate(res)

    def terminal_residual(x, p):
        s = lip_model.split_lip_state(x, nc)
        centroid = jnp.mean(s["c"], axis=0)
        res = [
            w_r * (s["r"][2:3] - com[2]),
            w_r * (s["r"][:2] - centroid[:2]),
            w_rdot * (s["rdot"] - p["rdot_ref"]),
            w_rel * (-s["c"][0, 1] + s["c"][cm, 1] - d1[1])[None],
            w_rel * (-s["c"][0, 0] + s["c"][cm, 0] - d1[0])[None],
            w_rel * (-s["c"][cm - 1, 1] + s["c"][nc - 1, 1] - d2[1])[None],
            w_rel * (-s["c"][cm - 1, 0] + s["c"][nc - 1, 0] - d2[0])[None],
        ]
        return jnp.concatenate(res)

    def stage_eq(x, u, p):
        """Equality constraints (state-only, active on every node):
        relative_vel (prb.py:379-383), cz_tracking, cdotxy_tracking
        (prb.py:385-387)."""
        del u
        s = lip_model.split_lip_state(x, nc)
        res = []
        for leg in range(cfg.number_of_legs):
            base = leg * cm
            for i in range(1, cm):
                res.append(s["cdot"][base, :2] - s["cdot"][base + i, :2])
        res.append(s["c"][:, 2] - p["c_ref"])                      # cz_tracking
        res.append((p["cdot_switch"][:, None] * s["cdot"][:, :2]).reshape(-1))
        return jnp.concatenate(res)

    def terminal_eq(x, p):
        return stage_eq(x, None, p)

    xdot = lambda x, u, p: lip_model.lip_xdot(x, u, eta2=eta2)
    # EULER for DDP-path parity (ddp.py:228-230); RK2/RK4 selectable
    step = integrators.BY_NAME[integrator](xdot)

    params: Dict[str, jnp.ndarray] = {
        "rdot_ref": jnp.zeros((ns + 1, 3), dtype),                     # prb.py:298-299
        "c_ref": jnp.tile(feet0[:, 2], (ns + 1, 1)),                   # prb.py:373-374
        "cdot_switch": jnp.ones((ns + 1, nc), dtype),                  # prb.py:375-376
        "mask_track": node_mask(ns, 1, ns + 1, dtype)[:, None],
    }

    ocp = OCP(
        ns=ns,
        dt=cfg.dt,
        state_layout=state_layout,
        input_layout=input_layout,
        step=step,
        xdot=xdot,
        stage_residual=stage_residual,
        terminal_residual=terminal_residual,
        stage_eq=stage_eq,
        terminal_eq=terminal_eq,
        params=params,
        constants=dict(com=com, feet0=feet0, eta2=eta2, m=robot.mass),
    )

    # getInitialState (prb.py:420-434): com, feet, zero velocities
    x0 = jnp.concatenate(
        [com, feet0.reshape(-1), jnp.zeros(3, dtype), jnp.zeros(3 * nc, dtype)]
    )
    # getStaticInput (prb.py:436-441): ZMP at CoM xy, zero accelerations
    u0 = jnp.concatenate(
        [jnp.array([com[0], com[1], 0.0], dtype), jnp.zeros(3 * nc, dtype)]
    )

    return LIPProblem(
        ocp=ocp,
        initial_state=x0,
        static_input=u0,
        com=com,
        initial_foot_position=feet0,
        nc=nc,
        contact_model=cm,
    )
