"""SRBD walking OCP — TPU-native rebuild of `SRBDProblem.createSRBDProblem`
(reference prb.py:16-246).

Capability parity map (reference file:line → here):
  state/input layout      prb.py:32-68     → layouts below (nx=13+6nc, nu=6nc)
  dynamics                prb.py:97-109    → models.srbd.srbd_xdot
                          (force_scaling=1000 applied as in prb.py:98-99)
  cost residuals          prb.py:184-204   → _stage_residual/_terminal_residual
  constraints             prb.py:166-181   → _stage_eq
  friction cones          prb.py:172-177   → stage_ineq (constructed but NOT
                          activated, exactly like the reference's
                          commented-out createIntermediateConstraint)
  parameters              prb.py:71-75,143-144,157-163,185-186 → params
  getInitialState         prb.py:224-240   → SRBDProblem.initial_state
  getStaticInput          prb.py:242-246   → SRBDProblem.static_input
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax.numpy as jnp
import numpy as np

from srbd_horizon_tpu.config import SRBDConfig
import jax

from srbd_horizon_tpu.math.linalg import spd_inverse
from srbd_horizon_tpu.math.quat import (
    quat_inverse,
    quat_product,
    skew,
    solve3x3,
)
from srbd_horizon_tpu.models import srbd as srbd_model
from srbd_horizon_tpu.models.kangaroo import RobotConstants
from srbd_horizon_tpu.ocp import integrators
from srbd_horizon_tpu.ocp.layout import VarLayout
from srbd_horizon_tpu.ocp.spec import OCP, node_mask


@dataclasses.dataclass(frozen=True)
class SRBDProblem:
    """Built problem + the handles the reference stores (prb.py:206-222)."""

    ocp: OCP
    initial_state: jnp.ndarray
    static_input: jnp.ndarray
    com: jnp.ndarray
    initial_foot_position: jnp.ndarray
    inertia: jnp.ndarray
    mass: float
    force_scaling: float
    nc: int
    contact_model: int

    def rddot_wdot(self, x, u):
        """The reference's RDDOT/WDOT probe functions (prb.py:101-102),
        used for the runtime SRBD-residual telemetry
        (dsrbd_example.py:163-167)."""
        s = srbd_model.split_srbd_state(x, self.nc)
        i = srbd_model.split_srbd_input(u, self.nc)
        I_w = srbd_model.world_inertia(
            jnp.asarray(self.inertia) / self.force_scaling, s["o"]
        )
        return srbd_model.f_srbd(
            self.mass / self.force_scaling, I_w, i["f"], s["r"], s["c"], s["w"]
        )


def _layouts(nc: int):
    state_entries = [("r", 3), ("o", 4)]
    state_entries += [(f"c{i}", 3) for i in range(nc)]
    state_entries += [("rdot", 3), ("w", 3)]
    state_entries += [(f"cdot{i}", 3) for i in range(nc)]
    input_entries = []
    for i in range(nc):
        input_entries += [(f"cddot{i}", 3), (f"f{i}", 3)]
    return VarLayout(state_entries), VarLayout(input_entries)


def linearized_friction_cone_rows(mu: float) -> np.ndarray:
    """Row matrix A with A f ≤ 0 inside the linearized cone (5 faces:
    ±x, ±y pyramid and unilaterality). Mirrors Horizon's
    `linearized_friction_cone(f, mu, R)` with R = identity
    (prb.py:174-176, isrbd_example.py:316-318)."""
    mu_lin = mu / np.sqrt(2.0)
    return np.array(
        [
            [1.0, 0.0, -mu_lin],
            [-1.0, 0.0, -mu_lin],
            [0.0, 1.0, -mu_lin],
            [0.0, -1.0, -mu_lin],
            [0.0, 0.0, -1.0],
        ]
    )


def build_srbd_problem(
    cfg: SRBDConfig, robot: RobotConstants, dtype=None,
    integrator: str = "EULER",
) -> SRBDProblem:
    dtype = dtype or cfg.dtype
    ns, nc, cm = cfg.ns, cfg.nc, cfg.contact_model
    fs = cfg.force_scaling
    state_layout, input_layout = _layouts(nc)

    com = jnp.asarray(robot.com, dtype)
    feet0 = jnp.asarray(robot.foot_positions, dtype)
    inertia = jnp.asarray(robot.inertia, dtype)
    m = float(robot.mass)
    constants = dict(
        m_scaled=m / fs,
        inertia_scaled=inertia / fs,
        com=com,
        feet0=feet0,
        m=m,
        inertia=inertia,
        force_scaling=fs,
    )

    d1 = feet0[cm, :2] - feet0[0, :2]          # prb.py:153
    d2 = feet0[nc - 1, :2] - feet0[cm - 1, :2]  # prb.py:154

    # python-float weights: numpy f64 scalars are strong types under
    # jax x64 and would promote f32 residuals to f64
    sq = lambda g: float(np.sqrt(g))
    w_r = sq(cfg.r_tracking_gain)
    w_rdot = sq(cfg.rdot_tracking_gain)
    w_w = sq(cfg.w_tracking_gain)
    w_rel = sq(cfg.rel_position_gain)
    w_qddot = sq(cfg.min_qddot_gain)
    w_minf = fs * sq(cfg.min_f_gain)            # prb.py:202
    w_fswitch = fs * sq(cfg.force_switch_weight)  # prb.py:203

    def split(x, u):
        return (
            srbd_model.split_srbd_state(x, nc),
            srbd_model.split_srbd_input(u, nc),
        )

    def _accels(s, i):
        """(rddot, wdot) from fSRBD with scaled mass/inertia (prb.py:98-104)."""
        I_world = srbd_model.world_inertia(constants["inertia_scaled"], s["o"])
        return srbd_model.f_srbd(
            constants["m_scaled"], I_world, i["f"], s["r"], s["c"], s["w"]
        )

    def stage_residual(x, u, p):
        s, i = split(x, u)
        mt = p["mask_track"][0]
        otg = p["orientation_tracking_gain"][0]  # raw gain, prb.py:188-189
        qerr = quat_product(s["o"], p["oref"])   # o ⊗ oref (oref stores the inverse)
        rddot, wdot = _accels(s, i)
        qddot = jnp.concatenate([rddot, wdot, i["cddot"].reshape(-1)])
        res = [
            mt * w_r * (s["r"][2:3] - com[2]),                    # rz_tracking prb.py:184
            mt * otg * qerr[:3],                                  # o_tracking_xyz prb.py:188
            mt * otg * (qerr[3:4] - 1.0),                         # o_tracking_w prb.py:189
            mt * w_rdot * (s["rdot"] - p["rdot_ref"]),            # rdot_tracking prb.py:190
            mt * w_w * (s["w"] - p["w_ref"]),                     # w_tracking prb.py:191
            mt * w_rel * (-s["c"][0, 1] + s["c"][cm, 1] - d1[1])[None],
            mt * w_rel * (-s["c"][0, 0] + s["c"][cm, 0] - d1[0])[None],
            mt * w_rel * (-s["c"][cm - 1, 1] + s["c"][nc - 1, 1] - d2[1])[None],
            mt * w_rel * (-s["c"][cm - 1, 0] + s["c"][nc - 1, 0] - d2[0])[None],
            w_qddot * qddot,                                      # min_qddot prb.py:200
            (w_minf * i["f"]).reshape(-1),                        # min_f prb.py:202
            (w_fswitch * (1.0 - p["cdot_switch"])[:, None] * i["f"]).reshape(-1),
        ]
        return jnp.concatenate(res)

    def terminal_residual(x, p):
        s = srbd_model.split_srbd_state(x, nc)
        otg = p["orientation_tracking_gain"][0]
        qerr = quat_product(s["o"], p["oref"])
        res = [
            w_r * (s["r"][2:3] - com[2]),
            otg * qerr[:3],
            otg * (qerr[3:4] - 1.0),
            w_rdot * (s["rdot"] - p["rdot_ref"]),
            w_w * (s["w"] - p["w_ref"]),
            w_rel * (-s["c"][0, 1] + s["c"][cm, 1] - d1[1])[None],
            w_rel * (-s["c"][0, 0] + s["c"][cm, 0] - d1[0])[None],
            w_rel * (-s["c"][cm - 1, 1] + s["c"][nc - 1, 1] - d2[1])[None],
            w_rel * (-s["c"][cm - 1, 0] + s["c"][nc - 1, 0] - d2[0])[None],
        ]
        return jnp.concatenate(res)

    def stage_eq(x, u, p):
        """relative_vel (prb.py:166-170), cz_tracking, cdotxy_tracking
        (prb.py:179-181) — all state-only, active on every node."""
        del u
        s = srbd_model.split_srbd_state(x, nc)
        res = []
        for leg in range(cfg.number_of_legs):
            base = leg * cm
            for i in range(1, cm):
                res.append(s["cdot"][base, :2] - s["cdot"][base + i, :2])
        res.append(s["c"][:, 2] - p["c_ref"])
        res.append((p["cdot_switch"][:, None] * s["cdot"][:, :2]).reshape(-1))
        return jnp.concatenate(res)

    def terminal_eq(x, p):
        return stage_eq(x, None, p)

    # friction cones: constructed but not active, matching prb.py:172-177
    A_fc = jnp.asarray(
        linearized_friction_cone_rows(cfg.friction_cone_coefficient), dtype
    )

    def stage_ineq(x, u, p):
        del p
        _, i = split(x, u)
        return (i["f"] @ A_fc.T).reshape(-1)  # (nc*5,) rows ≤ 0 inside cone

    xdot = lambda x, u, p: srbd_model.srbd_xdot(x, u, constants)
    # EULER for DDP-path parity (ddp.py:228-230); RK2/RK4 selectable
    step = integrators.BY_NAME[integrator](xdot)

    # ---- closed-form stage linearization (the DDP fast path) ----------
    # Only ∂ẇ/∂o goes through AD (4 tangents through the angular dynamics:
    # the o-dependence enters via R(o) I Rᵀ and has no tidy closed form);
    # every other Jacobian block is hand-derived. The reference gets its
    # derivatives from CasADi's symbolic jacobians of the same expressions
    # (prb.py:97-109,184-204 via pyddp); jacfwd over the full stage stack
    # costs nx+nu=61 tangent passes per node — this path replaces them.
    i_c = 7
    i_rdot = 7 + 3 * nc
    i_w = 10 + 3 * nc
    i_cdot = 13 + 3 * nc
    nx_ = 13 + 6 * nc
    nu_ = 6 * nc
    n_legs = cfg.number_of_legs

    def stage_jacobians(x, u, p, dt):
        s, i_in = split(x, u)
        dty = x.dtype
        I3 = jnp.eye(3, dtype=dty)
        m_s = constants["m_scaled"]
        r, o, w, c, f = s["r"], s["o"], s["w"], s["c"], i_in["f"]

        # shared angular-dynamics blocks: ẇ = I_w⁻¹(τ − w×I_w w),
        # τ = Σ(cᵢ−r)×fᵢ,  I_w = R(o) I Rᵀ
        I_world = srbd_model.world_inertia(constants["inertia_scaled"], o)
        iIw = spd_inverse(I_world)
        f_tot = jnp.sum(f, axis=0)
        dwdot_dr = iIw @ skew(f_tot)                       # d τ/dr = [Σf]ₓ
        dwdot_dw = iIw @ (skew(I_world @ w) - skew(w) @ I_world)
        dwdot_dc = -jnp.einsum("ij,kjl->kil", iIw, skew(f))   # (nc,3,3)
        dwdot_df = jnp.einsum("ij,kjl->kil", iIw, skew(c - r[None]))

        def wdot_of_o(o_):
            Iw_ = srbd_model.world_inertia(constants["inertia_scaled"], o_)
            tau = jnp.sum(jnp.cross(c - r[None], f), axis=0)
            return solve3x3(Iw_, tau - jnp.cross(w, Iw_ @ w))

        dwdot_do = jax.jacfwd(wdot_of_o)(o)                # (3, 4)

        # ȯ = ½ ω̂⊗o blocks: vec = o_w·w + w×o_v, scalar = −w·o_v
        ov, ow = o[:3], o[3]
        do_do = 0.5 * jnp.concatenate(
            [
                jnp.concatenate([skew(w), w[:, None]], axis=1),
                jnp.concatenate([-w[None, :], jnp.zeros((1, 1), dty)], axis=1),
            ],
            axis=0,
        )                                                  # (4, 4)
        do_dw = 0.5 * jnp.concatenate(
            [ow * I3 - skew(ov), -ov[None, :]], axis=0
        )                                                  # (4, 3)

        # ---- continuous-dynamics Jacobians, then Euler composition ----
        Jxd = jnp.zeros((nx_, nx_), dty)
        Jxd = Jxd.at[0:3, i_rdot : i_rdot + 3].set(I3)
        Jxd = Jxd.at[3:7, 3:7].set(do_do)
        Jxd = Jxd.at[3:7, i_w : i_w + 3].set(do_dw)
        Jxd = Jxd.at[i_c : i_c + 3 * nc, i_cdot : i_cdot + 3 * nc].set(
            jnp.eye(3 * nc, dtype=dty)
        )
        Jxd = Jxd.at[i_w : i_w + 3, 0:3].set(dwdot_dr)
        Jxd = Jxd.at[i_w : i_w + 3, 3:7].set(dwdot_do)
        Jxd = Jxd.at[i_w : i_w + 3, i_c : i_c + 3 * nc].set(
            dwdot_dc.transpose(1, 0, 2).reshape(3, 3 * nc)
        )
        Jxd = Jxd.at[i_w : i_w + 3, i_w : i_w + 3].set(dwdot_dw)

        Jud = jnp.zeros((nx_, nu_), dty)
        Jud = Jud.at[i_w : i_w + 3, :].set(
            jnp.concatenate(
                [
                    jnp.concatenate(
                        [jnp.zeros((3, 3), dty), dwdot_df[k]], axis=1
                    )
                    for k in range(nc)
                ],
                axis=1,
            )
        )
        for k in range(nc):
            Jud = Jud.at[i_rdot : i_rdot + 3, 6 * k + 3 : 6 * k + 6].set(I3 / m_s)
            Jud = Jud.at[i_cdot + 3 * k : i_cdot + 3 * k + 3, 6 * k : 6 * k + 3].set(I3)

        A = jnp.eye(nx_, dtype=dty) + dt * Jxd
        Bm = dt * Jud

        # ---- stage_residual Jacobian (row order = stage_residual) ----
        mt = p["mask_track"][0]
        otg = p["orientation_tracking_gain"][0]
        qv, qw = p["oref"][:3], p["oref"][3]
        # qerr = o⊗oref is linear in o: ∂qerr/∂o = [[qw·I−[qv]ₓ, qv], [−qvᵀ, qw]]
        Rq = jnp.concatenate(
            [
                jnp.concatenate([qw * I3 - skew(qv), qv[:, None]], axis=1),
                jnp.concatenate([-qv[None, :], qw[None, None]], axis=1),
            ],
            axis=0,
        )

        nr_ = 21 + 9 * nc   # 15 fixed + qddot(6+3nc) + min_f(3nc) + fswitch(3nc)
        Jrx = jnp.zeros((nr_, nx_), dty)
        Jru = jnp.zeros((nr_, nu_), dty)
        Jrx = Jrx.at[0, 2].set(mt * w_r)
        Jrx = Jrx.at[1:5, 3:7].set(mt * otg * Rq)
        Jrx = Jrx.at[5:8, i_rdot : i_rdot + 3].set(mt * w_rdot * I3)
        Jrx = Jrx.at[8:11, i_w : i_w + 3].set(mt * w_w * I3)
        wrel = mt * w_rel
        Jrx = Jrx.at[11, i_c + 1].set(-wrel)
        Jrx = Jrx.at[11, i_c + 3 * cm + 1].set(wrel)
        Jrx = Jrx.at[12, i_c + 0].set(-wrel)
        Jrx = Jrx.at[12, i_c + 3 * cm + 0].set(wrel)
        Jrx = Jrx.at[13, i_c + 3 * (cm - 1) + 1].set(-wrel)
        Jrx = Jrx.at[13, i_c + 3 * (nc - 1) + 1].set(wrel)
        Jrx = Jrx.at[14, i_c + 3 * (cm - 1) + 0].set(-wrel)
        Jrx = Jrx.at[14, i_c + 3 * (nc - 1) + 0].set(wrel)
        # min_qddot rows 15:21+3nc — qddot = [rddot, wdot, cddot]
        Jrx = Jrx.at[18:21, 0:3].set(w_qddot * dwdot_dr)
        Jrx = Jrx.at[18:21, 3:7].set(w_qddot * dwdot_do)
        Jrx = Jrx.at[18:21, i_c : i_c + 3 * nc].set(
            w_qddot * dwdot_dc.transpose(1, 0, 2).reshape(3, 3 * nc)
        )
        Jrx = Jrx.at[18:21, i_w : i_w + 3].set(w_qddot * dwdot_dw)
        i_mf = 21 + 3 * nc
        for k in range(nc):
            fcol = slice(6 * k + 3, 6 * k + 6)
            Jru = Jru.at[15:18, fcol].set(w_qddot / m_s * I3)
            Jru = Jru.at[18:21, fcol].set(w_qddot * dwdot_df[k])
            Jru = Jru.at[21 + 3 * k : 24 + 3 * k, 6 * k : 6 * k + 3].set(
                w_qddot * I3
            )
            Jru = Jru.at[i_mf + 3 * k : i_mf + 3 * k + 3, fcol].set(w_minf * I3)
            Jru = Jru.at[
                i_mf + 3 * nc + 3 * k : i_mf + 3 * nc + 3 * k + 3, fcol
            ].set(w_fswitch * (1.0 - p["cdot_switch"][k]) * I3)

        # ---- stage_eq Jacobian (row order = stage_eq) ----
        nh_ = 2 * n_legs * (cm - 1) + nc + 2 * nc
        Jhx = jnp.zeros((nh_, nx_), dty)
        Jhu = jnp.zeros((nh_, nu_), dty)
        row = 0
        for leg in range(n_legs):
            base = leg * cm
            for i in range(1, cm):
                for ax in (0, 1):
                    Jhx = Jhx.at[row, i_cdot + 3 * base + ax].set(1.0)
                    Jhx = Jhx.at[row, i_cdot + 3 * (base + i) + ax].set(-1.0)
                    row += 1
        for k in range(nc):
            Jhx = Jhx.at[row + k, i_c + 3 * k + 2].set(1.0)
        row += nc
        for k in range(nc):
            for ax in (0, 1):
                Jhx = Jhx.at[row, i_cdot + 3 * k + ax].set(p["cdot_switch"][k])
                row += 1
        return A, Bm, Jrx, Jru, Jhx, Jhu

    params: Dict[str, jnp.ndarray] = {
        "rdot_ref": jnp.zeros((ns + 1, 3), dtype),                # prb.py:71,74
        "w_ref": jnp.zeros((ns + 1, 3), dtype),                   # prb.py:72,75
        "orientation_tracking_gain": jnp.full((ns + 1, 1), 1e1, dtype),  # prb.py:143-144
        "oref": jnp.tile(
            quat_inverse(jnp.array([0.0, 0.0, 0.0, 1.0], dtype)), (ns + 1, 1)
        ),                                                        # prb.py:185-186
        "c_ref": jnp.tile(feet0[:, 2], (ns + 1, 1)),              # prb.py:160-161
        "cdot_switch": jnp.ones((ns + 1, nc), dtype),             # prb.py:162-163
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
        stage_ineq=stage_ineq,
        ineq_ub=jnp.zeros(nc * 5, dtype),
        ineq_lb=jnp.full((nc * 5,), -jnp.inf, dtype),
        # the closed-form A/B composition assumes the Euler step
        stage_jacobians=(
            stage_jacobians if integrator.upper() == "EULER" else None
        ),
        # stacked-row sparsity ([residual(57); eq(16)] for nc=4):
        #   x-rows: rz/o/rdot/w/rel (0:15), wdot (18:21), all eq rows
        #   u-rows: rddot/wdot/cddot/min_f/fswitch (15:57)
        residual_x_rows=tuple(
            list(range(15)) + [18, 19, 20]
            + list(range(21 + 9 * nc, 21 + 9 * nc + 2 * n_legs * (cm - 1) + 3 * nc))
        ),
        residual_u_rows=tuple(range(15, 21 + 9 * nc)),
        # Euler A−I live rows: ṙ (r rows), ȯ (o rows), ċ (c rows), ẇ (w
        # rows); rdot/cdot rows are exactly identity (their derivatives are
        # pure inputs). B live rows: rdot (forces/m), w (torques), cdot
        # (cddot) — r/o/c rows of B are exactly zero under Euler.
        dynamics_x_rows=tuple(
            list(range(0, i_rdot)) + list(range(i_w, i_w + 3))
        ),
        dynamics_u_rows=tuple(range(i_rdot, nx_)),
        params=params,
        constants=constants,
    )

    # getInitialState (prb.py:224-240): com, identity quat, feet, zero vels
    x0 = jnp.concatenate(
        [
            com,
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype),
            feet0.reshape(-1),
            jnp.zeros(6 + 3 * nc, dtype),
        ]
    )
    # getStaticInput (prb.py:242-246): zero accels, weight/nc upward per contact
    per_contact = jnp.concatenate(
        [
            jnp.zeros(3, dtype),
            jnp.array([0.0, 0.0, m * 9.81 / fs / nc], dtype),
        ]
    )
    u0 = jnp.tile(per_contact, nc)

    return SRBDProblem(
        ocp=ocp,
        initial_state=x0,
        static_input=u0,
        com=com,
        initial_foot_position=feet0,
        inertia=inertia,
        mass=m,
        force_scaling=fs,
        nc=nc,
        contact_model=cm,
    )
