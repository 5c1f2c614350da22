"""Independent NumPy float64 DDP oracle for golden-trajectory parity
(SURVEY.md §4: "golden-trajectory parity vs an independent CPU reference
implementation ... a NumPy MS-DDP oracle").

Everything here is written from the REFERENCE equations (prb.py /
ddp.py), not from the framework code: LIP dynamics and cost stacks are
re-derived independently, Jacobians are finite differences, the solver is
a plain single-shooting iLQR with the same 1e6 equality penalty and Armijo
backtracking. Agreement between this and solvers/msddp.py is evidence that
both transcribe the same optimal control problem and find the same
optimum; they share no code.
"""

import numpy as np

G = 9.81
ETA2 = G / 0.88
FD_EPS = 1e-6


class LIPOracleProblem:
    """The reference LIP OCP (prb.py:248-441) in plain NumPy, nc=4."""

    def __init__(self, com, feet, ns=20, dt=0.05):
        self.com = np.asarray(com, float)
        self.feet = np.asarray(feet, float)
        self.ns, self.dt = ns, dt
        self.nc = 4
        self.nx, self.nu = 30, 15
        # gains (prb.py:359-363)
        self.w_r = np.sqrt(1e3)
        self.w_rdot = np.sqrt(1e4)
        self.w_zmp = np.sqrt(1e3)
        self.w_rel = np.sqrt(1e4)
        self.w_qddot = 1.0
        self.penalty = 1e6  # ddp.py:181
        self.d1 = self.feet[2, :2] - self.feet[0, :2]
        self.d2 = self.feet[3, :2] - self.feet[1, :2]
        # params
        self.rdot_ref = np.zeros((ns + 1, 3))
        self.c_ref = np.tile(self.feet[:, 2], (ns + 1, 1))
        self.cdot_switch = np.ones((ns + 1, 4))

    # state: [r(3), c0..c3(12), rdot(3), cdot0..3(12)]; input: [z(3), cddot(12)]
    def xdot(self, x, u):
        r = x[0:3]
        rdot = x[15:18]
        cdot = x[18:30]
        z = u[0:3]
        cddot = u[3:15]
        rddot = ETA2 * (r - z) - np.array([0.0, 0.0, G])
        return np.concatenate([rdot, cdot, rddot, cddot])

    def step(self, x, u):
        return x + self.dt * self.xdot(x, u)  # EULER, ddp.py:228-230

    def residuals(self, x, u, n):
        """Stage cost residuals at node n (prb.py:390-402)."""
        r = x[0:3]
        c = x[3:15].reshape(4, 3)
        rdot = x[15:18]
        z = u[0:3]
        cddot = u[3:15]
        centroid = c.mean(axis=0)
        mt = 1.0 if n >= 1 else 0.0
        rddot = ETA2 * (r - z) - np.array([0.0, 0.0, G])
        res = [
            mt * self.w_r * (r[2] - self.com[2]),
            mt * self.w_r * (r[0] - centroid[0]),
            mt * self.w_r * (r[1] - centroid[1]),
            *(mt * self.w_rdot * (rdot - self.rdot_ref[n])),
            *(self.w_zmp * (z - centroid)),
            mt * self.w_rel * (-c[0, 1] + c[2, 1] - self.d1[1]),
            mt * self.w_rel * (-c[0, 0] + c[2, 0] - self.d1[0]),
            mt * self.w_rel * (-c[1, 1] + c[3, 1] - self.d2[1]),
            mt * self.w_rel * (-c[1, 0] + c[3, 0] - self.d2[0]),
            *(self.w_qddot * rddot),
            *(self.w_qddot * cddot),
        ]
        # equality constraints with sqrt(1e6) weight (ddp.py:190-196):
        cdot = x[18:30].reshape(4, 3)
        sp = np.sqrt(self.penalty)
        res += [sp * (cdot[0, 0] - cdot[1, 0]), sp * (cdot[0, 1] - cdot[1, 1])]
        res += [sp * (cdot[2, 0] - cdot[3, 0]), sp * (cdot[2, 1] - cdot[3, 1])]
        for i in range(4):
            res.append(sp * (c[i, 2] - self.c_ref[n, i]))
        for i in range(4):
            res.append(sp * self.cdot_switch[n, i] * cdot[i, 0])
            res.append(sp * self.cdot_switch[n, i] * cdot[i, 1])
        return np.asarray(res)

    def terminal_residuals(self, x):
        """Terminal cost (no penalty — ddp.py:216-226)."""
        n = self.ns
        r = x[0:3]
        c = x[3:15].reshape(4, 3)
        rdot = x[15:18]
        centroid = c.mean(axis=0)
        return np.asarray([
            self.w_r * (r[2] - self.com[2]),
            self.w_r * (r[0] - centroid[0]),
            self.w_r * (r[1] - centroid[1]),
            *(self.w_rdot * (rdot - self.rdot_ref[n])),
            self.w_rel * (-c[0, 1] + c[2, 1] - self.d1[1]),
            self.w_rel * (-c[0, 0] + c[2, 0] - self.d1[0]),
            self.w_rel * (-c[1, 1] + c[3, 1] - self.d2[1]),
            self.w_rel * (-c[1, 0] + c[3, 0] - self.d2[0]),
        ])

    def initial_state(self):
        return np.concatenate([self.com, self.feet.reshape(-1), np.zeros(15)])


def _fd_jac(f, x, eps=FD_EPS):
    y0 = f(x)
    J = np.zeros((y0.size, x.size))
    for i in range(x.size):
        xp = x.copy()
        xp[i] += eps
        xm = x.copy()
        xm[i] -= eps
        J[:, i] = (f(xp) - f(xm)) / (2 * eps)
    return J


def solve_ilqr(prob, x0, iters=80, mu=1e-6, U0=None):
    """Plain single-shooting iLQR with GN quadratics and Armijo
    backtracking — independent implementation of the MS-DDP capability.
    U0 optionally seeds the input trajectory (static-input warm start)."""
    ns, nx, nu = prob.ns, prob.nx, prob.nu
    U = np.zeros((ns, nu)) if U0 is None else np.tile(np.asarray(U0, float), (ns, 1))

    def rollout(U):
        X = [x0]
        for n in range(ns):
            X.append(prob.step(X[-1], U[n]))
        return np.asarray(X)

    def total_cost(X, U):
        c = sum(
            float(prob.residuals(X[n], U[n], n) @ prob.residuals(X[n], U[n], n))
            for n in range(ns)
        )
        rt = prob.terminal_residuals(X[ns])
        return c + float(rt @ rt)

    X = rollout(U)
    cost = total_cost(X, U)
    for _ in range(iters):
        # linearize
        As, Bs, lxs, lus, lxxs, luus, luxs = [], [], [], [], [], [], []
        for n in range(ns):
            x, u = X[n], U[n]
            As.append(_fd_jac(lambda xx: prob.step(xx, u), x))
            Bs.append(_fd_jac(lambda uu: prob.step(x, uu), u))
            rho = prob.residuals(x, u, n)
            Jx = _fd_jac(lambda xx: prob.residuals(xx, u, n), x)
            Ju = _fd_jac(lambda uu: prob.residuals(x, uu, n), u)
            lxs.append(2 * Jx.T @ rho)
            lus.append(2 * Ju.T @ rho)
            lxxs.append(2 * Jx.T @ Jx)
            luus.append(2 * Ju.T @ Ju)
            luxs.append(2 * Ju.T @ Jx)
        rt = prob.terminal_residuals(X[ns])
        Jt = _fd_jac(prob.terminal_residuals, X[ns])
        Vx = 2 * Jt.T @ rt
        Vxx = 2 * Jt.T @ Jt
        # backward
        ks, Ks = [None] * ns, [None] * ns
        for n in range(ns - 1, -1, -1):
            A, B = As[n], Bs[n]
            Qx = lxs[n] + A.T @ Vx
            Qu = lus[n] + B.T @ Vx
            Qxx = lxxs[n] + A.T @ Vxx @ A
            Quu = luus[n] + B.T @ Vxx @ B + mu * np.eye(nu)
            Qux = luxs[n] + B.T @ Vxx @ A
            iQ = np.linalg.inv(Quu)
            k = -iQ @ Qu
            K = -iQ @ Qux
            Vx = Qx + K.T @ Quu @ k + K.T @ Qu + Qux.T @ k
            Vxx = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
            Vxx = 0.5 * (Vxx + Vxx.T)
            ks[n], Ks[n] = k, K
        # forward with backtracking
        improved = False
        alpha = 1.0
        for _ls in range(12):
            Xn = [x0]
            Un = np.zeros_like(U)
            for n in range(ns):
                dx = Xn[n] - X[n]
                Un[n] = U[n] + alpha * ks[n] + Ks[n] @ dx
                Xn.append(prob.step(Xn[n], Un[n]))
            Xn = np.asarray(Xn)
            cn = total_cost(Xn, Un)
            if cn < cost - 1e-12 * max(cost, 1.0):
                X, U, cost = Xn, Un, cn
                improved = True
                break
            alpha *= 0.5
        if not improved:
            break
    return X, U, cost


class SRBDOracleProblem:
    """The reference SRBD OCP (prb.py:16-246) in plain NumPy, nc=4 —
    quaternion base orientation, per-contact forces (kN after the
    force_scaling=1000 of prb.py:98-99), Newton–Euler dynamics."""

    def __init__(self, m, inertia, com, feet, ns=20, dt=0.05):
        self.m = float(m)
        self.I = np.asarray(inertia, float)
        self.com = np.asarray(com, float)
        self.feet = np.asarray(feet, float)
        self.ns, self.dt = ns, dt
        self.fs = 1000.0
        self.nx, self.nu = 37, 24
        self.w_r = np.sqrt(1e3)
        self.w_rdot = np.sqrt(1e4)
        self.w_w = np.sqrt(1e4)
        self.w_rel = np.sqrt(1e4)
        self.w_qddot = 1.0
        self.w_minf = self.fs * np.sqrt(1e-2)
        self.w_fsw = self.fs * np.sqrt(1e2)
        self.otg = 1e1          # orientation_tracking_gain default (prb.py:144)
        self.penalty = 1e6
        self.d1 = self.feet[2, :2] - self.feet[0, :2]
        self.d2 = self.feet[3, :2] - self.feet[1, :2]
        self.rdot_ref = np.zeros((ns + 1, 3))
        self.w_ref = np.zeros((ns + 1, 3))
        self.oref = np.tile([0.0, 0.0, 0.0, 1.0], (ns + 1, 1))  # inverse of identity
        self.c_ref = np.tile(self.feet[:, 2], (ns + 1, 1))
        self.cdot_switch = np.ones((ns + 1, 4))

    @staticmethod
    def _quat_to_rot(q):
        from oracles import quat_to_rot_np
        return quat_to_rot_np(q)

    @staticmethod
    def _quat_prod(p, q):
        from oracles import quat_product_np
        return quat_product_np(p, q)

    def _accels(self, x, u):
        o = x[3:7]
        r = x[0:3]
        c = x[7:19].reshape(4, 3)
        w = x[22:25]
        ui = u.reshape(4, 6)
        f = ui[:, 3:6]
        R = self._quat_to_rot(o)
        Iw = R @ (self.I / self.fs) @ R.T
        ms = self.m / self.fs
        g = np.array([0.0, 0.0, -G])
        rddot = f.sum(axis=0) / ms + g
        tau = np.cross(c - r, f).sum(axis=0)
        wdot = np.linalg.solve(Iw, tau - np.cross(w, Iw @ w))
        return rddot, wdot

    def xdot(self, x, u):
        o = x[3:7]
        rdot = x[19:22]
        w = x[22:25]
        cdot = x[25:37]
        ui = u.reshape(4, 6)
        cddot = ui[:, 0:3]
        rddot, wdot = self._accels(x, u)
        wq = np.array([w[0], w[1], w[2], 0.0])
        odot = 0.5 * self._quat_prod(wq, o)
        return np.concatenate([rdot, odot, cdot, rddot, wdot,
                               cddot.reshape(-1)])

    def step(self, x, u):
        return x + self.dt * self.xdot(x, u)

    def residuals(self, x, u, n):
        r = x[0:3]
        o = x[3:7]
        c = x[7:19].reshape(4, 3)
        rdot = x[19:22]
        w = x[22:25]
        cdot = x[25:37].reshape(4, 3)
        ui = u.reshape(4, 6)
        cddot = ui[:, 0:3]
        f = ui[:, 3:6]
        mt = 1.0 if n >= 1 else 0.0
        qerr = self._quat_prod(o, self.oref[n])
        rddot, wdot = self._accels(x, u)
        res = [
            mt * self.w_r * (r[2] - self.com[2]),
            *(mt * self.otg * qerr[:3]),
            mt * self.otg * (qerr[3] - 1.0),
            *(mt * self.w_rdot * (rdot - self.rdot_ref[n])),
            *(mt * self.w_w * (w - self.w_ref[n])),
            mt * self.w_rel * (-c[0, 1] + c[2, 1] - self.d1[1]),
            mt * self.w_rel * (-c[0, 0] + c[2, 0] - self.d1[0]),
            mt * self.w_rel * (-c[1, 1] + c[3, 1] - self.d2[1]),
            mt * self.w_rel * (-c[1, 0] + c[3, 0] - self.d2[0]),
            *(self.w_qddot * rddot),
            *(self.w_qddot * wdot),
            *(self.w_qddot * cddot.reshape(-1)),
            *(self.w_minf * f.reshape(-1)),
            *((self.w_fsw * (1.0 - self.cdot_switch[n])[:, None] * f).reshape(-1)),
        ]
        sp = np.sqrt(self.penalty)
        res += [sp * (cdot[0, 0] - cdot[1, 0]), sp * (cdot[0, 1] - cdot[1, 1])]
        res += [sp * (cdot[2, 0] - cdot[3, 0]), sp * (cdot[2, 1] - cdot[3, 1])]
        for i in range(4):
            res.append(sp * (c[i, 2] - self.c_ref[n, i]))
        for i in range(4):
            res.append(sp * self.cdot_switch[n, i] * cdot[i, 0])
            res.append(sp * self.cdot_switch[n, i] * cdot[i, 1])
        return np.asarray(res)

    def terminal_residuals(self, x):
        n = self.ns
        r = x[0:3]
        o = x[3:7]
        c = x[7:19].reshape(4, 3)
        rdot = x[19:22]
        w = x[22:25]
        qerr = self._quat_prod(o, self.oref[n])
        return np.asarray([
            self.w_r * (r[2] - self.com[2]),
            *(self.otg * qerr[:3]),
            self.otg * (qerr[3] - 1.0),
            *(self.w_rdot * (rdot - self.rdot_ref[n])),
            *(self.w_w * (w - self.w_ref[n])),
            self.w_rel * (-c[0, 1] + c[2, 1] - self.d1[1]),
            self.w_rel * (-c[0, 0] + c[2, 0] - self.d1[0]),
            self.w_rel * (-c[1, 1] + c[3, 1] - self.d2[1]),
            self.w_rel * (-c[1, 0] + c[3, 0] - self.d2[0]),
        ])

    def initial_state(self):
        return np.concatenate([
            self.com, [0, 0, 0, 1], self.feet.reshape(-1), np.zeros(18),
        ])

    def static_input(self):
        per = np.array([0, 0, 0, 0, 0, self.m * G / self.fs / 4])
        return np.tile(per, 4)
