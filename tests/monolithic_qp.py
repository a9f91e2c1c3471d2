"""Independent dense QP oracle for cross-checking the OCP-structured solver.

Plays the role OSQP plays for the reference's golden files
(/root/reference/hpipm-cpp/test/osqp_gen.py:82-106): the same OCP-QP is
assembled as ONE monolithic dense QP over z = [x_1..x_N, u_0..u_{N-1}]
(x_0 eliminated) and solved with a plain textbook primal-dual interior
point method on the full KKT system in numpy f64 — no code shared with
the structured Riccati/IPM under test (dense LDL-style solves vs
stage-wise recursion).

    min 1/2 z'Hz + g'z   s.t.  E z = e  (dynamics),  l <= C z <= u
"""

from __future__ import annotations

import numpy as np


def solve_dense_qp(H, g, E, e, C, l, u, tol=1e-11, iters=100):
    """Two-sided-bound dense QP via primal-dual IPM. Returns (z, status)."""
    nz = H.shape[0]
    ne = E.shape[0]
    mc = C.shape[0]

    z = np.zeros(nz)
    y = np.zeros(ne)                       # equality multipliers
    sl = np.ones(mc)
    su = np.ones(mc)
    ll = np.ones(mc)
    lu = np.ones(mc)

    finite_l = np.isfinite(l)
    finite_u = np.isfinite(u)
    ll = ll * finite_l
    lu = lu * finite_u
    sl = np.where(finite_l, sl, 1.0)
    su = np.where(finite_u, su, 1.0)

    def residuals():
        v = C @ z
        r_stat = H @ z + g + E.T @ y + C.T @ (lu - ll)
        r_eq = E @ z - e
        r_l = np.where(finite_l, v - l - sl, 0.0)
        r_u = np.where(finite_u, u - v - su, 0.0)
        return r_stat, r_eq, r_l, r_u, v

    n_act = max(int(finite_l.sum() + finite_u.sum()), 1)

    for it in range(iters):
        r_stat, r_eq, r_l, r_u, v = residuals()
        mu = (ll @ sl + lu @ su) / n_act
        if (max(np.abs(r_stat).max(), np.abs(r_eq).max(),
                np.abs(r_l).max() if mc else 0.0,
                np.abs(r_u).max() if mc else 0.0, mu) < tol):
            return z, "optimal"

        inv_sl = np.where(finite_l, 1.0 / sl, 0.0)
        inv_su = np.where(finite_u, 1.0 / su, 0.0)
        W = ll * inv_sl + lu * inv_su

        def solve_newton(rc_l, rc_u):
            d = inv_sl * (rc_l + ll * r_l) - inv_su * (rc_u + lu * r_u)
            Haug = H + C.T @ (W[:, None] * C)
            KKT = np.block([[Haug, E.T], [E, np.zeros((ne, ne))]])
            rhs = -np.concatenate([r_stat + C.T @ d, r_eq])
            sol = np.linalg.solve(KKT, rhs)
            dz, dy = sol[:nz], sol[nz:]
            Cdz = C @ dz
            dsl = np.where(finite_l, Cdz + r_l, 0.0)
            dsu = np.where(finite_u, -Cdz + r_u, 0.0)
            dll = np.where(finite_l, -inv_sl * (rc_l + ll * dsl), 0.0)
            dlu = np.where(finite_u, -inv_su * (rc_u + lu * dsu), 0.0)
            return dz, dy, dsl, dsu, dll, dlu

        def max_step(val, dval, mask):
            neg = (dval < 0) & mask
            if not neg.any():
                return 1.0
            return min(1.0, np.min(-val[neg] / dval[neg]))

        # predictor
        d_aff = solve_newton(ll * sl, lu * su)
        a_aff = min(max_step(sl, d_aff[2], finite_l), max_step(su, d_aff[3], finite_u),
                    max_step(ll, d_aff[4], finite_l), max_step(lu, d_aff[5], finite_u))
        mu_aff = ((ll + a_aff * d_aff[4]) @ (sl + a_aff * d_aff[2])
                  + (lu + a_aff * d_aff[5]) @ (su + a_aff * d_aff[3])) / n_act
        sigma = min(1.0, max(0.0, (mu_aff / max(mu, 1e-30)) ** 3))

        # corrector
        rc_l = ll * sl + d_aff[4] * d_aff[2] - sigma * mu * finite_l
        rc_u = lu * su + d_aff[5] * d_aff[3] - sigma * mu * finite_u
        dz, dy, dsl, dsu, dll, dlu = solve_newton(rc_l, rc_u)

        tau = 0.995
        a_p = tau * min(max_step(sl, dsl, finite_l), max_step(su, dsu, finite_u))
        a_d = tau * min(max_step(ll, dll, finite_l), max_step(lu, dlu, finite_u))
        a = min(a_p, a_d)
        z += a * dz
        y += a * dy
        sl = np.where(finite_l, sl + a * dsl, 1.0)
        su = np.where(finite_u, su + a * dsu, 1.0)
        ll = np.where(finite_l, ll + a * dll, 0.0)
        lu = np.where(finite_u, lu + a * dlu, 0.0)

    return z, "max_iter"


def solve_ocp_qp_monolithic(A, B, b, Q, S, R, q, r, x0,
                            idxbx=(), lbx=None, ubx=None,
                            lbx_mask=None, ubx_mask=None,
                            idxbu=(), lbu=None, ubu=None,
                            lbu_mask=None, ubu_mask=None,
                            tol=1e-11):
    """Assemble the stage-wise OCP-QP as one dense QP and solve it.

    Shapes follow srbd_nmpc_tpu.ocpqp.data.OcpQp (numpy arrays). Returns
    (x [N+1,nx], u [N,nu]). Masked (mask==0) bounds become +-inf.
    """
    A, B, b = np.asarray(A), np.asarray(B), np.asarray(b)
    Q, S, R = np.asarray(Q), np.asarray(S), np.asarray(R)
    q, r = np.asarray(q), np.asarray(r)
    x0 = np.asarray(x0)
    N, nx, nu = A.shape[0], A.shape[1], B.shape[2]

    nz = N * nx + N * nu            # z = [x_1..x_N, u_0..u_{N-1}]
    xi = lambda i: slice((i - 1) * nx, i * nx)          # i in 1..N
    ui = lambda i: slice(N * nx + i * nu, N * nx + (i + 1) * nu)

    H = np.zeros((nz, nz))
    g = np.zeros(nz)
    for i in range(1, N):
        H[xi(i), xi(i)] += Q[i]
        g[xi(i)] += q[i]
    H[xi(N), xi(N)] += Q[N]
    g[xi(N)] += q[N]
    for i in range(N):
        H[ui(i), ui(i)] += R[i]
        g[ui(i)] += r[i]
        if i >= 1:
            H[ui(i), xi(i)] += S[i]
            H[xi(i), ui(i)] += S[i].T
    g[ui(0)] += S[0] @ x0

    E = np.zeros((N * nx, nz))
    e = np.zeros(N * nx)
    for i in range(N):
        row = slice(i * nx, (i + 1) * nx)
        E[row, xi(i + 1)] = -np.eye(nx)
        E[row, ui(i)] = B[i]
        if i >= 1:
            E[row, xi(i)] = A[i]
            e[row] = -b[i]
        else:
            e[row] = -(A[0] @ x0 + b[0])

    C_rows, C_lo, C_hi = [], [], []
    if idxbx:
        for i in range(1, N + 1):
            for j, comp in enumerate(idxbx):
                row = np.zeros(nz)
                row[xi(i).start + comp] = 1.0
                C_rows.append(row)
                ml = 1.0 if lbx_mask is None else lbx_mask[i, j]
                mu_ = 1.0 if ubx_mask is None else ubx_mask[i, j]
                C_lo.append(lbx[i, j] if ml > 0 else -np.inf)
                C_hi.append(ubx[i, j] if mu_ > 0 else np.inf)
    if idxbu:
        for i in range(N):
            for j, comp in enumerate(idxbu):
                row = np.zeros(nz)
                row[ui(i).start + comp] = 1.0
                C_rows.append(row)
                ml = 1.0 if lbu_mask is None else lbu_mask[i, j]
                mu_ = 1.0 if ubu_mask is None else ubu_mask[i, j]
                C_lo.append(lbu[i, j] if ml > 0 else -np.inf)
                C_hi.append(ubu[i, j] if mu_ > 0 else np.inf)

    C = np.stack(C_rows) if C_rows else np.zeros((0, nz))
    lo_v = np.asarray(C_lo) if C_lo else np.zeros(0)
    hi_v = np.asarray(C_hi) if C_hi else np.zeros(0)

    z, status = solve_dense_qp(H, g, E, e, C, lo_v, hi_v, tol=tol)
    assert status == "optimal", status

    x = np.zeros((N + 1, nx))
    u = np.zeros((N, nu))
    x[0] = x0
    for i in range(1, N + 1):
        x[i] = z[xi(i)]
    for i in range(N):
        u[i] = z[ui(i)]
    return x, u
