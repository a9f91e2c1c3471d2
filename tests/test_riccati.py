"""Riccati LQR solver vs an independent numpy textbook recursion.

Replicates the single most important reference test: the analytic-Riccati
oracle in hpipm-cpp/test/ocp_qp_ipm_solver.cpp:22-110 (random 20-stage QP,
nx=5 nu=3, all of x/u/pi/P/p/K/k checked to 1e-10).
"""

import jax
import jax.numpy as jnp
import numpy as np

from srbd_nmpc_tpu.ocpqp.data import unconstrained_qp
from srbd_nmpc_tpu.ops.riccati import kkt_residuals, lqr_solve

RNG = np.random.default_rng(42)


def random_qp(N=20, nx=5, nu=3, dtype=np.float64, seed=1234):
    """Random strictly-convex OCP-QP, built as the reference test builds one
    (PSD Hessians via H @ H.T + positive diagonal bump on R). Deterministic
    per (args, seed) so tests don't couple through shared RNG state."""
    rng = np.random.default_rng(seed + 1000 * N + nx)
    A = rng.uniform(-1, 1, size=(N, nx, nx))
    B = rng.uniform(-1, 1, size=(N, nx, nu))
    b = rng.uniform(-1, 1, size=(N, nx))
    Q = np.zeros((N + 1, nx, nx))
    S = np.zeros((N, nu, nx))
    R = np.zeros((N, nu, nu))
    q = rng.uniform(-1, 1, size=(N + 1, nx))
    r = rng.uniform(-1, 1, size=(N, nu))
    for i in range(N):
        H = rng.uniform(-1, 1, size=(nx + nu, nx + nu))
        HH = H @ H.T
        Q[i] = HH[nu:, nu:]
        S[i] = HH[:nu, nu:]
        R[i] = HH[:nu, :nu] + np.diag(np.abs(rng.uniform(-1, 1, size=nu))) + 0.1 * np.eye(nu)
    Hn = rng.uniform(-1, 1, size=(nx, nx))
    Q[N] = Hn @ Hn.T
    return unconstrained_qp(*[jnp.asarray(a, dtype) for a in (A, B, b, Q, S, R, q, r)])


def numpy_riccati(qp, x0):
    """Independent oracle: the exact recursion from
    hpipm-cpp/test/ocp_qp_ipm_solver.cpp:61-91 in plain numpy (s = -p)."""
    A, B, b = np.asarray(qp.A), np.asarray(qp.B), np.asarray(qp.b)
    Q, S, R = np.asarray(qp.Q), np.asarray(qp.S), np.asarray(qp.R)
    q, r = np.asarray(qp.q), np.asarray(qp.r)
    N, nx, nu = A.shape[0], A.shape[1], B.shape[2]
    P = [None] * (N + 1)
    s = [None] * (N + 1)
    K = [None] * N
    k = [None] * N
    P[N] = Q[N]
    s[N] = -q[N]
    for i in range(N - 1, -1, -1):
        F = Q[i] + A[i].T @ P[i + 1] @ A[i]
        H = S[i] + B[i].T @ P[i + 1] @ A[i]
        G = R[i] + B[i].T @ P[i + 1] @ B[i]
        Ginv = np.linalg.inv(G)
        K[i] = -Ginv @ H
        k[i] = -Ginv @ (B[i].T @ P[i + 1] @ b[i] - B[i].T @ s[i + 1] + r[i])
        P[i] = F - K[i].T @ G @ K[i]
        s[i] = A[i].T @ (s[i + 1] - P[i + 1] @ b[i]) - q[i] - H.T @ k[i]
    x = [x0]
    u = []
    for i in range(N):
        u.append(K[i] @ x[i] + k[i])
        x.append(A[i] @ x[i] + B[i] @ u[i] + b[i])
    lmd = [P[i] @ x[i] - s[i] for i in range(N + 1)]
    return (np.stack(x), np.stack(u), np.stack(lmd), np.stack(P),
            -np.stack(s), np.stack(K), np.stack(k))


class TestLqrVsOracle:
    def test_full_solution_surface(self):
        qp = random_qp()
        x0 = jnp.asarray(np.random.default_rng(5).uniform(-1, 1, size=5))
        sol = jax.jit(lqr_solve)(qp, x0)
        x, u, pi, P, p, K, k = numpy_riccati(qp, np.asarray(x0))
        prec = 1e-10
        np.testing.assert_allclose(sol.x, x, atol=prec)
        np.testing.assert_allclose(sol.u, u, atol=prec)
        np.testing.assert_allclose(sol.pi, pi, atol=prec)
        np.testing.assert_allclose(sol.P, P, atol=prec)
        np.testing.assert_allclose(sol.p, p, atol=prec)
        np.testing.assert_allclose(sol.K, K, atol=prec)
        np.testing.assert_allclose(sol.k, k, atol=prec)

    def test_kkt_residuals_vanish(self):
        qp = random_qp(N=12)
        x0 = jnp.asarray(np.random.default_rng(5).uniform(-1, 1, size=5))
        sol = lqr_solve(qp, x0)
        r_dyn, r_sx, r_su = kkt_residuals(qp, sol.x, sol.u, sol.pi)
        assert float(jnp.max(jnp.abs(r_dyn))) < 1e-11
        assert float(jnp.max(jnp.abs(r_sx))) < 1e-9
        assert float(jnp.max(jnp.abs(r_su))) < 1e-9

    def test_batched_vmap(self):
        qp = random_qp(N=8)
        x0s = jnp.asarray(np.random.default_rng(6).uniform(-1, 1, size=(32, 5)))
        sols = jax.vmap(lambda x0: lqr_solve(qp, x0))(x0s)
        assert sols.x.shape == (32, 9, 5)
        one = lqr_solve(qp, x0s[11])
        np.testing.assert_allclose(sols.x[11], one.x, atol=1e-12)
        np.testing.assert_allclose(sols.u[11], one.u, atol=1e-12)

    def test_f32_with_refinement_ill_conditioned(self):
        """On an NMPC-like badly scaled QP (terminal weight ~1e3, input
        weight ~1e-4 — cf. Qf = N*diag(Qf_read) vs R = 1e-4 I in
        NMPC_solver.cpp:55-58), f32 + refinement must recover most of the
        accuracy plain f32 loses.  This is the mechanism that lets TPU f32
        match the f64 reference tolerances."""
        qp64 = random_qp(N=20)
        qp64 = type(qp64)(
            A=qp64.A, B=qp64.B, b=qp64.b,
            Q=qp64.Q.at[-1].multiply(1e3), S=qp64.S * 0.0, R=qp64.R * 1e-4,
            q=qp64.q, r=qp64.r,
        )
        x0 = np.random.default_rng(7).uniform(-1, 1, size=5)
        qp32 = jax.tree.map(lambda a: a.astype(jnp.float32), qp64)
        x032 = jnp.asarray(x0, jnp.float32)

        def err(sol):
            """f64-ground-truth control error."""
            ref = lqr_solve(qp64, jnp.asarray(x0))
            return float(jnp.max(jnp.abs(jnp.asarray(np.asarray(sol.u), jnp.float64) - ref.u)))

        plain = err(lqr_solve(qp32, x032))
        refined = err(lqr_solve(qp32, x032, refine=2))
        assert refined < plain, (plain, refined)
        assert refined < 1e-4, refined  # the BASELINE.json parity bar

    def test_regularization_does_not_degrade(self):
        qp = random_qp(N=10)
        x0 = jnp.asarray(np.random.default_rng(5).uniform(-1, 1, size=5))
        sol0 = lqr_solve(qp, x0)
        sol = lqr_solve(qp, x0, reg=1e-9)
        np.testing.assert_allclose(sol.u, sol0.u, atol=1e-6)


class TestSqrtRiccati:
    def test_sqrt_matches_classical(self):
        from srbd_nmpc_tpu.ops.riccati import riccati_factorize, riccati_factorize_sqrt

        qp = random_qp(N=15, seed=77)
        fc = riccati_factorize(qp.A, qp.B, qp.Q, qp.S, qp.R)
        fs = riccati_factorize_sqrt(qp.A, qp.B, qp.Q, qp.S, qp.R)
        np.testing.assert_allclose(fs.P, fc.P, atol=1e-8)
        np.testing.assert_allclose(fs.K, fc.K, atol=1e-8)
        np.testing.assert_allclose(fs.H, fc.H, atol=1e-8)
        # L must be a valid lower-Cholesky factor of G
        np.testing.assert_allclose(
            fs.L @ np.swapaxes(np.asarray(fs.L), -1, -2),
            fc.L @ np.swapaxes(np.asarray(fc.L), -1, -2), atol=1e-8)

    def test_sqrt_full_solve(self):
        qp = random_qp(N=15, seed=78)
        x0 = jnp.asarray(np.random.default_rng(8).uniform(-1, 1, size=5))
        s1 = lqr_solve(qp, x0)
        s2 = lqr_solve(qp, x0, sqrt=True)
        np.testing.assert_allclose(s2.u, s1.u, atol=1e-9)
        np.testing.assert_allclose(s2.x, s1.x, atol=1e-9)
        np.testing.assert_allclose(s2.pi, s1.pi, atol=1e-8)

    def test_sqrt_keeps_P_psd_in_f32(self):
        """The point of ric_alg: P stays PSD under f32 on an ill-scaled
        problem (classical form can go slightly indefinite)."""
        qp = random_qp(N=20, seed=79)
        # scaling R down requires scaling S away too or the stage Hessian
        # [[R, S], [S', Q]] goes indefinite (invalid QP)
        qp = type(qp)(A=qp.A, B=qp.B, b=qp.b,
                      Q=qp.Q.at[-1].multiply(1e4), S=qp.S * 0.0, R=qp.R * 1e-4,
                      q=qp.q, r=qp.r)
        qp32 = jax.tree.map(lambda a: a.astype(jnp.float32), qp)
        from srbd_nmpc_tpu.ops.riccati import riccati_factorize_sqrt
        fs = riccati_factorize_sqrt(qp32.A, qp32.B, qp32.Q, qp32.S, qp32.R)
        eigs = np.linalg.eigvalsh(np.asarray(fs.P, np.float64))
        assert eigs.min() > -1e-3, eigs.min()
