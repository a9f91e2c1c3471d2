"""Measure f32-engine converged-control error vs the native f64 oracle.

VERDICT r4 weak #1: the production configuration (fused kernel, refine=0)
was never measured against the f64 oracle. This probe runs, on CPU:
  - f64 XLA engine (sanity: should be ~1e-6)
  - f32 XLA engine, refine = 0 / 1 / 2
  - f32 fused planes kernel (interpret mode), speculative on  [production]
over B perturbed x0s (bench.py's construction) and prints the relative
error metric bench.py uses (worst element / max-|u| scale floor).

Usage: python tools/probe_f32_accuracy.py [B]
"""

import ctypes
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(REPO, "native", "build", "libsrbd_oracle.so")


def oracle_solve(lib, N, sqp_max_iter, x0):
    params = np.array([15.0, 0.015, 0.541667, 0.516667, 1.0416667,
                       0.0, -0.1, 0.0, 0.0, 0.1, 0.0, 0.1, 5.0])
    weights = np.concatenate([
        np.array([0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 10.0]),
        np.array([0.0001]),
        np.array([0.5, 0.5, 0.5, 0.01, 0.01, 0.01, 100, 100, 100, 0, 0, 100.0]),
    ])
    x0 = np.ascontiguousarray(x0, dtype=np.float64)
    x_ref = np.zeros(12); x_ref[2] = 0.2; x_ref[6] = 0.5; x_ref[8] = 1.0
    x_out = np.zeros((N + 1) * 12)
    u_out = np.zeros(N * 12)
    info = np.zeros(5)
    p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    ret = lib.srbd_nmpc_solve(p(params), p(weights), N, sqp_max_iter,
                              p(x0), p(x_ref), p(x_out), p(u_out), p(info))
    return ret, u_out.reshape(N, 12)


def rel_err(u_test, u_ref):
    scale = np.maximum(np.abs(u_ref), 0.01 * np.max(np.abs(u_ref)) + 1e-30)
    return float(np.max(np.abs(u_test - u_ref) / scale))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32

    if not os.path.exists(LIB):
        subprocess.run(["cmake", "-S", os.path.join(REPO, "native"),
                        "-B", os.path.join(REPO, "native", "build")], check=True)
        subprocess.run(["cmake", "--build",
                        os.path.join(REPO, "native", "build")], check=True)
    lib = ctypes.CDLL(LIB)
    lib.srbd_nmpc_solve.restype = ctypes.c_int
    lib.srbd_nmpc_solve.argtypes = [ctypes.POINTER(ctypes.c_double)] * 2 + \
        [ctypes.c_int] * 2 + [ctypes.POINTER(ctypes.c_double)] * 5

    from srbd_nmpc_tpu.models import srbd
    from srbd_nmpc_tpu.nmpc import engine
    from srbd_nmpc_tpu.parallel import sharded

    cfg64 = engine.NmpcConfig(N=20, sqp_max_iter=15)
    x0, x_ref = engine.make_benchmark_problem(cfg64, jnp.float64)
    rng = np.random.default_rng(42)
    x0s = np.asarray(x0)[None] + 0.01 * rng.normal(size=(B, 12))

    # oracle solves (keep only scenarios where the oracle converges)
    u_orc = np.zeros((B, 20, 12))
    ok = np.zeros(B, bool)
    for i in range(B):
        ret, u = oracle_solve(lib, 20, 15, x0s[i])
        u_orc[i] = u
        ok[i] = ret == 1
    print(f"oracle converged: {ok.sum()}/{B}")

    def run(dtype, **kw):
        cfg = engine.NmpcConfig(N=20, sqp_max_iter=15, **kw)
        params = srbd.SRBDParams.create(dt=0.015, dtype=dtype)
        weights = engine.NmpcWeights.create(
            [0] * 11 + [10], 1e-4,
            [0.5, 0.5, 0.5, 0.01, 0.01, 0.01, 100, 100, 100, 0, 0, 100],
            N=20, dtype=dtype)
        states = sharded.broadcast_state(engine.NmpcState.initial(20, dtype), B)
        st, inf = jax.jit(
            lambda p, w, s, x, r: engine.solve(p, w, cfg, s, x, r)
        )(params, weights, states, jnp.asarray(x0s, dtype),
          jnp.asarray(x_ref, dtype))
        conv = np.asarray(inf.converged)
        use = ok & conv
        errs = [rel_err(np.asarray(st.u[i], np.float64), u_orc[i])
                for i in range(B) if use[i]]
        return max(errs), float(np.median(errs)), int(use.sum())

    for name, dtype, kw in [
        ("f64 xla", jnp.float64, dict(qp_kernel="xla")),
        ("f32 xla refine=0", jnp.float32, dict(qp_kernel="xla")),
        ("f32 xla refine=1", jnp.float32, dict(qp_kernel="xla", refine=1)),
        ("f32 xla refine=2", jnp.float32, dict(qp_kernel="xla", refine=2)),
    ]:
        mx, med, n = run(dtype, **kw)
        print(f"{name:22s}  max_rel={mx:.3e}  med_rel={med:.3e}  (n={n})")

    # production config: fused planes kernel in interpret mode
    import functools
    from jax.experimental import pallas as pl
    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        for name, kw in [
            ("f32 fused+spec planes", dict(qp_kernel="fused",
                                           speculative=True, pallas_block=B)),
            ("f32 fused+spec dense", dict(qp_kernel="fused", speculative=True,
                                          planes=False, pallas_block=B)),
        ]:
            mx, med, n = run(jnp.float32, **kw)
            print(f"{name:22s}  max_rel={mx:.3e}  med_rel={med:.3e}  (n={n})")
    finally:
        pl.pallas_call = orig


if __name__ == "__main__":
    main()
