"""Minimal TPU repro for the round-3 Mosaic crash in the structured
one-pass SQP kernel (VERDICT r3 Weak #1): B=256, block=256, N=20.

Run: timeout 600 python tools/repro_onepass.py [onepass|cand|twopass]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from srbd_nmpc_tpu.models import srbd
from srbd_nmpc_tpu.nmpc import engine
from srbd_nmpc_tpu.ops import sqp_pallas
from srbd_nmpc_tpu.utils.config import MpcOptions
from srbd_nmpc_tpu.nmpc.runner import build_from_options


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "onepass"
    dtype = jnp.float32
    opts = MpcOptions.default()
    params, weights, cfg = build_from_options(opts, dtype, "euler", 0)
    N = cfg.N
    B = 256
    rng = np.random.default_rng(0)
    xa = jnp.asarray(rng.normal(size=(N + 1, srbd.NX, B)) * 0.1, dtype)
    us = jnp.asarray(100.0 + rng.normal(size=(N, srbd.NU, B)), dtype)
    xra = jnp.zeros((N + 1, srbd.NX, B), dtype)
    dx0 = jnp.asarray(rng.normal(size=(srbd.NX, B)) * 0.01, dtype)
    Ac, bc = srbd.constraint_matrix(params)

    with jax.default_matmul_precision("float32"):
        if which == "onepass":
            fn = lambda: sqp_pallas.sqp_qp_solve_onepass(
                params, weights.Q, weights.Qf, weights.R, Ac, bc,
                xa, us, xra, dx0, cfg.mu_barrier, cfg.theta_barrier,
                reg=cfg.reg, block=256)
        elif which == "cand":
            alpha = jnp.ones((B,), dtype)
            dxc = jnp.zeros((N + 1, srbd.NX, B), dtype)
            duc = jnp.zeros((N, srbd.NU, B), dtype)
            x0s = xa[0] + dx0
            fn = lambda: sqp_pallas.sqp_qp_solve_onepass_cand(
                params, weights.Q, weights.Qf, weights.R, Ac, bc,
                xa, us, xra, dxc, duc, alpha, x0s,
                cfg.mu_barrier, cfg.theta_barrier, reg=cfg.reg, block=256)
        else:
            fn = lambda: sqp_pallas.sqp_qp_solve(
                params, weights.Q, weights.Qf, weights.R, Ac, bc,
                xa, us, xra, dx0, cfg.mu_barrier, cfg.theta_barrier,
                reg=cfg.reg, block=256)
        out = jax.block_until_ready(fn())
    dx = out[0]
    print(f"{which}: OK  max|dx| = {float(jnp.max(jnp.abs(dx))):.6f}  "
          f"dphi[0] = {float(out[2][0]):.6f}")


if __name__ == "__main__":
    main()
