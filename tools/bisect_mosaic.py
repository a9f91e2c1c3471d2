"""Bisect the Mosaic TPU lowering crash in _backward_stage_structured.

Each VARIANT is a kernel body exercising one structural piece of the
round-3 rewrite (ops/sqp_pallas.py:_backward_stage_structured). The crash
is a compile-time CHECK-abort (SIGABRT), so each variant compiles in a
subprocess. Run:  python tools/bisect_mosaic.py            (all variants)
                  python tools/bisect_mosaic.py <name>     (one, in-proc)
"""
import functools
import os
import subprocess
import sys

BLOCK = 256
NX, NU, NG = 12, 12, 24


def _body(which, x_ref, u_ref, P_ref, Ac_ref, out_ref):
    import jax
    import jax.numpy as jnp
    from srbd_nmpc_tpu.ops import smallmat as sm

    x = x_ref[...]            # [12, block]
    u = u_ref[...]
    P = P_ref[...]            # [12, 12, block]
    Ac = Ac_ref[...]          # [24, 12, block]
    dtype = x.dtype
    block = x.shape[-1]
    dt = jnp.asarray(0.015, dtype)

    def _rb(M, i):
        return jax.lax.slice_in_dim(M, 3 * i, 3 * i + 3, axis=0)

    def _cb(M, j):
        return jax.lax.slice_in_dim(M, 3 * j, 3 * j + 3, axis=1)

    if which == "dense_mm":                      # control: known-good
        out_ref[...] = sm.mm(P, P)

    elif which == "half_slice":                  # [12,6,block] Ac half + mv
        half = lambda M, r0, c0: jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(M, r0, r0 + 12, axis=0), c0, c0 + 6, axis=1)
        Ac1 = half(Ac, 0, 0)
        Ac2 = half(Ac, 12, 6)
        u1 = jax.lax.slice_in_dim(u, 0, 6, axis=0)
        u2 = jax.lax.slice_in_dim(u, 6, 12, axis=0)
        con = jnp.concatenate([sm.mv(Ac1, u1), sm.mv(Ac2, u2)], axis=0)
        out_ref[...] = jnp.broadcast_to(con[:12][:, None], (12, 12, block))

    elif which == "reff_concat":                 # C11/C22 -> block-diag Reff
        half = lambda M, r0, c0: jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(M, r0, r0 + 12, axis=0), c0, c0 + 6, axis=1)
        Ac1 = half(Ac, 0, 0)
        Ac2 = half(Ac, 12, 6)
        db = sm.mv(Ac, u)
        ddb1 = jax.lax.slice_in_dim(db, 0, 12, axis=0)
        ddb2 = jax.lax.slice_in_dim(db, 12, 24, axis=0)
        C11 = sm.mtm(Ac1, Ac1 * ddb1[:, None])
        C22 = sm.mtm(Ac2, Ac2 * ddb2[:, None])
        z66 = jnp.zeros((6, 6, block), dtype)
        out_ref[...] = jnp.concatenate([
            jnp.concatenate([C11, z66], axis=1),
            jnp.concatenate([z66, C22], axis=1)], axis=0)

    elif which == "colblock_M":                  # M = P Jx via col-blocks
        Pc0, Pc1, Pc2 = _cb(P, 0), _cb(P, 1), _cb(P, 2)
        D12 = jax.lax.slice_in_dim(P, 0, 3, axis=0)[:, 0:6]   # [3,6,block]
        SF = _rb(_cb(P, 0), 0)                                # [3,3,block]
        M = jnp.concatenate([sm.mm(Pc0, D12), sm.mm(Pc1, SF), Pc2], axis=1)
        out_ref[...] = P + dt * M

    elif which == "jut_rows":                    # JuT row recipe
        Sr = _rb(_cb(P, 0), 0)
        M1, M3 = _rb(P, 1), _rb(P, 3)
        a = sm.mtm(Sr, M1) + M3
        out_ref[...] = jnp.concatenate([a, M1, a, M1], axis=0)

    elif which == "a_assembly":                  # A from 3x3 concats
        D1 = _rb(_cb(P, 0), 0)
        z3 = jnp.zeros((3, 3, block), dtype)
        I3 = jnp.broadcast_to(jnp.eye(3, dtype=dtype)[:, :, None],
                              (3, 3, block))
        A = jnp.concatenate([
            jnp.concatenate([I3 + dt * D1, dt * D1, z3, z3], axis=1),
            jnp.concatenate([z3, I3, dt * D1, z3], axis=1),
            jnp.concatenate([z3, z3, I3, dt * I3], axis=1),
            jnp.concatenate([z3, z3, z3, I3], axis=1)], axis=0)
        out_ref[...] = A

    elif which == "bk_assembly":                 # BK from row-block concats
        K = P
        Sr = _rb(_cb(P, 0), 0)
        Kr0, Kr1 = _rb(K, 0), _rb(K, 1)
        Kr2, Kr3 = _rb(K, 2), _rb(K, 3)
        zr = jnp.zeros((3, NX, block), dtype)
        out_ref[...] = jnp.concatenate([
            zr, dt * (sm.mm(Sr, Kr0) + Kr1 + sm.mm(Sr, Kr2) + Kr3),
            zr, dt * (Kr0 + Kr2)], axis=0)

    elif which == "jac_blocks":                  # jacobian_blocks alone
        from srbd_nmpc_tpu.models import srbd_soa
        from srbd_nmpc_tpu.models.srbd import SRBDParams
        params = SRBDParams(
            mass=jnp.asarray(15.0, dtype),
            inertia_inv=jnp.eye(3, dtype=dtype),
            foot_pos=jnp.zeros((2, 3), dtype),
            foot_rot=jnp.zeros((2, 3, 3), dtype),
            dt=dt, mu=jnp.asarray(0.5, dtype), lfx=jnp.asarray(0.1, dtype),
            lfz=jnp.asarray(0.1, dtype), fmax=jnp.asarray(500.0, dtype),
            fmin=jnp.asarray(1.0, dtype))
        D1, D2, SF, Sr, Sl = srbd_soa.jacobian_blocks(params, x, u)
        D12 = jnp.concatenate([D1, D2], axis=1)
        M = jnp.concatenate([sm.mm(_cb(P, 0), D12), sm.mm(_cb(P, 1), SF),
                             _cb(P, 2)], axis=1)
        out_ref[...] = M

    elif which == "full":                        # the real structured stage
        from srbd_nmpc_tpu.models.srbd import SRBDParams
        from srbd_nmpc_tpu.ops.sqp_pallas import _backward_stage_structured
        params = SRBDParams(
            mass=jnp.asarray(15.0, dtype),
            inertia_inv=jnp.eye(3, dtype=dtype),
            foot_pos=jnp.zeros((2, 3), dtype),
            foot_rot=jnp.zeros((2, 3, 3), dtype),
            dt=dt, mu=jnp.asarray(0.5, dtype), lfx=jnp.asarray(0.1, dtype),
            lfz=jnp.asarray(0.1, dtype), fmax=jnp.asarray(500.0, dtype),
            fmin=jnp.asarray(1.0, dtype))
        bc_col = jnp.zeros((NG, 1), dtype)
        Rw = jnp.broadcast_to(jnp.eye(NU, dtype=dtype)[:, :, None],
                              (NU, NU, block))
        Qw = jnp.broadcast_to(jnp.eye(NX, dtype=dtype)[:, :, None],
                              (NX, NX, block))
        outs = _backward_stage_structured(
            params, Ac, bc_col, Rw, Qw, x, x, u, x, P, x, 1e-8, 0.1, 0.01)
        out_ref[...] = outs[0]

    elif which == "widen_reff":                  # widened Ac -> half slices
        def widen(c):
            return jnp.broadcast_to(c[..., None], c.shape + (block,))
        Acw = widen(jnp.sum(Ac, axis=-1) * (1.0 / block))   # [24,12] const-ish
        half = lambda M, r0, c0: jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(M, r0, r0 + 12, axis=0), c0, c0 + 6, axis=1)
        Ac1 = half(Acw, 0, 0)
        Ac2 = half(Acw, 12, 6)
        db = sm.mv(Acw, u)
        ddb1 = jax.lax.slice_in_dim(db, 0, 12, axis=0)
        ddb2 = jax.lax.slice_in_dim(db, 12, 24, axis=0)
        C11 = sm.mtm(Ac1, Ac1 * ddb1[:, None])
        C22 = sm.mtm(Ac2, Ac2 * ddb2[:, None])
        z66 = jnp.zeros((6, 6, block), dtype)
        out_ref[...] = jnp.concatenate([
            jnp.concatenate([C11, z66], axis=1),
            jnp.concatenate([z66, C22], axis=1)], axis=0)

    elif which == "widen_after_slice":           # slice 2-D first, then widen
        def widen(c):
            return jnp.broadcast_to(c[..., None], c.shape + (block,))
        Ac2d = jnp.sum(Ac, axis=-1) * (1.0 / block)          # [24,12]
        h2 = lambda M, r0, c0: jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(M, r0, r0 + 12, axis=0), c0, c0 + 6, axis=1)
        Ac1 = widen(h2(Ac2d, 0, 0))                          # [12,6,block]
        Ac2 = widen(h2(Ac2d, 12, 6))
        db = sm.mv(widen(Ac2d), u)
        ddb1 = jax.lax.slice_in_dim(db, 0, 12, axis=0)
        ddb2 = jax.lax.slice_in_dim(db, 12, 24, axis=0)
        C11 = sm.mtm(Ac1, Ac1 * ddb1[:, None])
        C22 = sm.mtm(Ac2, Ac2 * ddb2[:, None])
        z66 = jnp.zeros((6, 6, block), dtype)
        out_ref[...] = jnp.concatenate([
            jnp.concatenate([C11, z66], axis=1),
            jnp.concatenate([z66, C22], axis=1)], axis=0)

    elif which == "widen_half_only":             # ONLY half(widened), no math
        def widen(c):
            return jnp.broadcast_to(c[..., None], c.shape + (block,))
        Acw = widen(jnp.sum(Ac, axis=-1) * (1.0 / block))
        half = lambda M, r0, c0: jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(M, r0, r0 + 12, axis=0), c0, c0 + 6, axis=1)
        Ac1 = half(Acw, 0, 0)
        Ac2 = half(Acw, 12, 6)
        out_ref[...] = jnp.concatenate(
            [jnp.concatenate([Ac1, Ac2], axis=1)] , axis=0)

    else:
        raise SystemExit(f"unknown variant {which!r}")


def run_ctx(n_stages):
    """Replica of the onepass pallas_call context (2N sequential grid,
    pl.when phases, stage scratch) around _backward_stage_structured."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from srbd_nmpc_tpu.models import srbd
    from srbd_nmpc_tpu.nmpc import engine
    from srbd_nmpc_tpu.ops import sqp_pallas
    from srbd_nmpc_tpu.utils.config import MpcOptions
    from srbd_nmpc_tpu.nmpc.runner import build_from_options

    dtype = jnp.float32
    opts = MpcOptions.default()
    params, weights, cfg = build_from_options(opts, dtype, "euler", 0)
    N = n_stages
    B = BLOCK
    rng = np.random.default_rng(0)
    xa = jnp.asarray(rng.normal(size=(N + 1, NX, B)) * 0.1, dtype)
    us = jnp.asarray(100.0 + rng.normal(size=(N, NU, B)), dtype)
    xra = jnp.zeros((N + 1, NX, B), dtype)
    dx0 = jnp.asarray(rng.normal(size=(NX, B)) * 0.01, dtype)
    Ac, bc = srbd.constraint_matrix(params)
    with jax.default_matmul_precision("float32"):
        out = sqp_pallas.sqp_qp_solve_onepass(
            params, weights.Q, weights.Qf, weights.R, Ac, bc,
            xa, us, xra, dx0, cfg.mu_barrier, cfg.theta_barrier,
            reg=cfg.reg, block=B)
        jax.block_until_ready(out)
    print(f"ctx N={N}: OK max|dx|={float(jnp.max(jnp.abs(out[0]))):.4f}")


def run_one(which):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    import numpy as np

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(NX, BLOCK)), jnp.float32)
    u = jnp.asarray(rng.normal(size=(NU, BLOCK)), jnp.float32)
    P = jnp.asarray(rng.normal(size=(NX, NX, BLOCK)), jnp.float32)
    Ac = jnp.asarray(rng.normal(size=(NG, NU, BLOCK)), jnp.float32)
    out = pl.pallas_call(
        functools.partial(_body, which),
        out_shape=jax.ShapeDtypeStruct((NX, NX, BLOCK), jnp.float32),
    )(x, u, P, Ac)
    out.block_until_ready()
    print(f"{which}: OK (sum={float(out.sum()):.3f})")


def main():
    if len(sys.argv) > 1:
        v = sys.argv[1]
        if v.startswith("ctx"):
            run_ctx(int(v[3:]))
        else:
            run_one(v)
        return
    variants = ["widen_reff", "ctx2", "ctx20"]
    for v in variants:
        r = subprocess.run(
            [sys.executable, __file__, v], capture_output=True, text=True,
            timeout=600,
            env={**os.environ, "PYTHONPATH": "/root/.axon_site:/root/repo"})
        status = "OK" if r.returncode == 0 else f"FAIL rc={r.returncode}"
        tail = (r.stdout + r.stderr).strip().splitlines()
        msg = tail[-1][:120] if tail else ""
        print(f"{v:14s} {status:12s} {msg}")


if __name__ == "__main__":
    main()
