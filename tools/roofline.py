"""Roofline / MFU accounting for the NMPC hot path on one TPU chip.

Answers the round-1 verdict's question — "fast relative to WHAT the
hardware can do?" — in three parts:

1. **Calibrated ceilings.** Measures this chip's achievable HBM bandwidth
   (big-array copy) and VPU f32 FMA throughput (a Pallas kernel doing 512
   unrolled FMAs per element in VMEM). The NMPC kernels never touch the
   MXU — 12x12 stage matrices are expanded as rank-1 lane ops — so the
   relevant compute ceiling is the VPU, not the 197 bf16 TFLOP/s headline.

2. **Analytic per-stage work model.** FLOPs and compulsory HBM bytes per
   scenario per SQP iteration for each pipeline stage, from the kernel
   math (formulas inline below). "Compulsory bytes" = each kernel operand
   read once + each output written once; VMEM-resident intermediates are
   free.

3. **Measured stage times** (fori_loop-amortized, as tools/profile_stages)
   -> achieved GB/s and GFLOP/s per stage, fraction of the calibrated
   ceilings, and the binding resource. Plus the full-solve batch-scaling
   curve (1k/4k/16k).

Usage: python tools/roofline.py [--batch 4096] [--reps 50] [--scaling]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

NX = 12
NG = 24
F32 = 4  # bytes


# --------------------------------------------------------------------------
# 1. calibrated ceilings
# --------------------------------------------------------------------------

def _device_array(n: int) -> jnp.ndarray:
    """A REALIZED n-float device array built from a tiny host upload.

    Two tunnel gotchas this dodges: uploading n floats through the remote
    tunnel is ~MB/s-slow, and lazily-created arrays (jnp.ones) defer
    execution so block_until_ready on their consumers returns without
    running anything (measured '20 TB/s' before this was caught). A
    1-element readback forces materialization."""
    seed = jnp.asarray(np.random.default_rng(0).random(131072, np.float32))
    x = jax.jit(lambda s: jnp.tile(s, n // s.size) * 1.0)(seed)
    float(x[0])
    return x


def _timed_median(fn, reps: int = 5) -> float:
    jax.block_until_ready(fn())  # compile/warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def calibrate_hbm_gbs() -> float:
    """Achievable HBM bandwidth: k in-graph jnp.roll sweeps over 1 GiB
    (roll = pure 1-read + 1-write data movement; the DYNAMIC shift amount
    i+1 keeps XLA from combining the rolls, unlike arithmetic sweeps
    which get algebraically collapsed). k=24 vs k=8 trip counts are
    differenced to cancel dispatch overhead."""
    n = 256 * 1024 * 1024  # 1 GiB of f32
    x = _device_array(n)

    @functools.partial(jax.jit, static_argnums=1)
    def sweeps(a, k):
        return jax.lax.fori_loop(0, k, lambda i, v: jnp.roll(v, i + 1), a)

    t_hi = _timed_median(lambda: sweeps(x, 24))
    t_lo = _timed_median(lambda: sweeps(x, 8))
    return 2 * n * F32 * (24 - 8) / max(t_hi - t_lo, 1e-9) / 1e9


def calibrate_vpu_gflops() -> float:
    """Achievable VPU f32 throughput: Pallas kernel iterating the
    quadratic map acc <- y - acc*acc (one fused multiply-subtract = 2
    FLOPs, NOT algebraically foldable — a linear acc*c+d chain gets
    strength-reduced to a single fma by the compiler) on VMEM-resident
    [8,128,512] blocks. K=512 vs K=128 iteration counts are size-
    differenced to cancel both HBM traffic and dispatch overhead."""
    from jax.experimental import pallas as pl

    shape = (8, 128, 512)
    grid = 128
    n_elem = 8 * 128 * 512 * grid

    def make(K):
        def kernel(x_ref, o_ref):
            acc = x_ref[...]
            y = acc * 0.5
            for _ in range(K):
                acc = y - acc * acc
            o_ref[...] = acc

        return jax.jit(lambda x: pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec(shape, lambda i: (0, 0, i))],
            out_specs=pl.BlockSpec(shape, lambda i: (0, 0, i)),
            out_shape=jax.ShapeDtypeStruct((8, 128, 512 * grid), jnp.float32),
        )(x))

    x = _device_array(n_elem).reshape(8, 128, 512 * grid)
    f_hi, f_lo = make(512), make(128)  # hoisted: jit caches by identity
    t_hi = _timed_median(lambda: f_hi(x))
    t_lo = _timed_median(lambda: f_lo(x))
    flops = 2 * (512 - 128) * n_elem
    return flops / max(t_hi - t_lo, 1e-9) / 1e9


# --------------------------------------------------------------------------
# 2. work model (per scenario, per SQP iteration, N stages)
# --------------------------------------------------------------------------
# FLOP counts are EXACT, from XLA cost analysis of the mathematically
# identical XLA twins on CPU (jit(f).lower(...).compile().cost_analysis()
# of engine._linearize_soa / riccati_soa.lqr_solve / engine.merit at B=8,
# N=20, divided by B*N) — the Pallas kernels run the same math, and the
# Pallas custom calls themselves are opaque to cost analysis. Bytes are
# compulsory HBM traffic from the kernel operand shapes.

FLOPS_PER_STAGE = dict(linearize=17735, riccati=8683, merit=3995)


def model_riccati(N: int) -> dict:
    # backward reads A,B,R (3 mats) + b,q(x2),r; writes K + k
    # forward reads A,B,K + b,k,x0; writes x,u
    mat = NX * NX * F32
    vec = NX * F32
    bytes_bwd = N * (3 * mat + 4 * vec) + N * (mat + vec)
    bytes_fwd = N * (3 * mat + 2 * vec) + (N + 1) * vec + N * vec
    return dict(flops=N * FLOPS_PER_STAGE["riccati"],
                bytes=bytes_bwd + bytes_fwd)


def model_linearize(N: int) -> dict:
    mat = NX * NX * F32
    vec = NX * F32
    # reads x (N+1), u (N), x_ref (N); writes A,B,R_eff + b,q,r + merit rows
    bytes_ = ((N + 1) * vec + 2 * N * vec
              + N * (3 * mat) + N * 3 * vec + (N + 1) * vec + N * 8 * F32)
    return dict(flops=N * FLOPS_PER_STAGE["linearize"], bytes=bytes_)


def model_merit(N: int) -> dict:
    vec = NX * F32
    bytes_ = (N + 1) * vec * 2 + N * vec + 8 * F32  # x, x_ref, u in; scalars out
    return dict(flops=N * FLOPS_PER_STAGE["merit"], bytes=bytes_)


# --------------------------------------------------------------------------
# 3. measured stage times
# --------------------------------------------------------------------------

def measure_dispatch_overhead_s() -> float:
    """Fixed synchronous-dispatch cost of one jitted call through the
    remote tunnel (~30 ms on this rig; ~us on a local chip). Every
    one-dispatch timing in this tool reports raw AND overhead-corrected."""
    x = jnp.asarray(np.ones((8, 128), np.float32))
    f = jax.jit(lambda a: a * 1.0001)
    return _timed_median(lambda: f(x), reps=7)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--scaling", action="store_true",
                    help="also run the full-solve batch-scaling curve")
    ap.add_argument("--skip-calibrate", action="store_true")
    ap.add_argument("--block", type=int, default=256,
                    help="Pallas scenario-lane block (NmpcConfig.pallas_block)")
    args = ap.parse_args()
    B, reps = args.batch, args.reps

    from srbd_nmpc_tpu.models import merit_pallas, srbd
    from srbd_nmpc_tpu.nmpc import engine
    from srbd_nmpc_tpu.ops import riccati_pallas

    print(f"backend={jax.default_backend()} batch={B}")
    h = measure_dispatch_overhead_s()
    print(f"per-dispatch sync overhead: {h*1e3:.1f} ms "
          f"(subtracted from all one-dispatch timings below)")
    if not args.skip_calibrate:
        hbm = calibrate_hbm_gbs()
        vpu = calibrate_vpu_gflops()
    else:
        hbm, vpu = 819.0, 7700.0
    print(f"calibrated ceilings: HBM {hbm:.0f} GB/s, VPU f32 {vpu:.0f} GFLOP/s"
          f"  (v5e specs: 819 GB/s; VPU ~7.9 TFLOP/s fma)")

    dtype = jnp.float32
    cfg = engine.NmpcConfig(N=20, sqp_max_iter=15, pallas_block=args.block)
    N = cfg.N
    params = srbd.SRBDParams.create(dt=0.015, dtype=dtype)
    weights = engine.NmpcWeights.create(
        Q_diag=[0] * 11 + [10], R_scalar=1e-4,
        Qf_diag=[.5, .5, .5, .01, .01, .01, 100, 100, 100, 0, 0, 100],
        N=N, dtype=dtype)
    x0, x_ref = engine.make_benchmark_problem(cfg, dtype)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(np.asarray(x0)[None] + 0.01 * rng.normal(size=(B, 12)), dtype)
    state = engine.NmpcState(
        x=jnp.asarray(rng.normal(size=(B, N + 1, 12)) * 0.1, dtype),
        u=jnp.asarray(rng.normal(size=(B, N, 12)) * 20 + 90, dtype),
        alpha=jnp.ones(B, dtype))

    with jax.default_matmul_precision("float32"):
        A, Bm, b, R, q, r, _ = engine._linearize_pallas(
            params, weights, cfg, state, x_ref)
    A, Bm, b, R, q, r = jax.block_until_ready((A, Bm, b, R, q, r))
    dx0s = jnp.moveaxis(x0s - state.x[:, 0, :], 0, -1)

    def loop(body):
        @functools.partial(jax.jit, static_argnums=0)
        def run(k):
            def step(i, acc):
                with jax.default_matmul_precision("float32"):
                    return acc + body(acc)
            return jax.lax.fori_loop(0, k, step, jnp.asarray(0.0, dtype))
        return run

    def timed(run):
        """(T(reps) - T(reps//2)) / (reps - reps//2): per-iteration time
        with the dispatch overhead differenced away."""
        hi, lo = reps, reps // 2
        t_hi = _timed_median(lambda: run(hi), reps=3)
        t_lo = _timed_median(lambda: run(lo), reps=3)
        return (t_hi - t_lo) / (hi - lo)

    lin = loop(lambda acc: engine._linearize_pallas(
        params, weights, cfg,
        engine.NmpcState(x=state.x + acc * 0, u=state.u, alpha=state.alpha),
        x_ref, block=args.block)[2][0, 0, 0] * 1e-20)
    ric = loop(lambda acc: riccati_pallas.lqr_solve_pallas(
        A, Bm, b + acc * 0, (weights.Q, weights.Qf), R, q, r, dx0s,
        reg=1e-9, block=args.block)[1][0, 0, 0] * 1e-20)
    Ac, bc = srbd.constraint_matrix(params)
    xs_t = jnp.transpose(state.x, (1, 2, 0))
    us_t = jnp.transpose(state.u, (1, 2, 0))
    xr_t = jnp.broadcast_to(jnp.transpose(x_ref[None], (1, 2, 0)), (N + 1, 12, B))
    mer = loop(lambda acc: merit_pallas.merit_pallas(
        params, weights.Q, weights.Qf, weights.R, Ac, bc,
        xs_t + acc * 0, us_t, xr_t, cfg.mu_barrier, cfg.theta_barrier,
        block=args.block)[0][0] * 1e-20)

    stages = [
        ("linearize (fused Pallas)", lin, model_linearize(N)),
        ("riccati bwd+fwd (Pallas)", ric, model_riccati(N)),
        ("merit (one LS candidate)", mer, model_merit(N)),
    ]
    print(f"\n{'stage':28s} {'ms/call':>8s} {'GFLOP/s':>8s} {'%VPU':>6s} "
          f"{'GB/s':>7s} {'%HBM':>6s}  binding")
    total_t = total_fl = total_by = 0.0
    for name, fn, m in stages:
        dt = timed(fn)
        gfl = m["flops"] * B / dt / 1e9
        gbs = m["bytes"] * B / dt / 1e9
        fv, fh = gfl / vpu, gbs / hbm
        binding = "VPU" if fv > fh else "HBM"
        print(f"{name:28s} {dt*1e3:8.3f} {gfl:8.0f} {100*fv:5.1f}% "
              f"{gbs:7.0f} {100*fh:5.1f}%  {binding} ({100*max(fv,fh):.0f}%)")
        total_t += dt
        total_fl += m["flops"]
        total_by += m["bytes"]

    print(f"\nper-scenario per-SQP-iteration model: "
          f"{total_fl/1e6:.2f} MFLOP, {total_by/1024:.1f} KiB compulsory HBM")

    # full cold solve
    @jax.jit
    def full_solve(x0s):
        st = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape),
                          engine.NmpcState.initial(N, dtype))
        return engine.solve(params, weights, cfg, st, x0s, x_ref)

    t_raw = _timed_median(lambda: full_solve(x0s), reps=5)
    t_solve = t_raw - h
    iters = 15  # the batch runs to its slowest member
    gfl = total_fl * iters * B / t_solve / 1e9
    gbs = total_by * iters * B / t_solve / 1e9
    print(f"\nfull cold solve: {t_raw*1e3:.1f} ms raw, {t_solve*1e3:.1f} ms "
          f"on-chip for B={B} ({B/t_solve:.0f} solves/s on-chip, "
          f"{B/t_raw:.0f} end-to-end)")
    print(f"  @15 SQP iters: {gfl:.0f} GFLOP/s ({100*gfl/vpu:.1f}% VPU), "
          f"{gbs:.0f} GB/s ({100*gbs/hbm:.1f}% HBM)")
    stage_sum = total_t * iters
    print(f"  stage-time accounting: 15 * (lin+ric+merit) = "
          f"{stage_sum*1e3:.1f} ms vs on-chip {t_solve*1e3:.1f} ms "
          f"(gap = line-search extra candidates + while_loop glue)")

    if args.scaling:
        print("\nbatch-scaling (full cold solve):")
        for Bs in (1024, 4096, 16384):
            x0b = jnp.asarray(
                np.asarray(x0)[None] + 0.01 * rng.normal(size=(Bs, 12)), dtype)

            @jax.jit
            def fs(x0b, Bs=Bs):
                st = jax.tree.map(
                    lambda a: jnp.broadcast_to(a, (Bs,) + a.shape),
                    engine.NmpcState.initial(N, dtype))
                return engine.solve(params, weights, cfg, st, x0b, x_ref)

            t_raw = _timed_median(lambda: fs(x0b), reps=5)
            dt = t_raw - h
            print(f"  B={Bs:6d}: {t_raw*1e3:8.1f} ms raw / {dt*1e3:8.1f} ms "
                  f"on-chip  {Bs/dt:9.0f} solves/s on-chip  "
                  f"({Bs/t_raw:.0f} end-to-end)")


if __name__ == "__main__":
    main()
