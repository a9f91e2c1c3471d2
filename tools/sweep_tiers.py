"""A/B-sweep straggler-compaction tier geometries on the real chip.

Reproduces the round-5 measurement behind the ``NmpcConfig.compact_tiers
= (2, 8, 32)`` default: for each tier tuple, times the COLD benchmark
solve and the WARM repetition regime (the reference controlLoop's
re-solve with persistent state, NMPC_solver.cpp:359-378) at the bench
batch, p50 over ``--reps`` repetitions.

    python tools/sweep_tiers.py --tiers 4,16 2,8,32 [--batch 131072]

Round-5 results (B=131072): cold is a wash between (4,16) and (2,8,32)
(236.8k vs 236.5k solves/s) but warm wins +4.1 % on (2,8,32) (279.4k vs
268.4k) — the warm live set collapses ~3 SQP iterations earlier, so the
early B/2 tier covers real trips.
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=131072)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--tiers", nargs="+", default=["4,16", "2,8,32"],
                    help="tier tuples as comma-joined ints")
    args = ap.parse_args()

    from srbd_nmpc_tpu.models import srbd
    from srbd_nmpc_tpu.nmpc import engine
    from srbd_nmpc_tpu.nmpc.runner import build_from_options
    from srbd_nmpc_tpu.parallel import sharded
    from srbd_nmpc_tpu.utils.config import MpcOptions

    dtype = jnp.float32
    batch = args.batch
    params, weights, cfg0 = build_from_options(
        MpcOptions.default(), dtype, "euler", 0)
    x0, x_ref = engine.make_benchmark_problem(cfg0, dtype)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.asarray(x0)[None] + 0.01 * rng.normal(size=(batch, srbd.NX)),
        dtype)

    def p50_of(fn, *a):
        out = jax.block_until_ready(fn(*a))   # compile + warm caches
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(*a))
            ts.append(time.perf_counter() - t0)
        return float(np.percentile(ts, 50)), out

    # shared warm-start state from the DEFAULT config's cold solve
    @jax.jit
    def cold0(params, weights, x0s):
        states = sharded.broadcast_state(
            engine.NmpcState.initial(cfg0.N, dtype), batch)
        return sharded.solve_batch(params, weights, cfg0, states, x0s, x_ref)

    st_c, _, _ = jax.block_until_ready(cold0(params, weights, x0s))
    x0s_w = st_c.x[:, 1, :]

    for spec in args.tiers:
        tiers = tuple(int(t) for t in spec.split(","))
        cfg = dataclasses.replace(cfg0, compact_tiers=tiers)

        @jax.jit
        def cold(params, weights, x0s, cfg=cfg):
            states = sharded.broadcast_state(
                engine.NmpcState.initial(cfg.N, dtype), batch)
            return sharded.solve_batch(params, weights, cfg, states, x0s,
                                       x_ref)

        @jax.jit
        def warm(params, weights, states, x0s, cfg=cfg):
            return sharded.solve_batch(
                params, weights, cfg, engine.shift_state(states), x0s, x_ref)

        p50_c, out_c = p50_of(cold, params, weights, x0s)
        # enter the repetition regime: one cycle, then feed solutions back
        out_w = jax.block_until_ready(warm(params, weights, st_c, x0s_w))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out_w = jax.block_until_ready(
                warm(params, weights, out_w[0], x0s_w))
            ts.append(time.perf_counter() - t0)
        p50_w = float(np.percentile(ts, 50))
        print(f"tiers={tiers}: cold {batch / p50_c:10,.0f} solves/s "
              f"(conv {int(out_c[2].n_converged)})   warm "
              f"{batch / p50_w:10,.0f} solves/s "
              f"(conv {int(out_w[2].n_converged)})", flush=True)


if __name__ == "__main__":
    main()
