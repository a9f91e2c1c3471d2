"""On-chip cost of lane-dimension permutation strategies.

The round-5 straggler-compaction first cut gathered/scattered the carry on
the minor (lane) axis EVERY compacted trip — bench regressed 192k -> 128k,
implying ~50 ms per compacted trip at B=131072 (~10 GB/s effective). This
probe measures, at bench shapes:

  take      jnp.take(a, order, axis=-1)               (lane-dim gather)
  aos       moveaxis -> take(axis=0) -> moveaxis      (row gather between
            explicit transposes, optimization_barrier'd so XLA cannot fold
            the transpose back into the gather)
  scatter   a.at[..., order].set(b)                   (lane-dim scatter)
  aos_scat  transpose -> row scatter -> transpose
  transp    moveaxis only (baseline relayout cost)
  argsort   jnp.argsort of ~live [B]
  cumsum    prefix-slot computation via 2 cumsums + 1 tiny scatter

Timing uses a scalar readback (float(jnp.sum(out))) — block_until_ready
does not wait on this remote platform (CLAUDE.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=5):
    out = fn(*args)
    _ = float(jnp.sum(out)) if hasattr(out, "dtype") else None
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(out))
        ts.append(time.perf_counter() - t0)
    return 1e3 * float(np.median(ts))


def main():
    B = int(os.environ.get("B", "131072"))
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(21, 12, B)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(21, 12, B // 4)), jnp.float32)
    live = jnp.asarray(rng.random(B) < 0.2)
    order = jnp.argsort(jnp.logical_not(live))
    order4 = order[:B // 4]
    order, order4 = jax.block_until_ready((order, order4))

    take = jax.jit(lambda a, o: jnp.take(a, o, axis=-1))

    @jax.jit
    def aos(a, o):
        m = jax.lax.optimization_barrier(jnp.moveaxis(a, -1, 0))
        g = jax.lax.optimization_barrier(jnp.take(m, o, axis=0))
        return jnp.moveaxis(g, 0, -1)

    scat = jax.jit(lambda a, o, b: a.at[..., o].set(b))

    @jax.jit
    def aos_scat(a, o, b):
        m = jax.lax.optimization_barrier(jnp.moveaxis(a, -1, 0))
        s = jax.lax.optimization_barrier(
            m.at[o].set(jnp.moveaxis(b, -1, 0)))
        return jnp.moveaxis(s, 0, -1)

    transp = jax.jit(lambda a: jnp.moveaxis(a, -1, 0) + 0.0)
    argsort_f = jax.jit(lambda l: jnp.argsort(jnp.logical_not(l)))

    @jax.jit
    def cumsum_order(l):
        li = l.astype(jnp.int32)
        pos_live = jnp.cumsum(li) - 1
        pos_dead = jnp.cumsum(1 - li) - 1
        n_live = jnp.sum(li)
        slot = jnp.where(l, pos_live, n_live + pos_dead)
        return jnp.zeros((B,), jnp.int32).at[slot].set(
            jnp.arange(B, dtype=jnp.int32))

    print(f"B={B}, a: {a.shape} ({a.size*4/1e6:.0f} MB)")
    print(f"take(axis=-1)  [B/4]: {timeit(take, a, order4):8.2f} ms")
    print(f"aos gather     [B/4]: {timeit(aos, a, order4):8.2f} ms")
    print(f"take(axis=-1)  [B]  : {timeit(take, a, order):8.2f} ms")
    print(f"aos gather     [B]  : {timeit(aos, a, order):8.2f} ms")
    print(f"scatter        [B/4]: {timeit(scat, a, order4, b):8.2f} ms")
    print(f"aos scatter    [B/4]: {timeit(aos_scat, a, order4, b):8.2f} ms")
    print(f"transpose only      : {timeit(transp, a):8.2f} ms")
    print(f"argsort ~live  [B]  : {timeit(argsort_f, live):8.2f} ms")
    print(f"cumsum order   [B]  : {timeit(cumsum_order, live):8.2f} ms")




def main2():
    B = int(os.environ.get("B", "131072"))
    rng = np.random.default_rng(0)
    am = jnp.asarray(rng.normal(size=(B, 21, 12)), jnp.float32)  # AoS
    bm = jnp.asarray(rng.normal(size=(B // 4, 21, 12)), jnp.float32)
    live = jnp.asarray(rng.random(B) < 0.2)
    order = jax.block_until_ready(jnp.argsort(jnp.logical_not(live)))
    order4 = jax.block_until_ready(order[:B // 4])

    t0 = jax.jit(lambda a: a + 1.0)          # overhead baseline
    g0 = jax.jit(lambda a, o: jnp.take(a, o, axis=0))
    s0 = jax.jit(lambda a, o, b: a.at[o].set(b))
    # gather axis0 with unique(sorted?) no - random order
    print(f"baseline add   [B,21,12]: {timeit(t0, am):8.2f} ms")
    print(f"take(axis=0)   [B/4]    : {timeit(g0, am, order4):8.2f} ms")
    print(f"take(axis=0)   [B]      : {timeit(g0, am, order):8.2f} ms")
    print(f"scatter(axis=0)[B/4]    : {timeit(s0, am, order4, bm):8.2f} ms")


if __name__ == "__main__":
    if os.environ.get("MODE") == "2":
        main2()
    else:
        main()
