"""Lane-compaction permute kernels (ops/permute_pallas) vs jnp.take /
.at[].set — interpret mode. The kernels must be BITWISE exact (one-hot
matmuls pass values through unchanged); the engine's compaction
bitwise-identity guarantee depends on it."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from srbd_nmpc_tpu.ops import permute_pallas as pp


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    yield
    monkeypatch.undo()


def _sorted_idx(rng, B, Bc, clumpy=False):
    if clumpy:
        # clustered live lanes (uneven local density)
        p = np.ones(B)
        p[: B // 3] = 8.0
        p[-B // 5:] = 0.05
        p /= p.sum()
        idx = np.sort(rng.choice(B, size=Bc, replace=False, p=p))
    else:
        idx = np.sort(rng.choice(B, size=Bc, replace=False))
    return jnp.asarray(idx, jnp.int32)


@pytest.mark.parametrize("clumpy", [False, True])
def test_take_lanes_bitwise(interpret_pallas, clumpy):
    rng = np.random.default_rng(3 + clumpy)
    B, Bc = 4096, 1024
    a = jnp.asarray(rng.normal(size=(5, 12, B)), jnp.float32)
    idx = _sorted_idx(rng, B, Bc, clumpy)
    got = pp.take_lanes(a, idx, window=8, force=True)
    ref = jnp.take(a, idx, axis=-1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_take_lanes_window_overflow_falls_back(interpret_pallas):
    # one output block's sources span far more input blocks than the
    # window -> the lax.cond fallback must produce the same result
    rng = np.random.default_rng(9)
    B, Bc = 4096, 512
    a = jnp.asarray(rng.normal(size=(3, B)), jnp.float32)
    # extreme spread: every 8th lane -> span of one 256-output-block is
    # 2048 input lanes = 8 blocks; window=2 overflows
    idx = jnp.asarray(np.arange(0, B, 8, dtype=np.int32)[:Bc])
    got = pp.take_lanes(a, idx, window=2, force=True)
    ref = jnp.take(a, idx, axis=-1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("clumpy", [False, True])
def test_set_lanes_bitwise(interpret_pallas, clumpy):
    rng = np.random.default_rng(17 + clumpy)
    B, Bc = 4096, 1024
    orig = jnp.asarray(rng.normal(size=(4, 12, B)), jnp.float32)
    src = jnp.asarray(rng.normal(size=(4, 12, Bc)), jnp.float32)
    idx = _sorted_idx(rng, B, Bc, clumpy)
    got = pp.set_lanes(orig, src, idx, force=True)
    ref = orig.at[..., idx].set(src)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_set_lanes_dense_prefix(interpret_pallas):
    # compaction's common case: idx = dense prefix 0..Bc-1
    rng = np.random.default_rng(23)
    B, Bc = 2048, 512
    orig = jnp.asarray(rng.normal(size=(7, B)), jnp.float32)
    src = jnp.asarray(rng.normal(size=(7, Bc)), jnp.float32)
    idx = jnp.arange(Bc, dtype=jnp.int32)
    got = pp.set_lanes(orig, src, idx, force=True)
    ref = orig.at[..., idx].set(src)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_ineligible_shapes_fall_back():
    # f64 / non-multiple widths route to jnp.take without pallas
    rng = np.random.default_rng(29)
    a64 = jnp.asarray(rng.normal(size=(3, 512)), jnp.float64)
    idx = jnp.asarray(np.sort(rng.choice(512, size=256, replace=False)),
                      jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(pp.take_lanes(a64, idx)),
        np.asarray(jnp.take(a64, idx, axis=-1)))
    a = jnp.asarray(rng.normal(size=(3, 500)), jnp.float32)
    idx2 = jnp.asarray(np.sort(rng.choice(500, size=100, replace=False)),
                       jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(pp.take_lanes(a, idx2)),
        np.asarray(jnp.take(a, idx2, axis=-1)))
