"""The bench.py parity gate must actually trip on Mosaic-scale drift.

VERDICT r3 Weak #7: the old absolute 1e-3 bound on ~100 N-scale forces
was ~10x looser than the relative bar the reference's oracles imply; this
sandbox test injects synthetic relative drift into the gate's comparison
metric and asserts the gate logic flags it (and does not flag f32 noise).
"""
import os
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _u_ref():
    rng = np.random.default_rng(0)
    # converged stance forces: ~100 N verticals, near-zero tangentials
    u = rng.normal(size=(64, 20, 12)) * 3.0
    u[:, :, [2, 8]] += 100.0
    return jnp.asarray(u, jnp.float32)


def test_gate_trips_on_relative_drift():
    u = _u_ref()
    drift = u * (1.0 + 3.0 * bench.REL_TOL)   # 3e-4 relative drift
    assert bench.parity_metric(drift, u) > bench.REL_TOL


def test_gate_trips_on_small_element_drift():
    # drift on a NEAR-ZERO element that an absolute 1e-3 gate on
    # 100-scale forces would wave through
    u = _u_ref()
    scale = 0.01 * float(jnp.max(jnp.abs(u)))
    drift = u.at[0, 0, 1].add(5.0 * bench.REL_TOL * scale)
    assert bench.parity_metric(drift, u) > bench.REL_TOL


def test_gate_passes_f32_noise():
    u = _u_ref()
    noisy = u * (1.0 + 1e-6)                  # ~10 ulp f32
    assert bench.parity_metric(noisy, u) < bench.REL_TOL


def test_gate_zero_reference_safe():
    z = jnp.zeros((4, 20, 12), jnp.float32)
    assert bench.parity_metric(z, z) == 0.0
