"""CLI runner smoke test (controlLoop parity layer)."""

import jax.numpy as jnp

from srbd_nmpc_tpu.nmpc import runner
from srbd_nmpc_tpu.utils.config import MpcOptions
import dataclasses


def test_run_control_loop_smoke(capsys):
    opts = dataclasses.replace(MpcOptions.default(), horizon=8, sqp_max_loop=10,
                               n_rep=2)
    out = runner.run_control_loop(opts, batch=4, dtype=jnp.float64, nrep=2)
    assert out["converged"] == 4
    assert out["solves_per_s"] > 0
    text = capsys.readouterr().out
    assert "Average NMPC solution time" in text   # the reference's printout
    assert "NMPC horizon: 8" in text


def test_build_from_options_maps_reference_schema():
    opts = MpcOptions.default()
    params, weights, cfg = runner.build_from_options(opts, jnp.float64)
    assert cfg.N == 20 and cfg.sqp_max_iter == 15
    assert float(params.dt) == 0.015
    # Qf = N * diag(Qf_yaml)  (NMPC_solver.cpp:58)
    assert float(weights.Qf[6, 6]) == 20 * 100.0
