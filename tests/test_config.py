"""Config loader tests: reference-schema YAML parses unchanged."""

import pytest

from srbd_nmpc_tpu.utils.config import MpcOptions, load_mpc_options

REFERENCE_YAML = """\
MPC:
  Q: [0,0,0,0,0,0,0,0,0,0,0,10]
  Qf: [0.5,0.5,0.5,0.01,0.01,0.01,100,100,100,0.0,0.0,100.0]
  R: 0.0001
  dt_MPC: 0.015
  horizon_MPC: 20
  sqp_max_loop: 15

Physical:
  Lbody: [0.541667, 0.516667, 1.0416667]

N_rep: 100

mu_b: 0.1
theta_b: 5.0
"""


def test_loads_reference_schema(tmp_path):
    p = tmp_path / "mpc_option.yaml"
    p.write_text(REFERENCE_YAML)
    opts = load_mpc_options(str(p))
    assert opts == MpcOptions.default()


def test_missing_key_error_names_key(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("MPC:\n  Q: [0,0,0,0,0,0,0,0,0,0,0,1]\n")
    with pytest.raises(KeyError, match="MPC.Qf"):
        load_mpc_options(str(p))


def test_wrong_length_rejected(tmp_path):
    p = tmp_path / "bad2.yaml"
    p.write_text(REFERENCE_YAML.replace("Q: [0,0,0,0,0,0,0,0,0,0,0,10]",
                                        "Q: [0,0,0]"))
    with pytest.raises(ValueError, match="12 entries"):
        load_mpc_options(str(p))


def test_ipm_settings_presets_and_validation():
    from srbd_nmpc_tpu.ocpqp.settings import IpmMode, IpmSettings

    s = IpmSettings.preset(IpmMode.BALANCE, iter_max=40)
    assert s.mode == IpmMode.BALANCE and s.iter_max == 40
    assert s.tol_stat == 1e-8
    s.check()

    import pytest
    with pytest.raises(ValueError, match="alpha_min"):
        IpmSettings(alpha_min=2.0).check()
    with pytest.raises(ValueError, match="mu0"):
        IpmSettings(mu0=-1.0).check()
    with pytest.raises(ValueError, match="iter_max"):
        IpmSettings(iter_max=-1).check()
