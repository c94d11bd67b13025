import os

from su2_tpu.config import Config


def test_combustion_cfg(combustion_dir):
    cfg = Config(os.path.join(combustion_dir, "my_combustion_second_chem_PaSR.cfg"))
    assert cfg.physical_problem == "REACTIVE_NAVIER_STOKES"
    assert cfg.kind_turb_model == "SST"
    assert cfg.solver_kind == "REACTIVE_RANS"
    assert cfg.config_lib_file == "test_chem_second.txt"
    assert cfg.species_order == ["C4H6", "H2O", "O2", "CO", "CO2", "H2", "O", "OH", "H"]
    assert cfg.nspecies == 9
    assert cfg.freestream_mass_frac[2] == 1.0
    assert cfg.pasr_lb == 0.2
    assert cfg.restart_sol is True
    assert cfg.ignition is False
    assert cfg.fuel_index == 0 and cfg.oxidizer_index == 2
    assert cfg.inlet_type == "TEMPERATURE_IMPOSE"
    assert cfg.marker_inlet["Oxidizer_Inlet"] == (300.0, 20.0, (1.0, 0.0, 0.0))
    assert cfg.marker_inlet["Fuel_Inlet"] == (800.0, 0.87, (0.0, 1.0, 0.0))
    assert cfg.inlet_mass_frac["Fuel_Inlet"][0] == 1.0
    assert cfg.inlet_mass_frac["Oxidizer_Inlet"][2] == 1.0
    assert cfg.marker_outlet == {"Outlet": 101325.0}
    assert cfg.marker_isothermal == {
        "upper_wall": 300.0, "lower_wall_pre": 300.0, "lower_wall_post": 600.0}
    assert cfg.cfl_number == 0.1
    assert cfg.time_discre_flow == "EULER_EXPLICIT"
    assert cfg.time_discre_turb == "EULER_IMPLICIT"
    assert not cfg.implicit_flow and cfg.implicit_turb
    assert not cfg.muscl_flow
    assert cfg.linear_solver == "FGMRES"
    assert cfg.linear_solver_prec == "LU_SGS"
    assert cfg.linear_solver_error == 1e-6
    assert cfg.linear_solver_iter == 5
    assert cfg.residual_reduction == 6.0
    assert cfg.residual_minval == -4.0
    assert cfg.ext_iter == 50000
    assert cfg.num_method_grad == "WEIGHTED_LEAST_SQUARES"
    assert cfg.mesh_filename == "mesh_stretched.su2"


def test_flatplate_cfg(flatplate_dir):
    cfg = Config(os.path.join(flatplate_dir, "my_turbulent_flatplate_air.cfg"))
    assert cfg.solver_kind == "REACTIVE_RANS"
    assert cfg.nspecies == 3
    assert cfg.species_order == ["O2", "CO2", "N2"]
    assert cfg.mach_number == 0.2
    assert cfg.reynolds_number == 500000
    assert cfg.muscl_flow
    assert cfg.implicit_flow
    assert cfg.marker_heatflux == {"wall": 0.0}
    assert cfg.marker_euler == ["symmetry"]
    assert cfg.marker_outlet == {"outlet": 97250.0, "farfield": 97250.0}
    assert cfg.marker_inlet["inlet"] == (300.0, 100000.0, (1.0, 0.0, 0.0))
    assert cfg.inlet_type == "TOTAL_CONDITIONS"
    assert cfg.cfl_number == 9.0
    assert cfg.residual_minval == -7.0


def test_defaults_and_unknown():
    cfg = Config(text="PHYSICAL_PROBLEM= EULER\nSOME_FUTURE_OPT= 3\n")
    assert cfg.solver_kind == "EULER"
    assert cfg.temperature_min == 200.0
    assert cfg.temperature_max == 6000.0
    assert cfg.pasr_lb == 1.0
    assert "SOME_FUTURE_OPT" in cfg.extra
    assert not cfg.reactive and not cfg.viscous


def test_reference_option_surface_hardening():
    """Full SU2 v5 option surface: unsupported features raise loudly when
    enabled, disabled values and ignorable/output options parse with a
    warning (VERDICT round-2 item 8; reference registry
    config_structure.cpp:545+)."""
    import warnings

    import pytest

    from su2_tpu.config import Config
    from su2_tpu import config_options as co

    assert len(co.REFERENCE_OPTIONS) >= 450
    base = "PHYSICAL_PROBLEM= EULER\nMESH_FILENAME= x.su2\n"
    # enabled unsupported features fail loudly
    # (GRID_MOVEMENT_KIND / ROTATION_RATE_* became SUPPORTED in round 3;
    # MARKER_RIEMANN became SUPPORTED in round 4 — solvers/riemann.py;
    # AXISYMMETRIC / GRAVITY_FORCE became SUPPORTED in round 5 —
    # solvers/euler.py body sources)
    for line in ("MARKER_NRBC= ( in, TOTAL_CONDITIONS_PT, 1e5, 300, 1, 0, 0 )",
                 "TIME_INSTANCES= 3"):
        with pytest.raises(ValueError):
            Config(text=base + line + "\n")
    # disabled values and output/tooling options parse (with warnings)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        Config(text=base + "MARKER_NRBC= ( NONE )\nAXISYMMETRIC= NO\n"
               "WRT_HALO= YES\nVOLUME_WAVE_FILENAME= wave\n"
               "OPT_ITERATIONS= 100\n")
    # the round-4 Riemann markers parse as active options
    cfg = Config(text=base + "MARKER_RIEMANN= ( in, TOTAL_CONDITIONS_PT, "
                 "1e5, 300, 1, 0, 0 )\n")
    assert cfg.marker_riemann["in"][0] == "TOTAL_CONDITIONS_PT"
