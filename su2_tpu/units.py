"""US-customary unit handling (SYSTEM_MEASUREMENTS= US).

Reference behavior: the fork converts at every library call site with the
factors 5/9 (R -> K), 3.28084 (m <-> ft), 3.28084^2 (energy), 47.8803
(psf -> Pa), 8.006796 (conductivity) — see the US_System blocks in
SU2_CFD/src/solver_direct_reactive.cpp (e.g. :5993-6015).

Here the conversion happens ONCE at setup: a US config is mapped to SI,
the solver runs in SI (the chemistry tables are SI), and dimensionless
outputs (coefficients, residual orders) are unit-invariant.  Dimensional
outputs are SI; `si_to_us_field` converts restart fields back when US
output is requested.
"""

from __future__ import annotations

FT_PER_M = 3.28084
R_PER_K = 1.8                  # Rankine per Kelvin
PSF_TO_PA = 47.880258888889    # lbf/ft^2 -> Pa
SLUGFT3_TO_KGM3 = 515.378818393
BTU_CONDUCT = 8.006796         # (lbf/(ft s R)) -> W/(m K) divisor family


def us_config_to_si(cfg) -> None:
    """In-place conversion of the dimensional config inputs from US to SI.

    Covers the quantities the shipped option set can carry; gas constant
    converts as velocity^2/temperature.
    """
    if cfg.system_measurements != "US":
        return
    t = lambda x: x / R_PER_K                 # R -> K
    v = lambda x: x / FT_PER_M                # ft/s -> m/s
    p = lambda x: x * PSF_TO_PA               # psf -> Pa

    cfg.freestream_temperature = t(cfg.freestream_temperature)
    cfg.freestream_pressure = p(cfg.freestream_pressure)
    if cfg.freestream_density > 0:
        cfg.freestream_density = cfg.freestream_density * SLUGFT3_TO_KGM3
    cfg.freestream_velocity = [v(x) for x in cfg.freestream_velocity]
    cfg.gas_constant = cfg.gas_constant / (FT_PER_M ** 2) * R_PER_K
    cfg.mu_constant = cfg.mu_constant * PSF_TO_PA          # slug/(ft s)
    cfg.mu_ref = cfg.mu_ref * PSF_TO_PA
    cfg.mu_t_ref = t(cfg.mu_t_ref)
    cfg.sutherland_constant = t(cfg.sutherland_constant)
    cfg.kt_constant = cfg.kt_constant * BTU_CONDUCT
    cfg.temperature_min = t(cfg.temperature_min)
    cfg.temperature_max = t(cfg.temperature_max)
    cfg.marker_isothermal = {k: t(val) for k, val in
                             cfg.marker_isothermal.items()}
    cfg.marker_outlet = {k: p(val) for k, val in cfg.marker_outlet.items()}
    cfg.marker_inlet = {
        k: ((t(v1), p(v2), fdir) if cfg.inlet_type == "TOTAL_CONDITIONS"
            else (t(v1), v(v2), fdir))
        for k, (v1, v2, fdir) in cfg.marker_inlet.items()}
    cfg.marker_supersonic_inlet = {
        k: (t(v1), p(v2), tuple(v(x) for x in vel))
        for k, (v1, v2, vel) in cfg.marker_supersonic_inlet.items()}
    cfg.fuel_temperature = t(cfg.fuel_temperature)
    cfg.fuel_density = cfg.fuel_density * SLUGFT3_TO_KGM3
    # mark as converted so a second call is a no-op
    cfg.system_measurements = "SI"


def si_to_us_field(name: str, value):
    """Convert a named SI output field to US units (for US-output writers)."""
    if name.startswith("T"):
        return value * R_PER_K
    if name.startswith("P"):
        return value / PSF_TO_PA
    if name.startswith(("U", "V", "W", "Velocity")):
        return value * FT_PER_M
    return value
