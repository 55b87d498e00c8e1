"""Domain physics: optical-depth laws, Lyman-series data, smoothing."""

from .lyman import COEFF, LYA_WAVELENGTH, N_LINES, OSCILLATOR_STRENGTH, WAVELENGTH
from .smoothing import sliding_mean, smooth_curve
from .tau import (
    TAU_LAWS,
    get_tau_law,
    n_contributing_lines,
    omega_func,
    tau,
    tau_becker,
    tau_fg,
    tau_hi,
    tau_kamble,
    tau_mock,
    tau_total,
)

__all__ = [
    "COEFF",
    "LYA_WAVELENGTH",
    "N_LINES",
    "OSCILLATOR_STRENGTH",
    "WAVELENGTH",
    "TAU_LAWS",
    "get_tau_law",
    "n_contributing_lines",
    "omega_func",
    "tau",
    "tau_becker",
    "tau_fg",
    "tau_hi",
    "tau_kamble",
    "tau_mock",
    "tau_total",
    "sliding_mean",
    "smooth_curve",
]
