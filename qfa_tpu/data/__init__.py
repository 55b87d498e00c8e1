"""Data layer: wavelength grid, batches, catalog, loaders, synthetic data."""

from .batch import SpectraBatch, pad_batch
from .grid import LYA_WAVELENGTH, WavelengthGrid, make_grid

__all__ = ["SpectraBatch", "pad_batch", "LYA_WAVELENGTH", "WavelengthGrid", "make_grid"]
