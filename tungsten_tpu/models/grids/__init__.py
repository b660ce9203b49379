from .grid import (
    DenseGrid,
    grid_density,
    grid_emission,
    grid_inverse_optical_depth,
    grid_march,
    grid_optical_depth,
    load_grid_spec,
)

__all__ = [
    "DenseGrid",
    "grid_density",
    "grid_emission",
    "grid_inverse_optical_depth",
    "grid_march",
    "grid_optical_depth",
    "load_grid_spec",
]
