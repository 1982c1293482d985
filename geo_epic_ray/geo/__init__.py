"""Pure-numpy geometry kernels: quadkey cells, haversine, PIP, affine tiles."""
