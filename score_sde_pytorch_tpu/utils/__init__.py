"""Small utilities: image grids, logging helpers."""
