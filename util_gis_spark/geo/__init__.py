"""Pure-numpy / pure-Column geo kernels (no shapely/h3/pyproj in this env)."""
