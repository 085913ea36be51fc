"""Independent validation integrators (no JAX, no shared compute code)."""
