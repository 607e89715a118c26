"""Device-side relational kernels (pure JAX reference impls; Pallas fast
paths live alongside and are selected by the physical planner)."""
