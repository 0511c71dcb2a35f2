"""Pure compute ops: Lie groups, camera model, robust estimators, image
kernels, patch matching. Everything is batched, fixed-shape, and jittable."""
