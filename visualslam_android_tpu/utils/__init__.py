"""Utilities: synthetic scenes, dataset loaders, trajectory evaluation,
serialization, profiling."""
