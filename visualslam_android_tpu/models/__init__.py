"""SLAM data model and pipeline stages: map store, keyframe front-end,
tracker, initializer, bundle adjustment, mapmaker, relocalizer."""
