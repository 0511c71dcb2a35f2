"""Multi-device execution: meshes and sharded bundle adjustment."""
