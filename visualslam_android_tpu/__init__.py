"""TPU-native PTAM-class monocular SLAM engine (JAX / XLA / Pallas / pjit).

A brand-new framework with the capabilities of the reference
``ahcorde/visualSLAM_Android`` (PTAM ported to Android, C++/JNI) but an
idiomatic TPU-first architecture:

- per-pixel loops (FAST corners, patch ZMSSD search, subpixel refinement,
  ESM alignment) become dense, batched, MXU-friendly kernels;
- dynamic data structures (pointer map graph, STL measurement maps) become
  fixed-shape struct-of-arrays with validity masks;
- the tracker/mapmaker thread split becomes a foreground jitted tracking
  step plus separately dispatched jitted mapping stages;
- global bundle adjustment shards point/measurement blocks across a device
  mesh, assembling the reduced (Schur) camera system with psum over ICI.

See SURVEY.md at the repo root for the reference capability blueprint.
"""

import jax as _jax

# Geometry code (Lie groups, camera Jacobians, normal equations) needs true
# f32 matmuls; TPU defaults to bf16 passthrough for f32 dots, which costs
# ~1e-3 absolute error on small dense algebra. Hot image kernels that can
# tolerate bf16 opt in explicitly with precision=DEFAULT at the call site.
_jax.config.update("jax_default_matmul_precision", "highest")

from visualslam_android_tpu.config import SLAMConfig  # noqa: E402

__version__ = "0.1.0"
__all__ = ["SLAMConfig", "__version__"]
