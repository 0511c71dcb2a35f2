"""Map save/load.

The reference only has a debug text dump that is never called on-device
(GUICommandHandler("SaveMap"), jni/MapMaker.cc:1254-1286) and NO load path
— SURVEY.md §5 flags real serialization as a capability gap to fill. This
module round-trips the full SLAMMap (points, keyframes incl. pyramids and
SBIs, measurement table) plus the config to a single .npz archive.
"""

from __future__ import annotations

import io
import json

import jax.numpy as jnp
import numpy as np

from visualslam_android_tpu.config import SLAMConfig
from visualslam_android_tpu.models import map_store

_FORMAT_VERSION = 1


def _flatten(prefix, obj, out):
    if isinstance(obj, tuple) and hasattr(obj, "_fields"):  # NamedTuple
        for name, val in zip(obj._fields, obj):
            _flatten(f"{prefix}{name}.", val, out)
    elif isinstance(obj, tuple):
        for i, val in enumerate(obj):
            _flatten(f"{prefix}{i}.", val, out)
    else:
        out[prefix.rstrip(".")] = np.asarray(obj)


def save_map(path, slam_map: map_store.SLAMMap, config: SLAMConfig):
    arrays = {}
    _flatten("map.", slam_map, arrays)
    arrays["__config__"] = np.frombuffer(
        config.to_json().encode(), dtype=np.uint8
    )
    arrays["__version__"] = np.asarray(_FORMAT_VERSION)
    with open(path, "wb") as f:
        np.savez_compressed(f, **arrays)


def export_map_text(out_dir, slam_map: map_store.SLAMMap):
    """Reference-style text export (GUICommandHandler("SaveMap"),
    jni/MapMaker.cc:1254-1286): ``map.dump`` with one line per live map
    point (world position then source level), and ``keyframes/<i>.info``
    with each valid keyframe's 3x4 [R|t] pose (se3CfromW). Debug/interop
    format only — :func:`save_map` is the real checkpoint."""
    import os

    os.makedirs(os.path.join(out_dir, "keyframes"), exist_ok=True)
    pts = slam_map.points
    valid = np.asarray(pts.live())
    pos = np.asarray(pts.pos_w)
    lvl = np.asarray(pts.source_level)
    with open(os.path.join(out_dir, "map.dump"), "w") as f:
        for i in np.nonzero(valid)[0]:
            f.write(
                f"{pos[i, 0]:.9g} {pos[i, 1]:.9g} {pos[i, 2]:.9g}  "
                f"{int(lvl[i])}\n"
            )
    kfs = slam_map.keyframes
    kf_valid = np.asarray(kfs.valid)
    R = np.asarray(kfs.R)
    t = np.asarray(kfs.t)
    for i in np.nonzero(kf_valid)[0]:
        with open(
            os.path.join(out_dir, "keyframes", f"{i}.info"), "w"
        ) as f:
            for r in range(3):
                f.write(
                    f"{R[i, r, 0]:.9g} {R[i, r, 1]:.9g} "
                    f"{R[i, r, 2]:.9g} {t[i, r]:.9g}\n"
                )


def load_map(path):
    """Returns (slam_map, config)."""
    data = np.load(path)
    version = int(data["__version__"])
    if version != _FORMAT_VERSION:
        raise ValueError(f"unsupported map format version {version}")
    config = SLAMConfig.from_json(bytes(data["__config__"]).decode())
    empty = map_store.empty_map(config)

    def rebuild(prefix, template):
        if isinstance(template, tuple) and hasattr(template, "_fields"):
            return type(template)(
                *[
                    rebuild(f"{prefix}{n}.", v)
                    for n, v in zip(template._fields, template)
                ]
            )
        if isinstance(template, tuple):
            return tuple(
                rebuild(f"{prefix}{i}.", v) for i, v in enumerate(template)
            )
        arr = data[prefix.rstrip(".")]
        return jnp.asarray(arr)

    return rebuild("map.", empty), config
