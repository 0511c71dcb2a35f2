"""Distributed bundle adjustment: point/measurement blocks sharded across a
device mesh.

The reference is single-threaded (its mapping thread is even disabled,
jni/MapMaker.cc:55-56) and assembles one dense reduced camera system
serially (jni/Bundle.cc:353-437). The TPU-native design (SURVEY.md §2
"parallelism strategies", §7.9, BASELINE.json north star):

- the map's POINTS and their point-major measurement rows are sharded
  along a 1-D mesh axis (pure data parallelism over the reduced system's
  summands);
- cameras (a few hundred 6-DoF poses) are replicated;
- each device computes its shard's U / eps_a contributions and Schur
  correction blocks, which are combined with `psum` over ICI;
- every device solves the identical replicated reduced camera system
  (the [6K x 6K] Cholesky is tiny next to the correction assembly) and
  back-substitutes ITS OWN points locally.

This file only lays the sharding over models/bundle.py's `bundle_adjust`
(which takes the `axis_name` and places the psums); the math is identical
to the single-device path, which the tests exploit: sharded result ==
unsharded result.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from visualslam_android_tpu.models.bundle import (
    BAProblem,
    BAResult,
    bundle_adjust,
)

AXIS = "points"


def make_mesh(devices=None, axis=AXIS) -> Mesh:
    import numpy as np

    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis,))


def pad_problem(prob: BAProblem, multiple: int) -> BAProblem:
    """Pad the point dimension to a multiple of the mesh size (padded
    slots are invalid points with no valid measurements)."""
    N = prob.points.shape[0]
    pad = (-N) % multiple
    if pad == 0:
        return prob

    def padN(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

    return BAProblem(
        cam_R=prob.cam_R, cam_t=prob.cam_t,
        cam_fixed=prob.cam_fixed, cam_valid=prob.cam_valid,
        points=padN(prob.points),
        point_valid=padN(prob.point_valid),
        meas_kf=padN(prob.meas_kf),
        meas_uv=padN(prob.meas_uv),
        meas_sqrt_inv_noise=padN(prob.meas_sqrt_inv_noise),
        meas_valid=padN(prob.meas_valid),
    )


def pack_problem_camblock(prob: BAProblem, n_dev: int, band: int):
    """Pack points into camera-block bins for reduce_mode='halo': device
    d gets exactly the points whose MINIMUM observing camera lies in its
    contiguous block [d*K/D, (d+1)*K/D), so every contribution it makes
    to the reduced camera system lands in its own block or the first
    `band` rows of the next one (its observations span at most `band`
    camera indices — the same precondition the band assembly already
    has). Bins are padded to equal size with invalid point slots.

    Returns (packed_prob, orig_idx [N'] int32 with -1 on padding) —
    scatter point-side outputs back through orig_idx to recover the
    caller's point order. Host-side numpy, not traced."""
    import numpy as np

    K = prob.cam_R.shape[0]
    if K % n_dev != 0:
        raise ValueError(f"K={K} not divisible by n_dev={n_dev}")
    rows = K // n_dev
    if band > rows:
        raise ValueError(f"band={band} > rows-per-device={rows}")

    kf = np.asarray(prob.meas_kf)
    mv = np.asarray(prob.meas_valid) & np.asarray(prob.point_valid)[:, None]
    has = mv.any(axis=1)
    lo = np.where(mv, kf, np.iinfo(np.int32).max).min(axis=1)
    hi = np.where(mv, kf, np.iinfo(np.int32).min).max(axis=1)
    if has.any() and int((hi - lo)[has].max()) > band:
        raise ValueError(
            f"camera span {int((hi - lo)[has].max())} exceeds band={band}"
        )
    bins = np.where(has, np.clip(lo, 0, K - 1) // rows, 0)

    idx_by_bin = [np.nonzero(bins == d)[0] for d in range(n_dev)]
    cap = max(max((len(ix) for ix in idx_by_bin), default=1), 1)
    orig = np.full((n_dev, cap), -1, np.int32)
    for d, ix in enumerate(idx_by_bin):
        orig[d, : len(ix)] = ix
    orig = orig.reshape(-1)
    safe = np.maximum(orig, 0)
    pad = orig < 0

    packed = BAProblem(
        cam_R=prob.cam_R, cam_t=prob.cam_t,
        cam_fixed=prob.cam_fixed, cam_valid=prob.cam_valid,
        points=jnp.asarray(np.asarray(prob.points)[safe]),
        point_valid=jnp.asarray(
            np.asarray(prob.point_valid)[safe] & ~pad
        ),
        meas_kf=jnp.asarray(np.asarray(prob.meas_kf)[safe]),
        meas_uv=jnp.asarray(np.asarray(prob.meas_uv)[safe]),
        meas_sqrt_inv_noise=jnp.asarray(
            np.asarray(prob.meas_sqrt_inv_noise)[safe]
        ),
        meas_valid=jnp.asarray(
            np.asarray(prob.meas_valid)[safe] & ~pad[:, None]
        ),
    )
    return packed, orig


def unpack_point_outputs(res: BAResult, orig_idx, n_points: int):
    """Scatter a packed run's point-side outputs back to the original
    point order (padding slots dropped)."""
    import numpy as np

    keep = orig_idx >= 0
    dst = orig_idx[keep]

    def scat(x, fill=0):
        a = np.asarray(x)
        out = np.full((n_points,) + a.shape[1:], fill, a.dtype)
        out[dst] = a[keep]
        return jnp.asarray(out)

    return res._replace(
        points=scat(res.points),
        meas_valid=scat(res.meas_valid, False),
        outlier_meas=scat(res.outlier_meas, False),
        point_outliers=scat(res.point_outliers),
    )


def comm_bytes_per_lm_step(K, N_global, O, solver="pcg", cg_iters=250,
                           inner_iters=1, dtype_bytes=4,
                           assembly="scatter", band_halfwidth=16,
                           sigma_mode="gather", hist_bins=512,
                           reduce_mode="psum"):
    """Logical all-reduce/all-gather payload per LM outer step of
    `bundle_adjust(axis_name=...)` — the communication the sharding
    design puts on ICI, itemized so strong-scaling projections can be made
    without multi-host hardware (BASELINE 'BA scaling efficiency').

    Returned sizes are PAYLOAD bytes per step (what every device must end
    up holding); a ring all-reduce moves ~2*(D-1)/D of the payload per
    device, an all-gather (D-1)/D — multiply by those factors for
    on-the-wire bytes at mesh size D.

    Breakdown (models/bundle.py):
    - sigma_gather: sigma_mode='gather' -> all_gather of the global error
      table for the MAD sigma (err_sq f32 + ok bool per measurement, the
      largest collective at KITTI scale); sigma_mode='hist' -> one
      [hist_bins] f32 histogram psum;
    - u_eps: psum of the camera accumulators U [K,6,6] + eps_a [K,6];
    - solve: solver='pcg' -> E_corr [K,6] psum + one [K,6] psum per CG
      iteration per inner lambda iteration; solver='band_pcg' or 'chol'
      with assembly='band' -> S_band [K, 2P+1, 6, 6] + E_corr psums per
      inner iteration (CG/solve then run locally with no collectives);
      assembly='scatter'/'onehot' -> the dense S_corr [K,6,K,6] + E_corr
      psums;
    - scalars: objective/update-norm psums (negligible, counted anyway).
    """
    b = {}
    if sigma_mode == "hist":
        b["sigma_gather"] = hist_bins * dtype_bytes
    else:
        b["sigma_gather"] = N_global * O * (dtype_bytes + 1)
    if reduce_mode == "halo":
        # Camera-block-packed points (pack_problem_camblock): per LM
        # step, ONE right-neighbor ppermute of the band_halfwidth-row
        # halo strip (wire bytes ~= payload, D-independent) plus tiled
        # all-gathers of the owned rows ((D-1)/D of payload on the
        # wire). Only the upper half band is ever communicated.
        row_inner = ((band_halfwidth + 1) * 36 + 6) * dtype_bytes
        b["u_eps"] = K * 42 * dtype_bytes                 # all-gather x1
        b["solve"] = inner_iters * K * row_inner          # all-gather
        b["halo_strip"] = band_halfwidth * (
            42 + inner_iters * ((band_halfwidth + 1) * 36 + 6)
        ) * dtype_bytes                                   # ppermute
        b["scalars"] = (3 + inner_iters) * dtype_bytes
        b["total"] = sum(b.values())
        return b
    b["u_eps"] = K * 36 * dtype_bytes + K * 6 * dtype_bytes
    if solver == "pcg":
        b["solve"] = inner_iters * (
            K * 6 * dtype_bytes * (1 + cg_iters)
        )
    elif solver == "band_pcg" or assembly == "band":
        b["solve"] = inner_iters * (
            K * (2 * band_halfwidth + 1) * 36 * dtype_bytes
            + K * 6 * dtype_bytes
        )
    else:
        b["solve"] = inner_iters * (
            K * 6 * K * 6 * dtype_bytes + K * 6 * dtype_bytes
        )
    b["scalars"] = (3 + inner_iters) * dtype_bytes
    b["total"] = sum(b.values())
    return b


def sharded_bundle_adjust_jit(
    prob: BAProblem, cam, mesh: Mesh,
    max_iters: int = 20, point_block: int = 1024,
    assembly: str = "onehot", solver: str = "chol",
    cg_iters: int = 250, cg_tol: float = 1e-6,
    **ba_kwargs,
):
    """The jitted sharded-BA step and its padded problem, NOT yet run —
    so callers can also `.lower(...).compile()` it and inspect the HLO
    XLA actually emitted (tools/measure_ba_scaling.py audits the
    collective ops/bytes against the analytic comm model this way)."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    prob = pad_problem(prob, n_dev)

    shard = P(axis)
    repl = P()
    in_specs = BAProblem(
        cam_R=repl, cam_t=repl, cam_fixed=repl, cam_valid=repl,
        points=shard, point_valid=shard,
        meas_kf=shard, meas_uv=shard,
        meas_sqrt_inv_noise=shard, meas_valid=shard,
    )
    out_specs = BAResult(
        cam_R=repl, cam_t=repl,
        points=shard,
        meas_valid=shard, outlier_meas=shard, point_outliers=shard,
        accepted=repl, converged=repl, sigma_squared=repl,
    )

    fn = shard_map(
        lambda p, c: bundle_adjust(
            p, c, max_iters=max_iters, point_block=point_block,
            axis_name=axis,
            assembly=assembly, solver=solver,
            cg_iters=cg_iters, cg_tol=cg_tol, **ba_kwargs,
        ),
        mesh=mesh,
        in_specs=(in_specs, P()),
        out_specs=out_specs,
        check_rep=False,
    )
    return jax.jit(fn), prob


def sharded_bundle_adjust(
    prob: BAProblem, cam, mesh: Mesh,
    max_iters: int = 20, point_block: int = 1024,
    assembly: str = "onehot", solver: str = "chol",
    cg_iters: int = 250, cg_tol: float = 1e-6,
    **ba_kwargs,
) -> BAResult:
    """Run bundle_adjust with points/measurements sharded over `mesh`.

    Output point-side arrays come back fully assembled (the mesh axis is
    all-gathered by the out sharding); camera-side and scalar outputs are
    replicated and identical on every device.
    """
    fn, padded = sharded_bundle_adjust_jit(
        prob, cam, mesh, max_iters=max_iters, point_block=point_block,
        assembly=assembly, solver=solver, cg_iters=cg_iters,
        cg_tol=cg_tol, **ba_kwargs,
    )
    return fn(padded, cam)


def sharded_bundle_adjust_halo(
    prob: BAProblem, cam, mesh: Mesh, band_halfwidth: int = 16,
    max_iters: int = 20, point_block: int = 1024,
    cg_iters: int = 250, cg_tol: float = 1e-6,
    **ba_kwargs,
) -> BAResult:
    """Locality-aware sharded band BA: pack points by camera block
    (pack_problem_camblock), run band_pcg with reduce_mode='halo'
    (ppermute halo strip + half-band all-gather instead of the full-band
    all-reduce), and unpack point-side outputs to the caller's order.
    Camera-side and scalar outputs are replicated as usual."""
    n_dev = mesh.devices.size
    K = prob.cam_R.shape[0]
    N = prob.points.shape[0]
    packed, orig = pack_problem_camblock(prob, n_dev, band_halfwidth)
    res = sharded_bundle_adjust(
        packed, cam, mesh, max_iters=max_iters, point_block=point_block,
        assembly="band", solver="band_pcg", cg_iters=cg_iters,
        cg_tol=cg_tol, band_halfwidth=band_halfwidth,
        reduce_mode="halo", shard_rows=K // n_dev,
        sigma_mode=ba_kwargs.pop("sigma_mode", "hist"), **ba_kwargs,
    )
    return unpack_point_outputs(res, orig, N)
