"""Per-stage timing of the tracking hot path on the live backend.

Times each jitted sub-stage of the per-frame pipeline separately so the
bench's steady-state frame time can be attributed. Not part of the test
suite; a developer tool like `bench.py`.
"""

import os
import time

import numpy as np


def timeit(fn, *args, iters=20, **kw):
    import jax

    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    import jax

    cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import functools

    import jax.numpy as jnp

    from visualslam_android_tpu.models import keyframe as kf_mod
    from visualslam_android_tpu.models import tracker
    from visualslam_android_tpu.ops import camera as cam_ops
    from visualslam_android_tpu.ops import lie, match
    from visualslam_android_tpu.utils import fixtures, synthetic

    rng = np.random.default_rng(7)
    config = fixtures.full_config()
    slam_map, cam, scene, (R0, t0), n_pts = fixtures.build_fixed_map(
        config, rng, per_level=(900, 500, 300, 120), px_per_m=240.0
    )
    shape = (config.tracker.height, config.tracker.width)
    with jax.default_device(jax.devices("cpu")[0]):
        img = synthetic.render(scene, cam, R0, t0, shape)
    img = jax.device_put(img, jax.devices()[0])
    key = jax.random.PRNGKey(0)

    make_frame = jax.jit(functools.partial(kf_mod.make_frame, config=config))
    frame = make_frame(img)
    print(f"make_frame:        {timeit(make_frame, img):7.3f} ms")

    pts = slam_map.points
    tc = config.tracker
    image_size = jnp.asarray([tc.width, tc.height], jnp.float32)

    @jax.jit
    def pvs(R, t):
        pc, px, derivs, ok = tracker.project_points(
            cam, pts.pos_w, R, t, image_size
        )
        mr = jnp.einsum("ij,nj->ni", R, pts.pixel_right_w)
        md = jnp.einsum("ij,nj->ni", R, pts.pixel_down_w)
        warp_inv, search_level, wok = match.calc_search_level_and_warp(
            pc, mr, md, derivs
        )
        return pc, px, warp_inv, search_level, ok & wok

    pc, px, warp_inv, search_level, pvs_ok = pvs(R0, t0)
    print(f"pvs+warp:          {timeit(pvs, R0, t0):7.3f} ms")

    @jax.jit
    def mk_templates(warp_inv, search_level):
        return tracker._make_all_templates(slam_map, warp_inv, search_level, 5)

    templates = mk_templates(warp_inv, search_level)
    print(f"templates:         {timeit(mk_templates, warp_inv, search_level):7.3f} ms")

    N = pts.n_slots
    active = pvs_ok & ~templates.bad
    radius = jnp.where(active, 10.0, 0.0)

    coarse = functools.partial(
        match.find_patch_coarse_multilevel, max_range=10
    )
    res = coarse(
        frame.pyramid, frame.corner_mask, templates, px, search_level,
        radius, active,
    )
    print(
        f"fine coarse-search:{timeit(coarse, frame.pyramid, frame.corner_mask, templates, px, search_level, radius, active):7.3f} ms"
    )

    subpix = functools.partial(match.iterate_subpix_multilevel, max_iters=8)
    print(
        f"subpix x8:         {timeit(subpix, frame.pyramid, templates, res.pos_level, search_level, res.found):7.3f} ms"
    )

    # Coarse stage on the compacted 60-point block.
    C = tc.coarse_max
    take = functools.partial(jnp.take, indices=jnp.arange(C), axis=0)
    c_tmpl = match.Templates(*(take(f) for f in templates))

    coarse_wide = functools.partial(
        match.find_patch_coarse_multilevel, max_range=tc.coarse_range
    )
    print(
        f"coarse60 r30:      {timeit(coarse_wide, frame.pyramid, frame.corner_mask, c_tmpl, take(px), take(search_level), jnp.full((C,), 30.0), take(active)):7.3f} ms"
    )

    @jax.jit
    def gn10(R, t, found, found_pos):
        sqrt_inv_noise = 1.0 / (2.0 ** search_level.astype(jnp.float32))

        def body(i, Rt):
            Rc, tcur = Rt
            pc_i = jnp.einsum("ij,nj->ni", Rc, pts.pos_w) + tcur
            safe_z = jnp.where(pc_i[:, 2] > 1e-6, pc_i[:, 2], 1.0)
            m = pc_i[:, :2] / safe_z[:, None]
            px_i, derivs_i = cam_ops.project_derivs(cam, m)
            jac = tracker._point_jacobian(pc_i, derivs_i)
            err = found_pos - px_i
            upd, _ = tracker._calc_pose_update(
                err, jac, sqrt_inv_noise, found, jnp.asarray(0.0, jnp.float32)
            )
            dR, dt = lie.se3_exp(upd)
            return lie.se3_mul(dR, dt, Rc, tcur)

        return jax.lax.fori_loop(0, 10, body, (R, t))

    print(
        f"gn x10 nonlinear:  {timeit(gn10, R0, t0, res.found, res.pos_level):7.3f} ms"
    )

    # Full tracking step for comparison.
    @jax.jit
    def step(img, R, t, key):
        frame = kf_mod.make_frame(img, config)
        out = tracker.track_map(
            frame, slam_map, cam, R, t, jnp.asarray(0.0, jnp.float32),
            key, config,
        )
        return out.R, out.t

    print(f"full step:         {timeit(step, img, R0, t0, key):7.3f} ms")


if __name__ == "__main__":
    main()
