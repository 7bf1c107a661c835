"""Component-level timing of the train step on the real chip.

IMPORTANT: this backend executes independent jit calls concurrently, so naive
"loop 20 calls, block once" timing under-reports by the concurrency factor.
Every benchmark here is a lax.scan whose carry feeds each iteration's input,
forcing serial execution — the numbers are true device latencies.

Run as: python -m tools.profile_step
"""

import sys
import time

import jax
import jax.numpy as jnp

from nerf_tpu.core import render as render_lib
from nerf_tpu.core import sampling
from nerf_tpu.train.config import PipelineConfig
from nerf_tpu.train.pipeline import init_variables, make_models, render_rays_train
from nerf_tpu.train.step import compute_loss

N_ITERS = 30


def timeit_scan(name, body, init_carry):
    """body(carry) -> carry; scanned N_ITERS times, serial by construction."""
    f = jax.jit(lambda c: jax.lax.scan(lambda cc, _: (body(cc), ()),
                                       c, None, length=N_ITERS)[0])
    out = f(init_carry)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(init_carry)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N_ITERS * 1e3
    print(f"{name:<40s} {dt:8.3f} ms", file=sys.stderr)
    return dt


def main():
    cfg = PipelineConfig(ray_batch=1024, n_coarse=64, n_fine=128,
                         nerf_width=256, prop_width=256, use_bf16=True)
    models = make_models(cfg)
    nerf, prop = models
    params = init_variables(cfg, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    R = cfg.ray_batch

    rays = jnp.concatenate([
        jnp.tile(jnp.asarray([[0.0, 0.0, 4.0]]), (R, 1)),
        jax.random.normal(jax.random.PRNGKey(2), (R, 3)) * 0.1
        + jnp.asarray([0.0, 0.0, -1.0]),
    ], axis=-1)
    rgb_gt = jax.random.uniform(jax.random.PRNGKey(3), (R, 3))

    c_z = sampling.stratified_samples(key, R, cfg.n_coarse, cfg.near, cfg.far)
    c_pts = render_lib.lengths_to_points(rays, c_z)
    w = jax.random.uniform(jax.random.PRNGKey(4), (R, cfg.n_coarse)) + 0.01
    f_z = jnp.sort(jax.random.uniform(jax.random.PRNGKey(5), (R, cfg.n_fine),
                                      minval=2, maxval=6), axis=-1)
    f_pts = render_lib.lengths_to_points(rays, f_z)
    f_dirs = jnp.broadcast_to(rays[:, None, 3:], f_pts.shape)

    def chain(x, scalar):
        """Make x depend on a scalar from the previous iteration."""
        return x + 0.0 * scalar.astype(x.dtype)

    timeit_scan("prop forward", lambda c: jnp.sum(
        prop.apply({"params": params["prop"]}, chain(c_pts, c))
    ).astype(jnp.float32), jnp.float32(0))

    timeit_scan("fine forward", lambda c: jnp.sum(
        nerf.apply({"params": params["nerf"]}, chain(f_pts, c), f_dirs)[0]
    ), jnp.float32(0))

    def fine_fwd_bwd(c):
        def loss(p):
            rgb, sigma = nerf.apply({"params": p}, chain(f_pts, c), f_dirs)
            return jnp.mean((rgb - rgb_gt[:, None]) ** 2) + jnp.mean(sigma**2)
        g = jax.grad(loss)(params["nerf"])
        return sum(jnp.sum(x) for x in jax.tree.leaves(g)).astype(jnp.float32)
    timeit_scan("fine fwd+bwd", fine_fwd_bwd, jnp.float32(0))

    timeit_scan("inverse_sample(sort)", lambda c: jnp.sum(
        sampling.inverse_sample(key, chain(w, c), c_z, cfg.n_fine + 1, sort=True)[0]
    ), jnp.float32(0))

    timeit_scan("merge_coarse_fine", lambda c: jnp.sum(
        sampling.merge_coarse_fine(chain(c_z, c), f_z,
                                   jnp.zeros((R, cfg.n_fine), jnp.int32))[0]
    ), jnp.float32(0))

    sig_f = jax.random.normal(jax.random.PRNGKey(6), (R, cfg.n_fine))
    timeit_scan("transmittance+composite", lambda c: jnp.sum(
        render_lib.composite(jnp.ones((*sig_f.shape, 3)), chain(sig_f, c),
                             f_z, rays[:, 3:])[0]
    ), jnp.float32(0))

    timeit_scan("full fwd (render_rays_train)", lambda c: jnp.sum(
        render_rays_train(models, params, chain(rays, c), key, cfg)["fine_rgb"]
    ), jnp.float32(0))

    timeit_scan("full loss fwd+bwd", lambda c: sum(
        jnp.sum(x) for x in jax.tree.leaves(
            jax.grad(lambda p: compute_loss(
                models, p, chain(rays, c), rgb_gt, key, cfg)[0])(params)
        )
    ).astype(jnp.float32), jnp.float32(0))


if __name__ == "__main__":
    main()
