"""Micro-benchmark the fused Ref-NeRF kernels on the real chip.

Serial lax.scan timing (this backend overlaps independent jit calls — see
tools/profile_step.py).  A/B's the directional-kernel glue variants
(T-major vs row-land) and tile sizes, standalone from the full step.

    python -m tools.bench_ref_kernels [--n 197632]
"""

import argparse
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.ops.ref_fused import (
    N_REF_SPA_WS, _make_dir_fused, _make_spa_fused,
    ref_directional_weights_from_params, ref_spatial_weights_from_params,
)

N_ITERS = 20


def timeit_scan(name, body, init_carry):
    f = jax.jit(lambda c: jax.lax.scan(lambda cc, _: (body(cc), ()),
                                       c, None, length=N_ITERS)[0])
    out = f(init_carry)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(init_carry)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N_ITERS * 1e3
    print(f"{name:<52s} {dt:8.3f} ms", file=sys.stderr)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024 * 193)
    ap.add_argument("--tiles", type=int, nargs="+", default=[256])
    ap.add_argument("--spa_bwd_tile", type=int, default=None,
                    help="override the spatial backward tile (default 512)")
    ap.add_argument("--spatial", action="store_true")
    ap.add_argument("--no_dir", action="store_true",
                    help="skip the directional kernels")
    args = ap.parse_args()

    from nerf_tpu.train.config import PipelineConfig
    from nerf_tpu.train.pipeline import init_variables

    cfg = PipelineConfig(model="ref", nerf_width=256, prop_width=256,
                         use_bf16=True)
    params = init_variables(cfg, jax.random.PRNGKey(0))["nerf"]
    ws_spa = ref_spatial_weights_from_params(params)
    ws_dir = ref_directional_weights_from_params(params)

    n = args.n
    k = jax.random.PRNGKey(1)
    heads = jax.random.normal(k, (n, 139), jnp.float32)
    noise = jnp.zeros((n, 128), jnp.float32)
    # the dir kernels take ROW-LAND (3, n) dirs since the row-land
    # boundary change; the normal output comes back (3, n) too
    dirs = jax.random.normal(jax.random.PRNGKey(2), (3, n), jnp.float32)
    enc = jax.random.normal(jax.random.PRNGKey(3), (n, 63), jnp.float32)
    g6 = jax.random.normal(jax.random.PRNGKey(4), (n, 6), jnp.float32) * 0.01

    def chain(x, c):
        return x + 0.0 * c.astype(x.dtype)

    for tile in args.tiles:
        if args.spatial:
            pos = enc[:, :3]
            bt = args.spa_bwd_tile
            spa = _make_spa_fused(jnp.bfloat16, tile, False, True,
                                  bwd_tile=bt)
            timeit_scan(f"spa fwd (tile={tile})", lambda c: jnp.sum(
                spa(ws_spa, chain(enc, c), pos)[0]), jnp.float32(0))

            def spa_fb(c):
                def loss(ws):
                    h, _ = spa(ws, chain(enc, c), pos)
                    return jnp.sum(h * 1e-3)
                gws = jax.grad(loss)(ws_spa)
                return sum(jnp.sum(x) for x in gws).astype(jnp.float32)
            try:
                timeit_scan(f"spa fwd+bwd (tile={tile}, bwd={bt or 512})",
                            spa_fb, jnp.float32(0))
            except Exception as e:
                print(f"spa fwd+bwd (tile={tile}, bwd={bt or 512}) FAILED: "
                      f"{str(e).splitlines()[0][:160]}", file=sys.stderr)

        dir_variants = [] if args.no_dir else [
            (False, "auto"), (True, "auto"), (True, "hand")]
        for rowland, ide_vjp in dir_variants:
            tag = ("rowland" if rowland else "tmajor") + f"/{ide_vjp}"
            try:
                dr = _make_dir_fused(jnp.bfloat16, tile, False, 4, False,
                                     rowland, ide_vjp=ide_vjp)
                timeit_scan(f"dir fwd ({tag}, tile={tile})", lambda c: jnp.sum(
                    dr(ws_dir, chain(heads, c), noise, dirs)[0]),
                    jnp.float32(0))

                def dir_fb(c):
                    def loss(ws, h):
                        rgb, normal, density = dr(ws, h, noise, dirs)
                        return jnp.sum(rgb * g6[:, :3].T) \
                            + jnp.sum(normal * g6[:, 3:].T) \
                            + jnp.sum(density) * 1e-3
                    gws, gh = jax.grad(loss, argnums=(0, 1))(
                        ws_dir, chain(heads, c))
                    return (sum(jnp.sum(x) for x in gws)
                            + jnp.sum(gh)).astype(jnp.float32)
                timeit_scan(f"dir fwd+bwd ({tag}, tile={tile})", dir_fb,
                            jnp.float32(0))
            except Exception as e:
                print(f"dir ({tag}, tile={tile}) FAILED: "
                      f"{str(e).splitlines()[0][:160]}", file=sys.stderr)


if __name__ == "__main__":
    main()
