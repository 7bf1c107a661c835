"""Micro-benchmark the fused vanilla kernels on the real chip.

A/B's the recompute-form backward (default) against the residual-storing
variant (store_residuals=True: the forward writes 9 activations to HBM, the
backward streams them back instead of re-running the forward matmuls).
Serial lax.scan timing, like tools/bench_ref_kernels.

    python -m tools.bench_vanilla_kernels [--n 132096] [--tiles 1024]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp

from nerf_tpu.ops.fused_mlp import make_vanilla_fused
from nerf_tpu.ops import vanilla_weights_from_params

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
    ap.add_argument("--n", type=int, default=1024 * 129)
    ap.add_argument("--tiles", type=int, nargs="+", default=[1024])
    args = ap.parse_args()

    from nerf_tpu.train.config import PipelineConfig
    from nerf_tpu.train.pipeline import init_variables

    cfg = PipelineConfig(model="vanilla", nerf_width=256, prop_width=256,
                         use_bf16=True)
    params = init_variables(cfg, jax.random.PRNGKey(0))["nerf"]
    ws = vanilla_weights_from_params(params)

    n = args.n
    enc_x = jax.random.normal(jax.random.PRNGKey(1), (n, 63), jnp.float32)
    enc_d = jax.random.normal(jax.random.PRNGKey(2), (n, 27), jnp.float32)
    g_rgb = jax.random.normal(jax.random.PRNGKey(3), (3, n), jnp.float32) * .01
    g_sig = jax.random.normal(jax.random.PRNGKey(4), (n,), jnp.float32) * .01

    def chain(x, c):
        return x + 0.0 * c.astype(x.dtype)

    for tile in args.tiles:
        for store in (False, True):
            tag = "residual" if store else "recompute"
            fused = make_vanilla_fused(jnp.bfloat16, tile, False,
                                       store_residuals=store)
            timeit_scan(f"vanilla fwd ({tag}, tile={tile})",
                        lambda c: jnp.sum(fused(ws, chain(enc_x, c),
                                                enc_d)[0]),
                        jnp.float32(0))

            def fb(c):
                def loss(w):
                    rgb, sigma = fused(w, chain(enc_x, c), enc_d)
                    return jnp.sum(rgb * g_rgb) + jnp.sum(sigma * g_sig)
                # value_and_grad + carrying the value: with jax.grad alone
                # the primal outputs feed only the DISCARDED loss value and
                # XLA dead-code-eliminates the entire forward custom call —
                # the recompute-form "fwd+bwd" numbers before 2026-08-19
                # were backward-only (the residual variant's forward stayed
                # live through its stored activations, so that A/B compared
                # fwd+bwd against bwd alone)
                val, gws = jax.value_and_grad(loss)(ws)
                return (val + sum(jnp.sum(x) for x in gws)).astype(
                    jnp.float32)
            try:
                timeit_scan(f"vanilla fwd+bwd ({tag}, tile={tile})", fb,
                            jnp.float32(0))
            except Exception as e:
                print(f"vanilla fwd+bwd ({tag}, tile={tile}) FAILED: "
                      f"{str(e).splitlines()[0][:160]}", file=sys.stderr)


if __name__ == "__main__":
    main()
