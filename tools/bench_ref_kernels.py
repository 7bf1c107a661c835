"""Micro-benchmark the fused Ref-NeRF kernels on the real chip.

Serial lax.scan timing (this backend overlaps independent jit calls — see
tools/profile_step.py).  A/B's the directional-kernel glue variants
(T-major vs row-land) and tile sizes, standalone from the full step.

    python -m tools.bench_ref_kernels [--n 197632]
"""

import argparse
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from nerf_tpu.ops.fused_mlp import (
    F32, _VMEM_LIMIT, _col_spec, _full_spec, _pad_cols, _pad_rows, _row_spec,
)
from nerf_tpu.ops.ref_fused import (
    N_REF_DIR_WS, N_REF_SPA_WS, _dir_forward, _make_dir_fused,
    _make_spa_fused, ide_tables,
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


def _dissect_dir_bwd(ws_dir, heads, noise, dirs, tile, ide_level=4,
                     use_srgb=False):
    """Time the directional BACKWARD kernel piecewise: where do 5.0 ms go?

    Builds bwd-kernel variants that run only a SLICE of the work (recompute
    only / d(heads) only / weight grads only / full) with identical staging,
    so (full - parts) isolates the pullback overhead that isn't matmuls.
    """
    cd = jnp.bfloat16
    l_max = int(ide_tables(ide_level)["l_max"])
    tables = ide_tables(ide_level)
    ide_mat = np.asarray(tables["mat"], np.float32)
    ide_sigma = np.asarray(tables["sigma"], np.float32).reshape(1, -1)
    n = heads.shape[0]

    def make_kernel(mode):
        def kernel(heads_ref, noise_ref, dirs_ref, grgb_ref, gnrm_ref,
                   gden_ref, mat_ref, sigma_ref, *rest):
            wrefs = rest[:N_REF_DIR_WS]
            dheads_ref = rest[N_REF_DIR_WS]
            grads = rest[N_REF_DIR_WS + 1:]
            ws = tuple(r[:] for r in wrefs)
            heads_t = heads_ref[:]

            @pl.when(pl.program_id(0) == 0)
            def _init():
                for gref in grads:
                    gref[:] = jnp.zeros_like(gref)

            def full(ws_t, heads_tt):
                return _dir_forward(ws_t, heads_tt, noise_ref[:],
                                    dirs_ref[:], mat_ref[:], sigma_ref[:],
                                    cd, l_max, use_srgb, True, hand_vjp=True)

            t = heads_t.shape[0]
            if mode == "recompute":
                rgb3, normal3, density = full(ws, heads_t)
                dheads_ref[:] = jnp.concatenate(
                    [rgb3.T, normal3.T, density.T,
                     jnp.zeros((t, heads_t.shape[1] - 7), F32)], axis=1)
            elif mode == "dheads":
                _, vjp_fn = jax.vjp(lambda h: full(ws, h), heads_t)
                (dh,) = vjp_fn((grgb_ref[:], gnrm_ref[:], gden_ref[:]))
                dheads_ref[:] = dh.astype(F32)
            elif mode == "wgrads":
                _, vjp_fn = jax.vjp(lambda w: full(w, heads_t), ws)
                (dws,) = vjp_fn((grgb_ref[:], gnrm_ref[:], gden_ref[:]))
                for gref, dw in zip(grads, dws):
                    gref[:] += dw.astype(F32)
                dheads_ref[:] = jnp.zeros_like(dheads_ref)
            else:  # full
                _, vjp_fn = jax.vjp(full, ws, heads_t)
                dws, dh = vjp_fn((grgb_ref[:], gnrm_ref[:], gden_ref[:]))
                dheads_ref[:] = dh.astype(F32)
                for gref, dw in zip(grads, dws):
                    gref[:] += dw.astype(F32)

        return kernel

    wsc = tuple(w.astype(F32) if w.shape[0] == 1 else w.astype(cd)
                for w in ws_dir)
    h = _pad_rows(heads.astype(F32), tile)
    nz = _pad_rows(noise.astype(cd), tile)
    d = _pad_cols(dirs.astype(F32), tile)
    grgb = _pad_cols(jnp.ones((3, n), F32) * 1e-3, tile)
    gnrm = _pad_cols(jnp.ones((3, n), F32) * 1e-3, tile)
    gden = _pad_cols(jnp.ones((1, n), F32) * 1e-3, tile)
    grid = (h.shape[0] // tile,)

    for mode in ["recompute", "dheads", "wgrads", "full"]:
        call = pl.pallas_call(
            make_kernel(mode),
            grid=grid,
            in_specs=[_row_spec(tile, h.shape[1]),
                      _row_spec(tile, nz.shape[1]), _col_spec(3, tile),
                      _col_spec(3, tile), _col_spec(3, tile),
                      _col_spec(1, tile),
                      _full_spec(ide_mat.shape), _full_spec(ide_sigma.shape)]
            + [_full_spec(w.shape) for w in wsc],
            out_specs=(_row_spec(tile, h.shape[1]),)
            + tuple(_full_spec(w.shape) for w in wsc),
            out_shape=(jax.ShapeDtypeStruct(h.shape, F32),)
            + tuple(jax.ShapeDtypeStruct(w.shape, F32) for w in wsc),
            interpret=False,
            compiler_params=_VMEM_LIMIT,
        )

        def body(c, call=call):
            outs = call(h + 0.0 * c, nz, d, grgb, gnrm, gden,
                        ide_mat, ide_sigma, *wsc)
            return (jnp.sum(outs[0]) * 0.0 + c + 1.0).astype(jnp.float32)

        try:
            timeit_scan(f"dir bwd dissect[{mode}] (tile={tile})", body,
                        jnp.float32(0))
        except Exception as e:
            print(f"dissect[{mode}] FAILED: {str(e).splitlines()[0][:160]}",
                  file=sys.stderr)


def _dissect_dir_fwd(ws_dir, heads, noise, dirs, tile, ide_level=4):
    """Time the directional FORWARD kernel piecewise: the standalone forward
    measures ~3.7 ms against a ~1.1 ms matmul ideal — which glue stage owns
    the difference?  Stages build on each other with identical staging:

      trunk    — trunk matmuls only; the 39 IDE/d.n rows are a broadcast of
                 a noise scalar (not constant-foldable, no glue compute)
      reflect  — + normalize/negate normal, d.n, reflection, roughness
                 (row-land (3,T)/(1,T) chains); IDE rows still fake
      vander   — + the z-Vandermonde recurrence and its mat contraction
      polar    — + the complex-power recurrence (full IDE, incl. atten)
      full     — + the real rgb tail glue (sigmoid tint/diffuse, (3,T) out)
    """
    from nerf_tpu.ops.ref_fused import (
        _glue_heads, _ide_pure_rowland, _polar_powers_rowland, _relu_cd,
        _vander_z_rowland,
    )

    cd = jnp.bfloat16
    tables = ide_tables(ide_level)
    l_max = int(tables["l_max"])
    ide_mat = np.asarray(tables["mat"], np.float32)
    ide_sigma = np.asarray(tables["sigma"], np.float32).reshape(1, -1)
    n = heads.shape[0]
    n_ide = 2 * ide_mat.shape[1]

    def make_kernel(stage):
        def kernel(heads_ref, noise_ref, dirs_ref, rows_ref, mat_ref,
                   sigma_ref, *rest):
            ws = tuple(r[:] for r in rest[:N_REF_DIR_WS])
            rgb_ref, nrm_ref, den_ref = rest[N_REF_DIR_WS:]
            heads_t = heads_ref[:]
            dirsT = dirs_ref[:]
            t = heads_t.shape[0]

            if stage == "trunk":
                normalT = dirsT
                rowsT = rows_ref[:]
            else:
                normal_rawT = heads_t[:, 2:5].T
                normT = jnp.sqrt(jnp.sum(normal_rawT * normal_rawT, axis=0,
                                         keepdims=True) + 1e-20)
                normalT = -normal_rawT / (normT + 1e-7)
                d_dot_nT = jnp.sum(dirsT * normalT, axis=0, keepdims=True)
                reflectT = dirsT - 2.0 * d_dot_nT * normalT
                roughnessT = jax.nn.softplus(heads_t[:, 0:1].T - 1.0)
                if stage == "reflect":
                    ideT = (rows_ref[:n_ide]
                            + jnp.concatenate([reflectT, roughnessT,
                                               jnp.zeros((n_ide - 4, t),
                                                         F32)], axis=0))
                elif stage == "vander":
                    vzT = _vander_z_rowland(l_max)(reflectT[2:3])
                    vz_matT = jax.lax.dot_general(
                        mat_ref[:], vzT, (((0,), (0,)), ((), ())),
                        preferred_element_type=F32)
                    atten = jnp.exp(-sigma_ref[:].T * roughnessT)
                    half = vz_matT * atten
                    ideT = jnp.concatenate([half, half], axis=0)
                else:  # polar / full
                    ideT = _ide_pure_rowland(reflectT, roughnessT, mat_ref[:],
                                             sigma_ref[:].T, l_max,
                                             hand_vjp=True)
                rowsT = jnp.concatenate([ideT, d_dot_nT], axis=0)

            b_vec = (heads_t[:, 11:] + noise_ref[:]).astype(cd)
            rowsTc = rowsT.astype(cd)
            (w0, b0, w1, b1, w2, b2, w3, b3, w4a, w4b, b4, w5, b5, w6, b6,
             w7, b7, wh, bh) = ws
            nb = b_vec.shape[1]

            def split_in(w, bias):
                z = jnp.dot(b_vec, w[:nb], preferred_element_type=F32)
                z += jax.lax.dot_general(rowsTc, w[nb:],
                                         (((0,), (0,)), ((), ())),
                                         preferred_element_type=F32)
                return z if bias is None else z + bias

            h1 = _relu_cd(split_in(w0, b0), cd)
            h2 = _relu_cd(jnp.dot(h1, w1, preferred_element_type=F32) + b1, cd)
            h3 = _relu_cd(jnp.dot(h2, w2, preferred_element_type=F32) + b2, cd)
            h4 = _relu_cd(jnp.dot(h3, w3, preferred_element_type=F32) + b3, cd)
            z5 = _relu_cd(split_in(w4a, None)
                          + jnp.dot(h4, w4b, preferred_element_type=F32) + b4,
                          cd)
            z6 = _relu_cd(jnp.dot(z5, w5, preferred_element_type=F32) + b5, cd)
            z7 = _relu_cd(jnp.dot(z6, w6, preferred_element_type=F32) + b6, cd)
            z8 = _relu_cd(jnp.dot(z7, w7, preferred_element_type=F32) + b7, cd)
            specT = jax.nn.sigmoid(jax.lax.dot_general(
                wh, z8.astype(cd), (((0,), (1,)), ((), ())),
                preferred_element_type=F32) + bh.reshape(-1, 1))
            if stage == "full":
                specularT = specT * jax.nn.sigmoid(heads_t[:, 8:11].T)
                rgb3 = specularT + jax.nn.sigmoid(heads_t[:, 5:8].T)
            else:
                rgb3 = specT
            rgb_ref[:] = rgb3
            nrm_ref[:] = normalT
            den_ref[:] = heads_t[:, 1:2].T

        return kernel

    wsc = tuple(w.astype(F32) if w.shape[0] == 1 else w.astype(cd)
                for w in ws_dir)
    h = _pad_rows(heads.astype(F32), tile)
    nz = _pad_rows(noise.astype(cd), tile)
    d = _pad_cols(dirs.astype(F32), tile)
    rows_in = _pad_cols(
        jax.random.normal(jax.random.PRNGKey(9), (n_ide + 1, n), F32) * 0.1,
        tile)
    grid = (h.shape[0] // tile,)

    for stage in ["trunk", "reflect", "vander", "polar", "full"]:
        call = pl.pallas_call(
            make_kernel(stage),
            grid=grid,
            in_specs=[_row_spec(tile, h.shape[1]),
                      _row_spec(tile, nz.shape[1]), _col_spec(3, tile),
                      _col_spec(n_ide + 1, tile),
                      _full_spec(ide_mat.shape), _full_spec(ide_sigma.shape)]
            + [_full_spec(w.shape) for w in wsc],
            out_specs=(_col_spec(3, tile), _col_spec(3, tile),
                       _col_spec(1, tile)),
            out_shape=(jax.ShapeDtypeStruct((3, h.shape[0]), F32),
                       jax.ShapeDtypeStruct((3, h.shape[0]), F32),
                       jax.ShapeDtypeStruct((1, h.shape[0]), F32)),
            interpret=False,
            compiler_params=_VMEM_LIMIT,
        )

        def body(c, call=call):
            outs = call(h, nz + 0.0 * c.astype(cd), d, rows_in, ide_mat,
                        ide_sigma, *wsc)
            return (jnp.sum(outs[0]) * 0.0 + c + 1.0).astype(jnp.float32)

        try:
            timeit_scan(f"dir fwd dissect[{stage}] (tile={tile})", body,
                        jnp.float32(0))
        except Exception as e:
            print(f"fwd dissect[{stage}] FAILED: "
                  f"{str(e).splitlines()[0][:160]}", file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024 * 193)
    ap.add_argument("--tiles", type=int, nargs="+", default=[256])
    ap.add_argument("--spa_bwd_tile", type=int, default=None,
                    help="override the spatial backward tile (default 512)")
    ap.add_argument("--spatial", action="store_true")
    ap.add_argument("--no_dir", action="store_true",
                    help="skip the directional kernels")
    ap.add_argument("--dissect", action="store_true",
                    help="piecewise-time the directional backward")
    ap.add_argument("--dissect_fwd", action="store_true",
                    help="piecewise-time the directional forward glue")
    ap.add_argument("--ab_bwd_cd", action="store_true",
                    help="A/B only the cd-cotangent pullback rule "
                         "(bwd_cd False vs True) on the shipping variants")
    ap.add_argument("--ab_store", action="store_true",
                    help="A/B the residual-storing backward "
                         "(store_residuals False vs True) on the shipping "
                         "rowland/hand/bwd_cd variants")
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
        if args.dissect_fwd:
            _dissect_dir_fwd(ws_dir, heads, noise, dirs, tile)
            continue
        if args.dissect:
            _dissect_dir_bwd(ws_dir, heads, noise, dirs, tile)
            continue
        if args.spatial:
            pos = enc[:, :3]
            bt = args.spa_bwd_tile
            spa_variants = [(bc, st)
                            for bc in ([False, True] if args.ab_bwd_cd
                                       else [True])
                            for st in ([False, True] if args.ab_store
                                       else [False])]
            for bwd_cd, store in spa_variants:
                spa = _make_spa_fused(jnp.bfloat16, tile, False, True,
                                      bwd_tile=bt, bwd_cd=bwd_cd,
                                      store_residuals=store)
                bctag = f"bwd_cd={int(bwd_cd)}/store={int(store)}"
                timeit_scan(f"spa fwd ({bctag}, tile={tile})",
                            lambda c, spa=spa: jnp.sum(
                                spa(ws_spa, chain(enc, c), pos)[0]),
                            jnp.float32(0))

                def spa_fb(c, spa=spa):
                    def loss(ws):
                        h, _ = spa(ws, chain(enc, c), pos)
                        return jnp.sum(h * 1e-3)
                    # value_and_grad keeps the forward custom call live —
                    # under jax.grad the primal feeds only the discarded
                    # value and XLA DCEs the whole forward kernel (the
                    # pre-2026-08-19 "fwd+bwd" numbers were backward-only)
                    val, gws = jax.value_and_grad(loss)(ws_spa)
                    return (val + sum(jnp.sum(x) for x in gws)).astype(
                        jnp.float32)
                try:
                    timeit_scan(f"spa fwd+bwd ({bctag}, tile={tile}, "
                                f"bwd={bt or 512})", spa_fb, jnp.float32(0))
                except Exception as e:
                    print(f"spa fwd+bwd ({bctag}, tile={tile}) FAILED: "
                          f"{str(e).splitlines()[0][:160]}", file=sys.stderr)

        if args.no_dir:
            dir_variants = []
        elif args.ab_store:
            dir_variants = [(True, "hand", True, False),
                            (True, "hand", True, True)]
        elif args.ab_bwd_cd:
            dir_variants = [(True, "hand", False, False),
                            (True, "hand", True, False)]
        else:
            dir_variants = [(False, "auto", False, False),
                            (True, "auto", False, False),
                            (True, "hand", False, False),
                            (True, "hand", True, False),
                            (True, "hand", True, True)]
        for rowland, ide_vjp, bwd_cd, store in dir_variants:
            tag = (("rowland" if rowland else "tmajor") + f"/{ide_vjp}"
                   + f"/bwd_cd={int(bwd_cd)}/store={int(store)}")
            try:
                dr = _make_dir_fused(jnp.bfloat16, tile, False, 4, False,
                                     rowland, ide_vjp=ide_vjp, bwd_cd=bwd_cd,
                                     store_residuals=store)
                timeit_scan(f"dir fwd ({tag}, tile={tile})", lambda c: jnp.sum(
                    dr(ws_dir, chain(heads, c), noise, dirs)[0]),
                    jnp.float32(0))

                def dir_fb(c):
                    def loss(ws, h):
                        rgb, normal, density = dr(ws, h, noise, dirs)
                        return jnp.sum(rgb * g6[:, :3].T) \
                            + jnp.sum(normal * g6[:, 3:].T) \
                            + jnp.sum(density) * 1e-3
                    # value_and_grad keeps the forward kernel live (see
                    # spa_fb — jax.grad alone let XLA DCE the forward)
                    (val, (gws, gh)) = jax.value_and_grad(
                        loss, argnums=(0, 1))(ws_dir, chain(heads, c))
                    return (val + sum(jnp.sum(x) for x in gws)
                            + jnp.sum(gh)).astype(jnp.float32)
                timeit_scan(f"dir fwd+bwd ({tag}, tile={tile})", dir_fb,
                            jnp.float32(0))
            except Exception as e:
                print(f"dir ({tag}, tile={tile}) FAILED: "
                      f"{str(e).splitlines()[0][:160]}", file=sys.stderr)


if __name__ == "__main__":
    main()
