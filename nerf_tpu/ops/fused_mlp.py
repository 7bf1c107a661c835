"""Fused whole-network MLP kernels (Pallas TPU) with custom-VJP backward.

Why: at the default config the fine network evaluates 1024 x 129 points
through 8 dense layers of width 256. Under stock XLA each layer writes its
(132k, 256) activation to HBM and reads it back — >1 GB of traffic per
forward, which is the measured bottleneck (tools/profile_step.py: the fine
forward costs ~2.3 ms on a v5e, of which ~1.3 ms is pure activation
bandwidth). These kernels evaluate the ENTIRE network for a tile of points
inside VMEM: weights stay resident (~1 MB bf16), activations never touch HBM.

Backward: a second kernel recomputes the tile's forward in VMEM (cheaper
than saving activations to HBM — that would re-create exactly the traffic
being eliminated) and accumulates weight/bias gradients across the grid.
TPU Pallas grids execute sequentially, so `grad_ref[...] += partial` with a
zero-init at program 0 is a race-free reduction. Input cotangents are zero
by construction: in this pipeline the MLP inputs are positional encodings of
sampled points, which receive no gradient (sampling weights are detached,
reference utils.py:36) — asserted at the integration layer, which falls back
to the XLA path whenever input gradients are required (e.g. Ref-NeRF normals).

Two network topologies, matching the flax modules bit-for-bit in structure:
  * vanilla  — VanillaNeRF (models/vanilla.py): enc_x -> 4-layer block ->
    skip concat -> 3-layer block -> {sigma head, bottleneck} ->
    rgb head over cat(bottleneck, enc_d). The skip/cat concats are folded
    into split matmuls (x @ W[:d] + h @ W[d:]) so no concatenated tensor is
    ever materialized.
  * prop     — ProposalNetwork (models/proposal.py): enc_x -> 4 relu layers
    -> scalar density.

Reference for the architecture being fused: /root/reference/nerf/
mip_model.py:15-60 and addtional.py:53-96.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32

# Raise the per-kernel scoped-VMEM ceiling above the 16 MB default (v5e has
# 128 MB/core). XLA sometimes stack-allocates a custom call's OUTPUTS in
# scoped VMEM too (observed at large ray batches: the 24 weight-grad outputs
# pushed the vanilla backward 21 KB over the 16 MB limit at R>=4096 while
# R=1024 compiled — the placement choice depends on the surrounding
# program), so the kernel's own budget must leave headroom for that.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _relu(x):
    return jnp.maximum(x, 0.0)


def _dense(h, w_ref, b_ref=None):
    out = jnp.dot(h, w_ref[:], preferred_element_type=F32)
    return out if b_ref is None else out + b_ref[:]


def _dxw(a, delta):
    """a^T @ delta for (T, M) x (T, N) -> (M, N) fp32 weight-grad partial."""
    return jax.lax.dot_general(a, delta, (((0,), (0,)), ((), ())),
                               preferred_element_type=F32)


def _dwt(delta, w_ref):
    """delta @ W^T for (T, N) x (M, N) -> (T, M)."""
    return jax.lax.dot_general(delta, w_ref[:], (((1,), (1,)), ((), ())),
                               preferred_element_type=F32)


# ---------------------------------------------------------------------------
# vanilla NeRF network
# ---------------------------------------------------------------------------

# weight tuple order (kernels (in, out); biases (1, out)):
#  0: w0  (Dx, H)    block1 layer 0          1: b0
#  2: w1  (H, H)                             3: b1
#  4: w2  (H, H)                             5: b2
#  6: w3  (H, H)                             7: b3
#  8: w4a (Dx, H)    block2 layer 0, skip part
#  9: w4b (H, H)     block2 layer 0, hidden part     10: b4
# 11: w5  (H, H)                             12: b5
# 13: w6  (H, B)                             14: b6
# 15: wsig (B, 1)                            16: bsig
# 17: wb  (B, B)                             18: bb
# 19: wr1a (B, R)    rgb layer 0, bottleneck part
# 20: wr1b (Dd, R)   rgb layer 0, direction part     21: br1
# 22: wr2 (R, 3)                             23: br2
N_VANILLA_WS = 24


def _vanilla_forward_tile(x, d, r):
    """Shared fwd math over VMEM refs; returns all activations."""
    (w0, b0, w1, b1, w2, b2, w3, b3, w4a, w4b, b4, w5, b5, w6, b6,
     wsig, bsig, wb, bb, wr1a, wr1b, br1, wr2, br2) = r
    cd = x.dtype
    h1 = _relu(_dense(x, w0, b0)).astype(cd)
    h2 = _relu(_dense(h1, w1, b1)).astype(cd)
    h3 = _relu(_dense(h2, w2, b2)).astype(cd)
    h4 = _relu(_dense(h3, w3, b3)).astype(cd)
    z5 = _relu(_dense(x, w4a) + _dense(h4, w4b, b4)).astype(cd)
    z6 = _relu(_dense(z5, w5, b5)).astype(cd)
    z7 = _relu(_dense(z6, w6, b6)).astype(cd)
    # sigma head in ROW-LAND (1, T): the (N, 1) T(8,128) form forced ~0.2
    # ms/step of external relayouts ((N,1)->(N,) reduce + the (R,P)->(N,1)
    # cotangent copy, round-4 trace) — (1, N) shares the flat row-major
    # order of the (R, P) consumer so both directions are free
    sigma = jax.lax.dot_general(wsig[:], z7, (((0,), (1,)), ((), ())),
                                preferred_element_type=F32) \
        + bsig[:].reshape(-1, 1)                            # (1, T) f32
    bvec = _dense(z7, wb, bb).astype(cd)                    # (T, B)
    r1 = _relu(_dense(bvec, wr1a) + _dense(d, wr1b, br1)).astype(cd)  # (T, R)
    # rgb tail in ROW-LAND: the head matmul emits (3, T) directly (dim-0
    # contraction — the MXU streams either orientation), the sigmoid runs at
    # full lanes instead of 3/128, and rgb crosses the kernel boundary
    # (3, N) straight into the row-land composite
    logit3 = jax.lax.dot_general(wr2[:], r1, (((0,), (1,)), ((), ())),
                                 preferred_element_type=F32) \
        + br2[:].reshape(-1, 1)                             # (3, T) f32
    rgb3 = jax.nn.sigmoid(logit3)
    return h1, h2, h3, h4, z5, z6, z7, sigma, bvec, r1, rgb3


def _vanilla_fwd_kernel(encx_ref, encd_ref, *rest):
    r = rest[:N_VANILLA_WS]
    rgb_ref, sig_ref = rest[N_VANILLA_WS], rest[N_VANILLA_WS + 1]
    acts = _vanilla_forward_tile(encx_ref[:], encd_ref[:], r)
    rgb_ref[:] = acts[10]   # (3, T) row-land
    sig_ref[:] = acts[7]    # (1, T) row-land


def _vanilla_bwd_kernel(encx_ref, encd_ref, grgb_ref, gsig_ref, *rest):
    # separate cotangent refs: the (N, 4) concat of [g_rgb | g_sigma] plus
    # its layout copy cost ~0.4 ms/step outside (round-3 trace).
    # grgb_ref is ROW-LAND (3, T), matching the forward's rgb output
    _vanilla_bwd_tile(encx_ref[:], encd_ref[:], grgb_ref[:], gsig_ref[:],
                      rest)


# activation tuple stored by the residual-storing variant (bf16, per tile):
# h1 h2 h3 h4 z5 z6 z7 bvec r1  (rgb3 re-enters as a bwd input — the fwd
# already materializes it (3, N) f32)
N_VANILLA_ACTS = 9


def _vanilla_fwd_res_kernel(encx_ref, encd_ref, *rest):
    """store_residuals forward: also writes the 9 activations to HBM."""
    r = rest[:N_VANILLA_WS]
    rgb_ref, sig_ref = rest[N_VANILLA_WS], rest[N_VANILLA_WS + 1]
    act_refs = rest[N_VANILLA_WS + 2:]
    acts = _vanilla_forward_tile(encx_ref[:], encd_ref[:], r)
    h1, h2, h3, h4, z5, z6, z7, sigma, bvec, r1, rgb3 = acts
    rgb_ref[:] = rgb3
    sig_ref[:] = sigma
    for ref, a in zip(act_refs, (h1, h2, h3, h4, z5, z6, z7, bvec, r1)):
        ref[:] = a


def _vanilla_bwd_res_kernel(encx_ref, encd_ref, grgb_ref, gsig_ref,
                            rgb3_ref, *rest):
    """store_residuals backward: activations stream back from HBM instead of
    being recomputed (A/B'd against the recompute form — the recompute costs
    ~1 forward of matmuls, the residuals ~1.2 GB/step of HBM traffic)."""
    acts = tuple(rest[i][:] for i in range(N_VANILLA_ACTS))
    rest = rest[N_VANILLA_ACTS:]
    r, grads = rest[:N_VANILLA_WS], rest[N_VANILLA_WS:]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for gref in grads:
            gref[:] = jnp.zeros_like(gref)

    _vanilla_bwd_math(encx_ref[:], encd_ref[:], grgb_ref[:], gsig_ref[:],
                      acts + (rgb3_ref[:],), r, grads)


def _vanilla_bwd_tile(x, d, grgb, gsig, rest):
    r, grads = rest[:N_VANILLA_WS], rest[N_VANILLA_WS:]
    h1, h2, h3, h4, z5, z6, z7, _, bvec, r1, rgb3 = \
        _vanilla_forward_tile(x, d, r)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for gref in grads:
            gref[:] = jnp.zeros_like(gref)

    _vanilla_bwd_math(x, d, grgb, gsig,
                      (h1, h2, h3, h4, z5, z6, z7, bvec, r1, rgb3), r, grads)


def _vanilla_bwd_math(x, d, grgb, gsig, acts, r, grads):
    (w0, b0, w1, b1, w2, b2, w3, b3, w4a, w4b, b4, w5, b5, w6, b6,
     wsig, bsig, wb, bb, wr1a, wr1b, br1, wr2, br2) = r
    cd = x.dtype
    h1, h2, h3, h4, z5, z6, z7, bvec, r1, rgb3 = acts
    # row-land sigmoid backward: grgb and rgb3 are (3, T)
    dlogit3 = (grgb * rgb3 * (1.0 - rgb3)).astype(cd)
    dr1 = jnp.where(
        r1.astype(F32) > 0,
        jax.lax.dot_general(dlogit3, wr2[:], (((0,), (1,)), ((), ())),
                            preferred_element_type=F32),
        0.0).astype(cd)
    dbvec = _dwt(dr1, wr1a)
    gsig_c = gsig.astype(cd)  # ROW-LAND (1, T)
    # d(sigma)/d(z7) with gsig held (1, T): contract the singleton dims
    # (gsig dim0 x wsig dim1, K=1 same-dtype — the mixed-dtype K=1 form
    # trips a Mosaic verifier bug, see ref_fused.py)
    dz7 = _dwt(dbvec.astype(cd), wb) + jax.lax.dot_general(
        gsig_c, wsig[:], (((0,), (1,)), ((), ())),
        preferred_element_type=F32)
    dz7 = jnp.where(z7.astype(F32) > 0, dz7, 0.0).astype(cd)
    dz6 = jnp.where(z6.astype(F32) > 0, _dwt(dz7, w6), 0.0).astype(cd)
    dz5 = jnp.where(z5.astype(F32) > 0, _dwt(dz6, w5), 0.0).astype(cd)
    dh4 = jnp.where(h4.astype(F32) > 0, _dwt(dz5, w4b), 0.0).astype(cd)
    dh3 = jnp.where(h3.astype(F32) > 0, _dwt(dh4, w3), 0.0).astype(cd)
    dh2 = jnp.where(h2.astype(F32) > 0, _dwt(dh3, w2), 0.0).astype(cd)
    dh1 = jnp.where(h1.astype(F32) > 0, _dwt(dh2, w1), 0.0).astype(cd)

    def _bsum(delta):
        return jnp.sum(delta.astype(F32), axis=0, keepdims=True)

    (dw0, db0, dw1, db1, dw2, db2, dw3, db3, dw4a, dw4b, db4, dw5, db5,
     dw6, db6, dwsig, dbsig, dwb, dbb, dwr1a, dwr1b, dbr1, dwr2, dbr2) = grads
    dw0[:] += _dxw(x, dh1);      db0[:] += _bsum(dh1)
    dw1[:] += _dxw(h1, dh2);     db1[:] += _bsum(dh2)
    dw2[:] += _dxw(h2, dh3);     db2[:] += _bsum(dh3)
    dw3[:] += _dxw(h3, dh4);     db3[:] += _bsum(dh4)
    dw4a[:] += _dxw(x, dz5)
    dw4b[:] += _dxw(h4, dz5);    db4[:] += _bsum(dz5)
    dw5[:] += _dxw(z5, dz6);     db5[:] += _bsum(dz6)
    dw6[:] += _dxw(z6, dz7);     db6[:] += _bsum(dz7)
    # dwsig = z7^T @ gsig^T with gsig held (1, T): contract T over dim0 x dim1
    dwsig[:] += jax.lax.dot_general(z7, gsig_c, (((0,), (1,)), ((), ())),
                                    preferred_element_type=F32)
    dbsig[:] += jnp.sum(gsig_c.astype(F32), axis=1, keepdims=True)
    dwb[:] += _dxw(z7, dbvec.astype(cd)); dbb[:] += _bsum(dbvec)
    dwr1a[:] += _dxw(bvec, dr1)
    dwr1b[:] += _dxw(d, dr1);    dbr1[:] += _bsum(dr1)
    # dwr2 = r1^T @ dlogit with dlogit held (3, T): contract both over T
    dwr2[:] += jax.lax.dot_general(r1, dlogit3, (((0,), (1,)), ((), ())),
                                   preferred_element_type=F32)
    dbr2[:] += jnp.sum(dlogit3.astype(F32), axis=1).reshape(1, -1)


def _pad_rows(a, tile):
    n = a.shape[0]
    pad = (-n) % tile
    if pad:
        a = jnp.concatenate(
            [a, jnp.zeros((pad, a.shape[1]), a.dtype)], axis=0)
    return a


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)


def _row_spec(tile, width, bufs=None):
    """Grid-blocked (tile, width) input/output spec.

    bufs: optional pipeline buffer count (pl.Buffered).  Mosaic's default
    pipelining double-buffers grid-indexed operands; the round-5 trace
    showed the residual-READING backwards running at 91-100% of their
    no-overlap bound (reads gate compute), so the backwards expose this
    experiment knob (PipelineConfig.bwd_bufs).  MEASURED OUTCOME (round-5
    on-chip A/B, tools/batch_scaling --axis bufs): this Mosaic version
    rejects buffer_count > 2 at compile ("Only single (1) and double (2)
    buffering are supported"), so the deeper-prefetch lever is CLOSED on
    the current toolchain — the knob stays as the probe record for a
    future Mosaic that lifts the cap.
    """
    mode = pl.Buffered(buffer_count=bufs) if bufs else None
    return pl.BlockSpec((tile, width), lambda i: (i, 0),
                        memory_space=pltpu.VMEM, pipeline_mode=mode)


def _pad_cols(a, tile):
    """Pad dim 1 of a (rows, N) array up to a tile multiple."""
    pad = (-a.shape[1]) % tile
    if pad:
        a = jnp.concatenate(
            [a, jnp.zeros((a.shape[0], pad), a.dtype)], axis=1)
    return a


def _col_spec(rows, tile, bufs=None):
    """Block over COLUMNS: (rows, tile) blocks of a (rows, N) array.

    Row-land kernel inputs/outputs (rgb/normals as (3, N)) use this so the
    per-point 3-vector chains downstream of the kernels run with points
    along lanes — an (N, 3) f32 array under the T(8,128) tiling occupies 3
    of 128 lanes, and the round-3 trace showed the glue on such arrays
    paying up to 21x its HBM roofline.
    """
    mode = pl.Buffered(buffer_count=bufs) if bufs else None
    return pl.BlockSpec((rows, tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM, pipeline_mode=mode)


@functools.lru_cache(maxsize=None)
def make_vanilla_fused(compute_dtype=jnp.bfloat16, tile: int = 512,
                       interpret: bool = False,
                       store_residuals: bool = False,
                       bwd_bufs: int | None = None):
    """Build the fused VanillaNeRF apply:
    (ws, enc_x, enc_d) -> (rgb3 (3, N) ROW-LAND, sigma (N,)).

    ws: tuple of N_VANILLA_WS arrays (see order above); kernels in any float
    dtype (cast to ``compute_dtype`` on entry, so fp32 master params are
    fine); biases fp32 of shape (1, width). enc_x (N, Dx), enc_d (N, Dd).
    Input cotangents are ZERO (see module docstring) — only use where the
    encodings carry no gradient.

    store_residuals=True: the forward writes the 9 tile activations to HBM
    (compute_dtype) and the backward streams them back instead of
    recomputing the forward — trades ~1 forward of matmuls for ~1.2 GB/step
    of HBM traffic at the default config.  Kept as a measured A/B
    (tools/bench_vanilla_kernels); the recompute form is the default.
    """
    cd = compute_dtype

    def _prep(ws, enc_x, enc_d):
        # biases are (1, W) and stay fp32; weight matrices use compute_dtype
        ws = tuple(
            w.astype(F32) if w.shape[0] == 1 else w.astype(cd) for w in ws
        )
        return ws, enc_x.astype(cd), enc_d.astype(cd)

    def _act_widths(ws):
        # each stored activation's width comes from its PRODUCING matmul's
        # output dim (consumer input dims coincide only for square configs)
        h = ws[2].shape[1]       # trunk width (w1: (H, H))
        z7w = ws[13].shape[1]    # z7 width (w6: (H, B))
        b = ws[17].shape[1]      # bvec width (wb: (B, B))
        rw = ws[19].shape[1]     # r1 width (wr1a: (B, R))
        return (h, h, h, h, h, h, z7w, b, rw)

    def _fwd_impl(ws, enc_x, enc_d):
        n = enc_x.shape[0]
        ws, x, d = _prep(ws, enc_x, enc_d)
        x = _pad_rows(x, tile)
        d = _pad_rows(d, tile)
        grid = (x.shape[0] // tile,)
        out_specs = [_col_spec(3, tile), _col_spec(1, tile)]
        out_shape = [jax.ShapeDtypeStruct((3, x.shape[0]), F32),
                     jax.ShapeDtypeStruct((1, x.shape[0]), F32)]
        if store_residuals:
            for w in _act_widths(ws):
                out_specs.append(_row_spec(tile, w))
                out_shape.append(
                    jax.ShapeDtypeStruct((x.shape[0], w), cd))
        outs = pl.pallas_call(
            _vanilla_fwd_res_kernel if store_residuals
            else _vanilla_fwd_kernel,
            grid=grid,
            in_specs=[_row_spec(tile, x.shape[1]),
                      _row_spec(tile, d.shape[1])]
            + [_full_spec(w.shape) for w in ws],
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            interpret=interpret,
            compiler_params=_VMEM_LIMIT,
        )(x, d, *ws)
        rgb3, sig = outs[0], outs[1]
        return (rgb3[:, :n], sig[0, :n]), outs[2:]

    @jax.custom_vjp
    def fused(ws, enc_x, enc_d):
        return _fwd_impl(ws, enc_x, enc_d)[0]

    def fused_fwd(ws, enc_x, enc_d):
        (rgb3, sig), acts = _fwd_impl(ws, enc_x, enc_d)
        # padded (3, Np) rgb for the res-backward's input (re-slice is free)
        return (rgb3, sig), (ws, enc_x, enc_d, acts,
                             rgb3 if store_residuals else None)

    def fused_bwd(res, g):
        ws, enc_x, enc_d, acts, rgb3 = res
        g_rgb, g_sigma = g
        n = enc_x.shape[0]
        wsc, x, d = _prep(ws, enc_x, enc_d)
        x = _pad_rows(x, tile)
        d = _pad_rows(d, tile)
        grgb = _pad_cols(g_rgb.astype(F32), tile)  # ROW-LAND (3, N)
        gsig = _pad_cols(g_sigma.astype(F32).reshape(1, n), tile)
        grid = (x.shape[0] // tile,)
        extra_in, extra_specs = (), []
        kernel = _vanilla_bwd_kernel
        if store_residuals:
            kernel = _vanilla_bwd_res_kernel
            rgb3p = _pad_cols(rgb3.astype(F32), tile)
            extra_in = (rgb3p,) + tuple(acts)
            extra_specs = [_col_spec(3, tile, bwd_bufs)] + [
                _row_spec(tile, a.shape[1], bwd_bufs) for a in acts]
        grads = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[_row_spec(tile, x.shape[1], bwd_bufs),
                      _row_spec(tile, d.shape[1], bwd_bufs),
                      _col_spec(3, tile, bwd_bufs),
                      _col_spec(1, tile, bwd_bufs)]
            + extra_specs
            + [_full_spec(w.shape) for w in wsc],
            out_specs=tuple(_full_spec(w.shape) for w in wsc),
            out_shape=tuple(
                jax.ShapeDtypeStruct(w.shape, F32) for w in wsc),
            interpret=interpret,
            compiler_params=_VMEM_LIMIT,
        )(x, d, grgb, gsig, *extra_in, *wsc)
        dws = tuple(dg.astype(w.dtype) for dg, w in zip(grads, ws))
        return dws, jnp.zeros_like(enc_x), jnp.zeros_like(enc_d)

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def vanilla_weights_from_params(params):
    """flax VanillaNeRF params -> the kernel's flat weight tuple.

    Differentiable (slicing/reshape only), so grads flow back into the flax
    pytree through the train step unchanged.
    """
    b1 = params["block1"]
    b2 = params["block2"]
    rgb = params["rgb_layer"]

    def kb(layer):
        return layer["kernel"], layer["bias"].reshape(1, -1)

    w0, b0 = kb(b1["Dense_0"])
    w1, b1_ = kb(b1["Dense_1"])
    w2, b2_ = kb(b1["Dense_2"])
    w3, b3_ = kb(b1["Dense_3"])
    dx = w0.shape[0]
    w4, b4 = kb(b2["Dense_0"])
    w4a, w4b = w4[:dx], w4[dx:]
    w5, b5 = kb(b2["Dense_1"])
    w6, b6 = kb(b2["Dense_2"])
    wsig, bsig = kb(params["opacity_head"])
    wb, bb = kb(params["bottle_neck"])
    wr1, br1 = kb(rgb["Dense_0"])
    bneck = wb.shape[1]
    wr1a, wr1b = wr1[:bneck], wr1[bneck:]
    wr2, br2 = kb(rgb["Dense_1"])
    return (w0, b0, w1, b1_, w2, b2_, w3, b3_, w4a, w4b, b4, w5, b5, w6, b6,
            wsig, bsig, wb, bb, wr1a, wr1b, br1, wr2, br2)


# ---------------------------------------------------------------------------
# proposal network
# ---------------------------------------------------------------------------

N_PROP_WS = 10  # w0 b0 w1 b1 w2 b2 w3 b3 wout bout


def _prop_forward_tile(x, r):
    w0, b0, w1, b1, w2, b2, w3, b3, wo, bo = r
    cd = x.dtype
    h1 = _relu(_dense(x, w0, b0)).astype(cd)
    h2 = _relu(_dense(h1, w1, b1)).astype(cd)
    h3 = _relu(_dense(h2, w2, b2)).astype(cd)
    h4 = _relu(_dense(h3, w3, b3)).astype(cd)
    # density head in ROW-LAND (1, T) — same rationale as the vanilla sigma
    out = jax.lax.dot_general(wo[:], h4, (((0,), (1,)), ((), ())),
                              preferred_element_type=F32) \
        + bo[:].reshape(-1, 1)  # (1, T) f32
    return h1, h2, h3, h4, out


# activations stored by the residual-storing prop variant (cd, per tile)
N_PROP_ACTS = 4


def _prop_fwd_kernel(encx_ref, *rest):
    r, out_ref = rest[:N_PROP_WS], rest[N_PROP_WS]
    out_ref[:] = _prop_forward_tile(encx_ref[:], r)[-1]


def _prop_fwd_res_kernel(encx_ref, *rest):
    r = rest[:N_PROP_WS]
    out_ref = rest[N_PROP_WS]
    act_refs = rest[N_PROP_WS + 1:]
    h1, h2, h3, h4, out = _prop_forward_tile(encx_ref[:], r)
    out_ref[:] = out
    for ref, a in zip(act_refs, (h1, h2, h3, h4)):
        ref[:] = a


def _prop_bwd_kernel(encx_ref, g_ref, *rest):
    r, grads = rest[:N_PROP_WS], rest[N_PROP_WS:]
    h1, h2, h3, h4, _ = _prop_forward_tile(encx_ref[:], r)
    _prop_bwd_math(encx_ref[:], g_ref[:], (h1, h2, h3, h4), r, grads)


def _prop_bwd_res_kernel(encx_ref, g_ref, *rest):
    acts = tuple(rest[i][:] for i in range(N_PROP_ACTS))
    rest = rest[N_PROP_ACTS:]
    r, grads = rest[:N_PROP_WS], rest[N_PROP_WS:]
    _prop_bwd_math(encx_ref[:], g_ref[:], acts, r, grads)


def _prop_bwd_math(x, g, acts, r, grads):
    w0, b0, w1, b1, w2, b2, w3, b3, wo, bo = r
    cd = x.dtype
    h1, h2, h3, h4 = acts

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for gref in grads:
            gref[:] = jnp.zeros_like(gref)

    go = g.astype(cd)                    # ROW-LAND (1, T)
    dh4 = jnp.where(
        h4.astype(F32) > 0,
        jax.lax.dot_general(go, wo[:], (((0,), (1,)), ((), ())),
                            preferred_element_type=F32),
        0.0).astype(cd)
    dh3 = jnp.where(h3.astype(F32) > 0, _dwt(dh4, w3), 0.0).astype(cd)
    dh2 = jnp.where(h2.astype(F32) > 0, _dwt(dh3, w2), 0.0).astype(cd)
    dh1 = jnp.where(h1.astype(F32) > 0, _dwt(dh2, w1), 0.0).astype(cd)

    def _bsum(delta):
        return jnp.sum(delta.astype(F32), axis=0, keepdims=True)

    dw0, db0, dw1, db1, dw2, db2, dw3, db3, dwo, dbo = grads
    dw0[:] += _dxw(x, dh1);  db0[:] += _bsum(dh1)
    dw1[:] += _dxw(h1, dh2); db1[:] += _bsum(dh2)
    dw2[:] += _dxw(h2, dh3); db2[:] += _bsum(dh3)
    dw3[:] += _dxw(h3, dh4); db3[:] += _bsum(dh4)
    dwo[:] += jax.lax.dot_general(h4, go, (((0,), (1,)), ((), ())),
                                  preferred_element_type=F32)
    dbo[:] += jnp.sum(go.astype(F32), axis=1, keepdims=True)


@functools.lru_cache(maxsize=None)
def make_prop_fused(compute_dtype=jnp.bfloat16, tile: int = 512,
                    interpret: bool = False,
                    store_residuals: bool = False,
                    bwd_bufs: int | None = None):
    """Fused ProposalNetwork apply: (ws, enc_x) -> raw density (N,).

    Same contract as make_vanilla_fused (zero input cotangent;
    store_residuals trades the backward's forward-recompute for 4 stored
    bf16 activations, same A/B as the vanilla kernel)."""
    cd = compute_dtype

    def _prep(ws, enc_x):
        ws = tuple(
            w.astype(F32) if w.shape[0] == 1 else w.astype(cd) for w in ws
        )
        return ws, enc_x.astype(cd)

    def _fwd_impl(ws, enc_x):
        n = enc_x.shape[0]
        ws, x = _prep(ws, enc_x)
        x = _pad_rows(x, tile)
        grid = (x.shape[0] // tile,)
        out_specs = [_col_spec(1, tile)]
        out_shape = [jax.ShapeDtypeStruct((1, x.shape[0]), F32)]
        if store_residuals:
            h_w = ws[2].shape[0]     # hidden width (w1: (H, H))
            for _ in range(N_PROP_ACTS):
                out_specs.append(_row_spec(tile, h_w))
                out_shape.append(jax.ShapeDtypeStruct((x.shape[0], h_w), cd))
        outs = pl.pallas_call(
            _prop_fwd_res_kernel if store_residuals else _prop_fwd_kernel,
            grid=grid,
            in_specs=[_row_spec(tile, x.shape[1])]
            + [_full_spec(w.shape) for w in ws],
            out_specs=tuple(out_specs) if store_residuals else out_specs[0],
            out_shape=tuple(out_shape) if store_residuals else out_shape[0],
            interpret=interpret,
            compiler_params=_VMEM_LIMIT,
        )(x, *ws)
        if store_residuals:
            return outs[0][0, :n], outs[1:]
        return outs[0, :n], ()

    @jax.custom_vjp
    def fused(ws, enc_x):
        return _fwd_impl(ws, enc_x)[0]

    def fused_fwd(ws, enc_x):
        out, acts = _fwd_impl(ws, enc_x)
        return out, (ws, enc_x, acts)

    def fused_bwd(res, g):
        ws, enc_x, acts = res
        n = enc_x.shape[0]
        wsc, x = _prep(ws, enc_x)
        x = _pad_rows(x, tile)
        gfull = _pad_cols(g.astype(F32).reshape(1, n), tile)
        grid = (x.shape[0] // tile,)
        act_specs = [_row_spec(tile, a.shape[1], bwd_bufs) for a in acts]
        grads = pl.pallas_call(
            _prop_bwd_res_kernel if store_residuals else _prop_bwd_kernel,
            grid=grid,
            in_specs=[_row_spec(tile, x.shape[1], bwd_bufs),
                      _col_spec(1, tile, bwd_bufs)]
            + act_specs
            + [_full_spec(w.shape) for w in wsc],
            out_specs=tuple(_full_spec(w.shape) for w in wsc),
            out_shape=tuple(
                jax.ShapeDtypeStruct(w.shape, F32) for w in wsc),
            interpret=interpret,
            compiler_params=_VMEM_LIMIT,
        )(x, gfull, *acts, *wsc)
        dws = tuple(dg.astype(w.dtype) for dg, w in zip(grads, ws))
        return dws, jnp.zeros_like(enc_x)

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def prop_weights_from_params(params):
    """flax ProposalNetwork params -> the kernel's flat weight tuple."""
    hidden = params["MLP_0"]
    out = params["MLP_1"]

    def kb(layer):
        return layer["kernel"], layer["bias"].reshape(1, -1)

    w0, b0 = kb(hidden["Dense_0"])
    w1, b1 = kb(hidden["Dense_1"])
    w2, b2 = kb(hidden["Dense_2"])
    w3, b3 = kb(hidden["Dense_3"])
    wo, bo = kb(out["Dense_0"])
    return (w0, b0, w1, b1, w2, b2, w3, b3, wo, bo)
