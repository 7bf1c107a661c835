"""TPU-layout-friendly reformulations of small-tensor math.

The NeRF inner loop is full of operations over tiny trailing dimensions
((..., 3) points, (..., 64) sample axes) that map terribly onto the TPU's
(8, 128) vector tiles and its lane-dimension scan weakness.  This module
collects the reformulations that keep the work on the MXU/VPU with full
tiles:

  * frequency PE as ONE (N, 3) @ (3, 2*L*D) matmul + a single fused sin
    (cos(x) == sin(x + pi/2)) instead of ~4L small ops on (..., 3) tensors;
  * cumulative sums as a triangular matmul (the lane-dim cumsum XLA emits is
    a serial shift chain; an (n, n) fp32 matmul is a handful of MXU passes);
  * sorted uniform variates drawn directly via exponential spacings
    (order-statistics construction) — distributionally identical to
    sort(uniform(n)) with no sort anywhere.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _pe_tables(levels: int, dim: int):
    """Projection matrix (dim, 2*levels*dim) and phase (2*levels*dim,) such
    that sin(x @ W + b) reproduces the level-major [sin, cos] PE ordering of
    encoding.positional_encoding."""
    out_dim = 2 * levels * dim
    w = np.zeros((dim, out_dim), np.float32)
    b = np.zeros((out_dim,), np.float32)
    for l in range(levels):
        f = 2.0**l
        for d in range(dim):
            w[d, 2 * l * dim + d] = f              # sin slot
            w[d, 2 * l * dim + dim + d] = f        # cos slot
            b[2 * l * dim + dim + d] = 0.5 * np.pi
    return w, b


def positional_encoding_mm(x: jnp.ndarray, levels: int) -> jnp.ndarray:
    """Matmul-form frequency PE; bit-equivalent ordering to the loop form.

    precision=HIGHEST is required: each projection column has a single
    power-of-two coefficient, so the product is exact in fp32 — but a
    low-precision pass would round x to bf16 and at level 9 the 2^9 frequency
    amplifies that rounding into O(1) phase error inside sin.
    """
    d = x.shape[-1]
    w, b = _pe_tables(levels, d)
    proj = jax.lax.dot_general(
        x, jnp.asarray(w, x.dtype),
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    ) + jnp.asarray(b, x.dtype)
    return jnp.sin(proj)


def positional_encoding_dbl(x: jnp.ndarray, levels: int) -> jnp.ndarray:
    """Angle-doubling PE: same output as positional_encoding_mm to ~6e-5.

    The matmul+sin form's cost is the sin polynomial over (N, 2LD): at
    2LD = 60 <= 128 lanes that fusion is ONE lane-group wide, so every
    polynomial op costs a full N/8-instruction pass regardless of how few
    lanes it fills (which is why reshaping the MATMUL side was a measured
    dead end — the sin dominates).  This form computes sin/cos(x) once in
    ROW-LAND (2D, N) — full 128-lane rows, N/128 instructions per op — and
    derives every higher octave by complex squaring, the same recurrence
    that removed the IDE transcendentals (ops/ref_fused.py):

        s_{l+1} = 2 s_l c_l,   c_{l+1} = (c_l - s_l)(c_l + s_l)

    ~45 cheap VPU ops on (3, N) rows replace ~8 sublane-groups' worth of
    sin polynomial.  Error grows as 2^l * ulp through the doublings:
    <= ~6e-5 absolute at l = 9 — two decades below the bf16 quantization
    (~4e-3) of every consumer (the fused kernels' enc operand).  NOT a
    drop-in for paths that need f32-exact PE; the oracle stays
    positional_encoding_mm / encoding.positional_encoding_ref.
    """
    rows = _pe_dbl_rows(x.reshape(-1, x.shape[-1]).T.astype(jnp.float32),
                        levels)
    out = jnp.concatenate(rows, axis=0).T
    return out.reshape(*x.shape[:-1], out.shape[-1]).astype(x.dtype)


def _pe_dbl_rows(xt: jnp.ndarray, levels: int) -> list[jnp.ndarray]:
    """Row-land PE rows: xt (D, N) f32 -> [s_0 (D,N), c_0, s_1, c_1, ...]
    with s_l = sin(2^l x), c_l = cos(2^l x) — level-major [sin, cos] row
    order, the transpose of the positional_encoding_mm column order."""
    d = xt.shape[0]
    # one sin over stacked [x, x + pi/2] rows: base sin AND cos in a single
    # (2D, N) transcendental pass
    sc = jnp.sin(jnp.concatenate([xt, xt + 0.5 * np.pi], axis=0))
    s, c = sc[:d], sc[d:]
    rows = [s, c]
    for _ in range(levels - 1):
        s, c = 2.0 * s * c, (c - s) * (c + s)
        rows += [s, c]
    return rows


def cat_pos_pe(x: jnp.ndarray, levels: int, dtype,
               doubling: bool = False) -> jnp.ndarray:
    """concatenate([x, PE(x)], -1).astype(dtype) — the fused kernels' enc
    operand ((N, D + 2LD)).  ``doubling`` switches the PE to the row-land
    angle-doubling form; the concat then happens in row-land ((D, N) atop
    the PE rows) and ONE bf16 transpose relayouts to the kernel's N-major
    operand, instead of paying the (N, 60) sin polynomial (see
    positional_encoding_dbl)."""
    if not doubling:
        return jnp.concatenate(
            [x, positional_encoding_mm(x, levels)], axis=-1).astype(dtype)
    xt = x.T.astype(jnp.float32)
    rows = [xt] + _pe_dbl_rows(xt, levels)
    # cast BEFORE the transpose: the relayout copy moves bf16, not f32
    return jnp.concatenate(rows, axis=0).astype(dtype).T


@functools.lru_cache(maxsize=None)
def _tri_ones(n: int):
    return np.triu(np.ones((n, n), np.float32))


def cumsum_mm(x: jnp.ndarray, exclusive: bool = False) -> jnp.ndarray:
    """Cumulative sum along the last axis via an upper-triangular matmul.

    fp32, precision=HIGHEST — exact to normal fp32 summation order for the
    small n (< 256) used here.  ``exclusive`` shifts the result right by one
    (out[..., 0] = 0), using the strictly-upper-triangular matrix.
    """
    n = x.shape[-1]
    tri = _tri_ones(n)
    if exclusive:
        tri = tri - np.eye(n, dtype=np.float32)
    return jax.lax.dot_general(
        x.astype(jnp.float32), jnp.asarray(tri),
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )


def sorted_uniforms(key, shape) -> jnp.ndarray:
    """Sorted iid U(0, 1) order statistics with NO sort.

    Draw n+1 iid Exp(1) spacings E_j; then S_i / S_{n+1} (S = prefix sums)
    has exactly the joint law of sorted iid uniforms.  shape's last axis is
    n; leading axes are independent batches.
    """
    *batch, n = shape
    e = jax.random.exponential(key, (*batch, n + 1), dtype=jnp.float32)
    s = cumsum_mm(e)
    return s[..., :n] / s[..., n:]


def onehot_select(idx: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """values (..., M) read at int idx (..., N) -> (..., N), gather-free
    AND materialization-free.

    The matmul one-hot forms (interp_from_counts, the dot_generals in
    sampling.py) win at small ray batches but their (R, N, M) operands are
    MXU inputs, so XLA materializes them in HBM — at R=2^14 that is GBs of
    traffic per step (the round-1 large-batch cliff).  This form keeps the
    compare INSIDE a where+reduce so XLA's loop fusion evaluates the
    (..., N, M) intermediate tile-by-tile in registers; `where` (not
    multiply) also keeps the algebraic simplifier from strength-reducing the
    reduction back into a dot.  Exact: one selected element per output, no
    summation rounding.  Under autodiff the cotangent to ``values`` is the
    mirrored where+reduce over N — no scatter.
    """
    m = values.shape[-1]
    iota = jnp.arange(m, dtype=idx.dtype)
    hit = idx[..., :, None] == iota  # (..., N, M) — fused, never materialized
    return jnp.sum(
        jnp.where(hit, values[..., None, :], jnp.zeros((), values.dtype)),
        axis=-1,
    )


def interp_from_counts(le: jnp.ndarray, values: jnp.ndarray):
    """Gather values at (below, above) interval endpoints without gathers.

    le: (..., N, M) float 0/1 matrix, le[..., n, m] = [sorted_vals[m] <= u[n]]
    values: (..., M).  Returns (v_below, v_above) of shape (..., N) where
    below = clamp(count-1) and above = clamp(count), matching sample_pdf's
    endpoint convention (count >= 1 guaranteed when sorted_vals[0] <= all u).

    one-hot(below) = le - shift(le); the endpoint reads become two batched
    matvecs on the MXU instead of take_along_axis gathers.
    """
    oh_below = le - jnp.concatenate(
        [le[..., 1:], jnp.zeros_like(le[..., :1])], axis=-1
    )
    # above = below + 1 clamped to M-1: shift one-hot right, overflow stays
    oh_above = jnp.concatenate(
        [jnp.zeros_like(oh_below[..., :1]), oh_below[..., :-1]], axis=-1
    )
    oh_above = oh_above.at[..., -1].add(oh_below[..., -1])

    def mv(oh):
        return jax.lax.dot_general(
            oh, values.astype(jnp.float32),
            dimension_numbers=(((oh.ndim - 1,), (values.ndim - 1,)),
                               (tuple(range(oh.ndim - 2)), tuple(range(values.ndim - 1)))),
            precision=jax.lax.Precision.HIGHEST,
        )

    return mv(oh_below), mv(oh_above)
