"""Depth sampling: stratified, inverse-CDF importance, coarse/fine merge.

Capability parity (behavior, not code) with:
  - stratified coarse samples:  /root/reference/nerf/utils.py:87-90
  - inverse-CDF sample_pdf:     /root/reference/nerf/utils.py:108-133
  - inverseSample wrapper:      /root/reference/nerf/utils.py:34-44
  - max-blur filter:            /root/reference/nerf/mip_methods.py:61-66
  - proposal bound gather:      /root/reference/nerf/addtional.py:14-18
  - coarse/fine z merge:        /root/reference/nerf/nerf_base.py:58-73

TPU-first design notes:
  * ``searchsorted`` is replaced by a vectorized comparison-count
    (sum over the bin axis of ``cdf <= u``): for the small static bin counts
    of this workload (<= 64 bins) a dense O(N*M) compare on the VPU fuses into
    neighbors and beats a gather-heavy binary search.
  * All shapes are static; sample counts are compile-time constants.
  * Randomness is explicit (jax PRNG keys); distributions match the reference
    (iid uniforms for the CDF inversion, per-interval jitter for stratified),
    not its global-RNG streams.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Endpoint-read strategy for sample_pdf / weight_bounds / merge_coarse_fine:
# "fused"  — fastmath.onehot_select compare+where+reduce; XLA fuses it, no
#            (R, N, M) tensor ever materializes, flat in ray-batch size.
# "matmul" — round-1 one-hot MXU matvecs; kept as the measured-against oracle
#            (collapses at R >= 2^14: the operands are GBs of HBM traffic).
# Functions take select=None meaning "use this module default".
DEFAULT_SELECT = "fused"


def _select(select: str | None) -> str:
    mode = DEFAULT_SELECT if select is None else select
    if mode not in ("fused", "matmul"):
        raise ValueError(f"unknown select mode {mode!r}")
    return mode


def stratified_samples(key, n_rays: int, n_samples: int, near: float, far: float,
                       jitter: jnp.ndarray | None = None):
    """Jittered lengths in [near, far): linspace(near, far-res) + U(0,res).

    Parity: utils.py:87-90 (one sample per interval, interval width res).
    Returns (n_rays, n_samples) float32.  ``jitter`` (n_rays, n_samples)
    uniforms override the drawn ones (pre-generated eval noise).
    """
    res = (far - near) / n_samples
    base = jnp.linspace(near, far - res, n_samples, dtype=jnp.float32)
    if jitter is None:
        jitter = jax.random.uniform(key, (n_rays, n_samples), dtype=jnp.float32)
    return base[None, :] + jitter * res


def count_le(sorted_vals: jnp.ndarray, queries: jnp.ndarray) -> jnp.ndarray:
    """#{m : sorted_vals[..., m] <= q} per query == searchsorted(..., right=True).

    sorted_vals: (..., M), queries: (..., N) -> int32 (..., N).
    Dense compare-and-sum; MXU/VPU friendly for small static M.
    """
    le = sorted_vals[..., None, :] <= queries[..., :, None]
    return jnp.sum(le.astype(jnp.int32), axis=-1)


def count_lt(sorted_vals: jnp.ndarray, queries: jnp.ndarray) -> jnp.ndarray:
    """#{m : sorted_vals[..., m] < q} == searchsorted(..., side='left')."""
    lt = sorted_vals[..., None, :] < queries[..., :, None]
    return jnp.sum(lt.astype(jnp.int32), axis=-1)


def sample_pdf(key, bins: jnp.ndarray, weights: jnp.ndarray, n_samples: int,
               u: jnp.ndarray | None = None, select: str | None = None):
    """Inverse-transform sampling of the piecewise-constant PDF over bins.

    bins: (..., M) sorted bin edges; weights: (..., M-1) unnormalized.
    Returns (samples, below, above): samples (..., n_samples) and the lower /
    upper CDF indices of the interval each sample landed in.
    Behavior parity: utils.py:108-133 (incl. the 1e-5 weight floor and the
    denom < 1e-5 guard).  ``u`` overrides the drawn uniforms (testing).

    select: "fused" (default) reads the four interval endpoints with
    fastmath.onehot_select — compare+where+reduce that XLA fuses without
    materializing any (R, N, M) tensor, flat in ray-batch size; "matmul"
    keeps the round-1 one-hot MXU matvecs (oracle; materializes (R, N, M)
    in HBM, collapses at R >= 2^14).
    """
    from nerf_tpu.core.fastmath import cumsum_mm, interp_from_counts, onehot_select

    select = _select(select)
    w = weights + 1e-5
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf = cumsum_mm(pdf)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (..., M)

    if u is None:
        u = jax.random.uniform(key, (*cdf.shape[:-1], n_samples), dtype=cdf.dtype)
    if select == "fused":
        inds = count_le(cdf, u)
        below = jnp.maximum(0, inds - 1)
        above = jnp.minimum(cdf.shape[-1] - 1, inds)
        cdf_b = onehot_select(below, cdf)
        cdf_a = onehot_select(above, cdf)
        bins_b = onehot_select(below, bins)
        bins_a = onehot_select(above, bins)
    else:
        # dense compare once; counts give searchsorted, shifted-one-hot
        # matvecs give the four endpoint reads (see fastmath)
        le = (cdf[..., None, :] <= u[..., :, None]).astype(jnp.float32)
        inds = jnp.sum(le, axis=-1).astype(jnp.int32)
        below = jnp.maximum(0, inds - 1)
        above = jnp.minimum(cdf.shape[-1] - 1, inds)
        cdf_b, cdf_a = interp_from_counts(le, cdf)
        bins_b, bins_a = interp_from_counts(le, bins)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_b) / denom
    samples = bins_b + t * (bins_a - bins_b)
    return samples, below, above


def inverse_sample(key, weights: jnp.ndarray, coarse_depth: jnp.ndarray,
                   n_samples: int, sort: bool = False,
                   u: jnp.ndarray | None = None):
    """Importance-sample fine depths from proposal weights.

    weights: (R, P) proposal weights (gradients are stopped, matching the
    reference's .detach() at utils.py:35-36); coarse_depth: (R, P).
    Uses midpoints as bins and the interior weights [1:-1], parity with
    utils.py:37-39.  With sort=True returns (sorted_samples, sorted_below_idx).
    """
    weights = jax.lax.stop_gradient(weights)
    z_mid = 0.5 * (coarse_depth[..., 1:] + coarse_depth[..., :-1])
    if not sort:
        samples, _, _ = sample_pdf(key, z_mid, weights[..., 1:-1], n_samples, u=u)
        return samples
    # Sorted output with NO sort: the CDF inverse is monotone in u, so feeding
    # sorted uniforms yields sorted samples (and monotone below indices).
    # Sorted iid uniforms are drawn directly via exponential spacings
    # (fastmath.sorted_uniforms) — same joint distribution as
    # sort(uniform(n)), which is what the reference computes
    # (utils.py:40-43: sample then torch.sort).
    if u is None:
        from nerf_tpu.core.fastmath import sorted_uniforms

        u = sorted_uniforms(key, (*weights.shape[:-1], n_samples))
    samples, below, _ = sample_pdf(None, z_mid, weights[..., 1:-1], n_samples, u=u)
    return samples, below


def max_blur_filter(weights: jnp.ndarray, alpha: float) -> jnp.ndarray:
    """2-tap max then 2-tap blur + alpha padding (mip-360 proposal filter).

    Parity: mip_methods.py:61-66; live in both train and eval paths of the
    reference (train.py:171, procedures.py:69).
    """
    maxi = jnp.maximum(weights[..., :-1], weights[..., 1:])
    front = jnp.concatenate([weights[..., :1], maxi], axis=-1)
    rear = jnp.concatenate([maxi, weights[..., -1:]], axis=-1)
    return 0.5 * (front + rear) + alpha


def weight_bounds(prop_weights: jnp.ndarray, below_idx: jnp.ndarray,
                  select: str | None = None) -> jnp.ndarray:
    """Proposal-weight mass over each fine-sample index interval.

    prop_weights: (R, P); below_idx: (R, K) sorted lower indices from
    inverse sampling.  bounds[:, k] = sum(prop_weights[start_k : end_k]) with
    starts = below_idx[:, :-1], ends = below_idx[:, 1:] + 1, via a cumulative
    sum gather.  Parity: addtional.py:14-18 (getBounds).

    Gather-free either way: take_along_axis here cost ~4.5 ms/step on a v5e
    (the gathers and their backward scatters were the hottest ops of the
    whole train step).  select="fused" (default) reads the two SAT endpoints
    with fastmath.onehot_select (no materialized (R, K, P+1) tensor, flat in
    R); select="matmul" keeps the round-1 one-hot MXU matvec (oracle;
    collapses at R >= 2^14).
    """
    from nerf_tpu.core.fastmath import cumsum_mm, onehot_select

    select = _select(select)
    r, p = prop_weights.shape
    starts = below_idx[..., :-1]
    ends = below_idx[..., 1:] + 1
    sat = jnp.concatenate(
        [jnp.zeros((r, 1), jnp.float32), cumsum_mm(prop_weights)], axis=-1
    )
    if select == "fused":
        return onehot_select(ends, sat) - onehot_select(starts, sat)
    iota = jnp.arange(p + 1, dtype=jnp.int32)
    sel = ((ends[..., None] == iota).astype(sat.dtype)
           - (starts[..., None] == iota).astype(sat.dtype))  # (R, K, P+1)
    return jax.lax.dot_general(
        sel, sat, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # keep the f32 sums out of bf16
    )


def merge_coarse_fine(c_z: jnp.ndarray, f_z: jnp.ndarray, f_idx=None,
                      select: str | None = None):
    """Merge sorted coarse + fine depths, dropping the largest element.

    Returns (z_merged (R, C+F-1), src_index (R, C+F-1), coarse_pos (R, C)):
      * ``src_index``: for each merged slot, the index into cat(fine, coarse)
        it came from (the reference's sort_inds, nerf_base.py:60).
      * ``coarse_pos``: position of coarse sample j in the merged array
        (C+F-1 marks the dropped element — always the largest coarse sample).
    If ``f_idx`` (R, F) is given (the fine samples' ``below`` bookkeeping),
    also returns ``idx_merged`` (R, C+F): cat(f_idx, arange(C)) in merged
    order *without* the final truncation, matching nerf_base.py:61-65 where
    all_inds keeps the full length for getBounds.

    TPU-first: both inputs are already sorted, so instead of sorting the
    concatenation (reference nerf_base.py:59-60) we compute merge ranks with
    two comparison-counts and materialize the permutation with one scatter —
    O(C*F) compares, no O(n log^2 n) sorting network.  Stability matches
    torch.sort: on ties, fine entries (lower cat index) come first.
    """
    select = _select(select)
    r, nc = c_z.shape
    nf = f_z.shape[-1]
    n = nc + nf

    # rank_f is monotone (f sorted), so "how many fine land at positions <= j"
    # is a compare-count against it; that single matrix answers, per merged
    # slot j, whether it holds a fine or coarse element and which index —
    # scatter-free (TPU scatters serialize; compares + two gathers don't).
    rank_f = jnp.arange(nf, dtype=jnp.int32)[None, :] + count_lt(c_z, f_z)
    rank_c = jnp.arange(nc, dtype=jnp.int32)[None, :] + count_le(f_z, c_z)

    positions = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (r, n))
    nf_before = count_le(rank_f, positions)  # (r, n)
    prev = jnp.concatenate([jnp.zeros((r, 1), jnp.int32), nf_before[..., :-1]], axis=-1)
    is_fine = nf_before > prev
    fine_idx = jnp.maximum(nf_before - 1, 0)
    coarse_idx = jnp.clip(positions - nf_before, 0, nc - 1)

    src = jnp.where(is_fine, fine_idx, nf + coarse_idx)

    # Gather-free materialization: row-wise take_along_axis here cost
    # 7.2 ms/step on a v5e (the three hottest ops of the whole Ref-NeRF
    # step).  select="fused" (default) reads z_cat at src with
    # fastmath.onehot_select — no materialized (R, n, n) tensor, flat in R;
    # select="matmul" keeps the round-1 one-hot selection matmul (oracle;
    # at R=2^14 its (R, 193, 193) f32 operand is ~2.4 GB of HBM traffic).
    # f32 throughout: depths need more mantissa than bf16 carries.
    z_cat = jnp.concatenate([f_z, c_z], axis=-1).astype(jnp.float32)
    if select == "fused":
        from nerf_tpu.core.fastmath import onehot_select

        z_full = onehot_select(src, z_cat)
        sel = None
    else:
        sel = (src[..., None] == jnp.arange(n, dtype=jnp.int32)).astype(jnp.float32)
        z_full = jax.lax.dot_general(
            sel, z_cat, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # depths must stay f32 on TPU
        )

    z_merged = z_full[..., :-1]
    src_index = src[..., :-1]
    coarse_pos = rank_c

    if f_idx is None:
        return z_merged, src_index, coarse_pos

    idx_cat = jnp.concatenate(
        [f_idx.astype(jnp.float32),
         jnp.broadcast_to(jnp.arange(nc, dtype=jnp.float32), (r, nc))], axis=-1)
    if select == "fused":
        from nerf_tpu.core.fastmath import onehot_select

        idx_full = onehot_select(src, idx_cat).astype(f_idx.dtype)
    else:
        idx_full = jax.lax.dot_general(
            sel, idx_cat, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(f_idx.dtype)
    return z_merged, src_index, coarse_pos, idx_full


def merge_coarse_fine_via_sort(c_z, f_z, f_idx=None):
    """Reference-faithful merge via full sort (test oracle for the rank merge).

    Mirrors nerf_base.py:58-73: zvals = sort(cat(fine, coarse)); gathers the
    index bookkeeping through the sort permutation; truncates the last slot.
    """
    r, nc = c_z.shape
    nf = f_z.shape[-1]
    z_cat = jnp.concatenate([f_z, c_z], axis=-1)
    order = jnp.argsort(z_cat, axis=-1, stable=True)
    z_sorted = jnp.take_along_axis(z_cat, order, axis=-1)
    z_merged = z_sorted[..., :-1]
    src_index = order[..., :-1].astype(jnp.int32)
    if f_idx is None:
        return z_merged, src_index
    c_iota = jnp.broadcast_to(jnp.arange(nc, dtype=f_idx.dtype), (r, nc))
    idx_cat = jnp.concatenate([f_idx, c_iota], axis=-1)
    idx_full = jnp.take_along_axis(idx_cat, order, axis=-1)
    return z_merged, src_index, idx_full
