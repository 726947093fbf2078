"""Conservative vertical remapping of a single field (map_single).

jnp port of ai2cm/pace fv3core/pace/fv3core/stencils/map_single.py.  The
reference's per-column `lev` bookkeeping with a data-dependent while loop
becomes a vectorized overlap-integral: for every (target, source) layer
pair, integrate the PPM reconstruction over the pressure overlap — a
TPU-friendly dense contraction over the source-layer axis via lax.scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pace_tpu.ops.remap_profile import remap_profile


def lagrangian_contributions_scan(pe1, pe2, q4_1, q4_2, q4_3, q4_4, dp1):
    """O(nz^2) overlap-scan form, kept as the numerical reference for
    lagrangian_contributions (tests/test_pallas_transport.py style
    pinning).  Each of the nz scan iterations re-reads the full target
    arrays from HBM, so on TPU this moves ~nz x the fundamental bytes."""
    nz = q4_1.shape[-1]
    lo_t = pe2[..., :-1]
    hi_t = pe2[..., 1:]

    def body(acc, xs):
        p_l, p_r, dpl, c2, c3, c4 = xs
        lo = jnp.maximum(lo_t, p_l[..., None])
        hi = jnp.minimum(hi_t, p_r[..., None])
        dp_ov = jnp.maximum(hi - lo, 0.0)
        s1 = (lo - p_l[..., None]) / dpl[..., None]
        s2 = (hi - p_l[..., None]) / dpl[..., None]
        delta = c3 - c2
        mean = (
            c2[..., None]
            + 0.5 * (delta + c4)[..., None] * (s1 + s2)
            - c4[..., None] * (s1 * s1 + s1 * s2 + s2 * s2) / 3.0
        )
        return acc + dp_ov * mean, None

    kf = lambda q: jnp.moveaxis(q, -1, 0)  # noqa: E731
    xs = (
        kf(pe1[..., :-1]), kf(pe1[..., 1:]), kf(dp1),
        kf(q4_2), kf(q4_3), kf(q4_4),
    )
    total, _ = jax.lax.scan(body, jnp.zeros_like(q4_1), xs)
    return total / (hi_t - lo_t)


def lagrangian_contributions(pe1, pe2, q4_1, q4_2, q4_3, q4_4, dp1):
    """Mean of the PPM subgrid reconstruction over each Eulerian layer.

    pe1/pe2 (..., nz+1) Lagrangian/Eulerian interface pressures (pe1 and
    pe2 must span the same total column); q4_* / dp1 (..., nz).
    Returns q on Eulerian layers (..., nz).
    """
    out = lagrangian_contributions_stacked(
        pe1, pe2, q4_1[None], q4_2[None], q4_3[None], q4_4[None], dp1
    )
    return out[0]


def lagrangian_contributions_stacked(pe1, pe2, q4_1, q4_2, q4_3, q4_4,
                                     dp1):
    """lagrangian_contributions for a STACK of fields sharing one
    (pe1, pe2) pair: q4_* are (T, ..., nz); pe1/pe2/dp1 unbatched.
    Single-space wrapper around lagrangian_contributions_spaces."""
    return lagrangian_contributions_spaces(
        [(pe1, pe2, q4_1, q4_2, q4_3, q4_4, dp1)]
    )[0]


def lagrangian_contributions_spaces(space_groups, chans_last=False):
    """Shared-indicator remap contraction for several COORDINATE SPACES.

    space_groups: list of (pe1_s, pe2_s, a1_s, a2_s, a3_s, a4_s, dp1_s)
    where the (pe1_s, pe2_s) pairs are monotone transforms of each other
    (e.g. linear pressure and log pressure): the searchsorted indicator
    j[k] = #{m: pe1[m] <= pe2[k]} is then identical in every space, so
    ONE one-hot MXU contraction serves them all.  Coefficient stacks
    a*_s are (T_s, ..., nz).  Returns a list of (T_s, ..., nz_dst)
    remapped stacks, one per space.

    All T fields' gathers ride ONE one-hot MXU contraction, so the
    (..., nz+1, nz) indicator is built and read once -- under vmap the
    batched einsum re-reads it per field (~470 MB each at C48, the
    dominant cost of the 9-tracer remap).

    O(nz) cumulative-integral form: with F(p) the integral of the PPM
    reconstruction from column top to pressure p, each Eulerian layer mean
    is (F(pe2[k+1]) - F(pe2[k])) / dp2[k].  F at a target interface is an
    exclusive prefix sum of whole-layer integrals plus one partial-layer
    polynomial integral.  The prefix is O(column mass) while layer
    integrals are ~100x smaller, so the prefix is carried as a compensated
    double-float (hi from cumsum, lo from the accumulated Fast2Sum rounding
    errors); the hi-part differences of nearby interfaces are exact by
    Sterbenz and the lo part restores the cancelled bits -- f32 accuracy
    matches the overlap-scan form to ~1e-7 relative.
    """
    pe1_0, pe2_0 = space_groups[0][0], space_groups[0][1]
    nz = space_groups[0][2].shape[-1]
    dt = space_groups[0][2].dtype
    # source layer index containing each target interface:
    # j[k] = #{m in 1..nz-1 : pe1[m] <= pe2[k]} in [0, nz-1]
    interior = pe1_0[..., 1:-1]
    j = jnp.sum(
        (interior[..., None, :] <= pe2_0[..., :, None]).astype(jnp.int32),
        axis=-1,
    )

    # Gather layer quantities at j via ONE one-hot MXU contraction.  A
    # take_along_axis gather along the minor (lane) axis serializes on TPU
    # (~17 ms per 7-array batch at C48) while the contraction is one MXU
    # pass and is EXACT at HIGHEST precision: each output has exactly one
    # nonzero 0/1 weight, and the f32 operand splitting makes the lone
    # product round once.
    ind = (
        j[..., :, None]
        == jax.lax.broadcasted_iota(jnp.int32, j.shape + (nz,), j.ndim)
    ).astype(dt)

    parts_cf = []
    for pe1, pe2, q4_1, q4_2, q4_3, q4_4, dp1 in space_groups:
        # whole-layer integrals of the reconstruction (its own analytic
        # integral, not a1*dp1 -- exact even where the PPM constraints
        # leave a* inconsistent with the cell mean) + compensated prefix
        integ = dp1 * (
            q4_2 + 0.5 * (q4_3 - q4_2 + q4_4) - q4_4 / 3.0
        )
        z = jnp.zeros_like(integ[..., :1])
        c_hi = jnp.concatenate([z, jnp.cumsum(integ, -1)], -1)
        err = (c_hi[..., 1:] - c_hi[..., :-1]) - integ
        c_lo = -jnp.concatenate([z, jnp.cumsum(err, -1)], -1)
        shared = jnp.stack([pe1[..., :-1], dp1], 0)
        parts_cf.append(jnp.concatenate([
            jnp.broadcast_to(shared, shared.shape[:1] + q4_2.shape[1:]),
            q4_2, q4_3 - q4_2, q4_4, c_hi[..., :-1], c_lo[..., :-1],
        ], axis=0))
    # Channel placement is CONFIG-DEPENDENT (both measured on-chip,
    # bit-identical results, 2026-08-21):
    # - chans_last=True puts channels on the LAST axis so the dot's
    #   minor pair (m=nz, c) matches what the elementwise cascade
    #   produces -- no whole-operand {4,0,3,2,1} relayout.  WINS in the
    #   k2/n6 production step (349.8 vs 354.8 ms) and in isolation
    #   (25.8 vs 29.4 ms 9-tracer stack) but LOSES in the k1/n2 step
    #   (103.9 vs 100.5 ms): there XLA instead relayouts the (…, k, c)
    #   outputs for the state consumers.  remapping.py selects it for
    #   n_split >= 4 (same gate family as the fused d_sw transport).
    # - chans_last=False (default) concatenates channel-first.
    # The materialization fence ON THE COMBINED CHANNELS is
    # load-bearing in both forms: without it the layout assignment
    # relayout-copies every channel piece separately (measured 41.4 ms
    # channel-first / 26.6 ms channel-last, 9-tracer stack).
    if chans_last:
        parts = []
        for piece in parts_cf:
            parts.extend(piece[i] for i in range(piece.shape[0]))
        chans = jax.lax.optimization_barrier(jnp.stack(parts, -1))
        out_kc = jnp.einsum(
            "...km,...mc->...kc", ind, chans,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        chans = jax.lax.optimization_barrier(
            parts_cf[0] if len(parts_cf) == 1
            else jnp.concatenate(parts_cf, 0))
        out = jnp.einsum(
            "...km,c...m->c...k", ind, chans,
            precision=jax.lax.Precision.HIGHEST,
        )
    results = []
    off = 0
    for pe1, pe2, q4_1, q4_2, q4_3, q4_4, dp1 in space_groups:
        T = q4_1.shape[0]
        if chans_last:
            def grp(i, off=off, T=T):
                # (..., k, T) channel block -> (T, ..., k) field stack
                return jnp.moveaxis(
                    out_kc[..., off + 2 + i * T:off + 2 + (i + 1) * T],
                    -1, 0)

            p_l, dpl = out_kc[..., off], out_kc[..., off + 1]
            c2, delta, c4, f_hi, f_lo0 = (grp(i) for i in range(5))
        else:
            p_l, dpl = out[off], out[off + 1]
            c2 = out[off + 2:off + 2 + T]
            delta = out[off + 2 + T:off + 2 + 2 * T]
            c4 = out[off + 2 + 2 * T:off + 2 + 3 * T]
            f_hi = out[off + 2 + 3 * T:off + 2 + 4 * T]
            f_lo0 = out[off + 2 + 4 * T:off + 2 + 5 * T]
        off += 2 + 5 * T

        # partial integral inside layer j up to the target interface
        s = jnp.clip((pe2 - p_l) / dpl, 0.0, 1.0)
        partial = dpl * s * (
            c2 + 0.5 * (delta + c4) * s - c4 * (s * s) / 3.0
        )
        f_lo = f_lo0 + partial
        num = (f_hi[..., 1:] - f_hi[..., :-1]) + \
            (f_lo[..., 1:] - f_lo[..., :-1])
        results.append(num / (pe2[..., 1:] - pe2[..., :-1]))
    return results


def map_single(q1, pe1, pe2, n, h, kord, mode, qs=None, qmin: float = 0.0):
    """Remap q1 from Lagrangian levels pe1 to Eulerian levels pe2."""
    dp1 = pe1[..., 1:] - pe1[..., :-1]
    if qs is None:
        qs = jnp.zeros(q1.shape[:-1], q1.dtype)
    a1, a2, a3, a4 = remap_profile(qs, q1, dp1, n, h, kord, mode, qmin)
    return lagrangian_contributions(pe1, pe2, a1, a2, a3, a4, dp1)


def map_single_multi(items, pe1, pe2, n, h):
    """Remap several fields sharing one (pe1, pe2) pair but with
    DIFFERENT (kord, mode, qs, qmin): one remap_profile per field, then
    one shared searchsorted indicator + MXU contraction for all of them
    (the indicator build/read is the dominant cost of a lone map_single).

    items: list of (q, kord, mode, qs_or_None, qmin). Returns the list of
    remapped fields."""
    dp1 = pe1[..., 1:] - pe1[..., :-1]
    coeffs = []
    for q, kord, mode, qs, qmin in items:
        if qs is None:
            qs = jnp.zeros(q.shape[:-1], q.dtype)
        coeffs.append(remap_profile(qs, q, dp1, n, h, kord, mode, qmin))
    stacked = [jnp.stack(parts) for parts in zip(*coeffs)]
    out = lagrangian_contributions_stacked(pe1, pe2, *stacked, dp1)
    return [out[i] for i in range(len(items))]


def map_single_spaces(space_groups, n, h, chans_last=False):
    """Remap groups of fields across several ORDER-EQUIVALENT coordinate
    spaces through one shared indicator + MXU contraction.

    space_groups: list of (pe1, pe2, groups) where every (pe1, pe2) pair
    is a monotone transform of the others (e.g. pressure and
    log-pressure: the reference remaps pt in log-p, remapping.py:71, but
    the source-layer indicator is order-based so it is identical in both
    spaces).  groups is a list of (q_stack_or_field, kord, mode, qs,
    qmin) as in map_single_groups.

    Returns a list of per-space result lists matching the input ranks."""
    contraction_inputs = []
    meta = []
    for pe1, pe2, groups in space_groups:
        base_ndim = pe1.ndim  # unstacked field rank
        dp1 = pe1[..., 1:] - pe1[..., :-1]
        coeffs = []
        sizes = []
        stacked_in = []
        for q, kord, mode, qs, qmin in groups:
            if q.ndim == base_ndim:
                q = q[None]
                stacked_in.append(False)
            else:
                stacked_in.append(True)
            sizes.append(q.shape[0])
            if qs is None:
                qs_g = jnp.zeros(q.shape[1:-1], q.dtype)
            else:
                qs_g = qs
            a = jax.vmap(
                lambda t: remap_profile(qs_g, t, dp1, n, h, kord, mode,
                                        qmin)
            )(q)
            coeffs.append(a)
        stacked = [jnp.concatenate(parts, 0) for parts in zip(*coeffs)]
        contraction_inputs.append((pe1, pe2, *stacked, dp1))
        meta.append((sizes, stacked_in))
    outs = lagrangian_contributions_spaces(contraction_inputs,
                                           chans_last=chans_last)
    all_results = []
    for out, (sizes, stacked_in) in zip(outs, meta):
        results = []
        start = 0
        for size, was_stacked in zip(sizes, stacked_in):
            r = out[start:start + size]
            results.append(r if was_stacked else r[0])
            start += size
        all_results.append(results)
    return all_results


def map_single_groups(groups, pe1, pe2, n, h):
    """Remap several GROUPS of fields sharing one (pe1, pe2) pair: each
    group is (q_stack(T_i, ..., nz) or q(..., nz), kord, mode, qs, qmin).
    One remap_profile per group (vmapped over its stack), then ONE shared
    searchsorted indicator + MXU contraction for every field of every
    group — the indicator build/read is the dominant fixed cost of a
    contraction, so the tracer stack and w/delz ride a single pass.

    Returns a list of remapped stacks/fields matching the input ranks."""
    return map_single_spaces([(pe1, pe2, groups)], n, h)[0]


def map_single_stacked(q_stack, pe1, pe2, n, h, kord, mode,
                       qmin: float = 0.0):
    """Remap a (T, ..., nz) STACK of fields sharing one (pe1, pe2) pair
    and (kord, mode); the searchsorted indicator and its MXU contraction
    are built once for all T fields."""
    dp1 = pe1[..., 1:] - pe1[..., :-1]
    zero_qs = jnp.zeros(q_stack.shape[1:-1], q_stack.dtype)
    a1, a2, a3, a4 = jax.vmap(
        lambda q: remap_profile(zero_qs, q, dp1, n, h, kord, mode, qmin)
    )(q_stack)
    # the materialization fence lives on the concatenated channels inside
    # lagrangian_contributions_stacked (see comment there)
    return lagrangian_contributions_stacked(pe1, pe2, a1, a2, a3, a4, dp1)
