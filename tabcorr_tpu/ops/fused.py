"""Pallas-fused batched prediction kernels.

The XLA predict path materializes the per-sample contraction intermediate
``T[b, k, i] = sum_j F[k, i, j] n[b, j]`` (~24 KB per prediction for a
wp + xi_ell bundle) in HBM, which bounds throughput at memory bandwidth.
These kernels perform the whole contraction per batch tile in VMEM:

Auto mode:   xi[b, k] = n_b^T F_k n_b / (sum_i n_bi)^2
Cross mode:  xi[b, k] = (F n_b)_k / sum_i n_bi

Two engines:

* :func:`make_fused_predictor` — one table; the occupation quadrature
  stays in XLA outside the kernel (supports any jax-traceable occupation
  model and any mode).
* :func:`make_fused_bundle_predictor` — the flagship multi-statistic
  path: ONE kernel evaluates the occupation quadrature (VPU + small MXU
  matmuls against precomputed weight matrices) *and* every table's dense
  contraction per batch tile, so nothing but parameters and results
  crosses HBM.  Occupation callables are traced into the kernel under
  ``utils.backend.pallas_lowering()``, which substitutes a Mosaic-
  lowerable polynomial erfc/erf (Mosaic has no erf primitive).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import backend
from .predict import (AUTO, TableData, mean_occupation,
                      occupation_with_residual)

# Default batch tile: 512 is the fastest measured on v5e at production
# table sizes for the bundle with the exact-residual occupation path
# (tile sweep 128/192/256/384/512/768; 768 overflows VMEM headroom and
# craters).  256 was optimal under the older, more VPU-bound kernel.
DEFAULT_TILE = 512


def _pack_geometry(n_bins, nb_pad, pack_slabs):
    """(pack, nb_sub, slab_w) for the auto-mode slab layout.

    ``pack`` statistics share one 128-lane MXU output group when the
    8-aligned bin count fits at least twice (``nb_sub <= 64``); otherwise
    the dense one-slab-per-statistic layout (pack=1, slab width nb_pad).
    """
    if pack_slabs:
        nb_sub = -(-n_bins // 8) * 8
        if 128 // nb_sub >= 2:
            return 128 // nb_sub, nb_sub, 128
    return 1, nb_pad, nb_pad


def _exact_split3(x):
    """Exact 3-term bfloat16 decomposition of a float32 array
    (x == hi + mid + lo bit-for-bit: each residual subtraction is
    exactly representable and 3 x 8 significand bits cover float32's
    24)."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _exact_gather_dot(parts, sel):
    """sum_k parts_k @ sel — exact f32 gather/segment-sum for a 0/1
    bfloat16 ``sel`` (the 0/1 entries are bf16-exact, so each pass is a
    plain single-pass bf16 MXU dot with no operand error)."""
    return sum(jnp.dot(p, sel[:], preferred_element_type=jnp.float32)
               for p in parts)


def _lane_replicated(ngal, pack, nb_sub, slab_w, total_w):
    """ngal replicated across ``total_w`` slab lanes: the per-slab
    pattern (``pack`` copies of the first ``nb_sub`` bins, zero-padded
    to ``slab_w``) tiled over every slab group, so one aligned VPU
    multiply applies ngal to the whole grouped-contraction output."""
    if pack > 1:
        rep = [ngal[:, :nb_sub]] * pack
        pad_w = slab_w - pack * nb_sub
        if pad_w:
            rep.append(jnp.zeros((ngal.shape[0], pad_w), ngal.dtype))
    else:
        rep = [ngal]
    return jnp.concatenate(rep * (total_w // slab_w), axis=-1)


def _auto_quadratic_cols(t, ngal, groups, pack, nb_sub, slab_w):
    """Per-statistic quadratic-form columns from the grouped contraction.

    ``t`` holds the pass-group blocks of ``ngal @ F2`` laid out by
    :func:`_pack_geometry`; multiplies each (possibly packed) slab by a
    lane-replicated ngal and reduces each statistic's sub-slab lanes.
    Returns the (TB, n_xi) stack in row-permuted order.
    """
    if pack > 1:
        # Lane-replicated ngal so each packed 128-lane group multiplies
        # in one aligned VPU op; per-statistic sub-slab sums then read
        # lane ranges of the product.
        rep = [ngal[:, :nb_sub]] * pack
        pad_w = slab_w - pack * nb_sub
        if pad_w:
            rep.append(jnp.zeros((ngal.shape[0], pad_w), ngal.dtype))
        n_rep = jnp.concatenate(rep, axis=-1)
    else:
        n_rep = ngal
    cols = []
    off = 0
    for _, count in groups:
        n_grp = -(-count // pack)
        for g in range(n_grp):
            u = t[:, off + g * slab_w:off + (g + 1) * slab_w] * n_rep
            for s in range(min(pack, count - g * pack)):
                cols.append(jnp.sum(u[:, s * nb_sub:(s + 1) * nb_sub],
                                    axis=-1))
        off += n_grp * slab_w
    return jnp.stack(cols, axis=-1)


def make_fused_contraction(table: TableData, batch_tile=DEFAULT_TILE,
                           interpret="auto", precision="highest",
                           error_model="elementwise",
                           scale_block_rows=None, pack_slabs=True):
    """Fused contraction: ``ngal (B, n_bins) -> (total (B,), xi (B, n_xi))``.

    B must be a multiple of ``batch_tile`` (callers pad).
    ``precision='highest'`` (default) keeps the MXU matmul at full float32
    effective precision (<1e-6 relative); ``'default'`` uses the
    single-pass bf16 MXU mode (~1e-3 relative, ~1.5x faster).
    ``error_model='scaled'`` budgets error against the statistic's
    largest element, letting low-amplitude rows contract at fewer MXU
    passes (see :func:`_row_pass_classes`); ``'elementwise'`` keeps every
    row at full precision.  ``scale_block_rows`` normalizes the budget
    within consecutive row blocks (stacked-node Interpolator matrices:
    one block per grid node).
    """
    if interpret == "auto":
        # Mosaic compiles on TPU only; on a CPU-only host the kernel
        # runs in interpret mode (same auto rule as the bundle path).
        interpret = jax.default_backend() != "tpu"
    n_bins = table.n_bins
    # Pad the bin axis to a lane multiple (128): Mosaic only lowers the
    # (TB, n_xi * nb) -> (TB, n_xi, nb) reshape when nb is lane-aligned,
    # and padded bins carry ngal = 0 so they contribute nothing.
    nb_pad = -(-n_bins // 128) * 128
    n_xi = table.tpcf_dense.shape[0]
    auto = table.mode == AUTO
    dtype = table.tpcf_dense.dtype

    groups, row_perm, row_inv_perm = _pass_groups(
        table.tpcf_dense, auto, error_model, precision,
        scale_block_rows=scale_block_rows)

    # (nb_pad, n_xi * nb_pad) in auto mode so T = N @ F2 is one MXU
    # matmul (several statistics share a 128-lane group when the bin
    # count allows — see _pack_geometry); (nb_pad, n_xi) in cross mode.
    pack, nb_sub, slab_w = _pack_geometry(n_bins, nb_pad,
                                          pack_slabs and auto)
    widths = None
    if auto:
        perm_dense = table.tpcf_dense[np.asarray(row_perm)]
        widths = [-(-count // pack) * slab_w for _, count in groups]
        f2 = jnp.zeros((nb_pad, sum(widths)), dtype=dtype)
        row_ptr = col = 0
        for (_, count), w in zip(groups, widths):
            for idx in range(count):
                g, s = divmod(idx, pack)
                c0 = col + g * slab_w + s * nb_sub
                f2 = f2.at[:n_bins, c0:c0 + n_bins].set(
                    jnp.transpose(perm_dense[row_ptr + idx]))
            row_ptr += count
            col += w
    else:
        f2 = jnp.zeros((nb_pad, n_xi), dtype=dtype)
        f2 = f2.at[:n_bins].set(jnp.transpose(
            table.tpcf_dense[np.asarray(row_perm)], (1, 0)))

    flat_blocks = _split_f_blocks(f2, groups, auto, nb_pad, dtype,
                                  widths=widths)

    def kernel(ngal_ref, *rest):
        f_arrays = [r[:] for r in rest[:len(flat_blocks)]]
        total_out, xi_out = rest[len(flat_blocks):]
        ngal = ngal_ref[:]                              # (TB, nb_pad)
        total = jnp.sum(ngal, axis=-1)
        total_out[:] = total[:, None]
        t = _grouped_dots(ngal, f_arrays, groups, precision, dtype)
        if auto:
            xi = _auto_quadratic_cols(t, ngal, groups, pack, nb_sub,
                                      slab_w)
            xi_out[:] = xi / (total * total)[:, None]
        else:
            xi_out[:] = t / total[:, None]

    def contract(ngal):
        batch = ngal.shape[0]
        ngal = jnp.pad(ngal, ((0, 0), (0, nb_pad - ngal.shape[1])))
        grid = (batch // batch_tile,)
        total, xi = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((batch_tile, nb_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)] +
                     [pl.BlockSpec(a.shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
                      for a in flat_blocks],
            out_specs=(
                pl.BlockSpec((batch_tile, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((batch_tile, n_xi), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)),
            out_shape=(
                jax.ShapeDtypeStruct((batch, 1), dtype),
                jax.ShapeDtypeStruct((batch, n_xi), dtype)),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(ngal, *flat_blocks)
        if not np.array_equal(row_inv_perm, np.arange(n_xi)):
            xi = xi[:, np.asarray(row_inv_perm)]
        return total[:, 0], xi

    return contract


def make_fused_predictor(table: TableData, occupation_cen, occupation_sat,
                         param_names=None, batch_tile=DEFAULT_TILE,
                         interpret="auto", precision="highest",
                         error_model="elementwise"):
    """Fused batched predictor ``f(params dict of (B,)) -> (ngal, xi)``.

    XLA occupation quadrature + Pallas VMEM-resident contraction.  The
    batch is padded to a ``batch_tile`` multiple internally.  See
    :func:`make_fused_contraction` for the ``precision`` and
    ``error_model`` trade-offs.
    """
    contract = make_fused_contraction(table, batch_tile=batch_tile,
                                      interpret=interpret,
                                      precision=precision,
                                      error_model=error_model)
    dtype = table.tpcf_dense.dtype

    @jax.jit
    def predict_batch(params):
        any_param = next(iter(params.values()))
        batch = any_param.shape[0]
        padded = -(-batch // batch_tile) * batch_tile
        params_padded = {
            k: jnp.pad(jnp.asarray(v, dtype=dtype), (0, padded - batch),
                       constant_values=1.0)
            for k, v in params.items()}

        mean_occ = jax.vmap(lambda p: mean_occupation(
            table, occupation_cen, occupation_sat, p))(params_padded)
        ngal = mean_occ * table.n_h
        total, xi = contract(ngal)
        xi = xi[:batch].reshape((batch,) + tuple(table.tpcf_shape))
        return total[:batch], xi

    return predict_batch


# MXU pass-count tiers for float32 matmul operands, and worst-case
# per-pass relative-error constants (relative to the contraction's
# UNSIGNED element mass — see _row_pass_classes).  Analytic bounds for
# round-to-nearest bfloat16: a single pass drops w_lo*F + w*F_res terms
# of ~2 x 2^-9 = 4e-3; the 3-pass hh+hl+lh form drops the three
# two-term-split residual products of ~3 x 2^-18 = 1.1e-5; 6-pass
# reproduces float32 exactly.  Measured realized errors (v5e, random
# tables) run 2-4x below these bounds.
_PASS_RELERR = ((1, 4e-3), (3, 1.2e-5), (6, 0.0))


def _row_pass_classes(dense, tol, scale_block_rows=None, weight_vec=None):
    """Minimal MXU pass count per statistic row under a *scaled* error
    budget.  ``tol`` is the scaled-error budget per row (the caller
    passes target/margin).

    Two bound models:

    * ``weight_vec`` given (a fiducial per-bin density, e.g. ngal at
      the model's default parameters): the RIGOROUS per-element
      truncation bound.  A p-pass contraction's error is bounded by
      c_p times the row's UNSIGNED contraction w^T|F_k|w (auto) /
      |F_k| . w (cross) — bf16 truncation errors scale with element
      magnitudes, never the signed sum — while the 'scaled' metric
      normalizes by the largest SIGNED row value, so
      m_k = unsigned_k / max_j |signed_j|.  This captures both output
      cancellation (xi_2/xi_4 rows whose entries alternate sign) and
      weight concentration (the density-weighted mass of a row sitting
      on bins far from its peak amplitude) — measured factors of up to
      ~60x on real multipole tables that the amplitude-ratio proxy
      below misses entirely (v5e per-row probe, docs/performance.md).
    * ``weight_vec`` None: the legacy amplitude-ratio proxy
      m_k = max|F_k| / max|F|, which under-estimates the error by the
      cancellation/concentration factor and therefore needs the large
      default margin (30) to stay safe.

    ``scale_block_rows`` normalizes within consecutive row blocks of
    that size instead of globally — for stacked-node Interpolator
    matrices, where each node's rows must honor the budget relative to
    THAT node's own statistic peak (a low-amplitude grid node dominates
    the spline-interpolated output near its corner of parameter space).
    """
    dense = np.asarray(dense)
    if weight_vec is not None:
        w = np.asarray(weight_vec, np.float64)
        F = np.asarray(dense, np.float64)
        if F.ndim == 3:
            unsigned = np.einsum("kij,i,j->k", np.abs(F), w, w)
            signed = np.abs(np.einsum("kij,i,j->k", F, w, w))
        else:
            unsigned = np.abs(F) @ w
            signed = np.abs(F @ w)
    else:
        unsigned = np.max(np.abs(dense),
                          axis=tuple(range(1, dense.ndim)))
        signed = unsigned
    if scale_block_rows is None:
        m = unsigned / max(signed.max(), 1e-300)
    else:
        if len(unsigned) % scale_block_rows:
            raise ValueError("scale_block_rows must divide the row count.")
        u = unsigned.reshape(-1, scale_block_rows)
        s = signed.reshape(-1, scale_block_rows)
        m = (u / np.maximum(s.max(axis=1, keepdims=True), 1e-300)).ravel()
    return np.array([min((p for p, c in _PASS_RELERR if c * mk <= tol),
                         default=6) for mk in m])


def _pass_groups(dense, auto, error_model, precision="highest",
                 tol=1e-6, margin=None, scale_block_rows=None,
                 weight_vec=None):
    """(passes, count) groups and the row permutation making them
    contiguous (6-pass rows first, then 3, then 1).

    Applies to auto (quadratic form) and cross (matvec) tables alike: in
    both, statistic row k contracts against its own matrix row/slab, so
    the per-pass relative error scales with that row's own amplitude.
    ``auto`` is accepted for signature symmetry but no longer gates the
    scaled path.  ``margin=None`` resolves per bound model: 3 with a
    fiducial ``weight_vec`` (the rigorous bound; margin covers only the
    batch's density drift from the fiducial), 30 without (the legacy
    amplitude-ratio proxy, whose unmodeled cancellation/concentration
    factor was measured at up to ~60x — see _row_pass_classes).
    """
    del auto
    if margin is None:
        margin = 3.0 if weight_vec is not None else 30.0
    n_xi = dense.shape[0]
    if error_model == "scaled" and precision == "highest":
        passes = _row_pass_classes(dense, tol / margin, scale_block_rows,
                                   weight_vec=weight_vec)
    else:
        passes = np.full(n_xi, 6, dtype=np.int64)
    row_perm = np.argsort(-passes, kind="stable")
    groups = tuple((p, int(np.sum(passes == p))) for p in (6, 3, 1)
                   if np.any(passes == p))
    return groups, row_perm, np.argsort(row_perm)


def _split_f_blocks(f2, groups, auto, nb, dtype=jnp.float32, widths=None):
    """Per-pass-group matrix blocks of the (row-permuted) stacked matrix.

    Mosaic supports only DEFAULT and HIGHEST dot precisions in-kernel, so
    the 3-pass tier is hand-rolled from precomputed bf16 hi/lo halves of
    the static block (the split is free) and a 2-way in-kernel split of
    ngal; the 1-pass tier stores the block directly in bf16.

    ``widths`` overrides the per-group column widths (slab-packed bundle
    layouts — see :func:`_bundle_table_constants`); the default is the
    dense layout ``count * nb`` (auto) / ``count`` (cross).
    """
    blocks = []
    col = 0
    for gi, (p, count) in enumerate(groups):
        width = (widths[gi] if widths is not None
                 else count * nb if auto else count)
        block = f2[:, col:col + width]
        col += width
        if p == 6:
            blocks.append((block,))
        elif p == 3:
            hi = block.astype(jnp.bfloat16)
            lo = (block - hi.astype(dtype)).astype(jnp.bfloat16)
            blocks.append((hi, lo))
        else:
            blocks.append((block.astype(jnp.bfloat16),))
    return tuple(a for blk in blocks for a in blk)


def _grouped_dots(ngal, f_arrays, groups, precision, dtype=jnp.float32):
    """Contraction t = ngal @ f2 as one dot per pass group (see
    :func:`_split_f_blocks`); ``precision='default'`` relaxes every group
    to a single bf16 pass."""
    ngal_hi = ngal.astype(jnp.bfloat16)
    ngal_lo = (ngal - ngal_hi.astype(dtype)).astype(jnp.bfloat16)
    parts = []
    fat = 0
    for stored_passes, count in groups:
        p = stored_passes if precision == "highest" else 1
        if p == 6:
            parts.append(jnp.dot(ngal, f_arrays[fat],
                                 preferred_element_type=dtype,
                                 precision=jax.lax.Precision.HIGHEST))
        elif p == 3:
            hi, lo = f_arrays[fat], f_arrays[fat + 1]
            parts.append(
                jnp.dot(ngal_hi, hi, preferred_element_type=dtype) +
                jnp.dot(ngal_hi, lo, preferred_element_type=dtype) +
                jnp.dot(ngal_lo, hi, preferred_element_type=dtype))
        else:
            block = f_arrays[fat]
            if block.dtype != jnp.bfloat16:
                block = block.astype(jnp.bfloat16)
            parts.append(jnp.dot(ngal_hi, block,
                                 preferred_element_type=dtype))
        fat += 2 if stored_passes == 3 else 1
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)


def _quad_segment_constants(table: TableData, seg_lo, seg_hi, nb):
    """Flattened quadrature-grid constants for one galaxy-type segment.

    Returns (logm, logm_res, sec, w, sel): node masses (+ their float64
    residual row for the in-kernel node correction) and secondary
    percentiles as (1, L) rows padded to a 128-lane multiple, a float32
    weight row (quad weight times n_h per node; padded nodes zero,
    padded node masses a huge value), and a 0/1 selector matrix (L, nb)
    in bfloat16 mapping nodes to their bin.
    """
    n_gauss = table.log_prim_quad.shape[1]
    length = (seg_hi - seg_lo) * n_gauss
    padded = -(-length // 128) * 128
    logm = np.full(padded, 20.0, np.float32)
    logm[:length] = np.asarray(table.log_prim_quad[seg_lo:seg_hi],
                               np.float32).ravel()
    logm_res = np.zeros(padded, np.float32)
    if table.log_prim_quad_lo is not None:
        logm_res[:length] = np.asarray(
            table.log_prim_quad_lo[seg_lo:seg_hi], np.float32).ravel()
    sec = np.full(padded, 0.5, np.float32)
    sec[:length] = np.repeat(np.asarray(table.sec_perc[seg_lo:seg_hi],
                                        np.float32), n_gauss)
    w_row = np.zeros(padded, np.float32)
    weights = (np.asarray(table.quad_weight[seg_lo:seg_hi],
                          np.float64) *
               np.asarray(table.n_h[seg_lo:seg_hi],
                          np.float64)[:, None])
    w_row[:length] = weights.ravel()
    sel = np.zeros((padded, nb), np.float32)
    for i in range(seg_hi - seg_lo):
        sel[i * n_gauss:(i + 1) * n_gauss, seg_lo + i] = 1.0
    return (jnp.asarray(logm)[None, :], jnp.asarray(logm_res)[None, :],
            jnp.asarray(sec)[None, :], jnp.asarray(w_row)[None, :],
            jnp.asarray(sel, dtype=jnp.bfloat16))


def _fiducial_weight(table: TableData, occupation_cen, occupation_sat,
                     fiducial_params):
    """Fiducial per-bin density vector for the rigorous 'scaled'
    pass-class bound (see :func:`_row_pass_classes`): ngal at the
    model's fiducial (default) parameters, computed once on the host.
    Returns None when no fiducial is given (legacy amplitude-ratio
    bound with its large default margin)."""
    if fiducial_params is None:
        return None
    from .predict import mean_occupation
    try:
        params = {k: jnp.asarray(v, jnp.float32)
                  for k, v in fiducial_params.items()}
        mo = mean_occupation(table, occupation_cen, occupation_sat,
                             params)
        w = (np.asarray(mo, np.float64) *
             np.asarray(table.n_h, np.float64))
    except Exception:
        # A fiducial evaluation that cannot run on host (exotic model)
        # falls back to the legacy bound rather than failing the build.
        return None
    if not np.all(np.isfinite(w)) or not np.any(w > 0):
        return None
    return w


def _bundle_table_constants(table: TableData, error_model="elementwise",
                            tol=1e-6, margin=None, scale_block_rows=None,
                            pack_slabs=True, mxu_epilogue=False,
                            weight_vec=None):
    """Per-table device constants for the bundle kernel.

    * ``f2``: the dense matrices stacked for the one-matmul contraction,
      (nb_pad, n_xi * nb_pad).  When ``pack_slabs`` and the 8-aligned bin
      count fits at least twice into the 128-lane MXU output group
      (``nb_sub = ceil8(n_bins) <= 64``), several statistics' slabs share
      one 128-lane group (``pack = 128 // nb_sub`` of them), eliminating
      the lane-padding waste of small auto-mode tables: a 60-bin wp table
      would otherwise run every one of its 19 slabs at 60/128 lane
      occupancy.  Packing never mixes MXU pass classes (rows are already
      permuted class-contiguous), so each pass group keeps its own packed
      column block.
    * Flattened quadrature grids per galaxy-type segment: node masses
      ``logm`` (+ their float64 residual row for the in-kernel node
      correction) and secondary percentiles ``sec`` as (1, L) rows, a
      float32 weight row ``w`` (quad weight times n_h per node; padded
      nodes zero, padded node masses a huge value), and a 0/1 selector
      matrix (L, nb_pad) in bfloat16 mapping nodes to their bin.  The
      kernel computes ``t = occ * w`` on the VPU, splits ``t`` into an
      EXACT 3-term bfloat16 expansion (8+8+8 bits = the full float32
      significand), and contracts each term against the exact 0/1
      selector — a 3-pass MXU segment sum with zero operand-
      representation error (the previous 2-term hi/lo weight-matrix
      split only carried ~16 bits, a ~2^-17-level noise floor on ngal).

    ``error_model`` selects the contraction accuracy contract:
    ``"elementwise"`` (every output element <1e-6 relative -> all rows
    at 6-pass float32) or ``"scaled"`` (error budget relative to the
    statistic's LARGEST element, the natural contract for multi-scale
    statistics like xi_ell whose smallest entries are ~1e-7 of the
    largest; small-amplitude rows then use fewer MXU passes, chosen by
    :func:`_row_pass_classes` with a ``margin``-fold safety factor).
    Rows are permuted so equal-pass groups are contiguous;
    ``row_perm``/``row_inv_perm`` record the permutation (outputs are
    unpermuted outside the kernel).
    """
    auto = table.mode == AUTO
    nb_real = table.n_bins
    nb = -(-nb_real // 128) * 128
    n_xi = table.tpcf_dense.shape[0]
    nc = table.n_centrals

    groups, row_perm, row_inv_perm = _pass_groups(
        table.tpcf_dense, auto, error_model, tol=tol, margin=margin,
        scale_block_rows=scale_block_rows, weight_vec=weight_vec)

    pack, nb_sub, slab_w = _pack_geometry(nb_real, nb, pack_slabs and auto)
    widths = None
    if auto:
        dense_np = np.asarray(table.tpcf_dense,
                              np.float32)[np.asarray(row_perm)]
        widths = [-(-count // pack) * slab_w for _, count in groups]
        f2 = np.zeros((nb, sum(widths)), np.float32)
        col = row_ptr = 0
        for (_, count), w in zip(groups, widths):
            for idx in range(count):
                g, s = divmod(idx, pack)
                c0 = col + g * slab_w + s * nb_sub
                f2[:nb_real, c0:c0 + nb_real] = dense_np[row_ptr + idx].T
            row_ptr += count
            col += w
        f2 = jnp.asarray(f2)
    else:
        f2 = np.zeros((nb, n_xi), np.float32)
        f2[:nb_real] = np.asarray(table.tpcf_dense,
                                  np.float32)[np.asarray(row_perm)].T
        f2 = jnp.asarray(f2)

    seg_c = _quad_segment_constants(table, 0, nc, nb)
    seg_s = _quad_segment_constants(table, nc, nb_real, nb)
    flat_blocks = _split_f_blocks(f2, groups, auto, nb, widths=widths)

    # Optional MXU-epilogue reduce map (auto tables): lane
    # (group, g, s, k) of the slab product u = t * n_rep maps to
    # statistic column row_ptr + g * pack + s — a 0/1 bf16 matrix that
    # replaces the per-statistic VPU lane reduces + column stack with
    # exact-split MXU dots (see make_fused_bundle_predictor's
    # auto_epilogue).
    r_reduce = None
    if auto and mxu_epilogue:
        n_xi_pad = -(-n_xi // 128) * 128
        r_np = np.zeros((sum(widths), n_xi_pad), np.float32)
        col = row_ptr = 0
        for (_, count), w in zip(groups, widths):
            for idx in range(count):
                g, s = divmod(idx, pack)
                c0 = col + g * slab_w + s * nb_sub
                r_np[c0:c0 + nb_real, row_ptr + idx] = 1.0
            row_ptr += count
            col += w
        r_reduce = jnp.asarray(r_np, dtype=jnp.bfloat16)

    extra = (r_reduce,) if r_reduce is not None else ()
    return dict(nb=nb, n_xi=n_xi, auto=auto,
                tpcf_shape=tuple(table.tpcf_shape),
                groups=tuple(groups),
                pack=pack, nb_sub=nb_sub, slab_w=slab_w,
                row_inv_perm=row_inv_perm,
                n_f_arrays=len(flat_blocks),
                n_extra=len(extra),
                f_arrays=flat_blocks + extra,
                seg_c=seg_c, seg_s=seg_s,
                arrays=flat_blocks + extra + seg_c + seg_s)


def make_fused_bundle_predictor(tables, occupation_cen, occupation_sat,
                                param_names, batch_tile=DEFAULT_TILE,
                                interpret="auto", precision="highest",
                                accuracy=None, mesh=None, batch_axis="dp",
                                scale_block_rows=None, pack_slabs=True,
                                sub_tiles=1, fuse_occupation=True,
                                pipeline=True, tol=1e-6, margin=None,
                                auto_epilogue="vpu",
                                fiducial_params=None):
    """One-kernel multi-statistic predictor (the flagship hot path).

    Parameters
    ----------
    tables : sequence of TableData
        Tabulations (auto or cross mode) sharing the same parameter set
        (their halo binnings may differ).
    occupation_cen, occupation_sat : callables
        ``f(params dict, log_prim, sec) -> occupation`` pure functions;
        traced into the kernel with the Pallas-lowerable erf/erfc
        substituted (utils.backend.pallas_lowering).
    param_names : sequence of str
        Names (and kernel order) of the HOD parameters.
    accuracy : sequence of str, optional
        Per-table error contract, ``"elementwise"`` (default: every
        output element accurate to <1e-6 relative, all contraction rows
        at full-float32 6-pass MXU precision) or ``"scaled"`` (error
        budget relative to the statistic's largest element; rows whose
        amplitude is orders of magnitude below the peak use fewer MXU
        passes — see :func:`_bundle_table_constants`).  ``"scaled"`` is
        the natural contract for stacked multi-scale statistics (auto or
        cross mode) such as xi_0/2/4, whose smallest entries sit ~1e-7
        below the largest.
    mesh : jax.sharding.Mesh, optional
        Batch-shard ("dp") the kernel over a device mesh: the parameter
        batch splits along ``batch_axis`` and every table constant is
        replicated (they are at most a few MB), so each device runs the
        identical one-kernel bundle on its batch shard with ZERO
        communication in the hot loop — the multi-chip analog of the
        reference's per-evaluation predict (SURVEY §2.3 prediction row).
        Batches pad up to ``batch_tile * axis_size`` internally.
    batch_axis : str, optional
        Mesh axis name carrying the batch. Default ``"dp"``.
    sub_tiles : int, optional
        Process each batch tile in this many row blocks, staggering one
        block's occupation (VPU) against the previous block's dense
        contractions (MXU) so the two hardware queues overlap (see the
        kernel comment).  Must divide ``batch_tile`` (silently falls
        back to 1 otherwise).  Default 1: with the cross-tile
        ``pipeline`` (below) the queues already overlap across tiles
        and finer intra-tile staggering no longer pays (v5e autotune
        via scripts/tune_bundle.py: pipelined sub_tiles=1 1.29e7/s vs
        sub_tiles=4 1.24e7/s; UNpipelined the ordering flips and
        sub_tiles=4 is ~30% faster than 1 — set 4 if you disable the
        pipeline).
    fuse_occupation : bool, optional
        Evaluate every table's occupation quadrature in ONE VPU pass per
        galaxy type: the tables' (already 128-lane-aligned) node rows are
        concatenated, so the transcendental-heavy occupation polynomials
        and the exact 3-term bfloat16 expansion each run once over the
        combined row instead of once per table, halving (for two tables)
        the vector-unit instruction count.  The per-table segment-sum
        matmuls then read lane-aligned slices of the shared expansion.
        Bit-identical results to the unfused path (the same node values
        flow through the same arithmetic).  Default True: under the
        cross-tile pipeline the combined occupation pass lengthens the
        VPU stretch the MXU hides behind, measured +4.6% on v5e
        (1.287e7 vs 1.230e7/s; without the pipeline it was a wash —
        the autotune table in docs/performance.md has the full sweep).
    pipeline : bool, optional
        Software-pipeline the kernel ACROSS batch tiles: each tile's
        per-bin densities are parked in a ping-pong VMEM scratch and its
        dense contractions + epilogues run during the NEXT grid step,
        interleaved sub-block by sub-block with that step's occupation
        quadrature.  The per-tile exposed prologue (the first block's
        occupation with an idle MXU) and tail (the last block's
        contraction + epilogue with an idle VPU) disappear — the two
        hardware queues stay fed across tile boundaries, and the only
        non-overlapped work is one tile's occupation at kernel start and
        one tile's contraction at kernel end, amortized over the whole
        batch.  Bit-identical results to the unpipelined kernel (the
        same arithmetic in a different issue order).  Default True;
        ``False`` keeps the single-step kernel (the ablation baseline —
        measured numbers in docs/performance.md).

    tol, margin, fiducial_params : optional
        'scaled'-contract error budget controls.  ``fiducial_params``
        (the model's default parameter values) switches the per-row MXU
        pass-class assignment to the rigorous per-element truncation
        bound evaluated at the fiducial density ngal(fiducial) — see
        :func:`_row_pass_classes`; ``margin=None`` then resolves to 3
        (covering only the batch's density drift from the fiducial).
        Without a fiducial the legacy amplitude-ratio proxy applies and
        margin resolves to 30 — measured necessary: the proxy misses a
        cancellation/weight-concentration factor of up to ~60x on real
        multipole tables (v5e per-row probe, docs/performance.md).

    Returns
    -------
    callable
        ``f(params dict of (B,)) -> [(ngal (B,), xi (B, *shape)), ...]``.
    """
    if interpret == "auto":
        # Mosaic compiles on TPU only; CPU (tests) uses interpret mode.
        # Resolve from the MESH's devices when sharded: a session can hold
        # a real TPU as the default backend while dry-running multi-chip
        # sharding on virtual CPU devices (the driver's
        # xla_force_host_platform_device_count validation does exactly
        # that), and the kernel runs where the mesh lives.
        if mesh is not None:
            platform = next(iter(mesh.devices.flat)).platform
        else:
            platform = jax.default_backend()
        interpret = platform != "tpu"
    if accuracy is None:
        accuracy = ["elementwise"] * len(tables)
    if len(accuracy) != len(tables):
        raise ValueError("accuracy must give one contract per table.")
    for a in accuracy:
        if a not in ("elementwise", "scaled"):
            raise ValueError(f"Unknown accuracy contract: {a!r}")
    # scale_block_rows: one value per table (or None), forwarded to the
    # pass-class budget — stacked-node Interpolator matrices normalize
    # the 'scaled' budget within each node's row block.
    if scale_block_rows is None:
        scale_block_rows = [None] * len(tables)
    if auto_epilogue not in ("vpu", "mxu"):
        raise ValueError(f"Unknown auto_epilogue: {auto_epilogue!r}")
    configs = [_bundle_table_constants(t, error_model=a,
                                       scale_block_rows=s,
                                       pack_slabs=pack_slabs,
                                       tol=tol, margin=margin,
                                       mxu_epilogue=auto_epilogue == "mxu",
                                       weight_vec=_fiducial_weight(
                                           t, occupation_cen,
                                           occupation_sat,
                                           fiducial_params)
                                       if a == "scaled" else None)
               for t, a, s in zip(tables, accuracy, scale_block_rows)]
    fuse_occ = bool(fuse_occupation) and len(configs) > 1
    if fuse_occ:
        # Concatenated node rows per galaxy type (each table's segment is
        # already padded to a 128-lane multiple, so the per-table slices
        # below are lane-aligned); selectors stay per-table.
        def _fuse(segs):
            rows = tuple(jnp.concatenate([s[i] for s in segs], axis=1)
                         for i in range(4))         # logm, res, sec, w
            offs = np.cumsum([0] + [s[0].shape[1] for s in segs])
            return rows, tuple(int(o) for o in offs)
        fused_c, offs_c = _fuse([c["seg_c"] for c in configs])
        fused_s, offs_s = _fuse([c["seg_s"] for c in configs])
        const_arrays = [a for c in configs
                        for a in c["f_arrays"] + (c["seg_c"][4],
                                                  c["seg_s"][4])]
        const_arrays += list(fused_c) + list(fused_s)
        n_table_consts = sum(c["n_f_arrays"] + c["n_extra"] + 2
                             for c in configs)
    else:
        const_arrays = [a for c in configs for a in c["arrays"]]
    # Static base offset of each table's consts in the flat list (the
    # per-table block is f_arrays [contraction groups + optional
    # MXU-epilogue reduce map] followed by 2 selector refs when the
    # occupation is fused, else the 10 segment refs).
    cfg_offsets = []
    _at = 0
    for c in configs:
        cfg_offsets.append(_at)
        _at += c["n_f_arrays"] + c["n_extra"] + (2 if fuse_occ else 10)
    names = tuple(param_names)
    n_names = len(names)
    if n_names > 128:
        raise ValueError("At most 128 parameters supported.")

    def quad_segment_sum(occ, w_row, sel):
        # Weighted node values on the VPU, then an EXACT 3-term bfloat16
        # expansion (t == t_hi + t_mid + t_lo bit-for-bit: each residual
        # subtraction is exactly representable, and 3 x 8 significand
        # bits cover float32's 24) contracted against the exact 0/1
        # selector — a 3-pass MXU segment sum whose only rounding is the
        # float32 accumulate itself.
        t = occ * w_row
        t_hi = t.astype(jnp.bfloat16)
        r1 = t - t_hi.astype(jnp.float32)
        t_mid = r1.astype(jnp.bfloat16)
        t_lo = (r1 - t_mid.astype(jnp.float32)).astype(jnp.bfloat16)
        return (jnp.dot(t_hi, sel, preferred_element_type=jnp.float32) +
                jnp.dot(t_mid, sel, preferred_element_type=jnp.float32) +
                jnp.dot(t_lo, sel, preferred_element_type=jnp.float32))

    n_outs = 2 * len(configs)

    def kernel(params_ref, *rest):
        n_const = len(const_arrays)
        crefs = rest[:n_const]
        outs = rest[n_const:n_const + n_outs]
        scrs = rest[n_const + n_outs:]
        p = params_ref[:]

        # The VPU and MXU execute from independent hardware queues in
        # issue order, so the emission order controls their overlap.
        # The batch tile is processed in ``sub_tiles`` row blocks; each
        # block's occupation quadrature (VPU-heavy) is emitted right
        # AFTER the previous block's dense contractions (MXU-heavy), so
        # in steady state the vector and matrix units run concurrently
        # and the step time approaches max(VPU, MXU) instead of their
        # sum.  With sub_tiles=1 this degenerates to "every table's
        # occupation, then every table's dots" — which already overlaps
        # table j+1's occupation with table j's dots, unlike the naive
        # table-at-a-time order whose epilogue (VPU, dependent on the
        # dots) stalls the vector queue ahead of the next occupation.
        def occ_phase(rows):
            params = {name: p[rows, i:i + 1]
                      for i, name in enumerate(names)}
            ngals = []
            if fuse_occ:
                # One occupation quadrature + exact 3-term expansion per
                # galaxy type over the concatenated node rows of ALL
                # tables (see the fuse_occupation docstring); each
                # table's segment sum reads its lane-aligned slice.
                exp_c = _fused_expansion(occupation_cen, params,
                                         crefs[n_table_consts:
                                               n_table_consts + 4])
                exp_s = _fused_expansion(occupation_sat, params,
                                         crefs[n_table_consts + 4:
                                               n_table_consts + 8])
                for j, cfg in enumerate(configs):
                    at = cfg_offsets[j] + cfg["n_f_arrays"] + cfg["n_extra"]
                    sel_c = crefs[at][:]
                    sel_s = crefs[at + 1][:]
                    ngal = (_sliced_segment_sum(exp_c, offs_c[j],
                                                offs_c[j + 1], sel_c) +
                            _sliced_segment_sum(exp_s, offs_s[j],
                                                offs_s[j + 1], sel_s))
                    ngals.append((ngal, jnp.sum(ngal, axis=-1)))
                return ngals
            for j, cfg in enumerate(configs):
                at = cfg_offsets[j] + cfg["n_f_arrays"] + cfg["n_extra"]
                (logm_c, logmres_c, sec_c, w_c, sel_c,
                 logm_s, logmres_s, sec_s, w_s, sel_s) = (
                    r[:] for r in crefs[at:at + 10])

                # Node-residual correction (the quadrature nodes are
                # float32-rounded; occupation_with_residual restores the
                # float64 node positions — exactly for analytic models,
                # first-order JVP otherwise; see TableData docstring).
                occ_c = occupation_with_residual(
                    occupation_cen, params, logm_c, logmres_c, sec_c)
                occ_s = occupation_with_residual(
                    occupation_sat, params, logm_s, logmres_s, sec_s)
                ngal = (quad_segment_sum(occ_c, w_c, sel_c) +
                        quad_segment_sum(occ_s, w_s, sel_s))
                ngals.append((ngal, jnp.sum(ngal, axis=-1)))
            return ngals

        def _fused_expansion(occ_fn, params, refs):
            logm, res, sec, w = (r[:] for r in refs)
            occ = occupation_with_residual(occ_fn, params, logm, res, sec)
            t = occ * w
            t_hi = t.astype(jnp.bfloat16)
            r1 = t - t_hi.astype(jnp.float32)
            t_mid = r1.astype(jnp.bfloat16)
            t_lo = (r1 - t_mid.astype(jnp.float32)).astype(jnp.bfloat16)
            return t_hi, t_mid, t_lo

        def _sliced_segment_sum(exp3, o0, o1, sel):
            # The slice bounds are multiples of 128 by construction.
            return sum(jnp.dot(e[:, o0:o1], sel,
                               preferred_element_type=jnp.float32)
                       for e in exp3)

        def dots_phase(ngals):
            ts = []
            for j, cfg in enumerate(configs):
                at = cfg_offsets[j]
                f_arrays = [r[:] for r in crefs[at:at + cfg["n_f_arrays"]]]
                # One contraction per pass-count group (rows pre-permuted
                # so equal-precision groups are lane-contiguous); see
                # _split_f_blocks/_grouped_dots.
                ts.append(_grouped_dots(ngals[j][0], f_arrays,
                                        cfg["groups"], precision))
            return ts

        tb = p.shape[0]
        n_sub = sub_tiles if tb % sub_tiles == 0 else 1
        step = tb // n_sub
        blocks = [slice(k * step, (k + 1) * step) for k in range(n_sub)]

        def epilogue(rows, ngals, ts):
            for j, cfg in enumerate(configs):
                ngal, total = ngals[j]
                t = ts[j]
                outs[2 * j][rows] = total[:, None]
                if not cfg["auto"]:
                    outs[2 * j + 1][rows] = t / total[:, None]
                elif cfg["n_extra"]:
                    # MXU epilogue (auto_epilogue='mxu'): the slab
                    # product u = t * n_rep still multiplies on the VPU,
                    # but the per-statistic lane reduces + column stack
                    # run as exact-split dots against the 0/1 reduce map
                    # (same machinery as the grid kernel's spline fold).
                    r_ref = crefs[cfg_offsets[j] + cfg["n_f_arrays"]]
                    u = t * _lane_replicated(ngal, cfg["pack"],
                                             cfg["nb_sub"], cfg["slab_w"],
                                             t.shape[-1])
                    xi = _exact_gather_dot(_exact_split3(u), r_ref)
                    outs[2 * j + 1][rows] = (
                        xi[:, :cfg["n_xi"]] / (total * total)[:, None])
                else:
                    xi = _auto_quadratic_cols(t, ngal, cfg["groups"],
                                              cfg["pack"], cfg["nb_sub"],
                                              cfg["slab_w"])
                    outs[2 * j + 1][rows] = xi / (total * total)[:, None]

        if not pipeline:
            ngals_k, ts_k = [], []
            for k, rows in enumerate(blocks):
                if k > 0:
                    ts_k.append(dots_phase(ngals_k[k - 1]))
                ngals_k.append(occ_phase(rows))
            ts_k.append(dots_phase(ngals_k[-1]))

            # Epilogues (VPU) last: each waits only on its own dots,
            # which have drained by the time the vector queue reaches
            # them.
            for k, rows in enumerate(blocks):
                epilogue(rows, ngals_k[k], ts_k[k])
            return

        # Cross-tile software pipeline.  Grid step i runs tile i-1's
        # dense contractions (reading its densities from the ping-pong
        # VMEM scratch) interleaved sub-block by sub-block with tile i's
        # occupation quadrature, and tile i-1's epilogues lag one block
        # behind their contractions so the vector queue never stalls on
        # an in-flight MXU dot.  Output windows address tile i-1
        # (out index max(i-1, 0)); step 0's contraction of uninitialized
        # scratch writes garbage that step 1 fully overwrites before the
        # window flushes, and the extra step at i = n_tiles recomputes
        # the last tile's occupation into a never-read slot — both cost
        # one tile of work per KERNEL, amortized over the whole batch,
        # in exchange for removing the per-tile exposed prologue +
        # epilogue of the unpipelined issue order.
        i = pl.program_id(0)
        cur = (i % 2) * tb
        prv = tb - cur

        def read_prev(k):
            ngals = []
            for j in range(len(configs)):
                ngal = scrs[j][pl.dslice(prv + k * step, step), :]
                ngals.append((ngal, jnp.sum(ngal, axis=-1)))
            return ngals

        def write_cur(k, ngals):
            for j in range(len(configs)):
                scrs[j][pl.dslice(cur + k * step, step), :] = ngals[j][0]

        pend = None
        for k, rows in enumerate(blocks):
            ngals_prev = read_prev(k)
            ts = dots_phase(ngals_prev)
            write_cur(k, occ_phase(rows))
            if pend is not None:
                epilogue(blocks[pend[0]], pend[1], pend[2])
            pend = (k, ngals_prev, ts)
        epilogue(blocks[pend[0]], pend[1], pend[2])

    def run_kernel(pmat, *consts):
        # One pallas_call over the (local) batch; the grid follows the
        # operand shape so the same callable serves the single-device
        # path and each shard_map shard.  The pipelined kernel runs one
        # extra grid step (tile i's contractions happen at step i+1) and
        # clamps the in/out window indices at the boundaries — the
        # out-of-range steps' redundant work is documented in the kernel.
        local = pmat.shape[0]
        nt = local // batch_tile
        if pipeline:
            grid = (nt + 1,)
            in_idx = lambda i: (jnp.minimum(i, nt - 1), 0)
            out_idx = lambda i: (jnp.maximum(i - 1, 0), 0)
            scratch_shapes = [pltpu.VMEM((2 * batch_tile, c["nb"]),
                                         jnp.float32) for c in configs]
        else:
            grid = (nt,)
            in_idx = lambda i: (i, 0)
            out_idx = lambda i: (i, 0)
            scratch_shapes = []
        with backend.pallas_lowering():
            return pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[pl.BlockSpec((batch_tile, 128), in_idx,
                                       memory_space=pltpu.VMEM)] +
                         [pl.BlockSpec(
                             a.shape,
                             lambda i, r=a.ndim: (0,) * r,
                             memory_space=pltpu.VMEM)
                          for a in const_arrays],
                out_specs=tuple(
                    pl.BlockSpec((batch_tile, w), out_idx,
                                 memory_space=pltpu.VMEM)
                    for c in configs for w in (1, c["n_xi"])),
                out_shape=tuple(
                    jax.ShapeDtypeStruct((local, w), jnp.float32)
                    for c in configs for w in (1, c["n_xi"])),
                scratch_shapes=scratch_shapes,
                interpret=interpret,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(pmat, *consts)

    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        n_dp = mesh.shape[batch_axis]
        # check_vma=False: pallas_call outputs carry no varying-mesh-axes
        # annotation, which the checker would reject; the batch axis
        # mapping is fully described by the in/out specs.
        sharded_kernel = jax.shard_map(
            run_kernel, mesh=mesh,
            in_specs=(P(batch_axis),) + (P(),) * len(const_arrays),
            out_specs=tuple(P(batch_axis)
                            for c in configs for _ in (0, 1)),
            check_vma=False)
    else:
        n_dp = 1
        sharded_kernel = run_kernel

    def predict_batch(params):
        any_param = next(iter(params.values()))
        batch = any_param.shape[0]
        quantum = batch_tile * n_dp
        padded = -(-batch // quantum) * quantum
        pmat = jnp.stack(
            [jnp.pad(jnp.asarray(params[k], jnp.float32),
                     (0, padded - batch), constant_values=1.0)
             for k in names], axis=1)
        pmat = jnp.pad(pmat, ((0, 0), (0, 128 - n_names)))

        out = sharded_kernel(pmat, *const_arrays)
        results = []
        for j, c in enumerate(configs):
            total = out[2 * j][:batch, 0]
            xi = out[2 * j + 1][:batch]
            inv = c["row_inv_perm"]
            if not np.array_equal(inv, np.arange(len(inv))):
                xi = xi[:, inv]   # undo the pass-group row permutation
            results.append((total, xi.reshape(
                (batch,) + c["tpcf_shape"])))
        return results

    return jax.jit(predict_batch)


# Default batch tile for the node-streamed grid kernel: the stacked-grid
# constants stream from HBM once per batch tile, so a larger tile
# amortizes that bandwidth (per-step VMEM stays small because only one
# node block is resident at a time).  1024 is the largest tile whose
# packed-layout scratch (batch_tile x packed-pair row) plus occupation
# temporaries stay inside the 100 MB scoped-VMEM limit at the published
# 64-node 'default' grid shape; 2048 overflows it by ~4% and the
# workload is MXU-bound at 1024 anyway (the whole grid streams in ~19
# MB/tile, ~20x below the bandwidth roofline).
GRID_TILE = 1024


def _grid_stream_constants(table: TableData, n_nodes,
                           error_model="elementwise", tol=1e-6,
                           margin=None, pack_slabs=True,
                           weight_vec=None):
    """Streamed per-node constants for the grid kernel.

    ``table`` is a stacked Interpolator grid (n_nodes * n_xi statistic
    rows over ONE shared halo binning).  Every node gets the SAME slab
    layout so the Pallas grid can stream uniform column blocks: the MXU
    pass class of each statistic row position is the MAXIMUM over nodes
    (under the 'scaled' contract each node's amplitudes are normalized
    to that node's own peak, the stacked-grid analog of
    ``scale_block_rows=n_xi``), and the common row permutation makes
    pass groups contiguous within each node's block.

    Returns a dict with, per pass group, one stacked array of shape
    (nb, n_nodes * w_g) — bf16 hi/lo pairs for the 3-pass tier — where
    node j occupies columns [j*w_g, (j+1)*w_g); plus the shared
    quadrature segment constants and the slab geometry.
    """
    auto = table.mode == AUTO
    nb_real = table.n_bins
    nb = -(-nb_real // 128) * 128
    total_rows = table.tpcf_dense.shape[0]
    if total_rows % n_nodes:
        raise ValueError("Stacked row count must be divisible by n_nodes.")
    n_xi = total_rows // n_nodes
    dense = np.asarray(table.tpcf_dense, np.float32)
    dense = dense.reshape((n_nodes, n_xi) + dense.shape[1:])

    if error_model == "scaled":
        if margin is None:
            margin = 3.0 if weight_vec is not None else 30.0
        passes = np.zeros(n_xi, np.int64)
        for j in range(n_nodes):
            passes = np.maximum(
                passes, _row_pass_classes(dense[j], tol / margin,
                                          weight_vec=weight_vec))
    elif error_model == "elementwise":
        passes = np.full(n_xi, 6, np.int64)
    else:
        raise ValueError(f"Unknown accuracy contract: {error_model!r}")
    row_perm = np.argsort(-passes, kind="stable")
    row_inv_perm = np.argsort(row_perm)
    groups = tuple((p, int(np.sum(passes == p))) for p in (6, 3, 1)
                   if np.any(passes == p))

    pack, nb_sub, slab_w = _pack_geometry(nb_real, nb, pack_slabs and auto)
    if auto:
        widths = [-(-count // pack) * slab_w for _, count in groups]
    else:
        # Cross mode: each node's group block padded to a lane multiple
        # so the streamed column blocks stay 128-aligned.
        widths = [-(-count // 128) * 128 for _, count in groups]

    group_blocks = []
    row0 = 0
    for (_, count), w in zip(groups, widths):
        big = np.zeros((nb, n_nodes * w), np.float32)
        for j in range(n_nodes):
            perm_rows = dense[j][row_perm[row0:row0 + count]]
            for idx in range(count):
                if auto:
                    g, s = divmod(idx, pack)
                    c0 = j * w + g * slab_w + s * nb_sub
                    big[:nb_real, c0:c0 + nb_real] = perm_rows[idx].T
                else:
                    big[:nb_real, j * w + idx] = perm_rows[idx]
        group_blocks.append(big)
        row0 += count

    # Same bf16 tiering as _split_f_blocks, applied to the stacked
    # arrays (the split is elementwise, so splitting the stack equals
    # stacking the per-node splits).
    stream_arrays, block_widths = [], []
    for (p, _), big, w in zip(groups, group_blocks, widths):
        if p == 6:
            stream_arrays.append(jnp.asarray(big))
            block_widths.append(w)
        elif p == 3:
            hi = big.astype(jnp.bfloat16)
            lo = (big - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
            stream_arrays += [jnp.asarray(hi), jnp.asarray(lo)]
            block_widths += [w, w]
        else:
            stream_arrays.append(jnp.asarray(big.astype(jnp.bfloat16)))
            block_widths.append(w)

    nc = table.n_centrals
    seg_c = _quad_segment_constants(table, 0, nc, nb)
    seg_s = _quad_segment_constants(table, nc, nb_real, nb)
    return dict(nb=nb, n_xi=n_xi, auto=auto, groups=groups,
                widths=tuple(widths), pack=pack, nb_sub=nb_sub,
                slab_w=slab_w, row_inv_perm=row_inv_perm,
                stream_arrays=tuple(stream_arrays),
                block_widths=tuple(block_widths),
                seg_c=seg_c, seg_s=seg_s)


def make_fused_grid_predictor(table: TableData, n_nodes, occupation_cen,
                              occupation_sat, param_names,
                              batch_tile="auto", interpret="auto",
                              precision="highest", accuracy="elementwise",
                              mesh=None, batch_axis="dp", sub_tiles="auto",
                              pack_slabs=True, layout="auto",
                              node_block=None, fold_spline=False,
                              pipeline="auto", tol=1e-6, margin=None,
                              fiducial_params=None):
    """Node-streamed bundle predictor for stacked Interpolator grids.

    The one-kernel bundle keeps every dense matrix resident in VMEM,
    which caps it at grids whose stacked constants fit the chip's
    ~128 MB — the published 'default' 4x4x4 = 64-node wp/xi tables
    exceed it (reference grids: tabcorr/database.py:56-59).  This
    kernel instead STREAMS the grid: the Pallas grid is (batch_tiles,
    node_blocks) with the node axis innermost, each node block's matrix
    is DMAed HBM->VMEM by Pallas's pipeline (double-buffered against
    the previous block's contraction), and the occupation quadrature
    runs ONCE per batch tile (at node step 0, same in-kernel exact
    3-term-expansion path as the bundle) with the contraction operand
    parked in VMEM scratch for the remaining node steps.  Per-step VMEM
    is one node block x 2 buffers + the scratch, independent of the
    grid size, so any node count streams.

    Two layouts:

    * ``'packed'`` (default where eligible): auto-mode tables contract
      in PACKED symmetric storage — the kernel expands the per-pair
      weights ``w_p = n_i n_j`` (i <= j) once per batch tile into
      scratch and every node step is one MXU dot ``w @ F_packed`` with
      the (2 - delta_ij) prefactor folded into the streamed matrix
      host-side.  Packed K = (nb^2 + nb)/2 does ~2.3x fewer MACs than
      the lane-padded slab layout, streams ~2x fewer bytes, and needs
      no per-node VPU epilogue (the division by the squared density is
      a row scale).  Cross-mode tables use the same kernel with
      ``w := ngal`` (K = nb).  Eligible while the packed pair count
      stays small enough for the scratch row (<= 8192 lanes, i.e.
      nb <= ~126; every published auto table has nb <= 60).
    * ``'slab'``: the bundle's lane-aligned slab layout, streamed one
      node per step — the fallback for auto tables with very wide
      binnings.

    The HBM cost is the whole grid once per batch tile, so the default
    ``batch_tile`` is larger than the bundle's (see GRID_TILE).

    Parameters match :func:`make_fused_bundle_predictor` where shared;
    ``accuracy`` is a single contract ('elementwise' or 'scaled' — the
    scaled budget is normalized per node, as scale_block_rows=n_xi does
    for the resident bundle).  ``sub_tiles`` has a per-layout meaning:
    for the slab layout it bounds the contraction intermediate; for the
    grid-RESIDENT packed layout it is the intra-tile VPU/MXU stagger —
    the tile is processed in that many row blocks with block k's
    occupation issued after block k-1's class dots (bit-identical on
    TPU; 'auto' resolves to 1 — measured a wash at the production
    shape, see the resolution comment).  ``node_block`` (packed layout) sets how
    many nodes stream per step (default: sized so each step's block is
    a few MB and class padding is amortized).  ``pipeline`` enables the
    cross-tile software pipeline when the whole grid is VMEM-resident
    (``node_block == n_nodes``): tile i's occupation quadrature fills
    one ping-pong scratch half while tile i-1's contraction + fold read
    the other (the bundle kernel's scheme); results are bit-identical
    either way, but 'auto' currently resolves to False — every
    pipelined-grid configuration fails the current Mosaic toolchain's
    compile helper (see the resolution comment in
    :func:`_make_grid_packed_predictor`).

    ``margin`` divides the 'scaled' contract's per-row error budget
    before pass classes are assigned (a row drops to p MXU passes when
    c_p * m_row <= tol / margin).  With ``fiducial_params`` (the
    model's default parameter values) the row measure m is the RIGOROUS
    per-element truncation bound evaluated at the fiducial density —
    see :func:`_row_pass_classes` — and ``margin=None`` resolves to 3,
    covering only the batch's density drift from the fiducial; without
    a fiducial the legacy amplitude-ratio proxy applies and margin
    resolves to 30 (its unmodeled cancellation/concentration factor
    was measured at up to ~60x on real multipole tables).  v5e sweep
    at the published 64-node 'default' shape: 2.68e6 -> 3.4e6
    predictions/s from the class tightening at realized scaled error
    6.5e-7 (16-probe max vs the float64 host path;
    scripts/tune_grid.py, docs/performance.md).

    Returns ``f(params dict of (B,)) -> (ngal (B,), xi (B, n_nodes,
    n_xi))`` with the node axis leading the statistic axis (grid order).
    With ``fold_spline=True`` (packed layout only) the returned callable
    instead takes ``f(params, node_weights (B, n_nodes))`` and returns
    ``(ngal (B,), xi (B, n_xi))`` — the per-node outputs are reduced
    in-kernel by the spline's node weights (see
    :func:`~tabcorr_tpu.predictor._grid_node_weights`), so no
    (B, n_nodes, n_xi) intermediate ever reaches HBM.
    """
    if interpret == "auto":
        if mesh is not None:
            platform = next(iter(mesh.devices.flat)).platform
        else:
            platform = jax.default_backend()
        interpret = platform != "tpu"
    if layout == "auto":
        layout = grid_layout_for(table)
    if layout == "packed":
        return _make_grid_packed_predictor(
            table, n_nodes, occupation_cen, occupation_sat, param_names,
            batch_tile=batch_tile, interpret=interpret,
            precision=precision, accuracy=accuracy, mesh=mesh,
            batch_axis=batch_axis, node_block=node_block,
            fold_spline=fold_spline, pipeline=pipeline,
            tol=tol, margin=margin, fiducial_params=fiducial_params,
            sub_tiles=sub_tiles)
    if layout != "slab":
        raise ValueError(f"Unknown layout: {layout!r}")
    if sub_tiles == "auto":
        sub_tiles = 8      # slab meaning: contraction-intermediate bound
    if pipeline is True:
        raise ValueError("pipeline requires the 'packed' layout "
                         "(check grid_layout_for(table) first).")
    if batch_tile == "auto":
        batch_tile = GRID_TILE
    if fold_spline:
        raise ValueError("fold_spline requires the 'packed' layout "
                         "(check grid_layout_for(table) first).")
    cfg = _grid_stream_constants(table, n_nodes, error_model=accuracy,
                                 pack_slabs=pack_slabs, margin=margin,
                                 weight_vec=_fiducial_weight(
                                     table, occupation_cen,
                                     occupation_sat, fiducial_params))
    nb = cfg["nb"]
    n_xi = cfg["n_xi"]
    auto = cfg["auto"]
    groups = cfg["groups"]
    widths = cfg["widths"]
    stream_arrays = cfg["stream_arrays"]
    block_widths = cfg["block_widths"]
    seg_arrays = cfg["seg_c"] + cfg["seg_s"]
    xi_pad = -(-n_xi // 128) * 128
    names = tuple(param_names)
    n_names = len(names)
    if n_names > 128:
        raise ValueError("At most 128 parameters supported.")
    n_stream = len(stream_arrays)

    def quad_segment_sum(occ, w_row, sel):
        # Same exact 3-term bfloat16 expansion as the resident bundle
        # (see make_fused_bundle_predictor.quad_segment_sum).
        t = occ * w_row
        t_hi = t.astype(jnp.bfloat16)
        r1 = t - t_hi.astype(jnp.float32)
        t_mid = r1.astype(jnp.bfloat16)
        t_lo = (r1 - t_mid.astype(jnp.float32)).astype(jnp.bfloat16)
        return (jnp.dot(t_hi, sel, preferred_element_type=jnp.float32) +
                jnp.dot(t_mid, sel, preferred_element_type=jnp.float32) +
                jnp.dot(t_lo, sel, preferred_element_type=jnp.float32))

    def kernel(params_ref, *rest):
        stream_refs = rest[:n_stream]
        (logm_c, logmres_c, sec_c, w_c, sel_c,
         logm_s, logmres_s, sec_s, w_s, sel_s) = rest[n_stream:
                                                      n_stream + 10]
        total_out, xi_out = rest[n_stream + 10:n_stream + 12]
        ngal_scratch = rest[n_stream + 12]
        j = pl.program_id(1)

        # Occupation quadrature once per batch tile: node step 0
        # computes ngal (in-kernel, with the float64-node residual
        # correction) and parks it in VMEM scratch; the remaining node
        # steps are pure streamed contractions against it.
        @pl.when(j == 0)
        def _():
            p = params_ref[:]
            params = {name: p[:, i:i + 1]
                      for i, name in enumerate(names)}
            occ_c = occupation_with_residual(
                occupation_cen, params, logm_c[:], logmres_c[:], sec_c[:])
            occ_s = occupation_with_residual(
                occupation_sat, params, logm_s[:], logmres_s[:], sec_s[:])
            ngal = (quad_segment_sum(occ_c, w_c[:], sel_c[:]) +
                    quad_segment_sum(occ_s, w_s[:], sel_s[:]))
            ngal_scratch[:] = ngal
            total_out[:] = jnp.sum(ngal, axis=-1)[:, None]

        ngal_full = ngal_scratch[:]
        total = jnp.sum(ngal_full, axis=-1)
        f_arrays = [r[:] for r in stream_refs]

        tb = ngal_full.shape[0]
        n_sub = sub_tiles if tb % sub_tiles == 0 else 1
        step = tb // n_sub
        for k in range(n_sub):
            rows = slice(k * step, (k + 1) * step)
            ngal = ngal_full[rows]
            t = _grouped_dots(ngal, f_arrays, groups, precision)
            if auto:
                xi = _auto_quadratic_cols(t, ngal, groups, cfg["pack"],
                                          cfg["nb_sub"], cfg["slab_w"])
                xi = xi / (total[rows] * total[rows])[:, None]
            else:
                cols, off = [], 0
                for (_, count), w in zip(groups, widths):
                    cols.append(t[:, off:off + count])
                    off += w
                xi = (cols[0] if len(cols) == 1
                      else jnp.concatenate(cols, axis=-1))
                xi = xi / total[rows][:, None]
            xi_out[rows, :n_xi] = xi
            if xi_pad > n_xi:
                xi_out[rows, n_xi:] = jnp.zeros(
                    (step, xi_pad - n_xi), jnp.float32)

    def run_kernel(pmat, *consts):
        local = pmat.shape[0]
        stream_consts = consts[:n_stream]
        fixed_consts = consts[n_stream:]
        with backend.pallas_lowering():
            return pl.pallas_call(
                kernel,
                grid=(local // batch_tile, n_nodes),
                in_specs=[pl.BlockSpec((batch_tile, 128),
                                       lambda i, j: (i, 0),
                                       memory_space=pltpu.VMEM)] +
                         [pl.BlockSpec((nb, w), lambda i, j: (0, j),
                                       memory_space=pltpu.VMEM)
                          for w in block_widths] +
                         [pl.BlockSpec(a.shape,
                                       lambda i, j, r=a.ndim: (0,) * r,
                                       memory_space=pltpu.VMEM)
                          for a in seg_arrays],
                out_specs=(
                    pl.BlockSpec((batch_tile, 1), lambda i, j: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((batch_tile, xi_pad), lambda i, j: (i, j),
                                 memory_space=pltpu.VMEM)),
                out_shape=(
                    jax.ShapeDtypeStruct((local, 1), jnp.float32),
                    jax.ShapeDtypeStruct((local, n_nodes * xi_pad),
                                         jnp.float32)),
                scratch_shapes=[pltpu.VMEM((batch_tile, nb), jnp.float32)],
                interpret=interpret,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(pmat, *stream_consts, *fixed_consts)

    const_arrays = stream_arrays + seg_arrays
    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        n_dp = mesh.shape[batch_axis]
        sharded_kernel = jax.shard_map(
            run_kernel, mesh=mesh,
            in_specs=(P(batch_axis),) + (P(),) * len(const_arrays),
            out_specs=(P(batch_axis), P(batch_axis)),
            check_vma=False)
    else:
        n_dp = 1
        sharded_kernel = run_kernel

    inv = np.asarray(cfg["row_inv_perm"])
    unpermute = not np.array_equal(inv, np.arange(n_xi))

    def predict_batch(params):
        any_param = next(iter(params.values()))
        batch = any_param.shape[0]
        quantum = batch_tile * n_dp
        padded = -(-batch // quantum) * quantum
        pmat = jnp.stack(
            [jnp.pad(jnp.asarray(params[k], jnp.float32),
                     (0, padded - batch), constant_values=1.0)
             for k in names], axis=1)
        pmat = jnp.pad(pmat, ((0, 0), (0, 128 - n_names)))

        total, xi = sharded_kernel(pmat, *const_arrays)
        xi = xi[:batch].reshape(batch, n_nodes, xi_pad)[:, :, :n_xi]
        if unpermute:
            xi = xi[:, :, inv]
        return total[:batch, 0], xi

    return jax.jit(predict_batch)


def _grid_common_passes(dense_nodes, error_model, tol=1e-6, margin=None,
                        weight_vec=None):
    """Common MXU pass classes across grid nodes (max per row position;
    'scaled' budgets normalized to each node's own peak).  Returns
    (groups, row_perm, row_inv_perm) with the shared permutation making
    pass groups contiguous within every node's block.  ``margin=None``
    resolves as in :func:`_pass_groups` (3 with a fiducial
    ``weight_vec``, 30 without)."""
    if margin is None:
        margin = 3.0 if weight_vec is not None else 30.0
    n_xi = dense_nodes.shape[1]
    if error_model == "scaled":
        passes = np.zeros(n_xi, np.int64)
        for j in range(dense_nodes.shape[0]):
            passes = np.maximum(
                passes, _row_pass_classes(dense_nodes[j], tol / margin,
                                          weight_vec=weight_vec))
    elif error_model == "elementwise":
        passes = np.full(n_xi, 6, np.int64)
    else:
        raise ValueError(f"Unknown accuracy contract: {error_model!r}")
    row_perm = np.argsort(-passes, kind="stable")
    groups = tuple((p, int(np.sum(passes == p))) for p in (6, 3, 1)
                   if np.any(passes == p))
    return groups, row_perm, np.argsort(row_perm)


def grid_layout_for(table: TableData):
    """Streamed-grid layout the 'auto' mode would pick for ``table``:
    'packed' symmetric contraction where the packed pair count fits the
    scratch row (every published table), else the 'slab' fallback."""
    nbr = table.n_bins
    npair_pad = -(-(nbr * (nbr + 1) // 2) // 128) * 128
    return "packed" if table.mode != AUTO or npair_pad <= 8192 else "slab"


def _accumulate_block(ref, val, j):
    """Initialize a revisited output block at grid step 0, else add."""
    @pl.when(j == 0)
    def _():
        ref[:] = val

    @pl.when(j != 0)
    def _():
        ref[:] = ref[:] + val


def _make_grid_packed_predictor(table: TableData, n_nodes, occupation_cen,
                                occupation_sat, param_names,
                                batch_tile=GRID_TILE, interpret=False,
                                precision="highest",
                                accuracy="elementwise", mesh=None,
                                batch_axis="dp", node_block=None,
                                tol=1e-6, margin=None, fold_spline=False,
                                pipeline="auto", fiducial_params=None,
                                sub_tiles="auto"):
    """Packed-layout streamed grid kernel (see make_fused_grid_predictor).

    Auto mode contracts in packed symmetric storage: host-side the
    (2 - delta_ij)-weighted upper triangle of each node's dense matrix
    becomes one K = (nb^2+nb)/2 column per statistic row; in-kernel the
    matching pair weights w_p = n_i n_j (i <= j, np.triu_indices order)
    are expanded into VMEM scratch once per batch tile.  Cross mode
    uses w := ngal directly (K = nb).  Each node step is then one MXU
    dot per pass class, a row scale, and a store.

    ``fold_spline=True`` folds the Interpolator's grid-spline reduction
    into the kernel: the returned function takes an extra
    ``node_weights`` argument of shape (B, n_nodes) (the multi-axis
    spline is LINEAR in the node ordinates, so its action is a
    per-sample weight vector — predictor._grid_node_weights) and the
    kernel accumulates ``sum_n w[b, n] xi_n[b, :]`` across node steps
    into a (B, n_xi) output.  This removes the (B, n_nodes, n_xi)
    per-node HBM intermediate (~n_nodes x more output bytes than the
    answer) that the unfolded path writes for the XLA-side spline — at
    the 64-node production shape that intermediate dominates end-to-end
    time (kernel 1.49e6/s vs 1.05e6/s through the XLA spline).
    In-kernel the weighting is two small MXU dots per class per node
    step against fixed 0/1 maps: ``wexp = nw @ E`` broadcasts each
    node's weight across its column block and ``(t * wexp) @ R``
    reduces node blocks onto statistic columns (both 128-lane aligned;
    a direct strided reduce would need misaligned lane slices).
    NaN weights (extrapolate=False outside the grid) propagate through
    both dots, preserving the unfolded path's NaN-outside-grid
    semantics.
    """
    auto = table.mode == AUTO
    nbr = table.n_bins
    nb_pad = -(-nbr // 128) * 128
    total_rows = table.tpcf_dense.shape[0]
    if total_rows % n_nodes:
        raise ValueError("Stacked row count must be divisible by n_nodes.")
    n_xi = total_rows // n_nodes
    dense = np.asarray(table.tpcf_dense, np.float32)
    dense = dense.reshape((n_nodes, n_xi) + dense.shape[1:])
    groups, row_perm, row_inv_perm = _grid_common_passes(
        dense, accuracy, tol=tol, margin=margin,
        weight_vec=_fiducial_weight(table, occupation_cen,
                                    occupation_sat, fiducial_params))

    if auto:
        idx_i, idx_j = np.triu_indices(nbr)
        npair = idx_i.shape[0]
        k_pad = -(-npair // 128) * 128
        prefac = np.where(idx_i == idx_j, 1.0, 2.0).astype(np.float32)
        packed = dense[:, :, idx_i, idx_j] * prefac     # (nodes, n_xi, np)
    else:
        npair = nbr
        k_pad = nb_pad
        packed = dense                                  # (nodes, n_xi, nb)

    # Node block: bigger blocks mean bigger MXU dots (measured on v5e at
    # the 64-node 'default' shape: 8.6e5/s at 8 nodes, 1.43e6 at 32,
    # 1.49e6 fully resident), so prefer the whole grid resident when its
    # packed constants fit a generous VMEM share, else the largest
    # divisor of n_nodes whose double-buffered step blocks do.
    if node_block is None:
        per_node = sum(k_pad * count * (4 if p == 6 else 4 if p == 3 else 2)
                       for p, count in groups)
        if n_nodes * per_node <= 26 * 2 ** 20:
            node_block = n_nodes
        else:
            target = max(1, (13 * 2 ** 20) // max(per_node, 1))
            node_block = max(d for d in range(1, n_nodes + 1)
                             if n_nodes % d == 0 and d <= target)
    if n_nodes % node_block:
        raise ValueError("node_block must divide n_nodes.")
    n_blocks = n_nodes // node_block
    if batch_tile == "auto":
        # Grid-resident kernels take the larger tile (v5e autotune at the
        # 64-node 'default' shape: 2048 is +4% over 1024 and the largest
        # that compiles); the node-STREAMED variant keeps GRID_TILE —
        # at 2048 its per-step liveness pushes Mosaic's register
        # allocator ~25 MB past the VMEM ceiling (measured spill-slot
        # failure), and the workload is MXU-bound at 1024 anyway.
        batch_tile = 2048 if n_blocks == 1 else GRID_TILE
    # Cross-tile software pipeline (the bundle kernel's ping-pong-scratch
    # scheme, make_fused_bundle_predictor): tile i's occupation + pair
    # weights compute into one scratch half while tile i-1's contraction
    # + fold read the other, so the per-tile occupation VPU stretch hides
    # under the previous tile's MXU dots.  Grid-RESIDENT kernels only:
    # with node streaming the contraction spans n_blocks grid steps and
    # the scratch halves would alias across the node axis.
    if pipeline == "auto":
        # Default OFF: every pipelined-grid configuration (tiles 256-2048,
        # fold and unfold, 1-D and 2-D grid forms) fails the current
        # remote Mosaic toolchain's compile helper (opaque HTTP 500 /
        # subprocess exit 1 — the unpipelined kernel with identical
        # arithmetic compiles and runs at every swept point, so this is a
        # toolchain limit, not a VMEM budget).  The knob stays for future
        # toolchains; the interpret-mode tests keep the pipelined
        # schedule's bit-identity covered.
        pipeline = False
    elif pipeline and n_blocks != 1:
        raise ValueError("pipeline requires the whole grid resident "
                         "(node_block == n_nodes).")
    # Grid-resident kernels run a 1-D Pallas grid (the node axis is
    # degenerate); see run_kernel.
    one_d = n_blocks == 1
    # Intra-tile VPU/MXU staggering for the grid-RESIDENT unpipelined
    # schedule (the bundle kernel's pre-pipeline trick): the batch tile
    # is processed in row blocks, block k's occupation quadrature (VPU)
    # emitted right after block k-1's class dots (MXU), so the two
    # hardware queues overlap within the tile.  On TPU this is
    # bit-identical — the MXU's per-row accumulation order does not
    # depend on the operand's row count — but in interpret mode the CPU
    # GEMM's shape-dependent blocking shifts last-ulp results.
    # MEASURED NEGATIVE on v5e at the 64-node production shape: sub
    # 1/2/4/8/16 all land in the same 2.90-3.11e6/s jitter band with no
    # consistent ordering across sessions — the occupation VPU stretch
    # is only ~9% of the tile (vs ~33% in the bundle kernel, where this
    # same trick was worth +30%), and the row-blocked dots lose about
    # what the overlap gains.  'auto' therefore resolves to 1; the knob
    # stays for other shapes (a quiet-table grid with a heavier
    # occupation would tip the balance).
    if sub_tiles == "auto":
        sub_tiles = 1
    n_sub = sub_tiles if (one_d and not pipeline
                          and batch_tile % sub_tiles == 0) else 1
    sub_step = batch_tile // n_sub

    # Per class: one stacked array (k_pad, n_blocks * w_gb); within a
    # block the columns are node-major (node jj's rows of that class at
    # jj*count..(jj+1)*count) in the common row permutation.
    stream_arrays, class_widths = [], []
    row0 = 0
    for p, count in groups:
        w_gb = -(-(count * node_block) // 128) * 128
        big = np.zeros((k_pad, n_blocks * w_gb), np.float32)
        rows = row_perm[row0:row0 + count]
        for b in range(n_blocks):
            for jj in range(node_block):
                node = b * node_block + jj
                c0 = b * w_gb + jj * count
                big[:npair, c0:c0 + count] = packed[node, rows].T
        if p == 6:
            stream_arrays.append(jnp.asarray(big))
        elif p == 3:
            hi = big.astype(jnp.bfloat16)
            lo = (big - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
            stream_arrays += [jnp.asarray(hi), jnp.asarray(lo)]
        else:
            stream_arrays.append(jnp.asarray(big.astype(jnp.bfloat16)))
        class_widths.append(w_gb)
        row0 += count

    nc = table.n_centrals
    seg_c = _quad_segment_constants(table, 0, nc, nb_pad)
    seg_s = _quad_segment_constants(table, nc, nbr, nb_pad)
    seg_arrays = seg_c + seg_s
    names = tuple(param_names)
    n_names = len(names)
    if n_names > 128:
        raise ValueError("At most 128 parameters supported.")
    n_stream = len(stream_arrays)

    # Spline-fold constants: per class, E broadcasts the node-weight
    # lanes over that node's column block and R reduces node blocks onto
    # statistic columns (fixed 0/1 maps, resident in VMEM).
    nw_pad = -(-node_block // 128) * 128
    fold_arrays = []
    count_pads = []
    if fold_spline:
        for (p, count), w_gb in zip(groups, class_widths):
            count_pad = -(-count // 128) * 128
            count_pads.append(count_pad)
            e_map = np.zeros((nw_pad, w_gb), np.float32)
            r_map = np.zeros((w_gb, count_pad), np.float32)
            for jj in range(node_block):
                e_map[jj, jj * count:(jj + 1) * count] = 1.0
                r_map[jj * count:(jj + 1) * count, :count] = np.eye(
                    count, dtype=np.float32)
            # bfloat16 holds 0/1 exactly; the kernel dots each exact
            # bf16 split term against these maps in one MXU pass.
            fold_arrays += [jnp.asarray(e_map, dtype=jnp.bfloat16),
                            jnp.asarray(r_map, dtype=jnp.bfloat16)]
    # Block width per streamed array (3-pass classes carry two arrays).
    block_widths = []
    for (p, _), w in zip(groups, class_widths):
        block_widths += [w, w] if p == 3 else [w]
    need_split = any(p in (3, 1) for p, _ in groups)
    # Pair-weight gather selectors (auto mode): lane p of the packed
    # weight row is w_p = ngal[idx_i[p]] * ngal[idx_j[p]].  The kernel
    # builds both factors with ONE exact gather-dot each — a 3-term
    # bfloat16 split of ngal against a one-hot (nb_pad, k_pad) selector
    # reconstructs every f32 value bit-exactly (3 x 8 mantissa bits
    # cover f32's 24, and the partial sums are exactly representable) —
    # instead of ~nb misaligned masked VPU stores into scratch, which
    # measured ~2x slower than the whole MXU contraction at the 64-node
    # production shape.  Padded lanes gather 0 (all-zero selector
    # columns), preserving the zero-filled-scratch semantics.
    if auto:
        idx_i_full, idx_j_full = np.triu_indices(nbr)
        sel_i = np.zeros((nb_pad, k_pad), np.float32)
        sel_j = np.zeros((nb_pad, k_pad), np.float32)
        sel_i[idx_i_full, np.arange(npair)] = 1.0
        sel_j[idx_j_full, np.arange(npair)] = 1.0
        sel_i = jnp.asarray(sel_i, dtype=jnp.bfloat16)
        sel_j = jnp.asarray(sel_j, dtype=jnp.bfloat16)
        pair_sel_arrays = (sel_i, sel_j)
    else:
        pair_sel_arrays = ()

    exact_split3 = _exact_split3
    exact_gather_dot = _exact_gather_dot

    def quad_segment_sum(occ, w_row, sel):
        return _exact_gather_dot(_exact_split3(occ * w_row), sel)

    tb = batch_tile

    def kernel(params_ref, *rest):
        if fold_spline:
            nw_ref = rest[0]
            rest = rest[1:]
        stream_refs = rest[:n_stream]
        at = n_stream
        fold_refs = rest[at:at + len(fold_arrays)]
        at += len(fold_arrays)
        pair_sel_refs = rest[at:at + len(pair_sel_arrays)]
        at += len(pair_sel_arrays)
        (logm_c, logmres_c, sec_c, w_c, sel_c,
         logm_s, logmres_s, sec_s, w_s, sel_s) = rest[at:at + 10]
        total_out = rest[at + 10]
        class_outs = rest[at + 11:at + 11 + len(groups)]
        w_scr = rest[at + 11 + len(groups)]
        tot_scr = rest[at + 12 + len(groups)]
        # Grid-resident kernels (n_blocks == 1) run a 1-D grid: the node
        # axis is degenerate and folding it away keeps the output index
        # maps monotone in the only real grid dimension.
        j = 0 if one_d else pl.program_id(1)

        def occ_phase(off, r0=0, rlen=None):
            """Occupation quadrature + contraction operand for rows
            [r0, r0+rlen) of the tile in params_ref, parked in the
            scratch rows at ``off + r0``."""
            rlen = tb if rlen is None else rlen
            p = params_ref[:][r0:r0 + rlen]
            params = {name: p[:, i:i + 1]
                      for i, name in enumerate(names)}
            occ_c = occupation_with_residual(
                occupation_cen, params, logm_c[:], logmres_c[:], sec_c[:])
            occ_s = occupation_with_residual(
                occupation_sat, params, logm_s[:], logmres_s[:], sec_s[:])
            ngal = (quad_segment_sum(occ_c, w_c[:], sel_c[:]) +
                    quad_segment_sum(occ_s, w_s[:], sel_s[:]))
            total = jnp.sum(ngal, axis=-1)
            tot_scr[pl.dslice(off + r0, rlen), 0:1] = total[:, None]
            if auto:
                # Packed pair weights w_p = n_i n_j, (i, j >= i) in
                # np.triu_indices order; the (2 - delta) prefactor lives
                # in the streamed matrix.  Both factors come from exact
                # gather-dots (bit-identical to lane slicing, ~40x
                # faster than the masked-store expansion it replaced).
                parts = exact_split3(ngal)
                gi = exact_gather_dot(parts, pair_sel_refs[0])
                gj = exact_gather_dot(parts, pair_sel_refs[1])
                w_scr[pl.dslice(off + r0, rlen), :] = gi * gj
            else:
                w_scr[pl.dslice(off + r0, rlen), :] = ngal

        def class_dots(w):
            """One contraction per pass class against the streamed (or
            resident) node-block constants."""
            if need_split:
                w_hi = w.astype(jnp.bfloat16)
                w_lo = (w - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            ts = []
            at = 0
            for p, count in groups:
                if p == 6:
                    t = jnp.dot(w, stream_refs[at][:],
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
                    at += 1
                elif p == 3:
                    hi = stream_refs[at][:]
                    lo = stream_refs[at + 1][:]
                    at += 2
                    t = (jnp.dot(w_hi, hi,
                                 preferred_element_type=jnp.float32) +
                         jnp.dot(w_hi, lo,
                                 preferred_element_type=jnp.float32) +
                         jnp.dot(w_lo, hi,
                                 preferred_element_type=jnp.float32))
                else:
                    t = jnp.dot(w_hi, stream_refs[at][:],
                                preferred_element_type=jnp.float32)
                    at += 1
                ts.append(t)
            return ts

        def epilogue(ts, denom, nw_vals, rows=slice(None)):
            for ci, t in enumerate(ts):
                if not fold_spline:
                    class_outs[ci][rows] = t / denom
                    continue
                if one_d:
                    # Degenerate node axis: the fold is complete in one
                    # step, no cross-step accumulation.
                    wexp = exact_gather_dot(exact_split3(nw_vals),
                                            fold_refs[2 * ci])
                    class_outs[ci][rows] = exact_gather_dot(
                        exact_split3((t / denom) * wexp),
                        fold_refs[2 * ci + 1])
                    continue
                # Weighted node reduce: this step's node weights
                # broadcast over column blocks (nw @ E), scale the
                # per-node results, and fold onto statistic columns
                # ((.) @ R), accumulating in the revisited (i, 0) output
                # block across node steps.  Exact 3-term splits of the
                # f32 operand against the bf16-exact 0/1 maps:
                # bit-identical to the HIGHEST 6-pass form (the three
                # cross products against the map's zero mid/lo splits
                # are exact zeros) at half the MXU passes.  Default
                # single-pass bf16 would truncate the weights (measured
                # 1.7e-3 scaled error), so the split is required.
                wexp = exact_gather_dot(exact_split3(nw_vals),
                                        fold_refs[2 * ci])
                val = exact_gather_dot(exact_split3((t / denom) * wexp),
                                       fold_refs[2 * ci + 1])
                _accumulate_block(class_outs[ci], val, j)

        if not pipeline:
            if one_d:
                # Staggered schedule (n_sub row blocks): block k's
                # occupation (VPU) issues right after block k-1's class
                # dots (MXU), its epilogue after that — the bundle
                # kernel's proven unpipelined interleaving.  n_sub == 1
                # degenerates to occupation -> dots -> epilogue.
                nw_all = nw_ref[:] if fold_spline else None

                def block_args(k):
                    r = slice(k * sub_step, (k + 1) * sub_step)
                    tot = tot_scr[r, 0]
                    den = (tot * tot if auto else tot)[:, None]
                    return r, den, (nw_all[r] if fold_spline else None)

                occ_phase(0, 0, sub_step)
                for k in range(1, n_sub):
                    r_prev = slice((k - 1) * sub_step, k * sub_step)
                    ts_prev = class_dots(w_scr[r_prev, :])
                    occ_phase(0, k * sub_step, sub_step)
                    r, den, nwv = block_args(k - 1)
                    epilogue(ts_prev, den, nwv, rows=r)
                total_out[:] = tot_scr[:, 0:1]
                r, den, nwv = block_args(n_sub - 1)
                ts_last = class_dots(w_scr[r, :])
                epilogue(ts_last, den, nwv, rows=r)
            else:
                @pl.when(j == 0)
                def _():
                    occ_phase(0)
                    total_out[:] = tot_scr[:, 0:1]

                total = tot_scr[:, 0]
                denom = (total * total if auto else total)[:, None]
                ts = class_dots(w_scr[:])
                epilogue(ts, denom, nw_ref[:] if fold_spline else None)
            return

        # Cross-tile software pipeline (grid-resident, n_blocks == 1):
        # step i contracts + folds tile i-1 from one ping-pong scratch
        # half while tile i's occupation quadrature fills the other, so
        # the occupation VPU stretch hides under the previous tile's MXU
        # dots (issue order: prev dots -> cur occupation -> prev
        # epilogue, the bundle kernel's proven ordering).  The params
        # window addresses tile i (clamped), every OUTPUT window tile
        # i-1 (clamped): step 0 contracts uninitialized scratch into the
        # tile-0 windows, fully overwritten at step 1 before the windows
        # flush, and the extra step i = n_tiles recomputes the last
        # tile's occupation into a never-read scratch half — one tile of
        # redundant work per kernel, amortized over the batch.
        i = pl.program_id(0)
        cur = (i % 2) * tb
        prv = tb - cur
        w = w_scr[pl.dslice(prv, tb), :]
        total = tot_scr[pl.dslice(prv, tb), 0]
        denom = (total * total if auto else total)[:, None]
        nw_vals = nw_ref[:] if fold_spline else None
        ts = class_dots(w)
        occ_phase(cur)
        total_out[:] = total[:, None]
        epilogue(ts, denom, nw_vals)

    def run_kernel(pmat, *rest):
        local = pmat.shape[0]
        nt = local // batch_tile
        if one_d:
            # Grid-resident: the node axis is degenerate, so the Pallas
            # grid is 1-D over batch tiles (matching the bundle kernel's
            # proven pipelined structure; the 2-D (nt + 1, 1) form with
            # clamped output maps crashes the Mosaic compiler).
            if pipeline:
                grid = (nt + 1,)
                p_idx = lambda i: (jnp.minimum(i, nt - 1), 0)
                o_idx = lambda i: (jnp.maximum(i - 1, 0), 0)
                scr_rows = 2 * batch_tile
            else:
                grid = (nt,)
                p_idx = lambda i: (i, 0)
                o_idx = lambda i: (i, 0)
                scr_rows = batch_tile
            oj_idx = o_idx
        else:
            # Node-streamed (pipeline is impossible here — it requires
            # the grid resident, enforced above).
            grid = (nt, n_blocks)
            p_idx = lambda i, j: (i, 0)
            o_idx = lambda i, j: (i, 0)
            oj_idx = lambda i, j: (i, j)
            scr_rows = batch_tile
        if one_d:
            stream_idx = lambda i: (0, 0)
            fixed_idx = lambda r: (lambda i: (0,) * r)
        else:
            stream_idx = lambda i, j: (0, j)
            fixed_idx = lambda r: (lambda i, j: (0,) * r)
        if fold_spline:
            nw_padded, consts = rest[0], rest[1:]
            nw_inputs = (nw_padded,)
            nw_specs = [pl.BlockSpec((batch_tile, nw_pad), oj_idx,
                                     memory_space=pltpu.VMEM)]
            out_specs_xi = tuple(
                pl.BlockSpec((batch_tile, cp), o_idx,
                             memory_space=pltpu.VMEM)
                for cp in count_pads)
            out_shape_xi = tuple(
                jax.ShapeDtypeStruct((local, cp), jnp.float32)
                for cp in count_pads)
        else:
            consts = rest
            nw_inputs = ()
            nw_specs = []
            out_specs_xi = tuple(
                pl.BlockSpec((batch_tile, w), oj_idx,
                             memory_space=pltpu.VMEM)
                for w in class_widths)
            out_shape_xi = tuple(
                jax.ShapeDtypeStruct((local, n_blocks * w), jnp.float32)
                for w in class_widths)
        stream_consts = consts[:n_stream]
        fixed_consts = consts[n_stream:]
        with backend.pallas_lowering():
            return pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[pl.BlockSpec((batch_tile, 128), p_idx,
                                       memory_space=pltpu.VMEM)] +
                         nw_specs +
                         [pl.BlockSpec((k_pad, w), stream_idx,
                                       memory_space=pltpu.VMEM)
                          for w in block_widths] +
                         [pl.BlockSpec(a.shape, fixed_idx(a.ndim),
                                       memory_space=pltpu.VMEM)
                          for a in (fold_arrays + list(pair_sel_arrays) +
                                    list(seg_arrays))],
                out_specs=(
                    pl.BlockSpec((batch_tile, 1), o_idx,
                                 memory_space=pltpu.VMEM),) + out_specs_xi,
                out_shape=(
                    jax.ShapeDtypeStruct((local, 1),
                                         jnp.float32),) + out_shape_xi,
                scratch_shapes=[
                    pltpu.VMEM((scr_rows, k_pad), jnp.float32),
                    pltpu.VMEM((scr_rows, 128), jnp.float32)],
                interpret=interpret,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(pmat, *nw_inputs, *stream_consts, *fixed_consts)

    const_arrays = (tuple(stream_arrays) + tuple(fold_arrays) +
                    pair_sel_arrays + seg_arrays)
    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        n_dp = mesh.shape[batch_axis]
        sharded_kernel = jax.shard_map(
            run_kernel, mesh=mesh,
            in_specs=((P(batch_axis),) * (2 if fold_spline else 1) +
                      (P(),) * len(const_arrays)),
            out_specs=(P(batch_axis),) * (1 + len(groups)),
            check_vma=False)
    else:
        n_dp = 1
        sharded_kernel = run_kernel

    inv = np.asarray(row_inv_perm)
    unpermute = not np.array_equal(inv, np.arange(n_xi))

    def _pad_params(params):
        any_param = next(iter(params.values()))
        batch = any_param.shape[0]
        quantum = batch_tile * n_dp
        padded = -(-batch // quantum) * quantum
        pmat = jnp.stack(
            [jnp.pad(jnp.asarray(params[k], jnp.float32),
                     (0, padded - batch), constant_values=1.0)
             for k in names], axis=1)
        return jnp.pad(pmat, ((0, 0), (0, 128 - n_names))), batch, padded

    if fold_spline:
        def predict_batch(params, node_weights):
            pmat, batch, padded = _pad_params(params)
            nw = jnp.pad(jnp.asarray(node_weights, jnp.float32),
                         ((0, padded - batch), (0, 0)))
            nw = nw.reshape(padded, n_blocks, node_block)
            nw = jnp.pad(nw, ((0, 0), (0, 0), (0, nw_pad - node_block)))
            out = sharded_kernel(pmat, nw.reshape(padded, -1),
                                 *const_arrays)
            total = out[0][:batch, 0]
            parts = [out[1 + ci][:batch, :count]
                     for ci, (p, count) in enumerate(groups)]
            xi = parts[0] if len(parts) == 1 else jnp.concatenate(
                parts, axis=-1)
            if unpermute:
                xi = xi[:, inv]
            return total, xi

        return jax.jit(predict_batch)

    def predict_batch(params):
        pmat, batch, padded = _pad_params(params)
        out = sharded_kernel(pmat, *const_arrays)
        total = out[0][:batch, 0]
        parts = []
        for ci, ((p, count), w_gb) in enumerate(zip(groups, class_widths)):
            o = out[1 + ci][:batch].reshape(batch, n_blocks, w_gb)
            o = o[:, :, :node_block * count]
            parts.append(o.reshape(batch, n_nodes, count))
        xi = parts[0] if len(parts) == 1 else jnp.concatenate(parts,
                                                              axis=-1)
        if unpermute:
            xi = xi[:, :, inv]
        return total, xi

    return jax.jit(predict_batch)
