"""Pallas-fused batched prediction kernel.

The XLA path materializes the per-sample contraction intermediate
``T[b, k, i] = sum_j F[k, i, j] n[b, j]`` (~24 KB per prediction for a
wp + xi_ell bundle) in HBM, which bounds throughput at the memory
bandwidth.  This kernel fuses the whole pipeline per batch tile —
occupation quadrature (VPU) -> ngal -> MXU matmul against the dense
matrix -> weighted reduction — so the intermediate never leaves VMEM.

Auto mode:   xi[b, k] = n_b^T F_k n_b / (sum_i n_bi)^2
Cross mode:  xi[b, k] = (F n_b)_k / sum_i n_bi

The occupation functions are ordinary jax-traceable callables (the same
pure functions the XLA path uses); they are traced *inside* the kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .predict import AUTO, TableData

DEFAULT_TILE = 256


def make_fused_predictor(table: TableData, occupation_cen, occupation_sat,
                         param_names, batch_tile=DEFAULT_TILE,
                         interpret=False):
    """Build a fused batched predictor.

    Parameters
    ----------
    table : TableData
        Device tabulation (float32 recommended).
    occupation_cen, occupation_sat : callables
        Pure occupation functions ``(params_dict, logM, sec) -> occ``.
    param_names : sequence of str
        Parameter-dict keys, fixing the kernel input order.
    batch_tile : int
        Batch rows per kernel instance (VMEM-resident tile).

    Returns
    -------
    callable
        ``f(params: dict[str, (B,)]) -> (ngal (B,), xi (B, n_xi))``;
        B must not be 0; it is padded to a tile multiple internally.
    """
    param_names = tuple(param_names)
    n_bins = table.n_bins
    nc = table.n_centrals
    n_xi = table.tpcf_dense.shape[0]
    auto = table.mode == AUTO
    dtype = table.tpcf_dense.dtype

    # Dense matrix reshaped for one MXU matmul: (n_bins, n_xi * n_bins)
    # in auto mode (T = N @ F2), (n_bins, n_xi) in cross mode.
    if auto:
        f2 = jnp.transpose(table.tpcf_dense, (2, 0, 1)).reshape(
            n_bins, n_xi * n_bins)
    else:
        f2 = jnp.transpose(table.tpcf_dense, (1, 0))

    log_quad = table.log_prim_quad
    quad_w = table.quad_weight
    sec = table.sec_perc
    n_h = table.n_h
    # Branch-free gal-type handling: evaluate both occupation functions on
    # every bin and blend with a mask (unaligned slices/concats do not
    # lower well in Mosaic; the doubled VPU work is negligible).
    cen_mask = (np.arange(n_bins) < nc).astype(np.float32)

    def kernel(*refs):
        param_refs = refs[:len(param_names)]
        (f2_ref, logq_ref, quadw_ref, sec_ref, nh_ref, mask_ref,
         ngal_out, xi_out) = refs[len(param_names):]

        params = {name: ref[:].reshape(-1, 1, 1)
                  for name, ref in zip(param_names, param_refs)}
        logq = logq_ref[:][None]
        sec_col = sec_ref[:].reshape(1, -1, 1)

        occ_c = occupation_cen(params, logq, sec_col)
        occ_s = occupation_sat(params, logq, sec_col)
        mask = mask_ref[:].reshape(1, -1, 1)
        occ = mask * occ_c + (1.0 - mask) * occ_s      # (TB, n_bins, n_g)
        mean_occ = jnp.sum(quadw_ref[:][None] * occ, axis=-1)
        ngal = mean_occ * nh_ref[:][None]              # (TB, n_bins)
        total = jnp.sum(ngal, axis=-1)                 # (TB,)
        ngal_out[:] = total

        t = jnp.dot(ngal, f2_ref[:], preferred_element_type=dtype)
        if auto:
            t = t.reshape(ngal.shape[0], n_xi, n_bins)
            xi = jnp.sum(t * ngal[:, None, :], axis=-1)
            xi_out[:] = xi / (total * total)[:, None]
        else:
            xi_out[:] = t / total[:, None]

    def block1d():
        return pl.BlockSpec((batch_tile,), lambda i: (i,),
                            memory_space=pltpu.VMEM)

    def full(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    @jax.jit
    def predict_batch(params):
        batch = params[param_names[0]].shape[0]
        padded = -(-batch // batch_tile) * batch_tile
        inputs = []
        for name in param_names:
            x = jnp.asarray(params[name], dtype=dtype)
            inputs.append(jnp.pad(x, (0, padded - batch)))

        grid = (padded // batch_tile,)
        ngal, xi = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[block1d() for _ in param_names] + [
                full(f2.shape), full(log_quad.shape),
                full(quad_w.shape), full(sec.shape), full(n_h.shape),
                full((n_bins,))],
            out_specs=(
                pl.BlockSpec((batch_tile,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((batch_tile, n_xi), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)),
            out_shape=(
                jax.ShapeDtypeStruct((padded,), dtype),
                jax.ShapeDtypeStruct((padded, n_xi), dtype)),
            interpret=interpret,
        )(*inputs, f2, log_quad, quad_w, sec, n_h,
          jnp.asarray(cen_mask, dtype=dtype))
        return ngal[:batch], xi[:batch]

    return predict_batch
