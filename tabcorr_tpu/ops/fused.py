"""Pallas-fused batched contraction kernel.

The XLA predict path materializes the per-sample contraction intermediate
``T[b, k, i] = sum_j F[k, i, j] n[b, j]`` (~24 KB per prediction for a
wp + xi_ell bundle) in HBM, which bounds throughput at memory bandwidth.
This kernel performs the whole contraction per batch tile in VMEM:

Auto mode:   xi[b, k] = n_b^T F_k n_b / (sum_i n_bi)^2
Cross mode:  xi[b, k] = (F n_b)_k / sum_i n_bi

The occupation quadrature stays in XLA *outside* the kernel — its output
``ngal`` is only (B, n_bins) (negligible HBM traffic), it keeps arbitrary
jax-traceable occupation models supported (Pallas TPU lacks lowerings for
some transcendentals, e.g. erf), and XLA fuses it well on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .predict import AUTO, TableData, mean_occupation

# 256 rows keeps the contraction tile + double-buffered IO inside the
# ~16 MB VMEM budget for production table sizes and benchmarked fastest
# on v5e (11.0 M wp+xi_ell predictions/s vs 7.4 M for the XLA path).
DEFAULT_TILE = 256


def make_fused_contraction(table: TableData, batch_tile=DEFAULT_TILE,
                           interpret=False, precision="highest"):
    """Fused contraction: ``ngal (B, n_bins) -> (total (B,), xi (B, n_xi))``.

    B must be a multiple of ``batch_tile`` (callers pad).
    ``precision='highest'`` (default) keeps the MXU matmul at full float32
    effective precision (<1e-6 relative, 3 bf16 passes); ``'default'``
    uses the single-pass bf16 MXU mode (~1e-3 relative, ~1.5x faster).
    """
    n_bins = table.n_bins
    # Pad the bin axis to a lane multiple (128): Mosaic only lowers the
    # (TB, n_xi * nb) -> (TB, n_xi, nb) reshape when nb is lane-aligned,
    # and padded bins carry ngal = 0 so they contribute nothing.
    nb_pad = -(-n_bins // 128) * 128
    n_xi = table.tpcf_dense.shape[0]
    auto = table.mode == AUTO
    dtype = table.tpcf_dense.dtype

    # (nb_pad, n_xi * nb_pad) in auto mode so T = N @ F2 is one MXU
    # matmul; (nb_pad, n_xi) in cross mode.
    if auto:
        dense = jnp.zeros((n_xi, nb_pad, nb_pad), dtype=dtype)
        dense = dense.at[:, :n_bins, :n_bins].set(table.tpcf_dense)
        f2 = jnp.transpose(dense, (2, 0, 1)).reshape(
            nb_pad, n_xi * nb_pad)
    else:
        f2 = jnp.zeros((nb_pad, n_xi), dtype=dtype)
        f2 = f2.at[:n_bins].set(jnp.transpose(table.tpcf_dense, (1, 0)))

    mxu_precision = (jax.lax.Precision.HIGHEST if precision == "highest"
                     else jax.lax.Precision.DEFAULT)

    def kernel(ngal_ref, f2_ref, total_out, xi_out):
        ngal = ngal_ref[:]                              # (TB, nb_pad)
        total = jnp.sum(ngal, axis=-1)
        total_out[:] = total[:, None]
        # HIGHEST: f32 inputs on the MXU default to one bf16 pass
        # (~1e-3 relative); three-pass keeps the <1e-6 accuracy target.
        t = jnp.dot(ngal, f2_ref[:], preferred_element_type=dtype,
                    precision=mxu_precision)
        if auto:
            t = t.reshape(ngal.shape[0], n_xi, nb_pad)
            xi = jnp.sum(t * ngal[:, None, :], axis=-1)
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
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(f2.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=(
                pl.BlockSpec((batch_tile, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((batch_tile, n_xi), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)),
            out_shape=(
                jax.ShapeDtypeStruct((batch, 1), dtype),
                jax.ShapeDtypeStruct((batch, n_xi), dtype)),
            interpret=interpret,
        )(ngal, f2)
        return total[:, 0], xi

    return contract


def make_fused_predictor(table: TableData, occupation_cen, occupation_sat,
                         param_names=None, batch_tile=DEFAULT_TILE,
                         interpret=False, precision="highest"):
    """Fused batched predictor ``f(params dict of (B,)) -> (ngal, xi)``.

    XLA occupation quadrature + Pallas VMEM-resident contraction.  The
    batch is padded to a ``batch_tile`` multiple internally.  See
    :func:`make_fused_contraction` for the ``precision`` trade-off.
    """
    contract = make_fused_contraction(table, batch_tile=batch_tile,
                                      interpret=interpret,
                                      precision=precision)
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
