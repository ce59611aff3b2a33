"""On-device MCMC over HOD parameters.

The reference is "ideally suited for MCMC exploration" (reference README)
but leaves the sampler to the user (emcee on the host, one ~1 ms predict
per walker per step).  Here entire ensembles advance in one jitted kernel
per step:

* :func:`run_ensemble` — affine-invariant stretch-move ensemble sampler
  (Goodman & Weare 2010, the emcee algorithm) with the two-half update
  scheme, vmapped over walkers, ``lax.scan`` over steps.
* :func:`run_hmc` — Hamiltonian Monte Carlo with leapfrog integration;
  gradients of the log posterior flow through the prediction kernels for
  free.

Both samplers take a pure ``log_prob_fn(params_vector) -> float`` and work
on (n_walkers, n_dim) position arrays.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _stretch_half(key, active, passive, log_prob_active, log_prob_fn, a):
    """Goodman & Weare stretch move of ``active`` against ``passive``."""
    n_active = active.shape[0]
    key_z, key_pick, key_accept = jax.random.split(key, 3)

    # z ~ g(z) proportional to 1/sqrt(z) on [1/a, a].
    u = jax.random.uniform(key_z, (n_active,))
    z = ((a - 1.0) * u + 1.0) ** 2 / a

    picks = jax.random.randint(key_pick, (n_active,), 0, passive.shape[0])
    proposal = passive[picks] + z[:, None] * (active - passive[picks])

    log_prob_prop = jax.vmap(log_prob_fn)(proposal)
    n_dim = active.shape[1]
    log_accept = ((n_dim - 1.0) * jnp.log(z) +
                  log_prob_prop - log_prob_active)
    accept = jnp.log(jax.random.uniform(key_accept, (n_active,))) < log_accept

    new = jnp.where(accept[:, None], proposal, active)
    new_log_prob = jnp.where(accept, log_prob_prop, log_prob_active)
    return new, new_log_prob, accept


def ensemble_step(key, walkers, log_prob, log_prob_fn, a=2.0):
    """One stretch-move step over all walkers (two-half scheme).

    Parameters
    ----------
    key : jax.random key
    walkers : (n_walkers, n_dim)
    log_prob : (n_walkers,) current log probabilities
    log_prob_fn : callable (n_dim,) -> scalar, pure
    a : float, stretch scale parameter

    Returns
    -------
    (walkers, log_prob, accept_fraction)
    """
    n = walkers.shape[0] // 2
    key_1, key_2 = jax.random.split(key)

    first, second = walkers[:n], walkers[n:]
    lp_first, lp_second = log_prob[:n], log_prob[n:]

    first, lp_first, acc_1 = _stretch_half(
        key_1, first, second, lp_first, log_prob_fn, a)
    second, lp_second, acc_2 = _stretch_half(
        key_2, second, first, lp_second, log_prob_fn, a)

    walkers = jnp.concatenate([first, second])
    log_prob = jnp.concatenate([lp_first, lp_second])
    accept = jnp.concatenate([acc_1, acc_2]).mean()
    return walkers, log_prob, accept


@partial(jax.jit, static_argnames=("log_prob_fn", "n_steps", "thin"))
def run_ensemble(key, log_prob_fn, walkers0, n_steps, a=2.0, thin=1):
    """Run the stretch-move ensemble sampler.

    Returns
    -------
    chain : (n_steps // thin, n_walkers, n_dim)
    log_prob : (n_steps // thin, n_walkers)
    accept_fraction : scalar, mean over all steps
    """
    log_prob = jax.vmap(log_prob_fn)(walkers0)

    def body(carry, key_step):
        walkers, log_prob = carry

        def inner(carry_inner, key_inner):
            w, lp = carry_inner
            w, lp, acc = ensemble_step(key_inner, w, lp, log_prob_fn, a)
            return (w, lp), acc

        keys = jax.random.split(key_step, thin)
        (walkers, log_prob), accs = jax.lax.scan(
            inner, (walkers, log_prob), keys)
        return (walkers, log_prob), (walkers, log_prob, accs.mean())

    keys = jax.random.split(key, n_steps // thin)
    (_, _), (chain, chain_lp, accs) = jax.lax.scan(
        body, (walkers0, log_prob), keys)
    return chain, chain_lp, accs.mean()


def hmc_step(key, position, log_prob_fn, step_size, n_leapfrog):
    """One HMC step: leapfrog + Metropolis accept. Position: (n_dim,)."""
    key_mom, key_accept = jax.random.split(key)
    grad_fn = jax.grad(log_prob_fn)

    momentum = jax.random.normal(key_mom, position.shape,
                                 dtype=position.dtype)
    lp0 = log_prob_fn(position)
    h0 = lp0 - 0.5 * jnp.sum(momentum**2)

    def leapfrog(carry, _):
        q, p = carry
        p = p + 0.5 * step_size * grad_fn(q)
        q = q + step_size * p
        p = p + 0.5 * step_size * grad_fn(q)
        return (q, p), None

    (q_new, p_new), _ = jax.lax.scan(
        leapfrog, (position, momentum), None, length=n_leapfrog)

    lp_new = log_prob_fn(q_new)
    h_new = lp_new - 0.5 * jnp.sum(p_new**2)
    accept = (jnp.log(jax.random.uniform(key_accept, ())) <
              h_new - h0)
    position = jnp.where(accept, q_new, position)
    return position, jnp.where(accept, lp_new, lp0), accept


@partial(jax.jit,
         static_argnames=("log_prob_fn", "n_steps", "n_leapfrog"))
def run_hmc(key, log_prob_fn, positions0, n_steps, step_size=0.01,
            n_leapfrog=10):
    """Vmapped multi-chain HMC. positions0: (n_chains, n_dim).

    Returns (chain (n_steps, n_chains, n_dim), log_prob, accept_fraction).
    """
    def body(positions, key_step):
        keys = jax.random.split(key_step, positions.shape[0])
        positions, lp, acc = jax.vmap(
            lambda k, q: hmc_step(k, q, log_prob_fn, step_size, n_leapfrog)
        )(keys, positions)
        return positions, (positions, lp, acc.mean())

    keys = jax.random.split(key, n_steps)
    _, (chain, chain_lp, accs) = jax.lax.scan(body, positions0, keys)
    return chain, chain_lp, accs.mean()


@partial(jax.jit,
         static_argnames=("log_prob_fn", "n_warmup", "n_steps",
                          "n_leapfrog"))
def run_hmc_adaptive(key, log_prob_fn, positions0, n_warmup, n_steps,
                     n_leapfrog=10, initial_step_size=0.1,
                     target_accept=0.8):
    """HMC with dual-averaging step-size adaptation during warmup.

    Implements the Nesterov dual-averaging scheme of Hoffman & Gelman
    (2014, the NUTS paper, algorithm 5) to tune the leapfrog step size to
    ``target_accept`` over ``n_warmup`` vmapped multi-chain steps, then
    samples ``n_steps`` with the adapted (frozen) step size.

    Returns (chain (n_steps, n_chains, n_dim), log_prob, accept_fraction,
    step_size).
    """
    gamma, t0, kappa = 0.05, 10.0, 0.75
    mu = jnp.log(10.0 * initial_step_size)

    def multi_step(key_step, positions, step_size):
        keys = jax.random.split(key_step, positions.shape[0])
        positions, lp, acc = jax.vmap(
            lambda k, q: hmc_step(k, q, log_prob_fn, step_size,
                                  n_leapfrog))(keys, positions)
        return positions, lp, acc.mean()

    def warmup_body(carry, key_step):
        positions, log_eps, log_eps_bar, h_bar, t = carry
        positions, _, accept = multi_step(key_step, positions,
                                          jnp.exp(log_eps))
        t = t + 1.0
        h_bar = ((1.0 - 1.0 / (t + t0)) * h_bar +
                 (target_accept - accept) / (t + t0))
        log_eps = mu - jnp.sqrt(t) / gamma * h_bar
        eta = t ** -kappa
        log_eps_bar = eta * log_eps + (1.0 - eta) * log_eps_bar
        return (positions, log_eps, log_eps_bar, h_bar, t), accept

    key_warm, key_sample = jax.random.split(key)
    carry0 = (positions0, jnp.log(initial_step_size),
              jnp.log(initial_step_size), 0.0, 0.0)
    (positions, _, log_eps_bar, _, _), _ = jax.lax.scan(
        warmup_body, carry0, jax.random.split(key_warm, n_warmup))
    step_size = jnp.exp(log_eps_bar)

    def body(positions, key_step):
        positions, lp, acc = multi_step(key_step, positions, step_size)
        return positions, (positions, lp, acc)

    _, (chain, chain_lp, accs) = jax.lax.scan(
        body, positions, jax.random.split(key_sample, n_steps))
    return chain, chain_lp, accs.mean(), step_size


def make_gaussian_logpost(predict_fn, param_names, base_params, data,
                          inv_cov, bounds=None, ngal_data=None,
                          ngal_sigma=None):
    """Gaussian log posterior over a subset of HOD parameters.

    ``predict_fn`` is an *unvectorized* predictor (dict -> (ngal, xi));
    ``param_names`` are the sampled dimensions, others fixed at
    ``base_params``.  ``bounds`` maps names to (lo, hi) flat priors.
    """
    data = jnp.asarray(data)
    inv_cov = jnp.asarray(inv_cov)
    names = tuple(param_names)

    def log_prob(theta):
        params = dict(base_params)
        for i, name in enumerate(names):
            params[name] = theta[i]
        ngal, xi = predict_fn(params)
        resid = xi.ravel() - data
        logp = -0.5 * resid @ inv_cov @ resid
        if ngal_data is not None:
            logp = logp - 0.5 * ((ngal - ngal_data) / ngal_sigma) ** 2
        if bounds is not None:
            inside = jnp.bool_(True)
            for i, name in enumerate(names):
                if name in bounds:
                    lo, hi = bounds[name]
                    inside = inside & (theta[i] > lo) & (theta[i] < hi)
            logp = jnp.where(inside, logp, -jnp.inf)
        return logp

    return log_prob
