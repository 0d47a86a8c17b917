"""Sequential Monte Carlo (tempered-likelihood) for the temporal AME
posterior.

TPU-native design (no counterpart in the reference; mandated by the north
star): N particles over the full latent tensor (n, T, d) move through a
geometric likelihood-tempering schedule ``beta: 0 -> 1``.  Every stage is
batched over particles (vmap); particles shard over the ``batch`` mesh axis,
where resampling becomes an all-gather of particle weights plus a gathered
index select.

Stages:
1. init — particles from the AR(1) prior (ancestral sampling, batched);
2. reweight — incremental weights ``dbeta * loglik`` per particle;
3. resample — systematic resampling whenever ESS < threshold * N;
4. move — a few random-walk Metropolis steps targeting
   ``prior * lik^beta``, proposal scaled per-coordinate (optionally by CAVI
   posterior scales).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

from tame.models.params import AMEParams
from tame.models.temporal_ame import sample_latents
from tame.inference.logprob import log_likelihood, log_prior, precompute


class SMCResult(NamedTuple):
    particles: Array          # (N, n, T, d) final equally-weighted particles
    log_weights: Array        # (N,) final log weights (normalized)
    ess_history: Array        # (num_stages,) effective sample size
    accept_history: Array     # (num_stages,) mean MH acceptance in moves
    log_evidence: Array       # SMC estimate of log p(Y)


def systematic_resample(key: Array, log_weights: Array) -> Array:
    """Systematic resampling: returns parent indices (N,)."""
    N = log_weights.shape[0]
    w = jax.nn.softmax(log_weights)
    positions = (jax.random.uniform(key) + jnp.arange(N)) / N
    cumsum = jnp.cumsum(w)
    return jnp.searchsorted(cumsum, positions)


def effective_sample_size(log_weights: Array) -> Array:
    w = jax.nn.softmax(log_weights)
    return 1.0 / jnp.sum(w ** 2)


@functools.partial(jax.jit, static_argnames=("num_particles", "num_stages",
                                             "num_moves", "family"))
def run_smc(params: AMEParams, Y: Array, key: Array, *,
            num_particles: int = 256, num_stages: int = 20,
            num_moves: int = 3, step_scale: float = 0.15,
            ess_threshold: float = 0.5,
            proposal_scale: Optional[Array] = None,
            obs_mask: Optional[Array] = None,
            family=None) -> SMCResult:
    """Run tempered SMC; see module docstring.

    ``proposal_scale``: per-coordinate random-walk scale (n, T, d); defaults
    to the stationary prior marginal scale.  ``obs_mask`` targets the
    missing-data posterior (observed dyads only; the surface shared with
    the masked CAVI engines and HMC/NUTS).
    """
    consts = precompute(params)
    n, _, T, _ = Y.shape
    d = params.d

    if proposal_scale is None:
        prior_std = jnp.sqrt(jnp.diag(params.Sigma0))       # (d,)
        proposal_scale = jnp.broadcast_to(prior_std, (n, T, d))

    k_init, k_stages = jax.random.split(key)
    particles = jax.vmap(
        lambda k: sample_latents(params, k, n, T)
    )(jax.random.split(k_init, num_particles))               # (N, n, T, d)

    loglik = jax.vmap(
        lambda X: log_likelihood(params, Y, X, consts, obs_mask=obs_mask,
                                 family=family))
    logpri = jax.vmap(lambda X: log_prior(params, X, consts))

    betas = jnp.linspace(0.0, 1.0, num_stages + 1)

    def tempered_logp(X, beta):
        return (log_prior(params, X, consts)
                + beta * log_likelihood(params, Y, X, consts,
                                        obs_mask=obs_mask,
                                        family=family))

    def mh_move(key, X, beta):
        """One random-walk MH step on a single particle."""
        k_prop, k_acc = jax.random.split(key)
        prop = X + step_scale * proposal_scale * jax.random.normal(
            k_prop, X.shape)
        logp_old = tempered_logp(X, beta)
        logp_new = tempered_logp(prop, beta)
        accept = (jnp.log(jax.random.uniform(k_acc))
                  < (logp_new - logp_old))
        return jnp.where(accept, prop, X), accept.astype(jnp.float32)

    def stage(carry, inputs):
        particles, log_weights, log_evidence = carry
        k, beta_prev, beta = inputs

        # 2. reweight
        incr = (beta - beta_prev) * loglik(particles)
        log_weights = log_weights + incr
        # evidence increment: log mean exp of incremental weights under the
        # previous normalized weights
        log_evidence = log_evidence + (
            jax.nn.logsumexp(log_weights)
            - jax.nn.logsumexp(log_weights - incr))
        ess = effective_sample_size(log_weights)

        # 3. conditional systematic resample
        k_res, k_move = jax.random.split(k)
        do_resample = ess < ess_threshold * num_particles
        idx = systematic_resample(k_res, log_weights)
        particles = jnp.where(do_resample,
                              particles[idx], particles)
        log_weights = jnp.where(do_resample,
                                jnp.zeros_like(log_weights), log_weights)

        # 4. move: num_moves MH steps per particle
        def move_body(ps, kk):
            keys = jax.random.split(kk, num_particles)
            ps, acc = jax.vmap(mh_move, in_axes=(0, 0, None))(keys, ps,
                                                              beta)
            return ps, acc.mean()

        particles, accs = jax.lax.scan(
            move_body, particles, jax.random.split(k_move, num_moves))

        return (particles, log_weights, log_evidence), (ess, accs.mean())

    init_lw = jnp.zeros(num_particles)
    keys = jax.random.split(k_stages, num_stages)
    (particles, log_weights, log_evidence), (ess_hist, acc_hist) = \
        jax.lax.scan(stage, (particles, init_lw, jnp.asarray(0.0)),
                     (keys, betas[:-1], betas[1:]))

    log_weights = log_weights - jax.nn.logsumexp(log_weights)
    return SMCResult(particles=particles, log_weights=log_weights,
                     ess_history=ess_hist, accept_history=acc_hist,
                     log_evidence=log_evidence)


class TemporalAMESMC:
    """SMC posterior sampler with the reference-compatible class feel."""

    def __init__(self, model, num_particles: int = 256,
                 num_stages: int = 20, num_moves: int = 3, seed: int = 0,
                 precondition: bool = True, mask=None, family=None):
        if model.Y is None:
            raise ValueError(
                "Model has no data. Call model.generate_data() first.")
        self.model = model
        self.Y = jnp.asarray(model.Y)
        self.num_particles = num_particles
        self.num_stages = num_stages
        self.num_moves = num_moves
        self.seed = seed
        # Declared dyadic likelihood family (tame.models.likelihoods);
        # non-Gaussian families skip the (Gaussian) CAVI preconditioner.
        if family is not None:
            from tame.models.likelihoods import get_family

            family = get_family(family)
            if family.name != "gaussian":
                precondition = False
        self.family = family
        self.precondition = precondition
        # Optional dyad observation mask (missing-data posterior).
        self.mask = None if mask is None else jnp.asarray(mask)

    def sample(self, mesh=None) -> SMCResult:
        """Run the tempered-SMC sweep.

        With ``mesh``, the particle population is sharded over the
        ``batch`` axis: tempering/reweighting/moves are particle-local on
        each device, the ESS and evidence reductions become ``psum``-style
        collectives, and the systematic-resampling gather
        (``particles[idx]``) is lowered by GSPMD to an all-gather +
        local index-select — the collective pattern the north star asks
        for (resampling via all-gather)."""
        proposal_scale = None
        if self.precondition:
            from tame.inference.hmc import precondition_from_cavi

            _, variances = precondition_from_cavi(
                self.Y, self.model.params, seed=self.seed,
                mask=self.mask)
            proposal_scale = jnp.sqrt(variances)
        key = jax.random.PRNGKey(self.seed)
        if mesh is not None:
            from tame.parallel import chain_sharding, replicated

            Y = jax.device_put(self.Y, replicated(mesh))
            out_shardings = SMCResult(
                particles=chain_sharding(mesh, 4),
                log_weights=chain_sharding(mesh, 1),
                ess_history=replicated(mesh),
                accept_history=replicated(mesh),
                log_evidence=replicated(mesh),
            )
            run = jax.jit(
                functools.partial(run_smc,
                                  num_particles=self.num_particles,
                                  num_stages=self.num_stages,
                                  num_moves=self.num_moves,
                                  family=self.family),
                out_shardings=out_shardings)
            return run(self.model.params, Y, key,
                       proposal_scale=proposal_scale,
                       obs_mask=self.mask)
        return run_smc(self.model.params, self.Y, key,
                       num_particles=self.num_particles,
                       num_stages=self.num_stages,
                       num_moves=self.num_moves,
                       proposal_scale=proposal_scale,
                       obs_mask=self.mask, family=self.family)

    def posterior_mean(self, result: SMCResult) -> Array:
        w = jax.nn.softmax(result.log_weights)
        return jnp.einsum("p,pntd->ntd", w, result.particles)
