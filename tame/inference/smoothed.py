"""Smoothed CAVI: per-node joint-trajectory variational family.

A strictly tighter family than anything in the reference: instead of
independent per-(node, time) Gaussians coupled through neighbor means
(Gauss–Seidel in t), each node's whole trajectory is one joint Gaussian

    q(X) = prod_i q(X_i^{0:T-1}),

whose exact coordinate update — given the other nodes' means — is the
block-tridiagonal system solved by
:func:`tame.ops.tridiag.block_tridiag_smoother` (AR(1) forward-backward
smoothing):

    D_t = P_obs[t] + [t=0] Sigma0^-1 + [t>0] Q^-1 + [t<T-1] Phi' Q^-1 Phi
    O   = -Phi' Q^-1        (precision block (t, t+1))
    b_t = eta_obs[t]        (temporal coupling handled exactly, not via
                             neighbor means)

The ELBO gains exact cross-time terms: transition expectations use the
lag-1 cross-covariances and the entropy uses the trajectory log
determinant from the smoother.  Damping applies to the means only (the
implied joint of damped covariance mixtures is not well-defined);
covariances are refreshed from each solve.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from tame.inference import cavi
from tame.models.params import AMEParams
from tame.ops import dyad as dyad_ops
from tame.ops.dyad import HIGHEST
from tame.ops.fused_smoother import fused_smoother, fused_smoother_supported
from tame.ops.tridiag import block_tridiag_smoother

_LOG2PI = 1.8378770664093453


class SmoothedState(NamedTuple):
    X_mean: Array    # (n, T, d)
    X_cov: Array     # (n, T, d, d)   marginal covariances
    X_cross: Array   # (n, T-1, d, d) Cov(X_t, X_{t+1}) per node
    logdets: Array   # (n,)           logdet of each node's joint precision


class SmoothedFitResult(NamedTuple):
    state: SmoothedState
    elbo_history: Array
    mse_history: Array
    n_iter: Array
    converged: Array
    diverged: Array


def init_smoothed_state(key: Array, n: int, T: int, d: int,
                        init_scale: float = 0.1) -> SmoothedState:
    X_mean = jax.random.normal(key, (n, T, d)) * init_scale
    eye = jnp.eye(d)
    X_cov = jnp.broadcast_to(eye * 0.5, (n, T, d, d))
    X_cross = jnp.zeros((n, max(T - 1, 0), d, d))
    # logdet of 0.5 I per time step, independent blocks
    logdets = jnp.full((n,), -T * d * jnp.log(0.5))
    return SmoothedState(X_mean=X_mean, X_cov=jnp.asarray(X_cov),
                         X_cross=X_cross, logdets=logdets)


def smoothed_step(state: SmoothedState, obs: cavi.ObsConstants,
                  pri: cavi.PriorMatrices, params: AMEParams, lr: Array,
                  corrected: bool = True,
                  fused: bool = False,
                  mask: Array | None = None) -> SmoothedState:
    """One simultaneous update: every node's trajectory re-solved exactly
    against the other nodes' current means.

    ``fused=True`` runs the forward-backward smooth in the Pallas kernel
    (:func:`tame.ops.fused_smoother.fused_smoother`) instead of the
    ``vmap``-ed ``lax.scan`` solver — one kernel for the whole batched
    solve, the north star's "AR(1) forward-backward smoothing as a fused
    kernel" item.
    """
    n, T, d = state.X_mean.shape
    r = (d - 2) // 2
    _, _, U, V = dyad_ops.split_state(state.X_mean, r)

    if mask is None:
        D_obs = cavi._obs_precision(U, V, params.R_inv)
    else:  # missing-data fit: per-node masked partner statistics
        D_obs = cavi._masked_obs_precision(mask, U, V, params.R_inv)
    D = D_obs + cavi._prior_precision(pri, T)[None]      # (n, T, d, d)
    b = cavi._obs_nat_param(obs, state.X_mean, r, params.R_inv,
                            corrected, mask=mask)         # (n, T, d)
    O = -pri.Qinv_Phi.T                                   # -Phi' Q^-1

    if fused:
        # interpret mode lets CPU tests exercise the kernel (cf. fit_cavi)
        out = fused_smoother(D, O, b,
                             interpret=jax.default_backend() == "cpu")
    else:
        out = jax.vmap(lambda Di, bi: block_tridiag_smoother(Di, O, bi))(
            D, b)
    X_mean = lr * out.mean + (1.0 - lr) * state.X_mean
    return SmoothedState(X_mean=X_mean.astype(state.X_mean.dtype),
                         X_cov=out.cov, X_cross=out.cross_cov,
                         logdets=out.logdet)


def smoothed_elbo(Y: Array, params: AMEParams, pri: cavi.PriorMatrices,
                  state: SmoothedState, mu_dyadic: Array | None = None,
                  obs_mask: Array | None = None) -> Array:
    """ELBO with exact cross-time transition terms and trajectory entropy.

    Likelihood uses the same plug-in + trace-correction convention as the
    structured engines (reference ``structured_mf.py:141-148``) so values
    are comparable to Good SMF.
    """
    n, T, d = state.X_mean.shape
    r = (d - 2) // 2
    if mu_dyadic is None:
        mu_dyadic = dyad_ops.dyadic_mean_temporal(state.X_mean, r)

    resid = Y - mu_dyadic
    p_, q_ = params.R_inv[0, 0], params.R_inv[0, 1]
    e0, e1 = resid[..., 0], resid[..., 1]
    quad = p_ * (e0 * e0 + e1 * e1) + 2.0 * q_ * (e0 * e1)
    tr_cov = jnp.trace(state.X_cov, axis1=-2, axis2=-1)
    if obs_mask is None:
        mask = dyad_ops.offdiag_mask(n)[:, :, None]
        n_dyads = n * (n - 1) // 2 * T
        wsum = (n - 1) * jnp.sum(tr_cov)
    else:  # observed dyads only (cf. cavi._elbo_from_quad mask_stats)
        mask = obs_mask
        n_dyads = 0.5 * jnp.sum(obs_mask)
        wsum = jnp.sum(obs_mask.sum(1) * tr_cov)
    quad_sum = 0.5 * jnp.sum(quad * mask)
    log_lik = -0.5 * (quad_sum + n_dyads * (pri.logdet_R + 2.0 * _LOG2PI))
    corr = 0.1 * jnp.trace(params.R_inv) / d * wsum
    log_lik = log_lik - 0.5 * corr

    # initial prior
    mu0 = state.X_mean[:, 0]
    quad0 = jnp.einsum("ia,ab,ib->", mu0, pri.Sigma0_inv, mu0,
                       precision=HIGHEST)
    trace0 = jnp.einsum("ab,iba->", pri.Sigma0_inv, state.X_cov[:, 0],
                        precision=HIGHEST)
    prior0 = -0.5 * (quad0 + trace0
                     + n * (pri.logdet_Sigma0 + d * _LOG2PI))

    # transitions with exact cross-covariances:
    # E[(x_t - Phi x_{t-1})' Q^-1 (x_t - Phi x_{t-1})] =
    #   resid-quad(means) + tr(Q^-1 Sig_t) + tr(Phi'Q^-1 Phi Sig_{t-1})
    #   - 2 tr(Q^-1 Phi C_{t-1,t})
    if T > 1:
        residt = state.X_mean[:, 1:] - jnp.matmul(
            state.X_mean[:, :-1], params.Phi.T, precision=HIGHEST)
        quadt = jnp.einsum("ita,ab,itb->", residt, pri.Q_inv, residt,
                           precision=HIGHEST)
        tr_t = jnp.einsum("ab,itba->", pri.Q_inv, state.X_cov[:, 1:],
                          precision=HIGHEST)
        tr_prev = jnp.einsum("ab,itba->", pri.PhiT_Qinv_Phi,
                             state.X_cov[:, :-1], precision=HIGHEST)
        tr_cross = jnp.einsum("ab,itba->", pri.Qinv_Phi, state.X_cross,
                              precision=HIGHEST)
        priort = -0.5 * (quadt + tr_t + tr_prev - 2.0 * tr_cross
                         + n * (T - 1) * (pri.logdet_Q + d * _LOG2PI))
    else:
        priort = jnp.asarray(0.0, Y.dtype)

    # entropy of the joint trajectories: 0.5 (Td (1+log 2 pi) - logdet P)
    entropy = 0.5 * (n * T * d * (1.0 + _LOG2PI)
                     - jnp.sum(state.logdets))
    return log_lik + prior0 + priort + entropy


def fit_cavi_smoothed(Y: Array, params: AMEParams, init: SmoothedState, *,
                      max_iter: int = 100, learning_rate=0.8,
                      tolerance=1e-4, patience: int = 3,
                      corrected: bool = True,
                      fused="auto",
                      mask: Array | None = None) -> SmoothedFitResult:
    """``fused``: True forces the Pallas forward-backward kernel, False the
    ``vmap``-ed scan solver, "auto" (default) picks the kernel on TPU when
    the shape is supported (``TAME_DISABLE_FUSED_FIT=1`` disables)."""
    buf = 64
    while buf < max_iter:
        buf *= 2
    n, _, T, _ = Y.shape
    d = init.X_mean.shape[-1]
    if mask is not None:
        # The fused smoother itself is mask-agnostic (it solves whatever
        # D/b it is given), but keep the selection conservative and take
        # the XLA path under a mask (exactness over peak speed).
        fused = False
        mask = jnp.asarray(mask, Y.dtype)
        mask = mask * (1.0 - jnp.eye(n, dtype=Y.dtype)[:, :, None])
    if fused == "auto":
        # pallas_call is not GSPMD-partitioned: node-sharded inputs
        # (tame.parallel.shard_smoothed_inputs) take the XLA vmap path.
        try:
            multi_device = len(Y.sharding.device_set) > 1
        except Exception:
            multi_device = False
        fused = (fused_smoother_supported(n, T, d)
                 and not os.environ.get("TAME_DISABLE_FUSED_FIT")
                 and jax.default_backend() != "cpu"
                 and not multi_device)
    elif fused and not fused_smoother_supported(n, T, d):
        raise ValueError(f"fused smoother unsupported for n={n}, T={T}, "
                         f"d={d} (needs T >= 2, d <= 12, VMEM-sized tile)")
    return _fit_smoothed_impl(Y, params, init, jnp.asarray(max_iter),
                              jnp.asarray(learning_rate, Y.dtype),
                              jnp.asarray(tolerance, Y.dtype),
                              buf_size=buf, patience=patience,
                              corrected=corrected, fused=bool(fused),
                              mask=mask)


@functools.partial(jax.jit, static_argnames=("buf_size", "patience",
                                             "corrected", "fused"))
def _fit_smoothed_impl(Y, params, init, max_iter, lr, tol, *,
                       buf_size: int, patience: int,
                       corrected: bool,
                       fused: bool = False,
                       mask=None) -> SmoothedFitResult:
    n, _, T, _ = Y.shape
    d = init.X_mean.shape[-1]
    r = (d - 2) // 2
    # where (not multiplication): NaN-coded missing entries must not
    # poison the weights or diagnostics (cf. cavi._fit_cavi_impl).
    if mask is not None:
        Y = jnp.where(mask[..., None] > 0, Y, 0.0)
    obs = cavi.precompute_obs_constants(Y, params.R_inv)
    pri = cavi.precompute_priors(params)
    n_obs = (jnp.maximum(jnp.sum(mask), 1.0)
             if mask is not None else None)

    def cond(carry):
        state, it, prev, pat, conv, div, eh, mh = carry
        running = jnp.logical_not(jnp.logical_or(conv, div))
        return jnp.logical_and(it < max_iter, running)

    def body(carry):
        state, it, prev, pat, conv, div, eh, mh = carry
        state = smoothed_step(state, obs, pri, params, lr, corrected,
                              fused=fused, mask=mask)
        mu = dyad_ops.dyadic_mean_temporal(state.X_mean, r)
        elbo = smoothed_elbo(Y, params, pri, state, mu_dyadic=mu,
                             obs_mask=mask)
        if mask is None:
            mse = dyad_ops.masked_sq_error_temporal(Y, mu)
        else:
            e0 = (Y[..., 0] - mu[..., 0]) * mask
            mse = 2.0 * jnp.sum(e0 * e0) / n_obs
        eh = eh.at[it].set(elbo)
        mh = mh.at[it].set(mse)
        rel = jnp.abs(elbo - prev) / (jnp.abs(prev) + 1e-8)
        small = jnp.logical_and(it > 0, rel < tol)
        pat = jnp.where(small, pat + 1, 0)
        conv = pat >= patience
        div = jnp.logical_not(jnp.isfinite(elbo))
        return state, it + 1, elbo, pat, conv, div, eh, mh

    nanbuf = jnp.full((buf_size,), jnp.nan, Y.dtype)
    carry = (init, jnp.asarray(0), jnp.asarray(-jnp.inf, Y.dtype),
             jnp.asarray(0), jnp.asarray(False), jnp.asarray(False),
             nanbuf, nanbuf)
    state, it, _, _, conv, div, eh, mh = jax.lax.while_loop(cond, body,
                                                            carry)
    return SmoothedFitResult(state=state, elbo_history=eh, mse_history=mh,
                             n_iter=it, converged=conv, diverged=div)


class TemporalAMESmoothedVI:
    """Engine class for the smoothed (joint-trajectory) family.

    Same ``fit`` surface as the other engines; ``X_cov`` holds marginal
    covariances, ``X_cross`` the lag-1 cross-covariances.
    """

    structure = "smoothed"

    def __init__(self, model, learning_rate: float = 0.8,
                 init_scale: float = 0.1, seed: int = 42,
                 corrected: bool = True, mask=None):
        if model.Y is None:
            raise ValueError(
                "Model has no data. Call model.generate_data() first.")
        self.model = model
        self.Y = jnp.asarray(model.Y)
        self.n, self.T, self.d, self.r = (model.n, model.T, model.d,
                                          model.r)
        self.lr = learning_rate
        self.seed = seed
        self.corrected = corrected
        # Missing-data support: (n, n, T) dyad observation mask (shared
        # surface with the other engines; see cavi.fit_cavi).
        self.mask = None if mask is None else jnp.asarray(mask)
        self.params = model.params
        self.history = {"elbo": [], "reconstruction_error": []}
        st = init_smoothed_state(jax.random.PRNGKey(seed), self.n, self.T,
                                 self.d, init_scale)
        self._state = st

    @property
    def X_mean(self):
        return self._state.X_mean

    @property
    def X_cov(self):
        return self._state.X_cov

    @property
    def X_cross(self):
        return self._state.X_cross

    def fit(self, max_iter: int = 100, tolerance: float = 1e-4,
            verbose: bool = True, check_every: int = 10):
        import numpy as np

        result = jax.block_until_ready(fit_cavi_smoothed(
            self.Y, self.params, self._state, max_iter=max_iter,
            learning_rate=self.lr, tolerance=tolerance,
            corrected=self.corrected, mask=self.mask))
        self._state = result.state
        n_iter = int(result.n_iter)
        eh = np.asarray(result.elbo_history)[:n_iter]
        mh = np.asarray(result.mse_history)[:n_iter]
        self.history["elbo"].extend(float(v) for v in eh)
        self.history["reconstruction_error"].extend(float(v) for v in mh)
        if verbose:
            for it in range(n_iter):
                if it % check_every == 0 or it == n_iter - 1:
                    print(f"Iter {it:4d} | ELBO: {eh[it]:10.2f} | "
                          f"MSE: {mh[it]:.6f}")
        return self.history

    def get_variational_means(self):
        return self.X_mean

    def get_variational_covariances(self):
        return self.X_cov

    def predict_forward(self, n_steps: int = 1):
        """AR(1) forward forecast from the last smoothed state means
        (reference ``naive_mf.py:386-396``), via one ``lax.scan``."""
        Phi = self.params.Phi

        def step(x, _):
            x = x @ Phi.T
            return x, x

        _, preds = jax.lax.scan(step, self.X_mean[:, -1], None,
                                length=n_steps)
        return jnp.swapaxes(preds, 0, 1)  # (n, n_steps, d)

    def save_checkpoint(self, ckpt_dir) -> None:
        """Checkpoint the full smoothed-fit state (means, marginal and
        lag-1 cross covariances, logdets, history) for restart."""
        import numpy as np

        from tame.io import save_checkpoint

        save_checkpoint(ckpt_dir, {
            "X_mean": self._state.X_mean,
            "X_cov": self._state.X_cov,
            "X_cross": self._state.X_cross,
            "logdets": self._state.logdets,
            "history": {
                "elbo": np.asarray(self.history["elbo"]),
                "reconstruction_error": np.asarray(
                    self.history["reconstruction_error"]),
            },
            "structure": self.structure,
            "learning_rate": self.lr,
            "seed": self.seed,
        })

    def load_checkpoint(self, ckpt_dir) -> None:
        """Restore a checkpoint saved by :meth:`save_checkpoint`; a
        subsequent ``fit`` continues from the restored state."""
        import numpy as np

        from tame.io import load_checkpoint

        state = load_checkpoint(ckpt_dir)
        if state.get("structure", "smoothed") != "smoothed":
            raise ValueError(
                f"checkpoint structure '{state.get('structure')}' is not "
                "'smoothed'")
        self._state = SmoothedState(
            X_mean=jnp.asarray(state["X_mean"]),
            X_cov=jnp.asarray(state["X_cov"]),
            X_cross=jnp.asarray(state["X_cross"]),
            logdets=jnp.asarray(state["logdets"]))
        self.history = {
            "elbo": list(np.asarray(state["history"]["elbo"]).tolist()),
            "reconstruction_error": list(np.asarray(
                state["history"]["reconstruction_error"]).tolist()),
        }
