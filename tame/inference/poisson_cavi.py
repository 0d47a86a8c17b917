"""CAVI for COUNT dynamic networks via conjugate-computation VI.

Count ties ``y_ij ~ Poisson(exp(m_ij))`` with the bilinear predictor
``m_ij = a_i + b_j + U_i . V_j`` have no conjugate coordinate update —
the reference has nothing for count data at all
(`/root/reference/src/inference/naive_mf.py:114-132` hardcodes the
Gaussian dyad), and until this module the framework supported counts
sampler-only (``tame.models.likelihoods.PoissonDyadic`` + NUTS/SMC).

Unlike the Bernoulli case (``tame.inference.binary_cavi``, which needs
the Jaakkola-Jordan *bound*), the Poisson/log-link expected
log-likelihood under a Gaussian variational factor is EXACT in closed
form via the log-normal mean identity:

    E_q[y m - exp(m) - log y!] = y mu - exp(mu + v/2) - log y!

with ``mu = E_q[m_ij]`` and ``v = Var_q(m_ij)`` (the exact bilinear
variance, including the second-order ``tr(S_i[UU] S_j[VV])`` term).  So
the reported per-iteration objective is the TRUE ELBO, not a bound.

The coordinate update is conjugate-computation VI (Khan & Lin, AISTATS
2017): replace each dyad's expected log-likelihood ``f(mu, v)`` by the
quadratic surrogate whose mu/v-gradients match,

    g = df/dmu = y - w,      H = 2 df/dv = -w,   w = exp(mu + v/2)
    f~(m) = (y - w + w mu) m - (w/2) m^2 + const,

i.e. a Gaussian pseudo-observation with per-dyad precision ``w_ij`` —
at a fixed point of the damped iteration the mu- and v-stationarity of
the surrogate coincide with those of the exact ELBO (the Bonnet/Price
identities hold with equality here because E_q[exp(m)] is exact).
Under the surrogate the whole CAVI machinery applies with weighted
contractions, exactly the binary engine's structure with
``2 lam_ij -> w_ij`` and ``(y - 1/2) -> y - w + w mu``:

    sender side (from m_ij, touches [a, U]): counts/sums/Grams of
        w against [1 | V_j | V_j V_j'],
    receiver side (from m_ji, touches [b, V]): the transposed
        contractions against [1 | U_i | U_i U_i'].

Because ``w`` changes every iteration the per-iteration cost is
genuinely O(n^2 T r) (three observation-sized contractions); there is
no constant-weight precompute as in the Gaussian engine.  ``w`` is an
exponential of the predictor: its log is clamped (``_EXP_CLIP``) so a
transient over-shoot cannot overflow f32.

**Stability.** Unlike the JJ bound's ``lam <= 1/8``, the CVI weights
are UNBOUNDED, so the simultaneous (Jacobi) update's effective coupling
grows with the data scale and the plain damped iteration diverges on a
substantial fraction of realizations (measured: ~half of small-n seeds
at lr in [0.2, 0.7]).  The loop is therefore a GUARDED ascent: each
iteration evaluates the exact ELBO of the current iterate before
proposing the next one; if the iterate regressed below its own base
state (beyond a relative slack) or went non-finite, the step is
rejected — the loop reverts to the base state and retries with a
halved step scale, growing the scale back (x1.25, capped at 1) after
accepted steps.  The guard changes no fixed point (accepted steps are
exactly the CVI update) and costs one extra moment pass only on the
reverted iterations.  ``diverged`` is raised only when the scale
collapses below 1e-3 with the guard still rejecting.

Missing data: an ``(n, n, T)`` mask gates every sum through
``jnp.where`` applied BEFORE the contraction — NaN-coded missing
entries are never read, in primals or gradients.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

from tame.inference import cavi
from tame.inference.binary_cavi import (
    _predictor_moments,
    solve_direct,
    weighted_obs_terms,
)
from tame.models.params import AMEParams
from tame.ops import dyad as dyad_ops

# exp() clamp for the CVI weights: e^20 ~ 5e8 precision per dyad is far
# beyond any realistic rate yet comfortably inside f32; the clamp only
# binds on divergent transients.
_EXP_CLIP = 20.0


class PoissonFitResult(NamedTuple):
    X_mean: Array        # (n, T, d)
    X_cov: Array         # (n, T, d, d)
    elbo_history: Array  # (buf,) EXACT ELBO value (NaN past stopping)
    deviance_history: Array  # (buf,) mean plug-in Poisson deviance
    n_iter: Array
    converged: Array
    diverged: Array
    # Guarded-loop carry at exit: (proposal mean, proposal cov,
    # last accepted ELBO, step scale, patience count).  Feed back as
    # ``carry=result.resume_carry()`` of a follow-up call to continue a
    # fit in segments with BITWISE-identical behavior — the guarded
    # loop's full state includes the un-evaluated proposal, not just the
    # last accepted iterate.
    prop_mean: Array = jnp.nan
    prop_cov: Array = jnp.nan
    last_elbo: Array = jnp.nan
    step_scale: Array = 1.0
    pat_count: Array = 0

    def resume_carry(self):
        return (cavi.CaviState(X_mean=self.prop_mean,
                               X_cov=self.prop_cov),
                self.last_elbo, self.step_scale, self.pat_count)


def _evaluate(state: cavi.CaviState, y0: Array, logyfac: Array,
              offd: Array, pri: cavi.PriorMatrices,
              params: AMEParams) -> tuple:
    """Exact ELBO, plug-in mean deviance, and predictor moments of a
    variational state — the by-products the guarded loop needs before
    deciding whether to keep stepping from this state."""
    r = (state.X_mean.shape[-1] - 2) // 2
    m, var = _predictor_moments(state, r)
    w = jnp.exp(jnp.clip(m + 0.5 * var, -_EXP_CLIP, _EXP_CLIP)) * offd
    elbo = jnp.sum(offd * (y0 * m - logyfac) - w)
    prior0, priort = cavi.state_prior_terms(params, pri, state)
    elbo = elbo + prior0 + priort + cavi.gaussian_entropy(state)
    # plug-in mean deviance 2[y log(y/rate) - (y - rate)] at the
    # predictor mean (rate clamp shared with the weights)
    rate = jnp.exp(jnp.clip(m, -_EXP_CLIP, _EXP_CLIP))
    dev = 2.0 * jnp.sum(offd * (jax.scipy.special.xlogy(y0, y0)
                                - y0 * m - y0 + rate))
    dev = dev / jnp.maximum(jnp.sum(offd), 1.0)
    return elbo, dev, m, var


def _cvi_update(state: cavi.CaviState, y0: Array, offd: Array,
                pri: cavi.PriorMatrices, m: Array, var: Array,
                lr: Array) -> cavi.CaviState:
    """The damped CVI coordinate update given the state's predictor
    moments (``m``, ``var`` from :func:`_evaluate`)."""
    T = state.X_mean.shape[1]
    r = (state.X_mean.shape[-1] - 2) // 2
    w = jnp.exp(jnp.clip(m + 0.5 * var, -_EXP_CLIP, _EXP_CLIP)) * offd
    # surrogate coefficient on m: y - w + w mu (weighted_obs_terms then
    # subtracts the partner-offset pulls w b_j / w a_i).
    resid = (y0 - w + w * m) * offd
    P, eta = weighted_obs_terms(state.X_mean, r, w, resid,
                                cov=state.X_cov)
    P = P + cavi._prior_precision(pri, T)[None]
    eta = eta + cavi._prior_nat_param(pri, state.X_mean)

    mu_new, cov_new = solve_direct(P, eta)
    X_mean = lr * mu_new + (1.0 - lr) * state.X_mean
    X_cov = lr * cov_new + (1.0 - lr) * state.X_cov
    return cavi.CaviState(X_mean=X_mean, X_cov=X_cov)


def poisson_step(state: cavi.CaviState, y0: Array, logyfac: Array,
                 offd: Array, pri: cavi.PriorMatrices,
                 params: AMEParams, lr: Array) -> tuple:
    """One simultaneous (Jacobi) CVI coordinate update (unguarded).

    ``y0``: (n, n, T) count adjacency (y0[i, j] = count i -> j),
    pre-zeroed at the diagonal and masked entries; ``logyfac`` the
    matching precomputed ``log y!`` tensor; ``offd`` the observation
    gate.  Returns ``(new_state, elbo, deviance)`` — the ELBO and
    deviance are evaluated at the INCOMING state (free by-products of
    the update's moment computation).
    """
    elbo, dev, m, var = _evaluate(state, y0, logyfac, offd, pri, params)
    new = _cvi_update(state, y0, offd, pri, m, var, lr)
    return new, elbo, dev


def fit_cavi_poisson(Y: Array, params: AMEParams,
                     init: cavi.CaviState, *,
                     max_iter: int = 200, learning_rate=0.7,
                     tolerance=1e-5, patience: int = 3,
                     carry=None,
                     mask: Optional[Array] = None) -> PoissonFitResult:
    """Fit the CVI engine to a count network inside one compiled loop
    (tolerance/patience stopping on the exact ELBO, cf.
    ``cavi.fit_cavi``).

    ``Y``: the (n, n, T, 2) reciprocal layout produced by
    ``sample(..., family="poisson")`` /
    ``tame.models.likelihoods.PoissonDyadic`` (only component 0 — the
    full ordered adjacency — is read).  ``mask``: optional (n, n, T)
    observation gate (missing dyads are never read).

    ``carry``: a prior segment's ``PoissonFitResult.resume_carry()`` —
    continues a fit in segments with BITWISE-identical behavior (the
    guarded loop's carry includes the un-evaluated proposal and the
    step scale, so ``init`` must be that segment's ``X_mean``/``X_cov``
    and ``carry`` its proposal/bookkeeping).
    """
    buf = 64
    while buf < max_iter:
        buf *= 2
    if carry is None:
        prop, e0, scale0, pat0 = init, -jnp.inf, 1.0, 0
    else:
        prop, e0, scale0, pat0 = carry
    return _fit_poisson_impl(Y, params, init, prop,
                             jnp.asarray(max_iter),
                             jnp.asarray(learning_rate, jnp.float32),
                             jnp.asarray(tolerance, jnp.float32),
                             jnp.asarray(e0, jnp.float32),
                             jnp.asarray(scale0, jnp.float32),
                             jnp.asarray(pat0),
                             buf_size=buf, patience=patience, mask=mask)


@functools.partial(jax.jit, static_argnames=("buf_size", "patience"))
def _fit_poisson_impl(Y, params, init, prop0, max_iter, lr, tol,
                      carry_elbo, carry_scale, carry_pat, *,
                      buf_size: int, patience: int,
                      mask=None) -> PoissonFitResult:
    n, _, T, _ = Y.shape
    offd = jnp.broadcast_to(dyad_ops.offdiag_mask(n)[:, :, None],
                            (n, n, T))
    if mask is not None:
        offd = offd * jnp.asarray(mask, jnp.float32)
    # where (not multiplication): NaN-coded missing entries stay unread
    y0 = jnp.where(offd > 0, Y[..., 0], 0.0)
    logyfac = jax.lax.lgamma(y0 + 1.0)
    pri = cavi.precompute_priors(params)

    def cond(carry):
        (state, base, e_base, scale, it, pat, conv, div, eh, dh) = carry
        running = jnp.logical_not(jnp.logical_or(conv, div))
        return jnp.logical_and(it < max_iter, running)

    def body(carry):
        (state, base, e_base, scale, it, pat, conv, div, eh, dh) = carry
        # Evaluate the CURRENT iterate (the proposal made last iteration
        # from `base`); reject it if it regressed below its base beyond
        # the relative slack or went non-finite.
        elbo, dev, m, var = _evaluate(state, y0, logyfac, offd, pri,
                                      params)
        slack = 1e-4 * jnp.abs(e_base) + 1.0
        bad = jnp.logical_or(
            jnp.logical_not(jnp.isfinite(elbo)),
            jnp.logical_and(jnp.isfinite(e_base), elbo < e_base - slack))
        nxt = jax.tree_util.tree_map(
            lambda a_, b_: jnp.where(bad, b_, a_), state, base)
        e_nxt = jnp.where(bad, e_base, elbo)
        scale = jnp.where(bad, 0.5 * scale,
                          jnp.minimum(1.25 * scale, 1.0))
        # rejected iterate: its moments are stale — recompute for `base`
        m, var = jax.lax.cond(
            bad,
            lambda: _predictor_moments(nxt, (nxt.X_mean.shape[-1] - 2)
                                       // 2),
            lambda: (m, var))
        prop = _cvi_update(nxt, y0, offd, pri, m, var, lr * scale)

        eh = eh.at[it].set(e_nxt)
        dh = dh.at[it].set(jnp.where(bad, jnp.nan, dev))
        rel = jnp.abs(e_nxt - e_base) / (jnp.abs(e_base) + 1e-8)
        small = jnp.logical_and(jnp.isfinite(e_base), rel < tol)
        # a reverted iteration is not progress — never count it toward
        # the patience rule (e_nxt == e_base there would make rel = 0)
        pat = jnp.where(bad, pat, jnp.where(small, pat + 1, 0))
        conv = pat >= patience
        div = jnp.logical_and(bad, scale < 1e-3)
        return (prop, nxt, e_nxt, scale, it + 1, pat, conv, div, eh, dh)

    nanbuf = jnp.full((buf_size,), jnp.nan, jnp.float32)
    carry = (prop0, init, carry_elbo, carry_scale, jnp.asarray(0),
             carry_pat, jnp.asarray(False), jnp.asarray(False),
             nanbuf, nanbuf)
    out = jax.lax.while_loop(cond, body, carry)
    (prop, last, e_last, scale, it, pat, conv, div, eh, dh) = out
    return PoissonFitResult(X_mean=last.X_mean, X_cov=last.X_cov,
                            elbo_history=eh, deviance_history=dh,
                            n_iter=it, converged=conv, diverged=div,
                            prop_mean=prop.X_mean, prop_cov=prop.X_cov,
                            last_elbo=e_last, step_scale=scale,
                            pat_count=pat)


class TemporalAMEPoissonVI:
    """Engine class for count dynamic networks (CVI); same surface feel
    as the Gaussian engines — including segmented in-fit checkpointing
    with bitwise-identical resume (``checkpoint_every``/``resume``; the
    checkpoint carries the guarded loop's full state, proposal
    included).  ``model.Y`` must hold count data in the reciprocal
    layout (e.g. from ``sample_observations(..., family="poisson")``).
    """

    structure = "poisson"

    def __init__(self, model, learning_rate: float = 0.7,
                 init_scale: float = 0.1, seed: int = 42,
                 init_mode: str = "warm", mask=None):
        if model.Y is None:
            raise ValueError(
                "Model has no data. Call model.generate_data() first.")
        self.model = model
        self.Y = jnp.asarray(model.Y)
        self.n, self.T, self.d, self.r = (model.n, model.T, model.d,
                                          model.r)
        self.lr = learning_rate
        self.seed = seed
        self.mask = None if mask is None else jnp.asarray(mask)
        self.params = model.params
        self.history = {"elbo": [], "deviance": []}
        self._carry = None
        self._converged = False
        self._diverged = False
        if init_mode == "warm":
            # log-link linearization: log(y + 1/2) is a pseudo-Gaussian
            # observation of the predictor (the 1/2 shift keeps zero
            # counts finite, ~ the standard log(y + 0.5) variance-
            # stabilizing start for Poisson GLMs); the Gaussian
            # closed-form warm start then lands CVI inside the basin.
            st = cavi.warm_init_state(jnp.log(self.Y + 0.5), self.params,
                                      structure="full",
                                      obs_mask=self.mask)
        elif init_mode == "random":
            st = cavi.init_state(jax.random.PRNGKey(seed), self.n,
                                 self.T, self.d, "full", init_scale, 0.5)
        else:
            raise ValueError(f"unknown init_mode '{init_mode}'")
        self.X_mean = st.X_mean
        self.X_cov = st.X_cov

    def fit(self, max_iter: int = 200, tolerance: float = 1e-5,
            verbose: bool = True, check_every: int = 10,
            checkpoint_every=None, ckpt_dir=None, resume: bool = False):
        """Run guarded CVI to convergence.

        ``checkpoint_every``/``ckpt_dir``/``resume`` mirror the other
        engines: segments + async checkpoints; the carry (including the
        guarded loop's proposal and step scale) threads through segments
        so a segmented (or killed-and-resumed) fit is BITWISE identical
        to the uninterrupted one.
        """
        import numpy as np

        if resume:
            if ckpt_dir is None:
                raise ValueError("resume=True requires ckpt_dir")
            import os

            if os.path.exists(os.fspath(ckpt_dir)):
                self.load_checkpoint(ckpt_dir)

        done = len(self.history["elbo"])
        budget = max_iter - done if resume else max_iter
        if budget <= 0:
            return self.history
        segment = checkpoint_every or budget
        if not (resume and done > 0):
            self._carry = None
            self._converged = False
            self._diverged = False
        seg_start = done
        ckptr = None
        if checkpoint_every and ckpt_dir is not None:
            from tame.io.async_ckpt import AsyncCheckpointer

            ckptr = AsyncCheckpointer()
        while budget > 0 and not (self._converged or self._diverged):
            seg = min(segment, budget)
            out = jax.block_until_ready(fit_cavi_poisson(
                self.Y, self.params,
                cavi.CaviState(X_mean=self.X_mean, X_cov=self.X_cov),
                max_iter=seg, learning_rate=self.lr,
                tolerance=tolerance, mask=self.mask,
                carry=self._carry))
            self.X_mean, self.X_cov = out.X_mean, out.X_cov
            k = int(out.n_iter)
            eh = np.asarray(out.elbo_history)[:k]
            dh = np.asarray(out.deviance_history)[:k]
            self.history["elbo"].extend(float(v) for v in eh)
            self.history["deviance"].extend(float(v) for v in dh)
            self._converged = bool(out.converged)
            self._diverged = bool(out.diverged)
            self._carry = out.resume_carry()
            budget -= k
            if checkpoint_every:
                if ckptr is not None:
                    ckptr.save(ckpt_dir, self._checkpoint_state())
                if verbose and k:
                    total = len(self.history["elbo"])
                    print(f"Iter {total - 1:4d} | elbo: {eh[-1]:10.2f} "
                          f"| deviance: {dh[-1]:.4f}"
                          + (" | checkpointed" if ckpt_dir else ""),
                          flush=True)
        if ckptr is not None:
            ckptr.wait()

        if verbose and not checkpoint_every:
            eh_all = self.history["elbo"]
            dh_all = self.history["deviance"]
            n_total = len(eh_all)
            for it in range(seg_start, n_total):
                if (it - seg_start) % check_every == 0 \
                        or it == n_total - 1:
                    print(f"Iter {it:4d} | elbo: {eh_all[it]:10.2f} | "
                          f"deviance: {dh_all[it]:.4f}")
        return self.history

    def _checkpoint_state(self):
        import numpy as np

        carry = self._carry
        state = {
            "X_mean": self.X_mean,
            "X_cov": self.X_cov,
            "history": {
                "elbo": np.asarray(self.history["elbo"]),
                "deviance": np.asarray(self.history["deviance"]),
            },
            "structure": self.structure,
            "learning_rate": self.lr,
            "seed": self.seed,
            "converged": bool(self._converged),
            "diverged": bool(self._diverged),
        }
        if carry is not None:
            prop, e, scale, pat = carry
            state.update(prop_mean=prop.X_mean, prop_cov=prop.X_cov,
                         carry_elbo=float(e), carry_scale=float(scale),
                         carry_pat=int(pat))
        return state

    def save_checkpoint(self, ckpt_dir) -> None:
        """Checkpoint the full fit state (variational parameters,
        guarded-loop carry, history) for restart."""
        from tame.io import save_checkpoint

        save_checkpoint(ckpt_dir, self._checkpoint_state())

    def load_checkpoint(self, ckpt_dir) -> None:
        """Restore a checkpoint saved by :meth:`save_checkpoint`; a
        subsequent ``fit`` continues from the restored state."""
        import numpy as np

        from tame.io import load_checkpoint

        state = load_checkpoint(ckpt_dir)
        if state.get("structure", "poisson") != "poisson":
            raise ValueError(
                f"checkpoint structure '{state.get('structure')}' is "
                "not 'poisson'")
        self.X_mean = jnp.asarray(state["X_mean"])
        self.X_cov = jnp.asarray(state["X_cov"])
        self.history = {
            "elbo": list(np.asarray(state["history"]["elbo"]).tolist()),
            "deviance": list(np.asarray(
                state["history"]["deviance"]).tolist()),
        }
        if "prop_mean" in state:
            self._carry = (cavi.CaviState(
                X_mean=jnp.asarray(state["prop_mean"]),
                X_cov=jnp.asarray(state["prop_cov"])),
                state["carry_elbo"], state["carry_scale"],
                int(state["carry_pat"]))
        else:
            self._carry = None
        self._converged = bool(state.get("converged", False))
        self._diverged = bool(state.get("diverged", False))

    def predict_rate(self) -> Array:
        """Posterior-mean count rates E_q[exp(m_ij)] (n, n, T) — the
        exact log-normal mean, not the plug-in exp of the mean."""
        state = cavi.CaviState(X_mean=self.X_mean, X_cov=self.X_cov)
        m, var = _predictor_moments(state, self.r)
        return jnp.exp(jnp.clip(m + 0.5 * var, -_EXP_CLIP, _EXP_CLIP))

    def predict_forward(self, n_steps: int = 1) -> Array:
        """AR(1) forward forecast of the latent means (n, n_steps, d)
        from the last fitted time step (cf. the Gaussian engines /
        reference ``naive_mf.py:386-396``)."""
        Phi = self.params.Phi

        def step(x, _):
            x = x @ Phi.T
            return x, x

        _, preds = jax.lax.scan(step, self.X_mean[:, -1], None,
                                length=n_steps)
        return jnp.swapaxes(preds, 0, 1)

    def predict_rate_forward(self, n_steps: int = 1) -> Array:
        """Forecast count rates (n, n, n_steps): the plug-in exp of
        the AR(1)-propagated predictor."""
        Xf = self.predict_forward(n_steps)
        m = dyad_ops.dyadic_fwd_temporal(Xf, self.r)
        return jnp.exp(jnp.clip(m, -_EXP_CLIP, _EXP_CLIP))

    def get_variational_means(self) -> Array:
        return self.X_mean

    def get_variational_covariances(self) -> Array:
        return self.X_cov
