"""Hyperparameter learning: variational EM for the temporal AME family.

The reference treats every model hyperparameter — AR coefficient, process
noise, dyadic noise, prior covariances — as KNOWN: its engines only ever
infer the latent states, and its experiments set the hyperparameters to
the generating truth (`/root/reference/src/inference/*.py` take them from
the model object; nothing estimates them).  That works for synthetic
studies and fails for real data, where none of them are known.

``fit_em`` closes the gap with variational EM:

* **E-step** — the smoothed (joint-trajectory) engine
  (:func:`tame.inference.smoothed.fit_cavi_smoothed`): its per-node
  posteriors carry exact marginal covariances AND lag-1 cross-covariances,
  which is precisely the sufficient statistics the M-step needs (a
  mean-field E-step would bias the dynamics estimates toward zero
  autocorrelation).
* **M-step** — closed forms, no optimizer:

  - ``phi``: with the reference's ``Phi = phi * I`` parameterization, the
    maximizer of the expected transition log-likelihood is
    ``phi = tr(sum_t E[x_{t+1} x_t']) / tr(sum_t E[x_t x_t'])``
    (Kalman-EM / Shumway-Stoffer, scalar-constrained);
  - ``Q``: the expected transition residual second moment
    ``(1/n(T-1)) [Sxx' - Phi A' - A Phi' + Phi B Phi']`` (full SPD);
  - ``Sigma0``: ``(1/n) sum_i E[x_0 x_0']``;
  - ``R``: exchangeable 2x2 from plug-in dyadic residual statistics
    ``sigma^2 = mean(e^2)``, ``rho = mean(e_ij e_ji) / sigma^2`` over
    observed ordered pairs (the plug-in convention the whole framework's
    likelihood uses; masked fits restrict to observed dyads).

Every quantity is a reduction over posteriors already produced by the
compiled E-step — the M-step is O(n T d^2) einsum work.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from tame.inference.smoothed import (
    SmoothedState,
    fit_cavi_smoothed,
    init_smoothed_state,
    warm_init_smoothed_state,
)
from tame.models.params import AMEParams
from tame.ops import dyad as dyad_ops
from tame.ops.dyad import HIGHEST

LEARNABLE = ("phi", "Q", "Sigma0", "R")


class EMResult(NamedTuple):
    params: AMEParams
    state: SmoothedState
    history: Dict[str, List[float]]


def _sym(M: Array, jitter: float = 1e-8) -> Array:
    return 0.5 * (M + M.T) + jitter * jnp.eye(M.shape[0], dtype=M.dtype)


@jax.jit
def _transition_moments(state: SmoothedState
                        ) -> Tuple[Array, Array, Array, Array]:
    """Summed second moments over nodes and transitions.

    Returns ``(A, B, Sxx, S00)`` with
    ``A   = sum_{i,t} E[x_{t+1} x_t']``  (lag-1),
    ``B   = sum_{i,t} E[x_t x_t']``      (t = 0..T-2),
    ``Sxx = sum_{i,t} E[x_{t+1} x_{t+1}']`` (t = 1..T-1),
    ``S00 = sum_i E[x_0 x_0']``.
    ``state.X_cross[t] = Cov(x_t, x_{t+1})`` (tame.ops.tridiag), so
    ``E[x_{t+1} x_t'] = mu_{t+1} mu_t' + X_cross[t]'``.
    """
    mu, S, C = state.X_mean, state.X_cov, state.X_cross
    A = (jnp.einsum("ita,itb->ab", mu[:, 1:], mu[:, :-1],
                    precision=HIGHEST)
         + jnp.einsum("itab->ba", C))
    B = (jnp.einsum("ita,itb->ab", mu[:, :-1], mu[:, :-1],
                    precision=HIGHEST)
         + jnp.einsum("itab->ab", S[:, :-1]))
    Sxx = (jnp.einsum("ita,itb->ab", mu[:, 1:], mu[:, 1:],
                      precision=HIGHEST)
           + jnp.einsum("itab->ab", S[:, 1:]))
    S00 = (jnp.einsum("ia,ib->ab", mu[:, 0], mu[:, 0], precision=HIGHEST)
           + jnp.einsum("iab->ab", S[:, 0]))
    return A, B, Sxx, S00


@jax.jit
def _residual_moments(Y: Array, X_mean: Array,
                      mask: Optional[Array] = None
                      ) -> Tuple[Array, Array, Array]:
    """Plug-in dyadic residual statistics over observed ordered pairs:
    ``(sum e^2, sum e_ij e_ji, count)``."""
    n = Y.shape[0]
    r = (X_mean.shape[-1] - 2) // 2
    fwd = dyad_ops.dyadic_fwd_temporal(X_mean, r)
    m = (dyad_ops.offdiag_mask(n)[:, :, None] if mask is None
         else mask)
    # where (not multiplication): NaN-coded missing entries stay unread.
    e0 = jnp.where(m > 0, Y[..., 0] - fwd, 0.0)
    sq = jnp.sum(e0 * e0)
    cross = jnp.einsum("ijt,jit->", e0, e0, precision=HIGHEST)
    count = jnp.sum(m) * jnp.ones(())
    if mask is None:
        count = jnp.asarray(float(n * (n - 1) * Y.shape[2]))
    return sq, cross, count


@jax.jit
def _residual_moment_corrections(state: SmoothedState,
                                 m: Array) -> Tuple[Array, Array]:
    """Exact posterior-variance corrections to the plug-in residual
    statistics, making the R M-step the true ``E_q[(y - mu(X))^2]``.

    With independent per-node posteriors and ``mu_ij = a_i + b_j +
    U_i . V_j`` (EXACT for the bilinear Gaussian product, including the
    second-order term the delta method drops):

        var_q(mu_ij)        = J_i S_i J_i' + J_j S_j J_j'
                              + tr(S_i[UU] S_j[VV])
        cov_q(mu_ij, mu_ji) = K_i + K_j + tr(S_i[UV] S_j[UV])

    where ``J_i = [1, 0, V_j, 0]``, ``J_j = [0, 1, 0, U_i]`` and ``K_i =
    S_i[a,b] + S_i[a,V] . U_j + V_j . S_i[U,b] + V_j' S_i[U,V] U_j``.
    All pair sums reduce to eta-class contractions against r^2 outer-
    product (or covariance-block) panels.  ``m`` is the (n, n, T)
    observation mask (complete network: the off-diagonal mask).  Returns
    the masked pair sums ``(sum var_q, sum cov_q)`` over ordered pairs.
    Validated against Monte-Carlo sampling of the posteriors (tests).
    """
    mu, S = state.X_mean, state.X_cov
    n, T, d = mu.shape
    r = (d - 2) // 2
    _, _, U, V = dyad_ops.split_state(mu, r)
    cnt = m.sum(1)                                     # (n, T)

    A = S[..., 0, 0]
    Ar = S[..., 1, 1]
    B = S[..., 0, 2:2 + r]
    Br = S[..., 1, 2 + r:]
    C = S[..., 2:2 + r, 2:2 + r].reshape(n, T, r * r)
    Cr = S[..., 2 + r:, 2 + r:].reshape(n, T, r * r)
    VV = (V[..., :, None] * V[..., None, :]).reshape(n, T, r * r)
    UU = (U[..., :, None] * U[..., None, :]).reshape(n, T, r * r)

    def pair(Xi, Zj):
        return jnp.einsum("ijt,itk,jtk->", m, Xi, Zj, precision=HIGHEST)

    var_sum = (jnp.sum(cnt * (A + Ar))       # m symmetric: col sums = cnt
               + 2.0 * pair(B, V) + pair(C, VV)
               + 2.0 * pair(Br, U) + pair(Cr, UU)
               + pair(C, Cr))   # tr(S_i[UU] S_j[VV]); both symmetric

    Sab = S[..., 0, 1]
    SaV = S[..., 0, 2 + r:]
    SUb = S[..., 2:2 + r, 1]
    SUV = S[..., 2:2 + r, 2 + r:].reshape(n, T, r * r)
    VU = (V[..., :, None] * U[..., None, :]).reshape(n, T, r * r)
    SUV_T = jnp.swapaxes(
        S[..., 2:2 + r, 2 + r:], -1, -2).reshape(n, T, r * r)
    # K_i summed over ordered pairs, doubled for the symmetric K_j half;
    # the joint second-order term tr(M_i M_j) appears once per pair.
    cross_sum = (2.0 * (jnp.sum(cnt * Sab)
                        + pair(SaV, U) + pair(SUb, V) + pair(SUV, VU))
                 + pair(SUV, SUV_T))
    return var_sum, cross_sum


def _phi_groups(phi_structure: str, d: int):
    """Dimension groups sharing one AR rate.  ``"scalar"`` is the
    reference's ``Phi = phi I`` parity form (``temporal_ame.py:131-132``);
    ``"blocks"`` gives the additive effects [a, b] and the latent
    positions [U, V] separate rates; ``"diag"`` one rate per state
    dimension."""
    if phi_structure == "scalar":
        return [list(range(d))]
    if phi_structure == "blocks":
        return [[0, 1], list(range(2, d))]
    if phi_structure == "diag":
        return [[k] for k in range(d)]
    raise ValueError(f"unknown phi_structure {phi_structure!r}; choose "
                     "from 'scalar', 'blocks', 'diag'")


def em_update_params(params: AMEParams, Y: Array, state: SmoothedState,
                     *, learn: Sequence[str] = LEARNABLE,
                     mask: Optional[Array] = None,
                     phi_structure: str = "scalar",
                     r_structure: str = "exchangeable") -> AMEParams:
    """One closed-form M-step; returns updated :class:`AMEParams`.

    Fields not in ``learn`` keep their current values.  ``Sigma``/``Psi``
    report the corresponding blocks of the learned ``Sigma0``.

    ``phi_structure`` generalizes the AR map beyond the reference's
    ``Phi = phi I``: with dimension groups sharing one rate (see
    :func:`_phi_groups`), the expected transition log-likelihood is
    quadratic in the group rates and its maximizer solves the
    ``g x g`` linear system

        sum_h phi_h sum_{k in g, l in h} Q^-1[k,l] B[l,k]
            = sum_{k in g} (Q^-1 A)[k,k]

    (reduces to ``tr(Q^-1 A)/tr(Q^-1 B)`` for one group) — still fully
    closed-form.

    ``r_structure``: ``"exchangeable"`` learns the (sigma^2, rho) dyadic
    covariance; ``"diag"`` pins the reciprocity correlation at zero and
    learns the variance only.  A fully NON-exchangeable 2x2 R (unequal
    diagonal variances) is structurally excluded for this model: dyads
    are unordered node pairs, so relabeling nodes swaps the two
    components — any R that distinguishes them would make the likelihood
    depend on arbitrary node ordering.
    """
    unknown = set(learn) - set(LEARNABLE)
    if unknown:
        raise ValueError(f"unknown learnable(s) {sorted(unknown)}; "
                         f"choose from {LEARNABLE}")
    if r_structure not in ("exchangeable", "diag"):
        raise ValueError(f"unknown r_structure {r_structure!r}; choose "
                         "from 'exchangeable', 'diag'")
    n, T, d = state.X_mean.shape
    A, B, Sxx, S00 = _transition_moments(state)

    Phi, Q, Sigma0 = params.Phi, params.Q, params.Sigma0
    if "phi" in learn and T > 1:
        # Group-constrained maximizer UNDER THE CURRENT Q (coordinate
        # ascent: phi given Q, then Q given phi).  The Q^-1 weighting
        # matters — Q is learned as full SPD here.
        groups = _phi_groups(phi_structure, d)
        Q_inv = jnp.linalg.inv(Q)
        Z = jnp.zeros((d, len(groups)), A.dtype)
        for g, dims in enumerate(groups):
            Z = Z.at[jnp.asarray(dims), g].set(1.0)
        M = Q_inv * B.T                       # M[k,l] = Q^-1[k,l] B[l,k]
        G = Z.T @ M @ Z + 1e-12 * jnp.eye(len(groups), dtype=A.dtype)
        c = Z.T @ jnp.diagonal(Q_inv @ A)
        phi_vec = jnp.linalg.solve(G, c)
        Phi = jnp.diag(Z @ phi_vec)
    if "Q" in learn and T > 1:
        Qn = (Sxx - Phi @ A.T - A @ Phi.T + Phi @ B @ Phi.T) \
            / (n * (T - 1))
        Q = _sym(Qn, 1e-6)
    if "Sigma0" in learn:
        Sigma0 = _sym(S00 / n, 1e-6)
    R, R_inv = params.R, params.R_inv
    if "R" in learn:
        sq, cross, count = _residual_moments(Y, state.X_mean, mask)
        m = (mask if mask is not None
             else jnp.broadcast_to(
                 dyad_ops.offdiag_mask(n)[:, :, None], (n, n, T)))
        var_corr, cross_corr = _residual_moment_corrections(state, m)
        sigma2 = jnp.maximum((sq + var_corr) / count, 1e-8)
        if r_structure == "diag":
            rho = jnp.asarray(0.0, Y.dtype)
        else:
            rho = jnp.clip((cross + cross_corr) / count / sigma2,
                           -0.99, 0.99)
        off = rho * sigma2
        R = jnp.array([[sigma2, off], [off, sigma2]], dtype=Y.dtype)
        R_inv = jnp.linalg.inv(R)
    return AMEParams(Sigma=Sigma0[:2, :2], Psi=Sigma0[2:, 2:], R=R,
                     R_inv=R_inv, Phi=Phi, Q=Q, Sigma0=Sigma0)


def fit_em(Y: Array, params0: AMEParams, *,
           n_em: int = 15,
           inner_max_iter: int = 100,
           inner_tolerance: float = 1e-6,
           learning_rate: float = 0.5,
           learn: Sequence[str] = LEARNABLE,
           family: str = "gaussian",
           phi_structure: str = "scalar",
           r_structure: str = "exchangeable",
           mixed_precision: bool = False,
           diag_mode: str = "exact",
           mask: Optional[Array] = None,
           init: Optional[SmoothedState] = None,
           init_mode: str = "warm",
           seed: int = 0,
           em_tolerance: float = 1e-4,
           verbose: bool = False) -> EMResult:
    """Variational EM: alternate smoothed E-steps with closed-form
    M-steps until the learned scalars stabilize.

    ``params0`` is the starting guess (e.g. ``build_params(cfg)`` from a
    rough config); the E-step warm-starts from the previous posterior, so
    later EM iterations cost a handful of inner CAVI iterations.  Stops
    early when the relative change of every learned scalar summary
    (phi, tr Q, tr Sigma0, sigma^2, rho) drops below ``em_tolerance``.

    The default ``learning_rate=0.5`` keeps the inner damped fit stable
    across hyperparameter jumps; if an E-step nonetheless diverges or its
    final ELBO regresses markedly, the damping is halved and that EM
    iteration retried (up to 3 times) — a partial-E-step EM is only
    monotone when the inner solver actually improves its objective.

    ``mixed_precision``/``diag_mode`` are forwarded to the E-step
    (``fit_cavi_smoothed``) — the production fast path at scale.

    ``phi_structure``/``r_structure`` select the M-step parameterization
    (see :func:`em_update_params`): ``phi_structure="blocks"`` learns
    separate AR rates for the additive effects and the latent positions
    (the real-data case the reference's Phi = phi I cannot express);
    ``"diag"`` one rate per dimension.

    ``family`` selects the observation model: ``"gaussian"`` (default)
    uses the smoothed CAVI E-step; ``"bernoulli"``/``"poisson"`` use the
    corresponding smoothed non-Gaussian E-step
    (:func:`tame.inference.family_smoothed.fit_smoothed_family` — JJ
    bound / CVI, same joint-trajectory posteriors with exact lag-1
    cross-covariances).  The prior-side M-steps (phi, Q, Sigma0) depend
    only on those posterior moments and are likelihood-agnostic; the R
    M-step is Gaussian-specific (for non-Gaussian dyads the "noise" IS
    the likelihood), so ``"R"`` is dropped from ``learn`` automatically
    for those families.  ``mixed_precision``/``diag_mode``/``corrected``
    apply to the Gaussian E-step only.

    Returns :class:`EMResult`; ``history`` tracks ``elbo`` (final inner
    ELBO per EM iteration) and the learned scalars per iteration (for
    non-scalar ``phi_structure``, ``phi`` is the additive rate and
    ``phi_mult`` the last latent dimension's rate).
    """
    n, _, T, _ = Y.shape
    d = params0.d
    params = params0
    if isinstance(family, str):
        if family not in ("gaussian", "bernoulli", "poisson"):
            raise ValueError(f"unknown family {family!r}; choose from "
                             "('gaussian', 'bernoulli', 'poisson')")
    elif not hasattr(family, "vi_surrogate"):
        raise ValueError(
            "custom family must implement vi_surrogate (see "
            "tame.models.likelihoods) to serve as an EM E-step")
    if family != "gaussian":
        learn = tuple(k for k in learn if k != "R")
    if mask is not None:
        mask = jnp.asarray(mask, Y.dtype)
        mask = mask * (1.0 - jnp.eye(n, dtype=Y.dtype)[:, :, None])
    if init is not None:
        state = init
    elif family != "gaussian" and init_mode == "warm":
        from tame.inference.family_smoothed import (
            warm_init_smoothed_family,
        )

        state = warm_init_smoothed_family(Y, params0, family,
                                          obs_mask=mask)
    elif init_mode == "warm":
        # The data-driven warm start (closed-form two-way fit + top-r SVD
        # subspace, broadcast over T) is TEMPORALLY COHERENT: every time
        # step shares one rotation frame for U/V.  A random init is not —
        # at large n the data pins each time's positions up to rotation,
        # a partially-converged E-step leaves those rotations incoherent
        # across time, and the phi M-step (a lag-1 correlation through
        # the latent frames) is biased low.  Measured at n=2000: random
        # init learns phi ~ 0.48 for truth 0.8; warm init recovers it.
        state = warm_init_smoothed_state(Y, params0, obs_mask=mask)
    else:
        state = init_smoothed_state(jax.random.PRNGKey(seed), n, T, d,
                                    0.1)

    def scalars(p: AMEParams) -> Dict[str, float]:
        out = {
            "phi": float(p.Phi[0, 0]),
            "trQ": float(jnp.trace(p.Q)),
            "trSigma0": float(jnp.trace(p.Sigma0)),
            "sigma2": float(p.R[0, 0]),
            "rho": float(p.R[0, 1] / p.R[0, 0]),
        }
        if phi_structure != "scalar":
            out["phi_mult"] = float(p.Phi[-1, -1])
        return out

    history: Dict[str, List[float]] = {
        "elbo": [], "phi": [], "trQ": [], "trSigma0": [], "sigma2": [],
        "rho": []}
    if phi_structure != "scalar":
        history["phi_mult"] = []
    prev = scalars(params)
    prev_elbo = -np.inf
    for k in range(n_em):
        # Fresh damping each EM iteration: a backoff is a response to THIS
        # iteration's hyperparameters (a legitimate ELBO drop after an
        # M-step — e.g. R learned larger — must not permanently over-damp
        # every later E-step).
        lr = learning_rate
        for attempt in range(4):
            if family != "gaussian":
                from tame.inference.family_smoothed import (
                    fit_smoothed_family,
                )

                out = fit_smoothed_family(Y, params, state,
                                          family=family,
                                          max_iter=inner_max_iter,
                                          learning_rate=lr,
                                          tolerance=inner_tolerance,
                                          mask=mask)
            else:
                out = fit_cavi_smoothed(Y, params, state,
                                        max_iter=inner_max_iter,
                                        learning_rate=lr,
                                        tolerance=inner_tolerance,
                                        corrected=True,
                                        mixed_precision=mixed_precision,
                                        diag_mode=diag_mode, mask=mask)
            e = float(np.asarray(out.elbo_history)[int(out.n_iter) - 1])
            # An E-step that blew up or regressed hard signals the inner
            # solver oscillating at this damping; retry softer.  The
            # regression threshold is RELATIVE: near convergence the
            # ELBO fluctuates at reduction/bf16 noise scale (~1e-5 of
            # its magnitude at n=2000), which must not trigger backoffs.
            slack = max(1.0, 1e-4 * abs(prev_elbo))
            if (not bool(out.diverged) and np.isfinite(e)
                    and (e >= prev_elbo - slack or attempt == 3)):
                break
            lr *= 0.5
            if verbose:
                print(f"EM {k:3d} | E-step regressed "
                      f"({e:.1f} < {prev_elbo:.1f}); retrying with "
                      f"lr={lr:.3f}", flush=True)
        if bool(out.diverged) or not np.isfinite(e):
            # Every backoff attempt blew up: stop HERE with the last
            # finite state instead of running M-steps on NaN posteriors.
            if not history["elbo"]:
                raise RuntimeError(
                    "fit_em: the first E-step diverged even after "
                    "damping backoff — check the starting "
                    "hyperparameters (params0) and learning_rate")
            if verbose:
                print(f"EM {k:3d} | E-step diverged after backoff; "
                      "stopping with the last finite iterate",
                      flush=True)
            break
        prev_elbo = e
        state = out.state
        params = em_update_params(params, Y, state, learn=learn,
                                  mask=mask,
                                  phi_structure=phi_structure,
                                  r_structure=r_structure)
        cur = scalars(params)
        elbo = float(np.asarray(out.elbo_history)[int(out.n_iter) - 1])
        history["elbo"].append(elbo)
        for key, v in cur.items():
            history[key].append(v)
        if verbose:
            print(f"EM {k:3d} | ELBO {elbo:10.2f} | "
                  + " ".join(f"{key}={v:.4f}" for key, v in cur.items()),
                  flush=True)
        rel = max(abs(cur[key] - prev[key]) / (abs(prev[key]) + 1e-8)
                  for key in cur)
        prev = cur
        if k > 0 and rel < em_tolerance:
            break
    return EMResult(params=params, state=state, history=history)
