"""Whole-fit Pallas megakernel: the entire damped-CAVI loop in ONE kernel.

At demo-scale configs (n ~ 15) the XLA fit loop is dominated by per-op
dispatch, not FLOPs: one Jacobi iteration is ~25 HLO kernels of a few
microseconds each (~25 us/iteration measured on v5e), while the same math
expressed as straight-line VPU code costs well under half a microsecond of
issue time.  This kernel keeps the entire variational state in VMEM and runs
ALL iterations of the fit — coordinate update, exact-residual diagnostics,
ELBO, convergence/divergence bookkeeping — inside one ``pallas_call``
with an internal ``fori_loop``, eliminating every per-iteration dispatch.

Scope (checked by :func:`fused_fit_supported`):

* all three covariance-structure policies — ``"full"`` (Good SMF),
  ``"diag"`` (Naive MF: full-precision mean solve, ``1/diag(P)``
  variances, reference ``naive_mf.py:266-274``), ``"block"`` (Bad SMF:
  invert, zero the additive x multiplicative cross blocks post-inversion,
  reference ``structured_mf.py:267-279``);
* ``update_mode="jacobi"`` (one simultaneous phase) AND
  ``update_mode="block"`` (the engine default: ``num_blocks`` sequential
  node-group phases per iteration, each phase re-reading the freshest
  global sufficient statistics — the in-kernel analog of
  ``cavi.cavi_step_block``, realized as dynamic sublane slices of the
  ``(n, T)`` state planes);
* ``diag_mode="exact"``, ``elbo_every=1``, float32;
* ``corrected`` False (reference-parity natural parameter, SURVEY.md
  §2C-4) or True (exact update) — both supported;
* problem small enough that all per-fit tensors fit in VMEM (the kernel
  raises the scoped-VMEM limit to 64 MB, cf. ``fused_smoother``; the
  supported envelope reaches n ~ 100 at demo-scale T).

Semantics match :func:`tame.inference.cavi.fit_cavi` exactly, with one
deliberate difference in *work scheduling*: there is no early loop exit —
after convergence/divergence the state and histories freeze (the damping
factor is masked to zero), so results are identical to the early-exiting
XLA path while the kernel always runs ``max_iter`` internal iterations.
The returned ``n_iter``/``converged``/``diverged``/histories are
bit-compatible in meaning with ``FitResult``.

Data layout: every per-(node, time) scalar lives as an ``(n, T)`` plane
(nodes on sublanes, time on lanes), so

* sums over nodes (the global sufficient statistics of
  ``cavi._obs_precision``) are sublane reductions,
* the AR(1) neighbor coupling is a lane roll + mask,
* the d x d Cholesky solve/inverse unrolls over the static ``d`` with every
  scalar step one VPU op across all (n, T) factors at once — the plane
  analog of ``tame.ops.cholesky``,
* the exact-residual diagnostics build the (n^2, T) forward and transposed
  dyad means from repeat/tile combinations of the planes (no transposes:
  ``m^T`` is re-derived by swapping the repeat/tile roles).

Reference semantics covered here (for the parity audit): coordinate update
``naive_mf.py:207-282`` / ``structured_mf.py:220-287`` via the
sufficient-statistics form of ``tame/inference/cavi.py``; ELBO terms
``naive_mf.py:114-191`` + trace correction ``structured_mf.py:141-148``;
convergence rule ``base.py:170-203``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG2PI = 1.8378770664093453

# VMEM budget for auto-selection: padded resident tensors must stay under
# the raised 64 MB scoped-VMEM limit with room for the (n^2, T)
# diagnostics intermediates (~4 more observation-sized temporaries; the
# fused_smoother proved the raised scoped limit on real hardware).
_VMEM_BUDGET_BYTES = 36 * 1024 * 1024
_VMEM_LIMIT_BYTES = 64 * 1024 * 1024


def _pad(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fused_fit_supported(n: int, T: int, d: int, *, structure: str,
                        update_mode: str, diag_mode: str,
                        mixed_precision: bool, elbo_every: int,
                        num_blocks: int | None = None) -> bool:
    """Whether the megakernel covers this fit configuration and size."""
    if (structure not in ("full", "diag", "block")
            or update_mode not in ("jacobi", "block")
            or diag_mode != "exact" or mixed_precision or elbo_every != 1):
        return False
    if update_mode == "block" and (num_blocks is None
                                   or n % num_blocks != 0):
        return False
    if d > 12:  # unrolled Cholesky code size ~ O(d^3)
        return False
    npad, tpad = _pad(n, 8), _pad(T, 128)
    n2pad = _pad(n * n, 8)
    resident = (2 * n * npad * tpad          # W0, W1 (n, n, T)
                + 3 * n2pad * tpad           # y0, y0^T, mask (n^2, T)
                + 2 * (2 + d + d * d) * npad * tpad)  # state in+out
    return resident * 4 < _VMEM_BUDGET_BYTES


def _plane_chol_solve(P, eta, d):
    """Cholesky factor + solve on d x d systems whose entries are (n, T)
    planes.  ``P``/``eta`` are lists (of lists) of plane values; every line
    is one VPU op across all (node, time) factors (cf. the lane-batched
    version in ``tame/ops/cholesky.py``)."""
    L = [[None] * d for _ in range(d)]
    inv_diag = [None] * d
    for k in range(d):
        acc = P[k][k]
        for m in range(k):
            acc = acc - L[k][m] * L[k][m]
        L[k][k] = jnp.sqrt(acc)
        inv_diag[k] = 1.0 / L[k][k]
        for i in range(k + 1, d):
            a2 = P[i][k]
            for m in range(k):
                a2 = a2 - L[i][m] * L[k][m]
            L[i][k] = a2 * inv_diag[k]

    def solve(rhs):
        y = [None] * d
        for i in range(d):
            acc = rhs[i]
            for m in range(i):
                acc = acc - L[i][m] * y[m]
            y[i] = acc * inv_diag[i]
        x = [None] * d
        for i in reversed(range(d)):
            acc = y[i]
            for m in range(i + 1, d):
                acc = acc - L[m][i] * x[m]
            x[i] = acc * inv_diag[i]
        return x

    return solve, eta and solve(eta)


def _plane_logdet(C, d, jitter=0.0):
    """Sum of log-determinants of d x d SPD matrices of (n, T) planes."""
    L = [[None] * d for _ in range(d)]
    inv_diag = [None] * d
    acc_logdet = None
    for k in range(d):
        acc = C[k][k] + jitter
        for m in range(k):
            acc = acc - L[k][m] * L[k][m]
        term = jnp.log(acc)
        acc_logdet = term if acc_logdet is None else acc_logdet + term
        L[k][k] = jnp.sqrt(acc)
        inv_diag[k] = 1.0 / L[k][k]
        for i in range(k + 1, d):
            a2 = C[i][k]
            for m in range(k):
                a2 = a2 - L[i][m] * L[k][m]
            L[i][k] = a2 * inv_diag[k]
    return acc_logdet


def _fused_fit_kernel(iters_ref, scal_ref, pri_ref,
                      W0_ref, W1_ref, eta_a_ref, eta_b_ref,
                      y0f_ref, y0Tf_ref, maskf_ref,
                      Xm0_ref, Xc0_ref,
                      Xm_ref, Xc_ref, eh_ref, mh_ref, stats_ref,
                      *, n: int, T: int, r: int, patience: int,
                      corrected: bool, structure: str,
                      num_blocks: int = 1):
    d = 2 + 2 * r
    f32 = jnp.float32
    bs = n // num_blocks

    max_iter = iters_ref[0, 0]
    carry_pat0 = iters_ref[0, 1]
    lr0 = scal_ref[0, 0]
    tol = scal_ref[0, 1]
    p = scal_ref[0, 2]
    q = scal_ref[0, 3]
    ldR = scal_ref[0, 4]
    ldS0 = scal_ref[0, 5]
    ldQ = scal_ref[0, 6]
    carry_elbo0 = scal_ref[0, 7]

    # pri_ref packs (5, d, d): Sigma0_inv, Q_inv, Qinv_Phi, Phi'Q^-1 Phi, Phi
    def S0inv(i, j):
        return pri_ref[0, i, j]

    def Qinv(i, j):
        return pri_ref[1, i, j]

    def QP(i, j):
        return pri_ref[2, i, j]

    def PtQP(i, j):
        return pri_ref[3, i, j]

    def Phi(i, j):
        return pri_ref[4, i, j]

    # Init state + NaN histories.
    Xm_ref[:] = Xm0_ref[:]
    Xc_ref[:] = Xc0_ref[:]
    eh_ref[:] = jnp.full_like(eh_ref[:], jnp.nan)
    mh_ref[:] = jnp.full_like(mh_ref[:], jnp.nan)

    # Time masks: (1, T) planes broadcasting over any node-block height.
    tt = jax.lax.broadcasted_iota(jnp.int32, (1, T), dimension=1)
    m0 = (tt == 0).astype(f32)
    mprev = (tt > 0).astype(f32)
    mnext = (tt < T - 1).astype(f32)
    cscale = jnp.float32(n - 1)

    def rep_nodes(x):
        """(n, T) -> (n^2, T) with row i*n+j = x[i] (the 'self' index)."""
        return jnp.repeat(x, n, axis=0)

    def tile_nodes(x):
        """(n, T) -> (n^2, T) with row i*n+j = x[j] (the 'other' index)."""
        return jnp.concatenate([x] * n, axis=0)

    def w_row(ref, i):
        """Row i of a (n, n, T) weight ref as its (n, T) plane; ``i`` may
        be a static int (jacobi) or a traced index (block phases)."""
        if isinstance(i, int):
            return ref[i]
        return ref[pl.ds(i, 1)][0]

    n_dyads = jnp.float32(n * (n - 1) // 2 * T)
    mse_denom = jnp.float32(n * (n - 1) * T)

    def phase_update(start, lr):
        """Closed-form damped update of the ``bs`` nodes starting at row
        ``start``, reading the freshest global state (the in-kernel analog
        of ``cavi.cavi_step_block``; ``num_blocks=1``/``start=0`` is
        exactly the Jacobi step)."""
        sl = pl.ds(start, bs)
        af = Xm_ref[0]                      # full (n, T) planes
        bf = Xm_ref[1]
        Uf = [Xm_ref[2 + k] for k in range(r)]
        Vf = [Xm_ref[2 + r + k] for k in range(r)]
        ab = Xm_ref[0, sl]                  # this block's (bs, T) rows
        bb = Xm_ref[1, sl]
        Ub = [Xm_ref[2 + k, sl] for k in range(r)]
        Vb = [Xm_ref[2 + r + k, sl] for k in range(r)]

        # ---- global sufficient statistics (sublane reductions) ----------
        def gsum(x):
            return jnp.sum(x, axis=0, keepdims=True)  # (1, T)

        sU = [gsum(Uf[k]) - Ub[k] for k in range(r)]     # (bs, T), minus self
        sV = [gsum(Vf[k]) - Vb[k] for k in range(r)]
        GUU = [[gsum(Uf[k] * Uf[l]) - Ub[k] * Ub[l] for l in range(r)]
               for k in range(r)]
        GVV = [[gsum(Vf[k] * Vf[l]) - Vb[k] * Vb[l] for l in range(r)]
               for k in range(r)]
        GVU = [[gsum(Vf[k] * Uf[l]) - Vb[k] * Ub[l] for l in range(r)]
               for k in range(r)]

        # ---- observation + prior precision (cavi._obs_precision) --------
        P = [[None] * d for _ in range(d)]
        P[0][0] = p * cscale
        P[1][1] = p * cscale
        P[0][1] = P[1][0] = q * cscale
        for k in range(r):
            P[0][2 + k] = P[2 + k][0] = p * sV[k]
            P[0][2 + r + k] = P[2 + r + k][0] = q * sU[k]
            P[1][2 + k] = P[2 + k][1] = q * sV[k]
            P[1][2 + r + k] = P[2 + r + k][1] = p * sU[k]
            for l in range(r):
                P[2 + k][2 + l] = p * GVV[k][l]
                P[2 + r + k][2 + r + l] = p * GUU[k][l]
                P[2 + k][2 + r + l] = P[2 + r + l][2 + k] = q * GVU[k][l]
        # prior precision terms (cavi._prior_precision): time-masked scalars
        zero_blk = jnp.zeros((bs, T), f32)
        for i in range(d):
            for j in range(d):
                pr = m0 * S0inv(i, j) + mprev * Qinv(i, j) + mnext * PtQP(i, j)
                P[i][j] = pr if P[i][j] is None else P[i][j] + pr

        # ---- natural parameter (cavi._obs_nat_param) ---------------------
        etaU = [[None] * bs for _ in range(r)]
        etaV = [[None] * bs for _ in range(r)]
        for ii in range(bs):
            i = ii if (isinstance(start, int) and start == 0) else start + ii
            w0i = w_row(W0_ref, i)    # (n, T) plane: W0[i, j, t] over j
            w1i = w_row(W1_ref, i)
            for k in range(r):
                etaU[k][ii] = jnp.sum(w0i * Vf[k], axis=0, keepdims=True)
                etaV[k][ii] = jnp.sum(w1i * Uf[k], axis=0, keepdims=True)
        eta = [None] * d
        eta[0] = eta_a_ref[sl]
        eta[1] = eta_b_ref[sl]
        for k in range(r):
            eta[2 + k] = jnp.concatenate(etaU[k], axis=0)
            eta[2 + r + k] = jnp.concatenate(etaV[k], axis=0)
        if corrected:
            cpl = p * bf + q * af
            dpl = q * bf + p * af
            cpl_b = p * bb + q * ab
            dpl_b = q * bb + p * ab
            eta[0] = eta[0] - (gsum(cpl) - cpl_b)
            eta[1] = eta[1] - (gsum(dpl) - dpl_b)
            for k in range(r):
                eta[2 + k] = eta[2 + k] - (gsum(cpl * Vf[k])
                                           - cpl_b * Vb[k])
                eta[2 + r + k] = eta[2 + r + k] - (gsum(dpl * Uf[k])
                                                   - dpl_b * Ub[k])
        # prior coupling (cavi._prior_nat_param): lane roll + mask on the
        # block's own rows (the roll is per-row, so slicing commutes)
        mu_prev = [jnp.roll(Xm_ref[c, sl], 1, axis=1) for c in range(d)]
        mu_next = [jnp.roll(Xm_ref[c, sl], -1, axis=1) for c in range(d)]
        for i in range(d):
            acc_p = zero_blk
            acc_n = zero_blk
            for j in range(d):
                acc_p = acc_p + QP(i, j) * mu_prev[j]
                acc_n = acc_n + QP(j, i) * mu_next[j]
            eta[i] = eta[i] + mprev * acc_p + mnext * acc_n

        # ---- solve + structure policy (cavi._SOLVERS) ---------------------
        if structure == "diag":
            # Naive MF: full-precision mean solve, diagonal variances
            # 1/(diag(P)+1e-8) (cavi._solve_diag, naive_mf.py:266-274).
            _, mu_new = _plane_chol_solve(P, eta, d)
            covf = [[1.0 / (P[i][i] + 1e-8) if i == j else zero_blk
                     for j in range(d)] for i in range(d)]
        else:
            solve, _ = _plane_chol_solve(P, None, d)
            cov_raw = [[None] * d for _ in range(d)]
            for j in range(d):
                rhs = [jnp.full((bs, T), 1.0 if i == j else 0.0, f32)
                       for i in range(d)]
                col = solve(rhs)
                for i in range(d):
                    cov_raw[i][j] = col[i]
            if structure == "block":
                # Bad SMF: zero the additive x multiplicative cross blocks
                # POST-inversion (cavi._solve_block,
                # structured_mf.py:267-279).
                cov_raw = [[zero_blk
                            if (i < 2) != (j < 2) else cov_raw[i][j]
                            for j in range(d)] for i in range(d)]
            covf = [[0.5 * (cov_raw[i][j] + cov_raw[j][i])
                     + (1e-6 if i == j else 0.0)
                     for j in range(d)] for i in range(d)]
            mu_new = [sum(covf[i][j] * eta[j] for j in range(d))
                      for i in range(d)]

        # ---- damped write-back (masked to freeze after stop) --------------
        for c in range(d):
            Xm_ref[c, sl] = lr * mu_new[c] + (1.0 - lr) * Xm_ref[c, sl]
        for i in range(d):
            for j in range(d):
                Xc_ref[i, j, sl] = (lr * covf[i][j]
                                    + (1.0 - lr) * Xc_ref[i, j, sl])

    def body(it, carry):
        prev_elbo, pat, conv, div, n_done = carry
        running = jnp.logical_not(jnp.logical_or(conv, div))
        lr = lr0 * running.astype(f32)

        if num_blocks == 1:
            phase_update(0, lr)
        else:
            def run_phase(blk, _):
                phase_update(blk * bs, lr)
                return 0

            jax.lax.fori_loop(0, num_blocks, run_phase, 0)

        zero_plane = jnp.zeros((n, T), f32)

        # ---- exact-residual diagnostics ----------------------------------
        a = Xm_ref[0]
        b = Xm_ref[1]
        U = [Xm_ref[2 + k] for k in range(r)]
        V = [Xm_ref[2 + r + k] for k in range(r)]
        m_fwd = rep_nodes(a) + tile_nodes(b)
        m_bwd = tile_nodes(a) + rep_nodes(b)
        for k in range(r):
            m_fwd = m_fwd + rep_nodes(U[k]) * tile_nodes(V[k])
            m_bwd = m_bwd + tile_nodes(U[k]) * rep_nodes(V[k])
        e0 = (y0f_ref[:] - m_fwd) * maskf_ref[:]
        e0T = (y0Tf_ref[:] - m_bwd) * maskf_ref[:]
        sq = jnp.sum(e0 * e0)
        cross = jnp.sum(e0 * e0T)
        quad_sum = p * sq + q * cross
        log_lik = -0.5 * (quad_sum + n_dyads * (ldR + 2.0 * _LOG2PI))
        if structure in ("full", "block"):
            # structured trace correction (structured_mf.py:141-148):
            # 0.1 * tr(R^-1)/d * (n-1) * sum tr(cov); tr(R^-1) = 2p.
            tr_cov = sum(Xc_ref[c, c] for c in range(d))      # (n, T)
            log_lik = log_lik - 0.5 * (0.1 * (2.0 * p) / d * (n - 1)
                                       * jnp.sum(tr_cov))
        # initial prior
        quad0 = zero_plane
        trace0 = zero_plane
        for i in range(d):
            for j in range(d):
                quad0 = quad0 + S0inv(i, j) * Xm_ref[i] * Xm_ref[j]
                trace0 = trace0 + S0inv(i, j) * Xc_ref[j, i]
        prior0 = -0.5 * (jnp.sum((quad0 + trace0) * m0)
                         + n * (ldS0 + d * _LOG2PI))
        # transitions (roll of the UPDATED means, unlike the pre-update
        # mu_prev used by the natural parameter above)
        mu_prev_new = [jnp.roll(Xm_ref[c], 1, axis=1) for c in range(d)]
        residt = []
        for i in range(d):
            acc = Xm_ref[i]
            for j in range(d):
                acc = acc - Phi(i, j) * mu_prev_new[j]
            residt.append(acc * mprev)
        quadt = zero_plane
        tracet = zero_plane
        for i in range(d):
            for j in range(d):
                quadt = quadt + Qinv(i, j) * residt[i] * residt[j]
                tracet = tracet + Qinv(i, j) * Xc_ref[j, i] * mprev
        priort = -0.5 * (jnp.sum(quadt + tracet)
                         + n * (T - 1) * (ldQ + d * _LOG2PI))
        # entropy
        if structure == "diag":
            logdets = sum(jnp.log(Xc_ref[c, c]) for c in range(d))
        else:
            C = [[Xc_ref[i, j] for j in range(d)] for i in range(d)]
            logdets = _plane_logdet(C, d)
        entropy = 0.5 * (jnp.sum(logdets) + n * T * d * (1.0 + _LOG2PI))

        elbo = log_lik + prior0 + priort + entropy
        mse = 2.0 * sq / mse_denom

        # ---- history + convergence bookkeeping (base.py:170-203) ---------
        nan = jnp.float32(jnp.nan)
        eh_ref[pl.ds(it, 1), :] = jnp.where(running, elbo, nan)[None, None]
        mh_ref[pl.ds(it, 1), :] = jnp.where(running, mse, nan)[None, None]
        rel = jnp.abs(elbo - prev_elbo) / (jnp.abs(prev_elbo) + 1e-8)
        # finite prev_elbo == "have a previous evaluation" (fresh fits
        # start from -inf; segmented fits from the carry) — matches
        # cavi._fit_cavi_impl for bitwise segment continuity.
        small = jnp.logical_and(jnp.isfinite(prev_elbo), rel < tol)
        pat_new = jnp.where(small, pat + 1, 0)
        conv_new = pat_new >= patience
        div_new = jnp.logical_not(jnp.isfinite(elbo))
        return (jnp.where(running, elbo, prev_elbo),
                jnp.where(running, pat_new, pat),
                jnp.logical_or(conv, jnp.logical_and(running, conv_new)),
                jnp.logical_or(div, jnp.logical_and(running, div_new)),
                n_done + running.astype(jnp.int32))

    init = (carry_elbo0, carry_pat0,
            jnp.bool_(False), jnp.bool_(False), jnp.int32(0))
    last, pat, conv, div, n_done = jax.lax.fori_loop(0, max_iter, body,
                                                     init)
    stats_ref[0, 0] = n_done.astype(f32)
    stats_ref[0, 1] = conv.astype(f32)
    stats_ref[0, 2] = div.astype(f32)
    stats_ref[0, 3] = pat.astype(f32)
    stats_ref[0, 4] = last


class FusedFitOut(NamedTuple):
    X_mean: Array        # (n, T, d)
    X_cov: Array         # (n, T, d, d)
    elbo_history: Array  # (buf,)
    mse_history: Array   # (buf,)
    n_iter: Array
    converged: Array
    diverged: Array
    last_elbo: Array     # convergence carry (segmented fits)
    pat_count: Array


@functools.partial(jax.jit, static_argnames=(
    "r", "buf_size", "patience", "corrected", "structure", "num_blocks",
    "interpret"))
def fused_fit(Y: Array, R_inv: Array, Sigma0: Array, Q: Array, Phi: Array,
              X_mean0: Array, X_cov0: Array, max_iter: Array,
              learning_rate: Array, tolerance: Array,
              carry_elbo: Optional[Array] = None,
              carry_pat: Optional[Array] = None, *, r: int,
              buf_size: int, patience: int = 3, corrected: bool = False,
              structure: str = "full", num_blocks: int = 1,
              interpret: bool = False) -> FusedFitOut:
    """Run the whole CAVI fit in one Pallas kernel.

    ``num_blocks=1`` is the Jacobi step (same contract as
    ``fit_cavi(update_mode="jacobi", diag_mode="exact")``);
    ``num_blocks>1`` runs that many sequential block-Gauss-Seidel phases
    per iteration (``fit_cavi(update_mode="block")`` — the engine
    default).  Any covariance-structure policy; see the module docstring
    for scope.
    """
    n, _, T, _ = Y.shape
    if n % num_blocks != 0:
        raise ValueError(f"num_blocks={num_blocks} must divide n={n}")
    if carry_elbo is None:
        carry_elbo = -jnp.inf
    if carry_pat is None:
        carry_pat = 0
    d = 2 + 2 * r
    f32 = jnp.float32

    p, q = R_inv[0, 0], R_inv[0, 1]
    y0 = Y[..., 0].astype(f32)
    W0 = p * y0 + q * Y[..., 1]
    W1 = q * y0 + p * Y[..., 1]
    eta_a, eta_b = W0.sum(1), W1.sum(1)
    y0f = y0.reshape(n * n, T)
    y0Tf = jnp.swapaxes(y0, 0, 1).reshape(n * n, T)
    maskf = (1.0 - jnp.eye(n, dtype=f32))[:, :, None].repeat(T, 2)
    maskf = maskf.reshape(n * n, T)

    Q_inv = jnp.linalg.inv(Q)
    Sigma0_inv = jnp.linalg.inv(Sigma0)
    pri = jnp.stack([Sigma0_inv, Q_inv, Q_inv @ Phi, Phi.T @ Q_inv @ Phi,
                     Phi]).astype(f32)
    scal = jnp.stack([learning_rate.astype(f32), tolerance.astype(f32),
                      p, q, jnp.linalg.slogdet(R_inv)[1] * -1.0,
                      jnp.linalg.slogdet(Sigma0)[1],
                      jnp.linalg.slogdet(Q)[1],
                      jnp.asarray(carry_elbo, f32)])[None, :]
    iters = jnp.stack([jnp.asarray(max_iter, jnp.int32),
                       jnp.asarray(carry_pat, jnp.int32)])[None, :]

    Xm0 = jnp.moveaxis(X_mean0.astype(f32), -1, 0)          # (d, n, T)
    Xc0 = jnp.moveaxis(X_cov0.astype(f32), (-2, -1), (1, 0))
    Xc0 = jnp.swapaxes(Xc0, 0, 1)                            # (d, d, n, T)

    kernel = functools.partial(_fused_fit_kernel, n=n, T=T, r=r,
                               patience=patience, corrected=corrected,
                               structure=structure, num_blocks=num_blocks)
    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    Xm, Xc, eh, mh, stats = pl.pallas_call(
        kernel,
        in_specs=[smem(), smem(), smem(),
                  vmem(), vmem(), vmem(), vmem(),
                  vmem(), vmem(), vmem(), vmem(), vmem()],
        out_specs=[vmem(), vmem(), vmem(), vmem(), smem()],
        out_shape=[
            jax.ShapeDtypeStruct((d, n, T), f32),
            jax.ShapeDtypeStruct((d, d, n, T), f32),
            jax.ShapeDtypeStruct((buf_size, 1), f32),
            jax.ShapeDtypeStruct((buf_size, 1), f32),
            jax.ShapeDtypeStruct((1, 5), f32),
        ],
        # The resident tensors + (n^2, T) diagnostics temporaries exceed
        # the default 16 MB scoped-vmem limit near the top of the
        # supported envelope; raise it (same trick as fused_smoother,
        # proven on hardware) — fused_fit_supported bounds actual usage.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(iters, scal, pri, W0, W1, eta_a, eta_b, y0f, y0Tf, maskf, Xm0, Xc0)

    return FusedFitOut(
        X_mean=jnp.moveaxis(Xm, 0, -1),
        X_cov=jnp.moveaxis(Xc, (0, 1), (-2, -1)),
        elbo_history=eh[:, 0],
        mse_history=mh[:, 0],
        n_iter=stats[0, 0].astype(jnp.int32),
        converged=stats[0, 1].astype(bool),
        diverged=stats[0, 2].astype(bool),
        last_elbo=stats[0, 4],
        pat_count=stats[0, 3].astype(jnp.int32),
    )
