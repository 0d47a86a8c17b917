"""Reference-compatible VI engine classes on top of the batched CAVI core.

The class surface mirrors ``src/inference/{base,naive_mf,structured_mf}.py``
of the reference: same constructor keywords, ``fit(max_iter, tolerance,
verbose, check_every)`` returning a ``{'elbo': [...],
'reconstruction_error': [...]}`` history, ``X_mean`` / ``X_cov`` attributes,
``get_variational_means/covariances``, ``predict_forward``.  Internally a fit
is ONE compiled ``lax.while_loop`` (``tame.inference.cavi.fit_cavi``) instead
of n * T * n Python-loop iterations per step.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from tame.config import InferenceConfig
from tame.inference import cavi
from tame.models.params import AMEParams


class TemporalAMECaviVI:
    """Generic damped-CAVI variational engine.

    Parameters
    ----------
    model : TemporalAMEModel
        Model holding observed data ``model.Y`` (generate first).
    structure : {"diag", "full", "block"}
        Covariance-structure policy (naive / good-SMF / bad-SMF).
    learning_rate : float
        Damping factor (reference semantics, ``naive_mf.py:277-281``).
    update_mode : {"block", "jacobi", "seq"}
        ``"block"`` (default): block Gauss-Seidel — stable at reference
        damping values for any n.  ``"jacobi"``: fully simultaneous (fastest
        per iteration, needs smaller lr as n grows).  ``"seq"``: the
        reference's exact node-by-node sweep order.
    """

    structure = "full"

    def __init__(self, model, structure: Optional[str] = None,
                 learning_rate: float = 1.0, init_scale: float = 0.1,
                 cov_init_scale: float = 0.5, seed: int = 42,
                 update_mode: str = "block", num_blocks=None,
                 corrected: bool = False, mixed_precision: bool = False,
                 diag_mode: str = "exact", init_mode: str = "random",
                 elbo_every: int = 1, mask=None):
        if model.Y is None:
            raise ValueError(
                "Model has no data. Call model.generate_data() first.")
        if structure is not None:
            self.structure = structure
        self.model = model
        self.Y = jnp.asarray(model.Y)
        self.n = model.n
        self.T = model.T
        self.d = model.d
        self.r = model.r
        self.lr = learning_rate
        self.init_scale = init_scale
        self.cov_init_scale = cov_init_scale
        self.seed = seed
        self.update_mode = update_mode
        self.num_blocks = num_blocks
        self.corrected = corrected
        self.mixed_precision = mixed_precision
        self.diag_mode = diag_mode
        # Diagnostics cadence (reference: every iteration); k > 1 skips
        # the ELBO/MSE pass between evaluations — history slots in
        # between stay NaN (cavi.fit_cavi docstring).
        self.elbo_every = elbo_every
        # Missing-data support (beyond the reference): (n, n, T) dyad
        # observation mask, threaded into every fit_cavi call.  See
        # cavi.fit_cavi / tame.models.random_dyad_mask.
        self.mask = None if mask is None else jnp.asarray(mask)
        self.params: AMEParams = model.params

        self.history: Dict[str, List[float]] = {
            "elbo": [], "reconstruction_error": []}
        # Convergence carry (last evaluated ELBO + consecutive
        # small-change count) for segmented/resumed fits.
        self._carry_elbo: Optional[float] = None
        self._carry_pat: int = 0

        if init_mode == "warm":
            # Data-driven warm start (cavi.warm_init_state): closed-form
            # additive effects + top-r subspace of the residual — lands
            # inside the basin at a fraction of the iterations.  Under a
            # mask every average normalizes by OBSERVED counts (masked
            # entries are never read).
            state = cavi.warm_init_state(
                self.Y, self.params, structure=self.structure,
                cov_init_scale=cov_init_scale,
                key=jax.random.PRNGKey(seed), obs_mask=self.mask)
        elif init_mode == "random":
            state = cavi.init_state(
                jax.random.PRNGKey(seed), self.n, self.T, self.d,
                self.structure, init_scale, cov_init_scale)
        else:
            raise ValueError(f"unknown init_mode '{init_mode}'")
        self.X_mean: Array = state.X_mean
        self.X_cov: Array = state.X_cov

    @classmethod
    def from_config(cls, model, config: InferenceConfig):
        """Build an engine from a typed :class:`tame.config.InferenceConfig`."""
        kwargs = dict(
            learning_rate=config.learning_rate,
            init_scale=config.init_scale,
            seed=config.seed,
            update_mode=config.update_mode,
            mixed_precision=config.mixed_precision,
            diag_mode=config.diag_mode,
        )
        if cls is TemporalAMECaviVI:
            kwargs["structure"] = config.structure
            kwargs["cov_init_scale"] = config.cov_init_scale
        elif cls is TemporalAMEStructuredMFVI:
            from tame.config import STRUCTURE_TO_FACTORIZATION

            kwargs["factorization"] = STRUCTURE_TO_FACTORIZATION.get(
                config.structure, "good")
            kwargs["cov_init_scale"] = config.cov_init_scale
        return cls(model, **kwargs)

    # ------------------------------------------------------------------
    def fit(self, max_iter: int = 100, tolerance: float = 1e-4,
            verbose: bool = True, check_every: int = 10,
            checkpoint_every: Optional[int] = None,
            ckpt_dir=None, resume: bool = False
            ) -> Dict[str, List[float]]:
        """Run CAVI to convergence (reference trainer semantics,
        ``base.py:127-208``).

        ``checkpoint_every=k`` runs the compiled loop in k-iteration
        segments (warm jit cache — one compile total): after each segment
        the fit state is checkpointed to ``ckpt_dir`` (if given) through
        the native store and a progress line is printed, giving long fits
        both restartability and liveness — capabilities the reference
        lacks (its state lives in memory and prints come from the same
        Python loop that computes, ``base.py:231-250``).  The convergence
        carry (last ELBO + patience count) threads through segments, so a
        segmented fit stops at EXACTLY the same iteration as a single
        ``fit_cavi`` call.

        ``resume=True`` restores ``ckpt_dir`` before fitting (if it
        exists) and treats ``max_iter`` as the TOTAL budget including
        already-completed iterations — a killed run rerun with the same
        arguments reproduces the uninterrupted fit bitwise.
        """
        if verbose:
            print(f"Starting {self.__class__.__name__} optimization...")
            print("=" * 60)

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

        # Convergence carry: fresh fits start clean; resumed fits pick up
        # the persisted carry so the stopping decision is unchanged.  The
        # converged/diverged flags are part of the carry: a checkpoint
        # taken after the stopping rule fired must not re-enter the loop
        # (the uninterrupted fit would have stopped there).
        if not (resume and done > 0):
            self._carry_elbo = None
            self._carry_pat = 0
            self._converged = False
            self._diverged = False
        else:
            self._converged = bool(getattr(self, "_converged", False))
            self._diverged = bool(getattr(self, "_diverged", False))
        seg_start = done
        ckptr = None
        if checkpoint_every and ckpt_dir is not None:
            from tame.io.async_ckpt import AsyncCheckpointer

            # Checkpoint writes overlap the next compiled segment; only
            # the device->host snapshot is synchronous.
            ckptr = AsyncCheckpointer()
        while budget > 0 and not (self._converged or self._diverged):
            seg = min(segment, budget)
            result = cavi.fit_cavi(
                self.Y, self.params,
                cavi.CaviState(X_mean=self.X_mean, X_cov=self.X_cov),
                structure=self.structure, update_mode=self.update_mode,
                max_iter=seg, learning_rate=self.lr, tolerance=tolerance,
                num_blocks=self.num_blocks, corrected=self.corrected,
                mixed_precision=self.mixed_precision,
                diag_mode=self.diag_mode, elbo_every=self.elbo_every,
                mask=self.mask,
                carry_elbo=self._carry_elbo, carry_patience=self._carry_pat)
            result = jax.block_until_ready(result)

            self.X_mean = result.X_mean
            self.X_cov = result.X_cov
            n_iter = int(result.n_iter)
            elbo_hist = np.asarray(result.elbo_history)[:n_iter]
            mse_hist = np.asarray(result.mse_history)[:n_iter]
            self.history["elbo"].extend(float(v) for v in elbo_hist)
            self.history["reconstruction_error"].extend(
                float(v) for v in mse_hist)
            self._converged = bool(result.converged)
            self._diverged = bool(result.diverged)
            self._carry_elbo = float(result.last_elbo)
            self._carry_pat = int(result.pat_count)
            budget -= n_iter

            if checkpoint_every:
                if ckptr is not None:
                    ckptr.save(ckpt_dir, self._checkpoint_state())
                if verbose:
                    total = len(self.history["elbo"])
                    print(f"Iter {total - 1:4d} | "
                          f"ELBO: {elbo_hist[-1]:10.2f} | "
                          f"MSE: {mse_hist[-1]:.6f}"
                          + (" | checkpointed" if ckpt_dir else ""),
                          flush=True)

        if ckptr is not None:
            ckptr.wait()  # final checkpoint durable before returning

        n_total = len(self.history["elbo"])
        if self._diverged:
            print(f"WARNING: {self.__class__.__name__} halted at iteration "
                  f"{n_total - 1}: ELBO became non-finite (try a smaller "
                  "learning_rate or update_mode='block').")

        if verbose:
            eh = self.history["elbo"]
            mh = self.history["reconstruction_error"]
            if not checkpoint_every:
                for it in range(seg_start, n_total):
                    if (it - seg_start) % check_every == 0 \
                            or it == n_total - 1:
                        print(f"Iter {it:4d} | ELBO: {eh[it]:10.2f} | "
                              f"MSE: {mh[it]:.6f}")
            if self._converged:
                print(f"\nConverged at iteration {n_total - 1}")
            else:
                print("\nReached maximum iterations without convergence")
        return self.history

    # ------------------------------------------------------------------
    def get_variational_means(self) -> Array:
        return self.X_mean

    def get_variational_covariances(self) -> Array:
        return self.X_cov

    def get_elbo_history(self) -> List[float]:
        return self.history["elbo"]

    def get_reconstruction_history(self) -> List[float]:
        return self.history["reconstruction_error"]

    def _checkpoint_state(self):
        return {
            "X_mean": self.X_mean,
            "X_cov": self.X_cov,
            "history": {
                "elbo": np.asarray(self.history["elbo"]),
                "reconstruction_error": np.asarray(
                    self.history["reconstruction_error"]),
            },
            "structure": self.structure,
            "learning_rate": self.lr,
            "seed": self.seed,
            "carry_elbo": self._carry_elbo,
            "carry_pat": self._carry_pat,
            "converged": bool(getattr(self, "_converged", False)),
            "diverged": bool(getattr(self, "_diverged", False)),
        }

    def save_checkpoint(self, ckpt_dir) -> None:
        """Checkpoint the full fit state (variational parameters + history)
        for restart — a capability the reference lacks entirely (its state
        lives in memory for the whole fit, SURVEY.md §5)."""
        from tame.io import save_checkpoint

        save_checkpoint(ckpt_dir, self._checkpoint_state())

    def load_checkpoint(self, ckpt_dir) -> None:
        """Restore a checkpoint saved by :meth:`save_checkpoint`; a
        subsequent ``fit`` continues from the restored state (history
        appends)."""
        from tame.io import load_checkpoint

        state = load_checkpoint(ckpt_dir)
        if state.get("structure", self.structure) != self.structure:
            raise ValueError(
                f"checkpoint structure '{state.get('structure')}' does not "
                f"match engine structure '{self.structure}'")
        self.X_mean = jnp.asarray(state["X_mean"])
        self.X_cov = jnp.asarray(state["X_cov"])
        self.history = {
            "elbo": list(np.asarray(state["history"]["elbo"]).tolist()),
            "reconstruction_error": list(np.asarray(
                state["history"]["reconstruction_error"]).tolist()),
        }
        self._carry_elbo = state.get("carry_elbo")
        self._carry_pat = int(state.get("carry_pat", 0))
        self._converged = bool(state.get("converged", False))
        self._diverged = bool(state.get("diverged", False))

    def predict_forward(self, n_steps: int = 1) -> Array:
        """AR(1) forward forecast from the last state means
        (reference ``naive_mf.py:386-396``), via one ``lax.scan``."""
        Phi = self.params.Phi

        def step(x, _):
            x = x @ Phi.T
            return x, x

        _, preds = jax.lax.scan(step, self.X_mean[:, -1], None,
                                length=n_steps)
        return jnp.swapaxes(preds, 0, 1)  # (n, n_steps, d)

    def predict_forward_with_cov(self, n_steps: int = 1):
        """State forecast with uncertainty (beyond the reference, whose
        ``predict_forward`` returns means only).

        Propagates the posterior ``N(mu_T, Sigma_T)`` of the last fitted
        state through the AR(1) dynamics:

            mu_{T+h}    = Phi^h mu_T
            Sigma_{T+h} = Phi Sigma_{T+h-1} Phi' + Q

        Returns ``(means (n, n_steps, d), covs (n, n_steps, d, d))``.
        """
        Phi, Q = self.params.Phi, self.params.Q

        def step(carry, _):
            mu, Sig = carry
            mu = mu @ Phi.T
            Sig = jnp.einsum("ab,ibc,dc->iad", Phi, Sig, Phi,
                             precision=jax.lax.Precision.HIGHEST) + Q
            return (mu, Sig), (mu, Sig)

        _, (mus, Sigs) = jax.lax.scan(
            step, (self.X_mean[:, -1], self.X_cov[:, -1]), None,
            length=n_steps)
        return jnp.swapaxes(mus, 0, 1), jnp.swapaxes(Sigs, 0, 1)

    def predict_dyads(self, n_steps: int = 1):
        """Dyadic forecast with per-entry predictive standard deviations.

        Combines the state forecast (:meth:`predict_forward_with_cov`)
        with a delta-method variance for each dyad entry

            y_ij = a_i + b_j + U_i . V_j + eps,

        treating nodes as posterior-independent (the mean-field family):

            var(y_ij) = J_i Sigma_i J_i' + J_j Sigma_j J_j' + R[0, 0]

        with ``J_i = [1, 0, V_j, 0]`` and ``J_j = [0, 1, 0, U_i]``
        evaluated at the forecast means.  Returns ``(mean, std)`` of shape
        ``(n, n, n_steps, 2)`` — feed to
        :func:`tame.utils.metrics.calibration_error` /
        :func:`compute_coverage` for calibrated-forecast evaluation, a
        capability the reference's metrics define but nothing there
        produces (``metrics.py:350-462``).
        """
        from tame.ops import dyad as dyad_ops

        mus, Sigs = self.predict_forward_with_cov(n_steps)
        r = self.r
        mean = dyad_ops.dyadic_mean_temporal(mus, r)  # (n, n, H, 2)
        _, _, U, V = dyad_ops.split_state(mus, r)     # (n, H, r)
        # Quadratic-form pieces of the sender (i) factor against V_j ...
        A = Sigs[..., 0, 0]                           # (n, H)
        B = Sigs[..., 0, 2:2 + r]                     # (n, H, r)
        C = Sigs[..., 2:2 + r, 2:2 + r]               # (n, H, r, r)
        # ... and the receiver (j) factor against U_i.
        Ar = Sigs[..., 1, 1]
        Br = Sigs[..., 1, 2 + r:]
        Cr = Sigs[..., 2 + r:, 2 + r:]
        hi = jax.lax.Precision.HIGHEST
        var0 = (A[:, None] + Ar[None]
                + 2.0 * jnp.einsum("ihr,jhr->ijh", B, V, precision=hi)
                + jnp.einsum("jhr,ihrs,jhs->ijh", V, C, V, precision=hi)
                + 2.0 * jnp.einsum("jhr,ihr->ijh", Br, U, precision=hi)
                + jnp.einsum("ihr,jhrs,ihs->ijh", U, Cr, U, precision=hi)
                + self.params.R[0, 0])
        # Component 1 of dyad (i, j) is y_ji: its variance is var0 with
        # the roles swapped.
        std = jnp.sqrt(jnp.maximum(
            jnp.stack([var0, jnp.swapaxes(var0, 0, 1)], axis=-1), 1e-12))
        return mean, std


# Reference-surface aliases (reference ``src/inference/__init__.py:45-57``
# exports BaseVariationalInference / BaseTemporalVariationalInference): the
# generic CAVI engine plays both roles here — all reference engines are
# temporal, and the trainer-loop surface lives on TemporalAMECaviVI.
BaseVariationalInference = TemporalAMECaviVI
BaseTemporalVariationalInference = TemporalAMECaviVI


class TemporalAMENaiveMFVI(TemporalAMECaviVI):
    """Naive (fully factorized, diagonal-covariance) mean-field VI —
    reference ``TemporalAMENaiveMFVI`` (``naive_mf.py:29-396``)."""

    structure = "diag"

    def __init__(self, model, learning_rate: float = 1.0,
                 init_scale: float = 0.1, seed: int = 42,
                 update_mode: str = "block", corrected: bool = False,
                 mixed_precision: bool = False, diag_mode: str = "exact",
                 init_mode: str = "random", elbo_every: int = 1,
                 mask=None):
        super().__init__(model, structure="diag",
                         learning_rate=learning_rate, init_scale=init_scale,
                         seed=seed, update_mode=update_mode,
                         corrected=corrected, mixed_precision=mixed_precision,
                         diag_mode=diag_mode, init_mode=init_mode,
                         elbo_every=elbo_every, mask=mask)


class TemporalAMEStructuredMFVI(TemporalAMECaviVI):
    """Structured mean-field VI with configurable factorization —
    reference ``TemporalAMEStructuredMFVI`` (``structured_mf.py:28-337``).

    ``factorization="good"`` keeps the full d x d covariance;
    ``factorization="bad"`` zeroes the additive x multiplicative cross blocks
    post-inversion (the deliberately wrong control).
    """

    def __init__(self, model, factorization: str = "good",
                 learning_rate: float = 1.0, init_scale: float = 0.1,
                 cov_init_scale: float = 0.5, seed: int = 42,
                 update_mode: str = "block", corrected: bool = False,
                 mixed_precision: bool = False, diag_mode: str = "exact",
                 init_mode: str = "random", elbo_every: int = 1,
                 mask=None):
        if factorization not in ("good", "bad"):
            raise ValueError(f"Unknown factorization '{factorization}'")
        self.factorization = factorization
        structure = "full" if factorization == "good" else "block"
        super().__init__(model, structure=structure,
                         learning_rate=learning_rate, init_scale=init_scale,
                         cov_init_scale=cov_init_scale, seed=seed,
                         update_mode=update_mode, corrected=corrected,
                         mixed_precision=mixed_precision,
                         diag_mode=diag_mode, init_mode=init_mode,
                         elbo_every=elbo_every, mask=mask)

    def get_factorization_type(self) -> str:
        return self.factorization
