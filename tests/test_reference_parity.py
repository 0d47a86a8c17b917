"""Direct parity tests against the reference implementation.

These run the actual reference package (torch, mounted read-only at
``/root/reference``) on a small config and feed its *exact* generated data
into this framework's engines, so converged fixed points are compared on
identical observations — the strongest form of the BASELINE.md parity
requirement ("match the reference's posterior means/covariances and
reconstruction MSE").  Skipped automatically when the reference isn't
mounted.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not REFERENCE.exists(),
                       reason="reference repo not mounted"),
]


@pytest.fixture(scope="module")
def reference_run():
    """Run the reference Naive MF and Good SMF to convergence on a small
    config; return its data and results."""
    sys.path.insert(0, str(REFERENCE))
    import torch

    from src.models import TemporalAMEModel as RefModel
    from src.inference import (
        TemporalAMENaiveMFVI as RefNaive,
        TemporalAMEStructuredMFVI as RefSMF,
    )

    model = RefModel(n_nodes=10, n_time=5, latent_dim=1,
                     ar_coefficient=0.8, rho_dyadic=0.5, seed=42)
    Y, X = model.generate_data(return_latents=True)

    results = {}
    for name, vi in [
            ("naive", RefNaive(model, learning_rate=0.7, seed=0)),
            ("good", RefSMF(model, factorization="good",
                            learning_rate=0.7, seed=0))]:
        history = vi.fit(max_iter=80, tolerance=1e-9, verbose=False)
        results[name] = {
            "mse": history["reconstruction_error"][-1],
            "elbo": history["elbo"][-1],
            "X_mean": vi.X_mean.detach().numpy().copy(),
            "X_cov": vi.X_cov.detach().numpy().copy(),
        }
    return {
        "Y": Y.numpy().copy(),
        "X_true": X.numpy().copy(),
        "model_kwargs": dict(n_nodes=10, n_time=5, latent_dim=1,
                             ar_coefficient=0.8, rho_dyadic=0.5),
        "results": results,
    }


def _fit_ours(ref, structure, update_mode="seq"):
    import jax.numpy as jnp

    from tame.inference import cavi
    from tame.models import TemporalAMEModel

    model = TemporalAMEModel(**ref["model_kwargs"], seed=42)
    Y = jnp.asarray(ref["Y"])
    import jax

    init = cavi.init_state(jax.random.PRNGKey(0), model.n, model.T,
                           model.d, structure, 0.1, 0.5)
    out = cavi.fit_cavi(Y, model.params, init, structure=structure,
                        update_mode=update_mode, max_iter=80,
                        learning_rate=0.7, tolerance=1e-9)
    ni = int(out.n_iter)
    return {
        "mse": float(np.asarray(out.mse_history)[ni - 1]),
        "elbo": float(np.asarray(out.elbo_history)[ni - 1]),
        "X_mean": np.asarray(out.X_mean),
        "X_cov": np.asarray(out.X_cov),
    }


class TestFixedPointParity:
    @pytest.mark.parametrize("method,structure", [("naive", "diag"),
                                                  ("good", "full")])
    def test_converged_mse_matches(self, reference_run, method, structure):
        """On identical data, our converged reconstruction MSE must match
        the reference's within a few percent (init randomness differs)."""
        ours = _fit_ours(reference_run, structure)
        ref_mse = reference_run["results"][method]["mse"]
        assert ours["mse"] == pytest.approx(ref_mse, rel=0.05), (
            f"{method}: ours {ours['mse']:.5f} vs reference {ref_mse:.5f}")

    @pytest.mark.parametrize("method,structure", [("naive", "diag"),
                                                  ("good", "full")])
    def test_converged_elbo_matches(self, reference_run, method, structure):
        """Same ELBO definition + same fixed point => matching values."""
        ours = _fit_ours(reference_run, structure)
        ref_elbo = reference_run["results"][method]["elbo"]
        assert ours["elbo"] == pytest.approx(ref_elbo, rel=0.03), (
            f"{method}: ours {ours['elbo']:.2f} vs reference {ref_elbo:.2f}")

    def test_posterior_dyadic_means_match(self, reference_run):
        """Posterior means compared in identified (dyadic-mean) space."""
        from tame.ops import dyad as dyad_ops
        import jax.numpy as jnp

        ours = _fit_ours(reference_run, "full")
        ref_X = reference_run["results"]["good"]["X_mean"]
        mu_ref = np.asarray(dyad_ops.dyadic_mean_temporal(
            jnp.asarray(ref_X), 1))
        mu_ours = np.asarray(dyad_ops.dyadic_mean_temporal(
            jnp.asarray(ours["X_mean"]), 1))
        mask = ~np.eye(10, dtype=bool)
        corr = np.corrcoef(mu_ref[mask].ravel(), mu_ours[mask].ravel())[0, 1]
        assert corr > 0.99
        rmse = np.sqrt(((mu_ref[mask] - mu_ours[mask]) ** 2).mean())
        scale = np.abs(mu_ref[mask]).mean() + 1e-8
        assert rmse / scale < 0.1

    def test_posterior_variances_comparable(self, reference_run):
        """Mean posterior variances (diagonal of X_cov) within 15%."""
        ours = _fit_ours(reference_run, "full")
        ref_var = np.diagonal(reference_run["results"]["good"]["X_cov"],
                              axis1=-2, axis2=-1).mean()
        our_var = np.diagonal(ours["X_cov"], axis1=-2, axis2=-1).mean()
        assert our_var == pytest.approx(ref_var, rel=0.15)
