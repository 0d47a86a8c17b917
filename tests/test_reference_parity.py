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


def _run_reference(mode: str, tmp_dir) -> dict:
    """Run the torch reference in a SUBPROCESS (tests/_reference_runner.py)
    — torch's OpenMP runtime must never share a process with XLA:CPU's
    compile threads (intermittent segfaults observed on 2-vCPU hosts)."""
    import subprocess

    out = Path(tmp_dir) / f"ref_{mode}.npz"
    subprocess.run(
        [sys.executable,
         str(Path(__file__).parent / "_reference_runner.py"),
         str(out), mode],
        check=True, timeout=600, capture_output=True)
    return dict(np.load(out))


@pytest.fixture(scope="module")
def reference_run(tmp_path_factory):
    """Reference Naive/Good/Bad fixed points on a small config (computed
    in an isolated torch process); returns its data and results."""
    d = _run_reference("small", tmp_path_factory.mktemp("ref"))
    results = {
        name: {
            "mse": float(d[f"{name}_mse"]),
            "elbo": float(d[f"{name}_elbo"]),
            "X_mean": d[f"{name}_X_mean"],
            "X_cov": d[f"{name}_X_cov"],
        }
        for name in ("naive", "good", "bad")
    }
    return {
        "Y": d["Y"],
        "X_true": d["X_true"],
        "model_kwargs": dict(n_nodes=10, n_time=5, latent_dim=1,
                             ar_coefficient=0.8, rho_dyadic=0.5),
        "results": results,
    }


def _fit_ours(ref, structure, update_mode="seq", learning_rate=0.7):
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
                        learning_rate=learning_rate, tolerance=1e-9)
    ni = int(out.n_iter)
    return {
        "mse": float(np.asarray(out.mse_history)[ni - 1]),
        "elbo": float(np.asarray(out.elbo_history)[ni - 1]),
        "X_mean": np.asarray(out.X_mean),
        "X_cov": np.asarray(out.X_cov),
    }


_LR = {"naive": 0.7, "good": 0.7, "bad": 0.3}


class TestFixedPointParity:
    @pytest.mark.parametrize("method,structure", [("naive", "diag"),
                                                  ("good", "full"),
                                                  ("bad", "block")])
    def test_converged_mse_matches(self, reference_run, method, structure):
        """On identical data, our converged reconstruction MSE must match
        the reference's within a few percent (init randomness differs).
        Covers all three engines incl. the deliberately-wrong 'bad'
        factorization (at a damping where its fixed point is stable)."""
        ours = _fit_ours(reference_run, structure,
                         learning_rate=_LR[method])
        ref_mse = reference_run["results"][method]["mse"]
        assert ours["mse"] == pytest.approx(ref_mse, rel=0.05), (
            f"{method}: ours {ours['mse']:.5f} vs reference {ref_mse:.5f}")

    @pytest.mark.parametrize("method,structure", [("naive", "diag"),
                                                  ("good", "full"),
                                                  ("bad", "block")])
    def test_converged_elbo_matches(self, reference_run, method, structure):
        """Same ELBO definition + same fixed point => matching values."""
        ours = _fit_ours(reference_run, structure,
                         learning_rate=_LR[method])
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

    @pytest.mark.parametrize("method,structure", [("good", "full"),
                                                  ("bad", "block")])
    def test_posterior_covariance_per_block(self, reference_run, method,
                                            structure):
        """Covariance parity per structural block, not one pooled mean:
        additive (2x2), multiplicative (2r x 2r) and additive x
        multiplicative cross blocks each compared on their mean absolute
        entry.  Tolerance 25%: the factors' covariances depend on the
        latent means only through O(r^2) sufficient statistics, so
        init-seed differences perturb them at the same order as the mean
        differences (~10-20% at this tiny config); a wrong assembly or
        projection order would be off by x2 or more."""
        ours = _fit_ours(reference_run, structure,
                         learning_rate=_LR[method])
        ref_cov = reference_run["results"][method]["X_cov"]
        blocks = {"additive": (slice(0, 2), slice(0, 2)),
                  "multiplicative": (slice(2, None), slice(2, None)),
                  "cross": (slice(0, 2), slice(2, None))}
        for name, (bi, bj) in blocks.items():
            ref_b = np.abs(ref_cov[..., bi, bj]).mean()
            our_b = np.abs(ours["X_cov"][..., bi, bj]).mean()
            if name == "cross" and structure == "block":
                # the 'bad' projection zeroes this block on both sides
                assert ref_b < 1e-6 and our_b < 1e-6
            else:
                assert our_b == pytest.approx(ref_b, rel=0.25), (
                    f"{method}/{name}: ours {our_b:.5f} "
                    f"vs reference {ref_b:.5f}")


class TestDemoConfigParity:
    """Our engines on the reference's OWN demo-config data (n=15, T=10,
    r=2, lr=0.7, 150 iters) against the measured reference rows in
    BASELINE.md:31-33 — the acceptance anchors.  The reference model is
    only used to *generate* Y (fast, reproducible: its constructor always
    seeds torch with 42, SURVEY.md §2C-1); the expected numbers are the
    recorded reference fits on exactly this data.

    Tolerances: ELBO rel 3% and history-MSE rel 1% absorb the only
    remaining difference — variational init randomness (measured: naive
    1.1%/0.23%, good 0.54%/0.23%).  The reference's aligned-state MSE
    (0.272) is an upper bound for ours because our Procrustes fixes the
    reference's documented alignment bug (tame/utils/alignment.py:32-39).
    """

    BASELINE_ROWS = {  # BASELINE.md "Measured on the reference" lr=0.7
        "naive": {"elbo": -2109.78, "mse": 0.472691, "aligned": 0.271986},
        "good": {"elbo": -2091.79, "mse": 0.472831, "aligned": 0.270993},
    }

    @pytest.fixture(scope="class")
    def demo_data(self, tmp_path_factory):
        d = _run_reference("demo", tmp_path_factory.mktemp("ref_demo"))
        return {"Y": d["Y"], "X_true": d["X_true"]}

    def _fit(self, demo_data, structure):
        import jax
        import jax.numpy as jnp

        from tame.inference import cavi
        from tame.models import TemporalAMEModel

        model = TemporalAMEModel(n_nodes=15, n_time=10, latent_dim=2,
                                 ar_coefficient=0.8, rho_dyadic=0.5,
                                 seed=42)
        init = cavi.init_state(jax.random.PRNGKey(42), 15, 10, 6,
                               structure, 0.1, 0.5)
        out = cavi.fit_cavi(jnp.asarray(demo_data["Y"]), model.params,
                            init, structure=structure, update_mode="seq",
                            max_iter=150, learning_rate=0.7,
                            tolerance=1e-9)
        ni = int(out.n_iter)
        return {
            "n_iter": ni,
            "elbo": float(np.asarray(out.elbo_history)[ni - 1]),
            "mse": float(np.asarray(out.mse_history)[ni - 1]),
            "X_mean": out.X_mean,
        }

    @pytest.mark.parametrize("method,structure", [("naive", "diag"),
                                                  ("good", "full")])
    def test_demo_config_matches_baseline(self, demo_data, method,
                                          structure):
        import jax.numpy as jnp

        from tame.utils.alignment import align_temporal_states

        ours = self._fit(demo_data, structure)
        row = self.BASELINE_ROWS[method]
        assert ours["n_iter"] == 150
        assert ours["mse"] == pytest.approx(row["mse"], rel=0.01), (
            f"{method}: MSE {ours['mse']:.6f} vs baseline {row['mse']}")
        assert ours["elbo"] == pytest.approx(row["elbo"], rel=0.03), (
            f"{method}: ELBO {ours['elbo']:.2f} vs baseline {row['elbo']}")
        X_true = jnp.asarray(demo_data["X_true"])
        aligned = align_temporal_states(ours["X_mean"], X_true,
                                        latent_dim=2)
        amse = float(jnp.mean((aligned - X_true) ** 2))
        # fixed alignment => at least as good as the reference's score
        assert 0.05 < amse < row["aligned"] * 1.05

    def test_demo_config_bad_diverges_like_reference(self, demo_data):
        """BASELINE.md:33: the 'bad' control blows up at lr=0.7 on the
        demo config (reference final MSE 3.36, ELBO -23400); ours must
        reproduce the blow-up on identical data (chaotic trajectory, so
        scale — not exact values — is the invariant)."""
        ours = self._fit(demo_data, "block")
        assert ours["mse"] > 2.0
        assert ours["elbo"] < -10000.0
