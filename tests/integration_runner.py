"""Standalone end-to-end integration runner.

Surface parity with the reference's ``tests/test_integration.py`` (a
print-heavy standalone script with ``run_all_tests()`` and an exit code,
separate from the pytest suite): generate -> fit all engines -> compare ->
align -> figures, on a small config.

Run directly:  ``python tests/integration_runner.py``
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def _setup():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from tame.utils.cache import enable_persistent_cache

    enable_persistent_cache(jax)  # host-keyed: foreign AOT blobs segfault


def test_data_generation():
    from tame.models import TemporalAMEModel
    import numpy as np

    model = TemporalAMEModel(n_nodes=15, n_time=8, latent_dim=2, seed=42)
    Y, X = model.generate_data(return_latents=True)
    assert Y.shape == (15, 15, 8, 2)
    assert X.shape == (15, 8, 6)
    Yn = np.asarray(Y)
    assert np.allclose(Yn[..., 1], Yn.transpose(1, 0, 2, 3)[..., 0])
    print("  data generation: shapes + reciprocity OK")
    return model, Y, X


def test_three_engines(model):
    from tame.inference import (
        TemporalAMENaiveMFVI,
        TemporalAMEStructuredMFVI,
    )

    results = {}
    for name, cls, kw in [
            ("Naive MF", TemporalAMENaiveMFVI, {}),
            ("Good SMF", TemporalAMEStructuredMFVI,
             {"factorization": "good"}),
            ("Bad SMF", TemporalAMEStructuredMFVI,
             {"factorization": "bad"})]:
        vi = cls(model, learning_rate=1.0, **kw)
        h = vi.fit(max_iter=20, verbose=False)
        assert len(h["elbo"]) <= 20
        results[name] = {"vi": vi, "history": h, "X_est": vi.X_mean}
        print(f"  {name}: {len(h['elbo'])} iters, "
              f"final MSE {h['reconstruction_error'][-1]:.4f}")
    return results


def test_alignment_and_compare(results, X_true):
    from tame.utils import align_temporal_states, compare_methods

    for r in results.values():
        r["X_est"] = align_temporal_states(r["X_est"], X_true, latent_dim=2)
    compare_methods(results, X_true=X_true)
    print("  alignment + comparison OK")


def test_figures(results, X_true, outdir):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from tame.visualization import (
        plot_convergence,
        plot_three_way_comparison,
    )

    outdir.mkdir(exist_ok=True)
    plot_convergence(results["Good SMF"]["history"],
                     save_path=str(outdir / "convergence.png"))
    plot_three_way_comparison(results, X_true=X_true,
                              save_path=str(outdir / "three_way.png"))
    plt.close("all")
    assert (outdir / "three_way.png").exists()
    print(f"  figures saved to {outdir}")


def test_samplers(model):
    import numpy as np

    from tame.inference import TemporalAMEHMC

    hmc = TemporalAMEHMC(model, num_chains=2, num_leapfrog=8, seed=0)
    out = hmc.sample(num_warmup=20, num_samples=20)
    assert np.all(np.isfinite(np.asarray(out.positions)))
    print(f"  HMC: 2 chains x 20 samples, accept "
          f"{float(np.asarray(out.accept_prob).mean()):.2f}")


def run_all_tests() -> int:
    _setup()
    start = time.time()
    print("=" * 70)
    print("tame integration runner")
    print("=" * 70)
    failures = 0
    try:
        print("\n[1/5] Data generation")
        model, Y, X = test_data_generation()
        print("\n[2/5] Three engines")
        results = test_three_engines(model)
        print("\n[3/5] Alignment + comparison")
        test_alignment_and_compare(results, X)
        print("\n[4/5] Figures")
        test_figures(results, X, Path("integration_output"))
        print("\n[5/5] Samplers")
        test_samplers(model)
    except Exception as e:  # noqa: BLE001
        failures += 1
        print(f"\nFAILED: {type(e).__name__}: {e}")

    elapsed = time.time() - start
    print("\n" + "=" * 70)
    if failures == 0:
        print(f"ALL INTEGRATION TESTS PASSED ({elapsed:.1f}s)")
    else:
        print(f"{failures} INTEGRATION TEST(S) FAILED ({elapsed:.1f}s)")
    print("=" * 70)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(run_all_tests())
