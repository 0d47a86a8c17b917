"""Run the torch reference implementation in an ISOLATED process.

The parity fixtures used to import torch into the pytest process; torch's
OpenMP runtime coexisting with XLA:CPU's compile threads was the prime
suspect for intermittent segfaults in later `backend_compile_and_load`
calls on 2-vCPU hosts (observed: suite crashes in tests that follow the
parity module, passing in isolation).  Running the reference here and
shipping results through an npz keeps torch out of the jax process
entirely.

Usage: python tests/_reference_runner.py <out.npz> {small|demo}
"""
import sys
from pathlib import Path

import numpy as np

REFERENCE = Path("/root/reference")


def small(out_path: str) -> None:
    sys.path.insert(0, str(REFERENCE))
    from src.inference import (
        TemporalAMENaiveMFVI as RefNaive,
        TemporalAMEStructuredMFVI as RefSMF,
    )
    from src.models import TemporalAMEModel as RefModel

    model = RefModel(n_nodes=10, n_time=5, latent_dim=1,
                     ar_coefficient=0.8, rho_dyadic=0.5, seed=42)
    Y, X = model.generate_data(return_latents=True)
    payload = {"Y": Y.numpy().copy(), "X_true": X.numpy().copy()}
    for name, vi in [
            ("naive", RefNaive(model, learning_rate=0.7, seed=0)),
            ("good", RefSMF(model, factorization="good",
                            learning_rate=0.7, seed=0)),
            ("bad", RefSMF(model, factorization="bad",
                           learning_rate=0.3, seed=0))]:
        history = vi.fit(max_iter=80, tolerance=1e-9, verbose=False)
        payload[f"{name}_mse"] = history["reconstruction_error"][-1]
        payload[f"{name}_elbo"] = history["elbo"][-1]
        payload[f"{name}_X_mean"] = vi.X_mean.detach().numpy().copy()
        payload[f"{name}_X_cov"] = vi.X_cov.detach().numpy().copy()
    np.savez(out_path, **payload)


def demo(out_path: str) -> None:
    sys.path.insert(0, str(REFERENCE))
    from src.models import TemporalAMEModel as RefModel

    model = RefModel(n_nodes=15, n_time=10, latent_dim=2,
                     ar_coefficient=0.8, rho_dyadic=0.5, seed=42)
    Y, X = model.generate_data(return_latents=True)
    np.savez(out_path, Y=Y.numpy().copy(), X_true=X.numpy().copy())


if __name__ == "__main__":
    {"small": small, "demo": demo}[sys.argv[2]](sys.argv[1])
