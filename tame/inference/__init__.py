"""Inference engines: batched CAVI (naive / structured MF), HMC, SMC."""

from tame.inference.cavi import (
    CaviState,
    FitResult,
    cavi_step_jacobi,
    cavi_step_seq,
    compute_elbo,
    fit_cavi,
    init_state,
)
from tame.inference.engine import (
    TemporalAMECaviVI,
    TemporalAMENaiveMFVI,
    TemporalAMEStructuredMFVI,
)

__all__ = [
    "CaviState",
    "FitResult",
    "cavi_step_jacobi",
    "cavi_step_seq",
    "compute_elbo",
    "fit_cavi",
    "init_state",
    "TemporalAMECaviVI",
    "TemporalAMENaiveMFVI",
    "TemporalAMEStructuredMFVI",
]
