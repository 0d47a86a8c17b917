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
    BaseTemporalVariationalInference,
    BaseVariationalInference,
    TemporalAMECaviVI,
    TemporalAMENaiveMFVI,
    TemporalAMEStructuredMFVI,
)
from tame.inference.hmc import TemporalAMEHMC, run_hmc
from tame.inference.logprob import (
    log_joint,
    log_likelihood,
    log_prior,
    make_logdensity_fn,
)
from tame.inference.nuts import TemporalAMENUTS, nuts_kernel, run_nuts
from tame.inference.smc import TemporalAMESMC, run_smc
from tame.inference.binary_cavi import (
    TemporalAMEBernoulliVI,
    fit_cavi_bernoulli,
)
from tame.inference.poisson_cavi import (
    TemporalAMEPoissonVI,
    fit_cavi_poisson,
)
from tame.inference.em import EMResult, em_update_params, fit_em
from tame.inference.family_smoothed import (
    SmoothedFamilyResult,
    fit_smoothed_family,
    warm_init_smoothed_family,
)
from tame.inference.smoothed import (
    TemporalAMESmoothedVI,
    fit_cavi_smoothed,
    warm_init_smoothed_state,
)

__all__ = [
    "CaviState",
    "FitResult",
    "cavi_step_jacobi",
    "cavi_step_seq",
    "compute_elbo",
    "fit_cavi",
    "init_state",
    "BaseVariationalInference",
    "BaseTemporalVariationalInference",
    "TemporalAMECaviVI",
    "TemporalAMENaiveMFVI",
    "TemporalAMEStructuredMFVI",
    "TemporalAMEHMC",
    "TemporalAMENUTS",
    "TemporalAMEBernoulliVI",
    "TemporalAMEPoissonVI",
    "TemporalAMESmoothedVI",
    "fit_cavi_bernoulli",
    "fit_cavi_poisson",
    "fit_cavi_smoothed",
    "warm_init_smoothed_state",
    "fit_em",
    "em_update_params",
    "EMResult",
    "SmoothedFamilyResult",
    "fit_smoothed_family",
    "warm_init_smoothed_family",
    "TemporalAMESMC",
    "run_nuts",
    "nuts_kernel",
    "run_hmc",
    "run_smc",
    "log_joint",
    "log_likelihood",
    "log_prior",
    "make_logdensity_fn",
]
