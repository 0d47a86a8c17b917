"""Performance metrics for AME model evaluation.

Functional parity with the reference's ``src/utils/metrics.py`` (masked
MSE/RMSE/MAE/R^2/Pearson, temporal smoothness, link-prediction metrics,
calibration, coverage, horizon metrics, relative error) — all device-side
jnp, returning Python floats at the boundary like the reference.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np
from jax import Array


def _masked_mean(values: Array, mask: Optional[Array]) -> float:
    if mask is not None:
        total = jnp.sum(values * mask)
        count = jnp.sum(mask)
        return float(jnp.where(count == 0, 0.0, total / jnp.maximum(count, 1)))
    return float(jnp.mean(values))


def mean_squared_error(y_true: Array, y_pred: Array,
                       mask: Optional[Array] = None) -> float:
    """Masked MSE (reference ``metrics.py:35-69``)."""
    return _masked_mean((jnp.asarray(y_true) - jnp.asarray(y_pred)) ** 2, mask)


def root_mean_squared_error(y_true: Array, y_pred: Array,
                            mask: Optional[Array] = None) -> float:
    """RMSE = sqrt(MSE) (reference ``metrics.py:72-95``)."""
    return float(np.sqrt(mean_squared_error(y_true, y_pred, mask)))


def mean_absolute_error(y_true: Array, y_pred: Array,
                        mask: Optional[Array] = None) -> float:
    """Masked MAE (reference ``metrics.py:98-132``)."""
    return _masked_mean(jnp.abs(jnp.asarray(y_true) - jnp.asarray(y_pred)),
                        mask)


def r_squared(y_true: Array, y_pred: Array,
              mask: Optional[Array] = None) -> float:
    """Coefficient of determination (reference ``metrics.py:135-183``)."""
    y_true = jnp.asarray(y_true)
    y_pred = jnp.asarray(y_pred)
    if mask is not None:
        sel = jnp.asarray(mask) > 0
        y_true = y_true[sel]
        y_pred = y_pred[sel]
    else:
        y_true = y_true.ravel()
        y_pred = y_pred.ravel()
    if y_true.size == 0:
        return 0.0
    ss_tot = jnp.sum((y_true - y_true.mean()) ** 2)
    ss_res = jnp.sum((y_true - y_pred) ** 2)
    return float(jnp.where(ss_tot < 1e-10, 0.0,
                           1.0 - ss_res / jnp.maximum(ss_tot, 1e-10)))


def pearson_correlation(y_true: Array, y_pred: Array,
                        mask: Optional[Array] = None) -> float:
    """Pearson correlation coefficient (reference ``metrics.py:186-223``)."""
    y_true = jnp.asarray(y_true)
    y_pred = jnp.asarray(y_pred)
    if mask is not None:
        sel = jnp.asarray(mask) > 0
        y_true = y_true[sel]
        y_pred = y_pred[sel]
    else:
        y_true = y_true.ravel()
        y_pred = y_pred.ravel()
    if y_true.size < 2:
        return 0.0
    xc = y_true - y_true.mean()
    yc = y_pred - y_pred.mean()
    den = jnp.sqrt(jnp.sum(xc ** 2) * jnp.sum(yc ** 2))
    return float(jnp.where(den < 1e-10, 0.0,
                           jnp.sum(xc * yc) / jnp.maximum(den, 1e-10)))


def temporal_consistency_score(X: Array, order: int = 1) -> float:
    """Average magnitude of order-k finite differences along time
    (reference ``metrics.py:226-273``); lower = smoother."""
    X = jnp.asarray(X)
    n, T, d = X.shape
    if T < order + 1:
        return 0.0
    diffs = X[:, 1:, :] - X[:, :-1, :]
    for _ in range(order - 1):
        if diffs.shape[1] < 2:
            break
        diffs = diffs[:, 1:, :] - diffs[:, :-1, :]
    return float(jnp.linalg.norm(diffs, axis=-1).mean())


def link_prediction_metrics(Y_true: Array, Y_pred: Array,
                            threshold: float = 0.0) -> Dict[str, float]:
    """Binary link-prediction accuracy/precision/recall/F1 at a threshold,
    diagonal excluded (reference ``metrics.py:276-347``)."""
    Y_true = jnp.asarray(Y_true)
    Y_pred = jnp.asarray(Y_pred)
    n = Y_true.shape[0]
    mask = 1.0 - jnp.eye(n)
    tb = (Y_true * mask > threshold)
    pb = (Y_pred * mask > threshold)
    tp = float(jnp.sum(tb & pb))
    tn = float(jnp.sum(~tb & ~pb))
    fp = float(jnp.sum(~tb & pb))
    fn = float(jnp.sum(tb & ~pb))
    total = tp + tn + fp + fn
    accuracy = (tp + tn) / total if total > 0 else 0.0
    precision = tp / (tp + fp) if (tp + fp) > 0 else 0.0
    recall = tp / (tp + fn) if (tp + fn) > 0 else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if (precision + recall) > 0 else 0.0)
    return {"accuracy": accuracy, "precision": precision,
            "recall": recall, "f1": f1}


def calibration_error(predictions: Array, uncertainties: Array,
                      targets: Array, n_bins: int = 10) -> float:
    """Expected calibration error via uncertainty-sorted binning
    (reference ``metrics.py:350-418``)."""
    predictions = np.asarray(predictions).ravel()
    uncertainties = np.asarray(uncertainties).ravel()
    targets = np.asarray(targets).ravel()
    errors = np.abs(predictions - targets)
    order = np.argsort(uncertainties)
    errors_sorted = errors[order]
    unc_sorted = uncertainties[order]
    n = len(predictions)
    bin_size = n // n_bins
    ece = 0.0
    for i in range(n_bins):
        start = i * bin_size
        end = (i + 1) * bin_size if i < n_bins - 1 else n
        if end <= start:
            continue
        weight = (end - start) / n
        ece += weight * abs(errors_sorted[start:end].mean()
                            - unc_sorted[start:end].mean())
    return float(ece)


def compute_coverage(predictions: Array, lower_bounds: Array,
                     upper_bounds: Array, targets: Array) -> float:
    """Empirical coverage of prediction intervals
    (reference ``metrics.py:421-462``)."""
    targets = jnp.asarray(targets)
    inside = ((targets >= jnp.asarray(lower_bounds))
              & (targets <= jnp.asarray(upper_bounds)))
    return float(inside.mean())


def temporal_prediction_metrics(Y_true: Array, Y_pred: Array,
                                horizon: int = 1) -> Dict[str, float]:
    """MSE/MAE/R^2 restricted to times >= horizon
    (reference ``metrics.py:465-518``)."""
    Y_true = jnp.asarray(Y_true)
    Y_pred = jnp.asarray(Y_pred)
    n, _, T, _ = Y_true.shape
    if T <= horizon:
        return {"mse": float("inf"), "mae": float("inf"), "r2": 0.0}
    Yt = Y_true[:, :, horizon:, :]
    Yp = Y_pred[:, :, horizon:, :]
    mask = jnp.broadcast_to(
        (1.0 - jnp.eye(n))[:, :, None, None], Yt.shape)
    return {
        "mse": mean_squared_error(Yt, Yp, mask),
        "mae": mean_absolute_error(Yt, Yp, mask),
        "r2": r_squared(Yt, Yp, mask),
    }


def relative_error(y_true: Array, y_pred: Array,
                   epsilon: float = 1e-8) -> float:
    """Mean |err| / (|true| + eps) (reference ``metrics.py:521-546``)."""
    y_true = jnp.asarray(y_true)
    y_pred = jnp.asarray(y_pred)
    return float((jnp.abs(y_true - y_pred)
                  / (jnp.abs(y_true) + epsilon)).mean())
