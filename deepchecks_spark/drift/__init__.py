from deepchecks_spark.drift.kernels import (
    OTHER_CATEGORY_NAME,
    PSI_MIN_PERCENTAGE,
    cramers_v_from_counts,
    emd_from_hist,
    ks_from_hist,
    preprocess_counts_to_same_bins,
    psi_from_counts,
    weighted_quantile_linear,
)
from deepchecks_spark.drift.spark import (
    calc_drift_score,
    categorical_histograms,
    numeric_histograms,
)

__all__ = [
    "OTHER_CATEGORY_NAME",
    "PSI_MIN_PERCENTAGE",
    "cramers_v_from_counts",
    "emd_from_hist",
    "ks_from_hist",
    "preprocess_counts_to_same_bins",
    "psi_from_counts",
    "weighted_quantile_linear",
    "calc_drift_score",
    "categorical_histograms",
    "numeric_histograms",
]
