from tslib_spark.kernels.svd_kernel import fit_transform, impute, fit_weights, forecast
from tslib_spark.kernels import linalg

__all__ = ["fit_transform", "impute", "fit_weights", "forecast", "linalg"]
