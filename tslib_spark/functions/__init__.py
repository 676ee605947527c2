from tslib_spark.functions.scalar import normalize_expr, unnormalize_expr, rmse_agg
from tslib_spark.functions import text

__all__ = ["normalize_expr", "unnormalize_expr", "rmse_agg", "text"]
