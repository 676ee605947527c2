from tslib_spark.datagen.crawl import generate_pages
from tslib_spark.datagen.series import (
    generate_arma,
    generate_harmonics,
    generate_trend,
    hide_consecutive,
    hide_random,
    single_ts_fixture,
    multi_ts_fixture,
)

__all__ = [
    "generate_pages",
    "generate_arma",
    "generate_harmonics",
    "generate_trend",
    "hide_random",
    "hide_consecutive",
    "single_ts_fixture",
    "multi_ts_fixture",
]
