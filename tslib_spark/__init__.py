"""tslib_spark — a from-scratch PySpark-native time-series analytics engine.

Capabilities mirror jehangiramjad/tslib (matrix-estimation imputation /
forecasting, Robust Synthetic Control) re-expressed Spark-first, extended
with a web-scale rollup -> gap-fill -> downsample -> retention pipeline
over Common-Crawl-style page tables, Gorilla/delta-of-delta compression,
checkpoint/lineage resumability, and large-scale training-data operators
(dedup, similarity search, text analysis, multimodal plumbing).

Nothing here is a port of the reference's execution code: the reference is
pure single-process numpy/pandas; this engine declares logical plans with
the DataFrame API and drops to Arrow-vectorized ``applyInPandas`` kernels
only for the linear-algebra semantics Spark cannot express natively.
"""

__version__ = "0.1.0"
