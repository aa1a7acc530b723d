"""Resampling / regridding transforms with tsdat transform_v2 semantics
(``/root/reference/tsdat/transform_v2`` is the normative spec — SURVEY §2.6)."""

from .grid import GridSpec, grid_dataframe  # noqa: F401
from .bin_average import bin_average  # noqa: F401
from .nearest import nearest_neighbor  # noqa: F401
from .interpolate import interpolate_linear  # noqa: F401


def transform_auto(df, grid, series_keys, ts_col, value_cols, filter_bad_qc=False, qc=None):
    """tsdat TRANS_AUTO (``tsdat/transform/adi/adi_transformer.py:125``):
    average when downsampling (grid interval ≥ median input spacing),
    interpolate when upsampling. The spacing probe is one tiny
    aggregation job over a bounded sample."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    sample = df.select(F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us")).limit(100_000)
    w = W.partitionBy().orderBy("us")
    spacing = (
        sample.withColumn("d", F.col("us") - F.lag("us").over(w))
        .agg(F.expr("percentile(d, 0.5)"))
        .first()[0]
    )
    if spacing is None or grid.interval_us >= spacing:
        return bin_average(df, grid, series_keys, ts_col, value_cols,
                           filter_bad_qc=filter_bad_qc, qc=qc)
    return interpolate_linear(df, grid, series_keys, ts_col, value_cols, range_s=grid.interval_s)


def transform_passthrough(df, series_keys, ts_col, value_cols):
    """tsdat TRANS_PASSTHROUGH (``adi_transformation_types.py:7``,
    ``adi_transformer.py:129``: "all values passed directly through from the
    input, no transform takes place"): input samples ARE the output grid —
    a pure projection, no shuffle, no UDF."""
    from pyspark.sql import functions as F

    return df.select(*series_keys, F.col(ts_col).alias("label"), *value_cols)


#: the five declared ADI transformation types (adi_transformation_types.py:1-7)
TRANSFORMATION_TYPES = {
    "TRANS_AUTO": transform_auto,
    "TRANS_BIN_AVERAGE": bin_average,
    "TRANS_INTERPOLATE": interpolate_linear,
    "TRANS_SUBSAMPLE": nearest_neighbor,
    "TRANS_PASSTHROUGH": transform_passthrough,
}
