"""CF-convention time encoding shared by the sci-format codecs
(NetCDF3 + Zarr): ``<unit> since <epoch>`` numeric arrays <-> pandas
timestamps. Executor-safe (pure numpy/pandas, no Spark API)."""

from __future__ import annotations

import numpy as np

#: CF unit word -> microseconds per unit (plurals and singulars)
CF_UNIT_US = {
    "microseconds": 1, "microsecond": 1, "us": 1,
    "milliseconds": 1_000, "millisecond": 1_000, "ms": 1_000,
    "seconds": 1_000_000, "second": 1_000_000, "sec": 1_000_000, "s": 1_000_000,
    "minutes": 60_000_000, "minute": 60_000_000, "min": 60_000_000,
    "hours": 3_600_000_000, "hour": 3_600_000_000, "h": 3_600_000_000,
    "days": 86_400_000_000, "day": 86_400_000_000, "d": 86_400_000_000,
}


def decode_cf_time(arr: np.ndarray, units: str):
    """Numeric CF array + ``'<unit> since <epoch>'`` -> pandas datetime
    Series values; NaN entries decode to NaT (nulls round-trip as nulls)."""
    import pandas as pd

    unit_word, _, epoch = units.partition(" since ")
    unit_word = unit_word.strip().lower()
    if unit_word not in CF_UNIT_US:
        raise ValueError(f"unsupported CF time unit {unit_word!r} in {units!r}")
    base = pd.Timestamp(epoch.strip())
    vals = np.asarray(arr, dtype="float64") * CF_UNIT_US[unit_word]
    nat = ~np.isfinite(vals)
    us = np.where(nat, 0, vals).astype("int64")
    out = base + pd.to_timedelta(us, unit="us")
    if nat.any():
        out = out.to_series(index=None).reset_index(drop=True)
        out[nat] = pd.NaT
    return out


def encode_cf_micros(a: np.ndarray) -> np.ndarray:
    """datetime64 array -> float64 microseconds-since-epoch with NaT as NaN
    (so nulls survive instead of becoming INT64_MIN garbage dates)."""
    a = np.asarray(a).astype("datetime64[us]")
    out = a.astype("int64").astype("float64")
    out[np.isnat(a)] = np.nan
    return out


CF_EPOCH_US_UNITS = "microseconds since 1970-01-01 00:00:00"
