"""Units conversion: pint-subset exactness (ported intent of
test/io/test_retrievers.py:118-140 — retrieved values must be converted
exactly, not approximately)."""

import pytest

from tsdat_spark.units import UnitsError, conversion


@pytest.mark.parametrize(
    "iu,ou,scale,offset",
    [
        ("degF", "degC", 5.0 / 9.0, -160.0 / 9.0),
        ("degC", "K", 1.0, 273.15),
        ("K", "degC", 1.0, -273.15),
        ("m/s", "km/h", 3.6, 0.0),
        ("km/h", "m/s", 1 / 3.6, 0.0),
        ("mm", "m", 1e-3, 0.0),
        ("ms", "s", 1e-3, 0.0),
        ("us", "s", 1e-6, 0.0),
        ("hPa", "mbar", 1.0, 0.0),
        ("ft", "m", 0.3048, 0.0),
        ("mi/h", "m/s", 0.44704, 0.0),
        ("kg*m/s^2", "g*m/s^2", 1000.0, 0.0),
        ("m s-1", "km h-1", 3.6, 0.0),
        ("lb", "kg", 0.45359237, 0.0),
    ],
)
def test_conversion_pairs(iu, ou, scale, offset):
    s, o = conversion(iu, ou)
    assert s == pytest.approx(scale, rel=1e-12)
    assert o == pytest.approx(offset, rel=1e-12, abs=1e-12)


def test_affine_round_trips_exact():
    s, o = conversion("degF", "degC")
    assert 32 * s + o == pytest.approx(0.0, abs=1e-12)
    assert 212 * s + o == pytest.approx(100.0, abs=1e-12)
    s2, o2 = conversion("degC", "degF")
    assert (212 * s + o) * s2 + o2 == pytest.approx(212.0, abs=1e-9)
    assert 100 * s2 + o2 == pytest.approx(212.0, abs=1e-9)


def test_short_circuits_match_tsdat():
    # unknown/dimensionless sides are pass-through in tsdat
    # (units_converter.py:46-56); "1" targets never rescale
    assert conversion("%", "1") == (1.0, 0.0)
    assert conversion("m", "m") == (1.0, 0.0)


def test_errors():
    with pytest.raises(UnitsError):
        conversion("m", "s")
    with pytest.raises(UnitsError):
        conversion("degC", "m")  # affine/linear mix
    with pytest.raises(UnitsError):
        conversion("florps", "m")


def test_strftime_to_java_literals_and_escaped_percent(spark):
    """ISO 'T' separators quote as literals; %% is a literal percent; an
    unknown directive and a dangling % still raise (string_to_datetime.py
    format contract, translated for java.time)."""
    import datetime as dt

    import pytest
    from pyspark.sql import functions as F

    from tsdat_spark.io.converters import StringToDatetime, strftime_to_java

    assert strftime_to_java("%Y-%m-%dT%H:%M:%S") == "yyyy-MM-dd'T'HH:mm:ss"
    assert strftime_to_java("%d%%%m") == "dd%MM"
    with pytest.raises(ValueError, match="unsupported strftime directive"):
        strftime_to_java("%Q")
    with pytest.raises(ValueError, match="dangling"):
        strftime_to_java("%Y-%")

    # end-to-end through Spark's parser: ISO-T and embedded-percent inputs
    df = spark.createDataFrame(
        [("2024-02-03T04:05:06", "03%02 2024")], "iso string, pct string"
    )
    out = df.select(
        StringToDatetime(format="%Y-%m-%dT%H:%M:%S")(F.col("iso")).alias("a"),
        StringToDatetime(format="%d%%%m %Y")(F.col("pct")).alias("b"),
    ).first()
    assert out["a"] == dt.datetime(2024, 2, 3, 4, 5, 6)
    assert out["b"] == dt.datetime(2024, 2, 3)
