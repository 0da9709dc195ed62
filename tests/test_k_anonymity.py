"""k-anonymity suppression / redaction (operators/quality.k_anonymize)."""

import pytest


def _df(spark):
    rows = [
        (1, "en", "web"), (2, "en", "web"), (3, "en", "web"),
        (4, "fr", "web"),                       # singleton group
        (5, "en", "book"), (6, "en", "book"),
        (7, None, "web"), (8, None, "web"),     # NULL quasi group of 2
        (9, None, "book"),                      # NULL singleton
    ]
    return spark.createDataFrame(rows, "id long, lang string, src string")


def test_suppress_drops_under_k_groups(spark):
    from pandas_db_spark.operators.quality import k_anonymize

    out = k_anonymize(_df(spark), ["lang", "src"], k=2)
    assert {r["id"] for r in out.collect()} == {1, 2, 3, 5, 6, 7, 8}


def test_null_quasi_values_group_together(spark):
    """Two NULL-lang 'web' rows are ONE group of 2 — they survive k=2;
    the NULL-lang 'book' singleton does not.  A non-null-safe join
    would wrongly drop all three."""
    from pandas_db_spark.operators.quality import k_anonymize

    out = k_anonymize(_df(spark), ["lang", "src"], k=2)
    ids = {r["id"] for r in out.collect()}
    assert {7, 8} <= ids and 9 not in ids


def test_redact_mode_keeps_cardinality(spark):
    from pandas_db_spark.operators.quality import k_anonymize

    out = k_anonymize(_df(spark), ["lang", "src"], k=2, mode="redact")
    rows = {r["id"]: (r["lang"], r["src"]) for r in out.collect()}
    assert len(rows) == 9
    assert rows[4] == ("*", "*")           # singleton redacted
    assert rows[9] == ("*", "*")
    assert rows[1] == ("en", "web")        # big group untouched
    assert rows[7] == (None, "web")        # NULL group of 2 kept as-is


def test_k_one_is_identity_and_validation(spark):
    from pandas_db_spark.operators.quality import k_anonymize

    df = _df(spark)
    assert k_anonymize(df, ["lang"], k=1).count() == 9
    with pytest.raises(ValueError, match="k must be"):
        k_anonymize(df, ["lang"], k=0)
    with pytest.raises(ValueError, match="quasi_cols"):
        k_anonymize(df, [], k=2)
    with pytest.raises(ValueError, match="mode"):
        k_anonymize(df, ["lang"], k=2, mode="mask")
