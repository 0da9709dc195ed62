"""Semi-structured (JSON string) column extraction.

Event/properties payloads ship as JSON text (``events.props``).  The
scale-correct way to consume them in Spark is ``from_json`` with an
EXPLICIT schema: one vectorized JVM parse per row producing a struct, from
which any number of typed fields project for free.  The tempting
alternative — one ``get_json_object`` per field — re-parses the JSON
string once PER FIELD per row; at 100 TB that multiplies the hottest scan
by the field count.  ``json_field`` exists for the genuine one-off probe;
``with_json_fields`` is the pipeline path.

Schema inference (``infer_json_schema``) samples a bounded number of rows
through ``schema_of_json`` — never the full column — and is meant for
interactive discovery; production pipelines should pin the schema
literal it prints.

Reference scope: the reference engine has no JSON functions — this is
beyond-parity capability over the ``events`` table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def json_field(col: Column | str, path: str) -> Column:
    """One field as string via ``get_json_object`` (re-parses the JSON
    per call — fine for a single probe, wrong in a loop; see module
    docstring).  ``path`` is a JSONPath like ``$.k`` or ``$.a.b[0]``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, path)


def with_json_fields(df: DataFrame, json_col: str,
                     fields: dict[str, str],
                     keep_source: bool = True) -> DataFrame:
    """Extract many typed fields with ONE parse: ``fields`` maps new
    column name → Spark SQL type (e.g. ``{"k": "int", "tag": "string"}``
    for top-level keys).  Parses ``json_col`` once into a struct via
    ``from_json`` and projects each field out."""
    schema = ", ".join(f"`{name}` {typ}" for name, typ in fields.items())
    parsed = F.from_json(F.col(json_col), schema)
    out = df.withColumn("__parsed", parsed)
    for name in fields:
        out = out.withColumn(name, F.col(f"__parsed.{name}"))
    out = out.drop("__parsed")
    return out if keep_source else out.drop(json_col)


def infer_json_schema(df: DataFrame, json_col: str,
                      sample_rows: int = 100) -> str:
    """DDL schema string inferred from a bounded sample (interactive
    discovery helper — pin the result in production code).  Reads at
    most ``sample_rows`` non-null values through the driver."""
    rows = (df.select(F.col(json_col).alias("j"))
            .where(F.col("j").isNotNull()).limit(sample_rows).collect())
    if not rows:
        raise ValueError(f"infer_json_schema: no non-null rows in "
                         f"{json_col!r}")
    spark = df.sparkSession
    # Spark's own JSON source does the cross-sample schema merge
    # (schema_of_json only takes literals, one string at a time).
    import json as _json
    sample = spark.read.json(
        spark.sparkContext.parallelize([r["j"] for r in rows], 1))
    fields = [f for f in sample.schema.fields
              if not f.name.startswith("_corrupt")]
    if not fields:
        raise ValueError(
            "infer_json_schema: sampled values are not valid JSON "
            f"objects: {_json.dumps(rows[0]['j'])[:80]}")
    return ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                     for f in fields)
