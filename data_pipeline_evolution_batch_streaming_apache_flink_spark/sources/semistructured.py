"""Semi-structured payload decoding: VARIANT shredding and XML.

The reference's format surface is JSON-centric (plain JSON,
debezium-json — `flink-applications/05-kafka-logical-msg-flink.json:4`
consumes JSON payloads decoded per-field). Two adjacent payload shapes
a corpus-scale ingest layer meets constantly are covered here,
Spark-natively:

- **VARIANT** (Spark 4's open semi-structured type): parse once into
  the binary variant encoding, extract typed fields lazily. Unlike
  ``get_json_object`` (re-parses the string per extraction), a parsed
  variant is decoded ONCE per row; every ``variant_get`` is a cheap
  binary traversal — the right shape when one payload feeds many
  extractions. Schema drift is free: unknown paths return NULL, no
  schema declaration up front.
- **XML** (Spark 4 native ``from_xml``): element-schema decode of
  XML payload columns — feeds, sitemaps, legacy enterprise exports.

Both are row-local JVM decoders (no UDF, no shuffle); the downstream
typed columns behave exactly like any other column for pruning and
pushdown. At 100 TB the parse cost is the scan stage's CPU — which is
the place you want it: embarrassingly parallel, no exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_variant", "shred_variant", "decode_xml"]


def parse_variant(col: Column | str) -> Column:
    """JSON string -> VARIANT. Malformed input raises (ingest-gate
    semantics — route through ``try_parse_json`` upstream to quarantine
    instead)."""
    return F.parse_json(F.col(col) if isinstance(col, str) else col)


def shred_variant(
    df: DataFrame,
    col: str,
    fields: dict[str, tuple[str, str]],
    keep_variant: bool = False,
) -> DataFrame:
    """Shred a VARIANT (or JSON-string) column into typed top-level
    columns: ``fields`` maps output name -> (variant path like
    ``$.a.b[0]``, SQL type). A JSON-string input column is parsed once;
    absent paths and cast failures yield NULL (drift-tolerant).

    One row-local projection — the explicit column form downstream
    operators join/aggregate on, while ``keep_variant=True`` carries the
    full payload for late schema additions.
    """
    src = df.schema[col].dataType.simpleString()
    v = F.col(col) if src == "variant" else F.parse_json(F.col(col))
    out = df.withColumn("__v", v)
    cols = [c for c in df.columns if c != col or keep_variant]
    extracted = [
        F.expr(f"try_variant_get(__v, '{path}', '{typ}')").alias(name)
        for name, (path, typ) in fields.items()
    ]
    return out.select(*cols, *extracted)


def decode_xml(
    df: DataFrame, col: str, schema: str, prefix: str | None = None
) -> DataFrame:
    """Decode an XML payload column with an element schema (Spark 4
    native ``from_xml`` — DDL string like ``'status STRING, total
    DOUBLE'``). Decoded fields are flattened to top-level columns
    (optionally ``prefix``-ed); the raw column is dropped. Unparseable
    rows decode to NULL fields (PERMISSIVE), mirroring ``read_csv``'s
    lenient path.
    """
    out = df.withColumn("__x", F.expr(f"from_xml({col}, '{schema}')"))
    names = [f.name for f in out.schema["__x"].dataType.fields]
    flat = [
        F.col(f"__x.{n}").alias(f"{prefix}{n}" if prefix else n) for n in names
    ]
    keep = [c for c in df.columns if c != col]
    return out.select(*keep, *flat)
