"""Scalar / aggregate gap-fillers for the reference's function surface.

Everything here is a thin composition of JVM-side built-ins
(``pyspark.sql.functions``) so the whole expression stays inside
whole-stage codegen — no Python UDFs on the hot path. Reference citations
point into /root/reference (SURVEY.md §2.3, §2.5, §2.6).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# ---------------------------------------------------------------------------
# Date / time (SURVEY §2.3)
# ---------------------------------------------------------------------------

def ceil_to_hour(ts: Column | str) -> Column:
    """Flink/PG ``CEIL(ts TO HOUR)``: round up to the next hour boundary,
    identity when already on a boundary.

    Reference: the hourly-window filter ``order_time > CEIL(LOCALTIMESTAMP
    TO HOUR) - INTERVAL '1' HOUR`` (README.md:132,
    flink-applications/01-basic-jdbc.json:30). Spark has ``date_trunc`` but
    no timestamp CEIL, so:  trunc(ts) == ts ? ts : trunc(ts) + 1 hour.
    """
    ts = _c(ts)
    trunc = F.date_trunc("hour", ts)
    return F.when(trunc == ts, ts).otherwise(trunc + F.expr("INTERVAL 1 HOUR"))


def floor_to_hour(ts: Column | str) -> Column:
    """PG ``date_trunc('hour', ts)`` (README.md:89-90)."""
    return F.date_trunc("hour", _c(ts))


def to_timestamp_ltz_millis(epoch_ms: Column | str) -> Column:
    """Flink ``TO_TIMESTAMP_LTZ(epoch_ms, 3)``
    (flink-applications/03-kafka-cdc-flink-jdbc.json:8)."""
    return F.timestamp_millis(_c(epoch_ms).cast("bigint"))


def proctime() -> Column:
    """Flink ``proctime()`` (flink-applications/03-flink-cdc-jdbc.json:4).

    Spark evaluates ``current_timestamp()`` once per query / micro-batch,
    so processing-time semantics are per-batch rather than per-row —
    documented engine semantics (SURVEY §7.3 item 4).
    """
    return F.current_timestamp()


# ---------------------------------------------------------------------------
# JSON construction / extraction (SURVEY §2.5 A2-A4, §2.6 F1-F6)
# ---------------------------------------------------------------------------

def json_object(**fields: Column | str) -> Column:
    """Flink ``JSON_OBJECT('k' VALUE v, ...)`` / PG ``JSON_BUILD_OBJECT``
    (README.md:121-126, 78-83) as a struct ready for json_arrayagg or
    ``to_json``."""
    return F.struct(*[_c(v).alias(k) for k, v in fields.items()])


def json_arrayagg(struct_col: Column, deterministic: bool = True) -> Column:
    """Flink ``JSON_ARRAYAGG(...)`` / PG ``JSON_AGG(...)``
    (flink-applications/01-basic-jdbc.json:30, README.md:78-83).

    Collects per-group structs into a JSON array string, **keeping
    duplicates** (multiset semantics — the reference's seed orders like
    ``'{1,1,1,1}'`` rely on it, scripts/load_dims.sql:54).

    ``collect_list`` order is nondeterministic post-shuffle, so by default
    the array is sorted before serialization to make output stable for
    oracle comparison (SURVEY §7.3 item 5).
    """
    collected = F.collect_list(struct_col)
    if deterministic:
        collected = F.sort_array(collected)
    return F.to_json(collected)


def json_value(doc: Column | str, path: str, returning: str | None = None) -> Column:
    """Flink ``JSON_VALUE(doc, '$.path' [RETURNING t])`` (README.md:406-408)."""
    out = F.get_json_object(_c(doc), path)
    return out.cast(returning) if returning else out


def json_query(doc: Column | str, path: str) -> Column:
    """Flink ``JSON_QUERY(doc, '$.path')`` — returns the JSON fragment as
    text (README.md:409)."""
    return F.get_json_object(_c(doc), path)


def from_base64_str(col: Column | str) -> Column:
    """Flink ``FROM_BASE64(s)`` used as text (README.md:400,406-409)."""
    return F.unbase64(_c(col)).cast("string")


def debezium_decimal(col: Column | str, scale: int) -> Column:
    """Decode a Debezium precise-mode DECIMAL field (Kafka Connect logical
    type ``org.apache.kafka.connect.data.Decimal``): the JSON value is the
    base64 of the big-endian two's-complement UNSCALED integer, with the
    scale carried in the schema block — the default
    ``decimal.handling.mode=precise`` wire format of the Postgres
    connector (the reference's PostgresConnector configs,
    kafka-connectors/orders-cdc.json:1-15, leave the mode at its
    default, so numeric columns arrive in exactly this encoding).

    Pure codegen'd expression: unbase64 → hex → conv() magnitude, then a
    two's-complement sign correction when the top bit of the first byte is
    set. The 2^(8n) correction constants are exact DECIMAL literals
    selected by byte length — going through ``pow()`` doubles would lose
    the low bits of 2^64 in the double→decimal cast (Spark casts via the
    double's decimal string). Exact for unscaled values up to 8 bytes
    (|v| < 2^63 — 18 digits, ample for money columns); LONGER payloads
    decode to NULL rather than a silently wrapped value — they need a
    schema change upstream, not a decoder. NULL passes through.
    """
    b = F.unbase64(_c(col))
    n = F.octet_length(b)
    mag = F.conv(F.hex(b), 16, 10).cast("decimal(20,0)")
    full = None  # 2^(8n): subtracted when the sign bit is set
    half = None  # 2^(8n-1): the sign-bit threshold
    for i in range(1, 9):
        fv = F.lit(str(1 << (8 * i))).cast("decimal(21,0)")
        hv = F.lit(str(1 << (8 * i - 1))).cast("decimal(21,0)")
        full = F.when(n == i, fv) if full is None else full.when(n == i, fv)
        half = F.when(n == i, hv) if half is None else half.when(n == i, hv)
    signed = F.when(mag >= half, mag - full).otherwise(mag)
    # n > 8 bytes: conv() has already wrapped — NULL, never silent garbage
    return F.when(n <= 8, (signed / F.lit(10 ** scale)).cast(f"decimal(20,{scale})"))
