"""JDBC source tests (SURVEY §2.1 S1/S2): option contract + reader
construction, plus EXECUTED round-trips against embedded Derby (the
Derby jars ship with Spark for the Hive metastore) — real predicate
pushdown, in-database join pushdown, and partitioned parallel reads."""

from __future__ import annotations

import pytest

from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.jdbc import (
    jdbc_options,
    jdbc_query_reader,
    jdbc_table_reader,
)

URL = "jdbc:postgresql://db:5432/pizzeria"


def test_jdbc_options_basic():
    opts = jdbc_options(URL, "orders", user="u", password="p")
    assert opts["url"] == URL
    assert opts["dbtable"] == "orders"
    assert opts["pushDownPredicate"] == "true"
    assert "partitionColumn" not in opts


def test_jdbc_options_partitioned_read():
    opts = jdbc_options(
        URL, "orders",
        partition_column="id", lower_bound=0, upper_bound=1_000_000, num_partitions=64,
    )
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "64"


def test_jdbc_options_partition_quartet_enforced():
    with pytest.raises(ValueError, match="partition"):
        jdbc_options(URL, "orders", partition_column="id", num_partitions=8)


def test_datagen_users_sessions(spark):
    """S9: deterministic distributed generation — same inputs, same rows;
    schemas per reference scripts/datagen.py:39,64."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.datagen import sessions, users

    u = users(spark, n=50)
    assert u.columns == ["id", "username"]
    assert u.count() == 50

    s1 = sessions(spark, n=1000, n_users=50, partitions=4)
    s2 = sessions(spark, n=1000, n_users=50, partitions=8)
    assert s1.columns == ["user_id", "session_time", "ip_address", "browser"]
    # partition count must not change content (purely hash-derived rows)
    assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s2.collect()))
    assert s1.select("user_id").distinct().count() <= 50

    # the secondary pipeline's hourly aggregation runs on it
    from pyspark.sql import functions as F

    hourly = s1.groupBy(F.date_trunc("hour", "session_time").alias("hour")).count()
    assert hourly.count() > 0


def test_live_sessions_stream_shape(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.datagen import live_sessions_stream

    stream = live_sessions_stream(spark, rows_per_second=5)
    assert stream.isStreaming
    assert stream.columns == ["user_id", "session_time", "ip_address", "browser"]


def test_jdbc_readers_construct_without_driver(spark):
    """Building the reader must not require connectivity (S2 view-pushdown
    shape included: dbtable = (subquery) alias)."""
    jdbc_table_reader(spark, URL, "orders", user="u")
    jdbc_query_reader(
        spark, URL,
        "SELECT o.id, c.name FROM orders o JOIN clients c ON o.client_id = c.id",
    )


# --- Executed JDBC round-trip against embedded Derby (ships with Spark) ---

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "pizzeria_db"
    return f"jdbc:derby:{db};create=true"


def _write_jdbc(df, url, table, col_types=None):
    w = df.write.format("jdbc").option("url", url).option("dbtable", table).option("driver", DERBY_DRIVER)
    if col_types:
        w = w.option("createTableColumnTypes", col_types)
    w.mode("overwrite").save()


def test_jdbc_roundtrip_with_pushdown(spark, derby_url):
    """S1 executed end-to-end: write through Spark JDBC, read back via
    read_jdbc, and verify the filter is pushed into the database scan."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.jdbc import read_jdbc

    rows = [(i, f"client_{i % 4}", 5 + i % 3) for i in range(100)]
    df = spark.createDataFrame(rows, "id int, client string, price int")
    _write_jdbc(df, derby_url, "orders_t", "client VARCHAR(32)")

    back = read_jdbc(spark, derby_url, "orders_t", driver=DERBY_DRIVER)
    assert back.count() == 100

    filtered = back.filter(back["id"] >= 90).select("id", "price")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(id,90)" in plan.replace("`", "")
    assert filtered.count() == 10


def test_jdbc_query_pushdown_joins_in_database(spark, derby_url):
    """S2 executed: the scenario-2 view pattern — a two-table join runs
    INSIDE the database via dbtable=(subquery); Spark scans the result."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.jdbc import jdbc_query_reader

    orders = spark.createDataFrame([(1, 10), (2, 20), (3, 10)], "oid int, cid int")
    clients = spark.createDataFrame([(10, "ann"), (20, "bob")], "cid int, cname string")
    _write_jdbc(orders, derby_url, "o_t")
    _write_jdbc(clients, derby_url, "c_t", "cname VARCHAR(32)")

    # Spark's JDBC writer quotes column identifiers (they stay lowercase
    # in Derby) but passes the table name through unquoted — so the
    # pushed query quotes columns and leaves table names bare.
    joined = jdbc_query_reader(
        spark,
        derby_url,
        'SELECT o."oid", c."cname" FROM o_t o JOIN c_t c ON o."cid" = c."cid"',
        driver=DERBY_DRIVER,
    ).load()
    got = {(r["oid"], r["cname"]) for r in joined.collect()}
    assert got == {(1, "ann"), (2, "bob"), (3, "ann")}
    # single scan node, no Spark-side join: the join happened in the DB
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_jdbc_partitioned_parallel_read(spark, derby_url):
    """Partitioned range read (the 100 TB story): the quartet splits the
    scan into N parallel bounded queries."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.jdbc import read_jdbc

    df = spark.createDataFrame([(i, i * 2) for i in range(1000)], "id int, v int")
    _write_jdbc(df, derby_url, "part_t")

    back = read_jdbc(
        spark, derby_url, "part_t", driver=DERBY_DRIVER,
        partition_column="id", lower_bound=0, upper_bound=1000, num_partitions=8,
    )
    assert back.rdd.getNumPartitions() == 8
    assert back.count() == 1000
    assert back.agg({"v": "sum"}).head()[0] == sum(i * 2 for i in range(1000))


def test_debezium_replay_realistic_envelopes(spark):
    """Replay fixture with realistically-shaped Debezium-Postgres events
    (per the public Debezium connector docs): snapshot read (op 'r',
    snapshot flag), create, update with REPLICA IDENTITY FULL before-image,
    delete carrying only the before-image, a post-delete Kafka tombstone
    (null value), and a schemas.enable=true wrapped event mixed into the
    same topic — envelope fidelity beyond the synthetic fixtures."""
    import json

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.debezium import decode_debezium

    src = {
        "version": "2.5.0.Final", "connector": "postgresql", "name": "my_pg",
        "ts_ms": 1_700_000_000_000, "snapshot": "false", "db": "defaultdb",
        "sequence": "[\"36972496\",\"36972496\"]", "schema": "public",
        "table": "orders", "txId": 761, "lsn": 36972496, "xmin": None,
    }

    def ev(op, before, after, ts, snapshot="false", txid=761):
        return json.dumps({
            "before": before, "after": after,
            "source": {**src, "ts_ms": ts, "snapshot": snapshot, "txId": txid},
            "op": op, "ts_ms": ts + 3,
        })

    r1 = {"id": 1, "client_name": "ann", "amount": 10}
    r1b = {"id": 1, "client_name": "ann", "amount": 12}
    r2 = {"id": 2, "client_name": "bob", "amount": 20}
    events = [
        ev("r", None, r1, 1_700_000_000_000, snapshot="first"),   # snapshot read
        ev("c", None, r2, 1_700_000_001_000, txid=762),           # insert
        ev("u", r1, r1b, 1_700_000_002_000, txid=763),            # update, full before-image
        ev("d", r2, None, 1_700_000_003_000, txid=764),           # delete: before-image only
        None,                                                     # Kafka tombstone after delete
        # schemas.enable=true wrapper (JsonConverter) on the same topic
        json.dumps({
            "schema": {"type": "struct", "name": "my_pg.public.orders.Envelope"},
            "payload": json.loads(ev("c", None, {"id": 3, "client_name": "eve", "amount": 30},
                                     1_700_000_004_000, txid=765)),
        }),
    ]
    df = spark.createDataFrame([(e,) for e in events], "value string")
    out = decode_debezium(df, "id int, client_name string, amount int").collect()

    by_tx = {r["txId"]: r for r in out}
    assert len(out) == 5  # tombstone dropped
    assert by_tx[761]["op"] == "r" and by_tx[761]["amount"] == 10      # snapshot -> after image
    assert by_tx[762]["op"] == "c" and by_tx[762]["client_name"] == "bob"
    assert by_tx[763]["op"] == "u" and by_tx[763]["amount"] == 12      # update -> after image
    assert by_tx[764]["op"] == "d" and by_tx[764]["amount"] == 20      # delete -> before image
    assert by_tx[765]["op"] == "c" and by_tx[765]["amount"] == 30      # unwrapped from payload
    # event time comes from source.ts_ms, not envelope ts_ms
    assert by_tx[764]["event_time"].timestamp() * 1000 == 1_700_000_003_000
    assert by_tx[764]["lsn"] == 36972496


def test_startup_mode_translation():
    """S6: every Flink scan.startup.mode maps to the right Spark Kafka
    option (or a documented refusal for group-offsets)."""
    import json

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.streaming import startup_offsets

    assert startup_offsets("earliest-offset", "t") == {"startingOffsets": "earliest"}
    assert startup_offsets("latest-offset", "t") == {"startingOffsets": "latest"}
    ts = startup_offsets("timestamp", "orders", timestamp_ms=1_700_000_000_000)
    assert json.loads(ts["startingOffsetsByTimestamp"]) == {"orders": {"*": 1_700_000_000_000}}
    sp = startup_offsets("specific-offsets", "orders", specific={0: 42, 3: 7})
    assert json.loads(sp["startingOffsets"]) == {"orders": {"0": 42, "3": 7}}
    for bad in ("group-offsets", "bogus"):
        with pytest.raises(ValueError):
            startup_offsets(bad, "t")
    with pytest.raises(ValueError):
        startup_offsets("timestamp", "t")
    with pytest.raises(ValueError):
        startup_offsets("specific-offsets", "t")


def test_jsonl_roundtrip_and_failfast(spark, tmp_path):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.batch import read_jsonl, write_jsonl

    df = spark.createDataFrame(
        [(1, "hello world", "en"), (2, "bonjour", "fr")], "doc_id bigint, text string, lang string"
    )
    out = str(tmp_path / "corpus")
    write_jsonl(df, out, compression="gzip", partitions=1)
    back = read_jsonl(spark, out, "doc_id bigint, text string, lang string")
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}

    # malformed line: FAILFAST raises, lenient quarantines
    import gzip, os, pytest as _pytest

    bad_dir = str(tmp_path / "bad")
    os.makedirs(bad_dir)
    with open(os.path.join(bad_dir, "a.json"), "w") as fh:
        fh.write('{"doc_id": 1, "text": "ok", "lang": "en"}\n')
        fh.write("{not json at all\n")
    with _pytest.raises(Exception):
        read_jsonl(spark, bad_dir, "doc_id bigint, text string, lang string").collect()
    lenient = read_jsonl(spark, bad_dir, "doc_id bigint, text string, lang string", lenient=True)
    rows = lenient.collect()
    assert len(rows) == 2
    assert sum(1 for r in rows if r._corrupt_record is not None) == 1


def test_csv_read_failfast_and_quarantine(spark, tmp_path):
    """Schema-enforced CSV: clean file round-trips; a malformed row fails
    the strict read and routes to quarantine under lenient."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.batch import (
        quarantine_split,
        read_csv,
    )

    good = tmp_path / "good.csv"
    good.write_text('id,name,score\n1,"a,comma",2.5\n2,plain,3.0\n')
    df = read_csv(spark, str(good), "id int, name string, score double")
    rows = {(r["id"], r["name"], r["score"]) for r in df.collect()}
    assert rows == {(1, "a,comma", 2.5), (2, "plain", 3.0)}

    bad = tmp_path / "bad.csv"
    bad.write_text("id,name,score\n1,ok,2.5\nnot_an_int,x,nope\n")
    with pytest.raises(Py4JJavaError):
        read_csv(spark, str(bad), "id int, name string, score double").collect()

    lenient = read_csv(
        spark, str(bad), "id int, name string, score double", lenient=True
    )
    clean, quarantined = quarantine_split(lenient)
    assert {(r["id"], r["name"]) for r in clean.collect()} == {(1, "ok")}
    assert [r["raw"] for r in quarantined.collect()] == ["not_an_int,x,nope"]


def test_quarantine_split_requires_lenient(spark):
    import pytest

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.batch import quarantine_split

    df = spark.range(3)
    with pytest.raises(ValueError):
        quarantine_split(df)
