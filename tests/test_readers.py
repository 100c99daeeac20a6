"""Reader/writer surface (S-1..S-5): JSON round trip, inferred CSV."""

from __future__ import annotations


def test_readers_json(spark, tmp_path):
    from azure_serverless_etl_pipeline_spark.sources.readers import read_json_records
    from azure_serverless_etl_pipeline_spark.sources.writers import write_json_records

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, name string, v double"
    )
    out = str(tmp_path / "records")
    write_json_records(df, out, single_file=True)
    back = read_json_records(spark, out + "/*.json", multi_line=False)
    a = df.toPandas().sort_values("id", ignore_index=True)
    b = back.select("id", "name", "v").toPandas().sort_values("id", ignore_index=True)
    assert a.equals(b)


def test_csv_inferred_vs_all_strings(spark, tmp_path):
    from azure_serverless_etl_pipeline_spark.sources.readers import (
        read_csv,
        read_csv_inferred,
    )

    p = tmp_path / "t.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    inferred = read_csv_inferred(spark, str(p))
    assert dict(inferred.dtypes)["a"] in ("int", "bigint")
    strings = read_csv(spark, str(p), all_strings=True)
    assert set(t for _, t in strings.dtypes) == {"string"}
    assert strings.count() == 2


def test_run_sql_parameter_binding(spark):
    from azure_serverless_etl_pipeline_spark.serving import run_sql
    from azure_serverless_etl_pipeline_spark.sources import register_views
    from tests.conftest import SF_ORACLE

    register_views(spark, SF_ORACLE, "orders")
    df = run_sql(
        spark,
        "SELECT count(*) AS n FROM orders WHERE o_orderpriority = :prio",
        {"prio": "1-URGENT"},
    )
    n = df.collect()[0]["n"]
    assert n > 0
    # injection attempt stays a literal, not SQL
    evil = run_sql(
        spark,
        "SELECT count(*) AS n FROM orders WHERE o_orderpriority = :prio",
        {"prio": "x' OR '1'='1"},
    )
    assert evil.collect()[0]["n"] == 0


def test_testdata_schema_sentinel(spark):
    """Early-warning gate for testdata regenerations (the round-3 pattern:
    events.ts silently became TIMESTAMP_NTZ and broke every watermark
    site). Pins the columns and type CLASSES each operator family
    depends on, so a drift fails here with a readable message instead of
    deep inside a query plan."""
    from pyspark.sql import types as T

    from azure_serverless_etl_pipeline_spark.sources import load_table
    from tests.conftest import SF_ORACLE

    need = {
        "lineitem": {"l_orderkey", "l_quantity", "l_extendedprice",
                     "l_discount", "l_shipdate", "l_returnflag"},
        "orders": {"o_orderkey", "o_custkey", "o_orderdate",
                   "o_totalprice", "o_orderstatus"},
        "customer": {"c_custkey", "c_acctbal", "c_mktsegment"},
        "events": {"event_id", "user_id", "ts", "event_type", "value"},
        "documents": {"doc_id", "text", "lang", "source"},
        "embeddings": {"vec_id", "embedding", "label"},
    }
    for table, cols in need.items():
        df = load_table(spark, SF_ORACLE, table)
        missing = cols - set(df.columns)
        assert not missing, f"{table} lost columns {missing}"
    ev = load_table(spark, SF_ORACLE, "events")
    ts_type = ev.schema["ts"].dataType
    # either tz or ntz timestamp is fine — every consumer guards via
    # ensure_event_time / cast — but a non-timestamp type is a break
    assert isinstance(
        ts_type, (T.TimestampType, T.TimestampNTZType)
    ), f"events.ts decoded as {ts_type} — update sources/catalog.py"
    emb = load_table(spark, SF_ORACLE, "embeddings")
    el = emb.schema["embedding"].dataType
    assert isinstance(el, T.ArrayType) and isinstance(
        el.elementType, (T.FloatType, T.DoubleType)
    ), f"embeddings.embedding decoded as {el}"
    doc = load_table(spark, SF_ORACLE, "documents")
    assert isinstance(doc.schema["text"].dataType, T.StringType)


def test_text_lines_and_wholetext(spark, tmp_path):
    from azure_serverless_etl_pipeline_spark.sources.readers import read_text_lines

    d = tmp_path / "txt"
    d.mkdir()
    (d / "a.txt").write_text("line one\nline two\n")
    (d / "b.txt").write_text("doc with\nembedded newline")
    lines = read_text_lines(spark, str(d))
    assert lines.columns == ["value"]
    assert lines.count() == 4  # 2 + 2 lines
    whole = read_text_lines(spark, str(d), whole_file=True)
    vals = sorted(r.value for r in whole.collect())
    assert len(vals) == 2
    assert vals[0] == "doc with\nembedded newline"


def test_orc_roundtrip_pushdown_and_pruning(spark, tmp_path):
    from azure_serverless_etl_pipeline_spark.sources.catalog import load_table
    from azure_serverless_etl_pipeline_spark.sources.readers import read_orc
    from azure_serverless_etl_pipeline_spark.sources.writers import write_orc
    from tests.conftest import SF_SMOKE
    import contextlib, io
    from pyspark.sql import functions as F

    li = load_table(spark, SF_SMOKE, "lineitem")
    path = str(tmp_path / "li_orc")
    write_orc(li, path)
    back = read_orc(spark, path)
    assert back.count() == li.count()
    assert set(back.columns) == set(li.columns)
    # pushdown + pruning reach the ORC scan exactly like parquet
    q = back.filter(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters: [" in plan and "GreaterThan(l_quantity" in plan
    sched = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_comment" not in sched and "l_orderkey" in sched
    # partitioned variant prunes directories
    p2 = str(tmp_path / "li_orc_part")
    write_orc(li.withColumn("rf", F.col("l_returnflag")), p2, partition_by=("rf",))
    pr = read_orc(spark, p2).filter(F.col("rf") == "A")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pr.explain("formatted")
    assert pr.count() > 0


def test_bad_sf_dir_clean_error(spark):
    """Driver contract edge: a nonexistent sf_dir must surface Spark's
    clean PATH_NOT_FOUND analysis error, not a cryptic late failure."""
    import pytest
    from pyspark.errors import AnalysisException

    from azure_serverless_etl_pipeline_spark.sources import load_table

    with pytest.raises(AnalysisException):
        load_table(spark, "/root/testdata/sf_nope", "events").count()


def test_unknown_table_and_query_errors(spark):
    import pytest

    from azure_serverless_etl_pipeline_spark.serving import run_named_query
    from azure_serverless_etl_pipeline_spark.sources import load_table

    with pytest.raises(KeyError, match="unknown table"):
        load_table(spark, "/root/testdata/sf0.001", "nope")
    with pytest.raises(KeyError, match="unknown query"):
        run_named_query(spark, "nope_query", "/root/testdata/sf0.001")
