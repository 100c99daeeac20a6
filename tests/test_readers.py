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
