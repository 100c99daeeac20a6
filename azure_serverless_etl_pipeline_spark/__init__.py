"""PySpark-native analytics engine re-expressing the query/data-processing
surface of ``kkshivani18/Azure-Serverless-ETL-Pipeline`` (see SURVEY.md).

The reference is a serverless ETL + analytics pipeline (CSV -> blob-triggered
transform -> Cosmos DB -> Cosmos-SQL / pandas analytics endpoints). This
package rebuilds that surface Spark-first:

- ``sources``   : batch readers/writers (CSV/JSON/Parquet), partitioned layout
- ``operators`` : relational + time-series + LLM-data-pipeline operators
                  (dedup, similarity search, text analysis, multimodal)
- ``functions`` : scalar helpers shared by operators (casts, dates, vectors)
- ``plans``     : the named query corpus (G1..G10 + extensions) with DuckDB
                  oracle twins — the driver's correctness contract
- ``streaming`` : Structured Streaming ingest (the blob-trigger analog)
- ``ml``        : model scoring as pandas UDFs (forecast / anomaly)
- ``serving``   : thin named-query registry -> JSON (the HTTP endpoint analog)

Everything is built on public Apache Spark APIs only and designed for
multi-executor scale (no collect() in operator paths, no driver-side loops
over groups, broadcast-able dimensions, AQE-friendly plans).
"""

__version__ = "0.1.0"
