"""pg2ch_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of mkabilov/pg2ch (a PostgreSQL→ClickHouse
CDC replicator), extended with batch-relational, streaming, and
LLM-data-pipeline operators.

Architecture (SURVEY.md is the blueprint):

- ``catalog``   — table loading + schema normalization (ns-timestamp fix)
- ``session``   — SparkSession factory tuned for local[*] testing; the
                  same confs scale to a real cluster (AQE, Arrow, UTC)
- ``registry``  — the declared-query registry backing ``__spark_entry__``
- ``operators`` — batch relational operators (scans, joins, aggs, windows,
                  sorts, set ops)
- ``functions`` — scalar/vector expression builders (no UDFs in hot paths)
- ``cdc``       — pg2ch-parity CDC semantics (collapsing/replacing/append
                  engines, snapshot handoff, merge sink)
- ``streaming`` — Structured Streaming queries (windows, sessions, dedup,
                  foreachBatch upsert)
- ``llm``       — dedup / similarity / text-analysis / multimodal ops
- ``udfs``      — the declared pandas-UDF / mapInPandas surface

Everything is DataFrame/SQL-first: logical plans are declared via the
DataFrame API and Catalyst picks the physical strategy. Python UDFs are
confined to the ``udfs`` module (the declared UDF surface) and the
multimodal stubs.
"""

__version__ = "0.1.0"
