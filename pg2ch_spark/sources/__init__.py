"""Production-edge sources/sinks: PostgreSQL snapshot in, ClickHouse out.

Test-path queries read parquet (the driver contract); these modules are
the prod counterparts of pg2ch's endpoints (SURVEY §2.1 R1, R11, R12),
kept import-safe in this offline container.
"""
