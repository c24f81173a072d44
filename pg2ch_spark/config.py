"""YAML config layer — the file a user actually runs the replicator
from (SURVEY §2.1 R14 config/catalog).

pg2ch is operated through one YAML file (`cmd/pg2ch/main.go` reads it
into `pkg/config/config.go`): connection blocks, daemon knobs, and a
`tables:` mapping of per-table replication specs. This module is that
file re-expressed for the Spark pipeline:

```yaml
spark:                       # session knobs (optional block)
  master: local[*]
  app_name: pg2ch-spark
  shuffle_partitions: 32
source:
  sf_dir: /var/lib/pg2ch/spool  # change-log dir (events.parquet fixture,
                                # or the walsender spool when live)
  max_files_per_trigger: 1   # optional: micro-batch granularity
  format: cdc                # events (fixture) | cdc (spool files)
  walsender:                 # OPTIONAL: live replication source (R2) —
    host: pg.internal        # the daemon runs the protocol client in a
    port: 5432               # spool thread landing LSN-named files
    slot: pg2ch_slot         # into sf_dir; implies format: cdc
    publication: pg2ch_pub
    user: repl
    database: shop
    password_env: PGPASSWORD # credential comes from the environment
    sslmode: require
clickhouse:                  # OPTIONAL: R12 sink — every merged
  endpoint: https://ch:8443  # micro-batch delta POSTed as TabSeparated
  database: analytics        # into <database>.<table>
  user: loader               # basic auth (omit for none)
  password_env: CH_PASSWORD  # from the environment (or a raw password:)
  ca_cert: /etc/ssl/ch.pem   # private-CA TLS verification
  max_retries: 4             # bounded exponential backoff on 5xx /
  backoff_s: 0.5             # connection errors; 4xx fail fast
state_root: /var/lib/pg2ch   # per-table sink state + checkpoints
poll_interval_s: 5.0         # pause between catch-up passes
inactivity_merge_timeout_s: 30.0  # OPTIONAL (pg2ch inactivity_merge_timeout):
                             # passes stop force-flushing two-tier buffers;
                             # quiet tables merge on this timer instead
tables:                      # name -> TableSpec block (R14)
  t_replacing:
    engine: ReplacingMergeTree
    key_col: key
    ver_col: ver
    merge_threshold: 2
  t_append:
    engine: MergeTree
```

`main_table` defaults to the mapping key, exactly how pg2ch keys its
`tables:` section by the replicated table's name. Unknown keys are
rejected at every level — the same posture as `spec_from_mapping`
(a typo'd knob silently defaulting is how replication configs rot).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import yaml

from pg2ch_spark.pipeline import TableSpec, spec_from_mapping


@dataclass
class SparkConfig:
    master: str = "local[*]"
    app_name: str = "pg2ch-spark"
    shuffle_partitions: int = 32


@dataclass
class WalSenderSource:
    """Live replication source: the daemon runs the protocol client in
    a spool thread (R2 consumer → LSN-named landing files), and the
    catch-up passes stream the spool (source.format becomes "cdc").
    The password comes from the ENVIRONMENT (``password_env`` names the
    variable) — credentials never live in the YAML, same posture as
    pg2ch's connection strings read from env in container deploys."""

    host: str
    port: int
    slot: str
    publication: str
    user: str = "postgres"
    database: str = "postgres"
    password_env: str | None = None
    sslmode: str = "disable"
    retry_s: float = 2.0


@dataclass
class ClickHouseSink:
    """R12: every merged micro-batch is ALSO posted to ClickHouse over
    HTTP as TabSeparated (one INSERT per batch per table, into
    ``<database>.<table>``). At-least-once replays re-post the same
    versioned rows; the CH merge engine collapses them — the same
    convergence contract pg2ch relies on."""

    endpoint: str
    database: str = "default"
    # connection hardening (sources.clickhouse.HttpOptions): basic
    # auth, private-CA TLS (https endpoints verify against ca_cert),
    # bounded exponential-backoff retry on 5xx/connection errors
    user: str | None = None
    # password_env (preferred) names an environment variable — the same
    # credentials-never-in-YAML posture as the walsender block; a raw
    # password key is accepted for parity with pg2ch's config files
    password: str | None = None
    password_env: str | None = None
    ca_cert: str | None = None
    max_retries: int = 4
    backoff_s: float = 0.5

    def http_options(self):
        import os

        from pg2ch_spark.sources.clickhouse import HttpOptions

        password = self.password
        if password is None and self.password_env:
            password = os.environ.get(self.password_env)
        return HttpOptions(
            user=self.user,
            password=password,
            ca_cert=self.ca_cert,
            max_retries=self.max_retries,
            backoff_s=self.backoff_s,
        )


@dataclass
class DaemonConfig:
    source_dir: str
    state_root: str
    tables: list[TableSpec]
    max_files_per_trigger: int | None = None
    poll_interval_s: float = 5.0
    # pg2ch's inactivity_merge_timeout as a REAL TIMER: when set, the
    # daemon's passes stop force-flushing two-tier buffers — merges
    # happen at merge_threshold, and a table idle for at least this
    # many seconds gets a timed merge between passes (plus the
    # graceful-stop flush). None = flush every pass (one-shot/batch
    # semantics).
    inactivity_merge_timeout_s: float | None = None
    # >1 catches tables up CONCURRENTLY per pass (independent streams,
    # pooled threads) — serial latency is additive across a 100-table
    # deployment for no reason; 1 = strictly serial (default)
    max_concurrent_tables: int = 1
    # "events" = fixture event log (CDC derived in-stream);
    # "cdc" = a spool directory of normalized CDC parquet files, the
    # shape sources.spool lands from the live walsender client
    source_format: str = "events"
    walsender: WalSenderSource | None = None
    clickhouse: ClickHouseSink | None = None
    spark: SparkConfig = field(default_factory=SparkConfig)


_TOP_KEYS = {
    "spark", "source", "state_root", "poll_interval_s",
    "inactivity_merge_timeout_s", "max_concurrent_tables",
    "tables", "clickhouse",
}
_SPARK_KEYS = {"master", "app_name", "shuffle_partitions"}
_SOURCE_KEYS = {"sf_dir", "max_files_per_trigger", "format", "walsender"}
_WALSENDER_KEYS = {
    "host", "port", "slot", "publication",
    "user", "database", "password_env", "sslmode", "retry_s",
}
_CLICKHOUSE_KEYS = {
    "endpoint", "database", "user", "password", "password_env", "ca_cert",
    "max_retries", "backoff_s",
}


def _reject_unknown(block: dict, allowed: set[str], where: str) -> None:
    unknown = set(block) - allowed
    if unknown:
        raise ValueError(f"unknown {where} keys: {sorted(unknown)}")


def config_from_mapping(m: dict) -> DaemonConfig:
    """Validate and build a DaemonConfig from the parsed YAML mapping."""
    if not isinstance(m, dict):
        raise ValueError(f"config root must be a mapping, got {type(m).__name__}")
    _reject_unknown(m, _TOP_KEYS, "config")
    for req in ("source", "state_root", "tables"):
        if req not in m:
            raise ValueError(f"config is missing required key {req!r}")

    source = m["source"]
    if not isinstance(source, dict):
        raise ValueError("source: must be a mapping")
    _reject_unknown(source, _SOURCE_KEYS, "source")
    if "sf_dir" not in source:
        raise ValueError("source: is missing required key 'sf_dir'")

    spark_block = m.get("spark") or {}
    if not isinstance(spark_block, dict):
        raise ValueError("spark: must be a mapping")
    _reject_unknown(spark_block, _SPARK_KEYS, "spark")
    # value types too, not just key names — --validate must catch what
    # would otherwise only crash once the daemon builds the session
    for k in ("master", "app_name"):
        if k in spark_block and not isinstance(spark_block[k], str):
            raise ValueError(f"spark.{k} must be a string")
    sp = spark_block.get("shuffle_partitions")
    if sp is not None and (isinstance(sp, bool) or not isinstance(sp, int) or sp < 1):
        raise ValueError("spark.shuffle_partitions must be a positive int")

    tables = m["tables"]
    if not isinstance(tables, dict) or not tables:
        raise ValueError("tables: must be a non-empty mapping of name -> spec")
    specs = []
    for name, block in tables.items():
        block = dict(block or {})
        block.setdefault("main_table", name)
        if block["main_table"] != name:
            raise ValueError(
                f"tables.{name}: main_table {block['main_table']!r} conflicts "
                "with the mapping key (omit it or make them equal)"
            )
        try:
            specs.append(spec_from_mapping(block))
        except (TypeError, ValueError) as e:
            raise ValueError(f"tables.{name}: {e}") from e

    mft = source.get("max_files_per_trigger")
    if mft is not None and (not isinstance(mft, int) or mft < 1):
        raise ValueError("source.max_files_per_trigger must be a positive int")
    fmt = source.get("format", "events")
    if fmt not in ("events", "cdc"):
        raise ValueError("source.format must be 'events' or 'cdc'")

    walsender = None
    ws_block = source.get("walsender")
    if ws_block is not None:
        if not isinstance(ws_block, dict):
            raise ValueError("source.walsender: must be a mapping")
        _reject_unknown(ws_block, _WALSENDER_KEYS, "source.walsender")
        for req in ("host", "port", "slot", "publication"):
            if req not in ws_block:
                raise ValueError(f"source.walsender is missing required key {req!r}")
        if not isinstance(ws_block["port"], int):
            raise ValueError("source.walsender.port must be an int")
        # a live walsender lands LSN-named CDC files into sf_dir — the
        # passes must read them as the spool they are
        if source.get("format", "cdc") != "cdc":
            raise ValueError("source.walsender requires source.format: cdc")
        fmt = "cdc"
        walsender = WalSenderSource(**ws_block)

    clickhouse = None
    ch_block = m.get("clickhouse")
    if ch_block is not None:
        if not isinstance(ch_block, dict):
            raise ValueError("clickhouse: must be a mapping")
        _reject_unknown(ch_block, _CLICKHOUSE_KEYS, "clickhouse")
        if "endpoint" not in ch_block:
            raise ValueError("clickhouse: is missing required key 'endpoint'")
        clickhouse = ClickHouseSink(**ch_block)
    mct = m.get("max_concurrent_tables", 1)
    if isinstance(mct, bool) or not isinstance(mct, int) or mct < 1:
        raise ValueError("max_concurrent_tables must be a positive int")
    imt = m.get("inactivity_merge_timeout_s")
    if imt is not None and (
        isinstance(imt, bool) or not isinstance(imt, (int, float)) or imt <= 0
    ):
        raise ValueError("inactivity_merge_timeout_s must be a positive number")
    poll = m.get("poll_interval_s", 5.0)
    if not isinstance(poll, (int, float)) or poll < 0:
        raise ValueError("poll_interval_s must be a non-negative number")

    return DaemonConfig(
        source_dir=str(source["sf_dir"]),
        state_root=str(m["state_root"]),
        tables=specs,
        max_files_per_trigger=mft,
        poll_interval_s=float(poll),
        inactivity_merge_timeout_s=float(imt) if imt is not None else None,
        max_concurrent_tables=mct,
        source_format=fmt,
        walsender=walsender,
        clickhouse=clickhouse,
        spark=SparkConfig(**spark_block),
    )


def load_config(path: str) -> DaemonConfig:
    """Load the daemon config from a YAML file (pg2ch `--config` analog)."""
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    with open(path) as f:
        parsed = yaml.safe_load(f)
    return config_from_mapping(parsed)
