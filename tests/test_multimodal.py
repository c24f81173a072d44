"""Multimodal plumbing tests: schema, batching, pruning — with the
decode step faked deterministically (the real decoder is stubbed, per
the environment constraints)."""

from __future__ import annotations

import tempfile

import pytest

from pg2ch_spark.llm import multimodal as mm

# defined as a plain lambda so cloudpickle ships it by value (a module-
# level def in a test file isn't importable on executors)
FAKE_DECODER = lambda payload: [float(b) / 255.0 for b in payload[:16]]  # noqa: E731


def test_media_schema_roundtrip(spark):
    media = mm.synthesize_media(spark, n=30)
    assert media.schema == mm.MEDIA_SCHEMA
    assert media.count() == 30


def test_decode_stub_raises(spark):
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG")


def test_extract_features_with_injected_decoder(spark):
    media = mm.synthesize_media(spark, n=30)
    feats = mm.extract_features(media, decoder=FAKE_DECODER, feature_dim=8)
    rows = feats.collect()
    assert len(rows) == 30
    assert {r.media_id for r in rows} == set(range(30))
    for r in rows:
        assert r.n_bytes == 128
        assert len(r.feature) == 8
        assert all(0.0 <= x <= 1.0 for x in r.feature)
    # deterministic: run twice, identical
    rows2 = mm.extract_features(media, decoder=FAKE_DECODER, feature_dim=8).collect()
    assert sorted(map(str, rows)) == sorted(map(str, rows2))


def test_metadata_projection_prunes_payload(spark):
    """Metadata-only reads must never touch payload bytes: the parquet
    scan's ReadSchema has to exclude the binary column."""
    media = mm.synthesize_media(spark, n=10)
    d = tempfile.mkdtemp(prefix="pg2ch_media_")
    media.write.mode("overwrite").parquet(d)
    meta = mm.metadata_only(media.sparkSession.read.parquet(d))
    assert "payload" not in meta.columns
    plan = meta._jdf.queryExecution().executedPlan().toString()
    scan_line = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "payload" not in scan_line


# ---------------------------------------------------------------------------
# Non-ASCII payload differentials: every fake decode walks CHARACTERS
# exactly like its oracle's substr/ord (the shipped fixtures are pure
# ASCII, where characters and bytes coincide — these corpora are where
# a byte-strided implementation would diverge from the oracle).


@pytest.fixture(scope="module")
def unicode_sf_dir(tmp_path_factory):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    dst = str(tmp_path_factory.mktemp("unicode_sf"))
    df = pq.read_table(f"{src}/documents.parquet").to_pandas()
    # multi-byte characters sprinkled through long texts (all three
    # doc_id % 3 media kinds), plus a SHORT (<16-char) non-ASCII text
    # to hit the oracle's ord('') = -1 branch in multimodal_extract
    for i in range(0, 12):
        df.loc[i, "text"] = ("héllo wörld — データ 🎬 " * (5 + i))[: 300 + 17 * i]
    df.loc[12, "text"] = "café ñ"
    df.loc[13, "text"] = ""
    df["n_chars"] = df["text"].str.len()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   f"{dst}/documents.parquet")
    from pg2ch_spark.catalog import TABLES

    for t in TABLES:
        p = f"{dst}/{t}.parquet"
        if not os.path.exists(p):
            os.symlink(f"{src}/{t}.parquet", p)
    return dst


@pytest.mark.parametrize(
    "key",
    [
        "multimodal_extract",
        "multimodal_resize",
        "multimodal_audio_windows",
        "multimodal_framesample",
    ],
)
def test_multimodal_keys_exact_on_non_ascii_payloads(unicode_sf_dir, spark, key):
    from pg2ch_spark import registry
    from tests.oracle import duck_con, run_compare

    registry.load_all()
    df = registry.QUERIES[key](spark, unicode_sf_dir)
    con = duck_con(unicode_sf_dir)
    res = run_compare(key, df, registry.ORACLES[key], con)
    assert res.ok, str(res)
