"""Exact-dup collapse in the shingle pair generators (round 5): the
100× probe filled the disk because every duplicate cluster of size k
turned its shared-shingle buckets quadratic in k. The generators now
join over distinct-text representatives and re-expand cluster products
— these tests prove the expansion EXACT on a corpus where duplication
is heavy, against the same DuckDB pair-join oracle the registered keys
use (which at sf0.01 contains no duplicates, so only this fixture
exercises the expansion arms)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from pg2ch_spark.llm.neardup import (
    _CONTAIN_MIN,
    _JACCARD_MIN,
    _shingle_pair_scores,
    ngram_jaccard_pairs,
)

SHINGLE_SQL = """
    sh AS (
        SELECT DISTINCT doc_id, g
        FROM (
            SELECT doc_id,
                   unnest([list_aggregate(words[i:i+2], 'string_agg', ' ')
                           FOR i IN range(1, len(words) - 1)]) AS g
            FROM (SELECT doc_id, string_split(text, ' ') AS words FROM docs)
            WHERE len(words) >= 3
        )
    )
"""


@pytest.fixture(scope="module")
def dup_corpus(spark):
    """40 distinct base texts, each duplicated 1-8x; plus texts that
    contain others (prefix quoting), a short no-shingle doc duplicated
    twice, and overlapping-vocabulary variants."""
    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(60)]
    texts = []
    for i in range(40):
        n = int(rng.integers(5, 30))
        texts.append(" ".join(rng.choice(vocab, size=n)))
    # containment structure: doc quoted inside a longer doc
    texts.append(texts[0] + " zz qq " + texts[1])
    texts.append(texts[2])  # exact dup of an existing text
    texts.append("one two")  # <3 words: no shingles, never pairs
    rows = []
    doc_id = 0
    for t in texts:
        for _ in range(int(rng.integers(1, 9)) if t != "one two" else 2):
            rows.append((doc_id, t))
            doc_id += 1
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    con = duckdb.connect()
    con.register("docs", pdf)
    return spark.createDataFrame(pdf), con, pdf


def _oracle(con, where: str) -> pd.DataFrame:
    return con.execute(
        f"""
        WITH {SHINGLE_SQL},
        sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
            FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               round(CAST(ni AS DOUBLE) / least(x.n, y.n), 4) AS containment,
               round(CAST(ni AS DOUBLE) / (x.n + y.n - ni), 4) AS jaccard
        FROM inter
        JOIN sz x ON x.doc_id = doc_a
        JOIN sz y ON y.doc_id = doc_b
        WHERE {where}
        ORDER BY 1, 2
        """
    ).df()


def test_containment_scores_exact_under_heavy_duplication(dup_corpus):
    docs, con, _ = dup_corpus
    got = (
        _shingle_pair_scores(
            docs,
            lambda cont, jac: cont >= _CONTAIN_MIN,
            prefilter=("containment", _CONTAIN_MIN),
        )
        .toPandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    exp = _oracle(
        con, f"CAST(ni AS DOUBLE) / least(x.n, y.n) >= {_CONTAIN_MIN}"
    )
    assert len(exp) > 100, "fixture must exercise the expansion heavily"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_jaccard_pairs_exact_under_heavy_duplication(dup_corpus):
    docs, con, _ = dup_corpus
    got = (
        ngram_jaccard_pairs(docs)
        .toPandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    exp = _oracle(
        con, f"CAST(ni AS DOUBLE) / (x.n + y.n - ni) >= {_JACCARD_MIN}"
    )[["doc_a", "doc_b", "jaccard"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@pytest.mark.parametrize("seed", [1, 7, 101])
@pytest.mark.parametrize("kind", ["jaccard", "containment"])
def test_prefix_filter_is_recall_lossless(spark, seed, kind):
    """The AllPairs prefix lemma, machine-checked: on random corpora
    with a tiny vocabulary (hot shingles everywhere), extreme size
    skew (3-word docs through 60-word docs) and equal-size ties, the
    prefix-filtered candidates must contain EVERY pair the brute-force
    all-shared-shingle join scores above threshold."""
    import itertools

    from pg2ch_spark.llm.neardup import (
        _candidates_containment,
        _candidates_jaccard,
        _ordered_grams,
        _shingles,
    )

    rng = np.random.default_rng(seed)
    vocab = [f"v{i}" for i in range(12)]  # tiny vocab: maximal overlap
    rows, next_id = [], 0

    def add(words):
        nonlocal next_id
        rows.append((next_id, " ".join(words)))
        next_id += 1

    for _ in range(25):
        n = int(rng.integers(3, 60))
        base = list(rng.choice(vocab, size=n))
        add(base)
        # planted near-dups: single-word edit, truncation (containment
        # 1.0 of the shorter side), and a one-word append
        edited = list(base)
        edited[int(rng.integers(0, n))] = str(rng.choice(vocab))
        add(edited)
        if n >= 6:
            add(base[: int(rng.integers(4, n))])
        add(base + [str(rng.choice(vocab))])
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    docs = spark.createDataFrame(pdf)
    docs_g = _ordered_grams(_shingles(docs))
    t = 0.5 if kind == "jaccard" else 0.9
    cand_fn = _candidates_jaccard if kind == "jaccard" else _candidates_containment
    got = {
        (r.doc_a, r.doc_b) for r in cand_fn(docs_g, t).collect()
    }
    # brute force over the full pair space
    grams = {
        r.doc_id: set(r.grams) for r in docs_g.collect()
    }
    required = set()
    for a, b in itertools.combinations(sorted(grams), 2):
        ni = len(grams[a] & grams[b])
        if ni == 0:
            continue
        score = (
            ni / (len(grams[a]) + len(grams[b]) - ni)
            if kind == "jaccard"
            else ni / min(len(grams[a]), len(grams[b]))
        )
        if score >= t:
            required.add((a, b))
    assert required, "fixture must produce true pairs"
    missed = required - got
    assert not missed, f"prefix filter dropped true pairs: {sorted(missed)[:10]}"


def test_candidate_join_runs_over_representatives(dup_corpus):
    """The scale property itself: the shingle self-join must see one
    row per distinct text, not one per document."""
    from pg2ch_spark.llm.neardup import _collapse_exact

    docs, _, pdf = dup_corpus
    reps, clusters = _collapse_exact(docs)
    n_reps = reps.count()
    assert n_reps == pdf.text.nunique()  # join side = distinct texts
    assert n_reps < len(pdf) / 2  # fixture duplication is heavy
    # members partition the corpus exactly
    import pyspark.sql.functions as F

    total = clusters.select(
        F.sum(F.size("members")).alias("n"),
        F.min(F.expr("members[0] = rep")).alias("rep_is_min"),
    ).collect()[0]
    assert total.n == len(pdf) and total.rep_is_min


# ---------------------------------------------------------------------------
# The banded keys (minhash / simhash / hyperplane LSH) against their
# REGISTERED DuckDB oracles on a duplicate-dense fixture: sf0.001
# replicated 4x with offset ids and identical payloads. The sf0.01
# driver fixture has no exact duplicates, so this is the only
# differential that executes their within/cross expansion arms.


@pytest.fixture(scope="module")
def dup_sf_dir(tmp_path_factory):
    # single-FILE parquet (pyarrow), not a Spark directory write — both
    # engines read the fixture through the same `<dir>/<table>.parquet`
    # path shape the driver uses.
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    dst = str(tmp_path_factory.mktemp("dup_sf"))
    for table, id_col in [("documents", "doc_id"), ("embeddings", "vec_id")]:
        t = pq.read_table(f"{src}/{table}.parquet")
        ids = t.column(id_col)
        copies = [t]
        for i in range(1, 4):
            shifted = pa.compute.add(ids, 1_000_000 * i)
            copies.append(t.set_column(t.schema.get_field_index(id_col), id_col, shifted))
        pq.write_table(pa.concat_tables(copies), f"{dst}/{table}.parquet")
    from pg2ch_spark.catalog import TABLES

    for t in TABLES:
        p = f"{dst}/{t}.parquet"
        if not os.path.exists(p):
            os.symlink(f"{src}/{t}.parquet", p)
    return dst


@pytest.fixture(scope="module")
def zero_norm_sf_dir(tmp_path_factory):
    """sf0.001 with three all-zero embedding vectors (two of them exact
    duplicates of each other). Cosine against a zero vector is 0/0 —
    NULL in DuckDB (dropped by >=) but NaN in numpy/Spark, where NaN
    orders ABOVE every number — so these rows prove the isnan guards
    and the positive-norm eligibility filter, which no shipped fixture
    exercises."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    dst = str(tmp_path_factory.mktemp("zero_norm_sf"))
    df = pq.read_table(f"{src}/embeddings.parquet").to_pandas()
    dim = len(df.loc[0, "embedding"])
    zero = np.zeros(dim, dtype=np.float32)
    for i in range(3):  # rows 0/1 form an exact-dup cluster, row 2 is lone
        df.at[i, "embedding"] = zero
    zero_vids = frozenset(int(v) for v in df.loc[:2, "vec_id"])
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   f"{dst}/embeddings.parquet")
    from pg2ch_spark.catalog import TABLES

    for t in TABLES:
        p = f"{dst}/{t}.parquet"
        if not os.path.exists(p):
            os.symlink(f"{src}/{t}.parquet", p)
    return dst, zero_vids


@pytest.mark.parametrize(
    "key",
    [
        "sim_cosine_topk",
        "sim_knn_join",
        "sim_ann_ivf",
        "sim_ivf_recall",
        "sim_matryoshka_recall",
    ],
)
def test_sim_keys_survive_zero_norm_queries(zero_norm_sf_dir, spark, key):
    """vec_id 0-2 are zero vectors — including the topk/knn QUERY side,
    so every cosine against them is 0/0. Without try_divide, Spark 4's
    ANSI mode aborts the whole job with DIVIDE_BY_ZERO; with it the
    score is NULL like the oracle's, ranked last by desc."""
    from pg2ch_spark import registry
    from tests.oracle import duck_con, run_compare

    sf_dir, _ = zero_norm_sf_dir
    registry.load_all()
    df = registry.QUERIES[key](spark, sf_dir)
    res = run_compare(key, df, registry.ORACLES[key], duck_con(sf_dir))
    assert res.ok, str(res)


@pytest.mark.parametrize("key", ["sim_lsh_hyperplane", "sim_near_dup_embedding"])
def test_embedding_keys_exact_with_zero_norm_vectors(zero_norm_sf_dir, spark, key):
    from pg2ch_spark import registry
    from tests.oracle import duck_con, run_compare

    sf_dir, zero_vids = zero_norm_sf_dir
    registry.load_all()
    df = registry.QUERIES[key](spark, sf_dir)
    con = duck_con(sf_dir)
    res = run_compare(key, df, registry.ORACLES[key], con)
    assert res.ok, str(res)
    # the zero vectors share every LSH band value (all sign dots are 0)
    # and meet plenty of bucket-mates, so if the NaN scores leaked
    # through the >= both keys would emit extra pairs and hash-mismatch
    got = df.toPandas()
    seen = set(got.vec_a.astype(int)) | set(got.vec_b.astype(int))
    leaked = seen & zero_vids
    assert not leaked, f"{key}: zero-norm vectors paired: {leaked}"


def test_library_entry_points_dispatch_to_declared_plans(spark):
    """`near_dup_embedding_pairs` / `near_dup_text_pairs` are the
    guardrail facade: the DEFAULT must be the banded plan, the exact
    scan an opt-in — checked by result identity with the registered
    keys at sf0.001."""
    from pg2ch_spark import registry
    from pg2ch_spark.llm.neardup import (
        near_dup_embedding_pairs,
        near_dup_text_pairs,
    )

    registry.load_all()
    sf = "/root/testdata/sf0.001"

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    assert rows(near_dup_embedding_pairs(spark, sf)) == rows(
        registry.QUERIES["sim_lsh_hyperplane"](spark, sf)
    )
    assert rows(near_dup_embedding_pairs(spark, sf, exact=True)) == rows(
        registry.QUERIES["sim_near_dup_embedding"](spark, sf)
    )
    assert rows(near_dup_text_pairs(spark, sf)) == rows(
        registry.QUERIES["text_near_dedup_minhash"](spark, sf)
    )
    assert rows(near_dup_text_pairs(spark, sf, exact=True)) == rows(
        registry.QUERIES["text_near_dedup_ngram_jaccard"](spark, sf)
    )


@pytest.mark.parametrize(
    "key",
    ["text_near_dedup_minhash", "text_near_dedup_simhash", "sim_lsh_hyperplane"],
)
def test_banded_keys_exact_under_heavy_duplication(dup_sf_dir, spark, key):
    from pg2ch_spark import registry
    from tests.oracle import duck_con, run_compare

    registry.load_all()
    df = registry.QUERIES[key](spark, dup_sf_dir)
    con = duck_con(dup_sf_dir)
    res = run_compare(key, df, registry.ORACLES[key], con)
    assert res.ok, str(res)
    # 4x duplication means every base pair expands 4x4 and every
    # duplicated payload contributes its C(4,2) identity pairs — if the
    # expansion arms were dead the count could not exceed the base run.
    assert res.spark_rows >= 6, f"{key}: fixture exercised no clusters"
