"""Retired driver queries stay correct.

Round 2's driver graded only the first 50 ``queries()`` entries
(VERDICT.md round 2, finding 1), so strictly-subsumed queries were
retired from the grading window into ``retired_queries()``.  This test
keeps each retired query pinned to its exact SQL twin (same comparison
as tools/crosscheck.py / the driver gate) at sf0.001 so retirement
never silently becomes regression.
"""

from __future__ import annotations

import importlib.util

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _load(modname, path):
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def entrymod():
    return _load("spark_entry_for_tests", "/root/repo/__spark_entry__.py")


@pytest.fixture(scope="module")
def crosscheck():
    return _load("crosscheck_for_tests", "/root/repo/tools/crosscheck.py")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def test_active_registry_fits_grading_window(entrymod):
    qs = entrymod.queries()
    assert len(qs) <= 50, "active registry exceeds the driver's 50-row window"
    assert set(qs) == set(entrymod.oracle_sql()), "query/oracle key mismatch"
    assert set(entrymod.retired_queries()) == set(entrymod._OUT_OF_WINDOW)
    assert not set(entrymod._OUT_OF_WINDOW) & set(qs)


@pytest.mark.parametrize(
    "name",
    [
        "doc_minhash_signatures",
        "doc_simhash64",
        "doc_winnow_fingerprints",
        "events_hourly_rollup",
        "media_frame_sigs",
        "ivf_ann_topk",
        "doc_unigram_logprob",  # auxiliary: added after the window filled
        "audio_best_match",     # auxiliary: search-mode top-1 semantics
    ],
)
def test_retired_query_matches_oracle(spark, entrymod, crosscheck, duck, name):
    fn = entrymod.retired_queries()[name]
    sql = entrymod.retired_oracle_sql()[name]
    sdf = fn(spark, SF_DIR).toPandas()
    ddf = duck.execute(sql).df()
    verdict = crosscheck.compare(sdf, ddf)
    assert verdict == "OK", f"{name}: {verdict}"


def test_stream_matches_gate_equals_batch_fixture(spark, entrymod, crosscheck):
    """Driver-window insurance: the stream_matches gate query at
    sf0.001 must emit the n120 batch scored-pairs fixture in both
    orientations (the same equivalence the driver checks at sf0.01)."""
    import duckdb

    sdf = entrymod.queries()["stream_matches"](spark, SF_DIR).toPandas()
    sql = """
        WITH s AS (
          SELECT id_a, id_b, n_shared_bands, score
          FROM read_parquet('/root/repo/tests/fixtures/image_oracle_n120/scored_pairs.parquet')
        )
        SELECT id_a AS query_id, id_b AS match_id, n_shared_bands, score FROM s
        UNION ALL
        SELECT id_b AS query_id, id_a AS match_id, n_shared_bands, score FROM s
    """
    ddf = duckdb.connect().execute(sql).df()
    verdict = crosscheck.compare(sdf, ddf)
    assert verdict == "OK", verdict
