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
