from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

CACHE = "/root/repo/.cache"
TEST_CORPUS_ROWS = 150


@pytest.fixture(scope="session")
def spark():
    from mnemophonix_spark.session import get_spark

    s = get_spark(app_name="mnemophonix-tests", master="local[8]")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_dir():
    from mnemophonix_spark import corpusgen

    return corpusgen.ensure_corpus(CACHE, TEST_CORPUS_ROWS)


@pytest.fixture(scope="session")
def corpus_rows(corpus_dir):
    files = sorted(glob.glob(f"{corpus_dir}/corpus/part-*.parquet"))
    return pq.read_table(files).to_pylist()


@pytest.fixture(scope="session")
def truth(corpus_dir):
    pairs = pq.read_table(f"{corpus_dir}/truth_pairs.parquet").to_pylist()
    clusters = pq.read_table(f"{corpus_dir}/truth_clusters.parquet").to_pylist()
    return pairs, clusters


@pytest.fixture(scope="session")
def oracle_result(corpus_rows):
    from mnemophonix_spark import oracle

    rows = [(r["image_id"], r["bytes"], r["fmt"]) for r in corpus_rows]
    phash = {r["image_id"]: r["phash"] for r in corpus_rows}
    return oracle.run_chain(rows, phash=phash)
