"""Iterative hash-join connected components (large-star / small-star).

The reference returns one best match per query (main.c:110-129) and has
no clustering; dedup needs components over the verified-pair edge list.
Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — converges in
O(log n) rounds on pathological chains and one round on the star-shaped
clusters dedup actually produces, using only groupBy/join shuffles
(no collect of the edge set to the driver).

Node ids are strings; the component label is the lexicographic MIN
image_id, which is exactly FIXTURES.md F4's cluster_id contract.
Each round ends with ``localCheckpoint`` to break lineage (SURVEY.md §7
risk list: bounded iterations + fixpoint check).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# conservative driver-side cost of one collected edge: a Row with two
# short string ids plus two union-find dict entries (~2 str objects +
# dict slots) lands around 300-400 bytes in CPython; 400 is the safe
# planning figure
_BYTES_PER_EDGE = 400
# fraction of driver memory the collected edge list may occupy — the
# driver also holds the Py4J gateway, result buffers, and the app
_DRIVER_MEM_FRACTION = 0.10


def _parse_mem(size: str) -> int:
    """'16g' / '4096m' / '512k' / plain bytes -> bytes."""
    s = size.strip().lower()
    mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    if s and s[-1] in mult:
        return int(float(s[:-1]) * mult[s[-1]])
    return int(float(s))


def derived_driver_threshold(spark: SparkSession) -> int:
    """Union-find cutoff sized from the ACTUAL driver heap instead of a
    constant: a mass-duplicate corpus at 100x scale can push the
    accepted-pair edge list past any fixed number while a big driver
    could still absorb it — and vice versa on a small driver (round-2
    review, minor finding 4).  ``SPARK_GRAFT_CC_DRIVER_EDGES``
    overrides; otherwise edges = driver_mem * fraction / bytes_per_edge,
    floored at 100k (below that the fixed per-round Spark job latency
    always dominates) .
    """
    env = os.environ.get("SPARK_GRAFT_CC_DRIVER_EDGES")
    if env:
        return int(env)
    try:
        mem = _parse_mem(spark.conf.get("spark.driver.memory", "4g"))
    except (ValueError, TypeError):
        mem = 4 << 30
    return max(100_000, int(mem * _DRIVER_MEM_FRACTION) // _BYTES_PER_EDGE)


def _min_neighbor(edges: DataFrame) -> DataFrame:
    """For each u over bidirected edges + self-loop: m(u) = min(Γ+(u))."""
    bidir = edges.select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    ).unionByName(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
    with_self = bidir.unionByName(
        bidir.select("u", F.col("u").alias("v")).distinct()
    )
    return with_self.groupBy("u").agg(F.min("v").alias("m")), bidir


def _large_star(edges: DataFrame) -> DataFrame:
    """(u,v) with v > u  ->  (v, m(u)).  Connects big neighbors to the min."""
    minn, bidir = _min_neighbor(edges)
    return (
        bidir.join(minn, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """(u,v) with v <= u  ->  (v, m(u)), plus (u, m(u))."""
    minn, bidir = _min_neighbor(edges)
    small = (
        bidir.filter(F.col("v") <= F.col("u"))
        .join(minn, "u")
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
    )
    self_link = minn.select(F.col("u").alias("src"), F.col("m").alias("dst"))
    return (
        small.unionByName(self_link)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame, max_iterations: int = 20,
    driver_threshold: int | None = None
) -> DataFrame:
    """pairs(id_a, id_b) -> (image_id, cluster_id) for non-singleton nodes.

    cluster_id = min image_id of the component.  Singletons (nodes with
    no accepted pair) are not emitted; join back to the corpus with
    ``coalesce(cluster_id, image_id)`` for a total assignment
    (see ``assign_clusters``).

    Hybrid execution: the accepted-pair edge list of a dedup job is
    orders of magnitude smaller than the corpus, so below
    ``driver_threshold`` edges the labelling runs as one driver-side
    union-find (a single collect of two string columns) — the iterative
    shuffle loop costs ~3 fixed-latency Spark jobs per round, which
    dwarfs the work at that size.  Above the threshold the distributed
    large-star/small-star loop runs; both paths produce identical labels
    (pinned by tests).  ``driver_threshold=None`` (the default) derives
    the cutoff from the session's actual driver heap
    (``derived_driver_threshold``); pass an int to pin it.
    """
    if driver_threshold is None:
        driver_threshold = derived_driver_threshold(pairs.sparkSession)
    def _stats(df: DataFrame) -> tuple[int, int]:
        # one action: (edge count, order-insensitive xxhash64 checksum)
        row = df.agg(
            F.count("*").alias("n"),
            # decimal sum: ANSI mode would overflow a long sum of hashes
            F.coalesce(
                F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("h"),
        ).first()
        return int(row["n"]), int(row["h"])

    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).distinct()
    edges = edges.localCheckpoint(eager=True)
    prev = _stats(edges)

    if prev[0] <= driver_threshold:
        return _driver_components(edges)

    for _ in range(max_iterations):
        edges2 = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        cur = _stats(edges2)
        edges = edges2
        if cur == prev:  # fixpoint: identical count + checksum
            break
        prev = cur

    # at fixpoint every edge is (node -> component min)
    labels = edges.groupBy("src").agg(F.min("dst").alias("cluster_id"))
    roots = labels.select(F.col("cluster_id").alias("r")).distinct().select(
        F.col("r").alias("src"), F.col("r").alias("cluster_id")
    )
    return (
        labels.unionByName(roots)
        .groupBy("src")
        .agg(F.min("cluster_id").alias("cluster_id"))
        .select(F.col("src").alias("image_id"), "cluster_id")
    )


def _driver_components(edges: DataFrame) -> DataFrame:
    """Driver-side union-find over a collected small edge list.

    Identical semantics to the distributed loop: labels every node that
    appears in an edge with the lexicographic component minimum.
    """
    rows = edges.select("src", "dst").collect()
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        a, b = r["src"], r["dst"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = [(n, find(n)) for n in parent]
    spark = edges.sparkSession
    if not out:
        from pyspark.sql import types as T

        return spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("image_id", T.StringType()),
                    T.StructField("cluster_id", T.StringType()),
                ]
            ),
        )
    return spark.createDataFrame(out, "image_id string, cluster_id string")


def assign_clusters(corpus_ids: DataFrame, components: DataFrame) -> DataFrame:
    """Total assignment: every image gets a cluster (own id if singleton)."""
    return (
        corpus_ids.select("image_id")
        .join(components, "image_id", "left")
        .select(
            "image_id",
            F.coalesce("cluster_id", "image_id").alias("cluster_id"),
        )
    )
