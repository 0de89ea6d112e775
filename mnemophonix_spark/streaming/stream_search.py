"""Structured Streaming analog of the reference's `ears` app.

The reference's streaming path (ears/main.m:101-188, MicRecorder.mm):
microphone callbacks fill an 11 s ring buffer sliding by 1 s, a search
fires once per second after 2 s buffered, and a repeated match is
suppressed until a new track matches (`last_match`, main.m:61,76-77).

Spark mapping (SURVEY.md §2 streaming table):
  mic capture source      -> readStream (file source of image rows here;
                             any streaming source with the corpus schema)
  sliding ring buffer     -> not needed for stills: each row is one unit
                             of work (kept: event-time window helper for
                             rate-limited rollups)
  trigger once per second -> micro-batch trigger (processingTime /
                             availableNow for tests)
  match + last_match dedup-> foreachBatch: fingerprint the batch, LSH
                             probe against the static index, per-key
                             dropDuplicates on (query_id, match_id)

The reference has no watermark/late-data concept; we add an event-time
watermark in `windowed_match_counts` because a real deployment needs
one (late rows otherwise hold window state forever).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import threading

from mnemophonix_spark import config as C
from mnemophonix_spark.operators import lsh
from mnemophonix_spark.operators.fingerprint import fingerprint, valid_signatures

# the partitionOverwriteMode toggle below is session-global: two
# streaming queries sharing one SparkSession must not interleave their
# set/restore or one write could fall back to a static (whole-table)
# overwrite.  foreachBatch calls are sequential per query but not
# across queries.
_write_conf_lock = threading.Lock()


def _idempotent_batch_write(matches: DataFrame, batch_id: int,
                            output_table: str) -> None:
    """foreachBatch is at-least-once: after a failure the same batch_id
    can replay, and a plain append would duplicate its rows despite the
    checkpoint.  Partition the sink table by batch_id and overwrite only
    the replayed batch's partition (dynamic partition overwrite) — the
    write becomes idempotent per batch, which is exactly the replay
    contract foreachBatch requires.
    """
    spark = matches.sparkSession
    out = matches.withColumn("batch_id", F.lit(int(batch_id)))
    if not spark.catalog.tableExists(output_table):
        # create the partitioned table from an empty slice so even the
        # first batch goes through the idempotent insertInto path
        out.limit(0).write.partitionBy("batch_id").saveAsTable(output_table)
    cols = [c for c in spark.table(output_table).columns]
    # the writer-level option("partitionOverwriteMode", ...) is ignored
    # by insertInto (measured: batch 1's overwrite wiped batch 0's
    # partition); the session conf is the supported switch, restored
    # after the write
    conf = spark.conf
    with _write_conf_lock:
        prev = conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            # positional insertInto: match table column order
            out.select(*cols).write.mode("overwrite").insertInto(output_table)
        finally:
            conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def search_batch(query_corpus: DataFrame, index_signatures: DataFrame) -> DataFrame:
    """One micro-batch search: fingerprint queries, probe the index.

    Equivalent of search.c:110-194 with the index side precomputed:
    explode query bands, inner equi-join the index bands on
    (band_id, band_hash) (lsh.c:89-112 probe without the mod-size
    collisions), >=2-band gate, byte score >= 30.
    Output: (query_id, match_id, n_shared_bands, score).
    """
    q_sigs = valid_signatures(fingerprint(query_corpus))
    q_bands = lsh.explode_bands(q_sigs).withColumnRenamed("image_id", "query_id")
    i_bands = lsh.explode_bands(index_signatures).withColumnRenamed(
        "image_id", "match_id"
    )
    cand = (
        q_bands.join(i_bands, ["band_id", "band_hash"])
        .filter(F.col("query_id") != F.col("match_id"))
        .groupBy("query_id", "match_id")
        .agg(F.count("*").alias("n_shared_bands"))
        .filter(F.col("n_shared_bands") >= C.MIN_BAND_MATCHES)
    )
    all_sigs = q_sigs.select("image_id", "minhash").unionByName(
        index_signatures.select("image_id", "minhash")
    )
    scored = lsh.score_pairs(
        cand.withColumnRenamed("query_id", "id_a").withColumnRenamed(
            "match_id", "id_b"
        ),
        all_sigs,
    )
    return scored.select(
        F.col("id_a").alias("query_id"),
        F.col("id_b").alias("match_id"),
        "n_shared_bands",
        "score",
    )


def stream_search(
    spark: SparkSession,
    stream_corpus: DataFrame,
    index_signatures: DataFrame,
    checkpoint_dir: str,
    output_table: str = "stream_matches",
    trigger_available_now: bool = True,
):
    """Wire a streaming corpus source through per-batch search into a
    memory sink, suppressing repeated (query, match) pairs per batch
    (the last_match dedup analog; cross-batch suppression would use
    dropDuplicatesWithinWatermark on a real event-time column)."""
    index_local = index_signatures.persist()

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        matches = search_batch(batch_df, index_local).dropDuplicates(
            ["query_id", "match_id"]
        )
        _idempotent_batch_write(matches, batch_id, output_table)

    writer = (
        stream_corpus.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="1 second")  # ears cadence
    return writer.start()


def windowed_match_counts(
    matches_with_time: DataFrame,
    window: str = "10 seconds",
    slide: str = "1 second",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Sliding-window rollup of match events (the ring-buffer analog:
    MicRecorder.mm 11 s buffer / 1 s slide), with a watermark the
    reference lacks."""
    return (
        matches_with_time.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window, slide), F.col("match_id"))
        .agg(F.count("*").alias("n_matches"))
    )


def _minhash_bands_col():
    """array<long>(25) band hashes computed JVM-side from the 100-byte
    minhash binary column (lsh.c:49-52: big-endian uint32 per 4 bytes)
    — no Python round-trip to band an already-computed signature."""
    return F.array(
        *[
            F.conv(F.hex(F.expr(f"substring(minhash, {4 * j + 1}, 4)")), 16, 10)
            .cast("long")
            for j in range(C.N_BANDS)
        ]
    )


def audio_search_batch(
    query_media: DataFrame, index_sigs: DataFrame
) -> DataFrame:
    """One micro-batch of the reference's actual domain: audio entries
    in, per-entry match decisions out (ears/main.m:101-188 semantics
    over the real spectral chain).

    Query payloads run the full audio chain (multimodal.
    audio_entry_signatures); each spectral image becomes one signature,
    banded JVM-side and probed against the index bands (lsh.c:89-112),
    >=2-band gate + byte score >= 30 per signature pair
    (search.c:11-43), then aggregated per (query_entry, index_entry)
    with the reference accept rule (search.c:19-29).

    ``index_sigs``: (media_id, frame_idx, minhash) — e.g. a previous
    audio_entry_signatures run, persisted.
    Output: (query_id, match_id, n_matches, avg_score, accepted).
    """
    from mnemophonix_spark.operators import lsh
    from mnemophonix_spark.operators.multimodal import audio_entry_signatures

    def sig_table(sigs: DataFrame) -> DataFrame:
        return (
            sigs.filter(F.col("decode_error").isNull() & ~F.col("is_silence"))
            .select(
                F.concat_ws("#", "media_id", "frame_idx").alias("image_id"),
                "minhash",
                _minhash_bands_col().alias("bands"),
            )
        )

    q_sigs = sig_table(audio_entry_signatures(query_media))
    i_sigs = sig_table(index_sigs)
    q_bands = lsh.explode_bands(q_sigs).withColumnRenamed("image_id", "qid")
    i_bands = lsh.explode_bands(i_sigs).withColumnRenamed("image_id", "iid")
    cand = (
        q_bands.join(i_bands, ["band_id", "band_hash"])
        .groupBy("qid", "iid")
        .agg(F.count("*").alias("n_shared_bands"))
        .filter(F.col("n_shared_bands") >= C.MIN_BAND_MATCHES)
        .select(
            F.col("qid").alias("id_a"), F.col("iid").alias("id_b"),
            "n_shared_bands",
        )
    )
    all_sigs = q_sigs.select("image_id", "minhash").unionByName(
        i_sigs.select("image_id", "minhash")
    )
    scored = lsh.score_pairs(cand, all_sigs)
    # per-entry aggregation + accept decision (search.c:19-29,179-180)
    by_entry = (
        scored.select(
            F.split("id_a", "#").getItem(0).alias("query_id"),
            F.split("id_b", "#").getItem(0).alias("match_id"),
            "score",
        )
        .filter(F.col("query_id") != F.col("match_id"))
        .groupBy("query_id", "match_id")
        .agg(
            F.count("*").alias("n_matches"),
            F.round(F.avg("score"), 6).alias("avg_score"),
        )
    )
    n, avg = F.col("n_matches"), F.col("avg_score")
    return by_entry.withColumn(
        "accepted",
        (
            (n >= C.MIN_SIGNATURE_MATCHES)
            | ((avg >= C.GOOD_SCORE) & (n >= C.MIN_SIGNATURE_MATCHES // 2))
        )
        & (avg >= C.MIN_AVERAGE_SCORE),
    )


def audio_stream_search(
    spark: SparkSession,
    stream_media: DataFrame,
    index_sigs: DataFrame,
    checkpoint_dir: str,
    output_table: str = "audio_stream_matches",
):
    """ears end-to-end in Spark: a streaming source of audio payloads,
    searched per micro-batch against a static signature index, accepted
    matches appended to the sink with per-batch (query, match) dedup
    (the last_match suppression analog, ears/main.m:61,76-77)."""
    index_local = index_sigs.persist()

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        matches = (
            audio_search_batch(batch_df, index_local)
            .filter(F.col("accepted"))
            .dropDuplicates(["query_id", "match_id"])
        )
        _idempotent_batch_write(matches, batch_id, output_table)

    return (
        stream_media.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_index_maintenance(
    spark: SparkSession,
    stream_corpus: DataFrame,
    checkpoint_dir: str,
    state: dict | None = None,
):
    """Streaming INDEX MAINTENANCE: every micro-batch of new images is
    fingerprinted once and appended to the living index through
    ``pipeline.incremental_dedup`` — the reference's build-then-match
    split (main.c index/match modes) recast as the production
    append-only pattern a 10^12-row corpus actually runs: no old row is
    ever re-fingerprinted, new-old candidates probe the committed band
    index, and cluster labels merge via contract-and-merge CC.

    ``state`` (a mutable dict, created if None) carries the living
    index between micro-batches: ``signatures``, ``clusters``,
    ``corpus``.  Each batch ends with ``localCheckpoint`` on the new
    state so lineage stays bounded over an unbounded stream (at cluster
    scale these become StageStore snapshot commits — same barrier).
    The final state must equal a from-scratch batch run over everything
    streamed, which is exactly what the pytest pins.

    Returns ``(query, state)``.
    """
    from mnemophonix_spark import pipeline
    from mnemophonix_spark.operators import components as comp
    from mnemophonix_spark.operators import verify as ver

    st: dict = state if state is not None else {}

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        # pin the batch rows: batch_df is only valid inside this call,
        # but the index state must outlive it
        batch_local = batch_df.localCheckpoint(eager=True)
        if batch_local.isEmpty():
            return
        if "signatures" not in st:
            # bootstrap: first batch is a normal batch dedup
            sigs = fingerprint(batch_local).localCheckpoint(eager=True)
            valid = valid_signatures(sigs)
            verified = ver.verify_pairs(
                lsh.score_pairs(
                    lsh.candidate_pairs(lsh.explode_bands(valid)), valid
                ),
                batch_local,
            )
            clusters = comp.assign_clusters(
                batch_local.select("image_id"),
                comp.connected_components(verified.select("id_a", "id_b")),
            )
            st.update(
                signatures=sigs,
                clusters=clusters.localCheckpoint(eager=True),
                corpus=batch_local,
            )
            return
        full = st["corpus"].unionByName(batch_local).localCheckpoint(eager=True)
        out = pipeline.incremental_dedup(
            spark, st["signatures"], st["clusters"], batch_local, full
        )
        st.update(
            signatures=out["signatures"].localCheckpoint(eager=True),
            clusters=out["clusters"].localCheckpoint(eager=True),
            corpus=full,
        )

    q = (
        stream_corpus.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return q, st


def stream_sliding_window_rollup(
    spark: SparkSession,
    sf_dir: str,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Structured-Streaming SLIDING-window rollup run to completion:
    every event lands in window/slide = 2 overlapping windows (the ring
    buffer overlap of MicRecorder.mm:16-21 expressed as event-time
    windows), counted per (window_start, event_type).

    availableNow + complete mode makes the final state equal the batch
    sliding-window aggregation, which is exactly SQL-expressible: event
    ts belongs to the windows starting at floor(ts/slide)*slide - j*slide
    for j in 0..(window/slide - 1), so the DuckDB twin unnests j and
    groups — giving the sliding-window streaming operator a value-exact
    oracle.  (The watermark participates in the query; eviction
    semantics are pinned by the append-mode pytest, since complete mode
    must retain all state.)
    """
    import uuid

    name = f"stream_slide_{uuid.uuid4().hex[:12]}"
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props map<string,string>"
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("win"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(20,4)")).cast("double"), 6
            ).alias("sum_value"),
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(300):
            raise TimeoutError(
                "stream_sliding_window_rollup: availableNow run did not "
                "finish in 300 s"
            )
        result = (
            spark.table(name)
            .select(
                F.col("win.start").alias("window_start"),
                "event_type",
                "n_events",
                "sum_value",
            )
            .cache()
        )
        result.count()
        return result
    finally:
        q.stop()
        spark.catalog.dropTempView(name)


def stream_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming twin of the batch hourly rollup, run to
    completion: file-source stream over the events table -> grouped
    aggregation -> complete-mode memory sink, availableNow trigger.

    Because availableNow drains all available input and complete mode
    emits the final aggregation state, the result EQUALS the batch
    groupBy — which gives the streaming engine an exact SQL oracle
    (the driver checks it value-for-value against DuckDB, the same gate
    as every batch operator).
    """
    import uuid

    name = f"stream_rollup_{uuid.uuid4().hex[:12]}"
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props map<string,string>"
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    agg = stream.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        F.col("event_type"),
    ).agg(
        F.count("*").alias("n_events"),
        # round-6 double output: decimal accumulation (exact, order-
        # independent), double emission (identical physical type to the
        # SQL twin — see relational.py output-type rule)
        F.round(
            F.sum(F.col("value").cast("decimal(20,4)")).cast("double"), 6
        ).alias("sum_value"),
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(300):
            raise TimeoutError(
                "stream_events_rollup: availableNow run did not finish in "
                "300 s — aggregation state would be partial"
            )
        # materialize before dropping the memory-sink table
        result = spark.table(name).cache()
        result.count()
        return result
    finally:
        q.stop()
        spark.catalog.dropTempView(name)
