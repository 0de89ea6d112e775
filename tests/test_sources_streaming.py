"""Signature text-format bridge, streaming search, multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest

from mnemophonix_spark.sources import signature_io as sio


def test_text_roundtrip(spark, tmp_path, stages_signatures):
    path = str(tmp_path / "db.txt")
    n = sio.export_text(stages_signatures, path)
    assert n > 0
    entries = sio.parse_text(path)
    assert len(entries) == n
    assert all(len(s) == 100 for e in entries for s in e.signatures)
    df = sio.import_text(spark, path)
    orig = {
        r["image_id"]: bytes(r["minhash"])
        for r in stages_signatures.filter("minhash is not null").collect()
    }
    got = {r["image_id"]: bytes(r["minhash"]) for r in df.collect()}
    assert got == orig


@pytest.fixture(scope="module")
def stages_signatures(spark, corpus_dir):
    from mnemophonix_spark.operators.fingerprint import fingerprint

    return fingerprint(spark.read.parquet(f"{corpus_dir}/corpus")).persist()


def test_text_strict_format_rejected(tmp_path):
    bad = tmp_path / "bad.txt"
    bad.write_text("name\nartist\ntitle\nalbum\n1\n" + "zz" * 99 + "\n")
    with pytest.raises(sio.SignatureFormatError):
        sio.parse_text(str(bad))
    short = tmp_path / "short.txt"
    short.write_text("name\nartist\ntitle\nalbum\n1\n" + "ab" * 99 + "\n")  # 198 chars
    with pytest.raises(sio.SignatureFormatError):
        sio.parse_text(str(short))


def test_stream_search_available_now(spark, corpus_dir, tmp_path):
    """File-source streaming corpus -> foreachBatch search against a
    static index; planted dups must surface as matches."""
    import shutil

    from mnemophonix_spark.operators.fingerprint import fingerprint, valid_signatures
    from mnemophonix_spark.streaming import stream_search as ss

    spark.sql("DROP TABLE IF EXISTS stream_matches_test")
    shutil.rmtree(
        "/root/repo/spark-warehouse/stream_matches_test", ignore_errors=True
    )
    corpus = spark.read.parquet(f"{corpus_dir}/corpus")
    index = valid_signatures(fingerprint(corpus)).persist()
    index.count()

    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(f"{corpus_dir}/corpus")
    )
    q = ss.stream_search(
        spark, stream, index, checkpoint_dir=str(tmp_path / "ckpt"),
        output_table="stream_matches_test",
    )
    q.awaitTermination(120)
    out = spark.table("stream_matches_test")
    got = {(r["query_id"], r["match_id"]) for r in out.collect()}
    # every oracle scored pair must appear (in both orientations the
    # stream sees them as query rows)
    import pyarrow.parquet as pq

    tp = pq.read_table(f"{corpus_dir}/truth_pairs.parquet").to_pylist()
    truth = {(r["id_a"], r["id_b"]) for r in tp if r["kind"] in (1, 2, 3)}
    found_either = {(a, b) for a, b in got} | {(b, a) for a, b in got}
    assert truth <= found_either
    spark.sql("DROP TABLE IF EXISTS stream_matches_test")


def test_video_frame_signatures(spark):
    from mnemophonix_spark.operators import multimodal as mm

    rng = np.random.default_rng(5)
    frames = rng.uniform(0, 255, size=(6, 48, 64))
    good = mm.encode_fake_video(frames)
    df = spark.createDataFrame(
        [("vid0", bytearray(good)), ("bad0", bytearray(b"mp4 is not here"))],
        "media_id string, bytes binary",
    )
    out = mm.video_frame_signatures(df, every_nth=2).collect()
    rows = {(r["media_id"], r["frame_idx"]): r for r in out}
    assert {(m, i) for m, i in rows if m == "vid0"} == {
        ("vid0", 0), ("vid0", 2), ("vid0", 4)
    }
    assert rows[("bad0", -1)]["decode_error"] is not None
    assert all(
        len(bytes(r["minhash"])) == 100 for r in out if r["media_id"] == "vid0"
    )
    # per-frame signatures equal the single-image chain on that frame
    from mnemophonix_spark.functions import kernels

    decoded = mm.decode_fake_video(good)  # u8 quantization applied
    sig = kernels.grid_to_signature(
        np.stack([kernels.luma_to_grid(decoded[0])])
    )
    assert bytes(rows[("vid0", 0)]["minhash"]) == sig["minhash"][0].tobytes()


def test_fake_pcm_roundtrip_and_unsupported():
    from mnemophonix_spark.operators import multimodal as mm

    samples = np.sin(np.linspace(0, 20, 1000)).astype(np.float32)
    out, rate = mm.decode_fake_pcm(mm.encode_fake_pcm(samples, 5512))
    assert rate == 5512 and np.allclose(out, samples)
    with pytest.raises(mm.UnsupportedModality):
        mm.decode_fake_pcm(b"RIFF....WAVE")


def test_windowed_match_counts_watermark_semantics(spark, tmp_path):
    """Event-time correctness of the sliding-rollup helper: a closed
    window is emitted exactly once with the right count when the
    watermark passes its end, a still-open window is withheld in
    append mode, and behind-watermark state never lingers — the
    state-cleanup behavior the reference's ring buffer lacks and a
    production stream needs.  (Dropping late input outright is
    best-effort per the Spark contract — this Spark emits a
    behind-watermark row's window immediately instead of retaining
    state for it — so the test pins emission/holdback, not the drop.)"""
    import datetime
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mnemophonix_spark.streaming.stream_search import windowed_match_counts

    src = tmp_path / "events"
    src.mkdir()
    base = datetime.datetime(2024, 1, 1, 10, 0, 0)

    def write(name, rows, mtime):
        tbl = pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [("event_time", pa.timestamp("us")), ("match_id", pa.string())]
            ),
        )
        p = str(src / name)
        pq.write_table(tbl, p)
        os.utime(p, (mtime, mtime))

    # batch 1: six on-time events in [10:00:00, 10:00:06)
    write(
        "b1.parquet",
        [{"event_time": base + datetime.timedelta(seconds=s), "match_id": "m1"}
         for s in range(6)],
        _time.time() - 100,
    )
    # batch 2: a far-future event (advances the watermark past batch 1's
    # window) plus one event far BEHIND the watermark (must be dropped)
    write(
        "b2.parquet",
        [
            {"event_time": base + datetime.timedelta(minutes=5), "match_id": "m2"},
            {"event_time": base - datetime.timedelta(hours=1), "match_id": "late"},
        ],
        _time.time() - 50,
    )

    stream = (
        spark.readStream.schema("event_time timestamp, match_id string")
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch, mtime order
        .parquet(str(src))
    )
    counts = windowed_match_counts(stream, window="10 seconds", slide="10 seconds")
    q = (
        counts.writeStream.format("memory")
        .queryName("wmc")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r["window"]["start"], r["match_id"]): r["n_matches"]
        for r in spark.sql("select * from wmc").collect()
    }
    # the tumbling window [10:00:00, 10:00:10) closed when batch 2 moved
    # the watermark to 10:04:30, so append mode emitted it, exactly
    # once, with all 6 rows
    assert rows.get((base, "m1")) == 6
    assert sum(1 for k in rows if k[1] == "m1") == 1
    # m2's window was still open (watermark < its end) when the stream
    # ended, so append mode held it back
    assert not any(k[1] == "m2" for k in rows)
    # behind-watermark arrival: window finalized immediately (no state
    # retained); emitted-on-arrival on this Spark, never duplicated
    assert sum(1 for k in rows if k[1] == "late") <= 1


def test_entry_match_decisions_reference_semantics(spark):
    """Planted clones exercise every branch of the accept rule
    (search.c:19-29), and the Spark decisions must equal the oracle's
    aggregate_entry_scores on the same match lists."""
    from mnemophonix_spark import oracle
    from mnemophonix_spark.operators import multimodal as mm

    media = spark.createDataFrame(
        [(m, bytearray(b)) for m, b in mm.synthesize_media()],
        "media_id string, bytes binary",
    )
    sigs = mm.video_frame_signatures(media, every_nth=2)
    got = {
        (r["media_a"], r["media_b"]): (r["n_matches"], bool(r["accepted"]))
        for r in mm.entry_match_decisions(sigs).collect()
    }
    # planted truth: n>=10 branch, avg-path branch, clip-reject, n>=10
    assert got == {
        ("media00000", "media00030"): (10, True),
        ("media00001", "media00031"): (6, True),
        ("media00002", "media00032"): (4, False),
        ("media00003", "media00033"): (14, True),
    }
    # same match lists through the reference-semantics oracle
    sig_scores = [
        (f"{a}|{b}", 100, 0) for (a, b), (n, _) in got.items() for _i in range(n)
    ]
    expected = {
        entry: acc for entry, _avg, _n, acc in oracle.aggregate_entry_scores(sig_scores)
    }
    for (a, b), (_n, acc) in got.items():
        assert expected[f"{a}|{b}"] == acc


def test_audio_stream_search_finds_planted_clones(spark, tmp_path):
    """ears end-to-end in the reference's native domain: a static audio
    index, a streaming source of query payloads (clones + corrupt
    rows), per-batch spectral-chain search, reference accept rule."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mnemophonix_spark.operators import multimodal as mm
    from mnemophonix_spark.streaming import stream_search as ss

    import shutil

    spark.sql("DROP TABLE IF EXISTS audio_stream_matches_test")
    shutil.rmtree(
        "/root/repo/spark-warehouse/audio_stream_matches_test", ignore_errors=True
    )
    rows = dict(mm.synthesize_audio())
    clone_ids = ["audio00000st", "audio00001fp", "audio00008st", "audio00009fp"]
    base_ids = ["audio00000", "audio00001", "audio00008", "audio00009"]
    index_media = spark.createDataFrame(
        [(m, bytearray(rows[m])) for m in base_ids],
        "media_id string, bytes binary",
    )
    index_sigs = mm.audio_entry_signatures(index_media).persist()
    index_sigs.count()

    # streaming source: one parquet file per micro-batch
    src = tmp_path / "stream_in"
    src.mkdir()
    batches = [clone_ids[:2], clone_ids[2:] + ["audio00030"]]  # + corrupt row
    for i, ids in enumerate(batches):
        pq.write_table(
            pa.Table.from_pylist(
                [{"media_id": m, "bytes": rows[m]} for m in ids]
            ),
            str(src / f"b{i}.parquet"),
        )
    stream = (
        spark.readStream.schema("media_id string, bytes binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = ss.audio_stream_search(
        spark, stream, index_sigs,
        checkpoint_dir=str(tmp_path / "ckpt"),
        output_table="audio_stream_matches_test",
    )
    assert q.awaitTermination(180)
    got = {
        (r["query_id"], r["match_id"]): (r["n_matches"], r["avg_score"])
        for r in spark.table("audio_stream_matches_test").collect()
    }
    # every planted clone matches exactly its base: the 8 bit-identical
    # spectral images score 100 each, and overlapping neighbor images
    # may add further above-threshold matches (the reference counts all
    # of them, search.c:147-168) — so n >= 8 with a high average
    assert set(got) == set(zip(clone_ids, base_ids)), got
    for n, avg in got.values():
        assert n >= 8 and avg >= 35.0, (n, avg)
    spark.sql("DROP TABLE IF EXISTS audio_stream_matches_test")
    index_sigs.unpersist()


def test_foreach_batch_write_is_idempotent(spark):
    """foreachBatch is at-least-once: replaying a batch_id must not
    duplicate rows (ADVICE round 2 — dynamic partition overwrite keyed
    on batch_id)."""
    import shutil

    from mnemophonix_spark.streaming.stream_search import _idempotent_batch_write

    spark.sql("DROP TABLE IF EXISTS idemp_write_test")
    shutil.rmtree("/root/repo/spark-warehouse/idemp_write_test", ignore_errors=True)
    df1 = spark.createDataFrame([("q1", "m1")], "query_id string, match_id string")
    _idempotent_batch_write(df1, 0, "idemp_write_test")
    _idempotent_batch_write(df1, 0, "idemp_write_test")  # replay of batch 0
    assert spark.table("idemp_write_test").count() == 1
    df2 = spark.createDataFrame(
        [("q2", "m2"), ("q3", "m3")], "query_id string, match_id string"
    )
    _idempotent_batch_write(df2, 1, "idemp_write_test")
    assert spark.table("idemp_write_test").count() == 3
    _idempotent_batch_write(df2, 1, "idemp_write_test")  # replay of batch 1
    assert spark.table("idemp_write_test").count() == 3
    # batch 0 rows untouched by batch 1's overwrite
    assert spark.table("idemp_write_test").filter("batch_id = 0").count() == 1
    spark.sql("DROP TABLE IF EXISTS idemp_write_test")


def test_stream_index_maintenance_equals_batch(spark, corpus_dir, tmp_path):
    """The living streaming index (bootstrap batch + incremental
    appends per micro-batch) must end exactly equal to a from-scratch
    batch run over everything streamed — the append-only production
    pattern with the batch pipeline as its oracle."""
    from mnemophonix_spark.operators import components as comp
    from mnemophonix_spark.operators import lsh
    from mnemophonix_spark.operators import verify as ver
    from mnemophonix_spark.operators.fingerprint import (
        fingerprint,
        valid_signatures,
    )
    from mnemophonix_spark.streaming import stream_search as ss

    corpus = spark.read.parquet(f"{corpus_dir}/corpus")
    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 3)  # several incremental batches
        .parquet(f"{corpus_dir}/corpus")
    )
    q, state = ss.stream_index_maintenance(
        spark, stream, checkpoint_dir=str(tmp_path / "ckpt")
    )
    assert q.awaitTermination(600)
    assert state["corpus"].count() == corpus.count()

    valid = valid_signatures(fingerprint(corpus))
    verified = ver.verify_pairs(
        lsh.score_pairs(lsh.candidate_pairs(lsh.explode_bands(valid)), valid),
        corpus,
    )
    batch = {
        (r["image_id"], r["cluster_id"])
        for r in comp.assign_clusters(
            corpus.select("image_id"),
            comp.connected_components(verified.select("id_a", "id_b")),
        ).collect()
    }
    streamed = {
        (r["image_id"], r["cluster_id"])
        for r in state["clusters"].select("image_id", "cluster_id").collect()
    }
    assert streamed == batch


def test_best_match_selection_rule(spark):
    """best_match_decisions: max avg_score among ACCEPTED entries per
    query, ties by n_matches desc then match_id asc; queries with no
    accepted match emit nothing (NO_MATCH_FOUND, main.c:114)."""
    from mnemophonix_spark.operators import multimodal as mm

    def frames(media_id, tags):
        return [(media_id, bytes([t]) * 100, None, False) for t in tags]

    # q matches e1 on 10 frames (n=10, avg 100: accepted), e2 on 6
    # (accepted via avg>=35 & n>=5), e3 on 4 (n<5: rejected);
    # q2 matches only e3 on 4 frames -> no accepted match at all
    rows = (
        frames("q", range(1, 11)) + frames("e1", range(1, 11))
        + frames("q", range(20, 26)) + frames("e2", range(20, 26))
        + frames("q", [40]) + frames("e2", [40])  # 6th shared frame q-e2
        + frames("q2", range(60, 64)) + frames("e3", range(60, 64))
    )
    sigs = spark.createDataFrame(
        rows, "media_id string, minhash binary, decode_error string, is_silence boolean"
    )
    best = {
        r["query_id"]: (r["match_id"], r["n_matches"])
        for r in mm.best_match_decisions(sigs).collect()
    }
    # q: e1 (n=10) and e2 (n=7: 6+1... both avg 100) accepted -> tie on
    # avg, n desc picks e1
    assert best["q"] == ("e1", 10)
    # symmetric direction: e1's best is q
    assert best["e1"] == ("q", 10)
    assert "q2" not in best  # its only candidate was rejected (n=4)
    assert "e3" not in best


def test_avi_mjpeg_video_frames_end_to_end(spark):
    """REAL video container through the frame-signature chain: MJPEG
    AVI payloads (real RIFF walk + real baseline-JFIF frames) decode,
    fingerprint per sampled frame, and a planted AVI clone is accepted
    by the per-entry match rule alongside FVID rows; corrupt AVI
    quarantines."""
    import numpy as np

    from mnemophonix_spark.operators import multimodal as mm

    rng = np.random.default_rng(12)
    # low-frequency content (synthesize_media recipe): full-res noise
    # averages flat under the canonical 128x32 resize and trips the
    # silence gate, so frames are coarse noise upsampled 8x
    frames = np.kron(rng.uniform(0, 255, size=(24, 6, 8)),
                     np.ones((1, 8, 8))).round()
    avi = mm.encode_avi_mjpeg(frames, quality=95)
    # clone: same AVI bytes under a different id -> every sampled frame
    # signature matches exactly
    other = np.kron(rng.uniform(0, 255, size=(24, 6, 8)),
                    np.ones((1, 8, 8))).round()
    from mnemophonix_spark import gif

    rows = [
        ("avi_base", bytearray(avi)),
        ("avi_clone", bytearray(avi)),
        ("avi_other", bytearray(mm.encode_avi_mjpeg(other, quality=95))),
        ("fvid0", bytearray(mm.encode_fake_video(frames))),
        ("bad_avi", bytearray(b"RIFF\x10\x00\x00\x00AVI " + b"\x00" * 16)),
        # REAL animated GIF: lossless container, so a gif clone of the
        # FVID row's frames matches it signature-for-signature
        ("gif_clone", bytearray(gif.encode_gif_frames(frames))),
        ("bad_gif", bytearray(b"GIF89a\x08\x00\x08\x00\x80\x00\x00junk")),
    ]
    media = spark.createDataFrame(rows, "media_id string, bytes binary")
    sigs = mm.video_frame_signatures(media, every_nth=2)
    got = sigs.collect()
    by_media = {}
    for r in got:
        by_media.setdefault(r["media_id"], []).append(r)
    assert [r["decode_error"] for r in by_media["bad_avi"]] != [None]
    assert all(r["decode_error"] is None for r in by_media["avi_base"])
    assert len(by_media["avi_base"]) == 12  # 24 frames, every 2nd
    # decisions: the AVI clone is accepted against its base; the
    # unrelated AVI is not paired with either
    dec = {
        (r["media_a"], r["media_b"]): r["accepted"]
        for r in mm.entry_match_decisions(sigs).collect()
    }
    assert dec.get(("avi_base", "avi_clone")) is True
    assert not any("avi_other" in k for k in dec)
    # cross-container match: animated GIF decodes the same uint8 frames
    # as FVID, so the pair is accepted; corrupt GIF quarantines
    assert [r["decode_error"] for r in by_media["bad_gif"]] != [None]
    assert all(r["decode_error"] is None for r in by_media["gif_clone"])
    assert dec.get(("fvid0", "gif_clone")) is True
