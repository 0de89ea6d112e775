"""Spark pipeline vs oracle parity + resume + quarantine (SURVEY.md §5.3/5.6)."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from mnemophonix_spark import pipeline
from mnemophonix_spark.operators import components as comp


@pytest.fixture(scope="module")
def stages(spark, corpus_dir):
    return pipeline.run_dedup(spark, corpus_dir)


def test_signatures_bit_exact_vs_oracle(stages, oracle_result):
    sig = {r["image_id"]: r for r in stages["signatures"].collect()}
    oidx = {im: i for i, im in enumerate(oracle_result.image_ids)}
    assert set(sig) == set(oidx)
    for image_id, i in oidx.items():
        r = sig[image_id]
        assert bytes(r["minhash"]) == oracle_result.minhash[i].tobytes()
        assert bytes(r["raw_fp"]) == oracle_result.raw_fp[i].tobytes()
        assert r["is_silence"] == bool(oracle_result.is_silence[i])
        assert r["degenerate"] == bool(oracle_result.degenerate[i])
        assert r["bands"] == oracle_result.bands[i].tolist()


def test_scored_pairs_match_oracle(stages, oracle_result):
    got = {
        (r["id_a"], r["id_b"]): (r["n_shared_bands"], r["score"])
        for r in stages["scored"].collect()
    }
    want = {(a, b): (n, s) for a, b, n, s in oracle_result.pairs}
    assert got == want


def test_verified_pairs_match_oracle(stages, oracle_result):
    got = {(r["id_a"], r["id_b"]) for r in stages["verified"].collect()}
    want = {(a, b) for a, b, _ in oracle_result.verified_pairs}
    assert got == want


def test_clusters_match_oracle(stages, oracle_result):
    got = {r["image_id"]: r["cluster_id"] for r in stages["clusters"].collect()}
    assert got == oracle_result.clusters


def test_quarantine_bad_rows(spark):
    from mnemophonix_spark.operators.fingerprint import fingerprint
    from mnemophonix_spark import codecs, corpusgen
    import numpy as np

    good = codecs.encode_png(
        np.round(np.random.default_rng(0).uniform(0, 255, (40, 40)))
    )
    df = spark.createDataFrame(
        [
            ("ok", bytearray(good), 40, 40, "png", "cap", 0),
            ("bad", bytearray(b"not an image"), 1, 1, "png", "cap", 0),
            # truncated RIFF container with a valid magic: the webp
            # per-row decode must quarantine, not kill the Arrow task
            ("badwebp", bytearray(b"RIFF\x10\x00\x00\x00WEBPVP8L\x04\x00\x00\x00\x2f\xff\xff"),
             1, 1, "webp", "cap", 0),
            # valid GIF magic, garbage body: the gif per-row decode
            # must quarantine, not kill the Arrow task
            ("badgif", bytearray(b"GIF89a\x04\x00\x04\x00\x80\x00\x00junk"),
             1, 1, "gif", "cap", 0),
        ],
        "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long",
    )
    out = {r["image_id"]: r for r in fingerprint(df).collect()}
    assert out["ok"]["decode_error"] is None
    assert out["ok"]["minhash"] is not None
    assert out["bad"]["decode_error"] is not None
    assert out["bad"]["minhash"] is None
    assert out["badwebp"]["decode_error"] is not None
    assert out["badwebp"]["minhash"] is None
    assert out["badgif"]["decode_error"] is not None
    assert out["badgif"]["minhash"] is None


def test_resume_skips_committed_stages(spark, corpus_dir, tmp_path):
    events = []
    log = events.append
    pipeline.run_dedup(spark, corpus_dir, work_dir=str(tmp_path), log=log)
    assert all(e.startswith("[commit]") for e in events) and events

    events2 = []
    stages = pipeline.run_dedup(spark, corpus_dir, work_dir=str(tmp_path),
                                log=events2.append)
    assert all(e.startswith("[resume]") for e in events2)
    # resumed output is intact
    assert stages["clusters"].count() > 0
    # lineage records exist with per-partition counts
    import glob
    import json

    # layout: {work}/{run_id}/{stage}/{version}/_LINEAGE.json
    markers = glob.glob(str(tmp_path) + "/*/*/*/_LINEAGE.json")
    assert markers
    meta = json.load(open(markers[0]))
    assert meta["rows"] >= 0 and "partitions" in meta


@pytest.mark.parametrize("driver_threshold", [2_000_000, 0])
def test_connected_components_on_chain(spark, driver_threshold):
    """Path graph a-b-c-d-e collapses to min label — identically through
    the driver-side union-find (small graphs) and the distributed
    large-star/small-star loop (driver_threshold=0 forces it)."""
    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("d", "c"), ("e", "d"), ("x", "y")],
        "id_a string, id_b string",
    )
    got = {
        r["image_id"]: r["cluster_id"]
        for r in comp.connected_components(
            edges, driver_threshold=driver_threshold
        ).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "e": "a",
                   "x": "x", "y": "x"}


def test_assign_clusters_singletons(spark):
    corpus_ids = spark.createDataFrame(
        [("a",), ("b",), ("c",)], "image_id string"
    )
    components = spark.createDataFrame(
        [("a", "a"), ("b", "a")], "image_id string, cluster_id string"
    )
    got = {
        r["image_id"]: r["cluster_id"]
        for r in comp.assign_clusters(corpus_ids, components).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "c"}


def test_bands_explode_jvm_side(stages, spark):
    """The band explode must be a JVM posexplode, not a Python UDF stage."""
    from mnemophonix_spark.operators import lsh
    from mnemophonix_spark.operators.fingerprint import valid_signatures

    bands = lsh.explode_bands(valid_signatures(stages["signatures"]))
    plan = bands._jdf.queryExecution().executedPlan().toString()
    assert "Generate" in plan  # posexplode
    n_sigs = valid_signatures(stages["signatures"]).count()
    assert bands.count() == 25 * n_sigs


def test_hot_bucket_drop_mode(spark):
    """hot_mode='drop': the pathological bucket is skipped entirely and
    remains observable via hot_buckets."""
    from mnemophonix_spark.operators import lsh

    rows = [(f"id{i}", 0, 12345) for i in range(40)] + [("a", 1, 7), ("b", 1, 7)]
    bands = spark.createDataFrame(
        rows, "image_id string, band_id int, band_hash long"
    ).select("band_id", "band_hash", "image_id")
    cand = lsh.candidate_pairs(bands, cap=10, min_band_matches=1, hot_mode="drop")
    got = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    assert got == {("a", "b")}
    hot = lsh.hot_buckets(bands, cap=10).collect()
    assert len(hot) == 1 and hot[0]["bucket_size"] == 40


def test_hot_bucket_salt_mode_bounds_blowup(spark):
    """hot_mode='salt' (default): a 40-member bucket with cap 10 splits
    into 4 salt groups — pair count collapses from C(40,2)=780 to about
    4*C(10,2), and every within-group pair is genuine bucket co-membership."""
    from mnemophonix_spark.operators import lsh

    rows = [(f"id{i:02d}", 0, 12345) for i in range(40)] + [("a", 1, 7), ("b", 1, 7)]
    bands = spark.createDataFrame(
        rows, "image_id string, band_id int, band_hash long"
    ).select("band_id", "band_hash", "image_id")
    cand = lsh.candidate_pairs(bands, cap=10, min_band_matches=1)
    got = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    assert ("a", "b") in got
    hot_pairs = {p for p in got if p != ("a", "b")}
    assert 0 < len(hot_pairs) < 400  # bounded far below C(40,2)=780
    members = {f"id{i:02d}" for i in range(40)}
    assert all(x in members and y in members for x, y in hot_pairs)


def test_phash_dup_pairs_recovers_resize_dups(spark, corpus_dir, truth):
    """phash blocking must catch every planted image-dup pair whose
    pixels derive from the same base (incl. cross-resize pairs the
    signature LSH can miss through grid aliasing)."""
    from mnemophonix_spark.operators import phash as ph_op

    corpus = spark.read.parquet(f"{corpus_dir}/corpus")
    got = {(r["id_a"], r["id_b"]) for r in ph_op.phash_dup_pairs(corpus).collect()}
    pairs, _ = truth
    img_truth = {(p["id_a"], p["id_b"]) for p in pairs if p["kind"] in (1, 2, 3, 4)}
    assert img_truth <= got
    # and no caption-only (different pixels) pairs
    cap_truth = {(p["id_a"], p["id_b"]) for p in pairs if p["kind"] in (5, 6)}
    assert not (cap_truth & got)


def test_broadcast_decision_modes(spark):
    """Size-aware pair-side broadcast switch (VERDICT r1 finding #4)."""
    from mnemophonix_spark import config as C
    from mnemophonix_spark.operators import lsh

    df = spark.createDataFrame(
        [(f"id{i}", f"id{i+1}", 2) for i in range(50)],
        "id_a string, id_b string, n_shared_bands long",
    ).persist()
    df.count()  # materialized cache => exact stats
    assert lsh.broadcast_decision(df, mode="force") is True
    assert lsh.broadcast_decision(df, mode="never") is False
    assert lsh.broadcast_decision(df, mode="auto") is True  # tiny frame
    assert lsh.broadcast_decision(df, mode="auto", limit_bytes=0) is False
    with pytest.raises(ValueError):
        lsh.broadcast_decision(df, mode="sometimes")
    df.unpersist()


def test_pipeline_shuffle_join_path_equivalent(spark, corpus_dir, stages):
    """mode='never' (pure shuffle joins, the pathological-corpus
    fallback) must produce exactly the force-mode scored/verified sets."""
    from mnemophonix_spark import config as C

    baseline_scored = {
        (r["id_a"], r["id_b"], r["n_shared_bands"], r["score"])
        for r in stages["scored"].collect()
    }
    baseline_verified = {
        (r["id_a"], r["id_b"]) for r in stages["verified"].collect()
    }
    old = C.PAIR_BROADCAST_MODE
    C.PAIR_BROADCAST_MODE = "never"
    try:
        alt = pipeline.run_dedup(spark, corpus_dir)
        got_scored = {
            (r["id_a"], r["id_b"], r["n_shared_bands"], r["score"])
            for r in alt["scored"].collect()
        }
        got_verified = {(r["id_a"], r["id_b"]) for r in alt["verified"].collect()}
        # the shuffle plan must not contain our broadcast hints (AQE may
        # still convert at runtime; the *logical* hint must be gone)
        logical = alt["scored"]._jdf.queryExecution().optimizedPlan().toString()
        assert "ResolvedHint" not in logical
    finally:
        C.PAIR_BROADCAST_MODE = old
        for name in ("signatures", "bands", "candidates", "scored", "verified"):
            alt[name].unpersist()
    assert got_scored == baseline_scored
    assert got_verified == baseline_verified


def test_fused_clusters_cover_every_planted_kind(spark, corpus_dir, truth):
    """The fused multi-channel deliverable: every planted duplicate
    pair of EVERY kind (image re-encode/lossy/noise/resize + caption
    dup/substring) must land in one cluster — the phash and caption
    channels cover exactly the pairs the signature chain can miss."""
    cl = pipeline.fused_clusters(spark, corpus_dir)
    assign = {r["image_id"]: r["cluster_id"] for r in cl.collect()}
    pairs, _ = truth
    missed = [
        (p["id_a"], p["id_b"], p["kind"])
        for p in pairs
        if assign[p["id_a"]] != assign[p["id_b"]]
    ]
    assert not missed, missed[:10]
    # and clustering is not degenerate (not everything in one blob)
    assert len(set(assign.values())) > len(assign) // 2


def test_mass_duplicate_corpus_shuffle_fallback(spark, tmp_path):
    """Pathological corpus (every image identical): the candidate set
    explodes combinatorially, which is exactly the case the size-aware
    broadcast switch and salt capping exist for.  End-to-end the
    pipeline must (a) finish, (b) put everything in one cluster,
    (c) NOT broadcast the huge pair set when it exceeds the budget."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mnemophonix_spark import codecs, config as C

    rng = np.random.default_rng(17)
    # low-frequency texture: full-res uniform noise averages flat under
    # the canonical 128x32 resize and trips the silence gate (no
    # signatures at all) — coarse noise upsampled 8x survives it
    coarse = rng.uniform(0, 255, size=(12, 12))
    img = np.round(np.kron(coarse, np.ones((8, 8)))).astype(np.uint8)
    data = codecs.encode_png(img)
    phv = 0  # identical rows: any consistent phash works
    n = 400
    rows = [
        {
            "image_id": f"dup{i:05d}", "bytes": data, "w": 96, "h": 96,
            "fmt": "png", "caption": f"unique caption {i} th", "phash": phv,
        }
        for i in range(n)
    ]
    d = tmp_path / "mass" / "corpus"
    d.mkdir(parents=True)
    pq.write_table(pa.Table.from_pylist(rows), str(d / "part-0.parquet"))

    old_limit = C.BROADCAST_MAX_BYTES
    C.BROADCAST_MAX_BYTES = 64 * 1024  # force the pathological branch
    try:
        stages = pipeline.run_dedup(spark, str(tmp_path / "mass"))
        # the candidate stage is materialized: exact stats drive the
        # decision, which must be False at this budget
        from mnemophonix_spark.operators import lsh

        assert lsh.broadcast_decision(stages["candidates"]) is False
        clusters = {r["cluster_id"] for r in stages["clusters"].collect()}
        assert clusters == {"dup00000"}  # one component, min-id label
        n_cand = stages["candidates"].count()
        # salting bounds the blow-up far below C(400,2)=79800 per band
        assert 0 < n_cand
    finally:
        C.BROADCAST_MAX_BYTES = old_limit
        for name in ("signatures", "bands", "candidates", "scored", "verified"):
            stages[name].unpersist()


def test_incremental_dedup_equals_batch(spark, corpus_dir):
    """Index maintenance: fingerprint+probe only the NEW half of a
    corpus against the committed first half — the final cluster
    assignment must be IDENTICAL to the from-scratch batch run,
    including clusters that span the two batches."""
    from pyspark.sql import functions as F

    corpus = spark.read.parquet(f"{corpus_dir}/corpus").persist()
    ids = sorted(r["image_id"] for r in corpus.select("image_id").collect())
    half = set(ids[::2])  # interleaved split so dup clusters straddle batches
    old_corpus = corpus.filter(F.col("image_id").isin(half))
    new_corpus = corpus.filter(~F.col("image_id").isin(half))

    batch = pipeline.run_dedup(spark, corpus_dir)
    expected = {
        r["image_id"]: r["cluster_id"] for r in batch["clusters"].collect()
    }

    from mnemophonix_spark.operators import components as comp, lsh
    from mnemophonix_spark.operators import verify as ver
    from mnemophonix_spark.operators.fingerprint import fingerprint, valid_signatures

    old_sigs = fingerprint(old_corpus).persist()
    old_cand = lsh.candidate_pairs(lsh.explode_bands(valid_signatures(old_sigs)))
    old_scored = lsh.score_pairs(old_cand, valid_signatures(old_sigs))
    old_verified = ver.verify_pairs(old_scored, old_corpus)
    old_clusters = comp.assign_clusters(
        old_corpus.select("image_id"),
        comp.connected_components(old_verified.select("id_a", "id_b")),
    ).persist()

    inc = pipeline.incremental_dedup(
        spark, old_sigs, old_clusters, new_corpus, corpus
    )
    got = {r["image_id"]: r["cluster_id"] for r in inc["clusters"].collect()}
    assert got == expected
    # the merge must actually exercise cross-batch pairs
    n_cross = inc["new_pairs"].filter(
        F.col("id_a").isin(half) | F.col("id_b").isin(half)
    ).count()
    assert n_cross > 0, "fixture must plant clusters spanning the halves"
    assert inc["signatures"].count() == corpus.count()


def test_derived_driver_threshold(spark, monkeypatch):
    """CC driver cutoff is sized from the actual driver heap (env
    override wins; floor at 100k), and both sides of the derived
    boundary pick the intended execution path."""
    from mnemophonix_spark.operators import components as comp

    monkeypatch.delenv("SPARK_GRAFT_CC_DRIVER_EDGES", raising=False)
    thr = comp.derived_driver_threshold(spark)
    mem = comp._parse_mem(spark.conf.get("spark.driver.memory", "4g"))
    assert thr == max(100_000, int(mem * comp._DRIVER_MEM_FRACTION) // comp._BYTES_PER_EDGE)
    # 16g driver (session default) -> ~4.3M edges, scaling with memory
    assert comp._parse_mem("16g") == 16 << 30
    assert comp._parse_mem("4096m") == 4 << 30
    assert comp._parse_mem("123") == 123
    monkeypatch.setenv("SPARK_GRAFT_CC_DRIVER_EDGES", "7777")
    assert comp.derived_driver_threshold(spark) == 7777


def test_default_threshold_selects_driver_path_for_small_edges(spark, monkeypatch):
    """With the derived default (>=100k), a tiny edge list must label
    via driver union-find and equal the forced-distributed labels."""
    from mnemophonix_spark.operators import components as comp

    monkeypatch.delenv("SPARK_GRAFT_CC_DRIVER_EDGES", raising=False)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "id_a string, id_b string"
    )
    default = {
        (r["image_id"], r["cluster_id"])
        for r in comp.connected_components(edges).collect()
    }
    forced = {
        (r["image_id"], r["cluster_id"])
        for r in comp.connected_components(edges, driver_threshold=0).collect()
    }
    assert default == forced == {
        ("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")
    }


def test_color_jfif_rows_in_dedup_chain(spark):
    """COLOR baseline-JPEG rows flow the real dedup chain: interleaved
    YCbCr 4:4:4 streams decode (channel-mean mixdown) inside the
    fingerprint Arrow stage, planted color-lossy duplicates verify at
    PSNR >= 40, and no color row quarantines."""
    from tests.test_jfif import _natural_color

    from mnemophonix_spark import corpusgen, jfif
    from mnemophonix_spark.operators import lsh
    from mnemophonix_spark.operators import verify as ver
    from mnemophonix_spark.operators.fingerprint import (
        fingerprint,
        valid_signatures,
    )

    rows = []
    planted = []
    for seed in range(10):
        rgb = _natural_color(seed)
        base_id = f"col{seed:04d}a"
        rows.append((base_id, jfif.encode_jfif(rgb, 95)))
        if seed < 5:  # planted color-lossy duplicate (kind-2 analog)
            dup_id = f"col{seed:04d}b"
            rows.append((dup_id, jfif.encode_jfif(rgb, 90)))
            planted.append((base_id, dup_id))
    luma = {rid: jfif.decode_jfif(data) for rid, data in rows}
    corpus = spark.createDataFrame(
        [
            (rid, bytearray(data), 128, 96, "jfif", "",
             corpusgen._phash64(luma[rid]))
            for rid, data in rows
        ],
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    )
    sigs = fingerprint(corpus).persist()
    assert sigs.filter("decode_error is not null").count() == 0
    valid = valid_signatures(sigs)
    verified = ver.verify_pairs(
        lsh.score_pairs(lsh.candidate_pairs(lsh.explode_bands(valid)), valid),
        corpus,
    )
    found = {(r["id_a"], r["id_b"]) for r in verified.collect()}
    gated = {
        r["image_id"] for r in sigs.filter("is_silence or degenerate").collect()
    }
    scoreable = [p for p in planted if p[0] not in gated and p[1] not in gated]
    assert scoreable and all(p in found for p in scoreable), (
        f"missing color pairs: {set(scoreable) - found}"
    )
    sigs.unpersist()


def test_real_format_corpus_end_to_end(spark, tmp_path):
    """The full dedup stack over a corpus of REAL formats only — actual
    baseline JPEG (jfif), netpbm (pgm), WebP lossless (webp), GIF, and
    PNG — must recover the planted image-chain pairs at the recall
    contract, proving the real codecs through fingerprint -> LSH ->
    score -> verify -> cluster, not just through codec roundtrips."""
    import pyarrow.parquet as pq

    from mnemophonix_spark import corpusgen
    from mnemophonix_spark.operators import components as comp
    from mnemophonix_spark.operators import lsh
    from mnemophonix_spark.operators import verify as ver
    from mnemophonix_spark.operators.fingerprint import (
        fingerprint,
        valid_signatures,
    )

    out = str(tmp_path / "realfmt")
    c = corpusgen.write_corpus(
        out, 120, seed=11,
        fmt_choices=["jfif", "pgm", "png", "webp", "gif", "tiff",
                     "webp_lossy"])
    fmts = {r["fmt"] for r in c.rows}
    assert fmts == {"jfif", "pgm", "png", "webp", "gif", "tiff"}
    # the webp_lossy kind plants real 'VP8 ' (lossy) key frames among
    # the kind-2 re-encodes — the vp8.py decode path must carry its
    # share of the recall contract below, not just codec roundtrips
    n_vp8 = sum(1 for r in c.rows if r["bytes"][12:16] == b"VP8 ")
    assert n_vp8 >= 1, "no lossy VP8 rows planted"

    corpus = spark.read.parquet(f"{out}/corpus")
    sigs = fingerprint(corpus).persist()
    assert sigs.filter("decode_error is not null").count() == 0
    valid = valid_signatures(sigs)
    verified = ver.verify_pairs(
        lsh.score_pairs(lsh.candidate_pairs(lsh.explode_bands(valid)), valid),
        corpus,
    )
    found = {(r["id_a"], r["id_b"]) for r in verified.collect()}

    truth_rows = pq.read_table(f"{out}/truth_pairs.parquet").to_pylist()
    img_truth = {(r["id_a"], r["id_b"]) for r in truth_rows
                 if r["kind"] in (1, 2, 3, 4)}
    # recall contract on fingerprintable pairs (silence-gated members
    # are out of scope, same rule as BENCH/RECALL.md)
    gated = {
        r["image_id"]
        for r in sigs.filter("is_silence or degenerate").collect()
    }
    scoreable = {(a, b) for a, b in img_truth
                 if a not in gated and b not in gated}
    hit = len(scoreable & found)
    assert scoreable and hit / len(scoreable) >= 0.99, (
        f"{hit}/{len(scoreable)} real-format pairs found"
    )
    # clusters assemble over the real-format pairs too
    clusters = comp.assign_clusters(
        corpus.select("image_id"),
        comp.connected_components(verified.select("id_a", "id_b")),
    )
    assert clusters.count() == 120
    sigs.unpersist()


def test_color_png_jfif_cross_format_dedup(spark):
    """A COLOR PNG copy of a COLOR baseline-JPEG decodes through the
    per-channel unfilter + channel-mean mixdown and the pair verifies
    cross-format at PSNR >= 40 in the real chain — the color analog of
    the exact-re-encode duplicate kind."""
    from tests.test_jfif import _natural_color

    from mnemophonix_spark import codecs, corpusgen, jfif
    from mnemophonix_spark.operators import lsh
    from mnemophonix_spark.operators import verify as ver
    from mnemophonix_spark.operators.fingerprint import (
        fingerprint,
        valid_signatures,
    )

    rows = []
    planted = []
    for seed in range(6):
        rgb = _natural_color(seed)
        a_id, b_id = f"cpx{seed:03d}a", f"cpx{seed:03d}b"
        rows.append((a_id, codecs.encode_png_color(rgb, 2), "png"))
        rows.append((b_id, jfif.encode_jfif(rgb, 95), "jfif"))
        planted.append((a_id, b_id))
    gray = {
        rid: codecs.decode(bytes(data), fmt) for rid, data, fmt in rows
    }
    corpus = spark.createDataFrame(
        [
            (rid, bytearray(data), 128, 96, fmt, "",
             corpusgen._phash64(gray[rid]))
            for rid, data, fmt in rows
        ],
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    )
    sigs = fingerprint(corpus).persist()
    assert sigs.filter("decode_error is not null").count() == 0
    valid = valid_signatures(sigs)
    verified = ver.verify_pairs(
        lsh.score_pairs(lsh.candidate_pairs(lsh.explode_bands(valid)), valid),
        corpus,
    )
    found = {(r["id_a"], r["id_b"]) for r in verified.collect()}
    gated = {
        r["image_id"] for r in sigs.filter("is_silence or degenerate").collect()
    }
    scoreable = [p for p in planted if p[0] not in gated and p[1] not in gated]
    assert scoreable and all(p in found for p in scoreable), (
        f"missing cross-format color pairs: {set(scoreable) - found}"
    )
    sigs.unpersist()
