"""Precompute NumPy-oracle outputs for the image chain as parquet.

These fixtures are the DuckDB side of the driver's correctness gate for
the image queries in __spark_entry__ (the chain itself is not
SQL-expressible, but its oracle-computed outputs are queryable via
read_parquet).  Deterministic: corpus seed 42, fixed N per sf tier.

Usage: python tools/make_image_oracle.py [N ...]
"""

from __future__ import annotations

import glob
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

FIXTURE_ROOT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


def build(n_rows: int) -> str:
    import hashlib

    import pyarrow.parquet as pq2

    from mnemophonix_spark import corpusgen, oracle

    corpus_dir = corpusgen.ensure_corpus("/root/repo/.cache", n_rows)
    files = sorted(glob.glob(f"{corpus_dir}/corpus/part-*.parquet"))
    rows = pq2.read_table(files).to_pylist()
    res = oracle.run_chain(
        [(r["image_id"], r["bytes"], r["fmt"]) for r in rows],
        phash={r["image_id"]: r["phash"] for r in rows},
    )
    out_dir = os.path.abspath(os.path.join(FIXTURE_ROOT, f"image_oracle_n{n_rows}"))
    os.makedirs(out_dir, exist_ok=True)

    # signature digest: md5 of the uppercase-hex minhash (matches Spark
    # md5(hex(minhash)))
    digest_rows = [
        {
            "image_id": res.image_ids[i],
            "minhash_md5": hashlib.md5(
                res.minhash[i].tobytes().hex().upper().encode()
            ).hexdigest(),
            "is_silence": bool(res.is_silence[i]),
        }
        for i in range(len(res.image_ids))
    ]
    pq.write_table(
        pa.Table.from_pylist(digest_rows), os.path.join(out_dir, "signature_digest.parquet")
    )

    pq.write_table(
        pa.Table.from_pylist(
            [
                {"id_a": a, "id_b": b, "n_shared_bands": n, "score": s}
                for a, b, n, s in res.pairs
            ],
            schema=pa.schema(
                [("id_a", pa.string()), ("id_b", pa.string()),
                 ("n_shared_bands", pa.int64()), ("score", pa.int32())]
            ),
        ),
        os.path.join(out_dir, "scored_pairs.parquet"),
    )
    pq.write_table(
        pa.Table.from_pylist(
            [{"id_a": a, "id_b": b} for a, b, _ in res.verified_pairs],
            schema=pa.schema([("id_a", pa.string()), ("id_b", pa.string())]),
        ),
        os.path.join(out_dir, "verified_pairs.parquet"),
    )
    pq.write_table(
        pa.Table.from_pylist(
            [{"image_id": k, "cluster_id": v} for k, v in sorted(res.clusters.items())]
        ),
        os.path.join(out_dir, "clusters.parquet"),
    )

    # LSH band table for valid signatures: 25 rows per image, matching
    # Spark's lsh.explode_bands output (band_id, band_hash, image_id)
    valid = ~res.is_silence & ~res.degenerate
    band_rows = [
        {"band_id": b, "band_hash": int(res.bands[i][b]), "image_id": res.image_ids[i]}
        for i in range(len(res.image_ids))
        if valid[i]
        for b in range(res.bands.shape[1])
    ]
    pq.write_table(
        pa.Table.from_pylist(
            band_rows,
            schema=pa.schema(
                [("band_id", pa.int32()), ("band_hash", pa.int64()),
                 ("image_id", pa.string())]
            ),
        ),
        os.path.join(out_dir, "bands.parquet"),
    )

    cap_pairs = caption_oracle(
        [(r["image_id"], r["caption"]) for r in rows]
    )
    pq.write_table(
        pa.Table.from_pylist(
            [{"id_a": a, "id_b": b, "via": v} for a, b, v in sorted(cap_pairs)],
            schema=pa.schema(
                [("id_a", pa.string()), ("id_b", pa.string()), ("via", pa.string())]
            ),
        ),
        os.path.join(out_dir, "caption_pairs.parquet"),
    )
    return out_dir


def caption_oracle(rows: list[tuple[str, str]]) -> set[tuple[str, str, str]]:
    """Independent brute-force caption channel (exact / simhash / substring).

    Mirrors operators/captions.py semantics exactly:
    - normalization: lower + whitespace collapse + trim
    - simhash: 64 bits from md5 of each word, sign of the +-1 sums;
      pairs at hamming <= 3 (the 4x16 banding is lossless for radius 3)
    - substring: word-aligned strict containment, shorter inside longer
    """
    import hashlib
    import re as _re

    norm = {}
    for image_id, cap in rows:
        c = _re.sub(r"\s+", " ", (cap or "").strip().lower())
        if c:
            norm[image_id] = c

    out: set[tuple[str, str, str]] = set()
    ids = sorted(norm)

    def simhash(cap: str) -> str:
        s = [0] * 64
        for w in cap.split(" "):
            hexs = hashlib.md5(w.encode()).hexdigest()
            for b in range(64):
                nib = int(hexs[b // 4], 16)
                bit = (nib >> (3 - b % 4)) & 1
                s[b] += 2 * bit - 1
        return "".join("1" if v > 0 else "0" for v in s)

    sh = {i: simhash(norm[i]) for i in ids}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            if norm[a] == norm[b]:
                out.add((a, b, "exact"))
            ham = sum(1 for p, q in zip(sh[a], sh[b]) if p != q)
            if ham <= 3:
                out.add((a, b, "simhash"))
            for s_id, l_id in ((a, b), (b, a)):
                cs, cl = norm[s_id], norm[l_id]
                if len(cs) < len(cl) and f" {cs} " in f" {cl} ":
                    out.add((min(a, b), max(a, b), "substring"))
    return out


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [120, 300]
    for n in sizes:
        print("wrote", build(n))
