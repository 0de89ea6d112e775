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
    return out_dir


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [120, 300]
    for n in sizes:
        print("wrote", build(n))
