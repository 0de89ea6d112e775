"""Reference text signature-DB format: import/export parity bridge.

The reference persists its index as plain concatenated text
(fingerprintio.c:10-23 save, :156-206 read): per entry
  line 1: filename          line 2: artist
  line 3: track title       line 4: album title
  line 5: n_signatures
  then one 200-hex-char line per 100-byte signature, strictly
  validated (fingerprintio.c:136-140 rejects lines != 200 hex chars).

In this engine the Iceberg/parquet signatures table is authoritative
(SURVEY.md §1.3); this text format survives only as (a) a debug export
and (b) the bridge for importing reference-generated fixtures.  The
image graft stores one signature per image and maps the four metadata
lines to (image_id, caption, "", "").
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_HEX_LINE = re.compile(r"^[0-9a-fA-F]{200}$")


@dataclass
class TextEntry:
    name: str
    artist: str
    title: str
    album: str
    signatures: list[bytes]


class SignatureFormatError(ValueError):
    """Strict-format violation (fingerprintio.c:136-140 analog)."""


def export_text(signatures: DataFrame, path: str) -> int:
    """Write valid signatures as a reference-format text DB.

    Driver-side debug export (collects; do not use at corpus scale —
    the parquet/Iceberg table is the real sink).  Returns entry count.
    """
    rows = (
        signatures.filter(F.col("minhash").isNotNull())
        .select("image_id", "caption", "minhash")
        .orderBy("image_id")
        .collect()
    )
    with open(path, "w") as f:
        for r in rows:
            f.write(f"{r['image_id']}\n{r['caption'] or ''}\n\n\n1\n")
            f.write(bytes(r["minhash"]).hex() + "\n")
    return len(rows)


def parse_text(path: str) -> list[TextEntry]:
    """Strict sequential parse of the text format (fingerprintio.c:74-153)."""
    entries: list[TextEntry] = []
    with open(path) as f:
        lines = [ln.rstrip("\n") for ln in f]
    i = 0
    while i < len(lines):
        if i + 5 > len(lines):
            raise SignatureFormatError(f"truncated header at line {i + 1}")
        name, artist, title, album, n_str = lines[i : i + 5]
        try:
            n = int(n_str)
        except ValueError:
            raise SignatureFormatError(
                f"bad signature count {n_str!r} at line {i + 5}"
            ) from None
        i += 5
        sigs = []
        for k in range(n):
            if i >= len(lines) or not _HEX_LINE.match(lines[i]):
                raise SignatureFormatError(
                    f"line {i + 1}: expected 200 hex chars"  # :136-140
                )
            sigs.append(bytes.fromhex(lines[i]))
            i += 1
        entries.append(TextEntry(name, artist, title, album, sigs))
    return entries


def import_text(spark: SparkSession, path: str) -> DataFrame:
    """Text DB -> signatures DataFrame (image_id, sig_idx, minhash, caption)."""
    entries = parse_text(path)
    rows = [
        (e.name, k, bytearray(sig), e.artist)
        for e in entries
        for k, sig in enumerate(e.signatures)
    ]
    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("sig_idx", T.IntegerType()),
            T.StructField("minhash", T.BinaryType()),
            T.StructField("caption", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)
