"""Precompute NumPy-oracle outputs for the AUDIO chain as parquet.

Same recipe as make_image_oracle.py: the deterministic corpus
(multimodal.synthesize_audio) runs through the single-process chain one
entry at a time, and the outputs become the DuckDB side of the driver's
correctness gate (read_parquet) for the audio queries in
__spark_entry__.  Independence of the underlying DSP kernels is pinned
separately by tests/test_kernels.py naive-loop cross-checks.

Usage: python tools/make_audio_oracle.py
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq

FIXTURE_ROOT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


def build() -> str:
    from mnemophonix_spark import codecs
    from mnemophonix_spark.functions import audio
    from mnemophonix_spark.operators import multimodal as mm

    out_dir = os.path.abspath(os.path.join(FIXTURE_ROOT, "audio_oracle"))
    os.makedirs(out_dir, exist_ok=True)

    sig_rows = []
    digest_rows = []
    for mid, data in mm.synthesize_audio():
        try:
            samples, meta = mm._decode_audio_payload(data)
        except (codecs.CodecError, mm.UnsupportedModality, audio.AudioTooShort):
            continue  # the Spark queries filter decode_error rows out
        digest_rows.append(
            {
                "media_id": mid,
                "n_samples": int(samples.size),
                "samples_md5": hashlib.md5(
                    samples.astype("<f4").tobytes()
                ).hexdigest(),
                "artist": meta["artist"],
                "title": meta["title"],
                "album": meta["album"],
            }
        )
        try:
            # a decodable entry can still be too short to fingerprint
            # (FILE_TOO_SMALL, fingerprinting.c:42-45): it keeps its
            # sample digest but contributes no signature rows
            sig = audio.audio_signatures(samples)
        except audio.AudioTooShort:
            continue
        for k in range(sig["minhash"].shape[0]):
            sig_rows.append(
                {
                    "media_id": mid,
                    "frame_idx": k,
                    # matches Spark md5(hex(minhash)) (uppercase hex)
                    "minhash_md5": hashlib.md5(
                        sig["minhash"][k].tobytes().hex().upper().encode()
                    ).hexdigest(),
                    "is_silence": bool(sig["is_silence"][k]),
                }
            )

    pq.write_table(
        pa.Table.from_pylist(
            sig_rows,
            schema=pa.schema(
                [("media_id", pa.string()), ("frame_idx", pa.int32()),
                 ("minhash_md5", pa.string()), ("is_silence", pa.bool_())]
            ),
        ),
        os.path.join(out_dir, "frame_sigs.parquet"),
    )
    pq.write_table(
        pa.Table.from_pylist(
            digest_rows,
            schema=pa.schema(
                [("media_id", pa.string()), ("n_samples", pa.int32()),
                 ("samples_md5", pa.string()), ("artist", pa.string()),
                 ("title", pa.string()), ("album", pa.string())]
            ),
        ),
        os.path.join(out_dir, "sample_digest.parquet"),
    )
    return out_dir


if __name__ == "__main__":
    print("wrote", build())
