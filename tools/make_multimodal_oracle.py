"""Precompute the NumPy-oracle frame-signature digests for the mixed-
container video corpus (FVID stand-in + real MJPEG-AVI + real animated
GIF) as a parquet fixture (the DuckDB side of the driver gate for
media_frame_sigs — same pattern as make_image_oracle.py).

Pure single-process NumPy: decode each payload, sample every 2nd frame,
run the grid->signature chain per frame, digest the minhash exactly as
the Spark query does (md5 of uppercase hex).

Usage: PYTHONPATH=/root/repo python tools/make_multimodal_oracle.py
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FIXTURE = os.path.join(
    os.path.dirname(__file__), "..", "tests", "fixtures", "multimodal_oracle"
)


def main() -> None:
    from mnemophonix_spark.functions import kernels
    from mnemophonix_spark.operators import multimodal as mm

    from mnemophonix_spark.codecs import CodecError

    out_rows = []
    for media_id, payload in mm.synthesize_media():
        try:
            # container dispatch (FVID / MJPEG-AVI / animated GIF),
            # same decode the Spark kernel runs
            frames = mm.decode_video(payload)
        except (mm.UnsupportedModality, CodecError):
            continue  # quarantined by the Spark side too
        for k in range(0, frames.shape[0], 2):
            grid = kernels.luma_to_grid(frames[k])
            sig = kernels.grid_to_signature(np.stack([grid]))
            out_rows.append(
                {
                    "media_id": media_id,
                    "frame_idx": k,
                    "minhash_md5": hashlib.md5(
                        sig["minhash"][0].tobytes().hex().upper().encode()
                    ).hexdigest(),
                    "is_silence": bool(sig["is_silence"][0]),
                }
            )
    os.makedirs(FIXTURE, exist_ok=True)
    pq.write_table(
        pa.Table.from_pylist(
            out_rows,
            schema=pa.schema(
                [
                    ("media_id", pa.string()),
                    ("frame_idx", pa.int32()),
                    ("minhash_md5", pa.string()),
                    ("is_silence", pa.bool_()),
                ]
            ),
        ),
        os.path.join(FIXTURE, "frame_sigs.parquet"),
    )
    print(f"wrote {os.path.abspath(FIXTURE)} ({len(out_rows)} rows)")


if __name__ == "__main__":
    main()
