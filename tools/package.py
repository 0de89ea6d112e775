"""Package mnemophonix_spark for spark-submit --py-files.

Produces dist/mnemophonix_spark.zip containing the package (source +
the frozen permutation table data file).  Pure stdlib.
"""

from __future__ import annotations

import os
import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
PKG = ROOT / "mnemophonix_spark"
OUT = ROOT / "dist" / "mnemophonix_spark.zip"


def build() -> Path:
    OUT.parent.mkdir(exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        for path in sorted(PKG.rglob("*")):
            if path.is_dir() or "__pycache__" in path.parts:
                continue
            z.write(path, path.relative_to(ROOT))
    return OUT


if __name__ == "__main__":
    out = build()
    names = zipfile.ZipFile(out).namelist()
    print(f"{out} ({len(names)} files, {os.path.getsize(out)} bytes)")
    assert "mnemophonix_spark/data/permutations.npy" in names
