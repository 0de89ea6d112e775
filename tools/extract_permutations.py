"""Extract the frozen MinHash permutation table from the reference.

reference/permutations.c:1-1814 is *generated data* (seed 678233 through
libc rand(), generatepermutations.c:31,41-50) — regenerating it is
non-portable across libc implementations, so the table must be parsed
verbatim (SURVEY.md §2.13).  Output: mnemophonix_spark/data/permutations.npy,
uint16[100, 255], values in [0, 8191].
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

import numpy as np

N_PERMUTATIONS = 100
PERMUTATION_LENGTH = 255


def extract(src: Path, dst: Path) -> np.ndarray:
    text = src.read_text()
    # the table is everything between the outermost `= {` and the closing `};`
    start = text.index("= {")
    end = text.index("};", start)
    body = text[start:end]
    rows = re.findall(r"\{([^{}]*)\}", body)
    assert len(rows) == N_PERMUTATIONS, f"expected 100 rows, got {len(rows)}"
    table = np.array(
        [[int(v) for v in row.replace("\n", " ").split(",")] for row in rows],
        dtype=np.uint16,
    )
    assert table.shape == (N_PERMUTATIONS, PERMUTATION_LENGTH), table.shape
    assert table.min() >= 0 and table.max() <= 8191, (table.min(), table.max())
    dst.parent.mkdir(parents=True, exist_ok=True)
    np.save(dst, table)
    return table


if __name__ == "__main__":
    src = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/root/reference/permutations.c")
    dst = Path(sys.argv[2]) if len(sys.argv) > 2 else Path(
        __file__
    ).resolve().parent.parent / "mnemophonix_spark" / "data" / "permutations.npy"
    t = extract(src, dst)
    print(f"wrote {dst}: shape={t.shape} dtype={t.dtype} row0[:3]={t[0,:3].tolist()}")
