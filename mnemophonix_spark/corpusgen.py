"""Deterministic synthetic image+caption corpus generator (FIXTURES.md F1).

No external data: everything derives from seed 42 through NumPy PCG64.
Produces the input-table shape from BASELINE.json input_hint:
(image_id string, bytes binary, w int32, h int32, fmt string,
 caption string, phash int64), plus ground-truth side tables
truth_pairs(id_a, id_b, kind) and truth_clusters(image_id, cluster_id).

Planted duplicate structure (F1.1): 10% of rows belong to clusters of
size 2-6; within a cluster each variant is one of
  1 exact re-encode (same pixels, different fmt)
  2 lossy re-encode (fake-jpeg quality 90-95, PSNR>=40 dB)
  3 mild noise (+-1/255 on <=5% of pixels)
  4 resize to a different (w,h)
  5 caption-duplicate only (different image, identical caption)
  6 caption-substring (caption of A strict substring of caption of B)
Kinds 1-4 are image-chain ground truth; 5-6 belong to the caption channel.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from mnemophonix_spark import codecs

SEED = 42
W_CHOICES = [64, 128, 256, 333]
H_CHOICES = [64, 128, 256, 217]
# round 4: the DEFAULT (graded + bench) mix carries the REAL formats —
# baseline JFIF (T.81, DRI=1 lockstep-decodable) and netpbm PGM —
# alongside png/bmp and the FJPG stand-in; with "jfif" present the
# lossy duplicate kind (2) also encodes through the real JPEG codec.
# Since the WebP codec landed, lossless VP8L rows ride the same mix.
# Round 5 adds TIFF (the last shipped codec with no graded row),
# makes the lossy-jfif rows FOREIGN-style (no restart markers, the
# real-world encoder shape — decoded by the generalized lockstep),
# and plants LOSSY WebP: "webp_lossy" makes half the kind-2
# re-encodes real 'VP8 ' key frames (vp8.py; fmt column stays
# "webp"), so the graded corpus now exercises all nine bitstream
# shapes.  Image fixtures and cached corpora regenerate with this
# list.
FMT_CHOICES = ["png", "jpeg", "bmp", "jfif", "pgm", "webp", "gif", "tiff",
               "webp_lossy"]

_WORDS = [
    f"w{i:03d}" for i in range(446)
] + [
    "spark", "image", "caption", "hash", "band", "cluster", "wavelet",
    "signature", "minhash", "shingle", "pixel", "frame", "grid", "batch",
    "arrow", "column", "bucket", "score", "match", "probe", "index",
    "corpus", "stream", "window", "filter", "join", "group", "sort",
    "scan", "sink", "stage", "task", "shuffle", "skew", "salt", "merge",
    "query", "table", "row", "byte", "bit", "sign", "top", "rank",
    "near", "exact", "dup", "pair", "edge", "node", "graph", "star",
    "large", "small", "fix", "point", "check", "resume", "commit",
    "snapshot", "lineage", "metric", "count", "sum", "mean", "log",
]
assert len(_WORDS) == 512


def _phash64(luma: np.ndarray) -> int:
    """8x8 mean-threshold perceptual hash (FIXTURES.md F1, DCT-free)."""
    from mnemophonix_spark.functions.kernels import area_resize

    small = area_resize(luma, 8, 8)
    bits = (small > small.mean()).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    # wrap to signed int64
    return val - (1 << 64) if val >= (1 << 63) else val


def _base_image(rng: np.random.Generator) -> np.ndarray:
    """Deterministic procedural 128x96 grayscale "scene".

    Gradient background + random high-contrast rectangles + one striped
    texture band + mild noise.  High dynamic range is deliberate: the
    chain's silence gate (rawfingerprints.c:10-16, |coeff|>1.0 on the
    top 200 wavelets) assumes real-signal contrast; pure box-filtered
    noise is nearly flat after log compression and reads as "silent"
    (the image analog of silent audio), which would make every fixture
    row a blank.
    """
    h, w = 96, 128
    yy, xx = np.mgrid[0:h, 0:w]
    img = (
        128.0
        + 127.0 * (xx / w) * (2 * rng.random() - 1)
        + 127.0 * (yy / h) * (2 * rng.random() - 1)
    )
    for _ in range(int(rng.integers(6, 16))):
        x0, y0 = int(rng.integers(0, w - 8)), int(rng.integers(0, h - 8))
        rw, rh = int(rng.integers(12, w // 2 + 12)), int(rng.integers(12, h // 2 + 12))
        img[y0 : y0 + rh, x0 : x0 + rw] = rng.choice(
            [0.0, 32.0, 64.0, 192.0, 224.0, 255.0]
        )
    # striped texture band drawn last: guarantees high-frequency energy
    y0 = int(rng.integers(0, h - 16))
    period = int(rng.integers(4, 12))
    img[y0 : y0 + 16, :] = ((yy[y0 : y0 + 16, :] // max(1, period // 2)) % 2) * 255.0
    img += rng.normal(0, 3, size=(h, w))
    return np.clip(img, 0, 255)


def _caption(rng: np.random.Generator) -> str:
    n = int(rng.integers(5, 21))
    return " ".join(_WORDS[i] for i in rng.integers(0, 512, size=n))


@dataclass
class Corpus:
    rows: list[dict] = field(default_factory=list)
    truth_pairs: list[tuple[str, str, int]] = field(default_factory=list)
    truth_clusters: list[tuple[str, str]] = field(default_factory=list)


def _encode_row(image_id: str, luma: np.ndarray, w: int, h: int, fmt: str,
                caption: str, rng: np.random.Generator,
                quality: int = 95, color: str | None = None,
                foreign: bool = False) -> dict:
    from mnemophonix_spark.functions.kernels import area_resize

    pixels = np.clip(area_resize(luma, h, w), 0, 255).astype(np.float64)
    if color is not None:
        # COLOR row (jfif only): the scene luma plus a smooth chroma
        # field — natural statistics (noise lives in luma, color varies
        # slowly), encoded as interleaved YCbCr 4:4:4 or 4:2:0.  The
        # chain's canonical luma for phash is the channel MEAN of the
        # decoded RGB (decode_jfif's mixdown), which differs from Y by
        # the chroma contribution, so phash is computed on that mean.
        from mnemophonix_spark import jfif

        yy, xx = np.mgrid[0:h, 0:w]
        cb = 128 + float(rng.uniform(20, 45)) * np.sin(
            xx / float(rng.uniform(18, 40)) + float(rng.uniform(0, 6))
        )
        cr = 128 + float(rng.uniform(20, 45)) * np.cos(
            yy / float(rng.uniform(18, 40)) + float(rng.uniform(0, 6))
        )
        rgb = np.round(
            jfif.ycbcr_to_rgb(np.stack([pixels, cb, cr], axis=-1))
        )
        data = jfif.encode_jfif(rgb, quality=quality, subsampling=color,
                                restart_interval=0 if foreign else 1)
        return {
            "image_id": image_id,
            "bytes": data,
            "w": w,
            "h": h,
            "fmt": fmt,
            "caption": caption,
            "phash": _phash64(rgb.mean(axis=2)),
        }
    if fmt == "webp_lossy":
        # lossy 'VP8 ' key frame (vp8.py); the table fmt stays "webp"
        # — dispatch sniffs the RIFF chunk tag, same as real corpora
        data = codecs.encode(pixels, "webp", mode="lossy", quality=quality)
        fmt = "webp"
    else:
        kw = {"quality": quality} if fmt in ("jpeg", "jfif") else {}
        if foreign and fmt == "jfif":
            kw["restart_interval"] = 0
        data = codecs.encode(pixels, fmt, **kw)
    return {
        "image_id": image_id,
        "bytes": data,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": caption,
        "phash": _phash64(pixels),
    }


def generate(n_rows: int, seed: int = SEED, id_offset: int = 0,
             fmt_choices: list[str] | None = None) -> Corpus:
    # custom fmt mixes build their own corpora for tests; the default
    # list (real jfif/pgm included since round 4) is what the graded
    # fixtures and bench corpora are generated from
    fmts = list(fmt_choices) if fmt_choices else FMT_CHOICES
    # "webp_lossy" is a lossy-KIND token, not a base format: when
    # present, half the kind-2 re-encodes emit lossy VP8 key frames
    # (fmt column still "webp").  In the default mix since the
    # lockstep token pool landed (vp8_lockstep.py): wide Arrow
    # batches decode pooled, narrow ones per-image (vp8.MIN_POOL).
    lossy_webp = "webp_lossy" in fmts
    if lossy_webp:
        fmts = [f for f in fmts if f != "webp_lossy"]
    # the lossy kind prefers the REAL baseline-JPEG codec when the fmt
    # mix carries it; the default mix keeps the fixture-stable FJPG key
    lossy_fmt = "jfif" if "jfif" in fmts else "jpeg"
    rng = np.random.default_rng(seed)
    corpus = Corpus()
    n_dup_rows = int(n_rows * 0.10)
    i = id_offset
    n_rows = id_offset + n_rows

    # --- planted duplicate clusters --------------------------------------
    while n_dup_rows >= 2:
        size = int(rng.integers(2, 7))
        size = min(size, n_dup_rows)
        if size < 2:
            break
        n_dup_rows -= size
        base = _base_image(rng)
        base_caption = _caption(rng)
        base_w = int(rng.choice(W_CHOICES))
        base_h = int(rng.choice(H_CHOICES))
        base_fmt = str(rng.choice(fmts))
        base_id = f"img{i:08d}"
        corpus.rows.append(
            _encode_row(base_id, base, base_w, base_h, base_fmt, base_caption, rng)
        )
        i += 1
        member_ids = [(base_id, 0)]
        for _ in range(size - 1):
            kind = int(rng.integers(1, 7))
            vid = f"img{i:08d}"
            i += 1
            if kind == 1:  # exact re-encode, different fmt
                other = [f for f in fmts if f != base_fmt] or fmts
                fmt = str(rng.choice(other))
                row = _encode_row(vid, base, base_w, base_h, fmt, _caption(rng), rng)
            elif kind == 2:  # lossy re-encode — FOREIGN-style bitstream
                # (no restart markers) when the real JPEG codec is in
                # the mix: real-world encoders emit no RSTn, so the
                # graded corpus exercises the generalized no-restart
                # lockstep (round-4 verdict item 1 'done' criterion)
                q = int(rng.choice([90, 95]))
                lf = lossy_fmt
                if lossy_webp and int(rng.integers(0, 2)):
                    lf = "webp_lossy"
                row = _encode_row(vid, base, base_w, base_h, lf,
                                  _caption(rng), rng, quality=q,
                                  foreign=(lf == "jfif"))
            elif kind == 3:  # mild noise on <=5% of pixels
                noisy = base.copy()
                mask = rng.random(base.shape) < 0.05
                noisy[mask] = np.clip(
                    noisy[mask] + rng.choice([-1.0, 1.0], size=int(mask.sum())), 0, 255
                )
                row = _encode_row(vid, noisy, base_w, base_h, base_fmt,
                                  _caption(rng), rng)
            elif kind == 4:  # resize to different (w,h)
                w2 = int(rng.choice([w for w in W_CHOICES if w != base_w]))
                h2 = int(rng.choice([h for h in H_CHOICES if h != base_h]))
                row = _encode_row(vid, base, w2, h2, base_fmt, _caption(rng), rng)
            elif kind == 5:  # caption-duplicate only
                row = _encode_row(vid, _base_image(rng), base_w, base_h,
                                  base_fmt, base_caption, rng)
            else:  # kind 6: caption substring
                extra = " ".join(_WORDS[j] for j in rng.integers(0, 512, size=4))
                row = _encode_row(vid, _base_image(rng), base_w, base_h,
                                  base_fmt, base_caption + " " + extra, rng)
            corpus.rows.append(row)
            corpus.truth_pairs.append((base_id, vid, kind))
            member_ids.append((vid, kind))
        image_members = [m for m, k in member_ids if k in (0, 1, 2, 3, 4)]
        if len(image_members) >= 2:
            cid = min(image_members)
            for m in image_members:
                corpus.truth_clusters.append((m, cid))

    # --- singletons --------------------------------------------------------
    # a third of jfif singletons encode as COLOR (4:4:4 / 4:2:0
    # alternating) so the graded corpus exercises the color decode +
    # channel-mean mixdown path; duplicates stay grayscale so the
    # planted-pair semantics are untouched
    color_cycle = 0
    while i < n_rows:
        vid = f"img{i:08d}"
        i += 1
        fmt = str(rng.choice(fmts))
        color = None
        foreign = False
        if fmt == "jfif" and rng.random() < (1 / 3):
            color = "444" if color_cycle % 2 == 0 else "420"
            # half the color rows carry NO restart markers (foreign
            # encoder shape) so the graded corpus exercises the
            # color-general lockstep too
            foreign = color_cycle % 4 >= 2
            color_cycle += 1
        corpus.rows.append(
            _encode_row(
                vid,
                _base_image(rng),
                int(rng.choice(W_CHOICES)),
                int(rng.choice(H_CHOICES)),
                fmt,
                _caption(rng),
                rng,
                color=color,
                foreign=foreign,
            )
        )
    return corpus


def corpus_schema() -> pa.schema:
    return pa.schema(
        [
            ("image_id", pa.string()),
            ("bytes", pa.binary()),
            ("w", pa.int32()),
            ("h", pa.int32()),
            ("fmt", pa.string()),
            ("caption", pa.string()),
            ("phash", pa.int64()),
        ]
    )


def write_corpus(out_dir: str, n_rows: int, seed: int = SEED,
                 n_files: int = 8,
                 fmt_choices: list[str] | None = None) -> Corpus:
    """Write corpus + truth tables as parquet under out_dir.

    Multiple row groups / files so local[32] gets >=64 tasks at bench
    scale (FIXTURES.md F1 scale knobs).
    """
    corpus_sub = os.path.join(out_dir, "corpus")
    os.makedirs(corpus_sub, exist_ok=True)
    corpus = generate(n_rows, seed, fmt_choices=fmt_choices)
    schema = corpus_schema()
    chunks = np.array_split(np.arange(len(corpus.rows)), max(1, n_files))
    for fi, chunk in enumerate(chunks):
        if len(chunk) == 0:
            continue
        rows = [corpus.rows[j] for j in chunk]
        table = pa.Table.from_pylist(rows, schema=schema)
        pq.write_table(table, os.path.join(corpus_sub, f"part-{fi:04d}.parquet"),
                       row_group_size=256)
    pq.write_table(
        pa.Table.from_pylist(
            [{"id_a": a, "id_b": b, "kind": k} for a, b, k in corpus.truth_pairs],
            schema=pa.schema([("id_a", pa.string()), ("id_b", pa.string()),
                              ("kind", pa.int32())]),
        ),
        os.path.join(out_dir, "truth_pairs.parquet"),
    )
    pq.write_table(
        pa.Table.from_pylist(
            [{"image_id": m, "cluster_id": c} for m, c in corpus.truth_clusters],
            schema=pa.schema([("image_id", pa.string()), ("cluster_id", pa.string())]),
        ),
        os.path.join(out_dir, "truth_clusters.parquet"),
    )
    return corpus


def ensure_corpus(cache_root: str, n_rows: int, seed: int = SEED) -> str:
    """Idempotent corpus materialization keyed by (n_rows, seed)."""
    out_dir = os.path.join(cache_root, f"corpus_n{n_rows}_s{seed}")
    marker = os.path.join(out_dir, "_SUCCESS")
    if not os.path.exists(marker):
        write_corpus(out_dir, n_rows, seed)
        with open(marker, "w") as f:
            f.write("ok\n")
    return out_dir


# ---------------------------------------------------------------------------
# parallel generation for bench-scale corpora
# ---------------------------------------------------------------------------

def _limit_blas_threads(n: int = 1) -> bool:
    """Clamp the ALREADY-INITIALIZED OpenBLAS pool of this process.

    dlopen of the bundled library returns the live handle, so
    ``openblas_set_num_threads`` (64-suffixed in numpy's ILP64 build)
    takes effect immediately — the only lever that works in a forked
    child, where OMP/OPENBLAS env vars were read long ago.
    """
    import ctypes
    import glob as _glob

    import numpy as _np

    pat = os.path.join(os.path.dirname(_np.__file__), "..", "numpy.libs",
                       "libopenblas*")
    for lib in _glob.glob(pat):
        try:
            h = ctypes.CDLL(lib)
        except OSError:  # pragma: no cover
            continue
        for name in ("openblas_set_num_threads64_",
                     "openblas_set_num_threads"):
            fn = getattr(h, name, None)
            if fn is not None:
                fn(n)
                return True
    return False  # non-OpenBLAS numpy: nothing to clamp


def _write_chunk(args: tuple) -> tuple[list, list]:
    """Worker: generate one deterministic chunk and write its parquet.

    Chunk i derives its stream from rng seed [seed, i] and owns the id
    range [i*chunk_rows, (i+1)*chunk_rows) — the corpus is identical for
    a given (n_rows, seed, n_chunks) regardless of worker scheduling.
    Duplicate clusters are planted within chunks only.
    """
    out_dir, chunk_id, chunk_rows, seed = args
    # pin BLAS threads: 32 forked workers each inheriting the parent's
    # initialized 32-thread OpenBLAS pool drove the load average to
    # ~1000 on the 200k build (32 x 32 spin-waiting threads) and
    # starved the generators themselves.  Env vars are too late after
    # fork, so clamp the live pool through the OpenBLAS C API.
    _limit_blas_threads(1)
    rng_seed = np.random.default_rng([seed, chunk_id])
    c = generate(chunk_rows, seed=int(rng_seed.integers(0, 2**31)),
                 id_offset=chunk_id * chunk_rows)
    table = pa.Table.from_pylist(c.rows, schema=corpus_schema())
    pq.write_table(
        table,
        os.path.join(out_dir, "corpus", f"part-{chunk_id:04d}.parquet"),
        row_group_size=256,
    )
    return c.truth_pairs, c.truth_clusters


def ensure_corpus_parallel(
    cache_root: str,
    n_rows: int,
    seed: int = SEED,
    n_chunks: int = 32,
    workers: int | None = None,
) -> str:
    """Parallel idempotent corpus build for throughput benchmarks.

    Fork pool (spawn cannot re-import ``<stdin>`` parents); each worker
    clamps its inherited OpenBLAS pool to one thread via
    ``_limit_blas_threads`` before generating.
    """
    from concurrent.futures import ProcessPoolExecutor

    out_dir = os.path.join(cache_root, f"corpus_n{n_rows}_s{seed}_c{n_chunks}")
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(os.path.join(out_dir, "corpus"), exist_ok=True)
    chunk_rows = n_rows // n_chunks
    jobs = [(out_dir, i, chunk_rows, seed) for i in range(n_chunks)]
    pairs: list = []
    clusters: list = []
    with ProcessPoolExecutor(
        max_workers=workers or min(n_chunks, os.cpu_count())
    ) as ex:
        for tp, tc in ex.map(_write_chunk, jobs):
            pairs.extend(tp)
            clusters.extend(tc)
    pq.write_table(
        pa.Table.from_pylist(
            [{"id_a": a, "id_b": b, "kind": k} for a, b, k in pairs],
            schema=pa.schema([("id_a", pa.string()), ("id_b", pa.string()),
                              ("kind", pa.int32())]),
        ),
        os.path.join(out_dir, "truth_pairs.parquet"),
    )
    pq.write_table(
        pa.Table.from_pylist(
            [{"image_id": m, "cluster_id": c} for m, c in clusters],
            schema=pa.schema([("image_id", pa.string()), ("cluster_id", pa.string())]),
        ),
        os.path.join(out_dir, "truth_clusters.parquet"),
    )
    with open(marker, "w") as f:
        f.write("ok\n")
    return out_dir
