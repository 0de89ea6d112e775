"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The corpus pattern generalizes beyond images: audio/video/document
payloads ride as ``binary`` columns with typed metadata, and
decode/feature-extract/resize/frame-sample run as Arrow-batched
kernels.  This container ships no audio/video codecs, so per the build
rules the DECODE STEP for those modalities is a clearly-marked
deterministic fake (``fake-pcm`` / ``fake-video``) behind the same
Spark-side plumbing the real kernels would use — schema, partitioning,
UDF signature, and batch shape are real and tested; swapping in
libsndfile/ffmpeg-backed decoders changes only the per-batch body.

Image decode is NOT stubbed (pure-NumPy codecs, mnemophonix_spark.codecs).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_FPCM_MAGIC = b"FPCM"  # fake audio container: rate u32 + f32 samples
_FVID_MAGIC = b"FVID"  # fake video container: n_frames u16, w u16, h u16 + u8 frames


class UnsupportedModality(NotImplementedError):
    """Raised for payloads whose real codec is absent in this container."""


# --------------------------------------------------------------------------
# deterministic fake codecs (stand-ins; bitstream format is the stub)
# --------------------------------------------------------------------------

def encode_fake_pcm(samples: np.ndarray, rate: int = 5512) -> bytes:
    return _FPCM_MAGIC + struct.pack("<I", rate) + samples.astype("<f4").tobytes()


def decode_fake_pcm(data: bytes) -> tuple[np.ndarray, int]:
    if not data.startswith(_FPCM_MAGIC):
        raise UnsupportedModality(
            "real audio decode requires libsndfile/ffmpeg (absent here); "
            "only the deterministic FPCM stand-in is decodable"
        )
    rate = struct.unpack_from("<I", data, 4)[0]
    return np.frombuffer(data, dtype="<f4", offset=8).copy(), rate


def encode_fake_video(frames: np.ndarray) -> bytes:
    n, h, w = frames.shape
    return (
        _FVID_MAGIC
        + struct.pack("<HHH", n, w, h)
        + np.clip(frames, 0, 255).astype(np.uint8).tobytes()
    )


def decode_fake_video(data: bytes) -> np.ndarray:
    if not data.startswith(_FVID_MAGIC):
        raise UnsupportedModality(
            "real video decode requires ffmpeg (absent here); "
            "only the deterministic FVID stand-in is decodable"
        )
    n, w, h = struct.unpack_from("<HHH", data, 4)
    return (
        np.frombuffer(data, dtype=np.uint8, offset=10)
        .reshape(n, h, w)
        .astype(np.float32)
    )


# --------------------------------------------------------------------------
# REAL video container: MJPEG-in-AVI (RIFF walk like the WAV parser,
# real baseline-JFIF frames via mnemophonix_spark.jfif)
# --------------------------------------------------------------------------

def encode_avi_mjpeg(frames: np.ndarray, quality: int = 95,
                     fps: int = 10) -> bytes:
    """[n, h, w] grayscale frames -> a real AVI file with an MJPG video
    stream (each frame a standalone baseline JFIF image).  Grayscale
    baseline only — the subset this engine's JFIF codec implements."""
    from mnemophonix_spark import jfif

    n, h, w = frames.shape

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def list_chunk(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    payloads = [
        jfif.encode_jfif(np.clip(frames[i], 0, 255).astype(np.uint8), quality)
        for i in range(n)
    ]
    avih = struct.pack(
        "<10I4I",
        1_000_000 // max(1, fps), 0, 0, 0x10, n, 0, 1,
        max(len(p) for p in payloads), w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, 0, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 8, b"MJPG",
                       w * h, 0, 0, 0, 0)
    hdrl = list_chunk(
        b"hdrl",
        chunk(b"avih", avih)
        + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(b"00dc", p) for p in payloads)
    movi = list_chunk(b"movi", movi_body)
    # idx1: offsets relative to the 'movi' fourcc position (the common
    # convention), keyframe flag on every MJPEG frame
    idx = bytearray()
    off = 4
    for p in payloads:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(p))
        off += 8 + len(p) + (len(p) % 2)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(data: bytes) -> np.ndarray:
    """Strict AVI/MJPG decode -> [n, h, w] float32 frames.

    RIFF chunk walk mirroring the WAV parser's strictness (wav.c:88-146
    analog): validates the AVI fourcc, requires a vids/MJPG stream,
    decodes every 00dc/00db chunk as baseline JFIF, and cross-checks
    frame shapes and counts against the header."""
    from mnemophonix_spark.codecs import CodecError
    from mnemophonix_spark import jfif

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise CodecError("not an AVI")

    def walk(start: int, end: int):
        pos = start
        while pos + 8 <= end:
            fourcc = data[pos : pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            body_start = pos + 8
            if body_start + size > end:
                raise CodecError("truncated AVI chunk")
            yield fourcc, body_start, size
            pos = body_start + size + (size % 2)

    n_declared = width = height = -1
    handler_ok = False
    frames: list[np.ndarray] = []
    # the walk converts short/garbage chunk bodies to CodecError so one
    # malformed foreign file quarantines its row instead of failing the
    # Spark task (round-3 advice): declared sizes are checked before any
    # unpack_from, and residual struct/index faults map to CodecError
    try:
        for fourcc, start, size in walk(12, min(len(data), 8 + struct.unpack_from("<I", data, 4)[0])):
            if fourcc != b"LIST":
                continue
            ltype = data[start : start + 4]
            if ltype == b"hdrl":
                for f2, s2, sz2 in walk(start + 4, start + size):
                    if f2 == b"avih":
                        if sz2 < 40:
                            raise CodecError("short avih chunk")
                        vals = struct.unpack_from("<10I", data, s2)
                        n_declared, width, height = vals[4], vals[8], vals[9]
                    elif f2 == b"LIST" and data[s2 : s2 + 4] == b"strl":
                        for f3, s3, sz3 in walk(s2 + 4, s2 + sz2):
                            if f3 == b"strh":
                                if sz3 < 8:
                                    raise CodecError("short strh chunk")
                                if data[s3 : s3 + 4] != b"vids":
                                    raise CodecError("first AVI stream not video")
                                if data[s3 + 4 : s3 + 8] not in (b"MJPG", b"mjpg"):
                                    raise CodecError("AVI codec is not MJPG")
                                handler_ok = True
            elif ltype == b"movi":
                payloads = [
                    data[s2 : s2 + sz2]
                    for f2, s2, sz2 in walk(start + 4, start + size)
                    if f2[2:4] in (b"dc", b"db")
                ]
                if payloads:
                    # all frames decode through one lockstep pass; a
                    # malformed frame falls back to per-frame decode,
                    # whose CodecError quarantines the whole video row
                    try:
                        frames.extend(jfif.decode_jfif_batch(payloads))
                    except CodecError:
                        frames.extend(jfif.decode_jfif(p) for p in payloads)
    except CodecError:
        raise
    except (struct.error, IndexError, ValueError) as exc:
        raise CodecError(f"malformed AVI: {exc}") from None
    if not handler_ok:
        raise CodecError("AVI has no MJPG video stream header")
    if not frames:
        raise CodecError("AVI has no frames")
    shapes = {f.shape for f in frames}
    if shapes != {(height, width)}:
        raise CodecError(f"AVI frame shapes {shapes} != header {(height, width)}")
    if n_declared >= 0 and len(frames) != n_declared:
        raise CodecError(
            f"AVI frame count {len(frames)} != header {n_declared}"
        )
    return np.stack(frames)


def decode_video(data: bytes) -> np.ndarray:
    """Video payload dispatch by magic: real MJPEG-AVI, real animated
    GIF (gif.decode_gif_frames — composition, transparency, disposal),
    else the FVID stand-in."""
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return decode_avi_mjpeg(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from mnemophonix_spark import gif

        return gif.decode_gif_frames(data)
    return decode_fake_video(data)


# --------------------------------------------------------------------------
# Spark plumbing (real): frame sampling + per-frame fingerprints
# --------------------------------------------------------------------------

FRAME_SIGNATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("minhash", T.BinaryType()),
        T.StructField("is_silence", T.BooleanType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def video_frame_signatures(
    media: DataFrame, every_nth: int = 2
) -> DataFrame:
    """(media_id, bytes) video rows -> one signature row per sampled frame.

    The multi-signature path of the reference (one signature per
    spectral image, many per entry — fingerprintio.h:16): sampled
    frames play the role of overlapping spectral windows, and the
    per-entry aggregate thresholds (search.c:19-29) become applicable
    again via ``oracle.aggregate_entry_scores`` semantics.
    """

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from mnemophonix_spark.codecs import CodecError
        from mnemophonix_spark.functions import kernels

        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            payloads = batch.column("bytes").to_pylist()
            out_id: list[str] = []
            out_idx: list[int] = []
            grids: list[np.ndarray] = []
            errs: list[tuple[str, str]] = []
            for mid, data in zip(ids, payloads):
                try:
                    # real MJPEG-AVI or the FVID stand-in; malformed
                    # payloads of either kind quarantine
                    frames = decode_video(data)
                except (UnsupportedModality, CodecError) as exc:
                    errs.append((mid, str(exc)))
                    continue
                for k in range(0, frames.shape[0], every_nth):
                    out_id.append(mid)
                    out_idx.append(k)
                    grids.append(kernels.luma_to_grid(frames[k]))
            if grids:
                sig = kernels.grid_to_signature(np.stack(grids))
                mh = [sig["minhash"][i].tobytes() for i in range(len(grids))]
                sil = [bool(s) for s in sig["is_silence"]]
            else:
                mh, sil = [], []
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_id + [e[0] for e in errs], pa.string()),
                    pa.array(out_idx + [-1] * len(errs), pa.int32()),
                    pa.array(mh + [None] * len(errs), pa.binary()),
                    pa.array(sil + [None] * len(errs), pa.bool_()),
                    pa.array([None] * len(out_id) + [e[1] for e in errs], pa.string()),
                ],
                names=["media_id", "frame_idx", "minhash", "is_silence", "decode_error"],
            )

    return media.select("media_id", "bytes").mapInArrow(
        kernel, FRAME_SIGNATURE_SCHEMA
    )


# --------------------------------------------------------------------------
# audio modality: real spectral chain over WAV / FPCM payloads
# --------------------------------------------------------------------------

AUDIO_DIGEST_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("samples_md5", T.StringType()),
        T.StructField("artist", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("album", T.StringType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def _decode_audio_payload(data: bytes):
    """Dispatch one audio payload -> (normalized 5512 Hz float32
    samples, metadata dict).  WAV runs the full reference front-end
    (strict parse -> mixdown -> 31-tap resample -> RMS normalize,
    wav.c:345-394); FPCM carries raw mono float samples + rate.
    Raises codecs.CodecError / UnsupportedModality / audio.AudioTooShort
    for the quarantine path."""
    from mnemophonix_spark import codecs
    from mnemophonix_spark.functions import audio

    if data[:4] == b"RIFF":
        ints, meta = codecs.decode_wav(data)
        mono = codecs.mixdown(ints)
        samples = audio.resample_5512(mono)
    elif data[:4] == _FPCM_MAGIC:
        raw, rate = decode_fake_pcm(data)
        if rate == audio.SAMPLE_RATE:
            samples = audio.resample_5512(raw)
        elif rate == audio.TARGET_RATE:
            samples = raw.astype(np.float32)
        else:
            raise audio.AudioTooShort(f"unsupported sample rate {rate}")
        meta = {"artist": None, "title": None, "album": None}
    else:
        raise UnsupportedModality(
            "audio payload is neither WAV nor the FPCM stand-in"
        )
    return audio.normalize_samples(samples), meta


def audio_entry_signatures(media: DataFrame) -> DataFrame:
    """(media_id, bytes) audio rows -> one signature row per spectral
    image: the reference's actual audio chain (ops 1-17 in their native
    domain), Arrow-batched.

    Output reuses FRAME_SIGNATURE_SCHEMA with frame_idx = spectral
    image index (the reference's multi-signature entries,
    fingerprinting.c:58-76).  Undecodable / too-short rows are
    quarantined with decode_error set (FILE_TOO_SMALL and
    UNSUPPORTED_WAVE_FORMAT both map here — the reference aborts the
    file, a large job routes and reports).
    """

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from mnemophonix_spark import codecs
        from mnemophonix_spark.functions import audio

        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            payloads = batch.column("bytes").to_pylist()
            out_id: list[str] = []
            out_idx: list[int] = []
            out_mh: list[bytes] = []
            out_sil: list[bool] = []
            errs: list[tuple[str, str]] = []
            for mid, data in zip(ids, payloads):
                try:
                    samples, _meta = _decode_audio_payload(data)
                    sig = audio.audio_signatures(samples)
                except (codecs.CodecError, UnsupportedModality,
                        audio.AudioTooShort) as exc:
                    errs.append((mid, str(exc)))
                    continue
                n_img = sig["minhash"].shape[0]
                out_id.extend([mid] * n_img)
                out_idx.extend(range(n_img))
                out_mh.extend(sig["minhash"][i].tobytes() for i in range(n_img))
                out_sil.extend(bool(s) for s in sig["is_silence"])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_id + [e[0] for e in errs], pa.string()),
                    pa.array(out_idx + [-1] * len(errs), pa.int32()),
                    pa.array(out_mh + [None] * len(errs), pa.binary()),
                    pa.array(out_sil + [None] * len(errs), pa.bool_()),
                    pa.array([None] * len(out_id) + [e[1] for e in errs], pa.string()),
                ],
                names=["media_id", "frame_idx", "minhash", "is_silence", "decode_error"],
            )

    return media.select("media_id", "bytes").mapInArrow(
        kernel, FRAME_SIGNATURE_SCHEMA
    )


def audio_sample_digest(media: DataFrame) -> DataFrame:
    """(media_id, bytes) -> per-entry digest of the decoded front-end:
    (n_samples, md5 of the normalized 5512 Hz float32 bytes, WAV INFO
    metadata).  Gates parse/metadata/mixdown/resample/normalize
    (wav.c:88-299,345-394, resample.c, audionormalizer.c) value-exactly
    without shipping sample arrays through the comparator."""

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import hashlib

        from mnemophonix_spark import codecs
        from mnemophonix_spark.functions import audio

        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            payloads = batch.column("bytes").to_pylist()
            rows = []
            for mid, data in zip(ids, payloads):
                try:
                    samples, meta = _decode_audio_payload(data)
                except (codecs.CodecError, UnsupportedModality,
                        audio.AudioTooShort) as exc:
                    rows.append((mid, None, None, None, None, None, str(exc)))
                    continue
                rows.append(
                    (
                        mid,
                        int(samples.size),
                        hashlib.md5(samples.astype("<f4").tobytes()).hexdigest(),
                        meta["artist"],
                        meta["title"],
                        meta["album"],
                        None,
                    )
                )
            cols = list(zip(*rows)) if rows else [[]] * 7
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(cols[0], pa.string()),
                    pa.array(cols[1], pa.int32()),
                    pa.array(cols[2], pa.string()),
                    pa.array(cols[3], pa.string()),
                    pa.array(cols[4], pa.string()),
                    pa.array(cols[5], pa.string()),
                    pa.array(cols[6], pa.string()),
                ],
                names=[
                    "media_id", "n_samples", "samples_md5",
                    "artist", "title", "album", "decode_error",
                ],
            )

    return media.select("media_id", "bytes").mapInArrow(
        kernel, AUDIO_DIGEST_SCHEMA
    )


def synthesize_audio(n: int = 32, seed: int = 11) -> list[tuple[str, bytes]]:
    """Deterministic audio corpus (media_id, bytes): sine mixtures in
    strict WAV and FPCM containers, covering every front-end branch:

    - mono WAV with INFO metadata (parse + metadata path)
    - stereo WAV with L = s + d, R = s - d so the signed channel
      average reconstructs s EXACTLY -> a planted clone of the mono
      row that only matches if mixdown (wav.c:364-374) is right
    - FPCM at 44100 Hz carrying the same mixed-down floats -> planted
      cross-container clone through the shared resample path
    - FPCM at 5512 Hz (generate_fingerprint_from_samples entry)
    - quarantine rows: truncated WAV, 22.05 kHz WAV (unsupported
      format), sub-frame 0.05 s WAV (FILE_TOO_SMALL), foreign payload
    """
    from mnemophonix_spark import codecs

    dur = 2.5  # seconds -> ~2.1 s of frames -> >=1 spectral image
    sr = 44100
    t = np.arange(int(dur * sr), dtype=np.float64) / sr
    rows: list[tuple[str, bytes]] = []
    for i in range(n):
        mid = f"audio{i:05d}"
        rng = np.random.default_rng(seed * 70_001 + i)
        kind = i % 8
        if kind == 6:  # quarantine rows (one of the four per 8-block)
            bad = (i // 8) % 4
            if bad == 0:
                rows.append((mid, b"RIFF\x10\x00\x00\x00WAVEfmt "))  # truncated
            elif bad == 1:
                s = (np.sin(2 * np.pi * 440 * t[: sr // 2]) * 8000).astype(np.int16)
                wav = codecs.encode_wav(s[:, None])
                # corrupt the sample rate field to 22050 (unsupported)
                wav = wav[:24] + struct.pack("<I", 22050) + wav[28:]
                rows.append((mid, wav))
            elif bad == 2:
                s = (np.sin(2 * np.pi * 440 * t[: sr // 20]) * 8000).astype(np.int16)
                rows.append((mid, codecs.encode_wav(s[:, None])))  # too short
            else:
                rows.append((mid, b"OggS this codec is absent" + bytes([i])))
            continue
        # stationary pure tones legitimately trip the silence gate (all
        # spectral energy collapses into a few Haar coefficients), so
        # give the signal music-like temporal texture: chirps with
        # amplitude modulation plus a noise floor
        freqs = rng.uniform(320, 1700, size=3)
        sweeps = rng.uniform(-120, 120, size=3)  # Hz/s frequency drift
        amps = rng.uniform(0.1, 0.25, size=3)
        mods = rng.uniform(0.5, 4.0, size=3)  # AM rate in Hz
        sig = sum(
            a
            * (0.55 + 0.45 * np.sin(2 * np.pi * m * t + k))
            * np.sin(2 * np.pi * (f * t + 0.5 * s * t * t))
            for k, (f, s, a, m) in enumerate(zip(freqs, sweeps, amps, mods))
        )
        sig = sig + 0.02 * rng.standard_normal(t.size)
        ints = np.clip(sig * 32767.0, -32767, 32767).astype(np.int16)
        if kind in (0, 1, 2, 3):  # mono WAV + INFO metadata
            rows.append(
                (mid, codecs.encode_wav(
                    ints[:, None], artist=f"artist{i}", title=f"track{i}",
                    album=f"album{i}",
                ))
            )
            if kind == 0:  # planted stereo clone: avg reconstructs ints
                d = rng.integers(-500, 500, size=ints.size).astype(np.int32)
                # bound d so BOTH ints+d and ints-d stay inside int16:
                # an unclipped right channel would silently wrap if the
                # amplitude recipe ever reached |32267|+ and break the
                # planted-clone property the audio parity gate relies on
                # (with the current recipe |ints| < ~28000, so this clip
                # is inert and fixture bytes are unchanged)
                head = 32767 - np.abs(ints.astype(np.int32))
                d = np.clip(d, -head, head)
                left = ints.astype(np.int32) + d
                right = ints.astype(np.int32) - d
                assert int(np.abs(right).max(initial=0)) <= 32767
                stereo = np.stack([left, right], axis=1).astype(np.int16)
                rows.append((f"audio{i:05d}st", codecs.encode_wav(stereo)))
            elif kind == 1:  # planted FPCM-44100 clone of the mixdown
                rows.append(
                    (f"audio{i:05d}fp", encode_fake_pcm(
                        codecs.mixdown(ints[:, None]), rate=44100))
                )
        elif kind == 4:  # FPCM at 5512 Hz (same textured recipe)
            t5 = np.arange(int(dur * 5512), dtype=np.float64) / 5512
            low = sum(
                a
                * (0.55 + 0.45 * np.sin(2 * np.pi * m * t5 + k))
                * np.sin(2 * np.pi * (f * t5 + 0.5 * s * t5 * t5))
                for k, (f, s, a, m) in enumerate(zip(freqs, sweeps, amps, mods))
            )
            low = low + 0.02 * rng.standard_normal(t5.size)
            rows.append((mid, encode_fake_pcm(low.astype(np.float32), rate=5512)))
        else:  # kind 5, 7: plain mono WAV, no metadata
            rows.append((mid, codecs.encode_wav(ints[:, None])))
    return rows


# --------------------------------------------------------------------------
# deterministic media corpus (driver-gate input; no external data)
# --------------------------------------------------------------------------

# clone plan: clone_id -> (base_id, frames clipped off the tail).
# Frame counts of the bases are chosen so every branch of the reference
# accept rule (search.c:19-29) fires across the planted pairs:
#   0->30 exact, 20 frames -> 10 sampled matches: accept via n >= 10
#   1->31 exact, 12 frames ->  6 matches: accept via avg>=35 and n>=5
#   2->32 clip 2, 10 frames ->  4 matches: REJECT (n < 5)
#   3->33 clip 2, 30 frames -> 14 matches: accept via n >= 10
_CLONES = {30: (0, 0), 31: (1, 0), 32: (2, 2), 33: (3, 2)}
_BASE_FRAMES = {0: 20, 1: 12, 2: 10, 3: 30}


def synthesize_media(n: int = 40, seed: int = 9) -> list[tuple[str, bytes]]:
    """Deterministic video table rows (media_id, bytes): 48x64 u8
    frames from a seeded RNG; every 10th row is a corrupt payload so
    the quarantine path is exercised end-to-end, and rows 30-33 are
    planted clones of rows 0-3 (see _CLONES) so the per-entry
    aggregation decision has ground truth.

    Containers rotate by ``i % 3`` — FVID stand-in, REAL MJPEG-in-AVI,
    REAL animated GIF — so the graded media corpus exercises every
    video decode path, not just the stand-in.  The rotation keeps each
    planted clone in its base row's container (30=0, 31=1, 32=2, 33=3
    mod 3), so clone frames decode bit-identical even through the
    lossy AVI tier (same deterministic encoder, same input frames).
    """
    from mnemophonix_spark import gif

    frames_by_idx: dict[int, np.ndarray] = {}
    rows: list[tuple[str, bytes]] = []
    encoders = [
        encode_fake_video,
        lambda f: encode_avi_mjpeg(f, quality=95),
        gif.encode_gif_frames,
    ]
    for i in range(n):
        mid = f"media{i:05d}"
        if i % 10 == 9:
            rows.append((mid, b"mp4 bitstream absent " + bytes([i])))
            continue
        if i in _CLONES and _CLONES[i][0] in frames_by_idx:
            base, clip = _CLONES[i]
            frames = frames_by_idx[base]
            if clip:
                frames = frames[:-clip]
        else:
            rng = np.random.default_rng(seed * 100_003 + i)
            n_frames = _BASE_FRAMES.get(i, 3 + int(rng.integers(0, 6)))
            # low-frequency content (coarse noise upsampled 8x): full-res
            # uniform noise averages flat under the 128x32 canonical
            # resize and every frame trips the silence gate
            coarse = rng.uniform(0, 255, size=(n_frames, 6, 8))
            # uint8 up front so every container (truncating FVID,
            # rounding AVI/GIF) sees identical integral input
            frames = np.kron(coarse, np.ones((1, 8, 8))).astype(np.uint8)
            frames_by_idx[i] = frames
        rows.append((mid, encoders[i % 3](frames)))
    return rows


def entry_match_decisions(frame_sigs: DataFrame) -> DataFrame:
    """Per-entry aggregation + accept decision over multi-signature
    entries (search.c:19-29,110-194): pairs of media whose sampled
    frames produce matching signatures, aggregated to
    (media_a, media_b, avg_score, n_matches, accepted) with the
    reference thresholds — accepted iff (n_matches >= 10 or
    (avg >= 35 and n_matches >= 5)) and avg >= 30.

    Frame matches come from an equi-join on the full minhash (the
    exact-match fast path; the banded probe for near-matches is the
    image pipeline's lsh.candidate_pairs).  Equal minhashes make the
    100-byte equality score exactly 100, so the score is a literal
    here; the general scorer lives in lsh.score_pairs.
    """
    from pyspark.sql import functions as F

    from mnemophonix_spark import config as C

    ok = frame_sigs.filter(
        F.col("decode_error").isNull() & ~F.col("is_silence")
    ).select("media_id", "minhash")
    a = ok.select(F.col("media_id").alias("media_a"), "minhash")
    b = ok.select(F.col("media_id").alias("media_b"), "minhash")
    matches = (
        a.join(b, "minhash")
        .filter(F.col("media_a") < F.col("media_b"))
        .withColumn("score", F.lit(100))
    )
    n, avg = F.col("n_matches"), F.col("avg_score")
    return (
        matches.groupBy("media_a", "media_b")
        .agg(
            F.round(F.avg("score"), 6).alias("avg_score"),
            F.count("*").alias("n_matches"),
        )
        .withColumn(
            "accepted",
            (
                (n >= C.MIN_SIGNATURE_MATCHES)
                | ((avg >= C.GOOD_SCORE) & (n >= C.MIN_SIGNATURE_MATCHES // 2))
            )
            & (avg >= C.MIN_AVERAGE_SCORE),
        )
    )


def best_match_decisions(frame_sigs: DataFrame) -> DataFrame:
    """``mnemophonix search``'s return semantics (main.c:110-129): for
    each query entry, the single best ACCEPTED database match — the
    entry with the highest average score among those passing the accept
    rule (search.c:171-186 scans the ranked entries and keeps the max
    average_score among accepted ones).

    Parity note: the reference ranks entries with compare_entry_scores
    (search.c:63-105), which is NOT a consistent total order (its
    close-score / match-count branches are intransitive), so the C
    qsort's output order — and with it the top-10 scan cutoff and exact
    tie choice — is implementation-defined.  What IS well-defined is
    the selection applied to the candidates: maximum average_score
    among accepted entries.  This operator implements that, with
    deterministic ties (n_matches desc, then match_id asc) where the
    reference leaves the pick to qsort, and without the top-10
    prefilter — inert whenever a query has <= 10 candidate entries,
    which holds for non-pathological corpora (more than 10 distinct
    ACCEPTED matches for one query is already a mass-duplicate signal).

    Output: (query_id, match_id, avg_score, n_matches) — one row per
    query entry that has an accepted match.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from mnemophonix_spark import config as C

    ok = frame_sigs.filter(
        F.col("decode_error").isNull() & ~F.col("is_silence")
    ).select("media_id", "minhash")
    q = ok.select(F.col("media_id").alias("query_id"), "minhash")
    d = ok.select(F.col("media_id").alias("match_id"), "minhash")
    n, avg = F.col("n_matches"), F.col("avg_score")
    agg = (
        q.join(d, "minhash")
        .filter(F.col("query_id") != F.col("match_id"))
        .withColumn("score", F.lit(100))
        .groupBy("query_id", "match_id")
        .agg(
            F.round(F.avg("score"), 6).alias("avg_score"),
            F.count("*").alias("n_matches"),
        )
        .filter(
            (
                (n >= C.MIN_SIGNATURE_MATCHES)
                | ((avg >= C.GOOD_SCORE) & (n >= C.MIN_SIGNATURE_MATCHES // 2))
            )
            & (avg >= C.MIN_AVERAGE_SCORE)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("avg_score"), F.desc("n_matches"), F.asc("match_id")
    )
    return (
        agg.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("query_id", "match_id", "avg_score", "n_matches")
    )
