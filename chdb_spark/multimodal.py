"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

A training-data pipeline treats media as ``binary`` payloads flowing beside
typed metadata; decode/feature steps run as Arrow-batched pandas functions
over ``mapInPandas`` so the JVM↔Python crossing moves columnar batches, not
rows. The actual codecs (PIL/torchaudio/ffmpeg) are NOT in this container,
so the decode kernels are STUBBED behind ``_HAVE_CODECS`` with a
deterministic fake — the Spark-side plumbing (schema, batch iteration,
partitioning, output contract) is real and tested; swapping in a real codec
is editing one pandas function.

Scale posture: media bytes never pass through the driver; mapInPandas
preserves partitioning (no shuffle), and ``repartition`` before decode
controls decode-task granularity so one giant tar-shard doesn't serialize a
whole executor.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _probe_pil() -> bool:
    """Auto-detect PIL at import so the real decode path switches on the
    moment the environment provides codecs (VERDICT r3 item 8) — the
    deterministic fake stays the fallback for codec-less containers."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


_HAVE_CODECS = _probe_pil()

#: canonical media-row schema: payload + typed metadata travel together
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
    ]
)


#: synthesis constants shared by `synthesize_ppm` and the m1 oracle SQL —
#: every formula here must stay SQL-mirrorable (chdb_spark/queries_funcs2.py m1)
PPM_MULT = 2654435761  # Knuth multiplicative hash constant
PPM_STEP = 40503
PPM_MOD = 251  # prime < 256 keeps every byte value valid


def ppm_dims(media_id: int) -> tuple[int, int]:
    """Deterministic (width, height) for a synthesized image: 4..32 px each,
    pure integer math so DuckDB reproduces it exactly."""
    w = 4 * (1 + media_id % 8)
    h = 4 * (1 + (media_id % 64) // 8)
    return w, h


def encode_ppm(media_id: int) -> bytes:
    """Synthesize a VALID binary P6/PPM image from an id: real header, real
    raw RGB pixel plane, every byte an LCG of (id, offset). numpy-only —
    this is the deterministic stand-in for reading a real image file, and
    unlike an opaque blob it exercises an actual decode path."""
    import numpy as np

    w, h = ppm_dims(media_id)
    header = f"P6\n{w} {h}\n255\n".encode()
    j = np.arange(3 * w * h, dtype=np.int64)
    pixels = ((media_id * PPM_MULT + j * PPM_STEP) % PPM_MOD).astype(np.uint8)
    return header + pixels.tobytes()


def parse_ppm_header(payload: bytes) -> tuple[int, int, int, int] | None:
    """Parse a P6 header and return (width, height, maxval, pixel_offset),
    or None when the payload is not P6. The pixel offset is derived from
    the actual maxval token position — never by searching for a literal
    byte pattern, which a dims line ending in 255 would false-match."""
    if not payload or not payload.startswith(b"P6"):
        return None
    try:
        # header: magic, width, height, maxval — whitespace separated
        parts = payload[:64].split(maxsplit=4)
        w, h, maxval = int(parts[1]), int(parts[2]), int(parts[3])
        # exact header length (separators may vary): find maxval token end
        idx = payload.index(parts[3], len(parts[0]) + len(parts[1]) + len(parts[2]))
        return w, h, maxval, idx + len(parts[3]) + 1
    except (ValueError, IndexError):
        return None


def decode_ppm(payload: bytes) -> tuple[int, int, float] | None:
    """Minimal real P6/PPM codec (numpy-only): parse the text header
    (magic, dims, maxval), read the raw RGB plane, compute mean luma via
    the integer BT.601 weights (299R+587G+114B)/1000 — an exact-integer sum
    so the SQL oracle computes bit-identical values. Returns None when the
    payload is not a P6 image."""
    import numpy as np

    hdr = parse_ppm_header(payload)
    if hdr is None:
        return None
    w, h, maxval, header_len = hdr
    try:
        pixels = np.frombuffer(payload, dtype=np.uint8, offset=header_len)
        if maxval != 255 or pixels.size < 3 * w * h:
            return None
        rgb = pixels[: 3 * w * h].astype(np.int64).reshape(-1, 3)
        luma_sum = int(rgb[:, 0].sum() * 299 + rgb[:, 1].sum() * 587 + rgb[:, 2].sum() * 114)
        # unrounded: one exact-int division — callers round engine-side
        # (F.round) so Spark and the DuckDB oracle round the same way
        return w, h, luma_sum / (1000.0 * w * h)
    except (ValueError, IndexError):
        return None


def _fake_decode_image(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for decoding formats the container lacks
    codecs for: derives (w, h, luma) from a crc32 of the payload (crc32,
    not hash() — bytes hashing is PYTHONHASHSEED-salted and would differ
    across executor processes). Replace with PIL when codecs exist."""
    import zlib

    if not payload:
        return 0, 0, 0.0
    h = zlib.crc32(bytes(payload)) & 0xFFFFFFFF
    w = 64 + (h % 1024)
    ht = 64 + ((h >> 10) % 1024)
    luma = (sum(payload[:256]) % 25600) / 100.0
    return int(w), int(ht), float(luma)


def _pil_decode_image(payload: bytes):
    """Real decode via PIL (executor-side; one image per call inside an
    Arrow batch loop). Returns (width, height, mean_luma) or None when the
    payload is not a decodable image."""
    import io

    try:
        import numpy as np
        from PIL import Image

        with Image.open(io.BytesIO(payload)) as im:
            rgb = im.convert("RGB")
            arr = np.asarray(rgb, dtype=np.int64)
            luma = (
                arr[..., 0].sum() * 299 + arr[..., 1].sum() * 587 + arr[..., 2].sum() * 114
            ) / (1000.0 * arr.shape[0] * arr.shape[1])
            return int(rgb.width), int(rgb.height), float(luma)
    except Exception:
        return None


def synthesize_ppm(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Attach a synthesized binary P6 payload per id — the test-data
    generator for multimodal pipelines (no image files in the container).
    Arrow-batched pandas_udf: payload bytes are built executor-side and
    never pass through the driver."""
    import pandas as pd  # noqa: F401

    @F.pandas_udf(T.BinaryType())
    def _synth(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: encode_ppm(int(i)))

    return df.withColumn("payload", _synth(F.col(id_col)))


def decode_images(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """binary payload → image features via mapInPandas (Arrow batches).

    With real codecs this is where PIL.Image.open(BytesIO(payload)) goes;
    the iterator contract (stream of pandas DataFrames in, stream out)
    keeps peak memory at one Arrow batch per task regardless of file count.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "n_bytes": [], "mean_luma": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload or b"")
                decoded = decode_ppm(b)  # exact parse for P6 (no codec needed)
                if decoded is None and _HAVE_CODECS:
                    decoded = _pil_decode_image(b)  # real codec path
                w, h, luma = decoded if decoded else _fake_decode_image(b)
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(b))
                out["mean_luma"].append(luma)
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").select("media_id", "payload").mapInPandas(
        _decode, IMAGE_FEATURES_SCHEMA
    )


def sample_video_frames(
    media: DataFrame, every_n_seconds: float = 1.0, max_frames: int = 16
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame.

    Real impl: ffmpeg/OpenCV seek-decode inside the pandas iterator. The
    stub emits deterministic frame indices from metadata duration so the
    explode shape (media → frames) and schema are exercised."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("ts_offset_s", T.DoubleType(), False),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "ts_offset_s": []}
            for mid, meta in zip(pdf["media_id"], pdf["meta"]):
                dur = float((meta or {}).get("duration_s", "0"))
                n = min(max_frames, max(0, int(dur / every_n_seconds)))
                for i in range(n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["ts_offset_s"].append(i * every_n_seconds)
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "video").select("media_id", "meta").mapInPandas(
        _sample, schema
    )


def audio_features(media: DataFrame) -> DataFrame:
    """Audio feature extraction plumbing (stub kernel, real batch shape)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("n_bytes", T.LongType(), True),
            T.StructField("est_duration_s", T.DoubleType(), True),
            T.StructField("rms_energy", T.DoubleType(), True),
        ]
    )

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "n_bytes": [], "est_duration_s": [], "rms_energy": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = payload or b""
                out["media_id"].append(mid)
                out["n_bytes"].append(len(b))
                out["est_duration_s"].append(len(b) / 32000.0)  # 16kHz 16-bit mono
                out["rms_energy"].append(float(sum(b[:1024]) % 1000) / 1000.0)
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "audio").select("media_id", "payload").mapInPandas(
        _feat, schema
    )


def resize_images(
    media: DataFrame, max_side: int = 8, batch_size: int = 256
) -> DataFrame:
    """REAL nearest-neighbor downscale of P6/PPM payloads (numpy index
    sampling — no PIL needed), emitting valid P6 payloads at the new size.
    The resize step of an image-preprocessing pipeline: payloads stay on
    executors, one Arrow batch in memory per task, output re-encodes to
    the same container format so downstream decode_images keeps working.

    Non-P6 payloads pass through untouched (flagged ``resized=false``) —
    with PIL present the same structure swaps in Image.resize."""
    import numpy as np

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "payload": [], "width": [], "height": [],
                "resized": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload or b"")
                hdr = parse_ppm_header(b)
                if hdr is None or hdr[2] != 255 or len(b) - hdr[3] < 3 * hdr[0] * hdr[1]:
                    out["media_id"].append(mid)
                    out["payload"].append(b)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["resized"].append(False)
                    continue
                w, h, _maxval, hdr_end = hdr
                scale = max(w, h) / float(max_side)
                if scale <= 1.0:
                    nw, nh = w, h
                    nb = b
                else:
                    nw = max(1, int(w / scale))
                    nh = max(1, int(h / scale))
                    rgb = np.frombuffer(b, np.uint8, offset=hdr_end)[
                        : 3 * w * h
                    ].reshape(h, w, 3)
                    ys = (np.arange(nh) * h) // nh
                    xs = (np.arange(nw) * w) // nw
                    small = rgb[ys][:, xs]
                    nb = f"P6\n{nw} {nh}\n255\n".encode() + small.tobytes()
                out["media_id"].append(mid)
                out["payload"].append(nb)
                out["width"].append(nw)
                out["height"].append(nh)
                out["resized"].append(nw != w or nh != h)
            yield pd.DataFrame(out)

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("resized", T.BooleanType(), False),
        ]
    )
    return media.filter(F.col("kind") == "image").select(
        "media_id", "payload"
    ).mapInPandas(_resize, schema)


def pcm_len(media_id: int) -> int:
    """Deterministic synthetic PCM payload length for ``media_id``."""
    return 2000 + (media_id % 5) * 400


def encode_pcm(media_id: int) -> bytes:
    """Deterministic fake 16kHz-mono PCM payload: byte[i] = (id*7 + i*13)
    mod 256 — closed-form, so an SQL oracle can recompute every feature
    the stub kernel emits without any audio library."""
    n = pcm_len(media_id)
    return bytes((media_id * 7 + i * 13) % 256 for i in range(n))


def synthesize_pcm(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Attach a synthesized binary PCM payload per id (audio analogue of
    synthesize_ppm) — executor-side pandas_udf, payloads never transit the
    driver."""
    import pandas as pd  # noqa: F401

    @F.pandas_udf(T.BinaryType())
    def _synth(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: encode_pcm(int(i)))

    return df.withColumn("payload", _synth(F.col(id_col)))


# ---------------------------------------------------------------------------
# perceptual-hash image near-dup (m4)
# ---------------------------------------------------------------------------


def encode_ppm_variant(
    media_id: int, base_mod: int = 150, perturb_bytes: int = 24
) -> bytes:
    """Synthesize a P6 image whose CONTENT is keyed by ``media_id %
    base_mod`` — ids ``x`` and ``x + base_mod`` render the same picture
    except the first ``perturb_bytes`` pixel bytes shift by +1 (a small
    corruption: re-encode artifacts, a changed watermark corner). This
    gives the perceptual-hash dedup a corpus with REAL near-duplicates
    whose exact pixel math the SQL oracle replays."""
    import numpy as np

    base = media_id % base_mod
    shift = media_id // base_mod
    w, h = ppm_dims(base)
    header = f"P6\n{w} {h}\n255\n".encode()
    j = np.arange(3 * w * h, dtype=np.int64)
    vals = base * PPM_MULT + j * PPM_STEP
    vals[: min(perturb_bytes, vals.size)] += shift
    return header + (vals % PPM_MOD).astype(np.uint8).tobytes()


def synthesize_ppm_variants(
    df: DataFrame,
    id_col: str = "media_id",
    base_mod: int = 150,
    perturb_bytes: int = 24,
) -> DataFrame:
    """Executor-side synthesis of the variant corpus (see
    ``encode_ppm_variant``); payload bytes never touch the driver."""
    bm, pb = base_mod, perturb_bytes

    @F.pandas_udf(T.BinaryType())
    def _synth(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: encode_ppm_variant(int(i), bm, pb))

    return df.withColumn("payload", _synth(F.col(id_col)))


AHASH_GRID = 8  # 8×8 = 64-bit hash; the band/verify contract assumes it


def image_ahash(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """64-bit average-hash (aHash) per image as a 64-char '0'/'1' string:
    decode the P6 plane, integer BT.601 luma per pixel, pool into an 8×8
    geometric grid (cell_x = 8*x // w), bit = cell mean > global mean
    decided by EXACT integer cross-multiplication (sum_cell * n_pixels >
    sum_total * n_cell) — no float anywhere, so DuckDB replays the hash
    bit-for-bit. Map-only over Arrow batches; payloads stay executor-side.
    Cells a tiny image never touches (w < 8) stay '0' on both sides
    (0 > 0 is false)."""
    import numpy as np

    def _ah(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g = AHASH_GRID
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                hdr = parse_ppm_header(bytes(payload))
                if hdr is None:
                    rows.append((int(mid), None))
                    continue
                w, h, maxval, off = hdr
                pix = (
                    np.frombuffer(bytes(payload), dtype=np.uint8, offset=off)[
                        : 3 * w * h
                    ]
                    .astype(np.int64)
                    .reshape(h, w, 3)
                )
                y = pix[..., 0] * 299 + pix[..., 1] * 587 + pix[..., 2] * 114
                cy = (g * np.arange(h)) // h
                cx = (g * np.arange(w)) // w
                cell = (cy[:, None] * g + cx[None, :]).ravel()
                sums = np.zeros(g * g, dtype=np.int64)
                counts = np.zeros(g * g, dtype=np.int64)
                np.add.at(sums, cell, y.ravel())
                np.add.at(counts, cell, 1)
                bits = sums * (w * h) > int(y.sum()) * counts
                rows.append((int(mid), "".join("1" if b else "0" for b in bits)))
            yield pd.DataFrame(rows, columns=["media_id", "ahash"])

    return media.select("media_id", "payload").mapInPandas(
        _ah, "media_id long, ahash string"
    )


def phash_neardup_pairs(
    hashes: DataFrame, bands: int = 8, max_hamming: int = 6
) -> DataFrame:
    """Near-duplicate image pairs from 64-bit perceptual hashes: split the
    bitstring into ``bands`` equal substrings, bucket-join on any equal
    band (pigeonhole: every pair with hamming < bands is guaranteed a
    candidate), then EXACT Hamming verification via two 32-bit
    conv→xor→bit_count halves — pure JVM expressions, no UDF.

    Deterministic-semantics note: candidates = "≥1 of the ``bands`` fixed
    substrings equal"; because the oracle splits the SAME bitstring at the
    SAME offsets, Spark and SQL candidate sets are identical even for
    pairs above the pigeonhole guarantee, so results match exactly at any
    threshold. Scale: the band self-join is keyed by (band_idx, value) —
    the simhash/minhash LSH shape; no all-pairs anywhere."""
    from chdb_spark.operators.dedup import candidate_pairs_from_buckets

    # The hash relation feeds the banded self-join AND both exact-verify
    # sides — four plan consumers. Without a boundary each one re-embeds
    # the upstream decode+hash kernel chain (the dominant cost: the m4
    # plan ran the image decode FOUR times). The checkpoint holds only
    # (media_id, 64-char hash) rows — hash-table-sized.
    hashes = hashes.select("media_id", "ahash").localCheckpoint(eager=False)
    r = 64 // bands
    banded = hashes.where(F.col("ahash").isNotNull()).select(
        F.col("media_id").alias("doc_id"),
        F.posexplode(
            F.array(*[F.substring("ahash", b * r + 1, r) for b in range(bands)])
        ).alias("band_idx", "band_hash"),
    )
    cand = candidate_pairs_from_buckets(banded, ["band_idx", "band_hash"])
    ha = hashes.select(F.col("media_id").alias("doc_a"), F.col("ahash").alias("ha"))
    hb = hashes.select(F.col("media_id").alias("doc_b"), F.col("ahash").alias("hb"))

    def _half(c: str, start: int):
        return F.conv(F.substring(c, start, 32), 2, 10).cast("long")

    ham = F.bit_count(_half("ha", 1).bitwiseXOR(_half("hb", 1))) + F.bit_count(
        _half("ha", 33).bitwiseXOR(_half("hb", 33))
    )
    return (
        cand.join(ha, "doc_a")
        .join(hb, "doc_b")
        .withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("doc_a").alias("media_a"),
            F.col("doc_b").alias("media_b"),
            "hamming",
        )
    )


def audio_frame_energy(media: DataFrame, frame_bytes: int = 100) -> DataFrame:
    """Opaque PCM payload → one row per fixed-width frame with the frame's
    integer byte-sum energy — the decode step of voice-activity-style
    segmentation, minimal by design: the Python kernel does ONLY
    bytes→frame sums (numpy reshape+sum per Arrow batch); thresholding and
    the stateful run-length segmentation stay JVM-side as window
    expressions, exactly the m1/m2 decode-kernel contract. Swapping the
    stub byte-sum for a real RMS over decoded samples touches only this
    function. Only full frames are emitted (a real VAD drops the tail
    fragment)."""
    import numpy as np
    import pandas as pd

    def _frames(batches):
        for pdf in batches:
            mids: list[int] = []
            idxs: list[int] = []
            sums: list[int] = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = np.frombuffer(payload, dtype=np.uint8)
                n_full = (len(buf) // frame_bytes) * frame_bytes
                frames = (
                    buf[:n_full]
                    .reshape(-1, frame_bytes)
                    .astype(np.int64)
                    .sum(axis=1)
                )
                mids.extend([int(mid)] * len(frames))
                idxs.extend(range(len(frames)))
                sums.extend(int(s) for s in frames)
            yield pd.DataFrame(
                {"media_id": mids, "frame_idx": idxs, "frame_sum": sums}
            )

    return media.select("media_id", "payload").mapInPandas(
        _frames, "media_id long, frame_idx int, frame_sum long"
    )
