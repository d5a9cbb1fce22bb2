"""Function-family breadth batch 2 — URL / HASH / ENCODING / IP /
TYPE_CONVERSION registry families driven end-to-end under the DuckDB
oracle, plus the multimodal plumbing as a rows-only entry.

Reference anchors: URL functions function_definitions.py:4346-4542, hash
:3059-3101, encoding :5264-5345, IP :4561-4673, type conversion
:2261-2345,7614-7842. Each query constructs deterministic inputs from the
TPC-H tables so both engines evaluate identical strings/numbers — the
oracle checks VALUES, not just shapes.

All pure Column expressions (whole-stage codegen); the only Python is the
multimodal decode stub, which is the point of that entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chdb_spark.functions import fn
from chdb_spark.queries import defquery, table

# ---------------------------------------------------------------------------
# fx1 — URL family over constructed URLs
# ---------------------------------------------------------------------------


@defquery(
    "fx1_url_parse",
    oracle="""
    WITH u AS (
      SELECT n_nationkey,
             'https://www.' || lower(replace(replace(n_name, ' ', ''), '_', '')) ||
             '.example.com/region/' || n_regionkey || '?key=' || n_nationkey ||
             '&lang=en#top' AS url
      FROM nation
    )
    SELECT n_nationkey,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '\\?([^#]*)', 1) AS query,
           regexp_extract(url, '#(.*)$', 1) AS fragment,
           regexp_extract(url, '[?&]key=([^&#]*)', 1) AS key_param,
           'example.com' AS tld_domain
    FROM u
    """,
    doc="URL family (reference :4346-4542): domain/path/queryString/fragment/"
        "extractURLParameter via parse_url — JVM-side; oracle recomputes with "
        "regexes so values (not implementations) are compared.",
)
def fx1_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = table(spark, sf_dir, "nation")
    url = F.concat(
        F.lit("https://www."),
        # NB: strip underscores as well as spaces — Java's URI parser (behind
        # parse_url) returns NULL HOST for hostnames containing "_"
        F.lower(F.regexp_replace("n_name", "[ _]", "")),
        F.lit(".example.com/region/"),
        F.col("n_regionkey").cast("string"),
        F.lit("?key="),
        F.col("n_nationkey").cast("string"),
        F.lit("&lang=en#top"),
    )
    u = nat.select("n_nationkey", url.alias("url"))
    return u.select(
        "n_nationkey",
        fn("domain")(F.col("url")).alias("host"),
        fn("path")(F.col("url")).alias("path"),
        fn("queryString")(F.col("url")).alias("query"),
        fn("fragment")(F.col("url")).alias("fragment"),
        fn("extractURLParameter")(F.col("url"), "key").alias("key_param"),
        F.lit("example.com").alias("tld_domain"),
    )


# ---------------------------------------------------------------------------
# fx2 — digest family
# ---------------------------------------------------------------------------


@defquery(
    "fx2_hash_digests",
    oracle="""
    SELECT r_name,
           md5(r_name) AS md5_hex,
           sha256(r_name) AS sha256_hex,
           CAST(length(md5(r_name)) AS BIGINT) AS md5_len
    FROM region
    """,
    doc="hash family (reference :3059-3101): md5/sha256 hex digests match "
        "across engines byte-for-byte; xxhash/cityHash are engine-specific "
        "and covered by self-consistency tests instead.",
)
def fx2_hash_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    reg = table(spark, sf_dir, "region")
    return reg.select(
        "r_name",
        F.md5(F.col("r_name").cast("binary")).alias("md5_hex"),
        F.sha2(F.col("r_name").cast("binary"), 256).alias("sha256_hex"),
        F.length(F.md5(F.col("r_name").cast("binary"))).cast("long").alias("md5_len"),
    )


# ---------------------------------------------------------------------------
# fx3 — encoding family
# ---------------------------------------------------------------------------


@defquery(
    "fx3_encoding",
    oracle="""
    SELECT n_nationkey,
           upper(hex(n_nationkey)) AS hexed,
           to_base64(n_name::BLOB) AS b64,
           CAST(bit_count(n_nationkey) AS BIGINT) AS bits
    FROM nation
    """,
    doc="encoding family (reference :5264-5345): hex/base64/bitCount. "
        "Spark hex(int) and DuckDB hex(int) agree on uppercase no-padding "
        "form; base64 is RFC 4648 on both.",
)
def fx3_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = table(spark, sf_dir, "nation")
    return nat.select(
        "n_nationkey",
        F.upper(F.hex(F.col("n_nationkey"))).alias("hexed"),
        F.base64(F.col("n_name").cast("binary")).alias("b64"),
        F.bit_count(F.col("n_nationkey")).cast("long").alias("bits"),
    )


# ---------------------------------------------------------------------------
# fx4 — IP family over synthesized addresses
# ---------------------------------------------------------------------------


@defquery(
    "fx4_ip_math",
    oracle="""
    WITH ips AS (
      SELECT o_orderkey, (o_orderkey * 2654435761) % 4294967296 AS ipnum
      FROM orders WHERE o_orderkey <= 1000
    )
    SELECT o_orderkey,
           CAST(ipnum // 16777216 AS BIGINT) || '.' ||
           CAST((ipnum // 65536) % 256 AS BIGINT) || '.' ||
           CAST((ipnum // 256) % 256 AS BIGINT) || '.' ||
           CAST(ipnum % 256 AS BIGINT) AS ip_str,
           CAST(ipnum // 16777216 AS BIGINT) AS octet1,
           (ipnum < 2147483648) AS class_low
    FROM ips
    """,
    doc="IP family (reference :4561-4673): IPv4NumToString as pure integer "
        "Column math (shifts + concat) — both engines derive the dotted quad "
        "from the same synthesized uint32.",
)
def fx4_ip_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    ipnum = (F.col("o_orderkey") * F.lit(2654435761)) % F.lit(4294967296)
    ips = orders.select("o_orderkey", ipnum.alias("ipnum"))
    return ips.select(
        "o_orderkey",
        fn("IPv4NumToString")(F.col("ipnum")).alias("ip_str"),
        (F.col("ipnum") / 16777216).cast("long").alias("octet1"),
        (F.col("ipnum") < 2147483648).alias("class_low"),
    )


# ---------------------------------------------------------------------------
# fx5 — type-conversion family
# ---------------------------------------------------------------------------


@defquery(
    "fx5_type_conversion",
    oracle="""
    SELECT l_orderkey,
           CAST(l_quantity AS BIGINT) AS qty_int,
           CAST(l_quantity AS VARCHAR) AS qty_str,
           round(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE), 2) AS price_dec,
           CAST(l_shipdate AS DATE) AS ship_day,
           TRY_CAST(l_returnflag AS DOUBLE) IS NULL AS not_numeric
    FROM lineitem WHERE l_orderkey <= 100
    """,
    doc="type-conversion family (reference :7614-7842): toInt64/toString/"
        "toDecimal/toDate plus the OrNull cast form (accurateCastOrNull → "
        "try_cast) — permissive semantics match DuckDB TRY_CAST.",
)
def fx5_type_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    return li.select(
        "l_orderkey",
        F.col("l_quantity").cast("long").alias("qty_int"),
        F.col("l_quantity").cast("string").alias("qty_str"),
        F.round(F.col("l_extendedprice").cast("decimal(18,2)").cast("double"), 2).alias("price_dec"),
        F.col("l_shipdate").cast("date").alias("ship_day"),
        F.col("l_returnflag").try_cast("double").isNull().alias("not_numeric"),
    )


# ---------------------------------------------------------------------------
# m1 — multimodal plumbing (rows-only: binary payloads are engine-internal)
# ---------------------------------------------------------------------------


#: the oracle mirrors multimodal.encode_ppm/decode_ppm: same dims formula,
#: same LCG pixel bytes, same integer BT.601 luma sum — so it checks the
#: WHOLE pipeline (synthesize → binary payload → header parse → pixel
#: stats) value-for-value, not just row counts.
_M1_ORACLE = """
    WITH d AS (
      SELECT doc_id,
             4 * (1 + doc_id % 8) AS w,
             4 * (1 + (doc_id % 64) // 8) AS h
      FROM documents WHERE doc_id < 200
    ),
    px AS (
      SELECT doc_id, w, h,
             sum(299 * ((doc_id * 2654435761 + (3*gs)   * 40503) % 251)
               + 587 * ((doc_id * 2654435761 + (3*gs+1) * 40503) % 251)
               + 114 * ((doc_id * 2654435761 + (3*gs+2) * 40503) % 251)
             ) AS luma_sum
      FROM d, generate_series(0, 1023) t(gs)  -- 1023 = max w*h - 1 (32x32)
      WHERE gs < w*h
      GROUP BY doc_id, w, h
    )
    SELECT doc_id AS media_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(3 + length(CAST(w AS VARCHAR)) + 1 + length(CAST(h AS VARCHAR))
                + 5 + 3*w*h AS BIGINT) AS n_bytes,
           round(luma_sum / (1000.0 * w * h), 4) AS mean_luma
    FROM px ORDER BY media_id
"""


@defquery(
    "m1_multimodal_pipeline",
    _M1_ORACLE,
    doc="multimodal column pipeline: synthesize a real binary P6/PPM image "
        "per document id (executor-side pandas_udf), flow it as an opaque "
        "binary column, decode with the numpy-only PPM codec over "
        "mapInPandas (header parse + raw pixel luma). The oracle recomputes "
        "width/height/n_bytes/mean_luma from the same deterministic "
        "formulas in SQL — full value check, no codec libs needed "
        "(chdb_spark/multimodal.py).",
)
def m1_multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.multimodal import decode_images, synthesize_ppm

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = synthesize_ppm(
        docs.select(F.col("doc_id").alias("media_id"), F.lit("image").alias("kind"))
    )
    feats = decode_images(media)
    return feats.select(
        "media_id", "width", "height", "n_bytes",
        F.round("mean_luma", 4).alias("mean_luma"),
    ).orderBy("media_id")


@defquery(
    "m2_audio_pipeline",
    """
    WITH m AS (
      SELECT doc_id AS media_id, 2000 + (doc_id % 5) * 400 AS n_bytes
      FROM documents WHERE doc_id < 200
    ),
    r AS (
      SELECT media_id, n_bytes,
             (SELECT sum((media_id * 7 + i * 13) % 256)
              FROM generate_series(0, 1023) t(i)) AS s
      FROM m
    )
    SELECT media_id, CAST(n_bytes AS BIGINT) AS n_bytes,
           round(n_bytes / 32000.0, 6) AS est_duration_s,
           round((s % 1000) / 1000.0, 4) AS rms_energy
    FROM r ORDER BY media_id
    """,
    doc="audio-column pipeline (m1's audio sibling): synthesize a "
        "deterministic binary PCM payload per id executor-side, flow it "
        "as an opaque binary column, extract features (byte length, "
        "estimated duration at 16kHz 16-bit mono, stub RMS over the first "
        "1024 bytes) through the mapInPandas audio kernel. The payload "
        "formula is closed-form, so the oracle recomputes every feature "
        "in SQL — full value check with no audio libs "
        "(chdb_spark/multimodal.py encode_pcm/audio_features).",
)
def m2_audio_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.multimodal import audio_features, synthesize_pcm

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = synthesize_pcm(
        docs.select(F.col("doc_id").alias("media_id"), F.lit("audio").alias("kind"))
    )
    feats = audio_features(media)
    return feats.select(
        "media_id",
        "n_bytes",
        F.round("est_duration_s", 6).alias("est_duration_s"),
        F.round("rms_energy", 4).alias("rms_energy"),
    ).orderBy("media_id")


@defquery(
    "m3_video_frame_sample",
    """
    WITH m AS (
      SELECT doc_id AS media_id, 2.0 + (doc_id % 20) AS duration_s
      FROM documents WHERE doc_id < 100
    ),
    f AS (
      SELECT media_id, i AS frame_idx, i * 1.0 AS ts_offset_s
      FROM m, LATERAL unnest(generate_series(0, CAST(least(16, floor(duration_s / 1.0)) AS INTEGER) - 1)) AS t(i)
    )
    SELECT media_id, CAST(frame_idx AS INTEGER) AS frame_idx, ts_offset_s
    FROM f ORDER BY media_id, frame_idx
    """,
    doc="video frame-sampling plumbing (multimodal trio part 3): per-video "
        "metadata carries a deterministic duration, the mapInPandas "
        "sampler explodes media -> one row per sampled frame (1 fps, cap "
        "16) — the decode stays a stub (no ffmpeg in container) but the "
        "explode shape, schema, and batch path are real; the oracle "
        "replays the frame arithmetic via generate_series.",
)
def m3_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.multimodal import sample_video_frames

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.create_map(
            F.lit("duration_s"),
            (F.lit(2.0) + (F.col("doc_id") % 20)).cast("string"),
        ).alias("meta"),
    )
    frames = sample_video_frames(media, every_n_seconds=1.0, max_frames=16)
    return frames.orderBy("media_id", "frame_idx")


@defquery(
    "m4_image_phash_dedup",
    """
    WITH m AS (
      SELECT doc_id AS media_id,
             doc_id % 150 AS base, doc_id // 150 AS shift,
             4 * (1 + (doc_id % 150) % 8) AS w,
             4 * (1 + ((doc_id % 150) % 64) // 8) AS h
      FROM documents WHERE doc_id < 300
    ),
    lum AS (
      SELECT media_id, w, h, p,
        299 * ((base * 2654435761 + (3*p)   * 40503 + CASE WHEN 3*p   < 24 THEN shift ELSE 0 END) % 251)
      + 587 * ((base * 2654435761 + (3*p+1) * 40503 + CASE WHEN 3*p+1 < 24 THEN shift ELSE 0 END) % 251)
      + 114 * ((base * 2654435761 + (3*p+2) * 40503 + CASE WHEN 3*p+2 < 24 THEN shift ELSE 0 END) % 251)
        AS y
      FROM m, LATERAL unnest(generate_series(0, w * h - 1)) AS t(p)
    ),
    cells AS (
      SELECT media_id, ((8 * (p // w)) // h) * 8 + (8 * (p % w)) // w AS cell,
             CAST(sum(y) AS BIGINT) AS cy, count(*) AS cn
      FROM lum GROUP BY media_id, cell
    ),
    tot AS (
      SELECT media_id, CAST(sum(y) AS BIGINT) AS ty, count(*) AS tn
      FROM lum GROUP BY media_id
    ),
    bits AS (
      SELECT t.media_id, g.c AS cell,
             CASE WHEN COALESCE(cells.cy, 0) * t.tn > t.ty * COALESCE(cells.cn, 0)
                  THEN '1' ELSE '0' END AS bit
      FROM tot t
      CROSS JOIN LATERAL unnest(generate_series(0, 63)) AS g(c)
      LEFT JOIN cells ON cells.media_id = t.media_id AND cells.cell = g.c
    ),
    hashes AS (
      SELECT media_id, string_agg(bit, '' ORDER BY cell) AS ahash
      FROM bits GROUP BY media_id
    ),
    cand AS (
      SELECT a.media_id AS media_a, b.media_id AS media_b,
             a.ahash AS ha, b.ahash AS hb
      FROM hashes a JOIN hashes b ON a.media_id < b.media_id
      WHERE substr(a.ahash,  1, 8) = substr(b.ahash,  1, 8)
         OR substr(a.ahash,  9, 8) = substr(b.ahash,  9, 8)
         OR substr(a.ahash, 17, 8) = substr(b.ahash, 17, 8)
         OR substr(a.ahash, 25, 8) = substr(b.ahash, 25, 8)
         OR substr(a.ahash, 33, 8) = substr(b.ahash, 33, 8)
         OR substr(a.ahash, 41, 8) = substr(b.ahash, 41, 8)
         OR substr(a.ahash, 49, 8) = substr(b.ahash, 49, 8)
         OR substr(a.ahash, 57, 8) = substr(b.ahash, 57, 8)
    ),
    scored AS (
      SELECT media_a, media_b,
             (SELECT CAST(count(*) AS BIGINT)
              FROM generate_series(1, 64) s(i)
              WHERE substr(ha, CAST(i AS INTEGER), 1)
                 <> substr(hb, CAST(i AS INTEGER), 1)) AS hamming
      FROM cand
    )
    SELECT media_a, media_b, hamming
    FROM scored WHERE hamming <= 6
    ORDER BY media_a, media_b
    """,
    doc="perceptual-hash image near-dup (multimodal × dedup): synthesize a "
        "300-image corpus where ids x and x+150 render the same picture "
        "with a 24-byte corruption, decode executor-side, compute the "
        "64-bit aHash with exact integer cross-multiplication (no floats), "
        "band the bitstring 8×8-bit, bucket-join candidates, verify exact "
        "Hamming ≤ 6 via conv/xor/bit_count. The oracle replays pixels, "
        "hash, bands and Hamming from the same closed forms — identical "
        "candidate sets by construction (chdb_spark/multimodal.py).",
)
def m4_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.multimodal import (
        image_ahash,
        phash_neardup_pairs,
        synthesize_ppm_variants,
    )

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    media = synthesize_ppm_variants(
        docs.select(F.col("doc_id").alias("media_id"), F.lit("image").alias("kind"))
    )
    hashes = image_ahash(media)
    return phash_neardup_pairs(hashes, bands=8, max_hamming=6).orderBy(
        "media_a", "media_b"
    )


@defquery(
    "m5_audio_segments",
    """
    WITH m AS (
      SELECT doc_id AS media_id, 2000 + (doc_id % 5) * 400 AS n_bytes
      FROM documents WHERE doc_id < 200
    ), f AS (
      SELECT m.media_id, CAST(g.range AS INT) AS frame_idx,
             (SELECT sum((m.media_id * 7 + (g.range * 100 + j.range) * 13) % 256)
              FROM range(100) j) AS frame_sum
      FROM m, range(40) g
      WHERE g.range < m.n_bytes // 100
    ), a AS (
      SELECT media_id, frame_idx,
             frame_idx - CAST(row_number() OVER (
               PARTITION BY media_id ORDER BY frame_idx) AS INT) AS grp
      FROM f WHERE frame_sum % 7 < 4
    ), seg AS (
      SELECT media_id, grp, count(*) AS seg_len FROM a GROUP BY media_id, grp
    ), ss AS (
      SELECT media_id, count(*) AS n_segments, max(seg_len) AS longest_segment,
             sum(seg_len) AS n_active
      FROM seg GROUP BY media_id
    ), tot AS (
      SELECT media_id, count(*) AS n_frames FROM f GROUP BY media_id
    )
    SELECT tot.media_id, tot.n_frames,
           CAST(COALESCE(ss.n_active, 0) AS BIGINT) AS n_active,
           COALESCE(ss.n_segments, 0) AS n_segments,
           COALESCE(ss.longest_segment, 0) AS longest_segment
    FROM tot LEFT JOIN ss ON tot.media_id = ss.media_id
    ORDER BY tot.media_id
    """,
    doc="audio activity segmentation (the VAD shape): synthesized PCM "
        "payloads decode to per-frame integer byte-sum energies in ONE "
        "minimal mapInPandas kernel (multimodal.py audio_frame_energy), "
        "then thresholding and run-length segmentation (gaps-and-islands "
        "window, partitioned per media — bounded state) stay JVM-side. "
        "The payload formula is closed-form, so the oracle replays frame "
        "sums, threshold, and island bookkeeping exactly in SQL — full "
        "value check of a stateful multimodal pipeline with no audio "
        "libs. At 100 TB: payloads never leave executor Arrow batches; "
        "per-media frame counts bound the window state.",
)
def m5_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from chdb_spark.multimodal import audio_frame_energy, synthesize_pcm

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = synthesize_pcm(
        docs.select(F.col("doc_id").alias("media_id"), F.lit("audio").alias("kind"))
    )
    # frames feeds the activity branch AND the per-media totals — without
    # a boundary the PCM decode kernel runs twice; the checkpoint holds
    # (media_id, frame_idx, frame_sum) rows, ~1% of the decoded bytes
    frames = audio_frame_energy(media, frame_bytes=100).localCheckpoint(
        eager=False
    )
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    act = frames.filter(F.col("frame_sum") % 7 < 4).withColumn(
        "grp", F.col("frame_idx") - F.row_number().over(w)
    )
    seg = act.groupBy("media_id", "grp").agg(F.count(F.lit(1)).alias("seg_len"))
    ss = seg.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.max("seg_len").alias("longest_segment"),
        F.sum("seg_len").alias("n_active"),
    )
    tot = frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n_frames"))
    return (
        tot.join(ss, "media_id", "left")
        .fillna(0, subset=["n_active", "n_segments", "longest_segment"])
        .select("media_id", "n_frames", "n_active", "n_segments", "longest_segment")
        .orderBy("media_id")
    )
