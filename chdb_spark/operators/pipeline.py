"""End-to-end training-data curation pipeline — the composition showcase.

Every stage is an existing operator (quality scoring, language ID, exact
dedup, 13-gram decontamination, token accounting); this module chains
them the way a FineWeb/RefinedWeb-style curation run does, and proves the
COMPOSITION with one SQL oracle that replays all five stages. The point:
the operators are not isolated demos — they pipeline, and the whole
pipeline stays inside the engine (scan → map-side features → two uniform
shuffles → broadcast semi-joins), so at 100 TB it runs as one job with no
intermediate exports.

Reference analogue: the reference exposes the pieces (string functions,
group-bys, joins) and its users hand-write this pipeline in SQL; here it
is a named operator with the same one-call ergonomics as the rest of the
dedup/text family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chdb_spark.queries import defquery, table


def curate(
    docs: DataFrame,
    benchmark: DataFrame,
    quality_threshold: float = 0.8,
    lang: str = "en",
    n: int = 13,
) -> DataFrame:
    """Quality filter → language filter → exact dedup (keep-first) →
    13-gram decontamination → per-source survivor stats.

    Scale shape, stage by stage: quality + language are map-side Column
    math fused into the scan; exact dedup is ONE digest-keyed shuffle of
    the already-filtered survivors (filters run first, so the shuffle
    carries the small side); decontamination reduces the benchmark gram
    hashes small and LEFT SEMI / LEFT ANTI joins them broadcast; the
    final stats are a tiny hash agg. No stage materializes off-engine.
    """
    from chdb_spark.operators.dedup import decontaminate, exact_dedup
    from chdb_spark.operators.text import language_id, quality_features

    feat = quality_features(docs)
    kept = feat.where(
        (F.col("quality_score") >= quality_threshold)
        & (language_id(F.col("text")) == lang)
    )
    kept = exact_dedup(kept).select("doc_id", "source", "n_tokens")
    # Decontaminate the RAW train split, not the survivor relation: the
    # LEFT ANTI join below only removes survivor ids, so contamination
    # flags computed on a superset give the identical result (proven
    # equal row-for-row at sf0.1). This keeps the expensive
    # scan→quality→langID→dedup subtree embedded exactly ONCE in one lazy
    # plan (sole consumer: the anti-join probe side) — the r10 version
    # embedded it twice, and the r11 fix (eager localCheckpoint of the
    # survivors INCLUDING text) serialized the subtree against the rest
    # of the query and pushed corpus text through executor block storage,
    # regressing the measured config 2.1→3.0 s (driver 9.0 s). Now no
    # checkpoint at all: one job, AQE overlaps the independent gram and
    # survivor stages, text never enters block storage or a shuffle
    # (guide §8: every exchange carries ids/hashes/counts only). Cost
    # trade at scale: the gram kernel runs over all of train instead of
    # survivors only — bounded by 1/survivor-fraction (FineWeb-style
    # filters keep well over half); a pipeline with a very selective
    # filter should reinstate the survivors-only gram stream behind an
    # eager NARROW (no text) checkpoint + semi-join re-scan, measured
    # here as 2.47 s vs 1.88 s in this configuration.
    contaminated = decontaminate(
        docs.select("doc_id", "text"), benchmark, n=n, ordered=False
    )
    clean = kept.join(
        contaminated.select("doc_id"), "doc_id", "left_anti"
    )
    return (
        clean.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        .orderBy("source")
    )


_PL1_ORACLE = """
    WITH train AS (
      SELECT doc_id, source, text FROM documents WHERE doc_id % 10 != 0
    ),
    q AS (
      SELECT doc_id,
        round(greatest(
          1.0
          - least(1.0, abs(len(list_filter(string_split(trim(text), ' '),
              t -> list_contains(['the','a','of','and','is','in','to'], t)))::DOUBLE
              / len(string_split(trim(text), ' ')) - 0.08) * 5)
          - least(0.5, length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE
              / length(text) * 5)
          - least(0.5, length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))::DOUBLE
              / length(text) * 2), 0.0), 4) AS qs,
        len(string_split(trim(text), ' ')) AS n_tokens
      FROM train
    ),
    lg AS (
      SELECT doc_id,
        CASE WHEN greatest(s_de,s_en,s_es,s_fr,s_zh) = 0 THEN 'und'
             WHEN s_de = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'de'
             WHEN s_en = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'en'
             WHEN s_es = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'es'
             WHEN s_fr = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'fr'
             ELSE 'zh' END AS pred_lang
      FROM (
        SELECT doc_id,
          len(list_filter(string_split(trim(text), ' '), t -> list_contains(['the','a','of','and','is'], t))) AS s_en,
          len(list_filter(string_split(trim(text), ' '), t -> list_contains(['el','la','los','de','y'], t)))  AS s_es,
          len(list_filter(string_split(trim(text), ' '), t -> list_contains(['der','die','das','und','ist'], t))) AS s_de,
          len(list_filter(string_split(trim(text), ' '), t -> list_contains(['le','les','des','et','est'], t))) AS s_fr,
          len(list_filter(string_split(trim(text), ' '), t -> list_contains(['的','是','了','在'], t))) AS s_zh
        FROM train
      )
    ),
    keep1 AS (
      SELECT t.doc_id, t.source, t.text, q.n_tokens
      FROM train t JOIN q USING (doc_id) JOIN lg USING (doc_id)
      WHERE q.qs >= 0.8 AND lg.pred_lang = 'en'
    ),
    dedup AS (
      SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM keep1
    ),
    kept AS (SELECT doc_id, source, n_tokens FROM dedup WHERE rn = 1),
    grams AS (
      SELECT doc_id,
             ('0x' || substr(md5(array_to_string(toks[i:i+12], ' ')), 1, 12))::BIGINT AS h
      FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents
            WHERE doc_id % 10 = 0 OR doc_id IN (SELECT doc_id FROM kept)),
           unnest(range(1, len(toks) - 11)) t(i)
    ),
    bench AS (SELECT DISTINCT h FROM grams WHERE doc_id % 10 = 0),
    contam AS (
      SELECT DISTINCT g.doc_id FROM grams g JOIN bench USING (h)
      WHERE g.doc_id % 10 != 0
    ),
    clean AS (
      SELECT * FROM kept WHERE doc_id NOT IN (SELECT doc_id FROM contam)
    )
    SELECT source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
    FROM clean GROUP BY source ORDER BY source
"""


@defquery(
    "pl1_curation_pipeline",
    _PL1_ORACLE,
    doc="end-to-end FineWeb-style curation pipeline IN ONE JOB: quality "
        "score >= 0.8, language-ID = en, exact dedup keep-first, 13-gram "
        "decontamination against the (doc_id %% 10 = 0) benchmark split, "
        "then per-source doc/token survivor stats. Composes the t2/t1/dd1/"
        "dd6 operators unchanged; the oracle replays all five stages in "
        "one SQL statement — the composition, not just the pieces, is "
        "what gets verified.",
)
def pl1(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 10 != 0)
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    return curate(train, bench, quality_threshold=0.8, lang="en", n=13)


@defquery(
    "rf1_refresh_pipeline",
    """
    WITH old AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 3 THEN 'legacy' ELSE source END AS source,
             n_chars
      FROM documents WHERE doc_id % 10 <> 7
    ), new AS (
      SELECT doc_id, source, n_chars FROM documents WHERE doc_id % 10 <> 5
    ), changed AS (
      SELECT new.doc_id,
             CASE WHEN old.doc_id IS NULL THEN 'insert' ELSE 'update' END
               AS change_type
      FROM new LEFT JOIN old ON old.doc_id = new.doc_id
      WHERE old.doc_id IS NULL
         OR old.source IS DISTINCT FROM new.source
         OR old.n_chars IS DISTINCT FROM new.n_chars
    ), feats AS (
      SELECT c.change_type, d.lang,
        len(string_split(trim(d.text), ' ')) AS n_tokens,
        len(list_filter(string_split(trim(d.text), ' '),
            t -> list_contains(['the','a','of','and','is','in','to'], t)))::DOUBLE
          / len(string_split(trim(d.text), ' ')) AS stop_ratio,
        length(regexp_replace(d.text, '[^0-9]', '', 'g'))::DOUBLE
          / length(d.text) AS digit_ratio,
        length(regexp_replace(d.text, '[A-Za-z0-9 ]', '', 'g'))::DOUBLE
          / length(d.text) AS punct_ratio
      FROM changed c JOIN documents d ON d.doc_id = c.doc_id
    )
    SELECT change_type, lang, count(*) AS n_docs,
           round(avg(greatest(1.0 - least(1.0, abs(stop_ratio - 0.08) * 5)
                                  - least(0.5, digit_ratio * 5)
                                  - least(0.5, punct_ratio * 2), 0.0)), 4)
             AS avg_quality,
           round(avg(n_tokens), 2) AS avg_tokens
    FROM feats
    GROUP BY change_type, lang ORDER BY change_type, lang
    """,
    doc="incremental-refresh pipeline IN ONE JOB: snapshot_diff (cdc.py) "
        "finds what today's corpus snapshot changed (inserts: doc_id %10 "
        "== 7 restored; updates: %10 == 3 source migrated off 'legacy'), "
        "and ONLY those rows re-enter quality scoring (text.py "
        "quality_features) — the unchanged ~80 percent never pay the feature "
        "pass, which is the whole point of CDC at 100 TB. The oracle "
        "replays diff + features + aggregation in one SQL statement, so "
        "the COMPOSITION is verified, not just the pieces.",
)
def rf1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.operators.cdc import snapshot_diff
    from chdb_spark.operators.text import quality_features

    docs = table(spark, sf_dir, "documents")
    meta = docs.select("doc_id", "source", "n_chars")
    old = meta.filter(F.col("doc_id") % 10 != 7).withColumn(
        "source",
        F.when(F.col("doc_id") % 10 == 3, F.lit("legacy")).otherwise(
            F.col("source")
        ),
    )
    new = meta.filter(F.col("doc_id") % 10 != 5)
    changed = (
        snapshot_diff(old, new, ["doc_id"], ["source", "n_chars"])
        .filter(F.col("change_type").isin("insert", "update"))
        .select("doc_id", "change_type")
    )
    scored = quality_features(changed.join(docs, "doc_id"))
    return (
        scored.groupBy("change_type", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("quality_score"), 4).alias("avg_quality"),
            F.round(F.avg("n_tokens"), 2).alias("avg_tokens"),
        )
        .orderBy("change_type", "lang")
    )
