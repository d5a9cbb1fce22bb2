"""Text analysis operators — language-ID, quality scoring, token counting,
document fingerprinting.

The reference's string/hash function families (function_definitions.py:61-1051
string, :3059-3101 hash) are the primitives; these operators compose them into
the per-document scoring passes a training-data pipeline runs over a corpus.

Everything is per-row Column math (split/filter/aggregate over token arrays)
— embarrassingly parallel, zero shuffles until the final aggregation, so a
100 TB corpus processes at scan speed.

Cross-engine determinism: where an oracle needs the identical hash on both
engines, the shared primitive is md5-prefix48 (first 12 hex chars of md5 as
a 48-bit int) — md5 is bit-identical everywhere; xxhash64 stays in the
Spark-only hot paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chdb_spark.queries import defquery, table

#: per-language marker-word profiles for the n-gram/stopword heuristic.
#: (The synthetic corpus shares one vocabulary, so marker hits mostly land in
#: 'en' — the operator contract is determinism, not classifier quality.)
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "los", "de", "y"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "les", "des", "et", "est"),
    "zh": ("的", "是", "了", "在"),
}

STOPWORDS = ("the", "a", "of", "and", "is", "in", "to")


def tokens(col) -> F.Column:
    return F.split(F.trim(col), r"\s+")


def _hits(toks, words: tuple[str, ...]) -> F.Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def language_id(text_col) -> F.Column:
    """Predicted language: argmax of marker-word hits, lexicographic
    tie-break, 'und' when nothing matches."""
    toks = tokens(text_col)
    scores = [(lang, _hits(toks, words)) for lang, words in sorted(LANG_PROFILES.items())]
    best = F.greatest(*[s for _, s in scores])
    pred = F.lit("und")
    # reverse order so the FIRST (lexicographically smallest) winner sticks
    for lang, s in reversed(scores):
        pred = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return pred


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / token / stopword / character-class features + a quality score."""
    toks = tokens(F.col(text_col))
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_chars = F.length(F.col(text_col))
    avg_tok_len = (n_chars - (n_tokens - 1)).cast("double") / n_tokens
    digit_ratio = (
        F.length(F.regexp_replace(F.col(text_col), r"[^0-9]", "")).cast("double") / n_chars
    )
    punct_ratio = (
        F.length(F.regexp_replace(F.col(text_col), r"[A-Za-z0-9 ]", "")).cast("double") / n_chars
    )
    stop_ratio = n_stop.cast("double") / n_tokens
    # heuristic score in [0,1]: long-enough docs with natural stopword share,
    # few digits/punct (C4/Gopher-style rule scoring)
    score = (
        F.lit(1.0)
        - F.least(F.lit(1.0), F.abs(stop_ratio - 0.08) * 5)
        - F.least(F.lit(0.5), digit_ratio * 5)
        - F.least(F.lit(0.5), punct_ratio * 2)
    )
    return df.select(
        "*",
        n_tokens.alias("n_tokens"),
        F.round(avg_tok_len, 4).alias("avg_token_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(digit_ratio, 4).alias("digit_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(F.greatest(score, F.lit(0.0)), 4).alias("quality_score"),
    )


def md5_prefix48(col) -> F.Column:
    """48-bit int from the first 12 hex chars of md5 — engine-portable hash."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def doc_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", window: int = 4
) -> DataFrame:
    """(id, text) → (doc_id, fingerprint) via the scalable path.

    The per-row Column form (doc_fingerprint) evaluates its higher-order
    lambda interpreted; here token windows come from posexplode + lead()
    so the md5 hashing runs inside whole-stage codegen. One shuffle keyed
    by doc_id (window + final min-agg share the partitioning)."""
    from pyspark.sql.window import Window

    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(tokens(F.col(text_col))).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    grams = toks.select(
        "doc_id",
        F.concat_ws(
            " ", "tok", *[F.lead("tok", i).over(w).alias(f"_t{i}") for i in range(1, window)]
        ).alias("gram"),
        F.lead("tok", window - 1).over(w).alias("_full"),
    ).filter(F.col("_full").isNotNull())
    mins = grams.groupBy("doc_id").agg(F.min(md5_prefix48(F.col("gram"))).alias("_fp"))
    base = docs.select(F.col(id_col).alias("doc_id"), md5_prefix48(F.col(text_col)).alias("_short"))
    return base.join(mins, "doc_id", "left").select(
        "doc_id", F.coalesce("_fp", "_short").alias("fingerprint")
    )


def doc_fingerprint(text_col, window: int = 4) -> F.Column:
    """Winnowing-style fingerprint: min over token-window hashes.

    Each window of ``window`` consecutive tokens hashes via md5_prefix48;
    the doc fingerprint is the minimum — shift-invariant, deterministic,
    identical in any engine with md5."""
    toks = tokens(text_col)
    win_hashes = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - window, F.lit(0))),
        lambda i: md5_prefix48(F.concat_ws(" ", F.slice(toks, i + 1, window))),
    )
    return F.when(F.size(toks) >= window, F.array_min(win_hashes)).otherwise(
        md5_prefix48(text_col)
    )


# ---------------------------------------------------------------------------
# headline queries
# ---------------------------------------------------------------------------


@defquery(
    "t1_language_id",
    """
    WITH scored AS (
      SELECT doc_id, lang,
        len(list_filter(string_split(trim(text), ' '), t -> list_contains(['the','a','of','and','is'], t))) AS s_en,
        len(list_filter(string_split(trim(text), ' '), t -> list_contains(['el','la','los','de','y'], t)))  AS s_es,
        len(list_filter(string_split(trim(text), ' '), t -> list_contains(['der','die','das','und','ist'], t))) AS s_de,
        len(list_filter(string_split(trim(text), ' '), t -> list_contains(['le','les','des','et','est'], t))) AS s_fr,
        len(list_filter(string_split(trim(text), ' '), t -> list_contains(['的','是','了','在'], t))) AS s_zh
      FROM documents
    )
    SELECT doc_id, lang,
      CASE WHEN greatest(s_de,s_en,s_es,s_fr,s_zh) = 0 THEN 'und'
           WHEN s_de = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'de'
           WHEN s_en = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'en'
           WHEN s_es = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'es'
           WHEN s_fr = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'fr'
           ELSE 'zh' END AS pred_lang
    FROM scored
    ORDER BY doc_id
    """,
    doc="marker-word language-ID (argmax, lexicographic tie-break) per document.",
)
def t1(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", language_id(F.col("text")).alias("pred_lang")).orderBy(
        "doc_id"
    )


@defquery(
    "t2_quality_by_lang",
    """
    WITH feats AS (
      SELECT lang,
        len(string_split(trim(text), ' ')) AS n_tokens,
        len(list_filter(string_split(trim(text), ' '),
            t -> list_contains(['the','a','of','and','is','in','to'], t)))::DOUBLE
          / len(string_split(trim(text), ' ')) AS stop_ratio,
        length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE / length(text) AS digit_ratio,
        length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))::DOUBLE / length(text) AS punct_ratio
      FROM documents
    )
    SELECT lang,
      round(avg(greatest(1.0 - least(1.0, abs(stop_ratio - 0.08) * 5)
                             - least(0.5, digit_ratio * 5)
                             - least(0.5, punct_ratio * 2), 0.0)), 4) AS avg_quality,
      round(avg(n_tokens), 2) AS avg_tokens,
      count(*) AS n_docs
    FROM feats
    GROUP BY lang ORDER BY lang
    """,
    doc="Gopher/C4-style rule quality score, aggregated per language.",
)
def t2(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = quality_features(table(spark, sf_dir, "documents"))
    return (
        docs.groupBy("lang")
        .agg(
            F.round(F.avg("quality_score"), 4).alias("avg_quality"),
            F.round(F.avg("n_tokens"), 2).alias("avg_tokens"),
            F.count("*").alias("n_docs"),
        )
        .orderBy("lang")
    )


@defquery(
    "t3_token_counts",
    """
    SELECT source,
      sum(len(string_split(trim(text), ' ')))::BIGINT AS ws_tokens,
      sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')))::BIGINT AS bpe_ish_tokens,
      sum(length(text))::BIGINT AS total_chars
    FROM documents
    GROUP BY source ORDER BY source
    """,
    doc="corpus token accounting: whitespace + BPE-ish regex tokenization per source.",
)
def t3(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    ws = F.size(tokens(F.col("text")))
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), 0))
    return (
        docs.groupBy("source")
        .agg(
            F.sum(ws).alias("ws_tokens"),
            F.sum(bpe).alias("bpe_ish_tokens"),
            F.sum(F.length("text")).alias("total_chars"),
        )
        .orderBy("source")
    )


@defquery(
    "t4_fingerprint",
    """
    WITH fp AS (
      SELECT doc_id,
        CASE WHEN len(toks) >= 4 THEN
          list_min([('0x' || substr(md5(sub[1]||' '||sub[2]||' '||sub[3]||' '||sub[4]), 1, 12))::BIGINT
                    for sub in [toks[i:i+3] for i in range(1, len(toks)-2)]])
        ELSE ('0x' || substr(md5(text), 1, 12))::BIGINT END AS fingerprint
      FROM (SELECT doc_id, text, string_split(trim(text), ' ') AS toks FROM documents)
    )
    SELECT f1.doc_id AS doc_a, f2.doc_id AS doc_b, f1.fingerprint
    FROM fp f1 JOIN fp f2 ON f1.fingerprint = f2.fingerprint AND f1.doc_id < f2.doc_id
    ORDER BY doc_a, doc_b
    """,
    doc="winnowing fingerprint (min of 4-token window md5-prefix48) → collision pairs.",
)
def t4(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # both self-join sides consume fp — checkpoint the (doc_id,
    # fingerprint) projection so the windowed-md5 fingerprint pass (the
    # operator's dominant cost) runs once, not once per side
    fp = doc_fingerprints(docs, window=4).localCheckpoint(eager=False)
    a = fp.select(F.col("doc_id").alias("doc_a"), "fingerprint")
    b = fp.select(F.col("doc_id").alias("doc_b"), F.col("fingerprint").alias("fp_b"))
    return (
        a.join(b, (F.col("fingerprint") == F.col("fp_b")) & (F.col("doc_a") < F.col("doc_b")))
        .select("doc_a", "doc_b", "fingerprint")
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# PII scrubbing (training-data hygiene; north-star text-analysis family)
# ---------------------------------------------------------------------------

#: Conservative patterns; ORDER MATTERS (emails before bare domains, etc.).
#: Kept identical in the DuckDB oracle so redaction is value-checked.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b\+?\d[\d\s().-]{7,}\d\b", "<PHONE>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
]


def scrub_pii(col) -> F.Column:
    """Chained regexp_replace redaction — pure Column expressions, map-only
    at any scale (the hot path of a cleaning pipeline must not touch
    Python). Patterns are deliberately conservative: false negatives beat
    corrupting clean text."""
    out = col
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


@defquery(
    "t5_pii_scrub",
    oracle="""
    WITH synth AS (
      SELECT doc_id,
             text || ' contact ' || lower(replace(source, ' ', '')) ||
             '@mail-' || (doc_id % 50) || '.com or 10.0.' || (doc_id % 256) ||
             '.' || ((doc_id * 7) % 256) AS dirty
      FROM documents WHERE doc_id < 1000
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(dirty,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g'),
               '\\b\\+?\\d[\\d\\s().-]{7,}\\d\\b', '<PHONE>', 'g'),
             '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g') AS clean,
           CAST(length(dirty) - length(regexp_replace(dirty,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '', 'g')) > 0 AS BOOLEAN)
             AS had_email
    FROM synth
    """,
    doc="PII redaction over deterministically synthesized dirty text "
        "(emails + IPs injected from doc metadata): chained regexp_replace, "
        "value-checked against DuckDB applying the identical patterns.",
)
def t5(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    dirty = F.concat(
        F.col("text"),
        F.lit(" contact "),
        F.lower(F.regexp_replace("source", " ", "")),
        F.lit("@mail-"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit(".com or 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit("."),
        ((F.col("doc_id") * 7) % 256).cast("string"),
    )
    synth = docs.select("doc_id", dirty.alias("dirty"))
    return synth.select(
        "doc_id",
        scrub_pii(F.col("dirty")).alias("clean"),
        F.col("dirty").rlike(PII_PATTERNS[0][0]).alias("had_email"),
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition / quality filtering
# ---------------------------------------------------------------------------


def gopher_filters(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Gopher-rule features + a keep/drop verdict (the
    repetition-and-shape filter pass of a pretraining pipeline; rules after
    Rae et al. 2021 §A1.1): token-count bounds, mean-word-length band,
    symbol-to-word ratio, alpha-word ratio, and top-bigram share (the
    repetition signal).

    Scale shape: all features except bigram share are map-only Column math.
    The bigram share needs per-(doc, bigram) counts — posexplode + lead
    (codegen'd, same pattern as doc_fingerprints) then two hash aggregates
    keyed by doc_id; the shuffle carries (doc_id, bigram-hash) pairs and
    partial counts combine map-side. No global state, no skew beyond
    document length itself.
    """
    from pyspark.sql.window import Window

    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_chars = F.length(F.col(text_col))
    # single-space tokenization ⇒ sum(len(tok)) == n_chars - (n-1); stays in
    # codegen (an aggregate() HOF would evaluate interpreted)
    mean_wl = (n_chars - (n - 1)).cast("double") / n
    alpha_ratio = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))).cast("double") / n
    n_hash = F.length(F.col(text_col)) - F.length(F.regexp_replace(F.col(text_col), "#", ""))
    n_ellipsis = (
        F.length(F.col(text_col)) - F.length(F.regexp_replace(F.col(text_col), r"\.\.\.", ""))
    ) / 3
    symbol_ratio = (n_hash + n_ellipsis).cast("double") / n

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        n.alias("n_tokens"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(alpha_ratio, 4).alias("alpha_word_ratio"),
        F.round(symbol_ratio, 4).alias("symbol_ratio"),
    )

    tok_rows = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(toks).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    grams = tok_rows.select(
        "doc_id",
        F.concat_ws(" ", "tok", F.lead("tok", 1).over(w)).alias("gram"),
        F.lead("tok", 1).over(w).alias("_nxt"),
    ).filter(F.col("_nxt").isNotNull())
    shares = (
        grams.groupBy("doc_id", "gram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg((F.max("c").cast("double") / F.sum("c")).alias("_share"))
    )
    out = base.join(shares, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "mean_word_len",
        "alpha_word_ratio",
        "symbol_ratio",
        F.round(F.coalesce(F.col("_share"), F.lit(0.0)), 4).alias("top_bigram_share"),
    )
    passes = (
        F.col("n_tokens").between(50, 100000)
        & F.col("mean_word_len").between(3.0, 10.0)
        & (F.col("symbol_ratio") < 0.1)
        & (F.col("alpha_word_ratio") > 0.8)
        & (F.col("top_bigram_share") < 0.2)
    )
    return out.withColumn("passes", passes)


@defquery(
    "t7_gopher_filters",
    """
    WITH toks AS (
      SELECT doc_id, text, string_split(trim(text), ' ') AS toks FROM documents
    ),
    base AS (
      SELECT doc_id, len(toks) AS n_tokens,
        round((length(text) - (len(toks) - 1))::DOUBLE / len(toks), 4) AS mean_word_len,
        round(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]')))::DOUBLE
              / len(toks), 4) AS alpha_word_ratio,
        round(((length(text) - length(replace(text, '#', '')))
             + (length(text) - length(replace(text, '...', ''))) / 3)::DOUBLE
              / len(toks), 4) AS symbol_ratio
      FROM toks
    ),
    bi AS (
      SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS gram
      FROM toks
    ),
    bc AS (SELECT doc_id, gram, count(*) AS c FROM bi GROUP BY doc_id, gram),
    bs AS (SELECT doc_id, round(max(c)::DOUBLE / sum(c), 4) AS top_bigram_share
           FROM bc GROUP BY doc_id)
    SELECT b.doc_id, b.n_tokens, b.mean_word_len, b.alpha_word_ratio,
           b.symbol_ratio, COALESCE(bs.top_bigram_share, 0.0) AS top_bigram_share,
           (b.n_tokens BETWEEN 50 AND 100000)
             AND (b.mean_word_len BETWEEN 3.0 AND 10.0)
             AND (b.symbol_ratio < 0.1)
             AND (b.alpha_word_ratio > 0.8)
             AND (COALESCE(bs.top_bigram_share, 0.0) < 0.2) AS passes
    FROM base b LEFT JOIN bs USING (doc_id)
    ORDER BY doc_id
    """,
    doc="Gopher-style repetition/shape filters (token bounds, word-length "
        "band, symbol + alpha ratios, top-bigram share) with a keep/drop "
        "verdict per document.",
)
def t7(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return gopher_filters(docs).orderBy("doc_id")


# ---------------------------------------------------------------------------
# deterministic stratified corpus sampling
# ---------------------------------------------------------------------------


def stratified_sample_flags(
    docs: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "quality_score",
    keep_lo_pct: int = 30,
    quality_cut: float = 0.5,
) -> DataFrame:
    """Quality-stratified downsampling decision per document: docs at or
    above ``quality_cut`` always keep; below it, keep a deterministic
    ``keep_lo_pct``% chosen by md5-hash of the id (stable across runs,
    engines, and cluster layouts — no RNG state, rerunning the pipeline on
    a grown corpus keeps prior decisions). Map-only at any scale."""
    bucket = F.when(F.col(quality_col) >= quality_cut, F.lit("hi")).otherwise(F.lit("lo"))
    slot = F.pmod(md5_prefix48(F.col(id_col).cast("string")), F.lit(100))
    keep = (bucket == "hi") | (slot < keep_lo_pct)
    return docs.withColumn("bucket", bucket).withColumn("keep", keep)


@defquery(
    "t8_stratified_sample",
    """
    WITH feats AS (
      SELECT doc_id, lang,
        greatest(1.0
          - least(1.0, abs(len(list_filter(string_split(trim(text), ' '),
              t -> list_contains(['the','a','of','and','is','in','to'], t)))::DOUBLE
              / len(string_split(trim(text), ' ')) - 0.08) * 5)
          - least(0.5, length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE
              / length(text) * 5)
          - least(0.5, length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))::DOUBLE
              / length(text) * 2), 0.0) AS q
      FROM documents
    ),
    flagged AS (
      SELECT lang,
        CASE WHEN q >= 0.5 THEN 'hi' ELSE 'lo' END AS bucket,
        (q >= 0.5) OR (('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT % 100 < 30) AS keep
      FROM feats
    )
    SELECT lang, bucket, count(*) AS n_docs,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM flagged GROUP BY lang, bucket ORDER BY lang, bucket
    """,
    doc="deterministic quality-stratified downsampling: keep all "
        "high-quality docs, a stable md5-chosen 30% of low-quality ones; "
        "reports per-(lang, bucket) kept counts. Hash-based, so decisions "
        "are reproducible across engines and corpus growth.",
)
def t8(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = quality_features(table(spark, sf_dir, "documents"))
    flagged = stratified_sample_flags(docs)
    return (
        flagged.groupBy("lang", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("keep").cast("int")).cast("long").alias("n_kept"),
        )
        .orderBy("lang", "bucket")
    )


# ---------------------------------------------------------------------------
# document packing (concat-and-chunk, GPT-style pretraining batches)
# ---------------------------------------------------------------------------


def pack_documents(
    docs: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    token_count_col: str = "n_tokens",
    num_shards: int = 16,
    shard_col: str | None = None,
) -> DataFrame:
    """Assign documents to fixed-capacity context chunks by concatenation
    order (the streaming "concat-and-chunk" packing used for pretraining
    token streams): documents are laid out per-shard in ``id_col`` order,
    and each doc's chunk within its shard is ``floor(start_offset /
    capacity)``; ``spans_boundary`` marks docs split across two chunks.

    Packing is PER-SHARD: the window partitions on ``shard_col`` (or a
    deterministic ``pmod(id, num_shards)`` when none is given), so the
    cumsum never funnels the whole corpus through one reducer — each shard
    packs independently and chunk identity is the (shard_id, chunk_id)
    pair. A single global ``Window.orderBy`` would serialize 100 TB
    through one task; per-shard packing is what large pretraining
    pipelines ship (each output shard is one token stream).

    One shuffle on the shard key, O(1) window state per row.
    First-fit-decreasing bin packing (less waste, sequential) is
    deliberately NOT the scale path; concat-and-chunk is order-stable and
    embarrassingly windowable.
    """
    from pyspark.sql.window import Window

    shard = (
        F.col(shard_col) if shard_col else F.pmod(F.col(id_col), F.lit(num_shards))
    ).cast("long")
    sharded = docs.withColumn("shard_id", shard)
    w = (
        Window.partitionBy("shard_id")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(token_count_col).over(w), F.lit(0)).cast("long")
    end = start + F.col(token_count_col)
    return sharded.select(
        id_col,
        F.col(token_count_col),
        "shard_id",
        start.alias("start_offset"),
        F.floor(start / capacity).cast("long").alias("chunk_id"),
        (F.floor(start / capacity) != F.floor((end - 1) / capacity)).alias(
            "spans_boundary"
        ),
    )


@defquery(
    "t6_pack_documents",
    oracle="""
    WITH toks AS (
      SELECT doc_id, length(string_split(trim(text), ' ')) AS n_tokens
      FROM documents
    ), laid AS (
      SELECT doc_id, n_tokens,
             CAST(doc_id % 16 AS BIGINT) AS shard_id,
             CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY doc_id % 16
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS start_offset
      FROM toks
    )
    SELECT doc_id, n_tokens, shard_id, start_offset,
           CAST(floor(start_offset / 2048) AS BIGINT) AS chunk_id,
           floor(start_offset / 2048)
             != floor((start_offset + n_tokens - 1) / 2048) AS spans_boundary
    FROM laid
    """,
    doc="concat-and-chunk packing into 2048-token contexts over the "
        "whitespace token counts, sharded by pmod(doc_id, 16) so the "
        "packing window partitions (no global single-reducer sort); chunk "
        "identity is the (shard_id, chunk_id) pair.",
)
def t6(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    with_counts = docs.select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens")
    )
    return pack_documents(with_counts, capacity=2048)


def write_token_shards(
    docs: DataFrame,
    token_budget: int,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    input_rows: int | None = None,
) -> DataFrame:
    """Write the corpus as parquet shards bounded by a token budget — the
    export step before tokenization: downstream loaders want
    roughly-equal-token files, not roughly-equal-row files.

    Documents are laid out in ``id_col`` order; a doc starting at global
    token offset ``o`` lands in shard ``floor(o / token_budget)`` (greedy:
    a shard holds ≤ budget + one document's tokens — the straddling doc
    stays whole).

    Shape (guide §8: decide with small rows, move big rows once): the
    prefix sum and shard assignment run over the NARROW (id, n_tokens)
    projection only — ``bucketed_running_sum``, no global single-reducer
    window, and crucially no ``text`` bytes through its bucket shuffle.
    Because the assignment is monotone in id order it collapses to
    (first_id → shard_id) boundaries, a (corpus_tokens / budget)-row
    relation the driver holds like any range-partitioner bound list; the
    heavy text rows are then assigned by an O(log n_shards) JVM binary
    search (Bucketizer) plus a broadcast position→shard map join, and
    shuffled exactly ONCE — the shard-keyed repartition feeding the write.
    (The old form shuffled and sorted the full text twice: once through
    the prefix-sum window, once for the write.) ``n_tokens`` is
    recomputed map-side in the write pass — a second tokenize of the
    corpus, deliberately traded for the removed text shuffle; both passes
    are embarrassingly parallel scans.

    Numeric ids above 2^53 would not round-trip the Bucketizer's double
    cast; that case (and non-numeric ids) falls back to carrying the
    boundaries through a broadcast range join on the exact values.

    Returns per-shard stats READ BACK from the written files, so a caller
    (and wr1's oracle) checks the full write round-trip, not just the
    assignment math.
    """
    from chdb_spark.functions.aggregate_ext import bucketed_running_sum

    n_tok = F.size(tokens(F.col(text_col))).cast("long")
    narrow = docs.select(F.col(id_col), n_tok.alias("n_tokens"))
    cum = bucketed_running_sum(
        narrow, order_col=id_col, sum_cols=["n_tokens"], input_rows=input_rows
    )
    assigned = cum.select(
        id_col,
        F.floor(F.col("_cum_n_tokens") / F.lit(float(token_budget)))
        .cast("long")
        .alias("shard_id"),
    )
    # metadata-sized boundary pull: one row per shard (tokens / budget),
    # the same driver-side footprint as a range partitioner's bounds
    bounds = (
        assigned.groupBy("shard_id")
        .agg(F.min(id_col).alias("_lo"), F.max(id_col).alias("_hi"))
        .orderBy("_lo")
        .collect()
    )
    heavy = docs.select(F.col(id_col), F.col(text_col), n_tok.alias("n_tokens"))
    id_type = dict(docs.dtypes)[id_col]
    numeric_id = id_type in ("int", "bigint", "smallint", "tinyint")
    exact_double = numeric_id and all(
        abs(int(r["_lo"])) <= 2**53 and abs(int(r["_hi"])) <= 2**53
        for r in bounds
    )
    if len(bounds) <= 1:
        only = int(bounds[0]["shard_id"]) if bounds else 0
        sharded = heavy.withColumn("shard_id", F.lit(only).cast("long"))
    elif exact_double:
        # O(log n_shards) binary search per row, pure JVM — the same
        # Bucketizer kernel bucketed_running_sum uses for range buckets
        from pyspark.ml.feature import Bucketizer

        splits = [float("-inf")] + [float(r["_lo"]) for r in bounds[1:]] + [
            float("inf")
        ]
        spark = docs.sparkSession
        pos_map = spark.createDataFrame(
            [(float(i), int(r["shard_id"])) for i, r in enumerate(bounds)],
            "_pos double, shard_id long",
        )
        sharded = (
            Bucketizer(splits=splits, inputCol="_idd", outputCol="_pos")
            .transform(heavy.withColumn("_idd", F.col(id_col).cast("double")))
            .join(F.broadcast(pos_map), "_pos")
            .drop("_idd", "_pos")
        )
    else:
        # exact-value fallback (huge/non-numeric ids): broadcast range
        # join on the shard boundaries — inner side stays shard-count-sized
        spark = docs.sparkSession
        ranges = spark.createDataFrame(
            [(r["_lo"], r["_hi"], int(r["shard_id"])) for r in bounds],
            f"_lo {id_type}, _hi {id_type}, shard_id long",
        )
        sharded = heavy.join(
            F.broadcast(ranges),
            (F.col(id_col) >= F.col("_lo")) & (F.col(id_col) <= F.col("_hi")),
        ).drop("_lo", "_hi")
    (
        sharded.select(id_col, text_col, "n_tokens", "shard_id")
        .repartition("shard_id")
        .sortWithinPartitions(id_col)
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(out_dir)
    )
    back = docs.sparkSession.read.parquet(out_dir)
    return (
        back.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("shard_tokens"),
            F.min(id_col).alias("first_doc"),
            F.max(id_col).alias("last_doc"),
        )
        .orderBy("shard_id")
    )


@defquery(
    "wr1_token_shards",
    oracle="""
    WITH toks AS (
      SELECT doc_id, CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), laid AS (
      SELECT doc_id, n_tokens,
             CAST(floor(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / 2000.0) AS BIGINT) AS shard_id
      FROM toks
    )
    SELECT shard_id, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM laid GROUP BY shard_id ORDER BY shard_id
    """,
    doc="token-budget-bounded shard export: id-ordered docs assigned to "
        "floor(global_token_offset / 2000) via the two-phase prefix sum "
        "(no global window), written one ordered parquet file per shard "
        "directory; the returned stats are read back from the files so "
        "the oracle verifies the write round-trip.",
)
def wr1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.operators import scratch_dir
    from chdb_spark.queries import table_rows_upper_bound

    docs = table(spark, sf_dir, "documents")
    out = scratch_dir("shards", sf_dir)
    # parquet-footer row bound: a known-small corpus lets the narrow
    # prefix sum take the lazy plain-window lane (no sketch job)
    return write_token_shards(
        docs, token_budget=2000, out_dir=out,
        input_rows=table_rows_upper_bound(sf_dir, "documents"),
    )


# ---------------------------------------------------------------------------
# token vocabulary build (tokenizer-training prep)
# ---------------------------------------------------------------------------


def vocab_coverage(
    docs: DataFrame, top_k: int = 50, text_col: str = "text"
) -> DataFrame:
    """Corpus token-frequency vocabulary with cumulative coverage — the
    counting pass a tokenizer-training pipeline runs before BPE merges:
    top ``top_k`` tokens by frequency (ties → lexicographic) with each
    prefix's share of all token occurrences.

    Scale shape: one hash aggregate keyed by token (map-side combine —
    the shuffle carries distinct tokens, not occurrences), a top-k under
    a total order, then a cumsum window over the BOUNDED top-k rows only
    (never the full vocabulary); the corpus total joins in as a broadcast
    1-row relation.
    """
    from pyspark.sql.window import Window

    toks = docs.select(F.explode(tokens(F.col(text_col))).alias("tok")).filter(
        F.length("tok") > 0
    )
    counts = toks.groupBy("tok").agg(F.count("*").alias("n_occ"))
    total = toks.agg(F.count("*").alias("_total"))
    top = counts.orderBy(F.desc("n_occ"), F.asc("tok")).limit(top_k)
    w = Window.orderBy(F.desc("n_occ"), F.asc("tok")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.row_number().over(w).cast("long").alias("rank"),
            "tok",
            "n_occ",
            F.round(F.sum("n_occ").over(w) / F.col("_total"), 4).alias("coverage"),
        )
        .orderBy("rank")
    )


@defquery(
    "t9_vocab_coverage",
    """
    WITH toks AS (
      SELECT unnest(string_split(trim(text), ' ')) AS tok FROM documents
    ),
    nonempty AS (SELECT tok FROM toks WHERE length(tok) > 0),
    counts AS (SELECT tok, count(*) AS n_occ FROM nonempty GROUP BY tok),
    total AS (SELECT count(*) AS t FROM nonempty),
    top AS (SELECT tok, n_occ FROM counts ORDER BY n_occ DESC, tok LIMIT 50)
    SELECT CAST(row_number() OVER (ORDER BY n_occ DESC, tok) AS BIGINT) AS rank,
           tok, n_occ,
           round(sum(n_occ) OVER (ORDER BY n_occ DESC, tok
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::DOUBLE
                 / (SELECT t FROM total), 4) AS coverage
    FROM top ORDER BY rank
    """,
    doc="top-50 token vocabulary with cumulative corpus coverage — the "
        "frequency-counting pass before tokenizer training; one hash agg "
        "keyed by token, cumsum window over the bounded top-k only.",
)
def t9(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return vocab_coverage(docs, top_k=50)


def bpe_merges(
    docs: DataFrame, n_merges: int = 8, text_col: str = "text"
) -> DataFrame:
    """Distributed BPE merge training: learn the first ``n_merges`` merge
    rules over the corpus — the iterative half of tokenizer training
    (``vocab_coverage`` is the counting half).

    Scale shape: the corpus is scanned ONCE into the (word, freq) table —
    BPE statistics depend only on word frequencies, so every iteration
    runs over vocabulary-sized data (a hash agg keyed by symbol pair plus
    a top-1), not the corpus. The table is eagerly checkpointed per step:
    a lazy lineage would re-derive every prior merge each iteration (the
    measured recursive-CTE rescan trap), and the driver holds only the
    winning pair per step, applied back as a broadcast literal.

    Merge semantics: words are space-joined symbol strings and a merge is
    three rounds of PLAIN (non-regex) ``replace(' a b ' -> ' ab ')`` over
    the padded string — replace-to-fixpoint, which both Spark and DuckDB
    implement with identical left-to-right non-overlap, so the oracle
    replays every stage exactly (three rounds reach fixpoint for any word
    up to 16 symbols; corpus max is 8). Ties break (count DESC, pair ASC)
    — fully deterministic.

    Returns (step, merge_left, merge_right, merged, pair_freq).
    """
    rows, final_words = _bpe_train(docs, n_merges, text_col)
    final_words.unpersist()
    return docs.sparkSession.createDataFrame(
        rows,
        "step int, merge_left string, merge_right string, merged string, pair_freq long",
    ).orderBy("step")


_BPE_VOCAB_DRIVER_MAX = 300_000


def _bpe_train_local(spark, word_rows, n_merges: int):
    """Driver-side merge loop over the collected vocabulary — semantics
    mirrored from the distributed loop below EXACTLY: same pair explosion
    (every adjacent occurrence, weighted by word freq), same (count DESC,
    pair ASC) tie-break (words are ASCII by the rlike filter, so Python
    and UTF8-binary string order coincide), same three rounds of plain
    non-regex replace over the space-padded word (str.replace and
    F.replace are both left-to-right non-overlapping)."""
    vocab = [(" ".join(r["w"]), int(r["freq"])) for r in word_rows]
    rows = []
    for step in range(1, n_merges + 1):
        counts: dict = {}
        for s, f in vocab:
            syms = s.split(" ")
            for i in range(len(syms) - 1):
                p = syms[i] + " " + syms[i + 1]
                counts[p] = counts.get(p, 0) + f
        if not counts:
            raise ValueError(
                f"bpe_merges: no adjacent pairs left after {step - 1} merges; "
                f"lower n_merges (asked for {n_merges})"
            )
        pair, cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merged = pair.replace(" ", "")
        rows.append((step, *pair.split(" "), merged, cnt))
        pat, sub = f" {pair} ", f" {merged} "
        nxt = []
        for s, f in vocab:
            t = f" {s} "
            for _ in range(3):
                t = t.replace(pat, sub)
            nxt.append((t.strip(), f))
        vocab = nxt
    final = spark.createDataFrame(vocab, "s string, freq long")
    return rows, final


def _bpe_train(docs: DataFrame, n_merges: int, text_col: str = "text"):
    """Shared trainer: returns (merge rows, final (s, freq) word table —
    caller unpersists; the distributed lane eagerly checkpoints it)."""
    words = (
        docs.select(F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w"))
        .select(F.lower("w").alias("w"))
        .filter(F.col("w").rlike("^[a-z0-9]+$"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    # BPE statistics are vocabulary-sized by construction (the corpus is
    # folded into (word, freq) first), so within a LIMIT-guarded bound the
    # whole merge loop runs on the driver — 8 distributed iterations
    # (explode+agg+top-1+checkpoint ≈ 29 jobs, 1.6 s at sf0.1) collapse to
    # ONE job (the vocab pull) + a ms-scale Python loop. Past the bound
    # (a truly huge vocabulary) the distributed loop below keeps the exact
    # same semantics on executors — the perplexity-model pattern.
    word_rows = words.limit(_BPE_VOCAB_DRIVER_MAX + 1).collect()
    if len(word_rows) <= _BPE_VOCAB_DRIVER_MAX:
        return _bpe_train_local(docs.sparkSession, word_rows, n_merges)
    cur = words.select(
        F.trim(F.regexp_replace("w", "(.)", "$1 ")).alias("s"), "freq"
    ).localCheckpoint(eager=True)
    rows = []
    for step in range(1, n_merges + 1):
        pairs = (
            cur.select(
                F.explode(
                    F.expr(
                        "transform(slice(split(s, ' '), 1, size(split(s, ' ')) - 1),"
                        " (x, i) -> concat(x, ' ', element_at(split(s, ' '), i + 2)))"
                    )
                ).alias("pair"),
                "freq",
            )
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
        )
        best = pairs.orderBy(F.desc("cnt"), F.asc("pair")).limit(1).collect()
        if not best:
            raise ValueError(
                f"bpe_merges: no adjacent pairs left after {step - 1} merges; "
                f"lower n_merges (asked for {n_merges})"
            )
        pair, cnt = best[0]["pair"], int(best[0]["cnt"])
        merged = pair.replace(" ", "")
        rows.append((step, *pair.split(" "), merged, cnt))
        rep = F.concat(F.lit(" "), F.col("s"), F.lit(" "))
        for _ in range(3):
            rep = F.replace(rep, F.lit(f" {pair} "), F.lit(f" {merged} "))
        nxt = cur.select(F.trim(rep).alias("s"), "freq").localCheckpoint(eager=True)
        cur.unpersist()
        cur = nxt
    return rows, cur


def bpe_token_counts(
    docs: DataFrame, n_merges: int = 8, top_k: int = 20, text_col: str = "text"
) -> DataFrame:
    """Apply the learned BPE merges and count the resulting tokens — the
    vocabulary a tokenizer built from these merges would actually emit
    over this corpus, with subword splits for everything the merges don't
    cover.

    Scale shape: tokenization applies to the WORD-FREQUENCY table (token
    counts depend only on it), so the corpus is scanned once by the
    trainer and never again; the apply step is a chain of plain replaces
    on vocabulary-sized data, the count is one explode + hash agg
    weighted by word freq, and only ``top_k`` rows survive the rank.
    """
    rows, final_words = _bpe_train(docs, n_merges, text_col)
    try:
        counts = (
            final_words.select(
                F.explode(F.split("s", " ")).alias("token"), "freq"
            )
            .groupBy("token")
            .agg(F.sum("freq").alias("n_occurrences"))
        )
        # TakeOrdered (per-partition heap, k rows to driver), not a global
        # rank window — deterministic via the (count desc, token asc) key
        return counts.orderBy(F.desc("n_occurrences"), F.asc("token")).limit(top_k)
    finally:
        final_words.unpersist()


def _bpe_oracle_sql(n_merges: int = 8) -> str:
    """Unrolled SQL replay of ``bpe_merges``: every stage is expressible
    because the merge is plain replace-to-fixpoint (see bpe_merges doc),
    so stage i is three CTEs — pair counts p_i, deterministic top-1 b_i,
    merged words c_i — chained from the same (word, freq) base."""
    # MATERIALIZED is load-bearing: p_i and c_i both reference c_{i-1}, so
    # DuckDB's default CTE inlining would expand the base scan 2^n times
    # ("too many open files" at n=8); materializing keeps each stage O(1)
    parts = [
        """
    WITH c0 AS MATERIALIZED (
      SELECT trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS s, freq FROM (
        SELECT lower(t.w) AS word, CAST(count(*) AS BIGINT) AS freq
        FROM (SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents) t
        WHERE regexp_matches(lower(t.w), '^[a-z0-9]+$')
        GROUP BY 1)
    )"""
    ]
    for i in range(1, n_merges + 1):
        parts.append(f"""
    , p{i} AS MATERIALIZED (
      SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        SELECT unnest([l[j] || ' ' || l[j + 1] for j in range(1, len(l))]) AS pair,
               freq
        FROM (SELECT string_split(s, ' ') AS l, freq FROM c{i - 1})
      ) GROUP BY pair
    ), b{i} AS MATERIALIZED (
      SELECT pair, replace(pair, ' ', '') AS merged, cnt
      FROM p{i} ORDER BY cnt DESC, pair ASC LIMIT 1
    ), c{i} AS MATERIALIZED (
      SELECT trim(replace(replace(replace(' ' || s || ' ',
          ' ' || (SELECT pair FROM b{i}) || ' ', ' ' || (SELECT merged FROM b{i}) || ' '),
          ' ' || (SELECT pair FROM b{i}) || ' ', ' ' || (SELECT merged FROM b{i}) || ' '),
          ' ' || (SELECT pair FROM b{i}) || ' ', ' ' || (SELECT merged FROM b{i}) || ' ')) AS s,
        freq
      FROM c{i - 1}
    )""")
    unions = "\n      UNION ALL ".join(
        f"SELECT {i} AS step, pair, merged, cnt FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    parts.append(f"""
    SELECT CAST(step AS INT) AS step,
           string_split(pair, ' ')[1] AS merge_left,
           string_split(pair, ' ')[2] AS merge_right,
           merged, cnt AS pair_freq
    FROM ({unions})
    ORDER BY step""")
    return "".join(parts)


@defquery(
    "t19_bpe_merges",
    _bpe_oracle_sql(8),
    doc="distributed BPE merge training: first 8 merge rules over the "
        "corpus word-frequency table (corpus scanned once; iterations are "
        "vocabulary-sized). Merges are plain replace-to-fixpoint on "
        "space-joined symbols — identical left-to-right semantics in both "
        "engines — so the oracle unrolls and replays all 8 stages in SQL.",
)
def t19(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return bpe_merges(docs, n_merges=8)


def _bpe_apply_oracle_sql(n_merges: int = 8, top_k: int = 20) -> str:
    """t20's oracle: the same unrolled training stages, then tokenize =
    explode the FINAL word table's symbols weighted by word frequency."""
    train = _bpe_oracle_sql(n_merges)
    stages = train[: train.rindex("SELECT CAST(step AS INT)")]
    return f"""{stages}
    SELECT token, CAST(sum(freq) AS BIGINT) AS n_occurrences FROM (
      SELECT unnest(string_split(s, ' ')) AS token, freq FROM c{n_merges}
    ) GROUP BY token
    ORDER BY n_occurrences DESC, token ASC LIMIT {top_k}"""


@defquery(
    "t20_bpe_tokenize",
    _bpe_apply_oracle_sql(8, 20),
    doc="BPE apply + vocabulary counts: tokenize the corpus with the 8 "
        "learned merges (t19's trainer) and count the emitted tokens — "
        "applied to the word-frequency table, so the corpus is scanned "
        "once by training and never again; top-20 via TakeOrdered over "
        "the collapsed token counts.",
)
def t20(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return bpe_token_counts(docs, n_merges=8, top_k=20)


def domain_mix_rates(
    docs: DataFrame,
    target_weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Domain-reweighting plan: per-source sampling rates that hit a token
    budget at target domain proportions — the mixing step every
    multi-source pretraining pipeline runs (domain weights like those
    published for The Pile / DoReMi-style mixes; rates, not materialized
    samples, so the decision stays a metadata-sized table).

    rate_s = min(1, budget·w_s / tokens_s): oversubscribed domains are
    capped at 1.0 (can't sample more than exists — the shortfall is
    reported, not silently redistributed). One hash agg keyed by source
    (≤ thousands of rows at any corpus size); everything downstream can
    `sample(fraction=rate)` per source from the plan.
    """
    tok = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    per_src = docs.groupBy(source_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(tok).cast("long").alias("n_tokens"),
    )
    w = F.create_map(
        *[F.lit(x) for kv in target_weights.items() for x in kv]
    )[F.col(source_col)]
    total_w = sum(target_weights.values())
    want = (F.lit(float(token_budget)) * F.coalesce(w, F.lit(0.0)) / F.lit(total_w))
    return per_src.select(
        source_col,
        "n_docs",
        "n_tokens",
        F.round(want, 1).alias("target_tokens"),
        F.round(F.least(F.lit(1.0), want / F.col("n_tokens")), 6).alias("sample_rate"),
        F.round(
            F.greatest(F.lit(0.0), want - F.col("n_tokens")), 1
        ).alias("shortfall_tokens"),
    )


@defquery(
    "t10_domain_mix",
    """
    WITH per_src AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    w AS (SELECT * FROM (VALUES ('src1', 3.0), ('src2', 1.0), ('src3', 1.0)) t(source, wt))
    SELECT p.source, p.n_docs, p.n_tokens,
           round(50000.0 * coalesce(w.wt, 0) / 5.0, 1) AS target_tokens,
           round(least(1.0, (50000.0 * coalesce(w.wt, 0) / 5.0) / p.n_tokens), 6) AS sample_rate,
           round(greatest(0.0, 50000.0 * coalesce(w.wt, 0) / 5.0 - p.n_tokens), 1) AS shortfall_tokens
    FROM per_src p LEFT JOIN w USING (source)
    ORDER BY p.source
    """,
    doc="domain-mixing plan: per-source sampling rates hitting a token "
        "budget at target weights (The Pile-style mix), oversubscription "
        "capped and reported as shortfall; one source-keyed hash agg.",
)
def t10(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return domain_mix_rates(
        docs, {"src1": 3.0, "src2": 1.0, "src3": 1.0}, token_budget=50_000
    ).orderBy("source")


def blocklist_filter(
    docs: DataFrame,
    blocklist: DataFrame,
    source_col: str = "source",
) -> DataFrame:
    """Source/domain blocklist filtering (the URL-blocklist step of
    RefinedWeb/CC pipeline front-ends): LEFT ANTI join against the
    blocked-domain relation. The blocklist is dimension-sized →
    broadcast; the corpus side never shuffles.
    """
    return docs.join(
        F.broadcast(blocklist.select(F.col(blocklist.columns[0]).alias(source_col))),
        on=source_col,
        how="left_anti",
    )


@defquery(
    "t11_blocklist_filter",
    """
    WITH blocked AS (SELECT * FROM (VALUES ('src4'), ('src7'), ('src11')) t(source))
    SELECT d.lang, count(*) AS n_docs, CAST(sum(d.n_chars) AS BIGINT) AS total_chars
    FROM documents d LEFT JOIN blocked b USING (source)
    WHERE b.source IS NULL
    GROUP BY d.lang ORDER BY d.lang
    """,
    doc="domain-blocklist filtering (RefinedWeb URL-filter front-end): "
        "broadcast LEFT ANTI join against the blocked-source dim, then "
        "per-language survivor stats; corpus side never shuffles for the "
        "filter itself.",
)
def t11(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    blocked = docs.sparkSession.createDataFrame(
        [("src4",), ("src7",), ("src11",)], ["source"]
    )
    return (
        blocklist_filter(docs, blocked)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("lang")
    )


def hashed_ngram_features(
    docs: DataFrame,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """fastText-style hashing-trick features: token unigrams hashed into
    ``n_buckets`` counting buckets per document — the sparse input
    representation quality classifiers (CCNet/fastText lang-quality
    models) train on. Output is the sparse COO form (doc_id, bucket,
    count): bounded by tokens, never by n_buckets x docs.

    Scale shape: explode tokens → hash → per-(doc, bucket) count — one
    shuffle keyed by (doc_id, bucket), partial-aggregated map-side. The
    bucket hash is md5-prefix-based (engine-portable, same expression the
    DuckDB oracle runs) rather than xxhash64 (which DuckDB lacks).
    """
    tok = F.explode(tokens(F.col(text_col))).alias("tok")
    toks = docs.select(F.col(id_col).alias("doc_id"), tok).filter(
        F.length("tok") > 0
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
        % n_buckets
    ).alias("bucket")
    return (
        toks.select("doc_id", bucket)
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("count"))
    )


@defquery(
    "t12_hashed_features",
    """
    WITH toks AS (
      SELECT doc_id, t.tok FROM documents,
             unnest(string_split_regex(trim(text), '\\s+')) t(tok)
      WHERE length(t.tok) > 0
    )
    SELECT doc_id,
           CAST(('0x' || substr(md5(tok), 1, 8))::BIGINT % 64 AS BIGINT) AS bucket,
           count(*) AS count
    FROM toks
    GROUP BY doc_id, bucket
    ORDER BY doc_id, bucket
    """,
    doc="hashing-trick feature matrix (fastText-style): tokens hashed into "
        "64 counting buckets per doc, sparse COO output — the classifier-"
        "input representation step; one (doc,bucket)-keyed partial agg.",
)
def t12(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return hashed_ngram_features(docs, n_buckets=64).orderBy("doc_id", "bucket")


# ---------------------------------------------------------------------------
# DSIR importance weights (data selection via importance resampling)
# ---------------------------------------------------------------------------


def dsir_importance_weights(
    docs: DataFrame,
    target_filter,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """Per-document DSIR importance log-weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): model target
    and raw corpora as bags of hashed n-gram buckets; each document's weight
    is sum over its tokens of log(p_target(bucket) / p_raw(bucket)) with
    Laplace smoothing. Documents scoring high look like the target
    distribution and are preferentially sampled for training.

    ``target_filter`` is a boolean Column selecting the in-corpus target
    exemplar set (e.g. a trusted source or language).

    Scale shape (100 TB): the two bucket-distribution aggregates group the
    full token stream into only ``n_buckets`` keys — map-side partial
    aggregation reduces every task's output to <= n_buckets rows, so the
    shuffle is bytes, not data. The per-(doc, bucket) count shuffle is keyed
    by doc_id (uniform). The bucket-weight table (<= n_buckets rows) joins
    back broadcast. The driver never sees a row.
    """
    toks = docs.select(
        F.col(id_col),
        target_filter.alias("_is_target"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).filter(F.length("tok") > 0)
    tb = toks.select(
        id_col, "_is_target", (md5_prefix48(F.col("tok")) % n_buckets).alias("b")
    )

    # One corpus pass, not three: raw/tgt/per-doc counts all derive from the
    # (doc, is_target, bucket) count table, eagerly checkpointed so the token
    # explode+hash subtree executes exactly once (lazily it re-ran under each
    # of the three branches). Exact-integer sums, so the derivations are
    # bit-identical to grouping the token stream directly; blocks are
    # executor-side and released by ContextCleaner (the minhash-feats pattern).
    dbt = (
        tb.groupBy(id_col, "_is_target", "b")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)
    )
    raw = dbt.groupBy("b").agg(F.sum("n").alias("n_r"))
    tgt = dbt.filter(F.col("_is_target")).groupBy("b").agg(F.sum("n").alias("n_t"))

    # Per-bucket log-ratio scaled to integer micro-units: the per-doc sum
    # is then exact 64-bit arithmetic — associative, so partial-aggregation
    # order can never flip a rounding boundary (cross-engine bit-equality;
    # a float sum here flaked exactly once at a .xxxx5 boundary).
    # Corpus totals as unbounded-window sums over the ≤ n_buckets-row
    # bucket table (exact integer sums, same values as separate scalar
    # aggregates) — the two crossJoin(broadcast(agg)) forms this replaces
    # each cost a broadcast-build job of their own. n_t is coalesced to 0
    # BEFORE the window so tot_t still sums only real target counts.
    from pyspark.sql.window import Window as _W

    _all = _W.partitionBy()
    bw = (
        raw.join(tgt, "b", "left")
        .na.fill({"n_t": 0})
        .withColumn("tot_r", F.sum("n_r").over(_all))
        .withColumn("tot_t", F.sum("n_t").over(_all))
        .select(
            "b",
            F.round(
                (
                    F.log((F.col("n_t") + 1) / (F.col("tot_t") + n_buckets))
                    - F.log((F.col("n_r") + 1) / (F.col("tot_r") + n_buckets))
                )
                * 1000000,
                0,
            )
            .cast("long")
            .alias("lw_u"),
        )
    )

    dbc = dbt.groupBy(id_col, "b").agg(F.sum("n").alias("n"))
    return (
        dbc.join(F.broadcast(bw), "b")
        .groupBy(id_col)
        .agg(
            F.sum("n").alias("n_tokens"),
            # no decimal re-rounding: the micro-unit integer sum is identical
            # in both engines, so this IEEE division is bit-identical too —
            # a round() here can land on a decimal tie and flip per libm ulp
            (F.sum(F.col("n") * F.col("lw_u")) / 1000000.0).alias("dsir_logw"),
        )
    )


@defquery(
    "t13_dsir_weights",
    """
    WITH toks AS (
      SELECT doc_id, lang = 'en' AS _is_target,
             unnest(string_split(trim(text), ' ')) AS tok
      FROM documents
    ),
    tb AS (
      SELECT doc_id, _is_target,
             ('0x' || substr(md5(tok), 1, 12))::BIGINT % 64 AS b
      FROM toks WHERE length(tok) > 0
    ),
    raw AS (SELECT b, count(*) AS n_r FROM tb GROUP BY b),
    tgt AS (SELECT b, count(*) AS n_t FROM tb WHERE _is_target GROUP BY b),
    bw AS (
      SELECT raw.b,
             CAST(round((ln((coalesce(n_t, 0) + 1)::DOUBLE
                       / ((SELECT sum(n_t) FROM tgt) + 64))
                   - ln((n_r + 1)::DOUBLE
                       / ((SELECT sum(n_r) FROM raw) + 64))) * 1000000, 0)
                  AS BIGINT) AS lw_u
      FROM raw LEFT JOIN tgt ON raw.b = tgt.b
    ),
    dbc AS (SELECT doc_id, b, count(*) AS n FROM tb GROUP BY doc_id, b)
    SELECT doc_id,
           CAST(sum(n) AS BIGINT) AS n_tokens,
           sum(n * lw_u) / 1000000.0 AS dsir_logw
    FROM dbc JOIN bw USING (b)
    GROUP BY doc_id ORDER BY doc_id
    """,
    doc="DSIR importance resampling log-weights (hashed token buckets, "
        "target = lang='en' exemplars): bucket distributions collapse "
        "map-side to 64 keys; weight table broadcasts back.",
)
def t13(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return dsir_importance_weights(docs, F.col("lang") == "en").orderBy("doc_id")


# ---------------------------------------------------------------------------
# CCNet-style perplexity-proxy quality bucketing
# ---------------------------------------------------------------------------


#: driver-pull bound for the perplexity bigram model — within it the
#: model ships as task-closure state (kernel lane); past it the join
#: lane keeps the model distributed (module-level so tests force the
#: lane switch)
_PPL_MODEL_DRIVER_MAX = 300_000


def perplexity_buckets(
    docs: DataFrame,
    trusted_filter,
    id_col: str = "doc_id",
    text_col: str = "text",
    smoothing_vocab: int = 256,
) -> DataFrame:
    """Per-document perplexity-proxy score + head/middle/tail bucket —
    the CCNet quality-bucketing step (Wenzek et al. 2020: score web text
    with a language model trained on trusted data; keep the low-perplexity
    "head" tercile). The LM here is a character-bigram model with add-one
    smoothing, trained in-corpus on ``trusted_filter`` rows — a
    deterministic, engine-portable stand-in for KenLM with the identical
    pipeline shape (train counts → broadcast model → score every doc).

    Scale shape (100 TB): bigram extraction never materializes a row per
    bigram — an Arrow-batched kernel counts byte-pair codes per partition
    (np.bincount over a 64 Ki array), so the train shuffle carries only
    ≤|alphabet|² partial counts per task; scoring is one map-only kernel
    pass (broadcast int64 nll table, one indexed-gather sum per doc) — no
    explode, no join, scan speed. The model nll values and the unseen
    default stay SPARK expressions (F.log/F.round, collected once —
    vocabulary-bounded by contract), so rounding semantics are identical
    to the explode-lane formulation and the SQL oracle. Non-ASCII rows
    take an exact per-row dict fallback inside the same kernels (2-char
    substrings — identical semantics, just not vectorized). Per-doc sums
    are integer micro-units: associative, partial-agg-order-immune. The
    tercile split is one ntile window over (score, doc_id) — a single
    small row per *document*; for a trillion-doc corpus swap in approx
    percentile cutoffs.
    """
    import numpy as np

    spark = docs.sparkSession
    id_type = docs.schema[id_col].dataType.simpleString()

    def _count_bigrams(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            acc = np.zeros(65536, dtype=np.int64)
            other: dict = {}
            for s in pdf[text_col]:
                if s is None or len(s) < 2:
                    continue
                if s.isascii():
                    b = np.frombuffer(s.encode("ascii"), dtype=np.uint8).astype(
                        np.int64
                    )
                    acc += np.bincount(b[:-1] * 256 + b[1:], minlength=65536)
                else:
                    for i in range(len(s) - 1):
                        g = s[i : i + 2]
                        other[g] = other.get(g, 0) + 1
            codes = np.nonzero(acc)[0]
            bgs = [chr(c >> 8) + chr(c & 255) for c in codes]
            ns = acc[codes].tolist()
            for g, n in other.items():
                bgs.append(g)
                ns.append(n)
            yield pd.DataFrame(
                {"bg": pd.Series(bgs, dtype="object"),
                 "n_bg": pd.Series(ns, dtype="int64")}
            )

    bg_counts = (
        docs.filter(trusted_filter)
        .select(text_col)
        .mapInPandas(_count_bigrams, "bg string, n_bg long")
        .groupBy("bg")
        .agg(F.sum("n_bg").alias("n_bg"))
    )
    # n(c1) == sum over bigrams of n(c1·) because every position
    # contributes exactly one bigram, so prefix counts need no extra scan.
    c1_counts = (
        bg_counts.groupBy(F.substring("bg", 1, 1).alias("c1"))
        .agg(F.sum("n_bg").alias("n_c1"))
    )
    # nll in integer micro-units so the per-doc sum is exact 64-bit math —
    # associative, immune to partial-agg order at rounding boundaries
    model = bg_counts.withColumn("c1", F.substring("bg", 1, 1)).join(
        c1_counts, "c1"
    ).select(
        "bg",
        F.round(
            -(F.log(F.col("n_bg") + 1) - F.log(F.col("n_c1") + smoothing_vocab))
            * 1000000,
            0,
        )
        .cast("long")
        .alias("nll_u"),
    )
    # the unseen default evaluated by the SAME JVM round(ln·1e6) pipeline
    # as the model rows (local relation — no scan, no job of substance)
    unseen = int(
        spark.sql(
            f"SELECT CAST(round(ln(CAST({smoothing_vocab} AS DOUBLE))"
            " * 1000000, 0) AS BIGINT)"
        ).first()[0]
    )
    # |model| ≤ |alphabet|² — small for byte-ish alphabets, but a CJK
    # trusted corpus makes the distinct-bigram set enormous, so the
    # driver pull is LIMIT-guarded: within the bound, the model ships as
    # task-closure state (no explicit sc.broadcast handle — nothing to
    # leak per call; the pickled command is task-bounded by the guard);
    # past it, scoring falls back to the distributed join lane below,
    # which keeps the model on executors.
    model_rows = model.limit(_PPL_MODEL_DRIVER_MAX + 1).collect()
    if len(model_rows) > _PPL_MODEL_DRIVER_MAX:
        scored = _perplexity_score_join_lane(
            docs, model, unseen, id_col, text_col, id_type
        )
        return _perplexity_tercile_tail(scored, id_col)
    nll_map = {r["bg"]: r["nll_u"] for r in model_rows}
    arr = np.full(65536, unseen, dtype=np.int64)
    for g, v in nll_map.items():
        if len(g) == 2 and g.isascii():
            arr[(ord(g[0]) << 8) | ord(g[1])] = v
    arr_b, map_b, unseen_b = arr, nll_map, unseen

    def _score(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            ids, nb, su = [], [], []
            for doc_id, s in zip(pdf[id_col], pdf[text_col]):
                if s is None or len(s) < 2:
                    continue  # mirrors the length-≥2 bigram-stream filter
                if s.isascii():
                    b = np.frombuffer(s.encode("ascii"), dtype=np.uint8).astype(
                        np.int64
                    )
                    total = int(arr_b[b[:-1] * 256 + b[1:]].sum())
                else:
                    total = sum(
                        map_b.get(s[i : i + 2], unseen_b)
                        for i in range(len(s) - 1)
                    )
                ids.append(doc_id)
                nb.append(len(s) - 1)
                su.append(total)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                    "n_bigrams": pd.Series(nb, dtype="int64"),
                    "_sum_u": pd.Series(su, dtype="int64"),
                }
            )

    scored = (
        docs.select(id_col, text_col)
        .mapInPandas(_score, f"{id_col} {id_type}, n_bigrams long, _sum_u long")
        .select(
            id_col,
            "n_bigrams",
            (F.col("_sum_u") / 1000000.0 / F.col("n_bigrams")).alias("ppl_proxy"),
        )
    )
    return _perplexity_tercile_tail(scored, id_col)


def _perplexity_score_join_lane(
    docs: DataFrame, model: DataFrame, unseen: int,
    id_col: str, text_col: str, id_type: str,
) -> DataFrame:
    """Big-alphabet fallback for :func:`perplexity_buckets`: when the
    bigram model exceeds the driver-pull bound (CJK-scale alphabets), the
    model stays DISTRIBUTED — docs explode to (doc, bigram) pairs that
    shuffle-join the model on ``bg`` and re-aggregate per doc. Costs the
    row inflation the kernel lane avoids, but never moves the model to
    one machine — the correct trade at that alphabet size."""

    def _pairs(it):
        import pandas as pd

        for pdf in it:
            ids, bgs = [], []
            for doc_id, s in zip(pdf[id_col], pdf[text_col]):
                if s is None or len(s) < 2:
                    continue
                for i in range(len(s) - 1):
                    ids.append(doc_id)
                    bgs.append(s[i : i + 2])
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                 "bg": pd.Series(bgs, dtype="object")}
            )

    pairs = docs.select(id_col, text_col).mapInPandas(
        _pairs, f"{id_col} {id_type}, bg string"
    )
    return (
        pairs.join(model, "bg", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(F.coalesce(F.col("nll_u"), F.lit(unseen))).alias("_sum_u"),
        )
        .select(
            id_col,
            "n_bigrams",
            (F.col("_sum_u") / 1000000.0 / F.col("n_bigrams")).alias("ppl_proxy"),
        )
    )


def _perplexity_tercile_tail(scored: DataFrame, id_col: str) -> DataFrame:
    # Exact ntile(3) without a global single-reducer window: global rank
    # from the bucketed two-phase cumulative (integer counts — bit-exact),
    # then the ANSI ntile arithmetic on (rank, N). Ties share a range
    # bucket, so the doc_id tiebreak stays bucket-local.
    from chdb_spark.functions.aggregate_ext import bucketed_running_sum

    ranked = bucketed_running_sum(
        scored.withColumn("_one", F.lit(1)),
        order_col="ppl_proxy",
        sum_cols=["_one"],
        extra_order=[id_col],
        inclusive=True,
        # scored is one row per doc (id, n, score) — tiny next to the
        # exploded-bigram lineage above it; checkpointed across the
        # sketch+main passes inside
        cache_input=True,
    ).withColumnRenamed("_cum__one", "_rank")
    # N from the checkpoint-backed ranked relation, NOT from `scored`:
    # scored's own lineage is the full exploded-bigram pipeline, and
    # re-aggregating it here would recompute all of it (measured 3x on
    # the whole query, r6) — ranked reads checkpoint blocks instead
    total = ranked.agg(F.count("*").alias("_n"))
    r, n, k = F.col("_rank"), F.col("_n"), F.lit(3)
    big = F.floor(n / k) + 1
    n_big = n % k
    tile = F.when(r <= n_big * big, F.floor((r - 1) / big) + 1).otherwise(
        n_big + F.floor((r - n_big * big - 1) / F.floor(n / k)) + 1
    )
    return ranked.crossJoin(F.broadcast(total)).select(
        id_col,
        "n_bigrams",
        "ppl_proxy",
        F.element_at(
            F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
            tile.cast("int"),
        ).alias("bucket"),
    )


@defquery(
    "t14_perplexity_buckets",
    """
    WITH grams AS (
      SELECT doc_id, source = 'src0' AS _trusted,
             substr(text, CAST(i AS INTEGER), 1) AS c1,
             substr(text, CAST(i AS INTEGER), 2) AS bg
      FROM documents, LATERAL unnest(generate_series(1, length(text) - 1)) AS t(i)
      WHERE length(text) >= 2
    ),
    bgc AS (SELECT c1, bg, count(*) AS n_bg FROM grams WHERE _trusted GROUP BY c1, bg),
    c1c AS (SELECT c1, count(*) AS n_c1 FROM grams WHERE _trusted GROUP BY c1),
    model AS (
      SELECT bg, CAST(round(-(ln(n_bg + 1) - ln(n_c1 + 256)) * 1000000, 0) AS BIGINT) AS nll_u
      FROM bgc JOIN c1c USING (c1)
    ),
    scored AS (
      SELECT g.doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             sum(coalesce(m.nll_u, CAST(round(ln(256.0) * 1000000, 0) AS BIGINT)))
                   / 1000000.0 / count(*) AS ppl_proxy
      FROM grams g LEFT JOIN model m USING (bg)
      GROUP BY g.doc_id
    )
    SELECT doc_id, n_bigrams, ppl_proxy,
           ['head', 'middle', 'tail'][ntile(3) OVER (ORDER BY ppl_proxy, doc_id)] AS bucket
    FROM scored ORDER BY doc_id
    """,
    doc="CCNet perplexity bucketing (char-bigram LM trained on the trusted "
        "source, add-one smoothing): model shuffle collapses to the bigram "
        "vocabulary, model joins back broadcast, one ntile window over "
        "per-doc rows only.",
)
def t14(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return perplexity_buckets(docs, F.col("source") == "src0").orderBy("doc_id")


# ---------------------------------------------------------------------------
# C4-style rule filters
# ---------------------------------------------------------------------------


def c4_filters(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document C4 cleaning verdicts (Raffel et al. 2020, §2.2 of the
    T5 paper): terminal-punctuation line ratio, boilerplate markers
    ("lorem ipsum", "javascript", curly braces), minimum word count.
    Complements the Gopher shape filters (t7) with the C4 rule family.

    All per-row Column math (split/regexp/size) — scan-speed, zero
    shuffles before the caller's aggregation."""
    lines = F.split(F.col(text_col), r"\n")
    n_lines = F.size(lines)
    term_lines = F.size(F.filter(lines, lambda l: l.rlike(r"[.!?]\s*$")))
    term_ratio = F.when(n_lines > 0, term_lines / n_lines).otherwise(F.lit(0.0))
    low = F.lower(F.col(text_col))
    n_words = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    return docs.select(
        id_col,
        F.round(term_ratio, 4).alias("terminal_punct_ratio"),
        low.contains("lorem ipsum").alias("has_lorem"),
        low.contains("javascript").alias("has_javascript"),
        F.col(text_col).contains("{").alias("has_brace"),
        n_words.alias("n_words"),
        (
            (n_words >= 5)
            & ~low.contains("lorem ipsum")
            & ~low.contains("javascript")
            & ~F.col(text_col).contains("{")
        ).alias("keep"),
    )


@defquery(
    "t15_c4_filters",
    """
    WITH feats AS (
      SELECT doc_id,
             string_split(text, chr(10)) AS lines,
             lower(text) AS low,
             text,
             len(string_split(trim(text), ' ')) AS n_words
      FROM documents
    )
    SELECT doc_id,
           round(CASE WHEN len(lines) > 0
                 THEN len(list_filter(lines, l -> regexp_matches(l, '[.!?]\\s*$')))::DOUBLE / len(lines)
                 ELSE 0 END, 4) AS terminal_punct_ratio,
           contains(low, 'lorem ipsum') AS has_lorem,
           contains(low, 'javascript') AS has_javascript,
           contains(text, '{') AS has_brace,
           CAST(n_words AS INTEGER) AS n_words,
           (n_words >= 5 AND NOT contains(low, 'lorem ipsum')
            AND NOT contains(low, 'javascript') AND NOT contains(text, '{')) AS keep
    FROM feats ORDER BY doc_id
    """,
    doc="C4 cleaning rules (T5 §2.2): terminal-punctuation line ratio, "
        "boilerplate markers, min word count — per-row Column math at scan "
        "speed, complementing the Gopher filters (t7).",
)
def t15(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return c4_filters(docs).orderBy("doc_id")


# ---------------------------------------------------------------------------
# BM25 retrieval scoring (Robertson/Sparck-Jones; the standard k1/b form)
# ---------------------------------------------------------------------------


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by BM25 against a fixed query term set.

    Scale shape: doc lengths come from ``size(split(...))`` at scan speed
    (no explode); the explode is filtered to the query terms BEFORE the
    (doc, term) hash agg, so the shuffled relation is |matching tokens|,
    not |all tokens|; per-term document frequencies and the global
    (N, avgdl) stats are tiny aggregates broadcast back. One shuffle on
    (doc, term), everything else map-side.
    """
    toks = F.split(F.lower(F.col(text_col)), " ")
    dl = docs.select(F.col(id_col).alias("doc_id"), F.size(toks).alias("dl"))
    stats = dl.agg(
        F.avg("dl").alias("avgdl"), F.count("*").cast("double").alias("n")
    )
    tf = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("term"))
        .where(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    per_term = (
        tf.join(F.broadcast(df_t), "term")
        .join(F.broadcast(dl), "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                idf
                * (F.col("tf") * (k1 + 1))
                / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
            ).alias("s"),
        )
    )
    return (
        per_term.groupBy("doc_id")
        .agg(F.round(F.sum("s"), 4).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(k)
    )


@defquery(
    "t16_bm25_topk",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      FROM documents
    ), dl AS (
      SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
    ), stats AS (
      SELECT avg(dl) AS avgdl, count(*)::DOUBLE AS n FROM dl
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks
      WHERE term IN ('table', 'spark', 'join') GROUP BY doc_id, term
    ), dft AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
    )
    SELECT doc_id,
           round(sum(ln((n - df + 0.5) / (df + 0.5) + 1)
                     * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4)
               AS bm25
    FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
    GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 10
    """,
    doc="BM25 top-k retrieval over the corpus (k1=1.2, b=0.75) — the "
        "classic sparse-retrieval scorer a training-data pipeline uses for "
        "query-based corpus selection. Explode filtered to query terms "
        "BEFORE the (doc,term) agg; df/avgdl/N broadcast back.",
)
def t16(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return bm25_topk(docs, ["table", "spark", "join"])


# ---------------------------------------------------------------------------
# Temperature-scaled source mixing (multilingual-corpus balancing)
# ---------------------------------------------------------------------------


def temperature_mix(
    docs: DataFrame,
    alpha: float = 0.7,
    budget: int = 10_000,
    by: str = "source",
) -> DataFrame:
    """Sampling weights p_i^alpha / sum_j p_j^alpha per group — the
    standard temperature-resampling scheme for balancing corpus sources
    (alpha<1 upsamples the tail). One hash agg to group counts (tiny),
    then broadcast scalar normalizers; the downstream per-row sampler is
    ``df.sampleBy(by, fractions)`` fed from this table.

    The per-source weight is quantized to an int64 (floor(w*1e12+0.5))
    BEFORE the normalizer sum: a double sum's value depends on partial-
    aggregation order (20 equal weights summed sequentially vs pairwise
    differ in the last ulp), and ``floor(budget * w / z)`` sits exactly
    on an integer boundary for uniform sources — the one-ulp wobble
    flips it between 499 and 500 run-to-run. Integer sum + integer
    division are order-free and bit-equal across engines.

    Normalizers are unbounded-window sums over the group-count table
    (group-cardinality-sized by contract), NOT crossJoin(broadcast(agg))
    scalars: the scalar-agg form embedded the corpus count subtree once
    per consumer (the plan scanned the corpus ~6×); the window form is
    one linear chain — corpus scanned once, and the integer sums are
    order-free so the results are bit-identical."""
    wall = Window.partitionBy()
    c = docs.groupBy(by).agg(F.count("*").alias("n"))
    w = c.select(
        by,
        "n",
        F.floor(
            F.pow(
                F.col("n") / F.sum("n").over(wall).cast("double"), alpha
            )
            * 1e12
            + 0.5
        )
        .cast("long")
        .alias("wi"),
    ).withColumn("_z", F.sum("wi").over(wall))
    return (
        w.select(
            by,
            "n",
            F.round(
                F.col("wi").cast("double") / F.col("_z").cast("double"), 6
            ).alias("mix_weight"),
            F.expr(f"(CAST({budget} AS BIGINT) * wi) div _z").alias(
                f"docs_at_{budget}"
            ),
        )
        .orderBy(by)
    )


@defquery(
    "t17_temperature_mix",
    """
    WITH c AS (
      SELECT source, count(*) AS n FROM documents GROUP BY source
    ), w AS (
      SELECT source, n,
             CAST(floor(pow(n / (SELECT sum(n)::DOUBLE FROM c), 0.7)
                        * 1e12 + 0.5) AS BIGINT) AS wi
      FROM c
    )
    SELECT source, n,
           round(wi::DOUBLE / (SELECT sum(wi) FROM w)::DOUBLE, 6) AS mix_weight,
           CAST((10000 * wi) // (SELECT sum(wi) FROM w) AS BIGINT)
               AS docs_at_10000
    FROM w ORDER BY source
    """,
    doc="Temperature-scaled source mixing weights (p^0.7 renormalized) — "
        "the multilingual-balancing scheme (mBERT/XLM-R style). Group "
        "counts are a tiny hash agg; normalizers broadcast; the sampler "
        "consumes the weights via sampleBy fractions.",
)
def t17(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return temperature_mix(docs, alpha=0.7, budget=10_000)


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    fractions: tuple[float, float, float] = (0.9, 0.05, 0.05),
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic train/val/test assignment by content-independent hash.

    The split must be (a) stable across reruns and cluster sizes — no
    sample()/rand(), which reshuffle with partitioning — and (b) portable
    across engines for audits. md5(salt || id) mod 10_000 gives both:
    a pure per-row codegen expression (no shuffle, no state), re-salting
    yields an independent re-split, and holding out by ID (not position)
    keeps a doc's split stable as the corpus grows — the property that
    stops eval-set leakage when shards are re-packed.
    """
    bucket = md5_prefix48(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))) % 10_000
    t_hi = int(fractions[0] * 10_000)
    v_hi = t_hi + int(fractions[1] * 10_000)
    return df.withColumn(
        "split",
        F.when(bucket < t_hi, "train")
        .when(bucket < v_hi, "val")
        .otherwise("test"),
    )


def leakage_safe_split(
    df: DataFrame,
    cluster_col: str,
    id_col: str = "doc_id",
    fractions: tuple[float, float, float] = (0.9, 0.05, 0.05),
    salt: str = "split-v1",
) -> DataFrame:
    """Train/val/test split where every document of a duplicate cluster
    lands in the SAME split — the leakage-safe refinement of
    :func:`split_assign`.

    Splitting near-identical documents across train and test silently
    inflates eval scores; the fix is to assign the split to the CLUSTER
    (``cluster_col`` from any dedup pass — exact digest, MinHash/SimHash
    components, SemDeDup cells) and let members inherit. The cluster's
    canonical id (min ``id_col``) is hashed with the same salted-md5
    bucket math as split_assign, so singleton clusters of a pure-id
    cluster column reproduce split_assign exactly and the assignment
    stays stable as the corpus grows.

    Two exchanges at any scale: one hash agg keyed by cluster (canonical
    ids — metadata-sized next to the docs), one join back on the cluster
    key (AQE broadcasts the cluster table while it fits)."""
    canon = df.groupBy(cluster_col).agg(F.min(id_col).alias("_canon"))
    canon = split_assign(canon, id_col="_canon", fractions=fractions, salt=salt)
    return df.join(canon.select(cluster_col, "split"), cluster_col, "left")


@defquery(
    "t18_split_assign",
    """
    WITH s AS (
      SELECT source,
             CASE WHEN b < 9000 THEN 'train'
                  WHEN b < 9500 THEN 'val' ELSE 'test' END AS split
      FROM (
        SELECT source,
               CAST(('0x' || substr(md5('split-v1:' || CAST(doc_id AS VARCHAR)), 1, 12))::UBIGINT
                    % 10000 AS BIGINT) AS b
        FROM documents
      )
    )
    SELECT source, split, count(*) AS n_docs
    FROM s GROUP BY source, split ORDER BY source, split
    """,
    doc="deterministic 90/5/5 train-val-test split by salted md5 of the "
        "doc id — pure per-row codegen, no shuffle/state, stable across "
        "reruns and corpus growth (ID-keyed, not position-keyed); the "
        "oracle computes the identical hash bucket, so assignment parity "
        "is checked doc-by-doc through the per-source counts.",
)
def t18(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        split_assign(docs)
        .groupBy("source", "split")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("source", "split")
    )


def weighted_reservoir_sample(
    df: DataFrame,
    k: int = 5,
    by: str = "source",
    id_col: str = "doc_id",
    weight: F.Column | None = None,
    salt: str = "wrs-v1",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, ``k`` rows per group —
    Efraimidis & Spirakis (2006) A-Res: each row draws key ``u^(1/w)``
    with ``u`` uniform in (0,1]; the top-k keys per group ARE a
    weight-proportional sample.

    ``u`` comes from the engine-portable ``md5_prefix48(salt || id)``
    instead of ``rand()``: the draw is a pure per-row codegen expression,
    stable across reruns / partitionings / cluster sizes (``rand()``
    reshuffles with partitioning) and replayable on any engine for
    audits — the same determinism contract as :func:`split_assign`.
    Re-salting yields an independent re-draw.

    Scale shape: one shuffle on ``by``; the ``row_number() <= k`` filter
    is recognized by Spark as a WindowGroupLimit, so each map task keeps
    only its local top-k per group before the exchange — state per task
    is O(groups × k), never the corpus. Key comparisons are raw doubles
    with an id tiebreak: two DISTINCT 48-bit draws land within an ulp of
    each other with probability ~n²·2⁻⁵², so cross-engine rank parity is
    safe without the quantization idiom exact sums need.
    """
    from pyspark.sql.window import Window

    u = (
        md5_prefix48(
            F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
        )
        + 1
    ) / F.lit(float(2**48))
    w = weight if weight is not None else F.size(tokens(F.col("text")))
    keyed = df.withColumn("_wt", w.cast("double")).withColumn(
        "_key", F.pow(u, F.lit(1.0) / F.col("_wt"))
    )
    win = Window.partitionBy(by).orderBy(F.desc("_key"), F.asc(id_col))
    return (
        keyed.withColumn("_rk", F.row_number().over(win))
        .where(F.col("_rk") <= k)
        .drop("_rk", "_key")
        .withColumnRenamed("_wt", "wt")
    )


@defquery(
    "t21_weighted_reservoir",
    """
    WITH w AS (
      SELECT source, doc_id,
             len(string_split(trim(text), ' ')) AS wt,
             ('0x' || substr(md5('wrs-v1:' || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT AS h
      FROM documents
    ), keyed AS (
      SELECT source, doc_id, wt,
             pow((h + 1) / 281474976710656.0, 1.0 / wt) AS k
      FROM w
    ), rk AS (
      SELECT source, doc_id, wt,
             row_number() OVER (PARTITION BY source ORDER BY k DESC, doc_id) AS r
      FROM keyed
    )
    SELECT source, doc_id, CAST(wt AS BIGINT) AS wt
    FROM rk WHERE r <= 5 ORDER BY source, doc_id
    """,
    doc="token-weighted reservoir sample (A-Res, Efraimidis-Spirakis): 5 "
        "docs per source drawn proportional to token count, with the "
        "uniform draw derived from salted md5 of the doc id so the sample "
        "is deterministic across engines, reruns and partitionings. The "
        "rank<=k window filter plans as WindowGroupLimit (map-side top-k); "
        "the oracle replays the identical hash -> u^(1/w) -> top-k math.",
)
def t21(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        weighted_reservoir_sample(docs, k=5)
        .select("source", "doc_id", F.col("wt").cast("long").alias("wt"))
        .orderBy("source", "doc_id")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 200,
    stride: int = 150,
) -> DataFrame:
    """RAG-style sliding-window chunking: split every document into
    fixed-size character windows with overlap (``size - stride`` chars).

    Chunk count is ``1 + ceil(max(len - size, 0) / stride)`` — the last
    window always starts inside the text (``stride <= size`` invariant),
    so no empty chunks. Pure built-ins (sequence → explode → substring):
    per-row codegen, map-only, zero shuffle — at 100 TB this runs at scan
    speed and the output inherits the input's partitioning, which is what
    a downstream embed/index stage wants. Each chunk carries a
    whitespace-token estimate for budget-aware packing (see
    :func:`pack_documents`).
    """
    if stride > size or stride <= 0:
        raise ValueError("chunk_documents: need 0 < stride <= size")
    n_chunks = F.expr(
        f"1 + (greatest(length({text_col}) - {size}, 0) + {stride - 1}) div {stride}"
    )
    exploded = df.select(
        F.col(id_col),
        F.col(text_col),
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_ix"),
    )
    chunk = F.expr(f"substring({text_col}, chunk_ix * {stride} + 1, {size})")
    return (
        exploded.withColumn("chunk_text", chunk)
        .withColumn("chunk_len", F.length("chunk_text").cast("long"))
        .withColumn(
            "n_tokens",
            F.size(F.split(F.trim(F.col("chunk_text")), r"\s+")).cast("long"),
        )
        .drop(text_col)
    )


@defquery(
    "ck1_chunk_documents",
    """
    WITH ex AS (
      SELECT doc_id, text,
             unnest(range(0, 1 + (greatest(length(text) - 200, 0) + 149) // 150))
               AS chunk_ix
      FROM documents
    )
    SELECT doc_id, CAST(chunk_ix AS BIGINT) AS chunk_ix,
           substr(text, CAST(chunk_ix * 150 + 1 AS BIGINT), 200) AS chunk_text,
           CAST(length(substr(text, CAST(chunk_ix * 150 + 1 AS BIGINT), 200)) AS BIGINT)
             AS chunk_len,
           CAST(len(regexp_split_to_array(
                  trim(substr(text, CAST(chunk_ix * 150 + 1 AS BIGINT), 200)), '\\s+'))
             AS BIGINT) AS n_tokens
    FROM ex ORDER BY doc_id, chunk_ix
    """,
    doc="RAG sliding-window chunking (200-char windows, 150 stride) over "
        "documents — sequence/explode/substring built-ins only, map-only "
        "at scan speed; the oracle replays the identical window algebra "
        "with DuckDB range/unnest/substr, checking every chunk's text, "
        "length and whitespace-token estimate verbatim.",
)
def ck1(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return chunk_documents(docs).orderBy("doc_id", "chunk_ix")


def tfidf_keywords(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    id_col: str = "doc_id",
    top_k: int = 3,
) -> DataFrame:
    """Top TF-IDF terms per group — corpus keyword extraction.

    tf is the term count within the group; idf is document-level
    (``ln((1+N_docs)/(1+df_docs))``, smoothed), so corpus-wide stopwords
    sink even when every group contains them. The idf is quantized to
    integer micro-units before scoring, making the ranking key
    ``tf * idf_micro`` a bigint — summation-order-free and replayable
    bit-for-bit by any engine (same discrete inputs → same ln argument →
    same quantized idf).

    Shape at scale: one token explode (map-only), two hash aggregations
    (term×group, term×doc — both map-side partial), a broadcast-sized
    term→idf join only if vocab is small (here it joins on term via hash
    join; vocab tables are dimension-sized in practice), and a per-group
    top-k window. No collect, no cartesian. (A checkpointed
    (group, doc, term) count table feeding both aggregations was
    measured in r11: 1.4 → 3.7 s — materializing the token-stream-sized
    intermediate costs more than the second map-side-collapsing explode
    pass; recorded so it isn't retried.)
    """
    tokens = df.select(
        F.col(id_col),
        F.col(group_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
    ).where(F.col("term") != "")
    tf = tokens.groupBy(group_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tokens.groupBy("term").agg(
        F.count_distinct(F.col(id_col)).alias("df_docs")
    )
    from pyspark.sql.window import Window

    n_docs = df.agg(F.count("*").alias("n_docs"))
    idf_micro = F.expr(
        "cast(floor(ln((1.0 + n_docs) / (1.0 + df_docs)) * 1000000 + 0.5) as bigint)"
    )
    scored = (
        tf.join(dfreq, on="term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score_micro", F.col("tf") * idf_micro)
    )
    w = Window.partitionBy(group_col).orderBy(
        F.desc("score_micro"), F.asc("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= top_k)
        .select(
            group_col,
            "term",
            F.col("tf").cast("long").alias("tf"),
            "score_micro",
            F.col("rk").cast("long").alias("rk"),
        )
    )


@defquery(
    "tf1_tfidf_keywords",
    """
    WITH toks AS (
      SELECT doc_id, source,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
      FROM documents
    ), toks2 AS (SELECT * FROM toks WHERE term <> ''),
    tf AS (SELECT source, term, count(*) AS tf FROM toks2 GROUP BY source, term),
    dfq AS (SELECT term, count(DISTINCT doc_id) AS df_docs FROM toks2 GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT source, term, tf,
             tf * CAST(floor(ln((1.0 + n_docs) / (1.0 + df_docs)) * 1000000 + 0.5)
                       AS BIGINT) AS score_micro
      FROM tf JOIN dfq USING (term) CROSS JOIN n
    ), ranked AS (
      SELECT source, term, tf, score_micro,
             row_number() OVER (PARTITION BY source
                                ORDER BY score_micro DESC, term) AS rk
      FROM scored
    )
    SELECT source, term, CAST(tf AS BIGINT) AS tf, score_micro,
           CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 3 ORDER BY source, rk
    """,
    doc="top-3 TF-IDF keywords per source: token explode + two hash aggs "
        "(group-term tf, doc-level df) + integer-quantized idf so the "
        "ranking key is an exact bigint — engine-portable; per-group "
        "top-k via partitioned window.",
)
def tf1(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return tfidf_keywords(docs).orderBy("source", "rk")


# ---------------------------------------------------------------------------
# deterministic training-order shuffle (t22)
# ---------------------------------------------------------------------------


def training_shuffle(
    docs: DataFrame,
    n_shards: int = 16,
    salt: str = "shuffle-v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global training-order shuffle WITHOUT a global sort:
    order key = salted-md5 of the id (a fixed pseudo-random permutation),
    shard = key mod ``n_shards``. Training order is (shard, key); a
    reader streams shards independently, each internally ordered by key
    at write time (wr1's sortWithinPartitions mechanics) — so the
    "shuffle" every pretraining run needs costs ONE map pass + the
    shard-keyed exchange, never a cluster-wide sort. Re-salting yields an
    independent permutation; ID-keying keeps a doc's position stable as
    the corpus grows (the same audit property as t18's split).

    Returns per-shard audit stats: doc count, key range, and the first
    document in training order — every value replayed exactly by the SQL
    oracle (identical md5 math on both engines).
    """
    keyed = docs.select(
        F.col(id_col),
        md5_prefix48(
            F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
        ).alias("okey"),
    )
    sharded = keyed.withColumn("shard", F.pmod(F.col("okey"), F.lit(n_shards)).cast("long"))
    return (
        sharded.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("okey").alias("min_key"),
            F.max("okey").alias("max_key"),
            F.min_by(id_col, "okey").cast("long").alias("first_doc"),
        )
        .orderBy("shard")
    )


@defquery(
    "t22_training_shuffle",
    """
    WITH keyed AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5('shuffle-v1:' || CAST(doc_id AS VARCHAR)), 1, 12))::UBIGINT
                  AS BIGINT) AS okey
      FROM documents
    )
    SELECT okey % 16 AS shard, count(*) AS n_docs,
           min(okey) AS min_key, max(okey) AS max_key,
           CAST(min_by(doc_id, okey) AS BIGINT) AS first_doc
    FROM keyed GROUP BY shard ORDER BY shard
    """,
    doc="deterministic training-order shuffle: salted-md5 permutation key "
        "+ mod-16 sharding — the reproducible global shuffle every "
        "pretraining run needs, with NO cluster-wide sort (order lives "
        "inside shards). Per-shard audit stats; the oracle recomputes the "
        "identical hash, so assignment AND order (via min/max/min_by) are "
        "checked exactly.",
)
def t22(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return training_shuffle(docs)


@defquery(
    "cs1_cluster_split",
    """
    WITH c AS (
      SELECT doc_id, md5(text) AS cluster FROM documents
    ), canon AS (
      SELECT cluster, min(doc_id) AS canon FROM c GROUP BY cluster
    ), s AS (
      SELECT cluster,
             CASE WHEN b < 9000 THEN 'train'
                  WHEN b < 9500 THEN 'val' ELSE 'test' END AS split
      FROM (
        SELECT cluster,
               CAST(('0x' || substr(md5('split-v1:' || CAST(canon AS VARCHAR)), 1, 12))::UBIGINT
                    % 10000 AS BIGINT) AS b
        FROM canon
      )
    )
    SELECT s.split, count(*) AS n_docs, count(DISTINCT c.cluster) AS n_clusters
    FROM c JOIN s ON c.cluster = s.cluster
    GROUP BY s.split ORDER BY s.split
    """,
    doc="leakage-safe split: exact-duplicate clusters (md5 digest) are "
        "assigned train/val/test as UNITS — the canonical member's salted "
        "md5 bucket decides, members inherit — so near-identical text can "
        "never straddle train and eval. The oracle replays the identical "
        "canonical-hash math; cluster/split integrity (every cluster in "
        "exactly one split) is pinned by a unit test. Composes with any "
        "dedup pass: feed MinHash component ids or SemDeDup cells as "
        "cluster_col instead of the digest.",
)
def cs1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chdb_spark.queries import table as _table

    docs = _table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("cluster")
    )
    out = leakage_safe_split(docs, "cluster")
    return (
        out.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("cluster").alias("n_clusters"),
        )
        .orderBy("split")
    )
