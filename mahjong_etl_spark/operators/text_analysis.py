"""Text-analysis operators over the ``documents`` table.

Everything is JVM-side expression work (split / filter / transform /
aggregate higher-order functions) — no Python UDFs, so the operators
stay inside whole-stage codegen and scale linearly with one scan.

- language-ID: deterministic stopword/CJK-script heuristic
- quality scoring: token counts, uniqueness, stopword ratio
- token counting: whitespace + a BPE-ish regex segmentation
- document fingerprinting: polynomial rolling hash over codepoints
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load, load_spread

# language marker words (deterministic heuristic, mirrored in oracle SQL)
_MARKERS = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "los", "y", "es"),
    "fr": ("le", "la", "les", "et", "est"),
}
_STOP = ("the", "a", "of", "and", "in")
_BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"
FP_MOD = 2147483647


def _in_list(arr, words: tuple[str, ...]):
    lst = ", ".join(f"'{w}'" for w in words)
    return F.expr(f"size(filter({arr}, t -> t IN ({lst})))")


def _sql_in_list(arr: str, words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({arr}, t -> t IN ({lst})))"


# ---------------------------------------------------------------------------
# Language ID
# ---------------------------------------------------------------------------


def lang_scores(df: DataFrame) -> DataFrame:
    toks = "split(text, ' ')"
    out = df.withColumn("has_cjk", F.col("text").rlike("[\\u4e00-\\u9fff]"))
    for lang, words in _MARKERS.items():
        out = out.withColumn(f"s_{lang}", _in_list(toks, words))
    return out


def lang_id(df: DataFrame) -> DataFrame:
    """Predict language: CJK script wins outright, else argmax of
    marker-word hits with fixed precedence en > de > es > fr on ties."""
    s = lang_scores(df)
    pred = (
        F.when(F.col("has_cjk"), F.lit("zh"))
        .when(
            (F.col("s_en") >= F.col("s_de"))
            & (F.col("s_en") >= F.col("s_es"))
            & (F.col("s_en") >= F.col("s_fr")),
            F.lit("en"),
        )
        .when((F.col("s_de") >= F.col("s_es")) & (F.col("s_de") >= F.col("s_fr")), F.lit("de"))
        .when(F.col("s_es") >= F.col("s_fr"), F.lit("es"))
        .otherwise(F.lit("fr"))
    )
    return s.withColumn("lang_pred", pred)


@query(
    "text_lang_id",
    oracle=f"""
    WITH scored AS (
        SELECT lang,
               regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') AS has_cjk,
               {_sql_in_list("string_split(text, ' ')", _MARKERS["en"])} AS s_en,
               {_sql_in_list("string_split(text, ' ')", _MARKERS["de"])} AS s_de,
               {_sql_in_list("string_split(text, ' ')", _MARKERS["es"])} AS s_es,
               {_sql_in_list("string_split(text, ' ')", _MARKERS["fr"])} AS s_fr
        FROM documents
    )
    SELECT lang,
           CASE WHEN has_cjk THEN 'zh'
                WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
                WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
                WHEN s_es >= s_fr THEN 'es'
                ELSE 'fr' END AS lang_pred,
           count(*) AS n_docs
    FROM scored GROUP BY lang, lang_pred
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion counts: labeled lang x predicted lang."""
    d = lang_id(load(spark, sf_dir, "documents"))
    return d.groupBy("lang", "lang_pred").agg(F.count(F.lit(1)).alias("n_docs"))


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------


@query(
    "text_quality",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM documents
    )
    SELECT doc_id, n_chars,
           len(toks)                                             AS n_tokens,
           len(list_distinct(toks))                              AS n_uniq_tokens,
           round(len(list_distinct(toks))::DOUBLE / len(toks), 6) AS uniq_ratio,
           round({_sql_in_list("toks", _STOP)}::DOUBLE / len(toks), 6) AS stopword_ratio,
           round((n_chars - len(toks) + 1)::DOUBLE / len(toks), 6)     AS avg_token_len
    FROM t
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features: token counts, uniqueness,
    stopword ratio, mean token length — one scan, zero shuffles."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    return d.select(
        "doc_id",
        "n_chars",
        n_tok.cast("long").alias("n_tokens"),
        n_uniq.cast("long").alias("n_uniq_tokens"),
        F.round(n_uniq.cast("double") / n_tok, 6).alias("uniq_ratio"),
        F.round(
            _in_list("split(text, ' ')", _STOP).cast("double") / n_tok, 6
        ).alias("stopword_ratio"),
        F.round((F.col("n_chars") - n_tok + 1).cast("double") / n_tok, 6).alias(
            "avg_token_len"
        ),
    )


# ---------------------------------------------------------------------------
# Token counting
# ---------------------------------------------------------------------------


@query(
    "text_token_stats",
    oracle=f"""
    SELECT source,
           count(*)                                                  AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT)         AS ws_tokens,
           CAST(sum(len(regexp_extract_all(text, '{_BPE_RE}')))
                AS BIGINT)                                           AS bpe_ish_tokens,
           CAST(sum(length(text)) AS BIGINT)                         AS total_chars
    FROM documents GROUP BY source
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token accounting per source: whitespace tokens and a
    BPE-ish regex segmentation (letters / digits / other)."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).alias("ws_tokens"),
        F.sum(F.size(F.expr(f"regexp_extract_all(text, '{_BPE_RE}', 0)"))).alias(
            "bpe_ish_tokens"
        ),
        F.sum(F.length("text")).alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# Document fingerprinting
# ---------------------------------------------------------------------------


def fingerprint_expr(text_col: str = "text"):
    """Polynomial rolling hash h = (h*31 + codepoint) mod (2^31 - 1)
    over the document's characters — a portable, order-sensitive
    fingerprint (same value in the DuckDB oracle)."""
    return F.expr(
        f"aggregate(filter(split({text_col}, ''), c -> c != ''),"
        f"          cast(0 AS long),"
        f"          (h, c) -> (h * 31 + ascii(c)) % {FP_MOD})"
    )


# ---------------------------------------------------------------------------
# Heavy hitters
# ---------------------------------------------------------------------------


@query(
    "text_top_terms",
    oracle="""
    SELECT term, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
    WHERE term != ''
    GROUP BY term
    ORDER BY n DESC, term
    LIMIT 20
    """,
)
def text_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters: top-20 terms by document-token frequency.

    explode → partial count map-side → one shuffle on the term → final
    count → TakeOrderedAndProject (per-partition top-k, driver merge —
    never a full sort).  At 100 TB the same plan holds; if even the
    distinct-term aggregate is too hot, the sketch-based
    events_approx_quantiles idiom (count-min / approx_top_k) is the
    fallback.
    """
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(20)
    )


@query(
    "events_value_histogram",
    oracle="""
    SELECT least(floor(value / 25)::INTEGER, 19) AS bucket,
           count(*)                              AS n,
           round(min(value), 3)                  AS lo,
           round(max(value), 3)                  AS hi
    FROM events GROUP BY bucket
    """,
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (20 buckets of 25, top-clamped) over the
    event value distribution — the binning idiom for profiling a column
    at scale: one scan, one tiny aggregate."""
    e = load(spark, sf_dir, "events")
    bucket = F.least(F.floor(F.col("value") / 25).cast("long"), F.lit(19).cast("long"))
    return e.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 3).alias("lo"),
        F.round(F.max("value"), 3).alias("hi"),
    )


@query(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           list_reduce(
               list_prepend(0::BIGINT,
                   list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)),
               (h, c) -> (h * 31 + c) % {FP_MOD}
           ) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document order-sensitive rolling-hash fingerprint."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint_expr().alias("fingerprint"))


# ---------------------------------------------------------------------------
# Repetition scoring (Gopher-style quality signal)
# ---------------------------------------------------------------------------


@query(
    "text_repetition",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               string_split(text, ' ') AS ws,
               CASE WHEN len(string_split(text, ' ')) >= 3
                    THEN list_transform(
                             range(len(string_split(text, ' ')) - 2),
                             i -> array_to_string(
                                      string_split(text, ' ')[i + 1 : i + 3],
                                      ' '))
                    ELSE [] END AS tri
        FROM documents
    )
    SELECT doc_id,
           CAST(len(ws) AS BIGINT) AS n_words,
           round(CASE WHEN len(ws) > 0
                      THEN 1.0 - len(list_distinct(ws))::DOUBLE / len(ws)
                      ELSE 0.0 END, 6) AS word_dup_frac,
           round(CASE WHEN len(tri) > 0
                      THEN 1.0 - len(list_distinct(tri))::DOUBLE / len(tri)
                      ELSE 0.0 END, 6) AS tri_dup_frac
    FROM t
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition fractions (duplicate words, duplicate
    word-3-grams) — the Gopher-style 'repetitious document' quality
    signal filtered on before pretraining.  Pure higher-order-function
    expressions over one scan: no shuffle, no UDF; partial results are
    four scalars per row."""
    d = load(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    tri = F.expr(
        "CASE WHEN size(split(text, ' ')) >= 3 THEN"
        "  flatten(transform(array(split(text, ' ')), ws ->"
        "    transform(sequence(0, size(ws) - 3),"
        "              i -> concat_ws(' ', slice(ws, i + 1, 3)))))"
        " ELSE array() END"
    )
    dup = lambda arr: F.when(  # noqa: E731
        F.size(arr) > 0,
        F.lit(1.0) - F.size(F.array_distinct(arr)).cast("double") / F.size(arr),
    ).otherwise(F.lit(0.0))
    return d.select(
        "doc_id",
        F.size(ws).cast("long").alias("n_words"),
        F.round(dup(ws), 6).alias("word_dup_frac"),
        F.round(dup(tri), 6).alias("tri_dup_frac"),
    )


# ---------------------------------------------------------------------------
# PII-style scrubbing (regex redaction with audit counts)
# ---------------------------------------------------------------------------

# Conservative patterns valid in BOTH Java regex (Spark) and RE2
# (DuckDB).  The digit-run rule is the one with live signal in the
# test corpus (events.props JSON); the email rule is the production
# staple and rides along with zero hits here.
PII_PATTERNS = {
    "num": "[0-9]+",
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}",
}


def scrub_col(col: F.Column, pattern: str, repl: str = "<X>") -> F.Column:
    """Redact every match of ``pattern`` (JVM regexp_replace — one
    codegen expression, no UDF; at 100 TB this is a map-only pass)."""
    return F.regexp_replace(col, pattern, repl)


@query(
    "events_pii_scrub",
    oracle=f"""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(len(regexp_extract_all(props, '{PII_PATTERNS["num"]}')))
                AS BIGINT) AS n_num_hits,
           CAST(sum(len(regexp_extract_all(props, '{PII_PATTERNS["email"]}')))
                AS BIGINT) AS n_email_hits,
           CAST(sum(length(regexp_replace(props, '{PII_PATTERNS["num"]}',
                                          '<X>', 'g'))) AS BIGINT)
               AS redacted_chars,
           max(regexp_replace(props, '{PII_PATTERNS["num"]}', '<X>', 'g'))
               AS sample_redacted
    FROM events
    GROUP BY event_type
    """,
)
def events_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scrub of the raw props payload with per-type audit
    counts — the shape of a PII-redaction pass over 100 TB of raw
    logs: map-only redaction, one aggregation keyed by a low-
    cardinality column.  Counts AND the redacted bytes (length sum +
    lexicographic max sample) are pinned cross-engine, so a dialect
    divergence in the pattern shows up as a hash mismatch."""
    e = load(spark, sf_dir, "events")
    red = scrub_col(F.col("props"), PII_PATTERNS["num"])
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.regexp_count(F.col("props"), F.lit(PII_PATTERNS["num"])))
        .cast("long")
        .alias("n_num_hits"),
        F.sum(F.regexp_count(F.col("props"), F.lit(PII_PATTERNS["email"])))
        .cast("long")
        .alias("n_email_hits"),
        F.sum(F.length(red)).cast("long").alias("redacted_chars"),
        F.max(red).alias("sample_redacted"),
    )


# ---------------------------------------------------------------------------
# C4-style rule filtering
# ---------------------------------------------------------------------------

# Gopher/C4-flavored heuristic gates (public rule families from the C4
# and Gopher papers; thresholds are local policy):
#   min_words       — drop near-empty fragments
#   terminal_punct  — document must end like prose
#   no_brace        — '{' marks markup/code leakage into a text corpus
#   avg_wordlen     — 2..12 chars/token, outside is OCR noise/garbage
#   max_wordlen     — any 30+-char token is a URL/hash/binary smear
C4_MIN_WORDS = 10
C4_AVG_LEN_LO = 2.0
C4_AVG_LEN_HI = 12.0
C4_MAX_WORD = 30


@query(
    "text_c4_filters",
    oracle=f"""
    WITH t AS (
        SELECT lang, n_chars, text, string_split(text, ' ') AS toks
        FROM documents
    ),
    rules AS (
        SELECT lang,
               (len(toks) >= {C4_MIN_WORDS})                          AS r_min_words,
               (text SIMILAR TO '.*[.!?"]')                           AS r_terminal,
               (NOT contains(text, '{{'))                             AS r_no_brace,
               ((n_chars - len(toks) + 1)::DOUBLE / len(toks)
                    BETWEEN {C4_AVG_LEN_LO} AND {C4_AVG_LEN_HI})      AS r_avg_len,
               (list_max(list_transform(toks, x -> len(x)))
                    <= {C4_MAX_WORD})                                 AS r_max_word
        FROM t
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN r_min_words AND r_terminal AND r_no_brace
                          AND r_avg_len AND r_max_word
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN NOT r_min_words THEN 1 ELSE 0 END) AS BIGINT)
               AS fail_min_words,
           CAST(sum(CASE WHEN NOT r_terminal THEN 1 ELSE 0 END) AS BIGINT)
               AS fail_terminal,
           CAST(sum(CASE WHEN NOT r_no_brace THEN 1 ELSE 0 END) AS BIGINT)
               AS fail_brace,
           CAST(sum(CASE WHEN NOT r_avg_len THEN 1 ELSE 0 END) AS BIGINT)
               AS fail_avg_len,
           CAST(sum(CASE WHEN NOT r_max_word THEN 1 ELSE 0 END) AS BIGINT)
               AS fail_max_word
    FROM rules GROUP BY lang
    """,
)
def text_c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style rule funnel per language: how many documents
    each heuristic gate rejects and how many survive all five.  Every
    rule is a JVM expression over one scan (split/transform/regexp —
    no UDFs, no shuffle beyond the per-lang aggregate), so the filter
    costs one pass at any corpus size."""
    d = load_spread(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks)
    avg_len = (F.col("n_chars") - n_tok + 1) / n_tok
    r_min_words = n_tok >= C4_MIN_WORDS
    r_terminal = F.col("text").rlike('[.!?"]$')
    r_no_brace = ~F.col("text").contains("{")
    r_avg_len = (avg_len >= C4_AVG_LEN_LO) & (avg_len <= C4_AVG_LEN_HI)
    r_max_word = F.array_max(F.transform(toks, F.length)) <= C4_MAX_WORD
    kept = r_min_words & r_terminal & r_no_brace & r_avg_len & r_max_word

    def n_fail(rule):
        return F.sum(F.when(~rule, 1).otherwise(0)).cast("long")

    return (
        d.select(
            "lang",
            r_min_words.alias("r1"),
            r_terminal.alias("r2"),
            r_no_brace.alias("r3"),
            r_avg_len.alias("r4"),
            r_max_word.alias("r5"),
            kept.alias("keep"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long").alias("n_kept"),
            n_fail(F.col("r1")).alias("fail_min_words"),
            n_fail(F.col("r2")).alias("fail_terminal"),
            n_fail(F.col("r3")).alias("fail_brace"),
            n_fail(F.col("r4")).alias("fail_avg_len"),
            n_fail(F.col("r5")).alias("fail_max_word"),
        )
    )


@query(
    "text_zipf_spectrum",
    oracle="""
    WITH term_counts AS (
        SELECT t.term, count(*) AS term_n
        FROM (SELECT unnest(string_split(text, ' ')) AS term
              FROM documents) t
        WHERE t.term <> ''
        GROUP BY t.term
    )
    SELECT term_n, count(*) AS n_terms
    FROM term_counts GROUP BY term_n
    """,
)
def text_zipf_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary frequency-of-frequencies (the Zipf/Good-Turing
    spectrum): for each term-occurrence count, how many distinct terms
    occur exactly that often — the corpus-statistics input to smoothing
    estimators and the quickest profile of vocabulary health (a
    machine-generated corpus shows up instantly as a distorted tail).

    Two-level aggregation: explode → per-term count (one term-keyed
    shuffle with map-side partial counts) → per-count count (second
    exchange over at most a few thousand distinct counts — negligible).
    At 100 TB the first aggregate is the same plan the top-terms query
    already carries; the spectrum adds only the tiny second pass.  No
    UDFs anywhere."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("term_n"))
        .groupBy("term_n")
        .agg(F.count(F.lit(1)).alias("n_terms"))
    )


# ---------------------------------------------------------------------------
# Unigram-entropy quality score
# ---------------------------------------------------------------------------


@query(
    "text_unigram_entropy",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    c AS (
        SELECT doc_id,
               len(ws) AS n_tokens,
               list_transform(
                   list_sort(list_distinct(ws)),
                   w -> len(list_filter(ws, x -> x = w))::DOUBLE) AS cnts
        FROM t
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT)  AS n_tokens,
           CAST(len(cnts) AS BIGINT) AS n_types,
           round(len(cnts)::DOUBLE / n_tokens, 6) AS ttr,
           round(log2(n_tokens::DOUBLE)
                 - list_sum(list_transform(cnts, c -> c * log2(c)))
                   / n_tokens, 6) AS entropy_bits
    FROM c
    """,
)
def text_unigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the unigram distribution (plus
    type-token ratio) — the information-density quality signal that
    separates natural prose from boilerplate/keyword-stuffed pages
    (low entropy) in pretraining filters.

    Zero-shuffle formulation: token counts are computed per row with
    higher-order functions (distinct -> per-type occurrence count), so
    the whole operator is one codegen map pass over the scan — the
    same shape as text_repetition, O(types x tokens) per row on
    bounded-length documents.  The entropy identity used is
    H = log2(n) - sum(c*log2(c))/n, which needs only the count vector.
    The distinct-type list is SORTED before the float fold on both
    engines so summation order is pinned; terms are rounded at 6dp to
    absorb last-ulp libm drift (same discipline as every float ratio
    in this module).

    load_spread, not load: the per-row fold is O(types x tokens), so
    a single-split local file would serialize the whole corpus onto
    one core (r5 bench showed exactly that — the one 1-task stage in
    the text plane); at cluster scale the input arrives pre-split and
    the spread is a no-op."""
    d = load_spread(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.expr("size(split(text, ' '))").cast("long").alias("n_tokens"),
        F.expr("size(array_distinct(split(text, ' ')))")
        .cast("long")
        .alias("n_types"),
        F.round(
            F.expr(
                "size(array_distinct(split(text, ' '))) / "
                "cast(size(split(text, ' ')) as double)"
            ),
            6,
        ).alias("ttr"),
        F.round(
            F.expr(
                """
                log2(cast(size(split(text, ' ')) as double)) -
                aggregate(
                    transform(
                        array_sort(array_distinct(split(text, ' '))),
                        w -> cast(size(filter(split(text, ' '), x -> x = w))
                                  as double)),
                    cast(0 as double),
                    (acc, c) -> acc + c * log2(c))
                / cast(size(split(text, ' ')) as double)
                """
            ),
            6,
        ).alias("entropy_bits"),
    )


# ---------------------------------------------------------------------------
# Perplexity proxy: cross-entropy under the corpus-level unigram LM
# ---------------------------------------------------------------------------


@query(
    "text_perplexity_proxy",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT term, count(*) AS tf FROM toks GROUP BY term
    ),
    total AS (
        SELECT count(*) AS t FROM toks
    ),
    per_tok AS (
        SELECT toks.doc_id,
               CAST(round(log2(tf.tf::DOUBLE) * 1e9) AS BIGINT) AS lg_nano
        FROM toks JOIN tf USING (term)
    )
    SELECT doc_id,
           count(*) AS n_tokens,
           round((SELECT log2(t::DOUBLE) FROM total)
                 - CAST(sum(lg_nano) AS DOUBLE) / 1e9 / count(*),
                 6) AS cross_entropy_bits
    FROM per_tok
    GROUP BY doc_id
    """,
)
def text_perplexity_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy under the CORPUS-LEVEL unigram
    language model — the perplexity-filter stand-in (real pipelines
    use a KenLM n-gram model; the container has no kenlm, so the
    unigram LM the corpus itself induces is the honest, fully
    reproducible proxy).  Documents full of globally-rare tokens score
    high (surprising), boilerplate scores low — complementary to
    text_unigram_entropy, which only sees WITHIN-document structure.

    H(doc) = -(1/n) sum_i log2 tf(t_i)/T  =  log2 T - (1/n) sum_i
    log2 tf(t_i).  Plan: one explode -> term-count aggregate (the same
    exchange text_top_terms pays), a term-keyed join of tokens against
    the count table (vocabulary-sized right side — Zipf keeps it a
    small fraction of corpus size, AQE broadcasts while it fits), and
    a per-doc aggregate.  Engine exactness: log2 is taken of INTEGER
    term counts only, each term snapped to nano-bits int64 before the
    per-doc sum (order-free), one float division at the end."""
    d = load_spread(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    # r14 single-pass shape: ONE explode -> (doc, term) count
    # aggregate, materialized once ((doc, term)-type-bounded — far
    # below the token stream), and everything else derives from it:
    # tf is its per-term rollup (Σ_doc c ≡ the corpus term count),
    # T is Σ tf, and the per-doc sum of per-TOKEN log-counts is
    # c · lg_nano per (doc, term) — summing c identical int64s IS
    # multiplication, bit-exact.  The before-plan re-ran the corpus
    # explode three times (tf aggregate, total count, scoring join).
    dt = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    tf = dt.groupBy("term").agg(F.sum("c").alias("tf"))
    total = tf.agg(
        F.log2(F.sum("tf").cast("double")).alias("lg_t")
    )
    per_dt = dt.join(tf, "term").select(
        "doc_id",
        "c",
        (
            F.col("c")
            * F.round(F.log2(F.col("tf").cast("double")) * 1e9).cast(
                "long"
            )
        ).alias("lg_nano"),
    )
    return (
        per_dt.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.sum("lg_nano").alias("_s"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.col("lg_t")
                - F.col("_s").cast("double") / 1e9 / F.col("n_tokens"),
                6,
            ).alias("cross_entropy_bits"),
        )
    )


# ---------------------------------------------------------------------------
# Per-document TF-IDF top terms
# ---------------------------------------------------------------------------


@query(
    "text_tfidf_topk",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf
        FROM tok WHERE term <> '' GROUP BY 1, 2
    ),
    df AS (
        SELECT term, count(*) AS df,
               CAST(round(ln((SELECT count(*) FROM documents)::DOUBLE
                             / count(*)) * 1e9) AS BIGINT) AS idf_nano
        FROM tf GROUP BY term
    ),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               tf.tf * df.idf_nano AS w_nano,
               row_number() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY tf.tf * df.idf_nano DESC, tf.term
               ) AS rnk
        FROM tf JOIN df USING (term)
    )
    SELECT doc_id, term, tf, df,
           round(w_nano / 1e9, 6) AS tfidf,
           CAST(rnk AS INT) AS rnk
    FROM scored WHERE rnk <= 3
    """,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 characteristic terms by TF-IDF — the
    keyword-extraction / topic-labeling primitive of a text corpus
    pipeline (and the weighting scheme behind sparse retrieval).

    Plan: one explode feeds BOTH aggregates — term frequency per
    (doc, term) and document frequency per term (computed FROM the tf
    relation, so the heavy token stream is aggregated exactly once) —
    then a term-keyed join puts idf next to tf (vocabulary-sized right
    side: Zipf keeps it far below corpus size, AQE broadcasts while it
    fits), and a per-doc window takes the top-3.  The window partitions
    by doc_id, so the shuffle is doc-keyed and each partition sorts
    only its own handful of terms — never a global sort.  The corpus
    size N enters as a broadcast 1-row aggregate.

    Engine exactness: idf = ln(N/df) is snapped to nano-units int64
    (absorbing last-ulp libm drift between glibc and the JVM), the
    ranking weight tf*idf_nano is then an EXACT int64 product — the
    top-3 cut line cannot move — and the one float division happens
    after the cut, rounded at 6dp on both engines."""
    d = load_spread(spark, sf_dir, "documents")
    # r14: tf feeds BOTH the df rollup and the scoring join — each
    # reference re-ran the corpus explode + (doc, term) aggregate.
    # One materialization of the (doc, term)-bounded relation halves
    # the heavy token work (2 corpus explodes -> 1).
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
    )
    n_docs = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    df = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            "df",
            F.round(F.expr("ln(n_docs / df)") * 1e9)
            .cast("long")
            .alias("idf_nano"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.desc("w_nano"), F.asc("term")
    )
    return (
        tf.join(df, "term")
        .withColumn("w_nano", F.col("tf") * F.col("idf_nano"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(F.col("w_nano") / 1e9, 6).alias("tfidf"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


@query(
    "text_bigram_lm_scores",
    oracle="""
    WITH arrs AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    bg AS (
        SELECT doc_id, t[i.i + 1] AS w1, t[i.i + 2] AS w2
        FROM arrs, LATERAL (SELECT unnest(range(len(t) - 1)) AS i) i
        WHERE len(t) >= 2
    ),
    c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
    v AS (
        SELECT count(DISTINCT u.term) AS vsz
        FROM (SELECT unnest(string_split(text, ' ')) AS term
              FROM documents) u
    ),
    per AS (
        SELECT bg.doc_id,
               CAST(round((log2((c1.c1 + v.vsz)::DOUBLE)
                           - log2((c2.c2 + 1)::DOUBLE)) * 1e9)
                    AS BIGINT) AS nano
        FROM bg
        JOIN c2 USING (w1, w2)
        JOIN c1 USING (w1)
        CROSS JOIN v
    )
    SELECT doc_id,
           count(*) AS n_bigrams,
           round(CAST(sum(nano) AS DOUBLE) / 1e9 / count(*), 6)
               AS xent_bits
    FROM per GROUP BY doc_id
    """,
)
def text_bigram_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained BIGRAM language model scoring — the CCNet-style
    perplexity filter one level up from text_perplexity_proxy's
    unigram model: bigram counts are the trained model, every document
    is scored by its add-one-smoothed cross-entropy
    H = (1/n) Σ [log2(c(w1)+V) − log2(c(w1,w2)+1)], and high-entropy
    (model-surprising) documents are the filter's cut candidates.

    Plan: bigrams come from a shuffle-free array transform over the
    token split (no window function — position pairing happens inside
    the row); training is two count aggregates (the model IS the
    count tables); scoring joins each bigram against the
    vocabulary-sized counts (Zipf keeps them small, AQE broadcasts
    while they fit) plus one broadcast 1-row vocabulary scalar.
    Engine exactness: log2 is taken of INTEGER counts only, snapped
    to nano-bits int64 before the order-free per-doc sum, one float
    division at the end (the proven text_perplexity_proxy pattern)."""
    d = load_spread(spark, sf_dir, "documents")
    # guard single-token docs: sequence(0, -1) would DESCEND in Spark
    # and fabricate a phantom (w0, NULL) bigram that pollutes c1
    bg = (
        d.where(F.size(F.split("text", " ")) >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(split(text, ' ')) - 2),"
                    " i -> struct(split(text, ' ')[i] AS w1,"
                    "             split(text, ' ')[i + 1] AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    # r14: the model tables come from ONE bigram pass — c2 is the
    # (w1, w2) count aggregate (bigram-type-bounded: Zipf keeps it far
    # below the token stream), materialized once; c1 is its per-w1
    # rollup (Σ_w2 c2(w1,w2) ≡ count of bigrams starting at w1), so
    # the before-plan's second full explode+aggregate over the corpus
    # disappears.  Scoring still streams the bigrams once.
    c2 = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
        .localCheckpoint()
    )
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vsz = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .agg(F.countDistinct("term").alias("vsz"))
    )
    per = (
        bg.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(vsz))
        .select(
            "doc_id",
            F.round(
                (
                    F.log2((F.col("c1") + F.col("vsz")).cast("double"))
                    - F.log2((F.col("c2") + 1).cast("double"))
                )
                * 1e9
            )
            .cast("long")
            .alias("nano"),
        )
    )
    return per.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(
            F.sum("nano").cast("double") / 1e9 / F.count(F.lit(1)), 6
        ).alias("xent_bits"),
    )


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", table A1)
# ---------------------------------------------------------------------------

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000


@query(
    "text_gopher_rules",
    oracle=f"""
    WITH w AS (
        SELECT doc_id,
               string_split(text, ' ') AS words,
               (length(text) - length(replace(text, '#', '')))
                 + (length(text) - length(replace(text, '...', ''))) // 3
                   AS n_symbols
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               len(words) AS n_words,
               list_sum(list_transform(words, x -> length(x))) AS sum_len,
               len(list_filter(words,
                               x -> regexp_matches(x, '[A-Za-z]')))
                   AS n_alpha_words,
               len(list_intersect(words,
                   ['the','be','to','of','and','that','have','with']))
                   AS n_stopwords,
               n_symbols
        FROM w
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           round(CAST(sum_len AS DOUBLE) / n_words, 4) AS mean_word_len,
           round(CAST(n_alpha_words AS DOUBLE) / n_words, 4)
               AS frac_alpha_words,
           CAST(n_stopwords AS BIGINT) AS n_stopwords,
           CAST(n_symbols AS BIGINT) AS n_symbols,
           CAST(n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
                AND sum_len >= 3 * n_words AND sum_len <= 10 * n_words
                AND 5 * n_alpha_words >= 4 * n_words
                AND n_stopwords >= 2
                AND 10 * n_symbols <= n_words AS INT) AS passes
    FROM m
    """,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition-free quality rules (Rae et al. 2021 A1) as a
    single columnar pass: word-count bounds, mean word length in
    [3, 10], >=80% words containing a letter, >=2 of the 8 canonical
    stop words, and symbol(#/ellipsis)-to-word ratio <= 0.1.

    Every RULE comparison is integer-only (sum_len >= 3*n_words
    instead of sum_len/n_words >= 3.0, 10*n_symbols <= n_words instead
    of ratio <= 0.1), so the pass flag can never flip on float
    last-bit drift between engines; the reported ratios are display
    columns, one rounded division each.  100 TB: pure map-side
    expressions over the text column — no shuffle, no UDF, prunes to
    (doc_id, text) at the scan."""
    d = load_spread(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    stop_arr = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    m = d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.expr(
            "aggregate(transform(split(text, ' '), x -> length(x) + 0L),"
            " 0L, (a, x) -> a + x)"
        ).alias("sum_len"),
        F.expr(
            "size(filter(split(text, ' '), x -> x rlike '[A-Za-z]'))"
        ).alias("n_alpha_words"),
        F.expr(
            f"size(array_intersect(split(text, ' '), array({stop_arr})))"
        ).alias("n_stopwords"),
        (
            (F.length("text") - F.length(F.regexp_replace("text", "#", "")))
            + F.expr(
                "(length(text) - length(replace(text, '...', ''))) DIV 3"
            )
        ).alias("n_symbols"),
    )
    passes = (
        F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & (F.col("sum_len") >= 3 * F.col("n_words"))
        & (F.col("sum_len") <= 10 * F.col("n_words"))
        & (5 * F.col("n_alpha_words") >= 4 * F.col("n_words"))
        & (F.col("n_stopwords") >= 2)
        & (10 * F.col("n_symbols") <= F.col("n_words"))
    )
    return m.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        F.round(F.col("sum_len").cast("double") / F.col("n_words"), 4).alias(
            "mean_word_len"
        ),
        F.round(
            F.col("n_alpha_words").cast("double") / F.col("n_words"), 4
        ).alias("frac_alpha_words"),
        F.col("n_stopwords").cast("long").alias("n_stopwords"),
        F.col("n_symbols").cast("long").alias("n_symbols"),
        passes.cast("int").alias("passes"),
    )


# ---------------------------------------------------------------------------
# CCNet-style LM quality buckets (Wenzek et al. 2020: corpora are split
# into head/middle/tail terciles by LM perplexity; training mixes
# sample by bucket)
# ---------------------------------------------------------------------------

LM_N_BUCKETS = 3


@query(
    "text_lm_quality_buckets",
    oracle=f"""
    WITH arrs AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    bg AS (
        SELECT doc_id, t[i.i + 1] AS w1, t[i.i + 2] AS w2
        FROM arrs, LATERAL (SELECT unnest(range(len(t) - 1)) AS i) i
        WHERE len(t) >= 2
    ),
    c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
    v AS (
        SELECT count(DISTINCT u.term) AS vsz
        FROM (SELECT unnest(string_split(text, ' ')) AS term
              FROM documents) u
    ),
    per AS (
        SELECT bg.doc_id,
               CAST(round((log2((c1.c1 + v.vsz)::DOUBLE)
                           - log2((c2.c2 + 1)::DOUBLE)) * 1e9)
                    AS BIGINT) AS nano
        FROM bg
        JOIN c2 USING (w1, w2)
        JOIN c1 USING (w1)
        CROSS JOIN v
    ),
    docs AS (
        SELECT doc_id,
               CAST(round(CAST(sum(nano) AS DOUBLE) / 1e9 / count(*) * 1e6)
                    AS BIGINT) AS micro
        FROM per GROUP BY doc_id
    ),
    bucketed AS (
        SELECT doc_id, micro,
               ntile({LM_N_BUCKETS}) OVER (ORDER BY micro, doc_id) AS bucket
        FROM docs
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           count(*) AS n_docs,
           round(CAST(sum(micro) AS DOUBLE) / 1e6 / count(*), 6)
               AS avg_xent_bits,
           round(CAST(min(micro) AS DOUBLE) / 1e6, 6) AS min_xent_bits,
           round(CAST(max(micro) AS DOUBLE) / 1e6, 6) AS max_xent_bits
    FROM bucketed GROUP BY bucket
    """,
)
def text_lm_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality bucketing: every document's bigram-LM
    cross-entropy (text_bigram_lm_scores) is terciled into
    head/middle/tail by a single NTILE over (score, doc_id) — the
    downstream sampler draws by bucket.  Per-bucket stats pin the cut
    points into the driver hash.

    Exactness: per-doc scores are snapped to integer MICRO-bits before
    the window (the 6dp the scorer already rounds to), so both the
    NTILE order and every aggregate are integer-exact; each reported
    stat is one final double division.  100 TB: the global NTILE is
    the one ordered exchange (score + id only — 16 bytes/doc); at
    petabyte doc counts the same cut comes from approx percentiles on
    the score column (events_approx_quantiles is that path)."""
    from pyspark.sql.window import Window

    scores = text_bigram_lm_scores(spark, sf_dir).select(
        "doc_id",
        F.round(F.col("xent_bits") * 1e6).cast("long").alias("micro"),
    )
    w = Window.orderBy("micro", "doc_id")
    b = scores.withColumn("bucket", F.ntile(LM_N_BUCKETS).over(w))
    return b.groupBy(F.col("bucket").cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum("micro").cast("double") / 1e6 / F.count(F.lit(1)), 6
        ).alias("avg_xent_bits"),
        F.round(F.min("micro").cast("double") / 1e6, 6).alias("min_xent_bits"),
        F.round(F.max("micro").cast("double") / 1e6, 6).alias("max_xent_bits"),
    )


# ---------------------------------------------------------------------------
# Inverted index build (the retrieval-side artifact of a text corpus)
# ---------------------------------------------------------------------------

INVIDX_TOP_TERMS = 50


@query(
    "text_inverted_index",
    oracle=f"""
    WITH postings AS (
        SELECT term, doc_id, count(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents)
        GROUP BY term, doc_id
    ),
    tops AS (
        SELECT term, doc_id AS top_doc_id, tf AS max_tf,
               row_number() OVER (PARTITION BY term
                                  ORDER BY tf DESC, doc_id) AS rr
        FROM postings
    ),
    terms AS (
        SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf
        FROM postings GROUP BY term
    ),
    ranked AS (
        SELECT t.term, t.df, t.cf, p.top_doc_id, p.max_tf,
               row_number() OVER (ORDER BY t.df DESC, t.term) AS r
        FROM terms t JOIN tops p ON p.term = t.term AND p.rr = 1
    )
    SELECT term, df, cf,
           CAST(top_doc_id AS BIGINT) AS top_doc_id,
           CAST(max_tf AS BIGINT) AS max_tf
    FROM ranked WHERE r <= {INVIDX_TOP_TERMS}
    """,
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build — the (term -> postings) artifact behind
    BM25/keyword retrieval, materialized as per-term statistics: df
    (documents containing the term), cf (total occurrences), and the
    strongest posting (argmax tf, ties to the smallest doc_id).  The
    probe emits the {INVIDX_TOP_TERMS} highest-df terms so the driver
    hash pins the head of the index.

    Plan: explode -> (term, doc) count -> term rollup — two exchanges,
    both on keys whose cardinality is vocabulary/postings-bounded, and
    the full posting table is the natural bucketed-write candidate
    (bucketBy(term) serves every subsequent term lookup shuffle-free,
    plans/bucketing.py).  The argmax rides max_by with an explicit
    (tf, -doc_id) composite so Spark and the oracle agree on ties
    without relying on either engine's unspecified first-wins."""
    d = load_spread(spark, sf_dir, "documents")
    postings = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    from pyspark.sql.window import Window

    # r14: the per-term stats (df, cf) and the argmax posting come out
    # of ONE term-partitioned window pass — before, the rollup and the
    # row_number window each re-ran the explode + (term, doc)
    # aggregate and met again in a join (2 corpus passes + a join ->
    # 1 pass, no join).  Same exchange key, so the rank window and the
    # whole-partition aggregate windows share a single shuffle+sort.
    wt = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    wp = Window.partitionBy("term")
    terms = (
        postings.select(
            "term",
            F.col("doc_id").alias("top_doc_id"),
            F.col("tf").cast("long").alias("max_tf"),
            F.row_number().over(wt).alias("rr"),
            F.count(F.lit(1)).over(wp).alias("df"),
            F.sum("tf").over(wp).cast("long").alias("cf"),
        )
        .where(F.col("rr") == 1)
    )
    w = Window.orderBy(F.desc("df"), F.asc("term"))
    return (
        terms.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= INVIDX_TOP_TERMS)
        .select(
            "term",
            "df",
            "cf",
            F.col("top_doc_id").cast("long").alias("top_doc_id"),
            "max_tf",
        )
    )


# ---------------------------------------------------------------------------
# BM25 keyword retrieval (Robertson-Spärck Jones / Okapi BM25)
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10
# The query is data-derived so it exists at every scale factor: the
# three terms ranked 10-12 by (df DESC, term) — mid-frequency enough
# to discriminate, frequent enough to hit many docs.
BM25_QUERY_RANKS = (10, 11, 12)


@query(
    "text_bm25_search",
    oracle=f"""
    WITH postings AS (
        SELECT term, doc_id, count(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents)
        GROUP BY term, doc_id
    ),
    dl AS (
        SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
    ),
    stats AS (
        SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl
    ),
    terms AS (
        SELECT term, count(*) AS df,
               row_number() OVER (ORDER BY count(*) DESC, term) AS r
        FROM postings GROUP BY term
    ),
    qterms AS (
        SELECT term, df FROM terms
        WHERE r IN ({", ".join(str(r) for r in BM25_QUERY_RANKS)})
    ),
    scored AS (
        SELECT p.doc_id,
               CAST(round(
                   ln((s.n_docs - q.df + 0.5) / (q.df + 0.5) + 1.0)
                   * (p.tf * ({BM25_K1} + 1.0))
                   / (p.tf + {BM25_K1} * (1.0 - {BM25_B}
                      + {BM25_B} * d.dl * s.n_docs / CAST(s.sum_dl AS DOUBLE)))
                   * 1e9) AS BIGINT) AS nano
        FROM postings p
        JOIN qterms q USING (term)
        JOIN dl d USING (doc_id)
        CROSS JOIN stats s
    ),
    ranked AS (
        SELECT doc_id,
               count(*) AS n_terms_hit,
               round(CAST(sum(nano) AS DOUBLE) / 1e9, 6) AS bm25,
               row_number() OVER (ORDER BY sum(nano) DESC, doc_id) AS rnk
        FROM scored GROUP BY doc_id
    )
    SELECT doc_id, n_terms_hit, bm25, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= {BM25_TOPK}
    """,
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 retrieval over the corpus for a 3-term keyword query
    (terms data-derived: df-ranks 10-12, so the probe exists at any
    scale factor): idf = ln((N - df + ½)/(df + ½) + 1) — the Lucene
    +1 form, always positive — with k1=1.2, b=0.75 length
    normalization.  Top-10 docs with per-doc hit counts.

    Engine exactness: every per-(term, doc) score is a deterministic
    scalar of integers (tf, df, dl, N, Σdl) snapped to nano-units
    BEFORE the per-doc sum (integer addition is order-free where float
    summation is not — the text_perplexity_proxy discipline), and the
    top-k orders by (nano sum, doc_id).  Plan: the postings/doc-length
    tables are the inverted-index build (text_inverted_index) reused;
    the query-term semi-join keeps the scored relation at
    |qterms| × df rows — retrieval cost scales with posting-list
    length, not corpus size; the 1-row corpus stats ride a broadcast."""
    from pyspark.sql.window import Window

    d = load_spread(spark, sf_dir, "documents")
    postings = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # r14: doc lengths are 2 ints per doc — materialize once and share
    # between the corpus stats and the scoring join (both consumed it
    # via separate scan+split subtrees before; the broadcast side also
    # paid a pointless load_spread round-robin).  4 corpus scans -> 3.
    dl = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("dl"))
        .localCheckpoint()
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    wt = Window.orderBy(F.desc("df"), F.asc("term"))
    # df straight from an in-row distinct (r14): one explode + ONE
    # term-keyed aggregate replaces the chained (term, doc) -> term
    # double aggregate — array_distinct dedupes within the row, so
    # counting occurrences IS the document frequency.
    qterms = (
        d.select(
            F.explode(F.array_distinct(F.split("text", " "))).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn("r", F.row_number().over(wt))
        .where(F.col("r").isin(*BM25_QUERY_RANKS))
        .select("term", "df")
    )
    k1, b = BM25_K1, BM25_B
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    norm = F.col("tf") + k1 * (
        1.0
        - b
        + b * F.col("dl") * F.col("n_docs") / F.col("sum_dl").cast("double")
    )
    scored = (
        postings.join(F.broadcast(qterms), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(idf * (F.col("tf") * (k1 + 1.0)) / norm * 1e9)
            .cast("long")
            .alias("nano"),
        )
    )
    wr = Window.orderBy(F.desc("nano_sum"), F.asc("doc_id"))
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms_hit"),
            F.sum("nano").alias("nano_sum"),
        )
        .withColumn("rnk", F.row_number().over(wr))
        .where(F.col("rnk") <= BM25_TOPK)
        .select(
            "doc_id",
            "n_terms_hit",
            F.round(F.col("nano_sum").cast("double") / 1e9, 6).alias("bm25"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


# ---------------------------------------------------------------------------
# Python UDTF surface: lateral word-window chunker
# ---------------------------------------------------------------------------

UDTF_CHUNK_WORDS = 16


@query(
    "text_chunk_udtf",
    # W interpolated from UDTF_CHUNK_WORDS so the oracle cannot drift
    # from the UDTF when the window size is tuned
    oracle=f"""
    WITH ls AS (
        SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w
        FROM documents
    ),
    ix AS (
        SELECT doc_id, w,
               unnest(range(1, CAST(ceil(len(w) / {UDTF_CHUNK_WORDS}.0)
                                    AS BIGINT) + 1)) AS chunk_idx
        FROM ls
    ),
    s AS (
        SELECT chunk_idx,
               length(array_to_string(
                   list_slice(w, (chunk_idx - 1) * {UDTF_CHUNK_WORDS} + 1,
                              chunk_idx * {UDTF_CHUNK_WORDS}),
                   ' ')) AS n_chars,
               len(list_slice(w, (chunk_idx - 1) * {UDTF_CHUNK_WORDS} + 1,
                              chunk_idx * {UDTF_CHUNK_WORDS}))
                   AS n_tokens
        FROM ix
    )
    SELECT CAST(chunk_idx AS BIGINT)          AS chunk_idx,
           count(*)                           AS n_chunks,
           CAST(sum(n_chars) AS BIGINT)       AS total_chars,
           CAST(sum(n_tokens) AS BIGINT)      AS total_tokens
    FROM s GROUP BY 1 ORDER BY 1
    """,
)
def text_chunk_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (Spark 4 user-defined TABLE function):
    explode each document into fixed 16-word training windows with a
    LATERAL-joined, Arrow-optimized UDTF, then profile window position
    (how many documents reach window i; chars/tokens at that depth).

    This query exists to exercise the ``@udtf(... useArrow=True)`` +
    ``LATERAL`` API surface — the one row-expanding extension point
    the engine hadn't covered (scalar pandas_udf: bloom; grouped:
    applyInPandas dedup/ANN; stream-stateful: applyInPandasWithState;
    mapInPandas: the XML/media planes).  For production chunking the
    engine's scale path remains the pure-columnar
    ``corpus_chunk_windows`` (split/slice/posexplode stay JVM-side);
    this is the escape hatch for chunkers whose logic genuinely needs
    Python (a real tokenizer, sentence models).  The plan shows
    ``ArrowEvalPythonUDTF`` — per-BATCH Arrow transfer, not per-row
    pickling — feeding a partial-aggregated groupBy on chunk_idx, so
    each document crosses the Python boundary exactly once and the
    exchange carries only ~max-window-count keys.

    Engine exactness: tokens are the single-space split on both sides
    (consecutive spaces yield empty tokens identically; Python
    ``str.split(' ')`` == DuckDB ``string_split``); chunk chars are
    the length of the space-rejoined window (Python ``' '.join`` ==
    DuckDB ``array_to_string``); all aggregates are pure int64 sums."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="chunk_idx: bigint, n_chars: bigint, n_tokens: bigint",
        useArrow=True,
    )
    class ChunkWindows:
        def eval(self, text):
            # r15 (guide §4.2 batch-local work): chunk chars come from
            # the word-length vector — len(" ".join(w)) for n words is
            # exactly sum(len) + (n-1) separators — so no per-chunk
            # joined string is ever allocated; the words list is split
            # once and only its length vector is re-sliced.
            lens = [len(x) for x in (text or "").split(" ")]
            W = UDTF_CHUNK_WORDS
            for i in range(0, len(lens), W):
                cl = lens[i : i + W]
                yield i // W + 1, sum(cl) + len(cl) - 1, len(cl)

    spark.udtf.register("chunk_windows", ChunkWindows)
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    split = spark.sql(
        "SELECT s.* FROM {d} d, LATERAL chunk_windows(d.text) s", d=d
    )
    return (
        split.groupBy("chunk_idx")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("chunk_idx")
    )


# ---------------------------------------------------------------------------
# r8: PMI collocations + character-script profile
# ---------------------------------------------------------------------------

PMI_MIN_PAIR = 5  # min bigram count: PMI of rare pairs is pure noise


@query(
    "text_pmi_collocations",
    oracle=f"""
    WITH arrs AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    bg AS (
        SELECT t[i.i + 1] AS w1, t[i.i + 2] AS w2
        FROM arrs, LATERAL (SELECT unnest(range(len(t) - 1)) AS i) i
        WHERE len(t) >= 2
    ),
    c2 AS (SELECT w1, w2, count(*) AS cab FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1 AS w, count(*) AS ca FROM bg GROUP BY w1),
    cr AS (SELECT w2 AS w, count(*) AS cb FROM bg GROUP BY w2),
    n AS (SELECT count(*) AS nb FROM bg)
    SELECT c2.w1, c2.w2, c2.cab,
           round(ln(CAST(c2.cab AS DOUBLE)) + ln(CAST(n.nb AS DOUBLE))
                 - ln(CAST(c1.ca AS DOUBLE)) - ln(CAST(cr.cb AS DOUBLE)),
                 6) AS pmi
    FROM c2
    JOIN c1 ON c1.w = c2.w1
    JOIN cr ON cr.w = c2.w2
    CROSS JOIN n
    WHERE c2.cab >= {PMI_MIN_PAIR}
    ORDER BY pmi DESC, c2.w1, c2.w2
    LIMIT 25
    """,
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining (Church & Hanks 1990, "Word Association
    Norms, Mutual Information, and Lexicography"): top-25 adjacent
    word pairs by pointwise mutual information,
    PMI = ln(c(a,b)·N / (c₁(a)·c₂(b))) over the
    corpus bigram table (N = total bigrams; left/right marginals kept
    separate, the textbook estimator).  High-PMI pairs are the
    multi-word expressions a tokenizer or phrase-merge pass should
    treat as units.

    Plan: the same shuffle-free array-transform bigram formation as
    text_bigram_lm_scores, then three vocabulary-bounded count
    aggregates (pair + two marginals); the pair table joins its
    marginals on Zipf-small keys (AQE broadcasts while they fit) plus
    one broadcast 1-row N scalar; min-count {PMI_MIN_PAIR} prunes the
    rare-pair tail BEFORE the joins, and top-25 is TakeOrdered.
    Engine exactness: ln() of INTEGER counts only, four libm calls and
    one round(·, 6) — additions of exactly-representable libm outputs,
    no order-dependent summation."""
    d = load_spread(spark, sf_dir, "documents")
    bg = (
        d.where(F.size(F.split("text", " ")) >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(split(text, ' ')) - 2),"
                    " i -> struct(split(text, ' ')[i] AS w1,"
                    "             split(text, ' ')[i + 1] AS w2))"
                )
            ).alias("b"),
        )
        .select("b.w1", "b.w2")
    )
    # r14: ONE bigram pass — the unfiltered pair-count table is
    # bigram-type-bounded (Zipf), materialized once, and BOTH
    # marginals plus the N scalar are its integer rollups
    # (Σ_w2 c(a,·) ≡ count of bigrams starting at a, etc. — bit-exact
    # int sums).  The before-plan re-ran the corpus explode four
    # times (pair counts, two marginals, total).
    c2u = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cab"))
        .localCheckpoint()
    )
    c2 = c2u.where(F.col("cab") >= PMI_MIN_PAIR)
    c1 = c2u.groupBy("w1").agg(F.sum("cab").alias("ca"))
    cr = c2u.groupBy("w2").agg(F.sum("cab").alias("cb"))
    n = c2u.agg(F.sum("cab").alias("nb"))
    pmi = F.round(
        F.log(F.col("cab").cast("double"))
        + F.log(F.col("nb").cast("double"))
        - F.log(F.col("ca").cast("double"))
        - F.log(F.col("cb").cast("double")),
        6,
    )
    return (
        c2.join(c1, "w1")
        .join(cr, "w2")
        .crossJoin(F.broadcast(n))
        .select("w1", "w2", "cab", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(25)
    )


# char classes profiled per language; CJK range mirrors lang_scores
_SCRIPT_CLASSES = [
    ("latin", "[A-Za-z]", "[A-Za-z]"),
    ("digit", "[0-9]", "[0-9]"),
    ("space", "[ ]", "[ ]"),
    ("cjk", "[\\u4e00-\\u9fff]", "[\\x{4e00}-\\x{9fff}]"),
]


@query(
    "text_script_profile",
    oracle=f"""
    WITH per AS (
        SELECT lang, length(text) AS n,
    {",".join(
        f"           length(text) - length(regexp_replace(text, '{dk}', '', 'g')) AS c_{name}"
        for name, _, dk in _SCRIPT_CLASSES
    )}
        FROM documents
    )
    SELECT lang,
           count(*)                 AS n_docs,
           CAST(sum(n) AS BIGINT)   AS n_chars,
    {",".join(
        f"       round(CAST(sum(c_{name}) AS DOUBLE) / sum(n), 6) AS frac_{name}"
        for name, _, _ in _SCRIPT_CLASSES
    )},
           round(CAST(sum(n {"".join(f" - c_{name}" for name, _, _ in _SCRIPT_CLASSES)})
                 AS DOUBLE) / sum(n), 6) AS frac_other
    FROM per GROUP BY lang
    """,
)
def text_script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-script profile per language: the fraction of Latin,
    digit, space, CJK and other codepoints — the writing-system audit
    a multilingual corpus runs before trusting its lang labels (a
    'de' shard full of CJK is a mislabeled crawl), and the cheap
    precursor signal to the stopword lang-id (text_lang_id).

    Plan: pure columnar regexp_replace length deltas — zero joins,
    zero extra shuffles beyond the per-lang aggregate (a handful of
    groups); integer char counts all the way, one double division per
    fraction at the end.  Mirrored char classes: Spark (Java regex)
    and DuckDB (RE2) spell the CJK range differently but denote the
    same codepoints."""
    d = load(spark, sf_dir, "documents")
    per = d.select(
        "lang",
        F.length("text").alias("n"),
        *[
            (
                F.length("text")
                - F.length(F.regexp_replace("text", jk, ""))
            ).alias(f"c_{name}")
            for name, jk, _ in _SCRIPT_CLASSES
        ],
    )
    n_sum = F.sum("n")
    other = F.sum(
        F.col("n") - sum(F.col(f"c_{name}") for name, _, _ in _SCRIPT_CLASSES)
    )
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        n_sum.alias("n_chars"),
        *[
            F.round(
                F.sum(f"c_{name}").cast("double") / n_sum, 6
            ).alias(f"frac_{name}")
            for name, _, _ in _SCRIPT_CLASSES
        ],
        F.round(other.cast("double") / n_sum, 6).alias("frac_other"),
    )


# ---------------------------------------------------------------------------
# Tokenizer vocabulary budgeting: coverage curve over term frequencies
# ---------------------------------------------------------------------------

VOCAB_BUDGETS = [4, 8, 16, 32]


@query(
    "text_vocab_coverage",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
        SELECT term, count(*) AS cnt FROM toks GROUP BY term
    ),
    top AS (
        SELECT term, cnt,
               row_number() OVER (ORDER BY cnt DESC, term) AS rnk
        FROM tf
        ORDER BY cnt DESC, term
        LIMIT {max(VOCAB_BUDGETS)}
    ),
    total AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_tokens FROM tf),
    budgets AS (
        SELECT CAST(unnest({VOCAB_BUDGETS}) AS BIGINT) AS vocab_budget
    )
    SELECT b.vocab_budget,
           CAST(count(*) AS BIGINT)   AS n_terms_used,
           CAST(sum(t.cnt) AS BIGINT) AS covered_tokens,
           total.total_tokens,
           round(sum(t.cnt) / CAST(total.total_tokens AS DOUBLE), 6)
               AS coverage
    FROM budgets b
    JOIN top t ON t.rnk <= b.vocab_budget
    CROSS JOIN total
    GROUP BY b.vocab_budget, total.total_tokens
    ORDER BY b.vocab_budget
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: for each candidate vocab budget, the
    corpus token share covered by the top-k most frequent terms (ties
    broken by term) — the tokenizer-design question behind every BPE
    vocab-size choice ("how big must the vocabulary be before the
    OOV/byte-fallback rate is acceptable"), answered straight off the
    corpus before any tokenizer training run.  Complements
    text_zipf_spectrum (the frequency LAW) with the budgeted
    cumulative view (the planning number: 1 − coverage = fallback
    rate at that budget).

    Plan shape: the corpus-scale work is one explode + term groupBy
    (the text_top_terms exchange); everything after operates on
    BOUNDED relations — the top-max(budget) cut plans as
    TakeOrderedAndProject (per-partition heaps, k rows to the
    driver, never a vocabulary-wide sort even at a 1e8-term real
    vocabulary), the rank window runs over those ≤{max-budget} rows,
    the corpus-total is a 1-row scalar crossed on (the
    text_tfidf_topk idf shape), and the budget join is a 4-row
    broadcast.  All counts are int64; coverage is the single
    end-of-plan double division."""
    from pyspark.sql.window import Window

    from ..session import local_rows_df

    d = load_spread(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = (
        tf.orderBy(F.desc("cnt"), F.asc("term"))
        .limit(max(VOCAB_BUDGETS))
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.desc("cnt"), F.asc("term"))
            ),
        )
    )
    # Σcnt over tf == the corpus token count, so the total comes from
    # a plain document-scan aggregate — no second term-keyed exchange
    total = d.select(
        F.size(F.split("text", " ")).alias("n_tok")
    ).agg(F.sum("n_tok").cast("long").alias("total_tokens"))
    budgets = local_rows_df(
        spark,
        [(b,) for b in VOCAB_BUDGETS],
        "vocab_budget long",
    )
    return (
        F.broadcast(budgets)
        .join(top, F.col("rnk") <= F.col("vocab_budget"))
        .crossJoin(F.broadcast(total))
        .groupBy("vocab_budget", "total_tokens")
        .agg(
            F.count(F.lit(1)).alias("n_terms_used"),
            F.sum("cnt").cast("long").alias("covered_tokens"),
        )
        .select(
            "vocab_budget",
            "n_terms_used",
            "covered_tokens",
            "total_tokens",
            F.round(
                F.col("covered_tokens")
                / F.col("total_tokens").cast("double"),
                6,
            ).alias("coverage"),
        )
        .orderBy("vocab_budget")
    )
