"""Text analysis operators for training-data pipelines.

Beyond the reference's surface (north-star extension): language ID
(stopword-hit heuristic), quality scoring (length / uniqueness / stopword
ratios), token counting, and document fingerprinting. Everything is
built-in-function Spark (JVM codegen, no UDFs) so it runs at corpus scale —
tokenization is one `split`, ratios are single IEEE ops, fingerprints are
`md5`. Where the DuckDB oracle needs the same semantics, the scalar
expressions are written in dialect-common SQL (see LANG_STOPWORDS /
quality-score formula) so both engines evaluate the identical tree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small per-language stopword sets for the n-gram/stopword-hit heuristic.
# Fixed priority order for deterministic argmax tie-breaking.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "is", "in"),
    "de": ("der", "die", "und", "das", "ist", "ein"),
    "es": ("el", "la", "de", "que", "los", "una"),
    "fr": ("le", "les", "et", "des", "une", "est"),
    "zh": ("的", "是", "了", "在"),
}
LANG_ORDER = tuple(LANG_STOPWORDS)


def tokens(col: str = "text") -> Column:
    """Whitespace tokenization (single split — the hot-path tokenizer; a
    BPE-ish regex variant is `tokens_regex`)."""
    return F.split(F.col(col), " ")


def tokens_regex(col: str = "text") -> Column:
    """BPE-ish tokenization: words / numbers / single punctuation, matching
    the common pre-tokenizer shape."""
    return F.expr(rf"regexp_extract_all({col}, '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)")


def with_token_stats(df: DataFrame, col: str = "text") -> DataFrame:
    """n_tokens, n_chars, avg token length, unique-token ratio."""
    t = tokens(col)
    return (
        df.withColumn("n_tokens", F.size(t))
        .withColumn("n_chars", F.length(F.col(col)))
        .withColumn(
            "avg_token_len",
            F.length(F.replace(F.col(col), F.lit(" "), F.lit(""))) / F.size(t),
        )
        .withColumn("unique_ratio", F.size(F.array_distinct(t)) / F.size(t))
    )


def stopword_hits(col_tokens: Column, stopwords: tuple[str, ...]) -> Column:
    """Number of tokens (with multiplicity) in the stopword set."""
    return F.size(F.filter(col_tokens, lambda x: x.isin(*stopwords)))


def with_lang_scores(df: DataFrame, col: str = "text") -> DataFrame:
    t = tokens(col)
    for lang, sw in LANG_STOPWORDS.items():
        df = df.withColumn(f"score_{lang}", stopword_hits(t, sw))
    return df


def lang_id(df: DataFrame, col: str = "text", out: str = "pred_lang") -> DataFrame:
    """Predicted language = argmax stopword hits, ties broken by the fixed
    LANG_ORDER priority (deterministic, oracle-parity)."""
    scored = with_lang_scores(df, col)
    expr = None
    for lang in LANG_ORDER:
        cond = None
        for other in LANG_ORDER:
            c = F.col(f"score_{lang}") >= F.col(f"score_{other}")
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return scored.withColumn(out, expr)


def quality_score(df: DataFrame, col: str = "text", out: str = "quality") -> DataFrame:
    """Composite quality score in [0,1]:
    0.4*unique_ratio + 0.3*stopword_ratio_en + 0.3*min(n_tokens/100, 1).
    Fixed-order double arithmetic — the oracle evaluates the same tree."""
    t = tokens(col)
    stats = with_token_stats(df, col)
    sw_ratio = stopword_hits(t, LANG_STOPWORDS["en"]) / F.size(t)
    return stats.withColumn("stopword_ratio", sw_ratio).withColumn(
        out,
        F.lit(0.4) * F.col("unique_ratio")
        + F.lit(0.3) * F.col("stopword_ratio")
        + F.lit(0.3) * F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0)),
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals per document (public Rae et al. 2021
    quality rules, adapted to word n-grams):

    - ``dup_token_frac``: 1 - distinct/total tokens (word-level repetition),
    - ``top_2gram_char_frac`` / ``top_3gram_char_frac``: fraction of the
      document's characters covered by its single most frequent word
      2-/3-gram (count × gram length / n_chars).

    Scale shape: the fractions are two explode → (doc, gram) count →
    per-doc max aggregations — both map-side combinable, keyed by doc id,
    joined back on doc id. No UDFs, no quadratic step; gram cardinality is
    bounded by corpus token count, exactly like the shingle relation the
    dedup family already shuffles.
    """
    from incremental_data_pipeline_spark.functions.util import fan_out
    from incremental_data_pipeline_spark.operators.dedup import shingles

    t = tokens(text_col)
    base = fan_out(df).select(
        id_col,
        F.length(F.col(text_col)).alias("n_chars"),
        (
            F.lit(1.0)
            - F.size(F.array_distinct(t)).cast("double") / F.size(t)
        ).alias("dup_token_frac"),
        F.col(text_col),
    )

    def top_gram_chars(n: int, out: str) -> DataFrame:
        g = base.select(id_col, F.explode(shingles(text_col, n)).alias("g"))
        return (
            g.groupBy(id_col, "g")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .groupBy(id_col)
            .agg(F.max(F.col("cnt") * F.length("g")).alias(out))
        )

    return (
        base.drop(text_col)
        .join(top_gram_chars(2, "top2_chars"), id_col, "left")
        .join(top_gram_chars(3, "top3_chars"), id_col, "left")
        .select(
            id_col,
            "n_chars",
            "dup_token_frac",
            (F.col("top2_chars").cast("double") / F.col("n_chars")).alias(
                "top_2gram_char_frac"
            ),
            (F.col("top3_chars").cast("double") / F.col("n_chars")).alias(
                "top_3gram_char_frac"
            ),
        )
    )


def gopher_repetition_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_token_frac: float = 0.6,
    max_top2_frac: float = 0.20,
    max_top3_frac: float = 0.18,
) -> DataFrame:
    """repetition_stats + the Gopher keep/drop verdict (thresholds from the
    published rules: top-2-gram char fraction <= 0.20, top-3-gram <= 0.18;
    the word-repetition cap stands in for the line-dedup rules on corpora
    without line structure). Returns every doc with a ``keep`` boolean so
    downstream can filter OR audit the drop reasons."""
    s = repetition_stats(df, id_col, text_col)
    return s.withColumn(
        "keep",
        (F.col("dup_token_frac") <= max_dup_token_frac)
        & (F.col("top_2gram_char_frac") <= max_top2_frac)
        & (F.col("top_3gram_char_frac") <= max_top3_frac),
    )


def fingerprint(df: DataFrame, col: str = "text", out: str = "fingerprint") -> DataFrame:
    """64-bit-equivalent content fingerprint: md5 of the lowercased text,
    truncated to 16 hex chars. Content-defined, order-independent — the
    join key for exact dedup across shards."""
    return df.withColumn(out, F.substring(F.md5(F.lower(F.col(col))), 1, 16))


def corpus_vocab_topk(
    df: DataFrame, text_col: str = "text", k: int = 20
) -> DataFrame:
    """Corpus-level vocabulary frequencies, top-k (freq desc, token asc for
    a deterministic total order). One explode + one shuffle with map-side
    partial counts; the final top-k is a TakeOrdered, not a full sort —
    scales with vocabulary size, not corpus size."""
    return (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(k)
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int = 56,
) -> DataFrame:
    """Split documents into fixed-size token chunks with overlap
    (chunk_tokens - stride), the context-window prep step for training and
    retrieval indexing. Chunk i covers tokens [i*stride, i*stride +
    chunk_tokens); the last chunk clamps at the document end.

    All array built-ins over the tokenized column — a narrow map with one
    explode, no shuffle, no UDF; chunk identity is an md5 over the joined
    slice so downstream dedup can run per-chunk."""
    from incremental_data_pipeline_spark.functions.util import fan_out

    t = tokens(text_col)
    n_chunks_m1 = F.floor((F.size(t) - F.lit(1)) / F.lit(stride)).cast("int")
    base = fan_out(df).select(
        id_col, t.alias("__t"), F.explode(F.sequence(F.lit(0), n_chunks_m1)).alias("ci")
    )
    chunk = F.slice(F.col("__t"), F.col("ci") * stride + F.lit(1), chunk_tokens)
    return base.select(
        id_col,
        F.col("ci").alias("chunk_idx"),
        F.size(chunk).alias("n_chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
    )


def pack_offsets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 256,
) -> DataFrame:
    """Offset-based sequence packing (concatenate-then-split — how training
    corpora are actually packed): documents are laid end-to-end in id
    order and the token stream is cut into fixed ``seq_len`` sequences;
    each document gets its global ``start_offset`` and the ``seq_id`` its
    first token falls into.

    The global prefix sum uses the same scalable two-phase layout as
    surrogate-key generation (operators/scd.py): range-partition by id,
    partition-local running sums, then per-partition totals (a tiny
    driver-side broadcast) shift each partition — no single-task global
    window, so the layout holds at any corpus size."""
    from pyspark.sql import Window

    toks = df.select(id_col, F.size(tokens(text_col)).alias("n_tokens"))
    parted = toks.repartitionByRange(id_col).withColumn("__pid", F.spark_partition_id())
    wp = (
        Window.partitionBy("__pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    numbered = parted.withColumn("__run", F.sum("n_tokens").over(wp))
    totals = numbered.groupBy("__pid").agg(F.sum("n_tokens").alias("__tot"))
    woff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn("__off", F.coalesce(F.sum("__tot").over(woff), F.lit(0)))
    return (
        numbered.join(F.broadcast(offsets.select("__pid", "__off")), "__pid")
        .select(
            id_col,
            "n_tokens",
            (F.col("__off") + F.col("__run") - F.col("n_tokens"))
            .cast("long")
            .alias("start_offset"),
            F.floor(
                (F.col("__off") + F.col("__run") - F.col("n_tokens")) / F.lit(seq_len)
            )
            .cast("long")
            .alias("seq_id"),
        )
    )


def bigram_coverage(
    docs: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_ref_count: int = 2,
) -> DataFrame:
    """Reference-corpus bigram coverage per document — the integer-exact
    stand-in for LM-based fluency scoring: the fraction of a document's
    word bigrams (with multiplicity) that occur at least ``min_ref_count``
    times in the reference corpus. Low coverage flags out-of-domain or
    garbled text the way a perplexity filter would, but with a score
    (``coverage_milli`` = 1000*known // total) any engine reproduces
    bit-for-bit — no floating-point log-probs.

    Scale shape: the reference collapses to its qualifying-bigram set (one
    combinable count agg) and broadcasts; the document side is one narrow
    explode + map-side join + per-doc count, never shuffled on the gram —
    the same join geometry as decontamination.
    """
    from incremental_data_pipeline_spark.functions.util import fan_out
    from incremental_data_pipeline_spark.operators.dedup import shingles

    ref_grams = (
        fan_out(reference)
        .select(F.explode(shingles(text_col, 2)).alias("__g"))
        .groupBy("__g")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .filter(F.col("__cnt") >= min_ref_count)
        .select("__g")
    )
    doc_grams = fan_out(docs).select(
        id_col, F.explode(shingles(text_col, 2)).alias("__g")
    )
    stats = (
        doc_grams.join(
            F.broadcast(ref_grams.withColumn("__known", F.lit(1))), "__g", "left"
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum(F.coalesce(F.col("__known"), F.lit(0))).cast("long").alias(
                "n_known"
            ),
        )
    )
    return stats.select(
        id_col,
        "n_bigrams",
        "n_known",
        F.expr("(1000 * n_known) div n_bigrams").alias("coverage_milli"),
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 5
) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf (tf * ln(N/df)) —
    the classic keyword/topic signal for corpus exploration and quality
    triage. Ties (equal score from equal (tf, df)) break on token asc so
    the selection is a deterministic total order.

    The raw double score is used for RANKING but not emitted: ln() rounds
    differently in the last ulp across engines (Java Math.log vs libm), so
    only the exact-integer (tf, df, rnk) columns are oracle-comparable.
    Exact score ties come from equal (tf, df) pairs, which every engine
    maps to ITS identical double, so the token-asc tiebreak — and hence
    the ranking — stays engine-consistent.

    Scale shape: term frequency and document frequency are two map-side
    -combinable aggregations over one explode; the document-frequency
    relation is vocabulary-sized (not corpus-sized) and joins back on
    token; N enters as a one-row broadcast. The final top-k is a
    WindowGroupLimit on doc id — k rows per doc survive each stage.
    """
    toks = df.select(id_col, F.explode(tokens(text_col)).alias("token"))
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        toks.distinct().groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    )
    n = df.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.col("tf").cast("double")
            * F.log(F.col("__n").cast("double") / F.col("df").cast("double")),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            id_col,
            "token",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"),
    ("phone", r"\+?[0-9][0-9()\-\s]{7,}[0-9]"),
)


def pii_scrub(
    df: DataFrame, col: str = "text", out: str = "scrubbed"
) -> DataFrame:
    """Redact PII spans (emails, phone-shaped numbers) with typed
    placeholders and count redactions per document — the compliance pass a
    training corpus runs before anything else sees the text.

    Pure regexp_replace/regexp_count built-ins (JVM codegen, no UDF, no
    shuffle); patterns are anchored to ASCII classes shared verbatim with
    the DuckDB oracle so both engines redact identical spans."""
    scrubbed = F.col(col)
    n = F.lit(0).cast("int")
    for name, pat in PII_PATTERNS:
        # regexp_count (not expr-embedded SQL literals): SQL-literal
        # backslash escaping would silently corrupt the pattern.
        n = n + F.regexp_count(F.col(col), F.lit(pat)).cast("int")
        scrubbed = F.regexp_replace(scrubbed, pat, f"[{name.upper()}]")
    return df.withColumn("n_redactions", n).withColumn(out, scrubbed)


def build_postings(
    df: DataFrame, id_col: str = "doc_id", col: str = "text"
) -> DataFrame:
    """Inverted index as a relation: one (term, doc, tf) row per distinct
    term-document pair. Built with one explode + one (term, doc) agg —
    at corpus scale the index is WRITTEN partitioned/bucketed by ``term``
    so a query's scan prunes to exactly the posting lists it touches.
    Document frequency (the rarest-first planning stat) is a groupBy away
    and oracle-checked via `corpus_vocab_topk`."""
    return (
        df.select(F.col(id_col), F.explode(tokens(col)).alias("term"))
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def search_all_terms(
    postings: DataFrame, terms: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """Boolean AND search over the inverted index: documents containing
    EVERY query term, ranked by summed term frequency.

    Scale shape: the `term IN (...)` filter reaches the posting-list scan
    (partition pruning on a term-partitioned index), so only the query
    terms' lists are read; the AND is then one groupBy on the doc id with
    a having-count — cost is the size of the touched posting lists, never
    the corpus. (The classic rarest-first semi-join cascade is this same
    plan with the lists applied in df-order; the single-agg form does it
    in one shuffle.)"""
    hits = postings.filter(F.col("term").isin(*terms))
    return (
        hits.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum("tf").cast("long").alias("relevance"),
        )
        .filter(F.col("n_terms") == len(terms))
        .drop("n_terms")
    )


def token_familiarity(
    df: DataFrame, id_col: str = "doc_id", col: str = "text"
) -> DataFrame:
    """CCNet-style unigram language-model quality proxy: how "familiar" a
    document's vocabulary is relative to the whole corpus. Documents whose
    tokens are mostly corpus-frequent read as fluent/in-distribution;
    low scores flag boilerplate, gibberish, or out-of-domain text — the
    same signal CCNet's wiki-LM perplexity buckets provide, without a
    trained model. (Log-prob sums are fold-order- and libm-dependent
    across engines, so the score is the MEAN CORPUS FREQUENCY of the
    document's tokens: an integer sum with one IEEE divide — bit-identical
    in the DuckDB oracle.)

    Scale shape: one explode → one (term) agg for the corpus counts →
    one join back on term → one (doc) agg. The unigram table is vastly
    smaller than the corpus (Heaps' law) and broadcasts; the doc-side agg
    is map-side combinable. No Python, no window.
    """
    toks = df.select(F.col(id_col), F.explode(tokens(col)).alias("term"))
    freqs = toks.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("cf"))
    return (
        toks.join(F.broadcast(freqs), "term")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("cf").cast("long").alias("sum_cf"),
            (F.sum("cf").cast("double") / F.count(F.lit(1))).alias("familiarity"),
        )
    )


def bm25_rank_per_term(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_terms: int = 10,
    k: int = 5,
) -> DataFrame:
    """Top-k documents per term under BM25 (k1 = 1.2, b = 0.75), computed
    with an INTEGER rank statistic so the ranking is bit-reproducible on
    any engine — the retrieval scorer behind search-based corpus curation
    (and the lexical half of hybrid RAG retrieval).

    For a single term, BM25's idf factor is constant, so ranking reduces
    to the tf-saturation term  tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl)).
    With k1 = 6/5, b = 3/4, avgdl = T/N (T total tokens, N docs), the
    denominator × 10T is the INTEGER  10·T·tf + 3·T + 9·dl·N, giving the
    order-preserving integer statistic

        bm25_micro = (tf · 10·T · 1e6) div (10·T·tf + 3·T + 9·dl·N)

    — one decimal(38,0) multiply-then-div (the pmi_top_cooccurrences
    overflow discipline), monotone in the true score, no log, no float.
    Terms are the ``n_terms`` highest-document-frequency tokens (df desc,
    token asc — the deterministic stress case: the densest posting lists).

    Scale shape: tf and df are map-side-combinable aggs over one explode;
    the per-term top-k is a WindowGroupLimit partitioned by term (k rows
    survive each partial), and the corpus constants (T, N) ride in as a
    one-row broadcast. No posting list is ever self-joined.
    """
    toks = df.select(id_col, F.explode(tokens(text_col)).alias("token"))
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    consts = toks.agg(
        F.count(F.lit(1)).alias("__t"),
        F.count_distinct(id_col).alias("__n"),
    )
    top_terms = (
        toks.distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), F.col("token").asc())
        .limit(n_terms)
    )
    scored = (
        tf.join(F.broadcast(top_terms), "token")
        .join(dl, id_col)
        .crossJoin(F.broadcast(consts))
        .withColumn(
            "bm25_micro",
            F.expr(
                "CAST(tf AS DECIMAL(38,0)) * 10 * __t * 1000000"
                " div (10 * CAST(__t AS DECIMAL(38,0)) * tf"
                "      + 3 * CAST(__t AS DECIMAL(38,0))"
                "      + 9 * CAST(dl AS DECIMAL(38,0)) * __n)"
            ).cast("long"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("token").orderBy(
        F.col("bm25_micro").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "token",
            id_col,
            F.col("tf").cast("long").alias("tf"),
            F.col("dl").cast("long").alias("dl"),
            F.col("df").cast("long").alias("df"),
            "bm25_micro",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def nb_unigram_confusion(
    df: DataFrame,
    labels: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    test_mod: int = 5,
) -> DataFrame:
    """Multinomial Naive Bayes text classifier, trained AND scored in-frame
    (McCallum & Nigam 1998): deterministic hash split (id % test_mod == 0
    is the test fold), word-unigram likelihoods with Laplace smoothing
    ln((c_lw + 1)/(T_l + V)) and class priors ln(n_l / n_train) learned
    from the train fold, argmax posterior per test document, confusion
    matrix (label, pred, n_docs) out.

    Exactness discipline: every ln() is quantized to DECIMAL(18,8) and
    the per-document log-posterior is a DECIMAL sum — fixed-point integer
    arithmetic, so the sum is order-independent and the oracle reproduces
    every score (hence every argmax) bit-for-bit. Ties break to the first
    label in ``labels``. Train-fold scalars (per-class token totals T_l,
    vocabulary size V, class counts) are control-plane sized and embedded
    as INTEGER literals; both engines take ln() of the same integers.

    Scale shape: training is ONE map-side-combined (word × class) count
    (the pivot) — the classic one-pass distributed NB; inference is an
    exploded-token equi-join against the vocab-sized likelihood table
    (broadcast when small) and a per-document decimal sum. No iteration,
    no driver loop over data, no UDFs."""
    toks = F.split(F.col(text_col), " ")
    train = df.filter(F.col(id_col) % test_mod != 0)
    test = df.filter(F.col(id_col) % test_mod == 0)
    tr = train.select(label_col, F.explode(toks).alias("w"))

    # Control-plane scalars (|labels| + 2 numbers), embedded as integers.
    t_l = {
        r[label_col]: r["n"]
        for r in tr.groupBy(label_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_l = {
        r[label_col]: r["n"]
        for r in train.groupBy(label_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # Declared-domain validation: a label with zero train docs would need
    # ln(0) priors — Spark yields NULL where DuckDB yields -inf, so the
    # degenerate configuration is rejected loudly instead of diverging.
    missing = [l for l in labels if n_l.get(l, 0) == 0]
    if missing:
        raise ValueError(
            f"nb_unigram_confusion: declared label(s) {missing} have no "
            f"documents in the train fold; priors would be ln(0)"
        )
    v = tr.select("w").distinct().count()
    n_train = sum(n_l.values())  # == train.count(); zero extra scan jobs

    quant = lambda c: c.cast("decimal(18,8)")  # noqa: E731
    cw = tr.groupBy("w").pivot(label_col, list(labels)).count()
    ll = cw.select(
        "w",
        *[
            quant(
                F.log(
                    (F.coalesce(F.col(f"`{l}`"), F.lit(0)) + F.lit(1)).cast("double")
                    / F.lit(float(t_l.get(l, 0) + v))
                )
            ).alias(f"ll_{i}")
            for i, l in enumerate(labels)
        ],
    )
    unseen = {
        l: quant(F.log(F.lit(1.0) / F.lit(float(t_l.get(l, 0) + v))))
        for l in labels
    }
    prior = {
        l: quant(F.log(F.lit(float(n_l.get(l, 0))) / F.lit(float(n_train))))
        for l in labels
    }
    tt = test.select(id_col, label_col, F.explode(toks).alias("w"))
    j = tt.join(ll, "w", "left")
    sc = j.groupBy(id_col, label_col).agg(
        *[
            (F.sum(F.coalesce(F.col(f"ll_{i}"), unseen[l])) + prior[l]).alias(
                f"s_{i}"
            )
            for i, l in enumerate(labels)
        ]
    )
    case = None
    for i, l in enumerate(labels):
        cond = None
        for k in range(len(labels)):
            c = F.col(f"s_{i}") >= F.col(f"s_{k}")
            cond = c if cond is None else (cond & c)
        case = (
            F.when(cond, F.lit(l)) if case is None else case.when(cond, F.lit(l))
        )
    pred = sc.select(label_col, case.alias("pred"))
    return pred.groupBy(label_col, "pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )


def nb_unigram_confusion_sql(
    labels: tuple[str, ...],
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    test_mod: int = 5,
) -> str:
    """DuckDB twin of ``nb_unigram_confusion``: identical split, Laplace
    likelihoods, DECIMAL(18,8)-quantized ln, decimal posterior sums and
    tie-break order; the train-fold scalars the Spark side embeds as
    collected integers are re-derived here as scalar subqueries (wrapped
    in COALESCE(..., 0) so a declared label absent from the train fold
    yields the same integer 0 the Spark side's ``.get(l, 0)`` embeds —
    the Spark twin additionally rejects that configuration early)."""
    tv = (
        "COALESCE((SELECT t FROM tl WHERE lang_k = '{l}'), 0)"
        " + (SELECT v FROM vv)"
    )
    cw_cols = ", ".join(
        f"sum(CASE WHEN lang_k = '{l}' THEN 1 ELSE 0 END) AS c_{i}"
        for i, l in enumerate(labels)
    )
    ll_cols = ", ".join(
        f"CAST(ln(CAST(c_{i} + 1 AS DOUBLE) / CAST({tv.format(l=l)} AS DOUBLE))"
        f" AS DECIMAL(18,8)) AS ll_{i}"
        for i, l in enumerate(labels)
    )
    j_cols = ", ".join(
        f"COALESCE(ll_{i}, CAST(ln(1.0 / CAST({tv.format(l=l)} AS DOUBLE))"
        f" AS DECIMAL(18,8))) AS ll_{i}"
        for i, l in enumerate(labels)
    )
    s_cols = ", ".join(
        f"sum(ll_{i}) + CAST(ln(CAST(COALESCE((SELECT n FROM nl WHERE"
        f" lang_k = '{l}'), 0) AS DOUBLE)"
        f" / CAST((SELECT n FROM ntr) AS DOUBLE)) AS DECIMAL(18,8)) AS s_{i}"
        for i, l in enumerate(labels)
    )
    case = "CASE"
    for i, l in enumerate(labels):
        conds = " AND ".join(f"s_{i} >= s_{k}" for k in range(len(labels)))
        case += f" WHEN {conds} THEN '{l}'"
    case += " END"
    return f"""
    WITH train AS (
      SELECT {id_col}, {label_col}, string_split({text_col}, ' ') AS toks
      FROM {table} WHERE {id_col} % {test_mod} <> 0),
    test AS (
      SELECT {id_col}, {label_col}, string_split({text_col}, ' ') AS toks
      FROM {table} WHERE {id_col} % {test_mod} = 0),
    tr AS (SELECT {label_col} AS lang_k, unnest(toks) AS w FROM train),
    tl AS (SELECT lang_k, count(*) AS t FROM tr GROUP BY 1),
    vv AS (SELECT count(DISTINCT w) AS v FROM tr),
    nl AS (SELECT {label_col} AS lang_k, count(*) AS n FROM train GROUP BY 1),
    ntr AS (SELECT count(*) AS n FROM train),
    cw AS (SELECT w, {cw_cols} FROM tr GROUP BY w),
    ll AS (SELECT w, {ll_cols} FROM cw),
    tt AS (SELECT {id_col}, {label_col}, unnest(toks) AS w FROM test),
    j AS (SELECT tt.{id_col}, tt.{label_col}, {j_cols}
          FROM tt LEFT JOIN ll USING (w)),
    sc AS (SELECT {id_col}, {label_col}, {s_cols} FROM j GROUP BY 1, 2)
    SELECT {label_col}, {case} AS pred, CAST(count(*) AS BIGINT) AS n_docs
    FROM sc GROUP BY 1, 2
    """


def chi2_top_terms(
    df: DataFrame,
    labels: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    test_mod: int = 5,
    k: int = 5,
) -> DataFrame:
    """Chi-squared feature selection (one-vs-rest, document presence):
    for each class l and word w over the SAME train fold the NB
    classifier uses, build the 2×2 contingency table
    (a = docs of l containing w, b = other docs containing w,
    c = docs of l without w, d = other docs without w) and rank words by
    chi² = N(ad − bc)² / ((a+b)(c+d)(a+c)(b+d)) — the classic selector
    that surfaces each class's most discriminative vocabulary before
    training. chi² is SYMMETRIC: perfect negative indicators (words a
    class never uses but every other class does) score as high as
    positive ones — both are maximally informative features. Words
    present in every train doc (or none) are excluded (their table has
    a zero margin).

    Determinism: the contingency cells are exact integers; chi² is ONE
    fixed-shape double expression over them (products can exceed BIGINT
    at corpus scale, so each factor is cast to double first — both
    engines evaluate the identical tree), and ties break on the word.

    Scale shape: one distinct (doc, word) projection (array_distinct
    before explode — presence, not frequency), one (word × class)
    map-side-combined count, per-class top-k via a |labels|-partition
    window over the word-level aggregate (vocabulary-sized, not
    corpus-sized). Output: (label, word, chi2, rank)."""
    from pyspark.sql import Window as W

    toks = F.array_distinct(F.split(F.col(text_col), " "))
    # Declared-domain contract: rows whose label is OUTSIDE ``labels``
    # are excluded from the universe entirely — otherwise the 2×2 tables
    # are inconsistent (N would count docs the per-class pivot can never
    # attribute) and the SQL twin's unfiltered count(*) would diverge.
    train = df.filter(F.col(id_col) % test_mod != 0).filter(
        F.col(label_col).isin(*labels)
    )
    n_l = {
        r[label_col]: r["n"]
        for r in train.groupBy(label_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # Same declared-domain validation as nb_unigram_confusion: an absent
    # label makes the (a+c) margin 0 for every word — division by zero
    # (Spark NaN vs DuckDB error). Reject loudly instead of diverging.
    missing = [l for l in labels if n_l.get(l, 0) == 0]
    if missing:
        raise ValueError(
            f"chi2_top_terms: declared label(s) {missing} have no "
            f"documents in the train fold; every 2x2 table degenerates"
        )
    n_total = sum(n_l.values())  # same integer, zero extra scan jobs
    dw = train.select(label_col, F.explode(toks).alias("w"))
    cw = dw.groupBy("w").pivot(label_col, list(labels)).count()
    present = [F.coalesce(F.col(f"`{l}`"), F.lit(0)) for l in labels]
    df_w = None
    for p in present:
        df_w = p if df_w is None else df_w + p
    cw = cw.withColumn("__df", df_w).filter(
        (F.col("__df") > 0) & (F.col("__df") < F.lit(n_total))
    )
    per_class = None
    for i, l in enumerate(labels):
        a = F.coalesce(F.col(f"`{l}`"), F.lit(0)).cast("double")
        b = (F.col("__df") - F.coalesce(F.col(f"`{l}`"), F.lit(0))).cast("double")
        c = (F.lit(n_l.get(l, 0)) - F.coalesce(F.col(f"`{l}`"), F.lit(0))).cast(
            "double"
        )
        d = (
            F.lit(n_total - n_l.get(l, 0))
            - (F.col("__df") - F.coalesce(F.col(f"`{l}`"), F.lit(0)))
        ).cast("double")
        chi2 = (
            F.lit(float(n_total))
            * (a * d - b * c)
            * (a * d - b * c)
            / ((a + b) * (c + d) * (a + c) * (b + d))
        )
        sel = cw.select(
            F.lit(l).alias("label"), F.col("w").alias("word"), chi2.alias("chi2")
        )
        per_class = sel if per_class is None else per_class.unionByName(sel)
    w_rank = W.partitionBy("label").orderBy(F.col("chi2").desc(), F.col("word"))
    return (
        per_class.withColumn("rank", F.row_number().over(w_rank).cast("int"))
        .filter(F.col("rank") <= k)
        .select("label", "word", "chi2", "rank")
    )


def chi2_top_terms_sql(
    labels: tuple[str, ...],
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    test_mod: int = 5,
    k: int = 5,
) -> str:
    """DuckDB twin of ``chi2_top_terms`` — same fold, same presence
    counts, same all-double chi² expression tree, same tie-break."""
    cw_cols = ", ".join(
        f"sum(CASE WHEN lang_k = '{l}' THEN 1 ELSE 0 END) AS c_{i}"
        for i, l in enumerate(labels)
    )
    branches = []
    for i, l in enumerate(labels):
        a = f"CAST(c_{i} AS DOUBLE)"
        b = f"CAST(df_w - c_{i} AS DOUBLE)"
        nl_l = f"COALESCE((SELECT n FROM nl WHERE lang_k = '{l}'), 0)"
        c = f"CAST({nl_l} - c_{i} AS DOUBLE)"
        d = (
            f"CAST((SELECT n FROM ntr) - {nl_l}"
            f" - (df_w - c_{i}) AS DOUBLE)"
        )
        chi2 = (
            f"CAST((SELECT n FROM ntr) AS DOUBLE)"
            f" * ({a} * {d} - {b} * {c}) * ({a} * {d} - {b} * {c})"
            f" / (({a} + {b}) * ({c} + {d}) * ({a} + {c}) * ({b} + {d}))"
        )
        branches.append(
            f"SELECT '{l}' AS label, w AS word, {chi2} AS chi2 FROM cw"
        )
    return f"""
    WITH train AS (
      SELECT {id_col}, {label_col} AS lang_k,
             list_distinct(string_split({text_col}, ' ')) AS toks
      FROM {table}
      WHERE {id_col} % {test_mod} <> 0
        AND {label_col} IN ({', '.join(f"'{l}'" for l in labels)})),
    nl AS (SELECT lang_k, count(*) AS n FROM train GROUP BY 1),
    ntr AS (SELECT count(*) AS n FROM train),
    dw AS (SELECT lang_k, unnest(toks) AS w FROM train),
    cw AS (
      SELECT w, {cw_cols}, count(*) AS df_w
      FROM dw GROUP BY w
      HAVING count(*) > 0 AND count(*) < (SELECT n FROM ntr)),
    pc AS ({' UNION ALL '.join(branches)}),
    ranked AS (
      SELECT label, word, chi2,
             CAST(row_number() OVER (PARTITION BY label
                  ORDER BY chi2 DESC, word) AS INTEGER) AS rank
      FROM pc)
    SELECT label, word, chi2, rank FROM ranked WHERE rank <= {k}
    """
