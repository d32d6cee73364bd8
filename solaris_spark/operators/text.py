"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure column expressions (whole-stage codegen; no Python UDFs) —
the DuckDB oracles in __spark_entry__ replicate each formula exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

DEFAULT_LEXICON = [
    ("en", "the"), ("en", "a"), ("en", "data"), ("en", "value"),
    ("de", "der"), ("de", "und"), ("fr", "le"), ("fr", "et"),
    ("es", "el"), ("es", "y"),
]


def lang_id(docs: DataFrame, lexicon=None, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """Heuristic language ID: stopword-hit argmax against a per-language
    lexicon (token explode ⋈ broadcast lexicon ⋈ window argmax)."""
    spark = docs.sparkSession
    lexdf = spark.createDataFrame(lexicon or DEFAULT_LEXICON,
                                  "lang_guess string, word string")
    tok = docs.select(id_col, F.explode(F.split(text_col, " ")).alias("tok"))
    ntok = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    hits = (tok.join(F.broadcast(lexdf), tok.tok == lexdf.word)
            .groupBy(id_col, "lang_guess").agg(F.count(F.lit(1)).alias("hits")))
    w = Window.partitionBy(id_col).orderBy(F.desc("hits"), F.asc("lang_guess"))
    return (hits.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
            .join(ntok, id_col)
            .select(id_col, "lang_guess", "hits",
                    (F.col("hits") / F.col("n")).alias("hit_ratio")))


def quality_scores(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   stopwords=("the", "a", "and", "of")) -> DataFrame:
    """Length / mean word length / punctuation-ratio / stopword-ratio
    quality features (the standard cheap training-data filters)."""
    toks = F.split(F.col(text_col), " ")
    n_tok = F.size(toks)
    stops = list(stopwords)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*stops)))
    n_chars = F.length(text_col)
    # punctuation = non-alphanumeric, non-space characters
    punct = n_chars - F.length(
        F.regexp_replace(F.col(text_col), r"[^A-Za-z0-9\s]", ""))
    return docs.select(
        id_col,
        n_chars.alias("n_chars_m"),
        n_tok.alias("n_tokens"),
        ((n_chars - n_tok + 1) / n_tok).alias("mean_word_len"),
        (punct / n_chars).alias("punct_ratio"),
        (stop_hits / n_tok).alias("stop_ratio"))


def token_counts(docs: DataFrame, group_col: str = "source",
                 text_col: str = "text") -> DataFrame:
    """Whitespace token counting rolled up per group."""
    n_tok = F.size(F.split(F.col(text_col), " "))
    return (docs.withColumn("n_tokens", n_tok)
            .groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("total_tokens"),
                 F.min("n_tokens").alias("min_tokens"),
                 F.max("n_tokens").alias("max_tokens")))


def bpe_ish_token_counts(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """BPE-ish token estimate: regex split on word boundaries + digit runs
    (GPT-2-style pre-tokenizer shape, no merges) — the standard cheap
    'how many tokens will this cost' estimator."""
    pieces = F.expr(
        rf"regexp_extract_all({text_col}, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]', 0)")
    return docs.select(id_col, F.size(pieces).alias("bpe_ish_tokens"))


def fingerprints(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Order-insensitive content fingerprint: md5 of the sorted distinct
    token set (catches shuffled near-copies that exact dedup misses)."""
    fp = F.md5(F.concat_ws(" ", F.array_sort(
        F.array_distinct(F.split(text_col, " ")))))
    return docs.select(id_col, fp.alias("fingerprint"))


def fingerprint_groups(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    return (fingerprints(docs, id_col, text_col)
            .groupBy("fingerprint")
            .agg(F.count(F.lit(1)).alias("group_size"),
                 F.min(id_col).alias("first_doc"))
            .filter(F.col("group_size") > 1))


def winnow_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 5,
                        window: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    scheme — the classic k-gram rolling-hash fingerprint family): hash
    every char k-gram, then keep a gram iff its hash is the MINIMUM of the
    FULL forward window of `window` consecutive gram hashes (truncated
    trailing windows are excluded — they would unconditionally select the
    last gram of every document, which winnowing does not produce).
    This forward-window selection variant guarantees any shared substring
    of length ≥ k + 2·window − 2 produces a shared fingerprint, so
    plagiarized/duplicated passages collide.

    Fully relational: substring explode (JVM), md5-derived gram hash
    (deterministic — the DuckDB oracle recomputes it), windowed MIN — no
    UDF; a true O(1)-update Rabin-Karp hash is an executor-side
    micro-optimization the relational plan doesn't need.
    Returns (id, fp) distinct fingerprints per doc.

    Minimum-length contract: documents shorter than k + window − 1 chars
    (fewer than `window` k-grams) emit NO fingerprints and therefore never
    appear in winnow_near_dup_pairs — consistent with the winnowing
    guarantee, which only covers shared substrings of length ≥ k + 2w − 2.
    For corpora with such short documents, lower (k, window) or dedup them
    with minhash/simhash, which have no length floor.
    """
    n_grams = F.length(F.col(text_col)) - k + 1
    g = (docs.filter(n_grams >= window)
         .select(id_col, text_col,
                 F.explode(F.sequence(F.lit(0), n_grams - 1)).alias("pos"))
         .withColumn("_ng", F.length(F.col(text_col)) - k + 1)
         .withColumn("gram", F.expr(f"substring({text_col}, pos + 1, {k})"))
         .withColumn("h", F.conv(F.substring(F.md5(F.col("gram")), 1, 8),
                                 16, 10).cast("long"))
         .drop(text_col))
    w = Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, window - 1)
    # FULL windows only (pos ≤ n_grams − window): a truncated trailing
    # window would unconditionally select the document's last gram, which
    # the winnowing definition does not produce
    return (g.withColumn("wmin", F.min("h").over(w))
            .filter((F.col("h") == F.col("wmin"))
                    & (F.col("pos") <= F.col("_ng") - window))
            .select(F.col(id_col), F.col("h").alias("fp"))
            .distinct())


def winnow_near_dup_pairs(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", k: int = 5,
                          window: int = 4,
                          min_shared: int = 2) -> DataFrame:
    """Near-dup candidate pairs by shared winnowing fingerprints (equi-join
    on fp — the same bucketed shape as the LSH joins, never all-pairs)."""
    fps = winnow_fingerprints(docs, id_col, text_col, k, window)
    a, b = fps.alias("a"), fps.alias("b")
    return (a.join(b, (F.col("a.fp") == F.col("b.fp"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .groupBy(F.col(f"a.{id_col}").alias("da"),
                     F.col(f"b.{id_col}").alias("db"))
            .agg(F.count(F.lit(1)).alias("shared_fps"))
            .filter(F.col("shared_fps") >= min_shared))


def clean_text(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Boilerplate scrub — the standard pre-dedup cleaning stage of a
    training-data pipeline: strip URLs and e-mail addresses, collapse
    whitespace runs, trim; emits the removal counts so downstream quality
    filters can threshold on them.  Pure column regexps (JVM, codegen)."""
    url = r"(https?://\S+|www\.\S+)"
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    t = F.col(text_col)
    # SQL string literals consume one level of backslashes — double them
    # for the F.expr regexps (the F.regexp_replace column API takes the
    # pattern verbatim, no doubling there)
    n_urls = F.size(F.expr(
        f"regexp_extract_all({text_col}, '{url.replace(chr(92), chr(92) * 2)}', 0)"))
    n_emails = F.size(F.expr(
        f"regexp_extract_all({text_col}, '{email.replace(chr(92), chr(92) * 2)}', 0)"))
    cleaned = F.trim(F.regexp_replace(F.regexp_replace(F.regexp_replace(
        t, url, " "), email, " "), r"\s+", " "))
    return docs.select(
        id_col, cleaned.alias("clean_text"),
        n_urls.alias("n_urls"), n_emails.alias("n_emails"),
        (F.length(t) - F.length(cleaned)).alias("chars_removed"))
