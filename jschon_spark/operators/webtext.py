"""Web-corpus curation operators: the standard passes a webtext
training-data pipeline runs between crawl and tokenizer (the reference
engine has no analogue — LLM-pipeline family, same tier as dedup/
textqa).

All five operators are pure DataFrame algebra — no Python UDFs — so
every predicate stays inside whole-stage codegen and the only
shuffles are the ones the semantics require:

- ``line_dedup``       — CCNet/RefinedWeb-style corpus-level line
  deduplication: one 16-byte-key aggregation + one anti-join.
- ``c4_clean``         — the C4 heuristic cleaning recipe as row-local
  higher-order functions: scan -> project, zero shuffles.
- ``stratified_sample``— deterministic per-stratum Bernoulli sampling
  keyed on md5(id): zero shuffles, reproducible across engines and
  runs (no RNG state).
- ``per_key_cap``      — keep the top-k documents per key (domain
  caps): one hash exchange on the key.
- ``pack_token_bins``  — contiguous token-budget packing plan per
  stratum (sequence-packing planner): one exchange + running sum.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def line_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_docs: int = 30,
    sep: str = "\n",
) -> DataFrame:
    """Corpus-level line deduplication (CCNet's boilerplate filter):
    drop every line that occurs in >= ``min_docs`` DISTINCT documents,
    then reassemble each document from its surviving lines in order.

    100 TB shape: the frequency aggregation groups on ``md5(line)``
    (16 bytes through the exchange, map-side combined to distinct
    lines per partition — never full text), and the set of frequent
    lines is tiny by Zipf, so AQE broadcasts the anti-join side. The
    exploded lines are recomputed (scan + explode) rather than
    persisted — at corpus scale recompute beats caching an exploded
    copy of the whole corpus.

    Output: ``<id_col>, n_lines, n_kept, text_dedup`` (empty string
    when every line was boilerplate).
    """
    lines = docs.select(
        id_col, F.posexplode(F.split(F.col(text_col), sep, -1)).alias("pos", "line")
    )
    frequent = (
        lines.select(F.md5("line").alias("h"), id_col)
        .groupBy("h")
        .agg(F.countDistinct(id_col).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("h", F.lit(True).alias("__drop"))
    )
    # mark-then-aggregate (not anti-join + second agg + agg-agg join):
    # the broadcast left join keeps every line with a drop marker, so
    # ONE aggregation produces totals, kept counts, and the rebuilt
    # text together — collect_list skips the nulled-out dropped lines
    marked = (
        lines.withColumn("h", F.md5("line"))
        .join(frequent, "h", "left")
        .withColumn("__keep", F.col("__drop").isNull())
    )
    return marked.groupBy(id_col).agg(
        F.count("*").alias("n_lines"),
        F.sum(F.when(F.col("__keep"), 1).otherwise(0)).alias("n_kept"),
        F.coalesce(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("__keep"),
                                   F.struct("pos", "line"))
                        )
                    ),
                    lambda s: s["line"],
                ),
                sep,
            ),
            F.lit(""),
        ).alias("text_dedup"),
    )


def c4_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_words: int = 5,
    min_kept_lines: int = 1,
    sep: str = "\n",
) -> DataFrame:
    """The C4 heuristic cleaning recipe (Raffel et al. 2020 §2.2) as
    row-local Column algebra: keep only lines that end in terminal
    punctuation, have >= ``min_words`` whitespace words, and don't
    mention javascript; reject whole documents containing
    "lorem ipsum" or a curly brace, or with fewer than
    ``min_kept_lines`` surviving lines.

    Scan -> project, zero shuffles; the line predicates run inside one
    higher-order ``filter`` over the split array.

    Output: ``<id_col>, n_lines, n_kept_lines, has_lorem, has_brace,
    c4_passed, text_clean``.
    """
    t = F.col(text_col)
    lines = F.split(t, sep, -1)

    def _keep(l: Column) -> Column:
        return (
            l.rlike('[.!?"]$')
            & (F.size(F.split(l, " ", -1)) >= min_words)
            & ~F.lower(l).contains("javascript")
        )

    kept = F.filter(lines, _keep)
    has_lorem = F.lower(t).contains("lorem ipsum")
    has_brace = t.contains("{")
    return docs.select(
        id_col,
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept_lines"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        (
            ~has_lorem & ~has_brace & (F.size(kept) >= min_kept_lines)
        ).alias("c4_passed"),
        F.array_join(kept, sep).alias("text_clean"),
    )


def stratified_sample(
    docs: DataFrame,
    id_col: str = "doc_id",
    strata_col: str = "lang",
    *,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample: a row is kept iff
    the first 8 hex digits of ``md5(cast(id as string))`` fall below
    ``rate * 16^8``. No RNG state, so the sample is reproducible
    across runs, engines, partitionings, and cluster sizes — the
    property a resumable 100 TB pipeline needs (re-running a failed
    partition keeps the SAME rows). Zero shuffles: pure scan+filter,
    and the hex comparison is a codegen'd string compare against a
    per-stratum literal.
    """

    def _thr(rate: float) -> str:
        return format(min(int(rate * 16**8), 16**8 - 1), "08x")

    expr = F.lit(_thr(default_rate))
    for stratum, rate in sorted(rates.items()):
        expr = F.when(F.col(strata_col) == stratum, F.lit(_thr(rate))).otherwise(expr)
    h = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    return docs.filter(h < expr)


def per_key_cap(
    docs: DataFrame,
    key_col: str = "source",
    order_col: str = "n_chars",
    id_col: str = "doc_id",
    *,
    k: int = 5,
) -> DataFrame:
    """Domain caps: keep the top-``k`` rows per key, ranked by
    ``order_col`` descending with ``id_col`` as the deterministic
    tiebreak. One hash exchange on the key + an in-partition top-k
    (Spark pushes a per-partition limit below the final sort when the
    window is rank-filtered). Hot domains are bounded by construction
    — the output is at most ``k`` rows per key regardless of skew.

    Output: input columns + ``rank``.
    """
    w = Window.partitionBy(key_col).orderBy(F.desc(order_col), F.asc(id_col))
    return (
        docs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def pack_token_bins(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    strata_col: str = "lang",
    *,
    budget: int = 2048,
) -> DataFrame:
    """Sequence-packing plan: assign documents (in deterministic
    ``id_col`` order per stratum) to contiguous token-budget bins —
    document i goes to bin floor(tokens_before_i / budget). The
    offset rule (rather than true first-fit) keeps the plan a pure
    running sum: one exchange on the stratum + a window cumsum, no
    iterative repacking, identical on any engine.

    Token count is whitespace words (the tokenizer-independent
    planning proxy). Output: ``<strata_col>, bin, n_docs,
    total_tokens`` per bin.
    """
    toks = F.size(F.split(F.col(text_col), " ", -1))
    w = (
        Window.partitionBy(strata_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_bin = docs.select(
        strata_col,
        F.col(id_col),
        toks.alias("n_tokens"),
    ).withColumn(
        "bin",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / F.lit(budget)),
    )
    return with_bin.groupBy(strata_col, "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


def url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """URL canonicalization + host/domain extraction (the grouping key
    CCNet-style per-domain passes need) — row-local regex Column
    algebra, zero shuffles, engine-portable patterns (no lookaround,
    so Java regex and RE2 read them identically).

    Adds: ``scheme`` (lowercased), ``host`` (userinfo/port/trailing-dot
    stripped, lowercased), ``domain`` (www-stripped registrable-domain
    HEURISTIC: last two labels — a real pipeline would join a public
    suffix list), ``url_canon`` (scheme://host[:non-default-port]path
    ?query, fragment dropped, empty path -> '/'), ``parse_ok``.
    """
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostraw = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    host_l = F.lower(F.regexp_replace(hostraw, r"^[^@]*@", ""))
    port = F.regexp_extract(host_l, r":([0-9]+)$", 1)
    host = F.regexp_replace(
        F.regexp_replace(host_l, r":[0-9]+$", ""), r"\.$", ""
    )
    domain_base = F.regexp_replace(host, r"^www\.", "")
    domain = F.when(
        domain_base.rlike(r"[^.]\.[^.]"),
        F.regexp_extract(domain_base, r"([^.]+\.[^.]+)$", 1),
    ).otherwise(domain_base)
    path = F.regexp_extract(
        u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    parse_ok = (scheme != "") & (host != "")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    return df.select(
        "*",
        scheme.alias("scheme"),
        F.when(parse_ok, host).alias("host"),
        F.when(parse_ok, domain).alias("domain"),
        F.when(parse_ok, canon).alias("url_canon"),
        parse_ok.alias("parse_ok"),
    )


def unigram_logprob_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    vocab_size: int = 10000,
    ln10: bool = False,
) -> DataFrame:
    """Unigram language-model quality score (the cheap proxy for
    CCNet's LM-perplexity filter): build a corpus-level unigram
    distribution, then score each document by its mean token
    log10-probability (out-of-vocabulary tokens get the floor
    probability 1/(total+1)).

    100 TB shape: the vocabulary aggregation is map-side-combined
    word-count (shuffles distinct tokens, not text), capped at
    ``vocab_size`` rows and BROADCAST back onto the exploded token
    stream; the per-doc mean is one aggregation on the id. Token
    probabilities use the corpus itself — no external model, so the
    whole computation is replayable in SQL.

    Output: ``<id_col>, n_tokens, mean_logprob`` (NULL for empty
    docs).
    """
    toks = docs.select(
        id_col, F.explode(F.split(F.col(text_col), r"\s+", -1)).alias("tok")
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("tok").agg(F.count("*").alias("n"))
    total_df = counts.agg(
        F.sum("n").alias("__total"), F.count("*").alias("__distinct")
    )
    vocab = (
        counts.orderBy(F.desc("n"), F.asc("tok"))
        .limit(vocab_size)
        .crossJoin(F.broadcast(total_df))
        .select(
            "tok",
            (F.log10(F.col("n").cast("double"))
             - F.log10(F.col("__total").cast("double") + 1.0)).alias("__lp"),
        )
    )
    floor = total_df.select(
        (-F.log10(F.col("__total").cast("double") + 1.0)).alias("__floor")
    )
    scored = (
        toks.join(F.broadcast(vocab), "tok", "left")
        .crossJoin(F.broadcast(floor))
        .select(id_col, F.coalesce("__lp", "__floor").alias("__lp"))
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.avg("__lp").alias("mean_logprob"),
    )
