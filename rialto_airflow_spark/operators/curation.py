"""Corpus-curation operators for LLM training-data pipelines.

The filters a 100-TB pretraining pipeline runs between raw crawl and
tokenizer, re-expressed Spark-first:

  * repetition_stats — Gopher-style within-document repetition
    signals (Rae et al. 2021 §A1.1: fraction of duplicate n-grams,
    fraction of tokens inside the most-repeated n-gram). Pure Column
    expressions → map-only, whole-stage codegen, no shuffle.
  * pii_stats / pii_scrub — regex detection + masking of emails,
    IPv4s, and phone-shaped numbers. Patterns are RE2-safe (no
    backrefs/lookarounds) so the DuckDB oracle runs the identical
    regexes; map-only.
  * decontaminate — benchmark n-gram overlap flagging (the GPT-3
    appendix-C / PaLM style eval-set decontamination): any document
    sharing an n-gram shingle with the benchmark set is flagged.
    Benchmark side is small by contract → broadcast; corpus side
    explodes shingles but aggregates back BEFORE the join output, so
    the shuffle is one exists-per-doc, never a doc×benchmark blowup.
  * boilerplate_lines — cross-corpus repeated-line removal (C4,
    Raffel et al. 2020 §2.2: drop every line that occurs ≥ k times in
    the corpus). This one is genuinely distributed: line frequencies
    are a corpus-wide aggregation, then documents are reassembled
    with an order-preserving collect. Two shuffles (line hash, doc
    id) — both on keys that spread evenly at any scale.
  * mixture_resample — deterministic source re-weighting to a target
    mixture (the Pile/ROOTS-style domain balancing): a tiny per-source
    rate table (one agg) drives a salted-hash Bernoulli keep, so the
    output approaches the target shares without RNG, stable across
    engines and re-runs.

Scale notes per operator are inline. Nothing here collects corpus
data to the driver; the only driver-side value is the per-source rate
table in mixture_resample (|sources| rows by contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rialto_airflow_spark.functions.perf import bind_once
from rialto_airflow_spark.operators.sampling import hash_uniform
from rialto_airflow_spark.operators.text import ngram_strings

# RE2-safe patterns shared verbatim with the DuckDB oracles (no \b —
# Java and RE2 agree on these without word-boundary subtleties).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"(\d{1,3}\.){3}\d{1,3}"
PHONE_RE = r"\+?\d{3}[- ]\d{3}[- ]\d{4}"


def repetition_stats(col: Column | str, n: int = 2) -> Column:
    """Gopher repetition signals as a struct:

      dup_ngram_frac — fraction of n-gram occurrences that are
        repeats of an earlier occurrence (0 for all-distinct).
      top_ngram_frac — fraction of all n-gram slots covered by the
        single most frequent n-gram.

    Both are pure array algebra over the shingle list (no shuffle,
    no UDF): dup fraction is 1 - distinct/total; the top count is the
    longest equal run in the SORTED shingle array, found by a single
    aggregate() fold — O(g log g) per row (round-3 verdict #7
    replaced the old aggregate-over-filter O(d·g) form, which went
    quadratic on long low-redundancy documents), bounded by document
    length, embarrassingly parallel.
    """
    grams = ngram_strings(col, n)

    def body(g: Column) -> Column:
        total = F.size(g)
        distinct = F.array_distinct(g)
        top = F.aggregate(
            F.array_sort(g),
            F.struct(
                F.lit(None).cast("string").alias("prev"),
                F.lit(0).cast("long").alias("run"),
                F.lit(0).cast("long").alias("best"),
            ),
            lambda acc, x: F.struct(
                x.alias("prev"),
                F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1)
                .otherwise(F.lit(1))
                .alias("run"),
                F.greatest(
                    acc["best"],
                    F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(
                        F.lit(1)
                    ),
                ).alias("best"),
            ),
            lambda acc: acc["best"],
        )
        dup_frac = F.when(
            total > 0,
            F.round(1.0 - F.size(distinct) / total.cast("double"), 6),
        ).otherwise(F.lit(0.0))
        top_frac = F.when(
            total > 0, F.round(top / total.cast("double"), 6)
        ).otherwise(F.lit(0.0))
        return F.struct(
            dup_frac.alias("dup_ngram_frac"), top_frac.alias("top_ngram_frac")
        )

    return bind_once(grams, body)


def duplicate_unit_stats(col: Column | str, sep: str = "\n") -> Column:
    """The line/paragraph half of Gopher's repetition signals (Rae et
    al. 2021 §A1.1), complementing the n-gram half in
    :func:`repetition_stats`: split the document on ``sep`` (lines,
    or paragraphs with ``"\\n\\n"``) and report

      dup_frac      — fraction of units that repeat an earlier unit;
      dup_char_frac — fraction of CHARACTERS inside those repeats
                      (Gopher thresholds both: e.g. drop when > 0.30
                      of lines or > 0.20 of characters duplicate).

    Pure array algebra — distinct-vs-total counts and two summed
    length folds; map-only, codegen'd, no shuffle.
    """
    c = F.col(col) if isinstance(col, str) else col
    units = F.split(c, sep)

    def body(u: Column) -> Column:
        total = F.size(u)
        distinct = F.array_distinct(u)
        chars = F.aggregate(
            F.transform(u, F.length), F.lit(0.0), lambda a, x: a + x
        )
        d_chars = F.aggregate(
            F.transform(distinct, F.length), F.lit(0.0), lambda a, x: a + x
        )
        dup_frac = F.when(
            total > 0,
            F.round(1.0 - F.size(distinct) / total.cast("double"), 6),
        ).otherwise(F.lit(0.0))
        dup_char_frac = F.when(
            chars > 0, F.round(1.0 - d_chars / chars, 6)
        ).otherwise(F.lit(0.0))
        return F.struct(
            dup_frac.alias("dup_frac"), dup_char_frac.alias("dup_char_frac")
        )

    return bind_once(units, body)


def pii_stats(col: Column | str) -> Column:
    """Count PII-shaped spans per document: struct(n_emails, n_ips,
    n_phones). regexp_count is JVM-side; the counts feed threshold
    filters ('drop docs with > k emails') without materializing the
    matches."""
    c = F.col(col) if isinstance(col, str) else col
    return F.struct(
        F.regexp_count(c, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(c, F.lit(IPV4_RE)).alias("n_ips"),
        F.regexp_count(c, F.lit(PHONE_RE)).alias("n_phones"),
    )


def pii_scrub(col: Column | str) -> Column:
    """Mask PII spans with typed placeholder tokens (the masking
    convention keeps token counts roughly stable for the tokenizer).
    Order matters: emails first so their host part isn't half-eaten
    by the IP pattern; phone last so already-masked spans don't
    re-match."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, IPV4_RE, "<IP>")
    out = F.regexp_replace(out, PHONE_RE, "<PHONE>")
    return out


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    hash_shingles: bool = False,
) -> DataFrame:
    """Flag documents sharing any word n-gram with a benchmark set.

    Returns docs + boolean ``contaminated``. Scale shape: the
    benchmark's distinct shingle hashes are SMALL by contract (eval
    sets are KBs, corpora are TBs) → broadcast; the corpus explodes
    its shingles map-side, semi-joins the broadcast (no shuffle of
    corpus data), and the surviving (doc, shingle) hits reduce to a
    distinct doc-id set — so the only Exchange is over the HIT ids,
    a vanishingly small fraction of the corpus at real scale.

    ``hash_shingles=True`` compares xxhash64 codes instead of shingle
    strings — same result up to 64-bit collisions (a collision can
    only over-flag, never miss), with a ~10× smaller broadcast; use
    it when the benchmark set is large. Default stays strings so the
    DuckDB oracles can replay the comparison exactly.
    """

    def grams(col: str):
        g = ngram_strings(col, n)
        if hash_shingles:
            g = F.transform(g, lambda s: F.xxhash64(s))
        return g

    bench = F.broadcast(
        benchmark.select(F.explode(grams(text_col)).alias("g")).distinct()
    )
    hits = (
        docs.select(F.col(id_col), F.explode(grams(text_col)).alias("g"))
        .join(bench, "g", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return docs.join(hits, id_col, "left").withColumn(
        "contaminated", F.coalesce(F.col("contaminated"), F.lit(False))
    )


def semantic_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bits: int = 8,
    nprobe: int = 2,
) -> DataFrame:
    """Embedding-space decontamination: flag documents whose vector is
    within cosine ``threshold`` of ANY benchmark vector — catches the
    paraphrased/translated eval leakage n-gram
    :func:`decontaminate` can't see.

    Same 100-TB shape as the n-gram version: the benchmark side is
    SMALL by contract, so its vectors explode to their ``nprobe``
    multi-probe LSH buckets and BROADCAST; each corpus vector computes
    its own sign bucket map-side and joins the broadcast, so the
    corpus never shuffles — the only Exchange is the distinct over HIT
    ids. The bucket match restricts candidates (approximate recall,
    tunable with nprobe/bits — an identical vector always collides
    because the base bucket is probed); the cosine test on survivors
    is exact, so flagged docs are NEVER false positives w.r.t. the
    threshold.
    """
    from rialto_airflow_spark.operators.dedup import dot, norm
    from rialto_airflow_spark.operators.similarity import (
        probe_buckets,
        sign_bucket,
    )

    bench = F.broadcast(
        benchmark.select(
            F.col(vec_col).alias("__bv"),
            norm(F.col(vec_col)).alias("__bn"),
            F.explode(
                probe_buckets(F.col(vec_col), bits, nprobe)
            ).alias("__bb"),
        )
    )
    c = docs.select(
        F.col(id_col),
        F.col(vec_col).alias("__cv"),
        norm(F.col(vec_col)).alias("__cn"),
        sign_bucket(F.col(vec_col), bits).alias("__cb"),
    )
    sim = dot(F.col("__cv"), F.col("__bv")) / (F.col("__cn") * F.col("__bn"))
    hits = (
        c.join(bench, F.col("__cb") == F.col("__bb"))
        .where(sim >= threshold)
        .select(id_col)
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return docs.join(hits, id_col, "left").withColumn(
        "contaminated", F.coalesce(F.col("contaminated"), F.lit(False))
    )


def boilerplate_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """C4-style cross-corpus line dedup: drop every line that appears
    in ≥ ``min_docs`` distinct documents, reassemble each document
    from its surviving lines in original order.

    Distributed shape: explode lines with their position, aggregate
    line → distinct-doc count (shuffle 1, on the line value — evenly
    spread because popular lines are exactly what gets dropped),
    broadcast nothing; anti-join survivors back and rebuild with an
    order-restoring sort_array(collect_list(struct(pos, line)))
    (shuffle 2, on doc id). Documents whose every line was
    boilerplate come back as '' (kept, filterable downstream).
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    )
    common = (
        lines.groupBy("line")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("line")
    )
    kept = lines.join(common, "line", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias("clean_text")
    )
    return (
        docs.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(
            id_col, F.coalesce("clean_text", F.lit("")).alias("clean_text")
        )
    )


def c4_line_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
    blocklist: tuple[str, ...] = ("lorem ipsum",),
    drop_brace: bool = True,
    sep: str = "\n",
) -> DataFrame:
    """C4 cleaning heuristics (Raffel et al. 2020 §2.2) as pure
    Column algebra — the published rules, parameterized:

      * keep only lines that end in terminal punctuation
        (``. ! ? "``) and contain ≥ ``min_words_per_line`` words;
        drop lines mentioning ``javascript`` (case-insensitive);
      * drop the whole document if the ORIGINAL text contains any
        ``blocklist`` phrase or (optionally) a curly brace, or if the
        cleaned text has fewer than ``min_sentences`` terminal
        punctuation marks.

    Output: ``id_col, clean_text, n_sentences, keep`` — kept text for
    every row (callers filter on ``keep`` so the decision is
    auditable). Entirely line-local per document: no shuffle, no
    Python, whole-stage codegen end-to-end — the cheapest possible
    100-TB pass. Complementary to :func:`boilerplate_lines` (which
    needs corpus-wide line frequencies); C4 runs both.
    """
    lines = F.split(F.col(text_col), sep)
    kept = F.filter(
        lines,
        lambda ln: F.trim(ln).rlike(r'[.!?"]$')
        & (F.size(F.split(F.trim(ln), r"\s+")) >= min_words_per_line)
        & ~F.lower(ln).contains("javascript"),
    )
    clean = F.array_join(kept, sep)
    n_sent = F.size(F.regexp_extract_all(clean, F.lit(r"[.!?]"), F.lit(0)))
    low = F.lower(F.col(text_col))
    blocked = F.lit(False)
    for phrase in blocklist:
        blocked = blocked | low.contains(phrase.lower())
    if drop_brace:
        blocked = blocked | F.col(text_col).contains("{")
    return docs.select(
        F.col(id_col),
        clean.alias("clean_text"),
        n_sent.alias("n_sentences"),
        (~blocked & (n_sent >= min_sentences)).alias("keep"),
    )


def dedup_paragraphs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
) -> DataFrame:
    """Corpus-wide exact paragraph dedup, keep-first (the MassiveText
    / Gopher repetition-removal granularity between C4's lines and
    whole-document dedup): every paragraph that already occurred in
    an earlier (doc, position) — ordered by ``(id_col, pos)`` — is
    removed; each document is rebuilt from its surviving paragraphs
    in original order.

    Distributed shape: posexplode paragraphs, shuffle ONCE on
    ``md5(paragraph)`` (the 32-char digest, so the exchange never
    carries paragraph text twice) to pick the global first occurrence
    as ``min(struct(id, pos))``, join survivors back on the digest,
    rebuild per document (second shuffle, on the doc id — same shape
    as :func:`boilerplate_lines`). Hot digests are exactly the
    heavily-duplicated paragraphs, whose groups aggregate to one row
    via the map-side-combinable ``min`` before the exchange.

    Documents reduced to nothing come back as ``''`` (kept rows,
    filterable). ``md5`` collisions (2^-64 birthday at corpus scale)
    would merge distinct paragraphs; acceptable for curation, noted
    for auditors.
    """
    paras = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "para"),
    ).withColumn("h", F.md5(F.col("para")))
    first = paras.groupBy("h").agg(
        F.min(F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))).alias(
            "f"
        )
    )
    kept = paras.join(first, "h").where(
        (F.col(id_col) == F.col("f.i")) & (F.col("pos") == F.col("f.p"))
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            sep,
        ).alias("clean_text")
    )
    return (
        docs.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(
            id_col, F.coalesce("clean_text", F.lit("")).alias("clean_text")
        )
    )


def remove_duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 10,
) -> DataFrame:
    """Exact duplicate-substring removal (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    ExactSubstr): every token span that repeats anywhere in the
    corpus — across documents or within one — keeps only its
    globally-first occurrence; later occurrences are cut out and the
    document is rebuilt from its surviving tokens.

    Token-window factorization of the paper's suffix-array method
    (which is inherently single-machine): a duplicated span of
    ≥ ``window`` tokens contains a stride-1 window of length
    ``window`` at every offset, so hashing ALL stride-1 windows and
    keeping, per hash, only the minimum ``(doc, start)`` occurrence
    marks exactly the non-first copies. Marked window starts merge
    into maximal intervals per document (a sorted fold — overlapping
    windows coalesce), and tokens inside any interval are dropped.
    Spans shorter than ``window`` tokens are below the detection
    granularity (the paper uses 50 BPE tokens; default 10 here for
    whitespace tokens).

    Distributed shape: window hashes are computed MAP-SIDE as a
    per-doc array (``transform`` over ``sequence``, O(n·window) char
    work, zero Python), then posexplode carries only
    ``(id, start, hash)`` — never window text. Shuffle 1 groups by
    hash (map-side-combinable ``min(struct)`` + count, so a
    million-fold repeated span still sends one row per partition);
    shuffle 2 regroups marked starts per doc; the interval merge and
    token rebuild are pure Column folds. Hot hashes are exactly the
    most-duplicated spans — their groups collapse map-side.

    Output: ``(id_col, clean_text, n_tokens, n_removed)`` for every
    input row. Rebuild joins surviving tokens with single spaces
    (whitespace is not preserved through tokenization — same contract
    as the paper's token-level cut). Deterministic: first occurrence
    is min(struct(id, start)), no RNG. NULL text is treated as ''
    (size(null) is -1 under non-ANSI SQL — without the coalesce a
    null row would emit negative token counts).

    HASH-COLLISION CAVEAT (what "exact" does NOT mean here): windows
    are matched by 64-bit xxhash, not by content, so two DIFFERENT
    windows collide with probability ~W²/2⁶⁵ over W total windows.
    Negligible at W ≤ 1e8 (< 3e-4 expected collisions), but at the
    100-TB scale (W ≈ 1e13 whitespace tokens) the birthday bound
    expects ~10⁶ colliding window PAIRS — each falsely deleting one
    unique ~``window``-token span (a few MB of text corpus-wide:
    bounded, random, but nonzero, where the paper's suffix-array
    method deletes none). For collision-free semantics at that scale,
    re-verify marked starts by joining window TEXT for marked hashes
    only (duplicate-sized work, not corpus-sized) or widen the key to
    two independent hashes (~W²/2¹²⁸).
    """
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    base = docs.select(
        F.col(id_col), toks.alias("__t")
    ).withColumn("__n", F.size("__t"))

    # per-doc window-hash array, map-side; xxhash64 over the
    # NUL-joined slice so token boundaries can't alias ("a b","c" vs
    # "a","b c")
    hashes = F.transform(
        F.sequence(F.lit(0), F.col("__n") - window),
        lambda i: F.xxhash64(
            F.array_join(F.slice(F.col("__t"), i + 1, window), "\x00")
        ),
    )
    wins = base.where(F.col("__n") >= window).select(
        F.col(id_col), F.posexplode(hashes).alias("start", "h")
    )
    firsts = wins.groupBy("h").agg(
        F.min(
            F.struct(F.col(id_col).alias("i"), F.col("start").alias("p"))
        ).alias("f"),
        F.count(F.lit(1)).alias("cnt"),
    )
    marked = (
        wins.join(firsts.where(F.col("cnt") >= 2), "h")
        .where(
            ~(
                (F.col(id_col) == F.col("f.i"))
                & (F.col("start") == F.col("f.p"))
            )
        )
        .select(F.col(id_col), F.col("start"))
    )
    # sorted starts -> maximal [lo, hi) intervals: all windows share
    # width `window`, so on a sorted walk an overlapping-or-touching
    # start always extends the last interval's hi to start+window
    starts = marked.groupBy(id_col).agg(
        F.array_sort(F.collect_set("start")).alias("__starts")
    )
    empty = F.array().cast("array<struct<lo:int,hi:int>>")
    ivals = F.aggregate(
        F.col("__starts"),
        empty,
        lambda acc, s: F.when(
            (F.size(acc) == 0) | (s > F.element_at(acc, -1)["hi"]),
            F.concat(
                acc,
                F.array(
                    F.struct(
                        s.cast("int").alias("lo"),
                        (s + window).cast("int").alias("hi"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.element_at(acc, -1)["lo"].alias("lo"),
                        (s + window).cast("int").alias("hi"),
                    )
                ),
            )
        ),
    )
    with_ivals = base.join(
        starts, id_col, "left"
    ).withColumn("__iv", F.coalesce(ivals, empty))
    # __n >= 1 always (split of '' is ['']), so the sequence is valid
    kept_idx = F.filter(
        F.sequence(F.lit(0), F.col("__n") - 1),
        lambda i: ~F.exists(
            F.col("__iv"), lambda r: (i >= r["lo"]) & (i < r["hi"])
        ),
    )
    # report n_tokens excluding the empty-string token a NULL/empty
    # doc tokenizes to (split('') is ['']), so token accounting
    # agrees with gopher_quality_filter's n_words on the same input;
    # __n stays the internal array length the positional logic needs
    n_real = F.size(F.filter(F.col("__t"), lambda t: t != ""))
    return with_ivals.select(
        F.col(id_col),
        F.array_join(
            F.transform(kept_idx, lambda i: F.get("__t", i)), " "
        ).alias("clean_text"),
        n_real.alias("n_tokens"),
        (F.col("__n") - F.size(kept_idx)).alias("n_removed"),
    )


# Gopher document-level stopwords (Rae et al. 2021 §A1.1)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
    passthrough: bool = False,
) -> DataFrame:
    """The full Gopher document-level quality rule set (Rae et al.
    2021 §A1.1) as pure Column algebra — the published thresholds,
    parameterized: word count in [50, 100k], mean word length in
    [3, 10], symbol-to-word ratio (``#`` or ``...``) ≤ 0.1, < 90% of
    lines starting with a bullet, < 30% ending with an ellipsis,
    ≥ 80% of words containing an alphabetic character, and ≥ 2 of the
    eight English stopwords present.

    Complements the heuristic composite in ``text.quality_score``
    (free-form score) with the exact named filter reviewers expect;
    :func:`c4_line_filter` covers the line-level C4 rules. Output is
    one row per document with every metric plus the combined ``keep``
    flag, so threshold decisions are auditable. Map-only, zero
    shuffle, whole-stage codegen end-to-end — the cheapest 100-TB
    pass; run it before any shuffle-bearing dedup stage to shrink
    that stage's input. NULL text is treated as '' so the audit
    metrics stay well-defined (0s, not size(null)'s -1 sentinel).

    ``passthrough=True`` carries every input column through alongside
    the metrics, so a gate stage can ``.where("keep")`` and keep its
    payload WITHOUT joining flags back to the source (the flag table
    is corpus-sized — re-attaching it by id would cost a both-sides
    shuffle and defeat the map-only point).
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(F.trim(txt), r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    mean_wlen = F.when(
        n_words > 0,
        F.aggregate(
            words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        )
        / n_words,
    )
    n_symbols = F.size(
        F.regexp_extract_all(txt, F.lit(r"#|\.\.\.|…"), F.lit(0))
    )
    symbol_ratio = F.when(n_words > 0, n_symbols / n_words).otherwise(0.0)
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))) / n_words,
    ).otherwise(0.0)
    lines = F.filter(F.split(txt, "\n"), lambda ln: F.trim(ln) != "")
    n_lines = F.size(lines)
    bullet_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(lines, lambda ln: F.trim(ln).rlike(r"^[•\-\*•]"))
        )
        / n_lines,
    ).otherwise(0.0)
    ellipsis_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda ln: F.trim(ln).rlike(r"(\.\.\.|…)$")))
        / n_lines,
    ).otherwise(0.0)
    lowered = F.transform(words, lambda w: F.lower(w))
    stop_hits = F.lit(0)
    for sw in stopwords:
        stop_hits = stop_hits + F.array_contains(lowered, sw).cast("int")
    m = {
        "n_words": n_words,
        "mean_word_len": F.round(mean_wlen, 6),
        "symbol_ratio": F.round(symbol_ratio, 6),
        "bullet_frac": F.round(bullet_frac, 6),
        "ellipsis_frac": F.round(ellipsis_frac, 6),
        "alpha_word_frac": F.round(alpha_frac, 6),
        "stopword_hits": stop_hits,
    }
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & mean_wlen.between(min_mean_word_len, max_mean_word_len)
        & (symbol_ratio <= max_symbol_word_ratio)
        & (bullet_frac <= max_bullet_frac)
        & (ellipsis_frac <= max_ellipsis_frac)
        & (alpha_frac >= min_alpha_word_frac)
        & (stop_hits >= min_stopword_hits)
    )
    if passthrough:
        # `*` + metric columns: a clash would produce duplicate /
        # ambiguous names and a downstream where('keep') could bind
        # the WRONG column — fail fast instead
        clashes = sorted(set(docs.columns) & (set(m) | {"keep"}))
        if clashes:
            raise ValueError(
                "gopher_quality_filter(passthrough=True): input "
                f"columns collide with metric names {clashes}; rename "
                "them or run with passthrough=False and join by id"
            )
    lead = [F.col("*")] if passthrough else [F.col(id_col)]
    return docs.select(
        *lead,
        *[c.alias(name) for name, c in m.items()],
        F.coalesce(keep, F.lit(False)).alias("keep"),
    )


def mixture_resample(
    df: DataFrame,
    source_col: str,
    id_col: str,
    target_shares: dict[str, float],
    salt: str = "mixture",
    weight_col: str | None = None,
) -> DataFrame:
    """Downsample sources toward a target mixture without RNG.

    Given target shares (summing to ≤ 1 over the sources present),
    computes the largest output size achievable without UPsampling any
    source — scale = min over sources of count_s / share_s — then
    keeps each source at rate (share_s · scale / count_s) via the
    salted-hash Bernoulli from operators.sampling (reproducible
    across engines/partitionings; the DuckDB oracle replays it).

    ``weight_col`` switches the shares from row counts to a weighted
    mass — pass a token-count column and the target shares become
    TOKEN shares, which is what LM pretraining mixtures actually
    specify (the Pile/ROOTS weight by tokens, not documents). The
    Bernoulli keep still samples documents; in expectation each
    source's kept mass hits its weighted target. NULL weights count
    as zero mass (the row can still be kept — it contributes
    nothing to the mixture either way); a positive-share source
    whose total mass is zero or all-NULL is treated as absent
    (dropped, never allowed to collapse ``scale`` to 0 and empty
    every other source).

    Driver-side state is the per-source rate table (|sources| rows —
    tiny by contract); the data path is one count aggregation plus a
    map-only hash filter. Sources absent from ``target_shares`` are
    dropped (share 0).
    """
    mass = (
        F.sum(F.coalesce(F.col(weight_col), F.lit(0))).alias("n")
        if weight_col
        else F.count(F.lit(1)).alias("n")
    )
    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(source_col).alias("s")).agg(mass).collect()
    }
    # `counts.get(s)` is falsy for absent, zero-mass, and (defensive)
    # None — all treated as "source not present"
    usable = [
        counts[s] / share
        for s, share in target_shares.items()
        if share > 0 and counts.get(s)
    ]
    if not usable:
        raise ValueError(
            "mixture_resample: no positive-share source in target_shares "
            f"exists in the corpus (targets={sorted(target_shares)}, "
            f"present={sorted(counts)})"
        )
    scale = min(usable)
    rate = None
    for s, share in target_shares.items():
        if not counts.get(s):
            continue
        r = min(1.0, share * scale / counts[s])
        cond = F.col(source_col) == s
        rate = F.when(cond, r) if rate is None else rate.when(cond, r)
    rate = F.lit(0.0) if rate is None else rate.otherwise(F.lit(0.0))
    return df.where(hash_uniform(id_col, salt) < rate)


def split_leakage_report(
    docs: DataFrame,
    split_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-duplicate LEAKAGE between dataset splits: pairs of
    documents in DIFFERENT splits that MinHash-LSH flags as near-dups
    — the check that catches an eval set contaminated by its own
    training split (hash_split guarantees disjoint IDs, not disjoint
    CONTENT; this closes that gap).

    Reuses the banded-LSH pair generation from ``operators/dedup``
    (never all-pairs), then keeps only cross-split pairs. Output:
    one row per (split_a, split_b) pair with the leaked-pair count
    and example ids — per-pair detail is one filter away for
    remediation. Empty result = no detected leakage at the LSH
    sensitivity chosen.
    """
    from rialto_airflow_spark.operators.dedup import minhash_near_dups

    pairs = minhash_near_dups(
        docs, id_col, text_col, num_perm=num_perm, bands=bands,
        shingle_n=shingle_n,
    )
    labels = docs.select(F.col(id_col), F.col(split_col))
    labeled = (
        pairs.join(
            labels.withColumnRenamed(id_col, "id_a").withColumnRenamed(
                split_col, "split_a"
            ),
            "id_a",
        )
        .join(
            labels.withColumnRenamed(id_col, "id_b").withColumnRenamed(
                split_col, "split_b"
            ),
            "id_b",
        )
        .where(F.col("split_a") != F.col("split_b"))
    )
    # canonical orientation so (train, eval) and (eval, train) merge
    a_first = F.col("split_a") <= F.col("split_b")
    oriented = labeled.select(
        F.when(a_first, F.col("split_a")).otherwise(F.col("split_b")).alias(
            "split_a"
        ),
        F.when(a_first, F.col("split_b")).otherwise(F.col("split_a")).alias(
            "split_b"
        ),
        F.when(a_first, F.col("id_a")).otherwise(F.col("id_b")).alias("id_a"),
        F.when(a_first, F.col("id_b")).otherwise(F.col("id_a")).alias("id_b"),
    )
    return oriented.groupBy("split_a", "split_b").agg(
        F.count(F.lit(1)).alias("n_leaked_pairs"),
        F.slice(
            F.array_sort(F.collect_set(F.col("id_a"))), 1, 10
        ).alias("example_ids"),
    )
