"""Curation operators vs DuckDB oracles + hand-computed fixtures.

Every oracle replays the operator's exact deterministic definition in
SQL (same regexes, same md5 hash threshold), so these are the same
class of gate the driver applies to the registered queries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rialto_airflow_spark.operators import curation as C
from rialto_airflow_spark.session import load_tables
from tests.oracle_util import compare

# DuckDB 2-gram list over whitespace tokens, 1-based inclusive slices
_GRAMS2 = (
    "list_transform(range(1, greatest(len(w), 1)), i -> concat(w[i], ' ', w[i+1]))"
)


def test_repetition_stats_oracle(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    out = docs.select(
        "doc_id", C.repetition_stats("text", n=2).alias("r")
    ).select(
        "doc_id",
        F.col("r.dup_ngram_frac").alias("dup_ngram_frac"),
        F.col("r.top_ngram_frac").alias("top_ngram_frac"),
    )
    sql = f"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
      FROM documents
    ), grams AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 2 THEN {_GRAMS2}
                  ELSE [] END AS g
      FROM toks
    )
    SELECT doc_id,
           CASE WHEN len(g) > 0
                THEN round(1 - len(list_distinct(g)) / len(g)::DOUBLE, 6)
                ELSE 0.0 END AS dup_ngram_frac,
           CASE WHEN len(g) > 0
                THEN round(list_max(list_transform(list_distinct(g),
                       d -> len(list_filter(g, x -> x = d)))) / len(g)::DOUBLE, 6)
                ELSE 0.0 END AS top_ngram_frac
    FROM grams
    """
    compare(out, sql, sf_dir, "repetition_stats")


def _with_pii(docs):
    """Inject deterministic PII spans (the corpus itself is clean)."""
    injected = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.col("text"), F.lit(" contact bob@example.com now")),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(F.lit("from 10.0.0.1 and 192.168.1.255 : "), F.col("text")),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.col("text"), F.lit(" call +1 555-867-5309 or 650-123-4567")),
        )
        .otherwise(F.col("text"))
    )
    return docs.select("doc_id", injected.alias("text"))


_PII_INJECT_SQL = """
      SELECT doc_id,
             CASE doc_id % 4
               WHEN 0 THEN text || ' contact bob@example.com now'
               WHEN 1 THEN 'from 10.0.0.1 and 192.168.1.255 : ' || text
               WHEN 2 THEN text || ' call +1 555-867-5309 or 650-123-4567'
               ELSE text END AS text
      FROM documents
"""


def test_pii_stats_and_scrub_oracle(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    pii = _with_pii(docs)
    out = pii.withColumn("p", C.pii_stats("text")).select(
        "doc_id",
        F.col("p.n_emails").alias("n_emails"),
        F.col("p.n_ips").alias("n_ips"),
        F.col("p.n_phones").alias("n_phones"),
        F.md5(C.pii_scrub("text")).alias("scrub_md5"),
    )
    sql = f"""
    WITH pii AS ({_PII_INJECT_SQL})
    SELECT doc_id,
           len(regexp_extract_all(text, '{C.EMAIL_RE}'))::BIGINT AS n_emails,
           len(regexp_extract_all(text, '{C.IPV4_RE}'))::BIGINT AS n_ips,
           len(regexp_extract_all(text, '{C.PHONE_RE}'))::BIGINT AS n_phones,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
               '{C.EMAIL_RE}', '<EMAIL>', 'g'),
               '{C.IPV4_RE}', '<IP>', 'g'),
               '{C.PHONE_RE}', '<PHONE>', 'g')) AS scrub_md5
    FROM pii
    """
    compare(out, sql, sf_dir, "pii")


def test_pii_scrub_masks_everything(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b+c@x-y.co.uk ip 1.2.3.4 tel 555-123-4567 ok")],
        ["id", "text"],
    )
    row = df.select(
        C.pii_scrub("text").alias("s"), C.pii_stats("text").alias("p")
    ).first()
    assert row.s == "mail <EMAIL> ip <IP> tel <PHONE> ok"
    assert (row.p.n_emails, row.p.n_ips, row.p.n_phones) == (1, 1, 1)


def test_decontaminate_oracle(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    bench = docs.where(F.col("doc_id") % 97 == 0)
    out = C.decontaminate(docs, bench, n=5).select(
        "doc_id", "contaminated"
    )
    grams5 = (
        "list_transform(range(1, greatest(len(w) - 3, 1)),"
        " i -> array_to_string(w[i:i+4], ' '))"
    )
    sql = f"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
      FROM documents
    ), grams AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 5 THEN {grams5} ELSE [] END AS g
      FROM toks
    ), bench AS (
      SELECT DISTINCT unnest(g) AS gram FROM grams WHERE doc_id % 97 = 0
    ), hits AS (
      SELECT DISTINCT d.doc_id
      FROM (SELECT doc_id, unnest(g) AS gram FROM grams) d
      JOIN bench USING (gram)
    )
    SELECT doc_id, EXISTS (SELECT 1 FROM hits h WHERE h.doc_id = documents.doc_id)
           AS contaminated
    FROM documents
    """
    compare(out, sql, sf_dir, "decontaminate")
    # benchmark members share their own shingles → all flagged
    flagged = {r.doc_id for r in out.where("contaminated").collect()}
    assert {r.doc_id for r in bench.select("doc_id").collect()} <= flagged


def test_boilerplate_lines_fixture(spark):
    docs = spark.createDataFrame(
        [
            (1, "keep one\ncookie banner\nkeep two"),
            (2, "cookie banner\nunique line"),
            (3, "cookie banner\ncookie banner\nother text"),
            (4, "all mine"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r.clean_text
        for r in C.boilerplate_lines(docs, min_docs=3).collect()
    }
    # 'cookie banner' occurs in 3 distinct docs → dropped everywhere,
    # including BOTH copies inside doc 3; order preserved elsewhere
    assert out == {
        1: "keep one\nkeep two",
        2: "unique line",
        3: "other text",
        4: "all mine",
    }


def test_boilerplate_lines_oracle(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    # token granularity (sep=' '): drops tokens present in >= 40% of docs
    n_docs = docs.count()
    k = max(2, int(n_docs * 0.4))
    out = C.boilerplate_lines(docs, min_docs=k, sep=" ")
    sql = f"""
    WITH lines AS (
      SELECT doc_id, u.line, u.pos
      FROM (
        SELECT doc_id,
               regexp_split_to_array(text, ' ') AS arr
        FROM documents
      ), LATERAL (
        SELECT unnest(arr) AS line,
               generate_subscripts(arr, 1) AS pos
      ) u
    ), common AS (
      SELECT line FROM lines GROUP BY line
      HAVING count(DISTINCT doc_id) >= {k}
    ), kept AS (
      SELECT * FROM lines WHERE line NOT IN (SELECT line FROM common)
    ), rebuilt AS (
      SELECT doc_id, string_agg(line, ' ' ORDER BY pos) AS clean_text
      FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id, coalesce(r.clean_text, '') AS clean_text
    FROM documents d LEFT JOIN rebuilt r USING (doc_id)
    """
    compare(out, sql, sf_dir, "boilerplate_lines")


def test_mixture_resample_oracle(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    shares = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    out = C.mixture_resample(docs, "source", "doc_id", shares).select(
        "doc_id", "source"
    )
    cases = ", ".join(f"('{s}', {v})" for s, v in shares.items())
    sql = f"""
    WITH shares(source, share) AS (VALUES {cases}),
    counts AS (
      SELECT source, count(*)::DOUBLE AS n FROM documents GROUP BY source
    ), scale AS (
      SELECT min(n / share) AS sc FROM counts JOIN shares USING (source)
      WHERE share > 0
    ), rates AS (
      SELECT source, least(1.0, share * (SELECT sc FROM scale) / n) AS rate
      FROM counts JOIN shares USING (source)
    )
    SELECT doc_id, d.source
    FROM documents d JOIN rates USING (source)
    WHERE CAST('0x' || substr(md5(doc_id::VARCHAR || '#mixture'), 1, 8) AS BIGINT)
          / 4294967296.0 < rate
    """
    compare(out, sql, sf_dir, "mixture_resample")
    # output mixture approaches the target shares (±10 pts at small SF)
    mix = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    total = sum(mix.values())
    for s, share in shares.items():
        if s in mix:
            assert abs(mix[s] / total - share) < 0.10, (s, mix, shares)


def test_decontaminate_hashed_matches_strings(spark, sf_dir):
    """hash_shingles=True (xxhash64 codes, ~10x smaller broadcast)
    must flag the identical doc set as the string comparison."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    bench = docs.where(F.col("doc_id") % 97 == 0)
    a = C.decontaminate(docs, bench, n=5).select("doc_id", "contaminated")
    b = C.decontaminate(docs, bench, n=5, hash_shingles=True).select(
        "doc_id", "contaminated"
    )
    assert a.exceptAll(b).unionAll(b.exceptAll(a)).count() == 0


def test_semantic_decontaminate_flags_and_soundness(spark, sf_dir):
    """Embedding-space decontamination: (a) a doc whose vector equals
    a benchmark vector is ALWAYS flagged (identical vectors share the
    base bucket, which is always probed); (b) flagged docs are sound —
    every one truly has cosine >= threshold against some benchmark
    vector (brute-force check); (c) with nprobe maxed the flag set
    equals the brute-force threshold set restricted to bucket reach."""
    import numpy as np

    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    bench = emb.where(F.col("vec_id") % 50 == 0).select("embedding")
    out = C.semantic_decontaminate(
        emb, bench, id_col="vec_id", vec_col="embedding",
        threshold=0.95, bits=8, nprobe=3,
    )
    flagged = {r.vec_id for r in out.where(F.col("contaminated")).collect()}
    assert out.count() == emb.count()  # cardinality preserved

    # (a) benchmark members themselves (identical vectors) all flagged
    members = {r.vec_id for r in emb.where(F.col("vec_id") % 50 == 0).collect()}
    assert members <= flagged

    # (b) soundness: every flagged doc really is >= threshold
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    bvecs = [vecs[i] for i in members]
    def maxcos(v):
        return max(
            float(v @ b / (np.linalg.norm(v) * np.linalg.norm(b))) for b in bvecs
        )
    assert all(maxcos(vecs[i]) >= 0.95 - 1e-9 for i in flagged)

    # (c) nothing above threshold that shares a probed bucket is missed:
    # brute-force threshold set must be a superset of flagged and any
    # difference must be bucket misses, not scoring errors
    above = {i for i, v in vecs.items() if maxcos(v) >= 0.95}
    assert flagged <= above


def _py_c4(text: str, min_words=5, min_sent=3, blocklist=("lorem ipsum",)) -> tuple:
    """Pure-Python model of c4_line_filter."""
    import re

    kept = [
        ln
        for ln in text.split("\n")
        if re.search(r'[.!?"]$', ln.strip())
        and len(re.split(r"\s+", ln.strip())) >= min_words
        and "javascript" not in ln.lower()
    ]
    clean = "\n".join(kept)
    n_sent = len(re.findall(r"[.!?]", clean))
    low = text.lower()
    blocked = any(p in low for p in blocklist) or "{" in text
    return clean, n_sent, (not blocked) and n_sent >= min_sent


def test_c4_line_filter_fixture(spark):
    docs = [
        (1, "This line has five good words.\nshort.\nno terminal punct here at all\n"
            'He said "stop right there now."\nKeep javascript out of here please.'),
        (2, "Lorem Ipsum dolor sit amet filler.\nA perfectly fine sentence right here."),
        (3, "function() { return 1; } is code.\nAnother good sentence is right here."),
        (4, "One good sentence stands alone here.\nA second terminal sentence sits here!\n"
            "And a third one closes it out?"),
    ]
    out = {
        r["doc_id"]: (r["clean_text"], r["n_sentences"], r["keep"])
        for r in C.c4_line_filter(
            spark.createDataFrame(docs, "doc_id long, text string")
        ).collect()
    }
    for i, text in docs:
        assert out[i] == _py_c4(text), f"doc {i}"
    assert out[4][2] is True  # three clean sentences → kept
    assert out[2][2] is False  # brace → dropped
    assert out[1][2] is False  # lorem ipsum → dropped


def test_c4_line_filter_model_on_corpus(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    got = {
        r["doc_id"]: (r["clean_text"], r["n_sentences"], r["keep"])
        for r in C.c4_line_filter(docs).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        assert got[row["doc_id"]] == _py_c4(row["text"]), row["doc_id"]


def _py_dedup_paragraphs(rows, sep="\n\n") -> dict:
    """Keep-first model ordered by (doc_id, pos)."""
    seen: set[str] = set()
    out = {}
    for doc_id, text in sorted(rows):
        kept = []
        for p in text.split(sep):
            if p not in seen:
                seen.add(p)
                kept.append(p)
        out[doc_id] = sep.join(kept)
    return out


def test_dedup_paragraphs_fixture(spark):
    rows = [
        (1, "alpha beta\n\nshared para\n\ngamma"),
        (2, "shared para\n\ndelta\n\nalpha beta"),
        (3, "shared para"),
        (4, "delta"),
    ]
    got = {
        r["doc_id"]: r["clean_text"]
        for r in C.dedup_paragraphs(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert got == _py_dedup_paragraphs(rows)
    assert got[3] == ""  # fully-duplicated doc survives as empty row
    assert got[1] == rows[0][1]  # first doc keeps everything


def test_dedup_paragraphs_model_on_corpus(spark, sf_dir):
    """Sentence-ish granularity on the synthetic corpus (docs are one
    line, so split on '. ' to get real cross-doc duplicates)."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    rows = [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]
    got = {
        r["doc_id"]: r["clean_text"]
        for r in C.dedup_paragraphs(docs, sep=" ").collect()
    }
    assert got == _py_dedup_paragraphs(rows, sep=" ")


def test_duplicate_unit_stats_oracle(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    out = docs.select(
        "doc_id", C.duplicate_unit_stats("text", sep=" ").alias("r")
    ).select(
        "doc_id",
        F.col("r.dup_frac").alias("dup_frac"),
        F.col("r.dup_char_frac").alias("dup_char_frac"),
    )
    sql = """
    WITH u AS (
      SELECT doc_id, string_split(text, ' ') AS units FROM documents
    )
    SELECT doc_id,
           round(1.0 - len(list_distinct(units)) / len(units)::double, 6)
             AS dup_frac,
           round(1.0 - list_aggregate(list_transform(list_distinct(units), x -> length(x)), 'sum')::double
                     / list_aggregate(list_transform(units, x -> length(x)), 'sum')::double, 6)
             AS dup_char_frac
    FROM u
    """
    compare(out, sql, sf_dir)


def test_duplicate_unit_stats_fixture(spark):
    rows = [
        (1, "a\nb\na\nb"),       # 2 of 4 lines duplicate, 2 of 4 chars
        (2, "x\ny\nz"),          # none
        (3, "same\nsame\nsame"),  # 2/3 lines, 8/12 chars
        (4, ""),
    ]
    got = {
        r["doc_id"]: (r["s"]["dup_frac"], r["s"]["dup_char_frac"])
        for r in spark.createDataFrame(rows, "doc_id long, text string")
        .select("doc_id", C.duplicate_unit_stats("text").alias("s"))
        .collect()
    }
    assert got[1] == (0.5, 0.5)
    assert got[2] == (0.0, 0.0)
    assert got[3] == (round(2 / 3, 6), round(8 / 12, 6))
    assert got[4] == (0.0, 0.0)


def test_split_leakage_report_finds_planted_leak(spark, sf_dir):
    """Plant near-verbatim copies of train docs into the eval split —
    the report must surface exactly the cross-split leaks and stay
    silent on a clean split."""
    docs = load_tables(spark, sf_dir, "documents")["documents"].limit(120)
    from rialto_airflow_spark.operators.sampling import hash_split

    split = hash_split(docs, "doc_id", {"train": 0.8, "eval": 0.2})
    # clean baseline: no planted copies -> usually empty; assert no
    # same-split rows ever appear and schema is stable
    base = C.split_leakage_report(split, "split")
    assert base.where(F.col("split_a") == F.col("split_b")).count() == 0

    leaked = split.unionByName(
        split.where((F.col("split") == "train") & (F.col("doc_id") < 20))
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
        .withColumn("split", F.lit("eval"))
    )
    rep = C.split_leakage_report(leaked, "split").collect()
    row = {(r["split_a"], r["split_b"]): r for r in rep}[("eval", "train")]
    assert row["n_leaked_pairs"] >= 10
    assert len(row["example_ids"]) > 0


# ---------------------------------------------------------------------------
# remove_duplicate_spans (Lee et al. ExactSubstr, window factorization)
# ---------------------------------------------------------------------------


def _py_remove_spans(rows, window):
    """Keep-first model: stride-1 token windows keyed by their token
    tuple; non-first occurrences mark [start, start+window) for
    removal; overlapping marks merge; docs rebuild space-joined."""
    toks = {i: (t.strip().split() if t.strip() else [""]) for i, t in rows}
    first: dict[tuple, tuple] = {}
    count: dict[tuple, int] = {}
    for i in sorted(toks):
        w = toks[i]
        for s in range(len(w) - window + 1):
            key = tuple(w[s : s + window])
            count[key] = count.get(key, 0) + 1
            if key not in first:
                first[key] = (i, s)
    out = {}
    for i in sorted(toks):
        w = toks[i]
        marked = [False] * len(w)
        for s in range(len(w) - window + 1):
            key = tuple(w[s : s + window])
            if count[key] >= 2 and first[key] != (i, s):
                for p in range(s, s + window):
                    marked[p] = True
        kept = [w[p] for p in range(len(w)) if not marked[p]]
        n_real = sum(1 for tkn in w if tkn != "")
        out[i] = (" ".join(kept), n_real, len(w) - len(kept))
    return out


def test_remove_duplicate_spans_fixture(spark):
    passage = "the quick brown fox jumps over the lazy dog again"  # 10 toks
    rows = [
        (1, f"doc one starts here {passage} and then ends with unique words"),
        (2, f"totally different opening before {passage} trailing tail text"),
        (3, f"{passage} {passage}"),  # within-doc repeat: second copy goes
        (4, "no duplicated content lives in this document at all"),
        (5, ""),
    ]
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in C.remove_duplicate_spans(
            spark.createDataFrame(rows, "doc_id long, text string"),
            window=10,
        ).collect()
    }
    want = _py_remove_spans(rows, window=10)
    assert got == want
    assert got[1][2] == 0  # first occurrence keeps the passage
    assert got[2][2] == 10  # later doc loses exactly the passage
    # doc1 holds the global first occurrence, so BOTH of doc3's
    # copies are non-first -> all 20 tokens removed
    assert got[3][2] == 20
    assert got[4][2] == 0 and got[5][2] == 0


def test_remove_duplicate_spans_model_on_corpus(spark, sf_dir):
    """Synthetic corpus + planted cross-doc duplicate passages; the
    operator must equal the pure-Python keep-first model everywhere."""
    docs = load_tables(spark, sf_dir, "documents")["documents"].limit(80)
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(
                    " this shared duplicated passage runs twelve whitespace tokens long for detection margin"
                ),
            ),
        ).otherwise(F.col("text")),
    )
    rows = [
        (r["doc_id"], r["text"])
        for r in planted.select("doc_id", "text").collect()
    ]
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in C.remove_duplicate_spans(planted, window=10).collect()
    }
    assert got == _py_remove_spans(rows, window=10)
    # the planted passage is 10 tokens: every marked doc after the
    # first loses at least those 10
    marked = sorted(i for i, _ in rows if i % 3 == 0)
    assert all(got[i][2] >= 10 for i in marked[1:])


# ---------------------------------------------------------------------------
# gopher_quality_filter (Rae et al. 2021 §A1.1 document rules)
# ---------------------------------------------------------------------------


def _py_gopher(text, **kw):
    import re

    p = dict(
        min_words=50, max_words=100_000, min_mean_word_len=3.0,
        max_mean_word_len=10.0, max_symbol_word_ratio=0.1,
        max_bullet_frac=0.9, max_ellipsis_frac=0.3,
        min_alpha_word_frac=0.8, min_stopword_hits=2,
    )
    p.update(kw)
    words = [w for w in re.split(r"\s+", text.strip()) if w != ""]
    n = len(words)
    mean_wlen = (sum(len(w) for w in words) / n) if n else None
    n_sym = len(re.findall(r"#|\.\.\.|…", text))
    sym = (n_sym / n) if n else 0.0
    alpha = (
        sum(1 for w in words if re.search("[A-Za-z]", w)) / n if n else 0.0
    )
    lines = [ln for ln in text.split("\n") if ln.strip() != ""]
    nl = len(lines)
    bullet = (
        sum(1 for ln in lines if re.match(r"^[•\-\*]", ln.strip())) / nl
        if nl
        else 0.0
    )
    ell = (
        sum(1 for ln in lines if re.search(r"(\.\.\.|…)$", ln.strip())) / nl
        if nl
        else 0.0
    )
    low = {w.lower() for w in words}
    stops = sum(1 for s in C.GOPHER_STOPWORDS if s in low)
    keep = bool(
        n >= p["min_words"]
        and n <= p["max_words"]
        and mean_wlen is not None
        and p["min_mean_word_len"] <= mean_wlen <= p["max_mean_word_len"]
        and sym <= p["max_symbol_word_ratio"]
        and bullet <= p["max_bullet_frac"]
        and ell <= p["max_ellipsis_frac"]
        and alpha >= p["min_alpha_word_frac"]
        and stops >= p["min_stopword_hits"]
    )
    return (
        n,
        round(mean_wlen, 6) if mean_wlen is not None else None,
        round(sym, 6),
        round(bullet, 6),
        round(ell, 6),
        round(alpha, 6),
        stops,
        keep,
    )


_GOPHER_COLS = (
    "n_words mean_word_len symbol_ratio bullet_frac ellipsis_frac "
    "alpha_word_frac stopword_hits keep".split()
)


def test_gopher_quality_filter_fixture(spark):
    long_good = " ".join(
        ["the quick brown fox jumps over that lazy dog daily"] * 6
    )  # 60 words, stopwords the/that, mean len fine
    rows = [
        (1, long_good),
        (2, "short doc with the and that words only here"),  # < 50 words
        (3, "- " + "\n- ".join(["bullet line item"] * 20)),  # all bullets
        (4, long_good + " ### ### ### ### ### ### ### ..."),  # symbols
        (5, " ".join(["1234 5678 9012"] * 20) + " the that"),  # non-alpha
        (6, ""),
    ]
    got = {
        r["doc_id"]: tuple(r[c] for c in _GOPHER_COLS)
        for r in C.gopher_quality_filter(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    for i, text in rows:
        assert got[i] == _py_gopher(text), f"doc {i}"
    assert got[1][-1] is True
    assert {got[i][-1] for i in (2, 3, 4, 5, 6)} == {False}


def test_gopher_quality_filter_model_on_corpus(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    got = {
        r["doc_id"]: tuple(r[c] for c in _GOPHER_COLS)
        for r in C.gopher_quality_filter(
            docs, min_words=10, min_stopword_hits=1
        ).collect()
    }
    kept = 0
    for row in docs.select("doc_id", "text").collect():
        want = _py_gopher(row["text"], min_words=10, min_stopword_hits=1)
        assert got[row["doc_id"]] == want, row["doc_id"]
        kept += want[-1]
    assert 0 < kept < docs.count()  # thresholds are live: some kept, some dropped


def test_null_text_rows_are_well_defined(spark):
    """Review regression: NULL text must behave as '' — no size(null)
    -1 sentinels in token counts or audit metrics."""
    docs = spark.createDataFrame(
        [(1, None), (2, "the real doc with some words here")],
        "doc_id long, text string",
    )
    spans = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in C.remove_duplicate_spans(docs, window=3).collect()
    }
    assert spans[1] == ("", 0, 0)  # NULL counts zero tokens, none removed
    g = {
        r["doc_id"]: (r["n_words"], r["stopword_hits"], r["keep"])
        for r in C.gopher_quality_filter(docs).collect()
    }
    assert g[1] == (0, 0, False)


def test_mixture_resample_token_weighted(spark):
    """weight_col switches shares to token mass: a source with few
    huge docs and one with many tiny docs hit the same TOKEN share in
    expectation, which row-count shares cannot express."""
    rows = [(i, "big", 1000) for i in range(200)] + [
        (1000 + i, "small", 10) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    out = C.mixture_resample(
        df, "source", "doc_id", {"big": 0.5, "small": 0.5},
        weight_col="n_tok",
    )
    got = {
        r["source"]: r["mass"]
        for r in out.groupBy("source").agg(
            F.sum("n_tok").alias("mass")
        ).collect()
    }
    # 'small' is the binding source (2k tokens); both sources should
    # land near 2k tokens of kept mass (hash Bernoulli: ±40% slack on
    # 200 trials at rate 0.01 for 'big' is generous but the point is
    # magnitude: row-share logic would keep ~2 docs != ~2000 tokens)
    assert got["small"] == 2000  # rate 1.0 — binding source all kept
    assert 800 <= got["big"] <= 3200
    # determinism: identical rerun, identical result
    out2 = C.mixture_resample(
        df, "source", "doc_id", {"big": 0.5, "small": 0.5},
        weight_col="n_tok",
    )
    assert out2.exceptAll(out).count() == 0 and out.exceptAll(out2).count() == 0


def test_mixture_resample_zero_mass_source_is_absent(spark):
    """Review regression: a positive-share source whose weighted mass
    is zero (or all-NULL) must be dropped like an absent source — not
    divide by zero, and not collapse the scale to 0 and empty every
    other source."""
    rows = (
        [(i, "good", 100) for i in range(50)]
        + [(100 + i, "empty", 0) for i in range(10)]
        + [(200 + i, "nulls", None) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok int")
    out = C.mixture_resample(
        df, "source", "doc_id",
        {"good": 0.5, "empty": 0.3, "nulls": 0.2},
        weight_col="n_tok",
    )
    got = {r["source"] for r in out.select("source").distinct().collect()}
    assert got == {"good"}
    assert out.count() == 50  # good is the only binding source: all kept


def test_gopher_passthrough_keeps_payload_without_join(spark):
    """passthrough=True carries input columns through the map-only
    pass — no Exchange, no join — so gate stages keep their payload
    for free."""
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps with that dog", "web")],
        "doc_id long, text string, src string",
    )
    out = C.gopher_quality_filter(
        docs, min_words=5, min_stopword_hits=1, passthrough=True
    )
    assert {"doc_id", "text", "src", "n_words", "keep"} <= set(out.columns)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
    row = out.collect()[0]
    assert row["src"] == "web" and row["keep"] is True


def test_gopher_passthrough_rejects_metric_name_collision(spark):
    """An input column named like a metric ('keep', 'n_words', ...)
    would make passthrough output ambiguous — the gate's
    where('keep') could bind the wrong column. Fail fast instead."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "the quick brown fox", True)],
        "doc_id long, text string, keep boolean",
    )
    with pytest.raises(ValueError, match="collide.*keep"):
        C.gopher_quality_filter(docs, passthrough=True)
    # non-passthrough mode only projects id + metrics — no clash
    assert C.gopher_quality_filter(docs).count() == 1
