"""Edge-case tests for the text operators: short/degenerate documents
through shingling, fingerprints, and winnowing. (The driver corpus
has no short docs, so these paths are invisible to the oracle gate —
an unguarded sequence(0, size-n) used to throw on them.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from rialto_airflow_spark.operators import text as T


def _one(spark, text, expr, alias="o"):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(expr.alias(alias)).collect()[0][alias]


def test_ngram_strings_short_docs(spark):
    assert _one(spark, "one two three four", T.ngram_strings("text", 3)) == [
        "one two three",
        "two three four",
    ]
    assert _one(spark, "one two three", T.ngram_strings("text", 3)) == [
        "one two three"
    ]
    # fewer tokens than n -> empty, not junk windows / runtime error
    assert _one(spark, "one two", T.ngram_strings("text", 3)) == []
    assert _one(spark, "one", T.ngram_strings("text", 3)) == []
    assert _one(spark, "", T.ngram_strings("text", 3)) == []


def test_fingerprint_short_docs(spark):
    assert _one(spark, "a b", T.fingerprint("text", n=3, k=4)) == ""
    fp = _one(spark, "a b c d e f", T.fingerprint("text", n=3, k=4))
    assert fp.count("|") == 3  # 4 shingles -> 4 hashes, k=4


def test_winnow_fingerprint_windows(spark):
    # 7 tokens -> 5 shingles -> 2 windows of 4; each emits its min
    text = "t1 t2 t3 t4 t5 t6 t7"
    wfp = _one(spark, text, T.winnow_fingerprint("text", n=3, window=4, k=8))
    assert 1 <= len(wfp.split("|")) <= 2
    # fewer shingles than the window -> single global-min window
    short = _one(spark, "a b c d", T.winnow_fingerprint("text", n=3, window=4))
    assert len(short.split("|")) == 1 and short != ""
    # shorter than n -> empty fingerprint
    assert _one(spark, "a b", T.winnow_fingerprint("text", n=3, window=4)) == ""


def test_winnow_positional_coverage(spark):
    """An inserted passage ALWAYS perturbs the winnow sketch of the
    region, while a k-min sketch can miss it: every window of the
    modified doc still contributes a min, so sketches of doc vs
    doc-with-insertion share most-but-not-all hashes."""
    base = " ".join(f"w{i}" for i in range(40))
    edited = " ".join(
        [f"w{i}" for i in range(20)] + ["INS1 INS2 INS3"] + [f"w{i}" for i in range(20, 40)]
    )
    a = set(_one(spark, base, T.winnow_fingerprint("text", k=64)).split("|"))
    b = set(_one(spark, edited, T.winnow_fingerprint("text", k=64)).split("|"))
    assert a != b
    overlap = len(a & b) / len(a | b)
    assert overlap > 0.5  # still recognizably the same document


def test_winnow_near_dups_fixture(spark):
    """Docs sharing a long passage pair up; unrelated docs don't; an
    inserted paragraph can't break the match (positional coverage)."""
    from rialto_airflow_spark.operators import dedup as D

    passage = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, passage),
            (2, passage + " with a tiny suffix added"),
            (3, "completely unrelated text about spark physical plans"),
            (4, "INSERTED INTRO PARAGRAPH here then " + passage),
        ],
        ["doc_id", "text"],
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in D.winnow_near_dups(
            docs, "doc_id", "text", min_shared=2
        ).collect()
    }
    assert (1, 2) in pairs and (1, 4) in pairs and (2, 4) in pairs
    assert not any(3 in p for p in pairs)


def test_winnow_near_dups_oracle(spark, sf_dir):
    """Pair set + shared counts replayed by DuckDB over the near-dup
    corpus (each tiled copy shares nearly all fingerprints with its
    original)."""
    from rialto_airflow_spark.operators import dedup as D
    from rialto_airflow_spark.plans.llm_queries import (
        SQL_NEAR_CORPUS,
        _spark_near_corpus,
    )
    from tests.oracle_util import compare

    corpus = _spark_near_corpus(spark, str(sf_dir))
    out = D.winnow_near_dups(corpus, "doc_id", "text", min_shared=2)
    sql = f"""
    WITH corpus AS ({SQL_NEAR_CORPUS}),
    sh AS (
      SELECT doc_id,
             list_transform(
               range(1, greatest(len(regexp_split_to_array(trim(text), '\\s+')) - 2, 0) + 1),
               i -> md5(array_to_string(
                      regexp_split_to_array(trim(text), '\\s+')[i:i+2], ' '))
             ) AS h
      FROM corpus
    ),
    wins AS (
      SELECT doc_id,
             CASE WHEN len(h) >= 4 THEN
               list_transform(range(1, len(h) - 2),
                              i -> list_aggregate(h[i:i+3], 'min'))
             WHEN len(h) > 0 THEN [list_aggregate(h, 'min')]
             ELSE []::VARCHAR[] END AS mins
      FROM sh
    ),
    fps AS (
      SELECT doc_id, unnest(list_sort(list_distinct(mins))[1:8]) AS h
      FROM wins
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
    FROM fps a JOIN fps b ON a.h = b.h AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= 2
    """
    assert out.count() > 0  # the tiled near-dups guarantee pairs
    compare(out, sql, str(sf_dir), "winnow_near_dups")


def test_char_lm_train_and_score_oracle(spark, sf_dir):
    """train_char_lm + lm_score replayed end-to-end by DuckDB: same
    gram extraction, same deterministic top-k cut (count desc, gram
    asc), same unk floor, same per-doc mean. top_k=500 makes the cut
    bite so the tie-break is exercised."""
    from rialto_airflow_spark.operators import text as T
    from rialto_airflow_spark.session import load_tables
    from tests.oracle_util import compare

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    model = T.train_char_lm(docs, "text", n=3, top_k=500)
    out = T.lm_score(docs, "doc_id", "text", model, n=3, unk_logp=-20.0)

    sql = """
    WITH grams AS (
      SELECT doc_id, unnest(
        CASE WHEN length(text) >= 3 THEN
          list_transform(range(1, length(text) - 2 + 1), i -> substr(text, i, 3))
        ELSE []::VARCHAR[] END
      ) AS gram
      FROM documents
    ),
    counts AS (
      SELECT gram, count(*) AS cnt FROM grams GROUP BY gram
    ),
    model AS (
      SELECT gram,
             round(ln(cnt / (SELECT sum(cnt)::DOUBLE FROM counts)), 6) AS logp
      FROM counts
      ORDER BY cnt DESC, gram ASC
      LIMIT 500
    ),
    scored AS (
      SELECT g.doc_id,
             count(*) AS n_grams,
             round(avg(coalesce(m.logp, -20.0)), 4) AS avg_logp
      FROM grams g LEFT JOIN model m USING (gram)
      GROUP BY g.doc_id
    )
    SELECT d.doc_id,
           coalesce(s.n_grams, 0) AS n_grams,
           s.avg_logp
    FROM documents d LEFT JOIN scored s USING (doc_id)
    """
    # sanity before the bit-compare: every doc scored, fluent docs
    # above the unk floor
    rows = out.collect()
    assert len(rows) == docs.count()
    assert all(r.avg_logp is None or -20.0 <= r.avg_logp <= 0.0 for r in rows)
    compare(out, sql, str(sf_dir), "char_lm_score")


def test_char_ngrams_edges(spark):
    from rialto_airflow_spark.operators import text as T

    df = spark.createDataFrame(
        [(1, "abcd"), (2, "ab"), (3, ""), (4, None)], ["i", "t"]
    )
    got = {r.i: r.g for r in df.select("i", T.char_ngrams("t", 3).alias("g")).collect()}
    assert got[1] == ["abc", "bcd"]
    assert got[2] == [] and got[3] == []
    assert got[4] is None or got[4] == []  # null text -> null/empty, never error


def test_bm25_scores_oracle(spark, sf_dir):
    """bm25_scores replayed by DuckDB end-to-end: same literal-term
    tf columns, same one-row df/N/avgdl stats, same Robertson idf with
    the +1 floor, same k1/b saturation."""
    from rialto_airflow_spark.operators import text as T
    from rialto_airflow_spark.session import load_tables
    from tests.oracle_util import compare

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    out = T.bm25_scores(docs, "doc_id", "text", "hash join missingterm")

    toks = r"regexp_split_to_array(trim(text), '\s+')"
    sql = f"""
    WITH base AS (
      SELECT doc_id,
             (CASE WHEN trim(text) = '' THEN 0 ELSE len({toks}) END)::BIGINT AS doc_len,
             len(list_filter({toks}, x -> x = 'hash')) AS tf0,
             len(list_filter({toks}, x -> x = 'join')) AS tf1,
             len(list_filter({toks}, x -> x = 'missingterm')) AS tf2
      FROM documents
    ),
    st AS (
      SELECT count(*)::BIGINT AS n, avg(doc_len) AS avgdl,
             count(*) FILTER (tf0 > 0)::BIGINT AS df0,
             count(*) FILTER (tf1 > 0)::BIGINT AS df1,
             count(*) FILTER (tf2 > 0)::BIGINT AS df2
      FROM base
    )
    SELECT b.doc_id, b.doc_len,
           round(
               ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0)
                 * (tf0 * 2.2 / (tf0 + 1.2 * (0.25 + 0.75 * b.doc_len / avgdl)))
             + ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0)
                 * (tf1 * 2.2 / (tf1 + 1.2 * (0.25 + 0.75 * b.doc_len / avgdl)))
             + ln((n - df2 + 0.5) / (df2 + 0.5) + 1.0)
                 * (tf2 * 2.2 / (tf2 + 1.2 * (0.25 + 0.75 * b.doc_len / avgdl))),
           4) AS score
    FROM base b CROSS JOIN st
    """
    rows = out.collect()
    assert len(rows) == docs.count()
    assert any(r.score > 0 for r in rows)  # the query terms do occur
    compare(out, sql, str(sf_dir), "bm25_scores")


def test_bm25_ranks_term_density(spark):
    """A short doc dense in the query term outranks a long one with a
    single occurrence; docs without the term score 0."""
    from rialto_airflow_spark.operators import text as T

    df = spark.createDataFrame(
        [
            (1, "spark spark spark"),
            (2, "spark " + "filler " * 50),
            (3, "nothing relevant here"),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.score for r in T.bm25_scores(df, "doc_id", "text", "spark").collect()}
    assert got[1] > got[2] > got[3] == 0.0


def test_char_entropy_matches_python_model(spark, sf_dir):
    import math
    from collections import Counter

    from rialto_airflow_spark.session import load_tables

    docs = load_tables(spark, sf_dir, "documents")["documents"].limit(80)
    got = {
        r["doc_id"]: r["h"]
        for r in docs.select("doc_id", T.char_entropy("text").alias("h")).collect()
    }

    def model(s: str) -> float:
        n = len(s)
        if not n:
            return 0.0
        return round(
            -sum(c / n * math.log2(c / n) for c in Counter(s).values()), 6
        )

    for r in docs.select("doc_id", "text").collect():
        assert abs(got[r["doc_id"]] - model(r["text"])) < 1e-9, r["doc_id"]


def test_char_entropy_edges(spark):
    rows = [(1, ""), (2, "aaaa"), (3, "ab"), (4, None)]
    got = {
        r["i"]: r["h"]
        for r in spark.createDataFrame(rows, "i long, t string")
        .select("i", T.char_entropy("t").alias("h"))
        .collect()
    }
    assert got[1] == 0.0 and got[2] == 0.0 and got[3] == 1.0
    assert got[4] == 0.0  # null folds with empty: no characters


def test_compression_ratio_orders_redundancy(spark):
    rows = [
        (1, "spam " * 400),
        (2, "the quick brown fox jumps over the lazy dog " * 40),
        (3, "".join(chr(33 + (i * 37) % 90) for i in range(2000))),
    ]
    got = {
        r["i"]: r["cr"]
        for r in spark.createDataFrame(rows, "i long, t string")
        .select("i", T.compression_ratio("t").alias("cr"))
        .collect()
    }
    import zlib

    for i, t in rows:
        want = round(len(zlib.compress(t.encode())) / len(t.encode()), 6)
        assert got[i] == want
    assert got[1] < got[2] < got[3]


def test_clean_text_unicode_and_control(spark):
    import unicodedata

    rows = [
        (1, "café time"),            # decomposed accent -> NFC
        (2, "a\x00b\x08c\x7fd"),           # control bytes stripped
        (3, "keep\ttabs\nand\rnewlines"),
        (4, "ﬁne"),                    # fi ligature: NFC keeps, NFKC folds
        (5, "a    b"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    got = {
        r["i"]: r["c"]
        for r in df.select(
            "i", T.clean_text("t", collapse_spaces=True).alias("c")
        ).collect()
    }
    assert got[1] == unicodedata.normalize("NFC", "café time") == "café time"
    assert got[2] == "abcd"
    assert got[3] == "keep\ttabs\nand\rnewlines"
    assert got[4] == "ﬁne"
    assert got[5] == "a b"
    assert got[6] is None
    nfkc = {
        r["i"]: r["c"]
        for r in df.select("i", T.clean_text("t", form="NFKC").alias("c")).collect()
    }
    assert nfkc[4] == "fine"
    # column-algebra-only path (form=None) strips without normalizing
    plain = {
        r["i"]: r["c"]
        for r in df.select("i", T.clean_text("t", form=None).alias("c")).collect()
    }
    assert plain[1] == "café time"
    assert plain[2] == "abcd"


def test_bm25_null_and_blank_docs_score_zero(spark):
    df = spark.createDataFrame(
        [(1, "spark query engine"), (2, ""), (3, None), (4, "   ")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["doc_len"], r["score"])
        for r in T.bm25_scores(df, "doc_id", "text", "spark engine").collect()
    }
    assert got[1][0] == 3 and got[1][1] > 0
    assert got[2] == (0, 0.0)
    assert got[3] == (0, 0.0)
    assert got[4] == (0, 0.0)
