"""Deterministic sampling and dataset-split operators.

Training pipelines need sampling that is (a) reproducible across
runs and engines, (b) stable under repartitioning, and (c) cheap.
Spark's ``df.sample`` is none of these (seeded per-partition RNG →
results change with partitioning). Everything here derives the
randomness from a salted md5 of the row's id, so:

  * identical results on any cluster layout, any engine (the DuckDB
    oracles reproduce them bit-for-bit);
  * rows keep their split assignment when the corpus grows — the
    property that keeps eval sets uncontaminated across snapshots;
  * map-only (no shuffle, no RNG state).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DENOM = float(2**32)


def hash_uniform(col: Column | str, salt: str = "") -> Column:
    """Deterministic uniform in [0, 1): first 8 hex chars of
    md5(id '#' salt) scaled by 2^32. ~9.6 decimal digits of
    resolution — plenty for split fractions."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(F.concat_ws("#", c.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") / F.lit(_DENOM)


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: dict[str, float] | None = None,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by cumulative hash threshold.

    ``splits`` maps name → fraction (must sum to ~1; the final split
    absorbs rounding). Assignment depends only on (id, salt).
    """
    splits = splits or {"train": 0.8, "val": 0.1, "test": 0.1}
    u = hash_uniform(id_col, salt)
    names = list(splits)
    expr = None
    acc = 0.0
    for name in names[:-1]:
        acc += splits[name]
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    )
    return df.withColumn(out_col, expr)


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep ~fraction of rows, chosen by hash threshold — stable
    across runs, engines, and partitionings (unlike ``df.sample``)."""
    return df.where(hash_uniform(id_col, salt) < fraction)


def cap_per_group(
    df: DataFrame,
    id_col: str,
    group_cols: list[str],
    k: int,
    salt: str = "cap",
) -> DataFrame:
    """Keep EXACTLY min(k, |group|) rows per group, chosen by
    deterministic hash order — the no-RNG equivalent of per-group
    reservoir sampling, for hard per-source caps in mixture control
    (a training run that wants "at most N docs from domain X"
    regardless of how skewed the crawl is).

    One shuffle on the group key; the per-group selection is a
    row_number window over (hash, id), so results are identical on
    any partitioning/engine. Unlike the fraction-based samplers the
    KEPT SET can change when a group grows past ``k`` (new rows can
    hash below the current cut) — use :func:`deterministic_sample`
    when grow-stability matters more than an exact count.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(*group_cols).orderBy(
        hash_uniform(id_col, salt).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def _gram_buckets(
    text_col: Column | str, n_buckets: int, gram_hash: str = "xxhash64"
) -> Column:
    """Hashed unigram+bigram feature buckets for a whitespace-token
    document: pmod(hash(gram), n_buckets). Pure Column algebra —
    tokens via split, bigrams via a transform over the token range.
    ``gram_hash``: 'xxhash64' (default — fastest, JVM-side) or 'md5'
    (first 8 hex chars as an int) for cross-engine replay: md5 is the
    one hash Spark and SQL oracles share bit-for-bit, which makes the
    whole DSIR pipeline hash-gateable against DuckDB (q37)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.split(F.trim(c), r"\s+")
    # bigrams via zip_with(toks, toks[2:]) — NOT a transform whose
    # lambda element_at's into the outer `toks`: Catalyst does not
    # CSE an outer expression through a higher-order-function lambda,
    # so that shape re-evaluates the full split() PER BIGRAM ELEMENT
    # (O(tokens²) work per document — measured 5 s/pass at sf0.1 vs
    # ~1 s for this one). zip_with pads the shorter side with null;
    # concat_ws would silently swallow the null into a duplicate
    # unigram, so the tail null is made explicit and filtered.
    bigrams = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.size(toks)),
            lambda a, b: F.when(b.isNotNull(), F.concat_ws(" ", a, b)),
        ),
        lambda x: x.isNotNull(),
    )
    grams = F.concat(toks, bigrams)
    if gram_hash == "md5":
        return F.transform(
            grams,
            lambda g: F.pmod(
                F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long"),
                F.lit(n_buckets),
            ),
        )
    return F.transform(
        grams, lambda g: F.pmod(F.xxhash64(g), F.lit(n_buckets))
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    n_buckets: int = 10_000,
    smoothing: float = 1.0,
    out_col: str = "dsir_logw",
    gram_hash: str = "xxhash64",
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023,
    arXiv:2302.03169): score every raw document by how much more
    likely its hashed-ngram features are under the TARGET distribution
    than under the raw distribution —

        log w(doc) = Σ_grams log( p_target[bucket] / p_raw[bucket] )

    with add-``smoothing`` estimates over ``n_buckets`` hashed
    unigram+bigram buckets.

    Distributed shape: two bounded aggregations (target corpus is
    small by contract; the raw pass shuffles ≤ n_buckets count rows)
    produce the two probability vectors driver-side; the log-ratio
    vector then rides into a single ARRAY LITERAL (n_buckets doubles,
    ~80 KB at the default — a broadcast in all but name), and the
    per-document score is a map-only ``aggregate`` over the doc's
    bucket array. No join, no per-doc shuffle; scoring 100 TB is one
    codegen'd scan.
    """
    import math

    # both bucket-count aggregations in ONE job: tag each corpus's
    # exploded buckets with a side marker and group once — the same
    # two scans run (raw + target), but as one action instead of two
    # sequential collect round-trips (the job-count fix measured in
    # OPTIMIZATION_r12; counts, and so probabilities, are identical)
    def tagged(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            F.lit(side).alias("__side"),
            F.explode(
                _gram_buckets(text_col, n_buckets, gram_hash)
            ).alias("b"),
        )

    counts: dict[tuple[str, int], int] = {
        (r["__side"], r["b"]): r["n"]
        for r in tagged(target, "t")
        .unionByName(tagged(raw, "r"))
        .groupBy("__side", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    def probs(side: str) -> list[float]:
        raw_counts = [
            counts.get((side, b), 0) + smoothing for b in range(n_buckets)
        ]
        tot = sum(raw_counts)
        return [x / tot for x in raw_counts]

    p = probs("t")
    q = probs("r")
    logratio = [math.log(pi / qi) for pi, qi in zip(p, q)]
    arr = F.lit(logratio)
    score = F.aggregate(
        _gram_buckets(text_col, n_buckets, gram_hash),
        F.lit(0.0),
        lambda acc, b: acc + F.element_at(arr, (b + 1).cast("int")),
    )
    return raw.withColumn(out_col, score)


def dsir_select(
    scored: DataFrame,
    id_col: str,
    k: int,
    weight_col: str = "dsir_logw",
    salt: str = "dsir",
) -> DataFrame:
    """Gumbel top-k resampling over DSIR log-weights: adding
    Gumbel(0,1) noise to log-weights and taking the top k draws a
    sample WITHOUT replacement proportional to the weights (the
    Gumbel-max trick) — DSIR's resampling step, deterministic here
    because the noise derives from the salted row-id hash, not RNG.

    ``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject —
    per-partition heaps, no global sort."""
    u = hash_uniform(id_col, salt)
    # clamp away from {0,1} so the double log stays finite
    g = -F.log(-F.log(F.greatest(F.least(u, F.lit(1 - 1e-12)), F.lit(1e-12))))
    return (
        scored.withColumn("__key", F.col(weight_col) + g)
        .orderBy(F.col("__key").desc())
        .limit(k)
        .drop("__key")
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_cols: list[str],
    fractions: dict[tuple | str, float],
    default_fraction: float = 0.0,
    salt: str = "strata",
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum (combination
    of ``strata_cols`` values) keeps its own fraction. Map-only —
    the per-stratum fraction is a literal CASE ladder, the threshold
    test a hash compare; no ``sampleBy`` RNG, no shuffle."""
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in strata_cols])
    frac = None
    for stratum, f in fractions.items():
        parts = stratum if isinstance(stratum, tuple) else (stratum,)
        lit_key = "\x1f".join(str(p) for p in parts)
        cond = key == lit_key
        frac = F.when(cond, f) if frac is None else frac.when(cond, f)
    frac = (
        F.lit(default_fraction)
        if frac is None
        else frac.otherwise(default_fraction)
    )
    return df.where(hash_uniform(id_col, salt) < frac)


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
    salt: str = "wsample",
    group_cols: list[str] | None = None,
    key_round: int | None = None,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministic:
    Efraimidis–Spirakis A-ES (2006) — each row gets key
    ``u^(1/w)`` for a hash-uniform ``u`` (equivalently ``ln(u)/w``,
    used here for numeric stability), and the ``n`` LARGEST keys are
    the sample. Inclusion probability is proportional to weight in
    the without-replacement sense; re-running with the same salt
    reproduces the sample exactly, a different salt redraws it —
    the same (id, salt) determinism contract as ``hash_split``, so
    the draw is replayable in SQL and stable under repartitioning.

    The training-data use: sample documents by token count or
    quality weight for a fixed-budget mixture without a full shuffle
    of the corpus. Plan shape: map-side key computation + ONE
    TakeOrdered(n) — never a global sort. With ``group_cols`` the
    top-n applies per group (stratified weighted sampling) via a
    rank window instead — one shuffle on the group key.

    Rows with NULL or non-positive weight are excluded (they have
    zero inclusion probability; ln(u)/w would flip sign for w < 0).
    Ties (identical keys) break on ascending id.

    ``u`` is clamped away from 0 before the log: ``hash_uniform``
    can return exactly 0 (all-zero hash prefix, p = 2^-32 per row),
    and ``F.log(0)`` is NULL, which sorts out of EVERY draw — a
    silent permanent dropout for that (id, salt). The clamp value
    2^-33 sits below the smallest nonzero ``u`` (2^-32), so no
    other row's key ordering changes.

    ``key_round`` (opt-in) rounds the A-ES key to that many decimal
    digits before the top-n — the cross-ENGINE replay affordance:
    ``ln`` is not bit-identical across libms, so two engines replaying
    the same draw could disagree on a candidate sitting within one ulp
    of the cut. Rounding absorbs that jitter; the ties it creates
    break on ascending id identically everywhere. Production leaves it
    None (full-precision keys, same determinism within one engine).
    """
    u = F.greatest(hash_uniform(id_col, salt), F.lit(2.0 ** -33))
    key = F.log(u) / F.col(weight_col).cast("double")
    if key_round is not None:
        key = F.round(key, key_round)
    base = df.where(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn("__wkey", key)
    if group_cols:
        from pyspark.sql.window import Window

        w = Window.partitionBy(*group_cols).orderBy(
            F.col("__wkey").desc(), F.col(id_col).asc()
        )
        return (
            base.withColumn("__wrn", F.row_number().over(w))
            .where(F.col("__wrn") <= n)
            .drop("__wkey", "__wrn")
        )
    return (
        base.orderBy(F.col("__wkey").desc(), F.col(id_col).asc())
        .limit(n)
        .drop("__wkey")
    )


def training_order(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: str = "",
) -> DataFrame:
    """Deterministic global shuffle + shard assignment — the handoff
    from curation to the training data loader (the reference stops at
    a reports DB; a pretraining pipeline ends at ordered shards).
    Adds ``shard_id`` (salted-md5 hash of the id — every row's shard
    depends only on (id, seed), so shards are stable under corpus
    append and replayable across engines, the :func:`hash_split`
    property) and ``pos`` (the row's rank within its shard under an
    independent salt — a uniform random order, NOT corpus order, so
    consecutive training batches never correlate with ingest order).

    Plan shape: one shuffle (the rank window partitions by shard).
    Size ``n_shards`` so a shard fits an executor partition (a few
    GB): the window sorts per shard, never globally — at 100 TB a
    16 Ki-shard layout sorts 16 Ki independent ~6 GB runs instead of
    one 100 TB ordering, and that per-shard sort is exactly the work
    the write needs anyway.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    from pyspark.sql.window import Window

    shard = F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "#", F.col(id_col).cast("string"), F.lit(seed + "shard")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(n_shards),
    ).cast("int")
    w = Window.partitionBy("shard_id").orderBy(
        hash_uniform(id_col, seed + "order").asc(), F.col(id_col).asc()
    )
    return df.withColumn("shard_id", shard).withColumn(
        "pos", (F.row_number().over(w) - 1).cast("long")
    )


def _local_fs_path(path: str) -> str | None:
    """The plain filesystem path behind ``path``, or None when it
    lives on a non-local store (hdfs://, s3a://, …) a driver-side
    footer reader can't open directly — the shared storage-layer
    helper (one implementation for every file-URI consumer)."""
    from rialto_airflow_spark.storage import local_path_from_file_uri

    return local_path_from_file_uri(path)


def _footer_shard_stats(
    path: str, want_tokens: bool
) -> tuple[dict[int, int], dict[int, int]] | None:
    """Per-shard (rows, token totals) from parquet FOOTERS only — the
    zero-row-read certification behind :func:`write_training_shards`.
    Rows come from each file's footer ``num_rows`` (always present);
    token totals from the max column statistic of the monotone
    ``tok_cum`` running offset (a per-shard cumulative sum, so its max
    across the shard's files IS the shard total). Returns None when
    the path isn't a local filesystem or any needed statistic is
    missing — callers fall back to the scan certification."""
    import os

    import pyarrow.parquet as pq

    base = _local_fs_path(path)
    if base is None:
        return None
    rows: dict[int, int] = {}
    toks: dict[int, int] = {}
    for d in sorted(os.listdir(base)):
        if not d.startswith("shard_id="):
            continue
        sid = int(d.split("=", 1)[1])
        nr = 0
        mx: int | None = None
        for f in sorted(os.listdir(os.path.join(base, d))):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(base, d, f)).metadata
            nr += md.num_rows
            if want_tokens:
                for rg in range(md.num_row_groups):
                    row_group = md.row_group(rg)
                    for ci in range(row_group.num_columns):
                        col = row_group.column(ci)
                        if col.path_in_schema != "tok_cum":
                            continue
                        st = col.statistics
                        if st is None or st.max is None:
                            return None  # stats absent → scan path
                        mx = st.max if mx is None else max(mx, st.max)
        rows[sid] = nr
        if want_tokens:
            toks[sid] = int(mx or 0)
    return rows, toks


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    seed: str = "",
    manifest_name: str = "_shards_manifest.json",
    token_col: str | None = None,
    certify: str = "footer",
) -> dict:
    """Materialize :func:`training_order` as one ``shard_id=N`` dir
    per shard, rows sorted by ``pos`` within each data file, plus a
    JSON manifest (seed, n_shards, per-shard row counts) the loader
    reads first — underscore-prefixed so parquet directory scans
    ignore it, like ``_SUCCESS``. The loader contract is COLUMNAR, not file-order:
    ``pos`` is the order authority, so a shard that lands as several
    files (it spans writer partitions) still replays exactly — the
    loader sorts the shard it just read by ``pos``, a shard-sized
    sort by construction. Returns the manifest dict.

    One corpus shuffle total: the rank window's partition-by-shard
    exchange doubles as the write's clustering — every shard's rows
    already share one partition coming out of the window, so the
    write adds only a partition-local sort (no second exchange; an
    explicit repartition(shard_id) here would re-shuffle the whole
    corpus for nothing).

    With ``token_col`` the output also carries ``tok_cum`` — the
    per-shard RUNNING token offset (same window as ``pos``, so it
    costs no extra shuffle). It serves two masters: loaders seek to a
    token position inside a shard without summing prefixes, and the
    manifest certification below reads shard token totals straight
    from its parquet footer max-statistics. Token counts must be
    non-negative (a running sum's max equals its total only then).

    ``certify`` controls how the manifest counts what LANDED (the
    manifest certifies disk, not the plan):

      * ``"footer"`` (default) — parquet footer metadata only:
        ``num_rows`` per file for rows, the ``tok_cum`` max statistic
        for tokens. ZERO data rows read after the write — at a 100 TB
        export the old full re-read doubled the job. Falls back to
        ``"scan"`` when the path isn't local-filesystem or a footer
        statistic is missing.
      * ``"scan"`` — re-read the landed data (column-pruned to
        ``shard_id`` + ``token_col``) and aggregate; the independent
        end-to-end check, opt-in.

    The manifest's ``shard_rows``/``shard_tokens`` are TOTAL over
    ``range(n_shards)``: a shard that received no rows gets an
    explicit 0 entry (and no directory), so a loader iterating
    ``range(n_shards)`` never hits a missing key.
    """
    import json
    import os

    if certify not in ("footer", "scan"):
        raise ValueError(f"certify must be 'footer' or 'scan', got {certify!r}")
    from pyspark.sql.window import Window

    out = training_order(df, id_col, n_shards, seed)
    if token_col is not None:
        w = Window.partitionBy("shard_id").orderBy("pos")
        out = out.withColumn(
            "tok_cum", F.sum(F.col(token_col).cast("long")).over(w)
        )
    (
        out.sortWithinPartitions("shard_id", "pos")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )
    stats = (
        _footer_shard_stats(path, token_col is not None)
        if certify == "footer"
        else None
    )
    if stats is not None:
        counts, toks = stats
    else:
        # scan certification: column-pruned to shard_id (+ token_col)
        written = out.sparkSession.read.parquet(path)
        aggs = [F.count(F.lit(1)).alias("n")]
        if token_col is not None:
            aggs.append(F.sum(token_col).cast("long").alias("tok"))
        per = {
            int(r["shard_id"]): r
            for r in written.groupBy("shard_id").agg(*aggs).collect()
        }
        counts = {k: int(r["n"]) for k, r in per.items()}
        toks = (
            {k: int(r["tok"] or 0) for k, r in per.items()}
            if token_col is not None
            else {}
        )
    counts = {s: counts.get(s, 0) for s in range(n_shards)}
    manifest = {
        "n_shards": n_shards,
        "seed": seed,
        "id_col": id_col,
        "rows": sum(counts.values()),
        "shard_rows": {str(k): counts[k] for k in sorted(counts)},
    }
    if token_col is not None:
        toks = {s: toks.get(s, 0) for s in range(n_shards)}
        manifest["token_col"] = token_col
        manifest["tokens"] = sum(toks.values())
        manifest["shard_tokens"] = {str(k): toks[k] for k in sorted(toks)}
    # write through the session's Hadoop FileSystem, not builtin
    # open(): ``path`` is wherever the parquet just landed (file://,
    # hdfs://, s3a://) and a local-only manifest write would leave a
    # cluster export half-finished — shards on the store, the file
    # the loader reads FIRST missing
    sc = out.sparkSession.sparkContext
    jvm = sc._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(os.path.join(path, manifest_name))
    fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
    stream = fs.create(jpath, True)
    try:
        stream.write(bytearray(json.dumps(manifest, sort_keys=True).encode()))
    finally:
        stream.close()
    return manifest
