"""Training-sequence preparation: token-window chunking and
fixed-budget sequence packing.

Every LLM training pipeline ends with these two steps: long documents
split into model-context-sized chunks (with optional overlap so no
span is only ever seen cut in half), and the chunk stream packed into
fixed-length training sequences so padding doesn't waste FLOPs.
Neither exists in the reference (SURVEY §2 covers none of the
training-data family) — they are part of the beyond-reference
pipeline operators this engine adds.

Scale design:
  * ``chunk_documents`` is PURE Column algebra (split → window starts
    via ``sequence`` → ``slice`` + ``array_join``) — map-only, stays
    in whole-stage codegen, fans 1→N rows without Python.
  * ``pack_sequences`` is per-partition first-fit-decreasing via
    ``mapInPandas``: bins never span partitions, so packing is
    embarrassingly parallel and deterministic given the partitioning;
    the waste vs a (NP-hard) global packing is bounded because FFD
    within any partition wastes < budget per OPEN bin and each
    partition holds at most ``bins_open`` open bins at a time. At 100
    TB, per-partition packing is the only shape that doesn't shuffle
    the corpus by bin — the standard practice (data loaders pack per
    shard for exactly this reason).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rialto_airflow_spark.operators.text import tokens


def chunk_documents(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 512,
    stride: int | None = None,
) -> DataFrame:
    """Fan each document out to token-window chunks: windows of
    ``chunk_tokens`` whitespace tokens starting every ``stride``
    tokens (default: ``chunk_tokens``, i.e. disjoint; a smaller
    stride overlaps). Returns (id, chunk_idx, n_tokens, chunk_text).

    Trailing windows that would start at-or-past the end are not
    emitted; a final partial window IS emitted (its ``n_tokens`` <
    chunk_tokens), so every token appears in ≥ 1 chunk. Empty/blank
    documents emit zero chunks. Map-only, zero Python.
    """
    stride = stride or chunk_tokens
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = tokens(text_col)
    n = F.when(F.trim(F.col(text_col)) == "", F.lit(0)).otherwise(F.size(toks))
    starts = F.when(
        n > 0,
        F.sequence(
            F.lit(0),
            # last start: the largest multiple of stride < n
            ((n - 1) / stride).cast("long") * stride,
            F.lit(stride),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return (
        docs.select(
            F.col(id_col),
            toks.alias("__t"),
            F.posexplode(starts).alias("chunk_idx", "__s"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.least(
                F.lit(chunk_tokens), F.size("__t") - F.col("__s")
            ).cast("int").alias("n_tokens"),
            F.array_join(
                F.slice(F.col("__t"), F.col("__s") + 1, F.lit(chunk_tokens)),
                " ",
            ).alias("chunk_text"),
        )
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    len_col: str,
    budget: int,
) -> DataFrame:
    """Pack items (chunks/documents with a token length) into bins of
    capacity ``budget`` by first-fit-decreasing WITHIN each partition.
    Returns (id, len, bin_id, offset): ``offset`` is the item's start
    inside its bin; bin token sums never exceed ``budget``.

    Items longer than ``budget`` are rejected (ValueError at plan
    build if statically impossible to detect — they surface as a
    runtime error in the packing pass) — chunk first, then pack.

    Deterministic given the partitioning: items sort (len desc, id
    asc) inside the partition before first-fit. ``bin_id`` encodes
    (partition, local bin) so ids never collide across partitions.
    Per-partition packing is the no-shuffle shape data loaders use;
    repartition upstream to trade parallelism against packing
    tightness.
    """
    import pandas as pd

    inp = df.select(
        F.col(id_col).cast("long").alias("pid"),
        F.col(len_col).cast("long").alias("plen"),
        F.spark_partition_id().alias("__part"),
    )

    def batches(it):
        rows_id, rows_len = [], []
        part = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            part = int(pdf["__part"].iloc[0])
            rows_id.extend(int(x) for x in pdf["pid"])
            rows_len.extend(int(x) for x in pdf["plen"])
        if part is None:
            return
        order = sorted(
            range(len(rows_id)), key=lambda i: (-rows_len[i], rows_id[i])
        )
        bins: list[int] = []  # remaining capacity per open bin
        out_bin, out_off = [0] * len(rows_id), [0] * len(rows_id)
        for i in order:
            ln = rows_len[i]
            if ln > budget:
                raise ValueError(
                    f"item {rows_id[i]} length {ln} exceeds budget {budget}"
                    " — chunk before packing"
                )
            for b, rem in enumerate(bins):
                if rem >= ln:
                    out_bin[i] = b
                    out_off[i] = budget - rem
                    bins[b] = rem - ln
                    break
            else:
                out_bin[i] = len(bins)
                out_off[i] = 0
                bins.append(budget - ln)
        base = part << 32
        yield pd.DataFrame(
            {
                "pid": rows_id,
                "plen": rows_len,
                "bin_id": [base + b for b in out_bin],
                "offset": out_off,
            }
        )

    out = inp.mapInPandas(
        batches, "pid long, plen long, bin_id long, offset long"
    )
    return out.select(
        F.col("pid").alias(id_col),
        F.col("plen").alias(len_col),
        "bin_id",
        "offset",
    )
