"""Ingest connector layer (S3-S9, S12) — file-backed by design.

The reference harvests from six HTTP APIs with per-source paging,
batching, retry and rate-limit policies (SURVEY §2.1). Those are
driver/connector concerns, not Spark operators: each connector lands
raw JSONL batches in a directory, and everything downstream is the
set-based engine. This module defines that boundary:

  * ``Connector`` — the landing contract (fetch → JSONL paths);
  * ``read_payload_batch`` — JSONL dir → (doi, <src>_json, ids,
    <src>_harvested) rows ready for upsert_source_batch (M2);
  * ``batched`` — the executor-side DOI-batching helper
    (mapPartitions over id lists — S4/S5/S6/S9's 40-200-DOI
    batches);
  * ``RetryPolicy`` — the per-source retry/backoff/rate-limit
    parameters (BASELINE.md table), carried as data;
  * ``retrying_fetch`` / ``paged_fetch`` — the retry-with-backoff
    and cursor-paging LOOPS those policies drive, transport-injected:
    a production deployment supplies only ``transport(ids) ->
    payloads`` (an HTTP client), and the wrapped fetch plugs into
    ``fetch_batches`` to run on the executors.

No network code lives here (or anywhere in the engine) — tests and
the driver run entirely file-backed with fake transports, exactly
like the reference's requests-mock test strategy (SURVEY §5).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rialto_airflow_spark.functions.normalize import (
    normalize_doi,
    normalize_pmid,
    normalize_wos_id,
)


@dataclass(frozen=True)
class RetryPolicy:
    """Per-source API discipline (values from the reference;
    BASELINE.md). Carried as data for real connectors."""

    page_size: int
    batch_size: int | None = None
    sleep_seconds: float = 0.0
    max_retries: int = 5


# reference-documented policies (dimensions.py:250-257; wos.py:293,341;
# openalex.py:138,175-186; pubmed.py:34,162-176; crossref.py:65,106;
# sul_pub.py:21)
POLICIES: dict[str, RetryPolicy] = {
    "dimensions": RetryPolicy(page_size=25, batch_size=200, sleep_seconds=1.0),
    "wos": RetryPolicy(page_size=100, batch_size=50, sleep_seconds=0.5),
    "openalex": RetryPolicy(page_size=200, batch_size=50),
    "pubmed": RetryPolicy(page_size=1000, batch_size=50),
    "crossref": RetryPolicy(page_size=40, batch_size=40, sleep_seconds=1.0),
    "sulpub": RetryPolicy(page_size=1000),
}

# per-source JSON paths for the cross-source ids (SURVEY §2.1 K1)
_ID_EXTRACTORS: dict[str, Callable[[], dict[str, F.Column]]] = {}


def read_payload_batch(
    spark: SparkSession, source: str, path: str, harvested_at=None
) -> DataFrame:
    """JSONL landing dir → M2-ready batch: (doi, <source>_json,
    wos_id/pubmed_id where the source carries them,
    <source>_harvested). DOI/PMID/WOS-ID normalization happens here,
    once, set-based (the reference normalizes per-row at upsert —
    openalex.py:60-84 etc.)."""
    from rialto_airflow_spark.functions import extract as X

    raw = spark.read.text(path).withColumnRenamed("value", f"{source}_json")
    j = F.col(f"{source}_json")
    if source == "sulpub":
        # only records with >=1 approved authorship are kept (P6,
        # sul_pub.py:41,176-183)
        raw = raw.where(X.sulpub_approved(j))
        doi = X.sulpub_extract_doi(j)
    elif source == "wos":
        doi = X.wos_get_doi(j)
    elif source == "pubmed":
        doi = X.pubmed_get_doi(j)
    elif source == "crossref":
        doi = normalize_doi(F.get_json_object(j, "$.DOI"))
    else:
        doi = normalize_doi(F.get_json_object(j, "$.doi"))
    out = raw.select(doi.alias("doi"), j)
    if source == "wos":
        out = out.withColumn("wos_id", X.wos_uid(j)).withColumn(
            "pubmed_id", X.wos_get_pmid(j)
        )
    elif source == "pubmed":
        out = out.withColumn("pubmed_id", X.pubmed_pmid(j))
    elif source == "sulpub":
        out = out.withColumn("wos_id", X.sulpub_extract_wos_uid(j)).withColumn(
            "pubmed_id", X.sulpub_extract_pmid(j)
        )
    ts = F.lit(harvested_at).cast("timestamp") if harvested_at else F.current_timestamp()
    return out.withColumn(f"{source}_harvested", ts)


def batched(
    ids: DataFrame,
    id_col: str,
    batch_size: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Group ids into connector-request batches (the 40-200-DOI
    windows of S4/S5/S6/S9) — executor-parallel, deterministic:
    (batch_idx, ids array).

    Ids hash-repartition on ``id_col`` across ``num_partitions`` tasks
    (default: the session's shuffle partitions); each task sorts ONLY
    its slice and cuts it into ``batch_size`` windows, keyed
    (partition, window). No global sort: a plain
    ``Window.orderBy(id)`` would funnel EVERY id through one task to
    number it — a single-partition bottleneck at millions of fill-in
    ids. The trade is at most one underfull batch per partition
    (instead of one total), a bounded request-count overhead.
    Deterministic given (ids, batch_size, num_partitions): hash
    placement and the within-partition sort are both pure functions of
    the id values."""
    n = num_partitions or int(
        ids.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    part = ids.repartition(n, F.col(id_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    w = Window.partitionBy("__pid").orderBy(id_col)
    w_idx = F.floor((F.row_number().over(w) - 1) / batch_size)
    return (
        part.select(F.col(id_col), F.col("__pid"), w_idx.alias("__win"))
        .groupBy("__pid", "__win")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .select(
            (F.col("__pid").cast("long") * F.lit(1 << 32) + F.col("__win"))
            .alias("batch_idx"),
            "ids",
        )
    )


def fetch_batches(
    batches: DataFrame,
    fetch: Callable[[list[str]], list[str]],
) -> DataFrame:
    """Run a connector fetch function per batch on the EXECUTORS
    (mapPartitions — SURVEY §2.1 S4 'batching = mapPartitions over
    DOI lists'). ``fetch`` maps an id batch to raw JSON strings; in
    tests it's a file/dict-backed fake, in production an HTTP client
    honoring its RetryPolicy."""
    from pyspark.sql import Row

    def run(part: Iterator) -> Iterator:
        for row in part:
            for payload in fetch(list(row["ids"])):
                yield Row(json=payload)

    return batches.rdd.mapPartitions(run).toDF("json string")


class TransientFetchError(Exception):
    """Marker a transport raises for retryable failures (HTTP 429/5xx,
    connection reset mid-body) — the statuses the reference's
    hand-written loops retry (openalex.py:117-144, wos.py:278-364)."""


def _default_retryable(exc: Exception) -> bool:
    return isinstance(
        exc, (TransientFetchError, ConnectionError, TimeoutError, OSError)
    )


def retrying_fetch(
    transport: Callable[[list[str]], list[str]],
    policy: RetryPolicy,
    sleep: Callable[[float], None] | None = None,
    retryable: Callable[[Exception], bool] | None = None,
) -> Callable[[list[str]], list[str]]:
    """Wrap a transport callable with the source's retry/backoff/
    rate-limit discipline (the HTTP loop the reference hand-writes per
    source — openalex.py:117-144, wos.py:278-364): exponential backoff
    capped at 60 s, ``policy.max_retries`` attempts, and the polite
    inter-call sleep. The transport is the ONLY part a production
    deployment supplies (an HTTP client); everything here is
    executor-safe pure Python, so the wrapped fetch plugs straight
    into :func:`fetch_batches`. ``sleep`` is injectable for tests.

    Only TRANSIENT failures retry: ``retryable`` (default:
    :class:`TransientFetchError`, ``ConnectionError``,
    ``TimeoutError``, ``OSError``) decides; deterministic
    programming/auth errors fail fast instead of burning
    ``max_retries`` sleeps — matching the reference loops, which
    retry only specific transient statuses."""
    import time as _time

    do_sleep = sleep or _time.sleep
    is_retryable = retryable or _default_retryable

    def fetch(ids: list[str]) -> list[str]:
        attempt = 0
        while True:
            try:
                out = transport(ids)
            except Exception as exc:
                if not is_retryable(exc):
                    raise
                attempt += 1
                if attempt > policy.max_retries:
                    raise
                do_sleep(min(2.0**attempt, 60.0))
                continue
            if policy.sleep_seconds:
                do_sleep(policy.sleep_seconds)
            return out

    return fetch


def paged_fetch(
    transport: Callable[[str | None, int], tuple[list[str], str | None]],
    policy: RetryPolicy,
) -> Callable[[], Iterator[str]]:
    """Drive cursor paging (the reference's per-source page loops,
    e.g. openalex cursor paging / WoS firstRecord windows): transport
    takes (cursor, page_size) and returns (payloads, next_cursor);
    iteration ends when next_cursor is None. Returns a thunk yielding
    every payload — compose with :func:`retrying_fetch`'s transport
    for retry inside each page call."""

    def run() -> Iterator[str]:
        cursor: str | None = None
        while True:
            payloads, cursor = transport(cursor, policy.page_size)
            yield from payloads
            if cursor is None:
                return

    return run


def format_wos_timespan(days: int) -> str:
    """N9 — wos.py:178-199: <=6 days '{n}D'; else ceil-weeks '{n}W'
    up to 52; else ceil-years '{n}Y' (WoS loadTimeSpan encoding)."""
    if days <= 6:
        return f"{days}D"
    weeks = (days + 6) // 7
    if weeks <= 52:
        return f"{weeks}W"
    return f"{(days + 364) // 365}Y"
