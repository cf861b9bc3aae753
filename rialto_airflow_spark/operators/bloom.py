"""Bloom-filter join pruning: build a bit-set over the SMALL side's
join keys, ship it as a literal, and pre-filter the BIG side map-only
before the join — the runtime-row-level-filter pattern (Spark's own
`spark.sql.optimizer.runtime.bloomFilter` does this inside one query;
this operator makes the filter a reusable, persistable artifact that
can prune a 100-TB probe side across MANY queries, e.g. "only events
whose user is in this cohort" applied to every daily partition).

Why it scales: the filter costs one bounded aggregation on the build
side (≤ k·|keys| distinct positions collected, build side small by
contract), and the probe side never shuffles — membership is k hash
probes into an array literal evaluated inside whole-stage codegen.
A positive may be false (tune ``m_bits``: fp ≈ (1 - e^(-k·n/m))^k),
a negative never is, so composing with the exact join afterwards is
semantics-preserving while skipping the shuffle for ~all non-matching
rows.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class BloomFilter:
    m_bits: int
    k: int
    words: tuple[int, ...]  # m_bits/64 signed 64-bit words
    n_keys: int

    @property
    def fp_rate(self) -> float:
        """Theoretical false-positive rate for the built key count."""
        import math

        return (1.0 - math.exp(-self.k * self.n_keys / self.m_bits)) ** self.k


def _positions(col: Column | str, m_bits: int, k: int) -> Column:
    """array<long> of the k bit positions for a key:
    pmod(xxhash64(key, seed_i), m_bits). Seeding via a literal second
    hash input keeps all k hashes one JVM intrinsic each."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array(
        *[F.pmod(F.xxhash64(c, F.lit(i)), F.lit(m_bits)) for i in range(k)]
    )


def build_bloom(
    df: DataFrame, key_col: str, m_bits: int = 1 << 20, k: int = 5
) -> BloomFilter:
    """Aggregate the build side's distinct bit positions (one shuffle
    bounded by min(k·|keys|, m_bits) rows) and pack them into 64-bit
    words driver-side."""
    rows = (
        df.select(F.explode(_positions(key_col, m_bits, k)).alias("p"))
        .distinct()
        .collect()
    )
    n_keys = df.select(key_col).distinct().count()
    words = [0] * ((m_bits + 63) // 64)
    for r in rows:
        p = r["p"]
        words[p // 64] |= 1 << (p % 64)
    # two's-complement into signed 64-bit so the literal is a valid
    # Spark bigint array
    signed = tuple(w - (1 << 64) if w >= (1 << 63) else w for w in words)
    return BloomFilter(m_bits=m_bits, k=k, words=signed, n_keys=n_keys)


def bloom_contains(col: Column | str, bloom: BloomFilter) -> Column:
    """Membership test as a pure Column predicate: k probes into the
    word-array literal. Arithmetic shiftright sign-extends high bits
    only; the &1 isolates the probed bit, so signed words are safe."""
    words = F.lit(list(bloom.words))
    c = F.col(col) if isinstance(col, str) else col

    def probe(i: int) -> Column:
        p = F.pmod(F.xxhash64(c, F.lit(i)), F.lit(bloom.m_bits))
        w = F.element_at(words, (p / 64).cast("int") + 1)
        # call_function: the pyspark shiftright wrapper only accepts a
        # literal shift count; the SQL function takes a column
        return (
            F.call_function("shiftright", w, (p % 64).cast("int")).bitwiseAND(
                F.lit(1)
            )
            == 1
        )

    out = probe(0)
    for i in range(1, bloom.k):
        out = out & probe(i)
    return out


def bloom_prefilter(
    big: DataFrame, bloom: BloomFilter, key_col: str
) -> DataFrame:
    """Map-only pre-filter of the probe side. Follow with the exact
    join — the filter only removes rows that CANNOT match."""
    return big.where(bloom_contains(key_col, bloom))
