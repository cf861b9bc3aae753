"""Rule-cascade helpers — the Spark re-expression of the reference's
distiller rule engine (distiller/utils.py:54-215).

The reference evaluates `JsonPathRule`/`FuncRule` lists per row:
``first()`` returns the first non-None, non-empty-list match;
``all()`` returns every match. Here each rule is a Column expression
over the parsed payload structs; ``first`` ≡ coalesce with empty
results nulled; ``all`` ≡ array concatenation — fully JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def nonempty(col: Column) -> Column:
    """Null out empty arrays so coalesce skips them, mirroring
    first()'s `result != []` check (utils.py:158-159). Empty strings
    stay matches, as in the reference."""
    return F.when(F.size(col) > 0, col)


def first_of(*exprs: Column) -> Column:
    """first() ≡ coalesce (utils.py:96-103)."""
    return F.coalesce(*exprs)


def all_of(*array_exprs: Column) -> Column:
    """all() over list-valued rules: concatenate every non-null match
    (utils.py:106-132). Callers flatten/dedupe as their field needs."""
    out = F.array().cast("array<string>")
    for e in array_exprs:
        out = F.concat(out, F.coalesce(e, F.array().cast("array<string>")))
    return out


def dict_or_list(raw: Column, elem_ddl: str) -> Column:
    """Normalize an XML-derived dict-OR-list node (raw-captured JSON
    string) to an array of ``elem_ddl`` structs (SURVEY §1.3: PubMed/
    WoS nodes are dict-or-list-of-dict; pubmed.py:280-284,
    wos.py:406-411)."""
    return F.when(
        raw.isNotNull(),
        F.coalesce(
            F.from_json(raw, f"array<struct<{elem_ddl}>>"),
            F.array(F.from_json(raw, f"struct<{elem_ddl}>")),
        ),
    )


def string_or_list(raw: Column) -> Column:
    """Normalize a string-OR-list-of-strings node to array<string>.
    Scalar values raw-capture without quotes, so from_json fails on
    them and the fallback wraps the value."""
    return F.when(
        raw.isNotNull(),
        F.coalesce(F.from_json(raw, "array<string>"), F.array(raw)),
    )


def scalar_or_first(raw: Column) -> Column:
    """The reference's issue/volume post-rule (distiller/issue.py:
    18-23): a list result yields its first element, a string passes
    through, anything else (a dict) is null — even when later rules
    could have matched."""
    return (
        F.when(raw.startswith("{"), F.lit(None).cast("string"))
        .when(raw.startswith("["), F.get(F.from_json(raw, "array<string>"), 0))
        .otherwise(raw)
    )


def valid_year(col: Column) -> Column:
    """is_valid_year guard (utils.py:192-201): castable to int and
    not in the future."""
    y = col.cast("int")
    return F.when(y <= F.year(F.current_date()), y)


def positive_number(col: Column) -> Column:
    """only_positive_number guard (utils.py:180-189): castable to int
    and >= 0."""
    n = col.cast("int")
    return F.when(n >= 0, n)


def capitalize(col: Column) -> Column:
    """Python str.capitalize(): first char upper, rest lower (NOT
    initcap) — used by the types normalizer default
    (distiller/types.py:46)."""
    return F.concat(
        F.upper(F.substring(col, 1, 1)), F.lower(F.substring(col, 2, 2147483646))
    )
