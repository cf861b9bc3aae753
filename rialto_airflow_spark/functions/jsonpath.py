"""Generic JSONPath fallback (SURVEY §2.12).

Every distiller path in this engine is hand-translated to native
Column expressions (functions/distill.py) — this module exists for
the long tail: payload paths not worth hand-translating, evaluated
with jsonpath_ng inside an Arrow-batched pandas UDF. jsonpath_ng is
optional (not in the runtime container); without it the UDF raises a
clear error at build time, never inside a task.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

try:  # optional dependency
    from jsonpath_ng.ext import parse as _jsonpath_parse  # type: ignore

    HAVE_JSONPATH = True
except ImportError:  # pragma: no cover
    _jsonpath_parse = None
    HAVE_JSONPATH = False


def jsonpath_eval(json_col: Column, path: str) -> Column:
    """Evaluate a JSONPath against a raw JSON string column; returns
    the first match serialized as a JSON string (null if no match) —
    mirroring the reference's first-match-only rule evaluation
    (distiller/utils.py:158-159)."""
    if not HAVE_JSONPATH:
        raise ImportError(
            "jsonpath_ng is not installed; hand-translate the path with "
            "functions.rules / get_json_object instead (every reference "
            "path already is — see functions/distill.py)"
        )
    expr = _jsonpath_parse(path)

    @F.pandas_udf("string")
    def _eval(s: pd.Series) -> pd.Series:
        out = []
        for v in s:
            if v is None:
                out.append(None)
                continue
            try:
                matches = expr.find(json.loads(v))
            except (ValueError, KeyError):
                matches = []
            out.append(json.dumps(matches[0].value) if matches else None)
        return pd.Series(out, dtype="object")

    return _eval(json_col)
