"""User-defined table / aggregate function surface (SURVEY.md §2.4
"UDF/UDAF/UDTF" row — absent in the reference, which has no computed
expressions at all, streamlit_app.py:137-148).

Engine policy: built-in expressions first, Arrow-batched Pandas
UDFs second, row-at-a-time Python never in a hot path. These two are
the sanctioned escape hatches for shapes Catalyst can't express:

- ``SplitSentences``: a Python UDTF (one row in -> N rows out with
  stateful per-row logic) — sentence segmentation with a lookbehind
  regex Spark's ``split`` can't do (and RE2-based engines can't either,
  so the registry query is rows-only).
- ``geo_mean``: a grouped-agg Pandas UDF (Arrow-vectorized UDAF).
  Expressible as exp(avg(ln x)) in SQL — which is exactly what the
  DuckDB oracle runs against it, making this the oracle-checked proof
  the UDAF path computes what it claims.
"""

from __future__ import annotations

import functools
import re

import pandas as pd  # module-level: pandas_udf resolves the stringized
                     # 'pd.Series' hints (future-annotations) via module globals
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

_SENTENCE_RE = re.compile(r"(?<=[.!?])\s+")


class _SplitSentences:
    """Lateral sentence splitter: yields (sentence_id, sentence,
    n_chars) per input document. Runs once per input row on the
    executor — linear, no state across rows."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract method
        if not text:
            return
        for i, s in enumerate(_SENTENCE_RE.split(text.strip())):
            s = s.strip()
            if s:
                yield i, s, len(s)


# return-type DDL strings parse against the ACTIVE session, so the
# udtf()/pandas_udf() wrappers must build lazily, not at import time
@functools.lru_cache(maxsize=1)
def sentences_udtf():
    return udtf(_SplitSentences, returnType="sentence_id: int, sentence: string, sentence_chars: int")


@functools.lru_cache(maxsize=1)
def geo_mean_udaf():
    """Grouped-agg geometric mean (Arrow-batched UDAF). Caller must
    pre-filter to positive values; NaN/None are dropped like built-in
    aggregates drop nulls."""

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        import numpy as np

        x = v.dropna()
        x = x[x > 0]
        if len(x) == 0:
            return float("nan")
        return float(np.exp(np.log(x.to_numpy(dtype="float64")).mean()))

    return geo_mean


class _SplitFixed:
    """POLYMORPHIC UDTF (Spark 4 analyze-time schema): splits a
    delimited code into exactly ``n`` columns, where the OUTPUT SCHEMA
    itself (part0..part{n-1}) is derived at plan time from the
    constant ``n`` argument by ``analyze`` — the dynamic-arity surface
    a fixed returnType UDTF can't express. Missing parts pad NULL,
    extras are dropped, so the arity contract is total."""

    @staticmethod
    def analyze(text, n):
        from pyspark.sql.types import StringType, StructField, StructType
        from pyspark.sql.udtf import AnalyzeResult

        if n.value is None or not isinstance(n.value, int) or n.value <= 0:
            raise ValueError("split_fixed(n) needs a positive constant int")
        return AnalyzeResult(
            StructType(
                [StructField(f"part{i}", StringType()) for i in range(n.value)]
            )
        )

    def eval(self, text, n):  # noqa: D102 — UDTF contract method
        parts = (text or "").split("-")
        yield tuple((parts + [None] * n)[:n])


@functools.lru_cache(maxsize=1)
def split_fixed_udtf():
    return udtf(_SplitFixed)


def split_sentences(df, text_col: str = "text", id_col: str = "doc_id"):
    """Lateral-join the UDTF against a document frame: one output row
    per sentence, document columns carried through."""
    return df.lateralJoin(
        sentences_udtf()(F.col(text_col).outer())
    ).select(id_col, "sentence_id", "sentence", "sentence_chars")


def arrow_group_quantiles(
    events, key_col: str = "event_type", value_col: str = "value"
):
    """Per-group quantile summary via ``applyInArrow`` — the Arrow-
    native grouped-map surface (Spark 4): each group arrives as a
    pyarrow.Table, zero pandas conversion on either side. Arrow compute
    kernels run vectorized C++, so this is the preferred escape hatch
    for per-group logic Catalyst can't express, one notch faster and
    leaner than applyInPandas (no pandas object overhead).

    Deterministic contract for the oracle: exact linear-interpolation
    quantiles over the sorted group (numpy; DuckDB's
    quantile_cont twin matches bit-for-bit on the same doubles).
    """
    import pyarrow as pa

    def summarize(table: pa.Table) -> pa.Table:
        import numpy as np

        vals = np.sort(table.column(value_col).to_numpy(zero_copy_only=False))
        q = np.quantile(vals, [0.25, 0.5, 0.75], method="linear")
        return pa.table(
            {
                "key": [table.column(key_col)[0].as_py()],
                "n": pa.array([len(vals)], pa.int64()),
                "q25": pa.array([round(float(q[0]), 6)], pa.float64()),
                "q50": pa.array([round(float(q[1]), 6)], pa.float64()),
                "q75": pa.array([round(float(q[2]), 6)], pa.float64()),
            }
        )

    return (
        events.select(key_col, value_col)
        .groupBy(key_col)
        .applyInArrow(
            summarize, schema="key string, n long, q25 double, q50 double, q75 double"
        )
    )


class _EventStreaks:
    """TABLE-ARGUMENT UDTF (Spark 4): consumes a whole partitioned +
    ordered input relation — ``streaks(TABLE(events) PARTITION BY
    user_id ORDER BY ts)`` — and emits ONE row per partition: the
    user's longest run of consecutive same-type events (ties keep the
    EARLIEST run, so the result is deterministic). ``eval`` sees each
    row of its partition in order; ``terminate`` fires once per
    partition — the per-partition-stream contract a plain lateral
    UDTF can't express."""

    def __init__(self):
        self._user = None
        self._cur_type = None
        self._cur_len = 0
        self._best_type = None
        self._best_len = 0

    def _roll(self):
        if self._cur_len > self._best_len:
            self._best_len = self._cur_len
            self._best_type = self._cur_type

    def eval(self, row):  # noqa: D102 — UDTF contract method
        self._user = row["user_id"]
        if row["event_type"] == self._cur_type:
            self._cur_len += 1
        else:
            self._roll()
            self._cur_type = row["event_type"]
            self._cur_len = 1

    def terminate(self):  # noqa: D102 — UDTF contract method
        self._roll()
        if self._user is not None:
            yield (self._user, self._best_type, self._best_len)


@functools.lru_cache(maxsize=1)
def event_streaks_udtf():
    return udtf(
        _EventStreaks,
        returnType="user_id bigint, event_type string, streak_len bigint",
    )


def cogroup_asof_prices(
    trades,
    quotes,
    key: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
):
    """Cogrouped ``applyInPandas`` — the two-sided grouped-map UDF
    surface (``df1.groupBy(k).cogroup(df2.groupBy(k)).applyInPandas``):
    each key's partitions from BOTH frames arrive as a pandas pair in
    one task, the canonical home of per-key merge logic that needs
    both sides in memory at once. The classic demonstration is the
    per-key as-of merge (pandas ``merge_asof`` backward): every left
    event picks the latest right event at-or-before its timestamp.

    Scale shape: one co-partitioned shuffle on the key for both
    inputs, then embarrassingly parallel per-key pandas work — the
    same exchange a join would pay, no driver involvement. Use
    operators.joins.asof_join (pure Catalyst window form) when the
    logic fits declarative ops; this surface exists for per-key
    algorithms that DON'T (model scoring per entity, curve fitting,
    order-book replay).

    Output: (key, ts, value, ref_value) with ref_value = the other
    side's last value at-or-before ts (NULL when none).

    GOTCHA (pinned in tests/test_udx.py): when both inputs derive
    from the SAME source plan (the usual case — two filters of one
    events table), FlatMapCoGroupsInPandas de-duplicates the right
    side's attributes against the left's expression IDs and the right
    pandas frame arrives MISSING those columns (observed: ts/value
    silently absent, no error). Re-aliasing the right side through a
    subquery alias mints fresh attribute IDs; this function does it
    defensively for both inputs, so callers can pass two slices of
    one frame.
    """
    import pandas as pd

    trades = trades.alias("__cg_l").select(
        *[F.col(c).alias(c) for c in trades.columns]
    )
    quotes = quotes.alias("__cg_r").select(
        *[F.col(c).alias(c) for c in quotes.columns]
    )

    out_schema = (
        f"{key} long, {time_col} timestamp, {value_col} double, ref_value double"
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(
                columns=[key, time_col, value_col, "ref_value"]
            )
        left = left.sort_values(time_col)
        if right.empty:
            out = left[[key, time_col, value_col]].copy()
            out["ref_value"] = None
            return out
        right = right.sort_values(time_col)
        merged = pd.merge_asof(
            left[[key, time_col, value_col]],
            right[[time_col, value_col]].rename(columns={value_col: "ref_value"}),
            on=time_col,
            direction="backward",
        )
        return merged

    return (
        trades.groupBy(key)
        .cogroup(quotes.groupBy(key))
        .applyInPandas(merge, schema=out_schema)
    )
