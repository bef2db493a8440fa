"""Time-series subsequence similarity search (SURVEY.md §2.5 adjacent;
pattern follows the distributed time-series-similarity literature, e.g.
"Time Series Similarity Search for Streaming Data in Distributed
Systems", EDBT 2019 — see PAPERS.md).

Find the top-k z-normalized Euclidean matches of a query pattern among
ALL length-L subsequences of each key's ordered value series — the UCR
subsequence-search semantics: each window is z-normalized before
comparison, so matches are shape matches, invariant to offset and
amplitude.

Scale design: one shuffle (groupBy key) brings each key's series to one
task; inside the task numpy stride-tricks materialize the sliding-
window matrix (O(n·L) work, vectorized, no Python loop) and only each
key's LOCAL top-k rows leave the task, so the global TakeOrdered sees
k·n_keys rows, not n·L windows. Memory per task is one key's series —
for multi-GB single-key series, segment the series with overlap L-1
upstream (the windows are contiguous, so segment boundaries lose
nothing). A flat-constant pattern (sigma 0) has no z-normalized shape;
such windows are skipped, matching the UCR convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _znorm(x):
    import numpy as np

    a = np.asarray(x, dtype=np.float64)
    sd = a.std()
    if sd == 0:
        raise ValueError("query pattern is constant — no z-normalized shape")
    return (a - a.mean()) / sd


def znorm_pattern_topk(
    df: DataFrame,
    pattern,
    k: int = 10,
    by: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    round_digits: int = 6,
) -> DataFrame:
    """Top-k (key, window start ts, distance) over every length-L
    window of every key's time-ordered series, z-normalized Euclidean
    vs the z-normalized ``pattern``. Ties broken by (key, ts) for a
    deterministic result set."""
    import pandas as pd

    qn = _znorm(pattern)
    L = len(qn)
    out_schema = f"{by} long, start_ts timestamp, dist double"

    def search(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(ts_col, kind="mergesort")
        v = pdf[val_col].to_numpy(dtype=np.float64)
        if len(v) < L:
            return pd.DataFrame(columns=[by, "start_ts", "dist"])
        win = np.lib.stride_tricks.sliding_window_view(v, L)
        mu = win.mean(axis=1, keepdims=True)
        sd = win.std(axis=1, keepdims=True)
        ok = sd[:, 0] > 0  # constant windows have no shape — skip
        if not ok.any():
            return pd.DataFrame(columns=[by, "start_ts", "dist"])
        z = (win[ok] - mu[ok]) / sd[ok]
        d = np.round(
            np.sqrt(((z - qn) ** 2).sum(axis=1)), round_digits
        )
        starts = pdf[ts_col].to_numpy()[: len(v) - L + 1][ok]
        # local prune keyed on the ROUNDED distance + start ts — the
        # same composite key the global orderBy (and the SQL oracle)
        # ranks by, so a rounding tie at the prune boundary can never
        # make the local top-k disagree with a global top-k
        order = np.lexsort((starts, d))[:k]
        return pd.DataFrame(
            {
                by: pdf[by].iloc[0],
                "start_ts": starts[order],
                "dist": d[order],
            }
        )

    local = df.select(by, ts_col, val_col).groupBy(by).applyInPandas(
        search, out_schema
    )
    return local.orderBy(F.asc("dist"), F.asc(by), F.asc("start_ts")).limit(k)
