"""Data-layout keys for multi-dimensional file skipping.

A parquet lake prunes files by per-file column min/max footers. Sorting
the write by ONE column makes that column's ranges tight and leaves
every other column spanning the full domain — a filter on the second
column skips nothing. A Z-ORDER (Morton) sort key interleaves the bits
of several columns, so file ranges are tight-ish in EVERY interleaved
dimension at once; Delta/Iceberg OPTIMIZE ZORDER is this exact idea.

``morton_key`` is a pure Catalyst expression (shift/and/or folds — no
UDF, fully codegen-able), so `df.repartitionByRange(N, morton_key(...))
.sortWithinPartitions(...)` is a plain distributed write plan. The
multi-dimensional skipping win is measured (not asserted by vibes) in
tests/test_bucketing.py: per-file min/max spans of BOTH dimensions
shrink vs a single-column sort of the same data.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton_key(x: Column, y: Column, bits: int = 21) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into one Z-order key (x in even positions, y in odd).
    21+21 bits fit a signed 64-bit long; inputs are masked to the
    requested width (callers bucket-quantize real values first, e.g.
    ``floor(price / 100)``)."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    mask = (1 << bits) - 1
    xm = x.cast("long").bitwiseAND(F.lit(mask))
    ym = y.cast("long").bitwiseAND(F.lit(mask))
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = (
            key
            .bitwiseOR(F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i))
            .bitwiseOR(F.shiftleft(F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        )
    return key


def morton_key_py(x: int, y: int, bits: int = 21) -> int:
    """Pure-Python reference for tests."""
    mask = (1 << bits) - 1
    x &= mask
    y &= mask
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out
