"""Z-order (Morton) multi-column clustering expression.

Extends the lake's sort-on-write clustering (≙ Hudi clustering,
`CDC-Hudi-Notebook.zpln:2234 ¶51` MoR table services; Hudi exposes the
same idea as `hoodie.clustering.plan.strategy.sort.columns` with a
z-order layout strategy) from ONE key to SEVERAL probe columns: values
are min-max scaled to ``bits``-bit integers and their bits interleaved,
so sorting by the single z-value keeps rows that are close in ANY of
the clustered columns physically close. Parquet row-group/file min-max
stats then stay tight on EVERY clustered column — a point or range
filter on any of them skips most files, where a lexicographic
(col_a, col_b) sort only prunes on the leading column.

Pure JVM column math (shift/and/or inside whole-stage codegen): a
static ``bits x n_cols`` expression, no UDF, no shuffle of its own —
the caller attaches it to an existing sort.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(
    cols: Sequence[Column],
    mins: Sequence[float],
    maxs: Sequence[float],
    bits: int = 16,
) -> Column:
    """Morton code of ``cols``: each column is min-max scaled into
    ``[0, 2^bits)`` using the caller-supplied bounds (bounded metadata
    — two numbers per column, same pattern as the IVF centroids), then
    bit-interleaved. Non-finite/null inputs clamp to the range edges,
    so the expression is total."""
    top = (1 << bits) - 1
    scaled = []
    for c, mn, mx in zip(cols, mins, maxs):
        rng = float(mx) - float(mn)
        if rng <= 0:
            scaled.append(F.lit(0).cast("long"))
            continue
        s = F.least(
            F.lit(top).cast("long"),
            F.greatest(
                F.lit(0).cast("long"),
                ((c.cast("double") - float(mn)) / rng * top).cast("long"),
            ),
        )
        scaled.append(F.coalesce(s, F.lit(0).cast("long")))
    z = F.lit(0).cast("long")
    n = len(scaled)
    for b in range(bits):
        for i, s in enumerate(scaled):
            bit = F.shiftright(s, b).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def column_bounds(df: DataFrame, cols: Sequence[str]) -> tuple[list, list]:
    """Min/max per clustered column in ONE aggregate pass — the only
    driver-side collect in the z-order path, 2 scalars per column."""
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"_mn_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"_mx_{c}"))
    row = df.agg(*aggs).collect()[0]
    mins = [row[f"_mn_{c}"] if row[f"_mn_{c}"] is not None else 0.0 for c in cols]
    maxs = [row[f"_mx_{c}"] if row[f"_mx_{c}"] is not None else 0.0 for c in cols]
    return mins, maxs
