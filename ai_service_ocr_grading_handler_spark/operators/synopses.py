"""Mergeable corpus synopses (Apache DataSketches HLL via Spark 4's
native sketch aggregates) — the incremental-statistics leg of the lake:
a 100 TB corpus answers "how many distinct URLs / hosts / content
hashes?" by UNIONING small per-slice sketches instead of rescanning
committed data (the same re-run economics as the stored MinHash band
table: new slices are sketched, old slices contribute bytes).

Everything is JVM-native (`hll_sketch_agg` / `hll_union_agg` — no
Python, map-side combined, order- and partitioning-independent: HLL
registers are maxima over hashes, so the sketch of a set is a pure
function of the set). Sketch estimates are approximate, so this tier is
pytest-pinned (the register-identity property `union(slice sketches) ==
sketch(union)` is EXACT and tested, accuracy is asserted within the
configured error bound) rather than DuckDB-hash-matched.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# lgConfigK: log2 of HLL register count. 12 -> 4096 registers, ~1.6%
# relative standard error, ~2.5 KB per sketch — thousands of slices of
# synopsis cost less than one parquet footer.
LG_K = 12


def sketch_slices(
    df: DataFrame,
    cols: tuple[str, ...],
    slice_col: str = "source",
    lg_k: int = LG_K,
) -> DataFrame:
    """(slice, col, sketch): one HLL sketch per (slice, tracked column).
    This is the frame a run PERSISTS next to its lineage — a later run
    unions it with its own slice sketches (`merge_estimates`) without
    touching committed rows."""
    per_col = [
        F.hll_sketch_agg(F.col(c).cast("string"), lg_k).alias(f"__sk_{c}")
        for c in cols
    ]
    wide = df.groupBy(F.col(slice_col).alias("slice")).agg(*per_col)
    stacked = None
    for c in cols:
        part = wide.select(
            "slice", F.lit(c).alias("col"), F.col(f"__sk_{c}").alias("sketch")
        )
        stacked = part if stacked is None else stacked.unionByName(part)
    return stacked


def merge_estimates(sketches: DataFrame) -> DataFrame:
    """(col, distinct_estimate) across ALL slices: one `hll_union_agg`
    per tracked column over the tiny sketch frame — the registers of the
    union equal the registers of a from-scratch sketch of the union
    (max is associative/commutative), so incremental and full runs
    estimate IDENTICALLY (property-tested, exact equality)."""
    return (
        sketches.groupBy("col")
        .agg(F.hll_union_agg("sketch").alias("u"))
        .select("col", F.hll_sketch_estimate("u").cast("long").alias("distinct_estimate"))
    )


def slice_estimates(sketches: DataFrame) -> DataFrame:
    """(slice, col, distinct_estimate): per-slice readout of the stored
    synopsis frame."""
    return sketches.select(
        "slice",
        "col",
        F.hll_sketch_estimate("sketch").cast("long").alias("distinct_estimate"),
    )
