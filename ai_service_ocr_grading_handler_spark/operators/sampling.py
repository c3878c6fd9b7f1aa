"""Deterministic sampling, splitting, and source mixing — the last step of
training-data prep (Pile/Dolma-style mixture weights) plus reproducible
train/val/test splits.

Everything derives from a content-id hash fraction, NOT rand(): a
re-run, a resumed run, or a differently-partitioned run samples the
exact same documents (rand() is per-task and non-reproducible across
retries — a silent eval-contamination hazard when a split is re-rolled).
The fraction is md5-derived, identical in Spark and DuckDB, so every
assignment is value-oracle-checkable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_FRAC_DENOM = 1 << 31

# uniform [0, 1) fraction from the id: first 31 bits of md5 / 2^31 —
# same salt trick as the dedup tiers; a `salt` makes independent draws
_FRAC_SPARK = (
    "pmod(cast(conv(substring(md5(concat(cast({id} as string), '|', '{salt}')),"
    " 1, 15), 16, 10) as bigint), 2147483648) / 2147483648.0D"  # D: double
    # division, not DECIMAL — a bare 2147483648.0 literal parses as
    # DECIMAL(11,1) and decimal division rounds at ~12 digits, silently
    # diverging from the DuckDB oracle's float64 draw
)
_FRAC_DUCK = (
    "((('0x' || substr(md5({id}::varchar || '|' || '{salt}'), 1, 15))::bigint"
    " % 2147483648) / 2147483648.0)"
)


def hash_frac(id_col: str = "doc_id", salt: str = "split") -> Column:
    """Deterministic uniform [0,1) draw per id (scan-speed, zero shuffle)."""
    return F.expr(_FRAC_SPARK.format(id=id_col, salt=salt))


def hash_frac_duck(id_col: str = "doc_id", salt: str = "split") -> str:
    return _FRAC_DUCK.format(id=id_col, salt=salt)


def deterministic_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Adds a `split` column ('train'/'val'/... by cumulative weight
    thresholds over the hash fraction). Weights must sum to 1. A document's
    split never changes across runs, partitionings, or corpus growth —
    adding documents later cannot move an old document between splits
    (the eval-contamination guarantee rand()-based splits lack)."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    frac = hash_frac(id_col, salt)
    expr: Column | None = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w
        cond = frac < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", expr)


def mix_sources(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Pile/Dolma-style mixture weighting: per-source sampling rate, where
    rate < 1 downsamples and rate > 1 upsamples (floor(rate) full copies
    plus one more when the hash draw falls under the fractional part).
    Output carries `copy` (0-based) so downstream shuffling can spread the
    repeats. Sources absent from `rates` default to 1.0.

    Plan: n_copies is a per-row expression; copies materialize through ONE
    posexplode — no join, no shuffle; the corpus streams through."""
    frac = hash_frac(id_col, salt)
    rate: Column = F.lit(1.0)
    for src, r in rates.items():
        rate = F.when(F.col(source_col) == src, F.lit(float(r))).otherwise(rate)
    n_copies = (
        F.floor(rate) + (frac < (rate - F.floor(rate))).cast("long")
    ).alias("n_copies")
    with_n = df.withColumn("n_copies", n_copies).filter(F.col("n_copies") > 0)
    return (
        with_n.select(
            "*", F.posexplode(F.expr("sequence(1, n_copies)")).alias("copy", "_one")
        )
        .drop("n_copies", "_one")
    )


def mix_sources_duck_n_copies(
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> str:
    """DuckDB expression for the per-row copy count (oracle twin)."""
    frac = hash_frac_duck(id_col, salt)
    expr = "1.0"
    for src, r in rates.items():
        expr = f"CASE WHEN {source_col} = '{src}' THEN {float(r)} ELSE {expr} END"
    return (
        f"(floor({expr}) + CASE WHEN {frac} < ({expr} - floor({expr}))"
        f" THEN 1 ELSE 0 END)::bigint"
    )
