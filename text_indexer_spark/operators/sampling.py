"""Deterministic sampling & splitting for training-data pipelines.

At 100 TB, ``df.sample()`` is the wrong tool: its RNG is seeded per
partition, so results change with partitioning, resume, and cluster
size. These operators derive a uniform u ∈ [0, 1) from a CONTENT-STABLE
hash of the row key (md5 — engine-portable: the DuckDB oracles compute
the identical value), so:

* the same row lands on the same side of every cut, forever, on any
  cluster — reruns, backfills and incremental syncs agree;
* no shuffle: the hash is a row-local expression fused into the scan;
* sampling composes with itself (a 10 % sample of a 50 % sample uses a
  different ``salt`` — otherwise the second cut re-selects the same
  rows, the classic correlated-sampling bug, which is why ``salt`` is a
  required part of the semantics, not a tuning knob).

``hash_split`` assigns disjoint train/val/test-style labels from one
hash draw — a row can never migrate between splits when weights are
appended to (append-only weight evolution keeps old splits stable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DENOM = float(1 << 32)


def uniform_hash(key: Column, salt: str = "") -> Column:
    """Deterministic u ∈ [0, 1) from md5(key || '|' || salt): first 8
    hex digits as a 32-bit integer, scaled. Row-local, codegen'd."""
    h = F.md5(F.concat(key.cast("string"), F.lit("|"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(_DENOM)


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    salt: str = "s1",
) -> DataFrame:
    """Keep ≈``fraction`` of rows, deterministically by key hash."""
    return df.filter(uniform_hash(F.col(key_col), salt) < F.lit(float(fraction)))


def stratified_hash_sample(
    df: DataFrame,
    fractions: dict[str, float],
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "s1",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum keep fractions (e.g. rebalance languages: keep 10 %
    of English, 100 % of low-resource langs). Strata absent from
    ``fractions`` keep ``default_fraction``."""
    frac = F.lit(float(default_fraction))
    for stratum, f in sorted(fractions.items()):
        frac = F.when(F.col(stratum_col) == stratum, F.lit(float(f))).otherwise(frac)
    return df.filter(uniform_hash(F.col(key_col), salt) < frac)


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "split1",
    out_col: str = "split",
) -> DataFrame:
    """Disjoint split labels from one hash draw: cumulative weight
    ranges over u. Weights need not sum to 1 — a residual remains
    unlabeled (NULL), which is how a pipeline reserves future splits
    without moving existing rows."""
    u = uniform_hash(F.col(key_col), salt)
    expr = F.lit(None).cast("string")
    acc = 0.0
    cuts = []
    for name, w in weights.items():  # insertion order = range order
        cuts.append((name, acc, acc + float(w)))
        acc += float(w)
    for name, lo, hi in reversed(cuts):
        expr = F.when((u >= F.lit(lo)) & (u < F.lit(hi)), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)
