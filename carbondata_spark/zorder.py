"""Z-order (Morton) clustering for store loads and compaction.

The reference clusters every load on a single composite MDKey — the
dictionary-encoded dimensions packed most-significant-first into one
sortable byte key (processing/.../mdkeygen/MDKeyGenStep.java,
core/.../keygenerator/mdkey/MultiDimKeyVarLengthGenerator.java) — so its
blocklet B-tree prunes well on leading dimensions and progressively
worse on trailing ones. A plain lexicographic ``sortWithinPartitions``
(store.py's default) has the same trailing-column blindness: row-group
min/max on the second sort column span nearly the full domain, so a
filter on it alone prunes nothing.

Z-ordering interleaves the BITS of the per-column keys instead of
concatenating whole keys, giving every clustered column comparable
min/max locality in every row group — the standard multi-dimensional
clustering remedy (used by Delta OPTIMIZE ZORDER BY / Iceberg
sort-order z-order). Opt in per table with the ``clustering='zorder'``
table property (``CREATE CUBE ... OPTIONS('clustering'='zorder')``);
loads and compactions then range-partition + sort on the z-value while
zone maps and parquet stats keep indexing the REAL columns.

Everything here is built-in column expressions (conv/hex/rpad,
width_bucket, shiftleft/bitwise OR) — pure codegen, no UDFs — and the
only extra cost per load is one map-combined min/max aggregate over the
batch to fix the bucketization range.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ZVAL_COL = "_zval"

# 7 bytes = 14 hex chars < 2^56: the widest string prefix whose integer
# form fits a long (and, after the double cast, keeps ~53 bits — more
# than any bucketization needs).
_STR_PREFIX_HEX = 14


def _order_key(col: Column, dtype: T.DataType) -> Column:
    """Order-preserving DOUBLE key for one clustered column.

    - numerics: plain cast (exact order).
    - timestamp/date: epoch seconds (session pinned UTC upstream).
    - string: the first-7-bytes big-endian integer — ``hex`` is
      order-preserving per byte and right-padding the hex with '0'
      makes widths equal without reordering (a shorter string is a
      prefix, padding with the smallest digit keeps it smallest).
      Ties beyond 7 bytes collapse into one bucket, which only costs
      clustering resolution, never correctness.

    NULLs map to NULL and are bucketed to 0 (sort lowest) downstream.
    """
    if isinstance(dtype, T.StringType):
        return F.conv(
            F.rpad(F.hex(col), _STR_PREFIX_HEX, "0"), 16, 10
        ).cast("double")
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return col.cast("timestamp").cast("double")
    return col.cast("double")


def _bucket(key: Column, lo: float | None, hi: float | None, n_buckets: int) -> Column:
    """Clamp ``width_bucket`` onto [0, n_buckets-1]; NULL/degenerate → 0."""
    if lo is None or hi is None or not hi > lo:
        # empty batch or constant column: no discriminating power anyway
        return F.lit(0).cast("long")
    wb = F.width_bucket(key, F.lit(float(lo)), F.lit(float(hi)), F.lit(n_buckets))
    clamped = F.least(F.greatest(wb - 1, F.lit(0)), F.lit(n_buckets - 1))
    return F.coalesce(clamped, F.lit(0)).cast("long")


def _interleave(buckets: list[Column], bits: int) -> Column:
    """Morton-interleave ``bits`` bits of each bucket into one long:
    bit i of column j lands at position i*k + j (column 0 least
    significant per bit group, mirroring the reference's ordinal-ordered
    MDKey pack)."""
    k = len(buckets)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(buckets):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), i * k + j)
            )
    return z


def with_zvalue(df: DataFrame, cols: list[str]) -> DataFrame:
    """Append ``_zval`` — the Morton code of ``cols`` — to ``df``.

    Bits per column = min(16, 63 // k) so the interleaved code stays in
    a non-negative long. The bucketization range comes from ONE min/max
    aggregate over the batch (map-combined, one tiny shuffle): a
    per-batch range is exactly what the write path needs, since each
    load clusters only its own segment.
    """
    if ZVAL_COL in df.columns:
        # withColumn would OVERWRITE the data column and cluster_writer's
        # drop would then remove it from the written segment — silent
        # data loss; fail loudly instead.
        raise ValueError(
            f"input already has a column named {ZVAL_COL!r}; rename it "
            "before z-order clustering"
        )
    if not cols:
        return df.withColumn(ZVAL_COL, F.lit(0).cast("long"))
    k = len(cols)
    bits = min(16, 63 // k)
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    keys = [_order_key(F.col(c), dtypes[c]) for c in cols]

    stats_row = df.agg(
        *[F.min(key).alias(f"lo{i}") for i, key in enumerate(keys)],
        *[F.max(key).alias(f"hi{i}") for i, key in enumerate(keys)],
    ).first()
    buckets = [
        _bucket(key, stats_row[f"lo{i}"], stats_row[f"hi{i}"], 1 << bits)
        for i, key in enumerate(keys)
    ]
    return df.withColumn(ZVAL_COL, _interleave(buckets, bits))


def cluster_writer(
    df: DataFrame,
    cols: list[str],
    partitions: int | None,
    prefix_cols: list[str] | None = None,
) -> DataFrame:
    """The z-order write plan: range-partition (when asked) and sort
    within partitions on the z-value, then drop it — rows land
    Morton-ordered, so every clustered column gets tight row-group
    min/max. The drop is a projection AFTER the sort; it does not
    disturb row order.

    ``prefix_cols`` (the table's hive partition columns) lead the range
    key so each partition value occupies a CONTIGUOUS run of tasks:
    without it a ``write.partitionBy`` downstream scatters every value
    across all tasks, and each directory collects up to ``partitions``
    files instead of ~its row share."""
    out = with_zvalue(df, cols)
    prefix = list(prefix_cols or [])
    if partitions:
        out = out.repartitionByRange(partitions, *prefix, ZVAL_COL)
    return out.sortWithinPartitions(*prefix, ZVAL_COL).drop(ZVAL_COL)
