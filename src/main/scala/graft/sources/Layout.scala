package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) multi-dimensional data layout — the standard
  * 100 TB move for parquet min/max data skipping when queries filter on
  * MORE than one column (public practice: Delta Lake `OPTIMIZE ZORDER BY`,
  * Iceberg's z-order rewrite; Morton 1966). A lexicographic
  * `ORDER BY (x, y)` gives file-level min/max pruning on `x` only — every
  * file spans the full `y` range, so a `y` predicate prunes nothing. The
  * z-curve interleaves the bits of equal-width 16-bit buckets of BOTH
  * columns, so sorted-by-z files cover small rectangles in (x, y) space
  * and the scan prunes on either predicate (or both).
  *
  * The reference (hashquery) has no physical-layout surface at all — it
  * compiles to SQL over whatever the warehouse stores. This is part of
  * graft's beyond-reference scale layer, next to the bucketed sinks in
  * [[ParquetIO]].
  *
  * Shared-formula discipline: the key is built from `+`, `*`, `&`,
  * `floor`, `least`/`greatest`, `CASE` — every op parsed and evaluated
  * identically by Spark SQL and DuckDB (integer ops exact; the one
  * double expression uses only correctly-rounded `- / *` and `floor`), so
  * the DuckDB oracle replays `q_zorder_key` bit-for-bit. Bit-spreading
  * uses PRE-MASKED disjoint decomposition — `(x & keep) + (x & move) *
  * 2^s` — because the textbook `(x | x << 8) & mask` form relies on `|`
  * tolerating overlapping intermediates, and replacing `|` with `+`
  * there would carry; with disjoint pre-masks, `+` IS `|` exactly.
  * ZOrderSpec pins the identity against a literal shift/or reference
  * implementation.
  */
object Layout {

  /** Spread the low 16 bits of `x` to even bit positions 0,2,…,30
    * (Morton part1by1). `x` must already be a BIGINT expression; values
    * above 16 bits are masked. */
  def spread16Sql(x: String): String = {
    def step(e: String, keep: Long, move: Long, mul: Long): String =
      s"((($e) & $keep) + ((($e) & $move) * $mul))"
    val s0 = s"(($x) & 65535)"
    val s1 = step(s0, 255L, 65280L, 256L) // bytes → 0-7, 16-23
    val s2 = step(s1, 983055L, 15728880L, 16L) // nibbles → 0-3,8-11,16-19,24-27
    val s3 = step(s2, 50529027L, 202116108L, 4L) // pairs → every 4th position
    step(s3, 286331153L, 572662306L, 2L) // bits → even positions
  }

  /** Spread the low 10 bits of `x` to every THIRD bit position
    * 0,3,…,27 (Morton part1by2 — the 3-column interleave's per-column
    * half). Same pre-masked `+ * &` discipline as [[spread16Sql]];
    * ZOrderSpec pins it against the classic shift/or sequence
    * (masks 0x30000ff / 0x300f00f / 0x30c30c3 / 0x9249249). */
  def spread10x3Sql(x: String): String = {
    def step(e: String, keep: Long, move: Long, mul: Long): String =
      s"((($e) & $keep) + ((($e) & $move) * $mul))"
    val s0 = s"(($x) & 1023)"
    val s1 = step(s0, 255L, 768L, 65536L) // bits 8-9 → 24-25
    val s2 = step(s1, 50331663L, 240L, 256L) // nibble 4-7 → 12-15
    val s3 = step(s2, 50343939L, 49164L, 16L) // pairs → stride-6 slots
    step(s3, 17043521L, 34087042L, 4L) // bits → every 3rd position
  }

  /** Equal-width 16-bit bucket of `x` within [mn, mx]: 0 on a degenerate
    * (mx <= mn) range, clamped at both ends, NaN clamps to 65535 via the
    * engines' shared NaN-is-greatest comparison semantics; NULL
    * propagates. */
  def bucket16Sql(x: String, mn: String, mx: String): String =
    s"(CASE WHEN ($mx) <= ($mn) THEN 0 ELSE " +
      s"CAST(least(CAST(65535.0 AS DOUBLE), greatest(CAST(0.0 AS DOUBLE), " +
      s"floor((CAST($x AS DOUBLE) - ($mn)) / (($mx) - ($mn)) * " +
      s"CAST(65535.0 AS DOUBLE)))) AS BIGINT) END)"

  /** 2-D Morton key from two 16-bit buckets: `bx` on even bits, `by` on
    * odd. The operands are expected to be plain column references (each
    * is referenced 16 times by the spread steps — cheap for a column,
    * expensive for an inlined subexpression; [[withZKey]] layers the
    * buckets as columns for exactly this reason, and oracles should do
    * the same with a subselect). */
  def zorder2Sql(bx: String, by: String): String =
    s"((${spread16Sql(bx)}) + (${spread16Sql(by)}) * 2)"

  /** Equal-width 10-bit bucket (the 3-column key's per-column half —
    * 1024 levels per dimension; same clamp/NULL/NaN semantics as
    * [[bucket16Sql]]). */
  def bucket10Sql(x: String, mn: String, mx: String): String =
    s"(CASE WHEN ($mx) <= ($mn) THEN 0 ELSE " +
      s"CAST(least(CAST(1023.0 AS DOUBLE), greatest(CAST(0.0 AS DOUBLE), " +
      s"floor((CAST($x AS DOUBLE) - ($mn)) / (($mx) - ($mn)) * " +
      s"CAST(1023.0 AS DOUBLE)))) AS BIGINT) END)"

  /** 3-D Morton key from three 10-bit buckets: `bx` on bits 0,3,…,
    * `by` on 1,4,…, `bz` on 2,5,… — 30 significant bits. Operands
    * should be plain column references (see [[zorder2Sql]]). */
  def zorder3Sql(bx: String, by: String, bz: String): String =
    s"((${spread10x3Sql(bx)}) + (${spread10x3Sql(by)}) * 2 + " +
      s"(${spread10x3Sql(bz)}) * 4)"

  /** Adds the 3-D z-key column (the [[withZKey]] shape, one more
    * dimension at 10 bits each). */
  def withZKey3(
      df: DataFrame, x: String, y: String, z: String,
      out: String = "__z__"): DataFrame = {
    val mm = df.agg(
      min(col(x).cast("double")).as("__xmn__"),
      max(col(x).cast("double")).as("__xmx__"),
      min(col(y).cast("double")).as("__ymn__"),
      max(col(y).cast("double")).as("__ymx__"),
      min(col(z).cast("double")).as("__zmn__"),
      max(col(z).cast("double")).as("__zmx__"))
    df.crossJoin(broadcast(mm))
      .withColumn("__bx__", expr(bucket10Sql(x, "__xmn__", "__xmx__")))
      .withColumn("__by__", expr(bucket10Sql(y, "__ymn__", "__ymx__")))
      .withColumn("__bz__", expr(bucket10Sql(z, "__zmn__", "__zmx__")))
      .withColumn(out, expr(zorder3Sql("__bx__", "__by__", "__bz__")))
      .drop("__xmn__", "__xmx__", "__ymn__", "__ymx__", "__zmn__", "__zmx__",
        "__bx__", "__by__", "__bz__")
  }

  /** 3-column [[writeZOrdered]]. */
  def writeZOrdered3(
      df: DataFrame, x: String, y: String, z: String, path: String,
      numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    withZKey3(df, x, y, z)
      .repartitionByRange(numFiles, col("__z__"))
      .sortWithinPartitions("__z__")
      .drop("__z__")
      .write.mode("overwrite").parquet(path)
  }

  /** Adds the 2-D z-key column: one global min/max aggregate (provably
    * 1-row broadcast — one corpus pass with map-side partials), bucket
    * columns, interleave. No shuffle of `df` itself. */
  def withZKey(
      df: DataFrame, x: String, y: String, out: String = "__z__"): DataFrame = {
    val mm = df.agg(
      min(col(x).cast("double")).as("__xmn__"),
      max(col(x).cast("double")).as("__xmx__"),
      min(col(y).cast("double")).as("__ymn__"),
      max(col(y).cast("double")).as("__ymx__"))
    df.crossJoin(broadcast(mm))
      .withColumn("__bx__", expr(bucket16Sql(x, "__xmn__", "__xmx__")))
      .withColumn("__by__", expr(bucket16Sql(y, "__ymn__", "__ymx__")))
      .withColumn(out, expr(zorder2Sql("__bx__", "__by__")))
      .drop("__xmn__", "__xmx__", "__ymn__", "__ymx__", "__bx__", "__by__")
  }

  /** Rewrite `df` as `numFiles` parquet files range-partitioned and
    * sorted by the 2-D z-key of (x, y): each output file covers a small
    * rectangle of (x, y) space, so parquet footer min/max statistics
    * prune files (and row groups) for range predicates on EITHER column.
    * One shuffle (the range exchange) — the price of any layout rewrite;
    * at cluster scale this is the `OPTIMIZE ZORDER` batch job, run once
    * per ingest epoch, amortized over every downstream scan. */
  def writeZOrdered(
      df: DataFrame, x: String, y: String, path: String,
      numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    withZKey(df, x, y)
      .repartitionByRange(numFiles, col("__z__"))
      .sortWithinPartitions("__z__")
      .drop("__z__")
      .write.mode("overwrite").parquet(path)
  }
}
