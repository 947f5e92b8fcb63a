package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed cardinality sketches (beyond-reference surface).
  *
  * At 100 TB, `count(distinct x)` is one of the most expensive questions a
  * pipeline asks (a full shuffle of every distinct value). HyperLogLog
  * answers it in one pass with m integer registers per group — and because
  * the register math here is ALL integer (md5-derived buckets, bit-length
  * ranks, power-of-two sums), the sketch state is exactly replayable by
  * another SQL engine, unlike builtin `approx_count_distinct`
  * implementations whose hash and bias tables are engine-private. Flajolet
  * et al. 2007 (HyperLogLog), with the standard small-range linear
  * counting correction.
  */
object Sketch {

  /** The estimator formula as ONE shared SQL string (the cross-engine
    * float discipline: both the Spark lowering and the DuckDB oracle run
    * this string verbatim, so every IEEE op happens in the same order).
    * `sCol` is the integer register sum Σ 2^(K−M_j) (absent registers
    * contribute 2^K), `vCol` the zero-register count V; all literals are
    * CAST(... AS DOUBLE) because DuckDB types bare fractional literals as
    * DECIMAL. Division and multiplication are correctly rounded in both
    * engines; only `ln` (small-range linear counting) is ~1 ulp, hence
    * the 6 dp round. */
  def hllEstimateSql(p: Int, sCol: String, vCol: String): String = {
    val m = 1 << p
    val twoK = (1L << (4 * 15 - p + 1)).toString // 2^K, exactly representable
    val est = s"CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE) + " +
      s"CAST(1.079 AS DOUBLE) / CAST($m AS DOUBLE)) * CAST($m AS DOUBLE) * " +
      s"CAST($m AS DOUBLE) * CAST($twoK AS DOUBLE) / $sCol"
    val smallCut = s"CAST(${m * 5 / 2} AS DOUBLE)" // 2.5 m
    s"round((CASE WHEN $est <= $smallCut AND $vCol > 0 " +
      s"THEN CAST($m AS DOUBLE) * ln(CAST($m AS DOUBLE) / $vCol) " +
      s"ELSE $est END) + CAST(0 AS DOUBLE), 6)"
  }

  /** Per-group HyperLogLog distinct count of `value`.
    *
    * Register construction (all integer, engine-portable):
    *   - h      = first 15 md5 hex chars of the value as a 60-bit int
    *   - bucket = h mod m           (m = 2^p registers)
    *   - w      = h div m           (the remaining 60−p bits)
    *   - rho(w) = (60−p) − bitlen(w) + 1, and 60−p+1 when w = 0
    *   - M_j    = max rho over the group's values in bucket j
    * The register sum is carried as the INTEGER Σ 2^(K−M_j), K = 60−p+1
    * (absent buckets contribute 2^K = an M of 0): bounded by m·2^K < 2^62,
    * exact under any add order — the float form Σ 2^−M is not (a 2^−53
    * term vanishes against a large partial sum, making the result
    * partitioning-dependent). The estimate itself runs [[hllEstimateSql]].
    *
    * Scale: one map-side-combined aggregate to (group, bucket) — at most
    * m rows per group cross the wire regardless of input size — then a
    * tiny per-group fold. Returns group columns + `hll_estimate` DOUBLE
    * (6 dp), `hll_buckets_used` BIGINT.
    */
  def hllDistinct(
      df: DataFrame,
      groupCols: Seq[String],
      value: Column,
      p: Int = 8,
  ): DataFrame = {
    require(p >= 4 && p <= 14, s"hll precision p must be in [4, 14], got $p")
    val m = (1 << p).toLong
    val wBits = 4 * 15 - p // hash bits left after the bucket index
    val k = wBits + 1      // max possible rank
    val gb = groupCols.map(col)
    val h = conv(substring(md5(value.cast("string").cast("binary")), 1, 15),
      16, 10).cast("long")
    val base = df.select(gb :+ h.as("__h__"): _*)
      .where(col("__h__").isNotNull)
      .select(gb :+ pmod(col("__h__"), lit(m)).as("__bkt__") :+
        (((col("__h__") - pmod(col("__h__"), lit(m))) / lit(m)).cast("long"))
          .as("__w__"): _*)
    val rho = when(col("__w__") === 0L, lit(k))
      .otherwise(lit(k) - length(bin(col("__w__"))))
    val regs = base.withColumn("__rho__", rho)
      .groupBy(gb :+ col("__bkt__"): _*)
      .agg(max(col("__rho__")).cast("int").as("__M__"))
    val term = expr(s"shiftleft(CAST(1 AS BIGINT), $k - __M__)")
    val agg = regs.groupBy(gb: _*)
      .agg(sum(term).as("__Sp__"), count(lit(1)).as("__nb__"))
      .withColumn("__S__",
        col("__Sp__") + (lit(m) - col("__nb__")) * lit(1L << k))
      .withColumn("__V__", lit(m) - col("__nb__"))
    agg.select(gb :+
      expr(hllEstimateSql(p, "__S__", "__V__")).as("hll_estimate") :+
      col("__nb__").as("hll_buckets_used"): _*)
  }
}
