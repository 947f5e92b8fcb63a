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
  ): DataFrame =
    hllEstimate(hllRegisters(df, groupCols, value, p), groupCols, p)

  /** The register-build half of [[hllDistinct]]: one map-side-combined
    * aggregate to (group, bucket, M) — the mergeable sketch state (merge =
    * max per bucket, the operation [[hllOverlap]] uses for set union).
    * At most 2^p rows per group regardless of input size. */
  def hllRegisters(
      df: DataFrame,
      groupCols: Seq[String],
      value: Column,
      p: Int,
  ): DataFrame = {
    require(p >= 4 && p <= 14, s"hll precision p must be in [4, 14], got $p")
    val m = (1 << p).toLong
    val k = 4 * 15 - p + 1 // max possible rank
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
    base.withColumn("__rho__", rho)
      .groupBy(gb :+ col("__bkt__"): _*)
      .agg(max(col("__rho__")).cast("int").as("__M__"))
  }

  /** The estimator half of [[hllDistinct]]: fold (group, __bkt__, __M__)
    * registers into (group, hll_estimate, hll_buckets_used). */
  def hllEstimate(regs: DataFrame, groupCols: Seq[String], p: Int): DataFrame = {
    val m = (1 << p).toLong
    val k = 4 * 15 - p + 1
    val gb = groupCols.map(col)
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

  /** The inclusion–exclusion step of [[hllOverlap]] as ONE shared SQL
    * string (applied to already-6dp-rounded estimate columns: sum and
    * difference of identical doubles in identical order are bit-identical
    * across engines; the final round canonicalizes). */
  val HllIntersectSql: String =
    "round(((est_a + est_b) - est_union) + CAST(0 AS DOUBLE), 6)"

  /** Corpus-overlap estimation via HLL set algebra — "how much of corpus B
    * is already in corpus A?" asked at 100 TB without shuffling a single
    * distinct value: |A∪B| from the bucket-wise MAX of the two register
    * sets (HLL union is exact — the union sketch IS the sketch of the
    * union), |A∩B| by inclusion–exclusion. One pass over each input,
    * 3·2^p register rows total. Returns one row
    * (est_a, est_b, est_union, est_intersect). */
  def hllOverlap(
      a: DataFrame,
      b: DataFrame,
      value: Column,
      p: Int = 8,
  ): DataFrame = {
    val tagged = a.select(lit("a").as("__side__"), value.as("__v__"))
      .unionAll(b.select(lit("b").as("__side__"), value.as("__v__")))
    val regs = hllRegisters(tagged, Seq("__side__"), col("__v__"), p)
    val uni = regs.groupBy(col("__bkt__")).agg(max(col("__M__")).as("__M__"))
      .select(lit("u").as("__side__"), col("__bkt__"), col("__M__"))
    val est = hllEstimate(regs.unionByName(uni), Seq("__side__"), p)
    est.agg(
      max(when(col("__side__") === "a", col("hll_estimate"))).as("est_a"),
      max(when(col("__side__") === "b", col("hll_estimate"))).as("est_b"),
      max(when(col("__side__") === "u", col("hll_estimate"))).as("est_union"))
      .withColumn("est_intersect", expr(HllIntersectSql))
  }

  /** Count-min sketch counters (Cormode & Muthukrishnan 2005): a d×w
    * integer counter matrix as (row, bucket, count) rows — the mergeable
    * frequency sketch (merge = bucket-wise SUM). All-integer and
    * md5-derived like [[hllRegisters]], so another engine replays it
    * bit-for-bit. One map-side-combined aggregate: at most d·w rows cross
    * the wire regardless of input size — the 100 TB answer to "how often
    * does each of these terms appear" when the term dictionary itself is
    * too large to count exactly. Returns (__i__, __bkt__, __cnt__). */
  def cmsCounters(
      df: DataFrame,
      value: Column,
      d: Int = 4,
      w: Int = 512,
  ): DataFrame = {
    require(d >= 1 && d <= 16, s"cms depth d must be in [1, 16], got $d")
    require(w >= 16, s"cms width w must be >= 16, got $w")
    df.select(value.cast("string").as("__v__"))
      .where(col("__v__").isNotNull)
      .withColumn("__h__", cmsBase(col("__v__")))
      .withColumn("__i__", explode(sequence(lit(0), lit(d - 1))))
      .select(col("__i__"), cmsBucket(col("__i__"), col("__h__"), w).as("__bkt__"))
      .groupBy(col("__i__"), col("__bkt__"))
      .agg(count(lit(1)).as("__cnt__"))
  }

  /** ONE md5 per value — the d row hashes derive from this base through
    * the affine universal family (the MinHash signature trick: a value
    * pays one md5, not d; measured 4× per-row hashing off the CMS build).
    * DuckDB replay: `CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)
    * % 2147483647`. */
  private def cmsBase(v: Column): Column =
    pmod(conv(substring(md5(v.cast("binary")), 1, 15), 16, 10).cast("long"),
      lit(2147483647L))

  /** h_i(x) = ((2i+1)·base + 1000000007·i) mod 2147483647 mod w — the
    * same Mersenne-prime affine family as the MinHash signatures: base
    * < 2^31 and the odd multiplier ≤ 31 keep every intermediate < 2^40,
    * so the DuckDB replay is plain BIGINT arithmetic. */
  private def cmsBucket(row: Column, base: Column, w: Int): Column =
    pmod(((lit(2L) * row + lit(1L)) * base + lit(1000000007L) * row)
      % lit(2147483647L), lit(w.toLong))

  /** Point-estimate the frequency of each probe key: min over the d
    * counters the key hashes to (one-sided error — never an undercount;
    * overcount ≤ 2·n/w with probability 1−2^−d). The counter matrix is
    * tiny (≤ d·w rows) and broadcast; probes never shuffle. Probe keys
    * absent from the sketch entirely estimate as their bucket counts
    * (or 0 when a bucket is empty). */
  def cmsEstimate(
      counters: DataFrame,
      probes: DataFrame,
      keyCol: String,
      d: Int = 4,
      w: Int = 512,
  ): DataFrame = {
    val keyed = probes.select(col(keyCol).cast("string").as("__k__"))
      .withColumn("__h__", cmsBase(col("__k__")))
      .withColumn("__i__", explode(sequence(lit(0), lit(d - 1))))
      .withColumn("__bkt__", cmsBucket(col("__i__"), col("__h__"), w))
    keyed.join(broadcast(counters), Seq("__i__", "__bkt__"), "left")
      .groupBy(col("__k__"))
      .agg(min(coalesce(col("__cnt__"), lit(0L))).as("cms_estimate"))
      .withColumnRenamed("__k__", keyCol)
  }

  /** Roll a finer-grained [[hllRegisters]] frame up to coarser groups and
    * estimate — the pre-aggregated sketch-cube pattern (Druid/BigQuery HLL
    * cubes): registers built ONCE per (dimension…, time-slice) answer
    * distinct counts over ANY slice union by bucket-wise MAX, and the
    * rollup is register-EXACT (max of per-slice maxes = the max over the
    * union), so a cube query equals the direct sketch of the combined
    * data bit-for-bit. Input rows are (fine groups ⊇ keepGroupCols,
    * __bkt__, __M__); cost is an aggregate over ≤ slices·2^p rows — data
    * is never rescanned. */
  def hllRollup(
      regs: DataFrame,
      keepGroupCols: Seq[String],
      p: Int = 8,
  ): DataFrame = {
    val merged = regs
      .groupBy(keepGroupCols.map(col) :+ col("__bkt__"): _*)
      .agg(max(col("__M__")).as("__M__"))
    hllEstimate(merged, keepGroupCols, p)
  }

  /** The per-group sample-rate cutoff as ONE shared SQL string: the kept
    * SET is `md5_u32(key) < floor(min(1, target/n) · 2^32)` — division
    * and multiplication are correctly rounded IEEE ops and floor/least
    * are exact, so both engines keep the identical rows (the hash-cutoff
    * discipline). `target ≥ n` degenerates to keep-everything. */
  def sampleCutoffSql(target: Long, nCol: String): String =
    s"CAST(floor(least(CAST(1 AS DOUBLE), CAST($target AS DOUBLE) / " +
      s"CAST($nCol AS DOUBLE)) * CAST(4294967296 AS DOUBLE)) AS BIGINT)"

  /** Quantiles by deterministic uniform row-sampling — the 100 TB answer
    * to exact percentiles (which sort EVERY group value): one cheap count
    * aggregate sizes a per-group hash cutoff so ~`targetSample` rows
    * survive, the kept set is a pure md5 filter (deterministic, engine-
    * portable, trivially mergeable — a union resampled at the union's
    * cutoff is again a uniform sample), and the exact interpolated
    * percentile then runs on the tiny survivor frame. Sampling error is
    * the textbook order-statistic bound O(1/√targetSample) on the rank;
    * with `targetSample ≥ n` the result IS the exact percentile
    * (spec-pinned identity).
    *
    * `key` must be row-unique (duplicates under-sample their value). One
    * shuffle for the count, a broadcast join back, and a percentile over
    * ~groups·targetSample rows. Returns group columns + n (exact row
    * count), n_sample, and one `<label>` DOUBLE (6 dp) per prob.
    */
  def sampledQuantiles(
      df: DataFrame,
      groupCols: Seq[String],
      key: Column,
      value: Column,
      probs: Seq[(String, Double)],
      targetSample: Long = 2000L,
  ): DataFrame = {
    require(probs.nonEmpty, "sampledQuantiles needs at least one prob")
    require(targetSample >= 100L,
      s"targetSample must be >= 100 for a usable estimate, got $targetSample")
    val gb = groupCols.map(col)
    val base = df.select(gb :+ key.cast("string").as("__k__") :+
        value.cast("double").as("__v__"): _*)
      .where(col("__k__").isNotNull && col("__v__").isNotNull)
    val counts = base.groupBy(gb: _*).agg(count(lit(1)).as("__n__"))
    val u32 = conv(substring(md5(col("__k__").cast("binary")), 1, 8), 16, 10)
      .cast("long")
    val kept = base.join(broadcast(counts), groupCols)
      .where(u32 < expr(sampleCutoffSql(targetSample, "__n__")))
    val qs = probs.map { case (label, pr) =>
      round(percentile(col("__v__"), lit(pr)) + lit(0.0), 6).as(label)
    }
    kept.groupBy(gb: _*)
      .agg(max(col("__n__")).as("n"),
        (count(lit(1)).as("n_sample") +: qs): _*)
  }
}
