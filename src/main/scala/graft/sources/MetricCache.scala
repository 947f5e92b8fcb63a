package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted partial-aggregate metric cache — the materialized-rollup
  * layer a semantic-metrics engine needs at 100 TB. The reference
  * (hashquery) recompiles every metric request into SQL over the raw
  * fact table (model.py `aggregate` → warehouse scan each run); that is
  * correct but pays a full fact-table scan per dashboard refresh. The
  * standard warehouse move (public practice: materialized views,
  * Druid/Pinot rollup segments, the classic lambda-architecture batch
  * view) is to aggregate ONCE to a coarse grain of ADDITIVE partials —
  * count, sum, min, max — and answer every coarser query by re-merging
  * the tiny partials instead of rescanning the facts.
  *
  * Contract:
  *   - `save` aggregates facts to `(dims…, __day__)` grain, one row per
  *     key, and writes parquet PARTITIONED BY the grain day, so
  *     time-range serves prune whole partition directories before any
  *     IO and dim predicates push to the parquet scan.
  *   - `append` aggregates ONLY the new slice and appends its partial
  *     rows. The same `(dims…, __day__)` key may then appear in several
  *     files; that is by design — every serve re-aggregates, and the
  *     partials are additive (`sum` of counts/sums, `min` of mins,
  *     `max` of maxes), so duplicate keys merge to exactly the
  *     rebuilt-from-scratch value. Maintenance is therefore a
  *     slice-sized aggregate + file append: no read-modify-write, no
  *     version swap, no shuffle over the existing cache.
  *   - `read` + a caller `groupBy(subset of dims…).agg(merge partials)`
  *     serves any grain coarser than the cached one.
  *
  * Only ALGEBRAIC partials belong here (count/sum/min/max, and avg as
  * sum+count at serve time). Holistic measures (exact distinct, exact
  * percentiles) are NOT additive and must either stay on the fact table
  * or ride a mergeable sketch.
  *
  * Scale: cache size is bounded by |dims cross-product| × days — at a
  * 100 TB fact table with, say, 10⁵ users × 5 types × 365 days that is
  * ≈2×10⁸ rows of a few long columns (single-digit GB), a 10⁴-10⁵×
  * reduction; the once-per-ingest append is the only job that ever
  * touches raw facts.
  */
object MetricCache {

  /** Day-grain partition column added by [[save]]/[[append]]. */
  val DayCol = "__day__"

  /** Standard additive partials over a money-like double column:
    * row count, exact integer-cents sum (per-row half-up rounding — the
    * cross-engine-exact money discipline), min and max. */
  def standardPartials(valueCol: String): Seq[Column] = Seq(
    count(lit(1)).as("n"),
    sum(floor(col(valueCol) * 100 + 0.5).cast("long")).as("cents"),
    min(col(valueCol)).as("vmin"),
    max(col(valueCol)).as("vmax"))

  /** The serve-side merge of [[standardPartials]]: additive re-aggregate
    * yielding the same aliases a direct fact-table aggregate would. */
  def standardMerge: Seq[Column] = Seq(
    sum(col("n")).as("n_events"),
    sum(col("cents")).as("value_cents"),
    min(col("vmin")).as("value_min"),
    max(col("vmax")).as("value_max"))

  private def partialFrame(
      facts: DataFrame,
      dims: Seq[String],
      timeCol: String,
      partials: Seq[Column],
  ): DataFrame = {
    require(dims.nonEmpty && partials.nonEmpty,
      "metric cache needs dims and partial measures")
    facts
      .withColumn(DayCol, date_trunc("day", col(timeCol)).cast("date"))
      .groupBy((dims :+ DayCol).map(col): _*)
      .agg(partials.head, partials.tail: _*)
  }

  /** Build the cache from scratch at `(dims…, day(timeCol))` grain. */
  def save(
      facts: DataFrame,
      dims: Seq[String],
      timeCol: String,
      partials: Seq[Column],
      dir: String,
  ): Unit =
    partialFrame(facts, dims, timeCol, partials)
      .write.mode("overwrite").partitionBy(DayCol).parquet(dir)

  /** Delta maintenance: aggregate ONLY `newFacts` and append its partial
    * rows into the existing cache (partition-aligned file adds; see the
    * duplicate-key contract in the object doc). `dims`/`timeCol`/
    * `partials` must match the original `save` — same grain, same
    * partial algebra — or serves would merge incompatible rows. */
  def append(
      newFacts: DataFrame,
      dims: Seq[String],
      timeCol: String,
      partials: Seq[Column],
      dir: String,
  ): Unit =
    partialFrame(newFacts, dims, timeCol, partials)
      .write.mode("append").partitionBy(DayCol).parquet(dir)

  /** Streaming ingest: maintain the cache from an unbounded fact stream.
    * Each micro-batch is aggregated to day-grain partials and APPENDED —
    * exactly one [[append]] per batch, so the duplicate-key/additive
    * contract makes the stream-maintained cache serve values identical
    * to a batch rebuild at every point (MetricCacheSpec pins parity).
    * No keyed state, no watermark: late facts just append more partial
    * rows for their (dims…, day) key and merge at serve — the partial
    * algebra IS the late-data story. */
  def streamAppend(
      stream: DataFrame,
      dims: Seq[String],
      timeCol: String,
      partials: Seq[Column],
      dir: String,
      checkpointDir: String,
  ): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) append(batch.toDF(), dims, timeCol, partials, dir)
      }
      .start()

  /** TAKEDOWN (right-to-be-forgotten): rewrite the cache WITHOUT the
    * rows matching `dropPred` into a fresh `dstDir` — possible precisely
    * because the partials keep the protected dim in the grain (a cache
    * aggregated past user_id could only be rebuilt from facts). Writes
    * to a NEW dir, never in place: cached relations over the old version
    * keep reading it until the caller re-points and retires (the same
    * versioned-artifact discipline as ParquetIO.promoteVersion). One
    * scan of the metric-sized cache; the fact table is never touched. */
  def takedown(
      spark: SparkSession,
      srcDir: String,
      dropPred: Column,
      dstDir: String,
  ): Unit =
    read(spark, srcDir).where(!coalesce(dropPred, lit(false)))
      .write.mode("error").partitionBy(DayCol).parquet(dstDir)

  /** Streaming maintenance for the distinct sketch — one
    * [[distinctSketchAppend]] per micro-batch. Duplicate occupied-bucket
    * rows across batches are harmless (serve merges by DISTINCT; set
    * union is idempotent), so the stream-maintained sketch estimates
    * exactly like a batch rebuild at every boundary. */
  def distinctSketchStreamAppend(
      stream: DataFrame,
      dims: Seq[String],
      timeCol: String,
      keyCol: String,
      m: Int,
      dir: String,
      checkpointDir: String,
  ): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty)
          distinctSketchAppend(batch.toDF(), dims, timeCol, keyCol, m, dir)
      }
      .start()

  /** Read the cache back; `__day__` returns as a DATE partition column,
    * so time-range predicates are partition filters (pruned before IO)
    * and dim predicates push to the parquet scan. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** DENSE daily serve — the dashboard gap-fill: merge the (filtered)
    * cache slice to (dims…, day), then left-join it onto the full
    * per-dim day SPINE over [fromDay, toDay] so every (dims, day) cell
    * exists. Additive measures zero-fill (a day with no facts has 0
    * events, 0 cents); `value_max` forward-fills (last observation
    * carried forward — the gauge convention), NULL before the first
    * observation. The spine is a generator over the dims OBSERVED in
    * the slice (dims-cardinality × days rows — metric-sized, never
    * fact-sized), and the LOCF window partitions per dim, so nothing
    * here scales with the fact table. Expects [[standardPartials]]
    * rows. */
  def serveDenseDaily(
      cacheSlice: DataFrame,
      dims: Seq[String],
      fromDay: String,
      toDay: String,
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val merged = cacheSlice
      .where(col(DayCol) >= lit(fromDay).cast("date") &&
        col(DayCol) <= lit(toDay).cast("date"))
      .groupBy((dims :+ DayCol).map(col): _*)
      .agg(standardMerge.head, standardMerge.tail: _*)
    val spine = merged.select(dims.map(col): _*).distinct()
      .select(col("*"),
        explode(expr(s"sequence(to_date('$fromDay'), to_date('$toDay'), " +
          "interval 1 day)")).as(DayCol))
    spine.join(merged, dims :+ DayCol, "left")
      .select(dims.map(col) ++ Seq(
        col(DayCol).as("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("value_cents"), lit(0L)).as("value_cents"),
        last(col("value_max"), ignoreNulls = true)
          .over(Window.partitionBy(dims.map(col): _*).orderBy(col(DayCol)))
          .as("last_max")): _*)
  }

  // --- approximate-distinct partials (linear counting, Whang et al.
  //     TODS'90) --------------------------------------------------------
  //
  // COUNT(DISTINCT key) is the one dashboard measure the additive
  // partials above cannot carry (distinct is not additive across days).
  // The mergeable form: hash each key into one of `m` md5 buckets and
  // cache the OCCUPIED-BUCKET SET per (dims…, day) — set union is the
  // merge (a distinct, order- and duplicate-insensitive), and the linear
  // counting estimator n̂ = −m·ln(empty/m) needs only the merged occupied
  // count. Unlike HLL's register folds, the estimate is ONE closed-form
  // expression over ONE integer, so the whole sketch replays exactly in
  // DuckDB (md5 is the engine-portable hash; ln is the only 1-ulp op and
  // rides the repo's 6-dp log-family rounding). Sketch size is bounded
  // by m rows per (dims…, day) group no matter how many facts hashed in
  // — the 100 TB property. Accuracy: for n ≪ m the relative error is
  // ≈sqrt(m)·(e^{n/m}−n/m−1)^{1/2}/n — under 2% at n ≤ m/2; size m to
  // the largest per-group cardinality you care to resolve.

  /** Spark rendering of the bucket hash: first 8 md5 hex digits as an
    * integer, mod `m`. Value-identical to [[bucketDuckSql]] (texts
    * differ because Spark parses hex via `conv`, DuckDB via `0x`). */
  def bucketSparkSql(keyCol: String, m: Int): String =
    s"CAST(conv(substr(md5(CAST($keyCol AS STRING)), 1, 8), 16, 10) " +
      s"AS BIGINT) % $m"

  /** DuckDB rendering of the same bucket hash. */
  def bucketDuckSql(keyCol: String, m: Int): String =
    s"CAST(concat('0x', substr(md5(CAST($keyCol AS STRING)), 1, 8)) " +
      s"AS BIGINT) % $m"

  /** Linear-counting estimate from a merged occupied-bucket count —
    * the SAME formula string evaluates in Spark SQL and DuckDB (`- / *`
    * correctly rounded; `ln` is log-family → 6-dp round; saturated
    * sketches estimate NULL rather than −∞). Every operand is cast to
    * DOUBLE explicitly: a `4096.0` literal types as DECIMAL(5,1) in
    * Spark (division then rounds to scale 7 BEFORE ln — r17's oracle
    * divergence) but as DOUBLE in DuckDB. */
  def linearCountSql(occupiedCol: String, m: Int): String =
    s"CASE WHEN $occupiedCol >= $m THEN NULL " +
      s"ELSE round(CAST(-$m AS DOUBLE) * " +
      s"ln(CAST($m - ($occupiedCol) AS DOUBLE) / CAST($m AS DOUBLE)), 6) END"

  /** Build the distinct sketch: one row per (dims…, day, bucket) that
    * saw at least one key — the occupied-bucket set, day-partitioned
    * like the metric cache. */
  def distinctSketchSave(
      facts: DataFrame,
      dims: Seq[String],
      timeCol: String,
      keyCol: String,
      m: Int,
      dir: String,
  ): Unit =
    sketchFrame(facts, dims, timeCol, keyCol, m)
      .write.mode("overwrite").partitionBy(DayCol).parquet(dir)

  /** Delta maintenance: append the new slice's occupied buckets. Rows
    * duplicated across appends are harmless — serve merges by DISTINCT,
    * and set union is idempotent (the reason a sketch needs no
    * read-modify-write either). */
  def distinctSketchAppend(
      newFacts: DataFrame,
      dims: Seq[String],
      timeCol: String,
      keyCol: String,
      m: Int,
      dir: String,
  ): Unit =
    sketchFrame(newFacts, dims, timeCol, keyCol, m)
      .write.mode("append").partitionBy(DayCol).parquet(dir)

  private def sketchFrame(
      facts: DataFrame,
      dims: Seq[String],
      timeCol: String,
      keyCol: String,
      m: Int,
  ): DataFrame = {
    require(m > 0, "bucket count must be positive")
    facts
      .withColumn(DayCol, date_trunc("day", col(timeCol)).cast("date"))
      .withColumn("__bucket__", expr(bucketSparkSql(keyCol, m)))
      .select((dims :+ DayCol :+ "__bucket__").map(col): _*)
      .distinct()
  }

  /** Approximate DISTINCT-KEY OVERLAP between two slices of `dimCol`
    * (e.g. users who both clicked AND purchased) by inclusion–exclusion
    * over the SAME sketch rows: |A∩B| ≈ n̂(A) + n̂(B) − n̂(A∪B), where
    * n̂(A∪B) comes from the union of the two occupied sets — a count
    * distinct, no extra sketch. Exact distinct-intersections at 100 TB
    * need a full key-level join; this is one scan of the m-bounded
    * sketch. All three estimates and the final sum use the shared
    * 6-dp-rounded formula (`+ 0.0` canonicalizes −0.0), so the whole
    * serve replays in DuckDB. Error compounds ≈3× a single estimate —
    * size m accordingly. */
  def distinctOverlapEstimate(
      spark: SparkSession,
      dir: String,
      dimCol: String,
      valueA: String,
      valueB: String,
      m: Int,
  ): DataFrame =
    read(spark, dir)
      .where(col(dimCol).isin(valueA, valueB))
      .agg(
        count_distinct(when(col(dimCol) === valueA, col("__bucket__")))
          .as("occ_a"),
        count_distinct(when(col(dimCol) === valueB, col("__bucket__")))
          .as("occ_b"),
        count_distinct(col("__bucket__")).as("occ_union"))
      .withColumn("__ea__", expr(linearCountSql("occ_a", m)))
      .withColumn("__eb__", expr(linearCountSql("occ_b", m)))
      .withColumn("__eu__", expr(linearCountSql("occ_union", m)))
      .withColumn("est_overlap",
        expr("round(__ea__ + __eb__ - __eu__ + 0.0, 6)"))
      .select("occ_a", "occ_b", "occ_union", "est_overlap")

  /** Serve an approximate COUNT(DISTINCT key) per `groupDims` from a
    * sketch dir: union the occupied sets (distinct), count, estimate. */
  def distinctEstimate(
      spark: SparkSession,
      dir: String,
      groupDims: Seq[String],
      m: Int,
  ): DataFrame =
    read(spark, dir)
      .groupBy(groupDims.map(col): _*)
      .agg(count_distinct(col("__bucket__")).as("occupied"))
      .withColumn("est_distinct", expr(linearCountSql("occupied", m)))
}
