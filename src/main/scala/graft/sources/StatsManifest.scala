package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max statistics manifest — Delta/Iceberg-style data
  * skipping decoupled from parquet footers (public practice: Delta's
  * stats in the transaction log, Iceberg's manifest files). Parquet
  * footer pruning still LISTS and OPENS every file's footer per query;
  * at 100 TB that is millions of S3 HEAD/GET round-trips before the
  * first data byte. A manifest is one tiny parquet table — (file, row
  * count, min/max per indexed column) — scanned in a single task, and
  * the query plans over exactly the files whose [min, max] intervals
  * intersect its predicates. Pairs with [[Layout]]: a z-ordered rewrite
  * makes per-file ranges tight on every indexed dimension, which is
  * what makes the manifest selective.
  *
  * Maintenance is incremental by construction: stats rows are per-file
  * and files are immutable, so an ingest appends stats for its NEW
  * files only ([[append]] lists the data dir, anti-joins the manifest,
  * and scans just the missing files). No read-modify-write, no version
  * swap — the same append-only discipline as [[MetricCache]].
  *
  * NULL-safety: a file with no non-null values for an indexed column
  * has NULL min/max; pruning treats unknown as must-read (never
  * dropped), so skipping is always sound.
  */
object StatsManifest {

  private def fileList(spark: SparkSession, dataDir: String): Seq[String] = {
    val path = new org.apache.hadoop.fs.Path(dataDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(path).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toUri.toString)
  }

  private def statsFor(
      spark: SparkSession, files: Seq[String], cols: Seq[String],
  ): DataFrame =
    spark.read.parquet(files: _*)
      .withColumn("__file__", input_file_name())
      .groupBy(col("__file__"))
      .agg(count(lit(1)).as("n_rows"),
        cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"),
          max(col(c)).as(s"max_$c"))): _*)

  /** Build the manifest for every parquet file currently in `dataDir`. */
  def save(
      spark: SparkSession, dataDir: String, cols: Seq[String],
      manifestDir: String,
  ): Unit =
    statsFor(spark, fileList(spark, dataDir), cols)
      .coalesce(1)
      .write.mode("overwrite").parquet(manifestDir)

  /** Incremental maintenance: stat and append ONLY files not yet in the
    * manifest. Returns how many new files were indexed. */
  def append(
      spark: SparkSession, dataDir: String, cols: Seq[String],
      manifestDir: String,
  ): Int = {
    val known = spark.read.parquet(manifestDir)
      .select("__file__").collect().map(_.getString(0)).toSet
    val fresh = fileList(spark, dataDir).filterNot(known)
    if (fresh.nonEmpty)
      statsFor(spark, fresh, cols)
        .coalesce(1)
        .write.mode("append").parquet(manifestDir)
    fresh.size
  }

  /** Files whose stats CANNOT rule out the conjunction of
    * `col between lo and hi` ranges — NULL stats survive (sound). The
    * manifest is file-count-sized, so the collect is the same bounded
    * driver-side step Delta/Iceberg planning performs. */
  def pruneFiles(
      spark: SparkSession, manifestDir: String,
      ranges: Seq[(String, Any, Any)],
  ): Seq[String] = {
    val keep = ranges
      .map { case (c, lo, hi) =>
        col(s"min_$c").isNull || col(s"max_$c").isNull ||
          !(col(s"max_$c") < lit(lo) || col(s"min_$c") > lit(hi))
      }
      .reduceOption(_ && _).getOrElse(lit(true))
    spark.read.parquet(manifestDir).where(keep)
      .select("__file__").collect().map(_.getString(0)).toSeq
  }

  // --- per-file Bloom index for EQUALITY skipping -----------------------
  //
  // Min/max intervals prune RANGE predicates; a point lookup on a
  // high-cardinality key (event_id, doc_id) intersects almost every
  // file's range. The public move (Databricks bloom filter index,
  // parquet's own column bloom — which Spark's planner never uses for
  // FILE pruning) is a per-file Bloom bitset in the manifest: k
  // xxhash64-derived bits per key, per-file bit-OR, and an equality
  // probe keeps only files with all k bits set. False positives cost a
  // wasted file read; false negatives are impossible (the file holding
  // the key always set its bits), so skipping stays sound. Size `bits`
  // to rows-per-file (1% fp ≈ 10 bits/key at k=7; even bits/key ≈ 4,
  // k=2 cuts a needle lookup to a handful of files).

  private def bloomPosSql(keySql: String, bits: Int, k: Int): String = {
    def p(i: Int) =
      s"pmod(xxhash64(concat('$i:', CAST($keySql AS STRING))), $bits)"
    (0 until k).map(i =>
      s"named_struct('w', CAST(${p(i)} div 64 AS INT), " +
        s"'m', shiftleft(CAST(1 AS BIGINT), CAST(${p(i)} % 64 AS INT)))")
      .mkString("array(", ", ", ")")
  }

  private def bloomFor(
      spark: SparkSession, files: Seq[String], keyCol: String,
      bits: Int, k: Int,
  ): DataFrame = {
    require(bits % 64 == 0 && bits > 0 && k > 0,
      "bits must be a positive multiple of 64")
    val words = bits / 64
    spark.read.parquet(files: _*)
      .where(col(keyCol).isNotNull)
      .withColumn("__file__", input_file_name())
      .select(col("__file__"),
        explode(expr(bloomPosSql(keyCol, bits, k))).as("__p__"))
      .groupBy(col("__file__"), col("__p__.w").as("__w__"))
      .agg(expr("bit_or(__p__.m)").as("__m__"))
      .groupBy("__file__")
      .agg(map_from_entries(collect_list(struct(col("__w__"), col("__m__"))))
        .as("__wm__"))
      .select(col("__file__"),
        expr(s"transform(sequence(0, ${words - 1}), " +
          "wi -> coalesce(try_element_at(__wm__, wi), CAST(0 AS BIGINT)))")
          .as("bloom"))
  }

  /** Build the Bloom index for every parquet file in `dataDir`. The
    * caller owns (keyCol, bits, k) consistency across save/append/probe
    * — same contract as [[MetricCache]]'s partial algebra. */
  def bloomSave(
      spark: SparkSession, dataDir: String, keyCol: String,
      bits: Int, k: Int, bloomDir: String,
  ): Unit =
    bloomFor(spark, fileList(spark, dataDir), keyCol, bits, k)
      .coalesce(1)
      .write.mode("overwrite").parquet(bloomDir)

  /** Incremental maintenance: index ONLY files not yet present. */
  def bloomAppend(
      spark: SparkSession, dataDir: String, keyCol: String,
      bits: Int, k: Int, bloomDir: String,
  ): Int = {
    val known = spark.read.parquet(bloomDir)
      .select("__file__").collect().map(_.getString(0)).toSet
    val fresh = fileList(spark, dataDir).filterNot(known)
    if (fresh.nonEmpty)
      bloomFor(spark, fresh, keyCol, bits, k)
        .coalesce(1)
        .write.mode("append").parquet(bloomDir)
    fresh.size
  }

  /** Files that may contain `keyCol = value`: all k probe bits set (or
    * a NULL bitset — unknown survives). Probe positions come from the
    * SAME expression evaluated over a one-row frame, so the probe can
    * never drift from the build. */
  def bloomPruneFiles(
      spark: SparkSession, bloomDir: String, value: Any, bits: Int, k: Int,
  ): Seq[String] = {
    val lit = value match {
      case s: String => s"'${s.replace("'", "''")}'"
      case other => other.toString
    }
    val probe = spark.range(1)
      .select(explode(expr(bloomPosSql(lit, bits, k))).as("p"))
      .select(col("p.w"), col("p.m"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val keep = probe
      .map { case (w, m) =>
        (expr(s"try_element_at(bloom, ${w + 1})")
          .bitwiseAND(lit2(m)) === lit2(m)) }
      .reduce(_ && _) || col("bloom").isNull
    spark.read.parquet(bloomDir).where(keep)
      .select("__file__").collect().map(_.getString(0)).toSeq
  }

  private def lit2(v: Long) = org.apache.spark.sql.functions.lit(v)

  /** Point-lookup read: only Bloom-surviving files, then the row-level
    * equality filter. */
  def prunedReadEq(
      spark: SparkSession, dataDir: String, bloomDir: String,
      keyCol: String, value: Any, bits: Int, k: Int,
  ): DataFrame = {
    val files = bloomPruneFiles(spark, bloomDir, value, bits, k)
    val base =
      if (files.isEmpty) spark.read.parquet(dataDir).limit(0)
      else spark.read.parquet(files: _*)
    base.where(col(keyCol) === value)
  }

  /** Streaming INGEST-AND-INDEX: per micro-batch, append the batch's
    * rows as parquet into `dataDir`, then index exactly the files that
    * appeared ([[append]] + optional [[bloomAppend]] — both diff the
    * manifest against the dir listing, so each batch indexes only its
    * own new files). The manifest is consistent at every batch boundary:
    * a point lookup or range serve planned right after a commit sees the
    * batch's rows. This closes the loop for a landing-zone pipeline —
    * files, stats, and blooms all maintained by the same stream with no
    * rebuild anywhere. */
  def streamIngest(
      stream: DataFrame,
      dataDir: String,
      cols: Seq[String],
      manifestDir: String,
      checkpointDir: String,
      bloomKeyCol: String = null,
      bloomBits: Int = 8192,
      bloomK: Int = 2,
  ): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          batch.toDF().write.mode("append").parquet(dataDir)
          if (!new org.apache.hadoop.fs.Path(manifestDir)
              .getFileSystem(spark.sparkContext.hadoopConfiguration)
              .exists(new org.apache.hadoop.fs.Path(manifestDir)))
            save(spark, dataDir, cols, manifestDir)
          else append(spark, dataDir, cols, manifestDir)
          if (bloomKeyCol != null) {
            val bdir = s"$manifestDir-bloom"
            if (!new org.apache.hadoop.fs.Path(bdir)
                .getFileSystem(spark.sparkContext.hadoopConfiguration)
                .exists(new org.apache.hadoop.fs.Path(bdir)))
              bloomSave(spark, dataDir, bloomKeyCol, bloomBits, bloomK, bdir)
            else bloomAppend(spark, dataDir, bloomKeyCol, bloomBits, bloomK,
              bdir)
          }
          () // append/bloomAppend return counts; foreachBatch wants Unit
        }
      }
      .start()

  /** Read only the manifest-surviving files and re-apply the row-level
    * predicate (file stats prune files; the scan still filters rows).
    * Degenerate case: zero surviving files → empty frame with the
    * full-read schema. */
  def prunedRead(
      spark: SparkSession, dataDir: String, manifestDir: String,
      ranges: Seq[(String, Any, Any)],
  ): DataFrame = {
    val files = pruneFiles(spark, manifestDir, ranges)
    val base =
      if (files.isEmpty) spark.read.parquet(dataDir).limit(0)
      else spark.read.parquet(files: _*)
    ranges.foldLeft(base) { case (df, (c, lo, hi)) =>
      df.where(col(c).between(lit(lo), lit(hi)))
    }
  }
}
