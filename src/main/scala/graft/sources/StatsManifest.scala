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
