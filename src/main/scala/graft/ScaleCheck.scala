package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale validation (SCALE.md's measured column): replicate the
  * sf0.1 tables `factor`× with id offsets and content perturbation, then
  * time the headline query families at both scales and report the
  * wall/cpu growth ratio per family. The replication is designed to hold
  * WORKLOAD DENSITY constant while size grows — the property a real 10×
  * corpus has and naive row duplication destroys:
  *
  *   - documents: each replica's text goes through a replica-specific
  *     letter rotation (a Caesar alphabet per replica), so replicas share
  *     NO shingles with the original — duplicate/near-duplicate density
  *     per document stays exactly sf0.1's, instead of every doc gaining
  *     `factor` artificial near-twins (which would grow within-bucket
  *     pair work quadratically and measure a fiction).
  *   - embeddings: a small deterministic per-(replica, dimension) jitter
  *     breaks exact cross-replica duplication while preserving the
  *     near-orthogonal geometry the ANN cell sizing assumes.
  *   - events / lineitem: replicas get fresh group ids (user_id /
  *     l_orderkey offsets), so groups multiply while per-group event
  *     counts — the state/frontier bound — stay constant.
  *
  * Usage: runMain graft.ScaleCheck <srcSfDir> <workDir> [factor] [q1,q2,…]
  * Writes <workDir>/scaled parquet, prints a markdown table of
  * min-of-3-pass walls at both scales and their ratio. The optional 4th
  * arg times only the named queries (new families without re-timing the
  * whole set).
  */
object ScaleCheck {
  private val osBean = java.lang.management.ManagementFactory
    .getOperatingSystemMXBean
    .asInstanceOf[com.sun.management.OperatingSystemMXBean]

  // headline families: scan+agg, funnel/chain, sessionize, retention,
  // exact/minhash/ngram dedup, closure, semantic dedup, IVF-PQ serving,
  // decontamination, BM25
  private val Queries = Seq(
    "q1_agg", "q_match_steps", "q_sessionize", "q_retention",
    "q_dedup_exact", "q_dedup_minhash", "q_dedup_ngram", "q_dedup_clusters",
    "q_semdedup", "q_ann_ivfpq", "q_contamination", "q_bm25_search",
    "q_image_neardup_corpus", "q_video_neardup_corpus")

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val workDir = args.lift(1).getOrElse("/tmp/graft_scale")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val scaledDir = s"$workDir/sf_x$factor"
    generate(spark, srcDir, scaledDir, factor)

    def time(dir: String, name: String): (Double, Double) = {
      // min of 3: steady state, discounting first-run codegen and host
      // stalls (both only ever inflate)
      val runs = (1 to 3).map { _ =>
        val c0 = osBean.getProcessCpuTime
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        llm.CacheScope.global.release()
        ((System.nanoTime() - t0) / 1e9, (osBean.getProcessCpuTime - c0) / 1e9)
      }
      runs.minBy(_._1)
    }

    val selected = args.lift(3)
      .map(_.split(',').toSeq.filter(_.nonEmpty))
      .getOrElse(Queries)
    println(f"| query | sf0.1 wall (s) | x$factor wall (s) | ratio | x$factor cpu (s) |")
    println("|---|---|---|---|---|")
    selected.foreach { q =>
      val (w1, _) = time(srcDir, q)
      val (wN, cN) = time(scaledDir, q)
      println(f"| $q | $w1%.2f | $wN%.2f | ${wN / w1}%.2fx | $cN%.1f |")
    }
    spark.stop()
  }

  /** Write the `factor`×-scaled copies of the four scale-bearing tables
    * (and passthrough copies of the dimension tables, so every query can
    * run against the scaled dir). Idempotent: skips when present. */
  def generate(spark: SparkSession, srcDir: String, outDir: String, factor: Int): Unit = {
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(s"$outDir/_done"))) return
    val reps = spark.range(0, factor).select(col("id").cast("int").as("__rep__"))
    def src(t: String) = sources.ParquetIO.read(spark, s"$srcDir/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.coalesce(8).write.mode("overwrite").parquet(s"$outDir/$t.parquet")

    // Per-replica substitution cipher over both cases; digits/space/punct
    // fixed. Replicas 1..25 are Caesar rotations; 26..51 rotate the
    // REVERSED alphabet, so no replica's transform is the identity (a bare
    // r % 26 made replica 26 an exact duplicate of the original, silently
    // recreating the quadratic duplicate-density inflation this design
    // exists to prevent). All 52 transforms are pairwise distinct; beyond
    // that the cycle would repeat, so factor is capped.
    require(factor <= 52,
      s"factor $factor > 52 would repeat substitution transforms and " +
        "inflate duplicate density quadratically")
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    def rotExpr(c: String): org.apache.spark.sql.Column = {
      // build CASE over __rep__: translate(text, alphabet, perm(alphabet, rep))
      (1 until factor).foldLeft(when(col("__rep__") === 0, col(c))) { (acc, r) =>
        val k = r % 26
        val (bl, bu) =
          if (r < 26) (lower, upper) else (lower.reverse, upper.reverse)
        val rl = bl.drop(k) + bl.take(k)
        val ru = bu.drop(k) + bu.take(k)
        acc.when(col("__rep__") === r, translate(col(c), lower + upper, rl + ru))
      }.otherwise(col(c))
    }

    val docs = src("documents")
    val nDocs = docs.agg(max("doc_id")).head.getLong(0) + 1
    write(docs.crossJoin(reps)
      .select(
        (col("doc_id") + col("__rep__").cast("long") * nDocs).as("doc_id"),
        rotExpr("text").as("text"),
        col("lang"), col("source"), col("n_chars")), "documents")

    val emb = src("embeddings")
    val nVec = emb.agg(max("vec_id")).head.getLong(0) + 1
    write(emb.crossJoin(reps)
      .select(
        (col("vec_id") + col("__rep__").cast("long") * nVec).as("vec_id"),
        when(col("__rep__") === 0, col("embedding")).otherwise(
          expr("""transform(embedding, (x, i) ->
                  CAST(x + ((__rep__ * 37 + i * 13) % 11 - 5) * 0.002 AS float))"""))
          .as("embedding"),
        col("label")), "embeddings")

    val ev = src("events")
    val nUser = ev.agg(max("user_id")).head.getLong(0) + 1
    val nEvent = ev.agg(max("event_id")).head.getLong(0) + 1
    write(ev.crossJoin(reps)
      .select(
        (col("event_id") + col("__rep__").cast("long") * nEvent).as("event_id"),
        col("ts"),
        (col("user_id") + col("__rep__").cast("long") * nUser).as("user_id"),
        col("event_type"), col("value"), col("props")), "events")

    val li = src("lineitem")
    val nOrd = li.agg(max("l_orderkey")).head.getLong(0) + 1
    write(li.crossJoin(reps)
      .select(
        (col("l_orderkey") + col("__rep__").cast("long") * nOrd).as("l_orderkey") +:
          li.columns.filter(_ != "l_orderkey").map(col).toSeq: _*), "lineitem")

    Seq("region", "nation", "customer", "supplier", "part", "orders")
      .foreach(t => write(src(t), t))
    java.nio.file.Files.createFile(java.nio.file.Paths.get(s"$outDir/_done"))
  }
}
