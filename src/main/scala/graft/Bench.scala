package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Each query is fully materialized through a `noop`
  * write sink (a `.count()` would let Catalyst prune every column of
  * projection-only queries and under-measure scan+compute), after one
  * untimed warm-up query to absorb JIT/codegen compilation cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: the driver parses the single JSON line out of the
    // combined sbt capture, and late-relayed WARN lines (block-manager
    // re-adds etc.) can interleave after it — silence them at the source
    spark.sparkContext.setLogLevel("ERROR")

    def exec(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      finally llm.CacheScope.global.release() // each query re-caches its own
                                              // frames inside its timed run
      (System.nanoTime() - t0) / 1e9
    }

    // warm-up, untimed: one relational aggregate + one llm text/hash
    // pipeline, so JIT/codegen compilation of both expression families is
    // absorbed before the timed pass
    exec("q1_agg")
    exec("q_dedup_minhash")

    // With args: time only the named queries, three passes each (regression
    // isolation — pass 1 includes per-query codegen, passes 2-3 are steady
    // state). Without args: the driver's full single-pass sweep.
    if (args.nonEmpty) {
      for (pass <- 1 to 3; n <- args)
        println(f"[bench] pass $pass $n%-28s ${exec(n)}%8.3f s")
      spark.stop()
      return
    }

    val results = SparkEntry.queries.keys.toSeq.sorted.map(n => n -> exec(n))
    val headline = Seq(
      "q1_agg", "q_join_chain", "q_match_steps", "q_funnel", "q_retention",
      "q_sessionize", "q_window_calc", "q_dedup_exact", "q_dedup_minhash",
      "q_dedup_clusters", "q_ann_lsh", "q_ann_ivf", "q_bm25_search",
      "q_pipeline_clean", "q_text_quality", "q_pack_sequences")
    val byName = results.toMap
    val qs = headline.filter(byName.contains)
      .map(k => f""""$k":${byName(k)}%.3f""").mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val compact =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"queries":$qs,"sf":"$sfDir"}"""
    // Full per-query detail goes to a FILE, not the console: the driver
    // captures only the last ~2k chars of combined output, and sbt's
    // stderr relay lags stdout, so detail lines printed to stderr BEFORE
    // the JSON line landed AFTER it in the capture and pushed the JSON's
    // start out of the window (rounds 1-3 and 5 all came back
    // `parsed: null`). The file carries BOTH the compact headline line
    // (longitudinal grading) and the full per-query map.
    val detail = results
      .map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_DETAIL.json"),
      s"""{"compact":$compact,"detail":$detail}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // give sbt's async stderr relay (any residual ERROR lines) time to
    // drain so nothing interleaves after the JSON line in the combined
    // capture; raisable without recompiling via SPARK_GRAFT_DRAIN_MS
    System.err.flush()
    Thread.sleep(sys.env.getOrElse("SPARK_GRAFT_DRAIN_MS", "3000").toLong)
    println(compact)
    System.out.flush()
    spark.stop()
  }
}
