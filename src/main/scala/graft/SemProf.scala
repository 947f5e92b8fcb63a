package graft
import org.apache.spark.sql.{SparkSession, functions => F}

/** Throwaway profiling harness for the semantic-dedup path (kmeansFit →
  * semDedup → closure). Data dir = first arg, else SPARK_GRAFT_SF_DIR,
  * else the sf0.1 testdata. Two passes so pass 2 shows warm-cache cost. */
object SemProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val spark = SessionTuning(SparkSession.builder()).master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](n: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(f"[prof] $n%-26s ${(System.nanoTime()-t0)/1e9}%8.3f s"); r }
    val df = spark.read.parquet(s"$dir/embeddings.parquet")
    val k = math.floor(math.sqrt(df.count().toDouble)).toLong
    for (pass <- 1 to 2) {
      println(s"--- pass $pass (k=$k)")
      val cents = t("kmeansFit")(graft.llm.Embeddings.kmeansFit(df, "vec_id", "embedding", initPred = F.col("vec_id") < k, iters = 2))
      if (pass == 1) { // cell-size distribution: the O(sqrt n) scale argument, measured
        val sizes = graft.llm.Embeddings.withCell(
            df.select(F.col("vec_id").as("__vid__"), F.col("embedding").as("__v__"))
              .withColumn("__n__", F.sqrt(F.expr("float_vec_dot(__v__, __v__)"))), "__v__", cents)
          .groupBy(F.col("__cell__")).agg(F.count(F.lit(1)).as("n"))
          .agg(F.count(F.lit(1)), F.min("n"), F.expr("percentile(n, 0.5)"), F.expr("percentile(n, 0.99)"), F.max("n")).collect()(0)
        println(s"[prof] cells=${sizes.get(0)} min=${sizes.get(1)} p50=${sizes.get(2)} p99=${sizes.get(3)} max=${sizes.get(4)} (n=${df.count()}, k=$k)")
      }
      val kept = t("semDedup-build")(graft.llm.Embeddings.semDedup(df, "vec_id", "embedding", cents, threshold = 0.45, maxCellSize = 256))
      t("semDedup-run")(kept.groupBy(F.col("label")).agg(F.count(F.lit(1)).as("n_kept")).write.format("noop").mode("overwrite").save())
      llm.CacheScope.global.release()
    }
    spark.stop()
  }
}
