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
    val spark = SparkSession.builder().master("local[32]")
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
      val kept = t("semDedup-build")(graft.llm.Embeddings.semDedup(df, "vec_id", "embedding", cents, threshold = 0.45, maxCellSize = 256))
      t("semDedup-run")(kept.groupBy(F.col("label")).agg(F.count(F.lit(1)).as("n_kept")).write.format("noop").mode("overwrite").save())
      llm.CacheScope.global.release()
    }
    spark.stop()
  }
}
