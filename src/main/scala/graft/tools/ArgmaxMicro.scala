package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark isolating the nearest-centroid assignment argmax:
  * native `vec_argmax_cell` vs the CodegenFallback HOF formulation, run
  * back-to-back in one JVM over identical data so host churn cancels.
  * Not part of the driver contract; run with
  * `sbt 'runMain graft.tools.ArgmaxMicro [rows] [dim] [k]'`.
  */
object ArgmaxMicro {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(200000)
    val dim = args.lift(1).map(_.toInt).getOrElse(64)
    val k = args.lift(2).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .appName("argmax-micro").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.install(spark)

    val emb = spark.range(rows.toLong)
      .withColumn("embedding",
        expr(s"transform(sequence(1, $dim), i -> cast(sin(id * i) AS float))"))
      .withColumn("__n__", sqrt(graft.llm.Embeddings.dot("embedding", "embedding")))
    val cents = spark.range(k.toLong)
      .select(col("id").as("__cid__"),
        expr(s"transform(sequence(1, $dim), i -> cast(cos(id * i) AS float))").as("__cv__"))
      .withColumn("__cn__", sqrt(graft.llm.Embeddings.dot("__cv__", "__cv__")))
      .agg(collect_list(struct(col("__cid__"), col("__cv__"), col("__cn__")))
        .as("__cents__"))
    val joined = emb.crossJoin(broadcast(cents)).localCheckpoint()

    def time(label: String, c: org.apache.spark.sql.Column): Long = {
      val t0 = System.nanoTime()
      val s = joined.select(c.as("cell")).agg(sum(col("cell"))).collect()(0).getLong(0)
      val ms = (System.nanoTime() - t0) / 1000000
      println(f"$label%-8s $ms%6d ms  (checksum $s)")
      s
    }
    // warmup both, then 3 timed alternating passes
    val native = expr("vec_argmax_cell(embedding, __n__, __cents__)")
    val hof = graft.llm.Embeddings.argmaxCellHof("embedding", "__n__", "__cents__")
    time("warm-nat", native); time("warm-hof", hof)
    val pairs = (1 to 3).map(_ => (time("native", native), time("hof", hof)))
    require(pairs.forall(p => p._1 == p._2), "checksum mismatch native vs HOF")
    spark.stop()
  }
}
