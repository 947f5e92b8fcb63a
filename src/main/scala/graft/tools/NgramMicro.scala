package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark isolating word n-gram generation: the codegen'd
  * `word_ngrams` native vs the CodegenFallback HOF formulation
  * (`transform(sequence(...), i -> concat_ws(' ', slice(...)))`), run
  * back-to-back in one JVM over identical data so host churn cancels.
  * Checksum = total gram characters, identical by the value-identity
  * spec. Not part of the driver contract; run with
  * `sbt 'runMain graft.tools.NgramMicro [rows] [toks] [n]'`.
  */
object NgramMicro {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(200000)
    val toks = args.lift(1).map(_.toInt).getOrElse(24)
    val n = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .appName("ngram-micro").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.install(spark)

    val df = spark.range(rows.toLong)
      .withColumn("__toks__",
        expr(s"transform(sequence(1, $toks), i -> concat('w', (id * i) % 97))"))
      .localCheckpoint()

    def time(label: String, gramsSql: String): Long = {
      val t0 = System.nanoTime()
      val s = df
        .select(expr(s"aggregate($gramsSql, 0L, (a, g) -> a + length(g))").as("c"))
        .agg(sum(col("c"))).collect()(0).getLong(0)
      val ms = (System.nanoTime() - t0) / 1000000
      println(f"$label%-8s $ms%6d ms  (checksum $s)")
      s
    }
    val native = s"word_ngrams(__toks__, $n)"
    val hof =
      s"""CASE WHEN size(__toks__) >= $n
          THEN transform(sequence(1, size(__toks__) - ${n - 1}),
                         i -> concat_ws(' ', slice(__toks__, i, $n)))
          ELSE CAST(array() AS array<string>) END"""
    time("warm-nat", native); time("warm-hof", hof)
    val pairs = (1 to 3).map(_ => (time("native", native), time("hof", hof)))
    require(pairs.forall(p => p._1 == p._2), "checksum mismatch native vs HOF")
    spark.stop()
  }
}
