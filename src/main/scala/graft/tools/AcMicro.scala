package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark isolating the keyword scan: native `ac_count` (one
  * Aho–Corasick pass for the whole dictionary) vs the built-in
  * alternative (one codegen'd `regexp_count` pass PER phrase, summed),
  * back-to-back in one JVM over identical data so host churn cancels.
  * Checksums must agree — phrases are regex-safe literals. Run with
  * `sbt 'runMain graft.tools.AcMicro [rows] [phrases]'`.
  */
object AcMicro {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(100000)
    val nPhrases = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .appName("ac-micro").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.install(spark)

    // word-salad text rows from a small vocabulary; phrases are vocab
    // words and bigrams so hits are plentiful
    val vocab = Seq("table", "value", "part", "spark", "row", "scan",
      "fast", "slow", "hash", "merge", "batch", "line", "sort", "window")
    // bigram/trigram phrases use DISTINCT adjacent words: regexp_count
    // is non-overlapping while AC counts all positions, and only a
    // self-overlapping phrase (e.g. "x x" in "x x x") can differ
    // a phrase may not have a word-level border (first word == last word,
    // e.g. "table b table"): in word-aligned text such a phrase
    // self-overlaps, which AC counts and regexp_count's non-overlapping
    // scan does not — a semantic difference, not a bug in either
    val pool = vocab ++
      (for (a <- vocab; b <- vocab if a != b) yield s"$a $b") ++
      (for (a <- vocab; b <- vocab
            if a != b && a != vocab.head && b != vocab.head)
        yield s"$a $b ${vocab.head}")
    val phrases = pool.take(nPhrases)
    val docs = spark.range(rows.toLong)
      .withColumn("text", expr(
        s"""array_join(transform(sequence(1, 40), i ->
              element_at(array(${vocab.map(w => s"'$w'").mkString(",")}),
                CAST(1 + pmod(id * 31 + i * 7, ${vocab.size}) AS int))), ' ')"""))
      .localCheckpoint()

    val arr = phrases.map(p => s"'$p'").mkString("array(", ", ", ")")
    val native = expr(s"ac_count(text, $arr)")
    val regex = phrases.map(p => expr(s"regexp_count(text, '$p')"))
      .reduce(_ + _).cast("bigint")

    def time(label: String, c: org.apache.spark.sql.Column): Long = {
      val t0 = System.nanoTime()
      val s = docs.select(c.as("n")).agg(sum(col("n"))).collect()(0).getLong(0)
      val ms = (System.nanoTime() - t0) / 1000000
      println(f"$label%-10s $ms%6d ms  (checksum $s, ${phrases.size} phrases)")
      s
    }
    time("warm-nat", native); time("warm-rx", regex)
    val pairs = (1 to 3).map(_ => (time("native", native), time("regex", regex)))
    require(pairs.forall(p => p._1 == p._2), "checksum mismatch native vs regex")
    spark.stop()
  }
}
