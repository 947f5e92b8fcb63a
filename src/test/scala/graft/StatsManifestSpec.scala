package graft

import org.apache.spark.sql.functions._

import graft.sources.{Layout, StatsManifest}

/** File-stats manifest: pruning is selective on a z-ordered layout,
  * sound on NULL stats, value-preserving, and append-incremental. */
class StatsManifestSpec extends GraftSuite {

  test("manifest prune: selective on z-ordered files, value parity") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("zman").toString
    val mdir = java.nio.file.Files.createTempDirectory("zmanifest").toString
    val pts = (0 until 4000).map { i =>
      val r = new scala.util.Random(i); (i.toLong, r.nextInt(1000).toLong,
        r.nextInt(1000).toLong)
    }.toDF("id", "x", "y")
    Layout.writeZOrdered(pts, "x", "y", dir, 16)
    StatsManifest.save(s, dir, Seq("x", "y"), mdir)

    val total = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    val ranges = Seq(("x", 100L: Any, 220L: Any), ("y", 300L: Any, 420L: Any))
    val kept = StatsManifest.pruneFiles(s, mdir, ranges)
    assert(kept.nonEmpty && kept.size < total,
      s"expected selective pruning, kept ${kept.size}/$total")

    val got = StatsManifest.prunedRead(s, dir, mdir, ranges)
      .agg(count(lit(1)), sum("id")).collect().head
    val want = s.read.parquet(dir)
      .where(col("x").between(100L, 220L) && col("y").between(300L, 420L))
      .agg(count(lit(1)), sum("id")).collect().head
    assert(got === want)
  }

  test("append indexes only new files; NULL stats are never pruned") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("aman").toString
    val mdir = java.nio.file.Files.createTempDirectory("amanifest").toString
    Seq((1L, 10L), (2L, 20L)).toDF("id", "x")
      .coalesce(1).write.mode("append").parquet(dir)
    StatsManifest.save(s, dir, Seq("x"), mdir)
    assert(StatsManifest.append(s, dir, Seq("x"), mdir) === 0)

    // a new file plus an all-NULL-x file
    Seq((3L, 500L)).toDF("id", "x").coalesce(1)
      .write.mode("append").parquet(dir)
    Seq((4L, Option.empty[Long])).toDF("id", "x").coalesce(1)
      .write.mode("append").parquet(dir)
    assert(StatsManifest.append(s, dir, Seq("x"), mdir) === 2)
    assert(s.read.parquet(mdir).count() ===
      new java.io.File(dir).listFiles()
        .count(_.getName.endsWith(".parquet")).toLong)

    // range far from the NULL file's (absent) stats: the NULL-stats file
    // must survive pruning (sound: unknown = must read)
    val kept = StatsManifest.pruneFiles(s, mdir, Seq(("x", 400L, 600L)))
    assert(kept.size === 2) // the 500 file + the all-null file
    val ids = StatsManifest.prunedRead(s, dir, mdir, Seq(("x", 400L, 600L)))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(3L))
  }
}
