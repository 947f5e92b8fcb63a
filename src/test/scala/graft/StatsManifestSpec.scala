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

  test("bloom index: sound on every present key, selective, appendable") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bloomd").toString
    val bdir = java.nio.file.Files.createTempDirectory("bloomi").toString
    // 16 files of 250 ids each — a point lookup should touch ~1 file
    (0 until 16).foreach { f =>
      (f * 250 until (f + 1) * 250).map(i => (i.toLong, s"v$i"))
        .toDF("id", "payload").coalesce(1).write.mode("append").parquet(dir)
    }
    val (bits, k) = (4096, 2)
    StatsManifest.bloomSave(s, dir, "id", bits, k, bdir)
    val total = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))

    // soundness: a sample of present keys is ALWAYS found
    for (key <- Seq(0L, 1L, 249L, 250L, 1999L, 3999L)) {
      val rows = StatsManifest.prunedReadEq(s, dir, bdir, "id", key, bits, k)
        .collect()
      assert(rows.length === 1 && rows.head.getLong(0) === key)
    }
    // selectivity: far fewer than all files survive a probe
    val kept = StatsManifest.bloomPruneFiles(s, bdir, 1234L, bits, k)
    assert(kept.size < total / 2, s"kept ${kept.size}/$total")
    // absent key: no rows (possibly zero files)
    assert(StatsManifest.prunedReadEq(s, dir, bdir, "id", 999999L, bits, k)
      .count() === 0L)

    // append: only the new file is indexed; its keys become findable
    (9000 until 9100).map(i => (i.toLong, s"v$i")).toDF("id", "payload")
      .coalesce(1).write.mode("append").parquet(dir)
    assert(StatsManifest.bloomAppend(s, dir, "id", bits, k, bdir) === 1)
    assert(StatsManifest.prunedReadEq(s, dir, bdir, "id", 9042L, bits, k)
      .count() === 1L)
  }

  test("streaming ingest keeps files, stats, and blooms consistent per batch") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sing").toString + "/data"
    val mdir = java.nio.file.Files.createTempDirectory("singm").toString + "/man"
    val ckpt = java.nio.file.Files.createTempDirectory("singc").toString
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)](s)
    val q = StatsManifest.streamIngest(ms.toDF.toDF("id", "x"), dir,
      Seq("x"), mdir, ckpt, bloomKeyCol = "id", bloomBits = 4096, bloomK = 2)
    try {
      var total = 0L
      for (b <- Seq(0 until 300, 300 until 600, 600 until 900)) {
        ms.addData(b.map(i => (i.toLong, (i * 7 % 1000).toLong)): _*)
        q.processAllAvailable()
        total += b.size
        // manifest covers every file on disk, counts match ingested rows
        val man = s.read.parquet(mdir)
        val onDisk = new java.io.File(dir).listFiles()
          .count(_.getName.endsWith(".parquet"))
        assert(man.count() === onDisk.toLong)
        assert(man.agg(sum("n_rows")).collect().head.getLong(0) === total)
        // a point lookup through the bloom finds a row from THIS batch
        val probe = b.head.toLong
        val hit = StatsManifest.prunedReadEq(s, dir, s"$mdir-bloom", "id",
          probe, 4096, 2).collect()
        assert(hit.length === 1 && hit.head.getLong(0) === probe)
      }
    } finally q.stop()
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
