package graft

import org.apache.spark.sql.functions._

import graft.sources.Layout

/** Z-order layout: shared-formula identity against a literal shift/or
  * Morton reference, bucket edge semantics, and the actual SKIPPING claim
  * — file-level min/max stats on a z-ordered layout prune a 2-D box on
  * both dimensions where a lexicographic sort prunes only the first. */
class ZOrderSpec extends GraftSuite {

  test("spread16/zorder2 match the literal shift/or Morton reference") {
    // the production formula uses pre-masked `+ * &` decomposition (the
    // operators both Spark SQL and DuckDB evaluate identically); the
    // reference here is the textbook shift/or part1by1 — any carry
    // corruption in the decomposition breaks the equality
    def spreadRef(v: Long): Long = {
      var x = v & 0xFFFFL
      x = (x | x << 8) & 0x00FF00FFL
      x = (x | x << 4) & 0x0F0F0F0FL
      x = (x | x << 2) & 0x33333333L
      x = (x | x << 1) & 0x55555555L
      x
    }
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val vals = Seq(0L, 1L, 2L, 255L, 32768L, 65535L, 70000L) ++
      Seq.fill(200)(rnd.nextLong().abs % (1L << 20))
    vals.toDF("v")
      .selectExpr("v", s"${Layout.spread16Sql("v")} AS sp")
      .collect()
      .foreach(r => assert(r.getLong(1) === spreadRef(r.getLong(0))))
    def zRef(a: Long, b: Long): Long = spreadRef(a) | (spreadRef(b) << 1)
    val pairs = for {
      a <- Seq(0L, 1L, 255L, 65535L, 12345L)
      b <- Seq(0L, 1L, 255L, 65535L, 54321L)
    } yield (a, b)
    pairs.toDF("a", "b")
      .selectExpr("a", "b", s"${Layout.zorder2Sql("a", "b")} AS z")
      .collect()
      .foreach(r => assert(r.getLong(2) === zRef(r.getLong(0), r.getLong(1))))
  }

  test("spread10x3/zorder3 match the literal shift/or Morton reference") {
    def spreadRef3(v: Long): Long = {
      var x = v & 0x3FFL
      x = (x | x << 16) & 0x30000FFL
      x = (x | x << 8) & 0x300F00FL
      x = (x | x << 4) & 0x30C30C3L
      x = (x | x << 2) & 0x9249249L
      x
    }
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val vals = Seq(0L, 1L, 32L, 512L, 1023L, 4096L) ++
      Seq.fill(200)(rnd.nextLong().abs % (1L << 20))
    vals.toDF("v")
      .selectExpr("v", s"${Layout.spread10x3Sql("v")} AS sp")
      .collect()
      .foreach(r => assert(r.getLong(1) === spreadRef3(r.getLong(0))))
    def zRef(a: Long, b: Long, c: Long): Long =
      spreadRef3(a) | (spreadRef3(b) << 1) | (spreadRef3(c) << 2)
    val triples = for {
      a <- Seq(0L, 1L, 1023L, 513L); b <- Seq(0L, 700L, 1023L)
      c <- Seq(0L, 341L, 1023L)
    } yield (a, b, c)
    triples.toDF("a", "b", "c")
      .selectExpr("a", "b", "c", s"${Layout.zorder3Sql("a", "b", "c")} AS z")
      .collect()
      .foreach(r => assert(r.getLong(3) ===
        zRef(r.getLong(0), r.getLong(1), r.getLong(2))))
    // writeZOrdered3 round-trip: layout never changes values
    val pts = (0L until 512L).map(i => (i, i % 8, (i / 8) % 8, i / 64))
      .toDF("id", "x", "y", "z")
    val dir = java.nio.file.Files.createTempDirectory("z3spec").toString + "/z3"
    Layout.writeZOrdered3(pts, "x", "y", "z", dir, 4)
    assert(s.read.parquet(dir).count() === 512L)
    assert(s.read.parquet(dir).agg(sum("id")).collect().head.getLong(0) ===
      (0L until 512L).sum)
  }

  test("bucket16 clamps, degenerates, and scales per the shared semantics") {
    val s = spark
    import s.implicits._
    val out = Seq(
      (0.0, 0.0, 10.0),  // min → 0
      (5.0, 0.0, 10.0),  // midpoint → floor(0.5 * 65535)
      (10.0, 0.0, 10.0), // max → 65535
      (11.0, 0.0, 10.0), // above range → clamp 65535
      (-1.0, 0.0, 10.0), // below range → clamp 0
      (3.0, 4.0, 4.0),   // degenerate mx <= mn → 0
    ).toDF("x", "mn", "mx")
      .selectExpr(s"${Layout.bucket16Sql("x", "mn", "mx")} AS b")
      .collect().map(_.getLong(0)).toSeq
    assert(out === Seq(0L, 32767L, 65535L, 65535L, 0L, 0L))
  }

  test("z-ordered layout prunes a 2-D box on both dims where lex sort cannot") {
    val s = spark
    import s.implicits._
    // 64×64 grid over [0, 1008]²; 16 files of ~256 rows
    val pts = (for (i <- 0 until 64; j <- 0 until 64)
      yield (i.toLong * 64 + j, i * 16L, j * 16L)).toDF("id", "x", "y")
    val root = java.nio.file.Files.createTempDirectory("zspec").toString
    val zdir = s"$root/z"
    val ldir = s"$root/lex"
    Layout.writeZOrdered(pts, "x", "y", zdir, 16)
    pts.repartitionByRange(16, col("x"), col("y"))
      .sortWithinPartitions("x", "y")
      .write.mode("overwrite").parquet(ldir)

    // layout must never change VALUES: exact same id set back
    val back = s.read.parquet(zdir)
    assert(back.count() === 4096L)
    assert(back.agg(sum("id")).collect().head.getLong(0) ===
      (0L until 4096L).sum)

    // simulate parquet footer pruning: a reader skips files whose
    // min/max box does not intersect the predicate box [0,255]²
    def touched(dir: String): (Int, Int) = {
      val spans = s.read.parquet(dir)
        .withColumn("f", input_file_name())
        .groupBy("f")
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"))
        .collect()
      val hit = spans.count { r =>
        r.getLong(1) <= 255L && r.getLong(2) >= 0L &&
          r.getLong(3) <= 255L && r.getLong(4) >= 0L
      }
      (hit, spans.length)
    }
    val (zHit, zTotal) = touched(zdir)
    val (lHit, lTotal) = touched(ldir)
    assert(zTotal === 16 && lTotal === 16)
    // the box is one z-quadrant-of-a-quadrant (1/16 of the space): a
    // contiguous z range ⇒ 1-3 files even with sampled range boundaries;
    // lex files span narrow x but the FULL y range ⇒ every x-overlapping
    // file is touched
    assert(zHit <= 3, s"z-order touched $zHit of $zTotal files")
    assert(zHit < lHit, s"z-order ($zHit) must beat lex sort ($lHit)")
  }
}
