package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.sources.MetricCache

/** Persisted metric rollup cache: save+append partials merge to exactly
  * the direct fact-table aggregate, and serves prune/push at the scan. */
class MetricCacheSpec extends GraftSuite {

  private def facts = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(41)
    val types = Array("view", "click", "buy")
    (1 to 600).map { i =>
      val day = 1 + rnd.nextInt(20) // Jan 1..20
      (i.toLong,
        Timestamp.valueOf(f"2024-01-$day%02d ${rnd.nextInt(24)}%02d:03:00"),
        (rnd.nextInt(7)).toLong,
        types(rnd.nextInt(3)),
        math.floor(rnd.nextDouble() * 10000) / 100.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("append ≡ rebuild: merged partials equal the direct aggregate") {
    val dir = java.nio.file.Files.createTempDirectory("mcache").toString
    val all = facts
    val cut = lit("2024-01-14").cast("timestamp")
    val dims = Seq("user_id", "event_type")
    MetricCache.save(all.where(col("ts") < cut), dims, "ts",
      MetricCache.standardPartials("value"), dir)
    MetricCache.append(all.where(col("ts") >= cut), dims, "ts",
      MetricCache.standardPartials("value"), dir)

    // duplicate (dims, day) keys exist only if both slices hit a key —
    // the cut splits by ts, so per-day keys land in exactly one slice;
    // force the duplicate-key path too with a second overlapping append
    MetricCache.append(all.where(col("ts") < cut && col("user_id") === 3L),
      dims, "ts", MetricCache.standardPartials("value"), dir)
    val direct = all
      .union(all.where(col("user_id") === 3L && col("ts") < cut))
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("value_cents"),
        min(col("value")).as("value_min"),
        max(col("value")).as("value_max"))

    val served = MetricCache.read(spark, dir)
      .groupBy(col("event_type"), col(MetricCache.DayCol).as("day"))
      .agg(MetricCache.standardMerge.head, MetricCache.standardMerge.tail: _*)
    assert(served.collect().map(_.toSeq).toSet ===
      direct.collect().map(_.toSeq).toSet)
  }

  test("streaming ingest ≡ batch rebuild at every micro-batch boundary") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mcache_s").toString
    val ckpt = java.nio.file.Files.createTempDirectory("mcache_ck").toString
    val all = facts.collect().map(r => (r.getLong(0), r.getTimestamp(1),
      r.getLong(2), r.getString(3), r.getDouble(4))).toSeq
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)](s)
    val dims = Seq("user_id", "event_type")
    val q = MetricCache.streamAppend(
      ms.toDF.toDF("event_id", "ts", "user_id", "event_type", "value"),
      dims, "ts", MetricCache.standardPartials("value"), dir, ckpt)
    try {
      val (b1, rest) = all.splitAt(200)
      val (b2, b3) = rest.splitAt(200)
      var seen = 0
      for (b <- Seq(b1, b2, b3)) {
        ms.addData(b: _*)
        q.processAllAvailable()
        seen += b.size
        val served = MetricCache.read(s, dir)
          .groupBy(col("event_type"), col(MetricCache.DayCol).as("day"))
          .agg(MetricCache.standardMerge.head,
            MetricCache.standardMerge.tail: _*)
        // direct aggregate over exactly the facts ingested so far
        val want = all.take(seen)
          .toDF("event_id", "ts", "user_id", "event_type", "value")
          .groupBy(col("event_type"),
            date_trunc("day", col("ts")).cast("date").as("day"))
          .agg(count(lit(1)).as("n_events"),
            sum(floor(col("value") * 100 + 0.5).cast("long")).as("value_cents"),
            min(col("value")).as("value_min"),
            max(col("value")).as("value_max"))
        assert(served.collect().map(_.toSeq).toSet ===
          want.collect().map(_.toSeq).toSet, s"diverged after $seen facts")
      }
    } finally q.stop()
  }

  test("dense daily serve: spine completion, zero-fill, LOCF semantics") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mcdense").toString
    // one dim, observations on Jan 3 (max 5.0) and Jan 6 (max 2.0) only
    val sparse = Seq(
      (1L, Timestamp.valueOf("2024-01-03 10:00:00"), 0L, "g", 5.0),
      (2L, Timestamp.valueOf("2024-01-06 12:00:00"), 0L, "g", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    MetricCache.save(sparse, Seq("user_id", "event_type"), "ts",
      MetricCache.standardPartials("value"), dir)
    val rows = MetricCache.serveDenseDaily(
      MetricCache.read(s, dir), Seq("event_type"), "2024-01-01", "2024-01-08")
      .orderBy("day").collect()
    assert(rows.length === 8) // every day exists
    val byDay = rows.map(r => r.getDate(1).toString ->
      (r.getLong(2), if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(byDay("2024-01-02") === ((0L, None)))        // before first obs
    assert(byDay("2024-01-03") === ((1L, Some(5.0))))   // observation day
    assert(byDay("2024-01-05") === ((0L, Some(5.0))))   // gap: carried fwd
    assert(byDay("2024-01-06") === ((1L, Some(2.0))))   // new observation
    assert(byDay("2024-01-08") === ((0L, Some(2.0))))   // trailing carry
  }

  test("distinct sketch: accuracy across cardinalities, append idempotence") {
    val s = spark
    import s.implicits._
    val m = 4096
    for (n <- Seq(100, 1000, 3000)) {
      val dir = java.nio.file.Files.createTempDirectory(s"sketch$n").toString
      val keys = (1 to n).map(k =>
        (k.toLong, Timestamp.valueOf(f"2024-01-${1 + k % 20}%02d 10:00:00"), "t"))
        .toDF("uid", "ts", "kind")
      // base = first 60%, append = last 60% — overlapping slices, so the
      // estimate is only right if duplicated buckets union, not add
      MetricCache.distinctSketchSave(keys.where(col("uid") <= n * 6 / 10),
        Seq("kind"), "ts", "uid", m, dir)
      MetricCache.distinctSketchAppend(keys.where(col("uid") > n * 4 / 10),
        Seq("kind"), "ts", "uid", m, dir)
      val est = MetricCache.distinctEstimate(s, dir, Seq("kind"), m)
        .collect().head.getDouble(2)
      assert(math.abs(est - n) / n < 0.05, s"n=$n est=$est")

      // rebuilt-from-scratch sketch estimates identically (set-union
      // idempotence — the no-read-modify-write claim)
      val dir2 = java.nio.file.Files.createTempDirectory(s"sketchF$n").toString
      MetricCache.distinctSketchSave(keys, Seq("kind"), "ts", "uid", m, dir2)
      val est2 = MetricCache.distinctEstimate(s, dir2, Seq("kind"), m)
        .collect().head.getDouble(2)
      assert(est === est2)
    }
  }

  test("distinct sketch overlap: inclusion–exclusion accuracy") {
    val s = spark
    import s.implicits._
    val m = 4096
    val dir = java.nio.file.Files.createTempDirectory("sketchOv").toString
    // |A| = 1000, |B| = 1000, true overlap = 300 (keys 701..1000)
    val rows =
      (1 to 1000).map(k => (k.toLong, "a")) ++
        (701 to 1700).map(k => (k.toLong, "b"))
    val df = rows.map { case (k, kind) =>
      (k, Timestamp.valueOf(f"2024-01-${1 + k % 20}%02d 09:00:00"), kind)
    }.toDF("uid", "ts", "kind")
    MetricCache.distinctSketchSave(df, Seq("kind"), "ts", "uid", m, dir)
    val r = MetricCache.distinctOverlapEstimate(s, dir, "kind", "a", "b", m)
      .collect().head
    val est = r.getDouble(3)
    assert(math.abs(est - 300.0) < 45.0, s"overlap est=$est want≈300")
  }

  test("streaming distinct sketch ≡ batch sketch at every batch boundary") {
    val s = spark
    import s.implicits._
    val m = 4096
    val dir = java.nio.file.Files.createTempDirectory("sksd").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sksc").toString
    val all = (1 to 900).map(k =>
      (k.toLong, java.sql.Timestamp.valueOf(f"2024-01-${1 + k % 9}%02d 08:00:00"), "t"))
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, String)](s)
    val q = MetricCache.distinctSketchStreamAppend(
      ms.toDF.toDF("uid", "ts", "kind"), Seq("kind"), "ts", "uid", m, dir, ckpt)
    try {
      var seen = 0
      // overlapping batches: idempotent union is what keeps this exact
      for (b <- Seq(all.take(400), all.slice(300, 700), all.drop(600))) {
        ms.addData(b: _*)
        q.processAllAvailable()
        seen = math.max(seen, all.indexOf(b.last) + 1)
        val est = MetricCache.distinctEstimate(s, dir, Seq("kind"), m)
          .collect().head.getDouble(2)
        val dir2 = java.nio.file.Files.createTempDirectory("sksd2").toString
        MetricCache.distinctSketchSave(
          all.take(seen).toDF("uid", "ts", "kind"),
          Seq("kind"), "ts", "uid", m, dir2)
        val est2 = MetricCache.distinctEstimate(s, dir2, Seq("kind"), m)
          .collect().head.getDouble(2)
        assert(est === est2, s"diverged after $seen keys")
      }
    } finally q.stop()
  }

  test("takedown: serve equals a cache that never held the dropped dim") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mctd").toString
    val dst = java.nio.file.Files.createTempDirectory("mctd2").toString + "/v1"
    val all = facts
    val dims = Seq("user_id", "event_type")
    MetricCache.save(all, dims, "ts",
      MetricCache.standardPartials("value"), dir)
    MetricCache.takedown(s, dir, col("user_id") === 3L, dst)
    assert(MetricCache.read(s, dst)
      .where(col("user_id") === 3L).count() === 0L)
    val served = MetricCache.read(s, dst)
      .groupBy(col("event_type"))
      .agg(MetricCache.standardMerge.head, MetricCache.standardMerge.tail: _*)
    val direct = all.where(col("user_id") =!= 3L)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("value_cents"),
        min(col("value")).as("value_min"),
        max(col("value")).as("value_max"))
    assert(served.collect().map(_.toSeq).toSet ===
      direct.collect().map(_.toSeq).toSet)
    // the old version is untouched (readers keep their snapshot)
    assert(MetricCache.read(s, dir)
      .where(col("user_id") === 3L).count() > 0L)
  }

  test("serve plan: day range is a partition filter, dim filter is pushed") {
    val dir = java.nio.file.Files.createTempDirectory("mcache2").toString
    MetricCache.save(facts, Seq("user_id", "event_type"), "ts",
      MetricCache.standardPartials("value"), dir)
    // hive-style day partitions on disk
    val subdirs = new java.io.File(dir).listFiles().map(_.getName)
    assert(subdirs.count(_.startsWith("__day__=")) > 5)

    val q = MetricCache.read(spark, dir)
      .where(col(MetricCache.DayCol).between("2024-01-05", "2024-01-10") &&
        col("user_id") <= 3L)
      .groupBy("event_type")
      .agg(sum(col("n")).as("n_events"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__day__"),
      s"day range did not prune partitions:\n$plan")
    assert("PushedFilters: \\[[^\\]]*user_id".r.findFirstIn(plan).isDefined,
      s"user_id predicate did not push to the parquet scan:\n$plan")
    assert(q.collect().nonEmpty)
  }
}
