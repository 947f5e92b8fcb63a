package graft

import java.sql.Timestamp

import graft.funcs._
import graft.ir.Expr._
import graft.model.{Model, StepSpec}

/** Event-analytics acceptance tests encoding the reference's documented
  * worked examples (the public reference ships no tests; its docstrings are
  * the golden specs — SURVEY.md §5).
  */
class FunnelSpec extends GraftSuite {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s + " 00:00:00")

  /** The funnel docstring fixture: 7 users, 14 events
    * (/root/reference/src/model/model.py:578-628). */
  private lazy val docstringEvents = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, "ad_impression", ts("2024-01-01")),
      (0L, "visit", ts("2024-01-02")),
      (0L, "purchase", ts("2024-01-04")),
      (1L, "ad_impression", ts("2024-01-01")),
      (1L, "visit", ts("2024-01-02")),
      (1L, "purchase", ts("2024-01-03")),
      (1L, "purchase", ts("2024-01-04")),
      (2L, "ad_impression", ts("2024-01-01")),
      (2L, "visit", ts("2024-01-02")),
      (3L, "ad_impression", ts("2024-01-01")),
      (3L, "visit", ts("2024-01-02")),
      (4L, "ad_impression", ts("2024-01-01")),
      (5L, "visit", ts("2024-01-01")),
      (5L, "purchase", ts("2024-01-02")),
      (6L, "other_event", ts("2024-01-01")),
    ).toDF("user_id", "event", "timestamp")
  }

  private def eventsModel: Model =
    Model.fromDF(docstringEvents)
      .withActivitySchema(col("user_id"), col("timestamp"), col("event"))

  test("funnel docstring example: 7 users -> 5 -> 4 -> 2, in funnel order") {
    // the docstring table has a typo (visit shows 5) but its prose derivation
    // is unambiguous: users 0,1,2,3 visited AFTER an ad -> 4
    val rows = eventsModel
      .funnel(Seq[StepSpec]("ad_impression", "visit", "purchase"),
        topOfFunnel = "users")
      .run(spark)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq === Seq(
      "users" -> 7L, "ad_impression" -> 5L, "visit" -> 4L, "purchase" -> 2L))
  }

  test("funnel with integer topOfFunnel starts at that step index") {
    val rows = eventsModel
      .funnel(Seq[StepSpec]("ad_impression", "visit", "purchase"),
        topOfFunnel = 1)
      .run(spark)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq === Seq("visit" -> 4L, "purchase" -> 2L))
  }

  test("match_steps: greedy first-after matching per user") {
    val matched = eventsModel
      .matchSteps(Seq[StepSpec]("ad_impression", "visit", "purchase"))
    val out = matched.pick(
      col("user_id"),
      matched.rel("visit").attr("timestamp").named("visit_ts"),
      matched.attr("last_matched_step_name"))
      .sort(col("user_id"))
      .run(spark)
      .collect()
    assert(out.length === 7) // every distinct user appears
    val byUser = out.map(r => r.getLong(0) -> r).toMap
    // user 5 visited but never after an ad_impression
    assert(byUser(5L).isNullAt(1))
    assert(byUser(5L).isNullAt(2))
    // user 6 matched nothing
    assert(byUser(6L).isNullAt(2))
    assert(byUser(0L).getString(2) === "purchase")
    assert(byUser(2L).getString(2) === "visit")
    assert(byUser(4L).getString(2) === "ad_impression")
  }

  test("match_steps: equal timestamps do not satisfy 'strictly after'") {
    // reference journey tie-break sorts a later step's char BEFORE the
    // earlier step at the same timestamp (ts asc, step-char desc), so the
    // later step cannot match at the same instant
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a", ts("2024-01-01")),
      (1L, "b", ts("2024-01-01")), // same instant as step a -> NOT matched
      (2L, "a", ts("2024-01-01")),
      (2L, "b", ts("2024-01-02")), // strictly after -> matched
    ).toDF("user_id", "event", "timestamp")
    val matched = Model.fromDF(df)
      .withActivitySchema(col("user_id"), col("timestamp"), col("event"))
      .matchSteps(Seq[StepSpec]("a", "b"))
    val out = matched.pick(
      col("user_id"),
      matched.rel("b").attr("timestamp").named("b_ts"))
      .sort(col("user_id"))
      .run(spark).collect()
    assert(out(0).isNullAt(1))
    assert(!out(1).isNullAt(1))
  }

  test("match_steps: step_k_event_index is count-strictly-earlier + 1, ties take the first slot") {
    // reference match_steps.py compiles event_index as row_number() over
    // (partition by group order by ts) with ARBITRARY tie order; v3 pins
    // the deterministic refinement: the index the FIRST event at the
    // matched instant would get — count of strictly-earlier events + 1.
    // user 1: events at t1, t1, t2(a), t3(b) → a matched at t2 has 2
    // earlier events → index 3; b at t3 → index 4.
    // user 2: a at t1 (index 1), b tied with two other events at t2 —
    // all three tie, b's index collapses to 2 (first slot), not 3 or 4.
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "x", ts("2024-01-01")),
      (1L, "x", ts("2024-01-01")),
      (1L, "a", ts("2024-01-02")),
      (1L, "b", ts("2024-01-03")),
      (2L, "a", ts("2024-01-01")),
      (2L, "x", ts("2024-01-02")),
      (2L, "b", ts("2024-01-02")),
      (2L, "x", ts("2024-01-02")),
    ).toDF("user_id", "event", "timestamp")
    val matched = Model.fromDF(df)
      .withActivitySchema(col("user_id"), col("timestamp"), col("event"))
      .matchSteps(Seq[StepSpec]("a", "b"))
    val out = matched.pick(
      col("user_id"),
      col("step_0_event_index").named("ia"),
      col("step_1_event_index").named("ib"))
      .sort(col("user_id"))
      .run(spark).collect()
    assert(out.length === 2)
    assert(out(0).getLong(1) === 3L && out(0).getLong(2) === 4L)
    assert(out(1).getLong(1) === 1L && out(1).getLong(2) === 2L)
  }

  test("match_steps time_limit is calendar-aware (1 month != 30 days)") {
    val s = spark
    import s.implicits._
    val df = Seq(
      // March has 31 days: +1 MONTH cutoff = Apr 1 00:00; a 30-day
      // approximation would cut at Mar 31 00:00 and wrongly exclude u1's b
      (1L, "a", Timestamp.valueOf("2024-03-01 00:00:00")),
      (1L, "b", Timestamp.valueOf("2024-03-31 12:00:00")),
      (2L, "a", Timestamp.valueOf("2024-03-01 00:00:00")),
      (2L, "b", Timestamp.valueOf("2024-04-02 00:00:00")), // beyond cutoff
    ).toDF("user_id", "event", "timestamp")
    val matched = Model.fromDF(df)
      .withActivitySchema(col("user_id"), col("timestamp"), col("event"))
      .matchSteps(Seq[StepSpec]("a", "b"), timeLimit = interval(1, "month"))
    val out = matched.pick(
      col("user_id"),
      matched.rel("b").attr("timestamp").named("b_ts"))
      .sort(col("user_id"))
      .run(spark).collect()
    assert(!out(0).isNullAt(1), "Mar 31 12:00 is inside [Mar 1, Apr 1)")
    assert(out(1).isNullAt(1), "Apr 2 is beyond the 1-month cutoff")
  }

  test("funnel_conversion_rate on the docstring fixture") {
    val row = eventsModel
      .funnelConversionRate(Seq[StepSpec]("ad_impression", "visit", "purchase"))
      .run(spark)
      .collect()
      .head
    // 5 users entered (saw an ad), 2 converted
    assert(row.getAs[Long]("startedCount") === 5L)
    assert(row.getAs[Long]("convertedCount") === 2L)
    assert(math.abs(row.getAs[Double]("rate") - 0.4) < 1e-12)
  }

  test("sessionize splits on gaps and keeps equal-timestamp ties together") {
    val s = spark
    import s.implicits._
    def t(hms: String) = Timestamp.valueOf(s"2024-01-01 $hms")
    val events = Seq(
      // user 1: 3 events within 30min, then a 31-min gap, then 2 more
      (1L, "a", t("10:00:00")), (1L, "b", t("10:10:00")), (1L, "c", t("10:29:00")),
      (1L, "d", t("11:00:01")), (1L, "e", t("11:05:00")),
      // user 2: two events at the IDENTICAL boundary instant + one before
      (2L, "x", t("09:00:00")),
      (2L, "y", t("09:30:01")), (2L, "z", t("09:30:01")),
    ).toDF("user_id", "event", "timestamp")
    val out = Model.fromDF(events)
      .withActivitySchema(col("user_id"), col("timestamp"), col("event"))
      .sessionize(gapSeconds = 1800)
      .sort(col("user_id")).sort(col("session_start"))
      .run(s).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2),
        r.getTimestamp(3).toString))
    assert(out.toSeq === Seq(
      (1L, "2024-01-01 10:00:00.0", 3L, "2024-01-01 10:29:00.0"),
      (1L, "2024-01-01 11:00:01.0", 2L, "2024-01-01 11:05:00.0"),
      (2L, "2024-01-01 09:00:00.0", 1L, "2024-01-01 09:00:00.0"),
      // both 09:30:01 events share one session despite the tie at the
      // boundary — the RANGE-frame running max makes the grain stable
      (2L, "2024-01-01 09:30:01.0", 2L, "2024-01-01 09:30:01.0"),
    ))
    // wire round-trip: sessionize has a serializable source form
    val m = Model.table("events")
      .withActivitySchema(col("user_id"), col("ts"), col("event_type"))
      .sessionize(900)
    assert(graft.wire.WireFormat.fromJson(graft.wire.WireFormat.toJson(m)) === m)
  }

  test("match_steps keeps null groups and null partition values") {
    val s = spark
    import s.implicits._
    // null group: a legitimate key the chain must not silently drop
    val df = Seq(
      (Option(1L), "a", ts("2024-01-01")),
      (Option(1L), "b", ts("2024-01-02")),
      (Option.empty[Long], "a", ts("2024-01-03")),
      (Option.empty[Long], "b", ts("2024-01-04")),
    ).toDF("user_id", "event", "timestamp")
    val matched = Model.fromDF(df)
      .withActivitySchema(col("user_id"), col("timestamp"), col("event"))
      .matchSteps(Seq[StepSpec]("a", "b"))
    val rows = matched.pick(col("user_id"),
      matched.rel("b").attr("timestamp").named("b_ts"))
      .run(s).collect()
    assert(rows.length === 2, "both the 1L and the NULL group must survive")
    val nullRow = rows.find(_.isNullAt(0)).getOrElse(fail("null group dropped"))
    assert(nullRow.getTimestamp(1) === ts("2024-01-04"))

    // null partition value: its anchor forms a partition like any other
    val pdf = Seq(
      (1L, "A", "a", ts("2024-01-01")),
      (1L, null, "a", ts("2024-01-02")),
      (1L, "A", "b", ts("2024-01-05")),
    ).toDF("user_id", "channel", "event", "timestamp")
    val pm = Model.fromDF(pdf)
      .withActivitySchema(col("user_id"), col("timestamp"), col("event"))
      .matchSteps(Seq[StepSpec]("a", "b"),
        partitionStartEvents = Seq(col("channel")))
    val prows = pm.pick(col("user_id"), col("channel"),
      pm.rel("a").attr("timestamp").named("a_ts"))
      .run(s).collect()
      .map(r => (Option(r.getString(1)), r.getTimestamp(2))).toSet
    assert(prows === Set(
      (Some("A"), ts("2024-01-01")),
      (None, ts("2024-01-02"))), "null-channel partition must be emitted")
  }

  test("match_steps: same-instant anchors in different partitions join their own events") {
    val s = spark
    import s.implicits._
    // two partitions of one group anchor at the SAME timestamp on
    // DIFFERENT events — each output row's step-0 relation must carry its
    // own partition's event attributes
    val df = Seq(
      (1L, "A", "a", "tagA", ts("2024-01-01")),
      (1L, "B", "a", "tagB", ts("2024-01-01")),
      (1L, "A", "b", "x", ts("2024-01-02")),
    ).toDF("user_id", "channel", "event", "tag", "timestamp")
    val m = Model.fromDF(df)
      .withActivitySchema(col("user_id"), col("timestamp"), col("event"))
      .matchSteps(Seq[StepSpec]("a", "b"),
        partitionStartEvents = Seq(col("channel")))
    val rows = m.pick(col("channel"),
      m.rel("a").attr("tag").named("a_tag"))
      .sort(col("channel"))
      .run(s).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq === Seq(("A", "tagA"), ("B", "tagB")))
  }

  test("match_steps hot group: 120k events in one group through the bounded aggregate") {
    // One bot-like group with 120k events, half of them matching step 1
    // BEFORE the step-0 anchor (the adversarial shape for frontier
    // retention). The old window-chain design buffered all 120k rows
    // K+1 times per group; the greedy_chain aggregate's state is the
    // pruned candidate frontier.
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.{functions => F}
    val n = 120000
    val df = s.range(n).select(
      F.lit(1L).as("user_id"),
      F.expr("timestamp_seconds(1700000000 + id)").as("timestamp"),
      F.when(F.col("id") === 60001L, "view")
        .when(F.col("id") % 2 === 0, "click")
        .otherwise("noise").as("event"))
      .repartition(8) // force partial-state merges across partitions
    val matched = Model.fromDF(df)
      .withActivitySchema(col("user_id"), col("timestamp"), col("event"))
      .matchSteps(Seq[StepSpec]("view", "click", "purchase"))
    val out = matched.pick(
      col("user_id"),
      matched.rel("view").attr("timestamp").named("view_ts"),
      matched.rel("click").attr("timestamp").named("click_ts"),
      matched.rel("purchase").attr("timestamp").named("purchase_ts"))
    val plan = out.sort(col("user_id")).run(s)
    assert(plan.queryExecution.executedPlan.toString.contains("greedy_chain"),
      "plan must run the custom bounded-state chain aggregate")
    val rows = plan.collect()
    assert(rows.length === 1)
    val r = rows(0)
    // view at t=60001; first click strictly after = 60002; no purchase
    assert(r.getTimestamp(1).getTime === (1700000000L + 60001) * 1000)
    assert(r.getTimestamp(2).getTime === (1700000000L + 60002) * 1000)
    assert(r.isNullAt(3))
  }

  test("match_steps matches a brute-force sorted-scan oracle under random partitioning") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val events = Seq.fill(300)((
        rnd.nextInt(5).toLong,                                  // group
        new Timestamp(1700000000000L + rnd.nextInt(40) * 1000L), // ts (ties!)
        Seq("a", "b", "c", "x", "y")(rnd.nextInt(5))))           // event
      val df = events.toDF("user_id", "timestamp", "event")
        .repartition(7 + trial)
      val matched = Model.fromDF(df)
        .withActivitySchema(col("user_id"), col("timestamp"), col("event"))
        .matchSteps(Seq[StepSpec]("a", "b", "c"))
      val got = matched.pick(
        col("user_id"),
        matched.rel("a").attr("timestamp").named("a_ts"),
        matched.rel("b").attr("timestamp").named("b_ts"),
        matched.rel("c").attr("timestamp").named("c_ts"))
        .sort(col("user_id")).run(s).collect()
        .map(r => (r.getLong(0),
          Option(r.getTimestamp(1)), Option(r.getTimestamp(2)), Option(r.getTimestamp(3))))

      // brute force: greedy first-strictly-after over times per group
      val expected = events.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, evs) =>
        def firstAfter(step: String, after: Option[Long]): Option[Long] = {
          val cands = evs.filter(_._3 == step).map(_._2.getTime)
          after match {
            case None if step == "a" => if (cands.isEmpty) None else Some(cands.min)
            case Some(x) => cands.filter(_ > x).sorted.headOption
            case None => None
          }
        }
        val a = firstAfter("a", None)
        val b = firstAfter("b", a)
        val c = firstAfter("c", b)
        (g, a.map(new Timestamp(_)), b.map(new Timestamp(_)), c.map(new Timestamp(_)))
      }
      assert(got.toSeq === expected, s"trial $trial")
    }
  }
}
