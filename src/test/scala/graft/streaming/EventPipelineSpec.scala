package graft.streaming

import java.sql.Timestamp

import graft.TestSpark
import graft.streaming.EventPipeline.{Event, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class EventPipelineSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  private def batchEvents = Seq(
    Event(1L, ts("10:05"), 1L, "click", 1.0),
    Event(2L, ts("10:50"), 1L, "click", 2.0),
    Event(3L, ts("10:20"), 2L, "view", 5.0),
    Event(4L, ts("11:10"), 1L, "click", 3.0),
    Event(5L, ts("13:00"), 1L, "view", 4.0)).toDF()

  test("windowedCounts buckets into epoch-aligned tumbling windows") {
    val r = EventPipeline.windowedCounts(batchEvents)
      .orderBy("w_start", "event_type")
      .collect()
      .map(x => (x.getAs[Timestamp]("w_start").toString, x.getAs[String]("event_type"),
        x.getAs[Long]("n"), x.getAs[Double]("sum_value")))
    r shouldBe Array(
      ("2024-01-01 10:00:00.0", "click", 2L, 3.0),
      ("2024-01-01 10:00:00.0", "view", 1L, 5.0),
      ("2024-01-01 11:00:00.0", "click", 1L, 3.0),
      ("2024-01-01 13:00:00.0", "view", 1L, 4.0))
  }

  test("ewmaSmoothed matches a driver model; head renormalizes; converges on constants") {
    val series = Seq(
      ("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 10.0), ("a", 4L, 40.0),
      ("b", 1L, 5.0), ("b", 2L, 5.0), ("b", 3L, 5.0))
      .toDF("k", "t", "v")
    val out = EventPipeline.ewmaSmoothed(series, "k", "t", "v",
        alpha = 0.5, k = 3)
      .orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
    val ws = EventPipeline.ewmaWeights(0.5, 3) // 0.5, 0.25, 0.125
    def model(vs: Seq[Double]): Double = {
      val pairs = ws.zipWithIndex.flatMap { case (w, j) =>
        vs.lift(vs.length - 1 - j).map(v => (w, v)) }
      pairs.map { case (w, v) => w * v }.sum / pairs.map(_._1).sum
    }
    val byKey = Seq(("a", Seq(10.0, 20.0, 10.0, 40.0)), ("b", Seq(5.0, 5.0, 5.0)))
    for ((k, vs) <- byKey; t <- 1 to vs.length) {
      val got = out.find(x => x._1 == k && x._2 == t).get._3
      got shouldBe model(vs.take(t)) +- 1e-12
    }
    // a constant series smooths to itself at every position (head incl.)
    out.filter(_._1 == "b").map(_._3).foreach(_ shouldBe 5.0 +- 1e-12)
    // the first point of any series is the raw value (weights renormalize)
    out.find(x => x._1 == "a" && x._2 == 1L).get._3 shouldBe 10.0 +- 1e-12
  }

  test("slidingWindowedCounts: every event lands in length/slide overlapping windows") {
    val r = EventPipeline.slidingWindowedCounts(batchEvents, "1 hour", "30 minutes")
      .orderBy("w_start", "event_type").collect()
      .map(x => (x.getAs[java.sql.Timestamp]("w_start").toString,
        x.getAs[String]("event_type"), x.getAs[Long]("n")))
    // total window-memberships = 2x the event count
    r.map(_._3).sum shouldBe batchEvents.count() * 2
    // the 10:05 click is in windows starting 09:30 and 10:00
    r.filter(_._2 == "click").map(_._1) should contain allOf(
      "2024-01-01 09:30:00.0", "2024-01-01 10:00:00.0")
    // window [10:00, 11:00) holds clicks at 10:05 and 10:50
    r.find(x => x._1 == "2024-01-01 10:00:00.0" && x._2 == "click").get._3 shouldBe 2
  }

  test("lastTouchAttribution credits the latest in-window touch, null when organic") {
    val events = Seq(
      Event(1L, ts("10:00"), 1L, "click", 1.0),
      Event(2L, ts("10:20"), 1L, "click", 1.0),    // latest click before conv
      Event(3L, ts("10:30"), 1L, "purchase", 9.0), // -> touch 2, gap 10 min
      Event(4L, ts("12:30"), 1L, "purchase", 9.0), // gap 130 min > 60 -> organic
      Event(5L, ts("09:00"), 2L, "purchase", 9.0), // no touch ever -> organic
      Event(6L, ts("11:00"), 3L, "view", 1.0),
      Event(7L, ts("11:05"), 3L, "purchase", 9.0)  // view is not a touch
    ).toDF()
    val r = EventPipeline.lastTouchAttribution(events, "click", "purchase",
        lookbackMs = 3600 * 1000L)
      .orderBy("conv_id").collect()
      .map(x => (x.getAs[Long]("conv_id"),
        Option(x.getAs[Any]("touch_id")).map(_.asInstanceOf[Long]),
        Option(x.getAs[Any]("gap_ms")).map(_.asInstanceOf[Long])))
    r shouldBe Array(
      (3L, Some(2L), Some(10L * 60 * 1000)),
      (4L, None, None),
      (5L, None, None),
      (7L, None, None))
  }

  test("lastTouchAttribution: same-timestamp ties resolve by event id") {
    val events = Seq(
      Event(10L, ts("10:00"), 1L, "click", 1.0),
      Event(11L, ts("10:00"), 1L, "purchase", 9.0), // click id 10 < 11: counts
      Event(13L, ts("10:30"), 1L, "click", 1.0),    // id AFTER the purchase row
      Event(12L, ts("10:30"), 1L, "purchase", 9.0)  // only sees clicks <= (ts, 12)
    ).toDF()
    val r = EventPipeline.lastTouchAttribution(events, "click", "purchase",
        lookbackMs = 3600 * 1000L)
      .orderBy("conv_id").collect()
      .map(x => (x.getAs[Long]("conv_id"),
        Option(x.getAs[Any]("touch_id")).map(_.asInstanceOf[Long])))
    // conv 11 at 10:00 credits click 10 (same ts, lower id); conv 12 at
    // 10:30 does NOT see click 13 (same ts, higher id) -> falls back to 10
    r shouldBe Array((11L, Some(10L)), (12L, Some(10L)))
  }

  test("sessionizeBatch closes sessions after the inactivity gap") {
    val r = EventPipeline.sessionizeBatch(batchEvents) // 30-min gap
      .orderBy("user_id", "s_start")
      .collect()
      .map(x => (x.getAs[Long]("user_id"), x.getAs[Timestamp]("s_start").toString,
        x.getAs[Timestamp]("s_end").toString, x.getAs[Long]("n_events"),
        x.getAs[Double]("sum_value")))
    // user 1: 10:05 | gap 45m | 10:50,11:10 | gap 110m | 13:00 -> 3 sessions
    r shouldBe Array(
      (1L, "2024-01-01 10:05:00.0", "2024-01-01 10:05:00.0", 1L, 1.0),
      (1L, "2024-01-01 10:50:00.0", "2024-01-01 11:10:00.0", 2L, 5.0),
      (1L, "2024-01-01 13:00:00.0", "2024-01-01 13:00:00.0", 1L, 4.0),
      (2L, "2024-01-01 10:20:00.0", "2024-01-01 10:20:00.0", 1L, 5.0))
  }

  test("streamingWindowedCounts emits finalized windows under a watermark") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventPipeline.streamingWindowedCounts(input.toDF(), "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("swc").outputMode("append").start()
    try {
      input.addData(Event(1L, ts("10:05"), 1L, "click", 1.0),
        Event(2L, ts("10:40"), 1L, "click", 2.0))
      q.processAllAvailable()
      // watermark still 10:10 -> nothing final yet
      input.addData(Event(3L, ts("12:00"), 1L, "view", 9.0))
      q.processAllAvailable() // watermark -> 11:30 after this batch
      input.addData(Event(4L, ts("12:01"), 1L, "view", 1.0))
      q.processAllAvailable() // 10:00 window (end 11:00) < 11:30 -> emitted
      val rows = spark.table("swc").collect()
        .map(x => (x.getAs[Timestamp]("w_start").toString, x.getAs[String]("event_type"),
          x.getAs[Long]("n"), x.getAs[Double]("sum_value")))
      rows should contain ("2024-01-01 10:00:00.0", "click", 2L, 3.0)
    } finally q.stop()
  }

  test("stream-static dim join: enriched windowed weights match the batch run") {
    implicit val sql = spark.sqlContext
    val dim = Seq(("click", 2.0), ("view", 10.0)).toDF("event_type", "weight")
    val input = MemoryStream[Event]
    val q = EventPipeline.enrichedWindowedWeight(input.toDF(), dim, "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("enr").outputMode("append").start()
    try {
      input.addData(Event(1L, ts("10:05"), 1L, "click", 1.0),
        Event(2L, ts("10:40"), 1L, "click", 2.0),
        Event(3L, ts("10:20"), 2L, "view", 5.0))
      q.processAllAvailable()
      input.addData(Event(4L, ts("12:01"), 1L, "view", 1.0))
      q.processAllAvailable() // watermark 11:31 -> the 10:00 window finalizes
      val got = spark.table("enr").collect()
        .map(x => (x.getAs[Timestamp]("w_start").toString, x.getAs[String]("event_type"),
          x.getAs[Long]("n"), x.getAs[Double]("sum_weight"))).toSet
      got should contain ("2024-01-01 10:00:00.0", "click", 2L, 4.0)
      got should contain ("2024-01-01 10:00:00.0", "view", 1L, 10.0)
      // batch parity: the same code path over a batch frame, no watermark
      val batch = EventPipeline.enrichedWindowedWeight(
          Seq(Event(1L, ts("10:05"), 1L, "click", 1.0),
            Event(2L, ts("10:40"), 1L, "click", 2.0),
            Event(3L, ts("10:20"), 2L, "view", 5.0),
            Event(4L, ts("12:01"), 1L, "view", 1.0)).toDF(), dim)
        .collect()
        .map(x => (x.getAs[Timestamp]("w_start").toString, x.getAs[String]("event_type"),
          x.getAs[Long]("n"), x.getAs[Double]("sum_weight"))).toSet
      got.subsetOf(batch) shouldBe true
    } finally q.stop()
  }

  test("intervalJoin: inclusive bounds, per-key scoping, batch/stream parity") {
    implicit val sql = spark.sqlContext
    def views(df: org.apache.spark.sql.DataFrame) = df
      .filter($"event_type" === "view")
      .select($"user_id", $"event_id".as("view_id"), $"ts".as("view_ts"))
    def clicks(df: org.apache.spark.sql.DataFrame) = df
      .filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), $"ts".as("click_ts"))
    val data = Seq(
      Event(1L, ts("10:00"), 1L, "view", 0.0),
      Event(2L, ts("10:00"), 1L, "click", 0.0), // at lower bound (0) -> in
      Event(3L, ts("10:30"), 1L, "click", 0.0), // at upper bound -> in
      Event(4L, ts("10:31"), 1L, "click", 0.0), // past upper -> out
      Event(5L, ts("10:10"), 2L, "click", 0.0), // other user -> out
      Event(6L, ts("12:00"), 2L, "view", 0.0),  // no matching click
      Event(7L, ts("14:00"), 9L, "view", 0.0))  // watermark pusher
    val expect = Set((1L, 1L, 2L), (1L, 1L, 3L))

    val batch = EventPipeline.intervalJoin(
      views(data.toDF()), clicks(data.toDF()), "user_id", "view_ts", "click_ts")
      .select("user_id", "view_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    batch shouldBe expect

    // same definition as a watermarked stream-stream join: results match
    // and the planner accepts the interval as the state-eviction range
    val lIn = MemoryStream[Event]; val rIn = MemoryStream[Event]
    val q = EventPipeline.intervalJoin(
      views(lIn.toDF()).withWatermark("view_ts", "10 minutes"),
      clicks(rIn.toDF()).withWatermark("click_ts", "10 minutes"),
      "user_id", "view_ts", "click_ts")
      .writeStream.format("memory").queryName("ivj").outputMode("append").start()
    try {
      // two batches with the matching click arriving after its view
      lIn.addData(data.filter(_.event_type == "view").take(1): _*)
      rIn.addData(data.filter(_.event_type == "click"): _*)
      q.processAllAvailable()
      lIn.addData(data.filter(_.event_type == "view").drop(1): _*)
      q.processAllAvailable()
      val streamed = spark.table("ivj").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("view_id"),
          r.getAs[Long]("click_id"))).toSet
      streamed shouldBe expect
    } finally q.stop()
  }

  test("left-outer intervalJoin: unmatched views surface null-padded after the watermark") {
    implicit val sql = spark.sqlContext
    def views(df: org.apache.spark.sql.DataFrame) = df
      .filter($"event_type" === "view")
      .select($"user_id", $"event_id".as("view_id"), $"ts".as("view_ts"))
    def clicks(df: org.apache.spark.sql.DataFrame) = df
      .filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), $"ts".as("click_ts"))
    val data = Seq(
      Event(1L, ts("10:00"), 1L, "view", 0.0),   // matched by event 2
      Event(2L, ts("10:10"), 1L, "click", 0.0),
      Event(3L, ts("10:00"), 2L, "view", 0.0))   // never matched
    // batch: both views kept, the unmatched one null-padded
    val batch = EventPipeline.intervalJoin(
      views(data.toDF()), clicks(data.toDF()), "user_id", "view_ts", "click_ts",
      joinType = "left_outer")
      .select($"user_id", $"view_id", $"click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    batch shouldBe Set((1L, 1L, Some(2L)), (2L, 3L, None))

    // streaming: the null-padded row for view 3 may only be emitted once
    // the click watermark passes view_ts + upper (10:30) — no earlier
    // batch can rule a future match out
    val lIn = MemoryStream[Event]; val rIn = MemoryStream[Event]
    val q = EventPipeline.intervalJoin(
      views(lIn.toDF()).withWatermark("view_ts", "10 minutes"),
      clicks(rIn.toDF()).withWatermark("click_ts", "10 minutes"),
      "user_id", "view_ts", "click_ts", joinType = "left_outer")
      .writeStream.format("memory").queryName("ivjlo").outputMode("append").start()
    try {
      lIn.addData(data.filter(_.event_type == "view"): _*)
      rIn.addData(data.filter(_.event_type == "click"): _*)
      q.processAllAvailable()
      def rows() = spark.table("ivjlo").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("view_id"),
          Option(r.get(r.fieldIndex("click_id"))))).toSet
      // watermark still at 10:10 - 10 min: the unmatched view is NOT final
      rows() should not contain ((2L, 3L, None))
      // push both watermarks far past 10:30 + lateness -> null row emits
      lIn.addData(Event(8L, ts("12:00"), 9L, "view", 0.0))
      rIn.addData(Event(9L, ts("12:00"), 9L, "click", 0.0))
      q.processAllAvailable()
      // one more cycle so the new watermark is applied to stored state
      lIn.addData(Event(10L, ts("12:30"), 9L, "view", 0.0))
      rIn.addData(Event(11L, ts("12:30"), 9L, "click", 0.0))
      q.processAllAvailable()
      rows() should contain ((1L, 1L, Some(2L)))
      rows() should contain ((2L, 3L, None))
    } finally q.stop()
  }

  test("file-source stream of the events table matches the batch result") {
    val stream = EventPipeline.readEventStream(spark, "/root/testdata/sf0.001")
    val q = EventPipeline.windowedCounts(stream)
      .writeStream.format("memory").queryName("filewc").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("filewc")
        .select("w_start", "event_type", "n", "sum_value").collect()
        .map(_.toSeq).toSet
      val batch = EventPipeline.windowedCounts(graft.Util.events(spark, "/root/testdata/sf0.001"))
        .collect().map(_.toSeq).toSet
      streamed shouldBe batch
      streamed.size should be > 10
    } finally q.stop()
  }

  test("stream anomaly scoring against a static baseline matches the batch twin") {
    // baseline profile precomputed in BATCH from the same table (the
    // production shape: a historical profile scores the live stream);
    // the streaming side must converge to the batch scorer's rows
    val sfDir = "/root/testdata/sf0.001"
    val batchEvents = graft.Util.events(spark, sfDir)
    val baseline = EventPipeline.hourOfDayBaseline(batchEvents)
    // minObs lowered: sf0.001 spans few days, so day-sample counts per
    // (type, hour-of-day) slot are small
    val expected = EventPipeline.anomalyAgainstBaseline(batchEvents, baseline,
        minZ = 1.0, minObs = 2)
      .collect().map(_.toSeq).toSet
    expected.size should be > 0
    val stream = EventPipeline.readEventStream(spark, sfDir)
    val q = EventPipeline.anomalyAgainstBaseline(stream, baseline,
        minZ = 1.0, minObs = 2)
      .writeStream.format("memory").queryName("sanom").outputMode("append").start()
    try {
      q.processAllAvailable()
      // append mode emits only watermark-finalized windows; the last
      // open window may be withheld, so streamed ⊆ batch and covers
      // all but at most the final window per type
      val streamed = spark.table("sanom")
        .select("event_type", "w_start", "n", "z").collect().map(_.toSeq).toSet
      streamed.subsetOf(expected) shouldBe true
      streamed.size should be >= expected.size - 4
    } finally q.stop()
  }

  test("streaming dedup drops replayed event ids within the watermark") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventPipeline.streamingDedup(input.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("sdedup").outputMode("append").start()
    try {
      input.addData(Event(1L, ts("10:00"), 1L, "click", 1.0),
        Event(2L, ts("10:01"), 1L, "click", 2.0))
      q.processAllAvailable()
      // replay event 1 (at-least-once delivery) + one new event
      input.addData(Event(1L, ts("10:00"), 1L, "click", 1.0),
        Event(3L, ts("10:02"), 2L, "view", 3.0))
      q.processAllAvailable()
      val ids = spark.table("sdedup").select("event_id").as[Long].collect().sorted
      ids shouldBe Array(1L, 2L, 3L)
    } finally q.stop()
  }

  test("streaming ingest feeds the summarize API per micro-batch") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Event]
    val results = scala.collection.mutable.Map[Long, Array[org.apache.spark.sql.Row]]()
    val q = EventPipeline.summarizePerBatch(input.toDF(),
      graft.tableone.TableOneConfig(Some("event_type"), Seq("value"))) { (t1, id) =>
      results.synchronized { results(id) = t1.collect() }
    }
    try {
      input.addData(Event(1L, ts("10:00"), 1L, "click", 2.0),
        Event(2L, ts("10:01"), 1L, "click", 4.0),
        Event(3L, ts("10:02"), 2L, "view", 9.0))
      q.processAllAvailable()
      val rows = results.synchronized(results.values.head)
      val totals = rows.find(_.getAs[String]("Values") == "ALL").get
      totals.getAs[Double]("All_Patients") shouldBe 3.0
      totals.getAs[Double]("click") shouldBe 2.0
      val mean = rows.find(r => r.getAs[String]("Values") == "mean").get
      mean.getAs[Double]("click") shouldBe 3.0
      mean.getAs[Double]("view") shouldBe 9.0
    } finally q.stop()
  }

  test("sessionize keeps exact bounds for in-watermark late events across batches") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventPipeline.sessionize(input.toDS())
      .writeStream.format("memory").queryName("latesess").outputMode("append").start()
    try {
      // batch 1: in-order events; state = [10:00, 10:10], watermark -> 09:10
      input.addData(Event(1L, ts("10:00"), 1L, "click", 1.0),
        Event(2L, ts("10:10"), 1L, "click", 2.0))
      q.processAllAvailable()
      // batch 2: two in-watermark OUT-OF-ORDER events — one inside the
      // session span (10:05) and one before its start (09:55). Neither may
      // move the end backwards; the early one extends the start downward.
      input.addData(Event(3L, ts("10:05"), 1L, "click", 0.5),
        Event(4L, ts("09:55"), 1L, "click", 0.25))
      q.processAllAvailable()
      // batches 3-4: push the watermark past 10:40 (= max event + gap) so
      // the event-time timeout fires and the session is emitted.
      input.addData(Event(5L, ts("14:00"), 2L, "view", 7.0))
      q.processAllAvailable()
      input.addData(Event(6L, ts("14:01"), 2L, "view", 1.0))
      q.processAllAvailable()
      val s1 = spark.table("latesess").as[Session].collect().filter(_.user_id == 1L)
      s1.length shouldBe 1
      s1.head.start shouldBe ts("09:55") // extended DOWN by the early late event
      s1.head.end shouldBe ts("10:10")   // NOT moved back by the 10:05 event
      s1.head.n_events shouldBe 4L
      s1.head.sum_value shouldBe 3.75
    } finally q.stop()
  }

  test("streaming sessionize closes a session via event-time timeout") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventPipeline.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      input.addData(Event(1L, ts("10:00"), 1L, "click", 1.0),
        Event(2L, ts("10:10"), 1L, "click", 2.0))
      q.processAllAvailable()
      // push the watermark far past 10:40 (last + gap) to fire the timeout
      input.addData(Event(3L, ts("14:00"), 2L, "view", 7.0))
      q.processAllAvailable()
      input.addData(Event(4L, ts("14:01"), 2L, "view", 1.0))
      q.processAllAvailable()
      val sessions = spark.table("sess").as[Session].collect()
      val s1 = sessions.filter(_.user_id == 1L)
      s1.length shouldBe 1
      s1.head.n_events shouldBe 2L
      s1.head.sum_value shouldBe 3.0
      s1.head.start shouldBe ts("10:00")
      s1.head.end shouldBe ts("10:10")
    } finally q.stop()
  }

  test("streaming funnel converges to the batch per-user firsts, out of order") {
    implicit val sql = spark.sqlContext
    import EventPipeline.FunnelRow
    val input = MemoryStream[Event]
    val q = EventPipeline.funnelStates(input.toDS())
      .writeStream.format("memory").queryName("funnel").outputMode("update").start()
    try {
      // batch 1: user 1 clicks then purchases; user 2 views only
      input.addData(Event(1L, ts("10:30"), 1L, "click", 1.0),
        Event(2L, ts("10:45"), 1L, "purchase", 9.0),
        Event(3L, ts("10:00"), 2L, "view", 1.0))
      q.processAllAvailable()
      // batch 2: user 1's VIEW arrives LATE with the earliest ts -> the
      // first-occurrence mins must absorb it and re-derive stage 3
      input.addData(Event(4L, ts("10:10"), 1L, "view", 1.0))
      q.processAllAvailable()
      // batch 3: an EARLIER click for user 1 (still after the view);
      // user 2 clicks BEFORE their first view -> stays stage 1
      input.addData(Event(5L, ts("10:20"), 1L, "click", 1.0),
        Event(6L, ts("09:50"), 2L, "click", 1.0))
      q.processAllAvailable()
      val last = spark.table("funnel").as[FunnelRow].collect()
        .zipWithIndex.groupBy(_._1.user_id)
        .map { case (u, rows) => u -> rows.maxBy(_._2)._1 }
      last(1L) shouldBe FunnelRow(1L, Some(ts("10:10").getTime),
        Some(ts("10:20").getTime), Some(ts("10:45").getTime), 3)
      // click (9:50) precedes first view (10:00): viewed but not converted
      last(2L) shouldBe FunnelRow(2L, Some(ts("10:00").getTime),
        Some(ts("09:50").getTime), None, 1)
      // parity with the batch derivation e8 uses (conditional min per type)
      val all = Seq(
        Event(1L, ts("10:30"), 1L, "click", 1.0), Event(2L, ts("10:45"), 1L, "purchase", 9.0),
        Event(3L, ts("10:00"), 2L, "view", 1.0), Event(4L, ts("10:10"), 1L, "view", 1.0),
        Event(5L, ts("10:20"), 1L, "click", 1.0), Event(6L, ts("09:50"), 2L, "click", 1.0)).toDF()
      import org.apache.spark.sql.functions._
      val batch = all.groupBy("user_id").agg(
          min(when(col("event_type") === "view", unix_millis(col("ts")))).as("v"),
          min(when(col("event_type") === "click", unix_millis(col("ts")))).as("c"),
          min(when(col("event_type") === "purchase", unix_millis(col("ts")))).as("p"))
        .collect().map(r => r.getLong(0) ->
          (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
      last.foreach { case (u, fr) =>
        (fr.v_ms, fr.c_ms, fr.p_ms) shouldBe batch(u)
      }
    } finally q.stop()
  }

  test("funnelLastEpisode: funnel over each user's last activity episode only") {
    // user 1: episode A (10:00 view -> 10:10 click -> 10:20 purchase, full
    // funnel) then a >1h gap, episode B (12:00 view -> 12:05 click, no
    // purchase) — TTL semantics must FORGET episode A: stage 2, not 3.
    // user 2: one episode, click before view -> stage 1.
    // user 3: purchases only -> stage 0 (no view).
    // "other" event types count as activity: user 4's 11:00 'other' event
    // bridges what would otherwise be a >1h gap between 10:30 and 11:55,
    // so the view at 10:30 and click at 11:55 are ONE episode -> stage 2.
    val events = Seq(
      Event(1L, ts("10:00"), 1L, "view", 1.0), Event(2L, ts("10:10"), 1L, "click", 1.0),
      Event(3L, ts("10:20"), 1L, "purchase", 1.0),
      Event(4L, ts("12:00"), 1L, "view", 1.0), Event(5L, ts("12:05"), 1L, "click", 1.0),
      Event(6L, ts("09:50"), 2L, "click", 1.0), Event(7L, ts("10:00"), 2L, "view", 1.0),
      Event(8L, ts("10:00"), 3L, "purchase", 1.0),
      Event(9L, ts("10:30"), 4L, "view", 1.0), Event(10L, ts("11:00"), 4L, "other", 1.0),
      Event(11L, ts("11:55"), 4L, "click", 1.0)).toDF()
    val got = EventPipeline.funnelLastEpisode(events, ttlMs = 3600000L)
      .orderBy("stage").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSeq
    got shouldBe Seq(
      (0L, 1L, None),                                    // user 3
      (1L, 1L, None),                                    // user 2
      (2L, 2L, Some(5 * 60 * 1000L + 85 * 60 * 1000L))) // users 1 (5 min) + 4 (85 min)
  }

  test("funnel inactivity TTL evicts idle users and re-opens their funnel from zero") {
    implicit val sql = spark.sqlContext
    import EventPipeline.FunnelRow
    val input = MemoryStream[Event]
    // ttl 30 min, watermark lateness 0 -> watermark = max event time seen;
    // user 1 is evicted once the watermark passes their last activity + 30 min
    val q = EventPipeline.funnelStates(input.toDS(),
        inactivityTtlMs = Some(30 * 60 * 1000L), watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("funnel_ttl").outputMode("update").start()
    try {
      // batch 1: user 1 completes view -> click
      input.addData(Event(1L, ts("10:00"), 1L, "view", 1.0),
        Event(2L, ts("10:05"), 1L, "click", 1.0))
      q.processAllAvailable()
      // batch 2: unrelated user far ahead pushes the watermark past
      // 10:05 + 30 min; the NEXT batch's timeout pass evicts user 1
      input.addData(Event(3L, ts("11:00"), 2L, "view", 1.0))
      q.processAllAvailable()
      input.addData(Event(4L, ts("11:05"), 2L, "click", 1.0))
      q.processAllAvailable()
      // batch 3: user 1 returns with a purchase — if state survived, this
      // would complete stage 3 (view 10:00 < click 10:05 < purchase 11:10);
      // after eviction the funnel re-opens from zero instead: purchase
      // only, no view -> stage 0
      input.addData(Event(5L, ts("11:10"), 1L, "purchase", 9.0))
      q.processAllAvailable()
      val rows = spark.table("funnel_ttl").as[FunnelRow].collect().zipWithIndex
      val u1 = rows.filter(_._1.user_id == 1L).map(_._1)
      // eviction emitted the converged stage-2 row one final time
      u1.count(r => r.stage == 2 && r.c_ms.contains(ts("10:05").getTime)) should be >= 2
      // the post-eviction row knows nothing of the pre-eviction events
      val last = rows.filter(_._1.user_id == 1L).maxBy(_._2)._1
      last shouldBe FunnelRow(1L, None, None, Some(ts("11:10").getTime), 0)
    } finally q.stop()
  }

  test("maintainAggState maintains HISTOGRAM state (u8's streaming twin) exactly") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.{DataFrame, Row}
    import org.apache.spark.sql.functions.{col, count, lit}
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Event]
    var state: Option[(Seq[Row], org.apache.spark.sql.types.StructType)] = None
    def get(): Option[DataFrame] =
      state.map { case (rows, sch) => spark.createDataFrame(rows.asJava, sch) }
    def set(df: DataFrame): Unit = state = Some((df.collect().toSeq, df.schema))
    // same bin expression as Histograms.binned — keys become (type, bin)
    // and the state merge is the cnt -> sum it was designed for
    val binned = input.toDF()
      .withColumn("bin", graft.ops.Histograms.binColumn(col("value"), 0.0, 10.0, 5))
    val q = EventPipeline.maintainAggState(binned, Seq("event_type", "bin"),
      Seq(count(lit(1)).as("cnt")), Map("cnt" -> "sum"))(get _, set _)
    val fed = scala.collection.mutable.ArrayBuffer[Event]()
    def feed(es: Event*): Unit = { fed ++= es; input.addData(es: _*); q.processAllAvailable() }
    try {
      feed(Event(1L, ts("10:00"), 1L, "click", 1.0),
        Event(2L, ts("10:01"), 2L, "click", 3.0),
        Event(3L, ts("10:02"), 3L, "view", 9.5))
      feed(Event(4L, ts("10:03"), 1L, "click", 3.4),  // same bin as 3.0
        Event(5L, ts("10:04"), 2L, "click", -2.0))    // clamps into bin 0
      feed(Event(6L, ts("10:05"), 9L, "buy", 99.0))   // clamps into bin 4
      val got = get().get.orderBy("event_type", "bin")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
      val direct = graft.ops.Histograms.binned(fed.toSeq.toDF(),
          Seq("event_type"), "value", 0.0, 10.0, 5)
        .orderBy("event_type", "bin")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
      got shouldBe direct
    } finally q.stop()
  }

  test("maintainAggState: streamed micro-batches converge to the one-shot batch aggregate") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.{DataFrame, Row}
    import org.apache.spark.sql.functions.{col, count, lit, max, min, sum}
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Event]
    // caller-owned state, MATERIALIZED per the contract (collected rows)
    var state: Option[(Seq[Row], org.apache.spark.sql.types.StructType)] = None
    def get(): Option[DataFrame] =
      state.map { case (rows, sch) => spark.createDataFrame(rows.asJava, sch) }
    def set(df: DataFrame): Unit = state = Some((df.collect().toSeq, df.schema))
    val aggs = Seq(count(lit(1)).as("n"), sum(col("value")).as("s"),
      min(col("value")).as("mn"), max(col("value")).as("mx"))
    val combine = Map("n" -> "sum", "s" -> "sum", "mn" -> "min", "mx" -> "max")
    val q = EventPipeline.maintainAggState(input.toDF(), Seq("event_type"),
      aggs, combine)(get _, set _)
    val fed = scala.collection.mutable.ArrayBuffer[Event]()
    def feed(es: Event*): Unit = { fed ++= es; input.addData(es: _*); q.processAllAvailable() }
    try {
      feed(Event(1L, ts("10:00"), 1L, "click", 2.0),
        Event(2L, ts("10:01"), 2L, "view", 5.0))
      feed(Event(3L, ts("10:02"), 1L, "click", -1.0))
      feed(Event(4L, ts("10:03"), 3L, "buy", 7.0)) // key first seen mid-stream
      val got = get().get.select("event_type", "mn", "mx", "n", "s")
        .orderBy("event_type").collect().map(_.toSeq).toSeq
      val direct = fed.toSeq.toDF()
        .groupBy("event_type").agg(aggs.head, aggs.tail: _*)
        .select("event_type", "mn", "mx", "n", "s")
        .orderBy("event_type").collect().map(_.toSeq).toSeq
      got shouldBe direct
    } finally q.stop()
  }

  test("versionedSink: each micro-batch is one table version; history time-travels") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Event]
    val t = java.nio.file.Files.createTempDirectory("graft_vsink").resolve("t").toString
    val q = EventPipeline.versionedSink(
      input.toDF().select("event_id", "event_type", "value"), t)
    try {
      input.addData(Event(1L, ts("10:00"), 1L, "click", 1.0),
        Event(2L, ts("10:01"), 2L, "view", 2.0))
      q.processAllAvailable()
      input.addData(Event(3L, ts("10:02"), 3L, "click", 3.0))
      q.processAllAvailable()
      val vt = graft.sources.VersionedTable
      vt.read(spark, t).count() shouldBe 3L
      vt.versions(spark, t).map(_._2) shouldBe Seq("append", "append")
      vt.read(spark, t, Some(1L)).count() shouldBe 2L // the first batch alone
    } finally q.stop()
  }

  test("streaming drift monitor: psiFromHistograms over maintained state equals the batch path") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.{DataFrame, Row}
    import org.apache.spark.sql.functions.{col, count, lit}
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Event]
    var state: Option[(Seq[Row], org.apache.spark.sql.types.StructType)] = None
    def get(): Option[DataFrame] =
      state.map { case (rows, sch) => spark.createDataFrame(rows.asJava, sch) }
    def set(df: DataFrame): Unit = state = Some((df.collect().toSeq, df.schema))
    val binned = input.toDF()
      .withColumn("bin", graft.ops.Histograms.binColumn(col("value"), 0.0, 10.0, 5))
    val q = EventPipeline.maintainAggState(binned, Seq("event_type", "bin"),
      Seq(count(lit(1)).as("cnt")), Map("cnt" -> "sum"))(get _, set _)
    // the reference profile the stream drifts against
    val refEvents = Seq(Event(100L, ts("09:00"), 1L, "click", 2.0),
      Event(101L, ts("09:01"), 2L, "click", 4.0),
      Event(102L, ts("09:02"), 3L, "click", 6.0))
    val refH = graft.ops.Histograms.binned(refEvents.toDF(),
      Seq("event_type"), "value", 0.0, 10.0, 5)
    val fed = scala.collection.mutable.ArrayBuffer[Event]()
    def feed(es: Event*): Unit = { fed ++= es; input.addData(es: _*); q.processAllAvailable() }
    try {
      feed(Event(1L, ts("10:00"), 1L, "click", 8.0),
        Event(2L, ts("10:01"), 2L, "click", 9.0))
      feed(Event(3L, ts("10:02"), 3L, "click", 8.5),
        Event(4L, ts("10:03"), 4L, "click", 1.0))
      // drift read off the STREAMED state == drift off the batch histogram
      val live = graft.ops.Drift.psiFromHistograms(refH, get().get,
        Seq("event_type"), 5).head()
      val batchH = graft.ops.Histograms.binned(fed.toSeq.toDF(),
        Seq("event_type"), "value", 0.0, 10.0, 5)
      val direct = graft.ops.Drift.psiFromHistograms(refH, batchH,
        Seq("event_type"), 5).head()
      live.getDouble(3) shouldBe direct.getDouble(3)
      live.getLong(2) shouldBe 4L
      live.getDouble(3) should be > 0.1 // the planted shift is visible
    } finally q.stop()
  }

  test("maintainBottomKState converges to the batch bottom-k sample, replays included") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.{DataFrame, Row}
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Event]
    var state: Option[(Seq[Row], org.apache.spark.sql.types.StructType)] = None
    def get(): Option[DataFrame] =
      state.map { case (rows, sch) => spark.createDataFrame(rows.asJava, sch) }
    def set(df: DataFrame): Unit = state = Some((df.collect().toSeq, df.schema))
    val q = EventPipeline.maintainBottomKState(input.toDF(),
      "event_type", "event_id", n = 3)(get _, set _)
    val fed = scala.collection.mutable.ArrayBuffer[Event]()
    def feed(es: Event*): Unit = { fed ++= es; input.addData(es: _*); q.processAllAvailable() }
    def ev(id: Long, t: String) = Event(id, ts("10:00"), id, t, 1.0)
    try {
      feed((1L to 10L).map(i => ev(i, if (i % 2 == 0) "click" else "view")): _*)
      feed(ev(4L, "click"), ev(11L, "click"), ev(3L, "view")) // 4 and 3 are replays
      feed((12L to 25L).map(i => ev(i, "view")): _*)
      val got = get().get.orderBy("event_type", "event_id")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      // the batch operator over every DISTINCT id fed, in one shot
      val direct = graft.ops.Sampling.bottomKSample(
          fed.toSeq.toDF().select("event_type", "event_id").distinct(),
          "event_type", "event_id", 3)
        .orderBy("event_type", "event_id")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      got shouldBe direct
      // state is bounded at k rows per stratum
      got.groupBy(_._1).values.foreach(_.size should be <= 3)
    } finally q.stop()
  }

  test("rollingZAnomalies over maintained hourly state equals the batch path (a10 twin)") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.{DataFrame, Row}
    import org.apache.spark.sql.functions.{col, count, date_trunc, lit}
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Event]
    var state: Option[(Seq[Row], org.apache.spark.sql.types.StructType)] = None
    def get(): Option[DataFrame] =
      state.map { case (rows, sch) => spark.createDataFrame(rows.asJava, sch) }
    def set(df: DataFrame): Unit = state = Some((df.collect().toSeq, df.schema))
    // maintain the hourly (event_type, h) rollup the a10 read-out scores
    val keyed = input.toDF().withColumn("h", date_trunc("hour", col("ts")))
    val q = EventPipeline.maintainAggState(keyed, Seq("event_type", "h"),
      Seq(count(lit(1)).as("n")), Map("n" -> "sum"))(get _, set _)
    val fed = scala.collection.mutable.ArrayBuffer[Event]()
    def feed(es: Event*): Unit = { fed ++= es; input.addData(es: _*); q.processAllAvailable() }
    try {
      // alternating 1/2-per-hour baseline for 9 hours (nonzero variance,
      // |z| <= 1 everywhere), then a 6-event spike in hour 9; split
      // mid-hour across batches so state merging is exercised
      var id = 0L
      def ev(hhmm: String): Event = { id += 1; Event(id, ts(hhmm), id % 3, "click", 1.0) }
      feed((0 to 8).flatMap(i =>
        ev(f"$i%02d:15") +: (if (i % 2 == 0) Seq(ev(f"$i%02d:45")) else Nil)): _*)
      feed(ev("09:01"), ev("09:10"), ev("09:20"))
      feed(ev("09:30"), ev("09:40"), ev("09:50"))
      val params = (6, 4, 1.5) // window, minHistory, zThresh — spec-sized
      def score(hourly: DataFrame): Seq[Seq[Any]] =
        EventPipeline.rollingZAnomalies(hourly, params._1, params._2, params._3)
          .orderBy("event_type", "h").collect().map(_.toSeq).toSeq
      val got = score(get().get)
      val direct = score(fed.toSeq.toDF()
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n")))
      got shouldBe direct
      got should not be empty // the spike actually scores
    } finally q.stop()
  }

  test("retentionGrid over maintained (user, day) state equals the batch path (e15 twin)") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.{DataFrame, Row}
    import org.apache.spark.sql.functions.{col, count, lit, to_date}
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Event]
    var state: Option[(Seq[Row], org.apache.spark.sql.types.StructType)] = None
    def get(): Option[DataFrame] =
      state.map { case (rows, sch) => spark.createDataFrame(rows.asJava, sch) }
    def set(df: DataFrame): Unit = state = Some((df.collect().toSeq, df.schema))
    val keyed = input.toDF().withColumn("d", to_date(col("ts")))
    val q = EventPipeline.maintainAggState(keyed, Seq("user_id", "d"),
      Seq(count(lit(1)).as("n")), Map("n" -> "sum"))(get _, set _)
    val fed = scala.collection.mutable.ArrayBuffer[Event]()
    def feed(es: Event*): Unit = { fed ++= es; input.addData(es: _*); q.processAllAvailable() }
    def at(day: Int, hhmm: String, user: Long): Event = {
      val t = java.sql.Timestamp.valueOf(f"2024-03-${10 + day}%02d $hhmm:00")
      Event(fed.size + 1L, t, user, "click", 1.0)
    }
    try {
      // cohort A (users 1,2) starts day 0; user 2 churns after day 1;
      // cohort B (user 3) starts day 1; duplicate same-day activity
      // (user 1 twice on day 0) must not double-count
      feed(at(0, "09:00", 1L), at(0, "17:30", 1L), at(0, "10:00", 2L))
      feed(at(1, "11:00", 1L), at(1, "12:00", 2L), at(1, "13:00", 3L))
      feed(at(2, "09:30", 1L), at(2, "10:30", 3L))
      def grid(activity: DataFrame): Seq[Seq[Any]] =
        EventPipeline.retentionGrid(activity, maxOffset = 7)
          .orderBy("cohort_day", "day_offset").collect().map(_.toSeq).toSeq
      val got = grid(get().get)
      val direct = grid(fed.toSeq.toDF()
        .select(col("user_id"), to_date(col("ts")).as("d")))
      got shouldBe direct
      // spot-check the semantics: cohort 03-10 has 2 users, both active
      // at offset 1, one at offset 2
      val m = got.map(r => (r(0).toString, r(1)) -> (r(2), r(3))).toMap
      m(("2024-03-10", 0L)) shouldBe ((2L, 1.0))
      m(("2024-03-10", 1L)) shouldBe ((2L, 1.0))
      m(("2024-03-10", 2L)) shouldBe ((1L, 0.5))
      m(("2024-03-11", 1L))._1 shouldBe 1L
    } finally q.stop()
  }

  test("jsonlExportSink: micro-batched export equals the batch o15 handoff; replays are no-ops") {
    import org.apache.spark.sql.functions.{col, sum}
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_jexp")
    val (pathB, manB) = (root.resolve("b").toString, root.resolve("mb").toString)
    val (pathS, manS) = (root.resolve("s").toString, root.resolve("ms").toString)
    // 30 docs, token counts varied enough that shards straddle the
    // micro-batch boundaries (the continuation is the thing under test)
    val docs = (1L to 30L).map(i => ExpDoc(i, s"doc $i", 3L + i % 7))
    graft.sources.Sinks.exportJsonlSharded(docs.toDF(), pathB, "doc_id",
      "n_tok", manifestTable = manB, tokensPerShard = 20L)
    val input = MemoryStream[ExpDoc]
    val q = EventPipeline.jsonlExportSink(input.toDF(), pathS, "doc_id",
      "n_tok", manS, tokensPerShard = 20L)
    try {
      // three in-order micro-batches (the sink's stated parity contract)
      docs.grouped(10).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
    } finally q.stop()
    def assignment(path: String): Map[Long, Long] =
      spark.read.json(path)
        .select(col("doc_id").cast("long"), col("shard").cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // identical per-document shard ids: the carried offset reproduces
    // the batch export's global running total across batch boundaries
    assignment(pathS) shouldBe assignment(pathB)
    // the accumulated manifest census (shards straddling batches sum
    // across versions) equals the batch manifest exactly
    val vt = graft.sources.VersionedTable
    def census(table: String): Map[Long, (Long, Long)] =
      vt.read(spark, table)
        .groupBy("shard").agg(sum("n_docs").as("d"), sum("n_tokens").as("t"))
        .collect().map(r => r.getAs[Long]("shard") ->
          ((r.getAs[Long]("d"), r.getAs[Long]("t")))).toMap
    census(manS) shouldBe census(manB)
    // exactly-once: a replayed batch id is rejected BEFORE any side
    // effect — no new version, no file churn
    val versionsBefore = vt.versions(spark, manS).size
    graft.sources.Sinks.exportJsonlBatch(docs.take(5).toDF(), pathS,
      "doc_id", "n_tok", manS, tokensPerShard = 20L, batchId = 0L) shouldBe None
    vt.versions(spark, manS).size shouldBe versionsBefore
  }

  test("exportJsonlBatch: an all-zero-token micro-batch is not a poison pill") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft_jz")
    val (path, man) = (root.resolve("s").toString, root.resolve("m").toString)
    // zero tokens is a legitimate micro-batch state (empty/cleaned-out
    // texts); it must export (into the current shard) and advance the
    // batch watermark, never throw forever on re-delivery
    val z = (1L to 3L).map(i => ExpDoc(i, "", 0L))
    graft.sources.Sinks.exportJsonlBatch(z.toDF(), path, "doc_id", "n_tok",
      man, tokensPerShard = 10L, batchId = 0L) shouldBe defined
    // the carried offset is still 0, so the next batch continues shard 0
    val n = Seq(ExpDoc(4L, "w", 25L))
    graft.sources.Sinks.exportJsonlBatch(n.toDF(), path, "doc_id", "n_tok",
      man, tokensPerShard = 10L, batchId = 1L) shouldBe defined
    val back = spark.read.json(path)
      .select(col("doc_id").cast("long"), col("shard").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    back(1L) shouldBe 0L
    back(4L) shouldBe 0L // prev = 0 tokens carried -> 0 div 10
    // and a third batch sees the 25-token carry: prev 25 div 10 = shard 2
    graft.sources.Sinks.exportJsonlBatch(Seq(ExpDoc(5L, "w", 1L)).toDF(),
      path, "doc_id", "n_tok", man, tokensPerShard = 10L, batchId = 2L) shouldBe defined
    spark.read.json(path).select(col("doc_id").cast("long"), col("shard").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap.apply(5L) shouldBe 2L
  }

  test("westernElectric over maintained hourly state equals the batch path (q17 twin)") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.{DataFrame, Row}
    import org.apache.spark.sql.functions.{col, count, date_trunc, lit}
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Event]
    var state: Option[(Seq[Row], org.apache.spark.sql.types.StructType)] = None
    def get(): Option[DataFrame] =
      state.map { case (rows, sch) => spark.createDataFrame(rows.asJava, sch) }
    def set(df: DataFrame): Unit = state = Some((df.collect().toSeq, df.schema))
    val keyed = input.toDF().withColumn("h", date_trunc("hour", col("ts")))
    val q = EventPipeline.maintainAggState(keyed, Seq("event_type", "h"),
      Seq(count(lit(1)).as("n")), Map("n" -> "sum"))(get _, set _)
    val fed = scala.collection.mutable.ArrayBuffer[Event]()
    def feed(es: Event*): Unit = { fed ++= es; input.addData(es: _*); q.processAllAvailable() }
    try {
      // 19 alternating 1/2-count baseline hours, then a 12-event spike
      // hour (one outlier among n = 10 caps |z| at (n-1)/sqrt(n) ~ 2.85,
      // so a shorter baseline could never trip the 3-sigma rule); the
      // spike hour is split across two micro-batches so the SPC read
      // exercises merged state, not a single batch
      var id = 0L
      def ev(hhmm: String): Event = { id += 1; Event(id, ts(hhmm), id % 3, "click", 1.0) }
      feed((0 to 18).flatMap(i =>
        ev(f"$i%02d:15") +: (if (i % 2 == 0) Seq(ev(f"$i%02d:45")) else Nil)): _*)
      feed((1 to 6).map(m => ev(f"19:$m%02d")): _*)
      feed((7 to 12).map(m => ev(f"19:$m%02d")): _*)
      def rules(hourly: DataFrame): Seq[Seq[Any]] =
        graft.ops.TimeSeries.westernElectric(hourly, "event_type", "h", "n")
          .orderBy("event_type").collect().map(_.toSeq).toSeq
      val got = rules(get().get)
      val direct = rules(fed.toSeq.toDF()
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n")))
      got shouldBe direct
      got.size shouldBe 1
      // the planted spike must trip the 3-sigma rule on the maintained state
      val r1n = got.head(4).asInstanceOf[Long]
      r1n should be >= 1L
    } finally q.stop()
  }

  test("monitoringPanel over maintained hourly state equals the batch path (q18 twin)") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.{DataFrame, Row}
    import org.apache.spark.sql.functions.{col, count, date_trunc, lit, to_timestamp}
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Event]
    var state: Option[(Seq[Row], org.apache.spark.sql.types.StructType)] = None
    def get(): Option[DataFrame] =
      state.map { case (rows, sch) => spark.createDataFrame(rows.asJava, sch) }
    def set(df: DataFrame): Unit = state = Some((df.collect().toSeq, df.schema))
    val keyed = input.toDF().withColumn("h", date_trunc("hour", col("ts")))
    val q = EventPipeline.maintainAggState(keyed, Seq("event_type", "h"),
      Seq(count(lit(1)).as("n")), Map("n" -> "sum"))(get _, set _)
    val fed = scala.collection.mutable.ArrayBuffer[Event]()
    def feed(es: Event*): Unit = { fed ++= es; input.addData(es: _*); q.processAllAvailable() }
    try {
      // the q17 twin's fixture (19 baseline hours + a split-batch spike),
      // plus a second event type so the panel's per-type legs and the
      // PSI key grid exercise more than one series
      var id = 0L
      def ev(hhmm: String, t: String): Event = { id += 1; Event(id, ts(hhmm), id % 3, t, 1.0) }
      feed((0 to 18).flatMap(i =>
        ev(f"$i%02d:15", "click") +: (if (i % 2 == 0) Seq(ev(f"$i%02d:45", "click")) else Nil)): _*)
      feed((0 to 18).map(i => ev(f"$i%02d:30", "view")): _*)
      feed((1 to 6).map(m => ev(f"19:$m%02d", "click")): _*)
      feed((7 to 12).map(m => ev(f"19:$m%02d", "click")): _*)
      // PSI cut mid-series so ref/cur are both populated; tiny bins so
      // the count distribution actually spreads across them
      val cut = to_timestamp(lit("2024-01-01 10:00:00"))
      def panel(hourly: DataFrame): Seq[Seq[Any]] =
        EventPipeline.monitoringPanel(hourly, cut, psiLo = 0.0, psiHi = 15.0, psiBins = 5)
          .orderBy("event_type", "check_name").collect().map(_.toSeq).toSeq
      val got = panel(get().get)
      val direct = panel(fed.toSeq.toDF()
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n")))
      got shouldBe direct
      // 2 types x 7 checks
      got.size shouldBe 14
      val byKey = got.map(r => (r(0), r(1)) -> r(2)).toMap
      // the spike hour trips the WE 3-sigma rule on the maintained state
      byKey(("click", "we_r1")).asInstanceOf[Double] should be >= 1.0
      // the steady view series alarms nothing
      byKey(("view", "we_r1")) shouldBe 0.0
      byKey(("view", "z_anomalies")) shouldBe 0.0
      // every check emits exactly once per type
      got.map(r => (r(0), r(1))).distinct.size shouldBe 14
    } finally q.stop()
  }
}

// top-level: Spark encoders cannot be generated for classes nested in a
// test suite instance
case class ExpDoc(doc_id: Long, text: String, n_tok: Long)
