package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

class SessionizeSpec extends SparkSpec {
  import Sessionize._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("gap sessionization closes sessions as the watermark advances") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val sessions = sessionize(
      input.toDS().withWatermark("ts", "0 seconds").as[Ev],
      gapMs = 10 * 60 * 1000) // 10-minute gap

    val q = sessions.writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("sessions_out")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // user 1: two events 5 min apart (one session), then 30 min silence
      input.addData(
        Ev(1L, ts("2024-06-01 00:00:00"), "click"),
        Ev(1L, ts("2024-06-01 00:05:00"), "view"))
      q.processAllAvailable()
      // advancing event for user 2 pushes the watermark past user 1's gap
      input.addData(Ev(2L, ts("2024-06-01 01:00:00"), "click"))
      q.processAllAvailable()
      input.addData(Ev(2L, ts("2024-06-01 03:00:00"), "click"))
      q.processAllAvailable()

      val out = spark.table("sessions_out").as[Session].collect()
      val u1 = out.filter(_.user_id == 1L)
      assert(u1.length === 1)
      assert(u1.head.n_events === 2L)
      assert(u1.head.session_start === ts("2024-06-01 00:00:00"))
      assert(u1.head.session_end === ts("2024-06-01 00:05:00"))
    } finally q.stop()
  }

  test("streaming sessions equal the batch twin on the same events (differential)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // users 1..3 with varied gaps; user 99 only advances the watermark so
    // every real session closes
    val evs = Seq(
      Ev(1L, ts("2024-06-01 00:00:00"), "a"), Ev(1L, ts("2024-06-01 00:04:00"), "b"),
      Ev(1L, ts("2024-06-01 00:30:00"), "c"), Ev(1L, ts("2024-06-01 00:31:00"), "d"),
      Ev(2L, ts("2024-06-01 01:00:00"), "a"),
      Ev(3L, ts("2024-06-01 00:00:00"), "a"), Ev(3L, ts("2024-06-01 00:09:00"), "b"),
      Ev(3L, ts("2024-06-01 00:18:00"), "c"))
    val input = MemoryStream[Ev]
    val q = sessionize(input.toDS().withWatermark("ts", "0 seconds").as[Ev],
        gapMs = 10 * 60 * 1000)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sessions_diff")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(evs: _*)
      q.processAllAvailable()
      input.addData(Ev(99L, ts("2024-06-02 00:00:00"), "advance"))
      q.processAllAvailable()
      input.addData(Ev(99L, ts("2024-06-03 00:00:00"), "advance"))
      q.processAllAvailable()
      val streamed = spark.table("sessions_diff").as[Session].collect()
        .filter(_.user_id != 99L)
        .map(s => (s.user_id, s.session_start, s.session_end, s.n_events)).toSet
      val batch = Sessionize.batch(evs.toDF(), "user_id", "ts", gapMinutes = 10)
        .select($"user_id", $"session_start", $"session_end", $"n_events")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSet
      assert(streamed === batch)
      assert(batch.size === 4) // u1: 2 sessions; u2: 1; u3: 1 (chained 9-min gaps)
    } finally q.stop()
  }

  test("batch sessionization invariants hold on a randomized event set (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val base = ts("2024-06-01 00:00:00").getTime
    val evs = (1 to 500).map { i =>
      Ev(rnd.nextInt(8).toLong, new java.sql.Timestamp(base + rnd.nextInt(6 * 3600) * 1000L), s"e$i")
    }
    val gapMin = 10
    val out = Sessionize.batch(evs.toDF(), "user_id", "ts", gapMin)
      .select($"user_id", $"session_start", $"session_end", $"n_events")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect()
    // conservation: every event lands in exactly one session
    assert(out.map(_._4).sum === evs.length)
    out.foreach { case (_, s, e, _) => assert(!e.before(s)) }
    // per user: sessions ordered, separated by more than the gap, and every
    // event inside some session's span
    out.groupBy(_._1).foreach { case (u, sessions) =>
      val sorted = sessions.sortBy(_._2.getTime)
      sorted.sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) =>
          assert(s2.getTime - e1.getTime > gapMin * 60 * 1000L,
            s"user $u: adjacent sessions closer than the gap")
        case _ =>
      }
      val userEvents = evs.filter(_.user_id == u)
      userEvents.foreach { ev =>
        assert(sorted.exists(s => !ev.ts.before(s._2) && !ev.ts.after(s._3)),
          s"event ${ev.ts} of user $u outside all sessions")
      }
    }
  }

  test("late within-watermark event earlier than the open session lowers session_start") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val sessions = sessionize(
      input.toDS().withWatermark("ts", "1 hour").as[Ev],
      gapMs = 10 * 60 * 1000)
    val q = sessions.writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("sessions_late")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      input.addData(
        Ev(1L, ts("2024-06-01 00:10:00"), "click"),
        Ev(1L, ts("2024-06-01 00:12:00"), "view"))
      q.processAllAvailable()
      // late but within the 1h watermark: precedes the open session's start
      input.addData(Ev(1L, ts("2024-06-01 00:05:00"), "late"))
      q.processAllAvailable()
      // two advancing batches close user 1's session via event-time timeout
      input.addData(Ev(2L, ts("2024-06-01 02:00:00"), "click"))
      q.processAllAvailable()
      input.addData(Ev(2L, ts("2024-06-01 04:00:00"), "click"))
      q.processAllAvailable()
      val u1 = spark.table("sessions_late").as[Session].collect().filter(_.user_id == 1L)
      assert(u1.length === 1)
      assert(u1.head.n_events === 3L)
      assert(u1.head.session_start === ts("2024-06-01 00:05:00"))
      assert(u1.head.session_end === ts("2024-06-01 00:12:00"))
    } finally q.stop()
  }
}
