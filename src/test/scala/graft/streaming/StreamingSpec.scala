package graft.streaming

import graft.SparkSpec
import graft.ext.Sessionize
import graft.queries.Registry.events

/** Structured Streaming twins vs their batch counterparts, driven through
  * the real incremental planner (file source → memory sink,
  * `processAllAvailable`). */
class StreamingSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  /** FileStreamSource wants a directory of event files; stage the single
    * harness parquet into one. */
  private lazy val eventsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"), d.resolve("events.parquet"))
    d.toString
  }

  test("streaming tumbling counts == batch tumbling counts") {
    val stream = StreamingOps.readEvents(spark, eventsDir)
    val q = StreamingOps.tumblingCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(300000), "stream did not finish in 5 min")
      val got = spark.table("tumbling_out")
        .orderBy("window_start", "event_type").collect().toSeq
      val want = Sessionize.tumbling(events(spark, dir)).collect().toSeq
      assert(got == want)
    } finally q.stop()
  }

  test("streaming dedup drops re-delivered events (at-least-once ingest)") {
    // stage the same file twice = every event delivered twice
    val d = java.nio.file.Files.createTempDirectory("graft_events_dup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"), d.resolve("events_a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"), d.resolve("events_b.parquet"))
    val q = StreamingOps.dedupStream(StreamingOps.readEvents(spark, d.toString))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(300000), "stream did not finish in 5 min")
      val got = spark.table("dedup_out").count()
      val want = events(spark, dir).count()
      assert(got == want, s"deduped stream rows $got != original $want")
    } finally q.stop()
  }

  test("foreachBatch sink: streaming aggregation lands as parquet") {
    val out = java.nio.file.Files.createTempDirectory("graft_fb").resolve("agg").toString
    val stream = StreamingOps.readEvents(spark, eventsDir)
    val q = StreamingOps.tumblingCounts(stream)
      .writeStream.outputMode("complete")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("overwrite").parquet(out)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(300000))
      val landed = spark.read.parquet(out)
      val want = Sessionize.tumbling(events(spark, dir)).count()
      assert(landed.count() == want)
    } finally q.stop()
  }

  test("stream-stream interval join == batch range join pairs") {
    val stream = StreamingOps.readEvents(spark, eventsDir)
    val q = StreamingOps.followUpsStream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("followups_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(300000), "stream did not finish in 5 min")
      val got = spark.table("followups_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch twin: same pairs before aggregation
      import org.apache.spark.sql.functions._
      val ev = events(spark, dir)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"), unix_micros(col("ts")).as("p_us"))
      val e = ev.select(col("user_id"), col("event_id").as("f_id"), unix_micros(col("ts")).as("f_us"))
      val want = p.join(e, Seq("user_id"))
        .filter(col("f_us") > col("p_us") && col("f_us") <= col("p_us") + lit(300000000L))
        .select("p_id", "f_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"stream ${got.size} pairs vs batch ${want.size}")
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER interval join: matches == batch, null-padding only for unmatched") {
    val stream = StreamingOps.readEvents(spark, eventsDir)
    val q = StreamingOps.followUpsStreamOuter(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("followups_outer_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(300000), "stream did not finish in 5 min")
      val got = spark.table("followups_outer_out")
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      // batch truth over the same (non-purchase follow-up) pair universe
      import org.apache.spark.sql.functions._
      val ev = events(spark, dir)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"), unix_micros(col("ts")).as("p_us"))
      val e = ev.filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("event_id").as("f_id"), unix_micros(col("ts")).as("f_us"))
      val wantMatched = p.join(e, Seq("user_id"))
        .filter(col("f_us") > col("p_us") && col("f_us") <= col("p_us") + lit(300000000L))
        .select("p_id", "f_id")
        .collect().map(r => (r.getLong(0), Some(r.getLong(1)))).toSet
      val matchedGot = got.filter(_._2.isDefined).toSet
      assert(matchedGot == wantMatched,
        s"matched pairs drifted: stream ${matchedGot.size} vs batch ${wantMatched.size}")
      // every null-padded emission must be for a purchase with NO batch match
      val matchedPids = wantMatched.map(_._1)
      val padded = got.filter(_._2.isEmpty).map(_._1)
      assert(padded.forall(pid => !matchedPids.contains(pid)),
        "null-padded row emitted for a purchase that has a match")
      // and no purchase may appear both padded and matched in the stream output
      assert(padded.toSet.intersect(matchedGot.map(_._1)).isEmpty)
    } finally q.stop()
  }

  test("native session_window == batch sessionize (modulo final-watermark sessions)") {
    val stream = StreamingOps.readEvents(spark, eventsDir)
    val q = StreamingOps.sessionWindowStream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("session_window_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(300000), "stream did not finish in 5 min")
      val got = spark.table("session_window_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
      val batch = Sessionize.sessionize(events(spark, dir)).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSeq
      // append mode: sessions are only emitted once the watermark passes
      // them; the sessions still open at the final watermark may be held
      // back, same tolerance as the stateful twin below
      val nUsers = batch.map(_._1).distinct.size
      assert(got.size >= batch.size - nUsers && got.size <= batch.size,
        s"expected between ${batch.size - nUsers} and ${batch.size} sessions, got ${got.size}")
      val batchSet = batch.toSet
      assert(got.forall(batchSet.contains),
        "session_window produced a session absent from the batch result")
    } finally q.stop()
  }

  test("stateful and native sessionizers agree on every closed session") {
    val stream1 = StreamingOps.readEvents(spark, eventsDir)
    val stream2 = StreamingOps.readEvents(spark, eventsDir)
    def run(name: String, df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double, Double)] = {
      val q = df.writeStream.outputMode("append")
        .format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try {
        assert(q.awaitTermination(300000), s"$name did not finish in 5 min")
        spark.table(name)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
      } finally q.stop()
    }
    val stateful = run("sess_fmgws", StreamingOps.sessionizeStream(stream1))
    val native = run("sess_native", StreamingOps.sessionWindowStream(stream2))
    // both are subsets of the same batch truth; where both emitted a
    // session for the same (user, start), the rows must be identical —
    // equality of the intersection keys catches any semantic drift
    val statefulKeys = stateful.map(t => (t._1, t._2))
    val shared = native.filter(t => statefulKeys.contains((t._1, t._2)))
    assert(shared.subsetOf(stateful),
      "native and stateful sessionizers disagree on a shared session")
    assert(shared.nonEmpty, "no overlap between the two sessionizers' output")
  }

  test("streaming sessionize closes every session except each user's last") {
    val stream = StreamingOps.readEvents(spark, eventsDir)
    val q = StreamingOps.sessionizeStream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(300000), "stream did not finish in 5 min")
      val got = spark.table("sessions_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
      val batch = Sessionize.sessionize(events(spark, dir)).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSeq
      // Every session closed by an observed gap must emit; sessions whose
      // close relies on the final watermark may or may not flush before the
      // AvailableNow query terminates, so allow [batch-nUsers, batch].
      val nUsers = batch.map(_._1).distinct.size
      assert(got.size >= batch.size - nUsers && got.size <= batch.size,
        s"expected between ${batch.size - nUsers} and ${batch.size} closed sessions, got ${got.size}")
      val batchSet = batch.toSet
      assert(got.forall(batchSet.contains), "streaming session not present in batch result")
    } finally q.stop()
  }
}
