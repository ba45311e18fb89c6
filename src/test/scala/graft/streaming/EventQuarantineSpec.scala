package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the b55 event ingest-quarantine contract in CI (the fuzz loop's
  * DuckDB half isn't on the sbt classpath), the events twin of the
  * embeddings QuarantineSpec: a corpus poisoned with NULL event-time
  * rows must (a) classify exactly, (b) produce the CLEAN corpus's
  * results bit-for-bit through every batch AND stream consumer — i.e.
  * stream == batch on the poisoned corpus, the r16 §7m parity gap —
  * and (c) never throw. (c) is the load-bearing one: before the
  * contract, one null-ts row NOT_NULL_ASSERT-crashed d3's typed `Ev`
  * encoder (a single poisoned row killing a corpus-wide job), d1's
  * watermarked agg silently dropped rows its batch oracle kept, and
  * b5/b17 emitted NULL session bounds. A revert of `Tables.events` /
  * the `eventsStream` filter fails this spec, not a fuzz run someone
  * has to remember.
  */
class EventQuarantineSpec extends SparkTestBase {

  /** Stage a single-file events table (the driver testdata layout —
    * `stageTableDir` REQUIRES one regular file).
    */
  private def writeEvents(dir: java.nio.file.Path, rows: Seq[
      (Long, java.lang.Long, java.lang.Long, String, java.lang.Double, String)]): String = {
    import spark.implicits._
    val df = rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    val tmp = java.nio.file.Files.createTempDirectory("evq-stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .find(p => p.getFileName.toString.startsWith("part-") &&
        p.getFileName.toString.endsWith(".parquet")).get
    java.nio.file.Files.move(part, dir.resolve("events.parquet"))
    dir.toString
  }

  private val base = 1704067200000000L // 2024-01-01 UTC, the corpus epoch
  private val Min = 60000000L

  /** 3 users, multiple >30-min session gaps, several hour windows —
    * enough structure that b5/b17/b6/d1/d3 all produce non-trivial
    * output (a no-op poison over trivial output proves nothing).
    */
  private val cleanRows: Seq[(Long, java.lang.Long, Long, String, Double, String)] =
    (0 until 36).map { i =>
      val user = (i % 3).toLong
      // 12 events per user: 4 bursts of 3 (1-min spacing in-burst, 38+
      // min between bursts — over the 30-min gap, so d3 closes 3
      // sessions per user and actually emits rows)
      val j = i / 3
      val us = base + user * 17 * Min + (j / 3) * 40 * Min + (j % 3) * Min
      val etype = Seq("view", "click", "error", "purchase")(i % 4)
      (i.toLong, java.lang.Long.valueOf(us), user, etype,
        (i % 7) * 10.5, s"""{"k": $i}""")
    }

  // all four b55 defect classes: 3 null-ts rows plus (valid-ts) one
  // null-user, one null-type and one null-value row — the late-r17
  // full-shape extension (the follow-up probe proved the latter three
  // crash the typed folds exactly like null-ts did)
  private lazy val poisonRows: Seq[(Long, java.lang.Long, java.lang.Long,
      String, java.lang.Double, String)] =
    box(cleanRows) ++ Seq(
      (900L, null: java.lang.Long, java.lang.Long.valueOf(1L), "click",
        java.lang.Double.valueOf(5.0), "{}"),
      (901L, null: java.lang.Long, java.lang.Long.valueOf(2L), "error",
        java.lang.Double.valueOf(6.0), "{}"),
      (902L, null: java.lang.Long, java.lang.Long.valueOf(0L), "view",
        java.lang.Double.valueOf(7.0), "{}"),
      (903L, java.lang.Long.valueOf(base), null, "click",
        java.lang.Double.valueOf(8.0), "{}"),
      (904L, java.lang.Long.valueOf(base), java.lang.Long.valueOf(1L), null,
        java.lang.Double.valueOf(9.0), "{}"),
      (905L, java.lang.Long.valueOf(base), java.lang.Long.valueOf(2L), "error",
        null, "{}"))

  private def box(rows: Seq[(Long, java.lang.Long, Long, String, Double, String)]) =
    rows.map { case (id, us, u, t, v, p) =>
      (id, us, java.lang.Long.valueOf(u), t, java.lang.Double.valueOf(v), p)
    }

  private lazy val cleanDir =
    writeEvents(java.nio.file.Files.createTempDirectory("evq-clean"), box(cleanRows))
  private lazy val poisonDir =
    writeEvents(java.nio.file.Files.createTempDirectory("evq-poison"), poisonRows)
  /** EVERY row quarantined — the empty-view edge the d28/d30/d33
    * staging scalars must survive (the c115 rule).
    */
  private lazy val allNullDir =
    writeEvents(java.nio.file.Files.createTempDirectory("evq-allnull"),
      box(Seq((1L, null, 1L, "click", 1.0, "{}"), (2L, null, 2L, "error", 2.0, "{}"))))

  test("b55 classifies every defect class exactly, with min-id witnesses") {
    val got = graft.relational.Queries.b55EventQuarantine(spark, poisonDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("null_ts", 3L, 900L), ("null_type", 1L, 904L),
      ("null_user", 1L, 903L), ("null_value", 1L, 905L), ("ok", 36L, 0L)))
  }

  test("quarantined view == clean corpus; poison is a no-op, batch and stream") {
    assert(graft.Tables.events(spark, poisonDir).count() == 36L)
    // the four keys the r16 probe proved broken, through the PUBLIC
    // entry surface: b5 (NULL bounds), b17 (hash mismatch), d1 (stream
    // silently dropped what batch kept), d3 (typed-encoder crash) — and
    // b6, d1's batch twin, pinning stream == batch == clean three ways
    // b5/b17/b6/d1/d3: the r16 null-ts probe's casualties; b49/d23/d12:
    // the r17 full-shape probe's (null user/value crashed or diverged
    // them through the other typed folds)
    for (key <- Seq("b5_event_sessions", "b17_session_window",
        "b6_event_windowed", "d1_stream_windowed", "d3_stream_sessions",
        "b49_nearest_event", "d23_stream_scd2", "d12_stream_funnel")) {
      val q = graft.SparkEntry.queries(key)
      val a = q(spark.newSession(), poisonDir).collect().map(_.toString).toSeq
      val b = q(spark.newSession(), cleanDir).collect().map(_.toString).toSeq
      assert(a.nonEmpty, s"$key produced no rows — the pin is vacuous")
      assert(a == b, s"$key diverges between poisoned and clean corpora")
    }
  }

  test("fully-quarantined corpus: replay staging returns empty, never NPEs") {
    // d30/d33 anchor sentinel watermarks on max event time, d28 cuts on
    // max event_id — all three head() scalars are NULL over the empty
    // quarantined view and previously would have NPE'd
    for (key <- Seq("d30_stream_outer_join", "d33_stream_timeout_alert",
        "d28_stream_merge_upsert")) {
      val out: DataFrame = graft.SparkEntry.queries(key)(spark.newSession(), allNullDir)
      assert(out.count() == 0L, s"$key must be empty on an all-quarantined corpus")
    }
  }

  test("d40: fully-quarantined embeddings return empty, never NPE") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evq-emb")
    val df = Seq((0L, 0), (1L, 1)).toDF("vec_id", "label")
      .select(col("vec_id"),
        array(lit(Float.NaN), lit(Float.NaN)).as("embedding"), col("label"))
    val tmp = java.nio.file.Files.createTempDirectory("evq-emb-stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .find(p => p.getFileName.toString.startsWith("part-") &&
        p.getFileName.toString.endsWith(".parquet")).get
    java.nio.file.Files.move(part, dir.resolve("embeddings.parquet"))
    val out = graft.SparkEntry.queries("d40_stream_sem_screen")(
      spark.newSession(), dir.toString)
    assert(out.count() == 0L)
  }
}
