package graft

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the c140 (documents) and b56 (orders) ingest-quarantine
  * contracts in CI, completing the family (embeddings → embed.
  * QuarantineSpec, events → streaming.EventQuarantineSpec): a corpus
  * poisoned with NULL-identity documents / NULL-date orders must
  * (a) classify exactly and (b) produce the CLEAN corpus's results
  * bit-for-bit through the keys the r17 probe proved broken — the
  * typed-encoder crash class (c12 DocBin, d17 PackDoc), the silently
  * hash-diverging tokenizer/dedup/pack class (c96/c27/c1), and the
  * NULL-date window class (b29/b34/b38). A revert of
  * `Tables.documents`/`Tables.orders`/the docsStream filter — or of
  * the oracle-side CTE injection — fails here, not in a fuzz run.
  */
class QuarantineContractsSpec extends SparkTestBase {

  /** Single-file table write (driver layout; stageTableDir requires it). */
  private def writeTable(dir: java.nio.file.Path, name: String,
      df: org.apache.spark.sql.DataFrame): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("qc-stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .find(p => p.getFileName.toString.startsWith("part-") &&
        p.getFileName.toString.endsWith(".parquet")).get
    java.nio.file.Files.move(part, dir.resolve(s"$name.parquet")): Unit
  }

  // repetition-rich text (the c96 family sample-learns 8 BPE merges and
  // fails loudly on a pair-poor corpus — same contract as fuzz seed 0)
  private def docText(i: Int) =
    "spark stream spark stream merge sort merge sort window batch " +
      s"window batch filter join filter join doc unique token nr$i"

  private def docsDf(poisoned: Boolean) = {
    import spark.implicits._
    val clean = (0 until 20).map { i =>
      (java.lang.Long.valueOf(i.toLong), docText(i),
        Seq("en", "fr", "de")(i % 3), s"src${i % 4}",
        java.lang.Long.valueOf(docText(i).length.toLong))
    }
    val bad = if (!poisoned) Nil else Seq(
      (null: java.lang.Long, docText(900), "en", "src1",
        java.lang.Long.valueOf(docText(900).length.toLong)),
      (null: java.lang.Long, docText(901), "fr", null,
        java.lang.Long.valueOf(docText(901).length.toLong)))
    (clean ++ bad).toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def ordersDf(poisoned: Boolean) = {
    import spark.implicits._
    val day = 86400000000L
    val base = 788918400000000L // 1995-01-01 UTC
    val clean = (1 to 24).map { i =>
      // 8 customers, dates spanning ~18 months with per-customer gaps
      // (streak + cohort + MoM structure)
      val us = base + ((i * 37) % 540).toLong * day
      (i.toLong, (1 + i % 8).toLong, Seq("P", "O", "F")(i % 3),
        100.0 + i * 11.25, java.lang.Long.valueOf(us),
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM")(i % 3))
    }
    val bad = if (!poisoned) Nil else Seq(
      (9001L, 1L, "O", 123.45, null: java.lang.Long, "1-URGENT"),
      (9002L, 2L, "F", 55555.55, null: java.lang.Long, "3-MEDIUM"))
    (clean ++ bad)
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "us", "o_orderpriority")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("o_orderdate"),
        col("o_orderpriority"))
  }

  private def mkDir(poisoned: Boolean): String = {
    val dir = java.nio.file.Files.createTempDirectory(
      if (poisoned) "qc-poison" else "qc-clean")
    writeTable(dir, "documents", docsDf(poisoned))
    writeTable(dir, "orders", ordersDf(poisoned))
    dir.toString
  }

  private lazy val cleanDir = mkDir(poisoned = false)
  private lazy val poisonDir = mkDir(poisoned = true)

  test("c140 classifies every defect class exactly") {
    val got = graft.text.TextQueries.c140DocQuarantine(spark, poisonDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("null_doc_id", 2L), ("ok", 20L)))
  }

  test("b56 classifies every defect class exactly, with min-key witnesses") {
    val got = graft.relational.Queries.b56OrderQuarantine(spark, poisonDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("null_date", 2L, 9001L), ("ok", 24L, 1L)))
  }

  test("NULL-id documents are a no-op through crash, dedup and pack classes") {
    assert(Tables.documents(spark, poisonDir).count() == 20L)
    for (key <- Seq("c1_dedup_exact", "c27_doc_pack", "c96_bpe_segment",
        "c12_multimodal_meta", "d17_stream_pack")) {
      val q = SparkEntry.queries(key)
      val a = q(spark.newSession(), poisonDir).collect().map(_.toString).toSeq
      val b = q(spark.newSession(), cleanDir).collect().map(_.toString).toSeq
      assert(a.nonEmpty, s"$key produced no rows — the pin is vacuous")
      assert(a == b, s"$key diverges between poisoned and clean corpora")
    }
  }

  test("NULL-date orders are a no-op through the date-window class") {
    assert(Tables.orders(spark, poisonDir).count() == 24L)
    for (key <- Seq("b29_order_streaks", "b34_cumulative_distinct",
        "b38_mom_growth")) {
      val q = SparkEntry.queries(key)
      val a = q(spark.newSession(), poisonDir).collect().map(_.toString).toSeq
      val b = q(spark.newSession(), cleanDir).collect().map(_.toString).toSeq
      assert(a.nonEmpty, s"$key produced no rows — the pin is vacuous")
      assert(a == b, s"$key diverges between poisoned and clean corpora")
    }
  }

  test("c141 reports identity collisions exactly, clean corpus attests copies=1") {
    // duplicate doc_ids are a PRECONDITION violation, not a quarantined
    // class (per-read uniqueness = a count-window shuffle on every scan
    // at 100 TB — Tables.documents scaladoc); c141 is the detector.
    val dir = java.nio.file.Files.createTempDirectory("qc-dup")
    import spark.implicits._
    val dup = (0 until 20).map(i => (i.toLong, docText(i), "en", "src0",
        docText(i).length.toLong)) ++
      Seq(3L, 3L, 7L).map(id => (id, docText(id.toInt + 500), "fr", "src1",
        docText(id.toInt + 500).length.toLong))
    writeTable(dir, "documents",
      dup.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = graft.text.TextQueries.c141DocCollisions(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 18L, 0L), (2L, 1L, 7L), (3L, 1L, 3L)))
    val clean = graft.text.TextQueries.c141DocCollisions(spark, cleanDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(clean == Seq((1L, 20L)))
  }

  test("b57 classifies every props-quality class exactly, quarantined rows excluded") {
    // props is the DIRTY-BY-DESIGN domain: b57 classifies (never
    // quarantines) payloads of the b55-quarantined VIEW by how far
    // they get through b7's StrictJson extraction pipeline.
    val dir = java.nio.file.Files.createTempDirectory("qc-props")
    import spark.implicits._
    val base = 1704067200000000L // 2024-01-01 UTC
    val rows = Seq(
      (1L, null: String),                        // null_props
      (2L, "{"),                                 // invalid: truncated
      (3L, """{"k": 3} trailing"""),             // invalid: trailing garbage
      (4L, "{}"),                                // no_scalar_k: absent
      (5L, """{"k": null}"""),                   // no_scalar_k: JSON null
      (6L, """{"k": [1, 2]}"""),                 // no_scalar_k: composite
      (7L, "12"),                                // no_scalar_k: non-object root
      (8L, """{"k": 7}"""),                      // k_castable
      (9L, """{"k": "08"}"""),                   // k_castable: string integral
      (10L, """{"k": 5.5}"""),                   // k_other: float
      (11L, """{"k": "x"}"""),                   // k_other: string
      (12L, """{"k": 99999999999999999999}""")   // k_other: overflow
    ).map { case (id, p) =>
      (id, java.lang.Long.valueOf(base + id * 1000000L), 1L, "click", 1.0, p)
    } :+ ((99L, null: java.lang.Long, 1L, "click", 1.0,
      """{"k": 1}""")) // b55-quarantined (null ts): must NOT be classified
    writeTable(dir, "events", rows
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props")))
    val got = graft.relational.Queries.b57PropsQuality(spark, dir.toString)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("invalid", 2L, 2L), ("k_castable", 2L, 8L), ("k_other", 3L, 10L),
      ("no_scalar_k", 4L, 4L), ("null_props", 1L, 1L)))
  }

  test("a variant quarantine-CTE paste fails at injection time") {
    // a whitespace/case variant of the canonical CTE text would be
    // double-defined by injection and only fail at DuckDB runtime —
    // the injector must reject it loudly instead
    val variant = "WITH fdoc AS ( SELECT * FROM documents WHERE doc_id IS NOT NULL ) SELECT * FROM fdoc"
    val e = intercept[IllegalArgumentException](
      SparkEntry.injectQuarantineCtes(variant))
    assert(e.getMessage.contains("variant of quarantine CTE 'fdoc'"),
      s"wrong failure: ${e.getMessage}")
  }

  test("oracle CTE injection covers the three statement shapes") {
    val cte = Tables.fdocCte
    assert(SparkEntry.injectQuarantineCtes("SELECT * FROM fdoc") ==
      s"WITH $cte\nSELECT * FROM fdoc")
    assert(SparkEntry.injectQuarantineCtes("WITH x AS (SELECT 1) SELECT * FROM fdoc, x") ==
      s"WITH $cte,\nx AS (SELECT 1) SELECT * FROM fdoc, x")
    assert(SparkEntry.injectQuarantineCtes(
      "WITH RECURSIVE r AS (SELECT 1) SELECT * FROM fdoc, r") ==
      s"WITH RECURSIVE $cte,\nr AS (SELECT 1) SELECT * FROM fdoc, r")
    // already-defined and unreferenced views are left alone
    assert(SparkEntry.injectQuarantineCtes(s"WITH $cte SELECT * FROM fdoc") ==
      s"WITH $cte SELECT * FROM fdoc")
    assert(SparkEntry.injectQuarantineCtes("SELECT 1") == "SELECT 1")
  }
}
