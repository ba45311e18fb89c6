package graft.embed

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the c139 vector ingest-quarantine contract in CI (the fuzz
  * loop's DuckDB half isn't on the sbt classpath): a corpus poisoned
  * with every defect class must (a) classify exactly, (b) quantize to
  * the CLEAN corpus's results under the quarantined view — i.e. the
  * poison is a no-op for every downstream consumer — and (c) never
  * throw. (c) is the load-bearing one: before `qMicroTotal`, Catalyst's
  * Generate-inferred `size(transform(...))>0` predicate merged into the
  * quarantine Filter and subexpression elimination ran the ANSI cast on
  * PRE-filter rows — one Inf component CAST_OVERFLOWed the whole job
  * straight past the guard. A revert of that fix fails this spec, not
  * a fuzz run someone has to remember.
  */
class QuarantineSpec extends SparkTestBase {

  private def writeEmb(dir: java.nio.file.Path, poisoned: Boolean): String = {
    import spark.implicits._
    val dim = 8
    def vec(seed: Int): Array[Float] =
      Array.tabulate(dim)(j => ((seed * 31 + j * 17) % 97) / 10.0f - 4.0f)
    val clean = (0L until 30L).map(i => (i, vec(i.toInt), (i % 3).toInt))
    val cleanDf = clean.toDF("vec_id", "embedding", "label")
    val df =
      if (!poisoned) cleanDf
      else {
        val nan = vec(1); nan(3) = Float.NaN
        val allNan = Array.fill(dim)(Float.NaN)
        val pinf = vec(2); pinf(0) = Float.PositiveInfinity
        val ninf = vec(3); ninf(7) = Float.NegativeInfinity
        val bad = Seq((100L, allNan, 0), (101L, nan, 1), (102L, pinf, 2), (103L, ninf, 0))
          .toDF("vec_id", "embedding", "label")
        // a NULL vector and a NULL-ELEMENT vector (the forall-vs-
        // list_filter engine split) need SQL-built arrays
        val nulls = Seq((104L, 0), (105L, 1)).toDF("vec_id", "label")
          .select(col("vec_id"),
            when(col("vec_id") === 104L, lit(null).cast("array<float>"))
              .otherwise(array((lit(null).cast("float") +:
                (1 until dim).map(j => lit(j.toFloat))): _*)).as("embedding"),
            col("label"))
        cleanDf.unionByName(bad.select("vec_id", "embedding", "label"))
          .unionByName(nulls.select("vec_id", "embedding", "label"))
      }
    // single-file layout, same contract as the driver testdata
    val tmp = java.nio.file.Files.createTempDirectory("quar-stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .find(p => p.getFileName.toString.startsWith("part-") &&
        p.getFileName.toString.endsWith(".parquet")).get
    java.nio.file.Files.move(part, dir.resolve("embeddings.parquet"))
    dir.toString
  }

  private lazy val poisonDir =
    writeEmb(java.nio.file.Files.createTempDirectory("quar-poison"), poisoned = true)
  private lazy val cleanDir =
    writeEmb(java.nio.file.Files.createTempDirectory("quar-clean"), poisoned = false)

  test("c139 classifies every defect class exactly, with min-id witnesses") {
    val got = EmbedQueries.c139VectorQuarantine(spark, poisonDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("has_inf", 2L, 102L), ("has_nan", 2L, 100L), ("has_null", 1L, 105L),
      ("null_vec", 1L, 104L), ("ok", 30L, 0L)))
  }

  test("quarantined view == clean corpus; poison is a no-op downstream") {
    val v = EmbedQueries.vectors(spark, poisonDir)
    assert(v.count() == 30L)
    assert(v.filter(col("vec_id") >= 100L).count() == 0L)
    // downstream equivalence: the poisoned corpus must produce the
    // clean corpus's results bit-for-bit (c112 drives covMoments + the
    // power fold; c50 the kmeans assignment; both were CAST_OVERFLOW
    // casualties before the contract)
    for (key <- Seq("c112_pca_power", "c50_kmeans_assign", "c115_kcenter")) {
      val q = EmbedQueries.queries(key)
      val a = q(spark, poisonDir).collect().map(_.toString).toSeq
      val b = q(spark, cleanDir).collect().map(_.toString).toSeq
      assert(a == b, s"$key diverges between poisoned and clean corpora")
    }
  }
}
