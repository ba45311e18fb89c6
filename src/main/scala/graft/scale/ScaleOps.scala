package graft.scale

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale techniques as reusable operators (SURVEY.md §6): skew-salted
  * joins and bucketed co-located storage. These are the knobs a 100 TB
  * deployment reaches for when AQE alone isn't enough — packaged here so
  * pipelines use one audited implementation instead of ad-hoc copies.
  */
object ScaleOps {

  /** Equi-join `fact ⋈ dim` on `key`, salted against a skewed fact:
    * the fact side gets a uniform salt in [0, buckets); the dim side is
    * exploded `buckets`-fold so every (key, salt) pair finds its match.
    * Result is row-identical to the plain join, but a hot key's rows now
    * spread over `buckets` reducers instead of one straggler.
    *
    * Use when ONE side is small enough to replicate `buckets`× but too
    * big to broadcast outright, and the fact's key histogram is spiky
    * (AQE skew-join handles sort-merge spills; salting fixes hash-agg
    * and storage-partition skew too). The salt is derived from fact
    * columns (hash), not rand(), so the plan stays deterministic.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, buckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // right/full outer would emit every unmatched dim row `buckets`
    // times (the dim side is exploded); fact-preserving join types only
    val factPreserving = Set("inner", "cross", "left", "leftouter", "left_outer",
      "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti")
    require(factPreserving.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports fact-preserving join types only, got '$joinType' " +
        "(right/full outer would duplicate unmatched dim rows across salt buckets)")
    val salted = fact.withColumn("__salt", pmod(hash(fact.columns.map(col).toSeq: _*), lit(buckets)))
    val exploded = dim.withColumn("__salt", explode(array((0 until buckets).map(lit): _*)))
    salted.join(exploded, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Bounding-box containment ANTI-join that never plans a nested loop:
    * `boxes` (minx/maxx/miny/maxy + `keyCols`) minus every box that
    * contains a point of `points` (px/py). A direct `between` θ-join
    * plans as a BroadcastNestedLoopJoin over |boxes|×|points| — fatal
    * when points are OSM-scale. Instead points are bucketed once by
    * coarse `bucketW` grid cell, each box explodes over the buckets it
    * covers (boxes span few buckets when bucketW ≈ typical box size),
    * candidates meet in a shuffled hash EQUI-join on the bucket, and the
    * exact test + anti-join run on that small candidate set.
    */
  def boxAntiJoin(boxes: DataFrame, keyCols: Seq[String], points: DataFrame,
      bucketW: Long): DataFrame = {
    require(bucketW > 0, "bucketW must be positive")
    val pts = points.select(col("px"), col("py"),
      expr(s"px div $bucketW").as("bx"), expr(s"py div $bucketW").as("by"))
    val hit = boxes
      .withColumn("bx", explode(sequence(expr(s"minx div $bucketW"), expr(s"maxx div $bucketW"))))
      .withColumn("by", explode(sequence(expr(s"miny div $bucketW"), expr(s"maxy div $bucketW"))))
      .join(pts, Seq("bx", "by"))
      .filter(col("px").between(col("minx"), col("maxx"))
        && col("py").between(col("miny"), col("maxy")))
      .select(keyCols.map(col): _*)
      .distinct()
    boxes.join(hit, keyCols, "left_anti")
  }

  /** Write `df` as a bucketed+sorted table so subsequent equi-joins and
    * aggregations on `bucketCols` skip their shuffle entirely (the scan
    * reports the bucket hash-partitioning to Catalyst). This is the
    * storage-layout half of SURVEY §6's "co-located joins via bucketing".
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      bucketCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket columns — with matching
    * bucket counts Catalyst plans a shuffle-free sort-merge join.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      on: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), on)
}
