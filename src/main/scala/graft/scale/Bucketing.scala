package graft.scale

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table plumbing (SURVEY.md §6: "co-locate joins via bucketing
  * or pre-partitioning").
  *
  * A fact table that is joined on the same key by many downstream
  * queries should pay its shuffle ONCE, at write time: `bucketBy(n, key)`
  * hash-partitions rows into n bucket files per partition, and every
  * later equi-join or aggregation on that key plans with zero Exchange —
  * at 100 TB that converts the dominant per-query cost into a one-time
  * layout cost. `sortBy` additionally pre-sorts each bucket file so a
  * sort-merge join can skip its Sort when Spark reads one file per
  * bucket.
  *
  * The reference's SQLite layer gets the same effect implicitly from its
  * `(latitude, longitude, zoom)` primary-key B-tree (solardb.py:30-49);
  * bucketing is the distributed re-expression of "storage already
  * clustered by the join key".
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed AND per-bucket sorted
    * on `key`. Repartitioning to exactly `buckets` partitions on the key
    * first makes each bucket a single file (Spark's bucket id
    * `pmod(murmur3(key), n)` coincides with the shuffle partition id) —
    * the Exchange elimination needs only the bucket spec, and the
    * single-file layout additionally lets the scan expose the sortBy
    * order so the sort-merge join skips its Sort too (Spark 3+ consults
    * that ordering behind `spark.sql.legacy.bucketedTableScan
    * .outputOrdering`, SPARK-28595; a bucket split across files would
    * make the flag unsafe).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.repartition(buckets, df.col(key))
      .write.format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .mode("overwrite").saveAsTable(table)

  /** Equi-join two co-bucketed tables (same bucket count, join keys are
    * the bucket keys). MERGE-hinted so the plan is deterministically a
    * sort-merge join, which the bucket layout turns exchange-free; a
    * broadcast would hide the property this helper exists to exploit.
    */
  def cobucketedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right).hint("merge")
    l.join(r, l.col(leftKey) === r.col(rightKey))
  }
}
