package graft.dedup

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.dedup.MinHashLsh.shingleHashes
import graft.util.Seal._

/** Dev tool: stage-by-stage timing of the C19 collapse at an SF dir. */
object C19Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[c19] $what ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val docs = Tables.documents(spark, dir)
    val classes = docs.groupBy("text").agg(min("doc_id").as("rep"))
    val reps = time("reps checkpoint")(
      classes.select(col("rep").as("doc_id"), col("text")).seal())
    val pairs = time("candidatePairsFor(reps) build + count") {
      val p = DedupQueries.candidatePairsForProfile(reps)
      println(s"[c19] pairs=${p.count()}")
      p
    }
    val sets = reps.select(col("doc_id"),
        array_sort(array_distinct(shingleHashes(col("text")))).as("s"))
      .withColumn("ns", size(col("s")))
    time("jaccard filter count (sorted merge)") {
      val n = pairs.select("doc_a", "doc_b")
        .join(sets.select(col("doc_id").as("doc_a"), col("s").as("sa"), col("ns").as("na")), "doc_a")
        .join(sets.select(col("doc_id").as("doc_b"), col("s").as("sb"), col("ns").as("nb")), "doc_b")
        .withColumn("inter", graft.functions.sets.sorted_intersect_count(col("sa"), col("sb")))
        .filter(round(col("inter").cast("double")
          / (col("na") + col("nb") - col("inter")).cast("double"), 6) >= DedupQueries.CollapseJaccard)
        .count()
      println(s"[c19] edges>=0.9: $n")
    }
    spark.stop()
  }
}
