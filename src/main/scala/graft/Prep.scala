package graft

import org.apache.spark.sql.SparkSession

/** Registry of the session-shared memoized intermediates, each named
  * so [[Bench]] can build them FIRST and bill each to its own `prep`
  * line item.
  *
  * Without this the memo build cost lands on whichever consumer runs
  * first (alphabetical in the bench loop): round 12's driver run read
  * 6.04 s for `c100_fertility` (a ~1 s query + the shared ~5 s BPE
  * sample-learn) and 2.37 s for `a10_imagery_cleanup` (a ~0.3 s query
  * + the GeoDerive cells memo) — numbers that steer optimization at
  * the wrong query. With the prep section, every per-query number is
  * attributable to the query alone, and the memo costs are visible as
  * what they are: per-session fixed costs amortized across all
  * consumers.
  *
  * Keep this list in sync with the `graft.util.Memo` instances whose
  * bodies do corpus-sized work (cheap per-key staging memos — e.g.
  * the streaming input stager — are per-query costs and stay billed
  * to their query).
  */
object Prep {
  def items: Seq[(String, (SparkSession, String) => Unit)] =
    Seq[(String, (SparkSession, String) => Unit)](
      "geo_cells" -> ((s, d) => { tiles.GeoDerive.cells(s, d): Unit }),
      "geo_components" -> ((s, d) => { tiles.Clustering.componentsFor(s, d): Unit })
    ) ++ text.TextQueries.prepItems ++
      dedup.DedupQueries.prepItems ++
      embed.EmbedQueries.prepItems ++
      relational.Queries.prepItems ++
      // LAST: the overlapped D-block replay consumes the batch-side
      // memos above (bm25Stats, learned merges, vocab tables, centroid
      // row, geo cells) — building them first keeps each billed to its
      // own line instead of the replay pool's
      streaming.StreamingQueries.prepItems
}
