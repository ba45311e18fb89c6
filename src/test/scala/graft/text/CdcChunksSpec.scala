package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** C127 content-defined chunking: an independent sequential recompute
  * of the whole pipeline (boundaries → chunk spans → fingerprints →
  * global dup mass) plus the property that JUSTIFIES the operator —
  * boundaries re-synchronize after an edit, which C40's fixed grid
  * cannot do.
  */
class CdcChunksSpec extends SparkTestBase {

  private val W = TextQueries.CdcWindow
  private val D = TextQueries.CdcDiv
  private val B = TextQueries.CdcB

  private def tokHash(w: String): Long =
    w.length.toLong * 1009L +
      (if (w.isEmpty) 0L else w.charAt(0).toLong * 31L) +
      (if (w.isEmpty) 0L else w.charAt(w.length - 1).toLong)

  /** Sequential single-threaded chunker — (fp, len, start) per chunk. */
  private def chunksOf(text: String): Seq[(Long, Long, Long)] = {
    val h = text.split(" ", -1).map(tokHash)
    val n = h.length
    val bnd = (W - 1 until n).filter { i =>
      (0 until W).map(k => h(i - k) * Seq.fill(k)(B).product).sum % D == 0
    }.map(_.toLong)
    val ends = if (bnd.nonEmpty && bnd.last == n - 1) bnd else bnd :+ (n - 1).toLong
    val starts = 0L +: ends.init.map(_ + 1)
    starts.zip(ends).map { case (s, e) =>
      val fp = (s to e).map(i => h(i.toInt) * (i - s + 1)).sum
      (fp, e - s + 1, s)
    }
  }

  test("c127 == sequential CDC recompute (boundaries, fingerprints, global dup mass)") {
    val docs = graft.Tables(spark, sf, "documents").select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val all = docs.map { case (id, t) => id -> chunksOf(t) }
    val occ = all.flatMap(_._2).groupBy(c => (c._1, c._2)).view.mapValues(_.length).toMap
    val want = all.sortBy(_._1).map { case (id, cs) =>
      val nTok = docs.find(_._1 == id).get._2.split(" ", -1).length.toLong
      val dup = cs.filter(c => occ((c._1, c._2)) >= 2)
      (id, nTok, cs.size.toLong, dup.size.toLong, dup.map(_._2).sum,
        dup.map(_._2).sum * 1000000L / nTok)
    }.toSeq
    val got = TextQueries.c127CdcChunks(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    // the corpus genuinely exercises both sides of the dup test...
    assert(want.exists(_._4 > 0L), "no duplicated chunks anywhere — dup path untested")
    assert(want.exists(r => r._4 < r._3), "every chunk duplicated — unique path untested")
    // ...and chunking genuinely splits some docs (boundaries fire)
    assert(want.exists(_._3 > 1L), "no doc ever chunked — boundary path untested")
  }

  test("c130 weighted sample: exact race recompute, exactly-K, weight bias, TopK plan") {
    val out = TextQueries.c130WeightedSample(spark, sf)
    val got = out.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // sequential recompute of the whole race from raw text
    val docs = graft.Tables(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val pop = docs.map { case (id, src, text) =>
      val toks = text.split(" ", -1)
      val stop = toks.count(TextQueries.Stopwords.contains).toLong
      val n = toks.length.toLong
      val w = stop * 300000L / n + math.min(n, 200L) * 3500L + 1L
      // textbook (non-residue) Knuth draw: JVM Longs don't overflow on
      // the test id domain, so this also witnesses that the query's
      // overflow-exact ((id % M)·506952114 + 104729) % M rewrite
      // preserves the original race values
      val u = (id * 2654435761L + 104729L) % 2147483647L
      (src, id, w, u * 1000000L / w)
    }
    val want = pop.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (src, g) =>
      g.sortBy(d => (d._4, d._2)).take(TextQueries.SampleK).zipWithIndex
        .map { case ((_, id, w, k), i) => (src, i + 1L, id, w, k) }
    }
    assert(got.toSeq == want)
    // exactly K per source wherever the source has >= K docs
    val bySrc = pop.groupBy(_._1).view.mapValues(_.size).toMap
    got.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.length == math.min(TextQueries.SampleK, bySrc(src)), src)
    }
    // the race is genuinely weight-biased: kept docs are heavier on
    // average than the population (the whole point of weighting)
    val keptIds = got.map(_._3).toSet
    val (kept, all) = (pop.filter(p => keptIds(p._2)).map(_._3), pop.map(_._3))
    assert(kept.sum / kept.length > all.sum / all.length,
      "weighted sample is not heavier than the population")
    // scale contract: the rank <= K predicate reached WindowGroupLimit,
    // so map tasks keep K-row heaps instead of sorting the corpus
    assert(out.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }

  test("CDC re-synchronizes after a leading edit; a fixed grid does not") {
    // deterministic pseudo-random 400-token text (LCG — an affine map of
    // the index is too structured: its alternating window sums orbit a
    // coset of Z/32 that misses 0 and no boundary ever fires)
    var s = 12345L
    val toks = (0 until 400).map { _ =>
      s = s * 6364136223846793005L + 1442695040888963407L
      "t" + ((s >>> 33) % 100000L)
    }
    val text = toks.mkString(" ")
    val edited = "zz " + text
    val orig = chunksOf(text).map(c => (c._1, c._2))
    val shifted = chunksOf(edited).map(c => (c._1, c._2))
    // content-anchored boundaries: everything after the edited first
    // chunk re-syncs — the shifted doc shares ALL original chunks but
    // (at most) the first one. Multiset intersection: repeated chunk
    // keys must each find a partner
    def counts(xs: Seq[(Long, Long)]) =
      xs.groupBy(identity).view.mapValues(_.size).toMap
    val (co, cs) = (counts(orig), counts(shifted))
    val sharedCdc = co.map { case (k, c) => math.min(c, cs.getOrElse(k, 0)) }.sum
    assert(orig.size > 5, s"text too uniform to chunk (${orig.size} chunks)")
    assert(sharedCdc >= orig.size - 1,
      s"CDC failed to re-sync: $sharedCdc of ${orig.size} chunks survive a 1-token insert")
    // the C40 fixed grid under the same edit: every segment shifts by
    // one token, so (almost) nothing survives — the contrast that makes
    // content-defined boundaries worth their operator
    def fixedSegs(ts: Seq[String]): Seq[Seq[String]] = ts.grouped(10).toSeq
    val fixedShared = fixedSegs(toks).toSet
      .intersect(fixedSegs("zz" +: toks).toSet).size
    assert(fixedShared <= 1,
      s"fixed grid unexpectedly survived the shift ($fixedShared segments)")
  }
}
