package graft.embed

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.multimodal.Multimodal
import graft.Tables

class EmbedQueriesSpec extends SparkTestBase {

  test("c10 brute-force: exactly TopK neighbors per probe, cos in [-1, 1]") {
    val r = EmbedQueries.c10AnnBruteforce(spark, sf)
    val perProbe = r.groupBy("probe_id").count()
    assert(perProbe.filter(col("count") =!= EmbedQueries.TopK).count() == 0)
    assert(r.filter(abs(col("cos")) > 1.000001).count() == 0)
    assert(r.filter(col("vec_id") === col("probe_id")).count() == 0)
  }

  test("c11 LSH recall: every LSH hit is a true neighbor pair with the same cosine") {
    val bf = EmbedQueries.c10AnnBruteforce(spark, sf)
      .select(col("probe_id"), col("vec_id"), col("cos").as("cos_bf"))
    val lsh = EmbedQueries.c11AnnLsh(spark, sf)
      .select(col("probe_id"), col("vec_id"), col("cos"))
    // cosines agree exactly where both rank the same pair
    val joined = lsh.join(bf, Seq("probe_id", "vec_id"))
    assert(joined.filter(col("cos") =!= col("cos_bf")).count() == 0)
  }

  test("c131 bucket recall: brute-force sweep recompute, monotone cost in width") {
    import graft.embed.EmbedQueries
    // sequential recompute of the whole calibration from raw vectors:
    // same plane weights, same low-bits bucket, same rounded cosine,
    // same (cos desc, vec_id) rank — HALF_UP rounding like Spark/DuckDB
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vecs = Tables(spark, sf, "embeddings").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def bucket(v: Array[Double]): Long =
      (0 until EmbedQueries.Planes).map { j =>
        val w = (0 until 64).map(d => ((j * 64L + d) * 2654435761L % 1000L) / 1000.0 - 0.5).toArray
        if (dot(v, w) > 0) 1L << j else 0L
      }.sum
    val bkt = vecs.map { case (id, v) => id -> bucket(v) }.toMap
    val n2 = vecs.map { case (id, v) => id -> dot(v, v) }.toMap
    val probes = vecs.filter(_._1 % EmbedQueries.ProbeMod == 0).map(_._1)
    def cos(a: Long, b: Long) = r6(
      dot(vecs.find(_._1 == a).get._2, vecs.find(_._1 == b).get._2) / math.sqrt(n2(a) * n2(b)))
    def topk(cand: Long => Seq[Long]): Map[(Long, Long), Int] =
      probes.flatMap { p =>
        cand(p).map(v => (v, cos(p, v))).sortBy { case (v, c) => (-c, v) }
          .take(EmbedQueries.TopK).zipWithIndex
          .map { case ((v, _), i) => (p, v) -> (i + 1) }
      }.toMap
    val exact = topk(p => vecs.map(_._1).filter(_ != p).toSeq)
    val want = EmbedQueries.RecallBits.flatMap { b =>
      val m = 1L << b
      val cands = probes.map(p =>
        p -> vecs.map(_._1).filter(v => v != p && bkt(v) % m == bkt(p) % m).toSeq).toMap
      val approx = topk(cands)
      val nCand = cands.values.map(_.size.toLong).sum
      EmbedQueries.RecallKs.map { k =>
        val hits = approx.count { case ((p, v), ra) =>
          ra <= k && exact.get((p, v)).exists(_ <= k) }.toLong
        (b.toLong, k, probes.length.toLong, nCand, hits,
          r6(hits.toDouble / (probes.length * k)))
      }
    }.sortBy(t => (t._1, t._2))
    val got = EmbedQueries.c131BucketRecall(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got == want)
    // dropping plane bits can only widen buckets: candidate cost is
    // anti-monotone in n_bits, and some width must actually recall
    val byBits = got.groupBy(_._1).view.mapValues(_.head._4).toMap
    assert(byBits(4L) >= byBits(6L) && byBits(6L) >= byBits(8L),
      s"candidate cost not anti-monotone in width: $byBits")
    assert(got.exists(_._5 > 0L), "no width/k ever recalls a true neighbor")
  }

  test("c136 beam recall: sequential beam-walk recompute, cost monotone in width") {
    import graft.embed.EmbedQueries
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vecs = Tables(spark, sf, "embeddings").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val byId = vecs.toMap
    val n2 = vecs.map { case (id, v) => id -> dot(v, v) }.toMap
    def cos(a: Long, b: Long) = r6(dot(byId(a), byId(b)) / math.sqrt(n2(a) * n2(b)))
    // graph and ground truth anchored on already-pinned frames: the c46
    // mutual edge list and the c10 exact-top-k convention — the NEW
    // logic under test is the per-width walk + recall/cost rollup
    val edges = EmbedQueries.c46KnnGraph(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges.toSeq ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val probes = vecs.map(_._1).filter(_ % EmbedQueries.ProbeMod == 0).toSeq
    val exactRnk: Map[(Long, Long), Int] = probes.flatMap { p =>
      vecs.map(_._1).filter(_ != p).map(v => (v, cos(p, v))).toSeq
        .sortBy { case (v, c) => (-c, v) }.take(EmbedQueries.TopK).zipWithIndex
        .map { case ((v, _), i) => (p, v) -> (i + 1) }
    }.toMap
    val want = EmbedQueries.BeamSweep.flatMap { b =>
      var scored = 0L // probe-seeded: hop 0 scores nothing
      var frontier: Map[Long, Seq[Long]] = probes.map(p => p -> Seq(p)).toMap
      var beam: Map[Long, Seq[(Long, Int)]] = probes.map(p => p -> Seq.empty[(Long, Int)]).toMap
      for (_ <- 1 to EmbedQueries.BeamHops) {
        beam = probes.map { p =>
          val cands = (frontier(p) ++
            frontier(p).flatMap(c => adj.getOrElse(c, Seq.empty))).distinct
          val ranked = cands.filter(_ != p)
          scored += ranked.size
          p -> ranked.map(v => (v, cos(p, v))).sortBy { case (v, c) => (-c, v) }
            .take(b).zipWithIndex.map { case ((v, _), i) => (v, i + 1) }
        }.toMap
        frontier = beam.view.mapValues(_.map(_._1)).toMap
      }
      Seq(1L, b.toLong).map { k =>
        val hits = probes.flatMap(p => beam(p).map { case (v, r) => (p, v, r) })
          .count { case (p, v, r) => r <= k && exactRnk.get((p, v)).exists(_ <= k) }
          .toLong
        (b.toLong, k, probes.length.toLong, scored, hits,
          r6(hits.toDouble / (probes.length * k)))
      }
    }.sortBy(t => (t._1, t._2))
    val got = EmbedQueries.c136BeamRecall(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got == want)
    // a wider beam can only score MORE candidates, and some width must
    // actually recall a true neighbor
    val costs = got.groupBy(_._1).view.mapValues(_.head._4).toMap
    assert(costs(2L) <= costs(4L) && costs(4L) <= costs(8L),
      s"candidate cost not monotone in beam width: $costs")
    assert(got.exists(_._5 > 0L), "no width/k ever recalls a true neighbor")
  }

  test("c133 ivf recall: brute-force sweep recompute, cost monotone in nprobe") {
    import graft.embed.EmbedQueries
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vecs = Tables(spark, sf, "embeddings").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val byId = vecs.toMap
    val n2 = vecs.map { case (id, v) => id -> dot(v, v) }.toMap
    def cos(a: Long, b: Long) = r6(dot(byId(a), byId(b)) / math.sqrt(n2(a) * n2(b)))
    val cents = vecs.map(_._1).filter(_ % EmbedQueries.CentroidMod == 0)
    // assignment: min (-ccos, cid) — c18's exact tie rule
    val cid = vecs.map { case (id, _) =>
      id -> cents.map(c => (-cos(id, c) + 0.0, c)).min._2 }.toMap
    val probes = vecs.map(_._1).filter(_ % EmbedQueries.ProbeMod == 0)
    // probe routing: nearest centroid lists ranked (ccos desc, cid)
    val routing = probes.map { p =>
      p -> cents.map(c => (c, cos(p, c))).sortBy { case (c, s) => (-s, c) }
        .map(_._1).take(EmbedQueries.NProbeSweep.max)
    }.toMap
    def topk(cand: Long => Seq[Long]): Map[(Long, Long), Int] =
      probes.flatMap { p =>
        cand(p).map(v => (v, cos(p, v))).sortBy { case (v, c) => (-c, v) }
          .take(EmbedQueries.TopK).zipWithIndex
          .map { case ((v, _), i) => (p, v) -> (i + 1) }
      }.toMap
    val exact = topk(p => vecs.map(_._1).filter(_ != p).toSeq)
    val want = EmbedQueries.NProbeSweep.flatMap { np =>
      val cands = probes.map { p =>
        val lists = routing(p).take(np).toSet
        p -> vecs.map(_._1).filter(v => v != p && lists(cid(v))).toSeq
      }.toMap
      val approx = topk(cands)
      val nCand = cands.values.map(_.size.toLong).sum
      EmbedQueries.RecallKs.map { k =>
        val hits = approx.count { case ((p, v), ra) =>
          ra <= k && exact.get((p, v)).exists(_ <= k) }.toLong
        (np.toLong, k, probes.length.toLong, nCand, hits,
          r6(hits.toDouble / (probes.length * k)))
      }
    }.sortBy(t => (t._1, t._2))
    val got = EmbedQueries.c133IvfRecall(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got == want)
    // more lists probed can only add candidates, and recall@k at the
    // widest sweep point must not fall below the narrowest
    val byNp = got.groupBy(_._1).view.mapValues(_.head._4).toMap
    val nps = EmbedQueries.NProbeSweep.map(_.toLong)
    assert(nps.sliding(2).forall(w => byNp(w(0)) <= byNp(w(1))),
      s"candidate cost not monotone in nprobe: $byNp")
    assert(got.exists(_._5 > 0L), "no nprobe/k ever recalls a true neighbor")
  }

  test("c134 ivf balance: brute-force list-size recompute, totals account for every vector") {
    import graft.embed.EmbedQueries
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vecs = Tables(spark, sf, "embeddings").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val byId = vecs.toMap
    val n2 = vecs.map { case (id, v) => id -> dot(v, v) }.toMap
    def cos(a: Long, b: Long) = r6(dot(byId(a), byId(b)) / math.sqrt(n2(a) * n2(b)))
    val cents = vecs.map(_._1).filter(_ % EmbedQueries.CentroidMod == 0)
    val lists = vecs.map { case (id, _) =>
      cents.map(c => (-cos(id, c) + 0.0, c)).min._2 }
      .groupBy(identity).map { case (c, g) => c -> g.length.toLong }
    val nTotal = vecs.length.toLong
    val nCells = lists.size.toLong
    val want = lists.toSeq.sortBy { case (c, n) => (-n, c) }.zipWithIndex.map {
      case ((c, n), i) => (i + 1L, c, n, nCells,
        n * 1000000L / nTotal, n * nCells * 1000000L / nTotal)
    }
    val got = EmbedQueries.c134IvfBalance(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    // every vector is in exactly one list, and imbalance is genuinely
    // informative (the deterministic codebook is NOT perfectly uniform)
    assert(got.map(_._3).sum == nTotal)
    assert(got.exists(_._6 != 1000000L), "all cells exactly uniform — imb axis untested")
  }

  test("c18 IVF: at most TopK per probe, every hit carries the true cosine") {
    val ivf = EmbedQueries.c18AnnIvf(spark, sf)
    val perProbe = ivf.groupBy("probe_id").count()
    assert(perProbe.filter(col("count") > EmbedQueries.TopK).count() == 0)
    assert(ivf.filter(col("vec_id") === col("probe_id")).count() == 0)
    // wherever IVF and brute force rank the same pair, cosines agree exactly
    val bf = EmbedQueries.c10AnnBruteforce(spark, sf)
      .select(col("probe_id"), col("vec_id"), col("cos").as("cos_bf"))
    val joined = ivf.join(bf, Seq("probe_id", "vec_id"))
    assert(joined.filter(col("cos") =!= col("cos_bf")).count() == 0)
  }

  test("c17 normalization: unit vectors have norm 1, long form matches array form") {
    val arr = EmbedQueries.normalized(spark, sf)
    // ||unit||² ≈ 1 (rounded components, so 1e-4 slack)
    val n2 = arr.select(col("vec_id"),
      aggregate(col("unit"), lit(0.0), (acc, x) => acc + x * x).as("u2"))
    assert(n2.filter(abs(col("u2") - 1.0) > 1e-4).count() == 0)
    // the driver-checked long form carries the same values per (vec, dim)
    val long = EmbedQueries.c17Normalize(spark, sf)
    val rejoined = arr.select(col("vec_id"), posexplode(col("unit")).as(Seq("dim_idx", "u")))
      .join(long, Seq("vec_id", "dim_idx"))
    assert(rejoined.filter(col("u") =!= col("unit_val")).count() == 0)
    assert(long.count() == arr.count() * EmbedQueries.Dims)
  }

  test("c9 pairs are ordered and above threshold") {
    val p = EmbedQueries.c9CosinePairs(spark, sf)
    assert(p.filter(col("vec_a") >= col("vec_b")).count() == 0)
    assert(p.filter(col("cos") < EmbedQueries.CosThreshold).count() == 0)
  }

  test("c81 hard negatives: wrong-label only, ranked, dominated by the c10 global top") {
    val out = EmbedQueries.c81HardNegatives(spark, sf).collect()
    assert(out.nonEmpty)
    val labels = graft.Tables(spark, sf, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val byProbe = out.groupBy(_.getAs[Long]("probe_id"))
    byProbe.foreach { case (pid, rows) =>
      assert(rows.length == EmbedQueries.TopK)
      val sorted = rows.sortBy(_.getAs[Int]("rnk"))
      assert(sorted.map(_.getAs[Int]("rnk")).toSeq == (1 to EmbedQueries.TopK))
      // negatives never share the probe's label, and labels are faithful
      sorted.foreach { r =>
        assert(r.getAs[Long]("plabel") == labels(pid))
        assert(r.getAs[Long]("neg_label") == labels(r.getAs[Long]("vec_id")))
        assert(r.getAs[Long]("neg_label") != r.getAs[Long]("plabel"))
      }
      // ranked by descending cosine
      assert(sorted.map(_.getAs[Double]("cos")).toSeq.reverse.sorted.reverse
        == sorted.map(_.getAs[Double]("cos")).toSeq)
    }
    // the best hard negative can't beat the unrestricted c10 top neighbor
    val globalTop = EmbedQueries.c10AnnBruteforce(spark, sf).collect()
      .filter(_.getAs[Int]("rnk") == 1)
      .map(r => r.getAs[Long]("probe_id") -> r.getAs[Double]("cos")).toMap
    byProbe.foreach { case (pid, rows) =>
      assert(rows.map(_.getAs[Double]("cos")).max <= globalTop(pid) + 1e-9)
    }
  }

  test("c78 centroid eval: brute-force confusion recompute, all vectors accounted") {
    val out = EmbedQueries.c78CentroidEval(spark, sf).collect()
    def q(d: Double) = BigDecimal(d).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val vecs = graft.Tables(spark, sf, "embeddings")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong,
        r.getSeq[Float](2).map(e => q(e.toDouble * 1e6)).toArray))
    val cents = vecs.groupBy(_._2).view.mapValues { g =>
      Array.tabulate(g.head._3.length)(d => q(g.map(_._3(d)).sum.toDouble / g.length))
    }.toMap
    val conf = vecs.map { case (_, lbl, v) =>
      val pred = cents.keys.toSeq.sorted.minBy { p =>
        (cents(p).zip(v).map { case (c, x) => (x - c) * (x - c) }.sum, p)
      }
      (lbl, pred)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(out.map(r => ((r.getAs[Long]("label"), r.getAs[Long]("pred")),
      r.getAs[Long]("n_vecs"))).toMap == conf)
    assert(out.map(_.getAs[Long]("n_vecs")).sum == vecs.length)
    // the synthetic labels are weakly separable — require the centroids
    // to beat 2× the 1/L random-chance diagonal, not full dominance
    val diag = out.filter(r => r.getAs[Long]("label") == r.getAs[Long]("pred"))
      .map(_.getAs[Long]("n_vecs")).sum
    assert(diag * cents.size > 2L * vecs.length, s"diag=$diag of ${vecs.length}")
  }

  test("c102 PageRank: exact integer power-iteration recompute, mass sanity") {
    import graft.embed.EmbedQueries
    val out = EmbedQueries.c102Pagerank(spark, sf).collect()
    val und = EmbedQueries.c46KnnGraph(spark, sf).select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val nodes = graft.Tables(spark, sf, "embeddings")
      .select("vec_id").collect().map(_.getLong(0)).sorted
    val n = nodes.length.toLong
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var r = nodes.map(_ -> 1000000000L).toMap
    for (_ <- 1 to EmbedQueries.PrIters) {
      val dm = nodes.filter(id => deg.getOrElse(id, 0L) == 0L).map(r).sum
      val csum = edges.groupBy(_._2).view
        .mapValues(_.map { case (src, _) => r(src) / deg(src) }.sum).toMap
      r = nodes.map(id =>
        id -> (150000000L + ((csum.getOrElse(id, 0L) + dm / n) * 850L) / 1000L)).toMap
    }
    assert(out.length == n)
    out.foreach { row =>
      val id = row.getAs[Long]("vec_id")
      assert(row.getAs[Long]("deg") == deg.getOrElse(id, 0L))
      assert(row.getAs[Long]("rank_nano") == r(id), s"vec $id")
    }
    // connected nodes outrank isolated ones on average (centrality signal)
    val (conn, iso) = out.partition(_.getAs[Long]("deg") > 0L)
    if (conn.nonEmpty && iso.nonEmpty) {
      assert(conn.map(_.getAs[Long]("rank_nano")).sum / conn.length >
        iso.map(_.getAs[Long]("rank_nano")).sum / iso.length)
    }
  }

  test("c128 snn clusters: brute-force shared-count + union-find recompute") {
    import graft.embed.EmbedQueries
    val out = EmbedQueries.c128SnnClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val lists = EmbedQueries.directedTopK(spark, sf)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val mutual = EmbedQueries.c46KnnGraph(spark, sf)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val kept = mutual.filter { case (a, b) =>
      (lists(a) & lists(b)).size >= EmbedQueries.SnnKt }
    // plain union-find over the surviving edges, min-id labels
    val nodes = graft.Tables(spark, sf, "embeddings")
      .select("vec_id").collect().map(_.getLong(0))
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    kept.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val label = nodes.map(n => n -> find(n)).toMap
    val size = nodes.groupBy(label).view.mapValues(_.length.toLong).toMap
    assert(out.keySet == nodes.toSet)
    nodes.foreach { n =>
      assert(out(n) == ((label(n), size(label(n)))), s"vec $n")
    }
    // the SNN filter genuinely bites, and the corpus genuinely has
    // both multi-member clusters and singletons
    assert(kept.length < mutual.length, "shared-neighbor filter removed nothing")
    assert(kept.nonEmpty, "filter removed every edge — clustering is vacuous")
    assert(out.values.exists(_._2 > 1L) && out.values.exists(_._2 == 1L))
  }

  test("c129 knn outliers: brute-force density-ratio recompute, sentinel path") {
    import graft.embed.EmbedQueries
    val out = EmbedQueries.c129KnnOutliers(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    val td = EmbedQueries.directedTopK(spark, sf)
      .select("vec_a", "vec_b", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        1000000L - math.round(r.getDouble(2) * 1e6)))
    val byA = td.groupBy(_._1)
    val kdist = byA.view.mapValues(g =>
      g.map(_._3).sum / g.length + 1L).toMap
    val deg = byA.view.mapValues(_.length.toLong).toMap
    val nbr = byA.view.mapValues(g =>
      g.map(e => kdist(e._2)).sum / g.length).toMap
    val nodes = graft.Tables(spark, sf, "embeddings")
      .select("vec_id").collect().map(_.getLong(0))
    assert(out.keySet == nodes.toSet)
    nodes.foreach { n =>
      val want =
        if (!deg.contains(n)) (0L, -1L, -1L, -1L)
        else (deg(n), kdist(n), nbr(n), nbr(n) * 1000000L / kdist(n))
      assert(out(n) == want, s"vec $n")
    }
    // the score genuinely varies (density signal exists on this corpus)
    val scored = out.values.filter(_._4 >= 0L).map(_._4)
    assert(scored.nonEmpty && scored.toSet.size > 1)
  }

  test("c104 triangles: brute-force recompute, lcc formula, once-per-triangle") {
    import graft.embed.EmbedQueries
    val out = EmbedQueries.c104Triangles(spark, sf).collect()
    val und = EmbedQueries.c46KnnGraph(spark, sf).select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val edgeSet = und.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    // brute-force: per node, count neighbor pairs that are themselves edges
    val triOf = adj.map { case (v, ns) =>
      val s = ns.toSeq.sorted
      v -> s.combinations(2).count { case Seq(x, y) => edgeSet.contains((x, y)) }.toLong
    }
    val nodes = graft.Tables(spark, sf, "embeddings")
      .select("vec_id").collect().map(_.getLong(0))
    assert(out.length == nodes.length)
    out.foreach { row =>
      val id = row.getAs[Long]("vec_id")
      val d = adj.getOrElse(id, Set.empty).size.toLong
      val t = triOf.getOrElse(id, 0L)
      assert(row.getAs[Long]("deg") == d, s"deg vec $id")
      assert(row.getAs[Long]("tri") == t, s"tri vec $id")
      val lcc = if (d >= 2) (2L * t * 1000000000L) / (d * (d - 1)) else 0L
      assert(row.getAs[Long]("lcc_nano") == lcc, s"lcc vec $id")
    }
    // sum of per-node counts = 3 × the number of distinct triangles
    assert(out.map(_.getAs[Long]("tri")).sum % 3 == 0)
    // the mutual-kNN graph on this corpus genuinely closes some triangles
    assert(out.map(_.getAs[Long]("tri")).sum > 0L)
    // lcc is a ratio in [0, 1e9]
    out.foreach(r => assert(r.getAs[Long]("lcc_nano") >= 0L &&
      r.getAs[Long]("lcc_nano") <= 1000000000L))
  }

  test("c108 beam walk: exact recompute, monotone best-cos, beam stays on the graph") {
    import graft.embed.EmbedQueries
    val out = EmbedQueries.c108GraphAnn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getDouble(3)))
    val vecs = graft.Tables(spark, sf, "embeddings").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      BigDecimal(d / math.sqrt(na * nb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val und = EmbedQueries.c46KnnGraph(spark, sf).select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val entry = und.map(_._1).min
    val probes = vecs.keys.filter(_ % EmbedQueries.ProbeMod == 0).toSeq.sorted
    val expected = probes.flatMap { p =>
      val pe = vecs(p)
      var beam = Seq(entry)
      var lastBest = cos(pe, vecs(entry))
      (1 to EmbedQueries.BeamHops).foreach { _ =>
        val cands = (beam ++ beam.flatMap(n => adj.getOrElse(n, Set.empty))).distinct
        beam = cands.map(c => (c, cos(pe, vecs(c))))
          .sortBy { case (c, s) => (-s, c) }.take(EmbedQueries.BeamWidth).map(_._1)
        val best = cos(pe, vecs(beam.head))
        assert(best >= lastBest - 1e-9, s"probe $p best regressed")  // monotone
        lastBest = best
      }
      beam.zipWithIndex.map { case (c, i) => (p, i + 1L, c, cos(pe, vecs(c))) }
    }
    assert(out.toSeq == expected)
    // every reported node is on the graph or the entry itself
    val nodes = adj.keySet + entry
    assert(out.forall(t => nodes.contains(t._3)))
  }
}

class MultimodalSpec extends SparkTestBase {

  test("c12 payload metadata: n_bytes = n_chars + magic, format from body length") {
    val m = Multimodal.c12MultimodalMeta(spark, sf)
      .join(Tables(spark, sf, "documents").select("doc_id", "n_chars"), "doc_id")
    assert(m.filter(col("n_bytes") =!= col("n_chars") + lit(4)).count() == 0)
    assert(m.filter(!col("format").isin("png", "jpg", "webm")).count() == 0)
    assert(m.filter(col("width") < 64 || col("width") >= 1024).count() == 0)
  }

  test("c12 covers every document exactly once") {
    val n = Tables(spark, sf, "documents").count()
    assert(Multimodal.c12MultimodalMeta(spark, sf).count() == n)
  }

  test("c16 resize plan: output fits the target box and preserves aspect") {
    val r = Multimodal.c16ResizePlan(spark, sf)
    assert(r.filter(col("out_w") > Multimodal.TargetDim
      || col("out_h") > Multimodal.TargetDim).count() == 0)
    // the longer side lands within 1px of the target (integer floor)
    assert(r.filter(greatest(col("out_w"), col("out_h")) < Multimodal.TargetDim - 1).count() == 0)
    assert(r.filter(col("crop_x") + col("crop_side") > col("width")
      || col("crop_y") + col("crop_side") > col("height")).count() == 0)
  }

  test("c13 frame sampling: offsets aligned, every doc sampled, stride respected") {
    val f = Multimodal.c13FrameSample(spark, sf)
    assert(f.select("doc_id").distinct().count() ==
      Tables(spark, sf, "documents").count()) // frame 0 always kept
    assert(f.filter(col("frame_idx") % Multimodal.SampleEvery =!= 0).count() == 0)
    assert(f.filter((col("byte_offset") - 4) % Multimodal.FrameBytes =!= 0).count() == 0)
    assert(f.filter(col("frame_idx") >= col("n_frames")).count() == 0)
  }

  test("c28 quantization: codes span [0, 254], every vector covers all dims") {
    val q = EmbedQueries.c28VectorQuantize(spark, sf)
    assert(q.count() == Tables(spark, sf, "embeddings").count())
    assert(q.filter(col("n_dims") =!= EmbedQueries.Dims).count() == 0)
    assert(q.filter(col("code_min") < 0 || col("code_max") > 254).count() == 0)
    // per-dim min/max are attained: some vector hits 0 and some hits 254
    import org.apache.spark.sql.functions.{max => smax, min => smin}
    val bounds = q.agg(smin("code_min").as("lo"), smax("code_max").as("hi")).head
    assert(bounds.getLong(0) == 0 && bounds.getLong(1) == 254)
  }

  test("c20 semantic collapse: total cover, canonical is min, pairs land together") {
    val c = EmbedQueries.c20SemanticCollapse(spark, sf)
    assert(c.count() == Tables(spark, sf, "embeddings").count())
    assert(c.filter(col("canonical_id") > col("vec_id")).count() == 0)
    // every over-threshold pair ends up in the same cluster
    val lbl = c.select(col("vec_id"), col("canonical_id"))
    val split = EmbedQueries.c9CosinePairs(spark, sf)
      .join(lbl.select(col("vec_id").as("vec_a"), col("canonical_id").as("ca")), "vec_a")
      .join(lbl.select(col("vec_id").as("vec_b"), col("canonical_id").as("cb")), "vec_b")
      .filter(col("ca") =!= col("cb"))
    assert(split.count() == 0)
  }

  test("c46 mutual-kNN graph: symmetric by construction, ranks within k, no self-loops") {
    val g = EmbedQueries.c46KnnGraph(spark, sf)
    assert(g.count() > 0)
    assert(g.filter(col("vec_a") >= col("vec_b")).count() == 0)
    assert(g.filter(col("rnk_ab") < 1 || col("rnk_ab") > EmbedQueries.KnnK ||
      col("rnk_ba") < 1 || col("rnk_ba") > EmbedQueries.KnnK).count() == 0)
    assert(g.filter(col("cos") < -1 || col("cos") > 1).count() == 0)
    // mutuality is strictly rarer than one-directional kNN: the edge
    // count is bounded by k·N/2 (each vector contributes ≤ k directed
    // edges, an undirected edge consumes two)
    val n = Tables(spark, sf, "embeddings").count()
    assert(g.count() <= EmbedQueries.KnnK * n / 2)
  }

  test("c50 kmeans assign: total assignment, clusters in range, centroids self-assign at zero") {
    val a = EmbedQueries.c50KmeansAssign(spark, sf)
    assert(a.count() == Tables(spark, sf, "embeddings").count())
    assert(a.filter(col("cluster") < 0 || col("cluster") >= EmbedQueries.KmCents).count() == 0)
    assert(a.filter(col("dist_micro") < 0).count() == 0)
    // a centroid's nearest centroid is itself, at distance exactly 0
    val self = a.filter(col("vec_id") < EmbedQueries.KmCents).collect()
    assert(self.length == EmbedQueries.KmCents)
    self.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) && r.getLong(2) == 0L)
    }
    // every cluster is non-empty under sample-init (its seed is a member)
    assert(a.select("cluster").distinct().count() == EmbedQueries.KmCents)
  }

  test("c51 semdedup: total cover, dup_of is a lower-id cluster mate over threshold") {
    val s = EmbedQueries.c51SemDedup(spark, sf)
    assert(s.count() == Tables(spark, sf, "embeddings").count())
    // kept <-> sentinel; dropped <-> a real lower-id duplicate-of target
    assert(s.filter(col("keep") === 1L && col("dup_of") =!= -1L).count() == 0)
    assert(s.filter(col("keep") === 0L && col("dup_of") >= col("vec_id")).count() == 0)
    // dup_of lives in the SAME cluster (SemDeDup never crosses clusters)
    val byId = s.select(col("vec_id").as("dup_of"), col("cluster").as("dup_cluster"))
    val dropped = s.filter(col("keep") === 0L).join(byId, Seq("dup_of"))
    assert(dropped.filter(col("cluster") =!= col("dup_cluster")).count() == 0)
    // the min-id member of every cluster can have no lower-id mate -> kept
    val minIds = s.groupBy("cluster").agg(min("vec_id").as("vec_id"))
    assert(s.join(minIds, Seq("cluster", "vec_id")).filter(col("keep") === 0L).count() == 0)
    // and each dropped vector really is >= CosThreshold-close to its target:
    // recompute the cosine for the (dup_of, vec_id) pairs from raw vectors
    import graft.functions.vector.{vec_dot, vec_norm2}
    val e = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"), vec_norm2(col("embedding")).as("n2"))
    val pairs = s.filter(col("keep") === 0L)
      .join(e.select(col("vec_id"), col("embedding").as("eb"), col("n2").as("nb")), Seq("vec_id"))
      .join(e.select(col("vec_id").as("dup_of"), col("embedding").as("ea"), col("n2").as("na")),
        Seq("dup_of"))
      .withColumn("cos", round(vec_dot(col("ea"), col("eb")) / sqrt(col("na") * col("nb")), 6))
    assert(pairs.filter(col("cos") < EmbedQueries.CosThreshold).count() == 0)
    // the dedup fires on this corpus (a vacuous pass proves nothing)
    assert(s.filter(col("keep") === 0L).count() > 0)
  }

  test("c54 random projection: exact scalar recompute, linearity, matrix density") {
    val p = EmbedQueries.c54RandomProjection(spark, sf)
    val n = Tables(spark, sf, "embeddings").count()
    assert(p.count() == n * EmbedQueries.RpDims)
    // the implied ±1/0 matrix in plain Scala — the independent twin
    def sign(j: Int, d: Int): Long = {
      val h = Math.floorMod(1103515245L * (j * EmbedQueries.Dims + d) + 12345L,
        2147483648L)
      Math.floorMod(h, 6L) match { case 0 => 1L; case 1 => -1L; case _ => 0L }
    }
    // density: ~1/3 nonzero (Achlioptas 1/6 + 1/6), deterministic count
    val nonzero = (for (j <- 0 until EmbedQueries.RpDims; d <- 0 until EmbedQueries.Dims)
      yield sign(j, d)).count(_ != 0L)
    val total = EmbedQueries.RpDims * EmbedQueries.Dims
    assert(nonzero > total / 5 && nonzero < total / 2, s"degenerate density $nonzero/$total")
    // exact recompute for a sample of vectors: quantize then fold
    val sample = Tables(spark, sf, "embeddings").orderBy("vec_id").limit(5)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1))
    val got = p.filter(col("vec_id") < sample.map(_._1).max + 1)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    sample.foreach { case (id, vec) =>
      val q = vec.map(v => BigDecimal(v.toDouble * 1000000.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      for (j <- 0 until EmbedQueries.RpDims) {
        val expect = (0 until EmbedQueries.Dims).map(d => sign(j, d) * q(d)).sum
        assert(got((id, j)) == expect, s"vec $id dim $j")
      }
    }
    // linearity on quantized inputs: proj(q1) + proj(q2) computed per
    // dim equals the fold over summed q — exact integers, no epsilon
    val (idA, vecA) = sample(0); val (idB, vecB) = sample(1)
    for (j <- 0 until EmbedQueries.RpDims)
      assert(got((idA, j)) + got((idB, j)) ==
        (0 until EmbedQueries.Dims).map { d =>
          val qa = BigDecimal(vecA(d).toDouble * 1000000.0)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
          val qb = BigDecimal(vecB(d).toDouble * 1000000.0)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
          sign(j, d) * (qa + qb)
        }.sum)
  }

  test("c56 k-means update: totals, mean bounds, and assign∘update consistency") {
    val u = EmbedQueries.c56KmeansUpdate(spark, sf).localCheckpoint()
    val n = Tables(spark, sf, "embeddings").count()
    // K·dims rows, and each dim's member count sums to the corpus size
    assert(u.count() == EmbedQueries.KmCents.toLong * EmbedQueries.Dims)
    val perDim = u.groupBy("d").agg(sum("n_members").as("tot"))
      .select("tot").distinct().collect()
    assert(perDim.length == 1 && perDim(0).getLong(0) == n)
    // every cluster is non-empty (its init centroid self-assigns at
    // distance 0, pinned by the c50 spec) and each new mean lies within
    // the corpus-wide micro-unit value range — a mean outside the range
    // of the values it averages is arithmetic corruption
    val rng = Tables(spark, sf, "embeddings")
      .select(explode(col("embedding")).as("v"))
      .agg(min(round(col("v").cast("double") * 1000000.0, 0).cast("long")),
        max(round(col("v").cast("double") * 1000000.0, 0).cast("long"))).head()
    val (lo, hi) = (rng.getLong(0), rng.getLong(1))
    assert(u.filter(col("n_members") === 0L).count() == 0)
    assert(u.filter(col("mean_micro") < lo || col("mean_micro") > hi).count() == 0)
    // shift is |mean − old| by construction
    assert(u.filter(abs(col("mean_micro") - col("old_micro")) =!= col("shift_micro"))
      .count() == 0)
  }

  test("c62 IVF-PQ: dense ascending ranks, non-negative exact-int ADC, no self-matches") {
    import org.apache.spark.sql.expressions.Window
    val r = EmbedQueries.c62IvfPq(spark, sf).localCheckpoint()
    assert(r.count() > 0)
    assert(r.filter(col("vec_id") === col("probe_id")).count() == 0)
    assert(r.filter(col("adc_micro") < 0L).count() == 0)
    // per probe: rnk is exactly 1..n (n ≤ TopK) and adc_micro is
    // non-decreasing along it — the top-k contract of an ADC scan
    val w = Window.partitionBy("probe_id").orderBy("rnk")
    val seq = r.withColumn("expected", row_number().over(w))
      .withColumn("prev", lag("adc_micro", 1).over(w))
    assert(seq.filter(col("rnk") =!= col("expected")).count() == 0)
    assert(seq.filter(col("prev").isNotNull && col("prev") > col("adc_micro")).count() == 0)
    assert(r.groupBy("probe_id").count()
      .filter(col("count") > EmbedQueries.TopK).count() == 0)
  }

  test("c69 label propagation: votes recompute from the c46 graph + labels") {
    val out = EmbedQueries.c69LabelProp(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    val labels = graft.Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("label").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mutual = EmbedQueries.c46KnnGraph(spark, sf).select("vec_a", "vec_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = (mutual ++ mutual.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2))
    assert(out.keySet == labels.keySet)
    labels.foreach { case (id, own) =>
      val r = out(id)
      nbrs.get(id) match {
        case None =>
          assert(r.getAs[Long]("n_neighbors") == 0 &&
            r.getAs[Long]("majority_label") == -1L &&
            r.getAs[Long]("is_suspect") == 0L)
        case Some(ns) =>
          val counts = ns.map(labels).groupBy(identity).view.mapValues(_.size.toLong)
          val best = counts.toSeq.minBy { case (l, c) => (-c, l) }
          assert(r.getAs[Long]("n_neighbors") == ns.size)
          assert(r.getAs[Long]("majority_label") == best._1)
          assert(r.getAs[Long]("n_majority") == best._2)
          assert(r.getAs[Long]("is_suspect") == (if (best._1 != own) 1L else 0L))
      }
    }
    // the screen must actually flag something on this corpus
    assert(out.values.count(_.getAs[Long]("is_suspect") == 1L) > 0)
  }

  test("c70 prototypicality: exact integer recompute of centroids, d2 and ranks") {
    val out = EmbedQueries.c70Prototypicality(spark, sf).collect()
    assert(out.nonEmpty)
    val emb = graft.Tables(spark, sf, "embeddings").select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(v => BigDecimal(v.toDouble * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong + 1000000L).toVector)
      .toMap
    val byCluster = out.groupBy(_.getAs[Long]("cluster"))
    byCluster.foreach { case (_, rows) =>
      val members = rows.map(_.getAs[Long]("vec_id"))
      val vecs = members.map(emb)
      val dims = vecs.head.length
      val mean = (0 until dims).map(d => vecs.map(_(d)).sum / vecs.length)
      val d2 = members.zip(vecs).map { case (id, v) =>
        id -> (0 until dims).map(d => (v(d) - mean(d)) * (v(d) - mean(d))).sum
      }.toMap
      rows.foreach { r =>
        assert(r.getAs[Long]("d2") == d2(r.getAs[Long]("vec_id")))
        assert(r.getAs[Long]("n_c") == members.size)
      }
      // ranks are the (d2, vec_id) sort order and pct is the rank ratio
      val sorted = d2.toSeq.sortBy { case (id, dd) => (dd, id) }.map(_._1)
      rows.foreach { r =>
        val rnk = sorted.indexOf(r.getAs[Long]("vec_id")) + 1L
        assert(r.getAs[Long]("rnk") == rnk)
        val pct = (rnk - 1) * 1000000L / math.max(members.size - 1L, 1L)
        assert(r.getAs[Long]("pct_micro") == pct)
        assert(r.getAs[Long]("is_far") == (if (pct >= 500000L) 1L else 0L))
      }
    }
  }

  test("c112 pca power: exact covariance + BigInt iteration recompute, aniso bounds") {
    import graft.embed.EmbedQueries
    val out = EmbedQueries.c112PcaPower(spark, sf).collect()
    val dims = EmbedQueries.Dims
    val vecs = graft.Tables(spark, sf, "embeddings")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(v => BigDecimal(v.toDouble * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray)
    val n = vecs.length.toLong
    val mean = Array.tabulate(dims)(d => vecs.map(_(d)).sum / n)
    val cov = Array.tabulate(dims, dims)((i, j) =>
      vecs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum)
    var v = Array.fill(dims)(BigInt(1000000))
    for (_ <- 1 to EmbedQueries.PcaIters) {
      val u = Array.tabulate(dims)(i =>
        (0 until dims).map(j => BigInt(cov(i)(j)) * v(j)).sum)
      val mx = u.map(_.abs).max
      v = u.map(x => x * 1000000 / mx)
    }
    val num = (0 until dims).flatMap(i => (0 until dims)
      .map(j => BigInt(cov(i)(j)) * v(i) * v(j))).sum
    val den = v.map(x => x * x).sum
    val lambda = (num / den).toLong
    val trace = (0 until dims).map(i => cov(i)(i)).sum
    val aniso = (BigInt(lambda) * 1000000 / BigInt(trace)).toLong
    assert(out.length == dims)
    out.foreach { row =>
      val d = row.getAs[Long]("d").toInt
      assert(row.getAs[Long]("mean_micro") == mean(d), s"mean $d")
      assert(row.getAs[Long]("var_unit") == cov(d)(d), s"var $d")
      assert(row.getAs[Long]("pc_micro") == v(d).toLong, s"pc $d")
      assert(row.getAs[Long]("lambda_unit") == lambda)
      assert(row.getAs[Long]("aniso_ppm") == aniso)
    }
    // the ∞-norm rescale pins the dominant |component| at exactly 1e6
    assert(out.map(r => math.abs(r.getAs[Long]("pc_micro"))).max == 1000000L)
    // λ_max of a real covariance is positive and at most the whole trace
    assert(aniso > 0L && aniso <= 1000000L)
    // λ_max ≥ trace/dims for any real covariance (the mean eigenvalue);
    // +1 absorbs the integer truncation of the Rayleigh quotient
    assert(BigInt(lambda + 1) * dims >= BigInt(trace))
  }

  test("c122 abtt: exact deflated recompute; trace bookkeeping; share bounds") {
    import graft.embed.EmbedQueries
    val out = EmbedQueries.c122Abtt(spark, sf).collect()
    val dims = EmbedQueries.Dims
    val vecs = graft.Tables(spark, sf, "embeddings")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(v => BigDecimal(v.toDouble * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray)
    val n = vecs.length.toLong
    val mean = Array.tabulate(dims)(d => vecs.map(_(d)).sum / n)
    val cov = Array.tabulate(dims, dims)((i, j) =>
      BigInt(vecs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum))
    def fold(m: (Int, Int) => BigInt): (Array[BigInt], BigInt, BigInt) = {
      var v = Array.fill(dims)(BigInt(1000000))
      for (_ <- 1 to EmbedQueries.PcaIters) {
        val u = Array.tabulate(dims)(i => (0 until dims).map(j => m(i, j) * v(j)).sum)
        val mx = u.map(_.abs).max
        v = u.map(x => x * 1000000 / mx)
      }
      val num = (0 until dims).flatMap(i =>
        (0 until dims).map(j => m(i, j) * v(i) * v(j))).sum
      (v, num, v.map(x => x * x).sum)
    }
    val (v1, num1, den1) = fold((i, j) => cov(i)(j))
    val lambda1 = num1 / den1
    def defl(i: Int, j: Int) = lambda1 * v1(i) * v1(j) / den1
    val (v2, num2, den2) = fold((i, j) => cov(i)(j) - defl(i, j))
    val lambda2 = num2 / den2
    val tr1 = (0 until dims).map(i => cov(i)(i)).sum
    val tr2 = (0 until dims).map(i => cov(i)(i) - defl(i, i)).sum
    out.foreach { r =>
      val d = r.getAs[Long]("d").toInt
      assert(r.getAs[Long]("pc1_micro") == v1(d).toLong)
      assert(r.getAs[Long]("pc2_micro") == v2(d).toLong)
      assert(r.getAs[Long]("defl_diag") == defl(d, d).toLong)
      assert(r.getAs[Long]("lambda1_unit") == lambda1.toLong)
      assert(r.getAs[Long]("lambda2_unit") == lambda2.toLong)
      assert(r.getAs[Long]("aniso_before_ppm") == (lambda1 * 1000000 / tr1).toLong)
      assert(r.getAs[Long]("aniso_after_ppm") == (lambda2 * 1000000 / tr2).toLong)
    }
    // NOT asserted: λ2 < λ1. That holds only at full convergence; on a
    // near-isotropic corpus 8 truncated rounds leave v1 imperfect, the
    // Rayleigh estimate underestimates the true top, and the deflated
    // matrix can legitimately report slightly more. The exactness
    // asserts above are the contract; these are the real invariants:
    val before = out.head.getAs[Long]("aniso_before_ppm")
    val after = out.head.getAs[Long]("aniso_after_ppm")
    assert(after > 0L && after <= 1000000L && before > 0L && before <= 1000000L)
    // removed mass is exactly λ1 up to per-cell truncation (≤ 1 per cell)
    assert((tr1 - tr2 - lambda1).abs <= dims)
  }

  test("c114 silhouette: exact a/b/s recompute against the c50 assignment") {
    import graft.embed.EmbedQueries
    val out = EmbedQueries.c114Silhouette(spark, sf).collect()
    val vecs = graft.Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val cents = vecs.filter(_._1 < EmbedQueries.KmCents).sortBy(_._1)
    def d6(a: Array[Double], b: Array[Double]): Double = {
      val s = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
      BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def micro(d: Double): Long =
      BigDecimal(d * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    assert(out.length == vecs.length)
    val assign = EmbedQueries.c50KmeansAssign(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("cluster")).toMap
    out.foreach { row =>
      val id = row.getLong(0)
      val ds = cents.map { case (cid, ce) => (d6(vecs.toMap.apply(id), ce), cid) }
        .sortBy(identity)
      val (a, b) = (micro(ds(0)._1), micro(ds(1)._1))
      assert(row.getAs[Long]("cluster") == ds(0)._2)
      assert(row.getAs[Long]("cluster") == assign(id), s"c50 mismatch vec $id")
      assert(row.getAs[Long]("a_micro") == a, s"a vec $id")
      assert(row.getAs[Long]("b_micro") == b, s"b vec $id")
      assert(row.getAs[Long]("s_ppm") == (b - a) * 1000000L / math.max(math.max(a, b), 1L))
      // nearest-assignment silhouette is nonnegative by construction
      assert(row.getAs[Long]("s_ppm") >= 0L && row.getAs[Long]("s_ppm") <= 1000000L)
    }
    // centroid vectors sit at distance 0 from themselves: perfect score
    (0L until EmbedQueries.KmCents.toLong).foreach { cid =>
      val r = out.find(_.getLong(0) == cid).get
      assert(r.getAs[Long]("a_micro") == 0L && r.getAs[Long]("s_ppm") == 1000000L)
    }
  }

  test("c115 k-center: exact greedy farthest-point recompute, radius sanity") {
    import graft.embed.EmbedQueries
    val out = EmbedQueries.c115KCenter(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val vecs = graft.Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val byId = vecs.toMap
    def dMicro(a: Array[Double], b: Array[Double]): Long = {
      val s = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
      val r6 = BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      BigDecimal(r6 * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    var md = vecs.map { case (id, v) => id -> dMicro(v, byId(0L)) }.toMap
    val expect = scala.collection.mutable.ListBuffer[(Long, Long, Long)]((1L, 0L, -1L))
    for (t <- 2 to EmbedQueries.KCenters) {
      val (cid, radius) = md.toSeq.minBy { case (id, d) => (-d, id) }match {
        case (id, d) => (id, d)
      }
      expect += ((t.toLong, cid, radius))
      md = md.map { case (id, d) => id -> math.min(d, dMicro(byId(id), byId(cid))) }
    }
    assert(out.toSeq == expect.toSeq)
    // radii are non-increasing after the seed (greedy picks ever-closer
    // farthest points) and strictly positive on a non-degenerate corpus
    val radii = out.filter(_._1 >= 2L).map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b })
    assert(radii.forall(_ > 0L))
    // centers are distinct
    assert(out.map(_._2).distinct.length == out.length)
  }
}
