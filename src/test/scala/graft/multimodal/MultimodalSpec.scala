package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {

  test("c34 patchify: full grid per image, offsets within the RGB buffer") {
    val r = Multimodal.c34Patchify(spark, sf)
    assert(r.count() > 0)
    // every retained image carries exactly n_cols*n_rows patches, indexed 0..n-1
    val bad = r.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("patch_idx").as("mx"),
        first("n_cols").as("c"), first("n_rows").as("rw"))
      .filter(col("n") =!= col("c") * col("rw") || col("mx") =!= col("n") - 1)
    assert(bad.count() == 0)
    // patch origins stay inside the resized frame and offsets are in-bounds
    val dims = Multimodal.c16ResizePlan(spark, sf).select("doc_id", "out_w", "out_h")
    val oob = r.join(dims, "doc_id").filter(
      col("px") + Multimodal.PatchSide > col("out_w") ||
      col("py") + Multimodal.PatchSide > col("out_h") ||
      col("byte_offset") < 4 ||
      col("byte_offset") >= lit(4) + col("out_w") * col("out_h") * 3)
    assert(oob.count() == 0)
  }

  test("c65 audio frames: hop stride, maximal last frame, exact microsecond clock") {
    val r = Multimodal.c65AudioFrames(spark, sf)
    assert(r.count() > 0)
    // frames are 0..n_frames-1 with sample_off = idx*hop and t_us on the 2 ms grid
    val badFrame = r.filter(
      col("sample_off") =!= col("frame_idx") * Multimodal.FrameHop ||
      col("byte_off") =!= lit(4L) + col("sample_off") * 2 ||
      col("t_us") =!= col("frame_idx") * (Multimodal.FrameHop * 1000000L / Multimodal.AudioRate))
    assert(badFrame.count() == 0)
    // per doc: contiguous indices, every frame fits, and one more would not
    val perDoc = r.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("frame_idx").as("mx"),
        first("n_frames").as("nf"), first("n_samples").as("ns"))
    val bad = perDoc.filter(
      col("n") =!= col("nf") || col("mx") =!= col("nf") - 1 ||
      (col("nf") - 1) * Multimodal.FrameHop + Multimodal.FrameWin > col("ns") ||
      col("nf") * Multimodal.FrameHop + Multimodal.FrameWin <= col("ns"))
    assert(bad.count() == 0)
    // docs shorter than one window are absent
    val short = graft.Tables(spark, sf, "documents")
      .filter(expr(s"n_chars div 2 < ${Multimodal.FrameWin}")).select("doc_id")
    assert(r.join(short, "doc_id").count() == 0)
  }

  test("c106 av align: exact as-of recompute, sentinel for audio-less assets") {
    val out = Multimodal.c106AvAlign(spark, sf).collect()
    val audio = Multimodal.c65AudioFrames(spark, sf)
      .select("doc_id", "frame_idx", "t_us").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._2)).toMap
    val video = Multimodal.c13FrameSample(spark, sf)
      .select("doc_id", "frame_idx", "pts_ms").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2) * 1000L))
    assert(out.length == video.length)
    val byKey = out.map(r => ((r.getLong(0), r.getLong(1)), r)).toMap
    video.foreach { case (doc, vIdx, ptsUs) =>
      val row = byKey((doc, vIdx))
      assert(row.getAs[Long]("pts_us") == ptsUs)
      val expected = audio.get(doc).flatMap(fr =>
        fr.reverseIterator.find(_._2 <= ptsUs))
      expected match {
        case Some((aIdx, aUs)) =>
          assert(row.getAs[Long]("a_idx") == aIdx, s"doc $doc v $vIdx")
          assert(row.getAs[Long]("a_t_us") == aUs)
          assert(row.getAs[Long]("lag_us") == ptsUs - aUs)
          assert(row.getAs[Long]("lag_us") >= 0L)
        case None =>
          assert(row.getAs[Long]("a_idx") == -1L)
          assert(row.getAs[Long]("a_t_us") == -1L)
          assert(row.getAs[Long]("lag_us") == -1L)
      }
    }
    // the audio-less sentinel path is genuinely exercised on this corpus
    assert(out.exists(_.getAs[Long]("a_idx") == -1L))
    assert(out.exists(_.getAs[Long]("a_idx") >= 0L))
  }

  test("c126 phash: exact aHash recompute, banding finds every near pair it should") {
    val out = Multimodal.c126Phash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = graft.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def phash(text: String): Long = {
      val bs = text.map(_.toInt.toLong)
      val nTotal = bs.length.toLong
      val total = bs.sum
      val byBlk = bs.zipWithIndex.groupBy(_._2 % Multimodal.PhashBits)
      (0 until Multimodal.PhashBits).map { blk =>
        byBlk.get(blk) match {
          case Some(g) =>
            val s = g.map(_._1).sum
            if (s * nTotal > total * g.length) 1L << blk else 0L
          case None => 0L
        }
      }.sum
    }
    val hashes = docs.map { case (id, t) => (id, phash(t)) }
    assert(out.map(r => (r._1, r._2)).toSeq == hashes.sortBy(_._1).toSeq)
    // brute-force banding + hamming counts
    def bands(h: Long): Set[(Int, Long)] =
      (0 until Multimodal.PhashBands).map(k => (k, (h >> (12 * k)) & 4095L)).toSet
    val expect = hashes.map { case (id, h) =>
      val cands = hashes.filter(o => o._1 != id && bands(o._2).intersect(bands(h)).nonEmpty)
      val near = cands.count(o => java.lang.Long.bitCount(o._2 ^ h) <= Multimodal.PhashHamT)
      (id, h, cands.length.toLong, near.toLong)
    }.sortBy(_._1)
    assert(out.toSeq == expect.toSeq)
    // banding is an over-approximation that still has discrimination:
    // some docs collide on a band, and not everything near-matches
    assert(out.exists(_._3 > 0L))
    assert(out.exists(r => r._3 > r._4), "every candidate near-matched — threshold vacuous")
    // a hash-identical pair (byte-identical re-encode stand-in) is near
    // by construction wherever duplicate texts exist
    val dupHashes = hashes.groupBy(_._2).filter(_._2.length > 1)
    if (dupHashes.nonEmpty)
      assert(out.filter(r => dupHashes.contains(r._2)).forall(_._4 > 0L))
  }

  test("c126 class algebra: dup-heavy corpus counts match the doc-level definition") {
    import org.apache.spark.sql.functions._
    // 120 docs over only 5 distinct texts (heavy classes, cnt up to 40;
    // base/variant differ by one byte, verified to produce DIFFERENT
    // phashes that still share an LSH band at hamming 1 — the cross-
    // class join path), plus the adversarial rows the class path must
    // not mishandle: a NULL text and an empty text (both vanish — the
    // explode emits no rows), and a singleton class (cnt − 1 = 0)
    val base = "the quick brown fox jumps over the lazy dog again and again " +
      "and then some more filler text to cross ninety six characters total ok"
    val texts = Seq(
      base,
      base.updated(7, 'E'), // one byte, different phash, shared band
      "pack my box with five dozen liquor jugs for the long haul",
      "completely unrelated payload with different byte statistics!!",
      "a singleton class text that matches nothing else in the corpus xyzzy")
    val docs = spark.range(120).select(col("id").as("doc_id"),
        element_at(array(texts.map(lit): _*),
          when(col("id") < 40, 1).when(col("id") < 60, 2)
            .when(col("id") < 90, 3).when(col("id") < 119, 4)
            .otherwise(5).cast("int")).as("text"))
      .unionByName(spark.range(120, 122).select(col("id").as("doc_id"),
        when(col("id") === 120, lit(null: String)).otherwise(lit("")).as("text")))
    val out = Multimodal.phashCandCounts(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // NULL/empty texts vanish exactly like the explode plan's rows do
    assert(out.forall(r => r._1 != 120L && r._1 != 121L))
    assert(out.length == 120)
    // brute-force doc-level recompute (the pre-rewrite definition)
    def bands(h: Long): Set[(Int, Long)] =
      (0 until Multimodal.PhashBands).map(k => (k, (h >> (12 * k)) & 4095L)).toSet
    val hashes = out.map(r => (r._1, r._2))
    val expect = hashes.map { case (id, h) =>
      val cands = hashes.filter(o => o._1 != id && bands(o._2).intersect(bands(h)).nonEmpty)
      val near = cands.count(o => java.lang.Long.bitCount(o._2 ^ h) <= Multimodal.PhashHamT)
      (id, h, cands.length.toLong, near.toLong)
    }.sortBy(_._1)
    assert(out.toSeq == expect.toSeq)
    // the fixture genuinely exercises the class terms: a heavy class
    // (within-class cnt − 1 arithmetic) and at least one cross-class
    // band collision (the distinct-phash join path)
    val byHash = hashes.groupBy(_._2).map(_._2.length)
    assert(byHash.max >= 10, s"no heavy class: $byHash")
    val maxCnt = byHash.max.toLong
    assert(expect.exists(r => r._3 > maxCnt - 1), "no cross-class collision exercised")
  }
}
