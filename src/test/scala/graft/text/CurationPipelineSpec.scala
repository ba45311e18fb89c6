package graft.text

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class CurationPipelineSpec extends SparkTestBase {

  test("curation composition: every stage monotone, output decontaminated and packed") {
    val out = Files.createTempDirectory("graft-curation").toString
    val r = CurationPipeline.run(spark, sf, out)

    // monotone funnel — and every gate actually fires on this corpus
    assert(r.total > 0)
    assert(r.afterGates < r.total)
    assert(r.afterExact <= r.afterGates)
    assert(r.afterNear < r.afterExact)
    val kept = r.train + r.val_ + r.test
    assert(r.afterSegTrim <= r.afterNear - r.droppedContaminated)
    assert(kept == r.afterSegTrim)
    assert(r.segTokensDropped >= 0)
    assert(r.sequences > 0 && r.sequences <= kept)

    // the written corpus is split-partitioned and re-readable
    val corpus = spark.read.parquet(s"$out/corpus")
    assert(corpus.count() == kept)
    assert(corpus.select("split").distinct().count() == 3)

    // no surviving train doc shares a gram with the test split
    val contaminated = TextQueries.c29Contamination(spark, sf)
      .select("doc_id")
    val dirty = corpus.filter(col("split") === "train")
      .join(contaminated, "doc_id")
    assert(dirty.count() == 0)

    // texts are unique after the exact-dedup stage
    assert(corpus.select("text").distinct().count() == corpus.count())

    // identity is unique too: the pipeline OUTPUT satisfies the doc_id
    // uniqueness precondition Tables.documents documents (the c141
    // contract — ingest-job enforcement, not per-read)
    assert(corpus.select("doc_id").distinct().count() == corpus.count())

    // tokenization stage: every doc carries a token array; merges
    // learned (BpeIters of them) and applied — post-merge token mass is
    // below the whitespace mass by exactly the merge reduction, and
    // reconstructing the text from tokens (undoing the '_' joins)
    // round-trips
    assert(r.bpeMerges == TextQueries.BpeIters.toLong)
    val wsTokens = corpus
      .agg(sum(regexp_count(col("text"), lit("\\S+")).cast("long"))).head().getLong(0)
    assert(r.tokensAfterBpe <= wsTokens && r.tokensAfterBpe > 0)
    val badRoundTrip = corpus.filter(
      array_join(transform(col("toks"), t => regexp_replace(t, lit("_"), lit(" "))), " ")
        =!= col("text"))
    assert(badRoundTrip.count() == 0)

    // quality and repetition gates really applied
    val gatesViolated = corpus
      .join(TextQueries.c3QualityScore(spark, sf).select("doc_id", "quality_micro"), "doc_id")
      .join(TextQueries.c26Repetition(spark, sf).select("doc_id", "dup_frac_micro"), "doc_id")
      .filter(col("quality_micro") < CurationPipeline.MinQualityMicro
        || col("dup_frac_micro") > CurationPipeline.MaxDupFracMicro)
    assert(gatesViolated.count() == 0)

    // stage 9: the mixture table covers exactly the curated train
    // sources with scored docs, and the weights renormalize to 1e6
    // within one truncation unit per source
    val mixture = spark.read.parquet(s"$out/mixture")
    val trainSources = corpus.filter(col("split") === "train")
      .join(TextQueries.c31LmScore(spark, sf).select("doc_id"), "doc_id")
      .select("source").distinct().count()
    assert(r.mixSources == trainSources)
    assert(mixture.count() == r.mixSources)
    assert(r.mixMassMicro <= 1000000L && r.mixMassMicro >= 1000000L - r.mixSources)
    // weights are loss-monotone (the C105 contract, preserved by composition)
    val mrows = mixture.orderBy("loss_micro").collect()
    mrows.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getAs[Long]("w_micro") <= hi.getAs[Long]("w_micro"))
      case _ =>
    }

    // stage 10: tokenizer-equity covers every curated lang; fertility is
    // ≥ 1 piece per word; the train-derived vocab is total on the WHOLE
    // curated corpus (val/test included — no UNK path ever fired, or the
    // expression would have thrown and failed the run)
    val equity = spark.read.parquet(s"$out/tokenizer_equity")
    assert(r.wpLangs == corpus.select("lang").distinct().count())
    assert(equity.count() == r.wpLangs)
    assert(equity.filter(col("fertility_nano") < 1000000000L).count() == 0)
    assert(r.wpPieces >= wsTokens, "fewer pieces than words — segmentation lost words")

    // stage 11: chunk telemetry covers every curated lang, the chunks
    // tile the curated token stream EXACTLY (split-token mass, empties
    // included — the chunker's tokenization), and curation left
    // strictly less sub-document duplication than the raw corpus
    val chunkTel = spark.read.parquet(s"$out/chunk_dedup")
    assert(chunkTel.count() == r.wpLangs)
    val telAgg = chunkTel.agg(sum("n_chunks"), sum("n_tokens"), sum("dup_tokens")).head()
    assert(telAgg.getLong(0) == r.cdcChunks)
    assert(telAgg.getLong(2) == r.cdcDupTokens)
    val splitToks = corpus
      .agg(sum(size(split(col("text"), " ")).cast("long"))).head().getLong(0)
    assert(telAgg.getLong(1) == splitToks, "chunks do not tile the curated corpus")
    val raw = TextQueries.cdcChunkFrame(
      Tables(spark, sf, "documents"), Seq("doc_id"))
    val rawOcc = raw.groupBy("fp", "clen").agg(count(lit(1)).as("occ"))
    val rawAgg = raw.join(rawOcc, Seq("fp", "clen"))
      .agg(sum(when(col("occ") >= 2, col("clen")).otherwise(0L)), sum("clen")).head()
    val rawPpm = rawAgg.getLong(0) * 1000000L / rawAgg.getLong(1)
    val curPpm = r.cdcDupTokens * 1000000L / telAgg.getLong(1)
    assert(rawPpm > 0L, "raw corpus has no chunk duplication — telemetry is vacuous")
    assert(curPpm < rawPpm,
      s"curation did not reduce sub-document duplication ($curPpm vs $rawPpm ppm)")

    // stage 12: the epoch draw is exactly-K per train source (min(K, n)
    // where a source is small), drawn only from curated TRAIN docs, and
    // reproducible — the race has zero RNG state, so a re-read re-ranks
    // identically
    val drawn = spark.read.parquet(s"$out/sample_draw")
    assert(r.drawRows == drawn.count())
    val trainBySource = corpus.filter(col("split") === "train")
      .groupBy("source").count().collect()
      .map(rr => rr.getString(0) -> rr.getLong(1)).toMap
    assert(r.drawSources == trainBySource.size.toLong)
    drawn.groupBy("source").count().collect().foreach { rr =>
      val src = rr.getString(0)
      assert(rr.getLong(1) ==
        math.min(TextQueries.SampleK.toLong, trainBySource(src)), src)
    }
    val leaked = drawn.select("doc_id")
      .join(corpus.filter(col("split") =!= "train").select("doc_id"), "doc_id")
    assert(leaked.count() == 0, "epoch draw sampled outside the train split")
    // ranks are dense 1..k per source
    val badRanks = drawn.groupBy("source")
      .agg(count(lit(1)).as("k"), max("rnk").as("mx"), min("rnk").as("mn"))
      .filter(col("mx") =!= col("k") || col("mn") =!= 1L)
    assert(badRanks.count() == 0, "epoch-draw ranks are not dense 1..k")
  }
}
