package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** The LLM-training-data curation flow, composed end-to-end from the
  * audited SURVEY §2 C-block operators — the text-side counterpart of
  * [[graft.Pipeline]]'s geo flow. Stages:
  *
  *  1. quality gate (C3 composite score) + repetition gate (C26
  *     duplicate-token fraction) — map-side filters;
  *  2. exact dedup, keep-min-id per identical text (C1);
  *  3. near-duplicate collapse — keep only each C19 cluster's canonical
  *     (the corpus-wide MinHash-LSH + Jaccard closure);
  *  4. deterministic train/val/test split (C23's affine hash);
  *  5. decontamination — drop TRAIN docs sharing a 4-gram with any
  *     held-out test doc (C29), then segment-level trim — duplicated
  *     10-token segments cut from every surviving doc (C40, the CCNet
  *     paragraph-dedup step);
  *  6. sequence packing per source shard (C27's contiguous fill);
  *  7. tokenization — BPE merges learned on a deterministic sample of
  *     the curated TRAIN split only (held-out text must not shape the
  *     tokenizer), applied to every surviving doc in one
  *     partition-local pass (C96's native BpeSegment expression);
  *  8. write the curated, tokenized corpus as parquet partitioned by
  *     split — the layout a training job consumes (split pruning for
  *     free, token arrays ready to pack into batches);
  *  9. mixture plan — DoReMi multiplicative weights (C105) over the
  *     curated train split, written next to the corpus as the
  *     per-source sampling table a training job reads.
  * 10. tokenizer-equity report — WordPiece fertility per language over
  *     the curated corpus (C119's second tokenizer family), vocab
  *     derived from the curated TRAIN split only (stage 7's held-out
  *     hygiene), written next to the mixture as the per-lang table a
  *     vocab-size/mix decision reads.
  * 11. chunk-dedup telemetry — C127/D37's content-defined chunking
  *     over the curated corpus: how much SUB-document duplication
  *     survived gates + exact dedup + near-dup collapse + segment
  *     trim, per lang (occ ≥ 2, the chunk-store convention) — the
  *     audit a dedup stack publishes next to its output.
  * 12. epoch draw — C130's derandomized Efraimidis–Spirakis race over
  *     the curated TRAIN split: exactly SampleK docs per source,
  *     quality-weighted, reproducible with zero RNG state — the
  *     concrete "which docs this epoch" table that turns stage 9's
  *     per-source mixture WEIGHTS into an actual document list a
  *     training job can read.
  *
  * Every stage is declarative DataFrame algebra over the same operators
  * the driver hash-checks individually; the composition adds no new
  * semantics, only joins on doc_id. At 100 TB each stage is the same
  * shape it is here: the gates are map-side, dedup/collapse shuffle
  * once on their keys, the split is a pure column, decontamination is
  * one hash equi-join against a DISTINCT test-gram set, and the final
  * write is partitioned so downstream readers prune.
  */
object CurationPipeline {

  /** Gate thresholds (micro-units, SURVEY §5): shared with the C36
    * decision table so the pipeline and the audit report can't drift —
    * chosen so each gate actually fires on the synthetic corpus
    * (quality cuts the bottom ~decile, the repetition gate the most
    * degenerate tail).
    */
  val MinQualityMicro = TextQueries.MinQualityMicro
  val MaxDupFracMicro = TextQueries.MaxDupFracMicro

  final case class Result(
      total: Long, afterGates: Long, afterExact: Long, afterNear: Long,
      train: Long, val_ : Long, test: Long, droppedContaminated: Long,
      afterSegTrim: Long, segTokensDropped: Long,
      sequences: Long, bpeMerges: Long, tokensAfterBpe: Long,
      mixSources: Long, mixMassMicro: Long,
      wpLangs: Long, wpPieces: Long,
      cdcChunks: Long, cdcDupTokens: Long,
      drawRows: Long, drawSources: Long)

  /** spark-submit entry: runMain graft.text.CurationPipeline <sfDir> <outDir>. */
  def main(args: Array[String]): Unit = {
    val Array(dir, outDir) = args
    val spark = GraftSession.local()
    val r = run(spark, dir, outDir)
    println(s"CURATION $r")
    spark.stop()
  }

  /** C23's split assignment as a reusable column (same affine hash). */
  def splitCol(docId: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = pmod(docId * lit(2654435761L) + lit(40503L), lit(100L))
    when(h < 80, "train").when(h < 90, "val").otherwise("test")
  }

  def run(spark: SparkSession, dir: String, outDir: String): Result = {
    val docs = Tables.documents(spark, dir)

    // 1. quality + repetition gates (C3, C26)
    val quality = TextQueries.c3QualityScore(spark, dir)
      .select(col("doc_id"), col("quality_micro"))
    val repetition = TextQueries.c26Repetition(spark, dir)
      .select(col("doc_id"), col("dup_frac_micro"))
    val gated = docs
      .join(quality, "doc_id").join(repetition, "doc_id")
      .filter(col("quality_micro") >= MinQualityMicro
        && col("dup_frac_micro") <= MaxDupFracMicro)
      .select("doc_id", "text", "lang", "source")

    // 2. exact dedup: keep the min surviving doc_id per identical text
    val exact = gated
      .join(gated.groupBy("text").agg(min("doc_id").as("doc_id")),
        Seq("doc_id", "text"), "left_semi")

    // 3. near-dup collapse: the corpus-wide C19 closure's canonicals.
    // Collapse decisions come from the FULL corpus graph (a gated-out
    // doc still witnesses that its near-twins are duplicates).
    val canonicals = graft.dedup.DedupQueries.c19DedupCollapse(spark, dir)
      .filter(col("keep")).select("doc_id")
    val near = exact.join(canonicals, Seq("doc_id"), "left_semi")

    // 4. deterministic split (C23)
    val split = near.withColumn("split", splitCol(col("doc_id")))

    // 5. decontamination (C29): train docs sharing a gram with test
    val contaminated = TextQueries.c29Contamination(spark, dir).select("doc_id")
    val clean = split.join(
      contaminated.withColumn("is_train_hit", lit(true)), Seq("doc_id"), "left")
      .filter(col("split") =!= "train" || col("is_train_hit").isNull)
      .drop("is_train_hit")

    // 5b. segment-level trim (C40): rewrite each surviving doc without
    // its globally-duplicated 10-token segments — the CCNet paragraph
    // dedup applied INSIDE the funnel (duplicate counts come from the
    // post-decontamination corpus, so a gated-out doc's boilerplate no
    // longer condemns a survivor's). A doc that is pure boilerplate
    // loses every segment and drops out here.
    val seg = TextQueries.segmentsOn(clean)
      .select("doc_id", "lang", "source", "split", "seg", "seg_text")
    val dupSegs = seg.groupBy("seg_text").agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= 2).select("seg_text")
    val trimmed = seg
      .join(dupSegs.withColumn("dup", lit(true)), Seq("seg_text"), "left")
      .filter(col("dup").isNull)
      .groupBy("doc_id", "lang", "source", "split")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("seg"), col("seg_text")))),
          s => s("seg_text")), " ").as("text"))

    // 6. sequence packing per source shard (C27's window)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val packed = trimmed
      .withColumn("n_tok", regexp_count(col("text"), lit("\\S+")).cast("long"))
      .withColumn("cum", sum("n_tok").over(w))
      .withColumn("seq_id", expr(s"(cum - n_tok) div ${TextQueries.SeqBudget}"))
      .drop("cum")

    // 7. tokenize: learn the BPE merge table on a deterministic sample
    // of the curated TRAIN split only (held-out text must not shape the
    // tokenizer — the same leakage rule as decontamination), then
    // segment EVERY surviving doc in one partition-local pass with the
    // native BpeSegment expression (C96's production apply shape: the
    // K-row merge table rides into codegen, the corpus is scanned
    // once). The token array is the column a trainer actually reads.
    val trainSample = packed.filter(col("split") === "train"
      && pmod(col("doc_id"), lit(TextQueries.SegmentSampleMod.toLong)) === 0L)
      .select("doc_id", "text")
    val merges = TextQueries.bpeMergesOn(trainSample)
      .orderBy("iter").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val tokenized = packed.withColumn("toks",
      graft.functions.textseg.bpe_segment(col("text"), merges))

    // 8. partitioned corpus write — training readers prune on split
    tokenized.write.mode("overwrite").partitionBy("split")
      .parquet(s"$outDir/corpus")
    val out = spark.read.parquet(s"$outDir/corpus")

    // 9. mixture plan (C105): DoReMi multiplicative weights over the
    // CURATED train split — the per-source sampling weights a training
    // job reads next to the corpus. Computed after curation (weights
    // over documents that no longer exist would bias the mix), through
    // the same doremiWeights definition the driver hash-checks.
    val mixture = TextQueries.doremiWeights(
      out.filter(col("split") === "train").select(col("doc_id"), col("source"))
        .join(TextQueries.c31LmScore(spark, dir)
          .select("doc_id", "avg_cond_micro"), "doc_id"))
    mixture.write.mode("overwrite").parquet(s"$outDir/mixture")
    val mixRows = spark.read.parquet(s"$outDir/mixture").collect()

    // 10. tokenizer-equity report (C119): WordPiece fertility per lang
    // over the CURATED corpus, vocab from the curated TRAIN split only
    // (held-out text must not shape the tokenizer — stage 7's rule).
    // LEARNED pieces come from train only; the single-char ALPHABET
    // layer comes from the whole curated corpus (the byte-fallback
    // principle: a val/test char unseen in train must not crash the
    // apply — chars are alphabet, not learned structure)
    val (wpInit0, wpCont0) = TextQueries.wpVocabOn(
      out.filter(col("split") === "train").select("text"))
    val corpusChars = out
      .select(explode(expr("filter(split(text, ' '), t -> length(t) > 0)")).as("w"))
      .select(explode(expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))")).as("p"))
      .distinct().collect().map(_.getString(0)).toSeq
    val wpInit = (wpInit0 ++ corpusChars).distinct.sorted
    val wpCont = (wpCont0 ++ corpusChars).distinct.sorted
    val equity = out
      .select(col("lang"),
        size(expr("filter(split(text, ' '), t -> length(t) > 0)"))
          .cast("long").as("n_words"),
        size(graft.functions.textseg.wordpiece_segment(col("text"), wpInit, wpCont))
          .cast("long").as("n_pieces"))
      .groupBy("lang")
      .agg(sum("n_words").as("n_words"), sum("n_pieces").as("n_pieces"))
      .withColumn("fertility_nano", expr("(n_pieces * 1000000000) div n_words"))
    equity.write.mode("overwrite").parquet(s"$outDir/tokenizer_equity")
    val equityRows = spark.read.parquet(s"$outDir/tokenizer_equity").collect()

    // 11. chunk-dedup telemetry over the curated corpus (C127/D37's
    // shared CDC definition, occ >= 2 convention)
    val chunkFrame = TextQueries.cdcChunkFrame(
      out.select("doc_id", "lang", "text"), Seq("doc_id", "lang"))
    val chunkOcc = chunkFrame.groupBy("fp", "clen").agg(count(lit(1)).as("occ"))
    val chunkTel = chunkFrame.join(chunkOcc, Seq("fp", "clen"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("occ") >= 2, 1L).otherwise(0L)).as("dup_chunks"),
        sum("clen").as("n_tokens"),
        sum(when(col("occ") >= 2, col("clen")).otherwise(0L)).as("dup_tokens"))
      .withColumn("dup_mass_ppm", expr("(dup_tokens * 1000000) div n_tokens"))
    chunkTel.write.mode("overwrite").parquet(s"$outDir/chunk_dedup")
    val chunkRows = spark.read.parquet(s"$outDir/chunk_dedup").collect()

    // 12. epoch draw (C130's exact race, same constants) over the
    // curated TRAIN split — exactly SampleK docs per source, selection
    // probability increasing in the C3 quality weight, zero RNG state;
    // the per-source top-K decorrelates to WindowGroupLimit, so map
    // tasks keep K-row heaps, never a per-source corpus sort
    val drawToks = TextQueries.tokens(col("text"))
    val draw = {
      val weighted = out.filter(col("split") === "train")
        .select(col("doc_id"), col("source"),
          size(drawToks).cast("long").as("n_tokens"),
          size(filter(drawToks, t => t.isin(TextQueries.Stopwords: _*)))
            .cast("long").as("stop_cnt"))
        .withColumn("w_micro", TextQueries.qualityMicro + lit(1L))
      TextQueries.esRace(weighted)
        .filter(col("rnk") <= TextQueries.SampleK)
        .select("source", "rnk", "doc_id", "w_micro")
    }
    draw.write.mode("overwrite").parquet(s"$outDir/sample_draw")
    val drawnRows = spark.read.parquet(s"$outDir/sample_draw").collect()

    def n(df: DataFrame): Long = df.count()
    val bySplit = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def tokenMass(df: DataFrame): Long = df
      .agg(coalesce(sum(regexp_count(col("text"), lit("\\S+")).cast("long")), lit(0L)))
      .head().getLong(0)
    Result(
      total = n(docs), afterGates = n(gated), afterExact = n(exact),
      afterNear = n(near),
      train = bySplit.getOrElse("train", 0L),
      val_ = bySplit.getOrElse("val", 0L),
      test = bySplit.getOrElse("test", 0L),
      droppedContaminated = n(split) - n(clean),
      afterSegTrim = n(trimmed),
      segTokensDropped = tokenMass(clean) - tokenMass(trimmed),
      sequences = out.select("source", "seq_id").distinct().count(),
      bpeMerges = merges.size.toLong,
      tokensAfterBpe = out
        .agg(coalesce(sum(size(col("toks")).cast("long")), lit(0L)))
        .head().getLong(0),
      mixSources = mixRows.length.toLong,
      mixMassMicro = mixRows.map(_.getAs[Long]("w_micro")).sum,
      wpLangs = equityRows.length.toLong,
      wpPieces = equityRows.map(_.getAs[Long]("n_pieces")).sum,
      cdcChunks = chunkRows.map(_.getAs[Long]("n_chunks")).sum,
      cdcDupTokens = chunkRows.map(_.getAs[Long]("dup_tokens")).sum,
      drawRows = drawnRows.length.toLong,
      drawSources = drawnRows.map(_.getAs[String]("source")).distinct.length.toLong)
  }
}
