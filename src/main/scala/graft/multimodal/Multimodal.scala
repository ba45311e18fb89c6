package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY.md §2 C12: multimodal-column plumbing. Media lives as an
  * opaque `binary` column + typed metadata; decode/feature-extract runs
  * batch-wise in `mapPartitions` (the shape a real image decoder — absent
  * in this container — would slot into: fixed-size batches, Iterator in /
  * Iterator out, no whole-partition materialization).
  *
  * The decode step is a DETERMINISTIC STUB (header check + byte
  * arithmetic standing in for width/height extraction); everything
  * around it — payload synthesis, schema, batching, partition flow — is
  * real. The DuckDB twin recomputes the same bytes from `text` (ASCII ⇒
  * 1 byte/char), which is what makes the stub oracle-checkable.
  */
object Multimodal {

  val BatchSize = 64
  val Magic: Array[Byte] = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)

  final case class DocBin(doc_id: Long, payload: Array[Byte])

  /** Synthesize the binary column: 4-byte magic + UTF-8 text payload. */
  def payloads(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        concat(lit(Magic), col("text").cast("binary")).as("payload"))

  /** Stub "decode": header sniff + pseudo width/height from the first 8
    * body CODEPOINTS (both engines speak codepoints — DuckDB's `ascii` —
    * while raw UTF-8 bytes are Spark-only; fuzz-harness find on
    * accented/astral texts). Byte-level facts (n_bytes, the %3 format
    * rule) stay byte-level: the twin reads them via
    * `octet_length(encode(text))`. A row with NO payload must survive
    * decode as (NULL dims, format='missing') — the quarantine policy; a
    * thrown NPE here would kill a 100 TB ingest on one bad row
    * (fuzz-harness find, NULL-text domain). Replace the body of
    * [[decodeOne]] with a real codec call; the batching, schema, and
    * missing-row contract stay.
    */
  private def decodeOne(d: DocBin): (Long, java.lang.Long, java.lang.Long, java.lang.Long, String) = {
    if (d.payload == null) (d.doc_id, null, null, null, "missing")
    else {
      val isPng = d.payload.take(4).sameElements(Magic)
      val body = d.payload.drop(4)
      val cps = new String(body, java.nio.charset.StandardCharsets.UTF_8)
        .codePoints().toArray
      val s8 = cps.take(8).map(_.toLong).sum
      val width = 64L + (s8 * 31L) % 960L
      val height = 64L + (s8 * 17L) % 960L
      val fmt =
        if (!isPng) "raw"
        else (body.length % 3) match { case 0 => "png"; case 1 => "jpg"; case _ => "webm" }
      (d.doc_id, Long.box(d.payload.length.toLong), Long.box(width), Long.box(height), fmt)
    }
  }

  def c12MultimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    payloads(spark, dir).as[DocBin]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch => batch.iterator.map(decodeOne) }
      }
      .toDF("doc_id", "n_bytes", "width", "height", "format")
      .orderBy("doc_id")
  }

  val c12Sql: String = {
    val s8 = (1 to 8).map(i => s"ascii(substring(text, $i, 1))").mkString(" + ")
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CAST(octet_length(encode(text)) + 4 AS BIGINT) AS n_bytes,
       |    CAST($s8 AS BIGINT) AS s8,
       |    octet_length(encode(text)) AS body_len
       |  FROM fdoc
       |)
       |SELECT doc_id, n_bytes,
       |  64 + (s8 * 31) % 960 AS width,
       |  64 + (s8 * 17) % 960 AS height,
       |  CASE WHEN n_bytes IS NULL THEN 'missing'
       |       WHEN body_len % 3 = 0 THEN 'png'
       |       WHEN body_len % 3 = 1 THEN 'jpg'
       |       ELSE 'webm' END AS format
       |FROM m ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- C13
  /** Frame sampling over "video" payloads: treat the binary body as
    * fixed-size 64-byte frames, keep every 4th frame, and emit
    * (frame_idx, byte offset, presentation timestamp, stub feature).
    * The frame table explodes map-side (`sequence`+`explode`), so at
    * 100 TB the fan-out happens inside the scan partition — no shuffle
    * until a consumer aggregates. The per-frame "feature" is the stub
    * standing in for a real decoder+encoder pass (c12's contract).
    */
  val FrameBytes = 64L
  val SampleEvery = 4L
  val FrameMs = 40L // 25 fps

  def c13FrameSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        greatest(lit(1L), expr(s"n_chars div $FrameBytes")).as("n_frames"))
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_idx"))
      .filter(col("frame_idx") % SampleEvery === 0)
      .select(col("doc_id"), col("n_frames"), col("frame_idx"),
        (lit(4L) + col("frame_idx") * FrameBytes).as("byte_offset"),
        (col("frame_idx") * FrameMs).as("pts_ms"),
        (((col("doc_id") * lit(2654435761L)) + col("frame_idx") * lit(40503L)) % 1000L)
          .as("frame_feature"))
      .orderBy("doc_id", "frame_idx")

  val c13Sql: String =
    s"""WITH f AS (
       |  SELECT doc_id, greatest(1, n_chars // $FrameBytes) AS n_frames FROM fdoc
       |), fr AS (
       |  SELECT doc_id, n_frames, UNNEST(range(0, n_frames)) AS frame_idx FROM f
       |)
       |SELECT doc_id, n_frames, frame_idx,
       |  4 + frame_idx * $FrameBytes AS byte_offset,
       |  frame_idx * $FrameMs AS pts_ms,
       |  ((doc_id * 2654435761) + frame_idx * 40503) % 1000 AS frame_feature
       |FROM fr WHERE frame_idx % $SampleEvery = 0
       |ORDER BY doc_id, frame_idx""".stripMargin

  // ---------------------------------------------------------------- C16
  /** Resize planning over the decoded image metadata: aspect-preserving
    * fit into a 256×256 target using exact integer math (scale in ppm so
    * both engines agree bit-for-bit), plus the crop box for the
    * center-crop variant. Consumes C12's width/height — pure map-side
    * column math; a real resize kernel slots in downstream exactly like
    * C12's decoder stub.
    */
  val TargetDim = 256L

  def c16ResizePlan(spark: SparkSession, dir: String): DataFrame =
    c12MultimodalMeta(spark, dir)
      .select(col("doc_id"), col("width"), col("height"))
      // scale_ppm = floor(1e6 * target / max(w, h)) — aspect-preserving fit
      .withColumn("scale_ppm", expr(s"($TargetDim * 1000000) div greatest(width, height)"))
      .withColumn("out_w", expr("(width * scale_ppm) div 1000000"))
      .withColumn("out_h", expr("(height * scale_ppm) div 1000000"))
      // center-crop box to the square min(w, h)
      .withColumn("crop_x", expr("(width - least(width, height)) div 2"))
      .withColumn("crop_y", expr("(height - least(width, height)) div 2"))
      .withColumn("crop_side", expr("least(width, height)"))
      .orderBy("doc_id")

  val c16Sql: String = {
    val s8 = (1 to 8).map(i => s"ascii(substring(text, $i, 1))").mkString(" + ")
    s"""WITH m AS (
       |  SELECT doc_id,
       |    64 + (CAST($s8 AS BIGINT) * 31) % 960 AS width,
       |    64 + (CAST($s8 AS BIGINT) * 17) % 960 AS height
       |  FROM fdoc
       |), s AS (
       |  SELECT doc_id, width, height,
       |    ($TargetDim * 1000000) // greatest(width, height) AS scale_ppm
       |  FROM m
       |)
       |SELECT doc_id, width, height, scale_ppm,
       |  (width * scale_ppm) // 1000000 AS out_w,
       |  (height * scale_ppm) // 1000000 AS out_h,
       |  (width - least(width, height)) // 2 AS crop_x,
       |  (height - least(width, height)) // 2 AS crop_y,
       |  least(width, height) AS crop_side
       |FROM s ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- C34
  /** ViT-style patchify plan over the resized images: the row-major
    * [[PatchSide]]² patch grid of each C16 output frame, with the exact
    * byte offset of every patch's top-left pixel in a packed RGB buffer
    * (stride 3·out_w, 4-byte header — the C13 framing convention).
    * Partial patches at the right/bottom edge are dropped, images
    * thinner than one patch vanish, like a ViT preprocessor. The
    * fan-out is `sequence`+`explode` inside the scan stage (the grid
    * never materializes driver-side); the real pixel gather slots in
    * downstream of this plan exactly like C12's decoder stub.
    */
  val PatchSide = 32L

  def c34Patchify(spark: SparkSession, dir: String): DataFrame =
    c16ResizePlan(spark, dir)
      .select(col("doc_id"), col("out_w"), col("out_h"))
      .withColumn("n_cols", expr(s"out_w div $PatchSide"))
      .withColumn("n_rows", expr(s"out_h div $PatchSide"))
      .filter(col("n_cols") > 0 && col("n_rows") > 0)
      .withColumn("patch_idx", explode(expr("sequence(0L, n_cols * n_rows - 1)")))
      .select(col("doc_id"), col("n_cols"), col("n_rows"), col("patch_idx"),
        expr(s"(patch_idx % n_cols) * $PatchSide").as("px"),
        expr(s"(patch_idx div n_cols) * $PatchSide").as("py"),
        expr(s"4 + ((patch_idx div n_cols) * $PatchSide * out_w + (patch_idx % n_cols) * $PatchSide) * 3")
          .as("byte_offset"))
      .orderBy("doc_id", "patch_idx")

  val c34Sql: String = {
    val s8 = (1 to 8).map(i => s"ascii(substring(text, $i, 1))").mkString(" + ")
    s"""WITH m AS (
       |  SELECT doc_id,
       |    64 + (CAST($s8 AS BIGINT) * 31) % 960 AS width,
       |    64 + (CAST($s8 AS BIGINT) * 17) % 960 AS height
       |  FROM fdoc
       |), s AS (
       |  SELECT doc_id, width, height,
       |    ($TargetDim * 1000000) // greatest(width, height) AS scale_ppm
       |  FROM m
       |), r AS (
       |  SELECT doc_id, (width * scale_ppm) // 1000000 AS out_w,
       |    (height * scale_ppm) // 1000000 AS out_h
       |  FROM s
       |), g AS (
       |  SELECT doc_id, out_w, out_w // $PatchSide AS n_cols,
       |    out_h // $PatchSide AS n_rows
       |  FROM r WHERE out_w // $PatchSide > 0 AND out_h // $PatchSide > 0
       |), p AS (
       |  SELECT doc_id, out_w, n_cols, n_rows,
       |    UNNEST(range(0, n_cols * n_rows)) AS patch_idx
       |  FROM g
       |)
       |SELECT doc_id, n_cols, n_rows, patch_idx,
       |  (patch_idx % n_cols) * $PatchSide AS px,
       |  (patch_idx // n_cols) * $PatchSide AS py,
       |  4 + ((patch_idx // n_cols) * $PatchSide * out_w + (patch_idx % n_cols) * $PatchSide) * 3 AS byte_offset
       |FROM p ORDER BY doc_id, patch_idx""".stripMargin
  }

  // ---------------------------------------------------------------- C65
  /** C65: audio framing plan — the audio member of the multimodal family
    * (C13 frames video, C34 patchifies images): treat the binary body as
    * [[AudioRate]] Hz mono 16-bit PCM (n_samples = body bytes div 2)
    * and cut the STFT-style SLIDING frame grid — a [[FrameWin]]-sample
    * window advancing by [[FrameHop]] samples (the 25 ms / 10 ms
    * convention scaled to this toy corpus), overlapping unlike C13's
    * disjoint frames. Each frame carries its exact sample offset, byte
    * offset (2 bytes/sample past the 4-byte header) and start timestamp
    * in exact µs (hop·10⁶ is divisible by the rate, so time is integer
    * by construction); the stub feature is the C12-contract affine hash
    * a real windowed-energy/fbank kernel replaces. Docs shorter than
    * one window produce no frames (C34's thin-image rule). The fan-out
    * is sequence+explode inside the scan stage — zero shuffles at any
    * corpus size.
    */
  val AudioRate = 8000L
  val FrameWin = 64L
  val FrameHop = 16L

  def c65AudioFrames(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), expr("n_chars div 2").as("n_samples"))
      .filter(col("n_samples") >= FrameWin)
      .withColumn("n_frames", expr(s"1 + (n_samples - $FrameWin) div $FrameHop"))
      .withColumn("frame_idx", explode(expr("sequence(0L, n_frames - 1)")))
      .select(col("doc_id"), col("n_samples"), col("n_frames"), col("frame_idx"),
        (col("frame_idx") * FrameHop).as("sample_off"),
        (lit(4L) + col("frame_idx") * FrameHop * 2L).as("byte_off"),
        (col("frame_idx") * (FrameHop * 1000000L / AudioRate)).as("t_us"),
        (((col("doc_id") * lit(2654435761L)) + col("frame_idx") * lit(40503L)) % 1000L)
          .as("frame_feature"))
      .orderBy("doc_id", "frame_idx")

  val c65Sql: String =
    s"""WITH a AS (
       |  SELECT doc_id, n_chars // 2 AS n_samples FROM fdoc
       |  WHERE n_chars // 2 >= $FrameWin
       |), f AS (
       |  SELECT doc_id, n_samples,
       |    1 + (n_samples - $FrameWin) // $FrameHop AS n_frames
       |  FROM a
       |), fr AS (
       |  SELECT doc_id, n_samples, n_frames,
       |    UNNEST(range(0, n_frames)) AS frame_idx
       |  FROM f
       |)
       |SELECT doc_id, n_samples, n_frames, frame_idx,
       |  frame_idx * $FrameHop AS sample_off,
       |  4 + frame_idx * $FrameHop * 2 AS byte_off,
       |  frame_idx * ${FrameHop * 1000000L / AudioRate} AS t_us,
       |  ((doc_id * 2654435761) + frame_idx * 40503) % 1000 AS frame_feature
       |FROM fr ORDER BY doc_id, frame_idx""".stripMargin

  // --------------------------------------------------------------- C106
  /** C106: audio↔video as-of alignment — for every sampled video frame
    * (the C13 stream, pts in ms) the latest audio analysis frame at or
    * before it (the C65 stream, t in µs), per asset: the pairing step
    * every A/V training-pair builder runs before fusing per-frame
    * features (lip-sync data, AV-ASR, video captioning with speech).
    * lag_us — how stale the matched audio frame is — is the
    * sync-quality signal a pair filter thresholds on.
    *
    * Spark-first shape: the B9 as-of pattern specialized to the
    * doc-keyed case — both streams union into one frame tagged by
    * kind, ONE window partitioned by doc_id (bounded by the longest
    * single asset, the C48 argument — never a corpus-wide sort)
    * carries the last audio frame forward (`last(_, ignoreNulls)`),
    * and video rows project the alignment. Zero joins; two scan-stage
    * explodes feed one bounded window. Assets too short to emit any
    * audio frame (n_chars < 2·[[FrameWin]]) keep their video rows with
    * a −1 sentinel triple (not NULL — keeps the columns integer-kinded
    * end to end), pinned by the spec.
    *
    * Oracle: DuckDB's native ASOF LEFT JOIN over the same two frame
    * CTEs — one alignment definition, two engines, with ties
    * impossible (t_us is strictly increasing within an asset).
    */
  def c106AvAlign(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = c65AudioFrames(spark, dir).select(col("doc_id"),
      col("t_us").as("us"), lit(0).as("tag"),
      lit(null).cast("long").as("v_idx"),
      col("frame_idx").as("a_idx0"), col("t_us").as("a_us0"))
    val v = c13FrameSample(spark, dir).select(col("doc_id"),
      (col("pts_ms") * 1000L).as("us"), lit(1).as("tag"),
      col("frame_idx").as("v_idx"),
      lit(null).cast("long").as("a_idx0"), lit(null).cast("long").as("a_us0"))
    val w = Window.partitionBy("doc_id").orderBy("us", "tag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    a.unionByName(v)
      .withColumn("a_idx", last("a_idx0", ignoreNulls = true).over(w))
      .withColumn("a_us", last("a_us0", ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("doc_id"), col("v_idx").as("frame_idx"),
        col("us").as("pts_us"),
        coalesce(col("a_idx"), lit(-1L)).as("a_idx"),
        coalesce(col("a_us"), lit(-1L)).as("a_t_us"),
        coalesce(col("us") - col("a_us"), lit(-1L)).as("lag_us"))
      .orderBy("doc_id", "frame_idx")
  }

  val c106Sql: String = {
    def body(sql: String): String =
      sql.trim.stripSuffix("ORDER BY doc_id, frame_idx").trim
    s"""WITH vf AS (
       |${body(c13Sql)}
       |), af AS (
       |${body(c65Sql)}
       |)
       |SELECT v.doc_id, v.frame_idx, v.pts_ms * 1000 AS pts_us,
       |  COALESCE(a.frame_idx, -1) AS a_idx,
       |  COALESCE(a.t_us, -1) AS a_t_us,
       |  COALESCE(v.pts_ms * 1000 - a.t_us, -1) AS lag_us
       |FROM vf v ASOF LEFT JOIN af a
       |  ON a.doc_id = v.doc_id AND a.t_us <= v.pts_ms * 1000
       |ORDER BY v.doc_id, v.frame_idx""".stripMargin
  }

  // --------------------------------------------------------------- C126
  /** C126: perceptual-hash near-duplicates over the binary payloads —
    * the IMAGE-side dedup rung next to the text family (C6 MinHash, C8
    * SimHash): an aHash-style [[PhashBits]]-bit fingerprint (bit i = is
    * block i's byte mean above the whole payload's mean — the classic
    * average-hash, block = byte position mod [[PhashBits]] so every
    * stride of the "image" contributes), then banded LSH over
    * [[PhashBands]] 12-bit bands to find candidates and an exact
    * Hamming filter (bit_count(xor) ≤ [[PhashHamT]]) — byte-identical
    * recrops/re-encodes of the same asset collide, unrelated payloads
    * don't. The block-mean comparison cross-multiplies
    * (sum_i·n_total > total·n_i) so no division ever happens — bits are
    * exact in both engines; empty blocks (payload shorter than a
    * stride) compare 0 > 0 = false deterministically.
    *
    * Scale shape: one byte-explode + (doc, block) partial agg
    * (map-side combined, [[PhashBits]] keys per doc), one doc-keyed
    * total agg, the hash fold; candidate generation is the C6/C11
    * banding pattern — an equi-join on (band, value), never all-pairs;
    * the Hamming check runs only on collisions. Per-doc output row
    * (phash, candidate count, near count) keeps the result bounded.
    */
  val PhashBits = 48
  val PhashBands = 4
  val PhashHamT = 6L

  /** The distributed (explode + partial-agg) fingerprint plan on any
    * (doc_id, text) frame → (doc_id, phash) — the batch/store-side form
    * (one byte-explode, map-side-combined block agg). Shared by C126
    * and D41's frozen snapshot store.
    */
  private[graft] def phashOn(docs: DataFrame): DataFrame = {
    // zero-length texts must VANISH like NULL ones: Spark's
    // sequence(1, 0) DESCENDS (yields [1, 0]) rather than returning an
    // empty array, so without the guard an empty-text doc fabricates
    // two zero bytes → a phash=0 row the oracle's range(1, 1) = []
    // never produces (a real twin divergence, caught by the fuzz
    // harness's empty-string domain)
    val ex = docs.filter(length(col("text")) > 0)
      .select(col("doc_id"),
        posexplode(expr("transform(sequence(1, length(text)), i -> ascii(substring(text, i, 1)))"))
          .as(Seq("pos", "b")))
    val blocks = ex.groupBy(col("doc_id"), expr(s"pos % $PhashBits").as("blk"))
      .agg(sum("b").as("s"), count(lit(1)).as("n"))
    val tot = blocks.groupBy("doc_id")
      .agg(sum("s").as("total"), sum("n").as("n_total"))
    blocks.join(tot, "doc_id")
      .withColumn("bit", (col("s") * col("n_total") > col("total") * col("n")).cast("long"))
      .groupBy("doc_id")
      .agg(sum(expr("IF(bit = 1, shiftleft(CAST(1 AS BIGINT), CAST(blk AS INT)), CAST(0 AS BIGINT))"))
        .as("phash"))
  }

  /** (doc_id, phash, k, bv): the [[PhashBands]] 12-bit LSH bands of a
    * (doc_id, phash) frame — the ONE banding definition C126's
    * candidate join and D41's screen bucket on.
    */
  private[graft] def phashBands(ph: DataFrame): DataFrame =
    bandsOf(ph, col("doc_id"))

  /** The ONE banding projection: appends the [[PhashBands]] 12-bit LSH
    * band rows (k, bv) of a `phash` column to any frame, keeping
    * `carry`. [[phashBands]] runs it per-DOC (D41's screen shape);
    * [[c126Phash]] runs it per distinct-phash CLASS, which is what
    * keeps the batch candidate join off the member-pair mass.
    */
  private[graft] def bandsOf(df: DataFrame, carry: Column*): DataFrame = df
    .select(carry :+ col("phash") :+
      explode(expr(s"transform(sequence(0, ${PhashBands - 1}), k -> " +
        s"struct(k AS k, shiftright(phash, CAST(12 * k AS INT)) & 4095 AS bv))")).as("band"): _*)
    .select(carry :+ col("phash") :+ col("band.k") :+ col("band.bv"): _*)

  /** Stateless COLUMN-LEVEL twin of the fingerprint — the form D41's
    * stream side uses: one projection builds the (block, byte) struct
    * array, then a bounded [[PhashBits]]-block fold compares block
    * means by the same cross-multiplication (bit i = s_i·n_total >
    * total·n_i), so the fold and the explode plan produce BIT-IDENTICAL
    * hashes (spec-pinned). O(PhashBits·len) columnar work per row,
    * scan-stage only — no explode, no aggregation state, which is what
    * lets the screen run at ingest line rate; the store side at 100 TB
    * still uses [[phashOn]]'s explode + map-side-combined agg.
    */
  private[graft] def withPhashFold(df: DataFrame): DataFrame = df
    // mirror the explode plan's NULL/empty behavior: posexplode of a
    // NULL array emits no rows and [[phashOn]] drops zero-length texts
    // (Spark's sequence(1, 0) descends), so such docs must VANISH here
    // too — without this the fold's IF chain would fabricate phash=0
    // rows the batch twin and the oracle never see
    .filter(col("text").isNotNull && length(col("text")) > 0)
    .withColumn("bys", expr("transform(sequence(1, length(text)), i -> " +
      "CAST(ascii(substring(text, i, 1)) AS BIGINT))"))
    .withColumn("pn", expr("CAST(size(bys) AS BIGINT)"))
    .withColumn("ptot", expr("aggregate(bys, CAST(0 AS BIGINT), (a, x) -> a + x)"))
    // block blk owns positions blk+1, blk+1+48, … — a stride sequence,
    // so each byte is read ONCE across all 48 block folds (a
    // filter-per-block form measured 3× slower at sf0.1); blk ≥ pn has
    // no positions → bit 0, and the short-circuit AND keeps the stride
    // sequence from being built backwards
    .withColumn("phash", expr(
      s"""aggregate(
         |  transform(sequence(0, ${PhashBits - 1}), blk ->
         |    IF(blk < pn AND
         |       aggregate(sequence(CAST(blk + 1 AS BIGINT), pn, CAST($PhashBits AS BIGINT)),
         |           CAST(0 AS BIGINT),
         |           (a, i) -> a + element_at(bys, CAST(i AS INT))) * pn
         |         > ptot * ((pn - blk - 1) DIV $PhashBits + 1),
         |       shiftleft(CAST(1 AS BIGINT), blk), CAST(0 AS BIGINT))),
         |  CAST(0 AS BIGINT), (a, x) -> a + x)""".stripMargin))
    .drop("bys", "pn", "ptot")

  /** C126 via distinct-phash CLASS algebra (the D41 owner-store shape,
    * see `StreamingQueries`' frozen class store): a doc's candidate set
    * is a function of its PHASH alone — same-phash docs share every
    * band (hamming 0 ≤ [[PhashHamT]], so they are both candidates and
    * near by construction), and whether two DIFFERENT phashes share a
    * band depends only on the two 64-bit values. So the band self-join
    * runs over distinct-phash classes (phash, cnt), never members:
    *
    *   n_cand(doc with phash p) = (cnt_p − 1) + Σ_{q band-collides p} cnt_q
    *   n_near(...)              = (cnt_p − 1) + Σ_{q …, ham(p,q) ≤ T} cnt_q
    *
    * On a dup-heavy corpus (the LLM-training norm) |classes| ≪ |docs|
    * and the within-band all-pairs frame the doc-level join would
    * materialize — Σ_bucket k² member rows, the quadratic hot spot the
    * C135 tripwire exists to detect — collapses into class arithmetic:
    * the join moves O(|classes|·bands) rows no matter how heavy the
    * duplication (ScaleSmoke pins emitted-rows ≪ member-pair mass).
    * Values are UNCHANGED from the doc-level definition (spec-pinned
    * against a direct all-pairs recompute; oracle unchanged).
    */
  def c126Phash(spark: SparkSession, dir: String): DataFrame =
    phashCandCounts(Tables.documents(spark, dir))

  /** The C126 kernel on any (doc_id, text) frame (class doc above).
    *
    * r18 measured note: fingerprinting here deliberately stays on
    * [[phashOn]]'s explode + map-side agg. The column-level fold twin
    * was tried (it removes two |chars|-row Exchanges) and measured
    * ~70× SLOWER in this batch plan at sf0.01: CollapseProject inlines
    * the `bys` alias into the 48 per-block folds, so
    * `element_at(bys, i)` re-builds the whole byte array per element —
    * O(48·len²) per doc (the DedupQueries bandRows staging trap). The
    * stream side keeps the fold because its per-trigger projection
    * boundary prevents the collapse and line-rate statelessness is the
    * point there.
    */
  private[graft] def phashCandCounts(docs: DataFrame): DataFrame = {
    val phash = phashOn(docs)
    val classes = phash.groupBy("phash").agg(count(lit(1)).as("cnt"))
    val cb = bandsOf(classes, col("cnt"))
    // cross-CLASS band collisions: distinct (pa, pb) over class rows
    // (a pair of phashes can collide on several bands; cb is a function
    // of pb so carrying it through the distinct is safe)
    val cross = cb.as("a").join(cb.as("b"),
        col("a.k") === col("b.k") && col("a.bv") === col("b.bv") &&
          col("a.phash") =!= col("b.phash"))
      .select(col("a.phash").as("pa"), col("b.phash").as("pb"),
        col("b.cnt").as("cb"))
      .distinct()
    val crossAgg = cross.groupBy("pa").agg(
      sum("cb").as("x_cand"),
      sum(when(expr("bit_count(pa ^ pb)") <= PhashHamT, col("cb"))
        .otherwise(0L)).as("x_near"))
    phash.join(classes, "phash")
      .join(crossAgg, col("phash") === col("pa"), "left")
      .select(col("doc_id"), col("phash"),
        (col("cnt") - 1 + coalesce(col("x_cand"), lit(0L))).as("n_cand"),
        (col("cnt") - 1 + coalesce(col("x_near"), lit(0L))).as("n_near"))
      .orderBy("doc_id")
  }

  /** The ex→blocks→tot→ph→bands oracle chain — ONE fingerprint/banding
    * definition shared by the C126 and D41 twins.
    */
  private[graft] val phashCtes: String =
    s"""ex AS (
       |  SELECT doc_id, t.i AS pos,
       |    ascii(substring(text, CAST(t.i AS INTEGER), 1)) AS b
       |  FROM fdoc,
       |    LATERAL (SELECT UNNEST(range(1, len(text) + 1)) AS i) t
       |), blocks AS (
       |  -- Spark's posexplode is 0-based; i here is 1-based
       |  SELECT doc_id, (pos - 1) % $PhashBits AS blk,
       |    CAST(SUM(b) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM ex GROUP BY 1, 2
       |), tot AS (
       |  SELECT doc_id, CAST(SUM(s) AS BIGINT) AS total,
       |    CAST(SUM(n) AS BIGINT) AS n_total
       |  FROM blocks GROUP BY 1
       |), ph AS (
       |  SELECT b.doc_id,
       |    CAST(SUM(CASE WHEN b.s * t.n_total > t.total * b.n
       |      THEN CAST(1 AS BIGINT) << CAST(b.blk AS INTEGER) ELSE 0 END) AS BIGINT)
       |      AS phash
       |  FROM blocks b JOIN tot t USING (doc_id) GROUP BY 1
       |), bands AS (
       |  SELECT doc_id, phash, k.k AS k, (phash >> (12 * k.k)) & 4095 AS bv
       |  FROM ph, (SELECT UNNEST(range(0, $PhashBands)) AS k) k
       |)""".stripMargin

  val c126Sql: String =
    s"""WITH $phashCtes, cand AS (
       |  SELECT DISTINCT a.doc_id, b.doc_id AS other, a.phash AS pa, b.phash AS pb
       |  FROM bands a JOIN bands b
       |    ON b.k = a.k AND b.bv = a.bv AND b.doc_id <> a.doc_id
       |), counts AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_cand,
       |    CAST(SUM(CASE WHEN bit_count(xor(pa, pb)) <= $PhashHamT
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_near
       |  FROM cand GROUP BY 1
       |)
       |SELECT p.doc_id, p.phash,
       |  COALESCE(c.n_cand, 0) AS n_cand,
       |  COALESCE(c.n_near, 0) AS n_near
       |FROM ph p LEFT JOIN counts c USING (doc_id)
       |ORDER BY p.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c126_phash" -> (c126Phash _),
    "c106_av_align" -> (c106AvAlign _),
    "c12_multimodal_meta" -> (c12MultimodalMeta _),
    "c13_frame_sample" -> (c13FrameSample _),
    "c16_resize_plan" -> (c16ResizePlan _),
    "c34_patchify" -> (c34Patchify _),
    "c65_audio_frames" -> (c65AudioFrames _))

  val oracles: Map[String, String] = Map(
    "c126_phash" -> c126Sql,
    "c106_av_align" -> c106Sql,
    "c12_multimodal_meta" -> c12Sql,
    "c13_frame_sample" -> c13Sql,
    "c16_resize_plan" -> c16Sql,
    "c34_patchify" -> c34Sql,
    "c65_audio_frames" -> c65Sql)
}
