package graft

import java.nio.file.{Files, Path, Paths}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded differential-fuzz corpus generator (SURVEY §7: the fixed
  * sf0.01/sf0.1 fixtures cannot catch edge-DOMAIN divergence — round
  * 13's NULL-text phash fold bug and round 14's empty-text
  * `sequence(1,0)` descent are exactly the class a randomized
  * adversarial corpus catches mechanically).
  *
  * Writes the full ten-table layout (same Spark-visible schemas and
  * single-file-per-table contract as the driver testdata — the D-block
  * stagers `require` a regular file) with adversarial value domains:
  * NULL / empty / whitespace-only texts, consecutive-space empty
  * tokens, surrogate pairs and 2-byte accents, duplicated texts
  * (heavy dedup classes), ties on every ORDER BY tiebreaker
  * (equal balances / prices / timestamps / values), dangling foreign
  * keys, zero and duplicate embedding vectors. Seed 0 is the
  * single-row corpus (every table exactly one row). Generation is
  * driver-side `java.util.Random(seed)` with a fixed call order —
  * fully deterministic, no wall-clock anywhere.
  *
  * The differential loop is `tools/fuzz.sh`: per seed, generate the
  * corpus, run the FULL `Verify` surface on it, and oracle-compare
  * every key with `tools/check.py` — the same rows/schema/hash gate
  * the driver runs, on a corpus the queries were never tuned against.
  * `FuzzSpec` runs the crash-freedom half (all keys on seeds 0 and 1)
  * in CI where DuckDB isn't available.
  */
object Fuzz {

  private val Vocab = Seq("the", "fast", "key", "order", "sort", "table",
    "scan", "merge", "part", "window", "small", "hash", "join", "batch",
    "stream", "spark", "dup", "group", "query", "row", "data", "slow",
    "filter", "customer", "line", "value", "agg", "column", "big", "a",
    "vector")
  private val Langs = Seq("en", "de", "fr", "es", "zh")
  private val EventTypes = Seq("signup", "click", "error", "view", "purchase")
  private val Priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
    "4-NOT SPECIFIED", "5-LOW")
  private val Segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
    "HOUSEHOLD", "MACHINERY")
  private val PartTypes = Seq("ECONOMY", "PROMO", "STANDARD")
  private val Flags = Seq(("A", "F"), ("N", "F"), ("N", "O"), ("R", "F"),
    ("R", "O"), ("A", "O"))

  /** One adversarial text draw. ~15% NULL/empty/whitespace classes,
    * ~15% unicode/degenerate classes, rest vocab sentences with a 30%
    * chance of REUSING an earlier text (duplicate classes for the
    * dedup/phash families).
    */
  private def fuzzText(rnd: java.util.Random, seen: ArrayBuffer[String]): String = {
    val t = rnd.nextInt(20) match {
      case 0 => null
      case 1 => ""
      case 2 => " "
      case 3 => "a  b" // consecutive spaces → empty token
      case 4 => " leading and trailing "
      case 5 => "😀 𝄞 emoji 😀 tail" // astral
      case 6 => "café naïve söze über" // 2-byte accents
      // long uniform run (UNCAPPED since round 16: the c132/d39 oracle
      // was an enumeration — ~1.93^len paths — and censored tokens at
      // ~10 chars; it is now a linear recursive-CTE Viterbi, so the
      // long-token domain where segmenter cover guards and overflow
      // paths live is finally differentially tested)
      case 7 => "w" * (5 + rnd.nextInt(252))
      // long random-letters token (64-256 chars): every position gives
      // the segmenters real branch choices at length
      case 8 => (0 until (64 + rnd.nextInt(193)))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      // long unicode token: astral (surrogate-pair) and 2-byte chars at
      // length, the code-point-vs-UTF-16 stress for the segment kernels
      case 9 => Iterator.continually(rnd.nextInt(4) match {
          case 0 => "😀"
          case 1 => "é"
          case 2 => "𝄞"
          case _ => "x"
        }).take(64 + rnd.nextInt(129)).mkString
      case _ =>
        if (seen.nonEmpty && rnd.nextInt(10) < 3) seen(rnd.nextInt(seen.length))
        else (0 until (3 + rnd.nextInt(30)))
          .map(_ => Vocab(rnd.nextInt(Vocab.length))).mkString(" ")
    }
    if (t != null && t.nonEmpty) seen += t
    t
  }

  /** Write `df` as the single regular file `<dir>/<name>.parquet` (the
    * driver-testdata layout; the streaming stagers require a file).
    */
  private def writeTable(df: DataFrame, dir: String, name: String): Unit = {
    val tmp = Paths.get(dir, s".tmp_$name")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = {
      val s = Files.list(tmp)
      try s.filter(_.getFileName.toString.endsWith(".parquet")).findFirst
        .orElseThrow(() => new IllegalStateException(s"no part file for $name"))
      finally s.close()
    }
    val dst = Paths.get(dir, s"$name.parquet")
    Files.deleteIfExists(dst)
    Files.move(part, dst)
    def rm(p: Path): Unit = {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.forEach(rm(_)) finally s.close()
      }
      Files.delete(p)
    }
    rm(tmp)
  }

  private def ntz(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    timestamp_micros(c).cast("timestamp_ntz")

  def writeCorpus(spark: SparkSession, dir: String, seed: Long): Unit = {
    import spark.implicits._
    Files.createDirectories(Paths.get(dir))
    val rnd = new java.util.Random(seed * 7919L + 13L)
    val single = seed == 0L
    def n(base: Int): Int = if (single) 1 else base + rnd.nextInt(base / 2 + 1)

    // region / nation: fixed shapes (queries treat them as dimensions)
    val nRegion = if (single) 1 else 5
    val nNation = if (single) 1 else 25
    writeTable((0 until nRegion).map(i => (i, s"REGION_$i")).toDF("r_regionkey", "r_name"),
      dir, "region")
    writeTable((0 until nNation)
      .map(i => (i, s"NATION_$i", rnd.nextInt(nRegion))).toDF("n_nationkey", "n_name", "n_regionkey"),
      dir, "nation")

    // customer: tied balances (b4/b45 top-k tiebreakers), an empty name
    val nCust = n(40)
    val balPool = Seq(0.0, 111.11, 999.99, 4242.42, -1.5)
    writeTable((1 to nCust).map { i =>
      val bal = if (rnd.nextInt(3) == 0) balPool(rnd.nextInt(balPool.length))
        else math.rint(rnd.nextDouble() * 10000 * 100) / 100
      val name = if (!single && i == 2) "" else f"Customer#$i%05d"
      (i.toLong, name, rnd.nextInt(nNation), bal, Segments(rnd.nextInt(5)))
    }.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
      dir, "customer")

    val nSupp = n(6)
    writeTable((1 to nSupp).map { i =>
      val bal = if (rnd.nextInt(3) == 0) 500.0
        else math.rint(rnd.nextDouble() * 9000 * 100) / 100
      (i.toLong, s"Supplier#$i", rnd.nextInt(nNation), bal)
    }.toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal"), dir, "supplier")

    val nPart = n(30)
    writeTable((1 to nPart).map { i =>
      (i.toLong, s"${Vocab(rnd.nextInt(Vocab.length))} widget",
        s"Brand#${rnd.nextInt(20)}", PartTypes(rnd.nextInt(3)),
        1 + rnd.nextInt(50), math.rint(rnd.nextDouble() * 2000 * 100) / 100)
    }.toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
      dir, "part")

    // orders: tied totalprices and tied dates; a few dangling custkeys
    val nOrders = n(120)
    val dayUs = 86400000000L
    val baseDateUs = 788918400000000L // 1995-01-01 UTC in epoch micros
    val orders = (1 to nOrders).map { i =>
      val cust = 1 + rnd.nextInt(nCust + 2) // +2 → dangling keys
      val price = if (rnd.nextInt(4) == 0) 55555.55
        else math.rint(rnd.nextDouble() * 200000 * 100) / 100
      // mostly the 1995–2001 band with heavy ties; ~1/30 at the 1970
      // epoch and ~1/30 far future (year/date arithmetic extremes)
      // NULL order dates (~1/30, r17): the b56 ingest contract filters
      // them at the read boundary on both engines — before it, two
      // null-date rows hash-diverged the b29/b34/b38 date windows
      val date: java.lang.Long = rnd.nextInt(30) match {
        case 0 => 0L // 1970-01-01
        case 1 => baseDateUs + 38000L * dayUs // ~2099
        case 2 if !single => null
        case _ =>
          baseDateUs + (if (rnd.nextInt(4) == 0) 100L else rnd.nextInt(2400).toLong) * dayUs
      }
      (i.toLong, cust.toLong, Seq("P", "O", "F")(rnd.nextInt(3)), price, date,
        Priorities(rnd.nextInt(5)))
    }
    writeTable(orders
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "us", "o_orderpriority")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), ntz(col("us")).as("o_orderdate"), col("o_orderpriority")),
      dir, "orders")

    val nLine = if (single) 1 else nOrders * 4
    writeTable((1 to nLine).map { i =>
      val ok = 1 + rnd.nextInt(nOrders + 1) // dangling orderkey possible
      val (rf, ls) = Flags(rnd.nextInt(Flags.length))
      val qty = (1 + rnd.nextInt(50)).toDouble
      val disc = rnd.nextInt(11) / 100.0
      val tax = rnd.nextInt(9) / 100.0
      val price = math.rint(rnd.nextDouble() * 90000 * 100) / 100
      val ship = baseDateUs + rnd.nextInt(2500).toLong * dayUs
      (ok.toLong, (1 + rnd.nextInt(nPart + 2)).toLong, (1 + rnd.nextInt(nSupp + 1)).toLong,
        1 + rnd.nextInt(7), qty, price, disc, tax, rf, ls, ship)
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "us")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), ntz(col("us")).as("l_shipdate")),
      dir, "lineitem")

    // events: hot user, tied timestamps (same user too), tied values,
    // edge props ({} → missing key, negative k). ~1/8 of rows land at an
    // EXACT event-time boundary from the previous row — the session gap
    // (30 min), the watermark delay (2 h), the window length (1 h), or
    // ±1 µs around them — so every `<=` vs `<` tie rule in the D-block
    // session/window/watermark logic is exercised against its batch
    // oracle instead of waiting for a random collision.
    val nEvents = n(240)
    val evBaseUs = 1704067200000000L // 2024-01-01 UTC
    val boundaryUs = Seq(1800000000L, 1800000001L, 1799999999L, // session gap
      7200000000L, 7200000001L, 7199999999L, // watermark delay
      3600000000L, 1L) // window length, adjacent-µs tie
    var lastTs = evBaseUs
    writeTable((1 to nEvents).map { i =>
      // Since r17 the wave plants ALL FOUR b55 QUARANTINE classes (NULL
      // event time ~1/12, NULL user/type/value ~1/30 each): the ingest
      // contract filters them at the read boundary on both engines, so
      // every event key must stay oracle-green with poisoned rows in
      // the RAW table. Before the contract, any one of these
      // NOT_NULL_ASSERT-crashed the typed stream folds (null-ts: d3;
      // null user/value/type: d3/d11/d12/d23/d28/d33) and silently
      // split d1/b49/d30 from their batch oracles — the r16 §7m probe
      // and its r17 follow-up.
      val user: java.lang.Long =
        if (!single && rnd.nextInt(30) == 0) null
        else if (rnd.nextInt(10) < 3) 0L
        else (1 + rnd.nextInt(12)).toLong
      val tsOpt: java.lang.Long =
        if (!single && rnd.nextInt(12) == 0) null
        else {
          val ts = rnd.nextInt(8) match {
            case 0 => lastTs
            case 1 => lastTs + boundaryUs(rnd.nextInt(boundaryUs.length))
            case _ => evBaseUs + (rnd.nextDouble() * 30 * dayUs).toLong
          }
          lastTs = ts
          java.lang.Long.valueOf(ts)
        }
      val v: java.lang.Double =
        if (!single && rnd.nextInt(30) == 0) null
        else if (rnd.nextInt(10) == 0) 1.0
        else math.rint(rnd.nextDouble() * 300 * 100) / 100
      // dirty-JSON classes: malformed, NULL, wrong-typed / nested /
      // array k — a real event pipeline ingests all of these, and the
      // engines must agree on the NULL (or value) they collapse to.
      // Widened r18 after the props probe to every class the
      // StrictJson contract defines: duplicate keys, non-integral
      // numerics (the try_cast-rounding trap), trailing garbage (the
      // Jackson-leniency trap), BOM, lone surrogates, trailing commas
      // (yyjson-valid!), nan/inf literals, deep nesting, kB-scale pads,
      // escaped/case-variant keys, integral-string k (which CASTS).
      val props = rnd.nextInt(32) match {
        case 0 => "{}"
        case 1 => s"""{"k": ${-1 - rnd.nextInt(50)}}"""
        case 2 => "{"
        case 3 => "not json"
        case 4 => null
        case 5 => """{"k": "str"}"""
        case 6 => """{"k": {"j": 1}}"""
        case 7 => """{"k": [1, 2]}"""
        case 8 => "null"
        case 9 => s"""{"k": ${rnd.nextInt(9)}, "k": ${rnd.nextInt(9)}}"""
        case 10 => Seq("""{"k": 5.5}""", """{"k": 1e3}""", """{"k": -0}""",
          """{"k": 5e-1}""")(rnd.nextInt(4))
        case 11 => s"""{"k": ${rnd.nextInt(99)}} trailing"""
        case 12 => "\uFEFF" + s"""{"k": ${rnd.nextInt(99)}}"""
        case 13 => "{\"k\": \"\\ud800\"}" // lone surrogate escape
        case 14 => s"""{"pad": "${"x" * (512 + rnd.nextInt(8192))}", "k": ${rnd.nextInt(99)}}"""
        case 15 => // balanced deep nesting: VALID (no depth limit either side)
          val d = 50 + rnd.nextInt(350)
          """{"k": """ + "[" * d + "1" + "]" * d + "}"
        case 16 => """{"k": null}"""
        case 17 => """{"k": true}"""
        case 18 => s"""{"k": "${rnd.nextInt(999)}"}""" // integral string: CASTS
        case 19 => """{"k": " 7 "}"""
        case 20 => """{"k": 99999999999999999999}"""
        case 21 => s"""{"k": ${rnd.nextInt(99)},}""" // trailing comma: VALID
        case 22 => s"""{"K": ${rnd.nextInt(99)}}"""
        case 23 => "{\"\\u006b\": " + rnd.nextInt(99) + "}" // escaped key: MATCHES
        case 24 => Seq("""{"k": nan}""", """{"k": -Infinity}""",
          """{"k": INF}""", """{"k": NaN}""")(rnd.nextInt(4))
        case 25 => s"""{"k": 0${rnd.nextInt(9) + 1}}""" // leading zero: invalid
        case 26 => s"""{"k": ${rnd.nextInt(9)}} {"k": ${rnd.nextInt(9)}}"""
        case _ => s"""{"k": ${rnd.nextInt(100)}}"""
      }
      val etype =
        if (!single && rnd.nextInt(30) == 0) null
        else EventTypes(rnd.nextInt(5))
      (i.toLong, tsOpt, user, etype, v, props)
    }.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), ntz(col("us")).as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props")),
      dir, "events")

    // documents: the adversarial heart (see fuzzText)
    val nDocs = n(100)
    val seen = new ArrayBuffer[String]
    writeTable((0 until nDocs).map { i =>
      // seed 0's one text is repetition-rich on purpose: the C96 family
      // sample-learns SegmentMerges=8 BPE merges and fails LOUDLY on a
      // dry learn — a corpus with too few repeated adjacent pairs is
      // outside the tokenizer's documented domain, not a crash bug.
      val t = if (single)
        "spark stream spark stream merge sort merge sort window batch " +
          "window batch filter join filter join plain single row text"
      else fuzzText(rnd, seen)
      // lang/source: empty AND NULL classes (grouping, joining and
      // window-partitioning on NULL keys is its own divergence surface)
      val lang = if (!single) rnd.nextInt(25) match {
        case 0 => ""
        case 1 => null
        case _ => Langs(rnd.nextInt(5))
      } else Langs(rnd.nextInt(5))
      val source = if (!single && rnd.nextInt(25) == 0) null
        else s"src${rnd.nextInt(20)}"
      val nc: java.lang.Long =
        if (t == null) null else t.codePointCount(0, t.length).toLong
      // NULL doc_ids (~1/25, r17): the c140 ingest contract filters
      // them at the read boundary on both engines — before it, two
      // null-id rows crashed the typed DocBin/PackDoc encoders
      // (NOT_NULL_ASSERT) and hash-diverged a dozen tokenizer/dedup
      // keys (the r17 probe).
      // DUPLICATE doc_ids are deliberately NOT planted (r18 decision):
      // uniqueness is a documented pipeline PRECONDITION (Tables.
      // documents), not a quarantined or defined domain — the engines
      // legitimately disagree row-by-row on which copy feeds id-keyed
      // joins, so planting collisions would force an arbitrary tie
      // rule into ~60 id-keyed oracles to paper over a state the
      // contract forbids. c141_doc_collisions is the detector
      // (spec-pinned on a planted-collision corpus), and the
      // CurationPipeline output is pinned collision-free.
      val docId: java.lang.Long =
        if (!single && rnd.nextInt(25) == 0) null else java.lang.Long.valueOf(i.toLong)
      (docId, t, lang, source, nc)
    }.toDF("doc_id", "text", "lang", "source", "n_chars"), dir, "documents")

    // embeddings: exact-duplicate vectors, zero vectors (norm 0), tied
    // labels — 64-dim to match the fixture contract. Since r16 the wave
    // also plants QUARANTINE-class vectors (NULL / NaN / ±Inf
    // components): the c139 ingest contract filters them at the read
    // boundary on both engines, so every embed key must stay
    // oracle-green with poisoned rows in the RAW table (before the
    // contract, one Inf component CAST_OVERFLOWed c112/c54 — a single
    // bad row killing a corpus-wide job).
    val nVec = n(96)
    val dupVec = Array.fill(64)(math.rint(rnd.nextGaussian() * 1000) / 1000f)
      .map(_.toFloat)
    writeTable((0 until nVec).map { i =>
      def rand64() =
        Array.fill(64)((math.rint(rnd.nextGaussian() * 1000) / 1000).toFloat)
      val v: Array[Float] =
        if (!single && rnd.nextInt(24) == 0) null
        else if (!single && rnd.nextInt(20) == 0) {
          val a = rand64(); a(rnd.nextInt(64)) = Float.NaN; a
        } else if (!single && rnd.nextInt(20) == 0) {
          val a = rand64()
          a(rnd.nextInt(64)) =
            if (rnd.nextBoolean()) Float.PositiveInfinity else Float.NegativeInfinity
          a
        } else if (!single && rnd.nextInt(12) == 0) Array.fill(64)(0.0f)
        else if (!single && rnd.nextInt(5) == 0) dupVec
        else rand64()
      (i.toLong, v, rnd.nextInt(10))
    }.toDF("vec_id", "embedding", "label"), dir, "embeddings")
  }

  /** Usage: runMain graft.Fuzz <outDir> <seed> */
  def main(args: Array[String]): Unit = {
    val (out, seed) = (args(0), args(1).toLong)
    val spark = GraftSession.local()
    writeCorpus(spark, out, seed)
    System.err.println(s"[fuzz] corpus seed=$seed at $out")
    spark.stop()
  }
}
