package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver's testdata layout
  * (`<sfDir>/<name>.parquet`, see TESTDATA.md).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The ONE events read every event-family query goes through: the raw
    * table minus quarantined (NULL event-time) rows — the b55 ingest
    * contract, the events twin of `EmbedQueries.vectors`. A NULL `ts`
    * is the job-killing/diverging class the r16 probe proved: the typed
    * session encoder CRASHES on it (NOT_NULL_ASSERT_VIOLATION — one
    * poisoned row kills a corpus-wide job), watermarked streams silently
    * drop it while batch windows keep a NULL bucket, and epoch-µs window
    * frames emit NULL bounds — the engines diverge on exactly the rows
    * the contract removes. Since late r17 the contract covers the FULL
    * row shape (ts, user_id, event_type, value all non-null): the
    * follow-up probe proved NULL user_id/value/event_type rows
    * NOT_NULL_ASSERT-crash SIX typed stream folds (d3/d11/d12/d23/d28/
    * d33 — `Ev`, `AsofEv`, `Scd2Ev`, `FunnelEv`, `AlertEv` all carry
    * primitive Longs) and hash-diverge b49/d30 — an event without an
    * actor, a kind, or a metric cannot be attributed, sessionized, or
    * aggregated, so it is quarantined and REPORTED (b55), not crashed
    * on. `props` stays nullable: dirty JSON is a first-class fuzzed
    * domain every consumer handles. The oracle twin is [[fevCte]].
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    apply(spark, dir, "events").filter(
      col("ts").isNotNull && col("user_id").isNotNull
        && col("event_type").isNotNull && col("value").isNotNull)
  }

  /** DuckDB twin of [[events]]. Every oracle SQL that reads the events
    * table routes through this CTE (pasted verbatim — a spec pins the
    * text, so a drifted copy fails CI); the sole raw-table reader is
    * b55's quarantine report itself.
    */
  val fevCte: String = "fev AS (SELECT * FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_type IS NOT NULL AND value IS NOT NULL)"

  /** The ONE documents read every text/dedup/multimodal query goes
    * through: the raw table minus quarantined (NULL doc_id) rows — the
    * c140 ingest contract. A document without identity cannot
    * participate in id-keyed dedup, pairing, packing, or provenance,
    * and the r17 probe (2 null-id rows in a fuzz corpus) broke ~18
    * keys in every class at once: the typed DocBin/PackDoc encoders
    * NOT_NULL_ASSERT-crash (c12/c16/c34 — one poisoned row kills a
    * corpus-wide job), c99 DIVIDE_BY_ZEROs, and a dozen tokenizer/
    * dedup keys silently hash-diverge from their oracles (the engines
    * disagree on NULL-id grouping vs joining row-by-row). NULL text /
    * lang / source stay IN the domain — they are fuzzed and every key
    * handles them. Oracle twin: [[fdocCte]] (injected — see
    * SparkEntry.injectQuarantineCtes); raw-table reader: c140 only.
    *
    * PRECONDITION (not enforced here): doc_id is UNIQUE within the
    * corpus. The r18 probe proved 2 rows sharing an id hash-diverge ≥6
    * id-keyed keys (the engines disagree row-by-row on which copy
    * feeds joins), and per-read enforcement would add a
    * count-over-window shuffle to every documents scan at 100 TB.
    * Uniqueness is an ingest-JOB invariant — the c1 exact-dedup stage
    * and the CurationPipeline output produce it (spec-pinned) — and
    * c141_doc_collisions is the cheap detector an ingest runs before
    * trusting a corpus.
    */
  def documents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    apply(spark, dir, "documents").filter(col("doc_id").isNotNull)
  }

  val fdocCte: String =
    "fdoc AS (SELECT * FROM documents WHERE doc_id IS NOT NULL)"

  /** The ONE orders read — raw minus quarantined (NULL o_orderdate)
    * rows, the b56 contract: the order-TIME axis drives the date
    * spines, cohort months, streaks, and cumulative windows, and the
    * r17 probe proved 2 null-date rows hash-diverge b29/b34/b38 (the
    * engines disagree on NULL-date window frames), the same class the
    * events `ts` quarantine closed. NULL o_orderkey/custkey stay
    * reported-only (b56) — dangling keys are already a fuzzed domain.
    * Oracle twin: [[fordCte]] (injected); raw-table reader: b56 only.
    */
  def orders(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    apply(spark, dir, "orders").filter(col("o_orderdate").isNotNull)
  }

  val fordCte: String =
    "ford AS (SELECT * FROM orders WHERE o_orderdate IS NOT NULL)"

  /** `events` with `ts` normalized to epoch microseconds (`us`).
    *
    * The driver writes `ts` as parquet TIMESTAMP(NANOS), which Spark only
    * reads with `spark.sql.legacy.parquet.nanosAsLong=true` (as a BIGINT
    * of nanos); handle both that shape and a plain timestamp column.
    */
  def eventsWithUs(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir) // quarantined view — the b55 contract
    import org.apache.spark.sql.functions.{col, expr, unix_micros}
    val us = e.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      // parquet timestamp with isAdjustedToUTC=false reads as NTZ, which
      // unix_micros rejects; the session runs UTC, so casting pins the
      // same wall-clock instant the oracle's naive timestamp sees
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col("ts").cast("timestamp"))
      case _ => unix_micros(col("ts"))
    }
    e.withColumn("us", us)
  }
}
