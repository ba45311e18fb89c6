package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY.md §2 block D: Structured Streaming operators over the
  * `events` table.
  *
  * The transform bodies are stream/batch agnostic — the same function is
  * applied to `readStream` (D1/D2 proper) and to the batch table (the
  * parity oracle, mirrored by B6). Streaming state is bounded by the
  * 2-hour watermark: window state ages out, dropDuplicates keeps only
  * in-watermark event_ids. At scale the shuffle key is (window,
  * event_type) / event_id respectively, both high-cardinality and
  * skew-free.
  */
object StreamingOps {

  /** Watermark delay in microseconds — single source for the string
    * config, the D9 oracle's eviction horizon, and the specs.
    */
  val WatermarkDelayUs: Long = 7200000000L
  val WatermarkDelay: String = s"${WatermarkDelayUs / 3600000000L} hours"
  val WindowLen = "1 hour"

  private def cents(c: Column): Column = round(c * lit(100.0), 0).cast("long")

  /** Raw events (ts possibly parquet-nanos BIGINT) → typed stream with
    * `event_time` timestamp. Works on batch and streaming frames alike.
    */
  def normalize(e: DataFrame): DataFrame = {
    val eventTime = e.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => timestamp_micros(expr("ts div 1000"))
      // parquet timestamp with isAdjustedToUTC=false reads as NTZ; the
      // session runs UTC, so the cast pins the same wall-clock instant
      // (and unix_micros, which rejects NTZ, works downstream)
      case org.apache.spark.sql.types.TimestampNTZType => col("ts").cast("timestamp")
      case _ => col("ts")
    }
    e.withColumn("event_time", eventTime)
  }

  /** D1: tumbling 1-hour windowed agg with watermark — streaming twin of
    * the batch B6 query (same buckets, counts, cent-sums).
    */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("event_time", WatermarkDelay)
      .groupBy(window(col("event_time"), WindowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_value_c"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value_c"))

  /** D15: SLIDING 2-hour / 30-minute windowed agg with watermark — the
    * overlapping-window twin of D1's tumbling shape (trend smoothing /
    * rate-limiting dashboards). Each event lands in exactly
    * width/slide = 4 open windows; Spark expands that membership
    * map-side BEFORE the shuffle, so the state store holds one row per
    * (open window × type) — watermark-bounded like D1, just 4× the
    * window count, never per-event state.
    */
  val SlideWindowLen = "2 hours"
  val SlideStep = "30 minutes"

  def slidingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("event_time", WatermarkDelay)
      .groupBy(window(col("event_time"), SlideWindowLen, SlideStep), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_value_c"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value_c"))

  /** D2: streaming dedup on event_id within the watermark horizon. */
  def dedup(events: DataFrame): DataFrame =
    events
      .withWatermark("event_time", WatermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  // ------------------------------------------------------- D3: sessions
  /** Typed event for stateful processing. */
  final case class Ev(user_id: Long, event_id: Long, us: Long, value_c: Long)

  /** Open-session state carried between micro-batches. */
  final case class OpenSession(start_us: Long, end_us: Long, n_events: Long, sum_value_c: Long)

  /** Emitted (closed) session — schema mirrors the batch B5 aggregate. */
  final case class Session(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long, sum_value_c: Long)

  val SessionGapUs: Long = 1800000000L // 30 min, matches B5

  /** D3: streaming sessionization with custom state
    * (flatMapGroupsWithState) — the stream twin of the batch B5
    * lag/cumsum sessionizer. Each invocation folds the micro-batch's
    * events (sorted by event time) into the per-user open session,
    * EMITS sessions closed by a >30-min gap, and keeps the still-open
    * tail session in state for the next batch. State per user is one
    * fixed-size record — bounded regardless of stream length.
    */
  def sessionize(events: DataFrame): org.apache.spark.sql.Dataset[Session] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("event_time")).as("us"),
        cents(col("value")).as("value_c"))
      .as[Ev]

    def fold(userId: Long, it: Iterator[Ev], state: GroupState[OpenSession]): Iterator[Session] = {
      val evs = it.toSeq.sortBy(e => (e.us, e.event_id))
      var open = state.getOption
      val closed = Seq.newBuilder[Session]
      evs.foreach { e =>
        open match {
          case Some(s) if e.us - s.end_us <= SessionGapUs =>
            open = Some(OpenSession(s.start_us, e.us, s.n_events + 1, s.sum_value_c + e.value_c))
          case Some(s) =>
            closed += Session(userId, s.start_us, s.end_us, s.n_events, s.sum_value_c)
            open = Some(OpenSession(e.us, e.us, 1L, e.value_c))
          case None =>
            open = Some(OpenSession(e.us, e.us, 1L, e.value_c))
        }
      }
      open.foreach(state.update)
      closed.result().iterator
    }

    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fold)
  }

  // --------------------------------------- D11: streaming as-of join
  final case class AsofEv(user_id: Long, event_id: Long, us: Long, is_click: Boolean)
  final case class LastClick(c_id: Long, c_us: Long)
  final case class AsofMatch(event_id: Long, user_id: Long, err_us: Long,
      click_id: Long, click_us: Long, gap_us: Long)

  /** D11: streaming as-of attribution — every `error` event enriched
    * with the same user's most recent `click` at-or-before it, the
    * stream twin of the batch B9 as-of join. Where B9 folds the time
    * axis into a shuffle key, the stream needs no such trick: state per
    * user is ONE fixed-size (click_id, click_us) record however long
    * the stream runs — the canonical "enrich with latest state"
    * flatMapGroupsWithState shape. Each micro-batch folds its events in
    * (us, clicks-first, event_id) order, so a click AT the error's
    * timestamp counts — B9's exact tie rule — and errors before any
    * click drop out (inner as-of). Per-batch work per user is bounded
    * by that user's events in the batch; a hot user bounds at batch
    * size, never stream length.
    */
  def asofAttribute(events: DataFrame): org.apache.spark.sql.Dataset[AsofMatch] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .filter(col("event_type").isin("click", "error"))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("event_time")).as("us"),
        (col("event_type") === "click").as("is_click"))
      .as[AsofEv]

    def fold(userId: Long, it: Iterator[AsofEv],
        state: GroupState[LastClick]): Iterator[AsofMatch] = {
      val evs = it.toSeq.sortBy(e => (e.us, !e.is_click, e.event_id))
      var last = state.getOption
      val out = Seq.newBuilder[AsofMatch]
      evs.foreach { e =>
        if (e.is_click) {
          // keep the LATEST click: a late-arriving older click must not
          // regress the carried state
          if (last.forall(lc =>
              lc.c_us < e.us || (lc.c_us == e.us && lc.c_id < e.event_id)))
            last = Some(LastClick(e.event_id, e.us))
        } else last.foreach { lc =>
          // at-or-before guard: with cross-batch disorder the carried
          // click can postdate a late error — emitting it would violate
          // the as-of contract (negative gap), so the error drops
          // instead (matches inner as-of for in-order streams; a
          // disordered error whose true click was never seen is
          // unanswerable with O(1) state by design)
          if (lc.c_us <= e.us)
            out += AsofMatch(e.event_id, userId, e.us, lc.c_id, lc.c_us, e.us - lc.c_us)
        }
      }
      last.foreach(state.update)
      out.result().iterator
    }

    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fold)
  }

  // ------------------- D33: timeout-path unresolved-error alerting
  final case class PendingErr(id: Long, us: Long)

  /** D33 state: unresolved errors PLUS the in-watermark click times.
    * Remembering clicks makes resolution independent of ARRIVAL order
    * across micro-batches: a click in batch N must still resolve an
    * equal-or-earlier-timestamped error arriving in batch N+1 (the
    * batch contract err_us <= click_us is order-free). Clicks older
    * than the watermark are pruned — an arriving error's event time is
    * >= the watermark (older rows are dropped upstream), so a pruned
    * click could never have resolved it; state stays bounded by one
    * watermark window of clicks per user, never stream length.
    */
  final case class PendingErrs(errs: Seq[PendingErr], clicks: Seq[Long])
  /** Carries the watermarked `event_time` column through the typed
    * projection — EventTimeTimeout requires the watermark attribute to
    * SURVIVE into the stateful operator's child plan; projecting it
    * away (AsofEv's shape) fails analysis even though the watermark is
    * defined upstream.
    */
  final case class AlertEv(user_id: Long, event_id: Long, us: Long,
      is_click: Boolean, event_time: java.sql.Timestamp)
  final case class ErrAlert(event_id: Long, user_id: Long, err_us: Long,
      deadline_us: Long)

  /** How long an error may wait for a resolving same-user click before
    * it alerts — B10/D30's 24 h window, pointed FORWARD.
    */
  val AlertTtlUs: Long = graft.relational.Queries.RangeWindowUs

  /** D33: unresolved-error alerts via the EVENT-TIME TIMEOUT path —
    * the one stateful-streaming mechanism none of D3/D9/D11/D23's
    * NoTimeout folds exercise: an alert row is produced by the TIMER,
    * not by an arriving event. An error opens a pending entry; a
    * same-user click with err_us ≤ click_us ≤ err_us+[[AlertTtlUs]]
    * resolves (silently drops) it; when the WATERMARK passes an
    * error's deadline — the proof that no resolving click can still
    * arrive — the group's timeout fires with an empty input iterator
    * and the alert emits exactly once. The negative-result shape D30
    * gets from the outer interval join, re-expressed as custom state:
    * here the state is the pending list itself (bounded by a user's
    * unresolved errors inside one TTL window, not stream length), the
    * timeout timestamp is always the MINIMUM pending deadline, and
    * emission happens on whichever comes first — a batch that advances
    * the watermark past a deadline while the group has input, or the
    * timer when it doesn't. Assumes the source respects the watermark
    * contract (a straggler click older than the watermark arrives too
    * late to cancel a fired alert — by then the alert is, correctly,
    * already true).
    */
  def timeoutAlerts(events: DataFrame): org.apache.spark.sql.Dataset[ErrAlert] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .withWatermark("event_time", WatermarkDelay)
      .filter(col("event_type").isin("click", "error"))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("event_time")).as("us"),
        (col("event_type") === "click").as("is_click"),
        col("event_time"))
      .as[AlertEv]

    // local copy so the fold lambda captures a Long, not the enclosing
    // object (which is not serializable and must not ship in the task)
    val ttl = AlertTtlUs
    val fold = (userId: Long, it: Iterator[AlertEv],
        state: GroupState[PendingErrs]) => {
      // errors BEFORE clicks at the same timestamp: the batch contract
      // is the order-free interval test err_us <= click_us, so an
      // equal-us click must see (and resolve) the equal-us error —
      // sorted the other way it slips past a not-yet-pending error
      // (fuzz seed 1's planted timestamp ties caught this)
      val evs = it.toSeq.sortBy(e => (e.us, e.is_click, e.event_id))
      val prev = state.getOption.getOrElse(PendingErrs(Seq.empty, Seq.empty))
      var pending = prev.errs
      var clicks = prev.clicks
      evs.foreach { e =>
        if (e.is_click) {
          pending = pending.filterNot(p => p.us <= e.us && e.us <= p.us + ttl)
          clicks = clicks :+ e.us
        } else if (!clicks.exists(c => e.us <= c && c <= e.us + ttl))
          pending = pending :+ PendingErr(e.event_id, e.us)
      }
      // the watermark is the flush authority on BOTH paths (timer and
      // data): everything it proves unresolvable fires now, exactly once
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val (fire, keep) = pending.partition(p => p.us + ttl < wmUs)
      val keepClicks = clicks.filter(_ >= wmUs)
      if (keep.isEmpty && keepClicks.isEmpty) state.remove()
      else {
        state.update(PendingErrs(keep, keepClicks))
        // strictly-future guard: setTimeoutTimestamp rejects timestamps
        // at or before the current watermark. With no pending error the
        // state holds only click memory, which the NEXT watermark
        // advance can prune — time the wakeup off the youngest click.
        val nextUs =
          if (keep.nonEmpty) keep.map(_.us).min + ttl
          else keepClicks.max
        state.setTimeoutTimestamp(math.max(
          nextUs / 1000L + 1L,
          state.getCurrentWatermarkMs() + 1L))
      }
      fire.sortBy(p => (p.us, p.id))
        .map(p => ErrAlert(p.id, userId, p.us, p.us + ttl)).iterator
    }

    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fold)
  }

  // --------------------------------------- D23: streaming SCD2 intervals
  final case class Scd2Ev(user_id: Long, event_id: Long, us: Long, event_type: String)
  final case class Scd2State(cur_type: String, from_us: Long, version: Long)
  final case class Scd2Closed(user_id: Long, version: Long, event_type: String,
      from_us: Long, to_us: Long)

  /** D23: SCD type-2 interval construction as a stream — B31's
    * change-log compression with ONE fixed-size (current type, open
    * from, version) record per user: an arriving event that CHANGES the
    * user's type CLOSES the open interval (emitted with its final
    * validity — immutable, exactly what an append-only SCD sink needs:
    * no retractions ever) and opens the next; the open tail lives only
    * in state (the D3 emit-closed contract). Cross-batch exactness
    * contract: per-user (us, event_id) order across batches (the D17
    * contract — time-cut staging satisfies it); in-batch disorder is
    * sorted away inside the fold.
    */
  def scd2Stream(events: DataFrame): org.apache.spark.sql.Dataset[Scd2Closed] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events.select(col("user_id"), col("event_id"),
      unix_micros(col("event_time")).as("us"), col("event_type")).as[Scd2Ev]

    def fold(userId: Long, it: Iterator[Scd2Ev],
        state: GroupState[Scd2State]): Iterator[Scd2Closed] = {
      val evs = it.toSeq.sortBy(e => (e.us, e.event_id))
      var st = state.getOption
      val out = Seq.newBuilder[Scd2Closed]
      evs.foreach { e =>
        st match {
          case None => st = Some(Scd2State(e.event_type, e.us, 1L))
          case Some(s) if s.cur_type != e.event_type =>
            out += Scd2Closed(userId, s.version, s.cur_type, s.from_us, e.us)
            st = Some(Scd2State(e.event_type, e.us, s.version + 1L))
          case _ => ()
        }
      }
      st.foreach(state.update)
      out.result().iterator
    }

    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fold)
  }

  // ---------------------------------------- D12: streaming funnel state
  final case class FunnelEv(user_id: Long, event_id: Long, us: Long, event_type: String)
  final case class FunnelState(t1: Long, t2: Long, t3: Long)
  final case class FunnelRow(user_id: Long, t1_us: Option[Long],
      t2_us: Option[Long], t3_us: Option[Long], depth: Long)

  /** D12: the B19 windowed funnel (view → click → purchase within 24 h,
    * anchored at the first view) as a STATEFUL STREAM. State per user is
    * ONE fixed-size (t1, t2, t3) record however long the stream runs —
    * the greedy first-occurrence scan over an in-order stream computes
    * exactly B19's min-based chain (t2 = earliest click in (t1, t1+W],
    * etc.), so the batch query IS the oracle. A row is emitted only when
    * a batch ADVANCES a user's depth (≤ 3 emissions per user ever); the
    * reader takes the deepest row per user. Per-batch work per user is
    * bounded by that user's events in the batch.
    */
  def funnelState(events: DataFrame): org.apache.spark.sql.Dataset[FunnelRow] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("event_time")).as("us"), col("event_type"))
      .as[FunnelEv]
    val W = graft.relational.Queries.FunnelWindowUs

    def fold(uid: Long, it: Iterator[FunnelEv],
        state: GroupState[FunnelState]): Iterator[FunnelRow] = {
      val evs = it.toSeq.sortBy(e => (e.us, e.event_id))
      var s = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
      def depthOf(st: FunnelState): Int = Seq(st.t1, st.t2, st.t3).count(_ >= 0)
      val entryDepth = depthOf(s)
      evs.foreach { e =>
        e.event_type match {
          case "view" if s.t1 < 0 => s = s.copy(t1 = e.us)
          case "click" if s.t1 >= 0 && s.t2 < 0
              && e.us > s.t1 && e.us <= s.t1 + W => s = s.copy(t2 = e.us)
          case "purchase" if s.t2 >= 0 && s.t3 < 0
              && e.us > s.t2 && e.us <= s.t1 + W => s = s.copy(t3 = e.us)
          case _ => ()
        }
      }
      val depth = depthOf(s)
      if (depth > entryDepth) {
        state.update(s)
        Iterator.single(FunnelRow(uid,
          Some(s.t1).filter(_ >= 0), Some(s.t2).filter(_ >= 0),
          Some(s.t3).filter(_ >= 0), depth.toLong))
      } else Iterator.empty
    }

    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fold)
  }

  // --------------------------------------- D17: streaming doc packing
  // n_tok is Option: a NULL text has NO token count (regexp_count(NULL)
  // = NULL) — the batch C27 twin keeps such docs as zero-width rows
  // with NULL pack fields (window SUM skips NULLs), so the fold must
  // too; a primitive Long here killed the stream on one NULL-text doc
  // (fuzz-harness find)
  final case class PackDoc(doc_id: Long, source: String, n_tok: Option[Long])
  final case class PackCum(cum: Long)
  final case class PackRow(doc_id: Long, source: String, n_tok: Option[Long],
      seq_id: Option[Long], seq_off: Option[Long])

  /** D17: C27's deterministic sequence packing as a STATEFUL STREAM —
    * the ingest-time form: documents land, each is assigned its training
    * sequence (seq_id, seq_off) the moment it arrives, and the
    * assignment is IDENTICAL to the batch backfill (oracle = c27Sql, one
    * definition). State per source shard is ONE Long — the running token
    * cumsum — however long the stream runs; per-batch work per source is
    * bounded by that source's rows in the batch (sorted in-memory by
    * doc_id, the D3/D11/D12 in-batch ordering contract). The exactness
    * contract mirrors C27's window: within a source, documents must
    * arrive in doc_id order ACROSS batches (the staged replay cuts the
    * corpus at a doc_id threshold, so batch 0's ids all precede batch
    * 1's) — the same contiguous-fill-in-shard-order rule a real pipeline
    * keeps by packing per input shard.
    */
  def packDocs(docs: DataFrame): org.apache.spark.sql.Dataset[PackRow] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    val budget = graft.text.TextQueries.SeqBudget
    val typed = docs
      .select(col("doc_id"), col("source"),
        regexp_count(col("text"), lit("\\S+")).cast("long").as("n_tok"))
      .as[PackDoc]

    def fold(source: String, it: Iterator[PackDoc],
        state: GroupState[PackCum]): Iterator[PackRow] = {
      var cum = state.getOption.map(_.cum).getOrElse(0L)
      val out = it.toSeq.sortBy(_.doc_id).map { d =>
        val off = cum
        cum += d.n_tok.getOrElse(0L)
        // NULL n_tok ⇒ NULL seq fields, zero cum advance (= C27's
        // window arithmetic on a NULL addend)
        PackRow(d.doc_id, source, d.n_tok,
          d.n_tok.map(_ => off / budget), d.n_tok.map(_ => off % budget))
      }
      state.update(PackCum(cum))
      out.iterator
    }

    typed.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fold)
  }

  // ------------------------------ D19: streaming LSH near-dup screen
  final case class BandHit(band: Int, bh: Long, doc_id: Long)
  final case class BucketMin(min_id: Long)
  final case class BandVerdict(doc_id: Long, band: Int, owner: Long)

  /** D19: ingest-time near-duplicate screening — the streaming twin of
    * the C6 LSH bucketing, the screen a live curation pipeline runs the
    * moment a document lands (hours before the batch collapse pass):
    * state per (band, band-hash) bucket is ONE long — the min doc_id
    * ever seen — and each arriving document emits one verdict row per
    * band carrying the bucket's prior owner (itself, if it becomes the
    * owner). A document is a near-dup candidate iff ANY band had an
    * earlier owner — exactly the batch candidate relation "shares a
    * band bucket with a lower doc_id"
    * ([[graft.dedup.DedupQueries.bandRowsOn]] is the shared band
    * definition, so stream and batch bucket identically by
    * construction). State is bounded by DISTINCT signatures, not
    * documents (dup-heavy corpora collapse onto few buckets); per-batch
    * work per bucket is that batch's members, folded in doc_id order —
    * so a staged replay cut at a doc_id threshold (the D17 mechanism)
    * reproduces batch semantics deterministically while genuinely
    * carrying bucket ownership across the batch boundary.
    */
  def lshDedup(bandHits: DataFrame): org.apache.spark.sql.Dataset[BandVerdict] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = bandHits.sparkSession
    import spark.implicits._
    val typed = bandHits
      .select(col("band").cast("int").as("band"), col("bh"), col("doc_id"))
      // a NULL/empty text has NULL band hashes — such docs cannot be
      // screened and must VANISH, exactly as the batch C6 bucket join
      // and the oracle's bh equi-join drop NULL keys (fuzz-harness
      // find: a primitive Long field killed the stream instead)
      .filter(col("bh").isNotNull)
      .as[BandHit]

    def fold(key: (Int, Long), it: Iterator[BandHit],
        state: GroupState[BucketMin]): Iterator[BandVerdict] = {
      val ids = it.map(_.doc_id).toSeq.sorted
      var mn = state.getOption.map(_.min_id).getOrElse(Long.MaxValue)
      val out = ids.map { d =>
        val owner = if (mn < d) mn else d
        if (d < mn) mn = d
        BandVerdict(d, key._1, owner)
      }
      state.update(BucketMin(mn))
      out.iterator
    }

    typed.groupByKey(h => (h.band, h.bh))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fold)
  }

  // ------------------------------ D9: native session_window sessions
  /** D9: sessionization via Spark's NATIVE `session_window` aggregation
    * with a watermark — the declarative streaming sessionizer next to
    * D3's hand-rolled flatMapGroupsWithState state machine. In append
    * mode the engine emits a session only once the watermark passes its
    * end (the no-data flush micro-batch after the last data batch
    * finalizes emission), so the replayed result is every session that
    * CLOSED ≥ watermark-delay before the stream's max event time —
    * which is exactly what the DuckDB oracle computes. Boundary
    * semantics are the ones spec-pinned for B17 (touching sessions
    * merge ≡ B5's strict >).
    */
  def sessionWindowAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("event_time", WatermarkDelay)
      .groupBy(col("user_id"), session_window(col("event_time"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col("event_time"))).as("start_us"),
        max(unix_micros(col("event_time"))).as("end_us"),
        sum(cents(col("value"))).as("sum_value_c"))
      .select("user_id", "start_us", "end_us", "n_events", "sum_value_c")

  // ------------------------------------------- D4: stream-static join
  /** D4: enrich the event stream with a static dimension (stream-static
    * join — the dim is re-read per micro-batch and broadcast, no state)
    * and aggregate revenue-weighted counts per segment window. The
    * pattern every streaming fact pipeline needs; at scale the static
    * side is a broadcastable dim or a pre-bucketed table.
    */
  def enrichedWindowedAgg(events: DataFrame, userDim: DataFrame): DataFrame =
    events
      .withWatermark("event_time", WatermarkDelay)
      .join(broadcast(userDim), col("user_id") === userDim("c_custkey"))
      .groupBy(window(col("event_time"), WindowLen), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_value_c"))
      .select(col("window.start").as("window_start"), col("c_mktsegment"),
        col("n"), col("sum_value_c"))

  /** The static user dimension for [[enrichedWindowedAgg]]. */
  def userDim(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "customer").select(col("c_custkey"), col("c_mktsegment"))

  // ------------------------------------- D5: stream-stream interval join
  /** D5: stream-stream INTERVAL join — each error event joined to every
    * same-user click in the trailing [[graft.relational.Queries.RangeWindowUs]]
    * window (the streaming twin of the batch B10 range join). Both sides
    * carry watermarks and the join condition carries the event-time
    * range, which is what lets Spark bound the join state: click rows
    * age out once the error-side watermark passes their time + window.
    * At scale this is THE canonical stream-stream join shape — without
    * the time bound, state grows without limit.
    */
  def intervalJoin(errors: DataFrame, clicks: DataFrame): DataFrame = {
    val windowUs = graft.relational.Queries.RangeWindowUs
    val e = errors.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("event_time").as("err_time"))
      .withWatermark("err_time", WatermarkDelay)
    val c = clicks.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user_id"),
        col("event_time").as("click_time"))
      .withWatermark("click_time", WatermarkDelay)
    e.join(c, col("user_id") === col("c_user_id")
        && unix_micros(col("click_time")) >= unix_micros(col("err_time")) - lit(windowUs)
        && col("click_time") <= col("err_time"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("err_time")).as("err_us"),
        col("click_id"), unix_micros(col("click_time")).as("click_us"))
  }

  // ------------------- D30: stream-stream LEFT OUTER interval join
  /** D30: the LEFT OUTER variant of [[intervalJoin]] — every error is
    * preserved, and an error with NO same-user click in its trailing
    * 24 h window emits exactly once with the −1 sentinel pair, but only
    * after BOTH watermarks pass the point where a matching click could
    * still arrive. That deferred null emission is the semantics inner
    * joins never exercise: the join must hold the left row in state
    * until the click-side watermark proves the window empty, then emit
    * and evict. State stays bounded by the same argument as D5 (the
    * time-range condition ages both sides out); the null path adds no
    * state — it is the EVICTION that emits.
    *
    * The time bound is written directly on the timestamp columns
    * (`click_time BETWEEN err_time − INTERVAL 24 HOURS AND err_time`) —
    * outer stream-stream joins REQUIRE Catalyst to recognize the
    * event-time constraint to derive the state watermark; an arithmetic
    * disguise (unix_micros) would fail analysis.
    */
  def intervalJoinOuter(errors: DataFrame, clicks: DataFrame): DataFrame = {
    val e = errors.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("event_time").as("err_time"))
      .withWatermark("err_time", WatermarkDelay)
    val c = clicks.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user_id"),
        col("event_time").as("click_time"))
      .withWatermark("click_time", WatermarkDelay)
    e.join(c, col("user_id") === col("c_user_id")
        && col("click_time") >= col("err_time") - expr("INTERVAL 24 HOURS")
        && col("click_time") <= col("err_time"), "leftOuter")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("err_time")).as("err_us"),
        coalesce(col("click_id"), lit(-1L)).as("click_id"),
        coalesce(unix_micros(col("click_time")), lit(-1L)).as("click_us"))
  }

  // --------------------------------------- D6: running (global) totals
  /** D6: unwindowed running aggregate per event_type — the live
    * counters/dashboard shape (complete output mode). State is one row
    * per event_type regardless of stream length, so no watermark is
    * needed: this is the one streaming agg whose state does NOT grow
    * with event time, the complement of D1's windowed/watermarked shape.
    */
  def typeTotals(events: DataFrame): DataFrame =
    events
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_value_c"))

  // --------------------------------- D10: streaming distinct sketch
  /** D10: running per-type distinct-user KMV sketch — the custom
    * [[graft.functions.BottomK]] aggregate executing INSIDE Structured
    * Streaming (ObjectHashAggregate state): each micro-batch folds into
    * one ≤k TreeSet buffer per event_type, so the live cardinality
    * estimate costs O(k·types) state forever — the streaming
    * counterpart of the batch B15 sketch, sharing its hash and
    * estimator constants.
    */
  def distinctSketch(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        graft.relational.Queries.kmvHash(col("user_id")).as("h"))
      .groupBy("event_type")
      .agg(graft.functions.aggs.bottom_k(col("h"), graft.relational.Queries.KmvK).as("bk"))

  /** File-source stream over a DIRECTORY of events parquet files (the
    * shape a real ingest lands: files arriving in a watched directory).
    * `sfDir` is only used to pin the schema from the batch table; the
    * driver testdata's single-file `events.parquet` must be staged into a
    * directory first (see [[stageEventsDir]]).
    */
  /** One-file-per-micro-batch replay when the split-fuzz mode is on:
    * the split stager writes K modTime-spaced files, and
    * `maxFilesPerTrigger=1` makes the file source replay them as K
    * ordered micro-batches. Off (the default), the single staged file
    * replays as one batch — the driver-oracle contract.
    */
  private[streaming] def sourceOptions: Map[String, String] =
    if (sys.env.contains("GRAFT_STREAM_SPLIT")) Map("maxFilesPerTrigger" -> "1")
    else Map.empty

  def eventsStream(spark: SparkSession, sfDir: String, sourceDir: String): DataFrame = {
    val schema = Tables(spark, sfDir, "events").schema
    // the b55 ingest contract, applied at the STREAM boundary too: a
    // NULL-shaped row (event time, actor, kind or metric missing) never
    // reaches a watermark/session operator — the typed fold encoders
    // NOT_NULL_ASSERT-crash on any of them, and watermarked aggs
    // silently drop what their batch oracles keep (the r16/r17 null
    // probes). Staged dirs are RAW copies, so this filter IS the
    // stream-side quarantine point; it must stay equal to
    // Tables.events' predicate.
    normalize(spark.readStream.schema(schema).options(sourceOptions).parquet(sourceDir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull
        && col("event_type").isNotNull && col("value").isNotNull))
  }

  /** Stage a single-file table as a streaming source directory.
    *
    * LOAD-BEARING single-file contract: exactly one source file ⇒ the
    * AvailableNow replay is one micro-batch, which is what makes the
    * D2/D3 driver oracles exact — across multiple micro-batches,
    * dropDuplicatesWithinWatermark may re-admit an id whose first
    * occurrence aged past the watermark, and the sessionizer folds each
    * batch in event-time order only within the batch. The require fails
    * loudly if the testdata ever becomes a multi-file table (then the
    * oracles must model watermark aging instead).
    */
  def stageTableDir(spark: SparkSession, sfDir: String, table: String): String = {
    val src = java.nio.file.Paths.get(sfDir, s"$table.parquet")
    require(java.nio.file.Files.isRegularFile(src),
      s"$src must be a single parquet file — the D-block oracles assume a " +
        "one-file, one-micro-batch AvailableNow replay")
    val dir = java.nio.file.Files.createTempDirectory(s"graft-$table-src")
    java.nio.file.Files.copy(src, dir.resolve("part-0.parquet"))
    dir.toString
  }

  def stageEventsDir(spark: SparkSession, sfDir: String): String =
    stageTableDir(spark, sfDir, "events")

  /** Stage a frame as ONE parquet file under `dir` with an explicit
    * modification time. The file source orders files by modTime (oldest
    * first), so multi-file staging with spaced timestamps yields a
    * DETERMINISTIC micro-batch sequence under `maxFilesPerTrigger=1` —
    * how D16 replays the reference's batch-by-batch operating loop.
    *
    * Returns the staged row count (parquet footer metadata — no Spark
    * job), so replay call sites can derive how many DATA micro-batches
    * the staging actually produced: an empty half stages an empty file,
    * which `maxFilesPerTrigger=1` still reads but which contributes no
    * `numInputRows>0` progress entry. The fuzz corpora (single-row
    * seed 0) hit exactly this.
    */
  def stageFrameFile(df: DataFrame, dir: java.nio.file.Path, name: String,
      modMs: Long): Long = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-stage-one")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp).toArray.map(_.asInstanceOf[java.nio.file.Path])
      .find { p =>
        val n = p.getFileName.toString
        n.startsWith("part-") && n.endsWith(".parquet")
      }.getOrElse(sys.error(s"no parquet part written under $tmp"))
    val dst = dir.resolve(name)
    java.nio.file.Files.move(part, dst)
    require(dst.toFile.setLastModified(modMs), s"cannot set modTime on $dst")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(tmp.toFile)
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(dst.toString),
      df.sparkSession.sparkContext.hadoopConfiguration)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try reader.getRecordCount finally reader.close()
  }

  /** File-source stream over a staged documents directory — the ingest
    * side of a continuously-crawled corpus.
    */
  def docsStream(spark: SparkSession, sfDir: String, sourceDir: String): DataFrame = {
    val schema = Tables(spark, sfDir, "documents").schema
    // the c140 ingest contract at the STREAM boundary: a NULL-doc_id
    // row never reaches the typed PackDoc/dedup folds (staged dirs are
    // RAW copies, so this filter IS the stream-side quarantine point)
    spark.readStream.schema(schema).options(sourceOptions).parquet(sourceDir)
      .filter(col("doc_id").isNotNull)
  }

  def lineitemStream(spark: SparkSession, sfDir: String, sourceDir: String): DataFrame = {
    val schema = Tables(spark, sfDir, "lineitem").schema
    spark.readStream.schema(schema).options(sourceOptions).parquet(sourceDir)
  }

  def embeddingsStream(spark: SparkSession, sfDir: String, sourceDir: String): DataFrame = {
    val schema = Tables(spark, sfDir, "embeddings").schema
    // the c139 ingest contract, applied at the STREAM boundary too:
    // quarantined (NULL/NaN/Inf) vectors never reach the operators
    spark.readStream.schema(schema).options(sourceOptions).parquet(sourceDir)
      .filter(graft.embed.EmbedQueries.finiteVec(col("embedding")))
  }

  /** Split-fuzz staging: the SAME table cut into `k` event-time-ordered
    * micro-batches at seeded-random boundaries (SURVEY §7m; r15 verdict
    * item 3 — d33's cross-batch click-memory gap was found by hand, and
    * every stateful D fold deserves that adversary mechanically).
    *
    * The cuts are WATERMARK-RESPECTING by construction: rows are
    * bucketed by distinct values of the table's ordering key (events →
    * `ts`, so no event in batch j+1 predates batch j, and equal
    * timestamps never straddle a cut), which means the multi-batch
    * replay introduces no late data — a split-invariant operator must
    * produce the single-batch (= DuckDB-oracle) output exactly, and a
    * hash mismatch is a REAL cross-batch state bug, not replay noise.
    * NULL ordering keys land in batch 0 (dense_rank sorts NULLS FIRST).
    *
    * Harness staging, not a production operator: the dense_rank window
    * and per-batch rewrite are fine at fuzz/test SF.
    */
  def stageTableDirSplit(spark: SparkSession, sfDir: String, table: String,
      k: Int, seed: Long): String = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"split staging wants k >= 2, got $k")
    val cutCol = table match {
      case "events" => "ts"
      case "documents" => "doc_id"
      case "embeddings" => "vec_id"
      case "lineitem" => "l_orderkey"
      case t => sys.error(s"stageTableDirSplit: no ordering key for table $t")
    }
    val df = Tables(spark, sfDir, table)
    val nDistinct = df.select(cutCol).distinct().count()
    // k-1 cut ranks sampled without replacement from the gaps between
    // consecutive distinct key values (deterministic per seed)
    val rnd = new scala.util.Random(seed)
    val nCuts = math.min(k - 1L, math.max(nDistinct - 1L, 0L)).toInt
    val cutRanks = rnd.shuffle((2L to nDistinct).toVector).take(nCuts).sorted
    val ranked = df.withColumn("__grp",
      dense_rank().over(Window.orderBy(col(cutCol))).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory(s"graft-$table-split")
    val base = System.currentTimeMillis() - 3600000L
    (0 to nCuts).foreach { b =>
      val lo = if (b == 0) 1L else cutRanks(b - 1)
      val hi = if (b == nCuts) nDistinct + 1 else cutRanks(b)
      stageFrameFile(
        ranked.filter(col("__grp") >= lo && col("__grp") < hi).drop("__grp"),
        dir, s"b$b.parquet", base + b * 60000L): Unit
    }
    dir.toString
  }

  // ------------------------------------------------- D8: upsert sink
  /** Projection for the D8 upsert sink: one row per event with the keyed
    * columns the sink maintains.
    */
  def latestPerUser(events: DataFrame): DataFrame =
    events.select(col("user_id"), col("event_id"),
      unix_micros(col("event_time")).as("us"), col("event_type"),
      cents(col("value")).as("value_c"))

  /** D8 merge body: MERGE a micro-batch into the keyed state table at
    * `stateDir`, keeping each user's LATEST event (max event time,
    * event_id tiebreak) — the streaming twin of A17's conflict-handling
    * persist, in the keep-latest direction (`solardb.py:83-97` is
    * keep-first on insert; a live mirror wants newest-wins). Keep-max is
    * associative and commutative, so the sink state is independent of
    * micro-batch boundaries (spec-proven by replaying a split stream).
    * Locally the sink is a versioned-parquet swap; on a cluster the same
    * body is a `MERGE INTO` against a table format, and the per-batch
    * cost is one shuffle of (batch ∪ state) on the key.
    */
  def upsertLatest(batch: DataFrame, stateDir: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val spark = batch.sparkSession
    val cur = new java.io.File(s"$stateDir/current")
    val old = new java.io.File(s"$stateDir/old")
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rmrf)); f.delete(): Unit
    }
    // ATOMIC_MOVE instead of File.renameTo: renameTo returns a bare
    // false on cross-filesystem moves, ATOMIC_MOVE throws with a cause —
    // so pointing stateDir at a mount where same-dir renames aren't
    // atomic fails loudly instead of corrupting the swap protocol
    def mv(from: java.io.File, to: java.io.File, what: String): Unit =
      try java.nio.file.Files.move(from.toPath, to.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
      catch { case e: java.io.IOException =>
        sys.error(s"d8 upsert: $what move $from -> $to failed: $e") }
    // crash recovery: a previous swap that died between the two renames
    // left the base state at old/ — restore it before merging, so no
    // window of the swap can lose accumulated state (the keep-max merge
    // makes the checkpointed batch replay itself idempotent)
    if (!cur.exists && old.exists) mv(old, cur, "recovery")
    val all =
      if (cur.exists) batch.unionByName(spark.read.parquet(cur.getPath))
      else batch
    val w = Window.partitionBy("user_id").orderBy(col("us").desc, col("event_id").desc)
    val merged = all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val next = new java.io.File(s"$stateDir/next")
    merged.write.mode("overwrite").parquet(next.getPath)
    if (old.exists) rmrf(old)
    if (cur.exists) mv(cur, old, "retire")
    mv(next, cur, "publish")
    rmrf(old)
  }

  /** D7: running vocabulary counts over a document stream — unwindowed
    * stateful aggregation keyed on the token (high-cardinality,
    * skew-bounded by token frequency; the state row is one counter per
    * distinct token, the same footprint a batch partial agg holds). The
    * stream side maintains counts; ranking happens on the sink table
    * after the replay, as a top-k over the final state.
    */
  def vocabCounts(docs: DataFrame): DataFrame =
    docs.select(explode(graft.text.TextQueries.tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("tf"))
}
