package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.Seal._

/** Generic min-label connected components over an arbitrary undirected
  * edge list — the graph twin of the grid-specialized
  * [[graft.tiles.Clustering]] loop, used to collapse near-duplicate
  * document pairs into canonical clusters (C19).
  *
  * Size-dispatched hybrid, same rationale as `Clustering`'s rdd/df
  * split (`graft.gcc.impl` forces `local` or `df`):
  *  - small edge lists are LATENCY-bound: the distributed fixpoint pays
  *    3 jobs × shuffle scheduling per round for ~log4(diameter) rounds
  *    (measured 6.7 s for a 5000-vertex/0.9M-edge graph that a single
  *    union-find task closes in well under a second) — so below
  *    [[SmallGraphMax]] edges the components come from ONE
  *    `mapPartitions` task running union-find with path compression;
  *  - large graphs take the DataFrame pointer-jumping loop: neighbor-min
  *    (one edge join + partial-agg shuffle per round) then double
  *    pointer jump (label(v) ← label(label(v))), rounds ≈
  *    log4(component diameter). Per-round traffic is O(|E| + |V|); at
  *    100 TB both shuffle keys (vertex id) are high-cardinality and
  *    skew-free after the LSH supernode stage has already collapsed
  *    exact-duplicate groups. Lineage truncated per round with a lazy
  *    localCheckpoint materialized by the convergence sum; the sum runs
  *    in DECIMAL(38,0) so packed/large ids can't overflow under ANSI.
  */
object GraphCC {

  /** Edge-count threshold for the single-task union-find fast path.
    * Sized so the per-task hash maps (~48 B/entry × |touched ids| ≤
    * 2·|E|) stay well inside one executor core's working memory.
    */
  val SmallGraphMax = 2000000L

  /** vertices: one `id` column; edges: `src`, `dst` (any orientation,
    * duplicates and self-loops fine — both are normalized). Returns
    * (id, cluster_id) where cluster_id = min vertex id of the component.
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
      maxIter: Int = 40): DataFrame = {
    val spark = vertices.sparkSession
    val debug = sys.env.contains("GRAFT_CC_DEBUG")
    def stamp(what: String): Unit =
      if (debug) System.err.println(s"[gcc] $what t=${System.nanoTime() / 1e9}")
    stamp("start")
    // The input is sealed FIRST — downstream consumers (either engine)
    // would otherwise re-evaluate the (possibly expensive) edge
    // derivation subtree per job.
    val e0 = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).seal()
    val nE = e0.count()
    stamp(s"edges sealed nE=$nE")
    val impl = spark.conf.getOption("graft.gcc.impl")
      .getOrElse(if (nE <= SmallGraphMax) "local" else "df")
    val r = if (impl == "local") ccLocal(vertices, e0, stamp)
      else ccDf(vertices, e0, maxIter, stamp)
    stamp("done")
    r
  }

  /** Single-task union-find for small edge lists (see class doc): one
    * `mapPartitions` over the coalesced edges builds parent pointers
    * with path compression, unioning by MIN so every root is its
    * component's smallest id; singleton vertices come back via the left
    * join (no edge row → label = own id). Runs on an executor, not the
    * driver — no collect.
    */
  private def ccLocal(vertices: DataFrame, e0: DataFrame,
      stamp: String => Unit): DataFrame = {
    val spark = vertices.sparkSession
    import spark.implicits._
    val touched = e0.as[(Long, Long)].coalesce(1).mapPartitions { it =>
      val parent = new java.util.HashMap[Long, Long]()
      def find(x0: Long): Long = {
        var x = x0
        var p = parent.getOrDefault(x, x)
        while (p != x) {
          val gp = parent.getOrDefault(p, p)
          parent.put(x, gp)
          x = p
          p = gp
        }
        x
      }
      val ids = new java.util.HashSet[Long]()
      it.foreach { case (s, d) =>
        ids.add(s)
        ids.add(d)
        val rs = find(s)
        val rd = find(d)
        if (rs < rd) parent.put(rd, rs)
        else if (rd < rs) parent.put(rs, rd)
      }
      val out = Iterator.newBuilder[(Long, Long)]
      ids.forEach(id => out += ((id, find(id))))
      out.result()
    }.toDF("id", "lbl")
    val labeled = vertices.select(col("id")).distinct()
      .join(touched, Seq("id"), "left")
      .select(col("id"), coalesce(col("lbl"), col("id")).as("cluster_id"))
    stamp("local union-find labeled")
    labeled
  }

  /** Per-round lineage truncation: executor-local blocks by default
    * (fast), or a durable `checkpoint` under `graft.gcc.durable=true`
    * (requires `SparkContext.setCheckpointDir`) so a long cluster run
    * survives executor loss — same trade Clustering's RDD loop offers
    * via `graft.cc.durable`.
    */
  private def truncate(df: DataFrame, eager: Boolean): DataFrame =
    if (df.sparkSession.conf.getOption("graft.gcc.durable").contains("true"))
      df.checkpoint(eager)
    else df.localCheckpoint(eager)

  /** DataFrame pointer-jumping fixpoint for large graphs (class doc). */
  private def ccDf(vertices: DataFrame, e0: DataFrame, maxIter: Int,
      stamp: String => Unit): DataFrame = {
    val und = truncate(e0
      .union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct(), eager = true)
    stamp("edges materialized")
    var labels = truncate(vertices.select(col("id")).distinct()
      .withColumn("lbl", col("id")), eager = true)
    stamp("labels")
    def lblSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("lbl").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)"))).head().getDecimal(0)
    var prevSum = lblSum(labels)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      // neighbor-min: push labels across edges (every dst is a real
      // vertex, so no membership filter), aggregate the incoming
      // messages, and fold them into the vertex's own label with a left
      // join + least — deliberately NOT a union of the message and label
      // frames: union children sharing attribute lineage trip Catalyst's
      // constraint rewriting. Materialized eagerly so the two pointer
      // jumps below self-join a sealed frame and plans stay O(1).
      val msgs = und
        .join(labels.select(col("id").as("src"), col("lbl").as("mlbl")), "src")
        .groupBy("dst").agg(min("mlbl").as("mlbl"))
        .withColumnRenamed("dst", "id")
      val nmin = truncate(labels.join(msgs, Seq("id"), "left")
        .select(col("id"), least(col("lbl"), coalesce(col("mlbl"), col("lbl"))).as("lbl")),
        eager = true)
      val parents = nmin.select(col("id").as("pid"), col("lbl").as("plbl"))
      def jump(df: DataFrame, tag: String): DataFrame =
        df.as("l").join(parents.as(tag), col("l.lbl") === col(s"$tag.pid"), "left")
          .select(col("l.id").as("id"),
            least(col("l.lbl"), coalesce(col(s"$tag.plbl"), col("l.lbl"))).as("lbl"))
      val next = truncate(jump(jump(nmin, "p1"), "p2"), eager = false)
      val s = lblSum(next)
      done = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      iter += 1
      stamp(s"round $iter done=$done")
    }
    labels.withColumnRenamed("lbl", "cluster_id")
  }
}
