package graft.graph

import org.apache.spark.graphx.{EdgeDirection, Pregel, VertexRDD}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GraphX Brandes betweenness from k seeded-uniform sources — same
  * estimator as [[Betweenness]] (Brandes–Pich n/k extrapolation, each
  * unordered pair counted once) without the per-iteration DataFrame
  * planning cost.
  *
  * Forward: one Pregel run carrying all k (dist, sigma) slots — BFS
  * waves arrive level-synchronously, so the first wave fixes dist and
  * the merged same-round messages fix sigma (# shortest paths).
  * Backward: level-synchronous dependency accumulation δ(v) =
  * Σ_w σ(v)/σ(w)·(1+δ(w)) over successors w, one aggregateMessages per
  * level from the deepest frontier upward — diameter rounds total, all
  * sources simultaneously.
  */
object GxBetweenness {

  /** EXACT betweenness — every vertex a Brandes source, no sampling
    * (the reference computes exact on the driver, main.py:151-155; the
    * estimator stays the production default because exact is Θ(|V|·|E|)
    * work and Θ(|V|) per-vertex state). With all sources the n/k
    * extrapolation factor is 1, so this is textbook Brandes: the
    * per-vertex (dist, sigma) slot arrays are |V| wide — opt in only at
    * reference scale (≲ tens of thousands of vertices), where the
    * quadratic state still fits executor memory. */
  def exact(g: Graph, seed: Long = 42L): DataFrame = {
    val n = g.vertexCount
    require(n <= 100000,
      s"exact betweenness is quadratic state: |V| = $n is past the " +
        "opt-in envelope; use the seeded estimator (run) instead")
    run(g, numSources = n.toInt, seed = seed)
  }

  def run(g: Graph, numSources: Int = 8, seed: Long = 42L): DataFrame =
    sweep(g, numSources, seed)._1

  /** EDGE betweenness (nx.edge_betweenness_centrality / the
    * Girvan–Newman splitting criterion), same seeded Brandes estimator:
    * the backward sweep's per-edge term σv/σw·(1+δw) IS the edge
    * dependency, so the edge variant collects exactly what the vertex
    * accumulation already routes — one extra triplets pass per level,
    * same fixed-point micro-longs, same n/k extrapolation. */
  def edgeRun(g: Graph, numSources: Int = 8, seed: Long = 42L): DataFrame =
    sweep(g, numSources, seed)._2

  // ONE sweep serves both rankings (r9): vertex and edge betweenness
  // share the forward (dist, sigma) Pregel and the entire backward
  // dependency recursion — r8 ran the full sweep twice (2.0 s + 5.9 s
  // at sf0.1); the edge variant's extra per-level triplets pass is the
  // only marginal cost, which is why the edge table is computed
  // EAGERLY with the vertex table rather than lazily: the production
  // suite always consumes both, and a vertex-only first pass would
  // re-run the whole forward+backward sweep when the edge ranking is
  // asked for next (r8's exact double cost back again).
  //
  // Keying (r10, closes the ADVICE r9 medium): the memo key is the
  // Graph VALUE — a case class over DataFrames whose equals is the
  // frames' reference identity — inside an access-ordered LRU, so (a)
  // two live graphs can never collide the way identityHashCode
  // strings could, and (b) fresh-Graph-per-call patterns (the
  // FallbackGateSpec shape) evict their oldest persisted tables
  // instead of retaining every sweep for the session lifetime.
  private final case class SweepTables(vtxHandle: DataFrame,
                                       edgeHandle: DataFrame,
                                       vtx: DataFrame, edge: DataFrame)

  private val sweepCap = 8
  private val sweepCache =
    new java.util.LinkedHashMap[(Graph, Int, Long), SweepTables](
      16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(Graph, Int, Long), SweepTables]): Boolean =
        if (size > sweepCap) {
          e.getValue.vtxHandle.unpersist(blocking = false)
          e.getValue.edgeHandle.unpersist(blocking = false)
          true
        } else false
    }

  /** persist → count → flatten like Materialize.table, but KEEPS the
    * persisted handle so LRU eviction can free the blocks. */
  private def matKeep(df: DataFrame): (DataFrame, DataFrame) = {
    val cached = df.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cached.count()
    (cached, org.apache.spark.sql.graft.Bridge.flatten(cached))
  }

  // the lock is held across the sweep computation — same per-key
  // blocking the TrieMap memo had; all callers are sequential queries
  private def sweep(g: Graph, numSources: Int,
                    seed: Long): (DataFrame, DataFrame) =
    sweepCache.synchronized {
      val key = (g, numSources, seed)
      val hit = sweepCache.get(key)
      val entry = if (hit != null) hit else {
        val built = computeSweep(g, numSources, seed)
        sweepCache.put(key, built)
        built
      }
      (entry.vtx, entry.edge)
    }

  private def computeSweep(g: Graph, numSources: Int,
                           seed: Long): SweepTables = {
    val Inf = Int.MaxValue // local: closures must not capture the module
    val spark = g.edges.sparkSession
    import spark.implicits._
    val n = g.vertices.count()
    // md5-ordered uniform sample — engine-portable source selection,
    // same ordering as Betweenness.run and the DuckDB oracle
    val sources = g.vertices
      .orderBy(md5(concat_ws(":", col("id"), lit(seed))), col("id"))
      .limit(numSources).select("id").as[Long].collect().toSeq
    val k = math.min(numSources.toLong, n)
    val slot = sources.zipWithIndex.toMap

    // ---- forward sweep: per-slot (dist, sigma) ----
    final case class DS(dist: Array[Int], sigma: Array[Double])
    def mergeMsg(a: DS, b: DS): DS = {
      val d = new Array[Int](sources.size)
      val s = new Array[Double](sources.size)
      var i = 0
      while (i < d.length) {
        if (a.dist(i) < b.dist(i)) { d(i) = a.dist(i); s(i) = a.sigma(i) }
        else if (b.dist(i) < a.dist(i)) { d(i) = b.dist(i); s(i) = b.sigma(i) }
        else { d(i) = a.dist(i); s(i) = a.sigma(i) + b.sigma(i) }
        i += 1
      }
      DS(d, s)
    }
    // candidate wave from `from` toward a vertex currently at `to`;
    // null unless some slot STRICTLY improves. (Equal-dist sends are
    // never needed — all dist-d parents are set in round d and deliver
    // their sigma merged in round d+1 — and would keep the target
    // spuriously active forever.)
    def wave(from: DS, to: DS): DS = {
      var any = false
      val d = new Array[Int](sources.size)
      val s = new Array[Double](sources.size)
      var i = 0
      while (i < d.length) {
        if (from.dist(i) != Inf && from.dist(i) + 1 < to.dist(i)) {
          d(i) = from.dist(i) + 1
          s(i) = from.sigma(i)
          any = true
        } else { d(i) = Inf; s(i) = 0.0 }
        i += 1
      }
      if (any) DS(d, s) else null
    }
    val init = Gx.of(g).mapVertices { (id, _) =>
      val d = Array.fill(sources.size)(Inf)
      val s = new Array[Double](sources.size)
      slot.get(id).foreach { i => d(i) = 0; s(i) = 1.0 }
      DS(d, s)
    }
    val initMsg = DS(Array.fill(sources.size)(Inf), new Array[Double](sources.size))
    // vprog: adopt strictly better dists; ACCUMULATE sigma on equal dist
    // arriving in the same superstep (mergeMsg already combined them)
    val forward = Pregel(init, initMsg, activeDirection = EdgeDirection.Either)(
      (_, attr, msg) => {
        val d = new Array[Int](sources.size)
        val s = new Array[Double](sources.size)
        var i = 0
        while (i < d.length) {
          if (msg.dist(i) < attr.dist(i)) { d(i) = msg.dist(i); s(i) = msg.sigma(i) }
          else { d(i) = attr.dist(i); s(i) = attr.sigma(i) }
          i += 1
        }
        DS(d, s)
      },
      t => {
        val toDst = wave(t.srcAttr, t.dstAttr)
        val toSrc = wave(t.dstAttr, t.srcAttr)
        (if (toDst != null) Iterator((t.dstId, toDst)) else Iterator.empty) ++
          (if (toSrc != null) Iterator((t.srcId, toSrc)) else Iterator.empty)
      },
      mergeMsg).cache()
    forward.vertices.count()

    val maxDist = forward.vertices
      .map { case (_, ds) => ds.dist.foldLeft(0)((m, d) => if (d != Inf) math.max(m, d) else m) }
      .fold(0)(math.max)

    // ---- backward sweep: Array[delta] per vertex, level-synchronous ----
    // delta lives in a VertexRDD and the message graph is rebuilt FROM
    // THE CACHED FORWARD GRAPH each level (the Gx.labelPropagation
    // pattern) — chaining bg.outerJoinVertices(bg...) per level instead
    // grows GraphX's replicated-vertex-view lineage with graph depth,
    // the exact instability the LPA rewrite removed (bimodal runtimes
    // when an upstream view gets re-shipped)
    // δ is FIXED-POINT (long micro-units, 1e-9): each contribution
    // σv/σw·(1e9+δw) is rounded to a long before summing, so merges are
    // exact integer adds — independent of GraphX's message-merge order,
    // hence deterministic run-to-run AND engine-portable (matches
    // Betweenness.run and the DuckDB oracle bit-for-bit)
    var delta: VertexRDD[Array[Long]] =
      forward.vertices.mapValues(_ => new Array[Long](sources.size)).cache()
    delta.count()
    // per-edge dependency accumulator (edge mode only): the level-l
    // term for edge (v at l−1, w at l) is the SAME micro-long the
    // vertex path sends — collected keyed by the canonical edge.
    // One persisted RDD per level (materialized before bg unpersists),
    // unioned once at the end — not a re-persisted chain.
    val edgeLevels =
      scala.collection.mutable.ListBuffer
        .empty[org.apache.spark.rdd.RDD[((Long, Long), Long)]]
    for (level <- maxDist to 1 by -1) {
      val bg = forward.outerJoinVertices(delta)((_, ds, d) =>
        (ds, d.getOrElse(new Array[Long](sources.size)))).cache()
      locally {
        val lvl = level // avoid capturing the loop var reference
        val nSlots = sources.size
        val levelEdges = bg.triplets.flatMap { t =>
          def tot(vAttr: (DS, Array[Long]), wAttr: (DS, Array[Long])): Long = {
            val (vds, _) = vAttr
            val (wds, wdelta) = wAttr
            var s = 0L
            var i = 0
            while (i < nSlots) {
              if (wds.dist(i) == lvl && vds.dist(i) == lvl - 1 && wds.sigma(i) > 0)
                s += math.floor(
                  vds.sigma(i) / wds.sigma(i) * (1.0e9 + wdelta(i)) + 0.5).toLong
              i += 1
            }
            s
          }
          val c = tot(t.srcAttr, t.dstAttr) + tot(t.dstAttr, t.srcAttr)
          if (c != 0L)
            Iterator(((math.min(t.srcId, t.dstId),
              math.max(t.srcId, t.dstId)), c))
          else Iterator.empty
        }
        // materialize NOW: levelEdges reads bg, which is unpersisted at
        // the end of this iteration
        val persisted = levelEdges
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        persisted.count()
        edgeLevels += persisted
      }
      val contribs = bg.aggregateMessages[Array[Long]](
        t => {
          // successor w (dist level) contributes to predecessor v
          // (dist level-1): round(sigma_v/sigma_w * (1e9 + delta_w))
          def contrib(vAttr: (DS, Array[Long]), wAttr: (DS, Array[Long])): Array[Long] = {
            val (vds, _) = vAttr
            val (wds, wdelta) = wAttr
            var any = false
            val out = new Array[Long](sources.size)
            var i = 0
            while (i < out.length) {
              if (wds.dist(i) == level && vds.dist(i) == level - 1 && wds.sigma(i) > 0) {
                out(i) = math.floor(
                  vds.sigma(i) / wds.sigma(i) * (1.0e9 + wdelta(i)) + 0.5).toLong
                any = true
              }
              i += 1
            }
            if (any) out else null
          }
          val toSrc = contrib(t.srcAttr, t.dstAttr)
          val toDst = contrib(t.dstAttr, t.srcAttr)
          if (toSrc != null) t.sendToSrc(toSrc)
          if (toDst != null) t.sendToDst(toDst)
        },
        (a, b) => {
          val out = new Array[Long](sources.size)
          var i = 0
          while (i < out.length) { out(i) = a(i) + b(i); i += 1 }
          out
        })
      val prev = delta
      delta = bg.vertices.leftJoin(contribs) { (_, attr, c) =>
        val (ds, d) = attr
        c match {
          case Some(arr) =>
            val nd = new Array[Long](sources.size)
            var i = 0
            // only vertices AT level-1 accept this level's contribution
            while (i < nd.length) {
              nd(i) = if (ds.dist(i) == level - 1) d(i) + arr(i) else d(i)
              i += 1
            }
            nd
          case None => d
        }
      }.cache()
      delta.count()
      prev.unpersist(blocking = false)
      // vertices only — bg shares the forward graph's cached edges
      bg.unpersistVertices(blocking = false)
    }

    val all =
      if (edgeLevels.isEmpty)
        spark.sparkContext.emptyRDD[((Long, Long), Long)]
      else spark.sparkContext.union(edgeLevels.toSeq)
    val eb = all.reduceByKey(_ + _)
      .map { case ((lo, hi), m) => (lo, hi, m) }
      .toDF("src", "dst", "depmicro")
    // canonicalize defensively: co-purchase edges are src<dst by
    // construction, but Graph accepts any orientation
    val edgeOut = g.edges
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .join(eb, Seq("src", "dst"), "left")
      .na.fill(0L, Seq("depmicro"))
      .select(col("src"), col("dst"),
        ((col("depmicro") * lit(n)).cast("double") / lit(k * 2.0 * 1.0e9))
          .as("edge_betweenness"))
    val (edgeHandle, edgeTable) = matKeep(edgeOut)
    edgeLevels.foreach(_.unpersist(blocking = false))

    val srcArr = sources.toArray
    val dep = forward.vertices.leftJoin(delta) { (id, ds, dOpt) =>
      val d = dOpt.getOrElse(new Array[Long](sources.size))
      var sum = 0L
      var i = 0
      while (i < d.length) {
        // δ at the source itself is excluded (pairs s≠v)
        if (srcArr(i) != id && ds.dist(i) != Inf) sum += d(i)
        i += 1
      }
      sum
    }.map { case (id, s) => (id, s) }.toDF("id", "dep")

    // no final round(): see Betweenness.run — the exact rational
    // depMicro·n/(k·2·1e9) is bit-identical across engines, a decimal
    // rounding of micro-grid values is not (.5-tie divergence)
    val (vtxHandle, vtxTable) = matKeep(
      g.vertices.select("id")
        .join(dep, Seq("id"), "left")
        .na.fill(0L, Seq("dep"))
        .select(col("id"),
          ((col("dep") * lit(n)).cast("double") / lit(k * 2.0 * 1.0e9))
            .as("betweenness")))
    // both outputs are materialized leaves now — the sweep's vertex
    // state can go. Edges stay: forward shares the session-cached
    // Gx.of(g) edge partitions (Pregel only rewrites vertices).
    delta.unpersist(blocking = false)
    forward.unpersistVertices(blocking = false)
    SweepTables(vtxHandle, edgeHandle, vtxTable, edgeTable)
  }
}
