package graft.tools

import graft.GraftSession
import graft.graph._
import org.apache.spark.sql.functions._

/** Dev profiling main for the community-sample pipeline stages. */
object ProfileSample {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("profile", 32)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val g = t("edges+persist") {
      val g = GraphBuilder.coPurchase(spark, dir)
      g.edges.count(); g
    }
    val comms = t("lpa5") {
      val c = Iterative.normalizeLabels(Iterative.labelPropagation(g, 5))
        .localCheckpoint(true)
      c.count(); c
    }
    println("[prof] n communities: " + comms.select("community").distinct().count())
    comms.groupBy("community").count().orderBy(col("count").desc).show(5)
    val intra = t("intra-edges") {
      val cSrc = comms.select(col("id").as("src"), col("community").as("c1"))
      val cDst = comms.select(col("id").as("dst"), col("community").as("c2"))
      val i = g.edges.join(cSrc, "src").join(cDst, "dst")
        .filter(col("c1") === col("c2"))
        .select(col("src"), col("dst"), col("c1").as("community"))
        .localCheckpoint(true)
      println("[prof] intra edges: " + i.count()); i
    }
    val sub = Graph(comms.select("id"), intra.select("src", "dst"))
    t("sub-clustering") {
      sub.clusteringCoefficients.count()
    }
    t("adjacency") {
      val sym = intra.select(col("community"), col("src").as("v"), col("dst").as("n"))
        .union(intra.select(col("community"), col("dst").as("v"), col("src").as("n")))
      sym.groupBy("community", "v")
        .agg(sort_array(collect_list("n")).as("neighbors")).count()
    }
    val cc = sub.clusteringCoefficients.select("id", "clustering_coeff")
    val commCc = t("commCc") {
      val c = comms.join(cc, Seq("id"), "left")
        .na.fill(0.0, Seq("clustering_coeff"))
        .groupBy("community")
        .agg(count(lit(1)).as("n_vertices"), avg("clustering_coeff").as("avg_cc"))
        .withColumn("walk_len",
          (col("n_vertices") / (lit(1.0) + lit(2.0) * col("avg_cc"))).cast("int") + 1)
        .localCheckpoint(true)
      c.show(5); c
    }
    val adj = t("adj-with-len") {
      val sym = intra.select(col("community"), col("src").as("v"), col("dst").as("n"))
        .union(intra.select(col("community"), col("dst").as("v"), col("src").as("n")))
      val a = sym.groupBy("community", "v")
        .agg(sort_array(collect_list("n")).as("neighbors"))
        .join(commCc.select("community", "walk_len"), "community")
        .localCheckpoint(true)
      a.count(); a
    }
    t("walk-only") {
      import spark.implicits._
      val n = adj.select(col("community"), col("v"), col("neighbors"), col("walk_len"))
        .repartition(32, col("community"))
        .mapPartitions { rows =>
          val byComm = scala.collection.mutable.Map.empty[Int, (scala.collection.mutable.Map[Long, Array[Long]], Int)]
          rows.foreach { r =>
            val c = r.getInt(0)
            val entry = byComm.getOrElseUpdate(c, (scala.collection.mutable.Map.empty, 0))
            entry._1(r.getLong(1)) = r.getSeq[Long](2).toArray
            byComm(c) = (entry._1, r.getInt(3))
          }
          byComm.iterator.flatMap { case (c, (adjMap, walkLen)) =>
            val rng = new java.util.Random(42L ^ c.toLong)
            val vertices = adjMap.keys.toArray.sorted
            var cur = vertices(rng.nextInt(vertices.length))
            val visited = scala.collection.mutable.LinkedHashSet(cur)
            var steps = 1
            while (steps < walkLen) {
              val nbrs = adjMap(cur)
              if (nbrs.nonEmpty) cur = nbrs(rng.nextInt(nbrs.length))
              visited += cur
              steps += 1
            }
            visited.iterator.map(v => (c, v))
          }
        }.count()
      println("[prof] walk rows: " + n)
    }
    t("full-sample") {
      CommunitySample.sample(spark, g).count()
    }
    spark.stop()
  }
}
