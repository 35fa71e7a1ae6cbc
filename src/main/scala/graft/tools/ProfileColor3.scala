package graft.tools

import graft.GraftSession
import graft.graph.GraphBuilder
import org.apache.spark.sql.functions._

/** Dev probe: per-round cost breakdown of greedyColoring's loop. */
object ProfileColor3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("profile-color3", 32)
    import graft.functions.ColoringColumns.{countHigherPri, jpPriority, kthAbsent}
    val g = GraphBuilder.coPurchase(spark, dir)
    def tick(name: String, t0: Long): Long = {
      val t = System.nanoTime()
      println(f"[prof] $name: ${(t - t0) / 1e9}%.2f s")
      t
    }
    var t = System.nanoTime()
    val adj = g.collectNeighborIds
      .select(col("id"), col("neighbor_ids").as("nbrs"))
      .localCheckpoint(true)
    t = tick("adj checkpoint", t)
    var st = adj
      .select(col("id"),
        countHigherPri(col("nbrs"), col("id")).as("rk"),
        array().cast("array<long>").as("used"),
        lit(null).cast("long").as("color"))
      .localCheckpoint(true)
    t = tick("st init", t)
    var done = false
    var r = 0
    while (r < 12 && !done) {
      r += 1
      val picks = st.filter(col("color").isNull)
        .join(adj, "id")
        .select(col("id"), col("nbrs"), jpPriority(col("id")).as("h"),
          kthAbsent(col("used"), col("rk")).as("pick"))
        .cache()
      val np = picks.count()
      t = tick(s"r$r picks ($np)", t)
      if (np == 0) { done = true; picks.unpersist() }
      else {
        val cmsg = picks
          .select(col("id").as("sender"), col("h").as("sh"),
            col("pick").as("spick"), explode(col("nbrs")).as("id"))
        val losers = cmsg
          .join(picks.select(col("id"), col("h"), col("pick")), "id")
          .filter(col("spick") === col("pick") &&
            (col("sh") > col("h") ||
              (col("sh") === col("h") && col("sender") > col("id"))))
          .select("id").distinct()
        val winners = picks.join(losers, Seq("id"), "left_anti").cache()
        val upd = winners
          .select(col("id").as("sender"), col("h").as("sh"), col("pick"),
            explode(col("nbrs")).as("id"))
          .withColumn("rh", jpPriority(col("id")))
          .groupBy("id")
          .agg(sort_array(collect_list(col("pick"))).as("newUsed"),
            sum(when(col("sh") > col("rh") ||
              (col("sh") === col("rh") && col("sender") > col("id")),
              1L).otherwise(0L)).as("dec"))
        st = st
          .join(winners.select(col("id"), col("pick")), Seq("id"), "left")
          .join(upd, Seq("id"), "left")
          .select(col("id"),
            (col("rk") - coalesce(col("dec"), lit(0L))).as("rk"),
            array_sort(concat(col("used"),
              coalesce(col("newUsed"), array().cast("array<long>"))))
              .as("used"),
            coalesce(col("color"), col("pick")).as("color"))
          .localCheckpoint(true)
        t = tick(s"r$r st checkpoint", t)
        picks.unpersist()
        winners.unpersist()
      }
    }
    spark.stop()
  }
}
