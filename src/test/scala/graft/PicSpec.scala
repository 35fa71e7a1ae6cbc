package graft

import graft.graph.Gx
import org.scalatest.funsuite.AnyFunSuite

/** Gates for [[Gx.powerIterationClustering]] — the GraphFrames
  * `PowerIterationClustering` API counterpart: planted-cluster recovery
  * on a seeded stochastic block model plus shape/determinism checks. */
class PicSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val blocks = 3
  private val perBlock = 40

  // deterministic md5 coin per unordered pair — the repo's portable-
  // randomness idiom, here driver-side to plant the SBM
  private def coin(a: Long, b: Long): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"sbm:$a:$b".getBytes("UTF-8"))
    val u = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
    u.toDouble / (1L << 32).toDouble
  }

  private lazy val sbmEdges = {
    val n = blocks * perBlock
    val es = for {
      a <- 0L until n
      b <- (a + 1) until n
      p = if (a / perBlock == b / perBlock) 0.5 else 0.02
      if coin(a, b) < p
    } yield (a, b, 1.0)
    es.toDF("src", "dst", "weight")
  }

  test("PIC recovers the planted SBM blocks (k = 3)") {
    val got = Gx.powerIterationClustering(sbmEdges, k = blocks)
      .as[(Long, Int)].collect().toMap
    assert(got.size == blocks * perBlock) // every vertex labeled
    // majority label per planted block; require >= 95% purity and
    // pairwise-distinct majorities — full recovery up to label swap
    val majority = (0 until blocks).map { blk =>
      val ids = (blk.toLong * perBlock) until ((blk + 1L) * perBlock)
      val labels = ids.map(got)
      val maj = labels.groupBy(identity).maxBy { case (l, v) => (v.size, -l) }._1
      val purity = labels.count(_ == maj).toDouble / labels.size
      assert(purity >= 0.95, s"block $blk purity $purity (majority $maj)")
      maj
    }
    assert(majority.distinct.size == blocks,
      s"blocks collapsed onto labels $majority")
  }

  test("cluster ids are 0..k-1, renumbered by ascending centroid") {
    val df = Gx.powerIterationClustering(sbmEdges, k = blocks)
    assert(df.columns.toSeq == Seq("id", "cluster"))
    val labels = df.as[(Long, Int)].collect().map(_._2).toSet
    assert(labels.subsetOf((0 until blocks).toSet), labels)
    // ascending-centroid renumbering makes the labeling a pure
    // function of the data — two runs agree exactly
    val again = Gx.powerIterationClustering(sbmEdges, k = blocks)
      .as[(Long, Int)].collect().toMap
    val first = df.as[(Long, Int)].collect().toMap
    assert(first == again)
  }

  test("k larger than the natural cluster count still labels every vertex") {
    val got = Gx.powerIterationClustering(sbmEdges, k = 5)
      .as[(Long, Int)].collect()
    assert(got.length == blocks * perBlock)
    assert(got.map(_._2).forall(c => c >= 0 && c < 5))
  }
}
