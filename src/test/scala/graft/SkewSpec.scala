package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // one hot key (0) with 5000 rows, 50 cold keys with 10 each
  private lazy val big = ((1 to 5000).map(i => (0L, i.toLong)) ++
    (1 to 50).flatMap(k => (1 to 10).map(i => (k.toLong, i.toLong))))
    .toDF("k", "v").repartition(8)
  private lazy val small = (0L to 60L).map(k => (k, s"dim_$k"))
    .toDF("k", "name")

  test("salted inner join equals the plain join on skewed data") {
    val plain = big.join(small, Seq("k"), "inner")
      .select("k", "v", "name").as[(Long, Long, String)].collect().sorted
    val salted = Skew.saltedJoin(big, small, "k", salt = 8)
      .select("k", "v", "name").as[(Long, Long, String)].collect().sorted
    assert(salted.toSeq == plain.toSeq)
    assert(plain.length == 5500)
  }

  test("salted left join keeps unmatched big-side rows exactly once") {
    val withOrphans = big.union(Seq((999L, 1L), (999L, 2L)).toDF("k", "v"))
    val plain = withOrphans.join(small, Seq("k"), "left")
      .select($"k", $"v", $"name").as[(Long, Long, Option[String])]
      .collect().sortBy(r => (r._1, r._2))
    val salted = Skew.saltedJoin(withOrphans, small, "k", salt = 8,
      joinType = "left")
      .select($"k", $"v", $"name").as[(Long, Long, Option[String])]
      .collect().sortBy(r => (r._1, r._2))
    assert(salted.toSeq == plain.toSeq)
    assert(plain.count(_._3.isEmpty) == 2)
  }

  test("salted join scatters the hot key across multiple partitions") {
    val saltCol = Skew.saltedJoin(big, small, "k", salt = 8)
    // the joined hot-key rows must not all sit in one task's partition:
    // count distinct partitions holding k=0 rows after the salted shuffle
    val parts = Skew.saltedJoin(big, small, "k", salt = 8)
      .filter($"k" === 0L)
      .select(org.apache.spark.sql.functions.spark_partition_id().as("p"))
      .distinct().count()
    assert(parts > 1, s"hot key landed in $parts partition(s)")
    assert(saltCol.columns.toSet == Set("k", "v", "name"))
  }

  test("keySkew reports the hot key and a ratio > 1") {
    val r = Skew.keySkew(big, $"k")
      .as[(Long, Long, Long, Double, Double)].head()
    val (nKeys, hottest, maxN, avgN, ratio) = r
    assert(nKeys == 51)
    assert(hottest == 0L && maxN == 5000L)
    assert(math.abs(avgN - 5500.0 / 51) < 1e-3)
    assert(ratio > 40)
  }

  test("q_key_skew runs on the lineitem table") {
    val r = Skew.qKeySkew(spark, sf).head()
    assert(r.getLong(0) > 0)
    assert(r.getDouble(4) >= 1.0)
  }
}
