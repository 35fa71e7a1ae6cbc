package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions enables the SQL functions at session build time") {
    val shared = SparkTestSession.spark // ensure context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // new session over the same SparkContext, extensions applied
      val withExt = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = withExt.sql(
        "SELECT jaccard_sorted(array('a','b'), array('b','c')) AS j").head()
      assert(math.abs(r.getDouble(0) - 1.0 / 3.0) < 1e-9)
      // the round-4 natives ride the same registry
      val k = withExt.sql(
        "SELECT kth_absent(array(0L, 1L, 3L), 1L) AS v").head()
      assert(k.getLong(0) == 4L) // absents: 2, 4, ... -> second is 4
      val bs = withExt.sql(
        "SELECT byte_stride(encode('abcdef', 'UTF-8'), 2) AS s").head()
      assert(bs.getString(0) == "ace")
      val ic = withExt.sql(
        "SELECT sorted_intersect_count(array(1L,2L,3L), array(2L,3L,9L)) AS c")
        .head()
      assert(ic.getLong(0) == 2L)
      val ah = withExt.sql(
        "SELECT avg_hash64(encode(repeat('a', 32) || repeat('z', 32), " +
          "'UTF-8')) AS h").head()
      assert(ah.getString(0) == "0" * 32 + "1" * 32)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
