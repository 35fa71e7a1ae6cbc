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
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
