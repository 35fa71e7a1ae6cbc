package graft.tools
import org.apache.spark.sql.SparkSession
object ProfileScc {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val n = graft.graph.Scc.labels(spark, "/root/testdata/sf0.1").count()
    System.err.println(s"[scc] TOTAL rows=$n t=${(System.nanoTime()-t0)/1e9}s")
    spark.stop()
  }
}
