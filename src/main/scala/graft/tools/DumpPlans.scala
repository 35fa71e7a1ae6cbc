package graft.tools

import graft.{GraftSession, SparkEntry}

/** r11 plan-evidence dumper: write `.explain("formatted")` of named
  * SparkEntry queries to <outDir>/<query>_<suffix>.txt.
  * Usage: runMain graft.tools.DumpPlans <sfDir> <outDir> <suffix> <q1,q2,...> */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val spark = GraftSession.get("dump-plans", 32)
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      // queryExecution.explainString is what explain("formatted") prints
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plans] wrote $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
