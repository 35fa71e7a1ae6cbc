package graft.tools

import graft.GraftSession

object ProbeIvfPq3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("probe-ivfpq3", 32)
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    t("ivf(shared coarse)")(graft.operators.Ann.knnIvf(spark, dir).write
      .format("noop").mode("overwrite").save())
    t("e_knn_ivfpq#1")(graft.operators.Ann.knnIvfPq(spark, dir).write
      .format("noop").mode("overwrite").save())
    t("e_knn_ivfpq#2")(graft.operators.Ann.knnIvfPq(spark, dir).write
      .format("noop").mode("overwrite").save())
    t("e_ivfpq_recall")(graft.operators.Ann.ivfpqRecall(spark, dir).write
      .format("noop").mode("overwrite").save())
  }
}
