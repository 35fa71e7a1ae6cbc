package graft.tools

import graft.GraftSession

/** Dev probe: byte-resize cost after the native stride expression. */
object ProfileByte {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("profile-byte", 32)
    for (_ <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("m_byte_resize")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[prof] m_byte_resize: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
