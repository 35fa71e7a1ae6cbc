package graft.tools

import graft.GraftSession

/** Dev probe (r12, VERDICT r11 #4): storage-memory footprint of the
  * ivfIndex memo leaves after a build. With "pin" as second arg, the
  * corpus embedding table is re-persisted + counted after the build —
  * reproducing the r11 behavior where `emb` stayed pinned for the
  * session alongside `members` (which embeds the embeddings again) —
  * so the before/after delta is measured in ONE binary.
  * Usage: runMain graft.tools.ProbeIvfMem [sfDir] [pin] */
object ProbeIvfMem {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val pin = args.lift(1).contains("pin")
    val spark = GraftSession.get("probe-ivf-mem", 32)
    graft.operators.Ann.knnIvf(spark, dir).count() // forces the ivfIndex build
    if (pin) {
      val emb = graft.Tables(spark, dir).embeddings
      emb.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      emb.count()
    }
    val infos = spark.sparkContext.getRDDStorageInfo
    infos.sortBy(-_.memSize).foreach { i =>
      println(f"[mem] parts=${i.numCachedPartitions}%3d mem=${i.memSize}%,12d disk=${i.diskSize}%,12d  ${i.name.take(120)}")
    }
    println(f"[mem] TOTAL cached mem=${infos.map(_.memSize).sum}%,d bytes across ${infos.length} RDDs (pin=$pin)")
    spark.stop()
  }
}
