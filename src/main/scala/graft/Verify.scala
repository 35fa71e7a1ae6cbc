package graft

import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg (dev only; the driver passes two): comma-list
    // of query names to dump — a targeted re-check instead of all
    val only = args.lift(2).map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // shared session factory (AQE/Kryo/UTC) — one config path for
    // library, bench and the correctness dump
    val spark = GraftSession.get("graft-verify", cpus)
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          // deterministic dump order lives HERE, not in the operators —
          // a global orderBy inside an operator is a full-corpus sort at
          // scale, while this one touches the (small) result set only.
          // Queries that already END in a global Sort keep their own
          // order (it was authored to match the oracle SQL's ORDER BY);
          // only sort-free results get the all-column fallback sort.
          // Maps aren't orderable; every other type is.
          val out =
            if (Verify.endsInGlobalSort(df)) df
            else {
              val sortable = df.schema.fields
                .filterNot(_.dataType
                  .isInstanceOf[org.apache.spark.sql.types.MapType])
                .map(f => org.apache.spark.sql.functions.col(f.name))
              if (sortable.nonEmpty) df.orderBy(sortable.toSeq: _*) else df
            }
          out.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }

  /** True when the query's analyzed plan is a global Sort (possibly
    * under projections/limits) — i.e. the operator author already chose
    * a deterministic output order. */
  private[graft] def endsInGlobalSort(df: org.apache.spark.sql.DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    @annotation.tailrec
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case Project(_, child) => strip(child)
      case SubqueryAlias(_, child) => strip(child)
      case GlobalLimit(_, child) => strip(child)
      case LocalLimit(_, child) => strip(child)
      case other => other
    }
    strip(df.queryExecution.analyzed) match {
      case s: Sort => s.global
      case _ => false
    }
  }
}
