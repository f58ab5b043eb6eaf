package graft

import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // Optional extra args: restrict to the named queries (dev loop).
    val only = args.drop(2).toSet
    val spark = Tables.session("graft-verify")
    new java.io.File(outDir).mkdirs()
    var failed = 0
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter(q => only.contains(q._1))
    selected.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // Scalar-only output contract: the driver's pandas canonicalizer
        // cannot hash ARRAY/MAP/STRUCT cells — such an entry silently
        // falls out of the correctness gate (round-9 q_token_ids). Fail
        // it HERE, loudly, instead of letting the checker err downstream.
        val complex = graft.queries.Registry.nonScalarColumns(df.schema)
        require(complex.isEmpty,
          s"non-scalar output columns (driver checker cannot hash them; " +
            s"array_join to strings): ${complex.mkString(", ")}")
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        failed += 1
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
    System.err.println(
      s"[verify] ${selected.size - failed}/${selected.size} queries dumped")
    spark.stop()
  }
}
