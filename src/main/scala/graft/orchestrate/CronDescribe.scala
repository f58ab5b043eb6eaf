package graft.orchestrate

import org.apache.spark.sql.SparkSession

/** Quartz-cron → human-readable description — the reference's single
  * UDF (modules/validate_configurations.py:75 wraps the cron_descriptor
  * library). Re-implemented as a plain deterministic Scala function for
  * the common Quartz shapes the configs use ("0 0 3 * * ?" etc.), and
  * optionally registered as a Spark UDF for SQL parity. */
object CronDescribe {

  private def numName(field: String, unit: String): String =
    if (field == "*" || field == "?") s"every $unit" else s"$unit $field"

  /** Best-effort description of a 6/7-field Quartz cron expression. */
  def describe(cron: String): String = {
    val parts = cron.trim.split("\\s+")
    if (parts.length < 6) return s"invalid cron: $cron"
    val Array(sec, min, hour, dom, mon, dow) = parts.take(6)
    val time =
      if (sec.matches("\\d+") && min.matches("\\d+") && hour.matches("\\d+"))
        f"at ${hour.toInt}%02d:${min.toInt}%02d:${sec.toInt}%02d"
      else if (min.matches("\\d+") && hour.matches("\\d+"))
        f"at ${hour.toInt}%02d:${min.toInt}%02d"
      else if (hour.contains("/"))
        s"every ${hour.split('/')(1)} hours"
      else if (min.contains("/"))
        s"every ${min.split('/')(1)} minutes"
      else "every second"
    val day =
      if (dow != "?" && dow != "*") s" on ${numName(dow, "weekday")}"
      else if (dom != "?" && dom != "*") s" on day $dom of the month"
      else ", every day"
    val month = if (mon != "*" && mon != "?") s" in month $mon" else ""
    s"$time$day$month"
  }

  /** Register as a SQL-callable UDF (the only UDF in the engine —
    * driver-side config description, never in a data-plane hot path). */
  def register(spark: SparkSession, name: String = "cron_describe"): Unit =
    spark.udf.register(name, (c: String) => describe(c))
}
