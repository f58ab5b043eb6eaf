package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.FeedConfig.ColumnSpec

/** PII masking fork (modules/auto_loader_steps.py:345-364): every
  * IsPII=1 column in the shadow copy is overwritten with the constant
  * mask. One select, no per-column withColumn chain (each withColumn is
  * a new projection node — fold them into one). */
object Masking {
  val MaskValue = "xxxxxxx"

  def maskPII(df: DataFrame, columns: Seq[ColumnSpec]): DataFrame = {
    val piiNames = columns.filter(_.IsPII == 1).map(_.TargetColumnName).toSet
    if (piiNames.isEmpty) df
    else df.select(df.columns.map { c =>
      if (piiNames.contains(c)) lit(MaskValue).cast(org.apache.spark.sql.types.StringType).as(c)
      else col(c)
    }.toSeq: _*)
  }
}
