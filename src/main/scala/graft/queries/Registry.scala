package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query: the Spark implementation plus (when the semantics are
  * ANSI-SQL-expressible) an equivalent DuckDB SQL oracle over the same
  * parquet tables. Queries without an oracle get the driver's weaker
  * rows-only check and are covered by ScalaTest specs instead.
  *
  * @param bench include in the Bench headline suite (skip entries whose
  *              cost is dominated by fixture file IO rather than the
  *              operator under test)
  * @param benchFn production-plan variant the Bench suite times INSTEAD
  *                of `fn`, for entries whose correctness form carries
  *                verification-only work (e.g. exact twins beside
  *                sketches to pin an accuracy contract) that the 100 TB
  *                production plan never pays. Correctness always runs
  *                `fn`; the variant must be the same operator minus the
  *                oracle scaffolding, asserted so by a spec.
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    bench: Boolean = true,
    benchFn: Option[(SparkSession, String) => DataFrame] = None)

object Registry {
  /** Names of top-level columns the driver's correctness gate cannot
    * canonicalize: its DuckDB-compare harness sorts result cells with
    * pandas, which throws on unhashable ARRAY/MAP/STRUCT values — the
    * entry then reports `err` with every match field null and is
    * INVISIBLE to the gate (round-9 `q_token_ids`/`q_train_sequences`).
    * Entries must emit such columns joined to scalars (the
    * `q_array_funcs` `array_join` precedent). Enforced at Verify time
    * and by SchemaGateSpec so the class of red cannot recur. */
  def nonScalarColumns(schema: org.apache.spark.sql.types.StructType): Seq[String] =
    schema.fields.collect {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] ||
        f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType] ||
        f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType] =>
        s"${f.name}: ${f.dataType.simpleString}"
    }.toSeq

  lazy val all: Seq[(String, Q)] = {
    val xs = Core.defs ++ AnalyticsQueries.defs ++ CatalogQueries.defs ++
      ReportQueries.defs ++ TextQueries.defs ++ CorpusQueries.defs ++
      VectorQueries.defs ++ PipelineQueries.defs ++ AnnotationQueries.defs ++
      ExtractionQueries.defs
    // the .toMap below would silently shadow a duplicated name — make
    // a collision a build-time failure instead of a vanished entry
    val dups = xs.groupBy(_._1).collect { case (n, vs) if vs.size > 1 => n }
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    xs
  }

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (n, q) =>
      n -> { (s: SparkSession, dir: String) =>
        q.fn(graft.Tables.configure(s), dir)
      }
    }.toMap

  lazy val oracleSql: Map[String, String] =
    all.collect { case (n, Q(_, Some(o), _, _)) => n -> o }.toMap

  lazy val benchNames: Seq[String] =
    all.collect { case (n, q) if q.bench => n }

  /** What Bench times per name: the production-plan variant when one
    * exists, the correctness fn otherwise. */
  lazy val benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (n, q) =>
      n -> { (s: SparkSession, dir: String) =>
        q.benchFn.getOrElse(q.fn)(graft.Tables.configure(s), dir)
      }
    }.toMap
}
