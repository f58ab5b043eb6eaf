package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scalar-only output contract for every registry entry.
  *
  * The driver's correctness gate canonicalizes each entry's result with
  * pandas `sort_values` before hashing; ARRAY/MAP/STRUCT cells are
  * unhashable there, so an entry emitting one reports `err` with every
  * match field null — it silently leaves the gate (round-9
  * `q_token_ids`/`q_train_sequences`). This spec makes that class of
  * red a build failure: the detector must flag complex columns, and the
  * whole registry must be free of them.
  */
class SchemaGateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("nonScalarColumns flags top-level array, map and struct columns") {
    val df = spark.range(3)
      .select(col("id"),
        array(lit(1), lit(2)).as("arr"),
        map(lit("k"), lit(1)).as("m"),
        struct(lit(1).as("a")).as("st"))
    val flagged = graft.queries.Registry.nonScalarColumns(df.schema)
    assert(flagged.size == 3, flagged)
    assert(flagged.exists(_.startsWith("arr:")), flagged)
    assert(flagged.exists(_.startsWith("m:")), flagged)
    assert(flagged.exists(_.startsWith("st:")), flagged)
  }

  test("nonScalarColumns passes scalar-only schemas") {
    val df = spark.range(3).select(col("id"), lit("x").as("s"),
      lit(1.5).as("d"), current_timestamp().as("ts"))
    assert(graft.queries.Registry.nonScalarColumns(df.schema).isEmpty)
  }

  test("every registry entry's output schema is scalar-only") {
    // Building the DataFrame is lazy for most entries (analysis only);
    // the eager ones (streaming lifecycles, merges) run their sf0.001
    // fixtures — the price of a structural guarantee the driver's gate
    // depends on.
    val bad = graft.queries.Registry.all.flatMap { case (name, q) =>
      val complex = graft.queries.Registry
        .nonScalarColumns(q.fn(Tables.configure(spark), sf).schema)
      if (complex.isEmpty) Nil else Seq(s"$name -> ${complex.mkString(", ")}")
    }
    assert(bad.isEmpty, s"entries with non-scalar output columns:\n${bad.mkString("\n")}")
  }
}
