package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins at 100 TB: when a few hot keys
  * dominate a fact table, a plain hash join puts every hot-key row in
  * one reducer. Salting splits each key into `saltFactor` sub-keys:
  * the fact side gets a deterministic per-row salt, the (smaller) other
  * side is replicated once per salt value, and the join key becomes
  * (key, salt). AQE's skew-join handles many cases at runtime; salting
  * is the explicit tool when a key is hot enough to defeat even split
  * shuffle blocks, and it composes with broadcast being impossible
  * (right side too big).
  */
object Skew {

  /** Equi-join `fact ⋈ other` on `key`, salted `saltFactor` ways.
    * Deterministic: the salt is a hash of the fact row's whole content,
    * so results are reproducible run to run. */
  def saltedJoin(fact: DataFrame, other: DataFrame, key: String,
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    // right/full outer would emit each unmatched replicated-side row
    // saltFactor times — refuse rather than silently duplicate.
    require(Set("inner", "left", "left_outer", "leftouter").contains(joinType),
      s"saltedJoin supports inner/left joins only, got '$joinType'")
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col).toSeq: _*), lit(saltFactor)).cast("int"))
    val replicated = other.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    saltedFact.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase aggregation for skewed group-by keys: partial aggregate
    * on (key, salt), then final aggregate on key. Spark's hash
    * aggregate already does map-side partials; this adds an extra
    * reduce level for when a single key's partials overwhelm one
    * reducer (e.g. count/sum over a 90%-one-key stream). */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
                saltFactor: Int): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(col(key), monotonically_increasing_id()), lit(saltFactor)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"), count(lit(1)).as("__pc"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"),
        sum(col("__pc")).as("n"))
}
