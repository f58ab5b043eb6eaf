package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXCLUSIVE prefix sum — the two-pass pattern a global
  * ordered offset needs at scale, where a single unpartitioned window
  * (`Window.orderBy(...)` with no partition) would funnel the whole
  * relation through one task:
  *
  *  1. range-partition by the order column and take ONE per-partition
  *     total each (a partitions-sized collect, like a centroid fetch);
  *  2. cumulate those totals on the driver into per-partition BASE
  *     offsets and broadcast them back;
  *  3. each partition adds its base to a LOCAL running sum (a window
  *     partitioned by the physical partition — parallel by
  *     construction).
  *
  * The result is deterministic regardless of where the range
  * boundaries fall: every row's offset is the sum of weights of all
  * strictly-smaller order keys, whatever partition they landed in —
  * which is why the range partitioner's sampling doesn't need to be
  * reproducible, only ORDER-preserving. The order column must be
  * unique (offsets of tied keys would depend on their arbitrary
  * relative order).
  *
  * This is the building block for global data layout jobs: training-
  * sequence construction (`q_train_sequences`), global shard
  * assignment, ordered file stitching. */
object PrefixSum {

  /** Adds `offset` = Σ weight over all rows with a strictly smaller
    * `orderCol`. One shuffle (the range partitioning), one bounded
    * driver collect, no global single-task window. */
  def exclusiveOffsets(df: DataFrame, orderCol: String, weightCol: String,
                       partitions: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // The partitioned relation is consumed TWICE — the totals pass
    // below and the caller's plan — and the range partitioner's
    // boundaries come from SAMPLING an input whose intra-partition
    // order (post hash-shuffle) is not execution-stable: re-executing
    // the lineage could land rows in different partitions than the
    // ones the bases were computed from, silently corrupting offsets.
    // The eager localCheckpoint pins ONE materialized partitioning
    // that both passes read. (Cluster-scale note: lineage-free blocks
    // pin to executors — a reliable checkpoint dir is the cluster
    // idiom, as documented on the components family.)
    val parted = df.repartitionByRange(partitions, col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .transform(graft.plans.Materialize.stage)
    // A range partition can be empty; missing pids simply contribute 0.
    // The totals are read defensively: sum() over an all-NULL weight
    // partition is NULL (coalesce to 0), and a non-integral weight
    // column (DOUBLE, DECIMAL) is cast to long HERE rather than
    // ClassCastException-ing in getLong — the offset contract is
    // integral, so a fractional weight column is rejected loudly.
    val wType = parted.schema(weightCol).dataType
    require(Seq(org.apache.spark.sql.types.LongType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.ByteType).contains(wType),
      s"exclusiveOffsets needs an integral weight column; " +
        s"'$weightCol' is ${wType.simpleString}")
    val totals = parted.groupBy(col("__pid"))
      .agg(coalesce(sum(col(weightCol)), lit(0L)).cast("long").as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val bases = totals.map { case (pid, t) =>
      val b = acc; acc += t; (pid, b)
    }
    val baseDf = broadcast(bases.toSeq.toDF("__pid", "__base"))
    val w = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    parted.join(baseDf, Seq("__pid"))
      .withColumn("offset",
        col("__base") + coalesce(sum(col(weightCol)).over(w), lit(0L)))
      .drop("__pid", "__base")
  }
}
