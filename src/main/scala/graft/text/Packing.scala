package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Greedy sequence packing — the training-prep step that concatenates
  * documents into fixed-token-budget bins (one bin ≈ one training
  * sequence), maximizing fill while preserving document order.
  *
  * Packing is inherently a sequential scan (each decision depends on
  * the running bin fill), which cannot be a window/prefix-sum because
  * the accumulator RESETS at every bin boundary. The scalable
  * formulation shards the corpus by id range and packs each shard
  * independently:
  *
  *   - only (id, shard, weight) ever shuffles — never the text; the
  *     caller joins bins back to payloads by id afterwards,
  *   - each shard is streamed in id order through
  *     `flatMapSortedGroups` (secondary sort in the shuffle), so the
  *     greedy scan holds O(1) state — no shard materializes in memory,
  *   - shards pack in parallel across the cluster; the only
  *     approximation versus a single global scan is potential slack in
  *     the last bin of each shard (bounded by `budget` tokens per
  *     `shardSize` docs).
  *
  * Deterministic: bins are a pure function of (ids, weights, budget,
  * shardSize), independent of partitioning — which is what lets DuckDB
  * recompute the whole assignment with a recursive CTE in the oracle.
  *
  * A document heavier than `budget` gets a bin of its own (callers
  * wanting truncation or splitting handle it upstream).
  */
object Packing {

  // public: Dataset encoders generate deserializer code that must be
  // able to construct these from outside the defining scope
  case class DocW(id: Long, shard: Long, w: Long)
  case class Packed(doc_id: Long, shard: Long, bin: Int, n_tokens: Long)

  /** Pack rows of `df` into greedy contiguous bins of at most `budget`
    * total weight, sharded by `floor(id / shardSize)`. Returns
    * (doc_id, shard, bin, n_tokens) with `bin` numbered from 0 within
    * each shard. */
  def packGreedy(df: DataFrame, idCol: String, weight: Column,
                 budget: Long, shardSize: Long): DataFrame = {
    require(budget > 0 && shardSize > 0, "budget and shardSize must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    // integral `div`, not double division: a long→double cast loses
    // precision past 2^53, which would put snowflake-scale ids in the
    // wrong shard (and diverge from an oracle's integer `//`). Ids are
    // assumed non-negative (truncating and flooring division agree).
    val ds = df.select(col(idCol).cast("long").as("id"), weight.cast("long").as("w"))
      .select(col("id"), expr(s"id div ${shardSize}L").as("shard"), col("w"))
      .as[DocW]
    ds.groupByKey(_.shard)
      .flatMapSortedGroups(col("id")) { (shard, docs) =>
        var bin = 0
        var acc = -1L // sentinel: first doc opens bin 0
        docs.map { d =>
          if (acc < 0L) acc = d.w
          else if (acc + d.w <= budget) acc += d.w
          else { bin += 1; acc = d.w }
          Packed(d.id, shard, bin, d.w)
        }
      }
      .toDF()
  }
}
