package graft

import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.{HeavyHittersAgg, TopKAgg}

/** Property tests for the partially-aggregable sketch aggregates — the
  * no-session layer of [[TopKAgg]] and [[HeavyHittersAgg]], driven
  * through the REAL update/merge/serialize paths via bound references.
  * Spark merges partials in arbitrary order and shapes, so the
  * properties quantify over random SPLITS of random streams, not just
  * permutations: any split must serialize, travel, merge and land on
  * the same answer (top-k) or a guarantee-respecting superset (MG).
  */
object AggProps extends Properties("graft.aggbuffers") {

  // ---- TopK -----------------------------------------------------------

  private val topk = TopKAgg(
    BoundReference(0, LongType, nullable = false),
    BoundReference(1, LongType, nullable = false), 5)

  private def tkDrive(items: Seq[(Long, Long)]): TopKAgg.Buffer =
    items.foldLeft(topk.createAggregationBuffer()) { (b, sp) =>
      topk.update(b, new GenericInternalRow(
        Array[Any](sp._1, sp._2)))
    }

  private def contents(b: TopKAgg.Buffer): Seq[(Long, Long)] =
    (0 until b.size).map(i => (b.scores(i), b.payloads(i)))

  private val streamGen: Gen[List[Long]] =
    Gen.listOf(Gen.choose(-50L, 50L))

  property("topk: random split + serde round-trip equals single-pass truth") =
    Prop.forAll(streamGen, Gen.choose(0, 400)) { (scores, cut0) =>
      // payloads are unique ids, so the expected set is exact
      val items = scores.zipWithIndex.map { case (s, i) => (s, i.toLong) }
      val cut = if (items.isEmpty) 0 else cut0 % (items.size + 1)
      val (l, r) = items.splitAt(cut)
      val merged = topk.merge(
        topk.deserialize(topk.serialize(tkDrive(l))),
        topk.deserialize(topk.serialize(tkDrive(r))))
      contents(merged) == items.sortBy { case (s, p) => (-s, p) }.take(5)
    }

  property("topk: buffer never exceeds k and stays sorted") =
    Prop.forAll(streamGen) { scores =>
      val b = tkDrive(scores.zipWithIndex.map { case (s, i) => (s, i.toLong) })
      val c = contents(b)
      b.size <= 5 && c == c.sortBy { case (s, p) => (-s, p) }
    }

  // ---- Misra-Gries ----------------------------------------------------

  private val hh = HeavyHittersAgg(
    BoundReference(0, StringType, nullable = true), 8)

  private def hhDrive(items: Seq[String]) =
    items.foldLeft(hh.createAggregationBuffer()) { (b, s) =>
      hh.update(b, new GenericInternalRow(
        Array[Any](UTF8String.fromString(s))))
    }

  private val skewed: Gen[List[String]] = for {
    n <- Gen.choose(50, 400)
    items <- Gen.listOfN(n, Gen.frequency(
      4 -> Gen.const("hot"),
      2 -> Gen.const("warm"),
      4 -> Gen.choose(0, 200).map(i => s"t$i")))
  } yield items

  property("mg: every item above n/(cap+1) survives any split + serde") =
    Prop.forAll(skewed, Gen.choose(0, 400)) { (items, cut0) =>
      val cut = if (items.isEmpty) 0 else cut0 % (items.size + 1)
      val (l, r) = items.splitAt(cut)
      val merged = hh.merge(
        hh.deserialize(hh.serialize(hhDrive(l))),
        hh.deserialize(hh.serialize(hhDrive(r))))
      val counts = items.groupBy(identity).view.mapValues(_.size.toLong)
      val bar = items.size / 9.0 // n/(cap+1), cap = 8
      val surviving = merged.keySet.map(_.toString)
      counts.forall { case (item, c) =>
        c <= bar || surviving.contains(item)
      } && merged.size <= 8
    }

  property("mg: surviving counts are lower bounds within n/(cap+1)") =
    Prop.forAll(skewed) { items =>
      val b = hhDrive(items)
      val counts = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val slack = items.size / 9.0
      b.forall { case (item, c) =>
        val truth = counts.getOrElse(item.toString, 0L)
        c <= truth && truth - c <= slack + 1
      }
    }
}
