package graft

import org.apache.spark.sql.types.{StringType, StructField}
import org.scalacheck.{Gen, Prop, Properties}
import graft.ingest.SchemaTools
import graft.model.FeedConfig.ColumnSpec
import graft.orchestrate.CronDescribe

/** Property tests for the pure (no-session) model layer. */
object ModelProps extends Properties("graft.model") {

  private val cronField = Gen.oneOf("*", "?", "0", "3", "15", "0/15", "1/5", "2")
  private val cronGen = Gen.listOfN(6, cronField).map(_.mkString(" "))

  property("cron describe is total and non-empty") = Prop.forAll(cronGen) { c =>
    CronDescribe.describe(c).nonEmpty
  }

  property("cron describe flags too-short expressions") =
    Prop.forAll(Gen.listOfN(3, cronField).map(_.mkString(" "))) { c =>
      CronDescribe.describe(c).startsWith("invalid cron")
    }

  private val colsGen: Gen[Seq[ColumnSpec]] =
    Gen.choose(1, 8).flatMap { n =>
      Gen.sequence[Seq[ColumnSpec], ColumnSpec]((1 to n).map { i =>
        Gen.identifier.map(name => ColumnSpec(s"c$i$name".take(12), s"t$i", "string", i))
      })
    }

  private val extrasGen: Gen[Seq[StructField]] =
    Gen.choose(0, 5).flatMap(n =>
      Gen.sequence[Seq[StructField], StructField]((1 to n).map(i =>
        Gen.const(StructField(s"x$i", StringType)))))

  property("evolve appends extras after the max order, as strings") =
    Prop.forAll(colsGen, extrasGen) { (cols, extras) =>
      val evolved = SchemaTools.evolve(cols, extras)
      val maxBefore = cols.map(_.ColumnOrder).max
      val appended = evolved.drop(cols.size)
      evolved.take(cols.size) == cols &&
        appended.size == extras.size &&
        appended.forall(_.TargetDataType == "string") &&
        appended.map(_.ColumnOrder) == (maxBefore + 1 to maxBefore + extras.size)
    }

  property("evolve is idempotent on already-known columns") =
    Prop.forAll(colsGen) { cols =>
      val known = cols.map(c => StructField(c.SourceColumnName, StringType))
      SchemaTools.evolve(cols, Nil) == cols &&
        SchemaTools.declaredSchema(cols).fieldNames.toSeq ==
          cols.sortBy(_.ColumnOrder).map(_.SourceColumnName) &&
        known.nonEmpty
    }
}
