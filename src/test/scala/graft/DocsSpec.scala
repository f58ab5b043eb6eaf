package graft

import org.scalatest.funsuite.AnyFunSuite

/** Documentation gates: COVERAGE.md is the judge-facing operator map,
  * so every registered query entry must appear in it — an entry added
  * without documentation fails the build, not the review. */
class DocsSpec extends AnyFunSuite {

  test("every registry entry is documented in COVERAGE.md") {
    val coverage = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("COVERAGE.md")))
    val missing = graft.queries.Registry.all.map(_._1)
      .filterNot(coverage.contains)
    assert(missing.isEmpty, s"COVERAGE.md is missing: ${missing.mkString(", ")}")
  }

  test("every pruned entry names a TIMED family gate") {
    // the bench-prune contract: an entry removed from the timed suite
    // must say which timed entry covers its cost family — and that
    // representative must itself still be timed (a gate naming another
    // pruned entry covers nothing). Checked against the source text
    // the way COVERAGE rows are.
    import scala.jdk.CollectionConverters._
    val timed = graft.queries.Registry.benchNames.toSet
    val pruned = graft.queries.Registry.all.map(_._1).filterNot(timed).toSet
    val entryPat = "\"(q_[a-z0-9_]+)\" -> Q\\(".r
    val gatePat = "timed (?:family )?gate: ([a-zA-Z0-9_]+)".r
    val root = java.nio.file.Paths.get("src/main/scala/graft/queries")
    val blocks = scala.collection.mutable.Map[String, String]()
    val walk = java.nio.file.Files.walk(root)
    try walk.iterator().asScala
      .filter(_.toString.endsWith(".scala")).foreach { p =>
        val src = new String(java.nio.file.Files.readAllBytes(p))
        val ms = entryPat.findAllMatchIn(src).toSeq
        ms.zipWithIndex.foreach { case (m, i) =>
          val end = if (i + 1 < ms.size) ms(i + 1).start else src.length
          // a duplicate entry name in a second file would silently
          // OVERWRITE the first block and the later one would absorb
          // the gate check — Registry already rejects duplicates at
          // build time, but this check must not depend on walk order
          assert(blocks.put(m.group(1), src.substring(m.start, end)).isEmpty,
            s"duplicate source block for entry ${m.group(1)} (in $p)")
        }
      }
    finally walk.close()
    // gate comments are read from COMMENT LINES only: a 'timed family
    // gate:' phrase inside an oracle SQL string or a prompt would
    // otherwise satisfy the check without documenting anything
    def commentText(block: String): String =
      block.linesIterator.map(_.trim).filter(_.startsWith("//"))
        .mkString("\n")
    val problems = pruned.toSeq.sorted.flatMap { n =>
      blocks.get(n) match {
        case None => Some(s"$n: source block not found")
        case Some(b) => gatePat.findFirstMatchIn(commentText(b)) match {
          case None => Some(s"$n: no 'timed family gate:' comment")
          case Some(g) if !timed(g.group(1)) =>
            Some(s"$n: gate ${g.group(1)} is itself pruned/unknown")
          case _ => None
        }
      }
    }
    assert(problems.isEmpty, s"\n${problems.mkString("\n")}")
  }

  test("no direct localCheckpoint outside Materialize.stage") {
    // Every stage pin must route through graft.plans.Materialize so the
    // reliable-checkpoint cluster idiom (graft.checkpoint.reliable +
    // a checkpoint dir) is a single config flip — a bare
    // localCheckpoint call silently opts its operator out.
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala")
    val walk = java.nio.file.Files.walk(root)
    val offenders =
      try walk.iterator().asScala
        .filter(p => p.toString.endsWith(".scala") &&
          !p.toString.endsWith("plans/Materialize.scala"))
        .flatMap { p =>
          new String(java.nio.file.Files.readAllBytes(p)).linesIterator
            .zipWithIndex
            .filter { case (l, _) =>
              l.contains("localCheckpoint(") &&
                !l.trim.startsWith("//") && !l.trim.startsWith("*") }
            .map { case (_, i) => s"$p:${i + 1}" }
        }.toSeq
      finally walk.close()
    assert(offenders.isEmpty,
      s"bare localCheckpoint outside Materialize:\n${offenders.mkString("\n")}")
  }

  test("every oracle belongs to a registered query") {
    val names = graft.queries.Registry.all.map(_._1).toSet
    val orphaned = graft.queries.Registry.oracleSql.keys.filterNot(names)
    assert(orphaned.isEmpty, s"oracles without queries: ${orphaned.mkString(", ")}")
  }
}
