package graft.queries

import org.apache.spark.sql.DataFrame
import java.nio.file.{Files, Path}

/** Temp-dir parquet staging for the streaming oracle entries: each
  * logical micro-batch is one mtime stamp (FileStreamSource orders
  * files by modification time), written `parts` files wide so the
  * batch's map stage parallelizes — a coalesce(1) batch funneled the
  * whole corpus gram pass through ONE task (the r9 bench hog), and a
  * real deployment's batch is always many files wide anyway.
  *
  * Callers must reclaim the fixture with
  * [[graft.ingest.FileOps.deleteRecursively]] once the stream result is
  * materialized (memory sink / localCheckpoint): repeated bench
  * attempts otherwise accumulate corpus copies under java.io.tmpdir. */
object StreamFixtures {

  /** Write `df` as `parts` files `name_0..name_{parts-1}` in `src`, all
    * stamped `mtimeMs`. `tmp` hosts the write staging dir. */
  def writeBatch(tmp: Path, src: Path, df: DataFrame, name: String,
                 parts: Int, mtimeMs: Long): Unit = {
    val stage = tmp.resolve(s"stage_$name")
    df.repartition(parts).write.parquet(stage.toString)
    val partFiles = Files.list(stage).toArray
      .map(_.asInstanceOf[Path])
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .sortBy(_.getFileName.toString)
    partFiles.zipWithIndex.foreach { case (p, i) =>
      val dst = src.resolve(s"${name}_$i.parquet")
      Files.move(p, dst)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
    }
  }
}
