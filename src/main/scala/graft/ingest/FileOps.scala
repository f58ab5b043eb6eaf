package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** File plumbing the reference does through dbutils.fs
  * (auto_loader_steps.py:312-315 move-to-error;
  * Data Ingestion Helper.py:334-374 availability poll), via the Hadoop
  * FileSystem API so it works on any supported storage. */
object FileOps {

  /** dbutils.fs.mv equivalent: move an offending source file into the
    * error directory (keeps the original file name). */
  def moveToError(spark: SparkSession, sourceFile: String, errorDir: String): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new Path(sourceFile)
    val fs = src.getFileSystem(conf)
    if (!fs.exists(src)) return false
    val dstDir = new Path(errorDir)
    if (!fs.exists(dstDir)) fs.mkdirs(dstDir)
    fs.rename(src, new Path(dstDir, src.getName))
  }

  /** Recursively delete a local temp fixture tree (best-effort: a
    * missing or already-removed entry is not an error). Entries that
    * stage corpus-sized files under java.io.tmpdir must reclaim them
    * before returning, or repeated bench attempts accumulate corpus
    * copies on the driver disk. */
  def deleteRecursively(root: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.exists(root)) {
      val w = Files.walk(root)
      try w.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => try Files.deleteIfExists(p) catch { case _: Exception => () })
      finally w.close()
    }
  }

  /** Directory listing with the underlying stream CLOSED — a bare
    * `Files.list(dir)` holds an open directory descriptor until GC
    * finalization, and a long-lived verify/bench JVM sweeping the
    * registry leaks one per fixture write until it hits the fd ulimit.
    * Every local listing in the library routes through here. */
  def listDir(dir: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val s = java.nio.file.Files.list(dir)
    try {
      val out = Seq.newBuilder[java.nio.file.Path]
      s.forEach(p => out += p)
      out.result()
    } finally s.close()
  }

  /** Poll until the source dir contains at least one file, or timeout. */
  def awaitFiles(spark: SparkSession, dir: String,
                 timeoutMs: Long = 30000, pollMs: Long = 250): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (System.nanoTime() < deadline) {
      if (fs.exists(p) && fs.listStatus(p).exists(_.isFile)) return true
      Thread.sleep(pollMs)
    }
    false
  }
}
