package graft.queries

/** Lifecycle owner for the PER-JVM memoized bench stage directories
  * (the build-once/serve-many index dirs behind the `benchFn` serve
  * paths: IVF, IVF-PQ, BM25, hybrid, bitext). Memoization is what lets
  * min-of-attempts time the SERVE, but the dirs used to outlive the
  * JVM — a bench sweep over many sf dirs accumulated orphan stage
  * copies under java.io.tmpdir. Every memoized build now routes its
  * temp dir through [[tempDir]], and one JVM shutdown hook reclaims
  * whatever was registered. Deletion failures are swallowed: the hook
  * runs at exit, where throwing would mask the process's real status. */
object BenchStage {

  private val registered =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()

  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    registered.forEach { d =>
      try graft.ingest.FileOps.deleteRecursively(
        java.nio.file.Paths.get(d))
      catch { case _: Throwable => () }
    }, "graft-bench-stage-janitor"))

  /** Create a temp directory registered for deletion at JVM exit. */
  def tempDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toString
    registered.add(d)
    d
  }
}
