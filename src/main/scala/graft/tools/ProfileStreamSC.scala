package graft.tools

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Dev-only phase profiler for q_stream_containment: times each stage
  * of the entry in isolation so bench regressions can be attributed to
  * fixture IO, the streaming lifecycle, or the batch verify. */
object ProfileStreamSC {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = graft.Tables.session("profile-stream-sc")
    graft.Tables.load(s, dir, "nation").count() // warm-up
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { attempt =>
      println(s"== attempt $attempt ==")
      val tmp = Files.createTempDirectory("graft-prof-sc")
      val src = Files.createDirectories(tmp.resolve("src"))
      val docs = graft.Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      val pad = array_join(
        transform(sequence(lit(1), lit(1499)),
          i => concat(lit("pady"), i.cast("string"))), " ")
      def buried(d: org.apache.spark.sql.DataFrame) =
        d.filter(col("doc_id") < 10).select(
          (col("doc_id") + 500000).as("doc_id"),
          concat(col("text"), lit(" "), pad).as("text"))
      def writeBatch(df: org.apache.spark.sql.DataFrame, name: String,
                     parts: Int, mtimeMs: Long): Unit = {
        val stage = tmp.resolve(s"stage_$name")
        df.repartition(parts).write.parquet(stage.toString)
        val partFiles = graft.ingest.FileOps.listDir(stage)
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .sortBy(_.getFileName.toString)
        partFiles.zipWithIndex.foreach { case (p, i) =>
          val dst = src.resolve(s"${name}_$i.parquet")
          Files.move(p, dst)
          Files.setLastModifiedTime(dst,
            java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
        }
      }
      timed("write corpus")(writeBatch(docs, "a", 8, 1000000000000L))
      timed("write buried")(writeBatch(buried(docs), "b", 1, 1000000060000L))
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val raw = ss.readStream
        .schema(ss.read.parquet(src.toString).schema)
        .option("maxFilesPerTrigger", "8")
        .parquet(src.toString)
      val name = s"prof_sc_${tmp.getFileName.toString.replaceAll("[^A-Za-z0-9]", "")}"
      timed("stream lifecycle") {
        val q = graft.streaming.StreamSeedGram
          .seedPairStream(raw, "doc_id", "text", w = 3, seedMod = 8,
            maxDf = 1000,
            gramFn = Some(graft.text.Dedup.portableGramHashes(_, 3)))(ss)
          .writeStream.format("memory").queryName(name)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      val cands = timed("candidate agg") {
        ss.table(name)
          .groupBy(col("id_a"), col("id_b"))
          .agg(count(lit(1)).as("shared"))
          .filter(col("shared") >= 2)
          .select(col("id_a"), col("id_b"))
          .transform(graft.plans.Materialize.stage)
      }
      graft.ingest.FileOps.deleteRecursively(tmp)
      timed("batch verify") {
        val docsB = graft.Tables.load(ss, dir, "documents")
          .select(col("doc_id"), col("text"))
        val allB = docsB.unionByName(buried(docsB))
        graft.text.Dedup.verifyPairsContainment(allB, "doc_id", "text",
            cands, threshold = 0.9, w = 3,
            gramFn = Some(graft.text.Dedup.portableGramHashes(_, 3)))
          .orderBy(col("id_a"), col("id_b"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    s.stop()
  }
}
