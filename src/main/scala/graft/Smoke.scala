package graft

/** Dev-only smoke: print schema + count of every testdata table. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = Tables.session("smoke")
    Tables.all.foreach { t =>
      try {
        val df = Tables.load(spark, sfDir, t)
        println(s"TABLE $t rows=${df.count()} schema=${df.schema.simpleString}")
      } catch { case e: Throwable => println(s"TABLE $t FAILED: ${e.getMessage.take(300)}") }
    }
    spark.stop()
  }
}
