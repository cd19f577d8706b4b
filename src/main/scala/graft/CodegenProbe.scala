package graft

/** Codegen-fallback hunter: runs every SparkEntry query at the given
  * SF (default sf0.001) with WARN logging live, printing each entry
  * name BEFORE execution — any janino "Code grows beyond 64 KB"
  * fallback (WholeStageCodegenExec logs it at WARN and interprets the
  * stage) lands between the `>> name` marker and the next, naming the
  * offender. `runMain graft.CodegenProbe [sfDir] [regex]`.
  */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val pat = args.drop(1).headOption.getOrElse(".*")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.matches(pat))
      .foreach { case (name, fn) =>
        // markers go to stderr so they interleave with log4j's stream
        System.err.println(s">> $name")
        System.err.flush()
        // NonFatal only: an OOM/fatal JVM error means later probe
        // results would come from a corrupted JVM — abort instead.
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s">> $name FAILED: ${e.getMessage}") }
      }
    System.err.println(">> done")
    spark.stop()
  }
}
