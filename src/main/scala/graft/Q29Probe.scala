package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object Q29Probe {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.builder("local[8]")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
    val sess = Tables.eventsWithMs(s, "/root/testdata/sf0.1")
      .select($"user_id", $"event_id", $"ms", $"event_type")
      .withColumn("prev_ms", lag($"ms", 1).over(byUser))
      .withColumn("new_session",
        when($"prev_ms".isNull || $"ms" - $"prev_ms" > operators.Sessionize.SessionGapMs, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum($"new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    val perSession = sess.groupBy($"user_id", $"session_id")
      .agg(array_sort(collect_list(struct($"ms", $"event_id", $"event_type"))).as("es"))
    val types = transform($"es", _.getField("event_type"))
    val stage = aggregate(types, lit(0), (acc, t) =>
      when(acc === 0 && t === "view", 1)
        .when(acc === 1 && t === "click", 2)
        .when(acc === 2 && t === "purchase", 3)
        .otherwise(acc))
    perSession.select($"user_id", $"session_id",
        array_join(types, ",").as("types"), stage.as("stage"))
      .write.mode("overwrite").parquet("/tmp/q29_spark_sessions")
  }
}
