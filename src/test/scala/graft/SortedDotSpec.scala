package graft

import org.apache.spark.sql.functions._

class SortedDotSpec extends GraftSpecBase {

  test("sorted_dot equals a local two-pointer reference on random sorted sparse vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def vec(): Seq[(Long, Long)] =
      (0 until rnd.nextInt(30)).map(_ => rnd.nextInt(40).toLong)
        .distinct.sorted.map(k => k -> (rnd.nextInt(2000001) - 1000000).toLong)
    val rows = (0 until 200).map { _ =>
      val a = vec(); val b = vec()
      (a.map(_._1), a.map(_._2), b.map(_._1), b.map(_._2))
    }
    val got = rows.toDF("ka", "va", "kb", "vb")
      .select(call_function("sorted_dot", $"ka", $"va", $"kb", $"vb"))
      .as[Long].collect()
    val expect = rows.map { case (ka, va, kb, vb) =>
      val bm = kb.zip(vb).toMap
      ka.zip(va).collect { case (k, v) if bm.contains(k) => v * bm(k) }.sum
    }
    assert(got.toSeq == expect)
  }

  test("sorted_dot: disjoint → 0, empty side → 0, null side → null") {
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 3L), Seq(10L, 20L), Seq(2L, 4L), Seq(5L, 6L)), // disjoint
      (Seq.empty[Long], Seq.empty[Long], Seq(1L), Seq(9L))     // empty
    ).toDF("ka", "va", "kb", "vb")
    val out = df.select(
      call_function("sorted_dot", $"ka", $"va", $"kb", $"vb")).as[Long].collect()
    assert(out.toSeq == Seq(0L, 0L))
    val nul = df.select(call_function("sorted_dot",
      lit(null).cast("array<long>"), $"va", $"kb", $"vb")).collect()
    assert(nul.forall(_.isNullAt(0)))
  }

  test("sorted_dot raises on non-parallel key/value arrays") {
    import spark.implicits._
    val df = Seq((Seq(1L, 2L), Seq(10L), Seq(1L), Seq(5L)))
      .toDF("ka", "va", "kb", "vb")
    val e = intercept[Exception] {
      df.select(call_function("sorted_dot", $"ka", $"va", $"kb", $"vb")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("parallel arrays")), e.toString)
  }
}
