package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions._

/** Deterministic DataFrame-native k-means over the embeddings table.
  *
  * MLlib's KMeans (used for the IVF coarse quantizer) is seeded but
  * its k-means|| init is still implementation-defined; this is the
  * reproducible companion: Lloyd's algorithm with a FIXED init (the K
  * lowest vec_ids), so every run — and every independent
  * reimplementation — lands on bit-identical assignments. That is
  * what makes it spec-checkable against a local brute force, the same
  * discipline as q53's fixed-point PageRank.
  *
  * Shape at 100 TB: each iteration is one scan + one map-side-combined
  * grouped aggregate. Assignment is a codegen fold over a K-entry
  * centroid literal using `argmin_c (c·c − 2 v·c)` — the row's own
  * ‖v‖² is rank-invariant and dropped, centroid norms are precomputed
  * constants, and the inner product runs through the codegen
  * `array_dot`. Centroid recomputation pivots to (cid, dim) grain via
  * posexplode — a dim× row blow-up that partial aggregation collapses
  * to K·dim rows per partition before the one shuffle. The only
  * driver-side state is the K×dim centroid matrix (an artifact, like
  * d5's pivots), refreshed `Iters` times.
  */
object Clustering {

  val K = 8
  val Iters = 4

  /** Squared-distance rank key: ‖c‖² − 2·v·c (row norm dropped). */
  private def rankKey(v: Column, c2: Column, c: Column): Column =
    c2 - lit(2.0) * dot(v, c)

  private def centroidLit(centers: Array[Array[Double]]): Column =
    array(centers.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("cid"),
        lit(c.map(x => x * x).sum).as("c2"),
        array(c.map(lit): _*).as("c"))
    }: _*)

  /** Assign every vector its nearest centroid id under `centers`. */
  private def assign(emb: DataFrame, centers: Array[Array[Double]]): DataFrame = {
    import emb.sparkSession.implicits._
    val cl = centroidLit(centers)
    emb.withColumn("best",
      aggregate(cl,
        struct(lit(Double.MaxValue).as("d"), lit(-1).as("cid")),
        (acc, x) => {
          val d = rankKey($"v", x("c2"), x("c"))
          when(d < acc("d"), struct(d.as("d"), x("cid").as("cid")))
            .otherwise(acc)
        }))
      .withColumn("cluster", $"best.cid").drop("best")
  }

  /** M9: k-means cluster assignment (vec_id, cluster, dist) after
    * `Iters` Lloyd iterations from the deterministic init. */
  def m9Kmeans(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
      .select($"vec_id", toDoubles($"embedding").as("v"))
    var centers: Array[Array[Double]] = emb.orderBy($"vec_id").limit(K)
      .select($"v").as[Seq[Double]].collect().map(_.toArray)
    for (_ <- 1 to Iters) {
      // new centroid = mean vector per cluster, at (cid, dim) grain
      val parts = assign(emb, centers)
        .select($"cluster", posexplode($"v").as(Seq("pos", "x")))
        .groupBy($"cluster", $"pos")
        .agg(sum($"x").as("sx"), count(lit(1)).as("n"))
        .collect()
      val byCid = parts.groupBy(_.getAs[Int]("cluster"))
      centers = centers.indices.map { cid =>
        byCid.get(cid) match {
          case Some(rows) => // empty clusters keep their old centroid
            rows.sortBy(_.getAs[Int]("pos"))
              .map(r => r.getAs[Double]("sx") / r.getAs[Long]("n")).toArray
          case None => centers(cid)
        }
      }.toArray
    }
    val cl = centroidLit(centers)
    assign(emb, centers)
      .withColumn("c", element_at(cl, $"cluster" + 1))
      .select($"vec_id", $"cluster",
        q4(sqrt(greatest(dot($"v", $"v") + rankKey($"v", $"c"("c2"), $"c"("c")),
          lit(0.0)))).as("dist"))
      .orderBy($"vec_id")
  }
}
