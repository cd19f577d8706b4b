package graft

import org.apache.spark.sql.functions._

/** Round-14 hardening: the Louvain coarse-level LOCAL ENDGAME must be
  * bit-identical to the distributed schedule it replays, the m15
  * registry surface is the long-form the driver can hash, and the
  * memo ledger survives a throwing build. */
class Round14Spec extends GraftSpecBase {
  import spark.implicits._

  private def symmetric(pairs: Seq[(Long, Long)]) = {
    val df = pairs.toDF("pa", "pb")
    df.select($"pa".as("src"), $"pb".as("dst"))
      .unionAll(df.select($"pb".as("src"), $"pa".as("dst")))
  }

  private def graphs: Seq[(String, Seq[(Long, Long)])] = {
    val rnd = new scala.util.Random(41)
    val random = (for (_ <- 1 to 150) yield {
      val a = rnd.nextInt(50).toLong; val b = rnd.nextInt(50).toLong
      if (a < b) Some((a, b)) else if (b < a) Some((b, a)) else None
    }).flatten.distinct
    val prs = operators.Analytics.copurchasePairs(spark, sf)
      .filter($"n_orders" >= 2).select($"pa", $"pb")
      .as[(Long, Long)].collect().toSeq
    Seq(
      "bridged triangles" -> Seq((1L, 2L), (2L, 3L), (1L, 3L),
        (11L, 12L), (12L, 13L), (11L, 13L), (3L, 11L)),
      "seeded random" -> random,
      "sf0.001 co-purchase" -> prs)
  }

  // ------------- Louvain local endgame (round 14) -------------

  test("local coloring replay == distributed trialColoring on constructed + real graphs") {
    for ((name, pairs) <- graphs) {
      val edges = symmetric(pairs).cache()
      val want = operators.Graph.trialColoring(
        edges, operators.Graph.SemiColoringRounds)._1
        .as[(Long, Int)].collect().toMap
      val got = operators.LouvainLocal.coloring(
        edges.as[(Long, Long)].collect())
      assert(got == want, s"$name: local coloring diverged")
      edges.unpersist()
    }
  }

  test("local weighted moves == distributed louvainMovesW on the q102 construction") {
    for ((name, pairs) <- graphs) {
      val edges = symmetric(pairs).cache()
      val colored = operators.Graph.trialColoring(
        edges, operators.Graph.SemiColoringRounds)._1
      val l1 = operators.Graph.louvainMoves(edges,
        colored.select($"node", $"color", $"node".as("lbl")))
      val le = edges
        .join(l1.select($"node".as("src"), $"lbl".as("la")), "src")
        .join(l1.select($"node".as("dst"), $"lbl".as("lb")), "dst")
        .groupBy($"la", $"lb").agg(count(lit(1)).as("w")).cache()
      val cross = le.filter($"la" =!= $"lb")
        .select($"la".as("src"), $"lb".as("dst"), $"w")
      val strength = le.groupBy($"la".as("node")).agg(sum($"w").as("s"))
      val m2w = edges.count()
      val ce = cross.as[(Long, Long, Long)].collect()
      val col2d = operators.Graph.trialColoring(
        cross.select($"src", $"dst"), operators.Graph.SemiColoringRounds)._1
      val want = operators.Graph.louvainMovesW(cross, strength, m2w,
        col2d.select($"node", $"color", $"node".as("lbl")),
        operators.Graph.LouvainP2Rounds, freshTot = true)
        .as[(Long, Long)].collect().toMap
      val col2l = operators.LouvainLocal.coloring(ce.map(t => (t._1, t._2)))
      val got = operators.LouvainLocal.movesW(ce,
        strength.as[(Long, Long)].collect().toMap, m2w, col2l,
        operators.Graph.LouvainP2Rounds)
      assert(got == want, s"$name: local weighted moves diverged")
      le.unpersist(); edges.unpersist()
    }
  }

  test("q102 registry: local endgame result == forced-distributed result at sf0.001") {
    val local = operators.Graph.q102LouvainCoarse(spark, sf)
      .as[(Long, Long, Long)].collect().sorted
    sys.props("graft.louvainLocalMaxEdges") = "0"
    try {
      val dist = operators.Graph.q102LouvainCoarse(spark, sf)
        .as[(Long, Long, Long)].collect().sorted
      assert(local.sameElements(dist),
        "q102 local endgame diverged from the distributed path")
    } finally sys.props.remove("graft.louvainLocalMaxEdges")
  }

  // ------------- m15 long-form registry surface -------------

  test("m15 registry surface: long-form (vec_id, dim, value) == posexploded wide API") {
    val long = ml.Pca.m15PcaLong(spark, sf)
    assert(long.columns.toSeq == Seq("vec_id", "dim", "value"),
      s"long-form columns: ${long.columns.mkString(",")}")
    // every column scalar — the property the driver's canonicalizer
    // needs (r13's ERR was an array<double> column)
    assert(long.schema.fields.forall(f =>
      !f.dataType.typeName.startsWith("array")))
    val wide = ml.Pca.m15Pca(spark, sf)
      .select($"vec_id", posexplode($"pc"))
      .select($"vec_id", $"pos".cast("int").as("dim"), $"col".as("value"))
      .as[(Long, Int, Double)].collect().sorted
    val got = long.as[(Long, Int, Double)].collect().sorted
    assert(got.sameElements(wide))
    val n = Tables.embeddings(spark, sf).count()
    assert(got.length == n * ml.Pca.TopK)
  }

  // ------------- Caches.memo exception safety -------------

  test("memo: a throwing build leaves no orphaned timing frame behind") {
    Caches.drainBuildLog()
    intercept[RuntimeException] {
      Caches.memo("r14_boom", "x")(
        throw new RuntimeException("boom"))()
    }
    // a later successful build on the same thread must log its own
    // wall time normally (the leaked-frame failure mode would feed it
    // into the orphan instead)
    Caches.memo("r14_ok", "x")(Seq(1L).toDF("v"))()
    val logged = Caches.drainBuildLog()
    assert(logged.map(_._1) == Seq("r14_ok"), s"ledger: $logged")
    Caches.clear()
  }
}
