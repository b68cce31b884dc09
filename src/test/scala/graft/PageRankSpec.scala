package graft

import org.apache.spark.sql.functions._

import graft.graph.PageRank

/** PageRank goldens: ring symmetry, weighted split, dangling-mass
  * redistribution — against a dense driver-side replication of the
  * same pico-quantized iteration. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def refRanks(
      edges: Seq[(String, String, Double)],
      iters: Int,
      d: Double = 0.85): Map[String, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val outW = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val base = math.round((1.0 - d) / n * 1e12)
    var r = nodes.map(_ -> math.round(1.0 / n * 1e12)).toMap
    for (_ <- 1 to iters) {
      val contrib = edges
        .map { case (s, t, w) => t -> math.round(r(s).toDouble * (w / outW(s))) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val dm = nodes.filterNot(outW.contains).map(r).sum
      r = nodes.map { v =>
        v -> (base + math.round(d *
          (contrib.getOrElse(v, 0L) + math.round(dm.toDouble / n)).toDouble))
      }.toMap
    }
    r.map { case (k, v) => k -> v / 1e12 }
  }

  private def run(
      edges: Seq[(String, String, Double)], iters: Int): Map[String, Double] =
    PageRank.pagerank(edges.toDF("src", "dst", "weight"), iters)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap

  test("symmetric ring: equal ranks, sum ~1") {
    val ring = Seq(("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0))
    val got = run(ring, 3)
    assert(got.values.toSet.size == 1)
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    assert(got == refRanks(ring, 3))
  }

  test("weighted edges split contributions by w/W; matches the dense " +
    "replication exactly") {
    val g = Seq(("a", "b", 3.0), ("a", "c", 1.0), ("b", "a", 1.0),
      ("c", "a", 1.0))
    val got = run(g, 4)
    assert(got == refRanks(g, 4))
    assert(got("b") > got("c")) // 75% of a's vote vs 25%
  }

  test("dangling node redistributes its mass uniformly") {
    val g = Seq(("a", "b", 1.0)) // b has no out-edges
    val got = run(g, 3)
    assert(got == refRanks(g, 3))
    assert(math.abs(got.values.sum - 1.0) < 1e-6) // mass conserved
    intercept[ParameterError] { PageRank.pagerank(
      g.toDF("src", "dst", "weight"), 0) }
    intercept[ParameterError] { PageRank.pagerank(
      g.toDF("src", "dst", "weight"), 3, damping = 1.0) }
  }

  test("triangles: one triangle + pendant; duplicates, reversals, and " +
    "self-loops dropped; clustering goldens (gr2)") {
    // triangle {a,b,c} plus pendant d off c; noise edges collapse
    val e = Seq(
      ("a", "b"), ("b", "a"), ("b", "c"), ("a", "c"), ("c", "d"),
      ("a", "a"))
      .toDF("src", "dst")
    val out = PageRank.triangles(e)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("degree"), r.getAs[Long]("triangles"),
          Option(r.get(r.fieldIndex("clustering")))
            .map(_.asInstanceOf[Double]))).toMap
    assert(out("a") == ((2L, 1L, Some(1.0))))
    assert(out("b") == ((2L, 1L, Some(1.0))))
    // c: degree 3, one triangle among 3 possible pairs → 1/3
    assert(out("c") == ((3L, 1L, Some(0.333333))))
    // pendant: no pairs to close → 0 triangles, undefined coefficient
    assert(out("d") == ((1L, 0L, None)))
  }

  test("triangles: K4 — every node closes all three of its pairs") {
    val nodes = Seq("a", "b", "c", "d")
    val e = (for {
      x <- nodes; y <- nodes if x < y
    } yield (x, y)).toDF("src", "dst")
    val out = PageRank.triangles(e)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("triangles"), r.getAs[Double]("clustering"))).toMap
    // K4 has 4 triangles, each node in 3 of them; C(3,2)=3 pairs all closed
    assert(out.values.forall(_ == ((3L, 1.0))))
  }

  test("personalizedPagerank: mass sums to 1, unreachable nodes score " +
    "0, all-nodes seeding reduces exactly to pagerank") {
    // cycle 1→2→3→1 plus 4→1: nothing ever flows INTO 4 from seed 1
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L))
      .toDF("src", "dst").withColumn("weight", lit(1.0))
    val seeds = Seq(1L).toDF("node")
    val r = PageRank.personalizedPagerank(e, seeds, iterations = 5)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-6)
    assert(r(4L) == 0.0)
    // the seed keeps its teleport mass advantage over the cycle node
    // that feeds it (a 3-cycle has not converged at 5 iterations, so
    // no full ordering is asserted — only the teleport-term gap)
    assert(r(1L) > 0.15) // ≥ the (1−d) base the non-seeds never get
    // uniform seeding over every node IS pagerank (identical picos)
    val all = Seq(1L, 2L, 3L, 4L).toDF("node")
    val ppr = PageRank.personalizedPagerank(e, all, iterations = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val pr = PageRank.pagerank(e, iterations = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(ppr == pr)
    intercept[ParameterError] {
      PageRank.personalizedPagerank(e, Seq(99L).toDF("node"), 3)
    }
  }

  test("adamicAdar: hand-checked score on the diamond graph; adjacent " +
    "pairs excluded; hub apexes drop under the guard") {
    // diamond: 1-2, 1-3, 2-3, 2-4, 3-4 → only (1,4) is non-adjacent,
    // sharing neighbors 2 and 3 (deg 3 each): AA = 2/ln(3)
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val r = PageRank.adamicAdar(e).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) == 1L && row.getLong(1) == 4L)
    assert(row.getAs[Long]("common_neighbors") == 2L)
    assert(math.abs(row.getAs[Double]("aa_score") - 2.0 / math.log(3.0)) < 1e-6)
    // guard: maxApexDegree=2 drops both deg-3 apexes → nothing scored
    assert(PageRank.adamicAdar(e, maxApexDegree = 2).isEmpty)
    // star: every candidate pair goes through the hub; guard drops it
    val star = (1L to 10L).map(i => (0L, i)).toDF("src", "dst")
    assert(PageRank.adamicAdar(star, maxApexDegree = 5).isEmpty)
    // minCommon=3 filters the single 2-neighbor pair
    assert(PageRank.adamicAdar(e, minCommon = 3).isEmpty)
    intercept[ParameterError] { PageRank.adamicAdar(e, minCommon = 0) }
  }

  test("bfsLayers: min-hop distances on a branching graph, multi-seed " +
    "min wins, unreachable nodes absent, early exit releases blocks") {
    //   1 - 2 - 3 - 4      seeds {1, 10}: node 4 is 3 from 1;
    //   10 - 3 (shortcut)  via 10 it's 10-3-4 = 2. Node 99 isolated.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 3L), (98L, 99L))
      .toDF("src", "dst")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val seeds = Seq(1L, 10L).toDF("node")
    val out = PageRank.bfsLayers(edges, seeds, maxHops = 6)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 10L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
    // undirected: seeds reach backward too; 98/99 unreachable → absent
    assert(!out.contains(99L) && !out.contains(98L))
    // maxHops truncation: the 4-chain stops at dist 1
    val short = PageRank.bfsLayers(edges, Seq(1L).toDF("node"), maxHops = 1)
      .as[(Long, Long)].collect().toMap
    assert(short == Map(1L -> 0L, 2L -> 1L))
    // scope: only result blocks outlive the calls
    val leftover = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leftover.size <= 2, s"expected only result blocks, got $leftover")
    spark.sparkContext.getPersistentRDDs
      .filter { case (id, _) => leftover.contains(id) }
      .values.foreach(_.unpersist(true))
  }

  test("labelPropagation: two bridged 4-cliques converge to their " +
    "minima, tiebreak is the smallest label, rounds are synchronous") {
    // cliques {0..3} and {10..13}, one bridge 3-10
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(Seq(0L, 1L, 2L, 3L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) :+ ((3L, 10L)))
      .toDF("src", "dst")
    val out = PageRank.labelPropagation(edges, iterations = 3)
      .as[(Long, Long)].collect().toMap
    // each clique collapses onto its smallest member's label; the
    // bridge's single vote never outweighs the 3 clique votes
    assert(Seq(0L, 1L, 2L, 3L).forall(out(_) == 0L), out.toString)
    assert(Seq(10L, 11L, 12L, 13L).forall(out(_) == 10L), out.toString)
    // synchronous round 1 on a 2-path: both endpoints SWAP labels
    // (each adopts its only neighbor's label simultaneously)
    val swap = PageRank.labelPropagation(
      Seq((5L, 6L)).toDF("src", "dst"), iterations = 1)
      .as[(Long, Long)].collect().toMap
    assert(swap == Map(5L -> 6L, 6L -> 5L))
    intercept[ParameterError] {
      PageRank.labelPropagation(edges, iterations = 0)
    }
  }

  test("louvainRound: min-degree-neighbor adoption with (degree, id) " +
    "tiebreak; every non-isolated node moves (the 2m > k_i*k_min theorem); " +
    "the adopted move has positive exact modularity gain") {
    // path a-b-c: a adopts b (only neighbor); b ties on degree between
    // a and c (both 1) -> smaller id a; c adopts b
    val path = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val got = PageRank.louvainRound(path)
      .as[(String, String)].collect().toMap
    assert(got == Map("a" -> "b", "b" -> "a", "c" -> "b"))
    // star: leaves adopt the hub; the hub adopts its smallest leaf
    val star = Seq(("h", "l1"), ("h", "l2"), ("h", "l3")).toDF("src", "dst")
    val s = PageRank.louvainRound(star).as[(String, String)].collect().toMap
    assert(s == Map("l1" -> "h", "l2" -> "h", "l3" -> "h", "h" -> "l1"))
    // exact-gain check: for every node, Q({i,j} merged) − Q(singletons)
    // = 1/m − k_i·k_j/(2m²) > 0 on the star (m = 3, k_h = 3, k_l = 1)
    val m = 3.0
    assert(1 / m - (3.0 * 1.0) / (2 * m * m) > 0)
    // duplicate/reversed edges collapse first
    val dup = star.unionByName(
      star.select(col("dst").as("src"), col("src").as("dst")))
    assert(PageRank.louvainRound(dup).as[(String, String)].collect().toMap == s)
  }

  test("modularity: two bridged triangles under the perfect partition; " +
    "missing label raises") {
    // triangles {a,b,c} and {d,e,f}, bridge c-d; m = 7
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"),
      ("d", "e"), ("e", "f"), ("d", "f"), ("c", "d")).toDF("src", "dst")
    val labels = Seq("a" -> "L", "b" -> "L", "c" -> "L",
      "d" -> "R", "e" -> "R", "f" -> "R").toDF("node", "community")
    val r = PageRank.modularity(edges, labels)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4)))).toMap
    // e_c = 3, d_c = 7 each side: 3/7 − (7/14)² = 0.178571
    assert(r("L") == ((3L, 3L, 7L, 0.178571)))
    assert(r("R") == ((3L, 3L, 7L, 0.178571)))
    // duplicate + reversed edges collapse to the same simple graph
    val doubled = edges.unionByName(
      edges.select(col("dst").as("src"), col("src").as("dst")))
    val r2 = PageRank.modularity(doubled, labels)
      .collect().map(x => x.getString(0) -> x.getDouble(4)).toMap
    assert(r2 == Map("L" -> 0.178571, "R" -> 0.178571))
    // an unlabeled endpoint raises instead of silently deflating d_c
    val ex = intercept[Exception] {
      PageRank.modularity(edges, labels.where(col("node") =!= "f")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(ex).exists(_.contains("without a community label")),
      ex.toString)
  }
}
