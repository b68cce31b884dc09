package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.alloc.Weights
import graft.panel.Panel
import graft.panel.Panel.Keys

/** Property-based invariants over random panels — the algebraic
  * guarantees golden tests can't sweep: allocation caps, neutrality,
  * turnover sign, soft-dedup mass conservation. Small generated panels
  * (Spark jobs per case are not free), fixed seeds via ScalaCheck's
  * deterministic default parameters.
  */
class PropertySpec extends SparkSpec {

  private def check(p: Prop, minSuccessful: Int = 12): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful), p)
    assert(res.passed, res.status.toString)
  }

  import spark.implicits._

  private implicit val k: Keys = Panel.eod

  private val panelGen: Gen[Seq[(String, String, Int)]] = for {
    nSids <- Gen.choose(2, 6)
    nDates <- Gen.choose(2, 5)
    signals <- Gen.listOfN(nSids * nDates, Gen.oneOf(-1, 0, 1))
  } yield for {
    s <- 0 until nSids; d <- 0 until nDates
  } yield (s"S$s", f"2024-01-${d + 1}%02d", signals(s * nDates + d))

  private def df(rows: Seq[(String, String, Int)]) =
    rows.toDF("sid", "date", "signal")

  test("equalWeights: per-date gross never exceeds the cap and every " +
    "weight carries its signal's sign (D1 invariant)") {
    check(Prop.forAll(panelGen) { rows =>
      val out = df(rows)
        .select($"sid", $"date", $"signal",
          Weights.equalWeights($"signal", cap = 1.0).as("w"))
        .collect()
      val gross = out.groupBy(_.getString(1))
        .map { case (_, rs) => rs.map(r => math.abs(r.getDouble(3))).sum }
      val signsOk = out.forall { r =>
        val (sig, w) = (r.getInt(2), r.getDouble(3))
        (sig == 0 && w == 0.0) || math.signum(w) == math.signum(sig.toDouble)
      }
      (gross.forall(_ <= 1.0 + 1e-9) :| "gross <= cap") &&
        (signsOk :| "sign preserved")
    })
  }

  test("neutralizeWeights: after scaling, per-date long mass equals " +
    "short mass whenever both sides exist (D5 invariant)") {
    check(Prop.forAll(panelGen) { rows =>
      val out = df(rows)
        .select($"date", $"signal",
          Weights.neutralizeWeights($"signal".cast("double")).as("w"))
        .collect()
      out.groupBy(_.getString(0)).forall { case (_, rs) =>
        val longs = rs.map(_.getDouble(2)).filter(_ > 0).sum
        val shorts = rs.map(_.getDouble(2)).filter(_ < 0).map(-_).sum
        if (longs > 0 && shorts > 0) math.abs(longs - shorts) < 1e-9
        else true // a one-sided date keeps its lighter-side zero
      }
    })
  }

  test("turnover = |diff positions| is non-negative and zero on a " +
    "constant book (D6 invariant)") {
    check(Prop.forAll(panelGen) { rows =>
      val pos = df(rows).withColumn("position", $"signal".cast("double"))
      val t = pos.select($"sid",
        abs(Panel.diffBySid($"position")).as("turnover")).collect()
      t.forall(r => r.isNullAt(1) || r.getDouble(1) >= 0.0)
    })
  }

  test("softDedupWeights: total sampled mass equals the number of " +
    "distinct survivors (dd23 invariant)") {
    val clusterGen = for {
      n <- Gen.choose(1, 20)
      labels <- Gen.listOfN(n, Gen.choose(1L, 5L))
    } yield labels.zipWithIndex.map { case (c, i) => (i.toLong, c) }
    check(Prop.forAll(clusterGen) { members =>
      val docs = members.map(_._1).map(Tuple1(_)).toDF("doc_id")
      val clusters = members.toDF("id", "cluster")
      val w = graft.dedup.Dedup.softDedupWeights(docs, clusters)
        .collect().map(_.getAs[Double]("weight")).sum
      val expected = members.map(_._2).distinct.size
      math.abs(w - expected) < 1e-4 // 6dp rounding per member
    })
  }

  test("modularity: contributions sum to ~0 under the everything-in-one-" +
    "community partition minus the null term, intra edges never exceed m") {
    val edgeGen = for {
      n <- Gen.choose(3, 8)
      m <- Gen.choose(2, 12)
      pairs <- Gen.listOfN(m,
        Gen.zip(Gen.choose(0, n - 1), Gen.choose(0, n - 1)))
    } yield pairs.filter { case (a, b) => a != b }
      .map { case (a, b) => (s"n$a", s"n$b") }
    check(Prop.forAll(edgeGen) { pairs =>
      pairs.nonEmpty ==> {
        val edges = pairs.toDF("src", "dst")
        val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
        // one community: e_c = m, d_c = 2m → Q = 1 − 1 = 0 exactly
        val one = nodes.map(_ -> "C").toDF("node", "community")
        val q1 = graft.graph.PageRank.modularity(edges, one)
          .collect().map(r =>
            (r.getLong(2), r.getLong(3), r.getDouble(4))).head
        val mEdges = pairs.map { case (a, b) =>
          if (a < b) (a, b) else (b, a) }.distinct.size
        // singleton communities: e_c = 0 for all c unless self-pair
        val solo = nodes.map(n => n -> n).toDF("node", "community")
        val qs = graft.graph.PageRank.modularity(edges, solo).collect()
        q1._1 == mEdges && q1._2 == 2L * mEdges && q1._3 == 0.0 &&
          qs.forall(_.getLong(2) <= mEdges) &&
          qs.map(_.getLong(3)).sum == 2L * mEdges
      }
    }, minSuccessful = 8)
  }

  test("exactQuantiles: monotone in q, q=1 is the max, every value is " +
    "an element of the group (order statistics, never interpolation)") {
    val gen = for {
      n <- Gen.choose(1, 40)
      vs <- Gen.listOfN(n, Gen.choose(-1000L, 1000L))
    } yield vs
    check(Prop.forAll(gen) { vs =>
      val df = vs.map(("g", _)).toDF("g", "v")
      val r = graft.panel.Quantiles.exactQuantiles(
        df, Seq("g"), col("v"), qs = Seq(0.25, 0.5, 0.75, 1.0))
        .collect().map(x => x.getDouble(1) -> x.getLong(3)).toMap
      val sorted = vs.sorted
      r(1.0) == sorted.last &&
        r(0.25) <= r(0.5) && r(0.5) <= r(0.75) && r(0.75) <= r(1.0) &&
        r.values.forall(vs.contains)
    }, minSuccessful = 8)
  }

  test("kmv overlapEstimates: union >= intersection >= 0, and a pair of " +
    "identical key sets estimates intersection = union exactly") {
    val gen = for {
      na <- Gen.choose(5, 60)
      nb <- Gen.choose(5, 60)
      shared <- Gen.choose(0, 5)
    } yield (na, nb, shared)
    check(Prop.forAll(gen) { case (na, nb, shared) =>
      val a = (0 until na).map(i => ("A", s"a$i")) ++
        (0 until shared).map(i => ("A", s"s$i"))
      val b = (0 until nb).map(i => ("B", s"b$i")) ++
        (0 until shared).map(i => ("B", s"s$i"))
      val sk = graft.sketch.Kmv.sketch(
        (a ++ b).toDF("g", "key"), "key", Seq("g"), k = 32)
      val r = graft.sketch.Kmv.overlapEstimates(sk, "g", k = 32)
        .collect().map(x => (x.getDouble(3), x.getDouble(4))).head
      r._1 >= r._2 && r._2 >= 0.0
    }, minSuccessful = 8)
    // identical sets: every union-bottom-k hash is in both sketches
    val same = (0 until 200).flatMap(i => Seq(("X", s"k$i"), ("Y", s"k$i")))
    val sk = graft.sketch.Kmv.sketch(
      same.toDF("g", "key"), "key", Seq("g"), k = 32)
    val r = graft.sketch.Kmv.overlapEstimates(sk, "g", k = 32)
      .collect().map(x => (x.getDouble(3), x.getDouble(4))).head
    assert(r._1 == r._2)
  }

  test("curriculumOrder: curriculum positions are a permutation of 1..n " +
    "and respect the (pos_in_band, band) lexicographic order") {
    val gen = for {
      n <- Gen.choose(1, 20)
      scores <- Gen.listOfN(n, Gen.choose(0, 1000000))
    } yield scores.zipWithIndex.map { case (s, i) =>
      (i.toLong, s / 1000000.0) }
    check(Prop.forAll(gen) { rows =>
      val out = graft.text.Sampling.curriculumOrder(
        rows.toDF("doc_id", "score"), "doc_id", col("score"), bands = 5)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val positions = out.map(_._4).sorted.toSeq
      val sortedByKey = out.sortBy(t => (t._3, t._2)).map(_._4).toSeq
      positions == (1L to rows.size.toLong) &&
        sortedByKey == (1L to rows.size.toLong)
    }, minSuccessful = 8)
  }
}
