package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.PageRank

/** Triangle-counting scale bench (BASELINE.md): deterministic synthetic
  * edge lists generated distributed (spark.range — no driver
  * materialization), timed through [[PageRank.triangles]].
  *
  * Two shapes per size: a pseudo-random multigraph (Knuth-hash
  * endpoints — dense enough that wedges close), and the adversarial
  * STAR (every edge shares one hub). The star is the degree-ordered
  * orientation's whole point: naive wedge generation at the hub is
  * O(n²) pairs in ONE task; oriented, every leaf points INTO the hub
  * (leaves order below it), each leaf's out-degree is 1, so zero
  * wedges form and the job completes in the scan time. */
object GraphBench {

  /** m pseudo-random edges over n nodes. Murmur-hashed endpoints, NOT
    * an affine map of the id: two affine endpoint formulas make every
    * edge collinear (dst ≡ a·src + b mod n) and the "random" graph has
    * zero triangles — the synthetic-corpus near-collinearity trap from
    * the round-4 semdedup bench, in graph form. Self-loops land and
    * are dropped by the operator (part of the contract under test). */
  def randomEdges(spark: SparkSession, m: Long, n: Long): DataFrame =
    spark.range(m).select(
      pmod(hash(col("id"), lit(1)).cast("long"), lit(n)).as("src"),
      pmod(hash(col("id"), lit(2)).cast("long"), lit(n)).as("dst"))

  /** The adversarial star: n leaves all attached to hub 0. */
  def starEdges(spark: SparkSession, n: Long): DataFrame =
    spark.range(1, n + 1).select(lit(0L).as("src"), col("id").as("dst"))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val shapes: Seq[(String, DataFrame)] =
      if (args.isEmpty) Seq(
        "random m=1M n=100k" -> randomEdges(spark, 1000000L, 100000L),
        "random m=10M n=1M" -> randomEdges(spark, 10000000L, 1000000L),
        "star n=1M" -> starEdges(spark, 1000000L))
      else args.toSeq.map { a =>
        val p = a.split(":").map(_.toLong)
        s"random m=${p(0)} n=${p(1)}" -> randomEdges(spark, p(0), p(1))
      }

    shapes.foreach { case (name, e) =>
      e.count() // warm the generation path
      val (row, sec) = time {
        PageRank.triangles(e)
          .agg(count(lit(1)), sum(col("triangles")), max(col("triangles")))
          .head
      }
      // each triangle is counted at its 3 corners → total/3 triangles
      println(f"$name%-22s nodes=${row.getLong(0)}%9d " +
        f"triangles=${Option(row.get(1)).map(_.toString).getOrElse("0")}%12s/3 " +
        f"maxPerNode=${Option(row.get(2)).map(_.toString).getOrElse("0")}%10s " +
        f"${sec}%7.1f s")
    }

    // iterative family: damped power iteration (5 rounds — the
    // per-round cost is what scales, so a fixed small count reads as
    // s/round) and 3-core peeling (rounds = peeling depth). Both ride
    // the r9 shape: the dangling-node set is hoisted out of the loop
    // and round state checkpoints keep AQE. The star is the peeling
    // adversary: every leaf dies in round 1, the bare hub in round 2 —
    // depth stays 2 at any n, so wall time must stay ~flat vs the 1M
    // random graph, not grow with the hub degree.
    val iterShapes = Seq(
      ("pagerank m=1M n=100k", randomEdges(spark, 1000000L, 100000L),
        "pr"),
      ("pagerank m=10M n=1M", randomEdges(spark, 10000000L, 1000000L),
        "pr"),
      ("kcore3 m=1M n=100k", randomEdges(spark, 1000000L, 100000L),
        "kcore"),
      ("kcore3 star n=1M", starEdges(spark, 1000000L), "kcore"))
    iterShapes.foreach { case (name, e0, kind) =>
      val e = e0.withColumn("weight", lit(1L))
      e.count()
      val (row, sec) = time {
        kind match {
          case "pr" =>
            PageRank.pagerank(e, iterations = 5)
              .agg(count(lit(1)), round(sum(col("rank")), 3)).head
          case _ =>
            PageRank.kCore(e, k = 3)
              .agg(count(lit(1)), coalesce(max(col("core_degree")), lit(0L)))
              .head
        }
      }
      println(f"$name%-22s rows=${row.getLong(0)}%9d " +
        f"agg=${Option(row.get(1)).map(_.toString).getOrElse("0")}%12s " +
        f"${sec}%7.1f s")
    }

    // community family (r9 session-3): 3 LPA rounds, one Louvain
    // singleton round, and modularity of the LPA labels — each a
    // node-key-shuffle pipeline whose cost must scale with edge mass,
    // never with any per-community or per-degree pair frame. The star
    // is again the adversary: the hub's million-degree neighborhood
    // must ride the same grouped aggregations.
    val commShapes = Seq(
      ("labelprop3 m=1M n=100k", randomEdges(spark, 1000000L, 100000L)),
      ("labelprop3 m=10M n=1M", randomEdges(spark, 10000000L, 1000000L)),
      ("louvain1 m=10M n=1M", randomEdges(spark, 10000000L, 1000000L)),
      ("louvain1 star n=1M", starEdges(spark, 1000000L)),
      ("modularity m=10M n=1M", randomEdges(spark, 10000000L, 1000000L)))
    commShapes.foreach { case (name, e) =>
      e.count()
      val (row, sec) = time {
        if (name.startsWith("labelprop")) {
          PageRank.labelPropagation(e, iterations = 3)
            .agg(count(lit(1)), count_distinct(col("community"))).head
        } else if (name.startsWith("louvain")) {
          PageRank.louvainRound(e)
            .agg(count(lit(1)), count_distinct(col("community"))).head
        } else {
          PageRank.modularity(e, PageRank.labelPropagation(e, iterations = 3))
            .agg(count(lit(1)),
              round(sum(col("q_contrib")), 3).cast("string")).head
        }
      }
      println(f"$name%-22s rows=${row.getLong(0)}%9d " +
        f"agg=${Option(row.get(1)).map(_.toString).getOrElse("0")}%12s " +
        f"${sec}%7.1f s")
    }
    spark.stop()
  }
}
