package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.events.Basket

/** Market-basket scale bench (BASELINE.md): deterministic synthetic
  * basket logs generated distributed, timed through frequent pairs and
  * association rules.
  *
  * Shapes: a uniform log (baskets × ~items-each over a bounded item
  * catalog — pair mass Σsz² stays ∝ rows), and the DEGENERATE basket
  * adversarial — one basket holding 100k distinct items, which would
  * alone emit 5·10⁹ pairs (C(100k, 2)) if generated; the maxBasket
  * guard drops it before its collect_list materializes, so the run
  * costs the same as the uniform log it rides on. That guard IS the
  * 100 TB argument: pair generation is bounded by the basket-size cap,
  * never by the hottest key. */
object BasketBench {

  def uniform(spark: SparkSession, baskets: Long, perBasket: Long,
      items: Long): DataFrame =
    spark.range(baskets * perBasket).select(
      pmod(hash(col("id"), lit(3)).cast("long"), lit(baskets)).as("basket"),
      pmod(xxhash64(col("id"), lit(7)), lit(items)).as("item"))

  def degenerate(spark: SparkSession, size: Long): DataFrame =
    spark.range(size).select(
      lit(-1L).as("basket"), col("id").as("item"))

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

    val shapes: Seq[(String, DataFrame)] = Seq(
      "uniform 1M baskets x ~5 over 100k items" ->
        uniform(spark, 1000000L, 5L, 100000L),
      "uniform 5M baskets x ~5 over 100k items" ->
        uniform(spark, 5000000L, 5L, 100000L),
      "degenerate: 1M uniform + one 100k-item basket" ->
        uniform(spark, 1000000L, 5L, 100000L)
          .unionByName(degenerate(spark, 100000L)))

    shapes.foreach { case (name, items) =>
      items.count() // warm generation
      val (np, tP) = time {
        Basket.frequentPairs(items, "basket", "item", minCount = 2L)
          .agg(count(lit(1)), max(col("n"))).head
      }
      val (nr, tR) = time {
        Basket.associationRules(items, "basket", "item", minCount = 2L)
          .agg(count(lit(1)), max(col("lift"))).head
      }
      println(f"$name%-48s pairs=${np.getLong(0)}%9d ${tP}%6.2f s  " +
        f"rules=${nr.getLong(0)}%9d ${tR}%6.2f s")
    }
    spark.stop()
  }
}
