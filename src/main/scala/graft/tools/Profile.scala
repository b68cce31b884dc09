package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiling main (not part of the library surface): times the
  * named catalog queries at sf0.1 in one warm session, N reps each. */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val names = if (args.nonEmpty) args.toSeq else Seq("dd3_minhash_lsh")
    names.foreach { n =>
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val c = graft.SparkEntry.queries(n)(spark, dir).count()
        println(f"[profile] $n%-24s rep$i ${(System.nanoTime() - t0) / 1e9}%6.2f s ($c rows)")
      }
    }
    spark.stop()
  }
}
