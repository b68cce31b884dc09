package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Scratch profiling main (not part of the library surface). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n)")
    }
    time("warmup count")(docs.count())
    time("shingleRows count")(Dedup.shingleRows(docs).count())
    time("bands")(Dedup.withMinhashBands(docs).count())
    time("candidates")(Dedup.minhashCandidates(docs).count())
    time("nearDuplicates")(Dedup.nearDuplicates(docs, threshold = 0.5).count())
    time("simhashDf")(Dedup.simhashDf(docs).count())
    spark.stop()
  }
}
