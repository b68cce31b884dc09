package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.DotProduct.dotNative

/** Scratch profiling main (not part of the library surface). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n)")
    }
    val embs = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val l = embs.select(col("vec_id").as("ia"), col("embedding").as("va"), (col("label")).as("bk"))
    val r = embs.select(col("vec_id").as("ib"), col("embedding").as("vb"), (col("label")).as("bk"))
    val pairs = l.join(r, "bk").where(col("ia") < col("ib"))
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    time("pairs count")(pairs.count())
    time("HOF dot over pairs") {
      pairs.select(sum(hofDot(col("va"), col("vb")))).collect()(0)
    }
    time("native dot over pairs") {
      pairs.select(sum(dotNative(col("va"), col("vb")))).collect()(0)
    }
    time("equivalence check") {
      pairs.select(sum(abs(hofDot(col("va"), col("vb")) - dotNative(col("va"), col("vb")))))
        .collect()(0)
    }
  }
}
