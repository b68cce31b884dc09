package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .withColumn("is_return", col("l_returnflag") === "R")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $name%-30s ${(System.nanoTime()-t0)/1e9}%.2f s ($n)")
    }
    for (_ <- 1 to 2) {
      t("full woeIv")(graft.ml.Woe.woeIv(li, "is_return", "l_extendedprice",
        Seq("l_orderkey", "l_linenumber"), 10).count())
      // pieces
      val rows = li.select(
        when(col("is_return"), 1L).otherwise(0L).as("__bad"),
        round(col("l_extendedprice") * 100).cast("long").as("__v"),
        col("l_orderkey"), col("l_linenumber"))
      t("hist prefix")(graft.panel.PrefixSum.inclusive(
        rows.groupBy("__v").agg(count(lit(1)).as("__c")),
        "__v", Seq("__cum" -> "__c")).count())
      val hist = graft.panel.PrefixSum.inclusive(
        rows.groupBy("__v").agg(count(lit(1)).as("__c")),
        "__v", Seq("__cum" -> "__c"))
        .withColumn("__lo", col("__cum") - col("__c")).select("__v", "__lo")
      t("join only")(rows.join(hist, Seq("__v")).count())
      import org.apache.spark.sql.expressions.Window
      val wTie = Window.partitionBy("__v").orderBy(col("l_orderkey"), col("l_linenumber"), col("__bad"))
      t("join+tie window")(rows.join(hist, Seq("__v"))
        .withColumn("__rank", col("__lo") + row_number().over(wTie)).count())
    }
    spark.stop()
  }
}
