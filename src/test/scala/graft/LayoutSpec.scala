package graft

import org.apache.spark.sql.functions._

import graft.sources.Layout

/** Z-order layout: Morton bit math, zone-map locality, and the writer's
  * per-file bounding boxes (the pruning property a layout rewrite buys). */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue interleaves bits (x even positions, y odd)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("x", "y")
    val got = df.select(Layout.zvalue($"x", $"y").as("z"))
      .collect().map(_.getLong(0)).toSeq
    def ref(x: Long, y: Long): Long =
      (0 until 16).map(b => (((x >> b) & 1) << (2 * b)) | (((y >> b) & 1) << (2 * b + 1))).sum
    assert(got === Seq(ref(0, 0), ref(1, 0), ref(0, 1), ref(3, 5), ref(65535, 65535)))
    assert(got(1) == 1L && got(2) == 2L && got(4) == 0xFFFFFFFFL)
  }

  test("zoneMap cells are axis-aligned boxes covering ~1/2^prefixBits of each range") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val cells = Layout.zoneMap(li,
      col("l_suppkey"),
      datediff(to_date(col("l_shipdate")), lit("1992-01-01")).cast("long"),
      prefixBits = 2).collect()
    assert(cells.nonEmpty && cells.map(_.getAs[Long]("n_rows")).sum == li.count())
    val gx = cells.map(_.getAs[Long]("max_x")).max - cells.map(_.getAs[Long]("min_x")).min
    val gy = cells.map(_.getAs[Long]("max_y")).max - cells.map(_.getAs[Long]("min_y")).min
    // 2 prefix bits split each dimension into 4 slabs: every cell's box
    // spans at most ~1/4 of each global range (+1 for integer rounding)
    cells.foreach { c =>
      assert(c.getAs[Long]("max_x") - c.getAs[Long]("min_x") <= gx / 4 + 1)
      assert(c.getAs[Long]("max_y") - c.getAs[Long]("min_y") <= gy / 4 + 1)
    }
  }

  test("zorderWrite: every written file has a compact box in BOTH dimensions") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select($"l_suppkey", to_date($"l_shipdate").as("d"))
    val dir = java.nio.file.Files.createTempDirectory("zorder_spec").toString
    Layout.zorderWrite(li, $"l_suppkey",
      datediff($"d", lit("1992-01-01")).cast("long"), dir, numFiles = 16)
    val withFile = spark.read.parquet(dir)
      .select($"l_suppkey", datediff($"d", lit("1992-01-01")).cast("long").as("y"),
        input_file_name().as("f"))
    val boxes = withFile.groupBy("f").agg(
      (max($"l_suppkey") - min($"l_suppkey")).as("xspan"),
      (max($"y") - min($"y")).as("yspan")).collect()
    assert(boxes.length > 4)
    val gx = li.agg(max($"l_suppkey") - min($"l_suppkey")).head.getLong(0)
    val gy = withFile.agg(max($"y") - min($"y")).head.getLong(0)
    // a single-dimension sort leaves the OTHER dim at full span per
    // file; z-order must keep the MEDIAN file well under half of BOTH
    def median(xs: Seq[Long]): Long = xs.sorted.apply(xs.size / 2)
    assert(median(boxes.map(_.getAs[Long]("xspan")).toSeq) <= gx / 2)
    assert(median(boxes.map(_.getAs[Long]("yspan")).toSeq) <= gy / 2)
  }

  test("compactionPlan conserves bytes and packs to ~target") {
    val files = Seq(("f1", 300L), ("f2", 250L), ("f3", 200L), ("f4", 150L),
      ("f5", 100L), ("f6", 50L), ("f7", 25L)).toDF("f", "bytes")
    val bins = Layout.compactionPlan(files, "f", "bytes", targetBytes = 400L).collect()
    assert(bins.map(_.getAs[Long]("bytes")).sum == 1075L)
    assert(bins.map(_.getAs[Long]("n_files")).sum == 7L)
    // size-desc cumulative packing: cum 300,550,750,900,1000,1050,1075 →
    // bins 0:{300}, 1:{250,200}, 2:{150,100,50,25}
    val byBin = bins.map(r => r.getAs[Long]("bin_id") -> r).toMap
    assert(byBin(0L).getAs[Long]("bytes") == 300L)
    assert(byBin(1L).getAs[Long]("bytes") == 450L)
    assert(byBin(2L).getAs[Long]("bytes") == 325L)
    assert(math.abs(byBin(1L).getAs[Double]("fill_ratio") - 1.125) < 1e-12)
  }
}
