package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.panel.Panel
import graft.panel.Panel.Keys
import graft.sim.Similarity

/** Coverage for the remaining library toolbox: backward fill, rolling
  * min/max/std, cumulative product, exact-dup projection, media metadata,
  * IVF cell assignment, euclidean distance. */
class ToolboxSpec extends SparkSpec {
  import spark.implicits._

  implicit val k: Keys = Panel.eod

  private lazy val series = Seq(
    ("A", "2024-01-01", Some(2.0)), ("A", "2024-01-02", None),
    ("A", "2024-01-03", Some(8.0)), ("A", "2024-01-04", Some(4.0)))
    .toDF("sid", "date", "value").withColumn("date", to_date($"date"))

  private def byDate(c: org.apache.spark.sql.Column): Map[String, Option[Double]] =
    series.select($"date", c.as("out")).collect()
      .map(r => r.getDate(0).toString ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

  test("bfill pulls the next non-null backward") {
    val out = byDate(Panel.bfill($"value"))
    assert(out("2024-01-02").contains(8.0))
    assert(out("2024-01-01").contains(2.0))
  }

  test("rollingMin/Max/Std over full frames only") {
    assert(byDate(Panel.rollingMax($"value", 2))("2024-01-04").contains(8.0))
    assert(byDate(Panel.rollingMin($"value", 2))("2024-01-04").contains(4.0))
    // std of (8,4), ddof=1 → sqrt(8) ≈ 2.8284271
    assert(byDate(Panel.rollingStd($"value", 2))("2024-01-04").map(r7).contains(2.8284271))
    // frame containing the null has only 1 obs → null
    assert(byDate(Panel.rollingMax($"value", 2))("2024-01-03").isEmpty)
  }

  test("cumProd compounds via sum-of-logs") {
    val out = byDate(Panel.cumProd(coalesce($"value", lit(1.0))))
    assert(out("2024-01-04").map(r7).contains(64.0)) // 2×1×8×4
  }

  test("dropExactDuplicates keeps the lowest id per content") {
    val docs = Seq((2L, "same text"), (1L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val kept = Dedup.dropExactDuplicates(docs).collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 3L))
  }

  test("withMediaMeta computes byte length, format, content hash") {
    val media = Seq((1L, "hello")).toDF("media_id", "text")
      .withColumn("payload", concat(unhex(lit("89504E47")), encode($"text", "UTF-8")))
    val row = Multimodal.withMediaMeta(media).head
    assert(row.getAs[Long]("byte_len") == 9) // 4 magic + 5 text bytes
    assert(row.getAs[String]("format") == "png")
    assert(row.getAs[String]("content_md5").length == 32)
  }

  test("resize/frame-sample stubs: center crop, strided windows, " +
    "short-payload edges (mm3/mm4 plumbing)") {
    import graft.multimodal.MediaCodec
    val codec = MediaCodec.open(4)
    val bytes = (0 until 10).map(_.toByte).toArray
    // center crop 2×2 = 4 bytes of 10 → offset (10-4)/2 = 3
    assert(codec.resizeStub(bytes, 2, 2).toSeq == Seq[Byte](3, 4, 5, 6))
    // shorter than the target: whole payload back
    assert(codec.resizeStub(bytes, 4, 4).toSeq == bytes.toSeq)
    assert(codec.resizeStub(null, 2, 2) == null)
    // frames of 4 every 3 from 10 bytes: (10-4)/3+1 = 3 frames
    val frames = codec.frameStub(bytes, 4, 3, maxFrames = 5)
    assert(frames.map(_._1) == Seq(0, 1, 2))
    assert(frames.map(_._2.toSeq) == Seq(
      Seq[Byte](0, 1, 2, 3), Seq[Byte](3, 4, 5, 6), Seq[Byte](6, 7, 8, 9)))
    assert(codec.frameStub(bytes, 4, 3, maxFrames = 2).length == 2) // capped
    assert(codec.frameStub(Array[Byte](1, 2), 4, 3, 5).isEmpty) // too short
    assert(codec.frameStub(null, 4, 3, 5).isEmpty)

    // dataframe plumbing: one row explodes to 3 typed frame rows
    val media = Seq((7L, bytes)).toDF("media_id", "payload")
    val out = Multimodal.sampleFrames(media, 4, 3, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted
    assert(out == Seq((7L, 0), (7L, 1), (7L, 2)))
  }

  test("REAL image codec: gradient-PNG fixture decodes to the exact " +
    "closed-form channel sums; JPEG decodes real dims; corrupt payload " +
    "yields null content (mm2/mm6)") {
    import graft.multimodal.MediaCodec
    // analytic truth for id=3: w=11, h=11
    val id = 3L
    val (w, h) = ((8 + id % 8).toInt, (8 + id % 5).toInt)
    var er = 0L; var eg = 0L; var eb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      er += (x * 7 + y * 13 + id) % 256
      eg += (x * 3 + y * 5 + 2 * id) % 256
      eb += (x * 11 + y + 3 * id) % 256
    }
    val media = Seq((id, MediaCodec.gradientPng(id)),
      (9L, Array[Byte](1, 2, 3))) // undecodable
      .toDF("media_id", "payload")
    val rows = Multimodal.imageContent(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    val ok = rows(id)
    assert((ok.getInt(1), ok.getInt(2)) == ((w, h)))
    assert((ok.getLong(3), ok.getLong(4), ok.getLong(5)) == ((er, eg, eb)))
    assert(rows(9L).isNullAt(1) && rows(9L).isNullAt(3))
    // header parse without decode agrees with the decoder
    val (wc, hc) = Multimodal.pngHeaderDims($"payload")
    val hd = media.where($"media_id" === id).select(wc, hc).head
    assert((hd.getInt(0), hd.getInt(1)) == ((w, h)))
    // a REAL JPEG decodes too (lossy — dims exact, content not asserted)
    val img = MediaCodec.decodeImage(MediaCodec.gradientPng(id))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    val jrow = Multimodal.imageContent(
      Seq((1L, baos.toByteArray)).toDF("media_id", "payload")).head
    assert((jrow.getInt(1), jrow.getInt(2)) == ((w, h)))
  }

  test("decompression-bomb guard: dimensions beyond maxPixels are " +
    "rejected from the HEADER, no raster allocated (the multimodal " +
    "maxBucket)") {
    import graft.multimodal.MediaCodec
    val png = MediaCodec.gradientPng(3L) // 11×11 = 121 px
    assert(MediaCodec.decodeImage(png, maxPixels = 121L) != null)
    assert(MediaCodec.decodeImage(png, maxPixels = 120L) == null)
    // dataframe path: the oversized image keeps null content columns
    val out = Multimodal.imageContent(
      Seq((1L, png)).toDF("media_id", "payload"), maxPixels = 100L).head
    assert(out.isNullAt(1) && out.isNullAt(3))
    // a crafted bomb header: IHDR claims 2^30 × 2^30 px — rejected
    // cheaply even though the payload is tiny (header parse only)
    val bomb = png.clone()
    for (off <- Seq(16, 20)) { // width, height big-endian u32 = 2^30
      bomb(off) = 0x40.toByte
      bomb(off + 1) = 0; bomb(off + 2) = 0; bomb(off + 3) = 0
    }
    assert(MediaCodec.decodeImage(bomb) == null)
  }

  test("REAL nearest-neighbor resize: 2x2 checkerboard up to 4x2 " +
    "duplicates columns by the explicit (x*sw)//dw rule (mm3)") {
    import graft.multimodal.MediaCodec
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00)
    img.setRGB(0, 1, 0x0000ff); img.setRGB(1, 1, 0xffffff)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val out = Multimodal.resizeImageContent(
      Seq((1L, baos.toByteArray)).toDF("media_id", "payload"),
      dstW = 4, dstH = 2).head
    // x=0,1 -> sx=0; x=2,3 -> sx=1: each source column counted twice
    assert((out.getInt(1), out.getInt(2)) == ((4, 2)))
    assert(out.getLong(3) == 2L * (255 + 0 + 0 + 255)) // r: red + white
    assert(out.getLong(4) == 2L * (0 + 255 + 0 + 255)) // g: green + white
    assert(out.getLong(5) == 2L * (0 + 0 + 255 + 255)) // b: blue + white
  }

  test("perceptualNearPairs: identical payloads pair at hamming 0 " +
    "through the banded path; distinct payloads never pair (mm5)") {
    val media = Seq(
      (1L, "same bytes"), (2L, "same bytes"), (3L, "different"),
      (4L, "same bytes")) // a 3-clique of identical payloads
      .toDF("media_id", "text")
      .withColumn("payload", encode($"text", "UTF-8"))
    val out = Multimodal.perceptualNearPairs(media)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(out.toSeq == Seq((1L, 2L, 0L), (1L, 4L, 0L), (2L, 4L, 0L)))
    // pigeonhole guard: maxHamming must stay below the band count
    intercept[IllegalArgumentException](
      Multimodal.perceptualNearPairs(media, maxHamming = 4, bands = 4))
    // null payloads are dropped, not banded
    val withNull = media.unionByName(
      Seq((9L, null.asInstanceOf[String])).toDF("media_id", "text")
        .withColumn("payload", encode($"text", "UTF-8")))
    assert(Multimodal.perceptualNearPairs(withNull).count() == 3L)
  }

  test("assignCells routes vectors to the nearest centroid (IVF)") {
    val vectors = Seq(
      (1L, Array(0.9f, 0.1f)), (2L, Array(0.1f, 0.8f)), (3L, Array(1.1f, -0.1f)))
      .toDF("vec_id", "embedding")
    val centroids = Seq(
      (0, Array(1.0f, 0.0f)), (1, Array(0.0f, 1.0f)))
      .toDF("cell_id", "centroid")
    val cells = Similarity.assignCells(vectors, centroids, "embedding")
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell_id")).toMap
    assert(cells == Map(1L -> 0, 2L -> 1, 3L -> 0))
  }

  test("probeCells returns the nprobe nearest cells; nprobe=2 IVF recall " +
    "is >= single-probe and both are subsets of brute force") {
    // 3 clusters around axes; vectors near cluster BOUNDARIES are the
    // ones single-probe misses (their neighbors sit in the adjacent cell)
    val vectors = Seq(
      (1L, Array(0.9f, 0.1f, 0.0f)), (2L, Array(0.8f, 0.3f, 0.0f)),
      (3L, Array(0.55f, 0.5f, 0.0f)), // boundary: cell 0, neighbors in 1
      (4L, Array(0.4f, 0.6f, 0.0f)), (5L, Array(0.1f, 0.9f, 0.0f)),
      (6L, Array(0.0f, 0.1f, 0.9f)))
      .toDF("vec_id", "embedding")
    val centroids = Seq(
      (0, Array(1.0f, 0.0f, 0.0f)), (1, Array(0.0f, 1.0f, 0.0f)),
      (2, Array(0.0f, 0.0f, 1.0f)))
      .toDF("cell_id", "centroid")
    val probes = Similarity.probeCells(vectors, centroids, "embedding", nprobe = 2)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell_id"))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(probes(3L) == Set(0, 1)) // boundary vector probes both cells
    assert(probes(1L) == Set(0, 1)) // z-cell is always the farthest here
    assert(probes.values.forall(_.size == 2))

    val queries = vectors.where($"vec_id" === 3L)
    def hits(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().map(_.getAs[Long]("neighbor_id")).toSet
    val brute = hits(Similarity.bruteForceTopK(queries, vectors, "vec_id", "embedding", 3))
    val one = hits(Similarity.ivfTopK(queries, vectors, centroids, "vec_id", "embedding", 3))
    val two = hits(Similarity.ivfTopK(queries, vectors, centroids, "vec_id", "embedding", 3,
      nprobe = 2))
    assert(one.subsetOf(brute) && two.subsetOf(brute))
    assert(one.subsetOf(two) && two.size > one.size) // nprobe=2 recovers
    assert(two == brute) // ...the full top-3 on this fixture
  }

  test("euclidean distance: native expression bit-identical to the HOF form") {
    val d = Seq((Array(0.0f, 3.0f), Array(4.0f, 0.0f))).toDF("a", "b")
      .select(Similarity.euclidean($"a", $"b")).head.getDouble(0)
    assert(d == 5.0)
    // equivalence over many float vectors (same sequential accumulation)
    val vecs = spark.range(500).select(
      org.apache.spark.sql.functions.transform(
        org.apache.spark.sql.functions.sequence(lit(1), lit(16)),
        i => (pmod($"id" * 31 + i * 7, lit(101)) / 10.0).cast("float")).as("a"),
      org.apache.spark.sql.functions.transform(
        org.apache.spark.sql.functions.sequence(lit(1), lit(16)),
        i => (pmod($"id" * 17 + i * 13, lit(97)) / 10.0).cast("float")).as("b"))
    val mismatches = vecs
      .where(Similarity.euclidean($"a", $"b") =!= Similarity.euclideanHof($"a", $"b"))
      .count()
    assert(mismatches == 0)
  }

  test("REAL WAV codec: sawtooth fixture decodes to the exact " +
    "closed-form samples; corrupt/null/bomb payloads come back null") {
    import graft.multimodal.MediaCodec
    val id = 5L
    val n = (64 + id % 32).toInt // 69 samples
    val (rate, samples) = MediaCodec.decodeWav(MediaCodec.sawtoothWav(id))
    assert(rate == 8000 && samples.length == n)
    (0 until n).foreach { i =>
      val expect = ((i.toLong * 37 + id * 101) % 65536) - 32768
      assert(samples(i).toLong == expect, s"sample $i")
    }
    // null and corrupt payloads: curation signal, not a crash
    assert(MediaCodec.decodeWav(null) == null)
    assert(MediaCodec.decodeWav("not audio at all".getBytes) == null)
    val zeroMagic = MediaCodec.sawtoothWav(id).clone()
    zeroMagic(0) = 0; zeroMagic(1) = 0; zeroMagic(2) = 0; zeroMagic(3) = 0
    assert(MediaCodec.decodeWav(zeroMagic) == null)
    // header-first bomb guard: byte budget below the PCM size rejects
    // without reading sample data (69 samples × 2 bytes = 138)
    assert(MediaCodec.decodeWav(MediaCodec.sawtoothWav(id), maxBytes = 138L) != null)
    assert(MediaCodec.decodeWav(MediaCodec.sawtoothWav(id), maxBytes = 137L) == null)
    // dataflow: wavContent keeps nulls in-schema
    val media = Seq((id, MediaCodec.sawtoothWav(id)),
      (1L, "junk".getBytes), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "payload")
    val rows = Multimodal.wavContent(media).collect()
    assert(rows.length == 3)
    val good = rows.find(_.getLong(0) == id).get
    assert(good.getInt(1) == 8000 && good.getLong(2) == n &&
      good.getLong(3) == n.toLong * 125)
    rows.filter(_.getLong(0) != id).foreach(r => assert(r.isNullAt(1) && r.isNullAt(6)))
  }
}
