package graft

import graft.operators.Multimodal
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Multimodal plumbing: the mapPartitions batch decoder agrees with
  * the columnar stub, and frame sampling explodes the right offsets.
  */
class MultimodalSpec extends SparkSpec {

  test("decodeBatch (mapPartitions) matches the columnar stub decoder") {
    val d = Tables.table(spark, sfDir, "documents")
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("n_bytes", octet_length(col("payload")))
    val batch = Multimodal.decodeBatch(d, "doc_id", "payload")
      .collect().map(m => (m.doc_id, m.n_bytes, m.width, m.height, m.n_frames)).toSet
    val columnar = d
      .withColumn("hdr", Multimodal.fakeDecodeHeader(col("payload"), col("n_bytes")))
      .select(col("doc_id"), col("n_bytes"), col("hdr.width"),
        col("hdr.height"), col("hdr.n_frames"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getInt(4))).toSet
    assert(batch == columnar)
  }

  test("mediaMetaBatch parses real container headers: format sniff, " +
      "dims, frame counts, corrupt degrade") {
    import spark.implicits._
    val rows = Seq(
      (0L, Multimodal.renderFixtureGif(0L)),   // 2 frames, 32x24
      (4L, Multimodal.renderFixtureGif(4L)),   // 6 frames
      (9L, Multimodal.renderFixturePng(9L)),   // png 128x96, 1 frame
      (20L, Array[Byte](1, 2, 3)))             // garbage
      .toDF("doc_id", "payload")
    val out = Multimodal.mediaMetaBatch(rows, "doc_id", "payload")
      .collect().map(m => m.doc_id ->
        (m.fmt, m.width, m.height, m.n_frames)).toMap
    assert(out(0L) == ("gif", 32, 24, 2))
    assert(out(4L) == ("gif", 32, 24, 6))
    assert(out(9L) == ("png", 128, 96, 1))
    assert(out(20L) == ("unknown", 0, 0, 0))
  }

  test("scene fixture: adjacent scenes always hash apart (the cut " +
      "rule's premise) and static runs hash identical") {
    import spark.implicits._
    val docs = Seq(5L, 11L).toDF("doc_id")
      .select(col("doc_id"),
        udf((id: Long) => Multimodal.renderSceneGif(id))
          .apply(col("doc_id")).as("payload"))
    val frames = Multimodal.decodeFramesBatch(docs, "doc_id", "payload", 1)
    val keyed = frames.toDF().select(
      (col("doc_id") * 8 + col("frame_idx")).as("doc_id"),
      col("width"), col("height"), col("payload"))
    val hashes = Multimodal.aHash64(keyed.as[Multimodal.DecodedFrame])
      .collect().map(p => (p.doc_id / 8, (p.doc_id % 8).toInt) -> p.phash)
      .toMap
    for ((id, runLen) <- Seq((5L, 3), (11L, 3)); // id%3+1
         f <- 1 until (id % 4 + 3).toInt) {
      val samePhase = (f / runLen) % 3 == ((f - 1) / runLen) % 3
      if (samePhase)
        assert(hashes((id, f)) == hashes((id, f - 1)),
          s"static run broke at doc $id frame $f")
      else
        assert(hashes((id, f)) != hashes((id, f - 1)),
          s"scene cut invisible to phash at doc $id frame $f")
    }
  }

  test("sampleFrames keeps every step-th index below n_frames") {
    val got = spark.range(1)
      .select(Multimodal.sampleFrames(lit(10), step = 3, frameBytes = 1024L).as("f"))
      .head().getSeq[Long](0)
    assert(got == Seq(0L, 3L, 6L, 9L))
  }

  test("resizeBatch shrinks payloads toward the target and is deterministic") {
    val d = Tables.table(spark, sfDir, "documents")
      .withColumn("payload", col("text").cast("binary")).limit(50)
    val out = Multimodal.resizeBatch(d, "doc_id", "payload", 64, 64).collect()
    assert(out.length == 50)
    assert(out.forall(r => r.width == 64 && r.height == 64))
    assert(out.forall(r => r.payload.nonEmpty && r.payload.length <= 64 * 64 / 64 + 1))
    val again = Multimodal.resizeBatch(d, "doc_id", "payload", 64, 64).collect()
    assert(out.map(r => (r.doc_id, r.payload.toSeq)).toSet ==
      again.map(r => (r.doc_id, r.payload.toSeq)).toSet)
  }

  test("embedBatch emits a real embedding column the ANN operators accept") {
    val d = Tables.table(spark, sfDir, "documents")
      .withColumn("payload", col("text").cast("binary")).limit(40)
    val emb = Multimodal.embedBatch(d, "doc_id", "payload").toDF()
      .withColumnRenamed("doc_id", "vec_id")
    val rows = emb.collect()
    assert(rows.forall(_.getSeq[Float](1).length == 64))
    // content-sensitive: more than one distinct vector
    assert(rows.map(_.getSeq[Float](1)).distinct.length > 1)
    // end-to-end: stubbed encoder output drives the real brute-force ANN
    val queries = emb.limit(3)
    val topk = graft.operators.Similarity.bruteForceTopK(emb, queries, k = 5)
    val counts = topk.groupBy("query_id").count().collect().map(_.getLong(1))
    assert(counts.length == 3 && counts.forall(_ == 5))
  }

  test("decodeImageBatch decodes real PNGs via javax.imageio into the " +
      "resize/embed/ANN chain; corrupt payloads degrade") {
    import spark.implicits._
    def png(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Seq(
      (1L, png(8, 6, (x, y) => (x * 32 << 16) | (y * 40 << 8) | 7)),
      (2L, png(16, 16, (x, y) => ((x ^ y) * 16) * 0x10101)),
      (3L, Array[Byte](1, 2, 3)), // not an image
      (4L, null.asInstanceOf[Array[Byte]]))
    val df = rows.toDF("doc_id", "payload")
    val dec = Multimodal.decodeImageBatch(df, "doc_id", "payload")
      .collect().map(d => d.doc_id -> d).toMap
    // PNG round-trips TYPE_INT_RGB losslessly: check an exact luma —
    // pixel (x=2, y=3) of doc 1 is rgb(64, 120, 7) → BT.601 luma 90
    val d1 = dec(1L)
    assert(d1.width == 8 && d1.height == 6 && d1.payload.length == 48)
    assert((d1.payload(3 * 8 + 2) & 0xff) == (64 * 299 + 120 * 587 + 7 * 114) / 1000)
    // doc 2 is gray-on-gray (r=g=b): luma equals the channel value
    val d2 = dec(2L)
    assert(d2.width == 16 && d2.height == 16)
    assert((d2.payload(5 * 16 + 9) & 0xff) == ((9 ^ 5) * 16))
    // corrupt rows degrade to empty frames, never throw
    assert(dec(3L).width == 0 && dec(3L).payload.isEmpty)
    assert(dec(4L).width == 0 && dec(4L).payload.isEmpty)
    // end-to-end: decoded frames → resizeRaw8 → embed → brute ANN
    val frames = Multimodal.decodeImageBatch(df, "doc_id", "payload").toDF()
      .filter(col("width") > 0)
    val resized = Multimodal.resizeRaw8(
      frames, "doc_id", "payload", "width", "height", 8, 8).toDF()
    val emb = Multimodal.embedBatch(resized, "doc_id", "payload")
      .toDF().withColumnRenamed("doc_id", "vec_id")
    // 2 decodable docs, self excluded → exactly one neighbor row
    val topk = graft.operators.Similarity.bruteForceTopK(emb, emb.limit(1), k = 2)
    assert(topk.count() == 1)
  }

  test("decodeImageBatch survives adversarial payloads: truncated and " +
      "bit-flipped codec headers degrade to empty frames, never throw") {
    import spark.implicits._
    // real format magics followed by garbage/truncation — the inputs
    // that push plugin readers past IOException into unchecked throws
    val magics = Seq[Array[Byte]](
      Array(0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
      "GIF89a".getBytes, "GIF87a".getBytes, "BM".getBytes,
      Array(0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte))
    val rnd = new scala.util.Random(42)
    val rows = (0 until 50).map { i =>
      val magic = magics(i % magics.length)
      val tail = new Array[Byte](i * 7 % 96)
      rnd.nextBytes(tail)
      (i.toLong, magic ++ tail)
    }
    val dec = Multimodal.decodeImageBatch(
      rows.toDF("doc_id", "payload"), "doc_id", "payload").collect()
    assert(dec.length == 50)
    // every row degraded (none of these is a decodable image)
    assert(dec.forall(d => d.width == 0 && d.payload.isEmpty))
  }

  test("embedFrames is a real pixel encoder: unit norm, scale-invariant on the " +
      "fixture twins, ANN recovers the resolution twin as nearest neighbor") {
    import graft.operators.Multimodal
    // the q_image_phash fixture corpus: ids 8 apart = same pattern at
    // 1× and 2× resolution; distinct patterns otherwise
    val pngs = spark.createDataFrame(
      (0L until 16L).map(id => (id, Multimodal.renderFixturePng(id))))
      .toDF("doc_id", "payload")
    val emb = Multimodal.embedFrames(
      Multimodal.decodeImageBatch(pngs, "doc_id", "payload"))
    val byId = emb.collect().map(e => e.doc_id -> e.embedding).toMap
    assert(byId.size == 16 && byId.values.forall(_.length == 64))
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    // L2-normalized (patterns are non-uniform, so no zero vectors)
    byId.values.foreach(v => assert(math.abs(dot(v, v) - 1.0) < 1e-5))
    // scale invariance is EXACT by construction: the nearest-neighbor
    // 8x8 grid of the 2x render equals the 1x render's grid
    for (p <- 0L until 8L)
      assert(byId(p).sameElements(byId(p + 8)),
        s"pattern $p: 1x and 2x renders must embed identically")
    // distinct patterns are not collinear
    for (p <- 1L until 8L)
      assert(dot(byId(0), byId(p)) < 0.999, s"pattern $p vs 0 too similar")
    // end-to-end ANN handoff: each 1x image's nearest non-self
    // neighbor is its 2x twin (cosine exactly 1)
    val vecs = emb.toDF().withColumnRenamed("doc_id", "vec_id")
    val topk = graft.operators.Similarity.bruteForceTopK(
      vecs, vecs.filter(col("vec_id") < 8), k = 1)
    val nn = topk.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (p <- 0L until 8L) assert(nn(p) == p + 8,
      s"pattern $p nearest neighbor ${nn(p)}, expected ${p + 8}")
  }

  test("decodeAudioBatch decodes real containers via javax.sound.sampled: " +
      "stereo big-endian AIFF channel 0, corrupt payloads degrade") {
    import graft.operators.Multimodal
    // a stereo BIG-endian AIFF whose channel 0 is a known ramp and
    // channel 1 is junk — exercises the endianness branch and the
    // channel-0 extraction the WAV fixture (mono little-endian) never
    // touches
    val n = 64
    val ch0 = Array.tabulate(n)(i => (i * 131 - 4000).toShort)
    val pcm = new Array[Byte](n * 4)
    for (i <- 0 until n) {
      val a = ch0(i); val b = (i * 7 + 1).toShort
      pcm(4 * i) = ((a >> 8) & 0xff).toByte; pcm(4 * i + 1) = (a & 0xff).toByte
      pcm(4 * i + 2) = ((b >> 8) & 0xff).toByte; pcm(4 * i + 3) = (b & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, true)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.AIFF, baos)
    val df = spark.createDataFrame(Seq(
      (1L, baos.toByteArray),
      (2L, Array[Byte](1, 2, 3)),                    // not a container
      (3L, Array.emptyByteArray))).toDF("doc_id", "payload")
    val dec = Multimodal.decodeAudioBatch(df, "doc_id", "payload")
      .collect().map(a => a.doc_id -> a).toMap
    assert(dec(1L).sample_rate == 8000 && dec(1L).n_samples == n)
    assert(dec(1L).samples.sameElements(ch0), "channel 0 must round-trip")
    assert(dec(2L).n_samples == 0 && dec(2L).samples.isEmpty)
    assert(dec(3L).n_samples == 0 && dec(3L).samples.isEmpty)
    // integer feature contract on a hand-checked sequence
    import spark.implicits._
    val tiny = Multimodal.audioFeatures(
      Seq(Multimodal.DecodedAudio(9L, 8000, 4,
        Array[Short](3, -4, 0, 5))).toDS()).collect().head
    assert(tiny.peak == 5 && tiny.mean_square == 50L / 4 && tiny.zcr == 2)
  }

  test("resizeRaw8 is a real nearest-neighbor resampler: exact pixels on a " +
      "known image, downsample then upsample round-trips blocks") {
    import spark.implicits._
    // 4x4 gradient: pixel(y,x) = y*4+x
    val img = Array.tabulate(16)(i => i.toByte)
    val df = Seq((1L, img, 4, 4)).toDF("doc_id", "payload", "w", "h")
    val half = Multimodal.resizeRaw8(df, "doc_id", "payload", "w", "h", 2, 2)
      .collect().head
    // nearest neighbor at stride 2 picks (0,0),(0,2),(2,0),(2,2)
    assert(half.payload.toSeq == Seq(0, 2, 8, 10).map(_.toByte))
    assert(half.width == 2 && half.height == 2)
    // upsample 2x2 -> 4x4 replicates each pixel into a 2x2 block
    val up = Multimodal.resizeRaw8(
      Seq((1L, Array[Byte](0, 2, 8, 10), 2, 2)).toDF("doc_id", "payload", "w", "h"),
      "doc_id", "payload", "w", "h", 4, 4).collect().head
    assert(up.payload.toSeq == Seq(
      0, 0, 2, 2,
      0, 0, 2, 2,
      8, 8, 10, 10,
      8, 8, 10, 10).map(_.toByte))
    // truncated payload reads as zero-padded, never throws
    val trunc = Multimodal.resizeRaw8(
      Seq((1L, Array[Byte](7), 4, 4)).toDF("doc_id", "payload", "w", "h"),
      "doc_id", "payload", "w", "h", 2, 2).collect().head
    assert(trunc.payload.toSeq == Seq(7, 0, 0, 0).map(_.toByte))
    // corrupt rows degrade to zero frames instead of killing the stage:
    // null payload, null/negative dims, and overflow-scale dims
    val corrupt = Multimodal.resizeRaw8(
      Seq(
        (1L, null.asInstanceOf[Array[Byte]], Some(4), Some(4)),
        (2L, Array[Byte](1, 2, 3), None, Some(4)),
        (3L, Array[Byte](1, 2, 3), Some(-4), Some(4)),
        (4L, Array[Byte](7), Some(66000), Some(66000))
      ).toDF("doc_id", "payload", "w", "h"),
      "doc_id", "payload", "w", "h", 2, 2).collect()
    assert(corrupt.length == 4)
    assert(corrupt.filter(r => r.doc_id != 4L)
      .forall(_.payload.toSeq == Seq[Byte](0, 0, 0, 0)))
    // the 66000x66000 claim over a 1-byte payload: pixel (0,0) exists,
    // everything else zero-pads — no Int wraparound crash
    assert(corrupt.find(_.doc_id == 4L).get.payload.head == 7.toByte)
  }

  test("aHash64: re-encoded and rescaled copies share the hash; " +
      "exact-phash groupBy dedups images") {
    import spark.implicits._
    def encode(w: Int, h: Int, fmt: String, f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, f(x, y) * 0x10101) // gray
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    // a horizontal gradient; doc 2 is the SAME image scaled 2× and
    // re-encoded as BMP (different bytes, 3BYTE_BGR decode path);
    // doc 3 is the mirrored gradient; doc 4 is corrupt
    val grad = (x: Int, _: Int) => x * 16
    val rows = Seq(
      (1L, encode(16, 16, "png", grad)),
      (2L, encode(32, 32, "bmp", (x, y) => grad(x / 2, y / 2))),
      (3L, encode(16, 16, "png", (x, y) => 240 - grad(x, y))),
      (4L, Array[Byte](9, 9, 9)))
    val frames = Multimodal.decodeImageBatch(
      rows.toDF("doc_id", "payload"), "doc_id", "payload")
    val hashes = Multimodal.aHash64(frames)
      .collect().map(p => p.doc_id -> p.phash).toMap
    assert(hashes(1L) == hashes(2L),
      s"re-encoded copy drifted: ${hashes(1L)} vs ${hashes(2L)}")
    assert(hashes(1L) != hashes(3L), "distinct images collided")
    assert(!hashes.contains(4L),
      "corrupt frames must be excluded, not hashed into the dedup space")
    // hamming via bit_count(a ^ b): the mirrored gradient flips every
    // set bit, so the distance is |bits(1)| + |bits(3)|
    val dist = Seq((hashes(1L), hashes(3L))).toDF("a", "b")
      .select(bit_count(col("a").bitwiseXOR(col("b")))).as[Int].head()
    assert(dist > 32, s"mirror should be far: hamming $dist")
    // dedup: one shuffle keyed by the long hash, min id canonical
    val groups = Multimodal.aHash64(frames).toDF()
      .groupBy("phash").agg(min("doc_id").as("canonical_id"),
        count(lit(1)).as("n_copies"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(groups == Map(1L -> 2L, 3L -> 1L))
  }

  test("decodeFramesBatch: real per-frame GIF decode — frame counts " +
      "match the fixture, sampling skips odd frames, rasters are the " +
      "exact pattern, corrupt payloads yield zero rows") {
    import spark.implicits._
    val docs = Seq(3L, 7L).toDF("doc_id")
      .select(col("doc_id"),
        udf((id: Long) => Multimodal.renderFixtureGif(id))
          .apply(col("doc_id")).as("payload"))
    val all = Multimodal.decodeFramesBatch(docs, "doc_id", "payload", step = 1)
      .collect()
    // id 3 → 5 frames, id 7 → 4 frames, all 32×24
    assert(all.count(_.doc_id == 3L) == 5)
    assert(all.count(_.doc_id == 7L) == 4)
    assert(all.forall(f => f.width == 32 && f.height == 24))
    assert(all.forall(f => f.n_frames == (if (f.doc_id == 3L) 5 else 4)))
    // the decoded raster is the exact integer pattern (indexed-gray
    // palette → lossless round trip), frame phase f % 3
    for (f <- all; y <- Seq(0, 11, 23); x <- Seq(0, 15, 31)) {
      val p = (f.doc_id % 4).toInt
      val want = ((p * 31 + (x * 8 / 32) * 7 + (y * 8 / 24) * 13 +
        (f.frame_idx % 3) * 41) * 17) % 256
      assert((f.payload(y * 32 + x) & 0xff) == want,
        s"doc ${f.doc_id} frame ${f.frame_idx} ($x,$y)")
    }
    // frames 0 and 3 of one GIF are identical rasters (phase % 3)
    val d3 = all.filter(_.doc_id == 3L).map(f => f.frame_idx -> f.payload.toSeq).toMap
    assert(d3(0) == d3(3) && d3(0) != d3(1))
    // sampling: step=2 decodes only even indices
    val sampled = Multimodal.decodeFramesBatch(docs, "doc_id", "payload", step = 2)
      .collect()
    assert(sampled.map(_.frame_idx).forall(_ % 2 == 0))
    assert(sampled.count(_.doc_id == 3L) == 3) // 0, 2, 4 of 5
    // corrupt payload → zero rows, not a stage kill
    val bad = Seq((9L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    assert(Multimodal.decodeFramesBatch(bad, "doc_id", "payload", 1)
      .collect().isEmpty)
  }

  test("embedFramesLearned: corpus-fit artifact publishes once, " +
      "embeddings are integer-exact, equal patterns at different " +
      "resolutions embed identically, and ANN accepts them") {
    val dir = sfDir
    graft.sources.DerivedCache.vacuumKinds(spark, Set("frame-embed-proj"))
    val proj = Multimodal.ensureFrameProjection(spark, dir)
    assert(graft.sources.DerivedCache.isComplete(spark, proj))
    // second ensure is a no-op read of the same artifact
    assert(Multimodal.ensureFrameProjection(spark, dir) == proj)
    val frames = Multimodal.decodeImageBatch(
      Multimodal.fixturePngs(spark, dir), "doc_id", "payload")
    val emb = Multimodal.embedFramesLearned(spark, frames, proj).collect()
    assert(emb.length == 16)
    // integer-exact floats (the oracle replay contract)
    assert(emb.forall(_.embedding.forall(v => v == math.rint(v))))
    assert(emb.exists(_.embedding.exists(_ != 0f)))
    // ids 8 apart share the pattern at 2× resolution → identical
    // embeddings (nearest-neighbor grid recovery, like aHash)
    val byId = emb.map(e => e.doc_id -> e.embedding.toSeq).toMap
    for (id <- 0L to 7L)
      assert(byId(id) == byId(id + 8), s"pattern pair $id/${id + 8} drifted")
    assert(byId(0L) != byId(1L), "distinct patterns collided")
    // the ANN handoff: brute top-1 of id 0 is its pattern twin at cos 1
    import spark.implicits._
    val embDf = emb.toSeq.toDF().select(
      col("doc_id").as("vec_id"), col("embedding"))
    val top = operators.Similarity.bruteForceTopK(
        embDf, embDf.filter(col("vec_id") === 0L), k = 1)
      .collect().head
    assert(top.getLong(1) == 8L && top.getDouble(2) == 1.0)
  }
}
