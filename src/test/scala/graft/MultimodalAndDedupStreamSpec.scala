package graft

import graft.multimodal.Multimodal
import graft.streaming.DedupStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class MultimodalAndDedupStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def assets = Multimodal.fromDocuments(Seq(
    (1L, "x" * 1000, "srcA"),   // 3 full frames + dropped tail
    (2L, "y" * 100, "srcA"),    // shorter than one frame
    (3L, "z" * 512, "srcB")     // exactly 2 frames
  ).toDF("doc_id", "text", "source"))

  test("frame sampler: 1→N fan-out, frame arithmetic, deterministic bytes") {
    val frames = Multimodal.frameSampleStub(assets, everyNth = 2, frameBytes = 256)
      .collect().groupBy(_.asset_id)
    // 1000B → nf=3, sampled idx {0,2}: 256B each
    assert(frames(1L).map(f => (f.frame_idx, f.frame_bytes.length)).sorted.toSeq ==
      Seq((0, 256), (2, 256)))
    // 100B → one short frame
    assert(frames(2L).map(f => (f.frame_idx, f.frame_bytes.length)).toSeq == Seq((0, 100)))
    // 512B → nf=2, sampled idx {0}
    assert(frames(3L).map(f => (f.frame_idx, f.frame_bytes.length)).toSeq == Seq((0, 256)))
    // pts: 25fps stub (40 ms per frame index)
    assert(frames(1L).find(_.frame_idx == 2).get.pts_ms == 80L)
    // deterministic across runs
    val again = Multimodal.frameSampleStub(assets, everyNth = 2, frameBytes = 256)
      .collect().map(f => (f.asset_id, f.frame_idx, f.frame_bytes.toSeq)).toSet
    val first = Multimodal.frameSampleStub(assets, everyNth = 2, frameBytes = 256)
      .collect().map(f => (f.asset_id, f.frame_idx, f.frame_bytes.toSeq)).toSet
    assert(again == first)
  }

  test("resize stub: payload subsampled, metadata struct rewritten") {
    val resized = Multimodal.resizeStub(assets, factor = 4)
    assert(resized.columns.toSeq == Seq("asset_id", "payload", "meta"))
    val rows = resized.select("asset_id", "meta.byte_len", "meta.kind", "meta.source")
      .as[(Long, Long, String, String)].collect().toMap2
    assert(rows(1L) == ((250L, "text", "srcA")))
    assert(rows(2L) == ((25L, "text", "srcA")))
    // byte_len in metadata matches the actual payload
    val check = resized.select(col("asset_id"),
      (octet_length(col("payload")).cast("long") === col("meta.byte_len")).as("ok"))
      .as[(Long, Boolean)].collect()
    assert(check.forall(_._2))
  }

  private implicit class MapOps[A, B, C, D](rows: Array[(A, B, C, D)]) {
    def toMap2: Map[A, (B, C, D)] = rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("streaming dedup within watermark: duplicates across microbatches collapse") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Ev]
    def e(id: Long, t: String) =
      Ev(id, Timestamp.valueOf(t), id, "click", 1.0, "{}")

    val deduped = DedupStream.exactOnceWithinWatermark(
      ms.toDF(), "ts", "10 minutes", Seq("event_id"))
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      ms.addData(e(1, "2024-01-01 10:00:00"), e(2, "2024-01-01 10:01:00"),
                 e(1, "2024-01-01 10:00:00"))           // dup in same batch
      q.processAllAvailable()
      ms.addData(e(2, "2024-01-01 10:01:00"),           // dup across batches
                 e(3, "2024-01-01 10:02:00"))
      q.processAllAvailable()
      val got = spark.table("dedup_stream").select("event_id")
        .as[Long].collect().sorted.toSeq
      assert(got == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("streaming corpus ingest: quality gate + fingerprint dedup compose") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, String, Timestamp)]
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val out = graft.streaming.CorpusIngestStream.ingest(
      ms.toDF().toDF("doc_id", "text", "ts"), minWords = 3)
    val q = out.writeStream.format("memory").queryName("corpus_stream")
      .outputMode("append").start()
    try {
      ms.addData((1L, "alpha beta gamma", t0), (2L, "short", t0),
                 (5L, "x!!! y??? z***%%%", t0)) // punctuation-dominated
      q.processAllAvailable()
      // doc 3 is a whitespace/case re-delivery of doc 1 — same
      // fingerprint, new microbatch: the dedup state must drop it
      ms.addData((3L, "Alpha  beta GAMMA", t0), (4L, "delta epsilon zeta", t0))
      q.processAllAvailable()
      val got = spark.table("corpus_stream").select("doc_id")
        .as[Long].collect().sorted.toSeq
      // 2 fails min-words, 5 fails the punctuation gate, 3 is a dup
      assert(got == Seq(1L, 4L))
    } finally q.stop()
  }

  test("streaming curate sink: microbatches land deduped; replay admits nothing") {
    implicit val sq = spark.sqlContext
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .as[(Long, String, String, String, Long)].collect()
    val ms = MemoryStream[(Long, String, String, String, Long)]
    val dir = TestSpark.tmpDir("streamcorpus")
    val t = graft.tables.LakehouseTable(spark, s"$dir/corpus", Seq("doc_id"))

    val q = graft.streaming.CorpusIngestStream.curateSink(
      ms.toDF().toDF("doc_id", "text", "lang", "source", "n_chars"),
      t, s"$dir/ckpt")
    try {
      ms.addData(docs.filter(_._1 % 2 == 0).toSeq)
      q.processAllAvailable()
      val afterB1 = t.read.count()
      assert(afterB1 > 0)

      // batch 2 re-delivers all of batch 1 plus the odd half
      ms.addData(docs.toSeq)
      q.processAllAvailable()
      val afterB2 = t.read.count()
      assert(afterB2 >= afterB1)

      // cross-batch invariants: unique fingerprints and doc_ids
      val fps = t.read.select("fp")
      assert(fps.count() == fps.distinct().count())
      val ids = t.read.select("doc_id")
      assert(ids.count() == ids.distinct().count())

      // full replay (at-least-once delivery) admits nothing more
      ms.addData(docs.toSeq)
      q.processAllAvailable()
      assert(t.read.count() == afterB2)
    } finally q.stop()
  }

  test("streaming curate sink: mid-microbatch kill (append half-staged) " +
       "— the replayed batch matches the no-crash run exactly") {
    // foreachBatch at-least-once (SURVEY §2.9): kill the sink INSIDE
    // the curated table's appendBatch publish (batch fully staged, not
    // yet visible), restart from the same checkpoint, and compare the
    // final corpus against a CONTROL pipeline that saw the identical
    // batch sequence with no crash — byte-identical admitted sets, no
    // drops, no duplicates.
    implicit val sq = spark.sqlContext
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .as[(Long, String, String, String, Long)].collect()
    val b1 = docs.filter(_._1 % 2 == 0).toSeq
    val b2 = docs.toSeq // re-delivers b1 + the odd half
    val dir = TestSpark.tmpDir("streamcorpuskill")

    def drain(ms: MemoryStream[(Long, String, String, String, Long)],
              t: graft.tables.LakehouseTable, ckpt: String): Unit = {
      val q = graft.streaming.CorpusIngestStream.curateSink(
        ms.toDF().toDF("doc_id", "text", "lang", "source", "n_chars"),
        t, ckpt)
      try q.processAllAvailable() finally q.stop()
    }

    // control: same two batches, no crash
    val msC = MemoryStream[(Long, String, String, String, Long)]
    val tC = graft.tables.LakehouseTable(spark, s"$dir/control", Seq("doc_id"))
    msC.addData(b1); drain(msC, tC, s"$dir/ckptC")
    msC.addData(b2); drain(msC, tC, s"$dir/ckptC")

    // treatment: batch 2's appendBatch publish is killed mid-flight
    val ms = MemoryStream[(Long, String, String, String, Long)]
    val t = graft.tables.LakehouseTable(spark, s"$dir/corpus", Seq("doc_id"))
    ms.addData(b1); drain(ms, t, s"$dir/ckpt")
    val afterB1 = t.read.select("doc_id").as[Long].collect().toSet

    @volatile var fired = false
    t.faultHook = label =>
      if (!fired && label.startsWith("rename:")) {
        fired = true
        throw new RuntimeException("injected mid-microbatch kill")
      }
    ms.addData(b2)
    intercept[Exception] { drain(ms, t, s"$dir/ckpt") }
    t.faultHook = null
    assert(fired, "kill hook never fired — appendBatch publish not reached")
    // half-written: the batch is staged but NOT visible
    assert(t.read.select("doc_id").as[Long].collect().toSet == afterB1,
      "half-landed batch visible after the kill")

    // restart from the same checkpoint: the uncommitted batch replays
    drain(ms, t, s"$dir/ckpt")
    val treatIds = t.read.select("doc_id").as[Long].collect().toSet
    val controlIds = tC.read.select("doc_id").as[Long].collect().toSet
    assert(treatIds == controlIds,
      s"replayed corpus diverged from the no-crash control: " +
      s"missing=${controlIds -- treatIds} extra=${treatIds -- controlIds}")
    // and the pk/fp uniqueness contracts still hold
    assert(t.read.select("doc_id").distinct().count() == treatIds.size)
    val fps = t.read.select("fp")
    assert(fps.count() == fps.distinct().count())

    // a further full replay admits nothing (at-least-once tolerance)
    ms.addData(b2)
    drain(ms, t, s"$dir/ckpt")
    assert(t.read.select("doc_id").as[Long].collect().toSet == treatIds)
  }

  test("real imageio decode: golden 2x2 PNG yields exact pixel stats; text falls back labeled") {
    // golden bytes: a hand-pinned 2x2 PNG through the REAL codec
    val golden = Multimodal.syntheticPng(id = 1L, w = 2, h = 2)
    // PNG magic — these are genuine codec bytes, not a fake
    assert((golden(0) & 0xff) == 0x89 && golden(1) == 'P'.toByte &&
           golden(2) == 'N'.toByte && golden(3) == 'G'.toByte)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(golden))
    assert(img.getWidth == 2 && img.getHeight == 2)
    // formula channels at id=1: r=(7x+13y+1)%256, g=(3x+11y+2)%256,
    // b=(5x+y+3)%256 over (x,y) in {0,1}^2 — decoded pixels must be
    // EXACTLY these (PNG is lossless)
    for (y <- 0 until 2; x <- 0 until 2) {
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xff) == (7 * x + 13 * y + 1) % 256)
      assert(((rgb >> 8) & 0xff) == (3 * x + 11 * y + 2) % 256)
      assert((rgb & 0xff) == (5 * x + y + 3) % 256)
    }

    // the distributed path over a mixed batch: id=10 keeps text bytes
    val docs = Seq((1L, "hello", "s"), (2L, "world", "s"), (10L, "plain", "s"))
      .toDF("doc_id", "text", "source")
    val out = Multimodal.decodeImages(Multimodal.pngAssets(docs))
      .collect().map(d => d.asset_id -> d).toMap
    val d1 = out(1L) // w = 4 + 1%5 = 5, h = 3 + 1%4 = 0 + ... = 4
    assert(d1.width.contains(5) && d1.height.contains(4) && d1.err.isEmpty)
    val expR = (for (y <- 0 until 4; x <- 0 until 5)
      yield (7 * x + 13 * y + 1) % 256).sum.toLong
    assert(d1.sum_r.contains(expR))
    // undecodable text: labeled err + deterministic byte fallback
    val d10 = out(10L)
    assert(d10.err.contains("not_decodable") && d10.width.isEmpty)
    val expChecksum = "plain".getBytes("UTF-8")
      .foldLeft(0L)((c, b) => c * 31 + (b & 0xff))
    assert(d10.fallback_checksum.contains(expChecksum))
    // decode is deterministic across runs (codec round-trip included)
    val again = Multimodal.decodeImages(Multimodal.pngAssets(docs))
      .collect().map(d => d.asset_id -> d.sum_g).toMap
    assert(again(1L) == out(1L).sum_g && again(2L) == out(2L).sum_g)
  }
}
