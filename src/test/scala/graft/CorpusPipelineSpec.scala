package graft

import graft.etl.CorpusPipeline
import graft.text.{TextFunctions => TF}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("corpus curation funnel on testdata: monotone, dedup-complete, capped, deterministic") {
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val (curated, f) = CorpusPipeline.curate(docs, perLangCap = 50)

    // funnel only narrows
    assert(f.input >= f.qualityPass)
    assert(f.qualityPass >= f.repetitionPass)
    assert(f.repetitionPass >= f.langPass)
    assert(f.langPass >= f.exactUnique)
    assert(f.exactUnique >= f.nearDupSurvivors)
    assert(f.nearDupSurvivors >= f.sampled)
    assert(f.sampled > 0)
    assert(f.sampled == curated.count())

    // per-language cap holds
    val perLang = curated.groupBy("lang").count().as[(String, Long)].collect()
    assert(perLang.forall(_._2 <= 50), perLang.mkString(","))

    // no surviving exact duplicates: join back to text and fingerprint
    val joined = curated.select("doc_id").join(docs, "doc_id")
    val fps = joined.select(TF.fingerprint(col("text")).as("fp"))
    assert(fps.count() == fps.distinct().count())

    // every surviving doc passes the filters it claims to
    assert(curated.filter(col("pred_lang") =!= col("lang")).count() == 0)
    assert(curated.filter(col("n_words") < 30).count() == 0)

    // deterministic: a second run returns the identical set
    val (again, f2) = CorpusPipeline.curate(docs, perLangCap = 50)
    assert(f2 == f)
    assert(again.select("doc_id").as[Long].collect().sorted.toSeq ==
           curated.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("incremental curation: cross-batch dedup against the stored corpus, idempotent") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val dir = TestSpark.tmpDir("inccorpus")
    val t = graft.tables.LakehouseTable(spark, s"$dir/corpus", Seq("doc_id"))

    // bootstrap batch: even doc_ids
    val r1 = CorpusPipeline.curateIncremental(
      docs.filter(col("doc_id") % 2 === 0), t, perLangCap = 1000)
    assert(r1.admitted > 0 && r1.crossExactDropped == 0 && r1.crossNearDropped == 0)
    assert(t.read.count() == r1.admitted)
    // the table carries the dedup artifacts for future batches
    assert(t.read.columns.toSet.contains("fp") && t.read.columns.contains("sig"))

    // second batch: the FULL corpus — every even doc is an exact dup of
    // batch 1; odd docs may be near-dups of stored evens
    val r2 = CorpusPipeline.curateIncremental(docs, t, perLangCap = 1000)
    assert(r2.crossExactDropped > 0, "exact cross-batch dups not caught")
    val total = t.read.count()
    assert(total == r1.admitted + r2.admitted)

    // invariant: no duplicate fingerprints survive across batches
    val fps = t.read.select("fp")
    assert(fps.count() == fps.distinct().count())
    // and no duplicate doc_ids
    val ids = t.read.select("doc_id")
    assert(ids.count() == ids.distinct().count())

    // replaying the same batch admits nothing (exact dedup catches all)
    val r3 = CorpusPipeline.curateIncremental(docs, t, perLangCap = 1000)
    assert(r3.admitted == 0, s"replay admitted ${r3.admitted}")
    assert(t.read.count() == total)

    // cross-batch NEAR dedup (same-source policy): a later batch
    // delivering a lightly perturbed copy of a curated doc — new id,
    // one word swapped, so the exact fingerprint differs — must be
    // caught by the signature stage, not admitted
    // longest curated doc -> highest set-Jaccard after a 1-word swap
    val src = docs.join(t.read.select("doc_id"), "doc_id")
      .orderBy(length(col("text")).desc, col("doc_id"))
      .as[(Long, String, String, String, Long)].head()
    val words = src._2.split("\\s+")
    val mutated = (words.take(words.length - 1) :+ "zzzmutant").mkString(" ")
    val perturbed = Seq((999999L, mutated, src._3, src._4,
                         mutated.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r4 = CorpusPipeline.curateIncremental(perturbed, t, perLangCap = 1000)
    assert(r4.crossNearDropped == 1 && r4.admitted == 0,
      s"perturbed copy not near-deduped: $r4")
    assert(t.read.count() == total)

    // a run whose k disagrees with the stored signatures must fail
    // loud — zip_with against a different-length sig would silently
    // dilute the /k similarity estimate instead
    val e = intercept[IllegalArgumentException] {
      CorpusPipeline.curateIncremental(perturbed, t, perLangCap = 1000, k = 32)
    }
    assert(e.getMessage.contains("k=64"), e.getMessage)
  }

  test("intra-batch re-delivery of one doc_id lands once, not twice") {
    // at-least-once sources can deliver the same row twice IN ONE
    // batch: curate() collapses the pair via the fingerprint dedup,
    // but the artifact re-join against the raw frame used to fan the
    // admitted doc back out and append it twice — breaking the pk
    // contract and the fp-uniqueness invariant
    val dir = TestSpark.tmpDir("inccorpus_redeliver")
    val t = graft.tables.LakehouseTable(spark, s"$dir/corpus", Seq("doc_id"))
    val text = ("the quick brown fox jumps over the lazy dog and then " +
      "walks back home through the quiet town in the evening light " +
      "while people watch from their windows with mild interest").toLowerCase
    val doc = (7L, text, "en", "web", text.length.toLong)
    val batch = Seq(doc, doc) // identical re-delivery, same batch
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = CorpusPipeline.curateIncremental(batch, t, minWords = 10,
      perLangCap = 10)
    assert(r.admitted == 1, r)
    assert(t.read.count() == 1)
    assert(t.read.select("doc_id").distinct().count() == 1)
  }

  test("curation is case-insensitive end to end, like the exact fingerprint") {
    // title-case text must not be penalized as punctuation, must still
    // language-identify, and must near-dup against its lowercase twin
    val mk = (id: Long, s: String) =>
      (id, s, "en", "web", s.length.toLong)
    val base = "The Quick Brown Fox Jumps Over The Lazy Dog And Then " +
      "Walks Back Home Through The Quiet Town In The Evening Light " +
      "While People Watch From Their Windows With Mild Interest"
    val docs = Seq(mk(1L, base), mk(2L, base.toLowerCase))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val (curated, f) = CorpusPipeline.curate(docs, minWords = 10,
      perLangCap = 10)
    // both pass quality + lang despite the capitals...
    assert(f.qualityPass == 2 && f.langPass == 2, f)
    // ...and the pair is recognized as duplicates (exact, since the
    // fingerprint lowercases): one survivor
    assert(curated.count() == 1, f)
  }

  test("LSH parameter misuse fails loud instead of degenerating") {
    val docs = Seq((1L, Seq("a", "b"))).toDF("id", "ws")
    // bands not dividing k: trailing planes would silently be ignored
    intercept[IllegalArgumentException] {
      graft.text.MinHashLSH.nearDuplicates(docs, "id", "ws",
        k = 64, bands = 10, threshold = 0.9)
    }
    // bands > k: every bucket would be a constant — full cross product
    intercept[IllegalArgumentException] {
      graft.text.MinHashLSH.candidatePairs(
        docs.withColumn("sig", array(lit(1L))), "id",
        bands = 16, rowsPerBand = 0)
    }
  }
}
