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
}
