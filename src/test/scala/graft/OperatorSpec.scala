package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}
import graft.ml.Scrubber

class OperatorSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),        // exact dup of 1
    (3L, "the quick brown fox jumps over the sleepy dog"),      // near dup of 1
    (4L, "completely different content about spark and data"),
    (5L, "another unrelated document with its own words here")
  ).toDF("doc_id", "text")

  test("exact dedup keeps the min-id representative") {
    val kept = Dedup.exact(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.sameElements(Array(1L, 3L, 4L, 5L)))
  }

  test("ngram jaccard finds the near-dup pair and scores exact dups 1.0") {
    val pairs = Dedup.ngramJaccard(docs, "text", "doc_id", n = 3, threshold = 0.3)
      .select("id_a", "id_b", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2))
    val exactPair = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(exactPair.exists(_._3 == 1.0))
    assert(pairs.exists(p => Set(p._1, p._2) == Set(1L, 3L)))
    assert(!pairs.exists(p => Set(p._1, p._2) == Set(4L, 5L)))
  }

  test("minhash LSH surfaces exact duplicates as candidates") {
    val pairs = Dedup.minhashLsh(docs, "text", "doc_id", n = 3, bands = 4, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("simhash: identical text = identical hash; bucket pairs include dup") {
    val h = Dedup.simhash16(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(h(1L) === h(2L))
    val pairs = Dedup.simhashPairs(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("cosine top-k is exact and deterministic on embeddings") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val topk = Similarity.cosineTopK(e, "embedding", "vec_id", Seq(0L), k = 3).collect()
    assert(topk.length === 3)
    val cosines = topk.map(_.getDouble(2))
    assert(cosines.sameElements(cosines.sorted.reverse))
    assert(cosines.forall(c => c >= -1.0000001 && c <= 1.0000001))
  }

  test("ANN LSH pairs are a subset of brute-force pairs at the same threshold") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(200).cache()
    val ann = Similarity.annPairs(e, "embedding", "vec_id", nPlanes = 4, threshold = 0.25)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val l = e.select(col("vec_id").as("id_a"), col("embedding").as("_va"))
    val r = e.select(col("vec_id").as("id_b"), col("embedding").as("_vb"))
    val brute = l.crossJoin(r).filter(col("id_a") < col("id_b"))
      .withColumn("cos", Similarity.cosine(col("_va"), col("_vb")))
      .filter(col("cos") >= 0.25)
      .select("id_a", "id_b").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(ann.subsetOf(brute))
    e.unpersist()
  }

  test("scrub is idempotent and byte-exact on known PII") {
    val s = "call 555-123-4567 or mail a.b@x.org ssn 123-45-6789 end"
    val once = Scrubber.scrubString(s)
    assert(once === "call <PHONE> or mail <EMAIL> ssn <SSN> end")
    assert(Scrubber.scrubString(once) === once)
  }

  test("html extraction drops tags/script/style and decodes entities") {
    val html = "<html><style>x{}</style><body><p>a &amp; b</p><script>no()</script></body></html>"
    assert(Scrubber.extractTextString(html) === "a & b")
  }
}
