package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

/** KenLM-style hashed n-gram language model (BASELINE.json north_star):
  * n-gram counts stored in an open-addressing primitive LongLongMap keyed
  * by a 64-bit-ish hash of the joined tokens, broadcast to executors,
  * consulted via a row-local stupid-backoff log-score — the webtext analog of the reference's
  * broadcast background ("first guess") fields
  * (/root/reference/functions/IO/read_fgs.r) that observations are scored
  * against.
  *
  * Training is a genuine distributed job: explode n-grams, two-level
  * aggregate, keep the top-K by count (bounding the broadcast at scale),
  * collect once on the driver. `seed` varies the hash so several models
  * form an ensemble (TITAN's ensemble members, read_fgs.r:78-110).
  */
final case class NgramLMModel(
    order: Int,
    seed: Int,
    counts: LongLongMap,
    totalUnigrams: Long,
    vocabSize: Long) extends Serializable {

  /** 64-bit-ish gram key: a double murmur mix-fold over the token hashes.
    * Deliberately NOT scala's `orderedHash` (whose 2.13 range-detection
    * special cases can't be replicated allocation-free); training and
    * lookup both go through this one implementation, so consistency is by
    * construction (FeatureSpec asserts key == sliceKey on slices).
    */
  def key(tokens: Seq[String]): Long = {
    var h1 = seed
    var h2 = seed ^ 0x5bd1e995
    var n = 0
    tokens.foreach { t =>
      val eh = t.##
      h1 = MurmurHash3.mix(h1, eh)
      h2 = MurmurHash3.mix(h2, eh)
      n += 1
    }
    (MurmurHash3.finalizeHash(h1, n).toLong << 32) |
      (MurmurHash3.finalizeHash(h2, n).toLong & 0xffffffffL)
  }

  /** Allocation-free twin of `key` over an array slice [from, until). */
  def sliceKey(arr: Array[String], from: Int, until: Int): Long = {
    var h1 = seed
    var h2 = seed ^ 0x5bd1e995
    var i = from
    while (i < until) {
      val eh = arr(i).##
      h1 = MurmurHash3.mix(h1, eh)
      h2 = MurmurHash3.mix(h2, eh)
      i += 1
    }
    val n = until - from
    (MurmurHash3.finalizeHash(h1, n).toLong << 32) |
      (MurmurHash3.finalizeHash(h2, n).toLong & 0xffffffffL)
  }

  /** Stupid-backoff log10 score of position `i` — hot path: no per-level
    * List allocations, hashes computed over array slices in place.
    */
  private def scoreAt(arr: Array[String], i: Int): Double = {
    var n = math.min(i, order - 1)
    var alpha = 1.0
    while (n > 0) {
      val c = counts.getOrElse(sliceKey(arr, i - n, i + 1), 0L)
      if (c > 0) {
        val cc = counts.getOrElse(sliceKey(arr, i - n, i), 0L)
        if (cc > 0) return math.log10(alpha * c.toDouble / cc.toDouble)
      }
      alpha *= 0.4
      n -= 1
    }
    // unigram with add-one smoothing over the hashed vocab
    math.log10(alpha * (counts.getOrElse(sliceKey(arr, i, i + 1), 0L) + 1).toDouble /
      (totalUnigrams + vocabSize + 1).toDouble)
  }

  /** Per-word log10 perplexity over pre-tokenized input (lets an ensemble
    * share one tokenization pass). */
  def logPerplexityTokens(toks: Array[String]): Double = {
    if (toks == null || toks.isEmpty) return Double.MaxValue
    var sum = 0.0
    var i = 0
    while (i < toks.length) {
      sum += scoreAt(toks, i)
      i += 1
    }
    -sum / toks.length
  }

  /** Per-word log10 perplexity of a document (higher = more surprising). */
  def logPerplexity(text: String): Double = {
    if (text == null) return Double.MaxValue
    logPerplexityTokens(NgramLM.tokenize(text))
  }
}

object NgramLM {

  // precompiled once: String.split(regex) recompiles the pattern per call,
  // which is measurable at millions of rows
  private val TokenRe = java.util.regex.Pattern.compile("[^a-z0-9]+")

  def tokenize(text: String): Array[String] =
    TokenRe.split(text.toLowerCase).filter(_.nonEmpty)

  /** Distributed training over a text column: one generator pass explodes
    * every 1..order-gram, a hash-keyed two-level aggregation counts them
    * (map-side combine bounds the shuffle), and only the top-K survive into
    * the broadcastable model.
    */
  def train(spark: SparkSession, df: DataFrame, textCol: String,
            order: Int = 3, seed: Int = 17, topK: Int = 200000,
            totalUni: Option[Long] = None): NgramLMModel = {
    import spark.implicits._
    val model0 = NgramLMModel(order, seed, LongLongMap.empty, 0L, 0L) // for key()
    val grams = df.select(col(textCol)).as[String]
      .filter(_ != null)
      .flatMap { text =>
        val toks = tokenize(text)
        (1 to order).iterator.flatMap(n => toks.sliding(n).filter(_.length == n))
          .map(g => (model0.key(g.toSeq), if (g.length == 1) 1 else 0))
      }
      .toDF("k", "isUni")

    val counted = grams.groupBy("k")
      .agg(count(lit(1)).as("c"), max("isUni").as("isUni"))
      .orderBy(desc("c"), asc("k"))
      .limit(topK)
      .collect()

    val counts = LongLongMap.fromPairs(counted.map(r => r.getLong(0) -> r.getLong(1)))
    val vocab = counted.count(_.getInt(2) == 1).toLong
    val tu = totalUni.getOrElse(totalUnigrams(spark, df, textCol))
    NgramLMModel(order, seed, counts, tu, vocab.max(1L))
  }

  /** One-pass corpus token total (shared across ensemble members). */
  def totalUnigrams(spark: SparkSession, df: DataFrame, textCol: String): Long = {
    import spark.implicits._
    df.select(col(textCol)).as[String].filter(_ != null)
      .map(t => tokenize(t).length.toLong).reduce(_ + _)
  }

  /** Per-language (mean, sd) perplexity backgrounds for ALL ensemble
    * members in one scoring pass over the corpus (each text is tokenized
    * once per member inside the same map).
    */
  def pplStatsAll(spark: SparkSession, df: DataFrame, textCol: String, langCol: String,
                  models: Seq[NgramLMModel]): Seq[Map[String, (Double, Double)]] = {
    import spark.implicits._
    val ms = models // serializable closure capture
    val scored = df.select(col(langCol).as[String], col(textCol).as[String])
      .map { case (lang, text) => (lang, ms.map(_.logPerplexity(text))) }
      .toDF("lang", "ppls")
    val aggs = models.indices.flatMap(i => Seq(
      avg(col("ppls").getItem(i)).as(s"m$i"),
      coalesce(stddev_samp(col("ppls").getItem(i)), lit(0.0)).as(s"s$i")))
    val rows = scored.groupBy("lang").agg(aggs.head, aggs.tail: _*).collect()
    models.indices.map { i =>
      rows.map(r => r.getString(0) -> (r.getDouble(1 + 2 * i), r.getDouble(2 + 2 * i))).toMap
    }
  }

  /** Per-language (mean, sd) of log-perplexity over a training frame — the
    * broadcast background statistics the fgt-analog deviates against
    * (reference: background mean and sd fed to titanlib fgt,
    * functions/checks/fgt.r:166,267-289).
    */
  def pplStats(spark: SparkSession, df: DataFrame, textCol: String, langCol: String,
               model: NgramLMModel): Map[String, (Double, Double)] = {
    import spark.implicits._
    val scored = df.select(col(langCol).as[String], col(textCol).as[String])
      .map { case (lang, text) => (lang, model.logPerplexity(text)) }
      .toDF("lang", "ppl")
    scored.groupBy("lang")
      .agg(avg("ppl").as("m"), coalesce(stddev_samp(col("ppl")), lit(0.0)).as("s"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
  }
}
