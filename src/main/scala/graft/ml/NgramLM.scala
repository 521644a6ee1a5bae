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
  *
  * The whole pipeline — training gram pass, background stats, and the
  * per-row scoring hot path — works on TOKEN HASHES (`tokenHashes`), never
  * on token strings: a token's identity is its Java String hashCode,
  * computed incrementally from the characters in one pass. One Int array
  * per document is the only allocation; the old tokenize→Array[String]
  * path allocated a lowercased copy of the text plus one String per token,
  * which at millions of docs per executor was the dominant garbage (and
  * memory-bandwidth) source of the dominant cascade stage.
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

  /** Allocation-free twin of `key` over a token-hash slice [from, until)
    * (an Int's `##` is itself, so mixing the hash directly is bit-identical
    * to mixing `token.##` over the corresponding string tokens).
    */
  def sliceKey(arr: Array[Int], from: Int, until: Int): Long = {
    var h1 = seed
    var h2 = seed ^ 0x5bd1e995
    var i = from
    while (i < until) {
      val eh = arr(i)
      h1 = MurmurHash3.mix(h1, eh)
      h2 = MurmurHash3.mix(h2, eh)
      i += 1
    }
    val n = until - from
    (MurmurHash3.finalizeHash(h1, n).toLong << 32) |
      (MurmurHash3.finalizeHash(h2, n).toLong & 0xffffffffL)
  }

  /** Stupid-backoff log10 score of position `i` — hot path: no per-level
    * allocations, gram keys computed over the token-hash array in place.
    */
  private def scoreAt(arr: Array[Int], i: Int): Double = {
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

  /** Per-word log10 perplexity over pre-hashed tokens (lets an ensemble
    * share one tokenization pass). */
  def logPerplexityTokens(toks: Array[Int]): Double = {
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
    logPerplexityTokens(NgramLM.tokenHashes(text))
  }
}

object NgramLM {

  // reference tokenizer, kept as the spec for `tokenHashes` (FeatureSpec
  // asserts tokenHashes == tokenize(_).map(_.##)); String.split(regex)
  // recompiles per call, so precompile
  private val TokenRe = java.util.regex.Pattern.compile("[^a-z0-9]+")

  def tokenize(text: String): Array[String] =
    TokenRe.split(text.toLowerCase).filter(_.nonEmpty)

  /** Token-hash stream of a document: the Java String hashCodes of
    * `tokenize(text)`, computed in ONE pass over the original characters
    * with no intermediate strings. A token is a maximal run of [a-z0-9]
    * after lowercasing; its hashCode accumulates as 31·h + c over the run.
    * ASCII A–Z lowercases arithmetically; everything else goes through
    * Character.toLowerCase (non-ASCII lowercase output is outside [a-z0-9]
    * and thus a separator, exactly like the regex form).
    */
  def tokenHashes(text: String): Array[Int] = {
    if (text == null) return Array.emptyIntArray
    val len = text.length
    var out = new Array[Int](math.min(math.max(len >> 3, 4), 1 << 16))
    var n = 0
    var h = 0
    var inRun = false
    var i = 0
    while (i < len) {
      var c = text.charAt(i)
      if (c >= 'A' && c <= 'Z') c = (c + 32).toChar
      else if (c >= 128) c = Character.toLowerCase(c)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        h = 31 * h + c
        inRun = true
      } else if (inRun) {
        if (n == out.length) out = java.util.Arrays.copyOf(out, out.length * 2)
        out(n) = h; n += 1; h = 0; inRun = false
      }
      i += 1
    }
    if (inRun) {
      if (n == out.length) out = java.util.Arrays.copyOf(out, out.length + 1)
      out(n) = h; n += 1
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** Distributed training over a text column: one generator pass explodes
    * every 1..order-gram, a hash-keyed two-level aggregation counts them
    * (map-side combine bounds the shuffle), and only the top-K survive into
    * the broadcastable model.
    */
  def train(spark: SparkSession, df: DataFrame, textCol: String,
            order: Int = 3, seed: Int = 17, topK: Int = 200000,
            totalUni: Option[Long] = None): NgramLMModel = {
    import spark.implicits._
    val model0 = NgramLMModel(order, seed, LongLongMap.empty, 0L, 0L) // for sliceKey()
    val grams = df.select(col(textCol)).as[String]
      .filter(_ != null)
      .flatMap { text =>
        val th = tokenHashes(text)
        (1 to order).iterator.flatMap { n =>
          (0 to th.length - n).iterator
            .map(i => (model0.sliceKey(th, i, i + n), if (n == 1) 1 else 0))
        }
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
      .map(t => tokenHashes(t).length.toLong).reduce(_ + _)
  }

  /** Per-language (mean, sd) perplexity backgrounds for ALL ensemble
    * members in one scoring pass over the corpus (each text is hashed
    * once and shared by every member inside the same map).
    */
  def pplStatsAll(spark: SparkSession, df: DataFrame, textCol: String, langCol: String,
                  models: Seq[NgramLMModel]): Seq[Map[String, (Double, Double)]] = {
    import spark.implicits._
    val ms = models // serializable closure capture
    val scored = df.select(col(langCol).as[String], col(textCol).as[String])
      .map { case (lang, text) =>
        val th = if (text == null) null else tokenHashes(text)
        (lang, ms.map(_.logPerplexityTokens(th)))
      }
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
