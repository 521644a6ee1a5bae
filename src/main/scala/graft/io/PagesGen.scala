package graft.io

import java.sql.Timestamp
import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ml.{LangId, Scrubber}

/** Deterministic synthetic Common-Crawl-style corpus with planted defects
  * and ground-truth labels — the webtext version of the reference's fixture
  * generators (/root/reference/test/aux/create_observation_test_ta_files.r:
  * 40-69: sample points, take field values as truth, corrupt a fraction
  * with a known error mode, carry the `ge` label through as a passthrough).
  *
  * Every row is a pure function of (seed, id), generated distributedly via
  * spark.range — the corpus is identical at any partitioning/parallelism,
  * which the F1 and byte-identity gates rely on.
  *
  * Defect classes (FIXTURES.md §4); `geCheck` is the flag code the full
  * cascade is expected to stamp first:
  *   clean         geCheck 0    ge 0
  *   backfill      geCheck 0    ge 0 (blank text, recoverable html)
  *   meta          geCheck 901  blank text, no html
  *   short         geCheck 901  too few chars
  *   wronglang     geCheck 902  text lang ≠ declared lang
  *   lowstop       geCheck 502  en text with stopwords stripped
  *   symbol        geCheck 501  symbol spam
  *   repeat        geCheck 501  repeated n-gram spam
  *   longword      geCheck 501  concatenated-junk words
  *   digit         geCheck 4    digit-heavy (sct_fg_dual event)
  *   longdoc       geCheck 3    very long doc (sct_dual event)
  *   gibberish     geCheck 11   shuffled-vocab word salad (high perplexity)
  *   buddy         geCheck 10   word count z-outlier within its domain
  *   sctout        geCheck 1    moderate word-count outlier (robust z only)
  *   lonely        geCheck 800  singleton host
  *   blacklisted   geCheck 999
  *   keepclean     geCheck 990  keep-listed domain
  *   pii           geCheck 0    ge 0 — kept, but expected_text is scrubbed
  *   crossfield    geCheck 301  html present but shorter than text
  *   ngramspam     geCheck 503  repeated in-vocab phrase (SEO stuffing)
  *   toxic         geCheck 504  lexicon words interspersed above the density ceiling
  */
object PagesGen {

  val Langs: Seq[String] = Seq("en", "de", "fr", "es", "it")
  val NHosts = 20
  val BlackDomain = "blocked.example"
  val KeepDomain  = "keep.example"

  /** The cascade config calibrated for this generator's corpus (thresholds
    * sit between the clean and planted-defect feature distributions; the
    * FixtureF1Spec gates assert F1 ≥ 0.99 per check under it).
    */
  val matchingConfig: graft.model.CascadeConfig = graft.model.CascadeConfig(
    minChars = 50, maxChars = 1000000,
    minWords = 10, maxWords = 100000,
    meanWordLen = graft.model.Bounds(2.5, 10.0),
    maxSymbolRatio = 0.20,
    minDistinctWordRatio = 0.08,
    langStopMin = Map("en" -> 0.02),
    langMismatchMinConf = 0.05,
    // buddyZ 3.2 + iteration + σ floor: a planted cluster of k same-group
    // outliers caps the achievable z at sqrt(n/k) no matter how extreme
    // they are (they dominate the group σ themselves) — six on one fixture
    // host measured z_max ≈ 3.5 under n ≈ 96, iteration-proof at z=4, so
    // the threshold must sit below the cluster ceiling. The σ floor (180
    // milli-log1p ≈ 0.18 in log1p units, the fgtSdFloor/sig2o-minimum
    // analog) keeps small-σ hosts from manufacturing z ≥ 3.2 out of noise
    // (a 79-word sctout doc on a σ=0.14 host measured z 3.4 — a stolen
    // flag). The reference always iterates its spatial checks to
    // convergence (i.*=10, test/ini/ta_sct.ini:7); all three knobs were
    // calibrated via ProfileBuddyCalib/ProfileRepCalib.
    buddyMinN = 5, buddyZ = 3.2, buddyMaxIter = 4, buddySdFloor = 180.0,
    sctMinN = 5, sctZ = 2.2,
    dualMinN = 5, dualEventWords = 200, dualLoFrac = 0.1, dualHiFrac = 0.95,
    fgtZ = 5.0, fgtSdFloor = 0.3,
    maxLogPpl = 2.2,
    fgDualDigitRatio = 0.2, fgDualMinN = 5, fgDualLoFrac = 0.1, fgDualHiFrac = 0.95,
    isolationMinN = 3, isolationKeys = Seq("domain", "lang"),
    blacklistDomains = Set(BlackDomain),
    keepDomains = Set(KeepDomain),
    // reference-shaped scale features ON (see docCfg): unconditional ingest
    // dedup, neighbor cap for the 30%-of-corpus bighost skew case, and the
    // boxcox/log1p variance stabilizer in the buddy z — the ScalingBench
    // pipeline is the one the reference actually runs
    dedupIngest = true,
    maxRefsPerGroup = Some(10000),
    buddyLog1p = true,
    // repetition ceilings (503): calibrated on the fixture distribution
    // (ProfileRepCalib) — ngramspam sits at top2 ≥ 0.24 / top3 ≥ 0.22,
    // every class not already sticky-flagged earlier at ≤ 0.12; the dup
    // fractions stay off because windowed clean text legitimately repeats
    // n-grams (d2 up to ~0.9)
    maxTop2GramFrac = 0.18,
    maxTop3GramFrac = 0.17,
    // toxicity (504): planted docs carry one lexicon word per ~5 base words
    // (density ≈ 0.17); clean text has zero hits (the lexicon collides with
    // nothing in the seed vocab), so 0.10 separates them with full margin
    maxToxicFrac = 0.10)

  val AllClasses: Seq[String] = Seq(
    "clean", "backfill", "meta", "short", "wronglang", "lowstop", "symbol",
    "repeat", "longword", "digit", "longdoc", "gibberish", "buddy", "sctout",
    "lonely", "blacklisted", "keepclean", "pii", "crossfield", "ngramspam",
    "toxic")

  private val vocab: Map[String, Array[String]] =
    LangId.seeds.map { case (l, s) => l -> s.split(" ").filter(_.nonEmpty) }
  private val enStop = Set("the", "a", "of", "and", "to", "in", "is", "that", "it",
    "was", "to", "with", "over", "for", "this", "are", "they", "she")
  private val enContent: Array[String] = vocab("en").filterNot(enStop)

  /** Clean text: seed-order word windows (learnable n-grams) of ~nWords. */
  private def cleanText(lang: String, nWords: Int, rng: Random): String = {
    val v = vocab(lang)
    val sb = new StringBuilder
    var produced = 0
    while (produced < nWords) {
      val len = math.min(6 + rng.nextInt(7), nWords - produced)
      val start = rng.nextInt(v.length)
      var i = 0
      while (i < len) {
        if (sb.nonEmpty) sb.append(' ')
        sb.append(v((start + i) % v.length))
        i += 1
      }
      produced += len
    }
    sb.toString
  }

  private def wordSalad(lang: String, nWords: Int, rng: Random): String =
    Array.fill(nWords)(vocab(lang)(rng.nextInt(vocab(lang).length))).mkString(" ")

  final case class GenRow(
      url: String, warc_ts: Timestamp, html: Array[Byte], text: String,
      lang: String, ge: Int, ge_check: Int, expected_text: String, clazz: String)

  /** One deterministic row per id. `defectPct` is the planted-defect rate
    * (reference uses 20%/3%/1%, create_observation_test_ta_files.r:41).
    */
  def row(id: Long, seed: Long, classes: Seq[String], defectPct: Int = 30): GenRow = {
    val rng = new Random(seed * 1000003L + id * 2654435761L)
    val lang = Langs(rng.nextInt(Langs.length))
    // ~30% of rows land on one giant domain (skew case, FIXTURES.md §4)
    val host =
      if (rng.nextInt(10) < 3) "bighost.example"
      else f"host${rng.nextInt(NHosts)}%02d.example"
    val clazz =
      if (rng.nextInt(100) >= defectPct) "clean"
      else classes((id % classes.length.toLong).toInt)

    val base = cleanText(lang, 35 + rng.nextInt(26), rng)
    val ts = new Timestamp(1699056000000L + id * 1000L)
    def page(domain: String, text: String, declared: String, html: Array[Byte],
             ge: Int, geCheck: Int, expected: String) =
      GenRow(s"https://$domain/p/$id", ts, html, text, declared, ge, geCheck,
        expected, clazz)
    // title left empty: extraction must reproduce `t` byte-identically
    def htmlOf(t: String) =
      s"<html><head><title></title><style>p{color:red}</style></head><body><p>$t</p></body></html>"
        .getBytes("UTF-8")

    clazz match {
      case "clean" =>
        page(host, base, lang, htmlOf(base), 0, 0, base)
      case "backfill" =>
        page(host, "", lang, htmlOf(base), 0, 0, base)
      case "meta" =>
        page(host, "", lang, null, 1, 901, "")
      case "short" =>
        val t = cleanText(lang, 4, rng)
        page(host, t, lang, htmlOf(t), 1, 901, t)
      case "wronglang" =>
        val other = Langs((Langs.indexOf(lang) + 1) % Langs.length)
        page(host, base, other, htmlOf(base), 1, 902, base)
      case "lowstop" =>
        val t = Array.fill(40 + rng.nextInt(21))(
          enContent(rng.nextInt(enContent.length))).mkString(" ")
        page(host, t, "en", htmlOf(t), 1, 502, t)
      case "symbol" =>
        val t = base.split(" ").map(w => w + "$#%!").mkString(" ")
        page(host, t, lang, htmlOf(t), 1, 501, t)
      case "repeat" =>
        val phrase = cleanText(lang, 3, rng)
        val t = Array.fill(30)(phrase).mkString(" ")
        page(host, t, lang, htmlOf(t), 1, 501, t)
      case "longword" =>
        // components ≥ 4 chars ⇒ every junk word ≥ 12 chars ⇒ mean word
        // length ≥ 12, strictly above any sane ceiling BY CONSTRUCTION
        // (with the unfiltered vocab, a tail of short components measured
        // mwl 9.93–10.0 — exactly at the 10.0 bound, escaping 501)
        val v = vocab(lang).filter(_.length >= 4)
        val t = Array.fill(30)(
          v(rng.nextInt(v.length)) + v(rng.nextInt(v.length)) + v(rng.nextInt(v.length))
        ).mkString(" ")
        page(host, t, lang, htmlOf(t), 1, 501, t)
      case "digit" =>
        // declared and detected stay consistent ("de") so only the digit
        // event fires, and 502 (en-only bounds) stays quiet
        val words = cleanText("de", 15, rng).split(" ")
        val digits = Array.fill(35)((100 + rng.nextInt(9900)).toString)
        val t = (words ++ digits).mkString(" ")
        page(host, t, "de", htmlOf(t), 1, 4, t)
      case "longdoc" =>
        val t = cleanText(lang, 280 + rng.nextInt(41), rng)
        page(host, t, lang, htmlOf(t), 1, 3, t)
      case "gibberish" =>
        val t = wordSalad(lang, 45 + rng.nextInt(16), rng)
        page(host, t, lang, htmlOf(t), 1, 11, t)
      case "buddy" =>
        val t = cleanText(lang, 130 + rng.nextInt(21), rng)
        page(host, t, lang, htmlOf(t), 1, 10, t)
      case "sctout" =>
        // moderate outlier: past sct's robust MAD z (2.2) but inside
        // buddy's floored mean/σ z — distinct detection bands by design
        val t = cleanText(lang, 72 + rng.nextInt(9), rng)
        page(host, t, lang, htmlOf(t), 1, 1, t)
      case "lonely" =>
        val t = base
        page(s"lonely-$id.example", t, lang, htmlOf(t), 1, 800, t)
      case "blacklisted" =>
        page(BlackDomain, base, lang, htmlOf(base), 1, 999, base)
      case "keepclean" =>
        // keep-listed long doc: dual/buddy would flag it, keep-list protects it
        val t = cleanText(lang, 280 + rng.nextInt(41), rng)
        page(KeepDomain, t, lang, htmlOf(t), 0, 990, t)
      case "pii" =>
        val t = base + " user" + id + "@mail.example 555-123-4567 123-45-6789"
        page(host, t, lang, htmlOf(t), 0, 0, Scrubber.scrubString(t))
      case "crossfield" =>
        // html present but impossibly shorter than its extracted text — the
        // two columns cannot disagree this way on a well-formed page (the
        // cross-variable inconsistency ccrrt.r:91-96 flags as 301)
        page(host, base, lang, "<p></p>".getBytes("UTF-8"), 1, 301, base)
      case "ngramspam" =>
        // SEO keyword-stuffing analog: a clean prefix plus one in-vocab
        // 2-word phrase repeated — word count, distinct ratio, stopwords,
        // and the LM all stay in the clean range; only the top-n-gram
        // repetition ceilings (503) see it. The phrase block pushes
        // rep_top2_frac to ~k/(n−1) ≈ 0.2–0.35 vs ≲ 2/vocab for windowed
        // clean text.
        val phrase = cleanText(lang, 2, rng)
        val t = (Seq(cleanText(lang, 20 + rng.nextInt(9), rng)) ++
          Seq.fill(12 + rng.nextInt(4))(phrase)).mkString(" ")
        page(host, t, lang, htmlOf(t), 1, 503, t)
      case "toxic" =>
        // lexicon words interspersed 1-per-5 through otherwise-clean text:
        // density ≈ 1/6 > the 0.10 ceiling, while word count, stopwords,
        // n-gram fractions, and langid stay in the clean band (the inserted
        // words are scattered singletons, not runs). The scrub masks them,
        // so expected_text goes through scrubString like the pii class.
        val lex = graft.functions.ScrubPatterns.ToxWords
        val words = cleanText(lang, 40 + rng.nextInt(11), rng).split(" ")
        val t = words.zipWithIndex.flatMap { case (w, i) =>
          if (i % 5 == 4) Seq(w, lex((i / 5) % lex.length)) else Seq(w)
        }.mkString(" ")
        page(host, t, lang, htmlOf(t), 1, 504, Scrubber.scrubString(t))
      case other => throw new IllegalArgumentException(other)
    }
  }

  /** Distributed deterministic generation: identical content at any
    * parallelism (pure function of id), so throughput runs at local[8] and
    * local[32] see byte-identical input.
    */
  def generate(spark: SparkSession, n: Long, seed: Long = 42L,
               classes: Seq[String] = AllClasses, defectPct: Int = 30): DataFrame = {
    import spark.implicits._
    spark.range(n).map(id => row(id, seed, classes, defectPct)).drop("clazz")
  }

  /** Deterministic clean exemplar texts for the sct_fg_dual pseudo-docs. */
  def exemplarTexts(k: Int = 6, seed: Long = 7L): Seq[String] = {
    val rng = new Random(seed)
    (0 until k).map(i => cleanText(Langs(i % Langs.length), 45, rng))
  }

  /** Generation including the defect-class name (test introspection). */
  def generateWithClass(spark: SparkSession, n: Long, seed: Long = 42L,
                        classes: Seq[String] = AllClasses, defectPct: Int = 30): DataFrame = {
    import spark.implicits._
    spark.range(n).map(id => row(id, seed, classes, defectPct)).toDF()
  }
}
