package graft.ml

import scala.collection.mutable

/** fastText-style character-n-gram language identifier (BASELINE.json
  * north_rule) — the webtext analog of the reference's broadcast gridded
  * "first guess" used to cross-check point data
  * (/root/reference/functions/IO/read_fgs.r:10-113): a small reference
  * model built once on the driver, broadcast to executors, and consulted
  * row-locally.
  *
  * Deterministic: profiles are char-trigram relative frequencies of fixed
  * seed corpora (public common words); scoring is a sparse cosine overlap.
  * No external data, no RNG.
  *
  * The per-row hot path (`detect`) never materializes the normalized text
  * or any trigram string: the normalizer is a char-level state machine
  * emitting 5-bit codes (space=0, a–z=1..26), trigrams pack into an int
  * < 27³, counts come from a sort + run-length scan of one int array, and
  * language weights live in one flat dense double array indexed by
  * [trigram·nLangs + lang]. `detectReference` keeps the original
  * string-based implementation as the executable spec (FeatureSpec asserts
  * same language and near-identical margins).
  */
final case class LangIdModel(profiles: Map[String, Map[String, Double]]) extends Serializable {

  // sorted ONCE per JVM (deterministic iteration order without re-sorting
  // per row); @transient so serialization ships only `profiles`
  @transient private lazy val sortedProfiles: Array[(String, Map[String, Double])] =
    profiles.toArray.sortBy(_._1)

  @transient private lazy val langNames: Array[String] = sortedProfiles.map(_._1)

  /** Flat dense weight table: weight of trigram key g for language i at
    * [g·nLangs + i]. 27³·nLangs doubles (~0.8 MB at 5 languages), built
    * once per JVM from the string-keyed profiles; absent trigrams are 0.0,
    * so a probe is one multiply-add with no branch or map lookup.
    */
  @transient private lazy val denseWeights: Array[Double] = {
    val nLangs = sortedProfiles.length
    val w = new Array[Double](27 * 27 * 27 * nLangs)
    var i = 0
    while (i < nLangs) {
      sortedProfiles(i)._2.foreach { case (g, v) =>
        require(g.length == 3, s"non-trigram profile key: '$g'")
        val key = ((LangId.code(g.charAt(0)) * 27) + LangId.code(g.charAt(1))) * 27 +
          LangId.code(g.charAt(2))
        w(key * nLangs + i) = v
      }
      i += 1
    }
    w
  }

  /** (bestLang, confidence) — confidence is the margin between the best and
    * second-best cosine score, so gibberish (all scores ≈ 0) gets low
    * confidence and is NOT reported as a confident detection.
    */
  def detect(text: String): (String, Double) = {
    if (text == null || text.isEmpty) return ("und", 0.0)
    val keys = LangId.trigramKeys(text)
    if (keys == null || keys.length == 0) return ("und", 0.0)
    java.util.Arrays.sort(keys)
    val nLangs = sortedProfiles.length
    val weights = denseWeights
    val dots = new Array[Double](nLangs)
    var sumSq = 0.0
    var i = 0
    while (i < keys.length) {
      val g = keys(i)
      var c = 1
      while (i + 1 < keys.length && keys(i + 1) == g) { c += 1; i += 1 }
      sumSq += c.toDouble * c
      val base = g * nLangs
      var j = 0
      while (j < nLangs) { dots(j) += c * weights(base + j); j += 1 }
      i += 1
    }
    val norm = math.sqrt(sumSq)
    var best = "und"; var bestS = 0.0; var second = 0.0
    var j = 0
    while (j < nLangs) {
      val dot = dots(j) / norm
      if (dot > bestS) { second = bestS; bestS = dot; best = langNames(j) }
      else if (dot > second) second = dot
      j += 1
    }
    if (bestS <= 0.0) ("und", 0.0) else (best, bestS - second)
  }

  /** Original string-based implementation — the executable spec for
    * `detect` (one probe of a merged string-keyed map per doc trigram).
    */
  def detectReference(text: String): (String, Double) = {
    if (text == null || text.isEmpty) return ("und", 0.0)
    val doc = LangId.profile(text)
    if (doc.isEmpty) return ("und", 0.0)
    val nLangs = sortedProfiles.length
    val dots = new Array[Double](nLangs)
    doc.foreach { case (g, w) =>
      val key = ((LangId.code(g.charAt(0)) * 27) + LangId.code(g.charAt(1))) * 27 +
        LangId.code(g.charAt(2))
      val base = key * nLangs
      var i = 0
      while (i < nLangs) { dots(i) += w * denseWeights(base + i); i += 1 }
    }
    var best = "und"; var bestS = 0.0; var second = 0.0
    var i = 0
    while (i < nLangs) {
      val dot = dots(i)
      if (dot > bestS) { second = bestS; bestS = dot; best = sortedProfiles(i)._1 }
      else if (dot > second) second = dot
      i += 1
    }
    if (bestS <= 0.0) ("und", 0.0) else (best, bestS - second)
  }
}

object LangId {

  /** Seed corpora: common words / short phrases per language (public
    * knowledge; ASCII-folded where needed for fixture compatibility).
    */
  val seeds: Map[String, String] = Map(
    "en" -> ("the quick brown fox jumps over the lazy dog and she said that it was good " +
      "to see them in the house with a friend of mine because people think water and time " +
      "are what they need for a long life in this world today with many other things"),
    "de" -> ("der schnelle braune fuchs springt ueber den faulen hund und sie sagte dass es " +
      "gut war sie im haus zu sehen mit einem freund von mir weil die leute denken dass " +
      "wasser und zeit das sind was sie brauchen fuer ein langes leben in dieser welt heute"),
    "fr" -> ("le renard brun rapide saute par dessus le chien paresseux et elle a dit que " +
      "c etait bien de les voir dans la maison avec un ami parce que les gens pensent que " +
      "l eau et le temps sont ce dont ils ont besoin pour une longue vie dans ce monde"),
    "es" -> ("el rapido zorro marron salta sobre el perro perezoso y ella dijo que era " +
      "bueno verlos en la casa con un amigo porque la gente piensa que el agua y el tiempo " +
      "son lo que necesitan para una larga vida en este mundo hoy con muchas otras cosas"),
    "it" -> ("la rapida volpe marrone salta sopra il cane pigro e lei ha detto che era " +
      "bello vederli nella casa con un amico perche la gente pensa che l acqua e il tempo " +
      "sono cio di cui hanno bisogno per una lunga vita in questo mondo oggi con molte cose"))

  /** 5-ish-bit char code of the normalized alphabet: space=0, a–z=1..26. */
  private[ml] def code(c: Char): Int = if (c == ' ') 0 else c - 'a' + 1

  /** Packed trigram keys of the normalized text — the allocation-light twin
    * of `profile`'s trigram enumeration: lowercase, [^a-z] → space,
    * collapse space runs, pad one space each side, then every consecutive
    * 3-gram packed as ((c0·27)+c1)·27+c2. Returns null when the normalized
    * text has no letters (profile() would be empty).
    */
  private[ml] def trigramKeys(text: String): Array[Int] = {
    val len = text.length
    var out = new Array[Int](math.min(math.max(len, 4), 1 << 16))
    var n = 0
    // c0/c1: previous two emitted codes; emitted: count so far (leading pad
    // space is emission #1)
    var c0 = 0; var c1 = 0; var emitted = 1; var anyLetter = false
    var lastWasSpace = true // the virtual leading pad space
    var i = 0
    while (i < len) {
      var c = text.charAt(i)
      if (c >= 'A' && c <= 'Z') c = (c + 32).toChar
      else if (c >= 128) c = Character.toLowerCase(c)
      if (c >= 'a' && c <= 'z') {
        val cc = c - 'a' + 1
        anyLetter = true
        emitted += 1
        if (emitted >= 3) {
          if (n == out.length) out = java.util.Arrays.copyOf(out, out.length * 2)
          out(n) = (c0 * 27 + c1) * 27 + cc; n += 1
        }
        c0 = c1; c1 = cc; lastWasSpace = false
      } else if (!lastWasSpace) {
        emitted += 1
        if (emitted >= 3) {
          if (n == out.length) out = java.util.Arrays.copyOf(out, out.length * 2)
          out(n) = (c0 * 27 + c1) * 27; n += 1
        }
        c0 = c1; c1 = 0; lastWasSpace = true
      }
      i += 1
    }
    if (!anyLetter) return null
    // trailing pad space (profile()'s " " suffix); if the text ended on a
    // separator the space was already emitted by the collapse above
    if (!lastWasSpace) {
      emitted += 1
      if (emitted >= 3) {
        if (n == out.length) out = java.util.Arrays.copyOf(out, out.length + 1)
        out(n) = (c0 * 27 + c1) * 27; n += 1
      }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** Char-trigram relative-frequency profile of lowercased, space-padded
    * text (the fastText subword analog).
    */
  // precompiled once: String.replaceAll recompiles its pattern per call
  private val NonAlpha = java.util.regex.Pattern.compile("[^a-z ]")
  private val MultiSpace = java.util.regex.Pattern.compile(" +")

  def profile(text: String): Map[String, Double] = {
    val s = " " + MultiSpace.matcher(
      NonAlpha.matcher(text.toLowerCase).replaceAll(" ")
    ).replaceAll(" ").trim + " "
    if (s.length < 3) return Map.empty
    val counts = mutable.HashMap.empty[String, Int]
    var i = 0
    while (i + 3 <= s.length) {
      val g = s.substring(i, i + 3)
      counts(g) = counts.getOrElse(g, 0) + 1
      i += 1
    }
    val norm = math.sqrt(counts.valuesIterator.map(c => c.toDouble * c).sum)
    counts.iterator.map { case (g, c) => g -> c / norm }.toMap
  }

  /** The default model, built once per JVM from the seed corpora. */
  lazy val default: LangIdModel =
    LangIdModel(seeds.map { case (lang, corpus) => lang -> profile(corpus) })

  // ---- exact-integer scoring form (oracle-gated twin of `detect`) ----

  /** Integer trigram counts of a text (same normalization + enumeration as
    * [[trigramKeys]]): sorted packed keys → (keys, counts, Σc²). Null when
    * the text has no letters.
    */
  private[ml] def trigramCounts(text: String): (Array[Int], Array[Long], Long) = {
    val keys = trigramKeys(text)
    if (keys == null || keys.length == 0) return null
    java.util.Arrays.sort(keys)
    val ks = new Array[Int](keys.length)
    val cs = new Array[Long](keys.length)
    var n = 0; var ssq = 0L; var i = 0
    while (i < keys.length) {
      val g = keys(i); var c = 1L
      while (i + 1 < keys.length && keys(i + 1) == g) { c += 1; i += 1 }
      ks(n) = g; cs(n) = c; n += 1; ssq += c * c
      i += 1
    }
    (java.util.Arrays.copyOf(ks, n), java.util.Arrays.copyOf(cs, n), ssq)
  }

  /** Per-language integer seed statistics: (lang, packed-trigram → count,
    * Σc²), langs sorted. The raw-count form of the [[default]] profiles —
    * integer dots against it are exact, which is what lets the scoring be
    * mirrored bit-for-bit in SQL ([[OracleSql.qLangIdExact]]).
    */
  lazy val exactSeedStats: Seq[(String, Map[Int, Long], Long)] =
    seeds.toSeq.sortBy(_._1).map { case (lang, corpus) =>
      val (ks, cs, ssq) = trigramCounts(corpus)
      (lang, ks.zip(cs).toMap, ssq)
    }

  /** Exact-arithmetic language detection over the seed profiles — the same
    * model as [[LangIdModel.detect]] (same trigrams, same seed corpora, same
    * cosine geometry) with the scoring reformulated so every intermediate is
    * either an exact integer or a fixed short chain of IEEE ops, mirrorable
    * bit-for-bit in SQL: per language, idot = Σ c_doc·c_seed (exact long),
    * s = idot / sqrt(Σc²_seed); winner = max s (ties → first language in
    * sorted order); confidence = (s₁ − s₂) / sqrt(Σc²_doc). Ordering by s is
    * ordering by cosine (the doc norm divides every language equally), so
    * the argmax agrees with `detect` up to float-roundoff ties; the margins
    * differ only by the scoring-order reformulation. FeatureSpec pins
    * argmax agreement on the fixture corpus.
    */
  def detectExact(text: String): (String, Double) = {
    if (text == null || text.isEmpty) return ("und", 0.0)
    val tc = trigramCounts(text)
    if (tc == null) return ("und", 0.0)
    val (ks, cs, docSsq) = tc
    var best = "und"; var bestS = 0.0; var second = 0.0
    exactSeedStats.foreach { case (lang, seedCounts, seedSsq) =>
      var idot = 0L; var i = 0
      while (i < ks.length) {
        seedCounts.get(ks(i)) match {
          case Some(c) => idot += cs(i) * c
          case None    =>
        }
        i += 1
      }
      if (idot > 0) {
        val s = idot.toDouble / math.sqrt(seedSsq.toDouble)
        if (s > bestS) { second = bestS; bestS = s; best = lang }
        else if (s > second) second = s
      }
    }
    if (bestS <= 0.0) ("und", 0.0)
    else (best, (bestS - second) / math.sqrt(docSsq.toDouble))
  }
}
