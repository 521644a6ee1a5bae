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
  */
final case class LangIdModel(profiles: Map[String, Map[String, Double]]) extends Serializable {

  // sorted ONCE per JVM (deterministic iteration order without re-sorting
  // per row); @transient so serialization ships only `profiles`
  @transient private lazy val sortedProfiles: Array[(String, Map[String, Double])] =
    profiles.toArray.sortBy(_._1)

  /** Trigram → per-language weight vector, merged once per JVM: scoring
    * probes ONE map per document trigram instead of one per language. The
    * per-language dot products accumulate in the same document-iteration
    * order as the per-language loop did, and skipping an absent trigram is
    * adding +0.0 to a non-negative sum — both bit-exact no-ops — so
    * detect() output is unchanged (the hot path is consulted once per row
    * by the fused model-feature UDF).
    */
  @transient private lazy val mergedProfiles: java.util.HashMap[String, Array[Double]] = {
    val m = new java.util.HashMap[String, Array[Double]]()
    var i = 0
    while (i < sortedProfiles.length) {
      sortedProfiles(i)._2.foreach { case (g, w) =>
        var arr = m.get(g)
        if (arr == null) { arr = new Array[Double](sortedProfiles.length); m.put(g, arr) }
        arr(i) = w
      }
      i += 1
    }
    m
  }

  /** (bestLang, confidence) — confidence is the margin between the best and
    * second-best cosine score, so gibberish (all scores ≈ 0) gets low
    * confidence and is NOT reported as a confident detection.
    */
  def detect(text: String): (String, Double) = {
    if (text == null || text.isEmpty) return ("und", 0.0)
    val doc = LangId.profile(text)
    if (doc.isEmpty) return ("und", 0.0)
    val nLangs = sortedProfiles.length
    val dots = new Array[Double](nLangs)
    doc.foreach { case (g, w) =>
      val arr = mergedProfiles.get(g)
      if (arr != null) {
        var i = 0
        while (i < nLangs) { dots(i) += w * arr(i); i += 1 }
      }
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
}
