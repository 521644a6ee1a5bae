package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFeatures

/** Deduplication operators for a large-scale training-data pipeline:
  * exact (hash groupBy), word-n-gram Jaccard, MinHash+LSH banding, and
  * SimHash bucketing. The reference's ingest-time spatial duplicate_check
  * (keep the first of near-coincident stations,
  * /root/reference/functions/IO/read_data_to_check.r:122-143) generalizes
  * to all of these: a cheap bucketing key first, exact confirmation second,
  * deterministic keeper selection (min id) third.
  *
  * Scale notes: every operator is groupBy/join-shaped (map-side combinable,
  * AQE-skew-splittable); none uses windows over unbounded key groups. The
  * shingle self-join prunes frequent shingles (stop-shingles) with a
  * configurable document-frequency cap, which bounds the candidate-pair
  * blowup the same way stopword removal bounds an inverted index.
  */
object Dedup {

  /** Exact dedup: keep the minimum-id row per normalized-text fingerprint.
    * Aggregation + broadcast-back semi-join — no window, skew-safe.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val withFp = df.withColumn("_fp", TextFeatures.fingerprint(col(textCol)))
    val keepers = withFp.groupBy("_fp").agg(min(col(idCol)).as(idCol))
    withFp.join(keepers, Seq("_fp", idCol), "left_semi").drop("_fp")
  }

  /** Distinct word n-gram shingles per doc: (id, shingle). The token array
    * is bound to its own projection first: a lambda that referenced the
    * `split` expression directly would re-evaluate it once per element
    * (higher-order functions get no common-subexpression elimination),
    * turning an O(words) explode into O(words²) string splitting.
    */
  def shingles(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame = {
    val w = col("_w")
    // sliding n-grams via transform over 0-based start indices; guarded so
    // a doc shorter than n words yields an empty list (Spark's `sequence`
    // would otherwise generate a DESCENDING range)
    val grams = when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n),
        i => concat_ws(" ", slice(w, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
    df.select(col(idCol), split(col(textCol), " ").as("_w"))
      .select(col(idCol), explode(array_distinct(grams)).as("shingle"))
  }

  /** Candidate near-dup pairs with exact n-gram Jaccard >= threshold.
    * Output: (id_a, id_b, inter, card_a, card_b, jaccard) with id_a < id_b.
    * `maxShingleDf` prunes shingles shared by more than that many docs.
    */
  def ngramJaccard(df: DataFrame, textCol: String, idCol: String,
                   n: Int = 3, threshold: Double = 0.6,
                   maxShingleDf: Int = 1000): DataFrame = {
    // materialize the shingle frame once (lazy local checkpoint): it feeds
    // the df-cap aggregate and the semi-join probe side — two scans that
    // would otherwise each re-run the explode
    val sh = shingles(df, textCol, idCol, n).localCheckpoint(false)
    // materialize the PRUNED frame too: it feeds both self-join sides and
    // the per-doc cardinalities (and the cards frame feeds two join sides),
    // so without a checkpoint the whole df-cap aggregation + its broadcast
    // build re-runs once per consumer — the measured plan had the
    // Scan→HashAggregate→Exchange→HashAggregate→BroadcastExchange subtree
    // FOUR times with zero exchange reuse
    // pre-partitioned by the self-join key BEFORE the checkpoint: a local
    // checkpoint preserves its plan's output partitioning, so both sides
    // of the shingle equi-join below read already-co-partitioned blocks
    // and the join plans with NO exchange — one shuffle of the shingle
    // frame here instead of two at the join (df-capped, so no hot key)
    val pruned = sh.join(
      sh.groupBy("shingle").agg(count(lit(1)).as("_df"))
        .filter(col("_df") <= maxShingleDf).select("shingle"),
      Seq("shingle"), "left_semi")
      .repartition(col("shingle")).localCheckpoint(false)
    val cards = pruned.groupBy(col(idCol)).agg(count(lit(1)).as("card"))

    val a = pruned.select(col(idCol).as("id_a"), col("shingle"))
    val b = pruned.select(col(idCol).as("id_b"), col("shingle"))
    val inter = a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))

    inter
      .join(cards.select(col(idCol).as("id_a"), col("card").as("card_a")), Seq("id_a"))
      .join(cards.select(col(idCol).as("id_b"), col("card").as("card_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("card_a") + col("card_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "inter", "card_a", "card_b", "jaccard")
  }

  /** Fixed-width "lines" of a document: non-overlapping `wordsPerLine`-word
    * chunks, numbered from 0. A web page's natural unit for corpus-level
    * near-dup removal is the line/paragraph (boilerplate navigation, cookie
    * banners, footers repeat across millions of pages); the driver corpus
    * carries no newlines, so the chunking boundary is a deterministic word
    * window — the operator is agnostic to how the boundary was produced.
    * Every doc yields at least one line (an empty text is one empty line),
    * so the reassembly below covers every input row.
    */
  def lines(df: DataFrame, textCol: String, idCol: String,
            wordsPerLine: Int): DataFrame = {
    val w = col("_w")
    val nLines = ceil(size(w) / lit(wordsPerLine.toDouble)).cast("int")
    df.select(col(idCol), split(col(textCol), " ").as("_w"))
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), nLines - 1),
          i => concat_ws(" ", slice(w, i * wordsPerLine + 1, lit(wordsPerLine)))))
        .as(Seq("line_no", "line")))
  }

  /** Corpus-level line dedup (the CCNet/RefinedWeb shape): a line occurrence
    * survives only if it is the FIRST occurrence of that line in the whole
    * corpus — minimum doc id, then minimum line number within that doc —
    * mirroring the reference's keep-the-first duplicate semantics
    * (read_data_to_check.r:122-143) one level below the document. Output is
    * one row per input doc: total lines, surviving lines, and the md5 of the
    * newline-reassembled surviving text (order-preserving).
    *
    * Scale shape: explode → groupBy(line fingerprint) with a min(struct)
    * aggregate (map-side combinable; the lexicographic struct min IS the
    * keeper rule) → semi join back → per-doc reassembly whose state is
    * bounded by the doc's own line count. No windows, no all-pairs.
    */
  def lineDedup(df: DataFrame, textCol: String, idCol: String,
                wordsPerLine: Int = 10): DataFrame = {
    // materialized once: feeds the keeper aggregate and the keeper-mark
    // join probe side
    val ln = lines(df, textCol, idCol, wordsPerLine)
      .withColumn("_lfp", md5(col("line")))
      .localCheckpoint(false)
    val keep = ln.groupBy("_lfp")
      .agg(min(struct(col(idCol), col("line_no"))).as("_k"))
      .select(col("_lfp"), col(s"_k.$idCol").as(idCol),
        col("_k.line_no").as("line_no"))
    // ONE per-doc aggregation computes totals, survivor count and the
    // reassembled fingerprint together: mark each line occurrence by a
    // left join against the keeper table (exactly one keeper row per
    // _lfp, so multiplicity is preserved), then count rows and marks and
    // collect only the marked lines (collect_list skips nulls; a doc with
    // zero survivors yields the empty-string md5, exactly the old
    // coalesce fallback). The previous shape aggregated the line frame
    // twice (survivors and totals separately) and joined the two back.
    val marked = ln.join(keep.withColumn("_keep", lit(1)),
      Seq("_lfp", idCol, "line_no"), "left")
    marked.groupBy(col(idCol)).agg(
        count(lit(1)).as("n_lines"),
        count(col("_keep")).as("n_kept"),
        md5(concat_ws("\n",
          transform(array_sort(collect_list(
            when(col("_keep") === 1, struct(col("line_no"), col("line"))))),
            s => s("line")))).as("kept_fp"))
      .select(col(idCol), col("n_lines"), col("n_kept"), col("kept_fp"))
  }

  /** Benchmark decontamination: flag corpus documents sharing any word
    * n-gram with a benchmark/eval set (the GPT-3/Llama training-data
    * hygiene step). Returns one row per CONTAMINATED corpus doc with the
    * contaminated-shingle count, the doc's distinct-shingle cardinality,
    * and their ratio.
    *
    * Scale shape: the benchmark side is eval suites — thousands of docs,
    * ~10⁵ distinct shingles at 100 TB corpus scale — so its distinct
    * shingle set is BROADCAST and the corpus-side probe is a map-local
    * semi join on the exploded shingles; the only shuffle is the per-doc
    * count aggregate (map-side combinable).
    */
  def decontaminate(corpus: DataFrame, bench: DataFrame,
                    textCol: String, idCol: String, n: Int = 3): DataFrame = {
    val cs = shingles(corpus, textCol, idCol, n)
    val bs = shingles(bench, textCol, idCol, n).select("shingle").distinct()
    // ONE aggregation pass computes both the per-doc cardinality and the
    // contaminated-shingle count: mark each corpus shingle by a broadcast
    // left join against the (distinct, so multiplicity-preserving)
    // benchmark set, then count rows and marks together. The previous
    // two-aggregate + join shape scanned the shingle frame twice and paid
    // a third join to reunite the counts — and needed the shingle frame
    // checkpointed to avoid re-running the explode, which this single-
    // consumer shape no longer does.
    val marked = cs.join(broadcast(bs.withColumn("_hit", lit(1))),
      Seq("shingle"), "left")
    marked.groupBy(col(idCol)).agg(
        count(lit(1)).as("n_shingles"), count(col("_hit")).as("n_contam"))
      .filter(col("n_contam") > 0)
      .withColumn("contam_frac",
        col("n_contam").cast("double") / col("n_shingles").cast("double"))
      .select(idCol, "n_contam", "n_shingles", "contam_frac")
  }

  /** MinHash signature components: for permutation i, the minimum md5 of
    * (i || '#' || shingle) — lexicographic min of a keyed cryptographic
    * hash is a valid minwise permutation and is portable to the SQL oracle
    * (md5 is identical in Spark and DuckDB).
    */
  def minhashSignature(df: DataFrame, textCol: String, idCol: String,
                       n: Int, numHashes: Int): DataFrame = {
    val sh = shingles(df, textCol, idCol, n)
    val aggs = (0 until numHashes).map(i =>
      min(md5(concat(lit(s"$i#"), col("shingle")))).as(s"mh$i"))
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash-LSH CANDIDATE pairs (no similarity confirm — callers wanting
    * exact Jaccard feed the candidates into a confirm join or use
    * `ngramJaccard`): band the signature, bucket-join within bands, dedup
    * pairs. Docs agreeing on all rows of any band are candidates
    * (id_a < id_b).
    *
    * `maxBucketSize` is the hot-bucket bound: a (band, key) bucket holding
    * B docs contributes B·(B−1)/2 candidate pairs, so ONE popular bucket —
    * template/boilerplate pages all sharing a minimum shingle-hash,
    * especially at rowsPerBand = 1 where a band key is a single min-hash —
    * goes quadratic at corpus scale. Buckets above the cap are dropped
    * before the self-join (the same stop-key move as ngramJaccard's
    * `maxShingleDf`): a bucket that big is boilerplate, not near-dup
    * signal, and exact-confirm downstream would reject its pairs anyway.
    * RECALL CONTRACT: pairs whose every agreeing band lands in a dropped
    * bucket are missed; pass Int.MaxValue for the exact uncapped variant.
    */
  def minhashLsh(df: DataFrame, textCol: String, idCol: String,
                 n: Int = 3, bands: Int = 4, rowsPerBand: Int = 2,
                 maxBucketSize: Int = 1000): DataFrame = {
    // Materialize the signature once (lazy local checkpoint: computed at the
    // first action, reused by the cap aggregate and both join sides), then
    // explode all band keys in ONE pass and bucket-join once on (band, key)
    // — the per-band-join form recomputed the whole shingle aggregation
    // 2×bands times.
    val sig = minhashSignature(df, textCol, idCol, n, bands * rowsPerBand)
      .localCheckpoint(false)
    val bandKeys = (0 until bands).map { b =>
      concat_ws("#", (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}")): _*)
    }
    val keyed = sig.select(col(idCol),
      posexplode(array(bandKeys: _*)).as(Seq("band", "bkey")))
    val small = keyed.groupBy("band", "bkey").agg(count(lit(1)).as("_bsz"))
      .filter(col("_bsz") <= maxBucketSize).select("band", "bkey")
    // checkpointed: both self-join sides read it, and without this the
    // hot-bucket aggregation + its broadcast build run once per side
    // (same duplicated-subtree shape as ngramJaccard's pruned frame).
    // NOT pre-partitioned by the band key (unlike ngramJaccard's pruned):
    // the banded frame is rowsPerBand-fold smaller than the shingle frame
    // and its self-join broadcasts, so a pre-shuffle adds an exchange
    // without removing one (measured: a small regression)
    val pruned = keyed.join(small, Seq("band", "bkey"), "left_semi")
      .localCheckpoint(false)
    val l = pruned.select(col("band"), col("bkey"), col(idCol).as("id_a"))
    val r = pruned.select(col("band"), col("bkey"), col(idCol).as("id_b"))
    l.join(r, Seq("band", "bkey")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Portable 16-bit SimHash over whitespace tokens: each token's md5 first
    * 4 hex nibbles give 16 bits; per bit, sum (2·bit − 1) over tokens; the
    * sign picks the output bit. Pure integer arithmetic, bit-identical in
    * the SQL oracle. (A 64-bit variant is a constant change; 16 bits keeps
    * the oracle SQL readable.)
    */
  def simhash16(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tok = df.select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .withColumn("h", md5(col("w")))
    def nibble(pos: Int): Column =
      (0 until 16).foldLeft(lit(0)) { (acc, v) =>
        when(substring(col("h"), pos + 1, 1) === "0123456789abcdef".charAt(v).toString,
          lit(v)).otherwise(acc)
      }
    val withBits = (0 until 4).foldLeft(tok)((d, j) => d.withColumn(s"nib$j", nibble(j)))
    val sums = (0 until 16).map { b =>
      val nib = col(s"nib${b / 4}")
      val bit = floor(nib / math.pow(2, b % 4).toInt).cast("int") % 2
      sum(bit * 2 - 1).as(s"s$b")
    }
    val agg = withBits.groupBy(col(idCol)).agg(sums.head, sums.tail: _*)
    val hash = (0 until 16).map { b =>
      when(col(s"s$b") > 0, lit(1 << b)).otherwise(lit(0))
    }.reduce(_ + _)
    agg.select(col(idCol), hash.as("simhash"))
  }

  /** Embedding-cosine near-dup dedup: LSH-bucketed candidate pairs
    * confirmed by exact cosine (Similarity.annPairs), then greedy keeper
    * selection — every id that appears as the larger member of a confirmed
    * pair is dropped, so the minimum id of each near-dup cluster survives
    * (the reference's duplicate_check keeps the first of near-coincident
    * stations the same way, read_data_to_check.r:134-139). Anti join, no
    * window, skew-safe.
    */
  def embeddingNearDup(df: DataFrame, vecCol: String, idCol: String,
                       nPlanes: Int = 8, threshold: Double = 0.9): DataFrame = {
    val drops = Similarity.annPairs(df, vecCol, idCol, nPlanes, threshold)
      .select(col("id_b").as(idCol)).distinct()
    df.join(drops, Seq(idCol), "left_anti")
  }

  /** SimHash near-dup candidate pairs: equal-bucket join (id_a < id_b).
    * 16-bit form — only 65 536 buckets, so the within-bucket join goes
    * quadratic on a real corpus; `simhashPairs64` below is the scale form.
    */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val h = simhash16(df, textCol, idCol)
    val l = h.select(col("simhash"), col(idCol).as("id_a"))
    val r = h.select(col("simhash"), col(idCol).as("id_b"))
    l.join(r, Seq("simhash")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "simhash")
  }

  /** Portable 64-bit SimHash, exposed as four 16-bit words sh0..sh3 (word j
    * = bits 16j..16j+15; four ints sidestep BIGINT sign pitfalls in the SQL
    * oracle while carrying the full 64 bits). Same md5-nibble construction
    * as simhash16, over the first 16 nibbles of each token's md5 — but
    * computed by ONE native single-pass expression per row
    * (functions/SimHash64Expr): no token explode, no 64-aggregate shuffle.
    * Docs with zero non-empty tokens produce no row (exploded-form parity).
    */
  def simhash64(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val sig = org.apache.spark.sql.GraftColumns.of(
      graft.functions.SimHash64Expr(
        org.apache.spark.sql.GraftColumns.exprOf(col(textCol))))
    df.select(col(idCol), sig.as("_sig"))
      .filter(col("_sig.ntok") > 0)
      .select(col(idCol), col("_sig.sh0").as("sh0"), col("_sig.sh1").as("sh1"),
        col("_sig.sh2").as("sh2"), col("_sig.sh3").as("sh3"))
  }

  /** Banded 64-bit SimHash near-dup pairs — the 100 TB shape: explode the
    * four 16-bit bands, bucket-equi-join on (band, key) (pigeonhole: two
    * hashes within hamming distance 3 must agree on at least one of 4
    * bands), dedup candidates, then confirm with the exact hamming distance
    * over the full 64 bits. 4×65 536 buckets per band and candidates bounded
    * by true near-dups + band-collisions — never all-pairs.
    *
    * RECALL CONTRACT: with 4 bands the pigeonhole guarantee only covers
    * hamming ≤ 3 — a pair at distance 4..6 differing in all four bands
    * would be silently missed — so `maxHamming` is required ≤ 3. Callers
    * wanting a larger radius must raise the band count (bands > maxHamming)
    * rather than widen the confirm filter.
    */
  def simhashPairs64(df: DataFrame, textCol: String, idCol: String,
                     maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      s"maxHamming=$maxHamming exceeds the 4-band pigeonhole recall guarantee (<= 3)")
    // materialize the signature once: it feeds both join sides + the confirm
    val h = simhash64(df, textCol, idCol).localCheckpoint(false)
    val keyed = h.select(col(idCol),
      posexplode(array((0 until 4).map(j => col(s"sh$j")): _*)).as(Seq("band", "bkey")))
    val l = keyed.select(col("band"), col("bkey"), col(idCol).as("id_a"))
    val r = keyed.select(col("band"), col("bkey"), col(idCol).as("id_b"))
    val cands = l.join(r, Seq("band", "bkey")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val ha = h.select(col(idCol).as("id_a") +: (0 until 4).map(j => col(s"sh$j").as(s"_a$j")): _*)
    val hb = h.select(col(idCol).as("id_b") +: (0 until 4).map(j => col(s"sh$j").as(s"_b$j")): _*)
    val hamming = (0 until 4).map(j =>
      call_function("bit_count", col(s"_a$j").bitwiseXOR(col(s"_b$j"))).cast("int"))
      .reduce(_ + _)
    cands.join(ha, Seq("id_a")).join(hb, Seq("id_b"))
      .withColumn("hamming", hamming)
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
