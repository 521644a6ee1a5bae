package graft.stages

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.{BuddyParams, CascadeConfig, DualParams, FlagCodes, SctParams}

/** The neighborhood ("buddy"/SCT) check family — TITAN's core
  * (SURVEY.md §2.4). A document's neighborhood is its registered domain
  * (the provider analog); each check compares a per-document statistic
  * against an aggregate of its *alive* neighbors, excluding itself
  * (leave-one-out, like the reference kernel's self-exclusion in
  * /root/reference/functions/misc/statistics_util.r:15-98).
  *
  * Scale design — deliberately NOT `Window.partitionBy(domain)`:
  * neighborhood statistics are computed with a two-level (salted)
  * `groupBy` — partial sums per (domain, salt(url)) then merge per domain —
  * and joined back with an equi-join whose physical form is chosen from
  * the MEASURED group cardinality ([[statsJoinForm]]): broadcast while the
  * dimension fits (no corpus shuffle at all), genuine sort-merge + AQE
  * skew split at the 10⁷–10⁸-domain scale where broadcast is impossible.
  * Map-side combine plus the salt level means a giant host domain (50% of
  * a 100 TB corpus on one key) never lands on a single reducer, which
  * `Window.partitionBy(domain)` would force. Leave-one-out aggregates are
  * recovered algebraically from (sum, sumsq, count), so no per-row window
  * pass is ever needed.
  *
  * All sums are over integer features (exact in both Spark and the DuckDB
  * oracle); doubles appear only in the final z-score arithmetic, with the
  * operation order fixed so both engines produce bit-identical IEEE values.
  */
object Neighborhood {
  import Cols._

  /** Exact per-domain (sum, sumsq, count) of `x` (an integral column) over
    * reference-eligible rows, via two-level salted aggregation.
    *
    * `maxRefs` (the reference's neighbor cap, `num_max_outer`,
    * /root/reference/functions/checks/buddy.r:46,154-167) bounds how many
    * rows a giant group contributes to its own statistics: when some group
    * exceeds the cap, a per-group deterministic hash-sampling rate
    * min(1, cap/n) thins it, so a 10M-doc host is judged against a
    * fixed-size, reproducible subsample instead of all 10M rows.
    *
    * FUSED capped mode (optimization round 6): the old shape always paid
    * TWO corpus passes — a count pass for the per-group sizes, then the
    * stats pass over the sampled corpus (plus a join of the corpus against
    * the cap table and a join of the stats against it). But sampling only
    * CHANGES anything when some group actually exceeds the cap; below it,
    * `inSampleCond` is vacuously true and the sampled corpus IS the corpus.
    * So one fused two-level aggregation over the eligible rows now yields
    * the stats (_s,_q,_n) AND the pre-cap group sizes (_gn) together; a
    * driver-side max over the (checkpointed, group-sized) result decides
    * whether any group binds the cap. If none does — every oracle SF, and
    * any corpus whose largest host sits under the cap — the fused frame is
    * the exact answer (bit-identical: same integer sums over the same
    * rows). Only when the cap genuinely binds does the sampling pass run,
    * reusing the counts already in hand — same two-pass cost as before,
    * in the regime that actually needs it.
    */
  def groupStats(df: DataFrame, x: Column, cfg: CascadeConfig,
                 refFilter: Column = Stage.referenceEligible,
                 keys: Seq[String] = Seq(Domain)): DataFrame = {
    val keyCols = keys.map(col)
    def saltCol = pmod(col(UrlHash), lit(cfg.saltBuckets.max(1))).as("_salt")
    // _n == 0 groups (present in df but with no reference-eligible row, or
    // eligible rows whose x is null) are dropped: the left join back yields
    // nulls for them, which every consumer's null-guarded math treats
    // exactly like a present-but-empty stats row — and keeping them would
    // let the broadcast table silently outgrow the measured ELIGIBLE-group
    // cardinality that statsJoinForm's driver-OOM guard is based on (a
    // heavily-flagged corpus can have far more domains than
    // reference-eligible domains).
    def mergedStats(base: DataFrame, xl: Column): DataFrame =
      base
        .groupBy(keyCols :+ saltCol: _*)
        .agg(sum(xl).as("_ps"), sum(xl * xl).as("_pq"), count(xl).as("_pn"))
        .groupBy(keyCols: _*)
        .agg(sum("_ps").as("_s"), sum("_pq").as("_q"), sum("_pn").as("_n"))
        .filter(col("_n") > 0)
    cfg.maxRefsPerGroup match {
      case None =>
        joinReady(mergedStats(df, when(refFilter, x.cast("long"))), cfg)
      case Some(cap) =>
        // ONE pass: stats and pre-cap group sizes from the same aggregation
        // (x may be null on an eligible row — _n counts non-null x only,
        // _gn counts every eligible row, exactly like the old count pass)
        val xl = x.cast("long")
        val fused = graft.cascade.Cascade.materialize(
          df.filter(refFilter)
            .groupBy(keyCols :+ saltCol: _*)
            .agg(sum(xl).as("_ps"), sum(xl * xl).as("_pq"),
              count(xl).as("_pn"), count(lit(1)).as("_pg"))
            .groupBy(keyCols: _*)
            .agg(sum("_ps").as("_s"), sum("_pq").as("_q"),
              sum("_pn").as("_n"), sum("_pg").as("_gn")))
        // one driver action measures the group cardinality (drives the join
        // form) AND whether any group exceeds the cap
        df.sparkSession.sparkContext.setJobDescription(
          s"stats: fused agg+ckpt (${keys.mkString(",")})")
        val head = fused.agg(count(lit(1)), max("_gn")).head()
        df.sparkSession.sparkContext.setJobDescription(null)
        val nGroups = head.getLong(0)
        val maxGn = if (nGroups == 0 || head.isNullAt(1)) 0L else head.getLong(1)
        if (maxGn <= cap) {
          // no group binds the cap: the unsampled stats ARE the capped
          // stats, and _gn (carried so consumers can re-derive per-row
          // sample membership for the LOO terms) rides along for free
          statsJoinForm(fused.filter(col("_n") > 0), nGroups, cfg)
        } else {
          // the cap binds somewhere: deterministic proportional thinning —
          // keep row iff its url hash falls under cap/n of the hash space
          // (exact at any parallelism) — reusing the counts already in hand
          val capReady = statsJoinForm(fused.select(keyCols :+ col("_gn"): _*),
            nGroups, cfg)
          val sampled = df.join(capReady, keys, "left")
            .filter(col("_gn").isNull || inSampleCond(cap, col("_gn")))
            .drop("_gn")
          val merged = mergedStats(sampled, when(refFilter, x.cast("long")))
          statsJoinForm(merged.join(capReady, keys, "left"), nGroups, cfg)
        }
    }
  }

  /** Choose the physical form of a per-group stats table's join against the
    * corpus, from its MEASURED cardinality — instead of leaving the choice
    * to the optimizer, which cannot know it statically (the table sits
    * behind an aggregation over a checkpoint of unknown size) and whose
    * adaptive fallback has a pathological failure mode here. Measured on
    * the 4M-doc scaling corpus (event logs, local[2]/local[8]): AQE's
    * mid-flight SortMergeJoin→BroadcastHashJoin conversion first
    * materializes the probe-side exchange — a full corpus shuffle WRITE per
    * stats join, hash-partitioned on the zipf-skewed group key — and then
    * sometimes reads it reduce-side instead of map-locally, baking a
    * 60 %-of-rows partition into the materialized stage and EVERY
    * downstream checkpoint that inherits its partitioning (all local-read
    * map-side stages preserve layout). The result was two buddy-iteration
    * jobs bound by a single 54.5 s straggler task each — invisible at 2
    * cores (everything queues anyway), the entire scaling deficit at 8+.
    *
    * With the cardinality in hand the choice is static and safe in both
    * regimes: at or below [[CascadeConfig.statsBroadcastMaxGroups]] the
    * stats side is broadcast — the corpus side then has NO exchange at all
    * (no shuffle write, no skew, layout inherited from the balanced scan);
    * above it (10⁷–10⁸ registered domains at 100 TB) the join stays a real
    * SMJ, which AQE's skew split (GraftSession: 32 MB threshold) splits
    * into advisory-sized chunks — balanced again, and no mid-flight
    * conversion can occur because the stats side is far above the
    * auto-broadcast threshold. Reference analog: the reference holds its
    * station metadata in memory per provider (read_data_to_check.r) — the
    * broadcast regime — while this engine must also survive the regime
    * where the dimension itself is distributed.
    */
  private[stages] def statsJoinForm(stats: DataFrame, nGroups: Long,
                                    cfg: CascadeConfig): DataFrame =
    if (nGroups <= cfg.statsBroadcastMaxGroups) broadcast(stats)
    else sizeDiscovered(stats)

  /** [[statsJoinForm]] for a stats frame whose cardinality is not yet
    * known: checkpoint it (so the measuring count and the join read one
    * computation) and count it. The checkpoint blocks are registered while
    * the enclosing stage builds, so Cascade.run's reap chain releases them
    * with the stage's own materialization.
    */
  private[stages] def joinReady(stats: DataFrame, cfg: CascadeConfig): DataFrame = {
    val ck = graft.cascade.Cascade.materialize(stats)
    stats.sparkSession.sparkContext.setJobDescription("stats: ckpt+count")
    val n = ck.count()
    stats.sparkSession.sparkContext.setJobDescription(null)
    statsJoinForm(ck, n, cfg)
  }

  /** SMJ-regime half of [[statsJoinForm]]: materialize the stats table as
    * its own round-robin shuffle stage so AQE sees its true size and
    * shape. Kept for the web-scale branch only — the broadcast regime is
    * now chosen statically from the measured cardinality, because relying
    * on AQE's runtime conversion here was actively harmful (it still
    * materialized the corpus-side probe exchange it had planned for the
    * SMJ — a full corpus shuffle write per stats join, hash-partitioned on
    * the zipf-skewed group key — and could then read it reduce-side,
    * propagating a 60 %-of-rows partition into every downstream
    * checkpoint; see statsJoinForm). Round-robin, NOT repartition(keys):
    * the subtree is typically already hash(keys)-partitioned, so a
    * same-key repartition is elided as redundant by Catalyst and discovers
    * nothing (measured: the hash form left the plan unchanged).
    */
  private[stages] def sizeDiscovered(stats: DataFrame): DataFrame =
    stats.repartition(
      stats.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt)

  private val SampleMod = 1000000L

  /** Deterministic membership test for the neighbor-cap subsample: a pure
    * function of (url, group size, cap), identical wherever re-evaluated.
    */
  def inSampleCond(cap: Int, gn: Column): Column =
    gn <= cap ||
      pmod(xxhash64(col(UrlHash), lit("refcap")), lit(SampleMod)) * gn < lit(cap.toLong) * lit(SampleMod)

  /** Per-row "my own value is inside the group statistics" indicator; true
    * everywhere in uncapped mode.
    */
  private[stages] def selfInSample(cfg: CascadeConfig): Column = cfg.maxRefsPerGroup match {
    case None      => lit(true)
    case Some(cap) => coalesce(inSampleCond(cap, col("_gn")), lit(false))
  }

  private def dropStatCols(df: DataFrame, names: String*): DataFrame =
    df.drop(names :+ "_gn": _*)

  /** Buddy check (code 10). Reference: functions/checks/buddy.r — each
    * checked observation vs mean ± sd of its neighbors; here the per-doc
    * word count vs its domain's leave-one-out mean/sd. The titanlib-kernel
    * math (neighbors' mean/sd, self excluded) is spelled out in the legacy
    * in-repo kernel statistics_util.r:15-98.
    *
    * Honors priority rounds (buddy.r:112-155): descending priority classes;
    * a round's references are alive rows with prio >= the class, checked
    * rows are the class itself. With no priorities configured this is a
    * single round over everything.
    *
    * Honors the reference's multi-test-configuration loop (the `j` loop,
    * buddy.r:101; ini pairs test/ini/rr1_buddy.ini:16-20): when
    * `cfg.buddyParams` lists several (minN, z) configurations they are
    * folded in order, each seeing the flags the previous one stamped.
    */
  def buddyOnce(df: DataFrame, cfg: CascadeConfig): DataFrame = {
    val configs =
      if (cfg.buddyParams.nonEmpty) cfg.buddyParams
      else Seq(BuddyParams(cfg.buddyMinN, cfg.buddyZ))
    configs.zipWithIndex.foldLeft(df) { case (d, (p, i)) =>
      // materialize between configurations: each round's stats pass scans
      // its input twice, and folding rounds over a lazy plan compounds
      val in = if (i == 0) d else graft.cascade.Cascade.materialize(d)
      buddyConfigRound(in, cfg, p)
    }
  }

  private def buddyConfigRound(df: DataFrame, cfg: CascadeConfig, params: BuddyParams): DataFrame = {
    val prios = cfg.priorities.values.toSet + 0
    if (prios.size == 1) buddyRound(df, cfg, params, None)
    else prios.toSeq.sorted(Ordering[Int].reverse)
      .foldLeft(df)((d, p) => buddyRound(d, cfg, params, Some(p)))
  }

  private def buddyRound(df: DataFrame, cfg: CascadeConfig, params: BuddyParams,
                         prioClass: Option[Int]): DataFrame = {
    val refFilter = prioClass match {
      case Some(p) => Stage.referenceEligible && col(Prio) >= p
      case None    => Stage.referenceEligible
    }
    // stats table: one row per buddy-key group; join form chosen from the
    // measured cardinality inside groupStats (statsJoinForm) — broadcast
    // while it fits, genuine SMJ + AQE skew split at the 10⁷–10⁸-domain
    // scale where an unconditional broadcast would OOM the driver.
    // optional variance-stabilizing transform before the z test: word-count
    // distributions are heavy-tailed like the reference's precipitation, and
    // the reference boxcoxes values before its gaussian checks
    // (misc/statistics_util.r:101-107 used in checks/buddy.r:87-93). A
    // fixed-point log1p (×1000, rounded) keeps the statistic integral so the
    // exact two-level aggregation machinery applies unchanged.
    val xv: Column =
      if (cfg.buddyLog1p) round(log1p(col(NWords).cast("double")) * 1000.0).cast("long")
      else col(NWords).cast("long")
    val stats = groupStats(df, xv, cfg, refFilter, keys = cfg.buddyKeys)
    val joined = df.join(stats, cfg.buddyKeys, "left")

    val x = xv
    val (minN, zThresh) = (lit(params.minN), lit(params.z))
    // σ floor (see CascadeConfig.buddySdFloor); applied after the LOO sd so
    // a near-degenerate group can't manufacture z from noise
    def floored(sd: Column): Column =
      if (cfg.buddySdFloor > 0) greatest(sd, lit(cfg.buddySdFloor)) else sd
    val (mean, sd, looN) =
      if (cfg.maxRefsPerGroup.isEmpty) {
        val nn   = (col("_n") - lit(1)).cast("double")        // leave-one-out count
        val mean = when(nn > 0, (col("_s") - x).cast("double") / nn)
        val vr   = when(col("_n") > 2,
          ((col("_q") - x * x).cast("double") - nn * mean * mean) /
            (col("_n") - lit(2)).cast("double"))
        (mean, floored(sqrt(greatest(vr, lit(0.0)))), col("_n") - lit(1))
      } else {
        // neighbor-cap mode: only subtract self if self was sampled into
        // the group statistics (otherwise the LOO algebra double-corrects)
        val selfIn = selfInSample(cfg)
        val xs = when(selfIn, x).otherwise(lit(0L))
        val ns = when(selfIn, lit(1L)).otherwise(lit(0L))
        val m    = (col("_n") - ns).cast("double")
        val mean = when(m > 0, (col("_s") - xs).cast("double") / m)
        val vr   = when(m > 1,
          ((col("_q") - xs * xs).cast("double") - m * mean * mean) / (m - 1.0))
        (mean, floored(sqrt(greatest(vr, lit(0.0)))), (col("_n") - ns).cast("int"))
      }
    val z = when(sd > 0, (x.cast("double") - mean) / sd)

    val inClass = prioClass.map(p => col(Prio) === p).getOrElse(lit(true))
    val fail = inClass &&
      looN >= minN && sd > 0.0 && abs(z) > zThresh
    dropStatCols(
      Stage.sticky(joined, fail, FlagCodes.Buddy, flagsKeep = false),
      "_s", "_q", "_n")
  }

  /** Exact per-group central order statistics of an integral column over
    * `alive` rows, computed scale-safely: groupBy (keys, value) counts —
    * fully map-side combinable and skew-proof, because the grouping key is
    * strictly finer than the group — then one pass over the per-group
    * sorted (value, count) histogram. Per-group state is bounded by the
    * number of DISTINCT values (word counts: ~10⁴), never by row count —
    * unlike Spark's exact `percentile`, whose buffer grows with the group.
    *
    * Returns keys ++ (_m0, _m1, _m2, _n): the values at 0-based ranks
    * L, L+1, L+2 where L = floor((n-2)/2) — exactly the three central
    * order statistics needed for both the interpolated population median
    * (DuckDB quantile_cont semantics) and the leave-one-out median.
    */
  def centralOrderStats(df: DataFrame, keys: Seq[String], x: Column,
                        alive: Column): DataFrame = {
    val keyCols = keys.map(col)
    val v = when(alive, x.cast("long"))
    val hist = df.groupBy(keyCols :+ v.as("_v"): _*).agg(count(v).as("_c"))
      .filter(col("_c") > 0)
    val g = hist.groupBy(keyCols: _*).agg(
      sort_array(collect_list(struct(col("_v"), col("_c")))).as("_h"),
      sum("_c").as("_n"))
    // 0-based target ranks (doubles are exact for any realistic count)
    val rank0 = floor((col("_n") - lit(2)).cast("double") / 2.0).cast("long")
    val walked = aggregate(col("_h"),
      struct(lit(0L).as("cum"),
        lit(null).cast("long").as("m0"),
        lit(null).cast("long").as("m1"),
        lit(null).cast("long").as("m2")),
      (acc, e) => {
        val cum2 = acc.getField("cum") + e.getField("_c")
        def pick(cur: Column, rk: Column) =
          when(cur.isNull && cum2 > rk, e.getField("_v")).otherwise(cur)
        struct(cum2.as("cum"),
          pick(acc.getField("m0"), rank0).as("m0"),
          pick(acc.getField("m1"), rank0 + 1).as("m1"),
          pick(acc.getField("m2"), rank0 + 2).as("m2"))
      })
    g.select(keyCols ++ Seq(
      walked.getField("m0").as("_m0"),
      walked.getField("m1").as("_m1"),
      walked.getField("m2").as("_m2"),
      col("_n").as("_n")): _*)
  }

  /** SCT-resistant analog (code 1): robust z-score — the doc's deviation
    * from its neighborhood's *leave-one-out* median, in MAD units
    * ("resistant" = robust estimators, the spirit of the reference's
    * resistant elaborations, functions/checks/sct_resistant.r:158-204;
    * self-exclusion as in the kernel statistics_util.r:15-98).
    *
    * The LOO median needs only the three central order statistics
    * m0,m1,m2 (ranks L,L+1,L+2, L = floor((n-2)/2)) of the alive group:
    * removing one value x from n sorted values leaves medians
    *   n even: m1 if x ≤ m0 else m0
    *   n odd : (m1+m2)/2 if x ≤ m0; (m0+m1)/2 if x ≥ m2; else (m0+m2)/2
    * The MAD is the interpolated median of |x − popMedian| over alive rows
    * (population median = (v[⌊(n−1)/2⌋]+v[⌊n/2⌋])/2, derived from the same
    * statistics). All arithmetic stays on half-integers — exact in IEEE
    * doubles — so the DuckDB oracle matches bit-for-bit. No broadcast
    * hints and no window: two histogram aggregations plus equi-joins.
    */
  def sctOnce(df: DataFrame, cfg: CascadeConfig): DataFrame = {
    val configs =
      if (cfg.sctParams.nonEmpty) cfg.sctParams
      else Seq(SctParams(cfg.sctMinN, cfg.sctZ))
    configs.zipWithIndex.foldLeft(df) { case (d, (p, i)) =>
      // materialize between configurations (see buddyOnce)
      val in = if (i == 0) d else graft.cascade.Cascade.materialize(d)
      sctConfigRound(in, cfg, p)
    }
  }

  private def sctConfigRound(df: DataFrame, cfg: CascadeConfig, params: SctParams): DataFrame = {
    val prios = cfg.priorities.values.toSet + 0
    if (prios.size == 1) sctRound(df, cfg, params, None)
    else prios.toSeq.sorted(Ordering[Int].reverse)
      .foldLeft(df)((d, p) => sctRound(d, cfg, params, Some(p)))
  }

  private def sctRound(df: DataFrame, cfg: CascadeConfig, params: SctParams,
                       prioClass: Option[Int]): DataFrame = {
    val alive = prioClass match {
      case Some(p) => Stage.referenceEligible && col(Prio) >= p
      case None    => Stage.referenceEligible
    }
    // ONE fused stats pass: the value order statistics AND the deviation
    // MAD come out of a single histogram aggregation ([[sctStats]]), so the
    // round costs one corpus scan, one checkpoint+count, one join — the
    // reference likewise computes all of a round's elaborations in one
    // kernel call (sct_resistant.r:158-188). The previous two-pass shape
    // (order stats, join, deviation order stats over the joined corpus,
    // second join) doubled the stats scans and its second histogram was a
    // full corpus aggregation.
    val os = joinReady(sctStats(df, Seq(Domain), col(NWords), alive), cfg)
    val joined = df.join(os, Seq(Domain), "left")

    val x  = col(NWords).cast("long")
    val n  = col("_n")
    val m0 = col("_m0"); val m1 = col("_m1"); val m2 = col("_m2")
    def half(a: Column, b: Column): Column = (a + b).cast("double") / 2.0
    val even = pmod(n, lit(2)) === 0
    // leave-one-out median of the alive group, per checked row
    val looMed = when(even, when(x <= m0, m1.cast("double")).otherwise(m0.cast("double")))
      .otherwise(
        when(x <= m0, half(m1, m2))
          .when(x >= m2, half(m0, m1))
          .otherwise(half(m0, m2)))

    val dev  = abs(x.cast("double") - looMed)
    val z    = when(col("_mad") > 0, dev / (lit(1.4826) * col("_mad")))
    val inClass = prioClass.map(p => col(Prio) === p).getOrElse(lit(true))
    val fail = inClass && (n - 1) >= params.minN && col("_mad") > 0.0 && z > params.z
    Stage.sticky(joined, fail, FlagCodes.Sct, flagsKeep = false)
      .drop("_m0", "_m1", "_m2", "_n", "_mad")
  }

  /** Fused sct statistics: per group, the three central value order
    * statistics (_m0,_m1,_m2 at 0-based ranks L,L+1,L+2, L = ⌊(n−2)/2⌋),
    * the alive count _n, AND the MAD (_mad) — all from ONE (keys, value)
    * histogram aggregation. The deviation multiset {|2v − 2·popMedian|}
    * needed for the MAD is derived from the SAME per-group histogram (each
    * distinct value v with count c contributes deviation |2v − popSum| with
    * count c), re-sorted and rank-walked as array expressions — no second
    * corpus scan, no second join. All arithmetic stays on longs until the
    * final /4.0, so the result is bit-identical to the two-pass form (and
    * to the DuckDB oracle). Per-group state is bounded by the number of
    * DISTINCT values, as in [[centralOrderStats]].
    */
  private[stages] def sctStats(df: DataFrame, keys: Seq[String], x: Column,
                               alive: Column): DataFrame = {
    val keyCols = keys.map(col)
    val v = when(alive, x.cast("long"))
    val hist = df.groupBy(keyCols :+ v.as("_v"): _*).agg(count(v).as("_c"))
      .filter(col("_c") > 0)
    val g = hist.groupBy(keyCols: _*).agg(
      sort_array(collect_list(struct(col("_v"), col("_c")))).as("_h"),
      sum("_c").as("_n"))
    val rank0 = floor((col("_n") - lit(2)).cast("double") / 2.0).cast("long")
    def walk3(arr: Column, vField: String, cField: String) =
      aggregate(arr,
        struct(lit(0L).as("cum"),
          lit(null).cast("long").as("m0"),
          lit(null).cast("long").as("m1"),
          lit(null).cast("long").as("m2")),
        (acc, e) => {
          val cum2 = acc.getField("cum") + e.getField(cField)
          def pick(cur: Column, rk: Column) =
            when(cur.isNull && cum2 > rk, e.getField(vField)).otherwise(cur)
          struct(cum2.as("cum"),
            pick(acc.getField("m0"), rank0).as("m0"),
            pick(acc.getField("m1"), rank0 + 1).as("m1"),
            pick(acc.getField("m2"), rank0 + 2).as("m2"))
        })
    val even = pmod(col("_n"), lit(2)) === 0
    // Each walk is aliased into its own projection layer so it evaluates
    // ONCE per group: a higher-order-function expression referenced from
    // several output columns — or worse, from inside a downstream lambda —
    // is re-evaluated per reference (per ELEMENT, for a lambda capture;
    // lambda expressions get no codegen CSE, the RepetitionExpr lesson),
    // turning the walk quadratic in distinct-value count. CollapseProject
    // keeps the layers separate exactly because the aliases are non-cheap
    // and multiply-referenced.
    val g1 = g.select(keyCols ++ Seq(col("_h"), col("_n"),
      walk3(col("_h"), "_v", "_c").as("_w")): _*)
    // 2·popMedian (quantile_cont ranks ⌊(n−1)/2⌋,⌊n/2⌋ = (m0,m1) even /
    // (m1,m1) odd), integral by construction
    val popSum = when(even,
      col("_w.m0") + col("_w.m1")).otherwise(col("_w.m1") + col("_w.m1"))
    val g2 = g1.select(keyCols ++ Seq(col("_h"), col("_n"), col("_w"),
      popSum.as("_ps")): _*)
    // deviation histogram from the value histogram: |2v − popSum| keeps the
    // arithmetic integral; struct sort on (_d,_c) orders by deviation (the
    // intra-deviation count order is irrelevant to a cumulative rank walk)
    val devs = sort_array(transform(col("_h"), e =>
      struct(abs(e.getField("_v") * 2 - col("_ps")).as("_d"), e.getField("_c").as("_c"))))
    val g3 = g2.select(keyCols ++ Seq(col("_n"), col("_w"),
      walk3(devs, "_d", "_c").as("_dw")): _*)
    val madSum = when(even,
      col("_dw.m0") + col("_dw.m1")).otherwise(col("_dw.m1") + col("_dw.m1"))
    g3.select(keyCols ++ Seq(
      col("_w.m0").as("_m0"),
      col("_w.m1").as("_m1"),
      col("_w.m2").as("_m2"),
      col("_n").as("_n"),
      madSum.cast("double").divide(lit(4.0)).as("_mad")): _*)
  }

  /** sct_dual analog (code 3): a *binary* attribute per doc (here: "long
    * doc", word count > threshold) checked against the leave-one-out event
    * fraction among domain buddies — the reference's dichotomous check
    * (functions/checks/sct_dual_r.r:112-130; event-fraction kernel
    * statistics_util.r:77-94). Flag when the doc disagrees with a
    * near-unanimous neighborhood.
    */
  def dualOnce(df: DataFrame, cfg: CascadeConfig): DataFrame = {
    val configs =
      if (cfg.dualParams.nonEmpty) cfg.dualParams
      else Seq(DualParams(cfg.dualMinN, cfg.dualEventWords, cfg.dualLoFrac, cfg.dualHiFrac))
    configs.zipWithIndex.foldLeft(df) { case (d, (p, i)) =>
      // materialize between configurations (see buddyOnce)
      val in = if (i == 0) d else graft.cascade.Cascade.materialize(d)
      dualConfigRound(in, cfg, p)
    }
  }

  private def dualConfigRound(df: DataFrame, cfg: CascadeConfig, params: DualParams): DataFrame = {
    val prios = cfg.priorities.values.toSet + 0
    if (prios.size == 1) dualRound(df, cfg, params, None)
    else prios.toSeq.sorted(Ordering[Int].reverse)
      .foldLeft(df)((d, p) => dualRound(d, cfg, params, Some(p)))
  }

  private def dualRound(df: DataFrame, cfg: CascadeConfig, params: DualParams,
                        prioClass: Option[Int]): DataFrame = {
    val refFilter = prioClass match {
      case Some(p) => Stage.referenceEligible && col(Prio) >= p
      case None    => Stage.referenceEligible
    }
    val event = (col(NWords) > params.eventWords).cast("int")
    val stats = groupStats(df.withColumn("_ev", event), col("_ev"), cfg, refFilter)
      .withColumnRenamed("_s", "_evs").withColumnRenamed("_n", "_evn").drop("_q")
    // join form from measured cardinality (statsJoinForm, see buddyRound)
    val joined = df.withColumn("_ev", event)
      .join(stats, Seq(Domain), "left")

    val selfIn = selfInSample(cfg)
    val evs  = when(selfIn, col("_ev").cast("long")).otherwise(lit(0L))
    val ns   = when(selfIn, lit(1L)).otherwise(lit(0L))
    val nn   = (col("_evn") - ns).cast("double")
    val frac = when(nn > 0, (col("_evs") - evs).cast("double") / nn)
    val inClass = prioClass.map(p => col(Prio) === p).getOrElse(lit(true))
    val fail = inClass && (col("_evn") - ns) >= params.minN &&
      ((frac >= params.hiFrac && col("_ev") === 0) ||
       (frac <= params.loFrac && col("_ev") === 1))
    dropStatCols(
      Stage.sticky(joined, fail, FlagCodes.SctDual, flagsKeep = false),
      "_ev", "_evs", "_evn")
  }

  /** Isolation check (code 800): a doc whose domain has too few alive
    * buddies cannot be consistency-checked — flag it low-confidence.
    * Reference: titanlib isolation_check(n=10, dr=25 km)
    * (functions/checks/isolation.r:25-28; count-in-box kernel
    * statistics_util.r:2-12). Leave-one-out: the doc itself doesn't count.
    */
  def isolationOnce(df: DataFrame, cfg: CascadeConfig): DataFrame = {
    val keys = cfg.isolationKeys
    val statCols = keys.map(col) :+ col("_n")
    val stats0 = groupStats(df, lit(1), cfg, keys = keys)
    val stats = cfg.maxRefsPerGroup match {
      case None    => stats0.select(statCols: _*)
      case Some(_) => stats0.select(statCols :+ col("_gn"): _*)
    }
    // join form from measured cardinality (statsJoinForm, see buddyRound)
    val joined = df.join(stats, keys, "left")
    val ns = when(selfInSample(cfg), lit(1L)).otherwise(lit(0L))
    val fail = coalesce(col("_n"), lit(0L)) - ns < cfg.isolationMinN
    dropStatCols(
      Stage.sticky(joined, fail, FlagCodes.Isolation, flagsKeep = false),
      "_n")
  }
}
