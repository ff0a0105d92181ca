package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-sequence event analytics: funnels and retention cohorts —
  * the product-analytics pair every event fact eventually serves, and a
  * natural extension of the reference's per-stream rollup family
  * (StreamTest.cpp:830-944) from state aggregation to ORDER-sensitive
  * aggregation.
  *
  * Float-free: every step timestamp is integer microseconds, every
  * count an integer — results hash-match any ANSI engine.
  */
object EventAnalytics {

  /** Three-step ordered funnel: for each user, the first time of step 1,
    * the first step-2 STRICTLY AFTER it, and the first step-3 strictly
    * after that (ordered semantics — a purchase before the signup does
    * not count). Output: (user_id, t1, t2, t3 micros, stage 1..3) for
    * users who completed at least step 1.
    *
    * 100 TB posture: ONE scan and ONE shuffle on the user key — each
    * step's time is an unbounded per-user window MIN conditioned on the
    * previous step's column, so all three stages and the final
    * per-user collapse ride the same hash(user) exchange
    * (plan-asserted). The join-per-stage alternative re-scans the fact
    * once per step and only co-locates when AQE declines to broadcast. */
  def funnel3(events: DataFrame, user: Column, ts: Column, typ: Column,
      s1: String, s2: String, s3: String): DataFrame = {
    val e = events.select(user.as("user_id"), unix_micros(ts).as("tus"),
      typ.as("et"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    val staged = e
      .withColumn("t1", min(when(col("et") === s1, col("tus"))).over(w))
      .withColumn("t2",
        min(when(col("et") === s2 && col("tus") > col("t1"), col("tus"))).over(w))
      .withColumn("t3",
        min(when(col("et") === s3 && col("tus") > col("t2"), col("tus"))).over(w))
    staged.groupBy("user_id")
      .agg(min(col("t1")).as("t1"), min(col("t2")).as("t2"), min(col("t3")).as("t3"))
      .where(col("t1").isNotNull)
      .withColumn("stage",
        when(col("t3").isNotNull, 3)
          .when(col("t2").isNotNull, 2)
          .otherwise(1).cast("int"))
  }

  /** Retention cohorts: users grouped by the day of their FIRST event;
    * for each (cohort, day-offset) the count of distinct users active
    * that day. Two combinable shuffles (first-day per user, then the
    * cohort grid) — the textbook distributed shape. */
  def retentionCohorts(events: DataFrame, user: Column, ts: Column): DataFrame = {
    val firstDay = events.groupBy(user.as("user_id"))
      .agg(date_trunc("day", min(ts)).as("cohort"))
    val activity = events
      .select(user.as("user_id"), date_trunc("day", ts).as("day"))
      .distinct()
    activity.join(firstDay, Seq("user_id"))
      .groupBy(col("cohort"),
        datediff(col("day"), col("cohort")).cast("int").as("day_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
  }

  /** Journey trigram mining: every consecutive 3-step event-type pattern
    * `a>b>c` along each user's timeline (ordered by ts, event id as the
    * deterministic tiebreak), counted corpus-wide — the behavioral
    * n-gram table sequence models and funnel designers both start from.
    * Where [[funnel3]] tests ONE hypothesized path, this surfaces every
    * observed path with its support.
    *
    * 100 TB posture: two lags over one per-user window (a single
    * hash(user) exchange, no global window), then one combinable count
    * groupBy whose key space is |event types|³ — tiny regardless of
    * corpus size. Output: (pattern string, cnt bigint), count-desc with
    * the pattern string as total-order tiebreak. */
  def journeyTrigrams(events: DataFrame, user: Column, ts: Column,
      id: Column, typ: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("tus"), col("eid"))
    events.select(user.as("user_id"), unix_micros(ts).as("tus"),
      id.as("eid"), typ.as("et"))
      .withColumn("e1", lag(col("et"), 2).over(w))
      .withColumn("e2", lag(col("et"), 1).over(w))
      .where(col("e1").isNotNull)
      .select(concat_ws(">", col("e1"), col("e2"), col("et")).as("pattern"))
      .groupBy("pattern").agg(count(lit(1)).as("cnt"))
  }

  /** First-order transition matrix over each user's event-type sequence
    * (the empirical Markov chain): for every (from, to) pair of
    * CONSECUTIVE events, the count and the row-normalized rate
    * `cnt·1e6 div Σcnt(from)` — integer-exact, so it hash-matches.
    * The state-machine summary [[journeyTrigrams]]'s 3-step paths
    * marginalize to.
    *
    * One per-user lag window (hash(user) exchange), one combinable
    * count groupBy on a |types|²-bounded key space, and the per-from
    * totals join back as a BROADCAST (|types| rows at any scale). */
  def transitionRates(events: DataFrame, user: Column, ts: Column,
      id: Column, typ: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("tus"), col("eid"))
    val pairs = events.select(user.as("user_id"), unix_micros(ts).as("tus"),
      id.as("eid"), typ.as("to_type"))
      .withColumn("from_type", lag(col("to_type"), 1).over(w))
      .where(col("from_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("cnt"))
    val totals = pairs.groupBy("from_type").agg(sum(col("cnt")).as("tot"))
    pairs.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("cnt"),
        expr("cnt * 1000000L DIV tot").as("rate_e6"))
  }

  /** Steady-state distribution of the [[transitionRates]] Markov chain —
    * "where does the journey SETTLE?", next to the empirical occupancy
    * ("where does it currently spend time?"): a gap between the two
    * columns is the early-funnel bias of a growing product. Power
    * iteration in e12 integer fixed point: π' (j) = Σᵢ πᵢ·c(i,j) DIV
    * totᵢ — every step is integer multiply/divide/sum, so the vector is
    * bit-identical on any engine at ANY iteration count (parity never
    * depends on convergence; `iters` is the documented contract, the
    * PPR lesson). States = those with outgoing transitions (an
    * absorbing sink would hoard floored mass — documented). Floor leak
    * ≤ |S| e12-units per state per step — invisible at ppm.
    *
    * 100 TB posture: ONE data-scale exchange (the lag-pair rollup —
    * user-keyed windows); the chain itself is a localCheckpointed
    * |S|² cell table and every iteration is a broadcast-sized
    * join+rollup. Output: (state, pi_ppm, occupancy_ppm). */
  def markovSteadyState(events: DataFrame, user: Column, ts: Column,
      id: Column, typ: Column, iters: Int = 8): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters=$iters out of range [1, 20]")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("tus"), col("eid"))
    val pairs = events.select(user.as("user_id"), unix_micros(ts).as("tus"),
        id.as("eid"), typ.as("to_type"))
      .withColumn("from_type", lag(col("to_type"), 1).over(w))
      .where(col("from_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("cnt"))
    val totals = pairs.groupBy("from_type").agg(sum(col("cnt")).as("tot"))
    val p = pairs.join(totals, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("cnt"), col("tot"))
      .localCheckpoint(false) // |S|² cells drive every iteration
    val nStates = p.select(col("from_type")).distinct()
      .agg(count(lit(1)).as("ns"))
    var pi = p.select(col("from_type").as("state")).distinct()
      .crossJoin(broadcast(nStates))
      .select(col("state"), expr("1000000000000L DIV ns").as("m"))
    for (_ <- 1 to iters) {
      pi = p.join(pi, col("from_type") === col("state"))
        .select(col("to_type"),
          expr("CAST(CAST(m AS DECIMAL(38,0)) * cnt DIV tot AS BIGINT)")
            .as("c"))
        .groupBy(col("to_type")).agg(sum(col("c")).as("m"))
        // incoming-only states keep zero mass implicitly: restrict the
        // vector back to the outgoing-state domain (semi-join on the
        // broadcast state list)
        .join(p.select(col("from_type")).distinct(),
          col("to_type") === col("from_type"), "left_semi")
        .select(col("to_type").as("state"), col("m"))
    }
    val occ = events.select(typ.as("state"))
      .groupBy("state").agg(count(lit(1)).as("n_ev"))
    val occTot = occ.agg(sum(col("n_ev")).as("n_all"))
    pi.join(broadcast(occ), Seq("state"))
      .crossJoin(broadcast(occTot))
      .select(col("state"), expr("m DIV 1000000L").as("pi_ppm"),
        expr("CAST(CAST(n_ev AS DECIMAL(38,0)) * 1000000 DIV n_all " +
          "AS BIGINT)").as("occupancy_ppm"))
  }

  /** CUPED variance-reduced A/B readout: the pre-period covariate X
    * (events before `splitTs`) absorbs between-user noise from the
    * post-period metric Y via the pooled regression adjustment
    * θ = Cov(X,Y)/Var(X). All moments ride DECIMAL(38) integer sums;
    * θ_ppm = (nΣxy − ΣxΣy)·1e6 DIV (nΣx² − (Σx)²), and each variant's
    * adjusted mean is the documented two-stage floor
    * ȳ_v − ⌊θ_ppm·x̄dev_v⌋/1e6 — identical grids in both engines.
    * Zero pre-period variance → θ NULL and the adjustment degrades to
    * the raw mean (adj = ybar), loudly visible rather than a crash.
    *
    * 100 TB posture: ONE user-level rollup (combinable conditional
    * counts), one 1-row moment aggregate crossjoined broadcast, one
    * |variants|-row rollup. Nothing wider than (user, 2 counts) ever
    * shuffles. Output per variant: (variant, n_users, ybar_ppm,
    * xdev_ppm, adj_ppm, theta_ppm). */
  def cupedLift(events: DataFrame, user: Column, ts: Column,
      variant: Column, splitTs: Column): DataFrame = {
    val perUser = events.select(user.as("u"), variant.as("variant"),
        when(ts < splitTs, 1L).otherwise(0L).as("pre"),
        when(ts >= splitTs, 1L).otherwise(0L).as("post"))
      .groupBy("u", "variant")
      .agg(sum(col("pre")).as("x"), sum(col("post")).as("y"))
      .localCheckpoint(false) // user-level table feeds both rollups
    val moments = perUser.agg(count(lit(1)).as("n"),
        sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"),
        sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
      .withColumn("theta_ppm",
        expr("CASE WHEN n * sxx - sx * sx > 0 THEN " +
          "CAST((n * sxy - sx * sy) * 1000000 DIV (n * sxx - sx * sx) " +
          "AS BIGINT) ELSE NULL END"))
    perUser.groupBy("variant")
      .agg(count(lit(1)).as("n_users"),
        sum(expr("CAST(x AS DECIMAL(38,0))")).as("sxv"),
        sum(expr("CAST(y AS DECIMAL(38,0))")).as("syv"))
      .crossJoin(broadcast(moments))
      .withColumn("ybar_ppm", expr("CAST(syv * 1000000 DIV n_users AS BIGINT)"))
      .withColumn("xdev_ppm",
        expr("CAST((sxv * n - sx * n_users) * 1000000 " +
          "DIV (CAST(n_users AS DECIMAL(38,0)) * n) AS BIGINT)"))
      .select(col("variant"), col("n_users"), col("ybar_ppm"),
        col("xdev_ppm"),
        expr("CASE WHEN theta_ppm IS NULL THEN ybar_ppm " +
          "ELSE ybar_ppm - CAST(CAST(theta_ppm AS DECIMAL(38,0)) " +
          "* xdev_ppm DIV 1000000 AS BIGINT) END").as("adj_ppm"),
        col("theta_ppm"))
  }

  /** Funnel timing by signup cohort: per first-event-day cohort, how
    * many users reached each [[funnel3]] stage and the EXACT median
    * time-to-convert between consecutive stages (microseconds, the
    * `(50·n+99) div 100` order-statistic convention, matching
    * [[graft.ext.Profile.groupQuantiles]]) — the
    * "how long does conversion take, and is it drifting by cohort"
    * readout. Stratifying by cohort is also what keeps the median
    * scale-safe: every rank window is cohort-partitioned, so there is
    * no global median (which would need a global sort or a sketch).
    * Output: (cohort, n_s1, n_s2, n_s3, p50_t12_us, p50_t23_us) —
    * medians null for cohorts with no converting users. */
  def funnelTiming(events: DataFrame, user: Column, ts: Column, typ: Column,
      s1: String, s2: String, s3: String): DataFrame = {
    val f = funnel3(events, user, ts, typ, s1, s2, s3)
    val cohorts = events.groupBy(user.as("user_id"))
      .agg(date_trunc("day", min(ts)).as("cohort"))
    val fc = f.join(cohorts, Seq("user_id"))
    val counts = fc.groupBy("cohort").agg(
      count(lit(1)).as("n_s1"),
      sum(when(col("stage") >= 2, 1L).otherwise(0L)).as("n_s2"),
      sum(when(col("stage") === 3, 1L).otherwise(0L)).as("n_s3"))
    def med(d: DataFrame, out: String) =
      graft.ext.Profile.groupQuantiles(d, col("cohort"), col("d"), Seq(50),
        lowCardStrata = true)
        .select(col("stratum").as("cohort"), col("p50").as(out))
    val d12 = med(fc.where(col("t2").isNotNull)
      .select(col("cohort"), (col("t2") - col("t1")).as("d")), "p50_t12_us")
    val d23 = med(fc.where(col("t3").isNotNull)
      .select(col("cohort"), (col("t3") - col("t2")).as("d")), "p50_t23_us")
    counts.join(d12, Seq("cohort"), "left").join(d23, Seq("cohort"), "left")
  }

  /** Rolling active users: for every observed day, the EXACT count of
    * distinct users active in the trailing `windowDays` window (WAU for
    * 7), the day's own actives (DAU), and the integer stickiness ratio
    * `dau·1e6 div wau` — the engagement triple, exactly (a rolling SUM
    * of daily DAU would double-count multi-day users; a sketch would
    * approximate).
    *
    * The exact trick without a rolling-distinct state: each (user, day)
    * activity row COVERS the `windowDays` window-end days it belongs
    * to — a bounded scan-side explode (×windowDays replication, never
    * corpus²) — then one distinct + one combinable count per cover day.
    * Output: (day, dau, wau, stickiness_e6) for observed days only. */
  def rollingActives(events: DataFrame, user: Column, ts: Column,
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays=$windowDays must be >= 1")
    val ud = events.select(user.as("user_id"), date_trunc("day", ts).as("day"))
      .distinct()
    val wau = ud.select(col("user_id"), explode(expr(
        s"sequence(day, day + interval ${windowDays - 1} days, interval 1 day)"))
        .as("day"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("wau"))
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau"),
        expr("dau * 1000000L DIV wau").as("stickiness_e6"))
  }

  /** Last-touch attribution: every conversion event credited to the
    * most recent PRIOR non-conversion event on the same user's
    * timeline, with the exact median conversion lag per attributed
    * channel — the marketing-analytics staple. One per-user running
    * window (frame ends at 1 PRECEDING so a conversion never credits
    * itself) + the order-statistic median per channel; all integer
    * microseconds. Output: (channel, n, p50_gap_us). */
  def lastTouchAttribution(events: DataFrame, user: Column, ts: Column,
      id: Column, typ: Column, conversion: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("tus"), col("eid"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val p = events.select(user.as("user_id"), unix_micros(ts).as("tus"),
      id.as("eid"), typ.as("et"))
      .withColumn("channel",
        last(when(col("et") =!= conversion, col("et")), ignoreNulls = true).over(w))
      .withColumn("ctus",
        last(when(col("et") =!= conversion, col("tus")), ignoreNulls = true).over(w))
      .where(col("et") === conversion && col("channel").isNotNull)
      .select(col("channel"), (col("tus") - col("ctus")).as("gap"))
    graft.ext.Profile.groupQuantiles(p, col("channel"), col("gap"), Seq(50),
        lowCardStrata = true)
      .select(col("stratum").as("channel"), col("n"),
        col("p50").as("p50_gap_us"))
  }

  /** Point-in-time-correct per-event features: for EVERY event, stats
    * computed over the user's strictly PRIOR rows only (frame ends at
    * 1 PRECEDING) — prior event count, prior conversion count, and
    * microseconds since the previous event. This is the leakage-free
    * feature-generation contract sequence models need: a feature row
    * at time t must not see t or later (the same discipline as
    * [[lastTouchAttribution]]'s frame). One hash(user) window exchange
    * shared by all three features; NULL `us_since_prev` on each user's
    * first event is part of the contract. Output: (event_id, n_prior,
    * n_prior_conv, us_since_prev). */
  def pitFeatures(events: DataFrame, user: Column, ts: Column, id: Column,
      typ: Column, conversion: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("tus"), col("eid"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    events.select(user.as("user_id"), unix_micros(ts).as("tus"),
      id.as("eid"), typ.as("et"))
      .select(col("eid").as("event_id"),
        count(lit(1)).over(w).as("n_prior"),
        coalesce(sum(when(col("et") === conversion, 1L).otherwise(0L)).over(w),
          lit(0L)).as("n_prior_conv"),
        (col("tus") - last(col("tus")).over(w)).as("us_since_prev"))
  }

  /** Market-basket 2-itemsets over sessions (association mining's
    * frequent-pair stage): each session's DISTINCT item set, every
    * unordered pair's support, the single-item supports, and the
    * integer lift `sup_ab·n_sess·1e6 div (sup_a·sup_b)` — lift > 1e6
    * means the pair co-occurs MORE than independence predicts (the
    * "bought together" signal).
    *
    * Scale shape: sessions come from [[Sessionize.assign]]'s one
    * exchange; each session's item set is a bounded `collect_set`
    * (|item vocabulary|, not session length); pairs expand SCAN-SIDE
    * from the sorted set (no self-join — the oracle pays the position
    * join); supports join back as BROADCASTS (|items| and |items|²/2
    * rows); the lift product runs in DECIMAL(38) so `n_sess²·1e6`
    * cannot overflow. Output: (item_a, item_b, sup_ab, sup_a, sup_b,
    * lift_e6). */
  def basketPairs(events: DataFrame, user: Column, ts: Column, id: Column,
      item: Column, gapMicros: Long): DataFrame = {
    val sess = Sessionize.assign(events, user, ts, id, gapMicros,
      extra = Seq(item.as("item")))
      .groupBy("key", "session_seq")
      .agg(sort_array(collect_set(col("item"))).as("items"))
      .localCheckpoint(false) // one sessionization, three consumers
    val nSess = sess.agg(count(lit(1)).as("n_sess"))
    val sing = sess.select(explode(col("items")).as("item"))
      .groupBy("item").agg(count(lit(1)).as("sup"))
    val pairs = sess.select(explode(when(size(col("items")) >= 2,
        expr("""flatten(transform(sequence(0, size(items) - 2), i ->
               |  transform(sequence(i + 1, size(items) - 1), j ->
               |    struct(items[i] AS item_a, items[j] AS item_b))))"""
          .stripMargin))
        .otherwise(array().cast("array<struct<item_a:string,item_b:string>>")))
        .as("p"))
      .select(col("p.item_a"), col("p.item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("sup_ab"))
    pairs
      .join(broadcast(sing.select(col("item").as("item_a"), col("sup").as("sup_a"))),
        Seq("item_a"))
      .join(broadcast(sing.select(col("item").as("item_b"), col("sup").as("sup_b"))),
        Seq("item_b"))
      .crossJoin(broadcast(nSess))
      .select(col("item_a"), col("item_b"), col("sup_ab"), col("sup_a"), col("sup_b"),
        expr("CAST(CAST(sup_ab AS DECIMAL(38,0)) * n_sess * 1000000 DIV (sup_a * sup_b) AS BIGINT)")
          .as("lift_e6"))
  }

  /** Apriori level-3 on the session item sets: frequent TRIPLES with
    * support pruning — the "bought together" signal one order deeper
    * than [[basketPairs]]. The apriori property does the scale work:
    * items below `minSup` are pruned from every session's set BEFORE
    * the cubic expansion (an infrequent item cannot appear in a
    * frequent triple), so the scan-side triple explode runs over
    * C(|frequent items in session|, 3), not C(|vocabulary|, 3).
    *
    * Scale shape: one sessionization exchange; the prune is a
    * broadcast semi-join of exploded items against the (≤ n_sess /
    * minSup row) frequent-item table plus one keyed re-collect; the
    * triple counts are a combinable groupBy; single-item supports join
    * back as broadcasts; lift runs in DECIMAL(38)
    * (`sup_abc·n_sess²·1e6 / (sa·sb·sc)` — > 1e6 means the triple
    * co-occurs more than three-way independence predicts). Output:
    * (item_a, item_b, item_c, sup_abc, sup_a, sup_b, sup_c, lift_e6)
    * for triples with `sup_abc ≥ minSup`. */
  def basketTriples(events: DataFrame, user: Column, ts: Column, id: Column,
      item: Column, gapMicros: Long, minSup: Long): DataFrame = {
    require(minSup >= 1, s"minSup=$minSup must be >= 1")
    val sess = Sessionize.assign(events, user, ts, id, gapMicros,
        extra = Seq(item.as("item")))
      .groupBy("key", "session_seq")
      .agg(sort_array(collect_set(col("item"))).as("items"))
      .localCheckpoint(false) // one sessionization, three consumers
    val nSess = sess.agg(count(lit(1)).as("n_sess"))
    val sing = sess.select(explode(col("items")).as("item"))
      .groupBy("item").agg(count(lit(1)).as("sup"))
      .localCheckpoint(false)
    val freq = sing.where(col("sup") >= minSup)
    val kept = sess
      .select(col("key"), col("session_seq"), explode(col("items")).as("item"))
      .join(broadcast(freq.select(col("item"))), Seq("item"), "left_semi")
      .groupBy("key", "session_seq")
      .agg(sort_array(collect_set(col("item"))).as("items"))
    val triples = kept.select(explode(when(size(col("items")) >= 3,
        expr("""flatten(flatten(transform(sequence(0, size(items) - 3), i ->
               |  transform(sequence(i + 1, size(items) - 2), j ->
               |    transform(sequence(j + 1, size(items) - 1), k ->
               |      struct(items[i] AS item_a, items[j] AS item_b,
               |             items[k] AS item_c))))))""".stripMargin))
        .otherwise(array().cast(
          "array<struct<item_a:string,item_b:string,item_c:string>>")))
        .as("t"))
      .select(col("t.item_a"), col("t.item_b"), col("t.item_c"))
      .groupBy("item_a", "item_b", "item_c").agg(count(lit(1)).as("sup_abc"))
      .where(col("sup_abc") >= minSup)
    triples
      .join(broadcast(sing.select(col("item").as("item_a"), col("sup").as("sup_a"))),
        Seq("item_a"))
      .join(broadcast(sing.select(col("item").as("item_b"), col("sup").as("sup_b"))),
        Seq("item_b"))
      .join(broadcast(sing.select(col("item").as("item_c"), col("sup").as("sup_c"))),
        Seq("item_c"))
      .crossJoin(broadcast(nSess))
      .select(col("item_a"), col("item_b"), col("item_c"), col("sup_abc"),
        col("sup_a"), col("sup_b"), col("sup_c"),
        expr("CAST(CAST(sup_abc AS DECIMAL(38,0)) * n_sess * n_sess " +
          "* 1000000 DIV (sup_a * sup_b * sup_c) AS BIGINT)").as("lift_e6"))
  }

  /** Half-life-decayed leaderboard with EXACT power-of-two decay: each
    * event contributes `2^(30 − age_epochs)` where `age_epochs =
    * age_days DIV halfLifeDays` relative to the newest event's day —
    * integer-exact "exponential" decay (the float `exp(−λ·age)` form
    * is hash-unprovable; snapping the half-life to whole epochs keeps
    * every weight a power of two and every score a BIGINT sum). Events
    * older than 30 epochs contribute zero — at ≤ 2^−30 of a fresh
    * event they were noise anyway, and the cap bounds the weight so
    * corpus-scale sums stay far from 2^63.
    *
    * The reference date is the data's own max timestamp (deterministic
    * re-runs; no wall clock). 100 TB posture: the reference date is a
    * 1-row broadcast; weights are scan-side; the score is ONE
    * combinable groupBy + a TakeOrdered top-k — no global sort.
    * Output: (item, score, n_events, n_live) top-k by (score DESC,
    * item), where n_live counts the events still inside the horizon. */
  def decayedTopK(events: DataFrame, item: Column, ts: Column,
      halfLifeDays: Int, k: Int): DataFrame = {
    require(halfLifeDays >= 1 && halfLifeDays <= 365,
      s"halfLifeDays=$halfLifeDays out of range")
    require(k >= 1 && k <= 10000, s"k=$k out of range")
    val refDay = events.agg(max(to_date(ts)).as("ref_day"))
    events.select(item.as("item"), to_date(ts).as("day"))
      .crossJoin(broadcast(refDay))
      .select(col("item"),
        expr(s"datediff(ref_day, day) DIV $halfLifeDays").as("epochs"))
      .select(col("item"),
        when(col("epochs") <= 30,
          expr("shiftleft(CAST(1 AS BIGINT), CAST(30 - epochs AS INT))"))
          .otherwise(lit(0L)).as("w"))
      .groupBy("item")
      .agg(sum(col("w")).as("score"), count(lit(1)).as("n_events"),
        sum(when(col("w") > 0, 1L).otherwise(0L)).as("n_live"))
      .orderBy(col("score").desc, col("item"))
      .limit(k)
  }

  /** Time-constrained three-step funnel ("window funnel"): per DAY, how
    * many step-3 conversions completed the ordered chain s1 < s2 < s3
    * within `windowUs` — where the chain may start at ANY s1
    * occurrence, not just the user's first ([[funnel3]]'s semantics).
    * Greedy-latest is exact for three stages: the latest s2 before the
    * conversion maximizes the set of usable s1s (the running-last frame
    * is monotone — if ANY earlier s2 had an s1 before it, the latest
    * does too), and the latest s1 before that s2 maximizes the chain
    * start, so span = t3 − max-start is the MINIMAL span and the
    * within-window test is exact.
    *
    * One hash(user) exchange carries both stacked running windows
    * (frames end at 1 PRECEDING — a step never matches itself); the
    * per-day median span is entity-partitioned order statistics. All
    * integer microseconds. Output: (day, n_conv, n_completed,
    * completion_ppm, p50_span_us — NULL when no completions). */
  def windowFunnel(events: DataFrame, user: Column, ts: Column, id: Column,
      typ: Column, s1: String, s2: String, s3: String,
      windowUs: Long): DataFrame = {
    require(windowUs > 0, s"windowUs=$windowUs must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("tus"), col("eid"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val base = events.select(user.as("user_id"), unix_micros(ts).as("tus"),
      id.as("eid"), typ.as("et"),
      date_format(ts, "yyyy-MM-dd").as("day"))
    val withS1 = base.withColumn("ls",
      last(when(col("et") === s1, col("tus")), ignoreNulls = true).over(w))
    val withS2 = withS1.withColumn("lc",
      last(when(col("et") === s2, struct(col("tus").as("t"), col("ls").as("ls"))),
        ignoreNulls = true).over(w))
    val conv = withS2.where(col("et") === s3)
      .select(col("day"),
        (col("lc").isNotNull && col("lc.ls").isNotNull &&
          col("tus") - col("lc.ls") <= windowUs).as("ok"),
        (col("tus") - col("lc.ls")).as("span"))
    val counts = conv.groupBy("day").agg(
      count(lit(1)).as("n_conv"),
      coalesce(sum(when(col("ok"), 1L).otherwise(0L)), lit(0L)).as("n_completed"))
    val med = graft.ext.Profile.groupQuantiles(
      conv.where(col("ok")), col("day"), col("span"), Seq(50),
      lowCardStrata = true)
      .select(col("stratum").as("day"), col("p50").as("p50_span_us"))
    counts.join(med, Seq("day"), "left")
      .select(col("day"), col("n_conv"), col("n_completed"),
        expr("n_completed * 1000000L DIV n_conv").as("completion_ppm"),
        col("p50_span_us"))
  }

  /** Hour-of-week seasonal baseline: per (ISO dow 1-7, hour 0-23) slot,
    * the observed-slot count, total events, floor mean (×100), and the
    * PEAK slot instance (its date, count, and ratio-to-mean ×1e6) — the
    * traffic-anomaly baseline every ops dashboard runs on. "Observed
    * slots" = (date, hour) pairs that actually have events; both engine
    * and oracle define the mean over those, so absence handling can
    * never diverge.
    *
    * 100 TB posture: two combinable groupBys — the fact collapses to
    * (date, dow, hour) counts in one scan-side pass (key space ≤ days ×
    * 24, not rows), then ≤ 168 baseline rows; the peak is a max(struct)
    * over the slot counts, never a window over the fact. All integers.
    * Output: (dow, hr, n_slots, total, mean_e2, max_c, max_date,
    * max_ratio_e6). */
  def seasonalBaseline(events: DataFrame, ts: Column): DataFrame = {
    val slots = events
      .select((weekday(ts) + lit(1)).cast("int").as("dow"),
        hour(ts).cast("int").as("hr"),
        date_format(ts, "yyyy-MM-dd").as("d"))
      .groupBy("dow", "hr", "d").agg(count(lit(1)).as("c"))
    slots.groupBy("dow", "hr").agg(
        count(lit(1)).as("n_slots"),
        sum(col("c")).as("total"),
        // lexicographic struct max: highest count, then latest date
        max(struct(col("c"), col("d"))).as("peak"))
      .select(col("dow"), col("hr"), col("n_slots"), col("total"),
        expr("total * 100L DIV n_slots").as("mean_e2"),
        col("peak.c").as("max_c"), col("peak.d").as("max_date"),
        expr("peak.c * n_slots * 1000000L DIV total").as("max_ratio_e6"))
  }

  /** Discrete survival curve over session durations with right-censor
    * accounting: sessions still active near the observation edge (their
    * last event within `gapMicros` of the corpus max timestamp) cannot
    * be known to have ENDED — the classic right-censoring — so they are
    * excluded from the survival denominator and reported separately.
    * For each threshold t in `minuteMarks`: sessions observed to last
    * >= t minutes, the censored count still alive at t, and
    * `surv_ppm = n_alive·1e6 div n_uncensored` — the engagement
    * half-life read a product review starts from.
    *
    * 100 TB posture: ONE user-key exchange (sessionize) collapses
    * events to session rows; the threshold fan-out joins the SESSION
    * table (not events) to a broadcast marks list; the corpus max rides
    * a broadcast single row. Output: one row per mark. */
  def survivalCurve(events: DataFrame, user: Column, ts: Column,
      order: Column, gapMicros: Long, minuteMarks: Seq[Int]): DataFrame = {
    require(minuteMarks.nonEmpty && minuteMarks.forall(_ >= 0),
      s"minuteMarks=$minuteMarks must be non-negative")
    val spark = events.sparkSession
    import spark.implicits._
    val sess = graft.ops.Sessionize
      .sessionize(events, user, ts, order, gapMicros)
      .select(col("duration_secs"), unix_micros(col("session_end")).as("eus"))
    val edge = sess.agg(max(col("eus")).as("max_eus"))
    val flagged = sess.crossJoin(broadcast(edge))
      .select(col("duration_secs"),
        (col("eus") > col("max_eus") - gapMicros).cast("int").as("censored"))
      .localCheckpoint(false)
    val marks = broadcast(minuteMarks.toDF("t_min"))
    flagged.crossJoin(marks)
      .groupBy("t_min")
      .agg(
        sum(when(col("censored") === 0 &&
          col("duration_secs") >= col("t_min") * 60L, 1L).otherwise(0L))
          .as("n_alive"),
        sum(when(col("censored") === 1 &&
          col("duration_secs") >= col("t_min") * 60L, 1L).otherwise(0L))
          .as("n_censored_alive"),
        sum(lit(1L) - col("censored")).as("n_uncensored"))
      .select(col("t_min"), col("n_alive"), col("n_censored_alive"),
        expr("CASE WHEN n_uncensored = 0 THEN 0L " +
          "ELSE n_alive * 1000000L DIV n_uncensored END").as("surv_ppm"))
  }

  /** Entry/exit/bounce profile per event type: for each type, how many
    * sessions START with it, END with it, or consist of it alone — the
    * landing/exit-page report. Entry and exit are `min_by`/`max_by`
    * over the total (tus, order) order within the session — combinable
    * aggregates, no second window after sessionization.
    *
    * Plan: one user-key exchange (session assignment windows + the
    * session agg share it), then THREE type-cardinality aggregates over
    * the checkpointed session table, assembled by full-outer joins at
    * type cardinality with a broadcast session total.
    * Output per type: (event_type, n_entry, n_exit, n_bounce,
    * entry_ppm, exit_ppm). */
  def entryExitStats(events: DataFrame, user: Column, ts: Column,
      order: Column, typ: Column, gapMicros: Long): DataFrame = {
    val sess = graft.ops.Sessionize
      .assign(events, user, ts, order, gapMicros, extra = Seq(typ.as("typ")))
      .groupBy(col("key"), col("session_seq"))
      .agg(
        min_by(col("typ"), struct(col("tus"), col("ord"))).as("entry_typ"),
        max_by(col("typ"), struct(col("tus"), col("ord"))).as("exit_typ"),
        count(lit(1)).as("n_events"))
      .localCheckpoint(false)
    val entries = sess.groupBy(col("entry_typ").as("event_type"))
      .agg(count(lit(1)).as("n_entry"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounce"))
    val exits = sess.groupBy(col("exit_typ").as("event_type"))
      .agg(count(lit(1)).as("n_exit"))
    val total = sess.agg(count(lit(1)).as("n_sessions"))
    entries.join(exits, Seq("event_type"), "full_outer")
      .na.fill(0L, Seq("n_entry", "n_bounce", "n_exit"))
      .crossJoin(broadcast(total))
      .select(col("event_type"), col("n_entry"), col("n_exit"),
        col("n_bounce"),
        expr("n_entry * 1000000L DIV n_sessions").as("entry_ppm"),
        expr("n_exit * 1000000L DIV n_sessions").as("exit_ppm"))
  }

  /** Linear (equal-credit) multi-touch attribution: each conversion's
    * credit splits 1e6 ppm EQUALLY over the touches in its journey —
    * the events since the previous conversion — where x131's last-touch
    * gives everything to the final one. Conversions with no prior touch
    * credit the `(direct)` channel whole. Exact integers: per-touch
    * credit is `1e6 div k` with the `1e6 mod k` remainder assigned to
    * the journey's FIRST touch, so total credit is conversions·1e6
    * EXACTLY (an invariant the spec pins; truncated shares alone would
    * leak up to k−1 ppm per journey).
    *
    * 100 TB posture: journeys form with ONE user-key window pass
    * (running conversion count); per-journey touch counts are a
    * combinable agg joined back at (user × journey) cardinality; the
    * channel rollup is type-cardinality. Output per channel:
    * (channel, n_touches, n_journeys, credit_e6). */
  def linearAttribution(events: DataFrame, user: Column, ts: Column,
      order: Column, typ: Column, convType: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("ord"))
    val run = w.rowsBetween(Window.unboundedPreceding, -1)
    val base = events.select(user.as("user_id"), unix_micros(ts).as("tus"),
        order.as("ord"), typ.as("typ"))
      .withColumn("is_conv", (col("typ") === convType).cast("long"))
      .withColumn("journey",
        coalesce(sum(col("is_conv")).over(run), lit(0L)) + 1)
      .localCheckpoint(false)
    val journeys = base.groupBy(col("user_id"), col("journey"))
      .agg(max(col("is_conv")).as("converted"),
        sum(lit(1L) - col("is_conv")).as("n_touch"))
    val converted = journeys.where(col("converted") === 1L)
    val touches = base.where(col("is_conv") === 0L)
      .withColumn("touch_rank", row_number().over(
        Window.partitionBy(col("user_id"), col("journey"))
          .orderBy(col("tus"), col("ord"))))
      .join(converted.select(col("user_id"), col("journey"), col("n_touch")),
        Seq("user_id", "journey"))
      .select(col("typ").as("channel"),
        (expr("1000000L DIV n_touch") +
          when(col("touch_rank") === 1, expr("1000000L % n_touch"))
            .otherwise(lit(0L))).as("credit"))
    val byChannel = touches.groupBy("channel")
      .agg(count(lit(1)).as("n_touches"), sum(col("credit")).as("credit_e6"))
    val direct = converted.where(col("n_touch") === 0L)
      .agg(count(lit(1)).as("n_direct"))
      .where(col("n_direct") > 0)
      .select(lit("(direct)").as("channel"), lit(0L).as("n_touches"),
        (col("n_direct") * 1000000L).as("credit_e6"))
    val journeysPerChannel = base.where(col("is_conv") === 0L)
      .join(converted.select(col("user_id"), col("journey")),
        Seq("user_id", "journey"), "left_semi")
      .select(col("typ").as("channel"), col("user_id"), col("journey"))
      .distinct()
      .groupBy("channel").agg(count(lit(1)).as("n_journeys"))
    byChannel.join(journeysPerChannel, Seq("channel"), "left")
      .na.fill(0L, Seq("n_journeys"))
      .select(col("channel"), col("n_touches"), col("n_journeys"), col("credit_e6"))
      .unionByName(direct.select(col("channel"), col("n_touches"),
        lit(0L).as("n_journeys"), col("credit_e6")))
  }

  /** POSITION-BASED (U-shaped) attribution — the third member of the
    * family: [[lastTouchAttribution]] credits only the closer,
    * [[linearAttribution]] spreads evenly, U-shaped says the OPENER and
    * the CLOSER each earn 40% and the middle splits the remaining 20%
    * (1 touch → 100%, 2 → 50/50 — the standard degenerations). Credit
    * stays EXACTLY 1e6 per converting journey: the middle share floors
    * per touch (200000 DIV (n−2)) and the remainder lands on the FIRST
    * middle touch — the same deterministic remainder home as
    * [[linearAttribution]]'s first touch. Converting journeys with no
    * touches roll up as `(direct)`, same contract.
    *
    * 100 TB posture: identical plan to [[linearAttribution]] — the one
    * data-scale exchange is the user-keyed journey segmentation; rank
    * windows are per-(user, journey); the channel rollup is
    * type-cardinality. Output per channel:
    * (channel, n_touches, n_journeys, credit_e6). */
  def positionAttribution(events: DataFrame, user: Column, ts: Column,
      order: Column, typ: Column, convType: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("ord"))
    val run = w.rowsBetween(Window.unboundedPreceding, -1)
    val base = events.select(user.as("user_id"), unix_micros(ts).as("tus"),
        order.as("ord"), typ.as("typ"))
      .withColumn("is_conv", (col("typ") === convType).cast("long"))
      .withColumn("journey",
        coalesce(sum(col("is_conv")).over(run), lit(0L)) + 1)
      .localCheckpoint(false)
    val journeys = base.groupBy(col("user_id"), col("journey"))
      .agg(max(col("is_conv")).as("converted"),
        sum(lit(1L) - col("is_conv")).as("n_touch"))
    val converted = journeys.where(col("converted") === 1L)
    val touches = base.where(col("is_conv") === 0L)
      .withColumn("touch_rank", row_number().over(
        Window.partitionBy(col("user_id"), col("journey"))
          .orderBy(col("tus"), col("ord"))))
      .join(converted.select(col("user_id"), col("journey"), col("n_touch")),
        Seq("user_id", "journey"))
      .select(col("typ").as("channel"),
        expr("CASE WHEN n_touch = 1 THEN 1000000L " +
          "WHEN n_touch = 2 THEN 500000L " +
          "WHEN touch_rank = 1 OR touch_rank = n_touch THEN 400000L " +
          "ELSE 200000L DIV (n_touch - 2) + " +
          "CASE WHEN touch_rank = 2 THEN 200000L % (n_touch - 2) " +
          "ELSE 0L END END").as("credit"))
    val byChannel = touches.groupBy("channel")
      .agg(count(lit(1)).as("n_touches"), sum(col("credit")).as("credit_e6"))
    val direct = converted.where(col("n_touch") === 0L)
      .agg(count(lit(1)).as("n_direct"))
      .where(col("n_direct") > 0)
      .select(lit("(direct)").as("channel"), lit(0L).as("n_touches"),
        (col("n_direct") * 1000000L).as("credit_e6"))
    val journeysPerChannel = base.where(col("is_conv") === 0L)
      .join(converted.select(col("user_id"), col("journey")),
        Seq("user_id", "journey"), "left_semi")
      .select(col("typ").as("channel"), col("user_id"), col("journey"))
      .distinct()
      .groupBy("channel").agg(count(lit(1)).as("n_journeys"))
    byChannel.join(journeysPerChannel, Seq("channel"), "left")
      .na.fill(0L, Seq("n_journeys"))
      .select(col("channel"), col("n_touches"), col("n_journeys"), col("credit_e6"))
      .unionByName(direct.select(col("channel"), col("n_touches"),
        lit(0L).as("n_journeys"), col("credit_e6")))
  }

  /** DIFFERENCE-IN-DIFFERENCES on the [[cupedLift]] pre/post frame:
    * the quasi-experimental readout when assignment wasn't randomized —
    * the treatment's post−pre movement minus the control's, so any
    * shared trend cancels. Per-user pre/post counts roll up once; the
    * four group means are exact ppm floors and
    * did_ppm = (post_t − pre_t) − (post_c − pre_c) is their documented
    * difference (floors first, subtraction after — the identical grid
    * in both engines). Variants beyond {0, 1} refuse loudly at
    * runtime; a missing arm yields an empty result, not a fake zero.
    *
    * 100 TB posture: one combinable user rollup, one 2-row variant
    * rollup — nothing wider than (user, 2 counts) shuffles. Output:
    * one row (n_treat, n_ctrl, pre_t_ppm, post_t_ppm, pre_c_ppm,
    * post_c_ppm, did_ppm). */
  def diffInDiff(events: DataFrame, user: Column, ts: Column,
      treated: Column, splitTs: Column): DataFrame = {
    val perUser = events.select(user.as("u"),
        treated.cast("long").as("t"),
        when(ts < splitTs, 1L).otherwise(0L).as("pre"),
        when(ts >= splitTs, 1L).otherwise(0L).as("post"))
      .withColumn("t",
        expr("CASE WHEN t NOT IN (0, 1) THEN " +
          "CAST(raise_error('diffInDiff: treated must be 0 or 1') " +
          "AS BIGINT) ELSE t END"))
      .groupBy("u", "t")
      .agg(sum(col("pre")).as("x"), sum(col("post")).as("y"))
    val arms = perUser.groupBy("t")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"),
        sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"))
      .withColumn("pre_ppm", expr("CAST(sx * 1000000 DIV n AS BIGINT)"))
      .withColumn("post_ppm", expr("CAST(sy * 1000000 DIV n AS BIGINT)"))
    val tArm = arms.where(col("t") === 1L)
      .select(col("n").as("n_treat"), col("pre_ppm").as("pre_t_ppm"),
        col("post_ppm").as("post_t_ppm"))
    val cArm = arms.where(col("t") === 0L)
      .select(col("n").as("n_ctrl"), col("pre_ppm").as("pre_c_ppm"),
        col("post_ppm").as("post_c_ppm"))
    tArm.crossJoin(broadcast(cArm))
      .select(col("n_treat"), col("n_ctrl"), col("pre_t_ppm"),
        col("post_t_ppm"), col("pre_c_ppm"), col("post_c_ppm"),
        ((col("post_t_ppm") - col("pre_t_ppm")) -
          (col("post_c_ppm") - col("pre_c_ppm"))).as("did_ppm"))
  }

  /** Churn-label builder: per signup cohort (month of first event), the
    * users whose LAST activity predates the observation edge by more
    * than `horizonMicros` — the leakage-safe label a retention model
    * trains on (the edge comes from the data itself, so rebuilding on a
    * longer extract moves the labels consistently).
    *
    * Plan: ONE combinable (min, max) groupBy collapses events to a row
    * per user; the corpus edge broadcasts; the cohort rollup is
    * month-cardinality. Output: (cohort, n_users, n_churned, churn_ppm). */
  def churnLabels(events: DataFrame, user: Column, ts: Column,
      horizonMicros: Long): DataFrame = {
    require(horizonMicros > 0, s"horizonMicros=$horizonMicros must be > 0")
    val u = events.select(user.as("user_id"), ts.as("ts"),
        unix_micros(ts).as("tus"))
      .groupBy("user_id")
      .agg(min(col("ts")).as("first_ts"), max(col("tus")).as("last_us"))
      .localCheckpoint(false)
    val edge = u.agg(max(col("last_us")).as("max_us"))
    u.crossJoin(broadcast(edge))
      .select(date_trunc("month", col("first_ts")).as("cohort"),
        when(col("last_us") < col("max_us") - horizonMicros, 1L)
          .otherwise(0L).as("churned"))
      .groupBy("cohort")
      .agg(count(lit(1)).as("n_users"), sum(col("churned")).as("n_churned"))
      .withColumn("churn_ppm", expr("n_churned * 1000000L DIV n_users"))
  }

  /** Out-of-order lateness audit: for each event, how far its event
    * time sits BEHIND the running maximum event time already seen in
    * its key's arrival order (`arrival` — here the ingest sequence
    * number standing in for processing order). The lateness histogram
    * is the number a streaming watermark is designed against: pick the
    * bucket covering your tolerated loss and read the delay off the
    * bucket bound. Buckets: −2 = first arrival of the key (no prior to
    * be late against), −1 = in order (lateness 0), else ⌊log2(µs)⌋ —
    * [[graft.ext.Profile.log2Emd]]'s integer-log trick, so the whole
    * audit is exact. Output per (type, bucket): n, max lateness µs.
    *
    * 100 TB posture: ONE user-keyed running-max window (arrival order
    * per key — never global), then a combinable (type, bucket) rollup
    * over ≤ types×65 cells. Same single-exchange shape as the funnel
    * family. */
  def latenessAudit(events: DataFrame, user: Column, arrival: Column,
      ts: Column, eventType: Column): DataFrame = {
    val w = Window.partitionBy(col("u")).orderBy(col("arr"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events.select(user.as("u"), arrival.as("arr"),
        unix_micros(ts).as("tus"), eventType.as("et"))
      .withColumn("prior_max", max(col("tus")).over(w))
      .withColumn("late_us",
        greatest(lit(0L), col("prior_max") - col("tus")))
      .groupBy(col("et").as("event_type"),
        when(col("prior_max").isNull, lit(-2L))
          .when(col("late_us") === 0L, lit(-1L))
          .otherwise((length(bin(col("late_us"))) - 1).cast("long"))
          .as("bucket"))
      .agg(count(lit(1)).as("n"), max(col("late_us")).as("max_late_us"))
  }
}
