package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable edit-distance near-pair finding — the blocked twin of the
  * bounded all-pairs verifier in `e2_edit_distance` (TextOps). The reference
  * has no string-similarity op at all (its dedup is exact
  * `drop_duplicates`, /root/reference/pipeline.py:107); this is the
  * string-level member of the near-dup family (titles, URLs, short fields)
  * where shingle/token methods overshoot.
  *
  * Candidate generation is the segment-pigeonhole scheme (the PassJoin idea,
  * Li/Deng/Feng VLDB 2011, public literature): partition the INDEXED string
  * into t+1 contiguous segments; if ed(a,b) ≤ t then at most t segments are
  * touched by edits, so at least one segment of b appears VERBATIM in a,
  * starting within ±t of its original position. So:
  *
  *   index side: each string emits its t+1 own segments, keyed
  *               (own_len, seg_idx, seg_str);
  *   probe side: each string emits, for every length m within ±t that
  *               actually occurs in the data (broadcast length dictionary —
  *               no fabricating windows for lengths nobody has), the
  *               substrings lying in the MULTI-MATCH-AWARE position window
  *               of each segment of a length-m partner (the paper's §4.2
  *               selection — Σ window widths ~t²/2+t+1, vs (t+1)(2t+1) for
  *               the naive ±t), keyed the same way;
  *   join on the key → candidate superset → exact `levenshtein` re-rank.
  *
  * NEVER all-pairs: the only shuffles are the (len, seg_idx, seg_str) key
  * join and the candidate dedup, and candidates shrink with segment
  * selectivity. Probe fanout is bounded: ≤ |lengths within ±t| × ~(t²/2+t+1)
  * (segment, window-position) combinations per row, all arithmetic on scan
  * columns (no data-sized state). Measured on the driver corpus (30-char
  * prefixes, pathological 31-word vocabulary): t=8 → 41% of all-pairs
  * survive as candidates, t=4 → 8% under the ±t windows; the multi-match
  * windows cut the measured cost a further ~1.5-1.6× (10×: 7.1 → 4.6 s
  * isolated min-of-3; 100×: 708 → ~440 s — see REGRESS_r11.json; the
  * window ratio is 13/45 but hot blocks concentrate in the wide middle
  * segments, so the realized cut is smaller); on a natural corpus
  * segments are near-unique and candidates are near-linear in matches.
  * The residual 100× cost is candidate-bound and intrinsic to EXACT
  * pairing on a corpus whose background distance sits just above t —
  * [[candidateStat]] prices it linearly before the join runs.
  *
  * Short strings (len ≤ t) don't have t+1 nonempty segments, so the
  * pigeonhole guarantee fails for SHORT×SHORT pairs only (a long partner can
  * always serve as the indexed side). Those pairs go through an explicit
  * length-banded join of the short slice against itself — bounded, because
  * strings of length ≤ t are a fixed tiny universe at any corpus size.
  */
object EditBlock {

  // integer arithmetic throughout (Column./ is double division; sequence()
  // needs integral endpoints)
  private def segStart(m: Column, i: Column, k: Int): Column =
    (lit(1) + i * floor(m / k).cast("int") + least(i, m % k)).cast("int")
  private def segLen(m: Column, i: Column, k: Int): Column =
    (floor(m / k).cast("int") +
      when(i < m % k, lit(1)).otherwise(lit(0))).cast("int")

  /** All unordered pairs `(id_a < id_b, dist)` with
    * `levenshtein(strCol_a, strCol_b) <= t`. Exact (lossless vs all-pairs):
    * candidate generation is a pigeonhole superset, re-rank is exact.
    *
    * Plan shape (measured at sf0.1, 7.4 s → ~2 s over the naive spelling):
    * both sides CARRY their string through the segment join, so the exact
    * levenshtein filter runs directly on the join output — no join-back of
    * a candidate-id table to the corpus, and no candidate-sized `distinct`:
    * a pair surfacing through several segments just re-verifies cheaply
    * (levenshtein of short strings is codegen'd) and only the tiny
    * surviving result is deduplicated. Probe substrings come from
    * `explode(sequence)` + `substr` — whole-stage codegen all the way into
    * the join, where the interpreted `array_distinct(transform(...))`
    * lambda spelling paid ~2 s by itself. Cost: join-wire rows are one
    * short string wider — the right trade for short fields (titles, URLs);
    * for long strings flip back to id-only candidates + join-back.
    */
  def nearPairs(df: DataFrame, idCol: String, strCol: String,
                t: Int): DataFrame = {
    require(t >= 1, "threshold must be >= 1")
    val (long, short, idx, probe) = segTables(df, idCol, strCol, t)

    val blocked = probe.join(idx, Seq("m", "si", "seg"))
      .filter(col("id_a") =!= col("id_b"))

    // short×short fallback: the pigeonhole needs > t nonempty segments
    val shortPairs = short.select(col("id").as("id_a"), col("s").as("s_a"),
        col("n").as("n_a"))
      .join(short.select(col("id").as("id_b"), col("s").as("s_b"),
        col("n").as("n_b")),
        col("id_a") =!= col("id_b") && abs(col("n_a") - col("n_b")) <= t)

    // verify via the banded early-exit kernel: exact distance for the ≤ t
    // pairs the query emits, O(t·len) with early termination on the ~all
    // rejected rows — full-matrix `levenshtein` here was ~70 s of the 76 s
    // query on the low-entropy 10× corpus (204M joined rows → 582 pairs)
    blocked.select("id_a", "s_a", "id_b", "s_b")
      .union(shortPairs.select("id_a", "s_a", "id_b", "s_b"))
      .withColumn("dist", graft.expressions.LevWithin(col("s_a"), col("s_b"), t))
      .filter(col("dist") >= 0)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        col("dist").cast("long").as("dist"))
      .distinct()
  }

  /** The shared (index, probe) segment tables of [[nearPairs]] and
    * [[candidateStat]] — ONE definition so the statistic counts exactly the
    * join the operator will run (EditBlockSpec pins that identity). */
  private[operators] def segTables(df: DataFrame, idCol: String,
      strCol: String,
      t: Int): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val k = t + 1
    // rebalance BEFORE the fan-out: candidate generation multiplies each row
    // ~t²/2× and the verify join runs in the same stage, so the
    // stage's parallelism is pinned to the SCAN's split count — a one-file
    // local corpus (or one hot split) would run the whole verify on one
    // core. The partition count is EXPLICIT because the input is small in
    // bytes but heavy in downstream compute: AQE's coalescing (sized for
    // bytes) would fold a bare repartition() back into one partition and
    // re-serialize the stage (measured at sf0.1: 20 s coalesced → ~3 s
    // spread). One narrow (id, s, n)-row shuffle is negligible vs the
    // fan-out it balances.
    val par = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val s = df.select(col(idCol).as("id"), col(strCol).as("s"),
      length(col(strCol)).as("n")).filter(col("s").isNotNull)
      .repartition(par, col("id"))
    val long = s.filter(col("n") > t)
    val short = s.filter(col("n") <= t)

    val si = explode(sequence(lit(0), lit(t))).as("si")
    // index side: own segments of every long string
    val idx = long.select(col("id").as("id_b"), col("s").as("s_b"),
        col("n").as("m"), si)
      .select(col("id_b"), col("s_b"), col("m"), col("si"),
        col("s_b").substr(segStart(col("m"), col("si"), k),
          segLen(col("m"), col("si"), k)).as("seg"))
      .filter(length(col("seg")) > 0)

    // probe side: substrings in the MULTI-MATCH-AWARE window of each segment
    // of a length-m partner, for the partner lengths that exist (broadcast
    // dictionary). The window is PassJoin's multi-match-aware substring
    // selection (Li/Deng/Feng VLDB 2011 §4.2), not the naive ±t: with
    // Δ = n − m, segment si (0-based) only needs start shifts
    //   d ∈ [max(−si, Δ − (t − si)), min(si, Δ + (t − si))]
    // — at most si edits can precede the FIRST untouched segment (each of
    // the si earlier segments is touched), and at most t − si can follow
    // the LAST one; the paper's completeness lemma composes the two into
    // one lossless window per segment. Σ window widths is ~t²/2 + t + 1
    // instead of (t+1)(2t+1): at t=4 that is 13 probe positions per
    // partner length instead of 45 — a 3.5× cut in probe fan-out
    // (realized candidate cut ~1.5×, because hot blocks concentrate in
    // the wide middle segments). The 100× sweep measured the ±t spelling
    // at 708 s on scale_sf10 (~91× its 10× cost: hot 6-char blocks on
    // the 31-word vocabulary); the exactness gate is EditBlockSpec's
    // all-pairs identity plus the driver oracle.
    val lens = long.select(col("n").as("m")).distinct()
    val probe = s.join(broadcast(lens), abs(col("n") - col("m")) <= t)
      .select(col("id").as("id_a"), col("s").as("s_a"), col("n"), col("m"), si)
      .withColumn("st", segStart(col("m"), col("si"), k))
      .withColumn("ln", segLen(col("m"), col("si"), k))
      .withColumn("dlt", (col("n") - col("m")).cast("int"))
      .withColumn("lo", greatest(lit(1),
        col("st") + greatest(-col("si"), col("dlt") - (lit(t) - col("si")))))
      .withColumn("hi", least(col("n") - col("ln") + 1,
        col("st") + least(col("si"), col("dlt") + (lit(t) - col("si")))))
      // guard BEFORE explode: sequence(lo, hi) with lo > hi would generate a
      // descending range, not an empty one
      .filter(col("ln") > 0 && col("lo") <= col("hi"))
      .select(col("id_a"), col("s_a"), col("m"), col("si"), col("ln"),
        explode(sequence(col("lo"), col("hi"))).as("p"))
      .select(col("id_a"), col("s_a"), col("m"), col("si"),
        col("s_a").substr(col("p"), col("ln")).as("seg"))

    (long, short, idx, probe)
  }

  /** Candidate-cardinality statistic of the blocking join — `candidates`
    * is Σ over (m, si, seg) blocks of probe_rows × index_rows, i.e. EXACTLY
    * the joined-row count the LONG-side blocking join of [[nearPairs]]'s
    * verify stage will enumerate (including the id_a = id_b self-matches
    * the operator then filters); `short_pairs` = n_short² is the loop-join
    * row count of the short×short fallback (a theta join on non-equi
    * conditions enumerates the full product before filtering, so the
    * square IS its enumerated cost, not a bound). Gate on
    * `candidates + short_pairs` — on a corpus dominated by strings of
    * length ≤ t the fallback is the quadratic term and `candidates` alone
    * prices near zero. All for the LINEAR cost of the two segment scans
    * plus one block-keyed aggregate, never the join itself.
    *
    * The g2 `cosharePairCount` posture applied to the edit family: exact
    * edit-distance pairing is candidate-QUADRATIC on a low-entropy corpus
    * (the 100× sweep measured the full corpus run at ~7-12 min because
    * ~10G candidates survive blocking on the 31-word driver vocabulary),
    * and the only honest defense is to SEE that number before paying it.
    * [[nearPairsRouted]] is that gate as code; `hottest_block` separates
    * "dense everywhere" from "one boilerplate key".
    *
    * One row: `(n_long, n_short, blocks, candidates, hottest_block,
    * short_pairs)`. Each derived table is consumed exactly once (probe →
    * pc, idx → ic, their join → the block aggregate), so the pricing plan
    * is itself lint-clean — no repeated Generate, nothing materialized. */
  def candidateStat(df: DataFrame, idCol: String, strCol: String,
      t: Int): DataFrame = {
    require(t >= 1, "threshold must be >= 1")
    val (long, short, idx, probe) = segTables(df, idCol, strCol, t)
    val pc = probe.groupBy("m", "si", "seg").agg(count(lit(1)).as("pc"))
    val ic = idx.groupBy("m", "si", "seg").agg(count(lit(1)).as("ic"))
    val blocks = pc.join(ic, Seq("m", "si", "seg"))
      .select((col("pc") * col("ic")).as("cand"))
    val joined = blocks.agg(
      count(lit(1)).as("blocks"),
      coalesce(sum(col("cand")), lit(0L)).as("candidates"),
      coalesce(max(col("cand")), lit(0L)).as("hottest_block"))
    // 1-row aggregates — the sanctioned condition-free tiny crossJoin
    long.agg(count(lit(1)).as("n_long"))
      .crossJoin(short.agg(count(lit(1)).as("n_short")))
      .crossJoin(joined)
      .withColumn("short_pairs", col("n_short") * col("n_short"))
  }

  /** [[candidateStat]] for EVERY threshold τ ∈ [1, tMax] in ONE plan — one
    * row per τ: `(t, n_long, n_short, blocks, candidates, hottest_block,
    * short_pairs)`. The round-12 [[priceRoute]] re-ran `candidateStat` per
    * step-down τ (≤ t sequential actions, each re-scanning the corpus);
    * here τ is just another explode dimension — every string fans out to
    * (τ, segment/window) key rows for all τ at once, the per-τ corpus
    * counts ride the same union as a null-key leg, and ONE two-level
    * aggregation yields the whole monotone pricing vector, so routing is a
    * single action regardless of how far it steps down (EditBlockSpec pins
    * both the per-τ equality with [[candidateStat]] and the one-execution
    * accounting). KEY-ONLY rows (no id/string payload) — the statistic's
    * wire is (τ, m, si, seg) + four tag longs, partial-aggregated map-side.
    *
    * Cost note, measured at 10× (local[32]): the all-τ fan-out is ~1.8× the
    * τ=4-only generation (Σ_τ window·lens weights), but one action instead
    * of up to four and no payload columns — net ~even when the requested t
    * is affordable, and strictly cheaper the further the route steps down
    * (the 100× corpus steps 4→2: one action instead of three). */
  def candidateStatVector(df: DataFrame, idCol: String, strCol: String,
      tMax: Int): DataFrame = {
    require(tMax >= 1, "threshold must be >= 1")
    // column twins of segStart/segLen with k = t+1 as a COLUMN (the scalar
    // versions take k as an Int; here t varies per row)
    def cStart(m: Column, i: Column, t: Column): Column =
      (lit(1) + i * floor(m / (t + 1)).cast("int") +
        least(i, m % (t + 1))).cast("int")
    def cLen(m: Column, i: Column, t: Column): Column =
      (floor(m / (t + 1)).cast("int") +
        when(i < m % (t + 1), lit(1)).otherwise(lit(0))).cast("int")
    val par = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val s = df.select(col(idCol).as("id"), col(strCol).as("s"),
        length(col(strCol)).as("n")).filter(col("s").isNotNull)
      .repartition(par, col("id"))
      .select(col("s"), col("n"))
    val st = s.select(col("s"), col("n"),
      explode(sequence(lit(1), lit(tMax))).as("t"))
    val zero = lit(0L)
    // index leg: own segments of the τ-long (n > τ) strings, key-only
    val idxK = st.filter(col("n") > col("t"))
      .select(col("s"), col("n").as("m"), col("t"),
        explode(sequence(lit(0), col("t"))).as("si"))
      .select(col("t"), col("m"), col("si"),
        col("s").substr(cStart(col("m"), col("si"), col("t")),
          cLen(col("m"), col("si"), col("t"))).as("seg"))
      .filter(length(col("seg")) > 0)
      .select(col("t"), col("m"), col("si"), col("seg"),
        zero.as("pc"), lit(1L).as("ic"), zero.as("lc"), zero.as("sc"))
    // probe leg: the multi-match-aware window substrings (same arithmetic
    // as segTables, t as a column). lens twin: a length m occurring in the
    // corpus is a τ-long partner length iff m > τ — one broadcast distinct
    // over ALL lengths serves every τ.
    val lensAll = s.select(col("n").as("m")).distinct()
    val probeK = st.join(broadcast(lensAll),
        abs(col("n") - col("m")) <= col("t") && col("m") > col("t"))
      .select(col("s"), col("n"), col("m"), col("t"),
        explode(sequence(lit(0), col("t"))).as("si"))
      .withColumn("st", cStart(col("m"), col("si"), col("t")))
      .withColumn("ln", cLen(col("m"), col("si"), col("t")))
      .withColumn("dlt", (col("n") - col("m")).cast("int"))
      .withColumn("lo", greatest(lit(1), col("st") +
        greatest(-col("si"), col("dlt") - (col("t") - col("si")))))
      .withColumn("hi", least(col("n") - col("ln") + 1, col("st") +
        least(col("si"), col("dlt") + (col("t") - col("si")))))
      .filter(col("ln") > 0 && col("lo") <= col("hi"))
      .select(col("s"), col("t"), col("m"), col("si"), col("ln"),
        explode(sequence(col("lo"), col("hi"))).as("p"))
      .select(col("t"), col("m"), col("si"),
        col("s").substr(col("p"), col("ln")).as("seg"),
        lit(1L).as("pc"), zero.as("ic"), zero.as("lc"), zero.as("sc"))
    // corpus-count leg: per-τ long/short tallies under a null block key
    val cntK = st.select(col("t"),
      lit(null).cast("int").as("m"), lit(null).cast("int").as("si"),
      lit(null).cast("string").as("seg"), zero.as("pc"), zero.as("ic"),
      when(col("n") > col("t"), 1L).otherwise(0L).as("lc"),
      when(col("n") <= col("t"), 1L).otherwise(0L).as("sc"))
    probeK.unionByName(idxK).unionByName(cntK)
      .groupBy("t", "m", "si", "seg")
      .agg(sum("pc").as("pc"), sum("ic").as("ic"),
        sum("lc").as("lc"), sum("sc").as("sc"))
      .groupBy("t").agg(
        sum("lc").as("n_long"), sum("sc").as("n_short"),
        coalesce(sum(when(col("pc") > 0 && col("ic") > 0, 1L)
          .otherwise(0L)), lit(0L)).as("blocks"),
        coalesce(sum(col("pc") * col("ic")), lit(0L)).as("candidates"),
        coalesce(max(col("pc") * col("ic")), lit(0L)).as("hottest_block"))
      .withColumn("short_pairs", col("n_short") * col("n_short"))
  }

  /** One routing decision of [[nearPairsRouted]], with the numbers it was
    * made from — returned to the caller and stamped onto every output row
    * so a downstream consumer (or the driver oracle) can re-derive it. */
  final case class RouteDecision(route: String, tUsed: Int,
      pricedCandidates: Long, budget: Long)

  /** Price the blocking join for every τ ≤ t in ONE action
    * ([[candidateStatVector]]) and pick the largest τ whose
    * `candidates + short_pairs` fits `candidateBudget` — identical to the
    * round-12 step-down (scanning τ = t, t−1, … and stopping at the first
    * affordable τ IS the max affordable τ), but one job instead of up to
    * t sequential pricings. Returns the decision: `exact` when the
    * requested t is affordable, `capped` when only a tighter τ < t is (the
    * capped path bounds OUTPUT as well — a corpus adversarial enough to
    * blow the candidate budget is the same corpus whose duplicate families
    * blow the pair sink). Throws when even τ = 1 is over budget: silently
    * running a priced-unaffordable join is the exact failure mode the
    * statistic exists to prevent, so the caller must raise the budget (or
    * sample the corpus) CONSCIOUSLY. Driver cost: one ≤t-row collect. */
  def priceRoute(df: DataFrame, idCol: String, strCol: String,
      t: Int, candidateBudget: Long): RouteDecision = {
    require(candidateBudget >= 1, "candidateBudget must be >= 1")
    // an empty corpus yields an empty vector: every τ prices 0 (affordable)
    val totals = candidateStatVector(df, idCol, strCol, t)
      .select(col("t"),
        (col("candidates") + col("short_pairs")).as("total"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    var cur = t
    while (cur >= 1) {
      val priced = totals.getOrElse(cur, 0L)
      if (priced <= candidateBudget)
        return RouteDecision(if (cur == t) "exact" else "capped",
          cur, priced, candidateBudget)
      cur -= 1
    }
    throw new IllegalStateException(
      s"edit-distance blocking join is over budget at every t in [1, $t] " +
        s"(budget $candidateBudget); raise the budget or sample the corpus")
  }

  /** [[nearPairs]] behind the [[candidateStat]] gate — the routing entry
    * point round-11 documented but did not ship. Prices the blocking join
    * BEFORE running it: affordable at the requested t → the exact
    * operator; affordable only at a tighter t' → [[nearPairsCapped]] at t'
    * under `perDocBudget` (enumeration bounded by the re-priced t',
    * output bounded by the cap — the two quadratics a pathological corpus
    * detonates); affordable nowhere → throws (see [[priceRoute]]). The
    * decision and its inputs ride on every output row (`route`, `t_used`,
    * `priced_candidates`, `budget` — constant columns, zero per-row cost)
    * so the route taken is part of the checked result, not a log line.
    *
    * Budget calibration, measured on the 31-word-vocabulary corpus at
    * local[32]: ~10⁸ candidates verify in ~5 s (≈ 22M/s with the banded
    * early-exit kernel), so a 5×10⁸ budget prices as ~25 s of verify —
    * the 100× fixture routes 10.56G@t=4 → 395M@t=2 (~20× cheaper) while
    * every smaller fixture stays exact at t=4. */
  def nearPairsRouted(df: DataFrame, idCol: String, strCol: String,
      t: Int, candidateBudget: Long, perDocBudget: Int): DataFrame = {
    val d = priceRoute(df, idCol, strCol, t, candidateBudget)
    val pairs =
      if (d.route == "exact") nearPairs(df, idCol, strCol, d.tUsed)
      else nearPairsCapped(df, idCol, strCol, d.tUsed, perDocBudget)
    pairs.withColumn("route", lit(d.route))
      .withColumn("t_used", lit(d.tUsed.toLong))
      .withColumn("priced_candidates", lit(d.pricedCandidates))
      .withColumn("budget", lit(d.budget))
  }

  /** Each pair's WORST per-endpoint rank: the pair set unrolled into a
    * symmetric (endpoint d, partner p) view — so a document's rank counts
    * ALL its pairs, whichever side of the `id_a < id_b` normalization it
    * sits on (ranking the two roles separately would let a doc keep up to
    * 2× the budget) — ranked within each endpoint by (dist, partner id)
    * (deterministic: a (doc, partner) pair is unique), then folded back to
    * one row per pair carrying max(rank of a, rank of b). One
    * endpoint-partitioned window + one pair-key aggregate, both over the
    * output-sized pair set. */
  private def worstRank(pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sym = pairs.select(col("id_a"), col("id_b"), col("dist"),
        col("id_a").as("d"), col("id_b").as("p"))
      .unionAll(pairs.select(col("id_a"), col("id_b"), col("dist"),
        col("id_b").as("d"), col("id_a").as("p")))
    sym.withColumn("rk", row_number().over(
        Window.partitionBy("d").orderBy(col("dist"), col("p"))))
      .groupBy("id_a", "id_b", "dist").agg(max(col("rk")).as("worst_rank"))
  }

  /** [[nearPairs]] under a per-document pair budget — the production
    * spelling for corpora whose duplicate-family structure is UNKNOWN. The
    * exact operator's output is Ω(Σ family²): correct, but on a pathological
    * corpus (one template boilerplate-stamped a million times) the OUTPUT
    * is what detonates, silently, as a quadratic write. Here each document
    * keeps at most its `perDocBudget` closest pairs (rank by (dist,
    * partner), drop a pair either endpoint ranks out) — output ≤
    * budget·docs by construction, so a downstream sink is provisioned, not
    * surprised. Deterministic truncation, audited not silent: run
    * [[pairAudit]] alongside (the g2_coshare_audit pattern) — its
    * `capped_rows` is EXACTLY the rows this spelling drops, and the
    * catalog's `e2_edit_blocked_audit` row keeps that count
    * oracle-checked at 0 on the driver corpus, where the budget never
    * binds and this spelling equals [[nearPairs]] row-for-row.
    *
    * Scale shape: two window shuffles over the PAIRS OUTPUT (the quantity
    * being bounded), partitioned by endpoint id — never the corpus. For
    * near-dedup the kept set is the right semantics: a doc in a giant
    * family still surfaces with its closest partners, and family
    * membership recovers through connected components on the kept pairs.
    */
  def nearPairsCapped(df: DataFrame, idCol: String, strCol: String,
      t: Int, perDocBudget: Int): DataFrame = {
    require(perDocBudget >= 1, "perDocBudget must be >= 1")
    // materialize the pair set once before worstRank's symmetric self-union
    // doubles the plan: two leaf references to an un-checkpointed nearPairs
    // re-run the whole blocking join (10x: the audit row read 14.2 s where
    // nearPairs alone is 8.8 s). Output-sized — pairs, not corpus.
    worstRank(nearPairs(df, idCol, strCol, t).localCheckpoint(true, Ckpt.SerLevel))
      .filter(col("worst_rank") <= perDocBudget)
      .drop("worst_rank")
  }

  /** One-row truncation audit for a `(id_a, id_b, dist)` pair set against a
    * per-document budget: `(budget, total_pairs, max_pairs_per_doc,
    * docs_over_budget, capped_rows)`, where `capped_rows` is exactly the
    * pair count [[nearPairsCapped]] would drop at this budget. Cheap enough
    * to run with every production pass — the aggregates are output-sized —
    * and oracle-checked in the catalog, so output blowup surfaces as a
    * nonzero integer in monitoring instead of a full disk at 3 a.m. */
  def pairAudit(pairs: DataFrame, budget: Int): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    // four leaf references below (degree view x2, worstRank's symmetric
    // view x2): when handed a PLAN rather than an already-materialized pair
    // set — the catalog row audits nearPairs directly — each reference
    // would re-run the blocking join. One output-sized checkpoint makes the
    // audit O(pairs) on top of whatever produced them.
    val p = pairs.localCheckpoint(true, Ckpt.SerLevel)
    val deg = p.select(col("id_a").as("id"))
      .unionAll(p.select(col("id_b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    val degAgg = deg.agg(
      coalesce(max(col("d")), lit(0L)).as("max_pairs_per_doc"),
      coalesce(sum(when(col("d") > budget, 1L).otherwise(0L)), lit(0L))
        .as("docs_over_budget"))
    val pairAgg = worstRank(p).agg(
      count(lit(1)).as("total_pairs"),
      coalesce(sum(when(col("worst_rank") > budget, 1L)
        .otherwise(0L)), lit(0L)).as("capped_rows"))
    // two 1-row aggregates — the sanctioned condition-free tiny crossJoin
    pairAgg.crossJoin(degAgg)
      .select(lit(budget.toLong).as("budget"), col("total_pairs"),
        col("max_pairs_per_doc"), col("docs_over_budget"), col("capped_rows"))
  }
}
