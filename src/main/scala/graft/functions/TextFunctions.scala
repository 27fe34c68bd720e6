package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Column-level text primitives (tokenize, shingle, hash-sketch) built from
  * codegen'd built-ins and higher-order functions — no UDFs in these paths,
  * so whole-stage codegen spans hold (SURVEY.md §2b E2/E4).
  */
object TextFunctions {

  /** Whitespace-collapse + lowercase normalization (near-dedup canon form). */
  def normText(c: Column): Column =
    lower(regexp_replace(c, "\\s+", " "))

  /** Non-empty whitespace tokens. */
  def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= "")

  /** DuckDB rendering of [[tokens]] over the `text` column. */
  val tokensSql: String =
    "list_filter(string_split_regex(text, '\\s+'), t -> t <> '')"

  /** BPE-ish greedy piece split: letter runs, digit runs, single symbols. */
  def bpeIsh(c: Column): Column =
    regexp_extract_all(c, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))

  /** Per-code-point counts `array<struct<c,cnt>>` — the one-pass kernel
    * behind e4_char_entropy ([[graft.expressions.CharCounts]]); exploding
    * it yields exactly the rows of the per-char regex explode + (doc, c)
    * count. */
  def charCounts(c: Column): Column = graft.expressions.CharCounts(c)

  /** Adjacent (a[i], a[i+1]) pairs of an array — the map-side bigram
    * kernel ([[graft.expressions.AdjacentPairs]]); exploding it yields
    * exactly the posexplode→lead(1)→non-null pairs. */
  def adjacentPairs(c: Column): Column = graft.expressions.AdjacentPairs(c)

  /** Per-doc token counts `array<struct<t,cnt>>` — the (doc, term)-grain
    * kernel ([[graft.expressions.ArrayElementCounts]] over [[tokens]]);
    * exploding it yields exactly the rows of
    * `explode(tokens(text))` + `groupBy(doc_id, t).count()`. */
  def tokenCounts(c: Column): Column =
    graft.expressions.ArrayElementCounts(tokens(c))

  /** Distinct character n-grams — the native one-pass kernel
    * ([[graft.expressions.ShingleSet]]); bit-identical to [[shinglesHof]]
    * but codegen'd, without per-shingle interpreted-lambda dispatch. */
  def shingles(c: Column, n: Int): Column =
    graft.expressions.ShingleSet(c, n)

  /** HOF reference spelling of [[shingles]] (kept for cross-checking).
    * Empty array when the text is shorter than `n` (Spark's
    * `sequence(1, 0)` counts DOWN — it must be guarded, unlike DuckDB's
    * generate_series which returns empty). */
  def shinglesHof(c: Column, n: Int): Column =
    when(length(c) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), length(c) - (n - 1)),
        i => substring(c, i, lit(n)))))

  val stopwords: Seq[String] =
    Seq("a", "the", "an", "of", "to", "and", "in", "is", "on", "for")

  val stopwordsSql: String = stopwords.map(w => s"'$w'").mkString(", ")

  /** Stopword profiles for the language-ID heuristic (order = argmax
    * tiebreak order, lang ascending). */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "los", "y", "en", "es"),
    "fr" -> Seq("le", "la", "et", "de", "est"),
    "zh" -> Seq("de", "shi", "he", "zai", "le"))

  /** DuckDB shingle-set rendering (distinct n-grams of `text`). */
  def shinglesSql(n: Int): String =
    s"""list_distinct(list_transform(
       generate_series(1, greatest(length(text) - ${n - 1}, 0)),
       i -> substring(text, CAST(i AS INT), $n)))"""

  /** Shared CTE chain ending in `jp(doc_a, doc_b, jaccard)` — the exact
    * 5-gram Jaccard pairs of `documents WHERE where` at `threshold`. */
  private def jaccardPairsCte(threshold: Double, where: String): String =
    s"""sh AS (SELECT doc_id, unnest(${shinglesSql(5)}) AS s
        FROM documents WHERE $where),
      sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
      jp AS (SELECT doc_a, doc_b,
          CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
        FROM pairs JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= $threshold)"""

  /** Brute-force exact n-gram Jaccard oracle (5-grams), same output schema as
    * the engine's posting-list and MinHash queries. */
  def jaccardOracleSql(threshold: Double, where: String = "TRUE"): String =
    s"""WITH ${jaccardPairsCte(threshold, where)}
      SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard
      FROM jp ORDER BY doc_a, doc_b"""

  /** [[jaccardOracleSql]] with an extra PAIR-level predicate — the oracle for
    * incremental dedup, where only pairs touching the arriving batch count. */
  def jaccardPairsOracleSql(threshold: Double, pairWhere: String): String =
    s"""WITH ${jaccardPairsCte(threshold, "TRUE")}
      SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard
      FROM jp WHERE $pairWhere ORDER BY doc_a, doc_b"""

  /** DuckDB replay of the connected-components cluster query: transitive
    * closure of the Jaccard pair graph via a recursive CTE (labels = every
    * id reachable from a vertex; component id = the min), sizes joined on.
    * Matches [[graft.operators.ConnectedComponents.clusters]]'s fixpoint. */
  def ccClustersOracleSql(threshold: Double, where: String): String =
    s"""WITH RECURSIVE ${jaccardPairsCte(threshold, where)},
      edges AS (SELECT doc_a AS a, doc_b AS b FROM jp
        UNION ALL SELECT doc_b, doc_a FROM jp),
      reach AS (SELECT DISTINCT a AS id, a AS label FROM edges
        UNION
        SELECT e.b AS id, r.label FROM reach r JOIN edges e ON r.id = e.a),
      lab AS (SELECT id, min(label) AS cluster_id FROM reach GROUP BY id),
      sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lab
        GROUP BY cluster_id)
      SELECT l.id AS doc_id, l.cluster_id, sz.cluster_size
      FROM lab l JOIN sz USING (cluster_id) ORDER BY doc_id"""

  /** DuckDB replay of the end-to-end dedup DECISION report: transitive
    * closure of the Jaccard pair graph (as [[ccClustersOracleSql]]), keeper
    * = min-id member (≡ the cluster label), then the per-cluster retention
    * accounting joined back to document sizes. */
  def dedupReportOracleSql(threshold: Double, where: String): String =
    s"""WITH RECURSIVE ${jaccardPairsCte(threshold, where)},
      edges AS (SELECT doc_a AS a, doc_b AS b FROM jp
        UNION ALL SELECT doc_b, doc_a FROM jp),
      reach AS (SELECT DISTINCT a AS id, a AS label FROM edges
        UNION
        SELECT e.b AS id, r.label FROM reach r JOIN edges e ON r.id = e.a),
      lab AS (SELECT id, min(label) AS cluster_id FROM reach GROUP BY id)
      SELECT cluster_id AS keeper_doc, count(*) AS n_members,
        count(*) - 1 AS n_removed,
        CAST(sum(CASE WHEN id <> cluster_id THEN n_chars ELSE 0 END)
          AS BIGINT) AS chars_removed
      FROM lab JOIN documents ON lab.id = documents.doc_id
      GROUP BY cluster_id ORDER BY keeper_doc"""

  /** Language-ID oracle: same stopword scoring + same argmax chain. */
  val langIdOracleSql: String = {
    val scores = langProfiles.map { case (lang, words) =>
      val lst = words.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(toks, t -> t IN ($lst))) AS s_$lang"
    }.mkString(", ")
    val langs = langProfiles.map(_._1)
    val cases = langs.dropRight(1).map { lang =>
      val others = langs.filter(_ != lang).map(l => s"s_$l").mkString(", ")
      s"WHEN s_$lang >= greatest($others) THEN '$lang'"
    }.mkString(" ")
    s"""WITH t AS (SELECT doc_id, lang AS labeled_lang, $tokensSql AS toks
        FROM documents),
      s AS (SELECT doc_id, labeled_lang, $scores FROM t)
      SELECT doc_id, labeled_lang,
        CASE $cases ELSE '${langs.last}' END AS pred_lang,
        CAST(CASE $cases ELSE '${langs.last}' END = labeled_lang AS INT) AS agrees
      FROM s ORDER BY doc_id"""
  }

  // -------------------------------------------------------------------
  // MinHash + LSH (SURVEY.md §2b E2): shingle → k permuted min-hashes via
  // double hashing h1 + i·h2 → band buckets → candidate pairs → exact
  // Jaccard verification. Candidates carry only (doc_a, doc_b); shingle
  // sets re-join by id, so no data-sized payload rides the bucket shuffle.
  // -------------------------------------------------------------------

  /** The persisted signature artifact a nightly near-dedup run keeps:
    * `(doc_id, shset, mh)` — shingle set + MinHash signature, computed ONCE
    * per document ever. The nightly job appends the night's batch
    * signatures to this table; [[minhashIncrementalPairs]] consumes it
    * without touching store-side text. ~O(n_docs) rows, far smaller than
    * the corpus (the shset column is the exact-verify payload; a
    * recall-only deployment can drop it and verify against raw text). */
  /** Lossless candidate prune implied by the verify predicate:
    * `jaccard(A,B) >= t` forces `|A∩B| >= t·|A∪B|`, and
    * `|A∩B| <= min(|A|,|B|)`, `|A∪B| >= max(|A|,|B|)`, so
    * `min >= t·max`. Pushed INTO the banding join condition so hot
    * band buckets (heavy-hitter shingles — boilerplate-dominated web
    * corpora, or the driver's 31-word scale_sf1 vocabulary) pay O(1)
    * per enumerated pair instead of shipping a candidate row into the
    * dedup + payload-join + exact-verify tail. Epsilon guard so float
    * rounding of `t·max` can never reject a pair exact verify keeps
    * (measured scale_sf1: 419k → 241k candidates, output identical). */
  private def sizeRatioOk(a: Column, b: Column, t: Double): Column =
    least(a, b).cast(DoubleType) >=
      lit(t) * greatest(a, b).cast(DoubleType) - lit(1e-9)

  /** Per-doc signature SKETCH for the pre-verify agreement filter: the low
    * byte of each of the `numHashes` minhash slots, as `array<tinyint>`
    * (~1/8 the weight of carrying the long slots through the banding
    * shuffle). Slot equality implies byte equality, so byte agreement is a
    * SUPERSET test of slot agreement — it can only over-admit (per-slot
    * false agreement 1/256), never drop a pair the full-slot filter would
    * keep. */
  private def sigSketch(mh: Column): Column =
    transform(mh, _.cast("tinyint"))

  /** Signature-agreement pre-verify filter (the 100× probe fix, §15): on a
    * corpus whose shingle space is small relative to the corpus (the
    * driver's ~31-word vocabulary; boilerplate-heavy crawls in practice),
    * the banding false-positive rate is a CONSTANT per pair — band
    * candidates then grow quadratically with the corpus while true output
    * stays tiny (measured: ~10³ candidates at sf0.1 → 23.5M at 100×, where
    * joining the sorted shingle arrays onto every candidate wrote a
    * 13.5 GB shuffle and OOMed the 8 GB probe heap before verify could
    * discard 99.99% of them). The minhash SIGNATURE the banding pass
    * already computed is itself a Jaccard estimator with `numHashes`
    * independent slots, so candidates are pre-filtered INSIDE the band
    * join condition on sketch agreement ≥ (threshold − 0.3) before any
    * shingle payload moves: O(numHashes) bytes per enumerated pair, like
    * [[sizeRatioOk]].
    *
    * Deterministic (fixed hash family) and, at these margins, lossless in
    * the same sense banding itself is: a true pair AT the threshold
    * (J = 0.8) has slot agreement ~ Binomial(64, 0.8)/64 — the 0.5 cut
    * sits 4.6 sd below its mean (P(drop) ≈ 1e-7, vs the band guarantee's
    * own 1 − (1 − t⁸)⁸ ≈ 0.99); byte-collision over-admission only widens
    * recall further. Exact-Jaccard verify still runs AFTER the filter, so
    * admitted-pair results are bit-identical; the driver oracle re-proves
    * corpus recall 1.0 per fixture, and DedupSpec pins a planted
    * at-threshold pair. On a corpus whose TRUE near-dup mass is quadratic
    * (wall-to-wall boilerplate) the filter keeps every true pair and the
    * operator is honestly output-bound — the e2_edit_blocked regime. */
  private def sketchAgreeOk(a: Column, b: Column, t: Double): Column =
    graft.expressions.SketchAgreement(a, b).cast(DoubleType) >=
      lit(math.max(0.0, t - 0.3)) * size(a).cast(DoubleType) - lit(1e-9)

  def signatureTable(docs: DataFrame, numHashes: Int,
      shingleLen: Int): DataFrame =
    // the no-shingle guard is the CHEAP equivalent precondition
    // length(text) >= shingleLen (character count == the kernel's empty
    // condition), applied BEFORE the shingle projection: a filter on the
    // computed column would push below it re-substituted as
    // size(shingle_set(text)) > 0 and evaluate the shingle kernel twice
    // per doc (found via the e4_fingerprint plan pin)
    docs.filter(length(col("text")) >= shingleLen)
      .select(col("doc_id"), shingles(col("text"), shingleLen).as("shset"))
      .select(col("doc_id"), col("shset"),
        graft.expressions.MinHashSig(col("shset"), numHashes).as("mh"))

  /** Incremental MinHash-LSH near-dedup: check an ARRIVING batch against the
    * PERSISTED signature store and against itself. `storeSig` is the
    * `(doc_id, shset, mh)` table written by [[signatureTable]] at the last
    * close — this entry point never re-shingles nor re-hashes the store
    * side (round-4 verdict: the previous form re-signed the whole store
    * in-query, an O(corpus) nightly cost that defeats the point of an
    * incremental operator). Nightly cost is O(batch) signatures (one fused
    * localCheckpoint, batch side only) + a band equi-join against the
    * stored signatures + exact verify on candidates via the STORED shingle
    * sets. Same banding/verify kernel as [[minhashLshPairs]]; assumes
    * store ids < batch ids (the arrival order), so emitted pairs keep
    * doc_a < doc_b. */
  def minhashIncrementalPairs(storeSig: DataFrame, batch: DataFrame,
      numHashes: Int, bands: Int, shingleLen: Int,
      threshold: Double): DataFrame =
    // ONE eager materialization, batch side only — the store is already
    // materialized (it's last night's parquet artifact).
    minhashIncrementalPairsFromSig(storeSig,
      signatureTable(batch, numHashes, shingleLen).localCheckpoint(true, graft.operators.Ckpt.SerLevel),
      numHashes, bands, threshold)

  /** [[minhashIncrementalPairs]] with the batch ALREADY signed: `batchSig`
    * is a materialized `(doc_id, shset, mh)` table ([[signatureTable]]
    * output, localCheckpoint'd or read from parquet). The streaming
    * composition ([[graft.streaming.DedupStreaming]]) signs each
    * micro-batch exactly once and reuses the table here AND as the store
    * append — signing twice per batch would double the only O(batch) text
    * pass the incremental contract allows. */
  def minhashIncrementalPairsFromSig(storeSig: DataFrame, shBatch: DataFrame,
      numHashes: Int, bands: Int, threshold: Double): DataFrame = {
    require(numHashes % bands == 0)
    val rows = numHashes / bands
    def buckets(sh: DataFrame) = {
      val bandCols = (0 until bands).map { b =>
        struct(lit(b).as("band"),
          struct((0 until rows).map(r =>
            col("mh").getItem(b * rows + r).as(s"r$r")): _*).as("sig"))
      }
      sh.select(col("doc_id"), size(col("shset")).as("sz"),
        sigSketch(col("mh")).as("sk"),
        explode(array(bandCols: _*)).as("bucket"))
    }
    val bStore = buckets(storeSig)
    val bBatch = buckets(shBatch)
    // doc_a < doc_b is ENFORCED, not assumed: under the documented contract
    // (store ids < batch ids, the arrival order) the predicate is a no-op,
    // but a caller with interleaved ids would otherwise get misordered pairs
    // here and silently dropped candidates at the batch-only verify join
    // below — the guard turns the assumption into checked behavior
    // (round-5 advice).
    val cand = bStore.as("a").join(bBatch.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id") &&
          sizeRatioOk(col("a.sz"), col("b.sz"), threshold) &&
          sketchAgreeOk(col("a.sk"), col("b.sk"), threshold))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .unionByName(bBatch.as("a").join(bBatch.as("b"),
          col("a.bucket") === col("b.bucket") &&
            col("a.doc_id") < col("b.doc_id") &&
            sizeRatioOk(col("a.sz"), col("b.sz"), threshold) &&
            sketchAgreeOk(col("a.sk"), col("b.sk"), threshold))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")))
      .dropDuplicates("doc_a", "doc_b")
    // Exact verify fetches shingle sets of CANDIDATES only: doc_b is always
    // a batch doc (store ids < batch ids), doc_a joins store ∪ batch. Sets
    // are sorted once per DOCUMENT (not per pair) so the intersection is a
    // linear merge ([[graft.expressions.SortedIntersectSize]]) instead of a
    // per-pair hash-set rebuild.
    val sets = storeSig.select(col("doc_id"), col("shset"))
      .unionByName(shBatch.select(col("doc_id"), col("shset")))
    cand
      .join(sets.select(col("doc_id").as("doc_a"),
        array_sort(col("shset")).as("sa")), "doc_a")
      .join(shBatch.select(col("doc_id").as("doc_b"),
        array_sort(col("shset")).as("sb")), "doc_b")
      .withColumn("inter",
        graft.expressions.SortedIntersectSize(col("sa"), col("sb")))
      .withColumn("jaccard", col("inter").cast(DoubleType) /
        (size(col("sa")) + size(col("sb")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  def minhashLshPairs(docs: DataFrame, numHashes: Int, bands: Int,
                      shingleLen: Int, threshold: Double): DataFrame = {
    require(numHashes % bands == 0)
    val rows = numHashes / bands
    // ONE materialization pass (localCheckpoint truncates lineage) of the
    // FUSED per-row signature kernel ([[graft.expressions.ShingleMinHash]]):
    // (doc_id, sz, mh) — ~500 B/doc — feeds both bucket arms of the banding
    // self-join. The shingle sets themselves are NEVER materialized
    // corpus-wide: the staged MinHashSig(ShingleSet(text)) spelling built
    // (and checkpointed) one UTF8String per shingle, which was 6.8 s of the
    // 9.5 s query on a 50k-doc natural corpus (ProfileLshSkew, round 8) —
    // at 100 TB that shingle store is a corpus-sized write amplification.
    // `mh` is bit-identical to the staged form (same XXH64-over-gram-bytes,
    // same splitmix64 schedule), so banding and results are unchanged.
    // Docs too short to shingle surface as null signatures and are dropped —
    // the explode formulation dropped them implicitly; without the guard
    // every short doc would share the all-MaxValue signature, bucket
    // together, and emit NaN-jaccard pairs.
    // NOTE: the tempting h1 + i·h2 double-hashing form is BROKEN for
    // min-hashing when h2's range (int) is tiny relative to h1's (long):
    // every "permutation" then shares h1's argmin, all k signature slots
    // collapse to one, and banding degenerates to shared-argmin buckets
    // (measured: 7.6M candidate pairs instead of ~10³).
    // short-doc guard as the cheap length precondition, NOT
    // filter(sig.isNotNull): pushdown would re-substitute the fused kernel
    // into the filter and sign every doc TWICE (the e4_fingerprint lesson)
    val sh = docs.filter(length(col("text")) >= shingleLen)
      .select(col("doc_id"),
        graft.expressions.ShingleMinHash(col("text"), shingleLen, numHashes)
          .as("sig"))
      .select(col("doc_id"), col("sig.sz").as("sz"), col("sig.mh").as("mh"))
      .localCheckpoint(true, graft.operators.Ckpt.SerLevel)
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        struct((0 until rows).map(r =>
          col("mh").getItem(b * rows + r).as(s"r$r")): _*).as("sig"))
    }
    val buckets = sh.select(col("doc_id"), col("sz"),
      sigSketch(col("mh")).as("sk"),
      explode(array(bandCols: _*)).as("bucket"))
    val cand = buckets.as("a").join(buckets.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id") &&
          sizeRatioOk(col("a.sz"), col("b.sz"), threshold) &&
          sketchAgreeOk(col("a.sk"), col("b.sk"), threshold))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      // checkpointed so the banding join runs ONCE: the candidate table
      // feeds both the id-filter below and the final verify join
      .localCheckpoint(true, graft.operators.Ckpt.SerLevel)
    // Exact verify rebuilds shingle sets ONLY for docs that survived
    // banding: the distinct candidate ids broadcast into a semi-join filter
    // of the corpus scan, so the O(|shingles|) string materialization is
    // O(candidates), not O(corpus). Sets sorted once per DOCUMENT; the
    // per-pair intersection is then a linear merge
    // ([[graft.expressions.SortedIntersectSize]]) rather than an
    // `array_intersect` hash-set rebuild per candidate — the dominant
    // verify cost when hot buckets inflate the candidate count.
    val candIds = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    val candSets = docs.join(broadcast(candIds), "doc_id")
      .select(col("doc_id"),
        array_sort(shingles(col("text"), shingleLen)).as("sset"))
    val setsA = candSets.select(col("doc_id").as("doc_a"),
      col("sset").as("sa"))
    val setsB = candSets.select(col("doc_id").as("doc_b"),
      col("sset").as("sb"))
    cand.join(setsA, "doc_a").join(setsB, "doc_b")
      .withColumn("inter",
        graft.expressions.SortedIntersectSize(col("sa"), col("sb")))
      .withColumn("jaccard", col("inter").cast(DoubleType) /
        (size(col("sa")) + size(col("sb")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  // -------------------------------------------------------------------
  // SimHash: 64-bit token-hash bit votes; near-dup = small hamming distance.
  // Banded on 4×16-bit chunks so candidate pairs only form inside a chunk
  // match (any pair within hamming ≤ 3 shares at least one exact chunk).
  // -------------------------------------------------------------------

  /** 64-bit SimHash over a pre-materialized token-hash array column: per-bit
    * ±1 votes, bit set where votes are positive. Built as a SQL expression
    * because the DSL's shiftright only takes literal shift amounts, while the
    * lambda-bound bit index is a column. Expects `hsCol` to hold the hashes
    * (hash each token ONCE; the bit loop then only reads longs). */
  def simhashOfHashes(hsCol: String): Column = expr(
    s"""aggregate(sequence(0, 63), cast(0 as bigint), (acc, b) ->
       acc + IF(
         aggregate($hsCol, cast(0 as bigint),
           (a2, h) -> a2 + IF((shiftright(h, b) & 1) = 1, 1L, -1L)) > 0,
         shiftleft(cast(1 as bigint), b), cast(0 as bigint)))""")

  /** Convenience single-expression form (inlines the token-hash transform —
    * fine for small inputs; bulk paths use [[simhashOfHashes]] over a
    * pre-materialized hash column). */
  def simhash(colName: String): Column = simhashOfHashes(
    s"transform(filter(split($colName, '\\\\s+'), t -> t != ''), t -> xxhash64(t))")

  /** Portable 60-bit token hash: the first 15 hex digits of md5, parsed as
    * an integer — deterministic AND replayable by any SQL engine with md5
    * (DuckDB: `CAST('0x' || substring(md5(t),1,15) AS BIGINT)`), unlike
    * xxhash64 whose family only Spark implements. Used by the simhash
    * companion query so the banding/vote/hamming plumbing gets a
    * hash-checked driver row. */
  def md5Hash60(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  def md5Hash60Sql(e: String): String =
    s"CAST('0x' || substring(md5($e), 1, 15) AS BIGINT)"

  val md5Hash60Sql: String = md5Hash60Sql("t")

  def simhashPairs(docs: DataFrame, maxHamming: Int,
                   useMd5: Boolean = false): DataFrame = {
    // Signing is the fused [[graft.expressions.SimhashSig]] kernel: one
    // pass per document in a projection — no exploded token rows, no
    // 64-column vote aggregate. Bit-identical to the staged
    // explode → hash → vote-sum spelling for both hash families
    // (SimhashSigSpec); token-less/null docs sign as 0 via the coalesce
    // (the staged form's left-join null → 0). The EXPLICIT-count
    // repartition is load-bearing: the staged groupBy left `d` spread over
    // several partitions and the banding/verify stages inherit `d`'s
    // layout map-side — signing straight off a one-file scan serialized
    // them (same downstream, same 6.18M pairs: 33 s from a 1-partition
    // signature table vs 5 s from 8, measured on the natural 50k corpus).
    // A bare repartition(col) is NOT enough: the signature table is
    // ~16 B/doc, so AQE coalesces that shuffle straight back to one
    // partition; the explicit count (REPARTITION_BY_NUM) is exempt from
    // coalescing by contract.
    val session = docs.sparkSession
    val d = docs
      .select(col("doc_id"), graft.expressions.SimhashSig(
        coalesce(col("text"), lit("")), useMd5).as("sh64"))
      .repartition(session.sessionState.conf.numShufflePartitions,
        col("doc_id"))
      .localCheckpoint(true, graft.operators.Ckpt.SerLevel)
    simhashPairsFromSig(d, maxHamming)
  }

  /** [[simhashPairs]] from an already-signed `(doc_id, sh64)` table
    * (materialized — the banding below consumes it repeatedly). */
  private[graft] def simhashPairsFromSig(d: DataFrame,
      maxHamming: Int): DataFrame = {
    // Banding. A pair within hamming ≤ 3 has ≥ 1 of the 4 16-bit chunks
    // exactly equal (pigeonhole), so candidates only form inside a chunk
    // match. On natural text that alone fan-outs quadratically: common-word-
    // dominated vote vectors drop many docs into the same 16-bit bucket
    // (measured 18× cost at 10× docs on a zipf corpus — SURVEY §11.1). The
    // lossless refinement: given chunk k matched exactly, ALL ≤ 3 differing
    // bits sit in the remaining 48 bits, so at least 1 of 4 12-bit
    // sub-chunks of that 48-bit complement ALSO matches exactly (pigeonhole
    // again). Keying the bucket on (k, chunk16, j, sub12) is therefore a
    // 28-bit partial match with zero recall loss for maxHamming ≤ 3 — the
    // result set (and the DuckDB oracle, which computes full recall) is
    // unchanged; only the candidate fan-out shrinks, by up to 4096× per
    // pathological bucket. 16 bucket rows/doc instead of 4 — O(n) cost that
    // buys back a quadratic term. For maxHamming > 3 neither pigeonhole
    // holds with these widths, so wide-radius callers (best-effort recall,
    // spec-documented) keep plain 4×16 banding.
    val subBanded = maxHamming <= 3
    // 48-bit complement of chunk k (the other three chunks, packed low).
    // Arithmetic-shift pitfalls: Spark's shiftright sign-extends (use
    // shiftrightunsigned) and a 64-bit shift is a JVM no-op (shift count
    // mod 64), so k = 0 (no low part) and k = 3 (no high part) are special.
    def complement48(k: Int): Column = k match {
      case 0 => shiftrightunsigned(col("sh64"), 16)
      case 3 => col("sh64").bitwiseAND(lit((1L << 48) - 1))
      case _ =>
        col("sh64").bitwiseAND(lit((1L << (16 * k)) - 1)).bitwiseOR(
          shiftleft(shiftrightunsigned(col("sh64"), 16 * (k + 1)), 16 * k))
    }
    val bandStructs =
      if (subBanded) for { k <- 0 until 4; j <- 0 until 4 } yield
        struct(lit(k).as("k"),
          shiftright(col("sh64"), k * 16).bitwiseAND(0xFFFFL).as("chunk"),
          lit(j).as("j"),
          shiftrightunsigned(complement48(k), j * 12)
            .bitwiseAND(0xFFFL).as("sub"))
      else (0 until 4).map { k =>
        struct(lit(k).as("k"),
          shiftright(col("sh64"), k * 16).bitwiseAND(0xFFFFL).as("chunk"))
      }
    val buckets = d.select(col("doc_id"), col("sh64"),
      explode(array(bandStructs: _*)).as("bucket"))
    // Hamming BEFORE the pair dedup: the radius test is a per-row
    // XOR+popcount on hashes already riding the join, while dropDuplicates
    // is a full shuffle of every joined row — filtering first shrinks that
    // shuffle from all bucket collisions to true near-pairs only (measured
    // at 50k natural docs: 140M joined rows → dedup-then-filter spent 86 s,
    // filter-then-dedup shuffles only the ~33M surviving rows). Same result:
    // every duplicate of a pair carries identical (ha, hb).
    buckets.as("a").join(buckets.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sh64").as("ha"), col("b.sh64").as("hb"))
      .withColumn("hamming",
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("doc_a", "doc_b")
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** DuckDB replay of [[simhashPairs]] over [[md5Hash60]] token hashes:
    * per-bit ±1 votes via a 0..63 offset unnest, bit set where votes are
    * positive, 4×16-bit chunk banding, hamming = bit_count(xor). */
  def simhashMd5OracleSql(maxHamming: Int): String =
    s"""WITH tok AS (SELECT doc_id, unnest($tokensSql) AS t FROM documents),
      h AS (SELECT doc_id, $md5Hash60Sql AS h FROM tok),
      votes AS (SELECT doc_id, b,
          sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
        FROM h, LATERAL (SELECT unnest(generate_series(0, 63)) AS b) g
        GROUP BY 1, 2),
      sh AS (SELECT doc_id,
          CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
            AS BIGINT) AS sh64
        FROM votes GROUP BY 1),
      d AS (SELECT doc_id, COALESCE(sh64, 0) AS sh64
        FROM documents LEFT JOIN sh USING (doc_id)),
      chunks AS (SELECT doc_id, sh64, k, (sh64 >> (k * 16)) & 65535 AS chunk
        FROM d, LATERAL (SELECT unnest(generate_series(0, 3)) AS k) g),
      pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
          a.sh64 AS ha, b.sh64 AS hb
        FROM chunks a JOIN chunks b
          ON a.k = b.k AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
      SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
      FROM pairs WHERE bit_count(xor(ha, hb)) <= $maxHamming
      ORDER BY doc_a, doc_b"""
}
