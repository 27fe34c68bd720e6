package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.Tables
import graft.functions.TextFunctions._
import graft.operators.EditBlock

/** Text-analysis + deduplication operators over `documents` (SURVEY.md §2b
  * E1/E2/E4): exact and near dedup, n-gram Jaccard, MinHash+LSH, SimHash,
  * tokenization, quality scoring, language-ID heuristic, fingerprinting.
  *
  * Scale designs: all-pairs similarity is NEVER a crossJoin — the exact
  * Jaccard path is a shingle posting-list join (pairs only materialize for
  * docs sharing a shingle), and the MinHash path buckets by LSH band before
  * any pair is formed. Both patterns hold at 100 TB with banding/salting.
  */
object TextOps {

  // WidenScan: every consumer of docs() is per-doc compute-heavy
  // (tokenizer / shingles / regex — 10-100× the scan cost per byte); a
  // narrow scan would single-thread them all (operators/WidenScan.scala —
  // the round-10 100× finding). Consumers whose per-row work is
  // hash/byte-prefix-grade take docsScan() instead: there the repartition
  // buys nothing and cost the mm_* rows 2-3× at sf0.1 (round-10 watch
  // item) — the call site knows which side it is on, a bytes heuristic
  // does not (the 10× fixture is 5.7 MB and still needed widening for the
  // tokenizer rows).
  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.operators.WidenScan(Tables.documents(s, dir))
  private def docsScan(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)

  /** Scale-PROPORTIONAL store/batch split point for the incremental rows:
    * ids below `max(doc_id)·4/5` are the historical corpus, the top 20%
    * are "tonight's batch" — at every SF the incremental cost stays
    * proportional instead of degenerating (a fixed cutoff of 400 made the
    * batch 99% of a 10× corpus, turning the incremental rows into full
    * runs). Integer arithmetic, identical in both engines; the oracle
    * computes the same value via a scalar subquery. One bounded (1-row)
    * driver-side max per construction, memoized per sf dir. */
  private val cutoffCache =
    scala.collection.concurrent.TrieMap.empty[String, Long]
  private def storeCutoff(s: SparkSession, dir: String): Long =
    cutoffCache.getOrElseUpdate(s"$dir|${docsToken(dir)}",
      docs(s, dir).agg(max("doc_id")).head().getLong(0) * 4 / 5)

  /** Cheap content fingerprint of the documents table, for the cutoff memo
    * and every /tmp artifact key — see [[Tables.fixtureToken]] (one shared
    * definition; round-5 advice: the md5(dir|params|version) key alone
    * keyed only on the path). */
  private def docsToken(dir: String): String =
    Tables.fixtureToken(dir, "documents")
  private val cutoffSql = "(SELECT max(doc_id) * 4 // 5 FROM documents)"

  /** Materializes the store-side signature artifact ONCE per (sf dir,
    * params) — the stand-in for the parquet table last night's close wrote —
    * and reads it back, so the measured incremental plan scans signatures,
    * never historical text. Keyed under /tmp by an md5 of the inputs; the
    * _SUCCESS marker gates against a partial write. */
  private def persistedSigStore(s: SparkSession, dir: String,
      store: DataFrame, numHashes: Int, shingleLen: Int): DataFrame =
    Tables.persistedArtifact(s, "graft_sigstore",
      s"$dir|${docsToken(dir)}|$numHashes|$shingleLen|store-p80|v2" +
        s"|${Tables.codeToken(graft.functions.TextFunctions.getClass)}")(
      signatureTable(store, numHashes, shingleLen))

  /** The exact edit-distance pair set `(id_a, id_b, dist)` over the 30-char
    * prefixes, materialized ONCE per (fixture, t) — the pair table a
    * nightly dedup pass writes, which downstream consumers (the audit row,
    * a CC labeling, a removal join) READ rather than re-enumerating the
    * blocking join per consumer. Output-sized (pairs), keyed on the
    * documents fixture + t + the builder's code, so a regenerated corpus
    * or an edited EditBlock re-materializes instead of serving stale
    * pairs. Since round 13 the exact operator row (e2_edit_blocked) reads
    * this too (round-12 verdict item 5): the routed row carries the
    * operator's semantics in the steady-state sweep, the exact row is the
    * baseline PROOF whose join belongs in the nightly artifact build (the
    * cold first touch here) — re-running a priced ~500 s join in every
    * 100× sweep measured the same number over and over. The REAL join
    * stays pinned per round as an isolated REGRESS probe
    * (ProfileEditBlock / REGRESS_r13.json). */
  private def persistedNearPairs(s: SparkSession, dir: String,
      t: Int): DataFrame =
    Tables.persistedArtifact(s, "graft_editpairs",
      s"$dir|${docsToken(dir)}|prefix30|$t" +
        s"|${Tables.codeToken(graft.operators.EditBlock.getClass)}|v1")(
      graft.operators.EditBlock.nearPairs(
        docs(s, dir).select(col("doc_id"),
          substring(col("text"), 1, 30).as("s")),
        "doc_id", "s", t))

  /** Materializes the persisted (id, cluster_id) dedup labeling ONCE per sf
    * dir — the artifact the nightly run left behind: connected components
    * over the HISTORICAL (bottom-80% of ids) near-dup pair graph. Read back
    * from parquet so the incremental merge plan never recomputes it. */
  private def persistedClusterLabels(s: SparkSession, dir: String): DataFrame =
    Tables.persistedArtifact(s, "graft_sigstore",
      s"$dir|${docsToken(dir)}|cc-labels|64|8|5|0.8|store-p80|v2" +
        s"|${Tables.codeToken(graft.functions.TextFunctions.getClass)}" +
        s"|${Tables.codeToken(graft.operators.ConnectedComponents.getClass)}") {
      val storePairs = minhashLshPairs(
        docs(s, dir).filter(col("doc_id") < storeCutoff(s, dir)),
        numHashes = 64, bands = 8, shingleLen = 5, threshold = 0.8)
      graft.operators.ConnectedComponents
        .minLabel(storePairs, "doc_a", "doc_b")
        .select(col("id"), col("label").as("cluster_id"))
    }

  /** Exact 5-gram Jaccard pairs over `bounded` via the shingle posting-list
    * join (pairs only materialize for docs sharing a shingle). Shared by the
    * pair query (e2_ngram_jaccard) and the cluster query (e2_cc_clusters).
    * Returns (doc_a, doc_b, jaccard) unrounded, filtered at `threshold`. */
  private def jaccardPairs(bounded: DataFrame, threshold: Double): DataFrame = {
    val sh = bounded
      .select(col("doc_id"), explode(shingles(col("text"), 5)).as("sh"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard",
        col("inter").cast(DoubleType) / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
  }

  val defs: Seq[QueryDef] = Seq(

    // E1: exact dedup with deterministic keeper (min doc_id per key)
    QueryDef("e1_dedup_exact",
      (s, dir) => docs(s, dir)
        .groupBy("lang", "source")
        .agg(min("doc_id").as("keeper_doc"), count(lit(1)).as("n_dupes"))
        .orderBy("lang", "source"),
      Some("""SELECT lang, source, min(doc_id) AS keeper_doc,
        count(*) AS n_dupes FROM documents
        GROUP BY lang, source ORDER BY lang, source""")),

    // E2a: near-dedup via normalized-text content hash
    QueryDef("e2_neardup_hash",
      (s, dir) => docs(s, dir)
        .withColumn("h", md5(normText(col("text"))))
        .groupBy("h")
        .agg(count(lit(1)).as("n"), min("doc_id").as("keeper_doc"))
        .orderBy("h"),
      Some("""SELECT md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS h,
        count(*) AS n, min(doc_id) AS keeper_doc
        FROM documents GROUP BY 1 ORDER BY h""")),

    // E1b: INCREMENTAL dedup — the arriving-batch form every production
    // pipeline actually runs: new docs (the top-20% of ids, a scale-
    // proportional split) are dropped when their content signature already
    // exists in the historical corpus (bottom 80%), then self-deduped
    // within the batch. The corpus side is exactly the persisted signature
    // table (one hash column), the batch anti-joins against it on the hash
    // — one key shuffle, no text moves — and at 100 TB the signature store
    // is bucketed on h so the anti join co-locates without a corpus-side
    // shuffle at all.
    QueryDef("e1_dedup_incremental",
      (s, dir) => {
        val cut = storeCutoff(s, dir)
        // h is a JOIN key: if it is nullable, InferFiltersFromConstraints
        // plants `isnotnull(md5(normText(text)))` below the projection and
        // the full normalize+hash runs twice per store row. The explicit
        // text guard plus coalesce makes the expression statically
        // non-nullable, so no constraint is ever inferred. Declared
        // semantics change for null-text rows (none exist in any fixture):
        // previously a null-text BATCH doc kept a null-h group (left_anti
        // keeps null keys — they match nothing); now such docs are dropped,
        // which is also what the oracle's NOT IN null semantics compute —
        // the guard ALIGNS the engine with the oracle on that edge.
        val d = docs(s, dir).filter(col("text").isNotNull)
          .withColumn("h", md5(normText(coalesce(col("text"), lit("")))))
        val corpus = d.filter(col("doc_id") < cut).select("h").distinct()
        val batch = d.filter(col("doc_id") >= cut)
        batch.join(corpus, Seq("h"), "left_anti")
          .groupBy("h")
          .agg(min("doc_id").as("keeper_doc"), count(lit(1)).as("n_in_batch"))
          .orderBy("keeper_doc")
      },
      Some(s"""WITH d AS (SELECT doc_id,
          md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS h
          FROM documents)
        SELECT h, min(doc_id) AS keeper_doc, count(*) AS n_in_batch
        FROM d WHERE doc_id >= $cutoffSql
          AND h NOT IN (SELECT DISTINCT h FROM d WHERE doc_id < $cutoffSql)
        GROUP BY h ORDER BY keeper_doc""")),

    // E2b: exact n-gram Jaccard via shingle posting-list join. Bounded to a
    // fixed doc slice: this synthetic corpus draws from a ~31-word vocabulary,
    // so its ~2000-shingle space makes posting lists pathologically hot (sum
    // of df² ≈ 1.5e9 pairs at sf0.1) and NO exact subquadratic path exists
    // (rare-shingle prefix filtering covers only 15% of true pairs — measured).
    // Exact join-based Jaccard is therefore the bounded-bucket verifier here;
    // the corpus-scale candidate path is e2_minhash_lsh.
    QueryDef("e2_ngram_jaccard",
      (s, dir) => jaccardPairs(docs(s, dir).filter(col("doc_id") < 500), 0.3)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("doc_a", "doc_b"),
      Some(jaccardOracleSql(0.3, where = "doc_id < 500"))),

    // E6b: diversity-constrained top-k — global top-10 docs by length but
    // AT MOST 2 per language (the retrieval/eval-set rule that stops one
    // dominant source from filling the whole budget). Per-group cap via
    // WindowGroupLimit-pruned row_number, then a TakeOrderedAndProject
    // global top-k: nothing global ever sorts the full table.
    QueryDef("e6_diverse_topk",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val wl = Window.partitionBy("lang")
          .orderBy(col("n_chars").desc, col("doc_id"))
        docs(s, dir)
          .withColumn("rk_lang", row_number().over(wl))
          .filter(col("rk_lang") <= 2)
          .orderBy(col("n_chars").desc, col("doc_id"))
          .limit(10)
          .select(col("doc_id"), col("lang"), col("n_chars"),
            col("rk_lang").cast("long").as("rk_lang"))
      },
      Some("""SELECT doc_id, lang, n_chars, rk_lang FROM (
          SELECT doc_id, lang, n_chars, row_number() OVER (
            PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rk_lang
          FROM documents) t
        WHERE rk_lang <= 2
        ORDER BY n_chars DESC, doc_id LIMIT 10""")),

    // E2n: asymmetric shingle CONTAINMENT — C(A→B) = |sh(A) ∩ sh(B)| / |sh(A)|,
    // the doc-inside-doc detector (quoted articles, boilerplate wrappers,
    // near-subsets) that symmetric Jaccard misses when the container is much
    // longer than the contained doc. Same posting-list pair machinery as
    // e2_ngram_jaccard (pairs only through shared shingles, ordered both
    // directions since containment is directional), same bounded verifier
    // rationale on this closed 31-word corpus; LSH candidates are the
    // 100 TB pair source.
    QueryDef("e2_containment",
      (s, dir) => {
        val sh = docs(s, dir).filter(col("doc_id") < 300)
          .select(col("doc_id"), explode(shingles(col("text"), 5)).as("sh"))
        val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
        sh.as("a").join(sh.as("b"),
            col("a.sh") === col("b.sh") && col("a.doc_id") =!= col("b.doc_id"))
          .groupBy(col("a.doc_id").as("doc_in"), col("b.doc_id").as("doc_out"))
          .agg(count(lit(1)).as("inter"))
          .join(sizes.withColumnRenamed("doc_id", "doc_in")
            .withColumnRenamed("n", "na"), "doc_in")
          .withColumn("containment", col("inter").cast(DoubleType) / col("na"))
          .filter(col("containment") >= 0.9)
          .select(col("doc_in"), col("doc_out"),
            round(col("containment"), 6).as("containment"))
          .orderBy("doc_in", "doc_out")
      },
      Some(s"""WITH sh AS (SELECT doc_id, unnest(${shinglesSql(5)}) AS s
          FROM documents WHERE doc_id < 300),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        pairs AS (SELECT a.doc_id AS doc_in, b.doc_id AS doc_out,
            count(*) AS inter
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
          GROUP BY 1, 2)
        SELECT doc_in, doc_out,
          round(CAST(inter AS DOUBLE) / sa.n, 6) AS containment
        FROM pairs JOIN sizes sa ON doc_in = sa.doc_id
        WHERE CAST(inter AS DOUBLE) / sa.n >= 0.9
        ORDER BY doc_in, doc_out""")),

    // E2e: near-dup CLUSTERS — connected components over the exact-Jaccard
    // pair graph (same bounded slice as e2_ngram_jaccard). Pair finding alone
    // under-dedups: a~b and b~c chain into {a,b,c} even when (a,c) never
    // matched, and the keeper decision must act on the whole cluster. The
    // min-label-propagation fixpoint is unique, so the driver hash-checks it
    // against a DuckDB recursive-CTE transitive closure of the same pairs.
    QueryDef("e2_cc_clusters",
      (s, dir) => {
        val pairs = jaccardPairs(docs(s, dir).filter(col("doc_id") < 500), 0.3)
          .select("doc_a", "doc_b")
        graft.operators.ConnectedComponents.clusters(pairs, "doc_a", "doc_b")
          .select(col("id").as("doc_id"), col("cluster_id"),
            col("cluster_size"))
          .orderBy("doc_id")
      },
      Some(ccClustersOracleSql(0.3, where = "doc_id < 500"))),

    // E2o: the end-to-end dedup DECISION report — pair finding → connected
    // components → min-id keeper → per-cluster retention accounting
    // (members, removals, chars reclaimed): the artifact a curation run
    // actually ships for review before deleting anything. Composes the
    // existing pair machinery and CC operator; at 100 TB the pair source
    // swaps to LSH candidates and everything downstream is unchanged
    // (cluster-sized aggregates + one documents join on the id).
    QueryDef("e2_dedup_report",
      (s, dir) => {
        val bounded = docs(s, dir).filter(col("doc_id") < 500)
        val pairs = jaccardPairs(bounded, 0.3).select("doc_a", "doc_b")
        graft.operators.ConnectedComponents.clusters(pairs, "doc_a", "doc_b")
          .join(bounded.select(col("doc_id").as("id"), col("n_chars")), "id")
          .groupBy("cluster_id")
          .agg(count(lit(1)).as("n_members"),
            (count(lit(1)) - 1).as("n_removed"),
            sum(when(col("id") =!= col("cluster_id"), col("n_chars"))
              .otherwise(0L)).as("chars_removed"))
          .select(col("cluster_id").as("keeper_doc"), col("n_members"),
            col("n_removed"), col("chars_removed"))
          .orderBy("keeper_doc")
      },
      Some(dedupReportOracleSql(0.3, "doc_id < 500"))),

    // E2c: MinHash + LSH banding, then exact-Jaccard verification of the
    // banded candidates. Band shape is tuned to this corpus's unusually high
    // background similarity (30% of pairs ≥ 0.2 jaccard — tiny shared
    // vocabulary): 8 bands × 8 rows keeps background collisions ~8·s⁸
    // (≈10³ candidates at sf0.1, vs 7.6M with 4-row bands) while true
    // duplicates (all ≥ 0.90 at the sf0.01 gate) are recalled with
    // p ≥ 1 − (1 − 0.9⁸)⁸ ≈ 0.99 — verified deterministically against the oracle, since the hash
    // family is fixed. Exact-jaccard verification then filters candidates, so
    // the brute-force oracle matches. Planted-duplicate recall: DedupSpec.
    QueryDef("e2_minhash_lsh",
      (s, dir) => minhashLshPairs(docs(s, dir), numHashes = 64, bands = 8,
        shingleLen = 5, threshold = 0.8),
      Some(jaccardOracleSql(0.8))),

    // E2p: INCREMENTAL near-dedup — e1_dedup_incremental's pattern lifted
    // from exact hashes to near-duplicates: the arriving batch (top-20% of
    // ids stands in for tonight's crawl) signs itself and band-joins the
    // PERSISTED signature store (doc_id, shset, mh) — the store side is
    // read back from its parquet artifact, so the plan re-shingles NOTHING
    // historical and store-vs-store pairs are never recomputed. Nightly
    // cost is O(batch) signatures + a band equi-join — the only
    // corpus-scale way to keep a deduped corpus deduped. The artifact is
    // materialized once per sf dir (first run stands in for the nightly
    // close that wrote it; min-of-2 benching measures the true incremental
    // cost). Oracle = exact Jaccard restricted to batch-touching pairs
    // (banding recall 1.0 at these parameters, driver-proven on
    // e2_minhash_lsh).
    QueryDef("e2_neardup_incremental",
      (s, dir) => {
        val cut = storeCutoff(s, dir)
        val d = docs(s, dir)
        val storeSig = persistedSigStore(s, dir,
          d.filter(col("doc_id") < cut), numHashes = 64, shingleLen = 5)
        minhashIncrementalPairs(storeSig, d.filter(col("doc_id") >= cut),
            numHashes = 64, bands = 8, shingleLen = 5, threshold = 0.8)
          .orderBy("doc_a", "doc_b")
      },
      Some(jaccardPairsOracleSql(0.8, s"doc_b >= $cutoffSql"))),

    // E2q: INCREMENTAL cluster maintenance — the dedup DECISION made
    // incremental, composing with e2_neardup_incremental's pair finding:
    // the persisted (id, cluster_id) labeling (last night's CC over the
    // historical pair graph, read back from its parquet artifact) absorbs
    // tonight's batch-touching pairs through their cluster ROOTS only —
    // components are solved on the root graph (O(new pairs)), the labeling
    // is re-rooted by a map-side broadcast join, and nothing historical is
    // re-clustered. Oracle = from-scratch CC on the FULL pair graph (the
    // m5_incremental_agg identity pattern: merge(prev, delta) must equal
    // recompute(union)); banding recall 1.0 at these parameters, so the
    // exact-Jaccard closure is the same graph.
    QueryDef("e2_cc_incremental",
      (s, dir) => {
        val cut = storeCutoff(s, dir)
        val d = docs(s, dir)
        val storeSig = persistedSigStore(s, dir,
          d.filter(col("doc_id") < cut), numHashes = 64, shingleLen = 5)
        val labeling = persistedClusterLabels(s, dir)
        val newPairs = minhashIncrementalPairs(storeSig,
            d.filter(col("doc_id") >= cut),
            numHashes = 64, bands = 8, shingleLen = 5, threshold = 0.8)
          .select("doc_a", "doc_b")
        val merged = graft.operators.ConnectedComponents
          .mergeNewPairs(labeling, newPairs, "doc_a", "doc_b")
        // cluster_size via ONE window pass: the groupBy + join-back spelling
        // consumed `merged` twice, so every consumer beyond the first re-ran
        // whatever upstream of mergeNewPairs was not materialized. Together
        // with the pair-delta checkpoint inside mergeNewPairs this cut the
        // merge overhead beyond shared pair finding from ~8.8 s to ~4.4 s
        // warm at 10× (ProfileCCInc, round 8; pair finding itself ~9-12 s,
        // ambient-noisy). The window shuffles once on cluster_id
        // (labeling-sized rows, tiny next to the pair graph).
        import org.apache.spark.sql.expressions.Window
        merged
          .withColumn("cluster_size",
            count(lit(1)).over(Window.partitionBy("cluster_id")))
          .select(col("id").as("doc_id"), col("cluster_id"),
            col("cluster_size"))
          .orderBy("doc_id")
      },
      Some(ccClustersOracleSql(0.8, "TRUE"))),

    // E2d: SimHash hamming-distance near-dup (xxhash64 family → rows-only
    // driver check; semantics verified on planted dups in DedupSpec)
    QueryDef("e2_simhash",
      (s, dir) => simhashPairs(docs(s, dir), maxHamming = 3),
      None),

    // E2d companion: the SAME simhash pipeline (votes, chunk banding,
    // hamming join) over a portable md5-derived 60-bit token hash, which
    // DuckDB can replay — so the plumbing around the sketch gets a full
    // hash-checked driver row; only the xxhash64 family itself stays
    // rows-only above.
    QueryDef("e2_simhash_md5",
      (s, dir) => simhashPairs(docs(s, dir), maxHamming = 3,
        useMd5 = true),
      Some(simhashMd5OracleSql(3))),

    // E4a: tokenization stats (HOF-only — no explode/shuffle per token).
    // Measured BOTH spellings at sf0.1: this per-row fold runs 1.0 s warm vs
    // 1.6 s for the explode + two-groupBy rewrite — unlike e4_repetition,
    // the per-doc token count (~50) is small enough that two extra shuffles
    // cost more than the interpreted lambda eval. Kept per measurement.
    QueryDef("e4_token_stats",
      (s, dir) => {
        // staged projections so the tokenizer and the interpreted
        // aggregate() lambda each run ONCE per doc: CollapseProject keeps
        // an expensive expression un-inlined when the consumer references
        // it more than once (the e4_langid fix, measured 1.6x there)
        docs(s, dir)
          .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
          .select(col("doc_id"),
            size(col("toks")).cast("long").as("n_tokens"),
            size(array_distinct(col("toks"))).cast("long").as("n_unique"),
            aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t))
              .as("char_sum"),
            size(bpeIsh(col("text"))).cast("long").as("n_bpe_pieces"))
          .select(col("doc_id"), col("n_tokens"), col("n_unique"),
            col("char_sum"),
            (col("char_sum").cast(DoubleType) / col("n_tokens"))
              .as("avg_token_len"),
            col("n_bpe_pieces"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id,
        len($tokensSql) AS n_tokens,
        len(list_distinct($tokensSql)) AS n_unique,
        CAST(list_sum(list_transform($tokensSql, t -> CAST(length(t) AS BIGINT))) AS BIGINT) AS char_sum,
        CAST(list_sum(list_transform($tokensSql, t -> CAST(length(t) AS BIGINT))) AS DOUBLE)
          / len($tokensSql) AS avg_token_len,
        len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_pieces
        FROM documents ORDER BY doc_id""")),

    // E4b: corpus word count, top 20 (explode → map-side-combined count)
    QueryDef("e4_wordcount",
      (s, dir) => docs(s, dir)
        .select(explode(tokens(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word")).limit(20),
      Some(s"""SELECT word, count(*) AS n FROM (
        SELECT unnest($tokensSql) AS word FROM documents) t
        GROUP BY word ORDER BY n DESC, word LIMIT 20""")),

    // E4c: quality scoring (length/punct/stopword ratios, linear score)
    QueryDef("e4_quality",
      (s, dir) => {
        // staged projections (the e4_langid fix): tokenizer, stopword HOF,
        // and each regexp run ONCE per doc; the ratio/score level reads
        // their outputs as plain attributes
        docs(s, dir)
          .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
          .select(col("doc_id"),
            (size(filter(col("toks"), t => t.isin(stopwords: _*)))
              .cast(DoubleType) / size(col("toks"))).as("sr"),
            (size(regexp_extract_all(col("text"), lit("[,.;:!?]"), lit(0)))
              .cast(DoubleType) / length(col("text"))).as("pr"),
            (size(regexp_extract_all(col("text"), lit("[0-9]"), lit(0)))
              .cast(DoubleType) / length(col("text"))).as("dr"))
          .select(col("doc_id"),
            round(col("sr"), 6).as("stop_ratio"),
            round(col("pr"), 6).as("punct_ratio"),
            round(col("dr"), 6).as("digit_ratio"),
            round(col("sr") * 2.0 - col("pr") * 3.0 - col("dr"), 6)
              .as("quality"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id,
        round(sr, 6) AS stop_ratio, round(pr, 6) AS punct_ratio,
        round(dr, 6) AS digit_ratio, round(sr*2.0 - pr*3.0 - dr, 6) AS quality
        FROM (SELECT doc_id,
          CAST(len(list_filter($tokensSql, t -> t IN ($stopwordsSql))) AS DOUBLE)
            / len($tokensSql) AS sr,
          CAST(len(regexp_extract_all(text, '[,.;:!?]')) AS DOUBLE)
            / length(text) AS pr,
          CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
            / length(text) AS dr
        FROM documents) t ORDER BY doc_id""")),

    // E4d: language-ID heuristic (stopword-profile scoring, deterministic
    // argmax with lang-ascending tiebreak)
    QueryDef("e4_langid",
      (s, dir) => {
        // tokenize ONCE into its own projection: the five per-language
        // scores all consume `toks`, and CollapseProject keeps the split
        // un-inlined because a non-trivial expression referenced five
        // times fails its cheap-duplication check — without this the
        // regexp tokenizer runs once per language profile
        val toked = docs(s, dir).select(col("doc_id"),
          col("lang").as("labeled_lang"), tokens(col("text")).as("toks"))
        val scored = toked.select(
          (col("doc_id") +: col("labeled_lang") +:
            langProfiles.map { case (lang, words) =>
              size(filter(col("toks"), t => t.isin(words.map(lit): _*)))
                .as(s"s_$lang")
            }): _*)
        val langs = langProfiles.map(_._1)
        val pred = langs.foldRight(lit(langs.last)) { case (lang, els) =>
          val others = langs.filter(_ != lang).map(l => col(s"s_$l"))
          when(col(s"s_$lang") >= greatest(others: _*), lang).otherwise(els)
        }
        scored.withColumn("pred_lang", pred)
          .withColumn("agrees", (col("pred_lang") === col("labeled_lang")).cast("int"))
          .select("doc_id", "labeled_lang", "pred_lang", "agrees")
          .orderBy("doc_id")
      },
      Some(langIdOracleSql)),

    // E4e: document fingerprint — min over the shingle-hash set
    // (rolling-hash fingerprint; content-defined, order-independent).
    //
    // Deliberately explode+groupBy, NOT array_min(transform(.., sha2)):
    // higher-order-function lambdas are interpreted (no codegen), and the
    // measured HOF variant ran 2.5x SLOWER (8.2 s vs 3.3 s at sf0.1) because
    // ~50M sha2 calls paid interpreted-eval overhead. The explode pipeline
    // stays inside whole-stage codegen, and the groupBy is NOT a data-sized
    // shuffle: partial aggregation folds each partition's shingles to one
    // (doc_id, min, count) row before the exchange, so ~1 row/doc crosses
    // the wire at any scale.
    QueryDef("e4_fingerprint",
      // the fused ShingleShaMin kernel: one pass per doc, no exploded
      // shingle rows, no per-gram hex strings, digest-level min (bit-parity
      // with the staged explode→sha2→min spelling, ShingleShaMinSpec); the
      // per-doc struct means NO aggregation at all — the shuffle this row
      // used to pay (token-grain explode → per-doc agg) disappears
      // the no-shingle guard is the CHEAP equivalent precondition
      // length(text) >= 8 (character count, exactly the kernel's null
      // condition), NOT a filter on the struct: predicate pushdown would
      // re-substitute `isnotnull(shingle_sha_min(text))` below the
      // projection and evaluate the kernel TWICE per row
      (s, dir) => docs(s, dir)
        .filter(length(col("text")) >= 8)
        .select(col("doc_id"),
          graft.expressions.ShingleShaMin(col("text"), 8).as("s"))
        .select(col("doc_id"), col("s.fp").as("fingerprint"),
          col("s.sz").cast(LongType).as("n_shingles"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, min(h) AS fingerprint, count(*) AS n_shingles
        FROM (SELECT doc_id, sha256(unnest(list_distinct(list_transform(
            generate_series(1, greatest(length(text)-7, 0)),
            i -> substring(text, CAST(i AS INT), 8))))) AS h
          FROM documents) t
        GROUP BY doc_id ORDER BY doc_id""")),

    // E2f: benchmark DECONTAMINATION — the eval-leakage check run before
    // training: a doc is contaminated when it shares any 8-gram with the
    // benchmark set (docs 0-9 stand in for the eval corpus). The benchmark
    // shingle set is tiny at any corpus size → it broadcasts, the overlap
    // join is map-side against the broadcast, and only matching (doc,
    // shingle) rows reach the per-doc count shuffle (~hits, not corpus
    // rows). ShingleSet emits distinct shingles, so the count is the number
    // of distinct shared 8-grams with no extra dedup pass.
    QueryDef("e2_decontaminate",
      (s, dir) => {
        // (r17 attempt, measured and REVERTED: replacing the corpus-side
        // explode + broadcast join with a map-side SortedIntersectSize
        // against the collected benchmark array pinned 15.5 → 18.9 s warm
        // at 100× — the linear merge pays O(|bench| ≈ 7k) per DOCUMENT
        // where the hash join pays O(1) per shingle probe, so the kernel
        // only wins when the two sets are comparably sized, which is the
        // near-dup verify case it was built for, not this one.)
        val sh = docs(s, dir)
          .select(col("doc_id"), explode(shingles(col("text"), 8)).as("sh"))
        val bench = broadcast(
          sh.filter(col("doc_id") < 10).select("sh").distinct())
        val hits = sh.filter(col("doc_id") >= 10).join(bench, "sh")
          .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
        docs(s, dir).filter(col("doc_id") >= 10).select("doc_id")
          .join(hits, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_hits"), lit(0L)).as("n_shared_8grams"),
            (coalesce(col("n_hits"), lit(0L)) > 0).cast("long")
              .as("contaminated"))
          .orderBy("doc_id")
      },
      Some(s"""WITH sh AS (SELECT doc_id, unnest(${shinglesSql(8)}) AS s
          FROM documents),
        bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < 10),
        hits AS (SELECT doc_id, count(*) AS n_hits FROM sh
          WHERE doc_id >= 10 AND s IN (SELECT s FROM bench)
          GROUP BY doc_id)
        SELECT d.doc_id, COALESCE(h.n_hits, 0) AS n_shared_8grams,
          CAST(COALESCE(h.n_hits, 0) > 0 AS BIGINT) AS contaminated
        FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        WHERE d.doc_id >= 10 ORDER BY d.doc_id""")),

    // E2i scale twin: Bloom-filter decontamination. The exact form above
    // broadcasts the benchmark n-gram SET — right while it fits in an
    // executor; at a 10⁹-entry benchmark the set no longer ships as
    // strings, but its Bloom filter does (~4 bytes/key). Build touches only
    // benchmark keys (one bit_or shuffle bounded by the FILTER size);
    // probe is a pure map-side `exists` over each doc's shingle array —
    // the corpus is never shuffled, exploded, or joined. Gate-oracle row
    // (the a11/a12 pattern): exact counts are DuckDB-replayed, recall must
    // be 100% (Bloom has no false negatives — n_false_neg 0 proves the
    // plumbing), and doc-level false positives stay under max(5, 1%) of
    // clean docs (~100× above the expected ~1e-4/doc at m = 32n, k = 11).
    QueryDef("e2_decontaminate_bloom",
      (s, dir) => {
        import graft.operators.BloomFilter
        val k = 11
        val bench = docs(s, dir).filter(col("doc_id") < 10)
          .select(explode(shingles(col("text"), 8)).as("sh")).distinct()
          .localCheckpoint(true, graft.operators.Ckpt.SerLevel)
        val bits = BloomFilter.build(bench, col("sh"),
          BloomFilter.sizeBits(bench.count()), k)
        // ONE shingle pass over the corpus (r16 verdict's efficiency note:
        // the bloom-probe and exact-verify branches each ran the ShingleSet
        // kernel over the full corpus). The exploded shingle row carries
        // BOTH verdicts — the compiled BloomFilter.probe per shingle (the
        // HOF spelling paid interpreted dispatch per probe and inlined the
        // 4k-long bit-array literal into the plan; BloomProbe carries the
        // bits as a reference object) and the exact benchmark hit via the
        // same broadcast join as before — and one partial-aggregated OR per
        // doc replaces the probe pass + explode pass + distinct + left
        // join. explode_outer keeps shingle-less docs in n_docs with both
        // flags false, exactly as the old left join did; per-doc booleans
        // are unchanged (exists == OR over the same distinct-shingle set),
        // so the aggregate row is bit-identical (oracle-verified).
        val perDoc = docs(s, dir).filter(col("doc_id") >= 10)
          .select(col("doc_id"),
            explode_outer(shingles(col("text"), 8)).as("sh"))
          .join(broadcast(bench.withColumn("in_bench", lit(true))),
            Seq("sh"), "left")
          .groupBy("doc_id")
          .agg(
            coalesce(max(when(col("sh").isNotNull,
              BloomFilter.probe(col("sh"), bits, k))
              .otherwise(lit(false))), lit(false)).as("bloom_hit"),
            coalesce(max(coalesce(col("in_bench"), lit(false))), lit(false))
              .as("exact_hit"))
        perDoc
          .agg(count(lit(1)).as("n_docs"),
            sum(col("exact_hit").cast("long")).as("n_contaminated"),
            sum((col("exact_hit") && !col("bloom_hit")).cast("long"))
              .as("n_false_neg"),
            sum((col("bloom_hit") && !col("exact_hit")).cast("long"))
              .as("nfp"))
          .select(col("n_docs"), col("n_contaminated"), col("n_false_neg"),
            (col("nfp") <= greatest(lit(5L),
              (col("n_docs") - col("n_contaminated")).divide(lit(100)).cast("long")))
              .as("fp_within_bound"))
      },
      Some(s"""WITH sh AS (SELECT doc_id, unnest(${shinglesSql(8)}) AS s
          FROM documents),
        bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < 10),
        hits AS (SELECT DISTINCT doc_id FROM sh
          WHERE doc_id >= 10 AND s IN (SELECT s FROM bench))
        SELECT (SELECT count(*) FROM documents WHERE doc_id >= 10) AS n_docs,
          (SELECT count(*) FROM hits) AS n_contaminated,
          CAST(0 AS BIGINT) AS n_false_neg,
          true AS fp_within_bound""")),

    // E4f: TF-IDF top-3 terms per document. tf and df are shuffle-light
    // (both groupBys partial-aggregate map-side; ~1 row per (doc, term) and
    // per term cross the wire), the corpus size is a broadcast 1-row
    // aggregate, and the per-doc top-k is WindowGroupLimit — no sort of the
    // full scored table. Smoothed idf: ln((N+1)/(df+1)) + 1.
    QueryDef("e4_tfidf",
      (s, dir) => {
        // tf feeds BOTH the document-frequency aggregate and the scoring
        // join: materialize it once or the tokenize chain runs twice over
        // the corpus. Counts come off the compiled per-row kernel
        // (tokenCounts — r17): only (doc, term)-grain rows ever exist,
        // instead of one row per token occurrence re-grouped by hash agg
        val tf = docs(s, dir)
          .select(col("doc_id"), explode(tokenCounts(col("text"))).as("e"))
          .select(col("doc_id"), col("e.t").as("t"), col("e.cnt").as("tf"))
          .localCheckpoint(true, graft.operators.Ckpt.SerLevel)
        val dfreq = tf.groupBy("t").agg(count(lit(1)).as("df"))
        val nDocs = docs(s, dir).agg(count(lit(1)).as("n_docs"))
        val scored = tf.join(dfreq, "t")
          .crossJoin(broadcast(nDocs))
          .withColumn("tfidf", col("tf") *
            (log((col("n_docs") + 1.0) / (col("df") + 1.0)) + 1.0))
        graft.operators.OrderedOps.topKPerGroup(scored, Seq("doc_id"),
            Seq(col("tfidf").desc, col("t")), k = 3)
          .select(col("doc_id"), col("rank").cast("long").as("rank"),
            col("t").as("term"), round(col("tfidf"), 6).as("tfidf"))
          .orderBy("doc_id", "rank")
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest($tokensSql) AS t
          FROM documents),
        tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY 1, 2),
        dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (SELECT doc_id, t,
            tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0) AS tfidf
          FROM tf JOIN dfreq USING (t) CROSS JOIN n),
        ranked AS (SELECT doc_id, t, tfidf, row_number() OVER (
          PARTITION BY doc_id ORDER BY tfidf DESC, t) AS rank FROM scored)
        SELECT doc_id, rank, t AS term, round(tfidf, 6) AS tfidf
        FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""")),

    // E4n: SPARSE cosine similarity over TF-IDF vectors — the inverted-index
    // similarity modality (BM25/TF-IDF retrieval's scoring core), complement
    // to e3's dense-embedding cosine: pairs materialize ONLY through the
    // term posting-list join, never all-pairs. Same smoothed idf as
    // e4_tfidf. Per-term contributions (w², wa·wb) are quantized to integer
    // micros BEFORE summing (the e4_unigram_logprob contract), so dot and
    // norm are exact integer math — independent of partitioning and engine
    // summation order — and idf > 0 makes every norm positive (no NaN
    // guard needed). Bounded to doc_id < 150 at test scale because this
    // 31-word corpus makes every pair share terms; on a natural vocabulary
    // the posting join IS the scale path (same rationale as
    // e2_ngram_jaccard, measured there).
    QueryDef("e4_tfidf_cosine",
      (s, dir) => {
        // weight/norm/dot definitions shared with e3_hybrid_rrf's sparse
        // retriever through the single TfIdf contract object. w feeds the
        // norm table AND both sides of the pair join: materialize it once
        // (the e4_tfidf tf-checkpoint / e3_hybrid_rrf rationale) or the
        // idf join + weight projection above the reused tf exchange
        // replays per consumer (round-10 lint finding). Slice-bounded
        // (doc_id < 150), so the pinned snapshot is tiny.
        val w = TfIdf.weights(docs(s, dir).filter(col("doc_id") < 150))
          .localCheckpoint(true, graft.operators.Ckpt.SerLevel)
        // nrm joins back on BOTH pair sides — materialize its ≤150 rows
        // too, or the final norm aggregate re-runs per consumer (fired
        // only at the scale fixture, where the agg stops broadcasting)
        val nrm = TfIdf.norms(w)
          .localCheckpoint(true, graft.operators.Ckpt.SerLevel)
        val dots = w.as("a")
          .join(w.as("b"),
            col("a.t") === col("b.t") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .agg(TfIdf.quantizedDot(col("a.w"), col("b.w")).as("dot"))
        dots
          .join(nrm.select(col("doc_id").as("doc_a"), col("nrm").as("na")),
            "doc_a")
          .join(nrm.select(col("doc_id").as("doc_b"), col("nrm").as("nb")),
            "doc_b")
          .withColumn("cos", col("dot") / (col("na") * col("nb")))
          .filter(col("cos") >= 0.5)
          .select(col("doc_a"), col("doc_b"), round(col("cos"), 6).as("cos_sim"))
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH ${TfIdf.oracleCtes(150)},
        dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            ${TfIdf.oracleQuantizedDot("a.w", "b.w")} AS dot
          FROM w a JOIN w b ON a.t = b.t AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT doc_a, doc_b,
          round(dot / (na.nrm * nb.nrm), 6) AS cos_sim
        FROM dots JOIN tn na ON doc_a = na.doc_id
        JOIN tn nb ON doc_b = nb.doc_id
        WHERE dot / (na.nrm * nb.nrm) >= 0.5
        ORDER BY doc_a, doc_b""")),

    // E4g: PII-style redaction — the rewrite form of text cleaning (numbers
    // → a placeholder token here; the same shape carries email/phone/ID
    // patterns). Pure per-row map, no shuffle; emitted as deterministic
    // counts + the redacted length so the driver hash-checks the rewrite
    // without embedding full text in the result.
    QueryDef("e4_redact",
      (s, dir) => docs(s, dir).select(
          col("doc_id"),
          length(regexp_replace(col("text"), "[0-9]+", "<NUM>"))
            .cast("long").as("redacted_len"),
          size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0)))
            .cast("long").as("n_redactions"),
          length(col("text")).cast("long").as("orig_len"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
        length(regexp_replace(text, '[0-9]+', '<NUM>', 'g')) AS redacted_len,
        len(regexp_extract_all(text, '[0-9]+')) AS n_redactions,
        length(text) AS orig_len
        FROM documents ORDER BY doc_id""")),

    // E4h: repetition signals — the Gopher/RefinedWeb within-document
    // quality gates (duplicate-token ratio, most-frequent-token fraction,
    // most-frequent-bigram fraction). Both term tables partial-aggregate
    // map-side, so ~1 row per (doc, term) crosses the wire and the per-doc
    // rollup is ~1 row/doc — no corpus-sized shuffle. The `repetitive` flag
    // is computed from the UNROUNDED fraction on both sides so a boundary
    // value can't flip between engines.
    //
    // E4m: Gopher-style rule GATE (Rae et al. 2021 §A1.1 shape): the
    // multi-rule document filter every corpus pipeline runs before training —
    // word-count bounds, mean-word-length bounds, minimum distinct-stopword
    // presence — emitted as one 0/1 flag per rule plus the conjunction, so
    // downstream can both filter (keep=1) and audit WHICH rule killed a doc.
    // Entirely row-local (map-side at any corpus size); the rule arithmetic
    // is integer-exact (token-length sums) so both engines compare the same
    // doubles. Flags are BIGINT 0/1, not BOOLEAN: the driver's compare is
    // representation-sensitive and pandas bool vs numpy bool_ would
    // false-mismatch.
    QueryDef("e4_gopher_gate",
      (s, dir) => {
        // token-length SUM spelled as one codegen'd regexp (non-whitespace
        // char count) instead of an interpreted aggregate() lambda; the
        // distinct-stopword count keeps the HOF form deliberately — both
        // alternatives were measured SLOWER at 50k docs (10 boundary-anchored
        // rlikes: 8.1 s vs 4.3 s — Java regex per stopword per row; a single
        // alternation needs lookbehind, which RE2/DuckDB lacks, so it can't
        // be oracle-portable)
        // staged projections (the e4_langid fix): tokenizer + stopword HOF
        // + regexp once per doc, rules read the metric attributes
        def flag(c: Column): Column = c.cast("long")
        docs(s, dir)
          .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
          .select(col("doc_id"),
            size(col("toks")).cast("long").as("n_words"),
            length(regexp_replace(col("text"), "\\s+", ""))
              .cast(DoubleType).as("nws_len"),
            size(filter(array_distinct(col("toks")),
              t => t.isin(stopwords: _*))).cast("long").as("n_stop"))
          .select(col("doc_id"), col("n_words"),
            (col("nws_len") / col("n_words")).as("mwl"), col("n_stop"))
          .select(col("doc_id"), col("n_words"),
            round(col("mwl"), 6).as("mean_wlen"), col("n_stop"),
            flag(col("n_words") >= 50 && col("n_words") <= 100000).as("r_wc"),
            flag(col("mwl") >= 3.0 && col("mwl") <= 10.0).as("r_mwl"),
            flag(col("n_stop") >= 2).as("r_stop"),
            flag(col("n_words") >= 50 && col("n_words") <= 100000 &&
              col("mwl") >= 3.0 && col("mwl") <= 10.0 &&
              col("n_stop") >= 2).as("keep"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, n_words, round(mwl, 6) AS mean_wlen, n_stop,
          CAST(CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END
            AS BIGINT) AS r_wc,
          CAST(CASE WHEN mwl >= 3.0 AND mwl <= 10.0 THEN 1 ELSE 0 END
            AS BIGINT) AS r_mwl,
          CAST(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS BIGINT) AS r_stop,
          CAST(CASE WHEN n_words BETWEEN 50 AND 100000
            AND mwl >= 3.0 AND mwl <= 10.0 AND n_stop >= 2
            THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM (SELECT doc_id, CAST(len($tokensSql) AS BIGINT) AS n_words,
          CAST(length(regexp_replace(text, '\\s+', '', 'g'))
            AS DOUBLE) / len($tokensSql) AS mwl,
          CAST(len(list_filter(list_distinct($tokensSql),
            t -> t IN ($stopwordsSql))) AS BIGINT) AS n_stop
        FROM documents) t ORDER BY doc_id""")),

    // E4r: Jensen–Shannon divergence between two subcorpora's unigram
    // distributions — the symmetric, bounded [0, ln 2] corpus-similarity
    // metric data-mixing reports use (a21's PSI compares value buckets;
    // this compares vocabularies). Shape: one count per (side, term),
    // full-outer vocab join, totals from the tiny term table, per-term
    // contributions micro-quantized pre-sum (order-free); 0·ln0 terms
    // drop via the guard.
    QueryDef("e4_jsd",
      (s, dir) => {
        val side = when(expr("CAST(substring(source, 4) AS INT)") < 10, "a")
          .otherwise("b")
        val tf = docs(s, dir)
          .select(side.as("side"), explode(tokens(col("text"))).as("t"))
          .groupBy("side", "t").agg(count(lit(1)).as("c"))
        val wide = tf.groupBy("t").agg(
          sum(when(col("side") === "a", col("c")).otherwise(0L)).as("ca"),
          sum(when(col("side") === "b", col("c")).otherwise(0L)).as("cb"))
        val tot = wide.agg(sum("ca").as("ta"), sum("cb").as("tb"))
        val p = col("ca").cast(DoubleType) / col("ta")
        val q = col("cb").cast(DoubleType) / col("tb")
        val m = (p + q) / 2.0
        val term = when(col("ca") > 0, p * log(p / m) * 0.5).otherwise(0.0) +
          when(col("cb") > 0, q * log(q / m) * 0.5).otherwise(0.0)
        wide.crossJoin(broadcast(tot))
          .select(round(term * 1e6, 0).cast("long").as("tm"))
          .agg(count(lit(1)).as("n_terms"),
            round(sum("tm").cast(DoubleType) / 1e6, 6).as("jsd"))
      },
      Some(s"""WITH tf AS (SELECT CASE WHEN CAST(substring(source, 4) AS INT)
              < 10 THEN 'a' ELSE 'b' END AS side, unnest($tokensSql) AS t
          FROM documents),
        c AS (SELECT side, t, count(*) AS c FROM tf GROUP BY 1, 2),
        wide AS (SELECT t,
            CAST(sum(CASE WHEN side = 'a' THEN c ELSE 0 END) AS BIGINT) AS ca,
            CAST(sum(CASE WHEN side = 'b' THEN c ELSE 0 END) AS BIGINT) AS cb
          FROM c GROUP BY t),
        tot AS (SELECT CAST(sum(ca) AS BIGINT) AS ta,
            CAST(sum(cb) AS BIGINT) AS tb FROM wide),
        terms AS (SELECT CAST(round((
            CASE WHEN ca > 0 THEN CAST(ca AS DOUBLE) / ta
              * ln((CAST(ca AS DOUBLE) / ta)
                / ((CAST(ca AS DOUBLE) / ta + CAST(cb AS DOUBLE) / tb) / 2.0))
              * 0.5 ELSE 0.0 END
            + CASE WHEN cb > 0 THEN CAST(cb AS DOUBLE) / tb
              * ln((CAST(cb AS DOUBLE) / tb)
                / ((CAST(ca AS DOUBLE) / ta + CAST(cb AS DOUBLE) / tb) / 2.0))
              * 0.5 ELSE 0.0 END) * 1000000) AS BIGINT) AS tm
          FROM wide CROSS JOIN tot)
        SELECT count(*) AS n_terms,
          round(CAST(sum(tm) AS DOUBLE) / 1000000.0, 6) AS jsd
        FROM terms""")),

    // E4q: gate ATTRITION funnel — the curation artifact behind any rule
    // cascade: per stage, how many docs the rule removed and how many
    // survive past it (each doc attributed to its FIRST failing rule, the
    // order-dependent accounting a sequential pipeline reports). Same
    // integer-exact rule arithmetic as e4_gopher_gate; the funnel window
    // runs over the 4-row stage table, never the corpus.
    QueryDef("e4_gate_attrition",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // staged projections (the e4_langid fix): tokenizer + stopword HOF
        // once per doc before the first-failing-rule attribution
        val stage = when(!(col("n_words") >= 50 && col("n_words") <= 100000),
            "1_wordcount")
          .when(!(col("mwl") >= 3.0 && col("mwl") <= 10.0), "2_mean_wlen")
          .when(!(col("n_stop") >= 2), "3_stopwords")
          .otherwise("4_kept")
        val counts = docs(s, dir)
          .select(col("text"), tokens(col("text")).as("toks"))
          .select(size(col("toks")).cast("long").as("n_words"),
            length(regexp_replace(col("text"), "\\s+", ""))
              .cast(DoubleType).as("nws_len"),
            size(filter(array_distinct(col("toks")),
              t => t.isin(stopwords: _*))).cast("long").as("n_stop"))
          .select(col("n_words"), (col("nws_len") / col("n_words")).as("mwl"),
            col("n_stop"))
          .select(stage.as("stage"))
          .groupBy("stage").agg(count(lit(1)).as("n"))
        // total = a second FRAME of the same 4-row window, not a separate
        // aggregate: one consumer of the corpus-sized gate evaluation (no
        // checkpoint, no crossJoin), and the global window sits DIRECTLY
        // above its bounding aggregation — the structural property the
        // at-scale lint sweep reads off the plan
        val w = Window.orderBy("stage")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.orderBy("stage")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        counts
          .select(col("stage"), col("n"), sum("n").over(w).as("cum"),
            sum("n").over(wAll).as("total"))
          .select(col("stage"), col("n"),
            when(col("stage") === "4_kept", col("n"))
              .otherwise(col("total") - col("cum")).as("surviving_after"))
          .orderBy("stage")
      },
      Some(s"""WITH g AS (SELECT doc_id,
            CAST(len($tokensSql) AS BIGINT) AS n_words,
            CAST(length(regexp_replace(text, '\\s+', '', 'g'))
              AS DOUBLE) / len($tokensSql) AS mwl,
            CAST(len(list_filter(list_distinct($tokensSql),
              t -> t IN ($stopwordsSql))) AS BIGINT) AS n_stop
          FROM documents),
        st AS (SELECT CASE
            WHEN NOT (n_words BETWEEN 50 AND 100000) THEN '1_wordcount'
            WHEN NOT (mwl >= 3.0 AND mwl <= 10.0) THEN '2_mean_wlen'
            WHEN NOT (n_stop >= 2) THEN '3_stopwords'
            ELSE '4_kept' END AS stage FROM g),
        c AS (SELECT stage, count(*) AS n FROM st GROUP BY stage),
        t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
        SELECT stage, n,
          CASE WHEN stage = '4_kept' THEN n
            ELSE total - CAST(sum(n) OVER (ORDER BY stage
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          END AS surviving_after
        FROM c CROSS JOIN t ORDER BY stage""")),

    // E4o: percentile-threshold selection — "keep the top quartile by
    // quality score", the data-mixing step that follows scoring. The
    // threshold is ONE exact interpolated percentile computed as an
    // aggregate (no global sort — Spark's percentile agg builds a value
    // histogram; at 100 TB the same line swaps to percentile_approx, the
    // A12-proven sketch, trading exactness for a single pass), broadcast
    // back as a 1-row crossJoin so the filter stays map-side. Score is
    // byte-identical to e4_quality's.
    QueryDef("e4_quality_p75",
      (s, dir) => {
        val toks = tokens(col("text"))
        val nTok = size(toks)
        val stopHits = size(filter(toks, t => t.isin(stopwords: _*)))
        val punct = size(regexp_extract_all(col("text"), lit("[,.;:!?]"), lit(0)))
        val digits = size(regexp_extract_all(col("text"), lit("[0-9]"), lit(0)))
        // score ONCE: the (doc_id, quality) table feeds both the percentile
        // aggregate and the filter side — without the eager materialization
        // the tokenizer + two regexp extracts run TWICE over the corpus
        // (measured 7.9 -> 1.9 s at the 10x fixture — the second pass also
        // re-read the text column from parquet). Two columns per doc, far
        // smaller than the corpus.
        val scored = docs(s, dir).select(col("doc_id"),
          (stopHits.cast(DoubleType) / nTok * 2.0
            - punct.cast(DoubleType) / length(col("text")) * 3.0
            - digits.cast(DoubleType) / length(col("text"))).as("quality"))
          .localCheckpoint(true, graft.operators.Ckpt.SerLevel)
        val thr = scored.agg(expr("percentile(quality, 0.75)").as("p75"))
        scored.crossJoin(broadcast(thr))
          .filter(col("quality") >= col("p75"))
          .select(col("doc_id"), round(col("quality"), 6).as("quality"),
            round(col("p75"), 6).as("p75"))
          .orderBy("doc_id")
      },
      Some(s"""WITH q AS (SELECT doc_id,
          CAST(len(list_filter($tokensSql, t -> t IN ($stopwordsSql)))
            AS DOUBLE) / len($tokensSql) * 2.0
          - CAST(len(regexp_extract_all(text, '[,.;:!?]')) AS DOUBLE)
            / length(text) * 3.0
          - CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
            / length(text) AS quality
          FROM documents),
        thr AS (SELECT quantile_cont(quality, 0.75) AS p75 FROM q)
        SELECT doc_id, round(quality, 6) AS quality, round(p75, 6) AS p75
        FROM q CROSS JOIN thr WHERE quality >= p75 ORDER BY doc_id""")),

    // Bigrams pair map-side (AdjacentPairs — the e4_bigram_logprob kernel;
    // each token's successor is the next array slot of its own row), so
    // neither term table needs the token-grain Exchange+Sort+Window the
    // lead() spelling paid. Historical note kept for the record: the
    // round-13 HOF attempt (a transform/element_at lambda building the
    // bigram array per row) measured 10.2 s at sf0.1 vs 1.6 s for the
    // window because HOF lambdas evaluate interpreted AND CollapseProject
    // re-inlines the tokenizer into every element_at reference — the
    // compiled kernel has neither failure mode (tokens() evaluates once as
    // the generator's input).
    QueryDef("e4_repetition",
      (s, dir) => {
        val tf = docs(s, dir)
          .select(col("doc_id"), explode(tokenCounts(col("text"))).as("e"))
          .select(col("doc_id"), col("e.t").as("t"), col("e.cnt").as("tf"))
        val ts = tf.groupBy("doc_id").agg(
          sum("tf").as("n_tokens"), count(lit(1)).as("n_unique"),
          max("tf").as("top_tf"))
        val bg = docs(s, dir).select(col("doc_id"),
            explode(adjacentPairs(tokens(col("text")))).as("p"))
          .select(col("doc_id"),
            concat(col("p.w1"), lit(" "), col("p.w2")).as("b"))
        val bf = bg.groupBy("doc_id", "b").agg(count(lit(1)).as("bf"))
        val bs = bf.groupBy("doc_id").agg(
          sum("bf").as("n_bigrams"), max("bf").as("top_bf"))
        val topBgFrac = coalesce(
          col("top_bf").cast(DoubleType) / col("n_bigrams"), lit(0.0))
        ts.join(bs, Seq("doc_id"), "left")
          .select(col("doc_id"),
            round(lit(1.0) - col("n_unique").cast(DoubleType) / col("n_tokens"), 6)
              .as("dup_token_ratio"),
            round(col("top_tf").cast(DoubleType) / col("n_tokens"), 6)
              .as("top_token_frac"),
            round(topBgFrac, 6).as("top_bigram_frac"),
            (topBgFrac > 0.18).cast("long").as("repetitive"))
          .orderBy("doc_id")
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest($tokensSql) AS t
          FROM documents),
        tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY 1, 2),
        ts AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
            count(*) AS n_unique, max(tf) AS top_tf FROM tf GROUP BY 1),
        bg AS (SELECT doc_id, unnest(list_transform(
            generate_series(1, len($tokensSql) - 1),
            i -> ($tokensSql)[i] || ' ' || ($tokensSql)[i + 1])) AS b
          FROM documents),
        bf AS (SELECT doc_id, b, count(*) AS bf FROM bg GROUP BY 1, 2),
        bs AS (SELECT doc_id, CAST(sum(bf) AS BIGINT) AS n_bigrams,
            max(bf) AS top_bf FROM bf GROUP BY 1)
        SELECT ts.doc_id,
          round(1.0 - CAST(n_unique AS DOUBLE) / n_tokens, 6) AS dup_token_ratio,
          round(CAST(top_tf AS DOUBLE) / n_tokens, 6) AS top_token_frac,
          round(coalesce(CAST(top_bf AS DOUBLE) / n_bigrams, 0.0), 6)
            AS top_bigram_frac,
          CAST(coalesce(CAST(top_bf AS DOUBLE) / n_bigrams, 0.0) > 0.18
            AS BIGINT) AS repetitive
        FROM ts LEFT JOIN bs ON ts.doc_id = bs.doc_id
        ORDER BY ts.doc_id""")),

    // E2g: corpus-duplicated n-gram coverage — for each doc, the fraction of
    // its distinct 8-grams that also occur in ≥1 OTHER doc (the corpus-level
    // repetition signal behind "remove docs made of boilerplate"). ShingleSet
    // emits per-doc-distinct shingles, so document frequency is a plain
    // count per shingle (map-side partial agg → ~1 row per distinct shingle
    // on the wire); the posting-list join back is keyed on the shingle and
    // the per-doc rollup ships ~1 row/doc. Same shape at 100 TB.
    QueryDef("e2_dup_ngrams",
      (s, dir) => {
        // Unique-subtract formulation (round-12 verdict item 4): a shingle
        // with document frequency 1 has EXACTLY ONE posting row, so its
        // doc_id rides the groupBy(sh) aggregate as min(doc_id) — no
        // window, no posting-side join — and per doc
        // n_dup = n_shingles − n_uniq (ShingleSet emits per-doc-DISTINCT
        // shingles, so the subtraction is exact). Every stage is either a
        // partial-aggregating groupBy (the hot key's rows combine map-side
        // to ≤1 row per task before the wire) or a doc-keyed join of two
        // doc-sized aggregates with accurate post-shuffle stats — so this
        // shape has neither of the two failure modes its predecessors had:
        // not the round-11 AQE build-side race (the old posting join's
        // Generate-side stat was the PRE-explode bytes, flipping the build
        // side nondeterministically — 2.8 vs 9.5 s bimodal), and not the
        // round-12 window's hot-shingle concentration (count OVER
        // (PARTITION BY sh) has no partial aggregation, so one boilerplate
        // 8-gram put its whole posting list in one sort partition — fine
        // at 100× where df ≤ n_docs bounds the task, an unsplittable
        // straggler at corpus scale, and AQE skew handling does not apply
        // to windows). Measured head-to-head at 10×/100× on a 90%-hot
        // footer corpus AND the natural fixture: unique-subtract ~2.2×
        // faster than the window everywhere, identical rows
        // (HOTSHINGLE_r13.json). n_shingles needs no posting rows at all —
        // it is size(arr) on the pre-explode grain (the array IS the
        // distinct-shingle set), so the single Generate has a single
        // consumer and the kernel feeds both branches from one projection.
        // empty-shingle guard as the cheap length precondition — a filter
        // on the computed array would push below the projection and run
        // the shingle kernel twice per doc (the e4_fingerprint lesson)
        val based = docs(s, dir)
          .filter(length(col("text")) >= 8)
          .select(col("doc_id"), shingles(col("text"), 8).as("arr"))
        val perDoc = based
          .select(col("doc_id"), size(col("arr")).cast("long").as("n_shingles"))
        val uniqPerDoc = based
          .select(col("doc_id"), explode(col("arr")).as("sh"))
          .groupBy("sh")
          .agg(count(lit(1)).as("df"), min(col("doc_id")).as("doc_id"))
          .filter(col("df") === 1)
          .groupBy("doc_id").agg(count(lit(1)).as("n_uniq"))
        perDoc.join(uniqPerDoc, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_shingles"),
            (col("n_shingles") - coalesce(col("n_uniq"), lit(0L)))
              .as("n_dup"))
          .select(col("doc_id"), col("n_shingles"), col("n_dup"),
            round(col("n_dup").cast(DoubleType) / col("n_shingles"), 6)
              .as("dup_frac"))
          .orderBy("doc_id")
      },
      Some(s"""WITH sh AS (SELECT doc_id, unnest(${shinglesSql(8)}) AS s
          FROM documents),
        dfreq AS (SELECT s, count(*) AS df FROM sh GROUP BY s)
        SELECT doc_id, count(*) AS n_shingles,
          CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
          round(CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
            / count(*), 6) AS dup_frac
        FROM sh JOIN dfreq USING (s) GROUP BY doc_id ORDER BY doc_id""")),

    // E2j: duplicated-SPAN removal (exact substring dedup à la "Deduplicating
    // Training Data Makes Language Models Better", Lee et al. 2022): any
    // word position covered by a 5-word gram that occurs >= 2 times in the
    // corpus is cut, and the surviving words are stitched back into the
    // cleaned text — the TRANSFORM counterpart of e2_dup_ngrams' metric.
    // Shape at 100 TB: positional grams explode map-side; the gram-frequency
    // agg partial-aggregates to ~1 row per distinct gram; only duplicated
    // grams (a small fraction of a natural corpus) flow back through the
    // posting-list join; covered positions and the rebuild shuffle once on
    // doc_id with ~doc-length rows. No all-pairs stage anywhere.
    QueryDef("e2_span_dedup",
      (s, dir) => {
        val k = 5
        val base = docs(s, dir)
          .select(col("doc_id"), split(col("text"), " ").as("w"))
          .withColumn("n", size(col("w")))
        // positional k-grams (Spark's sequence(0, n-k) counts DOWN when
        // n < k — guard it; DuckDB's generate_series returns empty). The
        // >= k-words guard is the cheap precondition BEFORE the split
        // projection — size(split(text,' ')) = spaces+1, so spaces >= k-1
        // is equivalent — because a filter on size(w) would push below the
        // projection re-substituted as size(split(text)) and run the split
        // twice per row (the filter-reevaluates-projection lint rule).
        // Short docs still flow through `base` into the rebuild side
        // untouched; only the gram branch needs the guard.
        val grams = docs(s, dir)
          .filter(length(col("text"))
            - length(replace(col("text"), lit(" "), lit(""))) >= k - 1)
          .select(col("doc_id"), split(col("text"), " ").as("w"))
          .withColumn("n", size(col("w")))
          .select(col("doc_id"), col("w"),
            explode(sequence(lit(0), col("n") - k)).as("p"))
          .select(col("doc_id"), col("p"),
            concat_ws(" ", slice(col("w"), col("p") + 1, lit(k))).as("g"))
        // (r17 attempt, measured and REVERTED: folding the dup-count and
        // occurrence positions into one collect_list aggregate and
        // rebuilding map-side with a compiled stitch kernel pinned 22.4 →
        // 28.4 s warm at 100× — the object aggregate's per-gram position
        // lists cost more than the second gram projection they saved, and
        // the rebuild join still had to move the split word arrays.)
        val dup = grams.groupBy("g").agg(count(lit(1)).as("f"))
          .filter(col("f") >= 2).select("g")
        val covered = grams.join(dup, "g")
          .select(col("doc_id"),
            explode(sequence(col("p"), col("p") + (k - 1))).as("pos"))
          .distinct()
        val wp = base.select(col("doc_id"),
          posexplode(col("w")).as(Seq("pos", "word")))
        val rebuilt = wp.join(covered, Seq("doc_id", "pos"), "left_anti")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_kept"),
            concat_ws(" ", transform(
              array_sort(collect_list(struct(col("pos"), col("word")))),
              x => x.getField("word"))).as("cleaned"))
        base.select(col("doc_id"), col("n").cast("long").as("n_words"))
          .join(rebuilt, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_words"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"),
            coalesce(col("cleaned"), lit("")).as("cleaned"))
          .orderBy("doc_id")
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS l
          FROM documents),
        g AS (SELECT doc_id, i - 1 AS p, array_to_string(l[i:i+4], ' ') AS gr
          FROM (SELECT doc_id, l,
            unnest(generate_series(1, len(l) - 4)) AS i FROM w)),
        dup AS (SELECT gr FROM g GROUP BY gr HAVING count(*) >= 2),
        cov AS (SELECT DISTINCT g.doc_id, p + off AS pos
          FROM g JOIN dup USING (gr),
            (SELECT unnest(generate_series(0, 4)) AS off) o),
        wp AS (SELECT doc_id, unnest(l) AS word,
            unnest(generate_series(0, len(l) - 1)) AS pos FROM w),
        kept AS (SELECT wp.doc_id, wp.pos, wp.word FROM wp
          LEFT JOIN cov ON wp.doc_id = cov.doc_id AND wp.pos = cov.pos
          WHERE cov.doc_id IS NULL),
        reb AS (SELECT doc_id, count(*) AS n_kept,
            string_agg(word, ' ' ORDER BY pos) AS cleaned
          FROM kept GROUP BY doc_id)
        SELECT w.doc_id, CAST(len(l) AS BIGINT) AS n_words,
          CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept,
          coalesce(cleaned, '') AS cleaned
        FROM w LEFT JOIN reb USING (doc_id) ORDER BY w.doc_id""")),

    // E2h: edit-distance near-dup — the string-level dedup family (titles,
    // URLs, short fields) that shingle/token methods overshoot: classic
    // Levenshtein over 30-char prefixes on a bounded slice (all-pairs is the
    // verifier shape; the scale path blocks by length/prefix bucket first,
    // exactly like e2's banding). Both engines implement unit-cost
    // Levenshtein → exact integer oracle.
    QueryDef("e2_edit_distance",
      (s, dir) => {
        val p = docs(s, dir).filter(col("doc_id") < 100)
          .select(col("doc_id"), substring(col("text"), 1, 30).as("s"))
        p.as("a").join(p.as("b"), col("a.doc_id") < col("b.doc_id"))
          .withColumn("dist", levenshtein(col("a.s"), col("b.s")))
          .filter(col("dist") <= 16)
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            col("dist").cast("long").as("dist"))
          .orderBy("doc_a", "doc_b")
      },
      Some("""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          CAST(levenshtein(substring(a.text, 1, 30),
            substring(b.text, 1, 30)) AS BIGINT) AS dist
        FROM documents a JOIN documents b ON a.doc_id < b.doc_id
        WHERE a.doc_id < 100 AND b.doc_id < 100
          AND levenshtein(substring(a.text, 1, 30),
            substring(b.text, 1, 30)) <= 16
        ORDER BY doc_a, doc_b""")),

    // E2h scale twin: the UNBOUNDED edit-distance near-pair query — segment-
    // pigeonhole blocking (EditBlock) instead of all-pairs, exact levenshtein
    // re-rank, whole corpus. The ORACLE stays the textbook all-pairs SQL, so
    // this row PROVES the blocking lossless on the driver data the same way
    // j4/r3 prove salting/chunking by identity. t=4 from the measured
    // distance distribution: dup families sit at dist 0-4 and the 31-word-
    // vocab background starts at 7 — a looser t would "find" background, not
    // duplicates, and (measured at sf0.1) t=8 lets 46% of all pairs through
    // as candidates where t=4 passes 12% (1.5M of 12.5M; raw segment-join
    // fanout 2.2M vs 17M rows). On natural text segments are near-unique and
    // candidates are near-linear in true matches.
    // Reads the once-per-fixture persisted pair artifact (the table the
    // nightly pass writes — built HERE on a cold fixture, warm afterwards;
    // round-12 verdict item 5): the oracle-checked semantics are unchanged
    // (the artifact IS nearPairs' output, keyed on fixture + t + builder
    // code), while the steady-state 100× sweep stops re-paying the ~500 s
    // exact join every round. The real join's cost stays a per-round
    // isolated REGRESS pin, and the routed row remains the operator's
    // deployment spelling.
    QueryDef("e2_edit_blocked",
      (s, dir) => persistedNearPairs(s, dir, t = 4)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("dist"))
        .orderBy("doc_a", "doc_b"),
      Some("""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          CAST(levenshtein(substring(a.text, 1, 30),
            substring(b.text, 1, 30)) AS BIGINT) AS dist
        FROM documents a JOIN documents b ON a.doc_id < b.doc_id
        WHERE levenshtein(substring(a.text, 1, 30),
            substring(b.text, 1, 30)) <= 4
        ORDER BY doc_a, doc_b""")),

    // E2h audit: output-blowup observability for the edit-distance family
    // (round-9 verdict item 5). e2_edit_blocked is exact and therefore
    // Ω(output); on a boilerplate-stamped corpus the OUTPUT is quadratic
    // and an unbounded pair sink is an outage. The production spelling is
    // EditBlock.nearPairsCapped (per-doc pair budget); this row is its
    // audit twin (the g2_coshare_audit pattern): one row whose capped_rows
    // counts EXACTLY what the capped spelling would drop at budget 64 —
    // oracle-checked against the textbook all-pairs SQL, and 0 on the
    // driver corpus, where budget never binds and capped == exact. A
    // pathological fixture tripping the cap is spec-pinned (EditBlockSpec).
    // The audited pair set is the ONCE-PER-FIXTURE persisted artifact
    // (persistedNearPairs), not a fresh run of the blocking join: in
    // production the audit runs over the pair table the nightly pass just
    // WROTE — re-enumerating the join to audit its own output doubled the
    // engine's single most expensive 100× cost (~500 s of the 2212 s
    // sweep) for rows the exact operator row already measures. The
    // artifact is output-sized (pairs, not corpus) and keyed on fixture +
    // params + builder code, so a regenerated corpus rebuilds it.
    QueryDef("e2_edit_blocked_audit",
      (s, dir) => EditBlock.pairAudit(
        persistedNearPairs(s, dir, t = 4), budget = 64),
      Some("""WITH pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(levenshtein(substring(a.text, 1, 30),
              substring(b.text, 1, 30)) AS BIGINT) AS dist
          FROM documents a JOIN documents b ON a.doc_id < b.doc_id
          WHERE levenshtein(substring(a.text, 1, 30),
            substring(b.text, 1, 30)) <= 4),
        sym AS (SELECT id_a, id_b, dist, id_a AS d, id_b AS p FROM pairs
          UNION ALL SELECT id_a, id_b, dist, id_b AS d, id_a AS p FROM pairs),
        r AS (SELECT id_a, id_b,
            row_number() OVER (PARTITION BY d ORDER BY dist, p) AS rk
          FROM sym),
        w AS (SELECT id_a, id_b, max(rk) AS worst FROM r GROUP BY id_a, id_b),
        deg AS (SELECT d, count(*) AS nd FROM sym GROUP BY d)
        SELECT CAST(64 AS BIGINT) AS budget,
          (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS total_pairs,
          (SELECT CAST(coalesce(max(nd), 0) AS BIGINT) FROM deg)
            AS max_pairs_per_doc,
          (SELECT CAST(coalesce(sum(CASE WHEN nd > 64 THEN 1 ELSE 0 END), 0)
            AS BIGINT) FROM deg) AS docs_over_budget,
          (SELECT CAST(coalesce(sum(CASE WHEN worst > 64 THEN 1
            ELSE 0 END), 0) AS BIGINT) FROM w) AS capped_rows""")),

    // E2h pricing row: the candidate-cardinality statistic of the blocking
    // join (EditBlock.candidateStat) — Σ probe×index rows per (m, si, seg)
    // block, the EXACT joined-row count the verify stage enumerates,
    // priced for LINEAR cost before the join runs (the g2 pair-count
    // posture; round-11's 100× sweep measured the unpriced quadratic at
    // 708 s). The oracle re-derives the SAME PassJoin segment layout and
    // multi-match-aware probe windows in SQL, so the window arithmetic —
    // the exactness-critical part of the round-11 fix — is pinned
    // cross-engine: an off-by-one in either engine's segStart/window math
    // changes `candidates` and fails the hash.
    QueryDef("e2_edit_candidates",
      (s, dir) => EditBlock.candidateStat(
        docs(s, dir).select(col("doc_id"),
          substring(col("text"), 1, 30).as("s")),
        "doc_id", "s", t = 4),
      Some("""WITH s0 AS (SELECT doc_id AS id, substring(text, 1, 30) AS s,
            length(substring(text, 1, 30)) AS n
          FROM documents WHERE text IS NOT NULL),
        lng AS (SELECT * FROM s0 WHERE n > 4),
        shrt AS (SELECT * FROM s0 WHERE n <= 4),
        iseg AS (SELECT m, si, substring(s, CAST(stp AS INT),
              CAST(ln AS INT)) AS sg
          FROM (SELECT s, n AS m, si,
              1 + si * (n // 5) + least(si, n % 5) AS stp,
              (n // 5) + CASE WHEN si < n % 5 THEN 1 ELSE 0 END AS ln
            FROM (SELECT *, unnest(generate_series(0, 4)) AS si FROM lng) t0
            ) t1 WHERE ln > 0),
        lens AS (SELECT DISTINCT n AS m FROM lng),
        pr0 AS (SELECT s0.s, s0.n, l.m FROM s0
          JOIN lens l ON abs(s0.n - l.m) <= 4),
        pr1 AS (SELECT s, n, m, si,
            1 + si * (m // 5) + least(si, m % 5) AS stp,
            (m // 5) + CASE WHEN si < m % 5 THEN 1 ELSE 0 END AS ln,
            n - m AS dlt
          FROM (SELECT *, unnest(generate_series(0, 4)) AS si FROM pr0) t0),
        pr2 AS (SELECT *,
            greatest(1, stp + greatest(-si, dlt - (4 - si))) AS lo,
            least(n - ln + 1, stp + least(si, dlt + (4 - si))) AS hi
          FROM pr1 WHERE ln > 0),
        probe AS (SELECT m, si,
            substring(s, CAST(p AS INT), CAST(ln AS INT)) AS sg
          FROM (SELECT *, unnest(generate_series(lo, hi)) AS p
            FROM pr2 WHERE lo <= hi) t0),
        pcnt AS (SELECT m, si, sg, count(*) AS pc FROM probe GROUP BY 1, 2, 3),
        icnt AS (SELECT m, si, sg, count(*) AS ic FROM iseg GROUP BY 1, 2, 3),
        blocks AS (SELECT pcnt.pc * icnt.ic AS cand
          FROM pcnt JOIN icnt ON pcnt.m = icnt.m AND pcnt.si = icnt.si
            AND pcnt.sg = icnt.sg)
        SELECT (SELECT count(*) FROM lng) AS n_long,
          (SELECT count(*) FROM shrt) AS n_short,
          count(*) AS blocks,
          CAST(coalesce(sum(cand), 0) AS BIGINT) AS candidates,
          CAST(coalesce(max(cand), 0) AS BIGINT) AS hottest_block,
          (SELECT count(*) FROM shrt) * (SELECT count(*) FROM shrt)
            AS short_pairs
        FROM blocks""")),

    // E2h routed row: nearPairsRouted — the candidateStat gate AS CODE
    // (round-11 verdict item 2: "deployments gate and route" was
    // documentation; this row is the route running under the driver
    // oracle). Prices the blocking join for EVERY τ ≤ 4 in one action
    // (EditBlock.candidateStatVector, round-12 verdict item 3); the
    // largest affordable τ wins — exact at τ=4, capped tighter otherwise;
    // the decision and its inputs ride on every output row as constant
    // columns. The oracle re-derives the FULL pricing VECTOR (the
    // e2_edit_candidates CTEs parameterized by a τ table), applies the
    // same max-affordable rule, selects pairs AT THE ORACLE'S OWN ROUTED
    // τ, and — when its own decision is 'capped' — applies the SAME
    // worst-rank per-doc cap (budget 64) as nearPairsCapped, so BOTH
    // branches of the route are modeled cross-engine (round-12 ADVICE:
    // the old oracle modeled only the exact branch and returned an empty
    // set with NULL decisions on any fixture that routed). A divergence
    // in either engine's pricing arithmetic, routing rule, or cap
    // semantics changes the constants or the pair set and fails the hash.
    // The affordable-nowhere case stays asymmetric by design: Scala
    // THROWS (the route refuses to run), the SQL would return an empty
    // set — a fixture priced over budget at every τ fails the row
    // loudly on the Spark side before any compare. Budget 5×10⁸ ≈ 25 s
    // of verify at the measured 22M candidates/s/32-core: sf0.01/sf0.1/
    // 10× price under it at t=4 (13.6k / 1.2M / 105M), the 100× corpus
    // prices 10.56G and routes to t=2 (395M — measured 413 s unrouted,
    // ~33 s routed).
    QueryDef("e2_edit_routed",
      (s, dir) => EditBlock.nearPairsRouted(
          docs(s, dir).select(col("doc_id"),
            substring(col("text"), 1, 30).as("s")),
          "doc_id", "s", t = 4,
          candidateBudget = 500000000L, perDocBudget = 64)
        .orderBy("id_a", "id_b"),
      Some("""WITH ts AS (SELECT unnest(generate_series(1, 4)) AS t),
        s0 AS (SELECT doc_id AS id, substring(text, 1, 30) AS s,
            length(substring(text, 1, 30)) AS n
          FROM documents WHERE text IS NOT NULL),
        st AS (SELECT s0.*, ts.t FROM s0, ts),
        lng AS (SELECT * FROM st WHERE n > t),
        iseg AS (SELECT t, m, si, substring(s, CAST(stp AS INT),
              CAST(ln AS INT)) AS sg
          FROM (SELECT t, s, n AS m, si,
              1 + si * (n // (t + 1)) + least(si, n % (t + 1)) AS stp,
              (n // (t + 1)) + CASE WHEN si < n % (t + 1) THEN 1 ELSE 0 END
                AS ln
            FROM (SELECT *, unnest(generate_series(0, t)) AS si FROM lng) t0
            ) t1 WHERE ln > 0),
        lens AS (SELECT DISTINCT t, n AS m FROM lng),
        pr0 AS (SELECT st.t, st.s, st.n, l.m FROM st
          JOIN lens l ON st.t = l.t AND abs(st.n - l.m) <= st.t),
        pr1 AS (SELECT t, s, n, m, si,
            1 + si * (m // (t + 1)) + least(si, m % (t + 1)) AS stp,
            (m // (t + 1)) + CASE WHEN si < m % (t + 1) THEN 1 ELSE 0 END
              AS ln,
            n - m AS dlt
          FROM (SELECT *, unnest(generate_series(0, t)) AS si FROM pr0) t0),
        pr2 AS (SELECT *,
            greatest(1, stp + greatest(-si, dlt - (t - si))) AS lo,
            least(n - ln + 1, stp + least(si, dlt + (t - si))) AS hi
          FROM pr1 WHERE ln > 0),
        probe AS (SELECT t, m, si,
            substring(s, CAST(p AS INT), CAST(ln AS INT)) AS sg
          FROM (SELECT *, unnest(generate_series(lo, hi)) AS p
            FROM pr2 WHERE lo <= hi) t0),
        pcnt AS (SELECT t, m, si, sg, count(*) AS pc
          FROM probe GROUP BY 1, 2, 3, 4),
        icnt AS (SELECT t, m, si, sg, count(*) AS ic
          FROM iseg GROUP BY 1, 2, 3, 4),
        cand AS (SELECT p.t, CAST(coalesce(sum(p.pc * i.ic), 0) AS BIGINT)
            AS cands
          FROM pcnt p JOIN icnt i ON p.t = i.t AND p.m = i.m
            AND p.si = i.si AND p.sg = i.sg
          GROUP BY p.t),
        shortc AS (SELECT t, CAST(count(*) AS BIGINT) AS n_short
          FROM st WHERE n <= t GROUP BY t),
        price AS (SELECT ts.t, coalesce(c.cands, 0)
            + coalesce(sc.n_short, 0) * coalesce(sc.n_short, 0) AS total
          FROM ts LEFT JOIN cand c ON ts.t = c.t
          LEFT JOIN shortc sc ON ts.t = sc.t),
        aff AS (SELECT max(t) AS t_pick FROM price WHERE total <= 500000000),
        dec AS (SELECT
            CASE WHEN a.t_pick = 4 THEN 'exact'
                 WHEN a.t_pick IS NOT NULL THEN 'capped' END AS route,
            CAST(a.t_pick AS BIGINT) AS t_used,
            (SELECT total FROM price WHERE t = a.t_pick)
              AS priced_candidates,
            CAST(500000000 AS BIGINT) AS budget
          FROM aff a),
        pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(levenshtein(substring(a.text, 1, 30),
              substring(b.text, 1, 30)) AS BIGINT) AS dist
          FROM documents a JOIN documents b ON a.doc_id < b.doc_id, dec
          WHERE levenshtein(substring(a.text, 1, 30),
              substring(b.text, 1, 30)) <= dec.t_used),
        sym AS (SELECT id_a, id_b, dist, id_a AS d, id_b AS p FROM pairs
          UNION ALL
          SELECT id_a, id_b, dist, id_b AS d, id_a AS p FROM pairs),
        r AS (SELECT id_a, id_b, dist,
            row_number() OVER (PARTITION BY d ORDER BY dist, p) AS rk
          FROM sym),
        w AS (SELECT id_a, id_b, dist, max(rk) AS worst
          FROM r GROUP BY 1, 2, 3)
        SELECT w.id_a, w.id_b, w.dist,
          dec.route, dec.t_used, dec.priced_candidates, dec.budget
        FROM w, dec
        WHERE dec.route = 'exact' OR w.worst <= 64
        ORDER BY id_a, id_b""")),

    // E4i: unigram LM quality score — the CCNet-style perplexity gate with a
    // corpus-trained unigram model standing in for the KenLM: per doc, the
    // mean negative log-probability of its tokens under corpus frequencies
    // (high = out-of-distribution / junk). Scale shape: the frequency table
    // is vocabulary-sized (shuffle join on the token — posting-list shape,
    // map-side partial-aggregated), the corpus total is a broadcast 1-row
    // aggregate, the per-doc rollup ships ~1 row/doc. Each token's NLL is
    // quantized to integer MICROS before summing (the Carriers trick), so
    // the per-doc sum is exact integer math — immune to double
    // summation-order differences between partitionings and engines; ln()
    // itself is bit-compatible (same contract as e4_tfidf's ln, driver-
    // proven there).
    QueryDef("e4_unigram_logprob",
      (s, dir) => {
        // (doc, token) grain, NOT token grain: the per-doc term-frequency
        // aggregate rides the tokenize pass map-side (partial agg shrinks
        // the wire to doc-vocab rows), and every later consumer — vocab
        // frequency, scoring join, per-doc rollup — reads the several-
        // fold-smaller table. The integer-micros NLL term distributes
        // EXACTLY over the count (n_dt · round(term) ≡ Σ round(term)), so
        // the result is bit-identical to the per-token spelling. (This was
        // the engine's largest token-grain checkpoint; §14.11 measured its
        // serialized-read cost and shrank the snapshot instead of
        // un-serializing it.)
        // (doc, term) counts come off the compiled per-row kernel
        // (tokenCounts — r17): the explode+groupBy spelling turned every
        // token OCCURRENCE into a row for the hash aggregate to re-group,
        // when the key is doc-local; now only term-grain rows ever exist
        val dt = docs(s, dir)
          .select(col("doc_id"), explode(tokenCounts(col("text"))).as("e"))
          .select(col("doc_id"), col("e.t").as("t"), col("e.cnt").as("n_dt"))
          .localCheckpoint(true, graft.operators.Ckpt.SerLevel)
        val freq = dt.groupBy("t").agg(sum("n_dt").as("cnt"))
          .localCheckpoint(true, graft.operators.Ckpt.SerLevel)
        val total = freq.agg(sum("cnt").as("n_total"))
        val nllMicros = round(
          -log(col("cnt").cast(DoubleType) / col("n_total")) * 1e6, 0)
          .cast("long")
        // no broadcast hint on freq: vocabulary-sized — tiny here, but
        // Heaps'-law-unbounded on a natural corpus; AQE broadcasts it at
        // runtime when it measures small (the e4_bigram_logprob argument)
        dt.join(freq, "t").crossJoin(broadcast(total))
          .groupBy("doc_id")
          .agg(sum("n_dt").as("n_tokens"),
            sum(col("n_dt") * nllMicros).as("nll_micros"))
          .select(col("doc_id"), col("n_tokens"), col("nll_micros"),
            round(col("nll_micros").cast(DoubleType) / col("n_tokens")
              / 1e6, 6).as("avg_nll"))
          .orderBy("doc_id")
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest($tokensSql) AS t
          FROM documents),
        dt AS (SELECT doc_id, t, count(*) AS n_dt FROM tok GROUP BY 1, 2),
        freq AS (SELECT t, CAST(sum(n_dt) AS BIGINT) AS cnt
          FROM dt GROUP BY t),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM freq)
        SELECT doc_id, CAST(sum(n_dt) AS BIGINT) AS n_tokens,
          CAST(sum(n_dt * CAST(round(-ln(CAST(cnt AS DOUBLE) / n_total)
            * 1000000) AS BIGINT)) AS BIGINT) AS nll_micros,
          round(CAST(sum(n_dt * CAST(round(-ln(CAST(cnt AS DOUBLE) / n_total)
              * 1000000) AS BIGINT)) AS DOUBLE)
            / CAST(sum(n_dt) AS BIGINT) / 1000000.0, 6) AS avg_nll
        FROM dt JOIN freq USING (t) CROSS JOIN tot
        GROUP BY doc_id ORDER BY doc_id""")),

    // E4o: bigram-LM scoring — the 2-gram upgrade of e4_unigram_logprob:
    // per-doc NLL under the corpus bigram model P(w2|w1) = c(w1,w2)/c(w1·),
    // the stronger fluency/perplexity gate (no smoothing needed: every doc
    // bigram is by construction in the corpus counts). Bigrams via
    // posexplode+lead (the spelling e4_repetition measured 6× faster than
    // the HOF chain); both count tables are vocabulary²-bounded partial
    // aggs, and the two join-backs are posting joins on the bigram/unigram
    // key — at 100 TB the counts table is the thin side, never the corpus.
    // Per-bigram NLL is quantized to integer micros pre-sum (order-free,
    // the e4_unigram_logprob contract).
    QueryDef("e4_bigram_logprob",
      (s, dir) => {
        // (doc, w1, w2) grain with a per-doc count, NOT bigram grain: c2/c1
        // and the scoring join all read the smaller distinct-bigram table;
        // the integer-micros NLL term distributes exactly over n_b (the
        // e4_unigram_logprob argument). Bigrams pair MAP-SIDE (AdjacentPairs
        // — each token's successor is the next array slot of its own row):
        // the previous posexplode→lead-window spelling shuffled and sorted
        // the corpus at token grain purely to re-discover that adjacency,
        // so its first exchange carried every token; now the first exchange
        // carries the partial-aggregated (doc, w1, w2) counts. (A lead
        // window was itself the round-13 fix over a zip_with HOF chain —
        // HOF lambdas don't codegen; the compiled kernel keeps that win
        // without the token-grain exchange.)
        val bgc = docs(s, dir)
          .select(col("doc_id"),
            explode(adjacentPairs(tokens(col("text")))).as("b"))
          .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
          .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("n_b"))
          .localCheckpoint(true, graft.operators.Ckpt.SerLevel)
        val c2 = bgc.groupBy("w1", "w2").agg(sum("n_b").as("c2"))
        val c1 = bgc.groupBy("w1").agg(sum("n_b").as("c1"))
        val nll = round(-log(col("c2").cast(DoubleType) / col("c1")) * 1e6, 0)
          .cast("long")
        // no broadcast hint on the count tables: c2 is vocab²-bounded —
        // tiny here, data-sized for a 50k-BPE vocabulary — so the right
        // join strategy is a runtime call (AQE converts to broadcast when
        // the built side measures small, keeps the shuffle join when not)
        bgc.join(c2, Seq("w1", "w2"))
          .join(c1, Seq("w1"))
          .groupBy("doc_id")
          .agg(sum("n_b").as("n_bigrams"),
            sum(col("n_b") * nll).as("nll_micros"))
          .select(col("doc_id"), col("n_bigrams"), col("nll_micros"),
            round(col("nll_micros").cast(DoubleType) / col("n_bigrams")
              / 1e6, 6).as("avg_nll"))
          .orderBy("doc_id")
      },
      Some(s"""WITH bgl AS (SELECT doc_id, unnest(list_transform(
            generate_series(1, len(l) - 1),
            i -> {'w1': l[i], 'w2': l[i + 1]})) AS b
          FROM (SELECT doc_id, $tokensSql AS l FROM documents)),
        bgc AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2, count(*) AS n_b
          FROM bgl GROUP BY 1, 2, 3),
        c2 AS (SELECT w1, w2, CAST(sum(n_b) AS BIGINT) AS c2
          FROM bgc GROUP BY 1, 2),
        c1 AS (SELECT w1, CAST(sum(n_b) AS BIGINT) AS c1 FROM bgc GROUP BY 1)
        SELECT doc_id, CAST(sum(n_b) AS BIGINT) AS n_bigrams,
          CAST(sum(n_b * CAST(round(-ln(CAST(c2 AS DOUBLE) / c1) * 1000000)
            AS BIGINT)) AS BIGINT) AS nll_micros,
          round(CAST(sum(n_b * CAST(round(-ln(CAST(c2 AS DOUBLE) / c1)
              * 1000000) AS BIGINT)) AS DOUBLE)
            / CAST(sum(n_b) AS BIGINT) / 1000000.0, 6) AS avg_nll
        FROM bgc JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
        GROUP BY doc_id ORDER BY doc_id""")),

    // E4j: character-entropy gate — Shannon entropy of the per-doc character
    // distribution, the classic gibberish/boilerplate detector (natural text
    // sits in a narrow entropy band; random noise is high, repeated filler
    // low). Same order-free micro-quantization as e4_unigram_logprob: each
    // (doc, char) term −(p·ln p) is a deterministic per-row double quantized
    // to integer micros before the exact integer sum. Char counts partial-
    // aggregate map-side (≤ alphabet-size rows per doc on the wire).
    QueryDef("e4_char_entropy",
      (s, dir) => {
        // (the oracle's [\s\S] rather than '.': Java regex '.' excludes \r
        // and Unicode line separators while DuckDB's RE2 '.' excludes only
        // \n — the explicit class matches EVERY character identically)
        // One compiled histogram pass (CharCounts) instead of a per-char
        // regex match + char-grain explode + (doc, c) hash re-group: the
        // exploded rows only ever fed that count, and the count is exactly
        // the kernel's per-code-point tally, so cf is row-identical. The
        // checkpoint matters as much as the kernel: cf feeds BOTH the
        // per-doc length aggregate and the scoring join, and unrooted the
        // whole corpus subtree executed once per consumer (the r17 plan
        // audit found two full Scan→Generate→HashAgg chains under this
        // row; cf is alphabet×docs-sized, the cheapest table in the query,
        // so materializing it is the e4_unigram dt-checkpoint pattern).
        val cf = docs(s, dir)
          .select(col("doc_id"), explode(charCounts(col("text"))).as("e"))
          .select(col("doc_id"), col("e.c").as("c"), col("e.cnt").as("cnt"))
          .localCheckpoint(true, graft.operators.Ckpt.SerLevel)
        val lens = cf.groupBy("doc_id").agg(sum("cnt").as("len"))
        val p = col("cnt").cast(DoubleType) / col("len")
        cf.join(lens, "doc_id")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_distinct_chars"),
            sum(round(-p * log(p) * 1e6, 0).cast("long")).as("ent_micros"))
          .select(col("doc_id"), col("n_distinct_chars"),
            round(col("ent_micros").cast(DoubleType) / 1e6, 6).as("entropy"))
          .orderBy("doc_id")
      },
      Some("""WITH ch AS (SELECT doc_id,
            unnest(regexp_extract_all(text, '[\s\S]')) AS c
          FROM documents),
        cf AS (SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY 1, 2),
        lens AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS len FROM cf
          GROUP BY 1)
        SELECT cf.doc_id, count(*) AS n_distinct_chars,
          round(CAST(sum(CAST(round(-(CAST(cnt AS DOUBLE) / len)
              * ln(CAST(cnt AS DOUBLE) / len) * 1000000) AS BIGINT)) AS DOUBLE)
            / 1000000.0, 6) AS entropy
        FROM cf JOIN lens ON cf.doc_id = lens.doc_id
        GROUP BY cf.doc_id ORDER BY cf.doc_id""")),

    // E5-adjacent: opaque binary payload plumbing (multimodal column model):
    // text → binary column, byte length + content digest. docsScan, not
    // docs: the mm_* rows are hash/byte-prefix-grade per row — the widening
    // repartition cost them 2-3× at sf0.1 for parallelism they can't use
    QueryDef("mm_binary_meta",
      (s, dir) => docsScan(s, dir)
        .withColumn("payload", col("text").cast("binary"))
        .select(col("doc_id"),
          length(col("payload")).cast("long").as("byte_len"),
          sha2(col("payload"), 256).as("digest"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, octet_length(CAST(text AS BLOB)) AS byte_len,
        sha256(text) AS digest FROM documents ORDER BY doc_id""")),

    // E5c: magic-byte dispatch — group binary payloads by their 4-byte
    // header prefix, the routing step a multimodal ingest runs before
    // format-specific decoding (JPEG FFD8…, PNG 8950…; here the payloads
    // are text-cast blobs so the "magics" are word prefixes). Pins binary
    // SLICING (substring over BinaryType) + hex rendering cross-engine;
    // purely map-side + a magic-sized agg.
    QueryDef("mm_magic_bytes",
      (s, dir) => docsScan(s, dir)
        .withColumn("payload", col("text").cast("binary"))
        .groupBy(hex(substring(col("payload"), 1, 4)).as("magic_hex"))
        .agg(count(lit(1)).as("n"),
          sum(length(col("payload"))).as("bytes"))
        .orderBy("magic_hex"),
      // oracle slices BYTES, not characters: DuckDB has no BLOB substring,
      // so the first 4 bytes come off the hex rendering (8 hex chars) —
      // char-based substring(text,1,4) would diverge on multi-byte UTF-8
      Some("""SELECT substring(hex(CAST(text AS BLOB)), 1, 8) AS magic_hex,
          count(*) AS n,
          CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS bytes
        FROM documents GROUP BY 1 ORDER BY 1""")),

    // E5e: base64 transport round-trip — the wire encoding binary payloads
    // cross JSON/HTTP boundaries in; encode → decode must be the identity
    // (digest-checked) and the size overhead the documented 4/3. Map-side.
    // Spark's base64 emits MIME-chunked output (CRLF every 76 chars) while
    // DuckDB's to_base64 is plain RFC 4648 — the length compares the
    // PAYLOAD encoding, so the line breaks are stripped first (decoders
    // accept both framings, as the digest check proves).
    // docs (widened), unlike the other mm_* rows: base64 + unbase64 + two
    // sha2 passes per payload is codec-grade per-byte work — the 100× sweep
    // measured the narrow-scan spelling at 28.6 s (16.8× its 10× cost,
    // single-threaded by the one-file fixture) where the widened shape is
    // ~linear; at sf0.1 the repartition costs ~0.2 s. The other mm rows
    // stay scan-bound (byte prefix / length / one hash) and measured
    // ~linear unwidened.
    QueryDef("mm_base64_roundtrip",
      (s, dir) => docs(s, dir)
        .withColumn("payload", col("text").cast("binary"))
        .withColumn("b64", base64(col("payload")))
        .select(col("doc_id"),
          length(translate(col("b64"), "\r\n", "")).cast("long")
            .as("b64_len"),
          (sha2(unbase64(col("b64")), 256) === sha2(col("payload"), 256))
            .cast("long").as("roundtrip_ok"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, length(to_base64(CAST(text AS BLOB))) AS b64_len,
          CAST(sha256(CAST(from_base64(to_base64(CAST(text AS BLOB)))
            AS VARCHAR)) = sha256(text) AS BIGINT) AS roundtrip_ok
        FROM documents ORDER BY doc_id"""))
  )
}
