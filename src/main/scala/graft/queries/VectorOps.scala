package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions._
import graft.operators.OrderedOps

/** Similarity search over `embeddings` (SURVEY.md §2b E3).
  *
  * Scale design: the exact top-k query broadcasts the (small) query set and
  * streams the candidate side — no shuffle of the big table. The all-pairs
  * variant is bounded to an id range at test scale; the 100 TB path is
  * [[graft.functions.VectorFunctions.lshBucket]]-bucketed ANN (e3_lsh_ann),
  * where pairs only form inside a bucket.
  */
object VectorOps {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), toDoubleArr(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))

  /** Shared DuckDB CTE: per-(vec, position) doubles + norms. */
  private val baseCte =
    """WITH x AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
        unnest(generate_series(1, len(embedding))) AS i FROM embeddings),
      norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM x GROUP BY vec_id)"""

  val defs: Seq[QueryDef] = Seq(

    // exact brute-force cosine top-k: broadcast queries × stream candidates
    QueryDef("e3_cosine_topk",
      (s, dir) => {
        val all = emb(s, dir)
        val q = all.filter(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
        val scored = broadcast(q).join(all, col("q_id") =!= col("vec_id"))
          .withColumn("cos", cosine(col("qv"), col("v"), col("qn"), col("nrm")))
        OrderedOps.topKPerGroup(scored, Seq("q_id"),
            Seq(col("cos").desc, col("vec_id")), k = 5)
          .withColumn("rank", col("rank").cast("long"))
          .select(col("q_id"), col("rank"), col("vec_id").as("n_id"),
            round(col("cos"), 6).as("cos_sim"))
          .orderBy("q_id", "rank")
      },
      Some(s"""$baseCte,
        dots AS (SELECT a.vec_id AS qa, b.vec_id AS qb, sum(a.v * b.v) AS dot
          FROM x a JOIN x b ON a.i = b.i
          WHERE a.vec_id < 20 AND a.vec_id <> b.vec_id GROUP BY 1, 2),
        scored AS (SELECT qa, qb, dot / (na.nrm * nb.nrm) AS cos
          FROM dots JOIN norms na ON qa = na.vec_id
          JOIN norms nb ON qb = nb.vec_id),
        ranked AS (SELECT qa AS q_id, qb AS n_id, cos, row_number() OVER (
          PARTITION BY qa ORDER BY cos DESC, qb) AS rank FROM scored)
        SELECT q_id, rank, n_id, round(cos, 6) AS cos_sim
        FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""")),

    // embedding-cosine near-duplicate pairs above a similarity threshold
    QueryDef("e3_cosine_pairs",
      (s, dir) => {
        val bounded = emb(s, dir).filter(col("vec_id") < 300)
        val a = bounded.select(col("vec_id").as("a_id"), col("v").as("av"),
          col("nrm").as("an"))
        val b = bounded.select(col("vec_id").as("b_id"), col("v").as("bv"),
          col("nrm").as("bn"))
        a.join(b, col("a_id") < col("b_id"))
          .withColumn("cos", cosine(col("av"), col("bv"), col("an"), col("bn")))
          .filter(col("cos") >= 0.4)
          .select(col("a_id"), col("b_id"), round(col("cos"), 6).as("cos_sim"))
          .orderBy("a_id", "b_id")
      },
      Some(s"""$baseCte,
        dots AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id, sum(a.v * b.v) AS dot
          FROM x a JOIN x b ON a.i = b.i
          WHERE a.vec_id < 300 AND b.vec_id < 300 AND a.vec_id < b.vec_id
          GROUP BY 1, 2)
        SELECT a_id, b_id, round(dot / (na.nrm * nb.nrm), 6) AS cos_sim
        FROM dots JOIN norms na ON a_id = na.vec_id
        JOIN norms nb ON b_id = nb.vec_id
        WHERE dot / (na.nrm * nb.nrm) >= 0.4
        ORDER BY a_id, b_id""")),

    // LSH-bucketed ANN (the 100 TB scale path): multi-table hyperplane sign
    // signatures → same-(table,bucket) candidates → exact cosine re-rank of
    // the deduped candidate set. Probabilistic recall → rows-only driver
    // check; recall vs brute force asserted in VectorSpec.
    QueryDef("e3_lsh_ann",
      (s, dir) => lshAnnTopK(s, dir, nQueries = 50, k = 3),
      None)
  )

  /** Multi-table LSH ANN: candidates form only inside a (table, bucket) —
    * the shuffle key — then exact re-rank. */
  def lshAnnTopK(s: SparkSession, dir: String, nQueries: Int,
                 k: Int): DataFrame = {
    val all = emb(s, dir).withColumn("tb",
      explode(lshTableBuckets(col("v"), tables = 8, planesPerTable = 6, dim = 64)))
    val q = all.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("tb"))
    val candIds = broadcast(q).join(all.select(col("vec_id"), col("tb")), Seq("tb"))
      .filter(col("q_id") =!= col("vec_id"))
      .select("q_id", "vec_id").dropDuplicates("q_id", "vec_id")
    val base = emb(s, dir)
    val scored = candIds
      .join(base.select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn")), Seq("q_id"))
      .join(base, Seq("vec_id"))
      .withColumn("cos", cosine(col("qv"), col("v"), col("qn"), col("nrm")))
    OrderedOps.topKPerGroup(scored, Seq("q_id"),
        Seq(col("cos").desc, col("vec_id")), k)
      .select(col("q_id"), col("rank"), col("vec_id").as("n_id"),
        round(col("cos"), 6).as("cos_sim"))
      .orderBy("q_id", "rank")
  }

  /** Brute-force exact top-k (test baseline for recall measurements). */
  def bruteForceTopK(s: SparkSession, dir: String, nQueries: Int,
                     k: Int): DataFrame = {
    val all = emb(s, dir)
    val q = all.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = broadcast(q).join(all, col("q_id") =!= col("vec_id"))
      .withColumn("cos", cosine(col("qv"), col("v"), col("qn"), col("nrm")))
    OrderedOps.topKPerGroup(scored, Seq("q_id"),
        Seq(col("cos").desc, col("vec_id")), k)
      .select(col("q_id"), col("rank"), col("vec_id").as("n_id"),
        round(col("cos"), 6).as("cos_sim"))
      .orderBy("q_id", "rank")
  }

}
