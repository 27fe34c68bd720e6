package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Round-12 verdict item 4: probe e2_dup_ngrams' window shape under a
  * HOT-shingle corpus (one boilerplate 8-gram in ~90% of docs) and compare
  * against the aggregation-only "unique-subtract" shape, which has no
  * per-shingle row concentration at all: a shingle with df==1 has exactly
  * one posting row, so its doc_id rides the groupBy(sh) aggregate as
  * min(doc_id), and n_dup = n_shingles − n_uniq per doc — every stage is a
  * partial-aggregating groupBy or a doc-keyed join of doc-sized tables.
  * Run with Test/runMain graft.ProfileHotShingle [dir]. Not a spec. */
object ProfileHotShingle {

  private def shingles = graft.functions.TextFunctions.shingles _

  /** The shipped round-12 window shape. */
  def windowShape(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = docs.filter(length(col("text")) >= 8)
      .select(col("doc_id"), shingles(col("text"), 8).as("arr"))
      .select(col("doc_id"), explode(col("arr")).as("sh"))
    val withDf = sh.withColumn("df",
      count(lit(1)).over(Window.partitionBy("sh")))
    withDf.groupBy("doc_id").agg(
        count(lit(1)).as("n_shingles"),
        sum((col("df") >= 2).cast("long")).as("n_dup"))
      .select(col("doc_id"), col("n_shingles"), col("n_dup"),
        round(col("n_dup").cast(DoubleType) / col("n_shingles"), 6)
          .as("dup_frac"))
  }

  /** The skew-proof aggregation-only shape (matches the catalog row:
    * n_shingles = size(arr) on the pre-explode grain, one Generate with
    * one consumer). */
  def uniqueSubtractShape(docs: DataFrame): DataFrame = {
    val based = docs.filter(length(col("text")) >= 8)
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
        (col("n_shingles") - coalesce(col("n_uniq"), lit(0L))).as("n_dup"))
      .select(col("doc_id"), col("n_shingles"), col("n_dup"),
        round(col("n_dup").cast(DoubleType) / col("n_shingles"), 6)
          .as("dup_frac"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("scale_sf1")
    val spark: SparkSession = GraftSession.local(32, "profile-hot-shingle")
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").localCheckpoint()
    // hot corpus: one 23-char boilerplate suffix (16 hot 8-grams) on 90%
    // of docs — the "every page carries the same footer" corpus
    val hot = base.withColumn("text",
        when(pmod(col("doc_id"), lit(10)) =!= 0,
          concat(col("text"), lit(" COMMON FOOTER BOILERPLATE")))
          .otherwise(col("text")))
      .localCheckpoint()
    def time(label: String)(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[hs] $label $s%.2f s")
      s
    }
    // parity first: identical results on both corpora
    for ((nm, d) <- Seq("base" -> base, "hot" -> hot)) {
      val a = windowShape(d).collect().map(_.toString).sorted
      val b = uniqueSubtractShape(d).collect().map(_.toString).sorted
      println(s"[hs] parity $nm: rows=${a.length} equal=${a.sameElements(b)}")
    }
    for (rep <- 1 to 3; (nm, d) <- Seq("base" -> base, "hot" -> hot)) {
      time(s"window          $nm rep$rep")(windowShape(d))
      time(s"unique-subtract $nm rep$rep")(uniqueSubtractShape(d))
    }
    spark.stop()
  }
}
