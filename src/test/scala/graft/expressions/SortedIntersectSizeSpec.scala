package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The merge-intersect kernel must equal `size(array_intersect)` on every
  * sorted duplicate-free input the verify path can produce — including
  * empty sides, disjoint sets, full overlap, multi-byte codepoints (binary
  * UTF-8 order is what `array_sort` applies to strings), and the randomized
  * shingle-set shapes of the dedup family. */
class SortedIntersectSizeSpec extends SparkSpec {

  private def check(pairs: Seq[(Seq[String], Seq[String])]): Unit = {
    import spark.implicits._
    val df = pairs.toDF("a", "b")
      .select(array_sort(col("a")).as("a"), array_sort(col("b")).as("b"))
    val rows = df.select(
      graft.expressions.SortedIntersectSize(col("a"), col("b")).as("merge"),
      size(array_intersect(col("a"), col("b"))).as("builtin")).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1),
      s"merge=${r.getInt(0)} builtin=${r.getInt(1)}"))
  }

  test("edge shapes: empty / disjoint / identical / subset / multi-byte") {
    check(Seq(
      (Seq.empty[String], Seq.empty[String]),
      (Seq.empty[String], Seq("a", "b")),
      (Seq("a", "b"), Seq("c", "d")),
      (Seq("a", "b", "c"), Seq("a", "b", "c")),
      (Seq("a", "b", "c", "d"), Seq("b", "d")),
      (Seq("héllo", "wörld", "日本語"), Seq("héllo", "zz", "日本語")),
      (Seq("ab", "abc", "abcd"), Seq("abc", "abcde"))))
  }

  test("randomized shingle-set shapes ≡ array_intersect") {
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 200).map(i => f"sh$i%03d")
    val pairs = (0 until 200).map { _ =>
      def set() = rnd.shuffle(vocab).take(1 + rnd.nextInt(80)).distinct
      (set(), set())
    }
    check(pairs)
  }

  test("null element (sorted last) stops the merge without counting") {
    import spark.implicits._
    val df = Seq((Seq[Option[String]](Some("a"), Some("b"), None),
        Seq[Option[String]](Some("a"), None)))
      .toDF("a", "b")
      .select(array_sort(col("a")).as("a"), array_sort(col("b")).as("b"))
    val r = df.select(
      graft.expressions.SortedIntersectSize(col("a"), col("b"))).head
    assert(r.getInt(0) == 1)  // only "a" is a shared string
  }
}
