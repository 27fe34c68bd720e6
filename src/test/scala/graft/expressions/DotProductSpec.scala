package graft.expressions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.VectorFunctions

/** Native vec_dot expression: parity with the HOF spelling on real data,
  * null/length-mismatch semantics, and SQL registration via extensions. */
class DotProductSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("vec_dot equals the HOF aggregate spelling bit-for-bit") {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), VectorFunctions.toDoubleArr(col("embedding")).as("v"))
    val both = e.select(
      VectorFunctions.dot(col("v"), col("v")).as("native"),
      VectorFunctions.dotHof(col("v"), col("v")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    assert(both.filter(col("native").isNull).count() == 0)
  }

  test("null array, null element, and length mismatch yield NULL") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),      // 11.0
      (None, Some(Seq(1.0))),                          // null side
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0))),           // length mismatch
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0, 2.0, 3.0)))) // length mismatch
      .toDF("a", "b")
    val out = df.select(VectorFunctions.dot(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out.drop(1).forall(_.isNullAt(0)))
  }

  test("vec_dot is SQL-callable via the session's GraftExtensions") {
    // graft.GraftExtensions (installed by GraftSession) registers the
    // function; no manual registry poke needed
    val r = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head()
    assert(r.getDouble(0) == 11.0)
  }
}
