package graft.expressions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.VectorFunctions

/** Native vec_l2_micros: bit-parity with the HOF spelling on real data
  * (incl. the HALF_UP rounding edge), null semantics, SQL registration. */
class L2MicrosSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("vec_l2_micros equals the HOF aggregate spelling on every vector pair") {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), VectorFunctions.toDoubleArr(col("embedding")).as("v"))
    val a = e.select(col("vec_id").as("ia"), col("v").as("va"))
    val b = e.select(col("vec_id").as("ib"), col("v").as("vb"))
    val both = a.join(b, col("ia") < col("ib") && col("ib") < col("ia") + 10)
      .select(
        VectorFunctions.l2Micros(col("va"), col("vb")).as("native"),
        VectorFunctions.l2MicrosHof(col("va"), col("vb")).as("hof"))
    assert(both.count() > 100)
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    assert(both.filter(col("native").isNull).count() == 0)
  }

  test("HALF_UP edges match Spark round: x.5 up, largest-double-below-.5 down") {
    import spark.implicits._
    // (a, b) chosen so (a-b)^2 * 1e6 lands on rounding edges:
    //   d = 0.0005       -> 0.25e-6 * 1e6 = 0.25              -> 0
    //   d = sqrt(2.5e-6) -> 2.5 (exactly x.5 after double math) -> 3 (HALF_UP)
    val df = Seq(
      (Seq(0.0005), Seq(0.0)),
      (Seq(math.sqrt(2.5e-6)), Seq(0.0)),
      (Seq(1.0, 2.0), Seq(1.0)), // length mismatch -> null
      (Seq(0.3, 0.4), Seq(0.3, 0.4))) // zero distance
      .toDF("a", "b")
    val out = df.select(
      VectorFunctions.l2Micros(col("a"), col("b")).as("n"),
      VectorFunctions.l2MicrosHof(col("a"), col("b")).as("h")).collect()
    for (r <- out) assert(r.isNullAt(0) == r.isNullAt(1) &&
      (r.isNullAt(0) || r.getLong(0) == r.getLong(1)), s"$r")
    assert(out(0).getLong(0) == 0L)
    assert(out(2).isNullAt(0))
    assert(out(3).getLong(0) == 0L)
  }

  test("special values match the HOF: NaN→0 per term, Infinity saturates") {
    import spark.implicits._
    // the naive truncate-then-+1 would WRAP Long.MaxValue on +Inf where the
    // HOF's cast saturates — this pins the saturation branch
    val df = Seq(
      (Seq(Double.NaN, 1.0), Seq(0.0, 1.0)),
      (Seq(Double.PositiveInfinity), Seq(0.0)),
      (Seq(Double.MaxValue), Seq(-Double.MaxValue)),
      (Seq(1e12), Seq(0.0))) // finite but > 2^63 after *1e6 squared
      .toDF("a", "b")
    val out = df.select(
      VectorFunctions.l2Micros(col("a"), col("b")).as("n"),
      VectorFunctions.l2MicrosHof(col("a"), col("b")).as("h")).collect()
    for (r <- out)
      assert(r.getLong(0) == r.getLong(1), s"native/HOF diverge: $r")
  }

  test("property: native == HOF on random vectors (scalacheck)") {
    import org.scalacheck.Gen
    import spark.implicits._
    val gen = Gen.listOfN(64,
      Gen.oneOf(Gen.choose(-2.0, 2.0), Gen.oneOf(0.0, -0.0, 1e-9, 1e9)))
    val pairs = (1 to 60).map { i =>
      val seed = org.scalacheck.rng.Seed(i.toLong)
      (gen.apply(Gen.Parameters.default, seed).get,
        gen.apply(Gen.Parameters.default, seed.next).get)
    }
    val out = pairs.toDF("a", "b").select(
      VectorFunctions.l2Micros(col("a"), col("b")).as("n"),
      VectorFunctions.l2MicrosHof(col("a"), col("b")).as("h")).collect()
    assert(out.length == 60)
    for (r <- out)
      assert(r.getLong(0) == r.getLong(1), s"native/HOF diverge: $r")
  }

  test("vec_l2_micros is SQL-callable via the session's GraftExtensions") {
    val r = spark.sql(
      "SELECT vec_l2_micros(array(1.0d, 2.0d), array(1.0d, 1.0d)) AS d").head()
    assert(r.getLong(0) == 1000000L)
  }
}
