package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchAgreementSpec extends SparkSpec {

  test("kernel equals the HOF spelling it replaced, through codegen") {
    import spark.implicits._
    // Seq[Byte], not Array[Byte]: the Array encoder gives BINARY, the Seq
    // encoder the array<tinyint> the sketch column actually carries
    val df = Seq(
      (Seq[Byte](1, 2, 3, 4), Seq[Byte](1, 9, 3, 9)),   // 2 agree
      (Seq[Byte](0, 0, 0, 0), Seq[Byte](0, 0, 0, 0)),   // all agree
      (Seq[Byte](-5, 7, 127, -128), Seq[Byte](5, 7, 127, -128)), // 3
      (Seq.empty[Byte], Seq.empty[Byte])                  // empty
    ).toDF("a", "b")
    val got = df.select(
      SketchAgreement(col("a"), col("b")).as("k"),
      aggregate(zip_with(col("a"), col("b"),
          (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v).as("hof"))
      .collect()
    for (r <- got)
      assert(r.getInt(0) == r.getInt(1), s"kernel ${r.getInt(0)} != hof ${r.getInt(1)}")
    assert(got.map(_.getInt(0)).toSeq == Seq(2, 4, 3, 0))
  }

  test("null input is null; mismatched lengths count the common prefix") {
    import spark.implicits._
    val df = Seq(
      (Option(Seq[Byte](1, 2, 3)), Option.empty[Seq[Byte]]),
      (Option(Seq[Byte](1, 2, 3)), Option(Seq[Byte](1, 2)))
    ).toDF("a", "b")
    val got = df.select(SketchAgreement(col("a"), col("b"))).collect()
    assert(got(0).isNullAt(0))
    assert(got(1).getInt(0) == 2)
  }
}
