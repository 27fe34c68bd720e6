package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions.{lshTableBuckets, lshTableBucketsRef}

/** The compiled multi-table LSH kernel must be bit-identical to the
  * expression spelling it replaced (48 vec_dot projections against literal
  * plane arrays): same table ids, same bucket bits — including the
  * degenerate inputs (wrong-length vector, null element → all-zero
  * buckets; null vector → null). Random vectors make the sign of every
  * projection exercise both branches. */
class LshTableBucketsSpec extends SparkSpec {

  test("kernel ≡ expression spelling on random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vecs = (0L until 200L).map(i =>
      (i, Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = vecs.toDF("id", "v")
    val both = df.select(col("id"),
        lshTableBuckets(col("v"), 8, 6, 64).as("k"),
        lshTableBucketsRef(col("v"), 8, 6, 64).as("r"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[org.apache.spark.sql.Row](1) ==
        r.getSeq[org.apache.spark.sql.Row](2), s"id ${r.getLong(0)}")
    }
  }

  test("degenerate inputs match: wrong length / null element / null vector " +
      "→ the ref spelling's zero buckets, never null") {
    import spark.implicits._
    val df = Seq(
      (0L, Some(Seq.fill(10)(Option(0.5)))),              // wrong length
      (1L, Some(Seq.fill(64)(Option(0.5)).updated(3, Option.empty[Double]))),
      (2L, Option.empty[Seq[Option[Double]]])             // null vector
    ).toDF("id", "v")
    val both = df.select(col("id"),
        lshTableBuckets(col("v"), 8, 6, 64).as("k"),
        lshTableBucketsRef(col("v"), 8, 6, 64).as("r"))
      .collect()
    both.foreach { r =>
      assert(!r.isNullAt(1) && !r.isNullAt(2), s"id ${r.getLong(0)} nullness")
      assert(r.getSeq[org.apache.spark.sql.Row](1) ==
        r.getSeq[org.apache.spark.sql.Row](2), s"id ${r.getLong(0)}")
      assert(r.getSeq[org.apache.spark.sql.Row](1)
        .forall(s => s.getLong(1) == 0L), s"id ${r.getLong(0)} zero buckets")
    }
  }
}
