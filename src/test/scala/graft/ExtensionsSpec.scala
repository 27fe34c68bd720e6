package graft

/** The SQL surface of the native expressions: GraftExtensions must register
  * vec_dot so pure-SQL users get the same codegen'd kernel as the Column API.
  */
class ExtensionsSpec extends SparkSpec {

  test("vec_dot is callable from SQL and agrees with the Column API") {
    val row = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head()
    assert(row.getDouble(0) == 32.0)
    // null contract: length mismatch and null inputs yield NULL
    assert(spark.sql("SELECT vec_dot(array(1.0D), array(1.0D, 2.0D))")
      .head().isNullAt(0))
    assert(spark.sql("SELECT vec_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D))")
      .head().isNullAt(0))
  }

  test("optimizer rewrites the HOF dot-product spelling to vec_dot") {
    import org.apache.spark.sql.functions._
    val df = spark.range(3).select(
      aggregate(
        zip_with(array(lit(1.0), col("id").cast("double")),
          array(lit(2.0), lit(3.0)), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("d"))
    assert(df.queryExecution.optimizedPlan.toString.contains("vec_dot"),
      df.queryExecution.optimizedPlan.toString)
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(2.0, 5.0, 8.0))
    // a non-matching aggregate (different merge fn) must NOT rewrite
    val other = spark.range(1).select(
      aggregate(zip_with(array(lit(1.0)), array(lit(2.0)), (x, y) => x * y),
        lit(0.0), (acc, x) => acc - x).as("d"))
    assert(!other.queryExecution.optimizedPlan.toString.contains("vec_dot"))
    assert(other.head().getDouble(0) == -2.0)
  }
}
