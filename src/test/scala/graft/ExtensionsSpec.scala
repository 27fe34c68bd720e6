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
}
