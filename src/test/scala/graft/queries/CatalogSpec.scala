package graft.queries

import graft.{SparkSpec, SparkEntry}

/** Catalog-wide contract checks at sf0.001: every query runs, every oracle
  * key has a query, the flagship smokes. (Value-level correctness is the
  * driver's DuckDB gate, replayed locally via scripts/check_oracle.py.) */
class CatalogSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("catalog has no duplicate names and oracles reference real queries") {
    val names = QueryCatalog.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(QueryCatalog.oracleSql.keySet.subsetOf(QueryCatalog.queries.keySet))
  }

  test("every catalog query executes at sf0.001") {
    // threshold queries may legitimately return zero rows at the tiny SF;
    // execution + schema is what this test pins
    val allowEmpty = Set("e2_minhash_lsh", "e2_ngram_jaccard", "e2_simhash",
      "e3_cosine_pairs", "e2_cc_clusters", "e2_dedup_report",
      "e2_neardup_incremental")
    for (q <- QueryCatalog.all) {
      val df = q.query(spark, dir)
      val n = df.count()
      assert(df.columns.nonEmpty, s"${q.name}: no columns")
      if (!allowEmpty(q.name))
        assert(n > 0, s"${q.name}: empty result at sf0.001")
    }
  }

  test("flagship entry returns rows (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
