package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** The two TPC-H join shapes the driver fixture could never express —
  * Q2 (min-cost supplier, correlated scalar-min over a shared view) and
  * Q20 (nested IN with a correlated scalar-sum against the fact table) —
  * in their FULL partsupp-based forms.
  *
  * The driver testdata has no partsupp analog, so these are spec-only
  * twins, not catalog rows: no `QueryDef`, no DuckDB driver oracle. Their
  * correctness gate is `PartsuppOpsSpec`, which synthesizes a deterministic
  * partsupp fixture and replays both queries naively (collect-side
  * reference computation on the small spec fixture). Their cost curves run
  * on the scale fixtures, which now grow a partsupp table
  * (`scripts/make_scale.py`). The DECORRELATION patterns themselves have
  * been catalog-covered since round 9 by `j10_min_cost_region` /
  * `j11_excess_share`, which emulate these shapes from lineitem — this
  * module closes the "full form" asterisk as an engine capability.
  *
  * 100-TB shape notes:
  *  - Q2: partsupp is the only data-sized input; every dimension
  *    (region→nation→supplier path, filtered part) broadcasts. The
  *    correlated `= (select min(..))` is decorrelated as ONE scan of
  *    partsupp + a per-part window min — no self-join, no second scan,
  *    ties kept exactly as the SQL form keeps them.
  *  - Q20: the correlated scalar-sum becomes one pre-aggregation of the
  *    filtered fact at (partkey, suppkey) grain, then an equi-join with
  *    partsupp on that composite key — both sides shuffle once on the same
  *    key. An empty correlated sum is NULL in SQL (`>` then fails), so the
  *    inner join drops exactly the pairs the nested form drops.
  */
object PartsuppOps {

  /** TPC-H Q2 (full form, fixture-adapted): for parts of `size` whose type
    * matches `typeLike`, the supplier(s) in `region` offering the MINIMUM
    * ps_supplycost, ties kept. Output mirrors Q2's projection restricted to
    * the fixture's columns, cost carried as exact micros.
    *
    * Shape: partsupp ⋈ broadcast(filtered part) ⋈ broadcast(region-pruned
    * supplier path), then a per-part window min + equality keep — the
    * correlated subquery's shared view is scanned ONCE. */
  def q2MinCostSupplier(s: SparkSession, dir: String,
      region: String = "EUROPE", size: Int = 15,
      typeLike: String = "%O%"): DataFrame = {
    val costMicros = round(col("ps_supplycost") * 1000000, 0).cast(LongType)
    val regSup = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)
        .filter(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
        col("n_name"))
    val wantedParts = Tables.part(s, dir)
      .filter(col("p_size") === size && col("p_type").like(typeLike))
      .select(col("p_partkey"), col("p_type"))
    val offers = Tables.partsupp(s, dir)
      .join(broadcast(wantedParts), col("ps_partkey") === col("p_partkey"))
      .join(broadcast(regSup), col("ps_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_type"), col("s_suppkey"),
        col("s_name"), col("s_acctbal"), col("n_name"),
        costMicros.as("cost_micros"))
    val w = Window.partitionBy("p_partkey")
    offers
      .withColumn("min_micros", min("cost_micros").over(w))
      .filter(col("cost_micros") === col("min_micros"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_type"), col("cost_micros"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
  }

  /** TPC-H Q20 (full form, fixture-adapted): suppliers in `nation` holding
    * EXCESS stock of an interesting part — `ps_availqty` strictly greater
    * than half the quantity that (part, supplier) pair shipped in `year`.
    * Parts are "interesting" when `p_name` matches `nameLike`.
    *
    * Shape: the correlated `0.5 * (select sum(l_quantity) ...)` is the
    * year-filtered fact pre-aggregated at (l_partkey, l_suppkey) grain;
    * partsupp (pre-filtered by the broadcast part-key set) equi-joins it on
    * the composite key — the only fact-sized exchanges are those two
    * hash-partitions on the SAME key. The SQL form's empty-sum-is-NULL
    * semantics (pair never shipped → comparison UNKNOWN → dropped) is an
    * inner join. The outer `s_suppkey IN (...)` is a semi-join DISTINCT
    * into the broadcast nation-filtered supplier dim. Quantities compare in
    * integer half-units (qty*1 vs avail*2... inverted: avail*2 > qty_sum*1
    * with whole-unit fixture quantities) so no float boundary ambiguity. */
  def q20ExcessStock(s: SparkSession, dir: String,
      nation: String = "NATION_3", nameLike: String = "%bolt%",
      year: Int = 1995): DataFrame = {
    val qtyUnits = round(col("l_quantity"), 0).cast(LongType)
    val interesting = Tables.part(s, dir)
      .filter(col("p_name").like(nameLike)).select(col("p_partkey"))
    val shipped = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit(s"$year-01-01").cast("timestamp") &&
        col("l_shipdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
      .join(broadcast(interesting), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(qtyUnits).as("qty_units"))
    val excess = Tables.partsupp(s, dir)
      .join(broadcast(interesting), col("ps_partkey") === col("p_partkey"))
      .join(shipped, col("ps_partkey") === col("l_partkey") &&
        col("ps_suppkey") === col("l_suppkey"))
      .filter(col("ps_availqty").cast(LongType) * 2 > col("qty_units"))
      .select(col("ps_suppkey")).distinct()
    Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
        .filter(col("n_name") === nation)),
        col("s_nationkey") === col("n_nationkey"))
      .join(excess, col("s_suppkey") === col("ps_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy("s_name")
  }
}
