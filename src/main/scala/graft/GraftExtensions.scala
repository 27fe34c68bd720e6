package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{DotProduct, L2Micros, LevWithin, MinHashSig,
  ShingleMinHash, ShingleSet, ShingleShaMin, SimhashSig, SortedIntersectSize}

/** SparkSessionExtensions hook: registers the engine's native expressions in
  * the SQL function registry, so `spark.sql("... vec_dot(a, b) ...")` works
  * the same as the Column API, and installs the optimizer rule that rewrites
  * the HOF dot-product spelling to the fused kernel
  * ([[graft.plans.RewriteHofDotProduct]]). Install with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (cluster-wide,
  * no code change for SQL users) — `GraftSession.tune` does this by default.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.RewriteHofDotProduct)
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_dot(a, b) takes exactly two arguments")
        DotProduct(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("vec_l2_micros"),
      new ExpressionInfo(classOf[L2Micros].getName, "vec_l2_micros"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "vec_l2_micros(a, b) takes exactly two arguments")
        L2Micros(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("lev_within"),
      new ExpressionInfo(classOf[LevWithin].getName, "lev_within"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "lev_within(a, b, t) takes exactly three arguments")
        LevWithin(args.head, args(1), intLit(args(2), "lev_within", "t"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("shingle_set"),
      new ExpressionInfo(classOf[ShingleSet].getName, "shingle_set"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "shingle_set(text, n) takes exactly two arguments")
        ShingleSet(args.head, intLit(args(1), "shingle_set", "n"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "minhash_sig(shingles, k) takes exactly two arguments")
        MinHashSig(args.head, intLit(args(1), "minhash_sig", "k"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("shingle_minhash"),
      new ExpressionInfo(classOf[ShingleMinHash].getName, "shingle_minhash"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "shingle_minhash(text, n, k) takes exactly three arguments")
        ShingleMinHash(args.head, intLit(args(1), "shingle_minhash", "n"),
          intLit(args(2), "shingle_minhash", "k"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("shingle_sha_min"),
      new ExpressionInfo(classOf[ShingleShaMin].getName, "shingle_sha_min"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "shingle_sha_min(text, n) takes exactly two arguments")
        ShingleShaMin(args.head, intLit(args(1), "shingle_sha_min", "n"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash_sig"),
      new ExpressionInfo(classOf[SimhashSig].getName, "simhash_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "simhash_sig(text, use_md5) takes exactly two arguments")
        // fold, don't pattern-match on Literal: at injectFunction time the
        // argument arrives UNFOLDED, so `NOT false`, a cast, or any other
        // foldable boolean spelling is legitimate SQL (review finding: the
        // bare-Literal match rejected those with a raw builder exception)
        val e = args(1)
        require(e.foldable &&
            e.dataType == org.apache.spark.sql.types.BooleanType,
          s"simhash_sig: use_md5 must be a foldable BOOLEAN expression, " +
            s"got ${e.sql}")
        val useMd5 = e.eval() match {
          case b: java.lang.Boolean => b.booleanValue
          case null => throw new IllegalArgumentException(
            "simhash_sig: use_md5 must not be NULL — it selects the hash " +
              "family (a structural parameter of the generated kernel), " +
              "pass TRUE or FALSE")
        }
        SimhashSig(args.head, useMd5)
      }))
    ext.injectFunction((
      new FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName,
        "sorted_intersect_size"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "sorted_intersect_size(a, b) takes exactly two arguments")
        SortedIntersectSize(args.head, args(1))
      }))
  }

  /** Fold a SQL argument that parameterizes a kernel (band width, signature
    * length, edit threshold) down to the Int the expression constructor
    * takes. These are STRUCTURAL parameters — they shape the generated
    * code — so only foldable integer literals are accepted; a column
    * reference fails loudly at analysis time. */
  private def intLit(e: Expression, fn: String, arg: String): Int = {
    require(e.foldable, s"$fn: $arg must be a literal integer")
    e.eval() match {
      case i: java.lang.Integer => i.intValue
      case l: java.lang.Long    => math.toIntExact(l.longValue)
      case s: java.lang.Short   => s.intValue
      case b: java.lang.Byte    => b.intValue
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal, got $other")
    }
  }
}
