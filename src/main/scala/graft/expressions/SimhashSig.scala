package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document SimHash signature: tokenize, hash every token
  * occurrence, vote 64 bits, emit the packed sh64 — one pass per document,
  * no exploded token rows, no 64-column vote aggregate, no shuffle for the
  * signing stage at all.
  *
  * Why it exists: the staged spelling
  * `explode(tokens(text)) → tokenHash → groupBy(doc).agg(64 vote sums)`
  * ships one row per token into a 64-column partial aggregate (and, on the
  * oracle-portable md5 path, allocates an md5 hex string + a base-16
  * `conv` per token). The kernel folds all of it into a projection.
  *
  * BIT-PARITY CONTRACT with the staged form (SimhashSigSpec pins it):
  *  - tokens: Java-regex `split("\\s+", -1)` with empties dropped —
  *    exactly Spark's `filter(split(c, "\\s+"), _ =!= "")`;
  *  - `useMd5 = false`: XXH64 over the token's UTF-8 bytes, seed 42 —
  *    exactly `xxhash64(t)`;
  *  - `useMd5 = true`: the first 15 lowercase-hex chars of md5, parsed
  *    base-16 (a 60-bit value) — exactly
  *    `conv(substring(md5(t), 1, 15), 16, 10) cast long`
  *    ([[graft.functions.TextFunctions.md5Hash60]]), which is what DuckDB
  *    replays;
  *  - votes count every occurrence (not distinct tokens); bit b of the
  *    output is set when its vote sum is STRICTLY positive; a token-less
  *    document signs as 0L (the staged form's left-join null → 0).
  */
case class SimhashSig(child: Expression, useMd5: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "simhash_sig"

  /** The kernel, shared by interpreted eval and generated code. */
  def sigOf(s: UTF8String): Long = {
    val votes = new Array[Int](64)
    val md = if (useMd5)
      java.security.MessageDigest.getInstance("MD5") else null
    // Java regex split — the staged form's exact tokenizer
    val parts = s.toString.split("\\s+", -1)
    var i = 0
    while (i < parts.length) {
      val t = parts(i)
      if (t.nonEmpty) {
        val h =
          if (!useMd5) {
            val u = UTF8String.fromString(t)
            XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
              u.numBytes, 42L)
          } else {
            md.reset()
            val d = md.digest(t.getBytes("UTF-8"))
            // first 15 hex chars = the top 60 bits of the first 7.5 bytes
            var v = 0L
            var j = 0
            while (j < 15) {
              val b = d(j / 2)
              val nibble = if (j % 2 == 0) (b >> 4) & 0xf else b & 0xf
              v = (v << 4) | nibble
              j += 1
            }
            v
          }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sh = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sh |= (1L << b)
      b += 1
    }
    sh
  }

  override def nullSafeEval(input: Any): Any =
    sigOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shs", this, classOf[SimhashSig].getName)
    defineCodeGen(ctx, ev, c => s"$ref.sigOf($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashSig =
    copy(child = newChild)
}

object SimhashSig {
  def apply(c: Column, useMd5: Boolean): Column =
    Bridge.column(SimhashSig(Bridge.expression(c), useMd5))
}
