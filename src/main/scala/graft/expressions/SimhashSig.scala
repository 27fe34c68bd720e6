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

  /** The kernel, shared by interpreted eval and generated code.
    *
    * Tokenization walks the UTF-8 BYTES directly: Java's `\s` (as Spark's
    * `split(c, "\\s+")` compiles it, no UNICODE_CHARACTER_CLASS) matches
    * ONLY the six ASCII whitespace bytes, and UTF-8 continuation bytes are
    * ≥ 0x80, so "maximal run of non-ASCII-whitespace bytes" produces
    * exactly the staged form's token byte-spans — with zero per-token
    * allocation (the first cut of this kernel round-tripped through
    * String + regex split + per-token re-encode and measured 4× SLOWER
    * than the staged pipeline on a 50k-doc natural corpus; the byte walk
    * is what makes fusing pay).
    */
  def sigOf(s: UTF8String): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    val votes = new Array[Int](64)
    val md = if (useMd5)
      java.security.MessageDigest.getInstance("MD5") else null
    var i = 0
    while (i < n) {
      // skip ASCII whitespace (space \t \n \x0B \f \r — Java regex \s)
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) {
        val len = i - start
        val h =
          if (!useMd5)
            XXH64.hashUnsafeBytes(bytes,
              org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start,
              len, 42L)
          else {
            md.reset()
            md.update(bytes, start, len)
            val d = md.digest()
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
    }
    var sh = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sh |= (1L << b)
      b += 1
    }
    sh
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

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
