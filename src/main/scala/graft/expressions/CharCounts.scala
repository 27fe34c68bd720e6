package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-code-point occurrence counts of a string in one compiled pass —
  * `array<struct<c:string, cnt:bigint>>`, one entry per distinct code point
  * in first-occurrence order. The native form of
  * `explode(regexp_extract_all(text, '[\s\S]', 0))` followed by a
  * `groupBy(doc_id, c).count()`: the regex spelling pays a java.util.regex
  * match per CHARACTER and the explode turns every character into a row
  * that the (doc, char) hash aggregate must re-group — at the 100× fixture
  * that was two scans × (per-char regex + explode + hash-agg) of ~1e9
  * characters for an alphabet-bounded result. Here the counts come off a
  * single UTF-8 walk (code-point slicing exactly like [[ShingleSet]], so
  * multi-byte text matches Java regex's code-point iteration), one small
  * hash map per row, alphabet-sized output.
  *
  * Equivalence to the regex+groupBy spelling: `[\s\S]` matches every code
  * point exactly once (Java regex char classes are code-point aware, and
  * the class is the universal set), so the extracted array is the string's
  * code-point sequence and the group counts are per-code-point occurrence
  * counts — the row set `explode(this)` yields. Empty string → empty
  * array (explode then drops the row, matching the regex path).
  */
case class CharCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_counts expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("c", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "char_counts"

  /** The kernel, shared by interpreted eval and generated code. ASCII
    * strings (the overwhelming case for a text corpus) count through a
    * flat 128-slot array — no per-character hashing or boxing; the first
    * multi-byte character falls back to the general code-point map,
    * restarted from offset 0 so first-occurrence order is computed over
    * the whole string. Both paths emit first-occurrence order —
    * deterministic output (order is irrelevant to every consumer, which
    * re-aggregates, but a deterministic expression must not depend on
    * hash iteration order). */
  def countsOf(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val total = bytes.length
    val cnt = new Array[Long](128)
    val order = new Array[Byte](128)
    var nSeen = 0
    var i = 0
    var ascii = true
    while (ascii && i < total) {
      val b = bytes(i)
      if (b < 0) ascii = false
      else {
        if (cnt(b) == 0L) { order(nSeen) = b; nSeen += 1 }
        cnt(b) += 1L
        i += 1
      }
    }
    if (ascii) {
      val out = new Array[Any](nSeen)
      var j = 0
      while (j < nSeen) {
        val b = order(j)
        out(j) = new GenericInternalRow(Array[Any](
          UTF8String.fromBytes(Array(b), 0, 1), cnt(b))): InternalRow
        j += 1
      }
      return new GenericArrayData(out)
    }
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    i = 0
    while (i < total) {
      val len = UTF8String.numBytesForFirstByte(bytes(i))
      val cp = UTF8String.fromBytes(bytes, i, len)
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1L)) else slot(0) += 1L
      i += len
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new GenericInternalRow(
        Array[Any](e.getKey, e.getValue()(0))): InternalRow
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    countsOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charcounts", this, classOf[CharCounts].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.countsOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharCounts =
    copy(child = newChild)
}

object CharCounts {
  def apply(c: Column): Column =
    Bridge.column(CharCounts(Bridge.expression(c)))
}
