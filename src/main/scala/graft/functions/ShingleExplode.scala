package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native generator producing the DISTINCT word n-gram shingles of a
  * text column, one output row per shingle — a single tight pass
  * (tokenize → slide → per-document dedupe → emit) replacing the
  * interpreted slice/zip_with chain + array_distinct + explode
  * pipeline (HOFs are CodegenFallback and re-enter the lambda
  * interpreter per element; this loop allocates one builder and one
  * seen-set per row).
  *
  * Semantics are identical to
  * `explode(array_distinct(shingles(split(text, " "), n)))`:
  * single-space tokenization (consecutive separators yield empty
  * tokens, exactly like split), shingles joined with one space,
  * first-occurrence emission order, no output rows for docs with
  * fewer than n tokens, null text yields no rows.
  */
case class ShingleExplode(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, "shingle width must be >= 1")

  override def elementSchema: StructType =
    StructType(StructField("s", StringType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input).asInstanceOf[UTF8String]
    if (t == null) return Iterator.empty
    val it = ShingleExplode.distinctShingles(t.toString, n).iterator()
    new Iterator[InternalRow] {
      override def hasNext: Boolean = it.hasNext
      override def next(): InternalRow =
        InternalRow(UTF8String.fromString(it.next()))
    }
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingle_explode expects STRING, got ${child.dataType.simpleString}")

  override protected def withNewChildInternal(newChild: Expression): ShingleExplode =
    copy(child = newChild)
}

object ShingleExplode {
  def shingle_explode(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleExplode(ColumnBridge.expression(text), n))

  /** The generator's tokenize → slide → dedupe loop as plain Scala —
    * THE single spelling of "distinct word n-grams of a document",
    * shared by [[ShingleExplode.eval]] and the executor-side streaming
    * twins (CurationStream's decontamination probe, DedupStream's
    * band rows) so batch/stream gram parity is structural, not
    * copy-paste. First-occurrence order; < n tokens or null text
    * yield the empty set. */
  def distinctShingles(text: String, n: Int): java.util.LinkedHashSet[String] = {
    if (text == null) return new java.util.LinkedHashSet[String](0)
    val words = text.split(" ", -1)
    if (words.length < n) return new java.util.LinkedHashSet[String](0)
    val seen = new java.util.LinkedHashSet[String]((words.length - n + 1) * 2)
    var i = 0
    val sb = new java.lang.StringBuilder(64)
    while (i <= words.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    seen
  }
}
