package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native fused surface-statistics pass: ONE scan of a text column
  * produces every count the quality-score and language-ID operators
  * need — codepoints, tokens, digits, per-language marker-word hits,
  * and script (Hangul/CJK/Kana/Cyrillic) codepoint counts — as an
  * 11-field INT struct.
  *
  * Why: the regexp formulation ran SIX regex passes plus four
  * tokenize-filter-array passes per document (each one a full string
  * scan with per-pass allocation); profiling showed q83/q84 — the two
  * heaviest text queries — were pure regex CPU. This expression is a
  * single tight loop invoked as one static call from whole-stage
  * codegen (no CodegenFallback, no per-element boxing), and the
  * downstream arithmetic consumes struct fields, so common-
  * subexpression elimination evaluates the scan once per row however
  * many fields a query reads.
  *
  * Semantics are pinned to the SQL the DuckDB oracle runs (and to the
  * regexp formulation this replaces), field by field:
  *  - nc = length(text): CODEPOINT count (UTF8String.numChars
  *    semantics, surrogate pairs count once);
  *  - nt = len(string_split(text, ' ')): single-space separator,
  *    trailing/leading/consecutive separators yield empty fields, so
  *    the count is exactly (number of spaces) + 1;
  *  - dg/hang/cjk/kana/cyr = per-codepoint class counts, identical to
  *    length(t) - length(regexp_replace(t, '[class]', '', 'g'));
  *  - en/de/fr/es = vocabHits: tokens (with multiplicity, exact
  *    equality) that appear in each language's marker list — a marker
  *    in two lists (e.g. "un" fr+es) increments both.
  */
case class TextStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextStats.schema

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"text_stats expects STRING, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {

  val fields: Seq[String] =
    Seq("nc", "nt", "dg", "en", "de", "fr", "es", "hang", "cjk", "kana", "cyr")

  val schema: StructType =
    StructType(fields.map(StructField(_, IntegerType, nullable = false)))

  /** marker word → bitmask of vocabularies containing it
    * (bit 0 en, 1 de, 2 fr, 3 es) — one probe classifies a token for
    * all four languages. */
  private val markerMask: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    val vocabs = Seq(
      graft.analytics.TextAnalysis.EN_MARKERS,
      graft.analytics.TextAnalysis.DE_MARKERS,
      graft.analytics.TextAnalysis.FR_MARKERS,
      graft.analytics.TextAnalysis.ES_MARKERS)
    for ((vs, bit) <- vocabs.zipWithIndex; w <- vs) {
      val prev = m.getOrDefault(w, 0)
      m.put(w, prev | (1 << bit))
    }
    m
  }
  private val maxMarkerLen: Int =
    markerMask.keySet().toArray.map(_.asInstanceOf[String].length).max

  /** Bitmask of vocabularies containing s[from, to), or 0. Tokens that
    * were flagged non-candidate (live=false) never reach here. */
  private def markerMaskAt(s: String, from: Int, to: Int): Int =
    if (to > from && to - from <= maxMarkerLen) {
      val m = markerMask.get(s.substring(from, to))
      if (m != null) m.intValue() else 0
    } else 0

  /** Static entry point called from generated code (and the
    * interpreted eval) — must stay public. */
  def compute(t: UTF8String): InternalRow = {
    val s = t.toString
    val len = s.length
    var nc = 0; var dg = 0
    var en = 0; var de = 0; var fr = 0; var es = 0
    var hang = 0; var cjk = 0; var kana = 0; var cyr = 0
    var nt = 1
    // current token spans [tokStart, i); tokLive=false once it can no
    // longer match any marker (non-[a-z] codepoint or too long)
    var tokStart = 0
    var tokLive = true
    var i = 0
    while (i < len) {
      val cp = s.codePointAt(i)
      nc += 1
      if (cp == ' ') {
        if (tokLive) {
          val m = markerMaskAt(s, tokStart, i)
          en += m & 1; de += (m >> 1) & 1; fr += (m >> 2) & 1; es += (m >> 3) & 1
        }
        nt += 1
        tokStart = i + 1
        tokLive = true
      } else {
        if (cp >= '0' && cp <= '9') dg += 1
        else if (cp >= 0xac00 && cp <= 0xd7a3) hang += 1
        else if (cp >= 0x4e00 && cp <= 0x9fff) cjk += 1
        else if (cp >= 0x3040 && cp <= 0x30ff) kana += 1
        else if (cp >= 0x0400 && cp <= 0x04ff) cyr += 1
        if (tokLive && (cp < 'a' || cp > 'z' || i - tokStart >= maxMarkerLen))
          tokLive = false
      }
      i += Character.charCount(cp)
    }
    if (tokLive) {
      val m = markerMaskAt(s, tokStart, len)
      en += m & 1; de += (m >> 1) & 1; fr += (m >> 2) & 1; es += (m >> 3) & 1
    }
    new GenericInternalRow(Array[Any](nc, nt, dg, en, de, fr, es, hang, cjk, kana, cyr))
  }

  /** Column wrapper: the full stats struct in one scan. */
  def text_stats(text: Column): Column =
    ColumnBridge.column(TextStats(ColumnBridge.expression(text)))
}
