package graft

import org.apache.spark.sql.functions._
import graft.analytics.TextAnalysis
import graft.functions.TextStats

/** The fused single-pass TextStats expression must agree field-by-
  * field with the regexp/HOF formulation it replaced (which is what
  * the DuckDB oracle still runs). */
class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-fusion spelling, kept here as the executable contract. */
  private def referenceStats(text: org.apache.spark.sql.Column) = {
    def charClassCount(p: String) =
      length(text) - length(regexp_replace(text, p, ""))
    val ws = split(text, " ")
    def hits(vocab: Seq[String]) =
      size(filter(ws, w => array_contains(typedLit(vocab), w)))
    struct(
      length(text).as("nc"),
      size(ws).as("nt"),
      charClassCount("[0-9]").as("dg"),
      hits(TextAnalysis.EN_MARKERS).as("en"),
      hits(TextAnalysis.DE_MARKERS).as("de"),
      hits(TextAnalysis.FR_MARKERS).as("fr"),
      hits(TextAnalysis.ES_MARKERS).as("es"),
      charClassCount("[\\x{ac00}-\\x{d7a3}]").as("hang"),
      charClassCount("[\\x{4e00}-\\x{9fff}]").as("cjk"),
      charClassCount("[\\x{3040}-\\x{30ff}]").as("kana"),
      charClassCount("[\\x{0400}-\\x{04ff}]").as("cyr"))
  }

  test("equals the regexp formulation on adversarial and random text") {
    val fixed = Seq(
      "",                       // nc=0, split -> [""] so nt=1
      " ",                      // two empty tokens
      "   ",                    // runs of separators
      "the",                    // marker as the only token
      "the the the",            // multiplicity counts
      "un le la y es",          // markers shared across vocabs
      "theodore lathe apple",   // markers as substrings must NOT hit
      "the  la",                // empty token between two markers
      "a 1 und est 42 los",     // digits mixed with markers
      "안녕하세요 세계",          // Hangul
      "你好 世界 und the",       // CJK + latin markers
      "こんにちは カタカナ",       // Hiragana + Katakana
      "привет мир",             // Cyrillic
      "mixed 漢字 and ひらがな 123",
      "trailing space ",
      " leading space",
      "x" * 300,                // long single token (no marker scan)
      ("the " * 150).trim)      // many marker tokens
    val rnd = new scala.util.Random(7)
    val alphabet =
      "abcdefghijklmnopqrstuvwxyz0123456789    .,!?" +
        "the und est los 你好안녕ひらカタприв" + new String(Character.toChars(0x1f600))
    val random = (1 to 60).map { _ =>
      val n = rnd.nextInt(120)
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val df = (fixed ++ random).toDF("text")
    val both = df.select(
      TextStats.text_stats(col("text")).as("got"),
      referenceStats(col("text")).as("want"),
      col("text"))
    val bad = both.filter(col("got") =!= col("want")).collect()
    assert(bad.isEmpty, bad.take(3).mkString("\n"))
  }

  test("null text yields a null struct (matches length(null) semantics)") {
    val df = Seq[String](null, "ok").toDF("text")
    val rows = df.select(TextStats.text_stats(col("text"))).collect()
    assert(rows.exists(_.isNullAt(0)) && rows.exists(!_.isNullAt(0)))
  }

  test("surrogate pairs count one codepoint, same as length()") {
    val emoji = new String(Character.toChars(0x1f600))
    val df = Seq(s"a $emoji b").toDF("text")
    val r = df.select(TextStats.text_stats(col("text")).getField("nc"),
      length(col("text"))).head()
    assert(r.getInt(0) == r.getInt(1) && r.getInt(0) == 5)
  }
}
