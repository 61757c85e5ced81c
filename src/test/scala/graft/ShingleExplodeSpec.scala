package graft

import org.apache.spark.sql.functions._
import graft.analytics.TextAnalysis
import graft.functions.ShingleExplode.shingle_explode
import graft.functions.SpanExplode.span_explode
import graft.sources.Tables

/** Native shingle/span generators: row-identical to the HOF
  * formulations they replaced (explode(array_distinct(shingles(…)))
  * and posexplode(shingles(…)) + 1 respectively). */
class ShingleExplodeSpec extends SparkSpec {
  import spark.implicits._

  private def hofForm(df: org.apache.spark.sql.DataFrame, n: Int) =
    df.select($"doc_id",
      explode(array_distinct(
        TextAnalysis.shingles(TextAnalysis.tokens($"text"), n))).as("s"))

  test("matches the HOF formulation on the corpus (n=3 and n=4)") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    Seq(3, 4).foreach { n =>
      val native = docs.select($"doc_id", shingle_explode($"text", n).as("s"))
      val hof = hofForm(docs, n)
      assert(native.count() == hof.count())
      assert(native.except(hof).count() == 0 && hof.except(native).count() == 0)
    }
  }

  test("edge cases: short doc, null, duplicate shingles, double spaces") {
    val df = Seq(
      (1L, "a b"),                    // < n tokens → no rows
      (2L, null.asInstanceOf[String]), // null → no rows
      (3L, "x y z x y z x y"),        // duplicates collapse
      (4L, "p  q r")                  // consecutive spaces = empty token (split semantics)
    ).toDF("doc_id", "text")
    val native = df.select($"doc_id", shingle_explode($"text", 3).as("s"))
    val hof = hofForm(df.filter($"text".isNotNull), 3)
    assert(native.filter($"doc_id" === 1L).count() == 0)
    assert(native.filter($"doc_id" === 2L).count() == 0)
    assert(native.filter($"doc_id" === 3L).count() == 3) // 3 distinct of 6 windows
    assert(native.except(hof).count() == 0 && hof.except(native).count() == 0)
  }

  private def spanHofForm(df: org.apache.spark.sql.DataFrame, n: Int) =
    df.select($"doc_id",
        posexplode(TextAnalysis.shingles(TextAnalysis.tokens($"text"), n)))
      .select($"doc_id", ($"pos" + 1).as("pos"), $"col".as("s"))

  test("SpanExplode: multiset + position parity with the HOF spelling, corpus and random") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    Seq(3, 8).foreach { n =>
      val native = docs.select($"doc_id", span_explode($"text", n))
      val hof = spanHofForm(docs, n)
      assert(native.count() == hof.count())
      assert(native.except(hof).count() == 0 && hof.except(native).count() == 0)
    }
    // seeded random texts: empty tokens, short docs, repeats, 1-char words
    val rnd = new scala.util.Random(7)
    val words = Array("a", "bb", "", "ccc", "d")
    val fuzz = (1L to 60L).map { i =>
      (i, List.fill(rnd.nextInt(12))(words(rnd.nextInt(words.length))).mkString(" "))
    }.toDF("doc_id", "text")
    Seq(1, 2, 4).foreach { n =>
      val native = fuzz.select($"doc_id", span_explode($"text", n))
      val hof = spanHofForm(fuzz, n)
      assert(native.except(hof).count() == 0 && hof.except(native).count() == 0,
        s"span_explode diverges from HOF at n=$n")
      assert(native.count() == hof.count())
    }
  }
}
