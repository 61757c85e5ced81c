package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Count-Min-Sketch heavy hitters — the third sketch family next to
  * HLL (q37) and GK quantiles (q38), built as a custom typed
  * `Aggregator` (the Catalyst surface for user-defined aggregation
  * with managed buffers).
  *
  * Why this shape scales: finding words with count >= T naively needs
  * a groupBy over EVERY word occurrence — the full-corpus shuffle.
  * Instead:
  *
  *   1. one map-side pass folds all occurrences into a fixed-size CMS
  *      (partial sketches merge associatively — counts are additive
  *      matrices, so the result is partition-order independent);
  *   2. the driver broadcasts the sketch; a second map-side pass
  *      probes each partition's locally-distinct words and keeps CMS
  *      candidates — CMS only OVERestimates, so every true heavy
  *      hitter survives (no false negatives, guaranteed);
  *   3. only the candidates (a vanishing fraction) shuffle for exact
  *      counting, and the final threshold filter runs on exact
  *      counts — collisions cost extra work, never wrong answers.
  *
  * The output is therefore EXACT (oracle: GROUP BY ... HAVING count
  * >= T); the sketch is a pure pruning device, which is how CMS is
  * deployed in production pipelines.
  */
object CmsAgg {

  /** Typed Aggregator folding strings into a CountMinSketch.
    * Buffer ships between executors via Java serialization
    * (CountMinSketchImpl is Serializable); fixed seed keeps the
    * sketch deterministic. */
  final class SketchAgg(eps: Double, confidence: Double, seed: Int)
      extends Aggregator[String, CountMinSketch, Array[Byte]] {
    override def zero: CountMinSketch = CountMinSketch.create(eps, confidence, seed)
    override def reduce(b: CountMinSketch, a: String): CountMinSketch = { b.addString(a); b }
    override def merge(b1: CountMinSketch, b2: CountMinSketch): CountMinSketch =
      b1.mergeInPlace(b2)
    override def finish(r: CountMinSketch): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      r.writeTo(out); out.toByteArray
    }
    override def bufferEncoder: Encoder[CountMinSketch] =
      Encoders.javaSerialization(classOf[CountMinSketch])
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Exact heavy hitters (count >= threshold) with a CMS prefilter.
    * `words` is one row per occurrence. */
  def heavyHitters(words: Dataset[String], threshold: Long,
                   eps: Double = 1e-4, confidence: Double = 0.99): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val bytes = words.select(new SketchAgg(eps, confidence, 42).toColumn.name("cms"))
      .as[Array[Byte]].head()
    val bc = spark.sparkContext.broadcast(bytes)
    val candidates = words.mapPartitions { it =>
      val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bc.value))
      val seen = scala.collection.mutable.HashSet.empty[String]
      it.filter(w => seen.add(w) && cms.estimateCount(w) >= threshold)
    }.toDF("w").distinct()
    // only candidate occurrences reach the exact-count shuffle. No
    // forced broadcast: with a low threshold (or eps coarse relative
    // to it) the CMS prunes little and the candidate set can approach
    // corpus size — let AQE pick broadcast vs shuffle from its
    // measured size instead of OOMing the driver on a bad hint.
    words.toDF("w")
      .join(candidates, Seq("w"), "left_semi")
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
  }
}
