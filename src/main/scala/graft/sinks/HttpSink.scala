package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Per-row HTTP delivery sink (SURVEY.md §2.7 K3/K4, §2.8 ST4).
  *
  * Reference behavior: POST each review/restaurant to a backend API,
  * 10 s timeout, per-row try/except, success/failure counters, first
  * 10 error samples (save-reviews/lambda_function.py:60-111,124-173).
  *
  * Engine form: `deliver` maps partitions through a pluggable
  * Transport (one client per partition, NOT per row), returning a
  * Delivery frame — errors are data, not exceptions (dead-letter
  * pattern), so a 1000-executor run degrades per-row, never per-job.
  * At-least-once: Spark task retries can re-POST; the idempotency key
  * (`id`, the sha-256 surrogate) makes replays safe downstream (ST5).
  */
object HttpSink {

  /** Pluggable delivery. Implementations must be Serializable: they
    * ship to executors. Real deployments wrap an HTTP pool; tests use
    * RecordingTransport. */
  trait Transport extends Serializable {
    /** Returns Right(httpStatus) or Left(errorMessage). */
    def post(url: String, body: String): Either[String, Int]
  }

  /** JDK HttpURLConnection transport with the reference's 10 s
    * timeout. One instance per partition; connections pooled by the
    * JVM's keep-alive cache. */
  final class JdkHttpTransport(timeoutMs: Int = 10000) extends Transport {
    def post(url: String, body: String): Either[String, Int] =
      try {
        val conn = new java.net.URL(url).openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("POST")
        conn.setRequestProperty("Content-Type", "application/json; charset=utf-8")
        conn.setConnectTimeout(timeoutMs)
        conn.setReadTimeout(timeoutMs)
        conn.setDoOutput(true)
        val out = conn.getOutputStream
        try out.write(body.getBytes("UTF-8")) finally out.close()
        val code = conn.getResponseCode
        if (code >= 200 && code < 300) Right(code)
        else Left(s"HTTP $code")
      } catch { case e: Exception => Left(e.toString) }
  }

  /** In-memory transport for tests: records bodies, optionally fails
    * ids matching `failWhen`. */
  final class RecordingTransport(failWhen: String => Boolean = _ => false)
      extends Transport {
    def post(url: String, body: String): Either[String, Int] = {
      if (failWhen(body)) Left("injected failure")
      else { RecordingTransport.record(url, body); Right(200) }
    }
  }
  object RecordingTransport {
    import java.util.concurrent.ConcurrentLinkedQueue
    val delivered = new ConcurrentLinkedQueue[(String, String)]()
    def record(url: String, body: String): Unit = delivered.add((url, body))
    def clear(): Unit = delivered.clear()
  }

  final case class Delivery(id: String, status: String, error: String)

  /** Deliver every row (serialized as JSON) to `url`; returns the
    * per-row outcome frame. idCol is the idempotency key. */
  def deliver(df: DataFrame, url: String, idCol: String, transport: Transport): Dataset[Delivery] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("string").as("_id"), to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("_body"))
      .as[(String, String)]
      .mapPartitions { rows =>
        rows.map { case (id, body) =>
          transport.post(url, body) match {
            case Right(_)  => Delivery(id, "success", null)
            case Left(err) => Delivery(id, "failed", err)
          }
        }
      }
  }

  /** A2/A3: grouped outcome counters + first-10 error samples — the
    * reference's success_count/failed_count/errors[:10] as one agg. */
  def metrics(deliveries: Dataset[Delivery]): DataFrame =
    deliveries.toDF()
      .groupBy(col("status"))
      .agg(
        count(lit(1)).as("n"),
        slice(collect_list(col("error")), 1, 10).as("error_sample"))
      .orderBy(col("status"))
}
