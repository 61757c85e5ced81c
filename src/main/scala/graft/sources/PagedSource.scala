package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** S5: the reference's 4-concurrent-page crawl
  * (restaurant-crawler/restaurant-crawler.py:355-363) as a
  * partition-parallel source: one Spark task per page, fetcher
  * injected (Playwright/HTTP in production, a deterministic fake in
  * tests). Failed pages surface as empty partitions when
  * `tolerateFailures` — the engine twin of hello.py:408-413's
  * failed-page skip; otherwise the task fails and Spark's retry
  * policy applies.
  *
  * This is the DataSourceV2-shaped contract (page = InputPartition)
  * without the V2 ceremony: `spark.range(pages)` already gives one
  * row per page, and flatMap fans each into its fetched rows on the
  * executors — no driver-side fetching, no collect.
  */
object PagedSource {

  def fetch[T: org.apache.spark.sql.Encoder](
      spark: SparkSession,
      pages: Int,
      fetcher: Int => Seq[T],
      tolerateFailures: Boolean = false): Dataset[T] = {
    import spark.implicits._
    spark.range(1, pages + 1)
      .repartition(pages) // one task per page: crawl concurrency = pages
      .as[Long]
      .flatMap { page =>
        if (tolerateFailures)
          try fetcher(page.toInt)
          catch { case _: Exception => Seq.empty[T] }
        else fetcher(page.toInt)
      }
  }
}
