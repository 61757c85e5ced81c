package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-based dedup — the reference's set-membership anti-joins
  * (SURVEY.md §2.3 J1/J2, §2.4 U3) as real Spark joins.
  *
  * Reference behavior:
  *  - J1: `item["place_id"] not in existing_place_ids`
  *    (restaurant-crawler/restaurant-crawler.py:347-375) — a broadcast
  *    anti-join where the build side is the known-key set.
  *  - J2: per-row `SELECT ... WHERE name=? AND address=? LIMIT 1`
  *    existence probes (review-crawler/restaurant_save.py:77-91) —
  *    O(N) point lookups that become ONE anti-join here.
  *
  * Scale note: `broadcast()` is forced on the key side for J1 because
  * the reference's key set is small by construction (ids seen so far
  * for one partition key). `antiJoinComposite` deliberately does NOT
  * force broadcast — the existing side there is a full table and
  * Catalyst/AQE should pick shuffle vs broadcast from stats.
  */
object Dedup {

  /** J1: keep rows of `fresh` whose key is absent from `existingKeys`. */
  def antiJoinKeys(fresh: DataFrame, existingKeys: DataFrame, key: String): DataFrame =
    fresh.join(
      broadcast(existingKeys.select(key).distinct()), Seq(key), "left_anti")

  /** J2: anti-join on a composite key; broadcast left to Catalyst. */
  def antiJoinComposite(fresh: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame =
    fresh.join(existing.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** U3 / ST3: first-row-wins dedup by key columns. */
  def byKey(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** J1 at the scale where the key set no longer broadcasts: a Bloom
    * filter of the existing keys (a few bytes per key at 3% fpp —
    * 100M keys ≈ 90 MB vs gigabytes for the exact set) broadcasts
    * instead, and splits `fresh` map-side:
    *
    *  - "definitely not present" rows (no false negatives, by Bloom
    *    contract) are emitted immediately — they never shuffle;
    *  - "might be present" rows — the true matches plus fpp% false
    *    positives — go through the exact anti-join.
    *
    * Result is row-identical to the plain anti-join (the exact join
    * resolves every false positive); the shuffle shrinks from |fresh|
    * to ~|matches| + fpp·|fresh|. This is the runtime-filter idea
    * (Spark's own bloom-filter join pruning) applied where we hold
    * the build side ourselves. */
  def bloomAntiJoinKeys(fresh: DataFrame, existingKeys: DataFrame, key: String,
                        expectedKeys: Long, fpp: Double = 0.03): DataFrame = {
    val spark = fresh.sparkSession
    val bloom = existingKeys.select(col(key).cast("string").as("k"))
      .na.drop().stat.bloomFilter("k", expectedKeys, fpp)
    val bc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((k: String) => k != null && bc.value.mightContainString(k))
    val definitelyNew = fresh.filter(!mightContain(col(key).cast("string")))
    val candidates = fresh.filter(mightContain(col(key).cast("string")))
    definitelyNew.unionByName(
      candidates.join(existingKeys.select(key).distinct(), Seq(key), "left_anti"))
  }
}
