package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed
  * (the classic 100 TB failure mode: one executor gets the hot key's
  * entire partition). AQE's skew-join split handles sort-merge joins
  * automatically; salting is the explicit tool when the small side can
  * be replicated — e.g. joining events against a per-hot-user dim.
  */
object Skew {

  /** Salted equi-join: the big side gets a uniform salt in [0, factor),
    * the small side is exploded `factor` ways, and the join key becomes
    * (key, salt) — the hot key's rows spread over `factor` tasks.
    * Seeded rand keeps runs reproducible; results are identical to the
    * unsalted join regardless of salt values (tested). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 factor: Int, seed: Long = 42L): DataFrame = {
    val b = big.withColumn("_salt", (rand(seed) * factor).cast("int"))
    val s = small.withColumn("_salt",
      explode(array((0 until factor).map(lit): _*)))
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }
}
