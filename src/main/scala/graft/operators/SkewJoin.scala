package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed equi-joins.
  *
  * When one join key carries a disproportionate share of rows (power-law
  * user ids, null-ish sentinel keys), the task holding that key becomes the
  * straggler. AQE's skew-join splits oversized partitions after the fact;
  * salting removes the hotspot BEFORE the shuffle: the skewed (large) side
  * spreads each key over `saltFactor` sub-keys, and the other side
  * replicates each row `saltFactor` times so every sub-key still finds its
  * match. Result is identical to the plain join (oracle-checked by
  * q27_salted_join); cost is `saltFactor`× replication of the SMALL side —
  * the trade that wins whenever small-side replication is cheaper than one
  * straggler task processing the hot key alone.
  */
object SkewJoin {

  /** Inner equi-join of `large` (skewed) with `small` on `key`, salted.
    * Salt on the large side is deterministic (hash of all columns mod
    * factor) — no rand(): retries and speculative tasks stay consistent. */
  def saltedInnerJoin(large: DataFrame, small: DataFrame, key: String,
                      saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val l = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col).toSeq: _*), lit(saltFactor)).cast("int"))
    val s = small.withColumn("__salt",
      explode(lit((0 until saltFactor).toArray)))
    l.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
