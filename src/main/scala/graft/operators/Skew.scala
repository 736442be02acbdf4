package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins.
  *
  * AQE's skew-join split (on by default in GraftSession) handles most runtime
  * skew; explicit salting is the static fallback when one join key dominates
  * so heavily that even split partitions overwhelm an executor (the classic
  * hot-user / hot-document case at 100 TB).
  *
  * `saltedJoin` is result-identical to `big.join(small, key)`: the big side
  * scatters each row into one of `salt` sub-keys; the small side replicates
  * to all of them; joining on (key, salt) spreads a hot key over `salt`
  * reducers at the cost of replicating the small side `salt` times.
  */
object Skew {

  /** Join types for which small-side replication cannot change the result:
    * unmatched small-side rows are either dropped (inner/semi) or only the
    * big side's rows survive (left/anti). Right/full outer would emit each
    * unmatched small row `salt` times, so they are rejected. */
  private val safeJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "semi", "left_anti", "leftanti", "anti")

  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    require(safeJoinTypes.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin supports inner/left/semi/anti joins only, got `$joinType` " +
        "(right/full outer would duplicate unmatched small-side rows)")
    // Per-row scatter: any salt assignment is correct (the small side covers
    // all of them); a row-position hash spreads even fully-identical hot rows.
    val scatter: Column = pmod(xxhash64(monotonically_increasing_id()), lit(salt))
    val bigS = big.withColumn("__graft_salt", scatter)
    val smallS = small.withColumn("__graft_salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    bigS.join(smallS, Seq(key, "__graft_salt"), joinType).drop("__graft_salt")
  }
}
