package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed
  * (SURVEY §5) — at 100 TB a single hot key (the empty document, a
  * default user id, a stop-shingle) can pin one reducer for hours while
  * 999 executors idle.
  *
  * First line of defense is AQE's skew-join split (on in all our
  * sessions); [[saltedJoin]] is the explicit fallback for when the skew
  * is known ahead of time or the join is not an AQE-splittable
  * sort-merge join: the big side spreads each key over `salt` synthetic
  * sub-keys, the small side is replicated `salt` times, and the join key
  * becomes (key, salt) — so a key with 10⁹ rows lands on `salt` reducers
  * instead of one. Cost: small side × salt, which is why the small side
  * must actually be small. */
object SkewUtils {

  val SaltCol = "__graft_salt"

  /** Join types for which replicating the small side `salt` times is
    * row-for-row equivalent to the unsalted join: types that never emit
    * an unmatched SMALL-side row. Right/full outer would emit each
    * unmatched small row `salt` times — rejected. */
  private val SupportedJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "semi", "left_anti", "leftanti", "anti", "cross")

  /** Equi-join `big ⋈ small` on `key`, with the big side's hot keys
    * spread across `salt` reducers. Result equals `big.join(small,
    * Seq(key), joinType)` row-for-row (spec-verified for inner).
    * Only join types that preserve no unmatched small-side rows are
    * allowed — right/full outer would duplicate each unmatched small
    * row `salt` times. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    require(SupportedJoinTypes(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin does not support joinType '$joinType': the salt-replicated " +
        "small side would emit each unmatched small row `salt` times for " +
        "right/full outer joins. Supported: " + SupportedJoinTypes.toSeq.sorted.mkString(", "))
    val saltedBig = big.withColumn(SaltCol, (rand(seed = 42) * salt).cast("int"))
    val replicatedSmall = small.withColumn(SaltCol,
      explode(sequence(lit(0), lit(salt - 1))))
    saltedBig.join(replicatedSmall, Seq(key, SaltCol), joinType).drop(SaltCol)
  }

  /** Top-frequency keys of `df(key)` — the skew diagnosis step: run on a
    * sample, feed the hot-key list to targeted salting or filtering. */
  def hotKeys(df: DataFrame, key: String, minCount: Long): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc)
}
