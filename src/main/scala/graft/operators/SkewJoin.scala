package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual key-salting for extreme join skew — the fallback when AQE's
  * skew-join splitting can't apply (e.g. the build side is too large to
  * broadcast and one key dominates a partition).
  *
  * Left rows get a content-derived salt in [0, factor); right rows are
  * replicated once per salt value. The join key becomes (key, salt), so
  * a hot key's rows spread over `factor` reducers. Result is exactly the
  * plain inner equi-join.
  */
object SkewJoin {

  def saltedInnerJoin(left: DataFrame, right: DataFrame,
                      leftKey: String, rightKey: String,
                      factor: Int): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    // deterministic salt from the full row content: same data -> same
    // plan, yet distinct rows of a hot key scatter across reducers
    val salted = left.withColumn("_salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(factor.toLong)))
    val replicated = right.withColumn("_salt",
      explode(expr(s"sequence(0L, ${factor - 1}L)")))
    salted.join(replicated,
        salted("_salt") === replicated("_salt") &&
          salted(leftKey) === replicated(rightKey))
      .drop("_salt")
  }
}
