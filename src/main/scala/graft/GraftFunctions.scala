package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{CosineSimilarity, MinHashAgg, SimHashAgg, ZOrderKey}

/** SQL registration of graft's native Catalyst functions, so SQL-first
  * users (the reference system's audience) can call them directly:
  *
  *   SELECT cosine_sim(a.embedding, b.embedding) ...
  *   SELECT doc_id, simhash_agg(xxhash64(tok)) ... GROUP BY doc_id
  *   SELECT doc_id, minhash_agg(xxhash64(shingle), 128) ... GROUP BY doc_id
  *
  * Two entry points: `GraftFunctions.register(spark)` on a live session,
  * or `spark.sql.extensions=graft.GraftExtensions` at session build.
  */
object GraftFunctions {

  private def minhashBuilder(es: Seq[Expression]): Expression = es match {
    case Seq(e) => MinHashAgg(e)
    case Seq(e, Literal(k: Int, IntegerType)) => MinHashAgg(e, k)
    case _ => throw new IllegalArgumentException(
      "minhash_agg(hash[, k]) expects 1 or 2 args (k a literal int)")
  }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (es => CosineSimilarity(es(0), es(1))),
    "simhash_agg" -> (es => SimHashAgg(es.head)),
    "minhash_agg" -> (minhashBuilder _),
    // SELECT ... ORDER BY zorder_key(x_norm, y_norm) — see ZOrderKey's
    // normalization contract
    "zorder_key" -> (es => ZOrderKey(es)))

  /** Register (or refresh) all functions on an existing session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** Conf-injectable variant: `spark.sql.extensions=graft.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    }
}
