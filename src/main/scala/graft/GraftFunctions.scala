package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{BandHashes, CosineSimilarity, L2Distance, MinHashAgg, MinHashSig, PairExplode, ShingleHashes, SignBits, SimHashAgg, SimHashSig, ZOrderKey}

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

  private def litInt(e: Expression, fn: String): Int = e match {
    case Literal(n: Int, IntegerType) => n
    case _ => throw new IllegalArgumentException(
      s"$fn expects a literal int argument, got $e")
  }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (es => CosineSimilarity(es(0), es(1))),
    "l2_dist" -> (es => L2Distance(es(0), es(1))),
    "simhash_agg" -> (es => SimHashAgg(es.head)),
    "minhash_agg" -> (minhashBuilder _),
    // SELECT ... ORDER BY zorder_key(x_norm, y_norm) — see ZOrderKey's
    // normalization contract
    "zorder_key" -> (es => ZOrderKey(es)),
    // the per-row dedup pipeline: shingle_hashes(text, n) ->
    // minhash_sig(hashes[, k]) -> band_hashes(sig, bands); plus
    // simhash_sig(token_hashes), sign_bits(embedding), and the
    // pair_explode generator for in-bucket candidate pairs
    "shingle_hashes" -> (es =>
      ShingleHashes(es.head, litInt(es(1), "shingle_hashes"))),
    "minhash_sig" -> (es => es match {
      case Seq(e) => MinHashSig(e)
      case Seq(e, k) => MinHashSig(e, litInt(k, "minhash_sig"))
      case _ => throw new IllegalArgumentException(
        "minhash_sig(hashes[, k]) expects 1 or 2 args")
    }),
    "simhash_sig" -> (es => SimHashSig(es.head)),
    "band_hashes" -> (es => BandHashes(es.head, litInt(es(1), "band_hashes"))),
    "sign_bits" -> (es => SignBits(es.head)),
    "pair_explode" -> (es => PairExplode(es.head)))

  /** Register (or refresh) all functions on an existing session —
    * scalar/agg expressions plus the `table_changes` TVF (the SQL-only
    * batch change feed, [[graft.lake.TableChanges]]). */
  def register(spark: SparkSession): Unit = {
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      graft.lake.TableChanges.Name, graft.lake.TableChanges.builder,
      "built-in")
  }

  /** Install the planner strategies behind SQL UPDATE / MERGE (row
    * deltas), `writeStream.toTable` (streaming epoch commits) and
    * dynamic `INSERT OVERWRITE` on a LIVE session — the public
    * no-rebuild seam (`spark.experimental.extraStrategies`, consulted
    * before every built-in strategy). A session built with
    * [[GraftExtensions]] gets the same three via injection; calling
    * this on such a session is a harmless no-op per strategy. */
  def installStrategies(spark: SparkSession): Unit = {
    def add(s: org.apache.spark.sql.execution.SparkStrategy): Unit =
      if (!spark.experimental.extraStrategies.exists(
          _.getClass == s.getClass))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ s
    add(org.apache.spark.sql.graft.GraftRowDeltaStrategy(spark))
    add(org.apache.spark.sql.graft.GraftStreamingTableWriteStrategy(spark))
    add(org.apache.spark.sql.graft.GraftDynamicOverwriteStrategy(spark))
  }
}

/** Conf-injectable variant: `spark.sql.extensions=graft.GraftExtensions`.
  * Besides the SQL functions, injects [[graft.lake.GraftV1ReadRule]]
  * (SQL-catalog reads of lake tables analyze into the same V1
  * manifest-scan plans the programmatic API produces — vectorized
  * parquet + BucketSpec, no DSv2->V1 row shim) and
  * [[org.apache.spark.sql.graft.GraftRowDeltaStrategy]] (SQL UPDATE /
  * MERGE INTO / non-translatable DELETE execute the analyzer's
  * row-level rewrite through the lake's one-commit
  * [[graft.lake.LakeTable.applyRowDelta]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    }
    e.injectTableFunction((
      FunctionIdentifier(graft.lake.TableChanges.Name),
      new ExpressionInfo("graft.lake", graft.lake.TableChanges.Name),
      graft.lake.TableChanges.builder))
    e.injectResolutionRule(s => new graft.lake.GraftV1ReadRule(s))
    e.injectPlannerStrategy(s =>
      org.apache.spark.sql.graft.GraftRowDeltaStrategy(s))
    e.injectPlannerStrategy(s =>
      org.apache.spark.sql.graft.GraftStreamingTableWriteStrategy(s))
    e.injectPlannerStrategy(s =>
      org.apache.spark.sql.graft.GraftDynamicOverwriteStrategy(s))
  }
}
