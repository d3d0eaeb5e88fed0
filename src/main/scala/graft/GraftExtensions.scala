package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions._

/** Registers graft's native expressions as SQL functions, so the engine
  * is usable from pure `spark.sql(...)`:
  *
  *   graft_polyhash(str[, base])        -> bigint
  *   graft_dot(array<float>, array<float>)   -> double
  *   graft_dist2(array<float>, array<float>) -> double
  *   graft_shingle_hashes(array<string>[, n]) -> array<bigint>
  *   graft_topk_by(score, id, k)        -> array<struct<score,id>> (agg)
  *
  * Two entry points: config-based (`spark.sql.extensions=
  * graft.GraftExtensions`) for new sessions, and [[GraftExtensions
  * .register]] for an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
}

object GraftExtensions {
  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Number, _) => v.longValue()
    case other => throw new IllegalArgumentException(
      s"$what must be a literal integer, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_polyhash" -> { args =>
      args match {
        case Seq(s) => PolyHashExpr(s, 31L, HashP)
        case Seq(s, b) => PolyHashExpr(s, longArg(b, "base"), HashP)
        case _ => throw new IllegalArgumentException("graft_polyhash(str[, base])")
      }
    },
    "graft_dot" -> { args => DotProductExpr(args(0), args(1)) },
    "graft_dist2" -> { args => Dist2Expr(args(0), args(1)) },
    "graft_shingle_hashes" -> { args =>
      args match {
        case Seq(t) => ShingleHashExpr(t, 3, 31L, HashP)
        case Seq(t, n) => ShingleHashExpr(t, longArg(n, "n").toInt, 31L, HashP)
        case _ => throw new IllegalArgumentException("graft_shingle_hashes(toks[, n])")
      }
    },
    "graft_topk_by" -> { args =>
      TopKByScore(args(0), args(1), longArg(args(2), "k").toInt)
        .toAggregateExpression()
    },
    // id-distinct variant: duplicate ids collapse inside the heap, so
    // SQL callers get dedupe + top-k in one aggregation pass
    "graft_topk_by_distinct" -> { args =>
      TopKByScore(args(0), args(1), longArg(args(2), "k").toInt,
        distinct = true)
        .toAggregateExpression()
    },
    // index kernels with the library's fixed seed-42 constants, so the
    // full signature path is reachable from pure SQL
    "graft_simhash62" -> { args => SimHashExpr(args(0), HashP) },
    "graft_minhash_sigs" -> { args =>
      val perms = graft.operators.Dedup.perms
      MinHashSigsExpr(args(0),
        perms.map(_._1).toArray, perms.map(_._2).toArray, HashP)
    },
    "graft_hyperplane_sig" -> { args =>
      HyperplaneSigExpr(args(0), graft.operators.Ann.planes)
    },
    // the dense-serving scoring kernel (r10/r11): exact integer
    // sparse·dense inner product over a gathered (buckets, cnts)
    // layout and a dense query vector — SQL users can score a
    // writeGatheredIndex artifact directly
    "graft_sparse_dot_dense" -> { args =>
      SparseDotDenseExpr(args(0), args(1), args(2))
    })

  /** Registers the functions on an already-built session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), new ExpressionInfo("graft", name), builder)
    }
}
