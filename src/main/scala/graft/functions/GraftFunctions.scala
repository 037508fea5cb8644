package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.call_function

/** Registration for graft's native Catalyst expressions.
  *
  * Two entry points:
  *  - `GraftExtensions` for `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (cluster-wide install, the production route);
  *  - `GraftFunctions.register(spark)` for sessions that already exist
  *    (idempotent; used by the inventory queries so Verify/Bench sessions
  *    pick the functions up without special configuration).
  */
object GraftFunctions {

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_vec_dot" -> { args => FloatVectorDot(args(0), args(1)) },
    "graft_vec_dot_fd" -> { args => FloatDoubleDot(args(0), args(1)) },
    "graft_vec_sqnorm" -> { args => FloatVectorSqNorm(args(0)) },
    "graft_nearest_cells" -> { args => NearestCells(args(0), args(1), args(2)) },
    "graft_simhash64" -> { args => SimHash64(args(0)) },
    "graft_poly_hash" -> { args => PolyHash64(args(0)) },
    "graft_topk_sketch" -> { args =>
      SpaceSavingTopK(args(0),
        capacity = args(1).eval().asInstanceOf[Number].intValue(),
        k = args(2).eval().asInstanceOf[Number].intValue())
    },
    "graft_minhash_sigs" -> { args =>
      MinHashSigs(args(0),
        numHashes = args(1).eval().asInstanceOf[Number].intValue())
    },
    "graft_minhash_sigs_row" -> { args =>
      MinHashSigsRow(args(0),
        numHashes = args(1).eval().asInstanceOf[Number].intValue())
    },
    "graft_bounded_collect" -> { args =>
      BoundedCollectLongs(args(0),
        cap = args(1).eval().asInstanceOf[Number].intValue())
    },
    "graft_char_ngrams" -> { args =>
      CharNGrams(args(0), n = args(1).eval().asInstanceOf[Number].intValue())
    },
    "graft_bloom_build" -> { args =>
      BloomBuildLongs(args(0),
        numBits = args(1).eval().asInstanceOf[Number].intValue())
    },
    "graft_bloom_contains" -> { args => BloomMightContain(args(0), args(1)) },
    "graft_cms_build" -> { args =>
      CountMinBuildLongs(args(0),
        depth = args(1).eval().asInstanceOf[Number].intValue(),
        width = args(2).eval().asInstanceOf[Number].intValue())
    },
    "graft_cms_estimate" -> { args => CountMinEstimate(args(0), args(1)) },
    "graft_sortable_bits" -> { args => SortableDoubleBits(args(0)) },
    "graft_norm_text" -> { args => NormText(args(0)) }
  )

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    fns.foreach { case (name, builder) =>
      // Registration is per-session and queries call register() defensively;
      // skipping an already-present name keeps repeat calls silent (the
      // replace path logs a WARN per function per call).
      if (!registry.functionExists(FunctionIdentifier(name)))
        registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
    // idempotent: injected rules are deduplicated by reference equality of
    // the batch, and experimental extraOptimizations replaces wholesale
    spark.experimental.extraOptimizations =
      Seq(VecDotSelfToSqNorm)
    graft.plans.GraftOps.install(spark)
  }

  /** Dot product of two float-vector columns (see FloatVectorDot). Built
    * with `call_function` — no parser round-trip, so any child expression
    * composes. The session must have called `register` (inventory queries
    * do). */
  def vecDot(a: Column, b: Column): Column =
    call_function("graft_vec_dot", a, b)
}

/** Optimizer rule: `graft_vec_dot(x, x)` → `graft_vec_sqnorm(x)` when both
  * sides are the same deterministic expression — halves the array reads
  * and evaluates the child once. A small but genuine Catalyst rewrite:
  * it fires on the similarity queries, which all build norms as dot(x,x).
  */
object VecDotSelfToSqNorm extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case FloatVectorDot(a, b) if a.deterministic && a.semanticEquals(b) =>
        FloatVectorSqNorm(a)
    }
}

/** SparkSessionExtensions installer: injects graft's native functions and
  * optimizer rule at session build time. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_vec_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "graft_vec_dot"),
      (args: Seq[Expression]) => FloatVectorDot(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_vec_dot_fd"),
      new ExpressionInfo(classOf[FloatDoubleDot].getName, "graft_vec_dot_fd"),
      (args: Seq[Expression]) => FloatDoubleDot(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_vec_sqnorm"),
      new ExpressionInfo(classOf[FloatVectorSqNorm].getName, "graft_vec_sqnorm"),
      (args: Seq[Expression]) => FloatVectorSqNorm(args(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (args: Seq[Expression]) => SimHash64(args(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_poly_hash"),
      new ExpressionInfo(classOf[PolyHash64].getName, "graft_poly_hash"),
      (args: Seq[Expression]) => PolyHash64(args(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_topk_sketch"),
      new ExpressionInfo(classOf[SpaceSavingTopK].getName, "graft_topk_sketch"),
      (args: Seq[Expression]) => SpaceSavingTopK(args(0),
        args(1).eval().asInstanceOf[Number].intValue(),
        args(2).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "graft_minhash_sigs"),
      (args: Seq[Expression]) => MinHashSigs(args(0),
        args(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("graft_bounded_collect"),
      new ExpressionInfo(classOf[BoundedCollectLongs].getName, "graft_bounded_collect"),
      (args: Seq[Expression]) => BoundedCollectLongs(args(0),
        args(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("graft_char_ngrams"),
      new ExpressionInfo(classOf[CharNGrams].getName, "graft_char_ngrams"),
      (args: Seq[Expression]) => CharNGrams(args(0),
        args(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("graft_norm_text"),
      new ExpressionInfo(classOf[NormText].getName, "graft_norm_text"),
      (args: Seq[Expression]) => NormText(args(0))))
    ext.injectOptimizerRule(_ => VecDotSelfToSqNorm)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
  }
}
