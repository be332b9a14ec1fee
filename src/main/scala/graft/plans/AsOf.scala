package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.graft.PlanApi

/** DataFrame-level entry point for the native [[AsOfJoin]] operator.
  *
  * `AsOf.join(left, right, keys, leftTime, rightTime, tieBreak)`
  * returns left's columns plus right's columns (nulled when no right
  * row with the same key has `rightTime <= leftTime`). Key columns must
  * exist under the same names on both sides; rename right-side value
  * columns beforehand if they collide with left's.
  *
  * `direction` selects which side of the left time to search:
  *  - `"backward"` (default): the right row with the GREATEST
  *    `rightTime <= leftTime` — DuckDB `ASOF ... ON l.t >= r.t`.
  *  - `"forward"`: the right row with the SMALLEST
  *    `rightTime >= leftTime` — DuckDB `ASOF ... ON l.t <= r.t`.
  *    Implemented as the algebraic reduction to backward on negated
  *    time (max of −t ⇔ min of t), so both directions run through the
  *    same sorted-merge exec and cost the same two key exchanges.
  *    Requires a numeric time column (the ns/µs-since-epoch longs the
  *    engine canonicalizes to; Long.MinValue is not a legal time).
  *    Tie-break semantics are direction-independent: among right rows
  *    with the SAME matched time, the last one in ascending `tieBreak`
  *    order wins.
  *  - `"nearest"`: the right row whose `rightTime` is CLOSEST to
  *    `leftTime` on either side; equal gaps tie to the backward match.
  *    Composed SEQUENTIALLY from the two native passes — the forward
  *    pass runs on the backward pass's output, so no rejoin of the two
  *    result sets is ever needed (each left row carries both candidate
  *    matches, the closer one wins per row). Four key exchanges + two
  *    O(1)-state sorted merges total, the same per-pass cost as
  *    backward/forward. Numeric time required (gap arithmetic).
  */
object AsOf {

  def join(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      tieBreak: Seq[String] = Nil,
      direction: String = "backward"): DataFrame = direction match {
    case "backward" => joinBackward(left, right, keys, leftTime, rightTime,
      tieBreak)
    case "forward" =>
      import org.apache.spark.sql.functions.col
      // withColumn resolves names with the session's case-sensitivity,
      // same as the backward path's resolver below
      val lNeg = "__asof_fwd_lt"
      val rNeg = "__asof_fwd_rt"
      joinBackward(
        left.withColumn(lNeg, -col(leftTime)),
        right.withColumn(rNeg, -col(rightTime)),
        keys, lNeg, rNeg, tieBreak)
        .drop(lNeg, rNeg)
    case "nearest" =>
      import org.apache.spark.sql.functions.{col, when}
      // Right value columns (everything but the keys) are joined twice
      // under per-direction prefixes, then restored under their original
      // names from whichever side won the per-row gap comparison. The
      // matched `rightTime` comes back too, so callers read the gap as
      // `abs(leftTime - rightTime)` and the side as its sign.
      val valueCols = right.columns.filterNot(keys.contains).toSeq
      // The restore step below writes each right value column back under
      // its ORIGINAL name with withColumn — which would silently
      // overwrite a left column of the same name (backward/forward
      // surface such collisions as ambiguity errors; nearest must fail
      // just as loudly). leftTime is a left column, so a right value
      // column named like it is rejected here too.
      val collide = valueCols.filter(left.columns.contains)
      require(collide.isEmpty,
        s"as-of nearest: right value column(s) ${collide.mkString(", ")} " +
          "collide with left columns; rename the right side's before joining")
      val bP = "__asof_b_"
      val fP = "__asof_f_"
      def prefixed(p: String) = valueCols.foldLeft(right) {
        (df, c) => df.withColumnRenamed(c, p + c)
      }
      val back = joinBackward(left, prefixed(bP), keys,
        leftTime, bP + rightTime, tieBreak.map(bP + _))
      val both = join(back, prefixed(fP), keys,
        leftTime, fP + rightTime, tieBreak.map(fP + _), "forward")
      val gb = col(leftTime) - col(bP + rightTime)
      val gf = col(fP + rightTime) - col(leftTime)
      val useB = col(bP + rightTime).isNotNull &&
        (col(fP + rightTime).isNull || gb <= gf)
      valueCols.foldLeft(both) { (df, c) =>
        df.withColumn(c, when(useB, col(bP + c)).otherwise(col(fP + c)))
      }.drop(valueCols.flatMap(c => Seq(bP + c, fP + c)): _*)
    case other => throw new IllegalArgumentException(
      s"as-of direction must be 'backward', 'forward' or 'nearest', " +
        s"got '$other'")
  }

  private def joinBackward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      tieBreak: Seq[String]): DataFrame = {
    // ClusteredDistribution(Nil) fails deep inside planning; surface the
    // misuse here instead (a keyless as-of is a plain latest-event scan)
    require(keys.nonEmpty, "as-of join requires at least one key column")
    val spark: SparkSession = left.sparkSession
    val lPlan = left.queryExecution.analyzed
    // Re-alias the right side when the two subtrees share attribute ids
    // (e.g. both scan the same table) so the binary node's outputs stay
    // disjoint without relying on analyzer deduplication of custom nodes.
    val rAnalyzed = right.queryExecution.analyzed
    val rPlan: LogicalPlan =
      if (rAnalyzed.outputSet.intersect(lPlan.outputSet).isEmpty) rAnalyzed
      else Project(rAnalyzed.output.map(a => Alias(a, a.name)()), rAnalyzed)

    // honor the session's case-sensitivity, like DataFrame.col does
    val resolver = spark.sessionState.analyzer.resolver
    def resolve(plan: LogicalPlan, name: String): Attribute =
      plan.output.filter(a => resolver(a.name, name)) match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"column '$name' not found in [${plan.output.map(_.name).mkString(", ")}]")
        case many => throw new IllegalArgumentException(
          s"column '$name' is ambiguous: matches ${many.map(_.name).mkString(", ")}")
      }

    // the merge compares key/time values across the two sides with one
    // ordering — mismatched types would compare garbage, so fail fast
    keys.foreach { k =>
      val (l, r) = (resolve(lPlan, k), resolve(rPlan, k))
      require(l.dataType == r.dataType,
        s"as-of key '$k': left ${l.dataType} != right ${r.dataType}")
    }
    require(resolve(lPlan, leftTime).dataType ==
        resolve(rPlan, rightTime).dataType,
      s"as-of time: left '$leftTime' ${resolve(lPlan, leftTime).dataType} " +
        s"!= right '$rightTime' ${resolve(rPlan, rightTime).dataType}")

    val rightKeyAttrs = keys.map(resolve(rPlan, _))
    val joined = AsOfJoin(
      lPlan, rPlan,
      keys.map(resolve(lPlan, _)), rightKeyAttrs,
      resolve(lPlan, leftTime), resolve(rPlan, rightTime),
      tieBreak.map(resolve(rPlan, _)))
    // natural-join shape: the right key columns duplicate the left's by
    // construction — project them away so output names stay unambiguous
    val rightKeyIds = rightKeyAttrs.map(_.exprId).toSet
    PlanApi.ofRows(
      Project(joined.output.filterNot(a => rightKeyIds.contains(a.exprId)),
        joined),
      spark)
  }
}
