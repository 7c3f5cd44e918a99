package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the admission gate a corpus
  * or warehouse load runs before anything downstream trusts the data
  * (the capability popularized by constraint-suite libraries such as
  * AWS Deequ; re-derived here as plain aggregates). Each rule
  * evaluates to ONE row (rule, checked BIGINT, violations BIGINT);
  * a suite is the union of its rules, so the whole contract is one
  * small DataFrame a scheduler can assert on.
  *
  * Scale shape: a predicate rule is a scan-level aggregate (count +
  * conditional sum, map-side partial, no shuffle beyond the one-row
  * final); a uniqueness rule is a hash aggregate on the key; a
  * referential rule is an anti-join the optimizer broadcasts when
  * the parent side is small. Rules never materialize violating rows
  * — they count them; pair with a filter on the same predicate to
  * extract offenders.
  */
object DataQuality {

  /** Rows where `violation` is true OR evaluates to NULL, as
    * (rule, checked, violations). A NULL predicate outcome (e.g. a
    * range check over a NULL value) counts as a violation — in a
    * quality gate the NULLs are usually the problem being hunted, so
    * a three-valued-logic pass-through would silently under-report;
    * pair with an explicit completeness rule to tell the two apart.
    */
  def predicateRule(df: DataFrame, rule: String, violation: Column): DataFrame =
    predicateSuite(df, Seq(rule -> violation))

  /** All predicate rules over ONE scan of `df`: a single aggregate
    * computes the shared row count plus one conditional sum per rule,
    * then the one-row result is unpivoted to (rule, checked,
    * violations) rows. At warehouse scale this is the difference
    * between N scans of the fact table and one — predicate rules are
    * all scan-level conditional sums, so they compose into a single
    * map-side-partial aggregate for free.
    */
  def predicateSuite(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "predicateSuite needs at least one rule")
    val aggs = count(lit(1)).as("checked") +:
      rules.zipWithIndex.map { case ((_, violation), i) =>
        coalesce(sum(when(violation.isNull || violation, 1L).otherwise(0L)),
          lit(0L)).as(s"__v$i")
      }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rules.zipWithIndex.map { case ((rule, _), i) =>
        struct(lit(rule).as("rule"), col("checked"),
          col(s"__v$i").as("violations"))
      }: _*)).as("r"))
      .select("r.rule", "r.checked", "r.violations")
  }

  /** Key uniqueness: violations = rows beyond the first per key. */
  def uniqueRule(df: DataFrame, rule: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(
        coalesce(sum(col("n")), lit(0L)).as("checked"),
        coalesce(sum(col("n") - 1L), lit(0L)).as("violations"))
      .select(lit(rule).as("rule"), col("checked"), col("violations"))

  /** Referential integrity: child keys with no matching parent key.
    * NULL child keys are counted as violations (an unknown parent is
    * not a valid reference); use a completeness rule to distinguish.
    */
  def referenceRule(child: DataFrame, childKey: String,
                    parent: DataFrame, parentKey: String,
                    rule: String): DataFrame = {
    val total = child.agg(count(lit(1)).as("checked"))
    val orphans = child
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("violations"))
    total.crossJoin(orphans)
      .select(lit(rule).as("rule"), col("checked"), col("violations"))
  }

  /** A suite is the union of its rules — run together, read as one. */
  def suite(rules: Seq[DataFrame]): DataFrame = {
    require(rules.nonEmpty, "a data-quality suite needs at least one rule")
    rules.reduce(_ unionByName _)
  }

  /** Distribution drift between a reference and a current slice of the
    * same BIGINT measure (the PSI/retraining-trigger shape, kept
    * exact): both sides are histogrammed into fixed-width bins, then
    * each bin's share difference is tested against `thresholdPct`
    * percent by INTEGER cross-multiplication —
    * `|cnt_ref·n_cur − cnt_cur·n_ref| · (100/thresholdPct) >
    * n_ref·n_cur` — so the flag is bit-deterministic on any engine
    * and any partitioning (no double division, the q_outliers
    * convention). Output: (bin, cnt_ref, cnt_cur, drifted) for every
    * bin present on either side (a bin missing from one side counts
    * 0 there — appearing/vanishing mass is exactly what drift is).
    *
    * Scale shape: two scan-level histogram aggregates (map-side
    * partial, bin cardinality bounded by value RANGE not volume — the
    * q_histogram argument) + one full-outer join on bin + two
    * broadcast one-row totals. The fact tables are never joined.
    */
  def histogramDrift(ref: DataFrame, cur: DataFrame, valueCol: String,
                     binWidth: Long, thresholdPct: Int): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(thresholdPct >= 1 && thresholdPct <= 100,
      s"thresholdPct must be in [1,100], got $thresholdPct")
    require(100 % thresholdPct == 0,
      s"thresholdPct must divide 100 for exact integer cross-multiplication, got $thresholdPct")
    val mult = 100L / thresholdPct
    // integer `div`, never floor(double /): the double quotient can
    // misround near bin edges at large magnitudes; div is exact on
    // both engines (DuckDB `//`). Values are required non-negative
    // (true for the measures this gates) so div == floor division.
    // negative values refuse in-plan: integer division rounds toward
    // zero in Spark but floors in some engines, so a negative value
    // would silently bin differently in a cross-engine replay
    def bins(df: DataFrame, cnt: String) = df
      .select(when(col(valueCol).cast("long") < 0,
          raise_error(concat(lit(s"histogramDrift: negative $valueCol: "),
            col(valueCol).cast("string"))))
        .otherwise(col(valueCol).cast("long")).as("__v"))
      .select(expr(s"__v div ${binWidth}L").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(cnt))
    val cr = bins(ref, "cnt_ref")
    val cc = bins(cur, "cnt_cur")
    // totals derive from the histograms (sum of bin counts == row
    // count: every row bins) — never a second scan of the fact slices
    val nr = cr.agg(coalesce(sum(col("cnt_ref")), lit(0L)).as("n_ref"))
    val nc = cc.agg(coalesce(sum(col("cnt_cur")), lit(0L)).as("n_cur"))
    // cross-multiplication in DECIMAL(38,0): BIGINT products overflow
    // once a slice passes ~4e8 rows (n^2 * mult > 2^63), exactly the
    // scale this gates — decimal keeps the flag exact to 10^38 (the
    // q_outliers convention); the oracle mirrors with HUGEINT
    def d(c: Column) = c.cast("decimal(38,0)")
    cr.join(cc, Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("cnt_ref"), lit(0L)).as("cnt_ref"),
        coalesce(col("cnt_cur"), lit(0L)).as("cnt_cur"))
      .crossJoin(broadcast(nr)).crossJoin(broadcast(nc))
      .select(col("bin"), col("cnt_ref"), col("cnt_cur"),
        (abs(d(col("cnt_ref")) * d(col("n_cur"))
            - d(col("cnt_cur")) * d(col("n_ref"))) * lit(mult)
          > d(col("n_ref")) * d(col("n_cur"))).as("drifted"))
  }
}
