package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Configuration for the global Top-N operator.
  *
  * Mirrors the reference surface (`TopNConfig.java:32-60`): a sort
  * `field` (must be a numeric physical type), a result `size`
  * (default 1, bounded by [[TopNConfig.MaxTop]]), and an `ignoreNull`
  * pre-filter (default false — NULL sort values are kept and rank
  * below every non-NULL value).
  *
  * @param field      name of the numeric column to rank by (descending)
  * @param size       number of records to keep, 1 <= size <= MaxTop
  * @param ignoreNull when true, rows whose sort field is NULL are
  *                   dropped before ranking (reference `TopN.java:132-137`)
  */
final case class TopNConfig(
    field: String,
    size: Int = 1,
    ignoreNull: Boolean = false
)

object TopNConfig {

  /** Upper bound on `size` — caps the memory of the final top-N merge,
    * mirroring the reference's heap guard (`TopNConfig.java:34`:
    * `MAX_TOP = 1024 * 1024`). At cluster scale this bounds the rows
    * that cross the final exchange to O(partitions * MaxTop).
    */
  val MaxTop: Int = 1024 * 1024
}

/** A single validation failure, attributed to the config property or
  * schema field that caused it — the analog of the reference's
  * `ValidationFailure` with `withConfigProperty` attribution
  * (`TopNConfig.java:62-104`).
  */
final case class ValidationFailure(
    message: String,
    property: Option[String] = None
)

/** Thrown when [[TopNValidator.validateOrThrow]] finds failures; carries
  * the full accumulated list (reference `FailureCollector
  * .getOrThrowException` semantics — all failures reported at once, not
  * fail-fast, see `TopNConfigTest.java:83-91`).
  */
final class TopNValidationException(val failures: Seq[ValidationFailure])
    extends IllegalArgumentException(
      failures.map(f => f.property.fold("")(p => s"[$p] ") + f.message)
        .mkString("; ")
    )

/** Multi-error validation of a [[TopNConfig]] against an input schema.
  *
  * Parity behaviors (reference file:line in parens):
  *  - V1 field must exist (`TopNConfig.java:65-71`)
  *  - V2 field type must be one of INT/LONG/FLOAT/DOUBLE with no
  *    logical type — so `DateType`/`TimestampType`/`DecimalType` are
  *    rejected even though they are "numeric-backed"
  *    (`TopNConfig.java:72-85`)
  *  - V3 1 <= size <= MaxTop (`TopNConfig.java:88-103`)
  *  - V4 failures are accumulated, not fail-fast
  *    (`TopNConfigTest.java:83-91`)
  *  - unknown (None) input schema defers field checks instead of
  *    crashing (conscious fix of the reference's NPE risk,
  *    `TopNConfig.java:62-66`)
  */
object TopNValidator {

  /** The four physical types the reference accepts as ranking keys
    * (`TopNConfig.java:77-78`). Date/timestamp/decimal are logical
    * types in the reference's Avro-style model and are rejected.
    *
    * Field lookup is intentionally CASE-SENSITIVE, matching the
    * reference's exact `Schema.getField` lookup — even though Spark
    * itself resolves columns case-insensitively by default. A config
    * that names the field in the wrong case fails validation here
    * rather than silently resolving; deterministic and
    * caseSensitive-setting-independent.
    */
  private val allowedTypes: Set[DataType] =
    Set(IntegerType, LongType, FloatType, DoubleType)

  def validate(cfg: TopNConfig, schema: Option[StructType]): Seq[ValidationFailure] = {
    val fieldFailures = schema match {
      case None => Nil // schema unknown at this point — re-validate at run prep
      case Some(s) =>
        s.fields.find(_.name == cfg.field) match {
          case None =>
            Seq(ValidationFailure(
              s"Field '${cfg.field}' must exist in input schema.",
              Some("field")))
          case Some(f) if !allowedTypes.contains(f.dataType) =>
            Seq(ValidationFailure(
              s"Field '${cfg.field}' of type ${f.dataType.simpleString} cannot be " +
                "used for sorting; it must be of type int, long, float or double.",
              Some("field")))
          case _ => Nil
        }
    }
    val sizeFailures =
      if (cfg.size < 1)
        Seq(ValidationFailure(
          s"Size ${cfg.size} must be at least 1.", Some("size")))
      else if (cfg.size > TopNConfig.MaxTop)
        Seq(ValidationFailure(
          s"Size ${cfg.size} must be at most ${TopNConfig.MaxTop}.", Some("size")))
      else Nil
    fieldFailures ++ sizeFailures
  }

  def validateOrThrow(cfg: TopNConfig, schema: Option[StructType]): Unit = {
    val failures = validate(cfg, schema)
    if (failures.nonEmpty) throw new TopNValidationException(failures)
  }
}

/** Global Top-N: the N rows with the largest values of a numeric field,
  * emitted in descending order of that field; all other columns pass
  * through untouched and the output schema is identical to the input
  * (reference `TopN.java:71`).
  *
  * Physical shape: `orderBy(desc_nulls_last).limit(n)` plans as
  * `TakeOrderedAndProjectExec` — each task keeps a bounded priority
  * queue of N rows over its partitions and only O(partitions * N) rows
  * cross to the final merge. This is a strict scalability improvement
  * over the reference, which funnels ALL rows to a single reducer with
  * no map-side combine (`TopN.java:92-95`). At 100 TB the scan is the
  * only full-data pass; the shuffle is bounded by `size`.
  *
  * NULL handling matches the reference docs ("treat NULL as the
  * smallest value", `docs/TopN-batchaggregator.md:14`): descending with
  * nulls last, and an optional `ignoreNull` pre-filter that Catalyst
  * pushes down to the parquet scan as an `IsNotNull` filter.
  */
object TopN {

  def transform(cfg: TopNConfig)(df: DataFrame): DataFrame = {
    TopNValidator.validateOrThrow(cfg, Some(df.schema))
    val base = if (cfg.ignoreNull) df.where(col(cfg.field).isNotNull) else df
    base.orderBy(col(cfg.field).desc_nulls_last).limit(cfg.size)
  }

  /** Deterministic variant: ties on the sort field are broken by
    * `tiebreakers` (ascending). The reference's contract is
    * tie-agnostic (its e2e test uses set equality, `TopNTest.java:124`);
    * this variant exists for oracle/hash-match pipelines that need a
    * unique answer. Still plans as `TakeOrderedAndProjectExec`.
    */
  def transformDeterministic(cfg: TopNConfig, tiebreakers: Seq[String])(df: DataFrame): DataFrame = {
    TopNValidator.validateOrThrow(cfg, Some(df.schema))
    val base = if (cfg.ignoreNull) df.where(col(cfg.field).isNotNull) else df
    val ordering = col(cfg.field).desc_nulls_last +: tiebreakers.map(col(_).asc)
    base.orderBy(ordering: _*).limit(cfg.size)
  }
}
