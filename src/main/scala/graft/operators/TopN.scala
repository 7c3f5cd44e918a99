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

  private[operators] def fieldFailures(field: String, schema: Option[StructType]): Seq[ValidationFailure] =
    schema match {
      case None => Nil // schema unknown at this point — re-validate at run prep
      case Some(s) =>
        s.fields.find(_.name == field) match {
          case None =>
            Seq(ValidationFailure(
              s"Field '$field' must exist in input schema.",
              Some("field")))
          case Some(f) if !allowedTypes.contains(f.dataType) =>
            Seq(ValidationFailure(
              s"Field '$field' of type ${f.dataType.simpleString} cannot be " +
                "used for sorting; it must be of type int, long, float or double.",
              Some("field")))
          case _ => Nil
        }
    }

  private[operators] def sizeFailures(size: Int): Seq[ValidationFailure] =
    if (size < 1)
      Seq(ValidationFailure(
        s"Size $size must be at least 1.", Some("size")))
    else if (size > TopNConfig.MaxTop)
      Seq(ValidationFailure(
        s"Size $size must be at most ${TopNConfig.MaxTop}.", Some("size")))
    else Nil

  def validate(cfg: TopNConfig, schema: Option[StructType]): Seq[ValidationFailure] =
    fieldFailures(cfg.field, schema) ++ sizeFailures(cfg.size)

  def validateOrThrow(cfg: TopNConfig, schema: Option[StructType]): Unit = {
    val failures = validate(cfg, schema)
    if (failures.nonEmpty) throw new TopNValidationException(failures)
  }
}

/** Deploy-time ("raw") Top-N configuration whose property values may be
  * late-bound `${argument}` placeholders — the analog of the
  * reference's `@Macro` annotation (`TopNConfig.java:41-52`): at
  * deployment a property may not have a concrete value yet, so its
  * validation is deferred; at run preparation the placeholders are
  * resolved from the runtime arguments and EVERYTHING is re-validated.
  */
final case class TopNRawConfig(
    field: String,
    size: String = "1",
    ignoreNull: String = "false"
)

/** Two-phase validation of [[TopNRawConfig]] mirroring the reference's
  * `containsMacro` skip at configure time + full re-validation at run
  * prep (`TopNConfig.java:62-66` guarded by the macro check).
  */
object TopNMacro {

  private val Macro = """\$\{([^}]+)\}""".r

  def containsMacro(value: String): Boolean = Macro.findFirstIn(value).isDefined

  private def parseSize(value: String): Either[ValidationFailure, Int] =
    value.trim.toIntOption.toRight(ValidationFailure(
      s"Size '$value' must be an integer.", Some("size")))

  private def parseIgnoreNull(value: String): Either[ValidationFailure, Boolean] =
    value.trim.toLowerCase match {
      case "true" => Right(true)
      case "false" => Right(false)
      case _ => Left(ValidationFailure(
        s"ignoreNull '$value' must be true or false.", Some("ignoreNull")))
    }

  /** Deploy-time validation: concrete properties are fully checked;
    * macro'd properties are skipped (they cannot be judged yet). A
    * passing deploy validation therefore does NOT guarantee a passing
    * run — [[resolve]] re-validates after substitution.
    */
  def validateAtDeploy(cfg: TopNRawConfig, schema: Option[StructType]): Seq[ValidationFailure] = {
    val fieldF =
      if (containsMacro(cfg.field)) Nil
      else TopNValidator.fieldFailures(cfg.field, schema)
    val sizeF =
      if (containsMacro(cfg.size)) Nil
      else parseSize(cfg.size).fold(Seq(_), TopNValidator.sizeFailures)
    val ignoreF =
      if (containsMacro(cfg.ignoreNull)) Nil
      else parseIgnoreNull(cfg.ignoreNull).left.toSeq
    fieldF ++ sizeF ++ ignoreF
  }

  /** Substitute `${arg}`s from `args`; unresolved placeholders fail
    * with attribution to the property that contains them.
    */
  private def substitute(property: String, value: String,
                         args: Map[String, String]): Either[ValidationFailure, String] = {
    val names = Macro.findAllMatchIn(value).map(_.group(1)).toSeq
    val missing = names.filterNot(args.contains)
    if (missing.nonEmpty)
      Left(ValidationFailure(
        s"Unresolved runtime argument(s) ${missing.mkString("${", "}, ${", "}")} " +
          s"in value '$value'.", Some(property)))
    else
      Right(Macro.replaceAllIn(value,
        m => java.util.regex.Matcher.quoteReplacement(args(m.group(1)))))
  }

  /** Run-prep resolution: substitute every placeholder from the runtime
    * arguments, parse, and re-validate the now-concrete config against
    * the schema. Throws [[TopNValidationException]] with ALL accumulated
    * failures (substitution, parse, and semantic) — same multi-error
    * contract as deploy-time validation.
    */
  def resolve(cfg: TopNRawConfig, args: Map[String, String],
              schema: Option[StructType]): TopNConfig = {
    val fieldE = substitute("field", cfg.field, args)
    val sizeE = substitute("size", cfg.size, args).flatMap(parseSize)
    val ignoreE = substitute("ignoreNull", cfg.ignoreNull, args).flatMap(parseIgnoreNull)
    val substFailures = Seq(fieldE, sizeE, ignoreE).flatMap(_.left.toSeq)
    if (substFailures.nonEmpty) throw new TopNValidationException(substFailures)
    val resolved = TopNConfig(
      fieldE.toOption.get, sizeE.toOption.get, ignoreE.toOption.get)
    TopNValidator.validateOrThrow(resolved, schema)
    resolved
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

  /** Late-bound entry point: resolve a [[TopNRawConfig]]'s `${arg}`
    * placeholders against the runtime arguments (re-validating
    * everything — [[TopNMacro.resolve]]), then run the operator. The
    * deploy-time half of the contract is
    * [[TopNMacro.validateAtDeploy]], called when the job is configured
    * and the runtime arguments don't exist yet.
    */
  def transformLateBound(raw: TopNRawConfig, args: Map[String, String])(df: DataFrame): DataFrame =
    transform(TopNMacro.resolve(raw, args, Some(df.schema)))(df)

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
