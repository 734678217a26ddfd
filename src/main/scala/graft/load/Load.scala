package graft.load

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.GraftFunctions._

/** Load/lookup/union operators (SURVEY §2.3 J2/J7/J8, §2.4 A12, §2.6
  * O2, §2.7 U1/U2, §3.2): the reference's `myConversionsClass` /
  * `myDFClass` join utilities and the SqlUpload union+coerce+preview
  * pipeline, re-expressed declaratively.
  */
object Load {

  /** J2: guarded left join — FAIL (reference Err=99,
    * `myConversionsClass.py:188-203`) if the right side has duplicate
    * keys. The guard is one tiny aggregate over the (dimension-sized)
    * right side, evaluated before the join is launched. */
  def guardedLeftJoin(left: DataFrame, right: DataFrame,
      keys: Seq[String]): DataFrame = {
    val dups = right.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).limit(1).count()
    require(dups == 0, "Err=99: right side has duplicate join keys")
    left.join(right, keys, "left")
  }

  /** J7: lookup join with NotMapped default + error side-output
    * (reference `myConversionsClass.py:265-302`): unmatched keys get
    * "NotMapped"; the distinct unmatched keys are a separate frame the
    * caller can persist/notify with. */
  def lookupWithDefault(facts: DataFrame, lookup: DataFrame, key: String,
      valueCol: String, default: String = "NotMapped")
      : (DataFrame, DataFrame) = {
    val joined = facts.join(broadcast(lookup), Seq(key), "left")
    val enriched = joined.withColumn(valueCol,
      coalesce(col(valueCol), lit(default)))
    val errors = joined.filter(col(valueCol).isNull)
      .select(col(key)).distinct()
    (enriched, errors)
  }

  /** J8: region/plant backfill — rows with a blank region are crossed
    * with the (tiny) region list and re-joined on (key, region) to pick
    * a plant (reference `myDFClass.py:222-243`). */
  def regionBackfill(facts: DataFrame, regionPlants: DataFrame,
      keyCol: String): DataFrame = {
    val blank = facts.filter(col("region").isNull || col("region") === "")
      .drop("region")
    val filled = facts.filter(col("region").isNotNull && col("region") =!= "")
    val backfilled = blank
      .crossJoin(broadcast(regionPlants.select(col("region")).distinct()))
      .join(broadcast(regionPlants), Seq(keyCol, "region"), "left")
    filled.join(broadcast(regionPlants), Seq(keyCol, "region"), "left")
      .unionByName(backfilled)
  }

  /** A12: row-wise (horizontal) sum across a column list — a pure
    * expression, no shuffle (reference `sumColumns`,
    * `myConversionsClass.py:426-438`). */
  def horizontalSum(cols: Seq[Column]): Column =
    cols.map(c => coalesce(c, lit(0.0))).reduce(_ + _)

  /** U2: split-process-union — divergent branches (numeric-parsable vs
    * not, reference `myDFClass.py:139-143` / F12) processed separately
    * then unioned by name. */
  def splitUnion(df: DataFrame, valueCol: String): DataFrame = {
    val parsable = df.filter(isNumeric(col(valueCol)))
      .withColumn("branch", lit("FLOAT"))
      .withColumn(valueCol, col(valueCol).cast("double").cast("string"))
    val rest = df.filter(!isNumeric(col(valueCol)))
      .withColumn("branch", lit("STR"))
      .withColumn(valueCol, upper(col(valueCol)))
    parsable.unionByName(rest)
  }

  /** §3.2 step 2 / SURVEY §1.3: schema-driven type coercion — the
    * reference's `_coerce_df_to_sql_types` (`DryRun.py:115-188`) reads
    * `INFORMATION_SCHEMA` and casts per column type; here the target
    * schema IS the declaration. Per-type cleaning before the cast:
    * strings get trim + pandas-null normalization (F1), doubles get
    * thousands-comma removal + TRY-cast (F4, NULL on failure — the
    * upload path's semantics), dates the lenient MM/dd/yyyy-then-ISO
    * parse (F16), integers a trimmed TRY-cast. Pure projection — one
    * codegen'd pass, no shuffle. */
  def coerceToSchema(df: DataFrame,
      target: org.apache.spark.sql.types.StructType): DataFrame = {
    import org.apache.spark.sql.types._
    df.select(target.fields.map { f =>
      val c = col(f.name)
      val coerced = f.dataType match {
        case StringType => cleanString(c)
        case DoubleType | FloatType => parseNumberNull(c)
        case DateType => parseDateLenient(c)
        case LongType | IntegerType | ShortType =>
          org.apache.spark.sql.graft.ColumnShim.tryCast(trim(c), LongType)
        case _ => c
      }
      coerced.cast(f.dataType).as(f.name)
    }.toSeq: _*)
  }

  /** §5 pre-upload null audit (`SqlUpload force nulls.py:105-123`
    * `_validate_before_upload`): count NULL/unparsable rows per named
    * column before an insert — one aggregate pass, one output row. */
  def nullAudit(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls")) :+
      count(lit(1)).as("n_rows"): _*)

  /** Null-pattern histogram (X228) — the step past the per-column
    * rates of [[nullAudit]]: which null COMBINATIONS co-occur. A
    * feed where `value` and `status` are always null TOGETHER is one
    * broken upstream join; independent scatter is entry noise — the
    * pattern histogram distinguishes the two, which decides whether
    * the fix is a join repair or row-level cleaning. Per pattern: a
    * stable bitmask (column i of the declared list gets bit
    * 2^(n−1−i)), the readable null-column list, row count and
    * integer-ppm share.
    *
    * Scale: one map-side-combinable aggregate over the ≤2^n pattern
    * key (n = the handful of declared columns, never the full
    * schema); 1-row total broadcast. */
  def nullPatterns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && cols.size <= 62,
      "nullPatterns: 1..62 declared columns")
    val mask = cols.zipWithIndex.map { case (c, i) =>
      when(col(c).isNull, lit(1L << (cols.size - 1 - i)))
        .otherwise(0L) }.reduce(_ + _)
    val pattern = concat_ws(",",
      cols.map(c => when(col(c).isNull, lit(c))): _*)
    val cells = df
      .select(mask.cast("long").as("mask"), pattern.as("null_cols"))
      .groupBy(col("mask"), col("null_cols"))
      .agg(count(lit(1)).cast("long").as("n_rows"))
    cells.crossJoin(broadcast(
        cells.agg(sum(col("n_rows")).cast("long").as("n_total"))))
      .select(col("mask"), col("null_cols"), col("n_rows"),
        expr("(n_rows * 1000000) div greatest(n_total, 1)")
          .cast("long").as("share_ppm"))
  }

  /** O2/§3.2: upload preview — `TOP(n) ORDER BY TRY_CONVERT(date, …)
    * DESC` (reference `SqlUpload.py:107-123`): lenient date parse as
    * the sort key, nulls last. */
  def previewLatest(df: DataFrame, dateCol: String, n: Int,
      tieBreak: Seq[Column] = Nil): DataFrame =
    df.orderBy(parseDateLenient(col(dateCol)).desc_nulls_last +: tieBreak: _*)
      .limit(n)
}
