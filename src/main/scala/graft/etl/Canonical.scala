package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType, LongType}
import graft.functions.Cleaning
import AspepConfig._

/** `combine_years` re-expressed Spark-first (reference
  * process_aspep/assets.py:270-333): per-year Excel parse (driver-side;
  * files are KBs) -> header collapse -> canonical rename -> value
  * canonicalization + recode (executor-side column expressions) ->
  * schema-widening union -> broadcast dimension join -> global sort.
  *
  * Catalyst shape (SURVEY.md §3.2): one BroadcastExchange for the dim
  * join, one range shuffle for the output sort; everything else is
  * narrow projections under whole-stage codegen.
  *
  * Documented divergences from the reference (SURVEY.md §7.4):
  *  - the reference's header slice (`df.iloc[header_end:]`,
  *    assets.py:130) leaks the last header row into the data; we drop
  *    all header rows (no check pins the junk row);
  *  - `index` is the post-slice per-year ordinal, so it sits one lower
  *    than the reference's for legacy years (junk row removed);
  *  - pandas keeps unparseable strings in non-coerced metric columns;
  *    we null-coerce every metric to double (checks only read numerics).
  */
object Canonical {

  /** Per-year driver-side parse + header normalization. Returns the
    * canonical-named raw string cells for one year.
    */
  private[etl] def parseYear(path: String, year: Int): (Seq[String], Seq[Seq[String]]) =
    layout(year) match {
      case TidySheet(sheet) =>
        val rows = ExcelReader.read(path, Some(sheet))
        val rawHeader = rows.head.map(h => Option(h).getOrElse(""))
        val byName = rawHeader.zipWithIndex.toMap
        val keep = columnMap2024.map { case (orig, canon) =>
          (canon, byName.getOrElse(orig,
            throw new IllegalArgumentException(s"2024 column '$orig' missing")))
        }
        val names = keep.map(_._1)
        val data = rows.tail.map(r => keep.map { case (_, i) => r.lift(i).orNull })
        (names, data)

      case LegacyHeaders(start, end) =>
        val rows = ExcelReader.read(path, None)
        val names0 = Slug.collapseHeaders(rows, start, end)
        // header-row drop: exclusive of ALL header rows (see divergence note)
        val data0 = rows.drop(end + 1)
        // P4: drop all-null columns and empty-named columns (assets.py:133-135)
        val width = names0.length
        val keep = (0 until width).filter { c =>
          names0(c).nonEmpty && data0.exists(r => c < r.length && r(c) != null)
        }
        // P5: canonical rename of slugged legacy names (constants COLUMN_MAP)
        val names = keep.map(c => columnMap.getOrElse(names0(c), names0(c)))
        val data = data0.map(r => keep.map(c => if (c < r.length) r(c) else null))
        (names, data)
    }

  /** One year as a DataFrame of canonical-named columns (all strings)
    * plus the per-year `index` ordinal (assets.py:306 reset_index).
    */
  private[etl] def yearDf(spark: SparkSession, path: String, year: Int): DataFrame = {
    val (names, data) = parseYear(path, year)
    val schema = StructType(StructField("index", LongType, nullable = false) +:
      names.map(n => StructField(n, StringType, nullable = true)))
    val rows = data.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(i.toLong +: r)
    }
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), schema)

    // X1 trim+case, J2 recode maps, X2+X3 numeric canonicalization, X8 year
    val stateLower = lower(trim(col("state")))
    val govLower = lower(trim(col("gov_function")))
    val metricExprs = names.filter(metricCols.contains).map { m =>
      Cleaning.cleanNumeric(col(m)).as(m)
    }
    raw.select(
      Seq(col("index"),
        Cleaning.recode(stateLower, stateMap).as("state"),
        Cleaning.recode(govLower, govFunctionMap).as("gov_function")) ++
        metricExprs :+
        lit(year).as("year"): _*)
      .withColumn("state code", upper(col("state")))
  }

  /** The census-regions dimension (vendored CSV, 51 rows incl. DC, no
    * "US" row -> national rows join to NULLs; reference resources.py:12-16).
    */
  def censusDim(spark: SparkSession): DataFrame = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/census_regions.csv"), "UTF-8")
    val lines = try src.getLines().toList finally src.close()
    val rows = lines.tail.map { l =>
      val p = l.split(",", -1)
      org.apache.spark.sql.Row(p(0), p(1), p(2), p(3))
    }
    val schema = StructType(Seq(
      StructField("dim_state", StringType), StructField("state code", StringType),
      StructField("region", StringType), StructField("division", StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Full combine: union-widen all years, enrich, classify, sort. */
  def combineYears(spark: SparkSession, rawDir: String,
                   startYear: Int = StartYear, endYear: Int = EndYear): DataFrame = {
    val perYear = (startYear until endYear).flatMap { y =>
      val base = s"$rawDir/aspep_$y"
      val path = Seq(s"$base.xlsx", s"$base.xls").find(p => new java.io.File(p).exists())
      // per-year error isolation (assets.py:317-320): a bad year is
      // skipped, the run continues
      path.flatMap { p =>
        try Some(yearDf(spark, p, y))
        catch {
          case e: Exception =>
            System.err.println(s"[aspep] skipping year $y: ${e.getMessage}")
            None
        }
      }
    }
    require(perYear.nonEmpty, s"no parseable workbooks in $rawDir")

    // O2 schema-widening union (assets.py:313 concat semantics)
    val unioned = perYear.reduce(_.unionByName(_, allowMissingColumns = true))

    // J1 broadcast left join; dim State OVERWRITES state; US -> NULLs
    val dim = censusDim(spark)
    val enriched = unioned
      .join(broadcast(dim), Seq("state code"), "left")
      .withColumn("state", col("dim_state"))
      .drop("dim_state")
      .withColumn("state_scope",
        when(col("`state code`") === "US", "national").otherwise("state"))

    // stable combined column order, then O1 global sort (assets.py:322)
    val ordered = Seq("index", "state", "gov_function") ++
      metricCols.filter(enriched.columns.contains) ++
      Seq("year", "state code", "region", "division", "state_scope")
    enriched
      .select(ordered.map(c => col(s"`$c`")): _*)
      .orderBy(asc_nulls_last("state"), col("year"), col("gov_function"))
  }
}
