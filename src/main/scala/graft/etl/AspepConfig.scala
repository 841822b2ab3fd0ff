package graft.etl

/** Vocabulary and per-year layout configuration for the ASPEP pipeline.
  *
  * These are DATA constants re-expressed from the reference's published
  * behavior (header row offsets, canonical column names, the messy ->
  * canonical recode vocabularies): reference
  * process_aspep/constants.py:1-27 (ASPEP_DATA_CONFIG),
  * :29-45 (COLUMN_MAP), :47-58 (NEW_COLUMN_MAP_2024),
  * :60-63 (NUMERIC_COLS_2024), :66-133 (GOV_FUNCTION_MAP),
  * :135-189 (STATE_CODE_MAP / STATE_MAP).
  */
object AspepConfig {

  val StartYear = 2003 // reference assets.py:17
  val EndYear   = 2025 // exclusive; reference assets.py:18

  /** Per-year multi-row header range (0-based row indices, inclusive).
    * None = tidy 2024+ API layout on the named sheet.
    */
  sealed trait YearLayout
  final case class LegacyHeaders(headerStart: Int, headerEnd: Int) extends YearLayout
  final case class TidySheet(sheetName: String) extends YearLayout

  val layout: Map[Int, YearLayout] = Map(
    2000 -> LegacyHeaders(1, 3),
    2001 -> LegacyHeaders(3, 5),
    2002 -> LegacyHeaders(1, 3),
    2003 -> LegacyHeaders(1, 3),
    2004 -> LegacyHeaders(1, 3),
    2005 -> LegacyHeaders(1, 3),
    2006 -> LegacyHeaders(1, 3),
    2007 -> LegacyHeaders(9, 11),
    2008 -> LegacyHeaders(9, 11),
    2009 -> LegacyHeaders(10, 12),
    2010 -> LegacyHeaders(10, 12),
    2011 -> LegacyHeaders(10, 12),
    2012 -> LegacyHeaders(11, 13),
    2013 -> LegacyHeaders(11, 13),
    2014 -> LegacyHeaders(9, 11),
    2015 -> LegacyHeaders(9, 11),
    2016 -> LegacyHeaders(9, 11),
    2017 -> LegacyHeaders(11, 13),
    2018 -> LegacyHeaders(12, 14),
    2019 -> LegacyHeaders(12, 14),
    2020 -> LegacyHeaders(12, 14),
    2021 -> LegacyHeaders(12, 14),
    2022 -> LegacyHeaders(12, 14),
    2023 -> LegacyHeaders(12, 14),
    2024 -> TidySheet("Data")
  )

  /** Slugified legacy header -> canonical metric column. */
  val columnMap: Map[String, String] = Map(
    "fulltime_and_parttime_employment" -> "ft_pt_employment",
    "fulltime_employees" -> "ft_employment",
    "fulltime_employment" -> "ft_employment",
    "fulltime_equivalent_employment" -> "ft_eq_employment",
    "fulltime_pay" -> "ft_pay",
    "fulltime_payroll" -> "ft_pay",
    "march_pay" -> "total_pay",
    "parttime_employees" -> "pt_employment",
    "parttime_employment" -> "pt_employment",
    "parttime_hours" -> "pt_hour",
    "parttime_pay" -> "pt_pay",
    "parttime_payroll" -> "pt_pay",
    "total_fulltime_and_parttime_employment" -> "ft_pt_employment",
    "total_march_payroll" -> "total_pay",
    "total_payroll" -> "total_pay"
  )

  /** 2024 API column header -> canonical name (order matters: it is the
    * projection order of the 2024 path).
    */
  val columnMap2024: Seq[(String, String)] = Seq(
    "Geographic Area Name" -> "state",
    "Meaning of Aggregate Description" -> "gov_function",
    "Full-Time Employment" -> "ft_employment",
    "Full-Time Payroll" -> "ft_pay",
    "Part-Time Employment" -> "pt_employment",
    "Part-Time Payroll" -> "pt_pay",
    "Part-Time Hours" -> "pt_hours",
    "Full-Time Equivalent Employment" -> "ft_eq_employment",
    "Total Full-Time and Part-Time Employment" -> "ft_pt_employment",
    "Total Full-Time and Part-Time Payroll" -> "total_pay"
  )

  val numericCols2024: Seq[String] = Seq(
    "ft_employment", "ft_pay", "pt_employment", "pt_pay", "pt_hours",
    "ft_eq_employment", "ft_pt_employment", "total_pay")

  /** Messy function label (lowercased) -> canonical vocabulary. */
  val govFunctionMap: Map[String, String] = Map(
    "total" -> "total - all government employment functions",
    "financial administration" -> "financial administration",
    "financial admin" -> "financial administration",
    "central administration" -> "other government administration",
    "central admin" -> "other government administration",
    "judicial & legal" -> "judicial and legal",
    "judicial-legal" -> "judicial and legal",
    "police arrest" -> "police protection - persons with power of arrest",
    "police-arrest" -> "police protection - persons with power of arrest",
    "persons with power of arrest" -> "police protection - persons with power of arrest",
    "police with power of arrest" -> "police protection - persons with power of arrest",
    "police protection - officers" -> "police protection - persons with power of arrest",
    "police officers only" -> "police protection - persons with power of arrest",
    "police-other" -> "police protection - other",
    "police - other" -> "police protection - other",
    "police other" -> "police protection - other",
    "other police employees" -> "police protection - other",
    "correction" -> "corrections",
    "streets & highways" -> "highways",
    "streets & hwys" -> "highways",
    "airports" -> "air transportation",
    "water transportation" -> "sea and inland port facilities",
    "water transport and terminals" -> "sea and inland port facilities",
    "water transport & terminals" -> "sea and inland port facilities",
    "water transport" -> "sea and inland port facilities",
    "water transport and canals" -> "sea and inland port facilities",
    "social insurance admin" -> "social insurance administration",
    "soc insur admin" -> "social insurance administration",
    "solid waste mgmt" -> "solid waste management",
    "sewage disposal" -> "sewerage",
    "parks & recreation" -> "parks and recreation",
    "housing & comm dev" -> "housing and community development",
    "housing & community development" -> "housing and community development",
    "housing and community developmen" -> "housing and community development",
    "elem & sec instruction" -> "education - elementary and secondary instructional",
    "elem & sec instructional employees" -> "education - elementary and secondary instructional",
    "elem & sec instructional" -> "education - elementary and secondary instructional",
    "instructional employees" -> "education - elementary and secondary instructional",
    "elem&sec instruct" -> "education - elementary and secondary instructional",
    "elem&sec other-tot" -> "education - elementary and secondary other",
    "elem & sec - other" -> "education - elementary and secondary other",
    "elem & sec other employees" -> "education - elementary and secondary other",
    "elem & secondary - other" -> "education - elementary and secondary other",
    "elem & sec  - other" -> "education - elementary and secondary other",
    "elem & sec admin/cler" -> "education - elementary and secondary other",
    "elem & sec oper/maint" -> "education - elementary and secondary other",
    "elem & sec cafeteria" -> "education - elementary and secondary other",
    "elem & sec bus transit" -> "education - elementary and secondary other",
    "elem & sec health/rec" -> "education - elementary and secondary other",
    "elem & sec student" -> "education - elementary and secondary other",
    "elem & sec unalloc" -> "education - elementary and secondary other",
    "higher ed - instructional" -> "education - higher education instructional",
    "higher ed instructional employees" -> "education - higher education instructional",
    "higher ed instructional" -> "education - higher education instructional",
    "higher ed instruct" -> "education - higher education instructional",
    "higher ed - other" -> "education - higher education other",
    "higher ed other" -> "education - higher education other",
    "higher ed other employees" -> "education - higher education other",
    "other education" -> "education - other",
    "other ed - state" -> "education - other",
    "local libraries" -> "libraries",
    "other & unallocable" -> "all other and unallocable",
    "other and unallocable" -> "all other and unallocable",
    "liquor stores" -> "state liquor stores"
  )

  /** USPS code -> lowercase full state name ("us" -> "united states"). */
  val stateCodeToName: Map[String, String] = Map(
    "us" -> "united states",
    "al" -> "alabama", "ak" -> "alaska", "az" -> "arizona",
    "ar" -> "arkansas", "ca" -> "california", "co" -> "colorado",
    "ct" -> "connecticut", "de" -> "delaware", "fl" -> "florida",
    "ga" -> "georgia", "hi" -> "hawaii", "id" -> "idaho",
    "il" -> "illinois", "in" -> "indiana", "ia" -> "iowa",
    "ks" -> "kansas", "ky" -> "kentucky", "la" -> "louisiana",
    "me" -> "maine", "md" -> "maryland", "ma" -> "massachusetts",
    "mi" -> "michigan", "mn" -> "minnesota", "ms" -> "mississippi",
    "mo" -> "missouri", "mt" -> "montana", "ne" -> "nebraska",
    "nv" -> "nevada", "nh" -> "new hampshire", "nj" -> "new jersey",
    "nm" -> "new mexico", "ny" -> "new york", "nc" -> "north carolina",
    "nd" -> "north dakota", "oh" -> "ohio", "ok" -> "oklahoma",
    "or" -> "oregon", "pa" -> "pennsylvania", "ri" -> "rhode island",
    "sc" -> "south carolina", "sd" -> "south dakota", "tn" -> "tennessee",
    "tx" -> "texas", "ut" -> "utah", "vt" -> "vermont",
    "va" -> "virginia", "wa" -> "washington", "wv" -> "west virginia",
    "wi" -> "wisconsin", "wy" -> "wyoming")

  /** lowercase full name -> USPS code (the recode applied to `state`). */
  val stateMap: Map[String, String] =
    stateCodeToName.map { case (code, name) => name -> code.toUpperCase }

  /** Canonical metric columns in combined-table order. */
  val metricCols: Seq[String] = Seq(
    "ft_employment", "ft_pay", "pt_employment", "pt_pay", "pt_hour",
    "pt_hours", "ft_eq_employment", "ft_pt_employment", "total_pay")
}
