package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Standardization/cleaning scalar surface — §2.H, parity with
  * utils/data_cleaner.py (:116-228 phone/email standardization, :260-289
  * validation). All Catalyst expressions (codegen'd) — no UDF in the path.
  */
object CleanLib {

  /** Phone standardization (data_cleaner.py:116-170 semantics): strip
    * non-digits; 10 digits → "(AAA) BBB-CCCC"; 11 digits with leading 1 →
    * same after dropping the 1; anything else → null (invalid).
    */
  def standardizePhone(c: Column): Column = {
    val digits = regexp_replace(c, "[^0-9]", "")
    val ten = when(length(digits) === 10, digits)
      .when(length(digits) === 11 && digits.startsWith("1"), substring(digits, 2, 10))
    when(ten.isNotNull,
      concat(lit("("), substring(ten, 1, 3), lit(") "), substring(ten, 4, 3),
        lit("-"), substring(ten, 7, 4)))
  }

  def isValidPhone(c: Column): Column = standardizePhone(c).isNotNull

  /** Email standardization (data_cleaner.py:172-228): lowercase, trim, fix
    * the common domain typos, then validate.
    */
  val DomainTypos: Seq[(String, String)] = Seq(
    "@gmial\\." -> "@gmail.", "@gamil\\." -> "@gmail.", "@gmali\\." -> "@gmail.",
    "@yahooo\\." -> "@yahoo.", "@yaho\\." -> "@yahoo.",
    "@hotmial\\." -> "@hotmail.", "@hotmal\\." -> "@hotmail.",
    "@outlok\\." -> "@outlook.")

  def standardizeEmail(c: Column): Column =
    DomainTypos.foldLeft(lower(trim(c))) { case (col0, (typo, fix)) =>
      regexp_replace(col0, typo, fix)
    }

  val EmailPattern = "^[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}$"

  def isValidEmail(c: Column): Column = standardizeEmail(c).rlike(EmailPattern)

  // ---------------------------------------------------------------- UDF registry

  /** Named-function registry — §2.M: graft's replacement for the reference's
    * config-embedded `eval` lambdas (pandas_processor.py:244-246) is (1)
    * `expr()` strings for anything Catalyst can parse, and (2) this registry
    * of NAMED functions for the rest — config refers to functions by name,
    * never by code. Registered names are callable from `expr()` /
    * `custom_sql` / pipeline YAML.
    */
  def registerUdfs(spark: SparkSession): Unit = {
    spark.udf.register("graft_phone_clean", (s: String) => {
      if (s == null) null
      else {
        val digits = s.replaceAll("[^0-9]", "")
        val ten =
          if (digits.length == 10) digits
          else if (digits.length == 11 && digits.startsWith("1")) digits.substring(1)
          else null
        if (ten == null) null
        else s"(${ten.substring(0, 3)}) ${ten.substring(3, 6)}-${ten.substring(6)}"
      }
    })
    spark.udf.register("graft_levenshtein_ratio", (a: String, b: String) => {
      if (a == null || b == null) null.asInstanceOf[java.lang.Double]
      else {
        val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        val m = math.max(a.length, b.length)
        java.lang.Double.valueOf(if (m == 0) 1.0 else 1.0 - d(a.length)(b.length).toDouble / m)
      }
    })
  }

  /** One-pass cleaning report: standardized phone/email columns + validity
    * flags (data_cleaner.py summary shape).
    */
  /** IPv4 parse/validate/classify — crawl-metadata cleaning (server logs,
    * WARC headers): adds `<col>_valid` (strict dotted-quad, octets ≤ 255),
    * `<col>_num` (the 32-bit numeric form — range joins against geo/CIDR
    * tables become integer BETWEENs), and `<col>_private` (RFC 1918
    * 10/8, 172.16/12, 192.168/16 plus 127/8 loopback — the addresses a
    * published dataset must not attribute traffic to). Pure column
    * expressions; invalid/null inputs yield valid=false and null num.
    */
  def parseIpv4(df: DataFrame, c: String): DataFrame = {
    val parts = split(col(c), "\\.")
    def oct(i: Int) = element_at(parts, i).cast("long")
    val shapeOk = col(c).rlike("^([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})$")
    val rangeOk = (1 to 4).map(i => oct(i) <= 255).reduce(_ && _)
    // the octet casts live INSIDE the when: a bare AND gives the optimizer
    // license to reorder, and the ANSI long cast on junk input would then
    // be a job-killer; CASE branches are guaranteed lazy
    val valid = coalesce(when(shapeOk, rangeOk).otherwise(lit(false)), lit(false))
    val num = when(valid,
      oct(1) * 16777216L + oct(2) * 65536L + oct(3) * 256L + oct(4))
    val priv = when(valid,
      oct(1) === 10 || (oct(1) === 172 && oct(2) >= 16 && oct(2) <= 31) ||
        (oct(1) === 192 && oct(2) === 168) || oct(1) === 127)
    df.withColumn(s"${c}_valid", valid)
      .withColumn(s"${c}_num", num)
      .withColumn(s"${c}_private", priv)
  }

  /** Salted-hash pseudonymization: replace identifier columns with
    * sha2-256("salt:value") — referential integrity survives (equal values
    * map to equal tokens, so joins/groupBys still work) while the raw
    * identifier leaves the dataset; the remediation step for columns a
    * [[graft.quality.Profiler.kAnonymity]] audit flags. NOT encryption —
    * a guessable identifier space can be brute-forced offline; rotate the
    * salt per release and treat it as a secret. Nulls stay null.
    */
  def pseudonymize(df: DataFrame, cols: Seq[String], salt: String): DataFrame = {
    require(cols.nonEmpty, "pseudonymize: need at least one column")
    require(salt != null && salt.nonEmpty, "pseudonymize: a non-empty salt is required")
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c,
        when(col(c).isNotNull,
          sha2(concat(lit(s"$salt:"), col(c).cast("string")), 256)))
    }
  }

  def cleanContacts(df: DataFrame, phoneCol: String = null, emailCol: String = null): DataFrame = {
    var d = df
    if (phoneCol != null) d = d
      .withColumn(s"${phoneCol}_clean", standardizePhone(col(phoneCol)))
      .withColumn(s"${phoneCol}_valid", isValidPhone(col(phoneCol)))
    if (emailCol != null) d = d
      .withColumn(s"${emailCol}_clean", standardizeEmail(col(emailCol)))
      .withColumn(s"${emailCol}_valid", isValidEmail(col(emailCol)))
    d
  }
}
