package graft.schema

import org.apache.spark.sql.types._

/** Schema contracts for the four staging extracts + dimensions (FIXTURES.md;
  * reconstructed from every column the reference's 36 SQL statements touch).
  * Staging loads are schema-on-read strings — the MMD path stringifies
  * everything by design (parquet_solution.py:75) and the other extracts cast
  * at point of use.
  */
object Schemas {

  private def strings(names: String*): StructType =
    StructType(names.map(StructField(_, StringType, nullable = true)))

  /** dags/covid_transforms.py:46,59-63,66 (incl. source typos Facilty_Name,
    * Ever_recieved_Booster). */
  val covidStaging: StructType = strings(
    "MFL_code", "Facilty_Name", "ccc_number", "phone_number", "id_number",
    "DOB", "ageInYears", "Gender", "visit_date", "Ever_Vaccinated",
    "First_Vaccine", "First_Vaccination_Verified", "first_dose_date",
    "Second_Vaccine", "Second_Vaccination_Verified", "second_dose_date",
    "Final_Vaccination_Status", "Ever_recieved_Booster", "Booster_Vaccine")

  /** dags/hts_transforms.py:47,61-67,70. */
  val htsStaging: StructType = strings(
    "SiteCode", "CccNumber", "PatientId", "DOB", "Gender", "ageInYears",
    "EntryPoint", "Consent", "ClientTestedAs", "TestStrategy",
    "TestResult1", "TestResult2", "FinalTestResult", "TestDate",
    "PatientGivenResult", "FacilityLinked", "art_start_date",
    "EverTestedForHiv", "MonthsSinceLastTest", "TbScreening",
    "ClientSelfTested", "CoupleDiscordant", "TestType")

  /** dags/mmd_transforms.py:55-63 — all strings at load (the stringify path);
    * retyped by the pipeline's first stage. */
  val mmdStaging: StructType = strings(
    "DOB", "Gender", "weight", "height", "CCC", "PatientPK", "NationalID",
    "AgeEnrollment", "AgeARTStart", "AgeLastVisit", "SiteCode",
    "FacilityName", "RegistrationDate", "PatientSource",
    "PreviousARTStartDate", "StartARTAtThisFAcility", "StartARTDate",
    "PreviousARTUse", "PreviousARTPurpose", "PreviousARTRegimen",
    "DateLastUsed", "StartRegimen", "StartRegimenLine", "LastARTDate",
    "LastRegimen", "LastRegimenLine", "ExpectedReturn", "LastVisit",
    "Duration", "ExitDate", "ExitReason", "Date_Created", "Date_Last_Modified")

  /** dags/vls_transforms.py:44,59-60,74,87-89,102-105. */
  val vlsStaging: StructType = strings(
    "Mfl_code", "ccc_number", "Gender", "DOB", "ageInYears",
    "date_test_requested", "date_test_result_received", "lab_test",
    "urgency", "order_reason", "test_result")

  /** MFL facility dimension (covid_transforms.py:59-60,65-66). */
  val mflCodes: StructType = StructType(Seq(
    StructField("SiteCode", LongType),
    StructField("officialname", StringType),
    StructField("county_name", StringType),
    StructField("constituency_name", StringType),
    StructField("sub_county_name", StringType),
    StructField("ward_name", StringType),
    StructField("lat", DoubleType),
    StructField("long", DoubleType)))

  /** Hub dimension (mmd_transforms.py:246-249). */
  val hubDetails: StructType = StructType(Seq(
    StructField("MFL_Code", LongType),
    StructField("Hub", StringType)))

  /** Streaming event metadata (cloud_function/main.py:28-47). */
  val eventMetadata: StructType = StructType(Seq(
    StructField("extract_type", StringType),
    StructField("bucket", StringType),
    StructField("object", StringType),
    StructField("uploaded_at", StringType)))
}
