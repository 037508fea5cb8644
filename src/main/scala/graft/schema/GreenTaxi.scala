package graft.schema

import org.apache.spark.sql.types._

/** Green-taxi table schema — the typed 20-column model the reference
  * ingests (cf. /root/reference/01.py:26-47 header, 01.py:114-151 types).
  *
  * Type mapping (01.py:50-113 rationale → Spark):
  *   int16 ids/counts            → ShortType
  *   timestamp[s, NY] stored UTC → TimestampType (instant; session-TZ UTC)
  *   Y/N flag                    → BooleanType
  *   lon decimal(18,15) / lat decimal(17,15) / distance decimal(4,2) /
  *   dollar decimal(6,2)         → DecimalType (exact, never double)
  */
object GreenTaxi {

  /** Exact source-CSV header, including the reference's capitalization
    * quirk `Lpep_dropoff_datetime` (01.py:29). */
  val CsvHeader: Seq[String] = Seq(
    "VendorID", "lpep_pickup_datetime", "Lpep_dropoff_datetime",
    "Store_and_fwd_flag", "RateCodeID", "Pickup_longitude", "Pickup_latitude",
    "Dropoff_longitude", "Dropoff_latitude", "Passenger_count",
    "Trip_distance", "Fare_amount", "Extra", "MTA_tax", "Tip_amount",
    "Tolls_amount", "Ehail_fee", "Total_amount", "Payment_type", "Trip_type")

  val NumColumns: Int = CsvHeader.length // 20

  /** Output column names: dropoff normalized to lowercase (01.py:126-133). */
  val Columns: Seq[String] = CsvHeader.updated(2, "lpep_dropoff_datetime")

  private val Lon   = DecimalType(18, 15)
  private val Lat   = DecimalType(17, 15)
  private val Dist  = DecimalType(4, 2)
  private val Money = DecimalType(6, 2)

  val ColumnTypes: Seq[DataType] = Seq(
    ShortType, TimestampType, TimestampType, BooleanType, ShortType,
    Lon, Lat, Lon, Lat, ShortType, Dist,
    Money, Money, Money, Money, Money, Money, Money,
    ShortType, ShortType)

  /** Typed schema of the ingested table (mirror of 01.py:130-151). */
  val Schema: StructType = StructType(
    Columns.zip(ColumnTypes).map { case (n, t) => StructField(n, t, nullable = true) })

  /** The naive source timestamps are attributed to this zone, then stored
    * UTC-normalized (01.py:71-86). */
  val SourceTimeZone = "America/New_York"

  val TimestampFormat = "yyyy-MM-dd HH:mm:ss"
}
