package graft.dims

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Date-dimension builder — intended semantics of `/root/reference/DB.sql:54-102`
  * (dim_date DDL + INSERT…SELECT population), with the reference's bugs fixed
  * (SURVEY §8.5: its leap-year predicate is always false; §8.7: is_weekday
  * means "Mon-Fri" and we keep that name).
  *
  * Postgres `EXTRACT(DOW)` is 0=Sunday while Spark `dayofweek` is 1=Sunday
  * (SURVEY §2.3 F9) — `day_of_week` here is normalized to the Postgres
  * convention so warehouse consumers see identical values.
  */
object DateDim {

  /** Build the date dimension from any DataFrame column containing a
    * date/timestamp. Distinct dates only — at 100 TB the distinct is a
    * cheap shuffle over a few thousand date keys, and the resulting dim
    * is broadcast-sized by construction. */
  def fromColumn(df: DataFrame, dateCol: String): DataFrame = {
    val d = col("date_full")
    df.select(col(dateCol).cast("date").as("date_full"))
      .filter(d.isNotNull)
      .distinct()
      .select(
        // F7 (`DB.sql:89`): REPLACE(d,'-','') surrogate → yyyyMMdd int key
        date_format(d, "yyyyMMdd").cast("int").as("date_id"),
        d,
        year(d).as("year"),
        quarter(d).as("quarter"),
        month(d).as("month"),
        weekofyear(d).as("week"),
        dayofmonth(d).as("day"),
        // F9: Postgres DOW convention (0 = Sunday)
        (dayofweek(d) - lit(1)).as("day_of_week"),
        // F10 (`DB.sql:98-99`): TO_CHAR 'Dy'/'Month' analogs
        date_format(d, "EEEE").as("day_name"),
        date_format(d, "MMMM").as("month_name"),
        // F11 (`DB.sql:100`): 1 = Mon..Fri
        when(dayofweek(d).isin(1, 7), lit(0)).otherwise(lit(1)).as("is_weekday"),
        // F12 (`DB.sql:101`, fixed): Gregorian leap-year rule
        ((year(d) % 4 === 0 && year(d) % 100 =!= 0) || year(d) % 400 === 0)
          .cast("int").as("is_leapyear"))
  }
}
