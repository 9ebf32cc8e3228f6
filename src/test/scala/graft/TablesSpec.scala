package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.util.Tables.normalizeEventTs]]: the canonical (ts, ts_ns)
  * pair must not depend on the on-disk ts representation OR on the
  * session timezone — an externally-built session (the accessor's
  * self-heal audience) may run in any zone, and NTZ wall times are UTC
  * by corpus convention.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val noonUtcNs = 1623758400L * 1000000000L // 2021-06-15T12:00:00Z

  test("normalizeEventTs: NTZ wall times bind UTC on ANY session timezone") {
    val saved = spark.conf.get("spark.sql.session.timeZone")
    try {
      // NTZ parse of a wall string is zone-free; the frame is lazy, so
      // each collect below re-evaluates under its session zone
      val df = {
        import spark.implicits._
        Seq("2021-06-15 12:00:00", "2021-06-15 12:00:00.000001").toDF("s")
          .select(to_timestamp_ntz(col("s")).as("ts"))
      }
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      val utcNs = graft.util.Tables.normalizeEventTs(df)
        .select("ts_ns").collect().map(_.getLong(0)).toSeq
      // the regression this pins: a bare NTZ→TZ cast binds the session
      // zone, shifting every instant by the zone offset (-4h here)
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val estNs = graft.util.Tables.normalizeEventTs(df)
        .select("ts_ns").collect().map(_.getLong(0)).toSeq
      assert(utcNs == estNs)
      assert(utcNs == Seq(noonUtcNs, noonUtcNs + 1000L))
    } finally spark.conf.set("spark.sql.session.timeZone", saved)
  }

  test("normalizeEventTs: instant (TimestampType) input is already zone-free") {
    val saved = spark.conf.get("spark.sql.session.timeZone")
    try {
      val df = spark.range(1)
        .select(timestamp_micros(lit(noonUtcNs / 1000L)).as("ts"))
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val ns = graft.util.Tables.normalizeEventTs(df)
        .select("ts_ns").collect().map(_.getLong(0)).toSeq
      assert(ns == Seq(noonUtcNs))
    } finally spark.conf.set("spark.sql.session.timeZone", saved)
  }
}
