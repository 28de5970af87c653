package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Zone-map file skipping: pruning must be a SUPERSET filter (never drop
  * a matching row), actually skip files on a clustered column, and stay
  * open-bound / multi-column correct. */
class ZoneMapSpec extends SparkSpec {

  private val dir = "/root/repo/target/ttmp/zonemap_spec"

  private lazy val written: Unit = {
    val orders = spark.read.parquet(sf("orders"))
    ZoneMap.write(orders, dir, Seq("o_orderdate"), nFiles = 8)
  }

  test("pruning skips files and loses no rows") {
    written
    val r = Seq(ZoneMap.ZoneRange("o_orderdate", "1996-01-01", "1996-12-31"))
    val pruned = ZoneMap.pruneFiles(spark, dir, r)
    assert(pruned.total >= 8, s"expected ~8 files, manifest has ${pruned.total}")
    assert(pruned.files.nonEmpty && pruned.files.size < pruned.total,
      s"a one-year slice of the range-clustered 1995-2001 span must skip files: " +
        s"${pruned.files.size}/${pruned.total}")
    val viaZone = ZoneMap.read(spark, dir, r)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val full = spark.read.parquet(sf("orders"))
      .filter(col("o_orderdate") >= "1996-01-01" &&
        col("o_orderdate") <= "1996-12-31")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(viaZone == full)
  }

  test("un-castable bounds and unknown zone columns fail loud") {
    written
    // a malformed date string vs the timestamp zone column would cast to
    // NULL, turn every manifest predicate NULL, and silently prune ALL
    // files — the failure mode must be an error, not an empty frame
    val bad = intercept[IllegalArgumentException] {
      ZoneMap.pruneFiles(spark, dir,
        Seq(ZoneMap.ZoneRange("o_orderdate", "not-a-date", null)))
    }
    assert(bad.getMessage.contains("not castable") ||
      bad.getMessage.contains("not-a-date"))
    // a zone column with no manifest stats is a caller error, same rule
    val missing = intercept[IllegalArgumentException] {
      ZoneMap.pruneFiles(spark, dir,
        Seq(ZoneMap.ZoneRange("o_nope", "a", "b")))
    }
    assert(missing.getMessage.contains("o_nope"))
  }

  test("open bounds and no-range degenerate to full reads") {
    written
    val all = spark.read.parquet(sf("orders")).count()
    assert(ZoneMap.read(spark, dir, Nil).count() == all)
    val open = ZoneMap.read(spark, dir,
      Seq(ZoneMap.ZoneRange("o_orderdate", "1998-06-01", null))).count()
    val expect = spark.read.parquet(sf("orders"))
      .filter(col("o_orderdate") >= "1998-06-01").count()
    assert(open == expect)
  }

  test("a range outside the data reads nothing, schema intact") {
    written
    val empty = ZoneMap.read(spark, dir,
      Seq(ZoneMap.ZoneRange("o_orderdate", "2199-01-01", "2199-12-31")))
    assert(empty.count() == 0)
    assert(empty.columns.contains("o_orderkey"))
  }
}
