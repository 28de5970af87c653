package graft.queries

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.core.Tables

/** UDF / typed-Aggregator / typed Dataset ops surface (SURVEY.md §2.11) —
  * reference: UDFRegistration.scala:63 (ScalaUDF), Aggregator.scala:54,
  * objects.scala (MapElements/MapGroups). The reference's untyped UDAF is
  * deprecated in Spark 4; `Aggregator` + `functions.udaf` is the modern
  * bridge and is what we exercise.
  */
object Extensibility extends QueryPack {

  /** Root-mean-square over doubles. Buffer sums are exact for the fixture's
    * integral quantities (squares < 2⁵³), so merge order cannot change the
    * result. */
  object RmsAgg extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), a: Double): (Double, Long) = (b._1 + a * a, b._2 + 1)
    def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) = (x._1 + y._1, x._2 + y._2)
    def finish(r: (Double, Long)): Double = math.sqrt(r._1 / r._2)
    def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  final case class Li(l_orderkey: Long, l_linenumber: Int,
                      l_extendedprice: Double, l_discount: Double)
  final case class Ord(o_custkey: Long, o_totalprice: Double)

  def queries: Seq[Q] = Seq(

    // SQL-language UDFs (SPARK-46246, Spark 4: CREATE FUNCTION … RETURN
    // <expression>) — reusable logic declared IN SQL, inlined by the
    // analyzer into the calling plan, so it stays inside codegen with
    // zero serialization cost (unlike a JVM/Python UDF). The oracle
    // inlines the same expression by hand — the function boundary must
    // be plan-invisible.
    Q("q_sql_udf",
      (s, dir) => {
        graft.core.Tables.registerViews(s, dir)
        s.sql("DROP TEMPORARY FUNCTION IF EXISTS graft_margin")
        // tight operand precisions ((10,2)·(5,2)·(5,2) → (22,6)) keep
        // the triple product exactly representable in EVERY engine — at
        // (12,2) operands the second multiply needs 40 digits and each
        // engine rounds the overflow differently (a cent of drift per
        // million rows). Discount/tax are rates in [0,1): (4,2) is exact.
        s.sql("""CREATE TEMPORARY FUNCTION graft_margin(
                   price DECIMAL(10,2), disc DECIMAL(4,2), tax DECIMAL(4,2))
                 RETURNS DECIMAL(22,6)
                 RETURN price * (1 - disc) * (1 + tax)""")
        // round() before the cast: both engines round half-away-from-
        // zero there, while CAST-to-lower-scale is half-up in Spark and
        // half-EVEN in the oracle engine — a cent of divergence on .5
        s.sql("""SELECT l_returnflag,
                   CAST(round(sum(graft_margin(l_extendedprice, l_discount, l_tax)), 2)
                     AS DOUBLE) AS charge
                 FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
      },
      Some("""SELECT l_returnflag,
                CAST(round(sum(CAST(l_extendedprice AS DECIMAL(10,2)) *
                         (1 - CAST(l_discount AS DECIMAL(4,2))) *
                         (1 + CAST(l_tax AS DECIMAL(4,2)))), 2)
                  AS DOUBLE) AS charge
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // SQL session VARIABLES (SPARK-46908: DECLARE / SET VAR / IDENTIFIER-
    // free reference) — statement-spanning parameters without string
    // interpolation; the variable folds to a literal at analysis, so the
    // plan is identical to writing the constant.
    Q("q_sql_variable",
      (s, dir) => {
        graft.core.Tables.registerViews(s, dir)
        s.sql("DECLARE OR REPLACE VARIABLE graft_min_qty DOUBLE DEFAULT 0.0")
        s.sql("""SET VAR graft_min_qty =
                 (SELECT avg(CAST(l_quantity AS DOUBLE)) FROM lineitem)""")
        s.sql("""SELECT l_returnflag, count(*) AS n_above
                 FROM lineitem WHERE l_quantity > graft_min_qty
                 GROUP BY l_returnflag ORDER BY l_returnflag""")
      },
      Some("""SELECT l_returnflag, count(*) AS n_above
              FROM lineitem
              WHERE l_quantity > (SELECT avg(CAST(l_quantity AS DOUBLE))
                                  FROM lineitem)
              GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // IDENTIFIER() clause (SPARK-43205, Spark 3.4/4): templated table and
    // column names from session variables WITHOUT string interpolation —
    // the SQL-injection-safe parameterization path (an identifier slot can
    // never smuggle a predicate). The oracle replays the resolved query.
    Q("q_sql_identifier",
      (s, dir) => {
        graft.core.Tables.registerViews(s, dir)
        s.sql("DECLARE OR REPLACE VARIABLE graft_tbl STRING DEFAULT 'lineitem'")
        s.sql("DECLARE OR REPLACE VARIABLE graft_col STRING DEFAULT 'l_returnflag'")
        s.sql("""SELECT IDENTIFIER(graft_col) AS flag, count(*) AS n
                 FROM IDENTIFIER(graft_tbl)
                 GROUP BY IDENTIFIER(graft_col)
                 ORDER BY flag""")
      },
      Some("""SELECT l_returnflag AS flag, count(*) AS n
              FROM lineitem GROUP BY l_returnflag ORDER BY flag""")),

    // Dataset.observe (SPARK-29345) — named metrics collected ON the
    // executors as a query runs, the monitoring surface a pipeline uses
    // to validate a batch without a second pass (row counts, null rates,
    // value ranges riding the main action). The observed values are
    // returned as the result row; the oracle recomputes them with plain
    // aggregates — observation must cost zero extra scans AND agree with
    // the direct computation.
    Q("q_observe",
      (s, dir) => {
        import org.apache.spark.sql.Observation
        val obs = Observation("batch_stats")
        val li = graft.core.Tables(s, dir, "lineitem")
          .observe(obs,
            count(lit(1)).as("n_rows"),
            sum(col("l_quantity")).cast("long").as("total_qty"),
            count(when(col("l_discount") > 0.05, 1)).as("n_discounted"))
        li.write.mode("overwrite").format("noop").save() // the main action
        val m = obs.get
        import s.implicits._
        Seq((m("n_rows").asInstanceOf[Long],
          m("total_qty").asInstanceOf[Long],
          m("n_discounted").asInstanceOf[Long]))
          .toDF("n_rows", "total_qty", "n_discounted")
      },
      Some("""SELECT count(*) AS n_rows,
                CAST(sum(l_quantity) AS BIGINT) AS total_qty,
                count(*) FILTER (l_discount > 0.05) AS n_discounted
              FROM lineitem""")),

    // Scala UDF through the registration path (ScalaUDF expression).
    Q("q_udf",
      (s, dir) => {
        s.udf.register("graft_rev", (x: String) => x.reverse)
        Tables(s, dir, "part").createOrReplaceTempView("part_udf")
        s.sql("""SELECT p_partkey, graft_rev(p_name) AS rev
                 FROM part_udf ORDER BY p_partkey""")
      },
      Some("SELECT p_partkey, reverse(p_name) AS rev FROM part ORDER BY p_partkey")),

    // Typed Aggregator via functions.udaf (partial/final merge across
    // partitions like any built-in agg).
    Q("q_udaf",
      (s, dir) => {
        val rms = udaf(RmsAgg)
        Tables(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(round(rms(col("l_quantity")), 6).as("rms_qty"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, round(sqrt(avg(l_quantity * l_quantity)), 6) AS rms_qty
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Typed map over a case-class Dataset (MapElements with encoders);
    // exact decimal rounding done in Scala to match SQL ROUND semantics.
    Q("q_typed_map",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
          .as[Li]
          .map { li =>
            // exact-decimal money math (parquet doubles hold exact 2-dec
            // values) so rounding is boundary-safe across engines
            val price = BigDecimal(li.l_extendedprice).setScale(2, BigDecimal.RoundingMode.HALF_UP)
            val disc = BigDecimal(li.l_discount).setScale(2, BigDecimal.RoundingMode.HALF_UP)
            val net = (price * (BigDecimal(1) - disc))
              .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
            (li.l_orderkey, li.l_linenumber, net)
          }
          .toDF("l_orderkey", "l_linenumber", "net")
          .orderBy("l_orderkey", "l_linenumber").limit(200)
      },
      Some("""SELECT l_orderkey, l_linenumber,
              CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) *
                         CAST(1 - l_discount AS DECIMAL(18,2)), 2) AS DOUBLE) AS net
              FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 200""")),

    // KeyValueGroupedDataset.mapGroups (typed per-group logic; MapGroupsExec).
    Q("q_typed_groups",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "orders")
          .select("o_custkey", "o_totalprice")
          .as[Ord]
          .groupByKey(_.o_custkey)
          .mapGroups { (k, it) =>
            var n = 0L; var mx = Double.MinValue
            it.foreach { o => n += 1; if (o.o_totalprice > mx) mx = o.o_totalprice }
            (k, n, mx)
          }
          .toDF("o_custkey", "n", "max_price")
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey, count(*) AS n, max(o_totalprice) AS max_price
              FROM orders GROUP BY o_custkey ORDER BY o_custkey""")),

    // SCRIPT TRANSFORM (§2.11, reference ScriptTransformation.scala:54 —
    // long listed as a non-goal, closeable after all): `TRANSFORM (…)
    // USING 'cat'` pipes each partition's rows tab-separated through an
    // external process and parses stdout back to rows
    // (SparkScriptTransformationExec; the Unix-filter escape hatch the
    // reference inherited from Hive). `cat` is the identity filter, so the
    // aggregate over the transformed stream must hash-equal the oracle's
    // direct aggregate — any framing/encoding bug in the pipe shows up as
    // a value diff. Keys ride as strings through the pipe and cast back,
    // proving the round-trip, not just the row count.
    Q("q_script_transform",
      (s, dir) => {
        Tables(s, dir, "orders").createOrReplaceTempView("orders_st_src")
        s.sql("""SELECT status, count(*) AS n,
                        CAST(sum(CAST(okey AS BIGINT)) AS BIGINT) AS sum_key
                 FROM (SELECT TRANSFORM (o_orderstatus, o_orderkey)
                       USING 'cat' AS (status STRING, okey STRING)
                       FROM orders_st_src)
                 GROUP BY status ORDER BY status""")
      },
      Some("""SELECT o_orderstatus AS status, count(*) AS n,
              CAST(sum(o_orderkey) AS BIGINT) AS sum_key
              FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))
  )
}
