package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Relational operator surface (SURVEY.md §2.1–2.8, verification ids §2.12).
  *
  * Declarative DataFrame/Dataset plans throughout — Catalyst handles filter
  * pushdown, column pruning, join selection (broadcast below the 10 MB
  * threshold, sort-merge beyond — reference join selection at
  * sql/core/.../execution/SparkStrategies.scala:111), and AQE re-planning.
  *
  * Scale notes per query are inline; the general posture: dimension sides of
  * joins are explicitly `broadcast(...)` when bounded (region/nation), large
  * joins stay shuffled equi-joins on their natural keys, aggregations are
  * partial+final (map-side combine) by construction.
  */
object Relational extends QueryPack {

  /** Exact money arithmetic: parquet doubles hold exact 2-decimal values, so
    * a cast to DECIMAL(18,2) is lossless and both engines agree bit-for-bit. */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def d(c: Column): Column = c.cast("double")

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** SQL-path query: same statement text runs on Spark SQL and DuckDB. */
  private def sqlQ(name: String, sql: String): Q =
    Q(name, (s, dir) => { Tables.registerViews(s, dir); s.sql(sql) }, Some(sql))

  def queries: Seq[Q] = Seq(

    // ---- scans / projection / filters --------------------------------------
    Q("q_scan",
      (s, dir) => t(s, dir, "lineitem").agg(count(lit(1)).as("n")),
      Some("SELECT count(*) AS n FROM lineitem")),

    Q("q_proj",
      (s, dir) => t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          d(dec(col("l_quantity")) * dec(col("l_extendedprice"))).as("amt"))
        .orderBy("l_orderkey", "l_linenumber").limit(100),
      Some("""SELECT l_orderkey, l_linenumber,
              CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS amt
              FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100""")),

    Q("q_filter",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber FROM lineitem
              WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
              ORDER BY l_orderkey, l_linenumber""")),

    Q("q_in",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_returnflag").isin("A", "R"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(*) AS n FROM lineitem
              WHERE l_returnflag IN ('A','R') GROUP BY l_returnflag ORDER BY l_returnflag""")),

    Q("q_null",
      (s, dir) => t(s, dir, "orders")
        .select(expr("coalesce(nullif(o_orderstatus,'O'),'X')").as("st"))
        .groupBy("st").agg(count(lit(1)).as("n")).orderBy("st"),
      Some("""SELECT coalesce(nullif(o_orderstatus,'O'),'X') AS st, count(*) AS n
              FROM orders GROUP BY 1 ORDER BY st""")),

    Q("q_case",
      (s, dir) => t(s, dir, "orders")
        .select(col("o_orderkey"),
          when(col("o_totalprice") > 100000, "hi")
            .when(col("o_totalprice") > 10000, "mid")
            .otherwise("lo").as("bucket"))
        .orderBy("o_orderkey").limit(500),
      Some("""SELECT o_orderkey,
              CASE WHEN o_totalprice > 100000 THEN 'hi'
                   WHEN o_totalprice > 10000 THEN 'mid' ELSE 'lo' END AS bucket
              FROM orders ORDER BY o_orderkey LIMIT 500""")),

    Q("q_cast",
      (s, dir) => t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("int").as("qty_int"),
          date_format(col("l_shipdate").cast("date"), "yyyy-MM-dd").as("ship"),
          col("l_orderkey").cast("string").as("ok_str"))
        .orderBy("l_orderkey", "l_linenumber").limit(100),
      Some("""SELECT l_orderkey, l_linenumber, CAST(l_quantity AS INTEGER) AS qty_int,
              strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS ship,
              CAST(l_orderkey AS VARCHAR) AS ok_str
              FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100""")),

    // ---- joins --------------------------------------------------------------
    // TPC-H Q3 skeleton. customer is the small side → broadcast; the
    // lineitem⋈orders equi-join shuffles on the order key (co-partitioned at
    // scale when both sides are bucketed by orderkey).
    Q("q_join_inner",
      (s, dir) => {
        val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .withColumn("odate", date_format(col("o_orderdate"), "yyyy-MM-dd"))
          .groupBy(col("l_orderkey"), col("odate"))
          .agg(d(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey")).limit(20)
          .select("l_orderkey", "odate", "revenue")
      },
      Some("""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS odate,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1-l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              WHERE c_mktsegment = 'BUILDING'
              GROUP BY 1, 2 ORDER BY revenue DESC, l_orderkey LIMIT 20""")),

    Q("q_join_outer",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy(c("c_custkey")).agg(count(o("o_orderkey")).as("n_orders"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders
              FROM customer LEFT JOIN orders ON c_custkey = o_custkey
              GROUP BY c_custkey ORDER BY c_custkey""")),

    Q("q_join_semi",
      (s, dir) => {
        val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        t(s, dir, "orders").join(c, col("o_custkey") === c("c_custkey"), "left_semi")
          .select("o_orderkey").orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey FROM orders
              WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
              ORDER BY o_orderkey""")),

    Q("q_join_anti",
      (s, dir) => {
        val o = t(s, dir, "orders")
        t(s, dir, "customer").join(o, col("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey").orderBy("c_custkey")
      },
      Some("""SELECT c_custkey FROM customer c
              WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
              ORDER BY c_custkey""")),

    // Non-equi θ-join: tiny×tiny → broadcast nested loop is the right plan.
    Q("q_join_theta",
      (s, dir) => {
        val r = t(s, dir, "region")
        val n = t(s, dir, "nation")
        n.join(broadcast(r), n("n_regionkey") < r("r_regionkey"))
          .agg(count(lit(1)).as("n"))
      },
      Some("SELECT count(*) AS n FROM nation JOIN region ON n_regionkey < r_regionkey")),

    Q("q_cross",
      (s, dir) => t(s, dir, "region").crossJoin(t(s, dir, "nation"))
        .agg(count(lit(1)).as("n")),
      Some("SELECT count(*) AS n FROM region CROSS JOIN nation")),

    // LATERAL correlated subquery (top-N per outer row). Spark decorrelates
    // the correlated ORDER BY + LIMIT into a partition-bounded window over
    // ONE shuffle of the inner side — the lateral never executes
    // per-outer-row, so the physical plan is the same rank-filter shape
    // q_window_rank hand-writes. Shared-SQL: DuckDB runs the identical
    // statement.
    sqlQ("q_join_lateral",
      """SELECT n_name, x.c_custkey, CAST(x.bal AS DOUBLE) AS bal
         FROM nation, LATERAL (
           SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
           FROM customer WHERE c_nationkey = n_nationkey
           ORDER BY bal DESC, c_custkey LIMIT 3) x
         ORDER BY n_name, bal DESC, c_custkey"""),

    // Fact⋈fact co-location via BUCKETED catalog tables: both sides written
    // bucketBy(8, orderkey).sortBy(orderkey) (reference FileSourceScanExec
    // bucketing, DataSourceScanExec.scala:141), so the sort-merge join reads
    // pre-partitioned buckets — NO Exchange on either side of the join
    // (verify via graft.Explain q_join_bucketed: both scans show
    // `Bucketed: true`, the SMJ has bare Sorts over the scans). This is
    // SCALE.md's warehouse upgrade for the 100 TB lineitem⋈orders path: the
    // shuffle happens once at write time, every subsequent join rides it.
    // The merge hint pins SMJ so the no-shuffle plan is what's exercised
    // even at oracle scale where broadcast would win on size. (The residual
    // in-partition Sort would also vanish under the legacy
    // bucketedTableScan.outputOrdering flag, SPARK-28595; not worth a
    // legacy knob — the Exchange is the scale cost, not the local sort.)
    Q("q_join_bucketed",
      (s, dir) => {
        // repartition on the bucket key first → exactly one file per bucket
        // (the layout the sorted-scan path needs, and fewer files at scale)
        t(s, dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
          .repartition(8, col("l_orderkey"))
          .write.mode("overwrite")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .option("path", graft.core.Scratch.dir("lineitem_bucketed"))
          .saveAsTable("lineitem_bucketed")
        t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
          .repartition(8, col("o_orderkey"))
          .write.mode("overwrite")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", graft.core.Scratch.dir("orders_bucketed"))
          .saveAsTable("orders_bucketed")
        val l = s.table("lineitem_bucketed")
        val o = s.table("orders_bucketed")
        l.hint("merge").join(o, l("l_orderkey") === o("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            d(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))).as("revenue"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1-l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // Salted join for extreme key skew: the fact side has only 3 distinct
    // join keys (l_returnflag), so a plain shuffle join sends each key to
    // ONE reducer. Salting fans each key over 8 shuffle buckets — fact rows
    // get salt = hash(row key) % 8, the small side is exploded ×8 — and the
    // join runs on (key, salt). Same rows, 8× the reduce parallelism per
    // hot key. This is the MANUAL skew lever; AQE's skew-join split is the
    // automatic one (SCALE.md) — both belong in the toolbox because AQE
    // only splits at partition granularity after the fact. The merge hint
    // keeps the demo on the shuffle path (broadcast would dodge the skew).
    Q("q_join_salted",
      (s, dir) => {
        val salts = 8
        val fact = t(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_quantity"), col("l_orderkey"))
          .withColumn("salt", pmod(xxhash64(col("l_orderkey")), lit(salts)))
        val dim = s.createDataFrame(Seq(("A", "returned"), ("N", "open"), ("R", "refused")))
          .toDF("flag", "disposition")
          .withColumn("salt", explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
        fact.hint("merge")
          .join(dim, fact("l_returnflag") === dim("flag") && fact("salt") === dim("salt"))
          .groupBy("disposition")
          .agg(count(lit(1)).as("n"), d(sum(dec(col("l_quantity")))).as("qty"))
          .orderBy("disposition")
      },
      Some("""SELECT disposition, count(*) AS n,
              CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
              FROM lineitem
              JOIN (VALUES ('A', 'returned'), ('N', 'open'), ('R', 'refused'))
                AS dim(flag, disposition) ON l_returnflag = flag
              GROUP BY disposition ORDER BY disposition""")),

    // DYNAMIC PARTITION PRUNING — the 100 TB warehouse feature this suite
    // still lacked: the fact table is WRITTEN partitioned by the join
    // column, the dimension carries a selective filter, and the planner
    // injects the dim's qualifying keys as a RUNTIME partition filter on
    // the fact scan (dynamicpruning#… in PartitionFilters — REQUIREd
    // in-query, so a silent fallback to a full fact scan fails the row).
    // At scale this is the difference between reading one partition and
    // reading the table; the broadcast exchange is REUSED as the pruning
    // subquery, so DPP costs nothing extra.
    // RUNTIME BLOOM-FILTER join pruning (Spark 3.3+ row-level runtime
    // filtering, InjectRuntimeFilter): a selective dim filter builds a
    // bloom sketch whose might_contain() probes the FACT side before the
    // shuffle — the row-level sibling of q_join_dpp's partition pruning,
    // and the mechanism that cuts shuffled bytes on non-partition keys at
    // 100 TB. Thresholds lowered so the rule fires at fixture scale; the
    // MERGE hint keeps a shuffle join (broadcast joins don't need the
    // filter). Injection REQUIREd in-plan; results are filter-invariant,
    // so the oracle is the plain join.
    Q("q_join_bloom",
      (s, dir) => {
        val prev = Seq(
          "spark.sql.optimizer.runtime.bloomFilter.enabled",
          "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
          "spark.sql.autoBroadcastJoinThreshold")
          .map(k => k -> s.conf.getOption(k)).toMap
        s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        s.conf.set(
          "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
        // the rule DECLINES a creation side it could broadcast instead
        // (broadcast hash joins filter for free) — at fixture scale every
        // dim is broadcastable, so disable auto-broadcast to exercise the
        // shuffle-join path the filter exists for
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try {
          graft.core.Tables.registerViews(s, dir)
          val joined = s.sql(
            """SELECT o.o_orderpriority,
                 count(*) AS n,
                 CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
               FROM lineitem l
               JOIN (SELECT * FROM orders
                     WHERE o_orderpriority = '1-URGENT'
                       AND o_totalprice > 150000) o
                 ON l.l_orderkey = o.o_orderkey
               GROUP BY o.o_orderpriority""")
          val plan = joined.queryExecution.optimizedPlan.toString
          require(plan.toLowerCase.contains("bloom"),
            s"the fact side must probe a runtime bloom filter:\n${plan.take(1500)}")
          joined
        } finally prev.foreach { case (k, v) =>
          v.fold(s.conf.unset(k))(s.conf.set(k, _))
        }
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000
              GROUP BY o_orderpriority""")),

    Q("q_join_dpp",
      (s, dir) => {
        // partitioned layout built once per (JVM, corpus dir) — the
        // operator under test is the dynamic-partition-pruned probe, not
        // the 25-partition write
        val out = graft.core.Scratch.layoutOnce(dir,
            "lineitem_part_dpp", "_SUCCESS") { o =>
          t(s, dir, "lineitem")
            .select((col("l_suppkey") % 25).as("l_nk"), col("l_orderkey"),
              col("l_quantity"), col("l_extendedprice"), col("l_discount"))
            .write.mode("overwrite").partitionBy("l_nk").parquet(o)
        }
        val fact = s.read.parquet(out)
        // the PRUNING side must be a real table SCAN with a selective
        // filter — the rule declines a filtered LocalRelation (found out
        // the hard way; an in-memory dim wants broadcast-join pruning,
        // which already reads nothing extra)
        val dim = t(s, dir, "nation").filter(col("n_name") === "NATION_3")
        val joined = fact.join(broadcast(dim), fact("l_nk") === dim("n_nationkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("n"),
            d(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))))
              .as("revenue"))
          .orderBy("n_name")
        val plan = joined.queryExecution.executedPlan.toString
        require(plan.contains("dynamicpruning"),
          s"the fact scan must carry a runtime partition filter:\n${plan.take(1200)}")
        joined
      },
      Some("""SELECT n_name, count(*) AS n,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                       (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
              FROM lineitem JOIN nation ON l_suppkey % 25 = n_nationkey
              WHERE n_name = 'NATION_3'
              GROUP BY n_name""")),

    // The AUTOMATIC complement to q_join_salted: the same hot-key shape left
    // UNSALTED, handled by AQE's OptimizeSkewedJoin at runtime (reference
    // SortMergeJoinExec.scala:35 has no such rescue — Spark 3+ re-plans from
    // map-stage sizes). 75% of lineitem rows collapse onto one join key, so
    // one shuffle partition carries ~24× the median; after the map stage AQE
    // splits it into advisory-sized slices, each merge-joining against a
    // replicated read of the dim side's matching partition. The detection
    // thresholds target cluster-scale partitions (256 MB default), so the
    // query pins fixture-scale values on an ISOLATED newSession (conf must
    // not leak into sibling queries); at 100 TB the defaults fire unaided.
    // The post-join groupBy is on a DIFFERENT key (g), which needs its own
    // Exchange regardless — so the skew split costs no extra shuffle and
    // AQE accepts it without forceOptimizeSkewedJoin. PlanShapeSpec asserts
    // skew=true on this exact query's executed plan.
    Q("q_join_skew_aqe",
      (s, dir) => {
        val s2 = s.newSession()
        s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // SMJ, not BHJ
        s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
        s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
        s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        // Two fixture-scale accommodations, both about SIZE not shape:
        // (1) a skewed reduce partition is split into MAPPER-granular
        // slices, so the hot key's bytes must arrive from >1 map task —
        // the fixture parquet is a single row group (one data-carrying
        // scan task); the round-robin repartition stands in for the
        // thousands of scan partitions a cluster read has naturally.
        // (2) shuffle compression flattens mild skew (a 24× row skew on
        // two near-constant columns measured only 2.0× in bytes), so the
        // hot key carries 90% of rows INCLUDING the incompressible
        // price/partkey columns — at cluster scale real payloads do this
        // on their own.
        val fact = Tables(s2, dir, "lineitem")
          .select(when(col("l_orderkey") % 10 =!= 0, lit(0L))
            .otherwise(col("l_orderkey") % 1000).as("k"),
            col("l_quantity"), col("l_extendedprice"), col("l_partkey"))
          .repartition(16)
        val dim = s2.range(1000).select(col("id").as("k"), (col("id") % 7).as("g"))
        fact.join(dim, "k")
          .groupBy("g")
          .agg(count(lit(1)).as("n"), d(sum(dec(col("l_quantity")))).as("qty"),
            d(sum(dec(col("l_extendedprice")))).as("rev"),
            sum(col("l_partkey")).cast("bigint").as("pk"))
          .orderBy("g")
      },
      Some("""SELECT g, count(*) AS n,
              CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev,
              CAST(sum(l_partkey) AS BIGINT) AS pk
              FROM (SELECT CASE WHEN l_orderkey % 10 <> 0 THEN 0
                                ELSE l_orderkey % 1000 END AS k,
                           l_quantity, l_extendedprice, l_partkey
                    FROM lineitem) f
              JOIN (SELECT range AS k, range % 7 AS g FROM range(0, 1000)) d
                USING (k)
              GROUP BY g ORDER BY g""")),

    // TPC-H Q5 shape: the 6-table star — fact⋈fact (lineitem⋈orders) rides
    // join selection (SMJ at scale, AQE re-plans), the dimension chain
    // (supplier/nation/region) is explicitly broadcast, customer is left to
    // the planner. Exercises multi-join reordering + broadcast chains, the
    // bread-and-butter 100 TB warehouse plan. Revenue in exact DECIMAL so
    // partial-aggregation order can't change the result.
    Q("q_join_star",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val ord = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val cust = t(s, dir, "customer")
        val sup = t(s, dir, "supplier")
        val nat = t(s, dir, "nation")
        val reg = t(s, dir, "region").filter(col("r_regionkey") < 3)
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg(d(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount"))))
            .as("revenue"), count(lit(1)).as("n"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                       CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
              count(*) AS n
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                AND o_orderdate < TIMESTAMP '1998-01-01'
                AND r_regionkey < 3
              GROUP BY n_name ORDER BY n_name""")),

    // TPC-H Q3 (shipping-priority): customer⋈orders⋈lineitem with selective
    // filters on both fact sides, revenue per unshipped order, top-10 by
    // revenue — the classic filter-pushdown + partial-agg + top-k shape
    // (TakeOrderedAndProject, never a global sort). Timestamps render as
    // strings per the determinism contract.
    Q("q_join_q3",
      (s, dir) => {
        val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val ord = t(s, dir, "orders")
          .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
            col("o_orderpriority"))
          .agg(d(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount"))))
            .as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
                o_orderpriority,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                         CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              WHERE c_mktsegment = 'BUILDING'
                AND o_orderdate < TIMESTAMP '1997-01-01'
                AND l_shipdate > TIMESTAMP '1997-01-01'
              GROUP BY l_orderkey, o_date, o_orderpriority
              ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    // TPC-H Q10 (returned-item reporting): revenue lost to returns per
    // customer over a quarter, top-20 — fact⋈fact join with a broadcast
    // dimension tail, the other canonical ad-hoc reporting shape.
    Q("q_join_q10",
      (s, dir) => {
        val ord = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        val cust = t(s, dir, "customer")
        val nat = t(s, dir, "nation")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .groupBy("c_custkey", "c_name", "n_name")
          .agg(d(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount"))))
            .as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name, n_name,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                         CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                AND o_orderdate < TIMESTAMP '1996-04-01'
                AND l_returnflag = 'R'
              GROUP BY c_custkey, c_name, n_name
              ORDER BY revenue DESC, c_custkey LIMIT 20""")),

    // TPC-H Q18 (large-volume customer): the HAVING subquery becomes a
    // semi-join against the per-order quantity aggregate — the same
    // lineitem feeds both the aggregate and the detail join, so the probe
    // side is bounded by the (selective) big-order keys before the
    // customer join; top-100 by order value plans as
    // TakeOrderedAndProject.
    // TPC-H Q7 shape (volume shipping): the DOUBLE-dimension join — the
    // same nation table joins twice under two aliases (supplier's nation
    // and customer's nation), so analysis must keep the attribute sets
    // apart; both tiny sides broadcast, facts stay the only shuffles.
    // Shared SQL: DuckDB runs the identical statement.
    sqlQ("q_tpch_q7",
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
         FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
         JOIN orders ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
         JOIN nation n1 ON s_nationkey = n1.n_nationkey
         JOIN nation n2 ON c_nationkey = n2.n_nationkey
         WHERE n1.n_name <> n2.n_name
           AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY n1.n_name, n2.n_name, EXTRACT(YEAR FROM l_shipdate)
         ORDER BY supp_nation, cust_nation, l_year"""),

    // TPC-H Q14 shape (promo revenue): conditional aggregation over a
    // fact⋈dim join with a tight date window — the filter must reach the
    // lineitem scan, part broadcasts. Ratio computed on DOUBLE casts of
    // the exact decimal sums so both engines divide identical IEEE values.
    sqlQ("q_tpch_q14",
      """SELECT CAST(round(100.0 *
             CAST(sum(CASE WHEN p_type = 'PROMO'
                      THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
                           (1 - CAST(l_discount AS DECIMAL(18,2)))
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE),
           4) AS DOUBLE) AS promo_revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00'"""),

    // TPC-H Q19 shape (discounted revenue): the DISJUNCTION of composite
    // brand/size/quantity predicates — the classic test of OR-predicate
    // handling (common join key stays an equi-join; per-branch residuals
    // evaluate post-join; CNF extraction can still push the shared
    // p_partkey/quantity bounds).
    sqlQ("q_tpch_q19",
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           count(*) AS n
         FROM lineitem JOIN part ON p_partkey = l_partkey
         WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
                AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#7' AND p_size BETWEEN 1 AND 10
                AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 20 AND 30)"""),

    // TPC-H Q22 shape (global sales opportunity): scalar AVG subquery as
    // the filter threshold + NOT EXISTS anti-join against orders — the
    // "rich customers who never ordered" pattern (correlated-existential
    // decorrelation into a left-anti join, threshold broadcast). The
    // fixture gives every customer ~10 orders, so the existential is
    // narrowed to URGENT orders to keep the anti-join non-degenerate
    // (~20% of priorities ⇒ ~10% of customers have none).
    sqlQ("q_tpch_q22",
      """WITH avg_bal AS (
           SELECT avg(CAST(c_acctbal AS DOUBLE)) AS ab
           FROM customer WHERE c_acctbal > 0.0)
         SELECT CAST(c_nationkey % 5 AS INT) AS cntry, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
         FROM customer, avg_bal
         WHERE CAST(c_acctbal AS DOUBLE) > ab
           AND NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderpriority = '1-URGENT')
         GROUP BY c_nationkey % 5
         ORDER BY cntry"""),

    // TPC-H Q4 shape (order-priority checking): correlated EXISTS whose
    // correlation mixes equality (l_orderkey = o_orderkey) with an
    // INEQUALITY on the correlated column (l_shipdate > o_orderdate) —
    // decorrelation must carry the non-equi conjunct into the semi-join
    // condition, not re-execute per row.
    sqlQ("q_tpch_q4",
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_shipdate > o_orderdate)
         GROUP BY o_orderpriority ORDER BY o_orderpriority"""),

    // TPC-H Q15 shape (top supplier): a derived revenue view consumed
    // TWICE — once as the join input, once under a scalar MAX — and the
    // equality filter on an exact DECIMAL aggregate (ties included by
    // definition, so the row set is deterministic without a LIMIT).
    sqlQ("q_tpch_q15",
      """WITH revenue AS (
           SELECT l_suppkey AS supplier_no,
             sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                 (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name,
           CAST(total_revenue AS DOUBLE) AS total_revenue
         FROM supplier JOIN revenue ON s_suppkey = supplier_no
         WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
         ORDER BY s_suppkey"""),

    // TPC-H Q6 (forecasting revenue change): the pure scan-side query —
    // range + BETWEEN + < predicates all pushed to the parquet scan, one
    // exact-decimal aggregate, no join, no shuffle beyond the final agg.
    sqlQ("q_tpch_q6",
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                     CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
           AND CAST(l_discount AS DOUBLE) BETWEEN 0.02 AND 0.06
           AND CAST(l_quantity AS DOUBLE) < 24"""),

    // TPC-H Q8 (national market share): the 8-table join — nation joined
    // TWICE under different roles (customer's for the region filter,
    // supplier's for the share), a conditional sum over exact decimals
    // ratioed against the group total, one double division at output.
    sqlQ("q_tpch_q8",
      """WITH allv AS (
           SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2)) *
               (1 - CAST(l_discount AS DECIMAL(18,2))) AS vol,
             n2.n_name AS supp_nation
           FROM part, supplier, lineitem, orders, customer,
                nation n1, nation n2, region
           WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
             AND l_orderkey = o_orderkey AND o_custkey = c_custkey
             AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
             AND s_nationkey = n2.n_nationkey
             AND r_name = 'EUROPE' AND p_name LIKE '%widget%')
         SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN vol
                               ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS DOUBLE) /
                 CAST(sum(vol) AS DOUBLE), 6) AS mkt_share
         FROM allv GROUP BY o_year ORDER BY o_year"""),

    // TPC-H Q11 shape (value concentration; no partsupp → supplier value
    // is lineitem revenue): a group aggregate compared against a SCALAR
    // fraction of the global total — the same corpus aggregated at two
    // granularities, the scalar side broadcast into the filter.
    sqlQ("q_tpch_q11",
      """WITH sv AS (
           SELECT l_suppkey,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS value
           FROM lineitem GROUP BY l_suppkey)
         SELECT l_suppkey, CAST(value AS DOUBLE) AS value FROM sv
         WHERE CAST(value AS DOUBLE) >
           (SELECT 0.0105 * CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                                 AS DOUBLE) FROM lineitem)
         ORDER BY value DESC, l_suppkey"""),

    // TPC-H Q12 shape (shipping-mode priority; no l_shipmode → group by
    // return flag): join + date window + the two complementary
    // conditional counts in one aggregate pass.
    sqlQ("q_tpch_q12",
      """SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                          OR o_orderpriority = '2-HIGH'
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT'
                         AND o_orderpriority <> '2-HIGH'
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
         FROM orders, lineitem
         WHERE o_orderkey = l_orderkey
           AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         GROUP BY l_returnflag ORDER BY l_returnflag"""),

    // TPC-H Q16 shape (parts/supplier relationship): COUNT DISTINCT over
    // a NOT IN-filtered join — the distinct-agg rewrite stacked on a
    // null-free anti-join, grouped by part attributes.
    sqlQ("q_tpch_q16",
      """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
         FROM part, lineitem
         WHERE p_partkey = l_partkey
           AND p_brand <> 'Brand#13' AND p_size IN (1, 2, 3, 4, 5)
           AND l_suppkey NOT IN
             (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
         GROUP BY p_brand, p_size
         ORDER BY supplier_cnt DESC, p_brand, p_size"""),

    // TPC-H Q20 shape (excess-share suppliers; no partsupp availqty →
    // the threshold is a share of the part's total shipped quantity): IN
    // over a GROUPED subquery whose HAVING carries a correlated scalar
    // aggregate on the group key — decorrelation inside decorrelation,
    // both folding to aggregates + joins.
    sqlQ("q_tpch_q20",
      """SELECT s_name, s_suppkey FROM supplier
         WHERE s_suppkey IN (
           SELECT l1.l_suppkey FROM lineitem l1, part
           WHERE l1.l_partkey = p_partkey AND p_name LIKE '%bolt%'
           GROUP BY l1.l_suppkey, l1.l_partkey
           HAVING CAST(sum(CAST(l1.l_quantity AS DECIMAL(18,2))) AS DOUBLE) >
             (SELECT 0.15 * CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,2)))
                                  AS DOUBLE)
              FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey))
         ORDER BY s_suppkey"""),

    // TPC-H Q2 shape (minimum-cost supplier; partsupp is absent from the
    // fixture so "cost" is the supplier's account balance and eligibility
    // is having shipped the part): a correlated scalar MIN subquery whose
    // equality correlation must decorrelate into a per-part aggregate
    // joined back — never a per-row re-execution.
    sqlQ("q_tpch_q2",
      """SELECT DISTINCT p_partkey, s_suppkey, s_name,
           CAST(s_acctbal AS DOUBLE) AS bal
         FROM part, supplier, lineitem
         WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
           AND p_size <= 2
           AND s_acctbal = (SELECT min(s2.s_acctbal)
                            FROM supplier s2, lineitem l2
                            WHERE l2.l_partkey = p_partkey
                              AND l2.l_suppkey = s2.s_suppkey)
         ORDER BY p_partkey, s_suppkey"""),

    // TPC-H Q9 shape (product-type profit; no partsupp → profit is the
    // discounted revenue): 4-table join with a non-anchored LIKE on the
    // part name (no pushable prefix — a residual filter after the
    // broadcast dim join), two-level grouping on (nation, year).
    sqlQ("q_tpch_q9",
      """SELECT n_name AS nation, CAST(year(l_shipdate) AS INT) AS o_year,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS profit
         FROM part, supplier, lineitem, nation
         WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
           AND s_nationkey = n_nationkey AND p_name LIKE '%gear%'
         GROUP BY n_name, year(l_shipdate)
         ORDER BY nation, o_year"""),

    // TPC-H Q13 (customer order-count distribution): LEFT OUTER join with
    // an EXTRA non-join predicate in the ON clause (it must filter the
    // right side only, never turn the join inner), then a histogram of
    // the per-customer counts — customers with zero orders count in the
    // c_count=0 bucket, the classic outer-join-preservation check.
    sqlQ("q_tpch_q13",
      """SELECT c_count, count(*) AS custdist FROM (
           SELECT c_custkey, count(o_orderkey) AS c_count
           FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
             AND o_orderpriority <> '1-URGENT'
           GROUP BY c_custkey) c_orders
         GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""),

    // TPC-H Q17 (small-quantity-order revenue): correlated AVG threshold —
    // each lineitem compares against 0.2× the mean quantity OF ITS PART.
    // The threshold is built from an exact DECIMAL sum divided once as
    // DOUBLE (engine-identical; a naive avg(DOUBLE) would accumulate in
    // engine-specific order). Decorrelates to a per-part aggregate + join.
    sqlQ("q_tpch_q17",
      """SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly
         FROM lineitem, part
         WHERE p_partkey = l_partkey AND p_brand = 'Brand#13'
           AND CAST(l_quantity AS DOUBLE) <
               (SELECT 0.2 * CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,2)))
                                  AS DOUBLE) / count(*)
                FROM lineitem l2 WHERE l2.l_partkey = p_partkey)"""),

    // TPC-H Q21 shape (suppliers who kept orders waiting; the fixture has
    // no commit/receipt dates so "late" is shipping after the order
    // date): the hardest decorrelation in the suite — an EXISTS and a
    // NOT EXISTS over the SAME fact self-join, the NOT EXISTS correlating
    // on BOTH the outer lineitem (l_orderkey, <> l_suppkey) AND a column
    // of a third table (o_orderdate) — must lower to one semi- and one
    // anti-join against per-order aggregates of the self-joined fact.
    sqlQ("q_tpch_q21",
      """SELECT s_name, count(*) AS numwait
         FROM supplier, lineitem l1, orders
         WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
           AND o_orderstatus = 'F'
           AND l1.l_shipdate > o_orderdate
           AND EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_shipdate > o_orderdate)
         GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20"""),

    // NOT IN (subquery) — the NULL-AWARE anti-join (reference
    // BroadcastHashJoinExec's isNullAwareAntiJoin lineage): one branch
    // over a null-free subquery behaves like a plain anti-join; the other
    // nullif-injects a NULL into the subquery, where three-valued logic
    // makes NOT IN never-true and the count collapses to 0 — the classic
    // SQL trap, pinned as data so neither engine can silently "fix" it.
    sqlQ("q_join_notin",
      """SELECT
           (SELECT count(*) FROM customer
            WHERE c_nationkey NOT IN
              (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)) AS n_no_null,
           (SELECT count(*) FROM customer
            WHERE c_nationkey NOT IN
              (SELECT nullif(n_nationkey, 12) FROM nation
               WHERE n_regionkey = 2)) AS n_with_null"""),

    Q("q_join_q18",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val bigOrders = li.groupBy("l_orderkey")
          .agg(d(sum(dec(col("l_quantity")))).as("total_qty"))
          .filter(col("total_qty") > 200.0)
          .select(col("l_orderkey").as("big_okey"))
        val ord = t(s, dir, "orders")
          .join(bigOrders, col("o_orderkey") === col("big_okey"), "left_semi")
        val cust = t(s, dir, "customer")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy("c_name", "c_custkey", "o_orderkey", "o_totalprice")
          .agg(d(sum(dec(col("l_quantity")))).as("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
      },
      Some("""SELECT c_name, c_custkey, o_orderkey,
                CAST(o_totalprice AS DOUBLE) AS o_totalprice,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
              FROM customer
              JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
              WHERE o_orderkey IN (
                SELECT l_orderkey FROM lineitem
                GROUP BY l_orderkey
                HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 200)
              GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""")),

    // TPC-DS q67 SHAPE (reference sql/core/src/test/resources/tpcds/q67.sql):
    // top-N-per-category across a ROLLUP hierarchy — the fact joins its
    // dims (part auto-broadcasts under the threshold), ROLLUP(type, brand,
    // year) aggregates every hierarchy level in ONE Expand + ONE hash
    // aggregate (no per-level re-scan), then rank() partitioned by the TOP
    // level ranks each category's rows ACROSS levels and keeps rk <= 3.
    // Plan note — the single-sort window strategy: the window adds exactly
    // one Exchange(hash p_type) + local sort by sumsales; rank needs no
    // global order, and the final ORDER BY is a separate sort of the tiny
    // rk-filtered result, so the fact table is shuffled once for the
    // rollup and once for the window, never globally sorted. SQL-path on
    // purpose (same text runs on both engines) — the Dataset-API rollup→
    // window composition over a multi-join trips Spark 4's ambiguous-
    // self-join detector on the Expand's duplicated attribute lineage.
    sqlQ("q_join_ds67",
      """WITH agg AS (
           SELECT p_type, p_brand, CAST(year(o_orderdate) AS INTEGER) AS o_year,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sumsales,
             CAST(grouping(p_type) AS INTEGER) AS g1,
             CAST(grouping(p_brand) AS INTEGER) AS g2,
             CAST(grouping(CAST(year(o_orderdate) AS INTEGER)) AS INTEGER) AS g3
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN part ON l_partkey = p_partkey
           WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             AND o_orderdate < TIMESTAMP '1998-01-01'
           GROUP BY ROLLUP(p_type, p_brand, CAST(year(o_orderdate) AS INTEGER))),
         ranked AS (
           SELECT *, CAST(rank() OVER (PARTITION BY p_type
             ORDER BY sumsales DESC) AS INTEGER) AS rk FROM agg)
         SELECT coalesce(p_type, 'ALL') AS ptype,
           coalesce(p_brand, 'ALL') AS brand,
           coalesce(o_year, -1) AS yr, g1, g2, g3, sumsales, rk
         FROM ranked WHERE rk <= 3
         ORDER BY ptype, g2, g3, brand, yr, rk"""),

    // The TPC-DS q88 reporting shape: N independent (band × predicate)
    // cells over one fact table — q88 writes it as 8 single-count
    // subqueries cross-joined into one row, i.e. 8 scans. The scale-right
    // plan is ONE scan with conditional aggregation (ANSI FILTER), which
    // partial-aggregates map-side to a single 8-column row per task —
    // at 100 TB the difference between reading the corpus once and 8
    // times. Plan-asserted: one lineitem scan, no join anywhere.
    sqlQ("q_agg_ds88",
      """SELECT
           count(*) FILTER (WHERE l_quantity >= 1  AND l_quantity < 7
                              AND l_discount >= 0.02) AS h1,
           count(*) FILTER (WHERE l_quantity >= 7  AND l_quantity < 13
                              AND l_discount <= 0.08) AS h2,
           count(*) FILTER (WHERE l_quantity >= 13 AND l_quantity < 19
                              AND l_discount >= 0.04) AS h3,
           count(*) FILTER (WHERE l_quantity >= 19 AND l_quantity < 25
                              AND l_discount <= 0.06) AS h4,
           count(*) FILTER (WHERE l_quantity >= 25 AND l_quantity < 31
                              AND l_discount >= 0.01) AS h5,
           count(*) FILTER (WHERE l_quantity >= 31 AND l_quantity < 37
                              AND l_discount <= 0.09) AS h6,
           count(*) FILTER (WHERE l_quantity >= 37 AND l_quantity < 43
                              AND l_discount >= 0.03) AS h7,
           count(*) FILTER (WHERE l_quantity >= 43 AND l_quantity <= 50
                              AND l_discount <= 0.07) AS h8
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'"""),

    // ---- aggregation --------------------------------------------------------
    // TPC-H Q1: partial/final hash aggregation; exact decimal money math.
    Q("q_agg",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1999-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          d(sum(dec(col("l_quantity")))).as("sum_qty"),
          d(sum(dec(col("l_extendedprice")))).as("sum_base"),
          d(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))).as("sum_disc"),
          d(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")) * dec(lit(1) + col("l_tax")))).as("sum_charge"),
          (d(sum(dec(col("l_quantity")))) / count(lit(1))).as("avg_qty"),
          (d(sum(dec(col("l_extendedprice")))) / count(lit(1))).as("avg_price"),
          (d(sum(dec(col("l_discount")))) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
              CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1-l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1-l_discount AS DECIMAL(18,2)) * CAST(1+l_tax AS DECIMAL(18,2))) AS DOUBLE) AS sum_charge,
              CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
              CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
              count(*) AS n
              FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-01'
              GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""")),

    Q("q_agg_distinct",
      (s, dir) => t(s, dir, "lineitem")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          countDistinct(col("l_returnflag"), col("l_linestatus")).as("n_fs")),
      Some("""SELECT count(DISTINCT l_suppkey) AS n_supp, count(DISTINCT l_partkey) AS n_part,
              count(DISTINCT (l_returnflag, l_linestatus)) AS n_fs FROM lineitem""")),

    Q("q_rollup",
      (s, dir) => t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(d(sum(dec(col("l_quantity")))).as("sum_qty"), count(lit(1)).as("n"),
          grouping(col("l_returnflag")).cast("int").as("g1"),
          grouping(col("l_linestatus")).cast("int").as("g2"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("g1"), col("g2"), col("sum_qty"), col("n"))
        .orderBy("rf", "ls", "g1", "g2"),
      Some("""SELECT coalesce(l_returnflag,'ALL') AS rf, coalesce(l_linestatus,'ALL') AS ls,
              CAST(grouping(l_returnflag) AS INTEGER) AS g1, CAST(grouping(l_linestatus) AS INTEGER) AS g2,
              CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, count(*) AS n
              FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
              ORDER BY rf, ls, g1, g2""")),

    Q("q_cube",
      (s, dir) => t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          grouping(col("l_returnflag")).cast("int").as("g1"),
          grouping(col("l_linestatus")).cast("int").as("g2"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("g1"), col("g2"), col("n"))
        .orderBy("rf", "ls", "g1", "g2"),
      Some("""SELECT coalesce(l_returnflag,'ALL') AS rf, coalesce(l_linestatus,'ALL') AS ls,
              CAST(grouping(l_returnflag) AS INTEGER) AS g1, CAST(grouping(l_linestatus) AS INTEGER) AS g2,
              count(*) AS n
              FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
              ORDER BY rf, ls, g1, g2""")),

    sqlQ("q_gsets",
      """SELECT coalesce(l_returnflag,'ALL') AS rf, coalesce(l_linestatus,'ALL') AS ls,
         CAST(grouping(l_returnflag) AS INTEGER) AS g1, CAST(grouping(l_linestatus) AS INTEGER) AS g2,
         count(*) AS n
         FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus))
         ORDER BY rf, ls, g1, g2"""),

    Q("q_having",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n"), d(sum(dec(col("l_quantity")))).as("qty"))
        .filter(col("n") > 600)
        .orderBy("l_suppkey"),
      Some("""SELECT l_suppkey, count(*) AS n,
              CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
              FROM lineitem GROUP BY l_suppkey HAVING count(*) > 600 ORDER BY l_suppkey""")),

    // ---- window functions ---------------------------------------------------
    Q("q_window_rank",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            row_number().over(w).as("rn"), rank().over(w).as("rk"),
            dense_rank().over(w).as("drk"))
          .filter(col("rn") <= 3)
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, rn, rk, drk FROM (
                SELECT o_custkey, o_orderkey,
                       row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk
                FROM orders
                WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey))
              WHERE rn <= 3 ORDER BY o_custkey, rn""")),

    Q("q_window_frame",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            d(sum(dec(col("o_totalprice"))).over(w)).as("running"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
              FROM orders ORDER BY o_custkey, o_orderkey""")),

    Q("q_window_leadlag",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
        t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            lag(col("o_totalprice"), 1).over(w).as("prev"),
            lead(col("o_totalprice"), 1).over(w).as("nxt"),
            ntile(4).over(w).as("nt"),
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
              lag(o_totalprice, 1) OVER w AS prev, lead(o_totalprice, 1) OVER w AS nxt,
              ntile(4) OVER w AS nt, percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
              FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
              ORDER BY o_custkey, o_orderkey""")),

    // ---- sort / limit / top-k ----------------------------------------------
    // ORDER BY + LIMIT plans as TakeOrderedAndProject: per-partition bounded
    // heap, then merge — no global sort at any scale.
    Q("q_sort_limit",
      (s, dir) => t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_totalprice").limit(10),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")),

    // LIMIT + OFFSET pagination (Dataset.offset / SQL OFFSET): page 3 of
    // the price ranking. Spark plans the pair as one global limit of
    // offset+limit rows with the offset dropped at the driver — the
    // result-page idiom; deep offsets stay O(offset+limit), which is why
    // search-style serving keys pages on (score, id) cursors instead.
    Q("q_offset",
      (s, dir) => t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_totalprice").offset(20).limit(10),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 20""")),

    // ---- set operations ------------------------------------------------------
    Q("q_union",
      (s, dir) => t(s, dir, "customer").select(col("c_nationkey").as("k"))
        .union(t(s, dir, "supplier").select(col("s_nationkey").as("k")))
        .distinct().orderBy("k"),
      Some("""SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey FROM supplier ORDER BY k""")),

    Q("q_union_all",
      (s, dir) => t(s, dir, "customer").select(col("c_nationkey").as("k"))
        .union(t(s, dir, "supplier").select(col("s_nationkey").as("k")))
        .groupBy("k").agg(count(lit(1)).as("n")).orderBy("k"),
      Some("""SELECT k, count(*) AS n FROM (
                SELECT c_nationkey AS k FROM customer UNION ALL SELECT s_nationkey FROM supplier)
              GROUP BY k ORDER BY k""")),

    Q("q_intersect",
      (s, dir) => t(s, dir, "customer").select(col("c_nationkey").as("k"))
        .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("k")))
        .orderBy("k"),
      Some("""SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier ORDER BY k""")),

    Q("q_except",
      (s, dir) => t(s, dir, "customer").select(col("c_nationkey").as("k"))
        .except(t(s, dir, "supplier").select(col("s_nationkey").as("k")))
        .orderBy("k"),
      Some("""SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier ORDER BY k""")),

    Q("q_distinct",
      (s, dir) => t(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
              ORDER BY l_returnflag, l_linestatus""")),

    // ---- subqueries / CTE ----------------------------------------------------
    sqlQ("q_subq_scalar",
      """SELECT o_orderkey FROM orders
         WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
         ORDER BY o_orderkey LIMIT 100"""),

    sqlQ("q_subq_corr",
      """SELECT c_custkey FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
         ORDER BY c_custkey"""),

    sqlQ("q_cte",
      """WITH t AS (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey)
         SELECT a.n AS n, count(*) AS pairs
         FROM t a JOIN t b ON a.n = b.n AND a.o_custkey < b.o_custkey
         GROUP BY a.n ORDER BY n"""),

    // WITH RECURSIVE (Spark 4 capability, SPARK-24497): the recursion is a
    // driver-coordinated loop of small union steps — here it only GENERATES
    // the 12-row month spine, so all corpus-scale work stays in the one
    // aggregation over orders and the 12-row side broadcasts into the join.
    // At 100 TB the recursive seed stays bounded (a calendar, an org chart,
    // a path frontier) while the fact side never re-scans per iteration.
    sqlQ("q_cte_recursive",
      """WITH RECURSIVE m(mo) AS (SELECT 1 UNION ALL SELECT mo + 1 FROM m WHERE mo < 12)
         SELECT mo, count(o_orderkey) AS n
         FROM m LEFT JOIN orders ON month(o_orderdate) = mo
         GROUP BY mo ORDER BY mo"""),

    // SQL PIPE syntax (Spark 4, SPARK-49555 — the |> operator chain): the
    // same logical plan as the ANSI form (the parser desugars each stage),
    // so pushdown/pruning/agg selection are identical; the oracle IS the
    // ANSI equivalent, proving the two surfaces agree.
    Q("q_sql_pipe",
      (s, dir) => {
        Tables.registerViews(s, dir)
        s.sql("""FROM orders
                 |> WHERE o_orderstatus = 'O'
                 |> AGGREGATE count(*) AS n,
                      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
                    GROUP BY o_orderpriority
                 |> ORDER BY o_orderpriority""")
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
              FROM orders WHERE o_orderstatus = 'O'
              GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // Parameterized SQL (named parameter markers, SPARK-41271): the query
    // text carries `:status`, the value binds at parse time — the
    // SQL-injection-safe template API. Oracle inlines the same literal.
    Q("q_sql_params",
      (s, dir) => {
        Tables.registerViews(s, dir)
        s.sql(
          """SELECT o_orderpriority, count(*) AS n FROM orders
             WHERE o_orderstatus = :status
             GROUP BY o_orderpriority ORDER BY o_orderpriority""",
          Map("status" -> "F"))
      },
      Some("""SELECT o_orderpriority, count(*) AS n FROM orders
              WHERE o_orderstatus = 'F'
              GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- pivot ---------------------------------------------------------------
    Q("q_pivot",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        val n = t(s, dir, "nation")
        o.join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy("n_name")
          .pivot("o_orderpriority", Seq("1-URGENT", "2-HIGH", "3-MEDIUM"))
          .agg(count(lit(1)))
          .na.fill(0)
          .select(col("n_name"), col("1-URGENT").as("p_urgent"),
            col("2-HIGH").as("p_high"), col("3-MEDIUM").as("p_medium"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name,
              count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p_urgent,
              count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS p_high,
              count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p_medium
              FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              GROUP BY n_name ORDER BY n_name""")),

    // UNPIVOT — pivot's inverse (wide measures → long (measure, value)
    // rows). The Dataset `unpivot` API plans as the same Expand operator
    // grouping sets use: one pass over the (already tiny, post-aggregate)
    // input, each row emitted once per measure — no shuffle, no join.
    // Sums are exact DECIMAL before the common-type cast to DOUBLE, so both
    // engines convert the same 2-decimal value and hashes match.
    Q("q_unpivot",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(sum(dec(col("l_quantity"))).as("q"),
          sum(dec(col("l_extendedprice"))).as("p"),
          sum(dec(col("l_discount"))).as("disc"))
        .select(col("l_returnflag"), d(col("q")).as("sum_qty"),
          d(col("p")).as("sum_price"), d(col("disc")).as("sum_disc"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
          "measure", "value")
        .orderBy("l_returnflag", "measure"),
      Some("""SELECT l_returnflag, measure, value FROM (
                SELECT l_returnflag,
                       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
                       CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc
                FROM lineitem GROUP BY l_returnflag)
              UNPIVOT (value FOR measure IN (sum_qty, sum_price, sum_disc))
              ORDER BY l_returnflag, measure""")),

    // ---- inline table / sample ------------------------------------------------
    Q("q_values",
      (s, dir) => s.sql("SELECT * FROM VALUES (1,'a'),(2,'b'),(3,'c') AS t(id, s) ORDER BY id"),
      Some("SELECT * FROM (VALUES (1,'a'),(2,'b'),(3,'c')) AS t(id, s) ORDER BY id")),

    // Seeded Bernoulli sample: RNGs differ across engines, so the check is a
    // bound on the sampled fraction, not a hash match.
    Q("q_sample",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val total = li.agg(count(lit(1)).as("t"))
        li.sample(withReplacement = false, 0.1, 42)
          .agg(count(lit(1)).as("got"))
          .crossJoin(total)
          .select((col("got") >= col("t") * 0.07 && col("got") <= col("t") * 0.13).as("ok"))
      },
      Some("SELECT true AS ok")),

    // ---- stats helpers (§2.11, reference DataFrameStatFunctions.scala:
    // 66–224: crosstab, freqItems, sampleBy, approxQuantile). crosstab is
    // a deterministic contingency table, oracled cell-by-cell. The other
    // three return driver-side or randomized results, so — like q_sample /
    // q_approx — their CONTRACTS are asserted inside the query and the
    // oracle pins the must-hold booleans: freqItems(support) finds every
    // value with frequency > support·n; a seeded stratified sample lands
    // within wide bounds of fraction·stratum; approxQuantile at
    // relativeError=0 returns a true p-quantile element (count(≤q) ≥ p·n
    // and count(<q) ≤ p·n). The collects are the APIs' own shape — these
    // helpers RETURN driver values (Array[Double], a 1-row frame) — over
    // 1-to-3-row aggregates, never the corpus.
    Q("q_stats_helpers",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val orders = t(s, dir, "orders")
        val statusCounts = orders.groupBy("o_orderstatus").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        val total = statusCounts.values.sum
        // freqItems: every truly-frequent value must be found
        val trueFreq = statusCounts.filter(_._2 > 0.3 * total).keySet
        val items = orders.stat.freqItems(Array("o_orderstatus"), 0.3)
          .collect()(0).getSeq[String](0).toSet
        val freqOk = trueFreq.nonEmpty && trueFreq.subsetOf(items)
        // sampleBy: seeded per-stratum fractions, counts within ±50%
        val fractions = Map("O" -> 0.2, "F" -> 0.2, "P" -> 0.5)
        val sampled = orders.stat.sampleBy("o_orderstatus", fractions, 42L)
          .groupBy("o_orderstatus").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        val sampleOk = fractions.forall { case (k, f) =>
          val exp = f * statusCounts.getOrElse(k, 0L)
          val got = sampled.getOrElse(k, 0L).toDouble
          got >= exp * 0.5 && got <= exp * 1.5
        }
        // approxQuantile(relativeError=0): exact order statistics
        val probs = Array(0.25, 0.5, 0.75)
        val qs = orders.stat.approxQuantile("o_totalprice", probs, 0.0)
        val rankAggs = probs.indices.flatMap(i => Seq(
          sum(when(col("o_totalprice") <= qs(i), 1L).otherwise(0L)).as(s"le$i"),
          sum(when(col("o_totalprice") < qs(i), 1L).otherwise(0L)).as(s"lt$i")))
        val ranks = orders.agg(rankAggs.head, rankAggs.tail: _*).collect()(0)
        val quantileOk = probs.indices.forall { i =>
          ranks.getLong(2 * i) >= probs(i) * total &&
            ranks.getLong(2 * i + 1) <= probs(i) * total
        }
        orders.stat.crosstab("o_orderstatus", "o_orderpriority")
          .withColumn("freq_ok", lit(freqOk))
          .withColumn("sample_ok", lit(sampleOk))
          .withColumn("quantile_ok", lit(quantileOk))
          .orderBy("o_orderstatus_o_orderpriority")
      },
      Some("""SELECT o_orderstatus AS o_orderstatus_o_orderpriority,
                count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS "1-URGENT",
                count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS "2-HIGH",
                count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
                count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS "4-NOT SPECIFIED",
                count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS "5-LOW",
                true AS freq_ok, true AS sample_ok, true AS quantile_ok
              FROM orders GROUP BY 1 ORDER BY 1""")),

    // PROBABILISTIC SKETCHES (reference DataFrameStatFunctions.scala:
    // countMinSketch :365, bloomFilter :419). Sketch contents are
    // seed/implementation-specific, so the CORRECTNESS row asserts the
    // structures' mathematical contracts instead of bytes: CountMin never
    // undercounts and overcounts ≤ eps·N; Bloom has NO false negatives
    // and a bounded observed false-positive rate. The sketches are the
    // 100 TB tool here (fixed-size mergeable state vs a corpus-sized
    // groupBy); the driver-side checks are test scaffolding, key-capped.
    Q("q_stats_sketch",
      (s, dir) => {
        val orders = t(s, dir, "orders")
        val n = orders.count()
        val cms = orders.stat.countMinSketch(col("o_orderstatus"),
          eps = 0.01, confidence = 0.99, seed = 42)
        val exact = orders.groupBy("o_orderstatus").count().collect()
          .map(r => r.getString(0) -> r.getLong(1))
        val cmsOk = exact.forall { case (k, c) =>
          val est = cms.estimateCount(k)
          est >= c && est <= c + math.ceil(0.01 * n).toLong
        }
        val bf = orders.stat.bloomFilter(col("o_custkey"),
          expectedNumItems = n, fpp = 0.03)
        val present = orders.select("o_custkey").distinct()
          .limit(2000).collect().map(_.getLong(0))
        val noFalseNeg = present.forall(bf.mightContain)
        // keys far above any generated custkey range
        val absent = (1000000000L until 1000002000L)
        val fpRate = absent.count(bf.mightContain).toDouble / absent.size
        import s.implicits._
        Seq((cmsOk, noFalseNeg, fpRate <= 0.1))
          .toDF("cms_ok", "no_false_neg", "fpp_ok")
      },
      Some("SELECT true AS cms_ok, true AS no_false_neg, true AS fpp_ok")),

    // KMV / THETA-SKETCH set cardinality (Beyer et al. 2007; theta-sketch
    // set algebra): the estimate HLL cannot give — INTERSECTION
    // cardinality between two key sets without joining them (overlap
    // planning for dedup/decontamination at corpus scale: two k-row
    // sketches meet instead of two corpora). The 60-bit md5-prefix hash
    // computes identically in both engines, so unlike an opaque HLL blob
    // every estimate replays EXACTLY in the oracle; the row also carries
    // the true intersection for the accuracy narrative (k=256 → ~6% s.e.;
    // here customer ⊇ orders custkeys, so est_inter tracks the orders
    // side). Sketch plan: distinct + TakeOrderedAndProject (per-partition
    // k-heap) — bounded state at any size.
    Q("q_stats_kmv",
      (s, dir) => {
        import graft.ops.Kmv
        val k = 256
        val ska = Kmv.sketch(t(s, dir, "orders"), "o_custkey", k)
        val skb = Kmv.sketch(t(s, dir, "customer"), "c_custkey", k)
        val est = Kmv.setEstimates(ska, skb, k)
        val exact = t(s, dir, "orders").select(col("o_custkey").as("ck"))
          .distinct()
          .join(t(s, dir, "customer").select(col("c_custkey").as("ck")), "ck")
          .agg(count(lit(1)).as("exact_inter"))
        est.crossJoin(exact)
      },
      Some("""WITH ha AS (SELECT DISTINCT
                 ('0x' || substr(md5(o_custkey::VARCHAR), 1, 15))::BIGINT AS h
               FROM orders),
              hb AS (SELECT DISTINCT
                 ('0x' || substr(md5(c_custkey::VARCHAR), 1, 15))::BIGINT AS h
               FROM customer),
              ska AS (SELECT h FROM ha ORDER BY h LIMIT 256),
              skb AS (SELECT h FROM hb ORDER BY h LIMIT 256),
              merged AS (SELECT h FROM
                (SELECT h FROM ska UNION SELECT h FROM skb)
                ORDER BY h LIMIT 256),
              st AS (SELECT count(*) AS n, max(h) AS th FROM merged),
              mm AS (SELECT count(*) AS m FROM ska JOIN skb USING (h), st
                     WHERE h < th),
              mall AS (SELECT count(*) AS m_all FROM ska JOIN skb USING (h)),
              exact AS (SELECT count(*) AS exact_inter FROM
                (SELECT DISTINCT o_custkey FROM orders) o
                JOIN (SELECT c_custkey FROM customer) c
                  ON o.o_custkey = c.c_custkey)
              SELECT
                CAST(CASE WHEN n < 256 THEN n ELSE
                  floor(255.0 * 1152921504606846976 / th) END AS BIGINT)
                  AS est_union,
                CAST(CASE WHEN n < 256 THEN m_all ELSE
                  floor(m * 1152921504606846976.0 / th) END AS BIGINT)
                  AS est_inter,
                n < 256 AS exact,
                exact_inter
              FROM st, mm, mall, exact""")),

    // SQL SCRIPTING (Spark 4, SQL/PSM BEGIN…END: variables, WHILE loop) —
    // procedural control flow around ordinary queries; the script's last
    // statement is the result. The oracle states the loop's closed form.
    Q("q_sql_scripting",
      (s, dir) => {
        graft.core.Tables.registerViews(s, dir)
        s.conf.set("spark.sql.scripting.enabled", "true")
        s.sql("""BEGIN
                   DECLARE total BIGINT DEFAULT 0;
                   DECLARE i INT DEFAULT 1;
                   WHILE i <= 3 DO
                     SET total = total +
                       (SELECT count(*) FROM lineitem WHERE l_linenumber = i);
                     SET i = i + 1;
                   END WHILE;
                   SELECT total AS n3;
                 END""")
      },
      Some("""SELECT count(*) AS n3 FROM lineitem WHERE l_linenumber <= 3""")),

    // ---- repartition / coalesce (plan-shape ops; result is count-stable) ------
    Q("q_repartition",
      (s, dir) => t(s, dir, "lineitem")
        .repartition(8, col("l_orderkey"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(*) AS n FROM lineitem
              GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // SQL JOIN HINTS (§2.8): /*+ MERGE(n) */ forces a sort-merge join
    // where the planner would otherwise broadcast the 25-row dimension —
    // the hint provably overrides the cost-based choice (plan-asserted in
    // PlanShapeSpec, with the unhinted control broadcasting). Results are
    // join-strategy-invariant, so the oracle is the plain join.
    Q("q_hint",
      (s, dir) => {
        graft.core.Tables.registerViews(s, dir)
        s.sql("""SELECT /*+ MERGE(n) */ n.n_name, count(*) AS n_cust
                 FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                 GROUP BY n.n_name ORDER BY n.n_name""")
      },
      Some("""SELECT n_name, count(*) AS n_cust
              FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
              GROUP BY n_name ORDER BY n_name""")),

    // Hive-style DISTRIBUTE BY / SORT BY (§2.8 SQL syntax): repartition by
    // expression + partition-LOCAL sort. The result SET is partitioning-
    // invariant; the outer aggregate + ORDER BY pins the compared rows.
    Q("q_distribute_by",
      (s, dir) => {
        graft.core.Tables.registerViews(s, dir)
        s.sql("""SELECT l_returnflag, count(*) AS n FROM (
                   SELECT * FROM lineitem
                   DISTRIBUTE BY l_returnflag SORT BY l_orderkey)
                 GROUP BY l_returnflag ORDER BY l_returnflag""")
      },
      Some("""SELECT l_returnflag, count(*) AS n FROM lineitem
              GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- DDL / command surface (§2.1: CREATE TABLE AS / INSERT / DROP,
    // reference execution/command/{tables,ddl}.scala). A catalog table is
    // created from a SELECT, extended by INSERT INTO (both a SELECT feed and
    // a VALUES feed), and the read-back aggregate must equal the oracle's
    // recomputation straight off the source parquet.
    Q("q_ddl",
      (s, dir) => {
        Tables.registerViews(s, dir)
        s.sql("DROP TABLE IF EXISTS nation_ddl")
        // cross-session leftover: the in-memory catalog forgets the managed
        // table between runs but its warehouse directory survives, and
        // CREATE TABLE refuses a pre-existing managed location — clear it
        val leftover = new org.apache.hadoop.fs.Path(
          s.sessionState.conf.warehousePath, "nation_ddl")
        leftover.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(leftover, true)
        s.sql("""CREATE TABLE nation_ddl USING parquet AS
                 SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey < 2""")
        s.sql("""INSERT INTO nation_ddl
                 SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey >= 2""")
        s.sql("INSERT INTO nation_ddl VALUES (997, 'ATLANTIS', 9), (998, 'LEMURIA', 9)")
        s.sql("""SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name
                 FROM nation_ddl GROUP BY n_regionkey ORDER BY n_regionkey""")
      },
      Some("""WITH all_rows AS (
                SELECT n_nationkey, n_name, n_regionkey FROM nation
                UNION ALL SELECT * FROM (VALUES (997, 'ATLANTIS', 9), (998, 'LEMURIA', 9)))
              SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name
              FROM all_rows GROUP BY n_regionkey ORDER BY n_regionkey""")),

    // ---- RangeExec (§2.1, reference basicPhysicalOperators.scala:317):
    // the parallel integer generator — no input relation, rows produced
    // per-partition with no shuffle until the final single-row aggregate.
    Q("q_range",
      (s, dir) => s.range(0, 1000000, 3)
        .agg(count(lit(1)).as("n"), sum(col("id")).as("s"),
          round(avg(col("id")), 4).as("a")),
      Some("""SELECT count(*) AS n, CAST(sum(range) AS BIGINT) AS s,
              round(avg(range), 4) AS a FROM range(0, 1000000, 3)""")),

    // ---- InMemoryTableScanExec (§2.1, reference InMemoryTableScanExec
    // .scala:31): the aggregate is computed once, cached columnar, and the
    // returned frame reads back through InMemoryTableScan (plan-asserted in
    // PlanShapeSpec) — values must equal the uncached oracle recomputation.
    Q("q_cache",
      (s, dir) => {
        val agg = t(s, dir, "orders")
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
        agg.cache()
        agg.count() // materialize the cache before the serving read
        agg.orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
              FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- Dataset ↔ RDD bridge (§2.1, reference ExistingRDD.scala:158):
    // relational scan → RDD imperative hop (the genuine per-row escape
    // hatch) → back to a DataFrame for relational aggregation. Decimal sums
    // so the fold order of the RDD hop can't perturb the hash.
    Q("q_rdd",
      (s, dir) => {
        val rdd = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity"))
          .rdd.map(r => (r.getLong(0) % 10, r.getDouble(1)))
        s.createDataFrame(rdd).toDF("bucket", "qty")
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"),
            sum(col("qty").cast("decimal(18,2)")).cast("double").as("sq"))
          .orderBy("bucket")
      },
      Some("""SELECT l_orderkey % 10 AS bucket, count(*) AS n,
              CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq
              FROM lineitem GROUP BY 1 ORDER BY bucket""")),

    // SLOWLY-CHANGING DIMENSION type 2 (Kimball versioning — the
    // warehouse op between an operational feed and its dimensions): two
    // change batches against the customer dimension exercise every arm —
    // attribute bump (close + open), the SCD no-op (change equal to
    // current), double-bump keys carrying three versions, and untouched
    // history passthrough. The change batch is the join's small side;
    // history rows are never rewritten. The oracle states the closed form
    // of both batches per key class.
    Q("q_scd2",
      (s, dir) => {
        import graft.ops.Scd
        val cust = t(s, dir, "customer")
        val dim = cust.select(col("c_custkey"), col("c_nationkey"),
          lit("2024-01-01").as("valid_from"),
          lit(null).cast("string").as("valid_to"),
          lit(true).as("is_current"))
        val b1 = cust.filter(col("c_custkey") % 10 === 0)
          .select(col("c_custkey"),
            when(col("c_custkey") % 50 === 0, col("c_nationkey"))
              .otherwise((col("c_nationkey") + 1) % 25).as("c_nationkey"),
            lit("2024-06-01").as("ts"))
        // materialize between batches — a dimension IS a table between
        // loads, and the second feed reading live state would otherwise
        // self-join the un-materialized union DAG
        val d1 = Scd.applyChanges(dim, b1, "c_custkey",
          Seq("c_nationkey"), "ts").localCheckpoint()
        // the second feed computes from LIVE state, like an upstream would
        val b2 = d1.filter(col("is_current") && col("c_custkey") % 20 === 0)
          .select(col("c_custkey"),
            ((col("c_nationkey") + 1) % 25).as("c_nationkey"),
            lit("2024-09-01").as("ts"))
        Scd.applyChanges(d1, b2, "c_custkey", Seq("c_nationkey"), "ts")
          .filter(col("c_custkey") % 10 === 0)
          .orderBy(col("c_custkey"), col("valid_from"))
      },
      Some("""WITH b AS (SELECT c_custkey AS k, c_nationkey AS nat
                         FROM customer WHERE c_custkey % 10 = 0)
              SELECT k AS c_custkey, nat AS c_nationkey,
                '2024-01-01' AS valid_from,
                CASE WHEN k % 100 = 0 THEN '2024-09-01'
                     WHEN k % 50 = 0 THEN NULL
                     ELSE '2024-06-01' END AS valid_to,
                (k % 50 = 0 AND k % 100 <> 0) AS is_current
              FROM b
              UNION ALL
              SELECT k, CAST((nat + 1) % 25 AS INTEGER),
                CASE WHEN k % 100 = 0 THEN '2024-09-01'
                     ELSE '2024-06-01' END,
                CASE WHEN k % 100 = 0 THEN NULL
                     WHEN k % 20 = 0 THEN '2024-09-01'
                     ELSE NULL END,
                CASE WHEN k % 100 = 0 THEN true
                     WHEN k % 20 = 0 THEN false ELSE true END
              FROM b WHERE k % 100 = 0 OR k % 50 <> 0
              UNION ALL
              SELECT k, CAST(((nat + 1) % 25 + 1) % 25 AS INTEGER),
                '2024-09-01', NULL, true
              FROM b WHERE k % 20 = 0 AND k % 50 <> 0
              ORDER BY c_custkey, valid_from"""))
  )
}
