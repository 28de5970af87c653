package graft.queries

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables
import graft.streaming.StreamOps

/** Source/sink surface (SURVEY.md §2.1) beyond the parquet read path:
  * partitioned parquet WRITE + read-back, CSV and JSON round-trips with
  * explicit schemas, text format, and the structured-streaming slice
  * (§2.10). Each query writes under target/qtmp and verifies by reading its
  * own output back — the oracle checks the same aggregate straight off the
  * source parquet, so a lossy round-trip fails the compare.
  */
object Sources extends QueryPack {

  private def tmp(name: String): String = graft.core.Scratch.dir(name)

  def queries: Seq[Q] = Seq(

    // ZONE-MAP data skipping (graft.sources.ZoneMap — the lakehouse
    // file-statistics technique for predicates on columns the directory
    // layout does NOT partition by): the writer range-clusters rows so
    // each file covers a narrow o_orderdate slice and records per-file
    // min/max in a |files|-sized manifest; the reader intersects the
    // query range with the manifest and hands Spark only surviving files
    // (pruning ratio + superset-safety asserted in ZoneMapSpec). Oracle
    // replays the same range aggregate off the raw table, so a file
    // skipped wrongly fails the hash.
    Q("q_zonemap",
      (s, dir) => {
        val out = graft.core.Scratch.layoutOnce(dir,
            "orders_zonemap", "manifest/_SUCCESS") { o =>
          graft.sources.ZoneMap.write(
            Tables(s, dir, "orders"), o, Seq("o_orderdate"), nFiles = 8)
        }
        graft.sources.ZoneMap.read(s, out,
            Seq(graft.sources.ZoneMap.ZoneRange(
              "o_orderdate", "1996-01-01", "1996-12-31")))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice")).cast("decimal(18,2)").as("tp"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
                CAST(sum(o_totalprice) AS DECIMAL(18,2)) AS tp
              FROM orders
              WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                AND o_orderdate <= TIMESTAMP '1996-12-31'
              GROUP BY 1 ORDER BY 1""")),

    // Z-ORDER clustered layout (Delta OPTIMIZE ZORDER BY analogue):
    // quantile-rank bucket codes of BOTH zone columns bit-interleave into
    // a Morton code the files range-cluster on, so a two-column range
    // predicate prunes files on both dimensions (lexicographic clustering
    // serves only the leading column — measured in ZoneMapSpec). The
    // layout never changes results: the oracle is the plain filter.
    Q("q_layout_zorder",
      (s, dir) => {
        // clustered layout built once per (JVM, corpus dir) — OPTIMIZE
        // ZORDER is out-of-band maintenance; the operator under test is
        // the two-dimension file prune on the read side
        val out = graft.core.Scratch.layoutOnce(dir,
            "orders_zorder", "manifest/_SUCCESS") { o =>
          graft.sources.ZoneMap.writeZOrdered(
            Tables(s, dir, "orders"), o,
            Seq("o_custkey", "o_totalprice"), nFiles = 16)
        }
        graft.sources.ZoneMap.read(s, out, Seq(
            graft.sources.ZoneMap.ZoneRange("o_custkey", 100L, 400L),
            graft.sources.ZoneMap.ZoneRange("o_totalprice", 50000.0, 150000.0)))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice")).cast("decimal(18,2)").as("tp"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
                CAST(sum(o_totalprice) AS DECIMAL(18,2)) AS tp
              FROM orders
              WHERE o_custkey >= 100 AND o_custkey <= 400
                AND o_totalprice >= 50000.0 AND o_totalprice <= 150000.0
              GROUP BY 1 ORDER BY 1""")),

    // Partitioned write (the 100 TB egress pattern: InsertIntoHadoopFsRelation
    // + dynamic partitions) then a partition-pruned read-back.
    Q("q_write_partitioned",
      (s, dir) => {
        val out = tmp("orders_by_priority")
        Tables(s, dir, "orders")
          .write.mode(SaveMode.Overwrite).partitionBy("o_orderpriority").parquet(out)
        s.read.parquet(out)
          .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
              FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
              GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // JDBC source/sink round-trip against EMBEDDED Derby (in /opt/spark/jars
    // — no network, so the §2.1 JDBC surface is coverable even offline):
    // write nation through the JDBC sink (Spark's DerbyDialect maps the
    // types), read it back through the JDBC source, aggregate; the oracle
    // recomputes straight off the parquet, so any round-trip lossiness
    // fails the hash. A per-JVM database name keeps concurrent harness
    // JVMs off each other's Derby boot lock.
    Q("q_source_jdbc",
      (s, dir) => {
        val db = tmp(s"derby_nation_${ProcessHandle.current().pid()}")
        val url = s"jdbc:derby:$db;create=true"
        val props = new java.util.Properties()
        props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        Tables(s, dir, "nation")
          .write.mode(SaveMode.Overwrite).jdbc(url, "nation", props)
        s.read.jdbc(url, "nation", props)
          .groupBy("n_regionkey")
          .agg(count(lit(1)).as("n"), sum(col("n_nationkey")).as("sum_key"))
          .orderBy("n_regionkey")
      },
      Some("""SELECT n_regionkey, count(*) AS n,
              CAST(sum(n_nationkey) AS BIGINT) AS sum_key
              FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""")),

    // HIVE catalog scan + sink (§2.1, reference HiveTableScanExec.scala:47
    // + InsertIntoHiveTable): long env-excluded because Derby's FILE-based
    // metastore takes an exclusive boot lock and concurrent harness JVMs
    // died on db.lck — solved by the PER-JVM IN-MEMORY Derby metastore
    // ([[graft.core.GraftSession.localHive]]): nothing on disk is shared.
    // The table is STORED AS TEXTFILE on purpose — parquet/orc hive tables
    // convert to the native FileSourceScan (covered elsewhere), while a
    // SerDe format genuinely exercises HiveTableScanExec + LazySimpleSerDe
    // on read and the hive sink on write (plan-asserted in PlanShapeSpec).
    // Money rides DECIMAL so the text round-trip is exact; the oracle
    // recomputes straight off the parquet, so SerDe lossiness fails the
    // hash.
    Q("q_hive",
      (s, dir) => {
        s.sql("DROP TABLE IF EXISTS graft_hive_orders")
        Tables(s, dir, "orders").createOrReplaceTempView("orders_hive_src")
        s.sql("""CREATE TABLE graft_hive_orders
                 (o_orderkey BIGINT, o_orderstatus STRING, p DECIMAL(18,2))
                 STORED AS TEXTFILE""")
        s.sql("""INSERT INTO graft_hive_orders
                 SELECT o_orderkey, o_orderstatus,
                        CAST(o_totalprice AS DECIMAL(18,2))
                 FROM orders_hive_src""")
        s.sql("""SELECT o_orderstatus, count(*) AS n,
                        CAST(sum(p) AS DOUBLE) AS total
                 FROM graft_hive_orders
                 GROUP BY o_orderstatus ORDER BY o_orderstatus""")
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
              FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ANALYZE TABLE → CBO sizeInBytes flipping a JOIN-SIDE decision — the
    // capability the reference's AnalyzeTableCommand (AnalyzeTableCommand
    // .scala:35) + Statistics(sizeInBytes) row (SURVEY §4.1) exist for. The
    // table must be EXTERNAL over files landed outside the metastore (the
    // classic reason ANALYZE exists — an INSERT would autogather basic
    // stats and pre-fill totalSize): with no stats and fallBackToHdfs off,
    // the relation reports defaultSizeInBytes=Long.Max, so the planner
    // refuses to broadcast it and falls back to sort-merge; ANALYZE writes
    // the real byte size into the metastore and the SAME join re-plans as
    // a broadcast-hash join. Both plans are asserted HERE (the flip is the
    // semantics under test — a silent non-flip must fail the row, not just
    // a spec), then the broadcast-side result ships as the oracle row.
    // Isolated newSession: the lowered broadcast threshold (the parquet
    // side must stay above it at every fixture sf) must not leak into
    // sibling queries.
    Q("q_cbo_stats",
      (s, dir) => {
        val s2 = s.newSession()
        s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "1KB")
        s2.sql("DROP TABLE IF EXISTS graft_cbo_nation")
        val loc = tmp("cbo_nation_text")
        Tables(s2, dir, "nation").selectExpr("n_nationkey", "n_name")
          .coalesce(1).write.mode("overwrite")
          .option("delimiter", "|").csv(loc)
        // DO_NOT_UPDATE_STATS: the metastore otherwise computes "fast
        // stats" (numFiles/totalSize) AT CREATION for a table over an
        // existing location, pre-filling exactly the number ANALYZE is
        // supposed to supply; explicit ANALYZE still writes stats.
        s2.sql(s"""CREATE EXTERNAL TABLE graft_cbo_nation
                   (n_nationkey BIGINT, n_name STRING)
                   ROW FORMAT DELIMITED FIELDS TERMINATED BY '|'
                   STORED AS TEXTFILE LOCATION '$loc'
                   TBLPROPERTIES('DO_NOT_UPDATE_STATS'='true')""")
        Tables(s2, dir, "customer").createOrReplaceTempView("cbo_customer")
        def joined = s2.sql(
          """SELECT n_name, count(*) AS n,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
             FROM cbo_customer JOIN graft_cbo_nation ON c_nationkey = n_nationkey
             GROUP BY n_name ORDER BY n_name""")
        val pre = joined.queryExecution.sparkPlan.toString
        require(pre.contains("SortMergeJoin") && !pre.contains("BroadcastHashJoin"),
          s"pre-ANALYZE plan must sort-merge (no stats => Long.Max size):\n${pre.take(800)}")
        s2.sql("ANALYZE TABLE graft_cbo_nation COMPUTE STATISTICS")
        val post = joined
        val postPlan = post.queryExecution.sparkPlan.toString
        require(postPlan.contains("BroadcastHashJoin"),
          s"post-ANALYZE plan must broadcast the analyzed table:\n${postPlan.take(800)}")
        post
      },
      Some("""SELECT n_name, count(*) AS n,
              CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
              FROM customer JOIN nation ON c_nationkey = n_nationkey
              GROUP BY n_name ORDER BY n_name""")),

    // AVRO (§2.1 — excluded until round 9 because the spark-avro CONNECTOR
    // jar is absent from the image): graft-avro is a from-scratch minimal
    // connector over the avro CORE jars that DO ship (sources/Avro.scala) —
    // DSv2 read with column pruning, distributed per-partition container
    // write, hadoop-FS I/O, real object-container framing so the files
    // interoperate with any Avro tooling. Doubles round-trip binary-exact
    // (avro encodes them as IEEE bits, unlike text formats), so the
    // aggregate must hash-equal the oracle's straight-off-parquet
    // recomputation.
    Q("q_source_avro",
      (s, dir) => {
        val out = tmp("orders_avro")
        val p = new org.apache.hadoop.fs.Path(out)
        val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
        if (fs.exists(p)) fs.delete(p, true): Unit
        graft.sources.AvroIo.write(
          Tables(s, dir, "orders").select(
            col("o_orderkey"), col("o_orderpriority"), col("o_totalprice")),
          out)
        s.read.format("graft-avro").load(out)
          .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
              FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
              GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // DSv2 WRITE path (§2.1 plugin API, write side — the reference's
    // CreatableRelationProvider re-expressed on WriteBuilder/BatchWrite/
    // DataWriter): mode("overwrite") goes through SupportsTruncate (the
    // previous generation is deleted only inside driver-side commit), then
    // a second mode("append") job adds a disjoint slice — distinct
    // queryIds keep file names collision-free. Each task writes to
    // dir/_tmp and commit() renames into place, so readers only ever see
    // fully-committed containers. The read-back aggregate must equal the
    // oracle's union of both slices straight off parquet.
    Q("q_source_avro_write",
      (s, dir) => {
        val out = tmp("orders_avro_w")
        val p = new org.apache.hadoop.fs.Path(out)
        val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
        if (fs.exists(p)) fs.delete(p, true): Unit
        val orders = Tables(s, dir, "orders").select(
          col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
        // decoy generation that TRUNCATE must remove
        orders.filter(col("o_orderkey") % 2 === 0).limit(5)
          .write.format("graft-avro").mode("append").save(out)
        orders.filter(col("o_orderkey") % 2 === 0)
          .write.format("graft-avro").mode("overwrite").save(out)
        orders.filter(col("o_orderkey") % 2 =!= 0)
          .write.format("graft-avro").mode("append").save(out)
        s.read.format("graft-avro").load(out)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
              FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // DataSource V2 PLUGIN API (§2.1 Source plugin API, reference
    // sources/interfaces.scala:71,267 RelationProvider/PrunedFilteredScan —
    // re-expressed on the connector interfaces): graft-synth generates a
    // deterministic corpus as a pure function of doc_id, with doc_id range
    // predicates CONSUMED by SupportsPushDownFilters (they clip the
    // generated range at planning — the generator's partition pruning;
    // plan-asserted in SynthDocsSpec) and SupportsPushDownRequiredColumns
    // honored by the readers (un-projected columns are never built). The
    // oracle replays the generator row-for-row from range().
    Q("q_source_dsv2",
      (s, dir) => {
        s.read.format("graft-synth")
          .option("rows", "100000").option("partitions", "8").load()
          .filter(col("doc_id") >= 1000 && col("doc_id") < 50000)
          .groupBy("lang")
          .agg(count(lit(1)).as("n"),
            sum(col("n_tokens")).cast("bigint").as("sum_toks"),
            sum(length(col("text"))).cast("bigint").as("sum_len"))
          .orderBy("lang")
      },
      Some("""WITH d AS (SELECT range AS doc_id,
                ['en','de','fr','ja'][(range % 4)::INT + 1] AS lang,
                1 + (range % 32) AS n_tokens,
                array_to_string(
                  ['w' || ((range + i) % 16)
                   FOR i IN range(0, (1 + (range % 32))::INT)], ' ') AS text
              FROM range(0, 100000))
              SELECT lang, count(*) AS n,
                     CAST(sum(n_tokens) AS BIGINT) AS sum_toks,
                     CAST(sum(len(text)) AS BIGINT) AS sum_len
              FROM d WHERE doc_id >= 1000 AND doc_id < 50000
              GROUP BY lang ORDER BY lang""")),

    // CSV round-trip with explicit schema (no inference nondeterminism).
    Q("q_source_csv",
      (s, dir) => {
        val out = tmp("part_csv")
        Tables(s, dir, "part")
          .select("p_partkey", "p_name", "p_brand", "p_size", "p_retailprice")
          .write.mode(SaveMode.Overwrite).option("header", "true").csv(out)
        val schema = StructType(Seq(
          StructField("p_partkey", LongType), StructField("p_name", StringType),
          StructField("p_brand", StringType), StructField("p_size", IntegerType),
          StructField("p_retailprice", DoubleType)))
        s.read.schema(schema).option("header", "true").csv(out)
          .agg(count(lit(1)).as("n"),
            sum(col("p_size")).as("sum_size"),
            sum(col("p_retailprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
      },
      Some("""SELECT count(*) AS n, CAST(sum(p_size) AS BIGINT) AS sum_size,
              CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
              FROM part""")),

    // CSV MALFORMED-RECORD modes (§2.1 ingestion robustness — the knob a
    // 100 TB raw-crawl ingest lives by): an inline fixture with 3 good
    // and 2 malformed lines read under all three parser modes —
    // PERMISSIVE keeps every row and captures the raw line in
    // _corrupt_record, DROPMALFORMED keeps only parseable rows, FAILFAST
    // throws on first touch. The fixture is builder-authored, so the
    // oracle pins the mode contracts as constants (the q_stats_sketch
    // pattern for engine-internal behavior).
    Q("q_source_csv_modes",
      (s, dir) => {
        import s.implicits._
        val out = tmp("csv_modes")
        Seq("1,alpha,10", "2,beta,not_a_number", "3,gamma,30",
          "4,delta,40", "oops_one_field", "")
          .toDF("line").coalesce(1)
          .write.mode(SaveMode.Overwrite).text(out)
        val schema = StructType(Seq(
          StructField("id", LongType), StructField("name", StringType),
          StructField("size", IntegerType),
          StructField("_corrupt_record", StringType)))
        val permissive = s.read.schema(schema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .csv(out).cache()
        val nPerm = permissive.count()
        val nCorrupt = permissive.filter(col("_corrupt_record").isNotNull).count()
        val sumGood = permissive.filter(col("_corrupt_record").isNull)
          .agg(sum(col("size"))).collect()(0).getLong(0)
        permissive.unpersist()
        // count() under CSV column pruning parses NO columns, so malformed
        // rows go undetected and DROPMALFORMED/FAILFAST silently no-op —
        // force full-row parsing for the mode checks, restore after
        val pruning = s.conf.get("spark.sql.csv.parser.columnPruning.enabled")
        s.conf.set("spark.sql.csv.parser.columnPruning.enabled", "false")
        val (nDrop, failfast) =
          try {
            // collect, not count: count() short-circuits row materialization
            // and misses per-field malformedness (fixture is 5 rows)
            val d = s.read
              .schema(StructType(schema.fields.filter(_.name != "_corrupt_record")))
              .option("mode", "DROPMALFORMED").csv(out).collect().length.toLong
            val ff = try {
              s.read
                .schema(StructType(schema.fields.filter(_.name != "_corrupt_record")))
                .option("mode", "FAILFAST").csv(out).collect()
              false
            } catch { case _: org.apache.spark.SparkException => true }
            (d, ff)
          } finally
            s.conf.set("spark.sql.csv.parser.columnPruning.enabled", pruning)
        Seq((nPerm, nCorrupt, sumGood, nDrop, failfast))
          .toDF("n_permissive", "n_corrupt", "sum_good", "n_dropmalformed",
            "failfast_throws")
      },
      Some("""SELECT 5::BIGINT AS n_permissive, 2::BIGINT AS n_corrupt,
              80::BIGINT AS sum_good, 3::BIGINT AS n_dropmalformed,
              true AS failfast_throws""")),

    // JSON round-trip (schema'd read; ts stays int64 nanos end-to-end).
    Q("q_source_json",
      (s, dir) => {
        val out = tmp("events_json")
        Tables(s, dir, "events")
          .select("event_id", "user_id", "event_type", "value")
          .write.mode(SaveMode.Overwrite).json(out)
        val schema = StructType(Seq(
          StructField("event_id", LongType), StructField("user_id", LongType),
          StructField("event_type", StringType), StructField("value", DoubleType)))
        s.read.schema(schema).json(out)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("sv"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n,
              CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
              FROM events GROUP BY event_type ORDER BY event_type""")),

    // Text format: one line per doc out, line count + char mass back.
    Q("q_source_text",
      (s, dir) => {
        val out = tmp("documents_text")
        Tables(s, dir, "documents").select(col("text"))
          .write.mode(SaveMode.Overwrite).text(out)
        s.read.text(out)
          .agg(count(lit(1)).as("n_lines"), sum(length(col("value"))).as("n_chars"))
      },
      Some("SELECT count(*) AS n_lines, CAST(sum(length(text)) AS BIGINT) AS n_chars FROM documents")),

    // ORC round-trip (native ORC reader in Spark 4; reference went through
    // the Hive SerDe, sql/hive/.../orc/OrcFileFormat.scala:47).
    Q("q_source_orc",
      (s, dir) => {
        val out = tmp("orders_orc")
        Tables(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
          .write.mode(SaveMode.Overwrite).orc(out)
        s.read.orc(out)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
              FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // XML round-trip (the built-in Spark 4 xml format, SPARK-44265 — the
    // reference era needed the external spark-xml package). Text format, so
    // money rides DECIMAL(18,2) through the write and an EXPLICIT read
    // schema (no inference pass — at 100 TB schema inference is a full
    // extra scan); the oracle recomputes straight off parquet, so any
    // serialization lossiness fails the hash.
    Q("q_source_xml",
      (s, dir) => {
        val out = tmp("orders_xml")
        Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice").cast("decimal(18,2)").as("p"))
          .write.mode(SaveMode.Overwrite)
          .option("rowTag", "order").format("xml").save(out)
        s.read
          .schema("o_orderkey BIGINT, o_orderstatus STRING, p DECIMAL(18,2)")
          .option("rowTag", "order").format("xml").load(out)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), sum(col("p")).cast("double").as("total"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
              FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Structured streaming: file source → watermarked windowed agg → memory
    // sink, Trigger.AvailableNow (real MicroBatchExecution, bounded run).
    Q("q_stream_window",
      (s, dir) => StreamOps.runFileStream(s, dir),
      Some("""SELECT strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d %H:%M:%S') AS w,
              event_type, count(*) AS n,
              CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
              FROM events GROUP BY 1, 2 ORDER BY w, event_type""")),

    // Streaming exact dedup: the landing dir holds the events file TWICE
    // (at-least-once redelivery), dropDuplicatesWithinWatermark(event_id)
    // emits each exactly once — oracle aggregates the SINGLE batch copy.
    // CUSTOM STREAMING SOURCE PLUGIN (§2.1 + §2.10 — the reference's
    // streaming Source/Offset contract, execution/streaming/Source.scala,
    // re-expressed as a DSv2 MicroBatchStream on graft-synth): the offset
    // is "rows emitted so far", each trigger admits rowsPerBatch ids, and
    // batch + stream share the same partition/reader machinery, so the
    // streamed aggregate must equal the oracle's batch replay from
    // range(). rowsPerBatch=700 over 3000 rows forces ≥ 5 micro-batches —
    // the offset log, not a single-batch degenerate.
    Q("q_stream_source_plugin",
      (s, dir) => {
        val q = s.readStream.format("graft-synth")
          .option("rows", 3000).option("partitions", 4)
          .option("rowsPerBatch", 700).load()
          .groupBy("lang")
          .agg(count(lit(1)).as("n"), sum(col("n_tokens")).as("toks"))
          .writeStream.format("memory").queryName("synth_stream_agg")
          .outputMode("complete").start()
        try q.processAllAvailable() finally q.stop()
        s.table("synth_stream_agg").orderBy("lang")
      },
      Some("""SELECT CASE CAST(range % 4 AS INT) WHEN 0 THEN 'en'
                     WHEN 1 THEN 'de' WHEN 2 THEN 'fr' ELSE 'ja' END AS lang,
                count(*) AS n,
                CAST(sum(1 + range % 32) AS BIGINT) AS toks
              FROM range(0, 3000) GROUP BY 1 ORDER BY lang""")),

    Q("q_stream_dedup",
      (s, dir) => StreamOps.runStreamDedup(s, dir),
      Some("""SELECT event_type, count(*) AS n,
              CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
              FROM events GROUP BY event_type ORDER BY event_type""")),

    // Transactional parquet file sink: stream → filter/project → parquet +
    // checkpoint (_spark_metadata commit log = exactly-once), read back and
    // aggregate in batch; oracle recomputes straight off the source.
    Q("q_stream_sink",
      (s, dir) => StreamOps.runStreamFileSink(s, dir),
      Some("""SELECT user_id % 10 AS user_bucket, count(*) AS n,
              CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
              FROM events WHERE event_type = 'purchase'
              GROUP BY 1 ORDER BY user_bucket""")),

    // Stream-static join: per-micro-batch lookup join against the customer
    // dimension (no stream state); oracle joins the batch copies.
    Q("q_stream_join",
      (s, dir) => StreamOps.runStreamStaticJoin(s, dir),
      Some("""SELECT c_mktsegment, event_type, count(*) AS n,
              CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
              FROM events JOIN customer ON user_id = c_custkey
              GROUP BY c_mktsegment, event_type
              ORDER BY c_mktsegment, event_type""")),

    // Streaming NEAR-dup dedup at ingest: documents arrive in TWO id-ordered
    // micro-batches (maxFilesPerTrigger=1); each batch drops docs dominated
    // by an earlier near-dup — prior batches via the persisted signature
    // store (LSH band join, never store-wide), own batch via the banded
    // self-join. Kept set == batch rule "no smaller-id J≥0.8 near-dup", so
    // the all-pairs oracle applies. Spanning pairs exercise the store path.
    // DECONTAMINATION at ingest — the benchmark scrub applied per
    // micro-batch before documents land (per-doc against a FIXED eval
    // set, so it's exactly batch-decomposable): two parity batches
    // streamed through StreamCurate must equal one batch decontaminate
    // over the whole corpus — the SAME oracle as q_dedup_decontam, hash
    // exact, not a verdict row.
    Q("q_stream_decontam",
      (s, dir) => {
        val root = tmp("stream_decontam")
        val landing = s"$root/landing"
        val hconf = s.sparkContext.hadoopConfiguration
        val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(hconf)
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
        val docs = s.read.parquet(s"$dir/documents.parquet")
        def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
          val stageDir = s"$root/stage_$name"
          df.coalesce(1).write.mode("overwrite").parquet(stageDir)
          val part = fs.globStatus(
            new org.apache.hadoop.fs.Path(s"$stageDir/part-*")).head.getPath
          val dst = new org.apache.hadoop.fs.Path(s"$landing/$name.parquet")
          fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
          org.apache.hadoop.fs.FileUtil.copy(fs, part, fs, dst, false, hconf)
          fs.setTimes(dst, mtime, -1)
        }
        val t0 = 1700000000000L
        stage(docs.filter(col("doc_id") % 2 === 0), "batch0", t0)
        stage(docs.filter(col("doc_id") % 2 === 1), "batch1", t0 + 60000)
        val stream = s.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(landing)
        graft.streaming.StreamCurate.startDecontaminated(
          stream, docs.filter(col("doc_id") % 7 === 0), s"$root/clean")
          .awaitTermination()
        graft.streaming.StreamCurate.read(s, s"$root/clean")
          .groupBy("lang").agg(count(lit(1)).as("n")).orderBy("lang")
      },
      Some(s"""WITH toks AS (SELECT doc_id, ${Pipeline.DTOKS} AS t FROM documents),
               sh AS (SELECT doc_id,
                        list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                       FOR i IN range(1, len(t) - 1)]) AS s
                      FROM toks WHERE len(t) >= 3),
               bench AS (SELECT * FROM sh WHERE doc_id % 7 = 0),
               contaminated AS (
                 SELECT DISTINCT c.doc_id FROM sh c JOIN bench b ON true
                 WHERE len(list_intersect(c.s, b.s))::DOUBLE /
                       len(list_distinct(list_concat(c.s, b.s))) >= 0.8)
               SELECT lang, count(*) AS n FROM documents
               WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
               GROUP BY lang ORDER BY lang""")),

    // STREAMING COUNT-MIN SKETCH — sketch MERGEABILITY is the point: each
    // micro-batch sketches ITS rows only (one explode+groupBy over the
    // batch) and the grids ADD into a ≤ d·w-row store; two parity batches
    // streamed must therefore equal one batch-built sketch, so this row
    // shares q_stats_cms's ORACLE verbatim — the streamed estimates are
    // hash-identical to the batch ones. At 1000 executors the same
    // addition tree-reduces per-executor grids; no corpus-scale shuffle.
    Q("q_stream_cms",
      (s, dir) => {
        val root = tmp("stream_cms")
        val landing = s"$root/landing"
        val hconf = s.sparkContext.hadoopConfiguration
        val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(hconf)
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
        val docs = s.read.parquet(s"$dir/documents.parquet")
        def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
          val stageDir = s"$root/stage_$name"
          df.coalesce(1).write.mode("overwrite").parquet(stageDir)
          val part = fs.globStatus(
            new org.apache.hadoop.fs.Path(s"$stageDir/part-*")).head.getPath
          val dst = new org.apache.hadoop.fs.Path(s"$landing/$name.parquet")
          fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
          org.apache.hadoop.fs.FileUtil.copy(fs, part, fs, dst, false, hconf)
          fs.setTimes(dst, mtime, -1)
        }
        val t0 = 1700000000000L
        stage(docs.filter(col("doc_id") % 2 === 0), "batch0", t0)
        stage(docs.filter(col("doc_id") % 2 === 1), "batch1", t0 + 60000)
        val stream = s.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(landing)
          .select(explode(graft.fts.Analyzer.tokenize(col("text"))).as("term"))
        graft.streaming.StreamSketch.start(stream, "term", s"$root/cms",
          d = 3, w = 64).awaitTermination()
        val sk = graft.streaming.StreamSketch.read(s, s"$root/cms")
        val toks = docs
          .select(explode(graft.fts.Analyzer.tokenize(col("text"))).as("term"))
        val top = toks.groupBy("term").agg(count(lit(1)).as("true_cnt"))
          .orderBy(col("true_cnt").desc, col("term")).limit(10)
        top.join(graft.ops.Cms.estimate(sk, top, "term", d = 3, w = 64),
            col("term") === col("key"))
          .select(col("term"), col("true_cnt"), col("est").as("est_cnt"),
            (col("est") - col("true_cnt")).as("overcount"))
          .orderBy("term")
      },
      Some(s"""WITH occ AS (SELECT unnest(${Pipeline.DTOKS}) AS term FROM documents),
               tru AS (SELECT term, count(*) AS true_cnt FROM occ GROUP BY term),
               top AS (SELECT term, true_cnt FROM tru
                       ORDER BY true_cnt DESC, term LIMIT 10),
               rows_ AS (SELECT unnest([0, 1, 2]) AS r),
               cnt AS (SELECT r,
                   (CAST('0x' || substring(md5(term || '#' || CAST(r AS VARCHAR)), 1, 15)
                         AS BIGINT) % 64) AS pos,
                   count(*) AS cnt
                 FROM occ CROSS JOIN rows_ GROUP BY 1, 2),
               est AS (SELECT t.term, min(coalesce(c.cnt, 0)) AS est_cnt
                 FROM (SELECT term FROM top) t CROSS JOIN rows_ r
                 LEFT JOIN cnt c ON c.r = r.r AND c.pos =
                   (CAST('0x' || substring(md5(t.term || '#' || CAST(r.r AS VARCHAR)), 1, 15)
                         AS BIGINT) % 64)
                 GROUP BY t.term)
               SELECT top.term, top.true_cnt, est.est_cnt,
                 est.est_cnt - top.true_cnt AS overcount
               FROM top JOIN est USING (term) ORDER BY term""")),

    // STREAMING WEIGHTED RESERVOIR: the A-ES key is per-row state, so
    // "keep the n smallest" MERGES across micro-batches — the reservoir
    // over the two parity batches equals the one-shot draw, and this row
    // shares q_pipeline_weighted_sample's oracle verbatim (same seed,
    // same corpus, same n). The third mergeability lifecycle beside the
    // CMS grid and the SCD epochs; store is n rows.
    Q("q_stream_weighted_sample",
      (s, dir) => {
        val root = tmp("stream_wsample")
        val landing = s"$root/landing"
        val hconf = s.sparkContext.hadoopConfiguration
        val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(hconf)
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
        val docs = s.read.parquet(s"$dir/documents.parquet")
          .select("doc_id", "n_chars")
        def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
          val stageDir = s"$root/stage_$name"
          df.coalesce(1).write.mode("overwrite").parquet(stageDir)
          val part = fs.globStatus(
            new org.apache.hadoop.fs.Path(s"$stageDir/part-*")).head.getPath
          val dst = new org.apache.hadoop.fs.Path(s"$landing/$name.parquet")
          fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
          org.apache.hadoop.fs.FileUtil.copy(fs, part, fs, dst, false, hconf)
          fs.setTimes(dst, mtime, -1)
        }
        val t0 = 1700000000000L
        stage(docs.filter(col("doc_id") % 2 === 0), "batch0", t0)
        stage(docs.filter(col("doc_id") % 2 === 1), "batch1", t0 + 60000)
        val stream = s.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(landing)
        graft.streaming.StreamSketch.startWeightedReservoir(
          stream, "doc_id", "n_chars", seed = "w1", n = 50,
          s"$root/reservoir").awaitTermination()
        graft.streaming.StreamSketch.readReservoir(s, s"$root/reservoir", 50)
          .select(col("rid").as("doc_id"), col("skey"))
          .orderBy("skey", "doc_id")
      },
      Some("""WITH k AS (SELECT doc_id,
                round(-ln((CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                        || ':w1'), 1, 6) AS BIGINT) + 1.0) / 16777216.0)
                      / n_chars, 9) AS skey
              FROM documents)
              SELECT doc_id, skey FROM k ORDER BY skey, doc_id LIMIT 50""")),

    // STREAMING MIXTURE BUDGETS: per-source token counts stream in as
    // the third additive lifecycle (CMS grid, A-ES reservoir, now source
    // counts — each batch lands its own replay-idempotent delta dir) and
    // the temperature budgets derived from the merged counts equal the
    // one-shot batch computation, so this row shares q_pipeline_mix_temp's
    // budget arithmetic (4-dp integer-scaled weights, exact BIGINT).
    Q("q_stream_mix",
      (s, dir) => {
        val root = tmp("stream_mix")
        val landing = s"$root/landing"
        val hconf = s.sparkContext.hadoopConfiguration
        val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(hconf)
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
        val docs = s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("source"),
            graft.pipeline.TextStats.estBpeTokens(col("text")).as("toks"))
        def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
          val stageDir = s"$root/stage_$name"
          df.coalesce(1).write.mode("overwrite").parquet(stageDir)
          val part = fs.globStatus(
            new org.apache.hadoop.fs.Path(s"$stageDir/part-*")).head.getPath
          val dst = new org.apache.hadoop.fs.Path(s"$landing/$name.parquet")
          fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
          org.apache.hadoop.fs.FileUtil.copy(fs, part, fs, dst, false, hconf)
          fs.setTimes(dst, mtime, -1)
        }
        val t0 = 1700000000000L
        stage(docs.filter(col("doc_id") % 2 === 0), "batch0", t0)
        stage(docs.filter(col("doc_id") % 2 === 1), "batch1", t0 + 60000)
        val stream = s.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(landing)
        graft.streaming.StreamMix.start(stream, "source", "toks",
          s"$root/counts").awaitTermination()
        val counts = graft.streaming.StreamMix.readCounts(s, s"$root/counts")
        val budgets = graft.pipeline.Mixing.temperatureBudgetsCounted(
          counts.select(col("source"), col("n").as("toks")),
          totalBudget = 10000L, alpha = 0.3)
        import s.implicits._
        counts.join(budgets.toSeq.toDF("source", "budget"), "source")
          .select(col("source"), col("n").as("n_tokens"), col("budget"))
          .orderBy("source")
      },
      Some("""WITH n AS (SELECT source,
                  sum(CAST(ceil(strlen(text) / 4.0) AS BIGINT)) AS n
                FROM documents GROUP BY 1),
              w AS (SELECT source, n,
                      CAST(round(pow(CAST(n AS DOUBLE), 0.3) * 10000) AS BIGINT)
                        AS w4 FROM n),
              tot AS (SELECT sum(w4) AS sw FROM w)
              SELECT source, CAST(n AS BIGINT) AS n_tokens,
                CAST((10000 * w4) // sw AS BIGINT) AS budget
              FROM w, tot ORDER BY source""")),

    // STREAMING DIMENSION MAINTENANCE (SCD2 at ingest): the q_scd2 change
    // batches arrive as a STREAM (two staged files, maxFilesPerTrigger=1
    // pins order) and fold into the versioned dimension via epoch-flip
    // writes — a crash between epoch write and pointer flip leaves the
    // previous epoch intact. Streamed final state == one-shot batch
    // application, so this row shares q_scd2's closed-form oracle.
    Q("q_stream_scd2",
      (s, dir) => {
        val root = tmp("stream_scd2")
        val landing = s"$root/landing"
        val hconf = s.sparkContext.hadoopConfiguration
        val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(hconf)
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
        val cust = s.read.parquet(s"$dir/customer.parquet")
        val dim = cust.select(col("c_custkey"), col("c_nationkey"),
          lit("2024-01-01").as("valid_from"),
          lit(null).cast("string").as("valid_to"),
          lit(true).as("is_current"))
        // the live-state-derived q_scd2 feeds, expressed as static files
        // (what an operational extract actually ships)
        val b1 = cust.filter(col("c_custkey") % 10 === 0)
          .select(col("c_custkey"),
            when(col("c_custkey") % 50 === 0, col("c_nationkey"))
              .otherwise((col("c_nationkey") + 1) % 25).as("c_nationkey"),
            lit("2024-06-01").as("ts"))
        val b2 = cust.filter(col("c_custkey") % 20 === 0)
          .select(col("c_custkey"),
            when(col("c_custkey") % 50 === 0, (col("c_nationkey") + 1) % 25)
              .otherwise(((col("c_nationkey") + 1) % 25 + 1) % 25)
              .as("c_nationkey"),
            lit("2024-09-01").as("ts"))
        def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
          val stageDir = s"$root/stage_$name"
          df.coalesce(1).write.mode("overwrite").parquet(stageDir)
          val part = fs.globStatus(
            new org.apache.hadoop.fs.Path(s"$stageDir/part-*")).head.getPath
          val dst = new org.apache.hadoop.fs.Path(s"$landing/$name.parquet")
          fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
          org.apache.hadoop.fs.FileUtil.copy(fs, part, fs, dst, false, hconf)
          fs.setTimes(dst, mtime, -1)
        }
        val t0 = 1700000000000L
        stage(b1, "batch0", t0)
        stage(b2, "batch1", t0 + 60000)
        val stream = s.readStream.schema(b1.schema)
          .option("maxFilesPerTrigger", 1).parquet(landing)
        graft.streaming.StreamScd.start(stream, dim, s"$root/dim",
          "c_custkey", Seq("c_nationkey"), "ts").awaitTermination()
        graft.streaming.StreamScd.readDim(s, s"$root/dim")
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
              ORDER BY c_custkey, valid_from""")),

    // STREAMING RATE-ANOMALY MONITOR: eight staged micro-batches
    // (event_id % 8, maxFilesPerTrigger=1 pins bid order) each land
    // their per-event-type counts as replay-idempotent delta dirs
    // (streaming/StreamAnomaly.scala, the CMS-store exactly-once
    // convention); the monitor view z-scores every batch against its 3
    // preceding batches per type — q_temporal_anomaly's semantics at
    // ingest granularity. The oracle replays the same batch partitioning
    // relationally.
    Q("q_stream_anomaly",
      (s, dir) => {
        val root = tmp("stream_anomaly")
        val landing = s"$root/landing"
        val hconf = s.sparkContext.hadoopConfiguration
        val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(hconf)
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
        val ev = s.read.parquet(s"$dir/events.parquet")
          .select("event_id", "event_type")
        def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
          val stageDir = s"$root/stage_$name"
          df.coalesce(1).write.mode("overwrite").parquet(stageDir)
          val part = fs.globStatus(
            new org.apache.hadoop.fs.Path(s"$stageDir/part-*")).head.getPath
          val dst = new org.apache.hadoop.fs.Path(s"$landing/$name.parquet")
          fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
          org.apache.hadoop.fs.FileUtil.copy(fs, part, fs, dst, false, hconf)
          fs.setTimes(dst, mtime, -1)
        }
        val t0 = 1700000000000L
        (0 until 8).foreach { k =>
          stage(ev.filter(col("event_id") % 8 === k), f"batch$k",
            t0 + k * 60000L)
        }
        val stream = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(landing)
        graft.streaming.StreamAnomaly.start(stream, "event_type",
          s"$root/counts").awaitTermination()
        graft.streaming.StreamAnomaly.read(s, s"$root/counts",
            lookback = 3, threshold = 3.0)
          .withColumnRenamed("key", "event_type")
      },
      Some("""WITH b AS (SELECT event_id % 8 AS bid, event_type
                         FROM events),
              cnt AS (SELECT event_type, bid, count(*) AS n
                      FROM b GROUP BY 1, 2),
              win AS (SELECT event_type, bid, n,
                  avg(n) OVER w AS mu,
                  stddev_samp(n) OVER w AS sd,
                  count(n) OVER w AS n_prev
                FROM cnt
                WINDOW w AS (PARTITION BY event_type ORDER BY bid
                             ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING))
              SELECT event_type, bid, n,
                floor(mu * 10000 + 0.5) / 10000 AS mean_prev,
                round(sd, 4) AS sd_prev,
                round((n - mu) / sd, 4) AS z,
                abs(round((n - mu) / sd, 4)) >= 3.0 AS is_anomaly
              FROM win WHERE n_prev = 3 AND sd > 0
              ORDER BY event_type, bid""")),

    // STREAMING PERCENTILE MONITOR: per-batch (key, value) histogram
    // deltas add across micro-batches (the fourth additive lifecycle
    // beside the CMS grid, A-ES reservoir, and source counts), so the
    // merged store yields EXACT interpolated percentiles — streamed ==
    // one-shot batch, and the oracle is plain quantile_cont over the raw
    // corpus. Bounded value domain (2-dp metrics) is the explicit
    // assumption; t-digest/KLL is the unbounded-domain swap with the
    // same store algebra (streaming/StreamPercentiles.scala).
    Q("q_stream_percentiles",
      (s, dir) => {
        val root = tmp("stream_pct")
        val landing = s"$root/landing"
        val hconf = s.sparkContext.hadoopConfiguration
        val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(hconf)
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
        val ev = s.read.parquet(s"$dir/events.parquet")
          .select("event_id", "event_type", "value")
        def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
          val stageDir = s"$root/stage_$name"
          df.coalesce(1).write.mode("overwrite").parquet(stageDir)
          val part = fs.globStatus(
            new org.apache.hadoop.fs.Path(s"$stageDir/part-*")).head.getPath
          val dst = new org.apache.hadoop.fs.Path(s"$landing/$name.parquet")
          fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
          org.apache.hadoop.fs.FileUtil.copy(fs, part, fs, dst, false, hconf)
          fs.setTimes(dst, mtime, -1)
        }
        val t0 = 1700000000000L
        stage(ev.filter(col("event_id") % 2 === 0), "batch0", t0)
        stage(ev.filter(col("event_id") % 2 === 1), "batch1", t0 + 60000)
        val stream = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(landing)
        graft.streaming.StreamPercentiles.start(stream, "event_type",
          "value", s"$root/hist").awaitTermination()
        graft.streaming.StreamPercentiles.read(s, s"$root/hist",
            Seq(0.5, 0.95, 0.99))
          .withColumnRenamed("key", "event_type")
      },
      Some("""SELECT event_type, count(*) AS n,
                floor(quantile_cont(value, 0.5) * 10000 + 0.5) / 10000
                  AS p50,
                floor(quantile_cont(value, 0.95) * 10000 + 0.5) / 10000
                  AS p95,
                floor(quantile_cont(value, 0.99) * 10000 + 0.5) / 10000
                  AS p99
              FROM events GROUP BY 1 ORDER BY 1""")),

    // STREAMING CEP (flatMapGroupsWithState): q_temporal_cep's
    // click→purchase-without-error pattern as a per-user state machine —
    // two staged TIME-SPLIT batches (all of batch 0 precedes batch 1, so
    // per-user fold order is the event-time order), state = two running
    // timestamps that CROSS the batch boundary. Streamed matches ==
    // batch windowed computation → shares q_temporal_cep's oracle.
    Q("q_stream_cep",
      (s, dir) => {
        val root = tmp("stream_cep")
        val landing = s"$root/landing"
        val hconf = s.sparkContext.hadoopConfiguration
        val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(hconf)
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
        val ev = graft.core.EventTime.toMicros(
            s.read.parquet(s"$dir/events.parquet"))
          .select("event_id", "user_id", "event_type", "ts")
        def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
          val stageDir = s"$root/stage_$name"
          df.coalesce(1).write.mode("overwrite").parquet(stageDir)
          val part = fs.globStatus(
            new org.apache.hadoop.fs.Path(s"$stageDir/part-*")).head.getPath
          val dst = new org.apache.hadoop.fs.Path(s"$landing/$name.parquet")
          fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
          org.apache.hadoop.fs.FileUtil.copy(fs, part, fs, dst, false, hconf)
          fs.setTimes(dst, mtime, -1)
        }
        val t0 = 1700000000000L
        val splitUs = 1705363200000000L // 2024-01-16T00:00Z
        stage(ev.filter(col("ts") < splitUs), "batch0", t0)
        stage(ev.filter(col("ts") >= splitUs), "batch1", t0 + 60000)
        val stream = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(landing)
        graft.streaming.StreamCep.start(stream, s"$root/matches",
          windowUs = 3600L * 1000000).awaitTermination()
        graft.streaming.StreamCep.read(s, s"$root/matches")
      },
      Some("""WITH ev AS (SELECT event_id, user_id, event_type,
                  epoch_us(ts) AS ts FROM events),
              t AS (SELECT event_id, user_id, event_type, ts,
                  last_value(CASE WHEN event_type = 'click' THEN ts END
                             IGNORE NULLS) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS last_click,
                  last_value(CASE WHEN event_type = 'error' THEN ts END
                             IGNORE NULLS) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS last_error
                FROM ev)
              SELECT event_id, user_id,
                CAST((ts - last_click) // 1000000 AS BIGINT) AS gap_sec
              FROM t
              WHERE event_type = 'purchase' AND last_click IS NOT NULL
                AND ts - last_click <= 3600000000
                AND (last_error IS NULL OR last_error < last_click)
              ORDER BY event_id""")),

    // WATERMARK LATE-DATA EVICTION, oracle-proven (the beyond-ref §2.10
    // upgrade pinned end-to-end): run 1 streams every event AFTER the
    // corpus's first day and commits watermark = max(ts) − 2 h into the
    // CHECKPOINT; run 2 restarts the same query over a newly-landed file
    // replaying the ENTIRE first day — every row older than the restored
    // watermark, so the engine must DROP them all (their windows' state
    // was already evicted; leaking any row would re-create a closed
    // group and emit a duplicate window in append mode). Two separate
    // AvailableNow runs make the batch boundary deterministic (a single
    // run ingested both staged files in ONE batch, before any watermark
    // stood between them) and additionally pin that the watermark
    // SURVIVES RESTART via the checkpoint — the production upgrade
    // path. The appended sink therefore holds exactly the on-time
    // subset's day windows whose end the final watermark passed — which
    // is what the oracle computes from the same split rule.
    // StreamWatermarkSpec pins the row-level drop with hand-built
    // batches (a late row whose value would visibly shift a sum).
    Q("q_stream_watermark_late",
      (s, dir) => {
        val root = tmp("stream_wm_late")
        val landing = s"$root/landing"
        val outDir = s"$root/out"
        val hconf = s.sparkContext.hadoopConfiguration
        val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(hconf)
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
        val ev = graft.core.EventTime.toTimestamp(
            s.read.parquet(s"$dir/events.parquet"))
          .select("ts", "event_type", "value")
        // the first-day cut, as a literal both stages filter against
        // (1-row collect — harness-scale)
        val cut = ev.agg((date_trunc("DAY", min(col("ts")))
            + expr("INTERVAL 1 DAY")).as("cut"))
          .collect()(0).getTimestamp(0)
        def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit =
          df.coalesce(1).write.mode("overwrite")
            .parquet(s"$landing/$name")
        def run(): Unit = {
          val stream = s.readStream.schema(ev.schema)
            .option("pathGlobFilter", "*.parquet")
            .parquet(s"$landing/*")
          val q = graft.streaming.StreamOps.windowedAgg(stream).writeStream
            .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
              if (!b.isEmpty) b.write.mode("append").parquet(outDir)
            }
            .outputMode("append")
            .option("checkpointLocation", s"$root/ckpt")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        stage(ev.filter(col("ts") >= lit(cut)), "batch0")
        run()
        stage(ev.filter(col("ts") < lit(cut)), "batch1_late")
        run()
        s.read.parquet(outDir).orderBy("w", "event_type")
      },
      Some("""WITH wmk AS (SELECT max(ts) - INTERVAL 2 HOUR AS wm,
                       date_trunc('day', min(ts)) + INTERVAL 1 DAY AS cut
                     FROM events),
              agg AS (SELECT date_trunc('day', ts) AS d, event_type,
                        count(*) AS n,
                        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                          AS sv
                      FROM events CROSS JOIN wmk
                      WHERE ts >= wmk.cut GROUP BY 1, 2)
              SELECT strftime(agg.d, '%Y-%m-%d %H:%M:%S') AS w,
                event_type, n, sv
              FROM agg CROSS JOIN wmk ww
              WHERE agg.d + INTERVAL 1 DAY <= ww.wm
              ORDER BY w, event_type""")),

    // PERCOLATION at ingest — streaming alerting: the q_fts_percolate
    // subscriptions probe each arriving micro-batch (two parity batches,
    // maxFilesPerTrigger=1) and alert pairs append to the partitioned
    // log. Stateless per doc against fixed subscriptions ⇒ streamed
    // union == one batch percolate — the SAME oracle shape as
    // q_fts_percolate, hash exact.
    Q("q_stream_percolate",
      (s, dir) => {
        import s.implicits._
        val root = tmp("stream_percolate")
        val landing = s"$root/landing"
        val hconf = s.sparkContext.hadoopConfiguration
        val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(hconf)
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
        val docs = s.read.parquet(s"$dir/documents.parquet")
          .filter(col("doc_id") < 200)
        def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
          val stageDir = s"$root/stage_$name"
          df.coalesce(1).write.mode("overwrite").parquet(stageDir)
          val part = fs.globStatus(
            new org.apache.hadoop.fs.Path(s"$stageDir/part-*")).head.getPath
          val dst = new org.apache.hadoop.fs.Path(s"$landing/$name.parquet")
          fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
          org.apache.hadoop.fs.FileUtil.copy(fs, part, fs, dst, false, hconf)
          fs.setTimes(dst, mtime, -1)
        }
        val t0 = 1700000000000L
        stage(docs.filter(col("doc_id") % 2 === 0), "batch0", t0)
        stage(docs.filter(col("doc_id") % 2 === 1), "batch1", t0 + 60000)
        val subs = Seq(
          (1L, Seq("spark", "query"), Seq.empty[String]),
          (2L, Seq("fast", "scan"), Seq("slow")),
          (3L, Seq("dup"), Seq.empty[String])
        ).toDF("query_id", "must", "must_not")
        val stream = s.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(landing)
        graft.streaming.StreamCurate.startPercolated(
          stream, subs, s"$root/alerts").awaitTermination()
        s.read.parquet(s"$root/alerts/data").drop("batch_id")
          .orderBy("doc_id", "query_id")
      },
      Some(s"""WITH toks AS (SELECT doc_id, ${Pipeline.DTOKS} AS t FROM documents
                             WHERE doc_id < 200),
               d AS (SELECT doc_id, unnest(list_distinct(t)) AS term FROM toks),
               subs(query_id, must, must_not) AS (VALUES
                 (1, ['spark', 'query'], []::VARCHAR[]),
                 (2, ['fast', 'scan'], ['slow']),
                 (3, ['dup'], []::VARCHAR[])),
               m AS (SELECT DISTINCT query_id, unnest(must) AS term FROM subs),
               nt AS (SELECT query_id, count(*) AS n_must FROM m GROUP BY 1),
               hit AS (SELECT d.doc_id, m.query_id, count(*) AS n_hit
                       FROM d JOIN m USING (term) GROUP BY 1, 2),
               ok AS (SELECT doc_id, hit.query_id FROM hit
                      JOIN nt ON hit.query_id = nt.query_id
                      WHERE n_hit = n_must),
               mn AS (SELECT DISTINCT query_id, unnest(must_not) AS term
                      FROM subs),
               veto AS (SELECT DISTINCT d.doc_id, mn.query_id
                        FROM d JOIN mn USING (term))
               SELECT ok.doc_id, CAST(ok.query_id AS BIGINT) AS query_id
               FROM ok ANTI JOIN veto
                 ON ok.doc_id = veto.doc_id AND ok.query_id = veto.query_id
               ORDER BY doc_id, query_id""")),

    // QUALITY FILTERING at ingest — the C4 scrub then the Gopher rules per
    // micro-batch (StreamCurate.startQualityFiltered), over the doubled
    // curation fixture (docs must clear Gopher's 50-word floor AFTER C4
    // drops their non-terminal lines; 500 docs → 429 pass C4 → 81 pass
    // both, so each recipe bites). Per-document and stateless ⇒ two
    // parity batches streamed equal one batch application — the oracle
    // replays fixture → C4 lines/pages → Gopher signals (6-dp rounding
    // included) → the survivor id list, hash exact.
    Q("q_stream_quality",
      (s, dir) => {
        val root = tmp("stream_quality")
        val landing = s"$root/landing"
        val hconf = s.sparkContext.hadoopConfiguration
        val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(hconf)
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
        val fixture = Pipeline.curationFixture(s, dir, doubled = true)
        try {
          def stage(df: org.apache.spark.sql.DataFrame, name: String,
                    mtime: Long): Unit = {
            val stageDir = s"$root/stage_$name"
            df.coalesce(1).write.mode("overwrite").parquet(stageDir)
            val part = fs.globStatus(
              new org.apache.hadoop.fs.Path(s"$stageDir/part-*")).head.getPath
            val dst = new org.apache.hadoop.fs.Path(s"$landing/$name.parquet")
            fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
            org.apache.hadoop.fs.FileUtil.copy(fs, part, fs, dst, false, hconf)
            fs.setTimes(dst, mtime, -1)
          }
          val t0 = 1700000000000L
          stage(fixture.filter(col("doc_id") % 2 === 0), "batch0", t0)
          stage(fixture.filter(col("doc_id") % 2 === 1), "batch1", t0 + 60000)
          val stream = s.readStream.schema(fixture.schema)
            .option("maxFilesPerTrigger", 1).parquet(landing)
          graft.streaming.StreamCurate.startQualityFiltered(
            stream, s"$root/clean").awaitTermination()
          graft.streaming.StreamCurate.read(s, s"$root/clean")
            .select("doc_id").orderBy("doc_id")
        } finally fixture.unpersist()
      },
      Some(s"""${Pipeline.curationFixtureSql(doubled = true)},
               kl AS (SELECT doc_id, text,
                 list_filter(string_split(text, chr(10)), x ->
                   (ends_with(x, '.') OR ends_with(x, '!')
                    OR ends_with(x, '?') OR ends_with(x, '"'))
                   AND len(list_filter(string_split_regex(x, '\\s+'),
                         y -> len(y) > 0)) >= 5
                   AND NOT contains(lower(x), 'javascript')) AS kl
                 FROM fixture),
               c4 AS (SELECT doc_id,
                        coalesce(array_to_string(kl, chr(10)), '') AS ct
                      FROM kl WHERE len(kl) >= 3
                        AND NOT contains(lower(text), 'lorem ipsum')
                        AND NOT contains(text, '{')),
               w2 AS (SELECT doc_id, ct,
                        list_filter(string_split_regex(ct, '\\s+'),
                          x -> len(x) > 0) AS w,
                        string_split(ct, chr(10)) AS l
                      FROM c4),
               sig AS (SELECT doc_id,
                 len(w)::BIGINT AS n_words,
                 round(list_sum(list_transform(w, x -> len(x)))::DOUBLE
                   / len(w), 6) AS mwl,
                 round(((len(ct) - len(replace(ct, '#', '')))
                   + (len(ct) - len(replace(ct, '...', ''))) // 3)::DOUBLE
                   / len(w), 6) AS sym,
                 round(len(list_filter(l, x -> starts_with(x, '- ')
                   OR starts_with(x, '* ') OR starts_with(x, '• ')))::DOUBLE
                   / len(l), 6) AS bf,
                 round(len(list_filter(l, x -> ends_with(x, '...')))::DOUBLE
                   / len(l), 6) AS ef,
                 round(len(list_filter(w, x ->
                   regexp_matches(x, '[a-zA-Z]')))::DOUBLE / len(w), 6) AS af,
                 len(list_intersect(w, ['the','be','to','of','and','that',
                   'have','with']))::BIGINT AS stops
               FROM w2)
               SELECT doc_id FROM sig
               WHERE n_words BETWEEN 50 AND 100000
                 AND mwl BETWEEN 3.0 AND 10.0 AND sym <= 0.1
                 AND bf <= 0.9 AND ef <= 0.3 AND af >= 0.8 AND stops >= 2
               ORDER BY doc_id""")),

    Q("q_stream_dedup_near",
      (s, dir) => {
        val root = tmp("stream_neardup")
        val landing = s"$root/landing"
        val hconf = s.sparkContext.hadoopConfiguration
        val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(hconf)
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
        val docs = s.read.parquet(s"$dir/documents.parquet")
        val half = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
        // batch order MUST be id order (the store holds "earlier" = smaller
        // ids); FileStreamSource orders by mtime, so stamp them explicitly
        def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
          val stageDir = s"$root/stage_$name"
          df.coalesce(1).write.mode("overwrite").parquet(stageDir)
          val part = fs.globStatus(
            new org.apache.hadoop.fs.Path(s"$stageDir/part-*")).head.getPath
          val dst = new org.apache.hadoop.fs.Path(s"$landing/$name.parquet")
          fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
          org.apache.hadoop.fs.FileUtil.copy(fs, part, fs, dst, false, hconf)
          fs.setTimes(dst, mtime, -1)
        }
        val t0 = 1700000000000L // fixed: deterministic file order
        stage(docs.filter(col("doc_id") <= half), "batch0", t0)
        stage(docs.filter(col("doc_id") > half), "batch1", t0 + 60000)
        val stream = s.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(landing)
        graft.streaming.StreamDedup.start(stream, root).awaitTermination()
        s.read.parquet(s"$root/kept")
          .groupBy("lang").agg(count(lit(1)).as("n")).orderBy("lang")
      },
      Some(s"""WITH toks AS (SELECT doc_id, ${Pipeline.DTOKS} AS t FROM documents),
               sh AS (SELECT doc_id,
                        list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                       FOR i IN range(1, len(t) - 1)]) AS s
                      FROM toks WHERE len(t) >= 3),
               dropped AS (
                 SELECT DISTINCT b.doc_id FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                 WHERE len(list_intersect(a.s, b.s))::DOUBLE /
                       len(list_distinct(list_concat(a.s, b.s))) >= 0.8)
               SELECT lang, count(*) AS n FROM documents
               WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
               GROUP BY lang ORDER BY lang""")),

    // STREAM-STREAM interval join: clicks ⋈ purchases within the following
    // hour, watermarked on BOTH sides so join state is evictable — the
    // event-time range bound is what makes an unbounded two-stream join
    // finite-state. Inner join ⇒ identical rows to the batch join oracle.
    Q("q_stream_stream_join",
      (s, dir) => StreamOps.runStreamStreamJoin(s, dir),
      Some("""SELECT c.user_id, count(*) AS n,
              CAST(sum(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE) AS sv
              FROM (SELECT * FROM events WHERE event_type = 'click') c
              JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
                ON c.user_id = p.user_id
               AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
              GROUP BY c.user_id ORDER BY 1""")),

    // mapGroupsWithState end-to-end: per-user running (count, max) state —
    // the snapshot after the single AvailableNow batch equals the batch
    // aggregate (count/max are fold-order independent, unlike double sums).
    Q("q_stream_stateful",
      (s, dir) => StreamOps.runStreamStateful(s, dir),
      Some("""SELECT user_id, count(*) AS events, max(value) AS max_value
              FROM events GROUP BY user_id ORDER BY user_id""")),

    // STREAMING GAP FILL — stateful LOCF (the q_temporal_gapfill batch
    // dual through flatMapGroupsWithState): two hour-boundary-aligned
    // micro-batches, state = one (hour, value) pair per user, gap rows
    // crossing the batch cut emitted from carried state. Every grid row
    // appears exactly once (Append mode); sums in exact DECIMAL. Oracle
    // = the batch grid + IGNORE NULLS forward fill.
    Q("q_stream_gapfill",
      (s, dir) => StreamOps.runStreamGapFill(s, dir),
      Some("""WITH e AS (SELECT user_id, date_trunc('hour', ts) AS b,
                  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
                FROM events WHERE user_id < 10 GROUP BY 1, 2),
              s AS (SELECT user_id, min(b) AS lo, max(b) AS hi
                    FROM e GROUP BY 1),
              grid AS (SELECT user_id,
                         unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS b
                       FROM s),
              j AS (SELECT g.user_id, g.b, e.v FROM grid g
                    LEFT JOIN e ON g.user_id = e.user_id AND g.b = e.b)
              SELECT user_id, strftime(b, '%Y-%m-%d %H:%M:%S') AS ws,
                last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
                  ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS value,
                v IS NULL AS filled
              FROM j ORDER BY user_id, ws""")),

    // transformWithState (the Spark-4 arbitrary-state API v2 — typed named
    // state handles over the RocksDB provider): the SAME running (count,
    // max) contract as q_stream_stateful, so the two state APIs are pinned
    // to agree with each other and with the batch oracle.
    Q("q_stream_tws",
      (s, dir) => StreamOps.runStreamTws(s, dir),
      Some("""SELECT user_id, count(*) AS events, max(value) AS max_value
              FROM events GROUP BY user_id ORDER BY user_id""")),

    // Session windows (Spark 4 capability upgrade — the reference snapshot
    // predates session_window). Batch-mode gap sessions per user; the oracle
    // derives the same sessions with the lag/cumulative-sum islands idiom.
    Q("q_stream_session",
      (s, dir) => graft.core.EventTime.toTimestamp(Tables(s, dir, "events"))
        .groupBy(session_window(col("ts"), "1 hour").as("sw"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"),
          date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          col("n"))
        .orderBy("user_id", "session_start"),
      Some("""WITH e AS (
                SELECT user_id, ts,
                  CASE WHEN lag(ts) OVER w IS NULL
                        OR ts - lag(ts) OVER w > INTERVAL '1 hour' THEN 1 ELSE 0 END AS new_s
                FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
              s AS (SELECT user_id, ts,
                      sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS sid
                    FROM e)
              SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                     count(*) AS n
              FROM s GROUP BY user_id, sid ORDER BY user_id, session_start"""))
  )
}
