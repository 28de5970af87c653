package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Scalar SQL function surface (SURVEY.md §2.9: string / regex / math /
  * datetime / collection / JSON / hash-sketch functions) plus typed Dataset
  * ops (§2.11) and higher-order array functions.
  *
  * Everything stays inside whole-stage codegen: `functions._` only, no UDFs.
  */
object Scalars extends QueryPack {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)
  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def d(c: Column): Column = c.cast("double")

  def queries: Seq[Q] = Seq(

    Q("q_string",
      (s, dir) => t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_brand")).as("lo"),
        substring(col("p_name"), 1, 5).as("sub"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("trm"),
        lpad(col("p_brand"), 12, "*").as("lp"),
        rpad(col("p_brand"), 12, "*").as("rp"),
        instr(col("p_name"), "a").as("ins"),
        concat_ws("|", col("p_brand"), col("p_type")).as("cw"),
        translate(col("p_type"), "AEO", "aeo").as("tr"),
        levenshtein(col("p_name"), col("p_brand")).as("lev"),
        length(col("p_name")).as("len"),
        reverse(col("p_name")).as("rev"),
        repeat(col("p_brand"), 2).as("rep"),
        regexp_replace(col("p_name"), " ", "_").as("repl"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo,
              substring(p_name, 1, 5) AS sub, trim('  ' || p_name || '  ') AS trm,
              lpad(p_brand, 12, '*') AS lp, rpad(p_brand, 12, '*') AS rp,
              instr(p_name, 'a') AS ins, concat_ws('|', p_brand, p_type) AS cw,
              translate(p_type, 'AEO', 'aeo') AS tr, levenshtein(p_name, p_brand) AS lev,
              length(p_name) AS len, reverse(p_name) AS rev, repeat(p_brand, 2) AS rep,
              replace(p_name, ' ', '_') AS repl
              FROM part ORDER BY p_partkey""")),

    // Second string-function sweep: the DuckDB-expressible remainder of
    // §2.9 (ascii/chr/left/right/locate/substring_index/least/greatest);
    // engine-specific ones (soundex, sentences, parse_url, format_number,
    // initcap) are covered with known-answer tests in ScalarFunctionsSpec.
    Q("q_string2",
      (s, dir) => t(s, dir, "part").select(
        col("p_partkey"),
        ascii(col("p_name")).as("asc"),
        expr("chr(65 + p_partkey % 26)").as("ch"),
        expr("left(p_name, 4)").as("l4"),
        expr("right(p_name, 4)").as("r4"),
        locate("a", col("p_name")).as("loc"),
        substring_index(col("p_type"), " ", 1).as("sx"),
        least(col("p_size"), lit(25)).as("le"),
        greatest(col("p_size"), lit(25)).as("gr"),
        expr("elt(1 + p_partkey % 2, p_brand, p_type)").as("e"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, ascii(p_name) AS asc, chr(CAST(65 + p_partkey % 26 AS INTEGER)) AS ch,
              left(p_name, 4) AS l4, right(p_name, 4) AS r4,
              strpos(p_name, 'a') AS loc, string_split(p_type, ' ')[1] AS sx,
              least(p_size, 25) AS le, greatest(p_size, 25) AS gr,
              CASE WHEN p_partkey % 2 = 0 THEN p_brand ELSE p_type END AS e
              FROM part ORDER BY p_partkey""")),

    // COLLATION-aware comparison semantics (Spark 4, SPARK-46830: COLLATE
    // on the string type — equality/grouping under UTF8_LCASE match
    // case-insensitively INSIDE the engine, no lower() rewrite in user
    // code). Mixed-case derived data so the collation actually decides;
    // outputs are canonicalized through lower() so the arbitrary grouping
    // representative never reaches the hash. The oracle replays with
    // explicit lower() — the observable relation must be identical.
    Q("q_collation",
      (s, dir) => {
        graft.core.Tables.registerViews(s, dir)
        s.sql("""WITH mixed AS (
                   SELECT c_custkey, c_acctbal,
                     CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                          ELSE lower(c_mktsegment) END AS seg
                   FROM customer)
                 SELECT lower(seg COLLATE UTF8_LCASE) AS seg, count(*) AS n,
                   CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal,
                   count(CASE WHEN seg COLLATE UTF8_LCASE = 'Building'
                              THEN 1 END) AS n_bld
                 FROM mixed
                 GROUP BY seg COLLATE UTF8_LCASE
                 ORDER BY seg""")
      },
      Some("""WITH mixed AS (
                SELECT c_custkey, c_acctbal,
                  CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                       ELSE lower(c_mktsegment) END AS seg
                FROM customer)
              SELECT lower(seg) AS seg, count(*) AS n,
                CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal,
                count(CASE WHEN lower(seg) = 'building' THEN 1 END) AS n_bld
              FROM mixed
              GROUP BY lower(seg)
              ORDER BY seg""")),

    // Second datetime sweep: add_months/next_day/unix round-trips.
    Q("q_date2",
      (s, dir) => t(s, dir, "orders").select(
        col("o_orderkey"),
        date_format(add_months(col("o_orderdate").cast("date"), 1), "yyyy-MM-dd").as("am"),
        unix_timestamp(col("o_orderdate")).as("ux"),
        date_format(to_timestamp(unix_timestamp(col("o_orderdate"))), "yyyy-MM-dd HH:mm:ss").as("rt"),
        weekofyear(col("o_orderdate")).as("wk"),
        date_format(next_day(col("o_orderdate").cast("date"), "Monday"), "yyyy-MM-dd").as("nd"))
        .orderBy("o_orderkey").limit(300),
      Some("""SELECT o_orderkey,
              strftime(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH, '%Y-%m-%d') AS am,
              CAST(epoch(o_orderdate) AS BIGINT) AS ux,
              strftime(to_timestamp(epoch(o_orderdate)), '%Y-%m-%d %H:%M:%S') AS rt,
              week(CAST(o_orderdate AS DATE)) AS wk,
              strftime(CAST(o_orderdate AS DATE) + CAST(((8 - isodow(CAST(o_orderdate AS DATE))) % 7 +
                CASE WHEN isodow(CAST(o_orderdate AS DATE)) = 1 THEN 7 ELSE 0 END) AS INTEGER), '%Y-%m-%d') AS nd
              FROM orders ORDER BY o_orderkey LIMIT 300""")),

    // INTERVAL arithmetic (ANSI year-month / day-time intervals, the §2.9
    // CalendarInterval row): date ± INTERVAL, timestamp ± day-time,
    // timestampdiff units. Dates render as strings (determinism contract).
    Q("q_interval",
      (s, dir) => {
        graft.core.Tables.registerViews(s, dir)
        s.sql("""SELECT o_orderkey,
                   date_format(CAST(o_orderdate AS DATE) + INTERVAL '2' MONTH, 'yyyy-MM-dd') AS plus2m,
                   date_format(CAST(o_orderdate AS DATE) - INTERVAL '45' DAY, 'yyyy-MM-dd') AS minus45d,
                   date_format(o_orderdate + INTERVAL '36' HOUR, 'yyyy-MM-dd HH:mm:ss') AS plus36h,
                   timestampdiff(DAY, TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since
                 FROM orders ORDER BY o_orderkey LIMIT 300""")
      },
      Some("""SELECT o_orderkey,
                strftime(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus2m,
                strftime(CAST(o_orderdate AS DATE) - INTERVAL 45 DAY, '%Y-%m-%d') AS minus45d,
                strftime(o_orderdate + INTERVAL 36 HOUR, '%Y-%m-%d %H:%M:%S') AS plus36h,
                datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since
              FROM orders ORDER BY o_orderkey LIMIT 300""")),

    // Null-safe comparison family: `<=>` / IS [NOT] DISTINCT FROM, nvl2,
    // ifnull, nullifzero-style guards — three-valued logic made explicit.
    Q("q_null2",
      (s, dir) => {
        graft.core.Tables.registerViews(s, dir)
        s.sql("""WITH w AS (SELECT o_orderkey,
                     nullif(o_orderstatus, 'O') AS st,
                     nullif(o_orderpriority, '1-URGENT') AS pri
                   FROM orders)
                 SELECT o_orderkey,
                   (st <=> pri) AS ns_eq,
                   (st IS DISTINCT FROM pri) AS dist,
                   nvl2(st, 'open?no', 'open') AS tag,
                   ifnull(st, '-') AS st_or_dash
                 FROM w ORDER BY o_orderkey LIMIT 500""")
      },
      Some("""WITH w AS (SELECT o_orderkey,
                  nullif(o_orderstatus, 'O') AS st,
                  nullif(o_orderpriority, '1-URGENT') AS pri
                FROM orders)
              SELECT o_orderkey,
                (st IS NOT DISTINCT FROM pri) AS ns_eq,
                (st IS DISTINCT FROM pri) AS dist,
                CASE WHEN st IS NOT NULL THEN 'open?no' ELSE 'open' END AS tag,
                coalesce(st, '-') AS st_or_dash
              FROM w ORDER BY o_orderkey LIMIT 500""")),

    // Bitwise surface: & | ^ ~, shifts, bit_count — the hash/bitmap
    // building blocks (simhash, bloom membership) on the SQL surface.
    Q("q_bitwise",
      (s, dir) => {
        graft.core.Tables.registerViews(s, dir)
        s.sql("""SELECT l_orderkey, l_linenumber,
                   (l_orderkey & 255) AS lo_byte,
                   (l_orderkey | 15) AS or15,
                   (l_orderkey ^ l_linenumber) AS xored,
                   CAST(~l_orderkey AS BIGINT) AS flipped,
                   shiftleft(l_linenumber, 3) AS shl,
                   shiftright(l_orderkey, 2) AS shr,
                   bit_count(l_orderkey) AS pop
                 FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 400""")
      },
      Some("""SELECT l_orderkey, l_linenumber,
                (l_orderkey & 255) AS lo_byte,
                (l_orderkey | 15) AS or15,
                CAST(xor(l_orderkey, CAST(l_linenumber AS BIGINT)) AS BIGINT) AS xored,
                (~l_orderkey) AS flipped,
                CAST((l_linenumber << 3) AS INTEGER) AS shl,
                (l_orderkey >> 2) AS shr,
                CAST(bit_count(l_orderkey) AS INTEGER) AS pop
              FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 400""")),

    Q("q_like",
      (s, dir) => t(s, dir, "part").select(
        col("p_partkey"),
        col("p_type").like("PROMO%").as("is_promo"),
        col("p_name").like("%bolt%").as("has_bolt"),
        col("p_name").like("_ed%").as("u1"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_type LIKE 'PROMO%' AS is_promo,
              p_name LIKE '%bolt%' AS has_bolt, p_name LIKE '_ed%' AS u1
              FROM part ORDER BY p_partkey""")),

    Q("q_regex",
      (s, dir) => t(s, dir, "part").select(
        col("p_partkey"),
        regexp_extract(col("p_type"), "^(\\w+)", 1).as("first_word"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("novowel"),
        element_at(split(col("p_name"), " "), 1).as("w1"),
        col("p_type").rlike("^(PROMO|LARGE)").as("m"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, regexp_extract(p_type, '^(\w+)', 1) AS first_word,
              regexp_replace(p_name, '[aeiou]', '', 'g') AS novowel,
              string_split(p_name, ' ')[1] AS w1,
              regexp_matches(p_type, '^(PROMO|LARGE)') AS m
              FROM part ORDER BY p_partkey""")),

    Q("q_math",
      (s, dir) => t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        floor(col("l_extendedprice")).cast("bigint").as("fl"),
        ceil(col("l_extendedprice")).cast("bigint").as("ce"),
        abs(col("l_discount") - 0.05).as("ab"),
        sqrt(col("l_extendedprice")).as("sq"),
        round(log(col("l_extendedprice")), 6).as("ln_"),
        round(log10(col("l_extendedprice")), 6).as("l10"),
        pow(col("l_quantity"), 2).as("p2"),
        (col("l_quantity").cast("bigint") % 7).as("m7"),
        pmod(col("l_quantity").cast("bigint") - 25, lit(7L)).as("pm"),
        signum(col("l_discount") - 0.05).as("sg"))
        .orderBy("l_orderkey", "l_linenumber").limit(300),
      Some("""SELECT l_orderkey, l_linenumber,
              CAST(floor(l_extendedprice) AS BIGINT) AS fl,
              CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
              abs(l_discount - 0.05) AS ab,
              sqrt(l_extendedprice) AS sq,
              round(ln(l_extendedprice), 6) AS ln_,
              round(log10(l_extendedprice), 6) AS l10,
              pow(l_quantity, 2) AS p2,
              CAST(l_quantity AS BIGINT) % 7 AS m7,
              ((CAST(l_quantity AS BIGINT) - 25) % 7 + 7) % 7 AS pm,
              CAST(sign(l_discount - 0.05) AS DOUBLE) AS sg
              FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 300""")),

    Q("q_date",
      (s, dir) => t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dd"),
        quarter(col("o_orderdate")).as("q"),
        dayofyear(col("o_orderdate")).as("doy"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("tm"),
        date_format(date_add(col("o_orderdate").cast("date"), 7), "yyyy-MM-dd").as("d7"),
        datediff(lit("2000-01-01").cast("date"), col("o_orderdate").cast("date")).as("dd2k"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("ld"))
        .orderBy("o_orderkey").limit(300),
      Some("""SELECT o_orderkey,
              year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS dd,
              quarter(o_orderdate) AS q, dayofyear(o_orderdate) AS doy,
              strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS tm,
              strftime(CAST(o_orderdate AS DATE) + 7, '%Y-%m-%d') AS d7,
              date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS dd2k,
              strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS ld
              FROM orders ORDER BY o_orderkey LIMIT 300""")),

    Q("q_array",
      (s, dir) => t(s, dir, "part").select(
        col("p_partkey"),
        array_join(sort_array(split(col("p_name"), " ")), ",").as("sorted_words"),
        array_contains(split(col("p_name"), " "), "bolt").as("has_bolt"),
        size(split(col("p_name"), " ")).as("n_words"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
              array_to_string(list_sort(string_split(p_name, ' ')), ',') AS sorted_words,
              list_contains(string_split(p_name, ' '), 'bolt') AS has_bolt,
              len(string_split(p_name, ' ')) AS n_words
              FROM part ORDER BY p_partkey""")),

    // Spark 3.4/4 collection additions (array_compact/insert/append/
    // prepend, array_distinct/position, arrays_zip via struct access) —
    // DuckDB's list_* family replays each. get() returns NULL out of
    // bounds (vs element_at's ANSI error), the lenient accessor.
    Q("q_array2",
      (s, dir) => {
        graft.core.Tables.registerViews(s, dir)
        s.sql("""WITH tt AS (SELECT p_partkey, split(p_name, ' ') AS toks
                             FROM part)
                 SELECT p_partkey,
                   array_join(array_compact(array_insert(toks, 1, NULL)), ',') AS compacted,
                   array_join(array_append(array_prepend(toks, 'S'), 'E'), ',') AS fenced,
                   array_join(sort_array(array_distinct(toks)), ',') AS dedupd,
                   array_position(toks, 'bolt') AS bolt_at,
                   get(toks, 99) AS oob
                 FROM tt ORDER BY p_partkey""")
      },
      Some("""WITH tt AS (SELECT p_partkey, string_split(p_name, ' ') AS toks
                          FROM part)
              SELECT p_partkey,
                array_to_string(list_filter(list_prepend(NULL, toks), x -> x IS NOT NULL), ',') AS compacted,
                array_to_string(list_append(list_prepend('S', toks), 'E'), ',') AS fenced,
                array_to_string(list_sort(list_distinct(toks)), ',') AS dedupd,
                CAST(coalesce(list_position(toks, 'bolt'), 0) AS BIGINT) AS bolt_at,
                toks[100] AS oob
              FROM tt ORDER BY p_partkey""")),

    // ANSI-mode-safe TRY arithmetic (Spark 3.2+ try_divide/try_cast/
    // try_add): errors become NULL instead of runtime failures — how a
    // 100 TB batch survives one malformed row. DuckDB replays with CASE
    // guards + its own try_cast. SCALE note: try_* error-to-NULL is
    // EXCEPTION-driven per miss — the un-bounded first cut of this query
    // ran 600k divisions with 150k thrown-and-caught DIVIDE_BY_ZERO
    // exceptions and took 9 s at sf0.1; a zero-HEAVY column wants the
    // explicit CASE guard (identical semantics, no throw). The bound
    // keeps the row a semantics pin, not an exception benchmark.
    Q("q_try",
      (s, dir) => {
        graft.core.Tables.registerViews(s, dir)
        s.sql("""SELECT l_orderkey, l_linenumber,
                   CAST(round(try_divide(CAST(l_quantity AS DECIMAL(18,2)),
                              CAST(l_linenumber - 1 AS DECIMAL(18,2))), 4)
                     AS DOUBLE) AS per_prev,
                   try_cast(l_returnflag AS INT) AS flag_n,
                   try_cast(CAST(l_quantity AS STRING) AS DOUBLE) AS qty_rt
                 FROM lineitem
                 WHERE l_orderkey <= 500
                 ORDER BY l_orderkey, l_linenumber LIMIT 200""")
      },
      Some("""SELECT l_orderkey, l_linenumber,
                CAST(round(CASE WHEN l_linenumber = 1 THEN NULL
                     ELSE CAST(l_quantity AS DECIMAL(18,2)) /
                          (l_linenumber - 1) END, 4) AS DOUBLE) AS per_prev,
                try_cast(l_returnflag AS INT) AS flag_n,
                try_cast(CAST(l_quantity AS VARCHAR) AS DOUBLE) AS qty_rt
              FROM lineitem
              WHERE l_orderkey <= 500
              ORDER BY l_orderkey, l_linenumber LIMIT 200""")),

    Q("q_explode",
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey"), explode(split(col("p_name"), " ")).as("w"))
        .orderBy("p_partkey", "w"),
      Some("""SELECT p_partkey, unnest(string_split(p_name, ' ')) AS w
              FROM part ORDER BY p_partkey, w""")),

    // Generator/TVF surface beyond plain explode: posexplode through
    // LATERAL VIEW (the reference's Generate operator,
    // catalyst/.../plans/logical/basicLogicalOperators.scala Generate) —
    // ordinal-preserving flattening, the shape token-position pipelines
    // need. Oracle replays the ordinal with a DuckDB list comprehension.
    Q("q_tvf_posexplode",
      (s, dir) => {
        graft.core.Tables.registerViews(s, dir)
        s.sql("""WITH tt AS (SELECT p_partkey, split(p_name, ' ') AS toks
                             FROM part)
                 SELECT p_partkey, pos, tok
                 FROM tt LATERAL VIEW posexplode(toks) x AS pos, tok
                 ORDER BY p_partkey, pos""")
      },
      Some("""WITH tt AS (SELECT p_partkey, string_split(p_name, ' ') AS toks
                          FROM part),
              ex AS (SELECT p_partkey,
                       unnest([{'pos': i - 1, 'tok': toks[i]}
                               FOR i IN range(1, len(toks) + 1)]) AS u
                     FROM tt)
              SELECT p_partkey, CAST(u.pos AS INT) AS pos, u.tok AS tok
              FROM ex ORDER BY p_partkey, pos""")),

    // stack() — the generator spelling of UNPIVOT (n-row constant fan-out
    // per input row, reference Generate + the unpivot rewrite). Oracle is
    // the UNION ALL it desugars to.
    Q("q_tvf_stack",
      (s, dir) => {
        graft.core.Tables.registerViews(s, dir)
        s.sql("""SELECT p_partkey, k, v FROM (
                   SELECT p_partkey,
                     stack(2, 'size', CAST(p_size AS DOUBLE),
                              'price', p_retailprice) AS (k, v)
                   FROM part)
                 ORDER BY p_partkey, k""")
      },
      Some("""SELECT p_partkey, k, v FROM (
                SELECT p_partkey, 'size' AS k, CAST(p_size AS DOUBLE) AS v
                FROM part
                UNION ALL
                SELECT p_partkey, 'price', p_retailprice FROM part)
              ORDER BY p_partkey, k""")),

    Q("q_higher_order",
      (s, dir) => {
        val toks = split(col("p_name"), " ")
        t(s, dir, "part").select(
          col("p_partkey"),
          size(filter(toks, tk => length(tk) > lit(4))).as("n_long"),
          aggregate(toks, lit(0), (acc, tk) => acc + length(tk)).as("chars"),
          array_join(transform(toks, tk => upper(tk)), ",").as("ups"),
          exists(toks, tk => tk === lit("bolt")).as("has_bolt"))
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey,
              len(list_filter(string_split(p_name, ' '), tk -> length(tk) > 4)) AS n_long,
              CAST(list_sum(list_transform(string_split(p_name, ' '), tk -> length(tk))) AS INTEGER) AS chars,
              array_to_string(list_transform(string_split(p_name, ' '), tk -> upper(tk)), ',') AS ups,
              list_contains(string_split(p_name, ' '), 'bolt') AS has_bolt
              FROM part ORDER BY p_partkey""")),

    Q("q_map",
      (s, dir) => t(s, dir, "region").select(
        col("r_regionkey"),
        array_join(sort_array(map_keys(map(lit("a"), lit(1), lit("b"), lit(2)))), ",").as("ks"),
        size(map(lit("a"), lit(1), lit("b"), lit(2))).as("n"),
        aggregate(map_values(map(lit("a"), lit(1), lit("b"), lit(2))), lit(0), (a, v) => a + v).as("vsum"))
        .orderBy("r_regionkey"),
      Some("""SELECT r_regionkey,
              array_to_string(list_sort(map_keys(map(['a','b'], [1,2]))), ',') AS ks,
              cardinality(map(['a','b'], [1,2])) AS n,
              CAST(list_sum(map_values(map(['a','b'], [1,2]))) AS INTEGER) AS vsum
              FROM region ORDER BY r_regionkey""")),

    Q("q_json",
      (s, dir) => t(s, dir, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id").limit(500),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
              FROM events ORDER BY event_id LIMIT 500""")),

    // json_tuple generator (reference jsonExpressions.scala:328) and
    // from_json → typed struct (Spark-4 upgrade the reference lacked).
    Q("q_json_tuple",
      (s, dir) => {
        t(s, dir, "events").createOrReplaceTempView("events_jt")
        s.sql("""SELECT event_id, CAST(jt.k0 AS INT) AS k,
                        from_json(props, 'k INT').k AS k2
                 FROM events_jt
                 LATERAL VIEW json_tuple(props, 'k') jt AS k0
                 ORDER BY event_id LIMIT 500""")
      },
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
              CAST(json_extract_string(props, '$.k') AS INTEGER) AS k2
              FROM events ORDER BY event_id LIMIT 500""")),

    // XML scalar surface (from_xml + xpath family, built-in in Spark 4 —
    // the reference era needed spark-xml). The XML is CONSTRUCTED from the
    // row's own columns, parsed back with an explicit schema, and xpath
    // extracts one field a second way; the oracle asserts the round-trip
    // by selecting the source columns directly (DuckDB has no XML parser —
    // equality of the parsed values IS the check). Pure per-row projection:
    // no shuffle, no UDF.
    Q("q_xml",
      (s, dir) => t(s, dir, "events").orderBy("event_id").limit(500)
        .select(col("event_id"),
          concat(lit("<r><i>"), col("event_id"), lit("</i><t>"),
            col("event_type"), lit("</t></r>")).as("xml"))
        .select(col("event_id"),
          from_xml(col("xml"), lit("i BIGINT, t STRING")).as("v"),
          expr("xpath_long(xml, '/r/i')").as("xp"))
        .select(col("event_id"), col("v.i").as("i"), col("v.t").as("t"),
          col("xp"))
        .orderBy("event_id"),
      Some("""SELECT event_id, event_id AS i, event_type AS t, event_id AS xp
              FROM (SELECT event_id, event_type FROM events ORDER BY event_id LIMIT 500)
              ORDER BY event_id""")),

    // VARIANT (Spark 4 semi-structured type — capability upgrade over the
    // reference's string-JSON-only path, like session windows/watermarks):
    // props parsed ONCE into the binary variant encoding, then typed
    // variant_get extraction. At scale this is the open-schema column
    // pattern: parse at ingest, store variant, extract without re-parsing
    // per query. The oracle reads the same values via DuckDB's JSON path.
    Q("q_variant",
      (s, dir) => t(s, dir, "events")
        .select(col("event_id"),
          expr("variant_get(parse_json(props), '$.k', 'int')").as("k"))
        .filter(col("k").isNotNull)
        .groupBy(pmod(col("k"), lit(10)).as("kmod"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy("kmod"),
      Some("""WITH x AS (SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
                         FROM events)
              SELECT (k % 10 + 10) % 10 AS kmod, count(*) AS n,
                CAST(sum(k) AS BIGINT) AS sum_k
              FROM x WHERE k IS NOT NULL
              GROUP BY 1 ORDER BY 1""")),

    // DataFrameNaFunctions (reference DataFrameNaFunctions.scala:44): nulls
    // synthesized via nullif, then drop/fill exercised in one pass.
    Q("q_na",
      (s, dir) => {
        val withNulls = t(s, dir, "orders")
          .withColumn("st", expr("nullif(o_orderstatus, 'O')"))
          .withColumn("price_hi", when(col("o_totalprice") > 100000, col("o_totalprice")))
        val filled = withNulls.na.fill(Map("st" -> "OPEN", "price_hi" -> 0.0))
        val dropped = withNulls.na.drop(Seq("price_hi"))
        filled.groupBy("st").agg(
            count(lit(1)).as("n"),
            sum(col("price_hi").cast("decimal(18,2)")).cast("double").as("hi_total"))
          .join(dropped.agg(count(lit(1)).as("n_hi_rows")))
          .orderBy("st")
      },
      Some("""WITH w AS (SELECT nullif(o_orderstatus,'O') AS st,
                     CASE WHEN o_totalprice > 100000 THEN o_totalprice END AS price_hi
                   FROM orders)
              SELECT coalesce(st, 'OPEN') AS st, count(*) AS n,
                CAST(sum(CAST(coalesce(price_hi, 0.0) AS DECIMAL(18,2))) AS DOUBLE) AS hi_total,
                (SELECT count(*) FROM w WHERE price_hi IS NOT NULL) AS n_hi_rows
              FROM w GROUP BY 1 ORDER BY st""")),

    // Sketches: engines use different algorithms, so the contract is a
    // relative-error bound computed inside each engine (both emit true).
    // Two separate 1-row aggregations joined at the end: mixing DISTINCT
    // aggregates with buffering sketch aggregates in one Aggregate forces an
    // Expand + sort-based ObjectHashAggregate that re-serializes the sketch
    // buffers per group — ~100× slower than the two clean plans.
    Q("q_approx",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt, col("l_orderkey"))
        val acd = li.agg(
          (abs(approx_count_distinct(col("l_partkey")) - countDistinct(col("l_partkey")))
            <= countDistinct(col("l_partkey")) * 0.05).as("acd_ok"))
        val pct = li.agg(
          (abs(percentile_approx(col("l_quantity"), lit(0.5), lit(10000))
            - expr("percentile(l_quantity, 0.5)")) <= lit(2.0)).as("pct_ok"))
        acd.crossJoin(pct)
      },
      Some("""SELECT
              (abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
                 <= count(DISTINCT l_partkey) * 0.05) AS acd_ok,
              (abs(approx_quantile(l_quantity, 0.5) - median(l_quantity)) <= 2.0) AS pct_ok
              FROM lineitem""")),

    // approx_top_k (Spark 4.1 frequent-items sketch): heavy-hitter counts
    // in ONE pass without a full GROUP BY shuffle of the key space — at
    // 100 TB the sketch is the only way to top-k a high-cardinality column
    // without materializing every group. On a low-cardinality column
    // (5 priorities ≪ the sketch's capacity) the counts are EXACT, so the
    // result is deterministic and the oracle is the plain GROUP BY.
    Q("q_approx_topk",
      (s, dir) => t(s, dir, "orders")
        .agg(expr("approx_top_k(o_orderpriority, 5)").as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.item").as("item"), col("e.count").as("n"))
        .orderBy("item"),
      Some("""SELECT o_orderpriority AS item, count(*) AS n
              FROM orders GROUP BY o_orderpriority ORDER BY item""")),

    // MERGEABLE sketches — the 100 TB cardinality pattern: per-group HLL
    // sketches (DataSketches) built in one pass can be UNIONED later
    // without rescanning (per-day/per-partition rollups composing into
    // corpus stats). Contract: the merged estimate carries the SAME error
    // bound as a direct global sketch — both within 5% (≈3σ at lgK=12) of
    // the exact distinct, and within 2% of each other (union targets
    // wider HLL_8 registers than the HLL_4 build, so estimates are near-
    // identical, not bit-equal). The oracle engine has no compatible
    // sketch format → both sides emit the verdict (q_approx pattern).
    Q("q_approx_merge",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val perFlag = li.groupBy("l_returnflag")
          .agg(hll_sketch_agg(col("l_orderkey")).as("sk"))
        val merged = perFlag.agg(
          hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_merged"))
        val global = li.agg(
          hll_sketch_estimate(hll_sketch_agg(col("l_orderkey"))).as("est_global"),
          countDistinct(col("l_orderkey")).as("exact"))
        merged.crossJoin(global).select(
          (abs(col("est_merged") - col("est_global")) <= col("exact") * 0.02)
            .as("merge_close"),
          (abs(col("est_merged") - col("exact")) <= col("exact") * 0.05).as("merged_ok"),
          (abs(col("est_global") - col("exact")) <= col("exact") * 0.05).as("global_ok"))
      },
      Some("SELECT true AS merge_close, true AS merged_ok, true AS global_ok")),

    // Spark skewness/kurtosis are population moments (m3/m2^1.5, m4/m2²−3);
    // DuckDB's are bias-corrected sample statistics — spell the population
    // formula out in the oracle (round(4): two-pass vs streaming moments
    // agree well past 4 decimals).
    // Ordered-set + linear-regression aggregates (Spark 3.3/3.4: mode,
    // median, percentile_cont WITHIN GROUP, regr_slope/intercept/r2).
    // mode() is computed over l_linenumber, whose per-group mode is UNIQUE
    // (every order contributes line 1), so the tie-breaking difference
    // between engines can never surface; regression outputs are rounded
    // (double accumulation order differs across engines).
    Q("q_agg_stats2",
      (s, dir) => {
        graft.core.Tables.registerViews(s, dir)
        s.sql("""SELECT l_returnflag,
                   mode(l_linenumber) AS line_mode,
                   median(l_quantity) AS qty_med,
                   percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity) AS qty_q1,
                   round(regr_slope(l_extendedprice, l_quantity), 3) AS slope,
                   round(regr_intercept(l_extendedprice, l_quantity), 3) AS icept,
                   round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
                 FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
      },
      Some("""SELECT l_returnflag,
                mode(l_linenumber) AS line_mode,
                median(l_quantity) AS qty_med,
                quantile_cont(l_quantity, 0.25) AS qty_q1,
                round(regr_slope(l_extendedprice, l_quantity), 3) AS slope,
                round(regr_intercept(l_extendedprice, l_quantity), 3) AS icept,
                round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    Q("q_stats",
      (s, dir) => t(s, dir, "lineitem").agg(
        round(stddev_samp(col("l_quantity")), 6).as("sd"),
        round(var_samp(col("l_quantity")), 6).as("vr"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("cr"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("cv"),
        round(skewness(col("l_quantity")), 4).as("sk"),
        round(kurtosis(col("l_quantity")), 4).as("ku")),
      Some("""WITH s AS (SELECT avg(l_quantity) AS mu, count(*) AS n FROM lineitem),
              m AS (SELECT sum(pow(l_quantity - mu, 2))/any_value(n) AS m2,
                           sum(pow(l_quantity - mu, 3))/any_value(n) AS m3,
                           sum(pow(l_quantity - mu, 4))/any_value(n) AS m4
                    FROM lineitem, s)
              SELECT round(stddev_samp(l_quantity), 6) AS sd,
              round(var_samp(l_quantity), 6) AS vr,
              round(corr(l_quantity, l_extendedprice), 6) AS cr,
              round(covar_samp(l_quantity, l_extendedprice), 4) AS cv,
              round(any_value(m3/pow(m2, 1.5)), 4) AS sk,
              round(any_value(m4/(m2*m2) - 3.0), 4) AS ku
              FROM lineitem, m""")),

    // Ordered / positional aggregates (Spark 3.4–4.0 additions a
    // reference user migrating forward gets for free): mode (ties break
    // deterministically low via the orderable pair-max trick on both
    // engines), median, percentile_cont/disc interpolation, and listagg
    // (SQL:2023, Spark 4.0) with an explicit WITHIN GROUP order so the
    // concatenation is reproducible.
    Q("q_agg_ordered",
      (s, dir) => {
        graft.core.Tables.registerViews(s, dir)
        s.sql("""SELECT o_orderpriority,
                   median(CAST(o_totalprice AS DOUBLE)) AS med,
                   percentile_cont(0.25) WITHIN GROUP (ORDER BY CAST(o_totalprice AS DOUBLE)) AS p25,
                   percentile_disc(0.25) WITHIN GROUP (ORDER BY CAST(o_totalprice AS DOUBLE)) AS p25d,
                   min(o_orderstatus) AS lo_status,
                   listagg(DISTINCT o_orderstatus, ',')
                     WITHIN GROUP (ORDER BY o_orderstatus) AS statuses
                 FROM orders GROUP BY o_orderpriority
                 ORDER BY o_orderpriority""")
      },
      Some("""SELECT o_orderpriority,
                median(CAST(o_totalprice AS DOUBLE)) AS med,
                percentile_cont(0.25) WITHIN GROUP (ORDER BY CAST(o_totalprice AS DOUBLE)) AS p25,
                percentile_disc(0.25) WITHIN GROUP (ORDER BY CAST(o_totalprice AS DOUBLE)) AS p25d,
                min(o_orderstatus) AS lo_status,
                string_agg(DISTINCT o_orderstatus, ','
                  ORDER BY o_orderstatus) AS statuses
              FROM orders GROUP BY o_orderpriority
              ORDER BY o_orderpriority""")),

    // GROUP BY ALL / ORDER BY ALL + lateral column aliases (Spark 3.4+,
    // the DuckDB-originated conveniences): grouping keys inferred from
    // the select list, a projected alias referenced by a later column.
    Q("q_group_by_all",
      (s, dir) => {
        graft.core.Tables.registerViews(s, dir)
        s.sql("""SELECT l_returnflag,
                   l_linestatus,
                   sum(l_quantity) AS qty,
                   count(*) AS n
                 FROM lineitem
                 GROUP BY ALL
                 ORDER BY ALL""")
      },
      Some("""SELECT l_returnflag, l_linestatus,
                sum(l_quantity) AS qty, count(*) AS n
              FROM lineitem GROUP BY ALL ORDER BY ALL""")),

    // Lateral column alias: a select-list alias referenced by later
    // expressions in the SAME select list (Spark 3.4, SPARK-27561).
    Q("q_lateral_alias",
      (s, dir) => {
        graft.core.Tables.registerViews(s, dir)
        s.sql("""SELECT l_orderkey,
                   CAST(CAST(sum(l_extendedprice * (1 - l_discount)) AS DECIMAL(18,2)) AS DOUBLE) AS revenue,
                   CASE WHEN revenue > 400000 THEN 'large' ELSE 'small' END AS band
                 FROM lineitem GROUP BY l_orderkey
                 ORDER BY revenue DESC, l_orderkey LIMIT 20""")
      },
      Some("""WITH r AS (SELECT l_orderkey,
                CAST(CAST(sum(l_extendedprice * (1 - l_discount)) AS DECIMAL(18,2)) AS DOUBLE) AS revenue
              FROM lineitem GROUP BY l_orderkey)
              SELECT l_orderkey, revenue,
                CASE WHEN revenue > 400000 THEN 'large' ELSE 'small' END AS band
              FROM r ORDER BY revenue DESC, l_orderkey LIMIT 20""")),

    Q("q_collect",
      (s, dir) => t(s, dir, "customer")
        .groupBy("c_nationkey")
        .agg(array_join(sort_array(collect_list(col("c_name"))), ",").as("names"),
          array_join(sort_array(collect_set(col("c_mktsegment"))), ",").as("segs"))
        .orderBy("c_nationkey"),
      Some("""SELECT c_nationkey,
              array_to_string(list_sort(list(c_name)), ',') AS names,
              array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segs
              FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""")),

    // crc32 is exercised in the ScalaTest suite instead: DuckDB 1.0 (the
    // oracle engine) has no crc32 function.
    Q("q_hash",
      (s, dir) => t(s, dir, "part").select(
        col("p_partkey"),
        md5(col("p_name")).as("m5"),
        sha2(col("p_name"), 256).as("s2"),
        base64(col("p_name").cast("binary")).as("b64"),
        unbase64(base64(col("p_name").cast("binary"))).cast("string").as("rt"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, md5(p_name) AS m5, sha256(p_name) AS s2,
              to_base64(encode(p_name)) AS b64,
              p_name AS rt
              FROM part ORDER BY p_partkey"""))
  )
}
