package graft.operators

import graft.{QueryPack, Tables => T}
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function surface (SURVEY.md §2.10): string / math / temporal /
  * conditional / JSON / cast families, UDTF-style correlate (explode /
  * posexplode), PARSE_URL, hash functions, plus the Flink-only scalars
  * implemented in GraftFunctions (SPLIT_INDEX, HASH_CODE, TRUNCATE,
  * IS_DECIMAL/...).
  *
  * Reference: FlinkSqlOperatorTable.java (~230 ops),
  * BuiltInFunctionDefinitions.java, SqlFunctionUtils.java.
  * All expressions here stay inside whole-stage codegen (pure
  * `functions._` / catalyst expressions, no UDFs).
  */
object ScalarFunctionPack extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_string_funcs" -> ((s, d) => {
      import s.implicits._
      T.part(s, d).select(
        $"p_partkey",
        length($"p_name").as("len"),
        upper($"p_name").as("up"),
        lower($"p_brand").as("lo"),
        substring($"p_name", 2, 3).as("sub"),
        reverse($"p_name").as("rev"),
        lpad($"p_type", 10, "*").as("lpadded"),
        rpad($"p_type", 10, "*").as("rpadded"),
        regexp_replace($"p_name", "a", "@").as("rep"),
        concat_ws("|", $"p_brand", $"p_type").as("cw"),
        expr("left(p_name, 3)").as("l3"),
        expr("right(p_name, 3)").as("r3"),
        instr($"p_name", "e").as("pos"),
        repeat($"p_brand", 2).as("rpt"),
        ascii($"p_name").as("asc"),
        GraftFunctions.split_index($"p_name", " ", 1).as("word2"),
        trim(concat(lit("  "), $"p_brand", lit("  "))).as("trimmed"),
        ltrim(concat(lit("  "), $"p_brand")).as("ltrimmed"),
        overlay($"p_name", lit("XX"), lit(2)).as("ovl"))
    }),

    "q_math_funcs" -> ((s, d) => {
      import s.implicits._
      T.part(s, d).select(
        $"p_partkey",
        abs($"p_retailprice" - 1000.0).as("a"),
        ceil($"p_retailprice").as("ce"),
        floor($"p_retailprice").as("fl"),
        round($"p_retailprice", 2).as("rnd"),
        pow($"p_size", 2).as("pw"),
        sqrt($"p_retailprice").as("sq"),
        exp($"p_size" / 100.0).as("ex"),
        log($"p_retailprice").as("lg"),
        log10($"p_retailprice").as("l10"),
        signum($"p_retailprice" - 1000.0).as("sgn"),
        ($"p_size" % 7).as("md"),
        GraftFunctions.truncate($"p_retailprice", 1).as("tr"))
    }),

    "q_temporal_funcs" -> ((s, d) => {
      import s.implicits._
      T.orders(s, d).select(
        $"o_orderkey",
        year($"o_orderdate").cast("int").as("yr"),
        quarter($"o_orderdate").cast("int").as("qt"),
        month($"o_orderdate").cast("int").as("mo"),
        dayofmonth($"o_orderdate").cast("int").as("dy"),
        dayofweek($"o_orderdate").cast("int").as("dow"),
        weekofyear($"o_orderdate").cast("int").as("wk"),
        date_trunc("month", $"o_orderdate").as("dtm"),
        ($"o_orderdate" + expr("INTERVAL 5 DAYS")).as("plus5"),
        datediff($"o_orderdate", lit("1995-01-01")).cast("int").as("dd"),
        last_day($"o_orderdate").as("lastday"),
        date_format($"o_orderdate", "yyyy-MM-dd").as("fmt"))
    }),

    "q_conditional" -> ((s, d) => {
      import s.implicits._
      T.orders(s, d).select(
        $"o_orderkey",
        nullif($"o_orderstatus", lit("P")).as("nn"),
        coalesce(nullif($"o_orderstatus", lit("P")), lit("X")).as("cc"),
        when($"o_totalprice" > 200000.0, "big").otherwise("small").as("sz"),
        greatest($"o_totalprice", lit(100000.0)).as("gl"),
        least($"o_totalprice", lit(100000.0)).as("ll"),
        ($"o_orderstatus" <=> "F").as("nsafe"))
    }),

    "q_json_funcs" -> ((s, d) => {
      import s.implicits._
      T.events(s, d).select(
        $"event_id",
        get_json_object($"props", "$.k").as("k_str"),
        get_json_object($"props", "$.k").cast("int").as("k_int"),
        to_json(struct($"user_id")).as("jo"))
    }),

    "q_try_cast" -> ((s, d) => {
      T.part(s, d).selectExpr(
        "p_partkey",
        "try_cast(p_type AS INT) AS bad_int",
        "try_cast(CAST(p_size AS STRING) AS INT) AS good_int",
        "try_divide(p_retailprice, p_size - p_size) AS div0",
        "try_cast(split_part(p_brand, '#', 2) AS INT) AS brand_no")
    }),

    "q_hash_funcs" -> ((s, d) => {
      import s.implicits._
      T.customer(s, d).select(
        $"c_custkey",
        md5($"c_name").as("m"),
        sha2($"c_name", 256).as("s2"),
        base64($"c_name".cast("binary")).as("b64"),
        GraftFunctions.hash_code($"c_mktsegment").as("hc"),
        GraftFunctions.is_digit(expr("split_part(c_name, '#', 2)")).as("isdig"),
        GraftFunctions.is_alpha($"c_mktsegment").as("isalp"),
        GraftFunctions.is_decimal(
          concat(($"c_custkey" % 100).cast("string"), lit("."),
            ($"c_custkey" % 10).cast("string"))).as("isdec"))
    }),

    // Correlate / UDTF: UNNEST -> explode.
    "q_explode" -> ((s, d) => {
      import s.implicits._
      T.part(s, d).select($"p_partkey",
        explode(split($"p_name", " ")).as("word"))
    }),

    "q_posexplode" -> ((s, d) => {
      import s.implicits._
      T.part(s, d).select($"p_partkey",
        posexplode(split($"p_name", " ")))
        .withColumnRenamed("col", "word")
    }),

    // Trig / hyperbolic / base-conversion math (FlinkSqlOperatorTable
    // SIN..ATAN2, SINH/COSH/TANH, DEGREES/RADIANS, BIN/HEX).
    "q_math_funcs2" -> ((s, d) => {
      import s.implicits._
      val x = $"p_size" / 10.0
      T.part(s, d).select(
        $"p_partkey",
        sin(x).as("sn"), cos(x).as("cs"), tan(x).as("tn"),
        atan2($"p_size".cast("double"), lit(2.0)).as("at2"),
        sinh(x).as("snh"), cosh(x).as("csh"), tanh(x).as("tnh"),
        degrees(x).as("deg"), radians($"p_size").as("rad"),
        bin($"p_size".cast("long")).as("bn"),
        hex($"p_size").as("hx"),
        pmod($"p_size" - 25, lit(7)).as("pm"))
    }),

    // chr/encode/base64 roundtrips, locate, str_to_map (as sorted JSON).
    "q_string_funcs2" -> ((s, d) => {
      import s.implicits._
      T.part(s, d).select(
        $"p_partkey",
        chr(lit(65) + ($"p_size" % 26)).as("ch"),
        unbase64(base64($"p_name".cast("binary"))).cast("string").as("b64rt"),
        locate("a", $"p_name").as("loc"),
        to_json(str_to_map(
          concat(lit("a:"), $"p_size", lit(",b:"), $"p_partkey")))
          .as("m"),
        translate($"p_name", "aeiou", "AEIOU").as("tr"),
        initcap($"p_name").as("ic"))
    }),

    // Third string batch: OVERLAY, SPLIT_INDEX, ASCII, BIN/HEX,
    // LEFT/RIGHT, REPEAT, REVERSE (FlinkSqlOperatorTable rows not yet
    // exercised by q_string_funcs/q_string_funcs2).
    "q_string_funcs3" -> ((s, d) => {
      import s.implicits._
      T.part(s, d).select(
        $"p_partkey",
        overlay($"p_name", lit("XX"), lit(3)).as("ov"),
        element_at(split($"p_name", " "), 2).as("split_idx"),
        ascii(substring($"p_name", 1, 1)).as("asc"),
        bin($"p_size").as("bn"),
        upper(hex($"p_size")).as("hx"),
        substring($"p_name", 1, 4).as("l4"),
        expr("right(p_name, 4)").as("r4"),
        repeat($"p_brand", 2).as("rep"),
        reverse($"p_name").as("rev"))
    }),

    // Collection functions: ARRAY_UNION/INTERSECT/EXCEPT, FLATTEN,
    // CARDINALITY, map construction (§2.10 collection rows). Array
    // results are sort+join scalar-encoded for the cross-engine hash.
    "q_collection_funcs" -> ((s, d) => {
      import s.implicits._
      val ws = graft.ext.TextOps.distinctTokens($"text")
      val lita = array(lit("the"), lit("data"), lit("spark"))
      T.documents(s, d).select(
        $"doc_id",
        array_join(array_sort(array_union(ws, lita)), ",").as("un"),
        array_join(array_sort(array_intersect(ws, lita)), ",").as("inter"),
        array_join(array_sort(array_except(ws, lita)), ",").as("ex"),
        array_join(flatten(array(slice(graft.ext.TextOps.tokens($"text"), 1, 3),
          slice(graft.ext.TextOps.tokens($"text"), 4, 3))), ",").as("fl"),
        size(map_from_arrays(slice(ws, 1, 3), slice(ws, 1, 3)))
          .cast("long").as("card"))
    }),

    "q_parse_url" -> ((s, d) => {
      import s.implicits._
      val url = concat(lit("https://"), lower($"c_mktsegment"),
        lit(".example.com/u/"), $"c_custkey".cast("string"),
        lit("?seg="), lower($"c_mktsegment"))
      T.customer(s, d).select(
        $"c_custkey",
        parse_url(url, lit("HOST")).as("host"),
        parse_url(url, lit("PATH")).as("path"),
        parse_url(url, lit("QUERY"), lit("seg")).as("qval"))
    })
  )

  def oracle: Map[String, String] = Map(
    "q_string_funcs" ->
      """SELECT p_partkey,
         CAST(length(p_name) AS INT) AS len,
         upper(p_name) AS up, lower(p_brand) AS lo,
         substr(p_name, 2, 3) AS sub, reverse(p_name) AS rev,
         lpad(p_type, 10, '*') AS lpadded, rpad(p_type, 10, '*') AS rpadded,
         replace(p_name, 'a', '@') AS rep,
         concat_ws('|', p_brand, p_type) AS cw,
         left(p_name, 3) AS l3, right(p_name, 3) AS r3,
         CAST(instr(p_name, 'e') AS INT) AS pos,
         repeat(p_brand, 2) AS rpt,
         CAST(ascii(p_name) AS INT) AS asc,
         split_part(p_name, ' ', 2) AS word2,
         trim('  ' || p_brand || '  ') AS trimmed,
         ltrim('  ' || p_brand) AS ltrimmed,
         substr(p_name, 1, 1) || 'XX' || substr(p_name, 4) AS ovl
         FROM part""",
    "q_math_funcs" ->
      """SELECT p_partkey,
         abs(p_retailprice - 1000.0) AS a,
         CAST(ceil(p_retailprice) AS BIGINT) AS ce,
         CAST(floor(p_retailprice) AS BIGINT) AS fl,
         round(p_retailprice, 2) AS rnd,
         p_size ** 2 AS pw,
         sqrt(p_retailprice) AS sq,
         exp(p_size / 100.0) AS ex,
         ln(p_retailprice) AS lg,
         log10(p_retailprice) AS l10,
         CAST(sign(p_retailprice - 1000.0) AS DOUBLE) AS sgn,
         CAST(p_size % 7 AS INT) AS md,
         floor(abs(p_retailprice) * 10) / 10 * sign(p_retailprice) AS tr
         FROM part""",
    "q_temporal_funcs" ->
      """SELECT o_orderkey,
         CAST(year(o_orderdate) AS INT) AS yr,
         CAST(quarter(o_orderdate) AS INT) AS qt,
         CAST(month(o_orderdate) AS INT) AS mo,
         CAST(day(o_orderdate) AS INT) AS dy,
         CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
         CAST(week(o_orderdate) AS INT) AS wk,
         CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS dtm,
         o_orderdate + INTERVAL 5 DAY AS plus5,
         CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INT) AS dd,
         CAST(last_day(o_orderdate) AS DATE) AS lastday,
         strftime(o_orderdate, '%Y-%m-%d') AS fmt
         FROM orders""",
    "q_conditional" ->
      """SELECT o_orderkey,
         nullif(o_orderstatus, 'P') AS nn,
         coalesce(nullif(o_orderstatus, 'P'), 'X') AS cc,
         CASE WHEN o_totalprice > 200000.0 THEN 'big' ELSE 'small' END AS sz,
         greatest(o_totalprice, 100000.0) AS gl,
         least(o_totalprice, 100000.0) AS ll,
         o_orderstatus IS NOT DISTINCT FROM 'F' AS nsafe
         FROM orders""",
    "q_json_funcs" ->
      """SELECT event_id,
         json_extract_string(props, '$.k') AS k_str,
         CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
         '{"user_id":' || user_id || '}' AS jo
         FROM events""",
    "q_try_cast" ->
      """SELECT p_partkey,
         try_cast(p_type AS INT) AS bad_int,
         try_cast(CAST(p_size AS VARCHAR) AS INT) AS good_int,
         CASE WHEN p_size - p_size = 0 THEN NULL
              ELSE p_retailprice / (p_size - p_size) END AS div0,
         try_cast(split_part(p_brand, '#', 2) AS INT) AS brand_no
         FROM part""",
    "q_hash_funcs" ->
      """SELECT c_custkey,
         md5(c_name) AS m,
         sha256(c_name) AS s2,
         to_base64(c_name::BLOB) AS b64,
         CAST(((list_reduce(list_prepend(0::BIGINT, list_transform(range(1, length(c_mktsegment)+1),
             i -> ascii(substr(c_mktsegment, i, 1)))),
             (a, b) -> a * 31 + b) % 4294967296) + 4294967296 + 2147483648)
             % 4294967296 - 2147483648 AS INT) AS hc,
         regexp_matches(split_part(c_name, '#', 2), '^[0-9]+$') AS isdig,
         regexp_matches(c_mktsegment, '^[A-Za-z]+$') AS isalp,
         regexp_matches(CAST(c_custkey % 100 AS VARCHAR) || '.' ||
           CAST(c_custkey % 10 AS VARCHAR),
           '^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)$') AS isdec
         FROM customer""",
    "q_explode" ->
      """SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word
         FROM part""",
    "q_posexplode" ->
      """SELECT p_partkey, CAST(r.i - 1 AS INT) AS pos, w[CAST(r.i AS INT)] AS word
         FROM (SELECT p_partkey, string_split(p_name, ' ') AS w FROM part) t,
         LATERAL (SELECT unnest(range(1, len(w)+1)) AS i) r""",
    "q_math_funcs2" ->
      """SELECT p_partkey,
         sin(p_size/10.0) AS sn, cos(p_size/10.0) AS cs, tan(p_size/10.0) AS tn,
         atan2(CAST(p_size AS DOUBLE), 2.0) AS at2,
         (exp(p_size/10.0) - exp(-(p_size/10.0)))/2 AS snh,
         (exp(p_size/10.0) + exp(-(p_size/10.0)))/2 AS csh,
         (exp(p_size/10.0) - exp(-(p_size/10.0)))
           / (exp(p_size/10.0) + exp(-(p_size/10.0))) AS tnh,
         degrees(p_size/10.0) AS deg, radians(p_size) AS rad,
         bin(p_size) AS bn,
         hex(p_size) AS hx,
         CAST((((p_size - 25) % 7) + 7) % 7 AS INT) AS pm
         FROM part""",
    "q_string_funcs2" ->
      """SELECT p_partkey,
         chr(65 + p_size % 26) AS ch,
         from_base64(to_base64(p_name::BLOB))::VARCHAR AS b64rt,
         CAST(strpos(p_name, 'a') AS INT) AS loc,
         '{"a":"' || p_size || '","b":"' || p_partkey || '"}' AS m,
         translate(p_name, 'aeiou', 'AEIOU') AS tr,
         array_to_string(list_transform(string_split(p_name, ' '),
           w -> upper(substr(w, 1, 1)) || substr(w, 2)), ' ') AS ic
         FROM part""",
    "q_string_funcs3" ->
      """SELECT p_partkey,
         substr(p_name, 1, 2) || 'XX' || substr(p_name, 5) AS ov,
         string_split(p_name, ' ')[2] AS split_idx,
         ascii(substr(p_name, 1, 1)) AS asc,
         bin(p_size) AS bn,
         upper(hex(p_size)) AS hx,
         substr(p_name, 1, 4) AS l4,
         substr(p_name, length(p_name) - 3) AS r4,
         repeat(p_brand, 2) AS rep,
         reverse(p_name) AS rev
         FROM part""",
    "q_collection_funcs" ->
      """WITH base AS (
           SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws,
                  string_split(text, ' ') AS raw
           FROM documents)
         SELECT doc_id,
           array_to_string(list_sort(list_distinct(
             list_concat(ws, ['the','data','spark']))), ',') AS un,
           coalesce(array_to_string(list_sort(
             list_filter(ws, x -> list_contains(['the','data','spark'], x))),
             ','), '') AS inter,
           array_to_string(list_sort(
             list_filter(ws, x -> NOT list_contains(['the','data','spark'], x))),
             ',') AS ex,
           array_to_string(flatten([raw[1:3], raw[4:6]]), ',') AS fl,
           CAST(len(ws[1:3]) AS BIGINT) AS card
         FROM base""",
    "q_parse_url" ->
      """SELECT c_custkey,
         lower(c_mktsegment) || '.example.com' AS host,
         '/u/' || c_custkey AS path,
         lower(c_mktsegment) AS qval
         FROM customer"""
  )
}
