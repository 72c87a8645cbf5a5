package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{Q, Tables, Exact}
import Exact._

/** SURVEY.md §2.8 — scalar function families: string, regex, date/time,
  * math, array (incl. lambda HOFs), map, JSON.
  *
  * Everything here is a built-in column expression — whole-stage-codegen
  * friendly, zero UDFs (SURVEY §2.11 policy). Oracle notes: rounding goes
  * through DECIMAL (both engines round halves away from zero there;
  * double rounding is representation-dependent and never oracle-safe),
  * and day-of-week is normalized to Spark's 1=Sunday convention.
  */
object Scalars {

  /** q36 — string family (lower/upper/trim/substring/length/concat/
    * replace/lpad) over customer names. */
  val q36 = Q(
    "q36_string_funcs",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "customer")
        .select($"c_custkey",
          lower($"c_name").as("lo"),
          upper($"c_mktsegment").as("up"),
          trim(concat(lit("  "), $"c_name", lit(" "))).as("trimmed"),
          substring($"c_name", 1, 8).as("prefix"),
          length($"c_name").as("len"),
          concat_ws("-", $"c_mktsegment", $"c_custkey").as("tagged"),
          regexp_replace($"c_name", "0", "O").as("replaced"),
          lpad($"c_custkey".cast(StringType), 10, "0").as("padded"))
        .orderBy($"c_custkey")
    },
    Some("""
      SELECT c_custkey,
        lower(c_name) AS lo, upper(c_mktsegment) AS up,
        trim('  ' || c_name || ' ') AS trimmed,
        substring(c_name, 1, 8) AS prefix,
        length(c_name) AS len,
        concat_ws('-', c_mktsegment, c_custkey) AS tagged,
        regexp_replace(c_name, '0', 'O', 'g') AS replaced,
        lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded
      FROM customer ORDER BY c_custkey"""),
    doc = "string family; all codegen'd builtins")

  /** q37 — regex family: extract / extract_all / rlike over documents. */
  val q37 = Q(
    "q37_regex",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .select($"doc_id",
          regexp_extract($"text", "\\b(\\w{7,})\\b", 1).as("first_long_word"),
          size(regexp_extract_all($"text", lit("\\b\\w{7,}\\b"), lit(0))).as("n_long_words"),
          $"text".rlike("ing\\b").as("has_ing"),
          regexp_replace($"text", "\\b\\w{1,2}\\b", "_").as("short_masked"))
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id,
        regexp_extract(text, '\b(\w{7,})\b', 1) AS first_long_word,
        len(regexp_extract_all(text, '\b\w{7,}\b')) AS n_long_words,
        regexp_matches(text, 'ing\b') AS has_ing,
        regexp_replace(text, '\b\w{1,2}\b', '_', 'g') AS short_masked
      FROM documents ORDER BY doc_id"""),
    doc = "regex: the hashtag-extraction capability class (reference README.md:81-83)")

  /** q38 — date/time family over orders + events. */
  val q38 = Q(
    "q38_datetime",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .select($"o_orderkey",
          year($"o_orderdate").as("y"),
          month($"o_orderdate").as("m"),
          dayofmonth($"o_orderdate").as("d"),
          dayofweek($"o_orderdate").as("dow"),
          to_date(date_trunc("month", $"o_orderdate")).as("month_start"),
          datediff(to_date($"o_orderdate"), lit("1995-01-01").cast(DateType)).as("days_since"),
          date_format($"o_orderdate", "yyyy-MM").as("ym"),
          unix_timestamp($"o_orderdate").as("epoch_s"),
          date_add(to_date($"o_orderdate"), 90).as("due_date"),
          add_months(to_date($"o_orderdate"), 2).as("plus2m"))
        .orderBy($"o_orderkey")
    },
    Some("""
      SELECT o_orderkey,
        CAST(extract(year FROM o_orderdate) AS INT) AS y,
        CAST(extract(month FROM o_orderdate) AS INT) AS m,
        CAST(extract(day FROM o_orderdate) AS INT) AS d,
        CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
        strftime(o_orderdate, '%Y-%m') AS ym,
        CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        CAST(o_orderdate AS DATE) + 90 AS due_date,
        CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus2m
      FROM orders ORDER BY o_orderkey"""),
    doc = "date/time: trunc/extract/diff/format/add; UTC pinned both engines")

  /** q39 — math family. Rounding via DECIMAL only (see object doc). */
  val q39 = Q(
    "q39_math",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .select($"o_orderkey",
          abs(money($"o_totalprice") * -1).cast(DoubleType).as("abs_neg"),
          round(money($"o_totalprice"), 1).cast(DoubleType).as("rounded1"),
          round(money($"o_totalprice"), -2).cast(DoubleType).as("rounded_h"),
          floor($"o_totalprice").as("fl"),
          ceil($"o_totalprice").as("ce"),
          pow(lit(2), $"o_orderkey" % 10).as("pow2"),
          sqrt($"o_orderkey").as("sq"),
          ($"o_orderkey" % 7).as("mod7"),
          greatest($"o_totalprice", lit(100000.0)).as("gr"),
          least($"o_totalprice", lit(100000.0)).as("le"),
          sign(money($"o_totalprice") - 100000).cast(DoubleType).as("sgn"))
        .orderBy($"o_orderkey")
    },
    Some(s"""
      SELECT o_orderkey,
        CAST(abs(${sqlMoney("o_totalprice")} * -1) AS DOUBLE) AS abs_neg,
        CAST(round(${sqlMoney("o_totalprice")}, 1) AS DOUBLE) AS rounded1,
        CAST(round(${sqlMoney("o_totalprice")}, -2) AS DOUBLE) AS rounded_h,
        CAST(floor(o_totalprice) AS BIGINT) AS fl,
        CAST(ceil(o_totalprice) AS BIGINT) AS ce,
        power(2, o_orderkey % 10) AS pow2,
        sqrt(o_orderkey) AS sq,
        o_orderkey % 7 AS mod7,
        greatest(o_totalprice, 100000.0) AS gr,
        least(o_totalprice, 100000.0) AS le,
        CAST(CAST(sign(${sqlMoney("o_totalprice")} - 100000) AS INT) AS DOUBLE) AS sgn
      FROM orders ORDER BY o_orderkey"""),
    doc = "math: abs/round(decimal)/floor/ceil/pow/sqrt/mod/greatest/least/sign")

  /** q40 — array family incl. lambda HOFs over tokenized documents. */
  val q40 = Q(
    "q40_arrays",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .withColumn("tokens", split($"text", " "))
        .select($"doc_id",
          size($"tokens").as("n_tokens"),
          size(array_distinct($"tokens")).as("n_unique"),
          array_contains($"tokens", "data").as("has_data"),
          array_join(slice($"tokens", 1, 3), "|").as("first3"),
          array_join(sort_array(array_distinct(slice($"tokens", 1, 5))), "|").as("head_vocab"),
          array_join(transform($"tokens", t => length(t).cast(StringType)), "|").as("token_lens"),
          array_join(filter($"tokens", t => length(t) >= 6), "|").as("long_tokens"),
          aggregate($"tokens", lit(0L), (acc, t) => acc + length(t)).as("total_chars"),
          element_at($"tokens", 1).as("first_token"),
          array_position($"tokens", "data").as("data_pos"))
        .orderBy($"doc_id")
    },
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents)
      SELECT doc_id,
        len(tokens) AS n_tokens,
        len(list_distinct(tokens)) AS n_unique,
        list_contains(tokens, 'data') AS has_data,
        COALESCE(array_to_string(list_slice(tokens, 1, 3), '|'), '') AS first3,
        COALESCE(array_to_string(list_sort(list_distinct(list_slice(tokens, 1, 5))), '|'), '') AS head_vocab,
        COALESCE(array_to_string(list_transform(tokens, t -> CAST(length(t) AS VARCHAR)), '|'), '') AS token_lens,
        COALESCE(array_to_string(list_filter(tokens, t -> length(t) >= 6), '|'), '') AS long_tokens,
        CAST(list_sum(list_transform(tokens, t -> length(t))) AS BIGINT) AS total_chars,
        tokens[1] AS first_token,
        CAST(COALESCE(list_position(tokens, 'data'), 0) AS BIGINT) AS data_pos
      FROM t ORDER BY doc_id"""),
    doc = "arrays + HOFs (transform/filter/aggregate): zero-UDF token math")

  /** q41 — map + JSON family over events.props. */
  val q41 = Q(
    "q41_map_json",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .withColumn("pm", from_json($"props", MapType(StringType, IntegerType)))
        .select($"event_id",
          get_json_object($"props", "$.k").cast(IntegerType).as("k_json"),
          element_at($"pm", "k").as("k_map"),
          array_join(map_keys($"pm"), "|").as("prop_keys"),
          size($"pm").as("n_props"),
          to_json(map(lit("id"), $"event_id")).as("as_json"))
        .orderBy($"event_id")
    },
    Some("""
      SELECT event_id,
        CAST(json_extract_string(props, '$.k') AS INT) AS k_json,
        CAST(json_extract_string(props, '$.k') AS INT) AS k_map,
        array_to_string(json_keys(props), '|') AS prop_keys,
        CAST(len(json_keys(props)) AS INT) AS n_props,
        '{"id":' || event_id || '}' AS as_json
      FROM events ORDER BY event_id"""),
    doc = "JSON parse/extract/serialize + MapType ops (reference ingests JSON, README.md:76-78)")

  /** q115 — VARIANT semi-structured access (F-var): Spark 4's binary
    * semi-structured type — parse once, access fields without
    * re-parsing the JSON string per extraction, the storage/access
    * model for schema-drifting event payloads at scale (q41's string
    * get_json_object re-parses per call). Extracted values are exact
    * integers, so the aggregate hash-matches DuckDB's JSON operators.
    */
  val q115 = Q(
    "q115_variant",
    (s, dir) => {
      import s.implicits._
      graft.core.Tables(s, dir, "events")
        .select($"event_type",
          expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
          min($"k").as("min_k"), max($"k").as("max_k"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
             MIN(CAST(props->>'$.k' AS BIGINT)) AS min_k,
             MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k
      FROM events GROUP BY event_type ORDER BY event_type"""),
    doc = "F-var: VARIANT parse-once access (Spark 4) vs per-call string " +
      "re-parse; exact integer extraction hash-matches DuckDB JSON ops")

  val all: Seq[Q] = Seq(q36, q37, q38, q39, q40, q41, q115)
}
