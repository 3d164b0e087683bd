package graft.queries

import graft.QueryDsl._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar-function coverage (SURVEY.md §2.5): string, regex, math, datetime,
  * interval arithmetic, conditional, cast, hash, nested-type (list/struct),
  * series generation, unnest/explode, and JSON extraction.
  *
  * Reference function sets live under GlareDB
  * `crates/glaredb_core/src/functions/scalar/builtin/` (string/, numeric/,
  * datetime/, list/, cast rules in functions/cast/). Everything here is a
  * Spark built-in (codegen'd) — no UDFs in the hot path.
  *
  * Oracle notes: DuckDB returns BIGINT where Spark returns INT for many
  * functions (length, strpos, year, ...) — oracles cast to INT; DuckDB
  * lacks initcap (composed); Spark lacks quantified ALL (composed).
  */
object Funcs {

  val queries: Map[String, Q] = Map(
    "q49_string_funcs" -> { (s, dir) =>
      t(s, dir, "part")
        .filter(col("p_partkey") <= 200)
        .select(
          col("p_partkey"),
          lower(col("p_name")).as("lc"),
          upper(col("p_name")).as("uc"),
          substring(col("p_name"), 3, 5).as("sub"),
          length(col("p_name")).as("len"),
          replace(col("p_name"), lit("a"), lit("@")).as("rep"),
          concat(col("p_brand"), lit("-"), col("p_type")).as("cat"),
          lpad(col("p_brand"), 12, "*").as("lp"),
          rpad(col("p_brand"), 12, "*").as("rp"),
          trim(concat(lit("  "), col("p_type"), lit("  "))).as("tr"),
          ltrim(concat(lit("  "), col("p_type"))).as("ltr"),
          rtrim(concat(col("p_type"), lit("  "))).as("rtr"),
          reverse(col("p_type")).as("rev"),
          expr("left(p_name, 4)").as("lf"),
          expr("right(p_name, 4)").as("rt"),
          initcap(col("p_type")).as("ic"),
          repeat(col("p_brand"), 2).as("rpt"),
          ascii(col("p_name")).as("asc_code"),
          instr(col("p_name"), "a").cast(IntegerType).as("pos_a"),
          split_part(col("p_brand"), lit("#"), lit(2)).as("brand_num"),
          translate(col("p_name"), "aeiou", "AEIOU").as("tl"),
          col("p_name").like("%a%").as("has_a"),
          col("p_type").ilike("%eco%").as("is_eco"),
          col("p_name").startsWith("p").as("starts_p"))
        .orderBy("p_partkey")
    },

    "q50_regex_funcs" -> { (s, dir) =>
      t(s, dir, "part")
        .filter(col("p_partkey") <= 200)
        .select(
          col("p_partkey"),
          regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).as("brand_num"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devowel"),
          col("p_name").rlike("^[a-m]").as("first_half"),
          size(regexp_extract_all(col("p_name"), lit("[aeiou]"), lit(0)))
            .as("n_vowels"))
        .orderBy("p_partkey")
    },

    "q51_math_funcs" -> { (s, dir) =>
      t(s, dir, "part")
        .filter(col("p_partkey") <= 200)
        .select(
          col("p_partkey"),
          abs(col("p_size") - 25).as("abs_off"),
          ceil(col("p_retailprice") / 7).as("ceil_p"),
          floor(col("p_retailprice") / 7).as("floor_p"),
          (floor(col("p_retailprice") * 100 / 7) / 100).as("cents_div"),
          sqrt(col("p_size")).as("sqrt_sz"),
          (col("p_size") % 7).as("mod7"),
          (col("p_size") * col("p_size")).as("sq"),
          signum(col("p_size") - 25).cast(IntegerType).as("sgn"),
          round(log(col("p_retailprice")), 6).as("ln_p"),
          round(exp(col("p_size") / lit(10.0)), 6).as("exp_sz"),
          round(log10(col("p_retailprice")), 6).as("log10_p"),
          round(atan2(col("p_size"), lit(3)), 6).as("at2"),
          round(sin(col("p_size")), 6).as("sin_sz"),
          round(cos(col("p_size")), 6).as("cos_sz"),
          factorial(col("p_size") % 10).as("fact"),
          greatest(col("p_size"), lit(25)).as("gmax"),
          least(col("p_size"), lit(25)).as("gmin"))
        .orderBy("p_partkey")
    },

    "q52_datetime_funcs" -> { (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderkey") <= 500)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("o_year"),
          month(col("o_orderdate")).as("o_month"),
          dayofmonth(col("o_orderdate")).as("o_day"),
          quarter(col("o_orderdate")).as("o_quarter"),
          (weekday(col("o_orderdate")) + 1).as("dow_iso"),
          dayofyear(col("o_orderdate")).as("doy"),
          date_trunc("month", col("o_orderdate")).as("trunc_month"),
          (col("o_orderdate") + expr("INTERVAL 3 MONTH")).as("plus3m"),
          (col("o_orderdate") - expr("INTERVAL 90 DAY")).as("minus90d"),
          datediff(col("o_orderdate"), lit(java.sql.Date.valueOf("1995-01-01")))
            .as("days_since"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          last_day(col("o_orderdate")).as("month_end"))
        .orderBy("o_orderkey")
    },

    "q53_conditional" -> { (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderkey") <= 500)
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 300000, "big")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("small").as("bucket"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("st"),
          when(col("o_orderstatus") === "F", col("o_totalprice"))
            .otherwise(lit(0.0)).as("f_price"))
        .orderBy("o_orderkey")
    },

    "q54_cast_funcs" -> { (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderkey") <= 500)
        .select(
          col("o_orderkey"),
          col("o_orderkey").cast(StringType).as("key_str"),
          concat(col("o_orderkey").cast(StringType), lit("9")).cast(LongType).as("key9"),
          floor(col("o_totalprice")).as("price_floor"),
          split_part(col("o_orderpriority"), lit("-"), lit(1)).cast(IntegerType)
            .as("prio_num"),
          expr("try_cast(o_orderpriority AS INT)").as("prio_bad"),
          (col("o_orderstatus") === "F").as("is_f"),
          col("o_custkey").cast(IntegerType).as("cust_int"))
        .orderBy("o_orderkey")
    },

    "q55_hash_funcs" -> { (s, dir) =>
      t(s, dir, "customer")
        .filter(col("c_custkey") <= 200)
        .select(
          col("c_custkey"),
          md5(col("c_name").cast(BinaryType)).as("name_md5"),
          sha2(col("c_name").cast(BinaryType), 256).as("name_sha256"))
        .orderBy("c_custkey")
    },

    // The slice result is serialized to a decimal-formatted CSV string:
    // the driver harness cannot hash ndarray cells, and fixed-scale decimal
    // strings are bit-identical across engines (raw float JSON is not).
    "q56_list_funcs" -> { (s, dir) =>
      t(s, dir, "embeddings")
        .filter(col("vec_id") <= 100)
        .select(
          col("vec_id"),
          element_at(col("embedding"), 1).as("e1"),
          size(col("embedding")).as("n"),
          concat_ws(",", transform(slice(col("embedding"), 2, 3),
            x => round(x.cast(DoubleType), 4).cast(DecimalType(12, 4))
              .cast(StringType))).as("sl"),
          element_at(reverse(col("embedding")), 1).as("e_last"),
          array_max(col("embedding")).as("emax"),
          array_min(col("embedding")).as("emin"))
        .orderBy("vec_id")
    },

    "q57_explode" -> { (s, dir) =>
      t(s, dir, "embeddings")
        .filter(col("vec_id") < 50)
        .select(col("vec_id"), explode(col("embedding")).as("val"))
        .orderBy("vec_id", "val")
    },

    "q58_posexplode" -> { (s, dir) =>
      t(s, dir, "embeddings")
        .filter(col("vec_id") < 20)
        .select(col("vec_id"), posexplode(col("embedding")))
        .withColumnRenamed("col", "val")
        .orderBy("vec_id", "pos")
    },

    // The struct is built with named_struct and read back with getField,
    // then rendered to a deterministic text form for the driver harness
    // (pandas cannot hash dict cells; JSON float formatting differs across
    // engines, so fields are concatenated with explicit string casts).
    "q59_struct_funcs" -> { (s, dir) =>
      t(s, dir, "customer")
        .filter(col("c_custkey") <= 200)
        .select(col("c_custkey"),
          named_struct(lit("key"), col("c_custkey"), lit("bal"), col("c_acctbal"))
            .as("stx"))
        .select(
          col("c_custkey"),
          concat(lit("{key:"), col("stx").getField("key").cast(StringType),
            lit(",bal:"), col("stx").getField("bal").cast(StringType),
            lit("}")).as("st"),
          col("stx").getField("bal").as("bal2"))
        .orderBy("c_custkey")
    },

    "q60_generate_series" -> { (s, dir) =>
      s.range(1, 101).toDF()
        .select(col("id"), (col("id") * col("id")).as("sq"))
        .filter(col("id") % 7 === 0)
        .orderBy("id")
    },

    "q61_json_extract" -> { (s, dir) =>
      t(s, dir, "events")
        .filter(col("event_id") < 500)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k_json"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast(IntegerType)
            .as("k_rx"))
        .orderBy("event_id")
    })

  val oracles: Map[String, String] = Map(
    "q49_string_funcs" -> """
      SELECT p_partkey,
        LOWER(p_name) AS lc,
        UPPER(p_name) AS uc,
        SUBSTRING(p_name, 3, 5) AS sub,
        CAST(LENGTH(p_name) AS INT) AS len,
        REPLACE(p_name, 'a', '@') AS rep,
        CONCAT(p_brand, '-', p_type) AS cat,
        LPAD(p_brand, 12, '*') AS lp,
        RPAD(p_brand, 12, '*') AS rp,
        TRIM('  ' || p_type || '  ') AS tr,
        LTRIM('  ' || p_type) AS ltr,
        RTRIM(p_type || '  ') AS rtr,
        REVERSE(p_type) AS rev,
        LEFT(p_name, 4) AS lf,
        RIGHT(p_name, 4) AS rt,
        SUBSTRING(p_type, 1, 1) || LOWER(SUBSTRING(p_type, 2, 100)) AS ic,
        REPEAT(p_brand, 2) AS rpt,
        CAST(ASCII(p_name) AS INT) AS asc_code,
        CAST(STRPOS(p_name, 'a') AS INT) AS pos_a,
        SPLIT_PART(p_brand, '#', 2) AS brand_num,
        TRANSLATE(p_name, 'aeiou', 'AEIOU') AS tl,
        p_name LIKE '%a%' AS has_a,
        p_type ILIKE '%eco%' AS is_eco,
        p_name LIKE 'p%' AS starts_p
      FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""",

    "q50_regex_funcs" -> """
      SELECT p_partkey,
        REGEXP_EXTRACT(p_brand, 'Brand#(\d+)', 1) AS brand_num,
        REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS devowel,
        REGEXP_MATCHES(p_name, '^[a-m]') AS first_half,
        CAST(LEN(REGEXP_EXTRACT_ALL(p_name, '[aeiou]')) AS INT) AS n_vowels
      FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""",

    "q51_math_funcs" -> """
      SELECT p_partkey,
        ABS(p_size - 25) AS abs_off,
        CAST(CEIL(p_retailprice / 7) AS BIGINT) AS ceil_p,
        CAST(FLOOR(p_retailprice / 7) AS BIGINT) AS floor_p,
        FLOOR(p_retailprice * 100 / 7) / 100 AS cents_div,
        SQRT(p_size) AS sqrt_sz,
        CAST(p_size % 7 AS INT) AS mod7,
        CAST(p_size * p_size AS INT) AS sq,
        CAST(SIGN(p_size - 25) AS INT) AS sgn,
        ROUND(LN(p_retailprice), 6) AS ln_p,
        ROUND(EXP(p_size / 10.0), 6) AS exp_sz,
        ROUND(LOG10(p_retailprice), 6) AS log10_p,
        ROUND(ATAN2(p_size, 3), 6) AS at2,
        ROUND(SIN(p_size), 6) AS sin_sz,
        ROUND(COS(p_size), 6) AS cos_sz,
        CAST(FACTORIAL(p_size % 10) AS BIGINT) AS fact,
        GREATEST(p_size, 25) AS gmax,
        LEAST(p_size, 25) AS gmin
      FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""",

    "q52_datetime_funcs" -> """
      SELECT o_orderkey,
        CAST(YEAR(o_orderdate) AS INT) AS o_year,
        CAST(MONTH(o_orderdate) AS INT) AS o_month,
        CAST(DAY(o_orderdate) AS INT) AS o_day,
        CAST(QUARTER(o_orderdate) AS INT) AS o_quarter,
        CAST(ISODOW(o_orderdate) AS INT) AS dow_iso,
        CAST(DAYOFYEAR(o_orderdate) AS INT) AS doy,
        CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS trunc_month,
        o_orderdate + INTERVAL 3 MONTH AS plus3m,
        o_orderdate - INTERVAL 90 DAY AS minus90d,
        CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
          AS days_since,
        CAST(EPOCH(o_orderdate) AS BIGINT) AS epoch_s,
        LAST_DAY(o_orderdate) AS month_end
      FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""",

    "q53_conditional" -> """
      SELECT o_orderkey,
        CASE WHEN o_totalprice > 300000 THEN 'big'
             WHEN o_totalprice > 100000 THEN 'mid'
             ELSE 'small' END AS bucket,
        COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS st,
        CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END AS f_price
      FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""",

    "q54_cast_funcs" -> """
      SELECT o_orderkey,
        CAST(o_orderkey AS VARCHAR) AS key_str,
        CAST(CAST(o_orderkey AS VARCHAR) || '9' AS BIGINT) AS key9,
        CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
        CAST(SPLIT_PART(o_orderpriority, '-', 1) AS INT) AS prio_num,
        TRY_CAST(o_orderpriority AS INT) AS prio_bad,
        o_orderstatus = 'F' AS is_f,
        CAST(o_custkey AS INT) AS cust_int
      FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""",

    "q55_hash_funcs" -> """
      SELECT c_custkey,
        MD5(c_name) AS name_md5,
        SHA256(c_name) AS name_sha256
      FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey""",

    "q56_list_funcs" -> """
      SELECT vec_id,
        embedding[1] AS e1,
        CAST(LEN(embedding) AS INT) AS n,
        ARRAY_TO_STRING(LIST_TRANSFORM(embedding[2:4],
          x -> CAST(CAST(ROUND(CAST(x AS DOUBLE), 4) AS DECIMAL(12,4))
                 AS VARCHAR)), ',') AS sl,
        embedding[LEN(embedding)] AS e_last,
        LIST_MAX(embedding) AS emax,
        LIST_MIN(embedding) AS emin
      FROM embeddings WHERE vec_id <= 100 ORDER BY vec_id""",

    "q57_explode" -> """
      SELECT vec_id, UNNEST(embedding) AS val
      FROM embeddings WHERE vec_id < 50 ORDER BY vec_id, val""",

    "q58_posexplode" -> """
      SELECT vec_id, CAST(g.i - 1 AS INT) AS pos, embedding[g.i] AS val
      FROM embeddings
      CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(1, 64)) AS i) g
      WHERE vec_id < 20 ORDER BY vec_id, pos""",

    "q59_struct_funcs" -> """
      SELECT c_custkey,
        '{key:' || CAST(STRUCT_EXTRACT({'key': c_custkey, 'bal': c_acctbal},
            'key') AS VARCHAR) ||
        ',bal:' || CAST(STRUCT_EXTRACT({'key': c_custkey, 'bal': c_acctbal},
            'bal') AS VARCHAR) || '}' AS st,
        STRUCT_EXTRACT({'key': c_custkey, 'bal': c_acctbal}, 'bal') AS bal2
      FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey""",

    "q60_generate_series" -> """
      SELECT CAST(range AS BIGINT) AS id, CAST(range * range AS BIGINT) AS sq
      FROM RANGE(1, 101) WHERE range % 7 = 0 ORDER BY id""",

    "q61_json_extract" -> """
      SELECT event_id,
        CAST(REGEXP_EXTRACT(props, '"k": (\d+)', 1) AS INT) AS k_json,
        CAST(REGEXP_EXTRACT(props, '"k": (\d+)', 1) AS INT) AS k_rx
      FROM events WHERE event_id < 500 ORDER BY event_id""")
}
