"""§2.H — scalar function groups.

One composite declared query per group, exercising every listed
function. All JVM column expressions (whole-stage codegen) — zero
Python in any of these paths.

Cross-engine discipline (probed, SURVEY §5.3.4): Spark `dayofweek` is
Sun=1 vs DuckDB Sun=0 (oracle adds 1); DuckDB `epoch()` returns DOUBLE
(oracle casts to BIGINT); libm transcendentals (exp/ln/pow) may differ
in the last ulp (outputs rounded to 6dp); no raw 2-decimal money is
ever rounded to 1dp (half-up/half-even trap avoided by construction);
regex patterns stay in the Java∩RE2 common subset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from glonassdatamining_spark.registry import register
from glonassdatamining_spark.sources import load


@register(
    "h1_string_funcs",
    oracle=(
        "SELECT c_custkey, "
        "concat(upper(c_mktsegment), '-', lower(c_name)) AS tag, "
        "substring(c_name, 1, 8) AS prefix, "
        "trim('  pad  ') AS trimmed, ltrim('  pad') AS l_trimmed, rtrim('pad  ') AS r_trimmed, "
        "lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key, "
        "rpad(c_mktsegment, 12, '.') AS padded_seg, "
        "length(c_name) AS name_len, "
        "len(string_split(c_name, '#')) AS n_parts, "
        "replace(c_name, 'Customer', 'Cust') AS short_name, "
        "instr(c_name, '#') AS hash_pos, "
        "left(c_name, 4) AS l4, right(c_name, 3) AS r3 "
        "FROM customer"
    ),
    section="H1",
)
def h1_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat(F.upper("c_mktsegment"), F.lit("-"), F.lower("c_name")).alias("tag"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
        F.ltrim(F.lit("  pad")).alias("l_trimmed"),
        F.rtrim(F.lit("pad  ")).alias("r_trimmed"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.rpad("c_mktsegment", 12, ".").alias("padded_seg"),
        F.length("c_name").alias("name_len"),
        F.size(F.split("c_name", "#")).alias("n_parts"),
        F.regexp_replace("c_name", "Customer", "Cust").alias("short_name"),
        F.instr(F.col("c_name"), "#").alias("hash_pos"),
        F.substring("c_name", 1, 4).alias("l4"),
        F.col("c_name").substr(F.length("c_name") - 2, F.lit(3)).alias("r3"),
    )


@register(
    "h2_regex_funcs",
    oracle=(
        "SELECT doc_id, "
        "regexp_extract(text, '([a-z]+)', 1) AS first_word, "
        "regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled_head, "
        "CAST(regexp_matches(text, 'join|window') AS INT) AS mentions_join "
        "FROM documents WHERE doc_id % 20 = 0"
    ),
    section="H2",
)
def h2_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Patterns restricted to the Java∩RE2 subset (no lookaround).
    Spark regexp_replace is global by default; DuckDB needs the 'g'
    flag."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    return d.select(
        "doc_id",
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("text", "[aeiou]", "_").alias("devoweled_head"),
        F.col("text").rlike("join|window").cast("int").alias("mentions_join"),
    )


@register(
    "h3_datetime_funcs",
    oracle=(
        "SELECT o_orderkey, "
        "year(o_orderdate) AS o_year, month(o_orderdate) AS o_month, "
        "day(o_orderdate) AS o_day, hour(o_orderdate) AS o_hour, "
        "date_trunc('month', o_orderdate) AS month_start, "
        "o_orderdate + INTERVAL 90 DAY AS due_date, "
        "date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_95, "
        "strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end, "
        "dayofweek(o_orderdate) + 1 AS dow, "
        "CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s, "
        "strftime(make_date(1995, 3, 7), '%Y-%m-%d') AS fixed_date "
        "FROM orders"
    ),
    section="H3",
)
def h3_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date outputs that differ in physical type across engines
    (DATE vs TIMESTAMP) are normalized to 'yyyy-MM-dd' strings."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year").cast("bigint").alias("o_year"),
        F.month("o_orderdate").cast("bigint").alias("o_month"),
        F.day("o_orderdate").cast("bigint").alias("o_day"),
        F.hour("o_orderdate").cast("bigint").alias("o_hour"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).cast("bigint").alias("days_since_95"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.dayofweek("o_orderdate").cast("bigint").alias("dow"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_format(F.make_date(F.lit(1995), F.lit(3), F.lit(7)), "yyyy-MM-dd").alias("fixed_date"),
    )


@register(
    "h4_math_funcs",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        "abs(l_discount - 0.05) AS abs_dev, "
        "CAST(ceil(l_extendedprice / 1000.0) AS BIGINT) AS price_k_ceil, "
        "CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS price_k_floor, "
        "ROUND(sqrt(l_extendedprice), 6) AS sqrt_price, "
        "ROUND(pow(l_quantity, 1.5), 6) AS qty_pow, "
        "ROUND(exp(l_discount), 6) AS exp_disc, "
        "ROUND(ln(l_extendedprice), 6) AS ln_price, "
        "ROUND(log10(l_extendedprice), 6) AS log10_price, "
        "CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign, "
        "((CAST(l_partkey AS BIGINT) - 2 * l_suppkey) % 7 + 7) % 7 AS pmod7, "
        "greatest(l_quantity, 25.0) AS qty_hi, least(l_quantity, 25.0) AS qty_lo "
        "FROM lineitem WHERE l_orderkey % 50 = 0"
    ),
    section="H4",
)
def h4_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcendentals rounded to 6dp (libm last-ulp divergence);
    pmod emulated in the oracle via ((x % 7) + 7) % 7."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_dev"),
        F.ceil(F.col("l_extendedprice") / 1000.0).alias("price_k_ceil"),
        F.floor(F.col("l_extendedprice") / 1000.0).alias("price_k_floor"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.round(F.pow("l_quantity", F.lit(1.5)), 6).alias("qty_pow"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.round(F.log10("l_extendedprice"), 6).alias("log10_price"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.pmod(F.col("l_partkey") - 2 * F.col("l_suppkey"), F.lit(7)).alias("pmod7"),
        F.greatest("l_quantity", F.lit(25.0)).alias("qty_hi"),
        F.least("l_quantity", F.lit(25.0)).alias("qty_lo"),
    )


@register(
    "h5_array_funcs",
    oracle=(
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS words "
        "FROM documents WHERE doc_id % 25 = 0) "
        "SELECT doc_id, "
        "len(words) AS n_words, "
        "CAST(list_contains(words, 'join') AS INT) AS has_join, "
        "list_sort(list_distinct(words)) AS vocab, "
        "words[2:4] AS mid_slice, "
        "len(flatten([words, words])) AS doubled_len, "
        "list_transform(words[1:5], w -> length(w)) AS head_lens, "
        "list_sort(list_filter(words, w -> length(w) > 6)) AS long_words, "
        "CAST(list_sum(list_transform(words, w -> length(w))) AS BIGINT) AS total_chars, "
        "list_transform(range(1, 4), i -> i * 10) AS seq3 "
        "FROM t"
    ),
    section="H5",
)
def h5_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions — all evaluated inside codegen; the
    same kernels back the embedding math in C12/K3."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    words = F.split("text", " ")
    t = d.select("doc_id", words.alias("words"))
    return t.select(
        "doc_id",
        F.size("words").alias("n_words"),
        F.array_contains("words", "join").cast("int").alias("has_join"),
        F.array_sort(F.array_distinct("words")).alias("vocab"),
        F.slice("words", 2, 3).alias("mid_slice"),
        F.size(F.flatten(F.array("words", "words"))).alias("doubled_len"),
        F.transform(F.slice("words", 1, 5), lambda w: F.length(w)).alias("head_lens"),
        F.array_sort(F.filter("words", lambda w: F.length(w) > 6)).alias("long_words"),
        F.aggregate("words", F.lit(0).cast("bigint"), lambda acc, w: acc + F.length(w)).alias("total_chars"),
        F.transform(F.sequence(F.lit(1), F.lit(3)), lambda i: i * 10).alias("seq3"),
    )


@register(
    "h6_posexplode",
    oracle=(
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS words "
        "FROM documents WHERE doc_id % 50 = 0) "
        "SELECT doc_id, u.pos, u.word FROM (SELECT doc_id, "
        "unnest(list_transform(words, (w, i) -> struct_pack(pos := i, word := w)), "
        "recursive := true) FROM t) u(doc_id, pos, word)"
    ),
    section="H6",
)
def h6_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF-shaped 1→N expansion with ordinality (1-based to match
    DuckDB list indexing)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    return (
        d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "word"))
        .select("doc_id", (F.col("pos0") + 1).cast("bigint").alias("pos"), "word")
    )


@register(
    "h7_json_funcs",
    oracle=(
        "SELECT event_id, "
        "CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_extracted, "
        "CAST(json_extract_string(props, '$.k') AS BIGINT) * 2 AS k_doubled, "
        "CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing_field "
        "FROM events WHERE event_id % 10 = 0"
    ),
    section="H7",
)
def h7_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload access: path extraction (get_json_object) and typed
    parse (from_json with explicit schema). ts untouched → no CTE."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 10 == 0)
    parsed = F.from_json("props", "k BIGINT")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_extracted"),
        (parsed.getField("k") * 2).alias("k_doubled"),
        F.get_json_object("props", "$.missing").alias("missing_field"),
    )


@register(
    "h8_map_funcs",
    oracle=(
        "WITH m AS (SELECT event_id, map {'base': value, 'double': value * 2} AS vm "
        "FROM events WHERE event_id % 20 = 0) "
        "SELECT event_id, vm['base'][1] AS base_val, vm['double'][1] AS double_val, "
        "cardinality(vm) AS m_size, list_sort(map_keys(vm)) AS keys_sorted "
        "FROM m"
    ),
    section="H8",
)
def h8_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + access. DuckDB map subscript yields a LIST
    (oracle takes [1]); Spark element_at yields the value directly."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 20 == 0)
    m = F.create_map(
        F.lit("base"), F.col("value"), F.lit("double"), F.col("value") * 2
    )
    return ev.select(
        "event_id",
        F.element_at(m, "base").alias("base_val"),
        F.element_at(m, "double").alias("double_val"),
        F.size(m).cast("bigint").alias("m_size"),
        F.array_sort(F.map_keys(m)).alias("keys_sorted"),
    )


@register(
    "h9_hash_funcs",
    oracle=(
        "SELECT p_partkey, md5(p_name) AS name_md5, sha256(p_brand) AS brand_sha "
        "FROM part WHERE p_partkey % 10 = 0"
    ),
    section="H9",
)
def h9_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine-standard digests only (md5/sha256). Spark-specific
    xxhash64 / crc32 / monotonically_increasing_id are exercised in K1
    and tests, but can't be oracle-checked (no DuckDB equivalent)."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") % 10 == 0)
    return p.select(
        "p_partkey",
        F.md5("p_name").alias("name_md5"),
        F.sha2("p_brand", 256).alias("brand_sha"),
    )


@register(
    "h10_struct_funcs",
    oracle=(
        "SELECT s_suppkey, "
        "to_json(struct_pack(suppkey := s_suppkey, name := s_name)) AS s_json, "
        "struct_pack(nk := s_nationkey, bal := s_acctbal).nk AS nk_field "
        "FROM supplier"
    ),
    section="H10",
)
def h10_struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct build / field access / JSON serialization (compact form
    matches across engines for int+string fields — probed)."""
    s = load(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.to_json(
            F.struct(F.col("s_suppkey").alias("suppkey"), F.col("s_name").alias("name"))
        ).alias("s_json"),
        F.struct(F.col("s_nationkey").alias("nk"), F.col("s_acctbal").alias("bal"))
        .getField("nk")
        .alias("nk_field"),
    )


@register(
    "h11_bitwise_funcs",
    oracle=(
        "SELECT o_orderstatus, "
        "bit_and(o_orderkey) AS and_key, bit_or(o_orderkey) AS or_key, "
        "bit_xor(o_orderkey) AS xor_key, "
        "CAST(SUM(o_orderkey % 8) AS BIGINT) AS low_bits_sum "
        "FROM orders GROUP BY o_orderstatus"
    ),
    section="H11",
)
def h11_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate group: bit_and / bit_or / bit_xor per group
    plus a masked-bit sum — integer-exact on both engines (bitwise agg
    is associative+commutative, so Spark's partial/final split cannot
    diverge from DuckDB's single-pass)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.bit_and("o_orderkey").alias("and_key"),
        F.bit_or("o_orderkey").alias("or_key"),
        F.bit_xor("o_orderkey").alias("xor_key"),
        F.sum(F.col("o_orderkey") % 8).cast("bigint").alias("low_bits_sum"),
    )


@register(
    "h12_string_distance",
    oracle=(
        "SELECT s_suppkey, dist AS best_dist, n_name AS best_nation FROM ("
        "SELECT s_suppkey, levenshtein(s_name, n_name) AS dist, n_name "
        "FROM supplier CROSS JOIN nation) "
        "QUALIFY row_number() OVER (PARTITION BY s_suppkey ORDER BY dist, n_name) = 1"
    ),
    section="H12",
)
def h12_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching (round-1 addition): nearest
    dictionary entry per input string by Levenshtein distance — the
    backbone of entity resolution / fuzzy dimension lookup. The
    dictionary side (nation) is broadcast, so the probe side never
    shuffles; the per-group argmin is a single ``min(struct(...))``
    partial-aggregable fold (no window, no second shuffle), with the
    matched name in the struct as deterministic tie-break. Probed:
    Spark and DuckDB ``levenshtein`` agree (classic unit-cost edit
    distance). At 100 TB the same shape holds — dictionaries are
    dimension-sized; for dictionary×dictionary matching, band by
    length/prefix first (the C11 grid idea on string keys).
    """
    from pyspark.sql.functions import broadcast

    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    n = load(spark, sf_dir, "nation").select("n_name")
    pairs = s.crossJoin(broadcast(n)).select(
        "s_suppkey",
        F.struct(
            F.levenshtein("s_name", "n_name").alias("dist"),
            F.col("n_name").alias("name"),
        ).alias("_cand"),
    )
    best = pairs.groupBy("s_suppkey").agg(F.min("_cand").alias("_best"))
    return best.select(
        "s_suppkey",
        F.col("_best.dist").alias("best_dist"),
        F.col("_best.name").alias("best_nation"),
    )


@register(
    "h13_casts",
    oracle=(
        "SELECT o_orderkey, "
        "CAST(o_orderkey AS VARCHAR) AS key_str, "
        "CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_rt, "
        "CAST(o_orderkey AS DOUBLE) AS key_dbl, "
        "TRY_CAST(o_orderpriority AS INT) AS prio_int, "
        "CAST(o_totalprice >= 100000.0 AS INT) AS is_big, "
        "CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS od_str "
        "FROM orders WHERE o_orderkey % 7 = 0"
    ),
    section="H13",
)
def h13_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-coercion group (round-1 addition): the cast lattice both
    engines agree on, probed — int↔string round-trip, int→double,
    TRY_CAST of non-numeric text → NULL, boolean→int, timestamp→date,
    date→ISO string. (Deliberately OUTSIDE the subset: double→int —
    Spark truncates, DuckDB rounds — and double→string formatting;
    SURVEY §5.3.4.)"""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("string").cast("bigint").alias("key_rt"),
        F.col("o_orderkey").cast("double").alias("key_dbl"),
        F.expr("try_cast(o_orderpriority AS int)").alias("prio_int"),
        (F.col("o_totalprice") >= 100000.0).cast("int").alias("is_big"),
        # DATE-typed output lands as date-vs-Timestamp pandas dtypes
        # across engines — the ISO-string round trip proves the cast
        # without the dtype divergence.
        F.col("o_orderdate").cast("date").cast("string").alias("od_str"),
    )


@register(
    "h14_variant_json",
    oracle=(
        "SELECT event_id, "
        "CAST(json_extract(props, '$.k') AS BIGINT) AS k_val, "
        "CAST(json_extract(props, '$.missing') AS BIGINT) AS k_missing, "
        "CAST(json_extract(props, '$.k') AS DOUBLE) AS k_dbl "
        "FROM events WHERE event_id % 13 = 0"
    ),
    section="H14",
)
def h14_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured access (Spark 4; round-2 addition):
    ``parse_json`` → binary VARIANT once, then typed ``variant_get``
    path extraction — the engine parses each JSON payload a single
    time no matter how many paths are read, vs H9's per-call string
    re-parse of ``get_json_object``. At 100 TB this is the difference
    between one decode and p decodes per row for p paths; missing
    paths surface as typed NULLs. The oracle reads the same paths via
    DuckDB's JSON extraction — identical typed values."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 13 == 0)
    v = ev.select("event_id", F.parse_json("props").alias("_v"))
    return v.select(
        "event_id",
        F.variant_get("_v", "$.k", "bigint").alias("k_val"),
        F.variant_get("_v", "$.missing", "bigint").alias("k_missing"),
        F.variant_get("_v", "$.k", "double").alias("k_dbl"),
    )


@register(
    "h15_url_funcs",
    oracle=(
        "SELECT doc_id, "
        "'https' AS proto, "
        "source || '.example.com' AS host, "
        "'/docs/' || CAST(doc_id AS VARCHAR) AS path, "
        "'lang=' || lang || '&n=' || CAST(n_chars AS VARCHAR) AS query, "
        "lang AS q_lang "
        "FROM documents WHERE doc_id % 10 = 0"
    ),
    section="H15",
)
def h15_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing (round-2 addition) — the web-corpus staple: build a
    deterministic URL per document, then decompose it with Spark's
    ``parse_url`` (PROTOCOL / HOST / PATH / QUERY and keyed QUERY
    access). The oracle reconstructs each component directly from the
    source columns, so any parse_url deviation (trailing slashes,
    query-key extraction) is a hash mismatch. All JVM, codegen'd,
    narrow — at 100 TB this runs at scan speed, which is why URL
    normalization/domain bucketing belongs in the engine, not a UDF."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&n="),
        F.col("n_chars").cast("string"),
    )
    u = d.select("doc_id", url.alias("_url"))
    return u.select(
        "doc_id",
        F.parse_url("_url", F.lit("PROTOCOL")).alias("proto"),
        F.parse_url("_url", F.lit("HOST")).alias("host"),
        F.parse_url("_url", F.lit("PATH")).alias("path"),
        F.parse_url("_url", F.lit("QUERY")).alias("query"),
        F.parse_url("_url", F.lit("QUERY"), F.lit("lang")).alias("q_lang"),
    )


@register(
    "h16_inet_funcs",
    oracle=(
        "WITH ip AS (SELECT c_custkey, "
        "(c_custkey * 2654435761) % 4294967296 AS a FROM customer), "
        "oct AS (SELECT c_custkey, a, "
        "a // 16777216 AS o1, (a // 65536) % 256 AS o2, "
        "(a // 256) % 256 AS o3, a % 256 AS o4 FROM ip), "
        "cls AS (SELECT c_custkey, a, "
        "o1 || '.' || o2 || '.' || o3 || '.' || o4 AS ip_str, "
        "CASE WHEN a // 16777216 = 10 THEN 'rfc1918/8' "
        "WHEN a // 1048576 = 2753 THEN 'rfc1918/12' "
        "WHEN a // 65536 = 49320 THEN 'rfc1918/16' "
        "ELSE 'public' END AS ip_class FROM oct) "
        "SELECT ip_class, CAST(COUNT(*) AS BIGINT) AS n_custs, "
        "MIN(ip_str) AS min_ip, MAX(ip_str) AS max_ip "
        "FROM cls GROUP BY 1"
    ),
    section="H16",
)
def h16_inet_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inet function group — the network-analytics scalar surface
    (Trino's ip-address functions, re-expressed as exact integer
    arithmetic since Spark has no inet type): deterministic synthetic
    IPv4s (Knuth multiplicative hash of c_custkey, exact in BIGINT on
    both engines), octet extraction by div/mod, dotted-quad rendering,
    and CIDR-block classification — membership in p-prefix block B is
    ip div 2^(32−p) = base div 2^(32−p), applied for the three RFC-1918
    ranges (10/8 → 10, 172.16/12 → 2753, 192.168/16 → 49320). Pure
    codegen scalar chain + one 4-group aggregate; the lexicographic
    MIN/MAX of the dotted strings are deterministic (exact strings)."""
    c = load(spark, sf_dir, "customer")
    a = (F.col("c_custkey") * 2654435761) % 4294967296
    ip = c.select("c_custkey", a.alias("a"))
    d = ip.select(
        "c_custkey",
        "a",
        F.expr("a div 16777216").alias("o1"),
        F.expr("(a div 65536) % 256").alias("o2"),
        F.expr("(a div 256) % 256").alias("o3"),
        (F.col("a") % 256).alias("o4"),
    )
    cls = d.select(
        F.concat_ws(".", "o1", "o2", "o3", "o4").alias("ip_str"),
        F.when(F.expr("a div 16777216") == 10, "rfc1918/8")
        .when(F.expr("a div 1048576") == 2753, "rfc1918/12")
        .when(F.expr("a div 65536") == 49320, "rfc1918/16")
        .otherwise("public")
        .alias("ip_class"),
    )
    return cls.groupBy("ip_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_custs"),
        F.min("ip_str").alias("min_ip"),
        F.max("ip_str").alias("max_ip"),
    )


# --------------------------------------------------------------------------
# H17 — try_* arithmetic (the ANSI-mode safety companions)
# --------------------------------------------------------------------------
@register(
    "h17_try_arithmetic",
    oracle=(
        "SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows, "
        "CAST(COUNT(*) FILTER (WHERE l_quantity = 25) AS BIGINT) "
        "AS n_nulled, "
        "CAST(SUM(CASE WHEN l_quantity <> 25 THEN "
        "CAST(ROUND(l_extendedprice / (l_quantity - 25), 6) "
        "AS DECIMAL(28,6)) END) AS DOUBLE) AS sum_safe_div "
        "FROM lineitem GROUP BY 1"
    ),
    section="H17",
)
def h17_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_* arithmetic under ANSI mode: this session pins
    spark.sql.ansi.enabled=true (SURVEY §5.2's posture), so a plain
    division by zero THROWS — `try_divide` is the declarative
    per-expression escape hatch (NULL instead of abort) that lets a
    pipeline keep strict semantics globally while tolerating known
    bad cells locally, without a CASE wrapped around every operand.
    The demo divides price by (quantity − 25) — genuinely zero for
    the qty=25 slice — counts the nulled rows, and DECIMAL-sums the
    per-row ROUND(…, 6) quotients (k22's discipline: division is
    IEEE-exact per row, the sum rides order-free decimals). The
    oracle replays the CASE form try_divide desugars to. Scale
    shape: one map-side-combinable groupBy over the scan."""
    li = load(spark, sf_dir, "lineitem")
    q = F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 25)
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(q.isNull().cast("int")).cast("bigint").alias("n_nulled"),
        F.sum(F.round(q, 6).cast("decimal(28,6)"))
        .cast("double")
        .alias("sum_safe_div"),
    )


# --------------------------------------------------------------------------
# H18 — temporal sequence generation (sequence / generate_series)
# --------------------------------------------------------------------------
@register(
    "h18_temporal_sequence",
    oracle=(
        "WITH spine AS (SELECT gs AS m FROM generate_series("
        "  DATE '1992-01-01', DATE '1998-12-01', INTERVAL 1 MONTH) g(gs)), "
        "cnt AS (SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS m, "
        "  CAST(COUNT(*) AS BIGINT) AS n FROM orders GROUP BY 1) "
        "SELECT CAST(spine.m AS TIMESTAMP) AS month, "
        "CAST(year(spine.m) AS INT) AS yr, CAST(quarter(spine.m) AS INT) AS qtr, "
        "COALESCE(cnt.n, 0) AS n_orders "
        "FROM spine LEFT JOIN cnt ON cnt.m = spine.m"
    ),
    section="H18",
)
def h18_temporal_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal sequence generation — ``sequence()`` + explode builds
    the 84-month TPC-H calendar spine as a FUNCTION (the declarative
    twin of B9's recursive-CTE spine; same gap-fill contract: months
    with zero orders surface as explicit 0 rows), plus the
    year/quarter extraction family. Month-START boundaries only, so
    Spark's add-months stepping and DuckDB's interval stepping land
    on identical instants (end-of-month stepping is where engines
    diverge — a real cross-engine hazard this operator deliberately
    stays off). Scale shape: the spine is a constant-size
    single-partition generator broadcast into the left join; the
    fact-side rollup is one month-keyed map-side-combinable fold."""
    o = load(spark, sf_dir, "orders")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1992-01-01").cast("date"),
                F.lit("1998-12-01").cast("date"),
                F.expr("interval 1 month"),
            )
        ).alias("d")
    ).select(F.col("d").cast("timestamp").alias("month"))
    cnt = o.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    return (
        spine.join(cnt, "month", "left")
        .select(
            "month",
            F.year("month").cast("int").alias("yr"),
            F.quarter("month").cast("int").alias("qtr"),
            F.coalesce("n", F.lit(0).cast("bigint")).alias("n_orders"),
        )
    )


# --------------------------------------------------------------------------
# H19 — phonetic key (soundex-lite) + phonetic-blocking join
# --------------------------------------------------------------------------
_PH_FROM = "BFPVCGJKQSXZDTLMNRAEIOUHWY"
_PH_TO = "11112222222233455600000000"


def phonetic_key(col):
    """Deterministic soundex-LITE key: first letter + the first three
    consonant-class codes (b/f/p/v→1, c/g/j/k/q/s/x/z→2, d/t→3, l→4,
    m/n→5, r→6), adjacent duplicate codes collapsed, vowels/h/w/y
    dropped, zero-padded to 4 chars. Deliberately NOT engine-native
    soundex: Spark's builtin carries the classic H/W-transparency
    quirks DuckDB has no counterpart for; this variant is pure
    upper/translate/replace/substr — the exact same op chain runs on
    both engines (o_phonetic_key emits the SQL twin), so keys are
    hash-comparable. Run collapsing uses 5 passes of pairwise
    replace('dd'→'d') per code — each pass halves a run's length
    (ceil), so runs up to 2⁵ = 32 characters collapse to one — ample,
    tokens are ≤ ~20 chars."""
    u = F.upper(col)
    coded = F.translate(F.substring(u, 2, 100), _PH_FROM, _PH_TO)
    for _ in range(5):
        for d in "123456":
            coded = F.replace(coded, F.lit(d + d), F.lit(d))
    coded = F.replace(coded, F.lit("0"), F.lit(""))
    return F.concat(
        F.substring(u, 1, 1), F.substring(F.concat(coded, F.lit("000")), 1, 3)
    )


def o_phonetic_key(expr: str) -> str:
    """DuckDB SQL twin of :func:`phonetic_key` — same op chain."""
    coded = f"translate(substr(upper({expr}), 2, 100), '{_PH_FROM}', '{_PH_TO}')"
    for _ in range(5):
        for d in "123456":
            coded = f"replace({coded}, '{d}{d}', '{d}')"
    coded = f"replace({coded}, '0', '')"
    return (
        f"(substr(upper({expr}), 1, 1) || substr({coded} || '000', 1, 3))"
    )


@register(
    "h19_phonetic_join",
    oracle=(
        "WITH heads AS (SELECT DISTINCT string_split(p_name, ' ')[1] AS tok "
        "FROM part), "
        "toks AS (SELECT tok FROM heads UNION "
        "  SELECT regexp_replace(tok, '[aeiou]', 'o', 'g') FROM heads), "
        f"keyed AS (SELECT tok, {o_phonetic_key('tok')} AS pkey FROM toks) "
        "SELECT a.pkey AS pkey, a.tok AS tok_a, b.tok AS tok_b, "
        "CAST(levenshtein(a.tok, b.tok) AS INT) AS lev "
        "FROM keyed a JOIN keyed b ON a.pkey = b.pkey AND a.tok < b.tok"
    ),
    section="H19",
)
def h19_phonetic_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic-key blocking join — the classic record-linkage
    primitive (C16's edit-distance fuzzy join finds typos; this finds
    SOUND-alike names with arbitrary edit distance): distinct part-name
    head tokens keyed by the soundex-lite :func:`phonetic_key`, then a
    key EQUI-join pairs tokens that encode alike, annotated with their
    levenshtein distance (both engines' levenshtein agree on ASCII).
    Blocking IS the scale story: candidates come only from key-bucket
    equi-joins — at 100 TB the dictionary self-join stays proportional
    to Σ bucket² over ~genuinely-confusable groups, never all-pairs
    (the same reason k2b bands and i3 grids exist)."""
    heads = (
        load(spark, sf_dir, "part")
        .select(F.split("p_name", " ")[0].alias("tok"))
        .distinct()
    )
    # Planted sound-alike tier: vowel substitution preserves the
    # phonetic key BY CONSTRUCTION (vowels code to dropped zeros), so
    # the dictionary carries guaranteed confusable pairs at every sf
    # (the fixture's organic vocabulary is 8 head tokens with exactly
    # one natural collision, red/rod) — the misspelled-name shape a
    # record-linkage dictionary actually has.
    toks = heads.select("tok").union(
        heads.select(F.regexp_replace("tok", "[aeiou]", "o").alias("tok"))
    ).distinct()
    keyed = toks.select("tok", phonetic_key(F.col("tok")).alias("pkey"))
    a = keyed.select(F.col("pkey"), F.col("tok").alias("tok_a"))
    b = keyed.select(F.col("pkey"), F.col("tok").alias("tok_b"))
    return (
        a.join(b, "pkey")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .select(
            "pkey",
            "tok_a",
            "tok_b",
            F.levenshtein("tok_a", "tok_b").cast("int").alias("lev"),
        )
    )
