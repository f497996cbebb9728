"""SURVEY.md §2.H — scalar function layer, one query per family.

Every function here is a built-in pyspark.sql.functions call (JVM-side,
whole-stage-codegen'd — never a Python UDF). Oracle twins encode the
dialect deltas discovered by probing DuckDB 1.0.0:

- dayofweek: DuckDB Sunday=0, Spark Sunday=1 -> twin adds 1;
- date_trunc on TIMESTAMP returns DATE in DuckDB -> cast both to DATE;
- epoch() returns fractional seconds -> floor + cast vs unix_timestamp;
- list_distinct is unordered -> always sort after distinct on both sides;
- round(): both round half away from zero for positives, but ONLY apply
  round to values without exact decimal ties at the cut position (divide
  by 3, logs, etc.) — 2-decimal money rounded to 1 decimal would diverge
  because Spark rounds the exact binary expansion while DuckDB scales by
  a power of ten first;
- transcendentals (exp/ln/pow): libm vs JVM may differ in the last ulp ->
  round to 9 digits; sqrt is IEEE-correctly-rounded -> exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..operators._helpers import sql_lsum
from ..registry import register


@register(
    "fn_string",
    category="functions",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS up_name,
       lower(p_type) AS low_type,
       trim(concat_ws('-', p_type, p_brand)) AS joined,
       substr(p_name, 1, 5) AS name5,
       lpad(p_brand, 12, '*') AS padded,
       length(p_name) AS name_len,
       replace(p_brand, 'Brand#', 'B') AS brand_short,
       instr(p_name, 'a') AS first_a,
       array_to_string(string_split(p_type, ' '), '|') AS type_words,
       regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS brand_num,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
       levenshtein(p_brand, 'Brand#10') AS lev_to_b10
FROM part
WHERE p_partkey < 300
""",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.lower("p_type").alias("low_type"),
        F.trim(F.concat_ws("-", "p_type", "p_brand")).alias("joined"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.lpad("p_brand", 12, "*").alias("padded"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_brand"), F.lit("Brand#"), F.lit("B")).alias("brand_short"),
        F.instr(F.col("p_name"), "a").alias("first_a"),
        # Array outputs are serialized to '|'-joined strings: the external
        # driver canonicalizes results with pandas sort_values, which cannot
        # sort list-typed cells (round-1 gate failure).
        F.array_join(F.split("p_type", " "), "|").alias("type_words"),
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#10")).alias("lev_to_b10"),
    )


@register(
    "fn_datetime",
    category="functions",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate) AS yr,
       month(o_orderdate) AS mo,
       dayofweek(o_orderdate) + 1 AS dow,
       hour(o_orderdate) AS hr,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       CAST(o_orderdate AS DATE) + 30 AS plus30,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98,
       CAST(date_diff('month', date_trunc('month', o_orderdate),
                      DATE '1998-01-01') AS DOUBLE) AS months_to_98,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS unix_sec,
       CAST('1998-06-15' AS DATE) AS fixed_date,
       make_date(year(o_orderdate), month(o_orderdate), 1) AS first_of_month
FROM orders
WHERE o_orderkey < 1000
""",
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.hour("o_orderdate").alias("hr"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("plus30"),
        F.datediff(F.lit("1998-01-01").cast("date"), F.col("o_orderdate")).alias(
            "days_to_98"
        ),
        F.months_between(
            F.lit("1998-01-01").cast("date"),
            F.date_trunc("month", F.col("o_orderdate")),
        ).alias("months_to_98"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        F.unix_timestamp(F.col("o_orderdate")).alias("unix_sec"),
        F.to_date(F.lit("1998-06-15")).alias("fixed_date"),
        F.make_date(F.year("o_orderdate"), F.month("o_orderdate"), F.lit(1)).alias(
            "first_of_month"
        ),
    )


@register(
    "fn_math",
    category="functions",
    oracle="""
SELECT l_orderkey, l_linenumber,
       abs(l_extendedprice - 50000) AS abs_dev,
       round(l_extendedprice / 3.0, 2) AS third_rounded,
       CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
       CAST(floor(l_tax * 100) AS BIGINT) AS tax_pct_floor,
       sqrt(l_extendedprice) AS price_sqrt,
       round(exp(l_discount), 9) AS disc_exp,
       round(ln(l_extendedprice), 9) AS price_ln,
       round(log10(l_extendedprice), 9) AS price_log10,
       round(pow(l_quantity, 2), 9) AS qty_sq,
       CAST(sign(l_extendedprice - 30000) AS DOUBLE) AS price_sign,
       l_orderkey % 7 AS key_mod7,
       greatest(l_quantity, l_discount * 100, 10.0) AS biggest,
       least(l_quantity, l_tax * 100) AS smallest
FROM lineitem
WHERE l_orderkey < 800
""",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 800)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 50000).alias("abs_dev"),
        F.round(F.col("l_extendedprice") / 3.0, 2).alias("third_rounded"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        F.floor(F.col("l_tax") * 100).alias("tax_pct_floor"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.round(F.exp("l_discount"), 9).alias("disc_exp"),
        F.round(F.log("l_extendedprice"), 9).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 9).alias("price_log10"),
        F.round(F.pow("l_quantity", F.lit(2)), 9).alias("qty_sq"),
        F.signum(F.col("l_extendedprice") - 30000).alias("price_sign"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100, F.lit(10.0)).alias(
            "biggest"
        ),
        F.least(F.col("l_quantity"), F.col("l_tax") * 100).alias("smallest"),
    )


@register(
    "fn_conditional",
    category="functions",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000 THEN 'XL'
            WHEN o_totalprice > 150000 THEN 'L'
            WHEN o_totalprice > 50000  THEN 'M'
            ELSE 'S' END AS size_class,
       coalesce(NULLIF(o_orderstatus, 'O'), 'open') AS status_or_open,
       CASE WHEN NULLIF(o_orderpriority, '5-LOW') IS NOT NULL
            THEN 'prioritized' ELSE 'low' END AS prio_class,
       CASE WHEN o_orderstatus = 'F' AND o_totalprice > 200000 THEN o_totalprice END
         AS big_finished_price
FROM orders
WHERE o_orderkey < 2000
""",
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "XL")
        .when(F.col("o_totalprice") > 150000, "L")
        .when(F.col("o_totalprice") > 50000, "M")
        .otherwise("S")
        .alias("size_class"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_or_open"
        ),
        F.nvl2(
            F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")),
            F.lit("prioritized"),
            F.lit("low"),
        ).alias("prio_class"),
        F.when(
            (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 200000),
            F.col("o_totalprice"),
        ).alias("big_finished_price"),
    )


@register(
    "fn_array",
    category="functions",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 80
)
SELECT doc_id,
       len(toks) AS n_tokens,
       list_contains(toks, 'join') AS has_join,
       array_to_string(list_sort(list_distinct(toks)), '|') AS uniq_sorted,
       array_to_string(list_slice(toks, 1, 5), '|') AS first5,
       array_to_string(flatten([list_slice(toks, 1, 2), list_slice(toks, 3, 4)]), '|')
         AS first4,
       array_to_string(
         list_sort(list_distinct(list_concat(list_slice(toks, 1, 3), ['aaa','zzz']))),
         '|') AS with_extras,
       array_to_string(list_transform(toks, x -> CAST(length(x) AS VARCHAR)), '|')
         AS tok_lens,
       coalesce(array_to_string(list_filter(toks, x -> length(x) > 6), '|'), '')
         AS long_toks,
       len(list_filter(toks, x -> x = 'scan')) > 0 AS has_scan,
       CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS BIGINT)
         AS total_chars,
       array_to_string(
         list_transform(list_zip(list_slice(toks, 1, 3), list_slice(toks, 2, 4)),
                        p -> concat(p[1], '_', p[2])), '|') AS bigram3
FROM t
""",
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + higher-order functions over token arrays (all-integer/string
    element types keep the oracle comparison exact).

    Every array-typed result is serialized via array_join('|') — the
    external driver canonicalizes with pandas sort_values, which cannot
    sort list cells (round-1 gate failure); '|' never occurs in tokens."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 80)
    toks = F.split(F.col("text"), " ")
    t = d.select("doc_id", toks.alias("toks"))
    tk = F.col("toks")

    def joined(col, name):
        return F.array_join(col, "|").alias(name)

    return t.select(
        "doc_id",
        F.size(tk).alias("n_tokens"),
        F.array_contains(tk, "join").alias("has_join"),
        joined(F.sort_array(F.array_distinct(tk)), "uniq_sorted"),
        joined(F.slice(tk, 1, 5), "first5"),
        joined(F.flatten(F.array(F.slice(tk, 1, 2), F.slice(tk, 3, 2))), "first4"),
        joined(
            F.sort_array(
                F.array_distinct(
                    F.array_union(F.slice(tk, 1, 3), F.array(F.lit("aaa"), F.lit("zzz")))
                )
            ),
            "with_extras",
        ),
        joined(F.transform(tk, lambda x: F.length(x).cast("string")), "tok_lens"),
        joined(F.filter(tk, lambda x: F.length(x) > 6), "long_toks"),
        F.exists(tk, lambda x: x == "scan").alias("has_scan"),
        F.aggregate(
            F.transform(tk, lambda x: F.length(x)), F.lit(0), lambda acc, x: acc + x
        ).alias("total_chars"),
        joined(
            F.zip_with(
                F.slice(tk, 1, 3),
                F.slice(tk, 2, 3),
                lambda a, b: F.concat(a, F.lit("_"), b),
            ),
            "bigram3",
        ),
    )


@register(
    "fn_map",
    category="functions",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_value,
       1 AS n_keys,
       'k' AS key_list,
       CAST(json_extract_string(props, '$.k') AS INT) * 2 AS doubled_via_map
FROM events
WHERE event_id < 500
""",
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map functions: from_json -> map, element_at, size, map_keys,
    map_from_arrays. Map- and array-typed columns stay internal (outputs
    are scalars; key_list is array_join'd) because engines don't agree on
    map rendering and the driver canonicalizer cannot sort list cells."""
    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    m = F.from_json(F.col("props"), "map<string,int>")
    m2 = F.map_from_arrays(
        F.array(F.lit("orig"), F.lit("double")),
        F.array(F.element_at(m, "k"), F.element_at(m, "k") * 2),
    )
    return e.select(
        "event_id",
        F.element_at(m, "k").alias("k_value"),
        F.size(m).alias("n_keys"),
        F.array_join(F.sort_array(F.map_keys(m)), "|").alias("key_list"),
        F.element_at(m2, "double").alias("doubled_via_map"),
    )


@register(
    "fn_json",
    category="functions",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
       to_json({'k': CAST(json_extract_string(props, '$.k') AS INT),
                'et': event_type})::VARCHAR AS rebuilt,
       CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing_field
FROM events
WHERE event_id < 500
""",
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON functions over the props JSON-string column."""
    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    parsed = F.from_json(F.col("props"), "struct<k:int>")
    return e.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        F.to_json(
            F.struct(parsed.getField("k").alias("k"), F.col("event_type").alias("et"))
        ).alias("rebuilt"),
        F.get_json_object(F.col("props"), "$.missing").alias("missing_field"),
    )


@register(
    "fn_hash",
    category="functions",
    oracle="""
SELECT c_custkey,
       md5(c_name) AS name_md5,
       sha256(c_name) AS name_sha256,
       length(md5(c_name)) AS md5_len
FROM customer
WHERE c_custkey < 400
""",
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hashes (dedup keys) — hex-string output on both engines."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 400)
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2(F.col("c_name"), 256).alias("name_sha256"),
        F.length(F.md5("c_name")).alias("md5_len"),
    )


_HASH_GOLDEN = [
    (0, 8301032585243059592, 2010948394, -112550077),
    (1, 5289279398613631133, 14390204, -947655689),
    (2, -5385866796556993174, 2580726278, 1908694569),
    (3, -7323747135420719625, 4006998672, -205659540),
    (4, 2625438254509407252, 1890674483, 1347131560),
    (5, 8283732698265051459, 129390501, -1880369069),
    (6, 7875384622962415781, 2663319071, 1039844640),
    (7, 9076022924271894411, 3921163913, -1649151332),
    (8, -7167132826411508153, 2030512920, 1696117559),
    (9, -7377975160856460178, 234888078, 334670878),
    (10, 4841224240843282768, 1858572907, 838441380),
    (11, 2490026669607563975, 432055037, -551895904),
    (12, -2734326505503152425, 2160718663, -1724925669),
    (13, -1054789559877307812, 4157522897, 719889345),
    (14, 7366189583268577740, 1772770930, 1044904363),
    (15, -9137723963125142048, 514680548, -1145019561),
    (16, -7887531508079578389, 2275686238, 686815962),
    (17, -1077007612435860915, 4037216200, 741458428),
    (18, 7218776507933624190, 1612454489, -2085579151),
    (19, 1111105844075064349, 387656399, -1996611034),
    (20, 4877915358053964143, 1173012904, -287736816),
    (21, 8570992479593444176, 854454590, 1812810682),
    (22, 502250033827146272, 2883887236, 975083758),
    (23, 848267719896980043, 3705901074, 1424172122),
    (24, 6516013613975197476, 1116145073, 1268680906),
    (25, 399658285163309559, 897594663, 284756264),
    (26, -6543280573480150533, 2894685341, -1707958790),
    (27, -675892595369365857, 3683537931, 1921003419),
    (28, -1729708830575040516, 1261521306, -106372186),
    (29, 3123564276814891801, 1010202892, -247482879),
    (30, -1719636915183408441, 1559359721, -2078063651),
    (31, 3006352385870894629, 737591423, -523950112),
    (32, 5340931246604590596, 3003093445, -1876117553),
    (33, 3594476111972547533, 3321405779, -564287552),
    (34, 5557439296345382625, 1536963824, 1187124818),
    (35, 1527366404791622539, 748356710, 1103833562),
    (36, 5400709032175749669, 3046266332, -935579106),
    (37, 168761453612911715, 3264570698, 64460593),
    (38, 7707718367737074975, 1378515163, 912703074),
    (39, 1994910729525627828, 623724621, -63672337),
    (40, 6682671781103250050, 330327598, -1830814632),
    (41, -6621670571447896632, 1689736888, -2099183752),
    (42, 7049362041103856829, 4257089282, 981094365),
    (43, -6927411359391466878, 2327394196, -1178162760),
    (44, 9021928415467532178, 350069303, 125131529),
    (45, 2651088631043815147, 1675268769, -1376876472),
    (46, -1253911691549363914, 4208182043, 1365822622),
    (47, -9074199405352827802, 2379543437, 1688143414),
    (48, -8337872059657512107, 493612572, -691684844),
    (49, 6167683219026507464, 1785519754, -214938291),
    (50, -3687672830622690082, 179001199, 1650938130),
    (51, 1967002130533069991, 2108450809, 1937504155),
    (52, 182437912268146377, 3836032579, -1171854584),
    (53, 6830467974576908100, 2476869333, -1517226038),
    (54, -1815254944267581112, 231117686, 2092285977),
    (55, 6175273480749150324, 2059510752, -912383377),
    (56, -5238158460241133935, 3821597274, -343123958),
    (57, -3665958566257849103, 2496643788, -72347408),
    (58, 3684489511673375993, 74506077, 307384173),
    (59, -582744318030533359, 1937240011, -2043849228),
    (60, 1176462107503269492, 562431148, -1552790187),
    (61, 9072769093225039341, 1451308090, 1867253355),
    (62, 1564447918139321612, 3481822592, -123631021),
    (63, 7504005165413886300, 3096401174, -1827849558),
    (64, 1562559952836240694, 652984501, -895995504),
    (65, -7814280168094833899, 1374482467, -392756336),
    (66, 7491834388715254256, 3370492313, 387793882),
    (67, 4210620867071321487, 3219296527, 98077700),
    (68, 6548201897865140717, 794659998, -1791653083),
    (69, 5859994983436871421, 1482341384, -728959234),
    (70, -725806528922443443, 949827053, 1692592771),
    (71, -6765073304628250464, 1335494011, -882066528),
    (72, -388238626901555422, 3599979713, 136473730),
    (73, 5511132816115916844, 2710856791, 1488988722),
    (74, -8512135002737972007, 1072755188, 1386644174),
    (75, 7018028027655955247, 1224196450, 1264335935),
    (76, -5636316028846312266, 3523121368, 1178781650),
    (77, 3792455898342752656, 2801377358, 708704880),
    (78, -1777927528060236214, 910605791, 861578831),
    (79, -532465267852967679, 1094815049, 93666692),
    (80, -1592034701435531517, 3204786466, -2105983531),
    (81, 2807245557878754689, 3355580852, -313357473),
    (82, 1718270651460128492, 1359693838, -525691082),
    (83, 5877252010445065973, 638351512, 1526832800),
    (84, -419830573054900666, 3093884219, -775333994),
    (85, -2863641617473075021, 3480214957, -337825083),
    (86, -7730519165310180269, 1449561111, -1390535118),
    (87, 2795109827333880816, 560053377, -2116214327),
    (88, -143256837088484654, 2984157456, 555197913),
    (89, 3485839849464871029, 3336147334, -1578760517),
    (90, 1346603968348542685, 2786990179, 447474195),
    (91, 6502064730465445148, 3508087029, -1244576003),
    (92, -3733079881957555358, 1209039183, -492293027),
    (93, 4145717622758811620, 1058490841, 207874943),
    (94, 5153269270312887699, 2708724858, -946304230),
    (95, 511199978261752219, 3597987052, -56898179),
    (96, 5492406982651728201, 1333640534, 1011358217),
    (97, -8326094634869783166, 947555776, 1515957583),
    (98, -3316067397490187838, 2831519825, 173431333),
    (99, -8910134496335529124, 3754074311, -1019146665)
]


def _hash_engine_oracle() -> str:
    """Golden-value oracle: Spark's xxhash64/crc32/murmur3 are STABLE
    public algorithms (bucketing and shuffle partitioning depend on their
    cross-version stability), and c_name for a given c_custkey is
    identical at every scale factor, so the expected hashes for keys
    0..99 are pinned as literals. The join against the live customer
    table (plus a live md5 recomputed by BOTH engines) keeps the golden
    rows anchored to the actual data rather than free-floating
    constants."""
    vals = ",\n".join(f"({k}, {x}, {c}, {m})" for k, x, c, m in _HASH_GOLDEN)
    return f"""
SELECT c.c_custkey, md5(c.c_name) AS name_md5,
       CAST(g.x AS BIGINT) AS name_xxh64,
       CAST(g.c AS BIGINT) AS name_crc32,
       CAST(g.m AS INT) AS name_murmur
FROM customer c
JOIN (VALUES
{vals}) g(k, x, c, m) ON g.k = c.c_custkey
"""


@register("fn_hash_engine", category="functions", oracle=_hash_engine_oracle())
def fn_hash_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-specific hashes (xxhash64/crc32/murmur3) used for salting and
    MinHash seeding. DuckDB cannot compute them, but it does not need to:
    they are deterministic stable functions, so the oracle carries golden
    values for the 100 sf-stable customer names (keys 0..99) and verifies
    the live md5 alongside (computed by both engines) to anchor the rows
    to real data. A hash-algorithm regression — which would silently
    scramble every bucketed table — hash-fails here."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100)
    return c.select(
        "c_custkey",
        F.md5(F.col("c_name").cast("binary")).alias("name_md5"),
        F.xxhash64("c_name").alias("name_xxh64"),
        F.crc32(F.col("c_name").cast("binary")).alias("name_crc32"),
        F.hash("c_name").alias("name_murmur"),
    )


@register(
    "fn_bitwise",
    category="functions",
    oracle="""
SELECT o_orderkey,
       o_orderkey & 255 AS band,
       o_orderkey | 4096 AS bor,
       xor(o_orderkey, 1535) AS bxor,
       ~o_orderkey AS bnot,
       o_orderkey << 3 AS shl,
       o_orderkey >> 2 AS shr,
       CAST(bit_count(o_orderkey) AS INT) AS popcount
FROM orders WHERE o_orderkey < 3000
""",
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: AND/OR/XOR/NOT, shifts, popcount — the bit-twiddling
    layer under hash partitioning, bloom filters, and bitmap flags."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(4096)).alias("bor"),
        k.bitwiseXOR(F.lit(1535)).alias("bxor"),
        F.bitwise_not(k).alias("bnot"),
        F.shiftleft(k, 3).alias("shl"),
        F.shiftright(k, 2).alias("shr"),
        F.bit_count(k).alias("popcount"),
    )


@register(
    "fn_try",
    category="functions",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice / nullif(l_discount, 0.0) AS safe_div,
       TRY_CAST(l_comment_digits AS BIGINT) AS parsed,
       TRY_CAST('not a number' AS BIGINT) AS unparsable
FROM (
  SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount,
         CASE WHEN l_linenumber % 2 = 0 THEN CAST(l_orderkey AS VARCHAR)
              ELSE 'n/a' END AS l_comment_digits
  FROM lineitem WHERE l_orderkey < 2000
)
""",
)
def fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe expression family (SURVEY §7 hard part 5): Spark 4 runs
    ANSI mode by default, so raw division/casts THROW on bad input at
    100 TB instead of silently nulling. try_divide / try_cast / nullif
    give DuckDB-identical NULL-on-failure semantics — the discipline every
    oracle-matched expression in this repo follows."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    digits = F.when(
        F.col("l_linenumber") % 2 == 0, F.col("l_orderkey").cast("string")
    ).otherwise(F.lit("n/a"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(
            F.col("l_extendedprice"), F.nullif(F.col("l_discount"), F.lit(0.0))
        ).alias("safe_div"),
        F.try_to_number(digits, F.lit("999999999")).cast("bigint").alias("parsed"),
        F.lit("not a number").try_cast("bigint").alias("unparsable"),
    )


@register(
    "fn_variant",
    category="functions",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.missing') AS INT) AS missing_int,
       to_json(json(props))::VARCHAR AS canonical_json,
       CAST(json_extract_string(props, '$.k') AS INT) >= 50 AS k_high
FROM events
WHERE event_id < 600
""",
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT type: parse_json -> binary variant, typed path
    extraction via (try_)variant_get, canonical re-serialization. VARIANT
    is the semi-structured scale path — the binary encoding is
    shredded/predicate-pushable, unlike repeated get_json_object string
    parsing which re-parses the JSON text per expression."""
    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 600)
    v = F.parse_json(F.col("props"))
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_int"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        F.try_variant_get(v, "$.missing", "int").alias("missing_int"),
        F.to_json(v).alias("canonical_json"),
        (F.variant_get(v, "$.k", "int") >= 50).alias("k_high"),
    )


@register(
    "fn_collation_ci",
    category="functions",
    oracle="""
WITH m AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
              ELSE lower(c_mktsegment) END AS seg_mixed
  FROM customer
)
SELECT lower(seg_mixed) AS seg_norm,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN seg_mixed = upper(seg_mixed) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_upper
FROM m GROUP BY 1
""",
)
def fn_collation_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collations: grouping under UNICODE_CI treats case variants
    as equal keys — collation-aware comparison without materializing
    lower() everywhere (the collation travels with the type, and data
    sources can push collated predicates). The output key is normalized
    with lower() on BOTH engines because a CI group's representative
    string is engine-arbitrary; the group MEMBERSHIP (counts) is what the
    collation determines and what the oracle pins."""
    c = table(spark, sf_dir, "customer")
    mixed = F.when(
        F.col("c_custkey") % 2 == 0, F.upper(F.col("c_mktsegment"))
    ).otherwise(F.lower(F.col("c_mktsegment")))
    m = c.select("c_custkey", mixed.alias("seg_mixed"))
    ci = F.collate(F.col("seg_mixed"), "UNICODE_CI")
    return (
        m.groupBy(ci.alias("seg_ci"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    F.col("seg_mixed") == F.upper(F.col("seg_mixed")), 1
                ).otherwise(0)
            ).alias("n_upper"),
        )
        .select(
            F.lower(F.col("seg_ci").cast("string")).alias("seg_norm"), "n", "n_upper"
        )
    )


_PIPE_SQL = """
FROM lineitem
|> WHERE l_shipdate >= DATE'1995-01-01'
|> AGGREGATE COUNT(*) AS n,
     CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty
   GROUP BY l_returnflag, l_linestatus
|> WHERE n > 0
|> SELECT l_returnflag, l_linestatus, n, sum_qty
"""


@register(
    "sql_pipe_syntax",
    category="functions",
    oracle="""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE l_shipdate >= DATE'1995-01-01'
GROUP BY l_returnflag, l_linestatus
HAVING COUNT(*) > 0
""",
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL pipe syntax (|>): the same logical plan as the
    equivalent nested SQL, expressed as a linear dataflow — each |> stage
    maps 1:1 onto a DataFrame transformation, and Catalyst optimizes the
    result identically (verified: hash-matches the classic-SQL oracle)."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_PIPE_SQL)


@register(
    "fn_url_parse",
    category="functions",
    oracle="""
WITH u AS (
  SELECT c_custkey,
         concat('https://', lower(c_mktsegment), '.example.org/c/',
                c_custkey, '?n=', c_nationkey, '&seg=',
                lower(c_mktsegment)) AS url
  FROM customer WHERE c_custkey <= 1000
)
SELECT c_custkey, url,
       regexp_extract(url, '^([a-z]+)://', 1) AS proto,
       regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
       regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
       regexp_extract(url, '[?&]n=([^&#]*)', 1) AS q_n
FROM u
""",
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL structure extraction with the built-in parse_url (JVM-side,
    codegen) — protocol / host / path / single query parameter. The URL
    is synthesized deterministically from fixture columns; the oracle
    re-parses the identical string with anchored regexes, so the check
    exercises real parsing, not string re-assembly. Pure projection:
    zero shuffles, scales linearly."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 1000)
    u = c.select(
        "c_custkey",
        F.concat(
            F.lit("https://"),
            F.lower("c_mktsegment"),
            F.lit(".example.org/c/"),
            F.col("c_custkey").cast("string"),
            F.lit("?n="),
            F.col("c_nationkey").cast("string"),
            F.lit("&seg="),
            F.lower("c_mktsegment"),
        ).alias("url"),
    )
    url = F.col("url")
    return u.select(
        "c_custkey",
        "url",
        F.lower(F.parse_url(url, F.lit("PROTOCOL"))).alias("proto"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("n")).alias("q_n"),
    )


@register(
    "fn_struct_ops",
    category="functions",
    oracle="""
SELECT o_orderstatus,
       COUNT(*) AS n,
       MAX(struct_pack(tp := o_totalprice, k := o_orderkey)).tp AS max_tp,
       CAST(MAX(struct_pack(tp := o_totalprice, k := o_orderkey)).k AS BIGINT)
         AS max_tp_orderkey,
       CAST(SUM(CASE WHEN struct_pack(st := o_orderstatus, tp := o_totalprice)
                       < struct_pack(st := 'O', tp := CAST(100000.0 AS DOUBLE))
                THEN 1 ELSE 0 END) AS BIGINT) AS n_before_pivot
FROM orders WHERE o_orderkey < 2000
GROUP BY o_orderstatus
""",
)
def fn_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested STRUCT surface: construction, lexicographic comparison, and
    MAX-of-struct as the canonical argmax (max (price, key) pair = max
    price with max-key tiebreak, one mergeable aggregate — the pattern
    that replaces a join-back or a window for 'row of the group max').
    Struct ordering is field-positional in both engines, so comparisons
    against a pivot struct and the struct MAX agree exactly. Output
    projects struct FIELDS (scalars), never raw structs — driver-output
    discipline (SURVEY §5.3)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    s1 = F.struct(
        F.col("o_orderstatus").alias("st"), F.col("o_totalprice").alias("tp")
    )
    pivot = F.struct(F.lit("O").alias("st"), F.lit(100000.0).alias("tp"))
    m = F.max(
        F.struct(F.col("o_totalprice").alias("tp"), F.col("o_orderkey").alias("k"))
    )
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        m.getField("tp").alias("max_tp"),
        m.getField("k").alias("max_tp_orderkey"),
        F.sum((s1 < pivot).cast("long")).alias("n_before_pivot"),
    )


@register(
    "fn_higher_order",
    category="functions",
    oracle="""
WITH d AS (
  SELECT doc_id, string_split(lower(text), ' ') AS toks
  FROM documents WHERE doc_id < 200
)
SELECT doc_id,
       CAST(len(list_filter(toks, x -> length(x) > 5)) AS INT) AS n_long,
       COALESCE(array_to_string(list_filter(toks, x -> length(x) > 5), '|'), '')
         AS long_toks,
       list_bool_or(list_transform(toks, x -> length(x) = 3)) AS has_len3,
       list_bool_and(list_transform(toks, x -> length(x) > 0)) AS all_nonempty,
       CAST(COALESCE(list_position(toks, 'table'), 0) AS BIGINT) AS table_pos
FROM d
""",
)
def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions as a first-class surface: filter /
    exists / forall lambdas and positional search, all JVM-side codegen
    (these are the primitives the EWMA fold, MaxSim sum, and entropy
    queries build on). Array outputs serialize through array_join —
    driver-output discipline. DuckDB twins: list_filter /
    list_bool_or(list_transform) / list_position (NULL-when-absent
    coalesced to Spark's 0-when-absent convention; empty-list
    array_to_string is NULL in DuckDB vs '' in Spark — coalesced too)."""
    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", F.split(F.lower(F.col("text")), " ").alias("toks"))
    )
    long_toks = F.filter(F.col("toks"), lambda x: F.length(x) > 5)
    return d.select(
        "doc_id",
        F.size(long_toks).alias("n_long"),
        F.array_join(long_toks, "|").alias("long_toks"),
        F.exists(F.col("toks"), lambda x: F.length(x) == 3).alias("has_len3"),
        F.forall(F.col("toks"), lambda x: F.length(x) > 0).alias("all_nonempty"),
        F.array_position(F.col("toks"), "table").cast("long").alias("table_pos"),
    )


@register(
    "fn_deterministic_uuid",
    category="functions",
    oracle="""
SELECT o_orderkey,
       concat(
         substr(h, 1, 8), '-', substr(h, 9, 4), '-',
         '5', substr(h, 14, 3), '-',
         '8', substr(h, 18, 3), '-',
         substr(h, 21, 12)
       ) AS order_uuid
FROM (
  SELECT o_orderkey,
         md5(concat('oddsetl:order:', CAST(o_orderkey AS VARCHAR))) AS h
  FROM orders WHERE o_orderkey < 2000
)
""",
)
def fn_deterministic_uuid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic UUIDv5-style identifiers minted from a namespaced
    business key: md5('namespace:key') folded into the 8-4-4-4-12 shape
    with the version/variant nibbles pinned ('5'/'8'). This is the
    idempotent-ingestion pattern — re-running a load re-mints the SAME id
    (so upserts converge), unlike uuid()/rand-based ids which differ per
    run, per engine, and per retry. Pure projection, codegen-resident,
    identical hex on both engines."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    h = F.md5(F.concat(F.lit("oddsetl:order:"), F.col("o_orderkey").cast("string")))
    return o.select(
        "o_orderkey",
        F.concat(
            F.substring(h, 1, 8), F.lit("-"),
            F.substring(h, 9, 4), F.lit("-"),
            F.lit("5"), F.substring(h, 14, 3), F.lit("-"),
            F.lit("8"), F.substring(h, 18, 3), F.lit("-"),
            F.substring(h, 21, 12),
        ).alias("order_uuid"),
    )


@register(
    "fn_timezone_convert",
    category="functions",
    oracle="""
SELECT o_orderkey,
       timezone('America/New_York', timezone('UTC', o_orderdate))
         AS ny_local,
       timezone('Asia/Tokyo', timezone('UTC', o_orderdate)) AS tokyo_local,
       CAST(date_diff('hour', o_orderdate,
                      timezone('America/New_York',
                               timezone('UTC', o_orderdate)))
            AS BIGINT) AS ny_offset_hours,
       CAST(hour(timezone('America/New_York', timezone('UTC', o_orderdate)))
            AS BIGINT) AS ny_hour,
       CAST(timezone('America/New_York', timezone('UTC', o_orderdate))
            AS DATE) AS ny_date
FROM orders
WHERE o_orderkey < 1000
""",
)
def fn_timezone_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone conversion discipline over the NTZ fixture timestamps:
    interpret the stored (zoneless) order timestamp as UTC and convert
    to a DST-observing zone (America/New_York, offset flips -5/-4
    across the 7-year date range) and a fixed-offset zone (Asia/Tokyo),
    plus the local-time derivations a "daily rollup in local time"
    pipeline needs: the realized UTC offset, local hour and local date.
    Everything stays NTZ at the edges — source-zone and target-zone are
    EXPLICIT arguments (Spark convert_timezone, DuckDB's two-arg
    timezone() pair), never the session timezone, so results are
    independent of any engine/session TimeZone setting — the
    discipline that keeps a 1000-executor cluster's output identical
    to the driver's.

    Scale: pure per-row expressions, zero shuffles; the IANA tz
    database lookup is a JVM-side constant-folded zone rule, not a
    join."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    ny = F.convert_timezone(
        F.lit("UTC"), F.lit("America/New_York"), F.col("o_orderdate")
    )
    tokyo = F.convert_timezone(
        F.lit("UTC"), F.lit("Asia/Tokyo"), F.col("o_orderdate")
    )
    offset = F.timestamp_diff("HOUR", F.col("o_orderdate"), ny).cast("long")
    return o.select(
        "o_orderkey",
        ny.alias("ny_local"),
        tokyo.alias("tokyo_local"),
        offset.alias("ny_offset_hours"),
        F.hour(ny).cast("long").alias("ny_hour"),
        ny.cast("date").alias("ny_date"),
    )


@register(
    "fn_aes_roundtrip",
    category="functions",
    oracle="""
SELECT c_custkey,
       CAST(16 * ((octet_length(encode(c_name)) // 16) + 1) AS BIGINT)
         AS cipher_len,
       c_name AS decrypted,
       TRUE AS roundtrip_ok
FROM customer
WHERE c_custkey < 500
""",
)
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption round trip: AES-128-ECB encrypt customer
    names with a fixed data-encryption key, decrypt, and prove identity
    — the at-rest field-encryption pattern (deterministic ECB chosen
    here precisely because it is verifiable; production would use GCM,
    whose random IV is the right call there and unverifiable here).
    The oracle cannot run AES, so it checks the two invariants that
    pin the crypto path: the PKCS#7 ciphertext length law
    16*(floor(len/16)+1) — full-block padding included — and that
    decrypt(encrypt(x)) round-trips to the exact plaintext.

    Scale shape: pure per-row JVM expressions (Spark's aes_* are
    codegen'd javax.crypto calls) — zero shuffles, and the key rides
    as a literal/broadcast, never a join."""
    key = F.lit("0123456789abcdef").cast("binary")
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500)
    enc = F.aes_encrypt(
        F.col("c_name").cast("binary"), key, F.lit("ECB")
    )
    dec = F.aes_decrypt(enc, key, F.lit("ECB")).cast("string")
    return c.select(
        "c_custkey",
        F.octet_length(enc).cast("long").alias("cipher_len"),
        dec.alias("decrypted"),
        (dec == F.col("c_name")).alias("roundtrip_ok"),
    )


@register(
    "fn_ip_cidr",
    category="functions",
    oracle="""
WITH ips AS (
  SELECT event_id,
         concat('10.', CAST((event_id * 7) % 64 AS VARCHAR), '.',
                CAST((event_id * 13) % 256 AS VARCHAR), '.',
                CAST((event_id * 29) % 256 AS VARCHAR)) AS ip,
         10*16777216 + ((event_id * 7) % 64)*65536
           + ((event_id * 13) % 256)*256 + (event_id * 29) % 256 AS ip_l
  FROM events WHERE event_id < 2000
)
SELECT event_id, ip, CAST(ip_l AS BIGINT) AS ip_long,
       CAST(ip_l // 1024 AS BIGINT) AS subnet22_id,
       ip_l >= 10*16777216 + 16*65536
         AND ip_l < 10*16777216 + 32*65536 AS in_cidr_10_16_0_0_12,
       (ip_l % 256) = 0 AS is_network_addr
FROM ips
""",
)
def fn_ip_cidr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IP address arithmetic for network-log analytics: dotted-quad
    rendering, the 32-bit integer form, /22 subnet bucketing (integer
    shift — the group-by key for per-subnet rollups), CIDR containment
    (10.16.0.0/12 as a pure range predicate — how a firewall-rule join
    actually executes) and network-address detection. Spark has no
    inet type; the point is that none is needed — CIDR logic is
    integer compares once the address is a long, which pushes down and
    codegens like any other predicate. Addresses synthesize
    deterministically from event ids (a 10.0.0.0/10 space).

    Scale shape: pure narrow arithmetic, zero shuffles; subnet rollups
    group on the shifted integer."""
    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    o2 = (F.col("event_id") * 7) % 64
    o3 = (F.col("event_id") * 13) % 256
    o4 = (F.col("event_id") * 29) % 256
    ip_l = (
        F.lit(10 * 16777216) + o2 * 65536 + o3 * 256 + o4
    )
    return e.select(
        "event_id",
        F.concat(
            F.lit("10."),
            o2.cast("string"),
            F.lit("."),
            o3.cast("string"),
            F.lit("."),
            o4.cast("string"),
        ).alias("ip"),
        ip_l.cast("long").alias("ip_long"),
        F.floor(ip_l / 1024).cast("long").alias("subnet22_id"),
        (
            (ip_l >= 10 * 16777216 + 16 * 65536)
            & (ip_l < 10 * 16777216 + 32 * 65536)
        ).alias("in_cidr_10_16_0_0_12"),
        ((ip_l % 256) == 0).alias("is_network_addr"),
    )


@register(
    "fn_encodings",
    category="functions",
    oracle="""
SELECT p_partkey,
       base64(encode(p_name)) AS name_b64,
       from_base64(base64(encode(p_name)))::VARCHAR AS name_roundtrip,
       lower(hex(encode(p_brand))) AS brand_hex,
       CAST(octet_length(encode(p_name)) AS BIGINT) AS raw_len,
       CAST(length(base64(encode(p_name))) AS BIGINT) AS b64_len,
       length(base64(encode(p_name)))
         = 4*((octet_length(encode(p_name)) + 2) // 3) AS b64_len_law
FROM part
WHERE p_partkey < 500
""",
)
def fn_encodings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-to-text encodings for interchange boundaries: base64
    (with the decode round trip proven back to the exact original and
    the 4*ceil(n/3) padded-length law as a second structural check)
    and lowercase hex — what every webhook/queue/export that can't
    carry raw bytes uses. Both engines implement RFC 4648 base64 and
    plain hex, so values compare bit-for-bit.

    Scale shape: pure narrow per-row codecs, zero shuffles."""
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    raw = F.encode(F.col("p_name"), "utf-8")
    b64 = F.base64(raw)
    return p.select(
        "p_partkey",
        b64.alias("name_b64"),
        F.unbase64(b64).cast("string").alias("name_roundtrip"),
        F.lower(F.hex(F.encode(F.col("p_brand"), "utf-8"))).alias(
            "brand_hex"
        ),
        F.octet_length(raw).cast("long").alias("raw_len"),
        F.length(b64).cast("long").alias("b64_len"),
        (
            F.length(b64)
            == 4 * F.floor((F.octet_length(raw) + 2) / 3)
        ).alias("b64_len_law"),
    )


@register(
    "fn_xpath",
    category="functions",
    oracle="""
WITH xml AS (
  SELECT o_orderkey,
         '<order id="' || o_orderkey || '"><status>' || o_orderstatus
         || '</status><price>' || CAST(FLOOR(o_totalprice*100 + 0.5)
                                       AS BIGINT)
         || '</price><prio>' || o_orderpriority || '</prio></order>'
           AS doc
  FROM orders WHERE o_orderkey < 5000
)
SELECT o_orderkey,
       regexp_extract(doc, '<status>([^<]*)</status>', 1) AS status,
       CAST(regexp_extract(doc, '<price>([0-9]+)</price>', 1) AS BIGINT)
         AS price_cents,
       regexp_extract(doc, '<prio>([^<]*)</prio>', 1) AS prio,
       CAST(regexp_extract(doc, 'id="([0-9]+)"', 1) AS BIGINT) AS id_attr,
       '' AS missing_node
FROM xml
""",
)
def fn_xpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XPath extraction over XML strings — the ingestion surface for
    XML-bearing feeds (alert formats like CAP are XML): Spark's
    xpath_string/xpath_long evaluate real XPath against each document
    (node text, attributes via @, missing nodes as empty string). The
    documents are built from order columns so the round trip is
    self-verifying, and the DuckDB twin (no XPath engine there) extracts
    the same fields with anchored regexes — valid because the generated
    XML is canonical single-line; the point under test is Spark's XPath
    evaluation, pinned field-by-field. All JVM built-ins: no UDF, stays
    in codegen except the xpath expression itself."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)
    doc = F.concat(
        F.lit('<order id="'),
        F.col("o_orderkey").cast("string"),
        F.lit('"><status>'),
        F.col("o_orderstatus"),
        F.lit("</status><price>"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").cast("string"),
        F.lit("</price><prio>"),
        F.col("o_orderpriority"),
        F.lit("</prio></order>"),
    )
    x = o.select("o_orderkey", doc.alias("doc"))
    return x.select(
        "o_orderkey",
        F.xpath_string(F.col("doc"), F.lit("/order/status")).alias("status"),
        F.xpath_long(F.col("doc"), F.lit("/order/price")).alias(
            "price_cents"
        ),
        F.xpath_string(F.col("doc"), F.lit("/order/prio")).alias("prio"),
        F.xpath_long(F.col("doc"), F.lit("/order/@id")).alias("id_attr"),
        F.xpath_string(F.col("doc"), F.lit("/order/nonexistent")).alias(
            "missing_node"
        ),
    )


@register(
    "fn_variant_semistructured",
    category="functions",
    oracle="""
SELECT event_id,
       event_type AS vtype,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k,
       value * 2 AS v2,
       'OBJECT<k: BIGINT, meta: OBJECT<day: STRING, type: STRING>, vals: ARRAY<STRING>>'
         AS sch,
       CAST(NULL AS BIGINT) AS bad_cast
FROM events
WHERE event_id < 2000
""",
)
def fn_variant_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path — the semi-structured column type: compose a
    nested document from base columns + the props JSON, parse it into a
    VARIANT, then extract typed values back by path. The oracle is
    self-validating: every extraction must round-trip to the ORIGINAL
    column (event_type, props.k, value*2), the variant schema is pinned
    as a golden literal (identical for every row by construction), and a
    deliberately mistyped try_variant_get must yield NULL, not an error.

    Doubles ride the document as STRINGS (Spark's shortest round-trip
    repr) and come back through an explicit double cast — bitwise exact
    on both engines, and it keeps the variant schema a true constant
    (raw JSON decimals would infer per-row DECIMAL(p,s) widths).

    Scale: VARIANT parse + path gets are per-row codegen expressions —
    narrow projection, zero shuffles, pushdown-transparent.
    """
    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    doc = F.to_json(
        F.struct(
            F.struct(
                F.date_format("ts", "yyyy-MM-dd").alias("day"),
                F.col("event_type").alias("type"),
            ).alias("meta"),
            F.array(
                F.col("value").cast("string"),
                (F.col("value") * 2).cast("string"),
            ).alias("vals"),
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
    )
    v = e.select("event_id", F.parse_json(doc).alias("v"))
    return v.select(
        "event_id",
        F.try_variant_get("v", "$.meta.type", "string").alias("vtype"),
        F.try_variant_get("v", "$.k", "bigint").alias("k"),
        F.try_variant_get("v", "$.vals[1]", "double").alias("v2"),
        F.schema_of_variant("v").alias("sch"),
        # mistyped get: an OBJECT cannot cast to BIGINT -> NULL
        F.try_variant_get("v", "$.meta", "bigint").alias("bad_cast"),
    )


@register(
    "sql_scripting",
    category="functions",
    oracle="""
WITH pr AS (
  SELECT n_regionkey AS k,
         SUM(CAST(FLOOR(o_totalprice*1000000 + 0.5) AS BIGINT)) AS rev
  FROM orders JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_regionkey
)
SELECT CAST(SUM(rev) AS DOUBLE)/1000000 AS total_rev,
       CAST((SELECT k FROM pr ORDER BY rev DESC, k LIMIT 1) AS INTEGER)
         AS biggest_region,
       CAST(MAX(rev) AS DOUBLE)/1000000 AS biggest_rev
FROM pr
""",
)
def sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL scripting (procedural BEGIN..END): DECLARE variables,
    a WHILE loop over the five region keys accumulating each region's
    exact scaled-long revenue, and an IF tracking the argmax — the
    stored-procedure control-flow surface, exercised over real data. All
    in-script arithmetic runs on the 1e-6 money grid with DECIMAL(38,0)
    accumulators (grid longs would wrap past ~9.2e12 money units per
    region — the _helpers.lsum overflow bound; decimal partials are the
    same discipline scaled_group_sums uses), so the loop's sequential
    accumulation equals the oracle's order-insensitive SUM bit-for-bit;
    the strict > argmax resolves ties to the smallest region key,
    mirrored by the oracle's ORDER BY rev DESC, k.

    Scale: each iteration is an ordinary distributed query (broadcast
    dims, map-side partial sums); the script only sequences five of them
    and carries three scalars between — control flow on the driver,
    data flow on the cluster.
    """
    saved = spark.conf.get("spark.sql.scripting.enabled", None)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        return spark.sql(f"""
BEGIN
  DECLARE k INT DEFAULT 0;
  DECLARE rev DECIMAL(38, 0);
  DECLARE total DECIMAL(38, 0) DEFAULT 0;
  DECLARE biggest DECIMAL(38, 0) DEFAULT -1;
  DECLARE biggest_region INT DEFAULT -1;
  WHILE k < 5 DO
    SET rev = (
      SELECT COALESCE(SUM(CAST(FLOOR(o_totalprice*1000000 + 0.5) AS DECIMAL(38, 0))), 0)
      FROM parquet.`{sf_dir}/orders.parquet` o
      JOIN parquet.`{sf_dir}/customer.parquet` c ON o_custkey = c_custkey
      JOIN parquet.`{sf_dir}/nation.parquet` n ON c_nationkey = n_nationkey
      WHERE n_regionkey = k);
    SET total = total + rev;
    IF rev > biggest THEN
      SET biggest = rev;
      SET biggest_region = k;
    END IF;
    SET k = k + 1;
  END WHILE;
  SELECT CAST(total AS DOUBLE)/1000000 AS total_rev,
         biggest_region,
         CAST(biggest AS DOUBLE)/1000000 AS biggest_rev;
END
""")
    finally:
        if saved is not None:
            spark.conf.set("spark.sql.scripting.enabled", saved)
        else:
            spark.conf.unset("spark.sql.scripting.enabled")


@register(
    "sql_udf_create",
    category="functions",
    oracle=f"""
SELECT l_returnflag,
       {sql_lsum('l_extendedprice * (1 - l_discount)')} AS sum_dp,
       {sql_lsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_tp,
       CAST(SUM(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bulk
FROM lineitem
GROUP BY l_returnflag
""",
)
def sql_udf_create(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined UDFs (Spark 4 CREATE FUNCTION ... RETURN expr) — the
    catalog-function surface that needs NO Python on the executors:
    a scalar disc_price, a COMPOSED taxed() that calls it, and a
    CASE-bearing is_bulk(), all used inside an exact grouped
    aggregation. SQL UDFs inline into the plan at analysis time, so
    the aggregate stays in whole-stage codegen exactly as if the
    expressions were written inline — the oracle IS those inlined
    expressions.

    A table-valued SQL function (RETURNS TABLE) is exercised in the
    pytest suite; this registered query sticks to scalars so the oracle
    stays a single statement.

    Scale: zero Python boundary, zero extra shuffles — the function
    layer is purely a naming/catalog abstraction.
    """
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION taxed(p DOUBLE, d DOUBLE, t DOUBLE) "
        "RETURNS DOUBLE RETURN disc_price(p, d) * (1 + t)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION is_bulk(q DOUBLE) "
        "RETURNS INT RETURN CASE WHEN q >= 25 THEN 1 ELSE 0 END"
    )
    li = table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("sql_udf_lineitem")
    return spark.sql(
        """
SELECT l_returnflag,
       CAST(SUM(CAST(FLOOR(disc_price(l_extendedprice, l_discount)*1000000
            + 0.5) AS BIGINT)) AS DOUBLE)/1000000 AS sum_dp,
       CAST(SUM(CAST(FLOOR(taxed(l_extendedprice, l_discount, l_tax)*1000000
            + 0.5) AS BIGINT)) AS DOUBLE)/1000000 AS sum_tp,
       CAST(SUM(is_bulk(l_quantity)) AS BIGINT) AS n_bulk
FROM sql_udf_lineitem
GROUP BY l_returnflag
"""
    )
