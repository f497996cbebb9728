"""Geospatial operators (ETL floor: a DISASTER data store filters and
joins on location). The fixtures carry no coordinates, so deterministic
synthetic lat/lon are derived from keys (same device as multimodal.py's
payload fabrication): customers and suppliers get stable positions, and
every operator is exact, replayable, and SQL-twinnable.

Exactness note: sin/cos/atan2 can differ by 1 ulp between the JVM and
libm, so every distance output is rounded to 3 decimals (meters at km
scale) on BOTH engines — the same discipline as the pandas-UDF queries.

Scale design: bounding-box prefilters are plain comparisons (pushable,
prunable); the grid join buckets points into fixed cells so proximity
joins are equi-joins on cell ids (the geohash pattern) instead of
all-pairs distance scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..io import table
from ..registry import register
from ._helpers import lsum

# Deterministic synthetic coordinates in a continental box:
# lat in [25, 48], lon in [-122, -71] — derived from the entity key.
_SQL_LAT = "(25.0 + (({k} * 73) % 2300) / 100.0)"
_SQL_LON = "(-122.0 + (({k} * 37) % 5100) / 100.0)"

_EARTH_KM = 6371.0

_SQL_HAVERSINE = f"""
round(2 * {_EARTH_KM} * asin(sqrt(
    pow(sin(radians(({{lat2}}) - ({{lat1}})) / 2), 2)
  + cos(radians({{lat1}})) * cos(radians({{lat2}}))
    * pow(sin(radians(({{lon2}}) - ({{lon1}})) / 2), 2)
)), 3)"""


def _lat(k):
    return 25.0 + (k * 73 % 2300) / 100.0


def _lon(k):
    return -122.0 + (k * 37 % 5100) / 100.0


def _haversine_km(lat1, lon1, lat2, lon2):
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon) * F.sin(dlon)
    )
    return F.round(2 * _EARTH_KM * F.asin(F.sqrt(a)), 3)


def _sites(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers as incident sites with synthetic coordinates."""
    c = table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        _lat(k).alias("lat"),
        _lon(k).alias("lon"),
    )


def _depots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers as response depots with synthetic coordinates."""
    s = table(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    return s.select(
        "s_suppkey",
        "s_name",
        _lat(k).alias("d_lat"),
        _lon(k).alias("d_lon"),
    )


@register(
    "geo_bbox_filter",
    category="geo",
    oracle=f"""
SELECT c_custkey, c_mktsegment,
       {_SQL_LAT.format(k='c_custkey')} AS lat,
       {_SQL_LON.format(k='c_custkey')} AS lon
FROM customer
WHERE {_SQL_LAT.format(k='c_custkey')} BETWEEN 30.0 AND 40.0
  AND {_SQL_LON.format(k='c_custkey')} BETWEEN -110.0 AND -90.0
""",
)
def geo_bbox_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounding-box filter — the first stage of every spatial query: plain
    range predicates on lat/lon columns (pushable to the scan when the
    coordinates are stored; here they are derived, so the filter runs in
    the projection stage)."""
    s = _sites(spark, sf_dir)
    return s.filter(
        F.col("lat").between(30.0, 40.0) & F.col("lon").between(-110.0, -90.0)
    )


@register(
    "geo_nearest_depot",
    category="geo",
    oracle=f"""
WITH sites AS (
  SELECT c_custkey, {_SQL_LAT.format(k='c_custkey')} AS lat,
         {_SQL_LON.format(k='c_custkey')} AS lon
  FROM customer WHERE c_custkey < 300
),
depots AS (
  SELECT s_suppkey, {_SQL_LAT.format(k='s_suppkey')} AS d_lat,
         {_SQL_LON.format(k='s_suppkey')} AS d_lon
  FROM supplier
),
scored AS (
  SELECT c_custkey, s_suppkey,
         {_SQL_HAVERSINE.format(lat1='lat', lon1='lon', lat2='d_lat', lon2='d_lon')} AS dist_km
  FROM sites CROSS JOIN depots
)
SELECT c_custkey, s_suppkey, dist_km
FROM (SELECT c_custkey, s_suppkey, dist_km,
             ROW_NUMBER() OVER (PARTITION BY c_custkey
                                ORDER BY dist_km, s_suppkey) AS rn
      FROM scored)
WHERE rn = 1
""",
)
def geo_nearest_depot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest response depot per incident site: broadcast the (small)
    depot table, haversine-score, keep rank 1 per site. The depot side of
    a disaster pipeline is dimension-sized — broadcast + per-row argmin
    scales linearly in sites; at huge depot counts switch to the grid
    join below."""
    sites = _sites(spark, sf_dir).filter(F.col("c_custkey") < 300).select(
        "c_custkey", "lat", "lon"
    )
    depots = _depots(spark, sf_dir).select("s_suppkey", "d_lat", "d_lon")
    scored = sites.crossJoin(F.broadcast(depots)).select(
        "c_custkey",
        "s_suppkey",
        _haversine_km(
            F.col("lat"), F.col("lon"), F.col("d_lat"), F.col("d_lon")
        ).alias("dist_km"),
    )
    w = W.partitionBy("c_custkey").orderBy("dist_km", "s_suppkey")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_custkey", "s_suppkey", "dist_km")
    )


@register(
    "geo_grid_cluster",
    category="geo",
    oracle=f"""
SELECT CAST(floor({_SQL_LAT.format(k='c_custkey')}) AS INT) AS cell_lat,
       CAST(floor({_SQL_LON.format(k='c_custkey')}) AS INT) AS cell_lon,
       COUNT(*) AS n_sites,
       MIN(c_custkey) AS first_site
FROM customer
GROUP BY 1, 2
HAVING COUNT(*) >= 3
""",
)
def geo_grid_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid (geohash-style) clustering: bucket sites into 1-degree cells
    and keep dense cells — the binning that turns spatial proximity joins
    into equi-joins on cell ids at 100 TB (join on cell +/- 1 ring, then
    refine by exact distance, exactly like join_range_binned)."""
    s = _sites(spark, sf_dir)
    return (
        s.groupBy(
            F.floor("lat").cast("int").alias("cell_lat"),
            F.floor("lon").cast("int").alias("cell_lon"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_sites"),
            F.min("c_custkey").alias("first_site"),
        )
        .filter(F.col("n_sites") >= 3)
    )


@register(
    "geo_grid_join",
    category="geo",
    oracle=f"""
WITH sites AS (
  SELECT c_custkey, {_SQL_LAT.format(k='c_custkey')} AS lat,
         {_SQL_LON.format(k='c_custkey')} AS lon
  FROM customer WHERE c_custkey < 500
),
depots AS (
  SELECT s_suppkey, {_SQL_LAT.format(k='s_suppkey')} AS d_lat,
         {_SQL_LON.format(k='s_suppkey')} AS d_lon
  FROM supplier
)
SELECT c_custkey, s_suppkey,
       {_SQL_HAVERSINE.format(lat1='lat', lon1='lon', lat2='d_lat', lon2='d_lon')} AS dist_km
FROM sites JOIN depots
  ON floor(d_lat) BETWEEN floor(lat) - 1 AND floor(lat) + 1
 AND floor(d_lon) BETWEEN floor(lon) - 2 AND floor(lon) + 2
WHERE {_SQL_HAVERSINE.format(lat1='lat', lon1='lon', lat2='d_lat', lon2='d_lon')} <= 100.0
""",
)
def geo_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalable proximity join: sites x depots within 100 km, via the grid
    pattern — explode each depot into its ring of 1-degree cells,
    equi-join sites on their cell id, refine by exact haversine. Work is
    proportional to points per cell, never |sites| x |depots| — the
    join_range_binned rewrite in two dimensions.

    Ring sizing, lossless over the coordinate box lat in [25,48]:
    latitude ±1 cell (1 deg = 111 km >= 100 km); longitude ±2 cells,
    because 1 deg of longitude shrinks to 111*cos(48 deg) ~ 74 km at the
    top of the box — ±1 would silently miss true neighbors between 74 and
    100 km east/west; 2 deg ~ 148 km covers the radius everywhere.

    (The oracle states the ring as BETWEEN predicates; DuckDB plans an
    IEJoin over them — both engines compute the identical candidate set.)"""
    sites = (
        _sites(spark, sf_dir)
        .filter(F.col("c_custkey") < 500)
        .select(
            "c_custkey",
            "lat",
            "lon",
            F.floor("lat").alias("cell_lat"),
            F.floor("lon").alias("cell_lon"),
        )
    )
    depots = (
        _depots(spark, sf_dir)
        .withColumn("dlat_off", F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)])))
        .withColumn(
            "dlon_off",
            F.explode(F.array(*[F.lit(d) for d in (-2, -1, 0, 1, 2)])),
        )
        .select(
            "s_suppkey",
            "d_lat",
            "d_lon",
            (F.floor("d_lat") + F.col("dlat_off")).alias("cell_lat"),
            (F.floor("d_lon") + F.col("dlon_off")).alias("cell_lon"),
        )
    )
    dist = _haversine_km(F.col("lat"), F.col("lon"), F.col("d_lat"), F.col("d_lon"))
    return (
        sites.join(F.broadcast(depots), ["cell_lat", "cell_lon"])
        .withColumn("dist_km", dist)
        .filter(F.col("dist_km") <= 100.0)
        .select("c_custkey", "s_suppkey", "dist_km")
    )


_GH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
# 15-bit cell indices per axis; interleave lon (odd positions, MSB first)
# with lat (even) into the 30-bit geohash-6 integer. Generated bit
# expressions keep everything in whole-stage codegen.
_GH_SPARK_INTERLEAVE = "(shiftleft(shiftrightunsigned(lon_idx, 0) & 1, 1)) + (shiftleft(shiftrightunsigned(lon_idx, 1) & 1, 3)) + (shiftleft(shiftrightunsigned(lon_idx, 2) & 1, 5)) + (shiftleft(shiftrightunsigned(lon_idx, 3) & 1, 7)) + (shiftleft(shiftrightunsigned(lon_idx, 4) & 1, 9)) + (shiftleft(shiftrightunsigned(lon_idx, 5) & 1, 11)) + (shiftleft(shiftrightunsigned(lon_idx, 6) & 1, 13)) + (shiftleft(shiftrightunsigned(lon_idx, 7) & 1, 15)) + (shiftleft(shiftrightunsigned(lon_idx, 8) & 1, 17)) + (shiftleft(shiftrightunsigned(lon_idx, 9) & 1, 19)) + (shiftleft(shiftrightunsigned(lon_idx, 10) & 1, 21)) + (shiftleft(shiftrightunsigned(lon_idx, 11) & 1, 23)) + (shiftleft(shiftrightunsigned(lon_idx, 12) & 1, 25)) + (shiftleft(shiftrightunsigned(lon_idx, 13) & 1, 27)) + (shiftleft(shiftrightunsigned(lon_idx, 14) & 1, 29)) + (shiftleft(shiftrightunsigned(lat_idx, 0) & 1, 0)) + (shiftleft(shiftrightunsigned(lat_idx, 1) & 1, 2)) + (shiftleft(shiftrightunsigned(lat_idx, 2) & 1, 4)) + (shiftleft(shiftrightunsigned(lat_idx, 3) & 1, 6)) + (shiftleft(shiftrightunsigned(lat_idx, 4) & 1, 8)) + (shiftleft(shiftrightunsigned(lat_idx, 5) & 1, 10)) + (shiftleft(shiftrightunsigned(lat_idx, 6) & 1, 12)) + (shiftleft(shiftrightunsigned(lat_idx, 7) & 1, 14)) + (shiftleft(shiftrightunsigned(lat_idx, 8) & 1, 16)) + (shiftleft(shiftrightunsigned(lat_idx, 9) & 1, 18)) + (shiftleft(shiftrightunsigned(lat_idx, 10) & 1, 20)) + (shiftleft(shiftrightunsigned(lat_idx, 11) & 1, 22)) + (shiftleft(shiftrightunsigned(lat_idx, 12) & 1, 24)) + (shiftleft(shiftrightunsigned(lat_idx, 13) & 1, 26)) + (shiftleft(shiftrightunsigned(lat_idx, 14) & 1, 28))"
_GH_SQL_INTERLEAVE = "(((lon_idx >> 0) & 1) << 1) + (((lon_idx >> 1) & 1) << 3) + (((lon_idx >> 2) & 1) << 5) + (((lon_idx >> 3) & 1) << 7) + (((lon_idx >> 4) & 1) << 9) + (((lon_idx >> 5) & 1) << 11) + (((lon_idx >> 6) & 1) << 13) + (((lon_idx >> 7) & 1) << 15) + (((lon_idx >> 8) & 1) << 17) + (((lon_idx >> 9) & 1) << 19) + (((lon_idx >> 10) & 1) << 21) + (((lon_idx >> 11) & 1) << 23) + (((lon_idx >> 12) & 1) << 25) + (((lon_idx >> 13) & 1) << 27) + (((lon_idx >> 14) & 1) << 29) + (((lat_idx >> 0) & 1) << 0) + (((lat_idx >> 1) & 1) << 2) + (((lat_idx >> 2) & 1) << 4) + (((lat_idx >> 3) & 1) << 6) + (((lat_idx >> 4) & 1) << 8) + (((lat_idx >> 5) & 1) << 10) + (((lat_idx >> 6) & 1) << 12) + (((lat_idx >> 7) & 1) << 14) + (((lat_idx >> 8) & 1) << 16) + (((lat_idx >> 9) & 1) << 18) + (((lat_idx >> 10) & 1) << 20) + (((lat_idx >> 11) & 1) << 22) + (((lat_idx >> 12) & 1) << 24) + (((lat_idx >> 13) & 1) << 26) + (((lat_idx >> 14) & 1) << 28)"


def _gh_chars(combined_expr: str, substr_fn: str) -> str:
    """6 base32 chars from the 30-bit interleave (engine-portable SQL)."""
    parts = [
        f"{substr_fn}('{_GH_ALPHABET}', CAST(((({combined_expr}) >> {25 - 5 * j}) & 31) AS INT) + 1, 1)"
        for j in range(6)
    ]
    return "concat(" + ", ".join(parts) + ")"


@register(
    "geo_geohash",
    category="geo",
    oracle=f"""
WITH pts AS (
  SELECT c_custkey,
         {_SQL_LAT.format(k='c_custkey')} AS lat,
         {_SQL_LON.format(k='c_custkey')} AS lon
  FROM customer WHERE c_custkey < 1000
), idx AS (
  SELECT c_custkey, lat, lon,
         CAST(floor((lat + 90.0) / 180.0 * 32768.0) AS BIGINT) AS lat_idx,
         CAST(floor((lon + 180.0) / 360.0 * 32768.0) AS BIGINT) AS lon_idx
  FROM pts
), gh AS (
  SELECT c_custkey, lat, lon,
         {_gh_chars("_GH_SQL_INTERLEAVE_PLACEHOLDER", "substr")} AS geohash6
  FROM idx
)
SELECT c_custkey, lat, lon, geohash6,
       substr(geohash6, 1, 4) AS cell4,
       COUNT(*) OVER (PARTITION BY substr(geohash6, 1, 4)) AS cell4_density
FROM gh
""".replace("_GH_SQL_INTERLEAVE_PLACEHOLDER", _GH_SQL_INTERLEAVE),
)
def geo_geohash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash-6 encoding in pure column arithmetic: quantize each axis to
    a 15-bit cell index, interleave the bits (lon MSB first — the
    standard geohash layout), emit 6 base32 chars — zero UDFs, fully
    inside whole-stage codegen, and the IDENTICAL scalar expressions run
    in the oracle, so the encoding is hash-verified, not rows-only.
    cell4_density (count per 4-char prefix ≈ 20 km cell) shows the
    prefix-aggregation property that makes geohashes the partition key of
    choice for spatial joins at 100 TB: co-located points share prefixes,
    so a prefix groupBy is one skew-safe shuffle."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 1000)
    k = F.col("c_custkey")
    pts = c.select(
        "c_custkey",
        (25.0 + (k * 73 % 2300) / 100.0).alias("lat"),
        (-122.0 + (k * 37 % 5100) / 100.0).alias("lon"),
    )
    idx = pts.select(
        "c_custkey",
        "lat",
        "lon",
        F.floor((F.col("lat") + 90.0) / 180.0 * 32768.0).cast("bigint").alias("lat_idx"),
        F.floor((F.col("lon") + 180.0) / 360.0 * 32768.0).cast("bigint").alias("lon_idx"),
    )
    combined = F.expr(_GH_SPARK_INTERLEAVE)
    chars = [
        F.substring(
            F.lit(_GH_ALPHABET),
            (F.shiftrightunsigned(combined, 25 - 5 * j) % 32).cast("int") + 1,
            1,
        )
        for j in range(6)
    ]
    gh = idx.select("c_custkey", "lat", "lon", F.concat(*chars).alias("geohash6"))
    w = W.partitionBy(F.substring("geohash6", 1, 4))
    return gh.select(
        "c_custkey",
        "lat",
        "lon",
        "geohash6",
        F.substring("geohash6", 1, 4).alias("cell4"),
        F.count(F.lit(1)).over(w).alias("cell4_density"),
    )


@register(
    "geo_trajectory_length",
    category="geo",
    oracle=f"""
WITH pts AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         {_SQL_LAT.format(k="event_id")} AS lat,
         {_SQL_LON.format(k="event_id")} AS lon
  FROM events WHERE user_id < 100
),
legs AS (
  SELECT user_id,
         {_SQL_HAVERSINE.format(
             lat1="LAG(lat) OVER w", lon1="LAG(lon) OVER w",
             lat2="lat", lon2="lon")} AS leg_km
  FROM pts
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       COUNT(leg_km) AS n_legs,
       CAST(SUM(CAST(leg_km AS DECIMAL(30,6))) AS DOUBLE) AS total_km,
       MAX(leg_km) AS max_leg_km
FROM legs GROUP BY user_id
""",
)
def geo_trajectory_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity trajectory length — the movement analytic a disaster
    response pipeline runs over asset pings: haversine leg between each
    consecutive point (lag over the time order), summed per user. Legs
    are rounded to 3 dp (the module's ulp discipline), which also makes
    them EXACT decimals — so the per-user total is an order-insensitive
    decimal sum, safe under any cluster reordering. One shuffle on
    user_id serves the lag window and the rollup."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    pts = e.select(
        "user_id",
        "event_id",
        "ts",
        (25.0 + (F.col("event_id") * 73 % 2300) / 100.0).alias("lat"),
        (-122.0 + (F.col("event_id") * 37 % 5100) / 100.0).alias("lon"),
    )
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    legs = pts.select(
        "user_id",
        _haversine_km(
            F.lag("lat").over(w), F.lag("lon").over(w), F.col("lat"), F.col("lon")
        ).alias("leg_km"),
    )
    return legs.groupBy("user_id").agg(
        F.count("leg_km").alias("n_legs"),
        F.sum(F.col("leg_km").cast("decimal(30,6)")).cast("double").alias("total_km"),
        F.max("leg_km").alias("max_leg_km"),
    )


# eps must stay under the worst-case 1-degree cell width (111*cos(48deg)
# = 74.3 km at the lattice's max latitude) so the +/-1-cell ring join is
# a complete neighbor search; minPts=3 (self + 2) is the smallest value
# that yields border points on the fixture lattice, so both the core
# and the border assignment paths carry real rows at sf>=0.01.
_DBSCAN_EPS_KM = 70.0
_DBSCAN_MINPTS = 3


@register(
    "geo_dbscan_core",
    category="geo",
    oracle=f"""
WITH pts AS (
  SELECT c_custkey AS id,
         {_SQL_LAT.format(k='c_custkey')} AS lat,
         {_SQL_LON.format(k='c_custkey')} AS lon
  FROM customer WHERE c_custkey < 2000
),
nb AS (
  SELECT a.id, COUNT(*) AS n_neighbors
  FROM pts a JOIN pts b
    ON floor(b.lat) BETWEEN floor(a.lat) - 1 AND floor(a.lat) + 1
   AND floor(b.lon) BETWEEN floor(a.lon) - 1 AND floor(a.lon) + 1
   AND {_SQL_HAVERSINE.format(lat1='a.lat', lon1='a.lon',
                              lat2='b.lat', lon2='b.lon')}
       <= {_DBSCAN_EPS_KM}
  GROUP BY a.id
)
SELECT id AS c_custkey,
       CAST(n_neighbors AS BIGINT) AS n_neighbors,
       n_neighbors >= {_DBSCAN_MINPTS} AS is_core
FROM nb
""",
)
def geo_dbscan_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN core-point detection (eps = 70 km, minPts = 3): per site,
    the count of sites within eps (self included, per the standard
    definition) and the core verdict — the density primitive under
    density-based incident clustering (full DBSCAN = flag cores, then
    connect core-reachable points with the dedup_components min-label
    loop). The self-proximity join uses the grid pattern: one side
    explodes into its 3x3 ring of 1-degree cells (1 deg latitude =
    111 km >= eps, and >= eps in longitude everywhere in the lat<=48
    box), the other equi-joins on its own cell — work tracks per-cell
    density, never |sites|^2. Distances use the shared rounded haversine
    so the eps comparison is identical on both engines; neighbor counts
    are exact integers."""
    pts = (
        _sites(spark, sf_dir)
        .filter(F.col("c_custkey") < 2000)
        .select(F.col("c_custkey").alias("id"), "lat", "lon")
    )
    a = pts.select(
        F.col("id").alias("a_id"),
        F.col("lat").alias("a_lat"),
        F.col("lon").alias("a_lon"),
        F.floor("lat").alias("cell_lat"),
        F.floor("lon").alias("cell_lon"),
    )
    ring = (
        pts.withColumn(
            "dlat_off", F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)]))
        )
        .withColumn(
            "dlon_off", F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)]))
        )
        .select(
            F.col("id").alias("b_id"),
            F.col("lat").alias("b_lat"),
            F.col("lon").alias("b_lon"),
            (F.floor("b_lat") + F.col("dlat_off")).alias("cell_lat"),
            (F.floor("b_lon") + F.col("dlon_off")).alias("cell_lon"),
        )
    )
    dist = _haversine_km(
        F.col("a_lat"), F.col("a_lon"), F.col("b_lat"), F.col("b_lon")
    )
    return (
        a.join(ring, ["cell_lat", "cell_lon"])
        .filter(dist <= _DBSCAN_EPS_KM)
        .groupBy(F.col("a_id").alias("c_custkey"))
        .agg(F.count(F.lit(1)).alias("n_neighbors"))
        .select(
            "c_custkey",
            "n_neighbors",
            (F.col("n_neighbors") >= _DBSCAN_MINPTS).alias("is_core"),
        )
    )


_DBSCAN_ROUNDS = 8


def _dbscan_cluster_oracle() -> str:
    hav = _SQL_HAVERSINE.format(
        lat1="a.lat", lon1="a.lon", lat2="b.lat", lon2="b.lon"
    )
    prev = "l0"
    blocks = []
    for i in range(1, _DBSCAN_ROUNDS + 1):
        blocks.append(
            f"""l{i} AS MATERIALIZED (
  SELECT node, MIN(lbl) AS lbl FROM (
    SELECT node, lbl FROM {prev}
    UNION ALL
    SELECT e.dst AS node, l.lbl FROM core_edges e
    JOIN {prev} l ON e.src = l.node
  ) GROUP BY node
)"""
        )
        prev = f"l{i}"
    chain = ",\n".join(blocks)
    return f"""
WITH pts AS MATERIALIZED (
  SELECT c_custkey AS id,
         {_SQL_LAT.format(k='c_custkey')} AS lat,
         {_SQL_LON.format(k='c_custkey')} AS lon
  FROM customer WHERE c_custkey < 2000
),
pairs AS MATERIALIZED (
  SELECT a.id AS src, b.id AS dst
  FROM pts a JOIN pts b
    ON floor(b.lat) BETWEEN floor(a.lat) - 1 AND floor(a.lat) + 1
   AND floor(b.lon) BETWEEN floor(a.lon) - 1 AND floor(a.lon) + 1
   AND {hav} <= {_DBSCAN_EPS_KM}
),
core AS MATERIALIZED (
  SELECT src AS id FROM pairs GROUP BY src
  HAVING COUNT(*) >= {_DBSCAN_MINPTS}
),
core_edges AS MATERIALIZED (
  SELECT p.src, p.dst FROM pairs p
  JOIN core ca ON ca.id = p.src
  JOIN core cb ON cb.id = p.dst
  WHERE p.src <> p.dst
),
l0 AS (SELECT id AS node, id AS lbl FROM core),
{chain},
core_out AS (
  SELECT node AS c_custkey, lbl AS cluster_label, TRUE AS is_core
  FROM {prev}
),
border_out AS (
  SELECT p.src AS c_custkey, MIN(l.lbl) AS cluster_label, FALSE AS is_core
  FROM pairs p
  JOIN {prev} l ON l.node = p.dst
  WHERE p.src NOT IN (SELECT id FROM core) AND p.src <> p.dst
  GROUP BY p.src
)
SELECT c_custkey, CAST(cluster_label AS BIGINT) AS cluster_label, is_core
FROM (SELECT * FROM core_out UNION ALL SELECT * FROM border_out)
"""


@register(
    "geo_dbscan_cluster",
    category="geo",
    oracle=_dbscan_cluster_oracle(),
    heavy=True,
)
def geo_dbscan_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full density-based clustering, hash-checked end to end: core
    points (geo_dbscan_core's grid self-join), min-label propagation over
    the core-core eps graph ({_DBSCAN_ROUNDS} fixed rounds, the
    dedup_components contract), then border points (non-core within eps
    of >=1 core) assigned the MINIMUM final core label — DBSCAN's
    border-assignment ambiguity determinized so both engines agree. Noise
    points (no core in reach) are excluded, as DBSCAN defines. The eps
    graph never materializes beyond per-cell candidate pairs; the labels
    that move per round are one row per core. The oracle unrolls the
    identical rounds, so this is the same fixed-point-prefix discipline
    as dedup_components/graph_pagerank/graph_bfs_distance."""
    pts = (
        _sites(spark, sf_dir)
        .filter(F.col("c_custkey") < 2000)
        .select(F.col("c_custkey").alias("id"), "lat", "lon")
    )
    a = pts.select(
        F.col("id").alias("src"),
        F.col("lat").alias("a_lat"),
        F.col("lon").alias("a_lon"),
        F.floor("lat").alias("cell_lat"),
        F.floor("lon").alias("cell_lon"),
    )
    ring = (
        pts.withColumn(
            "dlat_off", F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)]))
        )
        .withColumn(
            "dlon_off", F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)]))
        )
        .select(
            F.col("id").alias("dst"),
            F.col("lat").alias("b_lat"),
            F.col("lon").alias("b_lon"),
            (F.floor("b_lat") + F.col("dlat_off")).alias("cell_lat"),
            (F.floor("b_lon") + F.col("dlon_off")).alias("cell_lon"),
        )
    )
    dist = _haversine_km(
        F.col("a_lat"), F.col("a_lon"), F.col("b_lat"), F.col("b_lon")
    )
    pairs = (
        a.join(ring, ["cell_lat", "cell_lon"])
        .filter(dist <= _DBSCAN_EPS_KM)
        .select("src", "dst")
        .localCheckpoint()
    )
    core = (
        pairs.groupBy("src")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= _DBSCAN_MINPTS)
        .select(F.col("src").alias("id"))
        .localCheckpoint()
    )
    core_edges = (
        pairs.join(core.select(F.col("id").alias("src")), "src")
        .join(core.select(F.col("id").alias("dst")), "dst")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .localCheckpoint()
    )
    labels = core.select(F.col("id").alias("node"), F.col("id").alias("lbl"))
    for _ in range(_DBSCAN_ROUNDS):
        stepped = (
            core_edges.join(labels, core_edges.src == labels.node)
            .select(F.col("dst").alias("node"), "lbl")
        )
        labels = (
            labels.unionByName(stepped)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint()
        )
    core_out = labels.select(
        F.col("node").alias("c_custkey"),
        F.col("lbl").alias("cluster_label"),
        F.lit(True).alias("is_core"),
    )
    border_out = (
        pairs.join(core.select(F.col("id").alias("src")), "src", "left_anti")
        .filter(F.col("src") != F.col("dst"))
        .join(labels, pairs.dst == labels.node)
        .groupBy(F.col("src").alias("c_custkey"))
        .agg(F.min("lbl").alias("cluster_label"))
        .select("c_custkey", "cluster_label", F.lit(False).alias("is_core"))
    )
    return core_out.unionByName(border_out).select(
        "c_custkey", F.col("cluster_label").cast("long").alias("cluster_label"), "is_core"
    )


# Convex CCW evacuation-zone polygon over the site lattice (lat, lon),
# vertices on the exact 2-decimal grid the site generator uses.
_ZONE = [
    (33.0, -96.0),
    (42.0, -100.0),
    (42.0, -110.0),
    (36.0, -114.0),
    (30.0, -110.0),
]


def _zone_edges():
    n = len(_ZONE)
    return [(_ZONE[i], _ZONE[(i + 1) % n]) for i in range(n)]


def _pip_oracle() -> str:
    crosses = " AND ".join(
        f"(({xj}) - ({xi})) * (lat - ({yi}))"
        f" - (({yj}) - ({yi})) * (lon - ({xi})) >= 0"
        for (yi, xi), (yj, xj) in _zone_edges()
    )
    return f"""
WITH pts AS (
  SELECT c_custkey, c_mktsegment,
         {_SQL_LAT.format(k='c_custkey')} AS lat,
         {_SQL_LON.format(k='c_custkey')} AS lon
  FROM customer WHERE c_custkey < 2000
)
SELECT c_custkey, lat, lon, ({crosses}) AS in_zone
FROM pts
"""


@register("geo_point_in_polygon", category="geo", oracle=_pip_oracle())
def geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon containment against a convex CCW evacuation-zone
    polygon (5 vertices on the exact coordinate grid): a point is inside
    iff every edge's 2-D cross product keeps the same sign — five
    multiply-subtract-compare expressions, no division, no trig, so the
    test is bit-deterministic on both engines (the generic ray-casting
    parity test needs an x-intersection DIVISION per edge, which is why
    the convex half-plane form is the verifiable one). Unrolled edges
    keep the whole predicate inside whole-stage codegen.

    Scale shape: a pure narrow projection — zero shuffles, fully
    pushable; for concave/multi-polygon zones at 100 TB the same
    pattern runs per convex piece of a decomposition, OR'd, and a
    bounding-box pre-filter (geo_bbox_filter) prunes the scan first."""
    pts = (
        _sites(spark, sf_dir)
        .filter(F.col("c_custkey") < 2000)
        .select("c_custkey", "lat", "lon")
    )
    cond = None
    for (yi, xi), (yj, xj) in _zone_edges():
        edge = (
            (F.lit(xj) - F.lit(xi)) * (F.col("lat") - F.lit(yi))
            - (F.lit(yj) - F.lit(yi)) * (F.col("lon") - F.lit(xi))
        ) >= 0
        cond = edge if cond is None else (cond & edge)
    return pts.select("c_custkey", "lat", "lon", cond.alias("in_zone"))


@register(
    "geo_spatiotemporal_join",
    category="geo",
    oracle=f"""
WITH hz0 AS (
  SELECT event_id AS hz_id, ts AS hz_ts,
         {_SQL_LAT.format(k='event_id')} AS hz_lat,
         {_SQL_LON.format(k='event_id')} AS hz_lon
  FROM events WHERE event_type = 'error'
),
im0 AS (
  SELECT event_id AS im_id, ts AS im_ts,
         {_SQL_LAT.format(k='event_id')} AS im_lat,
         {_SQL_LON.format(k='event_id')} AS im_lon
  FROM events WHERE event_type = 'purchase'
),
-- Same lossless equi-join blocking as the Spark plan (cell ring x time
-- buckets): the naive inequality join (lat/lon BETWEEN + abs time) made
-- DuckDB's IEJoin materialize every within-lat-band pair — quadratic at
-- ~sf1 (>900 s); each true pair matches EXACTLY ONE exploded variant
-- (the cell/bucket deltas are determined by the pair), so no dedup step
-- is needed and the result set is identical.
hz AS (
  SELECT hz_id, hz_ts, hz_lat, hz_lon,
         CAST(floor(hz_lat) AS BIGINT) + dl.dlat AS cell_lat,
         CAST(floor(hz_lon) AS BIGINT) + dn.dlon AS cell_lon,
         epoch_us(hz_ts) // 21600000000 + dt.dt AS tbucket
  FROM hz0,
       (SELECT unnest([-1, 0, 1]) AS dlat) dl,
       (SELECT unnest([-2, -1, 0, 1, 2]) AS dlon) dn,
       (SELECT unnest([-1, 0, 1]) AS dt) dt
),
im AS (
  SELECT im_id, im_ts, im_lat, im_lon,
         CAST(floor(im_lat) AS BIGINT) AS cell_lat,
         CAST(floor(im_lon) AS BIGINT) AS cell_lon,
         epoch_us(im_ts) // 21600000000 AS tbucket
  FROM im0
)
SELECT hz_id, im_id,
       {_SQL_HAVERSINE.format(lat1='hz_lat', lon1='hz_lon', lat2='im_lat', lon2='im_lon')} AS dist_km,
       (epoch_us(im_ts) - epoch_us(hz_ts)) / 1000000 AS dt_s
FROM hz JOIN im USING (cell_lat, cell_lon, tbucket)
WHERE abs(epoch_us(im_ts) - epoch_us(hz_ts)) <= 21600000000
  AND {_SQL_HAVERSINE.format(lat1='hz_lat', lon1='hz_lon', lat2='im_lat', lon2='im_lon')} <= 100.0
""",
)
def geo_spatiotemporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatio-temporal correlation join — the disaster-ETL core op: match
    hazard reports ('error' events) to impact reports ('purchase' events)
    within 100 km AND +/-6 hours. Blocking is the grid join's cell ring
    (lat +/-1, lon +/-2 on 1-degree cells — see geo_grid_join's lossless
    -ring argument) CROSSED with 6-hour time buckets (+/-1 bucket covers
    any 6-hour gap across a boundary), so the candidate join is a pure
    equi-join on (cell_lat, cell_lon, tbucket); exact haversine + exact
    integer-microsecond delta refine.

    Scale: work proportional to co-located-and-contemporaneous pairs,
    never |hazards| x |impacts|; the 45x bucket explode (3 lat x 5 lon
    x 3 time) rides the hazard
    side (disasters are the small stream). Time arithmetic is integer
    microseconds end to end — no double epoch drift between engines.
    """
    e = table(spark, sf_dir, "events")
    _B = 21_600_000_000  # 6 h in microseconds

    def _pts(etype: str, pfx: str) -> DataFrame:
        k = F.col("event_id")
        return e.filter(F.col("event_type") == etype).select(
            F.col("event_id").alias(f"{pfx}_id"),
            F.col("ts").alias(f"{pfx}_ts"),
            (25.0 + (k * 73 % 2300) / 100.0).alias(f"{pfx}_lat"),
            (-122.0 + (k * 37 % 5100) / 100.0).alias(f"{pfx}_lon"),
        )

    hz = (
        _pts("error", "hz")
        .withColumn("dlat", F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)])))
        .withColumn("dlon", F.explode(F.array(*[F.lit(d) for d in (-2, -1, 0, 1, 2)])))
        .withColumn("dt", F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)])))
        .select(
            "hz_id", "hz_ts", "hz_lat", "hz_lon",
            (F.floor("hz_lat") + F.col("dlat")).alias("cell_lat"),
            (F.floor("hz_lon") + F.col("dlon")).alias("cell_lon"),
            (F.expr(f"unix_micros(hz_ts) div {_B}") + F.col("dt")).alias("tbucket"),
        )
    )
    im = _pts("purchase", "im").select(
        "im_id", "im_ts", "im_lat", "im_lon",
        F.floor("im_lat").alias("cell_lat"),
        F.floor("im_lon").alias("cell_lon"),
        F.expr(f"unix_micros(im_ts) div {_B}").alias("tbucket"),
    )
    dist = _haversine_km(
        F.col("hz_lat"), F.col("hz_lon"), F.col("im_lat"), F.col("im_lon")
    )
    dus = F.expr("unix_micros(im_ts) - unix_micros(hz_ts)")
    return (
        im.join(hz, ["cell_lat", "cell_lon", "tbucket"])
        .filter(F.abs(dus) <= _B)
        .withColumn("dist_km", dist)
        .filter(F.col("dist_km") <= 100.0)
        .select("hz_id", "im_id", "dist_km", (dus / 1_000_000).alias("dt_s"))
    )


# 3x3 separable gaussian taps (sigma = 1 cell), written as LITERALS so
# both engines sum identical doubles — never runtime exp().
_KDE_W = {0: "1.0", 1: "0.606531", 2: "0.367879"}


@register(
    "geo_kde_heatmap",
    category="geo",
    oracle=f"""
WITH pts AS (
  SELECT floor({_SQL_LAT.format(k='event_id')} * 2) AS i,
         floor({_SQL_LON.format(k='event_id')} * 2) AS j
  FROM events WHERE event_type = 'error'
),
contrib AS (
  SELECT CAST(pts.i + di AS BIGINT) AS cell_i, CAST(pts.j + dj AS BIGINT) AS cell_j,
         CASE di*di + dj*dj WHEN 0 THEN {_KDE_W[0]} WHEN 1 THEN {_KDE_W[1]}
              ELSE {_KDE_W[2]} END AS w,
         CASE WHEN di = 0 AND dj = 0 THEN 1 ELSE 0 END AS own
  FROM pts, (SELECT unnest(range(-1, 2)) AS di) a, (SELECT unnest(range(-1, 2)) AS dj) b
)
SELECT cell_i, cell_j,
       CAST(SUM(CAST(FLOOR(w*1000000 + 0.5) AS BIGINT)) AS DOUBLE)/1000000 AS density,
       CAST(SUM(own) AS BIGINT) AS n_points
FROM contrib GROUP BY cell_i, cell_j
""",
)
def geo_kde_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kernel-density heatmap of hazard reports on a 0.5-degree grid —
    the situational-awareness raster every disaster dashboard draws. Each
    point spreads a 3x3 gaussian tap (sigma = 1 cell) into its neighbor
    cells; per-cell density is the exact scaled-long sum of LITERAL tap
    weights (1.0 / 0.606531 / 0.367879 — precomputed, so no runtime
    exp() to diverge between engines), plus the raw point count.

    Scale: the 9x explode happens map-side on a narrow (i, j) projection;
    ONE shuffle on the cell key aggregates partials; output is bounded by
    the number of occupied cells, not points. This is the map-side
    -combine density pattern that survives any point volume.
    """
    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    k = F.col("event_id")
    pts = e.select(
        F.floor((25.0 + (k * 73 % 2300) / 100.0) * 2).alias("i"),
        F.floor((-122.0 + (k * 37 % 5100) / 100.0) * 2).alias("j"),
    )
    offs = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    contrib = (
        pts.withColumn("di", F.explode(offs))
        .withColumn("dj", F.explode(offs))
        .select(
            (F.col("i") + F.col("di")).alias("cell_i"),
            (F.col("j") + F.col("dj")).alias("cell_j"),
            F.when(F.col("di") * F.col("di") + F.col("dj") * F.col("dj") == 0,
                   F.lit(float(_KDE_W[0])))
            .when(F.col("di") * F.col("di") + F.col("dj") * F.col("dj") == 1,
                  F.lit(float(_KDE_W[1])))
            .otherwise(F.lit(float(_KDE_W[2])))
            .alias("w"),
            F.when((F.col("di") == 0) & (F.col("dj") == 0), 1).otherwise(0).alias("own"),
        )
    )
    return contrib.groupBy("cell_i", "cell_j").agg(
        lsum(F.col("w")).alias("density"),
        F.sum("own").cast("long").alias("n_points"),
    )


@register(
    "geo_exposure_overlay",
    category="geo",
    oracle=f"""
WITH hz AS (
  SELECT s_suppkey, 50.0 + (s_suppkey % 3) * 50.0 AS radius_km,
         {_SQL_LAT.format(k='s_suppkey')} AS h_lat,
         {_SQL_LON.format(k='s_suppkey')} AS h_lon
  FROM supplier
),
sites AS (
  SELECT c_custkey, c_acctbal,
         {_SQL_LAT.format(k='c_custkey')} AS lat,
         {_SQL_LON.format(k='c_custkey')} AS lon
  FROM customer
)
SELECT s_suppkey, radius_km,
       COUNT(*) AS n_exposed,
       CAST(SUM(CAST(FLOOR(c_acctbal*1000000 + 0.5) AS BIGINT)) AS DOUBLE)/1000000
         AS exposed_balance
FROM hz JOIN sites
  ON floor(lat / 2) BETWEEN floor(h_lat / 2) - 1 AND floor(h_lat / 2) + 1
 AND floor(lon / 2) BETWEEN floor(h_lon / 2) - 2 AND floor(h_lon / 2) + 2
WHERE {_SQL_HAVERSINE.format(lat1='h_lat', lon1='h_lon', lat2='lat', lon2='lon')} <= radius_km
GROUP BY s_suppkey, radius_km
""",
)
def geo_exposure_overlay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exposure overlay — the disaster-impact product: for each hazard
    zone (suppliers as hazard centers, radius 50/100/150 km by key) count
    the exposed sites (customers) and their exact summed balance
    (population-at-risk proxy). Variable radii ride the refine predicate;
    blocking uses 2-degree cells with a lat +/-1, lon +/-2 ring — lossless
    for the max radius (150 km <= 1 cell of latitude; 150 km at the box's
    top is 2.03 degrees of longitude <= 2 cells).

    Scale: hazard centers explode 15x and broadcast (dim-sized); sites
    never shuffle — the exposure agg reduces map-side per (hazard,
    partition). Exact scaled-long balance sum hash-matches the oracle.
    """
    s = table(spark, sf_dir, "supplier")
    sk = F.col("s_suppkey")
    hz = (
        s.select(
            "s_suppkey",
            (50.0 + (sk % 3) * 50.0).alias("radius_km"),
            (25.0 + (sk * 73 % 2300) / 100.0).alias("h_lat"),
            (-122.0 + (sk * 37 % 5100) / 100.0).alias("h_lon"),
        )
        .withColumn("dlat", F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)])))
        .withColumn("dlon", F.explode(F.array(*[F.lit(d) for d in (-2, -1, 0, 1, 2)])))
        .select(
            "s_suppkey", "radius_km", "h_lat", "h_lon",
            (F.floor(F.col("h_lat") / 2) + F.col("dlat")).alias("cell_lat"),
            (F.floor(F.col("h_lon") / 2) + F.col("dlon")).alias("cell_lon"),
        )
    )
    c = table(spark, sf_dir, "customer")
    ck = F.col("c_custkey")
    sites = c.select(
        "c_custkey", "c_acctbal",
        (25.0 + (ck * 73 % 2300) / 100.0).alias("lat"),
        (-122.0 + (ck * 37 % 5100) / 100.0).alias("lon"),
    ).select(
        "c_custkey", "c_acctbal", "lat", "lon",
        F.floor(F.col("lat") / 2).alias("cell_lat"),
        F.floor(F.col("lon") / 2).alias("cell_lon"),
    )
    dist = _haversine_km(F.col("h_lat"), F.col("h_lon"), F.col("lat"), F.col("lon"))
    return (
        sites.join(F.broadcast(hz), ["cell_lat", "cell_lon"])
        .filter(dist <= F.col("radius_km"))
        .groupBy("s_suppkey", "radius_km")
        .agg(
            F.count(F.lit(1)).alias("n_exposed"),
            lsum(F.col("c_acctbal")).alias("exposed_balance"),
        )
    )
