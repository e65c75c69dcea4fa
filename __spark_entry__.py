"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      — flagship point-in-polygon spatial join on sf0.001.
queries()         — one entry per implemented operator (SURVEY.md §2).
oracle_sql()      — DuckDB-equivalent SQL for value-level verification.

Synthetic geo columns (FIXTURES.md §10): lat/lng are derived from numeric
keys identically in Spark and DuckDB so spatial results are value-checkable:
    lat = -60 + (key * 7  % 120)  + small deterministic fraction
    lng = -170 + (key * 13 % 340) + small deterministic fraction
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# shared fixtures
# ---------------------------------------------------------------------------

def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _cust_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer table -> deterministic lat/lng/cell_id point set."""
    from gos2_spark.spark.functions import s2_cellid

    c = _load(spark, sf_dir, "customer")
    lat = (-60.0 + (F.col("c_custkey") * 7 % 120)
           + (F.col("c_custkey") % 97) / 97.0).alias("lat")
    lng = (-170.0 + (F.col("c_custkey") * 13 % 340)
           + (F.col("c_custkey") % 89) / 89.0).alias("lng")
    pts = c.select(F.col("c_custkey").alias("key"), lat, lng)
    return pts.withColumn("cell_id", s2_cellid(F.col("lat"), F.col("lng")))


_CUST_LATLNG_SQL = """
    SELECT c_custkey AS key,
           -60.0 + (c_custkey * 7 % 120) + (c_custkey % 97) / 97.0 AS lat,
           -170.0 + (c_custkey * 13 % 340) + (c_custkey % 89) / 89.0 AS lng
    FROM customer
"""


def _cellid_cte_duckdb(points_sql: str) -> str:
    """DuckDB CTE chain: (key, lat, lng) -> cells(key, lat, lng, cell_id).

    The FULL leaf-cellid pipeline (latlng -> xyz -> face/uv -> st -> ij ->
    8 Hilbert lookup rounds, cellid.go:503-509/416-438) in plain SQL,
    mirroring gos2_spark.spark.functions.add_cellid_sql stage for stage.
    cell_id is the engine's bias-encoded signed int64: biased(2n+1) ==
    2*(n - 2^62) + 1 algebraically, avoiding unsigned types. Validated
    bit-for-bit against the numpy kernel (tools/duckdb_cellid_proto.py).
    """
    from gos2_spark.kernels import hilbert as H

    lookup = "[" + ",".join(str(int(v)) for v in H.LOOKUP_POS) + "]"
    max_size = H.MAX_SIZE
    ij = []
    for w, name in (("u", "i"), ("v", "j")):
        st = (
            f"CASE WHEN {w} >= 0 THEN 0.5 * sqrt(1.0 + 3.0 * {w})"
            f" ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * {w}) END"
        )
        ij.append(
            f"CAST(greatest(0, least({max_size - 1},"
            f" floor({float(max_size)!r} * ({st})))) AS BIGINT) AS {name}"
        )
    rounds = []
    prev = "r8"
    for k in range(7, -1, -1):
        key = f"(bits + ((i >> {k * 4}) & 15) * 64 + ((j >> {k * 4}) & 15) * 4)"
        rounds.append(
            f"r{k} AS (SELECT key, lat, lng, face, i, j,"
            f" (n | ((CAST(({lookup})[{key} + 1] AS BIGINT) >> 2)"
            f" * {1 << (k * 8)})) AS n,"
            f" (CAST(({lookup})[{key} + 1] AS BIGINT) & 3) AS bits"
            f" FROM {prev})"
        )
        prev = f"r{k}"
    return f"""
    pts AS ({points_sql}),
    xyz AS (
      SELECT key, lat, lng,
             cos(radians(lng)) * cos(radians(lat)) AS x,
             sin(radians(lng)) * cos(radians(lat)) AS y,
             sin(radians(lat)) AS z
      FROM pts
    ),
    fc AS (
      SELECT *, CASE WHEN abs(z) > greatest(abs(x), abs(y)) THEN 2
                     WHEN abs(y) > abs(x) THEN 1 ELSE 0 END AS fid
      FROM xyz
    ),
    fuv0 AS (
      SELECT key, lat, lng, x, y, z,
             CASE WHEN (CASE WHEN fid = 2 THEN z WHEN fid = 1 THEN y ELSE x END) < 0
                  THEN fid + 3 ELSE fid END AS face
      FROM fc
    ),
    fuv AS (
      SELECT key, lat, lng, face,
             CASE face WHEN 0 THEN y / x WHEN 1 THEN -x / y WHEN 2 THEN -x / z
                       WHEN 3 THEN z / x WHEN 4 THEN z / y ELSE -y / z END AS u,
             CASE face WHEN 0 THEN z / x WHEN 1 THEN z / y WHEN 2 THEN -y / z
                       WHEN 3 THEN y / x WHEN 4 THEN -x / y ELSE -x / z END AS v
      FROM fuv0
    ),
    ijt AS (SELECT key, lat, lng, face, {ij[0]}, {ij[1]} FROM fuv),
    r8 AS (
      SELECT key, lat, lng, face, i, j,
             (CAST(face AS BIGINT) * {1 << (H.POS_BITS - 1)}) AS n,
             (CAST(face AS BIGINT) & 1) AS bits
      FROM ijt
    ),
    {",".join(rounds)},
    cells AS (
      SELECT key, lat, lng, face, i, j,
             (2 * (n - 4611686018427387904) + 1) AS cell_id
      FROM r0
    )
    """

# Convex spherical test tiles (triangle / quad around fixed centers).
# Containment in a convex CCW loop == all edge-normal dots positive, which
# is expressible in BOTH the engine (via the real covering-join + refine
# pipeline) and plain SQL (literal edge normals) — the cross-check.
_TILES = {
    "t_atl": [(10.0, -40.0), (10.0, -20.0), (30.0, -20.0), (30.0, -40.0)],
    "t_ind": [(-35.0, 70.0), (-35.0, 95.0), (-12.0, 95.0), (-12.0, 70.0)],
    "t_pac": [(-10.0, 178.0), (-10.0, -160.0), (15.0, -160.0), (15.0, 178.0)],
}


def _tile_loops():
    from gos2_spark.geometry import Loop

    return {tid: Loop.from_latlngs_deg(vs) for tid, vs in _TILES.items()}


_TILESET_CACHE: dict = {}


def _tileset(max_cells: int = 32):
    """Memoized TileSet: the covering build is a deterministic driver-side
    artifact of the static _TILES fixture — rebuilding it per query call
    just re-runs the same coverer."""
    from gos2_spark.spark.joins import TileSet

    if max_cells not in _TILESET_CACHE:
        _TILESET_CACHE[max_cells] = TileSet(_tile_loops(), max_cells=max_cells)
    return _TILESET_CACHE[max_cells]


def _xyz(lat_deg: float, lng_deg: float):
    lat, lng = math.radians(lat_deg), math.radians(lng_deg)
    return (
        math.cos(lng) * math.cos(lat),
        math.sin(lng) * math.cos(lat),
        math.sin(lat),
    )


def _edge_normals(vertices):
    """(nx, ny, nz) per CCW edge; inside == dot(n, p) > 0 for all edges."""
    pts = [_xyz(la, ln) for la, ln in vertices]
    normals = []
    n = len(pts)
    for i in range(n):
        a, b = pts[i], pts[(i + 1) % n]
        normals.append((
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ))
    return normals


def _tile_pred_sql(tile: str) -> str:
    """DuckDB predicate: point inside convex tile (edge-normal signs)."""
    conds = []
    for nx, ny, nz in _edge_normals(_TILES[tile]):
        conds.append(
            f"(({nx!r}) * cos(radians(lng)) * cos(radians(lat))"
            f" + ({ny!r}) * sin(radians(lng)) * cos(radians(lat))"
            f" + ({nz!r}) * sin(radians(lat))) > 0"
        )
    return " AND ".join(conds)


_EVENTS_LATLNG_SQL = """
    SELECT user_id, ts, event_id,
           -60.0 + (event_id * 11 % 120) + (event_id % 83) / 83.0 AS lat,
           -170.0 + (event_id * 17 % 340) + (event_id % 79) / 79.0 AS lng
    FROM events
"""


def _city_union_sql() -> str:
    """Per-city haversine branches for the 1-NN classify oracle."""
    from gos2_spark.spark.pages import CITIES

    return " UNION ALL ".join(
        f"SELECT key, '{name}' AS city, {_hav_sql(la, ln)} AS dist FROM pts"
        for name, la, ln, _w in CITIES
    )


def _langs_list_sql() -> str:
    from gos2_spark.spark.pages import LANGS

    return "[" + ", ".join(f"'{x}'" for x in LANGS) + "]"


def _hits_oracle_sql(iterations: int = 2) -> str:
    """DuckDB twin of pipeline.graph.hits over the synthetic 64-node
    domain graph: each round is a join-agg CTE pair with the same L1
    normalization (scalar-subquery totals)."""
    sql = """
        WITH e AS (
          SELECT DISTINCT c_custkey % 64 AS src,
                          (c_custkey * 11 + 5) % 64 AS dst
          FROM customer
        ),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        h0 AS (SELECT node, 1.0 AS hub FROM nodes)
    """
    prev_h = "h0"
    for i in range(1, iterations + 1):
        sql += f""",
        a{i}r AS (
          SELECT e.dst AS node, sum({prev_h}.hub) AS auth
          FROM e JOIN {prev_h} ON e.src = {prev_h}.node GROUP BY 1
        ),
        a{i} AS (
          SELECT node, auth / (SELECT sum(auth) FROM a{i}r) AS auth FROM a{i}r
        ),
        h{i}r AS (
          SELECT e.src AS node, sum(a{i}.auth) AS hub
          FROM e JOIN a{i} ON e.dst = a{i}.node GROUP BY 1
        ),
        h{i} AS (
          SELECT node, hub / (SELECT sum(hub) FROM h{i}r) AS hub FROM h{i}r
        )
    """
        prev_h = f"h{i}"
    n = iterations
    sql += f"""
        SELECT nodes.node,
               round(coalesce(h{n}.hub, 0.0), 6) AS hub,
               round(coalesce(a{n}.auth, 0.0), 6) AS authority
        FROM nodes
        LEFT JOIN h{n} ON nodes.node = h{n}.node
        LEFT JOIN a{n} ON nodes.node = a{n}.node
        ORDER BY nodes.node
    """
    return sql


def _entropy_oracle_sql() -> str:
    """DuckDB twin of pipeline.text.char_entropy: same fixed alphabet,
    same left-to-right float fold, per-doc at round-9."""
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    cnt_cols = ", ".join(
        f"(length(t) - length(replace(t, '{ch}', ''))) AS c_{ch}" for ch in alphabet
    )
    total = " + ".join(f"c_{ch}" for ch in alphabet)
    s = " + ".join(
        f"(CASE WHEN c_{ch} > 0 THEN c_{ch} * ln(c_{ch}) ELSE 0.0 END)"
        for ch in alphabet
    )
    return f"""
        WITH low AS (SELECT doc_id, lower(text) AS t FROM documents),
        cnts AS (SELECT doc_id, {cnt_cols} FROM low),
        agg AS (SELECT doc_id, ({total}) AS total, ({s}) AS s FROM cnts)
        SELECT doc_id,
               round(CASE WHEN total > 0
                          THEN ln(CAST(total AS DOUBLE)) - s / CAST(total AS DOUBLE)
                          ELSE 0.0 END, 9) AS entropy
        FROM agg ORDER BY doc_id
    """


def _hav_sql(qlat: float, qlng: float, lat: str = "lat", lng: str = "lng") -> str:
    """DuckDB haversine to a literal center, same float-op order as
    spark.functions.haversine_rad(lat, lng, lit(qlat), lit(qlng))."""
    x = (
        f"power(sin(0.5 * (radians({qlat!r}) - radians({lat}))), 2)"
        f" + power(sin(0.5 * (radians({qlng!r}) - radians({lng}))), 2)"
        f" * cos(radians({lat})) * cos(radians({qlat!r}))"
    )
    return f"2 * atan2(sqrt({x}), sqrt(greatest(0.0, 1.0 - ({x}))))"


_HAVERSINE_SQL = (
    "2 * atan2(sqrt({x}), sqrt(greatest(0.0, 1.0 - ({x}))))".format(
        x=(
            "power(sin(0.5 * (radians(40.7128) - radians(lat))), 2)"
            " + power(sin(0.5 * (radians(-74.0060) - radians(lng))), 2)"
            " * cos(radians(lat)) * cos(radians(40.7128))"
        )
    )
)

_DIST_ANGLE_SQL_TMPL = """
    atan2(
        sqrt(
            power(sin(radians({qlng})) * cos(radians({qlat})) * sin(radians(lat))
                - sin(radians({qlat})) * sin(radians(lng)) * cos(radians(lat)), 2)
          + power(sin(radians({qlat})) * cos(radians(lng)) * cos(radians(lat))
                - cos(radians({qlng})) * cos(radians({qlat})) * sin(radians(lat)), 2)
          + power(cos(radians({qlng})) * cos(radians({qlat})) * sin(radians(lng)) * cos(radians(lat))
                - sin(radians({qlng})) * cos(radians({qlat})) * cos(radians(lng)) * cos(radians(lat)), 2)
        ),
        cos(radians({qlng})) * cos(radians({qlat})) * cos(radians(lng)) * cos(radians(lat))
      + sin(radians({qlng})) * cos(radians({qlat})) * sin(radians(lng)) * cos(radians(lat))
      + sin(radians({qlat})) * sin(radians(lat))
    )
"""


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: geoparse synthetic pages -> s2 cells -> point-in-polygon
    covering join + exact refine -> per-tile counts."""
    from gos2_spark.spark.joins import TileSet, point_in_polygon_join
    from gos2_spark.spark.pages import geoparsed_pages, synth_pages

    pages = synth_pages(spark, 20_000)
    pts = geoparsed_pages(pages)
    from gos2_spark.geometry import Loop

    tiles = TileSet(
        {
            "nyc": Loop.regular(40.7128, -74.0060, 1.5, 16),
            "london": Loop.regular(51.5074, -0.1278, 2.0, 12),
            "tokyo": Loop.regular(35.6762, 139.6503, 2.0, 16),
        },
        max_cells=32,
    )
    joined = point_in_polygon_join(pts, tiles, how="inner")
    return (
        joined.groupBy("tile_id")
        .agg(F.count("*").alias("n_pages"), F.countDistinct("url").alias("n_urls"))
        .orderBy("tile_id")
    )


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------

def _q_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gos2_spark.spark.functions import haversine_rad

    pts = _cust_points(spark, sf_dir)
    return (
        pts.select(
            "key",
            F.round(
                haversine_rad(F.col("lat"), F.col("lng"), F.lit(40.7128), F.lit(-74.0060)), 9
            ).alias("dist_rad"),
        )
        .orderBy("key")
    )


def _q_rect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gos2_spark.spark.functions import rect_contains

    pts = _cust_points(spark, sf_dir)
    return (
        pts.where(rect_contains(-20.0, 150.0, 25.0, -150.0, F.col("lat"), F.col("lng")))
        .select("key")
        .orderBy("key")
    )


def _q_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gos2_spark.spark.functions import cap_contains

    pts = _cust_points(spark, sf_dir)
    return (
        pts.where(cap_contains(10.0, 20.0, 25.0, F.col("lat"), F.col("lng")))
        .select("key")
        .orderBy("key")
    )


def _q_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gos2_spark.spark.joins import TileSet, point_in_polygon_join

    pts = _cust_points(spark, sf_dir)
    tiles = _tileset(32)
    return (
        point_in_polygon_join(pts, tiles, how="inner", point_key="key")
        .select("key", "tile_id")
        .orderBy("key", "tile_id")
    )


def _q_pip_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gos2_spark.spark.joins import TileSet, point_in_polygon_join

    pts = _cust_points(spark, sf_dir)
    tiles = _tileset(32)
    return (
        point_in_polygon_join(pts, tiles, how="inner", point_key="key")
        .groupBy("tile_id")
        .agg(F.count("*").alias("n_points"))
        .orderBy("tile_id")
    )


def _q_pip_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gos2_spark.spark.joins import TileSet, point_in_polygon_join

    pts = _cust_points(spark, sf_dir)
    tiles = _tileset(32)
    return (
        point_in_polygon_join(pts, tiles, how="anti", point_key="key")
        .select("key")
        .orderBy("key")
    )


def _q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gos2_spark.spark.joins import knn_join

    pts = _cust_points(spark, sf_dir)
    queries = [("q0", 40.7128, -74.0060), ("q1", -33.8688, 151.2093)]
    out = knn_join(pts, queries, k=10, initial_radius_deg=2.0, point_key="key")
    return (
        out.select(
            "qid", F.col("key"), F.col("knn_rank"),
            F.round(F.col("dist_rad"), 9).alias("dist_rad"),
        )
        .orderBy("qid", "knn_rank")
    )


def _q_knn_join_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame-native distributed kNN join (knn_join_df): queries are a
    DataFrame (first 30 customer locations), not a driver list — no
    per-query driver work, level-coarsening 3x3 block join rounds with the
    MinWidth exactness guarantee. Oracle: per-query window over the full
    cross join with the identical xyz atan2 distance."""
    from gos2_spark.spark.joins import knn_join_df

    pts = _cust_points(spark, sf_dir)
    qdf = pts.where(F.col("key") < 30).select(
        F.col("key").alias("qid"), "lat", "lng", "cell_id"
    )
    out = knn_join_df(pts, qdf, k=5, point_key="key", query_key="qid")
    return (
        out.select(
            "qid", "key", "knn_rank",
            F.round(F.col("dist_rad"), 9).alias("dist_rad"),
        )
        .orderBy("qid", "knn_rank")
    )


def _q_cell_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-path op (rows-only oracle): per-level-5-cell point counts."""
    from gos2_spark.spark.pages import s2_parent_sql

    pts = _cust_points(spark, sf_dir)
    return (
        pts.groupBy(s2_parent_sql(F.col("cell_id"), 5).alias("cell_l5"))
        .agg(F.count("*").alias("n"))
        .orderBy("cell_l5")
    )


def _q_cell_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token/round-trip op (rows-only): key -> cell -> token -> cell."""
    from gos2_spark.spark.functions import s2_from_token, s2_token

    pts = _cust_points(spark, sf_dir)
    out = pts.withColumn("token", s2_token(F.col("cell_id"))).withColumn(
        "cell_back", s2_from_token(F.col("token"))
    )
    return (
        out.where(F.col("cell_back") == F.col("cell_id"))
        .select("key", "token")
        .orderBy("key")
    )


def _q_cell_center(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-center decode (cellid.go:319-391): cell_id -> center lat/lng
    through the TRUE inverse-Hilbert path (face_ij_orientation LOOKUP_IJ
    gathers + faceSiTi + stToUV + faceUVToXYZ). The oracle forward-computes
    the same center from (face,i,j) derived from lat/lng, so an encode or
    decode defect on either side mismatches."""
    from gos2_spark.spark.functions import s2_cell_lat, s2_cell_lng

    pts = _cust_points(spark, sf_dir)
    return (
        pts.select(
            "key",
            F.round(s2_cell_lat(F.col("cell_id")), 9).alias("center_lat"),
            F.round(s2_cell_lng(F.col("cell_id")), 9).alias("center_lng"),
        )
        .orderBy("key")
    )


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on documents: keep min doc_id per md5(text)."""
    docs = _load(spark, sf_dir, "documents")
    return (
        docs.withColumn("h", F.md5(F.col("text")))
        .groupBy("h")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("dup_count"))
        .select("keep_id", "dup_count")
        .orderBy("keep_id")
    )


def _q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming first-seen dedup over documents replayed as a file stream.

    Runs the real Structured Streaming operator
    (dropDuplicatesWithinWatermark behind streaming_first_seen_dedup) with
    an availableNow drain into a memory sink, then returns the kept-key
    set. Which duplicate row survives depends on arrival order, but the
    KEY SET is order-independent, so the batch oracle is
    SELECT DISTINCT md5(text) — the streaming result must equal the batch
    dedup_exact key set exactly. Multi-micro-batch == batch equivalence is
    separately pytest-gated (tests/test_streaming.py)."""
    from gos2_spark.spark.streaming import streaming_first_seen_dedup

    path = f"{sf_dir}/documents.parquet"
    sch = spark.read.parquet(path).schema
    stream = (
        # the file-stream source requires a DIRECTORY basePath; sf_dir is
        # one table per file, so glob-filter the documents file out of it
        spark.readStream.schema(sch)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .withColumn("content_key", F.md5(F.col("text")))
        .withColumn(
            "event_ts",
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id")),
        )
    )
    deduped = streaming_first_seen_dedup(
        stream, key_cols=("content_key",), ts_col="event_ts"
    )
    name = "gos2_stream_dedup_keys"
    q = (
        deduped.select("content_key")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select("content_key").orderBy("content_key")


def _q_streaming_tile_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed streaming tiling: the full stream pipeline (geoparse ->
    s2_cellid -> stream-static covering join -> refine -> watermarked
    1-day windowed counts) over a deterministic page stream derived from
    the customer table, replayed from a temp parquet dir in MULTIPLE
    micro-batches (maxFilesPerTrigger=1 over 4 files). Page text embeds
    "%.6f, %.6f" coordinates, warc_ts = 2024-01-01T00Z + (key % 72) hours,
    so the per-(window, tile) counts have a closed SQL form: the oracle
    re-derives tile membership from the %.6f-rounded coordinates via
    convex edge-normal sign tests and the window epoch by integer
    arithmetic. Tumbling F.window aligns on the UTC epoch, so
    unix_timestamp(window_start) is timezone-independent on both sides."""
    from gos2_spark.spark.streaming import run_to_memory, streaming_tile_counts

    import tempfile

    pts = _cust_points(spark, sf_dir)
    pages = pts.select(
        F.concat(F.lit("https://example.com/p"), F.col("key")).alias("url"),
        F.timestamp_seconds(
            F.lit(1_704_067_200) + (F.col("key") % 72) * 3600
        ).alias("warc_ts"),
        F.format_string(
            "Visit us at %.6f, %.6f today.", F.col("lat"), F.col("lng")
        ).alias("text"),
    )
    tmp = tempfile.mkdtemp(prefix="gos2_stream_pages_")
    pages.repartition(4).write.mode("overwrite").parquet(tmp)
    sch = spark.read.parquet(tmp).schema
    stream = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1)
        .parquet(tmp)
    )
    out = streaming_tile_counts(
        stream, _tileset(), window="1 day", watermark="1 hour"
    )
    q = run_to_memory(out, "gos2_stream_tile_counts")
    q.awaitTermination()
    # the memory sink owns the rows once drained; the staged replay dir
    # is no longer referenced by the returned (batch) DataFrame
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return (
        spark.table("gos2_stream_tile_counts")
        .select(
            F.unix_timestamp("window_start").alias("window_epoch"),
            "tile_id",
            "n_pages",
        )
        .orderBy("window_epoch", "tile_id")
    )


def _q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text quality scoring: token count + mean word length per language."""
    docs = _load(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), " "))
    return (
        docs.select(
            "lang",
            toks.alias("n_tokens"),
            F.length("text").alias("n_chars"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
        .orderBy("lang")
    )


def _q_geoparse_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-mention geoparse round-trip: format two coordinate mentions
    per row into text, extract them ALL back with geoparse_all
    (regexp_extract_all + higher-order array ops, no UDF); the oracle
    regenerates the expected decimal-formatted values directly."""
    from gos2_spark.spark.functions import geoparse_all

    pts = _cust_points(spark, sf_dir)
    text = F.format_string(
        "Venue at %.6f, %.6f. Branch office at %.6f, %.6f nearby.",
        F.col("lat"), F.col("lng"),
        -F.col("lat") / 2.0, -F.col("lng") / 2.0,
    )
    out = pts.select("key", F.posexplode(geoparse_all(text)).alias("idx", "p"))
    return (
        out.select(
            "key",
            F.col("idx").cast("int").alias("idx"),
            F.col("p.lat").alias("plat"),
            F.col("p.lng").alias("plng"),
        )
        .orderBy("key", "idx")
    )


def _q_html_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-identity invariant through the html pipeline: escape document
    text into html markup, run the engine's extract_text, and count
    roundtrip-exact docs per language. The oracle asserts EVERY doc
    roundtrips (n_roundtrip == n_docs); any lossy extraction mismatches."""
    from gos2_spark.spark.pages import extract_text

    docs = _load(spark, sf_dir, "documents")
    esc = F.col("text")
    for ch, ent in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")):
        esc = F.replace(esc, F.lit(ch), F.lit(ent))
    html = F.encode(
        F.concat(F.lit("<html><body><p>"), esc, F.lit("</p></body></html>")),
        "UTF-8",
    )
    ok = (extract_text(html) == F.col("text")).cast("int")
    return (
        docs.select("lang", ok.alias("ok"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ok").alias("n_roundtrip"),
        )
        .orderBy("lang")
    )


def _q_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex token counting ([A-Za-z]+|[0-9]+|punct) per language —
    the second token-counting mode the training-data pipeline needs beyond
    whitespace splitting (text_stats)."""
    from gos2_spark.pipeline.text import bpe_ish_token_count

    docs = _load(spark, sf_dir, "documents")
    return (
        docs.select("lang", bpe_ish_token_count(F.col("text")).alias("n_tok"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_bpe_tokens"),
            F.max("n_tok").cast("long").alias("max_bpe_tokens"),
        )
        .orderBy("lang")
    )


def _q_embedding_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search: brute-force dot-product top-5 vs vec_id 0."""
    emb = _load(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb")
    )
    scored = emb.crossJoin(F.broadcast(q)).where(F.col("vec_id") != 0).select(
        "vec_id",
        F.round(
            F.aggregate(
                F.zip_with(
                    F.col("embedding"), F.col("q_emb"),
                    lambda a, b: a.cast("double") * b.cast("double"),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("score"),
    )
    return scored.orderBy(F.desc("score"), "vec_id").limit(5)


def _q_top_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window op: top-3 events by value per user (first 50 users)."""
    from pyspark.sql.window import Window

    ev = _load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.where(F.col("user_id") < 50)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("user_id", "rk", "event_id", "value")
        .orderBy("user_id", "rk")
    )


def _q_word_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-set Jaccard for adjacent doc pairs — hashes vs the oracle's
    string sets (equal modulo xxhash64 collisions)."""
    from gos2_spark.pipeline.dedup import ngram_jaccard

    docs = _load(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    cands = docs.select(F.col("doc_id").alias("key_a")).withColumn(
        "key_b", F.col("key_a") + 1
    ).where(F.col("key_b") < 200)
    out = ngram_jaccard(docs, candidates=cands, shingle_n=1)
    return out.select(
        "key_a", "key_b", F.round("jaccard", 9).alias("jaccard")
    ).orderBy("key_a")


def _q_trigram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gos2_spark.pipeline.dedup import ngram_jaccard

    docs = _load(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    cands = docs.select(F.col("doc_id").alias("key_a")).withColumn(
        "key_b", F.col("key_a") + 1
    ).where(F.col("key_b") < 200)
    out = ngram_jaccard(docs, candidates=cands, shingle_n=3)
    return out.select(
        "key_a", "key_b", F.round("jaccard", 9).alias("jaccard")
    ).orderBy("key_a")


def _q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gos2_spark.pipeline.text import language_id

    docs = _load(spark, sf_dir, "documents")
    return (
        docs.select(language_id(F.col("text")).alias("lang_guess"))
        .groupBy("lang_guess")
        .agg(F.count("*").alias("n"))
        .orderBy("lang_guess")
    )


def _q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality features with oracle-safe character classes."""
    docs = _load(spark, sf_dir, "documents")
    t = F.col("text")
    n_chars = F.length(t)
    n_tokens = F.size(F.split(F.trim(t), r"\s+"))
    n_digit = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    n_upper = F.length(F.regexp_replace(t, r"[^A-Z]", ""))
    return (
        docs.select(
            "lang",
            n_chars.alias("c"),
            n_tokens.alias("tk"),
            n_digit.alias("d"),
            n_upper.alias("u"),
        )
        .groupBy("lang")
        .agg(
            F.round(F.avg(F.col("c") / F.col("tk")), 9).alias("avg_chars_per_token"),
            F.round(F.avg(F.col("d") / F.col("c")), 9).alias("avg_digit_ratio"),
            F.round(F.avg(F.col("u") / F.col("c")), 9).alias("avg_upper_ratio"),
        )
        .orderBy("lang")
    )


def _q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for two stored query vectors, via the
    similarity module's GEMM kernel; oracle mirrors with DuckDB list ops."""
    from gos2_spark.pipeline.similarity import brute_force_topk

    emb = _load(spark, sf_dir, "embeddings")
    qvecs = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.where(F.col("vec_id").isin([0, 1])).collect()
    }
    out = brute_force_topk(
        emb.where(F.col("vec_id") > 1),
        [("q0", qvecs[0]), ("q1", qvecs[1])],
        k=10,
    )
    return out.select(
        "qid", "key", "rank", F.round("score", 6).alias("score")
    ).orderBy("qid", "rank")


def _q_minhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH dedup groups (rows-only: xxhash64 not oracle-expressible)."""
    from gos2_spark.pipeline.dedup import minhash_dedup_groups

    docs = _load(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    return minhash_dedup_groups(docs, threshold=0.8).orderBy("key")


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signatures (rows-only)."""
    from gos2_spark.pipeline.dedup import simhash

    docs = _load(spark, sf_dir, "documents").where(F.col("doc_id") < 500)

    return simhash(docs).orderBy("key")


def _q_simhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidate join, multi-table banded (Manku WWW'07
    block layout, dedup.py::_simhash_tables). The banding is
    guaranteed-complete for hamming <= 6 by block pigeonhole and no bucket
    exceeds the cap at this corpus size, so the banded join must equal the
    oracle's all-pairs hamming filter over DuckDB-re-derived signatures
    (xxhash64 model, duckdb_oracles.py)."""
    from gos2_spark.pipeline.dedup import simhash_candidates

    docs = _load(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    return (
        simhash_candidates(docs, max_hamming=6)
        .select(
            "key_a", "key_b", F.col("hamming").cast("int").alias("hamming")
        )
        .orderBy("key_a", "key_b")
    )


def _q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint sizes (rows-only)."""
    from gos2_spark.pipeline.text import fingerprint

    docs = _load(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return docs.select(
        "doc_id", F.size(fingerprint(F.col("text"))).alias("fp_size")
    ).orderBy("doc_id")


def _q_pip_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gos2_spark.spark.joins import TileSet, point_in_polygon_join

    pts = _cust_points(spark, sf_dir)
    tiles = _tileset(32)
    return (
        point_in_polygon_join(pts, tiles, how="semi", point_key="key")
        .select("key")
        .orderBy("key")
    )


_EDGE_A = (40.7128, -74.0060)   # NYC
_EDGE_B = (51.5074, -0.1278)    # London


def _q_edge_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized DistanceToEdge kernel (edgeutil.go:77-106) vs a fixed
    geodesic; value-checked against the same float formula in DuckDB."""
    from gos2_spark.spark.functions import edge_distance_udf

    udf = edge_distance_udf(*_EDGE_A, *_EDGE_B)
    pts = _cust_points(spark, sf_dir)
    return (
        pts.select("key", F.round(udf(F.col("lat"), F.col("lng")), 9).alias("edge_dist_rad"))
        .orderBy("key")
    )


def _q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact brute force, full
    oracle); the LSH-blocked scale path is embedding_ann_lsh."""
    from gos2_spark.pipeline.similarity import cosine_near_dup_pairs

    emb = _load(spark, sf_dir, "embeddings")
    out = cosine_near_dup_pairs(emb, threshold=0.45, method="brute")
    return out.select(
        "key_a", "key_b", F.round("cosine", 6).alias("cosine")
    ).orderBy("key_a", "key_b")


def _q_embedding_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path (rows-only: approximate by construction): LSH-banded
    candidate join + exact rerank; recall vs brute force is pytest-gated."""
    from gos2_spark.pipeline.similarity import lsh_topk

    emb = _load(spark, sf_dir, "embeddings")
    qvecs = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.where(F.col("vec_id").isin([0, 1])).collect()
    }
    out = lsh_topk(
        emb.where(F.col("vec_id") > 1),
        [("q0", qvecs[0]), ("q1", qvecs[1])],
        k=10, num_planes=16, bands=8,
    )
    return out.select(
        "qid", "key", "rank", F.round("score", 6).alias("score")
    ).orderBy("qid", "rank")


def _q_polygon_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygon boolean ops (polygon.go:393-449) as a driver-side [D] parity
    tier op: loop/vertex counts + areas of A∩B, A∪B, A−B for two fixed
    overlapping convex polygons, value-checked against the set-theoretic
    vertex counts and azimuth-fan areas the oracle derives in SQL
    (_polygon_boolean_oracle_sql)."""
    from gos2_spark.geometry import Loop, Polygon
    from gos2_spark.geometry.boolean_ops import difference, intersection, union

    a = Polygon.from_loop(Loop.regular(*_BOOL_A))
    b = Polygon.from_loop(Loop.regular(*_BOOL_B))
    rows = []
    for op_name, res in (
        ("a_intersect_b", intersection(a, b)),
        ("a_union_b", union(a, b)),
        ("a_minus_b", difference(a, b)),
    ):
        rows.append((
            op_name,
            len(res.loops),
            sum(len(l.vertices) for l in res.loops),
            round(sum(l.area() for l in res.loops), 9),
        ))
    return spark.createDataFrame(
        rows, "op string, n_loops int, n_vertices int, area_sr double"
    ).orderBy("op")


def _q_cell_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EdgeNeighbors op (cellid.go:210-220, rows-only): 4 edge-adjacent
    level-8 cells per distinct occupied level-8 cell."""
    from gos2_spark.spark.functions import s2_edge_neighbors, s2_token
    from gos2_spark.spark.pages import s2_parent_sql

    pts = _cust_points(spark, sf_dir)
    cells = pts.select(
        s2_parent_sql(F.col("cell_id"), 8).alias("cell_l8")
    ).distinct()
    return (
        cells.select(
            s2_token(F.col("cell_l8")).alias("token"),
            F.explode(s2_edge_neighbors(F.col("cell_l8"))).alias("nbr"),
        )
        .select("token", s2_token(F.col("nbr")).alias("nbr_token"))
        .orderBy("token", "nbr_token")
    )


def _q_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-radius distance self-join (pair join): 3x3 cell-neighborhood
    blocking at the MinWidth-derived level (metric.go:44-54,
    cellid.go:257-287) + exact angle-distance filter; value-checked against
    a DuckDB O(n^2) cross join with the identical float formula."""
    from gos2_spark.spark.joins import distance_join

    pts = _cust_points(spark, sf_dir)
    out = distance_join(pts, 3.0, point_key="key")
    return (
        out.select(
            "key_a", "key_b", F.round(F.col("dist_rad"), 9).alias("dist_rad")
        )
        .orderBy("key_a", "key_b")
    )


def _q_embedding_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with the deterministic fixed quantizer (seeded random unit
    centroids): nprobe-list probe + exact cosine rerank. The DuckDB oracle
    embeds the identical centroid literals and reproduces assignment,
    probe selection, and rerank in SQL (duckdb_oracles.ann_ivf_oracle_sql).
    The k-means quantizer path (ivf_build_centroids) is recall-gated by
    pytest instead — its centroids depend on the data sample."""
    from gos2_spark.pipeline.similarity import ivf_fixed_centroids, ivf_topk

    emb = _load(spark, sf_dir, "embeddings")
    qvecs = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.where(F.col("vec_id").isin([0, 1])).collect()
    }
    out = ivf_topk(
        emb.where(F.col("vec_id") > 1),
        [("q0", qvecs[0]), ("q1", qvecs[1])],
        k=10, centroids=ivf_fixed_centroids(64, 16, seed=7), nprobe=8,
    )
    return out.select(
        "qid", "key", "rank", F.round("score", 6).alias("score")
    ).orderBy("qid", "rank")


# (name -> Loop.regular(lat, lng, radius_deg, n_vertices) args) for the
# polygon-polygon overlap fixtures. Shared between the engine query and the
# DuckDB oracle builder: the oracle embeds the loops' float64 vertices as
# literals (input data, like _TILES) and re-derives the relations with
# convex edge-normal sign tests + SimpleCrossing tests in SQL.
_OVERLAP_A = {
    "big_nyc": (40.7, -74.0, 3.0, 16),
    "tokyo": (35.68, 139.65, 2.0, 16),
    "sydney": (-33.87, 151.21, 1.0, 12),
    "london_spot": (51.5, -0.13, 0.3, 8),
}
_OVERLAP_B = {
    "small_nyc": (40.7, -74.0, 0.5, 12),
    "nyc_edge": (42.5, -74.0, 1.5, 12),
    "london": (51.5, -0.13, 2.0, 12),
}


def _overlap_loops(spec: dict):
    from gos2_spark.geometry import Loop

    return {name: Loop.regular(*args) for name, args in spec.items()}


def _q_polygon_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygon-polygon (tile overlap) join: covering-range blocking + exact
    Loop relations (loop.go:465-754) over two fixed tile sets. Relations on
    these convex fixtures reduce to vertex-containment + edge-crossing
    counts, which the DuckDB oracle recomputes from the vertex literals."""
    from gos2_spark.spark.joins import TileSet, polygon_overlap_join

    a = TileSet(_overlap_loops(_OVERLAP_A), max_cells=16)
    b = TileSet(_overlap_loops(_OVERLAP_B), max_cells=16)
    rows = polygon_overlap_join(a, b)
    return spark.createDataFrame(
        rows, "a_id string, b_id string, relation string"
    ).orderBy("a_id", "b_id")


_RASTER_LEVEL = 8


def _q_rasterize_centers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed center-mode rasterization (raster<->vector, north_rule):
    every level-8 cell whose center is inside a tile. The oracle enumerates
    the same global grid from (face, bi, bj) coordinates — closed-form
    centers + forward Hilbert encode in SQL — a fully independent path from
    the engine's codegen id enumeration + inverse-Hilbert decode + exact
    refine."""
    from gos2_spark.spark.raster import rasterize_centers

    out = rasterize_centers(spark, _tileset(32), _RASTER_LEVEL)
    return out.orderBy("tile_id", "cell_id")


def _q_raster_vector_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster -> vector round-trip: exact intersect-mode cell/interior
    counts per tile at level 7, plus the area of the VECTORIZED polygon of
    the first-48-interior-cells block — the engine merges the cells into a
    boundary loop (destructive union) and integrates ITS area; the oracle
    (_raster_roundtrip_oracle_sql) checks the conservation law against the
    sum of the closed-form per-cell areas and re-derives both counts from
    cell-corner geometry in SQL."""
    from gos2_spark.spark.raster import rasterize_intersect, vectorize_cells

    ts = _tileset(32)
    rows = []
    cells = rasterize_intersect(ts, 7)
    for tid in ts.tile_ids():
        mine = [(cid, i) for t, cid, i in cells if t == tid]
        interior = sorted(c for c, i in mine if i)[:48]
        poly = vectorize_cells(interior)
        rows.append((
            str(tid), len(mine), sum(1 for _, i in mine if i),
            len(interior),
            round(sum(l.area() for l in poly.loops), 9),
        ))
    return spark.createDataFrame(
        rows,
        "tile_id string, n_cells int, n_interior int, block_n_cells int, block_area_sr double",
    ).orderBy("tile_id")


def _q_media_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode of BOTH pure-stdlib codecs (pipeline/png.py zlib
    inflate + unfilter; pipeline/jpeg.py Huffman + dequant + IDCT): 40 PNG
    + 40 JPEG payloads are encoded executor-side, decoded back through
    extract_features(deterministic_fake=False), and the oracle re-derives
    the decoded dimensions for both codecs plus the EXACT channel-0 pixel
    sum for the lossless PNGs (reconstructed from the float32 mean — the
    reconstruction error bound is ~0.01 << 0.5, so the rounded sum is
    exact). A wrong unfilter/IDCT/Huffman path shifts sums or dims."""
    from gos2_spark.pipeline.multimodal import (
        extract_features, synth_media_jpeg, synth_media_png,
    )

    media = synth_media_png(spark, 40).unionByName(synth_media_jpeg(spark, 40))
    feats = extract_features(media, feature_dim=8, deterministic_fake=False)
    return (
        feats.select(
            "media_id",
            F.col("width").cast("int").alias("width"),
            F.col("height").cast("int").alias("height"),
            F.when(
                F.col("media_id").startswith("png"),
                F.round(
                    F.element_at("features", 1).cast("double")
                    * F.col("width") * F.col("height")
                ).cast("long"),
            ).otherwise(F.lit(-1).cast("long")).alias("c0_pixel_sum"),
        )
        .orderBy("media_id")
    )


def _q_media_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode (pipeline/audio.py: pure-stdlib RIFF walk + PCM
    numpy reshape): 40 WAV payloads are encoded executor-side and decoded
    back through extract_features(deterministic_fake=False); the oracle
    re-derives channel count, frame count, and the EXACT channel-0 sample
    sum (PCM is lossless; the float32-mean reconstruction error bound is
    ~0.14 << 0.5)."""
    from gos2_spark.pipeline.multimodal import extract_features, synth_media_wav

    media = synth_media_wav(spark, 40)
    feats = extract_features(media, feature_dim=8, deterministic_fake=False)
    return (
        feats.select(
            "media_id",
            F.col("width").cast("int").alias("n_channels"),
            F.col("n_frames").cast("int").alias("n_frames"),
            F.round(
                F.element_at("features", 1).cast("double")
                * F.col("n_frames") * F.lit(32768.0)
            ).cast("long").alias("c0_sample_sum"),
        )
        .orderBy("media_id")
    )


def _q_media_video_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode (pipeline/video.py MJPEG-in-AVI: RIFF container
    walk + per-frame baseline JPEG, only SAMPLED chunks decoded): 40 AVI
    payloads of constant-gray frames are sampled at one frame per 80 ms
    (step 2 at 25 fps); constant 8x8 blocks survive quality-95 JPEG
    exactly, so the oracle re-derives dims, sampled-frame counts, and the
    exact sum of sampled frame values."""
    from gos2_spark.pipeline.multimodal import extract_features, synth_media_avi

    media = synth_media_avi(spark, 40)
    feats = extract_features(
        media, feature_dim=8, deterministic_fake=False,
        frame_sample_every_ms=80,
    )
    return (
        feats.select(
            "media_id",
            F.col("width").cast("int").alias("width"),
            F.col("height").cast("int").alias("height"),
            F.col("n_frames").cast("int").alias("n_sampled"),
            F.round(
                F.element_at("features", 1).cast("double") * F.col("n_frames")
            ).cast("long").alias("c0_value_sum"),
        )
        .orderBy("media_id")
    )


def _q_warc_extract_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC source end-to-end (spark/warc.py): 8 deterministic .warc.gz
    segments (one gzip member per record, the Common-Crawl layout) fan
    out to page rows via mapInPandas, text extracts NATIVELY
    (pages.extract_text — byte-exact contract), coordinates geoparse with
    the engine regex. Every output field is a closed-form function of
    doc_id, so the oracle regenerates the whole extraction in SQL."""
    from gos2_spark.spark.pages import extract_text
    from gos2_spark.spark.warc import read_warc_segments, synth_warc_segments

    segs = synth_warc_segments(spark, 8, 40)
    pages = read_warc_segments(segs)
    t = pages.withColumn("text", extract_text(F.col("html")))
    m = F.regexp_extract(
        F.col("text"), r"(-?\d+\.\d{6}), (-?\d+\.\d{6})", 0
    )
    parts = F.split(m, ", ")
    return (
        t.select(
            "url",
            F.unix_timestamp("warc_ts").cast("long").alias("ts_epoch"),
            F.length("text").cast("int").alias("text_chars"),
            F.length("html").cast("int").alias("html_bytes"),
            F.element_at(parts, 1).cast("double").alias("lat"),
            F.element_at(parts, 2).cast("double").alias("lng"),
        )
        .orderBy("url")
    )


def _q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing smoke (rows-only; decode is a deterministic fake)."""
    from gos2_spark.pipeline.multimodal import extract_features, synth_media

    media = synth_media(spark, 300)
    feats = extract_features(media, feature_dim=16)
    return (
        feats.groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_frames").alias("total_frames"),
        )
        .orderBy("kind")
    )


# fixed edge for the interpolate query (distinct from _EDGE_A/_EDGE_B so the
# two edge queries don't share artifacts)
_IEDGE_A = (10.0, 20.0)
_IEDGE_B = (40.0, 100.0)


def _q_nation_rects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation minimal wrap-aware bounding Rect over customer points —
    drives spark.aggregates.rect_bound_agg (Rect/S1Interval union algebra,
    rect.go + edgeutil.go:282-333, as a canonical largest-gap window
    plan). Nations span ~340 deg of longitude here, so most groups
    exercise the antimeridian-wrap (inverted interval) branch."""
    from gos2_spark.spark.aggregates import rect_bound_agg

    c = _load(spark, sf_dir, "customer")
    lat = (-60.0 + (F.col("c_custkey") * 7 % 120)
           + (F.col("c_custkey") % 97) / 97.0).alias("lat")
    lng = (-170.0 + (F.col("c_custkey") * 13 % 340)
           + (F.col("c_custkey") % 89) / 89.0).alias("lng")
    pts = c.select(F.col("c_nationkey").alias("nationkey"), lat, lng)
    r = rect_bound_agg(pts, ["nationkey"], "lat", "lng")
    return r.select(
        "nationkey",
        F.round("lat_lo", 9).alias("lat_lo"),
        F.round("lat_hi", 9).alias("lat_hi"),
        F.round("lng_lo", 9).alias("lng_lo"),
        F.round("lng_hi", 9).alias("lng_hi"),
        "n_pts",
    ).orderBy("nationkey")


def _q_cellunion_denormalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CellUnion.Denormalize (cellunion.go:68-88) as a native
    sequence+explode plan: customer leaf cells -> parents at level
    4 + key%3 -> descendants at level 6. Output per input level:
    input-cell count and distinct level-6 descendant count (exactly
    n_cells * 4^(6-level) when parents are distinct — the oracle
    re-derives both via DuckDB generate_series)."""
    from gos2_spark.spark.aggregates import denormalize_to_level

    pts = _cust_points(spark, sf_dir)
    lvl = (F.col("key") % 3 + 4).cast("int").alias("level")
    # level -> lsb via a 3-arm CASE keeps the parent computation in pure
    # codegen (variable shifts would need a UDF)
    lsb = (
        F.when(F.col("level") == 4, F.lit(1 << 52))
        .when(F.col("level") == 5, F.lit(1 << 50))
        .otherwise(F.lit(1 << 48))
    )
    parents = (
        pts.select(lvl, "cell_id")
        .withColumn("_lsb", lsb)
        .select(
            "level",
            (F.col("cell_id").bitwiseAND(-F.col("_lsb")).bitwiseOR(F.col("_lsb"))).alias("parent"),
        )
        .distinct()
    )
    denorm = denormalize_to_level(parents, "parent", 6, "child")
    return (
        denorm.groupBy("level")
        .agg(
            F.countDistinct("parent").alias("n_cells"),
            F.countDistinct("child").alias("n_denorm"),
        )
        .orderBy("level")
    )


def _q_edge_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EdgeInterpolate + GetDistanceFraction (edgeutil.go:335-354,
    394-398): slerp each customer's fraction t = (key%101)/100 along a
    fixed geodesic, report the point and its recovered distance fraction.
    The oracle re-derives the slerp in DuckDB SQL from embedded xyz
    literals."""
    from gos2_spark.spark.functions import edge_interpolate_udf

    interp = edge_interpolate_udf(*_IEDGE_A, *_IEDGE_B)
    pts = _cust_points(spark, sf_dir)
    t = (F.col("key") % 101) / 100.0
    return (
        pts.select("key", interp(t.cast("double")).alias("i"))
        .select(
            "key",
            F.round("i.ilat", 9).alias("ilat"),
            F.round("i.ilng", 9).alias("ilng"),
            F.round("i.frac", 9).alias("frac"),
        )
        .orderBy("key")
    )


def _nl_docs(docs: DataFrame):
    """Deterministic multi-line corpus: break each document's text into
    5-word lines, then append corpus-wide boilerplate lines ('subscribe...'
    on every doc, 'follow...' on 1/7 of docs) — the line-level-dedup targets."""
    nl = F.regexp_replace(F.col("text"), r"((?:\S+ ){4}\S+) ", "$1\n")
    t = F.concat(nl, F.lit("\nsubscribe to our newsletter today"))
    t = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(t, F.lit("\nfollow us on social media")),
    ).otherwise(t)
    return docs.select(F.col("doc_id").alias("key"), "lang", t.alias("text"))


def _q_line_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style line-level dedup (pipeline/dedup.py line_dedup): drop
    lines appearing in >2 docs corpus-wide (the injected boilerplate, plus
    any organically repeated 5-word line), reassemble docs, report per-lang
    line/char accounting. kept_chars gates the in-order reassembly, not
    just the drop set."""
    from gos2_spark.pipeline.dedup import line_dedup

    docs2 = _nl_docs(_load(spark, sf_dir, "documents"))
    res = line_dedup(docs2, key_col="key", max_occurrences=2)
    joined = res.join(docs2.select("key", "lang"), "key")
    return (
        joined.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_lines").alias("total_lines"),
            F.sum("n_kept").alias("total_kept"),
            F.sum((F.col("n_kept") < F.col("n_lines")).cast("long")).alias(
                "docs_changed"
            ),
            F.sum(F.length("text").cast("long")).alias("kept_chars"),
        )
        .orderBy("lang")
    )


def _q_repetition_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (pipeline/text.py
    repetition_features — pure per-row array folds, zero shuffle): docs are
    split into 5-word lines and 1/3 get their first line duplicated; per
    lang report mean dup-line / dup-char / top-bigram fractions and the
    count a Gopher-rule filter would drop."""
    from gos2_spark.pipeline.text import repetition_features

    docs = _load(spark, sf_dir, "documents")
    nl = F.regexp_replace(F.col("text"), r"((?:\S+ ){4}\S+) ", "$1\n")
    t = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(nl, F.lit("\n"), F.substring_index(nl, "\n", 1)),
    ).otherwise(nl)
    feats = repetition_features(docs.select("doc_id", "lang", t.alias("text")))
    flagged = (
        (F.col("dup_line_frac") > 0.25) | (F.col("top_bigram_frac") > 0.18)
    ).cast("long")
    return (
        feats.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("dup_line_frac"), 9).alias("avg_dup_line_frac"),
            F.round(F.avg("dup_line_char_frac"), 9).alias("avg_dup_char_frac"),
            F.round(F.avg("top_bigram_frac"), 9).alias("avg_top_bigram_frac"),
            F.sum(flagged).alias("n_flagged"),
        )
        .orderBy("lang")
    )


def _q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registrable-domain rollup (pipeline/web.py): urls are built
    deterministically from doc_id (subdomain / tld / port / query-string /
    case variation), the engine's REGEX parser recovers host, domain, tld
    and path depth, and the oracle re-derives the ground truth from the
    construction arithmetic — so the parse itself is what's gated."""
    from gos2_spark.pipeline.web import domain_stats

    docs = _load(spark, sf_dir, "documents")
    d = F.col("doc_id")
    sub = (
        F.when(d % 4 == 0, F.lit("www."))
        .when(d % 4 == 1, F.lit("m."))
        .otherwise(F.lit(""))
    )
    tld = F.element_at(
        F.array(F.lit("com"), F.lit("org"), F.lit("net")), (d % 3 + 1).cast("int")
    )
    host = F.concat(sub, F.lit("site"), (d % 97).cast("string"), F.lit("."), tld)
    host = F.when(d % 13 == 0, F.upper(host)).otherwise(host)
    port = F.when(d % 11 == 0, F.lit(":8080")).otherwise(F.lit(""))
    path = F.concat(
        F.repeat(F.lit("/dir"), (d % 3).cast("int")), F.lit("/p"), d.cast("string")
    )
    query = F.when(d % 5 == 0, F.lit("?ref=feed#top")).otherwise(F.lit(""))
    url = F.concat(F.lit("https://"), host, port, path, query)
    pages = docs.select(url.alias("url"), "text")
    return (
        domain_stats(pages)
        .select(
            "domain",
            "n_pages",
            "n_hosts",
            "total_chars",
            F.round("avg_chars", 9).alias("avg_chars"),
            "max_path_depth",
        )
        .orderBy("domain")
    )


def _q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session-window rollup (spark/aggregates.py sessionize —
    native F.session_window, same call sessionizes a stream): sessions
    split at >=1h silences; report count / size / longest duration
    (micros, end = last event + gap) per user. The oracle re-derives
    sessions via gaps-and-islands SQL."""
    from gos2_spark.spark.aggregates import sessionize

    ev = _load(spark, sf_dir, "events")
    s = sessionize(ev, key_col="user_id", ts_col="ts", gap="1 hour")
    # events.ts is TIMESTAMP_NTZ from parquet; the cast pair is TZ-invariant
    # because only the difference is kept.
    dur = F.unix_micros(F.col("session_end").cast("timestamp")) - F.unix_micros(
        F.col("session_start").cast("timestamp")
    )
    return (
        s.groupBy(F.col("key").alias("user_id"))
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("total_events"),
            F.max("n_events").alias("max_session_events"),
            F.max(dur).alias("max_session_micros"),
        )
        .orderBy("user_id")
    )


def _q_domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain crawl budget (spark/aggregates.py capped_sample_per_key,
    skew-safe two-level rank): keep the 3 docs with smallest deterministic
    order value per domain; the aggregate fingerprints (sum of kept doc_ids)
    gate the exact row selection against a single-window DuckDB oracle."""
    from gos2_spark.spark.aggregates import capped_sample_per_key
    from gos2_spark.pipeline.web import with_url_parts

    docs = _load(spark, sf_dir, "documents")
    d = F.col("doc_id")
    tld = F.element_at(
        F.array(F.lit("com"), F.lit("org"), F.lit("net")), (d % 3 + 1).cast("int")
    )
    url = F.concat(
        F.lit("https://site"), (d % 97).cast("string"), F.lit("."), tld, F.lit("/p")
    )
    ordv = (d * 2654435761) % 1000000007
    pages = with_url_parts(
        docs.select(url.alias("url"), "doc_id", ordv.alias("ord"))
    )
    kept = capped_sample_per_key(
        pages, ["domain"], 3, F.col("ord"), shards=8,
        tiebreak_cols=[F.col("doc_id")],
    )
    return (
        kept.groupBy("domain")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("doc_id").alias("kept_doc_sum"),
            F.max("ord").alias("max_ord"),
        )
        .orderBy("domain")
    )


def _q_trajectory_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trajectory accounting: events get deterministic lat/lng,
    are ordered by (ts, event_id) per user, and consecutive legs are
    measured with the engine's haversine (latlng.go:32-40 op order) via a
    window lag — all native codegen, one user-keyed shuffle. Gates window
    ordering + spherical distance together."""
    from pyspark.sql import Window

    from gos2_spark.spark.functions import haversine_rad

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    lat = (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat")
    lng = (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng")
    pts = ev.select("user_id", "ts", "event_id", lat, lng)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    leg = haversine_rad(
        F.lag("lat").over(w), F.lag("lng").over(w), F.col("lat"), F.col("lng")
    )
    legs = pts.select("user_id", leg.alias("leg")).where(F.col("leg").isNotNull())
    return (
        legs.groupBy("user_id")
        .agg(
            F.count("*").alias("n_legs"),
            F.round(F.sum("leg"), 9).alias("path_rad"),
            F.round(F.max("leg"), 9).alias("max_leg_rad"),
        )
        .orderBy("user_id")
    )


def _q_trajectory_hausdorff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric discrete Hausdorff distance between per-user trajectories
    (spark/trajectory.py): the filter-refine 'refine' stage of trajectory
    similarity — one broadcast point-pair join + two max-of-min aggregation
    branches, all native codegen. Composes the engine's haversine
    (latlng.go:32-40 op order) into a set-to-set metric the reference has
    only the single-point primitives for (edgeutil.go:108-127). Users are
    prefiltered (user_id < 8 => 28 pairs) standing in for the covering-cell
    candidate prefilter used at scale."""
    from gos2_spark.spark.trajectory import trajectory_hausdorff

    ev = _load(spark, sf_dir, "events").where(F.col("user_id") < 8)
    e = F.col("event_id")
    pts = ev.select(
        "user_id",
        F.col("event_id").alias("pt_id"),
        (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
        (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
    )
    h = trajectory_hausdorff(pts, key_col="user_id")
    return h.select(
        "key_a",
        "key_b",
        "n_a",
        "n_b",
        F.round("h_ab", 9).alias("h_ab"),
        F.round("h_ba", 9).alias("h_ba"),
        F.round("h_sym", 9).alias("h_sym"),
    ).orderBy("key_a", "key_b")


def _q_trajectory_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trajectory shape profile (spark/trajectory.py): ordered
    path length, net first-to-last displacement, sinuosity ratio,
    spherical centroid (normalized 3-vector mean — the point-set analogue
    of the reference's TrueCentroid family, loop.go:215) and angular
    dispersion. One lag/first/last window projection + one user-keyed
    aggregation, all native codegen."""
    from gos2_spark.spark.trajectory import trajectory_profile

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    pts = ev.select(
        "user_id",
        "ts",
        F.col("event_id").alias("pt_id"),
        (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
        (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
    )
    prof = trajectory_profile(pts, key_col="user_id", order_cols=("ts", "pt_id"))
    return prof.select(
        "user_id",
        "n_pts",
        F.round("path_rad", 9).alias("path_rad"),
        F.round("net_rad", 9).alias("net_rad"),
        F.round("sinuosity", 6).alias("sinuosity"),
        F.round("centroid_lat", 9).alias("centroid_lat"),
        F.round("centroid_lng", 9).alias("centroid_lng"),
        F.round("spread_rad", 9).alias("spread_rad"),
    ).orderBy("user_id")


def _q_nearest_city(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-NN gazetteer classification (spark/functions.py nearest_center):
    every customer point is assigned its nearest of the 6 synthetic-corpus
    cities via a literal struct-array + array_min — the degenerate
    broadcast form a 10^12-row nearest-POI classify takes (zero join, zero
    shuffle before the final per-city rollup). Gated by exact counts plus
    order-free min/max of the winning haversine distance
    (latlng.go:32-40 op order)."""
    from gos2_spark.spark.functions import nearest_center
    from gos2_spark.spark.pages import CITIES

    pts = _cust_points(spark, sf_dir)
    centers = [(name, la, ln) for name, la, ln, _w in CITIES]
    nn = nearest_center(F.col("lat"), F.col("lng"), centers)
    return (
        pts.select(nn.alias("nn"))
        .groupBy(F.col("nn.name").alias("city"))
        .agg(
            F.count("*").alias("n_points"),
            F.round(F.min("nn.dist"), 9).alias("min_dist_rad"),
            F.round(F.max("nn.dist"), 9).alias("max_dist_rad"),
        )
        .orderBy("city")
    )


def _q_trajectory_bearings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compass-rose histogram of per-leg initial bearings
    (spark/functions.py initial_bearing_rad): one user-keyed window
    shuffle computes the forward azimuth of every consecutive leg, then a
    global 8-sector rollup. Exact sector counts gate the trig; min/max
    bearing per sector are order-free extremes."""
    from pyspark.sql import Window

    from gos2_spark.spark.functions import initial_bearing_rad

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    pts = ev.select(
        "user_id",
        "ts",
        "event_id",
        (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
        (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    b = initial_bearing_rad(
        F.lag("lat").over(w), F.lag("lng").over(w), F.col("lat"), F.col("lng")
    )
    legs = pts.select(b.alias("bearing")).where(F.col("bearing").isNotNull())
    sector = F.pmod(F.floor(F.col("bearing") / F.lit(math.pi / 4.0)), F.lit(8)).cast("int")
    return (
        legs.select(sector.alias("sector"), "bearing")
        .groupBy("sector")
        .agg(
            F.count("*").alias("n_legs"),
            F.round(F.min("bearing"), 9).alias("min_bearing"),
            F.round(F.max("bearing"), 9).alias("max_bearing"),
        )
        .orderBy("sector")
    )


def _q_gc_midpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle midpoint of every consecutive trajectory leg
    (spark/functions.py spherical_midpoint): latlng(a_xyz + b_xyz) with the
    scale-invariant atan2 form (latlng.go:87-92), so no normalization is
    needed. One window shuffle + per-row codegen math; a per-row oracle
    over ~10k legs gates the full xyz round-trip."""
    from pyspark.sql import Window

    from gos2_spark.spark.functions import spherical_midpoint

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    pts = ev.select(
        "user_id",
        "ts",
        "event_id",
        (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
        (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = pts.select(
        "user_id",
        "event_id",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lng").over(w).alias("plng"),
        "lat",
        "lng",
    ).where(F.col("plat").isNotNull())
    mid = spherical_midpoint(
        F.col("plat"), F.col("plng"), F.col("lat"), F.col("lng")
    )
    return (
        lagged.select("user_id", "event_id", mid.alias("m"))
        .select(
            "user_id",
            "event_id",
            F.round(F.col("m.mid_lat"), 9).alias("mid_lat"),
            F.round(F.col("m.mid_lng"), 9).alias("mid_lng"),
        )
        .orderBy("user_id", "event_id")
    )


def _q_cosine_text_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact TF-weighted cosine similarity self-join (pipeline/dedup.py
    cosine_tf_join) at cos >= 0.6 over a bounded cohort: integer TF dot
    products (order-independent exact aggregation), float only in the
    final fixed-order norm division. The oracle replays TF, dot and norm
    from the same token split."""
    from gos2_spark.pipeline.dedup import cosine_tf_join

    docs = _load(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    out = cosine_tf_join(docs, threshold=0.6)
    return out.select(
        "key_a", "key_b", "dot", F.round("cosine", 9).alias("cosine")
    ).orderBy("key_a", "key_b")


def _cosine_text_oracle_sql(threshold: float = 0.6) -> str:
    return f"""
        WITH toks AS (
          SELECT doc_id AS key, t.tok
          FROM documents,
               LATERAL (
                 SELECT unnest(list_filter(
                   string_split_regex(lower(text), '[^a-z]+'),
                   x -> len(x) > 0)) AS tok
               ) t
          WHERE doc_id < 300
        ),
        tf AS (SELECT key, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
        norms AS (
          SELECT key, sqrt(CAST(sum(tf * tf) AS DOUBLE)) AS norm
          FROM tf GROUP BY key
        ),
        dots AS (
          SELECT a.key AS key_a, b.key AS key_b,
                 CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
          FROM tf a JOIN tf b ON a.tok = b.tok AND a.key < b.key
          GROUP BY 1, 2
        ),
        cj AS (
          SELECT d.key_a, d.key_b, d.dot,
                 CAST(d.dot AS DOUBLE) / (na.norm * nb.norm) AS cosine
          FROM dots d
          JOIN norms na ON na.key = d.key_a
          JOIN norms nb ON nb.key = d.key_b
        )
        SELECT key_a, key_b, dot, round(cosine, 9) AS cosine
        FROM cj WHERE cosine >= {threshold!r}
        ORDER BY key_a, key_b
    """


def _q_zorder_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over the customer point cloud
    (spark/functions.py morton_encode — the OPTIMIZE ZORDER key of
    lakehouse tables other systems write): 16-bit interleave of
    equirectangular-quantized lat/lng, aggregated by the top-10-bit
    bucket plus the exact min/max key per bucket (the range-pruning
    stats a Z-ordered scan relies on). Pure codegen bit arithmetic; the
    oracle replays the interleave bit for bit."""
    from gos2_spark.spark.functions import morton_encode

    pts = _cust_points(spark, sf_dir)
    mk = morton_encode(F.col("lat"), F.col("lng"), bits=16)
    return (
        pts.select(F.shiftright(mk, 22).alias("bucket"), mk.alias("_mk"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("_mk").alias("mk_min"),
            F.max("_mk").alias("mk_max"),
        )
        .orderBy("bucket")
    )


def _zorder_oracle_sql(bits: int = 16) -> str:
    n = 1 << bits
    ix = f"CAST(least({n - 1}, floor((lng + 180.0) / 360.0 * {float(n)!r})) AS BIGINT)"
    iy = f"CAST(least({n - 1}, floor((lat + 90.0) / 180.0 * {float(n)!r})) AS BIGINT)"
    terms = " + ".join(
        f"((((x >> {i}) & 1) << {2 * i}) + (((y >> {i}) & 1) << {2 * i + 1}))"
        for i in range(bits)
    )
    return f"""
        WITH pts AS ({_CUST_LATLNG_SQL}),
        q AS (SELECT {ix} AS x, {iy} AS y FROM pts),
        m AS (SELECT ({terms}) AS mk FROM q)
        SELECT mk >> 22 AS bucket, count(*) AS n,
               min(mk) AS mk_min, max(mk) AS mk_max
        FROM m GROUP BY bucket ORDER BY bucket
    """


def _q_gc_densify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Route densification: every consecutive trajectory leg emits the
    great-circle points at fractions 1/4, 1/2, 3/4 (spark/functions.py
    gc_interpolate — spherical slerp, the lat/lng-native EdgeInterpolate).
    One window shuffle + a bounded 3x explode + per-row codegen; the
    oracle replays the slerp term for term over every leg."""
    from pyspark.sql import Window

    from gos2_spark.spark.functions import gc_interpolate

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    pts = ev.select(
        "user_id",
        "ts",
        "event_id",
        (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
        (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = pts.select(
        "user_id",
        "event_id",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lng").over(w).alias("plng"),
        "lat",
        "lng",
    ).where(F.col("plat").isNotNull() & (F.col("event_id") % 5 == 0))
    legs = lagged.select(
        "user_id",
        "event_id",
        "plat",
        "plng",
        "lat",
        "lng",
        F.explode(F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))).alias("f"),
    )
    p = gc_interpolate(
        F.col("plat"), F.col("plng"), F.col("lat"), F.col("lng"), F.col("f")
    )
    return (
        legs.select("user_id", "event_id", "f", p.alias("_p"))
        .select(
            "user_id",
            "event_id",
            "f",
            F.round(F.col("_p.lat"), 9).alias("d_lat"),
            F.round(F.col("_p.lng"), 9).alias("d_lng"),
        )
        .orderBy("user_id", "event_id", "f")
    )


def _gc_densify_oracle_sql() -> str:
    """Slerp replay: haversine central angle (same macro shape as the
    green haversine_distance oracle), sin-ratio weights with the 1e-12
    degenerate fallback, xyz blend, atan2 back — term for term."""
    hx = (
        "power(sin(0.5 * (radians(lat) - radians(plat))), 2)"
        " + power(sin(0.5 * (radians(lng) - radians(plng))), 2)"
        " * cos(radians(plat)) * cos(radians(lat))"
    )
    return f"""
        WITH pts AS ({_EVENTS_LATLNG_SQL}),
        lagged AS (
          SELECT user_id, event_id,
                 lag(lat) OVER w AS plat, lag(lng) OVER w AS plng,
                 lat, lng
          FROM pts
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        legs AS (
          SELECT l.*, f
          FROM lagged l, (SELECT unnest([0.25, 0.5, 0.75]) AS f)
          WHERE plat IS NOT NULL AND event_id % 5 = 0
        ),
        ang AS (
          SELECT *,
                 2 * atan2(sqrt({hx}), sqrt(greatest(0.0, 1.0 - ({hx})))) AS theta
          FROM legs
        ),
        ab AS (
          SELECT *,
                 CASE WHEN sin(theta) > 1e-12
                      THEN sin((1.0 - f) * theta) / sin(theta)
                      ELSE 1.0 - f END AS a,
                 CASE WHEN sin(theta) > 1e-12
                      THEN sin(f * theta) / sin(theta)
                      ELSE f END AS b
          FROM ang
        ),
        xyz AS (
          SELECT user_id, event_id, f,
                 a * cos(radians(plat)) * cos(radians(plng))
                   + b * cos(radians(lat)) * cos(radians(lng)) AS x,
                 a * cos(radians(plat)) * sin(radians(plng))
                   + b * cos(radians(lat)) * sin(radians(lng)) AS y,
                 a * sin(radians(plat)) + b * sin(radians(lat)) AS z
          FROM ab
        )
        SELECT user_id, event_id, f,
               round(degrees(atan2(z, sqrt(x * x + y * y))), 9) AS d_lat,
               round(degrees(atan2(y, x)), 9) AS d_lng
        FROM xyz ORDER BY user_id, event_id, f
    """


def _q_geo_language_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell language mix — the graft's core shape (web corpus x S2
    tiling): points get a level-4 parent key via pure bitwise SQL
    (cellid.go:168-171), then one (cell, lang) hash agg + a window pick of
    the dominant language with deterministic (count desc, lang) tiebreak.
    The oracle replays the FULL Hilbert encode in SQL plus the same parent
    bit arithmetic, so this gates the whole indexing path end-to-end.

    Plan shape: pure-codegen encode (add_cellid_sql — no Python stage at
    all), ONE (cell, lang) hash agg, then ONE cell-keyed window pass that
    produces rank, per-cell totals, and lang counts together (a groupBy +
    join formulation costs an extra exchange and a join)."""
    from pyspark.sql import Window

    from gos2_spark.spark.functions import add_cellid_sql
    from gos2_spark.spark.pages import LANGS, s2_parent_sql

    c = _load(spark, sf_dir, "customer")
    lat = (-60.0 + (F.col("c_custkey") * 7 % 120)
           + (F.col("c_custkey") % 97) / 97.0).alias("lat")
    lng = (-170.0 + (F.col("c_custkey") * 13 % 340)
           + (F.col("c_custkey") % 89) / 89.0).alias("lng")
    pts = add_cellid_sql(
        c.select(F.col("c_custkey").alias("key"), lat, lng), "lat", "lng", "cell_id"
    )
    lang = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]), (F.col("key") % 6 + 1).cast("int")
    )
    cells = pts.select(
        s2_parent_sql(F.col("cell_id"), 4).alias("cell_l4"), lang.alias("lang")
    )
    per = cells.groupBy("cell_l4", "lang").agg(F.count("*").alias("n"))
    w = Window.partitionBy("cell_l4")
    wr = w.orderBy(F.desc("n"), "lang")
    return (
        per.select(
            "cell_l4",
            F.row_number().over(wr).alias("rk"),
            F.sum("n").over(w).alias("n_points"),
            F.count("*").over(w).alias("n_langs"),
            F.col("lang").alias("top_lang"),
            F.col("n").alias("top_n"),
        )
        .where(F.col("rk") == 1)
        .drop("rk")
        .orderBy("cell_l4")
    )


def _messy_url_parts(d):
    """Deterministic messy-URL synthesis shared by the URL-pipeline queries."""
    k = (d % 20).cast("string")
    m = (d % 125).cast("string")
    base = F.concat(F.lit("https://site"), k, F.lit(".example/p/"), m)
    return k, m, base


def _q_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization gate (pipeline/web.py url_canonicalize): four
    deterministic messiness variants per doc (uppercase host + default
    port + fragment, tracking params, trailing slash) must all collapse
    back to the clean base URL. Per-host rollup reports raw count,
    distinct canonical count, and the number of rows whose canonical form
    equals the known base — the oracle replays the full regexp chain
    (RE2-compatible, no lookaround) in SQL."""
    from gos2_spark.pipeline.web import url_canonicalize, url_host

    docs = _load(spark, sf_dir, "documents")
    d = F.col("doc_id")
    k, m, base = _messy_url_parts(d)
    messy = (
        F.when(
            d % 4 == 1,
            F.concat(
                F.lit("HTTPS://SITE"), k, F.lit(".EXAMPLE:443/p/"), m, F.lit("#ref")
            ),
        )
        .when(d % 4 == 2, F.concat(base, F.lit("?utm_source=feed&utm_medium=rss")))
        .when(d % 4 == 3, F.concat(base, F.lit("/")))
        .otherwise(base)
    )
    rows = docs.select(base.alias("base"), messy.alias("messy"))
    canon = rows.select(
        "base", url_canonicalize(F.col("messy")).alias("canon")
    )
    return (
        canon.groupBy(url_host(F.col("canon")).alias("host"))
        .agg(
            F.count("*").alias("n_raw"),
            F.countDistinct("canon").alias("n_canonical"),
            F.sum((F.col("canon") == F.col("base")).cast("long")).alias(
                "n_roundtrip_ok"
            ),
        )
        .orderBy("host")
    )


def _q_host_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level link-graph construction (pipeline/web.py extract_links):
    anchors are regexp-extracted from synthetic html in the JVM, relative
    links (no host) drop, and edges aggregate to (src_host, dst_host,
    n_links) — the exact edge table pipeline/graph.py PageRank consumes.
    One explode + one map-side-combined groupBy."""
    from gos2_spark.pipeline.web import extract_links, url_host

    docs = _load(spark, sf_dir, "documents")
    d = F.col("doc_id")
    k, m, base = _messy_url_parts(d)
    html = F.concat(
        F.lit('<html><body><a href="https://site'),
        ((d * 7) % 20).cast("string"),
        F.lit(".example/p/"),
        m,
        F.lit('">x</a> <a href="/local">l</a> <a href="https://site'),
        ((d * 11) % 20).cast("string"),
        F.lit('.example/q">y</a></body></html>'),
    )
    pages = docs.select(base.alias("url"), html.alias("html"))
    links = pages.select(
        url_host(F.col("url")).alias("src_host"),
        F.explode(extract_links(F.col("html"))).alias("href"),
    )
    edges = links.select(
        "src_host", url_host(F.col("href")).alias("dst_host")
    ).where(F.col("dst_host") != "")
    return (
        edges.groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
        .orderBy("src_host", "dst_host")
    )


def _q_robots_url_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt-style crawl gate (pipeline/web.py robots_gate): a tiny
    (host, path_prefix) disallow table is broadcast and applied as a
    nested-loop ANTI join ('*' host = global rule) — the page table never
    shuffles. Output compares per-host totals vs kept vs blocked."""
    from gos2_spark.pipeline.web import robots_gate, url_host

    docs = _load(spark, sf_dir, "documents")
    d = F.col("doc_id")
    k, m, _base = _messy_url_parts(d)
    pth = F.element_at(
        F.array(
            F.lit("/p/"), F.lit("/admin/"), F.lit("/tmp/"), F.lit("/q/"),
            F.lit("/admin/logs/"),
        ),
        (d % 5 + 1).cast("int"),
    )
    url = F.concat(F.lit("https://site"), k, F.lit(".example"), pth, m)
    pages = docs.select(url.alias("url"))
    rules = spark.createDataFrame(
        [("*", "/admin"), ("site3.example", "/tmp"), ("site7.example", "/q")],
        "host string, path_prefix string",
    )
    kept = robots_gate(pages, rules)
    tot = pages.groupBy(url_host(F.col("url")).alias("host")).agg(
        F.count("*").alias("n_total")
    )
    nk = kept.groupBy(url_host(F.col("url")).alias("host")).agg(
        F.count("*").alias("n_kept")
    )
    return (
        tot.join(nk, "host", "left")
        .select(
            "host",
            "n_total",
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
            (F.col("n_total") - F.coalesce(F.col("n_kept"), F.lit(0))).alias(
                "n_blocked"
            ),
        )
        .orderBy("host")
    )


def _q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-distribution entropy (pipeline/text.py
    char_entropy): the fixed-alphabet left-to-right formulation makes the
    float summation order deterministic, so a per-row oracle gates every
    document's value at round-9 — one codegen projection, zero shuffles."""
    from gos2_spark.pipeline.text import char_entropy

    docs = _load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.round(char_entropy(F.col("text")), 9).alias("entropy")
    ).orderBy("doc_id")


def _q_spatiotemporal_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP rollup over (day, level-5 cell): Spark's rollup() emits the
    grouping-sets expand plan — per-(day, cell) counts, per-day subtotals,
    and a grand total in ONE aggregation pass (partials reused across
    grouping sets, a single shuffle). Cell keys come from the pure-SQL
    Hilbert encode + parent bit arithmetic (cellid.go:168-171,503-509);
    the oracle replays the encode and GROUP BY ROLLUP in DuckDB."""
    from gos2_spark.spark.functions import add_cellid_sql
    from gos2_spark.spark.pages import s2_parent_sql

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    pts = ev.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
        (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
    )
    cells = add_cellid_sql(pts, "lat", "lng", "cell_id").withColumn(
        "cell_l5", s2_parent_sql(F.col("cell_id"), 5)
    )
    rolled = cells.rollup("day", "cell_l5").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
    # string sentinels for the subtotal rows: NULLable BIGINT round-trips
    # through arrow/pandas as float64 and would lose exactness in compares
    return rolled.select(
        F.coalesce(F.col("day"), F.lit("__total__")).alias("day"),
        F.coalesce(F.col("cell_l5").cast("string"), F.lit("__total__")).alias(
            "cell"
        ),
        "n_events",
        "n_users",
    ).orderBy("day", "cell")


def _q_trajectory_simplify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical Douglas-Peucker simplification
    (spark/trajectory.py simplify_trajectories): per-user polylines are
    reduced to the minimal vertex subset within a 0.02 rad corridor, via
    one applyInPandas shuffle with the reference-parity segment metric
    (edgeutil.go:77-106) vectorized inside. Data-dependent recursion has
    no SQL form — driver check is rows-only; value-level correctness is
    pinned by property tests against an independent pure-python DP."""
    from gos2_spark.spark.trajectory import simplify_trajectories

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    pts = ev.select(
        "user_id",
        "ts",
        F.col("event_id").alias("pt_id"),
        (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
        (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
    )
    kept = simplify_trajectories(pts, tolerance_rad=0.02, key_col="user_id")
    raw = pts.groupBy("user_id").agg(F.count("*").alias("n_before"))
    s = kept.groupBy("user_id").agg(
        F.count("*").alias("n_after"),
        F.sum("pt_id").alias("kept_id_sum"),
    )
    return (
        raw.join(s, "user_id")
        .select("user_id", "n_before", "n_after", "kept_id_sum")
        .orderBy("user_id")
    )


def _q_asof_profile_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (spark/temporal.py asof_join): every event is
    enriched with the tier of the most recent profile update (a sparse
    per-user timeline derived from every 17th event) at or before its
    timestamp. The union + last(ignorenulls) running-window plan does ONE
    user-keyed shuffle — no inequality-join blowup. The oracle is DuckDB's
    native ASOF LEFT JOIN, an entirely independent implementation.
    Unmatched rows surface as tier = -1 (sentinel keeps the column
    non-null int64 end to end)."""
    from gos2_spark.spark.temporal import asof_join

    ev = _load(spark, sf_dir, "events")
    left = ev.select("user_id", "ts", "event_id")
    right = (
        ev.where(F.col("event_id") % 17 == 0)
        .groupBy("user_id", "ts")
        .agg(F.max(F.col("event_id") % 5).alias("tier"))
    )
    j = asof_join(left, right, on="user_id", ts_col="ts", value_cols=["tier"])
    return j.select(
        "event_id", F.coalesce(F.col("tier"), F.lit(-1)).alias("tier")
    ).orderBy("event_id")


def _q_gc_destination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Direct geodesy (spark/functions.py gc_destination): move each
    customer point a key-derived distance along a key-derived bearing;
    per-row oracle re-derives the destination AND closes the loop with a
    haversine distance-error column (identical float sequence in both
    engines, so the error rounds to zero everywhere)."""
    from gos2_spark.spark.functions import gc_destination, haversine_rad

    pts = _cust_points(spark, sf_dir)
    brg = F.radians(F.col("key") % 360)
    dist = (F.col("key") % 5) * 0.01 + 0.03
    d = gc_destination(F.col("lat"), F.col("lng"), brg, dist)
    out = pts.select("key", "lat", "lng", d.alias("d"), dist.alias("dist"))
    chk = haversine_rad(
        F.col("lat"), F.col("lng"), F.col("d.dst_lat"), F.col("d.dst_lng")
    )
    return out.select(
        "key",
        F.round("d.dst_lat", 9).alias("dst_lat"),
        F.round("d.dst_lng", 9).alias("dst_lng"),
        # abs(): -0.0 vs 0.0 would desync repr-sorted row alignment
        F.round(F.abs(chk - F.col("dist")), 9).alias("dist_err"),
    ).orderBy("key")


def _q_interval_window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal range join (spark/temporal.py interval_join): every 23rd
    event opens a 2-hour per-user window; all same-user events inside it
    are matched via the bucket-explode EQUI join + codegen BETWEEN refine
    — never an inequality nested loop. The oracle runs the naive
    inequality join directly in DuckDB (fine at sf scale), so the bucket
    decomposition is value-checked against the declarative definition."""
    from gos2_spark.spark.temporal import interval_join

    ev = _load(spark, sf_dir, "events")
    left = ev.select("user_id", "ts", "event_id")
    wins = ev.where(F.col("event_id") % 23 == 0).select(
        F.col("event_id").alias("win_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
    )
    j = interval_join(left, wins, on="user_id", bucket_seconds=3600)
    return (
        j.groupBy("win_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("event_id").alias("event_sum"),
        )
        .orderBy("win_id")
    )


def _q_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleinberg HITS over the synthetic 64-node domain graph
    (pipeline/graph.py hits): 2 unrolled rounds of hub/authority power
    iteration, L1-normalized via broadcast single-row totals; the oracle
    replays the rounds as chained CTEs. Complements domain_pagerank as
    the second link-analysis primitive."""
    from gos2_spark.pipeline.graph import hits

    c = _load(spark, sf_dir, "customer")
    edges = c.select(
        (F.col("c_custkey") % 64).alias("src"),
        ((F.col("c_custkey") * 11 + 5) % 64).alias("dst"),
    )
    out = hits(edges, iterations=2)
    return out.select(
        "node",
        F.round("hub", 6).alias("hub"),
        F.round("authority", 6).alias("authority"),
    ).orderBy("node")


def _q_cell_top_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial top-k: the 3 highest-value events per level-5 cell — the
    per-tile 'best results' primitive (map rendering, per-region
    exemplars). Pure-SQL Hilbert encode for the cell key, ONE cell-keyed
    window with deterministic (value desc, event_id) tiebreak."""
    from pyspark.sql import Window

    from gos2_spark.spark.functions import add_cellid_sql
    from gos2_spark.spark.pages import s2_parent_sql

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    pts = ev.select(
        "event_id",
        "value",
        (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
        (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
    )
    cells = add_cellid_sql(pts, "lat", "lng", "cell_id").withColumn(
        "cell_l5", s2_parent_sql(F.col("cell_id"), 5)
    )
    w = Window.partitionBy("cell_l5").orderBy(F.desc("value"), "event_id")
    return (
        cells.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("cell_l5", F.col("rk").cast("int").alias("rk"), "event_id",
                F.round("value", 6).alias("value"))
        .orderBy("cell_l5", "rk")
    )


def _q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM document scoring (the CCNet-style LM-quality signal):
    corpus unigram frequencies become per-token log-probabilities, and
    each document is scored by its mean token log-prob. Plan: ONE
    map-side-combined vocab count, joined back to the exploded tokens
    (AQE broadcasts the vocab when small), ONE doc-keyed agg."""
    docs = _load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"[^a-z]+"),
                lambda t: F.length(t) > 0,
            )
        ).alias("token"),
    )
    counts = toks.groupBy("token").agg(F.count("*").alias("c"))
    total = counts.agg(F.sum("c").alias("t"))
    lp = F.log(F.col("c").cast("double") / F.col("t").cast("double"))
    scored = (
        toks.join(counts, "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            (F.sum(lp) / F.count("*")).alias("avg_lp"),
        )
    )
    return scored.select(
        "doc_id", "n_tok", F.round("avg_lp", 6).alias("avg_logprob")
    ).orderBy("doc_id")


def _q_jaccard_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity self-join at Jaccard >= 0.9
    (pipeline/dedup.py jaccard_join, PPJoin-style rare-first prefix
    filtering with no global rank materialization): the zero-false-
    negative complement to the MinHash/SimHash approximate dedup paths.
    The oracle is the brute-force O(n^2) list_intersect join in DuckDB,
    so the prefix filter's completeness is value-checked, not assumed."""
    from gos2_spark.pipeline.dedup import jaccard_join

    docs = _load(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    out = jaccard_join(docs, threshold=0.9)
    return out.select(
        "key_a",
        "key_b",
        F.col("inter").alias("n_inter"),
        F.col("union").alias("n_union"),
        F.round("jaccard", 9).alias("jaccard"),
    ).orderBy("key_a", "key_b")


def _q_zipf_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus Zipf table (pipeline/text.py zipf_top_tokens): distributed
    top-k via TakeOrderedAndProject over the map-side-combined vocab
    aggregate; rank/cumulative-share are exact-integer so the table is
    engine-reproducible."""
    from gos2_spark.pipeline.text import zipf_top_tokens

    docs = _load(spark, sf_dir, "documents")
    return zipf_top_tokens(docs, top_k=50).orderBy("rank")


def _q_adaptive_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive density tiling (spark/density.py): variable-resolution tile
    set over the customer points — every tile holds <= 8 points or sits at
    the max level. One raw-table shuffle; selection is per-level count
    algebra the oracle replays with grouped CTEs + the biased-id parent
    bit arithmetic (cellid.go:168-171)."""
    from gos2_spark.spark.density import adaptive_density_tiles

    pts = _cust_points(spark, sf_dir)
    return (
        adaptive_density_tiles(pts, threshold=8, min_level=1, max_level=4)
        .orderBy("level", "cell")
    )


def _q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing (pipeline/pack.py): concat-then-chunk
    pack assignment per (lang, shard), summarized. Window cumulative-sum
    algebra end to end — the oracle replays it with a SQL window."""
    from gos2_spark.pipeline.pack import pack_sequences, packing_summary

    docs = _load(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), " "))
    d = docs.select("doc_id", "lang", toks.cast("long").alias("n_tok"))
    packed = pack_sequences(d, budget=512, n_shards=8, group_cols=("lang",))
    return packing_summary(packed, 512, group_cols=("lang",)).orderBy(
        "lang", "shard"
    )


def _q_pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub gate (pipeline/text.py pii_scrub): deterministic synthetic
    emails / phones / IPv4s are appended to the digit-free corpus text; the
    engine must find and redact EXACTLY the planted spans — the oracle
    re-derives every count and redacted-char total from the injection
    arithmetic, not from regexes, so any over- or under-match fails the
    value hash."""
    from gos2_spark.pipeline.text import pii_scrub

    docs = _load(spark, sf_dir, "documents")
    k = F.col("doc_id")
    t = F.col("text")
    t = F.when(
        k % 3 == 0,
        F.concat(t, F.format_string(" contact user%d@example.com", k % 50)),
    ).otherwise(t)
    t = F.when(
        k % 4 == 0, F.concat(t, F.format_string(" call 555-123-4%03d", k % 1000))
    ).otherwise(t)
    t = F.when(
        k % 5 == 0,
        F.concat(t, F.format_string(" from host 10.1.%d.%d", k % 200, (k * 7) % 250)),
    ).otherwise(t)
    out = pii_scrub(docs.select("doc_id", "lang", t.alias("text")))
    any_pii = (F.col("n_email") + F.col("n_ipv4") + F.col("n_phone")) > 0
    return (
        out.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_email").cast("long").alias("n_email"),
            F.sum("n_ipv4").cast("long").alias("n_ipv4"),
            F.sum("n_phone").cast("long").alias("n_phone"),
            F.sum(any_pii.cast("long")).cast("long").alias("docs_with_pii"),
            F.sum("chars_redacted").cast("long").alias("chars_redacted"),
            F.sum(F.length("text_scrubbed")).cast("long").alias("scrubbed_chars"),
        )
        .orderBy("lang")
    )


def _q_bloom_delta_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-delta Bloom gate (pipeline/bloom.py): build a distributed
    63-bit-word Bloom filter from the previous crawl (even doc_ids), probe
    the full table, and summarize per (is_old, maybe_seen). The filter is
    exact integer algebra on xxhash64 so the oracle replays every bit —
    including the deterministic false-positive count — via the SQL XXH64
    model. No false negatives: (is_old=true, maybe_seen=false) must have
    no row."""
    from gos2_spark.pipeline.bloom import bloom_build, bloom_probe

    m, g = 2048, 3
    docs = _load(spark, sf_dir, "documents")
    url = F.concat(F.col("source"), F.lit("/"), F.col("doc_id").cast("string"))
    k = docs.select(
        url.alias("url"),
        F.col("doc_id"),
        (F.col("doc_id") % 2 == 0).alias("is_old"),
    )
    filt = bloom_build(k.where("is_old"), "url", m, g)
    probed = bloom_probe(k, filt, "url", m, g, carry_cols=("doc_id", "is_old"))
    return (
        probed.groupBy("is_old", "maybe_seen")
        .agg(F.count("*").alias("n_keys"), F.sum("doc_id").alias("key_sum"))
        .orderBy("is_old", "maybe_seen")
    )


def _q_ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (pipeline/contamination.py): 5-gram
    overlap of the corpus against a held-out set (doc_id % 37 == 0),
    summarized per lang. Benchmark grams broadcast; the only wide exchange
    is the per-doc count agg. The oracle replays the plain-string grams."""
    from gos2_spark.pipeline.contamination import ngram_contamination

    docs = _load(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 37 == 0)
    out = ngram_contamination(docs, bench, n=5)
    d = docs.select(F.col("doc_id").alias("key"), "lang")
    return (
        out.join(d, "key")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("contaminated").cast("long")).alias(
                "n_contaminated_docs"
            ),
            F.sum("n_contaminated").cast("long").alias("total_hit_ngrams"),
            F.sum("n_ngrams").cast("long").alias("total_ngrams"),
        )
        .orderBy("lang")
    )


def _q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed linear quality classifier (pipeline/classify.py): fasttext-
    style hashing-trick scorer with closed-form weights — one codegen
    projection, no shuffle before the per-lang agg. The oracle replays
    xxhash64 bucketing and the exact sequential fold."""
    from gos2_spark.pipeline.classify import hashed_linear_score

    docs = _load(spark, sf_dir, "documents")
    out = hashed_linear_score(docs, n_features=4096)
    d = docs.select(F.col("doc_id").alias("key"), "lang")
    return (
        out.join(d, "key")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            F.round(F.avg("score"), 6).alias("avg_score"),
        )
        .orderBy("lang")
    )


def _q_domain_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-graph PageRank (pipeline/graph.py): 3 damped power
    iterations over the synthetic customer-key link graph (64 domains,
    every node has out-edges). Fixed iteration count -> the oracle unrolls
    the same algebra as chained CTEs."""
    from gos2_spark.pipeline.graph import pagerank

    c = _load(spark, sf_dir, "customer")
    edges = c.select(
        (F.col("c_custkey") % 64).alias("src"),
        ((F.col("c_custkey") * 7 + 3) % 64).alias("dst"),
    )
    ranks = pagerank(edges, iterations=3, damping=0.85)
    return ranks.select(
        "node", F.round("rank", 9).alias("rank")
    ).orderBy("node")


def _q_spatial_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial single-linkage clustering: connected components
    (pipeline/graph.py) of the within-3-degree graph produced by the
    blocked distance self-join (spark/joins.py::distance_join). The
    oracle rebuilds the edge set with the identical float formula and
    resolves components with a recursive transitive-closure CTE."""
    from gos2_spark.pipeline.graph import connected_components
    from gos2_spark.spark.joins import distance_join

    pts = _cust_points(spark, sf_dir)
    pairs = distance_join(pts, 3.0, point_key="key").select("key_a", "key_b")
    comps = connected_components(pts.select("key"), pairs)
    return comps.orderBy("key")


def _q_dbscan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed DBSCAN (spark/clustering.py): eps-graph from the
    cell-blocked distance self-join, core points by degree count,
    clusters = pointer-doubling components over the core-core subgraph,
    borders deterministically adopt the MIN core-neighbor label. The
    oracle rebuilds the identical eps-graph (same float-op order) and
    replays core/border/noise with a recursive closure over core edges."""
    from gos2_spark.spark.clustering import dbscan

    pts = _cust_points(spark, sf_dir)
    res = dbscan(pts, eps_deg=3.0, min_pts=4, point_key="key")
    # noise carries NULL in the library; the value-compare wants a concrete
    # sentinel (NULL -> NaN dtype drift in the pandas bridge)
    return res.select(
        "key", "role", F.coalesce(F.col("cluster"), F.lit(-1)).alias("cluster")
    ).orderBy("key")


def _q_doc_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length distribution: EXACT per-lang char/token percentiles
    (Spark's percentile aggregate and DuckDB's quantile_cont share type-7
    linear interpolation, so values match to rounding). At 100 TB the
    exact aggregate is still one shuffle on lang; swap percentile ->
    percentile_approx for a sketch when per-group cardinality explodes."""
    from gos2_spark.pipeline.text import token_count

    docs = _load(spark, sf_dir, "documents")
    d = docs.select(
        "lang",
        F.length("text").cast("double").alias("c"),
        token_count(F.col("text")).cast("double").alias("tk"),
    )
    pct = F.lit([0.25, 0.5, 0.9, 0.99])
    agg = d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.percentile("c", pct).alias("_cq"),
        F.percentile("tk", pct).alias("_tq"),
    )
    cols = [F.col("lang"), F.col("n_docs")]
    for i, name in enumerate(["p25", "p50", "p90", "p99"]):
        cols.append(F.round(F.col("_cq")[i], 6).alias(f"chars_{name}"))
        cols.append(F.round(F.col("_tq")[i], 6).alias(f"tokens_{name}"))
    return agg.select(*cols).orderBy("lang")


def _q_streaming_bloom_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming crawl-delta gate: the batch-built Bloom filter (previous
    crawl = even doc_ids) probed by the documents STREAM via the
    stateless flat probe (g broadcast stream-static joins — no state, no
    watermark, plain append mode). Summarized identically to
    bloom_delta_gate, so the batch oracle verifies the streaming path
    bit-for-bit. Multi-micro-batch equivalence is pytest-gated."""
    from gos2_spark.pipeline.bloom import bloom_build, bloom_probe_flat

    m, g = 2048, 3
    url = F.concat(F.col("source"), F.lit("/"), F.col("doc_id").cast("string"))
    batch = _load(spark, sf_dir, "documents").select(
        url.alias("url"),
        F.col("doc_id"),
        (F.col("doc_id") % 2 == 0).alias("is_old"),
    )
    filt = bloom_build(batch.where("is_old"), "url", m, g)
    sch = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = (
        spark.readStream.schema(sch)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .select(
            url.alias("url"),
            F.col("doc_id"),
            (F.col("doc_id") % 2 == 0).alias("is_old"),
        )
    )
    gated = bloom_probe_flat(stream, filt, "url", m, g)
    name = "gos2_stream_bloom_gate"
    q = (
        gated.select("doc_id", "is_old", "maybe_seen")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("is_old", "maybe_seen")
        .agg(F.count("*").alias("n_keys"), F.sum("doc_id").alias("key_sum"))
        .orderBy("is_old", "maybe_seen")
    )


def _q_dup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication (pipeline/spans.py): per-lang coverage
    of 8-token spans occurring more than once corpus-wide (Lee et al.
    exact-substring dedup measurement). Span keys are xxhash64 (8 bytes
    through the shuffle); the oracle replays the hashes and the interval-
    union fold exactly."""
    from gos2_spark.pipeline.spans import duplicated_span_coverage

    docs = _load(spark, sf_dir, "documents")
    out = duplicated_span_coverage(docs, k=8)
    d = docs.select(F.col("doc_id").alias("key"), "lang")
    return (
        out.join(d, "key")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_spans").alias("total_spans"),
            F.sum("n_dup_spans").alias("total_dup_spans"),
            F.sum("dup_tokens").alias("total_dup_tokens"),
            F.sum((F.col("dup_tokens") > 0).cast("long")).alias(
                "docs_with_dups"
            ),
            F.round(
                F.sum("dup_tokens").cast("double")
                / F.sum("n_tokens").cast("double"),
                9,
            ).alias("dup_token_frac"),
        )
        .orderBy("lang")
    )


def _q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 TF-IDF terms (pipeline/text.py::tfidf_top_terms) over
    doc_id < 100. Ranking is the RATIONAL weight tf*(N+1)/(df+1) so the
    cross-engine order is exact; the reported tfidf is the classic
    smoothed log weight, rounded."""
    from gos2_spark.pipeline.text import tfidf_top_terms

    docs = _load(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return tfidf_top_terms(docs, top_k=3).orderBy("key", "rk")


_ROUTE_WAYPOINTS = [
    (40.7128, -74.0060),   # nyc
    (51.5074, -0.1278),    # london
    (35.6762, 139.6503),   # tokyo
    (-33.8688, 151.2093),  # sydney
]
_ROUTE_RADIUS_DEG = 2.0


def _seg_dist_sql(a, b) -> str:
    """DistanceToEdge (edgeutil.go:77-106) as a SQL expression over xyz
    columns (x, y, z), endpoint/normal literals from the same numpy code
    path as the kernel — identical float-op order."""
    import numpy as np

    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    acb = np.cross(a + b, b - a)
    acb = acb / np.sqrt(acb @ acb)
    a1, a2, a3 = (repr(float(v)) for v in a)
    b1, b2, b3 = (repr(float(v)) for v in b)
    c1, c2, c3 = (repr(float(v)) for v in acb)
    return f"""(CASE WHEN
            ((y * {c3} - z * {c2}) * {a1} + (z * {c1} - x * {c3}) * {a2}
             + (x * {c2} - y * {c1}) * {a3}) > 0
            AND (({c2} * z - {c3} * y) * {b1} + ({c3} * x - {c1} * z) * {b2}
             + ({c1} * y - {c2} * x) * {b3}) > 0
          THEN asin(least(1.0, abs(x * {c1} + y * {c2} + z * {c3})
                          / sqrt({c1} * {c1} + {c2} * {c2} + {c3} * {c3})))
          ELSE 2 * asin(least(1.0, 0.5 * sqrt(least(
            (x - {a1}) * (x - {a1}) + (y - {a2}) * (y - {a2}) + (z - {a3}) * (z - {a3}),
            (x - {b1}) * (x - {b1}) + (y - {b2}) * (y - {b2}) + (z - {b3}) * (z - {b3})))))
          END)"""


def _route_oracle_sql() -> str:
    """Brute-force oracle for route_proximity: min over the SAME segment
    formulas the engine's kernel evaluates, over ALL points (no blocking
    — the engine's covering prefilter must be a superset, so any point it
    drops incorrectly fails the row compare)."""
    segs = []
    w = [_xyz(*p) for p in _ROUTE_WAYPOINTS]
    for a, b in zip(w[:-1], w[1:]):
        segs.append(_seg_dist_sql(a, b))
    least = "least(" + ", ".join(segs) + ")"
    return f"""
        WITH pts AS ({_CUST_LATLNG_SQL}),
        xyz AS (
          SELECT key,
                 cos(radians(lng)) * cos(radians(lat)) AS x,
                 sin(radians(lng)) * cos(radians(lat)) AS y,
                 sin(radians(lat)) AS z
          FROM pts
        ),
        d AS (SELECT key, {least} AS rd FROM xyz)
        SELECT key, round(rd, 9) AS route_dist_rad
        FROM d WHERE rd <= {math.radians(_ROUTE_RADIUS_DEG)!r}
        ORDER BY key
    """


def _q_route_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polyline proximity join (spark/joins.py::route_proximity_join):
    points within 2 degrees of the nyc-london-tokyo-sydney geodesic
    route. Broadcast 5x5 corridor-cell prefilter at the MinWidth level +
    exact min-over-segments DistanceToEdge refine; the oracle brute-
    forces every point with the identical per-segment formula, so a
    single wrongly-pruned point fails the compare."""
    from gos2_spark.spark.joins import route_proximity_join

    pts = _cust_points(spark, sf_dir)
    out = route_proximity_join(
        pts, _ROUTE_WAYPOINTS, _ROUTE_RADIUS_DEG, point_key="key"
    )
    return (
        out.select("key", F.round("route_dist_rad", 9).alias("route_dist_rad"))
        .orderBy("key")
    )


def _q_cell_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution heatmap pyramid (spark/aggregates.py::cell_pyramid):
    per-cell counts at levels 2-8 in one pass — ancestor array explode +
    ONE (level, cell) hash agg. The oracle re-derives every level's parent
    with the same bitwise arithmetic over the full SQL Hilbert encode."""
    from gos2_spark.spark.aggregates import cell_pyramid

    pts = _cust_points(spark, sf_dir)
    return cell_pyramid(pts, levels=(2, 3, 4, 5, 6, 7, 8)).orderBy(
        "level", "cell"
    )


def _q_geofence_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geofence monitoring: per-user enter/exit transitions between the
    fixture tiles over the ordered event stream — pip join for membership
    (left: outside = 'none'), window lag for edges, transition-matrix
    output. One user-keyed shuffle on top of the covering join; the
    oracle replays membership with the convex edge-normal predicates and
    the same window."""
    from pyspark.sql import Window

    from gos2_spark.spark.functions import s2_cellid
    from gos2_spark.spark.joins import point_in_polygon_join

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    lat = (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat")
    lng = (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng")
    pts = ev.select("user_id", "ts", "event_id", lat, lng).withColumn(
        "cell_id", s2_cellid(F.col("lat"), F.col("lng"))
    )
    hits = point_in_polygon_join(
        pts, _tileset(32), how="inner", point_key="event_id"
    ).select("event_id", "tile_id")
    labeled = pts.join(hits, "event_id", "left").withColumn(
        "fence", F.coalesce(F.col("tile_id"), F.lit("none"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = labeled.select(
        "user_id", "fence", F.lag("fence").over(w).alias("prev_fence")
    ).where(
        F.col("prev_fence").isNotNull()
        & (F.col("prev_fence") != F.col("fence"))
    )
    return (
        t.groupBy(
            F.col("prev_fence").alias("from_fence"),
            F.col("fence").alias("to_fence"),
        )
        .agg(
            F.count("*").alias("n_transitions"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("from_fence", "to_fence")
    )


def _q_stay_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stay-point (stop) detection: maximal runs of >= 3 consecutive
    events in the SAME level-6 cell per user — gaps-and-islands via the
    row_number difference trick, all native window algebra (two windows
    on the one user-keyed shuffle; the cell key is bitwise Parent). The
    oracle replays the full Hilbert encode + identical windows."""
    from pyspark.sql import Window

    from gos2_spark.spark.functions import s2_cellid
    from gos2_spark.spark.pages import s2_parent_sql

    ev = _load(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # sticky per-user locations: every ~5 consecutive events share one
    # deterministic spot (loc = ordinal // 5), so real stays exist
    seq = F.row_number().over(w_all) - 1
    loc = F.floor(seq / 5)
    u = F.col("user_id")
    lat = (-60.0 + ((u * 37 + loc * 11) % 120) + ((u + loc) % 83) / 83.0)
    lng = (-170.0 + ((u * 53 + loc * 17) % 340) + ((u + loc) % 79) / 79.0)
    pts = (
        ev.select("user_id", "ts", "event_id")
        .withColumn("lat", lat)
        .withColumn("lng", lng)
        .withColumn("cell_id", s2_cellid(F.col("lat"), F.col("lng")))
        .withColumn("cell6", s2_parent_sql(F.col("cell_id"), 6))
    )
    w_cell = Window.partitionBy("user_id", "cell6").orderBy("ts", "event_id")
    runs = (
        pts.withColumn(
            "island", F.row_number().over(w_all) - F.row_number().over(w_cell)
        )
        .groupBy("user_id", "cell6", "island")
        .agg(F.count("*").alias("run_len"))
        .where(F.col("run_len") >= 3)
    )
    return (
        runs.groupBy("user_id")
        .agg(
            F.count("*").alias("n_stays"),
            F.max("run_len").alias("longest_stay"),
            F.sum("run_len").alias("stay_events"),
        )
        .orderBy("user_id")
    )


_MIX_BUDGETS = {"en": 120, "de": 40, "fr": 30, "es": 30, "zh": 40}


def _q_data_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic data-mixing sampler: per-lang document budgets
    selected by xxhash64 rank (hash-ordered -> uniform yet reproducible;
    re-running or resharding cannot change the sample). One lang-keyed
    window shuffle; budgets are a literal CASE, no join. The oracle
    replays the hash rank bit-for-bit via the SQL XXH64 model."""
    from pyspark.sql import Window

    docs = _load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.xxhash64(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    budget = F.coalesce(
        *[
            F.when(F.col("lang") == k, F.lit(v))
            for k, v in sorted(_MIX_BUDGETS.items())
        ],
        F.lit(0),
    )
    kept = docs.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") <= budget
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("doc_id").alias("key_sum"),
            F.sum(F.length("text")).alias("kept_chars"),
        )
        .orderBy("lang")
    )


def _q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl snapshot diff: old = even doc_ids, new = doc_id % 7 != 0
    with text amended when doc_id % 5 == 0 — full outer join on the key,
    md5-content compare, per-status accounting (added / removed /
    changed / unchanged). The exact complement to the probabilistic
    Bloom gate; one co-partitioned shuffle join."""
    docs = _load(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("key"), F.md5("text").alias("h_old")
    )
    new_text = F.when(
        F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
    ).otherwise(F.col("text"))
    new = docs.where(F.col("doc_id") % 7 != 0).select(
        F.col("doc_id").alias("key"), F.md5(new_text).alias("h_new")
    )
    j = old.join(new, "key", "full_outer")
    status = (
        F.when(F.col("h_old").isNull(), F.lit("added"))
        .when(F.col("h_new").isNull(), F.lit("removed"))
        .when(F.col("h_old") != F.col("h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.groupBy(status.alias("status"))
        .agg(F.count("*").alias("n_docs"), F.sum("key").alias("key_sum"))
        .orderBy("status")
    )


def _hotspot_oracle_sql() -> str:
    """PULL-form focal sum: per-cell counts + exact SQL edge-neighbor
    arithmetic (same generator as the cell_neighbors_l8 oracle, duplicate-
    free), left-joined so isolated cells keep focal = own count."""
    from gos2_spark.pipeline import duckdb_oracles as _DO

    pairs = _DO.edge_neighbors_l8_oracle_sql(
        _cellid_cte_duckdb(_CUST_LATLNG_SQL)
    )
    lsb = 1 << 44  # level 8
    tok = _DO._token(f"((cell_id & -{lsb}) | {lsb})")
    return f"""
        WITH pairs AS ({pairs}),
        {_cellid_cte_duckdb(_CUST_LATLNG_SQL)},
        cnt AS (SELECT {tok} AS token, count(*) AS n FROM cells GROUP BY 1),
        nb AS (
          SELECT p.token, sum(c2.n) AS nsum
          FROM pairs p JOIN cnt c2 ON c2.token = p.nbr_token
          GROUP BY 1
        ),
        f AS (
          SELECT c.token, c.n, c.n + coalesce(nb.nsum, 0) AS focal_sum
          FROM cnt c LEFT JOIN nb USING (token)
        )
        SELECT token, n, CAST(focal_sum AS BIGINT) AS focal_sum,
               focal_sum >= 5 AS hot
        FROM f ORDER BY token
    """


def _morans_oracle_sql() -> str:
    """Moran's I from integer sufficient statistics: the same exact SQL
    edge-neighbor arithmetic as the hotspot oracle produces the directed
    occupied-pair table; every aggregate is a BIGINT, and the final float
    expression mirrors the engine's op order term for term."""
    from gos2_spark.pipeline import duckdb_oracles as _DO

    pairs = _DO.edge_neighbors_l8_oracle_sql(
        _cellid_cte_duckdb(_CUST_LATLNG_SQL), level=5
    )
    lsb = 1 << 50  # level 5
    tok = _DO._token(f"((cell_id & -{lsb}) | {lsb})")
    return f"""
        WITH pairs AS ({pairs}),
        {_cellid_cte_duckdb(_CUST_LATLNG_SQL)},
        cnt AS (SELECT {tok} AS token, count(*) AS n FROM cells GROUP BY 1),
        pj AS (
          SELECT c1.n AS xi, c2.n AS xj
          FROM pairs p
          JOIN cnt c1 ON c1.token = p.token
          JOIN cnt c2 ON c2.token = p.nbr_token
        ),
        ps AS (
          SELECT count(*) AS w_pairs,
                 CAST(sum(xi) AS BIGINT) AS pi,
                 CAST(sum(xj) AS BIGINT) AS pjs,
                 CAST(sum(xi * xj) AS BIGINT) AS pxy
          FROM pj
        ),
        cs AS (
          SELECT count(*) AS n_cells,
                 CAST(sum(n) AS BIGINT) AS sx,
                 CAST(sum(n * n) AS BIGINT) AS sxx
          FROM cnt
        ),
        c AS (
          SELECT *,
                 CAST(sx AS DOUBLE) / CAST(n_cells AS DOUBLE) AS xb
          FROM cs, ps
        )
        SELECT n_cells, w_pairs,
               round(xb, 9) AS mean_count,
               round(
                 (CAST(n_cells AS DOUBLE) / CAST(w_pairs AS DOUBLE))
                 * (CAST(pxy AS DOUBLE)
                    - xb * CAST(pi AS DOUBLE)
                    - xb * CAST(pjs AS DOUBLE)
                    + CAST(w_pairs AS DOUBLE) * xb * xb)
                 / (CAST(sxx AS DOUBLE)
                    - CAST(n_cells AS DOUBLE) * xb * xb), 9) AS morans_i
        FROM c
    """


def _q_cms_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimation (pipeline/sketch.py): token
    counts estimated from a depth-4 x width-2048 sketch for the top-10
    tokens, reported against the exact counts — est >= true must hold on
    every row (visible upper-bound guarantee). The oracle replays every
    cell via the SQL XXH64 model, including collision overestimates."""
    from gos2_spark.pipeline.sketch import cms_build, cms_estimate
    from gos2_spark.pipeline.text import tokens

    docs = _load(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.when(
                F.trim(F.col("text")) == "", F.array().cast("array<string>")
            ).otherwise(tokens(F.col("text")))
        ).alias("token")
    )
    tf = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    sketch = cms_build(tf, "token", 4, 2048, weight_col="cnt")
    probes = tf.orderBy(F.col("cnt").desc(), "token").limit(10)
    est = cms_estimate(probes.select("token"), sketch, "token", 4, 2048)
    return (
        probes.join(est, "token")
        .select(
            "token",
            F.col("cnt").alias("true_cnt"),
            "est",
            (F.col("est") >= F.col("cnt")).alias("upper_bound_ok"),
        )
        .orderBy("token")
    )


def _cms_oracle_sql(depth: int = 4, width: int = 2048) -> str:
    from gos2_spark.pipeline.duckdb_oracles import xxh64_list_sql

    salted = "[" + ", ".join(
        f"token || '#cms{d}'" for d in range(depth)
    ) + "]"
    col = f"list_transform(hs, x -> CAST((((x % {width}) + {width}) % {width}) AS INT))"
    return f"""
        WITH toks AS (
          SELECT CASE WHEN trim(text) = '' THEN []
                      ELSE regexp_split_to_array(trim(text), '\\s+')
                 END AS tk
          FROM documents
        ),
        occ AS (SELECT unnest(tk) AS token FROM toks),
        tf AS (SELECT token, count(*) AS cnt FROM occ GROUP BY 1),
        h AS (SELECT token, cnt, ({xxh64_list_sql(salted)}) AS hs FROM tf),
        cells AS (
          SELECT unnest(generate_series(0, {depth - 1})) AS row,
                 unnest({col}) AS col, cnt
          FROM h
        ),
        sk AS (SELECT row, col, sum(cnt) AS c FROM cells GROUP BY 1, 2),
        probes AS (
          SELECT token, cnt FROM tf ORDER BY cnt DESC, token LIMIT 10
        ),
        pc AS (
          SELECT p.token, p.cnt,
                 unnest(generate_series(0, {depth - 1})) AS row,
                 unnest({col}) AS col
          FROM probes p JOIN h USING (token)
        ),
        est AS (
          SELECT pc.token, pc.cnt, min(coalesce(sk.c, 0)) AS est
          FROM pc LEFT JOIN sk USING (row, col) GROUP BY 1, 2
        )
        SELECT token, CAST(cnt AS BIGINT) AS true_cnt,
               CAST(est AS BIGINT) AS est,
               est >= cnt AS upper_bound_ok
        FROM est ORDER BY token
    """


def _q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-token estimation per lang (pipeline/
    sketch.py): integer register build (b=12) + exact-decimal harmonic
    sum, reported against the true distinct counts. The oracle replays
    every register and the full estimator — bucket bits, rank via
    bit-length, the 2^(R-rank) integer sum, linear-counting branch —
    bit-for-bit via the SQL XXH64 model."""
    from gos2_spark.pipeline.sketch import hll_estimate, hll_registers

    docs = _load(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(
            F.when(
                F.trim(F.col("text")) == "", F.array().cast("array<string>")
            ).otherwise(F.split(F.trim(F.col("text")), r"\s+"))
        ).alias("token"),
    )
    regs = hll_registers(toks, "token", group_cols=("lang",), b=12)
    est = hll_estimate(regs, ("lang",), b=12)
    true = toks.groupBy("lang").agg(
        F.countDistinct("token").alias("true_distinct")
    )
    return (
        true.join(est, "lang")
        .select("lang", "true_distinct", "occupied", "est")
        .orderBy("lang")
    )


def _hll_oracle_sql(b: int = 12) -> str:
    from gos2_spark.pipeline.duckdb_oracles import _unsigned, xxh64_list_sql

    m = 1 << b
    nb = 64 - b
    R = nb + 1
    p_r = 1 << R          # 2^53
    p_nb = 1 << nb        # 2^52
    alpha = 0.7213 / (1 + 1.079 / m)
    num = alpha * m * m * float(p_r)
    return f"""
        WITH toks AS (
          SELECT lang,
                 CASE WHEN trim(text) = '' THEN []
                      ELSE regexp_split_to_array(trim(text), '\\s+')
                 END AS tk
          FROM documents
        ),
        occ AS (SELECT lang, unnest(tk) AS token FROM toks),
        dt AS (SELECT DISTINCT lang, token FROM occ),
        h AS (
          SELECT lang, ({xxh64_list_sql('[token]')})[1] AS hv FROM dt
        ),
        u AS (SELECT lang, {_unsigned('hv')} AS hu FROM h),
        r AS (
          SELECT lang, CAST(hu >> {nb} AS INT) AS bucket,
                 CAST(hu % {p_nb} AS BIGINT) AS w
          FROM u
        ),
        rk AS (
          SELECT lang, bucket,
                 max(CASE WHEN w = 0 THEN {R}
                          ELSE {R} - length(ltrim(bin(w), '0')) END) AS rank
          FROM r GROUP BY 1, 2
        ),
        agg AS (
          SELECT lang, count(*) AS occupied,
                 sum(CAST({p_r} // (CAST(1 AS BIGINT) << CAST(rank AS INT))
                     AS HUGEINT)) AS s_occ
          FROM rk GROUP BY 1
        ),
        e AS (
          SELECT lang, occupied,
                 CAST(s_occ + ({m} - occupied) * CAST({p_r} AS HUGEINT)
                      AS DOUBLE) AS s,
                 {m} - occupied AS v
          FROM agg
        ),
        est AS (
          SELECT lang, occupied,
                 CASE WHEN ({num!r} / s) <= {2.5 * m!r} AND v > 0
                      THEN {float(m)!r} * ln({float(m)!r} / v)
                      ELSE {num!r} / s END AS raw
          FROM e
        ),
        tr AS (
          SELECT lang, count(DISTINCT token) AS true_distinct FROM occ
          GROUP BY 1
        )
        SELECT tr.lang, CAST(tr.true_distinct AS BIGINT) AS true_distinct,
               CAST(est.occupied AS BIGINT) AS occupied,
               round(est.raw, 4) AS est
        FROM tr JOIN est USING (lang) ORDER BY lang
    """


def _q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned semi join (the semi-join-pushdown pattern): orders are
    probed against a Bloom filter of the qualifying customer keys BEFORE
    the exact semi join, so at scale the shuffle carries only
    bloom-survivors. No false negatives -> the final result equals a
    plain semi join; the per-status candidate counts (incl. deterministic
    false positives) are themselves oracle-replayed, so the pruning rate
    is verified, not just the end result."""
    from gos2_spark.pipeline.bloom import bloom_build, bloom_probe_flat

    m, g = 4096, 3
    cust = _load(spark, sf_dir, "customer").where(
        F.col("c_custkey") % 3 == 0
    )
    dims = cust.select(F.col("c_custkey").cast("string").alias("bkey"))
    filt = bloom_build(dims, "bkey", m, g)
    orders = _load(spark, sf_dir, "orders").withColumn(
        "bkey", F.col("o_custkey").cast("string")
    )
    cand = bloom_probe_flat(orders, filt, "bkey", m, g).where("maybe_seen")
    matched = cand.join(
        cust.select(F.col("c_custkey").alias("o_custkey")),
        "o_custkey",
        "left_semi",
    )
    c = (
        cand.groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_candidates"))
    )
    mm = matched.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_matched"),
        F.sum("o_orderkey").alias("matched_key_sum"),
    )
    tot = orders.groupBy("o_orderstatus").agg(F.count("*").alias("n_orders"))
    return (
        tot.join(c, "o_orderstatus").join(mm, "o_orderstatus")
        .orderBy("o_orderstatus")
    )


def _bloom_semi_oracle_sql(m: int = 4096, g: int = 3) -> str:
    from gos2_spark.pipeline.duckdb_oracles import xxh64_list_sql

    def pm(h: str) -> str:
        return f"(((({h}) % {m}) + {m}) % {m})"

    hashes = xxh64_list_sql("[bkey, bkey || '#2']")
    return f"""
        WITH dims AS (
          SELECT CAST(c_custkey AS VARCHAR) AS bkey FROM customer
          WHERE c_custkey % 3 = 0
        ),
        ords AS (
          SELECT o_orderkey, o_custkey, o_orderstatus,
                 CAST(o_custkey AS VARCHAR) AS bkey
          FROM orders
        ),
        allk AS (
          SELECT bkey FROM dims UNION SELECT bkey FROM ords
        ),
        h AS (SELECT bkey, ({hashes}) AS hs FROM allk),
        hm AS (SELECT bkey, {pm('hs[1]')} AS h1, {pm('hs[2]')} AS h2 FROM h),
        ps AS (
          SELECT bkey, (h1 + i * h2) % {m} AS pos
          FROM hm, (SELECT unnest(generate_series(0, {g - 1})) AS i)
        ),
        words AS (
          SELECT pos // 63 AS word_idx,
                 bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INT)) AS word
          FROM (SELECT DISTINCT pos FROM ps
                WHERE bkey IN (SELECT bkey FROM dims))
          GROUP BY 1
        ),
        seen AS (
          SELECT p.bkey,
                 bool_and(coalesce(
                     (w.word & (CAST(1 AS BIGINT)
                                << CAST(p.pos % 63 AS INT))) <> 0,
                     false)) AS maybe_seen
          FROM ps p LEFT JOIN words w ON p.pos // 63 = w.word_idx
          GROUP BY 1
        ),
        cand AS (
          SELECT o.* FROM ords o JOIN seen s USING (bkey)
          WHERE s.maybe_seen
        ),
        mtc AS (
          SELECT c.* FROM cand c
          WHERE c.o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0)
        )
        SELECT t.o_orderstatus,
               CAST(t.n AS BIGINT) AS n_orders,
               CAST(c.n AS BIGINT) AS n_candidates,
               CAST(m2.n AS BIGINT) AS n_matched,
               CAST(m2.ks AS BIGINT) AS matched_key_sum
        FROM (SELECT o_orderstatus, count(*) AS n FROM ords GROUP BY 1) t
        JOIN (SELECT o_orderstatus, count(*) AS n FROM cand GROUP BY 1) c
          USING (o_orderstatus)
        JOIN (SELECT o_orderstatus, count(*) AS n, sum(o_orderkey) AS ks
              FROM mtc GROUP BY 1) m2
          USING (o_orderstatus)
        ORDER BY o_orderstatus
    """


def _q_webmercator_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-Mercator slippy tiles + Bing quadkeys at z=5 over the customer
    points (spark/webmercator.py — the XYZ scheme map servers speak,
    alongside the S2 index). Pure codegen column algebra; the oracle
    replays the OSM formulas and the quadkey bit interleave in SQL."""
    from gos2_spark.spark.webmercator import wm_quadkey, wm_tile_x, wm_tile_y

    z = 5
    pts = _cust_points(spark, sf_dir)
    t = pts.select(
        wm_tile_x(F.col("lng"), z).alias("xt"),
        wm_tile_y(F.col("lat"), z).alias("yt"),
    ).withColumn("quadkey", wm_quadkey("xt", "yt", z))
    return (
        t.groupBy("xt", "yt", "quadkey")
        .agg(F.count("*").alias("n"))
        .orderBy("xt", "yt")
    )


def _webmercator_oracle_sql(z: int = 5) -> str:
    n = 1 << z
    pi = repr(math.pi)
    return f"""
        WITH pts AS ({_CUST_LATLNG_SQL}),
        t0 AS (
          SELECT CAST(floor((lng + 180.0) / 360.0 * {n}) AS BIGINT) AS x0,
                 CAST(floor((1.0 - ln(tan(radians(lat))
                             + 1.0 / cos(radians(lat))) / {pi})
                            / 2.0 * {n}) AS BIGINT) AS y0
          FROM pts
        ),
        t AS (
          SELECT greatest(0, least({n - 1}, x0)) AS xt,
                 greatest(0, least({n - 1}, y0)) AS yt
          FROM t0
        ),
        q AS (
          SELECT xt, yt,
                 array_to_string(list_transform(
                     generate_series({z}, 1, -1),
                     i -> CAST((xt >> (i - 1)) % 2
                               + 2 * ((yt >> (i - 1)) % 2) AS VARCHAR)),
                     '') AS quadkey
          FROM t
        )
        SELECT xt, yt, quadkey, CAST(count(*) AS BIGINT) AS n
        FROM q GROUP BY 1, 2, 3 ORDER BY xt, yt
    """


def _q_geohash_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash interop key (spark/geohash.py): per-4-char-geohash counts
    over the customer points — one codegen expression, one shuffle. The
    oracle replays the fixed-point interleave + base-32 emit in SQL."""
    from gos2_spark.spark.geohash import geohash

    pts = _cust_points(spark, sf_dir)
    return (
        pts.select(geohash("lat", "lng", 4).alias("gh"))
        .groupBy("gh")
        .agg(F.count("*").alias("n"))
        .orderBy("gh")
    )


def _geohash_oracle_sql(length: int = 4) -> str:
    from gos2_spark.spark.geohash import BASE32

    bits = 5 * length
    assert bits % 2 == 0, "oracle covers the even-length path"
    p = bits // 2

    def axis(col, off, span):
        n = 1 << p
        return (
            f"greatest(0, least({n - 1}, "
            f"CAST(floor(({col} + {off!r}) / {span!r} * {n}) AS BIGINT)))"
        )

    lng_e = axis("lng", 180.0, 360.0)
    lat_e = axis("lat", 90.0, 180.0)
    v = (
        f"list_sum(list_transform(generate_series(0, {p - 1}), i ->"
        f" ((({lng_e}) >> i) % 2) * (CAST(1 AS BIGINT) << (2 * i + 1))"
        f" + ((({lat_e}) >> i) % 2) * (CAST(1 AS BIGINT) << (2 * i))))"
    )
    gh = (
        f"array_to_string(list_transform(generate_series({length - 1}, 0, -1),"
        f" j -> substr('{BASE32}',"
        f" CAST((({v}) >> (5 * j)) % 32 AS INT) + 1, 1)), '')"
    )
    return f"""
        WITH pts AS ({_CUST_LATLNG_SQL})
        SELECT {gh} AS gh, CAST(count(*) AS BIGINT) AS n
        FROM pts GROUP BY 1 ORDER BY gh
    """


def _mix_oracle_sql() -> str:
    from gos2_spark.pipeline.duckdb_oracles import xxh64_list_sql

    h = f"({xxh64_list_sql('[CAST(doc_id AS VARCHAR)]')})[1]"
    budget = (
        "CASE "
        + " ".join(
            f"WHEN lang = '{k}' THEN {v}"
            for k, v in sorted(_MIX_BUDGETS.items())
        )
        + " ELSE 0 END"
    )
    return f"""
        WITH h AS (
          SELECT doc_id, lang, length(text) AS lc, {h} AS hv
          FROM documents
        ),
        r AS (
          SELECT *, row_number() OVER (
              PARTITION BY lang ORDER BY hv, doc_id) AS rk
          FROM h
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_kept,
               CAST(sum(doc_id) AS BIGINT) AS key_sum,
               CAST(sum(lc) AS BIGINT) AS kept_chars
        FROM r WHERE rk <= {budget}
        GROUP BY lang ORDER BY lang
    """


def _q_cell_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Focal (neighborhood) hotspot detection on the level-8 grid: each
    occupied cell's focal sum = own count + its 4 edge neighbors' counts
    (raster focal/Getis-Ord-style primitive). PUSH formulation — every
    cell explodes its count to itself + neighbors (bounded 5x Generate),
    one (cell) agg, co-partitioned join back; equals the PULL definition
    because edge adjacency is symmetric (incl. cross-face wrap). The
    oracle PULLS via the exact SQL neighbor arithmetic, so any asymmetry
    or wrap bug fails the compare. The per-cell counts feed BOTH the push
    explode and the join-back, so they are materialized once
    (checkpoint-dir-aware) — without it Catalyst re-executes the whole
    scan + encode per consumer (pinned by the plan-shape test)."""
    from gos2_spark.pipeline.graph import _default_materialize
    from gos2_spark.spark.functions import s2_edge_neighbors, s2_token
    from gos2_spark.spark.pages import s2_parent_sql

    pts = _cust_points(spark, sf_dir)
    counts = _default_materialize(spark)(
        pts.groupBy(s2_parent_sql(F.col("cell_id"), 8).alias("cell")).agg(
            F.count("*").alias("n")
        )
    )
    targets = counts.select(
        "n",
        F.explode(
            F.concat(F.array(F.col("cell")), s2_edge_neighbors(F.col("cell")))
        ).alias("target"),
    )
    focal = targets.groupBy("target").agg(F.sum("n").alias("focal_sum"))
    return (
        counts.join(focal, counts["cell"] == focal["target"])
        .select(
            s2_token(F.col("cell")).alias("token"),
            "n",
            "focal_sum",
            (F.col("focal_sum") >= 5).alias("hot"),
        )
        .orderBy("token")
    )


def _q_streaming_geofence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming geofence (spark/streaming.py::
    streaming_geofence_transitions, applyInPandasWithState): the event
    stream is replayed in TWO phases split at the median timestamp, with
    a full query RESTART between them — per-user last-fence state must
    survive via the state-store checkpoint or cross-phase transitions are
    lost. The aggregated transition matrix must equal the batch window
    oracle exactly (same SQL as geofence_transitions)."""
    import shutil
    import tempfile

    from gos2_spark.spark.streaming import streaming_geofence_transitions

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    lat = (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat")
    lng = (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng")
    pts = ev.select("user_id", "ts", "event_id", lat, lng)
    ts_long = F.col("ts").cast("timestamp_ltz").cast("long")
    m = pts.agg(
        F.percentile(ts_long, F.lit(0.5)).alias("m")
    ).collect()[0]["m"]

    base = tempfile.mkdtemp(prefix="gos2_stream_geofence_")
    src, chk, out = f"{base}/src", f"{base}/chk", f"{base}/out"
    tiles = _tileset(32)

    def drain():
        sch = spark.read.parquet(src).schema
        stream = spark.readStream.schema(sch).parquet(src)
        res = streaming_geofence_transitions(stream, tiles)
        q = (
            res.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", chk)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        pts.where(ts_long <= m).write.mode("append").parquet(src)
        drain()
        pts.where(ts_long > m).write.mode("append").parquet(src)
        drain()
        names = F.array(
            F.lit("none"), *[F.lit(str(t)) for t in tiles.tile_ids()]
        )
        trans = spark.read.parquet(out).select(
            "user_id",
            F.element_at(names, F.col("from_idx") + 2).alias("from_fence"),
            F.element_at(names, F.col("to_idx") + 2).alias("to_fence"),
        )
        result = (
            trans.groupBy("from_fence", "to_fence")
            .agg(
                F.count("*").alias("n_transitions"),
                F.countDistinct("user_id").alias("n_users"),
            )
            .orderBy("from_fence", "to_fence")
        )
        rows = result.collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, result.schema).orderBy(
        "from_fence", "to_fence"
    )


def _q_gps_speed_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPS noise gate (trajectory cleaning): per-user ordered legs get a
    speed = great-circle-distance / elapsed-time, and physically
    impossible legs (teleports: speed above a rad/s ceiling, or
    non-increasing timestamps) are flagged. The standard pre-filter
    before any trajectory analytics at crawl scale. Elapsed time is
    microsecond INTEGER arithmetic (timestampdiff on the NTZ epoch,
    matching DuckDB epoch_us with no session-timezone dependence) so
    agree bit-for-bit; distance is the engine haversine
    (latlng.go:32-40 op order). One user-keyed window shuffle, pure
    codegen."""
    from pyspark.sql import Window

    from gos2_spark.spark.functions import haversine_rad

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    pts = ev.select(
        "user_id",
        "ts",
        "event_id",
        (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
        (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    legs = pts.select(
        "user_id",
        haversine_rad(
            F.lag("lat").over(w), F.lag("lng").over(w), F.col("lat"), F.col("lng")
        ).alias("leg"),
        (us - F.lag(us).over(w)).alias("dt_us"),
    ).where(F.col("dt_us").isNotNull())
    speed = F.col("leg") / (F.col("dt_us").cast("double") / 1e6)
    flagged = (F.col("dt_us") <= 0) | (speed > 0.004)
    return (
        legs.select("user_id", speed.alias("speed"), flagged.alias("bad"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_legs"),
            F.sum(F.col("bad").cast("long")).alias("n_flagged"),
            F.round(F.max("speed"), 9).alias("max_speed_rps"),
        )
        .orderBy("user_id")
    )


def _q_od_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Origin-destination flow matrix (mobility OLAP): per (user, day)
    the first and last event become a trip; trips aggregate into flows
    between level-4 S2 cells. Day keys are integer microsecond division
    (timezone-free), cell keys the pure-SQL Hilbert encode. Plan: ONE
    map-side-combinable min_by/max_by aggregation per (user, day) —
    never a row_number window over the raw events — then the cell
    projection and one (o_cell, d_cell) agg."""
    from gos2_spark.spark.functions import add_cellid_sql
    from gos2_spark.spark.pages import s2_parent_sql

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    us = F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    pts = ev.select(
        "user_id",
        "event_id",
        F.floor(us / 86_400_000_000).alias("day_idx"),
        F.struct(us.alias("us"), F.col("event_id").alias("eid")).alias("ord"),
        (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
        (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
    )
    trips = pts.groupBy("user_id", "day_idx").agg(
        F.min_by("lat", "ord").alias("olat"),
        F.min_by("lng", "ord").alias("olng"),
        F.max_by("lat", "ord").alias("dlat"),
        F.max_by("lng", "ord").alias("dlng"),
    )
    o = add_cellid_sql(trips, "olat", "olng", "o_leaf")
    od = add_cellid_sql(o, "dlat", "dlng", "d_leaf").select(
        "user_id",
        s2_parent_sql(F.col("o_leaf"), 4).alias("o_cell4"),
        s2_parent_sql(F.col("d_leaf"), 4).alias("d_cell4"),
    )
    return (
        od.groupBy("o_cell4", "d_cell4")
        .agg(
            F.count("*").alias("n_trips"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("o_cell4", "d_cell4")
    )


def _q_colocation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatiotemporal encounter detection (spark/temporal.py
    colocation_join): pairs of events from different users within 900 s
    AND 0.3 rad — the contact-tracing / convoy-mining primitive. The
    engine meets candidates on a time-bucket EQUI join (home ± 1 probe
    explode, each pair produced exactly once); the oracle runs the naive
    O(n^2) inequality join in DuckDB, so the bucket decomposition's
    completeness is value-checked. Users are subset (user_id < 75) to
    bound the oracle's quadratic replay."""
    from gos2_spark.spark.temporal import colocation_join

    ev = _load(spark, sf_dir, "events").where(F.col("user_id") < 75)
    e = F.col("event_id")
    pts = ev.select(
        "user_id",
        "ts",
        "event_id",
        (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
        (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
    )
    out = colocation_join(pts, window_seconds=900, radius_rad=0.3)
    return out.select(
        "id_a",
        "id_b",
        "key_a",
        "key_b",
        "dt_us",
        F.round("dist_rad", 9).alias("dist_rad"),
    ).orderBy("id_a", "id_b")


def _q_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle counting + local clustering coefficient over the
    synthetic 64-node link graph (pipeline/graph.py triangle_count):
    degree-ordered orientation bounds the wedge join at O(m^1.5) even on
    hub-heavy graphs. The oracle is the NAIVE canonical 3-way self-join
    in DuckDB — fully independent of the engine's orientation scheme, so
    the optimization is value-checked, not assumed."""
    from gos2_spark.pipeline.graph import triangle_count

    c = _load(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    edges = c.select((k % 64).alias("src"), ((k * 11 + 5) % 64).alias("dst")).union(
        c.select((k % 64).alias("src"), ((k * 7 + 3) % 64).alias("dst"))
    )
    out = triangle_count(edges)
    return out.select(
        "node",
        "degree",
        "n_triangles",
        F.round("clustering_coeff", 9).alias("clustering_coeff"),
    ).orderBy("node")


def _q_inverted_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build (pipeline/retrieval.py inverted_index): per-term
    document frequency, collection frequency, and the bounded posting-list
    head (top-5 docs by tf desc, doc asc, rendered key:tf). One map-side-
    combined (term, doc) agg + one term-keyed agg; top-40 terms leave via
    a distributed TakeOrderedAndProject, never a vocab-wide window."""
    from gos2_spark.pipeline.retrieval import inverted_index

    docs = _load(spark, sf_dir, "documents")
    idx = inverted_index(docs, head_k=5)
    return idx.orderBy(F.desc("df"), "token").limit(40).select(
        "token", "df", "cf", "postings_head"
    )


_BM25_QUERIES = [
    (1, "spark window agg"),
    (2, "hash join table"),
    (3, "fast scan filter vector"),
]


def _q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 retrieval (pipeline/retrieval.py bm25_topk) for three
    broadcast literal queries. Per-(doc, term) contributions snap to a
    1e-9 integer grid BEFORE the per-document sum, so the score is an
    exact bigint — rank order is invariant to float summation order and
    the DuckDB oracle replays it bit-for-bit."""
    from gos2_spark.pipeline.retrieval import bm25_topk

    docs = _load(spark, sf_dir, "documents")
    out = bm25_topk(docs, _BM25_QUERIES, k=10)
    return out.select(
        "query_id", "rank", F.col("key").alias("doc_id"), "score_e9"
    ).orderBy("query_id", "rank")


def _bm25_oracle_sql(k: int = 10) -> str:
    """Replay bm25_topk with the engine's exact float-op order: constants
    embedded as reprs of the same Python arithmetic the Column tree uses
    (k1+1, 1-b) so both engines evaluate identical IEEE expressions."""
    k1, b = 1.2, 0.75
    num_c = repr(k1 + 1.0)
    one_minus_b = repr(1.0 - b)
    vals = ", ".join(
        f"({qid}, '{t}')"
        for qid, text in _BM25_QUERIES
        for t in sorted(set(text.split()))
    )
    terms = sorted({t for _, text in _BM25_QUERIES for t in text.split()})
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
        WITH toks AS (
          SELECT doc_id AS key, t AS token
          FROM documents, LATERAL unnest(list_filter(
               regexp_split_to_array(lower(text), '[^a-z]+'),
               x -> len(x) > 0)) AS u(t)
        ),
        dl AS (SELECT key, count(*) AS dl FROM toks GROUP BY 1),
        stats AS (
          SELECT count(*) AS n_docs, sum(dl) AS total_tokens FROM dl
        ),
        q(query_id, token) AS (VALUES {vals}),
        tf AS (
          SELECT key, token, count(*) AS tf FROM toks
          WHERE token IN ({in_list}) GROUP BY 1, 2
        ),
        dft AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        contrib AS (
          SELECT q.query_id, tf.key,
                 CAST(round(
                   ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE)
                             + 0.5) / (CAST(df AS DOUBLE) + 0.5))
                   * ((CAST(tf AS DOUBLE) * {num_c})
                      / (CAST(tf AS DOUBLE)
                         + 1.2 * ({one_minus_b}
                                  + (0.75 * CAST(dl AS DOUBLE))
                                    / (CAST(total_tokens AS DOUBLE)
                                       / CAST(n_docs AS DOUBLE)))))
                   * 1e9, 0) AS BIGINT) AS c
          FROM tf
          JOIN dft USING (token)
          JOIN q USING (token)
          JOIN dl USING (key), stats
        ),
        scores AS (
          SELECT query_id, key, CAST(sum(c) AS BIGINT) AS score_e9
          FROM contrib GROUP BY 1, 2
        ),
        ranked AS (
          SELECT CAST(query_id AS BIGINT) AS query_id,
                 CAST(row_number() OVER (
                     PARTITION BY query_id
                     ORDER BY score_e9 DESC, key) AS INT) AS rank,
                 key AS doc_id, score_e9
          FROM scores
        )
        SELECT * FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
    """


def _q_anchor_text_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text aggregation (pipeline/web.py extract_anchor_pairs): how
    the web DESCRIBES each target host — the classic anchor-text indexing
    signal. Synthetic html carries each doc's first two words as the
    anchor of an absolute link (plus a relative link that must drop);
    the engine regex-parses (href, anchor) pairs in codegen, explodes
    anchor terms, and ranks the top-3 terms per target host. The oracle
    re-derives the truth from the construction arithmetic — the engine
    must earn it by actually parsing the html."""
    from pyspark.sql import Window

    from gos2_spark.pipeline.web import extract_anchor_pairs, url_host

    docs = _load(spark, sf_dir, "documents")
    d = F.col("doc_id")
    words = F.filter(
        F.split(F.lower(F.col("text")), r"[^a-z]+"),
        lambda t: F.length(t) > 0,
    )
    anchor = F.concat_ws(" ", F.slice(words, 1, 2))
    html = F.concat(
        F.lit('<p><a href="https://site'),
        ((d * 7) % 20).cast("string"),
        F.lit('.example/p">'),
        anchor,
        F.lit('</a> and <a href="/relative">skip me</a></p>'),
    )
    pairs = docs.select(html.alias("html")).select(
        F.explode(extract_anchor_pairs(F.col("html"))).alias("pr")
    )
    toks = pairs.select(
        url_host(F.col("pr.href")).alias("dst_host"),
        F.explode(
            F.filter(
                F.split(F.col("pr.anchor"), " "), lambda t: F.length(t) > 0
            )
        ).alias("term"),
    ).where(F.col("dst_host") != "")
    counts = toks.groupBy("dst_host", "term").agg(F.count("*").alias("n"))
    w = Window.partitionBy("dst_host").orderBy(F.desc("n"), "term")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("dst_host", F.col("rk").cast("int").alias("rk"), "term", "n")
        .orderBy("dst_host", "rk")
    )


def _q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM document scoring with add-one smoothing — the 2-gram
    upgrade of unigram_logprob (the CCNet/KenLM-style LM-quality signal):
    lp(w1 w2) = ln((c(w1,w2)+1)/(c(w1)+V)). Adjacent pairs come from ONE
    arrays_zip of two slices (no window shuffle); corpus bigram/unigram
    tables are map-side-combined; AQE broadcasts them when small."""
    docs = _load(spark, sf_dir, "documents")
    arr = F.filter(
        F.split(F.lower(F.col("text")), r"[^a-z]+"),
        lambda t: F.length(t) > 0,
    )
    d = docs.select("doc_id", arr.alias("w")).where(F.size("w") >= 2)
    n = F.size("w")
    bg = d.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("w", 1, n - 1).alias("w1"),
                F.slice("w", 2, n - 1).alias("w2"),
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    uni = d.select(F.explode("w").alias("w1"))
    c1 = uni.groupBy("w1").agg(F.count("*").alias("c1"))
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    v = c1.agg(F.count("*").alias("v"))
    lp = F.log(
        (F.col("c2").cast("double") + 1.0)
        / (F.col("c1").cast("double") + F.col("v").cast("double"))
    )
    return (
        bg.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.sum(lp) / F.count("*"), 6).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


_NF_FEATURES = [
    (0, [(40.7, -74.0), (42.0, -70.0), (38.5, -71.0)]),   # nyc triangle
    (1, [(51.5, -0.1), (53.0, 4.0), (49.0, 2.5)]),        # london triangle
    (2, [(35.7, 139.7), (37.5, 143.0), (33.0, 141.5)]),   # tokyo triangle
]


def _q_nearest_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-feature join (spark/joins.py nearest_feature_join): every
    customer point classified to its closest polygon boundary (exact
    min-over-edges DistanceToEdge, argmin over features; ties to lowest
    id) — the ClosestEdgeQuery-against-a-collection primitive. One Arrow
    round-trip, zero shuffles. The oracle replays every edge distance
    with the identical SQL formula and the same <=-chain argmin."""
    from gos2_spark.spark.joins import nearest_feature_join

    pts = _cust_points(spark, sf_dir)
    out = nearest_feature_join(pts, _NF_FEATURES)
    return out.select(
        "key",
        "nearest_fid",
        F.round("nearest_dist_rad", 9).alias("nearest_dist_rad"),
    ).orderBy("key")


def _nearest_feature_oracle_sql() -> str:
    """Brute-force replay of nearest_feature_join: per-feature least()
    over the same _seg_dist_sql formulas (closing edge included), argmin
    via a <=-chain so ties break to the lowest feature id exactly like
    np.argmin."""
    ds = []
    for _, way in _NF_FEATURES:
        w = [_xyz(*p) for p in way]
        segs = [_seg_dist_sql(a, b) for a, b in zip(w[:-1], w[1:])]
        segs.append(_seg_dist_sql(w[-1], w[0]))
        ds.append("least(" + ", ".join(segs) + ")")
    fid = (
        "CASE WHEN d0 <= d1 AND d0 <= d2 THEN 0 "
        "WHEN d1 <= d2 THEN 1 ELSE 2 END"
    )
    return f"""
        WITH pts AS ({_CUST_LATLNG_SQL}),
        xyz AS (
          SELECT key,
                 cos(radians(lng)) * cos(radians(lat)) AS x,
                 sin(radians(lng)) * cos(radians(lat)) AS y,
                 sin(radians(lat)) AS z
          FROM pts
        ),
        d AS (
          SELECT key, {ds[0]} AS d0, {ds[1]} AS d1, {ds[2]} AS d2 FROM xyz
        )
        SELECT key,
               CAST({fid} AS BIGINT) AS nearest_fid,
               round(least(d0, d1, d2), 9) AS nearest_dist_rad
        FROM d ORDER BY key
    """


def _q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-20 adjacent word pairs by pointwise mutual
    information, min pair count 5. Ranking uses the RATIONAL value
    (c12 * N) / (c1 * c2) — integer-derived IEEE division is correctly
    rounded, so cross-engine ORDER BY is exact (the tfidf_top_terms
    trick); only the reported ln() is rounded. Distributed top-k via
    TakeOrderedAndProject, never a vocab-wide window."""
    docs = _load(spark, sf_dir, "documents")
    arr = F.filter(
        F.split(F.lower(F.col("text")), r"[^a-z]+"),
        lambda t: F.length(t) > 0,
    )
    d = docs.select(arr.alias("w")).where(F.size("w") >= 2)
    n = F.size("w")
    bg = d.select(
        F.explode(
            F.arrays_zip(
                F.slice("w", 1, n - 1).alias("w1"),
                F.slice("w", 2, n - 1).alias("w2"),
            )
        ).alias("b")
    ).select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    uni = d.select(F.explode("w").alias("t"))
    c1 = uni.groupBy("t").agg(F.count("*").alias("c"))
    tot = uni.agg(F.count("*").alias("n_tok"))
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    j = (
        c2.join(
            F.broadcast(c1.select(F.col("t").alias("w1"), F.col("c").alias("ca"))),
            "w1",
        )
        .join(
            F.broadcast(c1.select(F.col("t").alias("w2"), F.col("c").alias("cb"))),
            "w2",
        )
        .crossJoin(F.broadcast(tot))
        .where(F.col("c12") >= 5)
    )
    r = (F.col("c12") * F.col("n_tok")).cast("double") / (
        F.col("ca") * F.col("cb")
    ).cast("double")
    return (
        j.select(
            "w1",
            "w2",
            F.col("c12").alias("n_pair"),
            r.alias("_r"),
            F.round(F.log(r), 6).alias("pmi"),
        )
        .orderBy(F.desc("_r"), "w1", "w2")
        .limit(20)
        .drop("_r")
    )


def _q_hopping_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) window aggregation via Spark's NATIVE
    F.window(6h, 2h): each event lands in exactly 3 epoch-aligned
    windows; per (event_type, window) count + value sum. The same
    expression drives Structured Streaming windowed aggs — this pins the
    batch semantics (window assignment, alignment, inclusive start /
    exclusive end) against a DuckDB replay of the window arithmetic.
    Window starts are reported as NTZ-epoch microseconds (timezone-free)."""
    ev = _load(spark, sf_dir, "events")
    win = F.window("ts", "6 hours", "2 hours")
    out = ev.groupBy(F.col("event_type"), win.alias("win")).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("value_sum"),
    )
    ws = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', win.start)"
    )
    return out.select(
        "event_type", ws.alias("win_start_us"), "n_events", "value_sum"
    ).orderBy("event_type", "win_start_us")


def _q_cap_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user bounding cap (spark/aggregates.py cap_bound_per_key): the
    distributed CapBound analogue — centroid axis + max-angle radius in
    two map-side-combined aggregations. Complements the wrap-aware rect
    bound aggregate (nation_bounding_rects). The oracle replays the
    3-vector mean, the normalization-free atan2 angle, and the max in
    SQL; means are float-sum-order sensitive, so reported values round
    to 6 (the established centroid practice)."""
    from gos2_spark.spark.aggregates import cap_bound_per_key

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    pts = ev.select(
        "user_id",
        (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
        (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
    )
    out = cap_bound_per_key(pts, key_col="user_id")
    return out.select(
        F.col("key").alias("user_id"),
        "n_pts",
        F.round("axis_lat", 6).alias("axis_lat"),
        F.round("axis_lng", 6).alias("axis_lng"),
        F.round("radius_rad", 6).alias("radius_rad"),
    ).orderBy("user_id")


def _q_link_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS over the host link graph (pipeline/graph.py
    bfs_hops): shortest hop distance from two seed hosts via
    level-synchronous frontier expansion — one frontier-keyed shuffle join
    plus one visited anti-join per round, O(diameter) rounds, lineage
    truncated per round. The oracle replays it as a depth-capped recursive
    CTE with min-hop aggregation (equivalent because the cap exceeds the
    graph's eccentricity)."""
    from gos2_spark.pipeline.graph import bfs_hops
    from gos2_spark.pipeline.web import extract_links, url_host

    docs = _load(spark, sf_dir, "documents")
    d = F.col("doc_id")
    k, m, base = _messy_url_parts(d)
    html = F.concat(
        F.lit('<html><body><a href="https://site'),
        ((d * 7) % 20).cast("string"),
        F.lit(".example/p/"),
        m,
        F.lit('">x</a> <a href="/local">l</a> <a href="https://site'),
        ((d * 11) % 20).cast("string"),
        F.lit('.example/q">y</a></body></html>'),
    )
    pages = docs.select(base.alias("url"), html.alias("html"))
    links = pages.select(
        url_host(F.col("url")).alias("src_host"),
        F.explode(extract_links(F.col("html"))).alias("href"),
    )
    edges = links.select(
        "src_host", url_host(F.col("href")).alias("dst_host")
    ).where(F.col("dst_host") != "")
    seeds = spark.createDataFrame(
        [("site0.example",), ("site1.example",)], "host string"
    )
    out = bfs_hops(
        edges, seeds, src_col="src_host", dst_col="dst_host",
        node_col="host", max_hops=8,
    )
    return out.select("host", F.col("hops").cast("long").alias("hops")).orderBy(
        "host"
    )


_LINK_EDGES_CTE = """
            pages AS (
              SELECT 'site' || (doc_id % 20)::VARCHAR || '.example' AS src_host,
                     '<html><body><a href="https://site' || ((doc_id * 7) % 20)::VARCHAR
                       || '.example/p/' || (doc_id % 125)::VARCHAR
                       || '">x</a> <a href="/local">l</a> <a href="https://site'
                       || ((doc_id * 11) % 20)::VARCHAR
                       || '.example/q">y</a></body></html>' AS html
              FROM documents
            ),
            links AS (
              SELECT src_host,
                     unnest(regexp_extract_all(html, 'href="([^"]*)"', 1)) AS href
              FROM pages
            ),
            edges AS (
              SELECT DISTINCT src_host,
                     lower(regexp_extract(href,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)', 1)) AS dst_host
              FROM links
              WHERE lower(regexp_extract(href,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)', 1)) <> ''
            )
"""


def _sssp_oracle_sql(rounds: int = 8) -> str:
    """Unroll pipeline/graph.py sssp_relax as chained min-plus CTEs over
    the weighted host link graph (weights = 1 + (3*len(src)+len(dst)) % 7,
    pure integers)."""
    parts = [
        "WITH",
        _LINK_EDGES_CTE + ",",
        """
            we AS (
              SELECT src_host, dst_host,
                     1 + (3 * length(src_host) + length(dst_host)) % 7 AS w
              FROM edges
            ),
            r0 AS (
              SELECT host, CAST(0 AS BIGINT) AS cost
              FROM (VALUES ('site0.example'), ('site1.example')) s(host)
            )
        """,
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
            r{i} AS (
              SELECT host, min(cost) AS cost FROM (
                SELECT host, cost FROM r{i - 1}
                UNION ALL
                SELECT we.dst_host AS host, r{i - 1}.cost + we.w AS cost
                FROM r{i - 1} JOIN we ON we.src_host = r{i - 1}.host
              ) GROUP BY host
            )
        """
        )
    parts.append(
        f"SELECT host, CAST(cost AS BIGINT) AS cost FROM r{rounds} ORDER BY host"
    )
    return "\n".join(parts)


def _cities_values_sql() -> str:
    """VALUES rows for the 6 synthetic-corpus cities (name, lat, lng)."""
    from gos2_spark.spark.pages import CITIES

    return ", ".join(f"('{n}', {la!r}, {ln!r})" for n, la, ln, _w in CITIES)


def _q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-event funnel (view -> click -> purchase): per user, the
    first view, the first click strictly after it, and the first purchase
    strictly after that. Three chained min-aggregations, ALL keyed on
    user_id — on a bucketed events table every step reuses one
    co-partitioning, and each step's input is pre-filtered to one event
    type so the joins shrink monotonically. Timestamps compare as exact
    microsecond integers (the NTZ-epoch arithmetic shared with the other
    temporal queries); absent steps surface as -1 sentinels, never NULL
    BIGINTs."""
    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    e = ev.select("user_id", "event_type", us.alias("us"))
    t1 = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t1_us"))
    )
    t2 = (
        e.where(F.col("event_type") == "click")
        .join(t1, "user_id")
        .where(F.col("us") > F.col("t1_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2_us"))
    )
    t3 = (
        e.where(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .where(F.col("us") > F.col("t2_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3_us"))
    )
    steps = (
        F.lit(1)
        + F.col("t2_us").isNotNull().cast("int")
        + F.col("t3_us").isNotNull().cast("int")
    )
    return (
        t1.join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
        .select(
            "user_id",
            "t1_us",
            steps.cast("long").alias("steps"),
            F.coalesce("t2_us", F.lit(-1)).alias("t2_us"),
            F.coalesce("t3_us", F.lit(-1)).alias("t3_us"),
        )
        .orderBy("user_id")
    )


def _q_idw_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-distance-weighted spatial interpolation: estimate a field
    value at each of the 6 synthetic-corpus city locations from all event
    points within 0.5 rad, weight 1/(1e-3 + d)^2 with the engine's
    haversine (latlng.go:32-40 op order). Query sites are a broadcast
    literal explode — the degenerate form a 10^12-point IDW takes after a
    covering-cell prefilter (route_proximity's 5x5 trick) bounds each
    site's candidate set; zero shuffles before the final per-site rollup.
    n_pts gates the distance filter exactly; the weighted mean is reported
    rounded (float-sum-order, the established centroid practice)."""
    from gos2_spark.spark.functions import haversine_rad
    from gos2_spark.spark.pages import CITIES

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    pts = ev.select(
        "value",
        (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
        (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
    )
    cities = F.array(
        *[
            F.struct(
                F.lit(n).alias("city"),
                F.lit(la).alias("clat"),
                F.lit(ln).alias("clng"),
            )
            for n, la, ln, _w in CITIES
        ]
    )
    x = pts.select("value", "lat", "lng", F.explode(cities).alias("c"))
    d = haversine_rad(
        F.col("lat"), F.col("lng"), F.col("c.clat"), F.col("c.clng")
    )
    w = 1.0 / ((d + F.lit(1e-3)) * (d + F.lit(1e-3)))
    y = x.where(d < 0.5).select(
        F.col("c.city").alias("city"),
        w.alias("w"),
        (w * F.col("value")).alias("wv"),
    )
    return (
        y.groupBy("city")
        .agg(
            F.count("*").alias("n_pts"),
            F.round(F.sum("wv") / F.sum("w"), 6).alias("idw_value"),
        )
        .orderBy("city")
    )


def _q_value_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS trend of event value over time: slope/intercept from
    sufficient statistics (n, Σx, Σx², Σy, Σxy) in ONE map-side-combined
    aggregation — the closed-form regression a 100 TB per-domain trend
    scan takes, no second pass, no window. x = integer hours since epoch,
    so n/Σx/Σx² and the variance denominator are EXACT BIGINTs; only
    Σy/Σxy are float-sum-order sensitive (reported values round to 6, the
    established practice)."""
    ev = _load(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            " div 3600000000"
        ).alias("x"),
        F.col("value").alias("y"),
    )
    s = e.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("double") * F.col("y")).alias("sxy"),
    )
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    num = F.col("n").cast("double") * F.col("sxy") - F.col("sx").cast(
        "double"
    ) * F.col("sy")
    slope = F.when(den == 0.0, F.lit(0.0)).otherwise(num / den)
    intercept = (F.col("sy") - slope * F.col("sx").cast("double")) / F.col(
        "n"
    ).cast("double")
    return s.select(
        "user_id",
        F.col("n").alias("n_events"),
        F.round(slope, 6).alias("slope_per_hour"),
        F.round(intercept, 6).alias("intercept"),
    ).orderBy("user_id")


def _link_weighted_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct host link edges with a deterministic integer weight
    (1 + (3*len(src) + len(dst)) % 7) — the SSSP cost fixture."""
    from gos2_spark.pipeline.web import extract_links, url_host

    docs = _load(spark, sf_dir, "documents")
    d = F.col("doc_id")
    k, m, base = _messy_url_parts(d)
    html = F.concat(
        F.lit('<html><body><a href="https://site'),
        ((d * 7) % 20).cast("string"),
        F.lit(".example/p/"),
        m,
        F.lit('">x</a> <a href="/local">l</a> <a href="https://site'),
        ((d * 11) % 20).cast("string"),
        F.lit('.example/q">y</a></body></html>'),
    )
    pages = docs.select(base.alias("url"), html.alias("html"))
    links = pages.select(
        url_host(F.col("url")).alias("src_host"),
        F.explode(extract_links(F.col("html"))).alias("href"),
    )
    edges = (
        links.select("src_host", url_host(F.col("href")).alias("dst_host"))
        .where(F.col("dst_host") != "")
        .distinct()
    )
    w = 1 + (
        3 * F.length("src_host") + F.length("dst_host")
    ).cast("long") % 7
    return edges.withColumn("w", w)


def _q_weighted_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted shortest paths over the host link graph (pipeline/graph.py
    sssp_relax): 8 Bellman-Ford min-plus sweeps from two seed hosts, one
    keyed edge join + one min-agg per sweep, integer costs throughout so
    every value compares exactly. The oracle unrolls the same 8 sweeps as
    chained CTEs."""
    from gos2_spark.pipeline.graph import sssp_relax

    edges = _link_weighted_edges(spark, sf_dir)
    seeds = spark.createDataFrame(
        [("site0.example",), ("site1.example",)], "host string"
    )
    out = sssp_relax(
        edges, seeds, src_col="src_host", dst_col="dst_host",
        weight_col="w", node_col="host", rounds=8,
    )
    return out.select("host", F.col("cost").cast("long").alias("cost")).orderBy(
        "host"
    )


def _q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical ranks fused with embedding cosine
    ranks by reciprocal-rank fusion, score = Σ 1/(60 + rank). Both
    candidate lists are top-20 per query; the fused score is a FIXED
    two-term expression of integer ranks (never a float aggregation), so
    both engines compute bit-identical doubles and the fused order is
    exact. Scale shape: each branch is the already-proven retrieval plan;
    the fusion itself is one (query, key)-keyed outer join over k-bounded
    rows."""
    from pyspark.sql.window import Window

    from gos2_spark.pipeline.retrieval import bm25_topk

    docs = _load(spark, sf_dir, "documents")
    emb = _load(spark, sf_dir, "embeddings")

    text = bm25_topk(docs, _BM25_QUERIES, k=20).select(
        "query_id", F.col("key").alias("doc_id"), F.col("rank").alias("r_text")
    )
    qv = emb.where(F.col("vec_id").isin([q for q, _ in _BM25_QUERIES])).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("embedding"), F.col("q_emb"),
            lambda a, b: a.cast("double") * b.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        emb.crossJoin(F.broadcast(qv))
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("doc_id"), dot.alias("s"))
    )
    wv = Window.partitionBy("query_id").orderBy(F.desc("s"), F.asc("doc_id"))
    vec = (
        scored.withColumn("r_vec", F.row_number().over(wv))
        .where(F.col("r_vec") <= 20)
        .select("query_id", "doc_id", "r_vec")
    )
    fused = text.join(vec, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        (
            F.coalesce(1.0 / (F.lit(60.0) + F.col("r_text")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(60.0) + F.col("r_vec")), F.lit(0.0))
        ).alias("rrf"),
        F.coalesce("r_text", F.lit(-1)).alias("r_text"),
        F.coalesce("r_vec", F.lit(-1)).alias("r_vec"),
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf).cast("long"))
        .where(F.col("fused_rank") <= 10)
        .select(
            "query_id", "fused_rank", "doc_id",
            F.round("rrf", 9).alias("rrf_score"), "r_text", "r_vec",
        )
        .orderBy("query_id", "fused_rank")
    )


def _q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster canonicalization: MinHash-LSH groups -> keep the
    longest document per cluster (tie: min doc_id) — the 'keep best'
    policy a curation pipeline applies after grouping. One group-keyed
    window over the (bounded) group table; all outputs exact integers."""
    from pyspark.sql.window import Window

    from gos2_spark.pipeline.dedup import minhash_dedup_groups

    docs = _load(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    groups = minhash_dedup_groups(docs, threshold=0.8)
    j = groups.join(
        docs.select(F.col("doc_id").alias("key"), "n_chars"), "key"
    )
    w = Window.partitionBy("group_key").orderBy(
        F.desc("n_chars"), F.asc("key")
    )
    ranked = j.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("group_key")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(F.when(F.col("rn") == 1, F.col("key"))).alias(
                "canonical_key"
            ),
            F.min(F.when(F.col("rn") == 1, F.col("n_chars"))).alias(
                "canonical_chars"
            ),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("group_key")
    )


def _q_morans_i(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global spatial autocorrelation (Moran's I) of per-cell point counts
    on the level-5 grid with 4-edge-neighbor weights (occupied cells
    only). The statistic decomposes into INTEGER sufficient statistics —
    N, Σx, Σx² over cells and W, Σxᵢ, Σxⱼ, Σxᵢxⱼ over directed occupied
    neighbor pairs — so both engines aggregate exact BIGINTs and only the
    final fixed-order float expression differs from zero error: the
    result is bit-identical cross-engine (no float-sum-order exposure at
    all). Scale shape: one cell agg + one bounded 4x neighbor explode +
    one co-partitioned join, then two 1-row reductions."""
    from gos2_spark.pipeline.graph import _default_materialize
    from gos2_spark.spark.functions import s2_edge_neighbors
    from gos2_spark.spark.pages import s2_parent_sql

    pts = _cust_points(spark, sf_dir)
    counts = _default_materialize(spark)(
        pts.groupBy(s2_parent_sql(F.col("cell_id"), 5).alias("cell")).agg(
            F.count("*").alias("n")
        )
    )
    pairs = counts.select(
        F.col("n").alias("xi"),
        F.explode(s2_edge_neighbors(F.col("cell"))).alias("cj"),
    )
    pj = pairs.join(
        counts.select(F.col("cell").alias("cj"), F.col("n").alias("xj")), "cj"
    )
    ps = pj.agg(
        F.count("*").alias("w_pairs"),
        F.sum("xi").alias("pi"),
        F.sum("xj").alias("pj"),
        F.sum(F.col("xi") * F.col("xj")).alias("pxy"),
    )
    cs = counts.agg(
        F.count("*").alias("n_cells"),
        F.sum("n").alias("sx"),
        F.sum(F.col("n") * F.col("n")).alias("sxx"),
    )
    j = cs.crossJoin(ps)
    xb = F.col("sx").cast("double") / F.col("n_cells").cast("double")
    num = (
        F.col("pxy").cast("double")
        - xb * F.col("pi").cast("double")
        - xb * F.col("pj").cast("double")
        + F.col("w_pairs").cast("double") * xb * xb
    )
    den = F.col("sxx").cast("double") - F.col("n_cells").cast(
        "double"
    ) * xb * xb
    morans = (
        F.col("n_cells").cast("double") / F.col("w_pairs").cast("double")
    ) * num / den
    return j.select(
        "n_cells",
        "w_pairs",
        F.round(xb, 9).alias("mean_count"),
        F.round(morans, 9).alias("morans_i"),
    )


def _q_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-round k-means over the customer point cloud
    (spark/clustering.py kmeans_fixed): smallest-k-keys init, exact
    int64 micro-degree centroid sums (order-independent aggregation), 3
    statically-unrolled Lloyd rounds — the chained-CTE oracle replays
    every assignment and update bit-for-bit."""
    from gos2_spark.spark.clustering import kmeans_fixed

    pts = _cust_points(spark, sf_dir)
    return kmeans_fixed(pts, k=8, rounds=3, point_key="key").orderBy("cid")


def _kmeans_oracle_sql(k: int = 8, rounds: int = 3, scale: int = 1_000_000) -> str:
    """Chained-CTE Lloyd replay: integer micro-degree sums, argmin via a
    (dist, cid) window rank — identical tie-break and float op order."""
    parts = [f"""
        WITH pts AS (
          SELECT key,
                 CAST(floor(lat * {scale} + 0.5) AS BIGINT) AS ilat,
                 CAST(floor(lng * {scale} + 0.5) AS BIGINT) AS ilng
          FROM ({_CUST_LATLNG_SQL})
        ),
        c0 AS (
          SELECT row_number() OVER (ORDER BY key) - 1 AS cid,
                 ilat AS slat, ilng AS slng, CAST(1 AS BIGINT) AS cnt
          FROM pts ORDER BY key LIMIT {k}
        )"""]
    prev = "c0"
    for r in range(1, rounds + 1):
        parts.append(f""",
        d{r} AS (
          SELECT p.key, p.ilat, p.ilng, c.cid,
                 (CAST(p.ilat AS DOUBLE) - CAST(c.slat AS DOUBLE) / c.cnt)
                   * (CAST(p.ilat AS DOUBLE) - CAST(c.slat AS DOUBLE) / c.cnt)
                 + (CAST(p.ilng AS DOUBLE) - CAST(c.slng AS DOUBLE) / c.cnt)
                   * (CAST(p.ilng AS DOUBLE) - CAST(c.slng AS DOUBLE) / c.cnt)
                 AS dd
          FROM pts p CROSS JOIN {prev} c
        ),
        a{r} AS (
          SELECT key, ilat, ilng, cid FROM (
            SELECT *, row_number() OVER (
              PARTITION BY key ORDER BY dd, cid) AS rn
            FROM d{r}
          ) WHERE rn = 1
        ),
        c{r} AS (
          SELECT cid, CAST(sum(ilat) AS BIGINT) AS slat,
                 CAST(sum(ilng) AS BIGINT) AS slng,
                 count(*) AS cnt
          FROM a{r} GROUP BY cid
        )""")
        prev = f"c{r}"
    parts.append(f"""
        SELECT cid, cnt AS n,
               round(CAST(slat AS DOUBLE) / cnt / {scale}, 9) AS c_lat,
               round(CAST(slng AS DOUBLE) / cnt / {scale}, 9) AS c_lng
        FROM {prev} ORDER BY cid
    """)
    return "".join(parts)


def _q_geary_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geary's C spatial autocorrelation of per-cell point counts on the
    level-5 grid with 4-edge-neighbor weights — the local-contrast
    companion to Moran's I (C weighs squared neighbor DIFFERENCES, so it
    is sensitive to local discontinuities global covariance smooths
    over). Same integer-sufficient-statistics decomposition as
    morans_i_cells: N, Σx, Σx² over cells; W, Σxᵢ², Σxⱼ², Σxᵢxⱼ over
    directed occupied neighbor pairs — exact BIGINTs both engines, one
    fixed-order float expression at the end, bit-identical cross-engine.
    C = (N-1)·Σw(xᵢ-xⱼ)² / (2W·Σ(xᵢ-x̄)²)."""
    from gos2_spark.pipeline.graph import _default_materialize
    from gos2_spark.spark.functions import s2_edge_neighbors
    from gos2_spark.spark.pages import s2_parent_sql

    pts = _cust_points(spark, sf_dir)
    counts = _default_materialize(spark)(
        pts.groupBy(s2_parent_sql(F.col("cell_id"), 5).alias("cell")).agg(
            F.count("*").alias("n")
        )
    )
    pairs = counts.select(
        F.col("n").alias("xi"),
        F.explode(s2_edge_neighbors(F.col("cell"))).alias("cj"),
    )
    pj = pairs.join(
        counts.select(F.col("cell").alias("cj"), F.col("n").alias("xj")), "cj"
    )
    ps = pj.agg(
        F.count("*").alias("w_pairs"),
        F.sum(F.col("xi") * F.col("xi")).alias("pxx"),
        F.sum(F.col("xj") * F.col("xj")).alias("pyy"),
        F.sum(F.col("xi") * F.col("xj")).alias("pxy"),
    )
    cs = counts.agg(
        F.count("*").alias("n_cells"),
        F.sum("n").alias("sx"),
        F.sum(F.col("n") * F.col("n")).alias("sxx"),
    )
    j = cs.crossJoin(ps)
    xb = F.col("sx").cast("double") / F.col("n_cells").cast("double")
    num = (
        (F.col("n_cells").cast("double") - F.lit(1.0))
        * (
            F.col("pxx").cast("double")
            + F.col("pyy").cast("double")
            - F.lit(2.0) * F.col("pxy").cast("double")
        )
    )
    den = (
        F.lit(2.0)
        * F.col("w_pairs").cast("double")
        * (
            F.col("sxx").cast("double")
            - F.col("n_cells").cast("double") * xb * xb
        )
    )
    return j.select(
        "n_cells",
        "w_pairs",
        F.round(xb, 9).alias("mean_count"),
        F.round(num / den, 9).alias("geary_c"),
    )


def _geary_oracle_sql() -> str:
    """Geary's C from the same exact integer sufficient statistics as the
    Moran oracle; final float expression mirrors the engine term for
    term."""
    from gos2_spark.pipeline import duckdb_oracles as _DO

    pairs = _DO.edge_neighbors_l8_oracle_sql(
        _cellid_cte_duckdb(_CUST_LATLNG_SQL), level=5
    )
    lsb = 1 << 50  # level 5
    tok = _DO._token(f"((cell_id & -{lsb}) | {lsb})")
    return f"""
        WITH pairs AS ({pairs}),
        {_cellid_cte_duckdb(_CUST_LATLNG_SQL)},
        cnt AS (SELECT {tok} AS token, count(*) AS n FROM cells GROUP BY 1),
        pj AS (
          SELECT c1.n AS xi, c2.n AS xj
          FROM pairs p
          JOIN cnt c1 ON c1.token = p.token
          JOIN cnt c2 ON c2.token = p.nbr_token
        ),
        ps AS (
          SELECT count(*) AS w_pairs,
                 CAST(sum(xi * xi) AS BIGINT) AS pxx,
                 CAST(sum(xj * xj) AS BIGINT) AS pyy,
                 CAST(sum(xi * xj) AS BIGINT) AS pxy
          FROM pj
        ),
        cs AS (
          SELECT count(*) AS n_cells,
                 CAST(sum(n) AS BIGINT) AS sx,
                 CAST(sum(n * n) AS BIGINT) AS sxx
          FROM cnt
        ),
        c AS (
          SELECT *,
                 CAST(sx AS DOUBLE) / CAST(n_cells AS DOUBLE) AS xb
          FROM cs, ps
        )
        SELECT n_cells, w_pairs,
               round(xb, 9) AS mean_count,
               round(
                 ((CAST(n_cells AS DOUBLE) - 1.0)
                  * (CAST(pxx AS DOUBLE) + CAST(pyy AS DOUBLE)
                     - 2.0 * CAST(pxy AS DOUBLE)))
                 / (2.0 * CAST(w_pairs AS DOUBLE)
                    * (CAST(sxx AS DOUBLE)
                       - CAST(n_cells AS DOUBLE) * xb * xb)), 9) AS geary_c
        FROM c
    """


def _q_ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average of event value in
    time order (α = 1/8, exact binary): the representative ORDERED
    STATEFUL fold, computed as sort_array(collect_list) + a sequential
    F.aggregate lambda — one user-keyed shuffle, fold entirely JVM-side.
    α and 1-α are exact powers of two and the fold order is pinned, so
    both engines produce bit-identical doubles. Scale note: per-key state
    is the user's event list (bounded); for monster keys EWMA composes
    associatively as affine maps (m, b) — the documented tree-reduction
    path, not used here because it changes float order."""
    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    g = (
        ev.select("user_id", us.alias("us"), "event_id", "value")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sort_array(
                F.collect_list(F.struct("us", "event_id", "value"))
            ).alias("arr"),
        )
    )
    rest = F.slice(F.col("arr"), 2, F.size("arr") - 1)
    init = F.element_at("arr", 1).getField("value")
    fold = F.aggregate(
        rest,
        init,
        lambda acc, x: acc * F.lit(0.875) + x.getField("value") * F.lit(0.125),
    )
    return g.select(
        "user_id", "n_events", F.round(fold, 6).alias("ewma")
    ).orderBy("user_id")


def _q_gistar_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Getis-Ord Gi* hotspot z-score per occupied level-5 cell
    (spark/spatialstats.py getis_ord_gistar): binary self+4-edge-neighbor
    weights on the gos2 grid (EdgeNeighbors, cellid.go:210-220). Every
    sufficient statistic — per-cell neighbor count/sum, global N, Σx,
    Σx² — is an exact BIGINT; the z-score is ONE fixed-order double
    expression, so both engines agree bit-for-bit. Scale shape: one
    bounded 4x explode + one co-partitioned join + keyed agg + a 1-row
    broadcast of the global moments."""
    from gos2_spark.pipeline.graph import _default_materialize
    from gos2_spark.spark.functions import s2_token
    from gos2_spark.spark.pages import s2_parent_sql
    from gos2_spark.spark.spatialstats import getis_ord_gistar

    pts = _cust_points(spark, sf_dir)
    counts = _default_materialize(spark)(
        pts.groupBy(s2_parent_sql(F.col("cell_id"), 5).alias("cell")).agg(
            F.count("*").alias("n")
        )
    )
    out = getis_ord_gistar(counts, cell_col="cell", count_col="n")
    return out.select(
        s2_token(F.col("cell")).alias("token"),
        "x_count",
        "w_i",
        "local_sum",
        F.round("gi_star", 9).alias("gi_star"),
    ).orderBy("token")


def _gistar_oracle_sql() -> str:
    """Gi* from the same exact SQL neighbor arithmetic as the Moran's I
    oracle: BIGINT sufficient statistics, one mirrored final float
    expression."""
    from gos2_spark.pipeline import duckdb_oracles as _DO

    pairs = _DO.edge_neighbors_l8_oracle_sql(
        _cellid_cte_duckdb(_CUST_LATLNG_SQL), level=5
    )
    lsb = 1 << 50  # level 5
    tok = _DO._token(f"((cell_id & -{lsb}) | {lsb})")
    return f"""
        WITH pairs AS ({pairs}),
        {_cellid_cte_duckdb(_CUST_LATLNG_SQL)},
        cnt AS (SELECT {tok} AS token, count(*) AS n FROM cells GROUP BY 1),
        nj AS (
          SELECT p.token, count(*) AS w_nbrs,
                 CAST(sum(c2.n) AS BIGINT) AS nbr_sum
          FROM pairs p JOIN cnt c2 ON c2.token = p.nbr_token
          GROUP BY 1
        ),
        per AS (
          SELECT c.token, CAST(c.n AS BIGINT) AS x_count,
                 CAST(COALESCE(nj.w_nbrs, 0) + 1 AS BIGINT) AS w_i,
                 CAST(COALESCE(nj.nbr_sum, 0) + c.n AS BIGINT) AS local_sum
          FROM cnt c LEFT JOIN nj ON nj.token = c.token
        ),
        g AS (
          SELECT count(*) AS n_cells,
                 CAST(sum(n) AS BIGINT) AS sx,
                 CAST(sum(n * n) AS BIGINT) AS sxx
          FROM cnt
        )
        SELECT token, x_count, w_i, local_sum,
               round(
                 (CAST(local_sum AS DOUBLE)
                  - (CAST(sx AS DOUBLE) / CAST(n_cells AS DOUBLE))
                    * CAST(w_i AS DOUBLE))
                 / (sqrt(CAST(sxx AS DOUBLE) / CAST(n_cells AS DOUBLE)
                         - (CAST(sx AS DOUBLE) / CAST(n_cells AS DOUBLE))
                           * (CAST(sx AS DOUBLE) / CAST(n_cells AS DOUBLE)))
                    * sqrt((CAST(n_cells AS DOUBLE) * CAST(w_i AS DOUBLE)
                            - CAST(w_i AS DOUBLE) * CAST(w_i AS DOUBLE))
                           / (CAST(n_cells AS DOUBLE) - 1.0))), 9
               ) AS gi_star
        FROM per, g ORDER BY token
    """


_RIPLEY_RADII = (0.01, 0.03, 0.08)  # radians: ~64 / 191 / 510 km


def _q_ripley_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ripley's K point-pattern function (spark/spatialstats.py ripley_k)
    at three angular radii over the customer point set. Pair counting is
    the cell-blocked within-radius join (3x3 neighborhood explode + hash
    join + codegen angle filter, joins.py distance_join), never an
    all-pairs product; the oracle IS the O(n²) cross join, so the
    blocking scheme is value-checked against naive enumeration. Pair
    counts are exact BIGINTs; K is one final fixed-order double."""
    from gos2_spark.spark.spatialstats import ripley_k

    pts = _cust_points(spark, sf_dir)
    out = ripley_k(pts, _RIPLEY_RADII, point_key="key")
    return out.select(
        F.round("r_rad", 9).alias("r_rad"),
        "n_points",
        "n_pairs",
        F.round("k_hat", 9).alias("k_hat"),
        F.round("csr_pi_r2", 9).alias("csr_pi_r2"),
    ).orderBy("r_rad")


def _ripley_oracle_sql() -> str:
    selects = []
    for r in _RIPLEY_RADII:
        selects.append(f"""
          SELECT {r!r} AS r_raw,
                 (SELECT count(*) FROM pts) AS n_points,
                 (SELECT count(*) FROM pairs WHERE d <= {r!r}) AS n_pairs
        """)
    union = " UNION ALL ".join(selects)
    return f"""
        WITH pts AS ({_CUST_LATLNG_SQL}),
        v AS (
          SELECT key,
                 cos(radians(lng)) * cos(radians(lat)) AS x,
                 sin(radians(lng)) * cos(radians(lat)) AS y,
                 sin(radians(lat)) AS z
          FROM pts
        ),
        pairs AS (
          SELECT atan2(sqrt(
                     (a.y * b.z - a.z * b.y) * (a.y * b.z - a.z * b.y)
                   + (a.z * b.x - a.x * b.z) * (a.z * b.x - a.x * b.z)
                   + (a.x * b.y - a.y * b.x) * (a.x * b.y - a.y * b.x)),
                   a.x * b.x + a.y * b.y + a.z * b.z) AS d
          FROM v a JOIN v b ON a.key < b.key
        ),
        rows_ AS ({union})
        SELECT round(r_raw, 9) AS r_rad,
               CAST(n_points AS BIGINT) AS n_points,
               CAST(n_pairs AS BIGINT) AS n_pairs,
               round(4.0 * pi() * (2.0 * CAST(n_pairs AS DOUBLE))
                     / (CAST(n_points AS DOUBLE)
                        * (CAST(n_points AS DOUBLE) - 1.0)), 9) AS k_hat,
               round(pi() * r_raw * r_raw, 9) AS csr_pi_r2
        FROM rows_ ORDER BY r_raw
    """


def _lpa_edges(c: DataFrame) -> DataFrame:
    """Synthetic 96-node community graph: 12 blocks of 8 densely wired
    intra-block plus sparse cross-block bridges — the planted-partition
    shape LPA is built to recover."""
    k = F.col("c_custkey")
    v = (k % 96).alias("src")
    intra = c.select(
        v, ((k % 96) - ((k % 96) % 8) + ((k * 11 + 3) % 8)).alias("dst")
    )
    bridge = c.where(k % 17 == 0).select(v, ((k * 13) % 96).alias("dst"))
    return intra.union(bridge)


def _q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synchronous label propagation (pipeline/graph.py
    label_propagation): 3 rounds of mode-of-neighbors with min-label
    tie-break over a planted 12-block community graph. Every round is a
    pure function of the previous labeling (no async order dependence),
    so the chained-CTE oracle replays it exactly; labels, votes and
    community sizes are all BIGINTs."""
    from gos2_spark.pipeline.graph import label_propagation

    c = _load(spark, sf_dir, "customer")
    out = label_propagation(_lpa_edges(c), rounds=3)
    return out.orderBy("node")


def _lpa_oracle_sql(rounds: int = 3) -> str:
    parts = [
        """
        WITH raw AS (
          SELECT c_custkey % 96 AS a,
                 (c_custkey % 96) - ((c_custkey % 96) % 8)
                   + ((c_custkey * 11 + 3) % 8) AS b
          FROM customer
          UNION ALL
          SELECT c_custkey % 96, (c_custkey * 13) % 96
          FROM customer WHERE c_custkey % 17 = 0
        ),
        e0 AS (SELECT DISTINCT a AS s, b AS d FROM raw WHERE a <> b),
        e AS (SELECT s, d FROM e0 UNION SELECT d, s FROM e0),
        n AS (SELECT DISTINCT s AS node FROM e),
        l0 AS (SELECT node, node AS label FROM n)
        """
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
            v{i} AS (
              SELECT e.d AS node, l.label, count(*) AS c
              FROM e JOIN l{i - 1} l ON l.node = e.s GROUP BY 1, 2
            ),
            b{i} AS (
              SELECT node, label FROM (
                SELECT node, label, row_number() OVER (
                    PARTITION BY node ORDER BY c DESC, label ASC) AS rn
                FROM v{i}
              ) WHERE rn = 1
            ),
            l{i} AS (
              SELECT l.node, COALESCE(b.label, l.label) AS label
              FROM l{i - 1} l LEFT JOIN b{i} b ON b.node = l.node
            )
        """
        )
    parts.append(
        f"""
        SELECT l.node, l.label,
               CAST(count(*) OVER (PARTITION BY l.label) AS BIGINT)
                 AS community_size
        FROM l{rounds} l ORDER BY l.node
        """
    )
    return "\n".join(parts)


def _kcore_edges(o: DataFrame) -> DataFrame:
    """Sparse irregular graph from the orders table (avg degree ~4.5):
    low-degree fringes peel away, a dense core survives."""
    return o.where(F.col("o_orderkey") % 20 < 3).select(
        (F.col("o_custkey") % 997).alias("src"),
        (F.col("o_orderkey") % 997).alias("dst"),
    )


def _q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core extraction by iterative peeling (pipeline/graph.py kcore):
    6 fixed rounds of drop-degree<3 over the surviving subgraph. Peeling
    is monotone, so fixed rounds are statically unrollable and the
    chained-CTE oracle replays every intermediate active set exactly;
    degrees are exact BIGINTs."""
    from gos2_spark.pipeline.graph import kcore

    o = _load(spark, sf_dir, "orders")
    return kcore(_kcore_edges(o), k=3, rounds=6).orderBy("node")


def _kcore_oracle_sql(k: int = 3, rounds: int = 6) -> str:
    parts = [
        """
        WITH raw AS (
          SELECT o_custkey % 997 AS a, o_orderkey % 997 AS b
          FROM orders WHERE o_orderkey % 20 < 3
        ),
        e0 AS (SELECT DISTINCT a AS s, b AS d FROM raw WHERE a <> b),
        e AS (SELECT s, d FROM e0 UNION SELECT d, s FROM e0),
        a0 AS (SELECT DISTINCT s AS node FROM e)
        """
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
            d{i} AS (
              SELECT e.s AS node, count(*) AS deg
              FROM e
              JOIN a{i - 1} x ON x.node = e.s
              JOIN a{i - 1} y ON y.node = e.d
              GROUP BY 1
            ),
            a{i} AS (SELECT node FROM d{i} WHERE deg >= {k})
        """
        )
    parts.append(
        f"""
        SELECT e.s AS node, CAST(count(*) AS BIGINT) AS core_deg
        FROM e
        JOIN a{rounds} x ON x.node = e.s
        JOIN a{rounds} y ON y.node = e.d
        GROUP BY 1 ORDER BY node
        """
    )
    return "\n".join(parts)


def _q_vincenty_rhumb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WGS84 Vincenty inverse geodesic + rhumb-line distance/bearing
    (spark/geodesy.py) from 500 customer points to the 6 corpus cities.
    The iterative formula is a FIXED 6-round unroll defined once as an
    ordered (column, sql_expr) chain and executed as the SAME text in
    both engines (withColumn(F.expr) vs generated CTE chain): one op
    order, so the only cross-engine divergence is <=4 ULP of libm
    last-bit rounding, absorbed exactly by the micrometer rounding here.
    Plan: broadcast cross join + pure codegen expressions, zero
    shuffles, zero Python."""
    from gos2_spark.spark.geodesy import apply_steps, rhumb_steps, vincenty_steps
    from gos2_spark.spark.pages import CITIES

    pts = _cust_points(spark, sf_dir).where(F.col("key") < 500)
    cities = spark.createDataFrame(
        [(n, la, ln) for n, la, ln, _w in CITIES],
        "city string, lat2 double, lng2 double",
    )
    base = pts.select(
        "key", F.col("lat").alias("lat1"), F.col("lng").alias("lng1")
    ).crossJoin(F.broadcast(cities))
    out = apply_steps(base, vincenty_steps(6) + rhumb_steps())
    return out.select(
        "key",
        "city",
        F.round("vincenty_m", 6).alias("vincenty_m"),
        F.round("rhumb_m", 6).alias("rhumb_m"),
        F.round("rhumb_brg_deg", 9).alias("rhumb_brg_deg"),
    ).orderBy("key", "city")


def _vincenty_oracle_sql() -> str:
    from gos2_spark.spark.geodesy import (
        duckdb_steps_cte,
        rhumb_steps,
        vincenty_steps,
    )

    base = f"""
        pts AS (SELECT * FROM ({_CUST_LATLNG_SQL}) WHERE key < 500),
        cities(city, clat, clng) AS (VALUES {_cities_values_sql()}),
        g0 AS (
          SELECT key, city, lat AS lat1, lng AS lng1,
                 clat AS lat2, clng AS lng2
          FROM pts, cities
        )
    """
    body, last = duckdb_steps_cte(base, vincenty_steps(6) + rhumb_steps())
    return f"""
        WITH {body}
        SELECT key, city,
               round(vincenty_m, 6) AS vincenty_m,
               round(rhumb_m, 6) AS rhumb_m,
               round(rhumb_brg_deg, 9) AS rhumb_brg_deg
        FROM {last} ORDER BY key, city
    """


def _q_convex_hull_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation inclusive convex hull of the customer point cloud
    (spark/hull.py): two-level monotone chain — partial hull per
    (nation, salt) slice, then hull-of-hulls — so stage-2 group size is
    O(salt * hull_size) however big one nation's cloud gets. Vertex set
    is a pure function of cross-product SIGNS (multiply/subtract only),
    so the O(n^3) all-sides SQL edge test in the oracle reproduces it
    bit-for-bit; both sides keep exactly-collinear boundary points."""
    from gos2_spark.spark.hull import convex_hull_vertices

    c = _load(spark, sf_dir, "customer")
    pts = _cust_points(spark, sf_dir).join(
        c.select(F.col("c_custkey").alias("key"),
                 F.col("c_nationkey").cast("long").alias("nation_key")),
        "key",
    )
    hull = convex_hull_vertices(
        pts, key_col="nation_key", id_col="key", x_col="lng", y_col="lat"
    )
    return hull.select(
        "nation_key",
        "key",
        F.round("lat", 9).alias("lat"),
        F.round("lng", 9).alias("lng"),
    ).orderBy("nation_key", "key")


_CONVEX_HULL_ORACLE = """
    WITH p AS (
      SELECT c_custkey AS id, CAST(c_nationkey AS BIGINT) AS nk,
             -60.0 + (c_custkey * 7 % 120) + (c_custkey % 97) / 97.0 AS y,
             -170.0 + (c_custkey * 13 % 340) + (c_custkey % 89) / 89.0 AS x
      FROM customer
    ),
    edges AS (
      -- (a, b) is a CCW hull edge iff every other point c sits on the
      -- left of (or exactly ON) the directed line a->b; every boundary
      -- point is the source of at least one such edge (inclusive hull)
      SELECT a.nk, a.id AS ia
      FROM p a
      JOIN p b ON b.nk = a.nk AND b.id <> a.id
      JOIN p c ON c.nk = a.nk AND c.id <> a.id AND c.id <> b.id
      GROUP BY a.nk, a.id, b.id
      HAVING min((b.x - a.x) * (c.y - a.y)
                 - (b.y - a.y) * (c.x - a.x)) >= 0
    ),
    v AS (SELECT DISTINCT nk, ia AS id FROM edges)
    SELECT v.nk AS nation_key, v.id AS key,
           round(p.y, 9) AS lat, round(p.x, 9) AS lng
    FROM v JOIN p ON p.nk = v.nk AND p.id = v.id
    ORDER BY nation_key, key
"""


def _q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user robust outlier screen: median / MAD / count beyond
    3 * MAD, all computed from ONE sorted value array with explicit
    element arithmetic (array_sort + element_at; even-count median =
    (a + b) * 0.5) instead of engine-specific percentile interpolation —
    so both engines execute the identical float expressions and the
    outlier count has zero boundary exposure. One user-keyed shuffle;
    the per-key array is the same bounded-group contract as
    ewma/holt."""
    ev = _load(spark, sf_dir, "events")
    g = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.array_sort(F.collect_list("value")).alias("arr"),
    )
    n = F.col("n_events")

    def med_of(arr):
        return F.when(
            n % 2 == 1, F.element_at(arr, ((n + 1) / 2).cast("int"))
        ).otherwise(
            (
                F.element_at(arr, (n / 2).cast("int"))
                + F.element_at(arr, (n / 2).cast("int") + 1)
            )
            * F.lit(0.5)
        )

    med = med_of(F.col("arr"))
    g = g.withColumn("med", med)
    dev = F.array_sort(
        F.transform("arr", lambda v: F.abs(v - F.col("med")))
    )
    g = g.withColumn("mad", med_of(dev))
    n_out = F.size(
        F.filter(
            "arr",
            lambda v: F.abs(v - F.col("med")) > F.lit(3.0) * F.col("mad"),
        )
    )
    return g.select(
        "user_id",
        "n_events",
        F.round("med", 6).alias("median_value"),
        F.round("mad", 6).alias("mad"),
        n_out.alias("n_outliers"),
    ).orderBy("user_id")


_MAD_ORACLE = """
    WITH g AS (
      SELECT user_id, count(*) AS n_events,
             list_sort(list(CAST(value AS DOUBLE))) AS arr
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT *,
             CASE WHEN n_events % 2 = 1
                  THEN arr[CAST((n_events + 1) // 2 AS INT)]
                  ELSE (arr[CAST(n_events // 2 AS INT)]
                        + arr[CAST(n_events // 2 AS INT) + 1]) * 5e-1
             END AS med
      FROM g
    ),
    d AS (
      SELECT *, list_sort(list_transform(arr, v -> abs(v - med))) AS dev
      FROM m
    ),
    md AS (
      SELECT *,
             CASE WHEN n_events % 2 = 1
                  THEN dev[CAST((n_events + 1) // 2 AS INT)]
                  ELSE (dev[CAST(n_events // 2 AS INT)]
                        + dev[CAST(n_events // 2 AS INT) + 1]) * 5e-1
             END AS mad
      FROM d
    )
    SELECT user_id, n_events,
           round(med, 6) AS median_value,
           round(mad, 6) AS mad,
           CAST(len(list_filter(arr, v -> abs(v - med) > 3e0 * mad))
                AS INT) AS n_outliers
    FROM md ORDER BY user_id
"""


# burst_viterbi constants: exponential gap rates (events/hour) for the
# baseline and burst states, their logs embedded as exact double literals
# so the whole DP is +-*/ and comparisons only — bit-identical cross-engine.
_BURST_L0, _BURST_L1, _BURST_GAMMA = 0.25, 4.0, 1.0
_BURST_LN0 = math.log(_BURST_L0)
_BURST_LN1 = math.log(_BURST_L1)


def _q_burst_viterbi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-state burst detection (Kleinberg '02, 2-level automaton) over
    per-user inter-event gaps: exact Viterbi min-cost DP as an ordered
    fold. State rides as (c0, c1, k0, k1) — cost of the best path ending
    in baseline/burst + burst-step count along each — through one
    sequential F.aggregate; gap costs are lambda*g - ln(lambda) with
    ln(lambda) precomputed as a double literal, transitions pay gamma
    only on 0->1, ties break toward baseline by <=. One user-keyed
    window for gaps + one keyed shuffle for the fold; every double is
    bit-identical cross-engine (arithmetic only, no runtime
    transcendentals)."""
    from pyspark.sql import Window

    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gaps = (
        ev.select("user_id", us.alias("us"), "event_id")
        .withColumn(
            "gap_h",
            (F.col("us") - F.lag("us").over(w)).cast("double") / F.lit(3.6e9),
        )
        .where(F.col("gap_h").isNotNull())
    )
    g = gaps.groupBy("user_id").agg(
        F.count("*").alias("n_gaps"),
        F.array_sort(
            F.collect_list(F.struct("us", "event_id", "gap_h"))
        ).alias("arr"),
    )
    l0, l1 = F.lit(_BURST_L0), F.lit(_BURST_L1)
    ln0, ln1 = F.lit(_BURST_LN0), F.lit(_BURST_LN1)
    gam = F.lit(_BURST_GAMMA)

    def step(acc, x):
        c0, c1 = acc.getField("c0"), acc.getField("c1")
        k0, k1 = acc.getField("k0"), acc.getField("k1")
        gp = x.getField("gap_h")
        nc0 = F.least(c0, c1) + (l0 * gp - ln0)
        nc1 = F.least(c0 + gam, c1) + (l1 * gp - ln1)
        nk0 = F.when(c0 <= c1, k0).otherwise(k1)
        nk1 = F.when(c0 + gam <= c1, k0).otherwise(k1) + F.lit(1.0)
        return F.struct(
            nc0.alias("c0"), nc1.alias("c1"), nk0.alias("k0"), nk1.alias("k1")
        )

    init = F.struct(
        F.lit(0.0).alias("c0"), F.lit(1e30).alias("c1"),
        F.lit(0.0).alias("k0"), F.lit(0.0).alias("k1"),
    )
    st = F.aggregate("arr", init, step)
    c0, c1 = st.getField("c0"), st.getField("c1")
    best = F.least(c0, c1)
    kbest = F.when(c0 <= c1, st.getField("k0")).otherwise(st.getField("k1"))
    return g.select(
        "user_id",
        "n_gaps",
        F.round(best, 6).alias("best_cost"),
        kbest.cast("int").alias("n_burst_steps"),
    ).orderBy("user_id")


def _burst_oracle_sql() -> str:
    return f"""
        WITH e AS (
          SELECT user_id, epoch_us(ts) AS us, event_id FROM events
        ),
        gp AS (
          SELECT user_id, us, event_id,
                 CAST(us - lag(us) OVER (
                   PARTITION BY user_id ORDER BY us, event_id
                 ) AS DOUBLE) / 3.6e9 AS gap_h
          FROM e
        ),
        g AS (
          SELECT user_id, count(*) AS n_gaps,
                 list_concat(
                   [[0.0e0, 1.0e30, 0.0e0, 0.0e0]],
                   list([gap_h, 0.0e0, 0.0e0, 0.0e0]
                        ORDER BY us, event_id)
                 ) AS arr
          FROM gp WHERE gap_h IS NOT NULL GROUP BY user_id
        ),
        r AS (
          SELECT user_id, n_gaps,
                 list_reduce(arr, (acc, x) -> [
                   least(acc[1], acc[2])
                     + ({_BURST_L0!r} * x[1] - {_BURST_LN0!r}),
                   least(acc[1] + {_BURST_GAMMA!r}, acc[2])
                     + ({_BURST_L1!r} * x[1] - {_BURST_LN1!r}),
                   CASE WHEN acc[1] <= acc[2] THEN acc[3] ELSE acc[4] END,
                   CASE WHEN acc[1] + {_BURST_GAMMA!r} <= acc[2]
                        THEN acc[3] ELSE acc[4] END + 1.0e0
                 ]) AS st
          FROM g
        )
        SELECT user_id, n_gaps,
               round(least(st[1], st[2]), 6) AS best_cost,
               CAST(CASE WHEN st[1] <= st[2] THEN st[3] ELSE st[4] END
                    AS INT) AS n_burst_steps
        FROM r ORDER BY user_id
    """


_LOS_STEPS = [
    ("t", "CAST(i AS DOUBLE) / 17.0"),
    ("dlng0", "lngb - lnga"),
    (
        "dlng",
        "CASE WHEN dlng0 > 180.0 THEN dlng0 - 360.0"
        " WHEN dlng0 < -180.0 THEN dlng0 + 360.0 ELSE dlng0 END",
    ),
    ("lat", "lata + (latb - lata) * t"),
    ("lngr", "lnga + dlng * t"),
    (
        "lng",
        "CASE WHEN lngr > 180.0 THEN lngr - 360.0"
        " WHEN lngr <= -180.0 THEN lngr + 360.0 ELSE lngr END",
    ),
]
_LOS_ELEV_SQL = (
    "CAST(((cell_l8 % 9973) + 9973) % 9973 AS DOUBLE) * 5e-2"
)


def _q_line_of_sight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terrain line-of-sight between customer-point pairs over a
    synthetic elevation field keyed to level-8 cells (elevation = pure
    bit/mod arithmetic of the cell id, 0..498 m): sample 16 interior
    points along each sight line (exact rational t = i/17, linear
    lat/lng path with dateline wrap — arithmetic only, bit-identical
    cross-engine), look up terrain at each sample through the SAME
    Hilbert encode both engines share, and report visibility against the
    endpoint-to-endpoint sight line at +10 m masts. One codegen
    projection builds all samples (explode of a literal range), one
    encode, two aggs. The viewshed primitive, driver-checkable because
    the 'terrain' is a deterministic function of the engine's own cell
    ids."""
    from gos2_spark.spark.functions import add_cellid_sql
    from gos2_spark.spark.geodesy import apply_steps
    from gos2_spark.spark.pages import s2_parent_sql

    pts = _cust_points(spark, sf_dir)
    a = pts.where(F.col("key") < 50).select(
        F.col("key").alias("k"),
        F.col("lat").alias("lata"),
        F.col("lng").alias("lnga"),
    )
    b = pts.where(
        (F.col("key") >= 500) & (F.col("key") < 550)
    ).select(
        (F.col("key") - 500).alias("k"),
        F.col("lat").alias("latb"),
        F.col("lng").alias("lngb"),
    )
    base = a.join(b, "k").select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(17))).alias("i")
    )
    sampled = apply_steps(base, _LOS_STEPS)
    cells = add_cellid_sql(
        sampled.select("k", "i", "t", "lat", "lng"), "lat", "lng", "cell_id"
    ).select(
        "k",
        "i",
        "t",
        s2_parent_sql(F.col("cell_id"), 8).alias("cell_l8"),
    )
    elev = cells.withColumn("elev", F.expr(_LOS_ELEV_SQL))
    ends = elev.groupBy("k").agg(
        F.min(F.when(F.col("i") == 0, F.col("elev"))).alias("elev_a"),
        F.min(F.when(F.col("i") == 17, F.col("elev"))).alias("elev_b"),
    )
    mid = (
        elev.where((F.col("i") >= 1) & (F.col("i") <= 16))
        .join(ends, "k")
        .select(
            "k",
            (
                F.col("elev")
                - (
                    (F.col("elev_a") + F.lit(10.0))
                    + (
                        (F.col("elev_b") + F.lit(10.0))
                        - (F.col("elev_a") + F.lit(10.0))
                    )
                    * F.col("t")
                )
            ).alias("obs"),
        )
    )
    return (
        mid.groupBy("k")
        .agg(F.max("obs").alias("max_obs"))
        .select(
            F.col("k").alias("key_a"),
            (F.col("k") + 500).alias("key_b"),
            (F.col("max_obs") <= 0.0).alias("visible"),
            F.round("max_obs", 6).alias("max_obstruction_m"),
        )
        .orderBy("key_a")
    )


def _line_of_sight_oracle_sql() -> str:
    from gos2_spark.spark.geodesy import duckdb_steps_cte

    base = f"""
        lospts AS ({_CUST_LATLNG_SQL}),
        pa AS (SELECT key AS k, lat AS lata, lng AS lnga FROM lospts
               WHERE key < 50),
        pb AS (SELECT key - 500 AS k, lat AS latb, lng AS lngb FROM lospts
               WHERE key >= 500 AND key < 550),
        g0 AS (
          SELECT pa.*, pb.latb, pb.lngb, u.i
          FROM pa JOIN pb USING (k),
               unnest(generate_series(0, 17)) AS u(i)
        )
    """
    body, last = duckdb_steps_cte(base, _LOS_STEPS)
    return f"""
        WITH {body},
        {_cellid_cte_duckdb(
            f"SELECT k * 100 + i AS key, lat, lng FROM {last}"
        )},
        lv AS (
          SELECT key // 100 AS k, key % 100 AS i,
                 CAST(key % 100 AS DOUBLE) / 17.0 AS t,
                 ((cell_id & -{1 << 44}) | {1 << 44}) AS cell_l8
          FROM cells
        ),
        el AS (SELECT *, {_LOS_ELEV_SQL} AS elev FROM lv),
        ends AS (
          SELECT k,
                 min(CASE WHEN i = 0 THEN elev END) AS elev_a,
                 min(CASE WHEN i = 17 THEN elev END) AS elev_b
          FROM el GROUP BY 1
        ),
        mid AS (
          SELECT el.k,
                 el.elev - ((ends.elev_a + 10.0)
                            + ((ends.elev_b + 10.0)
                               - (ends.elev_a + 10.0)) * el.t) AS obs
          FROM el JOIN ends USING (k)
          WHERE el.i BETWEEN 1 AND 16
        )
        SELECT k AS key_a, k + 500 AS key_b,
               max(obs) <= 0.0 AS visible,
               round(max(obs), 6) AS max_obstruction_m
        FROM mid GROUP BY k
        ORDER BY key_a
    """


def _q_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment — the split gate every
    training-data pipeline needs: bucket = pmod(xxhash64(key), 100),
    80/10/10, so membership is a pure function of the key (stable across
    runs, machines, and row order; no sampling state). Reported per
    source stratum with exact counts and one pinned-division fraction.
    The oracle replays Spark's xxhash64 bit-for-bit in pure SQL
    (pipeline/duckdb_oracles.py)."""
    docs = _load(spark, sf_dir, "documents")
    bucket = F.pmod(
        F.xxhash64(F.col("doc_id").cast("string")), F.lit(100)
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    g = docs.groupBy("source", split.alias("split")).agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("n_chars")
    )
    tot = g.groupBy("source").agg(F.sum("n_docs").alias("n_total"))
    return (
        g.join(tot, "source")
        .select(
            "source",
            "split",
            "n_docs",
            "n_chars",
            F.round(
                F.col("n_docs").cast("double") / F.col("n_total").cast("double"),
                6,
            ).alias("frac"),
        )
        .orderBy("source", "split")
    )


def _stratified_split_oracle_sql() -> str:
    from gos2_spark.pipeline.duckdb_oracles import xxh64_list_sql

    h = f"({xxh64_list_sql('[CAST(doc_id AS VARCHAR)]')})[1]"
    return f"""
        WITH b AS (
          SELECT source, n_chars,
                 (({h}) % 100 + 100) % 100 AS bucket
          FROM documents
        ),
        s AS (
          SELECT source,
                 CASE WHEN bucket < 80 THEN 'train'
                      WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
                 count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars
          FROM b GROUP BY 1, 2
        ),
        t AS (SELECT source, sum(n_docs) AS n_total FROM s GROUP BY 1)
        SELECT s.source, s.split, s.n_docs, s.n_chars,
               round(CAST(s.n_docs AS DOUBLE) / CAST(t.n_total AS DOUBLE), 6)
                 AS frac
        FROM s JOIN t USING (source)
        ORDER BY source, split
    """


def _q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per calendar day (plus
    same-day actives) — the rolling engagement metric, computed exactly:
    the (user, day) table joins a BROADCAST day spine on a 7-day window,
    one countDistinct per day. Sliding-window distinct cannot be
    decomposed into per-day partials (distinct is not additive), so the
    exact form re-counts per window; the documented sketch swap-in at
    100 TB is HLL partials merged across the window."""
    ev = _load(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    days = ud.select("day").distinct()
    d = days.select(F.col("day").alias("asof"))
    j = ud.join(
        F.broadcast(d),
        (F.col("day") <= F.col("asof"))
        & (F.col("day") >= F.date_sub(F.col("asof"), 6)),
    )
    roll = j.groupBy("asof").agg(
        F.countDistinct("user_id").alias("active_7d")
    )
    daily = ud.groupBy(F.col("day").alias("asof")).agg(
        F.countDistinct("user_id").alias("active_1d")
    )
    return (
        roll.join(daily, "asof")
        .select(
            F.date_format("asof", "yyyy-MM-dd").alias("day"),
            "active_1d",
            "active_7d",
        )
        .orderBy("day")
    )


_ROLLING_ACTIVE_ORACLE = """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    days AS (SELECT DISTINCT day AS dref FROM ud),
    roll AS (
      SELECT d.dref, count(DISTINCT u.user_id) AS active_7d
      FROM days d JOIN ud u
        ON u.day <= d.dref AND u.day >= d.dref - INTERVAL 6 DAY
      GROUP BY 1
    ),
    daily AS (
      SELECT day AS dref, count(DISTINCT user_id) AS active_1d
      FROM ud GROUP BY 1
    )
    SELECT strftime(r.dref, '%Y-%m-%d') AS day, d.active_1d, r.active_7d
    FROM roll r JOIN daily d USING (dref)
    ORDER BY day
"""


# NOAA solar-position step chain over (lat, lng, doy, hh, mi, ss):
# fractional year -> equation of time -> declination -> true solar time
# -> hour angle -> solar elevation. Pure arithmetic + trig on shared
# expression text (same parity form as geodesy.py).
_SOLAR_STEPS = [
    (
        "gam",
        "2.0 * pi() / 365.0"
        " * (CAST(doy AS DOUBLE) - 1.0"
        " + (CAST(hh AS DOUBLE) - 12.0) / 24.0)",
    ),
    (
        "eqtime",
        "229.18 * (7.5e-5 + 1.868e-3 * cos(gam) - 3.2077e-2 * sin(gam)"
        " - 1.4615e-2 * cos(2.0 * gam) - 4.0849e-2 * sin(2.0 * gam))",
    ),
    (
        "decl",
        "6.918e-3 - 3.99912e-1 * cos(gam) + 7.0257e-2 * sin(gam)"
        " - 6.758e-3 * cos(2.0 * gam) + 9.07e-4 * sin(2.0 * gam)"
        " - 2.697e-3 * cos(3.0 * gam) + 1.48e-3 * sin(3.0 * gam)",
    ),
    ("toff", "eqtime + 4.0 * lng"),
    (
        "tst",
        "CAST(hh AS DOUBLE) * 60.0 + CAST(mi AS DOUBLE)"
        " + CAST(ss AS DOUBLE) / 60.0 + toff",
    ),
    ("ha", "radians(tst / 4.0 - 180.0)"),
    (
        "cosz",
        "sin(radians(lat)) * sin(decl)"
        " + cos(radians(lat)) * cos(decl) * cos(ha)",
    ),
    (
        "elev_deg",
        "90.0 - degrees(acos(greatest(-1.0, least(1.0, cosz))))",
    ),
]


def _q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner (the maintenance op an Iceberg-style
    table needs): within each partition, files ordered by (size desc,
    id) are packed next-fit into target-size output bins via a running
    cumulative sum — bin = floor((cumsum - size) / target) — so the plan
    is a pure window computation, deterministic, and embarrassingly
    parallel across partitions. Documents stand in as files (n_chars =
    bytes, source = partition). Output: per (partition, bin) file count,
    bytes, and fill ratio (one pinned division)."""
    from pyspark.sql import Window

    docs = _load(spark, sf_dir, "documents")
    target = 4096
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("bytes"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    f = docs.select(
        "source", "doc_id", F.col("n_chars").alias("bytes")
    ).withColumn("cum", F.sum("bytes").over(w))
    binned = f.select(
        "source",
        "bytes",
        ((F.col("cum") - F.col("bytes")) / F.lit(target))
        .cast("long")
        .alias("bin"),
    )
    return (
        binned.groupBy("source", "bin")
        .agg(F.count("*").alias("n_files"), F.sum("bytes").alias("bin_bytes"))
        .select(
            "source",
            "bin",
            "n_files",
            "bin_bytes",
            F.round(
                F.col("bin_bytes").cast("double") / F.lit(float(target)), 6
            ).alias("fill_ratio"),
        )
        .orderBy("source", "bin")
    )


_COMPACTION_ORACLE = """
    WITH f AS (
      SELECT source, doc_id, n_chars AS bytes,
             sum(n_chars) OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM documents
    ),
    b AS (
      SELECT source, bytes,
             CAST((cum - bytes) // 4096 AS BIGINT) AS bin
      FROM f
    )
    SELECT source, bin, count(*) AS n_files,
           CAST(sum(bytes) AS BIGINT) AS bin_bytes,
           round(CAST(sum(bytes) AS DOUBLE) / 4096.0, 6) AS fill_ratio
    FROM b GROUP BY 1, 2
    ORDER BY source, bin
"""


def _q_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence graph: part pairs appearing in the
    same order, with support and lift = n_ab * N / (n_a * n_b). The
    bipartite-projection op (basket -> item-item edges); the self-join is
    bounded by per-basket fanout (max 13 items here, so <= 78 pairs per
    order — never quadratic in the catalog). Counts exact BIGINTs; lift
    is one pinned rational expression rounded to 9."""
    li = _load(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a, b = op.alias("a"), op.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_orders"))
        .where(F.col("n_orders") >= 2)
    )
    deg = op.groupBy(F.col("l_partkey").alias("part")).agg(
        F.count("*").alias("n_part")
    )
    n_orders_total = op.select("l_orderkey").distinct().count()
    da = deg.select(
        F.col("part").alias("part_a"), F.col("n_part").alias("n_a")
    )
    db = deg.select(
        F.col("part").alias("part_b"), F.col("n_part").alias("n_b")
    )
    lift = (
        F.col("n_orders").cast("double") * F.lit(float(n_orders_total))
    ) / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
    return (
        pairs.join(da, "part_a")
        .join(db, "part_b")
        .select(
            "part_a",
            "part_b",
            "n_orders",
            "n_a",
            "n_b",
            F.round(lift, 9).alias("lift"),
        )
        .orderBy("part_a", "part_b")
    )


_COPURCHASE_ORACLE = """
    WITH op AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*) AS n_orders
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    deg AS (SELECT l_partkey AS part, count(*) AS n_part FROM op GROUP BY 1),
    tot AS (
      SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n FROM op
    )
    SELECT p.part_a, p.part_b, p.n_orders,
           da.n_part AS n_a, db.n_part AS n_b,
           round((CAST(p.n_orders AS DOUBLE) * (SELECT n FROM tot))
                 / (CAST(da.n_part AS DOUBLE) * CAST(db.n_part AS DOUBLE)),
                 9) AS lift
    FROM pairs p
    JOIN deg da ON da.part = p.part_a
    JOIN deg db ON db.part = p.part_b
    ORDER BY part_a, part_b
"""


def _q_solar_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Solar elevation per event (NOAA general solar position equations,
    implemented as the engine's shared Spark/DuckDB step-chain form like
    geodesy.py): fractional year -> equation of time -> declination ->
    true solar time -> hour angle -> elevation at the event's
    deterministic lat/lng and UTC timestamp. The day/night labeler a
    corpus pipeline uses for diurnal features — reported as the rounded
    elevation (no boolean threshold, so libm last-bit noise cannot flip
    an output). Pure codegen, zero shuffles."""
    from gos2_spark.spark.geodesy import apply_steps

    ev = _load(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    e = F.col("event_id")
    base = ev.select(
        "event_id",
        (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
        (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
        F.dayofyear("ts").alias("doy"),
        F.hour("ts").alias("hh"),
        F.minute("ts").alias("mi"),
        F.second("ts").alias("ss"),
    )
    out = apply_steps(base, _SOLAR_STEPS)
    return out.select(
        "event_id",
        "doy",
        F.round("eqtime", 9).alias("eqtime_min"),
        F.round(F.degrees("decl"), 9).alias("decl_deg"),
        F.round("elev_deg", 9).alias("solar_elev_deg"),
    ).orderBy("event_id")


def _solar_oracle_sql() -> str:
    from gos2_spark.spark.geodesy import duckdb_steps_cte

    base = """
        g0 AS (
          SELECT event_id,
                 -60.0 + (event_id * 11 % 120) + (event_id % 83) / 83.0
                   AS lat,
                 -170.0 + (event_id * 17 % 340) + (event_id % 79) / 79.0
                   AS lng,
                 CAST(dayofyear(ts) AS INT) AS doy,
                 hour(ts) AS hh, minute(ts) AS mi, second(ts) AS ss
          FROM events WHERE event_id < 2000
        )
    """
    body, last = duckdb_steps_cte(base, _SOLAR_STEPS)
    return f"""
        WITH {body}
        SELECT event_id, doy,
               round(eqtime, 9) AS eqtime_min,
               round(degrees(decl), 9) AS decl_deg,
               round(elev_deg, 9) AS solar_elev_deg
        FROM {last} ORDER BY event_id
    """


def _q_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decile profile of event value per event type, from ONE
    sorted array with explicit element arithmetic (type-7 interpolation
    q = x[(floor(h)] + (h - floor(h)) * (x[floor(h)+1] - x[floor(h)]),
    h = (n-1)p + 1, written once and executed identically in both
    engines — no engine percentile implementation in the loop). One
    keyed shuffle; the sketch swap-in at monster cardinality is
    percentile_approx, documented not used."""
    ev = _load(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.array_sort(F.collect_list("value")).alias("arr"),
    )
    n = F.col("n")

    def q_at(p: float):
        h = (n - 1).cast("double") * F.lit(p) + F.lit(1.0)
        lo = F.floor(h).cast("int")
        frac = h - F.floor(h)
        lov = F.element_at("arr", lo)
        hiv = F.element_at(
            "arr", F.least(lo + 1, n.cast("int"))
        )
        return lov + frac * (hiv - lov)

    cols = [
        F.round(q_at(p / 10.0), 6).alias(f"p{p * 10}")
        for p in (1, 2, 5, 8, 9)
    ]
    return g.select("event_type", "n", *cols).orderBy("event_type")


_VALUE_DECILES_ORACLE = """
    WITH g AS (
      SELECT event_type, count(*) AS n,
             list_sort(list(CAST(value AS DOUBLE))) AS arr
      FROM events GROUP BY 1
    )
    SELECT event_type, n,
           round(arr[CAST(floor((n - 1) * 1e-1 + 1.0) AS INT)]
                 + ((n - 1) * 1e-1 + 1.0
                    - floor((n - 1) * 1e-1 + 1.0))
                 * (arr[least(CAST(floor((n - 1) * 1e-1 + 1.0) AS INT)
                              + 1, CAST(n AS INT))]
                    - arr[CAST(floor((n - 1) * 1e-1 + 1.0) AS INT)]),
                 6) AS p10,
           round(arr[CAST(floor((n - 1) * 2e-1 + 1.0) AS INT)]
                 + ((n - 1) * 2e-1 + 1.0
                    - floor((n - 1) * 2e-1 + 1.0))
                 * (arr[least(CAST(floor((n - 1) * 2e-1 + 1.0) AS INT)
                              + 1, CAST(n AS INT))]
                    - arr[CAST(floor((n - 1) * 2e-1 + 1.0) AS INT)]),
                 6) AS p20,
           round(arr[CAST(floor((n - 1) * 5e-1 + 1.0) AS INT)]
                 + ((n - 1) * 5e-1 + 1.0
                    - floor((n - 1) * 5e-1 + 1.0))
                 * (arr[least(CAST(floor((n - 1) * 5e-1 + 1.0) AS INT)
                              + 1, CAST(n AS INT))]
                    - arr[CAST(floor((n - 1) * 5e-1 + 1.0) AS INT)]),
                 6) AS p50,
           round(arr[CAST(floor((n - 1) * 8e-1 + 1.0) AS INT)]
                 + ((n - 1) * 8e-1 + 1.0
                    - floor((n - 1) * 8e-1 + 1.0))
                 * (arr[least(CAST(floor((n - 1) * 8e-1 + 1.0) AS INT)
                              + 1, CAST(n AS INT))]
                    - arr[CAST(floor((n - 1) * 8e-1 + 1.0) AS INT)]),
                 6) AS p80,
           round(arr[CAST(floor((n - 1) * 9e-1 + 1.0) AS INT)]
                 + ((n - 1) * 9e-1 + 1.0
                    - floor((n - 1) * 9e-1 + 1.0))
                 * (arr[least(CAST(floor((n - 1) * 9e-1 + 1.0) AS INT)
                              + 1, CAST(n AS INT))]
                    - arr[CAST(floor((n - 1) * 9e-1 + 1.0) AS INT)]),
                 6) AS p90
    FROM g ORDER BY event_type
"""


def _q_bot_gap_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot-likeness screen: coefficient of variation of per-user
    inter-event gaps (machines fire on clocks -> low CV; humans are
    bursty -> high). Sufficient statistics (n, sum gap, sum gap^2) ride
    as DECIMAL(38,0) — microsecond gaps squared overflow int64 but stay
    exact in 38 digits in BOTH engines — so the variance numerator
    n*Sxx - Sx^2 is exact integer arithmetic and the only floats are one
    division and one sqrt at the very end. One window + one keyed agg."""
    from pyspark.sql import Window

    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gaps = (
        ev.select("user_id", us.alias("us"), "event_id")
        .withColumn("gap", F.col("us") - F.lag("us").over(w))
        .where(F.col("gap").isNotNull())
        .select(
            "user_id",
            F.col("gap").cast("decimal(19,0)").alias("g"),
        )
    )
    agg = gaps.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("g").alias("sx"),
        F.sum(F.col("g") * F.col("g")).alias("sxx"),
    )
    n = F.col("n").cast("decimal(38,0)")
    num = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    mean = F.col("sx").cast("double") / F.col("n").cast("double")
    std = F.sqrt(num) / F.col("n").cast("double")
    return agg.select(
        "user_id",
        "n",
        F.round(mean / F.lit(3.6e9), 6).alias("mean_gap_h"),
        F.round(std / (mean + F.lit(1.0)), 9).alias("cv"),
    ).orderBy("user_id")


_BOT_GAP_ORACLE = """
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS us, event_id,
             us - lag(us) OVER (
               PARTITION BY user_id ORDER BY us, event_id) AS gap
      FROM (SELECT user_id, epoch_us(ts) AS us, event_id, ts FROM events)
    ),
    g AS (
      SELECT user_id, CAST(gap AS DECIMAL(19,0)) AS g
      FROM e WHERE gap IS NOT NULL
    ),
    a AS (
      SELECT user_id, count(*) AS n,
             sum(g) AS sx, sum(g * g) AS sxx
      FROM g GROUP BY 1
    )
    SELECT user_id, n,
           round((CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / 3.6e9, 6)
             AS mean_gap_h,
           round((sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx
                            AS DOUBLE)) / CAST(n AS DOUBLE))
                 / (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) + 1.0), 9)
             AS cv
    FROM a ORDER BY user_id
"""


def _q_content_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-length inequality per source: the Gini coefficient from
    the exact integer form G = sum((2i - n - 1) * x_(i)) / (n * sum(x))
    over ascending-sorted lengths — numerator and denominator are exact
    BIGINTs (one rank window + one keyed agg), the coefficient is ONE
    division at the end. The corpus-balance diagnostic for mixing
    decisions."""
    from pyspark.sql import Window

    docs = _load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    r = docs.select("source", "doc_id", "n_chars").withColumn(
        "i", F.row_number().over(w)
    )
    agg = r.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(
            (2 * F.col("i") - 1) * F.col("n_chars")
        ).alias("wsum"),
    )
    n = F.col("n_docs")
    gini = (
        (F.col("wsum") - n * F.col("total_chars")).cast("double")
        / (n * F.col("total_chars")).cast("double")
    )
    return agg.select(
        "source",
        "n_docs",
        "total_chars",
        F.round(gini, 9).alias("gini"),
    ).orderBy("source")


_CONTENT_GINI_ORACLE = """
    WITH r AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY source ORDER BY n_chars, doc_id) AS i
      FROM documents
    ),
    a AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS total_chars,
             CAST(sum((2 * i - 1) * n_chars) AS BIGINT) AS wsum
      FROM r GROUP BY 1
    )
    SELECT source, n_docs, total_chars,
           round(CAST(wsum - n_docs * total_chars AS DOUBLE)
                 / CAST(n_docs * total_chars AS DOUBLE), 9) AS gini
    FROM a ORDER BY source
"""


def _q_user_tile_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mobility-profile similarity: users' visited level-5 tile SETS
    compared with the exact PPJoin set-similarity join (pipeline/dedup.py
    jaccard_join) — the geo composition of the webtext machinery: cells
    come from the pure-SQL Hilbert encode, tile sets become token sets,
    and the rare-first prefix filter prunes candidate pairs with zero
    false negatives. Output pairs with exact integer intersection/union
    and one pinned-division jaccard."""
    from gos2_spark.pipeline.dedup import jaccard_join
    from gos2_spark.spark.functions import add_cellid_sql
    from gos2_spark.spark.pages import s2_parent_sql

    # cohort-bounded (user_id < 400): mobility profiles are DENSE sets
    # (hundreds of tiles, high pairwise overlap), so the pair count grows
    # quadratically with cohort size no matter the join algorithm —
    # bound the cohort the way the kNN/hausdorff queries bound theirs
    ev = _load(spark, sf_dir, "events").where(F.col("user_id") < 400)
    e = F.col("event_id")
    pts = add_cellid_sql(
        ev.select(
            "user_id",
            "event_id",
            (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
            (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
        ),
        "lat", "lng", "cell_id",
    ).select(
        "user_id", s2_parent_sql(F.col("cell_id"), 5).alias("cell_l5")
    )
    # jaccard_join tokenizes on [^a-z]+, so numeric cell ids are mapped
    # injectively onto letters (digit/sign alphabet -> a..k); set
    # cardinalities — hence jaccard — are unchanged by any injection
    tile_tok = F.translate(
        F.col("cell_l5").cast("string"), "0123456789-", "abcdefghijk"
    )
    profiles = pts.groupBy("user_id").agg(
        F.concat_ws(" ", F.array_sort(F.collect_set(tile_tok))).alias("tiles")
    )
    out = jaccard_join(
        profiles, threshold=0.2, key_col="user_id", text_col="tiles"
    )
    return out.select(
        F.col("key_a").alias("user_a"),
        F.col("key_b").alias("user_b"),
        "inter",
        "union",
        F.round("jaccard", 9).alias("jaccard"),
    ).orderBy("user_a", "user_b")


def _user_tile_similarity_oracle_sql() -> str:
    return f"""
        WITH pts0 AS ({_EVENTS_LATLNG_SQL}),
        {_cellid_cte_duckdb("SELECT event_id AS key, lat, lng FROM pts0")},
        pc AS (
          SELECT e.user_id, ((c.cell_id & -{1 << 50}) | {1 << 50}) AS cell
          FROM cells c JOIN events e ON e.event_id = c.key
          WHERE e.user_id < 400
        ),
        prof AS (
          SELECT user_id, list_sort(list(DISTINCT cell)) AS cs
          FROM pc GROUP BY 1
        )
        SELECT a.user_id AS user_a, b.user_id AS user_b,
               len(list_intersect(a.cs, b.cs)) AS inter,
               len(a.cs) + len(b.cs) - len(list_intersect(a.cs, b.cs))
                 AS "union",
               round(CAST(len(list_intersect(a.cs, b.cs)) AS DOUBLE)
                     / CAST(len(a.cs) + len(b.cs)
                            - len(list_intersect(a.cs, b.cs)) AS DOUBLE),
                     9) AS jaccard
        FROM prof a JOIN prof b ON a.user_id < b.user_id
        WHERE CAST(len(list_intersect(a.cs, b.cs)) AS DOUBLE)
              / CAST(len(a.cs) + len(b.cs)
                     - len(list_intersect(a.cs, b.cs)) AS DOUBLE) >= 0.2
        ORDER BY user_a, user_b
    """


def _q_corpus_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus drift monitor: KL(P_source || P_corpus) per source over
    whitespace-token unigram distributions with add-one smoothing on the
    corpus vocabulary. Counts are exact BIGINTs; each probability is one
    pinned division; the divergence sum runs as a TOKEN-ORDERED fold
    (sort_array + sequential aggregate), so there is no float-sum-order
    exposure and both engines produce identical doubles up to ln's last
    bit, absorbed by round(9). The distribution-shift gate a training
    pipeline runs when a new crawl slice lands."""
    docs = _load(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), r"[^a-z0-9]+")).alias("tok"),
    ).where(F.col("tok") != "")
    per = toks.groupBy("source", "tok").agg(F.count("*").alias("c"))
    corpus = toks.groupBy("tok").agg(F.count("*").alias("cc"))
    vocab = corpus.count()
    totals = per.groupBy("source").agg(F.sum("c").alias("n_src"))
    n_corpus = toks.count()
    # union support: every (source, vocab token) pair via the corpus
    # vocab (smoothing gives mass to tokens the source never used)
    grid = totals.crossJoin(F.broadcast(corpus))
    j = grid.join(per, ["source", "tok"], "left").select(
        "source",
        "tok",
        "n_src",
        "cc",
        F.coalesce(F.col("c"), F.lit(0)).alias("c"),
    )
    v = F.lit(float(vocab))
    p = (F.col("c").cast("double") + 1.0) / (
        F.col("n_src").cast("double") + v
    )
    q = (F.col("cc").cast("double") + 1.0) / (F.lit(float(n_corpus)) + v)
    term = p * F.log(p / q)
    g = j.select("source", "tok", term.alias("term")).groupBy("source").agg(
        F.sort_array(F.collect_list(F.struct("tok", "term"))).alias("arr")
    )
    kl = F.aggregate(
        "arr", F.lit(0.0), lambda acc, x: acc + x.getField("term")
    )
    return (
        g.join(totals, "source")
        .select(
            "source",
            F.col("n_src").alias("n_tokens"),
            F.lit(vocab).cast("long").alias("vocab"),
            F.round(kl, 9).alias("kl_vs_corpus"),
        )
        .orderBy("source")
    )


_CORPUS_KL_ORACLE = """
    WITH toks AS (
      SELECT source, u.tok
      FROM documents,
           unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS u(tok)
      WHERE u.tok <> ''
    ),
    per AS (SELECT source, tok, count(*) AS c FROM toks GROUP BY 1, 2),
    corpus AS (SELECT tok, count(*) AS cc FROM toks GROUP BY 1),
    nv AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM corpus),
    nc AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM toks),
    totals AS (SELECT source, sum(c) AS n_src FROM per GROUP BY 1),
    grid AS (SELECT t.source, t.n_src, c.tok, c.cc FROM totals t, corpus c),
    j AS (
      SELECT g.source, g.tok, g.n_src, g.cc,
             coalesce(p.c, 0) AS c
      FROM grid g LEFT JOIN per p
        ON p.source = g.source AND p.tok = g.tok
    ),
    terms AS (
      SELECT source, tok,
             ((CAST(c AS DOUBLE) + 1.0)
              / (CAST(n_src AS DOUBLE) + (SELECT v FROM nv)))
             * ln(((CAST(c AS DOUBLE) + 1.0)
                   / (CAST(n_src AS DOUBLE) + (SELECT v FROM nv)))
                  / ((CAST(cc AS DOUBLE) + 1.0)
                     / ((SELECT n FROM nc) + (SELECT v FROM nv)))) AS term
      FROM j
    ),
    folded AS (
      SELECT source,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                            list(term ORDER BY tok)),
               (a, b) -> a + b) AS kl
      FROM terms GROUP BY source
    )
    SELECT f.source, CAST(t.n_src AS BIGINT) AS n_tokens,
           CAST((SELECT v FROM nv) AS BIGINT) AS vocab,
           round(f.kl, 9) AS kl_vs_corpus
    FROM folded f JOIN totals t USING (source)
    ORDER BY source
"""


_TTL_US = 21_600_000_000  # 6 hours


def _q_ttl_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time TTL dedup / rate gate: per user, keep an event only if
    >= 6h of event time passed since the last KEPT event — the batch
    form of spark/streaming.py streaming_ttl_dedup (same integer
    comparisons, so batch and stream agree exactly; restart-parity
    pytest pins it). State (last_kept_us, n_kept) rides the ordered fold
    as pure BIGINTs — zero float exposure anywhere."""
    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    g = (
        ev.select("user_id", us.alias("us"), "event_id")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sort_array(
                F.collect_list(F.struct("us", "event_id"))
            ).alias("arr"),
        )
    )
    sts = F.transform(
        "arr",
        lambda x: F.struct(
            x.getField("us").alias("l"), F.lit(1).cast("long").alias("n")
        ),
    ).alias("sts")
    ttl = F.lit(_TTL_US).cast("long")

    def step(acc, x):
        keep = (x.getField("l") - acc.getField("l")) >= ttl
        return F.struct(
            F.when(keep, x.getField("l")).otherwise(acc.getField("l")).alias("l"),
            F.when(keep, acc.getField("n") + 1).otherwise(acc.getField("n")).alias("n"),
        )

    st = F.aggregate(
        F.slice(sts, 2, F.size("arr") - 1), F.element_at(sts, 1), step
    )
    return g.select(
        "user_id",
        "n_events",
        st.getField("n").alias("n_kept"),
        st.getField("l").alias("last_kept_us"),
    ).orderBy("user_id")


_TTL_DEDUP_ORACLE = f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS us, event_id FROM events
    ),
    g AS (
      SELECT user_id, count(*) AS n_events,
             list([us, CAST(1 AS BIGINT)] ORDER BY us, event_id) AS sts
      FROM e GROUP BY user_id
    ),
    r AS (
      SELECT user_id, n_events,
             list_reduce(sts, (acc, x) ->
               CASE WHEN x[1] - acc[1] >= {_TTL_US}
                    THEN [x[1], acc[2] + 1] ELSE acc END) AS st
      FROM g
    )
    SELECT user_id, n_events, st[2] AS n_kept, st[1] AS last_kept_us
    FROM r ORDER BY user_id
"""


# map-match roads: 6 meridian great circles at these longitudes; the
# circle's unit normal is (-sin lng0, cos lng0, 0), so point-to-road
# angular distance is |asin(p . n)| — constants embedded as exact double
# literals so both engines run identical expressions.
_MM_ROADS = [0.0, 30.0, 60.0, 90.0, 120.0, 150.0]
_MM_GAMMA = 0.0625  # road-switch penalty, binary-exact


def _mm_emission_sqls() -> list[str]:
    out = []
    for lng0 in _MM_ROADS:
        s = repr(math.sin(math.radians(lng0)))
        c = repr(math.cos(math.radians(lng0)))
        dot = f"(-({s}) * mmx + ({c}) * mmy)"
        out.append(
            f"abs(asin(greatest(-1.0, least(1.0, {dot}))))"
        )
    return out


def _q_map_match_viterbi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HMM map matching (Newson-Krumm shape) of per-user GPS tracks onto
    a broadcast set of 6 great-circle 'roads': emission cost = angular
    distance |asin(p.n)| to each road (computed natively per event, 6
    codegen columns), transition cost = binary-exact switch penalty, and
    the Viterbi min-cost DP runs as the engine's ordered-fold machinery
    with a 6-wide cost vector as state: c_j' = least(c_j, min_all +
    gamma) + e_j. Output: matched final road (deterministic strict-<
    argmin), final cost, and the stay-vs-switch margin. One user-keyed
    shuffle; the only transcendental is asin on identical expression
    text."""
    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    e = F.col("event_id")
    lat = -60.0 + (e * 11 % 120) + (e % 83) / 83.0
    lng = -170.0 + (e * 17 % 340) + (e % 79) / 79.0
    base = ev.select(
        "user_id", us.alias("us"), "event_id",
        F.radians(lat).alias("rlat"), F.radians(lng).alias("rlng"),
    ).select(
        "user_id", "us", "event_id",
        (F.cos("rlng") * F.cos("rlat")).alias("mmx"),
        (F.sin("rlng") * F.cos("rlat")).alias("mmy"),
    )
    ems = [F.expr(s).alias(f"e{k}") for k, s in enumerate(_mm_emission_sqls())]
    base = base.select("user_id", "us", "event_id", *ems)
    g = base.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sort_array(
            F.collect_list(
                F.struct("us", "event_id", *[f"e{k}" for k in range(6)])
            )
        ).alias("arr"),
    )
    k6 = range(6)
    sts = F.transform(
        "arr",
        lambda x: F.struct(
            *[x.getField(f"e{k}").alias(f"c{k}") for k in k6]
        ),
    ).alias("sts")
    gam = F.lit(_MM_GAMMA)

    def step(acc, x):
        m = F.least(*[acc.getField(f"c{k}") for k in k6])
        return F.struct(
            *[
                (
                    F.least(acc.getField(f"c{k}"), m + gam)
                    + x.getField(f"c{k}")
                ).alias(f"c{k}")
                for k in k6
            ]
        )

    st = F.aggregate(
        F.slice(sts, 2, F.size("arr") - 1), F.element_at(sts, 1), step
    )
    cs = [st.getField(f"c{k}") for k in k6]
    best = F.least(*cs)
    # deterministic argmin: first index achieving the minimum
    road = F.lit(5)
    for k in reversed(range(5)):
        road = F.when(cs[k] == best, F.lit(k)).otherwise(road)
    return g.select(
        "user_id",
        "n_events",
        road.alias("matched_road"),
        F.round(best, 6).alias("viterbi_cost"),
    ).orderBy("user_id")


def _map_match_oracle_sql() -> str:
    ems = _mm_emission_sqls()
    em_list = ", ".join(ems)
    upd = ", ".join(
        f"least(acc[{k + 1}], least(acc[1], acc[2], acc[3], acc[4],"
        f" acc[5], acc[6]) + {_MM_GAMMA!r}) + x[{k + 1}]"
        for k in range(6)
    )
    best = "least(st[1], st[2], st[3], st[4], st[5], st[6])"
    road = "CASE " + " ".join(
        f"WHEN st[{k + 1}] = {best} THEN {k}" for k in range(6)
    ) + " END"
    return f"""
        WITH e AS (
          SELECT user_id, epoch_us(ts) AS us, event_id,
                 radians(-60.0 + (event_id * 11 % 120)
                         + (event_id % 83) / 83.0) AS rlat,
                 radians(-170.0 + (event_id * 17 % 340)
                         + (event_id % 79) / 79.0) AS rlng
          FROM events
        ),
        p AS (
          SELECT user_id, us, event_id,
                 cos(rlng) * cos(rlat) AS mmx,
                 sin(rlng) * cos(rlat) AS mmy
          FROM e
        ),
        g AS (
          SELECT user_id, count(*) AS n_events,
                 list([{em_list}] ORDER BY us, event_id) AS sts
          FROM p GROUP BY user_id
        ),
        r AS (
          SELECT user_id, n_events,
                 list_reduce(sts, (acc, x) -> [{upd}]) AS st
          FROM g
        )
        SELECT user_id, n_events,
               CAST({road} AS INT) AS matched_road,
               round({best}, 6) AS viterbi_cost
        FROM r ORDER BY user_id
    """


def _q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a sequence of crawl
    snapshots: four deterministic snapshot versions of the documents
    table (presence rule doc_id % (v+3) != 0, content amended when
    (doc_id + v) % 4 == 0) collapse into validity intervals — one row per
    (key, unbroken run of consecutive versions with identical content),
    carrying valid_from/valid_to/n_versions/is_current. One explode +
    one key-ordered window (change-flag cumsum) + one agg: the standard
    warehouse history build, scaling as a single key-keyed shuffle."""
    from pyspark.sql import Window

    docs = _load(spark, sf_dir, "documents")
    snaps = docs.select(
        F.col("doc_id").alias("key"),
        "text",
        F.explode(F.sequence(F.lit(1), F.lit(4))).alias("v"),
    ).where(F.col("key") % (F.col("v") + 3) != 0)
    content = F.md5(
        F.when(
            (F.col("key") + F.col("v")) % 4 == 0,
            F.concat(F.col("text"), F.lit(" rev"), F.col("v").cast("string")),
        ).otherwise(F.col("text"))
    )
    s = snaps.select("key", "v", content.alias("h"))
    w = Window.partitionBy("key").orderBy("v")
    flagged = s.select(
        "key",
        "v",
        "h",
        F.when(
            (F.lag("h").over(w) == F.col("h"))
            & (F.lag("v").over(w) == F.col("v") - 1),
            F.lit(0),
        )
        .otherwise(F.lit(1))
        .alias("chg"),
    ).withColumn("run", F.sum("chg").over(w))
    return (
        flagged.groupBy("key", "run")
        .agg(
            F.min("v").alias("valid_from"),
            F.max("v").alias("valid_to"),
            F.count("*").alias("n_versions"),
            F.min("h").alias("content_hash"),
        )
        .select(
            "key",
            "valid_from",
            "valid_to",
            "n_versions",
            (F.col("valid_to") == 4).alias("is_current"),
            "content_hash",
        )
        .orderBy("key", "valid_from")
    )


_SCD2_ORACLE = """
    WITH snaps AS (
      SELECT doc_id AS key, text, u.v
      FROM documents, unnest(generate_series(1, 4)) AS u(v)
      WHERE doc_id % (u.v + 3) != 0
    ),
    s AS (
      SELECT key, v,
             md5(CASE WHEN (key + v) % 4 = 0
                      THEN text || ' rev' || CAST(v AS VARCHAR)
                      ELSE text END) AS h
      FROM snaps
    ),
    f AS (
      SELECT key, v, h,
             CASE WHEN lag(h) OVER w = h
                       AND lag(v) OVER w = v - 1
                  THEN 0 ELSE 1 END AS chg
      FROM s WINDOW w AS (PARTITION BY key ORDER BY v)
    ),
    r AS (
      SELECT *, sum(chg) OVER (
        PARTITION BY key ORDER BY v
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      FROM f
    )
    SELECT key,
           min(v) AS valid_from,
           max(v) AS valid_to,
           count(*) AS n_versions,
           max(v) = 4 AS is_current,
           min(h) AS content_hash
    FROM r GROUP BY key, run
    ORDER BY key, valid_from
"""


def _q_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (pipeline/text.py rake_keywords): maximal
    stopword-free runs scored by degree/frequency, phrase score as a
    position-ordered fold-sum (one op order -> exact cross-engine
    ranking), top-5 per document. One explode + one cumsum window + two
    map-side aggs + one doc-keyed rank window, zero UDFs."""
    from gos2_spark.pipeline.text import rake_keywords

    docs = _load(spark, sf_dir, "documents")
    return rake_keywords(docs, top_k=5).orderBy("doc_id", "rank")


def _rake_oracle_sql() -> str:
    from gos2_spark.pipeline.text import LANG_PROFILES

    stop = ", ".join(f"'{s}'" for s in LANG_PROFILES["en"])
    return f"""
        WITH tk AS (
          -- DuckDB 1.0 has no WITH ORDINALITY; index via list_transform
          SELECT doc_id AS key, u.s.tok AS tok, u.s.pos AS pos
          FROM documents,
               unnest(list_transform(
                 regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                 (tok, i) -> {{'tok': tok, 'pos': i}})) AS u(s)
          WHERE u.s.tok <> ''
        ),
        r AS (
          SELECT *, sum(CASE WHEN tok IN ({stop}) THEN 1 ELSE 0 END)
                      OVER (PARTITION BY key ORDER BY pos) AS rid
          FROM tk
        ),
        pw AS (SELECT * FROM r WHERE tok NOT IN ({stop})),
        plen AS (SELECT key, rid, count(*) AS wlen FROM pw GROUP BY 1, 2),
        ws AS (
          SELECT pw.key, tok, count(*) AS freq,
                 CAST(sum(wlen) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                   AS wscore
          FROM pw JOIN plen USING (key, rid) GROUP BY 1, 2
        ),
        phr AS (
          SELECT pw.key, pw.rid,
                 string_agg(pw.tok, ' ' ORDER BY pw.pos) AS phrase,
                 list_reduce(list(ws.wscore ORDER BY pw.pos),
                             (a, b) -> a + b) AS pscore
          FROM pw JOIN ws ON ws.key = pw.key AND ws.tok = pw.tok
          GROUP BY 1, 2
        ),
        ded AS (
          SELECT key, phrase, count(*) AS n_occur, min(pscore) AS score
          FROM phr GROUP BY 1, 2
        ),
        rk AS (
          SELECT *, row_number() OVER (
            PARTITION BY key ORDER BY score DESC, phrase) AS rank
          FROM ded
        )
        SELECT key AS doc_id, CAST(rank AS INT) AS rank, phrase, n_occur,
               round(score, 6) AS score
        FROM rk WHERE rank <= 5 ORDER BY doc_id, rank
    """


def _q_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM change detection per user: the classic Page test
    as an arithmetic-only ordered fold. State (s_hi, s_lo, n_alarm):
    s_hi' = greatest(0, s_hi + (x - mu - k)), s_lo' = greatest(0,
    s_lo + (mu - k - x)); an alarm fires when either side crosses h and
    that side resets. mu is the per-user mean from exact sufficient
    statistics (sum/count, one pinned division); k (slack) and h
    (threshold) are binary-exact constants. Same fold machinery as
    holt/burst: one keyed shuffle, JVM-side lambda, bit-identical
    cross-engine (no transcendentals at all)."""
    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    g = (
        ev.select("user_id", us.alias("us"), "event_id", "value")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sv"),
            F.sort_array(
                F.collect_list(F.struct("us", "event_id", "value"))
            ).alias("arr"),
        )
        .withColumn("mu", F.col("sv") / F.col("n_events").cast("double"))
    )
    k, h = F.lit(4.0), F.lit(48.0)

    def step(acc, x):
        sh = acc.getField("sh")
        sl = acc.getField("sl")
        na = acc.getField("na")
        xv = x.getField("value")
        mu = acc.getField("mu")
        nh = F.greatest(F.lit(0.0), sh + (xv - mu - k))
        nl = F.greatest(F.lit(0.0), sl + (mu - k - xv))
        fired = (nh > h) | (nl > h)
        return F.struct(
            F.when(nh > h, F.lit(0.0)).otherwise(nh).alias("sh"),
            F.when(nl > h, F.lit(0.0)).otherwise(nl).alias("sl"),
            F.when(fired, na + F.lit(1.0)).otherwise(na).alias("na"),
            mu.alias("mu"),
        )

    init = F.struct(
        F.lit(0.0).alias("sh"), F.lit(0.0).alias("sl"),
        F.lit(0.0).alias("na"), F.col("mu").alias("mu"),
    )
    st = F.aggregate("arr", init, step)
    return g.select(
        "user_id",
        "n_events",
        F.round("mu", 6).alias("mu"),
        F.round(st.getField("sh"), 6).alias("cusum_hi"),
        F.round(st.getField("sl"), 6).alias("cusum_lo"),
        st.getField("na").cast("int").alias("n_alarms"),
    ).orderBy("user_id")


_CUSUM_ORACLE = """
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS us, event_id,
             CAST(value AS DOUBLE) AS value
      FROM events
    ),
    g AS (
      SELECT user_id, count(*) AS n_events, sum(value) AS sv,
             list([value, 0.0e0] ORDER BY us, event_id) AS arr
      FROM e GROUP BY user_id
    ),
    m AS (
      SELECT *, sv / CAST(n_events AS DOUBLE) AS mu,
             -- state rides as [sh, sl, na, mu]; prepended init sentinel
             list_concat([[0.0e0, 0.0e0, 0.0e0,
                           sv / CAST(n_events AS DOUBLE)]],
                         list_transform(arr, x -> [x[1], 0.0e0, 0.0e0,
                                                   0.0e0])) AS sts
      FROM g
    ),
    r AS (
      SELECT user_id, n_events, mu,
             list_reduce(sts, (acc, x) -> [
               CASE WHEN greatest(0.0e0, acc[1] + (x[1] - acc[4] - 4.0e0))
                         > 4.8e1
                    THEN 0.0e0
                    ELSE greatest(0.0e0, acc[1] + (x[1] - acc[4] - 4.0e0))
               END,
               CASE WHEN greatest(0.0e0, acc[2] + (acc[4] - 4.0e0 - x[1]))
                         > 4.8e1
                    THEN 0.0e0
                    ELSE greatest(0.0e0, acc[2] + (acc[4] - 4.0e0 - x[1]))
               END,
               CASE WHEN greatest(0.0e0, acc[1] + (x[1] - acc[4] - 4.0e0))
                         > 4.8e1
                      OR greatest(0.0e0, acc[2] + (acc[4] - 4.0e0 - x[1]))
                         > 4.8e1
                    THEN acc[3] + 1.0e0 ELSE acc[3] END,
               acc[4]
             ]) AS st
      FROM m
    )
    SELECT user_id, n_events, round(mu, 6) AS mu,
           round(st[1], 6) AS cusum_hi,
           round(st[2], 6) AS cusum_lo,
           CAST(st[3] AS INT) AS n_alarms
    FROM r ORDER BY user_id
"""


def _q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level event-type Markov chain: per-user time-ordered
    bigrams of event_type aggregated into a transition matrix with
    row-stochastic probabilities. One user-keyed window (lag) + one
    (from, to) agg + a broadcastable row-margin join; probability is one
    pinned division of exact BIGINTs. The click-path model a web
    analytics pipeline fits after sessionization."""
    from pyspark.sql import Window

    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    bi = (
        ev.select("user_id", us.alias("us"), "event_id", "event_type")
        .withColumn("prev", F.lag("event_type").over(w))
        .where(F.col("prev").isNotNull())
    )
    cnt = bi.groupBy(
        F.col("prev").alias("from_type"), F.col("event_type").alias("to_type")
    ).agg(F.count("*").alias("n"))
    tot = cnt.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    return (
        cnt.join(F.broadcast(tot), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            "n_from",
            F.round(
                F.col("n").cast("double") / F.col("n_from").cast("double"), 6
            ).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


_MARKOV_ORACLE = """
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY us, event_id
             ) AS prev
      FROM events
    ),
    cnt AS (
      SELECT prev AS from_type, event_type AS to_type, count(*) AS n
      FROM e WHERE prev IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (SELECT from_type, sum(n) AS n_from FROM cnt GROUP BY 1)
    SELECT c.from_type, c.to_type, c.n,
           CAST(t.n_from AS BIGINT) AS n_from,
           round(CAST(c.n AS DOUBLE) / CAST(t.n_from AS DOUBLE), 6) AS p
    FROM cnt c JOIN tot t USING (from_type)
    ORDER BY from_type, to_type
"""


def _q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Theil-Sen robust trend: the EXACT median of all pairwise
    slopes (value_j - value_i) / (hour_j - hour_i), i < j, distinct
    hours. Pairs come from one in-group array self-product (flatten of a
    transform over the sorted array — no join, group-local), the median
    from explicit sorted-array arithmetic like mad_outliers. The robust
    complement to value_trend_ols: breakdown point 29%, immune to the
    outliers OLS chases. Integer-hour x keeps every denominator exact."""
    ev = _load(spark, sf_dir, "events")
    hour = (
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        )
        / F.lit(3600000000)
    ).cast("long")
    g = ev.select(
        "user_id", hour.alias("h"), "event_id", "value"
    ).groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sort_array(
            F.collect_list(F.struct("h", "event_id", "value"))
        ).alias("arr"),
    )
    # all i<j slope pairs with distinct hours, group-local (no shuffle)
    slopes = F.array_sort(
        F.flatten(
            F.transform(
                F.col("arr"),
                lambda a, i: F.filter(
                    F.transform(
                        F.slice(
                            F.col("arr"), i + 2, F.size("arr") - i - 1
                        ),
                        lambda b: F.when(
                            b.getField("h") != a.getField("h"),
                            (b.getField("value") - a.getField("value"))
                            / (b.getField("h") - a.getField("h")).cast(
                                "double"
                            ),
                        ),
                    ),
                    lambda s: s.isNotNull(),
                ),
            )
        )
    )
    g = g.withColumn("sl", slopes).withColumn("m", F.size("sl"))
    m = F.col("m")
    med = F.when(
        m % 2 == 1, F.element_at("sl", ((m + 1) / 2).cast("int"))
    ).otherwise(
        (
            F.element_at("sl", (m / 2).cast("int"))
            + F.element_at("sl", (m / 2).cast("int") + 1)
        )
        * F.lit(0.5)
    )
    return g.select(
        "user_id",
        "n_events",
        F.col("m").alias("n_pairs"),
        F.round(med, 6).alias("theil_sen_slope"),
    ).where(m > 0).orderBy("user_id")


_THEIL_SEN_ORACLE = """
    WITH e AS (
      SELECT user_id,
             epoch_us(ts) // 3600000000 AS h, epoch_us(ts) AS us,
             event_id, CAST(value AS DOUBLE) AS value
      FROM events
    ),
    g AS (
      SELECT user_id, count(*) AS n_events,
             list([CAST(h AS DOUBLE), value] ORDER BY h, event_id, value)
               AS arr
      FROM e GROUP BY user_id
    ),
    s AS (
      SELECT user_id, n_events,
             list_sort(flatten(list_transform(arr, (a, i) ->
               list_transform(
                 list_filter(arr[i + 1:], b -> b[1] <> a[1]),
                 b -> (b[2] - a[2]) / (b[1] - a[1])
               )))) AS sl
      FROM g
    ),
    m AS (SELECT *, len(sl) AS np FROM s)
    SELECT user_id, n_events, CAST(np AS INT) AS n_pairs,
           round(CASE WHEN np % 2 = 1
                      THEN sl[CAST((np + 1) // 2 AS INT)]
                      ELSE (sl[CAST(np // 2 AS INT)]
                            + sl[CAST(np // 2 AS INT) + 1]) * 5e-1
                 END, 6) AS theil_sen_slope
    FROM m WHERE np > 0 ORDER BY user_id
"""


def _q_spacetime_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kulldorff-style space-time scan statistic over (level-5 cell, day)
    windows: observed count n vs the independence baseline
    mu = n_cell * n_day / N, scored with the Poisson log-likelihood ratio
    n*ln(n/mu) + (N-n)*ln((N-n)/(N-mu)) for n > mu (0 otherwise). The
    hot-spot detector a monitoring pipeline runs after tiling. Plan: one
    pure-codegen cell encode, THREE map-side-combined aggs (cell-day,
    cell, day) joined back cheaply (cell/day margins are tiny), LLR as a
    fixed-order float expression over exact BIGINT counts — cross-engine
    exposure is two ln calls, absorbed by round(6)."""
    from gos2_spark.spark.functions import add_cellid_sql
    from gos2_spark.spark.pages import s2_parent_sql

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    pts = add_cellid_sql(
        ev.select(
            "event_id",
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
            (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
        ),
        "lat", "lng", "cell_id",
    ).select(s2_parent_sql(F.col("cell_id"), 5).alias("cell_l5"), "day")
    nd = pts.groupBy("cell_l5", "day").agg(F.count("*").alias("n"))
    nc = pts.groupBy("cell_l5").agg(F.count("*").alias("n_cell"))
    nday = pts.groupBy("day").agg(F.count("*").alias("n_day"))
    ntot = pts.count()
    j = nd.join(nc, "cell_l5").join(F.broadcast(nday), "day")
    mu = (
        F.col("n_cell").cast("double")
        * F.col("n_day").cast("double")
        / F.lit(float(ntot))
    )
    n = F.col("n").cast("double")
    big_n = F.lit(float(ntot))
    llr = F.when(
        n > mu,
        n * F.log(n / mu) + (big_n - n) * F.log((big_n - n) / (big_n - mu)),
    ).otherwise(F.lit(0.0))
    return (
        j.select(
            "cell_l5",
            "day",
            "n",
            F.round(mu, 6).alias("mu"),
            F.round(llr, 6).alias("llr"),
        )
        .where(F.col("n") >= 3)
        .orderBy("cell_l5", "day")
    )


def _spacetime_scan_oracle_sql() -> str:
    return f"""
        WITH pts0 AS ({_EVENTS_LATLNG_SQL}),
        {_cellid_cte_duckdb("SELECT event_id AS key, lat, lng FROM pts0")},
        pc AS (
          SELECT c.cell_id, strftime(date_trunc('day', e.ts), '%Y-%m-%d')
                   AS day
          FROM cells c JOIN events e ON e.event_id = c.key
        ),
        lv AS (
          SELECT ((cell_id & -{1 << 50}) | {1 << 50}) AS cell_l5, day
          FROM pc
        ),
        nd AS (SELECT cell_l5, day, count(*) AS n FROM lv GROUP BY 1, 2),
        nc AS (SELECT cell_l5, count(*) AS n_cell FROM lv GROUP BY 1),
        nday AS (SELECT day, count(*) AS n_day FROM lv GROUP BY 1),
        nt AS (SELECT CAST(count(*) AS DOUBLE) AS big_n FROM lv)
        SELECT nd.cell_l5, nd.day, nd.n,
               round(CAST(n_cell AS DOUBLE) * CAST(n_day AS DOUBLE) / big_n,
                     6) AS mu,
               round(CASE WHEN CAST(n AS DOUBLE)
                          > CAST(n_cell AS DOUBLE) * CAST(n_day AS DOUBLE)
                            / big_n
                     THEN CAST(n AS DOUBLE)
                          * ln(CAST(n AS DOUBLE)
                               / (CAST(n_cell AS DOUBLE)
                                  * CAST(n_day AS DOUBLE) / big_n))
                          + (big_n - CAST(n AS DOUBLE))
                          * ln((big_n - CAST(n AS DOUBLE))
                               / (big_n - CAST(n_cell AS DOUBLE)
                                  * CAST(n_day AS DOUBLE) / big_n))
                     ELSE 0.0e0 END, 6) AS llr
        FROM nd JOIN nc USING (cell_l5) JOIN nday USING (day), nt
        WHERE nd.n >= 3
        ORDER BY cell_l5, day
    """


def _q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention matrix over the events stream: users are
    cohorted by the Monday-start week of their FIRST event; each later
    active week increments (cohort_week, week_offset). Classic web
    analytics rollup as two map-side-combinable aggregations plus one
    broadcastable join of per-user firsts — no window over the raw
    stream, so it scales as a pair of keyed shuffles on (user) then
    (cohort, offset). retention_rate = active / cohort size, one double
    division in a pinned order."""
    ev = _load(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    )
    first = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    sizes = first.groupBy("cohort_wk").agg(
        F.countDistinct("user_id").alias("cohort_users")
    )
    act = (
        ev.distinct()
        .join(first, "user_id")
        .groupBy(
            "cohort_wk",
            (F.datediff("wk", "cohort_wk") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )
    return (
        act.join(sizes, "cohort_wk")
        .select(
            F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "active_users",
            "cohort_users",
            F.round(
                F.col("active_users").cast("double")
                / F.col("cohort_users").cast("double"),
                6,
            ).alias("retention_rate"),
        )
        .orderBy("cohort_week", "week_offset")
    )


_COHORT_RETENTION_ORACLE = """
    WITH ev AS (
      SELECT user_id, date_trunc('week', ts) AS wk FROM events
    ),
    first AS (
      SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY user_id
    ),
    sizes AS (
      SELECT cohort_wk, count(DISTINCT user_id) AS cohort_users
      FROM first GROUP BY cohort_wk
    ),
    act AS (
      SELECT f.cohort_wk,
             CAST(datediff('day', f.cohort_wk, e.wk) // 7 AS INT)
               AS week_offset,
             count(DISTINCT e.user_id) AS active_users
      FROM (SELECT DISTINCT user_id, wk FROM ev) e
      JOIN first f USING (user_id)
      GROUP BY 1, 2
    )
    SELECT strftime(a.cohort_wk, '%Y-%m-%d') AS cohort_week,
           a.week_offset, a.active_users, s.cohort_users,
           round(CAST(a.active_users AS DOUBLE)
                 / CAST(s.cohort_users AS DOUBLE), 6) AS retention_rate
    FROM act a JOIN sizes s USING (cohort_wk)
    ORDER BY cohort_week, week_offset
"""


def _q_holt_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Holt double-exponential smoothing (level + trend) of
    event value in time order, alpha=1/4 gamma=1/8 (exact binary
    coefficients): the PAIR-STATE ordered fold, big sibling of
    ewma_user_value. State (l, b) advances as one struct through a
    sequential F.aggregate lambda over sort_array(collect_list) — one
    user-keyed shuffle, fold entirely JVM-side; identical fold text runs
    as a DuckDB list_reduce over struct accumulators, so doubles match
    bit-for-bit. forecast_1 = l + b (one-step-ahead)."""
    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    g = (
        ev.select("user_id", us.alias("us"), "event_id", "value")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sort_array(
                F.collect_list(F.struct("us", "event_id", "value"))
            ).alias("arr"),
        )
    )
    sts = F.transform(
        "arr",
        lambda e: F.struct(
            e.getField("value").alias("l"), F.lit(0.0).alias("b")
        ),
    ).alias("sts")
    a, na, gm, ngm = (
        F.lit(0.25), F.lit(0.75), F.lit(0.125), F.lit(0.875)
    )

    def step(acc, x):
        lv = acc.getField("l")
        bv = acc.getField("b")
        xv = x.getField("l")
        l_new = xv * a + (lv + bv) * na
        b_new = (xv * a + (lv + bv) * na - lv) * gm + bv * ngm
        return F.struct(l_new.alias("l"), b_new.alias("b"))

    st = F.aggregate(
        F.slice(sts, 2, F.size("arr") - 1), F.element_at(sts, 1), step
    )
    return g.select(
        "user_id",
        "n_events",
        F.round(st.getField("l"), 6).alias("level"),
        F.round(st.getField("b"), 6).alias("trend"),
        F.round(st.getField("l") + st.getField("b"), 6).alias("forecast_1"),
    ).orderBy("user_id")


_HOLT_ORACLE = """
    -- pair state rides as a 2-element DOUBLE list [l, b]: DuckDB 1.0's
    -- STRUCT-result lambdas rebind later fields to already-computed
    -- earlier fields (observed: {'l': acc.l+1, 'b': acc.l*10} yields
    -- b = 10 * NEW l), while LIST-result lambdas see only the old
    -- accumulator — the semantics Spark's F.aggregate struct fold has.
    WITH e AS (
      SELECT user_id,
             epoch_us(ts) AS us, event_id, CAST(value AS DOUBLE) AS value
      FROM events
    ),
    g AS (
      SELECT user_id, count(*) AS n_events,
             list([value, CAST(0.0 AS DOUBLE)]
                  ORDER BY us, event_id) AS sts
      FROM e GROUP BY 1
    ),
    r AS (
      SELECT user_id, n_events,
             list_reduce(sts, (acc, x) ->
               [x[1] * 2.5e-1 + (acc[1] + acc[2]) * 7.5e-1,
                (x[1] * 2.5e-1 + (acc[1] + acc[2]) * 7.5e-1 - acc[1])
                * 1.25e-1 + acc[2] * 8.75e-1]) AS st
      FROM g
    )
    SELECT user_id, n_events,
           round(st[1], 6) AS level,
           round(st[2], 6) AS trend,
           round(st[1] + st[2], 6) AS forecast_1
    FROM r ORDER BY user_id
"""


def _q_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein title-similarity self-join (pipeline/dedup.py
    edit_distance_pairs): prefix + length-difference blocking (the length
    gap is a true Levenshtein lower bound), threshold-banded JVM
    levenshtein(l, r, k) so over-distance candidates never finish the DP.
    Oracle mirrors the blocking exactly; ASCII corpus keeps Spark's
    code-point semantics equal to DuckDB's byte semantics."""
    from gos2_spark.pipeline.dedup import edit_distance_pairs

    docs = _load(spark, sf_dir, "documents")
    return edit_distance_pairs(docs).orderBy("key_a", "key_b")


_EDIT_DISTANCE_ORACLE = """
    WITH t AS (
      SELECT doc_id AS key,
             lower(substr(text, 1, 12)) AS title,
             substr(lower(substr(text, 1, 12)), 1, 2) AS blk
      FROM documents
    ),
    ok AS (SELECT blk FROM t GROUP BY blk HAVING count(*) <= 5000),
    d AS (SELECT t.* FROM t JOIN ok USING (blk))
    SELECT a.key AS key_a, b.key AS key_b,
           CAST(levenshtein(a.title, b.title) AS INT) AS edit_dist
    FROM d a JOIN d b
      ON a.blk = b.blk AND a.key < b.key
     AND abs(length(a.title) - length(b.title)) <= 4
    WHERE levenshtein(a.title, b.title) <= 4
    ORDER BY key_a, key_b
"""


_DIRECT_AZ_SQL = "CAST((key * 37) % 360 AS DOUBLE) + 0.5"
_DIRECT_DIST_SQL = "1000.0 + CAST(key % 997 AS DOUBLE) * 3000.0"


def _q_vincenty_direct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WGS84 Vincenty DIRECT problem (spark/geodesy.py
    vincenty_direct_steps): walk a per-key deterministic azimuth/distance
    from each customer point and return the ellipsoidal destination.
    Same shared-step-chain parity form as vincenty_rhumb: one op order in
    both engines, <=4 ULP residual, absorbed by rounding to 1e-9 deg.
    Plan: pure codegen projection, zero shuffles, zero Python."""
    from gos2_spark.spark.geodesy import apply_steps, vincenty_direct_steps

    pts = _cust_points(spark, sf_dir).where(F.col("key") < 2000)
    base = pts.select(
        "key",
        F.col("lat").alias("lat1"),
        F.col("lng").alias("lng1"),
        F.expr(_DIRECT_AZ_SQL).alias("az_deg"),
        F.expr(_DIRECT_DIST_SQL).alias("dist_m"),
    )
    out = apply_steps(base, vincenty_direct_steps(6))
    return out.select(
        "key",
        F.round("az_deg", 1).alias("az_deg"),
        F.round("dist_m", 1).alias("dist_m"),
        F.round("dest_lat", 9).alias("dest_lat"),
        F.round("dest_lng", 9).alias("dest_lng"),
    ).orderBy("key")


def _vincenty_direct_oracle_sql() -> str:
    from gos2_spark.spark.geodesy import duckdb_steps_cte, vincenty_direct_steps

    base = f"""
        pts AS (SELECT * FROM ({_CUST_LATLNG_SQL}) WHERE key < 2000),
        g0 AS (
          SELECT key, lat AS lat1, lng AS lng1,
                 {_DIRECT_AZ_SQL} AS az_deg,
                 {_DIRECT_DIST_SQL} AS dist_m
          FROM pts
        )
    """
    body, last = duckdb_steps_cte(base, vincenty_direct_steps(6))
    return f"""
        WITH {body}
        SELECT key,
               round(az_deg, 1) AS az_deg,
               round(dist_m, 1) AS dist_m,
               round(dest_lat, 9) AS dest_lat,
               round(dest_lng, 9) AS dest_lng
        FROM {last} ORDER BY key
    """


# ---------------------------------------------------------------------------
# round-4 additions
# ---------------------------------------------------------------------------

def _q_hexbin_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hexagonal density binning (spark/hexgrid.py): customer points ->
    pointy-top axial hex cells on the Web-Mercator plane via cube
    rounding — pure codegen column algebra, one count aggregation. The
    oracle replays the identical expression tree (floor(v+0.5) rounding,
    strict-> max-error correction), value-checked bit-for-bit."""
    from gos2_spark.spark.hexgrid import hexbin_counts

    pts = _cust_points(spark, sf_dir)
    return hexbin_counts(pts, size=0.35).orderBy("hq", "hr")


def _q_clark_evans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clark-Evans nearest-neighbor index (spark/spatialstats.py
    clark_evans): per-point NN distances from the distributed
    cap-doubling kNN (k=2 self-join, self rows dropped), one global
    aggregation into R = mean_nn / (0.5 / sqrt(n / 4pi)). The oracle
    computes every NN by the O(n^2) min with the identical angle metric
    — certifying the kNN ladder finds the true nearest neighbor for
    EVERY point, not just the queried subset earlier tests use."""
    from gos2_spark.spark.spatialstats import clark_evans

    pts = _cust_points(spark, sf_dir)
    return clark_evans(pts, point_key="key")


def _q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial k-anonymity generalization histogram (spark/spatialstats
    k_anonymity_levels): finest S2 level whose ancestor cell holds >= 10
    points, per customer point — one explode to 5 ancestor keys, one
    (level, cell) count, one join back, one max. The oracle replays the
    parent-bit arithmetic per level in SQL."""
    from gos2_spark.spark.spatialstats import k_anonymity_levels

    pts = _cust_points(spark, sf_dir)
    return k_anonymity_levels(pts, k=10, levels=(0, 2, 4, 6, 8)).orderBy(
        "level"
    )


def _q_spatial_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type spatial entropy (spark/spatialstats.py
    spatial_entropy): Shannon entropy + effective-cell count of each
    type's distribution over level-4 S2 cells — the geo-concentration
    screen. Exact BIGINT sufficient statistics, one fixed-order double
    expression (H = ln N - sum(c ln c)/N)."""
    from gos2_spark.spark.functions import add_cellid_sql
    from gos2_spark.spark.spatialstats import spatial_entropy

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    pts = add_cellid_sql(
        ev.select(
            "event_type",
            (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
            (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
        ),
        "lat",
        "lng",
        "cell_id",
    )
    return spatial_entropy(pts, "event_type", level=4).orderBy("grp")


def _q_cotravel_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-travel mining (spark/temporal.py cotravel_pairs): user pairs
    sharing the same level-2 cell in >= 2 distinct 24 h buckets — the
    sustained-companion upgrade of colocation_pairs. Visits deduplicate
    before the (cell, bucket) equi-self-join, so candidate pairs are
    quadratic only in per-group distinct users; the oracle replays the
    naive form."""
    from gos2_spark.spark.functions import add_cellid_sql
    from gos2_spark.spark.temporal import cotravel_pairs

    ev = _load(spark, sf_dir, "events").where(F.col("user_id") < 200)
    e = F.col("event_id")
    pts = add_cellid_sql(
        ev.select(
            "user_id",
            "ts",
            (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
            (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
        ),
        "lat",
        "lng",
        "cell_id",
    )
    return cotravel_pairs(
        pts, level=2, bucket_seconds=86400, min_buckets=2
    ).orderBy("user_a", "user_b")


def _q_cocitation_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host co-citation relatedness (pipeline/web.py cocitation): pairs
    of destination hosts by distinct co-citing sources over the
    synthetic link graph — distinct edges, hub-source degree cut, one
    bounded self-join. Oracle replays the naive pair join on the same
    extracted edges."""
    from gos2_spark.pipeline.web import cocitation, extract_links, url_host

    docs = _load(spark, sf_dir, "documents")
    d = F.col("doc_id")
    k, m, base = _messy_url_parts(d)
    html = F.concat(
        F.lit('<html><body><a href="https://site'),
        ((d * 7) % 20).cast("string"),
        F.lit(".example/p/"),
        m,
        F.lit('">x</a> <a href="https://site'),
        ((d * 11) % 20).cast("string"),
        F.lit('.example/q">y</a></body></html>'),
    )
    pages = docs.select(base.alias("url"), html.alias("html"))
    edges = pages.select(
        url_host(F.col("url")).alias("src_host"),
        F.explode(extract_links(F.col("html"))).alias("href"),
    ).select("src_host", url_host(F.col("href")).alias("dst_host"))
    return cocitation(edges).orderBy("dst_a", "dst_b")


def _q_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM (pipeline/retrieval.py
    kneser_ney_bigrams): absolute discounting + continuation-count
    backoff from three map-side-combined aggregations over ONE bigram
    table. Top-200 by raw count (integer-deterministic order); p_kn is
    the value column the oracle matches to the ulp."""
    from gos2_spark.pipeline.retrieval import kneser_ney_bigrams

    docs = _load(spark, sf_dir, "documents")
    out = kneser_ney_bigrams(docs, discount=0.75)
    return out.orderBy(F.desc("c12"), "w1", "w2").limit(200)


def _q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit screen (spark/aggregates.py
    benford_digit_stats) over order totals: exact per-digit counts,
    observed vs log10(1 + 1/d) expected proportions, chi-square terms.
    One projection + one 9-group aggregation."""
    from gos2_spark.spark.aggregates import benford_digit_stats

    orders = _load(spark, sf_dir, "orders")
    return benford_digit_stats(orders, "o_totalprice").orderBy("digit")


def _q_skyline_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline / Pareto frontier (spark/skyline.py skyline_2d):
    customers maximizing total spend while minimizing order count — the
    'best tradeoff' frontier. Spend is EXACT integer cents (floor(p*100
    +0.5) summed as BIGINT) so the pair key is order-independent
    cross-engine; the oracle is the independent NOT EXISTS dominance
    anti-join, certifying the two-phase sort-filter plan."""
    from gos2_spark.spark.skyline import skyline_2d

    orders = _load(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("spend_cents"),
        F.count("*").alias("n_orders"),
    )
    return skyline_2d(per_cust, "spend_cents", "n_orders").orderBy(
        F.desc("spend_cents")
    )


_KDE_H = 0.05          # gaussian bandwidth, radians
_KDE_CUTOFF = 0.15     # 3h truncation
# the engine's distance_join takes DEGREES and converts back with
# math.radians — replay the exact double round-trip for the oracle
_KDE_EPS_DEG = _KDE_CUTOFF * 180.0 / math.pi
_KDE_RADIUS_EFF = math.radians(_KDE_EPS_DEG)


def _q_kde_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated-gaussian kernel density at each sample point
    (spark/spatialstats.py kde_points): the cell-blocked within-radius
    self-join supplies exact pair distances; one map-side sum per point.
    The oracle replays every pair O(n^2) with the identical angle metric
    and the identical effective radius (including the engine's
    deg->rad round-trip)."""
    from gos2_spark.spark.spatialstats import kde_points

    pts = _cust_points(spark, sf_dir)
    return kde_points(
        pts, bandwidth_rad=_KDE_H, cutoff_rad=_KDE_CUTOFF, point_key="key"
    ).orderBy("key")


def _q_gravity_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gravity-model fit over the level-4 OD flow matrix: expected flow
    k * m_o * m_d / d^2 with masses = cell trip-end totals, distances =
    haversine between per-cell mean trip endpoints (EXACT integer
    micro-degree sums, the kmeans determinism trick), and k the
    one-line least-proportion fit sum(flow)/sum(m_o m_d / d^2). The
    spatial-interaction residual screen: which corridors out/under-
    perform distance expectations. Plan: the od_matrix aggregation
    twice-keyed (flows + masses) and one broadcast scalar."""
    from gos2_spark.spark.functions import add_cellid_sql, haversine_rad
    from gos2_spark.spark.pages import s2_parent_sql

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    pts = ev.select(
        "user_id",
        F.floor(us / 86_400_000_000).alias("day_idx"),
        F.struct(us.alias("us"), F.col("event_id").alias("eid")).alias("ord"),
        (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
        (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
    )
    trips = pts.groupBy("user_id", "day_idx").agg(
        F.min_by("lat", "ord").alias("olat"),
        F.min_by("lng", "ord").alias("olng"),
        F.max_by("lat", "ord").alias("dlat"),
        F.max_by("lng", "ord").alias("dlng"),
    )
    o = add_cellid_sql(trips, "olat", "olng", "o_leaf")
    od = add_cellid_sql(o, "dlat", "dlng", "d_leaf").select(
        s2_parent_sql(F.col("o_leaf"), 4).alias("o_cell4"),
        s2_parent_sql(F.col("d_leaf"), 4).alias("d_cell4"),
        "olat", "olng", "dlat", "dlng",
    )
    scale = 1_000_000
    flows = od.groupBy("o_cell4", "d_cell4").agg(
        F.count("*").alias("n_trips"),
        F.sum(F.floor(F.col("olat") * scale + 0.5).cast("long")).alias("_sola"),
        F.sum(F.floor(F.col("olng") * scale + 0.5).cast("long")).alias("_soln"),
        F.sum(F.floor(F.col("dlat") * scale + 0.5).cast("long")).alias("_sdla"),
        F.sum(F.floor(F.col("dlng") * scale + 0.5).cast("long")).alias("_sdln"),
    )
    mo = flows.groupBy("o_cell4").agg(
        F.sum("n_trips").alias("m_o"),
        F.sum("_sola").alias("_la"), F.sum("_soln").alias("_ln"),
    )
    md = flows.groupBy("d_cell4").agg(
        F.sum("n_trips").alias("m_d"),
        F.sum("_sdla").alias("_la2"), F.sum("_sdln").alias("_ln2"),
    )
    j = (
        flows.select("o_cell4", "d_cell4", "n_trips")
        .join(mo, "o_cell4")
        .join(md, "d_cell4")
    )
    olat_m = F.col("_la").cast("double") / F.col("m_o") / scale
    olng_m = F.col("_ln").cast("double") / F.col("m_o") / scale
    dlat_m = F.col("_la2").cast("double") / F.col("m_d") / scale
    dlng_m = F.col("_ln2").cast("double") / F.col("m_d") / scale
    d = haversine_rad(olat_m, olng_m, dlat_m, dlng_m)
    g = (F.col("m_o") * F.col("m_d")).cast("double") / (d * d)
    j = j.select("o_cell4", "d_cell4", "n_trips", "m_o", "m_d", d.alias("_d"), g.alias("_g")).where(
        F.col("_d") > 0
    )
    tot = j.agg(
        F.sum("n_trips").alias("_sf"), F.sum("_g").alias("_sg")
    )
    k = F.col("_sf").cast("double") / F.col("_sg")
    out = j.crossJoin(F.broadcast(tot)).select(
        "o_cell4",
        "d_cell4",
        "n_trips",
        "m_o",
        "m_d",
        F.round(k * F.col("_g"), 6).alias("expected"),
        F.round(F.col("n_trips") - k * F.col("_g"), 6).alias("residual"),
    )
    return out.orderBy("o_cell4", "d_cell4")


def _q_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-users-to-date per day WITHOUT a quadratic windowed
    count-distinct: each user reduces to a first-seen day (one agg), new
    users count per day (one agg), and the cumulative sum runs over the
    |days| rows only — the scalable form of the classic growth curve."""
    from pyspark.sql.window import Window

    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    days = ev.select(
        F.floor(us / 86_400_000_000).alias("day_idx"), "user_id"
    )
    first = days.groupBy("user_id").agg(F.min("day_idx").alias("first_day"))
    new_per_day = first.groupBy("first_day").agg(
        F.count("*").alias("n_new_users")
    )
    all_days = days.select("day_idx").distinct()
    per_day = all_days.join(
        new_per_day, all_days["day_idx"] == new_per_day["first_day"], "left"
    ).select(
        "day_idx", F.coalesce(F.col("n_new_users"), F.lit(0)).alias("n_new_users")
    )
    w = Window.orderBy("day_idx").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        "day_idx",
        "n_new_users",
        F.sum("n_new_users").over(w).alias("cum_distinct_users"),
    ).orderBy("day_idx")


def _q_event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern mining: top-50 event-type trigrams over each
    user's time-ordered event stream — two lead() steps in ONE
    user-partitioned window (bounded per-user state), then a count agg.
    Deterministic order ties broken by (us, event_id)."""
    from pyspark.sql.window import Window

    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    w = Window.partitionBy("user_id").orderBy(us, "event_id")
    tri = ev.select(
        "user_id",
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).where(F.col("t3").isNotNull())
    return (
        tri.groupBy("t1", "t2", "t3")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("n"), "t1", "t2", "t3")
        .limit(50)
    )


def _q_cell_density_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial snapshot diff: per level-4 cell, event counts in the
    first vs second half of the month (split at 2024-01-16 = day 19738)
    and the Poisson change z-score (n2 - n1) / sqrt(n1 + n2) — the
    crawl-to-crawl density drift screen. Exact integer counts, one
    fixed-order float expression."""
    from gos2_spark.spark.functions import add_cellid_sql
    from gos2_spark.spark.pages import s2_parent_sql

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    pts = add_cellid_sql(
        ev.select(
            (F.floor(us / 86_400_000_000) >= 19738).cast("int").alias("epoch"),
            (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
            (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
        ),
        "lat",
        "lng",
        "cell_id",
    )
    counts = (
        pts.select(s2_parent_sql(F.col("cell_id"), 4).alias("cell4"), "epoch")
        .groupBy("cell4")
        .agg(
            F.sum((F.col("epoch") == 0).cast("long")).alias("n1"),
            F.sum((F.col("epoch") == 1).cast("long")).alias("n2"),
        )
    )
    z = (F.col("n2") - F.col("n1")).cast("double") / F.sqrt(
        (F.col("n1") + F.col("n2")).cast("double")
    )
    return counts.select(
        "cell4", "n1", "n2", F.round(z, 9).alias("z_change")
    ).orderBy("cell4")


def _q_lisa_local_moran(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anselin Local Moran's I (LISA) per occupied level-5 cell
    (spark/spatialstats.py local_moran): the per-cell cluster/outlier
    classifier (HH/LL/HL/LH quadrants) with gos2's 4-edge-neighbor
    weights (EdgeNeighbors, cellid.go:210-220). Every sufficient
    statistic is an exact BIGINT; I_i is one fixed-order double
    expression, so both engines agree bit-for-bit — including the
    quadrant sign comparisons. Scale shape: bounded 4x neighbor explode
    + co-partitioned join + 1-row moment broadcast, no windows."""
    from gos2_spark.pipeline.graph import _default_materialize
    from gos2_spark.spark.functions import s2_token
    from gos2_spark.spark.pages import s2_parent_sql
    from gos2_spark.spark.spatialstats import local_moran

    pts = _cust_points(spark, sf_dir)
    counts = _default_materialize(spark)(
        pts.groupBy(s2_parent_sql(F.col("cell_id"), 5).alias("cell")).agg(
            F.count("*").alias("n")
        )
    )
    out = local_moran(counts, cell_col="cell", count_col="n")
    return out.select(
        s2_token(F.col("cell")).alias("token"),
        "x_count",
        "w_i",
        "nbr_sum",
        # + 0.0 collapses IEEE -0.0 (z<0, lag=0) to +0.0 — Spark and
        # DuckDB disagree on the sign of the zero product otherwise
        (F.round("local_i", 9) + F.lit(0.0)).alias("local_i"),
        "quadrant",
    ).orderBy("token")


def _lisa_oracle_sql() -> str:
    """LISA from the same exact SQL edge-neighbor arithmetic as the
    Moran's I / Gi* oracles: BIGINT sufficient statistics, the final
    float expression mirrored term for term (including quadrant signs)."""
    from gos2_spark.pipeline import duckdb_oracles as _DO

    pairs = _DO.edge_neighbors_l8_oracle_sql(
        _cellid_cte_duckdb(_CUST_LATLNG_SQL), level=5
    )
    lsb = 1 << 50  # level 5
    tok = _DO._token(f"((cell_id & -{lsb}) | {lsb})")
    return f"""
        WITH pairs AS ({pairs}),
        {_cellid_cte_duckdb(_CUST_LATLNG_SQL)},
        cnt AS (SELECT {tok} AS token, count(*) AS n FROM cells GROUP BY 1),
        nj AS (
          SELECT p.token, count(*) AS w_nbrs,
                 CAST(sum(c2.n) AS BIGINT) AS nbr_sum
          FROM pairs p JOIN cnt c2 ON c2.token = p.nbr_token
          GROUP BY 1
        ),
        g AS (
          SELECT count(*) AS n_cells,
                 CAST(sum(n) AS BIGINT) AS sx,
                 CAST(sum(n * n) AS BIGINT) AS sxx
          FROM cnt
        ),
        per AS (
          SELECT c.token, CAST(c.n AS BIGINT) AS x_count,
                 CAST(COALESCE(nj.w_nbrs, 0) AS BIGINT) AS w_i,
                 CAST(COALESCE(nj.nbr_sum, 0) AS BIGINT) AS nbr_sum,
                 CAST(g.sx AS DOUBLE) / CAST(g.n_cells AS DOUBLE) AS xb,
                 CAST(g.sxx AS DOUBLE) / CAST(g.n_cells AS DOUBLE) AS sxxn
          FROM cnt c LEFT JOIN nj ON nj.token = c.token, g
        ),
        zl AS (
          SELECT token, x_count, w_i, nbr_sum,
                 CAST(x_count AS DOUBLE) - xb AS z,
                 CAST(nbr_sum AS DOUBLE) - CAST(w_i AS DOUBLE) * xb AS lag,
                 sxxn - xb * xb AS m2
          FROM per
        )
        SELECT token, x_count, w_i, nbr_sum,
               round(z * lag / m2, 9) + 0.0 AS local_i,
               CASE WHEN z > 0.0 AND lag > 0.0 THEN 'HH'
                    WHEN z < 0.0 AND lag < 0.0 THEN 'LL'
                    WHEN z > 0.0 AND lag < 0.0 THEN 'HL'
                    WHEN z < 0.0 AND lag > 0.0 THEN 'LH'
                    ELSE 'NA' END AS quadrant
        FROM zl
        ORDER BY token
    """


def _q_std_dev_ellipse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard deviational ellipse per event type
    (spark/spatialstats.py std_dev_ellipse): mean center, major/minor
    axis, principal-axis rotation of each type's point cloud — the
    directional-distribution summary. Event coordinates are synthesized
    directly as INTEGER 1/83- and 1/79-degree units (exact BIGINTs by
    construction), so every moment aggregates exactly and the closed-form
    2x2 eigen-decomposition is one mirrored fixed-order double
    expression. Scale shape: ONE map-side-combined groupBy, no joins."""
    from gos2_spark.spark.spatialstats import std_dev_ellipse

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    pts = ev.select(
        "event_type",
        ((e * 11 % 120) * 83 + (e % 83) - 4980).alias("ilat"),
        ((e * 17 % 340) * 79 + (e % 79) - 13430).alias("ilng"),
    )
    out = std_dev_ellipse(
        pts, "event_type", "ilat", "ilng", lat_den=83, lng_den=79
    )
    return out.select(
        "event_type",
        "n",
        F.round("mean_lng", 9).alias("mean_lng"),
        F.round("mean_lat", 9).alias("mean_lat"),
        F.round("axis_major", 9).alias("axis_major"),
        F.round("axis_minor", 9).alias("axis_minor"),
        F.round("theta_rad", 9).alias("theta_rad"),
    ).orderBy("event_type")


def _sde_oracle_sql() -> str:
    return """
        WITH pts AS (
          SELECT event_type,
                 (event_id * 11 % 120) * 83 + (event_id % 83) - 4980 AS a,
                 (event_id * 17 % 340) * 79 + (event_id % 79) - 13430 AS b
          FROM events
        ),
        agg AS (
          SELECT event_type, count(*) AS n,
                 CAST(sum(a) AS BIGINT) AS sa, CAST(sum(b) AS BIGINT) AS sb,
                 CAST(sum(a * a) AS BIGINT) AS saa,
                 CAST(sum(b * b) AS BIGINT) AS sbb,
                 CAST(sum(a * b) AS BIGINT) AS sab
          FROM pts GROUP BY 1
        ),
        m AS (
          SELECT event_type, n,
                 CAST(n AS DOUBLE) AS nd,
                 (CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
                    / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) / 6241.0 AS vx,
                 (CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
                    / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) / 6889.0 AS vy,
                 (CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)
                    / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) / 6557.0 AS cxy,
                 CAST(sb AS DOUBLE) / CAST(n AS DOUBLE) / 79.0 AS mean_lng,
                 CAST(sa AS DOUBLE) / CAST(n AS DOUBLE) / 83.0 AS mean_lat
          FROM agg
        ),
        eig AS (
          SELECT *,
                 sqrt(((vx - vy) * 0.5) * ((vx - vy) * 0.5) + cxy * cxy)
                   AS com
          FROM m
        )
        SELECT event_type, n,
               round(mean_lng, 9) AS mean_lng,
               round(mean_lat, 9) AS mean_lat,
               round(sqrt(2.0 * ((vx + vy) * 0.5 + com)), 9) AS axis_major,
               round(sqrt(2.0 * greatest(0.0, (vx + vy) * 0.5 - com)), 9)
                 AS axis_minor,
               round(atan2(2.0 * cxy, vx - vy) * 0.5, 9) AS theta_rad
        FROM eig
        ORDER BY event_type
    """


def _q_mann_kendall_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend per level-5 cell over its daily event-count
    series (spark/spatialstats.py mann_kendall) — the 'emerging hot
    spot' scorer: S from pairwise signs, tie-corrected variance,
    continuity-corrected z, all from exact BIGINTs with one final float
    expression. Cells shorter than 10 observed days are dropped BEFORE
    the in-key pair join (semi-join pushdown bounds the quadratic)."""
    from gos2_spark.spark.functions import add_cellid_sql, s2_token
    from gos2_spark.spark.pages import s2_parent_sql
    from gos2_spark.spark.spatialstats import mann_kendall

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    pts = add_cellid_sql(
        ev.select(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
                "day"
            ),
            (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
            (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
        ),
        "lat", "lng", "cell_id",
    ).select(s2_parent_sql(F.col("cell_id"), 5).alias("cell"), "day")
    daily = pts.groupBy("cell", "day").agg(F.count("*").alias("n"))
    out = mann_kendall(daily, "cell", "day", "n", min_len=10)
    return out.select(
        s2_token(F.col("cell")).alias("token"),
        "n_obs",
        "s_stat",
        "tie_term",
        F.round("var_s", 9).alias("var_s"),
        F.round("mk_z", 9).alias("mk_z"),
        "trend",
    ).orderBy("token")


def _mann_kendall_oracle_sql() -> str:
    from gos2_spark.pipeline import duckdb_oracles as _DO

    lsb = 1 << 50  # level 5
    tok = _DO._token(f"((cell_id & -{lsb}) | {lsb})")
    return f"""
        WITH pts0 AS ({_EVENTS_LATLNG_SQL}),
        {_cellid_cte_duckdb("SELECT event_id AS key, lat, lng FROM pts0")},
        lv AS (
          SELECT {tok} AS token,
                 strftime(date_trunc('day', e.ts), '%Y-%m-%d') AS day
          FROM cells c JOIN events e ON e.event_id = c.key
        ),
        daily AS (
          SELECT token, day, count(*) AS n FROM lv GROUP BY 1, 2
        ),
        lens AS (
          SELECT token, count(*) AS n_obs FROM daily
          GROUP BY 1 HAVING count(*) >= 10
        ),
        s AS (
          SELECT a.token,
                 CAST(sum(sign(b.n - a.n)) AS BIGINT) AS s_stat
          FROM daily a JOIN daily b
            ON a.token = b.token AND a.day < b.day
          JOIN lens l ON l.token = a.token
          GROUP BY 1
        ),
        ties AS (
          SELECT token,
                 CAST(sum(tc * (tc - 1) * (2 * tc + 5)) AS BIGINT)
                   AS tie_term
          FROM (
            SELECT d.token, d.n, count(*) AS tc
            FROM daily d JOIN lens l ON l.token = d.token
            GROUP BY 1, 2
          ) t GROUP BY 1
        ),
        fin AS (
          SELECT lens.token, lens.n_obs, s.s_stat, ties.tie_term,
                 CAST(lens.n_obs * (lens.n_obs - 1) * (2 * lens.n_obs + 5)
                      - ties.tie_term AS DOUBLE) / 18.0 AS var_s
          FROM lens JOIN s ON s.token = lens.token
          JOIN ties ON ties.token = lens.token
        ),
        z AS (
          SELECT *,
                 CASE WHEN s_stat > 0
                        THEN (CAST(s_stat AS DOUBLE) - 1.0) / sqrt(var_s)
                      WHEN s_stat < 0
                        THEN (CAST(s_stat AS DOUBLE) + 1.0) / sqrt(var_s)
                      ELSE 0.0 END AS mk_z
          FROM fin
        )
        SELECT token, n_obs, s_stat, tie_term,
               round(var_s, 9) AS var_s,
               round(mk_z, 9) AS mk_z,
               CASE WHEN mk_z > 1.959963984540054 THEN 'increasing'
                    WHEN mk_z < -1.959963984540054 THEN 'decreasing'
                    ELSE 'none' END AS trend
        FROM z
        ORDER BY token
    """


def _q_knox_spacetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Knox space-time interaction test (spark/temporal.py
    knox_spacetime) over a deterministic 1-in-20 event subsample: are
    space-close pairs ALSO time-close? Ns from the engine's cell-blocked
    within-radius self-join, Nt from a time-block self-join, X from the
    time filter on the space pairs — no quadratic pass anywhere in the
    engine plan. The oracle brute-forces all pairs of the subsample with
    the identical xyz atan2 distance and integer epoch-second deltas."""
    from gos2_spark.spark.functions import add_cellid_sql
    from gos2_spark.spark.temporal import knox_spacetime

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    pts = add_cellid_sql(
        ev.select(
            "event_id", "ts",
            (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
            (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
        ).where(e % 20 == 0),
        "lat", "lng", "cell_id",
    )
    out = knox_spacetime(
        pts, space_radius_deg=5.0, time_window_sec=259200,
        point_key="event_id", time_col="ts",
    )
    return out.select(
        "n_points", "n_pairs", "ns", "nt", "x_both",
        F.round("expected", 9).alias("expected"),
        F.round("knox_ratio", 9).alias("knox_ratio"),
    )


def _knox_oracle_sql() -> str:
    import math as _m

    r = _m.radians(5.0)
    return f"""
        WITH pts0 AS ({_EVENTS_LATLNG_SQL}),
        sub AS (
          SELECT event_id, ts, lat, lng FROM pts0 WHERE event_id % 20 = 0
        ),
        v AS (
          SELECT event_id,
                 date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
                   AS t,
                 cos(radians(lng)) * cos(radians(lat)) AS x,
                 sin(radians(lng)) * cos(radians(lat)) AS y,
                 sin(radians(lat)) AS z
          FROM sub
        ),
        pairs AS (
          SELECT atan2(sqrt(
                     (a.y * b.z - a.z * b.y) * (a.y * b.z - a.z * b.y)
                   + (a.z * b.x - a.x * b.z) * (a.z * b.x - a.x * b.z)
                   + (a.x * b.y - a.y * b.x) * (a.x * b.y - a.y * b.x)),
                   a.x * b.x + a.y * b.y + a.z * b.z) <= {r!r} AS sc,
                 abs(a.t - b.t) <= 259200 AS tc
          FROM v a JOIN v b ON a.event_id < b.event_id
        ),
        agg AS (
          SELECT (SELECT count(*) FROM sub) AS n_points,
                 count(*) AS n_pairs,
                 CAST(sum(CASE WHEN sc THEN 1 ELSE 0 END) AS BIGINT) AS ns,
                 CAST(sum(CASE WHEN tc THEN 1 ELSE 0 END) AS BIGINT) AS nt,
                 CAST(sum(CASE WHEN sc AND tc THEN 1 ELSE 0 END) AS BIGINT)
                   AS x_both
          FROM pairs
        )
        SELECT n_points, n_pairs, ns, nt, x_both,
               round(CAST(ns AS DOUBLE) * CAST(nt AS DOUBLE)
                     / CAST(n_pairs AS DOUBLE), 9) AS expected,
               round(CAST(x_both AS DOUBLE)
                     / (CAST(ns AS DOUBLE) * CAST(nt AS DOUBLE)
                        / CAST(n_pairs AS DOUBLE)), 9) AS knox_ratio
        FROM agg
    """


def _q_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction (pipeline/graph.py adamic_adar) over
    the synthetic customer-key domain graph (the PageRank graph:
    src = key % 64, dst = (key*7+3) % 64): scores for every
    NON-adjacent unordered pair with >= 1 common neighbor. The
    1/ln(deg) terms are summed by a LEFT FOLD over the degree-sorted
    packed histogram, so the float result is bit-identical to the
    DuckDB list_reduce replay."""
    from gos2_spark.pipeline.graph import adamic_adar

    c = _load(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    edges = c.select(
        (k % 64).alias("src"), ((k * 7 + 3) % 64).alias("dst")
    ).distinct()
    out = adamic_adar(edges, "src", "dst")
    return out.select(
        "u", "v", "common_neighbors",
        F.round("aa_score", 9).alias("aa_score"),
    ).orderBy("u", "v")


def _adamic_adar_oracle_sql() -> str:
    return """
        WITH e AS (
          SELECT DISTINCT c_custkey % 64 AS src,
                          (c_custkey * 7 + 3) % 64 AS dst
          FROM customer
        ),
        sym AS (
          SELECT src AS a, dst AS b FROM e WHERE src != dst
          UNION
          SELECT dst, src FROM e WHERE src != dst
        ),
        deg AS (SELECT a, count(*) AS deg FROM sym GROUP BY 1),
        adj AS (
          SELECT s.a AS w, s.b AS u, d.deg
          FROM sym s JOIN deg d ON d.a = s.a
        ),
        wedges AS (
          SELECT l.u AS u, r.u AS v, l.deg AS wdeg
          FROM adj l JOIN adj r ON l.w = r.w AND l.u < r.u
        ),
        hist AS (
          SELECT u, v, wdeg, count(*) AS cnt FROM wedges GROUP BY 1, 2, 3
        ),
        per AS (
          SELECT u, v,
                 CAST(sum(cnt) AS BIGINT) AS common_neighbors,
                 list_sort(list((wdeg << 32) + cnt)) AS h
          FROM hist GROUP BY 1, 2
        ),
        scored AS (
          SELECT u, v, common_neighbors,
                 list_reduce(
                   list_prepend(0.0, list_transform(h,
                     p -> CAST((p & 4294967295) AS DOUBLE)
                          / ln(CAST((p >> 32) AS DOUBLE)))),
                   (acc, x) -> acc + x) AS aa_score
          FROM per
        )
        SELECT u, v, common_neighbors, round(aa_score, 9) AS aa_score
        FROM scored
        WHERE NOT EXISTS (
          SELECT 1 FROM sym WHERE sym.a = scored.u AND sym.b = scored.v
        )
        ORDER BY u, v
    """


def _q_acf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation (lags 1-3) of each event type's daily
    count series (spark/temporal.py acf_counts) — the periodicity probe.
    Integer sufficient statistics only (lagged cross-products, one-sided
    sums), one fixed-order final expression; the engine plan is three
    window lags + ONE map-side-combined groupBy."""
    from gos2_spark.spark.temporal import acf_counts

    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    daily = (
        ev.select(
            "event_type",
            F.floor(us / 86_400_000_000).cast("long").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("n"))
    )
    out = acf_counts(daily, "event_type", "day", "n", max_lag=3)
    return out.select(
        "event_type", "n_obs", "lag", F.round("acf", 9).alias("acf")
    ).orderBy("event_type", "lag")


def _acf_oracle_sql(max_lag: int = 3) -> str:
    lag_cols = ", ".join(
        f"lag(n, {k}) OVER (PARTITION BY event_type ORDER BY day) AS l{k}"
        for k in range(1, max_lag + 1)
    )
    per_lag = []
    for k in range(1, max_lag + 1):
        per_lag.append(f"""
          SELECT event_type, {k} AS lag,
                 count(*) AS n_obs,
                 CAST(sum(n) AS BIGINT) AS sx,
                 CAST(sum(n * n) AS BIGINT) AS sxx,
                 CAST(sum(CASE WHEN l{k} IS NOT NULL THEN n * l{k}
                          ELSE 0 END) AS BIGINT) AS p,
                 CAST(sum(CASE WHEN l{k} IS NOT NULL THEN n
                          ELSE 0 END) AS BIGINT) AS s1,
                 CAST(sum(CASE WHEN l{k} IS NOT NULL THEN l{k}
                          ELSE 0 END) AS BIGINT) AS s2,
                 CAST(sum(CASE WHEN l{k} IS NOT NULL THEN 1
                          ELSE 0 END) AS BIGINT) AS m
          FROM lagged GROUP BY 1""")
    union = " UNION ALL ".join(per_lag)
    return f"""
        WITH daily AS (
          SELECT event_type,
                 CAST(floor(CAST(date_diff('microsecond',
                      TIMESTAMP '1970-01-01 00:00:00', ts) AS DOUBLE)
                      / 86400000000) AS BIGINT) AS day,
                 count(*) AS n
          FROM events GROUP BY 1, 2
        ),
        lagged AS (
          SELECT event_type, day, n, {lag_cols} FROM daily
        ),
        stats AS ({union}),
        fin AS (
          SELECT event_type, lag, n_obs,
                 CAST(sx AS DOUBLE) / CAST(n_obs AS DOUBLE) AS xb,
                 CAST(p AS DOUBLE) AS pd, CAST(s1 AS DOUBLE) AS s1d,
                 CAST(s2 AS DOUBLE) AS s2d, CAST(m AS DOUBLE) AS md,
                 CAST(sxx AS DOUBLE) AS sxxd,
                 CAST(n_obs AS DOUBLE) AS nd
          FROM stats
        )
        SELECT event_type, n_obs, lag,
               round((pd - xb * s1d - xb * s2d + md * xb * xb)
                     / (sxxd - nd * xb * xb), 9) AS acf
        FROM fin
        ORDER BY event_type, lag
    """


def _q_dtw_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DTW distance between every pair of event types' daily-count
    series (spark/temporal.py dtw_distance_col): the alignment-tolerant
    shape comparison, evaluated as a NESTED Catalyst fold (outer walks
    one series carrying the previous DP row; inner builds the next row
    left-to-right). |int - int| costs in one fixed op order — the DuckDB
    nested-list_reduce replay is bit-identical. No shuffle beyond the
    two tiny aggs; the O(m*n) DP runs inside codegen."""
    from gos2_spark.spark.temporal import dtw_distance_col

    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    daily = (
        ev.select(
            "event_type",
            F.floor(us / 86_400_000_000).cast("long").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("n"))
    )
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "n"))),
            lambda s: s["n"],
        ).alias("arr"),
        F.count("*").alias("n_days"),
    )
    a = series.select(
        F.col("event_type").alias("type_a"),
        F.col("arr").alias("sa"),
        F.col("n_days").alias("days_a"),
    )
    b = series.select(
        F.col("event_type").alias("type_b"),
        F.col("arr").alias("sb"),
        F.col("n_days").alias("days_b"),
    )
    pairs = a.join(b, F.col("type_a") < F.col("type_b"))
    return pairs.select(
        "type_a", "type_b", "days_a", "days_b",
        F.round(dtw_distance_col(F.col("sa"), F.col("sb")), 9).alias(
            "dtw_cost"
        ),
    ).orderBy("type_a", "type_b")


def _dtw_oracle_sql() -> str:
    return """
        WITH daily AS (
          SELECT event_type,
                 CAST(floor(CAST(date_diff('microsecond',
                      TIMESTAMP '1970-01-01 00:00:00', ts) AS DOUBLE)
                      / 86400000000) AS BIGINT) AS day,
                 count(*) AS n
          FROM events GROUP BY 1, 2
        ),
        series AS (
          SELECT event_type,
                 list(n ORDER BY day) AS arr,
                 count(*) AS n_days
          FROM daily GROUP BY 1
        ),
        pairs AS (
          SELECT a.event_type AS type_a, b.event_type AS type_b,
                 a.arr AS sa, b.arr AS sb,
                 a.n_days AS days_a, b.n_days AS days_b
          FROM series a JOIN series b ON a.event_type < b.event_type
        ),
        dp AS (
          SELECT type_a, type_b, days_a, days_b,
                 list_reduce(
                   list_concat(
                     [list_concat([0.0], list_transform(sb, y -> 1.0e18))],
                     list_transform(sa, x -> [CAST(x AS DOUBLE)])),
                   (R, xx) -> list_reduce(
                     list_concat([[1.0e18]],
                                 list_transform(sb,
                                   y -> [CAST(y AS DOUBLE)])),
                     (N, yy) -> list_append(N,
                       abs(xx[1] - yy[1])
                       + least(R[len(N) + 1], R[len(N)], N[len(N)])))
                 ) AS row
          FROM pairs
        )
        SELECT type_a, type_b, days_a, days_b,
               round(row[len(row)], 9) AS dtw_cost
        FROM dp ORDER BY type_a, type_b
    """


def _q_frechet_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete Frechet distance between the trajectories of users 0-9
    (spark/trajectory.py frechet_distance_col): the order-aware 'dog
    leash' similarity, a nested Catalyst fold over the previous DP row
    with the reference's atan2(|a x b|, a . b) angle metric computed
    per cell — bit-identical to the DuckDB nested-list_reduce replay.
    The 10-user cohort bound stands in for the covering-cell overlap
    prefilter that bounds candidate pairs at scale (same contract as
    trajectory_hausdorff)."""
    from gos2_spark.spark.trajectory import frechet_distance_col

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    pts = ev.where(F.col("user_id") < 10).select(
        "user_id", "ts", "event_id",
        (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
        (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
    )
    rlat, rlng = F.radians("lat"), F.radians("lng")
    xyz = pts.select(
        "user_id", "ts", "event_id",
        F.struct(
            (F.cos(rlng) * F.cos(rlat)).alias("x"),
            (F.sin(rlng) * F.cos(rlat)).alias("y"),
            F.sin(rlat).alias("z"),
        ).alias("p"),
    )
    traj = xyz.groupBy("user_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ts", "event_id", "p"))),
            lambda s: s["p"],
        ).alias("tr"),
        F.count("*").alias("n_pts"),
    )
    a = traj.select(
        F.col("user_id").alias("user_a"),
        F.col("tr").alias("ta"),
        F.col("n_pts").alias("pts_a"),
    )
    b = traj.select(
        F.col("user_id").alias("user_b"),
        F.col("tr").alias("tb"),
        F.col("n_pts").alias("pts_b"),
    )
    pairs = a.join(b, F.col("user_a") < F.col("user_b"))
    return pairs.select(
        "user_a", "user_b", "pts_a", "pts_b",
        F.round(
            frechet_distance_col(F.col("ta"), F.col("tb")), 9
        ).alias("frechet_rad"),
    ).orderBy("user_a", "user_b")


def _frechet_oracle_sql() -> str:
    return f"""
        WITH pts0 AS ({_EVENTS_LATLNG_SQL}),
        xyz AS (
          SELECT user_id, ts, event_id,
                 cos(radians(lng)) * cos(radians(lat)) AS x,
                 sin(radians(lng)) * cos(radians(lat)) AS y,
                 sin(radians(lat)) AS z
          FROM pts0 WHERE user_id < 10
        ),
        traj AS (
          SELECT user_id,
                 list([x, y, z] ORDER BY ts, event_id) AS tr,
                 count(*) AS n_pts
          FROM xyz GROUP BY 1
        ),
        pairs AS (
          SELECT a.user_id AS user_a, b.user_id AS user_b,
                 a.tr AS ta, b.tr AS tb,
                 a.n_pts AS pts_a, b.n_pts AS pts_b
          FROM traj a JOIN traj b ON a.user_id < b.user_id
        ),
        dp AS (
          SELECT user_a, user_b, pts_a, pts_b,
                 list_reduce(
                   list_concat(
                     [list_concat([0.0],
                        list_transform(tb, y -> 1.0e18))],
                     ta),
                   (R, xx) -> list_reduce(
                     list_concat([[1.0e18]], tb),
                     (N, yy) -> list_append(N,
                       greatest(
                         atan2(sqrt(
                             (xx[2] * yy[3] - xx[3] * yy[2])
                           * (xx[2] * yy[3] - xx[3] * yy[2])
                           + (xx[3] * yy[1] - xx[1] * yy[3])
                           * (xx[3] * yy[1] - xx[1] * yy[3])
                           + (xx[1] * yy[2] - xx[2] * yy[1])
                           * (xx[1] * yy[2] - xx[2] * yy[1])),
                           xx[1] * yy[1] + xx[2] * yy[2]
                           + xx[3] * yy[3]),
                         least(R[len(N) + 1], R[len(N)], N[len(N)]))))
                 ) AS row
          FROM pairs
        )
        SELECT user_a, user_b, pts_a, pts_b,
               round(row[len(row)], 9) AS frechet_rad
        FROM dp ORDER BY user_a, user_b
    """


def _q_bearing_circular_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Circular statistics of each user's leg bearings
    (spark/spatialstats.py circular_fold): mean direction, mean
    resultant length, circular variance — the directional-persistence
    summary (commuters vs wanderers). The (C, S) resultant components
    come from ONE ordered sequential fold per user, so the float sums
    are bit-identical to the DuckDB list_reduce replay; everything
    after is a fixed-order scalar expression."""
    from pyspark.sql import Window

    from gos2_spark.spark.functions import initial_bearing_rad
    from gos2_spark.spark.spatialstats import circular_fold

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    pts = ev.select(
        "user_id", "ts", "event_id",
        (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
        (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    legs = pts.select(
        "user_id", "ts", "event_id",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lng").over(w).alias("plng"),
        "lat", "lng",
    ).where(F.col("plat").isNotNull())
    legs = legs.select(
        "user_id", "ts", "event_id",
        initial_bearing_rad(
            F.col("plat"), F.col("plng"), F.col("lat"), F.col("lng")
        ).alias("bearing"),
    )
    arrs = legs.groupBy("user_id").agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "bearing"))
            ),
            lambda s: s["bearing"],
        ).alias("bs"),
        F.count("*").alias("n_legs"),
    )
    c, s = circular_fold(F.col("bs"))
    nd = F.col("n_legs").cast("double")
    rbar = F.sqrt(c * c + s * s) / nd
    return arrs.select(
        "user_id",
        "n_legs",
        F.round(F.atan2(s, c), 9).alias("mean_dir_rad"),
        F.round(rbar, 9).alias("r_bar"),
        F.round(1.0 - rbar, 9).alias("circ_var"),
    ).orderBy("user_id")


def _circular_oracle_sql() -> str:
    import math as _m

    return f"""
        WITH pts AS ({_EVENTS_LATLNG_SQL}),
        lagged AS (
          SELECT user_id, ts, event_id,
                 lag(lat) OVER w AS plat, lag(lng) OVER w AS plng,
                 lat, lng
          FROM pts
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        b0 AS (
          SELECT user_id, ts, event_id,
                 atan2(
                   sin(radians(lng) - radians(plng)) * cos(radians(lat)),
                   cos(radians(plat)) * sin(radians(lat))
                   - sin(radians(plat)) * cos(radians(lat))
                     * cos(radians(lng) - radians(plng))) AS braw
          FROM lagged WHERE plat IS NOT NULL
        ),
        b AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN braw < 0.0 THEN braw + {2.0 * _m.pi!r}
                      ELSE braw END AS bearing
          FROM b0
        ),
        arrs AS (
          SELECT user_id,
                 list_concat([[0.0, 0.0]],
                             list([bearing, 0.0] ORDER BY ts, event_id))
                   AS arr,
                 count(*) AS n_legs
          FROM b GROUP BY 1
        ),
        folded AS (
          SELECT user_id, n_legs,
                 list_reduce(arr, (acc, x) ->
                   [acc[1] + cos(x[1]), acc[2] + sin(x[1])]) AS cs
          FROM arrs
        )
        SELECT user_id, n_legs,
               round(atan2(cs[2], cs[1]), 9) AS mean_dir_rad,
               round(sqrt(cs[1] * cs[1] + cs[2] * cs[2])
                     / CAST(n_legs AS DOUBLE), 9) AS r_bar,
               round(1.0 - sqrt(cs[1] * cs[1] + cs[2] * cs[2])
                     / CAST(n_legs AS DOUBLE), 9) AS circ_var
        FROM folded ORDER BY user_id
    """


def _q_join_count_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-count statistics (binary BB/WW/BW spatial autocorrelation):
    occupied level-5 cells marked Black when >= 2 points land in them,
    counted over directed 4-edge-neighbor occupied pairs vs the
    nonfree-sampling independence expectation E[BW] =
    W * 2 nB nW / (n (n-1)). Every count is an exact BIGINT; the
    expectation/ratio is one mirrored float expression."""
    from gos2_spark.pipeline.graph import _default_materialize
    from gos2_spark.spark.functions import s2_edge_neighbors
    from gos2_spark.spark.pages import s2_parent_sql

    pts = _cust_points(spark, sf_dir)
    counts = _default_materialize(spark)(
        pts.groupBy(s2_parent_sql(F.col("cell_id"), 5).alias("cell"))
        .agg(F.count("*").alias("n"))
        .select("cell", (F.col("n") >= 2).cast("long").alias("m"))
    )
    pairs = counts.select(
        F.col("m").alias("mi"),
        F.explode(s2_edge_neighbors(F.col("cell"))).alias("cj"),
    ).join(
        counts.select(F.col("cell").alias("cj"), F.col("m").alias("mj")),
        "cj",
    )
    pj = pairs.agg(
        F.count("*").alias("w_pairs"),
        F.coalesce(F.sum(F.col("mi") * F.col("mj")), F.lit(0)).alias("jbb"),
        F.coalesce(
            F.sum((1 - F.col("mi")) * (1 - F.col("mj"))), F.lit(0)
        ).alias("jww"),
        F.coalesce(
            F.sum(
                F.col("mi") * (1 - F.col("mj"))
                + (1 - F.col("mi")) * F.col("mj")
            ),
            F.lit(0),
        ).alias("jbw"),
    )
    cs = counts.agg(
        F.count("*").alias("n_cells"),
        F.sum("m").alias("n_black"),
    )
    j = cs.crossJoin(F.broadcast(pj))
    nb = F.col("n_black").cast("double")
    nw = (F.col("n_cells") - F.col("n_black")).cast("double")
    nd = F.col("n_cells").cast("double")
    ebw = (
        F.col("w_pairs").cast("double")
        * (2.0 * nb * nw)
        / (nd * (nd - 1.0))
    )
    return j.select(
        "n_cells", "n_black", "w_pairs", "jbb", "jww", "jbw",
        F.round(ebw, 9).alias("expected_bw"),
        F.round(
            F.when(ebw > 0.0, F.col("jbw").cast("double") / ebw).otherwise(
                F.lit(0.0)
            ),
            9,
        ).alias("bw_ratio"),
    )


def _join_count_oracle_sql() -> str:
    from gos2_spark.pipeline import duckdb_oracles as _DO

    pairs = _DO.edge_neighbors_l8_oracle_sql(
        _cellid_cte_duckdb(_CUST_LATLNG_SQL), level=5
    )
    lsb = 1 << 50  # level 5
    tok = _DO._token(f"((cell_id & -{lsb}) | {lsb})")
    return f"""
        WITH pairs AS ({pairs}),
        {_cellid_cte_duckdb(_CUST_LATLNG_SQL)},
        cnt AS (
          SELECT {tok} AS token,
                 CASE WHEN count(*) >= 2 THEN 1 ELSE 0 END AS m
          FROM cells GROUP BY 1
        ),
        pj AS (
          SELECT count(*) AS w_pairs,
                 CAST(COALESCE(sum(c1.m * c2.m), 0) AS BIGINT) AS jbb,
                 CAST(COALESCE(sum((1 - c1.m) * (1 - c2.m)), 0)
                      AS BIGINT) AS jww,
                 CAST(COALESCE(sum(c1.m * (1 - c2.m) + (1 - c1.m) * c2.m),
                      0) AS BIGINT) AS jbw
          FROM pairs p
          JOIN cnt c1 ON c1.token = p.token
          JOIN cnt c2 ON c2.token = p.nbr_token
        ),
        cs AS (
          SELECT count(*) AS n_cells,
                 CAST(sum(m) AS BIGINT) AS n_black
          FROM cnt
        ),
        f AS (
          SELECT *,
                 CAST(w_pairs AS DOUBLE)
                 * (2.0 * CAST(n_black AS DOUBLE)
                    * CAST(n_cells - n_black AS DOUBLE))
                 / (CAST(n_cells AS DOUBLE)
                    * (CAST(n_cells AS DOUBLE) - 1.0)) AS ebw
          FROM cs, pj
        )
        SELECT n_cells, n_black, w_pairs, jbb, jww, jbw,
               round(ebw, 9) AS expected_bw,
               round(CASE WHEN ebw > 0.0 THEN CAST(jbw AS DOUBLE) / ebw
                     ELSE 0.0 END, 9) AS bw_ratio
        FROM f
    """


def _q_hex_kring_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=1-ring focal mean over the hex density grid
    (spark/hexgrid.py hex_kring_smooth): the H3-kRing-style smoother on
    the axial hex topology — pure integer neighbor arithmetic, no
    projection wrap cases. Ring sums/counts are exact BIGINTs over
    occupied cells; the mean is one division. One bounded 7x explode +
    one equi-join + keyed agg."""
    from gos2_spark.spark.hexgrid import hex_kring_smooth, hexbin_counts

    pts = _cust_points(spark, sf_dir)
    counts = hexbin_counts(pts, size=0.35)
    out = hex_kring_smooth(counts)
    return out.select(
        "hq", "hr", "n", "ring_cells", "ring_sum",
        F.round("smooth", 9).alias("smooth"),
    ).orderBy("hq", "hr")


def _hex_kring_oracle_sql(size: float = 0.35) -> str:
    from gos2_spark.spark.hexgrid import _HEX_DIRS, hex_axial_sql

    offs = ", ".join(f"({dq}, {dr})" for dq, dr in [(0, 0), *_HEX_DIRS])
    return f"""
        WITH pts AS ({_CUST_LATLNG_SQL}),
        h AS ({hex_axial_sql(size)} FROM pts),
        cnt AS (
          SELECT hq, hr, CAST(count(*) AS BIGINT) AS n
          FROM h GROUP BY 1, 2
        ),
        offs(dq, dr) AS (VALUES {offs}),
        ring AS (
          SELECT c.hq, c.hr,
                 count(*) AS ring_cells,
                 CAST(sum(o2.n) AS BIGINT) AS ring_sum
          FROM cnt c
          CROSS JOIN offs
          JOIN cnt o2 ON o2.hq = c.hq + offs.dq AND o2.hr = c.hr + offs.dr
          GROUP BY 1, 2
        )
        SELECT c.hq, c.hr, c.n, r.ring_cells, r.ring_sum,
               round(CAST(r.ring_sum AS DOUBLE)
                     / CAST(r.ring_cells AS DOUBLE), 9) AS smooth
        FROM cnt c JOIN ring r ON r.hq = c.hq AND r.hr = c.hr
        ORDER BY c.hq, c.hr
    """


def _q_hex_flow_dir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Steepest-descent flow direction over a synthetic hex elevation
    field (spark/hexgrid.py hex_flow_directions) — the D8 hydrology
    kernel on the hex (D6) grid: every occupied cell flows to its lowest
    strictly-lower occupied neighbor, local minima are sinks. Elevation
    is deterministic integer hash arithmetic of (hq, hr); every
    comparison is BIGINT, the argmin tie-break is (elev, direction
    index) — exact cross-engine."""
    from gos2_spark.spark.hexgrid import hex_flow_directions, hexbin_counts

    pts = _cust_points(spark, sf_dir)
    cells = hexbin_counts(pts, size=0.35).select("hq", "hr")
    elev = (
        (F.col("hq") * 1103515245 + F.col("hr") * 12345) % 10007 + 10007
    ) % 10007
    out = hex_flow_directions(cells.withColumn("elev", elev))
    return out.orderBy("hq", "hr")


def _hex_flow_oracle_sql(size: float = 0.35) -> str:
    from gos2_spark.spark.hexgrid import _HEX_DIRS, hex_axial_sql

    dirs = ", ".join(f"({d}, {dq}, {dr})" for d, (dq, dr) in enumerate(_HEX_DIRS))
    return f"""
        WITH pts AS ({_CUST_LATLNG_SQL}),
        h AS ({hex_axial_sql(size)} FROM pts),
        cells AS (
          SELECT hq, hr,
                 ((hq * 1103515245 + hr * 12345) % 10007 + 10007) % 10007
                   AS elev
          FROM h GROUP BY 1, 2
        ),
        dirs(d, dq, dr) AS (VALUES {dirs}),
        lower_nb AS (
          SELECT c.hq, c.hr, dirs.d, o.elev AS ne
          FROM cells c
          CROSS JOIN dirs
          JOIN cells o ON o.hq = c.hq + dirs.dq AND o.hr = c.hr + dirs.dr
          WHERE o.elev < c.elev
        ),
        best AS (
          SELECT hq, hr, d FROM (
            SELECT hq, hr, d,
                   row_number() OVER (
                     PARTITION BY hq, hr ORDER BY ne, d) AS rn
            FROM lower_nb
          ) t WHERE rn = 1
        )
        SELECT c.hq, c.hr, c.elev,
               CAST(COALESCE(b.d, -1) AS INT) AS flow_dir,
               b.d IS NULL AS is_sink
        FROM cells c LEFT JOIN best b ON b.hq = c.hq AND b.hr = c.hr
        ORDER BY c.hq, c.hr
    """


def _q_sitemap_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap XML ingestion (the crawl-frontier feeder): synthetic
    sitemap documents are parsed with native regexp_extract_all (<loc>
    entries), URLs explode to (host, path), and the per-host rollup
    reports URL counts, distinct paths, and the latest lastmod day
    (derived from the path id, so no array zip is needed). Pure JVM
    regex + one agg; RE2-compatible pattern shared with the oracle."""
    docs = _load(spark, sf_dir, "documents")
    d = F.col("doc_id")
    k = (d % 20).cast("string")
    m1 = (d % 125).cast("string")
    m2 = ((d * 3) % 125).cast("string")
    m3 = ((d * 7 + 1) % 125).cast("string")
    xml = F.concat(
        F.lit('<?xml version="1.0"?><urlset>'),
        F.lit("<url><loc>https://site"), k, F.lit(".example/p/"), m1,
        F.lit("</loc></url>"),
        F.lit("<url><loc>https://site"), k, F.lit(".example/q/"), m2,
        F.lit("</loc></url>"),
        F.lit("<url><loc>https://site"), k, F.lit(".example/p/"), m3,
        F.lit("</loc></url>"),
        F.lit("</urlset>"),
    )
    pages = docs.select(xml.alias("xml"))
    locs = pages.select(
        F.explode(
            F.regexp_extract_all(F.col("xml"), F.lit("<loc>([^<]+)</loc>"), 1)
        ).alias("loc")
    )
    parsed = locs.select(
        F.regexp_extract(F.col("loc"), r"https://([^/]+)/", 1).alias("host"),
        F.regexp_extract(F.col("loc"), r"/([0-9]+)$", 1)
        .cast("long")
        .alias("page_id"),
    )
    return (
        parsed.groupBy("host")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("page_id").alias("n_distinct_pages"),
            ((F.max("page_id") % 28) + 1).alias("latest_day"),
        )
        .orderBy("host")
    )


def _sitemap_oracle_sql() -> str:
    return """
        WITH docs AS (
          SELECT doc_id,
                 '<?xml version="1.0"?><urlset>'
                 || '<url><loc>https://site' || CAST(doc_id % 20 AS VARCHAR)
                 || '.example/p/' || CAST(doc_id % 125 AS VARCHAR)
                 || '</loc></url>'
                 || '<url><loc>https://site' || CAST(doc_id % 20 AS VARCHAR)
                 || '.example/q/' || CAST((doc_id * 3) % 125 AS VARCHAR)
                 || '</loc></url>'
                 || '<url><loc>https://site' || CAST(doc_id % 20 AS VARCHAR)
                 || '.example/p/' || CAST((doc_id * 7 + 1) % 125 AS VARCHAR)
                 || '</loc></url>'
                 || '</urlset>' AS xml
          FROM documents
        ),
        locs AS (
          SELECT unnest(regexp_extract_all(xml, '<loc>([^<]+)</loc>', 1))
            AS loc
          FROM docs
        ),
        parsed AS (
          SELECT regexp_extract(loc, 'https://([^/]+)/', 1) AS host,
                 CAST(regexp_extract(loc, '/([0-9]+)$', 1) AS BIGINT)
                   AS page_id
          FROM locs
        )
        SELECT host,
               count(*) AS n_urls,
               count(DISTINCT page_id) AS n_distinct_pages,
               (max(page_id) % 28) + 1 AS latest_day
        FROM parsed GROUP BY host ORDER BY host
    """


def _q_weekday_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday-profile uniformity test per event type: chi-square
    statistic against the uniform 7-day expectation in the zero-fill-free
    closed form chi2 = 7 * sum(O_d^2) / n - n (algebraically equal to
    sum over ALL 7 days of (O-E)^2/E with E = n/7, so missing weekdays
    need no spine). Weekday is pure integer arithmetic on the epoch day
    ((day + 4) mod 7; 1970-01-01 was a Thursday) — no engine calendar
    functions, no timezone exposure. Two map-side-combined aggs."""
    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    day = F.floor(us / 86_400_000_000).cast("long")
    dow = (day + 4) % 7
    byd = (
        ev.select("event_type", dow.alias("dow"))
        .groupBy("event_type", "dow")
        .agg(F.count("*").alias("o"))
    )
    per = byd.groupBy("event_type").agg(
        F.sum("o").alias("n"),
        F.sum(F.col("o") * F.col("o")).alias("ssq"),
        F.count("*").alias("days_present"),
    )
    chi2 = (
        7.0 * F.col("ssq").cast("double") / F.col("n").cast("double")
        - F.col("n").cast("double")
    )
    return per.select(
        "event_type", "n", "days_present",
        F.round(chi2, 9).alias("chi2"),
    ).orderBy("event_type")


def _weekday_chisq_oracle_sql() -> str:
    return """
        WITH byd AS (
          SELECT event_type,
                 (CAST(floor(CAST(date_diff('microsecond',
                      TIMESTAMP '1970-01-01 00:00:00', ts) AS DOUBLE)
                      / 86400000000) AS BIGINT) + 4) % 7 AS dow,
                 count(*) AS o
          FROM events GROUP BY 1, 2
        ),
        per AS (
          SELECT event_type,
                 CAST(sum(o) AS BIGINT) AS n,
                 CAST(sum(o * o) AS BIGINT) AS ssq,
                 count(*) AS days_present
          FROM byd GROUP BY 1
        )
        SELECT event_type, n, days_present,
               round(7.0 * CAST(ssq AS DOUBLE) / CAST(n AS DOUBLE)
                     - CAST(n AS DOUBLE), 9) AS chi2
        FROM per ORDER BY event_type
    """


def _q_lcss_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LCSS trajectory similarity for users 0-9 (spark/trajectory.py
    lcss_length_col): longest common subsequence under an eps = 0.05 rad
    spatial match — the noise-robust member of the trajectory-similarity
    family (outliers fail to match instead of dominating, unlike
    Frechet/Hausdorff). Integer DP as the same nested Catalyst fold;
    match predicate is the identical atan2 angle on both engines.
    similarity = L / min(m, n)."""
    from gos2_spark.spark.trajectory import lcss_length_col

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    pts = ev.where(F.col("user_id") < 10).select(
        "user_id", "ts", "event_id",
        (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
        (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
    )
    rlat, rlng = F.radians("lat"), F.radians("lng")
    xyz = pts.select(
        "user_id", "ts", "event_id",
        F.struct(
            (F.cos(rlng) * F.cos(rlat)).alias("x"),
            (F.sin(rlng) * F.cos(rlat)).alias("y"),
            F.sin(rlat).alias("z"),
        ).alias("p"),
    )
    traj = xyz.groupBy("user_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ts", "event_id", "p"))),
            lambda s: s["p"],
        ).alias("tr"),
        F.count("*").alias("n_pts"),
    )
    a = traj.select(
        F.col("user_id").alias("user_a"),
        F.col("tr").alias("ta"),
        F.col("n_pts").alias("pts_a"),
    )
    b = traj.select(
        F.col("user_id").alias("user_b"),
        F.col("tr").alias("tb"),
        F.col("n_pts").alias("pts_b"),
    )
    pairs = a.join(b, F.col("user_a") < F.col("user_b"))
    lcss = lcss_length_col(F.col("ta"), F.col("tb"), eps_rad=0.05)
    return pairs.select(
        "user_a", "user_b", "pts_a", "pts_b",
        lcss.alias("lcss_len"),
        F.round(
            lcss.cast("double")
            / F.least(F.col("pts_a"), F.col("pts_b")).cast("double"),
            9,
        ).alias("lcss_sim"),
    ).orderBy("user_a", "user_b")


def _lcss_oracle_sql(eps_rad: float = 0.05) -> str:
    return f"""
        WITH pts0 AS ({_EVENTS_LATLNG_SQL}),
        xyz AS (
          SELECT user_id, ts, event_id,
                 cos(radians(lng)) * cos(radians(lat)) AS x,
                 sin(radians(lng)) * cos(radians(lat)) AS y,
                 sin(radians(lat)) AS z
          FROM pts0 WHERE user_id < 10
        ),
        traj AS (
          SELECT user_id,
                 list([x, y, z] ORDER BY ts, event_id) AS tr,
                 count(*) AS n_pts
          FROM xyz GROUP BY 1
        ),
        pairs AS (
          SELECT a.user_id AS user_a, b.user_id AS user_b,
                 a.tr AS ta, b.tr AS tb,
                 a.n_pts AS pts_a, b.n_pts AS pts_b
          FROM traj a JOIN traj b ON a.user_id < b.user_id
        ),
        dp AS (
          SELECT user_a, user_b, pts_a, pts_b,
                 list_reduce(
                   list_concat(
                     [list_concat([0.0],
                        list_transform(tb, y -> 0.0))],
                     ta),
                   (R, xx) -> list_reduce(
                     list_concat([[0.0]], tb),
                     (N, yy) -> list_append(N,
                       CASE WHEN
                         atan2(sqrt(
                             (xx[2] * yy[3] - xx[3] * yy[2])
                           * (xx[2] * yy[3] - xx[3] * yy[2])
                           + (xx[3] * yy[1] - xx[1] * yy[3])
                           * (xx[3] * yy[1] - xx[1] * yy[3])
                           + (xx[1] * yy[2] - xx[2] * yy[1])
                           * (xx[1] * yy[2] - xx[2] * yy[1])),
                           xx[1] * yy[1] + xx[2] * yy[2]
                           + xx[3] * yy[3]) <= {eps_rad!r}
                       THEN R[len(N)] + 1.0
                       ELSE greatest(R[len(N) + 1], N[len(N)]) END))
                 ) AS row
          FROM pairs
        )
        SELECT user_a, user_b, pts_a, pts_b,
               CAST(row[len(row)] AS BIGINT) AS lcss_len,
               round(row[len(row)]
                     / CAST(least(pts_a, pts_b) AS DOUBLE), 9) AS lcss_sim
        FROM dp ORDER BY user_a, user_b
    """


def _q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between every pair of event types'
    daily-count series (paired on shared days): concordant-minus-
    discordant pairwise signs with tie-corrected denominators — the
    robust 'do these move together' screen. S, n0, and both tie terms
    are exact BIGINTs from an in-pair day self-join; tau is one mirrored
    float expression."""
    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    daily = (
        ev.select(
            "event_type",
            F.floor(us / 86_400_000_000).cast("long").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("n"))
    )
    a = daily.select(
        F.col("event_type").alias("type_a"),
        "day",
        F.col("n").alias("x"),
    )
    b = daily.select(
        F.col("event_type").alias("type_b"),
        "day",
        F.col("n").alias("y"),
    )
    paired = a.join(b, "day").where(F.col("type_a") < F.col("type_b"))
    p1 = paired.select(
        "type_a", "type_b", F.col("day").alias("d1"),
        F.col("x").alias("x1"), F.col("y").alias("y1"),
    )
    p2 = paired.select(
        "type_a", "type_b", F.col("day").alias("d2"),
        F.col("x").alias("x2"), F.col("y").alias("y2"),
    )
    dd = p1.join(p2, ["type_a", "type_b"]).where(F.col("d1") < F.col("d2"))
    sgn = lambda c: F.signum(c.cast("double")).cast("long")  # noqa: E731
    agg = dd.groupBy("type_a", "type_b").agg(
        F.count("*").alias("n0"),
        F.sum(
            sgn(F.col("x2") - F.col("x1")) * sgn(F.col("y2") - F.col("y1"))
        ).alias("s_stat"),
        F.sum(
            F.when(F.col("x1") == F.col("x2"), F.lit(1)).otherwise(F.lit(0))
        ).alias("tx"),
        F.sum(
            F.when(F.col("y1") == F.col("y2"), F.lit(1)).otherwise(F.lit(0))
        ).alias("ty"),
    )
    den = F.sqrt(
        (F.col("n0") - F.col("tx")).cast("double")
        * (F.col("n0") - F.col("ty")).cast("double")
    )
    tau = F.when(
        den > 0.0, F.col("s_stat").cast("double") / den
    ).otherwise(F.lit(0.0))
    return agg.select(
        "type_a", "type_b", "n0", "s_stat", "tx", "ty",
        F.round(tau, 9).alias("tau_b"),
    ).orderBy("type_a", "type_b")


def _kendall_oracle_sql() -> str:
    return """
        WITH daily AS (
          SELECT event_type,
                 CAST(floor(CAST(date_diff('microsecond',
                      TIMESTAMP '1970-01-01 00:00:00', ts) AS DOUBLE)
                      / 86400000000) AS BIGINT) AS day,
                 count(*) AS n
          FROM events GROUP BY 1, 2
        ),
        paired AS (
          SELECT a.event_type AS type_a, b.event_type AS type_b,
                 a.day, a.n AS x, b.n AS y
          FROM daily a JOIN daily b
            ON a.day = b.day AND a.event_type < b.event_type
        ),
        dd AS (
          SELECT p1.type_a, p1.type_b,
                 p1.x AS x1, p1.y AS y1, p2.x AS x2, p2.y AS y2
          FROM paired p1 JOIN paired p2
            ON p1.type_a = p2.type_a AND p1.type_b = p2.type_b
           AND p1.day < p2.day
        ),
        agg AS (
          SELECT type_a, type_b,
                 count(*) AS n0,
                 CAST(sum(sign(x2 - x1) * sign(y2 - y1)) AS BIGINT)
                   AS s_stat,
                 CAST(sum(CASE WHEN x1 = x2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS tx,
                 CAST(sum(CASE WHEN y1 = y2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS ty
          FROM dd GROUP BY 1, 2
        )
        SELECT type_a, type_b, n0, s_stat, tx, ty,
               round(CASE WHEN sqrt(CAST(n0 - tx AS DOUBLE)
                                    * CAST(n0 - ty AS DOUBLE)) > 0.0
                     THEN CAST(s_stat AS DOUBLE)
                          / sqrt(CAST(n0 - tx AS DOUBLE)
                                 * CAST(n0 - ty AS DOUBLE))
                     ELSE 0.0 END, 9) AS tau_b
        FROM agg ORDER BY type_a, type_b
    """


def _q_ppr_seed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from seed node 0 over the synthetic
    customer-key domain graph (pipeline/graph.py personalized_pagerank):
    teleport AND dangling mass concentrate on the seed — 'importance
    relative to this host'. 3 fixed iterations, unrolled-CTE oracle."""
    from gos2_spark.pipeline.graph import personalized_pagerank

    c = _load(spark, sf_dir, "customer")
    edges = c.select(
        (F.col("c_custkey") % 64).alias("src"),
        ((F.col("c_custkey") * 7 + 3) % 64).alias("dst"),
    )
    ranks = personalized_pagerank(edges, seed=0, iterations=3, damping=0.85)
    return ranks.select(
        "node", F.round("rank", 9).alias("rank")
    ).orderBy("node")


def _ppr_oracle_sql(iterations: int = 3, damping: float = 0.85) -> str:
    d = damping
    sql = """
        WITH e AS (
          SELECT DISTINCT c_custkey % 64 AS src,
                          (c_custkey * 7 + 3) % 64 AS dst
          FROM customer
        ),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        deg AS (SELECT src, count(*) AS out_deg FROM e GROUP BY 1),
        w AS (
          SELECT e.src, e.dst, CAST(1 AS DOUBLE) / deg.out_deg AS w
          FROM e JOIN deg USING (src)
        ),
        r0 AS (SELECT node,
                      CASE WHEN node = 0 THEN 1.0 ELSE 0.0 END AS rank
               FROM nodes)
    """
    prev = "r0"
    for i in range(1, iterations + 1):
        sql += f""",
        c{i} AS (
          SELECT w.dst, sum({prev}.rank * w.w) AS contrib
          FROM w JOIN {prev} ON w.src = {prev}.node GROUP BY 1
        ),
        f{i} AS (SELECT sum(contrib) AS flowed FROM c{i}),
        r{i} AS (
          SELECT nodes.node,
                 (1.0 - {d}) * (CASE WHEN nodes.node = 0
                                THEN 1.0 ELSE 0.0 END)
                   + {d} * (1.0 - coalesce(f{i}.flowed, 0.0))
                     * (CASE WHEN nodes.node = 0 THEN 1.0 ELSE 0.0 END)
                   + {d} * coalesce(c{i}.contrib, 0.0) AS rank
          FROM nodes LEFT JOIN c{i} ON nodes.node = c{i}.dst, f{i}
        )
    """
        prev = f"r{i}"
    sql += f"""
        SELECT node, round(rank, 9) AS rank FROM {prev} ORDER BY node
    """
    return sql


def _q_hex_flow_acc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flow accumulation over the D6 drainage graph (spark/hexgrid.py
    hex_flow_accumulation): upstream catchment size per hex cell — every
    cell routes one unit down its steepest-descent path (hash-elevation
    field as in hex_flow_directions), flow_acc counts the units passing
    through each cell, itself included. Token-walk rounds (one equi-join
    + one map-side-combined sum per round, frontier bounded by occupied
    cells); paths strictly descend so the step-capped walk reaches the
    exact fixpoint, and the oracle replays it with a recursive CTE
    capped at the same depth. All counts BIGINT — exact cross-engine."""
    from gos2_spark.spark.hexgrid import hex_flow_accumulation, hexbin_counts

    pts = _cust_points(spark, sf_dir)
    cells = hexbin_counts(pts, size=0.35).select("hq", "hr")
    elev = (
        (F.col("hq") * 1103515245 + F.col("hr") * 12345) % 10007 + 10007
    ) % 10007
    out = hex_flow_accumulation(
        cells.withColumn("elev", elev), max_steps=16
    )
    return out.orderBy("hq", "hr")


def _hex_flow_acc_oracle_sql(size: float = 0.35, max_steps: int = 16) -> str:
    from gos2_spark.spark.hexgrid import _HEX_DIRS, hex_axial_sql

    dirs = ", ".join(
        f"({d}, {dq}, {dr})" for d, (dq, dr) in enumerate(_HEX_DIRS)
    )
    return f"""
        WITH RECURSIVE pts AS ({_CUST_LATLNG_SQL}),
        h AS ({hex_axial_sql(size)} FROM pts),
        cells AS (
          SELECT hq, hr,
                 ((hq * 1103515245 + hr * 12345) % 10007 + 10007) % 10007
                   AS elev
          FROM h GROUP BY 1, 2
        ),
        dirs(d, dq, dr) AS (VALUES {dirs}),
        lower_nb AS (
          SELECT c.hq, c.hr, dirs.d, o.elev AS ne
          FROM cells c
          CROSS JOIN dirs
          JOIN cells o ON o.hq = c.hq + dirs.dq AND o.hr = c.hr + dirs.dr
          WHERE o.elev < c.elev
        ),
        best AS (
          SELECT hq, hr, d FROM (
            SELECT hq, hr, d,
                   row_number() OVER (
                     PARTITION BY hq, hr ORDER BY ne, d) AS rn
            FROM lower_nb
          ) t WHERE rn = 1
        ),
        nxt AS (
          SELECT b.hq, b.hr,
                 b.hq + dirs.dq AS nq, b.hr + dirs.dr AS nr
          FROM best b JOIN dirs ON dirs.d = b.d
        ),
        walk(cq, cr, step) AS (
          SELECT hq, hr, 0 FROM cells
          UNION ALL
          SELECT n.nq, n.nr, w.step + 1
          FROM walk w JOIN nxt n ON n.hq = w.cq AND n.hr = w.cr
          WHERE w.step < {max_steps}
        ),
        acc AS (
          SELECT cq AS hq, cr AS hr, count(*) AS flow_acc
          FROM walk GROUP BY 1, 2
        )
        SELECT c.hq, c.hr, c.elev,
               CAST(COALESCE(b.d, -1) AS INT) AS flow_dir,
               b.d IS NULL AS is_sink,
               acc.flow_acc
        FROM cells c
        LEFT JOIN best b ON b.hq = c.hq AND b.hr = c.hr
        JOIN acc ON acc.hq = c.hq AND acc.hr = c.hr
        ORDER BY c.hq, c.hr
    """


def _q_edr_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EDR trajectory distance for users 0-9 (spark/trajectory.py
    edr_distance_col): edit distance on real sequences under an eps =
    0.05 rad spatial match — the gap-penalizing member of the
    trajectory-similarity family (LCSS rewards matches, EDR charges
    for every unmatched point, so length mismatch shows up in the
    score). Integer DP as the same nested Catalyst fold; normalized by
    the longer sequence."""
    from gos2_spark.spark.trajectory import edr_distance_col

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    pts = ev.where(F.col("user_id") < 10).select(
        "user_id", "ts", "event_id",
        (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
        (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
    )
    rlat, rlng = F.radians("lat"), F.radians("lng")
    xyz = pts.select(
        "user_id", "ts", "event_id",
        F.struct(
            (F.cos(rlng) * F.cos(rlat)).alias("x"),
            (F.sin(rlng) * F.cos(rlat)).alias("y"),
            F.sin(rlat).alias("z"),
        ).alias("p"),
    )
    traj = xyz.groupBy("user_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ts", "event_id", "p"))),
            lambda s: s["p"],
        ).alias("tr"),
        F.count("*").alias("n_pts"),
    )
    a = traj.select(
        F.col("user_id").alias("user_a"),
        F.col("tr").alias("ta"),
        F.col("n_pts").alias("pts_a"),
    )
    b = traj.select(
        F.col("user_id").alias("user_b"),
        F.col("tr").alias("tb"),
        F.col("n_pts").alias("pts_b"),
    )
    pairs = a.join(b, F.col("user_a") < F.col("user_b"))
    edr = edr_distance_col(F.col("ta"), F.col("tb"), eps_rad=0.05)
    return pairs.select(
        "user_a", "user_b", "pts_a", "pts_b",
        edr.alias("edr_dist"),
        F.round(
            edr.cast("double")
            / F.greatest(F.col("pts_a"), F.col("pts_b")).cast("double"),
            9,
        ).alias("edr_norm"),
    ).orderBy("user_a", "user_b")


def _edr_oracle_sql(eps_rad: float = 0.05) -> str:
    return f"""
        WITH pts0 AS ({_EVENTS_LATLNG_SQL}),
        xyz AS (
          SELECT user_id, ts, event_id,
                 cos(radians(lng)) * cos(radians(lat)) AS x,
                 sin(radians(lng)) * cos(radians(lat)) AS y,
                 sin(radians(lat)) AS z
          FROM pts0 WHERE user_id < 10
        ),
        traj AS (
          SELECT user_id,
                 list([x, y, z] ORDER BY ts, event_id) AS tr,
                 count(*) AS n_pts
          FROM xyz GROUP BY 1
        ),
        pairs AS (
          SELECT a.user_id AS user_a, b.user_id AS user_b,
                 a.tr AS ta, b.tr AS tb,
                 a.n_pts AS pts_a, b.n_pts AS pts_b
          FROM traj a JOIN traj b ON a.user_id < b.user_id
        ),
        dp AS (
          SELECT user_a, user_b, pts_a, pts_b,
                 list_reduce(
                   list_concat(
                     [list_concat([0.0],
                        list_transform(generate_series(1, len(tb)),
                                       i -> CAST(i AS DOUBLE)))],
                     ta),
                   (R, xx) -> list_reduce(
                     list_concat([[R[1] + 1.0]], tb),
                     (N, yy) -> list_append(N,
                       least(
                         R[len(N)]
                         + CASE WHEN
                             atan2(sqrt(
                                 (xx[2] * yy[3] - xx[3] * yy[2])
                               * (xx[2] * yy[3] - xx[3] * yy[2])
                               + (xx[3] * yy[1] - xx[1] * yy[3])
                               * (xx[3] * yy[1] - xx[1] * yy[3])
                               + (xx[1] * yy[2] - xx[2] * yy[1])
                               * (xx[1] * yy[2] - xx[2] * yy[1])),
                               xx[1] * yy[1] + xx[2] * yy[2]
                               + xx[3] * yy[3]) <= {eps_rad!r}
                           THEN 0.0 ELSE 1.0 END,
                         R[len(N) + 1] + 1.0,
                         N[len(N)] + 1.0)))
                 ) AS row
          FROM pairs
        )
        SELECT user_a, user_b, pts_a, pts_b,
               CAST(row[len(row)] AS BIGINT) AS edr_dist,
               round(row[len(row)]
                     / CAST(greatest(pts_a, pts_b) AS DOUBLE), 9)
                 AS edr_norm
        FROM dp ORDER BY user_a, user_b
    """


_CLOSENESS_SEEDS = [0, 7, 13]


def _q_closeness_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed-anchored closeness / harmonic centrality over the synthetic
    20-host link graph (pipeline/graph.py closeness_from_seeds): one
    level-synchronous BFS per literal seed host, per-node exact BIGINT
    hop totals, harmonic contributions snapped to the 1e-9 grid before
    summation — the TrustRank-style link-distance quality prior."""
    from gos2_spark.pipeline.graph import closeness_from_seeds

    docs = _load(spark, sf_dir, "documents")
    d = F.col("doc_id")
    edges = docs.select((d % 20).alias("src"), ((d * 7 + 1) % 20).alias("dst")).union(
        docs.select((d % 20).alias("src"), ((d * 11 + 3) % 20).alias("dst"))
    )
    out = closeness_from_seeds(edges, _CLOSENESS_SEEDS, max_hops=8)
    return out.orderBy("node")


def _closeness_oracle_sql(max_hops: int = 8) -> str:
    seeds = ", ".join(f"({s})" for s in _CLOSENESS_SEEDS)
    return f"""
        WITH RECURSIVE e AS (
          SELECT DISTINCT src, dst FROM (
            SELECT doc_id % 20 AS src, (doc_id * 7 + 1) % 20 AS dst
            FROM documents
            UNION ALL
            SELECT doc_id % 20, (doc_id * 11 + 3) % 20 FROM documents
          )
        ),
        seeds(seed) AS (VALUES {seeds}),
        walk(seed, node, hops) AS (
          SELECT seed, CAST(seed AS BIGINT), 0 FROM seeds
          UNION ALL
          SELECT w.seed, e.dst, w.hops + 1
          FROM walk w JOIN e ON e.src = w.node
          WHERE w.hops < {max_hops}
        ),
        d AS (
          SELECT seed, node, min(hops) AS hops FROM walk GROUP BY 1, 2
        ),
        agg AS (
          SELECT node,
                 count(*) AS n_seeds_reached,
                 CAST(sum(hops) AS BIGINT) AS total_hops,
                 CAST(sum(CASE WHEN hops > 0 THEN
                       CAST(round(1e9 / CAST(hops AS DOUBLE), 0) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS harmonic_e9
          FROM d GROUP BY 1
        )
        SELECT node, n_seeds_reached, total_hops, harmonic_e9,
               round(CASE WHEN total_hops > 0
                     THEN CAST(n_seeds_reached AS DOUBLE)
                          / CAST(total_hops AS DOUBLE)
                     ELSE 0.0 END, 9) AS closeness
        FROM agg ORDER BY node
    """


def _q_dirichlet_ql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed query-likelihood retrieval (pipeline/
    retrieval.py dirichlet_ql_topk) for the same three broadcast literal
    queries as BM25 — the LM ranker where absent terms still contribute
    via the collection prior, so scores depend on document length even
    at tf = 0. Per-(doc, term) log contributions snap to the 1e-9
    integer grid before the per-document sum; exact BIGINT scores."""
    from gos2_spark.pipeline.retrieval import dirichlet_ql_topk

    docs = _load(spark, sf_dir, "documents")
    out = dirichlet_ql_topk(docs, _BM25_QUERIES, k=10, mu=300.0)
    return out.select(
        "query_id", "rank", F.col("key").alias("doc_id"), "score_e9"
    ).orderBy("query_id", "rank")


def _dirichlet_oracle_sql(k: int = 10, mu: float = 300.0) -> str:
    mu_r = repr(float(mu))
    vals = ", ".join(
        f"({qid}, '{t}')"
        for qid, text in _BM25_QUERIES
        for t in sorted(set(text.split()))
    )
    terms = sorted({t for _, text in _BM25_QUERIES for t in text.split()})
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
        WITH toks AS (
          SELECT doc_id AS key, t AS token
          FROM documents, LATERAL unnest(list_filter(
               regexp_split_to_array(lower(text), '[^a-z]+'),
               x -> len(x) > 0)) AS u(t)
        ),
        dl AS (SELECT key, count(*) AS dl FROM toks GROUP BY 1),
        stats AS (SELECT count(*) AS total_tokens FROM toks),
        q(query_id, token) AS (VALUES {vals}),
        tf AS (
          SELECT key, token, count(*) AS tf FROM toks
          WHERE token IN ({in_list}) GROUP BY 1, 2
        ),
        ctf AS (
          SELECT token, count(*) AS ctf FROM toks
          WHERE token IN ({in_list}) GROUP BY 1
        ),
        cand AS (
          SELECT DISTINCT q.query_id, tf.key
          FROM tf JOIN q USING (token)
        ),
        grid AS (
          SELECT c.query_id, c.key, q.token
          FROM cand c JOIN q ON q.query_id = c.query_id
        ),
        contrib AS (
          SELECT g.query_id, g.key,
                 CAST(round(
                   ln((CAST(coalesce(tf.tf, 0) AS DOUBLE)
                       + {mu_r} * (CAST(ctf.ctf AS DOUBLE)
                                   / CAST(stats.total_tokens AS DOUBLE)))
                      / (CAST(dl.dl AS DOUBLE) + {mu_r}))
                   * 1e9, 0) AS BIGINT) AS c
          FROM grid g
          LEFT JOIN tf ON tf.key = g.key AND tf.token = g.token
          JOIN ctf ON ctf.token = g.token
          JOIN dl ON dl.key = g.key, stats
        ),
        scores AS (
          SELECT query_id, key, CAST(sum(c) AS BIGINT) AS score_e9
          FROM contrib GROUP BY 1, 2
        ),
        ranked AS (
          SELECT CAST(query_id AS BIGINT) AS query_id,
                 CAST(row_number() OVER (
                     PARTITION BY query_id
                     ORDER BY score_e9 DESC, key) AS INT) AS rank,
                 key AS doc_id, score_e9
          FROM scores
        )
        SELECT * FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
    """


def _q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct sketch per language (pipeline/
    sketch.py kmv_sketch / kmv_estimate): the k = 32 smallest distinct
    xxhash64 values of doc_id estimate per-lang document cardinality as
    (k-1)/u(h_k); groups under k are exact by construction. The oracle
    replays every hash bit-for-bit via the SQL XXH64 model, so the
    estimate — including its error vs the exact count — is verified."""
    from gos2_spark.pipeline.sketch import kmv_estimate, kmv_sketch

    docs = _load(spark, sf_dir, "documents")
    sk = kmv_sketch(docs, ["lang"], "doc_id", k=32)
    est = kmv_estimate(sk, ["lang"], k=32)
    exact = docs.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("true_distinct")
    )
    return est.join(exact, "lang").orderBy("lang")


def _kmv_oracle_sql(k: int = 32) -> str:
    from gos2_spark.pipeline.duckdb_oracles import xxh64_list_sql

    h = f"({xxh64_list_sql('[CAST(doc_id AS VARCHAR)]')})[1]"
    return f"""
        WITH hashed AS (
          SELECT DISTINCT lang, CAST({h} AS BIGINT) AS h FROM documents
        ),
        ranked AS (
          SELECT lang, h,
                 row_number() OVER (PARTITION BY lang ORDER BY h) AS idx
          FROM hashed
        ),
        sk AS (SELECT * FROM ranked WHERE idx <= {k}),
        agg AS (
          SELECT lang, count(*) AS k_used, max(h) AS h_k FROM sk GROUP BY 1
        ),
        est AS (
          SELECT lang, k_used, h_k,
                 CASE WHEN k_used < {k} THEN CAST(k_used AS DOUBLE)
                 ELSE {float(k - 1)!r} /
                      ((CAST(h_k AS DOUBLE) + 9.223372036854775809e18)
                       / 1.8446744073709552e19)
                 END AS est_distinct
          FROM agg
        ),
        exact AS (
          SELECT lang, count(DISTINCT doc_id) AS true_distinct
          FROM documents GROUP BY 1
        )
        SELECT e.lang, e.k_used, e.h_k,
               round(e.est_distinct, 4) AS est_distinct, x.true_distinct
        FROM est e JOIN exact x USING (lang)
        ORDER BY e.lang
    """


def _q_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic importance resampling (pipeline/pack.py
    importance_resample — the DCLM/DSIR-style quality-proportional
    downsampler): keep probability = clamp(n_chars/400, 0, 1) as a pure
    function of xxhash64(doc_id), so the kept set is stable across
    runs/shards. Per-source kept/total accounting; the oracle replays
    every hash bucket and threshold bit-for-bit (Spark's double->long
    cast truncates — mirrored with trunc())."""
    from gos2_spark.pipeline.pack import importance_resample

    docs = _load(spark, sf_dir, "documents")
    w = F.col("n_chars").cast("double") / F.lit(400.0)
    kept = importance_resample(docs, w, key_col="doc_id")
    per_src = kept.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.sum("n_chars").alias("kept_chars"),
        F.sum("_bucket").alias("bucket_sum"),
    )
    tot = docs.groupBy("source").agg(F.count("*").alias("n_total"))
    return (
        per_src.join(tot, "source")
        .select(
            "source", "n_total", "n_kept", "kept_chars", "bucket_sum",
            F.round(
                F.col("n_kept").cast("double") / F.col("n_total").cast("double"),
                9,
            ).alias("kept_frac"),
        )
        .orderBy("source")
    )


def _importance_resample_oracle_sql(scale: int = 1_000_000) -> str:
    from gos2_spark.pipeline.duckdb_oracles import xxh64_list_sql

    h = f"({xxh64_list_sql('[CAST(doc_id AS VARCHAR)]')})[1]"
    return f"""
        WITH g AS (
          SELECT source, n_chars,
                 (({h}) % {scale} + {scale}) % {scale} AS bucket,
                 CAST(trunc(greatest(0.0, least(1.0,
                      CAST(n_chars AS DOUBLE) / 400.0)) * {float(scale)!r})
                      AS BIGINT) AS thresh
          FROM documents
        ),
        kept AS (
          SELECT source,
                 count(*) AS n_kept,
                 CAST(sum(n_chars) AS BIGINT) AS kept_chars,
                 CAST(sum(bucket) AS BIGINT) AS bucket_sum
          FROM g WHERE bucket < thresh GROUP BY 1
        ),
        tot AS (SELECT source, count(*) AS n_total FROM g GROUP BY 1)
        SELECT k.source, t.n_total, k.n_kept, k.kept_chars, k.bucket_sum,
               round(CAST(k.n_kept AS DOUBLE) / CAST(t.n_total AS DOUBLE), 9)
                 AS kept_frac
        FROM kept k JOIN tot t USING (source)
        ORDER BY k.source
    """


def _q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 5-gram novelty (pipeline/text.py ngram_novelty): the
    fraction of a doc's distinct token 5-grams first seen (min doc_id)
    in that doc — the 'new text added' complement of duplicate-span
    coverage. One gram-keyed aggregation carries one row per distinct
    gram; at 100 TB grams ride as xxhash64 keys (spans.py), here as
    plain strings so the oracle replays every gram."""
    from gos2_spark.pipeline.text import ngram_novelty

    docs = _load(spark, sf_dir, "documents")
    out = ngram_novelty(docs, n=5)
    return out.select(
        F.col("key").alias("doc_id"), "n_grams", "n_novel", "novelty_rate"
    ).orderBy("doc_id")


def _ngram_novelty_oracle_sql(n: int = 5) -> str:
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                             x -> len(x) > 0) AS tk
          FROM documents
        ),
        grams AS (
          SELECT DISTINCT doc_id, g
          FROM toks, LATERAL unnest(
            CASE WHEN len(tk) >= {n}
                 THEN list_transform(generate_series(1, len(tk) - {n - 1}),
                      i -> array_to_string(list_slice(tk, i, i + {n - 1}), ' '))
                 ELSE [] END) AS u(g)
        ),
        first AS (SELECT g, min(doc_id) AS first_key FROM grams GROUP BY 1),
        per_doc AS (
          SELECT grams.doc_id,
                 count(*) AS n_grams,
                 CAST(sum(CASE WHEN first.first_key = grams.doc_id
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
          FROM grams JOIN first USING (g) GROUP BY 1
        )
        SELECT doc_id, n_grams, n_novel,
               round(CAST(n_novel AS DOUBLE) / CAST(n_grams AS DOUBLE), 9)
                 AS novelty_rate
        FROM per_doc ORDER BY doc_id
    """


def _q_quadrat_vmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quadrat variance/mean ratio CSR test (spark/spatialstats.py
    quadrat_vmr): hex-quadrat counts over the axial bounding
    parallelogram (empty quadrats included via exact integer bounds);
    VMR and the chi-square dispersion index from BIGINT sufficient
    statistics, one final division each."""
    from gos2_spark.spark.spatialstats import quadrat_vmr

    pts = _cust_points(spark, sf_dir)
    return quadrat_vmr(pts, size=0.5)


def _quadrat_vmr_oracle_sql(size: float = 0.5) -> str:
    from gos2_spark.spark.hexgrid import hex_axial_sql

    return f"""
        WITH pts AS ({_CUST_LATLNG_SQL}),
        h AS ({hex_axial_sql(size)} FROM pts),
        cells AS (SELECT hq, hr, count(*) AS x FROM h GROUP BY 1, 2),
        agg AS (
          SELECT count(*) AS occupied,
                 CAST(sum(x) AS BIGINT) AS n_points,
                 CAST(sum(x * x) AS BIGINT) AS sum_x2,
                 min(hq) AS qmin, max(hq) AS qmax,
                 min(hr) AS rmin, max(hr) AS rmax
          FROM cells
        )
        SELECT CAST((qmax - qmin + 1) * (rmax - rmin + 1) AS BIGINT)
                 AS q_cells,
               occupied, n_points, sum_x2,
               round(CAST((qmax - qmin + 1) * (rmax - rmin + 1) * sum_x2
                          - n_points * n_points AS DOUBLE)
                     / CAST((qmax - qmin + 1) * (rmax - rmin + 1)
                            * n_points AS DOUBLE), 9) AS vmr,
               round(CAST((qmax - qmin + 1) * (rmax - rmin + 1) * sum_x2
                          - n_points * n_points AS DOUBLE)
                     / CAST(n_points AS DOUBLE), 9) AS chi2
        FROM agg
    """


_KTRUSS_K = 4
_KTRUSS_ROUNDS = 3


def _q_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-truss extraction (pipeline/graph.py ktruss_edges, k = 4): edges
    embedded in >= 2 triangles after iterative peel over a synthetic
    24-host mutual-link graph — the triangle-density counterpart of
    k-core (a star survives k-core but has no truss). Fixed peel rounds
    unroll into a chained-CTE oracle; all counts BIGINT."""
    from gos2_spark.pipeline.graph import ktruss_edges

    docs = _load(spark, sf_dir, "documents")
    d = F.col("doc_id")
    edges = (
        docs.select((d % 24).alias("src"), ((d * 5 + 2) % 24).alias("dst"))
        .union(docs.select((d % 24).alias("src"), ((d * 7 + 3) % 24).alias("dst")))
        .union(docs.select((d % 24).alias("src"), ((d * 11 + 5) % 24).alias("dst")))
    )
    out = ktruss_edges(edges, k=_KTRUSS_K, rounds=_KTRUSS_ROUNDS)
    return out.orderBy("a", "b")


def _ktruss_oracle_sql(k: int = _KTRUSS_K, rounds: int = _KTRUSS_ROUNDS) -> str:
    sql = """
        WITH raw AS (
          SELECT doc_id % 24 AS src, (doc_id * 5 + 2) % 24 AS dst
          FROM documents
          UNION ALL
          SELECT doc_id % 24, (doc_id * 7 + 3) % 24 FROM documents
          UNION ALL
          SELECT doc_id % 24, (doc_id * 11 + 5) % 24 FROM documents
        ),
        und0 AS (
          SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM raw WHERE src <> dst
        )
    """
    prev = "und0"
    for r in range(1, rounds + 1):
        sql += f""",
        adj{r} AS (
          SELECT a AS u, b AS v FROM {prev}
          UNION ALL SELECT b, a FROM {prev}
        ),
        sup{r} AS (
          SELECT t.a, t.b, count(*) AS support
          FROM {prev} t
          JOIN adj{r} x ON x.u = t.a
          JOIN adj{r} y ON y.u = t.b AND y.v = x.v
          GROUP BY 1, 2
        ),
        und{r} AS (
          SELECT t.a, t.b FROM {prev} t
          LEFT JOIN sup{r} s ON s.a = t.a AND s.b = t.b
          WHERE coalesce(s.support, 0) >= {k - 2}
        )
    """
        prev = f"und{r}"
    sql += f""",
        adjF AS (
          SELECT a AS u, b AS v FROM {prev}
          UNION ALL SELECT b, a FROM {prev}
        ),
        supF AS (
          SELECT t.a, t.b, count(*) AS support
          FROM {prev} t
          JOIN adjF x ON x.u = t.a
          JOIN adjF y ON y.u = t.b AND y.v = x.v
          GROUP BY 1, 2
        )
        SELECT t.a, t.b,
               CAST(coalesce(s.support, 0) AS BIGINT) AS support
        FROM {prev} t
        LEFT JOIN supF s ON s.a = t.a AND s.b = t.b
        ORDER BY t.a, t.b
    """
    return sql


def _q_graph_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed-graph mixing profile (pipeline/graph.py
    graph_mixing_stats) over the synthetic 20-host link graph:
    reciprocity (mutual-link fraction, one self-semi-join) and Newman
    out-in degree assortativity from exact BIGINT sufficient statistics
    with ONE final float expression."""
    from gos2_spark.pipeline.graph import graph_mixing_stats

    docs = _load(spark, sf_dir, "documents")
    d = F.col("doc_id")
    edges = docs.select(
        (d % 20).alias("src"), ((d * 7 + 1) % 20).alias("dst")
    ).union(docs.select((d % 20).alias("src"), ((d * 11 + 3) % 20).alias("dst")))
    return graph_mixing_stats(edges)


def _graph_mixing_oracle_sql() -> str:
    return """
        WITH raw AS (
          SELECT doc_id % 20 AS src, (doc_id * 7 + 1) % 20 AS dst
          FROM documents
          UNION ALL
          SELECT doc_id % 20, (doc_id * 11 + 3) % 20 FROM documents
        ),
        e AS (SELECT DISTINCT src AS s, dst AS d FROM raw WHERE src <> dst),
        recip AS (
          SELECT count(*) AS n_recip FROM e
          WHERE EXISTS (SELECT 1 FROM e r WHERE r.s = e.d AND r.d = e.s)
        ),
        od AS (SELECT s, count(*) AS du FROM e GROUP BY 1),
        idg AS (SELECT d, count(*) AS dv FROM e GROUP BY 1),
        j AS (
          SELECT du, dv FROM e JOIN od USING (s) JOIN idg USING (d)
        ),
        stats AS (
          SELECT count(*) AS m,
                 CAST(sum(du) AS BIGINT) AS sum_du,
                 CAST(sum(dv) AS BIGINT) AS sum_dv,
                 CAST(sum(du * dv) AS BIGINT) AS sum_dudv,
                 CAST(sum(du * du) AS BIGINT) AS sum_du2,
                 CAST(sum(dv * dv) AS BIGINT) AS sum_dv2
          FROM j
        )
        SELECT m, n_recip, sum_du, sum_dv, sum_dudv, sum_du2, sum_dv2,
               round(CAST(n_recip AS DOUBLE) / CAST(m AS DOUBLE), 9)
                 AS reciprocity,
               round(CASE WHEN
                       (CAST(m AS DOUBLE) * CAST(sum_du2 AS DOUBLE)
                        - CAST(sum_du AS DOUBLE) * CAST(sum_du AS DOUBLE)) > 0.0
                       AND
                       (CAST(m AS DOUBLE) * CAST(sum_dv2 AS DOUBLE)
                        - CAST(sum_dv AS DOUBLE) * CAST(sum_dv AS DOUBLE)) > 0.0
                     THEN (CAST(m AS DOUBLE) * CAST(sum_dudv AS DOUBLE)
                           - CAST(sum_du AS DOUBLE) * CAST(sum_dv AS DOUBLE))
                          / sqrt((CAST(m AS DOUBLE) * CAST(sum_du2 AS DOUBLE)
                                  - CAST(sum_du AS DOUBLE)
                                    * CAST(sum_du AS DOUBLE))
                                 * (CAST(m AS DOUBLE) * CAST(sum_dv2 AS DOUBLE)
                                    - CAST(sum_dv AS DOUBLE)
                                      * CAST(sum_dv AS DOUBLE)))
                     ELSE 0.0 END, 9) AS assortativity
        FROM stats, recip
    """


def _q_polyline_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Google encoded-polyline interop (spark/polyline_codec.py
    encode_polylines) for users 0-29: the Maps/OSRM/Valhalla trajectory
    wire format produced entirely in Catalyst (snap, delta, zigzag,
    5-bit chunk emission via a precomputed chunk array + char()). The
    oracle rebuilds every byte of every string in DuckDB — verified
    against Google's documented example in pytest."""
    from gos2_spark.spark.polyline_codec import encode_polylines

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    pts = ev.where(F.col("user_id") < 30).select(
        "user_id", "ts", "event_id",
        (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
        (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
    )
    out = encode_polylines(pts, order_cols=("ts", "event_id"))
    return out.select(
        "user_id", "n_pts", "polyline",
        F.length("polyline").alias("poly_len"),
    ).orderBy("user_id")


def _polyline_oracle_sql() -> str:
    def chunks(delta: str) -> str:
        z = (f"(CASE WHEN ({delta}) < 0 THEN -2 * ({delta}) - 1"
             f" ELSE 2 * ({delta}) END)")
        last = "0"
        for i in range(1, 7):
            last = f"(CASE WHEN {z} >= {1 << (5 * i)} THEN {i} ELSE {last} END)"
        return (
            "list_reduce(list_transform(generate_series(0, " + last + "), "
            "i -> chr(CAST((((" + z + " >> (5 * i)) & 31)"
            " | (CASE WHEN i < " + last + " THEN 32 ELSE 0 END)) + 63"
            " AS INT))), (a, b) -> a || b)"
        )

    piece = f"({chunks('dlat')} || {chunks('dlng')})"
    return f"""
        WITH pts AS (
          SELECT user_id, ts, event_id, lat, lng
          FROM ({_EVENTS_LATLNG_SQL}) WHERE user_id < 30
        ),
        snapped AS (
          SELECT user_id, ts, event_id,
                 CAST(floor(lat * 100000.0 + 0.5) AS BIGINT) AS lat5,
                 CAST(floor(lng * 100000.0 + 0.5) AS BIGINT) AS lng5
          FROM pts
        ),
        deltas AS (
          SELECT user_id, ts, event_id,
                 lat5 - coalesce(lag(lat5) OVER w, 0) AS dlat,
                 lng5 - coalesce(lag(lng5) OVER w, 0) AS dlng
          FROM snapped
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id,
               count(*) AS n_pts,
               string_agg({piece}, '' ORDER BY ts, event_id) AS polyline,
               CAST(sum(length({piece})) AS INT) AS poly_len
        FROM deltas GROUP BY user_id ORDER BY user_id
    """


_HUFF_SITES = [
    (1, 40.7, -74.0, 5.0),
    (2, 51.5, -0.1, 3.0),
    (3, 35.7, 139.7, 4.0),
    (4, -33.9, 151.2, 2.0),
]


def _q_huff_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huff gravity market shares (spark/spatialstats.py
    huff_market_share): four literal attraction sites split the
    customer point field by S/d^2 utility; per-point probabilities
    snap to the 1e-9 grid before the per-site demand sum (exact
    BIGINTs) and the hard capture count uses a deterministic strict->
    argmax ladder."""
    from gos2_spark.spark.spatialstats import huff_market_share

    pts = _cust_points(spark, sf_dir)
    return huff_market_share(pts, _HUFF_SITES).orderBy("site_id")


def _huff_oracle_sql() -> str:
    d_cols = ", ".join(
        f"{_hav_sql(la, ln)} AS d{j}"
        for j, (_sid, la, ln, _s) in enumerate(_HUFF_SITES)
    )
    u_cols = ", ".join(
        f"{s!r} / (d{j} * d{j} + 1e-06) AS u{j}"
        for j, (_sid, _la, _ln, s) in enumerate(_HUFF_SITES)
    )
    denom = " + ".join(f"u{j}" for j in range(len(_HUFF_SITES)))
    best, bu = "0", "u0"
    for j in range(1, len(_HUFF_SITES)):
        new_best = f"(CASE WHEN u{j} > {bu} THEN {j} ELSE {best} END)"
        bu = f"(CASE WHEN u{j} > {bu} THEN u{j} ELSE {bu} END)"
        best = new_best
    p_cols = ", ".join(
        f"CAST(round(u{j} / ({denom}) * 1e9, 0) AS BIGINT) AS p{j}"
        for j in range(len(_HUFF_SITES))
    )
    sums = ", ".join(
        f"CAST(sum(p{j}) AS BIGINT) AS d{j}, "
        f"CAST(sum(CASE WHEN best = {j} THEN 1 ELSE 0 END) AS BIGINT) AS c{j}"
        for j in range(len(_HUFF_SITES))
    )
    rows = " UNION ALL ".join(
        f"SELECT {sid} AS site_id, d{j} AS demand_e9, c{j} AS captured, "
        f"round(CAST(d{j} AS DOUBLE) / 1e9 / CAST(n_points AS DOUBLE), 9)"
        f" AS share FROM agg"
        for j, (sid, *_r) in enumerate(_HUFF_SITES)
    )
    return f"""
        WITH pts AS ({_CUST_LATLNG_SQL}),
        dists AS (SELECT {d_cols} FROM pts),
        utils AS (SELECT {u_cols} FROM dists),
        probs AS (SELECT {p_cols}, {best} AS best FROM utils),
        agg AS (SELECT count(*) AS n_points, {sums} FROM probs)
        SELECT * FROM ({rows}) ORDER BY site_id
    """


def _q_theil_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality of event activity across level-5 S2 cells per
    event type (spark/spatialstats.py theil_index): exact BIGINT
    sufficient statistics, float log-sum as a cell-ordered sequential
    fold (the EWMA determinism pattern) — 0 = even, ln(Q) = fully
    concentrated."""
    from gos2_spark.spark.functions import add_cellid_sql
    from gos2_spark.spark.pages import s2_parent_sql
    from gos2_spark.spark.spatialstats import theil_index

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    pts = add_cellid_sql(
        ev.select(
            "event_type",
            (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
            (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
        ),
        "lat",
        "lng",
        "cell_id",
    )
    per_cell = pts.select(
        "event_type", s2_parent_sql(F.col("cell_id"), 5).alias("cell")
    ).groupBy("event_type", "cell").agg(F.count("*").alias("x"))
    return theil_index(
        per_cell, ["event_type"], value_col="x", order_col="cell"
    ).orderBy("event_type")


def _theil_oracle_sql(level: int = 5) -> str:
    lsb = 1 << (2 * (30 - level))
    return f"""
        WITH {_cellid_cte_duckdb(
            f"SELECT event_id AS key, lat, lng FROM ({_EVENTS_LATLNG_SQL})"
        )},
        pc AS (
          SELECT e.event_type, ((c.cell_id & {-lsb}) | {lsb}) AS cell
          FROM cells c JOIN events e ON e.event_id = c.key
        ),
        per_cell AS (
          SELECT event_type, cell, count(*) AS x FROM pc GROUP BY 1, 2
        ),
        agg AS (
          SELECT event_type,
                 count(*) AS q_units,
                 CAST(sum(x) AS BIGINT) AS n_total,
                 list(CAST(x AS DOUBLE) ORDER BY cell) AS xs
          FROM per_cell GROUP BY 1
        )
        SELECT event_type, q_units, n_total,
               round(list_reduce(list_prepend(0.0, xs),
                 (acc, x) -> acc
                   + (x / CAST(n_total AS DOUBLE))
                     * ln(x / (CAST(n_total AS DOUBLE)
                               / CAST(q_units AS DOUBLE)))), 9) AS theil_t
        FROM agg ORDER BY event_type
    """


def _q_seasonal_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast error per event type (spark/temporal.py
    seasonal_naive_mase): MAE of the 'repeat last week' forecast vs the
    lag-1 random walk, and their MASE ratio — the forecasting-baseline
    screen. Exact BIGINT numerators over epoch-day-aligned self-joins;
    the means and ratio are single divisions."""
    from gos2_spark.spark.temporal import seasonal_naive_mase

    ev = _load(spark, sf_dir, "events")
    return seasonal_naive_mase(ev, period=7).orderBy("event_type")


def _seasonal_mase_oracle_sql(period: int = 7) -> str:
    return f"""
        WITH daily AS (
          SELECT event_type AS k,
                 CAST(floor(CAST(date_diff('microsecond',
                      TIMESTAMP '1970-01-01 00:00:00', ts) AS DOUBLE)
                      / 86400000000) AS BIGINT) AS day,
                 count(*) AS c
          FROM events GROUP BY 1, 2
        ),
        season AS (
          SELECT a.k, count(*) AS n_seasonal,
                 CAST(sum(abs(a.c - b.c)) AS BIGINT) AS abs_seasonal
          FROM daily a JOIN daily b
            ON a.k = b.k AND a.day = b.day + {period}
          GROUP BY 1
        ),
        naive AS (
          SELECT a.k, count(*) AS n_naive,
                 CAST(sum(abs(a.c - b.c)) AS BIGINT) AS abs_naive
          FROM daily a JOIN daily b ON a.k = b.k AND a.day = b.day + 1
          GROUP BY 1
        )
        SELECT s.k AS event_type, s.n_seasonal, s.abs_seasonal,
               n.n_naive, n.abs_naive,
               round(CAST(s.abs_seasonal AS DOUBLE)
                     / CAST(s.n_seasonal AS DOUBLE), 9) AS mae_seasonal,
               round(CAST(n.abs_naive AS DOUBLE)
                     / CAST(n.n_naive AS DOUBLE), 9) AS mae_naive,
               round(CASE WHEN CAST(n.abs_naive AS DOUBLE)
                               / CAST(n.n_naive AS DOUBLE) > 0.0
                     THEN (CAST(s.abs_seasonal AS DOUBLE)
                           / CAST(s.n_seasonal AS DOUBLE))
                          / (CAST(n.abs_naive AS DOUBLE)
                             / CAST(n.n_naive AS DOUBLE))
                     ELSE 0.0 END, 9) AS mase
        FROM season s JOIN naive n ON n.k = s.k
        ORDER BY event_type
    """


def _q_snapshot_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot retention planning — the second Iceberg-style
    maintenance op next to compaction_plan: per table keep the 3 newest
    snapshots plus the newest snapshot of each of the 7 most recent
    distinct days; everything else expires. Three window functions on
    one table-keyed shuffle, all-integer ordering (epoch day, snapshot
    id), per-table counts + kept/expired id-sum fingerprints so the
    exact selection is value-checked."""
    from pyspark.sql import Window

    o = _load(spark, sf_dir, "orders")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        " o_orderdate)"
    )
    snaps = o.select(
        (F.col("o_orderkey") % 8).alias("tbl"),
        F.col("o_orderkey").alias("snap_id"),
        F.floor(us / 86_400_000_000).cast("long").alias("day"),
    )
    w_all = Window.partitionBy("tbl").orderBy(
        F.desc("day"), F.desc("snap_id")
    )
    w_day = Window.partitionBy("tbl", "day").orderBy(F.desc("snap_id"))
    w_rank = Window.partitionBy("tbl").orderBy(F.desc("day"))
    dec = snaps.select(
        "tbl", "snap_id", "day",
        F.row_number().over(w_all).alias("rn"),
        F.row_number().over(w_day).alias("day_rn"),
        F.dense_rank().over(w_rank).alias("day_rank"),
    )
    keep = (F.col("rn") <= 3) | (
        (F.col("day_rn") == 1) & (F.col("day_rank") <= 7)
    )
    return (
        dec.withColumn("keep", keep)
        .groupBy("tbl")
        .agg(
            F.count("*").alias("n_snapshots"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
            .cast("long")
            .alias("n_keep"),
            F.sum(F.when(~F.col("keep"), 1).otherwise(0))
            .cast("long")
            .alias("n_expire"),
            F.sum(F.when(F.col("keep"), F.col("snap_id")).otherwise(0))
            .cast("long")
            .alias("keep_id_sum"),
            F.max(F.when(F.col("keep"), F.col("day"))).alias("newest_day"),
            F.min(F.when(F.col("keep"), F.col("day"))).alias("oldest_kept_day"),
        )
        .orderBy("tbl")
    )


def _snapshot_retention_oracle_sql() -> str:
    return """
        WITH snaps AS (
          SELECT o_orderkey % 8 AS tbl, o_orderkey AS snap_id,
                 CAST(floor(CAST(date_diff('microsecond',
                      TIMESTAMP '1970-01-01 00:00:00', o_orderdate)
                      AS DOUBLE) / 86400000000) AS BIGINT) AS day
          FROM orders
        ),
        dec AS (
          SELECT tbl, snap_id, day,
                 row_number() OVER (PARTITION BY tbl
                   ORDER BY day DESC, snap_id DESC) AS rn,
                 row_number() OVER (PARTITION BY tbl, day
                   ORDER BY snap_id DESC) AS day_rn,
                 dense_rank() OVER (PARTITION BY tbl
                   ORDER BY day DESC) AS day_rank
          FROM snaps
        ),
        k AS (
          SELECT tbl, snap_id, day,
                 (rn <= 3 OR (day_rn = 1 AND day_rank <= 7)) AS keep
          FROM dec
        )
        SELECT tbl,
               count(*) AS n_snapshots,
               CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_keep,
               CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
                 AS n_expire,
               CAST(sum(CASE WHEN keep THEN snap_id ELSE 0 END) AS BIGINT)
                 AS keep_id_sum,
               max(CASE WHEN keep THEN day END) AS newest_day,
               min(CASE WHEN keep THEN day END) AS oldest_kept_day
        FROM k GROUP BY tbl ORDER BY tbl
    """


def _q_semivariogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical semivariogram (spark/spatialstats.py semivariogram) of
    a deterministic integer field z = 3*floor(lat) + floor(lng) sampled
    at the 1-in-20 event subsample: gamma(h) per distance bin up to 5
    degrees, 5 bins. Pair enumeration is the engine's cell-blocked
    within-radius self-join; squared-diff sums are exact BIGINTs, so the
    oracle's brute-force O(n^2) pair scan must match every bin
    bit-for-bit."""
    from gos2_spark.spark.functions import add_cellid_sql
    from gos2_spark.spark.spatialstats import semivariogram

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    pts = add_cellid_sql(
        ev.select(
            "event_id",
            (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
            (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
        ).where(e % 20 == 0),
        "lat", "lng", "cell_id",
    ).withColumn(
        "z",
        (F.floor("lat") * 3 + F.floor("lng")).cast("long"),
    )
    return semivariogram(
        pts, max_radius_deg=5.0, n_bins=5, value_col="z",
        point_key="event_id",
    ).orderBy("bin_idx")


def _semivariogram_oracle_sql() -> str:
    import math as _m

    r = _m.radians(5.0)
    binw = _m.radians(5.0) / 5.0
    return f"""
        WITH pts0 AS ({_EVENTS_LATLNG_SQL}),
        sub AS (
          SELECT event_id, lat, lng,
                 CAST(floor(lat) * 3 + floor(lng) AS BIGINT) AS z
          FROM pts0 WHERE event_id % 20 = 0
        ),
        v AS (
          SELECT event_id, z,
                 cos(radians(lng)) * cos(radians(lat)) AS x,
                 sin(radians(lng)) * cos(radians(lat)) AS y,
                 sin(radians(lat)) AS zz
          FROM sub
        ),
        pairs AS (
          SELECT a.z AS za, b.z AS zb,
                 atan2(sqrt(
                     (a.y * b.zz - a.zz * b.y) * (a.y * b.zz - a.zz * b.y)
                   + (a.zz * b.x - a.x * b.zz) * (a.zz * b.x - a.x * b.zz)
                   + (a.x * b.y - a.y * b.x) * (a.x * b.y - a.y * b.x)),
                   a.x * b.x + a.y * b.y + a.zz * b.zz) AS d
          FROM v a JOIN v b ON a.event_id < b.event_id
        ),
        binned AS (
          SELECT least(CAST(floor(d / {binw!r}) AS BIGINT), 4) AS bin_idx,
                 (za - zb) * (za - zb) AS d2
          FROM pairs WHERE d <= {r!r}
        ),
        agg AS (
          SELECT bin_idx, count(*) AS n_pairs,
                 CAST(sum(d2) AS BIGINT) AS ssd
          FROM binned GROUP BY 1
        )
        SELECT bin_idx,
               CAST(bin_idx AS DOUBLE) * {binw!r} AS h_lo_rad,
               (CAST(bin_idx AS DOUBLE) + 1.0) * {binw!r} AS h_hi_rad,
               n_pairs, ssd,
               round(CAST(ssd AS DOUBLE)
                     / (2.0 * CAST(n_pairs AS DOUBLE)), 9) AS gamma
        FROM agg ORDER BY bin_idx
    """


def _q_nn_gfunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor G-function (spark/spatialstats.py nn_gfunction)
    at radii 1 / 2.5 / 5 degrees over the 1-in-20 event subsample — the
    CDF companion of clark_evans_nn. NN distances come from the
    cap-doubling kNN; the oracle brute-forces every point's true NN with
    the identical atan2 distance, so counts must match exactly."""
    from gos2_spark.spark.functions import add_cellid_sql
    from gos2_spark.spark.spatialstats import nn_gfunction

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    pts = add_cellid_sql(
        ev.select(
            "event_id",
            (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
            (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
        ).where(e % 20 == 0),
        "lat", "lng", "cell_id",
    )
    return nn_gfunction(
        pts, radii_deg=[1.0, 2.5, 5.0], point_key="event_id"
    ).orderBy("r_deg")


def _nn_gfunction_oracle_sql() -> str:
    import math as _m

    rows = []
    for r in (1.0, 2.5, 5.0):
        rr = _m.radians(r)
        rows.append(f"""
          SELECT {float(r)!r} AS r_deg,
                 n_points,
                 (SELECT count(*) FROM nn WHERE nn_rad <= {rr!r})
                   AS n_within,
                 round(CAST((SELECT count(*) FROM nn
                             WHERE nn_rad <= {rr!r}) AS DOUBLE)
                       / CAST(n_points AS DOUBLE), 9) AS g_hat,
                 round(1.0 - exp(-(CAST(n_points AS DOUBLE)
                                   / {4.0 * _m.pi!r}) * {_m.pi!r}
                                 * {rr!r} * {rr!r}), 9) AS g_csr
          FROM np""")
    sel = " UNION ALL ".join(rows)
    return f"""
        WITH pts0 AS ({_EVENTS_LATLNG_SQL}),
        sub AS (
          SELECT event_id, lat, lng FROM pts0 WHERE event_id % 20 = 0
        ),
        v AS (
          SELECT event_id,
                 cos(radians(lng)) * cos(radians(lat)) AS x,
                 sin(radians(lng)) * cos(radians(lat)) AS y,
                 sin(radians(lat)) AS z
          FROM sub
        ),
        nn AS (
          SELECT a.event_id,
                 min(atan2(sqrt(
                     (a.y * b.z - a.z * b.y) * (a.y * b.z - a.z * b.y)
                   + (a.z * b.x - a.x * b.z) * (a.z * b.x - a.x * b.z)
                   + (a.x * b.y - a.y * b.x) * (a.x * b.y - a.y * b.x)),
                   a.x * b.x + a.y * b.y + a.z * b.z)) AS nn_rad
          FROM v a JOIN v b ON a.event_id != b.event_id
          GROUP BY 1
        ),
        np AS (SELECT count(*) AS n_points FROM nn)
        SELECT * FROM ({sel}) ORDER BY r_deg
    """


def _q_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard neighbor-overlap link prediction (pipeline/graph.py
    neighbor_jaccard) over the synthetic 64-node domain graph (the
    PageRank/Adamic-Adar fixture): |common| / |union| for every
    non-adjacent unordered pair, union from degrees without a second
    pass. Counts are exact BIGINTs; the oracle replays the wedge join
    and the NOT EXISTS anti-join."""
    from gos2_spark.pipeline.graph import neighbor_jaccard

    c = _load(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    edges = c.select(
        (k % 64).alias("src"), ((k * 7 + 3) % 64).alias("dst")
    ).distinct()
    return neighbor_jaccard(edges, "src", "dst").orderBy("u", "v")


def _neighbor_jaccard_oracle_sql() -> str:
    return """
        WITH e AS (
          SELECT DISTINCT c_custkey % 64 AS src,
                          (c_custkey * 7 + 3) % 64 AS dst
          FROM customer
        ),
        sym AS (
          SELECT src AS a, dst AS b FROM e WHERE src != dst
          UNION
          SELECT dst, src FROM e WHERE src != dst
        ),
        deg AS (SELECT a, count(*) AS deg FROM sym GROUP BY 1),
        adj AS (SELECT a AS w, b AS u FROM sym),
        wedges AS (
          SELECT l.u AS u, r.u AS v
          FROM adj l JOIN adj r ON l.w = r.w AND l.u < r.u
        ),
        common AS (
          SELECT u, v, count(*) AS common_neighbors
          FROM wedges GROUP BY 1, 2
        ),
        scored AS (
          SELECT c.u, c.v, c.common_neighbors,
                 du.deg + dv.deg - c.common_neighbors AS union_neighbors
          FROM common c
          JOIN deg du ON du.a = c.u
          JOIN deg dv ON dv.a = c.v
        )
        SELECT u, v, common_neighbors, union_neighbors,
               round(CAST(common_neighbors AS DOUBLE)
                     / CAST(union_neighbors AS DOUBLE), 9) AS jaccard
        FROM scored
        WHERE NOT EXISTS (
          SELECT 1 FROM sym WHERE sym.a = scored.u AND sym.b = scored.v
        )
        ORDER BY u, v
    """


def _q_bib_coupling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bibliographic coupling (pipeline/web.py bib_coupling) — the
    outlink dual of cocitation_hosts over the same synthetic link graph:
    source-host pairs by distinct shared destinations, hub-destination
    degree cut, one bounded self-join on dst. The oracle synthesizes the
    identical edge list directly."""
    from gos2_spark.pipeline.web import bib_coupling, extract_links, url_host

    docs = _load(spark, sf_dir, "documents")
    d = F.col("doc_id")
    k, m, base = _messy_url_parts(d)
    html = F.concat(
        F.lit('<html><body><a href="https://site'),
        ((d * 7) % 20).cast("string"),
        F.lit(".example/p/"),
        m,
        F.lit('">x</a> <a href="https://site'),
        ((d * 11) % 20).cast("string"),
        F.lit('.example/q">y</a></body></html>'),
    )
    pages = docs.select(base.alias("url"), html.alias("html"))
    edges = pages.select(
        url_host(F.col("url")).alias("src_host"),
        F.explode(extract_links(F.col("html"))).alias("href"),
    ).select("src_host", url_host(F.col("href")).alias("dst_host"))
    return bib_coupling(edges).orderBy("src_a", "src_b")


_BIB_COUPLING_ORACLE = """
    WITH e0 AS (
      SELECT 'site' || (doc_id % 20)::VARCHAR || '.example' AS src,
             'site' || ((doc_id * 7) % 20)::VARCHAR || '.example' AS dst
      FROM documents
      UNION ALL
      SELECT 'site' || (doc_id % 20)::VARCHAR || '.example',
             'site' || ((doc_id * 11) % 20)::VARCHAR || '.example'
      FROM documents
    ),
    e AS (SELECT DISTINCT src, dst FROM e0),
    deg AS (SELECT dst, count(*) AS d FROM e GROUP BY dst),
    kept AS (SELECT e.src, e.dst FROM e JOIN deg USING (dst)
             WHERE d <= 1000)
    SELECT a.src AS src_a, b.src AS src_b,
           CAST(count(*) AS BIGINT) AS n_coupled
    FROM kept a JOIN kept b ON a.dst = b.dst AND a.src < b.src
    GROUP BY 1, 2 ORDER BY 1, 2
"""


def _q_recrawl_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-rate recrawl scheduling (pipeline/web.py recrawl_priority)
    over a fetch log derived from events: key = 'url' user_id % 50,
    fingerprint = floor(value * 100). Change counts and epoch math are
    exact BIGINTs; rate, staleness, and priority are fixed-order
    divisions the oracle replays with DuckDB windows."""
    from gos2_spark.pipeline.web import recrawl_priority

    ev = _load(spark, sf_dir, "events")
    fetches = ev.select(
        (F.col("user_id") % 50).alias("url"),
        "ts",
        F.floor(F.col("value") * 100).cast("long").alias("fingerprint"),
    )
    return recrawl_priority(fetches).orderBy("key")


_RECRAWL_ORACLE = """
    WITH f AS (
      SELECT user_id % 50 AS key,
             epoch_us(ts) AS us,
             CAST(floor(value * 100) AS BIGINT) AS fp
      FROM events
    ),
    marked AS (
      SELECT key, us,
             CASE WHEN fp != lag(fp) OVER
                    (PARTITION BY key ORDER BY us, fp)
                  THEN 1 ELSE 0 END AS chg
      FROM f
    ),
    per AS (
      SELECT key, count(*) AS n_fetches,
             CAST(sum(chg) AS BIGINT) AS n_changes,
             min(us) AS first_us, max(us) AS last_us
      FROM marked GROUP BY 1
    ),
    ref AS (SELECT max(last_us) AS ref_us FROM per)
    SELECT key, n_fetches, n_changes,
           round(CAST(last_us - first_us AS DOUBLE) / 86400000000.0, 9)
             AS age_days,
           round(CAST(ref_us - last_us AS DOUBLE) / 86400000000.0, 9)
             AS stale_days,
           round(CASE WHEN n_fetches >= 2 AND last_us > first_us
                 THEN CAST(n_changes AS DOUBLE)
                      / (CAST(last_us - first_us AS DOUBLE) / 86400000000.0)
                 END, 9) AS lambda_day,
           round(CASE WHEN n_fetches >= 2 AND last_us > first_us
                 THEN CAST(n_changes AS DOUBLE)
                      / (CAST(last_us - first_us AS DOUBLE) / 86400000000.0)
                      * (CAST(ref_us - last_us AS DOUBLE) / 86400000000.0)
                 END, 9) AS priority
    FROM per, ref ORDER BY key
"""


def _q_erp_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ERP distance between the trajectories of users 0-9
    (spark/trajectory.py erp_distance_col): the METRIC member of the
    trajectory family — real-valued gap costs to the origin gap point
    (angle distance collapses to atan2(sqrt(y^2+z^2), x)), triangle
    inequality preserved. Same nested Catalyst fold as EDR with a
    prefix-sum init row; bit-identical to the DuckDB nested-list_reduce
    replay. The 10-user cohort bound stands in for the covering-overlap
    prefilter (same contract as trajectory_hausdorff)."""
    from gos2_spark.spark.trajectory import erp_distance_col

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    pts = ev.where(F.col("user_id") < 10).select(
        "user_id", "ts", "event_id",
        (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
        (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
    )
    rlat, rlng = F.radians("lat"), F.radians("lng")
    xyz = pts.select(
        "user_id", "ts", "event_id",
        F.struct(
            (F.cos(rlng) * F.cos(rlat)).alias("x"),
            (F.sin(rlng) * F.cos(rlat)).alias("y"),
            F.sin(rlat).alias("z"),
        ).alias("p"),
    )
    traj = xyz.groupBy("user_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ts", "event_id", "p"))),
            lambda s: s["p"],
        ).alias("tr"),
        F.count("*").alias("n_pts"),
    )
    a = traj.select(
        F.col("user_id").alias("user_a"),
        F.col("tr").alias("ta"),
        F.col("n_pts").alias("pts_a"),
    )
    b = traj.select(
        F.col("user_id").alias("user_b"),
        F.col("tr").alias("tb"),
        F.col("n_pts").alias("pts_b"),
    )
    pairs = a.join(b, F.col("user_a") < F.col("user_b"))
    return pairs.select(
        "user_a", "user_b", "pts_a", "pts_b",
        F.round(
            erp_distance_col(F.col("ta"), F.col("tb")), 9
        ).alias("erp_rad"),
    ).orderBy("user_a", "user_b")


def _erp_oracle_sql() -> str:
    gap_xx = "atan2(sqrt(xx[2] * xx[2] + xx[3] * xx[3]), xx[1])"
    gap_yy = "atan2(sqrt(yy[2] * yy[2] + yy[3] * yy[3]), yy[1])"
    return f"""
        WITH pts0 AS ({_EVENTS_LATLNG_SQL}),
        xyz AS (
          SELECT user_id, ts, event_id,
                 cos(radians(lng)) * cos(radians(lat)) AS x,
                 sin(radians(lng)) * cos(radians(lat)) AS y,
                 sin(radians(lat)) AS z
          FROM pts0 WHERE user_id < 10
        ),
        traj AS (
          SELECT user_id,
                 list([x, y, z] ORDER BY ts, event_id) AS tr,
                 count(*) AS n_pts
          FROM xyz GROUP BY 1
        ),
        pairs AS (
          SELECT a.user_id AS user_a, b.user_id AS user_b,
                 a.tr AS ta, b.tr AS tb,
                 a.n_pts AS pts_a, b.n_pts AS pts_b
          FROM traj a JOIN traj b ON a.user_id < b.user_id
        ),
        dp AS (
          SELECT user_a, user_b, pts_a, pts_b,
                 list_reduce(
                   list_concat(
                     [list_reduce(
                        list_concat([[0.0]], tb),
                        (N, yy) -> list_append(N, N[len(N)] + {gap_yy}))],
                     ta),
                   (R, xx) -> list_reduce(
                     list_concat([[R[1] + {gap_xx}]], tb),
                     (N, yy) -> list_append(N,
                       least(
                         R[len(N)]
                         + atan2(sqrt(
                               (xx[2] * yy[3] - xx[3] * yy[2])
                             * (xx[2] * yy[3] - xx[3] * yy[2])
                             + (xx[3] * yy[1] - xx[1] * yy[3])
                             * (xx[3] * yy[1] - xx[1] * yy[3])
                             + (xx[1] * yy[2] - xx[2] * yy[1])
                             * (xx[1] * yy[2] - xx[2] * yy[1])),
                             xx[1] * yy[1] + xx[2] * yy[2]
                             + xx[3] * yy[3]),
                         R[len(N) + 1] + {gap_xx},
                         N[len(N)] + {gap_yy})))
                 ) AS row
          FROM pairs
        )
        SELECT user_a, user_b, pts_a, pts_b,
               round(row[len(row)], 9) AS erp_rad
        FROM dp ORDER BY user_a, user_b
    """


def _q_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters triple exponential smoothing
    (spark/temporal.py holt_winters) of each event type's daily counts,
    period 7, alpha=1/4 beta=1/8 gamma=1/2 (exact binary coefficients):
    the TRIPLE-state ordered fold — level, trend, and a rotating 7-slot
    seasonal register advance as one flat array<double> through a
    sequential F.aggregate; the DuckDB list_reduce replay uses the
    identical expression text, so every double matches bit-for-bit."""
    from gos2_spark.spark.temporal import holt_winters

    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    daily = (
        ev.select(
            "event_type",
            F.floor(us / 86_400_000_000).cast("long").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("n"))
    )
    return holt_winters(
        daily, ["event_type"], "day", "n", period=7
    ).orderBy("event_type")


_HOLT_WINTERS_ORACLE = """
    -- triple state rides as a flat 9-element DOUBLE list [l, b, s1..s7];
    -- every element of the folded list is ALSO a 9-list whose first slot
    -- is the observation, so the first element doubles as the init state
    -- (l = x1, b = 0, s = 0) — the Holt pair-state pattern widened
    WITH daily AS (
      SELECT event_type,
             CAST(floor(CAST(date_diff('microsecond',
                  TIMESTAMP '1970-01-01 00:00:00', ts) AS DOUBLE)
                  / 86400000000) AS BIGINT) AS day,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    g AS (
      SELECT event_type, count(*) AS n_obs,
             list([CAST(n AS DOUBLE),
                   0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
                  ORDER BY day) AS sts
      FROM daily GROUP BY 1
    ),
    r AS (
      SELECT event_type, n_obs,
             list_reduce(sts, (acc, e) -> list_concat(list_concat(
               [2.5e-1 * (e[1] - acc[3])
                  + 7.5e-1 * (acc[1] + acc[2]),
                ((2.5e-1 * (e[1] - acc[3])
                    + 7.5e-1 * (acc[1] + acc[2])) - acc[1]) * 1.25e-1
                  + acc[2] * 8.75e-1],
               acc[4:9]),
               [(e[1] - (2.5e-1 * (e[1] - acc[3])
                   + 7.5e-1 * (acc[1] + acc[2]))) * 5e-1
                  + acc[3] * 5e-1])) AS st
      FROM g
    )
    SELECT event_type, n_obs,
           round(st[1], 6) AS level,
           round(st[2], 6) AS trend,
           round(st[3], 6) AS season_next,
           round(st[1] + st[2] + st[3], 6) AS forecast_1
    FROM r ORDER BY event_type
"""


def _q_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS second-frequency-moment sketch (pipeline/sketch.py ams_f2)
    of the token distribution per language: 8 xxhash64-salted +/-1 sign
    sums (exact BIGINTs, one map-side-combined pass) vs the exact F2 —
    the self-join-size / skew screen. The oracle replays every sign via
    the SQL XXH64 model."""
    from gos2_spark.pipeline.sketch import ams_f2
    from gos2_spark.pipeline.text import tokens

    docs = _load(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(
            F.when(
                F.trim(F.col("text")) == "", F.array().cast("array<string>")
            ).otherwise(tokens(F.col("text")))
        ).alias("token"),
    )
    return ams_f2(toks, "token", ["lang"], n_estimators=8).orderBy("lang")


def _ams_f2_oracle_sql(n_estimators: int = 8) -> str:
    from gos2_spark.pipeline.duckdb_oracles import xxh64_list_sql

    salted = "[" + ", ".join(
        f"token || '#ams{r}'" for r in range(n_estimators)
    ) + "]"
    s_cols = ", ".join(
        f"CAST(sum(c * (1 - 2 * (((hs[{r + 1}] % 2) + 2) % 2))) AS BIGINT)"
        f" AS s{r}"
        for r in range(n_estimators)
    )
    est = " + ".join(
        f"CAST(s{r} AS DOUBLE) * CAST(s{r} AS DOUBLE)"
        for r in range(n_estimators)
    )
    return f"""
        WITH toks AS (
          SELECT lang,
                 CASE WHEN trim(text) = '' THEN []
                      ELSE regexp_split_to_array(trim(text), '\\s+')
                 END AS tk
          FROM documents
        ),
        t AS (
          SELECT lang, u.token
          FROM toks, LATERAL unnest(tk) AS u(token)
        ),
        cnt AS (
          SELECT lang, token, count(*) AS c,
                 ({xxh64_list_sql(salted)}) AS hs
          FROM t GROUP BY 1, 2
        ),
        per AS (
          SELECT lang,
                 CAST(sum(c) AS BIGINT) AS n_items,
                 count(*) AS n_distinct,
                 CAST(sum(c * c) AS BIGINT) AS f2_exact,
                 {s_cols}
          FROM cnt GROUP BY 1
        )
        SELECT lang, n_items, n_distinct, f2_exact,
               round(({est}) / {float(n_estimators)!r}, 6) AS f2_est
        FROM per ORDER BY lang
    """


def _q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic A-ES weighted sampling without replacement
    (pipeline/pack.py weighted_sample_topk): the 25 documents winning
    the ln(u)/w order statistic with u derived from the doc_id hash —
    reproducible under any partitioning (pure key function, the
    checkpoint/resume-safe sampler). Weight = n_chars (min 1). The
    oracle recomputes u and the scores from the SQL XXH64 model."""
    from gos2_spark.pipeline.pack import weighted_sample_topk

    docs = _load(spark, sf_dir, "documents")
    out = weighted_sample_topk(
        docs, F.greatest(F.col("n_chars"), F.lit(1)), k=25,
        key_col="doc_id",
    )
    return out.select(
        "doc_id", "n_chars", F.round("aes_score", 9).alias("aes_score")
    ).orderBy("doc_id")


def _weighted_sample_oracle_sql(k: int = 25) -> str:
    from gos2_spark.pipeline.duckdb_oracles import xxh64_list_sql

    salted = "[CAST(doc_id AS VARCHAR) || '#aes']"
    h = f"({xxh64_list_sql(salted)})[1]"
    p = 1 << 53
    return f"""
        WITH g AS (
          SELECT doc_id, n_chars,
                 ln((CAST((({h}) % {p} + {p}) % {p} AS DOUBLE) + 1.0)
                    / {float(p) + 1.0!r})
                 / CAST(greatest(n_chars, 1) AS DOUBLE) AS score
          FROM documents
        ),
        top AS (
          SELECT doc_id, n_chars, score FROM g
          ORDER BY score DESC, doc_id LIMIT {k}
        )
        SELECT doc_id, n_chars, round(score, 9) AS aes_score
        FROM top ORDER BY doc_id
    """


def _q_ab_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test (spark/aggregates.py two_proportion_ztest)
    over a hash-split A/B assignment of users (arm = xxhash64 parity —
    the same deterministic bucketing a real experiment platform uses):
    did arm 1 convert (any 'purchase' event) at a different rate? Four
    conditional BIGINT sums; z is one fixed-order float expression the
    oracle replays through the SQL XXH64 model."""
    from gos2_spark.spark.aggregates import two_proportion_ztest

    ev = _load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            (
                (F.col("event_type") == "purchase")
                & (F.col("value") >= 200.0)
            ).cast("long")
        ).alias("converted")
    )
    arm = F.pmod(
        F.xxhash64(
            F.concat(F.col("user_id").cast("string"), F.lit("#ab"))
        ),
        F.lit(2),
    ).cast("int")
    return two_proportion_ztest(
        per_user.withColumn("arm", arm), "arm", "converted"
    )


def _ab_ztest_oracle_sql() -> str:
    from gos2_spark.pipeline.duckdb_oracles import xxh64_list_sql

    salted = "[CAST(user_id AS VARCHAR) || '#ab']"
    h = f"({xxh64_list_sql(salted)})[1]"
    return f"""
        WITH per_user AS (
          SELECT user_id,
                 max(CASE WHEN event_type = 'purchase' AND value >= 200.0 THEN 1 ELSE 0 END)
                   AS converted
          FROM events GROUP BY 1
        ),
        armed AS (
          SELECT ((({h}) % 2) + 2) % 2 AS arm, converted FROM per_user
        ),
        agg AS (
          SELECT
            CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
            CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT)
              AS conv0,
            CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
            CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT)
              AS conv1
          FROM armed
        )
        SELECT n0, conv0, n1, conv1,
               round(CASE WHEN n0 > 0
                     THEN CAST(conv0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                     END, 9) AS p0,
               round(CASE WHEN n1 > 0
                     THEN CAST(conv1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                     END, 9) AS p1,
               round(CAST(conv0 + conv1 AS DOUBLE)
                     / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)), 9)
                 AS p_pooled,
               round(CASE WHEN n0 > 0 AND n1 > 0
                          AND conv0 + conv1 > 0
                          AND conv0 + conv1 < n0 + n1 THEN
                     (CAST(conv0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                      - CAST(conv1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                     / sqrt((CAST(conv0 + conv1 AS DOUBLE)
                             / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)))
                            * (1.0 - CAST(conv0 + conv1 AS DOUBLE)
                               / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)))
                            * (1.0 / CAST(n0 AS DOUBLE)
                               + 1.0 / CAST(n1 AS DOUBLE)))
                     END, 9) AS z_stat
        FROM agg
    """


_CROSS_K_RADII = (0.01, 0.03, 0.08)


def _q_cross_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate Ripley cross-K (spark/spatialstats.py cross_k) between
    the purchase and signup point patterns (1-in-2 subsamples): does
    pattern B cluster around pattern A at scale r? Pair counting via
    the engine's cell-blocked A-to-B within-radius join; the oracle
    brute-forces the full cross product with the identical atan2
    distance, certifying zero false negatives in the blocked join."""
    from gos2_spark.spark.functions import add_cellid_sql
    from gos2_spark.spark.spatialstats import cross_k

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    pts = add_cellid_sql(
        ev.select(
            "event_id", "event_type",
            (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
            (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
        ).where(e % 2 == 0),
        "lat", "lng", "cell_id",
    )
    a = pts.where(F.col("event_type") == "purchase").drop("event_type")
    b = pts.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("bid"), "lat", "lng", "cell_id"
    )
    return cross_k(
        a, b, _CROSS_K_RADII, point_key="event_id", b_key="bid"
    ).orderBy("r_rad")


def _cross_k_oracle_sql() -> str:
    rows = []
    for r in _CROSS_K_RADII:
        rows.append(f"""
          SELECT {float(r)!r} AS r_rad, n_a, n_b,
                 (SELECT count(*) FROM pd WHERE d <= {float(r)!r})
                   AS n_pairs,
                 round({4.0 * 3.141592653589793!r}
                       * CAST((SELECT count(*) FROM pd
                               WHERE d <= {float(r)!r}) AS DOUBLE)
                       / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 9)
                   AS k_hat,
                 {3.141592653589793!r} * {float(r)!r} * {float(r)!r}
                   AS indep_pi_r2
          FROM ns""")
    sel = " UNION ALL ".join(rows)
    return f"""
        WITH pts0 AS (
          SELECT event_id, event_type, lat, lng
          FROM ({_EVENTS_LATLNG_SQL.replace("SELECT user_id, ts, event_id,",
                                            "SELECT event_type, event_id,")})
          WHERE event_id % 2 = 0
        ),
        v AS (
          SELECT event_id, event_type,
                 cos(radians(lng)) * cos(radians(lat)) AS x,
                 sin(radians(lng)) * cos(radians(lat)) AS y,
                 sin(radians(lat)) AS z
          FROM pts0
        ),
        va AS (SELECT * FROM v WHERE event_type = 'purchase'),
        vb AS (SELECT * FROM v WHERE event_type = 'signup'),
        pd AS (
          SELECT atan2(sqrt(
                     (a.y * b.z - a.z * b.y) * (a.y * b.z - a.z * b.y)
                   + (a.z * b.x - a.x * b.z) * (a.z * b.x - a.x * b.z)
                   + (a.x * b.y - a.y * b.x) * (a.x * b.y - a.y * b.x)),
                   a.x * b.x + a.y * b.y + a.z * b.z) AS d
          FROM va a CROSS JOIN vb b
        ),
        ns AS (
          SELECT (SELECT count(*) FROM va) AS n_a,
                 (SELECT count(*) FROM vb) AS n_b
        )
        SELECT * FROM ({sel}) ORDER BY r_rad
    """


_EHS_HOT_Z = 1.959963984540054


def _q_emerging_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Emerging-hotspot classification per level-5 cell — the classic
    space-time-cube readout composed from the engine's two scorers:
    Getis-Ord Gi* on the cell totals (is it hot NOW, vs its neighbors)
    x Mann-Kendall on the cell's daily series (is it trending). Cells
    with >= 10 observed days classify as intensifying / persistent /
    diminishing (hot) or new / none (not hot). Both statistics are
    exact-BIGINT sufficient statistics with one final float expression
    each; the oracle replays the full composition."""
    from gos2_spark.spark.functions import add_cellid_sql, s2_token
    from gos2_spark.spark.pages import s2_parent_sql
    from gos2_spark.spark.spatialstats import getis_ord_gistar, mann_kendall
    from gos2_spark.pipeline.graph import _default_materialize

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    pts = add_cellid_sql(
        ev.select(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
                "day"
            ),
            (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
            (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
        ),
        "lat", "lng", "cell_id",
    ).select(s2_parent_sql(F.col("cell_id"), 5).alias("cell"), "day")
    pts = _default_materialize(spark)(pts)
    counts = pts.groupBy("cell").agg(F.count("*").alias("n"))
    gi = getis_ord_gistar(counts, cell_col="cell", count_col="n")
    daily = pts.groupBy("cell", "day").agg(F.count("*").alias("n"))
    mk = mann_kendall(daily, "cell", "day", "n", min_len=10)
    mk = mk.withColumnRenamed("cell", "_mkcell")
    j = gi.join(mk, gi["cell"] == mk["_mkcell"])
    hot = F.col("gi_star") > F.lit(_EHS_HOT_Z)
    cat = (
        F.when(hot & (F.col("trend") == "increasing"), "intensifying")
        .when(hot & (F.col("trend") == "decreasing"), "diminishing")
        .when(hot, "persistent")
        .when(F.col("trend") == "increasing", "new")
        .otherwise("none")
    )
    return j.select(
        s2_token(gi["cell"]).alias("token"),
        "x_count",
        F.round("gi_star", 9).alias("gi_star"),
        "s_stat",
        F.round("mk_z", 9).alias("mk_z"),
        cat.alias("category"),
    ).orderBy("token")


def _emerging_hotspots_oracle_sql() -> str:
    from gos2_spark.pipeline import duckdb_oracles as _DO

    pts_cte = _cellid_cte_duckdb(
        f"SELECT event_id AS key, lat, lng FROM ({_EVENTS_LATLNG_SQL})"
    )
    pairs = _DO.edge_neighbors_l8_oracle_sql(pts_cte, level=5)
    lsb = 1 << 50  # level 5
    tok = _DO._token(f"((cell_id & -{lsb}) | {lsb})")
    return f"""
        WITH pairs AS ({pairs}),
        {pts_cte},
        lv AS (
          SELECT {tok} AS token,
                 strftime(date_trunc('day', e.ts), '%Y-%m-%d') AS day
          FROM cells c JOIN events e ON e.event_id = c.key
        ),
        cnt AS (SELECT token, count(*) AS n FROM lv GROUP BY 1),
        nj AS (
          SELECT p.token, count(*) AS w_nbrs,
                 CAST(sum(c2.n) AS BIGINT) AS nbr_sum
          FROM pairs p JOIN cnt c2 ON c2.token = p.nbr_token
          GROUP BY 1
        ),
        per AS (
          SELECT c.token, CAST(c.n AS BIGINT) AS x_count,
                 CAST(COALESCE(nj.w_nbrs, 0) + 1 AS BIGINT) AS w_i,
                 CAST(COALESCE(nj.nbr_sum, 0) + c.n AS BIGINT) AS local_sum
          FROM cnt c LEFT JOIN nj ON nj.token = c.token
        ),
        g AS (
          SELECT count(*) AS n_cells,
                 CAST(sum(n) AS BIGINT) AS sx,
                 CAST(sum(n * n) AS BIGINT) AS sxx
          FROM cnt
        ),
        gi AS (
          SELECT token, x_count,
                 (CAST(local_sum AS DOUBLE)
                  - (CAST(sx AS DOUBLE) / CAST(n_cells AS DOUBLE))
                    * CAST(w_i AS DOUBLE))
                 / (sqrt(CAST(sxx AS DOUBLE) / CAST(n_cells AS DOUBLE)
                         - (CAST(sx AS DOUBLE) / CAST(n_cells AS DOUBLE))
                           * (CAST(sx AS DOUBLE) / CAST(n_cells AS DOUBLE)))
                    * sqrt((CAST(n_cells AS DOUBLE) * CAST(w_i AS DOUBLE)
                            - CAST(w_i AS DOUBLE) * CAST(w_i AS DOUBLE))
                           / (CAST(n_cells AS DOUBLE) - 1.0))) AS gi_star
          FROM per, g
        ),
        daily AS (
          SELECT token, day, count(*) AS n FROM lv GROUP BY 1, 2
        ),
        lens AS (
          SELECT token, count(*) AS n_obs FROM daily
          GROUP BY 1 HAVING count(*) >= 10
        ),
        s AS (
          SELECT a.token,
                 CAST(sum(sign(b.n - a.n)) AS BIGINT) AS s_stat
          FROM daily a JOIN daily b
            ON a.token = b.token AND a.day < b.day
          JOIN lens l ON l.token = a.token
          GROUP BY 1
        ),
        ties AS (
          SELECT token,
                 CAST(sum(tc * (tc - 1) * (2 * tc + 5)) AS BIGINT)
                   AS tie_term
          FROM (
            SELECT d.token, d.n, count(*) AS tc
            FROM daily d JOIN lens l ON l.token = d.token
            GROUP BY 1, 2
          ) t GROUP BY 1
        ),
        z AS (
          SELECT lens.token, s.s_stat,
                 CASE WHEN s.s_stat > 0
                        THEN (CAST(s.s_stat AS DOUBLE) - 1.0)
                             / sqrt(CAST(lens.n_obs * (lens.n_obs - 1)
                                    * (2 * lens.n_obs + 5)
                                    - ties.tie_term AS DOUBLE) / 18.0)
                      WHEN s.s_stat < 0
                        THEN (CAST(s.s_stat AS DOUBLE) + 1.0)
                             / sqrt(CAST(lens.n_obs * (lens.n_obs - 1)
                                    * (2 * lens.n_obs + 5)
                                    - ties.tie_term AS DOUBLE) / 18.0)
                      ELSE 0.0 END AS mk_z
          FROM lens JOIN s ON s.token = lens.token
          JOIN ties ON ties.token = lens.token
        )
        SELECT gi.token, gi.x_count,
               round(gi.gi_star, 9) AS gi_star,
               z.s_stat,
               round(z.mk_z, 9) AS mk_z,
               CASE
                 WHEN gi.gi_star > {_EHS_HOT_Z!r}
                      AND z.mk_z > {_EHS_HOT_Z!r} THEN 'intensifying'
                 WHEN gi.gi_star > {_EHS_HOT_Z!r}
                      AND z.mk_z < -{_EHS_HOT_Z!r} THEN 'diminishing'
                 WHEN gi.gi_star > {_EHS_HOT_Z!r} THEN 'persistent'
                 WHEN z.mk_z > {_EHS_HOT_Z!r} THEN 'new'
                 ELSE 'none' END AS category
        FROM gi JOIN z ON z.token = gi.token
        ORDER BY gi.token
    """


def _q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact asymmetric containment join (pipeline/dedup.py
    containment_join) at t=0.8 over distinct 5-token shingles of the documents table — 'how much of
    A is inside B', the doc-in-doc / boilerplate detector resemblance
    misses when sizes differ. Probe-side prefix filtering under the
    rare-first global token order; the oracle runs the UNFILTERED
    shared-token join, certifying zero false negatives."""
    from gos2_spark.pipeline.dedup import containment_join

    docs = _load(spark, sf_dir, "documents")
    return containment_join(
        docs, threshold=0.8, shingle_k=5
    ).orderBy("key_a", "key_b")


_CONTAINMENT_ORACLE = """
    WITH tk AS (
      SELECT doc_id AS key,
             list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                         x -> len(x) > 0) AS l
      FROM documents
    ),
    sh AS (
      SELECT key,
             CASE WHEN len(l) >= 5
                  THEN list_transform(generate_series(1, len(l) - 4),
                                      i -> array_to_string(l[i:i + 4], ' '))
                  ELSE [] END AS grams
      FROM tk
    ),
    toks AS (
      SELECT key, unnest(list_distinct(grams)) AS token FROM sh
    ),
    sizes AS (SELECT key, count(*) AS sz FROM toks GROUP BY 1),
    inter AS (
      SELECT a.key AS key_a, b.key AS key_b, count(*) AS inter
      FROM toks a JOIN toks b
        ON a.token = b.token AND a.key != b.key
      GROUP BY 1, 2
    )
    SELECT i.key_a, i.key_b, CAST(i.inter AS BIGINT) AS inter,
           CAST(s.sz AS BIGINT) AS sz_a,
           round(CAST(i.inter AS DOUBLE) / CAST(s.sz AS DOUBLE), 9)
             AS containment
    FROM inter i JOIN sizes s ON s.key = i.key_a
    WHERE CAST(i.inter AS DOUBLE) >= 0.8 * CAST(s.sz AS DOUBLE)
    ORDER BY key_a, key_b
"""


def _q_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword scores (Mihalcea & Tarau 2004): PageRank
    (pipeline/graph.py, 3 damped iterations) over the corpus-wide word
    co-occurrence graph (adjacent-token pairs, symmetrized, distinct) —
    the graph sibling of rake_keywords. Symmetric edges mean every node
    has out-edges (zero dangling mass), so the oracle unrolls the same
    chained-CTE algebra as domain_pagerank over the bigram edge list."""
    from gos2_spark.pipeline.graph import pagerank

    docs = _load(spark, sf_dir, "documents")
    arr = F.filter(
        F.split(F.lower(F.col("text")), r"[^a-z]+"),
        lambda t: F.length(t) > 0,
    )
    toks = docs.select(arr.alias("l")).where(F.size("l") >= 2)
    bi = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice("l", 1, F.size("l") - 1).alias("w1"),
                F.slice("l", 2, F.size("l") - 1).alias("w2"),
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    edges = (
        bi.where(F.col("w1") != F.col("w2"))
        .unionByName(
            bi.select(
                F.col("w2").alias("w1"), F.col("w1").alias("w2")
            ).where(F.col("w1") != F.col("w2"))
        )
    )
    ranks = pagerank(edges, iterations=3, damping=0.85,
                     src_col="w1", dst_col="w2")
    return ranks.select(
        F.col("node").alias("word"), F.round("rank", 9).alias("rank")
    ).orderBy("word")


def _textrank_oracle_sql(iterations: int = 3, damping: float = 0.85) -> str:
    d = damping
    sql = """
        WITH tk AS (
          SELECT list_filter(
                   regexp_split_to_array(lower(text), '[^a-z]+'),
                   x -> len(x) > 0) AS l
          FROM documents
        ),
        tk2 AS (SELECT l FROM tk WHERE len(l) >= 2),
        bi AS (
          SELECT l[i] AS w1, l[i + 1] AS w2
          FROM tk2, LATERAL unnest(generate_series(1, len(l) - 1)) AS g(i)
        ),
        e AS (
          SELECT DISTINCT w1 AS src, w2 AS dst FROM bi WHERE w1 != w2
          UNION
          SELECT DISTINCT w2, w1 FROM bi WHERE w1 != w2
        ),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        deg AS (SELECT src, count(*) AS out_deg FROM e GROUP BY 1),
        w AS (
          SELECT e.src, e.dst, CAST(1 AS DOUBLE) / deg.out_deg AS w
          FROM e JOIN deg USING (src)
        ),
        r0 AS (SELECT node, CAST(1 AS DOUBLE) / nn.n AS rank
               FROM nodes, nn)
    """
    prev = "r0"
    for i in range(1, iterations + 1):
        sql += f""",
        c{i} AS (
          SELECT w.dst, sum({prev}.rank * w.w) AS contrib
          FROM w JOIN {prev} ON w.src = {prev}.node GROUP BY 1
        ),
        r{i} AS (
          SELECT nodes.node,
                 (1.0 - {d}) / nn.n
                   + {d} * coalesce(c{i}.contrib, 0.0) AS rank
          FROM nodes LEFT JOIN c{i} ON nodes.node = c{i}.dst, nn
        )
    """
        prev = f"r{i}"
    sql += f"""
        SELECT node AS word, round(rank, 9) AS rank
        FROM {prev} ORDER BY word
    """
    return sql


def _q_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster zonal statistics (raster<->vector, north_rule): per tile
    polygon, aggregate the level-8 cell-count surface of the customer
    points over the tile's center-mode rasterization — cell total,
    occupied count, sum/min/max, and occupied-mean. Composes the proven
    rasterize_centers grid with one hash join + keyed agg; all BIGINT
    sufficient statistics, one final division."""
    from gos2_spark.spark.pages import s2_parent_sql
    from gos2_spark.spark.raster import rasterize_centers

    rast = rasterize_centers(spark, _tileset(32), _RASTER_LEVEL)
    pts = _cust_points(spark, sf_dir)
    counts = pts.groupBy(
        s2_parent_sql(F.col("cell_id"), _RASTER_LEVEL).alias("cell_id")
    ).agg(F.count("*").alias("n"))
    j = rast.join(counts, "cell_id", "left")
    return (
        j.groupBy("tile_id")
        .agg(
            F.count("*").alias("n_cells"),
            F.count("n").alias("n_occupied"),
            F.sum(F.coalesce(F.col("n"), F.lit(0))).alias("sum_val"),
            F.min("n").alias("min_val"),
            F.max("n").alias("max_val"),
        )
        .withColumn(
            "mean_occupied",
            F.round(
                F.when(
                    F.col("n_occupied") > 0,
                    F.col("sum_val").cast("double")
                    / F.col("n_occupied").cast("double"),
                ),
                9,
            ),
        )
        .orderBy("tile_id")
    )


def _zonal_stats_oracle_sql() -> str:
    lsb = 1 << (2 * (30 - _RASTER_LEVEL))
    return f"""
        WITH rast AS (SELECT * FROM ({_rasterize_oracle_sql(_RASTER_LEVEL)})),
        {_cellid_cte_duckdb(_CUST_LATLNG_SQL)},
        cnt AS (
          SELECT ((cell_id & -{lsb}) | {lsb}) AS cell_id, count(*) AS n
          FROM cells GROUP BY 1
        ),
        j AS (
          SELECT r.tile_id, c.n
          FROM rast r LEFT JOIN cnt c ON c.cell_id = r.cell_id
        ),
        agg AS (
          SELECT tile_id,
                 count(*) AS n_cells,
                 count(n) AS n_occupied,
                 CAST(sum(COALESCE(n, 0)) AS BIGINT) AS sum_val,
                 CAST(min(n) AS BIGINT) AS min_val,
                 CAST(max(n) AS BIGINT) AS max_val
          FROM j GROUP BY 1
        )
        SELECT tile_id, n_cells, n_occupied, sum_val, min_val, max_val,
               round(CASE WHEN n_occupied > 0
                     THEN CAST(sum_val AS DOUBLE)
                          / CAST(n_occupied AS DOUBLE) END, 9)
                 AS mean_occupied
        FROM agg ORDER BY tile_id
    """


def _q_katz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Katz centrality (pipeline/graph.py katz_centrality): 3 truncated
    power steps, alpha=1/8 (exact dyadic), over the synthetic 64-node
    domain graph — the walk-counting companion of domain_pagerank. The
    oracle unrolls the identical multiply-add chain as chained CTEs."""
    from gos2_spark.pipeline.graph import katz_centrality

    c = _load(spark, sf_dir, "customer")
    edges = c.select(
        (F.col("c_custkey") % 64).alias("src"),
        ((F.col("c_custkey") * 7 + 3) % 64).alias("dst"),
    )
    out = katz_centrality(edges, iterations=3, alpha=0.125)
    return out.select(
        "node", F.round("katz", 9).alias("katz")
    ).orderBy("node")


def _katz_oracle_sql(iterations: int = 3, alpha: float = 0.125) -> str:
    sql = """
        WITH e AS (
          SELECT DISTINCT c_custkey % 64 AS src,
                          (c_custkey * 7 + 3) % 64 AS dst
          FROM customer
        ),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        x0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS katz FROM nodes)
    """
    prev = "x0"
    for i in range(1, iterations + 1):
        sql += f""",
        i{i} AS (
          SELECT e.dst, sum({prev}.katz) AS s
          FROM e JOIN {prev} ON e.src = {prev}.node GROUP BY 1
        ),
        x{i} AS (
          SELECT nodes.node,
                 1.0 + {alpha!r} * coalesce(i{i}.s, 0.0) AS katz
          FROM nodes LEFT JOIN i{i} ON nodes.node = i{i}.dst
        )
    """
        prev = f"x{i}"
    sql += f"""
        SELECT node, round(katz, 9) AS katz FROM {prev} ORDER BY node
    """
    return sql


def _q_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native stateful session windows on a REPLAYED STREAM
    (spark/streaming.py streaming_session_counts): the events table
    staged to 4 parquet files and consumed one file per micro-batch;
    sessions split at >=1h silences, session_end = last event + gap —
    identical to the batch sessionize contract, so the gaps-and-islands
    SQL oracle pins every session row the stream emits."""
    import shutil
    import tempfile

    from gos2_spark.spark.streaming import (
        run_to_memory,
        streaming_session_counts,
    )

    # parquet ts is TIMESTAMP_NTZ, which Spark rejects as an event-time
    # column; rebuild a true TIMESTAMP from epoch micros (TZ-independent)
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    ev = _load(spark, sf_dir, "events").select(
        "user_id", F.timestamp_micros(us).alias("ts")
    )
    tmp = tempfile.mkdtemp(prefix="gos2_stream_sessions_")
    ev.repartition(4).write.mode("overwrite").parquet(tmp)
    sch = spark.read.parquet(tmp).schema
    stream = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1)
        .parquet(tmp)
    )
    # the staged files are hash-split, so a later micro-batch can carry
    # events arbitrarily older than the watermark; size it past the
    # table's 30-day span so the replay is lossless and deterministic
    # (state stays bounded for a live feed — the bound just exceeds the
    # replay window here)
    out = streaming_session_counts(
        stream, gap="1 hour", watermark="45 days"
    )
    q = run_to_memory(out, "gos2_stream_sessions")
    q.awaitTermination()
    res = (
        spark.table("gos2_stream_sessions")
        .select(
            F.col("key").alias("user_id"),
            F.unix_micros("session_start").alias("start_us"),
            F.unix_micros("session_end").alias("end_us"),
            "n_events",
        )
        .orderBy("user_id", "start_us")
    )
    rows = res.collect()
    shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "user_id long, start_us long, end_us long, n_events long"
    ).orderBy("user_id", "start_us")


_STREAMING_SESSIONS_ORACLE = """
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS us FROM events
    ),
    marked AS (
      SELECT user_id, us,
             CASE WHEN us - lag(us) OVER
                    (PARTITION BY user_id ORDER BY us) > 3600000000
                  OR lag(us) OVER
                    (PARTITION BY user_id ORDER BY us) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM e
    ),
    sess AS (
      SELECT user_id, us,
             sum(new_s) OVER
               (PARTITION BY user_id ORDER BY us
                ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id,
           min(us) AS start_us,
           max(us) + 3600000000 AS end_us,
           count(*) AS n_events
    FROM sess GROUP BY user_id, sid
    ORDER BY user_id, start_us
"""


def _q_st_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST-DBSCAN (spark/clustering.py st_dbscan) over the 1-in-10 event
    subsample: neighbors must be within 3 degrees AND 3 days, so bursts
    at the same place in different weeks stay separate clusters — the
    spatiotemporal variant plain dbscan_clusters can't express. Same
    verified DBSCAN tail; the oracle rebuilds the identical space-time
    eps-graph and replays the recursive core closure."""
    from gos2_spark.spark.clustering import st_dbscan
    from gos2_spark.spark.functions import add_cellid_sql

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    pts = add_cellid_sql(
        ev.select(
            "event_id", "ts",
            (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
            (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
        ).where(e % 10 == 0),
        "lat", "lng", "cell_id",
    )
    res = st_dbscan(
        pts, eps_deg=3.0, eps_time_sec=259200, min_pts=3,
        point_key="event_id",
    )
    return res.select(
        "key", "role",
        F.coalesce(F.col("cluster"), F.lit(-1)).alias("cluster"),
    ).orderBy("key")


_ST_DBSCAN_ORACLE = f"""
    WITH RECURSIVE pts0 AS ({_EVENTS_LATLNG_SQL}),
    pts AS (
      SELECT event_id AS key,
             epoch_us(ts) AS t, lat, lng
      FROM pts0 WHERE event_id % 10 = 0
    ),
    v AS (
      SELECT key, t,
             cos(radians(lng)) * cos(radians(lat)) AS x,
             sin(radians(lng)) * cos(radians(lat)) AS y,
             sin(radians(lat)) AS z
      FROM pts
    ),
    e AS (
      SELECT a.key AS src, b.key AS dst
      FROM v a JOIN v b ON a.key != b.key
      WHERE abs(a.t - b.t) <= 259200000000
        AND atan2(sqrt(
                (a.y * b.z - a.z * b.y) * (a.y * b.z - a.z * b.y)
              + (a.z * b.x - a.x * b.z) * (a.z * b.x - a.x * b.z)
              + (a.x * b.y - a.y * b.x) * (a.x * b.y - a.y * b.x)),
              a.x * b.x + a.y * b.y + a.z * b.z)
            <= {math.radians(3.0)!r}
    ),
    deg AS (SELECT src AS key, count(*) AS n FROM e GROUP BY 1),
    core AS (
      SELECT p.key FROM pts p LEFT JOIN deg USING (key)
      WHERE coalesce(n, 0) >= 2
    ),
    ce AS (
      SELECT src, dst FROM e
      WHERE src IN (SELECT key FROM core)
        AND dst IN (SELECT key FROM core)
    ),
    reach(a, b) AS (
      SELECT key, key FROM core
      UNION
      SELECT r.a, ce.dst FROM reach r JOIN ce ON r.b = ce.src
    ),
    comp AS (SELECT a AS key, min(b) AS cluster FROM reach GROUP BY a),
    border AS (
      SELECT e.src AS key, min(comp.cluster) AS cluster
      FROM e JOIN comp ON e.dst = comp.key
      WHERE e.src NOT IN (SELECT key FROM core)
      GROUP BY e.src
    )
    SELECT key, 'core' AS role, cluster FROM comp
    UNION ALL
    SELECT key, 'border' AS role, cluster FROM border
    UNION ALL
    SELECT p.key, 'noise' AS role, CAST(-1 AS BIGINT) AS cluster
    FROM pts p
    WHERE p.key NOT IN (SELECT key FROM comp)
      AND p.key NOT IN (SELECT key FROM border)
    ORDER BY key
"""


def _q_cell_term_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region-distinctive vocabulary: PMI of (level-4 cell, token) over
    geoparsed documents — 'which words OVER-index in this part of the
    world', the geo-text affinity map a corpus explorer draws. Counts
    n_tc / n_t / n_c / N are exact BIGINTs from two map-side-combined
    aggregations + one broadcast total; PMI is one ln() per row.
    Pairs observed fewer than 5 times are dropped (PMI is noise at
    tiny counts)."""
    from gos2_spark.spark.functions import add_cellid_sql, s2_token
    from gos2_spark.spark.pages import s2_parent_sql
    from gos2_spark.pipeline.text import tokens

    docs = _load(spark, sf_dir, "documents")
    d = F.col("doc_id")
    geo = add_cellid_sql(
        docs.select(
            "text",
            (-60.0 + (d * 13 % 120) + (d % 71) / 71.0).alias("lat"),
            (-170.0 + (d * 19 % 340) + (d % 67) / 67.0).alias("lng"),
        ),
        "lat", "lng", "cell_id",
    ).select(
        s2_parent_sql(F.col("cell_id"), 4).alias("cell"),
        F.explode(
            F.when(
                F.trim(F.col("text")) == "", F.array().cast("array<string>")
            ).otherwise(tokens(F.col("text")))
        ).alias("token"),
    )
    tc = geo.groupBy("cell", "token").agg(F.count("*").alias("n_tc"))
    tt = geo.groupBy("token").agg(F.count("*").alias("n_t"))
    cc = geo.groupBy("cell").agg(F.count("*").alias("n_c"))
    nn = geo.agg(F.count("*").alias("n_all"))
    out = (
        tc.where(F.col("n_tc") >= 5)
        .join(tt, "token")
        .join(cc, "cell")
        .crossJoin(F.broadcast(nn))
        .select(
            s2_token(F.col("cell")).alias("cell_token"),
            "token", "n_tc", "n_t", "n_c",
            F.round(
                F.log(
                    F.col("n_tc").cast("double")
                    * F.col("n_all").cast("double")
                    / (
                        F.col("n_t").cast("double")
                        * F.col("n_c").cast("double")
                    )
                ),
                9,
            ).alias("pmi"),
        )
    )
    return out.orderBy("cell_token", "token")


def _cell_term_affinity_oracle_sql(level: int = 4) -> str:
    from gos2_spark.pipeline import duckdb_oracles as _DO

    lsb = 1 << (2 * (30 - level))
    tok = _DO._token(f"((cell_id & -{lsb}) | {lsb})")
    docs_latlng = """
        SELECT doc_id AS key,
               -60.0 + (doc_id * 13 % 120) + (doc_id % 71) / 71.0 AS lat,
               -170.0 + (doc_id * 19 % 340) + (doc_id % 67) / 67.0 AS lng
        FROM documents
    """
    return f"""
        WITH {_cellid_cte_duckdb(docs_latlng)},
        geo AS (
          SELECT {tok} AS cell_token, u.token
          FROM cells c
          JOIN (
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN []
                        ELSE regexp_split_to_array(trim(text), '\\s+')
                   END AS tk
            FROM documents
          ) d ON d.doc_id = c.key,
          LATERAL unnest(d.tk) AS u(token)
        ),
        tc AS (SELECT cell_token, token, count(*) AS n_tc
               FROM geo GROUP BY 1, 2),
        tt AS (SELECT token, count(*) AS n_t FROM geo GROUP BY 1),
        cc AS (SELECT cell_token, count(*) AS n_c FROM geo GROUP BY 1),
        nn AS (SELECT count(*) AS n_all FROM geo)
        SELECT tc.cell_token, tc.token,
               CAST(tc.n_tc AS BIGINT) AS n_tc,
               CAST(tt.n_t AS BIGINT) AS n_t,
               CAST(cc.n_c AS BIGINT) AS n_c,
               round(ln(CAST(tc.n_tc AS DOUBLE) * CAST(nn.n_all AS DOUBLE)
                        / (CAST(tt.n_t AS DOUBLE)
                           * CAST(cc.n_c AS DOUBLE))), 9) AS pmi
        FROM tc JOIN tt USING (token) JOIN cc USING (cell_token), nn
        WHERE tc.n_tc >= 5
        ORDER BY cell_token, token
    """


# ---------------------------------------------------------------------------
# round-4 continuation batch p: diameter / O-ring / effective-area /
# cross-track / closest-pair spatial operators
# ---------------------------------------------------------------------------

def _q_nation_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation point-set diameter with the achieving pair
    (spark/spatialstats.py group_diameter): group-keyed self-join of xyz
    unit vectors, exact atan2 angle (r3/vector.go:96-98 op order), ONE
    max-struct aggregation whose INTEGER tie-break keys make the arg-max
    pair deterministic cross-engine. Quadratic in the GROUP only (hull
    prefilter documented for planet-scale groups)."""
    from gos2_spark.spark.spatialstats import group_diameter

    c = _load(spark, sf_dir, "customer")
    pts = _cust_points(spark, sf_dir).join(
        c.select(
            F.col("c_custkey").alias("key"),
            F.col("c_nationkey").cast("long").alias("nation_key"),
        ),
        "key",
    )
    return group_diameter(
        pts, "nation_key", point_key="key"
    ).orderBy("nation_key")


_NATION_DIAMETER_ORACLE = f"""
    WITH p AS (
      SELECT c_custkey AS id, CAST(c_nationkey AS BIGINT) AS nk,
             -60.0 + (c_custkey * 7 % 120) + (c_custkey % 97) / 97.0 AS lat,
             -170.0 + (c_custkey * 13 % 340) + (c_custkey % 89) / 89.0 AS lng
      FROM customer
    ),
    v AS (
      SELECT id, nk,
             cos(radians(lng)) * cos(radians(lat)) AS x,
             sin(radians(lng)) * cos(radians(lat)) AS y,
             sin(radians(lat)) AS z
      FROM p
    ),
    pairs AS (
      SELECT a.nk, a.id AS ia, b.id AS ib,
             atan2(sqrt(
                 (a.y * b.z - a.z * b.y) * (a.y * b.z - a.z * b.y)
               + (a.z * b.x - a.x * b.z) * (a.z * b.x - a.x * b.z)
               + (a.x * b.y - a.y * b.x) * (a.x * b.y - a.y * b.x)),
               a.x * b.x + a.y * b.y + a.z * b.z) AS d
      FROM v a JOIN v b ON a.nk = b.nk AND a.id < b.id
    ),
    top AS (
      SELECT nk, ia, ib, d FROM pairs
      QUALIFY row_number() OVER (
          PARTITION BY nk ORDER BY d DESC, ia DESC, ib DESC) = 1
    ),
    counts AS (SELECT nk, count(*) AS n FROM v GROUP BY 1)
    SELECT c.nk AS nation_key, CAST(c.n AS BIGINT) AS n_points,
           t.ia AS key_a, t.ib AS key_b, round(t.d, 9) AS diameter_rad
    FROM counts c LEFT JOIN top t USING (nk)
    ORDER BY nation_key
"""


def _q_pair_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-ring pair-correlation g(h) over customer points
    (spark/spatialstats.py pair_correlation): annulus pair counts from
    the cell-blocked within-radius self-join (never all-pairs) divided
    by the EXACT spherical-cap ring-area fraction — the non-cumulative
    companion of the green ripley_k_function. Ring counts are BIGINTs;
    the brute O(n^2) oracle certifies zero false negatives in the
    blocked enumeration."""
    from gos2_spark.spark.spatialstats import pair_correlation

    pts = _cust_points(spark, sf_dir)
    return pair_correlation(
        pts, max_radius_deg=5.0, n_bins=5, point_key="key"
    ).orderBy("bin_idx")


def _pair_correlation_oracle_sql() -> str:
    import math as _m

    r = _m.radians(5.0)
    binw = _m.radians(5.0) / 5.0
    return f"""
        WITH pts AS ({_CUST_LATLNG_SQL}),
        v AS (
          SELECT key,
                 cos(radians(lng)) * cos(radians(lat)) AS x,
                 sin(radians(lng)) * cos(radians(lat)) AS y,
                 sin(radians(lat)) AS z
          FROM pts
        ),
        pairs AS (
          SELECT atan2(sqrt(
                     (a.y * b.z - a.z * b.y) * (a.y * b.z - a.z * b.y)
                   + (a.z * b.x - a.x * b.z) * (a.z * b.x - a.x * b.z)
                   + (a.x * b.y - a.y * b.x) * (a.x * b.y - a.y * b.x)),
                   a.x * b.x + a.y * b.y + a.z * b.z) AS d
          FROM v a JOIN v b ON a.key < b.key
        ),
        binned AS (
          SELECT least(CAST(floor(d / {binw!r}) AS BIGINT), 4) AS bin_idx
          FROM pairs WHERE d <= {r!r}
        ),
        agg AS (SELECT bin_idx, count(*) AS n_pairs FROM binned GROUP BY 1),
        tot AS (SELECT count(*) AS n FROM v)
        SELECT bin_idx,
               CAST(bin_idx AS DOUBLE) * {binw!r} AS h_lo_rad,
               (CAST(bin_idx AS DOUBLE) + 1.0) * {binw!r} AS h_hi_rad,
               n_pairs,
               round((CAST(n_pairs AS DOUBLE)
                      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) / 2.0))
                     / ((cos(CAST(bin_idx AS DOUBLE) * {binw!r})
                         - cos((CAST(bin_idx AS DOUBLE) + 1.0) * {binw!r}))
                        / 2.0), 9) AS g
        FROM agg, tot ORDER BY bin_idx
    """


def _q_effective_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visvalingam-Whyatt effective-area screen per user trajectory
    (spark/trajectory.py effective_area): one-pass triangle importance
    at every interior vertex via lag/lead, per-user keep counts at the
    0.5 deg^2 threshold — the window-only sibling of the recursive
    Douglas-Peucker in trajectory_simplify (which stays rows-only; this
    one is exactly SQL-replayable)."""
    from gos2_spark.spark.trajectory import effective_area

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    pts = ev.select(
        "user_id", "ts", "event_id",
        (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
        (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
    )
    return effective_area(pts, keep_threshold_deg2=0.5).orderBy("user_id")


_EFFECTIVE_AREA_ORACLE = f"""
    WITH pts AS ({_EVENTS_LATLNG_SQL}),
    tri AS (
      SELECT user_id,
             abs(lag(lng) OVER w * (lat - lead(lat) OVER w)
                 + lng * (lead(lat) OVER w - lag(lat) OVER w)
                 + lead(lng) OVER w * (lag(lat) OVER w - lat)) AS a2
      FROM pts
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_points,
           CAST(sum(CASE WHEN a2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_interior,
           CAST(coalesce(sum(CASE WHEN a2 >= 0.5 THEN 1 ELSE 0 END), 0)
               AS BIGINT) AS n_keep,
           coalesce(round(sum(a2), 6), 0.0) AS area2_sum
    FROM tri GROUP BY 1 ORDER BY user_id
"""


def _q_cross_track(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Route-relative decomposition of every customer point against the
    NYC->London great circle (spark/functions.py cross_track_rad /
    along_track_rad): signed cross-track via asin(sin(d13)sin(b13-b12)),
    along-track via acos(cos(d13)/cos(xt)) — all engine-haversine +
    forward-azimuth compositions in whole-stage codegen, clamped, with
    the identical literal expressions constant-folded by both engines."""
    from gos2_spark.spark.functions import along_track_rad, cross_track_rad

    pts = _cust_points(spark, sf_dir)
    a_lat, a_lng = F.lit(40.7128), F.lit(-74.0060)
    b_lat, b_lng = F.lit(51.5074), F.lit(-0.1278)
    return pts.select(
        "key",
        F.round(
            cross_track_rad(
                a_lat, a_lng, b_lat, b_lng, F.col("lat"), F.col("lng")
            ),
            9,
        ).alias("xt_rad"),
        F.round(
            along_track_rad(
                a_lat, a_lng, b_lat, b_lng, F.col("lat"), F.col("lng")
            ),
            9,
        ).alias("at_rad"),
    ).orderBy("key")


def _cross_track_oracle_sql() -> str:
    two_pi = repr(2.0 * math.pi)
    d13 = _hav_sql(40.7128, -74.0060)

    def brg(qlat: float, qlng: float, lat: str, lng: str) -> str:
        raw = (
            f"atan2(sin(radians({lng}) - radians({qlng!r}))"
            f" * cos(radians({lat})),"
            f" cos(radians({qlat!r})) * sin(radians({lat}))"
            f" - sin(radians({qlat!r})) * cos(radians({lat}))"
            f" * cos(radians({lng}) - radians({qlng!r})))"
        )
        return (
            f"(CASE WHEN {raw} < 0.0 THEN {raw} + {two_pi} ELSE {raw} END)"
        )

    b13 = brg(40.7128, -74.0060, "lat", "lng")
    b12 = brg(40.7128, -74.0060, "51.5074", "-0.1278")
    return f"""
        WITH pts AS ({_CUST_LATLNG_SQL}),
        s AS (
          SELECT key, {d13} AS d13, {b13} AS b13, {b12} AS b12
          FROM pts
        ),
        x AS (
          SELECT key, d13,
                 asin(least(1.0, greatest(-1.0,
                      sin(d13) * sin(b13 - b12)))) AS xt
          FROM s
        )
        SELECT key, round(xt, 9) AS xt_rad,
               round(acos(least(1.0, greatest(-1.0,
                     cos(d13) / cos(xt)))), 9) AS at_rad
        FROM x ORDER BY key
    """


def _q_closest_pair_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closest pair per level-4 cell over customer points: group the
    leaf-encoded points by Parent(4) (pure bitwise SQL), enumerate pairs
    inside each cell, keep the MIN-struct pair — the per-tile "minimum
    separation" screen (dedup radius calibration, sensor-collision
    detection). Integer tie-break keys make the arg-min deterministic;
    the level bounds the group so the quadratic term is per-cell (pick
    the level by density — adaptive_density_tiles is the calibration
    op)."""
    from gos2_spark.spark.functions import s2_token
    from gos2_spark.spark.pages import s2_parent_sql

    pts = _cust_points(spark, sf_dir).select(
        "key", "lat", "lng", s2_parent_sql(F.col("cell_id"), 4).alias("cell4")
    )
    v = pts.select(
        "key",
        "cell4",
        (F.cos(F.radians("lng")) * F.cos(F.radians("lat"))).alias("_x"),
        (F.sin(F.radians("lng")) * F.cos(F.radians("lat"))).alias("_y"),
        F.sin(F.radians("lat")).alias("_z"),
    )
    a = v.select(
        "cell4", F.col("key").alias("_ia"), F.col("_x").alias("_ax"),
        F.col("_y").alias("_ay"), F.col("_z").alias("_az"),
    )
    b = v.select(
        "cell4", F.col("key").alias("_ib"), F.col("_x").alias("_bx"),
        F.col("_y").alias("_by"), F.col("_z").alias("_bz"),
    )
    cx = F.col("_ay") * F.col("_bz") - F.col("_az") * F.col("_by")
    cy = F.col("_az") * F.col("_bx") - F.col("_ax") * F.col("_bz")
    cz = F.col("_ax") * F.col("_by") - F.col("_ay") * F.col("_bx")
    dot = (
        F.col("_ax") * F.col("_bx")
        + F.col("_ay") * F.col("_by")
        + F.col("_az") * F.col("_bz")
    )
    d = F.atan2(F.sqrt(cx * cx + cy * cy + cz * cz), dot)
    pairs = a.join(b, "cell4").where(F.col("_ia") < F.col("_ib"))
    best = pairs.groupBy("cell4").agg(
        F.min(
            F.struct(
                d.alias("_d"), F.col("_ia").alias("_a"), F.col("_ib").alias("_b")
            )
        ).alias("_m"),
        F.count("*").alias("n_pairs"),
    )
    counts = v.groupBy("cell4").agg(F.count("*").alias("n_points"))
    return (
        counts.join(best, "cell4")
        .select(
            s2_token(F.col("cell4")).alias("cell_token"),
            "n_points",
            "n_pairs",
            F.col("_m._a").alias("key_a"),
            F.col("_m._b").alias("key_b"),
            F.round(F.col("_m._d"), 9).alias("min_dist_rad"),
        )
        .orderBy("cell_token")
    )


def _closest_pair_oracle_sql(level: int = 4) -> str:
    from gos2_spark.pipeline import duckdb_oracles as _DO

    lsb = 1 << (2 * (30 - level))
    tok = _DO._token(f"((c.cell_id & -{lsb}) | {lsb})")
    return f"""
        WITH {_cellid_cte_duckdb(_CUST_LATLNG_SQL)},
        g AS (
          SELECT c.key, c.lat, c.lng, {tok} AS cell_token
          FROM cells c
        ),
        v AS (
          SELECT key, cell_token,
                 cos(radians(lng)) * cos(radians(lat)) AS x,
                 sin(radians(lng)) * cos(radians(lat)) AS y,
                 sin(radians(lat)) AS z
          FROM g
        ),
        pairs AS (
          SELECT a.cell_token, a.key AS ia, b.key AS ib,
                 atan2(sqrt(
                     (a.y * b.z - a.z * b.y) * (a.y * b.z - a.z * b.y)
                   + (a.z * b.x - a.x * b.z) * (a.z * b.x - a.x * b.z)
                   + (a.x * b.y - a.y * b.x) * (a.x * b.y - a.y * b.x)),
                   a.x * b.x + a.y * b.y + a.z * b.z) AS d
          FROM v a JOIN v b
            ON a.cell_token = b.cell_token AND a.key < b.key
        ),
        best AS (
          SELECT cell_token, ia, ib, d,
                 count(*) OVER (PARTITION BY cell_token) AS n_pairs
          FROM pairs
          QUALIFY row_number() OVER (
              PARTITION BY cell_token ORDER BY d ASC, ia ASC, ib ASC) = 1
        ),
        counts AS (
          SELECT cell_token, count(*) AS n_points FROM v GROUP BY 1
        )
        SELECT b.cell_token, CAST(c.n_points AS BIGINT) AS n_points,
               CAST(b.n_pairs AS BIGINT) AS n_pairs,
               b.ia AS key_a, b.ib AS key_b, round(b.d, 9) AS min_dist_rad
        FROM best b JOIN counts c USING (cell_token)
        ORDER BY cell_token
    """


# ---------------------------------------------------------------------------
# round-4 continuation batch o: classical series statistics over daily counts
# ---------------------------------------------------------------------------

_R4O_DAILY_SQL = """
          SELECT event_type,
                 CAST(floor(CAST(date_diff('microsecond',
                      TIMESTAMP '1970-01-01 00:00:00', ts) AS DOUBLE)
                      / 86400000000) AS BIGINT) AS day,
                 count(*) AS n
          FROM events GROUP BY 1, 2
"""


def _r4o_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    return (
        ev.select(
            "event_type",
            F.floor(us / 86_400_000_000).cast("long").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("n"))
    )


def _q_spearman_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between every pair of event types' daily
    count series, paired on shared days (spark/temporal.py
    rank_correlation): Pearson over tie-averaged ranks. Ranks are
    half-integers, so the sufficient statistics are EXACT in both
    engines; the plan is two rank windows + one map-side-combined
    groupBy — no self-joins beyond the tiny day pairing."""
    from gos2_spark.spark.temporal import rank_correlation

    daily = _r4o_daily(spark, sf_dir)
    a = daily.select(
        F.col("event_type").alias("type_a"), "day", F.col("n").alias("x")
    )
    b = daily.select(
        F.col("event_type").alias("type_b"), "day", F.col("n").alias("y")
    )
    paired = (
        a.join(b, "day")
        .where(F.col("type_a") < F.col("type_b"))
        .select(F.concat_ws("|", "type_a", "type_b").alias("pair"), "x", "y")
    )
    return rank_correlation(paired, "pair", "x", "y").orderBy("pair")


_SPEARMAN_ORACLE = f"""
    WITH daily AS ({_R4O_DAILY_SQL}),
    paired AS (
      SELECT a.event_type AS ta, b.event_type AS tb, a.n AS x, b.n AS y
      FROM daily a JOIN daily b USING (day)
      WHERE a.event_type < b.event_type
    ),
    ranked AS (
      SELECT ta, tb,
             rank() OVER (PARTITION BY ta, tb ORDER BY x)
               + (count(*) OVER (PARTITION BY ta, tb, x) - 1) / 2.0 AS ra,
             rank() OVER (PARTITION BY ta, tb ORDER BY y)
               + (count(*) OVER (PARTITION BY ta, tb, y) - 1) / 2.0 AS rb
      FROM paired
    ),
    agg AS (
      SELECT ta, tb, count(*) AS n, sum(ra) AS sa, sum(rb) AS sb,
             sum(ra * ra) AS saa, sum(rb * rb) AS sbb, sum(ra * rb) AS sab
      FROM ranked GROUP BY 1, 2
    )
    SELECT concat(ta, '|', tb) AS pair, CAST(n AS BIGINT) AS n_obs,
           round(CASE WHEN (CAST(n AS DOUBLE) * saa - sa * sa)
                           * (CAST(n AS DOUBLE) * sbb - sb * sb) > 0
                      THEN (CAST(n AS DOUBLE) * sab - sa * sb)
                           / sqrt((CAST(n AS DOUBLE) * saa - sa * sa)
                                  * (CAST(n AS DOUBLE) * sbb - sb * sb))
                 END, 9) AS spearman_rho
    FROM agg ORDER BY pair
"""


def _q_ks_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D between the value distributions of
    every pair of event types (spark/temporal.py ks_two_sample). D is an
    INTEGER max (|cum1*n2 - cum2*n1| over BIGINT cumulative counts
    grouped by value) divided once — bit-identical cross-engine. One
    broadcast type fan-out, one groupBy(pair, value), one cumulative
    window per pair."""
    from gos2_spark.spark.temporal import ks_two_sample

    ev = _load(spark, sf_dir, "events").select("event_type", "value")
    types = ev.select("event_type").distinct().select(
        F.col("event_type").alias("other")
    )
    samples = ev.join(
        F.broadcast(types), F.col("other") != F.col("event_type")
    ).select(
        F.when(
            F.col("event_type") < F.col("other"),
            F.concat_ws("|", "event_type", "other"),
        )
        .otherwise(F.concat_ws("|", "other", "event_type"))
        .alias("pair"),
        F.when(F.col("event_type") < F.col("other"), F.lit(0))
        .otherwise(F.lit(1))
        .alias("side"),
        "value",
    )
    return ks_two_sample(samples, "pair", "side", "value").orderBy("pair")


_KS_ORACLE = """
    WITH types AS (SELECT DISTINCT event_type FROM events),
    samples AS (
      SELECT CASE WHEN e.event_type < t.event_type
                  THEN concat(e.event_type, '|', t.event_type)
                  ELSE concat(t.event_type, '|', e.event_type) END AS pair,
             CASE WHEN e.event_type < t.event_type THEN 0 ELSE 1 END AS side,
             e.value AS v
      FROM events e JOIN types t ON t.event_type <> e.event_type
    ),
    byval AS (
      SELECT pair, v,
             sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS c0,
             sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS c1
      FROM samples GROUP BY 1, 2
    ),
    cum AS (
      SELECT pair, sum(c0) OVER w AS f0, sum(c1) OVER w AS f1
      FROM byval
      WINDOW w AS (PARTITION BY pair ORDER BY v ROWS UNBOUNDED PRECEDING)
    ),
    cum2 AS (
      SELECT pair, f0, f1,
             max(f0) OVER (PARTITION BY pair) AS n0,
             max(f1) OVER (PARTITION BY pair) AS n1
      FROM cum
    ),
    agg AS (
      SELECT pair, max(n0) AS n0, max(n1) AS n1,
             max(abs(f0 * n1 - f1 * n0)) AS dnum
      FROM cum2 GROUP BY 1
    )
    SELECT pair, CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
           round(CAST(dnum AS DOUBLE)
                 / (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)), 9) AS ks_d
    FROM agg ORDER BY pair
"""


def _q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical 7-day moving-average seasonal decomposition of each event
    type's daily count series (spark/temporal.py ma_decompose): trend =
    centered MA, seasonal = per-phase mean of detrended, remainder
    variance as the noise summary. Detrended values carry EXACT BIGINT
    numerators (period*x - S), so phase means are exact; remainder
    mean-square is a cancellation-free sum of squares."""
    from gos2_spark.spark.temporal import ma_decompose

    daily = _r4o_daily(spark, sf_dir)
    return ma_decompose(daily, "event_type", "day", "n", period=7).orderBy(
        "event_type", "phase"
    )


_SEASONAL_ORACLE = f"""
    WITH daily AS ({_R4O_DAILY_SQL}),
    t AS (
      SELECT event_type, day, n, sum(n) OVER w AS S, count(*) OVER w AS wn
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    t2 AS (
      SELECT event_type, n * 7 - S AS dnum, day % 7 AS phase
      FROM t WHERE wn = 7
    ),
    seas AS (
      SELECT event_type, phase, count(*) AS pn,
             CAST(sum(dnum) AS BIGINT) AS psum
      FROM t2 GROUP BY 1, 2
    ),
    j AS (
      SELECT t2.event_type,
             CAST(dnum AS DOUBLE) / 7.0
             - CAST(psum AS DOUBLE) / (7.0 * CAST(pn AS DOUBLE)) AS rem
      FROM t2 JOIN seas USING (event_type, phase)
    ),
    rv AS (
      SELECT event_type, count(*) AS rn, sum(rem * rem) AS rss
      FROM j GROUP BY 1
    )
    SELECT s.event_type, s.phase, CAST(s.pn AS BIGINT) AS n_phase,
           round(CAST(s.psum AS DOUBLE) / (7.0 * CAST(s.pn AS DOUBLE)), 9)
               AS seasonal,
           round(rv.rss / CAST(rv.rn AS DOUBLE), 9) AS remainder_msq
    FROM seas s JOIN rv USING (event_type)
    ORDER BY event_type, phase
"""


def _q_grubbs_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' single-outlier statistic per event type over quantized
    values (spark/temporal.py grubbs_stat): G = max|x - mean|/sd with the
    arg-max row identified by an INTEGER deviation comparison (n*x - S
    over cent-quantized BIGINTs), so the flagged id is deterministic
    cross-engine. Two map-side-combined scans, zero windows."""
    from gos2_spark.spark.temporal import grubbs_stat

    ev = _load(spark, sf_dir, "events")
    return grubbs_stat(ev, "event_type", "event_id", "value", scale=100).orderBy(
        "event_type"
    )


_GRUBBS_ORACLE = """
    WITH v AS (
      SELECT event_type AS k, event_id AS id,
             CAST(round(value * 100) AS BIGINT) AS x
      FROM events
    ),
    stats AS (
      SELECT k, count(*) AS n, sum(x) AS s, sum(x * x) AS sxx
      FROM v GROUP BY 1
    ),
    dev AS (
      SELECT v.k, v.id, abs(stats.n * v.x - stats.s) AS d
      FROM v JOIN stats USING (k)
    ),
    top AS (
      SELECT k, id, d FROM dev
      QUALIFY row_number() OVER (PARTITION BY k ORDER BY d DESC, id DESC) = 1
    )
    SELECT s.k AS event_type, CAST(s.n AS BIGINT) AS n_obs,
           t.id AS flagged_id,
           round((CAST(t.d AS DOUBLE) / CAST(s.n AS DOUBLE))
                 / sqrt((CAST(s.n AS DOUBLE) * CAST(s.sxx AS DOUBLE)
                         - CAST(s.s AS DOUBLE) * CAST(s.s AS DOUBLE))
                        / (CAST(s.n AS DOUBLE)
                           * (CAST(s.n AS DOUBLE) - 1.0))), 9) AS grubbs_g
    FROM stats s JOIN top t USING (k) ORDER BY event_type
"""


def _q_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley mean-drift detector over each event type's daily
    counts (spark/temporal.py page_hinkley): PH_t accumulates
    (x - running-mean - delta) with 9-digit-quantized terms so both
    engines sum identical doubles in identical (running-frame) order;
    alarm day = first crossing of PH - min(PH) > lambda. Three stacked
    running windows on ONE (type, day) sort."""
    from gos2_spark.spark.temporal import page_hinkley

    daily = _r4o_daily(spark, sf_dir)
    out = page_hinkley(daily, "event_type", "day", "n", delta=0.0, lam=30.0)
    return out.select(
        "event_type",
        "n_obs",
        "max_ph_rise",
        F.coalesce(F.col("alarm_at"), F.lit(-1)).cast("long").alias("alarm_at"),
    ).orderBy("event_type")


_PAGE_HINKLEY_ORACLE = f"""
    WITH daily AS ({_R4O_DAILY_SQL}),
    seq AS (
      SELECT event_type AS k, day, n,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
             sum(n) OVER (PARTITION BY event_type ORDER BY day
                          ROWS UNBOUNDED PRECEDING) AS s
      FROM daily
    ),
    terms AS (
      SELECT k, day,
             round(CAST(i * n - s AS DOUBLE) / CAST(i AS DOUBLE) - 0.0, 9)
                 AS term
      FROM seq
    ),
    ph AS (
      SELECT k, day, sum(term) OVER w AS ph
      FROM terms
      WINDOW w AS (PARTITION BY k ORDER BY day ROWS UNBOUNDED PRECEDING)
    ),
    phm AS (
      SELECT k, day, ph, min(ph) OVER w AS phmin
      FROM ph
      WINDOW w AS (PARTITION BY k ORDER BY day ROWS UNBOUNDED PRECEDING)
    ),
    alarm AS (
      SELECT k, min(day) AS alarm_at FROM phm
      WHERE ph - phmin > 30.0 GROUP BY 1
    ),
    summ AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n_obs,
             round(max(ph - phmin), 6) AS max_ph_rise
      FROM phm GROUP BY 1
    )
    SELECT s.k AS event_type, s.n_obs, s.max_ph_rise,
           CAST(coalesce(a.alarm_at, -1) AS BIGINT) AS alarm_at
    FROM summ s LEFT JOIN alarm a USING (k) ORDER BY event_type
"""


def _q_gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-series regularization per sampled user (spark/temporal.py
    gap_fill_linear): materialize the full first..last day range and
    linearly interpolate missing days from nearest present neighbors via
    the count-of-non-null carry trick (no IGNORE NULLS dependence).
    Interpolation is integer day/count arithmetic with ONE division —
    exact cross-engine; the rollup sums 9-digit-quantized fills."""
    from gos2_spark.spark.temporal import gap_fill_linear

    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    daily = (
        ev.where(F.col("user_id") % 7 == 0)
        .select(
            "user_id", F.floor(us / 86_400_000_000).cast("long").alias("day")
        )
        .groupBy("user_id", "day")
        .agg(F.count("*").alias("n"))
    )
    filled = gap_fill_linear(daily, "user_id", "day", "n")
    return (
        filled.groupBy("user_id")
        .agg(
            F.count("*").alias("n_days"),
            F.sum(F.col("was_missing").cast("long")).alias("n_missing"),
            F.round(F.sum("filled_value"), 6).alias("filled_sum"),
        )
        .orderBy("user_id")
    )


_GAP_FILL_ORACLE = """
    WITH daily AS (
      SELECT user_id,
             CAST(floor(CAST(date_diff('microsecond',
                  TIMESTAMP '1970-01-01 00:00:00', ts) AS DOUBLE)
                  / 86400000000) AS BIGINT) AS day,
             count(*) AS n
      FROM events WHERE user_id % 7 = 0 GROUP BY 1, 2
    ),
    span AS (
      SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
    ),
    days AS (
      SELECT user_id, unnest(generate_series(d0, d1)) AS day FROM span
    ),
    g AS (
      SELECT days.user_id, days.day, daily.n AS v
      FROM days LEFT JOIN daily USING (user_id, day)
    ),
    g2 AS (
      SELECT user_id, day, v,
             max(CASE WHEN v IS NOT NULL THEN day END)
                 OVER (PARTITION BY user_id ORDER BY day
                       ROWS UNBOUNDED PRECEDING) AS pd,
             min(CASE WHEN v IS NOT NULL THEN day END)
                 OVER (PARTITION BY user_id ORDER BY day DESC
                       ROWS UNBOUNDED PRECEDING) AS nd
      FROM g
    ),
    g3 AS (
      SELECT g2.*, p.n AS pv, q.n AS nv
      FROM g2
      LEFT JOIN daily p ON p.user_id = g2.user_id AND p.day = g2.pd
      LEFT JOIN daily q ON q.user_id = g2.user_id AND q.day = g2.nd
    ),
    f AS (
      SELECT user_id, v IS NULL AS was_missing,
             round(CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
                        WHEN pd IS NULL THEN CAST(nv AS DOUBLE)
                        WHEN nd IS NULL THEN CAST(pv AS DOUBLE)
                        ELSE CAST(pv AS DOUBLE)
                             + CAST(nv - pv AS DOUBLE)
                               * CAST(day - pd AS DOUBLE)
                               / CAST(nd - pd AS DOUBLE)
                   END, 9) AS fv
      FROM g3
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(CASE WHEN was_missing THEN 1 ELSE 0 END) AS BIGINT)
               AS n_missing,
           round(sum(fv), 6) AS filled_sum
    FROM f GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# round-4 continuation batch q: geostatistics (spark/geostat.py) — EB rate
# smoothing, closed-form 3-NN simple kriging, spatial-lag OLS.  All three
# reduce to fixed-order native column expressions (Cramer's-rule 3x3 solve),
# so the oracles replay every float term for term.
# ---------------------------------------------------------------------------


def _solve3_sql(a, b):
    """Textual twin of gos2_spark.spark.geostat.solve3: the SAME fixed
    first-row-cofactor determinant expansion, emitted as SQL strings, so
    DuckDB reproduces the engine's float sequence bit-for-bit."""
    (a11, a12, a13), (a21, a22, a23), (a31, a32, a33) = a
    b1, b2, b3 = b

    def det(m11, m12, m13, m21, m22, m23, m31, m32, m33):
        return (
            f"({m11} * ({m22} * {m33} - {m23} * {m32})"
            f" - {m12} * ({m21} * {m33} - {m23} * {m31})"
            f" + {m13} * ({m21} * {m32} - {m22} * {m31}))"
        )

    d0 = det(a11, a12, a13, a21, a22, a23, a31, a32, a33)
    d1 = det(b1, a12, a13, b2, a22, a23, b3, a32, a33)
    d2 = det(a11, b1, a13, a21, b2, a23, a31, b3, a33)
    d3 = det(a11, a12, b1, a21, a22, b2, a31, a32, b3)
    return f"({d1} / {d0})", f"({d2} / {d0})", f"({d3} / {d0})"


def _angle_sql(lat_a: str, lng_a: str, lat_b: str, lng_b: str) -> str:
    """SQL twin of gos2_spark.spark.geostat._angle_rad — great-circle
    angle via atan2(|a x b|, a . b), identical op order."""
    ax = f"(cos(radians({lng_a})) * cos(radians({lat_a})))"
    ay = f"(sin(radians({lng_a})) * cos(radians({lat_a})))"
    az = f"(sin(radians({lat_a})))"
    bx = f"(cos(radians({lng_b})) * cos(radians({lat_b})))"
    by = f"(sin(radians({lng_b})) * cos(radians({lat_b})))"
    bz = f"(sin(radians({lat_b})))"
    cx = f"({ay} * {bz} - {az} * {by})"
    cy = f"({az} * {bx} - {ax} * {bz})"
    cz = f"({ax} * {by} - {ay} * {bx})"
    dot = f"({ax} * {bx} + {ay} * {by} + {az} * {bz})"
    return f"atan2(sqrt({cx} * {cx} + {cy} * {cy} + {cz} * {cz}), {dot})"


def _q_eb_rate_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marshall empirical-Bayes rate smoothing per level-5 cell: cases =
    customers with key % 5 == 0, population = all customers in the cell.
    Low-population cells shrink hard toward the global rate; dense cells
    keep their raw rate.  All sufficient statistics except one DOUBLE sum
    (sum c^2/p) are exact BIGINTs; two jobs, no shuffle beyond the cell
    agg (geostat.py::eb_rate_smoothing)."""
    from gos2_spark.spark.functions import s2_token
    from gos2_spark.spark.geostat import eb_rate_smoothing
    from gos2_spark.spark.pages import s2_parent_sql

    pts = _cust_points(spark, sf_dir)
    counts = (
        pts.groupBy(s2_parent_sql(F.col("cell_id"), 5).alias("cell"))
        .agg(
            F.sum(F.when(F.col("key") % 5 == 0, 1).otherwise(0)).alias("cases"),
            F.count("*").alias("pop"),
        )
        .select(s2_token(F.col("cell")).alias("cell_token"), "cases", "pop")
    )
    return (
        eb_rate_smoothing(counts, area_col="cell_token")
        .withColumnRenamed("area", "cell_token")
        .orderBy("cell_token")
    )


def _eb_rate_oracle_sql() -> str:
    from gos2_spark.pipeline import duckdb_oracles as _DO

    lsb = 1 << 50  # level 5
    tok = _DO._token(f"((cell_id & -{lsb}) | {lsb})")
    return f"""
        WITH {_cellid_cte_duckdb(_CUST_LATLNG_SQL)},
        cnt AS (
          SELECT {tok} AS cell_token,
                 CAST(sum(CASE WHEN key % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                     AS c,
                 count(*) AS p
          FROM cells GROUP BY 1
        ),
        g AS (
          SELECT count(*) AS n_areas,
                 CAST(sum(c) AS BIGINT) AS sc,
                 CAST(sum(p) AS BIGINT) AS sp,
                 sum(CAST(c AS DOUBLE) * CAST(c AS DOUBLE)
                     / CAST(p AS DOUBLE)) AS scc
          FROM cnt
        ),
        x AS (
          SELECT cnt.cell_token, cnt.c, cnt.p,
                 CAST(g.sc AS DOUBLE) / CAST(g.sp AS DOUBLE) AS m,
                 greatest(
                   (g.scc - (CAST(g.sc AS DOUBLE) / CAST(g.sp AS DOUBLE))
                          * (CAST(g.sc AS DOUBLE) / CAST(g.sp AS DOUBLE))
                          * CAST(g.sp AS DOUBLE)) / CAST(g.sp AS DOUBLE)
                   - (CAST(g.sc AS DOUBLE) / CAST(g.sp AS DOUBLE))
                     / (CAST(g.sp AS DOUBLE) / CAST(g.n_areas AS DOUBLE)),
                   0.0) AS big_a
          FROM cnt, g
        ),
        w AS (
          SELECT cell_token, c, p, m,
                 big_a / (big_a + m / CAST(p AS DOUBLE)) AS wgt,
                 CAST(c AS DOUBLE) / CAST(p AS DOUBLE) AS r
          FROM x
        )
        SELECT cell_token, c AS cases, p AS pop,
               round(r, 9) AS raw_rate,
               round(wgt, 9) AS shrink_weight,
               round(wgt * r + (1.0 - wgt) * m, 9) AS eb_rate
        FROM w ORDER BY cell_token
    """


def _q_kriging_targets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple kriging at 24 deterministic targets from the customer
    point cloud (z = key % 100), exponential covariance, 3 nearest
    neighbors, Cramer's-rule closed-form solve — the whole predictor is
    one native column expression (geostat.py::simple_kriging_3nn)."""
    from gos2_spark.spark.geostat import simple_kriging_3nn

    pts = _cust_points(spark, sf_dir).withColumn(
        "value", (F.col("key") % 100).cast("double")
    )
    t = spark.range(24).select(
        F.col("id").alias("target_key"),
        (F.lit(-55.0) + F.col("id").cast("double") * 110.0 / 24.0
         + F.lit(0.3)).alias("lat"),
        (F.lit(-170.0) + (F.col("id") * 47 % 340).cast("double")
         + F.lit(0.7)).alias("lng"),
    )
    return simple_kriging_3nn(pts, t).orderBy("target_key")


def _kriging_oracle_sql() -> str:
    rng = "0.2"
    one = "1.05"  # 1.0 + nugget, same double as F.lit(1.0 + 0.05)
    c12, c13, c23 = "c12", "c13", "c23"
    k1, k2, k3 = "k1", "k2", "k3"
    w1, w2, w3 = _solve3_sql(
        ((one, c12, c13), (c12, one, c23), (c13, c23, one)), (k1, k2, k3)
    )
    zhat = (
        f"gmean + ({w1} * (z1 - gmean) + {w2} * (z2 - gmean)"
        f" + {w3} * (z3 - gmean))"
    )
    kvar = f"{one} - ({w1} * {k1} + {w2} * {k2} + {w3} * {k3})"
    return f"""
        WITH pts AS (
          SELECT key AS pk, lat AS plat, lng AS plng,
                 CAST(key % 100 AS DOUBLE) AS z
          FROM ({_CUST_LATLNG_SQL})
        ),
        tgt AS (
          SELECT CAST(id AS BIGINT) AS tk,
                 (-55.0 + (CAST(id AS DOUBLE) * 110.0) / 24.0) + 0.3 AS tlat,
                 (-170.0 + CAST(id * 47 % 340 AS DOUBLE)) + 0.7 AS tlng
          FROM range(24) AS r(id)
        ),
        gm AS (
          SELECT sum(z) / CAST(count(*) AS DOUBLE) AS gmean FROM pts
        ),
        cand AS (
          SELECT t.tk, p.pk, p.plat, p.plng, p.z,
                 {_angle_sql('t.tlat', 't.tlng', 'p.plat', 'p.plng')} AS d
          FROM pts p CROSS JOIN tgt t
        ),
        top AS (
          SELECT *, row_number() OVER (
              PARTITION BY tk ORDER BY d ASC, pk ASC) AS rn
          FROM cand QUALIFY rn <= 3
        ),
        piv AS (
          SELECT tk,
                 max(CASE WHEN rn = 1 THEN pk END) AS pk1,
                 max(CASE WHEN rn = 2 THEN pk END) AS pk2,
                 max(CASE WHEN rn = 3 THEN pk END) AS pk3,
                 max(CASE WHEN rn = 1 THEN plat END) AS plat1,
                 max(CASE WHEN rn = 2 THEN plat END) AS plat2,
                 max(CASE WHEN rn = 3 THEN plat END) AS plat3,
                 max(CASE WHEN rn = 1 THEN plng END) AS plng1,
                 max(CASE WHEN rn = 2 THEN plng END) AS plng2,
                 max(CASE WHEN rn = 3 THEN plng END) AS plng3,
                 max(CASE WHEN rn = 1 THEN z END) AS z1,
                 max(CASE WHEN rn = 2 THEN z END) AS z2,
                 max(CASE WHEN rn = 3 THEN z END) AS z3,
                 max(CASE WHEN rn = 1 THEN d END) AS d1,
                 max(CASE WHEN rn = 2 THEN d END) AS d2,
                 max(CASE WHEN rn = 3 THEN d END) AS d3
          FROM top GROUP BY tk
        ),
        cov AS (
          SELECT piv.*, gm.gmean,
                 exp(-{_angle_sql('plat1', 'plng1', 'plat2', 'plng2')}
                     / {rng}) AS c12,
                 exp(-{_angle_sql('plat1', 'plng1', 'plat3', 'plng3')}
                     / {rng}) AS c13,
                 exp(-{_angle_sql('plat2', 'plng2', 'plat3', 'plng3')}
                     / {rng}) AS c23,
                 exp(-d1 / {rng}) AS k1,
                 exp(-d2 / {rng}) AS k2,
                 exp(-d3 / {rng}) AS k3
          FROM piv, gm
        )
        SELECT tk AS target_key,
               pk1 AS nn1, pk2 AS nn2, pk3 AS nn3,
               round({w1}, 9) AS w1,
               round({w2}, 9) AS w2,
               round({w3}, 9) AS w3,
               round({zhat}, 9) AS zhat,
               round({kvar}, 9) AS kriging_var
        FROM cov ORDER BY target_key
    """


def _q_lag_ols_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial-lag OLS over level-5 cells: y = customer count, x = count
    of even keys, lag = SUM of the 4 edge-neighbors' y (binary spatial
    weights, wrap-aware neighbor arithmetic).  Every normal-equation sum
    is an exact integer-valued double, so the Cramer's-rule betas are
    bit-identical cross-engine (geostat.py::lag_ols)."""
    from gos2_spark.pipeline.graph import _default_materialize
    from gos2_spark.spark.functions import s2_edge_neighbors
    from gos2_spark.spark.pages import s2_parent_sql

    from gos2_spark.spark.geostat import lag_ols

    pts = _cust_points(spark, sf_dir)
    counts = _default_materialize(spark)(
        pts.groupBy(s2_parent_sql(F.col("cell_id"), 5).alias("cell")).agg(
            F.count("*").alias("y"),
            F.sum(F.when(F.col("key") % 2 == 0, 1).otherwise(0)).alias("x"),
        )
    )
    nb = counts.select(
        F.col("cell"), F.explode(s2_edge_neighbors(F.col("cell"))).alias("cj")
    )
    lag = (
        nb.join(counts.select(F.col("cell").alias("cj"),
                              F.col("y").alias("yj")), "cj")
        .groupBy("cell")
        .agg(F.sum("yj").alias("lag"))
    )
    obs = counts.join(lag, "cell", "left").withColumn(
        "lag", F.coalesce(F.col("lag"), F.lit(0))
    )
    return lag_ols(obs, "y", "x", "lag")


def _lag_ols_oracle_sql() -> str:
    from gos2_spark.pipeline import duckdb_oracles as _DO

    pairs = _DO.edge_neighbors_l8_oracle_sql(
        _cellid_cte_duckdb(_CUST_LATLNG_SQL), level=5
    )
    lsb = 1 << 50  # level 5
    tok = _DO._token(f"((cell_id & -{lsb}) | {lsb})")
    n = "CAST(n_obs AS DOUBLE)"
    sx, sl = "CAST(sx AS DOUBLE)", "CAST(sl AS DOUBLE)"
    sxx, sxl, sll = ("CAST(sxx AS DOUBLE)", "CAST(sxl AS DOUBLE)",
                     "CAST(sll AS DOUBLE)")
    sy, sxy, sly, syy = ("CAST(sy AS DOUBLE)", "CAST(sxy AS DOUBLE)",
                         "CAST(sly AS DOUBLE)", "CAST(syy AS DOUBLE)")
    b0, b1, b2 = _solve3_sql(
        ((n, sx, sl), (sx, sxx, sxl), (sl, sxl, sll)), (sy, sxy, sly)
    )
    sse = f"({syy} - ({b0} * {sy} + {b1} * {sxy} + {b2} * {sly}))"
    sst = f"({syy} - {sy} * {sy} / {n})"
    return f"""
        WITH pairs AS ({pairs}),
        {_cellid_cte_duckdb(_CUST_LATLNG_SQL)},
        cnt AS (
          SELECT {tok} AS token,
                 count(*) AS y,
                 CAST(sum(CASE WHEN key % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                     AS x
          FROM cells GROUP BY 1
        ),
        lg AS (
          SELECT p.token, CAST(sum(c2.y) AS BIGINT) AS lag
          FROM pairs p JOIN cnt c2 ON c2.token = p.nbr_token
          GROUP BY 1
        ),
        obs AS (
          SELECT c.y, c.x, coalesce(lg.lag, 0) AS l
          FROM cnt c LEFT JOIN lg ON lg.token = c.token
        ),
        s AS (
          SELECT count(*) AS n_obs,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(l) AS BIGINT) AS sl,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(x * l) AS BIGINT) AS sxl,
                 CAST(sum(l * l) AS BIGINT) AS sll,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(l * y) AS BIGINT) AS sly,
                 CAST(sum(y * y) AS BIGINT) AS syy
          FROM obs
        )
        SELECT n_obs,
               round({b0}, 9) AS beta0,
               round({b1}, 9) AS beta_x,
               round({b2}, 9) AS beta_lag,
               round(1.0 - {sse} / {sst}, 9) AS r2
        FROM s
    """


# ---------------------------------------------------------------------------
# round-4 continuation batch r: rank-based nonparametric tests
# (spark/nonparam.py) — Mann-Whitney U, Kruskal-Wallis H, Cramér-von Mises.
# All sufficient statistics are BIGINT (doubled tie-averaged ranks / expanded
# CvM integrand); the one unavoidable float sum (KW's per-group terms) is a
# fixed-order fold both engines replay sequentially.
# ---------------------------------------------------------------------------


def _q_mw_value_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U per event type between a deterministic hash-split of
    users (arm = xxhash64(user_id || '#mw') parity — the ab_conversion_ztest
    assignment model): does arm 1 see shifted values?  Doubled tie-averaged
    ranks keep the rank sum BIGINT; z is tie-corrected
    (spark/nonparam.py::mann_whitney_u)."""
    from gos2_spark.spark.nonparam import mann_whitney_u

    ev = _load(spark, sf_dir, "events")
    samples = ev.select(
        "event_type",
        F.pmod(
            F.xxhash64(F.concat(F.col("user_id").cast("string"), F.lit("#mw"))),
            F.lit(2),
        ).alias("side"),
        "value",
    )
    return mann_whitney_u(samples, "event_type", "side", "value").orderBy(
        "event_type"
    )


def _mw_oracle_sql() -> str:
    from gos2_spark.pipeline.duckdb_oracles import xxh64_list_sql

    salted = "[CAST(user_id AS VARCHAR) || '#mw']"
    h = f"({xxh64_list_sql(salted)})[1]"
    return f"""
        WITH samples AS (
          SELECT event_type,
                 CAST((({h}) % 2 + 2) % 2 AS INT) AS side,
                 value AS v
          FROM events
        ),
        byval AS (
          SELECT event_type, v,
                 sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS c0,
                 sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS c1
          FROM samples GROUP BY 1, 2
        ),
        cum AS (
          SELECT event_type, c0, c1,
                 sum(c0) OVER w AS f0, sum(c1) OVER w AS f1
          FROM byval
          WINDOW w AS (PARTITION BY event_type ORDER BY v
                       ROWS UNBOUNDED PRECEDING)
        ),
        cum2 AS (
          SELECT *, max(f0) OVER (PARTITION BY event_type) AS n0,
                    max(f1) OVER (PARTITION BY event_type) AS n1
          FROM cum
        ),
        agg AS (
          SELECT event_type,
                 CAST(max(n0) AS BIGINT) AS n0,
                 CAST(max(n1) AS BIGINT) AS n1,
                 CAST(sum(c0 * (2 * (f0 + f1 - c0 - c1) + c0 + c1 + 1))
                      AS BIGINT) AS r0_2,
                 CAST(sum((c0 + c1) * (c0 + c1) * (c0 + c1) - (c0 + c1))
                      AS BIGINT) AS tie
          FROM cum2 GROUP BY 1
        )
        SELECT event_type, n0, n1,
               round(CAST(r0_2 - n0 * (n0 + 1) AS DOUBLE) / 2.0, 9) AS u_stat,
               round(CASE WHEN (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) / 12.0)
                               * ((CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE) + 1.0)
                                  - CAST(tie AS DOUBLE)
                                    / ((CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE))
                                       * (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE) - 1.0))) > 0
                     THEN (CAST(r0_2 - n0 * (n0 + 1) AS DOUBLE) / 2.0
                           - CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) / 2.0)
                          / sqrt((CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) / 12.0)
                                 * ((CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE) + 1.0)
                                    - CAST(tie AS DOUBLE)
                                      / ((CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE))
                                         * (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE) - 1.0))))
                     ELSE NULL END, 9) AS mw_z
        FROM agg ORDER BY event_type
    """


def _q_kruskal_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H per epoch-weekday (datediff-from-1970 mod 7 — the
    engine-neutral weekday key): do the five event types' value
    distributions differ within a weekday?  Pooled doubled ranks at the
    distinct-value level, BIGINT rank sums per type, fixed-order fold of
    the five float terms (spark/nonparam.py::kruskal_wallis)."""
    from gos2_spark.spark.nonparam import kruskal_wallis

    ev = _load(spark, sf_dir, "events")
    samples = ev.select(
        (
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")) % 7
        ).alias("weekday"),
        "event_type",
        "value",
    )
    return kruskal_wallis(samples, "weekday", "event_type", "value").orderBy(
        "weekday"
    )


_KRUSKAL_ORACLE = """
    WITH samples AS (
      SELECT (CAST(ts AS DATE) - DATE '1970-01-01') % 7 AS weekday,
             event_type AS g, value AS v
      FROM events
    ),
    bygv AS (
      SELECT weekday, g, v, count(*) AS cg FROM samples GROUP BY 1, 2, 3
    ),
    byval AS (
      SELECT weekday, v, sum(cg) AS c FROM bygv GROUP BY 1, 2
    ),
    ranked AS (
      SELECT weekday, v, c,
             2 * (sum(c) OVER w - c) + c + 1 AS rank2
      FROM byval
      WINDOW w AS (PARTITION BY weekday ORDER BY v ROWS UNBOUNDED PRECEDING)
    ),
    pergroup AS (
      SELECT b.weekday, b.g,
             CAST(sum(b.cg) AS BIGINT) AS ng,
             CAST(sum(b.cg * r.rank2) AS BIGINT) AS rg2
      FROM bygv b JOIN ranked r ON b.weekday = r.weekday AND b.v = r.v
      GROUP BY 1, 2
    ),
    ties AS (
      SELECT weekday, CAST(sum(c * c * c - c) AS BIGINT) AS tie,
             CAST(sum(c) AS BIGINT) AS n
      FROM byval GROUP BY 1
    ),
    folded AS (
      SELECT weekday, count(*) AS k_groups,
             list_reduce(
               list_transform(
                 list_sort(list({'g': g,
                                 't': CAST(rg2 AS DOUBLE) * CAST(rg2 AS DOUBLE)
                                      / (4.0 * CAST(ng AS DOUBLE))})),
                 x -> x.t),
               (a, b) -> a + b) AS sum_terms
      FROM pergroup GROUP BY 1
    )
    SELECT f.weekday, CAST(f.k_groups AS BIGINT) AS k_groups,
           t.n AS n_total,
           round(CASE WHEN 1.0 - CAST(t.tie AS DOUBLE)
                           / (CAST(t.n AS DOUBLE) * CAST(t.n AS DOUBLE)
                              * CAST(t.n AS DOUBLE) - CAST(t.n AS DOUBLE)) > 0
                 THEN (12.0 / (CAST(t.n AS DOUBLE) * (CAST(t.n AS DOUBLE) + 1.0))
                       * (0.0 + f.sum_terms) - 3.0 * (CAST(t.n AS DOUBLE) + 1.0))
                      / (1.0 - CAST(t.tie AS DOUBLE)
                         / (CAST(t.n AS DOUBLE) * CAST(t.n AS DOUBLE)
                            * CAST(t.n AS DOUBLE) - CAST(t.n AS DOUBLE)))
                 ELSE NULL END, 9) AS h_stat
    FROM folded f JOIN ties t ON f.weekday = t.weekday
    ORDER BY f.weekday
"""


def _q_cvm_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér-von Mises criterion between the value distributions of every
    event-type pair (the L2 companion of ks_value_drift's sup-norm — sees
    spread-out drift a single sup point misses).  The integrand is expanded
    into three BIGINT sums so no float is engine-order accumulated
    (spark/nonparam.py::cramer_von_mises)."""
    from gos2_spark.spark.nonparam import cramer_von_mises

    ev = _load(spark, sf_dir, "events").select("event_type", "value")
    types = ev.select("event_type").distinct().select(
        F.col("event_type").alias("other")
    )
    samples = ev.join(
        F.broadcast(types), F.col("other") != F.col("event_type")
    ).select(
        F.when(
            F.col("event_type") < F.col("other"),
            F.concat_ws("|", "event_type", "other"),
        )
        .otherwise(F.concat_ws("|", "other", "event_type"))
        .alias("pair"),
        F.when(F.col("event_type") < F.col("other"), F.lit(0))
        .otherwise(F.lit(1))
        .alias("side"),
        "value",
    )
    return cramer_von_mises(samples, "pair", "side", "value").orderBy("pair")


_CVM_ORACLE = """
    WITH types AS (SELECT DISTINCT event_type FROM events),
    samples AS (
      SELECT CASE WHEN e.event_type < t.event_type
                  THEN concat(e.event_type, '|', t.event_type)
                  ELSE concat(t.event_type, '|', e.event_type) END AS pair,
             CASE WHEN e.event_type < t.event_type THEN 0 ELSE 1 END AS side,
             e.value AS v
      FROM events e JOIN types t ON t.event_type <> e.event_type
    ),
    byval AS (
      SELECT pair, v,
             sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS c0,
             sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS c1
      FROM samples GROUP BY 1, 2
    ),
    cum AS (
      SELECT pair, c0, c1, sum(c0) OVER w AS f0, sum(c1) OVER w AS f1
      FROM byval
      WINDOW w AS (PARTITION BY pair ORDER BY v ROWS UNBOUNDED PRECEDING)
    ),
    cum2 AS (
      SELECT *, max(f0) OVER (PARTITION BY pair) AS n0,
                max(f1) OVER (PARTITION BY pair) AS n1
      FROM cum
    ),
    agg AS (
      SELECT pair,
             CAST(max(n0) AS BIGINT) AS n0,
             CAST(max(n1) AS BIGINT) AS n1,
             CAST(sum((c0 + c1) * f0 * f0) AS BIGINT) AS saa,
             CAST(sum((c0 + c1) * f0 * f1) AS BIGINT) AS sab,
             CAST(sum((c0 + c1) * f1 * f1) AS BIGINT) AS sbb
      FROM cum2 GROUP BY 1
    )
    SELECT pair, n0, n1,
           round((CAST(saa AS DOUBLE) * CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)
                  - 2.0 * CAST(sab AS DOUBLE) * CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)
                  + CAST(sbb AS DOUBLE) * CAST(n0 AS DOUBLE) * CAST(n0 AS DOUBLE))
                 / ((CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE))
                    * (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE))
                    * CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)), 9) AS cvm_t
    FROM agg ORDER BY pair
"""


# ---------------------------------------------------------------------------
# round-4 continuation batch s: survival analysis (spark/survival.py) —
# Kaplan-Meier + Nelson-Aalen over a real right-censoring structure
# (time to a user's SECOND event of a type; single-event users censored
# at the end of the observation window).
# ---------------------------------------------------------------------------


def _q_km_second_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival of time-to-repeat per event type: duration =
    whole days between a user's first and second event of that type
    (+1), observed; single-event users are right-censored at the end of
    the global observation window. Risk sets/death counts BIGINT; the KM
    product and Nelson-Aalen sum ride a prefix fold in t-order both
    engines replay bit-for-bit (spark/survival.py::kaplan_meier)."""
    from pyspark.sql import Window

    from gos2_spark.spark.survival import kaplan_meier

    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    w = Window.partitionBy("event_type", "user_id").orderBy("us", "event_id")
    seq = (
        ev.select("event_type", "user_id", us.alias("us"), "event_id")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
    )
    horizon = ev.select(F.max(us).alias("us_max"))
    per_user = (
        seq.groupBy("event_type", "user_id")
        .agg(
            F.min(F.when(F.col("rn") == 1, F.col("us"))).alias("us1"),
            F.min(F.when(F.col("rn") == 2, F.col("us"))).alias("us2"),
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            "event_type",
            F.when(
                F.col("us2").isNotNull(),
                F.expr("(us2 - us1) div 86400000000") + 1,
            )
            .otherwise(F.expr("(us_max - us1) div 86400000000") + 1)
            .alias("t"),
            F.col("us2").isNotNull().cast("int").alias("observed"),
        )
    )
    return kaplan_meier(per_user, "event_type", "t", "observed").orderBy(
        "event_type", "t"
    )


_KM_ORACLE = """
    WITH ev AS (
      SELECT event_type, user_id, event_id,
             epoch_us(ts - TIMESTAMP '1970-01-01 00:00:00') AS us
      FROM events
    ),
    seq AS (
      SELECT *, row_number() OVER (PARTITION BY event_type, user_id
                                   ORDER BY us, event_id) AS rn
      FROM ev
    ),
    horizon AS (SELECT max(us) AS us_max FROM ev),
    per_user AS (
      SELECT s.event_type,
             CASE WHEN min(CASE WHEN rn = 2 THEN us END) IS NOT NULL
                  THEN (min(CASE WHEN rn = 2 THEN us END)
                        - min(CASE WHEN rn = 1 THEN us END)) // 86400000000 + 1
                  ELSE (max(h.us_max)
                        - min(CASE WHEN rn = 1 THEN us END)) // 86400000000 + 1
             END AS t,
             CASE WHEN min(CASE WHEN rn = 2 THEN us END) IS NOT NULL
                  THEN 1 ELSE 0 END AS observed
      FROM seq s CROSS JOIN horizon h
      WHERE rn <= 2
      GROUP BY s.event_type, s.user_id
    ),
    byt AS (
      SELECT event_type, t, sum(observed) AS d, sum(1 - observed) AS c
      FROM per_user GROUP BY 1, 2
    ),
    risk AS (
      SELECT event_type, t, d, c,
             sum(d + c) OVER (PARTITION BY event_type)
             - sum(d + c) OVER (PARTITION BY event_type ORDER BY t
                                ROWS UNBOUNDED PRECEDING)
             + d + c AS n
      FROM byt
    ),
    curve AS (
      SELECT event_type,
             list_sort(list({'t': t, 'd': d, 'n': n, 'c': c})) AS arr
      FROM risk WHERE d > 0 GROUP BY 1
    ),
    rows_ AS (
      SELECT event_type, arr, unnest(arr) AS r,
             unnest(generate_series(1, len(arr))) AS i
      FROM curve
    )
    SELECT event_type,
           CAST(r.t AS BIGINT) AS t,
           CAST(r.n AS BIGINT) AS n_risk,
           CAST(r.d AS BIGINT) AS n_events,
           CAST(r.c AS BIGINT) AS n_censored,
           round(1.0 * list_reduce(
                   list_transform(arr[1:i],
                     x -> CAST(x.n - x.d AS DOUBLE) / CAST(x.n AS DOUBLE)),
                   (a, b) -> a * b), 9) AS survival,
           round(0.0 + list_reduce(
                   list_transform(arr[1:i],
                     x -> CAST(x.d AS DOUBLE) / CAST(x.n AS DOUBLE)),
                   (a, b) -> a + b), 9) AS cum_hazard
    FROM rows_
    ORDER BY event_type, t
"""


# ---------------------------------------------------------------------------
# round-4 continuation batch t: human-mobility metrics — radius of gyration
# (spark/trajectory.py::radius_of_gyration), Levy-flight jump-length
# histogram, per-user visited-location entropy.
# ---------------------------------------------------------------------------

_EV_POINTS_SQL = """
    SELECT event_id AS key, user_id, ts,
           -60.0 + (event_id * 11 % 120) + (event_id % 83) / 83.0 AS lat,
           -170.0 + (event_id * 17 % 340) + (event_id % 79) / 79.0 AS lng
    FROM events
"""


def _ev_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events -> deterministic per-event lat/lng (the trajectory_profiles
    synthesis), carrying user_id and ts."""
    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    return ev.select(
        F.col("event_id").alias("key"),
        "user_id",
        "ts",
        (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
        (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
    )


def _q_radius_of_gyration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius of gyration per user (Gonzalez et al. 2008) — RMS
    great-circle distance from the spherical centroid; the mobility
    range scale (spark/trajectory.py::radius_of_gyration). One mean-
    vector agg + one co-partitioned join back; the |m|-invariant atan2
    angle avoids a renormalize step."""
    from gos2_spark.spark.trajectory import radius_of_gyration

    pts = _ev_points(spark, sf_dir)
    return radius_of_gyration(pts, key_col="user_id").orderBy("user_id")


_ROG_ORACLE = f"""
    WITH pts AS ({_EV_POINTS_SQL}),
    p AS (
      SELECT user_id,
             cos(radians(lng)) * cos(radians(lat)) AS px,
             sin(radians(lng)) * cos(radians(lat)) AS py,
             sin(radians(lat)) AS pz
      FROM pts
    ),
    m AS (
      SELECT user_id, avg(px) AS mx, avg(py) AS my, avg(pz) AS mz
      FROM p GROUP BY 1
    ),
    j AS (
      SELECT p.user_id,
             atan2(sqrt((my * pz - mz * py) * (my * pz - mz * py)
                      + (mz * px - mx * pz) * (mz * px - mx * pz)
                      + (mx * py - my * px) * (mx * py - my * px)),
                   mx * px + my * py + mz * pz) AS ang
      FROM p JOIN m ON p.user_id = m.user_id
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_pts,
           round(sqrt(avg(ang * ang)), 9) AS rog_rad
    FROM j GROUP BY 1 ORDER BY 1
"""


def _q_jump_length_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levy-flight diagnostic: corpus-wide histogram of consecutive
    per-user displacement lengths in log2 bins (power-law jump-length
    tails show as a linear bin profile). Counts are exact BIGINTs; one
    user window + one tiny groupBy."""
    from pyspark.sql import Window

    from gos2_spark.spark.functions import haversine_rad

    pts = _ev_points(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "key")
    leg = haversine_rad(
        F.lag("lat").over(w), F.lag("lng").over(w), F.col("lat"), F.col("lng")
    )
    return (
        pts.select(leg.alias("leg"))
        .where(F.col("leg").isNotNull() & (F.col("leg") > 0))
        .select(F.floor(F.log2("leg")).alias("bin"), "leg")
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_jumps"),
            F.round(F.sum("leg"), 9).alias("sum_rad"),
        )
        .orderBy("bin")
    )


_JUMP_ORACLE = f"""
    WITH pts AS ({_EV_POINTS_SQL}),
    legs AS (
      SELECT 2 * atan2(
               sqrt(power(sin(0.5 * (radians(lat) - radians(plat))), 2)
                    + power(sin(0.5 * (radians(lng) - radians(plng))), 2)
                      * cos(radians(plat)) * cos(radians(lat))),
               sqrt(greatest(0.0, 1.0 - (
                    power(sin(0.5 * (radians(lat) - radians(plat))), 2)
                    + power(sin(0.5 * (radians(lng) - radians(plng))), 2)
                      * cos(radians(plat)) * cos(radians(lat)))))) AS leg
      FROM (
        SELECT lat, lng,
               lag(lat) OVER w AS plat, lag(lng) OVER w AS plng
        FROM pts
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, key)
      )
      WHERE plat IS NOT NULL
    )
    SELECT CAST(floor(log2(leg)) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_jumps,
           round(sum(leg), 9) AS sum_rad
    FROM legs WHERE leg > 0
    GROUP BY 1 ORDER BY 1
"""


def _q_location_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user visited-location Shannon entropy over level-6 cells —
    the uncorrelated-entropy term of the Song et al. predictability
    bound. entropy = ln(n) - sum(c*ln(c))/n from BIGINT visit counts;
    one cellid projection + two keyed aggs."""
    from gos2_spark.spark.functions import s2_cellid
    from gos2_spark.spark.pages import s2_parent_sql

    pts = _ev_points(spark, sf_dir)
    cells = pts.select(
        "user_id",
        s2_parent_sql(
            s2_cellid(F.col("lat"), F.col("lng")), 6
        ).alias("cell"),
    )
    percell = cells.groupBy("user_id", "cell").agg(F.count("*").alias("c"))
    n = F.col("n_visits").cast("double")
    return (
        percell.groupBy("user_id")
        .agg(
            F.sum("c").alias("n_visits"),
            F.count("*").alias("n_cells"),
            F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double"))).alias("_slc"),
        )
        .select(
            "user_id",
            "n_visits",
            "n_cells",
            F.round(F.log(n) - F.col("_slc") / n, 9).alias("entropy"),
        )
        .orderBy("user_id")
    )


def _location_entropy_oracle_sql() -> str:
    lsb = 1 << 48  # level 6
    return f"""
        WITH {_cellid_cte_duckdb(_EV_POINTS_SQL)},
        percell AS (
          SELECT e.user_id, ((c.cell_id & -{lsb}) | {lsb}) AS cell,
                 count(*) AS c
          FROM cells c JOIN events e ON e.event_id = c.key
          GROUP BY 1, 2
        ),
        agg AS (
          SELECT user_id,
                 CAST(sum(c) AS BIGINT) AS n_visits,
                 CAST(count(*) AS BIGINT) AS n_cells,
                 sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS slc
          FROM percell GROUP BY 1
        )
        SELECT user_id, n_visits, n_cells,
               round(ln(CAST(n_visits AS DOUBLE))
                     - slc / CAST(n_visits AS DOUBLE), 9) AS entropy
        FROM agg ORDER BY user_id
    """


# ---------------------------------------------------------------------------
# round-4 continuation batch u: segment-intersection joins
# (spark/joins.py::segment_crossing_join) — tile-blocked proper-crossing
# pairs between users + per-user self-intersection counts, certified by a
# BRUTE-FORCE all-pairs oracle (zero false negatives from the blocking).
# ---------------------------------------------------------------------------

_WALK_POINTS_SQL = """
    SELECT event_id, user_id, ts,
           -50 + ((user_id % 50) * 7 % 100)
               + ((event_id * 11 % 41) / 10.0 - 2.0) AS lat,
           -160 + ((user_id % 50) * 13 % 320)
               + ((event_id * 17 % 37) / 10.0 - 1.8) AS lng
    FROM events
"""

# bbox bounds are PLAIN COLUMNS in the segs CTE (not inline greatest/least
# join predicates) — DuckDB 1.0's IEJoin hits an internal "flat vector"
# assertion on chained computed range conditions; column-form avoids it.
_WALK_SEGS_SQL = f"""
    pts AS ({_WALK_POINTS_SQL}),
    seq AS (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS rn
      FROM pts
    ),
    segs AS (
      SELECT s.user_id, s.event_id AS seg_id, s.rn,
             s.lng AS sax, s.lat AS say, n.lng AS sbx, n.lat AS sby,
             least(s.lng, n.lng) AS xmin, greatest(s.lng, n.lng) AS xmax,
             least(s.lat, n.lat) AS ymin, greatest(s.lat, n.lat) AS ymax
      FROM seq s JOIN seq n ON n.user_id = s.user_id AND n.rn = s.rn + 1
      WHERE s.rn <= 12
    )
"""

def _walk_segs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events -> local random-walk trajectories (user-centered base +
    per-event jitter, all within a ~4x3.6 degree box) -> consecutive
    segments. The locality makes tile blocking meaningful, unlike the
    globe-spanning trajectory_profiles synthesis."""
    from pyspark.sql import Window

    ev = _load(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    pts = ev.select(
        "user_id",
        "ts",
        "event_id",
        (-50 + ((u % 50) * 7 % 100) + ((e * 11 % 41) / 10.0 - 2.0)).alias("lat"),
        (-160 + ((u % 50) * 13 % 320) + ((e * 17 % 37) / 10.0 - 1.8)).alias("lng"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # rn cap bounds the intrinsically quadratic co-located pair count —
    # a QUERY choice (first ~11 legs per user), the join itself is generic
    seq = pts.withColumn("rn", F.row_number().over(w))
    nxt = seq.select(
        F.col("user_id").alias("_u"),
        (F.col("rn") - 1).alias("_rn"),
        F.col("lng").alias("bx"),
        F.col("lat").alias("by"),
    )
    return (
        seq.join(
            nxt,
            (F.col("user_id") == F.col("_u")) & (F.col("rn") == F.col("_rn")),
        )
        .where(F.col("rn") <= 12)
        .select(
            "user_id",
            F.col("event_id").alias("seg_id"),
            "rn",
            F.col("lng").alias("ax"),
            F.col("lat").alias("ay"),
            "bx",
            "by",
        )
    )


def _q_path_crossings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proper crossings between DIFFERENT users' trajectory segments via
    the tile-blocked segment join; the oracle runs the UNBLOCKED
    all-pairs test, so a green row certifies the blocking loses
    nothing."""
    from gos2_spark.spark.joins import segment_crossing_join

    segs = _walk_segs(spark, sf_dir)
    return segment_crossing_join(
        segs, id_col="seg_id", group_col="user_id", tile_deg=4.0
    ).orderBy("seg_a", "seg_b")


_PATH_CROSS_ORACLE = f"""
    WITH {_WALK_SEGS_SQL}
    SELECT a.user_id AS group_a, a.seg_id AS seg_a,
           c.user_id AS group_b, c.seg_id AS seg_b
    FROM segs a JOIN segs c
      ON a.seg_id < c.seg_id AND a.user_id <> c.user_id
     AND a.xmax >= c.xmin AND a.xmin <= c.xmax
     AND a.ymax >= c.ymin AND a.ymin <= c.ymax
    WHERE ((a.sbx - a.sax) * (c.say - a.say) - (a.sby - a.say) * (c.sax - a.sax))
          * ((a.sbx - a.sax) * (c.sby - a.say) - (a.sby - a.say) * (c.sbx - a.sax)) < 0
      AND ((c.sbx - c.sax) * (a.say - c.say) - (c.sby - c.say) * (a.sax - c.sax))
          * ((c.sbx - c.sax) * (a.sby - c.say) - (c.sby - c.say) * (a.sbx - c.sax)) < 0
    ORDER BY seg_a, seg_b
"""


def _q_self_intersections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user count of proper self-intersections among non-adjacent
    segments of the same trajectory (path tangledness — the IsValid
    screen of polyline_test.go applied statistically). Same blocked
    join, within_group=True; brute all-pairs oracle."""
    from gos2_spark.spark.joins import segment_crossing_join

    segs = _walk_segs(spark, sf_dir)
    x = segment_crossing_join(
        segs,
        id_col="seg_id",
        group_col="user_id",
        seq_col="rn",
        within_group=True,
        tile_deg=4.0,
    )
    return (
        x.groupBy(F.col("group_a").alias("user_id"))
        .agg(F.count("*").alias("n_crossings"))
        .orderBy("user_id")
    )


_SELF_CROSS_ORACLE = f"""
    WITH {_WALK_SEGS_SQL},
    x AS (
      SELECT a.user_id
      FROM segs a JOIN segs c
        ON a.seg_id < c.seg_id AND a.user_id = c.user_id
       AND abs(a.rn - c.rn) >= 2
      WHERE ((a.sbx - a.sax) * (c.say - a.say) - (a.sby - a.say) * (c.sax - a.sax))
            * ((a.sbx - a.sax) * (c.sby - a.say) - (a.sby - a.say) * (c.sbx - a.sax)) < 0
        AND ((c.sbx - c.sax) * (a.say - c.say) - (c.sby - c.say) * (a.sax - c.sax))
            * ((c.sbx - c.sax) * (a.sby - c.say) - (c.sby - c.say) * (a.sbx - c.sax)) < 0
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_crossings
    FROM x GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# round-4 continuation batch v: raster terrain statistics on the S2 grid —
# TRI (Riley ruggedness), TPI (Weiss position index) and roughness over a
# deterministic hash-derived elevation surface, using the wrap-aware
# EdgeNeighbors kernel + its full SQL replay. All sufficient statistics are
# INTEGER (elevation = xxhash64(token) mod 4000), so the result is
# bit-identical cross-engine with no float-order exposure.
# ---------------------------------------------------------------------------


def _q_terrain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terrain statistics per occupied level-8 cell: TRI = mean |elev
    difference| to the 4 edge neighbors, TPI = elev - mean neighbor elev,
    roughness = max-min over the cross neighborhood. Elevation is a
    deterministic integer surface elev(cell) = xxhash64(token) mod 4000 —
    defined for EVERY cell, so border cells need no occupancy fallback.
    One neighbor explode (kernels/projection.py::edge_neighbors, wrap
    cases included) + one keyed agg."""
    from gos2_spark.spark.functions import s2_edge_neighbors, s2_token
    from gos2_spark.spark.pages import s2_parent_sql

    def elev(tok):
        return F.pmod(F.xxhash64(tok), F.lit(4000))

    pts = _cust_points(spark, sf_dir)
    occ = (
        pts.select(s2_parent_sql(F.col("cell_id"), 8).alias("cell"))
        .distinct()
        .select("cell", s2_token(F.col("cell")).alias("token"))
    )
    nb = occ.select(
        "token",
        F.explode(s2_edge_neighbors(F.col("cell"))).alias("nbr"),
    ).select(
        "token",
        elev(s2_token(F.col("nbr"))).alias("ne"),
    )
    agg = nb.groupBy("token").agg(
        F.sum("ne").alias("_sn"),
        F.sum(F.abs(F.col("ne") - elev(F.col("token")))).alias("_sad"),
        F.max("ne").alias("_mx"),
        F.min("ne").alias("_mn"),
    )
    e = elev(F.col("token"))
    return agg.select(
        "token",
        e.alias("elev"),
        F.round(F.col("_sad").cast("double") / 4.0, 9).alias("tri"),
        F.round(e.cast("double") - F.col("_sn").cast("double") / 4.0, 9).alias(
            "tpi"
        ),
        (F.greatest(F.col("_mx"), e) - F.least(F.col("_mn"), e)).alias(
            "roughness"
        ),
    ).orderBy("token")


def _terrain_oracle_sql() -> str:
    from gos2_spark.pipeline import duckdb_oracles as _DO

    pairs = _DO.edge_neighbors_l8_oracle_sql(
        _cellid_cte_duckdb(_CUST_LATLNG_SQL), level=8
    )
    h = lambda col: (  # noqa: E731
        f"((({_DO.xxh64_list_sql(f'[{col}]')})[1] % 4000 + 4000) % 4000)"
    )
    return f"""
        WITH pairs AS ({pairs}),
        nbe AS (
          SELECT token, {h('nbr_token')} AS ne, {h('token')} AS e
          FROM pairs
        ),
        agg AS (
          SELECT token, any_value(e) AS e,
                 CAST(sum(ne) AS BIGINT) AS sn,
                 CAST(sum(abs(ne - e)) AS BIGINT) AS sad,
                 max(ne) AS mx, min(ne) AS mn
          FROM nbe GROUP BY 1
        )
        SELECT token,
               CAST(e AS BIGINT) AS elev,
               round(CAST(sad AS DOUBLE) / 4.0, 9) AS tri,
               round(CAST(e AS DOUBLE) - CAST(sn AS DOUBLE) / 4.0, 9) AS tpi,
               CAST(greatest(mx, e) - least(mn, e) AS BIGINT) AS roughness
        FROM agg ORDER BY token
    """


# ---------------------------------------------------------------------------
# round-4 continuation batch w: SAX symbolization (spark/temporal.py::
# sax_symbols) — z-normalized PAA frames mapped to Gaussian-breakpoint
# letters; the symbolic time-series index for motif/anomaly search.
# ---------------------------------------------------------------------------


def _q_sax_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX word (8 frames, 4-letter alphabet) of each event type's daily
    count series. Frame ids and all accumulated statistics are exact
    integers; the z-scored PAA value is one fixed-order float per frame
    (spark/temporal.py::sax_symbols)."""
    from gos2_spark.spark.temporal import sax_symbols

    daily = _r4o_daily(spark, sf_dir)
    return sax_symbols(
        daily, "event_type", "day", "n", word_len=8, alphabet=4
    ).orderBy("event_type", "frame")


_SAX_ORACLE = f"""
    WITH daily AS ({_R4O_DAILY_SQL}),
    t AS (
      SELECT event_type, n AS x,
             row_number() OVER (PARTITION BY event_type ORDER BY day) - 1 AS idx,
             count(*) OVER (PARTITION BY event_type) AS nn,
             sum(n) OVER (PARTITION BY event_type) AS sx,
             sum(n * n) OVER (PARTITION BY event_type) AS sxx
      FROM daily
    ),
    f AS (
      SELECT event_type, x, nn, sx, sxx,
             CAST(floor(idx * 8 / nn) AS BIGINT) AS fr
      FROM t
    ),
    agg AS (
      SELECT event_type, fr,
             CAST(count(*) AS BIGINT) AS n_obs,
             CAST(sum(x) AS BIGINT) AS fs,
             CAST(max(nn) AS BIGINT) AS nn,
             CAST(max(sx) AS BIGINT) AS sx,
             CAST(max(sxx) AS BIGINT) AS sxx
      FROM f GROUP BY 1, 2
    ),
    z AS (
      SELECT event_type, fr, n_obs,
             CASE WHEN sqrt(CAST(nn * sxx - sx * sx AS DOUBLE))
                       / CAST(nn AS DOUBLE) > 0
                  THEN (CAST(fs AS DOUBLE) / CAST(n_obs AS DOUBLE)
                        - CAST(sx AS DOUBLE) / CAST(nn AS DOUBLE))
                       / (sqrt(CAST(nn * sxx - sx * sx AS DOUBLE))
                          / CAST(nn AS DOUBLE))
                  ELSE NULL END AS zv
      FROM agg
    )
    SELECT event_type, fr AS frame, n_obs,
           round(zv, 9) AS paa_z,
           CASE WHEN zv IS NULL THEN NULL
                WHEN zv < -0.6744897501960817 THEN 'a'
                WHEN zv < 0.0 THEN 'b'
                WHEN zv < 0.6744897501960817 THEN 'c'
                ELSE 'd' END AS symbol
    FROM z ORDER BY event_type, frame
"""


# ---------------------------------------------------------------------------
# round-4 continuation batch x: eigenvector centrality (pipeline/graph.py::
# eigenvector_centrality) — BIGINT walk-count power iteration, one
# end-of-run L2 normalize; completes the centrality family (pagerank /
# katz / hits / closeness / ppr).
# ---------------------------------------------------------------------------


def _q_eigenvector_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eigenvector centrality after 4 unnormalized power steps over a
    64-node functional graph (dst = 11*src+5 mod 64, distinct from the
    katz synthesis). Walk counts stay BIGINT; the only floats are the
    final divide + sqrt, so the oracle's chained-CTE replay is
    bit-identical."""
    from gos2_spark.pipeline.graph import eigenvector_centrality

    c = _load(spark, sf_dir, "customer")
    edges = c.select(
        (F.col("c_custkey") % 64).alias("src"),
        ((F.col("c_custkey") * 11 + 5) % 64).alias("dst"),
    )
    out = eigenvector_centrality(edges, iterations=4)
    return out.select(
        "node", "walks", F.round("score", 9).alias("score")
    ).orderBy("node")


def _eigenvector_oracle_sql(iterations: int = 4) -> str:
    sql = """
        WITH e AS (
          SELECT DISTINCT c_custkey % 64 AS src,
                          (c_custkey * 11 + 5) % 64 AS dst
          FROM customer
        ),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        x0 AS (SELECT node, CAST(1 AS BIGINT) AS w FROM nodes)
    """
    prev = "x0"
    for i in range(1, iterations + 1):
        sql += f""",
        i{i} AS (
          SELECT e.dst, CAST(sum({prev}.w) AS BIGINT) AS s
          FROM e JOIN {prev} ON e.src = {prev}.node GROUP BY 1
        ),
        x{i} AS (
          SELECT nodes.node,
                 CAST(coalesce(i{i}.s, 0) AS BIGINT) AS w
          FROM nodes LEFT JOIN i{i} ON nodes.node = i{i}.dst
        )
    """
        prev = f"x{i}"
    sql += f""",
        nrm AS (SELECT CAST(sum(w * w) AS BIGINT) AS n2 FROM {prev})
        SELECT node, w AS walks,
               round(CASE WHEN n2 > 0
                     THEN CAST(w AS DOUBLE) / sqrt(CAST(n2 AS DOUBLE))
                     ELSE NULL END, 9) AS score
        FROM {prev} CROSS JOIN nrm ORDER BY node
    """
    return sql


# ---------------------------------------------------------------------------
# round-4 continuation batch y: distributional diversity — lexical richness
# per language, Jensen-Shannon divergence between language corpora
# (token-ordered fold, the corpus_kl_drift pattern), and
# Herfindahl-Hirschman event-mix concentration per cell.
# ---------------------------------------------------------------------------


def _q_lexical_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical richness per language: type-token ratio, hapax share of
    vocabulary, and Simpson's repeat rate D = sum c(c-1) / (N(N-1)).
    Every sufficient statistic (N, V, V1, sum c(c-1)) is BIGINT, so the
    three ratios are bit-identical cross-engine."""
    docs = _load(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"[^a-z]+"),
                lambda t: F.length(t) > 0,
            )
        ).alias("tok"),
    )
    per = toks.groupBy("lang", "tok").agg(F.count("*").alias("c"))
    agg = per.groupBy("lang").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("vocab"),
        F.sum((F.col("c") == 1).cast("long")).alias("_v1"),
        F.sum(F.col("c") * (F.col("c") - 1)).alias("_rep"),
    )
    n = F.col("n_tokens").cast("double")
    return agg.select(
        "lang",
        "n_tokens",
        "vocab",
        F.round(F.col("vocab").cast("double") / n, 9).alias("ttr"),
        F.round(
            F.col("_v1").cast("double") / F.col("vocab").cast("double"), 9
        ).alias("hapax_share"),
        F.round(F.col("_rep").cast("double") / (n * (n - 1.0)), 9).alias(
            "simpson_d"
        ),
    ).orderBy("lang")


_LEXRICH_ORACLE = """
    WITH toks AS (
      SELECT lang,
             unnest(string_split_regex(lower(text), '[^a-z]+')) AS tok
      FROM documents
    ),
    per AS (
      SELECT lang, tok, count(*) AS c
      FROM toks WHERE tok <> '' GROUP BY 1, 2
    ),
    agg AS (
      SELECT lang,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS vocab,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
             CAST(sum(c * (c - 1)) AS BIGINT) AS rep
      FROM per GROUP BY 1
    )
    SELECT lang, n_tokens, vocab,
           round(CAST(vocab AS DOUBLE) / CAST(n_tokens AS DOUBLE), 9) AS ttr,
           round(CAST(v1 AS DOUBLE) / CAST(vocab AS DOUBLE), 9) AS hapax_share,
           round(CAST(rep AS DOUBLE)
                 / (CAST(n_tokens AS DOUBLE) * (CAST(n_tokens AS DOUBLE) - 1.0)),
                 9) AS simpson_d
    FROM agg ORDER BY lang
"""


def _q_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between every language pair's unigram
    distributions — the bounded symmetric companion of corpus_kl_drift.
    Counts/totals are BIGINT; per-token JS terms are folded in TOKEN
    ORDER (sort_array + sequential aggregate), so no float is summed in
    engine-dependent order."""
    docs = _load(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"[^a-z]+"),
                lambda t: F.length(t) > 0,
            )
        ).alias("tok"),
    )
    per = toks.groupBy("lang", "tok").agg(F.count("*").alias("c"))
    tot = per.groupBy("lang").agg(F.sum("c").alias("n"))
    # ordered lang pairs (tiny, broadcast), then the per-pair UNION
    # support: tokens either side has seen
    pairs = (
        tot.select(F.col("lang").alias("la"), F.col("n").alias("na"))
        .crossJoin(tot.select(F.col("lang").alias("lb"), F.col("n").alias("nb")))
        .where(F.col("la") < F.col("lb"))
    )
    support = (
        F.broadcast(pairs)
        .join(per.select(F.col("lang").alias("la"), "tok"), "la")
        .select("la", "lb", "tok")
        .union(
            F.broadcast(pairs)
            .join(per.select(F.col("lang").alias("lb"), "tok"), "lb")
            .select("la", "lb", "tok")
        )
        .distinct()
    )
    g = (
        support.join(
            per.select(F.col("lang").alias("la"), "tok", F.col("c").alias("ca")),
            ["la", "tok"],
            "left",
        )
        .join(
            per.select(F.col("lang").alias("lb"), "tok", F.col("c").alias("cb")),
            ["lb", "tok"],
            "left",
        )
        .join(F.broadcast(pairs), ["la", "lb"])
        .select(
            "la",
            "lb",
            "tok",
            F.coalesce(F.col("ca"), F.lit(0)).alias("ca"),
            F.coalesce(F.col("cb"), F.lit(0)).alias("cb"),
            "na",
            "nb",
        )
    )
    pa = F.col("ca").cast("double") / F.col("na").cast("double")
    pb = F.col("cb").cast("double") / F.col("nb").cast("double")
    m = (pa + pb) / 2.0
    term = (
        F.when(F.col("ca") > 0, 0.5 * pa * F.log(pa / m)).otherwise(F.lit(0.0))
        + F.when(F.col("cb") > 0, 0.5 * pb * F.log(pb / m)).otherwise(F.lit(0.0))
    )
    both = g.select("la", "lb", "tok", term.alias("t"))
    folded = both.groupBy("la", "lb").agg(
        F.count("*").alias("n_union_tokens"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("tok", "t"))),
            F.lit(0.0),
            lambda acc, x: acc + x["t"],
        ).alias("_js"),
    )
    return folded.select(
        "la", "lb", "n_union_tokens", F.round("_js", 9).alias("jsd")
    ).orderBy("la", "lb")


_JSD_ORACLE = """
    WITH toks AS (
      SELECT lang,
             unnest(string_split_regex(lower(text), '[^a-z]+')) AS tok
      FROM documents
    ),
    per AS (
      SELECT lang, tok, count(*) AS c
      FROM toks WHERE tok <> '' GROUP BY 1, 2
    ),
    tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM per GROUP BY 1),
    pairs AS (
      SELECT a.lang AS la, a.n AS na, b.lang AS lb, b.n AS nb
      FROM tot a JOIN tot b ON a.lang < b.lang
    ),
    support AS (
      SELECT DISTINCT la, lb, tok FROM (
        SELECT p.la, p.lb, per.tok FROM pairs p JOIN per ON per.lang = p.la
        UNION ALL
        SELECT p.la, p.lb, per.tok FROM pairs p JOIN per ON per.lang = p.lb
      )
    ),
    g AS (
      SELECT s.la, s.lb, s.tok,
             coalesce(pa.c, 0) AS ca, coalesce(pb.c, 0) AS cb, p.na, p.nb
      FROM support s
      LEFT JOIN per pa ON pa.lang = s.la AND pa.tok = s.tok
      LEFT JOIN per pb ON pb.lang = s.lb AND pb.tok = s.tok
      JOIN pairs p ON p.la = s.la AND p.lb = s.lb
    ),
    t AS (
      SELECT la, lb, tok,
             CASE WHEN ca > 0 THEN 0.5 * (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))
                  * ln((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))
                       / ((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
                           + CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)) / 2.0))
                  ELSE 0.0 END
           + CASE WHEN cb > 0 THEN 0.5 * (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
                  * ln((CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
                       / ((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
                           + CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)) / 2.0))
                  ELSE 0.0 END AS t
      FROM g
    ),
    folded AS (
      SELECT la, lb, CAST(count(*) AS BIGINT) AS n_union_tokens,
             list_reduce(
               list_transform(list_sort(list({'k': tok, 't': t})), x -> x.t),
               (a, b) -> a + b) AS js
      FROM t GROUP BY 1, 2
    )
    SELECT la, lb, n_union_tokens, round(0.0 + js, 9) AS jsd
    FROM folded ORDER BY la, lb
"""


def _q_hhi_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of the event-type mix per
    level-4 cell — the market-concentration readout of regional activity
    (1/k = perfectly even, 1.0 = single-type cell). HHI = sum c_i^2 / N^2
    from BIGINT counts; bit-identical cross-engine."""
    from gos2_spark.spark.functions import s2_cellid, s2_token
    from gos2_spark.spark.pages import s2_parent_sql

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    pts = ev.select(
        "event_type",
        (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
        (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
    )
    cells = pts.select(
        "event_type",
        s2_parent_sql(s2_cellid(F.col("lat"), F.col("lng")), 4).alias("cell"),
    )
    per = cells.groupBy("cell", "event_type").agg(F.count("*").alias("c"))
    agg = per.groupBy("cell").agg(
        F.sum("c").alias("n_events"),
        F.count("*").alias("n_types"),
        F.sum(F.col("c") * F.col("c")).alias("_s2"),
    )
    n = F.col("n_events").cast("double")
    return agg.select(
        s2_token(F.col("cell")).alias("cell_token"),
        "n_events",
        "n_types",
        F.round(F.col("_s2").cast("double") / (n * n), 9).alias("hhi"),
    ).orderBy("cell_token")


def _hhi_oracle_sql() -> str:
    from gos2_spark.pipeline import duckdb_oracles as _DO

    lsb = 1 << 52  # level 4
    tok = _DO._token(f"((c.cell_id & -{lsb}) | {lsb})")
    return f"""
        WITH {_cellid_cte_duckdb(_EV_POINTS_SQL)},
        per AS (
          SELECT {tok} AS cell_token, e.event_type, count(*) AS c
          FROM cells c JOIN events e ON e.event_id = c.key
          GROUP BY 1, 2
        ),
        agg AS (
          SELECT cell_token,
                 CAST(sum(c) AS BIGINT) AS n_events,
                 CAST(count(*) AS BIGINT) AS n_types,
                 CAST(sum(c * c) AS BIGINT) AS s2
          FROM per GROUP BY 1
        )
        SELECT cell_token, n_events, n_types,
               round(CAST(s2 AS DOUBLE)
                     / (CAST(n_events AS DOUBLE) * CAST(n_events AS DOUBLE)),
                     9) AS hhi
        FROM agg ORDER BY cell_token
    """


# ---------------------------------------------------------------------------
# round-4 continuation batch z: customer-analytics trio — RFM quintile
# segmentation, ordered skip-gram event pairs, winsorized robust value
# stats. Money rides as exact integer CENTS throughout.
# ---------------------------------------------------------------------------


def _q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation over purchase events: recency (days to the global
    horizon), frequency, monetary (exact cents), each quintile-scored by
    ntile(5) with a user_id tie-break so bucket edges are deterministic
    cross-engine. 5=best by convention (most recent / most frequent /
    biggest spender)."""
    from pyspark.sql import Window

    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    e = ev.select(
        "user_id",
        "event_type",
        F.floor(us / 86_400_000_000).cast("long").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    horizon = e.select(F.max("day").alias("max_day"))
    p = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max("day").alias("_last"),
            F.count("*").alias("frequency"),
            F.sum("cents").alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            "user_id",
            (F.col("max_day") - F.col("_last")).alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    r = F.ntile(5).over(
        Window.orderBy(F.col("recency_days").desc(), F.col("user_id"))
    )
    f = F.ntile(5).over(Window.orderBy(F.col("frequency"), F.col("user_id")))
    m = F.ntile(5).over(
        Window.orderBy(F.col("monetary_cents"), F.col("user_id"))
    )
    return p.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_cents",
        r.alias("r_score"),
        f.alias("f_score"),
        m.alias("m_score"),
    ).orderBy("user_id")


_RFM_ORACLE = """
    WITH e AS (
      SELECT user_id, event_type,
             CAST(floor(CAST(date_diff('microsecond',
                  TIMESTAMP '1970-01-01 00:00:00', ts) AS DOUBLE)
                  / 86400000000) AS BIGINT) AS day,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    h AS (SELECT max(day) AS max_day FROM e),
    p AS (
      SELECT user_id,
             max(h.max_day) - max(day) AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(cents) AS BIGINT) AS monetary_cents
      FROM e CROSS JOIN h WHERE event_type = 'purchase'
      GROUP BY user_id
    )
    SELECT user_id, recency_days, frequency, monetary_cents,
           CAST(ntile(5) OVER (ORDER BY recency_days DESC, user_id) AS INT)
             AS r_score,
           CAST(ntile(5) OVER (ORDER BY frequency, user_id) AS INT) AS f_score,
           CAST(ntile(5) OVER (ORDER BY monetary_cents, user_id) AS INT)
             AS m_score
    FROM p ORDER BY user_id
"""


def _q_event_skipgrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event-type skip-grams: (earlier, later) type pairs within
    a 5-event lookahead per user — the NON-contiguous generalization of
    event_path_trigrams (catches A ... B funnels with noise between).
    Pure BIGINT counts from one windowed self-join."""
    from pyspark.sql import Window

    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    seq = ev.select(
        "user_id", "event_type", us.alias("us"), "event_id"
    ).withColumn("rn", F.row_number().over(w))
    a = seq.select(
        F.col("user_id").alias("_u"),
        F.col("event_type").alias("type_a"),
        F.col("rn").alias("_ra"),
    )
    b = seq.select(
        F.col("user_id").alias("_u"),
        F.col("event_type").alias("type_b"),
        F.col("rn").alias("_rb"),
    )
    pairs = a.join(b, "_u").where(
        (F.col("_rb") > F.col("_ra")) & (F.col("_rb") <= F.col("_ra") + 5)
    )
    return (
        pairs.groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("type_a", "type_b")
    )


_SKIPGRAM_ORACLE = """
    WITH seq AS (
      SELECT user_id, event_type,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(ts - TIMESTAMP '1970-01-01 00:00:00'),
                        event_id) AS rn
      FROM events
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM seq a JOIN seq b
      ON a.user_id = b.user_id AND b.rn > a.rn AND b.rn <= a.rn + 5
    GROUP BY 1, 2 ORDER BY 1, 2
"""


def _q_winsorized_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-winsorized value statistics per event type: order-statistic
    fences at ranks ceil(0.1n) / n+1-ceil(0.1n) (value tie-broken by
    event_id so the rank picks ONE deterministic row), then the clamped
    mean over exact integer cents — robust to the heavy right tail
    without dropping rows."""
    from pyspark.sql import Window

    ev = _load(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "event_id",
    )
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    wfull = Window.partitionBy("event_type")
    t = e.select(
        "event_type",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wfull).alias("n"),
    )
    k = F.ceil(0.1 * F.col("n").cast("double")).cast("long")
    fences = t.groupBy("event_type").agg(
        F.max("n").alias("n_obs"),
        F.max(F.when(F.col("rn") == F.greatest(k, F.lit(1)), F.col("cents"))).alias(
            "_lo"
        ),
        F.max(
            F.when(
                F.col("rn") == F.col("n") + 1 - F.greatest(k, F.lit(1)),
                F.col("cents"),
            )
        ).alias("_hi"),
    )
    j = e.join(fences, "event_type")
    clamped = F.greatest(F.col("_lo"), F.least(F.col("_hi"), F.col("cents")))
    agg = j.groupBy("event_type").agg(
        F.max("n_obs").alias("n_obs"),
        F.max("_lo").alias("_lo"),
        F.max("_hi").alias("_hi"),
        F.sum(clamped).alias("_cs"),
    )
    return agg.select(
        "event_type",
        "n_obs",
        (F.col("_lo").cast("double") / 100.0).alias("lo_fence"),
        (F.col("_hi").cast("double") / 100.0).alias("hi_fence"),
        F.round(
            F.col("_cs").cast("double")
            / F.col("n_obs").cast("double")
            / 100.0,
            9,
        ).alias("winsorized_mean"),
    ).orderBy("event_type")


_WINSOR_ORACLE = """
    WITH e AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents, event_id
      FROM events
    ),
    t AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cents, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM e
    ),
    fences AS (
      SELECT event_type,
             CAST(max(n) AS BIGINT) AS n_obs,
             CAST(max(CASE WHEN rn = greatest(
                    CAST(ceil(0.1 * CAST(n AS DOUBLE)) AS BIGINT), 1)
                  THEN cents END) AS BIGINT) AS lo,
             CAST(max(CASE WHEN rn = n + 1 - greatest(
                    CAST(ceil(0.1 * CAST(n AS DOUBLE)) AS BIGINT), 1)
                  THEN cents END) AS BIGINT) AS hi
      FROM t GROUP BY 1
    ),
    agg AS (
      SELECT e.event_type, max(f.n_obs) AS n_obs,
             max(f.lo) AS lo, max(f.hi) AS hi,
             CAST(sum(greatest(f.lo, least(f.hi, e.cents))) AS BIGINT) AS cs
      FROM e JOIN fences f ON f.event_type = e.event_type
      GROUP BY 1
    )
    SELECT event_type, n_obs,
           CAST(lo AS DOUBLE) / 100.0 AS lo_fence,
           CAST(hi AS DOUBLE) / 100.0 AS hi_fence,
           round(CAST(cs AS DOUBLE) / CAST(n_obs AS DOUBLE) / 100.0, 9)
             AS winsorized_mean
    FROM agg ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# round-4 continuation batch aa: directed triad census, weighted Jaccard
# host similarity, Gumbel block-maxima fit, component-size distribution.
# ---------------------------------------------------------------------------


def _q_triad_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed closed-triad census over a 64-node two-map functional
    graph: cyclic triangles (a->b->c->a, rotation-deduped by /3) vs
    transitive feed-forward triangles (a->b->c with shortcut a->c) —
    the motif split that separates feedback from hierarchy in link
    graphs. Three hash joins over a distinct edge table; exact BIGINTs."""
    ev = _load(spark, sf_dir, "customer")
    c = F.col("c_custkey")
    edges = (
        ev.select((c % 64).alias("src"), ((c * 7 + 3) % 64).alias("dst"))
        .union(ev.select((c % 64).alias("src"), ((c * 11 + 5) % 64).alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    e1 = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = edges.select(F.col("src").alias("b"), F.col("dst").alias("c2"))
    e3c = edges.select(F.col("src").alias("c2"), F.col("dst").alias("a2"))
    paths = (
        e1.join(e2, "b")
        .where((F.col("c2") != F.col("a")))
    )
    cyc = (
        paths.join(
            e3c, (paths["c2"] == e3c["c2"]) & (paths["a"] == e3c["a2"])
        )
        .count()
    )
    e3t = edges.select(F.col("src").alias("a"), F.col("dst").alias("c2"))
    ffl = paths.join(e3t, ["a", "c2"]).count()
    return spark.createDataFrame(
        [(int(cyc // 3), int(ffl))], "n_cyclic long, n_transitive long"
    )


_TRIAD_ORACLE = """
    WITH e AS (
      SELECT DISTINCT src, dst FROM (
        SELECT c_custkey % 64 AS src, (c_custkey * 7 + 3) % 64 AS dst
        FROM customer
        UNION ALL
        SELECT c_custkey % 64, (c_custkey * 11 + 5) % 64 FROM customer
      ) WHERE src <> dst
    ),
    paths AS (
      SELECT e1.src AS a, e1.dst AS b, e2.dst AS c2
      FROM e e1 JOIN e e2 ON e2.src = e1.dst
      WHERE e2.dst <> e1.src
    )
    SELECT CAST((SELECT count(*) FROM paths p
                 JOIN e ON e.src = p.c2 AND e.dst = p.a) // 3 AS BIGINT)
             AS n_cyclic,
           CAST((SELECT count(*) FROM paths p
                 JOIN e ON e.src = p.a AND e.dst = p.c2) AS BIGINT)
             AS n_transitive
"""


def _q_weighted_jaccard_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted Jaccard similarity between source hosts' outlink
    MULTISETS (sum-min over sum-max) — the frequency-aware upgrade of
    neighbor_jaccard_links. Only the common-destination join is needed:
    sum-max = tot_a + tot_b - sum-min, so every statistic is BIGINT and
    the join is bounded by co-citation pairs, not the full cross."""
    ev = _load(spark, sf_dir, "customer")
    c = F.col("c_custkey")
    w = (
        ev.select((c % 32).alias("src"), ((c * 7 + 3) % 32).alias("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )
    tot = w.groupBy("src").agg(F.sum("w").alias("tot"))
    a = w.select(F.col("src").alias("sa"), "dst", F.col("w").alias("wa"))
    b = w.select(F.col("src").alias("sb"), "dst", F.col("w").alias("wb"))
    common = (
        a.join(b, "dst")
        .where(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.sum(F.least(F.col("wa"), F.col("wb"))).alias("_smin"))
    )
    j = (
        common.join(tot.select(F.col("src").alias("sa"), F.col("tot").alias("ta")), "sa")
        .join(tot.select(F.col("src").alias("sb"), F.col("tot").alias("tb")), "sb")
    )
    return j.select(
        "sa",
        "sb",
        F.col("_smin").alias("sum_min"),
        (F.col("ta") + F.col("tb") - F.col("_smin")).alias("sum_max"),
        F.round(
            F.col("_smin").cast("double")
            / (F.col("ta") + F.col("tb") - F.col("_smin")).cast("double"),
            9,
        ).alias("weighted_jaccard"),
    ).orderBy("sa", "sb")


_WJACCARD_ORACLE = """
    WITH w AS (
      SELECT c_custkey % 32 AS src, (c_custkey * 7 + 3) % 32 AS dst,
             count(*) AS w
      FROM customer GROUP BY 1, 2
    ),
    tot AS (SELECT src, CAST(sum(w) AS BIGINT) AS tot FROM w GROUP BY 1),
    common AS (
      SELECT a.src AS sa, b.src AS sb,
             CAST(sum(least(a.w, b.w)) AS BIGINT) AS smin
      FROM w a JOIN w b ON a.dst = b.dst AND a.src < b.src
      GROUP BY 1, 2
    )
    SELECT c.sa, c.sb, c.smin AS sum_min,
           ta.tot + tb.tot - c.smin AS sum_max,
           round(CAST(c.smin AS DOUBLE)
                 / CAST(ta.tot + tb.tot - c.smin AS DOUBLE), 9)
             AS weighted_jaccard
    FROM common c
    JOIN tot ta ON ta.src = c.sa
    JOIN tot tb ON tb.src = c.sb
    ORDER BY c.sa, c.sb
"""


def _q_gumbel_weekly_maxima(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel extreme-value fit (method of moments) to WEEKLY maxima of
    each event type's daily counts: beta = sd*sqrt(6)/pi, mu = mean -
    gamma*beta — the capacity-planning tail model ("what daily peak
    should week N expect?"). Block maxima and moment sums are BIGINT;
    mu/beta are one fixed-order float expression."""
    daily = _r4o_daily(spark, sf_dir)
    wk = (
        daily.select(
            "event_type",
            (F.col("day") - (F.col("day") % 7)).alias("week"),
            "n",
        )
        .groupBy("event_type", "week")
        .agg(F.max("n").alias("m"))
    )
    agg = wk.groupBy("event_type").agg(
        F.count("*").alias("n_weeks"),
        F.sum("m").alias("_sm"),
        F.sum(F.col("m") * F.col("m")).alias("_smm"),
    )
    n = F.col("n_weeks").cast("double")
    mean = F.col("_sm").cast("double") / n
    sd = F.sqrt(
        (F.col("n_weeks") * F.col("_smm") - F.col("_sm") * F.col("_sm")).cast(
            "double"
        )
        / (n * (n - 1.0))
    )
    beta = sd * F.sqrt(F.lit(6.0)) / F.lit(3.141592653589793)
    mu = mean - F.lit(0.5772156649015329) * beta
    return agg.select(
        "event_type",
        "n_weeks",
        F.round(mu, 9).alias("gumbel_mu"),
        F.round(beta, 9).alias("gumbel_beta"),
    ).orderBy("event_type")


_GUMBEL_ORACLE = f"""
    WITH daily AS ({_R4O_DAILY_SQL}),
    wk AS (
      SELECT event_type, day - (day % 7) AS week, max(n) AS m
      FROM daily GROUP BY 1, 2
    ),
    agg AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_weeks,
             CAST(sum(m) AS BIGINT) AS sm,
             CAST(sum(m * m) AS BIGINT) AS smm
      FROM wk GROUP BY 1
    )
    SELECT event_type, n_weeks,
           round(CAST(sm AS DOUBLE) / CAST(n_weeks AS DOUBLE)
                 - 0.5772156649015329
                   * (sqrt(CAST(n_weeks * smm - sm * sm AS DOUBLE)
                           / (CAST(n_weeks AS DOUBLE)
                              * (CAST(n_weeks AS DOUBLE) - 1.0)))
                      * sqrt(6.0) / 3.141592653589793), 9) AS gumbel_mu,
           round(sqrt(CAST(n_weeks * smm - sm * sm AS DOUBLE)
                      / (CAST(n_weeks AS DOUBLE)
                         * (CAST(n_weeks AS DOUBLE) - 1.0)))
                 * sqrt(6.0) / 3.141592653589793, 9) AS gumbel_beta
    FROM agg ORDER BY event_type
"""


def _q_component_size_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Component-size distribution of the spatial single-linkage graph —
    the percolation readout (giant-component watch) on top of the
    verified connected-components pipeline: how many clusters of each
    size exist."""
    comps = _q_spatial_components(spark, sf_dir)
    return (
        comps.groupBy("component")
        .agg(F.count("*").alias("size"))
        .groupBy("size")
        .agg(F.count("*").alias("n_components"))
        .orderBy("size")
    )


_SPATIAL_COMPONENTS_ORACLE = f"""
    WITH RECURSIVE pts AS ({_CUST_LATLNG_SQL}),
    v AS (
      SELECT key,
             cos(radians(lng)) * cos(radians(lat)) AS x,
             sin(radians(lng)) * cos(radians(lat)) AS y,
             sin(radians(lat)) AS z
      FROM pts
    ),
    e AS (
      SELECT a.key AS src, b.key AS dst
      FROM v a JOIN v b ON a.key != b.key
      WHERE atan2(sqrt(
                (a.y * b.z - a.z * b.y) * (a.y * b.z - a.z * b.y)
              + (a.z * b.x - a.x * b.z) * (a.z * b.x - a.x * b.z)
              + (a.x * b.y - a.y * b.x) * (a.x * b.y - a.y * b.x)),
              a.x * b.x + a.y * b.y + a.z * b.z)
            <= {math.radians(3.0)!r}
    ),
    reach(a, b) AS (
      SELECT key, key FROM pts
      UNION
      SELECT r.a, e.dst FROM reach r JOIN e ON r.b = e.src
    )
    SELECT a AS key, min(b) AS component
    FROM reach GROUP BY a ORDER BY key
"""

_COMPONENT_SIZE_ORACLE = f"""
    WITH comps AS ({_SPATIAL_COMPONENTS_ORACLE})
    SELECT size, CAST(count(*) AS BIGINT) AS n_components
    FROM (
      SELECT component, CAST(count(*) AS BIGINT) AS size
      FROM comps GROUP BY 1
    ) GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# round-4 continuation batch bb: sequential/information statistics —
# Markov entropy rate, SPRT sequential A/B test, Chapman capture-recapture
# coverage estimate, Good-Turing frequency-of-frequencies.
# ---------------------------------------------------------------------------


def _q_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the user event-type Markov chain — the
    predictability summary on top of markov_transitions: H = -sum_ij
    (c_ij/T) ln(c_ij / r_i) over BIGINT transition counts, folded in
    (from,to) order so no float is summed in engine-dependent order;
    perplexity = exp(H)."""
    from pyspark.sql import Window

    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    seq = ev.select("user_id", "event_type", us.alias("us"), "event_id")
    tr = (
        seq.withColumn("nxt", F.lead("event_type").over(w))
        .where(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("a"), F.col("nxt").alias("b"))
        .agg(F.count("*").alias("c"))
    )
    row = tr.groupBy("a").agg(F.sum("c").alias("r"))
    tot = tr.agg(F.sum("c").alias("t"), F.count("*").alias("n_cells"))
    term = (
        -(F.col("c").cast("double") / F.col("t").cast("double"))
        * F.log(F.col("c").cast("double") / F.col("r").cast("double"))
    )
    folded = (
        tr.join(row, "a")
        .crossJoin(F.broadcast(tot))
        .select("a", "b", term.alias("h"), "t")
        .groupBy("t")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("a", "b", "h"))),
                F.lit(0.0),
                lambda acc, x: acc + x["h"],
            ).alias("_h")
        )
    )
    return folded.select(
        F.col("t").alias("n_transitions"),
        F.round("_h", 9).alias("entropy_rate"),
        F.round(F.exp(F.col("_h")), 9).alias("perplexity"),
    )


_MARKOV_ENTROPY_ORACLE = """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(ts - TIMESTAMP '1970-01-01 00:00:00'),
                        event_id) AS nxt
      FROM events
    ),
    tr AS (
      SELECT event_type AS a, nxt AS b, count(*) AS c
      FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    rw AS (SELECT a, CAST(sum(c) AS BIGINT) AS r FROM tr GROUP BY 1),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM tr),
    terms AS (
      SELECT tr.a, tr.b,
             -(CAST(tr.c AS DOUBLE) / CAST(tot.t AS DOUBLE))
               * ln(CAST(tr.c AS DOUBLE) / CAST(rw.r AS DOUBLE)) AS h,
             tot.t
      FROM tr JOIN rw ON rw.a = tr.a CROSS JOIN tot
    ),
    folded AS (
      SELECT t,
             list_reduce(
               list_transform(list_sort(list({'a': a, 'b': b, 'h': h})),
                              x -> x.h),
               (x, y) -> x + y) AS h
      FROM terms GROUP BY 1
    )
    SELECT t AS n_transitions, round(0.0 + h, 9) AS entropy_rate,
           round(exp(0.0 + h), 9) AS perplexity
    FROM folded
"""

# SPRT constants (H0 p=0.30 vs H1 p=0.35, alpha=beta=0.05), precomputed to
# full double precision so both engines use the SAME literals
_SPRT_LA = 0.15415067982725836   # ln(0.35/0.30)
_SPRT_LB = -0.07410797215372197  # ln(0.65/0.70)
_SPRT_THRESH = 2.9444389791664403  # ln((1-0.05)/0.05)


def _q_sprt_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT over the user conversion stream (converted = any
    purchase >= $200, users in user_id order as the deterministic
    arrival sequence): the log-likelihood ratio walk LLR_n = k_n*ln(p1/
    p0) + (n-k_n)*ln(q1/q0) and its FIRST boundary crossing at
    +/- ln(19). Cumulative k_n is BIGINT; each LLR is one fixed-order
    float; the arg-min crossing indexes are integer aggregates."""
    from pyspark.sql import Window

    ev = _load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            (
                (F.col("event_type") == "purchase") & (F.col("value") >= 200.0)
            ).cast("long")
        ).alias("conv")
    )
    w = Window.orderBy("user_id")
    t = per_user.select(
        "user_id",
        F.row_number().over(w).alias("n"),
        F.sum("conv").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("k"),
    )
    llr = (
        F.col("k").cast("double") * F.lit(_SPRT_LA)
        + (F.col("n") - F.col("k")).cast("double") * F.lit(_SPRT_LB)
    )
    agg = t.select("n", "k", llr.alias("llr")).agg(
        F.max("n").alias("n_users"),
        F.max("k").alias("n_converted"),
        F.min(F.when(F.col("llr") >= _SPRT_THRESH, F.col("n"))).alias("_up"),
        F.min(F.when(F.col("llr") <= -_SPRT_THRESH, F.col("n"))).alias("_dn"),
    )
    first = F.least(
        F.coalesce(F.col("_up"), F.lit(2**62)),
        F.coalesce(F.col("_dn"), F.lit(2**62)),
    )
    decision = (
        F.when(F.col("_up").isNull() & F.col("_dn").isNull(), F.lit("continue"))
        .when(
            F.coalesce(F.col("_up"), F.lit(2**62))
            <= F.coalesce(F.col("_dn"), F.lit(2**62)),
            F.lit("accept_h1"),
        )
        .otherwise(F.lit("accept_h0"))
    )
    return agg.select(
        "n_users",
        "n_converted",
        F.when(first < 2**62, first).alias("first_cross_n"),
        decision.alias("decision"),
    )


_SPRT_ORACLE = f"""
    WITH per_user AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'purchase' AND value >= 200.0
                 THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY 1
    ),
    t AS (
      SELECT user_id,
             row_number() OVER (ORDER BY user_id) AS n,
             sum(conv) OVER (ORDER BY user_id ROWS UNBOUNDED PRECEDING) AS k
      FROM per_user
    ),
    l AS (
      SELECT n, k,
             CAST(k AS DOUBLE) * {_SPRT_LA!r}
             + CAST(n - k AS DOUBLE) * {_SPRT_LB!r} AS llr
      FROM t
    ),
    agg AS (
      SELECT CAST(max(n) AS BIGINT) AS n_users,
             CAST(max(k) AS BIGINT) AS n_converted,
             min(CASE WHEN llr >= {_SPRT_THRESH!r} THEN n END) AS up,
             min(CASE WHEN llr <= -{_SPRT_THRESH!r} THEN n END) AS dn
      FROM l
    )
    SELECT n_users, n_converted,
           CAST(CASE WHEN least(coalesce(up, 4611686018427387904),
                              coalesce(dn, 4611686018427387904))
                          < 4611686018427387904
                THEN least(coalesce(up, 4611686018427387904),
                           coalesce(dn, 4611686018427387904)) END AS BIGINT)
             AS first_cross_n,
           CASE WHEN up IS NULL AND dn IS NULL THEN 'continue'
                WHEN coalesce(up, 4611686018427387904)
                     <= coalesce(dn, 4611686018427387904) THEN 'accept_h1'
                ELSE 'accept_h0' END AS decision
    FROM agg
"""


def _q_chapman_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapman capture-recapture estimate of corpus size from two
    independent hash-sampled 'crawls' (each keeps ~2/3 of docs): N_hat =
    (n1+1)(n2+1)/(m+1) - 1 — the coverage check a crawl pipeline runs
    without ever seeing the full population. Counts are BIGINT from the
    replayable XXH64 membership; one float expression at the end."""
    docs = _load(spark, sf_dir, "documents")
    h1 = F.pmod(
        F.xxhash64(F.concat(F.col("doc_id").cast("string"), F.lit("#c1"))),
        F.lit(3),
    )
    h2 = F.pmod(
        F.xxhash64(F.concat(F.col("doc_id").cast("string"), F.lit("#c2"))),
        F.lit(3),
    )
    t = docs.select(
        (h1 < 2).cast("long").alias("in1"), (h2 < 2).cast("long").alias("in2")
    )
    agg = t.agg(
        F.count("*").alias("n_docs"),
        F.sum("in1").alias("n1"),
        F.sum("in2").alias("n2"),
        F.sum(F.col("in1") * F.col("in2")).alias("m"),
    )
    est = (
        (F.col("n1") + 1).cast("double")
        * (F.col("n2") + 1).cast("double")
        / (F.col("m") + 1).cast("double")
        - 1.0
    )
    return agg.select(
        "n_docs", "n1", "n2", F.col("m").alias("n_both"),
        F.round(est, 9).alias("chapman_estimate"),
    )


def _chapman_oracle_sql() -> str:
    from gos2_spark.pipeline.duckdb_oracles import xxh64_list_sql

    def mem(salt):
        salted = "[CAST(doc_id AS VARCHAR) || '#" + salt + "']"
        h = f"({xxh64_list_sql(salted)})[1]"
        return f"CASE WHEN (({h}) % 3 + 3) % 3 < 2 THEN 1 ELSE 0 END"

    return f"""
        WITH t AS (
          SELECT {mem('c1')} AS in1, {mem('c2')} AS in2 FROM documents
        ),
        agg AS (
          SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(in1) AS BIGINT) AS n1,
                 CAST(sum(in2) AS BIGINT) AS n2,
                 CAST(sum(in1 * in2) AS BIGINT) AS m
          FROM t
        )
        SELECT n_docs, n1, n2, m AS n_both,
               round(CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE)
                     / CAST(m + 1 AS DOUBLE) - 1.0, 9) AS chapman_estimate
        FROM agg
    """


def _q_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing frequency-of-frequencies over the corpus vocabulary:
    N_r for r <= 10 with the GT adjusted count r* = (r+1) N_{r+1}/N_r —
    the unseen-mass estimator under every smoothing scheme. All counts
    BIGINT; r* one division."""
    from pyspark.sql import Window

    docs = _load(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"[^a-z]+"),
                lambda t: F.length(t) > 0,
            )
        ).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count("*").alias("r"))
    fof = counts.groupBy("r").agg(F.count("*").alias("n_r"))
    w = Window.orderBy("r")
    t = fof.withColumn("_next_r", F.lead("r").over(w)).withColumn(
        "_next_n", F.lead("n_r").over(w)
    )
    rstar = F.when(
        F.col("_next_r") == F.col("r") + 1,
        (F.col("r") + 1).cast("double")
        * F.col("_next_n").cast("double")
        / F.col("n_r").cast("double"),
    )
    return (
        t.where(F.col("r") <= 10)
        .select("r", "n_r", F.round(rstar, 9).alias("r_star"))
        .orderBy("r")
    )


_GOOD_TURING_ORACLE = """
    WITH toks AS (
      SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS tok
      FROM documents
    ),
    counts AS (
      SELECT tok, count(*) AS r FROM toks WHERE tok <> '' GROUP BY 1
    ),
    fof AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM counts GROUP BY 1),
    t AS (
      SELECT r, n_r,
             lead(r) OVER (ORDER BY r) AS next_r,
             lead(n_r) OVER (ORDER BY r) AS next_n
      FROM fof
    )
    SELECT CAST(r AS BIGINT) AS r, n_r,
           round(CASE WHEN next_r = r + 1
                 THEN CAST(r + 1 AS DOUBLE) * CAST(next_n AS DOUBLE)
                      / CAST(n_r AS DOUBLE) END, 9) AS r_star
    FROM t WHERE r <= 10 ORDER BY r
"""


# ---------------------------------------------------------------------------
# round-4 continuation batch cc: spatial model validation — leave-one-out
# IDW cross-validation error per nation, and the Hopkins clustering-
# tendency statistic (real vs synthetic-uniform NN distances over the
# cap-doubling kNN join).
# ---------------------------------------------------------------------------


def _q_idw_loo_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out IDW cross-validation: predict each customer point's
    deterministic field value v = (key % 1000)/10 from its <=3-degree
    neighbors (weight 1/(1e-3+d)^2 over the blocked distance join,
    excluding self), report per-nation RMSE — the resolution-choice
    diagnostic for any IDW surface. Weighted sums follow the established
    rounded float-sum practice; the pair set itself is exact (the
    distance_join recall proof)."""
    from gos2_spark.spark.joins import distance_join

    pts = _cust_points(spark, sf_dir)
    pairs = distance_join(pts, 3.0, point_key="key")
    sym = pairs.select(
        F.col("key_a").alias("key"),
        F.col("key_b").alias("nbr"),
        "dist_rad",
    ).union(
        pairs.select(
            F.col("key_b").alias("key"),
            F.col("key_a").alias("nbr"),
            "dist_rad",
        )
    )
    v_nbr = (F.col("nbr") % 1000).cast("double") / 10.0
    w = 1.0 / ((1e-3 + F.col("dist_rad")) * (1e-3 + F.col("dist_rad")))
    per = sym.groupBy("key").agg(
        F.sum(w * v_nbr).alias("_num"),
        F.sum(w).alias("_den"),
        F.count("*").alias("n_nbrs"),
    )
    cust = _load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"), "c_nationkey"
    )
    err = (
        per.join(cust, "key")
        .select(
            "c_nationkey",
            (
                F.col("_num") / F.col("_den")
                - (F.col("key") % 1000).cast("double") / 10.0
            ).alias("_e"),
        )
    )
    return (
        err.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_points"),
            F.round(F.sqrt(F.avg(F.col("_e") * F.col("_e"))), 9).alias("rmse"),
        )
        .orderBy("c_nationkey")
    )


_IDW_LOO_ORACLE = f"""
    WITH pts AS ({_CUST_LATLNG_SQL}),
    v AS (
      SELECT key,
             cos(radians(lng)) * cos(radians(lat)) AS x,
             sin(radians(lng)) * cos(radians(lat)) AS y,
             sin(radians(lat)) AS z
      FROM pts
    ),
    sym AS (
      SELECT a.key AS key, b.key AS nbr,
             atan2(sqrt(
                 (a.y * b.z - a.z * b.y) * (a.y * b.z - a.z * b.y)
               + (a.z * b.x - a.x * b.z) * (a.z * b.x - a.x * b.z)
               + (a.x * b.y - a.y * b.x) * (a.x * b.y - a.y * b.x)),
               a.x * b.x + a.y * b.y + a.z * b.z) AS d
      FROM v a JOIN v b ON a.key != b.key
    ),
    filt AS (SELECT * FROM sym WHERE d <= {math.radians(3.0)!r}),
    per AS (
      SELECT key,
             sum((1.0 / ((1e-3 + d) * (1e-3 + d)))
                 * (CAST(nbr % 1000 AS DOUBLE) / 10.0)) AS num,
             sum(1.0 / ((1e-3 + d) * (1e-3 + d))) AS den,
             count(*) AS n_nbrs
      FROM filt GROUP BY 1
    ),
    err AS (
      SELECT c.c_nationkey,
             per.num / per.den - CAST(per.key % 1000 AS DOUBLE) / 10.0 AS e
      FROM per JOIN customer c ON c.c_custkey = per.key
    )
    SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_points,
           round(sqrt(avg(e * e)), 9) AS rmse
    FROM err GROUP BY 1 ORDER BY 1
"""


def _q_hopkins_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopkins clustering-tendency statistic: H = sum(w) / (sum(u) +
    sum(w)) where u = each real point's NN distance among the other real
    points and w = each of 300 deterministic synthetic probe points' NN
    distance to the real set (H ~ 0.5 = CSR, -> 1 = clustered). Both NN
    passes ride the cap-doubling kNN join (exact, tie-broken); the two
    sums follow the rounded float-sum practice."""
    from gos2_spark.spark.functions import s2_cellid
    from gos2_spark.spark.joins import knn_join_df

    pts = _cust_points(spark, sf_dir)
    nn_real = (
        knn_join_df(pts, pts.withColumnRenamed("key", "qid"), 2,
                    point_key="key", query_key="qid")
        .where(F.col("key") != F.col("qid"))
        .groupBy("qid")
        .agg(F.min("dist_rad").alias("u"))
    )
    ids = spark.range(1, 301).select(F.col("id").cast("long").alias("qid"))
    synth = ids.select(
        "qid",
        (-60.0 + (F.col("qid") * 29 % 120) + (F.col("qid") % 71) / 71.0).alias(
            "lat"
        ),
        (-170.0 + (F.col("qid") * 31 % 340) + (F.col("qid") % 67) / 67.0).alias(
            "lng"
        ),
    ).withColumn("cell_id", s2_cellid(F.col("lat"), F.col("lng")))
    nn_synth = knn_join_df(
        pts, synth, 1, point_key="key", query_key="qid"
    ).groupBy("qid").agg(F.min("dist_rad").alias("w"))
    su = nn_real.agg(
        F.count("*").alias("n_real"), F.sum("u").alias("_su")
    )
    sw = nn_synth.agg(
        F.count("*").alias("n_synth"), F.sum("w").alias("_sw")
    )
    j = su.crossJoin(sw)
    return j.select(
        "n_real",
        "n_synth",
        F.round(F.col("_su"), 9).alias("sum_u"),
        F.round(F.col("_sw"), 9).alias("sum_w"),
        F.round(F.col("_sw") / (F.col("_su") + F.col("_sw")), 9).alias(
            "hopkins_h"
        ),
    )


_HOPKINS_ORACLE = f"""
    WITH pts AS ({_CUST_LATLNG_SQL}),
    v AS (
      SELECT key,
             cos(radians(lng)) * cos(radians(lat)) AS x,
             sin(radians(lng)) * cos(radians(lat)) AS y,
             sin(radians(lat)) AS z
      FROM pts
    ),
    u AS (
      SELECT a.key,
             min(atan2(sqrt(
                 (a.y * b.z - a.z * b.y) * (a.y * b.z - a.z * b.y)
               + (a.z * b.x - a.x * b.z) * (a.z * b.x - a.x * b.z)
               + (a.x * b.y - a.y * b.x) * (a.x * b.y - a.y * b.x)),
               a.x * b.x + a.y * b.y + a.z * b.z)) AS u
      FROM v a JOIN v b ON a.key != b.key GROUP BY 1
    ),
    synth AS (
      SELECT i AS qid,
             -60.0 + (i * 29 % 120) + (i % 71) / 71.0 AS lat,
             -170.0 + (i * 31 % 340) + (i % 67) / 67.0 AS lng
      FROM (SELECT range + 1 AS i FROM range(300))
    ),
    sv AS (
      SELECT qid,
             cos(radians(lng)) * cos(radians(lat)) AS x,
             sin(radians(lng)) * cos(radians(lat)) AS y,
             sin(radians(lat)) AS z
      FROM synth
    ),
    w AS (
      SELECT s.qid,
             min(atan2(sqrt(
                 (s.y * b.z - s.z * b.y) * (s.y * b.z - s.z * b.y)
               + (s.z * b.x - s.x * b.z) * (s.z * b.x - s.x * b.z)
               + (s.x * b.y - s.y * b.x) * (s.x * b.y - s.y * b.x)),
               s.x * b.x + s.y * b.y + s.z * b.z)) AS w
      FROM sv s CROSS JOIN v b GROUP BY 1
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM u) AS n_real,
           (SELECT CAST(count(*) AS BIGINT) FROM w) AS n_synth,
           round((SELECT sum(u) FROM u), 9) AS sum_u,
           round((SELECT sum(w) FROM w), 9) AS sum_w,
           round((SELECT sum(w) FROM w)
                 / ((SELECT sum(u) FROM u) + (SELECT sum(w) FROM w)), 9)
             AS hopkins_h
"""


# ---------------------------------------------------------------------------
# round-4 continuation batch dd: multiple-testing + corpus-contrast —
# Benjamini-Hochberg FDR over the Gi* hotspot field (normal survival
# function via the shared Abramowitz-Stegun 26.2.17 polynomial, identical
# literals both engines) and Monroe et al. "fightin' words" log-odds with
# an informative Dirichlet prior.
# ---------------------------------------------------------------------------

_SQRT_2PI = 2.5066282746310002


def _normal_sf_col(a):
    """One-sided upper-tail P(Z > a) for a >= 0 — Abramowitz-Stegun
    26.2.17 (|error| < 7.5e-8), Horner form. Same literals as the SQL
    twin below, so both engines run the identical float ops."""
    t = 1.0 / (1.0 + 0.2316419 * a)
    poly = t * (
        0.319381530
        + t * (-0.356563782 + t * (1.781477937 + t * (-1.821255978 + t * 1.330274429)))
    )
    return F.exp(-(a * a) / 2.0) / F.lit(_SQRT_2PI) * poly


def _normal_sf_sql(a: str) -> str:
    t = f"(1.0 / (1.0 + 0.2316419 * {a}))"
    poly = (
        f"({t} * (0.319381530 + {t} * (-0.356563782 + {t} * (1.781477937"
        f" + {t} * (-1.821255978 + {t} * 1.330274429)))))"
    )
    return f"(exp(-({a} * {a}) / 2.0) / {_SQRT_2PI!r} * {poly})"


def _q_fdr_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control (q=0.05) over the per-cell Gi*
    z-field: two-sided p from the shared A&S normal-SF polynomial, BH
    step-up via one rank window + one max — the multiple-testing gate a
    hotspot map needs before claiming anything at 10^8 cells. Returns the
    significant cells with their p and BH rank."""
    from pyspark.sql import Window

    gi = _q_gistar_cells(spark, sf_dir)
    p = F.least(F.lit(1.0), 2.0 * _normal_sf_col(F.abs(F.col("gi_star"))))
    t = gi.select("token", "gi_star", p.alias("p_value"))
    w = Window.orderBy("p_value", "token")
    wfull = Window.partitionBy()
    ranked = t.select(
        "*",
        F.row_number().over(w).alias("bh_rank"),
        F.count("*").over(wfull).alias("_m"),
    )
    passed = ranked.withColumn(
        "_ok",
        F.col("p_value")
        <= F.col("bh_rank").cast("double") * 0.05 / F.col("_m").cast("double"),
    )
    kmax = passed.agg(
        F.max(F.when(F.col("_ok"), F.col("bh_rank"))).alias("_k")
    )
    return (
        passed.crossJoin(F.broadcast(kmax))
        .where(F.col("bh_rank") <= F.col("_k"))
        .select(
            "token",
            "gi_star",
            F.round("p_value", 9).alias("p_value"),
            "bh_rank",
        )
        .orderBy("bh_rank", "token")
    )


def _fdr_oracle_sql() -> str:
    inner = _gistar_oracle_sql()
    sf = _normal_sf_sql("abs(gi_star)")
    return f"""
        WITH gi AS ({inner}),
        t AS (
          SELECT token, gi_star,
                 least(1.0, 2.0 * {sf}) AS p_value
          FROM gi
        ),
        ranked AS (
          SELECT *, row_number() OVER (ORDER BY p_value, token) AS bh_rank,
                 count(*) OVER () AS m
          FROM t
        ),
        k AS (
          SELECT max(CASE WHEN p_value <= CAST(bh_rank AS DOUBLE) * 0.05
                              / CAST(m AS DOUBLE)
                     THEN bh_rank END) AS kmax
          FROM ranked
        )
        SELECT token, gi_star, round(p_value, 9) AS p_value,
               CAST(bh_rank AS BIGINT) AS bh_rank
        FROM ranked, k WHERE bh_rank <= kmax
        ORDER BY bh_rank, token
    """


def _q_fightin_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monroe/Colaresi/Quinn "fightin' words": informative-Dirichlet
    log-odds z of each token for LANG vs the rest of the corpus (prior
    a0=1000 spread by corpus frequency), top 10 distinctive tokens per
    language. Every input to the per-token z is an exact BIGINT — there
    is no cross-token float sum at all."""
    from pyspark.sql import Window

    docs = _load(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"[^a-z]+"),
                lambda t: F.length(t) > 0,
            )
        ).alias("tok"),
    )
    per = toks.groupBy("lang", "tok").agg(F.count("*").alias("c"))
    corpus = per.groupBy("tok").agg(F.sum("c").alias("cc"))
    nl = per.groupBy("lang").agg(F.sum("c").alias("n_l"))
    ntot = corpus.agg(F.sum("cc").alias("n_tot"))
    g = (
        per.join(corpus, "tok")
        .join(nl, "lang")
        .crossJoin(F.broadcast(ntot))
        .select(
            "lang",
            "tok",
            "c",
            "cc",
            "n_l",
            "n_tot",
            (F.col("cc") - F.col("c")).alias("c_rest"),
            (F.col("n_tot") - F.col("n_l")).alias("n_rest"),
        )
    )
    a0 = F.lit(1000.0)
    alpha = a0 * F.col("cc").cast("double") / F.col("n_tot").cast("double")
    y1 = F.col("c").cast("double") + alpha
    d1 = F.col("n_l").cast("double") + a0 - y1
    y2 = F.col("c_rest").cast("double") + alpha
    d2 = F.col("n_rest").cast("double") + a0 - y2
    delta = F.log(y1 / d1) - F.log(y2 / d2)
    var = 1.0 / y1 + 1.0 / y2
    z = delta / F.sqrt(var)
    scored = g.select("lang", "tok", "c", z.alias("_z"))
    w = Window.partitionBy("lang").orderBy(F.col("_z").desc(), "tok")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select("lang", "rank", "tok", "c", F.round("_z", 9).alias("log_odds_z"))
        .orderBy("lang", "rank")
    )


_FIGHTIN_ORACLE = """
    WITH toks AS (
      SELECT lang,
             unnest(string_split_regex(lower(text), '[^a-z]+')) AS tok
      FROM documents
    ),
    per AS (
      SELECT lang, tok, count(*) AS c
      FROM toks WHERE tok <> '' GROUP BY 1, 2
    ),
    corpus AS (SELECT tok, CAST(sum(c) AS BIGINT) AS cc FROM per GROUP BY 1),
    nl AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_l FROM per GROUP BY 1),
    ntot AS (SELECT CAST(sum(cc) AS BIGINT) AS n_tot FROM corpus),
    g AS (
      SELECT per.lang, per.tok, per.c, corpus.cc, nl.n_l, ntot.n_tot,
             corpus.cc - per.c AS c_rest, ntot.n_tot - nl.n_l AS n_rest
      FROM per JOIN corpus USING (tok) JOIN nl USING (lang) CROSS JOIN ntot
    ),
    scored AS (
      SELECT lang, tok, c,
             (ln((CAST(c AS DOUBLE)
                  + 1000.0 * CAST(cc AS DOUBLE) / CAST(n_tot AS DOUBLE))
                 / (CAST(n_l AS DOUBLE) + 1000.0
                    - (CAST(c AS DOUBLE)
                       + 1000.0 * CAST(cc AS DOUBLE) / CAST(n_tot AS DOUBLE))))
              - ln((CAST(c_rest AS DOUBLE)
                    + 1000.0 * CAST(cc AS DOUBLE) / CAST(n_tot AS DOUBLE))
                   / (CAST(n_rest AS DOUBLE) + 1000.0
                      - (CAST(c_rest AS DOUBLE)
                         + 1000.0 * CAST(cc AS DOUBLE) / CAST(n_tot AS DOUBLE)))))
             / sqrt(1.0 / (CAST(c AS DOUBLE)
                           + 1000.0 * CAST(cc AS DOUBLE) / CAST(n_tot AS DOUBLE))
                    + 1.0 / (CAST(c_rest AS DOUBLE)
                             + 1000.0 * CAST(cc AS DOUBLE) / CAST(n_tot AS DOUBLE)))
               AS z
      FROM g
    ),
    ranked AS (
      SELECT lang, tok, c, z,
             row_number() OVER (PARTITION BY lang ORDER BY z DESC, tok) AS rank
      FROM scored
    )
    SELECT lang, CAST(rank AS INT) AS rank, tok, CAST(c AS BIGINT) AS c,
           round(z, 9) AS log_odds_z
    FROM ranked WHERE rank <= 10 ORDER BY lang, rank
"""


# ---------------------------------------------------------------------------
# round-4 continuation batch ee: log-rank two-sample survival test,
# rich-club coefficient, Dunning G^2 collocations.
# ---------------------------------------------------------------------------


def _q_log_rank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test between hash-split arms on time-to-second-click
    survival (the inferential companion of km_second_event): at each
    pooled death time, observed vs expected arm-1 deaths under the null,
    with the hypergeometric variance; chi2 = (O-E)^2/V. Risk sets are
    BIGINT; the per-time O-E and V terms are folded in t-order."""
    from pyspark.sql import Window

    ev = _load(spark, sf_dir, "events").where(F.col("event_type") == "click")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    seq = (
        ev.select("user_id", us.alias("us"), "event_id")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
    )
    horizon = _load(spark, sf_dir, "events").select(
        F.max(
            F.expr(
                "timestampdiff(MICROSECOND,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            )
        ).alias("us_max")
    )
    arm = F.pmod(
        F.xxhash64(F.concat(F.col("user_id").cast("string"), F.lit("#lr"))),
        F.lit(2),
    )
    per_user = (
        seq.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("rn") == 1, F.col("us"))).alias("us1"),
            F.min(F.when(F.col("rn") == 2, F.col("us"))).alias("us2"),
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            arm.alias("arm"),
            F.when(
                F.col("us2").isNotNull(),
                F.expr("(us2 - us1) div 86400000000") + 1,
            )
            .otherwise(F.expr("(us_max - us1) div 86400000000") + 1)
            .alias("t"),
            F.col("us2").isNotNull().cast("int").alias("d"),
        )
    )
    byt = per_user.groupBy("arm", "t").agg(
        F.sum("d").alias("_d"), F.count("*").alias("_all")
    )
    times = byt.select("t").distinct()
    arms = byt.select("arm").distinct()
    grid = times.crossJoin(F.broadcast(arms))
    g = grid.join(byt, ["arm", "t"], "left").select(
        "arm",
        "t",
        F.coalesce(F.col("_d"), F.lit(0)).alias("d"),
        F.coalesce(F.col("_all"), F.lit(0)).alias("c"),
    )
    wa = Window.partitionBy("arm").orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wf = Window.partitionBy("arm")
    risk = g.select(
        "arm",
        "t",
        "d",
        (F.sum("c").over(wf) - F.sum("c").over(wa) + F.col("c")).alias("n"),
    )
    p = (
        risk.groupBy("t")
        .agg(
            F.sum(F.when(F.col("arm") == 1, F.col("d"))).alias("d1"),
            F.sum(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
            F.sum("d").alias("dt"),
            F.sum("n").alias("nt"),
        )
        .where(F.col("dt") > 0)
    )
    nt = F.col("nt").cast("double")
    n1 = F.col("n1").cast("double")
    dt = F.col("dt").cast("double")
    e1 = dt * n1 / nt
    v1 = F.when(
        F.col("nt") > 1,
        dt * (n1 / nt) * (1.0 - n1 / nt) * (nt - dt) / (nt - 1.0),
    ).otherwise(F.lit(0.0))
    terms = p.select(
        "t",
        F.col("d1").cast("double").alias("o1"),
        e1.alias("e1"),
        v1.alias("v1"),
    )
    folded = terms.agg(
        F.sum("o1").cast("long").alias("_o1i"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("t", "e1"))),
            F.lit(0.0),
            lambda acc, x: acc + x["e1"],
        ).alias("_e1"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("t", "v1"))),
            F.lit(0.0),
            lambda acc, x: acc + x["v1"],
        ).alias("_v"),
    )
    chi2 = F.when(
        F.col("_v") > 0,
        (F.col("_o1i").cast("double") - F.col("_e1"))
        * (F.col("_o1i").cast("double") - F.col("_e1"))
        / F.col("_v"),
    )
    return folded.select(
        F.col("_o1i").alias("observed_arm1"),
        F.round("_e1", 9).alias("expected_arm1"),
        F.round("_v", 9).alias("variance"),
        F.round(chi2, 9).alias("logrank_chi2"),
    )


def _log_rank_oracle_sql() -> str:
    from gos2_spark.pipeline.duckdb_oracles import xxh64_list_sql

    salted = "[CAST(user_id AS VARCHAR) || '#lr']"
    h = f"CAST((({xxh64_list_sql(salted)})[1] % 2 + 2) % 2 AS BIGINT)"
    return f"""
        WITH ev AS (
          SELECT user_id, event_id,
                 epoch_us(ts - TIMESTAMP '1970-01-01 00:00:00') AS us
          FROM events WHERE event_type = 'click'
        ),
        seq AS (
          SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY us, event_id) AS rn
          FROM ev
        ),
        h AS (SELECT max(epoch_us(ts - TIMESTAMP '1970-01-01 00:00:00'))
                       AS us_max FROM events),
        per_user0 AS (
          SELECT seq.user_id,
                 min(CASE WHEN rn = 1 THEN us END) AS us1,
                 min(CASE WHEN rn = 2 THEN us END) AS us2,
                 max(hh.us_max) AS us_max
          FROM seq CROSS JOIN h hh
          WHERE rn <= 2 GROUP BY seq.user_id
        ),
        per_user AS (
          SELECT {h} AS arm,
                 CASE WHEN us2 IS NOT NULL
                      THEN (us2 - us1) // 86400000000 + 1
                      ELSE (us_max - us1) // 86400000000 + 1 END AS t,
                 CASE WHEN us2 IS NOT NULL THEN 1 ELSE 0 END AS d
          FROM per_user0
        ),
        byt AS (
          SELECT arm, t, sum(d) AS d, count(*) AS c
          FROM per_user GROUP BY 1, 2
        ),
        grid AS (
          SELECT t, arm FROM (SELECT DISTINCT t FROM byt)
          CROSS JOIN (SELECT DISTINCT arm FROM byt)
        ),
        g AS (
          SELECT grid.arm, grid.t,
                 coalesce(byt.d, 0) AS d, coalesce(byt.c, 0) AS c
          FROM grid LEFT JOIN byt ON byt.arm = grid.arm AND byt.t = grid.t
        ),
        risk AS (
          SELECT arm, t, d,
                 sum(c) OVER (PARTITION BY arm)
                 - sum(c) OVER (PARTITION BY arm ORDER BY t
                                ROWS UNBOUNDED PRECEDING) + c AS n
          FROM g
        ),
        p AS (
          SELECT t,
                 CAST(sum(CASE WHEN arm = 1 THEN d END) AS BIGINT) AS d1,
                 CAST(sum(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n1,
                 CAST(sum(d) AS BIGINT) AS dt,
                 CAST(sum(n) AS BIGINT) AS nt
          FROM risk GROUP BY 1 HAVING sum(d) > 0
        ),
        terms AS (
          SELECT t, CAST(d1 AS DOUBLE) AS o1,
                 CAST(dt AS DOUBLE) * CAST(n1 AS DOUBLE)
                   / CAST(nt AS DOUBLE) AS e1,
                 CASE WHEN nt > 1
                      THEN CAST(dt AS DOUBLE)
                           * (CAST(n1 AS DOUBLE) / CAST(nt AS DOUBLE))
                           * (1.0 - CAST(n1 AS DOUBLE) / CAST(nt AS DOUBLE))
                           * (CAST(nt AS DOUBLE) - CAST(dt AS DOUBLE))
                           / (CAST(nt AS DOUBLE) - 1.0)
                      ELSE 0.0 END AS v1
          FROM p
        ),
        folded AS (
          SELECT CAST(sum(o1) AS BIGINT) AS o1i,
                 list_reduce(list_transform(list_sort(list({{'t': t, 'x': e1}})),
                                            x -> x.x), (a, b) -> a + b) AS e1,
                 list_reduce(list_transform(list_sort(list({{'t': t, 'x': v1}})),
                                            x -> x.x), (a, b) -> a + b) AS v
          FROM terms
        )
        SELECT o1i AS observed_arm1,
               round(0.0 + e1, 9) AS expected_arm1,
               round(0.0 + v, 9) AS variance,
               round(CASE WHEN v > 0
                     THEN (CAST(o1i AS DOUBLE) - (0.0 + e1))
                          * (CAST(o1i AS DOUBLE) - (0.0 + e1)) / (0.0 + v)
                     END, 9) AS logrank_chi2
        FROM folded
    """


def _q_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient phi(k) of the symmetrized two-map graph:
    density among nodes of degree > k, for every k up to the max degree
    - 1 — the elite-interconnection diagnostic. All counts BIGINT via a
    broadcast k-grid; exact."""
    ev = _load(spark, sf_dir, "customer")
    c = F.col("c_custkey")
    directed = (
        ev.select((c % 64).alias("a"), ((c * 7 + 3) % 64).alias("b"))
        .union(ev.select((c % 64).alias("a"), ((c * 11 + 5) % 64).alias("b")))
        .where(F.col("a") != F.col("b"))
    )
    und = (
        directed.select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .union(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    maxk = deg.agg(F.max("deg").alias("m"))
    ks = (
        maxk.select(F.explode(F.sequence(F.lit(0), F.col("m") - 1)).alias("k"))
    )
    nodes_k = (
        F.broadcast(ks)
        .crossJoin(deg)
        .where(F.col("deg") > F.col("k"))
        .groupBy("k")
        .agg(F.count("*").alias("n_nodes"))
    )
    e = und.join(
        deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), "u"
    ).join(deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v")
    edges_k = (
        F.broadcast(ks)
        .crossJoin(e)
        .where((F.col("du") > F.col("k")) & (F.col("dv") > F.col("k")))
        .groupBy("k")
        .agg(F.count("*").alias("n_edges"))
    )
    out = nodes_k.join(edges_k, "k", "left").select(
        "k",
        "n_nodes",
        F.coalesce(F.col("n_edges"), F.lit(0)).alias("n_edges"),
        F.when(
            F.col("n_nodes") >= 2,
            2.0
            * F.coalesce(F.col("n_edges"), F.lit(0)).cast("double")
            / (
                F.col("n_nodes").cast("double")
                * (F.col("n_nodes").cast("double") - 1.0)
            ),
        ).alias("phi"),
    )
    return out.select(
        "k", "n_nodes", "n_edges", F.round("phi", 9).alias("phi")
    ).orderBy("k")


_RICH_CLUB_ORACLE = """
    WITH directed AS (
      SELECT c_custkey % 64 AS a, (c_custkey * 7 + 3) % 64 AS b FROM customer
      UNION ALL
      SELECT c_custkey % 64, (c_custkey * 11 + 5) % 64 FROM customer
    ),
    und AS (
      SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
      FROM directed WHERE a <> b
    ),
    deg AS (
      SELECT node, count(*) AS deg FROM (
        SELECT u AS node FROM und UNION ALL SELECT v FROM und
      ) GROUP BY 1
    ),
    ks AS (
      SELECT unnest(generate_series(0, (SELECT max(deg) FROM deg) - 1)) AS k
    ),
    nodes_k AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n_nodes
      FROM ks, deg WHERE deg > k GROUP BY 1
    ),
    e AS (
      SELECT und.u, und.v, du.deg AS du, dv.deg AS dv
      FROM und JOIN deg du ON du.node = und.u JOIN deg dv ON dv.node = und.v
    ),
    edges_k AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n_edges
      FROM ks, e WHERE du > k AND dv > k GROUP BY 1
    )
    SELECT n.k, n.n_nodes, coalesce(e.n_edges, 0) AS n_edges,
           round(CASE WHEN n.n_nodes >= 2
                 THEN 2.0 * CAST(coalesce(e.n_edges, 0) AS DOUBLE)
                      / (CAST(n.n_nodes AS DOUBLE)
                         * (CAST(n.n_nodes AS DOUBLE) - 1.0)) END, 9) AS phi
    FROM nodes_k n LEFT JOIN edges_k e ON e.k = n.k
    ORDER BY n.k
"""


def _q_dunning_g2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning log-likelihood-ratio (G^2) collocations over adjacent
    token bigrams — the small-count-safe alternative to PMI. Every cell
    of the 2x2 table is BIGINT; G^2 = 2*sum O ln(O/E) is one fixed-order
    per-row expression (no cross-row sums). Ranking uses the raw double
    (correctly-rounded from integer inputs); top-20 with bigram
    tie-break."""
    docs = _load(spark, sf_dir, "documents")
    arr = F.filter(
        F.split(F.lower(F.col("text")), r"[^a-z]+"),
        lambda t: F.length(t) > 0,
    )
    d = docs.select(arr.alias("w")).where(F.size("w") >= 2)
    n = F.size("w")
    bg = d.select(
        F.explode(
            F.arrays_zip(
                F.slice("w", 1, n - 1).alias("w1"),
                F.slice("w", 2, n - 1).alias("w2"),
            )
        ).alias("b")
    ).select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    cab = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    ca = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    cb = bg.groupBy("w2").agg(F.count("*").alias("c2"))
    tot = bg.agg(F.count("*").alias("nn"))
    g = (
        cab.join(ca, "w1")
        .join(cb, "w2")
        .crossJoin(F.broadcast(tot))
        .where(F.col("c12") >= 5)
    )
    o11 = F.col("c12").cast("double")
    o12 = (F.col("c1") - F.col("c12")).cast("double")
    o21 = (F.col("c2") - F.col("c12")).cast("double")
    o22 = (F.col("nn") - F.col("c1") - F.col("c2") + F.col("c12")).cast("double")
    nn = F.col("nn").cast("double")
    r1 = F.col("c1").cast("double")
    r2 = nn - r1
    k1 = F.col("c2").cast("double")
    k2 = nn - k1

    def cell(o, e):
        return F.when(o > 0, 2.0 * o * F.log(o / e)).otherwise(F.lit(0.0))

    g2 = (
        cell(o11, r1 * k1 / nn)
        + cell(o12, r1 * k2 / nn)
        + cell(o21, r2 * k1 / nn)
        + cell(o22, r2 * k2 / nn)
    )
    scored = g.select("w1", "w2", "c12", g2.alias("_g2"))
    return (
        scored.orderBy(F.col("_g2").desc(), "w1", "w2")
        .limit(20)
        .select("w1", "w2", "c12", F.round("_g2", 9).alias("g2"))
    )


_DUNNING_ORACLE = """
    WITH d AS (
      SELECT list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         t -> t <> '') AS w
      FROM documents
    ),
    dd AS (SELECT w FROM d WHERE len(w) >= 2),
    bg AS (
      SELECT w[i] AS w1, w[i + 1] AS w2
      FROM dd, unnest(generate_series(1, len(w) - 1)) AS t(i)
    ),
    cab AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
    ca AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
    cb AS (SELECT w2, count(*) AS c2 FROM bg GROUP BY 1),
    tot AS (SELECT count(*) AS nn FROM bg),
    g AS (
      SELECT cab.w1, cab.w2, cab.c12, ca.c1, cb.c2, tot.nn
      FROM cab JOIN ca USING (w1) JOIN cb USING (w2) CROSS JOIN tot
      WHERE cab.c12 >= 5
    ),
    scored AS (
      SELECT w1, w2, c12,
        (CASE WHEN CAST(c12 AS DOUBLE) > 0
              THEN 2.0 * CAST(c12 AS DOUBLE)
                   * ln(CAST(c12 AS DOUBLE)
                        / (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE)
                           / CAST(nn AS DOUBLE))) ELSE 0.0 END
       + CASE WHEN CAST(c1 - c12 AS DOUBLE) > 0
              THEN 2.0 * CAST(c1 - c12 AS DOUBLE)
                   * ln(CAST(c1 - c12 AS DOUBLE)
                        / (CAST(c1 AS DOUBLE)
                           * (CAST(nn AS DOUBLE) - CAST(c2 AS DOUBLE))
                           / CAST(nn AS DOUBLE))) ELSE 0.0 END
       + CASE WHEN CAST(c2 - c12 AS DOUBLE) > 0
              THEN 2.0 * CAST(c2 - c12 AS DOUBLE)
                   * ln(CAST(c2 - c12 AS DOUBLE)
                        / ((CAST(nn AS DOUBLE) - CAST(c1 AS DOUBLE))
                           * CAST(c2 AS DOUBLE) / CAST(nn AS DOUBLE)))
              ELSE 0.0 END
       + CASE WHEN CAST(nn - c1 - c2 + c12 AS DOUBLE) > 0
              THEN 2.0 * CAST(nn - c1 - c2 + c12 AS DOUBLE)
                   * ln(CAST(nn - c1 - c2 + c12 AS DOUBLE)
                        / ((CAST(nn AS DOUBLE) - CAST(c1 AS DOUBLE))
                           * (CAST(nn AS DOUBLE) - CAST(c2 AS DOUBLE))
                           / CAST(nn AS DOUBLE))) ELSE 0.0 END) AS g2
      FROM g
    )
    SELECT w1, w2, CAST(c12 AS BIGINT) AS c12, round(g2, 9) AS g2
    FROM scored ORDER BY g2 DESC, w1, w2 LIMIT 20
"""


# ---------------------------------------------------------------------------
# round-4 continuation batch ff: resampling statistics — deterministic
# half-sample bootstrap CI, delete-one-block jackknife, Zipf log-log fit.
# ---------------------------------------------------------------------------


def _q_bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic bootstrap CI for the mean event value: 32
    half-sample replicates selected by salted XXH64 parity (replayable,
    resharding-invariant — no RNG), replicate means from BIGINT cent
    sums, CI = 2nd-smallest/2nd-largest replicate mean (a ~94% interval
    at R=32). The R-fold explode is the standard bag-of-little-bootstraps
    cost and is a broadcast literal, not a shuffle."""
    from pyspark.sql import Window

    ev = _load(spark, sf_dir, "events").select(
        "event_id", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    reps = F.array(*[F.lit(r) for r in range(32)])
    t = ev.select(
        "cents",
        F.explode(reps).alias("r"),
        F.col("event_id").cast("string").alias("eid"),
    ).where(
        F.pmod(
            F.xxhash64(
                F.concat(F.col("eid"), F.lit("#b"), F.col("r").cast("string"))
            ),
            F.lit(2),
        )
        == 0
    )
    means = t.groupBy("r").agg(
        (F.sum("cents").cast("double") / F.count("*").cast("double")).alias(
            "_m"
        )
    )
    w = Window.orderBy("_m", "r")
    ranked = means.select(
        "_m", F.row_number().over(w).alias("_rk"), F.count("*").over(Window.partitionBy()).alias("_n")
    )
    full = ev.agg(
        (F.sum("cents").cast("double") / F.count("*").cast("double")).alias(
            "_full"
        )
    )
    agg = ranked.agg(
        F.max("_n").alias("n_reps"),
        F.max(F.when(F.col("_rk") == 2, F.col("_m"))).alias("_lo"),
        F.max(F.when(F.col("_rk") == F.col("_n") - 1, F.col("_m"))).alias("_hi"),
    )
    return agg.crossJoin(F.broadcast(full)).select(
        "n_reps",
        F.round(F.col("_full") / 100.0, 9).alias("mean_value"),
        F.round(F.col("_lo") / 100.0, 9).alias("ci_lo"),
        F.round(F.col("_hi") / 100.0, 9).alias("ci_hi"),
    )


def _bootstrap_oracle_sql() -> str:
    from gos2_spark.pipeline.duckdb_oracles import xxh64_list_sql

    salted = "[CAST(event_id AS VARCHAR) || '#b' || CAST(r AS VARCHAR)]"
    h = f"({xxh64_list_sql(salted)})[1]"
    return f"""
        WITH ev AS (
          SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents
          FROM events
        ),
        t AS (
          SELECT cents, r FROM ev,
               (SELECT unnest(generate_series(0, 31)) AS r)
          WHERE (({h}) % 2 + 2) % 2 = 0
        ),
        means AS (
          SELECT r, CAST(sum(cents) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS m
          FROM t GROUP BY 1
        ),
        ranked AS (
          SELECT m, row_number() OVER (ORDER BY m, r) AS rk,
                 count(*) OVER () AS n
          FROM means
        ),
        agg AS (
          SELECT CAST(max(n) AS BIGINT) AS n_reps,
                 max(CASE WHEN rk = 2 THEN m END) AS lo,
                 max(CASE WHEN rk = n - 1 THEN m END) AS hi
          FROM ranked
        ),
        fullm AS (
          SELECT CAST(sum(cents) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS f
          FROM ev
        )
        SELECT n_reps, round(f / 100.0, 9) AS mean_value,
               round(lo / 100.0, 9) AS ci_lo, round(hi / 100.0, 9) AS ci_hi
        FROM agg CROSS JOIN fullm
    """


def _q_jackknife_nation_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-block jackknife SE for the mean account balance with
    nations as blocks: every leave-one-out mean is an exact rational of
    BIGINT cent sums; the J-term variance is folded in block order.
    The grouped-data uncertainty answer that needs no RNG at all."""
    c = _load(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    blocks = c.groupBy("c_nationkey").agg(
        F.sum("cents").alias("s"), F.count("*").alias("n")
    )
    tot = blocks.agg(
        F.sum("s").alias("st"), F.sum("n").alias("nt"), F.count("*").alias("j")
    )
    g = blocks.crossJoin(F.broadcast(tot))
    loo = (
        (F.col("st") - F.col("s")).cast("double")
        / (F.col("nt") - F.col("n")).cast("double")
    )
    t = g.select("c_nationkey", loo.alias("_loo"), "st", "nt", "j")
    folded = t.groupBy("st", "nt", "j").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("c_nationkey", "_loo"))),
            F.lit(0.0),
            lambda acc, x: acc + x["_loo"],
        ).alias("_sl"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("c_nationkey", "_loo"))),
            F.lit(0.0),
            lambda acc, x: acc + x["_loo"] * x["_loo"],
        ).alias("_sll"),
    )
    j = F.col("j").cast("double")
    var = (
        (j - 1.0)
        / j
        * (F.col("_sll") - F.col("_sl") * F.col("_sl") / j)
    )
    return folded.select(
        F.col("j").alias("n_blocks"),
        F.round(
            F.col("st").cast("double") / F.col("nt").cast("double") / 100.0, 9
        ).alias("mean_value"),
        F.round(F.sqrt(F.greatest(var, F.lit(0.0))) / 100.0, 9).alias(
            "jackknife_se"
        ),
    )


_JACKKNIFE_ORACLE = """
    WITH c AS (
      SELECT c_nationkey, CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      FROM customer
    ),
    blocks AS (
      SELECT c_nationkey, CAST(sum(cents) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM c GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(s) AS BIGINT) AS st, CAST(sum(n) AS BIGINT) AS nt,
             CAST(count(*) AS BIGINT) AS j
      FROM blocks
    ),
    t AS (
      SELECT b.c_nationkey,
             CAST(tot.st - b.s AS DOUBLE) / CAST(tot.nt - b.n AS DOUBLE)
               AS loo,
             tot.st, tot.nt, tot.j
      FROM blocks b CROSS JOIN tot
    ),
    folded AS (
      SELECT st, nt, j,
             list_reduce(list_transform(
               list_sort(list({'k': c_nationkey, 'v': loo})), x -> x.v),
               (a, b) -> a + b) AS sl,
             list_reduce(list_transform(
               list_sort(list({'k': c_nationkey, 'v': loo})), x -> x.v * x.v),
               (a, b) -> a + b) AS sll
      FROM t GROUP BY 1, 2, 3
    )
    SELECT j AS n_blocks,
           round(CAST(st AS DOUBLE) / CAST(nt AS DOUBLE) / 100.0, 9)
             AS mean_value,
           round(sqrt(greatest(
                 (CAST(j AS DOUBLE) - 1.0) / CAST(j AS DOUBLE)
                 * ((0.0 + sll) - (0.0 + sl) * (0.0 + sl)
                    / CAST(j AS DOUBLE)), 0.0)) / 100.0, 9) AS jackknife_se
    FROM folded
"""


def _q_zipf_slope_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf power-law fit: OLS of ln(count) on ln(rank) over the top-50
    corpus tokens (the zipf_top_tokens table) — slope ~ -1 is Zipf's
    law. The 50 (x, y) pairs fold in rank order; counts/ranks are exact
    integers underneath."""
    from gos2_spark.pipeline.text import zipf_top_tokens

    docs = _load(spark, sf_dir, "documents")
    top = zipf_top_tokens(docs, top_k=50).select(
        "rank",
        F.log(F.col("rank").cast("double")).alias("_x"),
        F.log(F.col("n_occurrences").cast("double")).alias("_y"),
    )
    folded = top.agg(
        F.count("*").alias("n_points"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("rank", "_x"))),
            F.lit(0.0),
            lambda a, x: a + x["_x"],
        ).alias("_sx"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("rank", "_y"))),
            F.lit(0.0),
            lambda a, x: a + x["_y"],
        ).alias("_sy"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("rank", "_x"))),
            F.lit(0.0),
            lambda a, x: a + x["_x"] * x["_x"],
        ).alias("_sxx"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("rank", "_x", "_y"))),
            F.lit(0.0),
            lambda a, x: a + x["_x"] * x["_y"],
        ).alias("_sxy"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("rank", "_y"))),
            F.lit(0.0),
            lambda a, x: a + x["_y"] * x["_y"],
        ).alias("_syy"),
    )
    n = F.col("n_points").cast("double")
    sx, sy = F.col("_sx"), F.col("_sy")
    sxx, sxy, syy = F.col("_sxx"), F.col("_sxy"), F.col("_syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r2 = (
        (n * sxy - sx * sy)
        * (n * sxy - sx * sy)
        / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    )
    return folded.select(
        "n_points",
        F.round(slope, 9).alias("zipf_slope"),
        F.round(intercept, 9).alias("zipf_intercept"),
        F.round(r2, 9).alias("r2"),
    )


_ZIPF_FIT_ORACLE = """
    WITH toks AS (
      SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS token
      FROM documents
    ),
    counts AS (
      SELECT token, count(*) AS n_occurrences
      FROM toks WHERE token <> '' GROUP BY token
    ),
    ranked AS (
      SELECT token, n_occurrences,
             row_number() OVER (ORDER BY n_occurrences DESC, token) AS rank
      FROM counts
    ),
    top AS (
      SELECT rank, ln(CAST(rank AS DOUBLE)) AS x,
             ln(CAST(n_occurrences AS DOUBLE)) AS y
      FROM ranked WHERE rank <= 50
    ),
    folded AS (
      SELECT CAST(count(*) AS BIGINT) AS n_points,
             list_reduce(list_transform(list_sort(list({'r': rank, 'v': x})),
                                        q -> q.v), (a, b) -> a + b) AS sx,
             list_reduce(list_transform(list_sort(list({'r': rank, 'v': y})),
                                        q -> q.v), (a, b) -> a + b) AS sy,
             list_reduce(list_transform(list_sort(list({'r': rank, 'v': x})),
                                        q -> q.v * q.v), (a, b) -> a + b)
               AS sxx,
             list_reduce(list_transform(
                 list_sort(list({'r': rank, 'a': x, 'b': y})),
                 q -> q.a * q.b), (a, b) -> a + b) AS sxy,
             list_reduce(list_transform(list_sort(list({'r': rank, 'v': y})),
                                        q -> q.v * q.v), (a, b) -> a + b)
               AS syy
      FROM top
    )
    SELECT n_points,
           round((CAST(n_points AS DOUBLE) * (0.0 + sxy)
                  - (0.0 + sx) * (0.0 + sy))
                 / (CAST(n_points AS DOUBLE) * (0.0 + sxx)
                    - (0.0 + sx) * (0.0 + sx)), 9) AS zipf_slope,
           round(((0.0 + sy)
                  - ((CAST(n_points AS DOUBLE) * (0.0 + sxy)
                      - (0.0 + sx) * (0.0 + sy))
                     / (CAST(n_points AS DOUBLE) * (0.0 + sxx)
                        - (0.0 + sx) * (0.0 + sx))) * (0.0 + sx))
                 / CAST(n_points AS DOUBLE), 9) AS zipf_intercept,
           round((CAST(n_points AS DOUBLE) * (0.0 + sxy)
                  - (0.0 + sx) * (0.0 + sy))
                 * (CAST(n_points AS DOUBLE) * (0.0 + sxy)
                    - (0.0 + sx) * (0.0 + sy))
                 / ((CAST(n_points AS DOUBLE) * (0.0 + sxx)
                     - (0.0 + sx) * (0.0 + sx))
                    * (CAST(n_points AS DOUBLE) * (0.0 + syy)
                       - (0.0 + sy) * (0.0 + sy))), 9) AS r2
    FROM folded
"""


# ---------------------------------------------------------------------------
# round-4 continuation batch gg: classical inference — one-way ANOVA,
# Brown-Forsythe (median) Levene test, Wald-Wolfowitz runs test,
# Durbin-Watson autocorrelation. Money/counts ride as exact integers; the
# only folds are tiny per-group term sums in fixed order.
# ---------------------------------------------------------------------------


def _anova_from_cents(t: DataFrame, val_col: str) -> DataFrame:
    """Shared one-way-ANOVA tail: input (g, <val_col>) with INTEGER
    values; F from BIGINT sufficient statistics, the k per-group
    S_g^2/n_g terms folded in group order."""
    per = t.groupBy("g").agg(
        F.count("*").alias("n"),
        F.sum(val_col).alias("s"),
        F.sum(F.col(val_col) * F.col(val_col)).alias("ss"),
    )
    term = F.col("s").cast("double") * F.col("s").cast("double") / F.col(
        "n"
    ).cast("double")
    folded = per.agg(
        F.count("*").alias("k"),
        F.sum("n").alias("n_total"),
        F.sum("s").alias("_st"),
        F.sum("ss").alias("_sst"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("g", term.alias("t")))),
            F.lit(0.0),
            lambda a, x: a + x["t"],
        ).alias("_sb"),
    )
    n = F.col("n_total").cast("double")
    k = F.col("k").cast("double")
    grand = F.col("_st").cast("double") * F.col("_st").cast("double") / n
    ssb = F.col("_sb") - grand
    ssw = F.col("_sst").cast("double") - F.col("_sb")
    fstat = F.when(
        (F.col("k") > 1) & (ssw > 0),
        (ssb / (k - 1.0)) / (ssw / (n - k)),
    )
    return folded.select(
        F.col("k").alias("k_groups"),
        "n_total",
        F.round(ssb, 6).alias("ss_between"),
        F.round(ssw, 6).alias("ss_within"),
        F.round(fstat, 9).alias("f_stat"),
    )


def _q_anova_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of event value (exact cents) across the five event
    types — do the types' mean values differ? All sufficient statistics
    BIGINT; the five between-group terms folded in type order."""
    ev = _load(spark, sf_dir, "events")
    t = ev.select(
        F.col("event_type").alias("g"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    return _anova_from_cents(t, "v")


_ANOVA_TAIL_SQL = """
    per AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS s,
             CAST(sum(v * v) AS BIGINT) AS ss
      FROM t GROUP BY 1
    ),
    folded AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n) AS BIGINT) AS n_total,
             CAST(sum(s) AS BIGINT) AS st,
             CAST(sum(ss) AS BIGINT) AS sst,
             list_reduce(list_transform(
               list_sort(list({'g': g,
                               't': CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                    / CAST(n AS DOUBLE)})),
               q -> q.t), (a, b) -> a + b) AS sb
      FROM per
    )
    SELECT k AS k_groups, n_total,
           round((0.0 + sb) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
                 / CAST(n_total AS DOUBLE), 6) AS ss_between,
           round(CAST(sst AS DOUBLE) - (0.0 + sb), 6) AS ss_within,
           round(CASE WHEN k > 1 AND CAST(sst AS DOUBLE) - (0.0 + sb) > 0
                 THEN (((0.0 + sb) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
                        / CAST(n_total AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0))
                      / ((CAST(sst AS DOUBLE) - (0.0 + sb))
                         / (CAST(n_total AS DOUBLE) - CAST(k AS DOUBLE)))
                 END, 9) AS f_stat
    FROM folded
"""

_ANOVA_ORACLE = f"""
    WITH t AS (
      SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS v
      FROM events
    ),
    {_ANOVA_TAIL_SQL}
"""


def _q_levene_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe Levene test (variance homogeneity across event
    types): ANOVA on |cents - per-type lower-median| — the median keeps
    the deviations EXACT INTEGERS, so the whole test is the same
    BIGINT machinery as anova_values."""
    from pyspark.sql import Window

    ev = _load(spark, sf_dir, "events")
    e = ev.select(
        F.col("event_type").alias("g"),
        F.round(F.col("value") * 100).cast("long").alias("c"),
        "event_id",
    )
    w = Window.partitionBy("g").orderBy("c", "event_id")
    wf = Window.partitionBy("g")
    t0 = e.select(
        "g",
        "c",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wf).alias("n"),
    )
    med = t0.groupBy("g").agg(
        F.max(
            F.when(F.col("rn") == F.floor((F.col("n") + 1) / 2), F.col("c"))
        ).alias("m")
    )
    t = e.join(med, "g").select("g", F.abs(F.col("c") - F.col("m")).alias("v"))
    return _anova_from_cents(t, "v")


_LEVENE_ORACLE = f"""
    WITH e AS (
      SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS c,
             event_id
      FROM events
    ),
    t0 AS (
      SELECT g, c,
             row_number() OVER (PARTITION BY g ORDER BY c, event_id) AS rn,
             count(*) OVER (PARTITION BY g) AS n
      FROM e
    ),
    med AS (
      SELECT g, CAST(max(CASE WHEN rn = (n + 1) // 2 THEN c END) AS BIGINT)
               AS m
      FROM t0 GROUP BY 1
    ),
    t AS (
      SELECT e.g, abs(e.c - med.m) AS v FROM e JOIN med ON med.g = e.g
    ),
    {_ANOVA_TAIL_SQL}
"""


def _q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test per event type on the daily count series
    vs its lower median (ties dropped, the standard convention): too few
    runs = trending, too many = oscillating. Runs/N1/N2 are exact
    integers; z is one fixed-order float expression."""
    from pyspark.sql import Window

    daily = _r4o_daily(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("n", "day")
    wf = Window.partitionBy("event_type")
    t0 = daily.select(
        "event_type",
        "day",
        "n",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wf).alias("cnt"),
    )
    med = t0.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rn") == F.floor((F.col("cnt") + 1) / 2), F.col("n"))
        ).alias("m")
    )
    s = (
        daily.join(med, "event_type")
        .where(F.col("n") != F.col("m"))
        .select(
            "event_type", "day", (F.col("n") > F.col("m")).cast("int").alias("a")
        )
    )
    wd = Window.partitionBy("event_type").orderBy("day")
    r = s.select(
        "event_type",
        "a",
        (F.lag("a").over(wd).isNull() | (F.lag("a").over(wd) != F.col("a")))
        .cast("long")
        .alias("new_run"),
    )
    agg = r.groupBy("event_type").agg(
        F.sum("new_run").alias("runs"),
        F.sum("a").alias("n1"),
        F.sum(1 - F.col("a")).alias("n2"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1.0
    sig2 = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))
    )
    z = F.when(sig2 > 0, (F.col("runs").cast("double") - mu) / F.sqrt(sig2))
    return agg.select(
        "event_type", "runs", "n1", "n2", F.round(z, 9).alias("runs_z")
    ).orderBy("event_type")


_RUNS_ORACLE = f"""
    WITH daily AS ({_R4O_DAILY_SQL}),
    t0 AS (
      SELECT event_type, day, n,
             row_number() OVER (PARTITION BY event_type ORDER BY n, day) AS rn,
             count(*) OVER (PARTITION BY event_type) AS cnt
      FROM daily
    ),
    med AS (
      SELECT event_type,
             max(CASE WHEN rn = (cnt + 1) // 2 THEN n END) AS m
      FROM t0 GROUP BY 1
    ),
    s AS (
      SELECT d.event_type, d.day,
             CASE WHEN d.n > med.m THEN 1 ELSE 0 END AS a
      FROM daily d JOIN med ON med.event_type = d.event_type
      WHERE d.n <> med.m
    ),
    r AS (
      SELECT event_type, a,
             CASE WHEN lag(a) OVER w IS NULL OR lag(a) OVER w <> a
                  THEN 1 ELSE 0 END AS new_run
      FROM s WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    agg AS (
      SELECT event_type, CAST(sum(new_run) AS BIGINT) AS runs,
             CAST(sum(a) AS BIGINT) AS n1,
             CAST(sum(1 - a) AS BIGINT) AS n2
      FROM r GROUP BY 1
    )
    SELECT event_type, runs, n1, n2,
           round(CASE WHEN 2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                       * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                          - CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE))
                       / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                          * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                          * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0)) > 0
                 THEN (CAST(runs AS DOUBLE)
                       - (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                          / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0))
                      / sqrt(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                             * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                                - CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE))
                             / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                                * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                                * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)
                                   - 1.0)))
                 END, 9) AS runs_z
    FROM agg ORDER BY event_type
"""


def _q_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson autocorrelation of the residuals of each type's
    daily-count linear trend (y = a + b*day, both from BIGINT normal
    equations): DW ~ 2 = no autocorrelation, -> 0 positive. Residuals
    are exact-rational doubles; the two residual sums fold in day
    order."""
    from pyspark.sql import Window

    daily = _r4o_daily(spark, sf_dir)
    s = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("day").alias("sx"),
        F.sum(F.col("day") * F.col("day")).alias("sxx"),
        F.sum("n").alias("sy"),
        F.sum(F.col("day") * F.col("n")).alias("sxy"),
    )
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    b = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / den
    a = (F.col("sy").cast("double") - b * F.col("sx").cast("double")) / F.col(
        "n"
    ).cast("double")
    j = daily.join(
        s.select("event_type", b.alias("_b"), a.alias("_a")), "event_type"
    )
    resid = F.col("n").cast("double") - (
        F.col("_a") + F.col("_b") * F.col("day").cast("double")
    )
    wd = Window.partitionBy("event_type").orderBy("day")
    t = j.select(
        "event_type",
        "day",
        resid.alias("e"),
        (resid - F.lag(resid).over(wd)).alias("de"),
    )
    folded = t.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("day", F.col("e").alias("v")))),
            F.lit(0.0),
            lambda acc, x: acc + x["v"] * x["v"],
        ).alias("_see"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("de").isNotNull(), F.struct("day", F.col("de").alias("v")))
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["v"] * x["v"],
        ).alias("_sdd"),
    )
    dw = F.when(F.col("_see") > 0, F.col("_sdd") / F.col("_see"))
    return folded.select(
        "event_type", "n_days", F.round(dw, 9).alias("durbin_watson")
    ).orderBy("event_type")


_DW_ORACLE = f"""
    WITH daily AS ({_R4O_DAILY_SQL}),
    s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(day) AS BIGINT) AS sx,
             CAST(sum(day * day) AS BIGINT) AS sxx,
             CAST(sum(n) AS BIGINT) AS sy,
             CAST(sum(day * n) AS BIGINT) AS sxy
      FROM daily GROUP BY 1
    ),
    ab AS (
      SELECT event_type,
             CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) AS b,
             (CAST(sy AS DOUBLE)
              - CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) AS a
      FROM s
    ),
    t AS (
      SELECT d.event_type, d.day,
             CAST(d.n AS DOUBLE) - (ab.a + ab.b * CAST(d.day AS DOUBLE)) AS e
      FROM daily d JOIN ab ON ab.event_type = d.event_type
    ),
    t2 AS (
      SELECT event_type, day, e, e - lag(e) OVER w AS de
      FROM t WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    folded AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             list_reduce(list_transform(
               list_sort(list({{'d': day, 'v': e}})), q -> q.v * q.v),
               (a, b) -> a + b) AS see,
             list_reduce(list_transform(
               list_sort(list({{'d': day, 'v': de}})
                         FILTER (WHERE de IS NOT NULL)),
               q -> q.v * q.v), (a, b) -> a + b) AS sdd
      FROM t2 GROUP BY 1
    )
    SELECT event_type, n_days,
           round(CASE WHEN see > 0 THEN (0.0 + sdd) / (0.0 + see) END, 9)
             AS durbin_watson
    FROM folded ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# round-4 continuation batch hh: quadkey pyramid rollup, directional
# (anisotropic) variogram, fixed-window crawl rate limiter.
# ---------------------------------------------------------------------------


def _q_quadkey_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-Mercator quadkey pyramid: point counts at z=5 rolled up to
    every ancestor zoom 1..5 by quadkey PREFIX (the string form of the
    parent-bit arithmetic cell_pyramid does on S2 ids). Pure codegen;
    counts exact."""
    from gos2_spark.spark.webmercator import wm_quadkey, wm_tile_x, wm_tile_y

    z = 5
    pts = _cust_points(spark, sf_dir)
    base = pts.select(
        wm_tile_x(F.col("lng"), z).alias("xt"),
        wm_tile_y(F.col("lat"), z).alias("yt"),
    ).withColumn("qk", wm_quadkey("xt", "yt", z))
    levels = F.explode(F.sequence(F.lit(1), F.lit(z))).alias("zoom")
    return (
        base.select("qk", levels)
        .select("zoom", F.col("qk").substr(F.lit(1), F.col("zoom")).alias("quadkey"))
        .groupBy("zoom", "quadkey")
        .agg(F.count("*").alias("n_points"))
        .orderBy("zoom", "quadkey")
    )


def _quadkey_pyramid_oracle_sql() -> str:
    # reuse the committed z=5 quadkey construction from the
    # webmercator_tiles oracle by rebuilding it inline
    return f"""
        WITH pts AS ({_CUST_LATLNG_SQL}),
        t0 AS (
          SELECT CAST(floor((lng + 180.0) / 360.0 * 32) AS BIGINT) AS x0,
                 CAST(floor((1.0 - ln(tan(radians(lat))
                             + 1.0 / cos(radians(lat))) / 3.141592653589793)
                            / 2.0 * 32) AS BIGINT) AS y0
          FROM pts
        ),
        t AS (
          SELECT greatest(0, least(31, x0)) AS xt,
                 greatest(0, least(31, y0)) AS yt
          FROM t0
        ),
        qk AS (
          SELECT array_to_string(list_transform(
                     generate_series(5, 1, -1),
                     i -> CAST((xt >> (i - 1)) % 2
                               + 2 * ((yt >> (i - 1)) % 2) AS VARCHAR)),
                     '') AS qk
          FROM t
        ),
        lv AS (SELECT unnest(generate_series(1, 5)) AS zoom)
        SELECT zoom, substr(qk, 1, CAST(zoom AS INT)) AS quadkey,
               CAST(count(*) AS BIGINT) AS n_points
        FROM qk CROSS JOIN lv
        GROUP BY 1, 2 ORDER BY 1, 2
    """


def _q_directional_variogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anisotropic semivariogram: gamma(h) split by axis sector (NS when
    |dlat| > |dlng| else EW) over the cell-blocked within-radius join —
    detects direction-dependent spatial correlation the isotropic
    semivariogram_bins averages away. Field and squared-diff sums are
    exact BIGINTs; the brute oracle certifies both binning and recall."""
    from gos2_spark.spark.joins import distance_join

    pts = _cust_points(spark, sf_dir).withColumn(
        "z", (3 * F.floor("lat") + F.floor("lng")).cast("long")
    )
    pairs = distance_join(pts, 5.0, point_key="key")
    a = pts.select(
        F.col("key").alias("key_a"),
        F.col("lat").alias("lat_a"),
        F.col("lng").alias("lng_a"),
        F.col("z").alias("za"),
    )
    b = pts.select(
        F.col("key").alias("key_b"),
        F.col("lat").alias("lat_b"),
        F.col("lng").alias("lng_b"),
        F.col("z").alias("zb"),
    )
    j = pairs.join(a, "key_a").join(b, "key_b")
    sector = F.when(
        F.abs(F.col("lat_a") - F.col("lat_b"))
        > F.abs(F.col("lng_a") - F.col("lng_b")),
        F.lit("ns"),
    ).otherwise(F.lit("ew"))
    bin_ = F.floor(F.degrees(F.col("dist_rad")))
    d2 = (F.col("za") - F.col("zb")) * (F.col("za") - F.col("zb"))
    out = (
        j.select(sector.alias("sector"), bin_.alias("bin"), d2.alias("d2"))
        .groupBy("sector", "bin")
        .agg(F.count("*").alias("n_pairs"), F.sum("d2").alias("_sd2"))
    )
    return out.select(
        "sector",
        "bin",
        "n_pairs",
        F.round(
            F.col("_sd2").cast("double")
            / (2.0 * F.col("n_pairs").cast("double")),
            9,
        ).alias("gamma"),
    ).orderBy("sector", "bin")


_DIRVARIO_ORACLE = f"""
    WITH pts AS ({_CUST_LATLNG_SQL}),
    p AS (
      SELECT key, lat, lng,
             CAST(3 * floor(lat) + floor(lng) AS BIGINT) AS z,
             cos(radians(lng)) * cos(radians(lat)) AS x,
             sin(radians(lng)) * cos(radians(lat)) AS y,
             sin(radians(lat)) AS zz
      FROM pts
    ),
    pairs AS (
      SELECT a.key AS key_a, a.lat AS lat_a, a.lng AS lng_a, a.z AS za,
             b.lat AS lat_b, b.lng AS lng_b, b.z AS zb,
             atan2(sqrt(
                 (a.y * b.zz - a.zz * b.y) * (a.y * b.zz - a.zz * b.y)
               + (a.zz * b.x - a.x * b.zz) * (a.zz * b.x - a.x * b.zz)
               + (a.x * b.y - a.y * b.x) * (a.x * b.y - a.y * b.x)),
               a.x * b.x + a.y * b.y + a.zz * b.zz) AS d
      FROM p a JOIN p b ON a.key < b.key
    ),
    filt AS (SELECT * FROM pairs WHERE d <= {math.radians(5.0)!r}),
    lab AS (
      SELECT CASE WHEN abs(lat_a - lat_b) > abs(lng_a - lng_b)
                  THEN 'ns' ELSE 'ew' END AS sector,
             CAST(floor(degrees(d)) AS BIGINT) AS bin,
             (za - zb) * (za - zb) AS d2
      FROM filt
    )
    SELECT sector, bin, CAST(count(*) AS BIGINT) AS n_pairs,
           round(CAST(sum(d2) AS DOUBLE)
                 / (2.0 * CAST(count(*) AS DOUBLE)), 9) AS gamma
    FROM lab GROUP BY 1, 2 ORDER BY 1, 2
"""


def _q_rate_limit_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window politeness rate limiter audit per crawl host (host =
    user_id mod 20, limit 3 requests / 10 s window): how many requests a
    per-host limiter would have throttled, and the peak window load —
    the crawl-frontier pacing readout. All BIGINT."""
    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    t = ev.select(
        F.concat(F.lit("site"), (F.col("user_id") % 20).cast("string")).alias(
            "host"
        ),
        F.expr(
            "timestampdiff(MICROSECOND,"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 10000000"
        ).alias("w"),
    )
    per = t.groupBy("host", "w").agg(F.count("*").alias("c"))
    return (
        per.groupBy("host")
        .agg(
            F.sum("c").alias("n_requests"),
            F.count("*").alias("n_windows"),
            F.sum(F.greatest(F.col("c") - 3, F.lit(0))).alias("n_throttled"),
            F.max("c").alias("max_window_load"),
        )
        .orderBy("host")
    )


_RATE_LIMIT_ORACLE = """
    WITH t AS (
      SELECT 'site' || CAST(user_id % 20 AS VARCHAR) AS host,
             epoch_us(ts - TIMESTAMP '1970-01-01 00:00:00') // 10000000 AS w
      FROM events
    ),
    per AS (SELECT host, w, count(*) AS c FROM t GROUP BY 1, 2)
    SELECT host,
           CAST(sum(c) AS BIGINT) AS n_requests,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(greatest(c - 3, 0)) AS BIGINT) AS n_throttled,
           CAST(max(c) AS BIGINT) AS max_window_load
    FROM per GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# round-4 continuation batch ii: categorical assortativity (Newman),
# peaks-over-threshold GPD tail fit, grid percolation (giant component of
# the occupied-cell adjacency graph).
# ---------------------------------------------------------------------------


def _q_modularity_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman categorical assortativity of the two-map graph with node
    category = node mod 5: r = (sum e_ii - sum a_i b_i) / (1 - sum a_i
    b_i) over the directed-edge mixing matrix — all BIGINT counts, the
    5 marginal products folded in category order."""
    ev = _load(spark, sf_dir, "customer")
    c = F.col("c_custkey")
    edges = (
        ev.select((c % 64).alias("src"), ((c * 7 + 3) % 64).alias("dst"))
        .union(ev.select((c % 64).alias("src"), ((c * 11 + 5) % 64).alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .select(
            (F.col("src") % 5).alias("ca"), (F.col("dst") % 5).alias("cb")
        )
    )
    mix = edges.groupBy("ca", "cb").agg(F.count("*").alias("m"))
    tot = mix.agg(F.sum("m").alias("mt"))
    a = mix.groupBy("ca").agg(F.sum("m").alias("ma"))
    b = mix.groupBy("cb").agg(F.sum("m").alias("mb"))
    diag = mix.where(F.col("ca") == F.col("cb")).agg(
        F.sum("m").alias("mdiag")
    )
    ab = (
        a.join(b, a["ca"] == b["cb"])
        .select(
            F.col("ca").alias("cat"),
            (F.col("ma").cast("double") * F.col("mb").cast("double")).alias(
                "_p"
            ),
        )
    )
    folded = ab.agg(
        F.count("*").alias("k_categories"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("cat", "_p"))),
            F.lit(0.0),
            lambda acc, x: acc + x["_p"],
        ).alias("_sab"),
    )
    j = folded.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(diag))
    m2 = F.col("mt").cast("double") * F.col("mt").cast("double")
    e_ii = F.col("mdiag").cast("double") / F.col("mt").cast("double")
    sab = F.col("_sab") / m2
    r = F.when(sab < 1.0, (e_ii - sab) / (1.0 - sab))
    return j.select(
        "k_categories",
        F.col("mt").alias("n_edges"),
        F.col("mdiag").alias("n_within"),
        F.round(r, 9).alias("assortativity_r"),
    )


_MODULARITY_ORACLE = """
    WITH edges AS (
      SELECT DISTINCT src, dst FROM (
        SELECT c_custkey % 64 AS src, (c_custkey * 7 + 3) % 64 AS dst
        FROM customer
        UNION ALL
        SELECT c_custkey % 64, (c_custkey * 11 + 5) % 64 FROM customer
      ) WHERE src <> dst
    ),
    cats AS (SELECT src % 5 AS ca, dst % 5 AS cb FROM edges),
    mix AS (SELECT ca, cb, CAST(count(*) AS BIGINT) AS m FROM cats GROUP BY 1, 2),
    tot AS (SELECT CAST(sum(m) AS BIGINT) AS mt FROM mix),
    a AS (SELECT ca, CAST(sum(m) AS BIGINT) AS ma FROM mix GROUP BY 1),
    b AS (SELECT cb, CAST(sum(m) AS BIGINT) AS mb FROM mix GROUP BY 1),
    diag AS (SELECT CAST(coalesce(sum(m), 0) AS BIGINT) AS mdiag
             FROM mix WHERE ca = cb),
    ab AS (
      SELECT a.ca AS cat, CAST(ma AS DOUBLE) * CAST(mb AS DOUBLE) AS p
      FROM a JOIN b ON b.cb = a.ca
    ),
    folded AS (
      SELECT CAST(count(*) AS BIGINT) AS k_categories,
             list_reduce(list_transform(list_sort(list({'c': cat, 'p': p})),
                                        q -> q.p), (x, y) -> x + y) AS sab
      FROM ab
    )
    SELECT k_categories, mt AS n_edges, mdiag AS n_within,
           round(CASE WHEN (0.0 + sab) / (CAST(mt AS DOUBLE)
                                          * CAST(mt AS DOUBLE)) < 1.0
                 THEN (CAST(mdiag AS DOUBLE) / CAST(mt AS DOUBLE)
                       - (0.0 + sab) / (CAST(mt AS DOUBLE) * CAST(mt AS DOUBLE)))
                      / (1.0 - (0.0 + sab) / (CAST(mt AS DOUBLE)
                                              * CAST(mt AS DOUBLE)))
                 END, 9) AS assortativity_r
    FROM folded CROSS JOIN tot CROSS JOIN diag
"""


def _q_gpd_tail_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peaks-over-threshold GPD fit (method of moments) per event type:
    threshold = p90 order statistic of cents (deterministic rank), and
    from the BIGINT excess moments  xi = (1 - mean^2/var)/2,
    sigma = mean*(mean^2/var + 1)/2  — the heavy-tail model behind
    extreme-quantile extrapolation; the EVT companion of
    gumbel_weekly_maxima."""
    from pyspark.sql import Window

    ev = _load(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("c"),
        "event_id",
    )
    w = Window.partitionBy("event_type").orderBy("c", "event_id")
    wf = Window.partitionBy("event_type")
    t0 = e.select(
        "event_type",
        "c",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wf).alias("n"),
    )
    thr = t0.groupBy("event_type").agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.9 * F.col("n").cast("double")).cast("long"),
                F.col("c"),
            )
        ).alias("u")
    )
    ex = (
        e.join(thr, "event_type")
        .where(F.col("c") > F.col("u"))
        .select("event_type", "u", (F.col("c") - F.col("u")).alias("x"))
    )
    agg = ex.groupBy("event_type").agg(
        F.max("u").alias("u"),
        F.count("*").alias("n_exceed"),
        F.sum("x").alias("_sx"),
        F.sum(F.col("x") * F.col("x")).alias("_sxx"),
    )
    n = F.col("n_exceed").cast("double")
    mean = F.col("_sx").cast("double") / n
    var = (
        (F.col("n_exceed") * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast(
            "double"
        )
        / (n * (n - 1.0))
    )
    ratio = mean * mean / var
    xi = (1.0 - ratio) / 2.0
    sigma = mean * (ratio + 1.0) / 2.0
    return agg.select(
        "event_type",
        (F.col("u").cast("double") / 100.0).alias("threshold"),
        "n_exceed",
        F.round(xi, 9).alias("gpd_xi"),
        F.round(sigma / 100.0, 9).alias("gpd_sigma"),
    ).orderBy("event_type")


_GPD_ORACLE = """
    WITH e AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c, event_id
      FROM events
    ),
    t0 AS (
      SELECT event_type, c,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY c, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM e
    ),
    thr AS (
      SELECT event_type,
             CAST(max(CASE WHEN rn = CAST(ceil(0.9 * CAST(n AS DOUBLE))
                                          AS BIGINT)
                      THEN c END) AS BIGINT) AS u
      FROM t0 GROUP BY 1
    ),
    ex AS (
      SELECT e.event_type, thr.u, e.c - thr.u AS x
      FROM e JOIN thr ON thr.event_type = e.event_type
      WHERE e.c > thr.u
    ),
    agg AS (
      SELECT event_type, CAST(max(u) AS BIGINT) AS u,
             CAST(count(*) AS BIGINT) AS n_exceed,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM ex GROUP BY 1
    )
    SELECT event_type,
           CAST(u AS DOUBLE) / 100.0 AS threshold,
           n_exceed,
           round((1.0 - (CAST(sx AS DOUBLE) / CAST(n_exceed AS DOUBLE))
                        * (CAST(sx AS DOUBLE) / CAST(n_exceed AS DOUBLE))
                        / (CAST(n_exceed * sxx - sx * sx AS DOUBLE)
                           / (CAST(n_exceed AS DOUBLE)
                              * (CAST(n_exceed AS DOUBLE) - 1.0)))) / 2.0, 9)
             AS gpd_xi,
           round((CAST(sx AS DOUBLE) / CAST(n_exceed AS DOUBLE))
                 * ((CAST(sx AS DOUBLE) / CAST(n_exceed AS DOUBLE))
                    * (CAST(sx AS DOUBLE) / CAST(n_exceed AS DOUBLE))
                    / (CAST(n_exceed * sxx - sx * sx AS DOUBLE)
                       / (CAST(n_exceed AS DOUBLE)
                          * (CAST(n_exceed AS DOUBLE) - 1.0))) + 1.0)
                 / 2.0 / 100.0, 9) AS gpd_sigma
    FROM agg ORDER BY event_type
"""


def _q_grid_percolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid percolation readout: connected components of the OCCUPIED
    level-6 cell adjacency graph (wrap-aware 4-edge neighbors), giant
    component size and fraction — 'does the occupied region percolate?'.
    Components via the verified hash-to-min CC; the oracle resolves the
    same adjacency with a recursive closure over the full EdgeNeighbors
    replay."""
    from gos2_spark.pipeline.graph import connected_components
    from gos2_spark.spark.functions import s2_edge_neighbors
    from gos2_spark.spark.pages import s2_parent_sql

    pts = _cust_points(spark, sf_dir)
    occ = (
        pts.select(s2_parent_sql(F.col("cell_id"), 6).alias("cell"))
        .distinct()
    )
    nb = occ.select(
        F.col("cell").alias("a"),
        F.explode(s2_edge_neighbors(F.col("cell"))).alias("b"),
    )
    edges = nb.join(
        occ.select(F.col("cell").alias("b")), "b"
    ).select("a", "b")
    comps = connected_components(
        occ.select(F.col("cell").alias("key")),
        edges.select(F.col("a").alias("key_a"), F.col("b").alias("key_b")),
    )
    sizes = comps.groupBy("component").agg(F.count("*").alias("sz"))
    agg = sizes.agg(
        F.sum("sz").alias("n_occupied"),
        F.count("*").alias("n_components"),
        F.max("sz").alias("giant_size"),
    )
    return agg.select(
        "n_occupied",
        "n_components",
        "giant_size",
        F.round(
            F.col("giant_size").cast("double")
            / F.col("n_occupied").cast("double"),
            9,
        ).alias("giant_frac"),
    )


def _grid_percolation_oracle_sql() -> str:
    from gos2_spark.pipeline import duckdb_oracles as _DO

    pairs = _DO.edge_neighbors_l8_oracle_sql(
        _cellid_cte_duckdb(_CUST_LATLNG_SQL), level=6
    )
    lsb = 1 << 48
    tok = _DO._token(f"((cell_id & -{lsb}) | {lsb})")
    return f"""
        WITH RECURSIVE nbrs AS ({pairs}),
        {_cellid_cte_duckdb(_CUST_LATLNG_SQL)},
        occ AS (SELECT DISTINCT {tok} AS token FROM cells),
        e0 AS (
          SELECT n.token AS a, n.nbr_token AS b
          FROM nbrs n JOIN occ ON occ.token = n.nbr_token
        ),
        e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
        reach(a, b) AS (
          SELECT token, token FROM occ
          UNION
          SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a
        ),
        comp AS (SELECT a AS token, min(b) AS component FROM reach GROUP BY 1),
        sizes AS (SELECT component, count(*) AS sz FROM comp GROUP BY 1)
        SELECT CAST(sum(sz) AS BIGINT) AS n_occupied,
               CAST(count(*) AS BIGINT) AS n_components,
               CAST(max(sz) AS BIGINT) AS giant_size,
               round(CAST(max(sz) AS DOUBLE) / CAST(sum(sz) AS DOUBLE), 9)
                 AS giant_frac
        FROM sizes
    """


# ---------------------------------------------------------------------------
# round-4 continuation batch jj: NDCG@10 retrieval evaluation, exact
# streaming windowed distinct, Brier calibration of the quality
# classifier (1e-9-grid integer terms, the bm25 snap trick).
# ---------------------------------------------------------------------------


def _q_ndcg_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the BM25 rankings against deterministic graded
    relevance rel = doc_id mod 4: DCG with the standard 2^rel-1 /
    log2(rank+1) discount, IDCG over the ideal reordering OF THE
    RETRIEVED SET (documented convention). Ten terms per query folded in
    rank order; relevance and ranks are exact integers."""
    from pyspark.sql import Window

    ranked = _q_bm25_topk(spark, sf_dir).select(
        "query_id", "rank", "doc_id", (F.col("doc_id") % 4).alias("rel")
    )
    gain = (F.pow(F.lit(2.0), F.col("rel").cast("double")) - 1.0) / F.log2(
        F.col("rank").cast("double") + 1.0
    )
    wi = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), "doc_id"
    )
    ideal = ranked.select(
        "query_id", "rel", F.row_number().over(wi).alias("irank")
    )
    igain = (F.pow(F.lit(2.0), F.col("rel").cast("double")) - 1.0) / F.log2(
        F.col("irank").cast("double") + 1.0
    )
    dcg = ranked.select("query_id", "rank", gain.alias("g")).groupBy(
        "query_id"
    ).agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("rank", "g"))),
            F.lit(0.0),
            lambda a, x: a + x["g"],
        ).alias("_dcg")
    )
    idcg = ideal.select("query_id", "irank", igain.alias("g")).groupBy(
        "query_id"
    ).agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("irank", "g"))),
            F.lit(0.0),
            lambda a, x: a + x["g"],
        ).alias("_idcg")
    )
    return (
        dcg.join(idcg, "query_id")
        .select(
            "query_id",
            F.round("_dcg", 9).alias("dcg"),
            F.round("_idcg", 9).alias("idcg"),
            F.round(
                F.when(F.col("_idcg") > 0, F.col("_dcg") / F.col("_idcg")), 9
            ).alias("ndcg"),
        )
        .orderBy("query_id")
    )


def _ndcg_oracle_sql() -> str:
    inner = _bm25_oracle_sql(10)
    return f"""
        WITH bm AS ({inner}),
        r AS (SELECT query_id, rank, doc_id, doc_id % 4 AS rel FROM bm),
        ideal AS (
          SELECT query_id, rel,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY rel DESC, doc_id) AS irank
          FROM r
        ),
        dcg AS (
          SELECT query_id,
                 list_reduce(list_transform(
                   list_sort(list({{'r': rank,
                                    'g': (pow(2.0, CAST(rel AS DOUBLE)) - 1.0)
                                         / log2(CAST(rank AS DOUBLE) + 1.0)}})),
                   q -> q.g), (a, b) -> a + b) AS dcg
          FROM r GROUP BY 1
        ),
        idcg AS (
          SELECT query_id,
                 list_reduce(list_transform(
                   list_sort(list({{'r': irank,
                                    'g': (pow(2.0, CAST(rel AS DOUBLE)) - 1.0)
                                         / log2(CAST(irank AS DOUBLE) + 1.0)}})),
                   q -> q.g), (a, b) -> a + b) AS idcg
          FROM ideal GROUP BY 1
        )
        SELECT d.query_id, round(0.0 + d.dcg, 9) AS dcg,
               round(0.0 + i.idcg, 9) AS idcg,
               round(CASE WHEN i.idcg > 0
                     THEN (0.0 + d.dcg) / (0.0 + i.idcg) END, 9) AS ndcg
        FROM dcg d JOIN idcg i ON i.query_id = d.query_id
        ORDER BY d.query_id
    """


def _q_streaming_window_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users per tumbling 6h window computed on a REPLAYED
    STREAM (4 parquet micro-batches, stateful dropDuplicates on (user,
    window) — spark/streaming.py::streaming_window_distinct). The batch
    COUNT(DISTINCT) oracle pins every window the stream emits: live ==
    backfill."""
    import shutil
    import tempfile

    from gos2_spark.spark.streaming import (
        run_to_memory,
        streaming_window_distinct,
    )

    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    ev = _load(spark, sf_dir, "events").select(
        "user_id", F.timestamp_micros(us).alias("ts")
    )
    tmp = tempfile.mkdtemp(prefix="gos2_stream_distinct_")
    ev.repartition(4).write.mode("overwrite").parquet(tmp)
    sch = spark.read.parquet(tmp).schema
    stream = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1)
        .parquet(tmp)
    )
    out = streaming_window_distinct(stream, ts_col="ts", key_col="user_id")
    q = run_to_memory(out, name="window_distinct")
    q.processAllAvailable()
    q.stop()
    res = (
        spark.table("window_distinct")
        .orderBy("window_start")
        .cache()
    )
    res.count()
    shutil.rmtree(tmp, ignore_errors=True)
    return res


_STREAM_DISTINCT_ORACLE = """
    SELECT (epoch_us(ts - TIMESTAMP '1970-01-01 00:00:00')
            // 21600000000) * 21600 AS window_start,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_keys
    FROM events GROUP BY 1 ORDER BY 1
"""


def _q_brier_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration audit of the hashed linear quality classifier: Brier
    score of p = sigmoid(score) against the deterministic label
    y = (doc_id mod 3 == 0), per language. Each per-doc squared error
    snaps to a 1e-9 integer grid BEFORE summation (the bm25 trick), so
    the mean is an exact BIGINT ratio — no float-order exposure."""
    from gos2_spark.pipeline.classify import hashed_linear_score

    docs = _load(spark, sf_dir, "documents")
    out = hashed_linear_score(docs, n_features=4096)
    d = docs.select(F.col("doc_id").alias("key"), "lang")
    j = out.join(d, "key").select(
        "key",
        "lang",
        (1.0 / (1.0 + F.exp(-F.col("score")))).alias("p"),
        ((F.col("key") % 3) == 0).cast("int").alias("y"),
    )
    err9 = F.round(
        (F.col("p") - F.col("y").cast("double"))
        * (F.col("p") - F.col("y").cast("double"))
        * 1e9
    ).cast("long")
    agg = j.select("lang", "y", err9.alias("e9")).groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("y").alias("n_positive"),
        F.sum("e9").alias("_se9"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "n_positive",
        F.round(
            F.col("_se9").cast("double") / F.col("n_docs").cast("double") / 1e9,
            9,
        ).alias("brier"),
    ).orderBy("lang")


def _brier_oracle_sql() -> str:
    from gos2_spark.pipeline.duckdb_oracles import classifier_scores_cte_sql

    return f"""
        WITH {classifier_scores_cte_sql(4096)},
        j AS (
          SELECT s.doc_id AS key, s.lang,
                 1.0 / (1.0 + exp(-s.score)) AS p,
                 CASE WHEN s.doc_id % 3 = 0 THEN 1 ELSE 0 END AS y
          FROM s
        ),
        t AS (
          SELECT lang, y,
                 CAST(round((p - CAST(y AS DOUBLE)) * (p - CAST(y AS DOUBLE))
                            * 1e9) AS BIGINT) AS e9
          FROM j
        )
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(y) AS BIGINT) AS n_positive,
               round(CAST(sum(e9) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                     / 1e9, 9) AS brier
        FROM t GROUP BY 1 ORDER BY 1
    """


# ---------------------------------------------------------------------------
# round-4 continuation batch kk: spatial-autocorrelation extensions —
# Moran correlogram by distance band and bivariate Moran's I. Same
# integer-sufficient-statistic discipline as morans_i_cells: every
# accumulated quantity is BIGINT, one fixed-order float per output row.
# ---------------------------------------------------------------------------


def _q_moran_correlogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moran's I per 1-degree distance band up to 5 degrees over the
    deterministic integer field z = 3*floor(lat)+floor(lng) at customer
    points — the correlogram showing how far spatial autocorrelation
    reaches (the I companion of semivariogram_bins' gamma). Pair sums
    per band are BIGINT from the blocked within-radius join; the brute
    oracle certifies banding + recall."""
    from gos2_spark.spark.joins import distance_join

    pts = _cust_points(spark, sf_dir).withColumn(
        "z", (3 * F.floor("lat") + F.floor("lng")).cast("long")
    )
    g = pts.agg(
        F.count("*").alias("n"),
        F.sum("z").alias("sz"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
    )
    pairs = distance_join(pts, 5.0, point_key="key")
    zmap_a = pts.select(F.col("key").alias("key_a"), F.col("z").alias("za"))
    zmap_b = pts.select(F.col("key").alias("key_b"), F.col("z").alias("zb"))
    banded = (
        pairs.join(zmap_a, "key_a")
        .join(zmap_b, "key_b")
        .select(
            F.floor(F.degrees(F.col("dist_rad"))).alias("band"),
            "za",
            "zb",
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("_w2"),
            F.sum(F.col("za") * F.col("zb")).alias("_p"),
            F.sum("za").alias("_sa"),
            F.sum("zb").alias("_sb"),
        )
    )
    j = banded.crossJoin(F.broadcast(g))
    n = F.col("n").cast("double")
    mean = F.col("sz").cast("double") / n
    # symmetric weights: each unordered pair contributes twice
    w = 2.0 * F.col("_w2").cast("double")
    num = 2.0 * (
        F.col("_p").cast("double")
        - mean * (F.col("_sa") + F.col("_sb")).cast("double")
        + F.col("_w2").cast("double") * mean * mean
    )
    den = F.col("szz").cast("double") - n * mean * mean
    i = F.when(den > 0, (n / w) * (num / den))
    return j.select(
        "band",
        (2 * F.col("_w2")).alias("w_pairs"),
        F.round(i, 9).alias("morans_i"),
    ).orderBy("band")


_MORAN_CORR_ORACLE = f"""
    WITH pts AS ({_CUST_LATLNG_SQL}),
    p AS (
      SELECT key, CAST(3 * floor(lat) + floor(lng) AS BIGINT) AS z,
             cos(radians(lng)) * cos(radians(lat)) AS x,
             sin(radians(lng)) * cos(radians(lat)) AS y,
             sin(radians(lat)) AS zz
      FROM pts
    ),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(z) AS BIGINT) AS sz,
             CAST(sum(z * z) AS BIGINT) AS szz
      FROM p
    ),
    pr AS (
      SELECT a.z AS za, b.z AS zb,
             atan2(sqrt(
                 (a.y * b.zz - a.zz * b.y) * (a.y * b.zz - a.zz * b.y)
               + (a.zz * b.x - a.x * b.zz) * (a.zz * b.x - a.x * b.zz)
               + (a.x * b.y - a.y * b.x) * (a.x * b.y - a.y * b.x)),
               a.x * b.x + a.y * b.y + a.zz * b.zz) AS d
      FROM p a JOIN p b ON a.key < b.key
    ),
    banded AS (
      SELECT CAST(floor(degrees(d)) AS BIGINT) AS band,
             CAST(count(*) AS BIGINT) AS w2,
             CAST(sum(za * zb) AS BIGINT) AS pp,
             CAST(sum(za) AS BIGINT) AS sa,
             CAST(sum(zb) AS BIGINT) AS sb
      FROM pr WHERE d <= {math.radians(5.0)!r}
      GROUP BY 1
    )
    SELECT band, 2 * w2 AS w_pairs,
           round(CASE WHEN CAST(szz AS DOUBLE)
                           - CAST(n AS DOUBLE)
                             * (CAST(sz AS DOUBLE) / CAST(n AS DOUBLE))
                             * (CAST(sz AS DOUBLE) / CAST(n AS DOUBLE)) > 0
                 THEN (CAST(n AS DOUBLE) / (2.0 * CAST(w2 AS DOUBLE)))
                      * ((2.0 * (CAST(pp AS DOUBLE)
                           - (CAST(sz AS DOUBLE) / CAST(n AS DOUBLE))
                             * CAST(sa + sb AS DOUBLE)
                           + CAST(w2 AS DOUBLE)
                             * (CAST(sz AS DOUBLE) / CAST(n AS DOUBLE))
                             * (CAST(sz AS DOUBLE) / CAST(n AS DOUBLE))))
                         / (CAST(szz AS DOUBLE)
                            - CAST(n AS DOUBLE)
                              * (CAST(sz AS DOUBLE) / CAST(n AS DOUBLE))
                              * (CAST(sz AS DOUBLE) / CAST(n AS DOUBLE))))
                 END, 9) AS morans_i
    FROM banded CROSS JOIN g ORDER BY band
"""


def _q_bivariate_moran(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate Moran's I between two deterministic fields (x = the
    spatial field z, y = key mod 7) over within-2-degree neighbor pairs:
    does x here predict y nearby? Cross-product sums BIGINT; one
    fixed-order float expression."""
    from gos2_spark.spark.joins import distance_join

    pts = (
        _cust_points(spark, sf_dir)
        .withColumn("zx", (3 * F.floor("lat") + F.floor("lng")).cast("long"))
        .withColumn("zy", (F.col("key") % 7).cast("long"))
    )
    g = pts.agg(
        F.count("*").alias("n"),
        F.sum("zx").alias("sx"),
        F.sum(F.col("zx") * F.col("zx")).alias("sxx"),
        F.sum("zy").alias("sy"),
        F.sum(F.col("zy") * F.col("zy")).alias("syy"),
    )
    pairs = distance_join(pts, 2.0, point_key="key")
    a = pts.select(
        F.col("key").alias("key_a"), F.col("zx").alias("xa"), F.col("zy").alias("ya")
    )
    b = pts.select(
        F.col("key").alias("key_b"), F.col("zx").alias("xb"), F.col("zy").alias("yb")
    )
    # symmetric: x_i * y_j summed over BOTH directions of each pair
    s = (
        pairs.join(a, "key_a")
        .join(b, "key_b")
        .agg(
            F.count("*").alias("_w2"),
            F.sum(F.col("xa") * F.col("yb") + F.col("xb") * F.col("ya")).alias(
                "_pxy"
            ),
            F.sum(F.col("xa") + F.col("xb")).alias("_psx"),
            F.sum(F.col("ya") + F.col("yb")).alias("_psy"),
        )
    )
    j = s.crossJoin(F.broadcast(g))
    n = F.col("n").cast("double")
    mx = F.col("sx").cast("double") / n
    my = F.col("sy").cast("double") / n
    w = 2.0 * F.col("_w2").cast("double")
    num = (
        F.col("_pxy").cast("double")
        - my * F.col("_psx").cast("double")
        - mx * F.col("_psy").cast("double")
        + w * mx * my
    )
    vx = F.col("sxx").cast("double") - n * mx * mx
    vy = F.col("syy").cast("double") - n * my * my
    i = F.when(
        (F.col("_w2") > 0) & (vx > 0) & (vy > 0),
        (n / w) * num / F.sqrt(vx * vy),
    )
    return j.select(
        (2 * F.coalesce(F.col("_w2"), F.lit(0))).alias("w_pairs"),
        F.round(i, 9).alias("bivariate_i"),
    )


_BIV_MORAN_ORACLE = f"""
    WITH pts AS ({_CUST_LATLNG_SQL}),
    p AS (
      SELECT key, CAST(3 * floor(lat) + floor(lng) AS BIGINT) AS zx,
             CAST(key % 7 AS BIGINT) AS zy,
             cos(radians(lng)) * cos(radians(lat)) AS x,
             sin(radians(lng)) * cos(radians(lat)) AS y,
             sin(radians(lat)) AS zz
      FROM pts
    ),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(zx) AS BIGINT) AS sx,
             CAST(sum(zx * zx) AS BIGINT) AS sxx,
             CAST(sum(zy) AS BIGINT) AS sy,
             CAST(sum(zy * zy) AS BIGINT) AS syy
      FROM p
    ),
    pr AS (
      SELECT a.zx AS xa, a.zy AS ya, b.zx AS xb, b.zy AS yb
      FROM p a JOIN p b ON a.key < b.key
      WHERE atan2(sqrt(
                (a.y * b.zz - a.zz * b.y) * (a.y * b.zz - a.zz * b.y)
              + (a.zz * b.x - a.x * b.zz) * (a.zz * b.x - a.x * b.zz)
              + (a.x * b.y - a.y * b.x) * (a.x * b.y - a.y * b.x)),
              a.x * b.x + a.y * b.y + a.zz * b.zz) <= {math.radians(2.0)!r}
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS w2,
             CAST(sum(xa * yb + xb * ya) AS BIGINT) AS pxy,
             CAST(sum(xa + xb) AS BIGINT) AS psx,
             CAST(sum(ya + yb) AS BIGINT) AS psy
      FROM pr
    )
    SELECT 2 * w2 AS w_pairs,
           round(CASE WHEN w2 > 0
                      AND CAST(sxx AS DOUBLE) - CAST(n AS DOUBLE)
                           * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                           * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) > 0
                      AND CAST(syy AS DOUBLE) - CAST(n AS DOUBLE)
                          * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                          * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) > 0
                 THEN (CAST(n AS DOUBLE) / (2.0 * CAST(w2 AS DOUBLE)))
                      * (CAST(pxy AS DOUBLE)
                         - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                           * CAST(psx AS DOUBLE)
                         - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                           * CAST(psy AS DOUBLE)
                         + 2.0 * CAST(w2 AS DOUBLE)
                           * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                           * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
                      / sqrt((CAST(sxx AS DOUBLE) - CAST(n AS DOUBLE)
                              * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                              * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
                             * (CAST(syy AS DOUBLE) - CAST(n AS DOUBLE)
                                * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                                * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))))
                 END, 9) AS bivariate_i
    FROM s CROSS JOIN g
"""


# ---------------------------------------------------------------------------
# round-4 continuation batch ll: UTM projection (Snyder transverse-
# Mercator series, textual-twin steps) + per-zone aggregation.
# ---------------------------------------------------------------------------


def _q_utm_coordinates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTM zone/easting/northing for every customer point via the shared
    expression chain (spark/geodesy.py::utm_steps — the same
    one-op-order textual-twin discipline as the Vincenty chains), rolled
    up per (zone, hemisphere) with micrometer-rounded coordinate sums as
    the value check."""
    from gos2_spark.spark.geodesy import utm_project

    pts = _cust_points(spark, sf_dir).select("key", "lat", "lng")
    utm = utm_project(pts)
    return (
        utm.groupBy("zone", "hemisphere")
        .agg(
            F.count("*").alias("n_points"),
            # micrometer-quantized BIGINT sums: exact in any order
            (
                F.sum(F.round(F.col("easting") * 1e6).cast("long")).cast(
                    "double"
                )
                / 1e6
            ).alias("sum_easting"),
            (
                F.sum(F.round(F.col("northing") * 1e6).cast("long")).cast(
                    "double"
                )
                / 1e6
            ).alias("sum_northing"),
        )
        .orderBy("zone", "hemisphere")
    )


def _utm_oracle_sql() -> str:
    from gos2_spark.spark.geodesy import duckdb_steps_cte, utm_steps

    base = f"g0 AS (SELECT key, lat, lng FROM ({_CUST_LATLNG_SQL}))"
    body, last = duckdb_steps_cte(base, utm_steps())
    return f"""
        WITH {body}
        SELECT zone,
               CASE WHEN lat < 0.0 THEN 'S' ELSE 'N' END AS hemisphere,
               CAST(count(*) AS BIGINT) AS n_points,
               CAST(sum(CAST(round(easting * 1e6) AS BIGINT)) AS DOUBLE)
                 / 1e6 AS sum_easting,
               CAST(sum(CAST(round(northing * 1e6) AS BIGINT)) AS DOUBLE)
                 / 1e6 AS sum_northing
        FROM {last}
        GROUP BY 1, 2 ORDER BY 1, 2
    """


# ---------------------------------------------------------------------------
# round-4 continuation batch mm: MGRS 100km grid squares on top of the UTM
# chain (military-grid naming: latitude band + AA-scheme square letters).
# ---------------------------------------------------------------------------

_MGRS_COLS = "ABCDEFGHJKLMNPQRSTUVWXYZ"   # 24 letters, I/O omitted
_MGRS_ROWS = "ABCDEFGHJKLMNPQRSTUV"       # 20 letters
_MGRS_BANDS = "CDEFGHJKLMNPQRSTUVWX"      # 8-degree bands, -80..84


def _q_mgrs_squares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MGRS 100km square ids (zone + latitude band + AA-scheme column/
    row letters) for the customer points, rolled up per square — the
    military-grid naming layer over the UTM chain. All letter indices
    are integer arithmetic on the quantized easting/northing; both
    engines index the same literal alphabets."""
    from gos2_spark.spark.geodesy import utm_project

    pts = _cust_points(spark, sf_dir).select("key", "lat", "lng")
    utm = utm_project(pts).where((F.col("lat") >= -80.0) & (F.col("lat") < 84.0))
    band_idx = F.floor((F.col("lat") + 80.0) / 8.0).cast("int")
    e100 = F.floor(F.col("easting") / 100000.0).cast("long")
    n100 = F.floor(F.col("northing") / 100000.0).cast("long")
    col_idx = F.pmod(e100 - 1 + 8 * F.pmod(F.col("zone") - 1, F.lit(3)), F.lit(24))
    row_idx = F.pmod(n100 + 5 * F.pmod(F.col("zone") - 1, F.lit(2)), F.lit(20))
    m = utm.select(
        "zone",
        F.substring(F.lit(_MGRS_BANDS), 1, 20)
        .substr(band_idx + 1, F.lit(1))
        .alias("band"),
        F.substring(F.lit(_MGRS_COLS), 1, 24)
        .substr(col_idx.cast("int") + 1, F.lit(1))
        .alias("col_letter"),
        F.substring(F.lit(_MGRS_ROWS), 1, 20)
        .substr(row_idx.cast("int") + 1, F.lit(1))
        .alias("row_letter"),
    )
    return (
        m.groupBy("zone", "band", "col_letter", "row_letter")
        .agg(F.count("*").alias("n_points"))
        .orderBy("zone", "band", "col_letter", "row_letter")
    )


def _mgrs_oracle_sql() -> str:
    from gos2_spark.spark.geodesy import duckdb_steps_cte, utm_steps

    base = f"g0 AS (SELECT key, lat, lng FROM ({_CUST_LATLNG_SQL}))"
    body, last = duckdb_steps_cte(base, utm_steps())
    return f"""
        WITH {body},
        m AS (
          SELECT zone,
                 substr('{_MGRS_BANDS}',
                        CAST(floor((lat + 80.0) / 8.0) AS INT) + 1, 1) AS band,
                 substr('{_MGRS_COLS}',
                        CAST(((CAST(floor(easting / 100000.0) AS BIGINT) - 1
                               + 8 * (((zone - 1) % 3 + 3) % 3)) % 24 + 24)
                             % 24 AS INT) + 1, 1) AS col_letter,
                 substr('{_MGRS_ROWS}',
                        CAST(((CAST(floor(northing / 100000.0) AS BIGINT)
                               + 5 * (((zone - 1) % 2 + 2) % 2)) % 20 + 20)
                             % 20 AS INT) + 1, 1) AS row_letter
          FROM {last}
          WHERE lat >= -80.0 AND lat < 84.0
        )
        SELECT zone, band, col_letter, row_letter,
               CAST(count(*) AS BIGINT) AS n_points
        FROM m GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4
    """


# ---------------------------------------------------------------------------
# round-4 continuation batch nn: geohash prefix pyramid (the base-32
# sibling of quadkey_pyramid — geohash is a bit-prefix code, so character
# truncation IS the parent rollup).
# ---------------------------------------------------------------------------


def _q_geohash_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash pyramid: 4-char geohash counts rolled up to every prefix
    length 1..4 (geohash truncation = parent cell, the base-32 analogue
    of quadkey/cell_pyramid). Pure codegen; counts exact."""
    from gos2_spark.spark.geohash import geohash

    pts = _cust_points(spark, sf_dir)
    base = pts.select(geohash("lat", "lng", 4).alias("gh"))
    levels = F.explode(F.sequence(F.lit(1), F.lit(4))).alias("lvl")
    return (
        base.select("gh", levels)
        .select("lvl", F.col("gh").substr(F.lit(1), F.col("lvl")).alias("prefix"))
        .groupBy("lvl", "prefix")
        .agg(F.count("*").alias("n_points"))
        .orderBy("lvl", "prefix")
    )


def _geohash_pyramid_oracle_sql() -> str:
    inner = _geohash_oracle_sql(4)
    return f"""
        WITH gh4 AS ({inner}),
        lv AS (SELECT unnest(generate_series(1, 4)) AS lvl)
        SELECT lvl, substr(gh, 1, CAST(lvl AS INT)) AS prefix,
               CAST(sum(n) AS BIGINT) AS n_points
        FROM gh4 CROSS JOIN lv
        GROUP BY 1, 2 ORDER BY 1, 2
    """


def _traj_graph(spark: SparkSession, sf_dir: str):
    """Shared trajectory-transition graph for the graph-structure
    metrics batch: nodes are 10x10-degree grid tiles of the standard
    derived event lat/lng, directed edges are DISTINCT consecutive
    (prev_tile -> tile) moves per user (time-ordered, ties broken by
    event_id, self-loops dropped). Unlike a functional-map graph this
    has organic degree variance and genuinely bidirectional links, so
    assortativity / clustering / reciprocity are all non-degenerate.
    Returns (directed, undirected) edge DataFrames."""
    from pyspark.sql import Window

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    lat = -60.0 + (e * 11 % 120) + (e % 83) / 83.0
    lng = -170.0 + (e * 17 % 340) + (e % 79) / 79.0
    node = (
        (F.floor(lat / 10.0) + 6) * 34 + F.floor(lng / 10.0) + 17
    ).cast("long")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    seq = ev.select(
        "user_id", us.alias("us"), "event_id", node.alias("node")
    ).withColumn("prev", F.lag("node").over(w))
    directed = (
        seq.where(F.col("prev").isNotNull() & (F.col("prev") != F.col("node")))
        .select(F.col("prev").alias("a"), F.col("node").alias("b"))
        .distinct()
    )
    und = (
        directed.select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .distinct()
    )
    return directed, und


_TRAJ_DIRECTED_SQL = """
    SELECT DISTINCT prev AS src, node AS dst FROM (
      SELECT user_id,
             lag(node) OVER (PARTITION BY user_id
                             ORDER BY us, event_id) AS prev,
             node
      FROM (
        SELECT user_id, epoch_us(ts) AS us, event_id,
               CAST((floor((-60.0 + (event_id * 11 % 120)
                            + (event_id % 83) / 83.0) / 10.0) + 6) * 34
                    + floor((-170.0 + (event_id * 17 % 340)
                             + (event_id % 79) / 79.0) / 10.0) + 17
                    AS BIGINT) AS node
        FROM events
      )
    ) WHERE prev IS NOT NULL AND prev <> node
"""

_TRAJ_UND_SQL = f"""
    SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
    FROM ({_TRAJ_DIRECTED_SQL})
"""


def _q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman degree assortativity r of the symmetrized trajectory
    transition graph:
    Pearson correlation of endpoint degrees over directed stubs (each
    undirected edge contributes both orientations, so the marginals are
    identical and r = (n*Sxy - Sx^2) / (n*Sxx - Sx^2)). Every sum is an
    exact BIGINT before the single double division — one degree groupBy
    plus two broadcast-size joins, no shuffle wider than the edge list."""
    _, und = _traj_graph(spark, sf_dir)
    deg = (
        und.select(F.col("u").alias("node"))
        .union(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    stubs = und.select(F.col("u").alias("x"), F.col("v").alias("y")).union(
        und.select(F.col("v").alias("x"), F.col("u").alias("y"))
    )
    dx = deg.select(F.col("node").alias("x"), F.col("deg").alias("du"))
    dy = deg.select(F.col("node").alias("y"), F.col("deg").alias("dv"))
    s = (
        stubs.join(F.broadcast(dx), "x")
        .join(F.broadcast(dy), "y")
        .agg(
            F.count("*").alias("n"),
            F.sum("du").alias("sx"),
            F.sum(F.col("du") * F.col("dv")).alias("sxy"),
            F.sum(F.col("du") * F.col("du")).alias("sxx"),
        )
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        (F.col("n") / 2).cast("long").alias("n_edges"),
        F.when(
            den != 0,
            F.round(
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sx")).cast(
                    "double"
                )
                / den.cast("double"),
                9,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("assortativity"),
    )


_DEGREE_ASSORT_ORACLE = f"""
    WITH und AS ({_TRAJ_UND_SQL}),
    deg AS (
      SELECT node, count(*) AS deg FROM (
        SELECT u AS node FROM und UNION ALL SELECT v FROM und
      ) GROUP BY 1
    ),
    stubs AS (
      SELECT u AS x, v AS y FROM und
      UNION ALL SELECT v, u FROM und
    ),
    s AS (
      SELECT count(*) AS n, sum(dx.deg) AS sx,
             sum(dx.deg * dy.deg) AS sxy, sum(dx.deg * dx.deg) AS sxx
      FROM stubs
      JOIN deg dx ON dx.node = stubs.x
      JOIN deg dy ON dy.node = stubs.y
    )
    SELECT CAST(n // 2 AS BIGINT) AS n_edges,
           CASE WHEN n * sxx - sx * sx <> 0 THEN
             round(CAST(n * sxy - sx * sx AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE), 9)
           ELSE 0.0 END AS assortativity
    FROM s
"""


def _q_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient of the symmetrized
    trajectory transition graph: edges among a node's neighbors over deg*(deg-1)/2 — the
    node-level companion of the global triangle count. Neighbor pairs
    come from a self-join of the adjacency list (bounded by max degree,
    64 nodes) probed against the undirected edge table; triangle counts
    and degrees stay BIGINT, one rounded double per node."""
    _, und = _traj_graph(spark, sf_dir)
    adj = und.select(F.col("u").alias("node"), F.col("v").alias("nbr")).union(
        und.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    deg = adj.groupBy("node").agg(F.count("*").alias("deg"))
    a1 = adj.select("node", F.col("nbr").alias("n1"))
    a2 = adj.select("node", F.col("nbr").alias("n2"))
    pairs = a1.join(a2, "node").where(F.col("n1") < F.col("n2"))
    tri = (
        pairs.join(
            und,
            (pairs["n1"] == und["u"]) & (pairs["n2"] == und["v"]),
        )
        .groupBy("node")
        .agg(F.count("*").alias("n_tri"))
    )
    out = deg.join(tri, "node", "left").select(
        "node",
        "deg",
        F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_tri"),
        F.when(
            F.col("deg") >= 2,
            F.round(
                2.0
                * F.coalesce(F.col("n_tri"), F.lit(0)).cast("double")
                / (F.col("deg") * (F.col("deg") - 1)).cast("double"),
                9,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("lcc"),
    )
    return out.orderBy("node")


_LOCAL_CLUSTERING_ORACLE = f"""
    WITH und AS ({_TRAJ_UND_SQL}),
    adj AS (
      SELECT u AS node, v AS nbr FROM und
      UNION ALL SELECT v, u FROM und
    ),
    deg AS (SELECT node, count(*) AS deg FROM adj GROUP BY 1),
    pairs AS (
      SELECT a1.node, a1.nbr AS n1, a2.nbr AS n2
      FROM adj a1 JOIN adj a2 ON a1.node = a2.node AND a1.nbr < a2.nbr
    ),
    tri AS (
      SELECT p.node, count(*) AS n_tri
      FROM pairs p JOIN und ON und.u = p.n1 AND und.v = p.n2
      GROUP BY 1
    )
    SELECT deg.node, deg.deg,
           CAST(coalesce(tri.n_tri, 0) AS BIGINT) AS n_tri,
           CASE WHEN deg.deg >= 2 THEN
             round(2.0 * CAST(coalesce(tri.n_tri, 0) AS DOUBLE)
                   / CAST(deg.deg * (deg.deg - 1) AS DOUBLE), 9)
           ELSE 0.0 END AS lcc
    FROM deg LEFT JOIN tri ON tri.node = deg.node
    ORDER BY deg.node
"""


def _q_reciprocity_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source reciprocity of the DIRECTED trajectory transition
    graph: of each
    node's distinct out-links, how many have the reverse link present —
    the mutual-citation diagnostic for host link graphs. One self-join
    of the distinct edge table on the swapped key; counts exact."""
    directed, _ = _traj_graph(spark, sf_dir)
    rev = directed.select(
        F.col("b").alias("a"), F.col("a").alias("b"), F.lit(1).alias("_has")
    )
    marked = directed.join(rev, ["a", "b"], "left")
    out = marked.groupBy(F.col("a").alias("node")).agg(
        F.count("*").alias("out_deg"),
        F.sum(F.coalesce(F.col("_has"), F.lit(0))).cast("long").alias(
            "n_reciprocal"
        ),
    )
    return out.select(
        "node",
        "out_deg",
        "n_reciprocal",
        F.round(
            F.col("n_reciprocal").cast("double")
            / F.col("out_deg").cast("double"),
            9,
        ).alias("reciprocity"),
    ).orderBy("node")


_RECIPROCITY_ORACLE = f"""
    WITH e AS ({_TRAJ_DIRECTED_SQL})
    SELECT e.src AS node, count(*) AS out_deg,
           CAST(sum(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_reciprocal,
           round(CAST(sum(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(count(*) AS DOUBLE), 9)
             AS reciprocity
    FROM e LEFT JOIN e r ON r.src = e.dst AND r.dst = e.src
    GROUP BY 1 ORDER BY 1
"""


def _q_nn_ffunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empty-space F-function + J-function (spark/spatialstats.py
    empty_space_fj) at radii 1 / 2.5 / 5 degrees: F from a deterministic
    12x34 ten-degree test grid into the 1-in-20 event subsample, G from
    the subsample against itself, J = (1-G)/(1-F) (NULL where F = 1).
    Completes the G/F/J distance-based point-pattern triple alongside
    nn_gfunction. Both NN passes are the distributed cap-doubling kNN;
    the oracle brute-forces every true NN with the identical atan2
    distance, so counts must match exactly."""
    from gos2_spark.spark.functions import add_cellid_sql
    from gos2_spark.spark.spatialstats import empty_space_fj

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    pts = add_cellid_sql(
        ev.select(
            "event_id",
            (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
            (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
        ).where(e % 20 == 0),
        "lat", "lng", "cell_id",
    )
    grid = [
        (i * 34 + j, -55.0 + i * 10, -165.0 + j * 10)
        for i in range(12)
        for j in range(34)
    ]
    return empty_space_fj(
        pts, grid, radii_deg=[1.0, 2.5, 5.0], point_key="event_id",
    ).orderBy("r_deg")


def _nn_ffunction_oracle_sql() -> str:
    import math as _m

    rows = []
    for r in (1.0, 2.5, 5.0):
        rr = _m.radians(r)
        rows.append(f"""
          SELECT {float(r)!r} AS r_deg, n_test, n_points,
                 round(CAST((SELECT count(*) FROM fnn
                             WHERE nn_rad <= {rr!r}) AS DOUBLE)
                       / CAST(n_test AS DOUBLE), 9) AS f_hat,
                 round(CAST((SELECT count(*) FROM gnn
                             WHERE nn_rad <= {rr!r}) AS DOUBLE)
                       / CAST(n_points AS DOUBLE), 9) AS g_hat
          FROM nt, np""")
    sel = " UNION ALL ".join(rows)
    return f"""
        WITH pts0 AS ({_EVENTS_LATLNG_SQL}),
        sub AS (
          SELECT event_id, lat, lng FROM pts0 WHERE event_id % 20 = 0
        ),
        v AS (
          SELECT event_id,
                 cos(radians(lng)) * cos(radians(lat)) AS x,
                 sin(radians(lng)) * cos(radians(lat)) AS y,
                 sin(radians(lat)) AS z
          FROM sub
        ),
        grid AS (
          SELECT i * 34 + j AS tid,
                 -55.0 + i * 10 AS lat, -165.0 + j * 10 AS lng
          FROM (SELECT unnest(generate_series(0, 11)) AS i),
               (SELECT unnest(generate_series(0, 33)) AS j)
        ),
        gv AS (
          SELECT tid,
                 cos(radians(lng)) * cos(radians(lat)) AS x,
                 sin(radians(lng)) * cos(radians(lat)) AS y,
                 sin(radians(lat)) AS z
          FROM grid
        ),
        fnn AS (
          SELECT g.tid,
                 min(atan2(sqrt(
                     (g.y * b.z - g.z * b.y) * (g.y * b.z - g.z * b.y)
                   + (g.z * b.x - g.x * b.z) * (g.z * b.x - g.x * b.z)
                   + (g.x * b.y - g.y * b.x) * (g.x * b.y - g.y * b.x)),
                   g.x * b.x + g.y * b.y + g.z * b.z)) AS nn_rad
          FROM gv g CROSS JOIN v b GROUP BY 1
        ),
        gnn AS (
          SELECT a.event_id,
                 min(atan2(sqrt(
                     (a.y * b.z - a.z * b.y) * (a.y * b.z - a.z * b.y)
                   + (a.z * b.x - a.x * b.z) * (a.z * b.x - a.x * b.z)
                   + (a.x * b.y - a.y * b.x) * (a.x * b.y - a.y * b.x)),
                   a.x * b.x + a.y * b.y + a.z * b.z)) AS nn_rad
          FROM v a JOIN v b ON a.event_id != b.event_id GROUP BY 1
        ),
        nt AS (SELECT count(*) AS n_test FROM fnn),
        np AS (SELECT count(*) AS n_points FROM gnn)
        SELECT r_deg, CAST(n_test AS BIGINT) AS n_test,
               CAST(n_points AS BIGINT) AS n_points, f_hat, g_hat,
               CASE WHEN f_hat < 1.0
                    THEN round((1.0 - g_hat) / (1.0 - f_hat), 9)
               END AS j_hat
        FROM ({sel}) ORDER BY r_deg
    """


def _q_general_g(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Getis-Ord General G over ten-degree event tiles with queen
    contiguity (8-neighbor, no wrap): observed G = sum of x_i*x_j over
    adjacent ordered pairs / over all distinct ordered pairs, vs the
    CSR expectation W / (n(n-1)). The GLOBAL companion of the local
    gistar_hotspots — G_ratio > 1 means high values cluster next to
    high values. Numerator via an 8-offset explode + equi-join (no
    theta join); every sufficient statistic is an exact BIGINT and the
    two fractions are single pinned divisions."""
    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    lat = -60.0 + (e * 11 % 120) + (e % 83) / 83.0
    lng = -170.0 + (e * 17 % 340) + (e % 79) / 79.0
    tiles = (
        ev.select(
            (F.floor(lat / 10.0) + 6).cast("long").alias("r"),
            (F.floor(lng / 10.0) + 17).cast("long").alias("c"),
        )
        .groupBy("r", "c")
        .agg(F.count("*").alias("x"))
    )
    offs = spark.createDataFrame(
        [(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)
         if (dr, dc) != (0, 0)],
        "dr long, dc long",
    )
    nbr = (
        tiles.crossJoin(F.broadcast(offs))  # 8-row offset table
        .select(
            (F.col("r") + F.col("dr")).alias("r2"),
            (F.col("c") + F.col("dc")).alias("c2"),
            F.col("x").alias("xi"),
        )
        .join(
            tiles.select(
                F.col("r").alias("r2"), F.col("c").alias("c2"),
                F.col("x").alias("xj"),
            ),
            ["r2", "c2"],
        )
        .agg(
            F.count("*").alias("w_pairs"),
            F.sum(F.col("xi") * F.col("xj")).alias("num"),
        )
    )
    tot = tiles.agg(
        F.count("*").alias("n_cells"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    den = F.col("sx") * F.col("sx") - F.col("sxx")
    g_obs = F.col("num").cast("double") / den.cast("double")
    g_exp = F.col("w_pairs").cast("double") / (
        F.col("n_cells") * (F.col("n_cells") - 1)
    ).cast("double")
    return (
        nbr.crossJoin(F.broadcast(tot))  # two 1-row aggregates
        .select(
            F.col("n_cells").cast("long").alias("n_cells"),
            F.col("w_pairs").cast("long").alias("w_pairs"),
            F.col("num").cast("long").alias("num"),
            den.cast("long").alias("den"),
            F.round(g_obs, 9).alias("g_obs"),
            F.round(g_exp, 9).alias("g_exp"),
            F.round(g_obs / g_exp, 9).alias("g_ratio"),
        )
    )


_GENERAL_G_ORACLE = f"""
    WITH pts AS ({_EVENTS_LATLNG_SQL}),
    tiles AS (
      SELECT CAST(floor(lat / 10.0) + 6 AS BIGINT) AS r,
             CAST(floor(lng / 10.0) + 17 AS BIGINT) AS c,
             count(*) AS x
      FROM pts GROUP BY 1, 2
    ),
    offs AS (
      SELECT dr, dc
      FROM (SELECT unnest([-1, 0, 1]) AS dr),
           (SELECT unnest([-1, 0, 1]) AS dc)
      WHERE NOT (dr = 0 AND dc = 0)
    ),
    nbr AS (
      SELECT count(*) AS w_pairs, sum(a.x * b.x) AS num
      FROM tiles a CROSS JOIN offs
      JOIN tiles b ON b.r = a.r + offs.dr AND b.c = a.c + offs.dc
    ),
    tot AS (
      SELECT count(*) AS n_cells, sum(x) AS sx, sum(x * x) AS sxx
      FROM tiles
    )
    SELECT CAST(n_cells AS BIGINT) AS n_cells,
           CAST(w_pairs AS BIGINT) AS w_pairs,
           CAST(num AS BIGINT) AS num,
           CAST(sx * sx - sxx AS BIGINT) AS den,
           round(CAST(num AS DOUBLE) / CAST(sx * sx - sxx AS DOUBLE), 9)
             AS g_obs,
           round(CAST(w_pairs AS DOUBLE)
                 / CAST(n_cells * (n_cells - 1) AS DOUBLE), 9) AS g_exp,
           round((CAST(num AS DOUBLE) / CAST(sx * sx - sxx AS DOUBLE))
                 / (CAST(w_pairs AS DOUBLE)
                    / CAST(n_cells * (n_cells - 1) AS DOUBLE)), 9)
             AS g_ratio
    FROM nbr, tot
"""


def _q_central_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Central feature (exact 1-medoid) of the 1-in-40 event subsample:
    the observed point minimizing the SUM of angular distances to all
    others — the ArcGIS spatial-statistics companion of std_dev_ellipse
    (which gives the mean center; the central feature must be a real
    observation). Exact medoid is intrinsically quadratic: the pair set
    is cohort-bounded by the fixed subsample (2.5k points at sf0.1 =
    6.25M JVM-codegen pairs, one broadcast side), same justification as
    user_tile_similarity. Deterministic (sum_dist, event_id) tie-break."""
    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    sub = ev.select(
        "event_id",
        (-60.0 + (e * 11 % 120) + (e % 83) / 83.0).alias("lat"),
        (-170.0 + (e * 17 % 340) + (e % 79) / 79.0).alias("lng"),
    ).where(e % 40 == 0)
    v = sub.select(
        "event_id", "lat", "lng",
        (F.cos(F.radians("lng")) * F.cos(F.radians("lat"))).alias("x"),
        (F.sin(F.radians("lng")) * F.cos(F.radians("lat"))).alias("y"),
        F.sin(F.radians("lat")).alias("z"),
    )
    b = v.select(
        F.col("event_id").alias("bid"), F.col("x").alias("bx"),
        F.col("y").alias("by"), F.col("z").alias("bz"),
    )
    cx = F.col("y") * F.col("bz") - F.col("z") * F.col("by")
    cy = F.col("z") * F.col("bx") - F.col("x") * F.col("bz")
    cz = F.col("x") * F.col("by") - F.col("y") * F.col("bx")
    dot = F.col("x") * F.col("bx") + F.col("y") * F.col("by") + F.col(
        "z"
    ) * F.col("bz")
    d = F.atan2(F.sqrt(cx * cx + cy * cy + cz * cz), dot)
    sums = (
        v.crossJoin(F.broadcast(b))  # bounded 1-in-40 subsample medoid
        .where(F.col("event_id") != F.col("bid"))
        .groupBy("event_id", "lat", "lng")
        .agg(F.sum(d).alias("sum_dist"))
    )
    return sums.orderBy(
        F.col("sum_dist").asc(), F.col("event_id").asc()
    ).limit(1).select(
        "event_id",
        F.round("lat", 9).alias("lat"),
        F.round("lng", 9).alias("lng"),
        F.round("sum_dist", 9).alias("sum_dist_rad"),
    )


_CENTRAL_FEATURE_ORACLE = f"""
    WITH pts AS ({_EVENTS_LATLNG_SQL}),
    sub AS (
      SELECT event_id, lat, lng FROM pts WHERE event_id % 40 = 0
    ),
    v AS (
      SELECT event_id, lat, lng,
             cos(radians(lng)) * cos(radians(lat)) AS x,
             sin(radians(lng)) * cos(radians(lat)) AS y,
             sin(radians(lat)) AS z
      FROM sub
    ),
    sums AS (
      SELECT a.event_id, a.lat, a.lng,
             sum(atan2(sqrt(
                 (a.y * b.z - a.z * b.y) * (a.y * b.z - a.z * b.y)
               + (a.z * b.x - a.x * b.z) * (a.z * b.x - a.x * b.z)
               + (a.x * b.y - a.y * b.x) * (a.x * b.y - a.y * b.x)),
               a.x * b.x + a.y * b.y + a.z * b.z)) AS sum_dist
      FROM v a JOIN v b ON a.event_id != b.event_id
      GROUP BY 1, 2, 3
    )
    SELECT event_id, round(lat, 9) AS lat, round(lng, 9) AS lng,
           round(sum_dist, 9) AS sum_dist_rad
    FROM sums ORDER BY sum_dist, event_id LIMIT 1
"""


def _q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test (spark/nonparam.py welch_t) per
    event type between a deterministic multiplicative-hash split of
    users — the parametric companion of mw_value_shift on the same
    design. Values ride as exact integer cents so the per-side
    (n, sum, sum-of-squares) statistics are BIGINTs; t and df are
    fixed-order scalar expressions, bit-identical cross-engine."""
    from gos2_spark.spark.nonparam import welch_t

    ev = _load(spark, sf_dir, "events")
    samples = ev.select(
        "event_type",
        (F.col("user_id") * 2654435761 % 97 % 2).alias("side"),
        F.round(F.col("value") * 100, 0).cast("long").alias("v_cents"),
    )
    return welch_t(
        samples, "event_type", "side", "v_cents", scale=100.0
    ).orderBy("event_type")


_WELCH_ORACLE = """
    WITH s AS (
      SELECT event_type,
             (user_id * 2654435761) % 97 % 2 AS side,
             CAST(round(value * 100) AS BIGINT) AS v
      FROM events
    ),
    per AS (
      SELECT event_type, side, count(*) AS n, sum(v) AS s,
             sum(v * v) AS ss
      FROM s GROUP BY 1, 2
    ),
    j AS (
      SELECT a.event_type,
             a.n AS n0, a.s AS s0, a.ss AS ss0,
             b.n AS n1, b.s AS s1, b.ss AS ss1
      FROM per a JOIN per b ON a.event_type = b.event_type
      WHERE a.side = 0 AND b.side = 1 AND a.n >= 2 AND b.n >= 2
    ),
    e AS (
      SELECT event_type, n0, n1,
             CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS m0,
             CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
             ((CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE)
               / CAST(n0 AS DOUBLE)) / (CAST(n0 AS DOUBLE) - 1.0))
               / CAST(n0 AS DOUBLE) AS se0,
             ((CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
               / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0))
               / CAST(n1 AS DOUBLE) AS se1
      FROM j
    )
    SELECT event_type, n0, n1,
           round(m0 / 100.0, 9) AS mean0,
           round(m1 / 100.0, 9) AS mean1,
           round((m1 - m0) / sqrt(se0 + se1), 9) AS t_welch,
           round((se0 + se1) * (se0 + se1)
                 / (se0 * se0 / (CAST(n0 AS DOUBLE) - 1.0)
                    + se1 * se1 / (CAST(n1 AS DOUBLE) - 1.0)), 9)
             AS df_welch
    FROM e ORDER BY event_type
"""


# ln(m!) via an identical Stirling-series expression in BOTH engines:
# exact CASE ladder below 8, 3-term Stirling correction above (relative
# error < 1e-12 at m >= 8; determinism matters, not the last bits of
# lgamma — both engines evaluate the SAME fixed-order expression).
_LNFACT_CASE = (
    "CASE {m} WHEN 0 THEN 0.0 WHEN 1 THEN 0.0"
    " WHEN 2 THEN 0.6931471805599453 WHEN 3 THEN 1.791759469228055"
    " WHEN 4 THEN 3.1780538303479458 WHEN 5 THEN 4.787491742782046"
    " WHEN 6 THEN 6.579251212010101 WHEN 7 THEN 8.525161361065415"
    " ELSE (CAST({m} AS DOUBLE) + 0.5) * ln(CAST({m} AS DOUBLE))"
    " - CAST({m} AS DOUBLE) + 0.9189385332046727"
    " + 1.0 / (12.0 * CAST({m} AS DOUBLE))"
    " - 1.0 / (360.0 * CAST({m} AS DOUBLE) * CAST({m} AS DOUBLE)"
    " * CAST({m} AS DOUBLE)) END"
)


def _lnfact(col: str) -> str:
    return _LNFACT_CASE.format(m=col)


def _q_fisher_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher's exact test (two-sided) per event type on the 2x2 table
    arm x rare-success (value > 200, ~p99 tail): p = sum of
    hypergeometric pmfs no larger than the observed table's, over the
    full support k in [max(0, r1+c1-n), min(r1, c1)]. The pmf uses the
    shared Stirling ln-factorial (identical fixed-order expression in
    Spark and DuckDB, so the sum and the <= comparison are
    deterministic cross-engine; the 1e-7 relative slack absorbs the
    conventional pmf-equality tolerance). The support explodes from a
    per-type sequence — bounded by the success count, never by n."""
    ev = _load(spark, sf_dir, "events")
    tab = ev.select(
        "event_type",
        (F.col("user_id") * 48271 % 2147483647 % 2).alias("arm"),
        (F.col("value") > 200.0).cast("long").alias("succ"),
    ).groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("arm").alias("r1"),
        F.sum("succ").alias("c1"),
        F.sum(F.col("arm") * F.col("succ")).alias("x"),
    )
    tab.createOrReplaceTempView("_fx_tab")
    lnc = lambda n, k: (  # noqa: E731 — ln C(n,k) from the shared ladder
        f"({_lnfact(n)} - {_lnfact(k)} - {_lnfact(f'({n} - {k})')})"
    )
    pmf = (
        f"exp({lnc('r1', 'k')} + {lnc('(n - r1)', '(c1 - k)')}"
        f" - {lnc('n', 'c1')})"
    )
    pmf_obs = (
        f"exp({lnc('r1', 'x')} + {lnc('(n - r1)', '(c1 - x)')}"
        f" - {lnc('n', 'c1')})"
    )
    return spark.sql(f"""
        WITH ks AS (
          SELECT event_type, n, r1, c1, x,
                 explode(sequence(greatest(0L, r1 + c1 - n),
                                  least(r1, c1))) AS k
          FROM _fx_tab
        ),
        p AS (
          SELECT event_type, n, r1, c1, x, k, {pmf} AS pk,
                 {pmf_obs} AS pobs
          FROM ks
        )
        SELECT event_type, n, r1, c1, x,
               round(max(pobs), 9) AS pmf_obs,
               round(sum(CASE WHEN pk <= pobs * (1.0 + 1e-7)
                              THEN pk ELSE 0.0 END), 9) AS p_two_sided
        FROM p
        GROUP BY event_type, n, r1, c1, x
        ORDER BY event_type
    """)


def _fisher_oracle_sql() -> str:
    lnc = lambda n, k: (  # noqa: E731
        f"({_lnfact(n)} - {_lnfact(k)} - {_lnfact(f'({n} - {k})')})"
    )
    pmf = (
        f"exp({lnc('r1', 'k')} + {lnc('(n - r1)', '(c1 - k)')}"
        f" - {lnc('n', 'c1')})"
    )
    pmf_obs = (
        f"exp({lnc('r1', 'x')} + {lnc('(n - r1)', '(c1 - x)')}"
        f" - {lnc('n', 'c1')})"
    )
    return f"""
        WITH tab AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum((user_id * 48271) % 2147483647 % 2)
                      AS BIGINT) AS r1,
                 CAST(sum(CASE WHEN value > 200.0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS c1,
                 CAST(sum(((user_id * 48271) % 2147483647 % 2)
                     * CASE WHEN value > 200.0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS x
          FROM events GROUP BY 1
        ),
        ks AS (
          SELECT event_type, n, r1, c1, x, unnest(generate_series(
                   greatest(0, r1 + c1 - n), least(r1, c1))) AS k
          FROM tab
        ),
        p AS (
          SELECT event_type, n, r1, c1, x, k, {pmf} AS pk,
                 {pmf_obs} AS pobs
          FROM ks
        )
        SELECT event_type, CAST(n AS BIGINT) AS n,
               CAST(r1 AS BIGINT) AS r1, CAST(c1 AS BIGINT) AS c1,
               CAST(x AS BIGINT) AS x,
               round(max(pobs), 9) AS pmf_obs,
               round(sum(CASE WHEN pk <= pobs * (1.0 + 1e-7)
                              THEN pk ELSE 0.0 END), 9) AS p_two_sided
        FROM p
        GROUP BY event_type, n, r1, c1, x
        ORDER BY event_type
    """


def _q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two deterministic hash 'raters' bucketing
    documents into 3 classes (rater B agrees with A on 3/4 of docs by
    construction): kappa = (po - pe) / (1 - pe). Both the agreement
    count and the chance-expectation numerator sum(na_c * nb_c) are
    exact BIGINTs, so kappa is a single pinned division — the
    inter-annotator reliability gate of a labeling pipeline."""
    d = _load(spark, sf_dir, "documents")
    ra = (F.col("doc_id") * 48271 + 7) % 3
    rb = F.when(
        (F.col("doc_id") * 69069 + 1) % 4 == 0, (ra + 1) % 3
    ).otherwise(ra)
    r = d.select(ra.alias("ra"), rb.alias("rb"))
    cm = r.groupBy("ra", "rb").agg(F.count("*").alias("c"))
    tot = cm.agg(
        F.sum("c").alias("n"),
        F.sum(F.when(F.col("ra") == F.col("rb"), F.col("c")).otherwise(0))
        .alias("agree"),
    )
    na = cm.groupBy("ra").agg(F.sum("c").alias("na"))
    nb = cm.groupBy("rb").agg(F.sum("c").alias("nb"))
    pe_num = (
        na.join(nb, na["ra"] == nb["rb"])
        .agg(F.sum(F.col("na") * F.col("nb")).alias("s"))
    )
    return (
        tot.crossJoin(F.broadcast(pe_num))  # two 1-row aggregates
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("agree").cast("long").alias("n_agree"),
            F.round(
                F.col("agree").cast("double") / F.col("n").cast("double"), 9
            ).alias("po"),
            F.round(
                F.col("s").cast("double")
                / (F.col("n") * F.col("n")).cast("double"),
                9,
            ).alias("pe"),
            F.round(
                (F.col("agree") * F.col("n") - F.col("s")).cast("double")
                / (F.col("n") * F.col("n") - F.col("s")).cast("double"),
                9,
            ).alias("kappa"),
        )
    )


_KAPPA_ORACLE = """
    WITH r AS (
      SELECT (doc_id * 48271 + 7) % 3 AS ra,
             CASE WHEN (doc_id * 69069 + 1) % 4 = 0
                  THEN ((doc_id * 48271 + 7) % 3 + 1) % 3
                  ELSE (doc_id * 48271 + 7) % 3 END AS rb
      FROM documents
    ),
    cm AS (SELECT ra, rb, count(*) AS c FROM r GROUP BY 1, 2),
    tot AS (
      SELECT sum(c) AS n,
             sum(CASE WHEN ra = rb THEN c ELSE 0 END) AS agree
      FROM cm
    ),
    pe AS (
      SELECT sum(na.s * nb.s) AS s FROM
        (SELECT ra, sum(c) AS s FROM cm GROUP BY 1) na
        JOIN (SELECT rb, sum(c) AS s FROM cm GROUP BY 1) nb
          ON na.ra = nb.rb
    )
    SELECT CAST(n AS BIGINT) AS n, CAST(agree AS BIGINT) AS n_agree,
           round(CAST(agree AS DOUBLE) / CAST(n AS DOUBLE), 9) AS po,
           round(CAST(s AS DOUBLE) / CAST(n * n AS DOUBLE), 9) AS pe,
           round(CAST(agree * n - s AS DOUBLE)
                 / CAST(n * n - s AS DOUBLE), 9) AS kappa
    FROM tot, pe
"""


# --- Horn-kernel raster batch: shared deterministic elevation surface ---
# elev(r, c) on the 2-degree grid (r = floor(lat/2), c = floor(lng/2)),
# defined for EVERY cell so border cells need no occupancy fallback.
# The +100 offsets keep the hash argument non-negative for every kernel
# tap (including one step beyond the r >= -30 / c >= -85 data range), so
# % has identical non-negative semantics in Spark, DuckDB, and Python.


def _grid_elev_sql(r: str, c: str) -> str:
    return (
        f"((({r} + 100) * 1299721 + ({c} + 100) * 7919) * 48271"
        f" % 1000003 % 4000)"
    )


_GRID_OCC_SQL = """
    SELECT DISTINCT
           CAST(floor((-60.0 + (event_id * 11 % 120)
                       + (event_id % 83) / 83.0) / 2.0) AS BIGINT) AS r,
           CAST(floor((-170.0 + (event_id * 17 % 340)
                       + (event_id % 79) / 79.0) / 2.0) AS BIGINT) AS c
    FROM events
"""


def _grid_occ(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    lat = -60.0 + (e * 11 % 120) + (e % 83) / 83.0
    lng = -170.0 + (e * 17 % 340) + (e % 79) / 79.0
    return (
        ev.select(
            F.floor(lat / 2.0).cast("long").alias("r"),
            F.floor(lng / 2.0).cast("long").alias("c"),
        )
        .distinct()
    )


def _horn_gradients_sql():
    """dz/dx, dz/dy SQL fragments of the Horn 3x3 kernel at (r, c) —
    elevations are pure expressions, so no neighbor join at all."""
    z = {
        (dr, dc): _grid_elev_sql(f"(r + {dr})", f"(c + {dc})")
        for dr in (-1, 0, 1)
        for dc in (-1, 0, 1)
    }
    # rows: north = r+1; a..i laid out N->S, W->E (a=NW, i=SE)
    a, b_, cc = z[(1, -1)], z[(1, 0)], z[(1, 1)]
    d, f_, g = z[(0, -1)], z[(0, 1)], z[(-1, -1)]
    h, i = z[(-1, 0)], z[(-1, 1)]
    dzdx = (
        f"(CAST(({cc} + 2 * {f_} + {i}) - ({a} + 2 * {d} + {g})"
        f" AS DOUBLE) / 8.0)"
    )
    dzdy = (
        f"(CAST(({g} + 2 * {h} + {i}) - ({a} + 2 * {b_} + {cc})"
        f" AS DOUBLE) / 8.0)"
    )
    return dzdx, dzdy


def _q_horn_slope_aspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horn 3x3 slope/aspect per occupied 2-degree grid cell over the
    deterministic hash-elevation surface — the gradient companion of
    terrain_stats (TRI/TPI on the S2 grid). Because elevation is a pure
    expression of (r, c), all nine kernel taps are scalar expressions:
    the whole operator is one distinct + one codegen projection, ZERO
    joins — the cheapest possible 100-TB plan. slope = atan(|grad|),
    aspect = atan2(dz/dy, -dz/dx), both radians rounded 9."""
    _grid_occ(spark, sf_dir).createOrReplaceTempView("_horn_occ")
    dzdx, dzdy = _horn_gradients_sql()
    return spark.sql(f"""
        SELECT r, c, {_grid_elev_sql('r', 'c')} AS elev,
               round(atan(sqrt({dzdx} * {dzdx} + {dzdy} * {dzdy})), 9)
                 AS slope_rad,
               round(atan2({dzdy}, -{dzdx}), 9) AS aspect_rad
        FROM _horn_occ ORDER BY r, c
    """)


def _horn_oracle_sql() -> str:
    dzdx, dzdy = _horn_gradients_sql()
    return f"""
        WITH occ AS ({_GRID_OCC_SQL})
        SELECT r, c, {_grid_elev_sql('r', 'c')} AS elev,
               round(atan(sqrt({dzdx} * {dzdx} + {dzdy} * {dzdy})), 9)
                 AS slope_rad,
               round(atan2({dzdy}, -{dzdx}), 9) AS aspect_rad
        FROM occ ORDER BY r, c
    """


def _q_hillshade_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard analytical hillshade (sun azimuth 315 deg, altitude 45
    deg) from the Horn gradients on the shared hash-elevation grid:
    shade = 255 * max(0, cos(zen)*cos(slope) +
    sin(zen)*sin(slope)*cos(az - aspect)). Same zero-join plan as
    horn_slope_aspect; int shade 0..255 plus the float value rounded 9."""
    _grid_occ(spark, sf_dir).createOrReplaceTempView("_hs_occ")
    dzdx, dzdy = _horn_gradients_sql()
    zen = "0.7853981633974483"   # 45 deg
    az = "5.497787143782138"     # 315 deg in rad
    slope = f"atan(sqrt({dzdx} * {dzdx} + {dzdy} * {dzdy}))"
    aspect = f"atan2({dzdy}, -{dzdx})"
    shade = (
        f"greatest(0.0, cos({zen}) * cos({slope})"
        f" + sin({zen}) * sin({slope}) * cos({az} - {aspect}))"
    )
    return spark.sql(f"""
        SELECT r, c,
               CAST(floor(255.0 * {shade}) AS BIGINT) AS shade,
               round(255.0 * {shade}, 9) AS shade_f
        FROM _hs_occ ORDER BY r, c
    """)


def _hillshade_oracle_sql() -> str:
    dzdx, dzdy = _horn_gradients_sql()
    zen = "0.7853981633974483"
    az = "5.497787143782138"
    slope = f"atan(sqrt({dzdx} * {dzdx} + {dzdy} * {dzdy}))"
    aspect = f"atan2({dzdy}, -{dzdx})"
    shade = (
        f"greatest(0.0, cos({zen}) * cos({slope})"
        f" + sin({zen}) * sin({slope}) * cos({az} - {aspect}))"
    )
    return f"""
        WITH occ AS ({_GRID_OCC_SQL})
        SELECT r, c,
               CAST(floor(255.0 * {shade}) AS BIGINT) AS shade,
               round(255.0 * {shade}, 9) AS shade_f
        FROM occ ORDER BY r, c
    """


def _q_flow_direction_d8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 steepest-descent flow direction per occupied grid cell on the
    hash-elevation surface (the square-grid classic next to the
    hex-grid hex_flow_directions): direction 0..7 (E,NE,N,NW,W,SW,S,SE)
    of the largest distance-normalized drop (diagonals / sqrt(2)),
    lowest direction index wins exact ties, dir = -1 for sinks (no
    positive drop; drop_norm then reports the best non-positive drop). Pure scalar expressions again — zero joins; the
    GREATEST + CASE-first-match ladder is deterministic cross-engine."""
    _grid_occ(spark, sf_dir).createOrReplaceTempView("_d8_occ")
    sql = _d8_select_sql("_d8_occ")
    return spark.sql(sql)


_D8_DIRS = [  # (dir, dr, dc) in E,NE,N,NW,W,SW,S,SE order
    (0, 0, 1), (1, 1, 1), (2, 1, 0), (3, 1, -1),
    (4, 0, -1), (5, -1, -1), (6, -1, 0), (7, -1, 1),
]


def _d8_select_sql(src: str) -> str:
    e0 = _grid_elev_sql("r", "c")
    drops = []
    for d, dr, dc in _D8_DIRS:
        en = _grid_elev_sql(f"(r + {dr})", f"(c + {dc})")
        dist = "1.4142135623730951" if dr != 0 and dc != 0 else "1.0"
        drops.append(f"(CAST({e0} - {en} AS DOUBLE) / {dist})")
    g = "greatest(" + ", ".join(drops) + ")"
    case = "CASE " + " ".join(
        f"WHEN {drops[d]} = _g THEN {d}" for d, _, _ in _D8_DIRS
    ) + " END"
    return f"""
        SELECT r, c, elev,
               CASE WHEN _g > 0 THEN {case} ELSE -1 END AS d8_dir,
               round(_g, 9) AS drop_norm
        FROM (
          SELECT r, c, {e0} AS elev, {g} AS _g FROM {src}
        ) ORDER BY r, c
    """


def _d8_oracle_sql() -> str:
    inner = _d8_select_sql("occ")
    return f"WITH occ AS ({_GRID_OCC_SQL}) {inner}"


def _q_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta authorship distance between document sources over
    the 30 corpus-wide most-frequent tokens: z-score each source's
    relative frequency per token (mean/std across sources), then
    Delta(a,b) = mean |z_a - z_b|. The stylometry classic for attributing
    web text to origins. Every cross-row float sum (per-token moments,
    per-pair token sum) runs as a sort_array+aggregate FOLD in key order
    — the kruskal_wallis determinism pattern — so doubles are
    bit-identical cross-engine; zero-count grid cells are materialized
    explicitly so every source scores every top token."""
    docs = _load(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"[^a-z]+"),
                lambda t: F.length(t) > 0,
            )
        ).alias("token"),
    )
    cnt = toks.groupBy("source", "token").agg(F.count("*").alias("n"))
    tot = toks.groupBy("source").agg(F.count("*").alias("nt"))
    corpus = (
        toks.groupBy("token")
        .agg(F.count("*").alias("cn"))
        .orderBy(F.desc("cn"), F.asc("token"))
        .limit(30)
        .select("token")
    )
    grid = tot.crossJoin(F.broadcast(corpus))  # sources x top-30 tokens
    fr = grid.join(cnt, ["source", "token"], "left").select(
        "source",
        "token",
        (
            F.coalesce(F.col("n"), F.lit(0)).cast("double")
            / F.col("nt").cast("double")
        ).alias("f"),
    )
    st = fr.groupBy("token").agg(
        F.count("*").alias("s_n"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("source", "f"))),
            F.lit(0.0),
            lambda acc, x: acc + x["f"],
        ).alias("sum_f"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("source", "f"))),
            F.lit(0.0),
            lambda acc, x: acc + x["f"] * x["f"],
        ).alias("sum_f2"),
    )
    mu = F.col("sum_f") / F.col("s_n").cast("double")
    sig = F.sqrt(F.col("sum_f2") / F.col("s_n").cast("double") - mu * mu)
    z = fr.join(F.broadcast(st), "token").select(
        "source",
        "token",
        F.when(sig > 0, (F.col("f") - mu) / sig).otherwise(F.lit(0.0)).alias(
            "z"
        ),
    )
    a = z.select(
        F.col("source").alias("source_a"), "token", F.col("z").alias("za")
    )
    b = z.select(
        F.col("source").alias("source_b"), "token", F.col("z").alias("zb")
    )
    pairs = a.join(b, "token").where(F.col("source_a") < F.col("source_b"))
    return (
        pairs.groupBy("source_a", "source_b")
        .agg(
            F.round(
                F.aggregate(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "token",
                                F.abs(F.col("za") - F.col("zb")).alias("d"),
                            )
                        )
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x["d"],
                )
                / 30.0,
                9,
            ).alias("delta")
        )
        .orderBy("source_a", "source_b")
    )


_BURROWS_ORACLE = """
    WITH toks AS (
      SELECT source,
             unnest(list_filter(
               regexp_split_to_array(lower(text), '[^a-z]+'),
               t -> length(t) > 0)) AS token
      FROM documents
    ),
    cnt AS (
      SELECT source, token, CAST(count(*) AS BIGINT) AS n
      FROM toks GROUP BY 1, 2
    ),
    tot AS (
      SELECT source, CAST(count(*) AS BIGINT) AS nt FROM toks GROUP BY 1
    ),
    corpus AS (
      SELECT token FROM (
        SELECT token, count(*) AS cn FROM toks GROUP BY 1
      ) ORDER BY cn DESC, token LIMIT 30
    ),
    fr AS (
      SELECT g.source, g.token,
             CAST(coalesce(c.n, 0) AS DOUBLE) / CAST(g.nt AS DOUBLE) AS f
      FROM (SELECT t.source, t.nt, k.token
            FROM tot t CROSS JOIN corpus k) g
      LEFT JOIN cnt c ON c.source = g.source AND c.token = g.token
    ),
    st AS (
      SELECT token, count(*) AS s_n,
             list_reduce(list_prepend(0.0, list(f ORDER BY source)),
                         (a, b) -> a + b) AS sum_f,
             list_reduce(list_prepend(0.0, list(f * f ORDER BY source)),
                         (a, b) -> a + b) AS sum_f2
      FROM fr GROUP BY 1
    ),
    z AS (
      SELECT fr.source, fr.token,
             CASE WHEN sqrt(st.sum_f2 / CAST(st.s_n AS DOUBLE)
                            - (st.sum_f / CAST(st.s_n AS DOUBLE))
                              * (st.sum_f / CAST(st.s_n AS DOUBLE))) > 0
                  THEN (fr.f - st.sum_f / CAST(st.s_n AS DOUBLE))
                       / sqrt(st.sum_f2 / CAST(st.s_n AS DOUBLE)
                              - (st.sum_f / CAST(st.s_n AS DOUBLE))
                                * (st.sum_f / CAST(st.s_n AS DOUBLE)))
                  ELSE 0.0 END AS z
      FROM fr JOIN st ON st.token = fr.token
    )
    SELECT a.source AS source_a, b.source AS source_b,
           round(list_reduce(
                   list_prepend(0.0, list(abs(a.z - b.z) ORDER BY a.token)),
                   (x, y) -> x + y) / 30.0, 9) AS delta
    FROM z a JOIN z b ON a.token = b.token AND a.source < b.source
    GROUP BY 1, 2 ORDER BY 1, 2
"""


_HOUR_US = 3600 * 1000 * 1000


def _q_ccf_clicks_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation function between the hourly 'click' and
    'view' event-count series at lags -24..+24 hours (zero-filled over
    the full hour range, so the overlap at lag L is exactly N - |L|
    points): the lead/lag diagnostic between two web metrics. Every
    sufficient statistic (n, Sx, Sy, Sxy, Sxx, Syy) is an exact BIGINT;
    r is one fixed-order scalar expression, NULL when either side has
    zero variance in the overlap window."""
    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    hr = ev.select(
        (us / _HOUR_US).cast("long").alias("h"), "event_type"
    )
    x = hr.where(F.col("event_type") == "click").groupBy("h").agg(
        F.count("*").alias("x")
    )
    y = hr.where(F.col("event_type") == "view").groupBy("h").agg(
        F.count("*").alias("y")
    )
    rng = hr.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = rng.select(
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h")
    )
    xs = grid.join(x, "h", "left").select(
        "h", F.coalesce(F.col("x"), F.lit(0)).alias("x")
    )
    ys = grid.join(y, "h", "left").select(
        F.col("h").alias("h2"), F.coalesce(F.col("y"), F.lit(0)).alias("y")
    )
    lags = spark.range(-24, 25).select(F.col("id").alias("lag"))
    j = (
        xs.crossJoin(F.broadcast(lags))  # 49-row lag table
        .withColumn("h2", F.col("h") + F.col("lag"))
        .join(ys, "h2")
    )
    agg = j.groupBy("lag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    return agg.select(
        "lag",
        F.col("n").cast("long").alias("n_hours"),
        F.when(
            (vx > 0) & (vy > 0),
            F.round(
                num
                / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))), 9
            ),
        ).alias("r_ccf"),
    ).orderBy("lag")


_CCF_ORACLE = """
    WITH hr AS (
      SELECT epoch_us(ts) // 3600000000 AS h, event_type FROM events
    ),
    rng AS (SELECT min(h) AS h0, max(h) AS h1 FROM hr),
    grid AS (
      SELECT unnest(generate_series(h0, h1)) AS h FROM rng
    ),
    xs AS (
      SELECT g.h, CAST(coalesce(c.n, 0) AS BIGINT) AS x
      FROM grid g LEFT JOIN (
        SELECT h, count(*) AS n FROM hr WHERE event_type = 'click'
        GROUP BY 1) c ON c.h = g.h
    ),
    ys AS (
      SELECT g.h AS h2, CAST(coalesce(c.n, 0) AS BIGINT) AS y
      FROM grid g LEFT JOIN (
        SELECT h, count(*) AS n FROM hr WHERE event_type = 'view'
        GROUP BY 1) c ON c.h = g.h
    ),
    j AS (
      SELECT l.lag, xs.x, ys.y
      FROM xs CROSS JOIN (
        SELECT unnest(generate_series(-24, 24)) AS lag) l
      JOIN ys ON ys.h2 = xs.h + l.lag
    ),
    agg AS (
      SELECT lag, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM j GROUP BY 1
    )
    SELECT lag, n AS n_hours,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                           / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                              * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 9)
           END AS r_ccf
    FROM agg ORDER BY lag
"""


def _q_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent by rescaled-range (R/S) analysis of the hourly
    total event-count series (zero-filled): for block sizes m in
    {8,16,32,64}, R = range of the mean-adjusted cumulative sum within
    each complete block, S = population std (from exact BIGINT block
    sums), H = OLS slope of log2(mean R/S) on log2(m) — with the fixed
    abscissae 3..6 the slope is a closed-form weighted sum. The
    long-memory diagnostic for traffic series. The only float
    accumulations (the in-block cumulative walk and the cross-block R/S
    mean) run as deterministic folds in index order."""
    from pyspark.sql import Window as _W

    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    hr = ev.select((us / _HOUR_US).cast("long").alias("h"))
    cnts = hr.groupBy("h").agg(F.count("*").alias("x"))
    rng = hr.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    series = (
        rng.select(
            F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h"),
            F.col("h0"),
        )
        .join(cnts, "h", "left")
        .select(
            (F.col("h") - F.col("h0")).alias("i"),
            F.coalesce(F.col("x"), F.lit(0)).alias("x"),
        )
    )
    ms = spark.createDataFrame([(8,), (16,), (32,), (64,)], "m long")
    blocks = (
        series.crossJoin(F.broadcast(ms))
        .withColumn("blk", (F.col("i") / F.col("m")).cast("long"))
        .withColumn("n_total", F.count("*").over(_W.partitionBy("m")))
    )
    complete = blocks.where(
        F.col("blk") < (F.col("n_total") / F.col("m")).cast("long")
    )
    per = complete.groupBy("m", "blk").agg(
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.array_sort(
            F.collect_list(
                F.struct(F.col("i"), F.col("x").cast("double").alias("v"))
            )
        ).alias("vals"),
    )
    mean = F.col("sx").cast("double") / F.col("m").cast("double")
    walk = F.aggregate(
        F.col("vals"),
        F.array(F.lit(0.0), F.lit(0.0), F.lit(0.0)),  # (cum, max, min)
        lambda acc, v: F.array(
            acc[0] + v["v"] - mean,
            F.greatest(acc[1], acc[0] + v["v"] - mean),
            F.least(acc[2], acc[0] + v["v"] - mean),
        ),
    )
    s2 = F.col("sxx").cast("double") / F.col("m").cast("double") - mean * mean
    rs = per.select(
        "m",
        "blk",
        ((walk[1] - walk[2]) / F.sqrt(s2)).alias("rs"),
        s2.alias("s2"),
    ).where(F.col("s2") > 0)
    bym = rs.groupBy("m").agg(
        F.count("*").alias("n_blocks"),
        (
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("blk", "rs"))),
                F.lit(0.0),
                lambda acc, x: acc + x["rs"],
            )
            / F.count("*").cast("double")
        ).alias("mean_rs"),
    )
    piv = bym.agg(
        *[
            F.max(
                F.when(F.col("m") == mm, F.log2(F.col("mean_rs")))
            ).alias(f"y{mm}")
            for mm in (8, 16, 32, 64)
        ]
    )
    hurst = (
        (
            -1.5 * F.col("y8")
            - 0.5 * F.col("y16")
            + 0.5 * F.col("y32")
            + 1.5 * F.col("y64")
        )
        / 5.0
    )
    return (
        bym.crossJoin(F.broadcast(piv.select(hurst.alias("hurst"))))
        .select(
            "m",
            "n_blocks",
            F.round("mean_rs", 9).alias("mean_rs"),
            F.round("hurst", 9).alias("hurst"),
        )
        .orderBy("m")
    )


_HURST_ORACLE = """
    WITH hr AS (
      SELECT epoch_us(ts) // 3600000000 AS h FROM events
    ),
    rng0 AS (SELECT min(h) AS h0, max(h) AS h1 FROM hr),
    series AS (
      SELECT g.h - r.h0 AS i, CAST(coalesce(c.n, 0) AS BIGINT) AS x
      FROM (SELECT unnest(generate_series(h0, h1)) AS h FROM rng0) g
      CROSS JOIN rng0 r
      LEFT JOIN (SELECT h, count(*) AS n FROM hr GROUP BY 1) c
        ON c.h = g.h
    ),
    ms AS (SELECT unnest([8, 16, 32, 64]) AS m),
    blocks AS (
      SELECT s.i, s.x, ms.m, s.i // ms.m AS blk,
             (SELECT count(*) FROM series) AS n_total
      FROM series s CROSS JOIN ms
    ),
    complete AS (
      SELECT * FROM blocks WHERE blk < n_total // m
    ),
    per AS (
      SELECT m, blk, CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             list(CAST(x AS DOUBLE) ORDER BY i) AS vals
      FROM complete GROUP BY 1, 2
    ),
    walked AS (
      SELECT m, blk, sx, sxx,
             CAST(sx AS DOUBLE) / CAST(m AS DOUBLE) AS mean,
             list_reduce(
               list_prepend([0.0, 0.0, 0.0],
                 list_transform(vals, v -> [v, 0.0, 0.0])),
               (acc, v) -> [
                 acc[1] + v[1] - CAST(sx AS DOUBLE) / CAST(m AS DOUBLE),
                 greatest(acc[2],
                   acc[1] + v[1] - CAST(sx AS DOUBLE) / CAST(m AS DOUBLE)),
                 least(acc[3],
                   acc[1] + v[1] - CAST(sx AS DOUBLE) / CAST(m AS DOUBLE))
               ]) AS w
      FROM per
    ),
    rs AS (
      SELECT m, blk,
             (w[2] - w[3]) / sqrt(CAST(sxx AS DOUBLE) / CAST(m AS DOUBLE)
                                  - mean * mean) AS rs
      FROM walked
      WHERE CAST(sxx AS DOUBLE) / CAST(m AS DOUBLE) - mean * mean > 0
    ),
    bym AS (
      SELECT m, CAST(count(*) AS BIGINT) AS n_blocks,
             list_reduce(list_prepend(0.0, list(rs ORDER BY blk)),
                         (a, b) -> a + b) / CAST(count(*) AS DOUBLE)
               AS mean_rs
      FROM rs GROUP BY 1
    ),
    piv AS (
      SELECT (-1.5 * max(CASE WHEN m = 8 THEN log2(mean_rs) END)
              - 0.5 * max(CASE WHEN m = 16 THEN log2(mean_rs) END)
              + 0.5 * max(CASE WHEN m = 32 THEN log2(mean_rs) END)
              + 1.5 * max(CASE WHEN m = 64 THEN log2(mean_rs) END)) / 5.0
               AS hurst
      FROM bym
    )
    SELECT m, n_blocks, round(mean_rs, 9) AS mean_rs,
           round(hurst, 9) AS hurst
    FROM bym CROSS JOIN piv ORDER BY m
"""


def _q_home_work_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Home/work anchor detection per user: the modal 2-degree grid tile
    during night hours (00-06 local, 'home') vs working hours (09-17,
    'work'), with the great-circle distance between tile centers as the
    commute length — the standard mobility-mining anchor model. Modal
    pick is a deterministic (count DESC, r, c) row_number; users lacking
    either period are dropped. Counts exact; one distance per user."""
    from pyspark.sql import Window

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    lat = -60.0 + (e * 11 % 120) + (e % 83) / 83.0
    lng = -170.0 + (e * 17 % 340) + (e % 79) / 79.0
    hod = (us / _HOUR_US).cast("long") % 24
    base = ev.select(
        "user_id",
        hod.alias("hod"),
        F.floor(lat / 2.0).cast("long").alias("r"),
        F.floor(lng / 2.0).cast("long").alias("c"),
    ).withColumn(
        "period",
        F.when(F.col("hod") <= 6, F.lit("home"))
        .when((F.col("hod") >= 9) & (F.col("hod") <= 17), F.lit("work")),
    ).where(F.col("period").isNotNull())
    cnt = base.groupBy("user_id", "period", "r", "c").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("user_id", "period").orderBy(
        F.desc("n"), F.asc("r"), F.asc("c")
    )
    modal = cnt.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    )
    home = modal.where(F.col("period") == "home").select(
        "user_id",
        F.col("r").alias("home_r"), F.col("c").alias("home_c"),
        F.col("n").alias("n_home"),
    )
    work = modal.where(F.col("period") == "work").select(
        "user_id",
        F.col("r").alias("work_r"), F.col("c").alias("work_c"),
        F.col("n").alias("n_work"),
    )
    j = home.join(work, "user_id")

    def _v(rr, cc):
        la = F.radians(2.0 * F.col(rr) + 1.0)
        lo = F.radians(2.0 * F.col(cc) + 1.0)
        return (
            F.cos(lo) * F.cos(la), F.sin(lo) * F.cos(la), F.sin(la)
        )

    ax, ay, az = _v("home_r", "home_c")
    bx, by, bz = _v("work_r", "work_c")
    cx, cy, cz = ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx
    dist = F.atan2(
        F.sqrt(cx * cx + cy * cy + cz * cz), ax * bx + ay * by + az * bz
    )
    return j.select(
        "user_id", "home_r", "home_c", "n_home", "work_r", "work_c",
        "n_work", F.round(dist, 9).alias("commute_rad"),
    ).orderBy("user_id")


_HOMEWORK_ORACLE = """
    WITH base AS (
      SELECT user_id,
             CASE WHEN (epoch_us(ts) // 3600000000) % 24 <= 6 THEN 'home'
                  WHEN (epoch_us(ts) // 3600000000) % 24 BETWEEN 9 AND 17
                    THEN 'work' END AS period,
             CAST(floor((-60.0 + (event_id * 11 % 120)
                         + (event_id % 83) / 83.0) / 2.0) AS BIGINT) AS r,
             CAST(floor((-170.0 + (event_id * 17 % 340)
                         + (event_id % 79) / 79.0) / 2.0) AS BIGINT) AS c
      FROM events
    ),
    cnt AS (
      SELECT user_id, period, r, c, count(*) AS n
      FROM base WHERE period IS NOT NULL GROUP BY 1, 2, 3, 4
    ),
    modal AS (
      SELECT *, row_number() OVER (PARTITION BY user_id, period
                                   ORDER BY n DESC, r, c) AS rn
      FROM cnt
    ),
    j AS (
      SELECT h.user_id,
             h.r AS home_r, h.c AS home_c, CAST(h.n AS BIGINT) AS n_home,
             w.r AS work_r, w.c AS work_c, CAST(w.n AS BIGINT) AS n_work
      FROM modal h JOIN modal w
        ON w.user_id = h.user_id AND w.period = 'work' AND w.rn = 1
      WHERE h.period = 'home' AND h.rn = 1
    ),
    v AS (
      SELECT j.*,
             cos(radians(2.0 * home_c + 1.0))
               * cos(radians(2.0 * home_r + 1.0)) AS ax,
             sin(radians(2.0 * home_c + 1.0))
               * cos(radians(2.0 * home_r + 1.0)) AS ay,
             sin(radians(2.0 * home_r + 1.0)) AS az,
             cos(radians(2.0 * work_c + 1.0))
               * cos(radians(2.0 * work_r + 1.0)) AS bx,
             sin(radians(2.0 * work_c + 1.0))
               * cos(radians(2.0 * work_r + 1.0)) AS by_,
             sin(radians(2.0 * work_r + 1.0)) AS bz
      FROM j
    )
    SELECT user_id, home_r, home_c, n_home, work_r, work_c, n_work,
           round(atan2(sqrt(
                   (ay * bz - az * by_) * (ay * bz - az * by_)
                 + (az * bx - ax * bz) * (az * bx - ax * bz)
                 + (ax * by_ - ay * bx) * (ax * by_ - ay * bx)),
                 ax * bx + ay * by_ + az * bz), 9) AS commute_rad
    FROM v ORDER BY user_id
"""


def _q_gap_log_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap histogram per user in ORDER-OF-MAGNITUDE buckets:
    bucket = decimal digit count of the gap in microseconds (0 for
    exact-tie timestamps) — an integer-exact log-scale binning that
    needs no float log2 at bucket edges. One user-keyed lag window + one
    global agg; min/max per bucket are exact BIGINT microseconds."""
    from pyspark.sql import Window

    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gaps = (
        ev.select("user_id", us.alias("us"), "event_id")
        .withColumn("prev", F.lag("us").over(w))
        .where(F.col("prev").isNotNull())
        .select((F.col("us") - F.col("prev")).alias("gap_us"))
    )
    bucket = F.when(F.col("gap_us") == 0, F.lit(0)).otherwise(
        F.length(F.col("gap_us").cast("string"))
    )
    return (
        gaps.groupBy(bucket.cast("long").alias("bucket"))
        .agg(
            F.count("*").alias("n_gaps"),
            F.min("gap_us").alias("min_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
        )
        .orderBy("bucket")
    )


_GAP_HIST_ORACLE = """
    WITH gaps AS (
      SELECT us - lag(us) OVER (PARTITION BY user_id
                                ORDER BY us, event_id) AS gap_us
      FROM (SELECT user_id, epoch_us(ts) AS us, event_id FROM events)
    )
    SELECT CAST(CASE WHEN gap_us = 0 THEN 0
                     ELSE length(CAST(gap_us AS VARCHAR)) END AS BIGINT)
             AS bucket,
           CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(min(gap_us) AS BIGINT) AS min_gap_us,
           CAST(max(gap_us) AS BIGINT) AS max_gap_us
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY 1 ORDER BY 1
"""


def _q_dwell_time_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tile dwell time: each event contributes the microseconds
    until ITS USER's next event to the 2-degree tile the event sits in
    (last event per user contributes nothing) — the time-weighted
    popularity surface behind stay_points. One user-keyed lead window +
    one tile agg; totals exact BIGINT, mean one pinned division."""
    from pyspark.sql import Window

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    lat = -60.0 + (e * 11 % 120) + (e % 83) / 83.0
    lng = -170.0 + (e * 17 % 340) + (e % 79) / 79.0
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    rows = (
        ev.select(
            "user_id", us.alias("us"), "event_id",
            F.floor(lat / 2.0).cast("long").alias("r"),
            F.floor(lng / 2.0).cast("long").alias("c"),
        )
        .withColumn("nxt", F.lead("us").over(w))
        .where(F.col("nxt").isNotNull())
    )
    return (
        rows.groupBy("r", "c")
        .agg(
            F.count("*").alias("n_visits"),
            F.sum(F.col("nxt") - F.col("us")).alias("total_dwell_us"),
        )
        .select(
            "r", "c", "n_visits", "total_dwell_us",
            F.round(
                F.col("total_dwell_us").cast("double")
                / F.col("n_visits").cast("double"),
                9,
            ).alias("mean_dwell_us"),
        )
        .orderBy("r", "c")
    )


_DWELL_ORACLE = """
    WITH rows_ AS (
      SELECT CAST(floor((-60.0 + (event_id * 11 % 120)
                         + (event_id % 83) / 83.0) / 2.0) AS BIGINT) AS r,
             CAST(floor((-170.0 + (event_id * 17 % 340)
                         + (event_id % 79) / 79.0) / 2.0) AS BIGINT) AS c,
             lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
               - us AS dwell
      FROM (SELECT user_id, epoch_us(ts) AS us, event_id FROM events)
    )
    SELECT r, c, CAST(count(*) AS BIGINT) AS n_visits,
           CAST(sum(dwell) AS BIGINT) AS total_dwell_us,
           round(CAST(sum(dwell) AS DOUBLE) / CAST(count(*) AS DOUBLE), 9)
             AS mean_dwell_us
    FROM rows_ WHERE dwell IS NOT NULL
    GROUP BY 1, 2 ORDER BY 1, 2
"""


def _q_albers_coordinates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Albers equal-area conic projection (spark/geodesy.py
    albers_steps, Snyder 1987 sec. 14, contiguous-US parameters) of the
    customer points, rolled up per 10-degree latitude band with
    micrometer-quantized BIGINT coordinate sums — the equal-area
    companion of utm_coordinates, same textual-twin chain discipline."""
    from gos2_spark.spark.geodesy import albers_steps, apply_steps

    pts = _cust_points(spark, sf_dir).select("key", "lat", "lng")
    prj = apply_steps(pts, albers_steps())
    return (
        prj.groupBy(F.floor(F.col("lat") / 10.0).cast("long").alias("band"))
        .agg(
            F.count("*").alias("n_points"),
            (
                F.sum(F.round(F.col("x_albers") * 1e6).cast("long")).cast(
                    "double"
                )
                / 1e6
            ).alias("sum_x"),
            (
                F.sum(F.round(F.col("y_albers") * 1e6).cast("long")).cast(
                    "double"
                )
                / 1e6
            ).alias("sum_y"),
        )
        .orderBy("band")
    )


def _albers_oracle_sql() -> str:
    from gos2_spark.spark.geodesy import albers_steps, duckdb_steps_cte

    base = f"g0 AS (SELECT key, lat, lng FROM ({_CUST_LATLNG_SQL}))"
    body, last = duckdb_steps_cte(base, albers_steps())
    return f"""
        WITH {body}
        SELECT CAST(floor(lat / 10.0) AS BIGINT) AS band,
               CAST(count(*) AS BIGINT) AS n_points,
               CAST(sum(CAST(round(x_albers * 1e6) AS BIGINT)) AS DOUBLE)
                 / 1e6 AS sum_x,
               CAST(sum(CAST(round(y_albers * 1e6) AS BIGINT)) AS DOUBLE)
                 / 1e6 AS sum_y
        FROM {last}
        GROUP BY 1 ORDER BY 1
    """


def _q_lcc_coordinates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lambert conformal conic projection (spark/geodesy.py lcc_steps,
    Snyder 1987 sec. 15) of the customer points, same 10-degree-band
    micrometer-quantized rollup as albers_coordinates — the conformal
    member completing the UTM / web-Mercator / Albers / LCC projection
    family."""
    from gos2_spark.spark.geodesy import apply_steps, lcc_steps

    pts = _cust_points(spark, sf_dir).select("key", "lat", "lng")
    prj = apply_steps(pts, lcc_steps())
    return (
        prj.groupBy(F.floor(F.col("lat") / 10.0).cast("long").alias("band"))
        .agg(
            F.count("*").alias("n_points"),
            (
                F.sum(F.round(F.col("x_lcc") * 1e6).cast("long")).cast(
                    "double"
                )
                / 1e6
            ).alias("sum_x"),
            (
                F.sum(F.round(F.col("y_lcc") * 1e6).cast("long")).cast(
                    "double"
                )
                / 1e6
            ).alias("sum_y"),
        )
        .orderBy("band")
    )


def _lcc_oracle_sql() -> str:
    from gos2_spark.spark.geodesy import duckdb_steps_cte, lcc_steps

    base = f"g0 AS (SELECT key, lat, lng FROM ({_CUST_LATLNG_SQL}))"
    body, last = duckdb_steps_cte(base, lcc_steps())
    return f"""
        WITH {body}
        SELECT CAST(floor(lat / 10.0) AS BIGINT) AS band,
               CAST(count(*) AS BIGINT) AS n_points,
               CAST(sum(CAST(round(x_lcc * 1e6) AS BIGINT)) AS DOUBLE)
                 / 1e6 AS sum_x,
               CAST(sum(CAST(round(y_lcc * 1e6) AS BIGINT)) AS DOUBLE)
                 / 1e6 AS sum_y
        FROM {last}
        GROUP BY 1 ORDER BY 1
    """


def _gci_body_sql(src: str) -> str:
    """Dialect-shared SQL from a (key, lat, lng) relation to pairwise
    great-circle segment intersections of the 8 segments spanned by the
    16 smallest keys. The closed-form GetIntersection construction
    (geometry/boolean_ops.py:28; s2's edge crossing): candidate point
    i = (a1 x b1) x (a2 x b2); i (or -i) intersects iff it lies on the
    minor arc of BOTH segments via the cross(a,p).n / cross(p,b).n sign
    tests. atan2 recovers lat/lng without normalizing."""
    return f"""
        WITH sel AS (
          SELECT key, lat, lng FROM {src} ORDER BY key LIMIT 16
        ),
        rn AS (
          SELECT lat, lng,
                 row_number() OVER (ORDER BY key) - 1 AS idx
          FROM sel
        ),
        ends AS (
          SELECT CAST(idx % 8 AS BIGINT) AS seg,
                 CAST(floor(idx / 8.0) AS BIGINT) AS ep, lat, lng
          FROM rn
        ),
        segs AS (
          SELECT seg,
                 max(CASE WHEN ep = 0 THEN lat END) AS la0,
                 max(CASE WHEN ep = 0 THEN lng END) AS lo0,
                 max(CASE WHEN ep = 1 THEN lat END) AS la1,
                 max(CASE WHEN ep = 1 THEN lng END) AS lo1
          FROM ends GROUP BY 1
        ),
        v AS (
          SELECT seg,
                 cos(radians(lo0)) * cos(radians(la0)) AS ax,
                 sin(radians(lo0)) * cos(radians(la0)) AS ay,
                 sin(radians(la0)) AS az,
                 cos(radians(lo1)) * cos(radians(la1)) AS bx,
                 sin(radians(lo1)) * cos(radians(la1)) AS by_,
                 sin(radians(la1)) AS bz
          FROM segs
        ),
        n AS (
          SELECT seg, ax, ay, az, bx, by_, bz,
                 ay * bz - az * by_ AS nx,
                 az * bx - ax * bz AS ny,
                 ax * by_ - ay * bx AS nz
          FROM v
        ),
        pairs AS (
          SELECT i.seg AS seg_a, j.seg AS seg_b,
                 i.ax AS a1x, i.ay AS a1y, i.az AS a1z,
                 i.bx AS b1x, i.by_ AS b1y, i.bz AS b1z,
                 i.nx AS n1x, i.ny AS n1y, i.nz AS n1z,
                 j.ax AS a2x, j.ay AS a2y, j.az AS a2z,
                 j.bx AS b2x, j.by_ AS b2y, j.bz AS b2z,
                 j.nx AS n2x, j.ny AS n2y, j.nz AS n2z,
                 i.ny * j.nz - i.nz * j.ny AS ix,
                 i.nz * j.nx - i.nx * j.nz AS iy,
                 i.nx * j.ny - i.ny * j.nx AS iz
          FROM n i JOIN n j ON i.seg < j.seg
        ),
        tests AS (
          SELECT *,
                 ((a1y * iz - a1z * iy) * n1x + (a1z * ix - a1x * iz) * n1y
                  + (a1x * iy - a1y * ix) * n1z) >= 0
                 AND ((iy * b1z - iz * b1y) * n1x + (iz * b1x - ix * b1z) * n1y
                  + (ix * b1y - iy * b1x) * n1z) >= 0
                 AND ((a2y * iz - a2z * iy) * n2x + (a2z * ix - a2x * iz) * n2y
                  + (a2x * iy - a2y * ix) * n2z) >= 0
                 AND ((iy * b2z - iz * b2y) * n2x + (iz * b2x - ix * b2z) * n2y
                  + (ix * b2y - iy * b2x) * n2z) >= 0 AS pos_in,
                 ((a1y * (-iz) - a1z * (-iy)) * n1x
                  + (a1z * (-ix) - a1x * (-iz)) * n1y
                  + (a1x * (-iy) - a1y * (-ix)) * n1z) >= 0
                 AND (((-iy) * b1z - (-iz) * b1y) * n1x
                  + ((-iz) * b1x - (-ix) * b1z) * n1y
                  + ((-ix) * b1y - (-iy) * b1x) * n1z) >= 0
                 AND ((a2y * (-iz) - a2z * (-iy)) * n2x
                  + (a2z * (-ix) - a2x * (-iz)) * n2y
                  + (a2x * (-iy) - a2y * (-ix)) * n2z) >= 0
                 AND (((-iy) * b2z - (-iz) * b2y) * n2x
                  + ((-iz) * b2x - (-ix) * b2z) * n2y
                  + ((-ix) * b2y - (-iy) * b2x) * n2z) >= 0 AS neg_in
          FROM pairs
        )
        SELECT seg_a, seg_b,
               CAST(pos_in OR neg_in AS BOOLEAN) AS intersects,
               CASE WHEN pos_in THEN
                 round(degrees(atan2(iz, sqrt(ix * ix + iy * iy))), 9)
               WHEN neg_in THEN
                 round(degrees(atan2(-iz, sqrt(ix * ix + iy * iy))), 9)
               ELSE 0.0 END AS int_lat,
               CASE WHEN pos_in THEN round(degrees(atan2(iy, ix)), 9)
               WHEN neg_in THEN round(degrees(atan2(-iy, -ix)), 9)
               ELSE 0.0 END AS int_lng
        FROM tests ORDER BY seg_a, seg_b
    """


def _q_gc_intersections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise great-circle segment intersections (see _gci_body_sql;
    GetIntersection parity with geometry/boolean_ops.py:28) of the 8
    route segments spanned by the 16 smallest customer points. The
    entire op is the closed-form double-cross-product construction in
    shared SQL text, so both engines run identical fixed-order IEEE
    math; pairwise over route sets, not data-quadratic. Segment s joins
    the s-th and (s+8)-th smallest keys, giving hemisphere-scale arcs
    that genuinely cross."""
    pts = _cust_points(spark, sf_dir).select("key", "lat", "lng")
    pts.createOrReplaceTempView("_gci_pts")
    return spark.sql(_gci_body_sql("_gci_pts"))


def _gci_oracle_sql() -> str:
    return _gci_body_sql(f"({_CUST_LATLNG_SQL})")


def _q_mrr_map_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR and MAP@10 of the BM25 rankings against the same
    deterministic graded relevance as ndcg_bm25 (rel = doc_id mod 4;
    binary-relevant = rel >= 2): reciprocal rank of the first relevant
    hit (0 when none) and average precision over the retrieved set
    (precision@k summed at relevant ranks / relevant-in-top-10,
    documented convention matching the NDCG one). Cumulative hits are an
    exact-rank window; AP folds precision terms in rank order."""
    from pyspark.sql import Window

    ranked = _q_bm25_topk(spark, sf_dir).select(
        "query_id", "rank", "doc_id",
        ((F.col("doc_id") % 4) >= 2).cast("long").alias("is_rel"),
    )
    w = Window.partitionBy("query_id").orderBy("rank").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = ranked.withColumn("hits", F.sum("is_rel").over(w))
    per = cum.groupBy("query_id").agg(
        F.sum("is_rel").alias("n_rel"),
        F.min(F.when(F.col("is_rel") == 1, F.col("rank"))).alias("_first"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "rank",
                        (
                            F.col("is_rel").cast("double")
                            * F.col("hits").cast("double")
                            / F.col("rank").cast("double")
                        ).alias("p"),
                    )
                )
            ),
            F.lit(0.0),
            lambda a, x: a + x["p"],
        ).alias("_psum"),
    )
    return per.select(
        "query_id",
        F.col("n_rel").cast("long").alias("n_rel"),
        F.coalesce(F.col("_first"), F.lit(0)).cast("long").alias(
            "first_rel_rank"
        ),
        F.round(
            F.when(
                F.col("_first").isNotNull(),
                1.0 / F.col("_first").cast("double"),
            ).otherwise(F.lit(0.0)),
            9,
        ).alias("rr"),
        F.round(
            F.when(
                F.col("n_rel") > 0,
                F.col("_psum") / F.col("n_rel").cast("double"),
            ).otherwise(F.lit(0.0)),
            9,
        ).alias("ap"),
    ).orderBy("query_id")


def _mrr_map_oracle_sql() -> str:
    inner = _bm25_oracle_sql(10)
    return f"""
        WITH bm AS ({inner}),
        r AS (
          SELECT query_id, rank,
                 CASE WHEN doc_id % 4 >= 2 THEN 1 ELSE 0 END AS is_rel
          FROM bm
        ),
        cum AS (
          SELECT query_id, rank, is_rel,
                 sum(is_rel) OVER (PARTITION BY query_id ORDER BY rank
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS hits
          FROM r
        ),
        per AS (
          SELECT query_id,
                 CAST(sum(is_rel) AS BIGINT) AS n_rel,
                 min(CASE WHEN is_rel = 1 THEN rank END) AS first_,
                 list_reduce(list_prepend(0.0,
                   list(CAST(is_rel AS DOUBLE) * CAST(hits AS DOUBLE)
                        / CAST(rank AS DOUBLE) ORDER BY rank)),
                   (a, b) -> a + b) AS psum
          FROM cum GROUP BY 1
        )
        SELECT query_id, n_rel,
               CAST(coalesce(first_, 0) AS BIGINT) AS first_rel_rank,
               round(CASE WHEN first_ IS NOT NULL
                          THEN 1.0 / CAST(first_ AS DOUBLE)
                          ELSE 0.0 END, 9) AS rr,
               round(CASE WHEN n_rel > 0
                          THEN psum / CAST(n_rel AS DOUBLE)
                          ELSE 0.0 END, 9) AS ap
        FROM per ORDER BY query_id
    """


def _q_pearson_daily_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix of the zero-filled daily
    count series of every event-type pair — the parametric companion of
    spearman_daily. All sufficient statistics (n, Sx, Sy, Sxy, Sxx, Syy)
    are exact BIGINTs over the shared day grid; one guarded fixed-order
    division per pair."""
    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    d = ev.select(
        (us / (86400 * 1000 * 1000)).cast("long").alias("day"), "event_type"
    )
    cnt = d.groupBy("day", "event_type").agg(F.count("*").alias("n"))
    rng = d.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    grid = rng.select(
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day")
    )
    types = d.select("event_type").distinct()
    full = (
        grid.crossJoin(F.broadcast(types))  # day grid x small type dim
        .join(cnt, ["day", "event_type"], "left")
        .select(
            "day", "event_type",
            F.coalesce(F.col("n"), F.lit(0)).alias("x"),
        )
    )
    a = full.select(
        "day", F.col("event_type").alias("type_a"), F.col("x").alias("xa")
    )
    b = full.select(
        "day", F.col("event_type").alias("type_b"), F.col("x").alias("xb")
    )
    j = a.join(b, "day").where(F.col("type_a") < F.col("type_b"))
    agg = j.groupBy("type_a", "type_b").agg(
        F.count("*").alias("n"),
        F.sum("xa").alias("sx"),
        F.sum("xb").alias("sy"),
        F.sum(F.col("xa") * F.col("xb")).alias("sxy"),
        F.sum(F.col("xa") * F.col("xa")).alias("sxx"),
        F.sum(F.col("xb") * F.col("xb")).alias("syy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return agg.select(
        "type_a", "type_b",
        F.col("n").cast("long").alias("n_days"),
        F.when(
            (vx > 0) & (vy > 0),
            F.round(
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                    "double"
                )
                / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
                9,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("pearson_r"),
    ).orderBy("type_a", "type_b")


_PEARSON_MATRIX_ORACLE = """
    WITH d AS (
      SELECT epoch_us(ts) // 86400000000 AS day, event_type FROM events
    ),
    rng AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
    grid AS (SELECT unnest(generate_series(d0, d1)) AS day FROM rng),
    types AS (SELECT DISTINCT event_type FROM d),
    full_ AS (
      SELECT g.day, t.event_type,
             CAST(coalesce(c.n, 0) AS BIGINT) AS x
      FROM grid g CROSS JOIN types t
      LEFT JOIN (SELECT day, event_type, count(*) AS n FROM d
                 GROUP BY 1, 2) c
        ON c.day = g.day AND c.event_type = t.event_type
    ),
    j AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.x AS xa, b.x AS xb
      FROM full_ a JOIN full_ b
        ON a.day = b.day AND a.event_type < b.event_type
    ),
    agg AS (
      SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(xa) AS BIGINT) AS sx, CAST(sum(xb) AS BIGINT) AS sy,
             CAST(sum(xa * xb) AS BIGINT) AS sxy,
             CAST(sum(xa * xa) AS BIGINT) AS sxx,
             CAST(sum(xb * xb) AS BIGINT) AS syy
      FROM j GROUP BY 1, 2
    )
    SELECT type_a, type_b, n AS n_days,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                           / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                              * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 9)
                ELSE 0.0 END AS pearson_r
    FROM agg ORDER BY 1, 2
"""


def _mec_body_sql(src: str) -> str:
    """Dialect-shared SQL: exact minimum enclosing spherical cap of the
    48 smallest-key points by brute candidate enumeration — every
    2-point candidate (center = normalized midpoint) and every 3-point
    candidate (center = +/- unit normal of the plane through the three
    points, the spherical circumcenter), keep candidates covering ALL
    points within radius + 1e-9, pick the minimum radius (candidate id
    breaks exact ties). The classical MEC characterization: the optimum
    is determined by 2 or 3 support points."""
    return f"""
        WITH sel AS (
          SELECT key, lat, lng FROM {src} ORDER BY key LIMIT 48
        ),
        v AS (
          SELECT key,
                 cos(radians(lng)) * cos(radians(lat)) AS x,
                 sin(radians(lng)) * cos(radians(lat)) AS y,
                 sin(radians(lat)) AS z
          FROM sel
        ),
        pair_c AS (
          SELECT a.key * 1000000 + b.key AS cand_id,
                 (a.x + b.x) / sqrt((a.x + b.x) * (a.x + b.x)
                   + (a.y + b.y) * (a.y + b.y)
                   + (a.z + b.z) * (a.z + b.z)) AS cx,
                 (a.y + b.y) / sqrt((a.x + b.x) * (a.x + b.x)
                   + (a.y + b.y) * (a.y + b.y)
                   + (a.z + b.z) * (a.z + b.z)) AS cy,
                 (a.z + b.z) / sqrt((a.x + b.x) * (a.x + b.x)
                   + (a.y + b.y) * (a.y + b.y)
                   + (a.z + b.z) * (a.z + b.z)) AS cz
          FROM v a JOIN v b ON a.key < b.key
        ),
        tri_n AS (
          SELECT a.key * 1000000000000 + b.key * 1000000 + c.key AS tid,
                 (b.y - a.y) * (c.z - a.z) - (b.z - a.z) * (c.y - a.y) AS nx,
                 (b.z - a.z) * (c.x - a.x) - (b.x - a.x) * (c.z - a.z) AS ny,
                 (b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x) AS nz
          FROM v a JOIN v b ON a.key < b.key JOIN v c ON b.key < c.key
        ),
        tri_c AS (
          SELECT tid * 2 AS cand_id,
                 nx / sqrt(nx * nx + ny * ny + nz * nz) AS cx,
                 ny / sqrt(nx * nx + ny * ny + nz * nz) AS cy,
                 nz / sqrt(nx * nx + ny * ny + nz * nz) AS cz
          FROM tri_n WHERE nx * nx + ny * ny + nz * nz > 0
          UNION ALL
          SELECT tid * 2 + 1,
                 -nx / sqrt(nx * nx + ny * ny + nz * nz),
                 -ny / sqrt(nx * nx + ny * ny + nz * nz),
                 -nz / sqrt(nx * nx + ny * ny + nz * nz)
          FROM tri_n WHERE nx * nx + ny * ny + nz * nz > 0
        ),
        cands AS (
          SELECT * FROM pair_c UNION ALL SELECT * FROM tri_c
        ),
        cov AS (
          SELECT cand_id, cx, cy, cz,
                 max(acos(greatest(-1.0, least(1.0,
                   cx * v.x + cy * v.y + cz * v.z)))) AS radius
          FROM cands CROSS JOIN v
          GROUP BY 1, 2, 3, 4
        ),
        best AS (
          SELECT * FROM cov ORDER BY radius, cand_id LIMIT 1
        )
        SELECT CAST(48 AS BIGINT) AS n_points,
               CAST(cand_id AS BIGINT) AS cand_id,
               round(degrees(atan2(cz, sqrt(cx * cx + cy * cy))), 9)
                 AS center_lat,
               round(degrees(atan2(cy, cx)), 9) AS center_lng,
               round(radius, 9) AS radius_rad
        FROM best
    """


def _q_min_enclosing_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact minimum enclosing spherical cap (see _mec_body_sql) of the
    48 smallest customer points — the spherical smallest-enclosing-
    circle problem solved by full support-set enumeration (pairs +
    triples), the brute-exact companion of cap_bounds_per_user's
    streaming CapBound. Cohort-bounded cubic enumeration (~36k
    candidates x 48 coverage checks) in shared SQL text, identical
    fixed-order IEEE math in both engines."""
    pts = _cust_points(spark, sf_dir).select("key", "lat", "lng")
    pts.createOrReplaceTempView("_mec_pts")
    return spark.sql(_mec_body_sql("_mec_pts"))


def _mec_oracle_sql() -> str:
    return _mec_body_sql(f"({_CUST_LATLNG_SQL})")


def _q_embedding_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid + the 3 vectors FARTHEST from their
    own label's centroid by cosine — the mislabel/contamination
    screen a curation pipeline runs before training a classifier head.
    Centroids are elementwise folds of the float32 vectors (cast to
    double, summed in vec_id order — exact cross-engine); cosines are
    64-term fixed-order index folds; top-3 via (cosine, vec_id)
    row_number. One groupBy + one broadcast join — linear in vectors."""
    from pyspark.sql import Window

    emb = _load(spark, sf_dir, "embeddings")
    vecd = emb.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    cent = (
        vecd.groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("vec_id", "v"))),
                F.array_repeat(F.lit(0.0), 64),
                lambda acc, x: F.zip_with(acc, x["v"], lambda a, b: a + b),
            ).alias("s"),
        )
        .select(
            "label",
            "n",
            F.transform(
                "s", lambda e: e / F.col("n").cast("double")
            ).alias("c"),
        )
    )
    j = vecd.join(F.broadcast(cent), "label")
    dot = F.aggregate(
        F.zip_with(F.col("v"), F.col("c"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nv = F.aggregate(
        F.zip_with(F.col("v"), F.col("v"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nc = F.aggregate(
        F.zip_with(F.col("c"), F.col("c"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = j.select(
        "label", "vec_id", (dot / (F.sqrt(nv) * F.sqrt(nc))).alias("cos")
    )
    w = Window.partitionBy("label").orderBy(F.asc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("label", "rank", "vec_id", F.round("cos", 9).alias("cosine"))
        .orderBy("label", "rank")
    )


_EMB_OUTLIER_ORACLE = """
    WITH vecd AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    cent0 AS (
      SELECT label, count(*) AS n, list(v ORDER BY vec_id) AS vs
      FROM vecd GROUP BY 1
    ),
    cent AS (
      SELECT label, n,
             list_transform(
               list_reduce(vs, (a, b) ->
                 list_transform(generate_series(1, 64), i -> a[i] + b[i])),
               e -> e / CAST(n AS DOUBLE)) AS c
      FROM cent0
    ),
    s AS (
      SELECT vecd.label, vec_id,
             list_reduce(list_transform(generate_series(1, 64),
               i -> v[i] * c[i]), (a, b) -> a + b)
             / (sqrt(list_reduce(list_transform(generate_series(1, 64),
                  i -> v[i] * v[i]), (a, b) -> a + b))
                * sqrt(list_reduce(list_transform(generate_series(1, 64),
                    i -> c[i] * c[i]), (a, b) -> a + b))) AS cos
      FROM vecd JOIN cent ON cent.label = vecd.label
    )
    SELECT label, CAST(rank AS BIGINT) AS rank, vec_id,
           round(cos, 9) AS cosine
    FROM (
      SELECT *, row_number() OVER (PARTITION BY label
                                   ORDER BY cos, vec_id) AS rank
      FROM s
    ) WHERE rank <= 3 ORDER BY label, rank
"""


def _q_perplexity_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram perplexity under the add-1-smoothed corpus
    LM (p(w) = (c_w + 1)/(T + V)), rolled up per source with the count
    of documents above the 800-perplexity gate — the classic LM quality
    filter of a pretraining pipeline (CCNet-style, with the corpus
    itself as the LM). Doc log-likelihoods fold per-token terms in
    token order; the per-source perplexity mean folds in doc order —
    both deterministic cross-engine."""
    docs = _load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"[^a-z]+"),
                lambda t: F.length(t) > 0,
            )
        ).alias("token"),
    )
    dt = toks.groupBy("doc_id", "source", "token").agg(
        F.count("*").alias("nwd")
    )
    corpus = toks.groupBy("token").agg(F.count("*").alias("cw"))
    tv = corpus.agg(
        F.sum("cw").alias("t_total"), F.count("*").alias("v_size")
    )
    jj = dt.join(corpus, "token").crossJoin(F.broadcast(tv))
    lp = F.col("nwd").cast("double") * F.log(
        (F.col("cw") + 1).cast("double")
        / (F.col("t_total") + F.col("v_size")).cast("double")
    )
    per_doc = jj.groupBy("doc_id", "source").agg(
        F.sum("nwd").alias("n_d"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("token", lp.alias("lp")))),
            F.lit(0.0),
            lambda a, x: a + x["lp"],
        ).alias("ll"),
    )
    pp = F.exp(-F.col("ll") / F.col("n_d").cast("double"))
    scored = per_doc.select("doc_id", "source", pp.alias("pp"))
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("pp") > 800.0).cast("long")).alias("n_flagged"),
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("doc_id", "pp"))),
                    F.lit(0.0),
                    lambda a, x: a + x["pp"],
                )
                / F.count("*").cast("double"),
                9,
            ).alias("mean_pp"),
        )
        .orderBy("source")
    )


_PERPLEXITY_ORACLE = """
    WITH toks AS (
      SELECT doc_id, source,
             unnest(list_filter(
               regexp_split_to_array(lower(text), '[^a-z]+'),
               t -> length(t) > 0)) AS token
      FROM documents
    ),
    dt AS (
      SELECT doc_id, source, token, CAST(count(*) AS BIGINT) AS nwd
      FROM toks GROUP BY 1, 2, 3
    ),
    corpus AS (
      SELECT token, CAST(count(*) AS BIGINT) AS cw FROM toks GROUP BY 1
    ),
    tv AS (
      SELECT CAST(sum(cw) AS BIGINT) AS t_total,
             CAST(count(*) AS BIGINT) AS v_size
      FROM corpus
    ),
    per_doc AS (
      SELECT doc_id, source, CAST(sum(nwd) AS BIGINT) AS n_d,
             list_reduce(list_prepend(0.0,
               list(CAST(nwd AS DOUBLE)
                    * ln(CAST(cw + 1 AS DOUBLE)
                         / CAST(t_total + v_size AS DOUBLE))
                    ORDER BY token)),
               (a, b) -> a + b) AS ll
      FROM dt JOIN corpus USING (token) CROSS JOIN tv
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT doc_id, source,
             exp(-ll / CAST(n_d AS DOUBLE)) AS pp
      FROM per_doc
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN pp > 800.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged,
           round(list_reduce(list_prepend(0.0, list(pp ORDER BY doc_id)),
                             (a, b) -> a + b)
                 / CAST(count(*) AS DOUBLE), 9) AS mean_pp
    FROM scored GROUP BY 1 ORDER BY 1
"""


def _q_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: characters per BPE-ish token
    and per whitespace token (pipeline/text.py bpe_ish_token_count) —
    the compression diagnostic that decides tokenizer suitability per
    language in a multilingual pretraining mix. All totals exact
    BIGINTs; two pinned divisions per language."""
    from gos2_spark.pipeline.text import bpe_ish_token_count

    docs = _load(spark, sf_dir, "documents")
    ws = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    rows = docs.select(
        "lang",
        F.col("n_chars"),
        bpe_ish_token_count(F.col("text")).alias("n_bpe"),
        ws.alias("n_ws"),
    )
    agg = rows.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_bpe").alias("total_bpe"),
        F.sum("n_ws").alias("total_ws"),
    )
    return agg.select(
        "lang", "n_docs",
        F.col("total_chars").cast("long").alias("total_chars"),
        F.col("total_bpe").cast("long").alias("total_bpe"),
        F.col("total_ws").cast("long").alias("total_ws"),
        F.round(
            F.col("total_chars").cast("double")
            / F.col("total_bpe").cast("double"),
            9,
        ).alias("chars_per_bpe"),
        F.round(
            F.col("total_chars").cast("double")
            / F.col("total_ws").cast("double"),
            9,
        ).alias("chars_per_ws"),
    ).orderBy("lang")


def _token_fertility_oracle_sql() -> str:
    bpe = (
        r"len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))"
    )
    return f"""
        WITH rows_ AS (
          SELECT lang, n_chars,
                 {bpe} AS n_bpe,
                 len(regexp_split_to_array(trim(text), '\\s+')) AS n_ws
          FROM documents
        ),
        agg AS (
          SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(n_chars) AS BIGINT) AS total_chars,
                 CAST(sum(n_bpe) AS BIGINT) AS total_bpe,
                 CAST(sum(n_ws) AS BIGINT) AS total_ws
          FROM rows_ GROUP BY 1
        )
        SELECT lang, n_docs, total_chars, total_bpe, total_ws,
               round(CAST(total_chars AS DOUBLE)
                     / CAST(total_bpe AS DOUBLE), 9) AS chars_per_bpe,
               round(CAST(total_chars AS DOUBLE)
                     / CAST(total_ws AS DOUBLE), 9) AS chars_per_ws
        FROM agg ORDER BY lang
    """


def _q_token_bucket_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-bucket rate limiting per user (capacity 2 tokens, refill
    1 token / 40000 s): replay each user's event sequence through the
    bucket (spark/ratelimit.py token_bucket — the order-sensitive
    recurrence as one deterministic JVM fold per user, the
    burst_viterbi pattern) and report allowed/denied counts — the
    admission-control twin of rate_limit_windows' fixed-window audit."""
    from gos2_spark.spark.ratelimit import token_bucket

    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    seq = ev.select("user_id", us.alias("us"), "event_id")
    return token_bucket(
        seq, "user_id", "us", "event_id",
        capacity=2.0, refill_us_per_token=4.0e10,
    ).orderBy("user_id")


_TOKEN_BUCKET_ORACLE = """
    WITH seq AS (
      SELECT user_id, epoch_us(ts) AS us, event_id FROM events
    ),
    folded AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             list_reduce(
               list_prepend([CAST(2.0 AS DOUBLE), CAST(-1.0 AS DOUBLE),
                             CAST(0.0 AS DOUBLE)],
                 list_transform(list(CAST(us AS DOUBLE) ORDER BY us, event_id),
                                u -> [u, 0.0, 0.0])),
               (acc, x) -> [
                 CASE WHEN least(2.0, CASE WHEN acc[2] < 0 THEN 2.0
                        ELSE acc[1] + (x[1] - acc[2]) / 4.0e10 END) >= 1.0
                      THEN least(2.0, CASE WHEN acc[2] < 0 THEN 2.0
                        ELSE acc[1] + (x[1] - acc[2]) / 4.0e10 END) - 1.0
                      ELSE least(2.0, CASE WHEN acc[2] < 0 THEN 2.0
                        ELSE acc[1] + (x[1] - acc[2]) / 4.0e10 END) END,
                 x[1],
                 acc[3] + CASE WHEN least(2.0,
                     CASE WHEN acc[2] < 0 THEN 2.0
                          ELSE acc[1] + (x[1] - acc[2]) / 4.0e10 END) >= 1.0
                   THEN 1.0 ELSE 0.0 END
               ]) AS st
      FROM seq GROUP BY 1
    )
    SELECT user_id, n_events,
           CAST(st[3] AS BIGINT) AS n_allowed,
           CAST(n_events - st[3] AS BIGINT) AS n_denied,
           round(st[1], 9) AS tokens_left
    FROM folded ORDER BY user_id
"""


def _q_trajectory_tortuosity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trajectory tortuosity per user: total path length (sum of leg
    angles folded in leg order) over the direct start-to-end
    great-circle distance, plus the mean absolute turning angle between
    consecutive legs (trajectory_bearings' per-leg bearings, differenced
    and wrapped to [0, pi]) — the path-efficiency diagnostic between
    radius_of_gyration and frechet distances. Users with < 3 events
    drop (no defined turn)."""
    from pyspark.sql import Window

    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    lat = F.radians(-60.0 + (e * 11 % 120) + (e % 83) / 83.0)
    lng = F.radians(-170.0 + (e * 17 % 340) + (e % 79) / 79.0)
    pts = ev.select(
        "user_id", us.alias("us"), "event_id",
        (F.cos(lng) * F.cos(lat)).alias("x"),
        (F.sin(lng) * F.cos(lat)).alias("y"),
        F.sin(lat).alias("z"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    seq = pts.select(
        "user_id", "us", "event_id", "x", "y", "z",
        F.row_number().over(w).alias("i"),
        F.lag("x").over(w).alias("px"),
        F.lag("y").over(w).alias("py"),
        F.lag("z").over(w).alias("pz"),
    )
    cx = F.col("py") * F.col("z") - F.col("pz") * F.col("y")
    cy = F.col("pz") * F.col("x") - F.col("px") * F.col("z")
    cz = F.col("px") * F.col("y") - F.col("py") * F.col("x")
    leg = F.atan2(
        F.sqrt(cx * cx + cy * cy + cz * cz),
        F.col("px") * F.col("x") + F.col("py") * F.col("y")
        + F.col("pz") * F.col("z"),
    )
    legs = seq.where(F.col("px").isNotNull()).select(
        "user_id", "i", leg.alias("leg"),
        "px", "py", "pz", "x", "y", "z",
    )
    # turning angle at each interior vertex: angle between leg normals
    wl = Window.partitionBy("user_id").orderBy("i")
    nx = F.col("py") * F.col("z") - F.col("pz") * F.col("y")
    ny = F.col("pz") * F.col("x") - F.col("px") * F.col("z")
    nz = F.col("px") * F.col("y") - F.col("py") * F.col("x")
    withn = legs.select(
        "user_id", "i", "leg",
        nx.alias("nx"), ny.alias("ny"), nz.alias("nz"),
    ).select(
        "user_id", "i", "leg", "nx", "ny", "nz",
        F.lag("nx").over(wl).alias("qx"),
        F.lag("ny").over(wl).alias("qy"),
        F.lag("nz").over(wl).alias("qz"),
    )
    tx = F.col("qy") * F.col("nz") - F.col("qz") * F.col("ny")
    ty = F.col("qz") * F.col("nx") - F.col("qx") * F.col("nz")
    tz = F.col("qx") * F.col("ny") - F.col("qy") * F.col("nx")
    turn = F.atan2(
        F.sqrt(tx * tx + ty * ty + tz * tz),
        F.col("qx") * F.col("nx") + F.col("qy") * F.col("ny")
        + F.col("qz") * F.col("nz"),
    )
    stats = withn.groupBy("user_id").agg(
        F.count("*").alias("n_legs"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("i", F.col("leg").alias("v")))),
            F.lit(0.0),
            lambda a, x: a + x["v"],
        ).alias("path_len"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "i",
                        F.when(F.col("qx").isNotNull(), turn).otherwise(
                            F.lit(0.0)
                        ).alias("t"),
                    )
                )
            ),
            F.lit(0.0),
            lambda a, x: a + x["t"],
        ).alias("turn_sum"),
    ).where(F.col("n_legs") >= 2)
    first = pts.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    ).select("user_id", F.col("x").alias("fx"), F.col("y").alias("fy"),
             F.col("z").alias("fz"))
    wd = Window.partitionBy("user_id").orderBy(
        F.desc("us"), F.desc("event_id")
    )
    last = pts.withColumn("rn", F.row_number().over(wd)).where(
        F.col("rn") == 1
    ).select("user_id", F.col("x").alias("lx"), F.col("y").alias("ly"),
             F.col("z").alias("lz"))
    fl = first.join(last, "user_id")
    dxx = F.col("fy") * F.col("lz") - F.col("fz") * F.col("ly")
    dyy = F.col("fz") * F.col("lx") - F.col("fx") * F.col("lz")
    dzz = F.col("fx") * F.col("ly") - F.col("fy") * F.col("lx")
    direct = F.atan2(
        F.sqrt(dxx * dxx + dyy * dyy + dzz * dzz),
        F.col("fx") * F.col("lx") + F.col("fy") * F.col("ly")
        + F.col("fz") * F.col("lz"),
    )
    out = stats.join(fl.select("user_id", direct.alias("direct")), "user_id")
    return out.select(
        "user_id",
        F.col("n_legs").cast("long").alias("n_legs"),
        F.round("path_len", 9).alias("path_len_rad"),
        F.round("direct", 9).alias("direct_rad"),
        F.when(
            F.col("direct") > 0,
            F.round(F.col("path_len") / F.col("direct"), 9),
        ).otherwise(F.lit(0.0)).alias("tortuosity"),
        F.round(
            F.col("turn_sum") / (F.col("n_legs") - 1).cast("double"), 9
        ).alias("mean_turn_rad"),
    ).orderBy("user_id")


_TORTUOSITY_ORACLE = """
    WITH pts AS (
      SELECT user_id, epoch_us(ts) AS us, event_id,
             cos(radians(-170.0 + (event_id * 17 % 340)
                 + (event_id % 79) / 79.0))
               * cos(radians(-60.0 + (event_id * 11 % 120)
                 + (event_id % 83) / 83.0)) AS x,
             sin(radians(-170.0 + (event_id * 17 % 340)
                 + (event_id % 79) / 79.0))
               * cos(radians(-60.0 + (event_id * 11 % 120)
                 + (event_id % 83) / 83.0)) AS y,
             sin(radians(-60.0 + (event_id * 11 % 120)
                 + (event_id % 83) / 83.0)) AS z
      FROM events
    ),
    seq AS (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY us, event_id) AS i,
             lag(x) OVER (PARTITION BY user_id ORDER BY us, event_id) AS px,
             lag(y) OVER (PARTITION BY user_id ORDER BY us, event_id) AS py,
             lag(z) OVER (PARTITION BY user_id ORDER BY us, event_id) AS pz
      FROM pts
    ),
    legs AS (
      SELECT user_id, i,
             atan2(sqrt((py * z - pz * y) * (py * z - pz * y)
                      + (pz * x - px * z) * (pz * x - px * z)
                      + (px * y - py * x) * (px * y - py * x)),
                   px * x + py * y + pz * z) AS leg,
             py * z - pz * y AS nx,
             pz * x - px * z AS ny,
             px * y - py * x AS nz
      FROM seq WHERE px IS NOT NULL
    ),
    withn AS (
      SELECT *,
             lag(nx) OVER (PARTITION BY user_id ORDER BY i) AS qx,
             lag(ny) OVER (PARTITION BY user_id ORDER BY i) AS qy,
             lag(nz) OVER (PARTITION BY user_id ORDER BY i) AS qz
      FROM legs
    ),
    stats AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_legs,
             list_reduce(list_prepend(0.0, list(leg ORDER BY i)),
                         (a, b) -> a + b) AS path_len,
             list_reduce(list_prepend(0.0, list(
               CASE WHEN qx IS NULL THEN 0.0
                    ELSE atan2(sqrt(
                        (qy * nz - qz * ny) * (qy * nz - qz * ny)
                      + (qz * nx - qx * nz) * (qz * nx - qx * nz)
                      + (qx * ny - qy * nx) * (qx * ny - qy * nx)),
                      qx * nx + qy * ny + qz * nz) END ORDER BY i)),
               (a, b) -> a + b) AS turn_sum
      FROM withn GROUP BY 1 HAVING count(*) >= 2
    ),
    fl AS (
      SELECT f.user_id,
             atan2(sqrt((f.y * l.z - f.z * l.y) * (f.y * l.z - f.z * l.y)
                      + (f.z * l.x - f.x * l.z) * (f.z * l.x - f.x * l.z)
                      + (f.x * l.y - f.y * l.x) * (f.x * l.y - f.y * l.x)),
                   f.x * l.x + f.y * l.y + f.z * l.z) AS direct
      FROM (SELECT * FROM (SELECT *, row_number() OVER (
              PARTITION BY user_id ORDER BY us, event_id) AS rn FROM pts)
            WHERE rn = 1) f
      JOIN (SELECT * FROM (SELECT *, row_number() OVER (
              PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn
              FROM pts)
            WHERE rn = 1) l ON l.user_id = f.user_id
    )
    SELECT s.user_id, n_legs,
           round(path_len, 9) AS path_len_rad,
           round(direct, 9) AS direct_rad,
           CASE WHEN direct > 0 THEN round(path_len / direct, 9)
                ELSE 0.0 END AS tortuosity,
           round(turn_sum / CAST(n_legs - 1 AS DOUBLE), 9)
             AS mean_turn_rad
    FROM stats s JOIN fl ON fl.user_id = s.user_id
    ORDER BY s.user_id
"""


def _q_bilinear_elevation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilinear interpolation of the shared hash-elevation surface at
    the exact event coordinates (cell centers carry the integer
    elevation; the four surrounding centers blend by fractional
    position) — the raster-sampling primitive under every terrain
    overlay. Pure scalar expressions per event, zero joins; rolled up
    per tile with 1e-6-quantized BIGINT sums (exact in any order)."""
    ev = _load(spark, sf_dir, "events")
    ev.createOrReplaceTempView("_bil_events")
    return spark.sql(_bilinear_select_sql("_bil_events"))


def _bilinear_select_sql(src: str) -> str:
    # CAST keeps Spark SQL from parsing the literals as DECIMAL (which
    # would silently truncate the fractional position at scale 9)
    lat = (
        "(CAST(-60.0 AS DOUBLE) + (event_id * 11 % 120)"
        " + (event_id % 83) / CAST(83.0 AS DOUBLE))"
    )
    lng = (
        "(CAST(-170.0 AS DOUBLE) + (event_id * 17 % 340)"
        " + (event_id % 79) / CAST(79.0 AS DOUBLE))"
    )
    # grid coordinates in cell units, centers at integers r,c (cell = 2 deg)
    gr = f"({lat} / 2.0 - 0.5)"
    gc = f"({lng} / 2.0 - 0.5)"
    r0 = f"CAST(floor({gr}) AS BIGINT)"
    c0 = f"CAST(floor({gc}) AS BIGINT)"
    fr = f"({gr} - floor({gr}))"
    fc = f"({gc} - floor({gc}))"
    z00 = _grid_elev_sql(r0, c0)
    z01 = _grid_elev_sql(r0, f"({c0} + 1)")
    z10 = _grid_elev_sql(f"({r0} + 1)", c0)
    z11 = _grid_elev_sql(f"({r0} + 1)", f"({c0} + 1)")
    bil = (
        f"(CAST({z00} AS DOUBLE) * (1.0 - {fr}) * (1.0 - {fc})"
        f" + CAST({z01} AS DOUBLE) * (1.0 - {fr}) * {fc}"
        f" + CAST({z10} AS DOUBLE) * {fr} * (1.0 - {fc})"
        f" + CAST({z11} AS DOUBLE) * {fr} * {fc})"
    )
    return f"""
        SELECT CAST(floor({lat} / 10.0) AS BIGINT) AS band,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(round({bil} * 1e6) AS BIGINT)) AS DOUBLE)
                 / 1e6 AS sum_bilinear,
               round(min({bil}), 9) AS min_bilinear,
               round(max({bil}), 9) AS max_bilinear
        FROM {src}
        GROUP BY 1 ORDER BY 1
    """


def _bilinear_oracle_sql() -> str:
    return _bilinear_select_sql("events")


def _q_burstiness_memory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh-Barabasi burstiness B = (sigma - mu)/(sigma + mu) and memory
    coefficient M (Pearson correlation of consecutive gaps) of each
    user's inter-event gap sequence — the two-parameter
    characterization of temporal clustering in human activity. Gap
    moments and the lag-1 cross moments fold in gap order (gaps are
    microsecond doubles too large for BIGINT squares); users with < 3
    gaps drop (M undefined)."""
    from pyspark.sql import Window

    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gaps = (
        ev.select("user_id", us.alias("us"), "event_id")
        .withColumn("prev", F.lag("us").over(w))
        .where(F.col("prev").isNotNull())
        .select(
            "user_id",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy("us", "event_id")
            ).alias("i"),
            ((F.col("us") - F.col("prev")) / 1.0e6).alias("g"),
        )
    )
    wg = Window.partitionBy("user_id").orderBy("i")
    pairs = gaps.withColumn("gn", F.lead("g").over(wg))

    def _fold(col):
        return F.aggregate(
            F.array_sort(F.collect_list(F.struct("i", col.alias("v")))),
            F.lit(0.0),
            lambda a, x: a + x["v"],
        )

    agg = pairs.groupBy("user_id").agg(
        F.count("*").alias("n"),
        _fold(F.col("g")).alias("sg"),
        _fold(F.col("g") * F.col("g")).alias("sgg"),
        _fold(F.when(F.col("gn").isNotNull(), F.col("g")).otherwise(0.0)).alias("sa"),
        _fold(F.when(F.col("gn").isNotNull(), F.col("gn")).otherwise(0.0)).alias("sb"),
        _fold(
            F.when(F.col("gn").isNotNull(), F.col("g") * F.col("gn")).otherwise(0.0)
        ).alias("sab"),
        _fold(
            F.when(F.col("gn").isNotNull(), F.col("g") * F.col("g")).otherwise(0.0)
        ).alias("saa"),
        _fold(
            F.when(F.col("gn").isNotNull(), F.col("gn") * F.col("gn")).otherwise(0.0)
        ).alias("sbb"),
    ).where(F.col("n") >= 3)
    nd = F.col("n").cast("double")
    mu = F.col("sg") / nd
    sig = F.sqrt(F.col("sgg") / nd - mu * mu)
    m = nd - 1.0
    va = m * F.col("saa") - F.col("sa") * F.col("sa")
    vb = m * F.col("sbb") - F.col("sb") * F.col("sb")
    mem = F.when(
        (va > 0) & (vb > 0),
        (m * F.col("sab") - F.col("sa") * F.col("sb"))
        / (F.sqrt(va) * F.sqrt(vb)),
    ).otherwise(F.lit(0.0))
    return agg.select(
        "user_id",
        F.col("n").cast("long").alias("n_gaps"),
        F.round(mu, 9).alias("mean_gap_s"),
        F.when(sig + mu > 0, F.round((sig - mu) / (sig + mu), 9))
        .otherwise(F.lit(0.0))
        .alias("burstiness"),
        F.round(mem, 9).alias("memory_coeff"),
    ).orderBy("user_id")


_BURSTINESS_ORACLE = """
    WITH gaps0 AS (
      SELECT user_id, us, event_id,
             lag(us) OVER (PARTITION BY user_id
                           ORDER BY us, event_id) AS prev
      FROM (SELECT user_id, epoch_us(ts) AS us, event_id FROM events)
    ),
    gaps AS (
      SELECT user_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY us, event_id) AS i,
             (us - prev) / 1.0e6 AS g
      FROM gaps0 WHERE prev IS NOT NULL
    ),
    pairs AS (
      SELECT *, lead(g) OVER (PARTITION BY user_id ORDER BY i) AS gn
      FROM gaps
    ),
    agg AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             list_reduce(list_prepend(0.0, list(g ORDER BY i)),
                         (a, b) -> a + b) AS sg,
             list_reduce(list_prepend(0.0, list(g * g ORDER BY i)),
                         (a, b) -> a + b) AS sgg,
             list_reduce(list_prepend(0.0, list(
               CASE WHEN gn IS NULL THEN 0.0 ELSE g END ORDER BY i)),
               (a, b) -> a + b) AS sa,
             list_reduce(list_prepend(0.0, list(
               CASE WHEN gn IS NULL THEN 0.0 ELSE gn END ORDER BY i)),
               (a, b) -> a + b) AS sb,
             list_reduce(list_prepend(0.0, list(
               CASE WHEN gn IS NULL THEN 0.0 ELSE g * gn END ORDER BY i)),
               (a, b) -> a + b) AS sab,
             list_reduce(list_prepend(0.0, list(
               CASE WHEN gn IS NULL THEN 0.0 ELSE g * g END ORDER BY i)),
               (a, b) -> a + b) AS saa,
             list_reduce(list_prepend(0.0, list(
               CASE WHEN gn IS NULL THEN 0.0 ELSE gn * gn END ORDER BY i)),
               (a, b) -> a + b) AS sbb
      FROM pairs GROUP BY 1 HAVING count(*) >= 3
    )
    SELECT user_id, n AS n_gaps,
           round(sg / CAST(n AS DOUBLE), 9) AS mean_gap_s,
           CASE WHEN sqrt(sgg / CAST(n AS DOUBLE)
                          - (sg / CAST(n AS DOUBLE))
                            * (sg / CAST(n AS DOUBLE)))
                     + sg / CAST(n AS DOUBLE) > 0
                THEN round((sqrt(sgg / CAST(n AS DOUBLE)
                                 - (sg / CAST(n AS DOUBLE))
                                   * (sg / CAST(n AS DOUBLE)))
                            - sg / CAST(n AS DOUBLE))
                           / (sqrt(sgg / CAST(n AS DOUBLE)
                                   - (sg / CAST(n AS DOUBLE))
                                     * (sg / CAST(n AS DOUBLE)))
                              + sg / CAST(n AS DOUBLE)), 9)
                ELSE 0.0 END AS burstiness,
           CASE WHEN CAST(n - 1 AS DOUBLE) * saa - sa * sa > 0
                 AND CAST(n - 1 AS DOUBLE) * sbb - sb * sb > 0
                THEN round((CAST(n - 1 AS DOUBLE) * sab - sa * sb)
                           / (sqrt(CAST(n - 1 AS DOUBLE) * saa - sa * sa)
                              * sqrt(CAST(n - 1 AS DOUBLE) * sbb - sb * sb)),
                           9)
                ELSE 0.0 END AS memory_coeff
    FROM agg ORDER BY user_id
"""


def _q_ransac_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANSAC-style robust trend of the daily total event-count series:
    every day pair proposes the line through its two points
    (deterministic exhaustive 'sampling' — no RNG needed at 435
    candidates), each candidate counts days within 15.0 counts of the
    line, and the (most inliers, smallest candidate id) winner is
    refit-free reported — the outlier-immune alternative to
    value_trend_ols next to theil_sen's median slope. Bounded
    candidate x day join (~13k rows at any SF)."""
    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    daily = (
        ev.select((us / (86400 * 1000 * 1000)).cast("long").alias("d"))
        .groupBy("d")
        .agg(F.count("*").alias("y"))
    )
    a = daily.select(F.col("d").alias("d1"), F.col("y").alias("y1"))
    b = daily.select(F.col("d").alias("d2"), F.col("y").alias("y2"))
    cand = a.join(b, F.col("d1") < F.col("d2")).select(
        (F.col("d1") * 100000 + F.col("d2")).alias("cand_id"),
        "d1", "y1", "d2", "y2",
        # guarded: Catalyst may fuse this projection into the BNLJ stage
        # and evaluate it before the d1 < d2 condition prunes the row
        F.when(
            F.col("d2") != F.col("d1"),
            (F.col("y2") - F.col("y1")).cast("double")
            / (F.col("d2") - F.col("d1")).cast("double"),
        ).alias("slope"),
    ).withColumn(
        "intercept",
        F.col("y1").cast("double") - F.col("slope") * F.col("d1").cast("double"),
    )
    scored = (
        F.broadcast(cand)
        .crossJoin(daily)  # bounded: C(n_days,2) x n_days
        .where(
            F.abs(
                F.col("y").cast("double")
                - (F.col("intercept") + F.col("slope") * F.col("d").cast("double"))
            )
            <= 15.0
        )
        .groupBy("cand_id", "d1", "d2", "slope", "intercept")
        .agg(F.count("*").alias("n_inliers"))
    )
    return (
        scored.orderBy(F.desc("n_inliers"), F.asc("cand_id"))
        .limit(1)
        .select(
            "cand_id", "d1", "d2",
            F.round("slope", 9).alias("slope"),
            F.round("intercept", 9).alias("intercept"),
            F.col("n_inliers").cast("long").alias("n_inliers"),
        )
    )


_RANSAC_ORACLE = """
    WITH daily AS (
      SELECT epoch_us(ts) // 86400000000 AS d,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    cand AS (
      SELECT a.d * 100000 + b.d AS cand_id,
             a.d AS d1, a.y AS y1, b.d AS d2, b.y AS y2,
             CAST(b.y - a.y AS DOUBLE) / CAST(b.d - a.d AS DOUBLE) AS slope,
             CAST(a.y AS DOUBLE)
               - CAST(b.y - a.y AS DOUBLE) / CAST(b.d - a.d AS DOUBLE)
                 * CAST(a.d AS DOUBLE) AS intercept
      FROM daily a JOIN daily b ON a.d < b.d
    ),
    scored AS (
      SELECT cand_id, d1, d2, slope, intercept,
             CAST(count(*) AS BIGINT) AS n_inliers
      FROM cand CROSS JOIN daily
      WHERE abs(CAST(y AS DOUBLE)
                - (intercept + slope * CAST(d AS DOUBLE))) <= 15.0
      GROUP BY 1, 2, 3, 4, 5
    )
    SELECT cand_id, d1, d2, round(slope, 9) AS slope,
           round(intercept, 9) AS intercept, n_inliers
    FROM scored ORDER BY n_inliers DESC, cand_id LIMIT 1
"""


def _nw_dp_sql(el, seq, tf, pre, fold, mk) -> str:
    """Needleman-Wunsch score as ONE flat fold over the n1*n2 cell
    sequence in row-major order (match +1 / mismatch -1 / gap -1),
    carrying the classic rolling DP row plus the diagonal in the
    accumulator: acc = [diag, dp_0, dp_1, ..., dp_n2]. Dialect knobs:
    ``el`` 1-indexed accessor (element_at / list_element), ``seq``
    integer range (sequence / generate_series), ``tf`` array map
    (transform / list_transform), ``pre(elem, arr)`` prepend,
    ``fold(cells, init, body)`` reduction (Spark aggregate with explicit
    init / DuckDB list_reduce over a prepended init), ``mk`` 1-element
    array constructor — every other token is shared text. Returns the
    SQL expression for the final DP row given columns sa, sb, n1, n2."""
    xidx = f"{el}(x, 1)"
    i = f"CAST(floor(CAST({xidx} AS DOUBLE) / CAST(n2 AS DOUBLE)) AS BIGINT)"
    j = f"(CAST({xidx} AS BIGINT) % n2)"
    ch_match = (
        f"CASE WHEN substr(sa, CAST({i} + 1 AS INT), 1)"
        f" = substr(sb, CAST({j} + 1 AS INT), 1) THEN 1.0 ELSE -1.0 END"
    )
    diag_used = f"CASE WHEN {j} = 0 THEN {el}(acc, 2) ELSE {el}(acc, 1) END"
    left = (
        f"CASE WHEN {j} = 0 THEN -CAST({i} + 1 AS DOUBLE)"
        f" ELSE {el}(acc, CAST({j} + 2 AS INT)) END"
    )
    up = f"{el}(acc, CAST({j} + 3 AS INT))"
    cur = f"greatest({up} - 1.0, {left} - 1.0, {diag_used} + {ch_match})"
    newel = (
        f"CASE WHEN p = 1 THEN {up}"
        f" WHEN p = 2 AND {j} = 0 THEN -CAST({i} + 1 AS DOUBLE)"
        f" WHEN p = CAST({j} + 3 AS BIGINT) THEN {cur}"
        f" ELSE {el}(acc, CAST(p AS INT)) END"
    )
    neg_row = f"{tf}({seq}(1, CAST(n2 AS BIGINT)), q -> -CAST(q AS DOUBLE))"
    init = pre("CAST(0.0 AS DOUBLE)", pre("CAST(0.0 AS DOUBLE)", neg_row))
    cells = (
        f"{tf}({seq}(0, CAST(n1 * n2 - 1 AS BIGINT)),"
        f" v -> {mk}(CAST(v AS DOUBLE)))"
    )
    body = f"{tf}({seq}(1, CAST(n2 + 2 AS BIGINT)), p -> {newel})"
    return fold(cells, init, body)


def _nw_dp_spark() -> str:
    return _nw_dp_sql(
        "element_at", "sequence", "transform",
        lambda e, a: f"array_prepend({a}, {e})",
        lambda cells, init, body: (
            f"aggregate({cells}, {init}, (acc, x) -> {body})"
        ),
        "array",
    )


def _nw_dp_duckdb() -> str:
    return _nw_dp_sql(
        "list_element", "generate_series", "list_transform",
        lambda e, a: f"list_prepend({e}, {a})",
        lambda cells, init, body: (
            f"list_reduce(list_prepend({init}, {cells}),"
            f" (acc, x) -> {body})"
        ),
        "list_value",
    )


def _q_needleman_wunsch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sequence alignment (Needleman-Wunsch, match +1 /
    mismatch -1 / gap -1) between the event-type-initial strings (first
    40 events, time-ordered) of the 8 smallest users, all 28 pairs —
    the classic DP expressed as a single declarative fold over the
    row-major cell sequence (see _nw_dp_sql), no UDF, no driver loop.
    Scores are exact integers riding as doubles."""
    from pyspark.sql import Window

    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    seqs = (
        ev.select(
            "user_id", us.alias("us"), "event_id",
            F.substring("event_type", 1, 1).alias("ch"),
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 40)
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", F.col("ch").alias("c")))
                    ),
                    lambda x: x["c"],
                ),
                "",
            ).alias("s")
        )
        .orderBy("user_id")
        .limit(8)
    )
    seqs.createOrReplaceTempView("_nw_seqs")
    dp = _nw_dp_spark()
    return spark.sql(f"""
        WITH pairs AS (
          SELECT a.user_id AS user_a, b.user_id AS user_b,
                 a.s AS sa, b.s AS sb,
                 length(a.s) AS n1, length(b.s) AS n2
          FROM _nw_seqs a JOIN _nw_seqs b ON a.user_id < b.user_id
        )
        SELECT user_a, user_b,
               CAST(n1 AS BIGINT) AS len_a, CAST(n2 AS BIGINT) AS len_b,
               CAST(element_at({dp}, CAST(n2 + 2 AS INT)) AS BIGINT)
                 AS nw_score
        FROM pairs ORDER BY user_a, user_b
    """)


def _nw_oracle_sql() -> str:
    dp = _nw_dp_duckdb()
    return f"""
        WITH seqs AS (
          SELECT user_id, string_agg(ch, '' ORDER BY rn) AS s
          FROM (
            SELECT user_id, substr(event_type, 1, 1) AS ch,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY us, event_id) AS rn
            FROM (SELECT user_id, epoch_us(ts) AS us, event_id, event_type
                  FROM events)
          ) WHERE rn <= 40
          GROUP BY 1 ORDER BY 1 LIMIT 8
        ),
        pairs AS (
          SELECT a.user_id AS user_a, b.user_id AS user_b,
                 a.s AS sa, b.s AS sb,
                 length(a.s) AS n1, length(b.s) AS n2
          FROM seqs a JOIN seqs b ON a.user_id < b.user_id
        )
        SELECT user_a, user_b,
               CAST(n1 AS BIGINT) AS len_a, CAST(n2 AS BIGINT) AS len_b,
               CAST(list_element({dp}, CAST(n2 + 2 AS INT)) AS BIGINT)
                 AS nw_score
        FROM pairs ORDER BY user_a, user_b
    """


def _sw_dp_sql(el, seq, tf, pre, fold, mk) -> str:
    """Smith-Waterman LOCAL alignment score via the same flat-fold
    machinery as _nw_dp_sql, with the local-alignment changes: cells
    clamp at 0, the boundary row/column are all zeros, and the
    accumulator carries a running best in its last slot:
    acc = [diag, dp_0..dp_n2, best]."""
    xidx = f"{el}(x, 1)"
    i = f"CAST(floor(CAST({xidx} AS DOUBLE) / CAST(n2 AS DOUBLE)) AS BIGINT)"
    j = f"(CAST({xidx} AS BIGINT) % n2)"
    ch_match = (
        f"CASE WHEN substr(sa, CAST({i} + 1 AS INT), 1)"
        f" = substr(sb, CAST({j} + 1 AS INT), 1) THEN 1.0 ELSE -1.0 END"
    )
    diag_used = f"CASE WHEN {j} = 0 THEN {el}(acc, 2) ELSE {el}(acc, 1) END"
    left = (
        f"CASE WHEN {j} = 0 THEN CAST(0.0 AS DOUBLE)"
        f" ELSE {el}(acc, CAST({j} + 2 AS INT)) END"
    )
    up = f"{el}(acc, CAST({j} + 3 AS INT))"
    cur = (
        f"greatest(CAST(0.0 AS DOUBLE), {up} - 1.0, {left} - 1.0,"
        f" {diag_used} + {ch_match})"
    )
    newel = (
        f"CASE WHEN p = 1 THEN {up}"
        f" WHEN p = CAST({j} + 3 AS BIGINT) THEN {cur}"
        f" WHEN p = CAST(n2 + 3 AS BIGINT)"
        f" THEN greatest({el}(acc, CAST(n2 + 3 AS INT)), {cur})"
        f" ELSE {el}(acc, CAST(p AS INT)) END"
    )
    # [diag=0, dp_0..dp_n2 = 0, best=0]
    init = pre(
        "CAST(0.0 AS DOUBLE)",
        f"{tf}({seq}(1, CAST(n2 + 2 AS BIGINT)), q -> CAST(0.0 AS DOUBLE))",
    )
    cells = (
        f"{tf}({seq}(0, CAST(n1 * n2 - 1 AS BIGINT)),"
        f" v -> {mk}(CAST(v AS DOUBLE)))"
    )
    body = f"{tf}({seq}(1, CAST(n2 + 3 AS BIGINT)), p -> {newel})"
    return fold(cells, init, body)


def _q_smith_waterman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smith-Waterman local alignment (match +1 / mismatch -1 / gap -1)
    over the same 8-user event-type-initial strings as needleman_wunsch
    — the best matching SUBSEQUENCE window rather than the global
    alignment, again as one declarative fold (see _sw_dp_sql)."""
    from pyspark.sql import Window

    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    seqs = (
        ev.select(
            "user_id", us.alias("us"), "event_id",
            F.substring("event_type", 1, 1).alias("ch"),
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 40)
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", F.col("ch").alias("c")))
                    ),
                    lambda x: x["c"],
                ),
                "",
            ).alias("s")
        )
        .orderBy("user_id")
        .limit(8)
    )
    seqs.createOrReplaceTempView("_sw_seqs")
    dp = _sw_dp_sql(
        "element_at", "sequence", "transform",
        lambda e, a: f"array_prepend({a}, {e})",
        lambda cells, init, body: (
            f"aggregate({cells}, {init}, (acc, x) -> {body})"
        ),
        "array",
    )
    return spark.sql(f"""
        WITH pairs AS (
          SELECT a.user_id AS user_a, b.user_id AS user_b,
                 a.s AS sa, b.s AS sb,
                 length(a.s) AS n1, length(b.s) AS n2
          FROM _sw_seqs a JOIN _sw_seqs b ON a.user_id < b.user_id
        )
        SELECT user_a, user_b,
               CAST(element_at({dp}, CAST(n2 + 3 AS INT)) AS BIGINT)
                 AS sw_score
        FROM pairs ORDER BY user_a, user_b
    """)


def _sw_oracle_sql() -> str:
    dp = _sw_dp_sql(
        "list_element", "generate_series", "list_transform",
        lambda e, a: f"list_prepend({e}, {a})",
        lambda cells, init, body: (
            f"list_reduce(list_prepend({init}, {cells}),"
            f" (acc, x) -> {body})"
        ),
        "list_value",
    )
    return f"""
        WITH seqs AS (
          SELECT user_id, string_agg(ch, '' ORDER BY rn) AS s
          FROM (
            SELECT user_id, substr(event_type, 1, 1) AS ch,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY us, event_id) AS rn
            FROM (SELECT user_id, epoch_us(ts) AS us, event_id, event_type
                  FROM events)
          ) WHERE rn <= 40
          GROUP BY 1 ORDER BY 1 LIMIT 8
        ),
        pairs AS (
          SELECT a.user_id AS user_a, b.user_id AS user_b,
                 a.s AS sa, b.s AS sb,
                 length(a.s) AS n1, length(b.s) AS n2
          FROM seqs a JOIN seqs b ON a.user_id < b.user_id
        )
        SELECT user_a, user_b,
               CAST(list_element({dp}, CAST(n2 + 3 AS INT)) AS BIGINT)
                 AS sw_score
        FROM pairs ORDER BY user_a, user_b
    """


def _q_bayes_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Bayesian A/B: with uniform Beta(1,1) priors on each arm's
    conversion rate (conversion = value > 200, arms = the
    ab_conversion_ztest hash split), P(pB > pA) has the closed form
    sum_{i=0}^{aB-1} B(aA+i, bA+bB) / ((bB+i) B(1+i, bB) B(aA, bA))
    (Cook's formula), evaluated with the shared Stirling ln-factorial
    ladder (identical fixed-order expression both engines) over an
    exploded i-range bounded by the B-arm success count. The posterior
    companion of the frequentist ab_conversion_ztest."""
    ev = _load(spark, sf_dir, "events")
    tab = ev.select(
        "event_type",
        (F.col("user_id") * 48271 % 2147483647 % 2).alias("arm"),
        (F.col("value") > 200.0).cast("long").alias("succ"),
    ).groupBy("event_type").agg(
        F.sum(F.when(F.col("arm") == 0, F.col("succ"))).alias("sa"),
        F.sum(F.when(F.col("arm") == 0, 1 - F.col("succ"))).alias("fa"),
        F.sum(F.when(F.col("arm") == 1, F.col("succ"))).alias("sb"),
        F.sum(F.when(F.col("arm") == 1, 1 - F.col("succ"))).alias("fb"),
    )
    tab.createOrReplaceTempView("_bayes_tab")
    return spark.sql(_bayes_body_sql("_bayes_tab", "explode", "sequence"))


def _bayes_body_sql(src: str, explode_fn: str, seq_fn: str) -> str:
    # Beta(1,1) priors: aA = sa+1, bA = fa+1, aB = sb+1, bB = fb+1.
    # ln B(x, y) = lf(x-1) + lf(y-1) - lf(x+y-1) via the Stirling ladder.
    def lnbeta(x, y):
        return (
            f"({_lnfact(f'({x} - 1)')} + {_lnfact(f'({y} - 1)')}"
            f" - {_lnfact(f'({x} + {y} - 1)')})"
        )

    term = (
        f"exp({lnbeta('(sa + 1 + i)', '(fa + 1 + fb + 1)')}"
        f" - ln(CAST(fb + 1 + i AS DOUBLE))"
        f" - {lnbeta('(1 + i)', '(fb + 1)')}"
        f" - {lnbeta('(sa + 1)', '(fa + 1)')})"
    )
    return f"""
        WITH ks AS (
          SELECT event_type, sa, fa, sb, fb,
                 {explode_fn}(
                   {seq_fn}(CAST(0 AS BIGINT), CAST(sb AS BIGINT))) AS i
          FROM {src}
        ),
        p AS (
          SELECT event_type, sa, fa, sb, fb, {term} AS t FROM ks
        )
        SELECT event_type,
               CAST(sa AS BIGINT) AS succ_a, CAST(fa AS BIGINT) AS fail_a,
               CAST(sb AS BIGINT) AS succ_b, CAST(fb AS BIGINT) AS fail_b,
               round(sum(t), 9) AS p_b_beats_a
        FROM p GROUP BY 1, 2, 3, 4, 5
        ORDER BY event_type
    """


def _bayes_oracle_sql() -> str:
    body = _bayes_body_sql("tab", "unnest", "generate_series").replace(
        "WITH ks AS", ", ks AS", 1
    )
    return f"""
        WITH tab AS (
          SELECT event_type,
                 CAST(sum(CASE WHEN (user_id * 48271) % 2147483647 % 2 = 0
                           AND value > 200.0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS sa,
                 CAST(sum(CASE WHEN (user_id * 48271) % 2147483647 % 2 = 0
                           AND value <= 200.0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS fa,
                 CAST(sum(CASE WHEN (user_id * 48271) % 2147483647 % 2 = 1
                           AND value > 200.0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS sb,
                 CAST(sum(CASE WHEN (user_id * 48271) % 2147483647 % 2 = 1
                           AND value <= 200.0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS fb
          FROM events GROUP BY 1
        )
        {body}
    """


def _q_hod_rayleigh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day circular statistics per event type: mean phase (as an
    hour), resultant length R, and the Rayleigh uniformity statistic
    z = n*R^2 — does this event type concentrate at a time of day? The
    wall-clock companion of bearing_circular_stats. Trig sums fold in
    event order for cross-engine determinism."""
    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    theta = (
        (us % (86400 * 1000 * 1000)).cast("double")
        / (86400.0 * 1000 * 1000)
        * 2.0
        * math.pi
    )
    rows = ev.select("event_type", "event_id", theta.alias("th"))
    agg = rows.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct("event_id", F.cos(F.col("th")).alias("v"))
                )
            ),
            F.lit(0.0),
            lambda a, x: a + x["v"],
        ).alias("sc"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct("event_id", F.sin(F.col("th")).alias("v"))
                )
            ),
            F.lit(0.0),
            lambda a, x: a + x["v"],
        ).alias("ss"),
    )
    nd = F.col("n").cast("double")
    r = F.sqrt(F.col("sc") * F.col("sc") + F.col("ss") * F.col("ss")) / nd
    mean_hour = (
        (F.atan2(F.col("ss"), F.col("sc")) + 2.0 * math.pi)
        % (2.0 * math.pi)
    ) / (2.0 * math.pi) * 24.0
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        F.round(mean_hour, 9).alias("mean_hour"),
        F.round(r, 9).alias("resultant_r"),
        F.round(nd * r * r, 9).alias("rayleigh_z"),
    ).orderBy("event_type")


_HOD_RAYLEIGH_ORACLE = f"""
    WITH rows_ AS (
      SELECT event_type, event_id,
             CAST(epoch_us(ts) % 86400000000 AS DOUBLE)
               / (86400.0 * 1000 * 1000) * 2.0 * {math.pi!r} AS th
      FROM events
    ),
    agg AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             list_reduce(list_prepend(0.0, list(cos(th) ORDER BY event_id)),
                         (a, b) -> a + b) AS sc,
             list_reduce(list_prepend(0.0, list(sin(th) ORDER BY event_id)),
                         (a, b) -> a + b) AS ss
      FROM rows_ GROUP BY 1
    )
    SELECT event_type, n AS n_events,
           round(((atan2(ss, sc) + 2.0 * {math.pi!r})
                  % (2.0 * {math.pi!r})) / (2.0 * {math.pi!r}) * 24.0, 9)
             AS mean_hour,
           round(sqrt(sc * sc + ss * ss) / CAST(n AS DOUBLE), 9)
             AS resultant_r,
           round(CAST(n AS DOUBLE)
                 * (sqrt(sc * sc + ss * ss) / CAST(n AS DOUBLE))
                 * (sqrt(sc * sc + ss * ss) / CAST(n AS DOUBLE)), 9)
             AS rayleigh_z
    FROM agg ORDER BY event_type
"""


def _q_zonal_overlay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonal overlay cross-tabulation: elevation class (hash surface
    // 1000, 4 classes) x event-density class (decimal digit count of
    the cell's event count) over occupied 2-degree cells, with row
    totals — the confusion-matrix style raster overlay every map-algebra
    stack ships. One count aggregate + one scalar class projection; all
    BIGINT."""
    ev = _load(spark, sf_dir, "events")
    e = F.col("event_id")
    lat = -60.0 + (e * 11 % 120) + (e % 83) / 83.0
    lng = -170.0 + (e * 17 % 340) + (e % 79) / 79.0
    cells = (
        ev.select(
            F.floor(lat / 2.0).cast("long").alias("r"),
            F.floor(lng / 2.0).cast("long").alias("c"),
        )
        .groupBy("r", "c")
        .agg(F.count("*").alias("n"))
    )
    cells.createOrReplaceTempView("_zov_cells")
    elev_cls = (
        f"CAST(floor({_grid_elev_sql('r', 'c')} / 1000.0) AS BIGINT)"
    )
    return spark.sql(f"""
        WITH tab AS (
          SELECT {elev_cls} AS elev_class,
                 CAST(length(CAST(n AS STRING)) AS BIGINT) AS density_class,
                 n
          FROM _zov_cells
        )
        SELECT elev_class, density_class,
               CAST(count(*) AS BIGINT) AS n_cells,
               CAST(sum(n) AS BIGINT) AS n_events
        FROM tab GROUP BY 1, 2 ORDER BY 1, 2
    """)


_ZONAL_OVERLAY_ORACLE = f"""
    WITH cells AS (
      SELECT CAST(floor((-60.0 + (event_id * 11 % 120)
                         + (event_id % 83) / 83.0) / 2.0) AS BIGINT) AS r,
             CAST(floor((-170.0 + (event_id * 17 % 340)
                         + (event_id % 79) / 79.0) / 2.0) AS BIGINT) AS c,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    tab AS (
      SELECT CAST(floor({_grid_elev_sql('r', 'c')} / 1000.0) AS BIGINT)
               AS elev_class,
             CAST(length(CAST(n AS VARCHAR)) AS BIGINT) AS density_class,
             n
      FROM cells
    )
    SELECT elev_class, density_class,
           CAST(count(*) AS BIGINT) AS n_cells,
           CAST(sum(n) AS BIGINT) AS n_events
    FROM tab GROUP BY 1, 2 ORDER BY 1, 2
"""


def _viewshed_select_sql(src: str, seq: str, tf: str, fold) -> str:
    """Grid viewshed from the observer at cell (0, 0), eye height 100
    over the hash-elevation surface: a target cell is visible iff its
    elevation angle exceeds every intermediate sample's along the
    nearest-cell-rasterized ray (max(|dr|,|dc|) steps). The ray walk is
    an inner fold over the step sequence — pure scalar, no joins."""
    # BIGINT-cast observer coords: Spark's constant folder would
    # otherwise evaluate the hash at INT32 and overflow
    e0 = (
        f"({_grid_elev_sql('CAST(0 AS BIGINT)', 'CAST(0 AS BIGINT)')}"
        f" + 100)"
    )
    # sample position at step t of d: round to nearest cell
    sr = "CAST(floor(CAST(r AS DOUBLE) * t / d + 0.5) AS BIGINT)"
    sc = "CAST(floor(CAST(c AS DOUBLE) * t / d + 0.5) AS BIGINT)"
    es = _grid_elev_sql(f"({sr})", f"({sc})")
    tan_s = f"(CAST({es} - {e0} AS DOUBLE) / CAST(t AS DOUBLE))"
    body = f"greatest(acc, {tan_s})"
    walk = fold(
        f"{tf}({seq}(1, CAST(d - 1 AS BIGINT)), s -> CAST(s AS DOUBLE))",
        "CAST(-1.0e300 AS DOUBLE)",
        body,
    )
    et = _grid_elev_sql("r", "c")
    return f"""
        SELECT r, c, d,
               round(tan_t, 9) AS target_tan,
               CASE WHEN d <= 1 THEN 0.0
                    ELSE round(max_block, 9) END AS max_block_tan,
               CAST(d <= 1 OR tan_t > max_block AS BOOLEAN) AS visible
        FROM (
          SELECT r, c, d,
                 CAST({et} - {e0} AS DOUBLE) / CAST(d AS DOUBLE) AS tan_t,
                 CASE WHEN d <= 1 THEN CAST(-1.0e300 AS DOUBLE)
                      ELSE {walk} END AS max_block
          FROM (
            SELECT r, c, greatest(abs(r), abs(c)) AS d FROM {src}
            WHERE NOT (r = 0 AND c = 0)
          )
        ) ORDER BY r, c
    """


def _q_viewshed_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viewshed over the occupied grid (see _viewshed_select_sql): the
    line_of_sight primitive lifted to a whole-raster operator, with the
    per-target ray walk as an inner JVM fold — zero joins, pure
    codegen, the 100-TB-safe shape for an embarrassingly parallel
    raster op. 't' inside the fold is the double-cast step index."""
    _grid_occ(spark, sf_dir).createOrReplaceTempView("_vs_occ")
    sql = _viewshed_select_sql(
        "_vs_occ", "sequence", "transform",
        lambda arr, init, body: (
            f"aggregate({arr}, {init}, (acc, t) -> {body})"
        ),
    )
    return spark.sql(sql)


def _viewshed_oracle_sql() -> str:
    return _viewshed_select_sql(
        f"({_GRID_OCC_SQL})", "generate_series", "list_transform",
        lambda arr, init, body: (
            f"list_reduce(list_prepend({init}, {arr}), (acc, t) -> {body})"
        ),
    )


def _q_terrain_curvature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zevenbergen-Thorne curvature on the hash-elevation grid:
    second differences zxx, zyy, the cross term zxy, and the general
    curvature -2*(zxx + zyy) per occupied cell — the concavity layer
    completing slope/aspect/hillshade/TRI. zxx/zyy are exact BIGINTs,
    zxy a quarter-integer; zero joins."""
    _grid_occ(spark, sf_dir).createOrReplaceTempView("_tc_occ")
    return spark.sql(_curvature_select_sql("_tc_occ"))


def _curvature_select_sql(src: str) -> str:
    z = {
        (dr, dc): _grid_elev_sql(f"(r + {dr})", f"(c + {dc})")
        for dr in (-1, 0, 1)
        for dc in (-1, 0, 1)
    }
    zxx = f"({z[(0, 1)]} - 2 * {z[(0, 0)]} + {z[(0, -1)]})"
    zyy = f"({z[(1, 0)]} - 2 * {z[(0, 0)]} + {z[(-1, 0)]})"
    zxy = (
        f"(CAST({z[(1, 1)]} - {z[(1, -1)]} - {z[(-1, 1)]} + {z[(-1, -1)]}"
        f" AS DOUBLE) / 4.0)"
    )
    return f"""
        SELECT r, c,
               CAST({zxx} AS BIGINT) AS zxx,
               CAST({zyy} AS BIGINT) AS zyy,
               round({zxy}, 9) AS zxy,
               CAST(-2 * ({zxx} + {zyy}) AS BIGINT) AS curvature
        FROM {src} ORDER BY r, c
    """


def _curvature_oracle_sql() -> str:
    return _curvature_select_sql(f"({_GRID_OCC_SQL})")


_MH_AUDIT_CAP = 500  # same doc_id cap as the minhash groups oracle


def _mh_audit_frames(spark: SparkSession, sf_dir: str):
    """Shared frames for the MinHash audit pair: candidate pairs from
    the production LSH path, plus exact shingle-set Jaccard for every
    pair sharing at least one 5-shingle (pairs sharing none have J = 0
    and cannot matter at any threshold). All counts BIGINT."""
    from gos2_spark.pipeline.dedup import (
        minhash_lsh_candidates, shingle_hashes,
    )

    docs = _load(spark, sf_dir, "documents").where(
        F.col("doc_id") < _MH_AUDIT_CAP
    )
    cands = minhash_lsh_candidates(docs, key_col="doc_id", text_col="text")
    sh = (
        docs.select(
            F.col("doc_id").alias("key"),
            F.explode(shingle_hashes(F.col("text"), 5)).alias("s"),
        )
        .distinct()
    )
    sizes = sh.groupBy("key").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("key").alias("key_a"), "s")
    b = sh.select(F.col("key").alias("key_b"), "s")
    inter = (
        a.join(b, "s")
        .where(F.col("key_a") < F.col("key_b"))
        .groupBy("key_a", "key_b")
        .agg(F.count("*").alias("n_inter"))
    )
    exact = (
        inter.join(
            sizes.select(F.col("key").alias("key_a"), F.col("n_sh").alias("na")),
            "key_a",
        )
        .join(
            sizes.select(F.col("key").alias("key_b"), F.col("n_sh").alias("nb")),
            "key_b",
        )
        .select(
            "key_a", "key_b", "n_inter", "na", "nb",
            (
                F.col("n_inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_inter")).cast("double")
            ).alias("exact_j"),
        )
    )
    return cands, exact


def _q_minhash_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator fidelity audit over the production LSH
    candidate pairs (doc_id < 500, the groups-oracle cohort): per pair,
    the 64-perm signature estimate vs the EXACT 5-shingle-set Jaccard,
    with the absolute error — the calibration table that justifies the
    dedup threshold. Estimates and exact values are both deterministic;
    candidates joined to the exact table, zero-shared-shingle candidates
    get exact_j = 0."""
    cands, exact = _mh_audit_frames(spark, sf_dir)
    j = cands.join(
        exact.select("key_a", "key_b", "exact_j"), ["key_a", "key_b"], "left"
    )
    return j.select(
        "key_a",
        "key_b",
        F.round("est_jaccard", 9).alias("est_j"),
        F.round(F.coalesce(F.col("exact_j"), F.lit(0.0)), 9).alias("exact_j"),
        F.round(
            F.abs(
                F.col("est_jaccard") - F.coalesce(F.col("exact_j"), F.lit(0.0))
            ),
            9,
        ).alias("abs_err"),
    ).orderBy("key_a", "key_b")


def _q_lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH recall/precision audit at exact-Jaccard threshold 0.5 over
    the same cohort: of all truly-similar pairs (exact J >= 0.5,
    enumerable exactly because zero-overlap pairs cannot qualify), how
    many did the banded candidate generation surface, and how many
    candidates were true — the one-row quality certificate for the
    banding parameters. All counts BIGINT, two pinned divisions."""
    cands, exact = _mh_audit_frames(spark, sf_dir)
    truth = exact.where(F.col("exact_j") >= 0.5).select("key_a", "key_b")
    cpairs = cands.select("key_a", "key_b")
    hits = truth.join(cpairs, ["key_a", "key_b"]).count()
    n_truth = truth.count()
    n_cand = cpairs.count()
    return spark.createDataFrame(
        [(int(n_truth), int(n_cand), int(hits))],
        "n_true_pairs long, n_candidates long, n_hits long",
    ).select(
        "*",
        F.round(
            F.when(
                F.col("n_true_pairs") > 0,
                F.col("n_hits").cast("double")
                / F.col("n_true_pairs").cast("double"),
            ).otherwise(F.lit(1.0)),
            9,
        ).alias("recall"),
        F.round(
            F.when(
                F.col("n_candidates") > 0,
                F.col("n_hits").cast("double")
                / F.col("n_candidates").cast("double"),
            ).otherwise(F.lit(1.0)),
            9,
        ).alias("precision"),
    )


def _q_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease + Flesch-Kincaid grade per language from
    exact integer counts: sentences = non-blank [.!?]+ splits, words =
    whitespace tokens, syllables = [aeiouy]+ vowel groups (the standard
    heuristic; groups never span whitespace so the corpus-level regexp
    count equals the per-word sum). One scalar projection + one agg;
    the two scores are fixed-order doubles over BIGINT totals."""
    docs = _load(spark, sf_dir, "documents")
    sents = F.size(
        F.filter(
            F.split(F.col("text"), r"[.!?]+"),
            lambda x: F.length(F.trim(x)) > 0,
        )
    )
    words = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    sylls = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), 0)
    )
    agg = docs.select(
        "lang", sents.alias("s"), words.alias("w"), sylls.alias("y")
    ).groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("s").alias("ts"),
        F.sum("w").alias("tw"),
        F.sum("y").alias("ty"),
    )
    wps = F.col("tw").cast("double") / F.col("ts").cast("double")
    spw = F.col("ty").cast("double") / F.col("tw").cast("double")
    return agg.select(
        "lang",
        "n_docs",
        F.col("ts").cast("long").alias("n_sentences"),
        F.col("tw").cast("long").alias("n_words"),
        F.col("ty").cast("long").alias("n_syllables"),
        F.round(206.835 - 1.015 * wps - 84.6 * spw, 9).alias("flesch_ease"),
        F.round(0.39 * wps + 11.8 * spw - 15.59, 9).alias("fk_grade"),
    ).orderBy("lang")


_READABILITY_ORACLE = r"""
    WITH t AS (
      SELECT lang,
             len(list_filter(regexp_split_to_array(text, '[\.!\?]+'),
                             x -> length(trim(x)) > 0)) AS s,
             len(regexp_split_to_array(trim(text), '\s+')) AS w,
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS y
      FROM documents
    ),
    agg AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(s) AS BIGINT) AS ts, CAST(sum(w) AS BIGINT) AS tw,
             CAST(sum(y) AS BIGINT) AS ty
      FROM t GROUP BY 1
    )
    SELECT lang, n_docs, ts AS n_sentences, tw AS n_words,
           ty AS n_syllables,
           round(206.835 - 1.015 * (CAST(tw AS DOUBLE) / CAST(ts AS DOUBLE))
                 - 84.6 * (CAST(ty AS DOUBLE) / CAST(tw AS DOUBLE)), 9)
             AS flesch_ease,
           round(0.39 * (CAST(tw AS DOUBLE) / CAST(ts AS DOUBLE))
                 + 11.8 * (CAST(ty AS DOUBLE) / CAST(tw AS DOUBLE))
                 - 15.59, 9) AS fk_grade
    FROM agg ORDER BY lang
"""


def _q_cumulative_incidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aalen-Johansen cumulative incidence under competing risks
    (spark/survival.py cumulative_incidence): per user-cohort
    (user_id mod 3), time in whole hours (+1) from the user's first
    event to their first PURCHASE (cause 1) or SIGNUP (cause 2) —
    whichever strikes first; users hit by neither are right-censored at
    the global horizon. The correct 'probability of converting by t
    while churn competes' curve that 1 - KM overstates."""
    from pyspark.sql import Window

    from gos2_spark.spark.survival import cumulative_incidence

    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    base = ev.select(
        "user_id", us.alias("us"), "event_id", "event_type"
    )
    per = base.groupBy("user_id").agg(
        F.min("us").alias("t0"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("us"))
        ).alias("tp"),
        F.min(F.when(F.col("event_type") == "signup", F.col("us"))).alias(
            "ts_"
        ),
    )
    horizon = base.agg(F.max("us").alias("hz"))
    j = per.crossJoin(F.broadcast(horizon))
    first_evt = F.least(
        F.coalesce(F.col("tp"), F.lit(2**62)),
        F.coalesce(F.col("ts_"), F.lit(2**62)),
    )
    cause = F.when(
        first_evt == F.lit(2**62), F.lit(0)
    ).when(
        F.coalesce(F.col("tp"), F.lit(2**62))
        <= F.coalesce(F.col("ts_"), F.lit(2**62)),
        F.lit(1),
    ).otherwise(F.lit(2))
    dur_end = F.when(first_evt == F.lit(2**62), F.col("hz")).otherwise(
        first_evt
    )
    rows = j.select(
        (F.col("user_id") % 3).alias("cohort"),
        (F.floor((dur_end - F.col("t0")) / _HOUR_US) + 1)
        .cast("long")
        .alias("t_hr"),
        cause.alias("cause"),
    )
    return cumulative_incidence(rows, "cohort", "t_hr", "cause").orderBy(
        "cohort", "t"
    )


_CIF_ORACLE = """
    WITH base AS (
      SELECT user_id, epoch_us(ts) AS us, event_type FROM events
    ),
    per AS (
      SELECT user_id, min(us) AS t0,
             min(CASE WHEN event_type = 'purchase' THEN us END) AS tp,
             min(CASE WHEN event_type = 'signup' THEN us END) AS ts_
      FROM base GROUP BY 1
    ),
    hz AS (SELECT max(us) AS hz FROM base),
    rows_ AS (
      SELECT user_id % 3 AS cohort,
             CAST(floor((CASE WHEN tp IS NULL AND ts_ IS NULL THEN hz
                        ELSE least(coalesce(tp, 4611686018427387904),
                                   coalesce(ts_, 4611686018427387904)) END
                   - t0) / 3600000000.0) + 1 AS BIGINT) AS t_hr,
             CASE WHEN tp IS NULL AND ts_ IS NULL THEN 0
                  WHEN coalesce(tp, 4611686018427387904)
                       <= coalesce(ts_, 4611686018427387904) THEN 1
                  ELSE 2 END AS cause
      FROM per CROSS JOIN hz
    ),
    byt AS (
      SELECT cohort, t_hr AS t,
             CAST(sum(CASE WHEN cause = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
             CAST(sum(CASE WHEN cause = 2 THEN 1 ELSE 0 END) AS BIGINT) AS d2,
             CAST(sum(CASE WHEN cause = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS cen
      FROM rows_ GROUP BY 1, 2
    ),
    risk AS (
      SELECT cohort, t, d1, d2, cen,
             sum(d1 + d2 + cen) OVER (PARTITION BY cohort)
               - sum(d1 + d2 + cen) OVER (PARTITION BY cohort ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               + (d1 + d2 + cen) AS n
      FROM byt
    ),
    ev_ AS (SELECT * FROM risk WHERE d1 + d2 > 0),
    curve AS (
      SELECT cohort,
             list_sort(list([CAST(t AS DOUBLE), CAST(d1 AS DOUBLE),
                             CAST(d2 AS DOUBLE), CAST(cen AS DOUBLE),
                             CAST(n AS DOUBLE)])) AS arr
      FROM ev_ GROUP BY 1
    ),
    rowed AS (
      SELECT e.cohort, e.t, e.d1, e.d2, e.cen, e.n, c.arr,
             row_number() OVER (PARTITION BY e.cohort ORDER BY e.t) AS i
      FROM ev_ e JOIN curve c ON c.cohort = e.cohort
    ),
    folded AS (
      SELECT cohort, t, d1, d2, cen, n,
             list_reduce(
               list_prepend([1.0, 0.0, 0.0],
                            list_slice(arr, 1, CAST(i AS INT))),
               (acc, x) -> [
                 acc[1] * ((x[5] - x[2] - x[3]) / x[5]),
                 acc[2] + acc[1] * x[2] / x[5],
                 acc[3] + acc[1] * x[3] / x[5]
               ]) AS st
      FROM rowed
    )
    SELECT cohort, t, n AS n_risk, d1, d2, cen AS n_censored,
           round(st[1], 9) AS surv, round(st[2], 9) AS cif1,
           round(st[3], 9) AS cif2
    FROM folded ORDER BY cohort, t
"""


_FS_CAP = 2000
_FS_WEIGHTS = {  # (ln(m/u), ln((1-m)/(1-u))) per field, fixed doubles
    "seg": (0.95, 0.2),
    "bal": (0.9, 0.01),
    "name": (0.99, 0.001),
}


def _q_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage between the customer
    table and a deterministic NOISY COPY of itself (hash-perturbed
    segment / balance), blocked on nationkey (custkey < 2000 cohort):
    agreement on (segment, balance-within-1, name-suffix) scores
    sum ln(m/u) or ln((1-m)/(1-u)) with fixed published m/u constants;
    decisions at score > 5 (link) / < 0 (non-link). Rolled up by
    (is_true_pair, decision) with exact counts and score extrema — the
    classical ER quality matrix."""
    import math as _m

    c = _load(spark, sf_dir, "customer").where(F.col("c_custkey") < _FS_CAP)
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    seg_arr = F.array(*[F.lit(s) for s in segs])
    noisy = c.select(
        F.col("c_custkey").alias("nk_key"),
        F.col("c_nationkey").alias("nk_nat"),
        F.when(
            F.col("c_custkey") * 48271 % 5 == 0,
            F.element_at(seg_arr, (F.col("c_custkey") * 7919 % 5 + 1).cast("int")),
        ).otherwise(F.col("c_mktsegment")).alias("nk_seg"),
        (
            F.col("c_acctbal")
            + F.when(F.col("c_custkey") * 69069 % 7 == 0, 50.0).otherwise(0.0)
        ).alias("nk_bal"),
        F.substring(F.col("c_name"), -3, 3).alias("nk_suffix"),
    )
    orig = c.select(
        F.col("c_custkey").alias("o_key"),
        F.col("c_nationkey").alias("o_nat"),
        F.col("c_mktsegment").alias("o_seg"),
        F.col("c_acctbal").alias("o_bal"),
        F.substring(F.col("c_name"), -3, 3).alias("o_suffix"),
    )
    pairs = orig.join(noisy, orig["o_nat"] == noisy["nk_nat"])
    agree_seg = (F.col("o_seg") == F.col("nk_seg")).cast("int")
    agree_bal = (F.abs(F.col("o_bal") - F.col("nk_bal")) <= 1.0).cast("int")
    agree_nm = (F.col("o_suffix") == F.col("nk_suffix")).cast("int")

    def _w(agree, m, u):
        return F.when(
            agree == 1, F.lit(_m.log(m / u))
        ).otherwise(F.lit(_m.log((1 - m) / (1 - u))))

    score = (
        _w(agree_seg, *_FS_WEIGHTS["seg"])
        + _w(agree_bal, *_FS_WEIGHTS["bal"])
        + _w(agree_nm, *_FS_WEIGHTS["name"])
    )
    scored = pairs.select(
        (F.col("o_key") == F.col("nk_key")).cast("int").alias("is_true"),
        score.alias("score"),
    ).withColumn(
        "decision",
        F.when(F.col("score") > 5.0, F.lit("link"))
        .when(F.col("score") < 0.0, F.lit("non_link"))
        .otherwise(F.lit("possible")),
    )
    return (
        scored.groupBy("is_true", "decision")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.min("score"), 9).alias("min_score"),
            F.round(F.max("score"), 9).alias("max_score"),
        )
        .orderBy("is_true", "decision")
    )


def _fs_oracle_sql() -> str:
    import math as _m

    segs = "['AUTOMOBILE', 'BUILDING', 'FURNITURE', 'HOUSEHOLD', 'MACHINERY']"
    w = {
        k: (_m.log(m / u), _m.log((1 - m) / (1 - u)))
        for k, (m, u) in _FS_WEIGHTS.items()
    }
    return f"""
        WITH c AS (
          SELECT * FROM customer WHERE c_custkey < {_FS_CAP}
        ),
        noisy AS (
          SELECT c_custkey AS nk_key, c_nationkey AS nk_nat,
                 CASE WHEN c_custkey * 48271 % 5 = 0
                      THEN ({segs})[CAST(c_custkey * 7919 % 5 + 1 AS INT)]
                      ELSE c_mktsegment END AS nk_seg,
                 c_acctbal + CASE WHEN c_custkey * 69069 % 7 = 0
                                  THEN 50.0 ELSE 0.0 END AS nk_bal,
                 substr(c_name, length(c_name) - 2, 3) AS nk_suffix
          FROM c
        ),
        orig AS (
          SELECT c_custkey AS o_key, c_nationkey AS o_nat,
                 c_mktsegment AS o_seg, c_acctbal AS o_bal,
                 substr(c_name, length(c_name) - 2, 3) AS o_suffix
          FROM c
        ),
        scored AS (
          SELECT CAST(o_key = nk_key AS INT) AS is_true,
                 (CASE WHEN o_seg = nk_seg THEN {w['seg'][0]!r}
                       ELSE {w['seg'][1]!r} END
                  + CASE WHEN abs(o_bal - nk_bal) <= 1.0 THEN {w['bal'][0]!r}
                         ELSE {w['bal'][1]!r} END
                  + CASE WHEN o_suffix = nk_suffix THEN {w['name'][0]!r}
                         ELSE {w['name'][1]!r} END) AS score
          FROM orig JOIN noisy ON nk_nat = o_nat
        )
        SELECT is_true,
               CASE WHEN score > 5.0 THEN 'link'
                    WHEN score < 0.0 THEN 'non_link'
                    ELSE 'possible' END AS decision,
               CAST(count(*) AS BIGINT) AS n_pairs,
               round(min(score), 9) AS min_score,
               round(max(score), 9) AS max_score
        FROM scored GROUP BY 1, 2 ORDER BY 1, 2
    """


def _q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (nats) + chi-square independence between
    market segment and nation over customers: MI from exact BIGINT
    joint/marginal counts with the cross-cell float sum folded in
    (segment, nation) order; the categorical dependence screen feature
    selection runs before crossing variables."""
    c = _load(spark, sf_dir, "customer")
    joint = c.groupBy(
        F.col("c_mktsegment").alias("x"), F.col("c_nationkey").alias("y")
    ).agg(F.count("*").alias("nxy"))
    mx = joint.groupBy("x").agg(F.sum("nxy").alias("nx"))
    my = joint.groupBy("y").agg(F.sum("nxy").alias("ny"))
    tot = joint.agg(F.sum("nxy").alias("n"))
    j = (
        joint.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(tot))
    )
    nd = F.col("n").cast("double")
    mi_term = (
        F.col("nxy").cast("double")
        / nd
        * F.log(
            F.col("nxy").cast("double")
            * nd
            / (F.col("nx").cast("double") * F.col("ny").cast("double"))
        )
    )
    e = F.col("nx").cast("double") * F.col("ny").cast("double") / nd
    chi_term = (F.col("nxy").cast("double") - e) * (
        F.col("nxy").cast("double") - e
    ) / e
    agg = j.select(
        "x", "y", mi_term.alias("mt"), chi_term.alias("ct"), "n"
    ).groupBy("n").agg(
        F.count("*").alias("n_cells"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("x", "y", F.col("mt").alias("v")))),
            F.lit(0.0),
            lambda a, x: a + x["v"],
        ).alias("mi"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("x", "y", F.col("ct").alias("v")))),
            F.lit(0.0),
            lambda a, x: a + x["v"],
        ).alias("chi2"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_cells").cast("long").alias("n_cells"),
        F.round("mi", 9).alias("mi_nats"),
        F.round("chi2", 9).alias("chi2"),
    )


_MI_ORACLE = """
    WITH joint AS (
      SELECT c_mktsegment AS x, c_nationkey AS y,
             CAST(count(*) AS BIGINT) AS nxy
      FROM customer GROUP BY 1, 2
    ),
    mx AS (SELECT x, CAST(sum(nxy) AS BIGINT) AS nx FROM joint GROUP BY 1),
    my AS (SELECT y, CAST(sum(nxy) AS BIGINT) AS ny FROM joint GROUP BY 1),
    tot AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM joint),
    terms AS (
      SELECT j.x, j.y, n,
             CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE)
               * ln(CAST(nxy AS DOUBLE) * CAST(n AS DOUBLE)
                    / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE))) AS mt,
             (CAST(nxy AS DOUBLE)
              - CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(nxy AS DOUBLE)
                - CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)
                  / CAST(n AS DOUBLE))
             / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)
                / CAST(n AS DOUBLE)) AS ct
      FROM joint j
      JOIN mx ON mx.x = j.x JOIN my ON my.y = j.y CROSS JOIN tot
    )
    SELECT n, CAST(count(*) AS BIGINT) AS n_cells,
           round(list_reduce(list_prepend(0.0, list(mt ORDER BY x, y)),
                             (a, b) -> a + b), 9) AS mi_nats,
           round(list_reduce(list_prepend(0.0, list(ct ORDER BY x, y)),
                             (a, b) -> a + b), 9) AS chi2
    FROM terms GROUP BY n
"""


_EXP_SPLIT_DAY = 19738  # mid-window: days 19723..19737 pre, rest post


def _exp_user_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared experimentation frame: per user, integer-cent value sums
    for the pre/post periods plus the hash-assigned arm (all BIGINT)."""
    ev = _load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    day = (us / (86400 * 1000 * 1000)).cast("long")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return ev.select(
        "user_id",
        (F.col("user_id") * 1103515245 % 97 % 2).alias("arm"),
        F.when(day < _EXP_SPLIT_DAY, cents).otherwise(F.lit(0)).alias("xc"),
        F.when(day >= _EXP_SPLIT_DAY, cents).otherwise(F.lit(0)).alias("yc"),
    ).groupBy("user_id", "arm").agg(
        F.sum("xc").alias("x"), F.sum("yc").alias("y")
    )


_EXP_PERIODS_SQL = f"""
    SELECT user_id, (user_id * 1103515245) % 97 % 2 AS arm,
           CAST(sum(CASE WHEN epoch_us(ts) // 86400000000 < {_EXP_SPLIT_DAY}
                    THEN CAST(round(value * 100) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS x,
           CAST(sum(CASE WHEN epoch_us(ts) // 86400000000 >= {_EXP_SPLIT_DAY}
                    THEN CAST(round(value * 100) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
"""


def _q_cuped_adjusted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout: theta =
    cov(pre, post)/var(pre) fitted on ALL users (the standard pooled
    fit), then per arm the adjusted mean y - theta*(x - xbar_global) —
    the pre-period covariate soaks up between-user variance so the
    treatment contrast needs far fewer samples. Every sufficient
    statistic (n, Sx, Sy, Sxy, Sxx per scope) is an exact BIGINT in
    integer cents; theta and the means are fixed-order doubles."""
    per = _exp_user_periods(spark, sf_dir)
    glob = per.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    arm = per.groupBy("arm").agg(
        F.count("*").alias("na"),
        F.sum("x").alias("sxa"),
        F.sum("y").alias("sya"),
    )
    j = arm.crossJoin(F.broadcast(glob))
    nd = F.col("n").cast("double")
    xbar = F.col("sx").cast("double") / nd
    theta = (
        F.col("sxy").cast("double") - F.col("sx").cast("double")
        * F.col("sy").cast("double") / nd
    ) / (
        F.col("sxx").cast("double") - F.col("sx").cast("double")
        * F.col("sx").cast("double") / nd
    )
    nad = F.col("na").cast("double")
    mean_y = F.col("sya").cast("double") / nad / 100.0
    mean_x = F.col("sxa").cast("double") / nad / 100.0
    adj = mean_y - theta * (mean_x - xbar / 100.0)
    return j.select(
        "arm",
        F.col("na").cast("long").alias("n_users"),
        F.round(mean_x, 9).alias("mean_pre"),
        F.round(mean_y, 9).alias("mean_post"),
        F.round(theta, 9).alias("theta"),
        F.round(adj, 9).alias("adj_mean"),
    ).orderBy("arm")


_CUPED_ORACLE = f"""
    WITH per AS ({_EXP_PERIODS_SQL}),
    g_ AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM per
    ),
    arm AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS na,
             CAST(sum(x) AS BIGINT) AS sxa, CAST(sum(y) AS BIGINT) AS sya
      FROM per GROUP BY 1
    )
    SELECT arm, na AS n_users,
           round(CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE) / 100.0, 9)
             AS mean_pre,
           round(CAST(sya AS DOUBLE) / CAST(na AS DOUBLE) / 100.0, 9)
             AS mean_post,
           round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                    * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                    * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 9) AS theta,
           round(CAST(sya AS DOUBLE) / CAST(na AS DOUBLE) / 100.0
                 - ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                       * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                    / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                       * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
                   * (CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE) / 100.0
                      - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100.0), 9)
             AS adj_mean
    FROM arm CROSS JOIN g_ ORDER BY arm
"""


def _q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences on the arm x period panel: the four
    per-user-period cell means of value (cents), DiD = (treat_post -
    treat_pre) - (ctrl_post - ctrl_pre), with the large-sample SE from
    exact per-cell second moments — the standard quasi-experimental
    readout. One row; everything from BIGINT sufficient statistics."""
    per = _exp_user_periods(spark, sf_dir)
    long = per.select(
        "arm", F.lit(0).alias("period"), F.col("x").alias("v")
    ).union(
        per.select("arm", F.lit(1).alias("period"), F.col("y").alias("v"))
    )
    cells = long.groupBy("arm", "period").agg(
        F.count("*").alias("nc"),
        F.sum("v").alias("sv"),
        F.sum(F.col("v") * F.col("v")).alias("svv"),
    )
    piv = cells.agg(
        *[
            F.max(
                F.when(
                    (F.col("arm") == a) & (F.col("period") == p),
                    F.col(col),
                )
            ).alias(f"{col}{a}{p}")
            for a in (0, 1)
            for p in (0, 1)
            for col in ("nc", "sv", "svv")
        ]
    )

    def mean(a, p):
        return (
            F.col(f"sv{a}{p}").cast("double")
            / F.col(f"nc{a}{p}").cast("double")
            / 100.0
        )

    def var_over_n(a, p):
        nd = F.col(f"nc{a}{p}").cast("double")
        m = F.col(f"sv{a}{p}").cast("double") / nd
        v = (F.col(f"svv{a}{p}").cast("double") - nd * m * m) / (nd - 1.0)
        return v / nd / 10000.0

    did = (mean(1, 1) - mean(1, 0)) - (mean(0, 1) - mean(0, 0))
    se = F.sqrt(
        var_over_n(1, 1) + var_over_n(1, 0) + var_over_n(0, 1)
        + var_over_n(0, 0)
    )
    return piv.select(
        F.round(mean(0, 0), 9).alias("ctrl_pre"),
        F.round(mean(0, 1), 9).alias("ctrl_post"),
        F.round(mean(1, 0), 9).alias("treat_pre"),
        F.round(mean(1, 1), 9).alias("treat_post"),
        F.round(did, 9).alias("did"),
        F.round(se, 9).alias("se"),
        F.round(did / se, 9).alias("t_stat"),
    )


def _did_oracle_sql() -> str:
    def mean(a, p):
        return (
            f"(CAST(sv{a}{p} AS DOUBLE) / CAST(nc{a}{p} AS DOUBLE) / 100.0)"
        )

    def von(a, p):
        nd = f"CAST(nc{a}{p} AS DOUBLE)"
        m = f"(CAST(sv{a}{p} AS DOUBLE) / {nd})"
        return (
            f"(((CAST(svv{a}{p} AS DOUBLE) - {nd} * {m} * {m})"
            f" / ({nd} - 1.0)) / {nd} / 10000.0)"
        )

    did = f"(({mean(1,1)} - {mean(1,0)}) - ({mean(0,1)} - {mean(0,0)}))"
    se = f"sqrt({von(1,1)} + {von(1,0)} + {von(0,1)} + {von(0,0)})"
    piv = ", ".join(
        f"CAST(max(CASE WHEN arm = {a} AND period = {p} THEN {col} END)"
        f" AS BIGINT) AS {col}{a}{p}"
        for a in (0, 1)
        for p in (0, 1)
        for col in ("nc", "sv", "svv")
    )
    return f"""
        WITH per AS ({_EXP_PERIODS_SQL}),
        long_ AS (
          SELECT arm, 0 AS period, x AS v FROM per
          UNION ALL SELECT arm, 1, y FROM per
        ),
        cells AS (
          SELECT arm, period, count(*) AS nc, sum(v) AS sv,
                 sum(v * v) AS svv
          FROM long_ GROUP BY 1, 2
        ),
        piv AS (SELECT {piv} FROM cells)
        SELECT round({mean(0,0)}, 9) AS ctrl_pre,
               round({mean(0,1)}, 9) AS ctrl_post,
               round({mean(1,0)}, 9) AS treat_pre,
               round({mean(1,1)}, 9) AS treat_post,
               round({did}, 9) AS did,
               round({se}, 9) AS se,
               round({did} / {se}, 9) AS t_stat
        FROM piv
    """


def _q_ipw_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity-weighted ATE of 'treatment' (the hash arm) on
    post-period spend, with a FIXED synthetic propensity model
    p = sigmoid(-0.2 + 0.08 * (user_id mod 10)) — the Horvitz-Thompson
    estimator mechanics (weight clipping included) over exact per-user
    integer outcomes; weighted sums fold in user order. Output: n per
    arm, weighted means, ate."""
    per = _exp_user_periods(spark, sf_dir)
    z = (F.col("user_id") % 10).cast("double")
    p = 1.0 / (1.0 + F.exp(-(-0.2 + 0.08 * z)))
    pc = F.least(F.greatest(p, F.lit(0.05)), F.lit(0.95))
    yd = F.col("y").cast("double") / 100.0
    rows = per.select(
        "user_id", "arm", yd.alias("yv"), pc.alias("p")
    )
    wt = F.when(F.col("arm") == 1, 1.0 / F.col("p")).otherwise(
        1.0 / (1.0 - F.col("p"))
    )
    agg = rows.groupBy("arm").agg(
        F.count("*").alias("n"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct("user_id", (wt * F.col("yv")).alias("wy"))
                )
            ),
            F.lit(0.0),
            lambda a, x: a + x["wy"],
        ).alias("swy"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("user_id", wt.alias("w")))),
            F.lit(0.0),
            lambda a, x: a + x["w"],
        ).alias("sw"),
    )
    piv = agg.agg(
        *[
            F.max(F.when(F.col("arm") == a, F.col(c))).alias(f"{c}{a}")
            for a in (0, 1)
            for c in ("n", "swy", "sw")
        ]
    )
    m1 = F.col("swy1") / F.col("sw1")
    m0 = F.col("swy0") / F.col("sw0")
    return piv.select(
        F.col("n0").cast("long").alias("n_ctrl"),
        F.col("n1").cast("long").alias("n_treat"),
        F.round(m0, 9).alias("ipw_mean_ctrl"),
        F.round(m1, 9).alias("ipw_mean_treat"),
        F.round(m1 - m0, 9).alias("ate"),
    )


_IPW_ORACLE = f"""
    WITH per AS ({_EXP_PERIODS_SQL}),
    rows_ AS (
      SELECT user_id, arm, CAST(y AS DOUBLE) / 100.0 AS yv,
             least(greatest(
               1.0 / (1.0 + exp(-(-0.2 + 0.08
                 * CAST(user_id % 10 AS DOUBLE)))), 0.05), 0.95) AS p
      FROM per
    ),
    agg AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n,
             list_reduce(list_prepend(0.0, list(
               (CASE WHEN arm = 1 THEN 1.0 / p ELSE 1.0 / (1.0 - p) END)
                 * yv ORDER BY user_id)), (a, b) -> a + b) AS swy,
             list_reduce(list_prepend(0.0, list(
               CASE WHEN arm = 1 THEN 1.0 / p ELSE 1.0 / (1.0 - p) END
               ORDER BY user_id)), (a, b) -> a + b) AS sw
      FROM rows_ GROUP BY 1
    ),
    piv AS (
      SELECT max(CASE WHEN arm = 0 THEN n END) AS n0,
             max(CASE WHEN arm = 1 THEN n END) AS n1,
             max(CASE WHEN arm = 0 THEN swy END) AS swy0,
             max(CASE WHEN arm = 1 THEN swy END) AS swy1,
             max(CASE WHEN arm = 0 THEN sw END) AS sw0,
             max(CASE WHEN arm = 1 THEN sw END) AS sw1
      FROM agg
    )
    SELECT CAST(n0 AS BIGINT) AS n_ctrl, CAST(n1 AS BIGINT) AS n_treat,
           round(swy0 / sw0, 9) AS ipw_mean_ctrl,
           round(swy1 / sw1, 9) AS ipw_mean_treat,
           round(swy1 / sw1 - swy0 / sw0, 9) AS ate
    FROM piv
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Registry order matters: the driver's correctness gate evaluates the
    # FIRST 50 names in dict order.  Rounds 1-3 driver-checked 99 distinct
    # queries; round 4 rotates the 52 never-driver-checked exact-oracle
    # queries (everything registered after unigram_logprob in round 3) into
    # positions 1-50.  The 2 that do not fit (label_propagation, kcore_peel)
    # sit at 51-52 and should LEAD the round-5 window together with the
    # never-driver-checked batches after them: cosine_text_join ...
    # geohash_pyramid (round-4 session 1, 86 queries) and
    # degree_assortativity ... mutual_information (session 2, 45 queries)
    # — rotate the next 50 of those into positions 1-50 at the start of
    # round 5; the remainder queue for subsequent windows in registry
    # order.  trajectory_simplify is rows-only by design (data-dependent
    # Douglas-Peucker recursion has no SQL form) and stays OUT of the
    # window so every slot carries an EXACT oracle.  All entries are
    # value-checked locally via tools/oracle_check.py regardless of
    # position — every session closes with a full-registry sweep green
    # ("ALL OK", 334 exact + 1 rows-only at this session's close).
    return {
        # --- positions 1-50: never driver-checked, all exact oracles ---
        "vincenty_rhumb": _q_vincenty_rhumb,
        "vincenty_direct": _q_vincenty_direct,
        "edit_distance_pairs": _q_edit_distance_pairs,
        "cohort_retention": _q_cohort_retention,
        "holt_smoothing": _q_holt_smoothing,
        "convex_hull_nations": _q_convex_hull_nations,
        "mad_outliers": _q_mad_outliers,
        "spacetime_scan_llr": _q_spacetime_scan,
        "burst_viterbi": _q_burst_viterbi,
        "cusum_changepoints": _q_cusum_changepoints,
        "rake_keywords": _q_rake_keywords,
        "stratified_split": _q_stratified_split,
        "rolling_active_users": _q_rolling_active_users,
        "line_of_sight": _q_line_of_sight,
        "scd2_history": _q_scd2_history,
        "map_match_viterbi": _q_map_match_viterbi,
        "ttl_dedup": _q_ttl_dedup,
        "corpus_kl_drift": _q_corpus_kl_drift,
        "user_tile_similarity": _q_user_tile_similarity,
        "bot_gap_regularity": _q_bot_gap_regularity,
        "content_gini": _q_content_gini,
        "value_deciles": _q_value_deciles,
        "solar_position": _q_solar_position,
        "copurchase_pairs": _q_copurchase_pairs,
        "compaction_plan": _q_compaction_plan,
        "markov_transitions": _q_markov_transitions,
        "theil_sen_slope": _q_theil_sen,
        "gps_speed_outliers": _q_gps_speed_outliers,
        "od_matrix": _q_od_matrix,
        "colocation_pairs": _q_colocation_pairs,
        "triangle_counts": _q_triangle_counts,
        "inverted_index_stats": _q_inverted_index_stats,
        "bm25_topk": _q_bm25_topk,
        "anchor_text_terms": _q_anchor_text_terms,
        "bigram_logprob": _q_bigram_logprob,
        "nearest_feature_join": _q_nearest_feature,
        "pmi_collocations": _q_pmi_collocations,
        "hopping_window_counts": _q_hopping_window_counts,
        "cap_bounds_per_user": _q_cap_bounds,
        "link_bfs_hops": _q_link_bfs_hops,
        "funnel_steps": _q_funnel_steps,
        "idw_interpolation": _q_idw_interpolation,
        "value_trend_ols": _q_value_trend_ols,
        "weighted_sssp": _q_weighted_sssp,
        "hybrid_rrf_retrieval": _q_hybrid_rrf,
        "dedup_canonical_pick": _q_dedup_canonical,
        "morans_i_cells": _q_morans_i,
        "ewma_user_value": _q_ewma_user_value,
        "gistar_hotspots": _q_gistar_cells,
        "ripley_k_function": _q_ripley_k,
        # --- 51+: lead the round-5 window (never driver-checked) ---
        "label_propagation": _q_label_propagation,
        "kcore_peel": _q_kcore,
        "cosine_text_join": _q_cosine_text_join,
        "zorder_buckets": _q_zorder_buckets,
        "gc_densify": _q_gc_densify,
        "kmeans_cells": _q_kmeans_cells,
        "geary_c_cells": _q_geary_c,
        "hexbin_counts": _q_hexbin_counts,
        "clark_evans_nn": _q_clark_evans,
        "k_anonymity_levels": _q_k_anonymity,
        "spatial_entropy_types": _q_spatial_entropy,
        "cotravel_pairs": _q_cotravel_pairs,
        "cocitation_hosts": _q_cocitation_hosts,
        "kneser_ney_bigrams": _q_kneser_ney,
        "benford_digits": _q_benford_digits,
        "skyline_spenders": _q_skyline_spenders,
        "kde_points": _q_kde_points,
        "gravity_residuals": _q_gravity_residuals,
        "rolling_distinct_users": _q_rolling_distinct_users,
        "event_path_trigrams": _q_event_path_trigrams,
        "cell_density_change": _q_cell_density_change,
        "lisa_local_moran": _q_lisa_local_moran,
        "std_dev_ellipse": _q_std_dev_ellipse,
        "mann_kendall_cells": _q_mann_kendall_cells,
        "knox_spacetime": _q_knox_spacetime,
        "adamic_adar_links": _q_adamic_adar,
        "acf_daily_counts": _q_acf_daily,
        "dtw_daily_counts": _q_dtw_daily_counts,
        "frechet_traj_pairs": _q_frechet_pairs,
        "bearing_circular_stats": _q_bearing_circular_stats,
        "join_count_stats": _q_join_count_stats,
        "hex_kring_smooth": _q_hex_kring_smooth,
        "hex_flow_directions": _q_hex_flow_dir,
        "sitemap_urls": _q_sitemap_urls,
        "weekday_chisq": _q_weekday_chisq,
        "lcss_traj_pairs": _q_lcss_pairs,
        "kendall_tau_types": _q_kendall_tau,
        "ppr_seed_host": _q_ppr_seed,
        "hex_flow_accumulation": _q_hex_flow_acc,
        "edr_traj_pairs": _q_edr_pairs,
        "closeness_seeds": _q_closeness_seeds,
        "dirichlet_ql_topk": _q_dirichlet_ql,
        "kmv_distinct_langs": _q_kmv_distinct,
        "importance_resample": _q_importance_resample,
        "ngram_novelty": _q_ngram_novelty,
        "quadrat_vmr": _q_quadrat_vmr,
        "ktruss_edges": _q_ktruss,
        "graph_mixing_stats": _q_graph_mixing,
        "polyline_encode": _q_polyline_encode,
        "huff_market_share": _q_huff_shares,
        "theil_index_cells": _q_theil_cells,
        "seasonal_naive_mase": _q_seasonal_mase,
        "snapshot_retention_plan": _q_snapshot_retention,
        "semivariogram_bins": _q_semivariogram,
        "nn_gfunction": _q_nn_gfunction,
        "neighbor_jaccard_links": _q_neighbor_jaccard,
        "bib_coupling_hosts": _q_bib_coupling,
        "recrawl_priority": _q_recrawl_priority,
        "erp_traj_pairs": _q_erp_pairs,
        "holt_winters_daily": _q_holt_winters,
        "ams_f2_tokens": _q_ams_f2,
        "weighted_sample_aes": _q_weighted_sample,
        "ab_conversion_ztest": _q_ab_ztest,
        "cross_k_function": _q_cross_k,
        "emerging_hotspots": _q_emerging_hotspots,
        "containment_pairs": _q_containment_pairs,
        "textrank_keywords": _q_textrank,
        "zonal_stats": _q_zonal_stats,
        "katz_centrality": _q_katz,
        "streaming_sessions": _q_streaming_sessions,
        "st_dbscan_clusters": _q_st_dbscan,
        "cell_term_affinity": _q_cell_term_affinity,
        # --- rows-only driver check (no SQL form for data-dependent DP
        # --- recursion; value-level correctness lives in the property tests)
        "trajectory_simplify": _q_trajectory_simplify,
        # --- previously driver-green (rounds 1-3); value-checked locally
        # --- via tools/oracle_check.py each round ---
        "adaptive_density_tiles": _q_adaptive_density,
        "sequence_packing": _q_sequence_packing,
        "pii_scrub_stats": _q_pii_scrub_stats,
        "bloom_delta_gate": _q_bloom_delta_gate,
        "ngram_contamination": _q_ngram_contamination,
        "quality_classifier": _q_quality_classifier,
        "domain_pagerank": _q_domain_pagerank,
        "spatial_components": _q_spatial_components,
        "doc_length_quantiles": _q_doc_length_quantiles,
        "streaming_bloom_gate": _q_streaming_bloom_gate,
        "dup_span_coverage": _q_dup_span_coverage,
        "tfidf_top_terms": _q_tfidf_top_terms,
        "route_proximity": _q_route_proximity,
        "cell_pyramid": _q_cell_pyramid,
        "geofence_transitions": _q_geofence_transitions,
        "stay_points": _q_stay_points,
        "data_mix_sample": _q_data_mix_sample,
        "snapshot_diff": _q_snapshot_diff,
        "cell_hotspots": _q_cell_hotspots,
        "streaming_geofence": _q_streaming_geofence,
        "cms_token_freq": _q_cms_token_freq,
        "hll_distinct": _q_hll_distinct,
        "bloom_semi_join": _q_bloom_semi_join,
        "webmercator_tiles": _q_webmercator_tiles,
        "geohash_counts": _q_geohash_counts,
        "media_real_decode": _q_media_real_decode,
        "media_audio_decode": _q_media_audio_decode,
        "media_video_decode": _q_media_video_decode,
        "warc_extract_pages": _q_warc_extract_pages,
        "media_features": _q_media_features,
        "trajectory_hausdorff": _q_trajectory_hausdorff,
        "trajectory_profiles": _q_trajectory_profiles,
        "dbscan_clusters": _q_dbscan_clusters,
        "nearest_city_classify": _q_nearest_city,
        "trajectory_bearings": _q_trajectory_bearings,
        "gc_midpoints": _q_gc_midpoints,
        "geo_language_mix": _q_geo_language_mix,
        "url_canonical_dedup": _q_url_canonical_dedup,
        "host_link_graph": _q_host_link_graph,
        "robots_url_gate": _q_robots_url_gate,
        "char_entropy_stats": _q_char_entropy,
        "zipf_top_tokens": _q_zipf_top_tokens,
        "spatiotemporal_rollup": _q_spatiotemporal_rollup,
        "asof_profile_join": _q_asof_profile_join,
        "gc_destination": _q_gc_destination,
        "interval_window_join": _q_interval_window_join,
        "hits_scores": _q_hits_scores,
        "jaccard_similarity_join": _q_jaccard_similarity_join,
        "cell_top_events": _q_cell_top_events,
        "unigram_logprob": _q_unigram_logprob,
        "pip_join": _q_pip_join,
        "pip_histogram": _q_pip_histogram,
        "pip_anti_join": _q_pip_anti,
        "pip_semi_join": _q_pip_semi,
        "knn_join": _q_knn,
        "knn_join_df": _q_knn_join_df,
        "distance_join_pairs": _q_distance_join,
        "polygon_overlap_relations": _q_polygon_overlap,
        "polygon_boolean_areas": _q_polygon_boolean,
        "cell_counts_l5": _q_cell_counts,
        "cell_token_roundtrip": _q_cell_roundtrip,
        "cell_center_latlng": _q_cell_center,
        "cell_neighbors_l8": _q_cell_neighbors,
        "cellunion_denormalize": _q_cellunion_denormalize,
        "rasterize_centers_l8": _q_rasterize_centers,
        "raster_vector_roundtrip": _q_raster_vector_roundtrip,
        "haversine_distance": _q_haversine,
        "rect_contains_wrap": _q_rect,
        "cap_contains": _q_cap,
        "edge_distance": _q_edge_distance,
        "edge_interpolate": _q_edge_interpolate,
        "nation_bounding_rects": _q_nation_rects,
        "minhash_dedup_groups": _q_minhash_groups,
        "geoparse_multi": _q_geoparse_multi,
        "dedup_exact": _q_dedup_exact,
        "streaming_first_seen_dedup": _q_streaming_dedup,
        "streaming_tile_counts": _q_streaming_tile_counts,
        "text_stats": _q_text_stats,
        "embedding_knn": _q_embedding_knn,
        "top_events_per_user": _q_top_events,
        "word_jaccard_adjacent": _q_word_jaccard,
        "trigram_jaccard_adjacent": _q_trigram_jaccard,
        "lang_id_counts": _q_lang_id,
        "text_quality_features": _q_text_quality,
        "embedding_topk_multi": _q_embedding_topk,
        "simhash_signatures": _q_simhash,
        "simhash_candidate_pairs": _q_simhash_candidates,
        "fingerprint_sizes": _q_fingerprints,
        "embedding_near_dup": _q_embedding_near_dup,
        "embedding_ann_lsh": _q_embedding_ann_lsh,
        "embedding_ann_ivf": _q_embedding_ann_ivf,
        "bpe_token_counts": _q_bpe_token_counts,
        "html_text_roundtrip": _q_html_roundtrip,
        "line_dedup_stats": _q_line_dedup_stats,
        "repetition_filters": _q_repetition_filters,
        "domain_stats": _q_domain_stats,
        "session_stats": _q_session_stats,
        "domain_cap_sample": _q_domain_cap_sample,
        "trajectory_lengths": _q_trajectory_lengths,
        "spearman_daily": _q_spearman_daily,
        "ks_value_drift": _q_ks_value_drift,
        "seasonal_decompose": _q_seasonal_decompose,
        "grubbs_outliers": _q_grubbs_outliers,
        "page_hinkley_drift": _q_page_hinkley,
        "gap_fill_daily": _q_gap_fill_daily,
        "nation_diameter": _q_nation_diameter,
        "pair_correlation_rings": _q_pair_correlation,
        "traj_effective_area": _q_effective_area,
        "cross_track_route": _q_cross_track,
        "closest_pair_cells": _q_closest_pair_cells,
        "eb_rate_cells": _q_eb_rate_cells,
        "kriging_targets": _q_kriging_targets,
        "lag_ols_cells": _q_lag_ols_cells,
        "mw_value_shift": _q_mw_value_shift,
        "kruskal_wallis_weekday": _q_kruskal_weekday,
        "cvm_value_drift": _q_cvm_value_drift,
        "km_second_event": _q_km_second_event,
        "radius_of_gyration": _q_radius_of_gyration,
        "jump_length_hist": _q_jump_length_hist,
        "location_entropy": _q_location_entropy,
        "path_crossings": _q_path_crossings,
        "self_intersections": _q_self_intersections,
        "terrain_stats": _q_terrain_stats,
        "sax_daily_words": _q_sax_daily,
        "eigenvector_centrality": _q_eigenvector_centrality,
        "lexical_richness": _q_lexical_richness,
        "js_divergence_langs": _q_js_divergence,
        "hhi_cells": _q_hhi_cells,
        "rfm_segments": _q_rfm_segments,
        "event_skipgrams": _q_event_skipgrams,
        "winsorized_values": _q_winsorized_values,
        "triad_census": _q_triad_census,
        "weighted_jaccard_hosts": _q_weighted_jaccard_hosts,
        "gumbel_weekly_maxima": _q_gumbel_weekly_maxima,
        "component_size_dist": _q_component_size_dist,
        "markov_entropy_rate": _q_markov_entropy_rate,
        "sprt_conversion": _q_sprt_conversion,
        "chapman_overlap": _q_chapman_overlap,
        "good_turing_counts": _q_good_turing,
        "idw_loo_cv": _q_idw_loo_cv,
        "hopkins_statistic": _q_hopkins_statistic,
        "fdr_hotspots": _q_fdr_hotspots,
        "fightin_words": _q_fightin_words,
        "log_rank_test": _q_log_rank_test,
        "rich_club_coefficient": _q_rich_club,
        "dunning_g2_bigrams": _q_dunning_g2,
        "bootstrap_mean_ci": _q_bootstrap_mean_ci,
        "jackknife_nation_mean": _q_jackknife_nation_mean,
        "zipf_slope_fit": _q_zipf_slope_fit,
        "anova_values": _q_anova_values,
        "levene_test": _q_levene_test,
        "runs_test": _q_runs_test,
        "durbin_watson": _q_durbin_watson,
        "quadkey_pyramid": _q_quadkey_pyramid,
        "directional_variogram": _q_directional_variogram,
        "rate_limit_windows": _q_rate_limit_windows,
        "modularity_by_group": _q_modularity_by_group,
        "gpd_tail_fit": _q_gpd_tail_fit,
        "grid_percolation": _q_grid_percolation,
        "ndcg_bm25": _q_ndcg_bm25,
        "streaming_window_distinct": _q_streaming_window_distinct,
        "brier_quality": _q_brier_quality,
        "moran_correlogram": _q_moran_correlogram,
        "bivariate_moran": _q_bivariate_moran,
        "utm_coordinates": _q_utm_coordinates,
        "mgrs_squares": _q_mgrs_squares,
        "geohash_pyramid": _q_geohash_pyramid,
        "degree_assortativity": _q_degree_assortativity,
        "local_clustering": _q_local_clustering,
        "reciprocity_links": _q_reciprocity_links,
        "nn_ffunction": _q_nn_ffunction,
        "general_g": _q_general_g,
        "central_feature": _q_central_feature,
        "welch_ttest": _q_welch_ttest,
        "fisher_exact": _q_fisher_exact,
        "cohens_kappa": _q_cohens_kappa,
        "horn_slope_aspect": _q_horn_slope_aspect,
        "hillshade_grid": _q_hillshade_grid,
        "flow_direction_d8": _q_flow_direction_d8,
        "burrows_delta": _q_burrows_delta,
        "ccf_clicks_views": _q_ccf_clicks_views,
        "hurst_rs": _q_hurst_rs,
        "home_work_cells": _q_home_work_cells,
        "gap_log_histogram": _q_gap_log_histogram,
        "dwell_time_cells": _q_dwell_time_cells,
        "albers_coordinates": _q_albers_coordinates,
        "lcc_coordinates": _q_lcc_coordinates,
        "gc_intersections": _q_gc_intersections,
        "mrr_map_bm25": _q_mrr_map_bm25,
        "pearson_daily_matrix": _q_pearson_daily_matrix,
        "min_enclosing_cap": _q_min_enclosing_cap,
        "embedding_label_outliers": _q_embedding_label_outliers,
        "perplexity_gate": _q_perplexity_gate,
        "token_fertility": _q_token_fertility,
        "token_bucket_gate": _q_token_bucket_gate,
        "trajectory_tortuosity": _q_trajectory_tortuosity,
        "bilinear_elevation": _q_bilinear_elevation,
        "burstiness_memory": _q_burstiness_memory,
        "ransac_trend": _q_ransac_trend,
        "needleman_wunsch": _q_needleman_wunsch,
        "smith_waterman": _q_smith_waterman,
        "bayes_ab": _q_bayes_ab,
        "hod_rayleigh": _q_hod_rayleigh,
        "zonal_overlay": _q_zonal_overlay,
        "viewshed_grid": _q_viewshed_grid,
        "terrain_curvature": _q_terrain_curvature,
        "minhash_fidelity": _q_minhash_fidelity,
        "lsh_recall_audit": _q_lsh_recall_audit,
        "readability_scores": _q_readability_scores,
        "cumulative_incidence": _q_cumulative_incidence,
        "fellegi_sunter": _q_fellegi_sunter,
        "mutual_information": _q_mutual_information,
        "cuped_adjusted": _q_cuped_adjusted,
        "diff_in_diff": _q_diff_in_diff,
        "ipw_ate": _q_ipw_ate,
    }


def _jaccard_oracle_sql(n: int) -> str:
    if n == 1:
        sh = "list_distinct(string_split(trim(text), ' '))"
    else:
        sh = (
            f"CASE WHEN len(string_split(trim(text), ' ')) >= {n} THEN "
            f"list_distinct(list_transform("
            f"generate_series(1, len(string_split(trim(text), ' ')) - {n - 1}), "
            f"i -> array_to_string(list_slice(string_split(trim(text), ' '), i, i + {n - 1}), ' ')))"
            f" ELSE [trim(text)] END"
        )
    return f"""
        WITH sh AS (
          SELECT doc_id, {sh} AS s FROM documents WHERE doc_id < 200
        )
        SELECT a.doc_id AS key_a, b.doc_id AS key_b,
               round(len(list_intersect(a.s, b.s))::DOUBLE
                     / len(list_distinct(list_concat(a.s, b.s))), 9) AS jaccard
        FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
        ORDER BY key_a
    """


def _lang_id_oracle_sql() -> str:
    from gos2_spark.pipeline.text import LANG_PROFILES

    langs = sorted(LANG_PROFILES)
    hit_cols = ", ".join(
        "len(list_intersect(list_distinct(regexp_split_to_array(lower(trim(text)), '[^a-z]+')), "
        + "[" + ", ".join(f"'{w}'" for w in LANG_PROFILES[lang]) + "]"
        + f")) AS h_{lang}"
        for lang in langs
    )
    best = "greatest(" + ", ".join(f"h_{lang}" for lang in langs) + ")"
    case = "CASE WHEN best = 0 THEN 'und' " + " ".join(
        f"WHEN h_{lang} = best THEN '{lang}'" for lang in langs
    ) + " END"
    return f"""
        WITH hits AS (SELECT {hit_cols} FROM documents),
        g AS (SELECT *, {best} AS best FROM hits)
        SELECT {case} AS lang_guess, count(*) AS n
        FROM g GROUP BY 1 ORDER BY 1
    """


def _edge_distance_oracle_sql() -> str:
    """Mirror of kernels.predicates.distance_to_edges for the fixed edge:
    identical float-op order, with the normalized PointCross embedded as
    repr literals computed by the same numpy code path."""
    import numpy as np

    a = np.array(_xyz(*_EDGE_A))
    b = np.array(_xyz(*_EDGE_B))
    acb = np.cross(a + b, b - a)
    acb = acb / np.sqrt(acb @ acb)
    a1, a2, a3 = (repr(float(v)) for v in a)
    b1, b2, b3 = (repr(float(v)) for v in b)
    c1, c2, c3 = (repr(float(v)) for v in acb)
    return f"""
        WITH pts AS ({_CUST_LATLNG_SQL}),
        xyz AS (
          SELECT key,
                 cos(radians(lng)) * cos(radians(lat)) AS x,
                 sin(radians(lng)) * cos(radians(lat)) AS y,
                 sin(radians(lat)) AS z
          FROM pts
        )
        SELECT key, round(CASE WHEN
            ((y * {c3} - z * {c2}) * {a1} + (z * {c1} - x * {c3}) * {a2}
             + (x * {c2} - y * {c1}) * {a3}) > 0
            AND (({c2} * z - {c3} * y) * {b1} + ({c3} * x - {c1} * z) * {b2}
             + ({c1} * y - {c2} * x) * {b3}) > 0
          THEN asin(least(1.0, abs(x * {c1} + y * {c2} + z * {c3})
                          / sqrt({c1} * {c1} + {c2} * {c2} + {c3} * {c3})))
          ELSE 2 * asin(least(1.0, 0.5 * sqrt(least(
            (x - {a1}) * (x - {a1}) + (y - {a2}) * (y - {a2}) + (z - {a3}) * (z - {a3}),
            (x - {b1}) * (x - {b1}) + (y - {b2}) * (y - {b2}) + (z - {b3}) * (z - {b3})))))
          END, 9) AS edge_dist_rad
        FROM xyz ORDER BY key
    """


def _rasterize_oracle_sql(level: int) -> str:
    """Full-grid oracle for center-mode rasterization: enumerate all
    6 * 4^level cells as (face, bi, bj), compute the closed-form center
    st = (2b+1)/2^(level+1) -> quadratic uv -> face xyz, test membership
    with the convex tiles' edge-normal signs, and produce the cell id by
    forward Hilbert encode of the corner leaf + parent-at-level — sharing
    no code path with the engine's inverse-Hilbert decode."""
    from gos2_spark.pipeline.duckdb_oracles import _biased_leaf, _hilbert_rounds

    n = 1 << level
    size = 1 << (30 - level)
    lsb = 1 << (2 * (30 - level))
    half = float(1 << (level + 1))
    unions = []
    for tid in sorted(_TILES):
        conds = " AND ".join(
            f"(({nx!r}) * x + ({ny!r}) * y + ({nz!r}) * z) > 0"
            for nx, ny, nz in _edge_normals(_TILES[tid])
        )
        unions.append(
            f"SELECT '{tid}' AS tile_id, face, i, j FROM gxyz WHERE {conds}"
        )
    rounds, final = _hilbert_rounds("hits", ["tile_id"], "rr")
    return f"""
        WITH g AS (
          SELECT f.range AS face, bi.range AS bi, bj.range AS bj
          FROM range(6) f, range({n}) bi, range({n}) bj
        ),
        gst AS (
          SELECT face, bi, bj,
                 (2 * bi + 1) / {half!r} AS si,
                 (2 * bj + 1) / {half!r} AS ti
          FROM g
        ),
        guv AS (
          SELECT face, bi, bj,
                 CASE WHEN si >= 0.5 THEN (1.0 / 3.0) * (4.0 * si * si - 1.0)
                      ELSE (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - si) * (1.0 - si)) END AS u,
                 CASE WHEN ti >= 0.5 THEN (1.0 / 3.0) * (4.0 * ti * ti - 1.0)
                      ELSE (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - ti) * (1.0 - ti)) END AS v
          FROM gst
        ),
        gxyz AS (
          SELECT face, bi * {size} AS i, bj * {size} AS j,
            CASE face WHEN 0 THEN 1.0 WHEN 1 THEN -u WHEN 2 THEN -u
                      WHEN 3 THEN -1.0 WHEN 4 THEN v ELSE v END AS x,
            CASE face WHEN 0 THEN u WHEN 1 THEN 1.0 WHEN 2 THEN -v
                      WHEN 3 THEN -v WHEN 4 THEN -1.0 ELSE u END AS y,
            CASE face WHEN 0 THEN v WHEN 1 THEN v WHEN 2 THEN 1.0
                      WHEN 3 THEN -u WHEN 4 THEN -u ELSE -1.0 END AS z
          FROM guv
        ),
        hits AS ({" UNION ALL ".join(unions)}),
        {rounds}
        SELECT tile_id,
               (({_biased_leaf("n")} & -{lsb}) | {lsb}) AS cell_id
        FROM {final} ORDER BY tile_id, cell_id
    """


def _raster_roundtrip_oracle_sql(level: int = 7, block: int = 48) -> str:
    """Full-grid oracle for exact intersect-mode rasterization + the
    raster->vector area round-trip, per convex fixture tile:

    - corners of every level-``level`` cell from the closed-form
      st -> quadratic uv -> face xyz (no engine code path),
    - INTERIOR == all 4 corners inside the tile (convex tile + geodesic
      cell edges: corners inside => edges inside => the tile boundary
      cannot enter the cell),
    - INTERSECTS == any corner inside OR any tile vertex inside the
      cell's (face, s, t) box OR any (cell edge x tile edge)
      SimpleCrossing (sign ladder, edgeutil.go:22-45), crossing tests
      pruned to cells near the tile's bounding cap,
    - the "block" = first ``block`` interior cells in cell-id order
      (forward Hilbert encode in SQL, shared _hilbert_rounds machinery),
      whose vectorized-polygon area the engine computes from the merged
      boundary loop; the oracle uses area additivity: the union of
      disjoint cells' area == the sum of per-cell areas (two l'Huilier
      triangles per cell).
    """
    import numpy as np

    from gos2_spark.kernels import projection as PJ
    from gos2_spark.pipeline.duckdb_oracles import _biased_leaf, _hilbert_rounds

    n = 1 << level
    size = 1 << (30 - level)
    lsb = 1 << (2 * (30 - level))
    nd = float(n)

    def fxyz(u: str, v: str, axis: int) -> str:
        """face_uv_to_xyz axis component (unnormalized; every test below
        is scale-invariant)."""
        table = [
            ["1.0", f"-({u})", f"-({u})", "-1.0", v, v],          # x
            [u, "1.0", f"-({v})", f"-({v})", "-1.0", u],          # y
            [v, v, "1.0", f"-({u})", f"-({u})", "-1.0"],          # z
        ][axis]
        return (
            "CASE face WHEN 0 THEN " + table[0]
            + " WHEN 1 THEN " + table[1] + " WHEN 2 THEN " + table[2]
            + " WHEN 3 THEN " + table[3] + " WHEN 4 THEN " + table[4]
            + " ELSE " + table[5] + " END"
        )

    def q(s: str) -> str:
        return (
            f"CASE WHEN {s} >= 0.5 THEN (1.0 / 3.0) * (4.0 * {s} * {s} - 1.0)"
            f" ELSE (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - {s}) * (1.0 - {s})) END"
        )

    def ang(p: str, r: str) -> str:
        """angle(p, r) = atan2(|p x r|, p . r) over column prefixes."""
        return (
            f"atan2(sqrt(power({p}y * {r}z - {p}z * {r}y, 2)"
            f" + power({p}z * {r}x - {p}x * {r}z, 2)"
            f" + power({p}x * {r}y - {p}y * {r}x, 2)),"
            f" {p}x * {r}x + {p}y * {r}y + {p}z * {r}z)"
        )

    def tri(a: str, b: str, c: str, tag: str) -> tuple[str, str]:
        """l'Huilier triangle area; returns (helper cols, area expr)."""
        cols = (
            f"{ang(a, b)} AS d1{tag}, {ang(b, c)} AS d2{tag},"
            f" {ang(c, a)} AS d3{tag},"
            f" 0.5 * ({ang(a, b)} + {ang(b, c)} + {ang(c, a)}) AS s{tag}"
        )
        area = (
            f"4 * atan(sqrt(greatest(0.0, tan(0.5 * s{tag})"
            f" * tan(0.5 * (s{tag} - d1{tag})) * tan(0.5 * (s{tag} - d2{tag}))"
            f" * tan(0.5 * (s{tag} - d3{tag})))))"
        )
        return cols, area

    corners = ["c00", "c10", "c11", "c01"]
    corner_uv = {"c00": ("ulo", "vlo"), "c10": ("uhi", "vlo"),
                 "c11": ("uhi", "vhi"), "c01": ("ulo", "vhi")}
    corner_cols = ", ".join(
        f"{fxyz(u, v, 0)} AS {cn}x, {fxyz(u, v, 1)} AS {cn}y,"
        f" {fxyz(u, v, 2)} AS {cn}z"
        for cn, (u, v) in corner_uv.items()
    )
    # cell edge normals (ci x cj) for the 4 CCW boundary edges
    edge_pairs = list(zip(corners, corners[1:] + corners[:1]))
    enorm_cols = ", ".join(
        f"{a}y * {b}z - {a}z * {b}y AS e{k}x,"
        f" {a}z * {b}x - {a}x * {b}z AS e{k}y,"
        f" {a}x * {b}y - {a}y * {b}x AS e{k}z"
        for k, (a, b) in enumerate(edge_pairs)
    )
    t1c, t1a = tri("c00", "c10", "c11", "_t1")
    t2c, t2a = tri("c00", "c11", "c01", "_t2")

    # ---- per-tile literal data -------------------------------------------
    tiles = {}
    for tid in sorted(_TILES):
        verts = [_xyz(la, ln) for la, ln in _TILES[tid]]
        V = np.array(verts)
        ctr = V.sum(axis=0)
        ctr = ctr / np.linalg.norm(ctr)
        max_ang = max(
            float(np.arctan2(np.linalg.norm(np.cross(ctr, v)), ctr @ v))
            for v in V
        )
        f_v = PJ.face_from_xyz(V[:, 0], V[:, 1], V[:, 2])
        u_v, v_v = PJ.valid_face_xyz_to_uv(f_v, V[:, 0], V[:, 1], V[:, 2])
        s_v, t_v = PJ.uv_to_st(u_v), PJ.uv_to_st(v_v)
        tiles[tid] = {
            "normals": _edge_normals(_TILES[tid]),
            "verts": verts,
            "vfst": list(zip(f_v.tolist(), s_v.tolist(), t_v.tolist())),
            "ctr": tuple(float(x) for x in ctr),
            "prune_ang": max_ang + 0.05,  # +margin >> level-7 cell diag
        }

    def inside(cn: str, tid: str) -> str:
        return " AND ".join(
            f"(({nx!r}) * {cn}x + ({ny!r}) * {cn}y + ({nz!r}) * {cn}z) > 0"
            for nx, ny, nz in tiles[tid]["normals"]
        )

    def vert_in_cell(tid: str) -> str:
        return " OR ".join(
            f"({int(fv)} = face AND ({sv!r}) >= slo AND ({sv!r}) <= shi"
            f" AND ({tv!r}) >= tlo AND ({tv!r}) <= thi)"
            for fv, sv, tv in tiles[tid]["vfst"]
        )

    def crossing(tid: str) -> str:
        conds = []
        T = tiles[tid]
        nvt = len(T["verts"])
        for k in range(len(edge_pairs)):
            ax, ay, az = f"e{k}x", f"e{k}y", f"e{k}z"
            a0, a1 = edge_pairs[k]
            for m in range(nvt):
                b0 = T["verts"][m]
                b1 = T["verts"][(m + 1) % nvt]
                bn = T["normals"][m]
                acb = (
                    f"(-({ax} * ({b0[0]!r}) + {ay} * ({b0[1]!r})"
                    f" + {az} * ({b0[2]!r})))"
                )
                bda = (
                    f"({ax} * ({b1[0]!r}) + {ay} * ({b1[1]!r})"
                    f" + {az} * ({b1[2]!r}))"
                )
                cbd = (
                    f"(-(({bn[0]!r}) * {a1}x + ({bn[1]!r}) * {a1}y"
                    f" + ({bn[2]!r}) * {a1}z))"
                )
                dac = (
                    f"(({bn[0]!r}) * {a0}x + ({bn[1]!r}) * {a0}y"
                    f" + ({bn[2]!r}) * {a0}z)"
                )
                conds.append(
                    f"({acb} * {bda} > 0 AND {acb} * {cbd} > 0"
                    f" AND {acb} * {dac} > 0)"
                )
        return " OR ".join(conds)

    cls_ctes = []
    stats_sel = []
    inter_sel = []
    for tid in sorted(_TILES):
        T = tiles[tid]
        cx, cy, cz = T["ctr"]
        prune = (
            f"{ang('c00', 'ctr_')} <= {T['prune_ang']!r}".replace(
                "ctr_x", repr(cx)).replace("ctr_y", repr(cy)).replace(
                "ctr_z", repr(cz))
        )
        n_in = " + ".join(
            f"(CASE WHEN {inside(cn, tid)} THEN 1 ELSE 0 END)"
            for cn in corners
        )
        cls_ctes.append(f"""
        cls_{tid} AS (
          SELECT face, i, j, area,
                 (n_in = 4) AS interior,
                 (n_in >= 1 OR ({vert_in_cell(tid)})
                  OR (n_in = 0 AND {prune} AND ({crossing(tid)}))) AS isect
          FROM (SELECT *, {n_in} AS n_in FROM c)
        )""")
        stats_sel.append(
            f"SELECT '{tid}' AS tile_id,"
            f" count(*) FILTER (isect) AS n_cells,"
            f" count(*) FILTER (interior) AS n_interior FROM cls_{tid}"
        )
        inter_sel.append(
            f"SELECT '{tid}' AS tile_id, face, i, j, area"
            f" FROM cls_{tid} WHERE interior"
        )
    rounds, final = _hilbert_rounds("inter", ["tile_id", "area"], "hr")
    return f"""
        WITH g AS (
          SELECT f.range AS face, bi.range AS bi, bj.range AS bj
          FROM range(6) f, range({n}) bi, range({n}) bj
        ),
        cb AS (
          SELECT face, bi, bj,
                 bi / {nd!r} AS slo, (bi + 1) / {nd!r} AS shi,
                 bj / {nd!r} AS tlo, (bj + 1) / {nd!r} AS thi
          FROM g
        ),
        cuv AS (
          SELECT *, {q('slo')} AS ulo, {q('shi')} AS uhi,
                 {q('tlo')} AS vlo, {q('thi')} AS vhi
          FROM cb
        ),
        cc AS (
          SELECT face, bi * {size} AS i, bj * {size} AS j,
                 slo, shi, tlo, thi, {corner_cols}
          FROM cuv
        ),
        ce AS (SELECT *, {enorm_cols} FROM cc),
        ct AS (SELECT *, {t1c}, {t2c} FROM ce),
        c AS (SELECT *, {t1a} + {t2a} AS area FROM ct),
        {",".join(cls_ctes)},
        stats AS ({" UNION ALL ".join(stats_sel)}),
        inter AS ({" UNION ALL ".join(inter_sel)}),
        {rounds},
        blk AS (
          SELECT tile_id, area,
                 row_number() OVER (
                   PARTITION BY tile_id
                   ORDER BY (({_biased_leaf("n")} & -{lsb}) | {lsb})
                 ) AS rk
          FROM {final}
        ),
        blkagg AS (
          SELECT tile_id, CAST(count(*) AS INT) AS block_n_cells,
                 sum(area) AS block_area
          FROM blk WHERE rk <= {block} GROUP BY tile_id
        )
        SELECT s.tile_id, CAST(s.n_cells AS INT) AS n_cells,
               CAST(s.n_interior AS INT) AS n_interior,
               b.block_n_cells, round(b.block_area, 9) AS block_area_sr
        FROM stats s JOIN blkagg b ON b.tile_id = s.tile_id
        ORDER BY s.tile_id
    """


# Loop.regular args for the two boolean-op fixture polygons (shared
# between the engine query and the oracle builder, like _OVERLAP_*).
_BOOL_A = (10.0, 20.0, 8.0, 24)
_BOOL_B = (14.0, 26.0, 8.0, 24)


def _polygon_boolean_oracle_sql() -> str:
    """Independent SQL derivation of the boolean-op metrics for the two
    convex fixture polygons (both centers lie inside the other loop, so
    the intersection is nonempty and each boundary crosses exactly twice).

    The engine clips boundaries with the full builder pipeline
    (polygon.go:658-735) and integrates each result loop's area directly
    (loop.go:303-311). The oracle instead:

    - classifies original vertices with convex edge-normal sign tests,
    - detects the crossing edge pairs with the SimpleCrossing sign ladder
      and computes their intersection points with the engine's
      GetIntersection float recipe (edgeutil.go:356-369: normalize the
      PointCross of each edge, cross+normalize, orient by the endpoint
      sum) in SQL,
    - counts result vertices set-theoretically: |A cap B| = A-in-B +
      B-in-A + crossings; |A u B| = A-out-B + B-out-A + crossings;
      |A - B| = A-out-B + B-in-A + crossings,
    - computes area(A cap B) with an azimuth-ordered l'Huilier fan around
      a shared interior point (the normalized midpoint of the two
      centers; intersection of convex sets is convex, so azimuth order IS
      boundary order), and derives the others by additivity:
      area(A u B) = area(A) + area(B) - area(A cap B),
      area(A - B) = area(A) - area(A cap B).
    """
    import numpy as np

    from gos2_spark.geometry import Loop

    la = Loop.regular(*_BOOL_A)
    lb = Loop.regular(*_BOOL_B)
    c = np.array(_xyz(0.5 * (_BOOL_A[0] + _BOOL_B[0]),
                      0.5 * (_BOOL_A[1] + _BOOL_B[1])))
    c = c / np.linalg.norm(c)
    e1 = np.cross([0.0, 0.0, 1.0], c)
    e1 = e1 / np.linalg.norm(e1)
    e2 = np.cross(c, e1)
    cx, cy, cz = (repr(float(v)) for v in c)
    e1x, e1y, e1z = (repr(float(v)) for v in e1)
    e2x, e2y, e2z = (repr(float(v)) for v in e2)

    def vrows(loop):
        return ", ".join(
            f"({vi}, CAST({x!r} AS DOUBLE), CAST({y!r} AS DOUBLE),"
            f" CAST({z!r} AS DOUBLE))"
            for vi, (x, y, z) in enumerate(loop.vertices)
        )

    def edges(src):
        return f"""
          SELECT vi, x, y, z,
                 coalesce(lead(x) OVER w, first_value(x) OVER w) AS x2,
                 coalesce(lead(y) OVER w, first_value(y) OVER w) AS y2,
                 coalesce(lead(z) OVER w, first_value(z) OVER w) AS z2
          FROM {src}
          WINDOW w AS (ORDER BY vi ROWS BETWEEN UNBOUNDED PRECEDING
                       AND UNBOUNDED FOLLOWING)
        """

    # plain edge normals (crossing detection + convex containment)
    def normals(src):
        return f"""
          SELECT *, y * z2 - z * y2 AS nx, z * x2 - x * z2 AS ny,
                 x * y2 - y * x2 AS nz,
                 -- engine GetIntersection edge normal: normalized
                 -- PointCross = ((v0+v1) x (v1-v0)) / |.|
                 (y + y2) * (z2 - z) - (z + z2) * (y2 - y) AS pcx,
                 (z + z2) * (x2 - x) - (x + x2) * (z2 - z) AS pcy,
                 (x + x2) * (y2 - y) - (y + y2) * (x2 - x) AS pcz
          FROM ({src})
        """

    crossing = """
        (-(a.nx * b.x + a.ny * b.y + a.nz * b.z))
          * (a.nx * b.x2 + a.ny * b.y2 + a.nz * b.z2) > 0
        AND (-(a.nx * b.x + a.ny * b.y + a.nz * b.z))
          * (-(b.nx * a.x2 + b.ny * a.y2 + b.nz * a.z2)) > 0
        AND (-(a.nx * b.x + a.ny * b.y + a.nz * b.z))
          * (b.nx * a.x + b.ny * a.y + b.nz * a.z) > 0
    """

    az = f"atan2(x * {e2x} + y * {e2y} + z * {e2z}, x * {e1x} + y * {e1y} + z * {e1z})"

    def fan_area(src):
        """l'Huilier fan around c over azimuth-ordered vertices of src."""
        return f"""
          SELECT sum(4 * atan(sqrt(greatest(0.0,
                     tan(0.5 * s) * tan(0.5 * (s - d1))
                     * tan(0.5 * (s - d2)) * tan(0.5 * (s - d3))))))
          FROM (
            SELECT 0.5 * (d1 + d2 + d3) AS s, d1, d2, d3
            FROM (
              SELECT
                atan2(sqrt(power({cy} * z - {cz} * y, 2)
                         + power({cz} * x - {cx} * z, 2)
                         + power({cx} * y - {cy} * x, 2)),
                      {cx} * x + {cy} * y + {cz} * z) AS d1,
                atan2(sqrt(power(y * z2 - z * y2, 2)
                         + power(z * x2 - x * z2, 2)
                         + power(x * y2 - y * x2, 2)),
                      x * x2 + y * y2 + z * z2) AS d2,
                atan2(sqrt(power(y2 * {cz} - z2 * {cy}, 2)
                         + power(z2 * {cx} - x2 * {cz}, 2)
                         + power(x2 * {cy} - y2 * {cx}, 2)),
                      x2 * {cx} + y2 * {cy} + z2 * {cz}) AS d3
              FROM (
                SELECT x, y, z,
                       coalesce(lead(x) OVER w, first_value(x) OVER w) AS x2,
                       coalesce(lead(y) OVER w, first_value(y) OVER w) AS y2,
                       coalesce(lead(z) OVER w, first_value(z) OVER w) AS z2
                FROM {src}
                WINDOW w AS (ORDER BY {az}
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND UNBOUNDED FOLLOWING)
              )
            )
          )
        """

    return f"""
        WITH av(vi, x, y, z) AS (VALUES {vrows(la)}),
        bv(vi, x, y, z) AS (VALUES {vrows(lb)}),
        aen AS ({normals(edges('av'))}),
        ben AS ({normals(edges('bv'))}),
        a_cls AS (
          SELECT a.vi, a.x, a.y, a.z,
                 bool_and(b.nx * a.x + b.ny * a.y + b.nz * a.z > 0) AS in_b
          FROM av a, ben b GROUP BY 1, 2, 3, 4
        ),
        b_cls AS (
          SELECT b.vi, b.x, b.y, b.z,
                 bool_and(a.nx * b.x + a.ny * b.y + a.nz * b.z > 0) AS in_a
          FROM bv b, aen a GROUP BY 1, 2, 3, 4
        ),
        xraw AS (
          SELECT
            (a.pcy / a.pcn) * (b.pcz / b.pcn)
              - (a.pcz / a.pcn) * (b.pcy / b.pcn) AS xr_x,
            (a.pcz / a.pcn) * (b.pcx / b.pcn)
              - (a.pcx / a.pcn) * (b.pcz / b.pcn) AS xr_y,
            (a.pcx / a.pcn) * (b.pcy / b.pcn)
              - (a.pcy / a.pcn) * (b.pcx / b.pcn) AS xr_z,
            a.x + a.x2 + b.x + b.x2 AS sx,
            a.y + a.y2 + b.y + b.y2 AS sy,
            a.z + a.z2 + b.z + b.z2 AS sz
          FROM (SELECT *, sqrt(pcx * pcx + pcy * pcy + pcz * pcz) AS pcn
                FROM aen) a,
               (SELECT *, sqrt(pcx * pcx + pcy * pcy + pcz * pcz) AS pcn
                FROM ben) b
          WHERE {crossing}
        ),
        xpt AS (
          SELECT
            CASE WHEN flip THEN -xr_x / xn ELSE xr_x / xn END AS x,
            CASE WHEN flip THEN -xr_y / xn ELSE xr_y / xn END AS y,
            CASE WHEN flip THEN -xr_z / xn ELSE xr_z / xn END AS z
          FROM (
            SELECT *, sqrt(xr_x * xr_x + xr_y * xr_y + xr_z * xr_z) AS xn,
                   (xr_x * sx + xr_y * sy + xr_z * sz) < 0 AS flip
            FROM xraw
          )
        ),
        ivert AS (
          SELECT x, y, z FROM a_cls WHERE in_b
          UNION ALL SELECT x, y, z FROM b_cls WHERE in_a
          UNION ALL SELECT x, y, z FROM xpt
        ),
        counts AS (
          SELECT
            (SELECT count(*) FROM a_cls WHERE in_b) AS a_in,
            (SELECT count(*) FROM a_cls WHERE NOT in_b) AS a_out,
            (SELECT count(*) FROM b_cls WHERE in_a) AS b_in,
            (SELECT count(*) FROM b_cls WHERE NOT in_a) AS b_out,
            (SELECT count(*) FROM xpt) AS n_x
        ),
        areas AS (
          SELECT ({fan_area('ivert')}) AS area_i,
                 ({fan_area('(SELECT x, y, z FROM av)')}) AS area_a,
                 ({fan_area('(SELECT x, y, z FROM bv)')}) AS area_b
        )
        SELECT op, 1 AS n_loops, CAST(n_vertices AS INT) AS n_vertices,
               round(area_sr, 9) AS area_sr
        FROM (
          SELECT 'a_intersect_b' AS op, c.a_in + c.b_in + c.n_x AS n_vertices,
                 r.area_i AS area_sr
          FROM counts c, areas r
          UNION ALL
          SELECT 'a_minus_b', c.a_out + c.b_in + c.n_x,
                 r.area_a - r.area_i
          FROM counts c, areas r
          UNION ALL
          SELECT 'a_union_b', c.a_out + c.b_out + c.n_x,
                 r.area_a + r.area_b - r.area_i
          FROM counts c, areas r
        )
        ORDER BY op
    """


def _polygon_overlap_oracle_sql() -> str:
    """Independent relation derivation for the convex overlap fixtures.

    The engine decides {contains, within, overlaps} with the full loop
    relation machinery (robust predicates + wedge processing). For CONVEX
    loops the relations are equivalent to vertex-containment + proper
    edge-crossing counts: B inside A iff every B vertex passes all of A's
    edge-normal sign tests and no edges cross (a convex region contains
    the geodesic between interior points, so an inside-inside edge cannot
    exit); nonempty intersection iff some vertex is contained or some
    edge pair crosses. The SQL computes edge normals (lead() with wrap),
    containment counts, and the SimpleCrossing sign ladder
    (edgeutil.go:22-45: acb*bda > 0 AND acb*cbd > 0 AND acb*dac > 0) from
    the fixtures' float64 vertex literals."""
    def vrows(spec):
        rows = []
        for tid, loop in sorted(_overlap_loops(spec).items()):
            for vi, (x, y, z) in enumerate(loop.vertices):
                # bare decimal literals parse as DECIMAL (scale overflow
                # in the cross products) — force DOUBLE:
                rows.append(
                    f"('{tid}', {vi}, CAST({x!r} AS DOUBLE),"
                    f" CAST({y!r} AS DOUBLE), CAST({z!r} AS DOUBLE))"
                )
        return ", ".join(rows)

    def edges(src):
        return f"""
          SELECT tid, vi, x, y, z,
                 coalesce(lead(x) OVER w, first_value(x) OVER w) AS x2,
                 coalesce(lead(y) OVER w, first_value(y) OVER w) AS y2,
                 coalesce(lead(z) OVER w, first_value(z) OVER w) AS z2
          FROM {src}
          WINDOW w AS (PARTITION BY tid ORDER BY vi
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND UNBOUNDED FOLLOWING)
        """

    crossing = """
        (-(a.nx * b.x + a.ny * b.y + a.nz * b.z))
          * (a.nx * b.x2 + a.ny * b.y2 + a.nz * b.z2) > 0
        AND (-(a.nx * b.x + a.ny * b.y + a.nz * b.z))
          * (-(b.nx * a.x2 + b.ny * a.y2 + b.nz * a.z2)) > 0
        AND (-(a.nx * b.x + a.ny * b.y + a.nz * b.z))
          * (b.nx * a.x + b.ny * a.y + b.nz * a.z) > 0
    """
    return f"""
        WITH av(tid, vi, x, y, z) AS (VALUES {vrows(_OVERLAP_A)}),
        bv(tid, vi, x, y, z) AS (VALUES {vrows(_OVERLAP_B)}),
        ae AS ({edges('av')}),
        be AS ({edges('bv')}),
        aen AS (
          SELECT *, y * z2 - z * y2 AS nx, z * x2 - x * z2 AS ny,
                 x * y2 - y * x2 AS nz
          FROM ae
        ),
        ben AS (
          SELECT *, y * z2 - z * y2 AS nx, z * x2 - x * z2 AS ny,
                 x * y2 - y * x2 AS nz
          FROM be
        ),
        b_in_a AS (
          SELECT a_tid, b_tid,
                 count(*) FILTER (inside) AS n_in, count(*) AS n_tot
          FROM (
            SELECT a.tid AS a_tid, b.tid AS b_tid, b.vi,
                   bool_and(a.nx * b.x + a.ny * b.y + a.nz * b.z > 0) AS inside
            FROM aen a, bv b GROUP BY 1, 2, 3
          ) GROUP BY 1, 2
        ),
        a_in_b AS (
          SELECT a_tid, b_tid,
                 count(*) FILTER (inside) AS n_in, count(*) AS n_tot
          FROM (
            SELECT a.tid AS a_tid, b.tid AS b_tid, a.vi,
                   bool_and(b.nx * a.x + b.ny * a.y + b.nz * a.z > 0) AS inside
            FROM ben b, av a GROUP BY 1, 2, 3
          ) GROUP BY 1, 2
        ),
        crossings AS (
          SELECT a.tid AS a_tid, b.tid AS b_tid,
                 count(*) FILTER ({crossing}) AS n_x
          FROM aen a, ben b GROUP BY 1, 2
        ),
        rel AS (
          SELECT ba.a_tid, ba.b_tid,
                 CASE
                   WHEN ba.n_in = ba.n_tot AND x.n_x = 0 THEN 'contains'
                   WHEN ab.n_in = ab.n_tot AND x.n_x = 0 THEN 'within'
                   WHEN x.n_x > 0 OR ba.n_in > 0 OR ab.n_in > 0
                     THEN 'overlaps'
                 END AS relation
          FROM b_in_a ba
          JOIN a_in_b ab ON ab.a_tid = ba.a_tid AND ab.b_tid = ba.b_tid
          JOIN crossings x ON x.a_tid = ba.a_tid AND x.b_tid = ba.b_tid
        )
        SELECT a_tid AS a_id, b_tid AS b_id, relation
        FROM rel WHERE relation IS NOT NULL
        ORDER BY a_id, b_id
    """


def _edge_interpolate_oracle_sql() -> str:
    """Slerp re-derivation in DuckDB SQL (edgeutil.go:346-354 formulas)
    from embedded endpoint xyz literals: f = sin(t*ab)/sin(ab),
    e = cos(t*ab) - f*cos(ab), u = normalize(e*a + f*b), plus the
    GetDistanceFraction recovery d0/(d0+d1) — sharing no code with the
    numpy kernel."""
    # CAST: DuckDB parses long plain-decimal literals as DECIMAL, and
    # literal*literal then overflows scale 38 — force DOUBLE arithmetic
    a1, a2, a3 = (f"CAST({v!r} AS DOUBLE)" for v in _xyz(*_IEDGE_A))
    b1, b2, b3 = (f"CAST({v!r} AS DOUBLE)" for v in _xyz(*_IEDGE_B))
    ab = (
        f"atan2(sqrt(({a2}*{b3}-{a3}*{b2})*({a2}*{b3}-{a3}*{b2})"
        f" + ({a3}*{b1}-{a1}*{b3})*({a3}*{b1}-{a1}*{b3})"
        f" + ({a1}*{b2}-{a2}*{b1})*({a1}*{b2}-{a2}*{b1})),"
        f" {a1}*{b1}+{a2}*{b2}+{a3}*{b3})"
    )
    return f"""
        WITH p AS (
          SELECT c_custkey AS key, (c_custkey % 101) / 100.0 AS t FROM customer
        ),
        ang AS (SELECT key, t, {ab} AS ab FROM p),
        ef AS (SELECT key, t, ab, sin(t * ab) / sin(ab) AS f FROM ang),
        e2 AS (SELECT *, cos(t * ab) - f * cos(ab) AS e FROM ef),
        v AS (
          SELECT key, t,
                 e * {a1} + f * {b1} AS x,
                 e * {a2} + f * {b2} AS y,
                 e * {a3} + f * {b3} AS z
          FROM e2
        ),
        u AS (
          SELECT key, t,
                 CASE WHEN t = 0 THEN {a1} WHEN t = 1 THEN {b1}
                      ELSE x / sqrt(x*x + y*y + z*z) END AS ux,
                 CASE WHEN t = 0 THEN {a2} WHEN t = 1 THEN {b2}
                      ELSE y / sqrt(x*x + y*y + z*z) END AS uy,
                 CASE WHEN t = 0 THEN {a3} WHEN t = 1 THEN {b3}
                      ELSE z / sqrt(x*x + y*y + z*z) END AS uz
          FROM v
        ),
        d AS (
          SELECT key, ux, uy, uz,
                 atan2(sqrt((uy*{a3}-uz*{a2})*(uy*{a3}-uz*{a2})
                          + (uz*{a1}-ux*{a3})*(uz*{a1}-ux*{a3})
                          + (ux*{a2}-uy*{a1})*(ux*{a2}-uy*{a1})),
                       ux*{a1} + uy*{a2} + uz*{a3}) AS d0,
                 atan2(sqrt((uy*{b3}-uz*{b2})*(uy*{b3}-uz*{b2})
                          + (uz*{b1}-ux*{b3})*(uz*{b1}-ux*{b3})
                          + (ux*{b2}-uy*{b1})*(ux*{b2}-uy*{b1})),
                       ux*{b1} + uy*{b2} + uz*{b3}) AS d1
          FROM u
        )
        SELECT key,
               round(degrees(atan2(uz, sqrt(ux*ux + uy*uy))), 9) AS ilat,
               round(degrees(atan2(uy, ux)), 9) AS ilng,
               round(d0 / (d0 + d1), 9) AS frac
        FROM d ORDER BY key
    """


_GEOFENCE_ORACLE_SQL = f"""
            WITH pts AS (
              SELECT user_id, ts, event_id,
                     -60.0 + (event_id * 11 % 120) + (event_id % 83) / 83.0
                         AS lat,
                     -170.0 + (event_id * 17 % 340) + (event_id % 79) / 79.0
                         AS lng
              FROM events
            ),
            lab AS (
              SELECT user_id, ts, event_id,
                     CASE
                       WHEN {_tile_pred_sql("t_atl")} THEN 't_atl'
                       WHEN {_tile_pred_sql("t_ind")} THEN 't_ind'
                       WHEN {_tile_pred_sql("t_pac")} THEN 't_pac'
                       ELSE 'none' END AS fence
              FROM pts
            ),
            tr AS (
              SELECT user_id, fence,
                     lag(fence) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id
                     ) AS prev_fence
              FROM lab
            )
            SELECT prev_fence AS from_fence, fence AS to_fence,
                   CAST(count(*) AS BIGINT) AS n_transitions,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM tr
            WHERE prev_fence IS NOT NULL AND prev_fence != fence
            GROUP BY 1, 2 ORDER BY 1, 2
        """


def _hexbin_oracle_sql(size: float = 0.35) -> str:
    from gos2_spark.spark.hexgrid import hex_axial_sql

    return f"""
        WITH pts AS ({_CUST_LATLNG_SQL}),
        h AS ({hex_axial_sql(size)} FROM pts)
        SELECT hq, hr, CAST(count(*) AS BIGINT) AS n
        FROM h GROUP BY 1, 2 ORDER BY hq, hr
    """


def _clark_evans_oracle_sql() -> str:
    # O(n^2) true-NN replay with the identical angle metric, then the same
    # fixed-order R expression (4*pi inlined as the Python double literal
    # the Spark side uses)
    four_pi = repr(4.0 * math.pi)
    dist = _DIST_ANGLE_SQL_TMPL.format(qlat="a.alat", qlng="a.alng")
    return f"""
        WITH pts AS ({_CUST_LATLNG_SQL}),
        a AS (SELECT key, lat AS alat, lng AS alng FROM pts),
        nn AS (
          SELECT a.key, min({dist}) AS nn
          FROM a JOIN pts ON pts.key != a.key
          GROUP BY a.key
        ),
        agg AS (SELECT count(*) AS n, sum(nn) AS s FROM nn)
        SELECT CAST(n AS BIGINT) AS n_points,
               round(s / CAST(n AS DOUBLE), 9) AS mean_nn_rad,
               round(0.5 / sqrt(CAST(n AS DOUBLE) / {four_pi}), 9)
                 AS expected_rad,
               round((s / CAST(n AS DOUBLE))
                     / (0.5 / sqrt(CAST(n AS DOUBLE) / {four_pi})), 9)
                 AS r_index
        FROM agg
    """


def _k_anonymity_oracle_sql(k: int = 10, levels=(0, 2, 4, 6, 8)) -> str:
    anc = " UNION ALL ".join(
        f"SELECT key, CAST({l} AS INTEGER) AS level, "
        f"((cell_id & {-(1 << (2 * (30 - l)))}) | {1 << (2 * (30 - l))}) "
        f"AS cell FROM cells"
        for l in sorted(levels)
    )
    return f"""
        WITH {_cellid_cte_duckdb(_CUST_LATLNG_SQL)},
        anc AS ({anc}),
        counts AS (SELECT level, cell, count(*) AS n FROM anc GROUP BY 1, 2),
        ok AS (
          SELECT anc.key, anc.level FROM anc
          JOIN counts USING (level, cell) WHERE counts.n >= {k}
        ),
        per_point AS (SELECT key, max(level) AS chosen FROM ok GROUP BY key),
        chosen AS (
          SELECT coalesce(per_point.chosen, -1) AS level
          FROM (SELECT DISTINCT key FROM cells) ks
          LEFT JOIN per_point USING (key)
        )
        SELECT CAST(level AS INTEGER) AS level,
               CAST(count(*) AS BIGINT) AS n_points
        FROM chosen GROUP BY level ORDER BY level
    """


def _spatial_entropy_oracle_sql(level: int = 4) -> str:
    lsb = 1 << (2 * (30 - level))
    return f"""
        WITH {_cellid_cte_duckdb(
            f"SELECT event_id AS key, lat, lng FROM ({_EVENTS_LATLNG_SQL})"
        )},
        pc AS (
          SELECT e.event_type AS grp,
                 ((c.cell_id & {-lsb}) | {lsb}) AS cell
          FROM cells c JOIN events e ON e.event_id = c.key
        ),
        per_cell AS (SELECT grp, cell, count(*) AS c FROM pc GROUP BY 1, 2),
        agg AS (
          SELECT grp, count(*) AS n_cells, sum(c) AS n_points,
                 sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS clnc
          FROM per_cell GROUP BY grp
        )
        SELECT grp, CAST(n_cells AS BIGINT) AS n_cells,
               CAST(n_points AS BIGINT) AS n_points,
               round(ln(CAST(n_points AS DOUBLE))
                     - clnc / CAST(n_points AS DOUBLE), 9) AS entropy,
               round(exp(ln(CAST(n_points AS DOUBLE))
                         - clnc / CAST(n_points AS DOUBLE)), 9)
                 AS effective_cells
        FROM agg ORDER BY grp
    """


def _cotravel_oracle_sql(
    level: int = 2, bucket_us: int = 86_400_000_000, min_buckets: int = 2
) -> str:
    lsb = 1 << (2 * (30 - level))
    return f"""
        WITH {_cellid_cte_duckdb(
            f"SELECT event_id AS key, lat, lng FROM ({_EVENTS_LATLNG_SQL}) "
            "WHERE user_id < 200"
        )},
        v AS (
          SELECT DISTINCT e.user_id AS u,
                 ((c.cell_id & {-lsb}) | {lsb}) AS cell,
                 epoch_us(e.ts) // {bucket_us} AS bucket
          FROM cells c JOIN events e ON e.event_id = c.key
          WHERE e.user_id < 200
        )
        SELECT a.u AS user_a, b.u AS user_b,
               CAST(count(DISTINCT a.bucket) AS BIGINT) AS n_buckets,
               CAST(count(DISTINCT a.cell) AS BIGINT) AS n_cells
        FROM v a JOIN v b
          ON a.cell = b.cell AND a.bucket = b.bucket AND a.u < b.u
        GROUP BY 1, 2
        HAVING count(DISTINCT a.bucket) >= {min_buckets}
        ORDER BY user_a, user_b
    """


def oracle_sql() -> dict[str, str]:
    from gos2_spark.pipeline import duckdb_oracles as _DO

    pip_union = " UNION ALL ".join(
        f"SELECT key, '{tid}' AS tile_id FROM pts WHERE {_tile_pred_sql(tid)}"
        for tid in sorted(_TILES)
    )
    knn_union = " UNION ALL ".join(
        f"""
        SELECT '{qid}' AS qid, key,
               CAST(row_number() OVER (ORDER BY {_DIST_ANGLE_SQL_TMPL.format(qlat=qlat, qlng=qlng)}, key) AS INT) AS knn_rank,
               round({_DIST_ANGLE_SQL_TMPL.format(qlat=qlat, qlng=qlng)}, 9) AS dist_rad
        FROM pts QUALIFY knn_rank <= 10
        """
        for qid, qlat, qlng in [("q0", 40.7128, -74.0060), ("q1", -33.8688, 151.2093)]
    )
    return {
        "haversine_distance": f"""
            WITH pts AS ({_CUST_LATLNG_SQL})
            SELECT key, round({_HAVERSINE_SQL}, 9) AS dist_rad
            FROM pts ORDER BY key
        """,
        "rect_contains_wrap": f"""
            WITH pts AS ({_CUST_LATLNG_SQL})
            SELECT key FROM pts
            WHERE lat >= -20.0 AND lat <= 25.0 AND (lng >= 150.0 OR lng <= -150.0)
            ORDER BY key
        """,
        "cap_contains": f"""
            WITH pts AS ({_CUST_LATLNG_SQL})
            SELECT key FROM pts
            WHERE power(cos(radians(lng)) * cos(radians(lat)) - {_xyz(10.0, 20.0)[0]!r}, 2)
                + power(sin(radians(lng)) * cos(radians(lat)) - {_xyz(10.0, 20.0)[1]!r}, 2)
                + power(sin(radians(lat)) - {_xyz(10.0, 20.0)[2]!r}, 2)
                <= 2 * {2 * math.sin(0.5 * math.radians(25.0)) ** 2!r}
            ORDER BY key
        """,
        "pip_join": f"""
            WITH pts AS ({_CUST_LATLNG_SQL})
            SELECT key, tile_id FROM ({pip_union}) ORDER BY key, tile_id
        """,
        "pip_histogram": f"""
            WITH pts AS ({_CUST_LATLNG_SQL})
            SELECT tile_id, count(*) AS n_points FROM ({pip_union})
            GROUP BY tile_id ORDER BY tile_id
        """,
        "pip_anti_join": f"""
            WITH pts AS ({_CUST_LATLNG_SQL})
            SELECT key FROM pts
            WHERE key NOT IN (SELECT key FROM ({pip_union}))
            ORDER BY key
        """,
        "knn_join": f"""
            WITH pts AS ({_CUST_LATLNG_SQL})
            SELECT qid, key, knn_rank, dist_rad FROM ({knn_union})
            ORDER BY qid, knn_rank
        """,
        "knn_join_df": f"""
            WITH pts AS ({_CUST_LATLNG_SQL}),
            q AS (SELECT key AS qid, lat AS qlat, lng AS qlng
                  FROM pts WHERE key < 30),
            d AS (
              SELECT q.qid, p.key,
                     {_DIST_ANGLE_SQL_TMPL.format(qlat='q.qlat', qlng='q.qlng')} AS dist
              FROM q CROSS JOIN pts p
            )
            SELECT qid, key,
                   CAST(row_number() OVER (
                       PARTITION BY qid ORDER BY dist, key) AS INT) AS knn_rank,
                   round(dist, 9) AS dist_rad
            FROM d QUALIFY knn_rank <= 5
            ORDER BY qid, knn_rank
        """,
        "dedup_exact": """
            SELECT min(doc_id) AS keep_id, count(*) AS dup_count
            FROM documents GROUP BY md5(text) ORDER BY keep_id
        """,
        # first-seen streaming dedup keeps exactly one row per key; the
        # kept-key SET (not which duplicate survived) is deterministic and
        # must equal the batch-distinct set:
        "streaming_first_seen_dedup": """
            SELECT DISTINCT md5(text) AS content_key
            FROM documents ORDER BY content_key
        """,
        # windowed streaming tiling: tile membership from the %.6f-rounded
        # geoparsed coordinates, 1-day tumbling windows from the UTC epoch
        # (1704067200 = 2024-01-01T00:00:00Z is day-aligned):
        "streaming_tile_counts": f"""
            WITH pts AS (
              SELECT key,
                     CAST(printf('%.6f', lat) AS DOUBLE) AS lat,
                     CAST(printf('%.6f', lng) AS DOUBLE) AS lng,
                     CAST(1704067200 + (key % 72) * 3600 AS BIGINT) AS ts
              FROM ({_CUST_LATLNG_SQL})
            ),
            m AS ({" UNION ALL ".join(
                f"SELECT ts, '{tid}' AS tile_id FROM pts WHERE {_tile_pred_sql(tid)}"
                for tid in sorted(_TILES)
            )})
            SELECT CAST(ts // 86400 * 86400 AS BIGINT) AS window_epoch,
                   tile_id, count(*) AS n_pages
            FROM m GROUP BY 1, 2 ORDER BY window_epoch, tile_id
        """,
        "text_stats": """
            SELECT lang,
                   count(*) AS n_docs,
                   CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS total_tokens,
                   round(avg(length(text)), 6) AS avg_chars
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "embedding_knn": """
            WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   round(list_sum(list_transform(
                       list_zip(embedding, q_emb),
                       x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), 6) AS score
            FROM embeddings, q WHERE vec_id != 0
            ORDER BY score DESC, vec_id LIMIT 5
        """,
        "top_events_per_user": """
            SELECT user_id, CAST(row_number() OVER (
                       PARTITION BY user_id ORDER BY value DESC, event_id ASC
                   ) AS INT) AS rk, event_id, value
            FROM events
            WHERE user_id < 50
            QUALIFY rk <= 3
            ORDER BY user_id, rk
        """,
        # the oracle asserts the escape -> markup -> extract_text roundtrip
        # is byte-exact for EVERY document (n_roundtrip == n_docs):
        "html_text_roundtrip": """
            SELECT lang, count(*) AS n_docs, count(*) AS n_roundtrip
            FROM documents GROUP BY lang ORDER BY lang
        """,
        # multi-mention geoparse round-trip: the oracle regenerates the
        # %.6f-formatted values the engine's regex must recover:
        "geoparse_multi": f"""
            WITH pts AS ({_CUST_LATLNG_SQL})
            SELECT key, 0 AS idx,
                   CAST(printf('%.6f', lat) AS DOUBLE) AS plat,
                   CAST(printf('%.6f', lng) AS DOUBLE) AS plng
            FROM pts
            UNION ALL
            SELECT key, 1 AS idx,
                   CAST(printf('%.6f', -lat / 2.0) AS DOUBLE) AS plat,
                   CAST(printf('%.6f', -lng / 2.0) AS DOUBLE) AS plng
            FROM pts
            ORDER BY key, idx
        """,
        "bpe_token_counts": r"""
            WITH t AS (
              SELECT lang,
                     len(regexp_extract_all(text,
                         '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_tok
              FROM documents
            )
            SELECT lang, count(*) AS n_docs,
                   CAST(sum(n_tok) AS BIGINT) AS total_bpe_tokens,
                   CAST(max(n_tok) AS BIGINT) AS max_bpe_tokens
            FROM t GROUP BY lang ORDER BY lang
        """,
        "word_jaccard_adjacent": _jaccard_oracle_sql(1),
        "trigram_jaccard_adjacent": _jaccard_oracle_sql(3),
        "lang_id_counts": _lang_id_oracle_sql(),
        "text_quality_features": """
            WITH f AS (
              SELECT lang,
                     length(text)::DOUBLE AS c,
                     len(regexp_split_to_array(trim(text), '\\s+'))::DOUBLE AS tk,
                     length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE AS d,
                     length(regexp_replace(text, '[^A-Z]', '', 'g'))::DOUBLE AS u
              FROM documents
            )
            SELECT lang,
                   round(avg(c / tk), 9) AS avg_chars_per_token,
                   round(avg(d / c), 9) AS avg_digit_ratio,
                   round(avg(u / c), 9) AS avg_upper_ratio
            FROM f GROUP BY lang ORDER BY lang
        """,
        "embedding_topk_multi": """
            WITH q AS (
              SELECT 'q' || vec_id AS qid,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
              FROM embeddings WHERE vec_id IN (0, 1)
            ), scored AS (
              SELECT q.qid, e.vec_id AS key,
                     list_sum(list_transform(list_zip(
                         list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qe),
                         p -> p[1] * p[2]))
                     / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                        * sqrt(list_sum(list_transform(q.qe, x -> x * x)))) AS raw_score
              FROM embeddings e, q WHERE e.vec_id > 1
            )
            SELECT qid, key,
                   CAST(row_number() OVER (PARTITION BY qid ORDER BY raw_score DESC, key ASC) AS INT) AS rank,
                   round(raw_score, 6) AS score
            FROM scored QUALIFY rank <= 10
            ORDER BY qid, rank
        """,
        "pip_semi_join": f"""
            WITH pts AS ({_CUST_LATLNG_SQL})
            SELECT DISTINCT key FROM ({pip_union}) ORDER BY key
        """,
        "edge_distance": _edge_distance_oracle_sql(),
        # Within-radius pair join: O(n^2) cross join with the exact same
        # float-op order as the engine's distance_rad_sql (ax=cos(lng)*
        # cos(lat), cross product, atan2(sqrt, dot)); the radius literal is
        # the Python math.radians repr so both sides compare against the
        # identical double:
        "distance_join_pairs": f"""
            WITH pts AS ({_CUST_LATLNG_SQL}),
            v AS (
              SELECT key,
                     cos(radians(lng)) * cos(radians(lat)) AS x,
                     sin(radians(lng)) * cos(radians(lat)) AS y,
                     sin(radians(lat)) AS z
              FROM pts
            ),
            pairs AS (
              SELECT a.key AS key_a, b.key AS key_b,
                     atan2(sqrt(
                         (a.y * b.z - a.z * b.y) * (a.y * b.z - a.z * b.y)
                       + (a.z * b.x - a.x * b.z) * (a.z * b.x - a.x * b.z)
                       + (a.x * b.y - a.y * b.x) * (a.x * b.y - a.y * b.x)),
                       a.x * b.x + a.y * b.y + a.z * b.z) AS d
              FROM v a JOIN v b ON a.key < b.key
            )
            SELECT key_a, key_b, round(d, 9) AS dist_rad
            FROM pairs WHERE d <= {math.radians(3.0)!r}
            ORDER BY key_a, key_b
        """,
        "embedding_near_dup": """
            WITH ne AS (
              SELECT vec_id AS key,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)
                         / greatest(sqrt(list_sum(list_transform(embedding,
                               y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))), 1e-12)) AS ne
              FROM embeddings
            ), pairs AS (
              SELECT a.key AS key_a, b.key AS key_b,
                     list_sum(list_transform(list_zip(a.ne, b.ne), p -> p[1] * p[2])) AS cosine
              FROM ne a JOIN ne b ON a.key < b.key
            )
            SELECT key_a, key_b, round(cosine, 6) AS cosine
            FROM pairs WHERE cosine >= 0.45
            ORDER BY key_a, key_b
        """,
        # Full S2 Hilbert encode expressed in DuckDB SQL (validated
        # bit-for-bit vs the numpy kernel incl. tokens; see
        # tools/duckdb_cellid_proto.py):
        "cell_counts_l5": f"""
            WITH {_cellid_cte_duckdb(_CUST_LATLNG_SQL)}
            SELECT ((cell_id & -{1 << 50}) | {1 << 50}) AS cell_l5,
                   count(*) AS n
            FROM cells GROUP BY 1 ORDER BY 1
        """,
        "cell_hotspots": _hotspot_oracle_sql(),
        "streaming_geofence": _GEOFENCE_ORACLE_SQL,
        "cms_token_freq": _cms_oracle_sql(4, 2048),
        "hll_distinct": _hll_oracle_sql(12),
        "bloom_semi_join": _bloom_semi_oracle_sql(4096, 3),
        "webmercator_tiles": _webmercator_oracle_sql(5),
        "geohash_counts": _geohash_oracle_sql(4),
        # hash-rank replay via the SQL XXH64 model:
        "data_mix_sample": _mix_oracle_sql(),
        # derivation-from-construction: the engine must EARN these counts
        # via the md5 compare; the oracle knows them from the injection
        # arithmetic (changed iff doc_id % 5 == 0 among survivors):
        "snapshot_diff": """
            WITH d AS (
              SELECT doc_id,
                     CASE
                       WHEN doc_id % 2 = 0 AND doc_id % 7 = 0 THEN 'removed'
                       WHEN doc_id % 2 = 0 AND doc_id % 5 = 0 THEN 'changed'
                       WHEN doc_id % 2 = 0 THEN 'unchanged'
                       WHEN doc_id % 7 != 0 THEN 'added'
                       ELSE NULL END AS status
              FROM documents
            )
            SELECT status,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(doc_id) AS BIGINT) AS key_sum
            FROM d WHERE status IS NOT NULL
            GROUP BY 1 ORDER BY 1
        """,
        "stay_points": f"""
            WITH {_cellid_cte_duckdb('''
              SELECT event_id AS key, lat, lng FROM (
                SELECT event_id, user_id,
                       (row_number() OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) - 1) // 5 AS loc
                FROM events
              ) s, LATERAL (SELECT
                   -60.0 + ((user_id * 37 + loc * 11) % 120)
                         + ((user_id + loc) % 83) / 83.0 AS lat,
                   -170.0 + ((user_id * 53 + loc * 17) % 340)
                          + ((user_id + loc) % 79) / 79.0 AS lng)
            ''')},
            c6 AS (
              SELECT key AS event_id,
                     ((cell_id & -{1 << 48}) | {1 << 48}) AS cell6
              FROM cells
            ),
            lab AS (
              SELECT e.user_id, e.ts, e.event_id, c6.cell6
              FROM events e JOIN c6 USING (event_id)
            ),
            r AS (
              SELECT user_id, cell6,
                     row_number() OVER (
                         PARTITION BY user_id ORDER BY ts, event_id)
                   - row_number() OVER (
                         PARTITION BY user_id, cell6 ORDER BY ts, event_id)
                       AS island
              FROM lab
            ),
            runs AS (
              SELECT user_id, cell6, island, count(*) AS run_len
              FROM r GROUP BY 1, 2, 3 HAVING count(*) >= 3
            )
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_stays,
                   CAST(max(run_len) AS BIGINT) AS longest_stay,
                   CAST(sum(run_len) AS BIGINT) AS stay_events
            FROM runs GROUP BY 1 ORDER BY 1
        """,
        "geofence_transitions": _GEOFENCE_ORACLE_SQL,
        "cell_pyramid": f"""
            WITH {_cellid_cte_duckdb(_CUST_LATLNG_SQL)},
            u AS ({" UNION ALL ".join(
                f"SELECT {l} AS level,"
                f" ((cell_id & -{1 << (2 * (30 - l))})"
                f" | {1 << (2 * (30 - l))}) AS cell FROM cells"
                for l in (2, 3, 4, 5, 6, 7, 8)
            )})
            SELECT CAST(level AS INT) AS level, cell, count(*) AS n
            FROM u GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "cell_token_roundtrip": f"""
            WITH {_cellid_cte_duckdb(_CUST_LATLNG_SQL)}
            SELECT key,
                   rtrim(lower(lpad(to_hex(xor(cell_id,
                       (-9223372036854775807 - 1))), 16, '0')), '0') AS token
            FROM cells ORDER BY key
        """,
        "cell_center_latlng": f"""
            WITH {_cellid_cte_duckdb(_CUST_LATLNG_SQL)},
            st AS (
              SELECT key, face,
                     CAST(2 * i + 1 AS DOUBLE) * {0.5 / (1 << 30)!r} AS si,
                     CAST(2 * j + 1 AS DOUBLE) * {0.5 / (1 << 30)!r} AS ti
              FROM r0
            ),
            cuv AS (
              SELECT key, face,
                     CASE WHEN si >= 0.5 THEN (1.0 / 3.0) * (4.0 * si * si - 1.0)
                          ELSE (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - si) * (1.0 - si)) END AS u,
                     CASE WHEN ti >= 0.5 THEN (1.0 / 3.0) * (4.0 * ti * ti - 1.0)
                          ELSE (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - ti) * (1.0 - ti)) END AS v
              FROM st
            ),
            cxyz AS (
              SELECT key,
                CASE face WHEN 0 THEN 1.0 WHEN 1 THEN -u WHEN 2 THEN -u
                          WHEN 3 THEN -1.0 WHEN 4 THEN v ELSE v END AS x,
                CASE face WHEN 0 THEN u WHEN 1 THEN 1.0 WHEN 2 THEN -v
                          WHEN 3 THEN -v WHEN 4 THEN -1.0 ELSE u END AS y,
                CASE face WHEN 0 THEN v WHEN 1 THEN v WHEN 2 THEN 1.0
                          WHEN 3 THEN -u WHEN 4 THEN -u ELSE -1.0 END AS z
              FROM cuv
            )
            SELECT key,
                   round(degrees(atan2(z, sqrt(x * x + y * y))), 9) AS center_lat,
                   round(degrees(atan2(y, x)), 9) AS center_lng
            FROM cxyz ORDER BY key
        """,
        # xxhash64-based pipeline ops: Spark's XXH64 reimplemented as a
        # DuckDB HUGEINT expression (gos2_spark/pipeline/duckdb_oracles.py,
        # validated bit-for-bit against Spark):
        "bloom_delta_gate": _DO.bloom_gate_oracle_sql(2048, 3),
        # the streaming gate must reproduce the batch gate bit-for-bit:
        "streaming_bloom_gate": _DO.bloom_gate_oracle_sql(2048, 3),
        "ngram_contamination": _DO.contamination_oracle_sql(5, 37),
        "dup_span_coverage": _DO.dup_span_oracle_sql(8),
        "route_proximity": _route_oracle_sql(),
        # rational rank weight tf*(N+1)/(df+1): integer-derived IEEE
        # division is correctly rounded, so ORDER BY matches Spark exactly;
        # only the reported log weight is rounded:
        "tfidf_top_terms": r"""
            WITH d AS (
              SELECT doc_id AS key, trim(text) AS ttext
              FROM documents WHERE doc_id < 100
            ),
            nn AS (SELECT count(*) AS n FROM d),
            t AS (
              SELECT key,
                     unnest(list_transform(
                         regexp_split_to_array(ttext, '\s+'),
                         x -> lower(x))) AS term
              FROM d WHERE ttext != ''
            ),
            tf AS (SELECT key, term, count(*) AS tf FROM t GROUP BY 1, 2),
            dfr AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
            j AS (
              SELECT tf.key, tf.term, tf.tf, dfr.df,
                     CAST(tf.tf * (nn.n + 1) AS DOUBLE) / (dfr.df + 1) AS rw,
                     nn.n AS n
              FROM tf JOIN dfr USING (term), nn
            ),
            r AS (
              SELECT *, row_number() OVER (
                  PARTITION BY key ORDER BY rw DESC, term ASC) AS rk
              FROM j
            )
            SELECT key, CAST(rk AS INT) AS rk, term,
                   CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
                   round(tf * (ln(CAST(n + 1 AS DOUBLE) / (df + 1)) + 1), 6)
                       AS tfidf
            FROM r WHERE rk <= 3 ORDER BY key, rk
        """,
        "quality_classifier": _DO.classifier_oracle_sql(4096),
        "domain_pagerank": _DO.pagerank_oracle_sql(3, 0.85),
        # Exact percentiles: Spark percentile and DuckDB quantile_cont
        # share type-7 linear interpolation (idx = p*(n-1)):
        "doc_length_quantiles": r"""
            WITH d AS (
              SELECT lang,
                     CAST(length(text) AS DOUBLE) AS c,
                     CAST(CASE WHEN trim(text) = '' THEN 0
                               ELSE len(regexp_split_to_array(trim(text),
                                                              '\s+'))
                          END AS DOUBLE) AS tk
              FROM documents
            )
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   round(quantile_cont(c, 0.25), 6) AS chars_p25,
                   round(quantile_cont(c, 0.5), 6) AS chars_p50,
                   round(quantile_cont(c, 0.9), 6) AS chars_p90,
                   round(quantile_cont(c, 0.99), 6) AS chars_p99,
                   round(quantile_cont(tk, 0.25), 6) AS tokens_p25,
                   round(quantile_cont(tk, 0.5), 6) AS tokens_p50,
                   round(quantile_cont(tk, 0.9), 6) AS tokens_p90,
                   round(quantile_cont(tk, 0.99), 6) AS tokens_p99
            FROM d GROUP BY lang ORDER BY lang
        """,
        # Spatial single-linkage clustering: within-3deg edges (identical
        # float-op order as distance_join_pairs) -> recursive transitive
        # closure -> min reachable key per node:
        "spatial_components": _SPATIAL_COMPONENTS_ORACLE,
        "simhash_signatures": _DO.simhash_oracle_sql(500),
        "simhash_candidate_pairs": _DO.simhash_candidates_oracle_sql(500, 6),
        "fingerprint_sizes": _DO.fingerprint_sizes_oracle_sql(200),
        "minhash_dedup_groups": _DO.minhash_groups_oracle_sql(500, 0.8),
        # EdgeNeighbors incl. the cross-face wrap float path:
        "cell_neighbors_l8": _DO.edge_neighbors_l8_oracle_sql(
            _cellid_cte_duckdb(_CUST_LATLNG_SQL)
        ),
        # mapInPandas plumbing check: the aggregate output of the media
        # pipeline depends only on the deterministic synth parameters
        # (kind = id%3, video frames = max(1, (id%90000)//1000)), so the
        # oracle regenerates it without the payload bytes:
        # REAL-decode check: dims for both codecs come from the decoded
        # pixel arrays; the PNG channel-0 pixel sum is reconstructed
        # exactly from the (lossless) formula (k*ch + i) % 256 over the
        # h*w channel-0 positions. JPEG sums are lossy -> -1 sentinel.
        "media_real_decode": """
            WITH ids AS (SELECT range AS i FROM range(40)),
            png AS (
              SELECT 'png' || i AS media_id,
                     CAST(i % 24 + 2 AS INT) AS width,
                     CAST((i * 7) % 24 + 2 AS INT) AS height,
                     (CASE CAST(i % 3 AS INT)
                           WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END) AS ch,
                     i
              FROM ids
            ),
            png_rows AS (
              SELECT media_id, width, height,
                     CAST(list_sum(list_transform(
                         range(0, width * height),
                         k -> (k * ch + i) % 256
                     )) AS BIGINT) AS c0_pixel_sum
              FROM png
            ),
            jpg_rows AS (
              SELECT 'jpg' || i AS media_id,
                     CAST(i % 24 + 8 AS INT) AS width,
                     CAST((i * 5) % 24 + 8 AS INT) AS height,
                     CAST(-1 AS BIGINT) AS c0_pixel_sum
              FROM ids
            )
            SELECT * FROM png_rows
            UNION ALL SELECT * FROM jpg_rows
            ORDER BY media_id
        """,
        # REAL WAV decode: PCM is lossless, so channel-0 sample sums are
        # exact integers reconstructible from the generator formula.
        "media_audio_decode": """
            WITH ids AS (SELECT range AS i FROM range(40)),
            w AS (
              SELECT 'wav' || i AS media_id,
                     CAST(1 + (i % 2) AS INT) AS n_channels,
                     CAST(i % 50 + 20 AS INT) AS n_frames,
                     i
              FROM ids
            )
            SELECT media_id, n_channels, n_frames,
                   CAST(list_sum(list_transform(
                       range(0, n_frames),
                       k -> (i * 31 + k * 7) % 65536 - 32768
                   )) AS BIGINT) AS c0_sample_sum
            FROM w ORDER BY media_id
        """,
        # REAL MJPEG-AVI decode: constant-gray frames survive quality-95
        # JPEG exactly (DC-only blocks, quant step 2), so the sum of the
        # sampled frames' constant values is exact. Sampling: one frame
        # per 80 ms at 25 fps = every 2nd frame starting at 0.
        "media_video_decode": """
            WITH ids AS (SELECT range AS i FROM range(40)),
            v AS (
              SELECT 'avi' || i AS media_id,
                     CAST(i % 16 + 8 AS INT) AS width,
                     CAST((i * 3) % 16 + 8 AS INT) AS height,
                     CAST(i % 8 + 3 AS BIGINT) AS n,
                     i
              FROM ids
            )
            SELECT media_id, width, height,
                   CAST((n + 1) // 2 AS INT) AS n_sampled,
                   CAST(list_sum(list_transform(
                       range(0, (n + 1) // 2),
                       s -> (i * 37 + (2 * s) * 11) % 256
                   )) AS BIGINT) AS c0_value_sum
            FROM v ORDER BY media_id
        """,
        # WARC source: segment contents are closed-form in doc_id, so the
        # oracle regenerates the extraction (text length = html minus the
        # fixed 37 tag bytes; ts = epoch formula; coords = formatted ints)
        "warc_extract_pages": """
            WITH ids AS (SELECT range AS d FROM range(320)),
            rows_ AS (
              SELECT 'https://site' || (d % 97) || '.example/' || d AS url,
                     CAST(1704067200 + (d * 37) % 31536000 AS BIGINT)
                       AS ts_epoch,
                     -60.0 + CAST((d * 7) % 120 AS DOUBLE) AS lat,
                     -170.0 + CAST((d * 13) % 340 AS DOUBLE) AS lng,
                     d
              FROM ids
            )
            SELECT url, ts_epoch,
                   CAST(length('Doc ' || d || ' located at '
                        || printf('%.6f', lat) || ', '
                        || printf('%.6f', lng) || ' today.') AS INT)
                     AS text_chars,
                   CAST(length('<html><body><p>Doc ' || d || ' located at '
                        || printf('%.6f', lat) || ', '
                        || printf('%.6f', lng)
                        || ' today.</p></body></html>') AS INT)
                     AS html_bytes,
                   lat, lng
            FROM rows_ ORDER BY url
        """,
        "media_features": """
            WITH m AS (SELECT range AS id FROM range(300)),
            k AS (
              SELECT id,
                     (['image', 'audio', 'video'])[CAST(id % 3 AS INT) + 1]
                       AS kind,
                     CAST(id % 90000 AS INT) AS dur
              FROM m
            )
            SELECT kind, count(*) AS n,
                   CAST(sum(CASE WHEN kind = 'video'
                                 THEN greatest(1, dur // 1000)
                                 ELSE 1 END) AS BIGINT) AS total_frames
            FROM k GROUP BY kind ORDER BY kind
        """,
        # LSH ANN: hyperplanes depend only on (dim=64, planes=16, seed=42)
        # and are embedded as literals; buckets + any-band join + cosine
        # rerank are plain SQL:
        "embedding_ann_lsh": _DO.ann_lsh_oracle_sql(),
        "embedding_ann_ivf": _DO.ann_ivf_oracle_sql(),
        # center-mode rasterization: independent full-grid enumeration +
        # forward Hilbert encode in SQL (engine: codegen id enumeration +
        # inverse-Hilbert decode + exact refine):
        "rasterize_centers_l8": _rasterize_oracle_sql(_RASTER_LEVEL),
        "polygon_overlap_relations": _polygon_overlap_oracle_sql(),
        "polygon_boolean_areas": _polygon_boolean_oracle_sql(),
        "raster_vector_roundtrip": _raster_roundtrip_oracle_sql(),
        "nation_bounding_rects": """
            WITH pts AS (
              SELECT c_nationkey AS nationkey,
                     -60.0 + (c_custkey * 7 % 120) + (c_custkey % 97) / 97.0 AS lat,
                     -170.0 + (c_custkey * 13 % 340) + (c_custkey % 89) / 89.0 AS lng
              FROM customer
            ),
            s AS (
              SELECT nationkey, lat, lng,
                     coalesce(lead(lng) OVER (PARTITION BY nationkey ORDER BY lng),
                              min(lng) OVER (PARTITION BY nationkey) + 360.0) AS nxt,
                     min(lat) OVER (PARTITION BY nationkey) AS lat_lo,
                     max(lat) OVER (PARTITION BY nationkey) AS lat_hi,
                     count(*) OVER (PARTITION BY nationkey) AS n_pts
              FROM pts
            ),
            g AS (
              SELECT *, row_number() OVER (
                       PARTITION BY nationkey ORDER BY nxt - lng DESC, lng
                     ) AS rn
              FROM s
            )
            SELECT nationkey,
                   round(lat_lo, 9) AS lat_lo,
                   round(lat_hi, 9) AS lat_hi,
                   round(CASE WHEN nxt >= 180.0 THEN nxt - 360.0 ELSE nxt END, 9) AS lng_lo,
                   round(lng, 9) AS lng_hi,
                   n_pts
            FROM g WHERE rn = 1 ORDER BY nationkey
        """,
        "cellunion_denormalize": f"""
            WITH {_cellid_cte_duckdb(_CUST_LATLNG_SQL)},
            lvl AS (
              SELECT CAST(key % 3 + 4 AS INT) AS level,
                     CASE WHEN key % 3 = 0 THEN {1 << 52}
                          WHEN key % 3 = 1 THEN {1 << 50}
                          ELSE {1 << 48} END AS lsb,
                     cell_id
              FROM cells
            ),
            parents AS (
              SELECT DISTINCT level, (cell_id & -lsb) | lsb AS parent FROM lvl
            ),
            ch AS (
              SELECT level, parent,
                     unnest(generate_series(parent - (parent & -parent) + {1 << 48},
                                            parent + (parent & -parent) - {1 << 48},
                                            {2 * (1 << 48)})) AS child
              FROM parents
            )
            SELECT level,
                   count(DISTINCT parent) AS n_cells,
                   count(DISTINCT child) AS n_denorm
            FROM ch GROUP BY level ORDER BY level
        """,
        "edge_interpolate": _edge_interpolate_oracle_sql(),
        # Multi-line corpus shared by line_dedup_stats: 5-word lines + the
        # injected boilerplate ('subscribe...' everywhere, 'follow...' on 1/7).
        "line_dedup_stats": r"""
            WITH d AS (
              SELECT doc_id, lang,
                     regexp_replace(text, '((?:\S+ ){4}\S+) ',
                                    '\1' || chr(10), 'g')
                     || chr(10) || 'subscribe to our newsletter today'
                     || CASE WHEN doc_id % 7 = 0
                             THEN chr(10) || 'follow us on social media'
                             ELSE '' END AS t
              FROM documents
            ),
            split AS (
              SELECT doc_id, lang, string_split(t, chr(10)) AS ls FROM d
            ),
            lines AS (
              SELECT doc_id, lang, ls[i] AS line, i AS pos
              FROM split, unnest(generate_series(1, len(ls))) AS g(i)
              WHERE length(trim(ls[i])) >= 1
            ),
            over_quota AS (
              SELECT trim(line) AS tl
              FROM (SELECT DISTINCT trim(line) AS line, doc_id FROM lines)
              GROUP BY 1 HAVING count(*) > 2
            ),
            kept AS (
              SELECT l.* FROM lines l
              WHERE trim(l.line) NOT IN (SELECT tl FROM over_quota)
            ),
            per_doc AS (
              SELECT l.doc_id, l.lang,
                     count(*) AS n_lines,
                     count(k.line) AS n_kept,
                     coalesce(sum(length(k.line)), 0)
                       + CASE WHEN count(k.line) > 0
                              THEN count(k.line) - 1 ELSE 0 END AS kept_chars
              FROM lines l
              LEFT JOIN kept k ON k.doc_id = l.doc_id AND k.pos = l.pos
              GROUP BY 1, 2
            )
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_lines) AS BIGINT) AS total_lines,
                   CAST(sum(n_kept) AS BIGINT) AS total_kept,
                   CAST(sum(CASE WHEN n_kept < n_lines THEN 1 ELSE 0 END)
                        AS BIGINT) AS docs_changed,
                   CAST(sum(kept_chars) AS BIGINT) AS kept_chars
            FROM per_doc GROUP BY lang ORDER BY lang
        """,
        "repetition_filters": r"""
            WITH d AS (
              SELECT doc_id, lang,
                     regexp_replace(text, '((?:\S+ ){4}\S+) ',
                                    '\1' || chr(10), 'g') AS nl
              FROM documents
            ),
            d2 AS (
              SELECT doc_id, lang,
                     CASE WHEN doc_id % 3 = 0
                          THEN nl || chr(10) || split_part(nl, chr(10), 1)
                          ELSE nl END AS t
              FROM d
            ),
            lined AS (
              SELECT doc_id, lang, t,
                     list_filter(string_split(t, chr(10)),
                                 x -> length(trim(x)) > 0) AS lines,
                     regexp_split_to_array(trim(t), '\s+') AS words
              FROM d2
            ),
            bg AS (
              SELECT doc_id, words[i] || ' ' || words[i + 1] AS bigram
              FROM lined, unnest(generate_series(1, len(words) - 1)) AS g(i)
            ),
            top_bg AS (
              SELECT doc_id, max(cnt) AS top_cnt, sum(cnt) AS n_bigrams
              FROM (SELECT doc_id, bigram, count(*) AS cnt
                    FROM bg GROUP BY 1, 2)
              GROUP BY 1
            ),
            feats AS (
              SELECT l.doc_id, l.lang,
                     1.0 - len(list_distinct(lines))::DOUBLE / len(lines)
                       AS dup_line_frac,
                     (list_sum(list_transform(lines, x -> length(x)))
                      - list_sum(list_transform(list_distinct(lines),
                                                x -> length(x))))::DOUBLE
                     / list_sum(list_transform(lines, x -> length(x)))
                       AS dup_line_char_frac,
                     t.top_cnt::DOUBLE / t.n_bigrams AS top_bigram_frac
              FROM lined l JOIN top_bg t USING (doc_id)
            )
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   round(avg(dup_line_frac), 9) AS avg_dup_line_frac,
                   round(avg(dup_line_char_frac), 9) AS avg_dup_char_frac,
                   round(avg(top_bigram_frac), 9) AS avg_top_bigram_frac,
                   CAST(sum(CASE WHEN dup_line_frac > 0.25
                                   OR top_bigram_frac > 0.18
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
            FROM feats GROUP BY lang ORDER BY lang
        """,
        # Session boundaries: Spark's session_window merges an event into
        # the previous session iff ts - prev_ts <= gap (boundary-inclusive;
        # verified by tests/test_aggregates.py::test_sessionize_gap_semantics),
        # so a new island starts only at diff STRICTLY > 1 hour.
        "session_stats": """
            WITH m AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR ts - lag(ts) OVER w > INTERVAL 1 HOUR
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ),
            s AS (
              SELECT user_id, ts,
                     sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sid
              FROM m
            ),
            per AS (
              SELECT user_id, sid, count(*) AS n,
                     epoch_us(max(ts) - min(ts)) + 3600000000 AS dur_us
              FROM s GROUP BY 1, 2
            )
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_sessions,
                   CAST(sum(n) AS BIGINT) AS total_events,
                   CAST(max(n) AS BIGINT) AS max_session_events,
                   CAST(max(dur_us) AS BIGINT) AS max_session_micros
            FROM per GROUP BY user_id ORDER BY user_id
        """,
        "trajectory_lengths": """
            WITH pts AS (
              SELECT user_id, ts, event_id,
                     -60.0 + (event_id * 11 % 120) + (event_id % 83) / 83.0 AS lat,
                     -170.0 + (event_id * 17 % 340) + (event_id % 79) / 79.0 AS lng
              FROM events
            ),
            lagged AS (
              SELECT user_id,
                     lag(lat) OVER w AS plat, lag(lng) OVER w AS plng,
                     lat, lng
              FROM pts
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            legs AS (
              SELECT user_id,
                     2 * atan2(sqrt(
                           power(sin(0.5 * (radians(lat) - radians(plat))), 2)
                         + power(sin(0.5 * (radians(lng) - radians(plng))), 2)
                           * cos(radians(plat)) * cos(radians(lat))),
                         sqrt(greatest(0.0, 1.0 - (
                           power(sin(0.5 * (radians(lat) - radians(plat))), 2)
                         + power(sin(0.5 * (radians(lng) - radians(plng))), 2)
                           * cos(radians(plat)) * cos(radians(lat))))))
                       AS leg
              FROM lagged WHERE plat IS NOT NULL
            )
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_legs,
                   round(sum(leg), 9) AS path_rad,
                   round(max(leg), 9) AS max_leg_rad
            FROM legs GROUP BY user_id ORDER BY user_id
        """,
        "nearest_city_classify": f"""
            WITH pts AS ({_CUST_LATLNG_SQL}),
            d AS (
              SELECT key, city, dist,
                     row_number() OVER (PARTITION BY key ORDER BY dist, city) AS rk
              FROM ({_city_union_sql()})
            )
            SELECT city, count(*) AS n_points,
                   round(min(dist), 9) AS min_dist_rad,
                   round(max(dist), 9) AS max_dist_rad
            FROM d WHERE rk = 1 GROUP BY city ORDER BY city
        """,
        "trajectory_bearings": f"""
            WITH pts AS ({_EVENTS_LATLNG_SQL}),
            lagged AS (
              SELECT user_id,
                     lag(lat) OVER w AS plat, lag(lng) OVER w AS plng,
                     lat, lng
              FROM pts
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            b0 AS (
              SELECT atan2(
                       sin(radians(lng) - radians(plng)) * cos(radians(lat)),
                       cos(radians(plat)) * sin(radians(lat))
                       - sin(radians(plat)) * cos(radians(lat))
                         * cos(radians(lng) - radians(plng))) AS braw
              FROM lagged WHERE plat IS NOT NULL
            ),
            b AS (
              SELECT CASE WHEN braw < 0.0 THEN braw + {2.0 * math.pi!r}
                          ELSE braw END AS bearing
              FROM b0
            )
            SELECT CAST(floor(bearing / {math.pi / 4.0!r}) % 8 AS INT) AS sector,
                   count(*) AS n_legs,
                   round(min(bearing), 9) AS min_bearing,
                   round(max(bearing), 9) AS max_bearing
            FROM b GROUP BY sector ORDER BY sector
        """,
        "gc_midpoints": f"""
            WITH pts AS ({_EVENTS_LATLNG_SQL}),
            lagged AS (
              SELECT user_id, event_id,
                     lag(lat) OVER w AS plat, lag(lng) OVER w AS plng,
                     lat, lng
              FROM pts
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            s AS (
              SELECT user_id, event_id,
                     cos(radians(plng)) * cos(radians(plat))
                       + cos(radians(lng)) * cos(radians(lat)) AS sx,
                     sin(radians(plng)) * cos(radians(plat))
                       + sin(radians(lng)) * cos(radians(lat)) AS sy,
                     sin(radians(plat)) + sin(radians(lat)) AS sz
              FROM lagged WHERE plat IS NOT NULL
            )
            SELECT user_id, event_id,
                   round(degrees(atan2(sz, sqrt(sx * sx + sy * sy))), 9) AS mid_lat,
                   round(degrees(atan2(sy, sx)), 9) AS mid_lng
            FROM s ORDER BY user_id, event_id
        """,
        "geo_language_mix": f"""
            WITH {_cellid_cte_duckdb(_CUST_LATLNG_SQL)},
            l AS (
              SELECT ((cell_id & -{1 << 52}) | {1 << 52}) AS cell_l4,
                     ({_langs_list_sql()})[CAST(key % 6 AS INT) + 1] AS lang
              FROM cells
            ),
            per AS (SELECT cell_l4, lang, count(*) AS n FROM l GROUP BY 1, 2),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY cell_l4 ORDER BY n DESC, lang) AS rk
              FROM per
            ),
            tot AS (
              SELECT cell_l4, CAST(sum(n) AS BIGINT) AS n_points,
                     count(*) AS n_langs
              FROM per GROUP BY 1
            )
            SELECT t.cell_l4, t.n_points, t.n_langs,
                   r.lang AS top_lang, r.n AS top_n
            FROM tot t JOIN ranked r ON r.cell_l4 = t.cell_l4 AND r.rk = 1
            ORDER BY t.cell_l4
        """,
        "url_canonical_dedup": f"""
            WITH raw AS (
              SELECT doc_id,
                     'https://site' || (doc_id % 20)::VARCHAR || '.example/p/'
                       || (doc_id % 125)::VARCHAR AS base,
                     CASE CAST(doc_id % 4 AS INT)
                       WHEN 1 THEN 'HTTPS://SITE' || (doc_id % 20)::VARCHAR
                                   || '.EXAMPLE:443/p/' || (doc_id % 125)::VARCHAR || '#ref'
                       WHEN 2 THEN 'https://site' || (doc_id % 20)::VARCHAR || '.example/p/'
                                   || (doc_id % 125)::VARCHAR || '?utm_source=feed&utm_medium=rss'
                       WHEN 3 THEN 'https://site' || (doc_id % 20)::VARCHAR || '.example/p/'
                                   || (doc_id % 125)::VARCHAR || '/'
                       ELSE 'https://site' || (doc_id % 20)::VARCHAR || '.example/p/'
                            || (doc_id % 125)::VARCHAR
                     END AS messy
              FROM documents
            ),
            c1 AS (SELECT doc_id, base, regexp_replace(messy, '#.*$', '') AS u FROM raw),
            c2 AS (SELECT doc_id, base,
                          lower(regexp_extract(u, '^([^/?#]*//[^/?#]*)', 1))
                            || regexp_replace(u, '^[^/?#]*//[^/?#]*', '') AS u
                   FROM c1),
            c3 AS (SELECT doc_id, base,
                          regexp_replace(
                            regexp_replace(u, '^(https://[^/:?#]+):443([/?#].*)?$', '\\1\\2'),
                            '^(http://[^/:?#]+):80([/?#].*)?$', '\\1\\2') AS u
                   FROM c2),
            c4 AS (SELECT doc_id, base,
                          regexp_replace(u, '(?:utm_[a-z]+|fbclid|gclid)=[^&#]*&?', '', 'g') AS u
                   FROM c3),
            c5 AS (SELECT doc_id, base,
                          regexp_replace(replace(u, '?&', '?'), '[?&]+$', '') AS u
                   FROM c4),
            canon AS (SELECT doc_id, base, regexp_replace(u, '/+$', '') AS canon FROM c5)
            SELECT lower(regexp_extract(canon,
                     '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)', 1)) AS host,
                   count(*) AS n_raw,
                   CAST(count(DISTINCT canon) AS BIGINT) AS n_canonical,
                   CAST(sum(CASE WHEN canon = base THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_roundtrip_ok
            FROM canon GROUP BY host ORDER BY host
        """,
        "host_link_graph": """
            WITH pages AS (
              SELECT 'site' || (doc_id % 20)::VARCHAR || '.example' AS src_host,
                     '<html><body><a href="https://site' || ((doc_id * 7) % 20)::VARCHAR
                       || '.example/p/' || (doc_id % 125)::VARCHAR
                       || '">x</a> <a href="/local">l</a> <a href="https://site'
                       || ((doc_id * 11) % 20)::VARCHAR
                       || '.example/q">y</a></body></html>' AS html
              FROM documents
            ),
            links AS (
              SELECT src_host,
                     unnest(regexp_extract_all(html, 'href="([^"]*)"', 1)) AS href
              FROM pages
            ),
            edges AS (
              SELECT src_host,
                     lower(regexp_extract(href,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)', 1)) AS dst_host
              FROM links
            )
            SELECT src_host, dst_host, count(*) AS n_links
            FROM edges WHERE dst_host <> ''
            GROUP BY src_host, dst_host ORDER BY src_host, dst_host
        """,
        "robots_url_gate": """
            WITH pages AS (
              SELECT 'site' || (doc_id % 20)::VARCHAR || '.example' AS host,
                     (CASE CAST(doc_id % 5 AS INT)
                        WHEN 0 THEN '/p/' WHEN 1 THEN '/admin/' WHEN 2 THEN '/tmp/'
                        WHEN 3 THEN '/q/' ELSE '/admin/logs/' END)
                       || (doc_id % 125)::VARCHAR AS path
              FROM documents
            ),
            rules(rhost, prefix) AS (
              VALUES ('*', '/admin'), ('site3.example', '/tmp'), ('site7.example', '/q')
            ),
            flagged AS (
              SELECT host,
                     CASE WHEN EXISTS (
                       SELECT 1 FROM rules r
                       WHERE (r.rhost = '*' OR r.rhost = pages.host)
                         AND starts_with(pages.path, r.prefix)
                     ) THEN 1 ELSE 0 END AS blocked
              FROM pages
            )
            SELECT host, count(*) AS n_total,
                   CAST(sum(1 - blocked) AS BIGINT) AS n_kept,
                   CAST(sum(blocked) AS BIGINT) AS n_blocked
            FROM flagged GROUP BY host ORDER BY host
        """,
        "char_entropy_stats": _entropy_oracle_sql(),
        "spatiotemporal_rollup": f"""
            WITH {_cellid_cte_duckdb(
                "SELECT event_id AS key, "
                "-60.0 + (event_id * 11 % 120) + (event_id % 83) / 83.0 AS lat, "
                "-170.0 + (event_id * 17 % 340) + (event_id % 79) / 79.0 AS lng "
                "FROM events"
            )},
            enriched AS (
              SELECT strftime(e.ts, '%Y-%m-%d') AS day,
                     ((c.cell_id & -{1 << 50}) | {1 << 50}) AS cell_l5,
                     e.user_id
              FROM cells c JOIN events e ON e.event_id = c.key
            ),
            rolled AS (
              SELECT day, cell_l5, count(*) AS n_events,
                     CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
              FROM enriched GROUP BY ROLLUP(day, cell_l5)
            )
            SELECT coalesce(day, '__total__') AS day,
                   coalesce(CAST(cell_l5 AS VARCHAR), '__total__') AS cell,
                   n_events, n_users
            FROM rolled ORDER BY day, cell
        """,
        # independent implementation check: DuckDB's native ASOF JOIN vs
        # the engine's union + carry-forward-window plan
        "asof_profile_join": """
            WITH l AS (SELECT user_id, ts, event_id FROM events),
            r AS (
              SELECT user_id, ts, max(event_id % 5) AS tier
              FROM events WHERE event_id % 17 = 0 GROUP BY user_id, ts
            )
            SELECT l.event_id, coalesce(r.tier, -1) AS tier
            FROM l ASOF LEFT JOIN r
              ON l.user_id = r.user_id AND l.ts >= r.ts
            ORDER BY l.event_id
        """,
        "gc_destination": f"""
            WITH pts AS ({_CUST_LATLNG_SQL}),
            p AS (
              SELECT key, lat, lng,
                     radians(key % 360) AS brg,
                     (key % 5) * 0.01 + 0.03 AS dist
              FROM pts
            ),
            s AS (
              SELECT *,
                     sin(radians(lat)) * cos(dist)
                       + cos(radians(lat)) * sin(dist) * cos(brg) AS sin_lat2
              FROM p
            ),
            d0 AS (
              SELECT key, lat, lng, dist,
                     degrees(asin(greatest(-1.0, least(1.0, sin_lat2)))) AS dst_lat,
                     degrees(radians(lng) + atan2(
                       sin(brg) * sin(dist) * cos(radians(lat)),
                       cos(dist) - sin(radians(lat)) * sin_lat2)) AS lng2d
              FROM s
            ),
            d AS (
              SELECT key, lat, lng, dist, dst_lat,
                     lng2d - 360.0 * floor((lng2d + 180.0) / 360.0) AS dst_lng
              FROM d0
            ),
            x AS (
              SELECT *,
                     power(sin(0.5 * (radians(dst_lat) - radians(lat))), 2)
                       + power(sin(0.5 * (radians(dst_lng) - radians(lng))), 2)
                         * cos(radians(lat)) * cos(radians(dst_lat)) AS hx
              FROM d
            )
            SELECT key,
                   round(dst_lat, 9) AS dst_lat,
                   round(dst_lng, 9) AS dst_lng,
                   round(abs(2 * atan2(sqrt(hx), sqrt(greatest(0.0, 1.0 - hx))) - dist), 9)
                     AS dist_err
            FROM x ORDER BY key
        """,
        # the oracle runs the NAIVE inequality range join the engine's
        # bucket decomposition must be equivalent to
        "interval_window_join": """
            WITH w AS (
              SELECT event_id AS win_id, user_id,
                     ts AS start_ts, ts + INTERVAL 2 HOUR AS end_ts
              FROM events WHERE event_id % 23 = 0
            ),
            m AS (
              SELECT w.win_id, e.event_id
              FROM w JOIN events e
                ON e.user_id = w.user_id
               AND e.ts >= w.start_ts AND e.ts <= w.end_ts
            )
            SELECT win_id, count(*) AS n_events,
                   CAST(sum(event_id) AS BIGINT) AS event_sum
            FROM m GROUP BY win_id ORDER BY win_id
        """,
        "hits_scores": _hits_oracle_sql(2),
        "cell_top_events": f"""
            WITH {_cellid_cte_duckdb(
                "SELECT event_id AS key, "
                "-60.0 + (event_id * 11 % 120) + (event_id % 83) / 83.0 AS lat, "
                "-170.0 + (event_id * 17 % 340) + (event_id % 79) / 79.0 AS lng "
                "FROM events"
            )},
            j AS (
              SELECT ((c.cell_id & -{1 << 50}) | {1 << 50}) AS cell_l5,
                     e.event_id, e.value
              FROM cells c JOIN events e ON e.event_id = c.key
            ),
            r AS (
              SELECT cell_l5,
                     CAST(row_number() OVER (
                       PARTITION BY cell_l5 ORDER BY value DESC, event_id
                     ) AS INT) AS rk,
                     event_id, round(value, 6) AS value
              FROM j
            )
            SELECT cell_l5, rk, event_id, value
            FROM r WHERE rk <= 3 ORDER BY cell_l5, rk
        """,
        "unigram_logprob": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(string_split_regex(lower(text), '[^a-z]+')) AS token
              FROM documents
            ),
            tk AS (SELECT doc_id, token FROM toks WHERE token <> ''),
            counts AS (SELECT token, count(*) AS c FROM tk GROUP BY token),
            tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM counts),
            j AS (
              SELECT tk.doc_id, ln(CAST(counts.c AS DOUBLE) / tot.t) AS lp
              FROM tk JOIN counts USING (token), tot
            )
            SELECT doc_id, count(*) AS n_tok,
                   round(sum(lp) / count(*), 6) AS avg_logprob
            FROM j GROUP BY doc_id ORDER BY doc_id
        """,
        # brute-force O(n^2) reference: the engine's prefix filter must
        # lose NO qualifying pair
        "jaccard_similarity_join": """
            WITH sh AS (
              SELECT doc_id,
                     list_distinct(list_filter(
                       string_split_regex(lower(text), '[^a-z]+'),
                       t -> len(t) > 0)) AS s
              FROM documents WHERE doc_id < 300
            ),
            p AS (
              SELECT a.doc_id AS key_a, b.doc_id AS key_b,
                     len(list_intersect(a.s, b.s)) AS n_inter,
                     len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))
                       AS n_union
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE len(a.s) > 0 AND len(b.s) > 0
            )
            SELECT key_a, key_b, n_inter, n_union,
                   round(n_inter::DOUBLE / n_union::DOUBLE, 9) AS jaccard
            FROM p WHERE n_inter::DOUBLE / n_union::DOUBLE >= 0.9
            ORDER BY key_a, key_b
        """,
        "zipf_top_tokens": """
            WITH toks AS (
              SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS token
              FROM documents
            ),
            counts AS (
              SELECT token, count(*) AS n_occurrences
              FROM toks WHERE token <> '' GROUP BY token
            ),
            ranked AS (
              SELECT token, n_occurrences,
                     CAST(row_number() OVER (
                       ORDER BY n_occurrences DESC, token) AS INT) AS rank,
                     sum(n_occurrences) OVER (
                       ORDER BY n_occurrences DESC, token
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM counts
            )
            SELECT rank, token, n_occurrences,
                   round(CAST(cum AS DOUBLE)
                         / CAST((SELECT sum(n_occurrences) FROM counts) AS DOUBLE),
                         9) AS cum_frac
            FROM ranked WHERE rank <= 50 ORDER BY rank
        """,
        # Single-window reference plan for the engine's two-level skew-safe
        # rank — results must be IDENTICAL.
        "domain_cap_sample": """
            WITH d AS (
              SELECT doc_id,
                     'site' || (doc_id % 97) || '.' ||
                     CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
                                     ELSE 'net' END AS domain,
                     (doc_id * 2654435761) % 1000000007 AS ord
              FROM documents
            ),
            r AS (
              SELECT *, row_number() OVER (PARTITION BY domain
                                           ORDER BY ord, doc_id) AS rn
              FROM d
            )
            SELECT domain,
                   CAST(count(*) AS BIGINT) AS n_kept,
                   CAST(sum(doc_id) AS BIGINT) AS kept_doc_sum,
                   CAST(max(ord) AS BIGINT) AS max_ord
            FROM r WHERE rn <= 3 GROUP BY domain ORDER BY domain
        """,
        # Ground truth from the url-construction arithmetic (the engine must
        # RECOVER these via its regex host/path parser).
        "domain_stats": """
            WITH d AS (
              SELECT doc_id, text,
                     'site' || (doc_id % 97) || '.' ||
                     CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
                                     ELSE 'net' END AS domain,
                     CASE doc_id % 4 WHEN 0 THEN 'www.' WHEN 1 THEN 'm.'
                                     ELSE '' END AS sub,
                     CAST(doc_id % 3 + 1 AS INTEGER) AS path_depth
              FROM documents
            )
            SELECT domain,
                   CAST(count(*) AS BIGINT) AS n_pages,
                   CAST(count(DISTINCT sub || domain) AS BIGINT) AS n_hosts,
                   CAST(sum(length(text)) AS BIGINT) AS total_chars,
                   round(avg(length(text)), 9) AS avg_chars,
                   max(path_depth) AS max_path_depth
            FROM d GROUP BY domain ORDER BY domain
        """,
        # Grouped-CTE replay of the adaptive tiling rule: counts at L4 from
        # the full cellid pipeline, rolled up L3..L1 via the biased-id
        # parent bit arithmetic; a level-L cell is a tile iff its parent is
        # hot (> 8) and it is cold (<= 8) or L == max.
        "adaptive_density_tiles": f"""
            WITH {_cellid_cte_duckdb(_CUST_LATLNG_SQL)},
            c4 AS (SELECT ((cell_id & -{1 << 52}) | {1 << 52}) AS cell,
                          CAST(count(*) AS BIGINT) AS n
                   FROM cells GROUP BY 1),
            c3 AS (SELECT ((cell & -{1 << 54}) | {1 << 54}) AS cell,
                          CAST(sum(n) AS BIGINT) AS n FROM c4 GROUP BY 1),
            c2 AS (SELECT ((cell & -{1 << 56}) | {1 << 56}) AS cell,
                          CAST(sum(n) AS BIGINT) AS n FROM c3 GROUP BY 1),
            c1 AS (SELECT ((cell & -{1 << 58}) | {1 << 58}) AS cell,
                          CAST(sum(n) AS BIGINT) AS n FROM c2 GROUP BY 1)
            SELECT cell, CAST(1 AS INTEGER) AS level, n FROM c1 WHERE n <= 8
            UNION ALL
            SELECT c.cell, CAST(2 AS INTEGER) AS level, c.n
            FROM c2 c JOIN c1 p ON ((c.cell & -{1 << 58}) | {1 << 58}) = p.cell
            WHERE p.n > 8 AND c.n <= 8
            UNION ALL
            SELECT c.cell, CAST(3 AS INTEGER) AS level, c.n
            FROM c3 c JOIN c2 p ON ((c.cell & -{1 << 56}) | {1 << 56}) = p.cell
            WHERE p.n > 8 AND c.n <= 8
            UNION ALL
            SELECT c.cell, CAST(4 AS INTEGER) AS level, c.n
            FROM c4 c JOIN c3 p ON ((c.cell & -{1 << 54}) | {1 << 54}) = p.cell
            WHERE p.n > 8
            ORDER BY level, cell
        """,
        "sequence_packing": """
            WITH d AS (
              SELECT doc_id, lang,
                     CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tok,
                     CAST(doc_id % 8 AS INTEGER) AS shard
              FROM documents
            ),
            w AS (
              SELECT *, CAST(sum(n_tok) OVER (PARTITION BY lang, shard
                             ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS cum
              FROM d
            ),
            p AS (
              SELECT *,
                     CAST(floor((cum - n_tok) / 512.0) AS BIGINT) AS pack_first,
                     CASE WHEN n_tok > 0
                          THEN CAST(floor((cum - 1) / 512.0) AS BIGINT)
                          ELSE CAST(floor((cum - n_tok) / 512.0) AS BIGINT)
                     END AS pack_last
              FROM w
            )
            SELECT lang, shard,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_tok) AS BIGINT) AS total_tok,
                   CAST(ceil(sum(n_tok) / 512.0) AS BIGINT) AS n_packs,
                   CAST(sum(CASE WHEN pack_last <> pack_first THEN 1 ELSE 0 END)
                        AS BIGINT) AS boundary_docs,
                   round((sum(n_tok) - (ceil(sum(n_tok) / 512.0) - 1) * 512)
                         / 512.0, 9) AS last_pack_fill
            FROM p GROUP BY lang, shard ORDER BY lang, shard
        """,
        # Injection-arithmetic ground truth (no regexes): every count and
        # char total is derived from what was planted, so the engine's
        # regex scrubber must match EXACTLY the injected spans.
        "pii_scrub_stats": """
            WITH d AS (
              SELECT doc_id, lang, length(text) AS base_len,
                     CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS e,
                     CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS p,
                     CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS i,
                     -- matched-span lengths: email 'user<k%50>@example.com',
                     -- phone '555-123-4' + 3 digits, ip '10.1.<a>.<b>'
                     16 + length(CAST(doc_id % 50 AS VARCHAR)) AS e_len,
                     12 AS p_len,
                     6 + length(CAST(doc_id % 200 AS VARCHAR))
                       + length(CAST((doc_id * 7) % 250 AS VARCHAR)) AS i_len
              FROM documents
            ),
            s AS (
              SELECT lang,
                     e, p, i,
                     e * e_len + p * p_len + i * i_len AS redacted,
                     -- appended prefixes: ' contact '=9, ' call '+'555-123-4'
                     -- counts inside p_len already, extra=6; ip ' from host '=11
                     base_len + e * (9 + e_len) + p * (6 + p_len)
                       + i * (11 + i_len)
                       - (e * e_len + p * p_len + i * i_len)
                       + e * 7 + i * 4 + p * 7 AS scrubbed_len
              FROM d
            )
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(e) AS BIGINT) AS n_email,
                   CAST(sum(i) AS BIGINT) AS n_ipv4,
                   CAST(sum(p) AS BIGINT) AS n_phone,
                   CAST(sum(CASE WHEN e + p + i > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS docs_with_pii,
                   CAST(sum(redacted) AS BIGINT) AS chars_redacted,
                   CAST(sum(scrubbed_len) AS BIGINT) AS scrubbed_chars
            FROM s GROUP BY lang ORDER BY lang
        """,
        # max-of-min nested aggregation replaying the engine's exact
        # haversine op order over the same deterministic point derivation.
        "trajectory_hausdorff": """
            WITH pts AS (
              SELECT user_id, event_id AS pt_id,
                     -60.0 + (event_id * 11 % 120) + (event_id % 83) / 83.0 AS lat,
                     -170.0 + (event_id * 17 % 340) + (event_id % 79) / 79.0 AS lng
              FROM events WHERE user_id < 8
            ),
            pairs AS (
              SELECT a.user_id AS key_a, b.user_id AS key_b,
                     a.pt_id AS aid, b.pt_id AS bid,
                     2 * atan2(sqrt(
                           power(sin(0.5 * (radians(b.lat) - radians(a.lat))), 2)
                         + power(sin(0.5 * (radians(b.lng) - radians(a.lng))), 2)
                           * cos(radians(a.lat)) * cos(radians(b.lat))),
                         sqrt(greatest(0.0, 1.0 - (
                           power(sin(0.5 * (radians(b.lat) - radians(a.lat))), 2)
                         + power(sin(0.5 * (radians(b.lng) - radians(a.lng))), 2)
                           * cos(radians(a.lat)) * cos(radians(b.lat))))))
                       AS dist
              FROM pts a JOIN pts b ON a.user_id < b.user_id
            ),
            hab AS (
              SELECT key_a, key_b, max(mind) AS h_ab FROM (
                SELECT key_a, key_b, aid, min(dist) AS mind
                FROM pairs GROUP BY key_a, key_b, aid
              ) GROUP BY key_a, key_b
            ),
            hba AS (
              SELECT key_a, key_b, max(mind) AS h_ba FROM (
                SELECT key_a, key_b, bid, min(dist) AS mind
                FROM pairs GROUP BY key_a, key_b, bid
              ) GROUP BY key_a, key_b
            ),
            sizes AS (
              SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM pts GROUP BY user_id
            )
            SELECT hab.key_a, hab.key_b, sa.n AS n_a, sb.n AS n_b,
                   round(h_ab, 9) AS h_ab, round(h_ba, 9) AS h_ba,
                   round(greatest(h_ab, h_ba), 9) AS h_sym
            FROM hab JOIN hba USING (key_a, key_b)
            JOIN sizes sa ON sa.user_id = hab.key_a
            JOIN sizes sb ON sb.user_id = hab.key_b
            ORDER BY key_a, key_b
        """,
        # lag/first/last window + 3-vector mean replay of the profile
        # aggregation (same haversine op order; centroid via atan2 of the
        # averaged unit vectors, dispersion via arccos of their norm).
        "trajectory_profiles": """
            WITH pts AS (
              SELECT user_id, ts, event_id,
                     -60.0 + (event_id * 11 % 120) + (event_id % 83) / 83.0 AS lat,
                     -170.0 + (event_id * 17 % 340) + (event_id % 79) / 79.0 AS lng
              FROM events
            ),
            enriched AS (
              SELECT user_id, lat, lng,
                     cos(radians(lng)) * cos(radians(lat)) AS px,
                     sin(radians(lng)) * cos(radians(lat)) AS py,
                     sin(radians(lat)) AS pz,
                     lag(lat) OVER w AS plat, lag(lng) OVER w AS plng,
                     first_value(lat) OVER wf AS lat0,
                     first_value(lng) OVER wf AS lng0,
                     last_value(lat) OVER wf AS lat1,
                     last_value(lng) OVER wf AS lng1
              FROM pts
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
                     wf AS (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND UNBOUNDED FOLLOWING)
            ),
            agg AS (
              SELECT user_id,
                     CAST(count(*) AS BIGINT) AS n_pts,
                     coalesce(sum(CASE WHEN plat IS NULL THEN NULL ELSE
                       2 * atan2(sqrt(
                             power(sin(0.5 * (radians(lat) - radians(plat))), 2)
                           + power(sin(0.5 * (radians(lng) - radians(plng))), 2)
                             * cos(radians(plat)) * cos(radians(lat))),
                           sqrt(greatest(0.0, 1.0 - (
                             power(sin(0.5 * (radians(lat) - radians(plat))), 2)
                           + power(sin(0.5 * (radians(lng) - radians(plng))), 2)
                             * cos(radians(plat)) * cos(radians(lat))))))
                       END), 0.0) AS path_rad,
                     avg(px) AS mx, avg(py) AS my, avg(pz) AS mz,
                     any_value(lat0) AS lat0, any_value(lng0) AS lng0,
                     any_value(lat1) AS lat1, any_value(lng1) AS lng1
              FROM enriched GROUP BY user_id
            ),
            final AS (
              SELECT user_id, n_pts, path_rad,
                     2 * atan2(sqrt(
                           power(sin(0.5 * (radians(lat1) - radians(lat0))), 2)
                         + power(sin(0.5 * (radians(lng1) - radians(lng0))), 2)
                           * cos(radians(lat0)) * cos(radians(lat1))),
                         sqrt(greatest(0.0, 1.0 - (
                           power(sin(0.5 * (radians(lat1) - radians(lat0))), 2)
                         + power(sin(0.5 * (radians(lng1) - radians(lng0))), 2)
                           * cos(radians(lat0)) * cos(radians(lat1))))))
                       AS net_rad,
                     degrees(atan2(mz, sqrt(mx * mx + my * my))) AS centroid_lat,
                     degrees(atan2(my, mx)) AS centroid_lng,
                     acos(least(1.0, sqrt(mx * mx + my * my + mz * mz)))
                       AS spread_rad
              FROM agg
            )
            SELECT user_id, n_pts,
                   round(path_rad, 9) AS path_rad,
                   round(net_rad, 9) AS net_rad,
                   round(CASE WHEN net_rad > 0.0 THEN path_rad / net_rad END, 6)
                     AS sinuosity,
                   round(centroid_lat, 9) AS centroid_lat,
                   round(centroid_lng, 9) AS centroid_lng,
                   round(spread_rad, 9) AS spread_rad
            FROM final ORDER BY user_id
        """,
        # DBSCAN replay: identical eps-edge float formula as the engine's
        # distance_join refine, degree-counted cores, recursive closure
        # over core-core edges, min-label border adoption:
        "dbscan_clusters": f"""
            WITH RECURSIVE pts AS ({_CUST_LATLNG_SQL}),
            v AS (
              SELECT key,
                     cos(radians(lng)) * cos(radians(lat)) AS x,
                     sin(radians(lng)) * cos(radians(lat)) AS y,
                     sin(radians(lat)) AS z
              FROM pts
            ),
            e AS (
              SELECT a.key AS src, b.key AS dst
              FROM v a JOIN v b ON a.key != b.key
              WHERE atan2(sqrt(
                        (a.y * b.z - a.z * b.y) * (a.y * b.z - a.z * b.y)
                      + (a.z * b.x - a.x * b.z) * (a.z * b.x - a.x * b.z)
                      + (a.x * b.y - a.y * b.x) * (a.x * b.y - a.y * b.x)),
                      a.x * b.x + a.y * b.y + a.z * b.z)
                    <= {math.radians(3.0)!r}
            ),
            deg AS (SELECT src AS key, count(*) AS n FROM e GROUP BY 1),
            core AS (
              SELECT p.key FROM pts p LEFT JOIN deg USING (key)
              WHERE coalesce(n, 0) >= 3
            ),
            ce AS (
              SELECT src, dst FROM e
              WHERE src IN (SELECT key FROM core)
                AND dst IN (SELECT key FROM core)
            ),
            reach(a, b) AS (
              SELECT key, key FROM core
              UNION
              SELECT r.a, ce.dst FROM reach r JOIN ce ON r.b = ce.src
            ),
            comp AS (SELECT a AS key, min(b) AS cluster FROM reach GROUP BY a),
            border AS (
              SELECT e.src AS key, min(comp.cluster) AS cluster
              FROM e JOIN comp ON e.dst = comp.key
              WHERE e.src NOT IN (SELECT key FROM core)
              GROUP BY e.src
            )
            SELECT key, 'core' AS role, cluster FROM comp
            UNION ALL
            SELECT key, 'border' AS role, cluster FROM border
            UNION ALL
            SELECT p.key, 'noise' AS role, CAST(-1 AS BIGINT) AS cluster
            FROM pts p
            WHERE p.key NOT IN (SELECT key FROM comp)
              AND p.key NOT IN (SELECT key FROM border)
            ORDER BY key
        """,
        "gps_speed_outliers": f"""
            WITH pts AS ({_EVENTS_LATLNG_SQL}),
            lagged AS (
              SELECT user_id,
                     lag(lat) OVER w AS plat, lag(lng) OVER w AS plng,
                     epoch_us(ts) - lag(epoch_us(ts)) OVER w AS dt_us,
                     lat, lng
              FROM pts
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            legs AS (
              SELECT user_id, dt_us,
                     2 * atan2(sqrt(
                           power(sin(0.5 * (radians(lat) - radians(plat))), 2)
                         + power(sin(0.5 * (radians(lng) - radians(plng))), 2)
                           * cos(radians(plat)) * cos(radians(lat))),
                         sqrt(greatest(0.0, 1.0 - (
                           power(sin(0.5 * (radians(lat) - radians(plat))), 2)
                         + power(sin(0.5 * (radians(lng) - radians(plng))), 2)
                           * cos(radians(plat)) * cos(radians(lat))))))
                       AS leg
              FROM lagged WHERE dt_us IS NOT NULL
            ),
            sp AS (
              SELECT user_id,
                     leg / (CAST(dt_us AS DOUBLE) / 1e6) AS speed,
                     (dt_us <= 0 OR leg / (CAST(dt_us AS DOUBLE) / 1e6) > 0.004)
                       AS bad
              FROM legs
            )
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_legs,
                   CAST(sum(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_flagged,
                   round(max(speed), 9) AS max_speed_rps
            FROM sp GROUP BY user_id ORDER BY user_id
        """,
        "od_matrix": f"""
            WITH {_cellid_cte_duckdb(f'''
              WITH epts AS (
                SELECT user_id, event_id, epoch_us(ts) AS us,
                       epoch_us(ts) // 86400000000 AS day_idx, lat, lng
                FROM ({_EVENTS_LATLNG_SQL})
              ),
              rn AS (
                SELECT user_id, day_idx, lat, lng,
                       row_number() OVER (PARTITION BY user_id, day_idx
                                          ORDER BY us, event_id) AS ra,
                       row_number() OVER (PARTITION BY user_id, day_idx
                                          ORDER BY us DESC, event_id DESC) AS rd
                FROM epts
              ),
              trips AS (
                SELECT o.user_id, o.day_idx,
                       o.lat AS olat, o.lng AS olng,
                       d.lat AS dlat, d.lng AS dlng
                FROM (SELECT * FROM rn WHERE ra = 1) o
                JOIN (SELECT * FROM rn WHERE rd = 1) d
                  USING (user_id, day_idx)
              )
              SELECT (user_id * 100000 + day_idx % 100000) * 2 AS key,
                     olat AS lat, olng AS lng FROM trips
              UNION ALL
              SELECT (user_id * 100000 + day_idx % 100000) * 2 + 1 AS key,
                     dlat AS lat, dlng AS lng FROM trips
            ''')},
            c4 AS (
              SELECT key,
                     ((cell_id & -{1 << 52}) | {1 << 52}) AS cell4
              FROM cells
            ),
            od AS (
              SELECT (o.key // 2) // 100000 AS user_id,
                     o.cell4 AS o_cell4, d.cell4 AS d_cell4
              FROM (SELECT * FROM c4 WHERE key % 2 = 0) o
              JOIN (SELECT * FROM c4 WHERE key % 2 = 1) d
                ON d.key = o.key + 1
            )
            SELECT o_cell4, d_cell4,
                   CAST(count(*) AS BIGINT) AS n_trips,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM od GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "colocation_pairs": f"""
            WITH pts AS (
              SELECT user_id, event_id, epoch_us(ts) AS us, lat, lng
              FROM ({_EVENTS_LATLNG_SQL}) WHERE user_id < 75
            ),
            pairs AS (
              SELECT a.event_id AS id_a, b.event_id AS id_b,
                     a.user_id AS key_a, b.user_id AS key_b,
                     b.us - a.us AS dt_us,
                     2 * atan2(sqrt(
                           power(sin(0.5 * (radians(b.lat) - radians(a.lat))), 2)
                         + power(sin(0.5 * (radians(b.lng) - radians(a.lng))), 2)
                           * cos(radians(a.lat)) * cos(radians(b.lat))),
                         sqrt(greatest(0.0, 1.0 - (
                           power(sin(0.5 * (radians(b.lat) - radians(a.lat))), 2)
                         + power(sin(0.5 * (radians(b.lng) - radians(a.lng))), 2)
                           * cos(radians(a.lat)) * cos(radians(b.lat))))))
                       AS dist
              FROM pts a JOIN pts b
                ON b.event_id > a.event_id
               AND a.user_id != b.user_id
               AND abs(b.us - a.us) <= 900000000
            )
            SELECT id_a, id_b, key_a, key_b, dt_us,
                   round(dist, 9) AS dist_rad
            FROM pairs WHERE dist <= 0.3
            ORDER BY id_a, id_b
        """,
        "triangle_counts": """
            WITH raw AS (
              SELECT c_custkey % 64 AS s, (c_custkey * 11 + 5) % 64 AS d
              FROM customer
              UNION ALL
              SELECT c_custkey % 64, (c_custkey * 7 + 3) % 64 FROM customer
            ),
            und AS (
              SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
              FROM raw WHERE s != d
            ),
            deg AS (
              SELECT node, count(*) AS degree FROM (
                SELECT a AS node FROM und UNION ALL SELECT b FROM und
              ) GROUP BY 1
            ),
            tri AS (
              SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM und e1
              JOIN und e2 ON e2.a = e1.b
              JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
            ),
            corners AS (
              SELECT node, count(*) AS t FROM (
                SELECT x AS node FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri
              ) GROUP BY 1
            )
            SELECT node,
                   CAST(degree AS BIGINT) AS degree,
                   CAST(coalesce(t, 0) AS BIGINT) AS n_triangles,
                   round(CASE WHEN degree >= 2 THEN
                       (2.0 * CAST(coalesce(t, 0) AS DOUBLE))
                       / (CAST(degree AS DOUBLE) * (CAST(degree AS DOUBLE) - 1.0))
                     ELSE 0.0 END, 9) AS clustering_coeff
            FROM deg LEFT JOIN corners USING (node)
            ORDER BY node
        """,
        "inverted_index_stats": """
            WITH toks AS (
              SELECT doc_id AS key, t AS token
              FROM documents, LATERAL unnest(list_filter(
                   regexp_split_to_array(lower(text), '[^a-z]+'),
                   x -> len(x) > 0)) AS u(t)
            ),
            tf AS (
              SELECT token, key, count(*) AS tf FROM toks GROUP BY 1, 2
            ),
            agg AS (
              SELECT token,
                     CAST(count(*) AS BIGINT) AS df,
                     CAST(sum(tf) AS BIGINT) AS cf,
                     array_to_string(list_slice(
                       list(key::VARCHAR || ':' || tf::VARCHAR
                            ORDER BY tf DESC, key ASC), 1, 5), ',')
                       AS postings_head
              FROM tf GROUP BY token
            )
            SELECT token, df, cf, postings_head
            FROM agg ORDER BY df DESC, token LIMIT 40
        """,
        "bm25_topk": _bm25_oracle_sql(),
        "anchor_text_terms": """
            WITH words AS (
              SELECT doc_id, list_filter(
                       regexp_split_to_array(lower(text), '[^a-z]+'),
                       x -> len(x) > 0) AS w
              FROM documents
            ),
            toks AS (
              SELECT 'site' || ((doc_id * 7) % 20)::VARCHAR || '.example'
                       AS dst_host,
                     t AS term
              FROM words, LATERAL unnest(list_slice(w, 1, 2)) AS u(t)
            ),
            counts AS (
              SELECT dst_host, term, count(*) AS n FROM toks GROUP BY 1, 2
            )
            SELECT dst_host,
                   CAST(row_number() OVER (
                       PARTITION BY dst_host ORDER BY n DESC, term) AS INT)
                     AS rk,
                   term, CAST(n AS BIGINT) AS n
            FROM counts
            QUALIFY rk <= 3
            ORDER BY dst_host, rk
        """,
        "bigram_logprob": """
            WITH w AS (
              SELECT doc_id, list_filter(
                       regexp_split_to_array(lower(text), '[^a-z]+'),
                       x -> len(x) > 0) AS l
              FROM documents
            ),
            bg AS (
              SELECT doc_id, l[i] AS w1, l[i + 1] AS w2
              FROM w, LATERAL unnest(generate_series(1, len(l) - 1)) AS g(i)
              WHERE len(l) >= 2
            ),
            c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
            uni AS (
              SELECT unnest(l) AS w1 FROM w WHERE len(l) >= 2
            ),
            c1 AS (SELECT w1, count(*) AS c1 FROM uni GROUP BY 1),
            v AS (SELECT count(*) AS v FROM c1),
            lp AS (
              SELECT doc_id,
                     ln((CAST(c2 AS DOUBLE) + 1.0)
                        / (CAST(c1 AS DOUBLE) + CAST(v AS DOUBLE))) AS lp
              FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1), v
            )
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_bigrams,
                   round(sum(lp) / count(*), 6) AS avg_logprob
            FROM lp GROUP BY doc_id ORDER BY doc_id
        """,
        "nearest_feature_join": _nearest_feature_oracle_sql(),
        "pmi_collocations": """
            WITH w AS (
              SELECT list_filter(
                       regexp_split_to_array(lower(text), '[^a-z]+'),
                       x -> len(x) > 0) AS l
              FROM documents
            ),
            wf AS (SELECT l FROM w WHERE len(l) >= 2),
            bg AS (
              SELECT l[i] AS w1, l[i + 1] AS w2
              FROM wf, LATERAL unnest(generate_series(1, len(l) - 1)) AS g(i)
            ),
            uni AS (SELECT unnest(l) AS t FROM wf),
            c1 AS (SELECT t, count(*) AS c FROM uni GROUP BY 1),
            tot AS (SELECT count(*) AS n_tok FROM uni),
            c2 AS (
              SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2
              HAVING count(*) >= 5
            ),
            j AS (
              SELECT w1, w2, c12,
                     CAST(c12 * n_tok AS DOUBLE)
                       / CAST(ca.c * cb.c AS DOUBLE) AS r
              FROM c2
              JOIN c1 ca ON ca.t = c2.w1
              JOIN c1 cb ON cb.t = c2.w2, tot
            )
            SELECT w1, w2, CAST(c12 AS BIGINT) AS n_pair,
                   round(ln(r), 6) AS pmi
            FROM j ORDER BY r DESC, w1, w2 LIMIT 20
        """,
        "hopping_window_counts": """
            WITH e AS (
              SELECT event_type, epoch_us(ts) AS us, value FROM events
            ),
            x AS (
              SELECT event_type, us, value,
                     ((us // 7200000000) - j) * 7200000000 AS ws
              FROM e, LATERAL unnest([0, 1, 2]) AS t(j)
            )
            SELECT event_type, ws AS win_start_us,
                   CAST(count(*) AS BIGINT) AS n_events,
                   round(sum(value), 6) AS value_sum
            FROM x
            WHERE us >= ws AND us < ws + 21600000000
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "cap_bounds_per_user": f"""
            WITH pts AS ({_EVENTS_LATLNG_SQL}),
            xyz AS (
              SELECT user_id,
                     cos(radians(lng)) * cos(radians(lat)) AS px,
                     sin(radians(lng)) * cos(radians(lat)) AS py,
                     sin(radians(lat)) AS pz
              FROM pts
            ),
            m AS (
              SELECT user_id, count(*) AS n_pts,
                     avg(px) AS mx, avg(py) AS my, avg(pz) AS mz
              FROM xyz GROUP BY 1
            ),
            a AS (
              SELECT xyz.user_id, n_pts, mx, my, mz,
                     atan2(sqrt(
                         (my * pz - mz * py) * (my * pz - mz * py)
                       + (mz * px - mx * pz) * (mz * px - mx * pz)
                       + (mx * py - my * px) * (mx * py - my * px)),
                       mx * px + my * py + mz * pz) AS ang
              FROM xyz JOIN m USING (user_id)
            )
            SELECT user_id,
                   CAST(first(n_pts) AS BIGINT) AS n_pts,
                   round(degrees(atan2(first(mz),
                         sqrt(first(mx) * first(mx)
                            + first(my) * first(my)))), 6) AS axis_lat,
                   round(degrees(atan2(first(my), first(mx))), 6) AS axis_lng,
                   round(max(ang), 6) AS radius_rad
            FROM a GROUP BY user_id ORDER BY user_id
        """,
        "link_bfs_hops": """
            WITH RECURSIVE pages AS (
              SELECT 'site' || (doc_id % 20)::VARCHAR || '.example' AS src_host,
                     '<html><body><a href="https://site' || ((doc_id * 7) % 20)::VARCHAR
                       || '.example/p/' || (doc_id % 125)::VARCHAR
                       || '">x</a> <a href="/local">l</a> <a href="https://site'
                       || ((doc_id * 11) % 20)::VARCHAR
                       || '.example/q">y</a></body></html>' AS html
              FROM documents
            ),
            links AS (
              SELECT src_host,
                     unnest(regexp_extract_all(html, 'href="([^"]*)"', 1)) AS href
              FROM pages
            ),
            edges AS (
              SELECT DISTINCT src_host,
                     lower(regexp_extract(href,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)', 1)) AS dst_host
              FROM links
              WHERE lower(regexp_extract(href,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)', 1)) <> ''
            ),
            walk(host, d) AS (
              SELECT host, 0 FROM (VALUES ('site0.example'), ('site1.example')) s(host)
              UNION
              SELECT e.dst_host, walk.d + 1
              FROM walk JOIN edges e ON e.src_host = walk.host
              WHERE walk.d < 8
            )
            SELECT host, CAST(min(d) AS BIGINT) AS hops
            FROM walk GROUP BY host ORDER BY host
        """,
        "funnel_steps": """
            WITH e AS (
              SELECT user_id, event_type, epoch_us(ts) AS us FROM events
            ),
            t1 AS (
              SELECT user_id, min(us) AS t1_us FROM e
              WHERE event_type = 'view' GROUP BY 1
            ),
            t2 AS (
              SELECT e.user_id, min(us) AS t2_us FROM e JOIN t1 USING (user_id)
              WHERE event_type = 'click' AND us > t1_us GROUP BY 1
            ),
            t3 AS (
              SELECT e.user_id, min(us) AS t3_us FROM e JOIN t2 USING (user_id)
              WHERE event_type = 'purchase' AND us > t2_us GROUP BY 1
            )
            SELECT t1.user_id, t1_us,
                   CAST(1 + (t2_us IS NOT NULL)::INT
                          + (t3_us IS NOT NULL)::INT AS BIGINT) AS steps,
                   coalesce(t2_us, -1) AS t2_us,
                   coalesce(t3_us, -1) AS t3_us
            FROM t1 LEFT JOIN t2 USING (user_id) LEFT JOIN t3 USING (user_id)
            ORDER BY user_id
        """,
        "idw_interpolation": f"""
            WITH pts AS (
              SELECT value,
                     -60.0 + (event_id * 11 % 120) + (event_id % 83) / 83.0 AS lat,
                     -170.0 + (event_id * 17 % 340) + (event_id % 79) / 79.0 AS lng
              FROM events
            ),
            cities(city, clat, clng) AS (VALUES {_cities_values_sql()}),
            h AS (
              SELECT city, value,
                     power(sin((radians(clat) - radians(lat)) * 0.5), 2)
                   + power(sin((radians(clng) - radians(lng)) * 0.5), 2)
                     * cos(radians(lat)) * cos(radians(clat)) AS x
              FROM pts, cities
            ),
            d AS (
              SELECT city, value,
                     2.0 * atan2(sqrt(x), sqrt(greatest(0.0, 1.0 - x))) AS dist
              FROM h
            ),
            w AS (
              SELECT city, value,
                     1.0 / ((dist + 1e-3) * (dist + 1e-3)) AS w
              FROM d WHERE dist < 0.5
            )
            SELECT city, CAST(count(*) AS BIGINT) AS n_pts,
                   round(sum(w * value) / sum(w), 6) AS idw_value
            FROM w GROUP BY city ORDER BY city
        """,
        "value_trend_ols": """
            WITH e AS (
              SELECT user_id, epoch_us(ts) // 3600000000 AS x, value AS y
              FROM events
            ),
            s AS (
              SELECT user_id, count(*) AS n,
                     CAST(sum(x) AS BIGINT) AS sx,
                     CAST(sum(x * x) AS BIGINT) AS sxx,
                     sum(y) AS sy,
                     sum(CAST(x AS DOUBLE) * y) AS sxy
              FROM e GROUP BY 1
            ),
            sl AS (
              SELECT user_id, n, sx, sy,
                     CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) = 0.0
                          THEN 0.0
                          ELSE (CAST(n AS DOUBLE) * sxy
                                - CAST(sx AS DOUBLE) * sy)
                               / CAST(n * sxx - sx * sx AS DOUBLE)
                     END AS slope
              FROM s
            )
            SELECT user_id, n AS n_events,
                   round(slope, 6) AS slope_per_hour,
                   round((sy - slope * CAST(sx AS DOUBLE))
                         / CAST(n AS DOUBLE), 6) AS intercept
            FROM sl ORDER BY user_id
        """,
        "weighted_sssp": _sssp_oracle_sql(8),
        "hybrid_rrf_retrieval": f"""
            WITH txt AS (
              SELECT query_id, doc_id, CAST(rank AS BIGINT) AS r_text
              FROM ({_bm25_oracle_sql(20)})
            ),
            qv AS (
              SELECT vec_id AS query_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
              FROM embeddings
              WHERE vec_id IN ({", ".join(str(q) for q, _ in _BM25_QUERIES)})
            ),
            scored AS (
              SELECT qv.query_id, e.vec_id AS doc_id,
                     list_sum(list_transform(list_zip(
                         list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                         qv.qe), p -> p[1] * p[2])) AS s
              FROM embeddings e, qv WHERE e.vec_id <> qv.query_id
            ),
            vec AS (
              SELECT query_id, doc_id,
                     CAST(row_number() OVER (
                         PARTITION BY query_id ORDER BY s DESC, doc_id
                     ) AS BIGINT) AS r_vec
              FROM scored
              QUALIFY r_vec <= 20
            ),
            fused AS (
              SELECT coalesce(t.query_id, v.query_id) AS query_id,
                     coalesce(t.doc_id, v.doc_id) AS doc_id,
                     coalesce(1.0 / (60.0 + t.r_text), 0.0)
                       + coalesce(1.0 / (60.0 + v.r_vec), 0.0) AS rrf,
                     coalesce(t.r_text, -1) AS r_text,
                     coalesce(v.r_vec, -1) AS r_vec
              FROM txt t FULL OUTER JOIN vec v
                ON t.query_id = v.query_id AND t.doc_id = v.doc_id
            )
            SELECT query_id,
                   CAST(row_number() OVER (
                       PARTITION BY query_id ORDER BY rrf DESC, doc_id
                   ) AS BIGINT) AS fused_rank,
                   doc_id, round(rrf, 9) AS rrf_score, r_text, r_vec
            FROM fused
            QUALIFY fused_rank <= 10
            ORDER BY query_id, fused_rank
        """,
        "dedup_canonical_pick": f"""
            WITH groups AS ({_DO.minhash_groups_oracle_sql(500, 0.8)}),
            j AS (
              SELECT g.key, g.group_key, d.n_chars
              FROM groups g JOIN documents d ON d.doc_id = g.key
            ),
            r AS (
              SELECT *, row_number() OVER (
                  PARTITION BY group_key ORDER BY n_chars DESC, key ASC
              ) AS rn
              FROM j
            )
            SELECT group_key, CAST(count(*) AS BIGINT) AS n_docs,
                   min(CASE WHEN rn = 1 THEN key END) AS canonical_key,
                   min(CASE WHEN rn = 1 THEN n_chars END) AS canonical_chars,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars
            FROM r GROUP BY group_key ORDER BY group_key
        """,
        "morans_i_cells": _morans_oracle_sql(),
        "gistar_hotspots": _gistar_oracle_sql(),
        "ripley_k_function": _ripley_oracle_sql(),
        "label_propagation": _lpa_oracle_sql(3),
        "kcore_peel": _kcore_oracle_sql(3, 6),
        "ewma_user_value": """
            WITH e AS (
              SELECT user_id, epoch_us(ts) AS us, event_id, value FROM events
            ),
            g AS (
              SELECT user_id, count(*) AS n_events,
                     list(CAST(value AS DOUBLE) ORDER BY us, event_id) AS vals
              FROM e GROUP BY 1
            )
            SELECT user_id, n_events,
                   round(list_reduce(vals,
                         (acc, x) -> acc * 8.75e-1 + x * 1.25e-1), 6) AS ewma
            FROM g ORDER BY user_id
        """,
        "vincenty_rhumb": _vincenty_oracle_sql(),
        "vincenty_direct": _vincenty_direct_oracle_sql(),
        "edit_distance_pairs": _EDIT_DISTANCE_ORACLE,
        "cohort_retention": _COHORT_RETENTION_ORACLE,
        "holt_smoothing": _HOLT_ORACLE,
        "convex_hull_nations": _CONVEX_HULL_ORACLE,
        "mad_outliers": _MAD_ORACLE,
        "spacetime_scan_llr": _spacetime_scan_oracle_sql(),
        "burst_viterbi": _burst_oracle_sql(),
        "cusum_changepoints": _CUSUM_ORACLE,
        "rake_keywords": _rake_oracle_sql(),
        "stratified_split": _stratified_split_oracle_sql(),
        "rolling_active_users": _ROLLING_ACTIVE_ORACLE,
        "line_of_sight": _line_of_sight_oracle_sql(),
        "scd2_history": _SCD2_ORACLE,
        "map_match_viterbi": _map_match_oracle_sql(),
        "ttl_dedup": _TTL_DEDUP_ORACLE,
        "corpus_kl_drift": _CORPUS_KL_ORACLE,
        "user_tile_similarity": _user_tile_similarity_oracle_sql(),
        "bot_gap_regularity": _BOT_GAP_ORACLE,
        "content_gini": _CONTENT_GINI_ORACLE,
        "value_deciles": _VALUE_DECILES_ORACLE,
        "solar_position": _solar_oracle_sql(),
        "copurchase_pairs": _COPURCHASE_ORACLE,
        "compaction_plan": _COMPACTION_ORACLE,
        "markov_transitions": _MARKOV_ORACLE,
        "theil_sen_slope": _THEIL_SEN_ORACLE,
        "cosine_text_join": _cosine_text_oracle_sql(),
        "zorder_buckets": _zorder_oracle_sql(),
        "gc_densify": _gc_densify_oracle_sql(),
        "kmeans_cells": _kmeans_oracle_sql(),
        "geary_c_cells": _geary_oracle_sql(),
        "hexbin_counts": _hexbin_oracle_sql(),
        "clark_evans_nn": _clark_evans_oracle_sql(),
        "k_anonymity_levels": _k_anonymity_oracle_sql(),
        "spatial_entropy_types": _spatial_entropy_oracle_sql(),
        "cotravel_pairs": _cotravel_oracle_sql(),
        "cocitation_hosts": """
            WITH e0 AS (
              SELECT 'site' || (doc_id % 20)::VARCHAR || '.example' AS src,
                     'site' || ((doc_id * 7) % 20)::VARCHAR || '.example' AS dst
              FROM documents
              UNION ALL
              SELECT 'site' || (doc_id % 20)::VARCHAR || '.example',
                     'site' || ((doc_id * 11) % 20)::VARCHAR || '.example'
              FROM documents
            ),
            e AS (SELECT DISTINCT src, dst FROM e0),
            deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
            kept AS (SELECT e.src, e.dst FROM e JOIN deg USING (src)
                     WHERE d <= 1000)
            SELECT a.dst AS dst_a, b.dst AS dst_b,
                   CAST(count(*) AS BIGINT) AS n_cociting
            FROM kept a JOIN kept b ON a.src = b.src AND a.dst < b.dst
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "kneser_ney_bigrams": """
            WITH w AS (
              SELECT list_filter(
                       regexp_split_to_array(lower(text), '[^a-z]+'),
                       x -> len(x) > 0) AS l
              FROM documents
            ),
            wf AS (SELECT l FROM w WHERE len(l) >= 2),
            bg AS (
              SELECT l[i] AS w1, l[i + 1] AS w2
              FROM wf, LATERAL unnest(generate_series(1, len(l) - 1)) AS g(i)
            ),
            cb AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
            lft AS (SELECT w1, sum(c12) AS c1, count(*) AS n1f
                    FROM cb GROUP BY w1),
            rgt AS (SELECT w2, count(*) AS n1b FROM cb GROUP BY w2),
            bt AS (SELECT count(*) AS b_types FROM cb),
            j AS (
              SELECT cb.w1, cb.w2, cb.c12, lft.c1, lft.n1f, rgt.n1b,
                     greatest(CAST(cb.c12 AS DOUBLE) - 0.75, 0.0)
                       / CAST(lft.c1 AS DOUBLE)
                     + 0.75 * CAST(lft.n1f AS DOUBLE)
                       / CAST(lft.c1 AS DOUBLE)
                       * CAST(rgt.n1b AS DOUBLE)
                       / CAST(bt.b_types AS DOUBLE) AS p
              FROM cb JOIN lft USING (w1) JOIN rgt USING (w2), bt
            )
            SELECT w1, w2, CAST(c12 AS BIGINT) AS c12,
                   CAST(c1 AS BIGINT) AS c1, CAST(n1f AS BIGINT) AS n1f,
                   CAST(n1b AS BIGINT) AS n1b, round(p, 12) AS p_kn
            FROM j ORDER BY c12 DESC, w1, w2 LIMIT 200
        """,
        "benford_digits": """
            WITH v AS (
              SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
              WHERE CAST(o_totalprice AS DOUBLE) > 0
            ),
            d AS (
              SELECT CAST(floor(v / power(10.0, floor(log10(v)))) AS INTEGER)
                       AS digit
              FROM v
            ),
            c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
            t AS (SELECT count(*) AS n_total FROM d)
            SELECT digit, CAST(n AS BIGINT) AS n,
                   round(CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE), 12)
                     AS observed_p,
                   round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 12)
                     AS expected_p,
                   round(CAST(n_total AS DOUBLE)
                         * (CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE)
                            - log10(1.0 + 1.0 / CAST(digit AS DOUBLE)))
                         * (CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE)
                            - log10(1.0 + 1.0 / CAST(digit AS DOUBLE)))
                         / log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 9)
                     AS chi2_term
            FROM c, t ORDER BY digit
        """,
        "skyline_spenders": """
            WITH pc AS (
              SELECT o_custkey,
                     CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                          AS BIGINT) AS spend_cents,
                     count(*) AS n_orders
              FROM orders GROUP BY o_custkey
            ),
            pairs AS (
              SELECT spend_cents, n_orders, count(*) AS n_tied
              FROM pc GROUP BY 1, 2
            )
            SELECT spend_cents, CAST(n_orders AS BIGINT) AS n_orders,
                   CAST(n_tied AS BIGINT) AS n_tied
            FROM pairs p
            WHERE NOT EXISTS (
              SELECT 1 FROM pairs q
              WHERE q.spend_cents >= p.spend_cents
                AND q.n_orders <= p.n_orders
                AND (q.spend_cents > p.spend_cents
                     OR q.n_orders < p.n_orders))
            ORDER BY spend_cents DESC
        """,
        "kde_points": f"""
            WITH pts AS ({_CUST_LATLNG_SQL}),
            v AS (
              SELECT key,
                     cos(radians(lng)) * cos(radians(lat)) AS x,
                     sin(radians(lng)) * cos(radians(lat)) AS y,
                     sin(radians(lat)) AS z
              FROM pts
            ),
            pairs AS (
              SELECT a.key AS key, atan2(sqrt(
                         (a.y * b.z - a.z * b.y) * (a.y * b.z - a.z * b.y)
                       + (a.z * b.x - a.x * b.z) * (a.z * b.x - a.x * b.z)
                       + (a.x * b.y - a.y * b.x) * (a.x * b.y - a.y * b.x)),
                       a.x * b.x + a.y * b.y + a.z * b.z) AS d
              FROM v a JOIN v b ON a.key != b.key
            ),
            nb AS (
              SELECT key, count(*) AS n_neighbors,
                     sum(exp(-(d * d) / {2.0 * _KDE_H * _KDE_H!r})) AS dens
              FROM pairs WHERE d <= {_KDE_RADIUS_EFF!r}
              GROUP BY key
            )
            SELECT p.key,
                   CAST(coalesce(nb.n_neighbors, 0) AS BIGINT) AS n_neighbors,
                   round(coalesce(nb.dens, 0.0), 9) AS density
            FROM pts p LEFT JOIN nb USING (key) ORDER BY key
        """,
        "gravity_residuals": f"""
            WITH {_cellid_cte_duckdb(f'''
              WITH epts AS (
                SELECT user_id, event_id, epoch_us(ts) AS us,
                       epoch_us(ts) // 86400000000 AS day_idx, lat, lng
                FROM ({_EVENTS_LATLNG_SQL})
              ),
              rn AS (
                SELECT user_id, day_idx, lat, lng,
                       row_number() OVER (PARTITION BY user_id, day_idx
                                          ORDER BY us, event_id) AS ra,
                       row_number() OVER (PARTITION BY user_id, day_idx
                                          ORDER BY us DESC, event_id DESC) AS rd
                FROM epts
              ),
              trips AS (
                SELECT o.user_id, o.day_idx,
                       o.lat AS olat, o.lng AS olng,
                       d.lat AS dlat, d.lng AS dlng
                FROM (SELECT * FROM rn WHERE ra = 1) o
                JOIN (SELECT * FROM rn WHERE rd = 1) d
                  USING (user_id, day_idx)
              )
              SELECT (user_id * 100000 + day_idx % 100000) * 2 AS key,
                     olat AS lat, olng AS lng FROM trips
              UNION ALL
              SELECT (user_id * 100000 + day_idx % 100000) * 2 + 1 AS key,
                     dlat AS lat, dlng AS lng FROM trips
            ''')},
            c4 AS (
              SELECT key, lat, lng,
                     ((cell_id & -{1 << 52}) | {1 << 52}) AS cell4
              FROM cells
            ),
            od AS (
              SELECT o.cell4 AS o_cell4, d.cell4 AS d_cell4,
                     o.lat AS olat, o.lng AS olng,
                     d.lat AS dlat, d.lng AS dlng
              FROM (SELECT * FROM c4 WHERE key % 2 = 0) o
              JOIN (SELECT * FROM c4 WHERE key % 2 = 1) d
                ON d.key = o.key + 1
            ),
            flows AS (
              SELECT o_cell4, d_cell4, count(*) AS n_trips,
                     sum(CAST(floor(olat * 1000000 + 0.5) AS BIGINT)) AS sola,
                     sum(CAST(floor(olng * 1000000 + 0.5) AS BIGINT)) AS soln,
                     sum(CAST(floor(dlat * 1000000 + 0.5) AS BIGINT)) AS sdla,
                     sum(CAST(floor(dlng * 1000000 + 0.5) AS BIGINT)) AS sdln
              FROM od GROUP BY 1, 2
            ),
            mo AS (
              SELECT o_cell4, sum(n_trips) AS m_o,
                     sum(sola) AS la, sum(soln) AS ln_
              FROM flows GROUP BY 1
            ),
            md AS (
              SELECT d_cell4, sum(n_trips) AS m_d,
                     sum(sdla) AS la2, sum(sdln) AS ln2
              FROM flows GROUP BY 1
            ),
            j0 AS (
              SELECT f.o_cell4, f.d_cell4, f.n_trips,
                     CAST(mo.m_o AS BIGINT) AS m_o,
                     CAST(md.m_d AS BIGINT) AS m_d,
                     CAST(mo.la AS DOUBLE) / CAST(mo.m_o AS BIGINT) / 1000000 AS olat_m,
                     CAST(mo.ln_ AS DOUBLE) / CAST(mo.m_o AS BIGINT) / 1000000 AS olng_m,
                     CAST(md.la2 AS DOUBLE) / CAST(md.m_d AS BIGINT) / 1000000 AS dlat_m,
                     CAST(md.ln2 AS DOUBLE) / CAST(md.m_d AS BIGINT) / 1000000 AS dlng_m
              FROM flows f JOIN mo USING (o_cell4) JOIN md USING (d_cell4)
            ),
            jd AS (
              SELECT o_cell4, d_cell4, n_trips, m_o, m_d,
                     2 * atan2(sqrt(
                           power(sin(0.5 * (radians(dlat_m) - radians(olat_m))), 2)
                         + power(sin(0.5 * (radians(dlng_m) - radians(olng_m))), 2)
                           * cos(radians(olat_m)) * cos(radians(dlat_m))),
                         sqrt(greatest(0.0, 1.0 - (
                           power(sin(0.5 * (radians(dlat_m) - radians(olat_m))), 2)
                         + power(sin(0.5 * (radians(dlng_m) - radians(olng_m))), 2)
                           * cos(radians(olat_m)) * cos(radians(dlat_m))))))
                       AS d
              FROM j0
            ),
            jg AS (
              SELECT *, CAST(m_o * m_d AS DOUBLE) / (d * d) AS g
              FROM jd WHERE d > 0
            ),
            tot AS (
              SELECT CAST(sum(n_trips) AS DOUBLE) / sum(g) AS k FROM jg
            )
            SELECT o_cell4, d_cell4, CAST(n_trips AS BIGINT) AS n_trips,
                   m_o, m_d,
                   round(k * g, 6) AS expected,
                   round(n_trips - k * g, 6) AS residual
            FROM jg, tot ORDER BY o_cell4, d_cell4
        """,
        "rolling_distinct_users": """
            WITH days AS (
              SELECT epoch_us(ts) // 86400000000 AS day_idx, user_id
              FROM events
            ),
            first_seen AS (
              SELECT user_id, min(day_idx) AS first_day
              FROM days GROUP BY user_id
            ),
            new_per_day AS (
              SELECT first_day, count(*) AS n_new
              FROM first_seen GROUP BY first_day
            ),
            all_days AS (SELECT DISTINCT day_idx FROM days)
            SELECT d.day_idx,
                   CAST(coalesce(n.n_new, 0) AS BIGINT) AS n_new_users,
                   CAST(sum(coalesce(n.n_new, 0)) OVER (
                       ORDER BY d.day_idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS cum_distinct_users
            FROM all_days d
            LEFT JOIN new_per_day n ON n.first_day = d.day_idx
            ORDER BY d.day_idx
        """,
        "event_path_trigrams": """
            WITH seq AS (
              SELECT user_id, event_type AS t1,
                     lead(event_type, 1) OVER w AS t2,
                     lead(event_type, 2) OVER w AS t3
              FROM events
              WINDOW w AS (PARTITION BY user_id
                           ORDER BY epoch_us(ts), event_id)
            )
            SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM seq WHERE t3 IS NOT NULL
            GROUP BY 1, 2, 3
            ORDER BY n DESC, t1, t2, t3 LIMIT 50
        """,
        "cell_density_change": f"""
            WITH {_cellid_cte_duckdb(
                f"SELECT event_id AS key, lat, lng FROM ({_EVENTS_LATLNG_SQL})"
            )},
            lab AS (
              SELECT ((c.cell_id & -{1 << 52}) | {1 << 52}) AS cell4,
                     CASE WHEN epoch_us(e.ts) // 86400000000 >= 19738
                          THEN 1 ELSE 0 END AS epoch
              FROM cells c JOIN events e ON e.event_id = c.key
            ),
            counts AS (
              SELECT cell4,
                     sum(CASE WHEN epoch = 0 THEN 1 ELSE 0 END) AS n1,
                     sum(CASE WHEN epoch = 1 THEN 1 ELSE 0 END) AS n2
              FROM lab GROUP BY cell4
            )
            SELECT cell4, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
                   round(CAST(n2 - n1 AS DOUBLE)
                         / sqrt(CAST(n1 + n2 AS DOUBLE)), 9) AS z_change
            FROM counts ORDER BY cell4
        """,
        "lisa_local_moran": _lisa_oracle_sql(),
        "std_dev_ellipse": _sde_oracle_sql(),
        "mann_kendall_cells": _mann_kendall_oracle_sql(),
        "knox_spacetime": _knox_oracle_sql(),
        "adamic_adar_links": _adamic_adar_oracle_sql(),
        "acf_daily_counts": _acf_oracle_sql(),
        "dtw_daily_counts": _dtw_oracle_sql(),
        "frechet_traj_pairs": _frechet_oracle_sql(),
        "bearing_circular_stats": _circular_oracle_sql(),
        "join_count_stats": _join_count_oracle_sql(),
        "hex_kring_smooth": _hex_kring_oracle_sql(),
        "hex_flow_directions": _hex_flow_oracle_sql(),
        "sitemap_urls": _sitemap_oracle_sql(),
        "weekday_chisq": _weekday_chisq_oracle_sql(),
        "lcss_traj_pairs": _lcss_oracle_sql(),
        "kendall_tau_types": _kendall_oracle_sql(),
        "ppr_seed_host": _ppr_oracle_sql(),
        "hex_flow_accumulation": _hex_flow_acc_oracle_sql(),
        "edr_traj_pairs": _edr_oracle_sql(),
        "closeness_seeds": _closeness_oracle_sql(),
        "dirichlet_ql_topk": _dirichlet_oracle_sql(),
        "kmv_distinct_langs": _kmv_oracle_sql(),
        "importance_resample": _importance_resample_oracle_sql(),
        "ngram_novelty": _ngram_novelty_oracle_sql(),
        "quadrat_vmr": _quadrat_vmr_oracle_sql(),
        "ktruss_edges": _ktruss_oracle_sql(),
        "graph_mixing_stats": _graph_mixing_oracle_sql(),
        "polyline_encode": _polyline_oracle_sql(),
        "huff_market_share": _huff_oracle_sql(),
        "theil_index_cells": _theil_oracle_sql(),
        "seasonal_naive_mase": _seasonal_mase_oracle_sql(),
        "snapshot_retention_plan": _snapshot_retention_oracle_sql(),
        "semivariogram_bins": _semivariogram_oracle_sql(),
        "nn_gfunction": _nn_gfunction_oracle_sql(),
        "neighbor_jaccard_links": _neighbor_jaccard_oracle_sql(),
        "bib_coupling_hosts": _BIB_COUPLING_ORACLE,
        "recrawl_priority": _RECRAWL_ORACLE,
        "erp_traj_pairs": _erp_oracle_sql(),
        "holt_winters_daily": _HOLT_WINTERS_ORACLE,
        "ams_f2_tokens": _ams_f2_oracle_sql(),
        "weighted_sample_aes": _weighted_sample_oracle_sql(),
        "ab_conversion_ztest": _ab_ztest_oracle_sql(),
        "cross_k_function": _cross_k_oracle_sql(),
        "emerging_hotspots": _emerging_hotspots_oracle_sql(),
        "containment_pairs": _CONTAINMENT_ORACLE,
        "textrank_keywords": _textrank_oracle_sql(),
        "zonal_stats": _zonal_stats_oracle_sql(),
        "katz_centrality": _katz_oracle_sql(),
        "streaming_sessions": _STREAMING_SESSIONS_ORACLE,
        "st_dbscan_clusters": _ST_DBSCAN_ORACLE,
        "cell_term_affinity": _cell_term_affinity_oracle_sql(),
        "spearman_daily": _SPEARMAN_ORACLE,
        "ks_value_drift": _KS_ORACLE,
        "seasonal_decompose": _SEASONAL_ORACLE,
        "grubbs_outliers": _GRUBBS_ORACLE,
        "page_hinkley_drift": _PAGE_HINKLEY_ORACLE,
        "gap_fill_daily": _GAP_FILL_ORACLE,
        "nation_diameter": _NATION_DIAMETER_ORACLE,
        "pair_correlation_rings": _pair_correlation_oracle_sql(),
        "traj_effective_area": _EFFECTIVE_AREA_ORACLE,
        "cross_track_route": _cross_track_oracle_sql(),
        "closest_pair_cells": _closest_pair_oracle_sql(),
        "eb_rate_cells": _eb_rate_oracle_sql(),
        "kriging_targets": _kriging_oracle_sql(),
        "lag_ols_cells": _lag_ols_oracle_sql(),
        "mw_value_shift": _mw_oracle_sql(),
        "kruskal_wallis_weekday": _KRUSKAL_ORACLE,
        "cvm_value_drift": _CVM_ORACLE,
        "km_second_event": _KM_ORACLE,
        "radius_of_gyration": _ROG_ORACLE,
        "jump_length_hist": _JUMP_ORACLE,
        "location_entropy": _location_entropy_oracle_sql(),
        "path_crossings": _PATH_CROSS_ORACLE,
        "self_intersections": _SELF_CROSS_ORACLE,
        "terrain_stats": _terrain_oracle_sql(),
        "sax_daily_words": _SAX_ORACLE,
        "eigenvector_centrality": _eigenvector_oracle_sql(),
        "lexical_richness": _LEXRICH_ORACLE,
        "js_divergence_langs": _JSD_ORACLE,
        "hhi_cells": _hhi_oracle_sql(),
        "rfm_segments": _RFM_ORACLE,
        "event_skipgrams": _SKIPGRAM_ORACLE,
        "winsorized_values": _WINSOR_ORACLE,
        "triad_census": _TRIAD_ORACLE,
        "weighted_jaccard_hosts": _WJACCARD_ORACLE,
        "gumbel_weekly_maxima": _GUMBEL_ORACLE,
        "component_size_dist": _COMPONENT_SIZE_ORACLE,
        "markov_entropy_rate": _MARKOV_ENTROPY_ORACLE,
        "sprt_conversion": _SPRT_ORACLE,
        "chapman_overlap": _chapman_oracle_sql(),
        "good_turing_counts": _GOOD_TURING_ORACLE,
        "idw_loo_cv": _IDW_LOO_ORACLE,
        "hopkins_statistic": _HOPKINS_ORACLE,
        "fdr_hotspots": _fdr_oracle_sql(),
        "fightin_words": _FIGHTIN_ORACLE,
        "log_rank_test": _log_rank_oracle_sql(),
        "rich_club_coefficient": _RICH_CLUB_ORACLE,
        "dunning_g2_bigrams": _DUNNING_ORACLE,
        "bootstrap_mean_ci": _bootstrap_oracle_sql(),
        "jackknife_nation_mean": _JACKKNIFE_ORACLE,
        "zipf_slope_fit": _ZIPF_FIT_ORACLE,
        "anova_values": _ANOVA_ORACLE,
        "levene_test": _LEVENE_ORACLE,
        "runs_test": _RUNS_ORACLE,
        "durbin_watson": _DW_ORACLE,
        "quadkey_pyramid": _quadkey_pyramid_oracle_sql(),
        "directional_variogram": _DIRVARIO_ORACLE,
        "rate_limit_windows": _RATE_LIMIT_ORACLE,
        "modularity_by_group": _MODULARITY_ORACLE,
        "gpd_tail_fit": _GPD_ORACLE,
        "grid_percolation": _grid_percolation_oracle_sql(),
        "ndcg_bm25": _ndcg_oracle_sql(),
        "streaming_window_distinct": _STREAM_DISTINCT_ORACLE,
        "brier_quality": _brier_oracle_sql(),
        "moran_correlogram": _MORAN_CORR_ORACLE,
        "bivariate_moran": _BIV_MORAN_ORACLE,
        "utm_coordinates": _utm_oracle_sql(),
        "mgrs_squares": _mgrs_oracle_sql(),
        "geohash_pyramid": _geohash_pyramid_oracle_sql(),
        "degree_assortativity": _DEGREE_ASSORT_ORACLE,
        "local_clustering": _LOCAL_CLUSTERING_ORACLE,
        "reciprocity_links": _RECIPROCITY_ORACLE,
        "nn_ffunction": _nn_ffunction_oracle_sql(),
        "general_g": _GENERAL_G_ORACLE,
        "central_feature": _CENTRAL_FEATURE_ORACLE,
        "welch_ttest": _WELCH_ORACLE,
        "fisher_exact": _fisher_oracle_sql(),
        "cohens_kappa": _KAPPA_ORACLE,
        "horn_slope_aspect": _horn_oracle_sql(),
        "hillshade_grid": _hillshade_oracle_sql(),
        "flow_direction_d8": _d8_oracle_sql(),
        "burrows_delta": _BURROWS_ORACLE,
        "ccf_clicks_views": _CCF_ORACLE,
        "hurst_rs": _HURST_ORACLE,
        "home_work_cells": _HOMEWORK_ORACLE,
        "gap_log_histogram": _GAP_HIST_ORACLE,
        "dwell_time_cells": _DWELL_ORACLE,
        "albers_coordinates": _albers_oracle_sql(),
        "lcc_coordinates": _lcc_oracle_sql(),
        "gc_intersections": _gci_oracle_sql(),
        "mrr_map_bm25": _mrr_map_oracle_sql(),
        "pearson_daily_matrix": _PEARSON_MATRIX_ORACLE,
        "min_enclosing_cap": _mec_oracle_sql(),
        "embedding_label_outliers": _EMB_OUTLIER_ORACLE,
        "perplexity_gate": _PERPLEXITY_ORACLE,
        "token_fertility": _token_fertility_oracle_sql(),
        "token_bucket_gate": _TOKEN_BUCKET_ORACLE,
        "trajectory_tortuosity": _TORTUOSITY_ORACLE,
        "bilinear_elevation": _bilinear_oracle_sql(),
        "burstiness_memory": _BURSTINESS_ORACLE,
        "ransac_trend": _RANSAC_ORACLE,
        "needleman_wunsch": _nw_oracle_sql(),
        "smith_waterman": _sw_oracle_sql(),
        "bayes_ab": _bayes_oracle_sql(),
        "hod_rayleigh": _HOD_RAYLEIGH_ORACLE,
        "zonal_overlay": _ZONAL_OVERLAY_ORACLE,
        "viewshed_grid": _viewshed_oracle_sql(),
        "terrain_curvature": _curvature_oracle_sql(),
        "minhash_fidelity": __import__(
            "gos2_spark.pipeline.duckdb_oracles", fromlist=["x"]
        ).minhash_audit_oracle_sql("fidelity"),
        "lsh_recall_audit": __import__(
            "gos2_spark.pipeline.duckdb_oracles", fromlist=["x"]
        ).minhash_audit_oracle_sql("recall"),
        "readability_scores": _READABILITY_ORACLE,
        "cumulative_incidence": _CIF_ORACLE,
        "fellegi_sunter": _fs_oracle_sql(),
        "mutual_information": _MI_ORACLE,
        "cuped_adjusted": _CUPED_ORACLE,
        "diff_in_diff": _did_oracle_sql(),
        "ipw_ate": _IPW_ORACLE,
    }
