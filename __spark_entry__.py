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
    tiles = TileSet(_tile_loops(), max_cells=32)
    return (
        point_in_polygon_join(pts, tiles, how="inner", point_key="key")
        .select("key", "tile_id")
        .orderBy("key", "tile_id")
    )


def _q_pip_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gos2_spark.spark.joins import TileSet, point_in_polygon_join

    pts = _cust_points(spark, sf_dir)
    tiles = TileSet(_tile_loops(), max_cells=32)
    return (
        point_in_polygon_join(pts, tiles, how="inner", point_key="key")
        .groupBy("tile_id")
        .agg(F.count("*").alias("n_points"))
        .orderBy("tile_id")
    )


def _q_pip_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gos2_spark.spark.joins import TileSet, point_in_polygon_join

    pts = _cust_points(spark, sf_dir)
    tiles = TileSet(_tile_loops(), max_cells=32)
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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "haversine_distance": _q_haversine,
        "rect_contains_wrap": _q_rect,
        "cap_contains": _q_cap,
        "pip_join": _q_pip_join,
        "pip_histogram": _q_pip_histogram,
        "pip_anti_join": _q_pip_anti,
        "knn_join": _q_knn,
        "cell_counts_l5": _q_cell_counts,
        "cell_token_roundtrip": _q_cell_roundtrip,
        "dedup_exact": _q_dedup_exact,
        "text_stats": _q_text_stats,
        "embedding_knn": _q_embedding_knn,
        "top_events_per_user": _q_top_events,
    }


def oracle_sql() -> dict[str, str]:
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
        "dedup_exact": """
            SELECT min(doc_id) AS keep_id, count(*) AS dup_count
            FROM documents GROUP BY md5(text) ORDER BY keep_id
        """,
        "text_stats": """
            SELECT lang,
                   count(*) AS n_docs,
                   sum(len(string_split(trim(text), ' '))) AS total_tokens,
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
        # cell_counts_l5 / cell_token_roundtrip: Hilbert ops, rows-only checks.
    }
