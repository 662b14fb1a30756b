"""Spatial coverage + WKT parsing (SURVEY.md §2: A5, J5, M7/M9).

- :func:`spatial_coverage` — the spatial range clustering analog
  (get_spatial_ranges, lib_profiler/datamart_profiler/spatial.py:45-102):
  ≤3 bounding boxes per point set. Documented deviation from KMeans:
  x-terciles (rank-position bucketing, deterministic under ties) with per
  -band y extents — same purpose (compact geo envelopes), exact SQL twin.
- :func:`spatial_overlap_scores` — the spatial join-candidate search
  (J5, apiserver/apiserver/search/join.py:229-331): area-overlap fraction
  between query and candidate envelope sets.
- :func:`parse_wkt_batch` — WKT "POINT (x y)" parser (M7,
  spatial.py:157-186) as a vectorized Arrow regex kernel; the oracle-gated
  entry round-trips WKT built from supplier coordinates.

Point sets derive deterministically from existing tables (no geo columns
in the testdata): x = key % 100, y = balance / 100.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from datamart_ray.util import ensure_fast_shuffle, round_away

# (label, table, key column, value column)
POINT_SOURCES: list[tuple[str, str, str, str]] = [
    ("supplier", "supplier", "s_suppkey", "s_acctbal"),
    ("customer", "customer", "c_custkey", "c_acctbal"),
]

_WKT_POINT_RE = (
    r"^POINT \((?P<x>-?\d+(?:\.\d+)?) (?P<y>-?\d+(?:\.\d+)?)\)$"
)


def parse_wkt_batch(col: pa.Array | pa.ChunkedArray) -> pa.Table:
    """Vectorized WKT point parse → (x, y) doubles (null on mismatch).
    Arrow's extract_regex requires named groups."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    ex = pc.extract_regex(col, _WKT_POINT_RE)
    x = pc.cast(pc.struct_field(ex, "x"), pa.float64())
    y = pc.cast(pc.struct_field(ex, "y"), pa.float64())
    return pa.table({"x": x, "y": y})


def wkt_roundtrip(sf_dir: str) -> pd.DataFrame:
    """M7 entry: build WKT strings from supplier coords, parse them back
    with the regex kernel, aggregate per x-band (proves parse exactness)."""
    ensure_fast_shuffle()
    ds = rd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_acctbal"]
    )

    def make_and_parse(t: pa.Table) -> pa.Table:
        x = (t["s_suppkey"].to_numpy(zero_copy_only=False) % 100).astype(
            np.float64
        )
        y = t["s_acctbal"].to_numpy(zero_copy_only=False) / 100.0
        # float() first: numpy>=2.0 repr of a float64 scalar is
        # 'np.float64(3.5)' (NEP 51), which the WKT regex would not match
        wkt = pa.array(
            [f"POINT ({float(a)!r} {float(b)!r})" for a, b in zip(x, y)]
        )
        parsed = parse_wkt_batch(wkt)
        part = pa.table(
            {
                "x_band": pa.array(
                    (parsed["x"].to_numpy(zero_copy_only=False) // 10).astype(
                        np.int64
                    )
                ),
                "y": parsed["y"],
            }
        )
        return (
            part.group_by("x_band")
            .aggregate([("y", "count"), ("y", "min"), ("y", "max")])
            .rename_columns(["x_band", "n", "y_min", "y_max"])
        )

    from ray.data.aggregate import Max, Min, Sum

    g = (
        ds.map_batches(make_and_parse, batch_format="pyarrow")
        .groupby("x_band")
        .aggregate(
            Sum("n", alias_name="n"),
            Min("y_min", alias_name="y_min"),
            Max("y_max", alias_name="y_max"),
        )
        .to_pandas()
    )
    g["x_band"] = g["x_band"].astype("int64")
    g["n"] = g["n"].astype("int64")
    g["y_min"] = round_away(g["y_min"], 4)
    g["y_max"] = round_away(g["y_max"], 4)
    return g.sort_values("x_band").reset_index(drop=True)


WKT_SQL = """
    SELECT CAST(floor((s_suppkey % 100)::DOUBLE / 10) AS BIGINT) AS x_band,
           count(*) AS n,
           ROUND(min(s_acctbal / 100.0), 4) AS y_min,
           ROUND(max(s_acctbal / 100.0), 4) AS y_max
    FROM supplier
    GROUP BY 1
    ORDER BY x_band
"""


def _boxes(sf_dir: str, table: str, key: str, bal: str) -> list[dict]:
    """≤3 bounding boxes: x-tercile bands (by rank position) with y
    extents. Distributed value-count on the derived x, then per-band
    y min/max via a second pruned pass bucketed by the x cutpoints."""
    ensure_fast_shuffle()
    ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=[key, bal])

    def derive(t: pa.Table) -> pa.Table:
        x = (t[key].to_numpy(zero_copy_only=False) % 100).astype(np.float64)
        y = t[bal].to_numpy(zero_copy_only=False) / 100.0
        return pa.table({"x": pa.array(x), "y": pa.array(y)})

    pts = ds.map_batches(derive, batch_format="pyarrow")
    from ray.data.aggregate import Count

    vc = (
        pts.groupby("x")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values("x")
        .reset_index(drop=True)
    )
    vals = vc["x"].to_numpy(dtype=np.float64)
    counts = vc["n"].to_numpy(dtype=np.int64)
    n = int(counts.sum())
    cum = np.cumsum(counts)
    bounds = [0, n // 3, (2 * n) // 3, n]
    cut_vals = []
    for i in range(3):
        lo_rank, hi_rank = bounds[i], bounds[i + 1] - 1
        lo_v = vals[np.searchsorted(cum, lo_rank, side="right")]
        hi_v = vals[np.searchsorted(cum, hi_rank, side="right")]
        cut_vals.append((lo_v, hi_v))

    # value-assigned bands: box = number of band-hi cutpoints strictly
    # below x (ties at a cutpoint land in the earlier band on both sides)
    his = np.array([hv for _, hv in cut_vals])

    def band_stats(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        band = np.searchsorted(his, x, side="left").clip(max=2)
        part = pa.table(
            {
                "band": pa.array(band.astype(np.int64)),
                "x": pa.array(x),
                "y": pa.array(y),
            }
        )
        return (
            part.group_by("band")
            .aggregate(
                [("x", "min"), ("x", "max"), ("y", "min"), ("y", "max"),
                 ("y", "count")]
            )
            .rename_columns(
                ["band", "x_lo", "x_hi", "y_lo", "y_hi", "n"]
            )
        )

    from ray.data.aggregate import Max, Min, Sum

    g = (
        pts.map_batches(band_stats, batch_format="pyarrow")
        .groupby("band")
        .aggregate(
            Min("x_lo", alias_name="x_lo"),
            Max("x_hi", alias_name="x_hi"),
            Min("y_lo", alias_name="y_lo"),
            Max("y_hi", alias_name="y_hi"),
            Sum("n", alias_name="n"),
        )
        .to_pandas()
        .sort_values("band")
    )
    return [
        {
            "box": int(row["band"]),
            "x_lo": float(row["x_lo"]),
            "x_hi": float(row["x_hi"]),
            "y_lo": float(row["y_lo"]),
            "y_hi": float(row["y_hi"]),
            "n": int(row["n"]),
        }
        for _, row in g.iterrows()
    ]


def spatial_coverage(sf_dir: str) -> pd.DataFrame:
    rows = []
    for label, t, k, b in POINT_SOURCES:
        for box in _boxes(sf_dir, t, k, b):
            rows.append({"source": label, **box})
    out = pd.DataFrame(rows)
    for c in ("box", "n"):
        out[c] = out[c].astype("int64")
    for c in ("x_lo", "x_hi", "y_lo", "y_hi"):
        out[c] = round_away(out[c], 4)
    return out


def spatial_coverage_sql() -> str:
    parts = []
    for label, t, k, b in POINT_SOURCES:
        parts.append(
            f"""
            SELECT '{label}' AS source, box,
                   ROUND(min(x), 4) AS x_lo, ROUND(max(x), 4) AS x_hi,
                   ROUND(min(y), 4) AS y_lo, ROUND(max(y), 4) AS y_hi,
                   count(*) AS n
            FROM (
                SELECT p.x, p.y,
                       least(2, (SELECT count(*) FROM cuts_{label} c
                                 WHERE c.hi < p.x)) AS box
                FROM pts_{label} p
            )
            GROUP BY 1, 2
            """
        )
    ctes = []
    for label, t, k, b in POINT_SOURCES:
        ctes.append(
            f"""pts_{label} AS (
                SELECT ({k} % 100)::DOUBLE AS x, {b} / 100.0 AS y FROM {t}
            ),
            cuts_{label} AS (
                SELECT band, max(x) AS hi FROM (
                    SELECT x,
                           CASE WHEN rk < cnt // 3 THEN 0
                                WHEN rk < (2 * cnt) // 3 THEN 1
                                ELSE 2 END AS band
                    FROM (
                        SELECT x, row_number() OVER (ORDER BY x) - 1 AS rk,
                               count(*) OVER () AS cnt
                        FROM pts_{label}
                    )
                ) GROUP BY band
            )"""
        )
    return (
        "WITH " + ", ".join(ctes) + " "
        + " UNION ALL ".join(parts)
        + " ORDER BY source, box"
    )


def spatial_overlap_scores(sf_dir: str) -> pd.DataFrame:
    """J5: area-overlap fraction between the two sources' envelope sets:
    score = sum over box pairs of intersect_area / total_query_area
    (pinned (query_box, cand_box) accumulation order)."""
    boxes = {
        label: _boxes(sf_dir, t, k, b) for label, t, k, b in POINT_SOURCES
    }
    q_label = POINT_SOURCES[0][0]
    q = boxes[q_label]
    total = 0.0
    for qb in q:
        total += (qb["x_hi"] - qb["x_lo"]) * (qb["y_hi"] - qb["y_lo"])
    rows = []
    for label in boxes:
        if label == q_label:
            continue
        score = 0.0
        for qb in q:
            for cb in boxes[label]:
                w = min(qb["x_hi"], cb["x_hi"]) - max(qb["x_lo"], cb["x_lo"])
                h = min(qb["y_hi"], cb["y_hi"]) - max(qb["y_lo"], cb["y_lo"])
                if w > 0 and h > 0:
                    score += (w * h) / total
        rows.append({"candidate": label, "score": score})
    out = pd.DataFrame(rows)
    out["score"] = round_away(out["score"], 4)
    return out.sort_values("candidate").reset_index(drop=True)


def spatial_overlap_sql() -> str:
    cov = spatial_coverage_sql()
    # reuse the coverage query unrounded via a wrapper: rebuild boxes with
    # raw extents inside this query
    ctes = []
    box_selects = []
    for label, t, k, b in POINT_SOURCES:
        ctes.append(
            f"""pts_{label} AS (
                SELECT ({k} % 100)::DOUBLE AS x, {b} / 100.0 AS y FROM {t}
            ),
            cuts_{label} AS (
                SELECT band, max(x) AS hi FROM (
                    SELECT x,
                           CASE WHEN rk < cnt // 3 THEN 0
                                WHEN rk < (2 * cnt) // 3 THEN 1
                                ELSE 2 END AS band
                    FROM (
                        SELECT x, row_number() OVER (ORDER BY x) - 1 AS rk,
                               count(*) OVER () AS cnt
                        FROM pts_{label}
                    )
                ) GROUP BY band
            )"""
        )
        box_selects.append(
            f"""SELECT '{label}' AS source, box,
                   min(x) AS x_lo, max(x) AS x_hi,
                   min(y) AS y_lo, max(y) AS y_hi
            FROM (
                SELECT p.x, p.y,
                       least(2, (SELECT count(*) FROM cuts_{label} c
                                 WHERE c.hi < p.x)) AS box
                FROM pts_{label} p
            ) GROUP BY 1, 2"""
        )
    q_label = POINT_SOURCES[0][0]
    return (
        "WITH " + ", ".join(ctes)
        + ", boxes AS (" + " UNION ALL ".join(box_selects) + ")"
        + f""",
        q AS (SELECT * FROM boxes WHERE source = '{q_label}'),
        total AS (
            SELECT sum((x_hi - x_lo) * (y_hi - y_lo) ORDER BY box) AS tot
            FROM q
        )
        SELECT r.source AS candidate,
               ROUND(coalesce(sum(
                   CASE WHEN least(q.x_hi, r.x_hi) - greatest(q.x_lo, r.x_lo) > 0
                         AND least(q.y_hi, r.y_hi) - greatest(q.y_lo, r.y_lo) > 0
                        THEN ((least(q.x_hi, r.x_hi) - greatest(q.x_lo, r.x_lo))
                              * (least(q.y_hi, r.y_hi) - greatest(q.y_lo, r.y_lo)))
                             / total.tot
                        ELSE 0 END
                   ORDER BY q.box, r.box
               ), 0), 4) AS score
        FROM boxes r
        CROSS JOIN total
        LEFT JOIN q ON true
        WHERE r.source != '{q_label}'
        GROUP BY r.source
        ORDER BY candidate
    """
    )


# ----------------------------------------------------------------------
# Geospatial-variable candidate search: the parsed bbox constraint
# (search/query.parse_variables) applied as the reference's geo_shape
# envelope-intersects filter + score
# (apiserver/apiserver/search/__init__.py:303-330, join.py:229-331)
# ----------------------------------------------------------------------

DEFAULT_BBOX = (10.0, 60.0, 0.0, 45.0)  # (x_lo, x_hi, y_lo, y_hi)


def search_spatial_candidates(
    sf_dir: str, variables: list[dict] | None = None
) -> pd.DataFrame:
    """Rank POINT_SOURCES by how much of the query bounding box their
    coverage envelopes intersect: score = Σ_boxes intersect_area /
    bbox_area (pinned box order). The bbox comes from a reference-style
    ``geospatial_variable`` constraint when given, else DEFAULT_BBOX."""
    from datamart_ray.search.query import parse_variables

    cons = parse_variables(variables or [])
    x_lo, x_hi, y_lo, y_hi = cons.bbox or DEFAULT_BBOX
    area = (x_hi - x_lo) * (y_hi - y_lo)
    rows = []
    for label, t, k, b in POINT_SOURCES:
        score = 0.0
        n_hit = 0
        for box in _boxes(sf_dir, t, k, b):  # pinned box order
            w = min(x_hi, box["x_hi"]) - max(x_lo, box["x_lo"])
            h = min(y_hi, box["y_hi"]) - max(y_lo, box["y_lo"])
            if w > 0 and h > 0:
                n_hit += 1
                score += (w * h) / area
        if n_hit:
            rows.append(
                {"source": label, "n_hit": n_hit, "score": score}
            )
    out = pd.DataFrame(rows, columns=["source", "n_hit", "score"])
    out["n_hit"] = out["n_hit"].astype("int64")
    out["score"] = round_away(out["score"], 4)
    return out.sort_values(
        ["score", "source"], ascending=[False, True]
    ).reset_index(drop=True)


def spatial_candidates_sql(
    bbox: tuple[float, float, float, float] = DEFAULT_BBOX,
) -> str:
    x_lo, x_hi, y_lo, y_hi = bbox
    area = (x_hi - x_lo) * (y_hi - y_lo)
    ctes = []
    box_selects = []
    for label, t, k, b in POINT_SOURCES:
        ctes.append(
            f"""pts_{label} AS (
                SELECT ({k} % 100)::DOUBLE AS x, {b} / 100.0 AS y FROM {t}
            ),
            cuts_{label} AS (
                SELECT band, max(x) AS hi FROM (
                    SELECT x,
                           CASE WHEN rk < cnt // 3 THEN 0
                                WHEN rk < (2 * cnt) // 3 THEN 1
                                ELSE 2 END AS band
                    FROM (
                        SELECT x, row_number() OVER (ORDER BY x) - 1 AS rk,
                               count(*) OVER () AS cnt
                        FROM pts_{label}
                    )
                ) GROUP BY band
            )"""
        )
        box_selects.append(
            f"""SELECT '{label}' AS source, box,
                   min(x) AS x_lo, max(x) AS x_hi,
                   min(y) AS y_lo, max(y) AS y_hi
            FROM (
                SELECT p.x, p.y,
                       least(2, (SELECT count(*) FROM cuts_{label} c
                                 WHERE c.hi < p.x)) AS box
                FROM pts_{label} p
            ) GROUP BY 1, 2"""
        )
    return (
        "WITH " + ", ".join(ctes)
        + ", boxes AS (" + " UNION ALL ".join(box_selects) + ")"
        + f"""
        SELECT source, count(*) AS n_hit,
               ROUND(sum(
                   (least({x_hi}, x_hi) - greatest({x_lo}, x_lo))
                   * (least({y_hi}, y_hi) - greatest({y_lo}, y_lo))
                   / {area} ORDER BY box
               ), 4) AS score
        FROM boxes
        WHERE least({x_hi}, x_hi) - greatest({x_lo}, x_lo) > 0
          AND least({y_hi}, y_hi) - greatest({y_lo}, y_lo) > 0
        GROUP BY source
        HAVING count(*) > 0
        ORDER BY score DESC, source
    """
    )


def geo_bounds_centroid(sf_dir: str) -> pd.DataFrame:
    """ES ``geo_bounds`` + ``geo_centroid`` aggregation analogs over
    each derived point set (x = key % 100, y = balance / 100): the
    tightest bounding envelope and the mean point, one row per source
    table.

    Ray shape (scale-safe): per-batch O(1) partials — min/max of each
    axis plus exact integer sums (x is int, y in fixed-point cents) —
    merged by one tiny groupby; the centroid divisions happen once on
    the merged scalars, so the float result is independent of batch
    count and block order."""
    ensure_fast_shuffle()
    from ray.data.aggregate import Max, Min, Sum

    frames = []
    for label, table, key, bal in POINT_SOURCES:
        ds = rd.read_parquet(
            f"{sf_dir}/{table}.parquet", columns=[key, bal]
        )

        def part(
            t: pa.Table, label=label, key=key, bal=bal
        ) -> pa.Table:
            x = (
                t[key].to_numpy(zero_copy_only=False) % 100
            ).astype(np.int64)
            b = t[bal].to_numpy(zero_copy_only=False)
            # fixed-point cents: balances are 2-decimal money, so the
            # int64 sum is exact and order-independent
            cents = np.rint(b * 100.0).astype(np.int64)
            return pa.table(
                {
                    "src": pa.array([label]),
                    "n": pa.array([x.size], type=pa.int64()),
                    "min_x": pa.array([int(x.min())], type=pa.int64()),
                    "max_x": pa.array([int(x.max())], type=pa.int64()),
                    "min_yc": pa.array(
                        [int(cents.min())], type=pa.int64()
                    ),
                    "max_yc": pa.array(
                        [int(cents.max())], type=pa.int64()
                    ),
                    "sum_x": pa.array([int(x.sum())], type=pa.int64()),
                    "sum_yc": pa.array(
                        [int(cents.sum())], type=pa.int64()
                    ),
                }
            )

        g = (
            ds.map_batches(part, batch_format="pyarrow")
            .groupby("src")
            .aggregate(
                Sum("n", alias_name="n"),
                Min("min_x", alias_name="min_x"),
                Max("max_x", alias_name="max_x"),
                Min("min_yc", alias_name="min_yc"),
                Max("max_yc", alias_name="max_yc"),
                Sum("sum_x", alias_name="sum_x"),
                Sum("sum_yc", alias_name="sum_yc"),
            )
            .to_pandas()
        )
        frames.append(g)
    out = pd.concat(frames, ignore_index=True)
    res = pd.DataFrame(
        {
            "src": out["src"],
            "n": out["n"].astype("int64"),
            "min_x": out["min_x"].astype("float64"),
            "max_x": out["max_x"].astype("float64"),
            "min_y": round_away(out["min_yc"] / 100.0, 4),
            "max_y": round_away(out["max_yc"] / 100.0, 4),
            "centroid_x": round_away(out["sum_x"] / out["n"], 4),
            "centroid_y": round_away(
                out["sum_yc"] / 100.0 / out["n"], 4
            ),
        }
    )
    return res.sort_values("src").reset_index(drop=True)


def geo_bounds_centroid_sql() -> str:
    parts = []
    for label, table, key, bal in POINT_SOURCES:
        parts.append(f"""
        SELECT '{label}' AS src,
               count(*)::BIGINT AS n,
               min({key} % 100)::DOUBLE AS min_x,
               max({key} % 100)::DOUBLE AS max_x,
               ROUND(min(CAST(round({bal} * 100.0) AS BIGINT)) / 100.0,
                     4) AS min_y,
               ROUND(max(CAST(round({bal} * 100.0) AS BIGINT)) / 100.0,
                     4) AS max_y,
               ROUND(sum({key} % 100)::DOUBLE / count(*), 4)
                   AS centroid_x,
               ROUND(sum(CAST(round({bal} * 100.0) AS BIGINT))::DOUBLE
                     / 100.0 / count(*), 4) AS centroid_y
        FROM {table}""")
    body = "\n        UNION ALL\n".join(parts)
    return f"SELECT * FROM ({body}) ORDER BY src"


GEO_QUERY_POINT = (5.0, 30.0)  # (x, y) in the derived planar space
GEO_RADIUS = 25.0
GEO_TOPK = 10


def geo_distance_search(
    sf_dir: str,
    qx: float = GEO_QUERY_POINT[0],
    qy: float = GEO_QUERY_POINT[1],
    radius: float = GEO_RADIUS,
    k: int = GEO_TOPK,
) -> pd.DataFrame:
    """ES ``geo_distance`` query + distance sort analog over the
    supplier point set (x = key % 100, y = balance/100): keep points
    within `radius` of the query point, return the k nearest ordered
    (distance asc, key asc). Planar Euclidean distance — pinned
    deviation from ES haversine, the derived coordinates are not
    geodetic. Squared-distance compare in FIXED-POINT integers (cents²)
    so the radius gate and the ordering are float-free; the reported
    distance is one sqrt at the end, rounded.

    Ray shape: per-batch vectorized filter + local top-k partials —
    candidate rows only ever leave a batch, no shuffle."""
    ensure_fast_shuffle()
    ds = rd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_acctbal"]
    )
    # fixed-point: x in integer units of 0.01 (cents-scale), y likewise
    qx_c = int(round(qx * 100))
    qy_c = int(round(qy * 100))
    r2_c = int(round(radius * 100)) ** 2

    def part(t: pa.Table) -> pa.Table:
        key = t["s_suppkey"].to_numpy(zero_copy_only=False)
        x_c = (key % 100).astype(np.int64) * 100
        b = t["s_acctbal"].to_numpy(zero_copy_only=False)
        # half-AWAY rounding (DuckDB round semantics) — np.rint is
        # half-to-even and disagrees on balances ending in .50
        y_c = (np.sign(b) * np.floor(np.abs(b) + 0.5)).astype(np.int64)
        d2 = (x_c - qx_c) ** 2 + (y_c - qy_c) ** 2
        m = d2 <= r2_c
        sel_k = key[m]
        sel_d = d2[m]
        if sel_k.size > k:  # local top-k partial
            kth = np.partition(sel_d, k - 1)[k - 1]
            keep = sel_d <= kth
            sel_k, sel_d = sel_k[keep], sel_d[keep]
        return pa.table(
            {
                "s_suppkey": pa.array(sel_k.astype(np.int64)),
                "d2_c": pa.array(sel_d.astype(np.int64)),
            }
        )

    pdf = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    if pdf.empty:  # empty Datasets drop the schema through to_pandas
        pdf = pd.DataFrame({"s_suppkey": [], "d2_c": []})
    pdf = pdf.sort_values(["d2_c", "s_suppkey"]).head(k).reset_index(drop=True)
    out = pd.DataFrame(
        {
            "s_suppkey": pdf["s_suppkey"].astype("int64"),
            "distance": round_away(np.sqrt(pdf["d2_c"]) / 100.0, 4),
        }
    )
    return out


def geo_distance_sql(
    qx: float = GEO_QUERY_POINT[0],
    qy: float = GEO_QUERY_POINT[1],
    radius: float = GEO_RADIUS,
    k: int = GEO_TOPK,
) -> str:
    qx_c = int(round(qx * 100))
    qy_c = int(round(qy * 100))
    r2_c = int(round(radius * 100)) ** 2
    return f"""
        WITH pts AS (
            SELECT s_suppkey,
                   (s_suppkey % 100) * 100 AS x_c,
                   CAST(round(s_acctbal) AS BIGINT) AS y_c
            FROM supplier
        ),
        d AS (
            SELECT s_suppkey,
                   (x_c - {qx_c}) * (x_c - {qx_c})
                   + (y_c - {qy_c}) * (y_c - {qy_c}) AS d2_c
            FROM pts
        )
        SELECT s_suppkey, ROUND(sqrt(d2_c) / 100.0, 4) AS distance
        FROM d
        WHERE d2_c <= {r2_c}
        ORDER BY d2_c, s_suppkey
        LIMIT {k}
    """
