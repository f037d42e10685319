"""End-to-end PIP join: Spark operator vs pure-numpy oracle vs DuckDB SQL."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from whitebox_tools_spark import geometry as G, synth
from whitebox_tools_spark.grid import CellIndex
from whitebox_tools_spark.operators.pip import points_in_polygons

IDX = CellIndex(0.0, 0.0, 1000.0, 5)


@pytest.fixture(scope="module")
def polys():
    return synth.make_polygons()


def _numpy_oracle(keys, polys):
    px, py = synth.point_np(keys)
    out = []
    for pid, parts in synth.polygons_as_parts(polys):
        keep = G.point_in_parts(px, py, parts)
        out += [(int(k), pid) for k in keys[keep]]
    return sorted(out)


def test_pip_matches_numpy_and_duckdb(spark, sf_dir, polys):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    x, y = synth.point_exprs(F.col("c_custkey"))
    pts = cust.select(F.col("c_custkey").alias("point_id"), x.alias("x"), y.alias("y"))
    got = sorted(
        (r.point_id, r.poly_id)
        for r in points_in_polygons(pts, synth.polygons_as_parts(polys), IDX).collect()
    )
    keys = np.array([r.point_id for r in pts.select("point_id").collect()])
    assert got == _numpy_oracle(keys, polys)

    xsql, ysql = synth.point_sql("c_custkey")
    cte = (
        f"SELECT c_custkey AS point_id, {xsql} AS x, {ysql} AS y "
        f"FROM '{sf_dir}/customer.parquet'"
    )
    duck = sorted(
        (int(a), int(b)) for a, b in duckdb.sql(synth.pip_oracle_sql(cte, polys)).fetchall()
    )
    assert duck == got


def test_pip_boundary_points_outside(spark, polys):
    # points exactly on every first-shell edge midpoint -> never inside that polygon
    rows = []
    for p in polys:
        xs, ys = np.asarray(p.parts[0].xs), np.asarray(p.parts[0].ys)
        for i in range(len(xs) - 1):
            rows.append((p.poly_id * 1000 + i, float((xs[i] + xs[i + 1]) / 2), float((ys[i] + ys[i + 1]) / 2), p.poly_id))
    df = spark.createDataFrame(rows, "point_id long, x double, y double, src_poly long")
    got = points_in_polygons(df, synth.polygons_as_parts(polys), IDX)
    joined = got.join(df, "point_id").filter(F.col("poly_id") == F.col("src_poly"))
    # kernel and reference agree that edge points are outside *that* polygon
    # (numpy kernel is the ground truth here; assert spark == numpy)
    keys = np.array([r[0] for r in rows])
    px = np.array([r[1] for r in rows])
    py = np.array([r[2] for r in rows])
    src = np.array([r[3] for r in rows])
    expect = 0
    for pid, parts in synth.polygons_as_parts(polys):
        m = src == pid
        expect += int(G.point_in_parts(px[m], py[m], parts).sum())
    assert joined.count() == expect


def test_pip_non_broadcast_path(spark, sf_dir, polys):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").limit(200)
    x, y = synth.point_exprs(F.col("c_custkey"))
    pts = cust.select(F.col("c_custkey").alias("point_id"), x.alias("x"), y.alias("y"))
    a = sorted(
        (r.point_id, r.poly_id)
        for r in points_in_polygons(pts, synth.polygons_as_parts(polys), IDX, broadcast=True).collect()
    )
    b = sorted(
        (r.point_id, r.poly_id)
        for r in points_in_polygons(pts, synth.polygons_as_parts(polys), IDX, broadcast=False).collect()
    )
    assert a == b
