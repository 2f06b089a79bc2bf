"""Spatial join — grid-bucketed point-in-polygon at scale.

Reference: ``src/query/sql/src/planner/plans/spatial_join.rs`` +
``physical_spatial_join.rs`` + ``transforms/transform_spatial_join.rs``
(the reference builds an R-tree on the build side and probes per row).

Spark-first strategy (no R-tree, no crossJoin):
  1. each polygon is expanded to the GRID CELLS its bounding box covers
     (``explode(sequence(...))`` twice — pure built-ins);
  2. each point is keyed by its single containing cell;
  3. an EQUI-join on cell id produces candidates — this shuffles on a
     compact (long, long) key, so at 100 TB it partitions like any hash
     join and AQE handles skewed cells (e.g. a polygon covering a city);
  4. candidates are refined with the exact ray-cast predicate
     (``functions.geo.point_in_polygon`` — codegen'd HOF, no UDF).

Cell size trades shuffle fan-out (small cells → more polygon copies)
against candidate selectivity (large cells → more refine work); callers
pass a cell comparable to the median polygon extent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from databend_spark.functions.geo import point_in_polygon


def points_in_polygons(
    points: DataFrame,
    polygons: DataFrame,
    cell: float = 1.0,
    x: str = "x",
    y: str = "y",
    poly: str = "poly",
) -> DataFrame:
    """Join each point in `points` to every polygon containing it.

    points:   any columns + `x`, `y` (double)
    polygons: any columns + `poly` (array<struct<x:double,y:double>>)
    Returns points' columns + polygons' columns for each containment hit.
    """
    # polygon bbox from the ring itself (array HOFs, no explode yet)
    xs = F.expr(f"transform({poly}, p -> p.x)")
    ys = F.expr(f"transform({poly}, p -> p.y)")
    p_cells = (
        polygons.withColumn("_cx0", F.floor(F.array_min(xs) / cell))
        .withColumn("_cx1", F.floor(F.array_max(xs) / cell))
        .withColumn("_cy0", F.floor(F.array_min(ys) / cell))
        .withColumn("_cy1", F.floor(F.array_max(ys) / cell))
        # bbox → covered grid cells; a polygon touches (dx+1)*(dy+1) cells
        .withColumn("_cellx", F.explode(F.expr("sequence(_cx0, _cx1)")))
        .withColumn("_celly", F.explode(F.expr("sequence(_cy0, _cy1)")))
        .drop("_cx0", "_cx1", "_cy0", "_cy1")
    )
    pt_cells = points.withColumn("_cellx", F.floor(F.col(x) / cell)).withColumn(
        "_celly", F.floor(F.col(y) / cell)
    )
    cand = pt_cells.join(p_cells, ["_cellx", "_celly"]).drop("_cellx", "_celly")
    return cand.filter(point_in_polygon(x, y, poly))
