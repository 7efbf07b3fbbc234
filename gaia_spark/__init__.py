"""gaia_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Reimplements the query/data-processing capabilities of the reference
geospatial library (OpenDataAnalytics/gaia, "processes" architecture:
``[R] gaia/geo/processes_vector.py``, ``[R] gaia/geo/processes_raster.py``,
``[R] gaia/geo/geo_inputs.py``) as lazy, columnar Spark DataFrame plans:

- pages (url, warc_ts, html, text, lang) are geoparsed into point geometries
  with a frozen extraction grammar (FIXTURES.md §2),
- points are encoded into quadtree grid cells at multiple resolutions,
- spatial relations (within/intersects/disjoint/touches/equals/near) run as
  cell-bucketed equi-joins + vectorized refinement,
- distance/kNN uses two-phase candidate generation (cell kRing expansion or
  broadcast) + refinement,
- zonal statistics, tile pyramids (zoom,x,y), raster math, and
  training-data-pipeline operators (dedup, similarity search, text analysis)
  complete the operator set (SURVEY.md §2).

Everything is DataFrame/SQL + Arrow-vectorized pandas UDFs; no per-row
Python, no RDDs.
"""

from gaia_spark.engine import Engine, GaiaFrame
from gaia_spark.session import get_session

__all__ = ["Engine", "GaiaFrame", "get_session"]
__version__ = "0.1.0"
