from gaia_spark.sources.icelite import IceTable
from gaia_spark.sources.lineage import ResumableJob

__all__ = ["IceTable", "ResumableJob"]
