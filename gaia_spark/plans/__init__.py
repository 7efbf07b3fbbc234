from gaia_spark.plans.pipeline import build_pipeline, run_pipeline_spec

__all__ = ["build_pipeline", "run_pipeline_spec"]
