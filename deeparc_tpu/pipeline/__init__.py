from deeparc_tpu.pipeline.filtering import filter_outliers, FilterStats
from deeparc_tpu.pipeline.driver import run_pipeline, PipelineResult

__all__ = ["filter_outliers", "FilterStats", "run_pipeline", "PipelineResult"]
