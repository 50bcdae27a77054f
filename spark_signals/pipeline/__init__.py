from spark_signals.pipeline.builder import PipelineOutputs, build_pipeline

__all__ = ["PipelineOutputs", "build_pipeline"]
