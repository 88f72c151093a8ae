from data_pipeline_evolution_batch_streaming_apache_flink_spark.plans.app import ApplicationSpec, run_application

__all__ = ["ApplicationSpec", "run_application"]
