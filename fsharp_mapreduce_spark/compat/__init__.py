from fsharp_mapreduce_spark.compat.job import MapReduceJob, range_source, table_source

__all__ = ["MapReduceJob", "range_source", "table_source"]
