from join_example_spark.sources.readers import TABLES, read_events, read_table

__all__ = ["TABLES", "read_events", "read_table"]
