from hebrew_ner_spark.sources.catalog import TABLES, load_table, write_table

__all__ = ["TABLES", "load_table", "write_table"]
