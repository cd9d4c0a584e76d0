from tabular_to_parquet_spark.parity.catalog import CATALOG, QueryDef

__all__ = ["CATALOG", "QueryDef"]
