from datafusion_pinot_spark.plans.queries import QUERIES, QueryDef

__all__ = ["QUERIES", "QueryDef"]
