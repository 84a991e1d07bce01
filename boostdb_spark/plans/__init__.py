from boostdb_spark.plans.sugar import BoostQuery, SeriesFamilyBinding, parse, plan, query

__all__ = ["BoostQuery", "SeriesFamilyBinding", "parse", "plan", "query"]
