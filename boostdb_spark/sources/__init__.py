from boostdb_spark.sources.seriesfamily import SeriesFamily

__all__ = ["SeriesFamily"]
