from mapreducewordcount_spark.sources.text import read_corpus  # noqa: F401
from mapreducewordcount_spark.sources.tables import TABLES, load_table, load_tables, register_views  # noqa: F401
