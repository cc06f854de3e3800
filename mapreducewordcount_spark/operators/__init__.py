from mapreducewordcount_spark.operators.wordcount import (  # noqa: F401
    word_counts,
    wordcount_pipeline,
    write_wordcount_output,
)
from mapreducewordcount_spark.operators.decontam import (  # noqa: F401
    contamination_report,
    decontaminate,
)
