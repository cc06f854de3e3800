from mapreducewordcount_spark.operators.wordcount import (  # noqa: F401
    word_counts,
    wordcount_pipeline,
    write_wordcount_output,
)
from mapreducewordcount_spark.operators.decontam import (  # noqa: F401
    contamination_report,
    decontaminate,
)
from mapreducewordcount_spark.operators.boilerplate import (  # noqa: F401
    boilerplate_report,
)
from mapreducewordcount_spark.operators.dupspans import (  # noqa: F401
    duplicate_span_stats,
)
from mapreducewordcount_spark.operators.lmscore import (  # noqa: F401
    build_unigram_model,
    unigram_logprob,
)
from mapreducewordcount_spark.operators.packing import (  # noqa: F401
    mixture_plan,
    pack_sequences,
)
from mapreducewordcount_spark.operators.clustering import (  # noqa: F401
    cluster_balanced_sample,
    cluster_stats,
    kmeans,
)
