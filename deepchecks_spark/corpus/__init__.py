from deepchecks_spark.corpus.extractor import (
    extract_text,
    extract_text_batch,
    make_extract_text_udf,
)
from deepchecks_spark.corpus.generator import (
    CORPUS_DDL,
    generate_corpus_pandas,
    generate_corpus_spark,
    generate_corpus_distributed,
)

__all__ = [
    "extract_text",
    "extract_text_batch",
    "make_extract_text_udf",
    "CORPUS_DDL",
    "generate_corpus_pandas",
    "generate_corpus_spark",
    "generate_corpus_distributed",
]
