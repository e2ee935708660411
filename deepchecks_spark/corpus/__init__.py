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
from deepchecks_spark.corpus.warc import (
    WARC_OUT_DDL,
    parse_warc,
    parse_warc_bytes,
    read_warc,
    to_warc,
    warc_record_expr,
)

__all__ = [
    "WARC_OUT_DDL",
    "parse_warc",
    "parse_warc_bytes",
    "read_warc",
    "to_warc",
    "warc_record_expr",
    "extract_text",
    "extract_text_batch",
    "make_extract_text_udf",
    "CORPUS_DDL",
    "generate_corpus_pandas",
    "generate_corpus_spark",
    "generate_corpus_distributed",
]
