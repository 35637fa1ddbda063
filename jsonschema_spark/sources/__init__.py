from jsonschema_spark.sources.ingest import (
    decode_content,
    read_docs_json,
    read_docs_jsonl,
)
from jsonschema_spark.sources.tables import TableIO

__all__ = ["TableIO", "read_docs_json", "read_docs_jsonl", "decode_content"]
