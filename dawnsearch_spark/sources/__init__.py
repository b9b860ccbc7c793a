from dawnsearch_spark.sources.documents import (  # noqa: F401
    is_iceberg_table_path,
    read_documents,
)
