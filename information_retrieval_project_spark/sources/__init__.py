from .docstore import (  # noqa: F401
    DocStoreDataSource,
    enrich_with_docstore,
    read_docstore,
    register,
    usda_query_url,
)
