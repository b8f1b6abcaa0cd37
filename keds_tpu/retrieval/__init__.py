from keds_tpu.retrieval.database import KnowledgeDB, Retriever  # noqa: F401
