from .vector_store import VectorStore, SearchHit

__all__ = ["VectorStore", "SearchHit"]
