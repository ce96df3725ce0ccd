from . import cdc, dedup, incremental, multimodal, relational, text, vectors

__all__ = ["cdc", "dedup", "incremental", "multimodal", "relational", "text", "vectors"]
