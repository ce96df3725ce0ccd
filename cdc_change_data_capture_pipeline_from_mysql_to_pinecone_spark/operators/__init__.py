from . import cdc, dedup, multimodal, relational, text, vectors

__all__ = ["cdc", "dedup", "multimodal", "relational", "text", "vectors"]
